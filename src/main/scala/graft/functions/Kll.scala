package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** KLL quantile-sketch plumbing for the ledgerless sketch-aggregate family
  * (SketchIndexNode `quantileCols`) — the float-measure complement of its
  * HLL distinct counts: perplexity / loss / score columns are DoubleType,
  * which the exact AggIndexNode rightly refuses (no exact decrement for
  * float sums), and a KLL sketch gives mergeable, insert-only, bounded
  *-state quantiles with a published normalized-RANK error (~1.65% at the
  * default k = 200; Karnin-Lang-Liberty, FOCS'16; the same datasketches
  * library Spark's own hll_* functions use).
  *
  * Contract notes:
  *   - merge is associative/commutative, so any insert order yields a
  *     valid sketch; unlike HLL the compaction step is RANDOMIZED, so
  *     byte-identity across orders is NOT promised — only the rank-error
  *     bound is (gates compare ranks, not bytes);
  *   - NULL/NaN measures are skipped (percentile semantics);
  *   - buffers serialize through the sketch's own compact byte form (the
  *     sketches are not Java-serializable; the holder below bridges).
  */
object Kll {
  /** Java-serialization bridge for shuffle-time buffer transport. */
  final class Holder(@transient var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** Partial-aggregating (map-side combine) KLL builder: double in, compact
    * sketch bytes out. NaN encodes upstream NULLs and is skipped. */
  final class Agg(k: Int) extends Aggregator[Double, Holder, Array[Byte]] {
    def zero: Holder = new Holder(KllDoublesSketch.newHeapInstance(k))
    def reduce(h: Holder, x: Double): Holder = {
      if (!x.isNaN) h.sk.update(x)
      h
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(h: Holder): Array[Byte] = h.sk.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column-level aggregate: `kllAgg(k)(col)` over a DOUBLE column where
    * NULLs arrive as NaN (`coalesce(cast(c as double), 'NaN')`). */
  def agg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg(k), Encoders.scalaDouble)

  /** Binary sketch union (for the totals ⊕ delta full-outer merge). */
  val mergeBytes = udf { (a: Array[Byte], b: Array[Byte]) =>
    (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x, y) =>
        val sa = KllDoublesSketch.heapify(Memory.wrap(x))
        sa.merge(KllDoublesSketch.heapify(Memory.wrap(y)))
        sa.toByteArray
    }
  }

  /** Serve one quantile from a compact sketch (INCLUSIVE search — the
    * value whose rank first reaches q, matching the AggIndexNode histogram
    * rule's direction); null for an empty/absent sketch. */
  val quantile = udf { (bytes: Array[Byte], q: Double) =>
    if (bytes == null) None
    else {
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      if (sk.isEmpty) None
      else Some(sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
    }
  }

  /** Retained-plus-seen count of a sketch (n), for guards/tests. */
  val n = udf { (bytes: Array[Byte]) =>
    if (bytes == null) 0L
    else KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
  }
}
