package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bpe_encode(text, merges) -> array<string>: byte-pair-encoding subword
  * tokenization with a TRAINED merge table (Sennrich et al. 2016,
  * arXiv:1508.07909) — the real LLM-pipeline tokenizer, not the regex proxy.
  * The text is lowercased and split on ASCII whitespace; each word starts as
  * single-character symbols and adjacent symbol pairs are merged in rank
  * order until no ranked pair remains. Concatenating the output tokens
  * reproduces the input with whitespace removed — the round-trip identity
  * the q88 oracle pins.
  *
  * The merge table rides in the expression (a plan literal — serialized once
  * per task like any plan): fine up to tens of thousands of merges; a
  * full-production vocab would move to a broadcast variable behind the same
  * kernel. Like the sketch kernels this is CodegenFallback on purpose — the
  * per-row work is a compiled loop, not an expression tree.
  */
case class BpeEncode(child: Expression, merges: Seq[String]) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // Interned symbol ids + packed-long pair ranks, built once per task: the
  // merge loop then tests candidate pairs with primitive map lookups instead
  // of allocating a concatenated key per pair per round — the hot path when
  // this kernel runs over 100 TB of text. A symbol absent from the table can
  // never be part of a ranked pair (id -1 short-circuits).
  @transient private lazy val symId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 3)
    def intern(s: String): Unit = if (!m.containsKey(s)) m.put(s, m.size)
    merges.foreach { line =>
      val sp = line.indexOf(' ')
      if (sp > 0) {
        val a = line.substring(0, sp); val b = line.substring(sp + 1)
        intern(a); intern(b); intern(a + b)
      }
    }
    m
  }
  @transient private lazy val pairRank: BpeEncode.LongIntMap = {
    val m = new BpeEncode.LongIntMap(merges.size)
    var i = 0
    merges.foreach { line =>
      val sp = line.indexOf(' ')
      if (sp > 0) {
        val a = symId.get(line.substring(0, sp)).longValue()
        val b = symId.get(line.substring(sp + 1)).longValue()
        if (m.putIfAbsent((a << 32) | b, i)) i += 1
      }
    }
    m
  }
  private def idOf(s: String): Int = {
    val v = symId.get(s); if (v == null) -1 else v.intValue()
  }

  // Java regex \\s: [ \\t\\n\\x0B\\f\\r] - the same set the oracle-side
  // regexp_replace removes, so the round-trip identity is self-consistent
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def encodeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // pathological unbroken runs (minified JS, base64 blobs) would make the
    // merge loop O(L^2); real tokenizers cap per-word input the same way
    // (e.g. WordPiece max_input_chars_per_word). Emitting the run as ONE
    // token preserves the round-trip identity — no characters are lost.
    if (word.length > BpeEncode.maxWordChars) {
      out.add(UTF8String.fromString(word)); return
    }
    var n = 0
    val syms = new Array[String](word.length)
    val ids = new Array[Int](word.length)
    var i = 0
    while (i < word.length) { // split into code points, not chars
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = word.substring(i, i + w)
      ids(n) = idOf(syms(n))
      n += 1
      i += w
    }
    var done = n < 2
    while (!done) {
      // lowest-rank adjacent pair present in this word (primitive lookups)
      var bestRank = Int.MaxValue
      var bestA = -1; var bestB = -1
      var j = 0
      while (j < n - 1) {
        if (ids(j) >= 0 && ids(j + 1) >= 0) {
          val r = pairRank.get((ids(j).toLong << 32) | ids(j + 1).toLong)
          if (r >= 0 && r < bestRank) {
            bestRank = r; bestA = ids(j); bestB = ids(j + 1)
          }
        }
        j += 1
      }
      if (bestA < 0) done = true
      else {
        // merge EVERY occurrence of the chosen pair, left to right, in place
        var rd = 0; var wr = 0
        var mergedStr: String = null; var mergedId = -2
        while (rd < n) {
          if (rd < n - 1 && ids(rd) == bestA && ids(rd + 1) == bestB) {
            if (mergedId == -2) { // resolve the merged symbol once
              mergedStr = syms(rd) + syms(rd + 1)
              mergedId = idOf(mergedStr)
            }
            syms(wr) = mergedStr; ids(wr) = mergedId
            rd += 2
          } else { syms(wr) = syms(rd); ids(wr) = ids(rd); rd += 1 }
          wr += 1
        }
        n = wr
        done = n < 2
      }
    }
    var t = 0
    while (t < n) { out.add(UTF8String.fromString(syms(t))); t += 1 }
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String](text.length / 4 + 4)
    var i = 0
    while (i < text.length) {
      while (i < text.length && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < text.length && !isWs(text.charAt(i))) i += 1
      if (i > start) encodeWord(text.substring(start, i), out)
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}
object BpeEncode {
  /** Per-word merge-loop cap (chars); longer runs pass through whole. */
  val maxWordChars = 1000

  /** Minimal open-addressing long->int map (power-of-two table, linear
    * probing, splitmix finalizer) so the per-pair rank probe in the merge
    * loop is truly allocation-free — java.util.HashMap[Long, Integer] boxes
    * a key per lookup. get returns -1 for absent (ranks are >= 0).
    */
  private[functions] final class LongIntMap(sizeHint: Int) {
    private val cap = Integer.highestOneBit(math.max(sizeHint, 8) * 4 - 1) << 1
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val vals = new Array[Int](cap)
    private val used = new Array[Boolean](cap)
    private def slot(k: Long): Int = {
      val h = Mix.mix(k)
      (h ^ (h >>> 32)).toInt & mask
    }
    /** putIfAbsent; returns true when the key was new. */
    def putIfAbsent(k: Long, v: Int): Boolean = {
      var i = slot(k)
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      if (used(i)) false
      else { used(i) = true; keys(i) = k; vals(i) = v; true }
    }
    def get(k: Long): Int = {
      var i = slot(k)
      while (used(i)) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      -1
    }
  }
}

/** Driver-local BPE merge training over a (word, weight) frequency table —
  * the bounded-sample fit [[graft.nodes.BpeTokenizerNode]] runs. Tokenizer
  * TRAINING is a single-node job on a capped sample in every real pipeline
  * (the corpus-scale work is application, which the kernel above
  * distributes); determinism: ties break by (count desc, pair asc).
  */
object BpeTrain {
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[String] = {
    // word -> mutable symbol list, parallel weight array
    val words = wordFreq.map { case (w, _) =>
      val syms = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      syms
    }.toArray
    val weight = wordFreq.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val s = words(wi)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + weight(wi)
          j += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bestPair, bestCount) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) } // count desc, pair asc
        if (bestCount < 2) exhausted = true // nothing repeats: merging is noise
        else {
          merges += s"${bestPair._1} ${bestPair._2}"
          wi = 0
          while (wi < words.length) {
            val s = words(wi)
            var j = 0
            while (j < s.length - 1) {
              if (s(j) == bestPair._1 && s(j + 1) == bestPair._2) {
                s(j) = bestPair._1 + bestPair._2
                s.remove(j + 1)
              } else j += 1
            }
            wi += 1
          }
        }
      }
      m += 1
    }
    merges.toSeq
  }
}
