package graft.nodes

import graft.dag._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.{broadcast, col, expr}
import org.apache.spark.sql.types._

/** Multimodal-column nodes (north-star scope): image/audio/video payloads are
  * opaque `BinaryType` columns with typed metadata structs.
  *
  * The image path is a REAL codec: `javax.imageio` PNG encode/decode (zlib
  * deflate, filtering, the whole format) with pixel statistics computed from
  * the decoded raster; resize is an actual nearest-neighbor resample over
  * decoded pixels, re-encoded to PNG. The audio path parses real RIFF/WAVE
  * headers (chunk walk, PCM16 format fields) and computes per-chunk sample
  * statistics from the decoded PCM stream. Because the testdata parquet has
  * no real media blobs, `SyntheticImageNode`/`SyntheticAudioNode` synthesize
  * deterministic payloads in-query — real PNG/WAV bytes, so the decode side
  * exercises the same code path production blobs would, and the pixel/sample
  * formulas are engine-independent integer arithmetic the DuckDB oracle
  * recomputes from the data alone (q31/q54). The video path is REAL too
  * (round 7): `SyntheticAviNode` writes genuine RIFF/AVI containers and
  * `FrameSampleNode` walks hdrl/movi lists to index `00db`/`00dc` frame
  * chunks with container-derived timestamps (q32).
  *
  * Scale notes: binary payloads dominate partition size — pair these nodes
  * with maxPartitionBytes tuning so a partition of blobs fits executor
  * memory; every transform here is narrow (zero shuffle). Codecs run inside
  * mapPartitions so per-batch init (ImageIO cache off, reusable buffers)
  * amortizes, the reason these are not per-row UDFs.
  */
object MultimodalSchemas {
  /** Temp column names that cannot collide with input columns: `withColumn`
    * on an existing name REPLACES it in place instead of appending, which
    * would silently shift the positional drop/read logic below (ADVICE r6).
    */
  def tmpNames(df: DataFrame, bases: String*): Seq[String] = {
    val taken = scala.collection.mutable.Set[String](df.columns: _*)
    bases.map { b =>
      var n = b
      while (taken.contains(n)) n += "_"
      taken += n
      n
    }
  }

  val imageMeta: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic synthetic pixel (LONG arithmetic + floorMod — mirrored
    * by the q31 oracle SQL, which computes in int64): channel values of
    * pixel (x, y) under seed s. Int arithmetic would wrap for seeds above
    * ~69M (s * 31 > Int.MaxValue) and diverge from the oracle (ADVICE r7).
    */
  @inline def pxR(x: Int, y: Int, s: Int): Int =
    Math.floorMod(x.toLong * 31 + y.toLong * 17 + s, 256L).toInt
  @inline def pxG(x: Int, y: Int, s: Int): Int =
    Math.floorMod(x.toLong * 7 + y.toLong * 13 + 3L * s, 256L).toInt
  @inline def pxB(x: Int, y: Int, s: Int): Int =
    Math.floorMod(x.toLong + y + 7L * s, 256L).toInt

  /** Deterministic synthetic PCM16 sample i under seed s (q54 oracle). */
  @inline def pcm(i: Int, s: Int): Int =
    (Math.floorMod(s.toLong * 31 + i.toLong * 7919, 65536L) - 32768).toInt

  /** Deterministic synthetic AVI frame byte j of frame f under seed s
    * (q32 oracle). */
  @inline def frameByte(f: Int, j: Int, s: Int): Int =
    Math.floorMod(s.toLong * 31 + f.toLong * 101 + j.toLong * 7, 256L).toInt
}

/** Attach a binary payload column derived from an existing column (testdata
  * has no real blobs; production replaces this source with parquet/binaryFile
  * scans of real media).
  */
class BinaryPayloadNode(val srcCol: String, val outCol: String = "payload") extends Node {
  override protected def defaultName: String = "binary_payload"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("binary_payload")
  override def jsonParams: Map[String, Any] = Map("srcCol" -> srcCol, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] =
    Map("result" -> in("df").withColumn(outCol, expr(s"cast($srcCol as binary)")))
}

/** Deterministic in-query PNG synthesis: per row, render a `wExpr` x `hExpr`
  * RGB image whose pixel (x, y) is the fixed integer formula in
  * [[MultimodalSchemas]] under `seedExpr`, and encode it with the REAL
  * `javax.imageio` PNG writer. Downstream decoders therefore exercise a
  * genuine compressed image format while every decoded pixel stays
  * predictable cross-engine. Narrow mapPartitions; payload size is bounded
  * by the expression-supplied dimensions.
  */
class SyntheticImageNode(
    val wExpr: String,
    val hExpr: String,
    val seedExpr: String,
    val outCol: String = "payload")
  extends Node {
  override protected def defaultName: String = "synthetic_image"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("synthetic_image")
  override def jsonParams: Map[String, Any] =
    Map("wExpr" -> wExpr, "hExpr" -> hExpr, "seedExpr" -> seedExpr, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val Seq(wN, hN, sN) = MultimodalSchemas.tmpNames(df, "__w", "__h", "__s")
    val prepped = df
      .withColumn(wN, expr(wExpr).cast(IntegerType))
      .withColumn(hN, expr(hExpr).cast(IntegerType))
      .withColumn(sN, expr(seedExpr).cast(IntegerType))
    val base = prepped.schema.fields.dropRight(3)
    val outSchema = StructType(base :+ StructField(outCol, BinaryType, nullable = true))
    val nBase = base.length
    val nodeName = name
    val (wE, hE, sE) = (wExpr, hExpr, seedExpr)
    val out = prepped.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { row =>
        // fail with the parameter name, not an opaque NPE from getInt /
        // the BufferedImage ctor deep inside the task (ADVICE r6)
        if (row.isNullAt(nBase) || row.isNullAt(nBase + 1) || row.isNullAt(nBase + 2))
          throw new GraftException(s"synthetic_image '$nodeName': wExpr='$wE', " +
            s"hExpr='$hE', seedExpr='$sE' must all be non-null castable ints")
        val (w, h, s) = (row.getInt(nBase), row.getInt(nBase + 1), row.getInt(nBase + 2))
        if (w <= 0 || h <= 0 || s < 0)
          throw new GraftException(s"synthetic_image '$nodeName': need width > 0, " +
            s"height > 0, seed >= 0 — got ($w, $h, $s)")
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            import MultimodalSchemas.{pxB, pxG, pxR}
            px(y * w + x) = (pxR(x, y, s) << 16) | (pxG(x, y, s) << 8) | pxB(x, y, s)
            x += 1
          }
          y += 1
        }
        img.setRGB(0, 0, w, h, px, 0, w)
        val bos = new java.io.ByteArrayOutputStream(w * h / 2 + 128)
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(row.toSeq.take(nBase) :+ bos.toByteArray)
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** REAL image decode: `javax.imageio` reads the payload (PNG/JPEG/GIF/BMP —
  * whatever readers the JVM registers), emits a metadata struct and the
  * per-channel pixel sums from the decoded raster. Undecodable/null payloads
  * yield null columns (kept, not dropped — the corrupt-blob audit signal).
  * `prefix` namespaces the output columns so the node can run twice in one
  * pipeline (e.g. before and after a resize).
  */
class DecodeImageNode(val payloadCol: String = "payload", val prefix: String = "image")
  extends Node {
  override protected def defaultName: String = "decode_image"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("decode_image")
  override def jsonParams: Map[String, Any] =
    Map("payloadCol" -> payloadCol, "prefix" -> prefix)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(s"${prefix}_meta", MultimodalSchemas.imageMeta, nullable = true),
      StructField(s"${prefix}_sums", ArrayType(LongType, containsNull = false), nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val out = df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val img =
          if (bytes == null) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val fmt = DecodeImageNode.sniffFormat(bytes)
          val meta = Row(w, h, img.getColorModel.getNumComponents, fmt)
          // bulk raster read: one sRGB int[] instead of w*h getRGB calls
          // (the per-pixel path dominated decode cost in the 10x probe)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            i += 1
          }
          Row.fromSeq(row.toSeq ++ Seq(meta, Array(sr, sg, sb)))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

object DecodeImageNode {
  /** Container format from magic bytes (metadata only — decode itself is
    * whatever reader ImageIO picked). */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else "unknown"
}

/** REAL image resize: decode the payload, nearest-neighbor resample to
  * `targetW` x `targetH` — target pixel (x, y) takes source pixel
  * (x*sw div tw, y*sh div th), the floor mapping, fully specified so the
  * resampled raster is engine-independently predictable — and re-encode to
  * PNG in `outCol` (+ `<outCol>_meta`). The resample loop is ours rather
  * than Graphics2D.drawImage because drawImage's interpolation rounding is
  * implementation-defined — unacceptable for a reproducible pipeline.
  */
class ResizeImageNode(
    val targetW: Int,
    val targetH: Int,
    val payloadCol: String = "payload",
    val outCol: String = "resized")
  extends Node {
  require(targetW > 0 && targetH > 0, "target dimensions must be positive")
  override protected def defaultName: String = "resize_image"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("resize_image")
  override def jsonParams: Map[String, Any] =
    Map("targetW" -> targetW, "targetH" -> targetH, "payloadCol" -> payloadCol, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outCol, BinaryType, nullable = true),
      StructField(s"${outCol}_meta", MultimodalSchemas.imageMeta, nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val (tw, th) = (targetW, targetH)
    val out = df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val img =
          if (bytes == null) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val dst = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          // bulk source raster + bulk target write (see DecodeImageNode)
          val src = img.getRGB(0, 0, sw, sh, null, 0, sw)
          val outPx = new Array[Int](tw * th)
          var y = 0
          while (y < th) {
            val sy = y * sh / th
            var x = 0
            while (x < tw) {
              outPx(y * tw + x) = src(sy * sw + x * sw / tw) & 0xFFFFFF
              x += 1
            }
            y += 1
          }
          dst.setRGB(0, 0, tw, th, outPx, 0, tw)
          val bos = new java.io.ByteArrayOutputStream(tw * th / 2 + 128)
          javax.imageio.ImageIO.write(dst, "png", bos)
          val meta = Row(tw, th, img.getColorModel.getNumComponents, "png")
          Row.fromSeq(row.toSeq ++ Seq(bos.toByteArray, meta))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Perceptual image hash (dHash): decode the payload, resample to a
  * (hashW+1) x hashH luma grid with the SAME fully-specified floor
  * nearest-neighbor mapping as [[ResizeImageNode]], and set bit
  * (y * hashW + x) iff luma(x, y) < luma(x + 1, y) — the
  * gradient-direction hash that survives re-encoding, resizing, and mild
  * brightness shifts, the standard first pass of image near-dup at LAION
  * scale. Everything is integer arithmetic (luma = 299 r + 587 g + 114 b,
  * unnormalized — comparisons are scale-invariant), so the hash is
  * engine- and platform-independent. Output: one BIGINT column (bit 63 =
  * grid position 0); null payloads / undecodable blobs yield null (the
  * corrupt-blob audit convention of [[DecodeImageNode]]). Narrow
  * mapPartitions — zero shuffle; pair with [[HammingNearDupNode]] for the
  * banded near-dup join.
  */
class ImageDHashNode(
    val payloadCol: String = "payload",
    val outCol: String = "dhash",
    val hashW: Int = 8,
    val hashH: Int = 8)
  extends Node {
  require(hashW > 0 && hashH > 0 && hashW * hashH <= 64,
    s"dhash grid must fit 64 bits, got $hashW x $hashH")
  override protected def defaultName: String = "image_dhash"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("image_dhash")
  override def jsonParams: Map[String, Any] =
    Map("payloadCol" -> payloadCol, "outCol" -> outCol, "hashW" -> hashW, "hashH" -> hashH)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val (hw, hh) = (hashW, hashH)
    val out = df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val img =
          if (bytes == null) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row.fromSeq(row.toSeq :+ null)
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val src = img.getRGB(0, 0, sw, sh, null, 0, sw)
          // (hw+1) x hh luma grid, ResizeImageNode's floor mapping
          val gw = hw + 1
          val luma = new Array[Int](gw * hh)
          var y = 0
          while (y < hh) {
            val sy = y * sh / hh
            var x = 0
            while (x < gw) {
              val rgb = src(sy * sw + x * sw / gw)
              luma(y * gw + x) = 299 * ((rgb >> 16) & 0xFF) +
                587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          var h = 0L
          var i = 0
          while (i < hw * hh) {
            val (yy, xx) = (i / hw, i % hw)
            if (luma(yy * gw + xx) < luma(yy * gw + xx + 1))
              h |= 1L << (63 - i)
            i += 1
          }
          Row.fromSeq(row.toSeq :+ h)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Banded Hamming near-dup join over ANY 64-bit hash column (perceptual
  * dhash, simhash, any LSB-packed sketch): emit (id_a, id_b) pairs with
  * popcount(hash_a XOR hash_b) <= maxHamming. Pigeonhole-exact — the hash
  * is split into maxHamming + 1 bit chunks, so two hashes within the
  * budget MUST agree on at least one whole chunk; candidates come from a
  * keyed equi-join on (chunk index, chunk value) and the exact
  * `bit_count` filter runs only on candidates. Recall is therefore 100%
  * BY CONSTRUCTION (no probability), matching SimHashDedupNode's
  * pigeonhole contract but decoupled from text sketching.
  *
  * Scale: the banding join shuffles skinny (chunk, id, hash) rows on the
  * chunk key; a degenerate chunk value shared by B rows yields B^2/2
  * candidates, so `maxBucket` drops over-hot (chunk index, value) buckets
  * whole (the MinHash/SimHash cap convention — dropped buckets can only
  * lose pairs that OTHER chunks usually still surface; a null-hash row
  * never pairs). Null hashes (undecodable payloads) are excluded.
  */
private[nodes] object HammingBands {
  import org.apache.spark.sql.functions.{array, explode, lit, struct}
  /** Explode `hashSrc` (a 64-bit column named `__h` on `df`) into
    * pigeonhole chunk keys (__c, __v): nChunks FLOOR-width bit chunks via
    * unsigned shifts (sign bit never smears); a full-width chunk is the
    * hash itself. Two hashes within `nChunks - 1` bit flips MUST agree on
    * at least one whole chunk: flips in the ≤ 63 - nChunks*w uncovered
    * top bits never break a chunk agreement, and the covered flips are
    * ≤ nChunks - 1 across nChunks chunks (the SimHashDedupNode argument).
    *
    * The width must be the FLOOR of 64/nChunks: the former ceil width
    * shifted the last chunk's offset past bit 63 for nChunks ∉ {divisors
    * of 64} — and Java/Spark long shifts wrap mod 64, so that chunk
    * silently DUPLICATED chunk 0's bits. Pigeonhole then had one fewer
    * effective chunk, and a pair at hamming distance exactly nChunks - 1
    * with one flip per real chunk was MISSED (found by the PropertySpec
    * random oracle at maxHamming = 8, round 16). */
  def chunkKeys(df: DataFrame, nChunks: Int): DataFrame = {
    val w = 64 / nChunks
    def chunkVal(c: Int): String =
      if (w >= 64) "__h"
      else s"shiftrightunsigned(__h, ${c * w}) & ${(1L << w) - 1}L"
    df.withColumn("__ck", explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("c"), expr(chunkVal(c)).as("v"))
      }: _*)))
      .withColumn("__c", col("__ck.c")).withColumn("__v", col("__ck.v"))
      .drop("__ck")
  }
}

class HammingNearDupNode(
    val idCol: String,
    val hashCol: String,
    val maxHamming: Int = 3,
    val maxBucket: Int = 10000,
    val outA: String = "id_a",
    val outB: String = "id_b")
  extends Node {
  require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
  override protected def defaultName: String = "hamming_near_dup"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("hamming_near_dup")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol,
    "hashCol" -> hashCol, "maxHamming" -> maxHamming, "maxBucket" -> maxBucket,
    "outA" -> outA, "outB" -> outB)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val rows = in("df").select(col(idCol).as("__id"), col(hashCol).as("__h"))
      .filter(col("__h").isNotNull)
    val chunks = HammingBands.chunkKeys(rows, maxHamming + 1)
    // hot-bucket cap (dropped whole, the LSH convention) via groupBy +
    // semi-join — the DHashIndexNode shape. The former count-over-Window
    // cap fully materialized every bucket, and the two aliased projections
    // below then recomputed the capped chunk table per join side: at
    // corpus scale that doubled the one shuffle this operator owns. ONE
    // persisted chunk frame now feeds both sides (VERDICT r12 wrong #4).
    val ok = chunks.groupBy("__c", "__v").count()
      .filter(col("count") <= maxBucket).select("__c", "__v")
    val capped = ctx.track(chunks.join(ok, Seq("__c", "__v")))
    val a = capped.select(col("__c"), col("__v"),
      col("__id").as(outA), col("__h").as("__ha"))
    val b = capped.select(col("__c"), col("__v"),
      col("__id").as(outB), col("__h").as("__hb"))
    val pairs = a.join(b, Seq("__c", "__v"))
      .filter(col(outA) < col(outB))
      .filter(expr(s"bit_count(__ha ^ __hb) <= $maxHamming"))
      .select(outA, outB).distinct()
    Map("result" -> pairs)
  }
}

/** INCREMENTAL perceptual-hash near-dup index — the image-corpus member of
  * the incremental index family (near-dup/ANN/lexical/cluster), sharing
  * their whole day-2 lifecycle: fit once over (id, 64-bit hash) rows —
  * compose [[ImageDHashNode]] upstream for images, or any other 64-bit
  * sketch — then check deltas delta-sized (`transform` on port "delta"),
  * fold admitted deltas in (`updateIndex`), remove takedowns
  * (`deleteFromIndex`), stream maintenance through
  * `IndexMaintenance.maintainFromStream` (exactly-once replay guard), and
  * persist with saveFitted/loadFitted.
  *
  * The candidate join is the [[HammingNearDupNode]] pigeonhole shape
  * (100% recall within `maxHamming` by construction); the index stores
  * the hash ledger (base_id, hash) plus the capped chunk-bucket table
  * pre-partitioned for the delta join. `maxBucket` drops over-hot
  * (chunk, value) buckets whole — the LSH cap convention; like
  * MinHashIndexNode the cap is order-sensitive across update generations
  * and `rebuildIndex` re-derives the bucket table from the ledger
  * bit-identically to a from-scratch fit over the live rows (bucket
  * resurrection after deletion waves). Exactness contract: transform ==
  * the banded join over the live ledger, EXCEPT rows in buckets dropped
  * while over the cap (under-recall only, never false positives).
  *
  * Scale: fit/update/delete are ledger-sized anti-joins/unions with
  * skinny (c, v, id, h) rows; serving shuffles only the delta's chunk
  * keys against the persisted buckets. A streaming delta is refused
  * toward the foreachBatch serving pattern (StreamServing) — the batch
  * plan is already delta-sized.
  */
class DHashIndexNode(
    val idCol: String = "doc_id",
    val hashCol: String = "dhash",
    val maxHamming: Int = 3,
    val maxBucket: Int = 10000,
    val compactEvery: Int = 0,
    val compactPath: Option[String] = None)
  extends EstimatorNode with IncrementalIndex {
  require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
  require(compactEvery >= 0, "compactEvery must be >= 0")
  type Model = DHashIndexNode.Index
  override protected def defaultName: String = "dhash_index"
  val inputs = Seq(Port("corpus"), Port("delta"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("dhash_index")
  override def jsonParams: Map[String, Any] = Map(
    "idCol" -> idCol, "hashCol" -> hashCol, "maxHamming" -> maxHamming,
    "maxBucket" -> maxBucket, "compactEvery" -> compactEvery,
    "compactPath" -> compactPath.orNull)

  private def ledgerOf(df: DataFrame, outId: String): DataFrame =
    df.select(col(idCol).as(outId), col(hashCol).as("__h"))
      .filter(col("__h").isNotNull)

  private def cappedBuckets(ledger: DataFrame): DataFrame = {
    val chunks = HammingBands.chunkKeys(ledger, maxHamming + 1)
    val ok = chunks.groupBy("__c", "__v").count()
      .filter(col("count") <= maxBucket).select("__c", "__v")
    chunks.join(ok, Seq("__c", "__v"))
      .select("__c", "__v", "base_id", "__h")
  }

  // ---- columnar MoR state (SegStore, VERDICT r16 next #2): O(delta)
  // per-wave writes; cap-drops ride COMPOSITE-KEY tombstones on the
  // (__c, __v) chunk-bucket key — the MinHashIndexNode conversion's twin ----
  @volatile private var ledStore: Option[SegStore] = None
  @volatile private var bkStore: Option[SegStore] = None
  private def segRoot: Option[String] = compactPath.map(_ + "/segs")
  private def idxStores: Seq[SegStore] = Seq(ledStore, bkStore).flatten

  def fitModel(ctx: Ctx, in: In): Model = {
    import org.apache.spark.storage.StorageLevel
    val ledger = ledgerOf(in("corpus"), "base_id").persist(StorageLevel.MEMORY_AND_DISK)
    val buckets = cappedBuckets(ledger).persist(StorageLevel.MEMORY_AND_DISK)
    idxStores.foreach(_.unpersistAll()) // refit releases any old stores
    ledStore = Some(new SegStore(s"${name}_led", segRoot).reset(ledger))
    bkStore = Some(new SegStore(s"${name}_bk", segRoot).reset(buckets))
    DHashIndexNode.Index(ledger, buckets)
  }

  def applyModel(m: Model, ctx: Ctx, in: In): Map[String, DataFrame] = {
    val delta = in("delta")
    if (delta.isStreaming)
      throw new GraftException(
        s"dhash_index '$name': streaming delta refused — serve per micro-batch " +
          "through StreamServing.serveStream (the batch plan is delta-sized), " +
          "and maintain via IndexMaintenance.maintainFromStream")
    // BROADCAST the delta chunk keys against the persisted buckets — the
    // corpus side never shuffles at serve time (the serving contract every
    // index family pins; a sort-merge here would re-shuffle the corpus
    // per probe batch)
    val dch = org.apache.spark.sql.functions.broadcast(
      HammingBands.chunkKeys(ledgerOf(delta, "delta_id"), maxHamming + 1)
        .withColumnRenamed("__h", "__hd"))
    val pairs = dch.join(m.buckets, Seq("__c", "__v"))
      .filter(expr(s"bit_count(__hd ^ __h) <= $maxHamming"))
      .select(col("delta_id"), col("base_id"),
        expr("cast(bit_count(__hd ^ __h) as int)").as("hamming"))
      .distinct()
    Map("result" -> pairs)
  }

  /** Fold a delta into the index with O(delta) state writes (SegStore):
    * the hash rows and surviving chunk keys land as parquet segments, a
    * bucket crossing `maxBucket` after growth drops WHOLE via a
    * composite-key tombstone (the fit-time guard re-applied;
    * order-sensitive like MinHashIndexNode, `rebuildIndex` is the exact
    * re-derivation). */
  def updateIndex(ctx: Ctx, delta: DataFrame): Unit = {
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    val ls = ledStore.get; val bs = bkStore.get
    // O(delta) state writes: the delta's hash rows land once as a parquet
    // segment; chunk keys derive from the CACHED segment
    val ledSeg = ls.appendSegment(ledgerOf(delta, "base_id").select("base_id", "__h"))
    val freshKeys = HammingBands.chunkKeys(ledSeg, maxHamming + 1)
      .select("__c", "__v", "base_id", "__h")
    // cap re-evaluation restricted to the TOUCHED buckets (stored buckets
    // are ≤ maxBucket by invariant — only buckets the delta lands in can
    // cross it): delta-bucket-sized per wave. No explicit broadcast hint
    // (ADVICE r16 — a large wave makes these delta×chunks-sized; the
    // autoBroadcast threshold decides from plan stats).
    val touched = freshKeys.select("__c", "__v").distinct()
    val overCap = m.buckets.select("__c", "__v")
      .join(touched, Seq("__c", "__v"), "left_semi")
      .union(freshKeys.select("__c", "__v"))
      .groupBy("__c", "__v").count()
      .filter(col("count") > maxBucket).select("__c", "__v")
    // a bucket crossing the cap drops WHOLE: composite-key tombstone at
    // this generation; the fresh keys landing in it are filtered out of
    // the insert segment (same semantics as the pre-SegStore rewrite,
    // including later-wave repopulation). Cap-crossings are RARE — an
    // empty tombstone costs a parquet-commit write plus a permanent
    // extra channel join until the next fold, so one delta-bucket-sized
    // count decides first (it doubles as the wave's materializing
    // action, filling the ledger segment's cache through freshKeys); the
    // per-wave materializeAll is gone — every remaining frame roots in
    // this wave's parquet, so caches fill lazily with no recompute hazard
    val overCapC = overCap.persist()
    val bkSeg = if (overCapC.count() == 0L) {
      overCapC.unpersist()
      bs.appendDerivedSegment(freshKeys)
    } else {
      val capTomb = bs.appendTombstones(Seq("__c", "__v"), overCapC)
      overCapC.unpersist()
      // DERIVED segment — no second write (lineage roots in this wave's
      // just-written ledger segment + cap tombstones; depth 1, recoverable)
      bs.appendDerivedSegment(
        freshKeys.join(capTomb, Seq("__c", "__v"), "left_anti"))
    }
    model = Some(DHashIndexNode.Index(ls.live, bs.live))
    foldStoresIfDue()
    generation += 1
    if (compactEvery > 0 && generation % compactEvery == 0) compactIndex()
  }

  /** Amortized consolidation (the SegStore contract). */
  private def foldStoresIfDue(): Unit = {
    var folded = false
    idxStores.foreach { st => if (st.needsFold) { st.fold(); folded = true } }
    if (folded)
      model = Some(DHashIndexNode.Index(ledStore.get.live, bkStore.get.live))
  }

  /** Two anti joins; kept buckets only shrink so the cap needs no
    * re-evaluation. Dropped-whole buckets do not resurrect until
    * `rebuildIndex` (the MinHashIndexNode contract). Unknown ids no-op. */
  /** Retention ledger: (idCol, hash) — the per-doc perceptual hash, so
    * blocklist-style retention ("drop every doc carrying hash H") needs
    * no id round-trip. */
  override protected def retentionLedger: Option[(DataFrame, String)] = {
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    Some((m.ledger.select(col("base_id").as(idCol), col("__h").as("hash")), idCol))
  }

  def deleteFromIndex(ctx: Ctx, deletes: DataFrame): Unit = {
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    val ls = ledStore.get; val bs = bkStore.get
    val del = deletes.select(col(idCol).as("base_id")).distinct()
    val ledTomb = ls.appendTombstones("base_id", del)
    bs.adoptTombstones("base_id", ledTomb) // same ids — one write, one file
    // no materializing action: the tombstone is already durable, and its
    // read-back cache fills on first use
    model = Some(DHashIndexNode.Index(ls.live, bs.live))
    foldStoresIfDue()
    generation += 1
    if (compactEvery > 0 && generation % compactEvery == 0) compactIndex()
  }

  /** Re-derive the bucket table from the hash ledger — bit-identical to a
    * from-scratch fit over the live rows, including cap resurrection. */
  def rebuildIndex(): Unit = {
    import org.apache.spark.storage.StorageLevel
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    val newBuckets = cappedBuckets(m.ledger.select("base_id", "__h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    newBuckets.count()
    // full bucket-table replacement (cap resurrection): re-seed the store
    bkStore.foreach { st => st.unpersistAll(); st.reset(newBuckets) }
    model = Some(DHashIndexNode.Index(m.ledger, newBuckets))
    generation += 1
    if (compactEvery > 0 && generation % compactEvery == 0) compactIndex()
  }

  @volatile private var generation: Long = 0L
  @volatile private var compactGen: Long = 0L

  /** Truncate lineage to a parquet scan (double-buffered under
    * `compactPath` — the MinHashIndexNode convention). */
  def compactIndex(): Unit = {
    import org.apache.spark.storage.StorageLevel
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    val path = compactPath match {
      case Some(root) => compactGen += 1; s"$root/gen-${compactGen % 2}"
      case None =>
        val d = java.nio.file.Files.createTempDirectory("graft_idx_compact_")
        d.toFile.deleteOnExit()
        d.toString
    }
    val session = m.ledger.sparkSession
    saveFitted(path) // writes the RESOLVED live frames (store pieces folded)
    val led = session.read.parquet(s"$path/ledger")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bk = session.read.parquet(s"$path/buckets")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ledStore.foreach { st => st.unpersistAll(); st.reset(led) }
    bkStore.foreach { st => st.unpersistAll(); st.reset(bk) }
    model = Some(DHashIndexNode.Index(led, bk))
  }

  def unpersistIndex(): Unit = model.foreach { _ => idxStores.foreach(_.unpersistAll()) }

  override def saveFitted(path: String): Unit = {
    val m = model.getOrElse(
      throw new GraftException(s"estimator node '$name' not fitted"))
    m.ledger.write.mode("overwrite").parquet(s"$path/ledger")
    m.buckets.write.mode("overwrite").parquet(s"$path/buckets")
    saveMaintenanceState(m.ledger.sparkSession, path)
  }
  override def loadFitted(path: String): Unit = loadFitted(path, None)
  def loadFitted(path: String, session: Option[org.apache.spark.sql.SparkSession]): Unit = {
    import org.apache.spark.storage.StorageLevel
    val spark = session.getOrElse(org.apache.spark.sql.SparkSession.active)
    val ledger = spark.read.parquet(s"$path/ledger")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the bucket table is RE-DERIVED from the ledger at load (one pass
    // over the skinny (id, hash) frame): bucket values are a pure function
    // of (hash, chunk layout), and pre-fix saves carry ceil-width chunk
    // values that would silently mismatch new delta keys (see
    // HammingBands.chunkKeys). Load therefore follows the rebuildIndex
    // contract — bit-identical to a from-scratch fit over the live rows,
    // including cap resurrection.
    val bk = cappedBuckets(ledger.select("base_id", "__h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    idxStores.foreach(_.unpersistAll())
    ledStore = Some(new SegStore(s"${name}_led", segRoot).reset(ledger))
    bkStore = Some(new SegStore(s"${name}_bk", segRoot).reset(bk))
    model = Some(DHashIndexNode.Index(ledger, bk))
    loadMaintenanceState(spark, path)
  }
}

object DHashIndexNode {
  /** The fitted index: the (base_id, hash) ledger + capped chunk buckets. */
  case class Index(ledger: DataFrame, buckets: DataFrame)
}

/** Deterministic in-query WAV synthesis: a REAL RIFF/WAVE container (44-byte
  * canonical header, PCM16 mono little-endian) whose sample i is the fixed
  * integer formula in [[MultimodalSchemas]] under `seedExpr` — decoders
  * exercise genuine WAV header parsing while every sample stays predictable
  * cross-engine.
  */
class SyntheticAudioNode(
    val nSamplesExpr: String,
    val seedExpr: String,
    val sampleRate: Int = 1000,
    val outCol: String = "payload")
  extends Node {
  require(sampleRate > 0, "sampleRate must be positive")
  override protected def defaultName: String = "synthetic_audio"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("synthetic_audio")
  override def jsonParams: Map[String, Any] = Map("nSamplesExpr" -> nSamplesExpr,
    "seedExpr" -> seedExpr, "sampleRate" -> sampleRate, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val Seq(nN, sN) = MultimodalSchemas.tmpNames(df, "__n", "__s")
    val prepped = df
      .withColumn(nN, expr(nSamplesExpr).cast(IntegerType))
      .withColumn(sN, expr(seedExpr).cast(IntegerType))
    val base = prepped.schema.fields.dropRight(2)
    val outSchema = StructType(base :+ StructField(outCol, BinaryType, nullable = true))
    val nBase = base.length
    val rate = sampleRate
    val nodeName = name
    val (nE, sE) = (nSamplesExpr, seedExpr)
    val out = prepped.mapPartitions { rows =>
      rows.map { row =>
        if (row.isNullAt(nBase) || row.isNullAt(nBase + 1))
          throw new GraftException(s"synthetic_audio '$nodeName': nSamplesExpr='$nE', " +
            s"seedExpr='$sE' must be non-null castable ints")
        val (n, s) = (row.getInt(nBase), row.getInt(nBase + 1))
        if (n <= 0 || s < 0)
          throw new GraftException(s"synthetic_audio '$nodeName': need nSamples > 0, " +
            s"seed >= 0 — got ($n, $s)")
        val dataBytes = n * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
          .put("WAVE".getBytes("US-ASCII"))
        buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1.toShort)       // PCM
          .putShort(1.toShort)       // mono
          .putInt(rate)              // sample rate
          .putInt(rate * 2)          // byte rate
          .putShort(2.toShort)       // block align
          .putShort(16.toShort)      // bits per sample
        buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
        var i = 0
        while (i < n) { buf.putShort(MultimodalSchemas.pcm(i, s).toShort); i += 1 }
        Row.fromSeq(row.toSeq.take(nBase) :+ buf.array())
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** REAL audio chunking: walks the RIFF chunk list of the WAV payload (any
  * compliant writer's layout, not just byte 44), validates PCM16 mono,
  * derives duration from the format fields + data size — the header math an
  * audio pipeline actually does — then emits one row per `chunkMs` window
  * with the chunk's decoded-sample count and absolute-amplitude sum (the
  * energy proxy for silence trimming / VAD gating). Non-WAV/null payloads
  * emit no rows. `maxChunks` bounds the per-row output fan-out.
  */
class AudioChunkNode(
    val payloadCol: String = "payload",
    val chunkMs: Int = 1000,
    val maxChunks: Int = 8)
  extends Node {
  require(chunkMs > 0 && maxChunks > 0, "chunkMs and maxChunks must be positive")
  override protected def defaultName: String = "audio_chunk"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("audio_chunk")
  override def jsonParams: Map[String, Any] =
    Map("payloadCol" -> payloadCol, "chunkMs" -> chunkMs, "maxChunks" -> maxChunks)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("chunk_start_ms", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("abs_sum", LongType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val (cMs, maxC) = (chunkMs, maxChunks)
    val out = df.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](payloadIdx)
      AudioChunkNode.parseWav(bytes) match {
        case None => Iterator.empty
        case Some((rate, dataOff, nSamples)) =>
          val spc = math.max(1, rate * cMs / 1000) // samples per chunk
          val nChunks = math.min(maxC, math.max(1, (nSamples + spc - 1) / spc))
          val buf = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0 until nChunks).iterator.map { c =>
            val lo = c * spc
            val hi = math.min((c + 1) * spc, nSamples)
            var sum = 0L
            var i = lo
            while (i < hi) { sum += math.abs(buf.getShort(dataOff + 2 * i).toInt); i += 1 }
            // Seq[Any]: an all-numeric Seq would harmonize Int -> Long and
            // break the IntegerType encoder fields
            Row.fromSeq(row.toSeq ++ Seq[Any](c, c.toLong * cMs, hi - lo, sum))
          }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

object AudioChunkNode {
  /** RIFF chunk walk: returns (sampleRate, dataByteOffset, nSamples) for a
    * PCM16 mono WAV, None for anything else. */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1; var bits = -1; var chans = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off); val sz = buf.getInt(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      id match {
        case "fmt " if sz >= 16 =>
          if (buf.getShort(off + 8) != 1) return None // PCM only
          chans = buf.getShort(off + 10)
          rate = buf.getInt(off + 12)
          bits = buf.getShort(off + 22)
        case "data" => dataOff = off + 8; dataLen = sz
        case _ =>
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (rate <= 0 || dataOff < 0 || bits != 16 || chans != 1) None
    else Some((rate, dataOff, dataLen / 2))
  }
}

/** Perceptual AUDIO fingerprint — the audio twin of [[ImageDHashNode]]:
  * walk the real RIFF/WAVE container ([[AudioChunkNode.parseWav]] — PCM16
  * mono), split the sample stream into 65 floor-bounded windows, take each
  * window's absolute-amplitude energy, and set bit (63 - i) iff
  * energy(i) < energy(i + 1) — a 64-bit energy-envelope gradient hash,
  * robust to gain changes (comparisons are scale-free for uniform gain)
  * and fully integer/deterministic. Null for non-WAV/null payloads.
  * Compose with [[HammingNearDupNode]] for batch near-dup or
  * [[DHashIndexNode]] (hashCol = the fingerprint) for the incremental
  * index lifecycle — the banding layer is hash-agnostic. Narrow
  * mapPartitions, zero shuffle.
  */
class AudioFingerprintNode(
    val payloadCol: String = "payload",
    val outCol: String = "afp")
  extends Node {
  override protected def defaultName: String = "audio_fingerprint"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("audio_fingerprint")
  override def jsonParams: Map[String, Any] =
    Map("payloadCol" -> payloadCol, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val out = df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        AudioChunkNode.parseWav(bytes) match {
          case None => Row.fromSeq(row.toSeq :+ null)
          case Some((_, dataOff, nSamples)) =>
            val buf = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val energies = new Array[Long](65)
            var w = 0
            while (w < 65) {
              val lo = w * nSamples / 65
              val hi = (w + 1) * nSamples / 65
              var sum = 0L
              var i = lo
              while (i < hi) {
                sum += math.abs(buf.getShort(dataOff + 2 * i).toInt)
                i += 1
              }
              energies(w) = sum
              w += 1
            }
            var h = 0L
            var i = 0
            while (i < 64) {
              if (energies(i) < energies(i + 1)) h |= 1L << (63 - i)
              i += 1
            }
            Row.fromSeq(row.toSeq :+ h)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Perceptual VIDEO fingerprint — completes the modality triple
  * (image [[ImageDHashNode]], audio [[AudioFingerprintNode]]): walk the
  * real RIFF/AVI container ([[FrameSampleNode.parseAvi]] — hdrl/movi
  * lists, `##db`/`##dc` video chunks), concatenate the video-frame byte
  * stream, split it into 65 floor-bounded windows, and emit the 64-bit
  * energy-gradient hash over per-window unsigned-byte sums. Integer-exact
  * and container-derived (audio chunks, JUNK, and indexes skip through the
  * walk untouched); null for non-AVI/null payloads. Composes with the
  * hash-agnostic [[HammingNearDupNode]] / [[DHashIndexNode]] banding
  * layer. Narrow mapPartitions, zero shuffle.
  */
class VideoFingerprintNode(
    val payloadCol: String = "payload",
    val outCol: String = "vfp")
  extends Node {
  override protected def defaultName: String = "video_fingerprint"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("video_fingerprint")
  override def jsonParams: Map[String, Any] =
    Map("payloadCol" -> payloadCol, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val out = df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        FrameSampleNode.parseAvi(bytes) match {
          case None => Row.fromSeq(row.toSeq :+ null)
          case Some((_, frames)) =>
            val total = frames.map(_._2.toLong).sum
            if (total == 0L) Row.fromSeq(row.toSeq :+ null)
            else {
              // per-window sums over the CONCATENATED frame byte stream;
              // walk frames once, bucketing each byte by its global index
              val energies = new Array[Long](65)
              var g = 0L
              frames.foreach { case (off, sz) =>
                var j = 0
                while (j < sz) {
                  energies(((g * 65) / total).toInt) += (bytes(off + j) & 0xFF)
                  g += 1; j += 1
                }
              }
              var h = 0L
              var i = 0
              while (i < 64) {
                if (energies(i) < energies(i + 1)) h |= 1L << (63 - i)
                i += 1
              }
              Row.fromSeq(row.toSeq :+ h)
            }
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Write each row's binary payload as ONE FILE under `dir`, named by
  * `nameExpr` — the media-export sink (eval-set image dumps, audio shards
  * for an external labeler). Uses the Hadoop FileSystem API so `dir` may be
  * hdfs:///s3a:// on a cluster; the Hadoop conf ships to executors as a
  * serialized key-value map. One file per row is deliberately an EXPORT
  * shape: a corpus-sized blob pipeline keeps payloads inside parquet
  * (BinaryType columns) — a billion tiny files is a filesystem DoS, which
  * is why this node caps per-task files with no shuffle but does not try to
  * be the 100 TB path.
  *
  * `nameExpr` must be unique per row: duplicate names silently overwrite
  * (last concurrent writer wins) — derive names from the row id.
  * `mode`: "overwrite" (delete dir first) | "errorifexists".
  */
class BinaryFileSinkNode(
    val dir: String,
    val nameExpr: String,
    val payloadCol: String = "payload",
    val mode: String = "overwrite")
  extends Node {
  require(Seq("overwrite", "errorifexists").contains(mode),
    s"mode must be overwrite|errorifexists, got '$mode'")
  override protected def defaultName: String = "binary_file_sink"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("binary_file_sink")
  override def jsonParams: Map[String, Any] =
    Map("dir" -> dir, "nameExpr" -> nameExpr, "payloadCol" -> payloadCol, "mode" -> mode)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.hadoop.fs.Path
    val df = in("df")
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    if (fs.exists(root)) {
      if (mode == "errorifexists")
        throw new GraftException(s"binary_file_sink '$name': '$dir' already exists")
      // recursive-delete guard (VERDICT r6): only wipe a directory THIS sink
      // family created (it carries the marker) or an empty one. A mispointed
      // `dir` — a dataset root, a home directory — is unrecoverable after
      // fs.delete(recursive = true); refusing costs one manual delete in the
      // rare legitimate retarget, losing data costs everything.
      val marker = new Path(root, BinaryFileSinkNode.Marker)
      if (!fs.exists(marker) && fs.listStatus(root).nonEmpty)
        throw new GraftException(s"binary_file_sink '$name': refusing to " +
          s"recursively delete non-empty '$dir' — it lacks the " +
          s"'${BinaryFileSinkNode.Marker}' marker, so it was not written by " +
          "this sink; delete it manually if the overwrite is intended")
      fs.delete(root, true)
    }
    fs.mkdirs(root)
    fs.create(new Path(root, BinaryFileSinkNode.Marker), true).close()
    // Hadoop Configuration is not serializable — ship it as entries
    val confEntries: Array[(String, String)] = {
      val it = hconf.iterator(); val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val dirStr = dir
    df.selectExpr(s"($nameExpr) as __name", s"cast($payloadCol as binary) as __bytes")
      .foreachPartition { (rows: Iterator[Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val pfs = new Path(dirStr).getFileSystem(conf)
        rows.foreach { r =>
          val nm = r.getString(0)
          // path traversal guard: a name is a leaf, never a directory walk
          if (nm == null || nm.isEmpty || nm.contains("/") || nm.contains(".."))
            throw new GraftException(s"binary_file_sink: illegal file name '$nm'")
          val out = pfs.create(new Path(dirStr, nm), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
    Map("result" -> df)
  }
}

object BinaryFileSinkNode {
  /** Ownership marker written on first use; overwrite mode refuses to
    * recursively delete a non-empty directory lacking it. */
  val Marker = ".graft-sink"
}

/** Read a directory of raw media blobs via Spark's `binaryFile` source —
  * THE production entry point for image/audio corpora (each row:
  * path, modificationTime, length, content). Pair with DecodeImageNode /
  * AudioChunkNode on the `content` column. `pathGlobFilter` prunes by
  * extension at LISTING time (no content read); `recursive` descends
  * partition-style directory trees. At 100 TB prefer fewer, larger source
  * files or a prior packing pass into parquet — the listing itself is the
  * bottleneck on billions of objects.
  */
class BinaryFileSourceNode(
    val path: String,
    val pathGlobFilter: Option[String] = None,
    val recursive: Boolean = false)
  extends Node {
  override protected def defaultName: String = "binary_file_source"
  val inputs = Seq.empty[Port]
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("binary_file_source")
  override def jsonParams: Map[String, Any] = Map("path" -> path,
    "pathGlobFilter" -> pathGlobFilter.orNull, "recursive" -> recursive)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    var r = ctx.spark.read.format("binaryFile")
    pathGlobFilter.foreach(g => r = r.option("pathGlobFilter", g))
    if (recursive) r = r.option("recursiveFileLookup", "true")
    Map("result" -> r.load(path))
  }
}

/** Deterministic in-query AVI synthesis: a REAL RIFF/AVI container —
  * `RIFF/AVI ` header, `LIST hdrl` with a 56-byte `avih` main header and a
  * `LIST strl` stream list (56-byte `strh` "vids"/"DIB " + 40-byte
  * BITMAPINFOHEADER `strf`), then `LIST movi` holding one uncompressed
  * `00db` chunk per frame. Byte j of frame f is the fixed integer formula
  * [[MultimodalSchemas.frameByte]] under `seedExpr`, so downstream frame
  * indexers exercise genuine AVI container parsing while every frame byte
  * stays predictable cross-engine (the q31/q54 recipe applied to video).
  */
class SyntheticAviNode(
    val nFramesExpr: String,
    val wExpr: String,
    val hExpr: String,
    val seedExpr: String,
    val fps: Int = 10,
    val outCol: String = "payload")
  extends Node {
  require(fps > 0 && 1000000 % fps == 0,
    "fps must be positive and divide 1e6 (integer dwMicroSecPerFrame)")
  override protected def defaultName: String = "synthetic_avi"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("synthetic_avi")
  override def jsonParams: Map[String, Any] = Map("nFramesExpr" -> nFramesExpr,
    "wExpr" -> wExpr, "hExpr" -> hExpr, "seedExpr" -> seedExpr,
    "fps" -> fps, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val Seq(nN, wN, hN, sN) = MultimodalSchemas.tmpNames(df, "__n", "__w", "__h", "__s")
    val prepped = df
      .withColumn(nN, expr(nFramesExpr).cast(IntegerType))
      .withColumn(wN, expr(wExpr).cast(IntegerType))
      .withColumn(hN, expr(hExpr).cast(IntegerType))
      .withColumn(sN, expr(seedExpr).cast(IntegerType))
    val base = prepped.schema.fields.dropRight(4)
    val outSchema = StructType(base :+ StructField(outCol, BinaryType, nullable = true))
    val nBase = base.length
    val nodeName = name
    val fpsL = fps
    val out = prepped.mapPartitions { rows =>
      rows.map { row =>
        if ((0 until 4).exists(i => row.isNullAt(nBase + i)))
          throw new GraftException(s"synthetic_avi '$nodeName': nFrames/w/h/seed " +
            "expressions must be non-null castable ints")
        val (n, w, h, s) = (row.getInt(nBase), row.getInt(nBase + 1),
          row.getInt(nBase + 2), row.getInt(nBase + 3))
        if (n <= 0 || w <= 0 || h <= 0 || s < 0)
          throw new GraftException(s"synthetic_avi '$nodeName': need nFrames > 0, " +
            s"w > 0, h > 0, seed >= 0 — got ($n, $w, $h, $s)")
        Row.fromSeq(row.toSeq.take(nBase) :+ SyntheticAviNode.buildAvi(n, w, h, s, fpsL))
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

object SyntheticAviNode {
  /** One complete RIFF/AVI byte array: nFrames uncompressed 24-bit `00db`
    * frames of w x h, frame byte j = frameByte(f, j, s). Chunks are
    * word-aligned per the RIFF spec (odd-sized frame data gets a pad byte
    * that is NOT part of the frame). */
  def buildAvi(nFrames: Int, w: Int, h: Int, s: Int, fps: Int): Array[Byte] = {
    val frameBytes = w * h * 3
    val framePad = frameBytes & 1
    val moviSize = 4 + nFrames * (8 + frameBytes + framePad)
    val strlSize = 4 + (8 + 56) + (8 + 40)     // "strl" + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // "hdrl" + avih + LIST strl
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffSize); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlSize); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps)       // dwMicroSecPerFrame — frame timing truth
      .putInt(frameBytes * fps)     // dwMaxBytesPerSec
      .putInt(0)                    // dwPaddingGranularity
      .putInt(0)                    // dwFlags (no idx1 index chunk written)
      .putInt(nFrames).putInt(0)    // dwTotalFrames, dwInitialFrames
      .putInt(1)                    // dwStreams
      .putInt(frameBytes)           // dwSuggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    tag("LIST"); buf.putInt(strlSize); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag("DIB ")
    buf.putInt(0)                   // dwFlags
      .putShort(0).putShort(0)      // wPriority, wLanguage
      .putInt(0)                    // dwInitialFrames
      .putInt(1).putInt(fps)        // dwScale, dwRate: rate/scale = fps
      .putInt(0)                    // dwStart
      .putInt(nFrames)              // dwLength (frames)
      .putInt(frameBytes)           // dwSuggestedBufferSize
      .putInt(-1)                   // dwQuality
      .putInt(0)                    // dwSampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    tag("strf"); buf.putInt(40)
    buf.putInt(40)                  // biSize
      .putInt(w).putInt(h)
      .putShort(1).putShort(24)     // biPlanes, biBitCount (RGB24)
      .putInt(0)                    // biCompression = BI_RGB
      .putInt(frameBytes)           // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(moviSize); tag("movi")
    var f = 0
    while (f < nFrames) {
      tag("00db"); buf.putInt(frameBytes)
      var j = 0
      while (j < frameBytes) {
        buf.put(MultimodalSchemas.frameByte(f, j, s).toByte)
        j += 1
      }
      if (framePad == 1) buf.put(0.toByte)
      f += 1
    }
    buf.array()
  }
}

/** REAL video frame indexing: walks the RIFF/AVI container of the payload —
  * top-level chunk walk to `LIST hdrl` (frame timing from the `avih`
  * dwMicroSecPerFrame field) and `LIST movi` (the frame chunks), indexes
  * the `00db`/`00dc` video chunks in stream order — and emits one row per
  * SAMPLED frame (every `stride`-th, up to `maxFrames`): frame_idx, its
  * timestamp from the container's own timing, the chunk byte size, and the
  * decoded frame-byte sum (the per-frame signal for shot detection /
  * near-black dropping, and the oracle hook). Non-AVI/null payloads emit
  * no rows — the corrupt-blob audit signal, same contract as
  * [[AudioChunkNode]]. Narrow flatMap, zero shuffle; the same chunk-walk
  * machinery as the WAV parser, pointed at the AVI list structure.
  */
class FrameSampleNode(val stride: Int = 10, val maxFrames: Int = 5, val payloadCol: String = "payload")
  extends Node {
  require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
  override protected def defaultName: String = "frame_sample"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("frame_sample")
  override def jsonParams: Map[String, Any] = Map("stride" -> stride, "maxFrames" -> maxFrames, "payloadCol" -> payloadCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ts_ms", LongType, nullable = false),
      StructField("frame_bytes", IntegerType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val (st, maxF) = (stride, maxFrames)
    val out = df.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](payloadIdx)
      FrameSampleNode.parseAvi(bytes) match {
        case None => Iterator.empty
        case Some((usPerFrame, frames)) =>
          frames.iterator.zipWithIndex
            .filter { case (_, f) => f % st == 0 }
            .take(maxF)
            .map { case ((off, sz), f) =>
              var sum = 0L
              var i = 0
              while (i < sz) { sum += (bytes(off + i) & 0xFF); i += 1 }
              Row.fromSeq(row.toSeq ++ Seq[Any](
                f, f.toLong * usPerFrame / 1000L, sz, sum))
            }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

object FrameSampleNode {
  /** RIFF/AVI container walk: returns (dwMicroSecPerFrame, video frame
    * chunks as (dataOffset, dataSize) in stream order) for a single-video-
    * stream AVI, None for anything else. Tolerates unknown chunks (JUNK,
    * idx1, audio streams) by skipping them — the point of a chunked
    * container format. */
  def parseAvi(b: Array[Byte]): Option[(Long, Vector[(Int, Int)])] = {
    if (b == null || b.length < 24) return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var usPerFrame = -1L
    val frames = Vector.newBuilder[(Int, Int)]
    var sawMovi = false
    var off = 12
    while (off + 8 <= b.length) {
      val id = tag(off); val sz = buf.getInt(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (id == "LIST" && sz >= 4) {
        tag(off + 8) match {
          case "hdrl" =>
            // scan inside hdrl for the avih main header (frame timing)
            var o = off + 12
            val end = off + 8 + sz
            while (o + 8 <= end && usPerFrame < 0) {
              val cid = tag(o); val csz = buf.getInt(o + 4)
              if (csz < 0 || o + 8 + csz > end) return None
              if (cid == "avih" && csz >= 4) usPerFrame = buf.getInt(o + 8).toLong
              o += 8 + csz + (csz & 1)
            }
          case "movi" =>
            sawMovi = true
            var o = off + 12
            val end = off + 8 + sz
            while (o + 8 <= end) {
              val cid = tag(o); val csz = buf.getInt(o + 4)
              if (csz < 0 || o + 8 + csz > end) return None
              // ##db (uncompressed) / ##dc (compressed) video chunks; audio
              // (##wb) and index/junk chunks skip through
              if (cid.length == 4 && cid(2) == 'd' && (cid(3) == 'b' || cid(3) == 'c'))
                frames += ((o + 8, csz))
              o += 8 + csz + (csz & 1)
            }
          case _ => // other lists (odml etc.) skip whole
        }
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (usPerFrame <= 0 || !sawMovi) None
    else Some((usPerFrame, frames.result()))
  }
}
