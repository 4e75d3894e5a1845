package graft.nodes

import graft.dag._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Multimodal-column nodes (north-star scope): image/audio/video payloads are
  * opaque `BinaryType` columns with typed metadata structs. The Spark-side
  * plumbing — schema, batch iteration via mapPartitions, partition sizing —
  * is real; the codec itself is STUBBED with a deterministic fake (image/audio
  * libraries are not in this container). Swap `decodeStub` for a real codec
  * (JNI/onnx) without touching the plan shape.
  *
  * Scale notes: binary payloads dominate partition size — pair these nodes
  * with maxPartitionBytes tuning so a partition of blobs fits executor
  * memory; the transforms themselves are narrow (zero shuffle).
  */
object MultimodalSchemas {
  val imageMeta: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))
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

/** Decode stub: binary -> image metadata struct + a small feature vector.
  * Deterministic fake derived from the payload bytes, so tests are exact.
  * Structure mirrors a real decoder: mapPartitions over rows, per-partition
  * "codec init" amortized across the batch (the reason this is mapPartitions
  * and not a per-row UDF).
  */
class DecodeImageStubNode(val payloadCol: String = "payload") extends Node {
  override protected def defaultName: String = "decode_image"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("decode_image")
  override def jsonParams: Map[String, Any] = Map("payloadCol" -> payloadCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val df = in("df")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("image_meta", MultimodalSchemas.imageMeta, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val out = df.mapPartitions { rows =>
      // per-partition codec init would go here (amortized once per batch)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          // ??? real codec goes here; deterministic fake below. The fake is a
          // pure function of the payload BYTE LENGTH (not a JVM hashCode) so
          // the whole pipeline stays oracle-checkable cross-engine — the
          // plumbing (mapPartitions batching, schema, null handling) is what
          // a real codec swap preserves.
          val h = bytes.length
          val meta = Row(64 + h % 512, 64 + (h / 512) % 512, 3, "fake/rgb")
          val feats = (0 until 8).map(i => ((h.toLong * (i + 1)) % 1000) / 1000.0f).toArray
          Row.fromSeq(row.toSeq ++ Seq(meta, feats))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Resize stub: consumes the decoded metadata, emits target-size metadata.
  * Narrow map via builtin expressions over the struct (a real resize would be
  * another mapPartitions over the payload).
  */
class ResizeImageStubNode(val targetW: Int, val targetH: Int) extends Node {
  override protected def defaultName: String = "resize_image"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("resize_image")
  override def jsonParams: Map[String, Any] = Map("targetW" -> targetW, "targetH" -> targetH)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] =
    Map("result" -> in("df").withColumn("resized_meta",
      expr(s"named_struct('width', $targetW, 'height', $targetH, " +
        "'channels', image_meta.channels, 'format', image_meta.format)")))
}

/** Audio-chunk stub: binary payload → fixed-duration chunk rows with a small
  * deterministic feature vector per chunk (the MFCC-shaped contract). Same
  * mapPartitions batch structure a real audio codec needs (decoder init per
  * partition, frame loop per row); the codec itself is a `???`-equivalent
  * deterministic fake derived from the payload bytes.
  */
class AudioChunkStubNode(payloadCol: String = "payload", chunkMs: Int = 1000, maxChunks: Int = 8)
  extends Node {
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
      StructField("mfcc", ArrayType(FloatType, containsNull = false), nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val (cMs, maxC) = (chunkMs, maxChunks)
    val out = df.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](payloadIdx)
      if (bytes == null) Iterator.empty
      else {
        // ??? real decoder goes here; fake duration = bytes.length ms
        val nChunks = math.min(math.max(bytes.length / cMs, 1), maxC)
        (0 until nChunks).iterator.map { c =>
          val h = java.util.Arrays.hashCode(bytes) * 31 + c
          val mfcc = Array.tabulate(13)(i => ((h * (i + 7)) % 1000) / 1000.0f)
          Row.fromSeq(row.toSeq ++ Seq(c, c.toLong * cMs, mfcc))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> out.toDF())
  }
}

/** Frame-sampling stub for video-like payloads: emits every `stride`-th
  * frame index up to `maxFrames` as (frame_idx, frame_meta) rows — the
  * explode pattern a real frame sampler uses (one row per sampled frame).
  */
class FrameSampleStubNode(val stride: Int = 10, val maxFrames: Int = 5, val payloadCol: String = "payload")
  extends Node {
  override protected def defaultName: String = "frame_sample"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("frame_sample")
  override def jsonParams: Map[String, Any] = Map("stride" -> stride, "maxFrames" -> maxFrames, "payloadCol" -> payloadCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    // fake frame count derived from payload length (deterministic)
    val frames = s"sequence(0, least(cast(length($payloadCol) / $stride as int), ${maxFrames - 1}))"
    Map("result" -> in("df")
      .withColumn("frame_idx", expr(s"explode($frames)"))
      .withColumn("frame_ts_ms", col("frame_idx") * stride * 1000))
  }
}
