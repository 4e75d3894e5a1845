package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Pivot: wide table from (key, pivot-value, measure) rows. Explicit
  * `pivotValues` keeps the plan a single pass (no extra distinct-collect job
  * to discover values — that job is a full scan at 100 TB; always pass the
  * values when known).
  */
class PivotNode(
    val groupBy: Seq[String],
    val pivotCol: String,
    val pivotValues: Seq[String],
    val agg: String)
  extends Node {
  override protected def defaultName: String = "pivot"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("pivot")
  override def jsonParams: Map[String, Any] =
    Map("groupBy" -> groupBy, "pivotCol" -> pivotCol, "pivotValues" -> pivotValues, "agg" -> agg)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val grouped = in("df").groupBy(groupBy.map(col): _*)
    val pivoted =
      if (pivotValues.nonEmpty) grouped.pivot(pivotCol, pivotValues)
      else grouped.pivot(pivotCol)
    Map("result" -> pivoted.agg(expr(agg)))
  }
}

/** Unpivot/melt: wide → long via `Dataset.unpivot` (Spark's native melt —
  * a Generator under the hood, no shuffle).
  */
class UnpivotNode(
    val ids: Seq[String],
    val values: Seq[String],
    val varCol: String = "key",
    val valCol: String = "value")
  extends Node {
  override protected def defaultName: String = "unpivot"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("unpivot")
  override def jsonParams: Map[String, Any] =
    Map("ids" -> ids, "values" -> values, "varCol" -> varCol, "valCol" -> valCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] =
    Map("result" -> in("df").unpivot(ids.map(col).toArray, values.map(col).toArray, varCol, valCol))
}

/** Time-series resample + gap-fill: aggregate to a fixed grain, then join
  * against the dense key×time grid so missing buckets appear (zero-filled or
  * forward-filled downstream). The grid is built from the data's own min/max
  * bounds — a 1-row aggregate broadcast-joined back, never collected to the
  * driver. Grid size = |keys| × |buckets|: fine whenever the grid is small
  * relative to the data (the usual case for resampling).
  */
class ResampleNode(
    val keyCol: String,
    val timeCol: String,
    val grain: String,        // e.g. "day"
    val aggs: Seq[String],    // aggregates over each (key, bucket)
    val fillZero: Seq[String] = Nil) // agg output cols to coalesce to 0
  extends Node {
  override protected def defaultName: String = "resample"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("resample")
  override def jsonParams: Map[String, Any] =
    Map("keyCol" -> keyCol, "timeCol" -> timeCol, "grain" -> grain, "aggs" -> aggs, "fillZero" -> fillZero)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.broadcast
    // three consumers below (agged, bounds, keys) — persist once so an
    // expensive upstream lineage is not re-executed per consumer
    val df = ctx.track(in("df").withColumn("__bucket", expr(s"date_trunc('$grain', $timeCol)")))
    val agged = df.groupBy(col(keyCol), col("__bucket")).agg(expr(aggs.head), aggs.tail.map(expr): _*)
    val bounds = df.agg(expr("min(__bucket) as __lo"), expr("max(__bucket) as __hi"))
    val keys = df.select(keyCol).distinct()
    val grid = keys.join(broadcast(bounds))
      .select(col(keyCol), expr(s"explode(sequence(__lo, __hi, interval 1 $grain)) as __bucket"))
    val joined = grid.join(agged, Seq(keyCol, "__bucket"), "left")
    val filled = fillZero.foldLeft(joined)((d, c) => d.withColumn(c, expr(s"coalesce($c, 0)")))
    Map("result" -> filled.withColumnRenamed("__bucket", "bucket"))
  }
}
