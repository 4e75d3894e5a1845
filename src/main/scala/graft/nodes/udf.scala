package graft.nodes

import graft.dag._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, expr, udaf}

/** User-defined function/aggregate support (SURVEY.md §2.2 "UDF/UDAF/UDTF").
  * The reference's entire essence is user-defined transforms; here the
  * DataFrame-level case is `FnNode` (zero serialization cost), the
  * column-level cases are Spark `udf`/`Aggregator`. Note the scale guidance:
  * builtins > Aggregator > udf — only an Aggregator gets partial (map-side)
  * aggregation; a plain udf breaks codegen for the enclosing expression.
  */

/** Exact integer sum-of-products Aggregator: sum(a * b) over two bigint
  * columns with a Long buffer — order-independent, so results are exact and
  * oracle-checkable (float UDAFs would diverge across partition orders).
  */
object SumProductAgg extends Aggregator[(Long, Long), Long, Long] {
  def zero: Long = 0L
  def reduce(acc: Long, x: (Long, Long)): Long = acc + x._1 * x._2
  def merge(a: Long, b: Long): Long = a + b
  def finish(acc: Long): Long = acc
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Registers named UDFs/UDAFs into the session then passes the frame through
  * unchanged — an explicit DAG step so downstream expression nodes can
  * reference the names, and the registration is visible in the topology.
  */
class RegisterUdafsNode(val names: Seq[String] = Seq("sum_prod")) extends Node {
  override protected def defaultName: String = "register_udafs"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("register_udafs")
  override def jsonParams: Map[String, Any] = Map("names" -> names)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    names.foreach {
      case "sum_prod" => ctx.spark.udf.register("sum_prod", udaf(SumProductAgg))
      case other => throw new GraftException(s"unknown udaf '$other'")
    }
    Map("result" -> in("df"))
  }
}

/** UDTF analogue: one row in, N rows out through a Generator expression
  * (explode/posexplode/inline). Spark has no standalone UDTF; `explode` over
  * a builtin-computed array is the idiomatic, codegen-friendly equivalent.
  */
class ExplodeNode(val arrayExpr: String, val outCols: Seq[String], val keep: Seq[String]) extends Node {
  override protected def defaultName: String = "explode"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("explode")
  override def jsonParams: Map[String, Any] = Map("arrayExpr" -> arrayExpr, "outCols" -> outCols, "keep" -> keep)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val gen = s"posexplode($arrayExpr) as (${outCols.mkString(", ")})"
    Map("result" -> in("df").selectExpr(keep ++ Seq(gen): _*))
  }
}

/** Per-group SEQUENTIAL kernel over a typed grouped dataset — the batch
  * `KeyValueGroupedDataset.flatMapGroups` surface, specialized to the
  * recurrence family windows cannot express: exponential moving average in
  * FIXED-POINT INTEGERS (time-decayed activity/quality features):
  *
  *   ema_0 = v_0;  ema_i = (alphaPct*v_i + (100-alphaPct)*ema_{i-1}) div 100
  *
  * floorDiv semantics (mirrors an external engine's floor division exactly,
  * negatives included). Rows order within a group by (`orderExpr`,
  * `tieExpr`) — both bigint expressions, so ordering is total and
  * engine-portable.
  *
  * Scale shape: ONE shuffle on the group key (groupByKey), then a
  * per-group in-memory sort + fold. Per-group rows must fit an executor —
  * the contract of every sequential per-key kernel (bounded by per-key
  * density/log retention, not corpus size); sessionize/window nodes cover
  * the unbounded-key cases.
  */
class GroupEmaNode(
    val keyCols: Seq[String],
    val orderExpr: String,
    val tieExpr: String,
    val valueExpr: String,
    val alphaPct: Int = 20,
    val outCol: String = "ema")
  extends Node {
  require(keyCols.nonEmpty, "keyCols must be non-empty")
  require(alphaPct >= 0 && alphaPct <= 100, "alphaPct must be in [0, 100]")
  override protected def defaultName: String = "group_ema"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("group_ema")
  override def jsonParams: Map[String, Any] = Map("keyCols" -> keyCols,
    "orderExpr" -> orderExpr, "tieExpr" -> tieExpr, "valueExpr" -> valueExpr,
    "alphaPct" -> alphaPct, "outCol" -> outCol)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.{Encoders, Row}
    val prep = in("df").select(
      (keyCols.map(col) ++ Seq(
        expr(orderExpr).cast(LongType).as("__o"),
        expr(tieExpr).cast(LongType).as("__t"),
        expr(valueExpr).cast(LongType).as("__v"))): _*)
    val outSchema = prep.schema.add(outCol, LongType, nullable = false)
    val nKeys = keyCols.size
    val a = alphaPct.toLong
    val grouped = prep.groupByKey(
      // grouping key: length-prefixed null-safe string form of the key
      // columns (collision-free for any values; output rows carry the
      // ORIGINAL typed key values)
      r => (0 until nKeys).map { i =>
        if (r.isNullAt(i)) "N" else { val v = r.get(i).toString; s"${v.length}:$v" }
      }.mkString("|"))(Encoders.STRING)
    val nodeName = name
    val result = grouped.flatMapGroups { (_: String, it: Iterator[Row]) =>
      // NULL order/tie/value would survive the Long cast as null and
      // getLong would unbox it to 0 — a null timestamp silently sorting
      // first / seeding the EMA with 0 (ADVICE r5). Fail loudly instead;
      // callers pre-filter or coalesce explicitly.
      val raw = it.toArray
      raw.foreach { r =>
        if (r.isNullAt(nKeys) || r.isNullAt(nKeys + 1) || r.isNullAt(nKeys + 2))
          throw new GraftException(
            s"group_ema '$nodeName': null order/tie/value in group — a null would " +
              "silently sort first and feed the EMA as 0; filter or coalesce upstream")
      }
      val rows = raw.sortBy(r => (r.getLong(nKeys), r.getLong(nKeys + 1)))
      var ema = 0L; var first = true
      rows.iterator.map { r =>
        val v = r.getLong(nKeys + 2)
        ema = if (first) { first = false; v }
          else Math.floorDiv(a * v + (100L - a) * ema, 100L)
        Row.fromSeq(r.toSeq :+ ema)
      }
    }(RowEncoder.encoderFor(outSchema))
    Map("result" -> result.toDF())
  }
}
