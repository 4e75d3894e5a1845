package graft.nodes

import graft.dag._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
