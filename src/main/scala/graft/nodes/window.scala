package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, expr, row_number}

/** Window-function node: appends analytic columns over one window spec.
  * Declarative `Column`-API windows keep Catalyst visibility — one Window
  * physical node per distinct (partition, order, frame) spec; at scale the
  * single shuffle on `partitionBy` is the whole cost, so co-locate with an
  * upstream shuffle on the same keys when possible (reused exchange).
  *
  * Frames: always pass explicit ROWS frames for running aggregates — the
  * ANSI default RANGE frame includes order-key peers, which is
  * nondeterministic under ties and a silent cross-engine mismatch.
  */
class WindowNode(
    val partitionBy: Seq[String],
    val orderBy: Seq[String],
    val cols: Seq[(String, String)], // name -> aggregate/analytic expression, e.g. "lag(x, 1)"
    val frame: Option[(Long, Long)] = None) // rowsBetween bounds
  extends Node {
  override protected def defaultName: String = "window"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("window")
  override def jsonParams: Map[String, Any] = Map("partitionBy" -> partitionBy, "orderBy" -> orderBy, "cols" -> cols) ++ frame.fold(Map.empty[String, Any]) { case (lo, hi) => Map("frameLo" -> lo, "frameHi" -> hi) }
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val base = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(SortExprs.sortCol): _*)
    val framed = frame.fold(base) { case (lo, hi) => base.rowsBetween(lo, hi) }
    val out = cols.foldLeft(in("df")) { case (d, (n, e)) =>
      // Offset/ranking functions reject explicit frames (Spark enforces
      // their implied frame); apply the user frame to aggregates only.
      val w = if (WindowNode.noFrame(e)) base else framed
      d.withColumn(n, expr(e).over(w))
    }
    Map("result" -> out)
  }
}
object WindowNode {
  private val noFrameFns =
    Set("row_number", "rank", "dense_rank", "percent_rank", "ntile", "cume_dist", "lag", "lead")
  /** True if `e` is a call to a window function that forbids explicit frames. */
  private[nodes] def noFrame(e: String): Boolean =
    noFrameFns.contains(e.trim.takeWhile(c => c.isLetterOrDigit || c == '_').toLowerCase)
  def apply(partitionBy: Seq[String], orderBy: Seq[String], cols: (String, String)*): WindowNode =
    new WindowNode(partitionBy, orderBy, cols)
  def rows(partitionBy: Seq[String], orderBy: Seq[String], lo: Long, hi: Long, cols: (String, String)*): WindowNode =
    new WindowNode(partitionBy, orderBy, cols, Some((lo, hi)))
}

/** As-of join (reference lacks it; standard in time-series engines): for each
  * left row, pick the single right row with equal keys and the greatest
  * `rightTime <= leftTime` (backward; `forward` flips to least >=).
  *
  * Spark-first plan: equi-join on keys (one shuffle pair on the key columns —
  * Catalyst picks SMJ/shuffled-hash; AQE handles skew), range predicate on the
  * time columns, then one row per left row via `row_number` over the left
  * primary key ordered by right time desc with a deterministic id tiebreak.
  * The window shuffle reuses the join's partitioning when `leftIdCols` start
  * with the join keys. No driver-side state; scales linearly with matches.
  */
class AsofJoinNode(
    val leftKeys: Seq[String],
    val rightKeys: Seq[String],
    val leftTime: String,
    val rightTime: String,
    val leftIdCols: Seq[String], // unique id of a left row (window partition)
    val rightTieBreak: String,   // unique right column for deterministic pick under time ties
    val joinType: String = "inner", // inner | left
    val forward: Boolean = false)
  extends Node {
  override protected def defaultName: String = "asof_join"
  val inputs = Seq(Port("left"), Port("right"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("asof_join")
  override def jsonParams: Map[String, Any] = Map("leftKeys" -> leftKeys, "rightKeys" -> rightKeys, "leftTime" -> leftTime, "rightTime" -> rightTime, "leftIdCols" -> leftIdCols, "rightTieBreak" -> rightTieBreak, "joinType" -> joinType, "forward" -> forward)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val l = in("left").alias("l")
    val r = in("right").alias("r")
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (a, b) => col(s"l.$a") === col(s"r.$b") }
      .reduce(_ && _)
    val timeCond =
      if (forward) col(s"r.$rightTime") >= col(s"l.$leftTime")
      else col(s"r.$rightTime") <= col(s"l.$leftTime")
    val joined = l.join(r, keyCond && timeCond, joinType)
    val ord =
      if (forward) Seq(col(rightTime).asc_nulls_last, col(rightTieBreak).asc_nulls_last)
      else Seq(col(rightTime).desc_nulls_last, col(rightTieBreak).desc_nulls_last)
    val w = Window.partitionBy(leftIdCols.map(c => col(s"l.$c")): _*).orderBy(ord: _*)
    Map("result" -> joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1).drop("__asof_rn"))
  }
}
