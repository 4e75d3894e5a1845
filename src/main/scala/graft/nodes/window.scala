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
  * Two strategies:
  *
  * `merge` (default, the scale-safe path): union the two sides into one
  * per-key time-ordered stream and carry the latest right row forward with
  * `last(_, ignoreNulls)` over a running ROWS frame (`first` looking ahead
  * for `forward`). The intermediate is exactly L + R rows — NO join anywhere
  * in the plan — so a hot key with many right rows costs one sort, never the
  * L×R/2 expansion. The physical plan is ONE Exchange on the key + one
  * Sort + one Window (NodesSpec pins both the join-free and the
  * single-Exchange property): the same cost shape as any windowed
  * aggregation, linear at 100 TB. Column notes: Catalyst prunes the LEFT
  * payload struct to the fields the query consumes, but the RIGHT payload
  * rides the shuffle whole (field extraction cannot push through `last`) —
  * pre-project the right side to the columns you need at scale.
  *
  * `expand`: equi-join on keys with the time-range predicate, then one row
  * per left row via `row_number` over `leftIdCols`. Every qualifying right
  * row materializes before the window discards all but one — quadratic in
  * per-key density; kept only for plans that want the join form (e.g. to
  * broadcast a tiny right side and skip the left shuffle on keys).
  */
class AsofJoinNode(
    val leftKeys: Seq[String],
    val rightKeys: Seq[String],
    val leftTime: String,
    val rightTime: String,
    val leftIdCols: Seq[String], // unique id of a left row (expand-path window partition)
    val rightTieBreak: String,   // unique right column for deterministic pick under time ties
    val joinType: String = "inner", // inner | left
    val forward: Boolean = false,
    val strategy: String = "merge") // merge | expand
  extends Node {
  override protected def defaultName: String = "asof_join"
  val inputs = Seq(Port("left"), Port("right"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("asof_join")
  override def jsonParams: Map[String, Any] = Map("leftKeys" -> leftKeys, "rightKeys" -> rightKeys, "leftTime" -> leftTime, "rightTime" -> rightTime, "leftIdCols" -> leftIdCols, "rightTieBreak" -> rightTieBreak, "joinType" -> joinType, "forward" -> forward, "strategy" -> strategy)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = strategy match {
    case "merge"  => Map("result" -> mergePath(in("left"), in("right")))
    case "expand" => Map("result" -> expandPath(in("left"), in("right")))
    case other    => throw new GraftException(s"asof_join: unknown strategy '$other' (merge | expand)")
  }

  private def expandPath(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
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
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1).drop("__asof_rn")
  }

  private def mergePath(left: DataFrame, right: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{first, last, lit, struct}
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // Common comparable time type, following SQL comparison coercion (what
    // the expand path's `<=` does implicitly): any datetime pair promotes to
    // the wider of DATE < TIMESTAMP_NTZ < TIMESTAMP; anything else must
    // already agree.
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    val datetimes = Seq(DateType, TimestampNTZType, TimestampType)
    val commonT = (lt, rt) match {
      case (a, b) if a == b => a
      case (a, b) if datetimes.contains(a) && datetimes.contains(b) =>
        datetimes(math.max(datetimes.indexOf(a), datetimes.indexOf(b)))
      case (a, b) => throw new GraftException(
        s"asof_join: time columns have incomparable types $a vs $b")
    }
    def keyed(df: DataFrame, keys: Seq[String]) =
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }
    // Right rows with a null key or null time can never match under the
    // equi+range semantics; dropping them up front means the null-key window
    // partitions hold left rows only, so no special-casing is needed — an
    // unmatched left row simply carries a null payload struct.
    val lPart = left.select(
      keyed(left, leftKeys) ++ Seq(
        col(leftTime).cast(commonT).as("__t"),
        lit(1).as("__side"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow")): _*)
    val rPart = right
      .filter(rightKeys.map(col(_).isNotNull).reduce(_ && _) && col(rightTime).isNotNull)
      .select(
        keyed(right, rightKeys) ++ Seq(
          col(rightTime).cast(commonT).as("__t"),
          lit(0).as("__side"),
          col(rightTieBreak).as("__tb"),
          struct(right.columns.map(col).toIndexedSeq: _*).as("__rrow")): _*)
    val merged = lPart.unionByName(rPart, allowMissingColumns = true)
    val part = Window.partitionBy(leftKeys.indices.map(i => col(s"__k$i")): _*)
    // Backward: rights sort BEFORE lefts at equal time (<= is inclusive) and
    // ascending tie-break makes `last` pick the max — the same winner as the
    // expand path's (time desc, tiebreak desc) rank 1. Forward mirrors it.
    // Null left times must match NOTHING (the range predicate is null-false
    // in the expand path): backward's nulls-FIRST ascending order already
    // puts them before every right row (empty lookback frame); forward needs
    // nulls LAST so the lookahead frame is empty too — otherwise a null-time
    // left row would sort first and "match" the partition's earliest right.
    val matched =
      if (forward)
        merged.withColumn("__m", first(col("__rrow"), ignoreNulls = true).over(
          part.orderBy(col("__t").asc_nulls_last, col("__side").desc, col("__tb").asc)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        merged.withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(
          part.orderBy(col("__t").asc_nulls_first, col("__side").asc, col("__tb").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val lefts = matched.filter(col("__side") === 1)
    val kept = joinType match {
      case "inner" => lefts.filter(col("__m").isNotNull)
      case "left"  => lefts
      case other   => throw new GraftException(
        s"asof_join(merge): joinType '$other' unsupported (inner | left)")
    }
    // Flat output: left columns, then right columns; a right column whose
    // name collides with a left one gets an `_r` suffix (the expand path
    // instead relies on l./r. subquery aliases, which a select on struct
    // fields cannot reproduce).
    val leftNames = left.columns.toSet
    val outCols =
      left.columns.toIndexedSeq.map(c => col("__lrow").getField(c).as(c)) ++
        right.columns.toIndexedSeq.map(c =>
          col("__m").getField(c).as(if (leftNames(c)) s"${c}_r" else c))
    kept.select(outCols: _*)
  }
}

/** Batch sessionization: split each key's event stream into sessions at
  * gaps longer than `gapSeconds`, appending a per-key `session_seq`
  * (1-based) — the batch counterpart of the streaming session window
  * (StreamWindowAggNode session mode), for backfills and reprocessing over
  * historical event logs.
  *
  * Gap arithmetic is exact INTEGER MICROSECONDS (`unix_micros`) — float
  * epoch seconds would make boundary events engine-dependent. The order
  * within a key is (ts, tieBreakCols...): pass a unique tie-breaker (e.g.
  * the event id) whenever timestamps can collide, otherwise peer rows
  * under RANGE semantics would differ across engines.
  *
  * Scale shape: ONE shuffle on `keyCols` feeding two window passes over
  * the same spec (boundary flag, then running sum — Catalyst reuses the
  * sort+exchange; physical plan has a single Exchange). No global sort, no
  * driver state; skewed keys are bounded by per-user event counts.
  */
class SessionizeNode(
    val keyCols: Seq[String] = Seq("user_id"),
    val tsCol: String = "ts",
    val gapSeconds: Long = 1800L,
    val tieBreakCols: Seq[String] = Nil,
    val outCol: String = "session_seq")
  extends Node {
  require(keyCols.nonEmpty, "keyCols must be non-empty")
  require(gapSeconds > 0, "gapSeconds must be positive")
  override protected def defaultName: String = "sessionize"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("sessionize")
  override def jsonParams: Map[String, Any] = Map(
    "keyCols" -> keyCols, "tsCol" -> tsCol, "gapSeconds" -> gapSeconds,
    "tieBreakCols" -> tieBreakCols, "outCol" -> outCol)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.{lag, sum, when, lit}
    val ord = (col("__us") +: tieBreakCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    Map("result" -> in("df")
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .withColumn("__nb",
        when(lag(col("__us"), 1).over(w).isNull
          .or(col("__us") - lag(col("__us"), 1).over(w) > gapUs), 1L)
          .otherwise(0L))
      .withColumn(outCol, sum(col("__nb")).over(run))
      .drop("__us", "__nb"))
  }
}

/** Merge overlapping (or touching) [start, end] intervals per key — the
  * interval-coalescing primitive behind activity coverage, validity-range
  * compaction, and time-range dedup. Closed-interval semantics: a row
  * starting exactly where a previous one ends joins that merged run.
  *
  * The recurrence is the textbook sweep, expressed as two window passes
  * over one (key, start, end) sort: a row OPENS a new run iff its start
  * exceeds the running max end of all PRIOR rows; run id = running sum of
  * open flags; then one groupBy (key, run) with min(start)/max(end).
  * Comparisons are exact integer microseconds (`unix_micros`), explicit
  * ROWS frames — deterministic under duplicate intervals on any engine.
  *
  * Scale shape: ONE shuffle on `keyCols`, both windows + the final
  * aggregation reuse the same sort/exchange. No self-join (the naive
  * overlap-join formulation is quadratic per key under dense overlap).
  */
class MergeIntervalsNode(
    val keyCols: Seq[String] = Seq("user_id"),
    val startCol: String = "start_ts",
    val endCol: String = "end_ts")
  extends Node {
  require(keyCols.nonEmpty, "keyCols must be non-empty")
  override protected def defaultName: String = "merge_intervals"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("merge_intervals")
  override def jsonParams: Map[String, Any] = Map(
    "keyCols" -> keyCols, "startCol" -> startCol, "endCol" -> endCol)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.{count, lit, max, min, sum, when}
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__s").asc, col("__e").asc)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = in("df")
      .withColumn("__s", expr(s"unix_micros($startCol)"))
      .withColumn("__e", expr(s"unix_micros($endCol)"))
      .withColumn("__open",
        when(max(col("__e")).over(prior).isNull
          .or(col("__s") > max(col("__e")).over(prior)), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__open")).over(run))
      .groupBy((keyCols.map(col) :+ col("__run")): _*)
      .agg(min(col("__s")).as("__ms"), max(col("__e")).as("__me"),
        count(lit(1)).as("n_merged"))
    Map("result" -> grouped
      .withColumn("interval_start", expr("timestamp_micros(__ms)"))
      .withColumn("interval_end", expr("timestamp_micros(__me)"))
      .withColumn("dur_sec", expr("(__me - __ms) div 1000000L"))
      .drop("__run", "__ms", "__me"))
  }
}
