package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, explode, expr, lit, sequence}

/** Skew mitigation (SURVEY.md §7.5 scale hygiene). AQE's skew-join handles
  * sort-merge skew at runtime; SaltedJoinNode is the explicit fallback for
  * cases AQE cannot split (e.g. a shuffled hash join where one key holds a
  * double-digit percent of the fact side): the skewed (left) side gets a
  * random-ish salt in [0, buckets), the compact (right) side is replicated
  * once per salt value, and the join key becomes (key, salt) — the hot key's
  * rows spread over `buckets` tasks instead of one straggler.
  *
  * The salt is derived from a hash of the whole left row (deterministic, no
  * rand() — keeps retries/speculative tasks consistent), which distributes a
  * hot key's rows uniformly without changing join semantics for inner/left
  * equi-joins on the salted keys.
  */
class SaltedJoinNode(
    leftKeys: Seq[String],
    rightKeys: Seq[String],
    buckets: Int = 16,
    joinType: String = "inner")
  extends Node {
  require(buckets > 0, "buckets must be positive")
  // right/full outer would null-extend each unmatched right row ONCE PER
  // REPLICA — `buckets`-fold inflated right side with no error. Everything
  // that only DROPS unmatched right rows is safe: inner, left outer, and
  // left semi/anti (per left row the salt equality selects exactly one
  // replica, so existence is unchanged). Spark's alias spellings accepted.
  private val safeTypes = Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")
  require(safeTypes.contains(joinType.toLowerCase.replace("_", "")),
    s"SaltedJoinNode: joinType '$joinType' unsupported — right-side replication " +
      "breaks right/full-outer semantics (use AQE skew handling instead)")
  override protected def defaultName: String = "salted_join"
  val inputs = Seq(Port("left"), Port("right"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("salted_join")
  override def jsonParams: Map[String, Any] =
    Map("leftKeys" -> leftKeys, "rightKeys" -> rightKeys, "buckets" -> buckets, "joinType" -> joinType)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val l = in("left")
      .withColumn("__salt", expr(s"pmod(xxhash64(${in("left").columns.mkString(", ")}), $buckets)"))
    val r = in("right")
      .withColumn("__salt_arr", sequence(lit(0), lit(buckets - 1)))
      .withColumn("__salt", explode(col("__salt_arr")))
      .withColumn("__salt", col("__salt").cast("bigint"))
      .drop("__salt_arr")
    val cond = (leftKeys.zip(rightKeys).map { case (a, b) => l(a) === r(b) } :+
      (l("__salt") === r("__salt"))).reduce(_ && _)
    Map("result" -> l.join(r, cond, joinType).drop("__salt"))
  }
}

object SaltedJoinNode {
  def apply(leftKeys: Seq[String], rightKeys: Seq[String], buckets: Int = 16): SaltedJoinNode =
    new SaltedJoinNode(leftKeys, rightKeys, buckets)
}
