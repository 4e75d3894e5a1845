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

/** Bloom-pruned join — the standard 100 TB probe-side reduction: when the
  * build side selects few keys relative to the probe side's scan, shuffling
  * the full probe side just to discard most of it in the join is the
  * dominant cost. This node aggregates the build keys into a fixed-size
  * Bloom filter (a few MB regardless of build row count; Spark's sketch
  * merges associatively, so the build is one treeAggregate), broadcasts it,
  * and filters the probe side DURING ITS SCAN — before the exchange — then
  * runs the exact join on the survivors. Bloom filters have no false
  * negatives, so the final join output is exact for any fpp; fpp only
  * controls how many doomed probe rows slip through to the join (q94 pins
  * exactness against a plain-join oracle).
  *
  * Keys of any arity/type are folded to one long via xxhash64 on BOTH sides
  * (hash-collision keys just become bloom false positives — the exact join
  * still removes them), so the filter always stores longs.
  */
class BloomJoinNode(
    val probeKeys: Seq[String],
    val buildKeys: Seq[String],
    val expectedItems: Long = 1000000L,
    val fpp: Double = 0.01,
    val joinType: String = "inner",
    val broadcastBuild: Boolean = false)
  extends Node {
  require(probeKeys.nonEmpty && probeKeys.size == buildKeys.size,
    "probeKeys/buildKeys must be non-empty and same arity")
  require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
  // the prefilter DROPS probe rows with no build match — correct only for
  // join types that discard those rows anyway. left/full outer would lose
  // their null-extended rows; left_anti's entire OUTPUT is what the bloom
  // removes.
  private val safeTypes = Set("inner", "semi", "leftsemi")
  require(safeTypes.contains(joinType.toLowerCase.replace("_", "")),
    s"BloomJoinNode: joinType '$joinType' would drop rows the join must keep " +
      "(bloom prefilter removes unmatched probe rows); use inner or left_semi")
  override protected def defaultName: String = "bloom_join"
  val inputs = Seq(Port("probe"), Port("build"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("bloom_join")
  override def jsonParams: Map[String, Any] = Map(
    "probeKeys" -> probeKeys, "buildKeys" -> buildKeys,
    "expectedItems" -> expectedItems, "fpp" -> fpp,
    "joinType" -> joinType, "broadcastBuild" -> broadcastBuild)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val probe = in("probe")
    val build = in("build")
    // fan-out guard: the build side is read twice (bloom aggregate + the
    // exact join); persist so the bloom action doesn't recompute its lineage
    val buildP = ctx.track(build)
    // building the sketch is an eager action (like an estimator fit) — a
    // treeAggregate over the build keys only. An EMPTY build side makes
    // Spark's sketch aggregate return a null buffer (NPE in readFrom); the
    // correct bloom for an empty key set contains nothing.
    val keyed = buildP.select(expr(s"xxhash64(${buildKeys.mkString(", ")})").as("__bk"))
    val bf =
      if (keyed.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else keyed.stat.bloomFilter("__bk", expectedItems, fpp)
    val bfBc = ctx.spark.sparkContext.broadcast(bf)
    val mightContain = org.apache.spark.sql.functions.udf(
      (x: Long) => bfBc.value.mightContainLong(x))
    val pruned = probe
      .filter(mightContain(expr(s"xxhash64(${probeKeys.mkString(", ")})")))
    val cond = probeKeys.zip(buildKeys).map { case (a, b) => pruned(a) === buildP(b) }
      .reduce(_ && _)
    val rhs = if (broadcastBuild) broadcast(buildP) else buildP
    Map("result" -> pruned.join(rhs, cond, joinType))
  }
}
