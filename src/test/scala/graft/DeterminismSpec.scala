package graft

import graft.queries.Queries
import org.scalatest.funsuite.AnyFunSuite

/** The library's central promise — every sampling/ordering/sharding decision
  * is a pure function of the data via DetHash — means results must be
  * IDENTICAL under any parallelism or input layout. This spec re-runs the
  * contract-bearing queries with a different shuffle-partition count and
  * asserts bit-identical collected output (seeded `df.sample`-style
  * operators fail exactly this test, which is why the library bans them).
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] = {
    val df = Queries.all(q)(spark, dir)
    val out = df.collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    out
  }

  // the queries whose OUTPUT depends on a deterministic-decision contract:
  // split/sample (DetHash mod), weighted sample, shard packing (bucketed
  // prefix sum), stratified sample, dedup survivor selection, LM scoring
  private val contractQueries = Seq(
    "q60_split", "q70_stratified_sample", "q104_weighted_sample",
    "q123_token_shards", "q44_dedup_survivors", "q118_unigram_surprise",
    "q126_lm_classifier",
    // round-10: span keeper choice (min-doc canonical), quality-argmax
    // survivor (n_chars desc, id asc tie-break)
    "q137_span_dedup", "q140_best_survivor",
    // round-12: perceptual hashing must be bit-identical under any
    // parallelism (integer codecs + banded joins, no float voting) — the
    // three-channel consensus breaks if ANY channel wobbles
    "q177_image_neardup", "q182_multimodal_consensus")

  test("contract queries are invariant to shuffle parallelism") {
    val conf = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(conf)
    try {
      contractQueries.foreach { q =>
        spark.conf.set(conf, "3")
        val a = rows(q)
        spark.conf.set(conf, "17")
        val b = rows(q)
        assert(a == b, s"$q diverged between 3 and 17 shuffle partitions")
        assert(a.nonEmpty, s"$q returned no rows — vacuous invariance")
      }
    } finally spark.conf.set(conf, orig)
  }
}
