package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dag._
import graft.nodes._
import graft.queries.Queries

/** Scratch profiler for q124's stage-by-stage cost at sf0.1 (temporary). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sparkNorm = "regexp_replace(lower(trim(text)), '\\s+', ' ')"
    // A/B: lazy lineage truncation after the dedup block and the quantile
    // gate — isolates Catalyst re-analysis cost from execution cost
    val useBarrier = sys.env.get("SPARK_GRAFT_BARRIER").contains("1")
    def barrier(tag: String): Node =
      if (useBarrier) FnNode.map1(s"barrier_$tag")(_.localCheckpoint(false))
      else FnNode.map1(s"nobarrier_$tag")(identity)

    def stagePrefix(n: Int): DataFrame = Queries.run(spark) { d =>
      val src = d.add(SourceNode.table(dir, "documents"))
      val bench = src >> FilterNode("doc_id < 10").named("bench")
      val corpus = src("result") >> FilterNode("doc_id >= 10").named("corpus0")
      val gated = corpus >> new HeuristicFilterNode(minWords = 40, maxWords = 100000,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8, minStopwordHits = 1, keepOnly = true)
      if (n == 1) gated >> d.output("result")
      else {
        val en = gated >> new LangIdNode("text") >>
          FilterNode("pred_lang = 'en'").named("en_gate")
        if (n == 2) en >> d.output("result")
        else {
          val ded = d.add(new ExactDedupNode(
            Seq(s"md5(cast($sparkNorm as binary))"), "doc_id").named("exact"))
          en >> ded
          val exact = d.add(JoinNode.using(Seq("doc_id"), joinType = "left_semi").named("exact_join"))
          en("result") >> exact("left")
          ded >> ProjectNode("doc_id").named("exact_ids") >> exact("right")
          if (n == 3) exact >> d.output("result")
          else {
            val pairs = exact >> new MinHashDedupNode(
              numHashes = 32, bands = 16, shingleN = 3, jaccardThreshold = 0.8)
            val nd0 = d.add(new DedupSurvivorsNode())
            exact("result") >> nd0("docs"); pairs >> nd0("pairs")
            val nd = nd0 >> barrier("dedup")
            if (n == 4) nd >> d.output("result")
            else {
              val cont = d.add(new ContaminationNode(shingleN = 3))
              nd >> cont("docs"); bench >> cont("benchmark")
              val cleanIds = cont >> FilterNode("overlap_frac < 0.5") >>
                ProjectNode("doc_id").named("clean_ids")
              val clean = d.add(JoinNode.using(Seq("doc_id"), joinType = "left_semi").named("clean_join"))
              nd("result") >> clean("left"); cleanIds >> clean("right")
              if (n == 5) clean >> d.output("result")
              else {
                val qual = clean >> new QuantileFilterNode(scoreExpr = "n_chars",
                  keepFrac = 0.5, groupCols = Seq("source")) >> barrier("qual")
                if (n == 6) qual >> d.output("result")
                else {
                  val mixed = qual >> new DomainMixNode(Seq("src0" -> 2.0, "src1" -> 0.5)) >>
                    new WithColumnsNode(Seq("uid" -> "doc_id * 10 + copy"))
                  if (n == 7) mixed >> d.output("result")
                  else {
                    mixed >> new TokenCountNode() >>
                      new SequencePackNode(idCol = "uid", tokensCol = Some("ws_tokens"),
                        seqLen = 256, shards = 8) >>
                      new TokenShardNode(idCol = "uid", weightExpr = "ws_tokens",
                        budget = 2000L, buckets = 16) >>
                      AggNode(Seq("shard_id"),
                        "count(*) as n_docs",
                        "cast(sum(ws_tokens) as bigint) as total_tokens",
                        "cast(sum(n_seqs) as bigint) as total_seqs",
                        "cast(max(copy) as bigint) as max_copy") >>
                      SortNode("shard_id") >> d.output("result")
                  }
                }
              }
            }
          }
        }
      }
    }

    // warmup: one full run (parquet scan init, codegen caches)
    stagePrefix(8).count()
    spark.catalog.clearCache()
    var prev = 0.0
    (1 to 8).foreach { n =>
      val t0 = System.nanoTime()
      val c = stagePrefix(n).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] prefix $n%d rows=$c%-7d total=$sec%6.2f s  delta=${sec - prev}%6.2f s")
      prev = sec
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
