package graft

import graft.dag._
import graft.nodes._
import org.scalatest.funsuite.AnyFunSuite

/** Executes the README "Quickstart" walkthrough (steps 1-6) so the
  * documentation cannot rot: same dag, same wiring, same API calls — only
  * the SparkSession comes from the shared test fixture and the output paths
  * land in a temp dir.
  */
class DocSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("README quickstart runs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_")

    // 1. Build
    val d = new Dag("quickstart")
    val clean  = d.add(FilterNode("qty > 0").named("clean"))
    val enrich = d.add(JoinNode.using(Seq("item"), broadcastRight = true).named("enrich"))
    val stats  = d.add(AggNode(Seq("category"), "sum(qty) as total_qty").named("stats"))
    d.input("sales") >> clean
    clean >> enrich("left")
    d.input("items") >> enrich("right")
    enrich >> stats >> d.output("by_category")

    // 2. Inspect
    val desc = d.describe
    assert(desc.contains("sales") && desc.contains("by_category") && desc.contains("enrich"))

    // 3. Render
    val dot = DagDot.toDot(d)
    assert(dot.contains("digraph") && dot.contains("clean") && dot.contains("stats"))

    // 4. Run
    val sales = Seq(("a", "i1", 2), ("a", "i2", -1), ("b", "i1", 5))
      .toDF("category", "item", "qty")
    val items = Seq(("i1", 1.0), ("i2", 3.5)).toDF("item", "price")
    val ctx = Ctx(spark)
    val run = d.fitTransform(ctx, Map("sales" -> sales, "items" -> items))
    val byCat = run("by_category").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat == Map("a" -> 2L, "b" -> 5L)) // negative-qty row dropped
    run.unpersist()

    // 5. Persist topology
    NodeRegistry.ensure
    val jsonPath = tmp.resolve("quickstart_dag.json").toString
    DagJson.save(d, jsonPath)
    val reloaded = DagJson.load(jsonPath)
    assert(reloaded.nodeNames.toSet == d.nodeNames.toSet)
    val rerun = reloaded.fitTransform(Ctx(spark), Map("sales" -> sales, "items" -> items))
    assert(rerun("by_category").collect().length == 2)

    // 6. Estimator fit + fitted-state persistence
    val e = new Dag("estimator")
    val scaler = e.add(new SparkMlNode(
      new org.apache.spark.ml.feature.StandardScaler()
        .setInputCol("features").setOutputCol("scaled"), "scaler"))
    e.input("train") >> scaler
    scaler >> e.output("scaled")
    val feats = sales.select(org.apache.spark.ml.functions.array_to_vector(
      org.apache.spark.sql.functions.array($"qty".cast("double"))).as("features"))
    val fitted = e.fitTransform(Ctx(spark), Map("train" -> feats))
    assert(fitted("scaled").columns.contains("scaled"))
    scaler.saveFitted(tmp.resolve("quickstart_scaler").toString)
    assert(java.nio.file.Files.exists(tmp.resolve("quickstart_scaler").resolve("metadata")))
  }

  test("README curation example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc2")
    val todaysDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark engines at scale"),
      (3L, "short"),
    ).toDF("doc_id", "text")
    val snapshotDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "unrelated snapshot content nothing shared with the delta"),
    ).toDF("doc_id", "text")

    val c = new Dag("curation")
    val gate = c.add(new HeuristicFilterNode(minWords = 5, minMeanWordLen = 1.0,
      maxMeanWordLen = 20.0, minStopwordHits = 0, keepOnly = true).named("gate"))
    val topq = c.add(new QuantileFilterNode("length(text)", keepFrac = 0.75).named("topq"))
    val index = c.add(new MinHashIndexNode(jaccardThreshold = 0.9).named("index"))
    val sample = c.add(new WeightedSampleNode("doc_id", "0.9").named("sample"))
    c.input("corpus") >> gate; gate >> topq; topq >> sample
    c.input("corpus_snapshot") >> index("corpus")
    sample >> index("delta")
    index >> c.output("near_dup_pairs")
    sample >> c.output("kept")

    val cr = c.fitTransform(Ctx(spark), Map(
      "corpus" -> todaysDocs, "corpus_snapshot" -> snapshotDocs))
    val pairs = cr("near_dup_pairs").select("delta_id", "base_id")
      .as[(Long, Long)].collect().toSeq
    // doc 1 survives the gates and exactly duplicates snapshot doc 100
    assert(pairs == Seq((1L, 100L)))
    assert(cr("kept").count() >= 1)
    index.saveFitted(tmp.resolve("minhash_index").toString)
    assert(java.nio.file.Files.exists(tmp.resolve("minhash_index").resolve("shingles")))
    cr.unpersist()
    index.unpersistIndex()
  }

  test("README refresh example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val referenceDocs = Seq((1L, "the quick brown fox the end")).toDF("doc_id", "text")
    val batch1 = Seq(
      (10L, "the quick brown fox"),
      (11L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    val batch2 = Seq((20L, "the quick brown fox")).toDF("doc_id", "text")
    val snapshotDocs = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")

    val lm = new UnigramSurpriseNode()
    lm.fit(Ctx(spark), In.single("reference" -> referenceDocs))
    val scored = lm.transform(Ctx(spark), In.single("df" -> batch1))("result")
    val keep = scored.filter("mean_surprise < 6000000 and n_oov * 5 < n_tokens")
    // the in-vocabulary doc passes, the all-OOV doc is gated out
    assert(keep.select("doc_id").as[Long].collect().toSeq == Seq(10L))

    val idx = new MinHashIndexNode(jaccardThreshold = 0.9)
    idx.fit(Ctx(spark), In.single("corpus" -> snapshotDocs))
    val dups1 = idx.transform(Ctx(spark), In.single("delta" -> batch1))("result")
      .select("delta_id", "base_id").as[(Long, Long)].collect().toSet
    assert(dups1 == Set((10L, 100L)))
    idx.updateIndex(Ctx(spark), batch1)
    val dups2 = idx.transform(Ctx(spark), In.single("delta" -> batch2))("result")
      .select("base_id").as[Long].collect().toSet
    assert(dups2 == Set(100L, 10L)) // batch2 dedups against corpus AND batch1

    val m = new Dag("media")
    m.input("blobs") >>
      new DecodeImageNode(payloadCol = "content") >>
      new ResizeImageNode(64, 64, payloadCol = "content") >>
      m.output("decoded")
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val blobs = Seq((1L, bos.toByteArray)).toDF("doc_id", "content")
    val out = m.transform(Ctx(spark), Map("blobs" -> blobs))("decoded")
    assert(out.selectExpr("image_meta.width", "resized_meta.width")
      .as[(Int, Int)].collect().head == ((4, 64)))
    lm.unpersistModel(); idx.unpersistIndex()
  }

  test("README lakehouse example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_lake_")
    val root = s"$tmp/corpus"
    val docs = (1L to 100L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // 1. publish with a range layout + file-level min/max stats
    val p = new Dag("publish")
    p.input("docs") >> new RepartitionNode(4, Seq("doc_id"), range = true) >>
      new SinkNode(root, atomicPublish = true, statsColumns = Seq("doc_id")) >>
      p.output("published")
    p.transform(Ctx(spark), Map("docs" -> docs))
    // 2. data-skipping scan opens only the files intersecting the range
    //    (run BEFORE the CDC wave — outstanding overlays refuse the
    //    stats-pruned read, since the stats describe the base only)
    val pruned = new StatsPrunedSourceNode(root, pruneCols = Seq("doc_id"),
      pruneLos = Seq(Some("30")), pruneHis = Seq(Some("40")))
      .transform(Ctx(spark), In.empty)("result")
    assert(pruned.inputFiles.length < 4 && pruned.count() == 11L)
    // 3. merge-on-read CDC: one wave (an upsert + a tombstone) commits as
    //    an O(delta) overlay — the base generation is untouched
    val cdc = Seq((1L, "doc number 1 v2", false), (2L, "", true))
      .toDF("doc_id", "text", "is_delete")
    cdc.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cdc")
    val cdcStream = spark.readStream.schema(cdc.schema).parquet(s"$tmp/cdc")
    MorCdc.applyStream(Ctx(spark), root, cdcStream,
      new MergeNode(keys = Seq("doc_id"), deleteCol = Some("is_delete")),
      compactEvery = 8, checkpoint = Some(s"$tmp/ckpt"))
    // 4. the live view: upsert visible, tombstone gone; plain SourceNode
    //    still reads the consistent-but-stale base
    val live = new MorSourceNode(root, keys = Seq("doc_id"))
      .transform(Ctx(spark), In.empty)("result")
    assert(live.count() == 99L)
    assert(live.filter("doc_id = 1").select("text").as[String].head() == "doc number 1 v2")
    assert(new SourceNode(root).transform(Ctx(spark), In.empty)("result").count() == 100L)
  }

  test("README round-13 lakehouse example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_r13_")
    val root = s"$tmp/corpus"
    val ctx = Ctx(spark)
    val docs = (1L to 100L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // publish with range layout + min/max stats + per-file blooms
    val p = new Dag("publish")
    p.input("docs") >> new RepartitionNode(4, Seq("doc_id"), range = true) >>
      new SinkNode(root, atomicPublish = true, statsColumns = Seq("doc_id"),
        bloomColumns = Seq("doc_id"), bloomExpectedItems = 1000L) >>
      p.output("published")
    p.transform(ctx, Map("docs" -> docs))
    // one outstanding CDC wave (upsert + tombstone) as an overlay
    AtomicPublish.publishDelta(spark, root, 0L, { t =>
      Seq((35L, "doc number 35 v2", false), (36L, "", true))
        .toDF("doc_id", "text", MorCdc.DeletedCol).coalesce(1).write.parquet(t)
    })
    // 1. stats-pruned read COMPOSES with the outstanding overlay
    val pruned = new StatsPrunedSourceNode(root, pruneCols = Seq("doc_id"),
      pruneLos = Seq(Some("30")), pruneHis = Seq(Some("40")),
      morKeys = Seq("doc_id")).transform(ctx, In.empty)("result")
    assert(pruned.inputFiles.count(!_.contains("/_deltas/")) < 4)
    assert(pruned.count() == 10L) // 11 in range, one tombstoned
    assert(pruned.filter("doc_id = 35").select("text").as[String].head()
      == "doc number 35 v2")
    // 2. bloom point lookup: probe ids, open only might-contain files
    val probe = Seq(10L, 35L, 36L, 9999L).toDF("doc_id")
    val hits = new BloomPrunedSourceNode(root, inCol = "doc_id",
      morKeys = Seq("doc_id")).transform(ctx, In.single("ids" -> probe))("result")
    assert(hits.select("doc_id").as[Long].collect().toSet == Set(10L, 35L))
    // 3. change-feed subscription: the lexical index maintains itself
    //    straight off the published root
    val idx = new InvertedIndexNode(k = 5, maxDfFrac = 1.0)
    idx.fit(ctx, In.single("corpus" ->
      new SourceNode(root).transform(ctx, In.empty)("result")))
    val tail = new MorTailNode(root).transform(ctx, In.empty)("result")
    IndexMaintenance.maintainFromStream(idx, ctx, tail,
      checkpoint = Some(s"$tmp/ckpt"), deleteCol = Some(MorCdc.DeletedCol))
    assert(idx.model.get.nDocs == 99L) // 100 base, 36 deleted, 35 replaced
    // 4. racing publishers: one winner, loser raises
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(new java.io.File(s"$root/${AtomicPublish.ClaimPrefix}2").createNewFile())
    intercept[GraftException] {
      AtomicPublish.publish(spark, root, { t => docs.write.parquet(t) })
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/${AtomicPublish.ClaimPrefix}2"), false)
    idx.unpersistIndex()
  }

  test("README churn-resilience example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_churn_")
    val root = s"$tmp/corpus"
    val ctx = Ctx(spark)
    val docs = (1L to 100L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val p = new Dag("publish")
    p.input("docs") >> new RepartitionNode(4, Seq("doc_id"), range = true) >>
      new SinkNode(root, atomicPublish = true, statsColumns = Seq("doc_id")) >>
      p.output("published")
    p.transform(ctx, Map("docs" -> docs))
    // 1. schema evolution: a wave that ADDS `quality` commits under the gate
    val evolved = Seq((7L, "doc number 7 v2", 0.9, false))
      .toDF("doc_id", "text", "quality", "is_delete")
    evolved.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cdc")
    val feed = spark.readStream.schema(evolved.schema).parquet(s"$tmp/cdc")
    val merge = new MergeNode(keys = Seq("doc_id"), deleteCol = Some("is_delete"))
    intercept[Exception] { // ungated evolution refuses
      MorCdc.applyStream(ctx, root, feed, merge, checkpoint = Some(s"$tmp/ck0"))
    }
    MorCdc.applyStream(ctx, root, feed, merge,
      checkpoint = Some(s"$tmp/ck0"), allowEvolution = true)
    val live = new MorSourceNode(root, keys = Seq("doc_id"))
      .transform(ctx, In.empty)("result")
    assert(live.schema.fieldNames.contains("quality"))
    assert(live.filter("quality is not null").count() == 1L)
    // 3. overlay-level time travel: the view as of wave 0 (the only wave)
    assert(new MorSourceNode(root, keys = Seq("doc_id"), asOfBatch = Some(0L))
      .transform(ctx, In.empty)("result").count() == 100L)
    // 4. one subscription across a fold: subscribe, wave arrives pre-fold,
    //    compact with stats re-stamp (2), post-fold waves keep flowing
    val tail = new MorTailNode(root, followCompactions = true)
      .transform(ctx, In.empty)("result")
    var seen = 0L
    def drain(): Unit = {
      val q = tail.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += b.count(); () }
        .option("checkpointLocation", s"$tmp/ck1")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(); assert(seen == 1L) // the evolved wave
    MorCdc.compact(ctx, root, Seq("doc_id"), throughBatch = 0L,
      statsColumns = Seq("doc_id"), layoutBy = Seq("doc_id"),
      layoutPartitions = Some(4))
    // 2. skipping survived the fold (stats re-stamped on the new base)
    val pruned = new StatsPrunedSourceNode(root, pruneCols = Seq("doc_id"),
      pruneLos = Seq(Some("30")), pruneHis = Seq(Some("40")))
      .transform(ctx, In.empty)("result")
    assert(pruned.count() == 11L && pruned.inputFiles.length < 4)
    AtomicPublish.publishDelta(spark, root, 1L, { t =>
      Seq((8L, "doc number 8 v2", 0.5, false))
        .toDF("doc_id", "text", "quality", MorCdc.DeletedCol)
        .coalesce(1).write.parquet(t)
    })
    drain(); assert(seen == 2L) // post-fold wave, same subscription
  }

  test("README takedown example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val famText = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = ((1L to 6L).map(i => (i, famText)) ++
      Seq((50L, (100 to 140).map(i => s"v$i").mkString(" ")))).toDF("doc_id", "text")
    // fit under a tight cap: the 6-member family bucket drops whole
    val idx = new MinHashIndexNode(numHashes = 32, bands = 16,
      jaccardThreshold = 0.8, maxBucket = 4)
    idx.fit(Ctx(spark), In.single("corpus" -> corpus))
    // 1. takedown wave reaches the index
    val tombstones = Seq(5L, 6L).toDF("doc_id")
    idx.deleteFromIndex(Ctx(spark), tombstones)
    // 2. rebuild re-derives the capped buckets from the shingle ledger
    idx.rebuildIndex()
    val probe = Seq((1000L, famText)).toDF("doc_id", "text")
    val found = idx.transform(Ctx(spark), In.single("delta" -> probe))("result")
      .select("base_id").as[Long].collect().toSet
    assert(found == Set(1L, 2L, 3L, 4L)) // family resurrected minus deletions
    // 3. CDC stream maintaining a lexical index exactly-once
    val invIdx = new InvertedIndexNode(k = 5, maxDfFrac = 1.0)
    invIdx.fit(Ctx(spark), In.single("corpus" ->
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_cdc_")
    val cdc = Seq((2L, "", true), (3L, "alpha gamma", false))
      .toDF("doc_id", "text", "is_delete")
    cdc.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cdc")
    val cdcStream = spark.readStream.schema(cdc.schema).parquet(s"$tmp/cdc")
    IndexMaintenance.maintainFromStream(invIdx, Ctx(spark), cdcStream,
      checkpoint = Some(s"$tmp/ckpt"), deleteCol = Some("is_delete"))
    assert(invIdx.model.get.nDocs == 2L) // 1 kept + 1 inserted, 1 deleted
    // 4. ANN rebuild under drift (centroid refresh from index contents)
    val ivfIdx = new IvfIndexNode(k = 5, nClusters = 2, nProbe = 2)
    ivfIdx.fit(Ctx(spark), In.single("corpus" ->
      (1L to 8L).map(i => (i, Array(i.toFloat, 1.0f))).toDF("vec_id", "embedding")))
    ivfIdx.rebuildIndex(Ctx(spark))
    assert(ivfIdx.model.get.assignments.count() == 8L)
    Seq(idx).foreach(_.unpersistIndex()); invIdx.unpersistIndex(); ivfIdx.unpersistIndex()
  }

  test("README dashboard IVM example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val ctx = Ctx(spark)
    // 1+2: maintained aggregate over a corpus, then a crawl batch and a
    // takedown wave; serve + topValues must equal the declarative answers
    val docs = (1L to 60L)
      .map(i => (i, s"s${i % 3}", i * 10L, s"l${i % 4}"))
      .toDF("doc_id", "source", "n_chars", "lang")
    val stats = new AggIndexNode(groupCols = Seq("source"),
      sumCols = Seq("n_chars"), sumSqCols = Seq("n_chars"),
      minCols = Seq("n_chars"),
      maxCols = Seq("n_chars"), distinctCols = Seq("lang"))
    stats.fit(ctx, In.single("corpus" -> docs.filter("doc_id <= 40")))
    stats.updateIndex(ctx, docs.filter("doc_id > 40"))
    stats.deleteFromIndex(ctx, docs.filter("doc_id % 4 = 0").select("doc_id"))
    val sources = docs.select("source").distinct()
    val servedStats = stats.transform(ctx,
      In.single("probe" -> sources))("result")
    val oracle = docs.filter("doc_id % 4 != 0").groupBy("source").agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_rows"),
      org.apache.spark.sql.functions.sum("n_chars").as("sum_n_chars"),
      org.apache.spark.sql.functions.expr("sum(n_chars * n_chars)").as("sumsq_n_chars"),
      org.apache.spark.sql.functions.min("n_chars").as("min_n_chars"),
      org.apache.spark.sql.functions.max("n_chars").as("max_n_chars"),
      org.apache.spark.sql.functions.count_distinct(
        org.apache.spark.sql.functions.col("lang")).as("nd_lang"))
    assert(servedStats.selectExpr(oracle.columns.toIndexedSeq: _*)
      .collect().toSet == oracle.collect().toSet)
    val top = stats.topValues(ctx, sources, "lang", 2)
    assert(top.filter("rank = 1").count() == 3L) // one leader per source
    // 3: materialized join — late dim rows pick up dangling facts
    val orders = Seq((1L, 10L, "O"), (2L, 11L, "F"), (3L, 12L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_status")
    val custs = Seq((10L, "alice"), (11L, "bo")).toDF("c_custkey", "c_name")
    val view = new MaterializedJoinNode(leftOn = Seq("o_custkey"),
      rightOn = Seq("c_custkey"), leftId = "o_orderkey", rightId = "c_custkey")
    view.fit(ctx, In.single("left" -> orders, "right" -> custs))
    view.updateIndex(ctx, Seq((4L, 12L, "F")).toDF("o_orderkey", "o_custkey", "o_status"))
    view.updateRight(ctx, Seq((12L, "cy")).toDF("c_custkey", "c_name")) // retroactive
    view.deleteFromRight(ctx, Seq(11L).toDF("c_custkey"))
    val probeAll = orders.select("o_custkey").distinct()
    val served = view.transform(ctx, In.single("probe" -> probeAll))("result")
    assert(served.select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
      == Set((1L, "alice"), (3L, "cy"), (4L, "cy")))
    // 4: the aggregate maintains itself off a CDC feed (file stream,
    // upsert-then-tombstone shape — the MorTail contract)
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_ivm_")
    val cdc = Seq((61L, "s0", "610", "l1", false), (1L, null, null, null, true))
      .toDF("doc_id", "source", "n_chars", "lang", "__deleted")
      .selectExpr("doc_id", "source", "cast(n_chars as bigint) as n_chars",
        "lang", "__deleted")
    cdc.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cdc")
    val feed = spark.readStream.schema(cdc.schema).parquet(s"$tmp/cdc")
    IndexMaintenance.maintainFromStream(stats, ctx, feed,
      checkpoint = Some(s"$tmp/ckpt"), deleteCol = Some("__deleted"))
    val post = stats.transform(ctx, In.single("probe" -> sources))("result")
      .filter("source = 's0'").select("n_rows").as[Long].head()
    val expected = docs.filter(
      "doc_id % 4 != 0 AND doc_id != 1 AND source = 's0'").count() + 1L
    assert(post == expected)
    // 5: live quantiles from maintained histogram bins
    val hist = new AggIndexNode(groupCols = Seq("source"),
      histSpecs = Seq(AggIndexNode.HistSpec("n_chars", 0L, 8191L, 64)))
    hist.fit(ctx, In.single("corpus" -> docs))
    assert(hist.histQuantiles(ctx, sources, "n_chars",
      Seq(0.5, 0.95, 0.99)).count() == 9L) // 3 sources x 3 quantiles
    assert(hist.histogramOf(ctx, sources, "n_chars").count() > 0L)
    // 6: predicate retention (null-safe; no id round-trip)
    stats.deleteWhere(ctx, "n_chars < 96 OR lang = 'zh'")
    assert(stats.transform(ctx, In.single("probe" -> sources))("result")
      .selectExpr("sum(n_rows)").as[Long].head() ==
      docs.filter("doc_id % 4 != 0 AND doc_id != 1 AND n_chars >= 96")
        .count() + 1L) // +1: the stream-inserted doc 61 (n_chars 610)
    // 7: ledgerless sketch index — inserts union; deletes refused
    val card = new SketchIndexNode(groupCols = Seq("source"), cols = Seq("lang"))
    card.fit(ctx, In.single("corpus" -> docs.filter("doc_id <= 40")))
    card.updateIndex(ctx, docs.filter("doc_id > 40"))
    assert(card.transform(ctx, In.single("probe" -> sources))("result")
      .columns.toSeq == Seq("source", "n_rows", "nd_lang"))
    intercept[GraftException] {
      card.deleteFromIndex(ctx, docs.limit(1).select("doc_id"))
    }
    stats.unpersistIndex(); view.unpersistIndex()
    hist.unpersistIndex(); card.unpersistIndex()
  }

  test("README chain-and-star example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val ctx = Ctx(spark)
    // 8: maintained float quantiles (KLL measure, insert-only)
    val docs = (1L to 90L).map(i => (i, s"d${i % 3}", i / 7.0))
      .toDF("doc_id", "domain", "score")
    val domains = docs.select("domain").distinct()
    val scores = new SketchIndexNode(groupCols = Seq("domain"),
      cols = Nil, quantileCols = Seq("score"))
    scores.fit(ctx, In.single("corpus" -> docs.filter("doc_id % 2 = 0")))
    scores.updateIndex(ctx, docs.filter("doc_id % 2 = 1"))
    val qs = scores.quantilesOf(ctx, domains, "score", Seq(0.5, 0.95, 0.99))
    assert(qs.count() == 9L) // 3 domains x 3 quantiles
    // 9+10: join chained onto join, dashboard chained onto the far end
    val orders = (1L to 30L).map(i => (i, i % 5, i)).toDF("o_orderkey", "o_custkey", "o_qty")
    val custs = (0L to 4L).map(i => (i, s"c$i", i % 2)).toDF("c_custkey", "c_name", "c_nationkey")
    val nations = Seq((0L, "n0"), (1L, "n1")).toDF("n_nationkey", "n_name")
    val view = new MaterializedJoinNode(leftOn = Seq("o_custkey"),
      rightOn = Seq("c_custkey"), leftId = "o_orderkey", rightId = "c_custkey",
      joinType = "left_outer")
    view.fit(ctx, In.single("left" -> orders, "right" -> custs))
    val star = new MaterializedJoinNode(leftOn = Seq("c_nationkey"),
      rightOn = Seq("n_nationkey"), leftId = "v1_id", rightId = "n_nationkey",
      joinType = "left_outer")
    view.chainJoin(ctx, star, nations)
    val dash = new AggIndexNode(groupCols = Seq("n_name"),
      sumCols = Seq("o_qty"), idCol = MaterializedJoinNode.ViewIdCol)
    star.chainAggregate(ctx, dash)
    // one wave per feed, then the dashboard equals the declarative chain
    view.deleteFromIndex(ctx, orders.filter("o_orderkey % 6 = 0").select("o_orderkey"))
    view.deleteFromRight(ctx, Seq(2L).toDF("c_custkey"))
    star.deleteFromRight(ctx, Seq(1L).toDF("n_nationkey"))
    val probe = nations.select("n_name").distinct()
      .unionByName(Seq(Option.empty[String]).toDF("n_name"))
    val got = dash.transform(ctx, In.single("probe" -> probe))("result")
      .as[(Option[String], Long, Long)].collect().toSet
    val want = orders.filter("o_orderkey % 6 != 0")
      .join(custs.filter("c_custkey != 2"), $"o_custkey" === $"c_custkey", "left_outer")
      .join(nations.filter("n_nationkey != 1"), $"c_nationkey" === $"n_nationkey", "left_outer")
      .groupBy("n_name")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum("o_qty").as("sum_o_qty"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(got == want)
    dash.unpersistIndex(); star.unpersistIndex(); view.unpersistIndex()
    scores.unpersistIndex()
  }

  test("README published-feed and decimal-sum example runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val ctx = Ctx(spark)
    // README item 11: the chain across processes — publish the Δview
    // feed, seed a consumer from the base generation, drain the overlays
    val orders = Seq((1L, 10L, 5L), (2L, 11L, 7L), (3L, 10L, 2L))
      .toDF("o_orderkey", "o_custkey", "o_qty")
    val custs = Seq((10L, "alice"), (11L, "bob")).toDF("c_custkey", "c_name")
    val view = new MaterializedJoinNode(leftOn = Seq("o_custkey"),
      rightOn = Seq("c_custkey"), leftId = "o_orderkey",
      rightId = "c_custkey", joinType = "left_outer")
    view.fit(ctx, In.single("left" -> orders, "right" -> custs))
    val tmp = java.nio.file.Files.createTempDirectory("graft_doc_feed_")
    val viewRoot = s"$tmp/view_mor"
    view.publishViewDelta(ctx, viewRoot)
    // consumer process: seed the dashboard from the published base
    val dash = new AggIndexNode(groupCols = Seq("c_name"),
      sumCols = Seq("o_qty"), idCol = MaterializedJoinNode.ViewIdCol)
    dash.fit(ctx, In.single("corpus" ->
      new MorSourceNode(viewRoot, keys = Seq(MaterializedJoinNode.ViewIdCol))
        .transform(ctx, In.empty)("result")))
    // producer waves land as single-file overlays...
    view.updateIndex(ctx, Seq((4L, 11L, 3L)).toDF("o_orderkey", "o_custkey", "o_qty"))
    view.deleteFromRight(ctx, Seq(10L).toDF("c_custkey"))
    // ...and the consumer drains them through the standard subscription
    IndexMaintenance.maintainFromStream(dash, ctx,
      new MorTailNode(viewRoot, maxFilesPerTrigger = Some(1))
        .transform(ctx, In.empty)("result"),
      checkpoint = Some(s"$tmp/ckpt"), deleteCol = Some(MorCdc.DeletedCol))
    val probe = custs.select("c_name")
      .unionByName(Seq(Option.empty[String]).toDF("c_name")).distinct()
    val got = dash.transform(ctx, In.single("probe" -> probe))("result")
      .as[(Option[String], Long, Long)].collect().toSet
    // live algebra: customer 10 taken down -> its orders dangle (NULL group)
    assert(got == Set((Some("bob"), 2L, 10L), (None, 2L, 7L)))
    // README item 12: decimal-exact float sums under a re-pricing upsert
    val priced = Seq((1L, "HIGH", 0.1), (2L, "HIGH", 0.2), (3L, "LOW", 1.1))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val spend = new AggIndexNode(groupCols = Seq("o_orderpriority"),
      decSumCols = Seq("o_totalprice"), decScale = 4, idCol = "o_orderkey")
    spend.fit(ctx, In.single("corpus" -> priced))
    spend.deleteFromIndex(ctx, Seq(2L).toDF("o_orderkey"))
    spend.updateIndex(ctx, Seq((2L, "HIGH", 0.4))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice"))
    val dsum = spend.transform(ctx, In.single("probe" ->
      Seq("HIGH").toDF("o_orderpriority")))("result").collect().head.getDecimal(2)
    assert(dsum == new java.math.BigDecimal("0.5000")) // 0.1 + 0.4, exact
    dash.unpersistIndex(); view.unpersistIndex(); spend.unpersistIndex()
  }
}
