package graft

import graft.dag._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5: random-DAG topology + operator
  * algebra). Driven through plain ScalaCheck inside ScalaTest (no bridge
  * artifact in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  /** Random DAG: n identity-ish nodes, forward edges only (i < j) — acyclic
    * by construction — plus random order-only deps.
    */
  private val genDagSpec: Gen[(Int, Seq[(Int, Int)], Seq[(Int, Int)])] = for {
    n <- Gen.choose(2, 12)
    nEdges <- Gen.choose(0, n * 2)
    edges <- Gen.listOfN(nEdges, for {
      i <- Gen.choose(0, n - 2)
      j <- Gen.choose(i + 1, n - 1)
    } yield (i, j))
    nDeps <- Gen.choose(0, n)
    deps <- Gen.listOfN(nDeps, for {
      i <- Gen.choose(0, n - 2)
      j <- Gen.choose(i + 1, n - 1)
    } yield (i, j))
  } yield (n, edges, deps)

  test("topoOrder respects every data edge and dependency on random DAGs") {
    check(Prop.forAll(genDagSpec) { case (n, edges, deps) =>
      val d = new Dag()
      val nodes = (0 until n).map { i =>
        d.add(new FnNode(Seq(Port("dfs", variadic = true)), Seq(Port("result")),
          (_, _) => Map.empty, s"n$i"))
      }
      edges.foreach { case (i, j) => nodes(i)("result") >> nodes(j)("dfs") }
      deps.foreach { case (i, j) => nodes(j).after(nodes(i)) }
      val pos = d.topoOrder.map(_.name).zipWithIndex.toMap
      edges.forall { case (i, j) => pos(s"n$i") < pos(s"n$j") } &&
        deps.forall { case (i, j) => pos(s"n$i") < pos(s"n$j") } &&
        pos.size == n
    })
  }

  test("backward edge always raises CycleException on random DAG chains") {
    check(Prop.forAll(Gen.choose(2, 8)) { n =>
      val d = new Dag()
      val nodes = (0 until n).map { i =>
        d.add(new FnNode(Seq(Port("dfs", variadic = true)), Seq(Port("result")),
          (_, _) => Map.empty, s"n$i"))
      }
      (0 until n - 1).foreach(i => nodes(i)("result") >> nodes(i + 1)("dfs"))
      nodes(n - 1)("result") >> nodes(0)("dfs") // close the cycle
      Prop.throws(classOf[CycleException])(d.topoOrder)
    })
  }

  test("shingle_hashes is deterministic, sorted, distinct; equal token seqs collide") {
    lazy val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    graft.functions.VecFunctions.register(spark)
    val genToks = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "cat", "dog", "the", "xyz"))
    check(Prop.forAll(genToks) { toks =>
      val df = Seq((1, toks), (2, toks)).toDF("id", "toks")
        .withColumn("sh", expr("shingle_hashes(toks, 3)"))
      val rows = df.select("sh").as[Seq[Long]].collect()
      rows(0) == rows(1) &&                       // deterministic
        rows(0) == rows(0).sorted &&              // sorted
        rows(0).distinct.size == rows(0).size     // distinct
    })
  }

  test("bpe_encode round-trip invariant holds for random text and learned merges") {
    import graft.functions.{BpeEncode, BpeTrain}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    // mixed-script words incl. an uppercase form, combining accents, CJK, a
    // surrogate-pair emoji, punctuation runs — everything the codepoint
    // slicing and lowercasing must survive
    val word = Gen.oneOf("Alpha", "beta", "GAMMA", "déjà", "中文字", "x😀y", "a.b,c", "zz-top", "Q")
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \r ")
    val genText = for {
      n <- Gen.choose(0, 12)
      lead <- ws
      parts <- Gen.listOfN(n, for { w <- word; s <- ws } yield w + s)
    } yield lead + parts.mkString
    check(Prop.forAll(genText, Gen.choose(0, 30)) { (text: String, numMerges: Int) =>
      val words = text.toLowerCase.split("[ \\t\\n\\u000B\\f\\r]+").filter(_.nonEmpty)
      val freq = words.groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
        .toSeq.sortBy(_._1)
      val merges = BpeTrain.train(freq, numMerges)
      val out = BpeEncode(Literal(text), merges).eval(null).asInstanceOf[ArrayData]
      val concat = (0 until out.numElements()).map(out.getUTF8String(_).toString).mkString
      concat == text.toLowerCase.replaceAll("[ \\t\\n\\u000B\\f\\r]", "")
    })
  }

  test("scheduler throughput: 10k-node chain topo-sorts in well under a second " +
    "(reference rescans were O(V^2 E), mldag.py:456-458)") {
    val d = new Dag()
    val nodes = (0 until 10000).map(i =>
      d.add(new FnNode(Seq(Port("dfs", variadic = true)), Seq(Port("result")),
        (_, _) => Map.empty, s"n$i")))
    (0 until 9999).foreach(i => nodes(i)("result") >> nodes(i + 1)("dfs"))
    val t0 = System.nanoTime()
    val order = d.topoOrder
    val ms = (System.nanoTime() - t0) / 1e6
    assert(order.size == 10000)
    assert(ms < 1000.0, s"topo sort took $ms ms")
  }

  test("auto-naming never collides on random add sequences") {
    check(Prop.forAll(Gen.listOfN(12, Gen.oneOf("a", "b", "c"))) { bases =>
      val d = new Dag()
      bases.foreach(b => d.add(new FnNode(Nil, Seq(Port("result")), (_, _) => Map.empty, b)))
      d.nodeNames.distinct.size == d.nodeNames.size
    })
  }

  test("as-of merge and expand strategies agree on random inputs " +
    "(keys, ties, null times, both directions, inner and left)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes._
    val genCase = for {
      nl <- Gen.choose(0, 10)
      nr <- Gen.choose(0, 10)
      lefts <- Gen.listOfN(nl, for {
        k <- Gen.choose(1L, 3L); t <- Gen.option(Gen.choose(0L, 12L))
      } yield (k, t))
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 3L); t <- Gen.option(Gen.choose(0L, 12L))
      } yield (k, t))
      fwd <- Gen.oneOf(true, false)
      jt <- Gen.oneOf("inner", "left")
    } yield (lefts, rights, fwd, jt)
    val p = Prop.forAll(genCase) { case (lefts, rights, fwd, jt) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = rights.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k2", "rt", "rid")
      def run(strategy: String): Set[(Long, Option[Long])] = {
        val d = new Dag()
        val ln = d.add(new FnNode(Nil, Seq(Port("result")), (_, _) => Map("result" -> l), "l"))
        val rn = d.add(new FnNode(Nil, Seq(Port("result")), (_, _) => Map("result" -> r), "r"))
        val j = d.add(new AsofJoinNode(Seq("k"), Seq("k2"), "t", "rt",
          Seq("lid"), rightTieBreak = "rid", joinType = jt, forward = fwd,
          strategy = strategy))
        ln >> j("left"); rn >> j("right"); j >> d.output("result")
        d.transform(Ctx(spark)).outputs("result")
          .select("lid", "rid").collect()
          .map(row => (row.getLong(0),
            if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSet
      }
      val (m, e) = (run("merge"), run("expand"))
      if (m != e) println(s"MISMATCH fwd=$fwd jt=$jt lefts=$lefts rights=$rights merge=$m expand=$e")
      m == e
    }
    // fewer trials than the pure-graph properties: each trial runs two Spark
    // jobs; 15 randomized cases still sweep ties/nulls/directions broadly
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("keyed fan-in delivers exactly the upstream-name set, insertion-ordered, " +
    "on random fan-in widths") {
    val spark = SparkFixture.spark
    check(Prop.forAll(Gen.choose(1, 6)) { k =>
      val d = new Dag()
      val df = spark.range(1).toDF("id")
      val ups = (0 until k).map(i =>
        d.add(new FnNode(Nil, Seq(Port("result")), (_, _) => Map("result" -> df), s"up$i")))
      var seen: Seq[String] = Nil
      val sink = d.add(FnNode.mapKeyed("sink") { m => seen = m.keys.toSeq; m.values.head })
      ups.foreach(u => u >> sink("dfs"))
      sink >> d.output("result")
      d.transform(Ctx(spark))
      seen == (0 until k).map(i => s"up$i")
    })
  }

  test("url canonicalization is idempotent on random URL surface forms") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS")
    val host = Gen.oneOf("Example.COM", "example.com", "Sub.Ex.org", "www.A.net")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/A/b", "/x%20y")
    val params = Gen.listOf(Gen.oneOf("a=1", "b=2", "utm_source=x", "gclid=9", "z", "k="))
    val frag = Gen.oneOf("", "#f", "#x?y=1")
    val genUrl = for {
      s <- scheme; h <- host; po <- port; pa <- path; ps <- params; f <- frag
    } yield s"$s://$h$po$pa" + (if (ps.isEmpty) "" else ps.mkString("?", "&", "")) + f
    // also non-URL junk: the pass-through branch must be idempotent too
    val gen = Gen.oneOf(genUrl, Gen.oneOf("not a url", "  /rel?x=1 ", "", "a:b:c"))
    check(Prop.forAll(Gen.nonEmptyListOf(gen)) { urls =>
      def canon(df: org.apache.spark.sql.DataFrame, in: String, out: String) = {
        val d = new Dag()
        val src = d.add(new FnNode(Nil, Seq(Port("result")), (_, _) => Map("result" -> df), "src"))
        src >> new graft.nodes.UrlCanonNode(urlCol = in, outCol = out) >> d.output("result")
        d.transform(Ctx(spark)).outputs("result")
      }
      val base = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("id", "url")
      val once = canon(base, "url", "c1")
      val twice = canon(once, "c1", "c2")
      twice.select("c1", "c2").collect().forall(r => r.getString(0) == r.getString(1))
    })
  }

  test("ClusterIndexNode overlay composition: random edge batches + folds + trailing " +
    "deletes equal one-shot CC labels (deleted ids -> self) on random graphs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.ClusterIndexNode
    // random graph over a small id universe, random split of the edges into
    // fit + 1..3 update batches, random fold points between batches, then a
    // random trailing delete set — the overlay remap/fresh/tombstone frames
    // must compose to exactly the one-shot CC labels over ALL edges with
    // deleted ids answering as self-singletons (the documented
    // retained-labels semantics; re-admission is drilled separately)
    val genCase = for {
      nEdges <- Gen.choose(1, 14)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (a, b))
      nBatches <- Gen.choose(1, 3)
      cuts <- Gen.listOfN(nBatches, Gen.choose(0, nEdges))
      foldAfter <- Gen.listOfN(nBatches, Gen.oneOf(true, false))
      dels <- Gen.someOf(1L to 12L)
    } yield (edges, cuts.sorted, foldAfter, dels.toSet)
    val p = Prop.forAll(genCase) { case (edges, cuts, foldAfter, dels) =>
      // pure-Scala union-find oracle with min labels over ALL edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p0 = parent.getOrElseUpdate(x, x)
        if (p0 == x) x else { val r = find(p0); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val m = math.min(ra, rb); parent(math.max(ra, rb)) = m }
      }
      def label(x: Long): Long = if (parent.contains(x)) find(x) else x
      val expected = (1L to 12L).map { id =>
        id -> (if (dels(id)) id else label(id))
      }.toMap
      // incremental engine run
      val idx = new ClusterIndexNode()
      val c = Ctx(spark)
      val splits = (0 +: cuts :+ edges.size).sliding(2)
        .map { w => edges.slice(w(0), w(1)) }.toSeq
      def df(es: Seq[(Long, Long)]) =
        if (es.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else es.toDF("id_a", "id_b")
      idx.fit(c, In.single("pairs" -> df(splits.head)))
      splits.tail.zipWithIndex.foreach { case (batch, i) =>
        idx.updateIndex(c, df(batch))
        if (foldAfter(i % foldAfter.size)) idx.foldOverlay()
      }
      if (dels.nonEmpty) idx.deleteFromIndex(c, dels.toSeq.toDF("doc_id"))
      val got = idx.transform(c,
          In.single("queries" -> (1L to 12L).toDF("doc_id")))("result")
        .as[(Long, Long)].collect().toMap
      idx.unpersistIndex()
      if (got != expected)
        println(s"MISMATCH edges=$edges cuts=$cuts folds=$foldAfter dels=$dels got=$got expected=$expected")
      got == expected
    }
    // each trial runs several CC passes — keep the count modest
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("merge-on-read overlays: random CDC waves with random mid-stream folds " +
    "equal a pure sequential-merge oracle (newest wins, tombstones drop)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.{AtomicPublish, MergeNode, MorCdc, SinkNode}
    // random base over a small key universe; 1..4 CDC waves of random
    // (key, value, tombstone) ops — duplicates within a wave are legal under
    // last_wins with a unique per-wave seq; random fold (compaction) points.
    // The resolved MoR view must equal folding the waves sequentially into a
    // plain map: per wave and key, an upsert outranks a tombstone, the
    // highest-seq upsert wins, a tombstone-only key is dropped.
    val genCase = for {
      baseKeys <- Gen.atLeastOne(1L to 10L)
      nWaves <- Gen.choose(1, 4)
      waves <- Gen.listOfN(nWaves, Gen.listOf(for {
        k <- Gen.choose(1L, 10L)
        del <- Gen.oneOf(true, false)
        v <- Gen.choose(0, 99)
      } yield (k, s"v$v", del)))
      folds <- Gen.listOfN(nWaves, Gen.oneOf(true, false))
    } yield (baseKeys.toSet, waves, folds)
    val p = Prop.forAll(genCase) { case (baseKeys, waves, folds) =>
      var expect: Map[Long, String] = baseKeys.map(k => k -> s"base$k").toMap
      waves.foreach { ops =>
        ops.zipWithIndex.groupBy(_._1._1).foreach { case (k, grp) =>
          val ups = grp.filter(!_._1._3)
          if (ups.nonEmpty) expect += k -> ups.maxBy(_._2)._1._2
          else expect -= k
        }
      }
      val c = Ctx(spark)
      val work = java.nio.file.Files.createTempDirectory("graft_mor_prop").toString
      val root = s"$work/ds"
      val baseDf = baseKeys.toSeq.sorted.map(k => (k, s"base$k", -1L))
        .toDF("id", "v", "seq")
      new SinkNode(root, atomicPublish = true).transform(c, In.single("df" -> baseDf))
      val merge = new MergeNode(Seq("id"), deleteCol = Some("del"),
        onDuplicate = "last_wins", orderCol = Some("seq"))
      waves.zipWithIndex.foreach { case (ops, w) =>
        if (ops.nonEmpty) {
          val batch = ops.zipWithIndex
            .map { case ((k, v, del), i) => (k, v, i.toLong, del) }
            .toDF("id", "v", "seq", "del")
          AtomicPublish.publishDelta(spark, root, w.toLong, { t =>
            MorCdc.normalizeBatch(batch, merge).write.parquet(t)
          })
        }
        if (folds(w)) MorCdc.compact(c, root, Seq("id"), w.toLong)
      }
      val got = MorCdc.read(spark, root, Seq("id"))
        .select("id", "v").as[(Long, String)].collect().toMap
      got == expect
    }
    // each trial publishes + commits several parquet overlays — keep modest
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("hamming banding equals the brute-force pair oracle on random 64-bit hash " +
    "sets at random budgets (pigeonhole recall is exact, no cap in play)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.HammingNearDupNode
    // random hash sets built from a few cluster centers plus random bit
    // flips (so near pairs actually occur), random maxHamming budgets —
    // the banded pair set must equal the O(n^2) oracle exactly
    val genCase = for {
      nCenters <- Gen.choose(1, 4)
      centers <- Gen.listOfN(nCenters, Gen.long)
      n <- Gen.choose(2, 24)
      rows <- Gen.listOfN(n, for {
        c <- Gen.choose(0, nCenters - 1)
        nFlips <- Gen.choose(0, 6)
        flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
      } yield flips.foldLeft(centers(c))((h, b) => h ^ (1L << b)))
      mh <- Gen.choose(0, 8)
    } yield (rows, mh)
    val p = Prop.forAll(genCase) { case (hashes, mh) =>
      val ids = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val expect = (for {
        a <- ids; b <- ids
        if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= mh
      } yield (a._1, b._1)).toSet
      val got = new HammingNearDupNode("id", "h", maxHamming = mh)
        .transform(Ctx(spark), In.single("df" -> ids.toDF("id", "h")))("result")
        .as[(Long, Long)].collect().toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(res.passed, res.status.toString)
  }

  test("MinHashIndexNode random-wave lifecycle on the SegStore: arbitrary " +
    "insert/delete interleavings (+ compaction folds) then rebuildIndex " +
    "equal a from-scratch fit over the surviving docs — bucket table AND " +
    "serve results, bit-for-bit") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.MinHashIndexNode
    // docs drawn from a few duplicate FAMILIES (same text => identical
    // signatures, guaranteed shared buckets) so the maxBucket cap and the
    // composite-key tombstones actually fire under random waves
    val famTexts = (0 until 4).map(f =>
      (0 until 25).map(i => s"f${f}w${i}").mkString(" "))
    val genCase = for {
      n <- Gen.choose(8, 20)
      fams <- Gen.listOfN(n, Gen.choose(0, 3))
      nWaves <- Gen.choose(2, 4)
      waves <- Gen.listOfN(nWaves, for {
        isDelete <- Gen.oneOf(false, false, true) // ~1/3 deletes
        members <- Gen.someOf(0 until n)
      } yield (isDelete, members.toList))
      cap <- Gen.oneOf(3, 5, 1000)
    } yield (fams, waves, cap)
    val p = Prop.forAll(genCase) { case (fams, waves, cap) =>
      val ctx = Ctx(spark)
      val docs = fams.zipWithIndex
        .map { case (f, i) => (i.toLong, famTexts(f)) }
      def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      // seed with the first half; replay random waves over the rest
      val (seed, pool) = docs.splitAt(docs.size / 2)
      val idx = new MinHashIndexNode(numHashes = 16, bands = 8,
        jaccardThreshold = 0.9, maxBucket = cap, compactEvery = 2)
      idx.fit(ctx, In.single("corpus" -> df(seed)))
      var live = seed.toMap
      waves.foreach { case (isDelete, members) =>
        val ids = members.map(_.toLong).filter(i =>
          if (isDelete) live.contains(i) else !live.contains(i))
        val rows = docs.filter(d => ids.contains(d._1))
        if (rows.nonEmpty) {
          if (isDelete) {
            idx.deleteFromIndex(ctx, rows.map(_._1).toDF("doc_id"))
            live --= rows.map(_._1)
          } else {
            idx.updateIndex(ctx, df(rows))
            live ++= rows
          }
        }
      }
      // rebuild == from-scratch fit over the live docs, bit-for-bit
      // (resolves every segment, composite tombstone, id tombstone, and
      // compaction fold the random sequence produced)
      idx.rebuildIndex()
      val scratch = new MinHashIndexNode(numHashes = 16, bands = 8,
        jaccardThreshold = 0.9, maxBucket = cap)
      scratch.fit(ctx, In.single("corpus" -> df(live.toSeq.sortBy(_._1))))
      def buckets(m: MinHashIndexNode): Set[(Int, Long, Long)] =
        m.model.get.buckets.as[(Int, Long, Long)].collect().toSet
      def shingleIds(m: MinHashIndexNode): Set[Long] =
        m.model.get.shingles.select("base_id").as[Long].collect().toSet
      val probe = famTexts.zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      def serve(m: MinHashIndexNode): Set[(Long, Long)] =
        m.transform(ctx, In.single("delta" -> probe))("result")
          .select("delta_id", "base_id").as[(Long, Long)].collect().toSet
      val ok = buckets(idx) == buckets(scratch) &&
        shingleIds(idx) == shingleIds(scratch) &&
        serve(idx) == serve(scratch)
      idx.unpersistIndex(); scratch.unpersistIndex()
      Prop(ok) :| s"live=${live.keys.toSeq.sorted} cap=$cap waves=$waves"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("DHashIndexNode random-wave lifecycle on the SegStore: arbitrary " +
    "insert/delete interleavings (+ compaction folds) then rebuildIndex " +
    "equal a from-scratch fit over the surviving hashes — chunk-bucket " +
    "table and Hamming-pair serve results, bit-for-bit") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.DHashIndexNode
    // hashes drawn from a few cluster centers with <= maxHamming flips so
    // chunk buckets are genuinely shared and the cap can fire
    val centers = Seq(0x1234567890abcdefL, -0x0fedcba987654321L, 0x0f0f0f0f0f0f0f0fL)
    val genCase = for {
      n <- Gen.choose(8, 18)
      rows <- Gen.listOfN(n, for {
        c <- Gen.choose(0, centers.size - 1)
        nFlips <- Gen.choose(0, 2)
        flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
      } yield flips.foldLeft(centers(c))((h, b) => h ^ (1L << b)))
      nWaves <- Gen.choose(2, 4)
      waves <- Gen.listOfN(nWaves, for {
        isDelete <- Gen.oneOf(false, false, true)
        members <- Gen.someOf(0 until n)
      } yield (isDelete, members.toList))
      cap <- Gen.oneOf(3, 5, 1000)
    } yield (rows, waves, cap)
    val p = Prop.forAll(genCase) { case (hashes, waves, cap) =>
      val ctx = Ctx(spark)
      val docs = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      def df(rows: Seq[(Long, Long)]) = rows.toDF("doc_id", "dhash")
      val (seed, _) = docs.splitAt(docs.size / 2)
      val idx = new DHashIndexNode(maxHamming = 2, maxBucket = cap,
        compactEvery = 2)
      idx.fit(ctx, In.single("corpus" -> df(seed)))
      var live = seed.toMap
      waves.foreach { case (isDelete, members) =>
        val ids = members.map(_.toLong).filter(i =>
          if (isDelete) live.contains(i) else !live.contains(i))
        val rows = docs.filter(d => ids.contains(d._1))
        if (rows.nonEmpty) {
          if (isDelete) {
            idx.deleteFromIndex(ctx, rows.map(_._1).toDF("doc_id"))
            live --= rows.map(_._1)
          } else {
            idx.updateIndex(ctx, df(rows))
            live ++= rows
          }
        }
      }
      idx.rebuildIndex()
      val scratch = new DHashIndexNode(maxHamming = 2, maxBucket = cap)
      scratch.fit(ctx, In.single("corpus" -> df(live.toSeq.sortBy(_._1))))
      def buckets(m: DHashIndexNode): Set[(Int, Long, Long, Long)] =
        m.model.get.buckets.as[(Int, Long, Long, Long)].collect().toSet
      val probe = centers.zipWithIndex
        .map { case (h, i) => (1000L + i, h) }.toDF("doc_id", "dhash")
      def serve(m: DHashIndexNode): Set[(Long, Long, Int)] =
        m.transform(ctx, In.single("delta" -> probe))("result")
          .as[(Long, Long, Int)].collect().toSet
      val ok = buckets(idx) == buckets(scratch) && serve(idx) == serve(scratch)
      idx.unpersistIndex(); scratch.unpersistIndex()
      Prop(ok) :| s"live=${live.keys.toSeq.sorted} cap=$cap waves=$waves"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("minhash band splits partition the signature exactly: grouped-band " +
    "agreement on random near-dup pairs tracks the per-row agreement of " +
    "precisely its own row slice (the Hamming chunk-wrap analogue — a " +
    "wrapped, duplicated, or dropped signature row would break the iff)") {
    val spark = SparkFixture.spark
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val alphabet = (0 until 40).map(i => s"t$i")
    val genCase = for {
      nTok <- Gen.choose(6, 30)
      toks <- Gen.listOfN(nTok, Gen.oneOf(alphabet))
      nMut <- Gen.choose(0, 6)
      muts <- Gen.listOfN(nMut, for {
        pos <- Gen.choose(0, nTok - 1)
        t <- Gen.oneOf(alphabet)
      } yield (pos, t))
      // includes non-power-of-two splits — the Hamming bug lived at
      // nChunks that do not divide the word width
      hb <- Gen.oneOf((8, 2), (8, 4), (16, 4), (32, 8), (12, 3), (20, 5))
    } yield (toks, muts, hb._1, hb._2)
    val p = Prop.forAll(genCase) { case (toks, muts, h, b) =>
      // y = x with a few token substitutions, so signatures share many
      // rows (agreement actually occurs) while differing on others
      val ys = muts.foldLeft(toks.toVector) { case (v, (pos, t)) => v.updated(pos, t) }
      val rows = Seq(("x", toks.mkString(" ")), ("y", ys.mkString(" ")))
        .toDF("id", "text")
        .selectExpr("id", "shingle_hashes(split(text, ' '), 2) as sh")
        .filter("size(sh) > 0")
        .selectExpr("id", s"minhash_bands(sh, $h, $b) as bands",
          s"minhash_bands(sh, $h, $h) as sig") // one band per row = the signature
        .collect()
        .map(r => r.getString(0) -> (r.getSeq[Any](1), r.getSeq[Any](2))).toMap
      if (rows.size < 2) Prop.passed // degenerate: a side shingled to empty
      else {
        val (bx, sx) = rows("x"); val (by, sy) = rows("y")
        val k = h / b
        Prop.all((0 until b).map { i =>
          val sliceEq = sx.slice(i * k, (i + 1) * k) == sy.slice(i * k, (i + 1) * k)
          val bandEq = bx(i) == by(i)
          Prop(bandEq == sliceEq) :|
            s"band $i of $b (rows ${i * k}..${(i + 1) * k - 1}): " +
              s"bandEq=$bandEq sliceEq=$sliceEq (h=$h)"
        }: _*)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("IVF probe-all equals the brute-force cosine top-k exactly, and " +
    "true-neighbor recall is pointwise monotone in nProbe on random corpora") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.IvfIndexNode
    val genCase = for {
      n <- Gen.choose(8, 28)
      vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 7.0)))
      nq <- Gen.choose(1, 2)
      k <- Gen.choose(1, 4)
      nc <- Gen.choose(2, 4)
      p1 <- Gen.choose(1, nc)
      p2 <- Gen.choose(1, nc)
    } yield (vecs, nq, k, nc, math.min(p1, p2), math.max(p1, p2))
    val p = Prop.forAll(genCase) { case (vecs, nq, k, nc, p1, p2) =>
      val ctx = Ctx(spark)
      val fvecs = vecs.map(_.map(_.toFloat))
      val corpus = fvecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val qvecs = fvecs.take(nq).map(_.map(x => x + 0.37f))
      val queries = qvecs.zipWithIndex.map { case (v, i) => (1000L + i, v) }
        .toDF("query_id", "embedding")
      def run(np: Int): Map[Long, Seq[Long]] = {
        val node = new IvfIndexNode(k = k, nClusters = nc, nProbe = np,
          maxLiteralCentroids = 0)
        node.fit(ctx, In.single("corpus" -> corpus))
        val out = node.transform(ctx, In.single("queries" -> queries))("result")
          .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
        node.unpersistIndex()
        out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      }
      // brute-force oracle (same tiebreak as the node: score desc, id asc);
      // queries whose top-(k+1) has any near-tie (< 1e-6 gap) are skipped —
      // sub-ulp accumulation-order differences could legitimately flip them
      def cos(a: Seq[Float], q: Seq[Float]): Double = {
        val num = a.zip(q).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nq0 = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
        if (na == 0 || nq0 == 0) 0.0 else num / (na * nq0)
      }
      val rAll = run(nc); val r1 = run(p1); val r2 = run(p2)
      Prop.all(qvecs.zipWithIndex.map { case (qv, qi) =>
        val qid = 1000L + qi
        val ranked = fvecs.zipWithIndex
          .map { case (v, i) => (i.toLong, cos(v, qv)) }
          .sortBy { case (id, s) => (-s, id) }
        val gaps = ranked.take(k + 1).map(_._2).sliding(2)
          .forall(w => w.size < 2 || w.head - w.last > 1e-6)
        if (!gaps) Prop.passed
        else {
          val truth = ranked.take(k).map(_._1)
          val tset = truth.toSet
          val exact = Prop(rAll.getOrElse(qid, Nil) == truth) :|
            s"probe-all mismatch q$qid: got ${rAll.get(qid)} want $truth"
          val mono = Prop(r1.getOrElse(qid, Nil).toSet.intersect(tset)
              .subsetOf(r2.getOrElse(qid, Nil).toSet.intersect(tset))) :|
            s"recall not monotone q$qid: nProbe=$p1 beat nProbe=$p2"
          exact && mono
        }
      }: _*)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("chained-IVM random lifecycle: arbitrary fact/dim insert/delete wave " +
    "sequences through a join→dashboard chain — with a save/load/reattach " +
    "mid-sequence — equal the recompute-from-scratch oracle exactly " +
    "(VERDICT r17 next #5: the one stored family without a random-wave " +
    "drill, and the prepared-wave machinery is where an ordering bug hides)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.{AggIndexNode, MaterializedJoinNode}
    val nKeys = 6
    // wave op encoding: 0 = fact insert, 1 = fact delete, 2 = dim insert,
    // 3 = dim delete; members index into the pools (validity-filtered at
    // replay so sequences stay arbitrary)
    val genCase = for {
      nFacts <- Gen.choose(20, 40)
      joinType <- Gen.oneOf("inner", "left_outer")
      nWaves <- Gen.choose(3, 6)
      waves <- Gen.listOfN(nWaves, for {
        op <- Gen.choose(0, 3)
        members <- Gen.someOf(0 until 40)
      } yield (op, members.toList))
      saveAt <- Gen.choose(0, nWaves - 1)
    } yield (nFacts, joinType, waves, saveAt)
    val p = Prop.forAll(genCase) { case (nFacts, joinType, waves, saveAt) =>
      val ctx = Ctx(spark)
      val factPool = (1 to nFacts).map(i => (i.toLong, (i % nKeys).toLong, i.toLong))
      val dimPool = (0 until nKeys).map(k => (k.toLong, s"g${k % 3}"))
      def fdf(rows: Seq[(Long, Long, Long)]) = rows.toDF("oid", "cust", "amt")
      def ddf(rows: Seq[(Long, String)]) = rows.toDF("cid", "seg")
      var liveF = factPool.take(nFacts / 2).map(r => r._1 -> r).toMap
      var liveD = dimPool.take(nKeys / 2).map(r => r._1 -> r).toMap
      var mj = new MaterializedJoinNode(leftOn = Seq("cust"),
        rightOn = Seq("cid"), leftId = "oid", rightId = "cid",
        joinType = joinType)
      var agg = new AggIndexNode(groupCols = Seq("seg"), sumCols = Seq("amt"),
        idCol = MaterializedJoinNode.ViewIdCol)
      mj.fit(ctx, In.single("left" -> fdf(liveF.values.toSeq.sortBy(_._1)),
        "right" -> ddf(liveD.values.toSeq.sortBy(_._1))))
      mj.chainAggregate(ctx, agg)
      waves.zipWithIndex.foreach { case ((op, members), wi) =>
        op match {
          case 0 =>
            val rows = members.map(_.toLong + 1)
              .filter(i => i <= nFacts && !liveF.contains(i))
              .map(i => factPool(i.toInt - 1))
            if (rows.nonEmpty) {
              mj.updateIndex(ctx, fdf(rows)); liveF ++= rows.map(r => r._1 -> r)
            }
          case 1 =>
            val ids = members.map(_.toLong + 1).filter(liveF.contains)
            if (ids.nonEmpty) {
              mj.deleteFromIndex(ctx, ids.toDF("oid")); liveF --= ids
            }
          case 2 =>
            val rows = members.map(_.toLong % nKeys).distinct
              .filterNot(liveD.contains).map(k => dimPool(k.toInt))
            if (rows.nonEmpty) {
              mj.updateRight(ctx, ddf(rows)); liveD ++= rows.map(r => r._1 -> r)
            }
          case 3 =>
            val ids = members.map(_.toLong % nKeys).distinct.filter(liveD.contains)
            if (ids.nonEmpty) {
              mj.deleteFromRight(ctx, ids.toDF("cid")); liveD --= ids
            }
        }
        if (wi == saveAt) {
          // restart drill: save both nodes after the same wave, load into
          // FRESH nodes, re-attach without refit, continue the sequence
          val root = java.nio.file.Files
            .createTempDirectory("graft_chainprop_").toString
          mj.saveFitted(s"$root/mj"); agg.saveFitted(s"$root/agg")
          mj.unpersistIndex(); agg.unpersistIndex()
          val mj2 = new MaterializedJoinNode(leftOn = Seq("cust"),
            rightOn = Seq("cid"), leftId = "oid", rightId = "cid",
            joinType = joinType)
          val agg2 = new AggIndexNode(groupCols = Seq("seg"),
            sumCols = Seq("amt"), idCol = MaterializedJoinNode.ViewIdCol)
          mj2.loadFitted(s"$root/mj"); agg2.loadFitted(s"$root/agg")
          mj2.reattachAggregate(ctx, agg2)
          mj = mj2; agg = agg2
        }
      }
      // recompute-from-scratch oracle, in plain Scala (exact longs)
      val expect: Set[(Option[String], Long, Long)] = {
        val matched = liveF.values.toSeq.flatMap { case (_, cust, amt) =>
          liveD.get(cust).map(d => (Option(d._2), amt))
        }
        val dangling =
          if (joinType == "inner") Nil
          else liveF.values.toSeq.filterNot(f => liveD.contains(f._2))
            .map(f => (Option.empty[String], f._3))
        (matched ++ dangling).groupBy(_._1)
          .map { case (g, rows) => (g, rows.size.toLong, rows.map(_._2).sum) }
          .toSet
      }
      val probe = dimPool.map(d => Option(d._2)).distinct.toDF("seg")
        .unionByName(Seq(Option.empty[String]).toDF("seg"))
      val got = agg.transform(ctx, In.single("probe" -> probe))("result")
        .select("seg", "n_rows", "sum_amt")
        .as[(Option[String], Long, Long)].collect().toSet
      mj.unpersistIndex(); agg.unpersistIndex()
      Prop(got == expect) :|
        s"jt=$joinType waves=$waves saveAt=$saveAt got=$got want=$expect"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  test("three-table star random lifecycle: arbitrary wave sequences on ALL " +
    "THREE feeds (facts, dim1, dim2) through join→join→dashboard equal the " +
    "recompute-from-scratch oracle exactly — the transitively-propagated " +
    "prepared-wave path the r18 merge rewrites touched deepest") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.nodes.{AggIndexNode, MaterializedJoinNode}
    val nKeys = 6; val nNats = 4
    // ops: 0 fact-ins, 1 fact-del, 2 dim-ins, 3 dim-del, 4 nat-ins, 5 nat-del
    val genCase = for {
      nFacts <- Gen.choose(18, 30)
      joinType <- Gen.oneOf("inner", "left_outer")
      nWaves <- Gen.choose(3, 5)
      waves <- Gen.listOfN(nWaves, for {
        op <- Gen.choose(0, 5)
        members <- Gen.someOf(0 until 30)
      } yield (op, members.toList))
    } yield (nFacts, joinType, waves)
    val p = Prop.forAll(genCase) { case (nFacts, joinType, waves) =>
      val ctx = Ctx(spark)
      val factPool = (1 to nFacts).map(i => (i.toLong, (i % nKeys).toLong, i.toLong))
      val dimPool = (0 until nKeys).map(k => (k.toLong, (k % nNats).toLong))
      val natPool = (0 until nNats).map(n => (n.toLong, s"nat$n"))
      def fdf(rows: Seq[(Long, Long, Long)]) = rows.toDF("oid", "cust", "amt")
      def ddf(rows: Seq[(Long, Long)]) = rows.toDF("cid", "nat")
      def ndf(rows: Seq[(Long, String)]) = rows.toDF("nid", "nname")
      var liveF = factPool.take(nFacts / 2).map(r => r._1 -> r).toMap
      var liveD = dimPool.take(nKeys / 2).map(r => r._1 -> r).toMap
      var liveN = natPool.take(nNats / 2).map(r => r._1 -> r).toMap
      val mj1 = new MaterializedJoinNode(leftOn = Seq("cust"),
        rightOn = Seq("cid"), leftId = "oid", rightId = "cid",
        joinType = joinType)
      mj1.fit(ctx, In.single("left" -> fdf(liveF.values.toSeq.sortBy(_._1)),
        "right" -> ddf(liveD.values.toSeq.sortBy(_._1))))
      val mj2 = new MaterializedJoinNode(leftOn = Seq("nat"),
        rightOn = Seq("nid"), leftId = "v1_id", rightId = "nid",
        joinType = joinType)
      mj1.chainJoin(ctx, mj2, ndf(liveN.values.toSeq.sortBy(_._1)))
      val agg = new AggIndexNode(groupCols = Seq("nname"), sumCols = Seq("amt"),
        idCol = MaterializedJoinNode.ViewIdCol)
      mj2.chainAggregate(ctx, agg)
      waves.foreach { case (op, members) =>
        op match {
          case 0 =>
            val rows = members.map(_.toLong + 1)
              .filter(i => i <= nFacts && !liveF.contains(i))
              .map(i => factPool(i.toInt - 1))
            if (rows.nonEmpty) {
              mj1.updateIndex(ctx, fdf(rows)); liveF ++= rows.map(r => r._1 -> r)
            }
          case 1 =>
            val ids = members.map(_.toLong + 1).filter(liveF.contains)
            if (ids.nonEmpty) {
              mj1.deleteFromIndex(ctx, ids.toDF("oid")); liveF --= ids
            }
          case 2 =>
            val rows = members.map(_.toLong % nKeys).distinct
              .filterNot(liveD.contains).map(k => dimPool(k.toInt))
            if (rows.nonEmpty) {
              mj1.updateRight(ctx, ddf(rows)); liveD ++= rows.map(r => r._1 -> r)
            }
          case 3 =>
            val ids = members.map(_.toLong % nKeys).distinct.filter(liveD.contains)
            if (ids.nonEmpty) {
              mj1.deleteFromRight(ctx, ids.toDF("cid")); liveD --= ids
            }
          case 4 =>
            val rows = members.map(_.toLong % nNats).distinct
              .filterNot(liveN.contains).map(n => natPool(n.toInt))
            if (rows.nonEmpty) {
              mj2.updateRight(ctx, ndf(rows)); liveN ++= rows.map(r => r._1 -> r)
            }
          case 5 =>
            val ids = members.map(_.toLong % nNats).distinct.filter(liveN.contains)
            if (ids.nonEmpty) {
              mj2.deleteFromRight(ctx, ids.toDF("nid")); liveN --= ids
            }
        }
      }
      // recompute-from-scratch oracle: two-join chain in plain Scala.
      // left_outer composes like SQL's LEFT JOIN chain — a dim1 dangler
      // carries NULL nat, which null-joins into mj2 and lands in ITS
      // NULL group; inner keeps only fully-matched rows.
      val expect: Set[(Option[String], Long, Long)] = {
        val rows = liveF.values.toSeq.flatMap { case (_, cust, amt) =>
          val nm = liveD.get(cust).flatMap(d => liveN.get(d._2)).map(_._2)
          if (joinType == "inner") {
            if (liveD.contains(cust) && nm.isDefined) Seq((nm, amt)) else Nil
          } else Seq((nm, amt))
        }
        rows.groupBy(_._1)
          .map { case (g, rs) => (g, rs.size.toLong, rs.map(_._2).sum) }
          .toSet
      }
      val probe = natPool.map(n => Option(n._2)).toDF("nname")
        .unionByName(Seq(Option.empty[String]).toDF("nname"))
      val got = agg.transform(ctx, In.single("probe" -> probe))("result")
        .select("nname", "n_rows", "sum_amt")
        .as[(Option[String], Long, Long)].collect().toSet
      mj1.unpersistIndex(); mj2.unpersistIndex(); agg.unpersistIndex()
      Prop(got == expect) :|
        s"jt=$joinType waves=$waves got=$got want=$expect"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(res.passed, res.status.toString)
  }

}
