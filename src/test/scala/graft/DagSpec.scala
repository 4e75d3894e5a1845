package graft

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DAG builder + execution semantics — ScalaTest ports of the reference's
  * tests/test_graph.py and tests/test_mldag.py behaviors (SURVEY.md §5).
  */
class DagSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def df1: DataFrame = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
  private def ctx = Ctx(spark)

  // ---------------- wiring & naming ----------------

  test("auto-naming dedups with a counter (reference add_vertex override)") {
    val d = new Dag()
    val a = d.add(new IdentityNode)
    val b = d.add(new IdentityNode)
    val c = d.add(new IdentityNode)
    assert(Seq(a.name, b.name, c.name) == Seq("identity_node", "identity_node1", "identity_node2"))
  }

  test("explicit names are kept; renaming after attach fails") {
    val d = new Dag()
    val n = d.add(new IdentityNode().named("x"))
    assert(n.name == "x")
    assertThrows[GraftException](n.named("y"))
  }

  test("explicit .named collision throws instead of silently renaming") {
    val d = new Dag()
    d.add(new IdentityNode().named("model"))
    // a silent counter-rename would make TransformNode("model") / dag.node
    // resolve to the WRONG vertex; only auto names dedup
    val e = intercept[GraftException](d.add(new IdentityNode().named("model")))
    assert(e.getMessage.contains("explicit node name"))
    val auto1 = d.add(new IdentityNode)
    val auto2 = d.add(new IdentityNode)
    assert(auto1.name != auto2.name) // auto names still counter-dedup
  }

  test("nested dag fan-out persists are released by the outer run's unpersist") {
    val inner = new Dag("innerp")
    val src = inner.add(FnNode.map1("srcn")(identity))
    inner.input("x") >> src
    val c1 = inner.add(FnNode.map1("c1")(df => df.select("id")))
    val c2 = inner.add(FnNode.map1("c2")(df => df.select("v")))
    src >> c1; src >> c2 // diamond inside the nested dag -> fan-out persist
    c1 >> inner.output("o1"); c2 >> inner.output("o2")
    val outer = new Dag("outerp")
    val sub = outer.add(inner.asNode)
    outer >> sub
    sub("o1") >> outer.output("r1"); sub("o2") >> outer.output("r2")
    val run = outer.transform(ctx, Map("x" -> df1))
    run("r1").count(); run("r2").count()
    // the inner DagRun is discarded by SubDagNode; the OUTER run must still
    // know about (and release) the inner fan-out persist via the shared Ctx.
    // Deterministic check (global RDD counts race the async ContextCleaner):
    // the outer run must OWN the inner persist and unpersist must drop its
    // storage level back to NONE.
    assert(run.persisted.nonEmpty, "outer run must own the inner fan-out persist")
    assert(run.persisted.forall(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE))
    run.unpersist()
    assert(run.persisted.forall(_.storageLevel == org.apache.spark.storage.StorageLevel.NONE),
      "outer unpersist must release inner persists")
  }

  test("a Ctx reused across transform runs hands each DagRun only its own persists") {
    val d = new Dag()
    val src = d.add(FnNode.map1("s")(identity))
    d.input("x") >> src
    val c1 = d.add(FnNode.map1("c1")(df => df.select("id")))
    val c2 = d.add(FnNode.map1("c2")(df => df.select("v")))
    src >> c1; src >> c2 // diamond -> one fan-out persist per run
    c1 >> d.output("o1"); c2 >> d.output("o2")
    val shared = Ctx(spark)
    val run1 = d.transform(shared, Map("x" -> df1))
    val run2 = d.transform(shared, Map("x" -> df1))
    // without per-run draining, run2 would carry run1's persists too and
    // run2.unpersist() would evict caches run1's consumers still need
    assert(run1.persisted.size == 1 && run2.persisted.size == 1)
    assert(!run2.persisted.exists(p => run1.persisted.exists(_ eq p)))
    run1.unpersist(); run2.unpersist()
  }

  test("cross-dag attach rejected (reference graph.py:80-127)") {
    val d1 = new Dag("d1"); val d2 = new Dag("d2")
    val n = d1.add(new IdentityNode)
    assertThrows[GraftException](d2.add(n))
  }

  test("cross-dag connect rejected") {
    val d1 = new Dag("d1"); val d2 = new Dag("d2")
    val a = d1.add(new IdentityNode)
    val b = d2.add(new IdentityNode)
    assertThrows[GraftException](a >> b)
  }

  test("slot inference: single output to single input; explicit slots validated") {
    val d = new Dag()
    val a = d.add(new IdentityNode)
    val b = d.add(new IdentityNode)
    a >> b
    assertThrows[SlotException](a("nope") >> b)
    assertThrows[SlotException](a >> b("nope"))
  }

  test("non-variadic input takes exactly one writer") {
    val d = new Dag()
    val a = d.add(new IdentityNode)
    val b = d.add(new IdentityNode)
    val c = d.add(new IdentityNode)
    a >> c
    assertThrows[SlotException](b >> c)
  }

  test("variadic port accumulates many writers (reference *args fan-in)") {
    val d = new Dag()
    val s1 = d.add(FnNode.map1("s1")(_ => df1))
    val s2 = d.add(FnNode.map1("s2")(_ => df1))
    d.setInput(s1, Some("in"), Some("df")); d.setInput(s2, Some("in"), Some("df"))
    val u = d.add(FnNode.mapMany("u")(dfs => dfs.reduce(_ union _)))
    s1 >> u("dfs"); s2 >> u("dfs")
    u >> d.output("result")
    val out = d.transform(ctx, Map("in" -> df1))("result")
    assert(out.count() == 6)
  }

  test("keyed variadic port delivers upstream-name -> payload map (**kwargs fan-in)") {
    val d = new Dag()
    val s1 = d.add(FnNode.map1("alpha")(_ => df1))
    val s2 = d.add(FnNode.map1("beta")(_ => df1.withColumn("id", col("id") + 10)))
    d.setInput(s1, Some("in"), Some("df")); d.setInput(s2, Some("in"), Some("df"))
    var seenKeys: Seq[String] = Nil
    val merge = d.add(FnNode.mapKeyed("merge") { dfs =>
      seenKeys = dfs.keys.toSeq
      dfs.map { case (k, df) => df.withColumn("src", lit(k)) }
        .reduce(_ unionByName _)
    })
    s1 >> merge("dfs"); s2 >> merge("dfs")
    merge >> d.output("result")
    val out = d.transform(ctx, Map("in" -> df1))("result")
    assert(seenKeys == Seq("alpha", "beta")) // insertion order, named by upstream
    assert(out.count() == 6)
    assert(out.select("src").distinct().as[String].collect().toSet == Set("alpha", "beta"))
  }

  test("keyed variadic port rejects duplicate keys (reference duplicate-kwarg error)") {
    val d = new Dag()
    val s1 = d.add(FnNode.map1("alpha")(_ => df1))
    d.setInput(s1, Some("in"), Some("df"))
    val merge = d.add(FnNode.mapKeyed("merge")(dfs => dfs.values.reduce(_ union _)))
    s1 >> merge("dfs"); s1 >> merge("dfs") // same upstream twice -> duplicate key
    merge >> d.output("result")
    val e = intercept[GraftException](d.transform(ctx, Map("in" -> df1)))
    assert(e.getMessage.contains("duplicate keyed payload 'alpha'"))
  }

  test("keyed origins survive the sub-dag boundary (tags = outer node names)") {
    val inner = new Dag("merger")
    val u = inner.add(new nodes.TaggedUnionNode())
    inner.input("feeds") >> u
    u >> inner.output("merged")
    val outer = new Dag()
    val a = outer.add(FnNode.map1("alpha")(_ => df1))
    val b = outer.add(FnNode.map1("beta")(_ => df1))
    outer.setInput(a, Some("in"), Some("df")); outer.setInput(b, Some("in"), Some("df"))
    val sub = outer.add(inner.asNode)
    a >> sub("feeds"); b >> sub("feeds")
    sub >> outer.output("result")
    assert(sub.inputs.exists(p => p.name == "feeds" && p.keyed)) // keyed flag propagates
    val out = outer.transform(ctx, Map("in" -> df1))("result")
    assert(out.select("source").distinct().as[String].collect().toSet == Set("alpha", "beta"))
  }

  test("TaggedUnionNode tags rows with their source node name") {
    val d = new Dag()
    val a = d.add(FnNode.map1("big")(_ => df1.filter(col("id") >= 2)))
    val b = d.add(FnNode.map1("small")(_ => df1.filter(col("id") < 2)))
    d.setInput(a, Some("in"), Some("df")); d.setInput(b, Some("in"), Some("df"))
    val u = d.add(new nodes.TaggedUnionNode())
    a >> u("dfs"); b >> u("dfs")
    u >> d.output("result")
    val out = d.transform(ctx, Map("in" -> df1))("result")
    assert(out.groupBy("source").count().as[(String, Long)].collect().toMap ==
      Map("big" -> 2L, "small" -> 1L))
  }

  test("describe lists inputs with downstream nodes, outputs, and the roster") {
    val d = new Dag("demo")
    val f = d.add(FnNode.map1("foo")(df => df))
    d.input("i_x") >> f
    f >> d.output("out_y")
    val s = d.describe
    assert(s.contains("dag 'demo'"))
    assert(s.contains("i_x : downstream node - foo (port df)"))
    assert(s.contains("out_y : output of foo (port result)"))
    assert(s.contains("foo (FnNode): [df] -> [result]"))
  }

  // ---------------- structure ----------------

  test("topo order respects data edges and order-only deps; cycle throws") {
    val d = new Dag()
    val a = d.add(new IdentityNode().named("a"))
    val b = d.add(new IdentityNode().named("b"))
    val c = d.add(new IdentityNode().named("c"))
    a >> b
    c.after(b) // order-only
    val order = d.topoOrder.map(_.name)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))

    val d2 = new Dag()
    val x = d2.add(FnNode.map2("x")((l, _) => l))
    val y = d2.add(FnNode.map2("y")((l, _) => l))
    x >> y("left"); y >> x("left")
    assertThrows[CycleException](d2.topoOrder)
  }

  test("roots and leaves (reference test_graph root/leaf identification)") {
    val d = new Dag()
    val a = d.add(new IdentityNode().named("a"))
    val b = d.add(new IdentityNode().named("b"))
    val c = d.add(new IdentityNode().named("c"))
    a >> b; b >> c
    assert(d.roots.map(_.name) == Seq("a"))
    assert(d.leaves.map(_.name) == Seq("c"))
  }

  test("graph surgery: removeNode drops touching edges/binds; disconnect") {
    val d = new Dag()
    val a = d.add(new IdentityNode().named("a"))
    val b = d.add(new IdentityNode().named("b"))
    val c = d.add(new IdentityNode().named("c"))
    a >> b; b >> c
    d.removeNode(b)
    assert(d.nodeNames == Seq("a", "c"))
    assert(d.roots.map(_.name).toSet == Set("a", "c"))
    val d2 = new Dag()
    val x = d2.add(new IdentityNode().named("x"))
    val y = d2.add(new IdentityNode().named("y"))
    x >> y
    d2.disconnect(x, y)
    assertThrows[GraftException](d2.disconnect(x, y))
  }

  test("validate() flags unbound required inputs") {
    val d = new Dag()
    val n = d.add(new IdentityNode)
    n >> d.output("o")
    assertThrows[SlotException](d.validate())
  }

  // ---------------- dag-level inputs/outputs & binding ----------------

  test("dag input binds to run-time argument; unknown/missing bindings error") {
    val d = new Dag()
    val n = d.add(FnNode.map1("double")(df => df.withColumn("id", col("id") * 2)))
    d.input("x") >> n
    n >> d.output("result")
    val out = d.transform(ctx, Map("x" -> df1))("result")
    assert(out.agg(sum("id")).as[Long].head() == 12)
    assertThrows[BindingException](d.transform(ctx, Map.empty))
    assertThrows[BindingException](d.transform(ctx, Map("x" -> df1, "zzz" -> df1)))
  }

  test("dag input default used when binding absent; explicit binding wins " +
    "(reference MLDagInput(default=...), tests/test_mldag.py:4-20)") {
    val d = new Dag()
    val n = d.add(FnNode.map1("double")(df => df.withColumn("id", col("id") * 2)))
    d.input("x").default(c => { import c.spark.implicits._; Seq(10).toDF("id") }) >> n
    n >> d.output("result")
    // no binding: the default payload flows (10 * 2)
    assert(d.transform(ctx)("result").agg(sum("id")).as[Long].head() == 20)
    // explicit binding overrides the default
    assert(d.transform(ctx, Map("x" -> df1))("result")
      .agg(sum("id")).as[Long].head() == 12)
    // inputs WITHOUT defaults still demand a binding
    val d2 = new Dag()
    val m = d2.add(FnNode.map1("idn")(identity))
    d2.input("y") >> m
    m >> d2.output("result")
    assertThrows[BindingException](d2.transform(ctx))
  }

  test("dag >> node exposes unbound inputs; name collision gets _node suffix " +
    "(reference 'arg1_test_foo1', tests/test_mldag.py:44)") {
    val d = new Dag()
    val a = d.add(FnNode.map1("foo")(identity))
    val b = d.add(FnNode.map1("bar")(identity))
    d >> a
    d >> b // same port name 'df' → suffixed
    assert(d.inputNames == Seq("df", "df_bar"))
  }

  test("duplicate dag output name rejected; output slot inference") {
    val d = new Dag()
    val n = d.add(new IdentityNode)
    d.setOutput("o", n)
    assertThrows[SlotException](d.setOutput("o", n))
  }

  test("run exposes outputs and nodeOutputs (reference MLDagRun)") {
    val d = new Dag()
    val n = d.add(FnNode.map1("f")(df => df.filter(col("id") > 1)))
    d.input("x") >> n
    n >> d.output("result")
    val run = d.transform(ctx, Map("x" -> df1))
    assert(run("result").count() == 2)
    assert(run.nodeOutputs("f")("result").count() == 2)
    assertThrows[GraftException](run("nope"))
  }

  // ---------------- fit/transform split ----------------

  /** Estimator that records the fit count and subtracts the fitted mean. */
  private class MeanCenterNode extends EstimatorNode {
    type Model = Double
    var fitCount = 0
    val inputs = Seq(Port("df")); val outputs = Seq(Port("result"))
    def fitModel(ctx: Ctx, in: In): Double = {
      fitCount += 1
      in("df").agg(avg("id")).collect()(0).getDouble(0)
    }
    def applyModel(m: Double, ctx: Ctx, in: In): Map[String, DataFrame] =
      Map("result" -> in("df").withColumn("centered", col("id") - lit(m)))
  }

  test("estimator: transform before fit errors; fit-then-transform works") {
    val d = new Dag()
    val est = d.add(new MeanCenterNode)
    d.input("x") >> est
    est >> d.output("result")
    assertThrows[GraftException](d.transform(ctx, Map("x" -> df1)))
    d.fit(ctx, Map("x" -> df1))
    assert(est.fitCount == 1)
    val out = d.transform(ctx, Map("x" -> df1))("result")
    assert(out.agg(sum("centered")).as[Double].head() == 0.0)
  }

  test("fit does not transform leaf nodes; transform does (mldag.py:380)") {
    var leafTransformed = 0
    val d = new Dag()
    val n = d.add(new FnNode(Seq(Port("df")), Seq(Port("result")),
      (_, in) => { leafTransformed += 1; Map("result" -> in("df")) }, "leaf"))
    d.input("x") >> n
    d.fit(ctx, Map("x" -> df1))
    assert(leafTransformed == 0)
    d.transform(ctx, Map("x" -> df1))
    assert(leafTransformed == 1)
  }

  test("TransformNode shares the fitted parent and schedules after it") {
    val d = new Dag()
    val est = d.add(new MeanCenterNode().named("center"))
    val reuse = d.add(new TransformNode("center").named("center_again"))
    d.input("x") >> est
    d.input("y") >> reuse("df")
    est >> d.output("o1"); reuse("result") >> d.output("o2")
    val order = d.topoOrder.map(_.name)
    assert(order.indexOf("center") < order.indexOf("center_again"))
    val big = Seq(10, 20, 30).toDF("id")
    d.fit(ctx, Map("x" -> df1, "y" -> big))
    assert(est.fitCount == 1) // reuse site does NOT refit
    val run = d.transform(ctx, Map("x" -> df1, "y" -> big))
    // both sites subtract the mean fitted on x (=2.0)
    assert(run("o2").agg(sum("centered")).as[Double].head() == 54.0)
  }

  // ---------------- nesting ----------------

  test("nested dag as node: inner inputs/outputs become ports; results flow") {
    val inner = new Dag("inner")
    val f = inner.add(FnNode.map1("inc")(df => df.withColumn("id", col("id") + 1)))
    inner.input("df") >> f
    f >> inner.output("result")
    val outer = new Dag("outer")
    val sub = outer.add(inner.asNode)
    val g = outer.add(FnNode.map1("dbl")(df => df.withColumn("id", col("id") * 2)))
    outer.input("x") >> sub("df")
    sub("result") >> g
    g >> outer.output("result")
    val out = outer.transform(ctx, Map("x" -> df1))("result")
    assert(out.agg(sum("id")).as[Long].head() == 18) // ((1..3)+1)*2
  }

  // ---------------- diamond fan-out persist ----------------

  test("diamond fan-out: shared subtree persisted once, unpersist releases") {
    val d = new Dag()
    var computed = 0
    val src = d.add(new FnNode(Nil, Seq(Port("result")),
      (_, _) => { computed += 1; Map("result" -> df1) }, "src"))
    val l = d.add(FnNode.map1("l")(df => df.filter(col("id") > 1)))
    val r = d.add(FnNode.map1("r")(df => df.filter(col("id") < 3)))
    src >> l; src >> r
    l >> d.output("lo"); r >> d.output("ro")
    val run = d.transform(ctx)
    assert(run.persisted.size == 1)
    assert(run.persisted.head.storageLevel.useMemory)
    assert(run("lo").count() == 2 && run("ro").count() == 2)
    run.unpersist()
    assert(!run.persisted.head.storageLevel.useMemory)
  }

  test("SparkMetricsListener records action metrics via QueryExecutionListener") {
    val m = new SparkMetricsListener().attach(spark)
    try {
      val d = new Dag()
      val n = d.add(FnNode.map1("f")(df => df.filter(col("id") > 1)))
      d.input("x") >> n
      n >> d.output("result")
      d.transform(ctx, Map("x" -> df1))("result").count()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 5000
      while (m.actions.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!m.actions.isEmpty)
      assert(m.actions.peek().funcName == "count")
    } finally m.detach(spark)
  }

  test("listener hooks fire around fit and transform (reference mixins)") {
    val d = new Dag()
    val t = new TimingListener
    d.addListener(t)
    val n = d.add(FnNode.map1("f")(identity))
    d.input("x") >> n
    n >> d.output("result")
    d.fitTransform(ctx, Map("x" -> df1))
    assert(t.transformNanos.contains("dag.f"))
  }

  test("outer listeners propagate into nested dags, two levels deep") {
    // reference BANS mixins on nested dags (mldagbase.py:68-71); graft
    // propagates instead: an outer TimingListener must time inner nodes
    val innermost = new Dag("deep")
    val leaf = innermost.add(FnNode.map1("leaf")(identity))
    innermost >> leaf; leaf >> innermost.output("out")
    val mid = new Dag("mid")
    val sub2 = mid.add(innermost.asNode)
    val m = mid.add(FnNode.map1("mid_fn")(identity))
    mid >> sub2; sub2 >> m; m >> mid.output("out")
    val outer = new Dag("outer")
    val t = new TimingListener
    outer.addListener(t)
    val sub1 = outer.add(mid.asNode)
    outer >> sub1; sub1 >> outer.output("result")
    outer.transform(ctx, Map(outer.inputNames.head -> df1))
    assert(t.transformNanos.contains("deep.leaf"), s"saw: ${t.transformNanos.keys}")
    assert(t.transformNanos.contains("mid.mid_fn"))
    // reentrancy: the subdag's before/after pair ENCLOSES its inner nodes'
    // pairs, so its recorded time must be at least each inner node's (a
    // single shared start slot would make it report the LAST inner node's
    // duration instead)
    val subDagTime = t.transformNanos(s"outer.${sub1.name}")
    assert(subDagTime >= t.transformNanos("deep.leaf") && subDagTime >= t.transformNanos("mid.mid_fn"),
      s"subdag=$subDagTime leaf=${t.transformNanos("deep.leaf")} mid=${t.transformNanos("mid.mid_fn")}")
    // and inner dag's own listeners still fire for inner nodes only
    val t2 = new TimingListener
    val innermost2 = new Dag("deep2")
    innermost2.addListener(t2)
    val leaf2 = innermost2.add(FnNode.map1("leaf2")(identity))
    innermost2 >> leaf2; leaf2 >> innermost2.output("out")
    val outer2 = new Dag("outer2")
    val s2 = outer2.add(innermost2.asNode)
    val top = outer2.add(FnNode.map1("top_fn")(identity))
    outer2 >> s2; s2 >> top; top >> outer2.output("result")
    outer2.transform(ctx, Map(outer2.inputNames.head -> df1))
    assert(t2.transformNanos.contains("deep2.leaf2"))
    assert(!t2.transformNanos.exists(_._1.endsWith("top_fn"))) // inner listener stays inner
  }
}
