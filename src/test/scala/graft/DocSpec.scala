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
}
