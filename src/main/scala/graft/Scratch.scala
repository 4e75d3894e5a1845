package graft
import graft.dag._
import graft.nodes._
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      val t0 = System.nanoTime(); val n = df.count()
      println(f"[scratch] $label%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
      spark.catalog.clearCache()
    }
    def bmDf = {
      val d = new Dag()
      val docs = d.add(SourceNode.table(dir, "documents"))
      val qs = d.add(ProjectNode("doc_id as query_id", "text").named("qd"))
      val fq = d.add(FilterNode("doc_id % 97 = 0").named("fq"))
      docs >> fq; fq >> qs
      val bm = d.add(new Bm25TopKNode(k = 5, maxDfFrac = 0.79))
      docs >> bm("corpus"); qs >> bm("queries")
      bm >> d.output("result")
      d.transform(Ctx(spark)).outputs("result")
    }
    run("bm25 warm0")(bmDf)
    run("bm25 warm1")(bmDf)
    bmDf.explain("formatted")
    spark.stop()
  }
}
