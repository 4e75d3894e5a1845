package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries("q124_flagship_pipeline")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      val n = df.collect().length
      val t2 = System.nanoTime()
      println(f"[scratch] run $i: compose ${(t1 - t0) / 1e9}%.2f s  exec ${(t2 - t1) / 1e9}%.2f s  ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
