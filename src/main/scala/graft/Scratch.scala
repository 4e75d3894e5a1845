package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: Spark job count for one query — a noise-free A/B of
  * whether a query's driver-job structure changed between trees. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q213_published_view_feed"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecFunctions.register(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val n = graft.queries.Queries.all(name)(spark, dir).count()
    Thread.sleep(500)
    println(s"[scratch] $name rows=$n jobs=${jobs.get}")
    spark.stop()
  }
}
