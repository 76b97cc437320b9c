package graft
import org.apache.spark.sql.SparkSession

/** Scratch: time Catalyst analysis+optimization+physical planning of a
  * query (no execution), isolating driver-side plan cost from cluster
  * work. Not part of the surface. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // one full run so session caches exist as they would mid-bench
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      CacheScope.drain()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+opt+planning
        val t2 = System.nanoTime()
        println(f"$name%s build=${(t1 - t0) / 1e9}%.2fs plan=${(t2 - t1) / 1e9}%.2fs")
      }
      CacheScope.drain()
    }
    spark.stop()
  }
}
