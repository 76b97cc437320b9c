package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // split-size knob for deploy-time tuning. A/B at sf0.1 showed small
    // splits (2m) LOSE to the 128m default here — per-task overhead
    // outweighs scan parallelism on ~10MB files; the shuffles already
    // spread work across cores after the first exchange.
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "128m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: executor spin-up, parquet footers, codegen JIT
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
               else graft.sources.Tables.load(spark, sfDir, t)
      df.write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full computation of every output column (count()
      // would let Catalyst prune projections and under-report)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
