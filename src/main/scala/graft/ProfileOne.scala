package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness (guide §1): per-query breakdown of wall time vs
  * cluster work. For each named query: runs it warm, then once timed
  * with a listener counting jobs, stages, tasks, summed task time and
  * summed shuffle bytes. wall − Σtask/cores ≈ driver/planning/
  * scheduling overhead at bench scale. Not part of the query surface.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0); val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0); val taskMs = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L); val shufWrite = new AtomicLong(0L)
    val verbose = sys.env.get("PROFILE_JOBS").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        if (verbose && t0 != 0L)
          println(f"  job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (te.taskMetrics != null) {
          taskMs.addAndGet(te.taskMetrics.executorRunTime)
          shufRead.addAndGet(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      CacheScope.drain()
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      shufRead.set(0L); shufWrite.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"$name%s wall=$wall%.2fs jobs=${jobs.get}%d stages=${stages.get}%d " +
        f"tasks=${tasks.get}%d taskTime=${taskMs.get / 1000.0}%.2fs " +
        f"shufR=${shufRead.get / 1048576.0}%.1fMB shufW=${shufWrite.get / 1048576.0}%.1fMB")
      CacheScope.drain()
    }
    spark.stop()
  }
}
