package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Builder-side 10× scale audit (round-8 verdict task #1): times each
  * named query at a base fixture dir and at a scaled synthetic dir
  * (see [[SynthScale]]) in ONE JVM, and prints the growth ratio. A
  * query whose runtime grows by much more than the data factor
  * (allowing log factors — the flag threshold is 1.5 × factor) has a
  * superlinear plan that 100 TB would kill.
  *
  * Each measured run is warm (one untimed run first) and guarded by a
  * cancellable per-query time budget, so one runaway plan cannot hang
  * the whole audit — a cancelled query prints `TIMEOUT` and counts as
  * flagged.
  *
  * Usage: SPARK_GRAFT_AUDIT_BUDGET=<sec> runMain graft.tools.ScaleAudit
  *          <baseDir> <scaledDir> <factor> <query...>
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val (baseDir, scaledDir, factor) = (args(0), args(1), args(2).toDouble)
    val names = args.drop(3)
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_AUDIT_BUDGET", "150").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Warm + min-of-2 timed runs in a budget-guarded thread; None on
      * timeout or failure. */
    def timeAt(name: String, dir: String, budget: Int): Option[Double] = {
      @volatile var result: Option[Double] = None
      val t = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(s"audit-$name", name,
            interruptOnCancel = true)
          val fn = SparkEntry.queries(name)
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm
          result = Some(math.min(once(), once()))
        } catch { case e: Throwable =>
          System.err.println(s"[audit] $name at $dir failed: ${e.getMessage}")
        }
      })
      t.start()
      t.join(budget * 1000L)
      if (t.isAlive) {
        spark.sparkContext.cancelJobGroup(s"audit-$name")
        t.join(60000L)
        None
      } else result
    }

    var flagged = List.empty[String]
    names.foreach { name =>
      val base = timeAt(name, baseDir, budgetSec)
      // scaled budget: generous linear allowance over the base time
      val scaledBudget = base match {
        case Some(b) => math.max(budgetSec, (b * factor * 3).toInt + 30)
        case None => budgetSec
      }
      val scaled = timeAt(name, scaledDir, scaledBudget)
      (base, scaled) match {
        case (Some(b), Some(s)) =>
          val ratio = if (b > 0) s / b else Double.NaN
          val flag = if (ratio > 1.5 * factor) { flagged ::= name; " <<< SUPERLINEAR" } else ""
          println(f"[audit] $name%-28s base=$b%7.2fs scaled=$s%8.2fs ratio=$ratio%6.1fx$flag")
        case (Some(b), None) =>
          flagged ::= name
          println(f"[audit] $name%-28s base=$b%7.2fs scaled=TIMEOUT(>${budgetSec * 3}s) <<< SUPERLINEAR")
        case _ =>
          flagged ::= name
          println(s"[audit] $name base run failed or timed out <<< CHECK")
      }
    }
    println(s"[audit] flagged: ${if (flagged.isEmpty) "none" else flagged.reverse.mkString(", ")}")
    spark.stop()
  }
}
