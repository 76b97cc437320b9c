package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** Scratch A/B harness for plan experiments (not part of the surface). */
object TimeAlt {
  def q40Alt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lastShip = sources.Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("end_ts"))
    val span = sources.Tables.orders(spark, dir)
      .join(lastShip, $"o_orderkey" === $"l_orderkey")
      .select(date_trunc("week", $"o_orderdate").as("w0"),
        greatest(date_trunc("week", $"o_orderdate"),
          date_trunc("week", $"end_ts")).as("w1"))
    // sweep-line: +1 at start week, -1 one week past end week
    val deltas = span.select(explode(array(
        struct($"w0".as("week_start"), lit(1L).as("d")),
        struct(($"w1" + expr("interval 7 days")).as("week_start"), lit(-1L).as("d"))
      )).as("e")).select($"e.week_start", $"e.d")
      .groupBy($"week_start").agg(sum($"d").as("d"))
    val bounds = deltas.agg(min($"week_start").as("lo"), max($"week_start").as("hi"))
    val spine = bounds.select(explode(sequence($"lo", $"hi",
      expr("interval 7 days"))).as("week_start"))
    spine.join(deltas, Seq("week_start"), "left")
      .withColumn("d", coalesce($"d", lit(0L)))
      .withColumn("n_open", sum($"d").over(
        Window.orderBy($"week_start").rowsBetween(Window.unboundedPreceding, 0)))
      .filter($"n_open" > 0)
      .select($"week_start", $"n_open".as("n_open"))
      .orderBy($"week_start")
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String, fn: => DataFrame): Unit = {
      fn.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }.sorted
      println(f"$tag median=${ts(1)}%.2fs min=${ts.head}%.2fs")
    }
    time("q40_cur", SparkEntry.queries("q40_active_intervals")(spark, sfDir))
    time("q40_alt", q40Alt(spark, sfDir))
    val a = SparkEntry.queries("q40_active_intervals")(spark, sfDir).collect().map(_.toString).sorted
    val b = q40Alt(spark, sfDir).collect().map(_.toString).sorted
    println("identical: " + (a.toSeq == b.toSeq))
    spark.stop()
  }
}
