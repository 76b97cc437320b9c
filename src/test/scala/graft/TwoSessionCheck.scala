package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM scenario behind DedupSpec's two-session cache test: the
  * suite's shared SparkSession cannot be stopped in-process (every
  * other suite holds it), so this main exercises the REAL sequence —
  * session 1 populates `Dedup.sharedSigs`, is stopped, session 2 must
  * recompute instead of receiving session 1's dead persisted frames.
  * Exit 0 + the marker line = pass. */
object TwoSessionCheck {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    def mk(name: String): SparkSession = SparkSession.builder()
      .master("local[2]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val s1 = mk("graft-two-session-1")
    s1.sparkContext.setLogLevel("WARN")
    val n1 = graft.operators.Dedup.d3Minhash(s1, sf).count()
    val c1 = graft.operators.Dedup.d8Components(s1, sf).count()
    require(graft.operators.Dedup.sigCacheSize == 1,
      s"cache not populated: size ${graft.operators.Dedup.sigCacheSize}")
    s1.stop()

    val s2 = mk("graft-two-session-2")
    s2.sparkContext.setLogLevel("WARN")
    val n3 = graft.operators.Dedup.d3Minhash(s2, sf).count()
    val n4 = graft.operators.Dedup.d4LshPairs(s2, sf).count()
    val n5 = graft.operators.Dedup.d5Jaccard(s2, sf).count()
    // the component assignment cache holds localCheckpoint'ed frames —
    // session 1's are dead RDDs; a stale entry would throw here
    val c2 = graft.operators.Dedup.d8Components(s2, sf).count()
    // a stale-entry implementation either leaves session 1's dead entry
    // behind (size 2) or, on a key collision, hands session 2 a dead
    // persisted frame (the d3 count above then throws)
    require(graft.operators.Dedup.sigCacheSize == 1,
      s"stale cache entries survive a session stop: size ${graft.operators.Dedup.sigCacheSize}")
    require(n3 == n1 && n1 > 0,
      s"second session answer diverged: $n1 vs $n3")
    require(c2 == c1 && c1 > 0,
      s"second session component answer diverged: $c1 vs $c2")
    require(n4 >= 0 && n5 >= 0)
    s2.stop()
    println("TWO_SESSION_OK")
  }
}
