package graft
import org.apache.spark.sql.SparkSession

/** Count-and-stacktrace smoke for a list of registered queries:
  * `runMain graft.RunCheck <sfDir> <query> [query...]` — the
  * fastest way to see WHY a query fails at a given sf dir (Bench
  * swallows exceptions into -1 sentinels; this prints them).
  * Round 7's 59-query testdata-encoding break was diagnosed with
  * exactly this loop.
  */
object RunCheck {
  def main(args: Array[String]): Unit = {
    // one session recipe for the whole repo — a session-level fix
    // (e.g. a new legacy-parquet flag) must not need remembering here
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (q <- args.drop(1)) {
      try { println(s"$q -> " + SparkEntry.queries(q)(spark, dir).count()) }
      catch { case e: Throwable => println(s"$q FAILED: ${e.getClass.getName}: ${e.getMessage}"); e.printStackTrace() }
    }
    spark.stop()
  }
}
