package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked operator exercise (SURVEY §2 row). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** Central registry aggregated by SparkEntry; modules contribute
  * their SURVEY §2 rows here.
  */
object Registry {
  def all: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing", Analytic.q1Pricing, Some(Analytic.q1PricingSql)),
    QueryDef("q3_priority", Analytic.q3Priority, Some(Analytic.q3PrioritySql)),
    QueryDef("q5_volume", Analytic.q5Volume, Some(Analytic.q5VolumeSql)),
    QueryDef("q_topn_window", Analytic.qTopnWindow, Some(Analytic.qTopnWindowSql)),
    QueryDef("q_events_window", Analytic.qEventsWindow, Some(Analytic.qEventsWindowSql)),
    QueryDef("q_sessionize", Analytic.qSessionize, Some(Analytic.qSessionizeSql))
  )
}
