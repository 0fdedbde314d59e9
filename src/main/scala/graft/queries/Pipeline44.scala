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
    * Scale shape: the site table broadcasts (dim-sized); the top-3
    * selection per point is a window over each event's |sites|
    * candidate rows, partitioned by the high-cardinality event key
    * — parallel across points, bounded per partition. When the site
    * table outgrows a broadcast, the C6 grid-cell equi-join bounds
    * candidates first (documented path; the window shape is
    * unchanged).
    */
  def geoKnn(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sites = t.nation.select(
      col("n_nationkey").cast("long").as("site_id"),
      expr("CAST((n_nationkey * 37) % 127 AS DOUBLE)").as("sx"),
      expr("CAST((n_nationkey * 59) % 89 AS DOUBLE)").as("sy"))
    val pts = t.events.select(
      col("event_id"), col("value").as("x"),
      get_json_object(col("props"), "$.k").cast("double").as("y"))
    val cand = pts.crossJoin(broadcast(sites))
      .withColumn("d2",
        (col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy")))
    val w = Window.partitionBy(col("event_id")).orderBy(col("d2"), col("site_id"))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("event_id"), col("rank"), col("site_id"),
        round(sqrt(col("d2")), 4).as("dist"))
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
