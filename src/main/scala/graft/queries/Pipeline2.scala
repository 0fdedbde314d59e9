package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 3: product-analytics and corpus-hygiene operators —
  * staged funnels, SCD2 interval builds, touch attribution,
  * nearest-site assignment, C4-style cross-corpus span dedup,
  * robust (MAD) outlier detection, weighted source interleaving.
  * Every entry is a SURVEY §2 row with a DuckDB oracle.
  */
object Pipeline2 {

  /** D30: staged conversion funnel view → click → purchase with
    * strictly-after semantics (each stage's timestamp must exceed
    * the previous stage's). Three aggregations all keyed on
    * user_id, so the stage joins reuse one exchange; output is the
    * 3-row summary (reference: the sector queries' staged
    * category→subtype filters, queries.yml).
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = t.events.select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").where(col("ts_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    def stage(df: DataFrame, n: Int, step: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("stage"), lit(step).as("step"), col("n_users"))
    stage(s1, 1, "view").unionByName(stage(s2, 2, "click"))
      .unionByName(stage(s3, 3, "purchase"))
  }

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
      |SELECT 1 AS stage, 'view' AS step, (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin

  /** D31: SCD2 history build from a CDC-style log — per key, each
    * change event becomes a validity interval [valid_from, valid_to)
    * with the open interval flagged current. ONE shuffle on the key;
    * `lead` closes each interval with the next change's timestamp
    * (the warehouse dimension-history primitive behind the
    * reference's incremental publish modes, publish.py).
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("event_id"))
    t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("valid_from_us"), col("value"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  val qScd2Sql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us, value,
      |  lead(epoch_us(ts)) OVER w AS valid_to_us,
      |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
      |FROM events WHERE event_type = 'purchase'
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin

  /** D32: first/last-touch attribution — per user, the event type of
    * the earliest and latest event plus engagement totals, via
    * min_by/max_by on a (ts, event_id) struct key: the aggregate
    * combines map-side (each partition reduces to one candidate per
    * key before the shuffle), where the row_number formulation would
    * sort the whole log.
    */
  def qFirstLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ord = struct(col("ts_us"), col("event_id"))
    t.events.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), ord).as("first_touch"),
        max_by(col("event_type"), ord).as("last_touch"),
        round(sum(col("value")), 4).as("total_value"),
        count(lit(1)).as("n_events"))
  }

  val qFirstLastTouchSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn_first,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_last
      |  FROM events)
      |SELECT user_id,
      |  max(CASE WHEN rn_first = 1 THEN event_type END) AS first_touch,
      |  max(CASE WHEN rn_last = 1 THEN event_type END) AS last_touch,
      |  round(sum(value), 4) + 0 AS total_value,
      |  count(*) AS n_events
      |FROM r GROUP BY user_id""".stripMargin

  /** C9: nearest-site assignment (spatial NN join). The site table
    * is dimension-sized, so it collapses to ONE array-of-structs
    * literal folded per point — a map-only scan, zero shuffle, vs
    * the naive cross-join + argmin that shuffles every (point, site)
    * pair. Ties break to the lowest site_id (strict `<` over the
    * id-ordered array). Site coords derive deterministically from
    * the nation dim.
    */
  def geoNearest(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sites = t.nation.select(
        col("n_nationkey").cast("long").as("site_id"),
        pmod(col("n_nationkey") * 37, lit(127)).cast("double").as("sx"),
        pmod(col("n_nationkey") * 59, lit(89)).cast("double").as("sy"))
      .orderBy(col("site_id")).collect()
    val siteArr = array(sites.toIndexedSeq.map(r => struct(
      lit(r.getLong(0)).as("site_id"),
      lit(r.getDouble(1)).as("sx"),
      lit(r.getDouble(2)).as("sy"))): _*)
    val init = struct(
      lit(Double.MaxValue).as("d2"), lit(-1L).as("site_id"))
    t.events.select(
        col("event_id"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .withColumn("best", aggregate(siteArr, init, (acc, s) => {
        val d2 = (col("x") - s.getField("sx")) * (col("x") - s.getField("sx")) +
          (col("y") - s.getField("sy")) * (col("y") - s.getField("sy"))
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), s.getField("site_id").as("site_id")))
          .otherwise(acc)
      }))
      .select(col("event_id"), col("best.site_id").as("site_id"),
        round(sqrt(col("best.d2")), 4).as("dist"))
  }

  val geoNearestSql: String =
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
      |          ORDER BY (x - sx) * (x - sx) + (y - sy) * (y - sy), site_id) AS rn
      |      FROM p CROSS JOIN sites)
      |SELECT event_id, site_id, round(sqrt(d2), 4) + 0 AS dist
      |FROM d WHERE rn = 1""".stripMargin

  /** E12: C4-style cross-corpus span dedup — split every document
    * into 8-word spans, keep only each span's FIRST corpus
    * occurrence (min (doc_id, idx)), reassemble the surviving text
    * in original order. One shuffle on the span key + one back on
    * doc_id; at 100 TB the span key becomes an xxhash64 long (same
    * shape, fraction of the bytes) — kept as the raw string here so
    * the oracle is byte-exact.
    */
  def txSpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val spans = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        ceil(size(col("toks")) / lit(8.0)).cast("long").as("n_spans"),
        posexplode(transform(
          sequence(lit(0), (ceil(size(col("toks")) / lit(8.0)) - 1).cast("int")),
          i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " "))))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "span")
    val firstW = Window.partitionBy(col("span"))
      .orderBy(col("doc_id"), col("idx"))
    spans
      .withColumn("rn", row_number().over(firstW))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(
        min(col("n_spans")).as("n_spans"),
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("span")))),
          s => s.getField("span")), " ").as("text_kept"))
  }

  val txSpanDedupSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS n_spans,
      |    i - 1 AS idx,
      |    array_to_string(
      |      string_split(text, ' ')[(i-1)*8+1 : (i-1)*8+8], ' ') AS span
      |  FROM documents, unnest(generate_series(1,
      |    CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT))) AS t(i)),
      |k AS (SELECT *, row_number() OVER (
      |        PARTITION BY span ORDER BY doc_id, idx) AS rn FROM s)
      |SELECT doc_id, min(n_spans) AS n_spans, count(*) AS n_kept,
      |  string_agg(span, ' ' ORDER BY idx) AS text_kept
      |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin

  /** D33: robust outlier detection — per group, median and MAD
    * (median absolute deviation) via exact interpolated percentiles,
    * then |v − med| > 3·MAD counts. Two small aggregations broadcast
    * back onto one fact scan: the group key is low-cardinality, so
    * both stat tables are broadcast joins and the data shuffles only
    * for the final per-group rollup.
    */
  def qOutlierMad(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = t.events.select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5d)").as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5d)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        round(min(col("med")), 4).as("median"),
        round(min(col("mad")), 4).as("mad"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }

  val qOutlierMadSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, abs(value - med) AS adev, med
      |  FROM events e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, round(min(d.med), 4) + 0 AS median,
      |  round(min(m.mad), 4) + 0 AS mad,
      |  sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS n_outliers,
      |  count(*) AS n
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type""".stripMargin

  /** N6: weighted source interleave — deterministic curriculum
    * mixing order across corpus sources. Each doc's mix key is
    * (rank_within_source − 1) / weight, so a weight-3 source
    * contributes 3 docs for every 1 from a weight-1 source when the
    * corpus is consumed in mix-key order. The key is pure column
    * math over a per-source window (one shuffle); the global merge
    * is a sort at READ time, never a single-partition window.
    */
  def smInterleave(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    t.documents.select(col("doc_id"), col("source"))
      .withColumn("weight",
        (regexp_extract(col("source"), "\\d+", 0).cast("int") % 4 + 1)
          .cast("double"))
      .withColumn("src_rank", row_number().over(w))
      .withColumn("mix_key",
        round((col("src_rank") - 1).cast("double") / col("weight"), 4))
      .drop("weight")
  }

  val smInterleaveSql: String =
    """SELECT doc_id, source,
      |  row_number() OVER w AS src_rank,
      |  round((row_number() OVER w - 1) /
      |    CAST(CAST(regexp_extract(source, '\d+') AS INT) % 4 + 1 AS DOUBLE),
      |    4) + 0 AS mix_key
      |FROM documents
      |WINDOW w AS (PARTITION BY source ORDER BY doc_id)""".stripMargin
}
