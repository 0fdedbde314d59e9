package graft.queries

import graft.Tables
import graft.operators.Normalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transform-layer operator exercises (SURVEY §2 B) — each drives
  * the `Normalize` public API over testdata analogues of the
  * Overture layers.
  */
object TransformQueries {

  /** B1: roads schema normalization (transform.py:431-469) —
    * project/rename to the flat publish schema, strings clipped,
    * publish column order. `part` stands in for segments.
    */
  def trNormalizeRoads(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val projected = t.part.select(
      col("p_partkey").as("id"),
      col("p_name").as("name"),
      col("p_brand").as("road_class"),
      col("p_type").as("road_type"))
    Normalize.orderColumnsForPublish(Normalize.clipStrings(projected))
  }

  val trNormalizeRoadsSql: String =
    """SELECT p_partkey AS id, p_name AS name, p_brand AS road_class,
      |  p_type AS road_type FROM part""".stripMargin

  /** B2: buildings schema normalization incl. numeric height/floors
    * (transform.py:472-515).
    */
  def trNormalizeBuildings(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val projected = t.part.select(
      col("p_partkey").as("id"),
      col("p_name").as("name"),
      col("p_brand").as("building_class"),
      Normalize.safeNumeric(col("p_retailprice"), "double").as("height_m"),
      Normalize.safeNumeric(col("p_size"), "int").as("floors"))
    Normalize
      .orderColumnsForPublish(Normalize.clipStrings(projected))
      .withColumn("height_m", round(col("height_m"), 4))
  }

  val trNormalizeBuildingsSql: String =
    """SELECT p_partkey AS id, p_name AS name, p_brand AS building_class,
      |  round(TRY_CAST(p_retailprice AS DOUBLE), 4) + 0 AS height_m,
      |  TRY_CAST(p_size AS INT) AS floors FROM part""".stripMargin

  /** B3: places schema normalization (transform.py:518-573) — JSON
    * flatten + category + confidence over the events analogue.
    */
  def trNormalizePlaces(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.select(
      col("event_id").as("id"),
      get_json_object(col("props"), "$.k").as("name_primary"),
      col("event_type").as("category_primary"),
      round(col("value"), 4).as("confidence"))
  }

  val trNormalizePlacesSql: String =
    """SELECT event_id AS id, json_extract_string(props, '$.k') AS name_primary,
      |  event_type AS category_primary, round(value, 4) + 0 AS confidence
      |FROM events""".stripMargin

  /** B4: string clipping at 255 (transform.py:327-331). */
  def trClipStrings(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Normalize
      .clipStrings(t.documents.select(col("doc_id"), col("text")))
      .withColumn("clipped_len", length(col("text")))
      .drop("text")
  }

  val trClipStringsSql: String =
    "SELECT doc_id, length(left(text, 255)) AS clipped_len FROM documents"

  /** B5: safe numeric conversion (transform.py:757-770) — a valid
    * JSON-int extraction and a guaranteed-garbage cast both flow
    * through try_cast semantics (null, never an error).
    */
  def trSafeNumeric(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.select(
      col("event_id"),
      Normalize.safeNumeric(get_json_object(col("props"), "$.k"), "int").as("k_int"),
      Normalize.safeNumeric(col("event_type"), "int").as("bad_cast"))
  }

  val trSafeNumericSql: String =
    """SELECT event_id,
      |  TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  TRY_CAST(event_type AS INT) AS bad_cast
      |FROM events""".stripMargin

  /** B6: first-of-array extraction (transform.py:725-742
    * `_extract_first_from_array`).
    */
  def trFirstOfArray(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.embeddings.select(
      col("vec_id"),
      round(element_at(col("embedding"), 1).cast("double"), 4).as("first_dim"),
      size(col("embedding")).cast("long").as("dim"))
  }

  val trFirstOfArraySql: String =
    """SELECT vec_id, round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_dim,
      |  len(embedding) AS dim FROM embeddings""".stripMargin
  // `+ 0` normalizes DuckDB's round(-0.00002, 4) = -0.0 to +0.0
  // (Spark's BigDecimal round never emits -0.0).

  /** B7: field-name sanitization (transform.py:33-108, 297-324) —
    * reserved keywords suffixed, spaces/dashes underscored, 30-char
    * cap. The frame is built with hostile names, then sanitized.
    */
  def trSanitizeFields(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val hostile = t.orders.select(
      col("o_orderkey").as("select"),
      col("o_orderstatus").as("order status"),
      col("o_totalprice").as("an-extremely-long-field-name-beyond-the-agol-limit"))
    Normalize
      .sanitizeFieldNames(hostile)
      .withColumn("an_extremely_long_field_name_b", round(col("an_extremely_long_field_name_b"), 4))
  }

  val trSanitizeFieldsSql: String =
    """SELECT o_orderkey AS select_field, o_orderstatus AS order_status,
      |  round(o_totalprice, 4) + 0 AS an_extremely_long_field_name_b
      |FROM orders""".stripMargin

  /** B8: metadata enrichment (transform.py:151-177). */
  def trMetadataEnrich(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Normalize.addMetadata(
      t.nation.select(col("n_nationkey"), col("n_name")),
      countryIso3 = "AFG",
      countryName = "Afghanistan",
      sector = Some("Road Network"),
      processedDate = "2026-01-01T00:00:00")
  }

  val trMetadataEnrichSql: String =
    """SELECT n_nationkey, n_name,
      |  '2026-01-01T00:00:00' AS processed_date,
      |  'AFG' AS country_iso3, 'Afghanistan' AS country_name,
      |  'Road Network' AS data_sector
      |FROM nation""".stripMargin

  /** B10: schema-full JSON parsing — from_json with a declared
    * schema (the structured counterpart of the A2 path extraction;
    * reference flattens whole JSON objects, transform.py:576-635).
    */
  def trFromJson(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).as("p"))
      .select(col("event_id"), col("p.k").as("k"))
  }

  val trFromJsonSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  /** B9: validity rules (transform.py:252-294) — non-null/non-empty
    * requireds plus the degenerate-magnitude threshold.
    */
  def trDropInvalid(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Normalize
      .dropInvalid(
        t.events.select(col("event_id"), col("event_type"), col("value")),
        requiredNonEmpty = Seq("event_type", "value"),
        magnitudeCol = Some(("value", 1.0)))
      .withColumn("value", round(col("value"), 4))
  }

  val trDropInvalidSql: String =
    """SELECT event_id, event_type, round(value, 4) + 0 AS value FROM events
      |WHERE event_type IS NOT NULL AND event_type != ''
      |  AND value IS NOT NULL AND value > 1.0""".stripMargin
}
