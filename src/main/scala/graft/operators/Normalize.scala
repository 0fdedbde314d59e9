package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Schema normalization — the reference's transform layer
  * re-expressed as pure column transforms (reference:
  * src/o2agol/pipeline/transform.py). Everything here is a
  * declarative projection/rename/cast: no per-row Python-style
  * apply, so Catalyst keeps it inside whole-stage codegen and the
  * projection prunes the scan.
  */
object Normalize {

  /** AGOL-safe max text length (transform.py:26 AGOL_STRING_MAX). */
  val StringMax = 255

  /** Field-name length cap (transform.py:311 — 30-char AGOL limit). */
  val FieldNameMax = 30

  /** Reserved keywords renamed `x -> x_field` (transform.py:33-71). */
  val ReservedKeywords: Set[String] = Set(
    "select", "from", "where", "order", "group", "by", "join", "inner",
    "left", "right", "on", "as", "distinct", "count", "sum", "avg",
    "max", "min", "table", "column", "index", "key", "primary",
    "foreign", "unique", "not", "null", "and", "or", "in", "like",
    "between", "exists", "having", "union", "intersect", "except")

  /** Preferred publish column order (transform.py:98-108). */
  val PreferredOrder: Seq[String] = Seq(
    "id", "name",
    "road_class", "road_type",
    "building_class", "building_type", "height_m", "floors",
    "feature_type", "infra_class", "infra_type",
    "name_primary", "name_common",
    "category_primary", "category_alternate",
    "address_full", "address_locality", "address_country",
    "website", "email", "phone")

  /** Sanitize one field name (transform.py:297-324 + reserved map):
    * spaces/dashes → underscore, reserved keyword → suffix `_field`,
    * truncate to 30 chars.
    */
  def sanitizeName(name: String): String = {
    val cleaned = name.replace(' ', '_').replace('-', '_')
    val deReserved =
      if (ReservedKeywords.contains(cleaned.toLowerCase)) s"${cleaned}_field" else cleaned
    deReserved.take(FieldNameMax)
  }

  def sanitizeFieldNames(df: DataFrame): DataFrame = {
    // Truncation/keyword-suffixing can collapse distinct names onto
    // one sanitized name; disambiguate with a numeric suffix (kept
    // within the length cap). The rename is applied ATOMICALLY via
    // toDF — a withColumnRenamed fold renames every column matching
    // the target name, so transient collisions (e.g. "select" →
    // "select_field" next to an original "select_field") would
    // corrupt both columns.
    val used = scala.collection.mutable.Set.empty[String]
    val finalNames = df.columns.map { c =>
      var name = sanitizeName(c)
      var i = 2
      while (used.contains(name.toLowerCase)) {
        val suffix = s"_$i"
        name = sanitizeName(c).take(FieldNameMax - suffix.length) + suffix
        i += 1
      }
      used += name.toLowerCase
      name
    }
    df.toDF(finalNames.toIndexedSeq: _*)
  }

  /** Clip every string column to `max` chars (transform.py:327-331). */
  def clipStrings(df: DataFrame, max: Int = StringMax): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case StringType => substring(col(f.name), 1, max).as(f.name)
        case _          => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Null-on-failure numeric conversion (transform.py:757-770
    * `_safe_numeric_convert`) — `try_cast`, not `cast`, so garbage
    * becomes null instead of an analysis-time error or a wrong zero.
    */
  def safeNumeric(c: Column, to: String): Column = c.try_cast(DataType.fromDDL(to))

  /** Reorder columns to the publish order, rest after, geometry-ish
    * payload (if any) last (transform.py:334-338).
    */
  def orderColumnsForPublish(df: DataFrame, tailCols: Seq[String] = Seq("geometry")): DataFrame = {
    val preferred = PreferredOrder.filter(c => df.columns.contains(c) && !tailCols.contains(c))
    val rest = df.columns.filterNot(c => preferred.contains(c) || tailCols.contains(c))
    val tail = tailCols.filter(df.columns.contains)
    df.select((preferred ++ rest ++ tail).map(col): _*)
  }

  /** Metadata enrichment (transform.py:151-177 `add_metadata`):
    * constant provenance columns. `processedDate` is caller-supplied
    * (the reference stamps now(); a deterministic engine takes it as
    * an argument).
    */
  def addMetadata(
      df: DataFrame,
      countryIso3: String,
      countryName: String,
      sector: Option[String],
      processedDate: String
  ): DataFrame = {
    val base = df
      .withColumn("processed_date", lit(processedDate))
      .withColumn("country_iso3", lit(countryIso3))
      .withColumn("country_name", lit(countryName))
    sector.fold(base)(s => base.withColumn("data_sector", lit(s)))
  }

  /** Validity rules (transform.py:252-294 `enforce_geometry_rules`
    * analogue): required columns non-null/non-empty, magnitude above
    * the degenerate threshold, duplicates by id removed
    * deterministically (a real engine can't keep "whichever pandas
    * kept"; we keep each id's first row by a total order).
    */
  def dropInvalid(
      df: DataFrame,
      requiredNonEmpty: Seq[String],
      magnitudeCol: Option[(String, Double)]
  ): DataFrame = {
    val nonNull = requiredNonEmpty.foldLeft(df) { (d, c) =>
      d.filter(col(c).isNotNull && (d.schema(c).dataType match {
        case StringType => col(c) =!= ""
        case _          => lit(true)
      }))
    }
    magnitudeCol.fold(nonNull) { case (c, minV) => nonNull.filter(col(c) > minV) }
  }
}
