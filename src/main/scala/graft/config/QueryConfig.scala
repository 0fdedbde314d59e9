package graft.config

import org.apache.spark.sql.SparkSession

/** A named pipeline query definition (reference:
  * src/o2agol/domain/models.py:30-56 `Query` +
  * data/queries.yml entries): theme/type selection, optional
  * filters, multilayer/geometry-split flags, and publish metadata.
  */
final case class QueryConfig(
    name: String,
    theme: String,
    typeName: String,
    filter: Option[String] = None,
    buildingFilter: Option[String] = None,
    buildingTheme: Option[String] = None,
    isMultilayer: Boolean = false,
    geometrySplit: Boolean = false,
    sectorTitle: Option[String] = None,
    sectorTag: Option[String] = None,
    upsertKey: String = "id"
)

object QueryConfig {

  /** Load a query catalog from a JSON array file (the engine-side
    * equivalent of the reference's queries.yml; YAML carries no
    * semantics the JSON form loses).
    */
  def catalogFromJson(spark: SparkSession, path: String): Map[String, QueryConfig] = {
    val df = spark.read.option("multiLine", "true").json(path)
    val cols = df.columns.toSet
    def opt(r: org.apache.spark.sql.Row, c: String): Option[String] =
      if (cols.contains(c)) Option(r.getAs[Any](c)).map(_.toString) else None
    df.collect().map { r =>
      val qc = QueryConfig(
        name = r.getAs[String]("name"),
        theme = r.getAs[String]("theme"),
        typeName = opt(r, "type").getOrElse("feature"),
        filter = opt(r, "filter"),
        buildingFilter = opt(r, "building_filter"),
        buildingTheme = opt(r, "building_theme"),
        isMultilayer = opt(r, "is_multilayer").exists(_.toBoolean),
        geometrySplit = opt(r, "geometry_split").exists(_.toBoolean),
        sectorTitle = opt(r, "sector_title"),
        sectorTag = opt(r, "sector_tag"),
        upsertKey = opt(r, "upsert_key").getOrElse("id"))
      qc.name -> qc
    }.toMap
  }
}

/** `{placeholder}` template rendering for publish metadata
  * (reference: queries.yml agol blocks — `item_title: "{title}"`,
  * `tags: "{tags_base} + [...]"` — resolved by the publisher).
  * Unknown placeholders are left verbatim (diagnosable, never
  * silently dropped).
  */
object MetadataTemplate {
  private val Placeholder = "\\{([a-zA-Z0-9_]+)\\}".r

  def render(template: String, vars: Map[String, String]): String =
    Placeholder.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))
}
