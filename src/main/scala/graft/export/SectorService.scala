package graft.`export`

import graft.operators.Geo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-sector composed publishing (reference: cli.py:2306
  * `add_sector_layers` + cli.py:2234 `polygons_to_centroids`): a
  * sectoral dataset (education / health / markets) publishes as
  * three layers per sector in ONE multi-layer service —
  *
  *   - `<sector>_places`            point features
  *   - `<sector>_buildings`         polygon features
  *   - `<sector>_places_combined`   places + building CENTROIDS
  *
  * matching the reference: the centroid layer is an intermediate
  * (popped before publish, never its own layer), degenerate
  * (~zero-area) polygons contribute no centroid, and when the
  * buildings frame carries no ring geometry the combined layer is
  * skipped entirely rather than guessed.
  *
  * Scale shape: centroids are Geo's shoelace column expressions
  * (C5) — map-only, zero shuffle, no UDF; composing a sector adds
  * NO exchange beyond its two source reads, and the union is a
  * plan-level concatenation.
  */
object SectorService {

  /** One sector's inputs. `ringCol` names the polygon ring column
    * (`array<struct<x,y>>`) in `buildings`; `pointCols` names the
    * point-coordinate columns shared by `places` and the emitted
    * centroids so the combined union aligns by name.
    */
  final case class SectorBundle(
      sector: String,
      places: DataFrame,
      buildings: DataFrame,
      ringCol: Option[String] = Some("ring"),
      pointCols: (String, String) = ("x", "y"))

  val FeatureTypeCol = "feature_type"
  private val DegenerateArea = 1e-12

  private def tag(df: DataFrame, t: String, overwrite: Boolean = false): DataFrame =
    if (!overwrite && df.columns.contains(FeatureTypeCol)) df
    else df.withColumn(FeatureTypeCol, lit(t))

  /** The composed layers for one sector, in publish order. */
  def composedLayers(b: SectorBundle): Seq[(String, DataFrame)] = {
    val (xc, yc) = b.pointCols
    val places = tag(b.places, "place")
    val combined = b.ringCol
      .filter(b.buildings.columns.contains)
      .map { rc =>
        val cen = Geo.polygonCentroid(col(rc))
        val centroids = b.buildings
          .filter(abs(Geo.polygonArea(col(rc))) > DegenerateArea)
          .withColumn(xc, round(cen.getField("x"), 4))
          .withColumn(yc, round(cen.getField("y"), 4))
          .drop(rc)
        places.unionByName(
          tag(centroids, "building_centroid", overwrite = true),
          allowMissingColumns = true)
      }
    Seq(
      s"${b.sector}_places" -> places,
      s"${b.sector}_buildings" -> tag(b.buildings, "building")) ++
      combined.map(c => s"${b.sector}_places_combined" -> c)
  }

  /** Publish every sector's composed layers into ONE service
    * (reference: one AGOL item, N layers); returns the published
    * layer names in order.
    */
  def publishSectors(
      servicePath: String,
      sectors: Seq[SectorBundle],
      mode: PublishMode.Value,
      upsertKey: String = "id"): Seq[String] =
    sectors.flatMap(composedLayers).map { case (layer, df) =>
      FeatureService.publish(df, servicePath, layer, mode, upsertKey)
      layer
    }
}
