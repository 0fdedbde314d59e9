package graft.`export`

import graft.SparkSpec
import graft.operators.Geo
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** add_sector_layers semantics (reference cli.py:2306): three layers
  * per sector, centroids folded into places_combined (never their
  * own layer), degenerate polygons dropped from combined only, no
  * combined layer without ring geometry — and all sectors land in
  * ONE multi-layer service.
  */
class SectorServiceSpec extends SparkSpec {

  import SectorService._

  private def tmp(): String = Files.createTempDirectory("graft-sector").toString

  /** places: two points; buildings: a unit square at (2,2), a 2×2
    * square at (10,4), and a DEGENERATE zero-area sliver.
    */
  private def bundle(sector: String) = {
    import spark.implicits._
    val places = Seq((1L, 0.5, 0.5), (2L, 3.0, 1.0)).toDF("id", "x", "y")
    val sq = Seq(
      (10L, Seq((1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5))),
      (11L, Seq((9.0, 3.0), (11.0, 3.0), (11.0, 5.0), (9.0, 5.0))),
      (12L, Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))) // collinear → area 0
    )
    val buildings = sq
      .map { case (id, pts) => (id, pts) }
      .toDF("id", "pts")
      .withColumn("ring", transform(col("pts"), p =>
        struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
      .drop("pts")
    SectorBundle(sector, places, buildings)
  }

  test("composed layers: places, buildings, combined with true centroids") {
    val layers = composedLayers(bundle("education")).toMap
    assert(layers.keySet ==
      Set("education_places", "education_buildings", "education_places_combined"))
    val combined = layers("education_places_combined")
    // 2 places + 2 non-degenerate building centroids (sliver dropped)
    assert(combined.count() == 4)
    val cents = combined.filter(col("feature_type") === "building_centroid")
      .select("id", "x", "y").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(cents.toSeq == Seq((10L, 2.0, 2.0), (11L, 10.0, 4.0))) // square centroid = center
    // buildings layer keeps ALL polygons, degenerate included
    assert(layers("education_buildings").count() == 3)
    // the intermediate centroid layer is never emitted on its own
    assert(!layers.keySet.exists(_.contains("centroid")))
  }

  test("no ring column -> no combined layer (reference skip)") {
    val b = bundle("health")
    val layers = composedLayers(b.copy(buildings = b.buildings.drop("ring")))
    assert(layers.map(_._1) == Seq("health_places", "health_buildings"))
  }

  test("publishSectors: three sectors compose into one service") {
    val svc = tmp() + "/svc"
    val sectors = Seq(bundle("education"), bundle("health"), bundle("markets"))
    val published = publishSectors(svc, sectors, PublishMode.Initial)
    assert(published.size == 9)
    assert(FeatureService.listLayers(spark, svc).toSet == published.toSet)
    val back = FeatureService.readLayer(spark, svc, "markets_places_combined")
    assert(back.count() == 4)
    assert(back.select("feature_type").distinct().collect().map(_.getString(0)).toSet ==
      Set("place", "building_centroid"))
  }

  test("cli publish-sectors verb: catalog -> composed multi-layer service") {
    val dir = tmp()
    val catalog = s"$dir/catalog.json"
    Files.writeString(java.nio.file.Paths.get(catalog),
      """[
        |  {"name": "education", "theme": "customer", "filter": "c_mktsegment = 'FURNITURE'",
        |   "building_theme": "supplier", "building_filter": "s_nationkey = '3'"},
        |  {"name": "markets", "theme": "customer", "filter": "c_mktsegment = 'BUILDING'",
        |   "building_theme": "supplier", "building_filter": "s_nationkey = '8'"}
        |]""".stripMargin)
    val svc = s"$dir/svc"
    graft.Cli.run(spark, Seq("publish-sectors", catalog, "education,markets", sfDir, svc,
      "--geom=c_acctbal,c_nationkey", "--square=s_acctbal,s_nationkey,0.5"))
    val layers = FeatureService.listLayers(spark, svc).toSet
    assert(layers == Set(
      "education_places", "education_buildings", "education_places_combined",
      "markets_places", "markets_buildings", "markets_places_combined"))
    val combined = FeatureService.readLayer(spark, svc, "education_places_combined")
    val nPlaces = FeatureService.readLayer(spark, svc, "education_places").count()
    val cents = combined.filter(col("feature_type") === "building_centroid")
    assert(combined.count() == nPlaces + cents.count() && cents.count() > 0)
    // synthesized square footprints: centroid must land back on the center
    val b = FeatureService.readLayer(spark, svc, "education_buildings")
      .select(col("s_suppkey").cast("long").as("id"),
        col("s_acctbal").cast("double").as("cx"),
        col("s_nationkey").cast("double").as("cy"))
    val chk = cents.select(col("s_suppkey").cast("long").as("id"), col("x"), col("y"))
      .join(b, "id")
      .filter(abs(col("x") - col("cx")) > 1e-9 || abs(col("y") - col("cy")) > 1e-9)
    assert(chk.count() == 0)
  }
}
