package graft.export

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContractsSpec extends SparkSpec {

  private def sampleDf =
    tables.events.select(col("event_id").as("id"),
      col("event_type").as("geometry"), col("value"))

  test("a well-formed layer + metadata passes") {
    Contracts.validatePublishContracts(
      Seq(("places", sampleDf, Seq("id", "geometry"))),
      Some(Contracts.MetadataContract("T", "S", "D", Seq("a", "b"))))
  }

  test("missing required columns are all reported at once") {
    val e = intercept[IllegalArgumentException] {
      Contracts.validatePublishContracts(
        Seq(("places", sampleDf, Seq("id", "geometry", "name", "iso3"))))
    }
    assert(e.getMessage.contains("name") && e.getMessage.contains("iso3"))
    assert(e.getMessage.contains("places"))
  }

  test("geometry column name and CRS are enforced") {
    val errs = Contracts.validateLayer(Contracts.LayerContract(
      "l", Seq("id", "geom"), Seq("id"), geometryColumn = "geom",
      crsEpsg = Some(3857)))
    assert(errs.exists(_.contains("'geometry'")))
    assert(errs.exists(_.contains("EPSG:3857")))
    // 4326 passes the CRS clause
    assert(Contracts.validateLayer(Contracts.LayerContract(
      "l", Seq("id"), Seq("id"), crsEpsg = Some(4326))).isEmpty)
  }

  test("metadata tags normalize from a comma string; empties rejected") {
    assert(Contracts.normalizeTags(" a , , b,") == Seq("a", "b"))
    val errs = Contracts.validateMetadata(
      Contracts.MetadataContract("", "s", "d", Nil))
    assert(errs.exists(_.contains("title")))
    assert(errs.exists(_.contains("tag")))
  }

  test("all layer and metadata violations surface in one throw") {
    val e = intercept[IllegalArgumentException] {
      Contracts.validatePublishContracts(
        Seq(("", sampleDf, Seq("nope"))),
        Some(Contracts.MetadataContract("t", "", "d", Seq("x"))))
    }
    val msg = e.getMessage
    assert(msg.contains("nope") && msg.contains("snippet") &&
      msg.contains("layer name"))
  }
}
