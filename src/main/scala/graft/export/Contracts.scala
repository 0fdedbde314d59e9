package graft.export

import org.apache.spark.sql.DataFrame

/** Publish-contract validation — the pre-flight gate the reference
  * runs before any network call (reference: domain/contracts.py:19
  * `PublishMetadataContract`, :39 `PublishLayerContract`, :91
  * `validate_publish_contracts`): catch a malformed payload locally
  * instead of discovering it as a half-published remote layer.
  *
  * Scale note: layer validation here is SCHEMA-only by design — the
  * reference's `from_geodataframe` reads `len(gdf)` because its
  * frames are already in memory; on a 100 TB frame a validation
  * count would be a full scan, so the feature-count clause is the
  * caller's option (pass `featureCount = Some(n)` when a count is
  * already known, e.g. from a manifest).
  */
object Contracts {

  /** Minimal metadata contract for an item update/publish payload
    * (title / snippet / description non-empty, ≥1 tag; a
    * comma-separated tag STRING is normalized to trimmed non-empty
    * tags first — the reference's `_normalize_tags`).
    */
  final case class MetadataContract(
      title: String,
      snippet: String,
      description: String,
      tags: Seq[String])

  def normalizeTags(tags: String): Seq[String] =
    tags.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  def validateMetadata(m: MetadataContract): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (m.title.trim.isEmpty) errs += "metadata: title must be non-empty"
    if (m.snippet.trim.isEmpty) errs += "metadata: snippet must be non-empty"
    if (m.description.trim.isEmpty) errs += "metadata: description must be non-empty"
    if (m.tags.isEmpty || m.tags.forall(_.trim.isEmpty))
      errs += "metadata: at least one non-empty tag required"
    errs.result()
  }

  /** Summary contract for one transformed layer payload. */
  final case class LayerContract(
      layerName: String,
      columns: Seq[String],
      requiredColumns: Seq[String],
      geometryColumn: String = "geometry",
      crsEpsg: Option[Int] = None,
      featureCount: Option[Long] = None)

  def validateLayer(c: LayerContract): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (c.layerName.trim.isEmpty) errs += "layer name must be non-empty"
    val available = c.columns.toSet
    val missing = c.requiredColumns.filterNot(available.contains)
    if (missing.nonEmpty)
      errs += s"missing required output columns for layer '${c.layerName}': " +
        missing.mkString(", ")
    if (c.geometryColumn != "geometry")
      errs += s"layer '${c.layerName}' must use 'geometry' as the active " +
        s"geometry column, got '${c.geometryColumn}'"
    c.crsEpsg.foreach { epsg =>
      if (epsg != 4326)
        errs += s"layer '${c.layerName}' must be EPSG:4326 before publish, " +
          s"got EPSG:$epsg"
    }
    c.featureCount.foreach { n =>
      if (n < 0) errs += s"layer '${c.layerName}' has negative feature count $n"
    }
    errs.result()
  }

  def layerFromDataFrame(
      layerName: String,
      df: DataFrame,
      requiredColumns: Seq[String],
      geometryColumn: String = "geometry",
      crsEpsg: Option[Int] = None,
      featureCount: Option[Long] = None): LayerContract =
    LayerContract(layerName, df.columns.toSeq, requiredColumns,
      geometryColumn, crsEpsg, featureCount)

  /** Validate every layer + optional metadata; throws with ALL
    * problems listed (one pass, one error message — the operator
    * fixes everything at once instead of whack-a-mole).
    */
  def validatePublishContracts(
      layers: Seq[(String, DataFrame, Seq[String])],
      metadata: Option[MetadataContract] = None): Unit = {
    val errs =
      layers.flatMap { case (name, df, req) =>
        validateLayer(layerFromDataFrame(name, df, req))
      } ++ metadata.toSeq.flatMap(validateMetadata)
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        s"publish contract violations:\n  ${errs.mkString("\n  ")}")
  }
}
