package graft.`export`

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Publish modes (reference: src/o2agol/domain/enums.py:10-16). */
object PublishMode extends Enumeration {
  /** create-or-replace based on existence (reference AUTO detect). */
  val Auto, Initial, Overwrite, Append = Value
}

/** Idempotent feature-service sink — the engine-side model of the
  * reference's AGOL publisher (reference:
  * src/o2agol/pipeline/publish.py — feature-layer create vs
  * truncate-and-append, upsert_key=id, chunked uploads). A service
  * is a directory of parquet layers plus a JSON descriptor; the
  * REST transport is out of scope, the dataflow semantics are not.
  */
object FeatureService {

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  def layerPath(servicePath: String, layer: String): String = s"$servicePath/layer=$layer"

  def layerExists(spark: SparkSession, servicePath: String, layer: String): Boolean =
    fs(spark, servicePath).exists(new HPath(layerPath(servicePath, layer)))

  /** Repair a layer left mid-swap by a crash (see the Auto upsert
    * swap order below). Idempotent; returns true if the layer is
    * live afterwards. States:
    *   - live present → drop leftover staging/backup;
    *   - staging present, live absent → the crash hit between the two
    *     renames; staging is a COMPLETE merged layer (it is fully
    *     written before the swap starts) → promote it;
    *   - only backup present → the crash hit after rename-aside but
    *     before promote AND staging vanished (shouldn't happen, but
    *     restore the backup rather than lose data).
    */
  def recoverLayer(spark: SparkSession, servicePath: String, layer: String): Boolean = {
    val f = fs(spark, servicePath)
    val live = new HPath(layerPath(servicePath, layer))
    val staging = new HPath(layerPath(servicePath, layer) + ".staging")
    val backup = new HPath(layerPath(servicePath, layer) + ".backup")
    if (f.exists(live)) {
      f.delete(staging, true)
      f.delete(backup, true)
      true
    } else if (f.exists(staging)) {
      // rename returns false (not throws) on several Hadoop FSs —
      // never drop the backup unless the promote actually happened.
      if (!f.rename(staging, live))
        throw new java.io.IOException(
          s"recoverLayer: failed to promote $staging to $live; backup left intact")
      f.delete(backup, true)
      true
    } else if (f.exists(backup)) {
      if (!f.rename(backup, live))
        throw new java.io.IOException(
          s"recoverLayer: failed to restore $backup to $live")
      true
    } else false
  }

  /** Publish one layer.
    *
    * - Initial: fail if the layer exists (reference INITIAL forces
    *   creation of a new feature layer).
    * - Overwrite: truncate-and-append — replace layer content.
    * - Append: add rows, no key reconciliation.
    * - Auto: create when missing; otherwise upsert by `upsertKey`
    *   (incoming rows replace same-key rows, others are kept) —
    *   the reference's smart-detect publish with upsert_key=id.
    */
  def publish(
      df: DataFrame,
      servicePath: String,
      layer: String,
      mode: PublishMode.Value,
      upsertKey: String = "id"
  ): Unit = {
    val spark = df.sparkSession
    val path = layerPath(servicePath, layer)
    // Heal any half-finished swap from a previous crashed publish
    // before deciding create-vs-upsert.
    recoverLayer(spark, servicePath, layer)
    val exists = layerExists(spark, servicePath, layer)
    mode match {
      case PublishMode.Initial =>
        if (exists)
          throw new IllegalStateException(s"layer '$layer' already exists at $servicePath")
        df.write.mode("errorifexists").parquet(path)
      case PublishMode.Overwrite =>
        df.write.mode("overwrite").parquet(path)
      case PublishMode.Append =>
        df.write.mode("append").parquet(path)
      case PublishMode.Auto =>
        if (!exists) df.write.mode("errorifexists").parquet(path)
        else {
          // Upsert: keep existing rows whose key is absent from the
          // incoming batch, union the batch. At warehouse scale this
          // is the generic non-transactional fallback; a table format
          // with merge (or partition-scoped overwrite) replaces it.
          // Writing to a staging path means the source is read and
          // the result written in ONE pass.
          val existing = spark.read.parquet(path)
          val merged = existing
            .join(df.select(col(upsertKey)).distinct(), Seq(upsertKey), "left_anti")
            .unionByName(df, allowMissingColumns = true)
          merged.write.mode("overwrite").parquet(s"$path.staging")
          // CRASH-SAFE swap: the old layer is renamed ASIDE, never
          // deleted while it is the only copy. A crash at any point
          // leaves either the old layer live, or staging/backup dirs
          // that recoverLayer (run on the next publish, or manually)
          // promotes — data loss requires losing BOTH copies.
          // Hadoop rename/delete signal failure by RETURNING FALSE on
          // several filesystems — every step is checked, and the
          // backup is only dropped after a confirmed promote.
          val f = fs(spark, servicePath)
          val live = new HPath(path)
          val staging = new HPath(s"$path.staging")
          val backup = new HPath(s"$path.backup")
          if (f.exists(backup) && !f.delete(backup, true))
            throw new java.io.IOException(s"upsert: cannot clear stale backup $backup")
          if (!f.rename(live, backup))
            throw new java.io.IOException(s"upsert: cannot move $live aside; layer unchanged")
          if (!f.rename(staging, live))
            throw new java.io.IOException(
              s"upsert: promote failed; old layer preserved at $backup (recoverLayer restores it)")
          f.delete(backup, true)
        }
    }
  }

  def readLayer(spark: SparkSession, servicePath: String, layer: String): DataFrame =
    spark.read.parquet(layerPath(servicePath, layer))

  /** Publish a layer as a BUCKETED table: rows hash-partitioned into
    * `buckets` files by `bucketKey` and registered in the session
    * catalog. Two layers bucketed the same way join with ZERO
    * shuffle (bucket-local sort-merge) — the co-located-join path
    * for repeatedly-joined 100 TB layers.
    */
  def publishBucketed(
      df: DataFrame,
      servicePath: String,
      layer: String,
      tableName: String,
      bucketKey: String,
      buckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .option("path", layerPath(servicePath, layer))
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
      .format("parquet")
      .saveAsTable(tableName)

  /** Range-sorted parquet write: global range partitioning + within-
    * partition sort keeps each file's min/max stats tight, so
    * range-predicate scans prune whole files (the engine-side
    * equivalent of the reference caching data ordered per country).
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String, partitions: Int): Unit =
    df.repartitionByRange(partitions, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** What [[FeatureService.cleanup]] did (or would do, when dryRun). */
  final case class CleanupReport(
      recovered: Seq[String],
      orphansRemoved: Seq[String],
      kept: Seq[String]
  )

  /** All live layer names in a service directory. */
  def listLayers(spark: SparkSession, servicePath: String): Seq[String] = {
    val f = fs(spark, servicePath)
    val base = new HPath(servicePath)
    if (!f.exists(base)) Seq.empty
    else
      f.listStatus(base).toIndexedSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => n.startsWith("layer=") && !n.endsWith(".staging") && !n.endsWith(".backup"))
        .map(_.stripPrefix("layer="))
        .sorted
  }

  /** Delete with bounded retries (reference cleanup.py:132
    * `_remove_path_with_retries` — transient FS errors shouldn't
    * fail a maintenance sweep).
    */
  private def removeWithRetries(f: FileSystem, p: HPath, retries: Int, delayMs: Long): Boolean = {
    var attempt = 0
    while (attempt < retries) {
      try {
        f.delete(p, true)
        return true
      } catch {
        case scala.util.control.NonFatal(_) =>
          attempt += 1
          if (attempt < retries) Thread.sleep(delayMs)
      }
    }
    false
  }

  /** Maintenance sweep (the engine-side model of reference
    * cleanup.py: orphan detection/removal + stale debris):
    *
    *  1. heal every half-finished swap (recoverLayer) — this also
    *     clears stale `.staging`/`.backup` debris;
    *  2. remove live layers NOT in `keep` (orphans — the analogue of
    *     AGOL items no query config references);
    *  3. report, without touching anything, when `dryRun`.
    */
  def cleanup(
      spark: SparkSession,
      servicePath: String,
      keep: Set[String],
      dryRun: Boolean = false,
      retries: Int = 3,
      retryDelayMs: Long = 100L
  ): CleanupReport = {
    val f = fs(spark, servicePath)
    val base = new HPath(servicePath)
    if (!f.exists(base)) return CleanupReport(Nil, Nil, Nil)
    // every layer name mentioned by ANY entry (live, staging, backup)
    val mentioned = f.listStatus(base).toIndexedSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("layer="))
      .map(_.stripPrefix("layer=").stripSuffix(".staging").stripSuffix(".backup"))
      .distinct.sorted
    val recovered = mentioned.filter { n =>
      val hadDebris =
        f.exists(new HPath(layerPath(servicePath, n) + ".staging")) ||
          f.exists(new HPath(layerPath(servicePath, n) + ".backup"))
      if (hadDebris && !dryRun) recoverLayer(spark, servicePath, n)
      hadDebris
    }
    val live = listLayers(spark, servicePath)
    val (keepers, orphans) = live.partition(keep.contains)
    val removed =
      if (dryRun) orphans
      else orphans.filter(n =>
        removeWithRetries(f, new HPath(layerPath(servicePath, n)), retries, retryDelayMs))
    CleanupReport(recovered, removed, keepers)
  }

  /** Chunking for batched uploads (reference: utils.py:331-374
    * `chunk_dataframe`/`estimate_chunk_size`): repartition so each
    * task writes ≈`maxRowsPerChunk` rows — partition count derives
    * from data size, not a driver-side loop over slices.
    */
  def chunkForUpload(df: DataFrame, totalRows: Long, maxRowsPerChunk: Int): DataFrame = {
    val parts = math.max(1, math.ceil(totalRows.toDouble / maxRowsPerChunk).toInt)
    df.repartition(parts)
  }
}
