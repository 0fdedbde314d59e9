package graft.export

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for parquet output directories — the lake
  * hygiene step a 100 TB pipeline runs after incremental writes
  * (A15) have accreted many small files: a scan of 50k 2 MB files
  * pays 50k open/footer reads and schedules 50k splits where ~100
  * right-sized files would do.
  *
  * The file-count plan comes from the ACTUAL on-disk byte total (FS
  * listing, driver-side metadata only — no data read), divided by
  * the target file size. Shrinking uses `coalesce` — a NARROW
  * dependency that merges existing partitions without any exchange,
  * so compaction costs one read + one write and zero shuffles;
  * growing (splitting oversized files) needs a round-robin
  * `repartition`, the one case where the exchange is the point.
  *
  * Hive-partitioned layouts (`k=v` path segments) are REFUSED, not
  * flattened: `spark.read.parquet` would lift the partition dirs
  * into inferred (re-typed) columns and the rewrite would emit one
  * flat directory — silently breaking downstream partition pruning
  * and rewriting string partition values ("007" → 7). Partitioned
  * compaction is a per-partition loop of this operator by design.
  */
object Compactor {

  /** One recursive listing: (visible data files, total bytes).
    * Hidden/metadata entries (`_SUCCESS`, `.crc`) are skipped at
    * every path depth.
    */
  private def listData(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1
        total += f.getLen
      }
    }
    (n, total)
  }

  /** Relative `k=v` path segments between `dir` and its data files —
    * non-empty means a Hive-partitioned layout.
    */
  private def partitionSegments(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toString
    val it = fs.listFiles(p, true)
    val segs = scala.collection.mutable.LinkedHashSet.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(base).stripPrefix("/")
      rel.split('/').dropRight(1).foreach { s =>
        if (s.contains('=') && !s.startsWith("_") && !s.startsWith(".")) segs += s
      }
    }
    segs.toSeq
  }

  /** Total bytes of visible data files under `dir` (recursive). */
  def dataBytes(spark: SparkSession, dir: String): Long =
    listData(spark, dir)._2

  /** Number of visible data files under `dir`. */
  def dataFileCount(spark: SparkSession, dir: String): Int =
    listData(spark, dir)._1

  /** Files the byte total warrants at `targetBytes` per file. */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    require(n <= Int.MaxValue,
      s"$totalBytes bytes at $targetBytes/file plans $n files — over Int range; raise targetBytes")
    n.toInt
  }

  /** Rewrite the parquet dir at `inDir` to `outDir` with the planned
    * file count; returns (planned files, input files). `outDir` must
    * differ from `inDir` — compact-in-place would delete the source
    * before the lazy read job runs (the guard compares FULLY
    * QUALIFIED paths: scheme + authority + absolute path, so a
    * relative spelling of the same directory cannot slip past it,
    * and same-path dirs on different stores don't false-positive).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String): String = {
      val p = new Path(d)
      p.getFileSystem(conf).makeQualified(p).toString
    }
    require(qualified(inDir) != qualified(outDir),
      "compact() writes beside the source, never over it")
    val parts = partitionSegments(spark, inDir)
    require(parts.isEmpty,
      s"$inDir is Hive-partitioned (${parts.take(3).mkString(", ")}…) — " +
        "compact each partition dir separately; a flat rewrite would drop the layout")
    val (inFiles, totalBytes) = listData(spark, inDir)
    val n = planFileCount(totalBytes, targetBytes)
    val df = spark.read.parquet(inDir)
    val sized: DataFrame =
      if (n < inFiles) df.coalesce(n) // narrow: no exchange
      else if (n > inFiles) df.repartition(n) // splitting: exchange intended
      else df
    sized.write.mode("overwrite").parquet(outDir)
    (n, inFiles)
  }
}
