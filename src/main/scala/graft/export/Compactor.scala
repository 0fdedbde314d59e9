package graft.export

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for parquet output directories — the lake
  * hygiene step a 100 TB pipeline runs after incremental/partitioned
  * writes (A15/H10) have accreted many small files: a scan of 50k
  * 2 MB files pays 50k open/footer reads and schedules 50k splits
  * where ~100 right-sized files would do.
  *
  * The file-count plan comes from the ACTUAL on-disk byte total (FS
  * listing, driver-side metadata only — no data read), divided by
  * the target file size. Shrinking uses `coalesce` — a NARROW
  * dependency that merges existing partitions without any exchange,
  * so compaction costs one read + one write and zero shuffles;
  * growing (splitting oversized files) needs a round-robin
  * `repartition`, the one case where the exchange is the point.
  */
object Compactor {

  /** Total bytes of visible data files under `dir` (recursive;
    * skips hidden/_-prefixed metadata like _SUCCESS and .crc).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Number of visible data files under `dir`. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Files the byte total warrants at `targetBytes` per file. */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet dir at `inDir` to `outDir` with the planned
    * file count; returns (planned files, input files). `outDir` must
    * differ from `inDir` — compact-in-place would read and clobber
    * the same files (rename over the source only after the write
    * commits, which is the caller's move).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(
      new Path(inDir).toUri.getPath != new Path(outDir).toUri.getPath,
      "compact() writes beside the source, never over it")
    val inFiles = dataFileCount(spark, inDir)
    val n = planFileCount(dataBytes(spark, inDir), targetBytes)
    val df = spark.read.parquet(inDir)
    val sized: DataFrame =
      if (n < inFiles) df.coalesce(n) // narrow: no exchange
      else if (n > inFiles) df.repartition(n) // splitting: exchange intended
      else df
    sized.write.mode("overwrite").parquet(outDir)
    (n, inFiles)
  }
}
