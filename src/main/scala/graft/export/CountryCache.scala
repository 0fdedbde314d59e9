package graft.`export`

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed result cache (reference: src/o2agol/pipeline/source.py
  * cache management, :1348-1455 — parquet per
  * country/theme/type/release with a JSON metadata sidecar, plus
  * the column-completeness fallback check at :829-845).
  */
final case class CacheKey(country: String, theme: String, typeName: String, release: String) {
  def relPath: String = s"release=$release/country=$country/theme=$theme/type=$typeName"
}

final class CountryCache(spark: SparkSession, basePath: String) {

  private val fs: FileSystem =
    FileSystem.get(new java.net.URI(basePath), spark.sparkContext.hadoopConfiguration)

  private def dataPath(key: CacheKey) = s"$basePath/${key.relPath}/data.parquet"
  private def metaPath(key: CacheKey) = s"$basePath/${key.relPath}/metadata.json"

  def exists(key: CacheKey): Boolean = fs.exists(new HPath(dataPath(key)))

  /** Write-through cache: parquet + metadata sidecar. */
  def put(key: CacheKey, df: DataFrame, cachedDate: String): Long = {
    df.write.mode("overwrite").parquet(dataPath(key))
    val count = spark.read.parquet(dataPath(key)).count()
    val meta =
      s"""{"country":"${key.country}","theme":"${key.theme}","type":"${key.typeName}",""" +
        s""""release":"${key.release}","features":$count,"cached_at":"$cachedDate"}"""
    val out = fs.create(new HPath(metaPath(key)), true)
    try out.write(meta.getBytes("UTF-8"))
    finally out.close()
    count
  }

  /** Cache read with the reference's column-completeness guard:
    * a hit whose schema lacks expected columns is treated as a miss
    * so the caller falls back to the authoritative source
    * (reference source.py:829-845).
    */
  def getIfComplete(key: CacheKey, expectedColumns: Set[String]): Option[DataFrame] =
    if (!exists(key)) None
    else {
      val df = spark.read.parquet(dataPath(key))
      val missing = expectedColumns -- df.columns.toSet
      if (missing.nonEmpty) None else Some(df)
    }

  /** Enumerate cached entries (reference cli.py:2093 `list_cache`):
    * walks the release/country/theme/type directory tree.
    */
  def list(): Seq[CacheKey] = {
    val base = new HPath(basePath)
    if (!fs.exists(base)) Seq.empty
    else {
      def kids(p: HPath): Seq[HPath] =
        fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toIndexedSeq
      for {
        rel <- kids(base) if rel.getName.startsWith("release=")
        cty <- kids(rel) if cty.getName.startsWith("country=")
        th  <- kids(cty) if th.getName.startsWith("theme=")
        ty  <- kids(th) if ty.getName.startsWith("type=")
        if fs.exists(new HPath(ty, "data.parquet"))
      } yield CacheKey(
        country = cty.getName.stripPrefix("country="),
        theme = th.getName.stripPrefix("theme="),
        typeName = ty.getName.stripPrefix("type="),
        release = rel.getName.stripPrefix("release="))
    }
  }

  /** Drop one cached entry (reference cli.py:2168 `clear_cache`). */
  def clear(key: CacheKey): Boolean =
    fs.delete(new HPath(s"$basePath/${key.relPath}"), true)

  /** cache → fallback compute → write-through (reference
    * `_read_single_layer_with_fallback`, source.py:804-936).
    */
  def readThrough(
      key: CacheKey,
      expectedColumns: Set[String],
      cachedDate: String
  )(compute: => DataFrame): DataFrame =
    getIfComplete(key, expectedColumns).getOrElse {
      val fresh = compute
      put(key, fresh, cachedDate)
      spark.read.parquet(dataPath(key))
    }
}
