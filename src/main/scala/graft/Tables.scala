package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalog over the driver-generated parquet tables in an sf dir.
  *
  * Mirrors the reference's source-registry role
  * (reference: src/o2agol/pipeline/source.py:383-395 — parquet URL
  * construction per theme/type): here every table is a parquet
  * path under one scale-factor directory; reads are plain
  * `spark.read.parquet` so Catalyst owns pushdown and pruning.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `ts` is written as parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as an
    * epoch-nano long which we truncate to microseconds — the same
    * truncation DuckDB applies, keeping oracle comparisons exact.
    */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
