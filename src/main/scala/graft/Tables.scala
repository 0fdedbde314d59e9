package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  def events: DataFrame = Tables.normalizeTs(table("events"))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {

  /** Normalize the `ts` column to session-zone TIMESTAMP whatever
    * physical type the driver's generator wrote it as. The testdata
    * has shipped with two encodings across rounds:
    *   - TIMESTAMP(NANOS) → epoch-nano LONG under
    *     `spark.sql.legacy.parquet.nanosAsLong`, truncated here to
    *     micros (the same truncation DuckDB applies);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ,
    *     reinterpreted as UTC wall time (sessions run UTC, so the
    *     instant — and every oracle comparison — is unchanged).
    * Dispatching on the observed schema instead of pinning one
    * encoding keeps every events-derived query working when the
    * generator changes, instead of failing 59-wide as in round 7.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(s"unexpected $colName type: $other")
    }

  /** Epoch-microseconds expression over a RAW (un-normalized) ts
    * column, dispatched the same way as [[normalizeTs]] — for code
    * that must predicate on the original column without rewriting
    * it (e.g. staging files in their source encoding).
    */
  def tsMicrosExpr(dt: org.apache.spark.sql.types.DataType, c: Column): Column = dt match {
    // INTEGRAL division: `c / 1000` is double math, and epoch nanos
    // (~1.7e18) exceed double's 2^53 integer precision — the lossy
    // quotient truncates to M-1 for about half of all micro-aligned
    // values. SQL `div` (IntegralDivide) is exact.
    case LongType          => call_function("div", c, lit(1000L))
    case TimestampNTZType  => unix_micros(c.cast(TimestampType))
    case TimestampType     => unix_micros(c)
    case other =>
      throw new IllegalStateException(s"unexpected ts type: $other")
  }

  /** Epoch-micros bound as a literal of the raw ts column's OWN
    * physical type, so `ts >= bound` stays a plain column-vs-literal
    * comparison parquet row-group stats can prune — wrapping the
    * column in a conversion instead would defeat pushdown.
    */
  def tsBoundLit(dt: org.apache.spark.sql.types.DataType, us: Long): Column = dt match {
    case LongType         => lit(us * 1000L) // nanos encoding
    case TimestampNTZType => lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))
    case TimestampType    => lit(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case other =>
      throw new IllegalStateException(s"unexpected ts type: $other")
  }
}
