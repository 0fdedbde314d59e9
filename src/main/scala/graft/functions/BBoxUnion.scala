package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounding box accumulator value. */
final case class BBoxAcc(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

/** Typed `Aggregator` computing the union bounding box of a point
  * set — the `total_bounds` the reference stamps into cache
  * metadata (reference: src/o2agol/pipeline/source.py:1454),
  * expressed through Spark's typed aggregation API (merge-able
  * partial states → map-side combine like any built-in agg).
  */
object BBoxUnion extends Aggregator[(Double, Double), BBoxAcc, BBoxAcc] {

  override def zero: BBoxAcc =
    BBoxAcc(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)

  override def reduce(b: BBoxAcc, p: (Double, Double)): BBoxAcc =
    BBoxAcc(math.min(b.xmin, p._1), math.min(b.ymin, p._2),
      math.max(b.xmax, p._1), math.max(b.ymax, p._2))

  override def merge(a: BBoxAcc, b: BBoxAcc): BBoxAcc =
    BBoxAcc(math.min(a.xmin, b.xmin), math.min(a.ymin, b.ymin),
      math.max(a.xmax, b.xmax), math.max(a.ymax, b.ymax))

  override def finish(r: BBoxAcc): BBoxAcc = r

  override def bufferEncoder: Encoder[BBoxAcc] = Encoders.product[BBoxAcc]
  override def outputEncoder: Encoder[BBoxAcc] = Encoders.product[BBoxAcc]

  /** Untyped column form for `groupBy(...).agg(...)`. */
  def column(x: Column, y: Column): Column = {
    val f = udaf(BBoxUnion, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    f(x, y)
  }
}
