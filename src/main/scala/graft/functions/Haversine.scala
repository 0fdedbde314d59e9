package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native great-circle distance (km) between (lat1, lon1) and
  * (lat2, lon2) in degrees — the codegen form of
  * [[graft.operators.Geo.haversineKm]]'s column composition (same
  * formula term order, so results are bit-compatible with the
  * existing C4 oracle convention), and the structural anchor
  * [[graft.plans.GeoRadiusPushdown]] pattern-matches to derive a
  * scan-pushable bounding-box envelope from radius predicates —
  * a composed trig tree has no stable shape to match.
  *
  * Reference behavior anchor: the proximity joins the reference
  * delegates to GeoPandas sjoin_nearest (transform.py:600-633) are
  * distance predicates over WGS84 points; this expression is the
  * engine-native scalar they compile to here.
  */
case class HaversineDistKm(
    lat1: Expression,
    lon1: Expression,
    lat2: Expression,
    lon2: Expression) extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_km requires double inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineDistKm.distKm(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.HaversineDistKm.distKm($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineDistKm =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object HaversineDistKm {

  /** Mean Earth radius (km) — same constant as Geo.EarthRadiusKm. */
  val EarthRadiusKm = 6371.0088

  /** Same term order as Geo.haversineKm / the C4 SQL twin:
    * 2R·asin(√(sin²(Δlat/2) + cos lat1 · cos lat2 · sin²(Δlon/2))).
    */
  def distKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = Math.toRadians(lat2 - lat1) / 2.0
    val dLon = Math.toRadians(lon2 - lon1) / 2.0
    val a = Math.pow(Math.sin(dLat), 2) +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        Math.pow(Math.sin(dLon), 2)
    2.0 * EarthRadiusKm * Math.asin(Math.sqrt(a))
  }
}
