package graft.plans

import graft.functions.HaversineDistKm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: radius-search predicates over
  * [[HaversineDistKm]] gain a conjunctive bounding-box envelope on
  * the raw coordinate expressions — `dist(lat, lon, C) < r` implies
  * `lat ∈ [latC ± Δlat]` and `lon ∈ [lonC ± Δlon]`, and THOSE are
  * plain range predicates Catalyst can push into the parquet scan
  * (row-group stats skipping) where the trig expression never could.
  * The Spark-first version of a spatial index probe: at 100 TB a
  * radius query prunes row groups instead of evaluating trig on
  * every row. The original predicate stays — the envelope is a
  * necessary condition only — so results are untouched.
  *
  * SOUNDNESS: haversine is 360°-periodic in both arguments, so for
  * arbitrary doubles a range envelope is simply wrong — a point at
  * lonC+360 is zero distance away but outside any window (a live
  * failure mode: this repo's synthetic sf0.1 longitudes run past
  * 420° and DID wrap). The rule therefore derives each bound ONLY
  * from facts the filter itself already states:
  *
  *   - lat band (latC ± deg(r/R)): emitted only when sibling
  *     conjuncts bound the lat expression within [-90°, 90°] — that
  *     makes the metric term cos·cos non-negative, so
  *     dist ≥ R·|Δlat| holds and the band is implied.
  *   - lon window (lonC ± Δlon, Δlon = 2·asin(sin(r/2R)/√(cos φmax
  *     · cos latC)) — the exact inversion of the haversine lon term
  *     at the band's worst latitude φmax): emitted only when sibling
  *     conjuncts bound the lon expression inside
  *     [lonC − 360° + Δlon, lonC + 360° − Δlon], which proves no
  *     wrap image of any admissible point can re-enter the radius.
  *
  * The validity-gate conjuncts the bounds key on (`lat BETWEEN -90
  * AND 90 AND lon BETWEEN -180 AND 180`) are exactly the EPSG:4326
  * normalization the reference enforces on every input
  * (transform.py:259-260 to_crs(4326)) — a normalized pipeline
  * already writes them; an unnormalized one gets no envelope and no
  * wrong answers. Both bounds are widened 1e-7 relative for FP
  * safety; the lon window is skipped when the lat band reaches a
  * pole or the inversion has no solution.
  *
  * Install on any session via [[GeoRadiusPushdown.install]]
  * (`spark.experimental.extraOptimizations`, idempotent) or through
  * `graft.GraftExtensions` (`injectOptimizerRule`). Idempotent under
  * the optimizer's fixed-point loop: conjuncts already present
  * (semantically) are never re-added.
  */
object GeoRadiusPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val Margin = 1.0000001

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(GeoRadiusPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GeoRadiusPushdown
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts
        .flatMap(envelope(_, conjuncts))
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        // Dedup within the new batch too (two radius predicates can
        // imply the same bound).
        .foldLeft(Seq.empty[Expression]) { (acc, e) =>
          if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
        }
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduceLeft(And), child)
  }

  /** The envelope conjuncts implied by one radius predicate, if the
    * predicate has the supported shape (distance-to-literal-center
    * compared below a literal radius, either operand order, data
    * coordinates on either side of the distance call).
    */
  private def envelope(p: Expression, siblings: Seq[Expression]): Seq[Expression] = p match {
    case LessThan(h: HaversineDistKm, Literal(r: Double, DoubleType)) => bounds(h, r, siblings)
    case LessThanOrEqual(h: HaversineDistKm, Literal(r: Double, DoubleType)) => bounds(h, r, siblings)
    case GreaterThan(Literal(r: Double, DoubleType), h: HaversineDistKm) => bounds(h, r, siblings)
    case GreaterThanOrEqual(Literal(r: Double, DoubleType), h: HaversineDistKm) => bounds(h, r, siblings)
    case _ => Nil
  }

  private def bounds(h: HaversineDistKm, r: Double, siblings: Seq[Expression]): Seq[Expression] = {
    if (!(r > 0) || r.isNaN) return Nil // non-positive/NaN radius: nothing to bound
    (h.lat1, h.lon1, h.lat2, h.lon2) match {
      case (Literal(latC: Double, DoubleType), Literal(lonC: Double, DoubleType), lat, lon) =>
        box(lat, lon, latC, lonC, r, siblings)
      case (lat, lon, Literal(latC: Double, DoubleType), Literal(lonC: Double, DoubleType)) =>
        box(lat, lon, latC, lonC, r, siblings)
      case _ => Nil
    }
  }

  /** [min, max] stated for `e` by the sibling conjuncts, if both
    * sides are stated (literal on either operand side; strict and
    * non-strict alike — only the weaker non-strict fact is used).
    */
  private def statedRange(e: Expression, siblings: Seq[Expression]): Option[(Double, Double)] = {
    val lowers = siblings.collect {
      case GreaterThanOrEqual(x, Literal(d: Double, DoubleType)) if x.semanticEquals(e) => d
      case GreaterThan(x, Literal(d: Double, DoubleType)) if x.semanticEquals(e) => d
      case LessThanOrEqual(Literal(d: Double, DoubleType), x) if x.semanticEquals(e) => d
      case LessThan(Literal(d: Double, DoubleType), x) if x.semanticEquals(e) => d
    }
    val uppers = siblings.collect {
      case LessThanOrEqual(x, Literal(d: Double, DoubleType)) if x.semanticEquals(e) => d
      case LessThan(x, Literal(d: Double, DoubleType)) if x.semanticEquals(e) => d
      case GreaterThanOrEqual(Literal(d: Double, DoubleType), x) if x.semanticEquals(e) => d
      case GreaterThan(Literal(d: Double, DoubleType), x) if x.semanticEquals(e) => d
    }
    if (lowers.isEmpty || uppers.isEmpty) None
    else Some((lowers.max, uppers.min))
  }

  private def box(
      lat: Expression, lon: Expression,
      latC: Double, lonC: Double, r: Double,
      siblings: Seq[Expression]): Seq[Expression] = {
    if (latC.isNaN || lonC.isNaN) return Nil
    if (math.abs(latC) > 90.0 || math.abs(lonC) > 180.0) return Nil
    // The lat band is implied only on the non-wrapped sphere: the
    // filter must already state lat ∈ [-90, 90].
    val latValid = statedRange(lat, siblings)
      .exists { case (lo, hi) => lo >= -90.0 && hi <= 90.0 }
    if (!latValid) return Nil
    val dLat = Math.toDegrees(r / HaversineDistKm.EarthRadiusKm) * Margin
    val latBand = Seq(
      GreaterThanOrEqual(lat, Literal(latC - dLat)),
      LessThanOrEqual(lat, Literal(latC + dLat)))
    val phiMax = Math.min(Math.abs(latC) + dLat, 90.0)
    if (phiMax >= 89.9) return latBand // band reaches a pole: lon unbounded
    // Exact lon-term inversion at the band's worst latitude:
    // |sin(Δlon/2)| ≤ sin(r/2R)/√(cos φmax · cos latC).
    val q = Math.sin(r / (2.0 * HaversineDistKm.EarthRadiusKm)) /
      Math.sqrt(Math.cos(Math.toRadians(phiMax)) * Math.cos(Math.toRadians(latC)))
    if (!(q < 0.99999)) return latBand // inversion unbounded
    val dLon = 2.0 * Math.toDegrees(Math.asin(q)) * Margin
    // No-wrap proof: every admissible lon must sit inside
    // [lonC - 360 + Δlon, lonC + 360 - Δlon], else a wrap image
    // could re-enter the radius outside the window.
    val lonSafe = statedRange(lon, siblings).exists { case (lo, hi) =>
      lo >= lonC - 360.0 + dLon && hi <= lonC + 360.0 - dLon
    }
    if (!lonSafe) latBand
    else latBand ++ Seq(
      GreaterThanOrEqual(lon, Literal(lonC - dLon)),
      LessThanOrEqual(lon, Literal(lonC + dLon)))
  }
}
