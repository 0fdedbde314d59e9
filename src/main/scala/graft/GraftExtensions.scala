package graft

import graft.functions.{CharPairs, CosineSim, DeflateLen, JaroWinkler, MinHashSig, RollingHash, WkbCoords, WkbFromXY, WkbGeometryType, WkbLineFromCoords, WkbNumPoints, WkbPathLength, WkbPointXY, WkbRingStats, WkbPolygonFromCoords, ShingleHashes, WinnowStats, WordBigrams}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL surface for graft's native expressions — register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, then:
  *
  * {{{
  *   SELECT graft_rolling_hash(text) FROM documents
  *   SELECT graft_wkb_point(geometry).x FROM features
  *   SELECT graft_wkb_type(geometry) FROM features
  *   SELECT graft_wkb_from_xy(x, y) FROM points
  *   SELECT graft_wkb_line(coords) FROM trajectories
  *   SELECT graft_wkb_polygon(ring) FROM footprints
  *   SELECT graft_wkb_coords(geometry) FROM features
  *   SELECT graft_wkb_num_points(geometry) FROM features
  *   SELECT graft_wkb_path_length(geometry) FROM features
  *   SELECT graft_wkb_ring_stats(geometry).area FROM features
  *   SELECT graft_cosine(vec_a, vec_b) FROM pairs
  *   SELECT graft_word_bigrams(text) FROM documents
  *   SELECT graft_char_pairs(text) FROM documents
  *   SELECT graft_minhash(text, 3, 32, 42) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rules (see graft.plans): radius-predicate → pushable
    // bbox envelope (soundness-gated; plans/GeoRadiusPushdown.scala).
    ext.injectOptimizerRule(_ => graft.plans.GeoRadiusPushdown)
    // Planner strategies: the native as-of join physical operator
    // (plans/AsOfJoinNative.scala).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DeflateLen(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_point"),
      new ExpressionInfo(classOf[WkbPointXY].getName, "graft_wkb_point"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WkbPointXY(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_type"),
      new ExpressionInfo(classOf[WkbGeometryType].getName, "graft_wkb_type"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WkbGeometryType(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_from_xy"),
      new ExpressionInfo(classOf[WkbFromXY].getName, "graft_wkb_from_xy"),
      (children: Seq[Expression]) => WkbFromXY(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_line"),
      new ExpressionInfo(classOf[WkbLineFromCoords].getName, "graft_wkb_line"),
      (children: Seq[Expression]) => WkbLineFromCoords(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_polygon"),
      new ExpressionInfo(classOf[WkbPolygonFromCoords].getName, "graft_wkb_polygon"),
      (children: Seq[Expression]) => WkbPolygonFromCoords(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_coords"),
      new ExpressionInfo(classOf[WkbCoords].getName, "graft_wkb_coords"),
      (children: Seq[Expression]) => WkbCoords(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_num_points"),
      new ExpressionInfo(classOf[WkbNumPoints].getName, "graft_wkb_num_points"),
      (children: Seq[Expression]) => WkbNumPoints(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_path_length"),
      new ExpressionInfo(classOf[WkbPathLength].getName, "graft_wkb_path_length"),
      (children: Seq[Expression]) => WkbPathLength(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_wkb_ring_stats"),
      new ExpressionInfo(classOf[WkbRingStats].getName, "graft_wkb_ring_stats"),
      (children: Seq[Expression]) => WkbRingStats(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_word_bigrams"),
      (children: Seq[Expression]) => WordBigrams(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_char_pairs"),
      new ExpressionInfo(classOf[CharPairs].getName, "graft_char_pairs"),
      (children: Seq[Expression]) => CharPairs(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash $name must be an integer literal, got $other")
        }
        MinHashSig(children(0),
          n = intArg(children(1), "n"),
          k = intArg(children(2), "k"),
          seed = intArg(children(3), "seed").toLong)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_stats"),
      new ExpressionInfo(classOf[WinnowStats].getName, "graft_winnow_stats"),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_winnow_stats $name must be an integer literal, got $other")
        }
        WinnowStats(children(0),
          k = intArg(children(1), "k"),
          w = intArg(children(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hashes k must be an integer literal, got $other")
        }
        ShingleHashes(children(0), k)
      }))
  }
}
