package graft

import graft.functions.{RollingHash, WkbGeometryType, WkbPointXY}
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
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head)))
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
  }
}
