package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch frequency estimate for a LONG key, codegen'd.
  *
  * Same shipping pattern as [[BloomContainsLong]]: the serialized
  * sketch rides the expression tree, deserializes once per JVM, and
  * generated code calls `estimateCount` directly. A CMS at
  * (eps, confidence) answers point-frequency queries from
  * depth×width counters regardless of vocabulary size — the
  * replacement for a vocabulary-table join once the vocab stops
  * being broadcastable. One-sided error: estimates never
  * undercount, and overcount ≤ eps·N with probability ≥ confidence.
  */
case class CmsCountLong(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(cmsBytes))

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    // Explicit boxing: Janino's autoboxing support is incomplete, and
    // estimateCount takes Object (Long routes to the long-item path,
    // matching how stat.countMinSketch added the keys).
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount(java.lang.Long.valueOf($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsCountLong =
    copy(child = newChild)
}

object CmsCountLong {
  def apply(c: Column, cmsBytes: Array[Byte]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CmsCountLong(GraftBridge.expression(c), cmsBytes))
  }
}
