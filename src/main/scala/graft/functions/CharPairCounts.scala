package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Doc-local adjacent-character-pair counts: `(pair, n)` structs,
  * one per DISTINCT pair of the document — the map-side-combine
  * half of a corpus pair count done inside the expression. Versus
  * exploding every position ([[CharPairs]]), the downstream
  * aggregate sees one row per distinct pair per doc (~2-3× fewer
  * rows, and the per-position UTF8String allocations collapse to
  * one per distinct pair), which is what makes the corpus-wide BPE
  * pair statistics scan-bound. One tight per-doc char loop over a
  * small open-addressed code table; order of emitted structs is
  * insertion order (first occurrence) — irrelevant downstream of
  * the SUM.
  */
case class CharPairCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pair", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharPairCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharPairCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharPairCounts =
    copy(child = newChild)
}

object CharPairCounts {

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // BMP pair code -> count; insertion-ordered for determinism.
    val counts = new java.util.LinkedHashMap[Integer, java.lang.Long](64)
    var i = 0
    while (i < n - 1) {
      val code = Integer.valueOf((s.charAt(i) << 16) | s.charAt(i + 1))
      val prev = counts.get(code)
      counts.put(code, if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val code = e.getKey.intValue()
      val pair = new String(Array(((code >> 16) & 0xFFFF).toChar, (code & 0xFFFF).toChar))
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(pair), e.getValue.longValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CharPairCounts(GraftBridge.expression(c)))
  }
}
