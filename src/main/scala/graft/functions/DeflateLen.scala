package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE-compressed length of a string's UTF-8 bytes — the
  * compression-ratio quality signal (Gopher/Dolma-style): highly
  * repetitive or templated text compresses far below natural prose,
  * and `deflate_len/byte_len` is the standard cheap detector for it.
  *
  * Deterministic for a fixed input on a given JVM (fixed level 6,
  * raw stream, default strategy) but NOT a cross-engine closed form
  * — the zlib bitstream is implementation-defined — so the registry
  * row is declared `no_oracle` with a ScalaTest error-model spec
  * (repetitive ≪ shuffled-natural, bounds, determinism), the same
  * protocol as the sketch rows.
  *
  * Codegen calls the static helper below (compression dominates the
  * per-row cost; the call itself is negligible) so the expression
  * stays inside WholeStageCodegen rather than forcing fallback.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      DeflateLen.deflatedLength(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLen.deflatedLength($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Raw-DEFLATE length at level 6; allocation-light (one reusable
    * scratch buffer per call — Deflater is not thread-safe, so no
    * sharing across rows on different tasks; an 8 KiB chunk loop
    * keeps memory flat for multi-MB documents).
    */
  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  import org.apache.spark.sql.GraftBridge
  def apply(c: Column): Column =
    GraftBridge.column(DeflateLen(GraftBridge.expression(c)))
}
