package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram xxhash64 values of the normalized
  * (lowercased, whitespace-split) text, first-occurrence order —
  * bit-for-bit the HOF formulation
  * `transform(Dedup.shingles(text, n), s => xxhash64(s))`
  * (dedup is by shingle STRING, exactly as `array_distinct` does
  * there; the hash is Spark's `xxhash64` — seed 42 over UTF-8
  * bytes).
  *
  * The HOF chain (split → sequence → slice → concat_ws under an
  * interpreted lambda, then array_distinct) costs ~4 s for 5 k docs
  * at sf0.1; this is one generated loop with a reused StringBuilder
  * — the shingling path stops being the cost of every dedup /
  * decontamination query built on it.
  */
case class NgramXxHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"NgramXxHashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramXxHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramXxHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramXxHashes =
    copy(child = newChild)
}

object NgramXxHashes {

  /** Tokenization shared with [[WordBigrams]] — identical to the SQL
    * formulation `split(lower(trim(s)), "\s+")`. Pre-compiled
    * pattern: `String.split("\\s+", -1)` recompiles the regex per
    * call, a per-ROW compile in an expression hot path.
    */
  private[functions] val Whitespace = java.util.regex.Pattern.compile("\\s+")

  private[functions] def wsTokens(text: UTF8String): Array[String] =
    Whitespace.split(text.trim().toLowerCase.toString, -1)

  /** Same byte hashing `xxhash64(string)` performs (seed 42). */
  private def xxh64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = wsTokens(text)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.HashSet[String]()
      val out = new java.util.ArrayList[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val s = sb.toString
        if (seen.add(s)) out.add(java.lang.Long.valueOf(xxh64(s)))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NgramXxHashes(GraftBridge.expression(c), n))
  }
}
