package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing (MOSS) fingerprint statistics as ONE doc-local pass:
  * k-token-shingle polynomial hashes (the [[RollingHash]] fold over
  * the space-joined shingle — bit-identical to
  * `RollingHash(concat_ws(' ', tokens...))`), a w-wide sliding
  * window minimum with the standard rightmost-min tie rule, and the
  * dedupe of consecutive re-selections.
  *
  * Winnowing is embarrassingly parallel per document — the composed
  * DataFrame formulation (transform + posexplode + per-doc window +
  * distinct) pays an interpreted HOF per shingle AND a corpus-sized
  * exchange to re-key the window, both pure waste at 100 TB. This
  * expression keeps the whole computation inside whole-stage codegen
  * on the scan: zero exchanges.
  *
  * Tie rule correctness without key packing: the scan compares
  * (hash, position) with LARGER position winning ties, which is
  * exactly the h·2²¹ + (2²¹−1−pos) packed-key ordering of the
  * composed form — but with no 2²¹ position bound. Dedupe by
  * adjacent-change is exact: once the window minimum moves to a
  * later-entering smaller key, the displaced key is dropped from the
  * window before the new one, so a selection can never recur after
  * an intervening different selection.
  */
object Winnow {

  private val P = 1000000007L

  /** All k-shingle hashes of the space-split token sequence, one
    * tight loop — the RollingHash fold over each space-joined
    * shingle, no per-shingle string allocation.
    */
  def shingleHashArray(toks: Array[String], k: Int): Array[Long] = {
    val nG = toks.length - k + 1
    if (nG <= 0) return Array.empty[Long]
    val hs = new Array[Long](nG)
    var i = 0
    while (i < nG) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * 31 + ' ') % P
        val t = toks(i + j)
        var c = 0
        while (c < t.length) {
          val cp = t.codePointAt(c)
          h = (h * 31 + cp) % P
          c += Character.charCount(cp)
        }
        j += 1
      }
      hs(i) = h
      i += 1
    }
    hs
  }

  /** Array-typed entry point for [[ShingleHashes]]. */
  def shingleHashes(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleHashArray(text.toString.split(" ", -1), k))

  /** Returns (n_fp, min_fp, max_fp) over the deduped selected
    * shingle hashes, or null when the document has fewer than
    * k + w − 1 tokens (no full window). Tokens split on single
    * spaces, empties kept — identical to `split(text, ' ')`.
    */
  def stats(text: UTF8String, k: Int, w: Int): InternalRow = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val nG = toks.length - k + 1
    if (nG < w) return null
    val hs = shingleHashArray(toks, k)
    var nFp = 0L
    var minFp = Long.MaxValue
    var maxFp = Long.MinValue
    var lastPos = -1
    var p = w - 1
    while (p < nG) {
      // min over [p-w+1, p], rightmost wins ties
      var bestPos = p - w + 1
      var q = bestPos + 1
      while (q <= p) {
        if (hs(q) <= hs(bestPos)) bestPos = q
        q += 1
      }
      if (bestPos != lastPos) {
        lastPos = bestPos
        nFp += 1
        val h = hs(bestPos)
        if (h < minFp) minFp = h
        if (h > maxFp) maxFp = h
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](nFp, minFp, maxFp))
  }
}

/** `WinnowStats(text, k, w)` — see [[Winnow.stats]]. */
case class WinnowStats(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType),
    StructField("min_fp", LongType),
    StructField("max_fp", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Winnow.stats(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.Winnow.stats($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

object WinnowStats {
  def apply(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowStats(GraftBridge.expression(c), k, w))
}

/** `ShingleHashes(text, k)` — all k-token-shingle RollingHash values
  * as `array<bigint>` in one codegen pass (empty array below k
  * tokens). The native replacement for the interpreted
  * `transform(sequence(...), i -> RollingHash(concat_ws(...)))`
  * composition, which re-allocates a shingle string per position and
  * evaluates its lambda interpreted (HOFs are CodegenFallback).
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"k must be positive: $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.shingleHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), k))
}
