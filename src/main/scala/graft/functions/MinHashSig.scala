package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: one tight loop from text to the k-long
  * signature, replacing the interpreted HOF pipeline
  * (`transform`/`aggregate`/`zip_with` lambdas do not participate in
  * codegen and allocate a k-array per shingle).
  *
  * Semantics are IDENTICAL to
  * `Dedup.minhashFromHashes(Dedup.shingleHashes(text, n), k, seed)`
  * and to the DuckDB oracle SQL:
  *   - tokens: `split(lower(trim(text)), "\s+")` (SQL trim = ASCII
  *     space only; Java regex split, no limit);
  *   - shingles: distinct word n-grams joined by a single space;
  *     fewer than n tokens → empty set;
  *   - shingle hash: polynomial rolling hash (h·31 + codepoint)
  *     mod 1e9+7 — [[RollingHash]]'s exact semantics;
  *   - signature: min over shingles of (a_i·h + b_i) mod P for the k
  *     seeded permutations; empty set → all-P sentinel.
  *
  * Codegen emits a call to [[MinHashSig.compute]] — the loop itself is
  * a single JIT-friendly static method, and the expression stays
  * inside whole-stage codegen (no CodegenFallback).
  */
case class MinHashSig(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val perms: (Array[Long], Array[Long]) = {
    val ps = graft.operators.Dedup.permutations(k, seed)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, perms._1, perms._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", perms._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", perms._2, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $n, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val P = 2147483647L
  private val M = 1000000007L

  /** Rolling hash of s[from..until) with an implicit single space
    * between tokens — equal to RollingHash of the space-joined
    * n-gram without materializing the joined string.
    */
  def compute(text: UTF8String, n: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)

    // SQL-trim (ASCII space only) + lower, then Java-regex \s+ split.
    val toks: Array[String] = text.trim().toLowerCase.toString.split("\\s+", -1)
    if (toks.length >= n) {
      // Distinct n-gram rolling hashes. The hash of "t0 t1 t2" is
      // folded token-by-token with a 0x20 separator — identical to
      // hashing the concat_ws(" ", …) string. Distinctness is on the
      // JOINED STRING (array_distinct semantics), tracked via a set of
      // the joined n-grams; hash-set of the 61-bit (hash, len) pair is
      // NOT enough because mod-1e9+7 collisions would drop real
      // shingles that array_distinct keeps. n-grams are short; the
      // set holds at most tokens-n+1 small strings per row.
      val seen = new java.util.HashSet[String]()
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
        val gram = sb.toString
        if (seen.add(gram)) {
          var h = 0L
          var ci = 0
          while (ci < gram.length) {
            val cp = gram.codePointAt(ci)
            h = (h * 31L + cp) % M
            ci += Character.charCount(cp)
          }
          var p = 0
          while (p < k) {
            val v = (a(p) * h + b(p)) % P
            if (v < sig(p)) sig(p) = v
            p += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  def apply(c: Column, n: Int, k: Int, seed: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), n, k, seed))
  }
}
