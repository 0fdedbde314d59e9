package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash: h = Σ (31·h + codepoint) mod 1e9+7
  * over the characters of the input string.
  *
  * This is the codegen'd fast path for
  * [[graft.operators.TextOps.fingerprint]]'s semantics: the
  * higher-order `aggregate(split(text, ''), …)` formulation
  * allocates a per-character array and evaluates the lambda
  * interpreted per element; this expression is one tight generated
  * loop over the string's codepoints (identical result).
  *
  * Normalization (lowercase, whitespace collapse) stays outside —
  * compose as `RollingHash(normalized)` — so the hash itself is
  * reusable for shingle/fingerprint variants.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge
  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
