package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-bigram generator: `split(lower(trim(text)), "\s+")`
  * then each consecutive token pair joined by one space — identical
  * to the HOF `transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, 2)))` formulation, but one tight codegen'd loop
  * instead of per-element interpreted lambdas (this sits on the
  * explode hot path of the corpus bigram statistics).
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordBigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordBigrams.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object WordBigrams {

  def compute(text: UTF8String): ArrayData = {
    val toks = NgramXxHashes.wsTokens(text)
    if (toks.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - 1)
      var i = 0
      while (i < toks.length - 1) {
        out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WordBigrams(GraftBridge.expression(c)))
  }
}
