package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-character-pair generator: every 2-character
  * substring of the input, in order — identical to the HOF
  * `transform(sequence(1, length-1), i -> substr(i, 2))`
  * formulation (spec-pinned), but one tight codegen'd pass instead
  * of per-position interpreted lambdas each re-slicing the string.
  * This sits on the explode hot path of the BPE pair statistics:
  * the HOF form held a bench top-10 slot (1.77 s), this drops it to
  * scan-cost.
  */
case class CharPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}

object CharPairs {

  def compute(text: UTF8String): ArrayData = {
    val n = text.numChars()
    if (n < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        // Character-based slicing, matching SQL substring semantics.
        out(i) = text.substringSQL(i + 1, 2)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CharPairs(GraftBridge.expression(c)))
  }
}
