package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two float-array columns — one loop
  * accumulating dot product and both norms, replacing three
  * interpreted HOF folds on the similarity hot path (candidate-pair
  * scoring dominates the embedding dedup/ANN operators).
  *
  * Arithmetic is EXACTLY the HOF formulation's: float values widened
  * to double, left-to-right sequential accumulation, dot/(√a·√b) —
  * so results (and the SQL oracles built on them) are bit-identical.
  * NativeExprSpec pins this.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Analysis-time contract: both sides array<float|double> — a
    * wrong input is an AnalysisException, not an executor
    * ClassCastException (or silently misread unsafe bytes).
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType

  @transient private lazy val aFloat = isFloat(left)
  @transient private lazy val bFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    def at(arr: ArrayData, isF: Boolean, i: Int): Double =
      if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) { dot += at(a, aFloat, i) * at(b, bFloat, i); i += 1 }
    // separate loops mirror the HOF formulation: dot, normA, normB
    // are three independent sequential folds over each FULL array
    i = 0
    while (i < a.numElements()) { val x = at(a, aFloat, i); na += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = at(b, bFloat, i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
