package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** RAKE candidate-phrase occurrences of one document as a single
  * map-side pass: maximal stopword-free token runs, each emitted as
  * (phrase = run joined by ' ', plen = run length). Replaces the
  * G26 gaps-and-islands formulation — posexplode of EVERY corpus
  * token, a per-doc `row_number` window (one corpus-sized exchange +
  * sort at any scale) and a (doc, grp) aggregate (a second corpus
  * exchange) — with zero exchanges before the vocabulary-bounded
  * phrase/word rollups.
  *
  * Semantics are IDENTICAL row-for-row to the window formulation:
  *   - tokens: `split(lower(trim(text)), "\s+")` (the
  *     MinHashSig/NgramXxHashes tokenization);
  *   - a token is a stopword iff it equals a list entry exactly
  *     (`isInCollection` on the lowercased token);
  *   - islands: consecutive non-stopword positions — exactly the
  *     `pos − row_number() over (partition by doc order by pos)`
  *     grouping — i.e. runs split at stopwords;
  *   - per island one row: tokens in position order joined by a
  *     single space (the sort_array(collect_list(struct(pos, tok)))
  *     join) and the run length as plen (`count(*)`).
  *
  * Null text → null (the source column is non-null in practice).
  */
case class RakePhrases(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("phrase", StringType, nullable = false),
      StructField("plen", LongType, nullable = false))),
    containsNull = false)

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    RakePhrases.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("rakeStops", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RakePhrases.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RakePhrases =
    copy(child = newChild)
}

object RakePhrases {

  def compute(text: UTF8String, stops: java.util.HashSet[String]): ArrayData = {
    val toks = NgramXxHashes.wsTokens(text)
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder()
    var runLen = 0L
    def flush(): Unit = if (runLen > 0) {
      out.add(new GenericInternalRow(Array[Any](
        UTF8String.fromString(sb.toString), java.lang.Long.valueOf(runLen))))
      sb.setLength(0)
      runLen = 0L
    }
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (stops.contains(t)) flush()
      else {
        if (runLen > 0) sb.append(' ')
        sb.append(t)
        runLen += 1
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RakePhrases(GraftBridge.expression(c), stopwords))
  }
}
