package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class plan node: logical
  * [[AsOfJoinNode]] → [[AsOfJoinStrategy]] → [[AsOfJoinExec]] — the
  * rung-(c) extension path (custom LogicalPlan + SparkStrategy +
  * SparkPlan) beside the repo's native expressions (rung b) and the
  * GeoRadiusPushdown optimizer rule. The composed union+window
  * formulation (operators/AsOfJoin.scala) stays the default; this
  * node exists where the operator's semantics deserve their own
  * physical algorithm: a single streaming MERGE scan per
  * co-partition, no union row inflation, no window-function state —
  * each side is read once in (key, time) order and the probe carries
  * O(1) state (the last preceding reference row).
  *
  * Reference behavior anchor: the latest-record-at-or-before lookup
  * the reference's incremental sync does per feature (pipeline
  * upsert path); semantics identical to AsOfJoin.lastBefore and to
  * DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`.
  *
  * Scale shape: EnsureRequirements gives both children hash
  * exchanges on the key and in-partition sort (key, time) — the
  * exact shape a sort-merge join pays — then the merge is map-side
  * over co-partitions: 100 TB probes stream at scan speed with
  * constant memory; no row is buffered beyond the single held
  * reference row.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinNode]] — registered via
  * [[AsOfJoinNative.install]] (`spark.experimental.extraStrategies`)
  * or `GraftExtensions` (`injectPlannerStrategy`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightTime, n.payload,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Streaming merge-scan as-of join over co-partitioned, (key, time)-
  * sorted children. Left-outer semantics: every left row emits once;
  * the payload is the most recent right row with equal key and
  * time ≤ the left row's time (ties include the right row), null
  * columns when no such row exists. Null join keys never match
  * (SQL equality), null-key right rows are discarded.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && rKeyIdx >= 0 && lTimeIdx >= 0 && rTimeIdx >= 0,
      "as-of join columns must come from the respective child outputs")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val payloadRefs = payload.map { p =>
      val i = right.output.indexWhere(_.exprId == p.exprId)
      require(i >= 0, s"payload ${p.name} must come from the right child")
      BoundReference(i, p.dataType, nullable = true)
    }
    val nPayload = payload.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val payloadProj = UnsafeProjection.create(payloadRefs)
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(nPayload)
      // Like SortMergeJoinExec: the rows this operator hands upward
      // must be UnsafeRow — executeCollect's byte-array RDD and any
      // Exchange directly above cast to it. Project every emitted
      // JoinedRow through the identity UnsafeProjection on `output`.
      val resultProj = UnsafeProjection.create(output, output)
      val rBuf = rIt.buffered
      var held: InternalRow = null // last consumed right row (copied)
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = l.get(lKeyIdx, keyType)
          val lt = l.get(lTimeIdx, timeType)
          // Advance the reference side up to (key, time]; discard
          // null-key AND null-time rows (SQL as-of semantics:
          // `l.t >= r.t` is never true for a null time, so such rows
          // can never match — and nulls sort first, so they'd
          // otherwise NPE the time comparator below).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = r.get(rKeyIdx, keyType)
            if (rk == null || r.get(rTimeIdx, timeType) == null) { rBuf.next(); () }
            else if (lk == null || lt == null) advancing = false
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0 ||
                (c == 0 && timeOrd.compare(r.get(rTimeIdx, timeType), lt) <= 0)) {
                held = rBuf.next().copy()
              } else advancing = false
            }
          }
          // A null left time never satisfies l.t >= r.t: emit the
          // left row unmatched (null payload), mirroring null keys.
          val matched = held != null && lk != null && lt != null && {
            val hk = held.get(rKeyIdx, keyType)
            hk != null && keyOrd.compare(hk, lk) == 0
          }
          resultProj(if (matched) joined(l, payloadProj(held)) else joined(l, nullRow))
        }
      }
    }
  }
}

/** Dataset-API entry for the native as-of join. */
object AsOfJoinNative {

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** Same contract as [[graft.operators.AsOfJoin.lastBefore]]:
    * every left row, plus `payloadCols` of the most recent right
    * row per key at or before the left row's time.
    */
  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def att(pl: LogicalPlan, n: String): Attribute =
      pl.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${pl.output.map(_.name).mkString(", ")}]"))
    val clash = lp.outputSet.intersect(rp.outputSet)
    require(clash.isEmpty,
      s"left and right share attribute ids (${clash.toSeq.map(_.name).mkString(", ")}) — " +
        "alias one side (self-join inputs) before the as-of join")
    val lk = att(lp, leftKey); val rk = att(rp, rightKey)
    val lt = att(lp, leftTime); val rt = att(rp, rightTime)
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType.simpleString} vs ${rk.dataType.simpleString}")
    require(lt.dataType == rt.dataType,
      s"time types differ: ${lt.dataType.simpleString} vs ${rt.dataType.simpleString}")
    GraftBridge.ofRows(spark,
      AsOfJoinNode(lp, rp, lk, rk, lt, rt, payloadCols.map(att(rp, _))))
  }
}
