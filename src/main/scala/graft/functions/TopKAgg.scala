package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k (value, payload) pairs per group as a
  * `TypedImperativeAggregate`: each partial state is a size-k
  * min-heap, merged map-side before the shuffle — so a top-10-per-
  * key over 100 TB shuffles at most k rows per (mapper, key) and
  * never sorts whole partitions, unlike the
  * `row_number().over(window)` formulation which sorts every
  * partition end-to-end.
  *
  * Result: array<struct<ord double, payload long>> sorted
  * descending by ord, ties broken by ascending payload (stable,
  * engine-reproducible).
  */
case class TopKAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  // Min-heap by (ord asc, payload desc): the head is the WORST kept
  // entry, evicted first when a better candidate arrives.
  private val heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (o, p) => (-o, p) }

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("payload", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](heapOrdering)

  private def offer(
      heap: scala.collection.mutable.PriorityQueue[(Double, Long)],
      entry: (Double, Long)
  ): Unit = {
    if (heap.size < k) heap.enqueue(entry)
    else {
      // head = worst kept; replace when the candidate beats it under
      // (ord desc, payload asc)
      val worst = heap.head
      val better = entry._1 > worst._1 || (entry._1 == worst._1 && entry._2 < worst._2)
      if (better) { heap.dequeue(); heap.enqueue(entry) }
    }
  }

  override def update(
      heap: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow
  ): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      offer(heap, (o.asInstanceOf[Double], p.asInstanceOf[Long]))
    heap
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[(Double, Long)],
      b: scala.collection.mutable.PriorityQueue[(Double, Long)]
  ): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(heap: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = heap.toArray.sortBy { case (o, p) => (-o, p) }
    new GenericArrayData(sorted.map { case (o, p) => InternalRow(o, p) })
  }

  override def serialize(heap: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + heap.size * 16)
    buf.putInt(heap.size)
    heap.foreach { case (o, p) => buf.putDouble(o).putLong(p) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue((buf.getDouble, buf.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ord = newChildren(0), payload = newChildren(1))
}

object TopKAgg {
  /** Column form: `top_k(ord, payload, k)` aggregate. */
  def apply(ord: Column, payload: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(ord), GraftBridge.expression(payload), k)
        .toAggregateExpression())
}
