package graft.`export`

import java.nio.{ByteBuffer, ByteOrder}

/** Packed Hilbert R-tree — the OPTIONAL spatial index of the
  * FlatGeobuf v3 spec (public layout, flatgeobuf.org; reference
  * implementation `packedrtree.cpp/ts`). Structure:
  *
  *   - one 40-byte node item per node: minX, minY, maxX, maxY
  *     (LE doubles) + a LE uint64 `offset`;
  *   - the node array stores the ROOT first and the leaf level last;
  *     level bounds derive from (numItems, nodeSize) exactly as in
  *     the reference (`generateLevelBounds`);
  *   - leaf items carry the FEATURE's byte offset into the data
  *     section; internal nodes carry the node index of their first
  *     child;
  *   - items are packed in Hilbert order of their bbox centers on a
  *     2^16 grid over the global extent (the classic
  *     bit-twiddled Hilbert curve, public domain
  *     rawrunprotected/hilbert_curves, as used by the reference).
  *
  * The builder holds 40 bytes per FEATURE (not per payload byte):
  * bounded driver state of the same order as the .shx offset table —
  * the single-file format's inherent ceiling, documented in SURVEY
  * §6 (the distributed big-export path remains GeoParquet).
  */
object PackedRTree {

  final val NodeItemLen = 40

  final case class Item(minX: Double, minY: Double, maxX: Double, maxY: Double, offset: Long)

  /** Classic 16-bit-per-axis Hilbert curve index (public-domain
    * bit-twiddling algorithm used by the FlatGeobuf reference).
    */
  def hilbert(xIn: Int, yIn: Int): Long = {
    val x = xIn & 0xffff
    val y = yIn & 0xffff
    var a = x ^ y
    var b = 0xffff ^ a
    var c = 0xffff ^ (x | y)
    var d = x & (y ^ 0xffff)
    var aa = a | (b >> 1)
    var bb = (a >> 1) ^ a
    var cc = ((c >> 1) ^ (b & (d >> 1))) ^ c
    var dd = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >> 2)) ^ (b & (b >> 2))
    bb = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    cc = cc ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    dd = dd ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >> 4)) ^ (b & (b >> 4))
    bb = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    cc = cc ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    dd = dd ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a = aa; b = bb; c = cc; d = dd
    cc = cc ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    dd = dd ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = cc ^ (cc >> 1)
    b = dd ^ (dd >> 1)

    var i0 = x ^ y
    var i1 = b | (0xffff ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & 0x00ff00ff
    i0 = (i0 | (i0 << 4)) & 0x0f0f0f0f
    i0 = (i0 | (i0 << 2)) & 0x33333333
    i0 = (i0 | (i0 << 1)) & 0x55555555

    i1 = (i1 | (i1 << 8)) & 0x00ff00ff
    i1 = (i1 | (i1 << 4)) & 0x0f0f0f0f
    i1 = (i1 | (i1 << 2)) & 0x33333333
    i1 = (i1 | (i1 << 1)) & 0x55555555

    ((i1.toLong << 1) | i0.toLong) & 0xffffffffL
  }

  /** Hilbert key of a bbox center on the 2^16 grid over `extent`. */
  def hilbertOf(
      minX: Double, minY: Double, maxX: Double, maxY: Double,
      extent: (Double, Double, Double, Double)): Long = {
    val (exMinX, exMinY, exMaxX, exMaxY) = extent
    val w = math.max(exMaxX - exMinX, java.lang.Double.MIN_NORMAL)
    val h = math.max(exMaxY - exMinY, java.lang.Double.MIN_NORMAL)
    val hx = math.floor(65535.0 * (((minX + maxX) / 2 - exMinX) / w)).toInt
    val hy = math.floor(65535.0 * (((minY + maxY) / 2 - exMinY) / h)).toInt
    hilbert(math.min(65535, math.max(0, hx)), math.min(65535, math.max(0, hy)))
  }

  /** Level bounds per the reference `generateLevelBounds`
    * (flatgeobuf packedrtree.cpp/ts): returns (start, end)
    * node-index ranges, LEAF LEVEL FIRST in the returned list, with
    * the leaf range sitting at the END of the node array and the
    * root at index 0. The parent round is do-while (at least one
    * parent level is always emitted), so numItems=1 yields TWO
    * nodes (root + leaf) — the reference's wire layout for a
    * single-feature index; a pre-test loop here would write a
    * 40-byte-short index that external readers misparse.
    */
  def levelBounds(numItems: Long, nodeSize: Int): Seq[(Long, Long)] = {
    require(numItems > 0, "empty tree")
    require(nodeSize >= 2, s"nodeSize must be >= 2 (got $nodeSize)")
    var n = numItems
    var numNodes = n
    val levelNumNodes = scala.collection.mutable.ArrayBuffer(n)
    var first = true
    while (first || n != 1) {
      first = false
      n = (n + nodeSize - 1) / nodeSize
      numNodes += n
      levelNumNodes += n
    }
    val levelOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = numNodes
    levelNumNodes.foreach { size => levelOffsets += (acc - size); acc -= size }
    levelNumNodes.indices.map(i => (levelOffsets(i), levelOffsets(i) + levelNumNodes(i)))
  }

  def numNodes(numItems: Long, nodeSize: Int): Long = levelBounds(numItems, nodeSize).head._2

  /** Build the packed tree over `items` (ALREADY in Hilbert order,
    * offsets = feature byte offsets in the data section) and return
    * the serialized node array (LE, 40 bytes per node, root first).
    */
  def build(items: IndexedSeq[Item], nodeSize: Int): Array[Byte] = {
    val bounds = levelBounds(items.length.toLong, nodeSize)
    val total = bounds.head._2
    val nodes = new Array[Item](total.toInt)
    val leafStart = bounds.head._1.toInt
    items.indices.foreach(i => nodes(leafStart + i) = items(i))
    // bottom-up: parent levels aggregate nodeSize children; parent
    // offset = node index of its first child (the reference wire
    // meaning for internal nodes).
    var level = 0
    while (level < bounds.length - 1) {
      val (childStart, childEnd) = bounds(level)
      var pos = childStart.toInt
      var parent = bounds(level + 1)._1.toInt
      while (pos < childEnd) {
        val first = pos
        var minX = Double.MaxValue; var minY = Double.MaxValue
        var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
        var j = 0
        while (j < nodeSize && pos < childEnd) {
          val c = nodes(pos)
          if (c.minX < minX) minX = c.minX
          if (c.minY < minY) minY = c.minY
          if (c.maxX > maxX) maxX = c.maxX
          if (c.maxY > maxY) maxY = c.maxY
          pos += 1; j += 1
        }
        nodes(parent) = Item(minX, minY, maxX, maxY, first.toLong)
        parent += 1
      }
      level += 1
    }
    val buf = ByteBuffer.allocate(nodes.length * NodeItemLen).order(ByteOrder.LITTLE_ENDIAN)
    nodes.foreach { nd =>
      buf.putDouble(nd.minX); buf.putDouble(nd.minY)
      buf.putDouble(nd.maxX); buf.putDouble(nd.maxY)
      buf.putLong(nd.offset)
    }
    buf.array()
  }

  /** Parse a serialized node array back into items (root first). */
  def parse(bytes: Array[Byte]): IndexedSeq[Item] = {
    require(bytes.length % NodeItemLen == 0, "corrupt packed r-tree")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / NodeItemLen).map { _ =>
      Item(buf.getDouble, buf.getDouble, buf.getDouble, buf.getDouble, buf.getLong)
    }
  }

  /** Stream a bbox search over a parsed node array: returns the
    * (featureOffset, leafIndex) of every leaf whose bbox intersects
    * the query — the reference `streamSearch` contract.
    */
  def search(
      nodes: IndexedSeq[Item], numItems: Long, nodeSize: Int,
      minX: Double, minY: Double, maxX: Double, maxY: Double): Seq[(Long, Long)] = {
    val bounds = levelBounds(numItems, nodeSize)
    val leafStart = bounds.head._1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val queue = scala.collection.mutable.Queue[Long](0L)
    while (queue.nonEmpty) {
      val idx = queue.dequeue()
      val n = nodes(idx.toInt)
      val hit = n.minX <= maxX && n.maxX >= minX && n.minY <= maxY && n.maxY >= minY
      if (hit) {
        if (idx >= leafStart) out += ((n.offset, idx - leafStart))
        else {
          // internal: children are the nodeSize items from n.offset,
          // clipped to the child level's end
          val childLevelEnd = bounds.find(b => n.offset >= b._1 && n.offset < b._2)
            .map(_._2).getOrElse(nodes.length.toLong)
          var c = n.offset
          while (c < math.min(n.offset + nodeSize, childLevelEnd)) { queue += c; c += 1 }
        }
      }
    }
    out.toSeq
  }
}
