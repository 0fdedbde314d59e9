package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Single-pass make-valid ring statistics over an
  * `array<struct<x: double, y: double>>` ring: the
  * `Geo.normalizeRing` → `size` / `Geo.polygonArea` HOF chain
  * (closing-vertex drop, consecutive-duplicate collapse, CCW winding
  * normalization, shoelace area) evaluated as ONE generated loop.
  * The HOF formulation is CodegenFallback — `filter`/`zip_with`/
  * `aggregate` lambdas run interpreted and the optimized plan
  * re-walks the ring once per output column (n_valid, area, the
  * winding test's own area) — while this expression computes
  * everything in a single static call inside whole-stage codegen.
  *
  * Bit-identical semantics, step by step:
  *   - opened: the explicit closing vertex is dropped when
  *     `size > 1` and first == last, where struct equality is
  *     Catalyst's ORDERING equality (Double nan-safe compare:
  *     NaN == NaN, -0.0 == 0.0; null fields compare equal to null
  *     fields) — exactly `ring[0] === element_at(ring, -1)`;
  *   - dedup: `filter(opened, (p, i) => i === 0 || p =!= opened[i])`
  *     — consecutive duplicates collapse under the same equality;
  *   - winding: signed shoelace area over dedup, LEFT-TO-RIGHT fold
  *     `Σ (x_i·y_{i+1} − x_{i+1}·y_i) / 2` (wrap to the first
  *     vertex); negative → the ring reverses;
  *   - area: the shoelace fold RE-RUN over the (possibly reversed)
  *     ring — IEEE addition order matches the HOF's recomputation on
  *     the reversed array, so the result is bit-identical, not just
  *     sign-flipped;
  *   - any null vertex/field makes the area null (a null cross term
  *     poisons the HOF fold) but still counts in n_valid exactly as
  *     the HOF filter keeps it.
  *
  * Returns `struct<n_valid: int, area: double>` (area = signed area
  * of the normalized ring; callers take `abs`/thresholds); null only
  * for a null ring.
  */
case class RingStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_valid", IntegerType, nullable = false),
    StructField("area", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RingStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RingStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RingStats =
    copy(child = newChild)
}

object RingStats {

  /** Catalyst ordering equality for a double field pair: nan-safe
    * compare == 0 (NaN equals NaN, -0.0 equals 0.0).
    */
  private def dEq(a: Double, b: Double): Boolean =
    a == b || (a != a && b != b)

  /** Ordering equality of two vertices; indices into the backing
    * array with -1 encoding a null STRUCT (null == null, null != any
    * vertex — InterpretedOrdering's null-first total order).
    */
  private def vEq(
      xs: Array[Double], ys: Array[Double], xn: Array[Boolean], yn: Array[Boolean],
      en: Array[Boolean], i: Int, j: Int): Boolean = {
    if (en(i) || en(j)) return en(i) && en(j)
    val xEq = if (xn(i) || xn(j)) xn(i) && xn(j) else dEq(xs(i), xs(j))
    if (!xEq) return false
    if (yn(i) || yn(j)) yn(i) && yn(j) else dEq(ys(i), ys(j))
  }

  def compute(ring: ArrayData): InternalRow = {
    val n0 = ring.numElements()
    // Decode once into flat arrays (null flags per struct/field).
    val xs = new Array[Double](n0); val ys = new Array[Double](n0)
    val xn = new Array[Boolean](n0); val yn = new Array[Boolean](n0)
    val en = new Array[Boolean](n0)
    var i = 0
    while (i < n0) {
      if (ring.isNullAt(i)) { en(i) = true; xn(i) = true; yn(i) = true }
      else {
        val s = ring.getStruct(i, 2)
        if (s.isNullAt(0)) xn(i) = true else xs(i) = s.getDouble(0)
        if (s.isNullAt(1)) yn(i) = true else ys(i) = s.getDouble(1)
      }
      i += 1
    }
    // opened: drop the explicit closing vertex.
    val openedEnd =
      if (n0 > 1 && vEq(xs, ys, xn, yn, en, 0, n0 - 1)) n0 - 1 else n0
    // dedup: collapse consecutive duplicates (keep index 0).
    val keep = new Array[Int](openedEnd)
    var n = 0
    i = 0
    while (i < openedEnd) {
      if (i == 0 || !vEq(xs, ys, xn, yn, en, i, i - 1)) { keep(n) = i; n += 1 }
      i += 1
    }
    // Shoelace fold over the kept vertices in a given direction —
    // identical IEEE order to aggregate(zip_with(ring, rotated(ring),
    // cross), 0.0, _+_) / 2. A null field anywhere poisons the fold
    // (null cross term → null sum), as the HOF does.
    def shoelace(reversed: Boolean): java.lang.Double = {
      var sum = 0.0
      var k = 0
      while (k < n) {
        val p = keep(if (reversed) n - 1 - k else k)
        val q = keep(if (reversed) n - 1 - (k + 1) % n else (k + 1) % n)
        if (xn(p) || yn(p) || xn(q) || yn(q)) return null
        sum += xs(p) * ys(q) - xs(q) * ys(p)
        k += 1
      }
      java.lang.Double.valueOf(sum / 2.0)
    }
    val fwd = shoelace(reversed = false)
    // `when(polygonArea(dedup) < 0, reverse(dedup))` — null area
    // keeps the forward order; the final area is RE-COMPUTED over
    // the chosen order.
    val area: java.lang.Double =
      if (fwd != null && fwd.doubleValue() < 0) shoelace(reversed = true) else fwd
    new GenericInternalRow(Array[Any](n, area))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RingStats(GraftBridge.expression(c)))
  }
}
