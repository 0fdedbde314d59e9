package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** WKB (well-known binary) geometry support — the wire format the
  * reference's geometry column carries (reference:
  * src/o2agol/pipeline/source.py:736-750 converts WKB bytes via
  * shapely; transform.py:207-214 round-trips WKB to force 2D).
  *
  * Native Catalyst expressions with codegen: a WKB parse per row is
  * scan-path work, so it must stay inside whole-stage codegen.
  */
object Wkb {

  /** Little-endian 2D point → 21-byte WKB. */
  def encodePoint(bytes: (Double, Double)): Array[Byte] =
    encodePointXY(bytes._1, bytes._2)

  /** Two-arg form (also the codegen entry point — static forwarder
    * callable from generated Java).
    */
  def encodePointXY(x: Double, y: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  def wkbPointXY(c: Column): Column =
    GraftBridge.column(WkbPointXY(GraftBridge.expression(c)))

  def wkbGeometryType(c: Column): Column =
    GraftBridge.column(WkbGeometryType(GraftBridge.expression(c)))

  /** Column-level point ENCODER: (x, y) doubles → 21-byte LE WKB
    * (the inverse of [[wkbPointXY]]; feeds the GPKG writer).
    */
  def wkbFromXY(x: Column, y: Column): Column =
    GraftBridge.column(WkbFromXY(GraftBridge.expression(x), GraftBridge.expression(y)))
}

/** Encode (x, y) doubles as a little-endian 2D-point WKB. */
case class WkbFromXY(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wkb_from_xy requires (double, double), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    Wkb.encodePoint((x.asInstanceOf[Double], y.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.Wkb.encodePointXY($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WkbFromXY =
    copy(left = newLeft, right = newRight)
}

/** Decode a WKB 2D Point into struct(x, y). Honors the byte-order
  * marker; nulls (rather than errors) on non-point geometries so a
  * mixed-geometry scan can filter by [[WkbGeometryType]] first.
  */
case class WkbPointXY(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 21) null
    else {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      buf.order(if (bytes(0) == 1) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
      buf.position(1)
      if (buf.getInt != 1) null
      else new GenericInternalRow(Array[Any](buf.getDouble, buf.getDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val buf = ctx.freshName("buf")
      s"""
         |if ($c.length < 21) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.nio.ByteBuffer $buf = java.nio.ByteBuffer.wrap($c);
         |  $buf.order($c[0] == (byte) 1 ? java.nio.ByteOrder.LITTLE_ENDIAN : java.nio.ByteOrder.BIG_ENDIAN);
         |  $buf.position(1);
         |  if ($buf.getInt() != 1) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $buf.getDouble(), $buf.getDouble() });
         |  }
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WkbPointXY =
    copy(child = newChild)
}

/** WKB geometry type code (1 Point … 6 MultiPolygon, 7 Collection);
  * null on malformed input. Drives the geometry-family split on raw
  * WKB columns.
  */
case class WkbGeometryType(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5) null
    else {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      buf.order(if (bytes(0) == 1) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
      buf.position(1)
      // Strip EWKB flag bits (Z/M/SRID high bits), then the ISO-WKB
      // +1000/+2000/+3000 Z/M/ZM offsets: 1001 (PointZ) → 1.
      java.lang.Integer.valueOf((buf.getInt & 0x0FFFFFFF) % 1000)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val buf = ctx.freshName("buf")
      s"""
         |if ($c.length < 5) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.nio.ByteBuffer $buf = java.nio.ByteBuffer.wrap($c);
         |  $buf.order($c[0] == (byte) 1 ? java.nio.ByteOrder.LITTLE_ENDIAN : java.nio.ByteOrder.BIG_ENDIAN);
         |  $buf.position(1);
         |  ${ev.value} = ($buf.getInt() & 0x0FFFFFFF) % 1000;
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WkbGeometryType =
    copy(child = newChild)
}
