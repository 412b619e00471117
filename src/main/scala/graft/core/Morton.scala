package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) curve codec, 21 bits per axis packed into a 63-bit Long.
  *
  * Semantics mirror the reference implementation's Z-index
  * (`spdb/c_lib/c_version/zindex.c:27-68`): bit i of x lands at output bit
  * 3*i, y at 3*i+1, z at 3*i+2. Used both as a scalar function (coordinate →
  * cuboid address) and as the write-time clustering key so that spatially
  * adjacent cuboids are adjacent in file order (min/max pruning works).
  *
  * Exposed three ways: plain Scala (`Morton.encode`), codegen'd Catalyst
  * expressions (`MortonEncode` / `MortonDecode`), and `Column` helpers
  * (`morton_encode(x,y,z)`, `morton_x(m)`, ...). The expressions call the
  * static forwarders on this object from generated Java, keeping the hot
  * path inside whole-stage codegen.
  */
object Morton {
  final val BitsPerAxis = 21
  final val MaxCoord: Long = (1L << BitsPerAxis) - 1

  /** Spread the low 21 bits of v so bit i moves to bit 3*i. */
  def part1by2(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Inverse of part1by2: gather bits 0,3,6,... into the low 21 bits. */
  def compact1by2(v: Long): Long = {
    var x = v & 0x1249249249249249L
    x = (x | (x >> 2)) & 0x10c30c30c30c30c3L
    x = (x | (x >> 4)) & 0x100f00f00f00f00fL
    x = (x | (x >> 8)) & 0x1f0000ff0000ffL
    x = (x | (x >> 16)) & 0x1f00000000ffffL
    x = (x | (x >> 32)) & 0x1fffffL
    x
  }

  def encode(x: Long, y: Long, z: Long): Long =
    part1by2(x) | (part1by2(y) << 1) | (part1by2(z) << 2)

  def decodeX(m: Long): Long = compact1by2(m)
  def decodeY(m: Long): Long = compact1by2(m >> 1)
  def decodeZ(m: Long): Long = compact1by2(m >> 2)

  /** Axis dispatch used by the generated code of [[MortonDecode]]. */
  def decodeAxis(m: Long, axis: Int): Long = compact1by2(m >> axis)

  // ---- Column API ----
  def morton_encode(x: Column, y: Column, z: Column): Column =
    column(MortonEncode(
      expression(x.cast("long")), expression(y.cast("long")), expression(z.cast("long"))))
  def morton_x(m: Column): Column = column(MortonDecode(expression(m.cast("long")), 0))
  def morton_y(m: Column): Column = column(MortonDecode(expression(m.cast("long")), 1))
  def morton_z(m: Column): Column = column(MortonDecode(expression(m.cast("long")), 2))

  /** DuckDB-compatible ANSI SQL for `encode(x,y,z)`: explicit bit interleave.
    * Used to hand the driver an oracle for the custom expression.
    */
  def encodeSql(x: String, y: String, z: String): String = {
    val terms = (0 until BitsPerAxis).flatMap { i =>
      Seq(
        s"((($x >> $i) & 1) << ${3 * i})",
        s"((($y >> $i) & 1) << ${3 * i + 1})",
        s"((($z >> $i) & 1) << ${3 * i + 2})"
      )
    }
    terms.mkString("(", " | ", ")")
  }

  /** DuckDB-compatible SQL for decode of one axis (0=x, 1=y, 2=z). */
  def decodeSql(m: String, axis: Int): String = {
    val terms = (0 until BitsPerAxis).map { i =>
      s"((($m >> ${3 * i + axis}) & 1) << $i)"
    }
    terms.mkString("(", " | ", ")")
  }
}

/** morton_encode(x, y, z): interleave three 21-bit coordinates. */
case class MortonEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    Morton.encode(x.asInstanceOf[Long], y.asInstanceOf[Long], z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) => s"graft.core.Morton.encode($x, $y, $z)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** morton_decode(m, axis): extract one axis (0=x, 1=y, 2=z) of a Morton code. */
case class MortonDecode(child: Expression, axis: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(axis >= 0 && axis <= 2, s"axis must be 0..2, got $axis")
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(m: Any): Any =
    Morton.decodeAxis(m.asInstanceOf[Long], axis)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m => s"graft.core.Morton.decodeAxis($m, $axis)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
