package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused int64 dot product of two long-array columns: `Σ a(i)·b(i)` over
  * `min(|a|,|b|)` elements. Replaces `aggregate(zip_with(a, b, _*_), 0,
  * _+_)`, which materializes the element-wise product array per row; this
  * expression runs one fused loop in whole-stage codegen with zero
  * intermediate allocation — the hot inner loop of every similarity
  * operator (brute-force/LSH/IVF ANN, embedding near-dup).
  */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    SortedSetGuards.noNulls(x, "dot_q")
    SortedSetGuards.noNulls(y, "dot_q")
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |graft.functions.SortedSetGuards.noNulls($a, "dot_q");
         |graft.functions.SortedSetGuards.noNulls($b, "dot_q");
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductQ {
  /** Column form: `dot_q(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProductQ(Bridge.expression(a), Bridge.expression(b)))
}
