package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused int64 squared L2 distance of two long-array columns:
  * `Σ (a(i)-b(i))²` over `min(|a|,|b|)` elements — the same
  * truncate-to-shorter contract as [[DotProductQ]] (callers compare
  * equal-dimension vectors; a malformed shorter vector truncates rather
  * than erroring, so validate dimensions upstream if inputs are
  * untrusted). The IVF trainer and
  * probe evaluate this once per (row, centroid) — as
  * `aggregate(zip_with(...))` that is an allocated intermediate array and
  * a wall of generated code per centroid; the fused loop keeps the
  * assignment expression small enough that per-pass codegen stays cheap
  * and the hot loop allocation-free.
  */
case class SqDistQ(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    SortedSetGuards.noNulls(x, "sqdist_q")
    SortedSetGuards.noNulls(y, "sqdist_q")
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |graft.functions.SortedSetGuards.noNulls($a, "sqdist_q");
         |graft.functions.SortedSetGuards.noNulls($b, "sqdist_q");
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistQ {
  /** Column form: `sqdist_q(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SqDistQ(Bridge.expression(a), Bridge.expression(b)))
}
