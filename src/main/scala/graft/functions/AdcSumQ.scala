package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Fused ADC table-lookup sum for the IVF-PQ probe: with `luts` the
  * query's m per-subspace lookup tables FLATTENED to one long array of
  * `m·ksub` entries (subspace-major) and `codes` a vector's m int8 PQ
  * codes, computes `Σₘ luts(m·ksub + codes(m))` — the asymmetric-
  * distance contribution of the coded residual. Replaces the
  * `aggregate(transform(sequence(...), i -> element_at(element_at(...`
  * HOF chain, which is CodegenFallback (boxed, interpreted) in the one
  * place the PQ probe touches every candidate row; this expression is a
  * flat whole-stage-codegen loop with zero allocation per row.
  *
  * Out-of-range codes (corrupt index bytes) throw rather than silently
  * mis-scoring — the index is engine-written, so a bad code is a bug,
  * not data.
  */
case class AdcSumQ(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(ByteType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val luts = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += luts.getLong(i * ksub + codes.getByte(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $a.getLong($i * $ksub + $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcSumQ {
  /** Column form: `adc_sum_q(flatLuts, codes, ksub)`. */
  def apply(flatLuts: Column, codes: Column, ksub: Int): Column =
    Bridge.column(AdcSumQ(Bridge.expression(flatLuts), Bridge.expression(codes), ksub))
}
