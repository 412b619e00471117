package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen scalar Expression — the
  * canonical-composition step of a text-cleaning pipeline (decomposed
  * `e` + U+0301 → `é`), which Spark has no built-in for. A UDF would
  * break whole-stage codegen in the middle of the per-row scrub chain;
  * this stays fused. The already-normalized fast path (the overwhelming
  * majority of real text) is a pure scan that allocates nothing and
  * returns the input UTF8String as-is.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NfcNormalize.nfc($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
