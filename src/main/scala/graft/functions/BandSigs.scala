package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All banded random-hyperplane LSH signatures of a quantized vector in
  * ONE fused loop: plane `p` contributes sign bit `(planes(p)·v > 0)` to
  * band `p / planesPerBand` at position `p % planesPerBand`; the result
  * is `array<long>` of `numBands = planes.length / planesPerBand`
  * signatures.
  *
  * The plane matrix rides along as a codegen reference object — with
  * b×r planes of `dim` components each, the unfused form (b·r
  * [[DotProductQ]] calls against literal arrays) emits thousands of
  * literals into generated code; this expression is one loop nest over
  * a shared `long[][]`, stays inside whole-stage codegen, and allocates
  * only the output array.
  */
case class BandSigs(child: Expression, planes: Array[Array[Long]], planesPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(planes.nonEmpty && planes.length % planesPerBand == 0,
    s"planes (${planes.length}) must be a positive multiple of planesPerBand ($planesPerBand)")

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    SortedSetGuards.noNulls(x, "band_sigs")
    val out = BandSigs.compute(x, planes, planesPerBand)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      s"""
         |graft.functions.SortedSetGuards.noNulls($v, "band_sigs");
         |long[] $out = graft.functions.BandSigs.compute($v, $planesRef, $planesPerBand);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandSigs {

  /** Shared eval/codegen kernel: the whole plane sweep for one vector.
    * Dot products truncate at `min(dim, |v|)` — same short-vector
    * semantics as [[DotProductQ]].
    */
  def compute(v: ArrayData, planes: Array[Array[Long]], planesPerBand: Int): Array[Long] = {
    val numBands = planes.length / planesPerBand
    val out = new Array[Long](numBands)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(plane.length, v.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += plane(i) * v.getLong(i)
        i += 1
      }
      if (acc > 0L) out(p / planesPerBand) |= 1L << (p % planesPerBand)
      p += 1
    }
    out
  }

  /** Column form: `band_sigs(qe)` for `numBands × planesPerBand` planes
    * drawn from [[Similarity.planeVals]]'s deterministic md5 family
    * (plane j = the same values the SQL oracle derives inline).
    */
  def apply(qe: Column, dim: Int, numBands: Int, planesPerBand: Int): Column =
    apply(qe, dim, numBands, planesPerBand, planesPerBand)

  /** Strided layout: band `b` bit `j` reads plane `b·planeStride + j` —
    * adaptive banding fixes `planeStride` ([[Similarity.PlaneStride]]) so
    * plane indices stay literal while `planesPerBand` varies with the
    * corpus; `planeStride = planesPerBand` is the classic packed layout.
    */
  def apply(qe: Column, dim: Int, numBands: Int, planesPerBand: Int, planeStride: Int): Column = {
    require(planeStride >= planesPerBand, s"planeStride $planeStride < planesPerBand $planesPerBand")
    val planes = Array.tabulate(numBands * planesPerBand)(k =>
      Similarity.planeVals((k / planesPerBand) * planeStride + (k % planesPerBand), dim))
    Bridge.column(BandSigs(Bridge.expression(qe), planes, planesPerBand))
  }
}
