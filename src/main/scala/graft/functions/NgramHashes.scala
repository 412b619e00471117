package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `n`-gram hashes of a string in ONE rolling pass —
  * `array<long>` of length `numCodePoints - n + 1` (empty when shorter).
  *
  * The unfused form (`transform(sequence(0, len-n), i ->
  * xxhash64(substring(text, i+1, n)))`) allocates a fresh UTF8String and
  * re-hashes `n` characters at EVERY position — O(len·n) work plus
  * per-gram allocation churn, measured as ~90% of the 1M-doc
  * `ngram_jaccard_pairs` stress stage (`stress.json`
  * `ngram_candidates_only`). This expression decodes the code points
  * once, maintains a polynomial rolling hash (update O(1) per position:
  * subtract the outgoing code point's `P^(n-1)` term, multiply, add the
  * incoming), and applies a murmur3 fmix64 finalizer per window so the
  * emitted values mix like a full-width hash rather than a raw
  * polynomial. Hash VALUES differ from the xxhash64 form — they are
  * internal posting/intersection keys, equality-only; collision behavior
  * is the same 64-bit birthday regime (DuckDB oracles compare gram
  * STRINGS, so cross-engine checks are modulo 64-bit collisions exactly
  * as before — see `Dedup.ngramJaccardPairsSql`'s collision note).
  *
  * Windows advance by CODE POINT, matching `substring`/`length`
  * semantics (UTF8String counts code points) for any input, not just
  * ASCII or the BMP.
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"n-gram width must be positive, got $n")

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(NgramHashes.compute(v.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("grams")
      s"""
         |long[] $out = graft.functions.NgramHashes.compute($v, $n);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {

  /** FNV-1a 64-bit prime as the polynomial base. */
  final val P = 0x100000001b3L

  /** murmur3 fmix64 — full-avalanche finalizer over the raw polynomial. */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Shared eval/codegen kernel: one rolling pass over the code points. */
  def compute(s: UTF8String, n: Int): Array[Long] = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val len = cps.length
    if (len < n) return Array.emptyLongArray
    // P^(n-1): the outgoing code point's weight
    var pn = 1L
    var k = 1
    while (k < n) { pn *= P; k += 1 }
    val out = new Array[Long](len - n + 1)
    var h = 0L
    var i = 0
    while (i < n) { h = h * P + cps(i); i += 1 }
    out(0) = fmix64(h)
    while (i < len) {
      h = (h - cps(i - n) * pn) * P + cps(i)
      out(i - n + 1) = fmix64(h)
      i += 1
    }
    out
  }

  /** Column form: `ngram_hashes(text, n)`. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(NgramHashes(Bridge.expression(text), n))
}
