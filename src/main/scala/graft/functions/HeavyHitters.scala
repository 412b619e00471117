package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-guided heavy hitters: every corpus n-gram whose frequency share
  * is at least `1/shareDen`, with EXACT counts — found without ever
  * shuffling the unbounded gram key space.
  *
  * The q74 shape (explode → groupBy(key) → TakeOrdered) is correct but
  * its exchange is keyed by every distinct gram: at 100 TB a 5-gram
  * stream has ~10¹¹ distinct keys, so the "count then filter" plan
  * shuffles a key space three orders of magnitude larger than the
  * answer. This operator replaces that with the classic two-pass
  * sketch-then-verify plan:
  *
  *  1. CANDIDATES — one scan, zero exchanges: each partition folds its
  *     gram stream into a Misra-Gries summary (≤ 2k counters), and the
  *     summaries merge up a `treeAggregate` (driver state O(k)).
  *     Misra-Gries is a MERGEABLE summary (Agarwal et al., "Mergeable
  *     Summaries", PODS 2012): both the streaming compaction and the
  *     merge subtract the (k+1)-th largest counter from every entry, and
  *     each such subtraction of v destroys ≥ (k+1)·v of total stream
  *     weight, so the sum of subtractions is ≤ N/(k+1) no matter how
  *     many summaries merged or in what order. Hence any gram with true
  *     count > N/(k+1) has a positive residual counter in the final
  *     summary — NO FALSE NEGATIVES. With `k ≥ shareDen`, every gram at
  *     share ≥ 1/shareDen strictly clears that bar.
  *  2. VERIFY — one more scan: the ≤ 2k candidate grams broadcast onto
  *     the gram stream (BroadcastHashJoin — untouched grams never leave
  *     the scan's projection), and the exact count aggregate keys on the
  *     candidate set only, so the map-side-combined exchange moves
  *     ≤ 2k rows per partition at any corpus size.
  *
  * The candidate SET varies with partitioning and merge order (false
  * positives are arbitrary survivors), but the verified OUTPUT is the
  * exact, deterministic answer: guaranteed-present true heavies keep
  * their exact counts, and every false positive fails the exact
  * `n · shareDen ≥ N` filter. PipelineSpec asserts partition-count
  * invariance and parity with the exact computation.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary: ≤ 2k counters between compactions,
    * plus the exact total stream weight `n`. Serializable driver/task
    * state for `treeAggregate`.
    */
  final class Summary(val k: Int) extends Serializable {
    require(k > 0, s"k must be positive, got $k")
    val counts = new java.util.HashMap[String, Long]()
    var n: Long = 0L

    def add(gram: String): Unit = {
      n += 1L
      counts.put(gram, counts.getOrDefault(gram, 0L) + 1L)
      // amortized O(1): the 2k slack means ≥ k inserts between the
      // O(k log k) compactions
      if (counts.size > 2 * k) compact()
    }

    /** Subtract the (k+1)-th largest counter from every entry and drop
      * the non-positive remainder — leaves ≤ k survivors (only entries
      * strictly above the pivot survive).
      */
    private def compact(): Unit = {
      if (counts.size <= k) return
      val vals = new Array[Long](counts.size)
      var i = 0
      val it = counts.values().iterator()
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - 1 - k) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val r = e.getValue - pivot
        if (r <= 0L) eit.remove() else e.setValue(r)
      }
    }

    /** Fold `o` into this summary (counter sums, then one compaction);
      * the error bounds ADD, staying ≤ N_total/(k+1) — the mergeability
      * property the treeAggregate relies on.
      */
    def merge(o: Summary): Summary = {
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
      }
      n += o.n
      compact()
      this
    }

    /** Every key with a positive residual — a superset of all grams with
      * true count > n/(k+1).
      */
    def candidates: Array[String] = {
      val out = new Array[String](counts.size)
      var i = 0
      val it = counts.keySet().iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** The word `gramLen`-grams of one document, in the exact convention of
    * [[TextOps.shingleArr]] (split on single space, empties kept, grams
    * space-joined) so the sketch pass sees the same stream the verify
    * pass and the DuckDB oracle count. `split(" ", -1)` keeps trailing
    * empties like Spark's `split`; Java's default split would drop them.
    */
  private[graft] def gramsOf(text: String, gramLen: Int): Iterator[String] =
    if (text == null) Iterator.empty
    else {
      val tk = text.split(" ", -1)
      if (tk.length < gramLen) Iterator.empty
      else (0 to tk.length - gramLen).iterator.map { i =>
        val sb = new java.lang.StringBuilder(tk(i))
        var j = 1
        while (j < gramLen) { sb.append(' ').append(tk(i + j)); j += 1 }
        sb.toString
      }
    }

  /** Exact counts of every `gramLen`-gram of `textCol` with frequency
    * share ≥ 1/`shareDen`, ordered by (count desc, gram). `k ≥ shareDen`
    * is required for the no-false-negative guarantee; the default gives
    * a 2× margin (smaller residual error, same asymptotics).
    */
  def frequentGrams(
      df: DataFrame,
      textCol: String,
      gramLen: Int = 3,
      shareDen: Long = 5000L,
      k: Int = 10000): DataFrame = {
    require(k >= shareDen,
      s"k ($k) must be >= shareDen ($shareDen) for the no-false-negative bound")
    val spark = df.sparkSession
    import spark.implicits._

    // pass 1: per-partition summaries, tree-merged; driver state O(k)
    val summary = df.select(col(textCol)).as[String].rdd
      .treeAggregate(new Summary(k))(
        (s, t) => { gramsOf(t, gramLen).foreach(s.add); s },
        (a, b) => a.merge(b),
        depth = 2)
    val total = summary.n

    // pass 2: exact verify of the ≤ 2k candidates only
    val candDf = summary.candidates.toSeq.toDF("gram")
    df.select(TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= gramLen)
      .select(explode(TextOps.shingleArr(gramLen)).as("gram"))
      .join(broadcast(candDf), Seq("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .where(col("n") * lit(shareDen) >= lit(total))
      .orderBy(col("n").desc, col("gram"))
  }

  /** DuckDB twin of [[frequentGrams]] — the direct exact computation
    * (count every gram, filter by share): the sketch must change nothing
    * but the plan shape.
    */
  def frequentGramsSql(
      tbl: String,
      textCol: String,
      gramLen: Int = 3,
      shareDen: Long = 5000L): String = {
    val parts = (0 until gramLen).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT string_split($textCol, ' ') AS tk FROM $tbl),
       |g AS (SELECT $parts AS gram
       |      FROM d, unnest(range(1, len(tk) - ${gramLen - 2})) t(i)),
       |c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram)
       |SELECT gram, n FROM c
       |WHERE n * $shareDen >= (SELECT count(*) FROM g)
       |ORDER BY n DESC, gram""".stripMargin.replace("\n", " ")
  }
}
