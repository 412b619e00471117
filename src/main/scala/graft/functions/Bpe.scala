package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) — the
  * corpus-trained compression tokenizer of an LLM data pipeline, beyond
  * the reference's surface. Two halves, both deterministic:
  *
  *  - TRAIN ([[trainMerges]]): merges are learned from the corpus's
  *    top-`wordCap` words by frequency — the capped word-frequency table
  *    is the MODEL (driver-bounded, the q106/q112 vocab pattern), so
  *    training cost is one corpus aggregate + a driver loop over ≤
  *    wordCap short words, at any corpus scale. Each step merges the
  *    adjacent symbol pair with the highest frequency (weighted by word
  *    frequency, overlapping occurrences counted; ties broken by (left,
  *    right) ascending in CODEPOINT order — DuckDB's binary UTF-8
  *    collation), applied exhaustively left-to-right. Pair counts are
  *    maintained INCREMENTALLY: each step touches only the words that
  *    contain the merged pair (tracked by an inverted pair→words index)
  *    and reselects the max through a lazy-deletion heap, so cost per
  *    step is O(words containing the pair × word length), not
  *    O(wordCap × word length) — a 32k-merge production vocab does not
  *    re-scan the whole model 32k times.
  *  - ENCODE ([[encode]]): every document's tokens are re-written to BPE
  *    pieces by RANK-PRIORITY merging: repeatedly merge the
  *    lowest-training-rank adjacent pair present (leftmost first on
  *    ties), via a linked-list over the token's codepoint symbols and a
  *    lazy-deletion min-heap — O(len log len) per token INDEPENDENT of
  *    merge count. For a greedily-trained merge list this is provably
  *    the same segmentation as applying the merges in training order
  *    each exhaustively left-to-right (a merge can never create a pair
  *    of strictly lower rank: that pair would have had to out-score the
  *    earlier merge during training on the same corpus); the randomized
  *    parity suite in PipelineSpec checks the equivalence against a
  *    naive sequential implementation up to numMerges ≥ 1024. A pure
  *    per-row map over a broadcast merge table — no shuffle at any
  *    corpus size or vocab size.
  *
  * Symbols are Unicode CODEPOINTS (never UTF-16 units), and all
  * tie-break comparisons are in codepoint order == UTF-8 byte order, so
  * cross-engine parity with the DuckDB oracle holds beyond ASCII.
  *
  * The q123 oracle implements the SAME two halves independently in SQL:
  * per-merge pair counting as aggregates and the exhaustive application
  * as per-word recursive CTEs (leftmost-occurrence-per-step to fixpoint,
  * provably equal to the left-to-right pass), so merges AND pieces are
  * hash-checked end to end — the oracle derives the merge table from its
  * own corpus scan, never from Spark.
  */
object Bpe {

  /** Split into one-codepoint symbols (UTF-16 surrogate pairs stay whole). */
  private[graft] def symbols(t: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      val w = Character.charCount(cp)
      out += t.substring(i, i + w)
      i += w
    }
    out.result()
  }

  /** Codepoint-order comparison == UTF-8 byte order (DuckDB collation).
    * Differs from String.compareTo only when supplementary-plane
    * codepoints meet U+E000..U+FFFF — exactly the case that would break
    * cross-engine tie-breaks.
    */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Apply one merge exhaustively, left to right, to a symbol sequence. */
  private[graft] def applyMerge(seq: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) { out += l + r; i += 2 }
      else { out += seq(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges on the top-`wordCap` (frequency desc, word
    * asc in binary/UTF-8 order) words of the corpus. Returns the ordered
    * merge list; may be shorter than `numMerges` when no adjacent pair
    * remains.
    */
  def trainMerges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int = 8,
      wordCap: Int = 256): Seq[(String, String)] = {
    // binary cast ⇒ the cap's tie-break sorts UTF-8 bytes, like DuckDB
    val words: Array[(String, Long)] = df
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").cast("binary")) // TakeOrdered: ≤ wordCap rows reach the driver
      .limit(wordCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val seqs: Array[Array[String]] = words.map { case (w, _) => symbols(w) }
    val freqs: Array[Long] = words.map(_._2)

    // pair state: weighted adjacency counts + inverted pair→words index,
    // both updated incrementally per step; a lazy-deletion max-heap
    // reselects the best pair without rescanning all pairs
    type Pair = (String, String)
    def pairsOf(s: Array[String]): collection.mutable.HashMap[Pair, Long] = {
      val m = collection.mutable.HashMap.empty[Pair, Long]
      var i = 0
      while (i + 1 < s.length) { // overlapping occurrences count, as in the oracle
        val k = (s(i), s(i + 1))
        m(k) = m.getOrElse(k, 0L) + 1L
        i += 1
      }
      m
    }
    val counts = collection.mutable.HashMap.empty[Pair, Long]
    val occ = collection.mutable.HashMap.empty[Pair, collection.mutable.HashSet[Int]]
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      11,
      new java.util.Comparator[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // larger count first
          if (c != 0) c
          else {
            val cl = cpCompare(x._2, y._2) // then (l, r) ascending, UTF-8 order
            if (cl != 0) cl else cpCompare(x._3, y._3)
          }
        }
      })
    seqs.indices.foreach { w =>
      pairsOf(seqs(w)).foreach { case (p, c) =>
        counts(p) = counts.getOrElse(p, 0L) + c * freqs(w)
        occ.getOrElseUpdate(p, collection.mutable.HashSet.empty) += w
      }
    }
    counts.foreach { case ((l, r), f) => heap.add((f, l, r)) }

    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    while (step < numMerges && !heap.isEmpty) {
      // pop until the entry matches the live count (lazy deletion)
      val e = heap.poll()
      val pair = (e._2, e._3)
      if (counts.getOrElse(pair, 0L) == e._1 && e._1 > 0L) {
        merges += pair
        step += 1
        val touched = occ.getOrElse(pair, collection.mutable.HashSet.empty).toArray
        val changed = collection.mutable.HashSet.empty[Pair]
        touched.foreach { w =>
          val before = pairsOf(seqs(w))
          seqs(w) = applyMerge(seqs(w), pair._1, pair._2)
          val after = pairsOf(seqs(w))
          (before.keySet ++ after.keySet).foreach { p =>
            val d = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
            if (d != 0L) {
              counts(p) = counts.getOrElse(p, 0L) + d * freqs(w)
              changed += p
            }
            if (after.getOrElse(p, 0L) == 0L) occ.get(p).foreach(_ -= w)
            else if (before.getOrElse(p, 0L) == 0L)
              occ.getOrElseUpdate(p, collection.mutable.HashSet.empty) += w
          }
        }
        changed.foreach { p =>
          val f = counts.getOrElse(p, 0L)
          if (f > 0L) heap.add((f, p._1, p._2)) else { counts.remove(p); occ.remove(p) }
        }
      }
    }
    merges.result()
  }

  /** Rank-priority encode of one token: linked list over codepoint
    * symbols + lazy-deletion min-heap keyed (rank, leftmost position);
    * always merges the lowest-rank pair present, leftmost first on ties.
    * O(len log len) regardless of merge-table size.
    */
  private[graft] def encodeToken(
      tok: String,
      rank: java.util.HashMap[String, Integer]): Array[String] = {
    val syms = symbols(tok)
    val n = syms.length
    if (n <= 1 || rank.isEmpty) return syms
    val next = Array.tabulate(n)(i => if (i + 1 < n) i + 1 else -1)
    val prev = Array.tabulate(n)(i => i - 1)
    val alive = Array.fill(n)(true)
    val heap = new java.util.PriorityQueue[java.lang.Long]()
    def rankAt(i: Int): Int = {
      val j = next(i)
      if (j < 0) -1
      else {
        val r = rank.get(syms(i) + " " + syms(j))
        if (r == null) -1 else r.intValue()
      }
    }
    def push(i: Int): Unit = {
      val r = rankAt(i)
      if (r >= 0) heap.add((r.toLong << 32) | i.toLong)
    }
    var i = 0
    while (i < n - 1) { push(i); i += 1 }
    while (!heap.isEmpty) {
      val e = heap.poll().longValue()
      val r = (e >>> 32).toInt
      val p = (e & 0xffffffffL).toInt
      // stale entries fail this check: a merged-over position is dead, a
      // re-merged position carries a different symbol ⇒ different rank
      if (alive(p) && rankAt(p) == r) {
        val q = next(p)
        syms(p) = syms(p) + syms(q)
        alive(q) = false
        val nq = next(q)
        next(p) = nq
        if (nq >= 0) prev(nq) = p
        if (prev(p) >= 0) push(prev(p))
        push(p)
      }
    }
    val out = Array.newBuilder[String]
    var k = 0
    while (k < n) { if (alive(k)) out += syms(k); k += 1 }
    out.result()
  }

  private[graft] def rankTable(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Int.box(i)) // first (lowest) rank wins
    }
    m
  }

  /** Encode every document to BPE pieces under `merges`: returns
    * (id, n_pieces, pieces_str) with pieces space-joined in token order.
    * Null or all-blank text emits nothing (the typed map bypasses
    * Catalyst null-safety, so the guard lives here).
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rankTable(merges))
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = bc.value
        // word-frequency distributions are Zipfian: a bounded per-
        // partition memo makes the common-word encode a single lookup,
        // so throughput is flat in merge-table size for real corpora
        val memo = new java.util.HashMap[String, Array[String]]()
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String]
          else text.split(" ").filter(_.nonEmpty)
          if (toks.isEmpty) None
          else {
            var n = 0L
            val sb = new java.lang.StringBuilder
            toks.foreach { t =>
              var pieces = memo.get(t)
              if (pieces == null) {
                pieces = encodeToken(t, rk)
                if (memo.size < (1 << 16)) memo.put(t, pieces)
              }
              pieces.foreach { p =>
                if (n > 0) sb.append(' ')
                sb.append(p)
                n += 1
              }
            }
            Some((id, n, sb.toString))
          }
        }
      }.toDF(idCol, "n_pieces", "pieces_str")
  }

  /** Persist a trained merge list as a tiny parquet model table
    * (rank, left, right) — the tokenizer-as-standing-model half of a
    * real pipeline: train ONCE on a reference corpus, then [[encode]]
    * every later corpus/batch against the stored model (the signature/
    * IVF-index persistence pattern applied to the tokenizer).
    */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read back a [[writeMerges]] model in training order. */
  def readMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("rank"), col("left"), col("right"))
      .as[(Int, String, String)].collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq
  }

  /** [[encode]] against a stored [[writeMerges]] model. */
  def encodeWithStored(df: DataFrame, idCol: String, textCol: String, path: String): DataFrame =
    encode(df, idCol, textCol, readMerges(df.sparkSession, path))

  /** Train + encode in one call (the q123 shape). */
  def trainEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int = 8,
      wordCap: Int = 256): DataFrame =
    encode(df, idCol, textCol, trainMerges(df, idCol, textCol, numMerges, wordCap))

  /** DuckDB twin of [[trainEncode]]: the full train + encode pipeline —
    * merge selection as per-step aggregates over the capped word set,
    * exhaustive application as per-word recursive CTEs, then the per-doc
    * piece rebuild. One `WITH RECURSIVE` chain, `numMerges` unrolled
    * steps.
    */
  def trainEncodeSql(
      tbl: String,
      idCol: String,
      textCol: String,
      numMerges: Int = 8,
      wordCap: Int = 256): String = {
    def hasPair(seq: String, l: String, r: String) =
      s"len(list_filter(range(1, len($seq)), i -> $seq[i] = $l AND $seq[i+1] = $r))"
    def step(j: Int): String = {
      val p = s"s${j - 1}"
      s"""p$j AS MATERIALIZED (
         |  SELECT s.seq[i] AS l, s.seq[i+1] AS r, sum(w.n) AS f
         |  FROM $p s JOIN wfreq w USING (tok), unnest(range(1, len(s.seq))) t(i)
         |  GROUP BY 1, 2),
         |b$j AS MATERIALIZED (SELECT coalesce(max(l), '') AS l, coalesce(max(r), '') AS r FROM (
         |  SELECT l, r FROM p$j ORDER BY f DESC, l, r LIMIT 1) q),
         |a$j(tok, seq) AS (
         |  SELECT tok, seq FROM $p
         |  UNION ALL
         |  SELECT a.tok, list_slice(a.seq, 1, pp.pos - 1) || [b.l || b.r] || list_slice(a.seq, pp.pos + 2, len(a.seq))
         |  FROM a$j a, b$j b,
         |    LATERAL (SELECT list_min(list_filter(range(1, len(a.seq)), i -> a.seq[i] = b.l AND a.seq[i+1] = b.r)) AS pos) pp
         |  WHERE pp.pos IS NOT NULL),
         |s$j AS MATERIALIZED (SELECT a.tok, a.seq FROM a$j a, b$j b WHERE ${hasPair("a.seq", "b.l", "b.r")} = 0)"""
    }
    val steps = (1 to numMerges).map(step).mkString(",\n")
    s"""WITH RECURSIVE
       |w AS (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl),
       |t AS (SELECT $idCol, u.pos, u.tok FROM (
       |  SELECT $idCol, unnest(list_transform(range(len(tk)),
       |         i -> struct_pack(pos := i, tok := tk[i+1]))) AS u FROM w) q),
       |t2 AS MATERIALIZED (SELECT $idCol, pos, tok FROM t WHERE tok <> ''),
       |wfreq AS MATERIALIZED (SELECT tok, n FROM (
       |  SELECT tok, count(*) AS n FROM t2 GROUP BY tok
       |  ORDER BY n DESC, tok LIMIT $wordCap) c),
       |s0 AS MATERIALIZED (SELECT DISTINCT tok, list_transform(range(1, len(tok)+1), i -> substr(tok, i, 1)) AS seq FROM t2),
       |$steps,
       |enc AS (SELECT tok, len(seq) AS np, array_to_string(seq, ' ') AS ps FROM s$numMerges)
       |SELECT t2.$idCol, CAST(sum(e.np) AS BIGINT) AS n_pieces,
       |       string_agg(e.ps, ' ' ORDER BY t2.pos) AS pieces_str
       |FROM t2 JOIN enc e USING (tok)
       |GROUP BY t2.$idCol""".stripMargin.replace("\n", " ")
  }
}
