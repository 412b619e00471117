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
  *    right) ascending), applied exhaustively left-to-right.
  *  - ENCODE ([[encode]]): every document's tokens are re-written to BPE
  *    pieces by applying the learned merges IN TRAINING ORDER, each
  *    exhaustively left-to-right within a token (a single left-to-right
  *    pass is exact: a merged symbol `l+r` can never itself form the
  *    pair `(l, r)` with a neighbor). A pure per-row map over a
  *    broadcast merge list — no shuffle at any corpus size.
  *
  * The q123 oracle implements the SAME two halves independently in SQL:
  * per-merge pair counting as aggregates and the exhaustive application
  * as per-word recursive CTEs (leftmost-occurrence-per-step to fixpoint,
  * provably equal to the left-to-right pass), so merges AND pieces are
  * hash-checked end to end — the oracle derives the merge table from its
  * own corpus scan, never from Spark.
  */
object Bpe {

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
    * asc) words of the corpus. Returns the ordered merge list; may be
    * shorter than `numMerges` when no adjacent pair remains.
    */
  def trainMerges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int = 8,
      wordCap: Int = 256): Seq[(String, String)] = {
    val words: Array[(String, Long)] = df
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(wordCap) // TakeOrdered: ≤ wordCap rows reach the driver
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.toCharArray.map(_.toString), n) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val freq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, n) =>
        var i = 0
        while (i + 1 < s.length) { // overlapping occurrences count, as in the oracle
          val k = (s(i), s(i + 1))
          freq(k) = freq.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (freq.isEmpty) done = true
      else {
        val (l, r) = freq.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
        merges += ((l, r))
        seqs = seqs.map { case (s, n) => (applyMerge(s, l, r), n) }
        step += 1
      }
    }
    merges.result()
  }

  /** Encode every document to BPE pieces under `merges`: returns
    * (id, n_pieces, pieces_str) with pieces space-joined in token order.
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.flatMap { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty)
          if (toks.isEmpty) None
          else {
            var n = 0L
            val sb = new java.lang.StringBuilder
            toks.foreach { t =>
              var seq = t.map(_.toString).toArray
              ms.foreach { case (l, r) => seq = applyMerge(seq, l, r) }
              seq.foreach { p =>
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
