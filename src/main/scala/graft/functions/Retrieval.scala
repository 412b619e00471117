package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval — integer-exact TF-IDF top-k document search
  * over the corpus, the curation-side counterpart of the dense ANN family
  * in [[Similarity]] (targeted decontamination, eval-set leakage triage,
  * "find the training docs that look like this prompt").
  *
  * Scale shape: queries are DRIVER-SMALL by nature (a serving batch, an
  * eval set's prompts) while the corpus is not, so everything
  * query-derived travels as literals/broadcasts and the corpus is touched
  * by exactly ONE pass with no token-keyed exchange:
  *
  *   - per-doc term frequencies come from an array-HOF count over the
  *     doc's own token array against the broadcast term list (never an
  *     explode + (doc, token) shuffle — at 100 TB that exchange would
  *     dwarf the query);
  *   - document frequencies reduce the tf frame by token — a ≤|terms|-row
  *     aggregate collected to the driver (the idf model, O(query) not
  *     O(vocab): df is only ever needed for query terms);
  *   - scores aggregate on the compact (q_id, doc_id) key — the single
  *     corpus-sized exchange, map-side combined;
  *   - ranking is the bounded-heap [[TopK.perKey]], not a window sort.
  *
  * All arithmetic is integer (idf via the same bit-length convention as
  * `TextOps.surprisalScore`: idf = 64 − bitlen(df), monotone-decreasing
  * in df), so a SQL oracle reproduces every score bit-for-bit.
  * Tokenization is the family's whitespace convention (`TextOps.tokens`).
  */
object Retrieval {

  /** 64 − bit-length(df) = numberOfLeadingZeros(df): ≥1 for any df ≥ 1,
    * decreasing in df (the SQL twin spells it as 64 − bitlen).
    */
  private def idfInt(df: Long): Long = {
    require(df > 0, s"df must be positive, got $df")
    java.lang.Long.numberOfLeadingZeros(df).toLong
  }

  /** Top-`k` docs per query by Σ qtf·tf·idf over shared terms; ties break
    * on ascending doc id. Output: (q_id, doc_id, score, rk) ordered by
    * (q_id, rk). Queries with no term present in any document yield no
    * rows (score 0 is not a hit).
    */
  def tfidfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    val spark = docs.sparkSession
    import spark.implicits._

    // driver-side query analysis: (q_id, tok, qtf) + the distinct term list
    val qTok: Seq[(Long, String, Long)] = queries.flatMap { case (qid, text) =>
      text.split(" ", -1).groupBy(identity).toSeq
        .map { case (tok, occ) => (qid, tok, occ.length.toLong) }
    }
    val terms: Seq[String] = qTok.map(_._2).distinct.sorted

    // one corpus pass: per-doc tf of each term via array HOFs
    // (shuffle-free), materialized once via Stages.mat — it feeds
    // BOTH the idf-model job and the returned scoring plan, and the
    // blocks GC-release with the returned frame (a bare persist would
    // either recompute the corpus pass or pin cache into the caller's
    // session)
    val tf = Stages.mat(docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("tk"))
      // cheap doc prefilter: most of a large corpus contains no query
      // term at all — one set-membership pass drops those rows before
      // the per-term fan-out
      .where(arrays_overlap(col("tk"), typedLit(terms)))
      .select(col("doc_id"), explode(typedLit(terms)).as("tok"), col("tk"))
      // allocation-free running count (size(filter(...)) materializes a
      // filtered array per (doc, term) — measured 2× slower at 1M docs)
      .withColumn("tf", aggregate(col("tk"), lit(0L),
        (acc, t) => acc + when(t === col("tok"), 1L).otherwise(0L)))
      .where(col("tf") > 0)
      .select(col("doc_id"), col("tok"), col("tf")))

    // the idf model: O(|terms|) rows, collected — driver-bounded by design
    val dfByTok: Map[String, Long] = tf.groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // (q_id, tok, qtf·idf) — broadcast onto the tf frame
    val weights = qTok
      .filter { case (_, tok, _) => dfByTok.contains(tok) }
      .map { case (qid, tok, qtf) => (qid, tok, qtf * idfInt(dfByTok(tok))) }
      .toDF("q_id", "tok", "w")

    val scores = tf
      .join(broadcast(weights), Seq("tok"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("w") * col("tf")).as("score"))

    TopK.perKey(scores, Seq("q_id"), Seq("score" -> true, "doc_id" -> false), k)
      .select(col("q_id"), col("doc_id"), col("score"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** DuckDB twin of [[tfidfTopK]] (same tokenization, same bit-length
    * idf, same tie-break).
    */
  def tfidfTopKSql(
      tbl: String,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int): String = {
    val qRows = queries.flatMap { case (qid, text) =>
      text.split(" ", -1).groupBy(identity).toSeq
        .map { case (tok, occ) => s"($qid, '${tok.replace("'", "''")}', ${occ.length})" }
    }.mkString(", ")
    s"""WITH q(q_id, tok, qtf) AS (VALUES $qRows),
       |dt AS (SELECT $idCol AS doc_id, unnest(string_split($textCol, ' ')) AS tok FROM $tbl),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM dt
       |       WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2),
       |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT q.q_id, tf.doc_id,
       |              sum(q.qtf * tf.tf * (64 - length(ltrim(bin(dfq.df), '0')))) AS score
       |       FROM q JOIN tf USING (tok) JOIN dfq USING (tok) GROUP BY 1, 2),
       |r AS (SELECT q_id, doc_id, score,
       |             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rk
       |      FROM sc)
       |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, CAST(score AS BIGINT) AS score,
       |       CAST(rk AS BIGINT) AS rk
       |FROM r WHERE rk <= $k ORDER BY q_id, rk""".stripMargin.replace("\n", " ")
  }
}
