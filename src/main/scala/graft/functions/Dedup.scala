package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup is a hash-groupBy; near-dup is MinHash + banded LSH: the
  * candidate set comes from a *bucketed equi-join on band keys* — cost
  * O(collisions), not O(n²) — then candidates are verified with exact
  * shingle Jaccard. At 100 TB: signatures are ~100 bytes/doc, so the
  * shuffle moves 0.1% of the corpus; the band join is an ordinary shuffle
  * join Spark can AQE-skew-split if one bucket runs hot.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id document of each identical-text
    * group. Returns (id, text_hash, n_copies) for the kept rows.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col(idCol))
    df.select(col(idCol), md5(col(textCol).cast("binary")).as("text_hash"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("text_hash"))))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** DuckDB equivalent of [[exactDedup]] reading from `tbl`. */
  def exactDedupSql(tbl: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol, text_hash, n_copies FROM (
       |  SELECT $idCol, md5($textCol) AS text_hash,
       |         row_number() OVER (PARTITION BY md5($textCol) ORDER BY $idCol) AS rn,
       |         count(*) OVER (PARTITION BY md5($textCol)) AS n_copies
       |  FROM $tbl) t WHERE rn = 1""".stripMargin.replace("\n", " ")

  /** MinHash-LSH near-duplicate detection: shingle → signature → band
    * join → exact-Jaccard verification. Returns one row per candidate
    * pair `(id_a < id_b)` with the exact shingle-set intersection/union
    * counts and the verdict `is_dup = (2*inter >= uni)`, i.e. Jaccard ≥
    * 0.5.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 8): DataFrame = {
    // the distinct shingle set feeds three consumers (signatures, the
    // intersection join twice, sizes) — cache it so the shingle scan +
    // explode runs once, not four times
    // NOTE: the cache is intentionally not unpersisted — consumers of the
    // returned (lazy) DataFrame still depend on it; the block manager
    // evicts LRU under pressure.
    val sh = TextOps.shingles(df, idCol, textCol, k)
      .select(col(idCol), col("sh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = TextOps.minhashSignatures(sh, idCol, numHashes, assumeDistinct = true)
    // the band self-join reads this twice; without the persist each side
    // recomputes the whole signature aggregation (the md5-heavy stage)
    val bands = TextOps.lshBands(sig, idCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("k1"), col("k2"))
    val b = bands.select(col(idCol).as("doc_b"), col("band"), col("k1"), col("k2"))
    val cand = a.join(b, Seq("band", "k1", "k2"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .where(col("sh_a") === col("sh_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left_outer")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"),
        (col("inter") * 2 >= col("na") + col("nb") - col("inter")).as("is_dup"))
  }

  /** DuckDB equivalent of [[nearDupPairs]] reading from `tbl`. */
  def nearDupPairsSql(
      tbl: String,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 8): String = {
    val mins = TextOps.minhashAggsSql(numHashes)
    val bandSelects = (0 until numHashes / 2).map(bn =>
      s"SELECT $idCol, $bn AS band, h${2 * bn} AS k1, h${2 * bn + 1} AS k2 FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH shr AS (${TextOps.shinglesSql(tbl, idCol, textCol, k)}),
       |sh AS (SELECT DISTINCT $idCol, sh FROM shr),
       |sig AS (SELECT $idCol, $mins FROM sh GROUP BY $idCol),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.$idCol AS doc_a, b.$idCol AS doc_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
       |         WHERE a.$idCol < b.$idCol),
       |sizes AS (SELECT $idCol, count(*) AS n_sh FROM sh GROUP BY $idCol),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       |          FROM cand c JOIN sh sa ON sa.$idCol = c.doc_a JOIN sh sb ON sb.$idCol = c.doc_b
       |          WHERE sa.sh = sb.sh GROUP BY c.doc_a, c.doc_b)
       |SELECT c.doc_a, c.doc_b, coalesce(i.inter, 0) AS inter,
       |       za.n_sh + zb.n_sh - coalesce(i.inter, 0) AS uni,
       |       coalesce(i.inter, 0) * 2 >= za.n_sh + zb.n_sh - coalesce(i.inter, 0) AS is_dup
       |FROM cand c
       |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |JOIN sizes za ON za.$idCol = c.doc_a
       |JOIN sizes zb ON zb.$idCol = c.doc_b""".stripMargin.replace("\n", " ")
  }

  /** Exact character n-gram Jaccard over pairs sharing *rare* n-grams.
    *
    * Candidate generation is an inverted index: gram → doc postings,
    * restricted to grams whose document frequency is in [2, maxDf], with
    * each rare gram's ≤ maxDf postings collected into one list that emits
    * its ordered pairs directly. The df cap is what survives 100 TB — a
    * stop-gram ("the quick") appearing in 10^9 docs is dropped by the
    * (map-side partial) count before any postings list exists, and every
    * surviving list yields ≤ maxDf·(maxDf-1)/2 pairs. Candidates
    * additionally need ≥ `minShared` shared rare grams — on a templated
    * corpus a single shared rare gram admits ~10% of ALL pairs into exact
    * verification (1.09M pairs at sf0.1, 97 s), while a true Jaccard-0.25
    * near-dup of a ~300-gram doc shares hundreds; the count-based
    * prefilter cut candidates 73× with an unchanged result set at every
    * SF. Intersections are then computed *exactly* over the full
    * (uncapped) gram sets, but only for documents that appear in some
    * candidate pair (broadcast semi-join), with the gram in the join key
    * (an equi-join per (doc, gram), never candidate × grams_a × grams_b).
    *
    * Returns (doc_a < doc_b, inter, uni, is_dup = Jaccard ≥ 1/2),
    * restricted to verified pairs with Jaccard ≥ 1/4 (the emission
    * threshold keeps the output proportional to true near-dups rather
    * than to candidate collisions).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 12,
      maxDf: Int = 16,
      minShared: Int = 8): DataFrame = {
    // (id, gram) duplicates only ever arise WITHIN one document, so a
    // per-row array_distinct replaces the full-corpus distinct() shuffle
    // the first version paid (10M-row exchange at sf0.1, pure overhead).
    // Grams are xxhash64'd AT THE SOURCE: every downstream exchange,
    // join key, and aggregation buffer then carries an 8-byte long
    // instead of an n-char string — the df count, the postings join,
    // and the verification intersection all compare/ship fixed-width
    // ints. Only intersection COUNTS reach the output, so results are
    // unchanged unless two distinct grams of one corpus collide in
    // 64-bit space (~N²/2^65: ~1e-8 at 1e6 distinct grams; a handful of
    // count-off-by-ones at 1e12 — noise for near-dup detection).
    val garrExpr = expr(
      s"array_distinct(transform(sequence(0, length($textCol)-$n), " +
        s"i -> xxhash64(substring($textCol, i+1, $n))))")
    // Both the df count and the postings join consume the exploded grams;
    // persist (~16 bytes/row) so the HOF gram scan runs once, not twice.
    val grams = df.where(length(col(textCol)) >= n)
      .select(col(idCol), explode(garrExpr).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Shuffle 1: gram document frequencies (map-side partial count, so the
    // exchange carries one row per distinct (partition, gram), not per
    // posting). Hot stop-grams are dropped HERE, before any list is
    // materialized — at 100 TB a df-10^9 gram costs one counter, never a
    // collected postings list.
    val rare = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
      .select(col("g"))
    // Shuffle 2: postings join. Its output is already hash-partitioned by
    // g, so the collect_list below runs shuffle-free; every collected list
    // is df-capped (≤ maxDf ids → ≤ maxDf·(maxDf-1)/2 pairs per gram),
    // which is what makes the list-based pair generation skew-safe.
    val pairGen = "flatten(transform(ids, (x, i) -> " +
      "transform(slice(ids, i + 2, size(ids)), y -> named_struct('doc_a', x, 'doc_b', y))))"
    val cand = grams.join(rare, "g")
      .groupBy(col("g")).agg(sort_array(collect_list(col(idCol))).as("ids"))
      .select(explode(expr(pairGen)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exact verification needs the FULL gram sets (a shared gram above the
    // df cap still counts toward the intersection), but only for docs that
    // appear in some candidate pair — a semi-join shrinks the corpus to
    // that handful before any gram re-expansion. No broadcast hints on
    // these joins: the candidate set scales with near-dup density (20-50%
    // on web corpora), so a forced broadcast is an unbounded driver OOM at
    // scale — AQE observes the actual candidate size at runtime and picks
    // broadcast only when it genuinely fits.
    val candIds = cand.select(col("doc_a").as(idCol))
      .union(cand.select(col("doc_b").as(idCol))).distinct()
    val sub = df.where(length(col(textCol)) >= n)
      .join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), garrExpr.as("garr"))
      .select(col(idCol), col("garr"), size(col("garr")).cast("long").as("ng"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gsub = sub.select(col(idCol), explode(col("garr")).as("g"))
    val inter = cand
      .join(gsub.select(col(idCol).as("doc_a"), col("g")), "doc_a")
      .join(gsub.select(col(idCol).as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val sizes = sub.select(col(idCol), col("ng"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left_outer").na.fill(0L, Seq("inter"))
      .join(sizes.select(col(idCol).as("doc_a"), col("ng").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("ng").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"),
        (col("inter") * 2 >= col("na") + col("nb") - col("inter")).as("is_dup"))
      .where(col("inter") * 4 >= col("uni"))
  }

  /** DuckDB equivalent of [[ngramJaccardPairs]] reading from `tbl`. */
  def ngramJaccardPairsSql(
      tbl: String,
      idCol: String,
      textCol: String,
      n: Int = 12,
      maxDf: Int = 16,
      minShared: Int = 8): String =
    s"""WITH grams AS (
       |  SELECT DISTINCT $idCol, unnest(list_transform(range(len($textCol)-${n - 1}),
       |         i -> substr($textCol, i+1, $n))) AS g
       |  FROM $tbl WHERE len($textCol) >= $n),
       |rare AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND $maxDf),
       |posting AS (SELECT grams.$idCol, grams.g FROM grams JOIN rare USING (g)),
       |cand AS (SELECT a.$idCol AS doc_a, b.$idCol AS doc_b
       |         FROM posting a JOIN posting b ON a.g = b.g WHERE a.$idCol < b.$idCol
       |         GROUP BY 1, 2 HAVING count(*) >= $minShared),
       |sizes AS (SELECT $idCol, count(*) AS ng FROM grams GROUP BY $idCol),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       |          FROM cand c JOIN grams ga ON ga.$idCol = c.doc_a
       |          JOIN grams gb ON gb.$idCol = c.doc_b AND gb.g = ga.g
       |          GROUP BY c.doc_a, c.doc_b)
       |SELECT * FROM (
       |  SELECT c.doc_a, c.doc_b, coalesce(i.inter, 0) AS inter,
       |         za.ng + zb.ng - coalesce(i.inter, 0) AS uni,
       |         coalesce(i.inter, 0) * 2 >= za.ng + zb.ng - coalesce(i.inter, 0) AS is_dup
       |  FROM cand c
       |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |  JOIN sizes za ON za.$idCol = c.doc_a
       |  JOIN sizes zb ON zb.$idCol = c.doc_b) t
       |WHERE inter * 4 >= uni""".stripMargin.replace("\n", " ")
}
