package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, MinHash signatures, LSH banding, SimHash,
  * winnowing fingerprints, language-ID and quality heuristics.
  *
  * Everything is expressed with codegen'd built-ins (`split`, `transform`,
  * `md5`, `conv`, aggregates) — no UDFs — so the hot path stays inside
  * whole-stage codegen and shuffles only move compact signatures, never
  * token streams.
  *
  * The hash everywhere is [[portableHash]]: the top 60 bits of md5, which
  * any engine can reproduce (DuckDB: `('0x' || substr(md5(s),1,15))::
  * BIGINT`) — so every operator here is oracle-checkable bit-for-bit.
  */
object TextOps {

  /** Hash-family switch: `"md5"` (default) is the cross-engine portable
    * family every DuckDB oracle replays bit-for-bit; `"xxhash64"` swaps
    * in Spark's codegen'd xxhash64 for PRODUCTION runs where no external
    * oracle needs to reproduce values — same positive-60-bit domain, so
    * every downstream operator (affine MinHash, banding, winnowing,
    * window stats) is family-agnostic, and only the hash VALUES change
    * (pair sets / counts are equal modulo 60-bit collisions; PipelineSpec
    * asserts set-level equality on real near-dup fixtures). md5 is the
    * measured hot cost of the signature stages at 1M docs — the oracle
    * tax this flag removes (stress stages `*_xx`).
    * JVM-wide (system property `graft.hash.family`), read at PLAN BUILD
    * time on the driver — never flip it between building an index and
    * probing it.
    */
  final val HashFamilyProp = "graft.hash.family"
  private def xxMode: Boolean = System.getProperty(HashFamilyProp, "md5") == "xxhash64"

  /** 60-bit positive hash of `salt || c` — identical across engines in
    * the default md5 family (DuckDB twin: [[portableHashSql]]); see
    * [[HashFamilyProp]] for the production xxhash64 family.
    */
  def portableHash(c: Column, salt: String = ""): Column =
    if (xxMode)
      xxhash64(concat(lit(salt), c)).bitwiseAND(lit(0x0FFFFFFFFFFFFFFFL))
    else
      conv(substring(md5(concat(lit(salt), c).cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL equivalent of [[portableHash]] over expression `e`. */
  def portableHashSql(e: String, salt: String = ""): String =
    if (salt.isEmpty) s"('0x' || substr(md5($e), 1, 15))::BIGINT"
    else s"('0x' || substr(md5('$salt' || $e), 1, 15))::BIGINT"

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-row shingle ARRAY over a `tk` token-array column: the k-gram
    * strings in document order (duplicates kept). The one place the
    * cross-engine shingle construction lives for the array-HOF operators
    * (near-dup verification, winnowing); [[shingles]] is the exploded-row
    * form of the same contract.
    */
  def shingleArr(k: Int): Column = {
    val grams = (0 until k).map(j => s"tk[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    expr(s"transform(sequence(0, size(tk)-$k), i -> $grams)")
  }

  /** Word k-gram shingles with positions: one row per (id, pos, shingle).
    * Documents shorter than k words yield no rows.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val grams = (0 until k).map(j => s"tk[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= k)
      .select(col(idCol),
        posexplode(expr(s"transform(sequence(0, size(tk)-$k), i -> $grams)")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("sh"))
  }

  /** DuckDB CTE body producing the same (id, pos, sh) rows from `tbl`.
    * DuckDB lists are 1-based where Spark subscripts are 0-based; `pos`
    * is 0-based in both outputs.
    */
  def shinglesSql(tbl: String, idCol: String, textCol: String, k: Int = 3): String = {
    val grams = (1 to k).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    s"""SELECT $idCol, u.pos AS pos, u.s AS sh FROM (
       |  SELECT $idCol, unnest(list_transform(range(len(tk)-${k - 1}),
       |         i -> struct_pack(pos := i, s := $grams))) AS u
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl)
       |  WHERE len(tk) >= $k) t""".stripMargin.replace("\n", " ")
  }

  /** Affine MinHash family over the 31-bit reduction of [[portableHash]]:
    * `h_i(x) = (a_i * (H(x) mod P) + b_i) mod P`, P = 2^31-1. ONE md5 per
    * shingle instead of `numHashes` salted md5s — the signature aggregate
    * was the q31/q32 hot spot (8x md5 over every shingle, twice). The
    * constants are generated deterministically here and inlined as
    * literals on both the Spark and oracle sides, so the family is still
    * oracle-checkable bit-for-bit. a_i*(H mod P) < 2^62 — no overflow in
    * either engine's BIGINT.
    */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashConsts(i: Int): (Long, Long) = {
    val a = (1103515245L * (i + 1) + 12345L) % (MinhashP - 2) + 1
    val b = (1103515245L * (i + 101) + 54321L) % MinhashP
    (a, b)
  }

  /** MinHash signature per id over distinct shingles: `numHashes` columns
    * `h0..h{n-1}`, each the min of an affine rehash of one shared
    * [[portableHash]]. One narrow
    * shuffle on id; partial min aggregation keeps it map-side combined.
    */
  def minhashSignatures(
      shingleDf: DataFrame,
      idCol: String,
      numHashes: Int = 8,
      assumeDistinct: Boolean = false): DataFrame = {
    val hb = portableHash(col("sh")) % lit(MinhashP)
    val aggs = (0 until numHashes).map { i =>
      val (a, b) = minhashConsts(i)
      min((lit(a) * hb + lit(b)) % lit(MinhashP)).as(s"h$i")
    }
    // callers holding an already-distinct (cached) shingle set skip the
    // dedup — a redundant distinct above a cache boundary is a full extra
    // shuffle Catalyst cannot eliminate. (min() is dedup-insensitive, so
    // distinct is only an optimization either way.)
    val sh = shingleDf.select(col(idCol), col("sh"))
    val base = if (assumeDistinct) sh else sh.distinct()
    base.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB aggregate list matching [[minhashSignatures]]: `min(...) AS
    * h0, ...` over a shingle column `sh`.
    */
  def minhashAggsSql(numHashes: Int = 8): String =
    (0 until numHashes).map { i =>
      val (a, b) = minhashConsts(i)
      s"min(($a * (${portableHashSql("sh")} % $MinhashP) + $b) % $MinhashP) AS h$i"
    }.mkString(", ")

  /** LSH banding of a MinHash signature: (id, band, k1, k2) rows, two
    * hashes per band. Near-dup candidates are ids sharing any full band —
    * a bucketed equi-join, never an all-pairs comparison (the only shape
    * that survives 100 TB).
    */
  def lshBands(sigDf: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    require(numHashes % 2 == 0)
    // stack() unpivots in ONE pass over the signature aggregate — a union
    // of per-band selects would recompute the whole signature aggregation
    // once per band (visible as 4x HashAggregate in the physical plan)
    val rows = (0 until numHashes / 2)
      .map(b => s"$b, h${2 * b}, h${2 * b + 1}").mkString(", ")
    sigDf.select(col(idCol),
      expr(s"stack(${numHashes / 2}, $rows) AS (band, k1, k2)"))
  }

  /** SimHash over distinct whitespace tokens: `bits`-wide sign-sum
    * fingerprint (Charikar). Hamming-close simhashes ⇒ similar docs.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("tok")).distinct()
      .withColumn("hv", portableHash(col("tok")))
    val sums = (0 until bits).map(b =>
      sum(when(expr(s"(hv >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (0 until bits).map(b =>
      when(col(s"s$b") > 0, 1L << b).otherwise(0L)).reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** DuckDB equivalent of [[simhash]] reading from `tbl`. */
  def simhashSql(tbl: String, idCol: String, textCol: String, bits: Int = 16): String = {
    val sums = (0 until bits).map(b =>
      s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
    val sig = (0 until bits).map(b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""SELECT $idCol, CAST($sig AS BIGINT) AS simhash FROM (
       |  SELECT $idCol, $sums FROM (
       |    SELECT DISTINCT $idCol, ${portableHashSql("tok")} AS hv FROM (
       |      SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $tbl) u)
       |  GROUP BY $idCol) s""".stripMargin.replace("\n", " ")
  }

  /** Winnowing fingerprints computed per-row from the text: the shingle
    * hash sequence, the sliding-window minima and the dedup are all
    * array HOFs inside one narrow projection, so the operator runs
    * shuffle-free end to end — where the exploded-input variant
    * ([[winnowFingerprints]]) pays two WindowExec passes (a per-doc sort
    * each) to compute the same minima. Semantics are identical: min
    * [[portableHash]] per window of `w` consecutive k-shingles, full
    * windows only, deduplicated per doc. Returns (id, fp) rows.
    */
  def winnowFromText(
      df: DataFrame, idCol: String, textCol: String, k: Int = 3, w: Int = 4): DataFrame = {
    Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= k + w - 1) // at least one full window
      .select(col(idCol), shingleArr(k).as("sharr"))
      .select(col(idCol), transform(col("sharr"), s => portableHash(s)).as("hv"))
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(1, size(hv)-${w - 1}), i -> array_min(slice(hv, i, $w))))")).as("fp"))
  }

  /** Winnowing fingerprints (Schleimer et al.): min k-gram hash per
    * sliding window of `w` consecutive shingles, deduplicated — the
    * standard document-fingerprinting scheme for plagiarism/near-dup
    * detection. Returns (id, fp) rows. Generic-input variant over
    * pre-exploded (id, pos, sh) rows; when the shingles come straight
    * from a text column, [[winnowFromText]] computes the same result
    * without the two window passes.
    */
  def winnowFingerprints(shingleDf: DataFrame, idCol: String, w: Int = 4): DataFrame = {
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val nWin = Window.partitionBy(col(idCol))
    shingleDf
      .withColumn("hv", portableHash(col("sh")))
      .withColumn("n", count(lit(1)).over(nWin))
      .withColumn("fp", min(col("hv")).over(win))
      .where(col("pos") <= col("n") - w) // full windows only
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** Stopword profiles for the n-gram language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "to", "and"),
    "es" -> Seq("el", "la", "de", "y", "en"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  /** Language-ID: count stopword hits per profile, predict the argmax
    * (alphabetical tie-break). Pure column arithmetic — no UDF.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).as("tk"))
    val scored = langProfiles.foldLeft(base) { case (d, (lang, words)) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      d.withColumn(s"s_$lang", expr(s"size(filter(tk, t -> t IN ($list)))").cast("long"))
    }
    val m = greatest(langProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = langProfiles.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"s_$l") === m, lit(l)).otherwise(acc)
    }
    // foldRight keeps alphabetical preference: the FIRST profile equal to
    // the max wins, so evaluate de before en before es before fr.
    scored.select((col(idCol) +: langProfiles.map { case (l, _) => col(s"s_$l") }) :+
      pred.as("pred_lang"): _*)
  }

  /** DuckDB equivalent of [[langId]] reading from `tbl`. */
  def langIdSql(tbl: String, idCol: String, textCol: String): String = {
    val scores = langProfiles.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(tk, t -> t IN ($list))) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val m = "greatest(" + langProfiles.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val pred = langProfiles.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""SELECT $idCol, ${langProfiles.map { case (l, _) => s"s_$l" }.mkString(", ")},
       |$pred AS pred_lang FROM (
       |  SELECT $idCol, $scores FROM (
       |    SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl) t) s""".stripMargin.replace("\n", " ")
  }

  /** Quality-score heuristic: integer-scaled blend of length, vocabulary
    * diversity, and stopword density (all-integer so it is exactly
    * reproducible anywhere).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String, nCharsCol: String): DataFrame = {
    val stop = langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
    df.select(col(idCol), col(nCharsCol), tokens(col(textCol)).as("tk"))
      .select(
        col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        expr("size(array_distinct(tk))").cast("long").as("n_uniq"),
        expr(s"size(filter(tk, t -> t IN ($stop)))").cast("long").as("n_stop"),
        col(nCharsCol).as("n_chars"))
      .withColumn("score",
        col("n_tokens") * 2 + col("n_uniq") * 3 + col("n_stop") * 5 - expr("n_chars div 10"))
  }

  /** Whitespace and BPE-ish regex token counts per document. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Sequence packing for pretraining data assembly — the
    * concat-then-chunk discipline: documents are concatenated in a
    * deterministic order and cut into fixed `maxLen`-token sequences, so
    * each doc lands at `(pack_id, pack_offset)` (a doc may straddle a
    * pack boundary, as in standard GPT-style packing). Returns
    * (id, shard, pack_id, pack_offset, n_tokens); a pack is the
    * `(shard, pack_id)` pair.
    *
    * 100 TB shape: a single global concatenation order would be one
    * window over the corpus — a scale-killer. Instead docs hash into
    * `numShards` INDEPENDENT streams (packs never span shards, so
    * sharding changes nothing downstream), each stream is one
    * partitioned cumulative sum, and the hash order makes the result
    * identical on any cluster, any partitioning, any run. Size
    * `numShards` to the cluster; packs-per-shard stays balanced by the
    * hash.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxLen: Long = 2048,
      numShards: Int = 64): DataFrame =
    packSequencesCounted(
      df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, "n_tokens", maxLen, numShards)

  /** [[packSequences]] over PRECOMPUTED per-doc token counts — the
    * counting rule is a parameter of the pipeline, not of the packing
    * discipline. This is how packing consumes a real tokenizer: feed it
    * `Bpe.trainEncode(...)`'s `n_pieces` (q127) and quota/boundary math
    * runs on the token counts a model would actually see, with the
    * identical shard/prefix-sum shape.
    */
  def packSequencesCounted(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      maxLen: Long = 2048,
      numShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLen > 0 && numShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        portableHash(col(idCol).cast("string")).as("hv"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("shard", (col("hv") % numShards).cast("int"))
      .withColumn("cum_after", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"),
        expr(s"(cum_after - n_tokens) div $maxLen").as("pack_id"),
        ((col("cum_after") - col("n_tokens")) % maxLen).as("pack_offset"),
        col("n_tokens"))
  }

  /** Token-budget mixture sampling — the training-mix step: every
    * stratum (language/source) contributes documents in a deterministic
    * hash order until its TOKEN budget is exhausted; the doc straddling
    * the boundary is kept (budgets are soft by one doc, the standard
    * convention). Returns (id, stratum, pos, n_tokens, kept) where `pos`
    * is the doc's global token position within its stratum's order —
    * reproducible on any cluster, any partitioning, any run.
    *
    * 100 TB shape: a global per-stratum cumulative sum would be one
    * window per stratum — a handful of partitions doing all the work.
    * Instead this runs the classic PARALLEL PREFIX SUM: per-(stratum,
    * shard) token totals (one tiny aggregate, strata × shards rows —
    * driver-bounded by construction), prefix offsets per stratum
    * broadcast back, then a per-shard window adds its offset — exact
    * global positions with every shard's window independent. Stratum
    * order is (shard, hash, id): shard-concatenated, so the sharded sum
    * and a sequential replay agree exactly.
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long,
      numShards: Int = 64): DataFrame =
    tokenBudgetSampleCounted(
      df.select(col(idCol), col(stratumCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, stratumCol, "n_tokens", budgets, defaultBudget, numShards)

  /** [[tokenBudgetSample]] over PRECOMPUTED per-doc token counts — the
    * [[packSequencesCounted]] principle applied to the mixture step:
    * quotas spend the tokens a model would actually see when fed
    * `Bpe.trainEncode`'s piece counts (q130).
    */
  def tokenBudgetSampleCounted(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nTokensCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long,
      numShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0 && defaultBudget >= 0)
    val spark = df.sparkSession
    import spark.implicits._
    // base is evaluated twice (tiny totals aggregate + the final pass) —
    // deliberately NOT persisted: the projection is narrow and cheap, and
    // this operator pins nothing a caller can't release
    val base = df.select(col(idCol), col(stratumCol).cast("string").as("stratum"),
        portableHash(col(idCol).cast("string")).as("hv"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("shard", (col("hv") % numShards).cast("int"))
    // parallel prefix sum, stage 1: per-(stratum, shard) totals →
    // per-stratum offsets in shard order (strata × numShards rows on
    // the driver — bounded, this is the model not the data)
    val totals = base.groupBy(col("stratum"), col("shard"))
      .agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val offsets = totals.groupBy(_._1._1).iterator.flatMap { case (st, rows) =>
      var acc = 0L
      rows.sortBy(_._1._2).map { case ((_, sh), tot) =>
        val off = acc; acc += tot; (st, sh, off)
      }
    }.toSeq.toDF("stratum", "shard", "offset")
    // stage 2: independent per-shard windows + broadcast offsets
    val w = Window.partitionBy(col("stratum"), col("shard"))
      .orderBy(col("hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) { case (e, (k, v)) =>
      when(col("stratum") === k, lit(v)).otherwise(e)
    }
    base.join(broadcast(offsets), Seq("stratum", "shard"))
      .withColumn("cum_in_shard", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("stratum"),
        (col("offset") + col("cum_in_shard") - col("n_tokens")).as("pos"),
        col("n_tokens"),
        ((col("offset") + col("cum_in_shard") - col("n_tokens")) < budgetExpr).as("kept"))
  }

  /** PII patterns shared by [[piiScrub]] and its oracle: kept inside the
    * RE2 ∩ java.util.regex common subset (no lookaround, no backrefs) so
    * Spark and DuckDB match byte-identically. Redaction order is part of
    * the contract (emails first — an email's host can contain an
    * IP-shaped substring).
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** PII detection + redaction: per doc, the match count of each PII
    * class and the scrubbed text with matches replaced by class tokens —
    * the standard pre-training privacy pass. Pure per-row regexp
    * expressions (codegen'd, shuffle-free), so the operator is a map at
    * any corpus scale. Returns (id, email_n, ip_n, phone_n, redacted).
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"${name}_n")
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    df.select((col(idCol) +: counts :+ redacted.as("redacted")): _*)
  }

  /** DuckDB twin of [[piiScrub]] over `textExpr` (RE2 needs the explicit
    * 'g' flag to replace all occurrences; Spark replaces all by default).
    */
  def piiScrubSql(tbl: String, idCol: String, textExpr: String): String = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all($textExpr, '$pat')) AS BIGINT) AS ${name}_n"
    }.mkString(", ")
    val redacted = PiiPatterns.foldLeft(textExpr) { case (e, (_, pat, tok)) =>
      s"regexp_replace($e, '$pat', '$tok', 'g')"
    }
    s"SELECT $idCol, $counts, $redacted AS redacted FROM $tbl"
  }

  /** Text normalization scrub — the standard ingest-side cleaning pass:
    * Unicode NFC composition ([[NfcNormalize]], a codegen Expression —
    * Spark has no built-in), C0/DEL control characters stripped (newline
    * and tab survive as whitespace for the squash), whitespace runs
    * collapsed to single spaces, ends trimmed. Pure per-row codegen
    * chain, a map at any corpus scale. Returns (id, text_clean,
    * changed). The control-strip runs BEFORE the `\s` squash so the
    * Java/RE2 `\s`-class difference (U+000B) can never matter.
    */
  def cleanText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(NfcNormalize(col(textCol)),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))
    df.select(col(idCol), cleaned.as("text_clean"),
      (cleaned =!= col(textCol)).as("changed"))
  }

  /** The [[cleanText]] normalization as a DuckDB scalar expression over
    * `textExpr` — shared by [[cleanTextSql]] and composed twins (q135).
    */
  def cleanTextExprSql(textExpr: String): String =
    "trim(regexp_replace(regexp_replace(nfc_normalize(" + textExpr +
      "), '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'), '\\s+', ' ', 'g'))"

  /** DuckDB twin of [[cleanText]] (utf8proc `nfc_normalize`; RE2 needs
    * the explicit 'g' flag).
    */
  def cleanTextSql(tbl: String, idCol: String, textExpr: String): String = {
    val cleaned = cleanTextExprSql(textExpr)
    s"SELECT $idCol, $cleaned AS text_clean, $cleaned <> $textExpr AS changed FROM $tbl"
  }

  /** Deterministic train/val/test assignment: bucket = [[portableHash]]
    * of the id (salted) mod 100, mapped through cumulative percent
    * ranges — stable under any partitioning, reshuffling, or re-run, and
    * reproducible by any engine (the property that matters when a 100 TB
    * corpus is split once and must never leak val rows into train on a
    * later rebuild). `splits` are (name, percent) in declaration order.
    */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)] = Seq(("train", 90), ("val", 5), ("test", 5)),
      salt: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val bucket = pmod(portableHash(col(idCol).cast("string"), salt), lit(100))
    val (expr, _) = splits.foldLeft((lit(null).cast("string"), 0)) {
      case ((e, lo), (name, pct)) =>
        (when(bucket >= lo && bucket < lo + pct, name).otherwise(e), lo + pct)
    }
    df.withColumn("split", expr)
  }

  /** DuckDB twin of [[splitAssign]]'s bucket→name mapping for `idExpr`. */
  def splitAssignSql(
      idExpr: String,
      splits: Seq[(String, Int)] = Seq(("train", 90), ("val", 5), ("test", 5)),
      salt: String = "split"): String = {
    val bucket = s"(${portableHashSql(s"CAST($idExpr AS VARCHAR)", salt)}) % 100"
    val (cases, _) = splits.foldLeft((List.empty[String], 0)) {
      case ((cs, lo), (name, pct)) =>
        (cs :+ s"WHEN $bucket >= $lo AND $bucket < ${lo + pct} THEN '$name'", lo + pct)
    }
    s"CASE ${cases.mkString(" ")} END"
  }

  /** Domain balancing: keep at most `cap` docs per group (source/domain),
    * chosen in deterministic salted-hash order — the "max N pages per
    * domain" step that stops a single crawl host from dominating a mix.
    * One window per group; group sizes are per-domain doc counts, and a
    * pathological mega-domain is exactly what the cap bounds downstream,
    * so the rank itself is the only place that sees the full group (swap
    * in [[graft.plans.GroupedTopKExec]]'s bounded heap via `TopK` when a
    * single domain exceeds executor memory). Adds (rank, kept).
    */
  def capPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      cap: Int,
      salt: String = "domcap"): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(portableHash(col(idCol).cast("string"), salt), col(idCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("rank") <= cap)
  }

  /** Corpus-level duplicated-window statistics: chunk each doc into
    * non-overlapping `w`-token windows, hash them, and count per doc how
    * many of its windows also occur elsewhere in the corpus — the
    * sub-document exact-dedup signal (boilerplate / template text that
    * near-dup DOC detection misses because the containing docs differ).
    * Returns (id, n_windows, n_dup) as exact integers; the filter
    * threshold (e.g. drop docs with n_dup/n_windows > 0.5) stays with
    * the caller. Two hash-keyed exchanges (global window counts +
    * join-back), both on compact (hash, count) rows — never the text.
    */
  def dupWindowStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 16): DataFrame = {
    require(w >= 1, "window must be >= 1 token")
    // non-overlapping w-token windows, hashed portably (trailing partial
    // window kept: short boilerplate docs must still collide)
    val wins = df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, (size(tk) - 1) div $w), i ->
           |  array_join(slice(tk, i * $w + 1, $w), ' '))""".stripMargin)).as("win"))
      .select(col(idCol), portableHash(col("win"), "dupwin").as("wh"))
    val counts = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col(idCol)).as("n_docs"))
    wins.join(counts, "wh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("n_docs") > 1 || col("n_total") > col("n_docs"), 1L)
          .otherwise(0L)).as("n_dup"))
  }

  /** DuckDB twin of [[dupWindowStats]]. */
  def dupWindowStatsSql(tbl: String, idCol: String, textCol: String, w: Int = 16): String = {
    val winExpr = s"array_to_string(tk[(i*$w+1):(i*$w+$w)], ' ')"
    s"""WITH wins AS (
       |  SELECT $idCol, ${portableHashSql(winExpr, "dupwin")} AS wh
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl) t
       |  CROSS JOIN UNNEST(range(0, (len(tk) - 1) // $w + 1)) AS u(i)),
       |c AS (SELECT wh, count(*) AS n_total, count(DISTINCT $idCol) AS n_docs
       |      FROM wins GROUP BY wh)
       |SELECT $idCol, count(*) AS n_windows,
       |       CAST(sum(CASE WHEN c.n_docs > 1 OR c.n_total > c.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |FROM wins JOIN c USING (wh) GROUP BY $idCol""".stripMargin.replace("\n", " ")
  }

  /** The actionable form of [[dupWindowStats]]: REMOVE the duplicated
    * windows (same non-overlapping w-token windows, same corpus-wide
    * duplication predicate) and rebuild each document's text from the
    * surviving windows in order — the boilerplate-scrub transform
    * (header/footer/template removal) that the statistic only measures.
    * Returns (id, n_windows, n_kept, text_scrubbed); a fully-boilerplate
    * doc scrubs to the empty string (the caller's length filter then
    * drops it).
    *
    * Scale: counts move as compact (hash, count) rows; the one exchange
    * that carries text is the doc-keyed rebuild — irreducible, since the
    * output IS text. Window strings cross the wh-keyed join exactly once.
    */
  def dupWindowScrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 16): DataFrame = {
    require(w >= 1, "window must be >= 1 token")
    val wins = df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, (size(tk) - 1) div $w), i ->
           |  array_join(slice(tk, i * $w + 1, $w), ' '))""".stripMargin)).as(Seq("pos", "win")))
      .withColumn("wh", portableHash(col("win"), "dupwin"))
    val counts = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col(idCol)).as("n_docs"))
    wins.join(counts, "wh")
      .withColumn("dup", col("n_docs") > 1 || col("n_total") > col("n_docs"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(!col("dup"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulled-out dup windows; order restored
        // by the struct sort on pos
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT dup THEN struct(pos, win) END)), s -> s.win)"),
          " ").as("text_scrubbed"))
  }

  /** DuckDB twin of [[dupWindowScrub]]. */
  def dupWindowScrubSql(tbl: String, idCol: String, textCol: String, w: Int = 16): String = {
    val winExpr = s"array_to_string(tk[(i*$w+1):(i*$w+$w)], ' ')"
    s"""WITH wins AS (
       |  SELECT $idCol, i AS pos, $winExpr AS win,
       |         ${portableHashSql(winExpr, "dupwin")} AS wh
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl) t
       |  CROSS JOIN UNNEST(range(0, (len(tk) - 1) // $w + 1)) AS u(i)),
       |c AS (SELECT wh, count(*) AS n_total, count(DISTINCT $idCol) AS n_docs
       |      FROM wins GROUP BY wh),
       |j AS (SELECT wins.$idCol, wins.pos, wins.win,
       |             (c.n_docs > 1 OR c.n_total > c.n_docs) AS dup
       |      FROM wins JOIN c USING (wh))
       |SELECT $idCol, count(*) AS n_windows,
       |       CAST(sum(CASE WHEN dup THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       |       coalesce(string_agg(CASE WHEN NOT dup THEN win END, ' ' ORDER BY pos), '') AS text_scrubbed
       |FROM j GROUP BY $idCol""".stripMargin.replace("\n", " ")
  }

  /** Tokenizer-encode step: map each document to its token-ID sequence
    * under the corpus's own ranked vocabulary (id = rank by count desc /
    * token asc; OOV → `oovId`) — the deterministic stand-in for a
    * trained tokenizer's encode pass, and the step that turns a text
    * corpus into model-ready integer sequences. The vocabulary is the
    * MODEL — ≤ `vocabSize` rows by construction — so it is collected,
    * ranked on the driver, and broadcast as a hash map; the encode is
    * then ONE narrow map over the token array (O(1) lookups, no shuffle).
    * The previous shape — posexplode → broadcast-join → per-doc
    * array_sort rebuild — paid a corpus-wide (doc, token) exchange plus
    * a per-doc sort for what is a pure per-row function; at 1M docs that
    * exchange was 70 s of the stress sweep. Only the vocab COUNT
    * aggregate (compact (token, n) rows, map-side partial) remains as a
    * shuffle. Returns (id, n_tokens, ids_str) with the ID sequence
    * space-joined — a portable, hash-comparable encoding of the array;
    * docs with zero non-empty tokens yield no row (join-shape parity
    * with the SQL twin).
    */
  def tokenIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int = 1000,
      oovId: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val vocabMap: Map[String, Long] = toks
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize) // TakeOrdered: ≤ vocabSize rows reach the driver
      .collect()
      .sortBy(r => (-r.getLong(1), r.getString(0)))
      .iterator.zipWithIndex.map { case (r, i) => r.getString(0) -> i.toLong }
      .toMap
    val bc = spark.sparkContext.broadcast(vocabMap)
    val enc = udf { (tks: Seq[String]) =>
      val m = bc.value
      var n = 0L
      val sb = new java.lang.StringBuilder
      tks.foreach { t =>
        if (t.nonEmpty) {
          if (n > 0) sb.append(' ')
          sb.append(m.getOrElse(t, oovId))
          n += 1
        }
      }
      (n, sb.toString)
    }
    df.select(col(idCol), enc(tokens(col(textCol))).as("e"))
      .where(col("e._1") > 0)
      .select(col(idCol), col("e._1").as("n_tokens"), col("e._2").as("ids_str"))
  }

  /** DuckDB twin of [[tokenIds]]. */
  def tokenIdsSql(
      tbl: String,
      idCol: String,
      textCol: String,
      vocabSize: Int = 1000,
      oovId: Long = -1L): String =
    s"""WITH w AS (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl),
       |t AS (SELECT $idCol, u.pos, u.tok FROM (
       |  SELECT $idCol, unnest(list_transform(range(len(tk)),
       |         i -> struct_pack(pos := i, tok := tk[i+1]))) AS u FROM w) q),
       |t2 AS (SELECT $idCol, pos, tok FROM t WHERE tok <> ''),
       |v AS (SELECT tok, row_number() OVER (ORDER BY n DESC, tok) - 1 AS tid FROM (
       |  SELECT tok, count(*) AS n FROM t2 GROUP BY tok
       |  ORDER BY n DESC, tok LIMIT $vocabSize) c),
       |j AS (SELECT t2.$idCol, t2.pos, coalesce(v.tid, $oovId) AS tid
       |      FROM t2 LEFT JOIN v USING (tok))
       |SELECT $idCol, count(*) AS n_tokens,
       |       string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS ids_str
       |FROM j GROUP BY $idCol""".stripMargin.replace("\n", " ")

  /** Token-surprisal quality score — the integer-exact stand-in for LM
    * perplexity filtering: each token's surprisal is `63 − ⌊log₂ c⌋`
    * (c = corpus count, so rare tokens score high), per doc we report
    * (n_tokens, surprisal_sum) and the caller thresholds the mean.
    * ⌊log₂ c⌋ is computed as bit-length − 1 via `bin()` string length —
    * exact in both engines (no float log anywhere, same trick as the
    * adaptive-banding oracle). One corpus count aggregate, one
    * token-keyed join-back (compact (token, count) rows), one doc
    * re-aggregate.
    */
  def surprisalScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .select(col("tok"), (lit(63) - (length(bin(col("c"))) - 1)).cast("long").as("surp"))
    toks.join(counts, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("surprisal_sum"))
  }

  /** DuckDB twin of [[surprisalScore]] (`bin()` is zero-padded there —
    * ltrim before measuring).
    */
  def surprisalScoreSql(tbl: String, idCol: String, textCol: String): String =
    s"""WITH w AS (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $tbl),
       |t AS (SELECT $idCol, tok FROM w WHERE tok <> ''),
       |c AS (SELECT tok, 63 - (length(ltrim(bin(count(*)), '0')) - 1) AS surp
       |      FROM t GROUP BY tok)
       |SELECT $idCol, count(*) AS n_tokens, CAST(sum(surp) AS BIGINT) AS surprisal_sum
       |FROM t JOIN c USING (tok) GROUP BY $idCol""".stripMargin.replace("\n", " ")

  /** Out-of-vocabulary statistics: build the corpus's top-`vocabSize`
    * token vocabulary (count desc, token asc — deterministic at the
    * boundary) and report per doc (n_tokens, n_oov) — the coverage
    * number that sizes a tokenizer or flags corpus/vocab drift. The
    * vocab is one count aggregate + a driver-bounded `limit` (O(vocab)
    * rows, the model not the data) broadcast back; the per-doc pass is
    * one explode + broadcast join + doc-keyed re-aggregate.
    */
  def oovStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** DuckDB twin of [[oovStats]]. */
  def oovStatsSql(tbl: String, idCol: String, textCol: String, vocabSize: Int = 1000): String =
    s"""WITH w AS (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $tbl),
       |t AS (SELECT $idCol, tok FROM w WHERE tok <> ''),
       |v AS (SELECT tok FROM (SELECT tok, count(*) AS n FROM t GROUP BY tok
       |      ORDER BY n DESC, tok LIMIT $vocabSize))
       |SELECT $idCol, count(*) AS n_tokens,
       |       CAST(sum(CASE WHEN t.tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
       |FROM t GROUP BY $idCol""".stripMargin.replace("\n", " ")

  /** Per-doc distinct char-`n`-gram hashes (one rolling pass — the q54
    * family; see [[NgramHashes]]). Bench and corpus sides must both use
    * this so hit-join keys line up.
    */
  private def gramSet(textCol: String, n: Int): Column =
    array_distinct(NgramHashes(col(textCol), n))

  /** Benchmark decontamination: score every corpus doc by its distinct
    * char-`n`-gram overlap with an eval/benchmark set, the standard
    * long-n-gram collision check run before training. Returns
    * (id, n_grams, n_hits, contaminated = any hit); docs shorter than
    * `n` chars carry no gram and are excluded (they cannot collide).
    *
    * 100 TB shape: the benchmark side is small by nature (eval sets are
    * MBs against a corpus of TBs) — its distinct gram-hash set is
    * BROADCAST, so the corpus pays one narrow gram projection, a
    * broadcast hash join, and ONE doc-keyed exchange of partial
    * (n_grams, n_hits) counters that combine map-side. Nothing
    * corpus-sized ever shuffles on a gram key.
    */
  def contamination(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    val benchGrams = broadcast(
      bench.where(length(col(textCol)) >= n)
        .select(explode(gramSet(textCol, n)).as("g")).distinct()
        .withColumn("hit", lit(1)))
    Par.fanOut(corpus.select(col(idCol), col(textCol))
        .where(length(col(textCol)) >= n))
      .select(col(idCol), explode(gramSet(textCol, n)).as("g"))
      .join(benchGrams, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** DuckDB equivalent of [[contamination]]: `tbl` split by `benchPred`
    * (benchmark set) vs its complement (corpus). Compares gram STRINGS
    * where Spark compares xxhash64 values — same documented collision
    * asymmetry as ngramJaccardPairsSql.
    */
  def contaminationSql(
      tbl: String,
      idCol: String,
      textCol: String,
      benchPred: String,
      n: Int = 13): String =
    s"""WITH bg AS (
       |  SELECT DISTINCT unnest(list_transform(range(len($textCol)-${n - 1}),
       |         i -> substr($textCol, i+1, $n))) AS g
       |  FROM $tbl WHERE ($benchPred) AND len($textCol) >= $n),
       |dg AS (
       |  SELECT DISTINCT $idCol, unnest(list_transform(range(len($textCol)-${n - 1}),
       |         i -> substr($textCol, i+1, $n))) AS g
       |  FROM $tbl WHERE NOT ($benchPred) AND len($textCol) >= $n)
       |SELECT $idCol, count(*) AS n_grams,
       |       CAST(coalesce(sum(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
       |       coalesce(sum(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END), 0) > 0 AS contaminated
       |FROM dg GROUP BY $idCol""".stripMargin.replace("\n", " ")

  /** Bigram-LM perplexity band filter — the CCNet-style (Wenzek et al.
    * 2020) corpus curation gate, integer-exact: a document's score is the
    * sum over its token TRANSITIONS (w1→w2) of the conditional surprisal
    * `⌊log₂ c(w1·)⌋ − ⌊log₂ c(w1,w2)⌋` (c(w1,w2) = corpus bigram count,
    * c(w1·) = transitions leaving w1 — so common continuations score 0,
    * rare ones high), and documents land in CCNet's head/middle/tail
    * bands by thresholding the mean surprisal ×10 (integer division —
    * no float anywhere, so the DuckDB twin replays it bit-for-bit; the
    * ⌊log₂⌋ is the same bit-length `bin()` trick as [[surprisalScore]]).
    * This upgrades q111's unigram stand-in to a real conditional model:
    * "the cat sat" scores low even when every unigram is rare, because
    * the transitions are predictable.
    *
    * Plan: one corpus exchange keyed on the bigram (compact
    * (w1,w2,count) rows — map-side combined, never token streams); the
    * context counts derive from the bigram counts (a second aggregate
    * over the already-compact model rows, NOT a second corpus pass);
    * the join-back moves (w1,w2,surp) rows and the doc re-aggregate is
    * the only doc-keyed exchange. Same 100 TB shape as q111/q105.
    * Docs with fewer than 2 tokens have no transitions and are dropped
    * (the q112 `n_tokens > 0` convention).
    */
  def bigramLmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      headMax10: Long = 20L,
      midMax10: Long = 40L): DataFrame =
    bigramScored(df, idCol, textCol)
      .withColumn("band",
        when(col("ppl10") <= headMax10, "head")
          .when(col("ppl10") <= midMax10, "middle")
          .otherwise("tail"))

  /** The band thresholds derived from the corpus itself — CCNet's actual
    * rule (the paper buckets by perplexity QUANTILES of the corpus, not
    * fixed values): head = ppl10 ≤ the pLow-th percentile, middle ≤ the
    * pHigh-th, tail above. The thresholds come from
    * [[Quantiles.radixQuantiles]] over the scored frame — 4 narrow
    * passes, no sort, and the driver sees exactly two (p, value) rows —
    * so the adaptive rule costs O(1) driver state at any corpus size
    * (the adaptive-banding pattern: the sizing rule is derivable by the
    * oracle, so no data value crosses engines). The scored frame is
    * persisted for the two passes (quantile scan + final projection).
    */
  def bigramLmBandsAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      pLowNum: Int = 33,
      pHighNum: Int = 66,
      pDen: Int = 100): DataFrame = {
    require(0 < pLowNum && pLowNum <= pHighNum && pHighNum <= pDen,
      s"need 0 < pLow <= pHigh <= pDen: $pLowNum/$pHighNum/$pDen")
    // eager Stages.mat (the Graph/Retrieval convention; deployment-safe
    // mode switch): the scored frame is materialized ONCE and feeds both
    // the quantile passes and the final projection; ContextCleaner
    // reclaims the blocks when the result frame is dropped
    val scored = Stages.mat(bigramScored(df, idCol, textCol))
    val qs = Quantiles.radixQuantiles(scored, "ppl10", Seq(pLowNum, pHighNum), pDen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap // 2 driver rows
    if (qs.isEmpty) // no scoreable docs: every row was < 2 tokens
      return scored.withColumn("band", lit("head")).where(lit(false))
    val (t1, t2) = (qs(pLowNum.toLong), qs(pHighNum.toLong))
    scored.withColumn("band",
      when(col("ppl10") <= t1, "head")
        .when(col("ppl10") <= t2, "middle")
        .otherwise("tail"))
  }

  /** [[bigramLmScore]] with HASH-KEYED exchanges — the 100 TB path (the
    * q105/q54 discipline): every shuffle and join moves (long, long)
    * hash keys instead of token-string pairs — `w1h` = [[portableHash]]
    * of the context, `bh` = of the space-joined bigram (space cannot
    * appear inside a token, so the pairing is injective). Counts are
    * exact modulo 60-bit collisions (~N²/2⁶¹ — documented asymmetry, as
    * q105), and the DuckDB twin hashes identically so parity stays
    * bit-exact. Under the production xxhash64 family
    * ([[HashFamilyProp]]) the hashing itself is codegen'd and cheap;
    * md5 is the oracle tax, quantified in the stress `_xx` stages.
    */
  def bigramLmScoreHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      headMax10: Long = 20L,
      midMax10: Long = 40L): DataFrame = {
    val tk = df.select(col(idCol),
      expr(s"filter(split($textCol, ' '), t -> t <> '')").as("tk"))
    val trans = tk.where(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(tk)-2), " +
          "i -> struct(element_at(tk, i+1) AS w1, element_at(tk, i+2) AS w2))")).as("b"))
      .select(col(idCol),
        portableHash(col("b.w1")).as("w1h"),
        portableHash(concat(col("b.w1"), lit(" "), col("b.w2"))).as("bh"))
    val cb = trans.groupBy(col("w1h"), col("bh")).agg(count(lit(1)).as("nb"))
    val cu = cb.groupBy(col("w1h")).agg(sum(col("nb")).as("nu"))
    val surp = cb.join(cu, "w1h")
      .select(col("bh"),
        (length(bin(col("nu"))) - length(bin(col("nb")))).cast("long").as("surp"))
    trans.join(surp, "bh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("surp")).as("surp_sum"))
      .select(col(idCol), col("n_trans"), col("surp_sum"),
        expr("surp_sum * 10 div n_trans").as("ppl10"))
      .withColumn("band",
        when(col("ppl10") <= headMax10, "head")
          .when(col("ppl10") <= midMax10, "middle")
          .otherwise("tail"))
  }

  /** DuckDB twin of [[bigramLmScoreHashed]] (identical md5 hashing on
    * both sides — collisions, if any, collide identically).
    */
  def bigramLmScoreHashedSql(
      tbl: String,
      idCol: String,
      textCol: String,
      headMax10: Long = 20L,
      midMax10: Long = 40L): String =
    s"""WITH w AS (SELECT $idCol,
       |  list_filter(string_split($textCol, ' '), t -> t <> '') AS tk FROM $tbl),
       |tr0 AS (SELECT $idCol, u.w1, u.w2 FROM (
       |  SELECT $idCol, unnest(list_transform(range(len(tk)-1),
       |    i -> struct_pack(w1 := tk[i+1], w2 := tk[i+2]))) AS u
       |  FROM w WHERE len(tk) >= 2) q),
       |tr AS (SELECT $idCol, ${portableHashSql("w1")} AS w1h,
       |  ${portableHashSql("w1 || ' ' || w2")} AS bh FROM tr0),
       |cb AS (SELECT w1h, bh, count(*) AS nb FROM tr GROUP BY w1h, bh),
       |cu AS (SELECT w1h, CAST(sum(nb) AS BIGINT) AS nu FROM cb GROUP BY w1h),
       |s AS (SELECT bh,
       |  CAST(length(ltrim(bin(nu), '0')) - length(ltrim(bin(nb), '0')) AS BIGINT) AS surp
       |  FROM cb JOIN cu USING (w1h)),
       |d AS (SELECT $idCol, count(*) AS n_trans, CAST(sum(surp) AS BIGINT) AS surp_sum
       |  FROM tr JOIN s USING (bh) GROUP BY $idCol)
       |SELECT $idCol, n_trans, surp_sum, surp_sum * 10 // n_trans AS ppl10,
       |  CASE WHEN surp_sum * 10 // n_trans <= $headMax10 THEN 'head'
       |       WHEN surp_sum * 10 // n_trans <= $midMax10 THEN 'middle'
       |       ELSE 'tail' END AS band
       |FROM d""".stripMargin.replace("\n", " ")

  /** (id, n_trans, surp_sum, ppl10) — the shared scoring core of
    * [[bigramLmScore]] / [[bigramLmBandsAuto]].
    */
  private def bigramScored(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = df.select(col(idCol),
      expr(s"filter(split($textCol, ' '), t -> t <> '')").as("tk"))
    val trans = tk.where(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(tk)-2), " +
          "i -> struct(element_at(tk, i+1) AS w1, element_at(tk, i+2) AS w2))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = trans.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nb"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("nb")).as("nu"))
    val surp = cb.join(cu, "w1")
      .select(col("w1"), col("w2"),
        (length(bin(col("nu"))) - length(bin(col("nb")))).cast("long").as("surp"))
    trans.join(surp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("surp")).as("surp_sum"))
      .select(col(idCol), col("n_trans"), col("surp_sum"),
        expr("surp_sum * 10 div n_trans").as("ppl10"))
  }

  /** The shared scoring CTE chain of the bigram-LM twins: ends in
    * `sc(id, n_trans, surp_sum, ppl10)` (`bin()` zero-pads in DuckDB —
    * ltrim before measuring, exactly as [[surprisalScoreSql]]).
    */
  private def bigramScoredCtes(tbl: String, idCol: String, textCol: String): String =
    s"""w AS (SELECT $idCol,
       |  list_filter(string_split($textCol, ' '), t -> t <> '') AS tk FROM $tbl),
       |tr AS (SELECT $idCol, u.w1, u.w2 FROM (
       |  SELECT $idCol, unnest(list_transform(range(len(tk)-1),
       |    i -> struct_pack(w1 := tk[i+1], w2 := tk[i+2]))) AS u
       |  FROM w WHERE len(tk) >= 2) q),
       |cb AS (SELECT w1, w2, count(*) AS nb FROM tr GROUP BY w1, w2),
       |cu AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nu FROM cb GROUP BY w1),
       |s AS (SELECT w1, w2,
       |  CAST(length(ltrim(bin(nu), '0')) - length(ltrim(bin(nb), '0')) AS BIGINT) AS surp
       |  FROM cb JOIN cu USING (w1)),
       |d AS (SELECT $idCol, count(*) AS n_trans, CAST(sum(surp) AS BIGINT) AS surp_sum
       |  FROM tr JOIN s USING (w1, w2) GROUP BY $idCol),
       |sc AS (SELECT $idCol, n_trans, surp_sum, surp_sum * 10 // n_trans AS ppl10 FROM d)""".stripMargin

  /** DuckDB twin of [[bigramLmScore]]. */
  def bigramLmScoreSql(
      tbl: String,
      idCol: String,
      textCol: String,
      headMax10: Long = 20L,
      midMax10: Long = 40L): String =
    s"""WITH ${bigramScoredCtes(tbl, idCol, textCol)}
       |SELECT $idCol, n_trans, surp_sum, ppl10,
       |  CASE WHEN ppl10 <= $headMax10 THEN 'head'
       |       WHEN ppl10 <= $midMax10 THEN 'middle'
       |       ELSE 'tail' END AS band
       |FROM sc""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[bigramLmBandsAuto]] — replays the quantile rule
    * (value at 1-based ascending position ⌈p·n⌉, the
    * [[Quantiles.radixQuantiles]] convention) instead of receiving the
    * thresholds, so no data-derived value crosses engines.
    */
  def bigramLmBandsAutoSql(
      tbl: String,
      idCol: String,
      textCol: String,
      pLowNum: Int = 33,
      pHighNum: Int = 66,
      pDen: Int = 100): String =
    s"""WITH ${bigramScoredCtes(tbl, idCol, textCol)},
       |r AS (SELECT ppl10, row_number() OVER (ORDER BY ppl10) AS rn,
       |             count(*) OVER () AS n FROM sc),
       |t1 AS (SELECT min(ppl10) AS v FROM r WHERE rn >= ($pLowNum * n + ${pDen - 1}) // $pDen),
       |t2 AS (SELECT min(ppl10) AS v FROM r WHERE rn >= ($pHighNum * n + ${pDen - 1}) // $pDen)
       |SELECT $idCol, n_trans, surp_sum, ppl10,
       |  CASE WHEN ppl10 <= (SELECT v FROM t1) THEN 'head'
       |       WHEN ppl10 <= (SELECT v FROM t2) THEN 'middle'
       |       ELSE 'tail' END AS band
       |FROM sc""".stripMargin.replace("\n", " ")

  /** Deterministic epoch shuffle into training shards — the pipeline's
    * last step before the trainer reads: every doc gets a shard (uniform
    * over `numShards` by [[portableHash]] of the id) and a position
    * within that shard (rank of a second, independent hash — ties broken
    * by id), so the global read order `(shard, pos)` is a seeded
    * pseudo-random permutation that any engine reproduces exactly
    * (re-seed per epoch via `seed`). Returns (id, shard, pos).
    *
    * Plan: one exchange on the shard key + an in-shard sort — which is
    * precisely `repartition(shard).sortWithinPartitions(h2)`, the only
    * scalable form of a global shuffle (a corpus-wide `ORDER BY
    * rand()` is a single total sort; this is `numShards` independent
    * ones). Shard keys are uniform 60-bit hashes, so there is no skew
    * by construction; at 100 TB the caller sizes `numShards` so
    * corpus/numShards fits one task's sort budget, exactly like q95's
    * packing shards.
    */
  def shardShuffle(
      df: DataFrame,
      idCol: String,
      numShards: Int = 8,
      seed: String = "epoch0"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val shard = pmod(portableHash(col(idCol).cast("string"), seed), lit(numShards))
      .cast("long")
    val h2 = portableHash(col(idCol).cast("string"), seed + ":ord")
    df.select(col(idCol), shard.as("shard"), h2.as("h2"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("h2"), col(idCol)))
        .cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** DuckDB twin of [[shardShuffle]] ([[portableHash]] is positive, so
    * `%` and `pmod` agree — the q102 convention).
    */
  def shardShuffleSql(
      tbl: String,
      idCol: String,
      numShards: Int = 8,
      seed: String = "epoch0"): String =
    s"""SELECT $idCol, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, $idCol) AS BIGINT) AS pos
       |FROM (SELECT $idCol,
       |  (${portableHashSql(s"CAST($idCol AS VARCHAR)", seed)}) % $numShards AS shard,
       |  ${portableHashSql(s"CAST($idCol AS VARCHAR)", seed + ":ord")} AS h2
       |  FROM $tbl) t""".stripMargin.replace("\n", " ")

  /** Deterministic uniform k-sample PER GROUP — eyeballing/eval draws
    * ("give me 50 random docs per language") that any engine reproduces:
    * a doc is sampled iff its seeded [[portableHash]] ranks among the
    * group's k smallest (ties by id). Returns (group, id, rk ∈ 1..k).
    *
    * Runs through [[TopK.perKey]]'s bounded-heap operator, so the state
    * is O(groups × k) and there is NO per-group sort and NO window —
    * a corpus-scale group (every doc is in SOME language) costs one heap
    * update per row. This is exact bottom-k sampling: uniform without
    * replacement per group, deterministic under the seed, and
    * partitioning-independent.
    */
  def sampleKPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      seed: String = "sample"): DataFrame = {
    require(k > 0, "k must be positive")
    val base = df.select(col(groupCol), col(idCol),
      portableHash(col(idCol).cast("string"), seed).as("h"))
    graft.functions.TopK.perKey(base, Seq(groupCol),
        Seq(("h", false), (idCol, false)), k)
      .select(col(groupCol), col(idCol), col("rk"))
  }

  /** DuckDB twin of [[sampleKPerGroup]] (the window form the bounded
    * heap replaces).
    */
  def sampleKPerGroupSql(
      tbl: String,
      idCol: String,
      groupCol: String,
      k: Int,
      seed: String = "sample"): String =
    s"""SELECT $groupCol, $idCol, rk FROM (
       |  SELECT $groupCol, $idCol, CAST(row_number() OVER (
       |    PARTITION BY $groupCol ORDER BY h, $idCol) AS BIGINT) AS rk
       |  FROM (SELECT $groupCol, $idCol,
       |    ${portableHashSql(s"CAST($idCol AS VARCHAR)", seed)} AS h FROM $tbl) t) r
       |WHERE rk <= $k""".stripMargin.replace("\n", " ")

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") made integer-exact:
    * per-doc target-likeness under two unigram models — a TARGET model
    * (rows where `isTargetCol`) and the RAW model (the whole corpus) —
    * estimated from ONE shared count aggregate (the target is a subset,
    * so `c_tgt ≤ c_raw` and one pass over the exploded tokens builds
    * both). The per-token weight is the bit-length log-likelihood ratio
    * `⌊log₂(c_tgt+1)⌋ − ⌊log₂ c_raw⌋ + 64` (Laplace +1 so target-absent
    * tokens stay defined; the +64 shift keeps every integer nonnegative
    * so `div`/`//` agree cross-engine — a constant per-token shift never
    * changes the mean-score ranking). Output per doc: `is_t`,
    * `n_tokens`, `score_sum`, and `score10 = score_sum·10 div n_tokens`
    * (mean ×10, the q111/q136 convention — higher = more target-like).
    *
    * Plan: one corpus token-count exchange (map-side combined; the
    * conditional target count rides the same aggregate), a token-keyed
    * join-back of compact (token, weight) rows, and the doc re-aggregate
    * — exactly [[surprisalScore]]'s shape, so a 100 TB scoring pass
    * costs what q111 costs.
    */
  def dsirScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), col(isTargetCol).cast("boolean").as("is_t"),
        explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val model = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_tgt"))
      .select(col("tok"),
        (length(bin(col("c_tgt") + 1)) - length(bin(col("c_raw"))) + 64)
          .cast("long").as("w"))
    toks.join(model, "tok")
      .groupBy(col(idCol), col("is_t"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_sum"))
      .select(col(idCol), col("is_t"), col("n_tokens"), col("score_sum"),
        expr("score_sum * 10 div n_tokens").as("score10"))
  }

  /** DSIR selection: the top-`k` most target-like NON-target docs by
    * [[dsirScore]] (score10 desc, id asc — deterministic at ties), with
    * their 1-based rank. Ranking runs through the `GroupedTopKExec`
    * bounded heap on a constant key (O(k) task state, no corpus-wide
    * sort/window) — the data-selection front door: "give me the k raw
    * docs that look most like my curated target set".
    */
  def dsirSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = dsirScore(df, idCol, textCol, isTargetCol)
      .where(!col("is_t"))
      .select(col(idCol), col("n_tokens"), col("score_sum"), col("score10"),
        lit(0L).as("g"))
    graft.functions.TopK.perKey(scored, Seq("g"),
        Seq(("score10", true), (idCol, false)), k)
      .select(col(idCol), col("n_tokens"), col("score_sum"), col("score10"),
        col("rk"))
  }

  /** DuckDB twin of [[dsirSelect]] (the window form the bounded heap
    * replaces; same Laplace/+64 integer conventions).
    */
  def dsirSelectSql(
      tbl: String,
      idCol: String,
      textCol: String,
      isTargetSql: String,
      k: Int): String =
    s"""WITH w0 AS (SELECT $idCol, ($isTargetSql) AS is_t,
       |  unnest(string_split($textCol, ' ')) AS tok FROM $tbl),
       |t AS (SELECT $idCol, is_t, tok FROM w0 WHERE tok <> ''),
       |m AS (SELECT tok,
       |  length(ltrim(bin(sum(CASE WHEN is_t THEN 1 ELSE 0 END) + 1), '0'))
       |  - length(ltrim(bin(count(*)), '0')) + 64 AS w FROM t GROUP BY tok),
       |d AS (SELECT $idCol, is_t, count(*) AS n_tokens,
       |  CAST(sum(w) AS BIGINT) AS score_sum
       |  FROM t JOIN m USING (tok) GROUP BY $idCol, is_t),
       |s AS (SELECT $idCol, n_tokens, score_sum,
       |  score_sum * 10 // n_tokens AS score10 FROM d WHERE NOT is_t),
       |r AS (SELECT *, CAST(row_number() OVER (
       |  ORDER BY score10 DESC, $idCol) AS BIGINT) AS rk FROM s)
       |SELECT $idCol, n_tokens, score_sum, score10, rk FROM r
       |WHERE rk <= $k""".stripMargin.replace("\n", " ")

  /** [[dsirScore]] with the paper's ACTUAL feature space — hashed bigram
    * features bucketized to `buckets` — and q141's compact-key
    * discipline: the model exchange and the join-back move bucket INTS,
    * never token strings, and the model itself is bounded at `buckets`
    * rows no matter the corpus vocabulary (the property that makes DSIR
    * runnable over a 100 TB crawl: the unigram-string model of
    * [[dsirScore]] grows with the vocab; this one cannot). Same integer
    * bit-length LLR and mean-×10 conventions. Docs need ≥ 2 tokens (one
    * bigram) to score.
    */
  def dsirScoreHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String,
      buckets: Int = 8192): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val feats = df
      .select(col(idCol), col(isTargetCol).cast("boolean").as("is_t"),
        expr(s"filter(split($textCol, ' '), t -> t <> '')").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col(idCol), col("is_t"), explode(
        arrays_zip(expr("slice(tk, 1, size(tk)-1)"),
          expr("slice(tk, 2, size(tk)-1)"))).as("bg"))
      .select(col(idCol), col("is_t"),
        pmod(portableHash(concat(col("bg.0"), lit(" "), col("bg.1"))),
          lit(buckets.toLong)).as("fb"))
    val model = feats.groupBy(col("fb"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_tgt"))
      .select(col("fb"),
        (length(bin(col("c_tgt") + 1)) - length(bin(col("c_raw"))) + 64)
          .cast("long").as("w"))
    // the model is ≤ `buckets` rows BY CONSTRUCTION — broadcast it, so
    // the join-back is a per-row map lookup instead of shuffling the
    // whole feature stream onto `buckets` (heavily skewed) keys: the
    // string model of [[dsirScore]] can't do this (vocab-sized), which
    // is exactly what the bounded feature space buys at scale
    // (measured: 154 s shuffle-join → broadcast at 1M docs)
    feats.join(broadcast(model), "fb")
      .groupBy(col(idCol), col("is_t"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_sum"))
      .select(col(idCol), col("is_t"), col("n_feats"), col("score_sum"),
        expr("score_sum * 10 div n_feats").as("score10"))
  }

  /** Top-`k` most target-like non-target docs by [[dsirScoreHashed]] —
    * the bounded-heap selection of [[dsirSelect]] over the hashed model.
    */
  def dsirSelectHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String,
      k: Int,
      buckets: Int = 8192): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = dsirScoreHashed(df, idCol, textCol, isTargetCol, buckets)
      .where(!col("is_t"))
      .select(col(idCol), col("n_feats"), col("score_sum"), col("score10"),
        lit(0L).as("g"))
    graft.functions.TopK.perKey(scored, Seq("g"),
        Seq(("score10", true), (idCol, false)), k)
      .select(col(idCol), col("n_feats"), col("score_sum"), col("score10"),
        col("rk"))
  }

  /** DuckDB twin of [[dsirSelectHashed]] (identical hash family and
    * bucketing — parity is bit-exact).
    */
  def dsirSelectHashedSql(
      tbl: String,
      idCol: String,
      textCol: String,
      isTargetSql: String,
      k: Int,
      buckets: Int = 8192): String =
    s"""WITH w0 AS (SELECT $idCol, ($isTargetSql) AS is_t,
       |  list_filter(string_split($textCol, ' '), t -> t <> '') AS tk FROM $tbl),
       |bg0 AS (SELECT $idCol, is_t,
       |  unnest(list_transform(range(len(tk)-1), i -> tk[i+1] || ' ' || tk[i+2])) AS bg
       |  FROM w0 WHERE len(tk) >= 2),
       |t AS (SELECT $idCol, is_t,
       |  ${portableHashSql("bg")} % $buckets AS fb FROM bg0),
       |m AS (SELECT fb,
       |  length(ltrim(bin(sum(CASE WHEN is_t THEN 1 ELSE 0 END) + 1), '0'))
       |  - length(ltrim(bin(count(*)), '0')) + 64 AS w FROM t GROUP BY fb),
       |d AS (SELECT $idCol, is_t, count(*) AS n_feats,
       |  CAST(sum(w) AS BIGINT) AS score_sum
       |  FROM t JOIN m USING (fb) GROUP BY $idCol, is_t),
       |s AS (SELECT $idCol, n_feats, score_sum,
       |  score_sum * 10 // n_feats AS score10 FROM d WHERE NOT is_t),
       |r AS (SELECT *, CAST(row_number() OVER (
       |  ORDER BY score10 DESC, $idCol) AS BIGINT) AS rk FROM s)
       |SELECT $idCol, n_feats, score_sum, score10, rk FROM r
       |WHERE rk <= $k""".stripMargin.replace("\n", " ")

  /** URL canonicalization — the step before URL-level dedup in a crawl
    * pipeline: lowercase scheme+authority, strip default ports and
    * fragments, drop tracking parameters (utm_*, gclid, fbclid), sort
    * the surviving query params, normalize the empty path to `/`. A
    * per-row expression chain (regex extract/replace + array
    * filter/sort/join), shared semantics with the DuckDB twin. Output:
    * (id, url, canon_url).
    */
  def canonicalUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*$", "")
    df.select(col(idCol), col(urlCol).as("url"), noFrag.as("u0"))
      .withColumn("head",
        regexp_replace(lower(
          regexp_extract(col("u0"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)),
          ":(443|80)$", ""))
      .withColumn("tail",
        expr("substring(u0, length(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1)"))
      .withColumn("path",
        when(regexp_extract(col("tail"), "^[^?]*", 0) === "", "/")
          .otherwise(regexp_extract(col("tail"), "^[^?]*", 0)))
      .withColumn("qp", expr(
        "array_join(array_sort(filter(split(regexp_extract(tail, '\\\\?(.*)$', 1), '&'), " +
          "p -> p != '' AND NOT p rlike '^(utm_|gclid=|fbclid=)')), '&')"))
      .select(col(idCol), col("url"),
        concat(col("head"), col("path"),
          when(col("qp") === "", "").otherwise(concat(lit("?"), col("qp"))))
          .as("canon_url"))
  }

  /** DuckDB twin of [[canonicalUrl]] as a SELECT over `tbl`. */
  def canonicalUrlSql(tbl: String, idCol: String, urlExpr: String): String =
    s"""SELECT $idCol, $urlExpr AS url,
       |  hd || pth || CASE WHEN qp = '' THEN '' ELSE '?' || qp END AS canon_url
       |FROM (SELECT $idCol, $urlExpr, u0,
       |    regexp_replace(lower(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)),
       |      ':(443|80)$$', '') AS hd,
       |    substring(u0, length(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1) AS tl
       |  FROM (SELECT $idCol, $urlExpr, regexp_replace($urlExpr, '#.*$$', '') AS u0 FROM $tbl) s0) s1,
       |LATERAL (SELECT
       |    CASE WHEN regexp_extract(tl, '^[^?]*', 0) = '' THEN '/'
       |         ELSE regexp_extract(tl, '^[^?]*', 0) END AS pth,
       |    coalesce(array_to_string(list_sort(list_filter(
       |      string_split(coalesce(regexp_extract(tl, '\\?(.*)$$', 1), ''), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_|gclid=|fbclid=)'))), '&'), '') AS qp) s2""".stripMargin
      .replace("\n", " ")

  /** HTML → text extraction — the step between raw-corpus ingest
    * (`RawCorpus`, q125/q126: WARC bodies ARE html) and every text
    * operator here: strip `<script>`/`<style>` blocks and comments
    * (content and all), drop remaining tags, decode the common named
    * entities (single pass, `&amp;` last so `&amp;lt;` decodes to the
    * LITERAL `&lt;` per the HTML spec's double-escape semantics), squash
    * whitespace. A pure per-row codegen `regexp_replace` chain — zero
    * exchanges, the [[cleanText]] shape — restricted to regex features
    * Java and RE2 share (no backreferences/lookahead) so the DuckDB twin
    * runs the IDENTICAL patterns. Regex-based extraction has the usual
    * documented edge (a literal `>` inside a quoted attribute ends the
    * tag early); a deployment needing attribute-exact parsing plugs a
    * parser into the same mapPartitions slot the media decoders use.
    *
    * Output: (id, text_extracted).
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val steps: Seq[(String, String)] = htmlStripSteps
    val stripped = steps.foldLeft(col(htmlCol)) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    df.select(col(idCol), trim(stripped, " \n").as("text_extracted"))
  }

  /** The shared strip chain (pattern, replacement), identical on both
    * engines; order is load-bearing: block strips first, then
    * block-level closers (and `<br>`) become NEWLINES — the paragraph
    * structure [[paragraphScrub]] consumes — then remaining tags become
    * spaces, entities decode (`&amp;` last), horizontal whitespace
    * squashes within lines, and newline runs collapse.
    */
  private val htmlStripSteps: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?i)<(?:br[^>]*|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol)>" -> "\n",
    "(?s)<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&",
    "[ \\t\\x0B\\f\\r]+" -> " ",
    " ?\\n[ \\n]*" -> "\n")

  /** Paragraph-frequency boilerplate scrub — CCNet's paragraph dedup:
    * split each doc on `sep`, drop every paragraph that appears in more
    * than `maxDf` DISTINCT documents corpus-wide (headers, footers,
    * cookie banners, license blurbs — the lines that repeat across a
    * crawl), and reassemble the survivors in original order.
    *
    * Plan: the frequency model exchange carries (line-hash, doc) LONG
    * pairs — paragraph text never shuffles for counting ([[portableHash]]
    * keys, the q141/q105 compact-key discipline); the only text-carrying
    * exchange is the per-doc rebuild — irreducible, the q110 argument.
    * The hot-set join is NOT hint-forced: the hot set (every distinct
    * line with df > maxDf) is data-dependent and unbounded on a
    * boilerplate-heavy crawl, so a forced broadcast is a driver OOM at
    * the 100 TB scale this targets — AQE broadcasts it when its runtime
    * size actually fits and falls back to a shuffled hash join on the
    * 8-byte `lh` key when it doesn't. Output: (id, text_scrubbed,
    * n_kept, n_dropped); a fully-boilerplate doc yields "" (never NULL).
    */
  def paragraphScrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      maxDf: Int = 2): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val lines = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .where(trim(col("line")) =!= "")
      .withColumn("lh", portableHash(col("line")))
    val hot = lines.groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") > maxDf)
      .select(col("lh"), lit(true).as("is_hot"))
    lines.join(hot, Seq("lh"), "left")
      .select(col(idCol), col("pos"), col("line"),
        coalesce(col("is_hot"), lit(false)).as("hot"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          expr("transform(filter(array_sort(" +
            "collect_list(struct(pos, hot, line))), x -> NOT x.hot), " +
            "x -> x.line)"),
          sep).as("text_scrubbed"),
        sum(when(col("hot"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Modulus of the rolling window hash in [[duplicatedSpans]]: 2^53,
    * chosen so the per-step `acc*31 + th` stays below 2^58 — no silent
    * Long wraparound on the Spark side and no BIGINT overflow ERROR on
    * the DuckDB side (DuckDB refuses to wrap), so the fold is the same
    * integer function in both engines. */
  final val SpanHashM = 1L << 53

  /** EXACT cross-document substring-duplication spans — the detection
    * half of suffix-array training-data dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"), made
    * Spark-shaped: every length-`L` token window is rolling-hashed, a
    * window is DUPLICATED when it appears in ≥ `minDf` distinct docs,
    * and per doc the duplicated window positions merge (gaps-and-islands)
    * into MAXIMAL spans — exactly the byte-span output the paper's
    * suffix-array pass produces for cross-document repeats, at window
    * (not byte) granularity, exact modulo 53-bit hash collisions (the
    * documented ngramJaccard asymmetry; the twin hashes identically so
    * cross-engine parity is bit-exact). Within-doc-only repeats are NOT
    * flagged (df counts distinct docs) — that case is [[dupWindowScrub]].
    *
    * Plan: one narrow explode to (id, pos, token-hash) rows — 8-byte
    * hashes, never token strings, cross every exchange; the lead-based
    * rolling hash is one id-keyed window pass, the df model is one
    * compact wh-keyed aggregate (map-side combined) whose hot set
    * semi-joins back under AQE (unbounded on templated corpora — the
    * paragraphScrub argument, no forced broadcast), and the island
    * numbering is a second id-keyed window over the (small) duplicated
    * subset only. Per-doc window memory is bounded by doc length.
    *
    * Output: (idCol, span_start, span_end, n_windows, byte_start,
    * byte_end) — token positions `[span_start, span_end)` (end-
    * exclusive, `span_end − span_start ≥ L`) PLUS the byte offsets
    * `[byte_start, byte_end)` of the same span in the single-space-
    * joined token stream (a prefix sum of token byte lengths riding the
    * existing id-keyed window pass — Lee et al.'s output contract for a
    * downstream scrubber operating on raw bytes). Spans are DISJOINT
    * maximal: islands whose covered token ranges overlap or touch
    * (window-start gap ≤ L) merge into one span, so consumers may
    * treat span coverage as additive.
    */
  /** (id, pos, tok, th, nb) token rows of the span operators — one
    * narrow explode; `th` is the 53-bit token hash the rolling fold
    * runs on, `nb` the token's byte length (the byte-offset prefix-sum
    * input). */
  private def spanToks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("tok"),
        (portableHash(col("tok")) % SpanHashM).as("th"),
        octet_length(col("tok")).cast("long").as("nb"))

  /** (id, pos, wh, bs, be) rolling window-hash rows over [[spanToks]]
    * output — the lead-based fold plus the window's byte extent
    * (`bs` = byte offset of the start token in the space-joined stream,
    * `be` = one past the last byte of the window's L-th token), all in
    * ONE id-keyed window pass (the prefix sum and the leads share the
    * partitioning, so Catalyst plans a single exchange+sort). */
  private def spanWins(toks: DataFrame, idCol: String, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val pre = w.rowsBetween(Window.unboundedPreceding, -1)
    val wh = (1 until L).foldLeft(col("th")) { (acc, k) =>
      (acc * 31 + lead(col("th"), k).over(w)) % SpanHashM
    }
    toks
      .select(col(idCol), col("pos"), col("th"), col("nb"),
        coalesce(sum(col("nb") + 1).over(pre), lit(0L)).as("bo"))
      .select(col(idCol), col("pos"), wh.as("wh"),
        lead(col("th"), L - 1).over(w).as("tlast"),
        col("bo").as("bs"),
        lead(col("bo") + col("nb"), L - 1).over(w).as("be"))
      .where(col("tlast").isNotNull)
      .select(col(idCol), col("pos"), col("wh"), col("bs"), col("be"))
  }

  /** Stamp an island group id onto a (id, pos, ...) frame of window
    * starts: a new island starts when the gap to the previous start
    * exceeds `L` — starts at distance ≤ L have overlapping or touching
    * covered ranges `[pos, pos+L)`, so merging them yields DISJOINT
    * maximal spans (starts {0, 2} with a gap at 1 are ONE span [0, 10),
    * never the overlapping pair [0,8)/[2,10)). */
  private def withIslandGrp(dup: DataFrame, idCol: String, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= L, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("grp", sum(col("brk")).over(run))
  }

  /** Merge a flagged (id, pos, bs, be) window frame into the disjoint
    * maximal span output of [[duplicatedSpans]] — shared by the
    * full-corpus and indexed-incremental detectors. */
  private def spanAgg(flagged: DataFrame, idCol: String, L: Int): DataFrame =
    withIslandGrp(flagged, idCol, L)
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + L).as("span_end"),
        count(lit(1)).as("n_windows"),
        min(col("bs")).as("byte_start"),
        max(col("be")).as("byte_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("n_windows"), col("byte_start"), col("byte_end"))

  /** Explode a flagged (id, pos) window frame into its covered token
    * positions — islands merged first, so each position emits exactly
    * once (disjoint-span contract); shared by both scrub paths. */
  private def coveredPositions(flagged: DataFrame, idCol: String, L: Int): DataFrame =
    withIslandGrp(flagged, idCol, L)
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      .select(col(idCol), explode(sequence(col("s"), col("e") - 1)).as("pos"))

  /** Rebuild per-doc text with covered positions cut — the one
    * irreducible text-carrying exchange, shared by both scrub paths. */
  private def rebuildScrubbed(
      toks: DataFrame, covered: DataFrame, idCol: String): DataFrame =
    toks.join(covered.withColumn("cut", lit(true)), Seq(idCol, "pos"), "left")
      .select(col(idCol), col("pos"), col("tok"),
        coalesce(col("cut"), lit(false)).as("cut"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          expr("transform(filter(array_sort(" +
            "collect_list(struct(pos, cut, tok))), x -> NOT x.cut), " +
            "x -> x.tok)"),
          " ").as("text_scrubbed"),
        sum(when(col("cut"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cut"))

  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      L: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(L >= 2, "window length must be >= 2")
    val wins = spanWins(spanToks(df, idCol, textCol), idCol, L)
    val hot = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") >= minDf)
      .select(col("wh"))
    spanAgg(wins.join(hot, Seq("wh"), "left_semi"), idCol, L)
  }

  /** The REMOVAL half of [[duplicatedSpans]] — what Lee et al. 2022
    * actually apply to the corpus: every duplicated window is kept only
    * in the LOWEST-id document containing it; in every other doc the
    * covering spans are cut and the survivors rebuilt in order. First-
    * arrival-wins at window granularity, so the canonical copy of a
    * repeated passage survives exactly once corpus-wide while unique
    * text is untouched.
    *
    * Plan: [[duplicatedSpans]]' stages plus a per-window min(id) on the
    * SAME compact wh-keyed aggregate (no extra exchange class), islands
    * merged BEFORE the cover explode (8× fewer generated rows than
    * exploding per window), and the q110 rebuild — the one irreducible
    * text-carrying exchange. Output: (idCol, text_scrubbed, n_kept,
    * n_cut) token counts; a fully-duplicated doc yields "" (never NULL).
    */
  def scrubDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      L: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(L >= 2, "window length must be >= 2")
    val toks = spanToks(df, idCol, textCol)
    val wins = spanWins(toks, idCol, L)
    val model = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("df"), min(col(idCol)).as("wmin"))
      .where(col("df") >= minDf)
      .select(col("wh"), col("wmin"))
    val flagged = wins.join(model, Seq("wh"))
      .where(col(idCol) > col("wmin"))
      .select(col(idCol), col("pos"))
    // islands merge whenever covered ranges overlap or touch (gap ≤ L),
    // so the merged spans are DISJOINT and the explode emits each
    // covered position exactly once — no distinct needed before the
    // rebuild join (a duplicate (id, pos) row would fan it out)
    rebuildScrubbed(toks, coveredPositions(flagged, idCol, L), idCol)
  }

  /** DuckDB twin of [[scrubDuplicatedSpans]] reading from `tbl`. */
  /** Shared CTE prefix of every span SQL twin: token rows (with tok +
    * byte length), the byte-offset prefix sum, the lead fold, and the
    * (id, pos, wh, bs, be) window rows — identical math to
    * [[spanToks]]/[[spanWins]]. */
  private[graft] def spanWhsSqlPrefix(
      tbl: String, idCol: String, textCol: String, L: Int): String = {
    val leads = (1 until L).map(k =>
      s"lead(th, $k) OVER (PARTITION BY $idCol ORDER BY pos) AS t$k").mkString(", ")
    val fold = (1 until L).foldLeft("th") { (acc, k) =>
      s"(($acc) * 31 + t$k) % ${SpanHashM}"
    }
    s"""tk AS (SELECT $idCol, string_split($textCol, ' ') AS tk FROM $tbl),
       |t AS (SELECT $idCol, unnest(range(len(tk))) AS pos, unnest(tk) AS tok FROM tk),
       |h AS (SELECT $idCol, pos, tok, (${portableHashSql("tok")}) % ${SpanHashM} AS th,
       |  strlen(tok) AS nb FROM t),
       |o AS (SELECT $idCol, pos, th, nb,
       |  CAST(coalesce(sum(nb + 1) OVER (PARTITION BY $idCol ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bo FROM h),
       |w AS (SELECT $idCol, pos, th, bo, $leads,
       |  lead(bo + nb, ${L - 1}) OVER (PARTITION BY $idCol ORDER BY pos) AS be FROM o),
       |whs AS (SELECT $idCol, pos, ($fold) AS wh, bo AS bs, be FROM w
       |  WHERE t${L - 1} IS NOT NULL)""".stripMargin
  }

  /** The islands-merge + span-aggregate SQL tail shared by the span
    * detectors (input CTE must expose (idCol, pos, bs, be)). */
  private[graft] def spanAggSqlTail(fromCte: String, idCol: String, L: Int): String =
    s"""isl AS (SELECT $idCol, pos, bs, be,
       |  CASE WHEN pos - lag(pos) OVER (PARTITION BY $idCol ORDER BY pos) <= $L
       |       THEN 0 ELSE 1 END AS brk FROM $fromCte),
       |isl2 AS (SELECT $idCol, pos, bs, be, sum(brk) OVER (PARTITION BY $idCol
       |  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM isl)
       |SELECT $idCol, min(pos) AS span_start, max(pos) + $L AS span_end,
       |       count(*) AS n_windows,
       |       CAST(min(bs) AS BIGINT) AS byte_start, CAST(max(be) AS BIGINT) AS byte_end
       |FROM isl2 GROUP BY $idCol, grp""".stripMargin

  /** The islands → covered positions → rebuild SQL tail shared by the
    * span scrubs (`flgCte` must expose (idCol, pos); `docPredSql`
    * restricts the rebuilt docs — 'TRUE' for all). */
  private[graft] def scrubSqlTail(flgCte: String, idCol: String, L: Int, docPredSql: String): String =
    s"""isl AS (SELECT $idCol, pos,
       |  CASE WHEN pos - lag(pos) OVER (PARTITION BY $idCol ORDER BY pos) <= $L
       |       THEN 0 ELSE 1 END AS brk FROM $flgCte),
       |isl2 AS (SELECT $idCol, pos, sum(brk) OVER (PARTITION BY $idCol
       |  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM isl),
       |sp AS (SELECT $idCol, min(pos) AS s, max(pos) + $L AS e
       |       FROM isl2 GROUP BY $idCol, grp),
       |cov AS (SELECT $idCol, unnest(range(s, e)) AS pos FROM sp),
       |m AS (SELECT hh.$idCol, hh.pos, hh.tok, (cov.pos IS NOT NULL) AS cut
       |      FROM (SELECT * FROM h WHERE $docPredSql) hh
       |      LEFT JOIN cov ON cov.$idCol = hh.$idCol AND cov.pos = hh.pos)
       |SELECT $idCol,
       |  coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT cut), '') AS text_scrubbed,
       |  CAST(sum(CASE WHEN cut THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cut
       |FROM m GROUP BY $idCol""".stripMargin

  def scrubDuplicatedSpansSql(
      tbl: String,
      idCol: String,
      textCol: String,
      L: Int = 8,
      minDf: Int = 2): String =
    s"""WITH ${spanWhsSqlPrefix(tbl, idCol, textCol, L)},
       |model AS (SELECT wh, min($idCol) AS wmin FROM whs GROUP BY wh
       |          HAVING count(DISTINCT $idCol) >= $minDf),
       |flg AS (SELECT whs.$idCol, whs.pos FROM whs JOIN model USING (wh)
       |        WHERE whs.$idCol > model.wmin),
       |${scrubSqlTail("flg", idCol, L, "TRUE")}""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[scrubSpansAgainstIndex]] over one universe table:
    * standing = NOT `batchPredSql`, batch = `batchPredSql`; a batch
    * window is cut iff its canonical holder (min of the standing wmin
    * and the lowest batch id) is a lower id. */
  def scrubSpansAgainstSql(
      tbl: String,
      idCol: String,
      textCol: String,
      batchPredSql: String,
      L: Int = 8): String =
    s"""WITH ${spanWhsSqlPrefix(tbl, idCol, textCol, L)},
       |std AS (SELECT wh, min($idCol) AS iw FROM whs
       |        WHERE NOT ($batchPredSql) GROUP BY wh),
       |bmin AS (SELECT wh, min($idCol) AS bmin FROM whs
       |        WHERE $batchPredSql GROUP BY wh),
       |flg AS (SELECT whs.$idCol, whs.pos
       |        FROM whs JOIN bmin USING (wh) LEFT JOIN std USING (wh)
       |        WHERE ($batchPredSql)
       |          AND least(coalesce(std.iw, bmin.bmin), bmin.bmin) < whs.$idCol),
       |${scrubSqlTail("flg", idCol, L, batchPredSql)}""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[duplicatedSpansAgainstIndex]] over one universe
    * table: standing = NOT `batchPredSql`, batch = `batchPredSql`; a
    * batch window is duplicated when standing + intra-batch
    * distinct-doc frequency reaches `minDf`. */
  def duplicatedSpansAgainstSql(
      tbl: String,
      idCol: String,
      textCol: String,
      batchPredSql: String,
      L: Int = 8,
      minDf: Int = 2): String =
    s"""WITH ${spanWhsSqlPrefix(tbl, idCol, textCol, L)},
       |std AS (SELECT wh, count(DISTINCT $idCol) AS idf FROM whs
       |        WHERE NOT ($batchPredSql) GROUP BY wh),
       |bdf AS (SELECT wh, count(DISTINCT $idCol) AS bdf FROM whs
       |        WHERE $batchPredSql GROUP BY wh),
       |dup AS (SELECT whs.$idCol, whs.pos, whs.bs, whs.be
       |        FROM whs JOIN bdf USING (wh) LEFT JOIN std USING (wh)
       |        WHERE ($batchPredSql)
       |          AND coalesce(std.idf, 0) + bdf.bdf >= $minDf),
       |${spanAggSqlTail("dup", idCol, L)}""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[duplicatedSpans]] reading from `tbl` — the same
    * token-hash fold, df model, and islands merge. */
  def duplicatedSpansSql(
      tbl: String,
      idCol: String,
      textCol: String,
      L: Int = 8,
      minDf: Int = 2): String =
    s"""WITH ${spanWhsSqlPrefix(tbl, idCol, textCol, L)},
       |hot AS (SELECT wh FROM whs GROUP BY wh HAVING count(DISTINCT $idCol) >= $minDf),
       |dup AS (SELECT $idCol, pos, bs, be FROM whs JOIN hot USING (wh)),
       |${spanAggSqlTail("dup", idCol, L)}""".stripMargin.replace("\n", " ")

  // ---- persistent WINDOW-HASH SPAN INDEX: the q87/q134 steady-state --
  // ---- discipline applied to substring duplication (q162/q163) — an --
  // ---- ingest batch pays O(batch windows + matches) against any     --
  // ---- standing corpus instead of recomputing the corpus window     --
  // ---- model per batch                                              --

  private def spanBucket(buckets: Int) =
    pmod(xxhash64(col("wh")), lit(buckets)).cast("int")

  /** Per-wh (wmin, df) aggregate of a frame's rolling window hashes —
    * the model rows both the builder and the appender write. */
  private def spanModel(df: DataFrame, idCol: String, textCol: String, L: Int): DataFrame =
    spanWins(spanToks(df, idCol, textCol), idCol, L)
      .groupBy(col("wh"))
      .agg(min(col(idCol)).as("wmin"), countDistinct(col(idCol)).as("df"))

  /** Materialize the window-hash SPAN INDEX over a standing corpus: one
    * row per distinct length-`L` window hash — `(wh, wmin, df)` with
    * `wmin` the lowest doc id holding the window (the first-arrival
    * canonical for scrubs) and `df` its distinct-doc frequency —
    * partitioned by `hb` (hash bucket of wh) so a probing batch prunes
    * to its own bucket directories. `buckets = 0` sizes adaptively from
    * the model row count ([[IndexMeta.adaptiveBuckets]]) and records
    * the choice; meta writes AFTER the data (the torn-rebuild
    * detectability argument of [[Dedup.writeHashIndex]]).
    *
    * `L` is part of the index's contract (a probe with a different `L`
    * finds no candidates, exactly like probing a signature index built
    * with a different shingle k) — callers fix it per deployment.
    */
  def writeSpanIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      L: Int = 8,
      buckets: Int = 0): Unit = {
    require(L >= 2, "window length must be >= 2")
    val model = spanModel(corpus, idCol, textCol, L)
    val sized = if (buckets > 0) model
      else model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val b = if (buckets > 0) buckets
              else IndexMeta.adaptiveBuckets(sized.count())
      sized.withColumn("hb", spanBucket(b))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("hb").parquet(s"$path/whs")
      IndexMeta.write(corpus.sparkSession, path, b, Map("L" -> L))
    } finally if (buckets <= 0) { sized.unpersist(); () }
  }

  /** Grow a standing [[writeSpanIndex]] by an ingested batch — O(batch)
    * appends landing only in the batch's bucket directories; probes
    * collapse multi-generation rows per wh via `min(wmin)` /
    * `sum(df)`. Under an at-least-once REPLAYED append `wmin` stays
    * exact (min is idempotent) while `df` can overcount — harmless at
    * the default `minDf = 2` cross-corpus semantics (any standing
    * holder already crosses the threshold) and bounded by replay count
    * otherwise; [[IndexMaintenance.compactSpanIndex]] cannot restore
    * exact df (the original distinct-doc sets are gone) but keeps the
    * min-wmin invariant. A cold-created index records its modulus
    * ([[IndexMeta.resolveAndRecord]]).
    */
  def appendSpanIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      L: Int = 8,
      buckets: Int = 0): Unit = {
    require(L >= 2, "window length must be >= 2")
    IndexMeta.requireParam(batch.sparkSession, path, "L", L)
    IndexMeta.validated(batch.sparkSession, path, buckets, "whs", "hb")
    val b = IndexMeta.resolveAndRecord(
      batch.sparkSession, path, buckets, Map("L" -> L))
    spanModel(batch, idCol, textCol, L)
      .withColumn("hb", spanBucket(b))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("hb").parquet(s"$path/whs")
  }

  /** The standing model rows a batch's windows could match: bucket-
    * pruned index scan (the batch's `hb` footprint reaches the scan as
    * a PartitionFilter, driver-bounded by construction), collapsed to
    * one `(wh, iw, idf)` row per hash. Explicit read schema so an index
    * seeded from an EMPTY corpus probes instead of failing inference;
    * the id type follows the BATCH — probing batches must use the id
    * type the index was built with (the
    * [[Multimodal.nearDupAgainstFingerprintIndex]] contract; a mismatch
    * fails at the parquet layer rather than silently misreading). */
  private def probeSpanModel(
      wins: DataFrame,
      idCol: String,
      idxPath: String): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = wins.sparkSession
    val bks = wins.select(col("hb")).distinct().collect().map(_.getInt(0)).toSeq
    val schema = StructType(Seq(
      StructField("wh", LongType),
      StructField("wmin", wins.schema(idCol).dataType),
      StructField("df", LongType),
      StructField("hb", IntegerType)))
    spark.read.schema(schema).parquet(s"$idxPath/whs")
      .where(col("hb").isin(bks: _*))
      .groupBy(col("wh"))
      .agg(min(col("wmin")).as("iw"), sum(col("df")).as("idf"))
  }

  /** Incremental [[duplicatedSpans]] against a materialized
    * [[writeSpanIndex]]: hashes ONLY the batch, probes the standing
    * window model with partition pruning, and flags a batch window as
    * duplicated when standing + intra-batch distinct-doc frequency
    * reaches `minDf` — ≡ running [[duplicatedSpans]] over corpus ∪
    * batch and keeping the batch docs' spans, for id-disjoint sides
    * (the [[Dedup.nearDupAgainst]] contract; re-probing an already-
    * indexed doc counts its own standing row and flags its whole text).
    * Output: the [[duplicatedSpans]] schema for batch docs.
    */
  def duplicatedSpansAgainstIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      L: Int = 8,
      minDf: Int = 2,
      buckets: Int = 0): DataFrame = {
    require(L >= 2, "window length must be >= 2")
    val spark = batch.sparkSession
    IndexMeta.requireParam(spark, indexPath, "L", L)
    val b = IndexMeta.validated(spark, indexPath, buckets, "whs", "hb")
    // Materialize the batch's window rows ONCE (eager localCheckpoint,
    // ContextCleaner-released): tokenize + the id-keyed window pass are
    // the probe's heavy batch-side stages, and the bucket-footprint
    // collect inside probeSpanModel is a separate job that would
    // otherwise re-run the whole lineage before the probe plan runs it
    // again. Rows are (id, pos, wh, bs, be, hb) longs — batch-sized.
    val wins = Stages.mat(spanWins(spanToks(batch, idCol, textCol), idCol, L)
      .withColumn("hb", spanBucket(b)))
    val bdf = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("bdf"))
    val flagged = wins
      .join(bdf, Seq("wh"))
      .join(probeSpanModel(wins, idCol, indexPath), Seq("wh"), "left")
      .where(coalesce(col("idf"), lit(0L)) + col("bdf") >= minDf)
      .select(col(idCol), col("pos"), col("bs"), col("be"))
    spanAgg(flagged, idCol, L)
  }

  /** Incremental [[scrubDuplicatedSpans]] against a materialized
    * [[writeSpanIndex]] — the steady-state form of Lee et al.'s
    * first-arrival-wins removal: a batch window is cut from a doc iff
    * its CANONICAL holder (the min of the index's `wmin` and the lowest
    * batch id holding it) is a LOWER id — the canonical copy survives
    * exactly once corpus-wide. Replay-idempotent by the same argument
    * as the other gates: a re-probed doc's own standing rows carry
    * `wmin = its own id`, which is never `< id`, so replays reproduce
    * identical output. Output: the [[scrubDuplicatedSpans]] schema for
    * batch docs. A full ingest step is probe → scrub/keep →
    * [[appendSpanIndex]] the batch so the NEXT batch sees it.
    */
  def scrubSpansAgainstIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      L: Int = 8,
      buckets: Int = 0): DataFrame = {
    require(L >= 2, "window length must be >= 2")
    val spark = batch.sparkSession
    IndexMeta.requireParam(spark, indexPath, "L", L)
    val b = IndexMeta.validated(spark, indexPath, buckets, "whs", "hb")
    val toks = spanToks(batch, idCol, textCol)
    // Same one-tokenize-job-per-probe discipline as
    // [[duplicatedSpansAgainstIndex]]: the checkpoint feeds the footprint
    // collect, bmin and the flagged join; the rebuild's `toks` use prunes
    // to (id, pos, tok) — no token hashing — so the md5 pass runs once.
    // PROJECT BEFORE the checkpoint: the scrub never reads the byte
    // offsets (bs, be), and materializing them would force the prefix-sum
    // + lead columns that column pruning removes from the lazy plan
    // (r16 stress A/B: checkpointing all six columns read 31 s vs ~18 s
    // for the 62.5k-doc batch scrub).
    val wins = Stages.mat(spanWins(toks, idCol, L)
      .select(col(idCol), col("pos"), col("wh"))
      .withColumn("hb", spanBucket(b)))
    val bmin = wins.groupBy(col("wh"))
      .agg(min(col(idCol)).as("bmin"))
    val flagged = wins
      .join(bmin, Seq("wh"))
      .join(probeSpanModel(wins, idCol, indexPath), Seq("wh"), "left")
      .where(least(coalesce(col("iw"), col("bmin")), col("bmin")) < col(idCol))
      .select(col(idCol), col("pos"))
    rebuildScrubbed(toks, coveredPositions(flagged, idCol, L), idCol)
  }

  /** DuckDB twin of [[htmlExtract]] as a scalar expression (RE2 runs the
    * same patterns; 'g' flag explicit; single-quoted SQL strings keep
    * backslashes literal, so only quotes need escaping).
    */
  def htmlExtractExprSql(htmlExpr: String): String = {
    val chained = htmlStripSteps.foldLeft(htmlExpr) { case (e, (pat, rep)) =>
      val p = pat.replace("'", "''").replace("\n", "' || chr(10) || '")
      val r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
      s"regexp_replace($e, '$p', '$r', 'g')"
    }
    s"trim($chained, ' ' || chr(10))"
  }
}
