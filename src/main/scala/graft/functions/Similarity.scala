package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[dotTopK]]: brute-force exact top-k — the correctness baseline.
  *    O(queries × corpus); fine when the query set is small/broadcast.
  *  - [[lshTopK]]: random-hyperplane LSH buckets + within-bucket rerank —
  *    the 100 TB path: bucketing is a narrow projection, candidates come
  *    from a bucket equi-join, and only bucket-mates are scored.
  *
  * Scoring uses integer-quantized vectors (`round(v*1000)`) so results
  * are exactly reproducible across engines — float summation order never
  * matters. True cosine differs from quantized dot only by per-vector
  * norms; rank order within realistic embeddings is preserved to ~1e-3.
  */
object Similarity {

  /** Quantize a float vector column to exact int64 components. */
  def quantize(emb: Column): Column =
    transform(emb, v => round(v.cast("double") * 1000).cast("long"))

  def quantizeSql(e: String): String =
    s"list_transform($e, v -> CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT))"

  /** Exact int64 dot product of two equal-length quantized vectors —
    * a fused codegen'd loop ([[DotProductQ]]), no intermediate array.
    */
  def dotQ(a: Column, b: Column): Column = DotProductQ(a, b)

  def dotQSql(a: String, b: String, dim: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i])) AS BIGINT)"

  /** Brute-force top-k by quantized dot product: each query vector (rows
    * matching `queryPred`) against the whole corpus. The query side is
    * broadcast; ranking is a per-query window (small k ⇒ TakeOrdered-ish
    * per group, no global sort).
    */
  def dotTopK(df: DataFrame, idCol: String, embCol: String, queryPred: Column, k: Int): DataFrame = {
    // scoring is CPU-dense per row — fan a low-split source out first
    // (no-op at production split counts)
    val corpus = Par.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), quantize(col(embCol)).as("qe"))
    val queries = corpus.where(queryPred)
      .select(col(idCol).as("query_id"), col("qe").as("qv"))
    val scored = broadcast(queries).join(corpus)
      .select(col("query_id"), col(idCol), dotQ(col("qv"), col("qe")).as("dot"))
    // custom bounded-heap rank operator instead of the row_number window:
    // per-query state is k rows, and no task ever sorts the full corpus
    // slice (the per-query fan-in IS the corpus for brute force)
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** Semantic eval-set decontamination — the embedding-space counterpart
    * of the n-gram benchmark check (q88): every corpus vector scored by
    * its MAX quantized dot product against the eval/benchmark set, with
    * a `contaminated` verdict at threshold `tau`. Exact by construction:
    * the eval set (small by nature — it's a benchmark) broadcasts, the
    * per-row sweep is the fused [[dotQ]] codegen loop, and the only
    * exchange is the per-corpus-id max (map-side combined to one row per
    * id). An eval set past broadcast reach uses the standing IVF index
    * with eval vectors as queries instead ([[ivfTopKIndexed]], the q89
    * plan) and trades exactness for nprobe.
    *
    * Every non-eval corpus row survives to the output: the eval sweep is
    * a LEFT broadcast join, so an eval predicate matching ZERO rows
    * yields every corpus row with `max_dot` NULL and
    * `contaminated = false` (nothing to be contaminated BY) instead of
    * an empty frame, and rows where `evalPred` evaluates NULL are
    * coalesced to the corpus side rather than dropped from both.
    */
  def semanticDecontaminate(
      df: DataFrame,
      idCol: String,
      embCol: String,
      evalPred: Column,
      tau: Long): DataFrame = {
    // evaluate the predicate against the FULL input frame (it may read
    // columns outside the id/embedding projection), NULL-coalesced to
    // the corpus side
    val corpus = Par.fanOut(df.select(col(idCol), col(embCol),
        coalesce(evalPred, lit(false)).as("is_eval")))
      .select(col(idCol), quantize(col(embCol)).as("qe"), col("is_eval"))
    val evals = corpus.where(col("is_eval"))
      .select(col("qe").as("ev"))
    corpus.where(!col("is_eval"))
      .join(broadcast(evals), lit(true), "left")
      .select(col(idCol),
        when(col("ev").isNotNull, dotQ(col("ev"), col("qe"))).as("dot"))
      .groupBy(col(idCol))
      .agg(max(col("dot")).as("max_dot"))
      .select(col(idCol), col("max_dot"),
        coalesce(col("max_dot") >= tau, lit(false)).as("contaminated"))
  }

  /** Deterministic pseudo-random hyperplane j as a LITERAL array — the
    * same md5-derived values the SQL oracle computes inline
    * (hash("j:i") mapped to [-1000, 1000]), but precomputed on the driver:
    * an md5-expression form is not constant-folded by Catalyst, so it
    * would recompute dim×planes hashes PER ROW.
    */
  private[functions] def planeVals(j: Int, dim: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
  }

  private def planeExpr(j: Int, dim: Int): Column =
    array(planeVals(j, dim).toSeq.map(lit(_)): _*)

  private def planeSql(j: Int, dim: Int): String =
    s"list_transform(range(0, $dim), i -> ${TextOps.portableHashSql("i::VARCHAR", s"$j:")} % 2001 - 1000)"

  /** Random-hyperplane LSH bucket id (`numPlanes` sign bits starting at
    * plane `planeOffset` — band b of a banded scheme passes
    * `planeOffset = b * planesPerBand`).
    */
  def lshBucket(qe: Column, dim: Int, numPlanes: Int, planeOffset: Int = 0): Column =
    (0 until numPlanes).map { j =>
      when(dotQ(planeExpr(planeOffset + j, dim), qe) > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  def lshBucketSql(qe: String, dim: Int, numPlanes: Int, planeOffset: Int = 0): String =
    "CAST(" + (0 until numPlanes).map { j =>
      s"CASE WHEN ${dotQSql(s"(${planeSql(planeOffset + j, dim)})", qe, dim)} > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ") + " AS BIGINT)"

  /** Plane-index stride of the ADAPTIVE banding scheme, and the upper
    * clamp on its derived `planesPerBand`: band `b`, bit `j` always reads
    * plane `b·PlaneStride + j`, whatever `p` the corpus size yields — so
    * every plane index is a compile-time LITERAL on both the Spark side
    * and the SQL-oracle side even though `p` itself is data-derived.
    */
  final val PlaneStride = 20

  /** The log₂(corpus)-plus-margin sizing rule for `planesPerBand`
    * (`ceil(log₂ n) + 5`, clamped to [8, [[PlaneStride]]]): 2^p bucket
    * keys per band TRACK the corpus, so per-band candidate volume stays
    * near-linear at every scale — a fixed p is quadratic N²/2^p at some
    * scale. The +5 margin sets the collision BUDGET: expected uniform
    * collisions per band are N²/2^(p+1) ≈ N/64 instead of the bare
    * rule's N/2 — measured at sf0.1 (N=2000) the bare `ceil(log₂ n)`
    * spent 3× the whole query's time materializing collision pairs the
    * verifier then rejected, while the extra planes' sweep cost is
    * noise (the sweep is O(rows·planes·dim); pairs are O(collisions)).
    * Recall margin stays ample at the p=20 ceiling: a cos≈0.99 pair
    * agrees on a 20-plane band with P≈0.75, so 8 bands miss with
    * P≈1.5e-5. Integer bit-math (not float log) so the SQL oracle's
    * `length(ltrim(bin(n-1),'0')) + 5` derives the identical value.
    */
  def adaptivePlanesPerBand(n: Long): Int = {
    val bits = if (n <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(8, math.min(PlaneStride, bits + 5))
  }

  /** Corpus-derived coarse-quantizer width for the semantic-dedup /
    * IVF family: `clamp(16, cap, n / targetCellSize)`. Cells stay
    * ~`targetCellSize` vectors, so the Σ n_k² cell-mate pair volume
    * tracks N at every scale with no caller tuning — the
    * [[adaptivePlanesPerBand]] rule transplanted from banding to
    * clustering (a fixed nlist is quadratic N²/nlist at some scale).
    * `cap` bounds trainer cost, NOT pair volume: 64 for the det-Lloyd
    * path (centroids ship as codegen literals and generated-code volume
    * stops scaling past ~64 — past the cap a deployment uses the KMeans
    * path) and 4096 for KMeans (training is O(cap·trainCap·dim)).
    * Pure integer math so the SQL twin ([[adaptiveNlistSql]], a scalar
    * subquery inside the init CTE's LIMIT) derives the identical value.
    */
  def adaptiveNlist(n: Long, targetCellSize: Int, cap: Int): Int =
    math.max(16L, math.min(cap.toLong, n / targetCellSize)).toInt

  /** Caps for [[adaptiveNlist]]'s two trainers (see its scaladoc). */
  final val DetNlistCap = 64
  final val KMeansNlistCap = 4096

  /** DuckDB twin of [[adaptiveNlist]]; `countSql` is a scalar subquery
    * body yielding the corpus count (DuckDB floor-division `//` matches
    * JVM long division on the non-negative operands here).
    */
  def adaptiveNlistSql(countSql: String, targetCellSize: Int, cap: Int): String =
    s"greatest(16, least($cap, ($countSql) // $targetCellSize))"

  /** Fit the coarse KMeans quantizer on a DETERMINISTIC, driver-bounded
    * sample of a (idCol, fv) frame with `n` total rows. The sample is a
    * hash-stride filter — keep rows with `pmod(xxhash64(id), stride) = 0`,
    * `stride = max(1, n / trainCap)` — so the kept set is input-determined
    * (repeat runs over the same corpus train on identical rows, making
    * centroids and hence recall reproducible) and the selection NEVER
    * leaves the executors: the previous `orderBy(xxhash64).limit(cap)`
    * planned as TakeOrderedAndProject, landing `cap` full vectors on the
    * driver (cap·dim·8 B ≈ 3 GiB at cap=100k, dim=4096 — a silent OOM at
    * large dim) before the fit repartition. Here driver state is O(k·dim)
    * (the model itself) at any corpus size or dim; expected sample size is
    * in [trainCap, 2·trainCap) rows, already spread across partitions.
    * A coarse quantizer needs rough cells, not convergence: k-means||
    * init (its extra passes run over the BOUNDED sample, not the corpus,
    * so the cost is capped — and init placement is what decides whether
    * a semantic-dedup cell captures a whole neighborhood) and 5 Lloyd
    * iterations; IVF correctness is centroid-independent (nprobe = nlist
    * equals brute force — the q55 oracle property). Persisted around the
    * fit (KMeans re-executes its input per iteration; cache bounded by
    * the stride construction), released before return.
    */
  private def fitCoarseQuantizer(
      withVec: DataFrame, idCol: String, n: Long, k: Int,
      seed: Long, trainCap: Int): org.apache.spark.ml.clustering.KMeansModel = {
    val stride = math.max(1L, n / trainCap)
    val fitInput = withVec
      .where(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .select("fv")
      .repartition(withVec.sparkSession.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try new KMeans().setK(k).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv")
      .fit(fitInput)
    finally { fitInput.unpersist(); () }
  }

  /** Banded candidate pairs (id_a < id_b, distinct): pairs agreeing on
    * ALL `planesPerBand` sign bits of at least ONE of `numBands` bands —
    * a union of equi-joins on `(band, signature)` keys. The banded frame
    * carries no vectors ((id, band, sig) only, one fused plane sweep).
    * `planeStride` spaces the bands' plane indices (=`planesPerBand` for
    * the classic packed layout; [[PlaneStride]] in adaptive mode).
    */
  private[graft] def bandedCandidates(
      base: DataFrame, idCol: String, dim: Int,
      numBands: Int, planesPerBand: Int, planeStride: Int): DataFrame = {
    val banded = base
      .select(col(idCol),
        posexplode(BandSigs(col("qe"), dim, numBands, planesPerBand, planeStride))
          .as(Seq("band", "sig")))
    banded.select(col(idCol).as("id_a"), col("band"), col("sig"))
      .join(banded.select(col(idCol).as("id_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Embedding-cosine near-duplicate pairs, banded hyperplane LSH:
    * candidates from [[bandedCandidates]], then each candidate is
    * verified with the EXACT int64 squared cosine form
    * `tauDen² · dot² ≥ tauNum² · |a|²·|b|²` (with `dot > 0`) — no float
    * tolerance.
    *
    * Scale: a single fixed-2^p bucketing self-joins N²/2^p pairs — still
    * quadratic for any fixed p (the round-8 stress run measured it at
    * 1255 s / 400k vectors). Banding decouples precision from recall:
    * `planesPerBand` sets bucket granularity while `numBands` buys back
    * recall with b independent chances to collide. Per-band candidate
    * volume is Σ n_k² over bucket sizes n_k — near-linear when buckets
    * are O(1) — and verification is candidate-bounded: only candidate
    * ids' vectors are re-joined (semi-join shrink).
    *
    * `planesPerBand ≤ 0` (the default) derives p from the CORPUS SIZE
    * via [[adaptivePlanesPerBand]] (one O(1)-column count; at table
    * scale it is parquet-metadata cheap) — the scale property then holds
    * at every SF with no caller tuning, which is the difference between
    * "banded at the SF the constant was tuned for" and "banded". AQE
    * skew-splits any residual hot (cluster) bucket either way.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      tauNum: Long,
      tauDen: Long,
      numBands: Int = 8,
      planesPerBand: Int = 0): DataFrame = {
    val adaptive = planesPerBand <= 0
    val p =
      if (adaptive) adaptivePlanesPerBand(df.select(col(idCol)).count())
      else planesPerBand
    val stride = if (adaptive) PlaneStride else planesPerBand
    val src = Par.fanOut(df.select(col(idCol), col(embCol)))
    val base = src.select(col(idCol), quantize(col(embCol)).as("qe"))
    // NOT checkpointed: unlike the broadcast-probe indexed paths, the
    // band self-join sits on a REUSED shuffle exchange, so the extra
    // consumers re-run only the cheap post-exchange join — an r16 A/B
    // measured the eager materialization strictly slower (q81 1.84->1.95,
    // q49 1.09->1.16 s at sf0.1)
    val cand = bandedCandidates(base, idCol, dim, numBands, p, stride)
    val candIds = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    val sub = base.join(candIds, Seq(idCol), "left_semi")
      .withColumn("n2", dotQ(col("qe"), col("qe")))
    cand
      .join(sub.select(col(idCol).as("id_a"), col("qe").as("qa"), col("n2").as("na2")), "id_a")
      .join(sub.select(col(idCol).as("id_b"), col("qe").as("qb"), col("n2").as("nb2")), "id_b")
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .where(col("dot") > 0 &&
        lit(tauDen * tauDen) * col("dot") * col("dot") >=
          lit(tauNum * tauNum) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"), col("nb2"))
  }

  def embeddingNearDupsSql(
      tbl: String,
      idCol: String,
      embCol: String,
      dim: Int,
      tauNum: Long,
      tauDen: Long,
      numBands: Int = 8,
      planesPerBand: Int = 0): String = {
    val adaptive = planesPerBand <= 0
    // adaptive twin of the Spark side: p = clamp(ceil(log2 n)+5, 8, stride)
    // via integer bit-length (bin() is zero-padded in DuckDB ⇒ ltrim),
    // and band b bit j reads LITERAL plane b·stride+j with a `j < p`
    // gate — the sig expression's structure is count-independent even
    // though its value is count-derived, exactly like the Spark plan
    val pSql =
      s"greatest(8, least($PlaneStride, length(ltrim(bin((SELECT count(*) FROM $tbl) - 1), '0')) + 5))"
    def gatedSigSql(b: Int): String =
      "CAST(" + (0 until PlaneStride).map { j =>
        s"CASE WHEN $j < p AND ${dotQSql(s"(${planeSql(b * PlaneStride + j, dim)})", "qe", dim)} > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ") + " AS BIGINT)"
    val bandSelects = (0 until numBands).map { b =>
      if (adaptive)
        s"SELECT $idCol, $b AS band, ${gatedSigSql(b)} AS sig FROM qv, params"
      else
        s"SELECT $idCol, $b AS band, ${lshBucketSql("qe", dim, planesPerBand, b * planesPerBand)} AS sig FROM qv"
    }.mkString(" UNION ALL ")
    val paramsCte = if (adaptive) s"params AS (SELECT CAST($pSql AS INT) AS p), " else ""
    s"""WITH ${paramsCte}qv AS (SELECT $idCol, ${quantizeSql(embCol)} AS qe FROM $tbl),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.$idCol AS id_a, bb.$idCol AS id_b
       |         FROM bands a JOIN bands bb
       |           ON a.band = bb.band AND a.sig = bb.sig AND a.$idCol < bb.$idCol),
       |v AS (SELECT $idCol, qe, ${dotQSql("qe", "qe", dim)} AS n2 FROM qv)
       |SELECT c.id_a, c.id_b, ${dotQSql("va.qe", "vb.qe", dim)} AS dot,
       |       va.n2 AS na2, vb.n2 AS nb2
       |FROM cand c JOIN v va ON va.$idCol = c.id_a JOIN v vb ON vb.$idCol = c.id_b
       |WHERE ${dotQSql("va.qe", "vb.qe", dim)} > 0
       |  AND ${tauDen * tauDen} * ${dotQSql("va.qe", "vb.qe", dim)} * ${dotQSql("va.qe", "vb.qe", dim)}
       |      >= ${tauNum * tauNum} * va.n2 * vb.n2""".stripMargin.replace("\n", " ")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` KMeans
    * cells, then search each query against only the `nprobe` cells whose
    * centroids are nearest to it. The standard coarse-quantizer ANN shape:
    * centroids are tiny (broadcast), the cell assignment is one narrow
    * projection, and the search join touches `nprobe/nlist` of the corpus.
    * Training samples the corpus; at 100 TB you fit on a sample and apply
    * the model corpus-wide (one pass).
    *
    * The learned partition is library-internal (not SQL-expressible), but
    * with `nprobe = nlist` every cell is probed and the result is exactly
    * the brute-force top-k REGARDLESS of where KMeans placed centroids —
    * which is what makes the KMeans path oracle-checkable end to end
    * (q55); recall at nprobe < nlist is asserted in PipelineSpec.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      trainCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withVec = Par.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), col(embCol),
        array_to_vector(col(embCol).cast("array<float>")).as("fv"))
    // trainer input capped at `trainCap` rows (at 100 TB you fit the
    // coarse quantizer on a bounded sample and assign corpus-wide);
    // sampling + fit rationale in [[fitCoarseQuantizer]]
    val model = fitCoarseQuantizer(withVec, idCol, withVec.count(), nlist, seed, trainCap)
    val assigned = model.transform(withVec)
      .select(col(idCol), quantize(col(embCol)).as("qe"), col("prediction").as("cell"))
    // nprobe nearest centroids per query vector, by exact centroid distance
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centroidDf = broadcast(centroids.toSeq.toDF("cell", "centroid"))
    val queries = assigned.where(queryPred)
      .select(col(idCol).as("query_id"), col("qe").as("qv"))
    val qCells = queries.join(centroidDf)
      .withColumn("cdist",
        SqDistQ(col("qv"), transform(col("centroid"), c => round(c * 1000).cast("long"))))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .where(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // bounded-heap rank (GroupedTopKExec), not a row_number window: a hot
    // IVF cell at scale would make the window sort every cell-mate of
    // every query; the heap holds k rows per (task, query)
    val scored = broadcast(qCells).join(assigned, "cell")
      .select(col("query_id"), col(idCol), col("cell"),
        dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** [[ivfTopK]] with a fully deterministic integer Lloyd quantizer in
    * place of KMeans, making the whole IVF path oracle-checkable
    * bit-for-bit: init = the `nlist` lowest-id vectors; assignment = min
    * integer L2 with lowest-cell tie-break; update = per-dimension
    * floor(sum/count) (floor, NOT truncation — Spark's `div` truncates
    * toward zero while DuckDB's `//` floors, and component sums go
    * negative); empty cells keep their previous centroid. Per iteration
    * the 16×dim centroid table is collected to the driver and
    * re-broadcast as literals — exactly how any ANN trainer ships its
    * model, and the only driver-side state is O(nlist·dim).
    */
  /** Fused codegen'd Σ(a-b)² of the `qe` column against a literal
    * centroid — with nlist centroid literals per assignment the
    * zip_with form generated pathological code volume.
    */
  private def l2(cent: Seq[Long]): Column =
    SqDistQ(col("qe"), array(cent.map(lit(_)): _*))

  /** Cell assignment = argmin over the per-centroid distance array;
    * array_position takes the FIRST match so ties resolve to the
    * lowest cell id.
    */
  private def assignCells(src: DataFrame, cents: IndexedSeq[Seq[Long]]): DataFrame = {
    val dists = array(cents.map(l2): _*)
    src.withColumn("cell",
      (array_position(dists, array_min(dists)) - 1).cast("int"))
  }

  /** Deterministic integer Lloyd over a (id, qe) frame: init = the
    * `nlist` lowest-id vectors; update = per-dimension floor(sum/count)
    * (floor, NOT truncation — Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, and component sums go negative); empty cells
    * keep their previous centroid. Per iteration the nlist×dim centroid
    * table is collected to the driver and re-broadcast as literals —
    * exactly how any ANN trainer ships its model, and the only
    * driver-side state is O(nlist·dim). Caller persists `qv` (consumed
    * iters+1 times by the eager collects).
    */
  private def lloydCentroids(
      qv: DataFrame, idCol: String, nlist: Int, iters: Int): IndexedSeq[Seq[Long]] = {
    import qv.sparkSession.implicits._
    var cents: IndexedSeq[Seq[Long]] = qv.orderBy(col(idCol)).limit(nlist)
      .select(col("qe")).as[Seq[Long]].collect().toIndexedSeq
    val dim = cents.headOption.map(_.size).getOrElse(0)
    for (_ <- 1 to iters) {
      // per-cell count + dim component sums in ONE hash aggregate (dim
      // flat sum columns, map-side partial combine) — the earlier
      // posexplode form blew rows up dim× and paid a second shuffle to
      // reassemble arrays. floor(sum/count) stays the DOUBLE division the
      // SQL twin computes (not floorDiv: bit-identical oracle hashes).
      val means = assignCells(qv, cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i => sum(col("qe").getItem(i)).as(s"s$i")): _*)
        .collect()
        .map { r =>
          val n = r.getLong(1).toDouble
          r.getInt(0) ->
            (0 until dim).map(i => math.floor(r.getLong(2 + i) / n).toLong)
        }.toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  def ivfTopKDet(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    // consumed iters+1 times by the EAGER training collects below —
    // persist so quantization runs once per pass, then RELEASED before
    // returning: the final (lazy) plan re-derives quantization from `df`
    // so no corpus-order cache outlives the call
    val src = Par.fanOut(df.select(col(idCol), col(embCol)))
    val qv = src.select(col(idCol), quantize(col(embCol)).as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = try lloydCentroids(qv, idCol, nlist, iters) finally { qv.unpersist(); () }
    val qv2 = src.select(col(idCol), quantize(col(embCol)).as("qe"))
    val assigned = assignCells(qv2, cents)
    val qDists = array(cents.map(l2): _*)
    val queries = qv2.where(queryPred)
      .withColumn("ds", qDists)
      .select(col(idCol).as("query_id"), col("qe").as("qv"),
        posexplode(col("ds")).as(Seq("cell", "cdist")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .where(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // bounded-heap rank — see the ivfTopK rerank note
    val scored = broadcast(queries).join(assigned, "cell")
      .select(col("query_id"), col(idCol), col("cell").cast("long").as("cell"),
        dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** DuckDB equivalent of [[ivfTopKDet]]: the same init / assignment /
    * floor-mean update unrolled as CTE chains, one assignment+update pair
    * per Lloyd iteration. `trainWhereSql` restricts the TRAINING set
    * (init + Lloyd passes) while assignment and probing still cover the
    * whole table — the oracle shape of a standing index grown by
    * [[appendIvfIndex]]: centroids come from the corpus the index was
    * built on, appended rows are assigned by the same frozen model.
    */
  /** Squared-L2 distance between two DuckDB quantized-list expressions. */
  private def distSql(dim: Int)(v: String, c: String): String =
    s"CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> ($v[i]-$c[i])*($v[i]-$c[i]))) AS BIGINT)"

  /** The deterministic-Lloyd CTE prefix shared by every det-IVF oracle
    * (`qv` quantized corpus, `tv` training rows, `cs$iters` trained
    * centroids, `asgn` full-corpus cell assignment) — the SQL twin of
    * [[writeIvfIndex]]+[[appendIvfIndex]]'s state, reused by
    * [[ivfTopKDetSql]] (probe) and [[ivfDriftDetSql]] (occupancy stat).
    */
  private def detAssignCtes(
      tbl: String,
      idCol: String,
      embCol: String,
      dim: Int,
      nlistSql: String,
      iters: Int,
      trainWhereSql: String,
      corpusWhereSql: String = "TRUE"): String = {
    val dist = distSql(dim) _
    // one Lloyd step: assign to cs{j-1}, mean per (cell, dim), carry empty cells
    def step(j: Int): String =
      s"""a$j AS (SELECT $idCol, qe, cell FROM (
         |  SELECT v.$idCol, v.qe, c.cell,
         |    row_number() OVER (PARTITION BY v.$idCol ORDER BY ${dist("v.qe", "c.qe")}, c.cell) AS rn
         |  FROM tv v CROSS JOIN cs${j - 1} c) t WHERE rn = 1),
         |d$j AS (SELECT cell, i, qe[i] AS val FROM a$j CROSS JOIN UNNEST(range(1, ${dim + 1})) AS t(i)),
         |m$j AS (SELECT cell, i, CAST(floor(CAST(sum(val) AS DOUBLE)/count(*)) AS BIGINT) AS mv
         |        FROM d$j GROUP BY cell, i),
         |n$j AS (SELECT cell, list(mv ORDER BY i) AS qe FROM m$j GROUP BY cell),
         |cs$j AS (SELECT p.cell, coalesce(n$j.qe, p.qe) AS qe FROM cs${j - 1} p LEFT JOIN n$j USING (cell))"""
    val steps = (1 to iters).map(step).mkString(",\n")
    s"""qv AS (SELECT $idCol, ${quantizeSql(embCol)} AS qe FROM $tbl),
       |tv AS (SELECT $idCol, qe FROM qv WHERE $trainWhereSql),
       |cs0 AS (SELECT row_number() OVER (ORDER BY $idCol) - 1 AS cell, qe
       |        FROM tv ORDER BY $idCol LIMIT $nlistSql),
       |$steps,
       |asgn AS (SELECT $idCol, qe, cell FROM (
       |  SELECT v.$idCol, v.qe, c.cell,
       |    row_number() OVER (PARTITION BY v.$idCol ORDER BY ${dist("v.qe", "c.qe")}, c.cell) AS rn
       |  FROM (SELECT * FROM qv WHERE $corpusWhereSql) v CROSS JOIN cs$iters c) t WHERE rn = 1)"""
  }

  /** DuckDB twin of [[ivfIndexSkewRaw]] over the det-trained index state:
    * one row `(max_cell, total_rows, nlist)` of the full-corpus cell
    * occupancy under the standing (possibly append-grown) model.
    */
  def ivfDriftDetSql(
      tbl: String,
      idCol: String,
      embCol: String,
      dim: Int,
      nlist: Int = 16,
      iters: Int = 2,
      trainWhereSql: String = "TRUE"): String =
    s"""WITH ${detAssignCtes(tbl, idCol, embCol, dim, nlist.toString, iters, trainWhereSql)},
       |occ AS (SELECT cell, count(*) AS n FROM asgn GROUP BY cell)
       |SELECT max(n) AS max_cell, CAST(sum(n) AS BIGINT) AS total_rows,
       |       (SELECT count(*) FROM cs0) AS nlist FROM occ""".stripMargin.replace("\n", " ")

  /** `corpusWhereSql` restricts the ASSIGNED/probed corpus (queries still
    * come from the whole table): the streaming-ingest oracle's shape —
    * batch b probes an index holding standing rows + batches < b, never
    * its own rows.
    */
  def ivfTopKDetSql(
      tbl: String,
      idCol: String,
      embCol: String,
      queryPredSql: String,
      k: Int,
      dim: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2,
      trainWhereSql: String = "TRUE",
      corpusWhereSql: String = "TRUE"): String = {
    val dist = distSql(dim) _
    s"""WITH ${detAssignCtes(tbl, idCol, embCol, dim, nlist.toString, iters, trainWhereSql, corpusWhereSql)},
       |q AS (SELECT $idCol AS query_id, qe AS qv FROM qv WHERE $queryPredSql),
       |qc AS (SELECT query_id, qv, cell FROM (
       |  SELECT q.query_id, q.qv, c.cell,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${dist("q.qv", "c.qe")}, c.cell) AS crk
       |  FROM q CROSS JOIN cs$iters c) t WHERE crk <= $nprobe)
       |SELECT query_id, $idCol, cell, dot, rk FROM (
       |  SELECT qc.query_id, a.$idCol, qc.cell, ${dotQSql("qc.qv", "a.qe", dim)} AS dot,
       |    row_number() OVER (PARTITION BY qc.query_id ORDER BY ${dotQSql("qc.qv", "a.qe", dim)} DESC, a.$idCol) AS rk
       |  FROM qc JOIN asgn a ON a.cell = qc.cell) t WHERE rk <= $k""".stripMargin.replace("\n", " ")
  }

  /** Materialize a persistent IVF index: `path/centroids` (the nlist×dim
    * model, tiny) and `path/cells/cell=N/` — the corpus quantized and
    * partitioned by its coarse-quantizer cell, so a probe reads ONLY the
    * probed cells' directories (partition pruning; the ANN counterpart
    * of [[graft.functions.Dedup.writeSignatureIndex]]). Training is the
    * deterministic integer Lloyd of [[ivfTopKDet]], which makes the
    * index contents — and any probe over them — oracle-checkable
    * bit-for-bit against [[ivfTopKDetSql]]; a 100 TB deployment
    * swaps in the sample-capped KMeans trainer of [[ivfTopK]] (the
    * index layout and probe are trainer-agnostic). The training cache
    * is released before the assignment write; nothing corpus-order
    * outlives the call.
    */
  def writeIvfIndex(
      df: DataFrame,
      idCol: String,
      embCol: String,
      path: String,
      nlist: Int = 16,
      iters: Int = 2): Unit = {
    import df.sparkSession.implicits._
    val src = Par.fanOut(df.select(col(idCol), col(embCol)))
    val qv = src.select(col(idCol), quantize(col(embCol)).as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = try lloydCentroids(qv, idCol, nlist, iters) finally { qv.unpersist(); () }
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "qe")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assignCells(src.select(col(idCol), quantize(col(embCol)).as("qe")), cents)
      .select(col(idCol), col("qe"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Grow a standing [[writeIvfIndex]] index by one ingested batch — the
    * ANN counterpart of [[graft.functions.Dedup.appendSignatureIndex]]:
    * the batch is quantized and assigned with the index's EXISTING
    * centroid model (read back from `path/centroids`, O(nlist·dim)), then
    * appended into the cell partitions it lands in. Cost is O(batch);
    * standing cell files are never rewritten, and the model is not
    * retrained — standard IVF maintenance. Drift policy lives above this
    * operator: when enough batches accumulate that cell sizes skew, a
    * deployment re-runs [[writeIvfIndex]] (a rebuild-style compaction)
    * off the hot path; probes stay exact-within-probed-cells regardless,
    * because every appended vector is assigned by the same argmin the
    * probe's cell selection uses.
    */
  def appendIvfIndex(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toIndexedSeq.map(_._2)
    val src = Par.fanOut(batch.select(col(idCol), col(embCol)))
    assignCells(src.select(col(idCol), quantize(col(embCol)).as("qe")), cents)
      .select(col(idCol), col("qe"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Cell-occupancy statistics of a materialized [[writeIvfIndex]] index:
    * `(maxCellRows, meanCellRows, skew = max/mean)` over the occupied
    * `cells/` partitions — one O(nlist) count aggregate over a
    * row-group-statistics scan (no vector data read). This is
    * [[appendIvfIndex]]'s drift-policy number: appends never retrain the
    * model, so a shifted ingest distribution concentrates into few cells
    * and probe cost degrades toward a hot-cell scan. A deployment checks
    * [[ivfNeedsRebuild]] after append batches and re-runs
    * [[writeIvfIndex]] (off the hot path) when it trips.
    */
  def ivfIndexSkew(spark: SparkSession, indexPath: String): (Long, Double, Double) = {
    val (mx, total, nlist) = ivfIndexSkewRaw(spark, indexPath)
    val mean = total.toDouble / nlist
    (mx, mean, mx / mean)
  }

  /** Integer form of [[ivfIndexSkew]] — `(maxCellRows, totalRows, nlist)`,
    * from which `skew = max·nlist/total`. Exact (no float division), so
    * the statistic itself is oracle-checkable bit-for-bit (q100).
    */
  def ivfIndexSkewRaw(spark: SparkSession, indexPath: String): (Long, Long, Long) = {
    import spark.implicits._
    val counts = spark.read.parquet(s"$indexPath/cells")
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .select(col("n")).as[Long].collect()
    require(counts.nonEmpty, s"IVF index at $indexPath has no cells")
    // nlist from the MODEL's centroid table, not the occupied cell count:
    // a drift that empties cells is exactly the degradation this stat
    // must surface (mean over occupied cells would bound skew at the
    // occupied count)
    val nlist = spark.read.parquet(s"$indexPath/centroids").count()
    (counts.max, counts.sum, nlist)
  }

  /** The [[ivfIndexSkew]] rebuild trigger as a checkable predicate:
    * true when the hottest cell exceeds `maxSkew` × the mean occupancy
    * (default 4 — a probe of that cell costs ≥4× the balanced plan).
    */
  def ivfNeedsRebuild(
      spark: SparkSession, indexPath: String, maxSkew: Double = 4.0): Boolean =
    ivfIndexSkew(spark, indexPath)._3 > maxSkew

  /** ANN top-k against a materialized [[writeIvfIndex]] index: the
    * centroid table is collected to the driver (O(nlist·dim) — the
    * model), each query picks its `nprobe` nearest cells, and the cells
    * table is scanned with the probed-cell union pushed down as a
    * partition filter — unprobed cell directories are never listed, and
    * the corpus is never re-quantized. Queries are an arbitrary
    * (id, embedding) frame — they need not come from the indexed corpus.
    * For queries drawn from the corpus, result ≡ [[ivfTopKDet]] with the
    * same (nlist, nprobe, iters) (PipelineSpec asserts the equivalence).
    */
  def ivfTopKIndexed(
      queries: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toIndexedSeq.map(_._2)
    val q = queries
      .select(col(idCol).as("query_id"), quantize(col(embCol)).as("qe"))
    // nprobe nearest centroids per query: the window is bounded at nlist
    // rows per query (the exploded centroid table), never corpus-sized
    val qCells = q.withColumn("ds", array(cents.map(l2): _*))
      .select(col("query_id"), col("qe").as("qv"),
        posexplode(col("ds")).as(Seq("cell", "cdist")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .where(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // the probed-cell union: ≤ nlist ints, driver-bounded by
    // construction — the isin reaches the scan as a partition filter
    val probed = qCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = spark.read.parquet(s"$indexPath/cells")
      .where(col("cell").isin(probed: _*))
    val scored = broadcast(qCells).join(cells, "cell")
      .select(col("query_id"), col(idCol), col("cell").cast("long").as("cell"),
        dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** Add PRODUCT-QUANTIZED storage to a [[writeIvfIndex]] layout (Jégou
    * et al. 2011, IVFADC): each vector's RESIDUAL against its cell
    * centroid is split into `m` subvectors of dim/m components, and each
    * subvector is coded as the nearest of `ksub` codewords from that
    * subspace's codebook — `m` small ints per vector
    * (`m·⌈log₂ ksub⌉/8` logical bytes, vs `dim·8` for the raw quantized
    * vector: 12 B vs 512 B ≈ 43× at the dim=64, m=16, ksub=64 defaults;
    * the defaults came from a measured sweep — at fixed code budget,
    * FINER subspaces with RICHER codebooks dominate on hard corpora:
    * m=8/ksub=16 scored recall ≈ random on the stress corpus while
    * m=16/ksub=64 reaches 84% of the exact probe's discriminative
    * recall at a 3%-of-candidates shortlist). At 100 TB of
    * embeddings the raw cell vectors dominate index storage; the PQ
    * codes are the footprint a probe's candidate-scoring pass actually
    * has to read.
    *
    * Codebooks are trained per SUBSPACE (global across cells) with the
    * same deterministic integer Lloyd as the coarse quantizer, on the
    * same hash-stride driver-bounded sample machinery as
    * [[fitCoarseQuantizer]] — training never collects more than the
    * model. Layout adds `path/pq/books` (m·ksub×(dim/m) — the model,
    * tiny) and `path/pq/codes/cell=N/` ((id, codes) only, partitioned
    * like `cells` so probes prune identically). The full-precision
    * `cells` table stays — it is the exact-rerank (and rebuild) source;
    * a deployment tiers it to cold storage.
    */
  def writeIvfPqIndex(
      df: DataFrame,
      idCol: String,
      embCol: String,
      path: String,
      nlist: Int = 16,
      iters: Int = 2,
      m: Int = 16,
      ksub: Int = 64,
      trainCap: Int = 100000): Unit = {
    require(ksub >= 2 && ksub <= 127, s"ksub $ksub outside [2, 127] (codes are int8)")
    writeIvfIndex(df, idCol, embCol, path, nlist, iters)
    val spark = df.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toIndexedSeq
    val dim = cents.head._2.size
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val centDf = broadcast(cents.toDF("cell", "cqe"))
    val resid = spark.read.parquet(s"$path/cells")
      .join(centDf, "cell")
      .select(col(idCol), col("cell"),
        zip_with(col("qe"), col("cqe"), (a, b) => a - b).as("resid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = resid.count()
      val stride = math.max(1L, n / trainCap)
      val sample = resid.where(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      val books: IndexedSeq[IndexedSeq[Seq[Long]]] = (0 until m).map { mm =>
        lloydCentroids(
          sample.select(col(idCol), slice(col("resid"), mm * dsub + 1, dsub).as("qe")),
          idCol, ksub, iters)
      }
      books.zipWithIndex
        .flatMap { case (b, mm) => b.zipWithIndex.map { case (c, kk) => (mm, kk, c) } }
        .toDF("m", "code", "qe")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/pq/books")
      resid.select(col(idCol), col("cell"), pqCodesCol(books, dsub).as("codes"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/pq/codes")
    } finally { resid.unpersist(); () }
  }

  /** One corpus pass codes all m subspaces of a `resid` column (argmin
    * per codebook, ties to the lowest code — the assignCells convention).
    */
  private def pqCodesCol(books: IndexedSeq[IndexedSeq[Seq[Long]]], dsub: Int): Column =
    array(books.indices.map { mm =>
      val dists = array(books(mm).map(c =>
        SqDistQ(slice(col("resid"), mm * dsub + 1, dsub),
          array(c.map(lit(_)): _*))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("tinyint")
    }: _*)

  /** Grow a standing [[writeIvfPqIndex]] index by one ingested batch —
    * the PQ face of [[appendIvfIndex]]: the batch lands in `cells/` under
    * the FROZEN centroid model (via appendIvfIndex) and its PQ codes are
    * computed with the FROZEN subspace codebooks and appended into the
    * same cell partitions — no retrain of either model, O(batch) cost,
    * standing files never rewritten. Probes stay exact-rerank-consistent
    * with the grown `cells/` table regardless of codebook age (ADC
    * quality degrades with drift like cell balance does; the
    * [[ivfNeedsRebuild]] skew guard is the shared rebuild trigger).
    */
  def appendIvfPqIndex(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    appendIvfIndex(batch, idCol, embCol, path)
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toIndexedSeq
    val books: IndexedSeq[IndexedSeq[Seq[Long]]] =
      spark.read.parquet(s"$path/pq/books")
        .as[(Int, Int, Seq[Long])].collect().groupBy(_._1).toIndexedSeq
        .sortBy(_._1).map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)
    val dsub = cents.head._2.size / books.size
    val centDf = broadcast(cents.toDF("cell", "cqe"))
    val src = Par.fanOut(batch.select(col(idCol), col(embCol)))
    assignCells(src.select(col(idCol), quantize(col(embCol)).as("qe")), cents.map(_._2))
      .join(centDf, "cell")
      .select(col(idCol), col("cell"),
        zip_with(col("qe"), col("cqe"), (a, b) => a - b).as("resid"))
      .select(col(idCol), col("cell"), pqCodesCol(books, dsub).as("codes"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/pq/codes")
  }

  /** ANN top-k against a [[writeIvfPqIndex]] index by ASYMMETRIC DISTANCE
    * COMPUTATION + exact rerank: per query, `dot(q, c + r̂) = dot(q, c) +
    * Σₘ LUTₘ[codeₘ]` where LUTₘ[j] = dot(q's m-th subvector, codeword j)
    * — the candidate-scoring pass reads ONLY the probed cells' `pq/codes`
    * partitions (m bytes/vector, never the vectors) and each candidate
    * costs m table lookups. The top-`shortlist` ADC candidates per query
    * are then reranked EXACTLY from the full-precision `cells` rows
    * (semi-join-shrunk to the shortlist, same partition pruning), so the
    * final top-k ordering and tie-breaks are identical to
    * [[ivfTopKIndexed]] whenever the shortlist captures the true top-k —
    * which makes the PQ path oracle-checkable against the exact q89 SQL
    * twin, with recall-vs-shortlist measured in the stress suite.
    */
  def ivfPqTopKIndexed(
      queries: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      k: Int,
      nprobe: Int = 4,
      shortlist: Int = 256): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toIndexedSeq.map(_._2)
    val bookRows = spark.read.parquet(s"$indexPath/pq/books")
      .as[(Int, Int, Seq[Long])].collect()
    val books: IndexedSeq[IndexedSeq[Seq[Long]]] = bookRows.groupBy(_._1).toIndexedSeq
      .sortBy(_._1).map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)
    val ksub = books.head.size
    // ADC query-side state — per-cell dot(q, centroid) and squared
    // distance, plus the m·ksub subvector LUT entries flattened
    // subspace-major for [[AdcSumQ]]'s indexed lookup — computed in ONE
    // typed map over the broadcast models: as literal expressions the
    // m·ksub dot products overflowed janino's generated-class limits
    // (codegen fallback on the whole projection), and the query side is
    // a handful of rows against O(nlist·dim + m·ksub·dim/m) model work.
    val bcC = spark.sparkContext.broadcast(cents.map(_.toArray).toArray)
    val bcB = spark.sparkContext.broadcast(books.map(_.map(_.toArray).toArray).toArray)
    val q = queries
      .select(col(idCol).cast("long").as("query_id"), quantize(col(embCol)).as("qe"))
      .as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val cs = bcC.value
        val bs = bcB.value
        it.map { case (id, qeSeq) =>
          val qa = qeSeq.toArray
          val qcds = new Array[Long](cs.length)
          val ds = new Array[Long](cs.length)
          var c = 0
          while (c < cs.length) {
            val cv = cs(c); var dot = 0L; var dist = 0L; var i = 0
            while (i < qa.length) {
              val d = qa(i) - cv(i); dot += qa(i) * cv(i); dist += d * d; i += 1
            }
            qcds(c) = dot; ds(c) = dist; c += 1
          }
          val m = bs.length
          val ks = bs(0).length
          val dsub = qa.length / m
          val luts = new Array[Long](m * ks)
          var mm = 0
          while (mm < m) {
            var kk = 0
            while (kk < ks) {
              val cw = bs(mm)(kk); var s = 0L; var i = 0
              while (i < dsub) { s += qa(mm * dsub + i) * cw(i); i += 1 }
              luts(mm * ks + kk) = s; kk += 1
            }
            mm += 1
          }
          (id, qeSeq, qcds.toSeq, luts.toSeq, ds.toSeq)
        }
      }.toDF("query_id", "qv", "qcds", "luts", "ds")
    val qCells = q
      .select(col("query_id"), col("qv"), col("qcds"), col("luts"),
        posexplode(col("ds")).as(Seq("cell", "cdist")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .where(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("luts"),
        element_at(col("qcds"), col("cell") + 1).as("qcdot"), col("cell"))
    val probed = qCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val codes = spark.read.parquet(s"$indexPath/pq/codes")
      .where(col("cell").isin(probed: _*))
    // per-candidate cost: m byte-indexed lookups in one codegen loop
    // (AdcSumQ) — the only work that touches every probed-cell row
    val adc = broadcast(qCells).join(codes, "cell")
      .select(col("query_id"), col(idCol), col("cell"), col("qv"),
        (col("qcdot") + AdcSumQ(col("luts"), col("codes"), ksub)).as("adc"))
    val short = TopK.perKey(adc,
      Seq("query_id"), Seq(("adc", true), (idCol, false)), shortlist)
      .select(col("query_id"), col(idCol), col("cell"), col("qv"))
    // exact rerank: fetch full-precision vectors for the shortlist only
    // (same partition pruning; the shortlist join is the semi-join shrink)
    val cells = spark.read.parquet(s"$indexPath/cells")
      .where(col("cell").isin(probed: _*))
      .select(col(idCol), col("cell"), col("qe"))
    val rescored = short.join(cells, Seq(idCol, "cell"))
      .select(col("query_id"), col(idCol), col("cell").cast("long").as("cell"),
        dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(rescored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** Measured discriminative recall@10 of [[ivfTopKIndexed]] per nprobe
    * (stress ann_recall_suite, 400k vectors, nlist=16 — the committed
    * cost/recall table in stress.json). The default curve for
    * [[nprobeForRecall]]; pass your own measurements for another corpus.
    */
  final val MeasuredIvfRecall: Seq[(Int, Double)] = Seq(1 -> 46.5, 2 -> 67.3, 4 -> 93.1)

  /** Smallest nprobe whose MEASURED recall meets `target` percent —
    * the cost/recall table made callable. Past the measured range,
    * extrapolates by halving the miss mass per nprobe doubling (the
    * measured curve halves it or better), capped at `nlistCap`.
    * Monotone in `target` by construction (curve sorted by nprobe,
    * recall non-decreasing along it — pinned by SimilaritySpec).
    */
  def nprobeForRecall(
      target: Double,
      curve: Seq[(Int, Double)] = MeasuredIvfRecall,
      nlistCap: Int = 16): Int = {
    val sorted = curve.sortBy(_._1)
    sorted.find(_._2 >= target).map(_._1).getOrElse {
      var (np, rec) = sorted.last
      while (rec < target && np < nlistCap) {
        np = math.min(nlistCap, np * 2)
        rec = 100.0 - (100.0 - rec) / 2
      }
      np
    }
  }

  /** Bucketed ANN: assign every vector an LSH bucket, then rank only
    * bucket-mates of each query by quantized dot. Returns
    * (query_id, id, bucket, dot, rk ≤ k). Recall is tunable via
    * numPlanes (fewer planes ⇒ bigger buckets ⇒ higher recall/cost).
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      dim: Int,
      numPlanes: Int = 4): DataFrame = {
    val bucketed = Par.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), quantize(col(embCol)).as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), dim, numPlanes))
    val queries = bucketed.where(queryPred)
      .select(col(idCol).as("query_id"), col("qe").as("qv"), col("bucket"))
    // bounded-heap rank — a hot LSH bucket would otherwise be fully
    // sorted per query by the row_number window
    val scored = broadcast(queries).join(bucketed, "bucket")
      .select(col("query_id"), col(idCol), col("bucket"),
        dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** Multi-probe LSH ANN (the Lv et al. 2007 idea in its deterministic
    * form): each query probes its HOME bucket plus every single-plane-
    * flip neighbor — `numPlanes + 1` buckets — because a true neighbor
    * that lands one hyperplane to the other side is the dominant LSH
    * failure mode. Recall rises toward brute force while the corpus side
    * is untouched: the fan-out is on the (small, broadcast) QUERY side
    * only, so the scale shape of [[lshTopK]] is preserved exactly. Each
    * corpus vector lives in one bucket and probe buckets are distinct,
    * so no (query, candidate) pair is scored twice — no dedup pass.
    * Returns (query_id, id, dot, rk ≤ k).
    */
  def lshTopKMultiProbe(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      dim: Int,
      numPlanes: Int = 4): DataFrame = {
    val bucketed = Par.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), quantize(col(embCol)).as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), dim, numPlanes))
    val probeSet = array(
      col("bucket") +: (0 until numPlanes).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val queries = bucketed.where(queryPred)
      .select(col(idCol).as("query_id"), col("qe").as("qv"),
        explode(probeSet).as("bucket"))
    val scored = broadcast(queries).join(bucketed, "bucket")
      .select(col("query_id"), col(idCol), dotQ(col("qv"), col("qe")).as("dot"))
    TopK.perKey(scored, Seq("query_id"), Seq(("dot", true), (idCol, false)), k)
  }

  /** DuckDB twin of [[lshTopKMultiProbe]] (probe buckets via xor on the
    * same literal-plane bucket expression).
    */
  def lshTopKMultiProbeSql(
      tbl: String, idCol: String, embCol: String,
      queryPredSql: String, k: Int, dim: Int, numPlanes: Int = 4): String = {
    val probes = ("bucket" +: (0 until numPlanes).map(j => s"xor(bucket, ${1L << j})"))
      .map(p => s"SELECT query_id, q, $p AS pb FROM qq").mkString(" UNION ALL ")
    s"""qv AS (SELECT $idCol, ${quantizeSql(embCol)} AS qe FROM $tbl),
       |b AS (SELECT $idCol, qe, ${lshBucketSql("qe", dim, numPlanes)} AS bucket FROM qv),
       |qq AS (SELECT $idCol AS query_id, qe AS q, bucket FROM b WHERE $queryPredSql),
       |pr AS ($probes),
       |d AS (SELECT pr.query_id, b.$idCol, ${dotQSql("pr.q", "b.qe", dim)} AS dot
       |      FROM pr JOIN b ON pr.pb = b.bucket)
       |SELECT query_id, $idCol, dot, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, $idCol) AS rk FROM d) r
       |WHERE rk <= $k""".stripMargin.replace("\n", " ")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the corpus with the deterministic integer Lloyd quantizer, compare
    * only CELL-MATES with the exact int64 squared-cosine gate, close the
    * match pairs transitively, and keep ONE representative per semantic
    * group — the member CLOSEST TO ITS CENTROID (integer squared-L2,
    * lowest-id tie-break), which is SemDeDup's own keep rule and differs
    * from the min-id pick of [[embeddingNearDups]]-based resolution.
    * Returns one row per vector: (id, cell, comp, rep, kept).
    *
    * Scale: candidate volume is Σ n_k² over CELL sizes — the clustering
    * plays the role LSH bands play in [[embeddingNearDups]], but with
    * semantically-coherent buckets (the paper's point: near-dups
    * concentrate inside k-means cells, so modest nlist already captures
    * them). At 100 TB, size `nlist ∝ N / targetCellSize` so cells stay
    * O(1); the centroid model stays driver-bounded (nlist·dim longs) and
    * ships as literals — beyond the literal-codegen comfort zone
    * (nlist ≳ 10³) switch the assignment to a broadcast centroid join
    * and reuse the cell-partitioned [[writeIvfIndex]] layout so the
    * pair join reads co-partitioned cells. Edges only ever connect
    * cell-mates, so components never span cells and the per-component
    * pick window is cell-bounded, never corpus-scale — which also makes
    * the closure a single per-cell union-find aggregation
    * ([[Graph.groupedComponents]]), not an iterative fixpoint.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      tauNum: Long,
      tauDen: Long,
      nlist: Int = 0,
      iters: Int = 2,
      targetCellSize: Int = 500): DataFrame = {
    val src = Par.fanOut(df.select(col(idCol), col(embCol)))
    val qv = src.select(col(idCol), quantize(col(embCol)).as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // nlist ≤ 0 = auto: derive from the corpus count ([[adaptiveNlist]],
    // det-path literal-codegen cap 64) — the count also warms the persist
    // the training collects reuse
    val nl = if (nlist > 0) nlist else adaptiveNlist(qv.count(), targetCellSize, DetNlistCap)
    val cents = try lloydCentroids(qv, idCol, nl, iters) finally { qv.unpersist(); () }
    // assignment + own-centroid distance in one pass: the min of the
    // per-centroid distance array IS the assigned cell's distance
    val dists = array(cents.map(l2): _*)
    val a = src.select(col(idCol), quantize(col(embCol)).as("qe"))
      .withColumn("ds", dists)
      .withColumn("cell", (array_position(col("ds"), array_min(col("ds"))) - 1).cast("int"))
      .withColumn("cdist", array_min(col("ds")))
      .drop("ds")
      .withColumn("n2", dotQ(col("qe"), col("qe")))
    // cell-mate pair gate → CC closure → centroid-closest pick: shared
    // with the big-nlist path ([[semanticResolve]])
    semanticResolve(a, idCol, tauNum, tauDen)
  }

  /** The big-`nlist` form of [[semanticDedup]] — the 100 TB path. The
    * det-Lloyd variant ships centroids as codegen literals, which stops
    * scaling past nlist ≈ 64 (generated-code volume); here the coarse
    * quantizer is Spark ML KMeans fitted on a DETERMINISTIC capped
    * sample (same trainer shape and rationale as [[ivfTopK]]: a coarse
    * quantizer needs rough cells, not convergence, and cell-size control
    * comes from `nlist ∝ N`), assignment is `model.transform` (internal
    * argmin — no N×nlist row fan-out), and the own-centroid distance
    * comes from ONE broadcast join against the O(nlist) centroid table.
    * Downstream (cell-mate pair gate, CC closure, centroid-closest
    * struct-min pick) is identical to [[semanticDedup]] — PipelineSpec
    * asserts the two paths agree exactly when given the same cells.
    * The learned partition is library-internal (not SQL-expressible), so
    * this path is spec+stress-covered; [[semanticDedup]] is the
    * oracle-checked twin of the semantics (q108).
    */
  def semanticDedupScaled(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      tauNum: Long,
      tauDen: Long,
      nlist: Int = 0,
      seed: Long = 42L,
      trainCap: Int = 100000,
      targetCellSize: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withVec = Par.fanOut(df.select(col(idCol), col(embCol)))
      .select(col(idCol), col(embCol),
        array_to_vector(col(embCol).cast("array<float>")).as("fv"))
    // nlist ≤ 0 = auto ([[adaptiveNlist]], KMeans cap): cells track N so
    // the cell-mate pair volume stays ~O(N) at every SF without tuning
    val n = withVec.count()
    val nl = if (nlist > 0) nlist else adaptiveNlist(n, targetCellSize, KMeansNlistCap)
    val model = fitCoarseQuantizer(withVec, idCol, n, nl, seed, trainCap)
    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(v => math.round(v * 1000))) }
    val centDf = broadcast(cents.toSeq.toDF("cell", "cq"))
    val assigned = model.transform(withVec)
      .select(col(idCol), quantize(col(embCol)).as("qe"),
        col("prediction").as("cell"))
    semanticResolve(assigned
      .join(centDf, "cell")
      .withColumn("cdist", SqDistQ(col("qe"), col("cq")))
      .withColumn("n2", dotQ(col("qe"), col("qe")))
      .select(col(idCol), col("cell"), col("qe"), col("cdist"), col("n2")),
      idCol, tauNum, tauDen)
  }

  /** Shared back half of both semantic-dedup paths: cell-mate pairs
    * under the exact integer cosine gate → CC closure → centroid-closest
    * struct-min pick. `a` carries (idCol, cell, qe, cdist, n2).
    */
  private def semanticResolve(
      a0: DataFrame, idCol: String, tauNum: Long, tauDen: Long): DataFrame = {
    // the assigned frame feeds the pair self-join (both sides), the
    // component join and the pick — Stages.mat (eager, mode-switched:
    // localCheckpoint locally, reliable checkpoint / persist at
    // deployment) materializes the assignment once and truncates the
    // quantizer lineage out of every downstream plan (blocks are
    // cleaner-managed, nothing pinned in the cache manager across a
    // bench sweep)
    val a = Stages.mat(a0)
    val pairs = a.select(col(idCol).as("id_a"), col("cell"),
        col("qe").as("qa"), col("n2").as("na2"))
      .join(a.select(col(idCol).as("id_b"), col("cell"),
        col("qe").as("qb"), col("n2").as("nb2")), "cell")
      .where(col("id_a") < col("id_b"))
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .where(col("dot") > 0 &&
        lit(tauDen * tauDen) * col("dot") * col("dot") >=
          lit(tauNum * tauNum) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("cell"))
    // edges never span cells and cells are adaptive-nlist-bounded, so the
    // closure is ONE per-cell union-find aggregation, not the driver
    // fixpoint ([[Graph.groupedComponents]] — same min-id labels)
    val cc = Graph.groupedComponents(pairs, "cell", "id_a", "id_b")
    val withComp = a.select(col(idCol), col("cell"), col("cdist"))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cell").cast("long").as("cell"), col("cdist"),
        coalesce(col("component"), col(idCol)).as("comp"))
    val rep = withComp.groupBy(col("comp"))
      .agg(min(struct(col("cdist"), col(idCol))).as("m"))
      .select(col("comp"), col("m").getField(idCol).as("rep"))
    withComp.join(rep, "comp")
      .select(col(idCol), col("cell"), col("comp"), col("rep"),
        (col(idCol) === col("rep")).as("kept"))
  }

  /** DuckDB twin of [[semanticDedup]] (requires `WITH RECURSIVE` from the
    * caller): det-Lloyd CTEs ([[detAssignCtes]]), cell-mate pair gate,
    * recursive transitive closure, closest-to-centroid pick.
    */
  def semanticDedupSql(
      tbl: String,
      idCol: String,
      embCol: String,
      dim: Int,
      tauNum: Long,
      tauDen: Long,
      nlist: Int = 0,
      iters: Int = 2,
      targetCellSize: Int = 500): String = {
    val dist = distSql(dim) _
    val dot = dotQSql("a.qe", "b.qe", dim)
    // nlist ≤ 0 = auto: the LIMIT derives the same clamp(16, cap, n/cell)
    // the Spark side computes from its count ([[adaptiveNlistSql]])
    val nlistSql =
      if (nlist > 0) nlist.toString
      else adaptiveNlistSql("SELECT count(*) FROM tv", targetCellSize, DetNlistCap)
    s"""${detAssignCtes(tbl, idCol, embCol, dim, nlistSql, iters, "TRUE")},
       |sdd AS (SELECT g.$idCol AS id, g.cell, g.qe,
       |  ${dist("g.qe", "c.qe")} AS cdist,
       |  ${dotQSql("g.qe", "g.qe", dim)} AS n2
       |  FROM asgn g JOIN cs$iters c USING (cell)),
       |pairs AS (SELECT a.id AS id_a, b.id AS id_b
       |  FROM sdd a JOIN sdd b ON a.cell = b.cell AND a.id < b.id
       |  WHERE $dot > 0
       |    AND ${tauDen * tauDen} * $dot * $dot >= ${tauNum * tauNum} * a.n2 * b.n2),
       |e AS (SELECT id_a AS u, id_b AS v FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
       |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u),
       |wc AS (SELECT s.id, CAST(s.cell AS BIGINT) AS cell, s.cdist,
       |       coalesce(cc.component, s.id) AS comp
       |       FROM sdd s LEFT JOIN cc USING (id)),
       |rp AS (SELECT comp, id AS rep FROM (
       |  SELECT comp, id, row_number() OVER (PARTITION BY comp ORDER BY cdist, id) AS rn
       |  FROM wc) t WHERE rn = 1)
       |SELECT wc.id AS $idCol, wc.cell, wc.comp, rp.rep, wc.id = rp.rep AS kept
       |FROM wc JOIN rp USING (comp)""".stripMargin.replace("\n", " ")
  }
}
