package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextOps}

/** Training-data-pipeline stress run: multiplies the sf0.1 corpus to
  * `mult` × 5,000 documents (deterministic per-copy token perturbation so
  * copies are near- but not exact dups) and a matching embedding set,
  * then times every pipeline family end to end. A scale sanity-check
  * that the dedup/similarity shapes hold when the corpus grows 20×
  * past what the driver's bench reaches, with per-stage throughput.
  * Usage: runMain graft.PipelineStress [mult]
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // copy c of a doc mutates token positions (7c mod 13, 7c+1 mod 17) —
    // every copy is a near-dup of copy 0, none is byte-identical
    val docs = base
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select(
        (col("doc_id") * mult + col("copy")).as("doc_id"),
        concat_ws(" ", expr(
          """transform(split(text, ' '), (tk, i) ->
            |  CASE WHEN copy > 0 AND i = (7*copy) % 13 THEN concat('v', copy, tk)
            |       WHEN copy > 0 AND i = (7*copy + 1) % 17 THEN concat(tk, '_', copy)
            |       ELSE tk END)""".stripMargin)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    println(s"[stress] corpus: $n docs (${mult}x sf0.1)")

    timed("exact dedup") {
      Dedup.exactDedup(docs, "doc_id", "text").count()
    }
    timed("minhash signatures") {
      TextOps.minhashSignatures(
        TextOps.shingles(docs, "doc_id", "text"), "doc_id").count()
    }
    val pairs = timed("LSH near-dup pairs (full)") {
      Dedup.nearDupPairs(docs, "doc_id", "text").count()
    }
    println(s"[stress]   near-dup pairs found: $pairs")
    // maxDf must exceed the copy multiplicity: every 12-gram of a base
    // doc recurs in all `mult` near-copies, so the production cap of 16
    // would (correctly) treat them as stop-grams and emit nothing
    val npairs = timed("ngram Jaccard near-dup (bounded-agg)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", maxDf = 4 * mult).count()
    }
    println(s"[stress]   ngram near-dup pairs found: $npairs")
    timed("simhash") {
      TextOps.simhash(docs, "doc_id", "text").count()
    }
    timed("lang-id") {
      TextOps.langId(docs, "doc_id", "text").count()
    }
    timed("quality score") {
      TextOps.qualityScore(docs.withColumn("n_chars", length(col("text"))),
        "doc_id", "text", "n_chars").count()
    }
    timed("token counts") {
      TextOps.tokenCounts(docs, "doc_id", "text").count()
    }
    timed("winnowing fingerprints") {
      TextOps.winnowFromText(docs, "doc_id", "text").count()
    }

    // embeddings: mult x 500 vectors via per-copy sign flips
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select(
        (col("vec_id") * mult + col("copy")).as("vec_id"),
        expr("transform(embedding, (v, i) -> CASE WHEN (i + copy) % 5 = 0 THEN -v ELSE v END)")
          .cast("array<float>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress] embeddings: ${emb.count()} vectors")
    timed("ANN LSH top-k (100 queries)") {
      Similarity.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 100, 5, 64, 4).count()
    }
    timed("embedding near-dups (LSH buckets)") {
      Similarity.embeddingNearDups(emb, "vec_id", "embedding", 64,
        tauNum = 3, tauDen = 10).count()
    }
    timed("IVF det ANN (train + probe, 100 queries)") {
      Similarity.ivfTopKDet(emb, "vec_id", "embedding",
        col("vec_id") < 100, 5).count()
    }
    println(f"[stress] done: $n docs, ${n / 1e3}%.0fk-doc corpus held all pipeline shapes")
    spark.stop()
  }
}
