package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SortedSetOps

/** Scratch stage-attribution profiler for q54 (test scope only). */
object Prof54 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    df.count()
    val (idCol, textCol, n, maxDf, minShared) = ("doc_id", "text", 12, 16, 8)
    val pairGen = "flatten(transform(ids, (x, i) -> " +
      "transform(slice(ids, i + 2, size(ids)), y -> named_struct('doc_a', x, 'doc_b', y))))"

    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
      }
      val gramsDup = df.where(length(col(textCol)) >= n)
        .select(col(idCol), explode(expr(
          s"transform(sequence(0, length($textCol)-$n), i -> xxhash64(substring($textCol, i+1, $n)))")).as("g"))
      t("explode only")(gramsDup.count())
      val sets = gramsDup.groupBy(col("g"))
        .agg(SortedSetOps.boundedDistinctSet(col(idCol), maxDf).as("ids"))
        .where(col("ids").isNotNull)
      t("bounded-set agg")(sets.count())
      val pairs = sets
        .select(explode(expr(pairGen)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .select(col("doc_a"), col("doc_b"))
      val cand = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("pairs+groupBy (cand)")(cand.count())
      val candIds = cand.select(col("doc_a").as(idCol))
        .union(cand.select(col("doc_b").as(idCol))).distinct()
      val garrSorted = expr(
        s"array_sort(transform(sequence(0, length($textCol)-$n), " +
          s"i -> xxhash64(substring($textCol, i+1, $n))))")
      val sub = df.where(length(col(textCol)) >= n)
        .join(candIds, Seq(idCol), "left_semi")
        .select(col(idCol), garrSorted.as("garr"))
        .select(col(idCol), col("garr"), SortedSetOps.distinctCount(col("garr")).as("ng"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("sub (sorted garr)")(sub.count())
      val out = cand
        .join(sub.select(col(idCol).as("doc_a"), col("garr").as("ga"), col("ng").as("na")), "doc_a")
        .join(sub.select(col(idCol).as("doc_b"), col("garr").as("gb"), col("ng").as("nb")), "doc_b")
        .withColumn("inter", SortedSetOps.intersectCount(col("ga"), col("gb")))
        .where(col("inter") * 4 >= (col("na") + col("nb") - col("inter")))
      t("verify intersect")(out.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
