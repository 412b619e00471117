package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench of gram-generation variants (test scope). */
object Prof54b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    df.count()
    def t[A](name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val r = f
        println(f"  $name%-34s pass$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
      }
    }
    val n = 12
    t("A: explode(array_distinct(hof))") {
      df.where(length(col("text")) >= n)
        .select(col("doc_id"), explode(expr(
          s"array_distinct(transform(sequence(0, length(text)-$n), i -> xxhash64(substring(text, i+1, $n))))")).as("g"))
        .count()
    }
    t("B: explode(hof) no distinct") {
      df.where(length(col("text")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, length(text)-$n), i -> xxhash64(substring(text, i+1, $n)))")).as("g"))
        .count()
    }
    t("C: explode(seq) then hash, distinct") {
      df.where(length(col("text")) >= n)
        .select(col("doc_id"), col("text"), explode(expr(s"sequence(0, length(text)-$n)")).as("i"))
        .select(col("doc_id"), expr(s"xxhash64(substring(text, i+1, $n))").as("g"))
        .distinct()
        .count()
    }
    t("D: explode(array_sort(hof))") {
      df.where(length(col("text")) >= n)
        .select(col("doc_id"), explode(expr(
          s"array_sort(transform(sequence(0, length(text)-$n), i -> xxhash64(substring(text, i+1, $n))))")).as("g"))
        .count()
    }
    spark.stop()
  }
}
