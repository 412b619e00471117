package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Par, SortedSetOps, TextOps}

/** Scratch stage-attribution profiler for q32 (test scope only). */
object Prof32 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    df.count()
    val (idCol, textCol, k, numHashes) = ("doc_id", "text", 3, 8)

    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
      }
      val grams = (0 until k).map(j => s"tk[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      val sharrExpr = expr(s"transform(sequence(0, size(tk)-$k), i -> $grams)")
      val base = Par.fanOut(df.select(col(idCol), col(textCol)))
        .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
        .where(size(col("tk")) >= k)
        .select(col(idCol), sharrExpr.as("sharr"))
      val hb = transform(col("sharr"), s =>
        conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long") % TextOps.MinhashP)
      val sigCols = (0 until numHashes).map { i =>
        val (a, b) = TextOps.minhashConsts(i)
        array_min(transform(col("hb"), x => (lit(a) * x + lit(b)) % TextOps.MinhashP)).as(s"h$i")
      }
      val sig = base.withColumn("hb", hb).select(col(idCol) +: sigCols: _*)
      t("sig compute")(sig.count())
      val bands = TextOps.lshBands(sig, idCol, numHashes)
      val a = bands.select(col(idCol).as("doc_a"), col("band"), col("k1"), col("k2"))
      val b = bands.select(col(idCol).as("doc_b"), col("band"), col("k1"), col("k2"))
      val cand = a.join(b, Seq("band", "k1", "k2"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      t("cand (incl sig x2)")(cand.count())
      val candIds = cand.select(col("doc_a").as(idCol))
        .union(cand.select(col("doc_b").as(idCol))).distinct()
      val sub = base.join(candIds, Seq(idCol), "left_semi")
        .select(col(idCol), array_sort(transform(col("sharr"), s =>
          conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))).as("sha"))
        .select(col(idCol), col("sha"), SortedSetOps.distinctCount(col("sha")).as("n_sh"))
      val out = cand
        .join(sub.select(col(idCol).as("doc_a"), col("sha").as("sa"), col("n_sh").as("na")), "doc_a")
        .join(sub.select(col(idCol).as("doc_b"), col("sha").as("sb"), col("n_sh").as("nb")), "doc_b")
        .withColumn("inter", SortedSetOps.intersectCount(col("sa"), col("sb")))
      t("full query (all)")(out.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
