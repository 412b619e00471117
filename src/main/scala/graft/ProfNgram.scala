package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for q54 stage attribution (not part of the library). */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val (idCol, textCol, n, maxDf, minShared) = ("doc_id", "text", 12, 16, 8)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val garrExpr = expr(
        s"array_distinct(transform(sequence(0, length($textCol)-$n), i -> substring($textCol, i+1, $n)))")
      val grams = df.where(length(col(textCol)) >= n)
        .select(col(idCol), explode(garrExpr).as("g"))
      t("grams count")(println("  rows=" + grams.count()))
      val rare = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 2 && col("df") <= maxDf)
        .select(col("g"))
      t("rare")(println("  rare=" + rare.count()))
      val pairGen = "flatten(transform(ids, (x, i) -> " +
        "transform(slice(ids, i + 2, size(ids)), y -> named_struct('doc_a', x, 'doc_b', y))))"
      val cand = grams.join(rare, "g")
        .groupBy(col("g")).agg(sort_array(collect_list(col(idCol))).as("ids"))
        .select(explode(expr(pairGen)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .select(col("doc_a"), col("doc_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("cand")(println("  cand=" + cand.count()))
      val candIds = cand.select(col("doc_a").as(idCol))
        .union(cand.select(col("doc_b").as(idCol))).distinct()
      val sub = df.where(length(col(textCol)) >= n)
        .join(candIds, Seq(idCol), "left_semi")
        .select(col(idCol), garrExpr.as("garr"))
        .select(col(idCol), col("garr"), size(col("garr")).cast("long").as("ng"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("sub")(println("  sub=" + sub.count()))
      val gsub = sub.select(col(idCol), explode(col("garr")).as("g"))
      val inter = cand
        .join(gsub.select(col(idCol).as("doc_a"), col("g")), "doc_a")
        .join(gsub.select(col(idCol).as("doc_b"), col("g")), Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      t("inter")(println("  inter=" + inter.count()))
      val sizes = sub.select(col(idCol), col("ng"))
      val fin = cand
        .join(inter, Seq("doc_a", "doc_b"), "left_outer").na.fill(0L, Seq("inter"))
        .join(sizes.select(col(idCol).as("doc_a"), col("ng").as("na")), "doc_a")
        .join(sizes.select(col(idCol).as("doc_b"), col("ng").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("uni"),
          (col("inter") * 2 >= col("na") + col("nb") - col("inter")).as("is_dup"))
        .where(col("inter") * 4 >= col("uni"))
      t("final")(println("  final=" + fin.count()))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
