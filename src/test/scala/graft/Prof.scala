package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq
    val qs = SparkEntry.queries
    // warmup all
    names.foreach(n => qs(n)(spark, sfDir).count())
    for (n <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).count()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
