package graft

import org.apache.spark.sql.SparkSession

/** Times the REAL q32 SparkEntry function repeatedly (test scope). */
object Prof32b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries("q32_near_dup_pairs")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(f"  run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
