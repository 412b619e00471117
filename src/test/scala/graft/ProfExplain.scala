package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness (test scope): prints the formatted physical plans
  * of pushdown-sensitive queries so scan pruning is verifiable.
  */
object ProfExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q11_cutout", "q01_pricing_summary")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
