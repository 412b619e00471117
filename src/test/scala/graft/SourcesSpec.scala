package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EventLog

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sources-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("jsonl and csv event logs parse identically; corrupt lines quarantine") {
    import spark.implicits._
    val dir = Files.createTempDirectory("srcspec").toString
    val jl = s"$dir/events.jsonl"
    Files.write(java.nio.file.Paths.get(jl), java.util.Arrays.asList(
      """{"event_id":1,"ts":"2024-01-01 10:00:00.000001","user_id":7,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01 10:00:01.000000","user_id":8,"event_type":"view","value":2.0,"props":"{}"}""",
      """this is not json"""))
    val cs = s"$dir/events.csv"
    Files.write(java.nio.file.Paths.get(cs), java.util.Arrays.asList(
      "event_id,ts,user_id,event_type,value,props",
      "1,2024-01-01 10:00:00.000001,7,click,1.5,{}",
      "2,2024-01-01 10:00:01.000000,8,view,2.0,{}"))
    val (jv, jc) = EventLog.partitionValid(EventLog.jsonl(spark, jl))
    val (cv, _) = EventLog.partitionValid(EventLog.csv(spark, cs))
    val jRows = jv.select($"event_id", $"tn", $"user_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val cRows = cv.select($"event_id", $"tn", $"user_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(jRows == cRows)
    assert(jRows.map(_._1) == Seq(1L, 2L))
    // ns epoch: 2024-01-01T10:00:00.000001Z
    assert(jRows.head._2 == 1704103200000001000L)
    assert(jc.as[String].collect().toSeq == Seq("this is not json"))
  }

  test("valid ∪ quarantine ≡ input: every row class lands on exactly one side") {
    import spark.implicits._
    val dir = Files.createTempDirectory("srcspec2").toString
    val jl = s"$dir/events.jsonl"
    Files.write(java.nio.file.Paths.get(jl), java.util.Arrays.asList(
      // valid
      """{"event_id":1,"ts":"2024-01-01 10:00:00.000001","user_id":7,"event_type":"click","value":1.5,"props":"{}"}""",
      // parseable but event_id null — the row class a non-complement
      // quarantine predicate silently dropped
      """{"ts":"2024-01-01 10:00:02.000000","user_id":9,"event_type":"view","value":3.0,"props":"{}"}""",
      // parseable but unparseable timestamp
      """{"event_id":3,"ts":"not a time","user_id":10,"event_type":"view","value":4.0,"props":"{}"}""",
      // structurally corrupt
      """{{{"""))
    val parsed = EventLog.jsonl(spark, jl)
    val (valid, quarantine) = EventLog.partitionValid(parsed)
    assert(valid.count() + quarantine.count() === parsed.count())
    assert(valid.as[(Long, Long, Long, String, Double, String)].collect().map(_._1).toSeq == Seq(1L))
    // the null-event_id and bad-ts rows are quarantined as re-serialized
    // JSON, the corrupt line verbatim
    val q = quarantine.as[String].collect()
    assert(q.length === 3)
    assert(q.count(_.contains("\"user_id\":9")) === 1)
    assert(q.count(_.contains("\"event_id\":3")) === 1)
    assert(q.count(_.startsWith("{{{")) === 1)
  }
}
