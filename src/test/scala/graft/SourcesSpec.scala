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

  private def warcBytes(recs: Seq[(Long, String)], memberGzip: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (id, text) =>
      val body = text.getBytes("UTF-8")
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:t:$id>\r\nWARC-Target-URI: http://t/doc/$id\r\n" +
        s"X-Graft-Lang: en\r\nX-Graft-Source: s$id\r\nX-Graft-NChars: ${text.length}\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
      if (memberGzip) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish()
      } else out.write(rec)
    }
    out.toByteArray
  }

  test("WARC parser: member-gzip and plain layouts round-trip; damage declines, never throws") {
    import graft.sources.RawCorpus
    val recs = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"), (3L, "zeta"))
    // gzip-member layout (CommonCrawl shape)
    val (gzRecs, gzClean) = RawCorpus.parseWarc(warcBytes(recs, memberGzip = true), gzipped = true)
    assert(gzClean && gzRecs.map(r => (r.targetUri, new String(r.body, "UTF-8"))) ==
      recs.map { case (id, t) => (s"http://t/doc/$id", t) })
    // plain concatenated layout
    val (plRecs, plClean) = RawCorpus.parseWarc(warcBytes(recs, memberGzip = false), gzipped = false)
    assert(plClean && plRecs.size == 3)
    // headers preserved, case-insensitive lookup fields populated
    assert(gzRecs.head.warcType == "response" && gzRecs.head.recordId == "<urn:t:1>")
    assert(gzRecs.head.headers("X-Graft-NChars") == "10")
    // truncated tail: records before the damage survive, clean=false
    val whole = warcBytes(recs, memberGzip = true)
    val cut = whole.take(whole.length - 20)
    val (cutRecs, cutClean) = RawCorpus.parseWarc(cut, gzipped = true)
    assert(!cutClean && cutRecs.size >= 1 && cutRecs.size < 3)
    // pure garbage and mutation fuzz: decline or parse, never throw
    val rnd = new scala.util.Random(19)
    (0 until 200).foreach { _ =>
      val g = Array.fill(rnd.nextInt(400))(rnd.nextInt().toByte)
      RawCorpus.parseWarc(g, gzipped = true)
      RawCorpus.parseWarc(g, gzipped = false)
    }
    (0 until 300).foreach { _ =>
      val mut = whole.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt().toByte
      RawCorpus.parseWarc(mut, gzipped = true)
    }
    // oversized Content-Length must decline, not allocate
    val bomb = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999999999\r\n\r\n")
      .getBytes("UTF-8")
    val (bRecs, bClean) = RawCorpus.parseWarc(bomb, gzipped = false)
    assert(bRecs.isEmpty && !bClean)
  }

  test("JSONL documents ingest: quarantine split is total; WARC read is distributed") {
    import spark.implicits._
    import graft.sources.RawCorpus
    val dir = Files.createTempDirectory("rawcorpus").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      """{"doc_id":1,"text":"a b","lang":"en","source":"s1","n_chars":3}
        |not json at all
        |{"text":"missing id","lang":"en","source":"s2","n_chars":10}
        |{"doc_id":4,"text":"d e f","lang":"fr","source":"s4","n_chars":5}
        |""".stripMargin)
    val (valid, quarantine) = RawCorpus.partitionValid(
      RawCorpus.readJsonlDocs(spark, s"$dir/docs.jsonl"))
    assert(valid.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(quarantine.count() == 2) // corrupt line + null-key line, nothing dropped
    // distributed WARC read over files: per-file decline marks damage
    val wdir = Files.createTempDirectory("rawwarc").toString
    Files.write(java.nio.file.Paths.get(s"$wdir/a.warc.gz"),
      warcBytes(Seq((1L, "x y"), (2L, "z")), memberGzip = true))
    val whole = warcBytes(Seq((3L, "w")), memberGzip = true)
    Files.write(java.nio.file.Paths.get(s"$wdir/b.warc.gz"),
      whole.take(whole.length / 2)) // damaged mid-deflate: nothing parses
    val parsed = RawCorpus.readWarc(spark, wdir)
    val docs = RawCorpus.warcDocs(parsed)
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(docs.map(_._1).toSeq == Seq(1L, 2L) && docs.head._2 == "x y" && docs.head._3 == 3L)
    // the all-damage file surfaces as a marker row for requeue — it
    // neither fails the job nor silently vanishes
    val damaged = parsed.where(!$"clean_eof").select($"path").as[String].collect()
    assert(damaged.length == 1 && damaged.head.endsWith("b.warc.gz"))
  }

  test("WARC http envelope: CommonCrawl-style response bodies strip to the entity") {
    import spark.implicits._
    import graft.sources.RawCorpus
    // pure splitter: envelope stripped, non-HTTP and malformed unchanged
    val env = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>".getBytes("UTF-8")
    assert(new String(RawCorpus.httpPayload(env), "UTF-8") == "<html>hi</html>")
    val plain = "just text".getBytes("UTF-8")
    assert(RawCorpus.httpPayload(plain) eq plain)
    val malformed = "HTTP/1.1 200 OK\r\nno terminator".getBytes("UTF-8")
    assert(RawCorpus.httpPayload(malformed) eq malformed)
    // through the reader: record body carries a full HTTP response
    val http = "HTTP/1.1 200 OK\r\nServer: x\r\n\r\npage body"
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://t/doc/7\r\nContent-Type: application/http\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n").getBytes("UTF-8")
    val wdir = Files.createTempDirectory("rawhttp").toString
    Files.write(java.nio.file.Paths.get(s"$wdir/c.warc"), rec)
    val got = RawCorpus.readWarc(spark, wdir)
      .select($"body".cast("string")).as[String].collect()
    assert(got.toSeq == Seq("page body"))
    // opt-out keeps the raw envelope
    val raw = RawCorpus.readWarc(spark, wdir, httpPayloadOnly = false)
      .select($"body".cast("string")).as[String].collect()
    assert(raw.head.startsWith("HTTP/1.1 200 OK"))
  }
}
