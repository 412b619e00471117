package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, Resource, VoxelType}
import graft.engine.SpatialOps
import graft.storage.{CuboidCodec, VolumeGen, VoxelRow}
import graft.streaming.{StreamOps, StreamingDedup, StreamingRawIngest, WriteEvent}

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streamops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("windowed event counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedEventCounts(df, watermark = "1 minute", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("wec")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: events inside [10:00, 10:05)
    mem.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(3), "b", 5.0))
    q.processAllAvailable()
    // batch 2 advances the watermark past 10:05; batch 3 emits the closed windows
    mem.addData((t(21), "a", 9.0))
    q.processAllAvailable()
    mem.addData((t(22), "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wec")
      .select($"event_type", $"n", $"total").as[(String, Long, Double)].collect().toSet
    assert(rows.contains(("a", 2L, 3.0)) && rows.contains(("b", 1L, 5.0)))
  }

  test("in-flight dedup: first write per cuboid key wins within state window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WriteEvent]
    val q = StreamOps.dedupInFlight(mem.toDS())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData(
      WriteEvent("k", 0, 0, 5L, 2L, Array[Byte](2)),
      WriteEvent("k", 0, 0, 5L, 1L, Array[Byte](1)), // same key, lower seq: wins
      WriteEvent("k", 0, 0, 9L, 3L, Array[Byte](3)))
    q.processAllAvailable()
    // a later batch for an in-flight key is suppressed by state
    mem.addData(WriteEvent("k", 0, 0, 5L, 7L, Array[Byte](7)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup").as[WriteEvent].collect()
    assert(out.map(w => (w.morton, w.seq)).toSet == Set((5L, 1L), (9L, 3L)))
  }

  test("stream-stream ack join matches within the interval and bounds state by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val writes = MemoryStream[(String, Timestamp)]
    val acks = MemoryStream[(String, Timestamp)]
    val q = StreamOps.ackJoin(
      writes.toDF().toDF("w_key", "w_ts"),
      acks.toDF().toDF("a_key", "a_ts"),
      within = "5 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("ackjoin")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    writes.addData(("k1", t(0)), ("k2", t(0)))
    // k1 acked in-window (+2 min); k2 acked out-of-window (+20 min);
    // an ack for an unknown key never matches
    acks.addData(("k1", t(2)), ("k2", t(20)), ("k9", t(1)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ackjoin")
      .select($"w_key", $"a_ts").as[(String, Timestamp)].collect()
    assert(out.toSeq == Seq(("k1", t(2))))
  }

  test("streaming dedup: per-batch probe + intra-batch pairs + index growth across drains") {
    import spark.implicits._
    val docsDir = java.nio.file.Files.createTempDirectory("sdd-docs").toString
    val idx = java.nio.file.Files.createTempDirectory("sdd-idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("sdd-verd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdd-ckpt").toString
    // standing corpus → persistent index
    graft.functions.Dedup.writeSignatureIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "an entirely separate corpus document about versioned cuboid stores"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idx)
    // batch 1: a near-dup of corpus doc 1, an unrelated doc, and an
    // intra-batch near-dup pair
    Seq((100L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (101L, "completely different content about spark clusters and parquet files everywhere"),
      (102L, "training data pipelines dedup documents with minhash signatures at scale now"),
      (103L, "training data pipelines dedup documents with minhash signatures at scale soon"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(docsDir)
    StreamingDedup.runAvailableNow(spark, docsDir, idx, verdicts, ckpt)
    // batch 2 (second drain, checkpoint resumes): near-dup of BATCH-1's
    // doc 100 — only findable if batch 1's signatures reached the index
    Seq((200L, "the quick brown fox jumps over the lazy dog near the river bank forever"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(docsDir)
    StreamingDedup.runAvailableNow(spark, docsDir, idx, verdicts, ckpt)
    val v = spark.read.parquet(verdicts)
      .select($"batch_id", $"doc_new", $"doc_old", $"intra", $"is_dup")
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    val dups = v.filter(_._5).map(r => (r._2, r._3, r._4)).toSet
    assert(dups.contains((100L, 1L, false)), "batch-1 doc must match the standing corpus")
    assert(dups.contains((102L, 103L, true)), "intra-batch pair must surface")
    assert(!v.exists(r => (r._2 == 101L || r._3 == 101L) && r._5), "unrelated doc clean")
    assert(dups.contains((200L, 100L, false)),
      "batch-2 doc must match batch-1's doc through the grown index")
    // verdict log is partitioned by batch id; both drains logged
    assert(v.map(_._1).toSet == Set(0L, 1L))
  }

  test("streaming raw ingest: quarantine, exact-dedup gate, curated store, index growth") {
    import spark.implicits._
    val rawDir = java.nio.file.Files.createTempDirectory("sri-raw").toString
    val idx = java.nio.file.Files.createTempDirectory("sri-idx").toString
    val curated = java.nio.file.Files.createTempDirectory("sri-cur").toString
    val verdicts = java.nio.file.Files.createTempDirectory("sri-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("sri-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sri-ckpt").toString
    // standing corpus: doc 1 seeds the hash index
    graft.functions.Dedup.writeHashIndex(
      Seq((1L, "standing corpus text")).toDF("doc_id", "text"), "doc_id", "text", idx)
    def jline(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"t","n_chars":${text.length}}"""
    // batch 1: standing dup, intra-batch pair (11 kept, 12 dup), a fresh
    // doc, a corrupt line, and a valid JSON missing its key
    java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, "b1.jsonl"),
      Seq(jline(10, "standing corpus text"),
        jline(11, "batch one original"), jline(12, "batch one original"),
        jline(13, "unique text"),
        """{"oops" not json""",
        """{"text":"no id here"}""").mkString("\n").getBytes("UTF-8"))
    StreamingRawIngest.runAvailableNow(spark, rawDir, idx, curated, verdicts, quar, ckpt)
    // batch 2 (checkpoint resumes): dup of BATCH-1's kept doc 11 — only
    // detectable through the index grown by drain 1 — plus a fresh doc
    java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, "b2.jsonl"),
      Seq(jline(20, "batch one original"), jline(21, "second fresh text"))
        .mkString("\n").getBytes("UTF-8"))
    StreamingRawIngest.runAvailableNow(spark, rawDir, idx, curated, verdicts, quar, ckpt)
    val v = spark.read.parquet(verdicts)
      .select($"doc_id", $"kept", $"rep").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v(10L) == ((false, 1L)), "standing dup resolves to the seeded rep")
    assert(v(11L) == ((true, 11L)) && v(12L) == ((false, 11L)),
      "intra-batch copies keep the lowest id")
    assert(v(13L) == ((true, 13L)) && v(21L) == ((true, 21L)))
    assert(v(20L) == ((false, 11L)),
      "batch-2 dup must resolve through the index grown by drain 1")
    // quarantine is total and non-fatal: both bad lines logged, neither ingested
    assert(spark.read.parquet(quar).count() == 2)
    assert(!v.contains(0L) && v.size == 6)
    // curated store holds exactly the kept docs
    val cur = spark.read.parquet(curated).select($"doc_id").as[Long].collect().sorted
    assert(cur.toSeq == Seq(11L, 13L, 21L))
  }

  test("streaming raw ingest soak: random drains match the first-arrival-wins model") {
    import spark.implicits._
    // Randomized duplicates across a standing corpus + 5 drains, checked
    // against an independent in-memory simulation of first-arrival-wins
    // dedup — the property the q134 oracle pins on one fixture, here
    // exercised on arbitrary collision patterns (standing hits,
    // intra-batch ties, cross-batch chains, singletons).
    val rnd = new scala.util.Random(4242)
    val pool = (0 until 12).map(i => s"pooled text variant $i")
    def randText() = pool(rnd.nextInt(pool.length))
    val standing = (0L until 8L).map(i => (i, randText()))
    val batches = (0 until 5).map { b =>
      (0 until 6 + rnd.nextInt(6)).map(j => (100L * (b + 1) + j, randText()))
    }
    // reference model
    val rep = scala.collection.mutable.HashMap.empty[String, Long]
    standing.groupBy(_._2).foreach { case (t, ds) => rep(t) = ds.map(_._1).min }
    val expect = scala.collection.mutable.HashMap.empty[Long, (Boolean, Long)]
    batches.foreach { docs =>
      val newReps = docs.groupBy(_._2).collect {
        case (t, ds) if !rep.contains(t) => t -> ds.map(_._1).min
      }
      docs.foreach { case (id, t) =>
        expect(id) = (newReps.get(t).contains(id), rep.getOrElse(t, newReps(t)))
      }
      newReps.foreach { case (t, r) => rep(t) = r }
    }
    // the job
    val rawDir = java.nio.file.Files.createTempDirectory("soak-raw").toString
    val idx = java.nio.file.Files.createTempDirectory("soak-idx").toString
    val curated = java.nio.file.Files.createTempDirectory("soak-cur").toString
    val verdicts = java.nio.file.Files.createTempDirectory("soak-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("soak-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("soak-ckpt").toString
    graft.functions.Dedup.writeHashIndex(
      standing.toDF("doc_id", "text"), "doc_id", "text", idx)
    batches.zipWithIndex.foreach { case (docs, b) =>
      val lines = docs.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t","lang":"en","source":"s","n_chars":${t.length}}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, s"b$b.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      StreamingRawIngest.runAvailableNow(spark, rawDir, idx, curated, verdicts, quar, ckpt)
    }
    val got = spark.read.parquet(verdicts)
      .select($"doc_id", $"kept", $"rep").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == expect.keySet)
    val bad = expect.filter { case (id, e) => got(id) != e }
    assert(bad.isEmpty, s"verdicts diverge from the model: ${bad.take(5)} got ${bad.take(5).map { case (i, _) => i -> got(i) }}")
    // curated store = kept docs, exactly once each
    val cur = spark.read.parquet(curated).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(cur == expect.collect { case (id, (true, _)) => id }.toSeq.sorted)
  }

  test("streaming WARC ingest: same gate, damaged archive quarantined, growth across drains") {
    import spark.implicits._
    def warcGz(recs: Seq[(Long, String)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      recs.foreach { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Record-ID: <urn:t:$id>\r\nWARC-Target-URI: http://t/doc/$id\r\n" +
          s"X-Graft-Lang: en\r\nX-Graft-Source: s$id\r\nX-Graft-NChars: ${text.length}\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
          body ++ "\r\n\r\n".getBytes("UTF-8")
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish()
      }
      out.toByteArray
    }
    val rawDir = java.nio.file.Files.createTempDirectory("swi-raw").toString
    val idx = java.nio.file.Files.createTempDirectory("swi-idx").toString
    val curated = java.nio.file.Files.createTempDirectory("swi-cur").toString
    val verdicts = java.nio.file.Files.createTempDirectory("swi-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("swi-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("swi-ckpt").toString
    graft.functions.Dedup.writeHashIndex(
      Seq((1L, "standing corpus text")).toDF("doc_id", "text"), "doc_id", "text", idx)
    // drain 1: one good archive (standing dup + intra pair + fresh doc)
    // and one hopelessly damaged archive (marker row → quarantine)
    java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, "a.warc.gz"),
      warcGz(Seq(10L -> "standing corpus text",
        11L -> "warc batch original", 12L -> "warc batch original",
        13L -> "warc unique text")))
    java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, "bad.warc.gz"),
      Array.fill[Byte](64)(0x2a))
    StreamingRawIngest.runAvailableNowWarc(spark, rawDir, idx, curated, verdicts, quar, ckpt)
    // drain 2: dup of drain-1's kept doc 11 through the grown index — in
    // a PARTIALLY damaged archive (valid member + truncated garbage
    // tail): the leading record must still ingest AND the file must be
    // flagged for requeue
    java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, "b.warc.gz"),
      { // valid member + a second member truncated mid-deflate (trailing
        // NON-member garbage is silent EOF by gzip's own contract)
        val tail = warcGz(Seq(21L -> "never fully arrives"))
        warcGz(Seq(20L -> "warc batch original")) ++ tail.take(tail.length / 2)
      })
    StreamingRawIngest.runAvailableNowWarc(spark, rawDir, idx, curated, verdicts, quar, ckpt)
    val v = spark.read.parquet(verdicts)
      .select($"doc_id", $"kept", $"rep").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v(10L) == ((false, 1L)) && v(11L) == ((true, 11L)) &&
      v(12L) == ((false, 11L)) && v(13L) == ((true, 13L)))
    assert(v(20L) == ((false, 11L)), "drain-2 dup resolves through the grown index")
    val q = spark.read.parquet(quar).select($"_corrupt").as[String].collect()
    assert(q.exists(_.contains("bad.warc.gz")), s"damaged archive must be quarantined: ${q.toSeq}")
    assert(q.exists(_.contains("b.warc.gz")),
      s"partially damaged archive must be flagged for requeue: ${q.toSeq}")
    assert(spark.read.parquet(curated).select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 13L))
  }

  test("streaming vectors: probe-before-append, index growth across drains, drift column") {
    import spark.implicits._
    import graft.functions.Similarity
    import graft.streaming.StreamingVectors
    val vecsDir = java.nio.file.Files.createTempDirectory("svc-vecs").toString
    val idx = java.nio.file.Files.createTempDirectory("svc-idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("svc-verd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("svc-ckpt").toString
    def axis(i: Int, s: Float) = Array.tabulate(8)(j => if (j == i * 2) s else 0f)
    // standing corpus: 4 axis clusters × 5 members (ids interleaved so
    // the det-Lloyd seeds span directions), scales 1.0..1.8
    val corpus = (for { c <- 0 until 4; m <- 0 until 5 }
      yield ((m * 4 + c).toLong, axis(c, 1.0f + 0.2f * m))).toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", idx, nlist = 4, iters = 2)
    // batch 1: one new vector per direction
    Seq((100L, axis(0, 1.5f)), (101L, axis(1, 1.5f)), (102L, axis(2, 1.5f)),
      (103L, axis(3, 0.9f)))
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(vecsDir)
    StreamingVectors.runAvailableNow(spark, vecsDir, idx, verdicts, ckpt, dim = 8)
    // batch 2 (second drain): same direction as batch-1's vec 100 — it
    // can only surface if the append grew the index
    Seq((200L, axis(0, 1.2f)))
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(vecsDir)
    StreamingVectors.runAvailableNow(spark, vecsDir, idx, verdicts, ckpt, dim = 8)
    val v = spark.read.parquet(verdicts)
      .select($"batch_id", $"query_id", $"vec_id", $"rk", $"max_skew")
      .as[(Long, Long, Long, Long, Double)].collect()
    val b0 = v.filter(_._1 == 0L)
    // probe ran BEFORE append: a batch vector never matches itself or a
    // batch-mate in its own drain
    assert(b0.forall(r => r._3 < 100L), s"self/batch-mate leak: ${b0.mkString(",")}")
    // top-1 per direction = the largest-norm standing member (dot metric):
    // corpus scale 1.8 lives at id 16+c
    (0 until 4).foreach { c =>
      val top = b0.filter(r => r._2 == 100L + c && r._4 == 1L).map(_._3)
      assert(top.toSeq == Seq(16L + c), s"direction $c top-1: ${top.toSeq}")
    }
    // batch-2: vec 100 (appended in drain 1) must appear in 200's top-k
    val b1 = v.filter(_._1 == 1L)
    assert(b1.map(_._2).toSet == Set(200L))
    assert(b1.exists(_._3 == 100L), s"grown index missing batch-1 vector: ${b1.mkString(",")}")
    // the drift column rides every verdict row
    assert(v.forall(_._5 > 0.0))
  }

  test("morton functions usable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT morton_encode(3, 5, 7) AS m, morton_x(morton_encode(3, 5, 7)) AS x," +
        " morton_y(morton_encode(3, 5, 7)) AS y, morton_z(morton_encode(3, 5, 7)) AS z")
      .collect().head
    assert(r.getLong(0) == graft.core.Morton.encode(3, 5, 7))
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 5L, 7L)))
    // similarity/set primitives ride the same registry
    val s2 = spark.sql(
      "SELECT dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d," +
        " sqdist_q(array(1L,2L), array(4L,6L)) AS sq," +
        " sorted_intersect_count(array(1L,2L,2L,5L), array(2L,5L,9L)) AS ic," +
        " sorted_distinct_count(array(1L,1L,2L,7L,7L)) AS dc")
      .collect().head
    assert(s2.getLong(0) == 32L && s2.getLong(1) == 25L)
    assert(s2.getLong(2) == 2L && s2.getLong(3) == 3L)
    // text normalization rides the same registry (decomposed → composed)
    val s3 = spark.sql("SELECT nfc_normalize('Café') AS t").collect().head
    assert(s3.getString(0) == "Café")
    // extension class injects the same builders
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders validated above
  }

  test("cuboidsExist splits requested keys into present/absent") {
    import spark.implicits._
    val dims = Region.CuboidDims(8, 8, 4)
    val vol = VolumeGen.voxels(spark, "k", 0, Region.Box(0, 16, 0, 8, 0, 4), 0 until 1,
      VoxelType.UInt64, seed = 5)
    val stored = CuboidCodec.fromVoxels(vol, VoxelType.UInt64, dims) // mortons 0,1
    val requested = Seq(
      ("k", 0, 0, 0L), ("k", 0, 0, 1L), ("k", 0, 0, 99L))
      .toDF("lookupKey", "res", "t", "morton")
    val (present, absent) = SpatialOps.cuboidsExist(requested, stored)
    assert(present.select("morton").as[Long].collect().toSet == Set(0L, 1L))
    assert(absent.select("morton").as[Long].collect().toSet == Set(99L))
  }

  test("sortCubes groups time samples sorted per morton") {
    import spark.implicits._
    val dims = Region.CuboidDims(8, 8, 4)
    val vol = VolumeGen.voxels(spark, "k", 0, Region.Box(0, 8, 0, 8, 0, 4), 0 until 3,
      VoxelType.UInt64, seed = 6)
    val sorted = SpatialOps.sortCubes(CuboidCodec.fromVoxels(vol, VoxelType.UInt64, dims))
    val row = sorted.collect().head
    val ts = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("samples")).map(_.getAs[Int]("t"))
    assert(ts == Seq(0, 1, 2))
  }

  test("resource level math: extents, voxel dims, isotropic level") {
    val r = Resource.fixture(VoxelType.UInt8) // voxel 4x4x35nm, 7 levels
    assert(r.extentAt(0) == ((2048L, 2048L, 128L)))
    assert(r.extentAt(2) == ((512L, 512L, 128L))) // anisotropic: z unscaled
    assert(r.voxelDimsAt(1) == ((8.0, 8.0, 35.0)))
    // 4*2^r / 35 closest to 1 at r=3 (32/35)
    assert(r.isotropicLevel == 3)
  }

  test("bucketed cuboid tables join without a shuffle exchange") {
    import graft.storage.CuboidStore
    val dims = Region.CuboidDims(8, 8, 4)
    val box = Region.Box(0, 32, 0, 32, 0, 8)
    val a = CuboidCodec.fromVoxels(
      VolumeGen.voxels(spark, "k", 0, box, 0 until 1, VoxelType.UInt64, seed = 41), VoxelType.UInt64, dims)
    val b = CuboidCodec.fromVoxels(
      VolumeGen.voxels(spark, "k", 0, box, 0 until 1, VoxelType.UInt64, seed = 42), VoxelType.UInt64, dims)
    val d1 = java.nio.file.Files.createTempDirectory("bt1").toString
    val d2 = java.nio.file.Files.createTempDirectory("bt2").toString
    CuboidStore.writeBucketed(a, "bt_a", d1, buckets = 8)
    CuboidStore.writeBucketed(b, "bt_b", d2, buckets = 8)
    val joined = spark.table("bt_a").join(spark.table("bt_b"), "morton")
    joined.count() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
  }

  test("resource JSON round-trip (BossResourceBasic analog)") {
    import graft.core.ResourceJson
    for (vt <- Seq(VoxelType.UInt8, VoxelType.UInt16, VoxelType.UInt64)) {
      val r = Resource.fixture(vt)
      val back = ResourceJson.fromJson(ResourceJson.toJson(r))
      assert(back == r)
    }
    // unknown fields in incoming JSON are tolerated (forward compat)
    val j = ResourceJson.toJson(Resource.fixture(VoxelType.UInt8))
      .replaceFirst("\\{", "{\"future_field\":1,")
    assert(ResourceJson.fromJson(j) == Resource.fixture(VoxelType.UInt8))
  }

  test("constant volume generator (M9 ones)") {
    import spark.implicits._
    val ones = VolumeGen.constant(spark, "k", 0, Region.Box(0, 4, 0, 4, 0, 2), 0 until 1, 1L)
    assert(ones.count() == 32 && ones.map(_.value).distinct().collect().toSeq == Seq(1L))
  }

  test("streaming media ingest: modality routing, cross-drain dedup through grown indexes, junk quarantined") {
    import spark.implicits._
    import graft.functions.Multimodal
    import graft.streaming.StreamingMediaIngest
    val rawDir = java.nio.file.Files.createTempDirectory("smi-raw").toString
    val idx = java.nio.file.Files.createTempDirectory("smi-idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("smi-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("smi-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("smi-ckpt").toString
    def png(perturb: Int) = Multimodal.encodeGrayPng(18, 16,
      (x, y) => if (x == 0 && y == perturb) 255 else x * 10)
    def wav() = Multimodal.encodeWavPcm16(8000,
      Array.tabulate(1152)(k => (k / 16 * 10).toShort))
    def avi(perturb: Int) = Multimodal.encodeAviDib(18, 12,
      (0 until 8).map(f => Array.tabulate(18 * 12)(k =>
        (if (f == 0 && k == perturb) 255 else k % 18 * 10).toByte)))
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, name), bytes)
    def drain(): Unit = StreamingMediaIngest.runAvailableNow(
      spark, rawDir, idx, verdicts, quar, ckpt)
    // drain 1: one clip per modality (all fresh), junk + no-id files
    put("1.png", png(1)); put("2.wav", wav()); put("3.avi", avi(5))
    put("9.bin", "garbage-bytes".getBytes("UTF-8"))
    put("noid.txt", "x".getBytes("UTF-8"))
    drain()
    // drain 2: near-dups of drain-1 clips (only detectable through the
    // indexes grown by drain 1) + an intra-batch image pair + fresh audio
    put("11.png", png(3))   // same fingerprint as 1 (perturb off-sample)
    put("12.wav", Multimodal.encodeWavPcm16(8000,  // reversed ramp: fresh
      Array.tabulate(1152)(k => ((71 - k / 16) * 10).toShort)))
    put("13.avi", avi(7))   // same fingerprint as 3
    put("21.png", Multimodal.encodeGrayPng(18, 16, (x, y) => 255 - x * 10))
    put("22.png", Multimodal.encodeGrayPng(18, 16,
      (x, y) => if (x == 0 && y == 2) 0 else 255 - x * 10))
    // sniffs as audio (RIFF/WAVE) but is truncated garbage — AND shares
    // its id with the decodable 11.png, so an id-only undecodable
    // anti-join would silently swallow it
    put("11.wav", "RIFF0000WAVEgarbage".getBytes("UTF-8"))
    drain()
    val v = spark.read.parquet(verdicts)
      .select($"id", $"modality", $"rep", $"kept")
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(v(1L) == (("image", 1L, true)) && v(2L) == (("audio", 2L, true))
      && v(3L) == (("video", 3L, true)), s"drain 1 all kept: $v")
    assert(v(11L) == (("image", 1L, false)),
      s"cross-drain image dup via grown index: ${v(11L)}")
    assert(v(13L) == (("video", 3L, false)),
      s"cross-drain video dup via grown index: ${v(13L)}")
    assert(v(12L) == (("audio", 12L, true)), s"shifted audio is fresh: ${v(12L)}")
    assert(v(21L) == (("image", 21L, true)) && v(22L) == (("image", 21L, false)),
      s"intra-batch pair keeps the lower id: ${v(21L)} ${v(22L)}")
    assert(v.size == 8)
    val q = spark.read.parquet(quar).select($"path", $"reason")
      .as[(String, String)].collect().toSet
    assert(q.exists(r => r._1.endsWith("noid.txt") && r._2 == "no_id"), s"$q")
    // quarantine rows carry the REAL file path (triage must locate the
    // offending blob), never a bare id
    assert(q.exists(r => r._1.endsWith("9.bin") && r._2 == "junk"), s"$q")
    // the undecodable WAV quarantines even though a decodable PNG shares
    // its id — the anti-join keys on (id, modality)
    assert(q.exists(r => r._1.endsWith("11.wav") && r._2 == "undecodable"), s"$q")
  }

  test("media gate crash-replay: re-running a batch after its index appends is idempotent") {
    import spark.implicits._
    import graft.functions.Multimodal
    import graft.streaming.StreamingMediaIngest
    val idx = java.nio.file.Files.createTempDirectory("smir-idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("smir-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("smir-quar").toString
    def png(perturb: Int) = Multimodal.encodeGrayPng(18, 16,
      (x, y) => if (x == 0 && y == perturb) 255 else x * 10)
    // 5 and 6 share a fingerprint (intra pair); 7 is fresh
    val batch = Seq(
      ("f/5.png", png(1)), ("f/6.png", png(3)), ("f/7.png",
        Multimodal.encodeGrayPng(18, 16, (x, _) => 255 - x * 10)))
      .toDF("path", "content")
    def run() = StreamingMediaIngest.gate(batch, 0L, idx, verdicts, quar, 3, 4)
    def snap() = spark.read.parquet(verdicts)
      .select($"id", $"rep", $"kept").as[(Long, Long, Boolean)].collect().toSet
    run()
    val v1 = snap()
    assert(v1 == Set((5L, 5L, true), (6L, 5L, false), (7L, 7L, true)), s"$v1")
    run() // crash-replay: indexes already hold this batch's fingerprints
    assert(snap() == v1, "replayed verdicts must be bit-identical")
  }

  test("media cold start: seedBuckets sizes the first-batch-created index; later drains follow it") {
    import spark.implicits._
    import graft.functions.{IndexMeta, Multimodal}
    import graft.streaming.StreamingMediaIngest
    val rawDir = java.nio.file.Files.createTempDirectory("smis-raw").toString
    val idx = java.nio.file.Files.createTempDirectory("smis-idx").toString
    val verdicts = java.nio.file.Files.createTempDirectory("smis-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("smis-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("smis-ckpt").toString
    def png(perturb: Int) = Multimodal.encodeGrayPng(18, 16,
      (x, y) => if (x == 0 && y == perturb) 255 else x * 10)
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(rawDir, name), bytes)
    def drain(): Unit = StreamingMediaIngest.runAvailableNow(
      spark, rawDir, idx, verdicts, quar, ckpt, seedBuckets = 256)
    put("1.png", png(1))
    drain()
    // the drain CREATED idx/image — at the hinted count, recorded so
    // every later append/probe follows it (not the 64-bucket floor)
    assert(IndexMeta.read(spark, s"$idx/image") == 256,
      "cold-start index must record the seedBuckets hint")
    // a later drain must find the near-dup THROUGH the 256-bucket index
    // (a modulus disagreement would silently prune the match away)
    put("11.png", png(3)) // same fingerprint as 1 (perturb off-sample)
    drain()
    val v = spark.read.parquet(verdicts)
      .select($"id", $"rep", $"kept").as[(Long, Long, Boolean)].collect().toSet
    assert(v == Set((1L, 1L, true), (11L, 1L, false)), s"$v")
  }

  test("span-ingest gate crash-replay: replayed batch reproduces identical scrubs and curated set") {
    import spark.implicits._
    import graft.functions.TextOps
    import graft.streaming.StreamingSpanIngest
    val idx = java.nio.file.Files.createTempDirectory("ssi-idx").toString
    val curated = java.nio.file.Files.createTempDirectory("ssi-cur").toString
    val verdicts = java.nio.file.Files.createTempDirectory("ssi-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("ssi-quar").toString
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    TextOps.writeSpanIndex(
      Seq((1L, shared + " tail1 tail2")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val valid = Seq(
      (10L, shared + " fresh1 fresh2", "en", "s", 1L), // standing window cut
      (11L, (1 to 9).map(i => s"v$i").mkString(" "), "en", "s", 1L), // untouched
      (12L, (1 to 8).map(i => s"p$i").mkString(" ") + " x", "en", "s", 1L), // pair: keeps
      (13L, (1 to 8).map(i => s"p$i").mkString(" ") + " y", "en", "s", 1L)) // pair: cut
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noQuar = Seq.empty[String].toDF("_corrupt")
    def run() = StreamingSpanIngest.gate(
      valid, noQuar, 0L, idx, curated, verdicts, quar, 8)
    def snap() = (
      spark.read.parquet(verdicts)
        .select($"doc_id", $"text_scrubbed", $"n_kept", $"n_cut")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq,
      spark.read.parquet(curated).select($"doc_id").as[Long].collect().sorted.toSeq)
    run()
    val (v1, c1) = snap()
    assert(v1.map(r => r._1 -> r._4).toMap ==
      Map(10L -> 8L, 11L -> 0L, 12L -> 0L, 13L -> 8L), s"$v1")
    assert(v1.find(_._1 == 10L).get._2 == "fresh1 fresh2", s"$v1")
    assert(c1 == Seq(10L, 11L, 12L, 13L), s"all docs keep some tokens: $c1")
    run() // crash-replay: the index already holds this batch's windows
    val (v2, c2) = snap()
    assert(v2 == v1, s"replayed scrubs must be bit-identical:\n$v1\nvs\n$v2")
    assert(c2 == c1)
  }

  test("raw-ingest gate crash-replay: re-running a batch after its index append is idempotent") {
    import spark.implicits._
    // Simulates the at-least-once window: the micro-batch crashed AFTER
    // Dedup.appendHashIndex but BEFORE the checkpoint commit, so the
    // replayed batch probes an index that already holds its own kept
    // docs. The replay must reproduce bit-identical verdicts and the
    // same curated set — NOT flip kept to false and overwrite the
    // curated directory with an empty one (round-13 ADVICE, high).
    val idx = java.nio.file.Files.createTempDirectory("replay-idx").toString
    val curated = java.nio.file.Files.createTempDirectory("replay-cur").toString
    val verdicts = java.nio.file.Files.createTempDirectory("replay-verd").toString
    val quar = java.nio.file.Files.createTempDirectory("replay-quar").toString
    graft.functions.Dedup.writeHashIndex(
      Seq((1L, "standing text")).toDF("doc_id", "text"), "doc_id", "text", idx)
    val valid = Seq(
      (10L, "standing text", "en", "s", 13L),   // standing dup
      (11L, "batch original", "en", "s", 14L),  // kept
      (12L, "batch original", "en", "s", 14L),  // intra-batch dup of 11
      (13L, "fresh text", "en", "s", 10L))      // kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noQuar = Seq.empty[String].toDF("_corrupt")
    def run() = StreamingRawIngest.gate(valid, noQuar, 0L, idx, curated, verdicts, quar)
    def snap() = (
      spark.read.parquet(verdicts)
        .select($"doc_id", $"text_hash", $"rep", $"kept")
        .as[(Long, String, Long, Boolean)].collect().toSet,
      spark.read.parquet(curated).select($"doc_id").as[Long].collect().sorted.toSeq)
    run() // first (successful) run: verdicts + curated + index append
    val (v1, c1) = snap()
    assert(c1 == Seq(11L, 13L), s"first run keeps 11 and 13: $c1")
    run() // crash-replay: same batch id, index already grown by run 1
    val (v2, c2) = snap()
    assert(v2 == v1, s"replayed verdicts must be bit-identical:\n  $v1\n  vs\n  $v2")
    assert(c2 == c1, s"replayed curated set must survive: $c1 vs $c2")
  }
}
