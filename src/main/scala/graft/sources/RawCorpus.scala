package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingest: the two public formats a curation pipeline starts
  * from before any operator in this engine runs — JSON-lines document
  * dumps and WARC web archives (ISO 28500, the CommonCrawl format).
  *
  * Scale shapes:
  *  - **JSONL** is line-splittable: the built-in JSON datasource plans
  *    one task per split at any file size, schema-explicit (inference
  *    is a full extra pass — see [[EventLog]]), corrupt lines routed to
  *    a quarantine column, never an exception.
  *  - **WARC** ships as a gzip stream of per-record members — NOT
  *    splittable, by design: the public distribution (CommonCrawl)
  *    bounds files at ~1 GiB so file-per-task IS the parallelism unit.
  *    `binaryFile` gives one task per file; the member walk is a
  *    per-partition JVM loop (multi-step stateful parse — the
  *    [[graft.functions.MediaDecoder]] rationale). A corrupt member
  *    DECLINES the file's remainder (records before it are kept) rather
  *    than failing the task: one damaged archive must not kill a
  *    10^5-file ingest.
  */
object RawCorpus {

  /** The canonical documents-table shape (+ quarantine column). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** Read JSON-lines documents, schema-explicit. Corrupt lines carry the
    * raw line in `_corrupt` (split with [[partitionValid]]).
    */
  def readJsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** (valid, quarantine) split of a [[readJsonlDocs]] frame — the
    * [[EventLog.partitionValid]] contract: the split is total, and a
    * structurally-parsed row missing its key is quarantined, not
    * silently ingested.
    */
  def partitionValid(df: DataFrame): (DataFrame, DataFrame) =
    validSplit(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The [[partitionValid]] split WITHOUT the persist — for callers that
    * manage caching themselves (the streaming ingest job persists the
    * parsed batch and must be able to unpersist it per micro-batch).
    */
  def validSplit(parsed: DataFrame): (DataFrame, DataFrame) = {
    val valid = col("_corrupt").isNull && col("doc_id").isNotNull
    (parsed.where(valid).drop("_corrupt"),
      parsed.where(!valid)
        .select(coalesce(col("_corrupt"),
          to_json(struct(parsed.columns.filter(_ != "_corrupt").toIndexedSeq
            .map(col): _*))).as("_corrupt")))
  }

  /** One parsed WARC record: version, named headers (original case
    * preserved in `headers`, lookups case-insensitive), raw body bytes.
    */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      headers: Map[String, String],
      body: Array[Byte])

  /** Parse a whole WARC file held in memory (the `binaryFile` unit),
    * gzip-transparent: java's GZIPInputStream walks concatenated
    * members natively, so record-per-member and whole-file-gzip layouts
    * both decode. Returns (records-before-first-damage, cleanEof):
    * `cleanEof = false` means a corrupt member/record truncated the walk
    * — decline semantics, never a throw.
    */
  def parseWarc(bytes: Array[Byte], gzipped: Boolean): (Seq[WarcRecord], Boolean) = {
    val out = Seq.newBuilder[WarcRecord]
    var clean = true
    try {
      // 64 KiB inflater buffer (the 512 B default costs real time over a
      // million-member archive), and member walking stays transparent
      val in: InputStream =
        if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
        else new ByteArrayInputStream(bytes)
      val buf = new java.io.BufferedInputStream(in, 1 << 16)
      var more = true
      while (more) {
        readRecord(buf) match {
          case Some(r) => out += r
          case None    => more = false
        }
      }
    } catch {
      // damaged gzip member / truncated record / malformed header:
      // keep what parsed, flag the file
      case _: java.io.IOException   => clean = false
      case _: NumberFormatException => clean = false
    }
    (out.result(), clean)
  }

  /** Read one record at the stream position: version line, header block
    * to the empty line, Content-Length body bytes, trailing CRLFCRLF.
    * None at clean EOF; throws on structural damage (caught above).
    */
  private def readRecord(in: InputStream): Option[WarcRecord] = {
    var line = readLine(in)
    // tolerate extra blank separators between records
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case None => None
      case Some(v) if v.startsWith("WARC/") =>
        val hdrs = Map.newBuilder[String, String]
        var h = readLine(in).getOrElse(throw new EOFException("header block truncated"))
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) throw new java.io.IOException(s"malformed WARC header: $h")
          hdrs += h.substring(0, i).trim -> h.substring(i + 1).trim
          h = readLine(in).getOrElse(throw new EOFException("header block truncated"))
        }
        val m = hdrs.result()
        def get(k: String) = m.collectFirst { case (n, v2) if n.equalsIgnoreCase(k) => v2 }
        val len = get("Content-Length")
          .getOrElse(throw new java.io.IOException("missing Content-Length")).toLong
        // cap guards the allocation, not just the int range: a corrupt
        // length must decline without first reserving gigabytes
        if (len < 0 || len > (256L << 20)) throw new java.io.IOException(s"bad Content-Length $len")
        val body = new Array[Byte](len.toInt)
        var off = 0
        while (off < body.length) {
          val n = in.read(body, off, body.length - off)
          if (n < 0) throw new EOFException("body truncated")
          off += n
        }
        Some(WarcRecord(
          get("WARC-Type").getOrElse(""),
          get("WARC-Record-ID").getOrElse(""),
          get("WARC-Target-URI").getOrElse(""),
          m, body))
      case Some(other) => throw new java.io.IOException(s"expected WARC/ version line, got: $other")
    }
  }

  /** Read a CRLF- (or bare-LF-) terminated ASCII/UTF-8 header line;
    * None at EOF before any byte.
    */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.write(c)
      c = in.read()
    }
    Some(new String(sb.toByteArray, UTF_8))
  }

  /** Distributed WARC read: one `binaryFile` task per archive (gzip is
    * not splittable; the public corpus bounds file size instead), each
    * walking its members in one pass. Emits (path, warc_type, record_id,
    * target_uri, headers, body, clean_eof) — `clean_eof=false` rows mark
    * damaged archives for requeue without failing the job.
    */
  def readWarc(
      spark: SparkSession, path: String, httpPayloadOnly: Boolean = true): DataFrame =
    parseWarcFrame(spark.read.format("binaryFile").load(path), httpPayloadOnly)

  /** The [[readWarc]] member walk applied to an already-loaded
    * `binaryFile` frame (batch or STREAMING micro-batch — the archive
    * parse is source-agnostic; only the file listing differs).
    */
  def parseWarcFrame(files: DataFrame, httpPayloadOnly: Boolean = true): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val (recs, clean) = parseWarc(bytes, gzipped = p.endsWith(".gz"))
        val rows = recs.map { r =>
          val body = if (httpPayloadOnly) httpPayload(r.body) else r.body
          (p, r.warcType, r.recordId, r.targetUri, r.headers, body, clean)
        }
        // a file so damaged that NOTHING parsed must still surface in the
        // output (one null marker row), or the requeue scan can't see it
        if (rows.isEmpty && !clean)
          Seq((p, null: String, null: String, null: String,
            null: Map[String, String], null: Array[Byte], false))
        else rows
      }
      .toDF("path", "warc_type", "record_id", "target_uri", "headers", "body", "clean_eof")
  }

  /** Split an HTTP message body out of a WARC `response` record payload:
    * real web archives (CommonCrawl) store the full HTTP response —
    * status line + headers + CRLFCRLF + entity body — as the record
    * body (`Content-Type: application/http`). Returns the entity bytes,
    * or the input unchanged when no HTTP envelope is present (the
    * graft-internal fixture layout). Pure function, used per-row inside
    * the ingest map.
    */
  def httpPayload(body: Array[Byte]): Array[Byte] = {
    def startsWithAscii(p: String): Boolean =
      body.length >= p.length && p.indices.forall(i => body(i) == p.charAt(i).toByte)
    if (!startsWithAscii("HTTP/")) return body
    var i = 0
    while (i + 3 < body.length) {
      if (body(i) == '\r' && body(i + 1) == '\n' && body(i + 2) == '\r' && body(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(body, i + 4, body.length)
      i += 1
    }
    body // malformed envelope: surface the raw bytes rather than dropping
  }

  /** Project parsed WARC response records onto the documents-table shape
    * using the graft ingest conventions (doc id from the target URI's
    * last path segment, metadata from X-Graft-* headers, text = UTF-8
    * body).
    */
  def warcDocs(warc: DataFrame): DataFrame =
    warc.where(col("warc_type") === "response")
      .select(
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        col("body").cast("string").as("text"),
        element_at(col("headers"), "X-Graft-Lang").as("lang"),
        element_at(col("headers"), "X-Graft-Source").as("source"),
        element_at(col("headers"), "X-Graft-NChars").cast("long").as("n_chars"))
}
