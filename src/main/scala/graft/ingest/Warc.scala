package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET container parsing (ISO 28500 — the Common Crawl delivery
  * format): the web-scale ingest front end. The reference ingests only
  * local office/document files (document_processor.py loader table);
  * a 100 TB training-data pipeline starts from crawl archives, so this
  * is a scale extension in the same family as the repo's PDF/OLE2
  * readers — pure JVM, no dependencies, truncation-safe (a malformed
  * or cut-off tail yields the records parsed so far, never an
  * exception — same discipline as [[Ole2]]).
  *
  * Scale shape: the FILE is the unit of parallelism — a `binaryFile`
  * scan gives one task per archive, and Common Crawl ships segments as
  * ~1 GB gzipped files in the tens of thousands per crawl, so task
  * parallelism comes from file count (gzip members are not
  * range-splittable; every production WARC pipeline partitions this
  * way). Records explode INSIDE the task via flatMap — the driver
  * never sees payload bytes.
  */
object Warc {

  /** One WARC record: envelope headers + raw payload bytes. */
  final case class WarcRecord(
      recordIdx: Int,
      warcType: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      payload: Array[Byte])

  /** Hard cap on decompressed archive size: a JVM byte[] tops out at
    * ~Int.MaxValue, so one task can never hold more than ~2 GiB of
    * inflated WARC anyway — inflation stops at the cap and the parse
    * keeps the records recovered so far (same truncation-safe contract
    * as a cut-off tail). Common Crawl segments inflate to ~4–5 GB, so
    * archives SHOULD be split below ~500 MB compressed per file; the
    * file-per-task scan makes smaller-file layouts strictly better for
    * parallelism too. */
  val MaxInflatedBytes: Int = Int.MaxValue - 8

  /** Decompress a (possibly multi-member) gzip stream. Common Crawl
    * writes one member PER RECORD, concatenated; `GZIPInputStream`
    * chains members natively, so whole-file decompression recovers the
    * full record sequence. Non-gzip input is returned as-is; a corrupt
    * stream yields the bytes inflated before the fault, and output is
    * clamped to [[MaxInflatedBytes]] (truncation-safe contract — the
    * sizing hint is computed in Long arithmetic so a multi-hundred-MB
    * archive cannot overflow it to a negative allocation). */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes
    val sizeHint = math.min(math.max(64L, bytes.length.toLong * 4L),
      MaxInflatedBytes.toLong).toInt
    var out: ByteArrayOutputStream = null
    try {
      out = new ByteArrayOutputStream(sizeHint)
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n > 0) {
        val room = MaxInflatedBytes - out.size()
        val take = math.min(n, room)
        if (take > 0) out.write(buf, 0, take)
        n = if (take < n) -1 else in.read(buf) // cap reached — stop inflating
      }
    } catch { case _: java.io.IOException => () }
    if (out == null) bytes else out.toByteArray
  }

  /** Next line as (text-without-EOL, position-after-EOL); accepts CRLF
    * (spec) and bare LF (tolerance). None at end-of-buffer. */
  private def readLine(bytes: Array[Byte], pos: Int): Option[(String, Int)] = {
    if (pos >= bytes.length) return None
    var i = pos
    while (i < bytes.length && bytes(i) != '\n') i += 1
    if (i >= bytes.length) return None // no EOL — truncated header line
    val end = if (i > pos && bytes(i - 1) == '\r') i - 1 else i
    Some((new String(bytes, pos, end - pos, StandardCharsets.UTF_8), i + 1))
  }

  /** Parse a WARC/WET archive (gzipped or plain) into its records.
    * Header block per record: a `WARC/x.y` version line, `Name: value`
    * fields (continuation lines folded per RFC 822), a blank line, then
    * exactly Content-Length payload bytes and a blank-line separator.
    * Anything that breaks the grammar — missing version line, absent or
    * unparsable Content-Length, payload running past the buffer — ends
    * the parse with the records accumulated so far. */
  def parse(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = gunzip(raw)
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip blank separator lines between records
      var skipping = true
      while (skipping) {
        readLine(bytes, pos) match {
          case Some(("", next)) => pos = next
          case _ => skipping = false
        }
      }
      if (pos >= bytes.length) ok = false
      else readLine(bytes, pos) match {
        case Some((version, afterVersion)) if version.startsWith("WARC/") =>
          var p = afterVersion
          val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
          var lastKey: String = null
          var inHeaders = true
          while (inHeaders) {
            readLine(bytes, p) match {
              case Some(("", next)) => p = next; inHeaders = false
              case Some((line, next)) =>
                p = next
                if ((line.startsWith(" ") || line.startsWith("\t")) && lastKey != null)
                  headers(lastKey) = headers(lastKey) + " " + line.trim
                else {
                  val colon = line.indexOf(':')
                  if (colon > 0) {
                    lastKey = line.substring(0, colon).trim.toLowerCase
                    headers(lastKey) = line.substring(colon + 1).trim
                  }
                }
              case None => inHeaders = false; ok = false // truncated headers
            }
          }
          if (ok) {
            val len = headers.get("content-length").flatMap(v =>
              try Some(v.toLong) catch { case _: NumberFormatException => None })
            len match {
              case Some(n) if n >= 0 && p + n <= bytes.length =>
                out += WarcRecord(idx,
                  headers.getOrElse("warc-type", ""),
                  headers.getOrElse("warc-target-uri", ""),
                  headers.getOrElse("warc-date", ""),
                  headers.getOrElse("content-type", ""),
                  n,
                  java.util.Arrays.copyOfRange(bytes, p, (p + n).toInt))
                idx += 1
                pos = (p + n).toInt
              case _ => ok = false // no/invalid length, or payload truncated
            }
          }
        case _ => ok = false // not a WARC version line — stop, keep prior records
      }
    }
    out.result()
  }

  /** The fixed schema of Spark's `binaryFile` source (needed explicitly
    * by the streaming reader, which cannot infer). */
  val binaryFileSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
  }

  private val recordColumns = Seq("path", "record_idx", "warc_type",
    "target_uri", "warc_date", "content_type", "content_length", "payload")

  private def recordTuples(p: String, bytes: Array[Byte]) =
    parse(bytes).map(r => (p, r.recordIdx, r.warcType, r.targetUri,
      r.warcDate, r.contentType, r.contentLength, r.payload))

  /** `binaryFile` scan of `.warc` / `.warc.gz` / `.wet` / `.wet.gz`
    * archives → one row per record. Records are exploded inside the
    * scan task (flatMap over file bytes); columns:
    * path, record_idx, warc_type, target_uri, warc_date, content_type,
    * content_length, payload(binary). */
  def readWarcRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap((recordTuples _).tupled)
      .toDF(recordColumns: _*)
  }

  /** Streaming twin of [[readWarcRecords]]: watch a directory for
    * arriving crawl segments (the shape of a continuously-delivered
    * crawl — Common Crawl publishes segment lists incrementally).
    * Stateless flatMap over the file-source stream, so it composes
    * with the downstream streaming pipeline ([[Warc.wetDocuments]] →
    * quality gate → dedup → decontaminate) with no extra state. */
  def warcIngestStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(binaryFileSchema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap((recordTuples _).tupled)
      .toDF(recordColumns: _*)
  }

  /** WET view: `conversion` records (the pre-extracted plain-text form
    * Common Crawl distributes) decoded as UTF-8 — (url, fetch_date,
    * n_bytes, text). Feeds directly into the corpus pipeline
    * (quality gate → dedup → decontaminate → split). */
  def wetDocuments(records: DataFrame): DataFrame =
    records.filter(col("warc_type") === "conversion")
      .select(col("target_uri").as("url"), col("warc_date").as("fetch_date"),
        col("content_length").as("n_bytes"),
        decode(col("payload"), "UTF-8").as("text"))
}
