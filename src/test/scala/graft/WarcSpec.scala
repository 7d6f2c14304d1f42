package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.ingest.Warc

/** WARC/WET container parsing: byte-level fixtures assembled from the
  * ISO 28500 grammar (version line, RFC-822 headers, Content-Length
  * payload, blank-line separators) — plain, per-record-gzip-member, and
  * truncated/garbage forms — plus the Spark binaryFile round-trip. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(warcType: String, uri: String, payload: Array[Byte],
      date: String = "2024-01-15T10:00:00Z",
      ctype: String = "text/plain"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"Content-Type: $ctype\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes)
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  private val infoRec = rec("warcinfo", "", "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8))
  private val conv1 = rec("conversion", "http://example.com/a", "Hello WARC world".getBytes(StandardCharsets.UTF_8))
  private val conv2 = rec("conversion", "http://example.com/b", "café 数据".getBytes(StandardCharsets.UTF_8))
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream(); parts.foreach(out.write); out.toByteArray
  }

  test("parse: plain archive — every record, headers, exact payload bytes") {
    val got = Warc.parse(cat(infoRec, conv1, conv2))
    assert(got.map(_.warcType) == Seq("warcinfo", "conversion", "conversion"))
    assert(got.map(_.recordIdx) == Seq(0, 1, 2))
    assert(got(1).targetUri == "http://example.com/a")
    assert(got(1).contentLength == 16L)
    assert(new String(got(1).payload, StandardCharsets.UTF_8) == "Hello WARC world")
    // non-ASCII payload length is BYTES (Content-Length is a byte count)
    assert(got(2).contentLength == "café 数据".getBytes(StandardCharsets.UTF_8).length.toLong)
    assert(new String(got(2).payload, StandardCharsets.UTF_8) == "café 数据")
    assert(got(0).warcDate == "2024-01-15T10:00:00Z")
    assert(got(0).contentType == "text/plain")
  }

  test("parse: multi-member gzip (one member per record group) chains transparently") {
    val gz = cat(gzipMember(cat(infoRec, conv1)), gzipMember(conv2))
    val got = Warc.parse(gz)
    assert(got.size == 3)
    assert(got.map(_.warcType) == Seq("warcinfo", "conversion", "conversion"))
    assert(new String(got(2).payload, StandardCharsets.UTF_8) == "café 数据")
  }

  test("parse: truncation and garbage are safe — prior records survive, no throw") {
    val whole = cat(infoRec, conv1)
    // cut mid-payload of the second record: only the first parses
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 12)
    assert(Warc.parse(cut).map(_.warcType) == Seq("warcinfo"))
    // cut mid-headers of the first record: nothing parses
    assert(Warc.parse(java.util.Arrays.copyOfRange(whole, 0, 30)).isEmpty)
    assert(Warc.parse("not a warc at all".getBytes).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
    // header continuation line folds into the previous field
    val folded = ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://e.com/x\r\n" +
      "Content-Type: text/plain;\r\n charset=utf-8\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val f = Warc.parse(folded)
    assert(f.size == 1 && f.head.contentType == "text/plain; charset=utf-8")
  }

  test("warcIngestStream: arriving segments parse incrementally and match the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warc_ckpt")
    java.nio.file.Files.write(dir.resolve("seg0.warc"), cat(infoRec, conv1))
    val q = Warc.warcIngestStream(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 2)
      // a segment landing later is picked up by the next microbatch
      java.nio.file.Files.write(dir.resolve("seg1.warc.gz"), gzipMember(conv2))
      q.processAllAvailable()
      val got = spark.table("warc_stream")
        .select($"warc_type", $"target_uri").as[(String, String)].collect().toSet
      val batch = Warc.readWarcRecords(spark, dir.toString)
        .select($"warc_type", $"target_uri").as[(String, String)].collect().toSet
      assert(got == batch && got.size == 3)
    } finally q.stop()
  }

  test("WET text feeds the corpus pipeline: quality gate -> exact dedup -> hash split compose") {
    import graft.ops.{Dedup, TextAnalytics}
    val good = ("the quick brown fox jumps over the lazy dog and then " +
      "the dog sleeps by the open door of the barn").getBytes(StandardCharsets.UTF_8)
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_pipe")
    java.nio.file.Files.write(dir.resolve("seg.warc"), cat(
      rec("conversion", "http://example.com/a", good),
      rec("conversion", "http://example.com/b", good), // exact dup content
      rec("conversion", "http://example.com/c", "zxq".getBytes))) // fails the gate
    val wet = Warc.wetDocuments(Warc.readWarcRecords(spark, dir.toString))
    val gated = TextAnalytics.qualityFilter(wet, "text")
      .filter(org.apache.spark.sql.functions.col("passes_quality"))
    val deduped = Dedup.exact(gated, "url", "text")
    val out = TextAnalytics.hashSplit(deduped, "url")
      .select($"url", $"split").as[(String, String)].collect()
    // dup collapses to the lexicographically-smaller url, junk gated out
    assert(out.length == 1)
    assert(out.head._1 == "http://example.com/a")
    assert(Set("train", "val", "test").contains(out.head._2))
  }

  test("readWarcRecords + wetDocuments: binaryFile scan explodes records in-task; WET text decodes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    java.nio.file.Files.write(dir.resolve("seg0.warc"), cat(infoRec, conv1))
    java.nio.file.Files.write(dir.resolve("seg1.warc.gz"),
      cat(gzipMember(conv2), gzipMember(conv1)))
    val records = Warc.readWarcRecords(spark, dir.toString)
    assert(records.count() == 4)
    val wet = Warc.wetDocuments(records)
      .select($"url", $"text").as[(String, String)].collect().sorted
    assert(wet.count(_._1 == "http://example.com/a") == 2)
    assert(wet.exists(_ == ("http://example.com/b", "café 数据")))
    assert(wet.forall(_._2.nonEmpty) && wet.length == 3)
  }
}
