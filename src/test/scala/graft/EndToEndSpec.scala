package graft

import graft.embed.DeterministicEmbedder
import graft.ingest.DocumentIngest
import graft.search.{Citations, SearchOptions, VectorSearch}
import graft.store.VectorStore
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Golden end-to-end: corpus files → build database → search with the
  * full post-filter chain (SURVEY.md §5.2 #4; pipeline of §3.3 + §3.1). */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpusDir: Path = {
    val dir = Files.createTempDirectory("graft-corpus")
    def w(name: String, content: String): Unit =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    w("a.txt", "alpha bravo charlie delta echo foxtrot golf hotel india juliet")
    w("b.txt", "kilo lima mike november oscar papa quebec romeo sierra tango")
    w("dup_of_a.txt", "alpha bravo charlie delta echo foxtrot golf hotel india juliet")
    w("c.html", "<html><head><style>p{}</style></head><body><p>uniform &amp; victor</p></body></html>")
    w("d.pages.json", """{"pages": ["whiskey xray yankee", "", "zulu alpha"]}""")
    // a REAL binary PDF: two pages, Flate + raw content streams
    Files.write(dir.resolve("e.pdf"), PdfFixture.mkPdf(
      (PdfFixture.pageSource("golf echo november"), true),
      (PdfFixture.pageSource("oscar kilo"), false)))
    w("skip.bin", "binary noise")
    dir
  }

  private lazy val dbDir: Path = Files.createTempDirectory("graft-db")
  private lazy val embedder = DeterministicEmbedder(dim = 16)
  private lazy val manifest =
    VectorStore.create(spark, dbDir.toString, corpusDir.toString, embedder,
      chunkSize = 30, chunkOverlap = 10)

  test("ingest: scans supported formats only, extracts text + metadata") {
    val docs = DocumentIngest.loadDocuments(spark, corpusDir.toString)
    val names = docs.select("file_name").as[String].collect().toSet
    assert(names == Set("a.txt", "b.txt", "dup_of_a.txt", "c.html", "d.pages.json", "e.pdf"))
    val html = docs.filter($"file_name" === "c.html").select("page_content").as[String].head()
    assert(html == "uniform & victor")
    val pdf = docs.filter($"file_name" === "d.pages.json")
      .select("page_content", "file_type").as[(String, String)].head()
    assert(pdf._1 == "[[page1]]whiskey xray yankee[[page3]]zulu alpha")
    assert(pdf._2 == ".pdf")
    // the real binary PDF parses to the same marked-page form
    val realPdf = docs.filter($"file_name" === "e.pdf")
      .select("page_content", "file_type").as[(String, String)].head()
    assert(realPdf._1 == "[[page1]]golf echo november[[page2]]oscar kilo")
    assert(realPdf._2 == ".pdf")
    // identical content -> identical hash (dedup natural key)
    val hashes = docs.filter($"file_name".isin("a.txt", "dup_of_a.txt"))
      .select("hash").as[String].collect()
    assert(hashes.toSet.size == 1)
  }

  test("build: three tables + manifest written, chunks carry vectors") {
    assert(manifest.dimensions == 16 && manifest.distanceMetric == "cosine")
    val chunks = VectorStore.chunks(spark, dbDir.toString)
    assert(chunks.count() > 0)
    assert(chunks.filter(size($"vector") =!= 16).count() == 0)
    // PDF chunks carry page numbers; others null
    val pdfPages = chunks.filter($"file_type" === ".pdf").select("page_number")
      .as[Option[Int]].collect()
    assert(pdfPages.nonEmpty && pdfPages.forall(_.isDefined))
    val docs = VectorStore.documents(spark, dbDir.toString)
    assert(docs.count() == 6) // one row per FILE, duplicates included (sqlite_operations.py:12-20)
    assert(docs.select("id").distinct().count() == 6) // ids unique even for identical content
    // byte-identical files share chunks: no duplicate chunk rows
    assert(chunks.select("id").distinct().count() == chunks.count())
    assert(VectorStore.chunkDocMap(spark, dbDir.toString).count() == chunks.count())
  }

  test("catalog: listDocuments shows BOTH paths of byte-identical files (S11)") {
    manifest // force build
    val names = VectorStore.listDocuments(spark, dbDir.toString)
      .select("file_name").as[String].collect().toSet
    assert(names.contains("a.txt") && names.contains("dup_of_a.txt"))
  }

  test("catalog: listDatabases lists every child db with its params (J3)") {
    val root = Files.createTempDirectory("graft-dbs")
    VectorStore.writeManifest(root.resolve("db_a").toString,
      graft.model.DbManifest("cosine", 16, "float32", "det", 100, 20))
    VectorStore.writeManifest(root.resolve("db_b").toString,
      graft.model.DbManifest("l2", 32, "float32", "onnx", 400, 0))
    Files.createDirectory(root.resolve("not_a_db")) // no manifest → skipped
    val rows = VectorStore.listDatabases(spark, root.toString).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("db_a", "db_b"))
    val b = rows.find(_.getString(0) == "db_b").get
    assert(b.getAs[String]("distance_metric") == "l2")
    assert(b.getAs[Int]("dimensions") == 32)
    assert(b.getAs[Int]("chunk_size") == 400)
    assert(VectorStore.listDatabases(spark, root.resolve("missing").toString).count() == 0)
  }

  test("catalog registry: managed create -> list -> drop round-trip (S10/S12)") {
    val root = Files.createTempDirectory("graft-catalog")
    // managed create builds at root/name AND records it in registry.json
    val m = VectorStore.createIn(spark, root.toString, "reg_db", corpusDir.toString,
      embedder, chunkSize = 30, chunkOverlap = 10)
    assert(Files.exists(VectorStore.registryPath(root.toString)))
    assert(VectorStore.readRegistry(root.toString) == Map("reg_db" -> m))
    // a second db: the registry upserts, listing comes FROM the registry
    VectorStore.registerDatabase(root.toString, "other_db",
      graft.model.DbManifest("l2", 32, "float32", "onnx", 400, 0))
    val rows = VectorStore.listDatabases(spark, root.toString).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("other_db", "reg_db"))
    assert(rows.find(_.getString(0) == "reg_db").get.getAs[Int]("chunk_size") == 30)
    // invalid names are rejected before anything is written
    intercept[IllegalArgumentException] {
      VectorStore.createIn(spark, root.toString, "NO", corpusDir.toString, embedder)
    }
    // managed drop removes the directory and the registry entry
    VectorStore.dropIn(root.toString, "reg_db")
    assert(!Files.exists(root.resolve("reg_db")))
    assert(VectorStore.readRegistry(root.toString) == Map(
      "other_db" -> graft.model.DbManifest("l2", 32, "float32", "onnx", 400, 0)))
    assert(VectorStore.listDatabases(spark, root.toString)
      .collect().map(_.getString(0)).toSeq == Seq("other_db"))
  }

  test("search: finds the right document, respects k and ordering") {
    val hits = VectorSearch.search(spark, dbDir.toString, "alpha bravo charlie delta echo",
      embedder, SearchOptions(k = 3, scoreThreshold = 0.0))
    val rows = hits.select($"file_name", $"distance").collect()
    assert(rows.length <= 3)
    val ds = rows.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted) // ascending distance order (O5)
  }

  test("contexts.txt + metadata.txt dumps in rank order (chat_llm parity)") {
    manifest // force build
    val hits = VectorSearch.search(spark, dbDir.toString, "alpha bravo charlie delta echo",
      embedder, SearchOptions(k = 3, scoreThreshold = 0.0))
    val outDir = Files.createTempDirectory("graft-ctx")
    VectorSearch.dumpContexts(hits, outDir.toString)
    val ctx = new String(Files.readAllBytes(outDir.resolve("contexts.txt")), StandardCharsets.UTF_8)
    val meta = new String(Files.readAllBytes(outDir.resolve("metadata.txt")), StandardCharsets.UTF_8)
    val n = hits.count().toInt
    // every context followed by the rule; one metadata JSON line per hit
    assert(ctx.split(java.util.regex.Pattern.quote("\n\n---\n\n"), -1).length == n + 1)
    assert(meta.linesIterator.size == n)
    assert(meta.linesIterator.forall(_.contains("\"file_name\"")))
    // order matches the search result's rank order
    val firstText = hits.orderBy($"distance".asc, $"id".asc)
      .select($"text").as[String].head()
    assert(ctx.startsWith(firstText))
  }

  test("quantized sidecar: tinyint codes + two-stage search equals exact") {
    manifest // force build
    VectorStore.writeQuantized(spark, dbDir.toString)
    val q = spark.read.parquet(s"$dbDir/chunks_q")
    assert(q.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false) ||
      q.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, containsNull = true))
    assert(q.count() == VectorStore.chunks(spark, dbDir.toString).count())
    val (mins, maxs) = VectorStore.readQuantStats(dbDir.toString)
    assert(mins.length == 16 && maxs.length == 16)
    // candidates >= corpus: the two-stage result equals the exact search
    val qv = embedder.embedQuery(spark, "alpha bravo charlie delta echo")
    val exact = VectorSearch.search(spark, dbDir.toString, "alpha bravo charlie delta echo",
      embedder, SearchOptions(k = 4, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    val quant = VectorStore.searchQuantized(spark, dbDir.toString, qv,
      SearchOptions(k = 4, scoreThreshold = 0.0), candidates = 1000)
      .select("id").as[Long].collect().toSeq
    assert(quant == exact)
  }

  test("binary sidecar: packed sign codes + two-stage search equals exact") {
    manifest // force build
    VectorStore.writeBinary(spark, dbDir.toString)
    val b = spark.read.parquet(s"$dbDir/chunks_b")
    // 16 dims pack into one long per row
    assert(b.schema("bvec").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.LongType)
    assert(b.select(org.apache.spark.sql.functions.size($"bvec")).distinct()
      .as[Int].collect().toSeq == Seq(1))
    assert(b.count() == VectorStore.chunks(spark, dbDir.toString).count())
    // candidates >= corpus: the two-stage result equals the exact search
    val qv = embedder.embedQuery(spark, "alpha bravo charlie delta echo")
    val exact = VectorSearch.search(spark, dbDir.toString, "alpha bravo charlie delta echo",
      embedder, SearchOptions(k = 4, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    val bin = VectorStore.searchBinary(spark, dbDir.toString, qv,
      SearchOptions(k = 4, scoreThreshold = 0.0), candidates = 1000)
      .select("id").as[Long].collect().toSeq
    assert(bin == exact)
  }

  test("upsertChunks maintains every sidecar: in-envelope merge keeps stored codes; out-of-envelope rebuilds") {
    val rnd = new scala.util.Random(19)
    val dir = Files.createTempDirectory("graft_upsert_db").toString
    def mkChunks(ids: Seq[Long], scale: Float) = ids.map { i =>
      (i, s"text $i", Array.fill(8)(rnd.nextFloat() * 2 * scale - scale),
        s"/f$i.txt", ".txt", s"f$i.txt", "2026-01-01", "2026-01-01", s"h$i",
        "document", Option.empty[Int])
    }.toDF("id", "text", "vector", "file_path", "file_type", "file_name",
      "creation_date", "modification_date", "hash", "document_type", "page_number")
    mkChunks(1L to 60L, 1.0f).write.parquet(s"$dir/chunks")
    VectorStore.writeManifest(dir,
      graft.model.DbManifest("cosine", 8, "float32", "det", 60, 0))
    VectorStore.writeQuantized(spark, dir)
    VectorStore.writeBinary(spark, dir)
    VectorStore.writeIvfPq(spark, dir, kCoarse = 4, m = 4, ksub = 16,
      coarseIters = 2, pqIters = 1)
    val statsBefore = VectorStore.readQuantStats(dir)
    val mergedQBefore = spark.read.parquet(s"$dir/chunks_q")
      .filter(!$"id".isin(5L, 6L, 101L, 102L))
      .orderBy("id").collect().toSeq

    // replace 2 rows + insert 2, all vectors INSIDE the stored quant
    // envelope (scale 0.5 < 1.0) → merge path, stats untouched
    VectorStore.upsertChunks(spark, dir,
      mkChunks(Seq(5L, 6L, 101L, 102L), 0.5f))
    val ch = VectorStore.chunks(spark, dir)
    assert(ch.count() == 62 && ch.select("id").distinct().count() == 62)
    assert(spark.read.parquet(s"$dir/chunks_q").count() == 62)
    assert(spark.read.parquet(s"$dir/chunks_b").count() == 62)
    assert(VectorStore.readQuantStats(dir)._1.toSeq == statsBefore._1.toSeq,
      "in-envelope upsert must not rewrite quant stats")

    // merge semantics: untouched ids keep their exact stored codes
    // (no re-encode — a rebuild might TIGHTEN stats if a replaced row
    // defined the old envelope; the merge keeps the stored envelope,
    // which stays valid for every code in the sidecar)
    val beforeCodes = mergedQBefore
    val afterCodes = spark.read.parquet(s"$dir/chunks_q")
      .filter(!$"id".isin(5L, 6L, 101L, 102L))
      .orderBy("id").collect().toSeq
    assert(afterCodes == beforeCodes)

    // every sidecar search (full pool) == exact search over the
    // UPDATED chunks — stale candidates would break this
    val qv = Array.fill(8)(0.25f)
    val exact = VectorSearch.searchChunks(ch, qv, "cosine",
        SearchOptions(k = 5, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSeq
    assert(ids(VectorStore.searchQuantized(spark, dir, qv,
      SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 100)) == exact)
    assert(ids(VectorStore.searchBinary(spark, dir, qv,
      SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 100)) == exact)
    assert(ids(VectorStore.searchIvfPq(spark, dir, qv,
      SearchOptions(k = 5, scoreThreshold = 0.0), nProbe = 4,
      candidates = 100)) == exact)

    // out-of-envelope batch (scale 3 > stored max) → the quant sidecar
    // must REBUILD (stats change) and search equality must still hold
    VectorStore.upsertChunks(spark, dir, mkChunks(Seq(103L), 3.0f))
    assert(VectorStore.readQuantStats(dir)._2.toSeq != statsBefore._2.toSeq,
      "out-of-envelope upsert must rebuild quant stats")
    val ch2 = VectorStore.chunks(spark, dir)
    val exact2 = VectorSearch.searchChunks(ch2, qv, "cosine",
        SearchOptions(k = 5, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    assert(ids(VectorStore.searchQuantized(spark, dir, qv,
      SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 100)) == exact2)
    assert(ids(VectorStore.searchIvfPq(spark, dir, qv,
      SearchOptions(k = 5, scoreThreshold = 0.0), nProbe = 4,
      candidates = 100)) == exact2)
  }

  test("search: keyword + doc-type post-filters, no backfill below k") {
    val all = VectorSearch.search(spark, dbDir.toString, "anything",
      embedder, SearchOptions(k = 100, scoreThreshold = 0.0))
    val withTerm = VectorSearch.search(spark, dbDir.toString, "anything",
      embedder, SearchOptions(k = 100, scoreThreshold = 0.0, searchTerm = "ZULU"))
    // case-insensitive containment (vector_db_query.py:247-254)
    assert(withTerm.select("text").as[String].collect().forall(_.toLowerCase.contains("zulu")))
    assert(withTerm.count() < all.count())
    val typed = VectorSearch.search(spark, dbDir.toString, "anything",
      embedder, SearchOptions(k = 100, scoreThreshold = 0.0, documentTypes = "image"))
    assert(typed.count() == 0) // everything is "document"; no backfill
  }

  test("threshold filter can shrink results below k without backfill") {
    val strict = VectorSearch.search(spark, dbDir.toString, "alpha bravo",
      embedder, SearchOptions(k = 10, scoreThreshold = 0.999999))
    assert(strict.count() <= 10)
  }

  test("citations: grouped by file, ordered by min score, page ranges") {
    val hits = VectorSearch.search(spark, dbDir.toString, "zulu whiskey",
      embedder, SearchOptions(k = 20, scoreThreshold = 0.0))
    val cites = Citations.aggregate(hits).collect()
    assert(cites.nonEmpty)
    val minScores = cites.map(_.getAs[Double]("min_score")).toSeq
    assert(minScores == minScores.sorted)
  }

  test("db-name validation: regex, length, null-literal rules (P8)") {
    import graft.store.VectorStore.validateDbName
    assert(validateDbName("my_db-1").isEmpty)
    assert(validateDbName("ab").isDefined)        // too short
    assert(validateDbName("Has Upper").isDefined) // charset
    assert(validateDbName("null").isDefined)
    assert(validateDbName(null).isDefined)
  }

  test("backup + restore round-trips a database (S13)") {
    import graft.store.VectorStore
    val db = java.nio.file.Files.createTempDirectory("graft_bak_db").toString
    val bak = java.nio.file.Files.createTempDirectory("graft_bak_dst").toString + "/copy"
    VectorStore.writeManifest(db, graft.model.DbManifest("cosine", 8, "float32", "det", 100, 0))
    spark.range(5).toDF("id").write.parquet(s"$db/chunks")
    VectorStore.backup(db, bak)
    VectorStore.drop(db)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(db)))
    VectorStore.restore(bak, db)
    assert(VectorStore.readManifest(db).dimensions == 8)
    assert(spark.read.parquet(s"$db/chunks").count() == 5)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("deterministic embedder is partitioning-invariant") {
    val df1 = Seq("hello world").toDF("text").repartition(1)
    val df4 = Seq("hello world").toDF("text").repartition(4)
    val v1 = embedder.embed(df1, "text").select("vector").as[Seq[Float]].head()
    val v4 = embedder.embed(df4, "text").select("vector").as[Seq[Float]].head()
    assert(v1 == v4)
    assert(math.abs(v1.map(x => x.toDouble * x).sum - 1.0) < 1e-5) // unit norm
  }

  test("shard export: JSONL round-trip, one file per shard, manifest matches") {
    import graft.store.ShardExport
    val out = Files.createTempDirectory("graft-shards").toString
    val docs = (0L until 100L).map(i => (i, s"doc body $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source").repartition(7)
    val manifest = ShardExport.writeJsonlShards(docs, "doc_id", out, numShards = 4)
      .orderBy("shard").collect()
    // manifest covers every row exactly once across 4 shards
    assert(manifest.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(manifest.map(_.getLong(1)).sum == 100L)
    // exactly one data file per shard directory (single-task-per-shard
    // write; the shard is then an atomic unit for a dataloader)
    for (s <- 0 until 4) {
      val files = new java.io.File(s"$out/shard=$s").listFiles()
        .filter(f => f.getName.startsWith("part-")).toSeq
      assert(files.size == 1, s"shard $s has ${files.size} files")
    }
    // round-trip: contents identical, shard column = portable hash mod 4
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType)))
    val back = ShardExport.readJsonlShards(spark, out, schema)
    assert(back.count() == 100L)
    val expectShard = graft.ops.TextAnalytics.portableIdHash(col("doc_id"))
    assert(back.filter(pmod(expectShard, lit(4)) =!= col("shard")).count() == 0)
    assert(back.select("doc_id", "text", "source").except(
      docs.select("doc_id", "text", "source")).count() == 0)
    // re-export determinism: manifest identical
    val out2 = Files.createTempDirectory("graft-shards2").toString
    val m2 = ShardExport.writeJsonlShards(docs.repartition(3), "doc_id", out2, 4)
      .orderBy("shard").collect()
    assert(m2.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      manifest.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
    // size-targeted: shard count derived from total serialized chars
    val totalChars = manifest.map(_.getLong(2)).sum
    val out3 = Files.createTempDirectory("graft-shards3").toString
    val m3 = ShardExport.writeJsonlShardsBySize(docs, "doc_id", out3,
      targetChars = totalChars / 3)
    assert(m3.select("shard").distinct().count() <= 4) // ceil(total/(total/3)) = 3 or 4
    assert(m3.agg(sum("n_rows")).head().getLong(0) == 100L)
  }

  test("snapshot log: concurrent appenders — every batch lands once, versions stay linear") {
    import graft.store.SnapshotLog
    val dir = Files.createTempDirectory("graft-snap-race").toString
    SnapshotLog.init(Seq((0L, "seed")).toDF("doc_id", "text")
      .coalesce(1), dir)
    // 6 writers race plain appends from a start barrier; losers of the
    // createLink version race must re-read the head and retry, never
    // fail and never clobber a committed version
    val writers = 6
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to writers).map { w =>
      new Thread(() => {
        try {
          val df = Seq((w.toLong, s"writer $w")).toDF("doc_id", "text")
            .coalesce(1)
          barrier.await()
          SnapshotLog.append(df, dir): Unit
        } catch { case t: Throwable => errors.add(t): Unit }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent append failed: ${errors.peek()}")
    // linear history: contiguous versions, each child's parent = its
    // predecessor, file lists strictly grow (append-only carry)
    val vs = SnapshotLog.versions(dir)
    assert(vs == (0L to writers.toLong))
    vs.sliding(2).foreach { case Seq(a, b) =>
      val sa = SnapshotLog.readSnapshotMeta(dir, a)
      val sb = SnapshotLog.readSnapshotMeta(dir, b)
      assert(sb.parent == a)
      assert(sa.files.toSet.subsetOf(sb.files.toSet))
    }
    // every writer's row landed exactly once
    val rows = SnapshotLog.read(spark, dir).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(rows == (0L to writers.toLong))

    // streaming race on the SAME batch id: exactly one commit wins,
    // the loser returns the winner's version, no duplicate rows
    val sdir = Files.createTempDirectory("graft-snap-race2").toString
    val b2 = new java.util.concurrent.CyclicBarrier(2)
    val versionsSeen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val t2 = (1 to 2).map { w =>
      new Thread(() => {
        try {
          val df = Seq((w.toLong, "dup batch")).toDF("doc_id", "text")
            .coalesce(1)
          b2.await()
          versionsSeen.add(
            SnapshotLog.appendIdempotent(df, sdir, batchId = 7L)): Unit
        } catch { case t: Throwable => errors.add(t): Unit }
      })
    }
    t2.foreach(_.start()); t2.foreach(_.join())
    assert(errors.isEmpty, s"concurrent idempotent append failed: ${errors.peek()}")
    assert(versionsSeen.size() == 2)
    assert(SnapshotLog.versions(sdir) == Seq(0L),
      "same-batch racers must produce exactly one committed version")
    assert(SnapshotLog.read(spark, sdir).count() == 1L)
    assert(SnapshotLog.maxStreamBatchId(sdir) == 7L)
  }

  test("snapshot log: init/append/upsert/time-travel/rollback/vacuum") {
    import graft.store.SnapshotLog
    val dir = Files.createTempDirectory("graft-snap").toString
    // 4 hash-partitioned files so upsert's file pruning has something
    // to prune (one key lives in one file)
    val v0df = (1L to 40L).map(i => (i, s"text $i", 1))
      .toDF("doc_id", "text", "batch").repartition(4, col("doc_id"))
    assert(SnapshotLog.init(v0df, dir) == 0L)
    assert(SnapshotLog.read(spark, dir).count() == 40L)
    assert(SnapshotLog.readSnapshotMeta(dir, 0L).rowCount == 40L)

    // append: metadata-only for existing data (v0 files carried by ref)
    val v1df = (41L to 50L).map(i => (i, s"text $i", 2)).toDF("doc_id", "text", "batch")
    assert(SnapshotLog.append(v1df, dir) == 1L)
    val s0 = SnapshotLog.readSnapshotMeta(dir, 0L)
    val s1 = SnapshotLog.readSnapshotMeta(dir, 1L)
    assert(s0.files.toSet.subsetOf(s1.files.toSet), "append must carry v0 files by reference")
    assert(s1.rowCount == 50L)
    // time travel: v0 unchanged
    assert(SnapshotLog.read(spark, dir, Some(0L)).count() == 40L)

    // upsert: replace doc 7, insert doc 100 — only files containing
    // key 7 rewrite; every other v1 file carries over
    val up = Seq((7L, "UPDATED", 3), (100L, "text 100", 3)).toDF("doc_id", "text", "batch")
    assert(SnapshotLog.upsert(spark, up, dir, Seq("doc_id")) == 2L)
    val s2 = SnapshotLog.readSnapshotMeta(dir, 2L)
    val carried = s1.files.toSet.intersect(s2.files.toSet)
    assert(carried.nonEmpty, "untouched files must carry by reference")
    assert(s2.files.toSet != s1.files.toSet)
    val cur = SnapshotLog.read(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(cur.size == 51 && cur(7L) == "UPDATED" && cur(100L) == "text 100" &&
      cur(8L) == "text 8")
    assert(s2.rowCount == 51L)

    // rollback to v0 by reference; history intact
    assert(SnapshotLog.rollback(dir, 0L) == 3L)
    assert(SnapshotLog.read(spark, dir).count() == 40L)
    assert(SnapshotLog.read(spark, dir, Some(2L)).count() == 51L, "history must survive rollback")
    assert(SnapshotLog.versions(dir) == Seq(0L, 1L, 2L, 3L))

    // roll forward again (so vacuum keeps the 51-row state), then
    // vacuum to 1 version: old versions drop, their exclusive files go
    assert(SnapshotLog.rollback(dir, 2L) == 4L)
    val (dropped, deleted) = SnapshotLog.vacuum(dir, keepVersions = 1, graceMillis = 0L) // test: no concurrent writers
    assert(dropped == 4 && deleted > 0, s"dropped=$dropped deleted=$deleted")
    assert(SnapshotLog.versions(dir) == Seq(4L))
    val after = SnapshotLog.read(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(after.size == 51 && after(7L) == "UPDATED")

    // conflict detection: two writers racing to the same version
    // number — the loser must get an error, never a silent lost
    // update (commit is an atomically-create-new hard link, not a
    // replacing POSIX rename)
    // quality-gated append: a violating batch is rejected WHOLE and
    // commits nothing; a clean batch commits normally
    val checks = Seq(graft.ops.DataProfile.notNull("text"),
      graft.ops.DataProfile.inRange("batch", 0.0, 100.0))
    val vBefore = SnapshotLog.currentVersion(dir).get
    intercept[IllegalArgumentException] {
      SnapshotLog.appendValidated(
        Seq((300L, null: String, 5)).toDF("doc_id", "text", "batch"), dir, checks)
    }
    assert(SnapshotLog.currentVersion(dir).get == vBefore,
      "rejected batch must not commit a version")
    assert(SnapshotLog.appendValidated(
      Seq((301L, "ok", 5)).toDF("doc_id", "text", "batch"), dir, checks) == vBefore + 1)
    assert(SnapshotLog.read(spark, dir).count() == 52L)

    val winner = SnapshotLog.Snapshot(6L, 5L, "append", SnapshotLog
      .readSnapshotMeta(dir, 5L).files, 52L)
    SnapshotLog.writeSnapshotMeta(dir, winner)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.writeSnapshotMeta(dir, winner.copy(op = "racing-append"))
    }
    assert(SnapshotLog.readSnapshotMeta(dir, 6L).op == "append",
      "the winner's commit must survive the race untouched")
  }
}
