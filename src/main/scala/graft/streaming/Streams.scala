package graft.streaming

import graft.embed.Embedder
import graft.functions.{Chunker, TextFunctions}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY.md §2.9: the reference is batch
  * only, so these are the engine's forward-looking extensions, designed
  * so every streaming op shares its aggregation semantics with a batch
  * twin in [[graft.Queries]]):
  *
  *  - incremental corpus ingest: file source → the SAME chunk/embed
  *    stages as the batch build → append sink. New files in the source
  *    dir become searchable chunks on the next trigger; nothing else in
  *    the store layout changes (the flat index is just parquet rows).
  *  - windowed event aggregation: watermarked tumbling event-time
  *    window (batch twin: q6_events_window).
  *  - gap sessionization: flatMapGroupsWithState with event-time
  *    timeout (batch twin: q8_sessionize via lag/window).
  *
  * Scale notes: the file source lists+tracks files incrementally
  * (maxFilesPerTrigger bounds a trigger's work); stateful ops keep one
  * small state row per key in the state store, and the watermark bounds
  * state retention — no unbounded driver or executor accumulation. */
object Streams {

  /** Streaming document source over a directory of text files: each new
    * file becomes one document row with the same metadata columns as the
    * batch [[graft.ingest.DocumentIngest.loadDocuments]] txt path. */
  def streamDocuments(spark: SparkSession, sourceDir: String): DataFrame = {
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(sourceDir)
      .select(
        col("value").as("page_content"),
        col("_metadata.file_path").as("file_path"),
        col("_metadata.file_name").as("file_name"),
        date_format(col("_metadata.file_modification_time"), tsFmt).as("modification_date"))
      .withColumn("creation_date", col("modification_date"))
      .withColumn("file_type", lower(regexp_extract(col("file_name"), "(\\.[^.]+)$", 1)))
      .withColumn("document_type", lit("document"))
      .withColumn("is_pdf", lit(false))
      .filter(length(col("page_content")) > 0)
      .withColumn("hash", TextFunctions.contentHash(col("page_content")))
  }

  /** Incremental index build: stream documents → chunk → clean → embed →
    * append to `dbDir/chunks`. One trigger = one batch of new files;
    * with `Trigger.AvailableNow` it drains the backlog and stops, which
    * is also how the test drives it deterministically. */
  def incrementalIngest(spark: SparkSession, sourceDir: String, dbDir: String,
      embedder: Embedder, chunkSize: Int, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = streamDocuments(spark, sourceDir)
    val chunks = docs
      .withColumn("chunk", explode(Chunker.chunkFixedCol(col("page_content"), lit(chunkSize))))
      .withColumn("text", TextFunctions.asciiClean(col("chunk.text")))
      .filter(length(col("text")) > 0)
      .withColumn("chunk_ordinal", col("chunk.ordinal"))
      .withColumn("page_number", lit(null).cast("int"))
      .withColumn("id", xxhash64(col("hash"), col("chunk_ordinal")))
    val embedded = embedder.embed(chunks, "text")
      .select("id", "text", "vector", "file_path", "file_type", "file_name",
        "creation_date", "modification_date", "hash", "document_type", "page_number")
    embedded.writeStream
      .format("parquet")
      .option("path", s"$dbDir/chunks")
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }

  /** Streaming ANN index maintenance — the streaming twin of
    * [[graft.ops.ProductQuantization.ivfPqUpsert]]: each micro-batch
    * of (id, vector) rows is encoded against the STORED model and
    * upserted into the cell-partitioned codes layout, so the index
    * trails the stream by one trigger with work proportional to the
    * batch's touched cells (the upsert contract), never the index.
    * The model stays fixed across the stream — codebook re-training
    * is an offline rebuild, exactly as in a deployed IVFADC system.
    * Duplicate ids inside one batch collapse deterministically
    * (max-struct, order-independent) BEFORE the upsert, which
    * requires one row per id; across batches the upsert's
    * replace-by-id semantics make the last trigger win. foreachBatch
    * is the right sink shape: the upsert is a multi-job transactional
    * rewrite, not a row-append. */
  def ivfPqMaintainStream(vecs: DataFrame, indexDir: String, idCol: String,
      vecCol: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = batch.groupBy(col(idCol))
          .agg(max(struct(col(vecCol))).as("__s"))
          .select(col(idCol), col("__s")(vecCol).as(vecCol))
        if (!deduped.isEmpty) {
          graft.ops.ProductQuantization.ivfPqUpsert(
            batch.sparkSession, indexDir, deduped, idCol, vecCol)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming exact dedup by content hash — the streaming twin of
    * [[graft.ops.Dedup.exact]] for incremental corpus ingest: a
    * document whose sha256 was already seen within the watermark
    * horizon is dropped before chunking/embedding (first writer wins).
    * `dropDuplicatesWithinWatermark` keys state by hash and expires it
    * with the watermark, so state stays bounded on an endless stream —
    * plain `dropDuplicates` would accumulate every hash forever. */
  def dedupStream(docs: DataFrame, watermark: String = "24 hours"): DataFrame = {
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    docs
      .withColumn("ingest_ts", to_timestamp(col("modification_date"), tsFmt))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("hash")
  }

  /** Streaming benchmark decontamination — the streaming twin of
    * [[graft.ops.Dedup.decontaminate]] for incremental ingest: each
    * incoming document is flagged when any of its word n-grams appears
    * in the STATIC benchmark set. The benchmark's distinct gram hashes
    * are collected once and broadcast (an eval set is small by
    * definition — millions of 8-byte hashes = tens of MB), so the
    * stream side is a stateless map: per-row gram hashing with the
    * same portable md5-prefix family as the batch op, then a broadcast
    * set probe. No watermark, no state store, no stream-side shuffle.
    * Returns the input with a `contaminated` boolean column. */
  def decontaminateStream(docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8): DataFrame = {
    val spark = benchmark.sparkSession
    val benchGrams = graft.ops.Dedup
      .wordGramHashes(benchmark, benchId, benchText, n)
      .select("gh").collect().map(_.getLong(0))
    val bc = spark.sparkContext.broadcast(
      new java.util.HashSet[java.lang.Long](java.util.Arrays.asList(
        benchGrams.map(java.lang.Long.valueOf): _*)))
    val hitUdf = udf { ghs: Seq[Long] =>
      ghs != null && ghs.exists(bc.value.contains(_))
    }
    val w = s"split(trim($textCol), '\\\\s+')"
    val gramsExpr = expr(
      s"""CASE WHEN size($w) >= $n THEN
         |  transform(sequence(1, size($w) - ${n - 1}),
         |    i -> cast(conv(substring(md5(concat_ws(' ', slice($w, i, $n))), 1, 15), 16, 10) AS BIGINT))
         |ELSE cast(array() AS ARRAY<BIGINT>) END""".stripMargin)
    docs.withColumn("contaminated", hitUdf(gramsExpr))
  }

  /** Streaming FUZZY decontamination — the stateless streaming twin
    * of [[graft.ops.Dedup.minhashDecontaminate]] for incremental
    * ingest: benchmark signatures are computed once and broadcast;
    * each incoming document builds its own MinHash signature
    * row-locally (identical affine family over its shingle hashes)
    * and takes the best match fraction across ALL bench signatures.
    * The batch op uses LSH banding as a corpus-scale candidate
    * shortcut; with the bench side broadcast there is nothing to
    * shortcut, so the stream checks every bench signature exactly —
    * it can only flag MORE than the banded batch pass (banding's
    * false negatives disappear), never less. Stateless: no watermark,
    * no state store. Adds (contaminated_fuzzy, best_est, best_bench_id
    * — ties to the lowest bench id, -1 when the doc has no shingles
    * or the bench is empty). */
  def minhashDecontaminateStream(docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8, numHashes: Int = 16, threshold: Double = 0.25): DataFrame = {
    import graft.ops.Dedup
    val spark = benchmark.sparkSession
    val benchSigs: Array[(Long, Array[Long])] = Dedup
      .minhashSignatures(Dedup.hashedShingles(benchmark, benchId, benchText, n), numHashes)
      .collect()
      .map(r => (r.getLong(0), Array.tabulate(numHashes)(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(benchSigs)
    val seeds = Dedup.minhashSeeds(numHashes).toArray
    val p = Dedup.MinhashP
    val scoreUdf = udf { hs: Seq[Long] =>
      if (hs == null || hs.isEmpty || bc.value.isEmpty) (-1L, 0.0)
      else {
        val sig = new Array[Long](numHashes)
        var i = 0
        while (i < numHashes) {
          val (a, b) = seeds(i)
          var m = Long.MaxValue
          hs.foreach { h => val v = ((h >>> 32) * a + b) % p; if (v < m) m = v }
          sig(i) = m
          i += 1
        }
        var bestId = -1L; var best = -1
        bc.value.foreach { case (bid, bsig) =>
          var matches = 0; var j = 0
          while (j < numHashes) { if (sig(j) == bsig(j)) matches += 1; j += 1 }
          if (matches > best) { best = matches; bestId = bid }
        }
        (bestId, best.toDouble / numHashes)
      }
    }
    docs
      .withColumn("__hs", Dedup.shingleHashesUdf(col(textCol), lit(n)))
      .withColumn("__sc", scoreUdf(col("__hs")))
      .withColumn("best_bench_id", col("__sc._1"))
      .withColumn("best_est", col("__sc._2"))
      .withColumn("contaminated_fuzzy", col("best_est") >= threshold)
      .drop("__hs", "__sc")
  }

  /** The full training-data pipeline as ONE STREAMING chain — the
    * streaming twin of the batch `pipeline_corpus` capstone: quality
    * gate (stateless) → content dedup within the watermark horizon
    * (first writer wins — the arrival-order analogue of the batch
    * min-id survivor) → benchmark decontamination (broadcast static
    * gram set, stateless) → deterministic hash split (stateless).
    * One state store total (the dedup hashes, watermark-bounded), so
    * the chain runs indefinitely on an unbounded ingest stream. */
  def pipelineStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, benchmark: DataFrame, benchId: String,
      benchText: String, gramN: Int = 5,
      watermark: String = "24 hours"): DataFrame = {
    val q = graft.ops.TextAnalytics.qualityFilter(docs, textCol)
      .filter(col("passes_quality"))
      .select(col(idCol), col(textCol), col(tsCol))
    val deduped = q
      .withColumn("__sha", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sha")
    val clean = decontaminateStream(deduped, textCol,
        benchmark, benchId, benchText, gramN)
      .filter(!col("contaminated"))
    graft.ops.TextAnalytics.hashSplit(clean, idCol)
      .select(col(idCol), col("split"))
  }

  /** Streaming quality gating — the streaming twin of
    * [[graft.ops.TextAnalytics.qualityFilter]] for incremental ingest:
    * the gates are pure row-local column expressions (replace-length
    * counting, no aggregation), so the streaming plan is STATELESS — no
    * watermark, no state store, no stream-side shuffle. Documents
    * failing any gate are dropped before the expensive chunk/embed
    * stages; the rule booleans stay attached for auditing. */
  def qualityGateStream(docs: DataFrame, textCol: String): DataFrame =
    graft.ops.TextAnalytics.qualityFilter(docs, textCol)
      .filter(col("passes_quality"))

  /** Streaming canary screen — stateless twin of the batch
    * canary_screen: the canary list rides in the Aho–Corasick
    * expression (one cached automaton per executor, no state store,
    * no watermark), so incoming docs are screened for verbatim
    * benchmark leakage at ingest time and dropped before they ever
    * reach the corpus. */
  def canaryScreenStream(docs: DataFrame, idCol: String, textCol: String,
      canaries: Seq[String]): DataFrame =
    graft.ops.TextAnalytics.canaryHits(docs, idCol, textCol, canaries)
      .filter(!col("leaked"))

  /** Sidecar batch-id fence for driver-side read-merge-write summary
    * state (MG/KLL/mean files): foreachBatch is at-least-once, and a
    * replayed trigger must not double-merge its delta. The fence file
    * sits next to the state file (`<name>.batch`), written AFTER the
    * state with the same atomic tmp+move — a crash between the two
    * writes replays one merge (the inherent two-file window, same as
    * the snapshot log's append-then-stamp), never more. */
  private def readFence(statePath: java.nio.file.Path): Long = {
    val p = statePath.resolveSibling(statePath.getFileName.toString + ".batch")
    if (!java.nio.file.Files.exists(p)) -1L
    else new String(java.nio.file.Files.readAllBytes(p)).trim.toLong
  }

  private def writeFence(statePath: java.nio.file.Path, batchId: Long): Unit = {
    val p = statePath.resolveSibling(statePath.getFileName.toString + ".batch")
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, batchId.toString.getBytes)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Streaming heavy-hitters maintenance — the streaming twin of the
    * heavy_hitters batch op. Each trigger aggregates its micro-batch
    * into ONE bounded Misra-Gries buffer (the identical distributed
    * partial-agg plan the batch op runs — each task ships ≤ k
    * counters) and MERGES it into the persisted summary at
    * `summaryPath`, batch-id fenced against trigger redelivery. MG
    * summaries are mergeable with the guarantee
    * telescoping across any merge tree (Agarwal et al. 2012), so after
    * N total stream items every item with true count > N/(k+1) is in
    * the file and no estimate exceeds its true count — same contract
    * as one batch pass over the whole history, with O(k) state.
    *
    * foreachBatch because the summary is a transactional read-merge-
    * write of a driver-side O(k) artifact, not a row-append sink. */
  def heavyHittersStream(items: DataFrame, itemCol: String, k: Int,
      summaryPath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    items.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > readFence(summaryPath)) {
          val rows = batch
            .agg(graft.functions.MgFunctions.misraGries(col(itemCol), k).as("mg"))
            .select(explode(col("mg")).as("e"))
            .select(col("e.item"), col("e.est"))
            .collect() // ≤ k rows by construction
          if (rows.nonEmpty) {
            val delta = new graft.functions.MgBuffer(k)
            rows.foreach(r => delta.counts.put(r.getString(0), r.getLong(1)))
            val total = graft.functions.MgSummary.read(summaryPath, k)
            total.mergeFrom(delta)
            graft.functions.MgSummary.write(summaryPath, total)
          }
          writeFence(summaryPath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming BM25 index maintenance — the LEXICAL twin of
    * [[ivfPqMaintainStream]]: each trigger's new documents merge into
    * the stored inverted index via
    * [[graft.ops.InvertedIndex.appendDocs]] (touched term-hash buckets
    * rewritten, exact-integer stats update — the maintained index
    * stays BIT-IDENTICAL to a full rebuild). In-batch id collisions
    * collapse first-writer-wins (min text by id order is arbitrary for
    * true dups; deterministic via min) — that dedups only WITHIN one
    * delivery; replay safety comes from the batch-id fence appendDocs
    * records in the index stats row (a redelivered trigger is a
    * no-op). CROSS-trigger dedup is the upstream [[dedupStream]]'s
    * job, per the appendDocs contract. */
  def bm25MaintainStream(docs: DataFrame, indexDir: String, idCol: String,
      textCol: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val collapsed = batch.groupBy(col(idCol))
          .agg(min(col(textCol)).as(textCol))
        graft.ops.InvertedIndex.appendDocs(batch.sparkSession, indexDir,
          collapsed, idCol, textCol, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming snapshot-table maintenance: each micro-batch commits as
    * one new [[graft.store.SnapshotLog]] version via
    * `appendIdempotent`, which fences on the recorded stream batch id
    * — foreachBatch's at-least-once redelivery becomes exactly-once in
    * the version log (the transactional-sink discipline; the OTHER
    * maintain-streams get idempotence from replace-by-id semantics,
    * an append-only log needs the fence). Readers meanwhile pin any
    * committed version: ingestion never tears a training run's view. */
  def snapshotAppendStream(docs: DataFrame, tableDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.store.SnapshotLog.appendIdempotent(batch, tableDir, batchId): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Z-ordered snapshot ingest with in-line layout maintenance: each
    * trigger's batch gets its Morton key (map-only) and lands via the
    * exactly-once [[graft.store.SnapshotLog.appendIdempotent]]; every
    * `compactEvery` batches, [[graft.ops.ZOrder.compact]] restores
    * per-file z-range disjointness so footer-stats pruning stays
    * effective as appends accumulate — the streaming face of the
    * OPTIMIZE cycle. Appends are batch-id fenced; compaction needs no
    * fence of its own (it is row-set-preserving and a no-op on a
    * clean layout, so a crash-replayed compact is at worst a wasted
    * rewrite, never wrong data). */
  def zorderAppendStream(docs: DataFrame, tableDir: String,
      dims: Seq[org.apache.spark.sql.Column], bits: Int,
      checkpointDir: String, compactEvery: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be positive")
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch.withColumn("zkey",
          graft.ops.ZOrder.interleave(dims, bits))
        graft.store.SnapshotLog.appendIdempotent(keyed, tableDir, batchId)
        if ((batchId + 1) % compactEvery == 0)
          graft.ops.ZOrder.compact(batch.sparkSession, tableDir): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** CDC-driven BM25 index maintenance — the change-log consumer over
    * [[graft.ops.InvertedIndex.applyCdc]]: each trigger's batch of
    * (op, id, text_before, text_after) rows applies as
    * remove-then-append, keeping the stored index bit-identical to a
    * rebuild over the evolving corpus. Before-images locate old
    * postings' buckets, so work per trigger stays O(batch + touched
    * buckets) regardless of index size. Batch-id fenced via the index
    * stats row — a redelivered trigger applies nothing. */
  def bm25CdcStream(changes: DataFrame, indexDir: String, idCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.InvertedIndex.applyCdc(batch.sparkSession, indexDir,
          batch, idCol, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming paragraph dedup — boilerplate excision AT INGEST: each
    * trigger's docs are cleaned against the persisted paragraph-hash
    * index ([[graft.ops.TextAnalytics.dedupParagraphsIncremental]],
    * partition-pruned anti-join + add-only hash append, batch-id
    * fenced) and the cleaned docs land in a snapshot table via the
    * exactly-once append — the full first-writer-wins pipeline a
    * re-crawl feeds. */
  def paragraphDedupStream(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, tableDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val cleaned = graft.ops.TextAnalytics.dedupParagraphsIncremental(
            batch.sparkSession, indexDir, batch, idCol, textCol, batchId)
          graft.store.SnapshotLog.appendIdempotent(cleaned, tableDir, batchId): Unit
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming mini-batch k-means maintenance (Sculley 2010) — the
    * clustering member of the streaming summary family: each trigger
    * assigns its vectors to the persisted centroids (one broadcast-
    * literal map pass + one partial-agg shuffle, the batch kmeans
    * iteration plan) and applies the per-center running-mean update
    * with exact integer micro-unit arithmetic. O(k·dim) state, replay
    * fenced on the stream batch id. First trigger seeds from its k
    * lowest-id vectors (the batch seeding rule). */
  def kmeansMaintainStream(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, statePath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.MiniBatchKmeans.processBatch(
            batch, idCol, vecCol, dim, k, statePath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Continuous data-quality monitoring — the streaming member of the
    * [[graft.ops.DataProfile]] family: each trigger validates its
    * micro-batch in ONE scan (violation counts, never rows) and merges
    * the exact long counts into the persisted report, batch-id fenced.
    * The report after any trigger sequence equals one batch validate
    * over the whole history. */
  def validateStream(rows: DataFrame, checks: Seq[graft.ops.DataProfile.Check],
      reportPath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.DataProfile.mergeReport(reportPath, batch, checks, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** CDC-driven snapshot-table maintenance: each trigger's change
    * batch (op, key, payload) applies as ONE
    * [[graft.store.SnapshotLog.applyCdc]] version commit — upserts and
    * deletes together, file-pruned, batch-id fenced. The corpus-table
    * counterpart of [[bm25CdcStream]]: together they keep table and
    * index in lockstep from the same change log. */
  def snapshotCdcStream(changes: DataFrame, tableDir: String,
      keyCols: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.store.SnapshotLog.applyCdc(
            batch.sparkSession, batch, tableDir, keyCols, batchId): Unit
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming quantile-summary maintenance — the quantile member of
    * the streaming summary family ([[heavyHittersStream]] counts,
    * [[embeddingMeanStream]] means): each trigger reduces its
    * micro-batch to ONE KLL buffer with the distributed
    * `quantile_sketch` aggregate (one bounded buffer per partition
    * crosses the exchange, one summary row reaches the driver) and
    * merges it into the persisted state. The sketch is mergeable with
    * its error budget INTACT — the persisted `errBound` after any
    * trigger sequence equals what a single batch pass over the whole
    * history would have spent plus the merge compactions, and the
    * one-sided rank guarantee telescopes across triggers. State is
    * ≤ k·log₂(n/k) doubles regardless of stream length. Batch-id
    * fenced (sidecar `.batch` file) — a redelivered trigger must not
    * double-merge, which would silently inflate n/errBound. */
  def quantileSketchStream(values: DataFrame, valueCol: String, k: Int,
      summaryPath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    values.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > readFence(summaryPath)) {
          val row = batch
            .agg(graft.functions.QsFunctions.quantileSketch(col(valueCol), k).as("qs"))
            .select(col("qs.n"), col("qs.err_bound"), col("qs.items")).head()
          if (row.getLong(0) > 0) {
            val delta = graft.functions.QSketchIO.fromSummary(k,
              row.getLong(0), row.getLong(1),
              row.getSeq[org.apache.spark.sql.Row](2)
                .map(r => (r.getDouble(0), r.getLong(1))))
            val total = graft.functions.QSketchIO.read(summaryPath, k)
            total.mergeFrom(delta)
            graft.functions.QSketchIO.write(summaryPath, total)
          }
          writeFence(summaryPath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming PCA maintenance — the covariance member of the
    * streaming summary family: each trigger reduces its micro-batch to
    * ONE exact integer gram buffer ([[graft.functions.GramFunctions
    * .gramMatrix]], one bounded buffer per partition) and elementwise-
    * adds it into the persisted moment state; the model read via
    * [[graft.ops.Pca.modelFromState]] after any trigger sequence is
    * BIT-IDENTICAL to one batch [[graft.ops.Pca.fit]] over the whole
    * history (integer adds commute — no float drift to argue about).
    * State is d + d(d+1)/2 longs regardless of stream length; batch-id
    * fenced like the other read-merge-write summaries. */
  def pcaMaintainStream(vecs: DataFrame, vecCol: String, dim: Int,
      statePath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > readFence(statePath)) {
          val row = batch
            .agg(graft.functions.GramFunctions.gramMatrix(col(vecCol), dim).as("m"))
            .select(col("m.n"), col("m.s"), col("m.g")).head()
          if (row.getLong(0) > 0) {
            val st = graft.ops.Pca.GramIO.read(statePath, dim)
            st.merge(row.getLong(0), row.getSeq[Long](1), row.getSeq[Long](2))
            graft.ops.Pca.GramIO.write(statePath, st)
          }
          writeFence(statePath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** CDC-driven aggregate-VIEW maintenance — the materialized-view
    * member of the CDC consumer family ([[snapshotCdcStream]] table,
    * [[bm25CdcStream]] index, this one the dashboard rollup): each
    * trigger's change batch applies as per-key integer deltas to the
    * bucketed [[graft.ops.AggView]] state, touched buckets only,
    * per-bucket batch-id fences (a replayed trigger skips buckets it
    * already applied). */
  def aggViewCdcStream(changes: DataFrame, viewDir: String, keyCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.AggView.applyCdc(
            batch.sparkSession, batch, viewDir, keyCol, batchId): Unit
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming EWMA maintenance — the time-series member of the
    * streaming summary family, with a stronger-than-usual contract:
    * the persisted state is the EXACT integer daily-cents rollup
    * (day sums add, so out-of-order and late events land safely in
    * their day — no watermark needed for correctness), and the
    * recurrence derives at READ time over the calendar-bounded
    * series, so [[graft.ops.EventAnalytics.ewmaFromState]] equals the
    * batch [[graft.ops.EventAnalytics.ewmaSmooth]] over the whole
    * history bit for bit, under ANY trigger slicing. Batch-id fenced. */
  def ewmaMaintainStream(events: DataFrame, typeCol: String, tsCol: String,
      valueCol: String, statePath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > readFence(statePath)) {
          val delta = graft.ops.EventAnalytics
            .dailyCents(batch, typeCol, tsCol, valueCol)
            .collect()
            .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
          if (delta.nonEmpty) {
            val st = scala.collection.mutable.Map(
              graft.ops.EventAnalytics.DailyStateIO.read(statePath).toSeq: _*)
            delta.foreach { case (k, c) =>
              st(k) = st.getOrElse(k, 0L) + c
            }
            graft.ops.EventAnalytics.DailyStateIO.write(statePath, st.toMap)
          }
          writeFence(statePath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming embedding-mean maintenance — the streaming side of the
    * [[graft.ops.SimilaritySearch.embeddingDrift]] monitor: each
    * trigger reduces its micro-batch to (count, per-dim double sums)
    * with ONE partial-agg pass and merges them into the persisted
    * running state (counts and sums are exactly mergeable), so the
    * monitor can report the stream's mean vector against a frozen
    * baseline at any moment without rescanning history. State is
    * dim+1 numbers — O(dim) regardless of stream length. Doubles are
    * persisted via toString (shortest round-trip: read(write(x)) is
    * bit-identical, the IVF-PQ model.json discipline). Batch-id
    * fenced (sidecar `.batch` file) against trigger redelivery. */
  def embeddingMeanStream(vecs: DataFrame, vecCol: String, dim: Int,
      statePath: java.nio.file.Path, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > readFence(statePath)) {
          val v = batch.select(col(vecCol).cast("array<double>").as("__v"))
          val aggs = (0 until dim).map(i => sum(col("__v")(i)).as(s"s$i"))
          val row = v.agg(aggs.head, (aggs.tail :+ count(lit(1)).as("n")): _*).head()
          val n = row.getLong(dim)
          if (n > 0) {
            val (n0, s0) = MeanState.read(statePath, dim)
            MeanState.write(statePath, n0 + n,
              Array.tabulate(dim)(i => s0(i) + row.getDouble(i)))
          }
          writeFence(statePath, batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Persisted (count, per-dim sum) state for [[embeddingMeanStream]];
    * atomic tmp+move writes, text format with round-trip-exact double
    * rendering. */
  object MeanState {
    def write(path: java.nio.file.Path, n: Long, sums: Array[Double]): Unit = {
      val body = (n.toString +: sums.map(_.toString)).mkString("\n")
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.writeString(tmp, body)
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def read(path: java.nio.file.Path, dim: Int): (Long, Array[Double]) = {
      if (!java.nio.file.Files.exists(path)) return (0L, new Array[Double](dim))
      val lines = java.nio.file.Files.readString(path).split("\n")
      require(lines.length == dim + 1,
        s"state at $path has ${lines.length - 1} dims, expected $dim — " +
          "a dim change needs a fresh state path")
      (lines.head.toLong, lines.tail.map(_.toDouble))
    }
    /** The running mean in exact micro-units (the
      * [[graft.ops.Clustering.kmeans]] snap), for comparison against a
      * baseline vector. */
    def meanMicro(path: java.nio.file.Path, dim: Int): Array[Long] = {
      val (n, s) = read(path, dim)
      require(n > 0, "no vectors accumulated yet")
      // half away from zero — the SQL round() convention the batch
      // drift op snaps with (math.round would round -2.5 up to -2)
      Array.tabulate(dim) { i =>
        val m = s(i) / n * 1e6
        if (m >= 0) math.floor(m + 0.5).toLong else math.ceil(m - 0.5).toLong
      }
    }
  }

  /** Streaming stratified rate sampling — the streaming twin of
    * [[graft.ops.TextAnalytics.stratifiedSample]]: membership is a pure
    * function of the id hash, so the plan is a stateless map and a
    * restarted/replayed stream keeps exactly the same rows (critical
    * for exactly-once sinks — a rand()-based sample would re-flip
    * coins on replay). */
  def stratifiedSampleStream(docs: DataFrame, idCol: String,
      stratumCol: String, rates: Map[String, Double],
      defaultRate: Double): DataFrame =
    graft.ops.TextAnalytics.stratifiedSample(docs, idCol, stratumCol, rates, defaultRate)

  /** Watermarked tumbling event-time window counts — works identically
    * on a streaming or batch frame with (ts: timestamp, event_type,
    * value) columns; batch twin of q6_events_window. */
  def windowedEventCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    wm.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_cents"))
  }

  case class UserEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long)
  case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  case class FunnelEvent(user_id: Long, step: Int, ts: Timestamp)
  case class FunnelStreamState(ts: Array[Long], step: Array[Byte])
  case class FunnelCompletion(user_id: Long, completions: Seq[Option[Long]])

  /** Gap-based sessionization over a stream: per-user state holds the
    * open session; an event within `gapSeconds` of the session end
    * extends it, a later event closes it (emitting the finished
    * session), and the event-time timeout flushes sessions the
    * watermark has passed. State per key is one (start, end, n) row —
    * bounded regardless of stream length. */
  def sessionizeStream(events: Dataset[UserEvent], gapSeconds: Long,
      watermark: String = "2 hours"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(UserSession(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              closed += UserSession(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.iterator
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming strict-order funnel (batch twins: funnel_steps /
    * funnel_steps_agg). Events of the funnel step types are buffered
    * per user in the state store; when the WATERMARK passes the user's
    * first event + `horizon`, the same sorted strict-order DP as the
    * batch [[graft.functions.FunnelTimes]] aggregate runs over the
    * buffer and ONE completion row is emitted (users who never reach
    * step 0 emit nothing). Buffering-then-evaluating is what makes the
    * stream equal the batch result under out-of-order arrival — an
    * incremental DP could not revisit an already-seen step-1 event when
    * a late step-0 event improves comp(0).
    *
    * State per user is its funnel-type events inside the horizon —
    * the same bounded-buffer trade as funnelAgg (`maxEventsPerKey`
    * fail-fasts pathological keys); the event-time timeout removes
    * state, so retention is horizon-bounded. Events arriving after the
    * user's row was emitted are dropped with the state gone (exactly a
    * batch run over the horizon's events). */
  def funnelStream(events: Dataset[UserEvent], steps: Seq[String],
      horizonSeconds: Long, watermark: String = "2 hours",
      maxEventsPerKey: Int = 1 << 20): Dataset[FunnelCompletion] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnelStream needs non-empty distinct steps")
    val horizonMs = horizonSeconds * 1000L
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.length

    def fn(userId: Long, evs: Iterator[FunnelEvent],
        state: GroupState[FunnelStreamState]): Iterator[FunnelCompletion] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val buf = new graft.functions.FunnelBuffer(k, maxEventsPerKey)
        s.ts.zip(s.step).foreach { case (t, st) => buf.append(t, st.toInt) }
        val comp = buf.completions()
        if (comp(0) == Long.MinValue) Iterator.empty
        else Iterator(FunnelCompletion(userId,
          comp.map(c => if (c == Long.MinValue) None else Some(c)).toSeq))
      } else {
        val fresh = evs.toSeq
        val prev = state.getOption.getOrElse(FunnelStreamState(Array.empty, Array.empty))
        require(prev.ts.length + fresh.size <= maxEventsPerKey,
          s"funnelStream key $userId exceeded maxEventsPerKey=$maxEventsPerKey")
        val next = FunnelStreamState(
          prev.ts ++ fresh.map(_.ts.getTime),
          prev.step ++ fresh.map(_.step.toByte))
        state.update(next)
        // Clamp above the current watermark: min(ts)+horizon is fixed once
        // the first event lands, and Spark rejects a timeout <= watermark
        // with IllegalArgumentException — a key active longer than the
        // horizon would otherwise kill the query. For keys admitted near
        // the watermark the effective horizon extends to watermark+1.
        state.setTimeoutTimestamp(
          math.max(next.ts.min + horizonMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty
      }
    }

    events.filter(e => stepIdx.contains(e.event_type))
      .map(e => FunnelEvent(e.user_id, stepIdx(e.event_type), e.ts))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class FirstTouchState(firstTs: Long, firstType: String, nConv: Long)
  case class UserFirstTouch(user_id: Long, first_ts: Long, first_touch: String,
    n_conversions: Long)

  /** Streaming first-touch attribution state (batch twin:
    * [[graft.ops.EventAnalytics.firstTouchAttribution]]'s per-user
    * reduction). Per user the state is (earliest (ts, type), conversion
    * count) — a running min and a running sum, updated incrementally in
    * Update mode; out-of-order arrivals are absorbed because min() is
    * order-insensitive. Emitted components are each MONOTONE (first_ts
    * never grows, n_conversions never shrinks), so a consumer — or the
    * stream==batch spec — reconstructs the final row per user from any
    * update log without trigger ordering. Tie-break inside one
    * timestamp is the event-type string (streams have no stable event
    * id across retries; the batch twin reproduces this by passing the
    * type column as its tiebreak). One state row per user, no
    * timeout — attribution state is the product's lifetime state. */
  def firstTouchStream(events: Dataset[UserEvent],
      convType: String): Dataset[UserFirstTouch] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[FirstTouchState]): UserFirstTouch = {
      val fresh = evs.toSeq
      val cands = state.getOption.map(p => (p.firstTs, p.firstType)).toSeq ++
        fresh.map(e => (e.ts.getTime, e.event_type))
      val (ft, fe) = cands.min
      val nConv = state.getOption.map(_.nConv).getOrElse(0L) +
        fresh.count(_.event_type == convType)
      state.update(FirstTouchState(ft, fe, nConv))
      UserFirstTouch(userId, ft, fe, nConv)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stream-stream attribution join: every (start, point) pair with
    * the same key where `startTs <= pointTs < startTs + horizon` — the
    * streaming twin of [[graft.ops.TemporalJoins.pointInIntervalJoin]]
    * for intervals of fixed `horizonSeconds` width (click→conversion
    * attribution, incident correlation).
    *
    * This is Spark's NATIVE stream-stream inner join, and the shape is
    * load-bearing: two event-time watermarks plus a TWO-SIDED range
    * predicate are exactly what the engine needs to bound both state
    * stores — a buffered start row is evicted once the watermark
    * passes `startTs + horizon`, a point row once no future start can
    * precede it; an unconstrained key-equality join would buffer both
    * streams forever. State per trigger is O(events inside the horizon
    * × watermark window), independent of stream lifetime.
    *
    * Contract mirrors the batch op: non-key column names must be
    * disjoint; output = key + both frames' columns, one row per
    * containment. Also callable on batch frames (`withWatermark` is a
    * no-op there) — the spec asserts stream == batch == hand-derived
    * pairs. */
  def intervalJoinStream(starts: DataFrame, points: DataFrame,
      keyCol: String, startTsCol: String, pointTsCol: String,
      horizonSeconds: Long, watermark: String = "10 minutes"): DataFrame = {
    require(horizonSeconds > 0, s"horizon must be positive, got $horizonSeconds")
    val overlap = starts.columns.toSet.intersect(points.columns.toSet) - keyCol
    require(overlap.isEmpty, s"non-key column names must be disjoint: $overlap")
    val l = starts.withColumnRenamed(keyCol, "__lk")
      .withWatermark(startTsCol, watermark)
    val r = points.withColumnRenamed(keyCol, "__rk")
      .withWatermark(pointTsCol, watermark)
    l.join(r, expr(s"__lk = __rk AND $startTsCol <= $pointTsCol AND " +
        s"$pointTsCol < $startTsCol + interval $horizonSeconds seconds"))
      .withColumnRenamed("__lk", keyCol)
      .drop("__rk")
  }
}
