package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Materialized inverted index for lexical (BM25) retrieval — the text
  * analogue of [[SimilaritySearch.ivfWrite]]/[[SimilaritySearch.ivfTopKStored]].
  * [[TextAnalytics.bm25Search]] scans the whole corpus per query-term
  * set (right for one-off queries); this layout pays ONE corpus pass at
  * build time and then answers every query from the query terms'
  * posting lists only:
  *
  *  - `postings` parquet, partitioned by a term-hash bucket (≤
  *    `numBuckets` dirs): one row per (term, doc) carrying tf and the
  *    doc length, so the query path needs no doc-table join;
  *  - `stats` sidecar: one row with N, avgdl (computed with the exact
  *    expressions of the scan path, so scores match bit-for-bit) and
  *    the bucket count (the layout is self-describing).
  *
  * At query time only the terms' hash buckets are READ (static
  * partition pruning — other buckets' files are never opened), df per
  * term is a count over those pruned lists, and the per-doc score
  * reproduces the scan path's arithmetic term-by-term in the same
  * order, so `bm25SearchIndexed` == `bm25Search` exactly (same oracle).
  *
  * Scale: the build is explode→count (one shuffle on (term, doc));
  * a query reads terms/numBuckets of the index regardless of corpus
  * size. Partitioning by HASH BUCKET, not raw term, bounds the
  * directory count (a raw-term layout is millions of dirs). */
object InvertedIndex {

  /** Portable 60-bit md5-prefix hash of a term — same family as the
    * shingle/id hashes, replayable in any engine. */
  private def termHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Index stats row, positionally stable for [[bm25SearchIndexed]]:
    * (n double, avgdl double, num_buckets int, sum_dl long,
    * last_batch_id long). `lastBatch` is the streaming replay fence —
    * −1 when the index has never been maintained from a stream (and
    * when reading a pre-fence 4-column stats row). */
  private case class Stats(n: Long, avgdl: Double, numBuckets: Int,
      sumDl: Long, lastBatch: Long)

  private def readStats(spark: SparkSession, dir: String): Stats = {
    val row = spark.read.parquet(s"$dir/stats").collect().head
    val lb = if (row.schema.size >= 5) row.getLong(4) else -1L
    Stats(row.getDouble(0).toLong, row.getDouble(1), row.getInt(2),
      row.getLong(3), lb)
  }

  /** Write the stats row with the rebuild's exact arithmetic (integer
    * sum cast double / count) so maintained avgdl is bit-identical to
    * a rebuild's. */
  private def writeStats(spark: SparkSession, dir: String, n: Long,
      sumDl: Long, numBuckets: Int, lastBatch: Long): Unit =
    spark.range(1).select(
        lit(n).cast("double").as("n"),
        (lit(sumDl).cast("double") / lit(n).cast("double")).as("avgdl"),
        lit(numBuckets).as("num_buckets"),
        lit(sumDl).as("sum_dl"),
        lit(lastBatch).as("last_batch_id"))
      .write.mode("overwrite").parquet(s"$dir/stats")

  def write(df: DataFrame, idCol: String, textCol: String, dir: String,
      numBuckets: Int = 256): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val words = split(trim(col(textCol)), "\\s+")
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
      words.as("__w"))
    // stats FIRST and with the scan path's exact expressions (count
    // cast double; integer token sum / count) — identical doubles.
    // `sum_dl` (exact integer) rides along so incremental appendDocs
    // can recompute avgdl EXACTLY as a rebuild would (n·avgdl would
    // reintroduce float error); bm25SearchIndexed reads positionally
    // and ignores it, as it does `last_batch_id` (the replay fence,
    // −1 = fresh build).
    base.agg(
        count(lit(1)).cast("double").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
        lit(numBuckets).as("num_buckets"),
        sum(col("dl")).as("sum_dl"),
        lit(-1L).as("last_batch_id"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    base.select(col("doc_id"), col("dl"), explode(col("__w")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(termHash(col("term")), lit(numBuckets)))
      // co-partition on the bucket BEFORE the partitioned write: a
      // partitionBy write from T tasks emits up to T files per bucket
      // (T·numBuckets small files — the classic partitioned-store
      // death; measured 18× wall at 10× data); repartitioned, each
      // bucket is one task's output = one file
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
  }

  /** Append-only incremental maintenance: merge a batch of NEW
    * documents into a stored index. Only the batch terms' hash-bucket
    * partitions are rewritten (dynamic partition overwrite — untouched
    * buckets' files are never opened), and stats update from EXACT
    * integer sums, so the maintained index is BIT-IDENTICAL to a full
    * rebuild over old ∪ new (asserted in StreamingSpec, incl. scores).
    *
    * Contract: batch doc ids must be new — streaming ingest dedups
    * upstream ([[graft.streaming.Streams.dedupStream]]); a colliding id
    * double-counts postings exactly as a rebuild over a corpus with a
    * duplicated id would. Work per batch is O(batch postings + touched
    * buckets' existing postings) regardless of index size.
    *
    * `batchId`: the streaming replay fence. foreachBatch redelivers a
    * batch after a failed trigger; with `batchId >= 0` the call is a
    * no-op when `batchId <=` the recorded `last_batch_id` (in-batch id
    * collapse alone does NOT make replay safe — it dedups only within
    * one delivery). −1 (the default) skips the fence for direct batch
    * use. */
  def appendDocs(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, batchId: Long = -1L): Unit = {
    val stats = readStats(spark, dir)
    if (batchId >= 0 && batchId <= stats.lastBatch) return // replayed trigger
    val (oldN, numBuckets, oldSum) = (stats.n, stats.numBuckets, stats.sumDl)
    val fence2 = math.max(stats.lastBatch, batchId)
    val words = split(trim(col(textCol)), "\\s+")
    val base = batch.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
      words.as("__w"))
    val brow = base.agg(count(lit(1)).as("nb"), sum(col("dl")).as("sb")).head()
    val nb = brow.getLong(0)
    if (nb == 0) {
      // nothing to merge, but an empty fenced trigger must still
      // advance the fence or its id could be "reused" by a replay
      if (batchId > stats.lastBatch)
        writeStats(spark, dir, oldN, oldSum, numBuckets, fence2)
      return
    }
    val sb = brow.getLong(1)
    val newPostings = base
      .select(col("doc_id"), col("dl"), explode(col("__w")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(termHash(col("term")), lit(numBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = newPostings.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val merged = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(touched: _*))
      // partition-column read-back infers INT; the build side is LONG
      .select(col("term"), col("doc_id"), col("dl"), col("tf"),
        col("bucket").cast("long").as("bucket"))
      .unionByName(newPostings
        .select(col("term"), col("doc_id"), col("dl"), col("tf"), col("bucket")))
      // eager checkpoint: the write overwrites the path the old rows
      // were read from (the ivfPqUpsert discipline)
      .localCheckpoint(true)
    newPostings.unpersist()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$dir/postings")
    writeStats(spark, dir, oldN + nb, oldSum + sb, numBuckets, fence2)
  }

  /** Deletion maintenance — [[appendDocs]]' inverse, the right-to-be-
    * forgotten pass an indexed corpus needs: remove `docs`' postings
    * and subtract their EXACT length sums from the stats, leaving the
    * index BIT-IDENTICAL to a rebuild over corpus ∖ docs. The removal
    * batch carries the documents' TEXT (the pipeline deleting docs has
    * them — it is dropping them from the corpus table in the same
    * commit): the text determines the terms, the terms determine the
    * touched hash buckets, so — exactly like append — only the touched
    * buckets' partitions rewrite (dynamic partition overwrite) and the
    * anti-join runs over those buckets' postings only. Ids absent from
    * the index subtract nothing and drop nothing (idempotent replay —
    * for docs WITH postings; see the zero-term caveat below).
    *
    * Zero-term victims (empty/whitespace-only text): they were counted
    * into `n` at build/append time but left no postings, so presence
    * cannot be re-checked against the index — they subtract from `n`
    * unconditionally, matching a rebuild over corpus ∖ docs. Replay
    * idempotence for THEM therefore needs the `batchId` fence (or a
    * caller that never replays empty-doc removals).
    *
    * `batchId`: streaming replay fence, same semantics as
    * [[appendDocs]]. */
  def removeDocs(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, batchId: Long = -1L): Unit = {
    val stats = readStats(spark, dir)
    if (batchId >= 0 && batchId <= stats.lastBatch) return // replayed trigger
    val (oldN, numBuckets, oldSum) = (stats.n, stats.numBuckets, stats.sumDl)
    val fence2 = math.max(stats.lastBatch, batchId)
    val words = split(trim(col(textCol)), "\\s+")
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
      words.as("__w")).dropDuplicates("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // zero-term victims never touch a bucket: count them from the batch
    val zeroVictims = base.filter(col("dl") === 0L).count()
    val victims = base.select(col("doc_id"), explode(col("__w")).as("term"))
      .filter(col("term") =!= "")
      .withColumn("bucket", pmod(termHash(col("term")), lit(numBuckets)))
    val touched = victims.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (touched.isEmpty) {
      base.unpersist()
      // a batch of only empty docs still shrinks n (dl sums are 0);
      // an empty fenced trigger still advances the fence
      if (zeroVictims > 0 || batchId > stats.lastBatch)
        writeStats(spark, dir, oldN - zeroVictims, oldSum, numBuckets, fence2)
      return
    }
    val bucketRows = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(touched: _*))
      .select(col("term"), col("doc_id"), col("dl"), col("tf"),
        col("bucket").cast("long").as("bucket"))
    // subtract ONLY docs actually present in the index (replay safety):
    // presence and the exact (doc, dl) to subtract come from the index
    // itself, not the caller's claim
    val present = bucketRows.join(broadcast(base.select(col("doc_id"))), Seq("doc_id"))
      .select(col("doc_id"), col("dl")).distinct()
      .collect()
    val survivors = bucketRows
      .join(broadcast(base.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // the write overwrites the read path
    base.unpersist()
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$dir/postings")
    // dynamic overwrite only replaces partitions PRESENT in the
    // written frame — a bucket whose postings were ALL removed writes
    // zero rows and would keep its stale files; drop those partition
    // dirs explicitly
    val survivorBuckets = survivors.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    touched.filterNot(survivorBuckets.contains).foreach { b =>
      val p = java.nio.file.Paths.get(dir, "postings", s"bucket=$b")
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala.foreach(java.nio.file.Files.delete)
        finally s.close()
        java.nio.file.Files.delete(p)
      }
    }
    writeStats(spark, dir, oldN - present.length - zeroVictims,
      oldSum - present.map(_.getLong(1)).sum, numBuckets, fence2)
  }

  /** CDC maintenance: apply one change batch to the stored index.
    * `changes` columns: `op` ("insert" | "update" | "delete"),
    * `<idCol>`, `text_before` (the INDEXED text — required for
    * update/delete; this is the CDC before-image a log like Debezium
    * carries, and it is what locates the old postings' buckets without
    * scanning the index), `text_after` (required for insert/update).
    * Applies as remove(before-images) then append(after-images), so
    * the index stays BIT-IDENTICAL to a rebuild over the corpus with
    * the batch applied. In-batch discipline: at most one change per
    * id (collapse upstream — CDC logs are per-key ordered).
    *
    * `batchId`: streaming replay fence — a redelivered trigger is a
    * whole-batch no-op. The remove and append phases are two separate
    * index writes; the fence advances with the FINAL write, so a crash
    * between the phases replays from the remove phase, whose
    * posting-side subtraction is presence-checked (idempotent). Only
    * empty-text before-images re-subtract `n` in that narrow window —
    * the removeDocs zero-term caveat. */
  def applyCdc(spark: SparkSession, dir: String, changes: DataFrame,
      idCol: String, batchId: Long = -1L): Unit = {
    if (batchId >= 0 && batchId <= readStats(spark, dir).lastBatch) return
    val removals = changes.filter(col("op").isin("update", "delete"))
      .select(col(idCol), col("text_before").as("__t"))
    if (!removals.isEmpty) removeDocs(spark, dir, removals, idCol, "__t")
    val additions = changes.filter(col("op").isin("insert", "update"))
      .select(col(idCol), col("text_after").as("__t"))
    if (!additions.isEmpty) appendDocs(spark, dir, additions, idCol, "__t")
    if (batchId >= 0) {
      // stamp the fence even when one phase was empty (or both — an
      // empty trigger must not leave its id replayable)
      val st = readStats(spark, dir)
      if (batchId > st.lastBatch)
        writeStats(spark, dir, st.n, st.sumDl, st.numBuckets, batchId)
    }
  }

  /** BM25 top-k from the stored index; identical results to
    * [[TextAnalytics.bm25Search]] over the indexed corpus (asserted in
    * OpsSpec; the driver oracle replays the same SQL for both). */
  def bm25SearchIndexed(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25SearchIndexed needs at least one term")
    val stats = spark.read.parquet(s"$dir/stats").collect().head
    val (n, avgdl, numBuckets) =
      (stats.getDouble(0), stats.getDouble(1), stats.getInt(2))
    // bucket the query terms with the SAME expression as the build side
    // (a driver-side reimplementation could drift from Spark's md5)
    import spark.implicits._
    val termBuckets = terms.toDF("t")
      .select(pmod(termHash(col("t")), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // static partition pruning: only the query terms' buckets are read
    val p = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(termBuckets: _*) && col("term").isin(terms: _*))
    // df per term over the pruned lists (exact: one row per (term, doc))
    val dfByTerm = p.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tfCols = terms.indices.map(i =>
      sum(when(col("term") === terms(i), col("tf")).otherwise(lit(0L)))
        .cast("double").as(s"__tf$i"))
    val byDoc = p.groupBy(col("doc_id"), col("dl")).agg(tfCols.head, tfCols.tail: _*)
    val dl = col("dl").cast("double")
    // the scan path's score, term by term in the same fold order
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val dfT = lit(dfByTerm.getOrElse(terms(i), 0.0))
      log((lit(n) - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0)) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    byDoc.withColumn("bm25", round(score, 6))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("doc_id"), col("bm25"))
  }
}
