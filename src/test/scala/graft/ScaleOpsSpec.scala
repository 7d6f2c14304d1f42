package graft

import graft.ops.{Salting, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Scale-path machinery: stored IVF partition pruning, salted joins/aggs. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stored IVF: results == in-memory IVF; scan prunes to probed partitions") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    SimilaritySearch.ivfWrite(vecs, dir, "embedding", dim = 8, numPlanes = 4)

    val q = Array.fill(8)(0.3)
    val stored = SimilaritySearch.ivfTopKStored(spark, dir, "vec_id", "embedding", q,
      k = 5, nProbe = 3)
    val inMem = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", 8, q,
      k = 5, numPlanes = 4, nProbe = 3)
    assert(stored.select("vec_id").as[Long].collect().toSeq ==
      inMem.select("vec_id").as[Long].collect().toSeq)

    // pruning is static: the scan's partition filter names `bucket`,
    // and the files read are only the probed buckets' directories
    val scanText = stored.queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") && scanText.contains("bucket"),
      s"expected partition filters on bucket in:\n$scanText")

    // full probe == brute force on the stored layout
    val all = SimilaritySearch.ivfTopKStored(spark, dir, "vec_id", "embedding", q,
      k = 5, nProbe = 16)
    val brute = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
    assert(all.select("vec_id").as[Long].collect().toSeq ==
      brute.select("vec_id").as[Long].collect().toSeq)
  }

  test("stored filtered IVF: sidecar counts == in-memory counting pass; scan prunes; upsert maintains stats") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i =>
        (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("ivf_filt").toString
    SimilaritySearch.ivfWrite(vecs, dir, "embedding", dim = 8, numPlanes = 4)
    SimilaritySearch.ivfWriteStats(spark, dir, Seq("label"))

    val q = Array.fill(8)(0.3)
    def stored() = SimilaritySearch.ivfTopKFilteredStored(spark, dir,
      "vec_id", "embedding", q, k = 5, "label", "1", nProbeInit = 2)
    def inMem(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.ivfTopKFiltered(df, "vec_id", "embedding", 8, q,
        k = 5, col("label") === 1, nProbeInit = 2, numPlanes = 4)
    // identical probe arithmetic, identical rows — the sidecar only
    // changes WHERE the per-bucket filtered counts come from
    assert(stored().select("vec_id").as[Long].collect().toSeq ==
      inMem(vecs).select("vec_id").as[Long].collect().toSeq)
    // never silently < k when the predicate has ≥ k survivors anywhere
    assert(stored().count() == 5)
    // static partition pruning: only probed buckets' files are read
    val scanText = stored().queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") && scanText.contains("bucket"),
      s"expected partition filters on bucket in:\n$scanText")

    // upsert: replaced ids (some changing label AND bucket) + new ids;
    // the maintained sidecar must equal a from-scratch counting pass
    val upd = (190L to 210L).map(i =>
        (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), ((i + 1) % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    SimilaritySearch.ivfUpsert(spark, dir, upd, "vec_id", "embedding",
      dim = 8, numPlanes = 4)
    val after = vecs.filter(col("vec_id") < 190).unionByName(upd)
    assert(stored().select("vec_id").as[Long].collect().toSeq ==
      inMem(after).select("vec_id").as[Long].collect().toSeq)
    // sidecar equals a full rebuild, row for row
    val maintained = spark.read.parquet(s"$dir/stats")
      .orderBy("bucket", "col_name", "value").collect().toSeq
    SimilaritySearch.ivfWriteStats(spark, dir, Seq("label"))
    val rebuilt = spark.read.parquet(s"$dir/stats")
      .orderBy("bucket", "col_name", "value").collect().toSeq
    assert(maintained == rebuilt)
  }

  test("stored IVF-PQ: model JSON round-trips exactly; scan prunes to probed cells; == in-memory") {
    // 4 axis clusters (the OpsSpec IVF-PQ corpus) so coarse cells are
    // meaningful and the pruning assertion reads a strict subset
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(8)(d =>
        (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val model = ops.ProductQuantization.ivfPqTrain(vecs, "vec_id", "embedding",
      dim = 8, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    ops.ProductQuantization.ivfPqWrite(vecs, dir, "vec_id", "embedding", model)
    // shortest-round-trip doubles: the reread model is BIT-identical,
    // so stored and in-memory queries replay the same arithmetic
    assert(ops.ProductQuantization.readModel(dir) == model)

    val q = Array.tabulate(8)(d => if (d == 2) 1.0 else 0.0)
    val stored = ops.ProductQuantization.ivfPqTopKStored(spark, dir, vecs,
      "vec_id", "embedding", q, k = 5, nProbe = 1, candidates = 50)
    val inMem = ops.ProductQuantization.ivfPqTopK(
      ops.ProductQuantization.ivfPqEncode(vecs, "vec_id", "embedding", model),
      vecs, "vec_id", "embedding", model, q, 5, nProbe = 1, candidates = 50)
    assert(stored.collect().toSeq == inMem.collect().toSeq)
    val scanText = stored.queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") && scanText.contains("bucket"),
      s"expected partition filters on bucket in:\n$scanText")
  }

  test("stored filtered IVF-PQ: sidecar-sized probe == predicate ground truth; maintenance invalidates stats") {
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(8)(d =>
        (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat),
        (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val model = ops.ProductQuantization.ivfPqTrain(vecs, "vec_id", "embedding",
      dim = 8, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_filt").toString
    ops.ProductQuantization.ivfPqWrite(vecs, dir, "vec_id", "embedding", model)
    ops.ProductQuantization.ivfPqWriteStats(spark, dir, vecs, "vec_id", Seq("label"))

    val q = Array.tabulate(8)(d => if (d == 2) 1.0 else 0.0)
    val got = ops.ProductQuantization.ivfPqTopKFilteredStored(spark, dir, vecs,
      "vec_id", "embedding", q, k = 5, "label", "1",
      nProbeInit = 1, candidates = 200)
    // k results, every one passing the predicate, exact-reranked:
    // with a full candidate pool the result equals brute force over
    // the probed cells' label-1 rows — cross-check top-1 discipline
    val rows = got.select("vec_id").as[Long].collect().toSeq
    assert(rows.size == 5)
    val labels = vecs.filter($"vec_id".isin(rows: _*)).select("label")
      .as[Int].collect().toSet
    assert(labels == Set(1))
    // scan pruning on the codes store
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition filters on bucket in:\n$plan")
    // maintenance invalidates the sidecar (stale counts could
    // under-size a probe); rebuild restores it
    ops.ProductQuantization.ivfPqRemove(spark, dir,
      Seq(0L, 1L).toDF("vec_id"), "vec_id")
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir, "stats")))
    ops.ProductQuantization.ivfPqWriteStats(spark, dir,
      vecs.filter($"vec_id" >= 2), "vec_id", Seq("label"))
    val after = ops.ProductQuantization.ivfPqTopKFilteredStored(spark, dir,
      vecs.filter($"vec_id" >= 2), "vec_id", "embedding", q, k = 5,
      "label", "1", nProbeInit = 1, candidates = 200)
      .select("vec_id").as[Long].collect().toSeq
    assert(after.size == 5 && !after.contains(1L))
  }

  test("IVF-PQ sidecar: stage-1 scan partition-pruned; full pool == exact search chain") {
    val rnd = new scala.util.Random(11)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_db").toString
    val chunks = (1L to 100L).map { i =>
      (i, s"text $i", Array.fill(8)(rnd.nextFloat() * 2 - 1),
        s"/f$i.txt", ".txt", s"f$i.txt", "2026-01-01", "2026-01-01", s"h$i", "document",
        Option.empty[Int])
    }.toDF("id", "text", "vector", "file_path", "file_type", "file_name",
      "creation_date", "modification_date", "hash", "document_type", "page_number")
    chunks.write.parquet(s"$dir/chunks")
    graft.store.VectorStore.writeManifest(dir,
      graft.model.DbManifest("cosine", 8, "float32", "det", 100, 0))
    graft.store.VectorStore.writeIvfPq(spark, dir,
      kCoarse = 8, m = 4, ksub = 16, coarseIters = 2, pqIters = 1)
    val qv = Array.fill(8)(0.25f)
    val result = graft.store.VectorStore.searchIvfPq(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0), nProbe = 2, candidates = 20)
    // the codes scan must carry a static partition filter on the cell
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition filters on bucket in:\n$plan")
    // full probe + full candidate pool == the exact search chain
    val exact = graft.search.VectorSearch.searchChunks(
      spark.read.parquet(s"$dir/chunks"), qv, "cosine",
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    val full = graft.store.VectorStore.searchIvfPq(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0),
      nProbe = 8, candidates = 100)
      .select("id").as[Long].collect().toSeq
    assert(full == exact)
  }

  test("stored IVF-PQ upsert: == full re-encode rebuild; moved ids leave their old cell; compaction") {
    val mk = (i: Long, c: Int) => Array.tabulate(8)(d =>
      (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat)
    val vecs = (0L until 200L).map(i => (i, mk(i, (i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val model = ops.ProductQuantization.ivfPqTrain(vecs, "vec_id", "embedding",
      dim = 8, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_upsert").toString
    ops.ProductQuantization.ivfPqWrite(vecs, dir, "vec_id", "embedding", model)
    // batch: id 0 MOVES cluster (0 -> 1), id 7 re-embeds in place,
    // ids 500/501 are new inserts into two different clusters
    val batch = Seq((0L, mk(0, 1)), (7L, mk(7, 3)), (500L, mk(500, 0)),
        (501L, mk(501, 2)))
      .toDF("vec_id", "embedding")
    ops.ProductQuantization.ivfPqUpsert(spark, dir, batch, "vec_id", "embedding")
    val updatedCorpus = vecs.join(batch.select($"vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(batch)
    val rebuildDir = java.nio.file.Files.createTempDirectory("ivfpq_rebuild").toString
    ops.ProductQuantization.ivfPqWrite(updatedCorpus, rebuildDir, "vec_id", "embedding", model)
    def dump(d: String) = spark.read.parquet(s"$d/codes")
      .select($"vec_id", $"pq_code", $"bucket".cast("int"))
      .as[(Long, Seq[Byte], Int)].collect().toSet
    assert(dump(dir) == dump(rebuildDir))
    // the moved id appears ONCE, in its new cell
    assert(dump(dir).count(_._1 == 0L) == 1)
    // upsert appended files; compaction brings every cell to one file
    ops.ProductQuantization.ivfPqCompact(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val cells = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val n = fs.listStatus(c.getPath).count(_.getPath.getName.endsWith(".parquet"))
      assert(n == 1, s"${c.getPath.getName} has $n files after compaction")
    }
    assert(dump(dir) == dump(rebuildDir)) // compaction changes nothing

    // deletion maintenance: remove two ids (one the earlier insert) —
    // codes must equal the corpus-minus-victims re-encode; a cell
    // emptied of all codes loses its partition dir; replay is a no-op
    val victims = Seq(7L, 500L).toDF("vec_id")
    ops.ProductQuantization.ivfPqRemove(spark, dir, victims, "vec_id")
    val prunedDir = java.nio.file.Files.createTempDirectory("ivfpq_pruned").toString
    ops.ProductQuantization.ivfPqWrite(
      updatedCorpus.join(victims, Seq("vec_id"), "left_anti"),
      prunedDir, "vec_id", "embedding", model)
    assert(dump(dir) == dump(prunedDir), "removal must equal the pruned re-encode")
    ops.ProductQuantization.ivfPqRemove(spark, dir, victims, "vec_id")
    assert(dump(dir) == dump(prunedDir), "replayed removal must change nothing")
    // emptied-cell partition-dir drop: delete EVERY remaining id and
    // check the cell dirs are gone
    ops.ProductQuantization.ivfPqRemove(spark, dir,
      updatedCorpus.select($"vec_id"), "vec_id")
    val remainingCells = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    assert(remainingCells.isEmpty,
      s"cells must vanish with their last code: ${remainingCells.map(_.getPath.getName).toSeq}")
  }

  test("quantized sidecar stage 1 scans only (id, qvec) — column-pruned") {
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("graft_quant_db").toString
    val chunks = (1L to 100L).map { i =>
      (i, s"text $i", Array.fill(8)(rnd.nextFloat() * 2 - 1),
        s"/f$i.txt", ".txt", s"f$i.txt", "2026-01-01", "2026-01-01", s"h$i", "document",
        Option.empty[Int])
    }.toDF("id", "text", "vector", "file_path", "file_type", "file_name",
      "creation_date", "modification_date", "hash", "document_type", "page_number")
    chunks.write.parquet(s"$dir/chunks")
    graft.store.VectorStore.writeManifest(dir,
      graft.model.DbManifest("cosine", 8, "float32", "det", 100, 0))
    graft.store.VectorStore.writeQuantized(spark, dir)
    val qv = Array.fill(8)(0.25f)
    val result = graft.store.VectorStore.searchQuantized(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 20)
    // stage-1 scan of chunks_q must read ONLY id + qvec (no text/vector)
    val plan = result.queryExecution.executedPlan.toString
    val qScanSchema = plan.linesIterator
      .filter(l => l.contains("chunks_q") && l.contains("ReadSchema")).mkString
    assert(qScanSchema.contains("id") && qScanSchema.contains("qvec"),
      s"chunks_q scan not found in:\n$plan")
    assert(!qScanSchema.contains("text") && !qScanSchema.contains("vector"))
    // and with a full candidate pool the result equals exact search
    val exact = graft.search.VectorSearch.searchChunks(
      spark.read.parquet(s"$dir/chunks"), qv, "cosine",
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    val full = graft.store.VectorStore.searchQuantized(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 100)
      .select("id").as[Long].collect().toSeq
    assert(full == exact)
  }

  test("binary sidecar stage 1 scans only (id, bvec) — column-pruned; full pool == exact") {
    val rnd = new scala.util.Random(11)
    val dir = java.nio.file.Files.createTempDirectory("graft_bq_db").toString
    val chunks = (1L to 100L).map { i =>
      (i, s"text $i", Array.fill(8)(rnd.nextFloat() * 2 - 1),
        s"/f$i.txt", ".txt", s"f$i.txt", "2026-01-01", "2026-01-01", s"h$i", "document",
        Option.empty[Int])
    }.toDF("id", "text", "vector", "file_path", "file_type", "file_name",
      "creation_date", "modification_date", "hash", "document_type", "page_number")
    chunks.write.parquet(s"$dir/chunks")
    graft.store.VectorStore.writeManifest(dir,
      graft.model.DbManifest("cosine", 8, "float32", "det", 100, 0))
    graft.store.VectorStore.writeBinary(spark, dir)
    val qv = Array.fill(8)(0.25f)
    val result = graft.store.VectorStore.searchBinary(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 20)
    // stage-1 scan of chunks_b must read ONLY id + bvec (no text/vector)
    val plan = result.queryExecution.executedPlan.toString
    val bScanSchema = plan.linesIterator
      .filter(l => l.contains("chunks_b") && l.contains("ReadSchema")).mkString
    assert(bScanSchema.contains("id") && bScanSchema.contains("bvec"),
      s"chunks_b scan not found in:\n$plan")
    assert(!bScanSchema.contains("text") && !bScanSchema.contains("vector"))
    // full candidate pool degrades gracefully to the exact search
    val exact = graft.search.VectorSearch.searchChunks(
      spark.read.parquet(s"$dir/chunks"), qv, "cosine",
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0))
      .select("id").as[Long].collect().toSeq
    val full = graft.store.VectorStore.searchBinary(spark, dir, qv,
      graft.search.SearchOptions(k = 5, scoreThreshold = 0.0), candidates = 100)
      .select("id").as[Long].collect().toSeq
    assert(full == exact)
  }

  test("heap-aggregate batch top-k == window batch top-k, all partitionings") {
    val rnd = new scala.util.Random(13)
    val vecs = (1L to 300L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" <= 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val a = SimilaritySearch.bruteForceTopKBatchAgg(df, "vec_id", "embedding",
          queries, "query_id", "qv", 7)
        .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Long)].collect().sorted.toSeq
      val w = SimilaritySearch.bruteForceTopKBatchWindow(df, "vec_id", "embedding",
          queries, "query_id", "qv", 7)
        .select($"query_id", $"vec_id", $"rank".cast("long")).as[(Long, Long, Long)]
        .collect().sorted.toSeq
      assert(a == w)
    }
    run(vecs)                   // default partitioning
    run(vecs.repartition(17))   // many partitions: partial buffers merge
    run(vecs.coalesce(1))       // single partition: no merge path
    // the DEFAULT batch entry point runs the aggregate shape: no Window
    // node, no full-scored-row exchange — the only hashpartitioning
    // exchange sits ABOVE the partial TopKHits aggregation
    val dPlan = SimilaritySearch.bruteForceTopKBatch(vecs.repartition(17),
      "vec_id", "embedding", queries, "query_id", "qv", 7)
      .queryExecution.executedPlan.toString
    assert(!dPlan.contains("Window"),
      s"default batch top-k must not window-rank scored rows:\n$dPlan")
    assert(dPlan.contains("partial_top_k_hits"),
      s"default batch top-k must map-side-prune via partial TopKHits:\n$dPlan")
  }

  test("searchBatchAgg == searchBatch through the full post-filter chain") {
    import graft.search.{SearchOptions, VectorSearch}
    val rnd = new scala.util.Random(23)
    val chunks = (1L to 150L).map { i =>
      (i, s"chunk text number $i ${if (i % 3 == 0) "needle" else "hay"}",
        if (i % 2 == 0) "document" else "image",
        Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "text", "document_type", "vector")
    val queries = (0L to 2L).map(qi =>
      (qi, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("query_id", "query_vector")
    val opts = SearchOptions(k = 10, scoreThreshold = 0.0,
      searchTerm = "needle", documentTypes = "document")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"id", round($"distance", 9), round($"similarity_score", 9))
        .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    val window = proj(VectorSearch.searchBatchWindow(chunks, queries, "cosine", opts))
    val agg = proj(VectorSearch.searchBatch(chunks, queries, "cosine", opts))
    assert(agg == window && agg.nonEmpty)
  }

  test("TopKBuffer: tie-break by id, serialization round-trip") {
    val b = new graft.functions.TopKBuffer(3)
    b.insert(0.5, 10); b.insert(0.5, 2); b.insert(0.9, 7); b.insert(0.1, 1); b.insert(0.5, 1)
    // best-first: (0.9,7), then 0.5s by id asc: 1, 2
    assert(b.size == 3)
    assert((b.scores.take(3).toSeq, b.ids.take(3).toSeq) ==
      (Seq(0.9, 0.5, 0.5), Seq(7L, 1L, 2L)))
  }

  test("salted join == plain join, exactly, with a hot key") {
    val large = ((1 to 3000).map(i => (1L, i.toLong)) ++ // hot key 1
      (1 to 300).map(i => (i.toLong % 7 + 2, i.toLong + 10000))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (5L, "c")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Salting.saltedJoin(large, small, "k", factor = 8,
        spreadCols = Seq("payload"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 3000)
  }

  test("bucketed tables co-locate: equi-join plans with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (1L to 500L).map(i => (i, s"chunk text $i")).toDF("id", "text")
        .write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_chunks")
      (1L to 500L).map(i => (i, s"/src/doc$i.txt")).toDF("id", "file_path")
        .write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_docs")
      val joined = spark.table("bkt_chunks").join(spark.table("bkt_docs"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_chunks")
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
    }
  }

  test("GraftExtensions registers the SQL surface at session build time") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      assert(s2.sql("SELECT cosine_similarity(array(3.0D, 0.0D), array(7.0D, 0.0D)) AS c")
        .head.getDouble(0) == 1.0)
      assert(s2.sql("SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS n")
        .head.getLong(0) == 2L)
      assert(s2.sql("SELECT lsh_bucket(array(1.0D, 0.5D), 4) AS b").head.getLong(0) ==
        graft.ops.SimilaritySearch.lshBucket(Array(1.0, 0.5), 4))
      val topk = s2.sql(
        """SELECT top_k_hits(s, i, 2) AS hits FROM VALUES
          | (0.9D, 1L), (0.1D, 2L), (0.5D, 3L) AS t(s, i)""".stripMargin)
        .selectExpr("transform(hits, h -> h.id) AS ids").head.getSeq[Long](0)
      assert(topk == Seq(1L, 3L))
      val mg = s2.sql(
        """SELECT misra_gries(w, 2) AS mg FROM VALUES
          | ('a'), ('a'), ('a'), ('b'), ('c') AS t(w)""".stripMargin)
        .selectExpr("transform(mg, e -> e.item) AS items").head.getSeq[String](0)
      assert(mg.contains("a"))
      // quantile sketch from pure SQL: n <= k so the summary is exact
      val qs = s2.sql(
        """SELECT quantile_sketch(x, 16) AS qs FROM VALUES
          | (1.0D), (2.0D), (3.0D), (4.0D) AS t(x)""".stripMargin)
        .selectExpr("qs.n", "qs.err_bound").head
      assert(qs.getLong(0) == 4L && qs.getLong(1) == 0L)
      // aho-corasick from pure SQL: pattern list is a foldable array literal
      val mm = s2.sql(
        """SELECT multi_match_total(t, array('he', 'she', 'aa')) AS n,
          |       multi_match_counts(t, array('he', 'she', 'aa')) AS c
          |FROM VALUES ('ushers aaaa') AS v(t)""".stripMargin).head
      assert(mm.getLong(0) == 4L, s"ushers aaaa: he+she+2*aa, got ${mm.getLong(0)}")
      assert(mm.getSeq[Long](1) == Seq(1L, 1L, 2L))
      // unicode + compression signals from pure SQL (combining acute
      // via its UTF-8 bytes — Spark's chr() is mod-256 ASCII, not a
      // codepoint constructor)
      assert(s2.sql("SELECT nfc_normalize('cafe' || decode(unhex('CC81'), 'UTF-8')) AS n")
        .head.getString(0) == "café")
      assert(s2.sql("SELECT deflate_length(repeat('ab', 100), 6) < 20").head.getBoolean(0))
      // round-8 sketch family from pure SQL
      val cm = s2.sql(
        """SELECT count_min(w, 5, 64) AS cm FROM VALUES
          | ('x'), ('x'), ('y') AS t(w)""".stripMargin)
        .selectExpr("cm.total").head
      assert(cm.getLong(0) == 3L)
      val gm = s2.sql(
        """SELECT gram_matrix(v, 2) AS g FROM VALUES
          | (array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)""".stripMargin)
        .selectExpr("g.n", "g.s").head
      assert(gm.getLong(0) == 2L && gm.getSeq[Long](1) == Seq(4000000L, 6000000L))
      val bl = s2.sql(
        """SELECT bloom_sketch(w, 256, 3) AS b FROM VALUES
          | ('alpha'), ('beta') AS t(w)""".stripMargin)
        .selectExpr("b.n").head
      assert(bl.getLong(0) == 2L)
      val kmv = s2.sql(
        """SELECT kmv_sketch(w, 16) AS s FROM VALUES
          | ('a'), ('b'), ('a') AS t(w)""".stripMargin)
        .selectExpr("size(s)").head
      assert(kmv.getInt(0) == 2)

      // graft_search TVF: the whole O2→O4→P4-P6 chain from pure SQL,
      // equal to the programmatic VectorSearch.search row for row
      val dbDir = java.nio.file.Files.createTempDirectory("graft_sql_db").toString
      val emb = graft.embed.DeterministicEmbedder(dim = 16)
      import s2.implicits._
      val texts = (1L to 40L).map(i =>
        (i, s"chunk text number $i about topic ${i % 7}",
          s"/f$i.txt", ".txt", s"f$i.txt", "2026-01-01", "2026-01-01",
          s"h$i", "document", Option.empty[Int]))
        .toDF("id", "text", "file_path", "file_type", "file_name",
          "creation_date", "modification_date", "hash", "document_type",
          "page_number")
      emb.embed(texts, "text")
        .select("id", "text", "vector", "file_path", "file_type",
          "file_name", "creation_date", "modification_date", "hash",
          "document_type", "page_number")
        .write.parquet(s"$dbDir/chunks")
      graft.store.VectorStore.writeManifest(dbDir,
        graft.model.DbManifest("cosine", 16, "float32",
          "DeterministicEmbedder", 40, 0))
      val sqlRows = s2.sql(
        s"""SELECT id, round(distance, 6) AS d, round(similarity_score, 6) AS s
           |FROM graft_search('$dbDir', 'topic 3 text', 5, 0.0)""".stripMargin)
        .as[(Long, Double, Double)].collect().toSeq
      val apiRows = graft.search.VectorSearch.search(s2, dbDir,
          "topic 3 text", emb, graft.search.SearchOptions(k = 5, scoreThreshold = 0.0))
        .selectExpr("id", "round(distance, 6)", "round(similarity_score, 6)")
        .as[(Long, Double, Double)].collect().toSeq
      assert(sqlRows == apiRows && sqlRows.size == 5)
      // post-filters ride through the TVF arguments (P4/P5)
      val filtered = s2.sql(
        s"""SELECT id FROM graft_search('$dbDir', 'topic 3 text', 5, 0.0,
           | 'number 3')""".stripMargin).as[Long].collect().toSeq
      assert(filtered.nonEmpty &&
        filtered.toSet.subsetOf(sqlRows.map(_._1).toSet))

      // --- edge semantics: SQL answers must equal the programmatic
      // API's — no silent wrong-answer path from SQL (r9 verdict #7)
      def api(o: graft.search.SearchOptions): Seq[Long] =
        graft.search.VectorSearch.search(s2, dbDir, "topic 3 text", emb, o)
          .select("id").as[Long].collect().toSeq
      // k = 0: empty both ways (limit 0, nothing to score)
      assert(s2.sql(s"SELECT id FROM graft_search('$dbDir', 'topic 3 text', 0, 0.0)")
        .count() == 0L)
      assert(api(graft.search.SearchOptions(k = 0, scoreThreshold = 0.0)).isEmpty)
      // threshold > 1: similarity is clipped to [0,1], so the P4
      // filter removes every hit — empty both ways, never an error
      assert(s2.sql(s"SELECT id FROM graft_search('$dbDir', 'topic 3 text', 5, 1.5)")
        .count() == 0L)
      assert(api(graft.search.SearchOptions(k = 5, scoreThreshold = 1.5)).isEmpty)
      // NULL keyword term = omitted (the programmatic no-op predicate):
      // same rows as the unfiltered call
      assert(s2.sql(
        s"""SELECT id FROM graft_search('$dbDir', 'topic 3 text', 5, 0.0,
           | CAST(NULL AS STRING))""".stripMargin)
        .as[Long].collect().toSeq == sqlRows.map(_._1))
      // keyword matching nothing: empty both ways (no backfill — O5)
      assert(s2.sql(
        s"""SELECT id FROM graft_search('$dbDir', 'topic 3 text', 5, 0.0,
           | 'zz-no-such-term')""".stripMargin).count() == 0L)
      assert(api(graft.search.SearchOptions(k = 5, scoreThreshold = 0.0,
        searchTerm = "zz-no-such-term")).isEmpty)
      // unknown db: the SAME missing-manifest error as the programmatic
      // path, surfaced at analysis time with the path in the message
      val sqlErr = intercept[Exception] {
        s2.sql("SELECT id FROM graft_search('/no/such/db', 'q', 5, 0.0)").collect()
      }
      val apiErr = intercept[Exception] {
        graft.search.VectorSearch.searchSql(s2, "/no/such/db", "q")
      }
      def rootOf(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootOf(t.getCause)
      assert(rootOf(sqlErr).getClass == rootOf(apiErr).getClass &&
        rootOf(sqlErr).getMessage.contains("/no/such/db"))
      // NULL db path / query text: a named argument error, not an NPE
      val nullDb = intercept[Exception] {
        s2.sql("SELECT id FROM graft_search(CAST(NULL AS STRING), 'q')").collect()
      }
      assert(rootOf(nullDb).getMessage.contains("db path must not be NULL"))
    } finally {
      SparkSession.setDefaultSession(prev); SparkSession.setActiveSession(prev)
    }
  }

  test("round-6 op plan shapes: map-only gates, single-exchange shard, broadcast mixing") {
    val docs = (1L to 500L).map(i => (i, s"some text body number $i", if (i % 10 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")

    // blocklist scoring is row-local: ZERO exchanges
    val bl = graft.ops.TextAnalytics.blocklistScore(docs, "doc_id", "text", Seq("text"))
    assert(!bl.queryExecution.executedPlan.toString.contains("Exchange"),
      "blocklistScore must be map-only")

    // shard assign: exactly ONE shuffle exchange (the shard partition),
    // per-shard sort local to it
    val sa = graft.ops.TextAnalytics.shardAssign(docs, "doc_id", 8)
    val saPlan = sa.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(saPlan).size == 1 &&
      !saPlan.contains("Exchange rangepartitioning"),
      s"shardAssign must shuffle once on shard, never globally sort:\n$saPlan")

    // temperature mixing: corpus rows join the tiny rate table via
    // BROADCAST — data rows are never shuffled
    val mt = graft.ops.TextAnalytics.mixTemperature(docs, "doc_id", "lang", 2.0, 0.5)
    val mtPlan = mt.queryExecution.executedPlan.toString
    assert(mtPlan.contains("BroadcastHashJoin") && !mtPlan.contains("SortMergeJoin"),
      s"mixTemperature membership must broadcast the rate table:\n$mtPlan")

    // semantic dedup's pair phase: co-partitioned equi-join on the
    // cluster id, never a cartesian
    val vecs = (1L to 60L).map(i => (i, Array.tabulate(4)(d => math.sin(i + d).toFloat)))
      .toDF("vec_id", "embedding")
    val sd = graft.ops.Dedup.semanticDedup(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 1, threshold = 0.9)
    val sdPlan = sd.queryExecution.executedPlan.toString
    assert(!sdPlan.contains("CartesianProduct") &&
      !sdPlan.contains("BroadcastNestedLoopJoin"),
      s"semanticDedup must stay an equi-join on cluster:\n$sdPlan")

    // sharded SemDeDup (the at-scale path): Lloyd assignment must be
    // a BROADCAST join of the (2^bits * k)-row centroid table on the
    // shard key — never a cartesian, never a shuffle of vector rows
    // against centroids — and the pair phase stays an equi-join
    val sd2 = graft.ops.Dedup.semanticDedup(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, threshold = 0.9, shardBits = 3)
    val sd2Plan = sd2.queryExecution.executedPlan.toString
    assert(!sd2Plan.contains("CartesianProduct") &&
      !sd2Plan.contains("BroadcastNestedLoopJoin"),
      s"sharded semanticDedup must stay equi-joins:\n$sd2Plan")
    assert(sd2Plan.contains("BroadcastHashJoin"),
      s"sharded Lloyd assignment must broadcast the centroid table:\n$sd2Plan")
  }

  test("round-6 batch-2 plan shapes: broadcast stats, no global sorts, one agg shuffle") {
    val docs = (1L to 400L).map(i =>
      (i, s"alpha beta gamma delta word$i tail", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")
    val events = (1L to 2000L).map(i =>
      (i, i % 97, s"t${i % 5}", i * 1000L, (i % 50) / 10.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")

    // PMI: the vocabulary-sized unigram table and 1-row totals all
    // broadcast onto the bigram counts — no sort-merge join anywhere
    val pmi = graft.ops.TextAnalytics.pmiCollocations(docs, "text", minCount = 2, k = 10)
    val pmiPlan = pmi.queryExecution.executedPlan.toString
    assert(pmiPlan.contains("BroadcastHashJoin") && !pmiPlan.contains("SortMergeJoin"),
      s"pmiCollocations must broadcast the unigram side:\n$pmiPlan")

    // time-decay: the 1-row max(ts) broadcasts; the per-user rollup is
    // the ONLY hash exchange; nothing ever range-partitions (sorts)
    val dv = graft.ops.EventAnalytics.timeDecayedValue(
      events, "user_id", "ts", "value", halfLifeUnits = 1000000L)
    val dvPlan = dv.queryExecution.executedPlan.toString
    assert(!dvPlan.contains("Exchange rangepartitioning") &&
      !dvPlan.contains("SortMergeJoin"),
      s"timeDecayedValue must broadcast max(ts), one agg shuffle:\n$dvPlan")

    // first-touch: min(struct) partial-aggregates — a plain two-level
    // hash aggregate chain, never a per-user window sort
    val ft = graft.ops.EventAnalytics.firstTouchAttribution(
      events, "user_id", "event_type", "ts", "event_id", "t0")
    val ftPlan = ft.queryExecution.executedPlan.toString
    assert(!ftPlan.contains("Window") && !ftPlan.contains("Exchange rangepartitioning"),
      s"firstTouchAttribution must be windowless partial aggregation:\n$ftPlan")

    // centroid outliers: centroid table broadcasts; the only sorts are
    // the window-local ones on (group, shard) / (group) keys — never a
    // global (range-partitioned, single-ordering) sort
    val vecs = (1L to 200L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 7 + d).toFloat), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val co = graft.ops.Clustering.centroidOutliers(vecs, "vec_id", "embedding",
      "label", dim = 4, k = 2, shards = 8)
    val coPlan = co.queryExecution.executedPlan.toString
    assert(coPlan.contains("BroadcastHashJoin") &&
      !coPlan.contains("Exchange rangepartitioning"),
      s"centroidOutliers must broadcast centroids and avoid global sorts:\n$coPlan")
  }

  test("round-7 op plan shapes: DSIR broadcast ratio, MG partial agg, hard-negative bounded exchange") {
    val docs = (1L to 400L).map(i =>
      (i, s"alpha beta gamma delta word$i tail", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")

    // DSIR: the ≤B-row log-ratio table must BROADCAST onto the word
    // scan — never a sort-merge join against per-word rows — and the
    // only hash exchanges are the two bucket rollups + per-doc sum
    val dw = graft.ops.TextAnalytics.dsirWeights(docs,
      docs.filter($"lang" === "en"), "doc_id", "text", buckets = 256)
    val dwPlan = dw.queryExecution.executedPlan.toString
    assert(dwPlan.contains("BroadcastHashJoin") && !dwPlan.contains("SortMergeJoin"),
      s"dsirWeights must broadcast the bucket ratio table:\n$dwPlan")

    // Misra-Gries: partial_misra_gries before the exchange — each task
    // ships ONE bounded buffer, not its word rows
    val words = docs.select(explode(split($"text", " ")).as("w"))
    val mg = words.agg(graft.functions.MgFunctions.misraGries($"w", 16).as("mg"))
    val mgPlan = mg.queryExecution.executedPlan.toString
    assert(mgPlan.contains("partial_misra_gries"),
      s"MG must partial-aggregate map-side:\n$mgPlan")
    assert("Exchange hashpartitioning".r.findAllIn(mgPlan).isEmpty,
      s"MG global agg exchanges a single partition, not hash buckets:\n$mgPlan")

    // hard negatives: anchors broadcast + TopKHits partial aggregate —
    // no window over the scored corpus, no rangepartition sort
    val vecs = (1L to 200L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val hn = graft.ops.SimilaritySearch.hardNegatives(vecs, "vec_id", "embedding",
      "label", vecs.filter($"vec_id" <= 3), "vec_id", "embedding", "label", k = 5)
    val hnPlan = hn.queryExecution.executedPlan.toString
    assert(hnPlan.contains("partial_top_k_hits") && !hnPlan.contains("Window") &&
      !hnPlan.contains("Exchange rangepartitioning"),
      s"hardNegatives must run the bounded heap-agg plan:\n$hnPlan")

    // fuzzy decontamination: bench side broadcast — corpus rows joined
    // map-side, never sort-merge shuffled against the bench set
    val bench = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val fd = graft.ops.Dedup.minhashDecontaminate(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 4, numHashes = 8, rowsPerBand = 2, threshold = 0.25)
    val fdPlan = fd.queryExecution.executedPlan.toString
    assert(fdPlan.contains("BroadcastHashJoin") && !fdPlan.contains("SortMergeJoin"),
      s"minhashDecontaminate must broadcast the bench side:\n$fdPlan")
  }

  test("round-7 batch-2 plan shapes: contrastive broadcast exclusions, pipeline no sort-merge") {
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.8)).toDF("id_a", "id_b", "jaccard")
    val vecs = (1L to 100L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    // contrastive mining (r14): negatives via the SIMD partial-scorer —
    // one corpus pass, bounded top_k_hits merge, pair fetch-back
    // broadcast; no cross-join row materialization, no window, no
    // sort-merge join anywhere
    val ct = graft.ops.SimilaritySearch.contrastiveTriples(pairs, vecs,
      "vec_id", "embedding")
    val ctPlan = ct.queryExecution.executedPlan.toString
    assert(ctPlan.contains("top_k_hits") && !ctPlan.contains("SortMergeJoin") &&
      !ctPlan.contains("Window") && !ctPlan.contains("CartesianProduct"),
      s"contrastiveTriples must run the SIMD partial-scorer plan:\n$ctPlan")

    // the composed pipeline: quality gates map-only, ONE sha-window
    // exchange for exact dedup, decontamination semi-join broadcast —
    // never a sort-merge join or cartesian over corpus rows
    val docs = (1L to 300L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta word$i tail piece"))
      .toDF("doc_id", "text")
    val pool = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val q = graft.ops.TextAnalytics.qualityFilter(pool, "text")
      .filter($"passes_quality").select($"doc_id", $"text")
    val ex = graft.ops.Dedup.exact(q, "doc_id", "text")
    val flagged = graft.ops.Dedup.decontaminate(ex, "doc_id", "text",
      bench, "doc_id", "text", n = 5).select($"sid".as("doc_id"))
    val clean = ex.join(broadcast(flagged), Seq("doc_id"), "left_anti")
    val split = graft.ops.TextAnalytics.hashSplit(clean, "doc_id")
      .select($"doc_id", $"split")
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"pipeline must stay broadcast + single-window shaped:\n$plan")
  }

  test("round-7 batch-4 plan shapes: maxsim single-exchange no-join, quantile partial agg, line stats no joins") {
    val vecs = (1L to 300L).map(i =>
      (i % 30, Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat)))
      .toDF("doc", "v")
    // MaxSim: one scan, |Q|-max partial aggregate, TakeOrdered — no
    // join (query tokens are literals), no window, no range sort
    val ms = graft.ops.SimilaritySearch.maxSimTopK(vecs, "doc", "v",
      Seq(Array.fill(8)(0.5), Array.fill(8)(-0.25)), 5)
    val msPlan = ms.queryExecution.executedPlan.toString
    assert(!msPlan.contains("Join") && !msPlan.contains("Window") &&
      msPlan.contains("TakeOrderedAndProject"),
      s"maxSim must be scan -> partial agg -> TakeOrdered:\n$msPlan")
    assert(msPlan.contains("partial_max") || msPlan.contains("partial_") ,
      s"maxSim per-doc maxes must partial-aggregate map-side:\n$msPlan")

    // quantile sketch: partial_quantile_sketch before the exchange —
    // one bounded buffer per task crosses, never the value rows
    val qs = vecs.select(($"doc" * 1.0).as("x"))
      .agg(graft.functions.QsFunctions.quantileSketch($"x", 64).as("qs"))
    val qsPlan = qs.queryExecution.executedPlan.toString
    assert(qsPlan.contains("partial_quantile_sketch"),
      s"quantile sketch must partial-aggregate map-side:\n$qsPlan")
    assert("Exchange hashpartitioning".r.findAllIn(qsPlan).isEmpty,
      s"global sketch agg exchanges a single partition:\n$qsPlan")

    // line stats: explode + two partial aggs keyed (doc, line) then
    // doc — no joins, no window, no global sort
    val docs = (1L to 50L).map(i => (i, s"line a\nline b\nline a")).toDF("id", "txt")
    val ls = graft.ops.TextAnalytics.lineStats(docs, "id", "txt")
    val lsPlan = ls.queryExecution.executedPlan.toString
    assert(!lsPlan.contains("Join") && !lsPlan.contains("Window") &&
      !lsPlan.contains("Exchange rangepartitioning"),
      s"lineStats must be explode + partial aggs only:\n$lsPlan")
  }

  test("round-7 batch-5 plan shapes: AC screens map-only, term stats one exchange, nfc dedup one shuffle") {
    val docs = (1L to 200L).map(i => (i, s"some words about scan merge $i"))
      .toDF("doc_id", "text")

    // phrase blocklist + canary screen: row-local walks — ZERO exchanges
    val bp = graft.ops.TextAnalytics.blocklistPhrases(docs, "doc_id", "text",
      Seq("scan merge", "absent phrase"))
    assert(!bp.queryExecution.executedPlan.toString.contains("Exchange"),
      "blocklistPhrases must be map-only")
    val ch = graft.ops.TextAnalytics.canaryHits(docs, "doc_id", "text",
      Seq("some words about scan"))
    assert(!ch.queryExecution.executedPlan.toString.contains("Exchange"),
      "canaryHits must be map-only")

    // compression screen: map-only
    val cs = graft.ops.TextAnalytics.compressionStats(docs, "doc_id", "text")
    assert(!cs.queryExecution.executedPlan.toString.contains("Exchange"),
      "compressionStats must be map-only")

    // term stats: ONE hash exchange of P-sized partials + a broadcast
    // join back to the term names — corpus rows never shuffle
    val ts = graft.ops.TextAnalytics.blocklistTermStats(docs, "text",
      Seq("scan", "merge", "words"))
    val tsPlan = ts.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(tsPlan).size == 1 &&
      tsPlan.contains("BroadcastHashJoin"),
      s"termStats must exchange only partials and broadcast names:\n$tsPlan")

    // nfc dedup: same single-shuffle window shape as exact
    val nd = graft.ops.Dedup.exactNormalized(docs, "doc_id", "text")
    val ndPlan = nd.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(ndPlan).size == 1,
      s"exactNormalized must shuffle once on the key hash:\n$ndPlan")
  }

  test("ANN recall@10 gate: defaults >= 0.9 on the clustered regime at probe scale") {
    // The promoted-from-probe recall GATE (BASELINE.md "ANN recall@10
    // vs exact"): the default ANN parameters (LSH 8 planes probe<=2,
    // IVF 64 buckets nProbe=16) must keep mean recall@10 >= 0.9 in the
    // clustered regime — the one real embedding corpora live in (the
    // uniform-random regime is the documented adversarial floor where
    // NO bucketed method can hold 0.9; it stays probe-only).
    // Scale is env-tunable: default 300k vectors keeps sbt test under
    // ~a minute; SPARK_GRAFT_RECALL_N=2000000 reproduces the full
    // probe scale (recall is structural — bucket pruning quality, not
    // corpus size — so the gate is meaningful at either N).
    val n = sys.env.getOrElse("SPARK_GRAFT_RECALL_N", "300000").toLong
    val dim = 64
    import graft.functions.VectorFunctions
    // 64-center clustered corpus, same construction as ScaleProbe:
    // id-hashed deterministic unit center + ~15% noise, renormalized
    val centerComps = (0 until dim).map(d =>
      (xxhash64(lit(d + 7919), pmod(xxhash64(col("id")), lit(64)))
        .cast("double") / lit(Long.MaxValue.toDouble)).cast("float"))
    val noiseComps = (0 until dim).map(d =>
      (xxhash64(lit(d), col("id")).cast("double") / lit(Long.MaxValue.toDouble))
        .cast("float") * lit(0.15f))
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        VectorFunctions.l2Normalize(array(
          centerComps.zip(noiseComps).map { case (c, nz) => c + nz }: _*)).as("embedding"))
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    try {
      val queries = vecs.filter($"vec_id".between(100, 109))
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val exactTop = SimilaritySearch.bruteForceTopKBatchAgg(
          vecs, "vec_id", "embedding", queries, "query_id", "qv", 10)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val qvecs = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      def meanRecall(approx: Array[Double] => org.apache.spark.sql.DataFrame): Double = {
        val rs = qvecs.map { case (qid, qv) =>
          val got = approx(qv).select("vec_id").as[Long].collect().toSet
          (got & exactTop(qid)).size / 10.0
        }
        rs.sum / rs.length
      }
      val lsh = meanRecall(qv => SimilaritySearch.lshTopK(
        vecs, "vec_id", "embedding", dim, qv, 10, numPlanes = 8, probeHamming = 2))
      assert(lsh >= 0.9, f"LSH default (8 planes, probe<=2) recall@10 $lsh%.3f < 0.9")
      val ivfDir = java.nio.file.Files.createTempDirectory("graft_recall_ivf").toString
      SimilaritySearch.ivfWrite(vecs, ivfDir, "embedding", dim, numPlanes = 6)
      val ivf = meanRecall(qv => SimilaritySearch.ivfTopKStored(
        spark, ivfDir, "vec_id", "embedding", qv, 10, nProbe = 16))
      assert(ivf >= 0.9, f"IVF default (64 buckets, nProbe=16) recall@10 $ivf%.3f < 0.9")
      // Plain PQ is a compressor, not a pruner: every member of a
      // cluster shares codes, so the approximate ranking TIES across
      // the cluster and the candidate pool must cover that tie-set
      // (here: cluster size = n/64). The gate asserts the documented
      // coupling holds — and that the small-pool configuration is the
      // job of IVF-PQ below, not plain PQ.
      val pqCb = ops.ProductQuantization.train(
        vecs.filter($"vec_id" < 50000), "vec_id", "embedding", dim,
        m = 8, ksub = 16, iters = 2)
      val tieSet = (2 * n / 64).toInt
      val pq = meanRecall(qv => ops.ProductQuantization.topK(
        vecs, "vec_id", "embedding", qv, 10, m = 8, ksub = 16, iters = 0,
        candidates = tieSet, trained = Some(pqCb)))
      assert(pq >= 0.9, f"PQ (m=8, ksub=16, cand=$tieSet) recall@10 $pq%.3f < 0.9")
      // IVF-PQ quantizes residuals against a K-MEANS coarse quantizer,
      // so within-cell structure survives compression and a SMALL
      // candidate pool (500 ≈ 0.17% of n) holds recall — the
      // production ANN shape: train once on a bounded sample, encode
      // the corpus once (m+5 bytes/vector), scan only probed cells.
      // Config measured by tools/PqProbe: kCoarse=256 cells beats
      // bigger fine codebooks at equal recall and 4× cheaper training
      // (256 cells/m=16/ksub=64 → 1.000 vs 64 cells/ksub=256 → 0.94).
      val ivfPqModel = ops.ProductQuantization.ivfPqTrain(
        vecs.filter($"vec_id" < 50000), "vec_id", "embedding", dim,
        kCoarse = 256, m = 16, ksub = 64, coarseIters = 3, pqIters = 2)
      val encoded = ops.ProductQuantization.ivfPqEncode(
          vecs, "vec_id", "embedding", ivfPqModel)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      encoded.count()
      val ivfPq = try meanRecall(qv => ops.ProductQuantization.ivfPqTopK(
        encoded, vecs, "vec_id", "embedding", ivfPqModel, qv, 10,
        nProbe = 32, candidates = 500))
      finally encoded.unpersist()
      assert(ivfPq >= 0.9, f"IVF-PQ (kC=256, nProbe=32, cand=500) recall@10 $ivfPq%.3f < 0.9")
      // Binary (sign) quantization obeys the SAME tie-set coupling as
      // plain PQ: cluster members share sign patterns (the center
      // dominates every dim's sign), so hamming TIES across the
      // cluster and the candidate pool must cover the tie set —
      // measured here: cand=500 recalls only 0.34, the tie-set pool
      // holds the gate. 8 bytes/vector scanned, no training, no
      // cells; small-pool configurations are IVF-PQ's job.
      val bq = meanRecall(qv => ops.Quantization.binaryTopK(
        vecs, "vec_id", "embedding", qv, 10, candidates = tieSet))
      assert(bq >= 0.9, f"BQ (sign bits, cand=$tieSet) recall@10 $bq%.3f < 0.9")
      info(f"recall@10 at n=$n: lsh=$lsh%.3f ivf=$ivf%.3f pq=$pq%.3f ivfpq=$ivfPq%.3f bq=$bq%.3f")
    } finally vecs.unpersist()
  }

  test("round-8 z-order: interleave bit-exact, map-only key, footer-stats pruning == full scan") {
    import graft.ops.ZOrder
    import graft.store.SnapshotLog
    // interleave matches a driver-side Morton reference bit-for-bit
    val pairs = Seq((0L, 0L), (255L, 0L), (0L, 255L), (170L, 85L), (3L, 200L))
    def morton(bx: Long, by: Long): Long =
      (0 until 8).map(b => (((bx >> b) & 1L) << (2 * b)) |
        (((by >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    val got = pairs.toDF("bx", "by")
      .select(ZOrder.interleave(Seq(col("bx"), col("by")), 8))
      .as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => morton(x, y) })

    // key derivation is map-only: zero exchanges
    val docs = (0L until 600L).map(i =>
      (i, (i * 37 % 1000) + 10, s"cat${i % 7}")).toDF("id", "x", "cat")
    val keyed = docs.select(col("id"), ZOrder.interleave(Seq(
      ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
      ZOrder.hashBucket(col("cat"), 8)), 8))
    assert(!keyed.queryExecution.executedPlan.toString.contains("Exchange"),
      "z-key derivation must be map-only")

    // cluster-write into a snapshot table → footer sidecars → pruned
    // scan skips files AND equals the full filtered scan exactly
    val dir = java.nio.file.Files.createTempDirectory("zsnap").toString
    SnapshotLog.init(ZOrder.clusterWrite(docs, Seq(
      ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
      ZOrder.hashBucket(col("cat"), 8)), bits = 8, files = 8), dir)
    val (pruned, scanned, total) = SnapshotLog.scanPruned(spark, dir, "x", 100.0, 300.0)
    assert(total == 8 && scanned < total,
      s"expected file skipping, got $scanned/$total")
    val expect = docs.filter(col("x").between(100, 300))
      .select("id").as[Long].collect().sorted.toSeq
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == expect)

    // sidecar kinds: numeric cols long, strings string
    val anyFile = SnapshotLog.readSnapshotMeta(dir, 0L).files.head
    val st = SnapshotLog.fileStats(dir, anyFile).get
    assert(st("x").kind == "long" && st("cat").kind == "string")

    // a missing sidecar is conservatively scanned, result unchanged
    val statsFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "_filestats")).iterator()
    val victim = statsFiles.next(); java.nio.file.Files.delete(victim)
    val (pruned2, scanned2, _) = SnapshotLog.scanPruned(spark, dir, "x", 100.0, 300.0)
    assert(scanned2 >= scanned)
    assert(pruned2.select("id").as[Long].collect().sorted.toSeq == expect)
  }

  test("round-8 pca: gram pass is one bounded-buffer aggregate, projection is map-only") {
    import graft.ops.Pca
    val rows = (0 until 500).map { i =>
      (i.toLong, (0 until 16).map(j =>
        (math.sin(i * 0.37 + j) * (j + 1)).toFloat).toArray)
    }.toDF("vec_id", "vec")
    val m = Pca.fit(rows.repartition(8), "vec", 16, 4)
    // projection plan: k literal dot products per row, NO exchange
    val proj = Pca.project(rows, "vec_id", "vec", m)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be map-only:\n$plan")
    // the fit's distributed side is ONE partial aggregate (gram
    // buffers merge), never a per-pair shuffle: the agg frame on the
    // same input shows a single hashpartitioning-free global agg
    val aggPlan = rows.repartition(8)
      .agg(graft.functions.GramFunctions.gramMatrix(col("vec"), 16))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(aggPlan).isEmpty,
      s"gram pass must not hash-shuffle rows:\n$aggPlan")
  }

  test("round-8 topk-window rewrite: window plan becomes heap aggregate, results identical, ineligible declines") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      import s2.implicits._
      val rows = (0L until 4000L).map(i =>
        (s"g${i % 7}", i, ((i * 37) % 1000).toDouble)).toDF("grp", "id", "score")
      rows.createOrReplaceTempView("lb")
      val q =
        """SELECT grp, id, score, rn FROM (
          |  SELECT grp, id, score, row_number() OVER
          |    (PARTITION BY grp ORDER BY score DESC, id ASC) AS rn FROM lb)
          |WHERE rn <= 3""".stripMargin
      val rewritten = s2.sql(q)
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("top_k_hits"), s"rewrite must fire:\n$opt")
      assert(!opt.contains("Window"), s"window must be gone:\n$opt")
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(phys.contains("partial_top_k_hits") || phys.contains("top_k_hits"),
        s"physical heap agg expected:\n$phys")
      // ground truth from a plain session (no extensions, real window)
      val want = spark.createDataFrame(rows.collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))))
        .toDF("grp", "id", "score")
      want.createOrReplaceTempView("lb_plain")
      val expect = spark.sql(q.replace("lb", "lb_plain"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val got = rewritten.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
      assert(got == expect, s"rewritten results must equal window results")
      // ineligible: projecting a column the heap cannot carry → no rewrite
      // round-13: payload projections now FIRE via the TopKRows carry
      // (no join-back — exact row-for-row even with duplicate ids)
      val extra = (0L until 100L).map(i =>
        (s"g${i % 3}", i, (i % 11).toDouble, s"payload$i"))
        .toDF("grp", "id", "score", "payload")
      extra.createOrReplaceTempView("lb2")
      val q2 =
        """SELECT grp, id, payload, rn FROM (
          |  SELECT *, row_number() OVER
          |    (PARTITION BY grp ORDER BY score DESC, id ASC) AS rn FROM lb2)
          |WHERE rn <= 3""".stripMargin
      val rw2 = s2.sql(q2)
      val opt2 = rw2.queryExecution.optimizedPlan.toString
      assert(opt2.contains("top_k_rows") && !opt2.contains("Window"),
        s"payload rewrite must fire via top_k_rows:\n$opt2")
      val got2 = rw2.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toSet
      val extraPlain = spark.createDataFrame(extra.collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3))))
        .toDF("grp", "id", "score", "payload")
      extraPlain.createOrReplaceTempView("lb2_plain")
      val want2 = spark.sql(q2.replace("lb2", "lb2_plain")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toSet
      assert(got2 == want2,
        s"payload rewrite rows: missing=${want2 -- got2} extra=${got2 -- want2}")

      // round-13: the withColumn(rn, …cast(long)).filter shape (the
      // Project lands UNDER the Filter, with a widening cast on rn)
      // must fire too — the real-world DataFrame form of the idiom
      val dfForm = s2.createDataFrame(extra.collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3))))
        .toDF("grp", "id", "score", "payload")
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
            .orderBy(col("score").desc, col("id").asc)).cast("long"))
        .filter(col("rn") <= 3)
        .select("grp", "id", "payload", "rn")
      val optDf = dfForm.queryExecution.optimizedPlan.toString
      assert(optDf.contains("top_k_rows") && !optDf.contains("Window"),
        s"withColumn-cast shape must fire:\n$optDf")
      val gotDf = dfForm.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(gotDf == want2.map(t => (t._1, t._2, t._3, t._4.toLong)),
        "withColumn-cast shape rows differ")

      // round-13: q4_window_rank itself gets the heap plan in an
      // extensions session
      val q4 = graft.Queries.q4WindowRank(s2, "/root/testdata/sf0.001")
      val q4opt = q4.queryExecution.optimizedPlan.toString
      assert(!q4opt.contains("Window"),
        s"q4_window_rank must take the heap plan:\n$q4opt")
      val q4want = graft.Queries.q4WindowRank(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).sorted.toSeq
      val q4got = q4.collect().map(_.toString).sorted.toSeq
      assert(q4got == q4want, "q4_window_rank heap plan rows differ")
      // ineligible: no deterministic id tie-break → no rewrite
      val q3 =
        """SELECT grp, id, score, rn FROM (
          |  SELECT grp, id, score, row_number() OVER
          |    (PARTITION BY grp ORDER BY score DESC) AS rn FROM lb)
          |WHERE rn <= 3""".stripMargin
      assert(s2.sql(q3).queryExecution.optimizedPlan.toString.contains("Window"),
        "missing tie-break must decline the rewrite")

      // round-14 (r13 ADVICE): NaN and signed-zero scores — the heap
      // must match the window's TOTAL order (Spark sorts NaN as the
      // largest double; NormalizeFloatingNumbers makes -0.0 == 0.0 in
      // sort keys), not IEEE `>` which ranks NaN below everything
      val nanRows = Seq(
        ("a", 1L, 5.0), ("a", 2L, Double.NaN), ("a", 3L, 7.0),
        ("a", 4L, Double.NaN), ("b", 5L, Double.NaN), ("b", 6L, 1.0),
        ("c", 7L, -0.0), ("c", 8L, 0.0), ("c", 9L, 2.0), ("c", 10L, -1.0))
      nanRows.toDF("grp", "id", "score").createOrReplaceTempView("lbn")
      val qn = q.replace("lb", "lbn")
      val rwN = s2.sql(qn)
      assert(rwN.queryExecution.optimizedPlan.toString.contains("top_k_hits"),
        "NaN case must still take the heap plan")
      spark.createDataFrame(nanRows).toDF("grp", "id", "score")
        .createOrReplaceTempView("lbn_plain")
      def keyN(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1),
          if (r.getDouble(2).isNaN) "NaN" else r.getDouble(2).toString,
          r.getInt(3))
      val wantN = spark.sql(qn.replace("lbn", "lbn_plain")).collect()
        .map(keyN).toSet
      val gotN = rwN.collect().map(keyN).toSet
      assert(gotN == wantN,
        s"NaN ranking: missing=${wantN -- gotN} extra=${gotN -- wantN}")
    } finally {
      SparkSession.setDefaultSession(prev); SparkSession.setActiveSession(prev)
    }
  }

  test("round-8 bloom sidecars: never false-negative, point scans equal filter, vacuum cleans") {
    import graft.store.SnapshotLog
    val dir = java.nio.file.Files.createTempDirectory("bloomsnap").toString
    val rows = (0L until 800L).map(i => (i, s"key_${i % 40}")).toDF("id", "k")
    SnapshotLog.init(rows.repartition(8, col("k")), dir)
    assert(SnapshotLog.writeBloomSidecars(spark, dir, "k") == 8)
    // idempotent: nothing left to build
    assert(SnapshotLog.writeBloomSidecars(spark, dir, "k") == 0)
    // every present key: pruned scan == full filter (no false negatives)
    for (key <- Seq("key_0", "key_17", "key_39")) {
      val (df, kept, total) = SnapshotLog.scanPrunedPoint(spark, dir, "k", key)
      assert(kept < total, s"$key must skip files: $kept of $total")
      val got = df.select("id").as[Long].collect().sorted.toSeq
      val want = rows.filter(col("k") === key)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"$key pruned scan must equal filter")
    }
    // absent key: typically prunes everything, and the result is empty
    val (none, keptNone, _) =
      SnapshotLog.scanPrunedPoint(spark, dir, "k", "no_such_key")
    assert(none.count() == 0L)
    assert(keptNone <= 1, s"absent key should bloom out (fp budget 1): $keptNone")
    // missing sidecar column: conservatively scans everything
    val (all, keptAll, totalAll) =
      SnapshotLog.scanPrunedPoint(spark, dir, "id", "5")
    assert(keptAll == totalAll)
    assert(all.count() == 1L)
    // vacuum: bloom sidecars die with their files
    val before = new java.io.File(s"$dir/_filebloom").list().length
    assert(before == 8)
    // rewrite the table so v0's files orphan and their blooms go
    val v0files = SnapshotLog.readSnapshotMeta(dir, 0L).files
    SnapshotLog.replaceFiles(spark, dir, v0files,
      rows.limit(10).toDF("id", "k"), "rewrite")
    SnapshotLog.vacuum(dir, keepVersions = 1, graceMillis = 0L) // test: no concurrent writers
    val after = new java.io.File(s"$dir/_filebloom").list().length
    assert(after < before, s"vacuum must drop orphaned blooms: $after vs $before")
  }

  test("round-8 multi-dim prune: conjunctive ranges multiply file skipping, equality holds") {
    import graft.ops.ZOrder
    import graft.store.SnapshotLog
    // two numeric dims both in the z-key: a conjunctive filter's
    // survivor set is the INTERSECTION of the per-dim survivors
    val rows = (0L until 2000L).map(i =>
      (i, (i * 37) % 1000, (i * 91) % 1000)).toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zmulti").toString
    SnapshotLog.init(ZOrder.clusterWrite(rows, Seq(
      ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
      ZOrder.fixedBucket(col("y"), 0.0, 1024.0, 8)), bits = 8, files = 16), dir)
    val (_, kx, total) = SnapshotLog.scanPruned(spark, dir, "x", 0.0, 250.0)
    val (_, ky, _) = SnapshotLog.scanPruned(spark, dir, "y", 0.0, 250.0)
    val (both, kxy, _) = SnapshotLog.scanPrunedMulti(spark, dir,
      Seq(("x", 0.0, 250.0), ("y", 0.0, 250.0)))
    assert(kx < total && ky < total, s"each dim must prune: $kx, $ky of $total")
    assert(kxy <= math.min(kx, ky),
      s"conjunction must prune at least as hard as either dim: $kxy vs $kx/$ky")
    val expect = rows.filter(col("x").between(0, 250) && col("y").between(0, 250))
      .select("id").as[Long].collect().sorted.toSeq
    assert(both.select("id").as[Long].collect().sorted.toSeq == expect)
  }

  test("round-8 z-order compact: appends erode pruning, OPTIMIZE restores disjoint ranges, no-op when clean") {
    import graft.ops.ZOrder
    import graft.store.SnapshotLog
    def zkeyOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("zkey", ZOrder.interleave(Seq(
        ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
        ZOrder.hashBucket(col("cat"), 8)), 8))
    val base = (0L until 600L).map(i =>
      (i, (i * 37 % 1000) + 10, s"cat${i % 7}")).toDF("id", "x", "cat")
    val dir = java.nio.file.Files.createTempDirectory("zcompact").toString
    SnapshotLog.init(ZOrder.clusterWrite(base, Seq(
      ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
      ZOrder.hashBucket(col("cat"), 8)), bits = 8, files = 8), dir)
    // an UNCLUSTERED append: one file spanning the whole key space
    val extra = (600L until 700L).map(i =>
      (i, (i * 53 % 1000) + 10, s"cat${i % 7}")).toDF("id", "x", "cat")
    SnapshotLog.append(zkeyOf(extra).coalesce(1), dir)
    val (_, scannedBefore, totalBefore) =
      SnapshotLog.scanPruned(spark, dir, "x", 100.0, 300.0)
    assert(totalBefore == 9)

    val v = ZOrder.compact(spark, dir)
    assert(v == 2L, s"compaction must commit one new version, got $v")
    // row preservation: exact id multiset across the rewrite
    val ids = SnapshotLog.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == (0L until 700L).toSeq)
    // per-file z-ranges pairwise disjoint after OPTIMIZE
    val snap = SnapshotLog.readSnapshotMeta(dir, v)
    val zr = snap.files.flatMap(f => SnapshotLog.fileStats(dir, f)
      .flatMap(_.get("zkey")).map(cs => (cs.min.toLong, cs.max.toLong)))
    assert(zr.size == snap.files.size, "every file must carry zkey stats")
    val sortedR = zr.sortBy(_._1)
    sortedR.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"ranges must be disjoint: $sortedR")
      case _ =>
    }
    // pruning at least as good as the pre-append clustered layout
    val (prunedAfter, scannedAfter, totalAfter) =
      SnapshotLog.scanPruned(spark, dir, "x", 100.0, 300.0)
    assert(scannedAfter < totalAfter,
      s"post-compaction scan must still skip files: $scannedAfter/$totalAfter")
    val expect = (0L until 700L).filter { i =>
      val x = if (i < 600) (i * 37 % 1000) + 10 else (i * 53 % 1000) + 10
      x >= 100 && x <= 300
    }
    assert(prunedAfter.select("id").as[Long].collect().sorted.toSeq == expect)
    // compaction never scans MORE than the eroded layout did
    assert(scannedAfter <= scannedBefore && totalAfter == totalBefore,
      s"$scannedAfter/$totalAfter vs $scannedBefore/$totalBefore")
    // idempotence: a disjoint layout compacts to a no-op
    assert(ZOrder.compact(spark, dir) == v)
  }

  test("round-8 TPC-H analogue plan shapes: q19 one broadcast filter, q21/q22 broadcast dims") {
    val sf = "/root/testdata/sf0.001"
    val q19 = Queries.all("q19_disjunctive")(spark, sf)
    val p19 = q19.queryExecution.executedPlan.toString
    assert(p19.contains("BroadcastHashJoin") && !p19.contains("Union"),
      s"q19 must broadcast part under ONE disjunctive filter, no union-of-scans:\n$p19")
    val q21 = Queries.all("q21_late_suppliers")(spark, sf)
    val p21 = q21.queryExecution.executedPlan.toString
    // supplier broadcasts; the lo↔stats join stays a keyed equi-join
    // on l_orderkey (sort-merge/shuffled-hash is CORRECT there — the
    // qualifying-order set is not broadcastable at 100 TB), and no
    // join ever degenerates to cartesian
    assert(p21.contains("BroadcastHashJoin") && !p21.contains("CartesianProduct"),
      s"q21 must broadcast supplier, no cartesian:\n$p21")
    val q22 = Queries.all("q22_lapsed_customers")(spark, sf)
    val p22 = q22.queryExecution.executedPlan.toString
    assert(p22.contains("BroadcastNestedLoopJoin") || p22.contains("BroadcastHashJoin"),
      s"q22 threshold row must broadcast:\n$p22")
  }

  test("salted agg == plain agg for sum/count/min merges") {
    val df = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (2L, i.toLong))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"), min("v").as("m"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val salted = Salting.saltedAgg(df, "k", factor = 16, spreadCols = Seq("v"),
        aggs = Seq(
          ("s", sum("v"), (c: org.apache.spark.sql.Column) => sum(c)),
          ("c", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
          ("m", min("v"), (c: org.apache.spark.sql.Column) => min(c))))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("round-14 persist hygiene: collapsed twins leave no cached frames behind") {
    // The eager-twin contract is localCheckpoint (ContextCleaner-owned
    // blocks), NOT persist-with-caller-unpersist: a long-lived driver
    // consuming twins must end each call with an EMPTY CacheManager —
    // intermediates are unpersisted inside the op, and the returned
    // frame holds no cache entry. This is the r13-verdict leak gate.
    import graft.ops.{Dedup, TextAnalytics}
    spark.catalog.clearCache()
    val docs = ((1L to 40L).map(i => (i, s"shared clone text block ${i % 5}")) ++
      Seq((100L, "a unique loner document with its own words")))
      .toDF("doc_id", "text")
    // per-doc collapse twin
    Dedup.perDocCollapsed(docs, "doc_id", "text", outId = "doc_id") { reps =>
      TextAnalytics.qualityFilter(reps, "text").drop("text")
    }.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "perDocCollapsed left cached frames behind")
    // pair-producing eager op + transitive clustering + full corpus dedup
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4,
      threshold = 0.5, maxDocFreq = 64, minShared = 1)
    pairs.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "jaccardPairs left cached frames behind")
    Dedup.dedupClusters(pairs).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedupClusters left cached frames behind")
    Dedup.dedupCorpus(docs, "doc_id", "text", n = 4, threshold = 0.5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedupCorpus left cached frames behind")
    // BM25 collapsed search twin
    TextAnalytics.bm25SearchCollapsed(docs, "doc_id", "text",
      terms = Seq("clone", "text"), topK = 5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "bm25SearchCollapsed left cached frames behind")
  }
}
