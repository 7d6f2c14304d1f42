package graft.store

import com.fasterxml.jackson.databind.ObjectMapper
import graft.embed.Embedder
import graft.ingest.DocumentIngest
import graft.model.DbManifest
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Parquet-backed vector database (SURVEY.md §1.1 #3, S8-S13).
  *
  * One database = one directory:
  *   chunks/        id, text, vector, file/chunk metadata — the flat index
  *   documents/     per-document row incl. full page_content (sqlite_operations.py:12-20)
  *   chunk_doc_map/ chunk id → document hash (sqlite_operations.py:22-27)
  *   manifest.json  distance metric, dims, vector type, model, chunk params
  *                  (index_metadata.json + config registry,
  *                   vector_db_creator.py:218-225, config.py:166-172)
  *
  * Scale posture: `chunks` is written partitioned only by Spark's file
  * splits (no hot keys); at 100 TB the same layout shards across
  * executors and flat search remains an embarrassingly-parallel scan +
  * TakeOrdered merge. Re-partitioning/bucketing by a centroid column is
  * the documented IVF upgrade path and changes nothing here. */
object VectorStore {

  private val mapper = new ObjectMapper()

  def manifestPath(dbDir: String): java.nio.file.Path = Paths.get(dbDir, "manifest.json")

  def writeManifest(dbDir: String, m: DbManifest): Unit = {
    Files.createDirectories(Paths.get(dbDir))
    val node = mapper.createObjectNode()
    node.put("distance_metric", m.distanceMetric)
    node.put("dimensions", m.dimensions)
    node.put("vector_type", m.vectorType)
    node.put("model", m.model)
    node.put("chunk_size", m.chunkSize)
    node.put("chunk_overlap", m.chunkOverlap)
    Files.write(manifestPath(dbDir), mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
  }

  def readManifest(dbDir: String): DbManifest = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(dbDir)))
    DbManifest(
      node.get("distance_metric").asText("cosine"),
      node.get("dimensions").asInt(),
      node.get("vector_type").asText("float32"),
      node.get("model").asText(""),
      node.get("chunk_size").asInt(),
      node.get("chunk_overlap").asInt())
  }

  /** End-to-end database build (CreateVectorDB.run,
    * vector_db_creator.py:245-288): scan → extract → chunk → clean →
    * embed → write three tables + manifest. All one lazy plan per sink. */
  def create(spark: SparkSession, dbDir: String, sourceDir: String,
      embedder: Embedder, chunkSize: Int = 1200, chunkOverlap: Int = 600): DbManifest = {
    // documents: ONE row per FILE (reference parity,
    // sqlite_operations.py:12-20 writes per-file rows, duplicates
    // included). Ids are deterministic from (hash, path) — unique even
    // for byte-identical files at different paths (reference uses random
    // ids, vector_db_creator.py:79 — a bug, not a feature).
    val docs = DocumentIngest.loadDocuments(spark, sourceDir)
      .withColumn("id", xxhash64(col("hash"), col("file_path")))
      .cache() // read twice (documents sink + chunk pipeline); tiny vs chunks

    // chunk pipeline: dedup by content hash — byte-identical files SHARE
    // chunks (chunk ids are xxhash64(hash, ordinal), so duplicate inputs
    // would produce duplicate chunk rows). Provenance survives because
    // chunk_doc_map keys on `hash`: both files resolve to the shared
    // chunks. Lexicographically-first path wins (deterministic).
    val distinctDocs = docs
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("hash")).orderBy(col("file_path").asc)))
      .filter(col("__rn") === 1).drop("__rn")

    val chunks = DocumentIngest.chunkDocuments(distinctDocs, chunkSize, chunkOverlap)
    val embedded = embedder.embed(chunks, "text")
      .select("id", "text", "vector", "file_path", "file_type", "file_name",
        "creation_date", "modification_date", "hash", "document_type", "page_number")

    embedded.write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks")
    docs.select(col("id"), col("file_name"), col("hash"), col("file_path"), col("page_content"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dbDir/documents")
    spark.read.parquet(s"$dbDir/chunks").select(col("id").as("chunk_id"), col("hash"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunk_doc_map")
    docs.unpersist()

    val m = DbManifest("cosine", embedder.dim, "float32",
      embedder.getClass.getSimpleName, chunkSize, chunkOverlap)
    writeManifest(dbDir, m)
    m
  }

  def chunks(spark: SparkSession, dbDir: String): DataFrame =
    spark.read.parquet(s"$dbDir/chunks")

  // -------------------------------------------------------------------
  // Sidecar write contract: chunks_q / chunks_b / chunks_ivfpq are
  // DERIVED data over chunks/. Any write to chunks/ outside
  // [[upsertChunks]] INVALIDATES them (they will happily serve stale
  // candidates); upsertChunks is the maintained path — it applies the
  // row changes and brings every sidecar that exists back in sync in
  // the same call, each by its cheapest sound move:
  //   chunks_b      row-local sign codes → encode the batch, merge
  //   chunks_q      affine codes depend on GLOBAL per-dim [min,max]:
  //                 batch inside the stored envelope → encode with the
  //                 stored stats and merge (codes stay comparable; if a
  //                 REPLACED row defined an extremum the envelope is
  //                 now loose — still sound for every stored code, a
  //                 periodic rebuild re-tightens);
  //                 batch outside → full rebuild (stats changed, every
  //                 stored code would mean something else)
  //   chunks_ivfpq  fixed-codebook encode + touched-cell rewrite
  //                 ([[graft.ops.ProductQuantization.ivfPqUpsert]])
  // -------------------------------------------------------------------

  /** Upsert chunk rows: same-id rows are replaced, new ids inserted,
    * and every PRESENT index sidecar is maintained in the same call
    * (see the contract above). The flat chunks/ table rewrites in one
    * pass — the reference's database layout; at lakehouse scale the
    * chunk table lives in a [[SnapshotLog]] and only key-containing
    * files rewrite. Single-writer, like [[create]]. */
  def upsertChunks(spark: SparkSession, dbDir: String,
      updates: DataFrame): Unit = {
    val cur = chunks(spark, dbDir)
    require(cur.columns.toSet.subsetOf(updates.columns.toSet),
      "upsertChunks batch is missing chunk columns: " +
        cur.columns.toSet.diff(updates.columns.toSet).mkString(", "))
    val upd = updates.select(cur.columns.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val updIds = upd.select("id").distinct()
    require(upd.count() == updIds.count(),
      "upsertChunks batch has duplicate ids — an upsert needs one row per id")
    val rewritten = cur
      .join(org.apache.spark.sql.functions.broadcast(updIds), Seq("id"), "left_anti")
      .unionByName(upd)
      .localCheckpoint(true) // materialize before overwriting the source
    rewritten.write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks")

    val m = readManifest(dbDir)
    def sidecarExists(name: String): Boolean =
      Files.isDirectory(Paths.get(dbDir, name))

    if (sidecarExists("chunks_b")) {
      val fresh = upd.select(col("id"),
        graft.ops.Quantization.signBitsColumn(col("vector"), m.dimensions).as("bvec"))
      val merged = spark.read.parquet(s"$dbDir/chunks_b")
        .join(org.apache.spark.sql.functions.broadcast(updIds), Seq("id"), "left_anti")
        .unionByName(fresh)
        .localCheckpoint(true)
      merged.write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks_b")
    }

    if (sidecarExists("chunks_q")) {
      val (mins, maxs) = readQuantStats(dbDir)
      val (bMins, bMaxs) = graft.ops.Quantization.dimStats(upd, "vector", m.dimensions)
      val inEnvelope = (0 until m.dimensions).forall(d =>
        bMins(d) >= mins(d) && bMaxs(d) <= maxs(d))
      if (inEnvelope) {
        val fresh = graft.ops.Quantization.quantize(upd, "vector", mins, maxs)
          .select("id", "qvec")
        val merged = spark.read.parquet(s"$dbDir/chunks_q")
          .join(org.apache.spark.sql.functions.broadcast(updIds), Seq("id"), "left_anti")
          .unionByName(fresh)
          .localCheckpoint(true)
        merged.write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks_q")
      } else writeQuantized(spark, dbDir) // stats changed: full rebuild
    }

    if (sidecarExists("chunks_ivfpq")) {
      graft.ops.ProductQuantization.ivfPqUpsert(spark,
        s"$dbDir/chunks_ivfpq", upd.select("id", "vector"), "id", "vector")
    }
    upd.unpersist()
  }

  // -------------------------------------------------------------------
  // Quantized index sidecar: chunks_q/ holds (id, qvec array<tinyint>)
  // — 1/4 the vector bytes and none of the text/metadata columns, so
  // the stage-1 scan of a two-stage search reads a small fraction of
  // the full table's IO. quant.json carries the per-dimension affine
  // stats. The sidecar is derived data: rebuildable from chunks/ at
  // any time, dropped and re-written as one pass.
  // -------------------------------------------------------------------

  def quantStatsPath(dbDir: String): java.nio.file.Path = Paths.get(dbDir, "quant.json")

  /** Build/refresh the quantized sidecar from the stored chunks. */
  def writeQuantized(spark: SparkSession, dbDir: String): Unit = {
    val m = readManifest(dbDir)
    val ch = chunks(spark, dbDir)
    val (mins, maxs) = graft.ops.Quantization.dimStats(ch, "vector", m.dimensions)
    graft.ops.Quantization.quantize(ch, "vector", mins, maxs)
      .select("id", "qvec")
      .write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks_q")
    val node = mapper.createObjectNode()
    val mnArr = node.putArray("mins"); mins.foreach(mnArr.add)
    val mxArr = node.putArray("maxs"); maxs.foreach(mxArr.add)
    Files.write(quantStatsPath(dbDir),
      mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
  }

  def readQuantStats(dbDir: String): (Array[Double], Array[Double]) = {
    val node = mapper.readTree(Files.readAllBytes(quantStatsPath(dbDir)))
    def arr(name: String): Array[Double] = {
      val a = node.get(name)
      (0 until a.size()).map(a.get(_).asDouble()).toArray
    }
    (arr("mins"), arr("maxs"))
  }

  /** Two-stage search against the quantized sidecar: stage 1 ranks the
    * int8 reconstruction under the database's metric and keeps
    * `candidates` ids (a column-pruned scan of chunks_q only); stage 2
    * broadcast-joins those ids back to the full chunks table and runs
    * the standard exact search chain (distance, batch-relative
    * similarity, threshold/keyword/type post-filters, ordering) on the
    * candidate subset. With `candidates` ≥ corpus size this equals the
    * exact [[graft.search.VectorSearch.searchChunks]]. */
  def searchQuantized(spark: SparkSession, dbDir: String, queryVec: Array[Float],
      opts: graft.search.SearchOptions, candidates: Int = 64): DataFrame = {
    import graft.search.VectorSearch
    val metric = readManifest(dbDir).distanceMetric
    val (mins, maxs) = readQuantStats(dbDir)
    val mn = mins.map(v => s"CAST(${v} AS DOUBLE)").mkString("array(", ",", ")")
    val mx = maxs.map(v => s"CAST(${v} AS DOUBLE)").mkString("array(", ",", ")")
    // stored-code reconstruction: x̂_i = mn_i + (q_i + 128)·(mx_i − mn_i)/255
    val dq = expr(s"""transform(qvec, (q, i) ->
      |  element_at($mn, i + 1) + (CAST(q AS DOUBLE) + 128.0)
      |    * (element_at($mx, i + 1) - element_at($mn, i + 1)) / 255.0)""".stripMargin)
    val qCol = lit(queryVec.map(_.toDouble))
    val cand = spark.read.parquet(s"$dbDir/chunks_q")
      .withColumn("__approx_d", VectorSearch.distanceColumn(metric, dq, qCol))
      .orderBy(VectorSearch.rankOrder(metric, org.apache.spark.sql.functions.col("__approx_d")).asc,
        col("id").asc)
      .limit(candidates)
      .select("id")
    val subset = chunks(spark, dbDir)
      .join(org.apache.spark.sql.functions.broadcast(cand), Seq("id"))
    VectorSearch.searchChunks(subset, queryVec, metric, opts)
  }
  // -------------------------------------------------------------------
  // Binary (sign) sidecar: chunks_b/ holds 1-bit/dim packed sign codes
  // (⌈dim/64⌉ longs per row — 8 bytes per 64 dims, the cheapest stage-1
  // scan in the ladder: int8 = dim bytes, PQ = m bytes, sign = dim/8).
  // Hamming pre-rank approximates ANGULAR order, so stage 1 assumes a
  // cosine-family metric; stage 2 always runs the exact chain under
  // the database's metric, and candidates ≥ corpus degrades gracefully
  // to the exact search. Pool sizing: the tie-set coupling documented
  // on [[graft.ops.Quantization.binaryTopK]].
  // -------------------------------------------------------------------

  /** Build/refresh the binary sidecar from the stored chunks. */
  def writeBinary(spark: SparkSession, dbDir: String): Unit = {
    val m = readManifest(dbDir)
    chunks(spark, dbDir)
      .select(col("id"),
        graft.ops.Quantization.signBitsColumn(col("vector"), m.dimensions).as("bvec"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dbDir/chunks_b")
  }

  /** Two-stage search against the binary sidecar: stage 1 keeps the
    * `candidates` hamming-nearest sign patterns (a column-pruned scan
    * of chunks_b only — 8 bytes per 64 dims); stage 2 broadcast-joins
    * those ids back to the full chunks table and runs the standard
    * exact search chain. Same contract as [[searchQuantized]]. */
  def searchBinary(spark: SparkSession, dbDir: String, queryVec: Array[Float],
      opts: graft.search.SearchOptions, candidates: Int = 64): DataFrame = {
    import graft.search.VectorSearch
    val metric = readManifest(dbDir).distanceMetric
    val qbits = graft.ops.Quantization.packSignBits(queryVec.map(_.toDouble))
    val cand = spark.read.parquet(s"$dbDir/chunks_b")
      .withColumn("__h", graft.ops.Quantization.hammingColumn(col("bvec"), lit(qbits)))
      .orderBy(col("__h").asc, col("id").asc)
      .limit(candidates)
      .select("id")
    val subset = chunks(spark, dbDir)
      .join(org.apache.spark.sql.functions.broadcast(cand), Seq("id"))
    VectorSearch.searchChunks(subset, queryVec, metric, opts)
  }

  // -------------------------------------------------------------------
  // IVF-PQ index sidecar: chunks_ivfpq/ holds the encoded index of
  // [[graft.ops.ProductQuantization.ivfPqWrite]] — codes parquet
  // partitioned by coarse cell + model.json. Unlike the flat int8
  // sidecar (whole-corpus stage-1 scan at 1/4 IO), this one prunes the
  // stage-1 scan to nProbe/kCoarse of the index FILES (static
  // partition pruning on the cell filter) at ~m+5 bytes/vector — the
  // 100 TB path. Derived data, rebuildable from chunks/ at any time.
  // -------------------------------------------------------------------

  /** Build/refresh the IVF-PQ sidecar from the stored chunks. Training
    * runs on `trainFraction` of the chunks (model size is independent
    * of the corpus; training cost must be too). `m` must divide the
    * manifest dimension; `kCoarse`/`ksub` must not exceed the sampled
    * row count (seed construction). */
  def writeIvfPq(spark: SparkSession, dbDir: String, kCoarse: Int = 64,
      m: Int = 8, ksub: Int = 64, coarseIters: Int = 3, pqIters: Int = 2,
      trainFraction: Double = 1.0): Unit = {
    val mf = readManifest(dbDir)
    val ch = chunks(spark, dbDir)
    val sample = if (trainFraction >= 1.0) ch
      else ch.filter(pmod(xxhash64(col("id")), lit(1000000)) <
        (trainFraction * 1000000).toLong)
    val model = graft.ops.ProductQuantization.ivfPqTrain(
      sample, "id", "vector", mf.dimensions, kCoarse, m, ksub, coarseIters, pqIters)
    graft.ops.ProductQuantization.ivfPqWrite(
      ch, s"$dbDir/chunks_ivfpq", "id", "vector", model)
  }

  /** Two-stage search against the IVF-PQ sidecar: rank the coarse
    * cells under the database's metric (kCoarse-row frame — one tiny
    * job), scan ONLY the probed cells' code partitions, rank the
    * decode centroid+x̂ under the same metric, keep `candidates` ids,
    * then broadcast-join back to chunks and run the standard exact
    * search chain — identical post-filter semantics to
    * [[searchQuantized]], different stage-1 index. With enough probes
    * and candidates this equals exact search. */
  def searchIvfPq(spark: SparkSession, dbDir: String, queryVec: Array[Float],
      opts: graft.search.SearchOptions, nProbe: Int = 8,
      candidates: Int = 64): DataFrame = {
    import graft.search.VectorSearch
    val metric = readManifest(dbDir).distanceMetric
    val dir = s"$dbDir/chunks_ivfpq"
    val model = graft.ops.ProductQuantization.readModel(dir)
    val qd = lit(queryVec.map(_.toDouble))
    val probed = model.centroidFrame(spark)
      .withColumn("__d", VectorSearch.distanceColumn(metric, col("centroid"), qd))
      .orderBy(VectorSearch.rankOrder(metric, col("__d")).asc, col("bucket").asc)
      .limit(nProbe).select("bucket").collect().map(_.getInt(0)).toSeq
    val cents = model.centroidFrame(spark)
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
    val cand = spark.read.parquet(s"$dir/codes")
      .withColumn("bucket", col("bucket").cast("int"))
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
      .join(org.apache.spark.sql.functions.broadcast(cents), "bucket")
      .withColumn("__xhat", zip_with(col("centroid"),
        graft.functions.PqFunctions.pqDecode(col("pq_code"), model.cb.kernel),
        (c, r) => c + r))
      .withColumn("__approx_d", VectorSearch.distanceColumn(metric, col("__xhat"), qd))
      .orderBy(VectorSearch.rankOrder(metric, col("__approx_d")).asc, col("id").asc)
      .limit(candidates)
      .select("id")
    val subset = chunks(spark, dbDir)
      .join(org.apache.spark.sql.functions.broadcast(cand), Seq("id"))
    VectorSearch.searchChunks(subset, queryVec, metric, opts)
  }

  def documents(spark: SparkSession, dbDir: String): DataFrame =
    spark.read.parquet(s"$dbDir/documents")
  def chunkDocMap(spark: SparkSession, dbDir: String): DataFrame =
    spark.read.parquet(s"$dbDir/chunk_doc_map")

  /** S11 — catalog scan: per-db document list. */
  def listDocuments(spark: SparkSession, dbDir: String): DataFrame =
    documents(spark, dbDir).select("file_name", "file_path")

  // -------------------------------------------------------------------
  // Catalog registry — single-file parity with the reference's
  // config.yaml `created_databases` map (config.py:55-58,166-177): one
  // registry.json at the catalog root, name → manifest params, upserted
  // by managed create and deleted from by managed drop. Driver-side
  // metadata (a few KB), written atomically (temp file + move) so a
  // crash mid-write can't truncate the catalog.
  // -------------------------------------------------------------------

  def registryPath(rootDir: String): java.nio.file.Path = Paths.get(rootDir, "registry.json")

  def readRegistry(rootDir: String): Map[String, DbManifest] = {
    val p = registryPath(rootDir)
    if (!Files.exists(p)) Map.empty
    else {
      val node = mapper.readTree(Files.readAllBytes(p))
      val names = node.fieldNames()
      val b = Map.newBuilder[String, DbManifest]
      while (names.hasNext) {
        val name = names.next()
        val e = node.get(name)
        b += name -> DbManifest(
          e.get("distance_metric").asText("cosine"),
          e.get("dimensions").asInt(),
          e.get("vector_type").asText("float32"),
          e.get("model").asText(""),
          e.get("chunk_size").asInt(),
          e.get("chunk_overlap").asInt())
      }
      b.result()
    }
  }

  private def writeRegistry(rootDir: String, reg: Map[String, DbManifest]): Unit = {
    Files.createDirectories(Paths.get(rootDir))
    val node = mapper.createObjectNode()
    reg.toSeq.sortBy(_._1).foreach { case (name, m) =>
      val e = node.putObject(name)
      e.put("distance_metric", m.distanceMetric)
      e.put("dimensions", m.dimensions)
      e.put("vector_type", m.vectorType)
      e.put("model", m.model)
      e.put("chunk_size", m.chunkSize)
      e.put("chunk_overlap", m.chunkOverlap)
    }
    val tmp = Paths.get(rootDir, ".registry.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, registryPath(rootDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Upsert one database's entry (config.py:166-172 parity). */
  def registerDatabase(rootDir: String, name: String, m: DbManifest): Unit =
    writeRegistry(rootDir, readRegistry(rootDir) + (name -> m))

  /** Remove one database's entry (config.py:173-177 parity). */
  def deregisterDatabase(rootDir: String, name: String): Unit = {
    val reg = readRegistry(rootDir)
    if (reg.contains(name)) writeRegistry(rootDir, reg - name)
  }

  /** Managed create: validate the name, build the db at rootDir/name,
    * record it in the catalog registry (the reference's create path
    * updates config.yaml the same way, vector_db_creator.py:218-225). */
  def createIn(spark: SparkSession, rootDir: String, name: String, sourceDir: String,
      embedder: Embedder, chunkSize: Int = 1200, chunkOverlap: Int = 600): DbManifest = {
    validateDbName(name).foreach(reason => throw new IllegalArgumentException(reason))
    val m = create(spark, Paths.get(rootDir, name).toString, sourceDir,
      embedder, chunkSize, chunkOverlap)
    registerDatabase(rootDir, name, m)
    m
  }

  /** Managed drop: delete the directory AND its registry entry. */
  def dropIn(rootDir: String, name: String): Unit = {
    drop(Paths.get(rootDir, name).toString)
    deregisterDatabase(rootDir, name)
  }

  /** Cross-database catalog (reference config registry,
    * config.py:55-58,166-172 + the Manage-Databases listing,
    * gui_tabs_manage_databases.py:104-111): one row per database with
    * its model/metric/chunk params. Reads the registry file when the
    * root carries one (the managed-catalog path); otherwise falls back
    * to scanning child directories for manifest.json — so databases
    * created by unmanaged [[create]] (or copied in by hand) still list.
    * Driver-side metadata (not data) → small local DataFrame. */
  def listDatabases(spark: SparkSession, rootDir: String): DataFrame = {
    import spark.implicits._
    val root = Paths.get(rootDir)
    val reg = readRegistry(rootDir)
    val rows: Seq[(String, String, Int, String, String, Int, Int)] =
      if (reg.nonEmpty)
        reg.toSeq.sortBy(_._1).map { case (name, m) =>
          (name, m.distanceMetric, m.dimensions, m.vectorType, m.model,
            m.chunkSize, m.chunkOverlap)
        }
      else if (!Files.isDirectory(root)) Seq.empty
      else {
        val stream = Files.list(root) // must be closed: holds a directory fd
        try {
          val it = stream.iterator()
          val b = Seq.newBuilder[(String, String, Int, String, String, Int, Int)]
          while (it.hasNext) {
            val child = it.next()
            if (Files.isDirectory(child) && Files.exists(manifestPath(child.toString))) {
              val m = readManifest(child.toString)
              b += ((child.getFileName.toString, m.distanceMetric, m.dimensions,
                m.vectorType, m.model, m.chunkSize, m.chunkOverlap))
            }
          }
          b.result().sortBy(_._1)
        } finally stream.close()
      }
    rows.toDF("database", "distance_metric", "dimensions", "vector_type",
      "model", "chunk_size", "chunk_overlap")
  }

  private def withChildren(p: java.nio.file.Path)(f: java.nio.file.Path => Unit): Unit = {
    val stream = Files.list(p) // must be closed: holds a directory fd
    try stream.forEach(c => f(c)) finally stream.close()
  }

  /** S12 — database drop. */
  def drop(dbDir: String): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) withChildren(p)(rm)
      Files.deleteIfExists(p)
    }
    val p = Paths.get(dbDir)
    if (Files.exists(p)) rm(p)
  }

  /** P8 — database-name validation (gui_tabs_databases.py:106-108 +
    * utilities.py:131-164 preconditions): lowercase alnum/_/- only,
    * length ≥ 3, not the literal strings "null"/"none". Returns the
    * reason a name is invalid, or None if acceptable. */
  def validateDbName(name: String): Option[String] = {
    val lower = Option(name).getOrElse("").toLowerCase
    if (lower.length < 3) Some("database name must be at least 3 characters")
    else if (!lower.matches("^[a-z0-9_-]*$"))
      Some("database name may only contain lowercase letters, digits, _ and -")
    else if (lower == "null" || lower == "none")
      Some("database name must not be 'null' or 'none'")
    else None
  }

  /** S13 — backup: recursive copy of the database directory
    * (utilities.py:79-105 backup_database_incremental's copytree
    * semantics; the Parquet layout is plain files, so a file copy IS a
    * consistent backup once writes are finished). */
  def backup(dbDir: String, backupDir: String): Unit = {
    val src = Paths.get(dbDir)
    require(Files.exists(src), s"no database at $dbDir")
    def cp(p: java.nio.file.Path): Unit = {
      val dest = Paths.get(backupDir).resolve(src.relativize(p))
      if (Files.isDirectory(p)) {
        Files.createDirectories(dest)
        withChildren(p)(cp)
      } else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    cp(src)
  }

  /** S13 — restore: drop the live dir and copy the backup back
    * (initialize.py:55-81 restore_vector_db_backup). */
  def restore(backupDir: String, dbDir: String): Unit = {
    require(Files.exists(Paths.get(backupDir)), s"no backup at $backupDir")
    drop(dbDir)
    val src = Paths.get(backupDir)
    def cp(p: java.nio.file.Path): Unit = {
      val dest = Paths.get(dbDir).resolve(src.relativize(p))
      if (Files.isDirectory(p)) {
        Files.createDirectories(dest)
        withChildren(p)(cp)
      } else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    cp(src)
  }
}
