package graft.ops

import graft.functions.{PqFunctions, PqKernel, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compression lever past
  * [[Quantization]]'s int8 scheme: the vector is split into `m`
  * subspaces of `dim/m` dimensions, each subspace gets its own
  * `ksub`-word codebook (trained by per-subspace Lloyd iterations),
  * and a vector is stored as `m` single-byte codes — 32× smaller than
  * float32 at m=8/dim=64 (vs 4× for int8 scalar quantization). The
  * approximate scan scores the codebook RECONSTRUCTION x̂ (the
  * concatenation of each subspace's selected codeword) against the
  * raw query, then the standard two-stage rerank recovers exact
  * quality on the candidate set.
  *
  * Deterministic and engine-replayable by the [[Clustering.kmeans]]
  * construction:
  *  - per-subspace codebooks initialize to the subvectors of the
  *    `ksub` lowest-id rows (no rand);
  *  - assignment distances are rounded to 6 dp BEFORE the argmin and
  *    ties break to the lower code index, so a last-ulp disagreement
  *    between engines cannot flip a code;
  *  - updated codewords snap to exact micro-units
  *    (`round(mean·1e6) as long / 1e6`) — distributed summation order
  *    never leaks into the trajectory;
  *  - a code that captures no rows keeps its previous codeword.
  *
  * Scale shape: training runs per iteration ONE explode of (row → m
  * subvector assignments) into ONE partial-aggregating
  * `groupBy(subspace, code)` — m·ksub groups, map-side-combined; the
  * codebook (m·ksub·dim/m doubles = dim·ksub) lives as plan literals,
  * never a shuffled table. At a real deployment training runs on a
  * bounded sample and the codebook persists in the index manifest;
  * encoded scans read only (id, m bytes) — the parquet IO win is the
  * point. The approximate scan and the rerank are both
  * TakeOrderedAndProject plans (per-partition heap + driver merge),
  * never a full sort. */
object ProductQuantization {

  /** Trained codebooks: `words(j)(i)` = codeword `i` of subspace `j`,
    * each of length dim/m. */
  final case class PqCodebook(dim: Int, m: Int, ksub: Int,
      words: Vector[Vector[Vector[Double]]]) {
    val ds: Int = dim / m
    /** The runtime argmin/reconstruction kernel ([[PqKernel]]) — a
      * reference object in the plan, never literal expression nodes
      * (which blow the 64 KB codegen method cap at real m·ksub). */
    def kernel: PqKernel = new PqKernel(dim, m, ksub,
      words.map(_.map(_.toArray).toArray).toArray)
  }


  /** `iters` Lloyd mean-updates per subspace (0 = seed codebook as-is:
    * the subvectors of the `ksub` lowest-id rows).
    *
    * BOUNDED-SAMPLE CONTRACT (`trainCap` > 0): training cost must not
    * scale with the corpus — the model is dim·ksub doubles regardless
    * of rows. With a cap, training (seeds AND Lloyd updates) runs on
    * the deterministic systematic sample `id % stride == 0` with
    * `stride = (n + trainCap − 1) / trainCap` (exact integer
    * arithmetic an oracle derives from the same count; stride 1 — the
    * full corpus — whenever n ≤ trainCap, so small-scale results are
    * unchanged). Requires an integral, non-negative id column when
    * active. `trainCap` = 0 trains on everything (caller bounds). */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int, trainCap: Long = 0L): PqCodebook = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must divide evenly into m ($m) subspaces")
    require(ksub > 0 && iters >= 0, "ksub must be positive, iters non-negative")
    val ds = dim / m
    val v0 = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val v =
      if (trainCap > 0) {
        val stride = (v0.count() + trainCap - 1) / trainCap
        if (stride > 1) v0.filter(pmod(col("__id"), lit(stride)) === 0) else v0
      } else v0
    val seeds = v.orderBy(col("__id").asc).limit(ksub).collect()
      .map(_.getSeq[Double](1).toVector)
    require(seeds.length == ksub, s"need at least ksub=$ksub rows to seed the codebook")
    var cb = PqCodebook(dim, m, ksub,
      (0 until m).map(j => seeds.map(_.slice(j * ds, (j + 1) * ds)).toVector).toVector)

    for (_ <- 1 to iters) {
      // one kernel call per row (posexplode of the m-code array — the
      // previous per-struct element_at form re-evaluated the argmin
      // kernel m times per row), then one m·ksub-group agg
      val assigned = v
        .select(col("__v"),
          posexplode(PqFunctions.pqCodes(col("__v"), cb.kernel)))
        .select(col("pos").as("j"), col("col").as("code"),
          slice(col("__v"), col("pos") * lit(ds) + lit(1), lit(ds)).as("sv"))
      val meanCols = (0 until ds).map(i =>
        (round(avg(col("sv")(i)) * 1000000.0).cast("long") / 1000000.0).as(s"c$i"))
      val updated = assigned.groupBy(col("j"), col("code"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (2 until 2 + ds).map(r.getDouble).toVector))
        .toMap
      cb = cb.copy(words = (0 until m).map(j => (0 until ksub).map(i =>
        updated.getOrElse((j, i), cb.words(j)(i))).toVector).toVector)
    }
    cb
  }

  /** Persistable form: `pq_code` as `array<tinyint>` (code − 128), m
    * bytes per vector — what an index sink writes next to the id. */
  def encode(df: DataFrame, vecCol: String, cb: PqCodebook): DataFrame =
    df.withColumn("pq_code",
      transform(PqFunctions.pqCodes(col(vecCol), cb.kernel),
        c => (c - lit(128)).cast("tinyint")))

  /** Reconstruction x̂ (argmin + codeword copy fused in one kernel
    * call — the arithmetic a PQ scan sees). */
  def reconstructed(vecCol: Column, cb: PqCodebook): Column =
    PqFunctions.pqReconstruct(vecCol, cb.kernel)

  /** Two-stage PQ search: train (or accept) the codebook, score the
    * reconstruction against the raw query (asymmetric distance — the
    * query is never quantized), take top-`candidates`, exact-rerank
    * with full vectors → top-k. Mirrors
    * [[Quantization.quantizedTopK]]'s output shape.
    *
    * COUPLING RULE (measured in ScaleOpsSpec's recall gate): plain PQ
    * is a COMPRESSOR, not a pruner — every vector whose codes match
    * the true neighbors' codes ties in the approximate ranking, so
    * `candidates` must cover the quantization tie-set (on clustered
    * corpora: the cluster size). For a small candidate pool at scale
    * use [[ivfPqTopK]], which quantizes RESIDUALS so within-cluster
    * structure survives compression. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, m: Int, ksub: Int, iters: Int,
      candidates: Int = 50, trained: Option[PqCodebook] = None,
      trainCap: Long = 0L): DataFrame = {
    val dim = query.length
    val cb = trained.getOrElse(
      train(df, idCol, vecCol, dim, m, ksub, iters, trainCap))
    val q = lit(query)
    val approx = df
      .withColumn("approx_cosine",
        round(VectorFunctions.cosineSimilarity(reconstructed(col(vecCol), cb), q), 6))
      .select(col(idCol), col("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col(idCol).asc)
      .limit(candidates)
    broadcast(approx).join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), q))
      .select(col(idCol), col("cosine"), col("approx_cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ model (Jégou et al. 2011 §V, "IVFADC"): a k-means coarse
    * quantizer (one full-dim centroid per inverted list) plus a PQ
    * codebook trained on RESIDUALS x − centroid(x). The coarse
    * quantizer must be k-means, not sign-LSH buckets: a sign bucket
    * can straddle several natural clusters, so its mean sits between
    * them and the residuals carry the LARGE cluster-offset component —
    * which then soaks up all the codebook's bits and drowns the small
    * within-cluster signal the rerank needs (measured: recall@10 0.36
    * with LSH-bucket residuals vs ≥0.9 with k-means residuals at the
    * same code budget). Driver state is kCoarse·dim doubles + the
    * dim·ksub codebook — broadcast-sized at any corpus scale.
    *
    * The coarse kernel is [[graft.functions.PqKernel]] with m=1:
    * argmin over kCoarse full-dim words, 6dp-rounded distance, ties
    * low — the same replayable assignment convention as the fine
    * codebook, and the per-row cost is one fused codegen'd call. */
  final case class IvfPqModel(dim: Int, kCoarse: Int,
      coarse: Vector[Vector[Double]], cb: PqCodebook) {
    def coarseKernel: PqKernel =
      new PqKernel(dim, 1, kCoarse, Array(coarse.map(_.toArray).toArray))
    /** (bucket: int, centroid: array<double>) — kCoarse rows, for
      * broadcast joins against an encoded scan. */
    def centroidFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      coarse.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("bucket", "centroid")
    }
  }

  /** Train an IVF-PQ model: `coarseIters` Lloyd iterations for the
    * kCoarse coarse centroids (seeded from the kCoarse lowest-id
    * rows, micro-snapped means — [[graft.ops.Clustering.kmeans]]'s
    * replayable construction), then the fine codebook on residuals.
    * Train on a bounded sample: training cost must not scale with the
    * corpus (the model is kCoarse·dim + dim·ksub doubles regardless). */
  def ivfPqTrain(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      kCoarse: Int, m: Int, ksub: Int, coarseIters: Int, pqIters: Int): IvfPqModel = {
    require(kCoarse > 0 && coarseIters >= 0, "kCoarse positive, coarseIters non-negative")
    val v = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var coarse: Vector[Vector[Double]] = v.orderBy(col("__id").asc)
        .limit(kCoarse).collect().map(_.getSeq[Double](1).toVector).toVector
      require(coarse.length == kCoarse, s"need at least kCoarse=$kCoarse rows to seed")
      for (_ <- 1 to coarseIters) {
        val kern = new PqKernel(dim, 1, kCoarse, Array(coarse.map(_.toArray).toArray))
        val meanCols = (0 until dim).map(i =>
          (round(avg(col("__v")(i)) * 1000000.0).cast("long") / 1000000.0).as(s"c$i"))
        val updated = v
          .withColumn("__b", element_at(PqFunctions.pqCodes(col("__v"), kern), 1))
          .groupBy(col("__b")).agg(meanCols.head, meanCols.tail: _*)
          .collect()
          .map(r => (r.getInt(0), (1 to dim).map(r.getDouble).toVector))
          .toMap
        coarse = (0 until kCoarse).map(i => updated.getOrElse(i, coarse(i))).toVector
      }
      val model0 = IvfPqModel(dim, kCoarse, coarse, null)
      val resid = v.withColumn("__resid",
        zip_with(col("__v"),
          PqFunctions.pqReconstruct(col("__v"), model0.coarseKernel),
          (x, c) => x - c))
      val cb = train(resid, "__id", "__resid", dim, m, ksub, pqIters)
      model0.copy(cb = cb)
    } finally v.unpersist()
  }

  /** Encode the corpus against a trained model: (id, bucket: int,
    * pq_code: array<tinyint>) — m+5 bytes of index per vector. This
    * is the one full-corpus pass; queries scan only probed buckets of
    * the encoded frame (write it partitioned by `bucket` and the scan
    * partition-prunes). */
  def ivfPqEncode(df: DataFrame, idCol: String, vecCol: String,
      model: IvfPqModel): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val resid = zip_with(v,
      PqFunctions.pqReconstruct(v, model.coarseKernel), (x, c) => x - c)
    df.select(col(idCol),
      element_at(PqFunctions.pqCodes(v, model.coarseKernel), 1).as("bucket"),
      transform(PqFunctions.pqCodes(resid, model.cb.kernel),
        c => (c - lit(128)).cast("tinyint")).as("pq_code"))
  }

  /** IVF-PQ query over a pre-encoded index: probe the `nProbe`
    * coarse cells nearest the query (pure driver arithmetic on the
    * kCoarse×dim model — no Spark job), scan ONLY those cells'
    * encoded rows, score the decode centroid(bucket)+x̂(codes) against
    * the raw query (asymmetric — the query is never quantized), take
    * `candidates`, exact-rerank against `raw` by broadcast join →
    * top-k. Both ranked stages are TakeOrderedAndProject (bounded
    * heaps), never a full sort; the cell filter is an `isin` on ≤
    * nProbe int literals, so a bucket-partitioned store prunes to
    * nProbe/kCoarse of the index files. */
  def ivfPqTopK(encoded: DataFrame, raw: DataFrame, idCol: String,
      vecCol: String, model: IvfPqModel, query: Array[Double], k: Int,
      nProbe: Int = 16, candidates: Int = 200): DataFrame = {
    val spark = encoded.sparkSession
    val q = lit(query)
    val probed: Seq[Int] = model.coarse.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var nc = 0.0; var nq = 0.0
      var d = 0
      while (d < model.dim) {
        dot += c(d) * query(d); nc += c(d) * c(d); nq += query(d) * query(d); d += 1
      }
      val sim = if (nc == 0 || nq == 0) 0.0 else dot / math.sqrt(nc * nq)
      (BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, i)
    }.sortBy { case (sim, i) => (-sim, i) }.take(nProbe).map(_._2)
    val cents = model.centroidFrame(spark)
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
    val approx = encoded
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
      .join(broadcast(cents), "bucket")
      .withColumn("approx_cosine", round(VectorFunctions.cosineSimilarity(
        zip_with(col("centroid"),
          PqFunctions.pqDecode(col("pq_code"), model.cb.kernel),
          (c, r) => c + r), q), 6))
      .select(col(idCol), col("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col(idCol).asc)
      .limit(candidates)
    broadcast(approx).join(raw.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), q))
      .select(col(idCol), col("cosine"), col("approx_cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist an IVF-PQ index: `dir/codes` = the encoded frame
    * partitioned by coarse cell (so a stored query's `bucket isin`
    * filter is STATIC partition pruning — unprobed cells' files are
    * never opened), `dir/model.json` = the model (kCoarse·dim +
    * dim·ksub doubles — index metadata, not data). At m=16 the index
    * is ~21 bytes/vector vs 256 for float32 — the parquet-IO win an
    * encoded scan exists for. */
  def ivfPqWrite(df: DataFrame, dir: String, idCol: String, vecCol: String,
      model: IvfPqModel): Unit = {
    ivfPqEncode(df, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/codes")
    writeModel(dir, model)
  }

  /** Query a stored [[ivfPqWrite]] index: model from `dir/model.json`
    * (driver-side probe arithmetic), codes scan pruned to the probed
    * cell partitions, exact rerank against `raw`. */
  def ivfPqTopKStored(spark: org.apache.spark.sql.SparkSession, dir: String,
      raw: DataFrame, idCol: String, vecCol: String, query: Array[Double],
      k: Int, nProbe: Int = 16, candidates: Int = 200): DataFrame = {
    val model = readModel(dir)
    val encoded = spark.read.parquet(s"$dir/codes")
      .withColumn("bucket", col("bucket").cast("int"))
    ivfPqTopK(encoded, raw, idCol, vecCol, model, query, k, nProbe, candidates)
  }

  /** Per-cell attribute-count sidecar for the stored [[ivfPqWrite]]
    * layout — the IVF-PQ twin of
    * [[SimilaritySearch.ivfWriteStats]]. The codes store carries only
    * (id, pq_code, bucket), so attributes join in from the caller's
    * table once at build time; the sidecar then answers FILTERED
    * queries' per-cell count pass without opening a single code file.
    * INVALIDATED (deleted) by [[ivfPqUpsert]]/[[ivfPqRemove]] — codes
    * alone cannot refresh attribute counts — re-run after maintenance
    * (the write is one slim join + grouped count). */
  def ivfPqWriteStats(spark: org.apache.spark.sql.SparkSession, dir: String,
      attrs: DataFrame, idCol: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "ivfPqWriteStats needs at least one column")
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col(idCol), col("bucket").cast("long").as("bucket"))
    val joined = codes.join(
      attrs.select((idCol +: statsCols).map(col): _*), Seq(idCol))
    // one sidecar schema + writer, shared with the IVF layout
    SimilaritySearch.writeStatsRows(spark, dir,
      SimilaritySearch.bucketStats(joined, statsCols))
  }

  /** Filtered ANN over the stored IVF-PQ layout: cell ranking is
    * driver arithmetic on the model, the per-cell filtered-count pass
    * is a LOOKUP in the [[ivfPqWriteStats]] sidecar (probe sizing =
    * the shared [[SimilaritySearch.probePrefix]] doubling, so the
    * probe set is deterministic), the codes scan reads ONLY probed
    * cell partitions semi-joined against the predicate's surviving
    * ids (one column-pruned scan of the attribute table), and the
    * exact rerank runs on the filtered candidates. Returns
    * min(k, filtered rows in the probed cells) rows. */
  def ivfPqTopKFilteredStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, raw: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, statsCol: String, statsValue: String,
      nProbeInit: Int = 4, candidates: Int = 200): DataFrame = {
    val model = readModel(dir)
    val ranked: Seq[Long] = model.coarse.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var nc = 0.0; var nq = 0.0
      var d = 0
      while (d < model.dim) {
        dot += c(d) * query(d); nc += c(d) * c(d); nq += query(d) * query(d); d += 1
      }
      val sim = if (nc == 0 || nq == 0) 0.0 else dot / math.sqrt(nc * nq)
      (BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, i)
    }.sortBy { case (sim, i) => (-sim, i) }.map(_._2.toLong)
    val fc = SimilaritySearch.readStatsCounts(spark, dir, statsCol, statsValue)
    val probed = SimilaritySearch.probePrefix(ranked, fc, k, nProbeInit)
      .map(_.toInt)
    val pass = raw.filter(col(statsCol).cast("string") === statsValue)
      .select(col(idCol))
    val cents = model.centroidFrame(spark)
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
    val q = lit(query)
    val approx = spark.read.parquet(s"$dir/codes")
      .withColumn("bucket", col("bucket").cast("int"))
      .filter(col("bucket").isin(probed.map(Integer.valueOf): _*))
      .join(pass, Seq(idCol), "left_semi")
      .join(broadcast(cents), "bucket")
      .withColumn("approx_cosine", round(VectorFunctions.cosineSimilarity(
        zip_with(col("centroid"),
          PqFunctions.pqDecode(col("pq_code"), model.cb.kernel),
          (c, r) => c + r), q), 6))
      .select(col(idCol), col("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col(idCol).asc)
      .limit(math.max(candidates, k))
    broadcast(approx).join(raw.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), q))
      .select(col(idCol), col("cosine"), col("approx_cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Incremental upsert into an [[ivfPqWrite]] layout — index
    * maintenance without a full rebuild. Rows whose id exists are
    * REPLACED (including vectors whose new embedding lands in a
    * different cell — the old copy leaves its old cell); new ids are
    * inserted. The MODEL IS FIXED: codebooks are static index
    * metadata (re-training is an offline rebuild, exactly as in an
    * IVFADC deployment), so an upsert is pure encode + targeted
    * rewrite. Work is proportional to TOUCHED cells, never the index:
    * old copies found via a column-pruned (id, cell) scan + broadcast
    * semi-join, survivors + new rows rewritten via dynamic partition
    * overwrite, cells emptied by a move have their partition dir
    * dropped. Single-writer contract, like the build. An
    * [[ivfPqWriteStats]] sidecar, if present, is DELETED (it cannot
    * be refreshed from codes alone) — rebuild it after maintenance. */
  def ivfPqUpsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVecs: DataFrame, idCol: String, vecCol: String): Unit = {
    val codesPath = s"$dir/codes"
    // invalidate the stats sidecar BEFORE touching codes: a crash
    // between a codes rewrite and a late invalidation would leave
    // stale counts that under-size filtered probes — the exact
    // failure invalidation exists to prevent. Worst case of the early
    // delete is a missing sidecar (rebuild), never a wrong one.
    invalidateStats(org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(codesPath), spark.sparkContext.hadoopConfiguration), dir)
    val model = readModel(dir)
    val newE = ivfPqEncode(newVecs, idCol, vecCol, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newIds = newE.select(col(idCol)).distinct()
    require(newE.count() == newIds.count(),
      s"ivfPqUpsert batch has duplicate $idCol values — an upsert needs one row per id")
    val oldLoc = spark.read.parquet(codesPath)
      .select(col(idCol), col("bucket").cast("int").as("bucket"))
      .join(broadcast(newIds), Seq(idCol))
    val touched = newE.select(col("bucket")).distinct()
      .unionByName(oldLoc.select(col("bucket")).distinct())
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    val survivors = spark.read.parquet(codesPath)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      .withColumn("bucket", col("bucket").cast("int"))
      .join(broadcast(newIds), Seq(idCol), "left_anti")
    // localCheckpoint (eager): the write overwrites the path the
    // survivors were read from, which Spark refuses in one lazy plan
    val rewritten = survivors.select(col(idCol), col("pq_code"), col("bucket"))
      .unionByName(newE.select(col(idCol), col("pq_code"), col("bucket")))
      .localCheckpoint(true)
    newE.unpersist()
    val kept = rewritten.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(codesPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(codesPath), spark.sparkContext.hadoopConfiguration)
    touched.filterNot(kept).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$codesPath/bucket=$b"), true)
    }
  }

  /** Deletion maintenance for the stored layout — [[ivfPqUpsert]]'s
    * inverse and the vector twin of
    * [[InvertedIndex.removeDocs]] (right-to-be-forgotten for an
    * embedding index). Victims' cells are found with ONE column-pruned
    * scan of (id, bucket) — no per-file jobs, no caller-supplied
    * vectors needed — then only those cells rewrite (dynamic partition
    * overwrite) and cells emptied of all codes have their partition
    * dirs dropped. PQ codes are row-independent, so the result equals
    * a re-encode of corpus ∖ victims under the same model by
    * construction; ids absent from the index are no-ops (idempotent
    * replay). */
  def ivfPqRemove(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, idCol: String): Unit = {
    val codesPath = s"$dir/codes"
    val victims = ids.select(col(idCol)).distinct()
    val touched = spark.read.parquet(codesPath)
      .select(col(idCol), col("bucket").cast("int").as("bucket"))
      .join(broadcast(victims), Seq(idCol))
      .select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    if (touched.isEmpty) return
    // invalidate BEFORE the rewrite — see ivfPqUpsert
    invalidateStats(org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(codesPath), spark.sparkContext.hadoopConfiguration), dir)
    val survivors = spark.read.parquet(codesPath)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      .withColumn("bucket", col("bucket").cast("int"))
      .join(broadcast(victims), Seq(idCol), "left_anti")
      .select(col(idCol), col("pq_code"), col("bucket"))
      .localCheckpoint(true) // the write overwrites the read path
    val kept = survivors.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(codesPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(codesPath), spark.sparkContext.hadoopConfiguration)
    touched.filterNot(kept).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$codesPath/bucket=$b"), true)
    }
  }

  /** A stats sidecar cannot be refreshed from codes alone (attributes
    * live outside the layout) — maintenance deletes it so a stale
    * sidecar can never under-size a filtered probe. */
  private def invalidateStats(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/stats")
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  /** Compact an [[ivfPqWrite]] layout after repeated upserts (each
    * upsert appends ≥1 file per touched cell; footers-per-query is
    * what a partitioned store dies of). */
  def ivfPqCompact(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerBucket: Int = 1): Unit =
    SimilaritySearch.compactBucketed(spark, s"$dir/codes", maxFilesPerBucket)

  private def modelPath(dir: String) = java.nio.file.Paths.get(dir, "model.json")

  /** Model JSON round-trip: Jackson emits shortest-round-trip double
    * literals, so read(write(m)) == m exactly — asserted in spec. */
  def writeModel(dir: String, model: IvfPqModel): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("dim", model.dim); node.put("k_coarse", model.kCoarse)
    node.put("m", model.cb.m); node.put("ksub", model.cb.ksub)
    val ca = node.putArray("coarse")
    model.coarse.foreach { c => val a = ca.addArray(); c.foreach(a.add) }
    val wa = node.putArray("words")
    model.cb.words.foreach { sub =>
      val sa = wa.addArray()
      sub.foreach { w => val a = sa.addArray(); w.foreach(a.add) }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(modelPath(dir),
      mapper.writeValueAsString(node).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def readModel(dir: String): IvfPqModel = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(modelPath(dir)))
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Vector[Vector[Double]] = {
      import scala.jdk.CollectionConverters._
      n.elements().asScala.map(row =>
        row.elements().asScala.map(_.asDouble()).toVector).toVector
    }
    import scala.jdk.CollectionConverters._
    val dim = node.get("dim").asInt()
    IvfPqModel(dim, node.get("k_coarse").asInt(),
      arr2(node.get("coarse")),
      PqCodebook(dim, node.get("m").asInt(), node.get("ksub").asInt(),
        node.get("words").elements().asScala.map(arr2).toVector))
  }
}
