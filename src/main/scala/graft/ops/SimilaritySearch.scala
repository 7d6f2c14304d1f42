package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md extension
  * surface): exact brute-force top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Brute force is a codegen'd scan + TakeOrderedAndProject — at 100 TB
  * it's one pass, embarrassingly parallel, no shuffle before the final
  * k·partitions merge. The LSH variant prunes the scan to matching sign
  * buckets (probing the query's bucket plus optional multi-probe
  * neighbors), trading recall for a ~2^planes scan reduction; buckets
  * are a column, so a Parquet layout partitioned by bucket turns the
  * probe into partition pruning at the source. */
object SimilaritySearch {

  /** Exact top-k by cosine similarity against a literal query vector.
    * Deterministic tiebreak on id. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int): DataFrame =
    df.withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** Matryoshka (MRL, Kusupati et al. 2022) truncated-dimension
    * two-stage search: rank by cosine over the FIRST `dPrefix`
    * components only (cosine self-normalizes, so no explicit
    * renormalize is needed for the ranking), keep `candidates`, exact
    * full-dim rerank → top-k. With MRL-trained embeddings the prefix
    * carries most of the signal at dPrefix/dim of the arithmetic; at
    * scale the prefix lives as its OWN materialized sidecar column
    * (parquet cannot prune array elements, so the IO win needs the
    * slice stored — same pattern as the int8 sidecar), which
    * `mrlWrite`-style storage can add on top of this plan shape. Both
    * stages are TakeOrderedAndProject.
    *
    * The prefix ranking passes the TRUNCATED QUERY straight to the
    * fused cosine kernel — [[graft.functions.CosineSimilarity]] loops
    * over min(|x|, |q|) elements, which IS the prefix cosine, with no
    * per-row slice()/cast allocation. Measured at 2M×64: the
    * slice-based form ran 2.6× SLOWER than the full-dim scan (the
    * allocation dwarfs the saved arithmetic); this form is ~2× faster
    * at dPrefix=8 (BASELINE.md r7 probe). */
  def matryoshkaTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, dPrefix: Int,
      candidates: Int): DataFrame = {
    require(dPrefix > 0 && dPrefix <= queryVec.length, "dPrefix must be in [1, dim]")
    val qTrunc = lit(queryVec.take(dPrefix))
    val approx = df
      .withColumn("approx_cosine",
        round(VectorFunctions.cosineSimilarity(col(vecCol), qTrunc), 6))
      .select(col(idCol), col("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col(idCol).asc)
      .limit(candidates)
    broadcast(approx).join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .select(col(idCol), col("cosine"), col("approx_cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-group centroid embeddings: the L2-normalized per-dimension
    * mean of the group's vectors — the standard document-level
    * representation when chunks (or passages) carry the embeddings and
    * dedup/similarity must operate per document. ONE groupBy with `dim`
    * map-side-partial avg expressions (no explode of row × dim pairs,
    * no second shuffle); normalization is an in-row array fold. Groups
    * whose mean is the zero vector keep it unnormalized. Returns
    * (`groupCol`, centroid: array<double>). */
  def docCentroids(df: DataFrame, groupCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val avgs = (1 to dim).map(i =>
      avg(element_at(col(vecCol), i).cast("double")).as(s"c$i"))
    df.groupBy(col(groupCol))
      .agg(avgs.head, avgs.tail: _*)
      .withColumn("raw", array((1 to dim).map(i => col(s"c$i")): _*))
      .withColumn("centroid", expr(
        """CASE WHEN aggregate(transform(raw, y -> y * y), CAST(0 AS DOUBLE), (a, y) -> a + y) = 0
          | THEN raw
          | ELSE transform(raw, x -> x / sqrt(
          |   aggregate(transform(raw, y -> y * y), CAST(0 AS DOUBLE), (a, y) -> a + y)))
          |END""".stripMargin))
      .select(col(groupCol), col("centroid"))
  }

  /** Deterministic pseudo-random hyperplane component: hash(plane, dim)
    * mapped to [-1, 1] — no stored plane matrix, any executor can
    * recompute it (single source of truth:
    * [[graft.functions.LshBucket.planeComponent]]). */
  private[graft] def planeComponent(plane: Int, d: Int): Double =
    graft.functions.LshBucket.planeComponent(plane, d)

  /** Deterministic random projection (Johnson-Lindenstrauss style):
    * dense dimensionality reduction `dimIn → dimOut` against the SAME
    * recomputable plane family as the sign-LSH ops — out_j = ⟨v, p_j⟩.
    * The cheap pre-step before clustering / near-dup at very high
    * input dims (distances are preserved to 1±ε for dimOut =
    * O(ln n / ε²)); unlike PCA there is nothing to train, store, or
    * ship — any executor (or SQL replay) regenerates the matrix from
    * (plane, dim) alone.
    *
    * Scale shape: map-only — dimOut in-order [[graft.functions
    * .DotProduct]] folds per row, no shuffle, no driver state. */
  def randomProject(vecs: DataFrame, idCol: String, vecCol: String,
      dimIn: Int, dimOut: Int): DataFrame = {
    require(dimIn > 0 && dimOut > 0, "dims must be positive")
    val v = col(vecCol).cast("array<double>")
    val comps = (0 until dimOut).map { j =>
      VectorFunctions.dotProduct(v,
        array((0 until dimIn).map(d => lit(planeComponent(j, d))): _*))
    }
    vecs.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** Sign-bucket id of a vector under `numPlanes` hyperplanes — one
    * native codegen node ([[graft.functions.LshBucket]]); the `dim`
    * param is kept for API stability but the expression reads the
    * array's own length. */
  def lshBucketColumn(vecCol: Column, dim: Int, numPlanes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LshBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(vecCol), numPlanes))

  def lshBucket(vec: Array[Double], numPlanes: Int): Long = {
    (0 until numPlanes).map { p =>
      val proj = vec.indices.map(d => vec(d) * planeComponent(p, d)).sum
      if (proj >= 0.0) 1L << p else 0L
    }.reduce(_ | _)
  }

  /** Approximate top-k: scan only rows whose LSH bucket is within
    * `probeHamming` bit flips of the query's bucket (multi-probe), then
    * exact cosine rank inside the pruned set. With a bucket-partitioned
    * layout the filter becomes partition pruning.
    *
    * Default `probeHamming = 2` from the round-6 recall probe
    * (BASELINE.md): on a clustered 2M-vector corpus recall@10 is
    * 0.995 (min 0.90) at ≤2 flips vs 0.89 (min 0.30) at ≤1 — the
    * extra probe width mostly fixes the worst queries. On the
    * uniform-random WORST case it is 0.52; no bucketing ANN does well
    * there (neighbors are barely above chance). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryVec: Array[Double], k: Int, numPlanes: Int = 8,
      probeHamming: Int = 2): DataFrame = {
    val qBucket = lshBucket(queryVec, numPlanes)
    val withBucket = df.withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
    val pruned = withBucket.filter(
      bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
    pruned
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched exact top-k — the DEFAULT physical shape is the
    * bounded-heap aggregate ([[bruteForceTopKBatchAgg]]): map-side
    * partials prune every partition to k rows per query BEFORE the
    * exchange, so shuffle volume is k·partitions·M regardless of corpus
    * size (the 2M-vector probe measured 3.0 s vs 23.8 s for the window
    * plan, BASELINE.md). The window-rank twin survives as
    * [[bruteForceTopKBatchWindow]] for plan A/B and the equality spec. */
  def bruteForceTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String, k: Int): DataFrame =
    bruteForceTopKBatchAgg(df, idCol, vecCol, queries, queryIdCol, queryVecCol, k)

  /** Reference-twin window plan: every scored (query, vector) row is
    * shuffled into its query's partition and rank-windowed (N·M
    * exchange volume — the scale-killer shape; asserted equal to the
    * aggregate plan in ScaleOpsSpec, NOT the default). */
  def bruteForceTopKBatchWindow(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String, k: Int): DataFrame = {
    val joined = df.crossJoin(broadcast(queries.select(
        col(queryIdCol).as("query_id"), col(queryVecCol).as("query_vec"))))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), col("query_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("query_vec")
  }

  /** IVF-style coarse quantization with deterministic "centroids" =
    * LSH buckets; returns per-bucket sizes + centroids (mean vector) —
    * the build side of a partition-pruned ANN layout. */
  def ivfBuild(df: DataFrame, vecCol: String, dim: Int, numPlanes: Int): DataFrame = {
    val withBucket = df.withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
    val comps = (0 until dim).map(d => avg(element_at(col(vecCol), d + 1)).as(s"c$d"))
    val aggCols = count(lit(1)).as("n_vectors") +: comps
    withBucket.groupBy("bucket")
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("centroid", array((0 until dim).map(d => col(s"c$d")): _*))
      .select("bucket", "n_vectors", "centroid")
  }

  /** Batched exact top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKHits]]): identical results to
    * [[bruteForceTopKBatchWindow]], different physical shape — the
    * window plan shuffles every scored (query, vector) row (N·M for M
    * queries) and sorts each group; this plan's map-side partial
    * aggregation prunes every partition to k rows per query BEFORE the
    * exchange, so the shuffle moves k·partitions·M rows regardless of
    * corpus size. The scale path for batch KNN, and what
    * [[bruteForceTopKBatch]] runs. */
  def bruteForceTopKBatchAgg(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String, k: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(queries.select(
        col(queryIdCol).as("query_id"), col(queryVecCol).as("query_vec"))))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), col("query_vec")))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions.topKHits(col("cosine"), col(idCol), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("query_id"), col("h.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"), col("h.score").as("cosine"))
  }

  /** Leave-one-out kNN CLASSIFICATION over a labeled embedding table —
    * the standard embedding-quality eval (a good embedding space puts
    * same-label items together, so the k-nearest-neighbor majority
    * vote recovers the label). Self is excluded; the vote breaks ties
    * (count desc, label asc), so the prediction is deterministic.
    * Returns (id, true_label, pred_label) per vector.
    *
    * Scale shape: the batch-KNN heap-aggregate plan with the table
    * itself broadcast as the anchor set (an embedding table of
    * anchor-eval size broadcasts; for a full-corpus self-eval, slice
    * the anchor side into batches — the per-batch plan is unchanged).
    * The exchange carries k rows per (partition, anchor); the label
    * join-back and the vote ride broadcast + partial aggregates — no
    * window sort anywhere. */
  def knnClassify(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame =
    knnClassifyOver(df, df, idCol, vecCol, labelCol, k)

  /** Sampled-anchor LOO kNN eval — the documented AT-SCALE default:
    * exact [[knnClassify]] makes every vector an anchor, so the eval
    * is inherently N² (fine as an offline gate, a scale-killer as a
    * routine metric). This variant anchors only rows with
    * `id % sampleMod == 0` — a DETERMINISTIC, engine-portable sample
    * (no rand(): replays identically across engines and retries) —
    * while neighbors remain the FULL table (self excluded), so each
    * sampled anchor's prediction is bit-identical to what the exact
    * eval would produce for that anchor; sampling changes only which
    * anchors the accuracy rollup averages over.
    *
    * `maxAnchorId` BOUNDS the anchor count independent of corpus size:
    * a pure modulus sample is a corpus FRACTION, so its cost is still
    * quadratic — (N/mod)·N — and the sf1 scaling bench showed exactly
    * that (119× at 10× data). With the id bound the anchor set is a
    * fixed-size deterministic panel and cost is anchors·N — linear in
    * the corpus, the shape an at-scale eval needs. */
  def knnClassifySampled(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, sampleMod: Long,
      maxAnchorId: Long = Long.MaxValue): DataFrame = {
    require(sampleMod >= 1, "sampleMod must be >= 1")
    val anchors = df.filter(pmod(col(idCol), lit(sampleMod)) === 0 &&
      col(idCol) < lit(maxAnchorId))
    assertPanelNonEmpty(anchors, df, "knnClassifySampled")
    knnClassifyOver(df, anchors, idCol, vecCol, labelCol, k)
  }

  /** Guard against the silent-vacuous-eval failure mode of fixed id
    * panels (`id < bound` assumes ids dense from 0): a corpus whose
    * ids all start above the bound selects ZERO anchors, and the
    * zero-row result still "verifies" because the oracle applies the
    * same slice. Two limit-1 scans (panel first, full table only if
    * the panel came back empty) — bounded work, loud failure. */
  private[graft] def assertPanelNonEmpty(panel: DataFrame, full: DataFrame,
      what: String): Unit =
    require(!panel.isEmpty || full.isEmpty,
      s"$what: the fixed anchor/query panel selected ZERO rows from a " +
        "non-empty table — id-bound panels assume ids dense from 0; " +
        "re-key the corpus or widen the bound")

  /** SIMD batched partial top-k: the hot kernel under the batch-KNN
    * family (LOO classify, hard negatives). Anchors arrive as driver
    * arrays (the callers' ScaleBounds contracts bound the panel; the
    * previous `broadcast(anchors)` cross-join collected them to the
    * driver too) and ship as ONE broadcast in TRANSPOSED layout
    * (`colsByDim(d)(a)`), so each corpus row's scores against all
    * anchors are a saxpy accumulation over dimensions —
    * [[graft.embed.VectorKernels]] lanes across the anchor axis.
    *
    * BIT-IDENTICAL to the per-pair [[VectorFunctions.cosineSimilarity]]
    * expression: each (row, anchor) dot / row-norm / anchor-norm is
    * summed in ascending dimension order with one IEEE multiply+add
    * per element (the kernels' no-reduction/no-FMA contract), the
    * score is `dot / sqrt(nx·ny)` with the same zero-norm guard, and
    * per-anchor partials keep TopKBuffer's (score desc, id asc)
    * order — so downstream TopKHits merges see exactly the rows the
    * cross-join plan produced. The expression's min-length semantics
    * survive via the ragged-row fallback.
    *
    * Scale shape: one corpus pass (repartitioned up to the session
    * parallelism when the scan is under-split), partials of
    * k·anchors·partitions rows into the existing TopKHits merge —
    * shuffle volume unchanged from the cross-join plan, per-pair cost
    * ~10× lower (no per-pair join-row materialization, SIMD lanes). */
  private def simdTopKPartials(df: DataFrame, idCol: String, vecCol: String,
      labelCol: Option[String], aIds: Array[Long],
      aVecs: Array[Array[Double]], aLabels: Array[Long], k: Int,
      excludeSelf: Boolean, excludeSameLabel: Boolean,
      aExcl: Array[Array[Long]] = null): DataFrame = {
    require(!excludeSameLabel || labelCol.nonEmpty,
      "excludeSameLabel needs a corpus label column")
    // optional per-anchor excluded-id sets (contrastive mining's
    // same-cluster exclusions): SORTED arrays, binary-searched in the
    // hot loop — sets are pair-graph-tiny, the search is ~log2(|excl|)
    require(aExcl == null ||
      (aExcl.length == aIds.length && aExcl.forall(e =>
        e != null && (e.isEmpty || e.zip(e.tail).forall(p => p._1 <= p._2)))),
      "aExcl must be one SORTED array per anchor")
    val spark = df.sparkSession
    import spark.implicits._
    val nA = aIds.length
    val dim = if (nA == 0) 0 else aVecs(0).length
    require(aVecs.forall(_.length == dim), "anchor dims must agree")
    // transposed layout + per-anchor norms, both in ascending-dim
    // accumulation order (the expression's order)
    val colsByDim = Array.ofDim[Double](dim, nA)
    val norms = new Array[Double](nA)
    var a = 0
    while (a < nA) {
      val v = aVecs(a)
      var d = 0; var ny = 0.0
      while (d < dim) { colsByDim(d)(a) = v(d); ny += v(d) * v(d); d += 1 }
      norms(a) = ny; a += 1
    }
    val bc = spark.sparkContext.broadcast(
      (colsByDim, norms, aIds, aLabels, aVecs, aExcl))

    val base0 = labelCol match {
      case Some(lc) =>
        val f = df.select(col(idCol).cast("long"),
          col(vecCol).cast("array<double>"), col(lc).cast("long"))
        (if (excludeSameLabel) f.filter(col(lc).isNotNull) else f)
          .filter(col(idCol).isNotNull)
      case None =>
        df.select(col(idCol).cast("long"),
          col(vecCol).cast("array<double>"), lit(0L))
          .filter(col(idCol).isNotNull)
    }
    val base = base0.as[(Long, Array[Double], Long)]
    val parts = spark.sparkContext.defaultParallelism
    val sized = if (base.rdd.getNumPartitions < parts) base.repartition(parts) else base

    sized.mapPartitions { it =>
      val (cols, nys, ids, lbls, avs, excl) = bc.value
      val n = ids.length
      val heaps = Array.fill(n)(new graft.functions.TopKBuffer(k))
      val out = new Array[Double](n)
      @inline def excluded(ai: Int, id: Long): Boolean =
        excl != null && java.util.Arrays.binarySearch(excl(ai), id) >= 0
      it.foreach { case (id, x, lbl) =>
        if (x != null && n > 0) {
          if (x.length == dim) {
            java.util.Arrays.fill(out, 0.0)
            var nx = 0.0
            var d = 0
            while (d < dim) { nx += x(d) * x(d); d += 1 }
            d = 0
            while (d + 4 <= dim) {
              graft.embed.VectorKernels.saxpy4(
                x(d), cols(d), x(d + 1), cols(d + 1),
                x(d + 2), cols(d + 2), x(d + 3), cols(d + 3), out)
              d += 4
            }
            while (d < dim) {
              graft.embed.VectorKernels.saxpy(x(d), cols(d), out); d += 1
            }
            var ai = 0
            while (ai < n) {
              if (!((excludeSelf && ids(ai) == id) ||
                  (excludeSameLabel && lbls(ai) == lbl) ||
                  excluded(ai, id))) {
                val ny = nys(ai)
                val s = if (nx == 0.0 || ny == 0.0) 0.0
                  else out(ai) / math.sqrt(nx * ny)
                heaps(ai).insert(s, id)
              }
              ai += 1
            }
          } else {
            // ragged row: per-pair scalar with the expression's
            // min-length semantics (norms over the shared prefix only)
            var ai = 0
            while (ai < n) {
              if (!((excludeSelf && ids(ai) == id) ||
                  (excludeSameLabel && lbls(ai) == lbl) ||
                  excluded(ai, id))) {
                val av = avs(ai)
                val m = math.min(x.length, dim)
                var dot = 0.0; var nx = 0.0; var ny = 0.0; var d = 0
                while (d < m) {
                  val xi = x(d); val yi = av(d)
                  dot += xi * yi; nx += xi * xi; ny += yi * yi; d += 1
                }
                val s = if (nx == 0.0 || ny == 0.0) 0.0
                  else dot / math.sqrt(nx * ny)
                heaps(ai).insert(s, id)
              }
              ai += 1
            }
          }
        }
      }
      (0 until n).iterator.flatMap { ai =>
        val h = heaps(ai)
        (0 until h.size).iterator.map(i => (ids(ai), h.ids(i), h.scores(i)))
      }
    }.toDF("anchor_id", "__nid", "cosine")
  }

  /** The SIMD partial-scorer plan reads ids and labels as primitive
    * longs; a non-integral column would silently cast to null and DROP
    * rows (anchors gone, corpus rows gone under excludeSameLabel) — a
    * narrowed contract that must fail loudly at plan time, not return
    * an empty frame. */
  private def requireIntegral(df: DataFrame, colName: String,
      what: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(colName).dataType
    val integral = dt == ByteType || dt == ShortType ||
      dt == IntegerType || dt == LongType
    require(integral,
      s"$what: column '$colName' must be an integral type (got ${dt.sql}); " +
        "the SIMD scorer reads ids/labels as longs — a non-integral " +
        "column would cast to null and silently drop rows")
  }

  private def knnClassifyOver(df: DataFrame, anchorsDf: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    requireIntegral(df, idCol, "knnClassify corpus")
    requireIntegral(df, labelCol, "knnClassify corpus")
    requireIntegral(anchorsDf, idCol, "knnClassify anchors")
    requireIntegral(anchorsDf, labelCol, "knnClassify anchors")
    // bounded anchor panel → driver arrays (the broadcast cross-join
    // collected the same rows); null-vec/null-id anchors drop exactly
    // as the per-pair plan dropped them (null cosine / null-filtered)
    val anchorRows = anchorsDf
      .select(col(idCol).cast("long").as("aid"),
        col(vecCol).cast("array<double>").as("av"))
      .filter(col("aid").isNotNull && col("av").isNotNull)
      .collect()
    val aIds = anchorRows.map(_.getLong(0))
    val aVecs = anchorRows.map(_.getSeq[Double](1).toArray)
    val partials = simdTopKPartials(df, idCol, vecCol, None,
      aIds, aVecs, new Array[Long](aIds.length), k,
      excludeSelf = true, excludeSameLabel = false)
    val aLabelFrame = anchorsDf.select(col(idCol).cast("long").as("anchor_id"),
      col(labelCol).as("anchor_label"))
    val labels = df.select(col(idCol).as("__nid0"), col(labelCol).as("__nlabel"))
    val votes = partials.groupBy(col("anchor_id"))
      .agg(graft.functions.TopKFunctions.topKHits(col("cosine"), col("__nid"), k).as("hits"))
      .join(broadcast(aLabelFrame), "anchor_id")
      .select(col("anchor_id"), col("anchor_label"),
        explode(col("hits")).as("h"))
      .select(col("anchor_id"), col("anchor_label"), col("h.id").as("__nid0"))
      .join(broadcast(labels), "__nid0")
      .groupBy(col("anchor_id"), col("anchor_label"), col("__nlabel"))
      .agg(count(lit(1)).as("__n"))
    votes.groupBy(col("anchor_id"), col("anchor_label"))
      .agg(max(struct(col("__n"),
        (-col("__nlabel")).cast("long").as("__negl"))).as("m"))
      .select(col("anchor_id").as(idCol),
        col("anchor_label").as("true_label"),
        (-col("m.__negl")).cast("int").as("pred_label"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the `k` most-similar vectors with a DIFFERENT label — the
    * near-miss negatives that make an embedding model actually learn a
    * boundary (random negatives are trivially far; the informative
    * ones are the similar-but-wrong items this query surfaces).
    *
    * Scale shape: identical to the batch-KNN heap-aggregate plan
    * ([[bruteForceTopKBatchAgg]]) — anchors broadcast, the label
    * inequality filters BEFORE scoring feeds the bounded TopKHits
    * aggregate, so the exchange moves k rows per (partition, anchor),
    * never the scored corpus. */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, anchorIdCol: String,
      anchorVecCol: String, anchorLabelCol: String, k: Int): DataFrame = {
    requireIntegral(df, idCol, "hardNegatives corpus")
    requireIntegral(df, labelCol, "hardNegatives corpus")
    requireIntegral(anchors, anchorIdCol, "hardNegatives anchors")
    requireIntegral(anchors, anchorLabelCol, "hardNegatives anchors")
    // SIMD partial-scorer plan (bit-identical rows to the broadcast
    // cross-join — see simdTopKPartials); null-label/null-vec anchors
    // drop exactly as the `label =!= anchor_label` filter / null
    // cosine dropped them. Labels must be integral (the same contract
    // the classify vote's long cast already assumes).
    val anchorRows = anchors
      .select(col(anchorIdCol).cast("long").as("aid"),
        col(anchorVecCol).cast("array<double>").as("av"),
        col(anchorLabelCol).cast("long").as("albl"))
      .filter(col("aid").isNotNull && col("av").isNotNull && col("albl").isNotNull)
      .collect()
    val aIds = anchorRows.map(_.getLong(0))
    val aVecs = anchorRows.map(_.getSeq[Double](1).toArray)
    val aLabels = anchorRows.map(_.getLong(2))
    val partials = simdTopKPartials(df, idCol, vecCol, Some(labelCol),
      aIds, aVecs, aLabels, k, excludeSelf = false, excludeSameLabel = true)
    partials.groupBy(col("anchor_id"))
      .agg(graft.functions.TopKFunctions.topKHits(col("cosine"), col("__nid"), k).as("hits"))
      .select(col("anchor_id"), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("anchor_id"), col("h.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"), col("h.score").as("cosine"))
  }

  /** Contrastive training-pair mining — the dataset-construction step
    * for embedding-model training: each near-duplicate pair (the
    * POSITIVE signal, e.g. from [[graft.ops.Dedup.jaccardPairs]])
    * gets the anchor's HARD NEGATIVE attached — the most-similar
    * vector that is NOT the anchor itself and NOT one of the anchor's
    * near-dup partners in either pair direction (a same-cluster item
    * mislabeled as negative would poison the loss).
    *
    * Returns one row per input pair:
    * (anchor_id, positive_id, jaccard, negative_id, neg_cosine).
    *
    * Scale shape: the pair graph and its exclusion edges broadcast
    * (near-dup output is corpus-tiny by the capped-pair construction);
    * negative mining is the bounded TopKHits heap-aggregate batch plan
    * over anchors — k=1 rows per (partition, anchor) cross the
    * exchange. Mining batches of anchors (the caller slices the pair
    * frame) keep the broadcast bounded on adversarially dirty
    * corpora. */
  def contrastiveTriples(pairs: DataFrame, vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    // SIMD partial-scorer plan (r14): the previous broadcast cross-join
    // + codegen max(struct) was the correct linear plan but still paid
    // per-pair join-row materialization — the sf10 #1 resident at 48 s.
    // The anchor panel and the pair graph's exclusion edges are both
    // bounded by the caller's batching contract (they were broadcast
    // before, i.e. driver-collected already); mining is now one corpus
    // pass through [[simdTopKPartials]] — bit-identical scores, k=1
    // heap per anchor, same (score desc, lowest id) tie-break as the
    // old max(struct(score, -id)).
    val anchorRows = pairs.select(col("id_a")).distinct()
      .join(vecs.select(col(idCol).cast("long").as("id_a"),
        col(vecCol).cast("array<double>").as("__av")), "id_a")
      .filter(col("__av").isNotNull)
      .collect()
    val aIds = anchorRows.map(_.getLong(0))
    val aVecs = anchorRows.map(_.getSeq[Double](1).toArray)
    // same-cluster exclusions: the anchor itself + partners both ways
    val exclEdges = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("v"))
      .unionByName(pairs.select(col("id_b").cast("long").as("a"),
        col("id_a").cast("long").as("v")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (a, vs) => a -> vs.map(_._2).toSet }
    val aExcl = aIds.map(a =>
      (exclEdges.getOrElse(a, Set.empty[Long]) + a).toArray.sorted)
    val partials = simdTopKPartials(vecs, idCol, vecCol, None,
      aIds, aVecs, new Array[Long](aIds.length), k = 1,
      excludeSelf = false, excludeSameLabel = false, aExcl = aExcl)
    val negs = partials.groupBy(col("anchor_id"))
      .agg(graft.functions.TopKFunctions
        .topKHits(col("cosine"), col("__nid"), 1).as("hits"))
      // fully-excluded anchor → empty heap → no row (as the anti-join
      // plan produced no scored rows for it)
      .filter(size(col("hits")) > 0)
      .select(col("anchor_id").as("id_a"),
        col("hits")(0)("id").as("negative_id"),
        col("hits")(0)("score").as("neg_cosine"))
    pairs.join(broadcast(negs), Seq("id_a"))
      .select(col("id_a").as("anchor_id"), col("id_b").as("positive_id"),
        col("jaccard"), col("negative_id"), col("neg_cosine"))
  }

  /** Embedding-distribution drift between two corpora (a deployment
    * monitor: did the embedding model change, did the data shift?):
    * per dimension, the micro-snapped mean of each side and the
    * absolute difference, plus each side's row count. Means snap to
    * exact micro-units (the [[graft.ops.Clustering.kmeans]]
    * convention) so the comparison — and any alert threshold on it —
    * is a pure function of the data, replayable in SQL.
    *
    * Scale shape: ONE partial-agg aggregate per side (dim running
    * sums per task), a dim-row output — no shuffle of vector rows, no
    * join of the two corpora. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    def sideMeans(df: DataFrame, tag: String): DataFrame = {
      val v = df.select(col(vecCol).cast("array<double>").as("__v"))
      val meanCols = (0 until dim).map(i =>
        round(avg(col("__v")(i)) * 1000000.0).cast("long").as(s"m$i"))
      v.agg(meanCols.head, (meanCols.tail :+ count(lit(1)).as(s"n_$tag")): _*)
        .select(explode(map((0 until dim).flatMap(i =>
            Seq(lit(i), col(s"m$i"))): _*)).as(Seq("d", s"mean_${tag}_micro")),
          col(s"n_$tag"))
    }
    sideMeans(a, "a").join(sideMeans(b, "b"), Seq("d"))
      .select(col("d").cast("long").as("d"),
        col("n_a"), col("n_b"),
        (col("mean_a_micro").cast("double") / 1e6).as("mean_a"),
        (col("mean_b_micro").cast("double") / 1e6).as("mean_b"),
        (abs(col("mean_a_micro") - col("mean_b_micro")).cast("double") / 1e6)
          .as("abs_drift"))
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * diversified rerank: greedily select `k` results from the exact
    * relevance top-`poolSize`, each step maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the classic redundancy
    * penalty that keeps a search page (or a RAG context window) from
    * filling with near-copies of the first hit.
    *
    * Determinism/replayability: relevance and pairwise cosines are
    * rounded to integer MICRO-units (half-away-from-zero, the SQL
    * `round` convention) and λ = lambdaNum/10, so each greedy step's
    * objective `lambdaNum·rel_µ − (10−lambdaNum)·maxSim_µ` is exact
    * 64-bit integer arithmetic with id tie-breaks — an unrolled SQL
    * replay selects the identical sequence. The first pick's penalty
    * term is 0 (empty selected set).
    *
    * Scale shape: stage 1 is the distributed exact top-poolSize
    * (TakeOrdered — bounded result, no global sort); the greedy loop
    * is O(poolSize·k) dim-length dot products on the DRIVER over the
    * collected pool. MMR is sequential by definition — the pool bound
    * IS the distributed contract, the same two-stage shape as every
    * rerank stage in the repo (candidates distributed, rerank small). */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], poolSize: Int, k: Int,
      lambdaNum: Int = 7): DataFrame = {
    require(lambdaNum >= 0 && lambdaNum <= 10, "lambdaNum is tenths in [0,10]")
    require(k >= 1 && poolSize >= k, "need poolSize >= k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val pool = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosineSimilarity(col("v"), lit(queryVec)))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(poolSize)
      .collect()
    // micro-unit rounding, half away from zero — matches SQL round()
    def micro(x: Double): Long = {
      val m = x * 1e6
      if (m >= 0) math.floor(m + 0.5).toLong else math.ceil(m - 0.5).toLong
    }
    // identical accumulation order to the CosineSimilarity kernel
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val ids = pool.map(_.getLong(0))
    val vecs = pool.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val relM = pool.map(r => micro(r.getDouble(2)))
    val n = ids.length
    val maxSimM = Array.fill(n)(0L)
    val taken = Array.fill(n)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    var step = 1
    while (step <= math.min(k, n)) {
      var best = -1
      var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = lambdaNum * relM(i) - (10 - lambdaNum) * maxSimM(i)
          if (s > bestScore || (s == bestScore && (best < 0 || ids(i) < ids(best)))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      out += ((step.toLong, ids(best), relM(best).toDouble / 1e6,
        bestScore.toDouble / 1e7))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = micro(cos(vecs(j), vecs(best)))
          if (s > maxSimM(j)) maxSimM(j) = s
        }
        j += 1
      }
      step += 1
    }
    out.toSeq.toDF("rank", idCol, "relevance", "mmr_score")
  }

  /** Materialized IVF layout: vectors Parquet-partitioned by LSH
    * bucket + a tiny `centroids` side table (≤ 2^numPlanes rows). The
    * build cost is one shuffle-free scan for bucketing plus one
    * aggregation for centroids; queries against the layout
    * ([[ivfTopKStored]]) then prune at the SOURCE — only the probed
    * buckets' files are read. */
  def ivfWrite(df: DataFrame, dir: String, vecCol: String, dim: Int,
      numPlanes: Int): Unit = {
    df.withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/vectors")
    ivfBuild(df, vecCol, dim, numPlanes)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Incremental upsert into an [[ivfWrite]] layout — index maintenance
    * without a full rebuild. Rows whose id already exists are REPLACED
    * (including vectors whose new embedding lands in a different
    * bucket: the old copy is removed from its old bucket); new ids are
    * inserted. Single-writer contract, like the build.
    *
    * Scale shape — work is proportional to TOUCHED buckets, never the
    * index size:
    *  1. locate old copies of the upserted ids with a column-pruned
    *     (id, bucket) scan + a broadcast semi-join (the upsert batch is
    *     the small side by construction);
    *  2. rewrite only the union of old+new buckets via DYNAMIC
    *     partition overwrite (survivors = old rows anti-joined on the
    *     upserted ids, plus the new rows); untouched bucket partitions
    *     are never read or written;
    *  3. recompute centroids for touched buckets only, merged into the
    *     collected (≤ 2^numPlanes-row) centroid table; buckets emptied
    *     by a move have their partition dir removed and centroid row
    *     dropped.
    *
    * The plane family is deterministic by (plane, dim), so bucket
    * assignment needs no state from the stored layout. */
  def ivfUpsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      numPlanes: Int): Unit = {
    val vecsPath = s"$dir/vectors"
    val newB = newVecs
      .withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newIds = newB.select(col(idCol)).distinct()
    require(newB.count() == newIds.count(),
      s"ivfUpsert batch has duplicate $idCol values — an upsert needs one row per id")
    // old buckets of replaced ids: reads only (id, bucket) — bucket is
    // the partition column, so this scan moves one slim column per row
    val oldLoc = spark.read.parquet(vecsPath)
      .select(col(idCol), col("bucket").cast("long").as("bucket"))
      .join(broadcast(newIds), Seq(idCol))
    val touched = (newB.select(col("bucket").cast("long")).distinct()
      .unionByName(oldLoc.select(col("bucket")).distinct())
      .distinct().collect().map(_.getLong(0))).sorted.toSeq
    // survivors of the touched buckets + the new rows, one dynamic
    // partition overwrite (only partitions present in this frame are
    // replaced)
    val survivors = spark.read.parquet(vecsPath)
      .filter(col("bucket").isin(touched: _*))
      .withColumn("bucket", col("bucket").cast("long"))
      .join(broadcast(newIds), Seq(idCol), "left_anti")
    // localCheckpoint materializes the touched-bucket survivors BEFORE
    // the write: the write overwrites the same path the survivors were
    // read from, which Spark (correctly) refuses in one lazy plan.
    // The FULL stored schema is preserved — attribute columns (labels,
    // sources — what filtered ANN and the stats sidecar index) ride
    // along with the vectors, so the upsert batch must carry them too.
    val storedCols = survivors.columns.toSeq
    require(storedCols.toSet.subsetOf(newB.columns.toSet),
      s"ivfUpsert batch is missing stored columns: " +
        storedCols.toSet.diff(newB.columns.toSet).mkString(", "))
    val rewritten = survivors.select(storedCols.map(col): _*)
      .unionByName(newB.select(storedCols.map(col): _*))
      .localCheckpoint(true)
    val keptBuckets = rewritten.select(col("bucket"))
      .distinct().collect().map(_.getLong(0)).toSet
    // stats-sidecar invalidation BEFORE the vectors rewrite (mirrors
    // ProductQuantization.invalidateStats ordering): a crash between
    // the vectors overwrite and the sidecar refresh must leave a
    // MISSING sidecar, never a stale one whose overcounts under-size
    // probePrefix and silently return fewer than k rows. The untouched-
    // bucket rows are materialized (localCheckpoint) before the delete
    // so the merge at the end needs no read of the deleted path.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(vecsPath), spark.sparkContext.hadoopConfiguration)
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val keptStats: Option[(Seq[String], DataFrame)] =
      if (fs.exists(statsPath)) {
        val old = spark.read.parquet(s"$dir/stats")
        val statsCols = old.select("col_name").distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        val kept = old.filter(!col("bucket").isin(touched: _*))
          .localCheckpoint(true)
        fs.delete(statsPath, true)
        Some((statsCols, kept))
      } else None
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(vecsPath)
    // a touched bucket with NO surviving or new rows contributes nothing
    // to the write, so dynamic overwrite never clears it — drop its
    // stale partition dir explicitly (bounded by the touched count)
    touched.filterNot(keptBuckets).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$vecsPath/bucket=$b"), true)
    }
    // centroid maintenance: collect the tiny table, replace touched rows
    val oldCentroids = spark.read.parquet(s"$dir/centroids")
      .filter(!col("bucket").isin(touched: _*))
    val freshCentroids = ivfBuild(
      spark.read.parquet(vecsPath)
        .filter(col("bucket").isin(touched: _*)).drop("bucket"),
      vecCol, dim, numPlanes)
    val merged = oldCentroids.unionByName(freshCentroids).collect()
    val centroidSchema = spark.read.parquet(s"$dir/centroids").schema
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(merged: _*)),
        centroidSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // stats-sidecar rebuild, same touched-buckets-only shape as the
    // centroids: indexed columns are self-described by the sidecar's
    // col_name domain, kept rows were checkpointed above (before the
    // invalidation), fresh rows come from one grouped scan of the
    // rewritten touched partitions.
    keptStats.foreach { case (statsCols, kept) =>
      val fresh = bucketStats(
        spark.read.parquet(vecsPath)
          .filter(col("bucket").isin(touched: _*))
          .withColumn("bucket", col("bucket").cast("long")),
        statsCols)
      val mergedStats = kept.unionByName(fresh).localCheckpoint(true)
      writeStatsRows(spark, dir, mergedStats)
    }
    newB.unpersist()
  }

  /** Per-bucket attribute-count sidecar for the [[ivfWrite]] layout —
    * the stats that make FILTERED stored-ANN queries skip the counting
    * scan entirely. For each listed attribute column the sidecar holds
    * one row per (bucket, column, value): the number of stored vectors
    * in that bucket carrying that value. It is index METADATA, sized
    * like the centroid table × attribute cardinality (2^numPlanes ·
    * Σ|domain|) — never like the corpus — so a query reads it
    * driver-side the way it reads centroids.
    *
    * One grouped scan per attribute over the stored vectors builds it;
    * [[ivfUpsert]] maintains it incrementally (touched buckets only).
    * Attribute domains are assumed low-cardinality (labels, sources,
    * shards — the columns one filters ANN by); a high-cardinality
    * column would bloat the sidecar and belongs in a bloom sidecar
    * instead. */
  def ivfWriteStats(spark: org.apache.spark.sql.SparkSession, dir: String,
      statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "ivfWriteStats needs at least one column")
    val v = spark.read.parquet(s"$dir/vectors")
    writeStatsRows(spark, dir, bucketStats(v, statsCols))
  }

  /** (bucket, col_name, value, cnt) rows for the given attribute
    * columns of a bucketed vector frame — the ONE definition of the
    * stats-sidecar schema, shared with the IVF-PQ layout. */
  private[graft] def bucketStats(v: DataFrame, statsCols: Seq[String]): DataFrame =
    statsCols.map { c =>
      v.groupBy(col("bucket").cast("long").as("bucket"),
          col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("col_name", lit(c))
        .select("bucket", "col_name", "value", "cnt")
    }.reduce(_ unionByName _)

  private[graft] def writeStatsRows(spark: org.apache.spark.sql.SparkSession,
      dir: String, stats: DataFrame): Unit =
    stats.repartition(1).write.mode("overwrite").parquet(s"$dir/stats")

  /** Per-bucket counts of one (column, value) from a stats sidecar —
    * the lookup both filtered-stored query paths size probes from. */
  private[graft] def readStatsCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String, statsCol: String, statsValue: String): Map[Long, Long] =
    spark.read.parquet(s"$dir/stats")
      .filter(col("col_name") === statsCol && col("value") === statsValue)
      .select(col("bucket").cast("long"), col("cnt").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Filtered ANN over the STORED [[ivfWrite]] layout — the on-disk
    * twin of [[ivfTopKFiltered]] with the counting scan REPLACED by the
    * [[ivfWriteStats]] sidecar:
    *
    *  1. centroid ranking: driver-side over the ≤ 2^numPlanes-row
    *     centroid table (6-dp rounded cosine, bucket-id tiebreak);
    *  2. per-bucket filtered counts: a LOOKUP in the stats sidecar —
    *     no data file is opened for counting (the in-memory path's
    *     step-2 job disappears, exactly what the sidecar is for);
    *  3. probe sizing: smallest nProbeInit·2^j prefix of the ranking
    *     whose cumulative filtered count reaches k (whole index if
    *     none) — identical arithmetic to the in-memory path, so both
    *     paths and the SQL oracle choose the SAME probe set;
    *  4. one scan of ONLY the probed bucket partitions (`bucket
    *     isin(...)` is a static partition filter — unprobed buckets'
    *     files are never opened), predicate + exact cosine top-k.
    *
    * Returns min(k, total filtered rows) rows — never silently fewer.
    * The predicate is equality on a sidecar-indexed column; compose
    * richer predicates by indexing each column and intersecting
    * per-bucket counts conservatively (min), which keeps the ≥-k
    * guarantee since true conjunctive counts are ≤ min. */
  def ivfTopKFilteredStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, idCol: String, vecCol: String, queryVec: Array[Double],
      k: Int, statsCol: String, statsValue: String,
      nProbeInit: Int = 8): DataFrame = {
    require(k >= 1 && nProbeInit >= 1, "k and nProbeInit must be positive")
    val ranked = spark.read.parquet(s"$dir/centroids")
      .withColumn("centroid_sim",
        round(VectorFunctions.cosineSimilarity(col("centroid"), lit(queryVec)), 6))
      .select(col("bucket").cast("long"), col("centroid_sim"))
      .collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0)))
      .map(_.getLong(0))
    val fc = readStatsCounts(spark, dir, statsCol, statsValue)
    val probed = probePrefix(ranked, fc, k, nProbeInit)
    spark.read.parquet(s"$dir/vectors")
      .filter(col("bucket").isin(probed: _*))
      .filter(col(statsCol).cast("string") === statsValue)
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Probe-doubling arithmetic shared by the filtered paths: smallest
    * nProbeInit·2^j prefix of the similarity-ranked buckets whose
    * cumulative filtered count reaches k; the whole ranking if none
    * does. */
  private[graft] def probePrefix(ranked: Seq[Long], counts: Map[Long, Long],
      k: Int, nProbeInit: Int): Seq[Long] = {
    val cum = ranked.scanLeft(0L)((a, b) => a + counts.getOrElse(b, 0L)).tail
    val minRank = cum.indexWhere(_ >= k.toLong) match {
      case -1 => ranked.length
      case i => i + 1
    }
    var p = nProbeInit
    while (p < minRank) p *= 2
    ranked.take(math.min(p, ranked.length))
  }

  /** Compact an [[ivfWrite]] layout after repeated [[ivfUpsert]]s: each
    * upsert appends at least one file per touched bucket, and small
    * files are the classic death of a partitioned store (every query
    * opens file-count footers, not byte-count). Rewrites each bucket
    * whose file count exceeds `maxFilesPerBucket` into single-file
    * partitions; buckets already compact are untouched (their files
    * are neither read nor written).
    *
    * Scale shape: the bucket selection is a driver-side LISTING (one
    * FileSystem scan of partition dirs — metadata, not data); the
    * rewrite reads only the selected buckets, repartitions by bucket so
    * each writes exactly one file, and replaces them via dynamic
    * partition overwrite. Vectors and centroids are unchanged —
    * asserted in the spec. Single-writer, like the build. */
  def ivfCompact(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerBucket: Int = 1): Unit =
    compactBucketed(spark, s"$dir/vectors", maxFilesPerBucket)

  /** The generic bucket-partition compaction behind [[ivfCompact]] —
    * also maintains any other `bucket=`-partitioned index layout (the
    * IVF-PQ codes store). Selection is a driver-side dir listing
    * (metadata only); only oversized buckets are read or written. */
  private[graft] def compactBucketed(spark: org.apache.spark.sql.SparkSession,
      path: String, maxFilesPerBucket: Int = 1): Unit = {
    require(maxFilesPerBucket > 0, "maxFilesPerBucket must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    val oversized = buckets.filter { b =>
      fs.listStatus(b.getPath).count(f => f.getPath.getName.endsWith(".parquet")) >
        maxFilesPerBucket
    }.map(_.getPath.getName.stripPrefix("bucket=").toLong).sorted.toSeq
    if (oversized.nonEmpty) {
      val compacted = spark.read.parquet(path)
        .filter(col("bucket").isin(oversized: _*))
        .repartition(col("bucket"))
        .localCheckpoint(true)
      compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", 0)
        .partitionBy("bucket").parquet(path)
    }
  }

  /** Query the [[ivfWrite]] layout: rank the centroid table (driver-side
    * — it is index metadata, ≤ 2^numPlanes rows), then scan ONLY the
    * probed partitions: the `bucket isin(...)` filter is a static
    * partition filter, so unprobed buckets' files are never opened —
    * the on-disk analogue of [[ivfTopK]]'s semi-join, with pruning
    * guaranteed at planning time instead of runtime. */
  def ivfTopKStored(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, nProbe: Int): DataFrame = {
    val probed = spark.read.parquet(s"$dir/centroids")
      .withColumn("centroid_sim",
        round(VectorFunctions.cosineSimilarity(col("centroid"), lit(queryVec)), 6))
      .orderBy(col("centroid_sim").desc, col("bucket").asc)
      .limit(nProbe)
      .select("bucket").collect().map(_.getLong(0)).toSeq
    spark.read.parquet(s"$dir/vectors")
      .filter(col("bucket").isin(probed: _*))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF query path: rank bucket centroids by cosine to the query, probe
    * the `nProbe` nearest buckets (broadcast semi-join — the centroid
    * table is ≤ 2^numPlanes rows), exact cosine rank inside the probed
    * set. At scale the data sits Parquet-partitioned by `bucket` and the
    * semi-join becomes dynamic partition pruning: only nProbe/2^planes
    * of the corpus is read. Centroid ranking uses the 6-dp-rounded
    * similarity with a bucket-id tiebreak so the probe set is stable
    * across engines/summation orders.
    *
    * Default `nProbe = 16` (of 64 buckets) from the round-6 recall
    * probe (BASELINE.md): clustered-corpus recall@10 0.965 at 16 vs
    * 0.92 at 8, for ~10% more query time; the uniform worst case
    * needs 32+ (0.90) — tune per corpus. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryVec: Array[Double], k: Int, numPlanes: Int = 6, nProbe: Int = 16): DataFrame = {
    val withBucket = df.withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
    val probed = ivfBuild(df, vecCol, dim, numPlanes)
      .withColumn("centroid_sim",
        round(VectorFunctions.cosineSimilarity(col("centroid"), lit(queryVec)), 6))
      .orderBy(col("centroid_sim").desc, col("bucket").asc)
      .limit(nProbe)
      .select("bucket")
    withBucket.join(broadcast(probed), Seq("bucket"), "left_semi")
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Predicate-aware IVF search with ADAPTIVE PROBE WIDENING — the
    * "filtered vector search" semantics of modern vector stores. A
    * post-filter over a fixed probe set silently returns < k whenever
    * the predicate is selective (the classic filtered-ANN failure);
    * this path instead sizes the probe set FROM the filtered counts:
    *
    *  1. rank all buckets by centroid similarity (the stored-index
    *     artifact — centroids come from the FULL corpus, predicates
    *     change per query);
    *  2. count the predicate's survivors per bucket — a map + partial
    *     agg with NO cosine work (a stored layout keeps these counts
    *     as footer stats and skips the job entirely);
    *  3. probe the smallest `nProbeInit · 2^j` prefix of the ranking
    *     whose cumulative filtered count reaches k (the whole index if
    *     none does) — exactly what iterative probe-doubling converges
    *     to, computed in one step;
    *  4. exact cosine top-k over the filtered rows of those buckets.
    *
    * The probe set is a deterministic function of (corpus, predicate,
    * k), so the SQL oracle replays it; guarantee: returns min(k, total
    * filtered rows) rows — never silently fewer. Bucket ranking uses
    * 6 dp-rounded centroid similarity, ties to the lower bucket id. */
  def ivfTopKFiltered(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryVec: Array[Double], k: Int, predicate: Column,
      nProbeInit: Int = 8, numPlanes: Int = 6): DataFrame = {
    require(k >= 1 && nProbeInit >= 1, "k and nProbeInit must be positive")
    val withBucket = df.withColumn("bucket", lshBucketColumn(col(vecCol), dim, numPlanes))
    val stats = ivfBuild(df, vecCol, dim, numPlanes)
      .withColumn("centroid_sim",
        round(VectorFunctions.cosineSimilarity(col("centroid"), lit(queryVec)), 6))
      .select("bucket", "centroid_sim")
    val fCounts = withBucket.filter(predicate)
      .groupBy("bucket").agg(count(lit(1)).as("fc"))
    val rankedRows = stats.join(fCounts, Seq("bucket"), "left")
      .select(col("bucket"), col("centroid_sim"), coalesce(col("fc"), lit(0L)).as("fc"))
      .collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0)))
    val probed = probePrefix(rankedRows.map(_.getLong(0)).toSeq,
      rankedRows.map(r => r.getLong(0) -> r.getLong(2)).toMap, k, nProbeInit)
    withBucket.filter(col("bucket").isin(probed: _*)).filter(predicate)
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), lit(queryVec)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .drop("bucket")
  }

  /** ColBERT-style late-interaction (MaxSim) scoring (Khattab & Zaharia
    * 2020 §3): a document is a BAG of vectors in the exploded
    * (doc, vector) row layout — the scale-friendly form (fixed-width
    * rows, pruned scans; a nested array-of-arrays column defeats both);
    * score(doc) = Σ over query tokens q of max over the doc's vectors v
    * of cos(q, v).
    *
    * Plan: ONE corpus scan — each row evaluates |Q| codegen'd cosines
    * against LITERAL query vectors (Q is a handful of token embeddings,
    * broadcast as constants), the per-doc aggregate takes |Q| maxes
    * (map-side combinable: one |Q|-column row per (partition, doc)
    * crosses the exchange), then a fixed-order sum and TakeOrdered k.
    * No join, no explode. Cosines are 6 dp-rounded BEFORE the max and
    * the sum is left-associated so Spark and the SQL oracle pick
    * identical scores bit for bit. */
  def maxSimTopK(vecs: DataFrame, docCol: String, vecCol: String,
      queryVecs: Seq[Array[Double]], k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "maxSim needs at least one query vector")
    val cosCols = queryVecs.zipWithIndex.map { case (q, i) =>
      round(VectorFunctions.cosineSimilarity(col(vecCol), lit(q)), 6).as(s"__c$i")
    }
    val maxes = queryVecs.indices.map(i => max(col(s"__c$i")).as(s"__m$i"))
    val score = queryVecs.indices.map(i => col(s"__m$i")).reduce(_ + _)
    vecs.select(col(docCol).as("doc_id") +: cosCols: _*)
      .groupBy("doc_id")
      .agg(maxes.head, maxes.tail: _*)
      .select(col("doc_id"), round(score, 6).as("maxsim"))
      .orderBy(col("maxsim").desc, col("doc_id").asc)
      .limit(k)
  }
}
