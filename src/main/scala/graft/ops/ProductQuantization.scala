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

  private def subvec(v: Column, j: Int, ds: Int): Column =
    slice(v, j * ds + 1, ds)

  /** `iters` Lloyd mean-updates per subspace (0 = seed codebook as-is:
    * the subvectors of the `ksub` lowest-id rows). */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int): PqCodebook = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must divide evenly into m ($m) subspaces")
    require(ksub > 0 && iters >= 0, "ksub must be positive, iters non-negative")
    val ds = dim / m
    val v = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val seeds = v.orderBy(col("__id").asc).limit(ksub).collect()
      .map(_.getSeq[Double](1).toVector)
    require(seeds.length == ksub, s"need at least ksub=$ksub rows to seed the codebook")
    var cb = PqCodebook(dim, m, ksub,
      (0 until m).map(j => seeds.map(_.slice(j * ds, (j + 1) * ds)).toVector).toVector)

    for (_ <- 1 to iters) {
      // one explode row → (subspace, code, subvector), one m·ksub-group agg
      val codes = PqFunctions.pqCodes(col("__v"), cb.kernel)
      val assigned = v.select(explode(array((0 until m).map(j =>
          struct(lit(j).as("j"), element_at(codes, j + 1).as("code"),
            subvec(col("__v"), j, ds).as("sv"))): _*)).as("a"))
        .select(col("a.j"), col("a.code"), col("a.sv"))
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
    * [[Quantization.quantizedTopK]]'s output shape. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, m: Int, ksub: Int, iters: Int,
      candidates: Int = 50, trained: Option[PqCodebook] = None): DataFrame = {
    val dim = query.length
    val cb = trained.getOrElse(train(df, idCol, vecCol, dim, m, ksub, iters))
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
}
