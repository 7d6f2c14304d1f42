package graft.ops

import graft.functions.{GramFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction step of an embedding pipeline (index shrinking, whitening
  * before clustering, Matryoshka-style truncation with data-adapted
  * axes instead of prefix axes).
  *
  * Design for 100 TB, deterministic end to end:
  *
  *  - ONE distributed pass accumulates the exact integer-micro-unit
  *    gram buffer ([[graft.functions.GramMatrix]]): a d+d(d+1)/2-long
  *    buffer per partition, elementwise-add merge — shuffle volume is
  *    partitions·17 KB at d=64, independent of row count, and the
  *    result is bit-identical under any partitioning (integer adds
  *    commute), so the whole model is reproducible without float
  *    snapping.
  *  - The d×d covariance eigensolve runs on the DRIVER (cyclic Jacobi;
  *    d is an embedding dimension, 64–4096 — microseconds to seconds,
  *    never data-sized). Eigenvectors are sign-normalized (first
  *    component of largest magnitude made positive) so the basis is
  *    unique.
  *  - [[project]] is MAP-ONLY: k codegen'd dot products per row
  *    against literal component arrays, the [[Clustering]] centroid
  *    idiom — no shuffle, no UDF.
  *
  * Reference for the pipeline role: embedding post-processing in
  * vector stores (the reference app stores raw model embeddings;
  * database_interactions.py:118-166 — PCA is the standard shrink step
  * its scale-up would need). */
object Pca {

  /** Fitted model: `mean` (length d), `components` (k rows, each
    * length d, orthonormal, eigenvalue-descending), `eigenvalues`
    * (ALL d, descending), `trace` = total variance. */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double], trace: Double) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** One pass + driver eigensolve. `vecCol` casts to array<double>;
    * rows must all have dimension `dim`. Past ~4M rows the moments
    * come from content-hash shards combined exactly in BigInt
    * ([[GramFunctions.momentsSharded]]) — same model, any corpus. */
  def fit(vecs: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    val (n, s, g) = GramFunctions.momentsSharded(vecs, col(vecCol), dim)
    modelFromBigMoments(n, s, g, dim, k)
  }

  /** Eigensolve from exact micro-unit moments — shared by [[fit]] and
    * the streaming maintainer (whose persisted state IS these longs,
    * so streamed and batch models are bit-identical by construction). */
  def modelFromMoments(n: Long, s: Array[Long], g: Array[Long],
      dim: Int, k: Int): Model =
    modelFromBigMoments(n, s.map(BigInt(_)), g.map(BigInt(_)), dim, k)

  /** BigInt-moment form (exact shard-combined sums past the long
    * envelope); BigInt→double rounds identically to long→double inside
    * the long range, so long-moment callers are bit-unchanged. */
  def modelFromBigMoments(n: Long, s: Array[BigInt], g: Array[BigInt],
      dim: Int, k: Int): Model = {
    require(k > 0 && k <= dim, s"k must be in [1, $dim], got $k")
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val mean = s.map(_.toDouble / 1e6 / n)
    // covariance: E[xy] - E[x]E[y]; micro-products carry 1e12 scale
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = g(idx).toDouble / 1e12 / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (eigVals, eigVecs) = jacobiEigen(cov)
    Model(mean, eigVecs.take(k), eigVals, trace)
  }

  /** Persisted gram state (the streaming maintainer's file): exact
    * micro-unit longs, so merge = elementwise add and the maintained
    * model equals one batch fit over the whole history, bit for bit. */
  final class GramState(val dim: Int) {
    var n: Long = 0L
    val s = new Array[Long](dim)
    val g = new Array[Long](dim * (dim + 1) / 2)
    def merge(dn: Long, ds: Seq[Long], dg: Seq[Long]): Unit = {
      n += dn
      var i = 0
      while (i < s.length) { s(i) += ds(i); i += 1 }
      i = 0
      while (i < g.length) { g(i) += dg(i); i += 1 }
    }
  }

  object GramIO {
    def read(path: java.nio.file.Path, dim: Int): GramState = {
      val st = new GramState(dim)
      if (java.nio.file.Files.exists(path)) {
        val bb = java.nio.ByteBuffer.wrap(java.nio.file.Files.readAllBytes(path))
        val d = bb.getInt()
        require(d == dim, s"gram state dim $d != requested $dim")
        st.n = bb.getLong()
        var i = 0
        while (i < st.s.length) { st.s(i) = bb.getLong(); i += 1 }
        i = 0
        while (i < st.g.length) { st.g(i) = bb.getLong(); i += 1 }
      }
      st
    }

    def write(path: java.nio.file.Path, st: GramState): Unit = {
      val bb = java.nio.ByteBuffer.allocate(
        12 + 8 * (st.s.length + st.g.length))
      bb.putInt(st.dim); bb.putLong(st.n)
      st.s.foreach(bb.putLong); st.g.foreach(bb.putLong)
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, bb.array())
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Model from a maintained state file. */
  def modelFromState(path: java.nio.file.Path, dim: Int, k: Int): Model = {
    val st = GramIO.read(path, dim)
    modelFromMoments(st.n, st.s, st.g, dim, k)
  }

  /** Map-only projection: z_j = (x − mean)·c_j, computed as
    * dot(x, c_j) − dot(mean, c_j) so the per-row work is k literal-
    * array dot products (codegen'd) and the mean correction is a plan
    * constant. Output: (idCol, z: array<double>, sq_norm: double —
    * Σ z², the reconstruction-energy term). */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // one kernel call per row ([[graft.functions.MatVecKernel]]) —
    // bit-identical to the per-component dot_product(v, array(lit…))
    // minus literal-offset chain it replaces (same ascending-index
    // accumulation, same driver-computed offsets), without the boxed
    // literal array that form rebuilt per (row, component)
    val rows = model.components.map(_.toArray).toArray
    val offsets = model.components.map(c =>
      c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum).toArray
    vecs.select(col(idCol), VectorFunctions.matVec(v, rows, offsets).as("z"))
      .withColumn("sq_norm",
        expr("aggregate(z, 0D, (acc, x) -> acc + x * x)"))
  }

  /** Mahalanobis outlier score in the PCA basis — the embedding-space
    * anomaly monitor (corrupt vectors, wrong-model embeddings, drifted
    * shards): score = Σ_{j≤k} z_j² / λ_j measures how many standard
    * deviations a vector sits from the corpus along each principal
    * axis, which flags magnitude AND direction anomalies that plain
    * L2-to-mean misses (a far-but-along-the-main-axis vector is
    * normal; a slightly-off-but-orthogonal one is not). Map-only on
    * top of [[project]]: k dots + a weighted square sum per row, no
    * shuffle. Axes with λ < `eps` are skipped (no variance — any
    * deviation would divide by ~0). */
  def mahalanobisScores(vecs: DataFrame, idCol: String, vecCol: String,
      model: Model, eps: Double = 1e-9): DataFrame = {
    val weights = model.eigenvalues.take(model.k)
      .map(l => if (l < eps) 0.0 else 1.0 / l)
    project(vecs, idCol, vecCol, model)
      .withColumn("maha", round(expr(
        s"""aggregate(zip_with(z, array(${weights.mkString(", ")}),
           |  (zi, wi) -> zi * zi * wi), 0D, (acc, x) -> acc + x)""".stripMargin), 6))
      .select(col(idCol), col("maha"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues descending, matching orthonormal eigenvectors as
    * rows, sign-normalized). O(d³) per sweep, ~8 sweeps to 1e-12 —
    * driver-side by design (the matrix is d×d, never data-sized). */
  private[ops] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { ei =>
      val vec = Array.tabulate(d)(i => v(i)(ei))
      // sign convention: the largest-|component| coordinate positive
      val pivot = (0 until d).maxBy(i => (math.abs(vec(i)), -i))
      if (vec(pivot) < 0) vec.map(-_) else vec
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
