package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the storage/IO
  * lever for 100 TB vector corpora: a float32 vector stored as one
  * byte per dimension scans 4× faster off parquet, and the standard
  * two-stage search (approximate top-C on the quantized vectors →
  * exact rerank of the C candidates with full vectors) recovers
  * near-exact quality because the true top-k is almost always inside
  * a modest candidate set.
  *
  * The scheme is per-dimension affine (asymmetric-distance style: the
  * QUERY stays unquantized): q_i = round((x_i − mn_i)·255/(mx_i −
  * mn_i)) ∈ [0,255], reconstructed as x̂_i = mn_i + q_i·(mx_i −
  * mn_i)/255. All arithmetic is double-precision in exactly this
  * operation order so the SQL oracle replays it bit-for-bit.
  *
  * At index-build time [[quantize]]'s output is what a store would
  * persist (`array<tinyint>` + the 2·dim stats row in the manifest);
  * [[quantizedTopK]] quantizes on the fly from the float column, which
  * exercises identical arithmetic. */
object Quantization {

  /** Per-dimension (min, max) over the corpus: ONE aggregate with
    * 2·dim map-side-partial min/max expressions — no explode, no
    * shuffle of (row × dim) pairs; the driver receives a single row. */
  def dimStats(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val aggs = (1 to dim).map(i => min(element_at(col(vecCol), i)).as(s"mn$i")) ++
      (1 to dim).map(i => max(element_at(col(vecCol), i)).as(s"mx$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def d(o: Any): Double = o match {
      case f: Float => f.toDouble
      case x: Double => x
      case null => 0.0
    }
    ((0 until dim).map(i => d(row.get(i))).toArray,
      (0 until dim).map(i => d(row.get(dim + i))).toArray)
  }

  private def litArr(vs: Array[Double]): String =
    vs.map(v => s"CAST(${v} AS DOUBLE)").mkString("array(", ",", ")")

  /** Quantized codes 0..255 stored as `array<tinyint>` (code − 128):
    * the persistable form, 1/4 the bytes of float32. */
  def quantize(df: DataFrame, vecCol: String, mins: Array[Double],
      maxs: Array[Double]): DataFrame =
    df.withColumn("qvec", expr(
      s"""transform($vecCol, (x, i) ->
         |  CAST(CASE WHEN element_at(${litArr(maxs)}, i + 1) = element_at(${litArr(mins)}, i + 1) THEN 0
         |   ELSE round((CAST(x AS DOUBLE) - element_at(${litArr(mins)}, i + 1)) * 255.0
         |        / (element_at(${litArr(maxs)}, i + 1) - element_at(${litArr(mins)}, i + 1)))
         |  END - 128 AS TINYINT))""".stripMargin))

  /** Reconstruction x̂ as `array<double>` from the float column (fused
    * quantize→dequantize — the arithmetic a quantized scan sees). */
  def dequantizedColumn(vecCol: String, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = litArr(mins); val mx = litArr(maxs)
    expr(s"""transform($vecCol, (x, i) ->
      |  CASE WHEN element_at($mx, i + 1) = element_at($mn, i + 1) THEN element_at($mn, i + 1)
      |   ELSE element_at($mn, i + 1) +
      |     round((CAST(x AS DOUBLE) - element_at($mn, i + 1)) * 255.0
      |           / (element_at($mx, i + 1) - element_at($mn, i + 1)))
      |     * (element_at($mx, i + 1) - element_at($mn, i + 1)) / 255.0
      |  END)""".stripMargin)
  }

  /** Two-stage quantized search: top-`candidates` by cosine between
    * the raw query and the int8-reconstructed vectors (the cheap scan),
    * then exact cosine rerank of those candidates with the full float
    * vectors → top-k. Both stages are TakeOrderedAndProject plans; the
    * rerank joins only `candidates` rows back (broadcast). `dimStats`
    * runs one eager aggregate — at a real deployment those stats live
    * in the index manifest. */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, candidates: Int = 50): DataFrame = {
    val dim = query.length
    val (mins, maxs) = dimStats(df, vecCol, dim)
    val q = lit(query)
    val approx = df
      .withColumn("approx_cosine",
        VectorFunctions.cosineSimilarity(dequantizedColumn(vecCol, mins, maxs), q))
      .select(col(idCol), col("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col(idCol).asc)
      .limit(candidates)
    val rerank = broadcast(approx).join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), q))
    rerank
      .select(col(idCol), col("cosine"), col("approx_cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // Binary (sign) quantization — the 1-bit/dim end of the compression
  // ladder (int8 = 4×, PQ = 32×, sign bits = 32× with a 3-instruction
  // distance): bit d set iff v_d > 0, packed into ⌈dim/64⌉ longs.
  // Hamming distance between sign patterns approximates angular
  // distance (for L2-normalized embeddings E[hamming] ∝ acos(cosine)),
  // so a hamming pre-rank over the packed bits + an exact rerank of
  // the survivors is the classic cheap ANN stage — the scan reads 8
  // bytes per 64 dims instead of 256.
  // ------------------------------------------------------------------

  /** Packed sign bits as `array<bigint>` (bit d of word d/64 set iff
    * component d > 0) — map-only, codegen'd shifts, no UDF. */
  def signBitsColumn(vecCol: Column, dim: Int): Column = {
    val words = (dim + 63) / 64
    val wordExprs = (0 until words).map { w =>
      val lo = w * 64
      val hi = math.min(lo + 64, dim)
      (lo until hi).map(d =>
        when(vecCol.getItem(d) > 0f, lit(1L << (d - lo))).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_))
    }
    array(wordExprs: _*)
  }

  /** Hamming distance between two packed sign arrays: Σ bit_count(a ⊕
    * b) — `zip_with` + the codegen'd `bit_count` builtin. */
  def hammingColumn(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Two-stage binary-quantized search: top-`candidates` by hamming
    * distance between the query's sign bits and the corpus's (ties
    * hamming asc, id asc — deterministic), then exact cosine rerank of
    * the survivors → top-k. Both stages TakeOrderedAndProject; the
    * sign scan touches 1 bit per dim. The stored-layout version keeps
    * the packed bits as a sidecar column next to `chunks_q` (same
    * pattern as the int8 sidecar — parquet prunes to (id, bits)).
    *
    * Pool sizing (the plain-PQ coupling, gate-measured in
    * ScaleOpsSpec): on clustered corpora a cluster's members share
    * sign patterns, so hamming TIES across the cluster and
    * `candidates` must cover the tie set (≈ 2·n/centers — cand=500 on
    * the 64-center 300k regime recalls only 0.34; the tie-set pool
    * recalls 1.00). Small-pool configurations are IVF-PQ's job; sign
    * bits buy the cheapest possible pre-rank scan, not cell pruning. */
  /** Driver-side packing of a query vector's sign bits — the scalar
    * twin of [[signBitsColumn]] (same bit layout, asserted by the
    * hamming-zero self-match in spec). */
  def packSignBits(query: Array[Double]): Array[Long] = {
    val dim = query.length
    Array.tabulate((dim + 63) / 64) { w =>
      val lo = w * 64
      (lo until math.min(lo + 64, dim)).foldLeft(0L) { (acc, d) =>
        if (query(d) > 0) acc | (1L << (d - lo)) else acc
      }
    }
  }

  def binaryTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, candidates: Int = 50): DataFrame = {
    val dim = query.length
    val qbits = packSignBits(query)
    val q = lit(query)
    val approx = df
      .withColumn("hamming",
        hammingColumn(signBitsColumn(col(vecCol), dim), lit(qbits)))
      .select(col(idCol), col("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(candidates)
    broadcast(approx).join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col(vecCol), q))
      .select(col(idCol), col("hamming"), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
