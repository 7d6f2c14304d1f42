package graft.tools

import graft.functions.VectorFunctions
import graft.ops.{ProductQuantization, SimilaritySearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: IVF-PQ recall/latency on the ScaleOpsSpec clustered
  * corpus (64 hashed unit centers + 15% noise, renormalized) at an
  * arg-tunable N. Trains ONE model per configuration, encodes once,
  * then queries — the production shape — and prints recall@10 plus
  * per-stage wall times so codebook-capacity choices are measured,
  * not guessed. Not part of the driver gates. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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

    val queries = vecs.filter($"vec_id".between(100, 109))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val exactTop = SimilaritySearch.bruteForceTopKBatchAgg(
        vecs, "vec_id", "embedding", queries, "query_id", "qv", 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val qvecs = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // at probe scale (≥1M) the question is the cell-count scaling rule
    // (cells ∝ n at fixed probe fraction); at dev scale it is codebook
    // capacity vs training cost
    val configs = if (n >= 1000000L) Seq(
        (64, 16, 64, 3, 2, 16, 500),
        (256, 16, 64, 3, 2, 32, 500),
        (1024, 16, 64, 3, 2, 64, 500))
      else Seq(
        (64, 16, 64, 3, 2, 16, 500),
        (64, 16, 256, 3, 2, 16, 500),
        (64, 32, 64, 3, 2, 16, 500),
        (256, 16, 64, 3, 2, 32, 500),
        (64, 16, 64, 3, 2, 16, 2000))
    for ((kCoarse, m, ksub, ci, pi, nProbe, cand) <- configs) {
      val sample = vecs.filter($"vec_id" < 50000)
      val (model, tTrain) = t(ProductQuantization.ivfPqTrain(
        sample, "vec_id", "embedding", dim, kCoarse, m, ksub, ci, pi))
      val (encoded, tEnc) = t {
        val e = ProductQuantization.ivfPqEncode(vecs, "vec_id", "embedding", model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      val (recalls, tQuery) = t {
        qvecs.map { case (qid, qv) =>
          val got = ProductQuantization.ivfPqTopK(encoded, vecs, "vec_id",
              "embedding", model, qv, 10, nProbe, cand)
            .select("vec_id").as[Long].collect().toSet
          (got & exactTop(qid)).size / 10.0
        }
      }
      val recall = recalls.sum / recalls.length
      println(f"IVFPQ kC=$kCoarse m=$m ksub=$ksub ci=$ci pi=$pi nProbe=$nProbe cand=$cand" +
        f" recall@10=$recall%.3f train=$tTrain%.1fs encode=$tEnc%.1fs query10=$tQuery%.1fs")
      encoded.unpersist()
    }
    spark.stop()
  }
}
