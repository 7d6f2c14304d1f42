package graft.tools

import graft.functions.{PqFunctions, VectorFunctions}
import graft.ops.ProductQuantization
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times of the pq_topk query (seed collect,
  * one Lloyd train iteration, approximate reconstruction scan, exact
  * rerank) at SPARK_GRAFT_SF_DIR — isolates which stage carries the
  * sf10 super-linear cost. Not part of the driver gates. */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[pqstage] $what%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = t("query fetch") {
      emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    }
    val cb0 = t("train iters=0") {
      ProductQuantization.train(emb, "vec_id", "embedding", q.length, 8, 16, 0)
    }
    val cb = t("train iters=1") {
      ProductQuantization.train(emb, "vec_id", "embedding", q.length, 8, 16, 1)
    }
    val approx = t("approx scan") {
      val a = emb
        .withColumn("approx_cosine", round(VectorFunctions.cosineSimilarity(
          ProductQuantization.reconstructed(col("embedding"), cb), lit(q)), 6))
        .select(col("vec_id"), col("approx_cosine"))
        .orderBy(col("approx_cosine").desc, col("vec_id").asc)
        .limit(50)
      a.collect(); a
    }
    t("full topK") {
      ProductQuantization.topK(emb, "vec_id", "embedding", q,
        k = 10, m = 8, ksub = 16, iters = 1, candidates = 50,
        trained = Some(cb)).collect()
    }
    t("codes-only scan") {
      emb.select(PqFunctions.pqCodes(col("embedding").cast("array<double>"),
        cb.kernel).as("c")).selectExpr("sum(element_at(c, 1))").collect()
    }
    spark.stop()
  }
}
