package graft.tools

import graft.functions.TopKFunctions.topKHits
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times of the pca_ann query at
  * SPARK_GRAFT_SF_DIR — fit, projection materialization, the three
  * brute-force top-k passes, rerank. Not part of the driver gates. */
object PcaStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/embeddings.parquet")
    def t[A](w: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[pca] $w%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    val dim = 64
    val model = t("fit")(graft.ops.Pca.fit(e, "embedding", dim, dim))
    val queries = e.filter(col("vec_id") < 5)
    def topIds(corpus: org.apache.spark.sql.DataFrame, vecCol: String,
        qs: org.apache.spark.sql.DataFrame, k: Int) =
      corpus.crossJoin(broadcast(qs))
        .withColumn("__sc", -round(graft.functions.VectorFunctions
          .euclideanDistance(col(vecCol), col("__qv")), 6))
        .groupBy(col("__qid"))
        .agg(topKHits(col("__sc"), col("vec_id"), k).as("hits"))
        .select(col("__qid"), col("hits.id").as("ids"))
    val rawQs = queries.select(col("vec_id").as("__qid"),
      col("embedding").cast("array<double>").as("__qv"))
    t("exact top10")(topIds(e, "embedding", rawQs, 10).collect())
    val z = t("project+persist") {
      val z0 = graft.ops.Pca.project(e, "vec_id", "embedding", model).persist()
      z0.count(); z0
    }
    val zQs = broadcast(z.join(queries.select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("__qid"), col("z").as("__qv")))
    t("proj top10")(topIds(z, "z", zQs, 10).collect())
    val z16 = z.select(col("vec_id"), slice(col("z"), 1, 16).as("z16"))
    val z16Qs = broadcast(z16.join(queries.select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("__qid"), col("z16").as("__qv")))
    t("trunc top50")(topIds(z16.withColumnRenamed("z16", "z"), "z", z16Qs, 50).collect())
    t("full query")(graft.Queries.pcaAnnQ(spark, sys.env("SPARK_GRAFT_SF_DIR")).collect())
    z.unpersist()
    spark.stop()
  }
}
