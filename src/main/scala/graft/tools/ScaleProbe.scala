package graft.tools

import graft.functions.VectorFunctions
import graft.ops.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: vector-search operators at 1000x the bench corpus (2M
  * synthetic 64-dim unit vectors built from range() — no files), to
  * validate the scan paths scale linearly and the bounded-shuffle
  * claims hold. Not part of the driver gates; results recorded in
  * BASELINE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val comps = (0 until dim).map(d =>
      (xxhash64(lit(d), col("id")).cast("double") / lit(Long.MaxValue.toDouble)).cast("float"))
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        VectorFunctions.l2Normalize(array(comps: _*)).as("embedding"))
      .repartition(32)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    vecs.count()
    println(f"[probe] materialize $n%d x $dim vectors: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time(label: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%7.2f s")
    }

    val q = Array.tabulate(dim)(d => math.sin(d + 1.0))
    time("brute-force top-10 (exact scan)") {
      SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10).collect()
    }
    time("brute-force top-10 (2nd run, warm)") {
      SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10).collect()
    }
    time("lsh top-10 (8 planes, probe<=1)") {
      SimilaritySearch.lshTopK(vecs, "vec_id", "embedding", dim, q, 10).collect()
    }
    val queries = vecs.filter(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    time("batch 32-query top-10, window") {
      SimilaritySearch.bruteForceTopKBatch(vecs, "vec_id", "embedding",
        queries, "query_id", "qv", 10).count()
    }
    time("batch 32-query top-10, heap agg") {
      SimilaritySearch.bruteForceTopKBatchAgg(vecs, "vec_id", "embedding",
        queries, "query_id", "qv", 10).count()
    }
    spark.stop()
  }
}
