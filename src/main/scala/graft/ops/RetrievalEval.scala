package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for retrieval evaluation — the measurement
  * side of the search surface (exact/LSH/IVF/PQ/BM25/hybrid top-k all
  * produce ranked lists; this scores them against relevance labels).
  * Standard IR metrics: MRR (reciprocal rank of the first relevant
  * hit) and nDCG@k (Järvelin & Kekäläinen 2002 discounted cumulative
  * gain, normalized by the ideal ordering).
  *
  * Scale shape: one (query, doc) equi-join to attach labels, then two
  * per-query aggregations (DCG from the given ranks; IDCG from a
  * per-query rel-desc re-rank window) — everything partial-agg
  * shaped, no cross join, no driver loop. Metrics are 6 dp-rounded
  * (log2 discounts are libm-computed on both engines; sub-ulp drift
  * is orders of magnitude under the rounding grain — the bm25/LM
  * convention).
  */
object RetrievalEval {

  /** Score ranked `results` (query_id, doc_id, rank — 1-based, one row
    * per retrieved doc) against `labels` (query_id, doc_id, rel ≥ 0;
    * absent pair = 0). Returns per query:
    * n_retrieved, n_relevant (rel > 0 among retrieved), mrr, dcg@k,
    * ndcg@k (0 when no retrieved doc is relevant). */
  def evalRanking(results: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val joined = results.filter(col("rank") <= k)
      .join(labels, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)).cast("double"))
    val gain = pow(lit(2.0), col("rel")) - 1.0
    // ideal ordering: same gains re-ranked rel desc (ties by the real
    // rank, keeping the window deterministic)
    val ideal = row_number().over(
      Window.partitionBy("query_id").orderBy(col("rel").desc, col("rank").asc))
    joined
      .withColumn("irank", ideal)
      .groupBy("query_id").agg(
        count(lit(1)).as("n_retrieved"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_relevant"),
        coalesce(max(when(col("rel") > 0, lit(1.0) / col("rank"))), lit(0.0)).as("__mrr"),
        sum(gain / log2(col("rank") + 1.0)).as("__dcg"),
        sum(gain / log2(col("irank") + 1.0)).as("__idcg"))
      .select(col("query_id"), col("n_retrieved"), col("n_relevant"),
        round(col("__mrr"), 6).as("mrr"),
        round(col("__dcg"), 6).as("dcg"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"))
  }
}
