package graft

import graft.search.VectorSearch
import org.apache.spark.sql.functions._

/** O4 — all five distance→similarity branches of
  * vector_db_query.py:170-202, including the batch-relative l2 /
  * inner_product semantics and their division-guard edge cases. */
class SimilarityConversionSpec extends SparkSpec {
  import spark.implicits._

  private def sims(metric: String, distances: Seq[Double]): Seq[Double] = {
    val df = distances.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "distance")
    VectorSearch.withSimilarity(df, metric)
      .orderBy($"id").select($"similarity_score").collect().map(_.getDouble(0)).toSeq
  }

  test("cosine: sim = clip(1 - d, 0, 1)") {
    assert(sims("cosine", Seq(0.0, 0.3, 1.5)) == Seq(1.0, 0.7, 0.0))
  }

  test("l2: batch-relative sim = 1 - d/max(d)") {
    assert(sims("l2", Seq(1.0, 2.0, 4.0)) == Seq(0.75, 0.5, 0.0))
  }

  test("l2: all-zero distances -> sim 1.0 (guard branch)") {
    assert(sims("l2", Seq(0.0, 0.0)) == Seq(1.0, 1.0))
  }

  test("sum_of_squares behaves like l2 branch") {
    assert(sims("sum_of_squares", Seq(1.0, 3.0)) == Seq(1.0 - 1.0 / 3.0, 0.0))
  }

  test("inner_product: min-max normalize, NO clip, all-equal -> 1.0") {
    assert(sims("inner_product", Seq(2.0, 4.0, 6.0)) == Seq(0.0, 0.5, 1.0))
    assert(sims("inner_product", Seq(5.0, 5.0)) == Seq(1.0, 1.0))
  }

  test("unknown metric: sim = clip(1 - d^2/2)") {
    assert(sims("weird", Seq(0.0, 1.0, 2.0)) == Seq(1.0, 0.5, 0.0))
  }

  test("batch-relative conversion respects batch columns (multi-query)") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 10L, 5.0), (2L, 11L, 10.0))
      .toDF("query_id", "id", "distance")
    val got = VectorSearch.withSimilarity(df, "l2", Seq("query_id"))
      .orderBy($"query_id", $"id").select($"similarity_score")
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.5, 0.0, 0.5, 0.0)) // each query normalized by its own max
  }
}
