package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring over an embedding column — the
  * "classifier filter" stage of a training-data pipeline (FineWeb-Edu /
  * DCLM shape: a small linear probe over frozen embeddings decides
  * keep/drop). The probe weights are plan literals: scoring is one
  * codegen'd map stage — dot product + sigmoid per row, no shuffle, no
  * UDF — so it runs at scan speed over 100 TB and composes with any
  * downstream filter pushdown.
  *
  * The score is rounded to 6 dp BEFORE thresholding so an engine's
  * last-ulp exp() difference cannot flip a keep decision (same
  * convention as BM25/kmeans). */
object Scoring {

  /** score = sigmoid(w · x + b), keep = score ≥ threshold (on the
    * rounded score). Returns the input plus (score, keep). */
  def linearProbe(df: DataFrame, vecCol: String, weights: Array[Double],
      bias: Double, threshold: Double = 0.5): DataFrame = {
    require(weights.nonEmpty, "linearProbe needs non-empty weights")
    val z = VectorFunctions.dotProduct(col(vecCol), lit(weights)) + lit(bias)
    df.withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
      .withColumn("keep", col("score") >= lit(threshold))
  }
}
