package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — combining lexical (BM25) and vector
  * (cosine k-NN) candidate lists into one ranking, the standard RAG
  * retrieval upgrade over either list alone. */
object HybridRetrieval {

  /** Reciprocal-rank fusion: each input list carries (idCol, rankCol)
    * with 1-based ranks; the fused score is Σ 1/(rrfK + rank) over the
    * lists the id appears in (absence contributes nothing). Each term
    * is one double division of exact integers — engine-identical with
    * no rounding step — and with two lists the sum is order-proof
    * (two-operand IEEE addition commutes). Union + one keyed
    * aggregation over the top-N candidate lists only (k·lists rows
    * total — driver-free and trivially small at any corpus size),
    * then a top-k with ties broken by id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      rrfK: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    lists.map(df => df.select(col(idCol),
        (lit(1.0) / (lit(rrfK.toDouble) + col(rankCol).cast("double"))).as("__c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }
}
