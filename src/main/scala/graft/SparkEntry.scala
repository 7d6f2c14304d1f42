package graft

import graft.embed.DeterministicEmbedder
import graft.functions.Chunker
import graft.search.{SearchOptions, VectorSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full reference pipeline end-to-end on sf0.001 —
    * documents → fixed-window chunking → deterministic embedding →
    * exact cosine top-k with threshold filter (SURVEY.md §7.2 slice). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val chunks = docs
      .select(col("doc_id"), explode(Chunker.chunkFixedCol(col("text"), lit(200))).as("c"))
      .select(
        xxhash64(col("doc_id"), col("c.ordinal")).as("id"),
        col("c.text").as("text"),
        lit("document").as("document_type"))
    val embedder = DeterministicEmbedder(dim = 64)
    val embedded = embedder.embed(chunks, "text")
    val qv = embedder.embedQuery(spark, "customer order value")
    VectorSearch.searchChunks(embedded, qv, "cosine",
      SearchOptions(k = 6, scoreThreshold = 0.0))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ scale
    * extensions); each has a DuckDB oracle in [[OracleSql]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. */
  def oracleSql: Map[String, String] = OracleSql.all
}
