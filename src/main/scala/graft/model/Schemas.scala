package graft.model

import org.apache.spark.sql.types._

/** Data model of the engine (SURVEY.md §1; reference:
  * vector_db_creator.py:177-181, sqlite_operations.py:12-27,
  * document_processor.py:61-75).
  *
  * A "vector database" is a directory of Parquet tables plus a JSON
  * manifest:
  *   chunks/         — the index itself (flat search scans it)
  *   documents/      — per-source-document metadata + full content
  *   chunk_doc_map/  — chunk id → document content-hash provenance
  *   manifest.json   — {distance_metric, dimensions, vector_type,
  *                      model, chunk_size, chunk_overlap}
  */
object Schemas {

  /** One retrievable chunk row (= one TileDB sparse cell in the
    * reference, vector_db_creator.py:173-189, plus the fixed metadata
    * keys of document_processor.py:61-75 flattened to typed columns
    * instead of a JSON blob). */
  val chunkSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("file_path", StringType),
    StructField("file_type", StringType),
    StructField("file_name", StringType),
    StructField("creation_date", StringType),
    StructField("modification_date", StringType),
    StructField("hash", StringType),
    StructField("document_type", StringType),
    StructField("page_number", IntegerType, nullable = true)))

  /** document_metadata table (sqlite_operations.py:12-20). */
  val documentSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("file_name", StringType),
    StructField("hash", StringType),
    StructField("file_path", StringType),
    StructField("page_content", StringType)))

  /** hash_chunk_ids table (sqlite_operations.py:22-27). */
  val chunkDocMapSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("hash", StringType)))
}

/** index_metadata.json + config-registry entry
  * (vector_db_creator.py:218-225, config.py:166-172). */
final case class DbManifest(
    distanceMetric: String,
    dimensions: Int,
    vectorType: String,
    model: String,
    chunkSize: Int,
    chunkOverlap: Int)

final case class ChunkRow(
    id: Long,
    text: String,
    vector: Array[Float],
    file_path: String,
    file_type: String,
    file_name: String,
    creation_date: String,
    modification_date: String,
    hash: String,
    document_type: String,
    page_number: Option[Int])

final case class DocumentRow(
    id: Long,
    file_name: String,
    hash: String,
    file_path: String,
    page_content: String)

/** Search hit returned by VectorSearch (vector_db_query.py:236-238 —
  * metadata enriched with similarity_score + distance). */
final case class SearchHit(
    id: Long,
    text: String,
    file_path: String,
    file_name: String,
    document_type: String,
    page_number: Option[Int],
    distance: Double,
    similarity_score: Double)
