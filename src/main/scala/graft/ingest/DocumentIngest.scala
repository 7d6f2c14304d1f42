package graft.ingest

import graft.functions.{Chunker, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Batch document ingestion: directory scan → per-format extraction →
  * metadata → chunking (SURVEY.md S1-S6, O1/O3, P2/P3; reference
  * pipeline vector_db_creator.py:245-288).
  *
  * The whole pipeline is ONE lazy plan over a `binaryFile` scan — the
  * reference's thread-pool fan-out (document_processor.py:225-244)
  * becomes Spark task parallelism over file partitions, which scales to
  * a 1000-executor cluster with no code change. No collect, no
  * driver-side loop; chunk explosion happens inside the plan. */
object DocumentIngest {

  private val extractUdf: UserDefinedFunction =
    udf((name: String, bytes: Array[Byte]) => Extractors.extract(name, bytes))

  /** S1+S2+S4+S5: scan a directory tree, keep supported extensions,
    * extract text, derive file metadata. Output columns:
    * file_path, file_name, file_type, creation_date, modification_date,
    * hash, document_type, is_pdf, page_content. */
  def loadDocuments(spark: SparkSession, sourceDir: String): DataFrame = {
    val exts = Extractors.supportedExtensions
    val extCond = exts.map(e => lower(col("path")).endsWith(e)).reduce(_ || _)
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS" // ISO like datetime.isoformat()
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(sourceDir)
      .filter(extCond)
      .withColumn("file_path", col("path"))
      .withColumn("file_name", regexp_extract(col("path"), "([^/]+)$", 1))
      .withColumn("file_type",
        when(lower(col("file_name")).endsWith(".pages.json"), lit(".pdf"))
          .otherwise(lower(regexp_extract(col("file_name"), "(\\.[^.]+)$", 1))))
      // binaryFile exposes modificationTime only; the reference records
      // ctime+mtime (document_processor.py:56-57) — we mirror mtime into
      // both, format matching datetime.fromtimestamp().isoformat()
      .withColumn("modification_date", date_format(col("modificationTime"), tsFmt))
      .withColumn("creation_date", col("modification_date"))
      .withColumn("document_type", lit("document")) // document_processor.py:73-75
      .withColumn("is_pdf", col("file_type") === ".pdf")
      .withColumn("page_content", extractUdf(col("file_name"), col("content")))
      .filter(col("page_content").isNotNull) // failed/empty extraction → skipped (:209-217)
      .withColumn("hash", TextFunctions.contentHash(col("page_content"))) // content identity (:42-50)
      .drop("path", "content", "length", "modificationTime")
  }

  /** O1+O3+P2+P3: documents → chunks. PDF docs take the sliding
    * marked-text path with page attribution, others fixed windows
    * (split_documents, document_processor.py:294-320). ASCII cleaning is
    * applied AFTER chunking like the reference (vector_db_creator.py:106-115),
    * so window boundaries fall on raw text. Chunk ids are deterministic
    * `xxhash64(hash, ordinal)` — the reference's random uint64 ids
    * (vector_db_creator.py:99) are collision-prone; natural-key identity
    * is (hash, ordinal) (SURVEY.md §4.3). */
  def chunkDocuments(docs: DataFrame, chunkSize: Int, chunkOverlap: Int): DataFrame = {
    val chunked = docs.withColumn("chunk",
      explode(when(col("is_pdf"),
        Chunker.chunkMarkedCol(col("page_content"), lit(chunkSize), lit(chunkOverlap)))
        .otherwise(Chunker.chunkFixedCol(col("page_content"), lit(chunkSize)))))
    chunked
      .withColumn("text", TextFunctions.asciiClean(col("chunk.text")))
      .filter(length(col("text")) > 0)
      .withColumn("chunk_ordinal", col("chunk.ordinal"))
      .withColumn("page_number", col("chunk.page_number"))
      .withColumn("id", xxhash64(col("hash"), col("chunk_ordinal")))
      .select("id", "text", "file_path", "file_type", "file_name",
        "creation_date", "modification_date", "hash", "document_type",
        "page_number", "chunk_ordinal")
  }
}
