package graft.embed

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch embedding stage (SURVEY.md §7.1 module 4).
  *
  * The reference embeds chunk texts in device batches with a
  * SentenceTransformer and L2-normalizes at encode time
  * (embedding_models.py:113-131, `normalize_embeddings=True`), with an
  * optional query-side prompt prefix per model family
  * (embedding_models.py:27-33, :155-160). Here embedding is a column
  * transformation so Catalyst keeps it inside the ingest plan; the
  * trait boundary is where a real ONNX/JNI model would slot in via
  * `mapPartitions` with an executor-local session.
  */
trait Embedder extends Serializable {
  /** Embedding dimension of this model. */
  def dim: Int
  /** Prompt prefix prepended to *query* texts only
    * (embedding_models.py:155-157; document texts are embedded bare). */
  def queryPrompt: String = ""
  /** Column expression producing an L2-normalized array<float> vector. */
  def embedColumn(text: Column): Column
  /** Embed a DataFrame's text column into `outCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String = "vector"): DataFrame =
    df.withColumn(outCol, embedColumn(col(textCol)))
  /** Driver-side single-query embedding (query batch size is always 1 in
    * the reference, utilities_core.py:197). */
  def embedQuery(spark: org.apache.spark.sql.SparkSession, text: String): Array[Float] = {
    import spark.implicits._
    Seq(queryPrompt + text).toDF("q").select(embedColumn(col("q"))).head.getSeq[Float](0).toArray
  }
}

/** Deterministic hash-seeded embedder (FIXTURES.md §3): component i is
  * `xxhash64(i, text)` mapped to [-1, 1], then L2-normalized. A pure
  * codegen'd column expression — no UDF, no model, bitwise-identical on
  * every executor and across partitionings, which makes the full
  * ingest→query path oracle-able without model weights. */
final case class DeterministicEmbedder(dim: Int, override val queryPrompt: String = "")
    extends Embedder {
  override def embedColumn(text: Column): Column = {
    val comps = (0 until dim).map { i =>
      xxhash64(lit(i), text).cast("double") / lit(Long.MaxValue.toDouble)
    }
    VectorFunctions.l2Normalize(array(comps: _*))
  }
}

/** Placeholder for a real in-JVM model (ONNX Runtime etc. — not present
  * in this environment). The Spark-side contract is identical to
  * DeterministicEmbedder: partition-local batched inference would live
  * in `mapPartitions` behind `embed`, with the model session held in an
  * executor-local lazy val (one load per executor, reused across tasks —
  * the Spark analogue of the reference's thread-local model cache,
  * vector_db_query.py:293-305). */
final case class OnnxEmbedder(modelPath: String, dim: Int) extends Embedder {
  override def embedColumn(text: Column): Column =
    throw new UnsupportedOperationException(
      "OnnxEmbedder requires an ONNX runtime, which is not available in this " +
        "environment; use DeterministicEmbedder for tests/oracles")
}
