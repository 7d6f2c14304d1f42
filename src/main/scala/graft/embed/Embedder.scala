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

object Embedder {
  /** Query prompt per model family (embedding_models.py:16-33): family
    * is inferred from the model path; ONLY embed_query applies the
    * prompt (embedding_models.py:151-153 — documents embed bare, even
    * for bge where the family function returns a prompt for both). */
  def queryPromptFor(modelPath: String): String = {
    val l = modelPath.toLowerCase
    if (l.contains("qwen"))
      "Instruct: Given a web search query, retrieve relevant passages that answer the query\nQuery: "
    else if (l.contains("bge"))
      "Represent this sentence for searching relevant passages: "
    else ""
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

/** Executor-batched embedding via `mapPartitions` — the real-model
  * inference plumbing (SURVEY.md §2.10 embed_batch). Texts are buffered
  * into `batchSize` batches per partition (the reference's device-batch
  * sizing, utilities_core.py:162-180); `encodeBatch` runs once per
  * batch against a model handle implementations hold in an
  * executor-local lazy val (one load per executor JVM, reused across
  * tasks — the Spark analogue of the reference's thread-local cache,
  * vector_db_query.py:293-305). A failing batch falls back to
  * per-element encodes, one more failure → null vector
  * (embedding_models.py:134-157).
  *
  * The output schema appends `outCol: array<float>` to the input
  * schema, so this stage composes with the same downstream plan as the
  * expression-based embedders. Rows never leave their partition — no
  * shuffle; batch sizing is decoupled from partition sizing. */
trait BatchedEmbedder extends Embedder {
  def batchSize: Int
  /** One model invocation. Must return exactly one vector per text. */
  def encodeBatch(texts: Seq[String]): Seq[Array[Float]]

  override def embed(df: DataFrame, textCol: String, outCol: String = "vector"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    val bs = batchSize
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(idx)).getOrElse(" "))
        val vecs =
          try encodeBatch(texts)
          catch {
            case _: Throwable => texts.map { t =>
              try encodeBatch(Seq(t)).head catch { case _: Throwable => null }
            }
          }
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }

  override def embedColumn(text: Column): Column =
    throw new UnsupportedOperationException(
      "BatchedEmbedder embeds via mapPartitions; use embed(df, textCol)")

  override def embedQuery(spark: org.apache.spark.sql.SparkSession, text: String): Array[Float] =
    encodeBatch(Seq(queryPrompt + text)).head
}

/** The deterministic embedder routed through the batched mapPartitions
  * machinery: JVM-side xxhash64 replicating [[DeterministicEmbedder]]'s
  * column expression bit for bit, so the two paths are interchangeable
  * and the batching plumbing is testable against the codegen'd truth. */
final case class DeterministicBatchedEmbedder(dim: Int, batchSize: Int = 8,
    override val queryPrompt: String = "") extends BatchedEmbedder {
  override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val raw = new Array[Double](dim)
      var norm = 0.0
      val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      var i = 0
      while (i < dim) {
        // xxhash64(lit(i), text): seed 42, fold in the int literal,
        // then the UTF8 bytes — mirrors HashExpression eval order
        val s1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          utf8.getBaseObject, utf8.getBaseOffset, utf8.numBytes(), s1)
        raw(i) = h.toDouble / Long.MaxValue.toDouble
        norm += raw(i) * raw(i)
        i += 1
      }
      val n = math.sqrt(norm)
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = (if (n > 0) raw(i) / n else raw(i)).toFloat; i += 1 }
      out
    }
}

/** Placeholder for a real in-JVM model (ONNX Runtime etc. — not present
  * in this environment). Holds the model in an executor-local lazy
  * companion slot; everything else (batching, fallback, schema) comes
  * from [[BatchedEmbedder]]. */
final case class OnnxEmbedder(modelPath: String, dim: Int,
    batchSize: Int = 8) extends BatchedEmbedder {
  override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
    throw new UnsupportedOperationException(
      "OnnxEmbedder requires an ONNX runtime, which is not available in this " +
        "environment; use DeterministicEmbedder/DeterministicBatchedEmbedder")
}
