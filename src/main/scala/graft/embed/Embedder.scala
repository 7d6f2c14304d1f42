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
    Seq(queryPrompt + text).toDF("q").select(embedColumn(col("q"))).head().getSeq[Float](0).toArray
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

/** Minimal transformer-inference-session abstraction, shaped like ONNX
  * Runtime's `OrtSession.run` over the standard sentence-transformer
  * signature: (input_ids, attention_mask) → last_hidden_state
  * [batch, seqLen, hiddenDim]. The production provider wraps
  * OrtEnvironment/OrtSession; tests plug a deterministic fake, so every
  * line of [[OnnxEmbedder]] above the native call is exercised offline.
  * Instances live in the per-executor [[OnnxEmbedder.sessionCache]] —
  * they are NOT serialized or shipped. */
trait InferenceSession {
  def hiddenDim: Int
  /** Run the model on a padded batch. Must return one
    * [seqLen][hiddenDim] hidden-state matrix per input row. */
  def run(inputIds: Array[Array[Long]], attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]]
}

/** Serializable factory shipped inside the embedder; `open` runs on the
  * executor, once per (JVM, modelPath) — the Spark analogue of the
  * reference's thread-local model cache (vector_db_query.py:293-305). */
trait SessionProvider extends Serializable {
  def open(modelPath: String): InferenceSession
}

/** Serializable factory for the model's tokenizer; `open` runs on the
  * executor, once per (JVM, modelPath) — same caching discipline as
  * [[SessionProvider]]. The default reads the model directory's
  * `vocab.txt` (the HF file contract every BERT-family
  * sentence-transformer ships). */
trait TokenizerProvider extends Serializable {
  def open(modelPath: String): WordPieceTokenizer
}

/** Real-model embedding via the [[BatchedEmbedder]] machinery with the
  * full inference pipeline in-JVM: WordPiece tokenize ([CLS]/[SEP],
  * vocab-file ids) → pad/truncate → session run → attention-masked
  * mean pooling → fp32 L2 normalize (the reference's encode path:
  * embedding_models.py:54-131, pooling + `normalize_embeddings=True`;
  * batch sizing utilities_core.py:162-180). Only the native runtime
  * behind [[SessionProvider.open]] is absent in this environment —
  * [[SessionProvider]] implementations wrapping a real OrtSession drop
  * in without touching this class. */
final case class OnnxEmbedder(modelPath: String, dim: Int,
    batchSize: Int = 8, maxSeqLen: Int = 512,
    provider: SessionProvider = OnnxEmbedder.NativeRuntimeProvider,
    tokenizerProvider: TokenizerProvider = OnnxEmbedder.VocabFileProvider)
    extends BatchedEmbedder {

  override def queryPrompt: String = Embedder.queryPromptFor(modelPath)

  /** Model input ids for one text: the real WordPiece encode —
    * `[CLS] pieces [SEP]` truncated to `maxSeqLen` — against the
    * executor-cached vocab tokenizer. */
  private[embed] def tokenize(text: String): Array[Long] =
    OnnxEmbedder.tokenizerCache(modelPath, tokenizerProvider).encode(text, maxSeqLen)

  override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val session = OnnxEmbedder.sessionCache(modelPath, provider)
    require(session.hiddenDim == dim,
      s"model hidden dim ${session.hiddenDim} != declared dim $dim")
    val tokens = texts.map(tokenize).toArray
    val seqLen = math.max(tokens.map(_.length).max, 1)
    val inputIds = Array.ofDim[Long](tokens.length, seqLen)
    val mask = Array.ofDim[Long](tokens.length, seqLen)
    var b = 0
    while (b < tokens.length) {
      System.arraycopy(tokens(b), 0, inputIds(b), 0, tokens(b).length)
      java.util.Arrays.fill(mask(b), 0, tokens(b).length, 1L)
      b += 1
    }
    val hidden = session.run(inputIds, mask)
    require(hidden.length == texts.length,
      s"session returned ${hidden.length} rows for ${texts.length} inputs")
    hidden.toIndexedSeq.zip(mask).map { case (states, m) =>
      // attention-masked mean pooling (padded positions excluded), then
      // fp32 L2 normalization — the all-masked edge (empty text) pools
      // over position 0 so the output is still finite
      val n = math.max(m.sum, 1L).toDouble
      val pooled = new Array[Float](dim)
      var s = 0
      while (s < states.length) {
        if (m(s) == 1L || (s == 0 && m.forall(_ == 0L))) {
          var d = 0
          while (d < dim) { pooled(d) += states(s)(d); d += 1 }
        }
        s += 1
      }
      var norm = 0.0
      var d = 0
      while (d < dim) { pooled(d) = (pooled(d) / n).toFloat; norm += pooled(d).toDouble * pooled(d); d += 1 }
      val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 1.0
      d = 0
      while (d < dim) { pooled(d) = (pooled(d) * inv).toFloat; d += 1 }
      pooled
    }
  }
}

object OnnxEmbedder {
  /** One session per (executor JVM, modelPath), loaded on first use and
    * reused across tasks — never serialized. */
  private val sessions = new java.util.concurrent.ConcurrentHashMap[String, InferenceSession]()
  private[graft] def sessionCache(modelPath: String, provider: SessionProvider): InferenceSession =
    sessions.computeIfAbsent(modelPath, p => provider.open(p))
  /** Test hook: drop cached sessions (e.g. between fake providers). */
  private[graft] def evictSession(modelPath: String): Unit = sessions.remove(modelPath)

  /** One tokenizer per (executor JVM, modelPath) — the vocab map is
    * loaded from the executor-local model directory, not shipped. */
  private val toks = new java.util.concurrent.ConcurrentHashMap[String, WordPieceTokenizer]()
  private[graft] def tokenizerCache(modelPath: String,
      provider: TokenizerProvider): WordPieceTokenizer =
    toks.computeIfAbsent(modelPath, p => provider.open(p))
  private[graft] def evictTokenizer(modelPath: String): Unit = toks.remove(modelPath)

  /** Default tokenizer source: the model directory's `vocab.txt`. */
  object VocabFileProvider extends TokenizerProvider {
    override def open(modelPath: String): WordPieceTokenizer =
      WordPieceTokenizer.fromFile(
        java.nio.file.Paths.get(modelPath, "vocab.txt").toString)
  }

  /** A fixed in-memory tokenizer (tests, or a broadcast vocab). */
  final case class FixedTokenizer(t: WordPieceTokenizer) extends TokenizerProvider {
    override def open(modelPath: String): WordPieceTokenizer = t
  }

  /** The native-runtime provider slot: wraps ONNX Runtime, which is
    * not installed in this environment (no native .so, no
    * ai.onnxruntime jar). For a runnable real-weights path use
    * [[TransformerSessionProvider]] — the pure-JVM BERT forward pass
    * over GRTF checkpoints — which serves the same
    * [[InferenceSession]] contract. */
  object NativeRuntimeProvider extends SessionProvider {
    override def open(modelPath: String): InferenceSession =
      throw new UnsupportedOperationException(
        "ONNX Runtime is not available in this environment; supply a " +
          "SessionProvider wrapping OrtSession, use " +
          "TransformerSessionProvider for a GRTF checkpoint, or use " +
          "DeterministicEmbedder")
  }
}
