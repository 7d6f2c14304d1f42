package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata structs. The decode/feature-extract leaves are STUBBED with
  * a deterministic fake (image/audio codec libraries are not present in
  * this environment — see the builder brief); everything Spark-side —
  * schema, batching, partitioning, UDF signature — is real and tested,
  * and swapping the fake for a real decoder changes only `fakeDecode`.
  *
  * At scale: binaries ride in their own column so Parquet column
  * pruning skips the payload unless a decode stage actually needs it;
  * decode stages are map-only (no shuffle) and size-bounded by
  * `spark.sql.files.maxPartitionBytes`. */
object Multimodal {

  /** STUB decoder: stands in for a real image decode. Derives
    * deterministic pseudo-metadata (width/height/format) from the
    * payload bytes so the pipeline shape is testable end-to-end. */
  private[ops] def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, "empty")
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + math.floorMod(h, 1024).toInt
    val ht = 16 + math.floorMod(h >>> 10, 1024).toInt
    (w, ht, if (math.floorMod(h, 2) == 0L) "png" else "jpeg")
  }

  private val decodeUdf: UserDefinedFunction = udf((bytes: Array[Byte]) => fakeDecode(bytes))

  /** Attach typed media metadata to a binary payload column:
    * byte_size, sha256, decoded width/height/format struct. */
  def withMediaMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_size", length(col(binCol)).cast("long"))
      .withColumn("content_sha256", sha2(col(binCol), 256))
      .withColumn("decoded", decodeUdf(col(binCol)))
      .withColumn("width", col("decoded._1"))
      .withColumn("height", col("decoded._2"))
      .withColumn("format", col("decoded._3"))
      .drop("decoded")

  /** STUB frame sampler: every `stride`-th 4KiB slice of the payload
    * stands in for video frame sampling; real decode would replace the
    * slicing, not the plan. Output: one row per sampled "frame". */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    df.select(col(idCol), col(binCol),
        explode(expr(s"sequence(0, greatest(cast(ceil(length($binCol) / 4096.0) as int) - 1, 0), $stride)"))
          .as("frame_index"))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_index * 4096 + 1, 4096)"))
      .drop(binCol)
  }

  /** STUB resize: deterministic fake "resize" — the output payload is a
    * size-bounded transform of the input (truncate-or-cycle to
    * w·h/64 bytes) with the target dims recorded. A real image lib
    * replaces `fakeResize` only; the map-only plan, binary-in/
    * binary-out signature and metadata column stay. */
  private[ops] def fakeResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
    val n = math.max(w * h / 64, 1)
    Array.tabulate(n)(i => bytes(i % bytes.length))
  }

  def resize(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame = {
    val f = udf((b: Array[Byte]) => fakeResize(b, width, height))
    df.withColumn("resized", f(col(binCol)))
      .withColumn("resize_dims", struct(lit(width).as("width"), lit(height).as("height")))
  }

  /** STUB feature extractor, batched like a real model would be: rides
    * the [[graft.embed.BatchedEmbedder]] machinery (partition-local
    * fixed-size batches, executor-local model slot, per-element
    * fallback) over a binary column rendered to a model-input string;
    * the fake "model" hashes bytes into an L2-normalized
    * `array<float>` so the features compose directly with
    * [[SimilaritySearch]] (embedding-space dedup / ANN over media). */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int,
      batchSize: Int = 8): DataFrame = {
    val b64 = base64(col(binCol)).as("__media_repr")
    val withRepr = df.withColumn("__media_repr", b64)
    graft.embed.DeterministicBatchedEmbedder(dim, batchSize)
      .embed(withRepr, "__media_repr", "features")
      .drop("__media_repr")
  }
}
