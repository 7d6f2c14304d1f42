package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata structs. Image decode and resize are REAL (JDK
  * `javax.imageio` — PNG/JPEG/GIF/BMP, no external deps); video frame
  * sampling remains a byte-slicing stand-in (no video codec exists in
  * the JDK) behind the same plan shape.
  *
  * At scale: binaries ride in their own column so Parquet column
  * pruning skips the payload unless a decode stage actually needs it;
  * decode stages are map-only (no shuffle) and size-bounded by
  * `spark.sql.files.maxPartitionBytes`. The metadata path reads ONLY
  * the image header (`ImageReader.getWidth(0)` — no pixel decode), so
  * it is O(header) per file, not O(pixels): cheap enough to run over
  * the full 100 TB corpus as a scan-side enrichment. */
object Multimodal {

  // Executor-side decode must not spill ImageIO's stream cache to the
  // local disk of every task; header sniffs are in-memory-sized anyway.
  ImageIO.setUseCache(false)

  /** Real image header decode: format sniff + dimensions WITHOUT pixel
    * decode. Returns (width, height, format); non-image payloads map to
    * (0, 0, "unknown"), truncated/corrupt headers to (0, 0, "corrupt"),
    * empty payloads to (0, 0, "empty") — deterministic on all inputs,
    * so the column stays oracle-able. */
  private[ops] def decodeMeta(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes == null || bytes.isEmpty) (0, 0, "empty")
    else {
      val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) (0, 0, "unknown")
        else {
          val r = readers.next()
          try {
            r.setInput(in, true, true)
            (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
          } catch { case _: Exception => (0, 0, "corrupt") }
          finally r.dispose()
        }
      } finally in.close()
    }
  }

  private val decodeUdf: UserDefinedFunction = udf((bytes: Array[Byte]) => decodeMeta(bytes))

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
    * stands in for video frame sampling (the JDK has no video codec);
    * real decode would replace the slicing, not the plan. Output: one
    * row per sampled "frame". */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    df.select(col(idCol), col(binCol),
        explode(expr(s"sequence(0, greatest(cast(ceil(length($binCol) / 4096.0) as int) - 1, 0), $stride)"))
          .as("frame_index"))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_index * 4096 + 1, 4096)"))
      .drop(binCol)
  }

  /** Real image resize: full decode → bilinear Graphics2D scale to
    * (w, h) → PNG re-encode. Java2D's bilinear filter and the JDK PNG
    * writer are deterministic, so resized bytes are stable across runs
    * and executors. Non-image / corrupt payloads resize to empty bytes
    * (the map-only plan and binary-in/binary-out signature hold for
    * every input). */
  private[ops] def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img =
      if (bytes == null || bytes.isEmpty) null
      else
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
    if (img == null) Array.emptyByteArray
    else {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  def resize(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame = {
    val f = udf((b: Array[Byte]) => resizeImage(b, width, height))
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
