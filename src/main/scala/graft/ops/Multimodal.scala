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
  * sampling is a REAL AVI container demux (pure JVM, MJPEG frames =
  * standalone JPEGs that feed the image ops directly) — only
  * inter-frame codecs (H.264 etc.) stay out of scope, behind the same
  * plan shape.
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

  // ------------------------------------------------------------------
  // AVI container (RIFF 'AVI ') — real mux + demux, pure JVM. MJPEG is
  // the codec of record: each '00dc' chunk is a standalone JPEG, so
  // sampled frames feed [[withMediaMetadata]]/[[resize]] directly with
  // no inter-frame decoder. Same truncation-safe discipline as the
  // WAV/WARC/Ole2 parsers: malformed tails yield the frames recovered
  // so far, never a task-killing throw.
  // ------------------------------------------------------------------

  /** Parsed AVI envelope: dimensions and timing from `avih`/`strh`,
    * codec fourcc from the first video stream, total frame chunks. */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Long,
      nFrames: Long, codec: String, format: String)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    le16(b, o).toLong | (le16(b, o + 2).toLong << 16)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walk the RIFF tree; calls `sink(chunkId, listType, payloadOff,
    * payloadLen)` for every leaf chunk, recursing into LISTs. Bounds-
    * checked everywhere — a cut-off file ends the walk silently. */
  private def walkRiff(b: Array[Byte], start: Int, end: Int, listType: String,
      sink: (String, String, Int, Int) => Unit): Unit = {
    var off = start
    val limit = math.min(end, b.length)
    while (off + 8 <= limit) {
      val id = fourcc(b, off)
      val len = le32(b, off + 4)
      if (len < 0 || len > Int.MaxValue - 8) return
      val payload = off + 8
      if (id == "LIST" && len >= 4 && payload + 4 <= limit) {
        // a cut-off LIST still yields its complete children — the
        // recursion clips to what is actually present
        walkRiff(b, payload + 4, math.min(payload + len.toInt, limit),
          fourcc(b, payload), sink)
      } else if (payload + len > limit) {
        return // cut-off leaf chunk: keep what we have
      } else {
        sink(id, listType, payload, len.toInt)
      }
      off = payload + len.toInt + (len.toInt & 1) // word-aligned
    }
  }

  /** Real AVI header parse: dimensions, frame timing, codec, and the
    * video-chunk count (counted from `movi`, so it is truth even when
    * the declared `avih` total lies). Non-AVI payloads → all-zero row
    * with format "unknown"; empty → "empty". */
  private[graft] def aviMeta(bytes: Array[Byte]): AviMeta = {
    if (bytes == null || bytes.isEmpty) return AviMeta(0, 0, 0L, 0L, "", "empty")
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ")
      return AviMeta(0, 0, 0L, 0L, "", "unknown")
    var w = 0; var h = 0; var usf = 0L; var codec = ""; var n = 0L
    walkRiff(bytes, 12, bytes.length, "AVI ", (id, list, off, len) => {
      if (id == "avih" && len >= 40) {
        usf = le32(bytes, off)
        w = le32(bytes, off + 32).toInt
        h = le32(bytes, off + 36).toInt
      } else if (id == "strh" && list == "strl" && len >= 8 &&
          fourcc(bytes, off) == "vids" && codec.isEmpty) {
        codec = fourcc(bytes, off + 4).trim
      } else if (list == "movi" && id.length == 4 &&
          (id.endsWith("dc") || id.endsWith("db"))) {
        n += 1
      }
    })
    AviMeta(w, h, usf, n, codec, "avi")
  }

  /** Real AVI demux: the video frame chunks ('##dc'/'##db', MJPEG =
    * one JPEG per chunk) in container order. Truncated tail → frames
    * recovered so far; non-AVI → empty. */
  private[graft] def aviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    walkRiff(bytes, 12, bytes.length, "AVI ", (id, list, off, len) => {
      if (list == "movi" && id.length == 4 &&
          (id.endsWith("dc") || id.endsWith("db")) && len >= 0) {
        out += java.util.Arrays.copyOfRange(bytes, off, off + len)
      }
    })
    out.result()
  }

  /** Minimal AVI-MJPG muxer — the write side of [[aviFrames]] (export
    * sampled/transcoded frame sets as a playable container): RIFF
    * 'AVI ' with a spec-complete hdrl (avih + one vids strl with
    * MJPG strh/strf), the movi chunk list, and a keyframe idx1 (every
    * MJPEG frame is independent). Deterministic bytes for fixed
    * input. */
  private[graft] def muxAvi(width: Int, height: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16(v.toInt & 0xffff); w16(((v >> 16) & 0xffff).toInt) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"), 0, 4)
    val n = frames.length
    val maxBuf = if (frames.isEmpty) 0 else frames.map(_.length).max
    // --- hdrl ---
    val hdrl = {
      val hb = new ByteArrayOutputStream()
      def h16(v: Int): Unit = { hb.write(v & 0xff); hb.write((v >> 8) & 0xff) }
      def h32(v: Long): Unit = { h16(v.toInt & 0xffff); h16(((v >> 16) & 0xffff).toInt) }
      def htag(s: String): Unit = hb.write(s.getBytes("US-ASCII"), 0, 4)
      htag("avih"); h32(56)
      h32(usPerFrame); h32(0); h32(0); h32(0x10 /* HASINDEX */)
      h32(n); h32(0); h32(1); h32(maxBuf); h32(width); h32(height)
      h32(0); h32(0); h32(0); h32(0)
      val strl = {
        val sb = new ByteArrayOutputStream()
        def s16(v: Int): Unit = { sb.write(v & 0xff); sb.write((v >> 8) & 0xff) }
        def s32(v: Long): Unit = { s16(v.toInt & 0xffff); s16(((v >> 16) & 0xffff).toInt) }
        def stag(s: String): Unit = sb.write(s.getBytes("US-ASCII"), 0, 4)
        stag("strh"); s32(56)
        stag("vids"); stag("MJPG"); s32(0); s16(0); s16(0); s32(0)
        s32(usPerFrame) /* dwScale */ ; s32(1000000L) /* dwRate: rate/scale = fps */
        s32(0); s32(n); s32(maxBuf); s32(0xffffffffL /* default quality */)
        s32(0); s16(0); s16(0); s16(width); s16(height)
        stag("strf"); s32(40)
        s32(40); s32(width); s32(height); s16(1); s16(24); stag("MJPG")
        s32(width.toLong * height * 3); s32(0); s32(0); s32(0); s32(0)
        sb.toByteArray
      }
      htag("LIST"); h32(strl.length + 4); htag("strl"); hb.write(strl)
      hb.toByteArray
    }
    // --- movi + idx1 (offsets relative to the 'movi' fourcc) ---
    val movi = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    def m16(v: Int): Unit = { movi.write(v & 0xff); movi.write((v >> 8) & 0xff) }
    def m32(v: Long): Unit = { m16(v.toInt & 0xffff); m16(((v >> 16) & 0xffff).toInt) }
    def i16(v: Int): Unit = { idx.write(v & 0xff); idx.write((v >> 8) & 0xff) }
    def i32(v: Long): Unit = { i16(v.toInt & 0xffff); i16(((v >> 16) & 0xffff).toInt) }
    frames.foreach { f =>
      val chunkOff = 4 + movi.size() // from the 'movi' fourcc
      movi.write("00dc".getBytes("US-ASCII"), 0, 4)
      m32(f.length)
      movi.write(f, 0, f.length)
      if ((f.length & 1) == 1) movi.write(0)
      idx.write("00dc".getBytes("US-ASCII"), 0, 4)
      i32(0x10L /* AVIIF_KEYFRAME */); i32(chunkOff); i32(f.length)
    }
    // --- assemble ---
    val body = new ByteArrayOutputStream()
    def b32(v: Long): Unit = {
      body.write(v.toInt & 0xff); body.write(((v >> 8) & 0xff).toInt)
      body.write(((v >> 16) & 0xff).toInt); body.write(((v >> 24) & 0xff).toInt)
    }
    def btag(s: String): Unit = body.write(s.getBytes("US-ASCII"), 0, 4)
    btag("AVI ")
    btag("LIST"); b32(hdrl.length + 4); btag("hdrl"); body.write(hdrl, 0, hdrl.length)
    val moviBytes = movi.toByteArray
    btag("LIST"); b32(moviBytes.length + 4); btag("movi"); body.write(moviBytes, 0, moviBytes.length)
    val idxBytes = idx.toByteArray
    btag("idx1"); b32(idxBytes.length); body.write(idxBytes, 0, idxBytes.length)
    val bodyBytes = body.toByteArray
    tag("RIFF"); w32(bodyBytes.length); bos.write(bodyBytes, 0, bodyBytes.length)
    bos.toByteArray
  }

  /** REAL video frame sampling (replacing the round-7 byte-slicing
    * stand-in): demux the AVI container and keep every `stride`-th
    * frame chunk. `frame_index` is the frame's ordinal IN THE
    * CONTAINER (0, stride, 2·stride, …); with MJPEG payloads each
    * `frame_bytes` is a standalone JPEG, composable with
    * [[withMediaMetadata]]/[[resize]]. Non-AVI payloads contribute no
    * rows (they have no frames — the deterministic analogue of a
    * decoder rejecting the file). Map-only + explode; the demux is
    * O(container bytes) per row with no codec state. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val demux = udf { (bytes: Array[Byte]) =>
      val fs = aviFrames(bytes)
      fs.indices.by(stride).map(i => (i, fs(i))).toSeq
    }
    df.select(col(idCol), explode(demux(col(binCol))).as("f"))
      .select(col(idCol), col("f._1").as("frame_index"),
        col("f._2").as("frame_bytes"))
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

  /** Real WAV/RIFF audio header + PCM16 payload parse (pure JVM — no
    * codec deps; WAV is the uncompressed interchange format a training
    * pipeline's audio pre-pass actually standardizes to). Walks the
    * RIFF chunk list (fmt / data in any order, unknown chunks skipped,
    * word-aligned), then computes sample count, exact integer duration
    * `n·1e6 div rate` in µs, and the RMS amplitude of the PCM16
    * stream. Malformed/non-WAV payloads return the all-zero row with
    * format "unknown"/"corrupt" — deterministic on every input, so
    * the columns stay oracle-able.
    *
    * Returns (sampleRate, channels, bits, nSamples, durationUs,
    * rms, format). */
  private[graft] def wavMeta(bytes: Array[Byte]): (Long, Long, Long, Long, Long, Double, String) = {
    val zero = (0L, 0L, 0L, 0L, 0L, 0.0, "unknown")
    if (bytes == null || bytes.length < 44) return zero
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (u16(o).toLong) | (u16(o + 2).toLong << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return zero
    var off = 12
    var rate = 0L; var ch = 0L; var bits = 0L; var fmtCode = -1
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= bytes.length) {
      val id = tag(off); val len = u32(off + 4)
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        fmtCode = u16(off + 8)
        ch = u16(off + 10).toLong
        rate = u32(off + 12)
        bits = u16(off + 22).toLong
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(len, (bytes.length - dataOff).toLong)
      }
      // word-aligned advance; a huge/truncated declared length (len is
      // u32 — can exceed the buffer) ends the scan instead of looping
      val step = 8L + len + (len & 1L)
      if (step <= 8L || off + step > bytes.length.toLong) off = bytes.length
      else off += step.toInt
    }
    if (fmtCode != 1 || rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0)
      return (0L, 0L, 0L, 0L, 0L, 0.0, "corrupt")
    val blockAlign = ch * 2
    val n = dataLen / blockAlign
    val durationUs = n * 1000000L / rate
    var sumSq = 0.0
    var i = dataOff
    val end = dataOff + (n * blockAlign).toInt
    while (i + 1 < end) {
      val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toDouble
      sumSq += s * s
      i += 2
    }
    val totalSamples = n * ch
    val rms = if (totalSamples == 0) 0.0 else math.sqrt(sumSq / totalSamples)
    (rate, ch, bits, n, durationUs, rms, "pcm_s16le")
  }

  private val wavUdf: UserDefinedFunction = udf((b: Array[Byte]) => wavMeta(b))

  /** Attach typed audio metadata to a binary WAV payload column —
    * the audio counterpart of [[withMediaMetadata]]; map-only. */
  def withAudioMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__a", wavUdf(col(binCol)))
      .withColumn("sample_rate", col("__a._1"))
      .withColumn("channels", col("__a._2"))
      .withColumn("bits", col("__a._3"))
      .withColumn("n_samples", col("__a._4"))
      .withColumn("duration_us", col("__a._5"))
      .withColumn("rms", col("__a._6"))
      .withColumn("audio_format", col("__a._7"))
      .drop("__a")

  /** Silence-based audio segmentation — the voice-activity pre-pass an
    * audio training pipeline runs before transcription/embedding:
    * voiced segments are maximal sample runs NOT inside a silence run,
    * where a silence run is ≥ `minSilenceRun` consecutive samples with
    * |amplitude| ≤ `threshold` (mono PCM16; for multi-channel, a
    * sample is silent when EVERY channel is). Integer sample indices
    * convert to exact µs bounds (`idx·1e6 div rate`), peak is the max
    * |amplitude| in the segment — all integer arithmetic, so segments
    * replay exactly. Shorter-than-min silence stays inside its
    * segment. Returns (segStartSample, segEndSampleExcl, peak) per
    * segment, in order. */
  private[graft] def segmentWav(bytes: Array[Byte], threshold: Int,
      minSilenceRun: Int): (Long, Seq[(Long, Long, Long)]) = {
    val (rate, ch, bits, n, _, _, fmt) = wavMeta(bytes)
    if (fmt != "pcm_s16le" || n == 0) return (rate, Nil)
    // re-locate the data chunk (wavMeta validated the layout)
    var off = 12; var dataOff = -1
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (u16(o).toLong) | (u16(o + 2).toLong << 16)
    while (dataOff < 0 && off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII"); val len = u32(off + 4)
      if (id == "data") dataOff = off + 8
      else {
        val step = 8L + len + (len & 1L)
        if (step <= 8L || off + step > bytes.length.toLong) off = bytes.length
        else off += step.toInt
      }
    }
    val chI = ch.toInt
    def silent(i: Long): Boolean = (0 until chI).forall { c =>
      val o = dataOff + (i * chI + c).toInt * 2
      math.abs(((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt) <= threshold
    }
    def peakAt(i: Long): Long = (0 until chI).map { c =>
      val o = dataOff + (i * chI + c).toInt * 2
      math.abs(((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt).toLong
    }.max
    // pass 1: silent runs of >= minSilenceRun samples are breaks
    val breaks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0L
    while (i < n) {
      if (silent(i)) {
        val runStart = i
        while (i < n && silent(i)) i += 1
        if (i - runStart >= minSilenceRun) breaks += ((runStart, i))
      } else i += 1
    }
    // pass 2: segments are the complement of the breaks; peak scans
    // the segment (interior short silences contribute <= threshold)
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cur = 0L
    def emit(from: Long, until: Long): Unit = if (until > from) {
      var p = 0L; var j = from
      while (j < until) { val v = peakAt(j); if (v > p) p = v; j += 1 }
      segs += ((from, until, p))
    }
    breaks.foreach { case (bs, be) => emit(cur, bs); cur = be }
    emit(cur, n)
    (rate, segs.toSeq)
  }

  /** Segment rows for a WAV payload column: one row per voiced
    * segment with exact integer µs bounds and the segment peak.
    * Map-only + explode — no shuffle at any corpus size. */
  def segmentAudio(df: DataFrame, idCol: String, binCol: String,
      threshold: Int, minSilenceRun: Int): DataFrame = {
    val f = udf { (b: Array[Byte]) =>
      val (rate, segs) = segmentWav(b, threshold, minSilenceRun)
      segs.zipWithIndex.map { case ((s, e, p), ix) =>
        (ix.toLong, s, e,
          if (rate > 0) s * 1000000L / rate else 0L,
          if (rate > 0) e * 1000000L / rate else 0L, p)
      }
    }
    df.select(col(idCol), explode(f(col(binCol))).as("__s"))
      .select(col(idCol), col("__s._1").as("segment_idx"),
        col("__s._2").as("start_sample"), col("__s._3").as("end_sample"),
        col("__s._4").as("start_us"), col("__s._5").as("end_us"),
        col("__s._6").as("peak"))
  }

  /** Deterministic PCM16 mono square-wave WAV bytes — the test/oracle
    * fixture generator: RMS of a ±amplitude square wave is EXACTLY the
    * amplitude, and every header field is an arithmetic function of
    * the inputs, so a replay engine can verify the parser without
    * parsing bytes itself. */
  def synthWav(sampleRate: Int, amplitude: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0 && amplitude >= 0 && amplitude <= 32767)
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((if (i % 2 == 0) amplitude else -amplitude).toShort)
      i += 1
    }
    bb.array()
  }

  /** [[synthWav]] generalized to voiced/silent runs: voiced runs are
    * the ±amplitude square wave, silent runs are zeros — the fixture
    * for segmentation tests/oracles (segment bounds are arithmetic
    * functions of the run lengths). */
  def synthWavRuns(sampleRate: Int, amplitude: Int,
      runs: Seq[(Boolean, Int)]): Array[Byte] = {
    require(sampleRate > 0 && amplitude >= 0 && amplitude <= 32767)
    val n = runs.map(_._2).sum
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    runs.foreach { case (voiced, len) =>
      var i = 0
      while (i < len) {
        bb.putShort(if (!voiced) 0
          else (if (i % 2 == 0) amplitude else -amplitude).toShort)
        i += 1
      }
    }
    bb.array()
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
