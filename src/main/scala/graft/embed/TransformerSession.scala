package graft.embed

/** Pure-JVM BERT-family encoder forward pass — a real
  * [[InferenceSession]] with real weights, no native runtime.
  *
  * The reference runs its sentence-transformer through torch/ONNX
  * (embedding_models.py:54-131); this environment has neither, so the
  * session behind [[SessionProvider]] is implemented directly: token +
  * position (+ single-segment type) embeddings → LayerNorm → N ×
  * (multi-head self-attention with key-side padding mask, residual +
  * LayerNorm, erf-GELU feed-forward, residual + LayerNorm) →
  * last_hidden_state — the standard post-LN BERT encoder (Devlin et
  * al. 2018, §3; LayerNorm ε = 1e-12, attention scale 1/√(H/heads)).
  * [[OnnxEmbedder]] supplies the surrounding tokenize → pad → run →
  * masked-mean-pool → L2-normalize pipeline unchanged; a provider
  * wrapping a real OrtSession still drops into the same slot for
  * full-size checkpoints.
  *
  * Scale/serving posture: inference is executor-local compute inside
  * `mapPartitions` (no shuffle). The matmul inner loops run through
  * [[VectorKernels]] — AVX-512/AVX2 `jdk.incubator.vector` saxpy when
  * the module is on the JVM, the identical scalar loop otherwise, with
  * BIT-IDENTICAL results either way (element-parallel ops only, no
  * FMA, no reduction reassociation). Production-size checkpoints still
  * want the native-runtime provider seam; SIMD closes most of the
  * single-thread gap measured in the BASELINE.md matmul probe.
  */
final class TransformerSession(val w: TransformerWeights) extends InferenceSession {

  override def hiddenDim: Int = w.hidden

  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    require(inputIds.length == attentionMask.length, "ids/mask batch mismatch")
    inputIds.indices.map(b => encodeRow(inputIds(b), attentionMask(b))).toArray
  }

  private val H = w.hidden
  private val nh = w.heads
  private val dh = H / nh
  private val scale = 1.0 / math.sqrt(dh.toDouble)


  private def encodeRow(ids: Array[Long], mask: Array[Long]): Array[Array[Float]] = {
    val S = ids.length
    // --- embeddings: word + position + (single-segment) type, LN ---
    var x = Array.tabulate(S) { s =>
      val row = new Array[Double](H)
      val wid = ids(s).toInt
      require(wid >= 0 && wid < w.vocabSize, s"token id $wid out of vocab")
      require(s < w.maxPos, s"sequence length $S exceeds maxPos ${w.maxPos}")
      var d = 0
      while (d < H) {
        row(d) = w.wordEmb(wid)(d).toDouble + w.posEmb(s)(d) + w.typeEmb(d)
        d += 1
      }
      layerNorm(row, w.embLnGamma, w.embLnBeta)
    }
    // --- encoder layers ---
    var l = 0
    while (l < w.layers.length) {
      val ly = w.layers(l)
      // projections
      val q = Array.tabulate(S)(s => affine(x(s), ly.wq, ly.bq))
      val k = Array.tabulate(S)(s => affine(x(s), ly.wk, ly.bk))
      val v = Array.tabulate(S)(s => affine(x(s), ly.wv, ly.bv))
      // multi-head attention; padded KEYS are masked out (softmax over
      // real positions only — the HF additive −1e9 bias, exact here)
      val ctx = Array.ofDim[Double](S, H)
      var i = 0
      while (i < S) {
        var h = 0
        while (h < nh) {
          val off = h * dh
          val scores = new Array[Double](S)
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < S) {
            if (mask(j) == 1L) {
              var dot = 0.0
              var d = 0
              while (d < dh) { dot += q(i)(off + d) * k(j)(off + d); d += 1 }
              scores(j) = dot * scale
              if (scores(j) > mx) mx = scores(j)
            } else scores(j) = Double.NegativeInfinity
            j += 1
          }
          // all-masked row (empty text): uniform over position 0, the
          // same edge OnnxEmbedder pools — keep it finite
          var z = 0.0
          j = 0
          while (j < S) {
            if (scores(j) != Double.NegativeInfinity) {
              scores(j) = math.exp(scores(j) - mx); z += scores(j)
            } else scores(j) = 0.0
            j += 1
          }
          if (z == 0.0) { scores(0) = 1.0; z = 1.0 }
          j = 0
          while (j < S) {
            val a = scores(j) / z
            if (a != 0.0) VectorKernels.saxpyRange(a, v(j), ctx(i), off, dh)
            j += 1
          }
          h += 1
        }
        i += 1
      }
      // output projection + residual + LN
      val x1 = Array.tabulate(S) { s =>
        val o = affine(ctx(s), ly.wo, ly.bo)
        var d = 0
        while (d < H) { o(d) += x(s)(d); d += 1 }
        layerNorm(o, ly.attnLnGamma, ly.attnLnBeta)
      }
      // GELU feed-forward + residual + LN
      x = Array.tabulate(S) { s =>
        val mid = affine(x1(s), ly.wi, ly.bi)
        var d = 0
        while (d < mid.length) { mid(d) = gelu(mid(d)); d += 1 }
        val o = affine(mid, ly.wo2, ly.bo2)
        d = 0
        while (d < H) { o(d) += x1(s)(d); d += 1 }
        layerNorm(o, ly.ffnLnGamma, ly.ffnLnBeta)
      }
      l += 1
    }
    x.map(_.map(_.toFloat))
  }

  /** y = x·W + b with W row-major [in][out], float weights streamed
    * directly (4 B/element — the matrices stay L2-resident far longer
    * than a widened-double copy would): each float lane load converts
    * to a full double vector (vcvtps2pd, exact), accumulation stays
    * double, adds stay in row order, no FMA — bit-identical to the
    * scalar widening loop. 4-row register blocks amortize the out
    * load/store (the transform C2's auto-vectorizer never does); a
    * block with an exact-zero xi falls back to per-row saxpy so the
    * zero-skip (and its -0.0 identity) matches the scalar path. */
  private def affine(x: Array[Double], wm: Array[Array[Float]],
      b: Array[Float]): Array[Double] = {
    val out = new Array[Double](b.length)
    var d = 0
    while (d < b.length) { out(d) = b(d).toDouble; d += 1 }
    val n = x.length
    var i = 0
    while (i + 4 <= n) {
      if (x(i) != 0.0 && x(i + 1) != 0.0 && x(i + 2) != 0.0 && x(i + 3) != 0.0)
        VectorKernels.saxpy4f(x(i), wm(i), x(i + 1), wm(i + 1),
          x(i + 2), wm(i + 2), x(i + 3), wm(i + 3), out)
      else {
        var j = i
        while (j < i + 4) {
          if (x(j) != 0.0) VectorKernels.saxpyf(x(j), wm(j), out)
          j += 1
        }
      }
      i += 4
    }
    while (i < n) {
      if (x(i) != 0.0) VectorKernels.saxpyf(x(i), wm(i), out)
      i += 1
    }
    out
  }

  /** BERT LayerNorm: per-position over hidden dims, ε = 1e-12. */
  private def layerNorm(x: Array[Double], gamma: Array[Float],
      beta: Array[Float]): Array[Double] = {
    val n = x.length
    var m = 0.0
    var i = 0
    while (i < n) { m += x(i); i += 1 }
    m /= n
    var v = 0.0
    i = 0
    while (i < n) { val d = x(i) - m; v += d * d; i += 1 }
    v /= n
    val inv = 1.0 / math.sqrt(v + 1e-12)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = (x(i) - m) * inv * gamma(i) + beta(i); i += 1 }
    out
  }

  /** Exact (erf) GELU — HF BERT's `gelu`; erf via Abramowitz–Stegun
    * 7.1.26 (|ε| < 1.5e-7, inside the spec's 1e-5 golden band). */
  private def gelu(x: Double): Double = 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))

  private def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }
}

/** One encoder layer's parameters; matrices row-major [in][out]. */
final case class TransformerLayer(
    wq: Array[Array[Float]], bq: Array[Float],
    wk: Array[Array[Float]], bk: Array[Float],
    wv: Array[Array[Float]], bv: Array[Float],
    wo: Array[Array[Float]], bo: Array[Float],
    attnLnGamma: Array[Float], attnLnBeta: Array[Float],
    wi: Array[Array[Float]], bi: Array[Float],
    wo2: Array[Array[Float]], bo2: Array[Float],
    ffnLnGamma: Array[Float], ffnLnBeta: Array[Float])

/** Full checkpoint: embeddings + layers. `typeEmb` is the segment-0
  * embedding row (sentence-transformer inputs are single-segment). */
final case class TransformerWeights(
    vocabSize: Int, hidden: Int, heads: Int, maxPos: Int, intermediate: Int,
    wordEmb: Array[Array[Float]], posEmb: Array[Array[Float]],
    typeEmb: Array[Float],
    embLnGamma: Array[Float], embLnBeta: Array[Float],
    layers: Array[TransformerLayer]) {
  require(hidden % heads == 0, "hidden must be divisible by heads")
}

/** Checkpoint IO + deterministic test-model generation.
  *
  * Format (`model.bin`, big-endian DataOutputStream): magic "GRTF",
  * version, dims header, then every tensor in declaration order as
  * float32 — read(write(w)) is bit-identical. The 2-layer × 32-dim
  * fixture checkpoint in EmbedderSpec is generated by
  * [[syntheticWeights]] (splitmix64-seeded, so the golden vectors pin
  * concrete weight VALUES, not just code paths). */
object TransformerCheckpoint {
  private val Magic = 0x47525446 // "GRTF"

  def write(path: java.nio.file.Path, w: TransformerWeights): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic); out.writeInt(1)
    out.writeInt(w.vocabSize); out.writeInt(w.hidden); out.writeInt(w.heads)
    out.writeInt(w.maxPos); out.writeInt(w.intermediate)
    out.writeInt(w.layers.length)
    def mat(m: Array[Array[Float]]): Unit = m.foreach(_.foreach(out.writeFloat))
    def vec(v: Array[Float]): Unit = v.foreach(out.writeFloat)
    mat(w.wordEmb); mat(w.posEmb); vec(w.typeEmb)
    vec(w.embLnGamma); vec(w.embLnBeta)
    w.layers.foreach { l =>
      mat(l.wq); vec(l.bq); mat(l.wk); vec(l.bk); mat(l.wv); vec(l.bv)
      mat(l.wo); vec(l.bo); vec(l.attnLnGamma); vec(l.attnLnBeta)
      mat(l.wi); vec(l.bi); mat(l.wo2); vec(l.bo2)
      vec(l.ffnLnGamma); vec(l.ffnLnBeta)
    }
    out.flush()
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, bos.toByteArray)
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def read(path: java.nio.file.Path): TransformerWeights = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(path)))
    try {
      require(in.readInt() == Magic, s"$path is not a GRTF checkpoint")
      require(in.readInt() == 1, "unsupported checkpoint version")
      val (vs, h, nh) = (in.readInt(), in.readInt(), in.readInt())
      val (mp, im, nl) = (in.readInt(), in.readInt(), in.readInt())
      def vec(n: Int): Array[Float] = Array.fill(n)(in.readFloat())
      def mat(r: Int, c: Int): Array[Array[Float]] = Array.fill(r)(vec(c))
      val we = mat(vs, h); val pe = mat(mp, h); val te = vec(h)
      val (eg, eb) = (vec(h), vec(h))
      val layers = Array.fill(nl)(TransformerLayer(
        mat(h, h), vec(h), mat(h, h), vec(h), mat(h, h), vec(h),
        mat(h, h), vec(h), vec(h), vec(h),
        mat(h, im), vec(im), mat(im, h), vec(h), vec(h), vec(h)))
      TransformerWeights(vs, h, nh, mp, im, we, pe, te, eg, eb, layers)
    } finally in.close()
  }

  /** Deterministic synthetic checkpoint (splitmix64 stream): small
    * near-Gaussian-scale weights (±0.1 uniform), LayerNorm γ=1 β=0 —
    * a REAL model in the sense that every stage of the forward pass
    * runs with concrete, reproducible numbers a golden vector can pin. */
  def syntheticWeights(vocabSize: Int, hidden: Int, heads: Int,
      maxPos: Int, intermediate: Int, layers: Int, seed: Long): TransformerWeights = {
    var state = seed
    def next(): Float = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // uniform in [-0.1, 0.1]
      ((z.toDouble / Long.MaxValue.toDouble) * 0.1).toFloat
    }
    def vec(n: Int): Array[Float] = Array.fill(n)(next())
    def mat(r: Int, c: Int): Array[Array[Float]] = Array.fill(r)(vec(c))
    def ones(n: Int): Array[Float] = Array.fill(n)(1f)
    def zeros(n: Int): Array[Float] = new Array[Float](n)
    TransformerWeights(vocabSize, hidden, heads, maxPos, intermediate,
      mat(vocabSize, hidden), mat(maxPos, hidden), vec(hidden),
      ones(hidden), zeros(hidden),
      Array.fill(layers)(TransformerLayer(
        mat(hidden, hidden), vec(hidden), mat(hidden, hidden), vec(hidden),
        mat(hidden, hidden), vec(hidden), mat(hidden, hidden), vec(hidden),
        ones(hidden), zeros(hidden),
        mat(hidden, intermediate), vec(intermediate),
        mat(intermediate, hidden), vec(hidden),
        ones(hidden), zeros(hidden))))
  }
}

/** Production [[SessionProvider]] for GRTF checkpoints: loads
  * `<modelPath>/model.bin` once per executor JVM (the
  * [[OnnxEmbedder.sessionCache]] contract) and serves the pure-JVM
  * forward pass. */
object TransformerSessionProvider extends SessionProvider {
  override def open(modelPath: String): InferenceSession =
    new TransformerSession(TransformerCheckpoint.read(
      java.nio.file.Paths.get(modelPath, "model.bin")))
}
