package graft.embed

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** Minimal protobuf wire-format IO — just what reading/writing an ONNX
  * `ModelProto` needs. The wire format (varints, tag = fieldNum<<3 |
  * wireType, length-delimited nesting) and the ONNX field numbers used
  * below are public protocol documentation (protobuf encoding spec;
  * onnx/onnx.proto). No protobuf or onnxruntime dependency exists in
  * this offline environment, so the ~80 lines are implemented directly;
  * a real `ai.onnxruntime.OrtSession` still drops into the same
  * [[SessionProvider]] seam without touching any of this.
  *
  * Wire types handled: 0 = varint, 1 = 64-bit, 2 = length-delimited,
  * 5 = 32-bit. Groups (3/4, long deprecated) are rejected loudly. */
private[graft] object ProtoIO {

  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    /** A sub-reader over a length-delimited field (no copy). */
    def readMessage(): Reader = {
      val n = readVarint().toInt
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def readFixed32(): Int = {
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(): Unit
      case 1 => pos += 8
      case 2 =>
        // NOT `pos += readVarint()`: += reads the OLD pos before the
        // varint's own advance, silently losing the length bytes
        val n = readVarint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(
        s"unsupported wire type $w at pos=$pos end=$end")
    }
  }

  final class Writer {
    private val bos = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      bos.write(v.toInt)
    }
    def tag(field: Int, wireType: Int): Unit = writeVarint((field.toLong << 3) | wireType)
    def int(field: Int, v: Long): Unit = { tag(field, 0); writeVarint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(b.length); bos.write(b)
    }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def message(field: Int, m: Writer): Unit = bytes(field, m.toByteArray)
    def toByteArray: Array[Byte] = bos.toByteArray
  }
}

/** ONNX checkpoint IO for BERT-family encoders: reads a real `.onnx`
  * protobuf — `ModelProto.graph.initializer` tensors under the
  * HuggingFace BERT state-dict names a `torch.onnx` export preserves —
  * into [[TransformerWeights]] for the pure-JVM forward pass, and
  * writes the same format back (tests round-trip it; [[graft.Queries]]
  * materializes the embed_real model as `model.onnx`).
  *
  * Conventions honored (all public):
  *  - PyTorch `nn.Linear.weight` is stored [out, in]; the in-memory
  *    matrices are row-major [in][out], so linear weights transpose on
  *    both paths. Embedding tables are [rows, hidden] on both sides.
  *  - `token_type_embeddings.weight` is [2, hidden]; single-segment
  *    inference uses row 0 (the [[TransformerWeights.typeEmb]] slot).
  *  - Tensor payloads may arrive as `raw_data` (little-endian float32)
  *    or `float_data` (packed or unpacked) — both are read; writes use
  *    `raw_data`.
  *  - `num_attention_heads` is not recoverable from tensor shapes; it
  *    comes from the sibling `config.json` (the HF model-directory
  *    contract the reference relies on too: embedding_models.py reads
  *    the model dir, constants.py:242-291 list the HF layouts). */
object OnnxCheckpoint {
  import ProtoIO._

  // onnx.proto field numbers (public schema)
  private val ModelGraph = 7
  private val GraphInitializer = 5
  private val TensorDims = 1
  private val TensorDataType = 2
  private val TensorFloatData = 4
  private val TensorName = 8
  private val TensorRawData = 9
  private val DtFloat = 1

  private[graft] final case class Tensor(name: String, dims: Seq[Int], data: Array[Float])

  private def parseTensor(r: Reader): Tensor = {
    val dims = Seq.newBuilder[Int]
    var name = ""
    var dataType = DtFloat
    var floats: Array[Float] = null
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (TensorDims, 0) => dims += r.readVarint().toInt
        case (TensorDims, 2) => // packed dims
          val m = r.readMessage()
          while (m.hasMore) dims += m.readVarint().toInt
        case (TensorDataType, 0) => dataType = r.readVarint().toInt
        case (TensorName, 2) => name = new String(r.readBytes(), "UTF-8")
        case (TensorRawData, 2) =>
          val raw = r.readBytes()
          val fb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
          floats = new Array[Float](fb.remaining()); fb.get(floats)
        case (TensorFloatData, 2) => // packed floats
          val m = r.readMessage()
          val out = Array.newBuilder[Float]
          while (m.hasMore) out += java.lang.Float.intBitsToFloat(m.readFixed32())
          floats = out.result()
        case (TensorFloatData, 5) => // unpacked repeated float
          floats = (if (floats == null) Array.empty[Float] else floats) :+
            java.lang.Float.intBitsToFloat(r.readFixed32())
        case _ => r.skip(wt)
      }
    }
    require(dataType == DtFloat, s"tensor $name: only float32 supported (got $dataType)")
    Tensor(name, dims.result(), if (floats == null) Array.empty[Float] else floats)
  }

  /** All float initializers of `model.onnx`, keyed by name. */
  private[graft] def readInitializers(path: Path): Map[String, Tensor] = {
    val model = new Reader(Files.readAllBytes(path))
    val out = Map.newBuilder[String, Tensor]
    while (model.hasMore) {
      val (f, wt) = model.readTag()
      if (f == ModelGraph && wt == 2) {
        val g = model.readMessage()
        while (g.hasMore) {
          val (gf, gwt) = g.readTag()
          if (gf == GraphInitializer && gwt == 2) {
            val t = parseTensor(g.readMessage())
            out += t.name -> t
          } else g.skip(gwt)
        }
      } else model.skip(wt)
    }
    out.result()
  }

  /** num_attention_heads from the model directory's config.json (the
    * HF contract); loud failure if absent. */
  private def headsFromConfig(dir: Path): Int = {
    val cfg = dir.resolve("config.json")
    require(Files.exists(cfg), s"$cfg missing: heads are not recoverable from tensor shapes")
    val txt = new String(Files.readAllBytes(cfg), "UTF-8")
    val m = """"num_attention_heads"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
    require(m.isDefined, s"$cfg has no num_attention_heads")
    m.get.group(1).toInt
  }

  /** Reads `<dir>/model.onnx` (+ config.json) into the forward pass's
    * weight layout. Initializer names match by SUFFIX so both bare
    * state-dict names and `bert.`-prefixed exports resolve. */
  def read(dir: Path): TransformerWeights = {
    val init = readInitializers(dir.resolve("model.onnx"))
    def find(suffix: String): Tensor = {
      val hits = init.valuesIterator.filter(_.name.endsWith(suffix)).toSeq
      require(hits.size == 1,
        s"model.onnx: expected exactly one initializer ending in '$suffix', found ${hits.size}")
      hits.head
    }
    def mat(t: Tensor): Array[Array[Float]] = {
      require(t.dims.size == 2 && t.data.length == t.dims.product,
        s"${t.name}: bad shape ${t.dims.mkString("x")} for ${t.data.length} floats")
      Array.tabulate(t.dims(0))(r => java.util.Arrays.copyOfRange(
        t.data, r * t.dims(1), (r + 1) * t.dims(1)))
    }
    // PyTorch Linear stores [out, in]; the session wants [in][out]
    def linear(suffix: String): Array[Array[Float]] = {
      val m = mat(find(suffix))
      Array.tabulate(m(0).length)(i => Array.tabulate(m.length)(o => m(o)(i)))
    }
    def vec(suffix: String): Array[Float] = find(suffix).data

    val wordEmb = mat(find("embeddings.word_embeddings.weight"))
    val posEmb = mat(find("embeddings.position_embeddings.weight"))
    val typeRows = mat(find("embeddings.token_type_embeddings.weight"))
    val hidden = wordEmb(0).length
    val layerIdx = Iterator.from(0)
      .takeWhile(i => init.keysIterator.exists(
        _.contains(s"encoder.layer.$i.attention.self.query.weight"))).toSeq
    require(layerIdx.nonEmpty, "model.onnx: no encoder.layer.N initializers found")
    val layers = layerIdx.map { i =>
      val p = s"encoder.layer.$i"
      val wi = linear(s"$p.intermediate.dense.weight")
      TransformerLayer(
        linear(s"$p.attention.self.query.weight"), vec(s"$p.attention.self.query.bias"),
        linear(s"$p.attention.self.key.weight"), vec(s"$p.attention.self.key.bias"),
        linear(s"$p.attention.self.value.weight"), vec(s"$p.attention.self.value.bias"),
        linear(s"$p.attention.output.dense.weight"), vec(s"$p.attention.output.dense.bias"),
        vec(s"$p.attention.output.LayerNorm.weight"), vec(s"$p.attention.output.LayerNorm.bias"),
        wi, vec(s"$p.intermediate.dense.bias"),
        linear(s"$p.output.dense.weight"), vec(s"$p.output.dense.bias"),
        vec(s"$p.output.LayerNorm.weight"), vec(s"$p.output.LayerNorm.bias"))
    }.toArray
    TransformerWeights(
      vocabSize = wordEmb.length, hidden = hidden, heads = headsFromConfig(dir),
      maxPos = posEmb.length, intermediate = layers(0).wi(0).length,
      wordEmb = wordEmb, posEmb = posEmb, typeEmb = typeRows(0),
      embLnGamma = vec("embeddings.LayerNorm.weight"),
      embLnBeta = vec("embeddings.LayerNorm.bias"),
      layers = layers)
  }

  private def tensorMsg(name: String, dims: Seq[Int], data: Array[Float]): Writer = {
    val w = new Writer
    dims.foreach(d => w.int(TensorDims, d.toLong))
    w.int(TensorDataType, DtFloat.toLong)
    w.string(TensorName, name)
    val bb = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(TensorRawData, bb.array())
    w
  }

  /** Writes `<dir>/model.onnx` + `config.json` from the in-memory
    * weights — HF state-dict names, PyTorch [out, in] linear layout —
    * so read(write(w)) is bit-identical and any standard ONNX tooling
    * can open the file. */
  def write(dir: Path, w: TransformerWeights): Unit = {
    val g = new Writer
    g.string(2, "graft-bert") // GraphProto.name
    def emit(name: String, dims: Seq[Int], data: Array[Float]): Unit =
      g.message(GraphInitializer, tensorMsg(name, dims, data))
    def emitMat(name: String, m: Array[Array[Float]]): Unit =
      emit(name, Seq(m.length, m(0).length), m.flatten)
    // linear weights go out in the PyTorch [out, in] layout
    def emitLinear(name: String, m: Array[Array[Float]]): Unit =
      emitMat(name, Array.tabulate(m(0).length)(o => Array.tabulate(m.length)(i => m(i)(o))))
    emitMat("embeddings.word_embeddings.weight", w.wordEmb)
    emitMat("embeddings.position_embeddings.weight", w.posEmb)
    emitMat("embeddings.token_type_embeddings.weight",
      Array(w.typeEmb, new Array[Float](w.hidden)))
    emit("embeddings.LayerNorm.weight", Seq(w.hidden), w.embLnGamma)
    emit("embeddings.LayerNorm.bias", Seq(w.hidden), w.embLnBeta)
    w.layers.zipWithIndex.foreach { case (l, i) =>
      val p = s"encoder.layer.$i"
      emitLinear(s"$p.attention.self.query.weight", l.wq)
      emit(s"$p.attention.self.query.bias", Seq(l.bq.length), l.bq)
      emitLinear(s"$p.attention.self.key.weight", l.wk)
      emit(s"$p.attention.self.key.bias", Seq(l.bk.length), l.bk)
      emitLinear(s"$p.attention.self.value.weight", l.wv)
      emit(s"$p.attention.self.value.bias", Seq(l.bv.length), l.bv)
      emitLinear(s"$p.attention.output.dense.weight", l.wo)
      emit(s"$p.attention.output.dense.bias", Seq(l.bo.length), l.bo)
      emit(s"$p.attention.output.LayerNorm.weight", Seq(l.attnLnGamma.length), l.attnLnGamma)
      emit(s"$p.attention.output.LayerNorm.bias", Seq(l.attnLnBeta.length), l.attnLnBeta)
      emitLinear(s"$p.intermediate.dense.weight", l.wi)
      emit(s"$p.intermediate.dense.bias", Seq(l.bi.length), l.bi)
      emitLinear(s"$p.output.dense.weight", l.wo2)
      emit(s"$p.output.dense.bias", Seq(l.bo2.length), l.bo2)
      emit(s"$p.output.LayerNorm.weight", Seq(l.ffnLnGamma.length), l.ffnLnGamma)
      emit(s"$p.output.LayerNorm.bias", Seq(l.ffnLnBeta.length), l.ffnLnBeta)
    }
    val m = new Writer
    m.int(1, 8L) // ir_version
    m.string(2, "graft") // producer_name
    m.message(ModelGraph, g)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"model.onnx.tmp${Thread.currentThread().getId}")
    Files.write(tmp, m.toByteArray)
    Files.move(tmp, dir.resolve("model.onnx"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val cfg = s"""{"model_type": "bert", "num_attention_heads": ${w.heads}, """ +
      s""""hidden_size": ${w.hidden}, "num_hidden_layers": ${w.layers.length}, """ +
      s""""max_position_embeddings": ${w.maxPos}, "vocab_size": ${w.vocabSize}}"""
    Files.write(dir.resolve("config.json"), cfg.getBytes("UTF-8"))
  }
}

/** Production [[SessionProvider]] with the reference's model-directory
  * resolution order: a real `model.onnx` when present (parsed by
  * [[OnnxCheckpoint]], served by the pure-JVM forward pass), else the
  * GRTF `model.bin` via [[TransformerSessionProvider]] — so the same
  * embedder config runs a real ONNX export where one is shipped and
  * the in-repo checkpoint otherwise. A native-runtime provider
  * (wrapping `ai.onnxruntime.OrtSession`, Apache-2.0 on Maven Central
  * — not resolvable in this offline environment) slots into the same
  * [[SessionProvider]] seam for production-size checkpoints. */
object OnnxSessionProvider extends SessionProvider {
  override def open(modelPath: String): InferenceSession = {
    val dir = Paths.get(modelPath)
    if (Files.exists(dir.resolve("model.onnx")))
      new TransformerSession(OnnxCheckpoint.read(dir))
    else TransformerSessionProvider.open(modelPath)
  }
}
