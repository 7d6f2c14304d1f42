package graft

import graft.embed.{DeterministicBatchedEmbedder, DeterministicEmbedder,
  InferenceSession, OnnxEmbedder, SessionProvider}
import org.apache.spark.sql.functions._

/** Deterministic stand-in for an ONNX session: hidden state for a
  * token id at position s, component d is a fixed arithmetic mix —
  * crucially, PADDED positions return garbage (id 0 still yields
  * nonzero states), so masked mean pooling is actually load-bearing:
  * if the pooler ever averaged padding, batch-composition would change
  * the vectors and the invariance tests below would fail. */
case class FakeProvider(dim: Int) extends SessionProvider {
  override def open(modelPath: String): InferenceSession = new FakeSession(dim)
}

/** Fails any run whose batch contains `poisonId` — drives the
  * batch → per-element fallback path. */
case class PoisonProvider(dim: Int, poisonId: Long) extends SessionProvider {
  override def open(modelPath: String): InferenceSession = new FakeSession(dim) {
    override def run(ids: Array[Array[Long]],
        mask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
      if (ids.exists(_.contains(poisonId)))
        throw new RuntimeException("native inference failure")
      super.run(ids, mask)
    }
  }
}

class FakeSession(val hiddenDim: Int) extends InferenceSession {
  val batchSizesSeen = scala.collection.mutable.ArrayBuffer[Int]()
  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    batchSizesSeen += inputIds.length
    inputIds.map { row =>
      row.map { id =>
        Array.tabulate(hiddenDim)(d =>
          (((id * 2654435761L + d * 40503L) % 1000L) - 500L).toFloat / 500f)
      }
    }
  }
}

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("batched mapPartitions embedder == expression embedder, bit for bit") {
    val df = Seq((1L, "hello world"), (2L, "spark vector search"), (3L, " "),
      (4L, "a"), (5L, "the quick brown fox")).toDF("id", "text")
    val expr = DeterministicEmbedder(dim = 16).embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    val batched = DeterministicBatchedEmbedder(dim = 16, batchSize = 2).embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(expr.keySet == batched.keySet)
    expr.foreach { case (id, v) =>
      assert(v.sameElements(batched(id)), s"vector mismatch for id=$id")
    }
  }

  test("batched embedder: batch sizing doesn't change results; schema appended") {
    val df = (1 to 37).map(i => (i.toLong, s"document number $i")).toDF("id", "text")
      .repartition(3)
    val a = DeterministicBatchedEmbedder(dim = 8, batchSize = 4).embed(df, "text")
    val b = DeterministicBatchedEmbedder(dim = 8, batchSize = 100).embed(df, "text")
    assert(a.schema.fieldNames.toSeq == Seq("id", "text", "vector"))
    val av = a.select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    val bv = b.select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(av.size == 37)
    av.foreach { case (id, v) => assert(v.sameElements(bv(id))) }
    // vectors are L2-normalized
    av.values.foreach { v =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    }
  }

  test("query embedding matches document embedding of the same text") {
    val e = DeterministicBatchedEmbedder(dim = 8)
    val viaQuery = e.embedQuery(spark, "some text")
    val viaBatch = e.encodeBatch(Seq("some text")).head
    assert(viaQuery.sameElements(viaBatch))
  }

  test("onnx pipeline: masked pooling makes vectors batch-composition invariant") {
    val e = OnnxEmbedder("fake-pad", dim = 8, batchSize = 8, provider = FakeProvider(8))
    val short = "tiny doc"
    val long = "a much longer document with many more whitespace separated tokens here"
    // alone: seqLen 2; batched with long: padded to seqLen 11 — the fake
    // session emits nonzero states for [PAD], so only masked pooling
    // keeps these identical
    val alone = e.encodeBatch(Seq(short)).head
    val padded = e.encodeBatch(Seq(short, long)).head
    assert(alone.sameElements(padded))
    // fp32 L2 normalization
    Seq(alone, e.encodeBatch(Seq(long)).head).foreach { v =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    }
    // tokenizer truncation: beyond maxSeqLen the text is invisible
    val t = OnnxEmbedder("fake-trunc", dim = 8, maxSeqLen = 4, provider = FakeProvider(8))
    assert(t.encodeBatch(Seq("one two three four five six")).head
      .sameElements(t.encodeBatch(Seq("one two three four")).head))
  }

  test("onnx pipeline through Spark: device-batch sizing and appended schema") {
    val e = OnnxEmbedder("fake-batch", dim = 8, batchSize = 4, provider = FakeProvider(8))
    val df = (1 to 10).map(i => (i.toLong, s"document number $i")).toDF("id", "text")
      .coalesce(1)
    val out = e.embed(df, "text")
    assert(out.schema.fieldNames.toSeq == Seq("id", "text", "vector"))
    val vecs = out.select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(vecs.size == 10 && vecs.values.forall(_ != null))
    // local[*] shares the JVM: the executor-cached session is inspectable
    val session = graft.embed.OnnxEmbedder.sessionCache("fake-batch", FakeProvider(8))
      .asInstanceOf[FakeSession]
    assert(session.batchSizesSeen.toSeq == Seq(4, 4, 2))
  }

  test("onnx pipeline: model-family query prompt applied to queries only") {
    val e = OnnxEmbedder("models/bge-small-onnx", dim = 8, provider = FakeProvider(8))
    val prompt = "Represent this sentence for searching relevant passages: "
    assert(e.queryPrompt == prompt)
    val q = e.embedQuery(spark, "find me things")
    assert(q.sameElements(e.encodeBatch(Seq(prompt + "find me things")).head))
    assert(!q.sameElements(e.encodeBatch(Seq("find me things")).head))
  }

  test("onnx pipeline: failing batch falls back per-element; only the bad row nulls") {
    val poisonId = ((scala.util.hashing.MurmurHash3.stringHash("poisonword").toLong
      & 0xffffffffL) % (OnnxEmbedder.VocabSize - 1)) + 1
    val e = OnnxEmbedder("fake-poison", dim = 8, batchSize = 8,
      provider = PoisonProvider(8, poisonId))
    val df = Seq((1L, "good text"), (2L, "has poisonword inside"), (3L, "also fine"))
      .toDF("id", "text").coalesce(1)
    val vecs = e.embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L) != null && vecs(3L) != null)
    assert(vecs(2L) == null) // per-element retry also failed => null vector
    // the good rows got the same vectors a clean batch would produce
    val clean = OnnxEmbedder("fake-clean", dim = 8, provider = FakeProvider(8))
    assert(vecs(1L).sameElements(clean.encodeBatch(Seq("good text")).head))
  }
}
