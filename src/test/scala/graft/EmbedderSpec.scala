package graft

import graft.embed.{DeterministicBatchedEmbedder, DeterministicEmbedder,
  InferenceSession, OnnxEmbedder, SessionProvider, WordPieceTokenizer}
import org.apache.spark.sql.functions._

/** Shared vocab-file fixture: ids are line numbers, [PAD]=0 — the
  * `vocab.txt` contract. Covers the words the specs embed. */
object TestVocab {
  val lines: Seq[String] = Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "tiny", "doc", "a", "much", "longer", "document", "with", "many",
    "more", "whitespace", "separated", "tokens", "here", "one", "two",
    "three", "four", "five", "six", "good", "text", "poisonword", "has",
    "inside", "also", "fine", "number", "find", "me", "things",
    "represent", "this", "sentence", "for", "searching", "relevant",
    "passages", ":", "some")
  val tok: WordPieceTokenizer = WordPieceTokenizer.fromLines(lines)
  val provider: OnnxEmbedder.FixedTokenizer = OnnxEmbedder.FixedTokenizer(tok)
}

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

  test("wordpiece: golden ids — greedy longest-match, ## continuations, specials") {
    // the canonical HF example: "unwanted running" with this vocab
    // must split un ##want ##ed runn ##ing
    val t = WordPieceTokenizer.fromLines(Seq(
      "[PAD]", "[UNK]", "[CLS]", "[SEP]",
      "un", "##want", "##ed", "runn", "##ing", "want", "운"))
    assert(t.padId == 0 && t.unkId == 1 && t.clsId == 2 && t.sepId == 3)
    assert(t.tokenize("unwanted running") == Seq(4, 5, 6, 7, 8))
    // longest-match-first: "want" alone hits the whole-word entry (9),
    // never un/##want decomposition of a longer word's interior
    assert(t.tokenize("want") == Seq(9))
    // any unmatched position UNKs the WHOLE word, not just the tail
    assert(t.tokenize("unwantedx running") == Seq(1, 7, 8))
    // encode: [CLS] body [SEP], truncation keeps the FIRST maxLen-2 pieces
    assert(t.encode("unwanted running", maxLen = 512).toSeq ==
      Seq(2L, 4L, 5L, 6L, 7L, 8L, 3L))
    assert(t.encode("unwanted running", maxLen = 5).toSeq == Seq(2L, 4L, 5L, 6L, 3L))
    assert(t.encode("", maxLen = 512).toSeq == Seq(2L, 3L))
  }

  test("wordpiece: basic tokenizer — punctuation, case, accents, CJK, controls") {
    val t = WordPieceTokenizer.fromLines(Seq(
      "[PAD]", "[UNK]", "[CLS]", "[SEP]",
      "hello", ",", "!", "world", "e", "##t", "##e", "운"))
    // punctuation splits into standalone tokens; case folds; accents
    // strip via NFD (été -> ete); control chars vanish; CJK chars
    // isolate even without surrounding spaces
    assert(t.basicTokenize("Hello, world!") == Seq("hello", ",", "world", "!"))
    assert(t.basicTokenize("été") == Seq("ete"))
    assert(t.basicTokenize("a\u0000b\u007fc") == Seq("abc"))
    assert(t.basicTokenize("ab一cd") == Seq("ab", "一", "cd"))
    assert(t.tokenize("Hello, world!") == Seq(4, 5, 7, 6))
    assert(t.tokenize("ÉTÉ") == Seq(8, 9, 10))
    // uncased default matches HF BertTokenizer: do_lower_case=True
    val cased = new WordPieceTokenizer(t.vocab, lowercase = false)
    assert(cased.tokenize("Hello") == Seq(1))
    // maxInputCharsPerWord guard
    val longWord = "e" * 101
    assert(t.tokenize(longWord) == Seq(1))
    assert(t.tokenize("e" * 100) == (Seq(8) ++ Seq.fill(99)(10)))
  }

  test("wordpiece: vocab round-trips through a real vocab.txt file") {
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toFile
    val f = new java.io.File(dir, "vocab.txt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    TestVocab.lines.foreach(w.println)
    w.close()
    val t = WordPieceTokenizer.fromFile(f.getPath)
    assert(t.vocab == TestVocab.tok.vocab)
    assert(t.encode("tiny doc", 512).toSeq == TestVocab.tok.encode("tiny doc", 512).toSeq)
    // and the default provider finds it under the model dir
    val viaProvider = OnnxEmbedder.VocabFileProvider.open(dir.getPath)
    assert(viaProvider.vocab == t.vocab)
  }

  test("onnx pipeline: masked pooling makes vectors batch-composition invariant") {
    val e = OnnxEmbedder("fake-pad", dim = 8, batchSize = 8, provider = FakeProvider(8), tokenizerProvider = TestVocab.provider)
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
    val t = OnnxEmbedder("fake-trunc", dim = 8, maxSeqLen = 4, provider = FakeProvider(8), tokenizerProvider = TestVocab.provider)
    assert(t.encodeBatch(Seq("one two three four five six")).head
      .sameElements(t.encodeBatch(Seq("one two three four")).head))
  }

  test("onnx pipeline through Spark: device-batch sizing and appended schema") {
    val e = OnnxEmbedder("fake-batch", dim = 8, batchSize = 4, provider = FakeProvider(8), tokenizerProvider = TestVocab.provider)
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
    val e = OnnxEmbedder("models/bge-small-onnx", dim = 8, provider = FakeProvider(8), tokenizerProvider = TestVocab.provider)
    val prompt = "Represent this sentence for searching relevant passages: "
    assert(e.queryPrompt == prompt)
    val q = e.embedQuery(spark, "find me things")
    assert(q.sameElements(e.encodeBatch(Seq(prompt + "find me things")).head))
    assert(!q.sameElements(e.encodeBatch(Seq("find me things")).head))
  }

  test("onnx pipeline: failing batch falls back per-element; only the bad row nulls") {
    val poisonId = TestVocab.tok.vocab("poisonword").toLong
    val e = OnnxEmbedder("fake-poison", dim = 8, batchSize = 8,
      provider = PoisonProvider(8, poisonId), tokenizerProvider = TestVocab.provider)
    val df = Seq((1L, "good text"), (2L, "has poisonword inside"), (3L, "also fine"))
      .toDF("id", "text").coalesce(1)
    val vecs = e.embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L) != null && vecs(3L) != null)
    assert(vecs(2L) == null) // per-element retry also failed => null vector
    // the good rows got the same vectors a clean batch would produce
    val clean = OnnxEmbedder("fake-clean", dim = 8, provider = FakeProvider(8), tokenizerProvider = TestVocab.provider)
    assert(vecs(1L).sameElements(clean.encodeBatch(Seq("good text")).head))
  }
}
