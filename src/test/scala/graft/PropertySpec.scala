package graft

import graft.ops.{EventAnalytics, SimilaritySearch, TextAnalytics}
import org.apache.spark.sql.functions._

/** Seeded randomized property tests — many random instances per
  * invariant, fixed seed (deterministic: a failure is reproducible,
  * never flaky). These check the contracts the oracle CAN'T: the
  * oracle pins one dataset; these sweep the input space. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("property: Misra-Gries bounds hold across random streams, skews, k, partitionings") {
    for (trial <- 1 to 12) {
      val vocab = 5 + rnd.nextInt(400)
      val k = 2 + rnd.nextInt(24)
      val skewed = rnd.nextBoolean()
      val stream = (1 to (500 + rnd.nextInt(1500))).map { _ =>
        val z = rnd.nextInt(vocab)
        // skewed streams square the draw toward low ids (a hot head)
        s"w${if (skewed) (z.toLong * z / vocab).toInt else z}"
      }
      val n = stream.size
      val exact = stream.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val parts = 1 + rnd.nextInt(8)
      val got = stream.toDF("w").repartition(parts)
        .agg(graft.functions.MgFunctions.misraGries($"w", k).as("mg"))
        .select(explode($"mg").as("e")).select($"e.item", $"e.est")
        .as[(String, Long)].collect().toMap
      assert(got.size <= k, s"trial $trial: ${got.size} counters > k=$k")
      got.foreach { case (w, est) =>
        assert(est <= exact(w), s"trial $trial: $w overestimated")
        assert(exact(w) - est <= n / (k + 1), s"trial $trial: $w deficit bound")
      }
      exact.foreach { case (w, tru) =>
        if (tru > n / (k + 1))
          assert(got.contains(w), s"trial $trial: lost guaranteed $w ($tru > ${n / (k + 1)})")
      }
    }
  }

  test("property: quantile sketch one-sided rank bound across random streams, distributions, k, partitionings") {
    // the sketch-side twin of the MG property above: est <= true <=
    // est + errBound at random probe points, with the sketch exact
    // (errBound 0) whenever n never exceeds capacity
    for (trial <- 1 to 10) {
      val k = 8 + rnd.nextInt(56)
      val nVals = 50 + rnd.nextInt(4000)
      val shape = rnd.nextInt(3)
      val xs = (1 to nVals).map { _ =>
        shape match {
          case 0 => rnd.nextDouble() * 1000                  // uniform
          case 1 => math.exp(rnd.nextGaussian() * 3)         // heavy tail
          case _ => rnd.nextInt(7).toDouble                  // heavy ties
        }
      }
      val parts = 1 + rnd.nextInt(8)
      val row = xs.toDF("x").repartition(parts)
        .agg(graft.functions.QsFunctions.quantileSketch($"x", k).as("qs"))
        .select($"qs.n", $"qs.err_bound", $"qs.max_weight", $"qs.items").head()
      val sk = graft.functions.QuantileSketchAgg.fromRow(row)
      assert(sk.n == nVals.toLong, s"trial $trial n")
      val sorted = xs.sorted
      val probes = Seq(sorted.head - 1, sorted(nVals / 4), sorted(nVals / 2),
        sorted(3 * nVals / 4), sorted.last + 1) ++
        (1 to 5).map(_ => sorted(rnd.nextInt(nVals)))
      probes.foreach { p =>
        val est = sk.estRank(p)
        val tru = sorted.count(_ <= p).toLong
        assert(est <= tru && tru <= est + sk.errBound,
          s"trial $trial k=$k parts=$parts p=$p est=$est true=$tru bound=${sk.errBound}")
      }
      if (nVals < k) assert(sk.errBound == 0L, s"trial $trial: no compaction yet bound>0")
    }
  }

  test("property: WARC parse round-trips random records, any gzip member grouping") {
    val printable = (' ' to '~').toVector
    for (trial <- 1 to 8) {
      val recs = (0 until 1 + rnd.nextInt(6)).map { i =>
        val payload = Array.fill(rnd.nextInt(300))(
          printable(rnd.nextInt(printable.size)).toByte)
        (s"http://t$trial.example.com/p$i", payload)
      }
      def mk(uri: String, payload: Array[Byte]): Array[Byte] = {
        val head = (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        head ++ payload ++ "\r\n\r\n".getBytes
      }
      val raw = recs.flatMap { case (u, p) => mk(u, p) }.toArray
      // random member grouping: each record boundary flips a coin on
      // whether to start a new gzip member
      val bos = new java.io.ByteArrayOutputStream()
      var cur = new java.io.ByteArrayOutputStream()
      recs.foreach { case (u, p) =>
        cur.write(mk(u, p))
        if (rnd.nextBoolean()) {
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(cur.toByteArray); gz.finish(); gz.close()
          cur = new java.io.ByteArrayOutputStream()
        }
      }
      if (cur.size() > 0) {
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(cur.toByteArray); gz.finish(); gz.close()
      }
      for (bytes <- Seq(raw, bos.toByteArray)) {
        val got = graft.ingest.Warc.parse(bytes)
        assert(got.size == recs.size, s"trial $trial: ${got.size} != ${recs.size}")
        got.zip(recs).foreach { case (g, (u, p)) =>
          assert(g.targetUri == u && java.util.Arrays.equals(g.payload, p),
            s"trial $trial: record mismatch at $u")
        }
      }
    }
  }

  test("property: extractors never throw on random/truncated bytes for any supported format") {
    // ingest at crawl scale sees corrupt files constantly; the contract
    // is Option (None on failure), NEVER an exception that kills a task
    import graft.ingest.Extractors
    val magics: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "PK".getBytes("ISO-8859-1"),           // zip container formats
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte), // OLE2
      "%PDF-1.7\n".getBytes,
      "{\\rtf1 ".getBytes,
      Array(0x1f, 0x8b).map(_.toByte))
    for (trial <- 1 to 6; ext <- Extractors.supportedExtensions) {
      val junk = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      val prefixed = magics(trial % magics.size) ++ junk
      // must return (not throw); content of the Option is unspecified
      Extractors.extract(s"f$ext", junk)
      Extractors.extract(s"f$ext", prefixed)
      Extractors.extract(s"f$ext", prefixed.take(rnd.nextInt(prefixed.length + 1)))
    }
  }

  test("property: AVI parse never throws; mux->demux round-trips random frame sets; cuts keep a prefix") {
    import graft.ops.Multimodal
    for (trial <- 1 to 8) {
      // random frames (incl. empty and odd-length) survive the round trip
      val frames = (0 until rnd.nextInt(6)).map(_ =>
        Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
      val avi = Multimodal.muxAvi(1 + rnd.nextInt(512), 1 + rnd.nextInt(512),
        1L + rnd.nextInt(100000), frames)
      val back = Multimodal.aviFrames(avi)
      assert(back.length == frames.length)
      back.zip(frames).foreach { case (g, w) => assert(g.sameElements(w)) }
      assert(Multimodal.aviMeta(avi).nFrames == frames.length.toLong)
      // any truncation yields a PREFIX of the frames, never a throw
      val cut = avi.take(rnd.nextInt(avi.length + 1))
      val partial = Multimodal.aviFrames(cut)
      assert(partial.length <= frames.length)
      partial.zip(frames).foreach { case (g, w) => assert(g.sameElements(w)) }
      // garbage and RIFF-prefixed junk parse deterministically, no throw
      val junk = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      Multimodal.aviFrames(junk); Multimodal.aviMeta(junk)
      val riffJunk = "RIFF".getBytes ++ junk
      Multimodal.aviFrames(riffJunk); Multimodal.aviMeta(riffJunk)
      val aviJunk = avi.take(12) ++ junk
      Multimodal.aviFrames(aviJunk); Multimodal.aviMeta(aviJunk)
    }
  }

  test("property: DSIR micro sums bit-identical across partitionings on random corpora") {
    for (trial <- 1 to 5) {
      val vocab = (1 to 40).map(i => s"t$i")
      def doc() = (1 to 3 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (1L to (30L + rnd.nextInt(60))).map(i => (i, doc())).toDF("doc_id", "text")
      val target = docs.filter($"doc_id" % 3 === 0)
      def weights(p: Int) = TextAnalytics
        .dsirWeights(docs.repartition(p), target.repartition(p), "doc_id", "text", 128)
        .select($"sid", $"logw_micro").as[(Long, Long)].collect().toMap
      val a = weights(1)
      val b = weights(7)
      assert(a == b, s"trial $trial: micro sums diverged under repartition")
    }
  }

  test("property: MMR with lambda=10 is exactly the relevance ranking") {
    for (trial <- 1 to 5) {
      val dim = 6
      val vecs = (1L to (20L + rnd.nextInt(30))).map { i =>
        (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      }.toDF("vec_id", "embedding")
      val q = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val k = 5 + rnd.nextInt(5)
      val mmr = SimilaritySearch.mmrRerank(vecs, "vec_id", "embedding", q,
          poolSize = 15, k = k, lambdaNum = 10)
        .select($"vec_id").as[Long].collect().toSeq
      val rel = vecs
        .withColumn("c", graft.functions.VectorFunctions
          .cosineSimilarity($"embedding", lit(q)))
        .orderBy($"c".desc, $"vec_id".asc).limit(k)
        .select($"vec_id").as[Long].collect().toSeq
      assert(mmr == rel, s"trial $trial: $mmr != $rel")
    }
  }

  test("property: session stats conserve events; deciles partition each type exactly") {
    for (trial <- 1 to 5) {
      val ev = (1L to (200L + rnd.nextInt(300))).map { i =>
        (i, rnd.nextInt(20).toLong, rnd.nextInt(100000).toLong)
      }.toDF("event_id", "user_id", "ts")
      val ss = EventAnalytics.sessionStats(ev, "user_id", "ts", "event_id",
          gapUnits = 1000L)
        .select($"n_events", $"duration").as[(Long, Long)].collect()
      assert(ss.map(_._1).sum == ev.count(), s"trial $trial: events not conserved")
      assert(ss.forall(_._2 >= 0), s"trial $trial: negative duration")
    }
    val ev2 = (1L to 500L).map { i =>
      (s"t${rnd.nextInt(3)}", rnd.nextDouble() * 100)
    }.toDF("event_type", "value")
    val th = (1 to 9).map(i => round(expr(s"percentile(value, 0.$i)"), 6).as(s"t$i"))
    val thDf = ev2.groupBy($"event_type").agg(th.head, th.tail: _*)
    val bucket = (1 to 9).map(i =>
      when($"value" > col(s"t$i"), 1L).otherwise(0L)).reduce(_ + _) + 1L
    val got = ev2.join(broadcast(thDf), "event_type")
      .withColumn("d", bucket)
      .groupBy($"event_type").agg(count(lit(1)).as("n"),
        countDistinct($"d").as("nd"), min($"d").as("lo"), max($"d").as("hi"))
      .as[(String, Long, Long, Long, Long)].collect()
    got.foreach { case (t, n, nd, lo, hi) =>
      assert(lo >= 1L && hi <= 10L, s"$t: bucket out of range")
      assert(nd >= 9L, s"$t: deciles collapsed ($nd distinct)") // ~167 values spread all 10
    }
  }

  test("property: snapshot log matches an in-memory model across random op sequences") {
    import graft.store.SnapshotLog
    // model: version -> Map(id -> text); every committed version must
    // read back exactly its model state, at every point in the run
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-snapprop$trial").toString
      var model = Vector.empty[Map[Long, String]]
      def df(rows: Map[Long, String]) =
        rows.toSeq.toDF("id", "text").repartition(1 + rnd.nextInt(3), $"id")
      val init = (1 to 5 + rnd.nextInt(10))
        .map(i => i.toLong -> s"t$trial-$i").toMap
      SnapshotLog.init(df(init), dir)
      model :+= init
      var nextId = 1000L
      for (step <- 1 to 6) {
        rnd.nextInt(3) match {
          case 0 => // append fresh ids
            val batch = (1 to 1 + rnd.nextInt(4))
              .map { _ => nextId += 1; nextId -> s"a$step-$nextId" }.toMap
            SnapshotLog.append(df(batch), dir)
            model :+= (model.last ++ batch)
          case 1 => // upsert: replace some existing + insert one new
            val existing = model.last.keys.toSeq.sorted
              .take(1 + rnd.nextInt(3)).map(k => k -> s"u$step-$k")
            nextId += 1
            val batch = (existing :+ (nextId -> s"u$step-$nextId")).toMap
            SnapshotLog.upsert(spark, df(batch), dir, Seq("id"))
            model :+= (model.last ++ batch)
          case 2 => // rollback to a random earlier version
            val v = rnd.nextInt(model.size)
            SnapshotLog.rollback(dir, v.toLong)
            model :+= model(v)
        }
      }
      // every version ever committed reads back as its model state
      model.indices.foreach { v =>
        val got = SnapshotLog.read(spark, dir, Some(v.toLong))
          .as[(Long, String)].collect().toMap
        assert(got == model(v), s"trial $trial v$v: got ${got.size} rows")
        assert(SnapshotLog.readSnapshotMeta(dir, v.toLong).rowCount == model(v).size.toLong)
      }
      // vacuum to the last 2 versions: they still read correctly
      SnapshotLog.vacuum(dir, keepVersions = 2, graceMillis = 0L)
      val keptVs = model.indices.takeRight(2)
      keptVs.foreach { v =>
        val got = SnapshotLog.read(spark, dir, Some(v.toLong))
          .as[(Long, String)].collect().toMap
        assert(got == model(v), s"trial $trial post-vacuum v$v")
      }
    }
  }

  test("property: snapshot CDC apply matches the model across random change batches") {
    import graft.store.SnapshotLog
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cdcprop$trial").toString
      val init = (1 to 8 + rnd.nextInt(8)).map(i => i.toLong -> s"t$trial-$i").toMap
      SnapshotLog.init(init.toSeq.toDF("id", "text")
        .repartition(1 + rnd.nextInt(3), $"id"), dir)
      var state = init
      var nextId = 500L
      for (step <- 1 to 5) {
        // random change batch: deletes of existing keys, updates of
        // existing keys, inserts of fresh keys — at most one op per key
        val existing = state.keys.toSeq.sorted
        val dels = existing.take(rnd.nextInt(1 + existing.size / 4))
        val upds = existing.drop(dels.size).take(rnd.nextInt(3))
        val ins = (1 to rnd.nextInt(3)).map { _ => nextId += 1; nextId }
        val changes =
          dels.map(k => ("delete", k, null: String)) ++
          upds.map(k => ("update", k, s"u$step-$k")) ++
          ins.map(k => ("insert", k, s"i$step-$k"))
        if (changes.nonEmpty) {
          SnapshotLog.applyCdc(spark,
            changes.toDF("op", "id", "text").repartition(1 + rnd.nextInt(2)),
            dir, Seq("id"), batchId = step.toLong)
          state = state -- dels ++
            upds.map(k => k -> s"u$step-$k") ++ ins.map(k => k -> s"i$step-$k")
        }
        val got = SnapshotLog.read(spark, dir).as[(Long, String)].collect().toMap
        assert(got == state, s"trial $trial step $step: ${got.size} vs ${state.size}")
        assert(SnapshotLog.readSnapshotMeta(dir,
          SnapshotLog.currentVersion(dir).get).rowCount == state.size.toLong)
      }
    }
  }

  test("property: aho-corasick matches naive counts on unicode-mixed random corpora") {
    import graft.functions.MultiMatchFunctions._
    def naive(text: String, pat: String): Long = {
      var i = 0; var c = 0L
      var j = text.indexOf(pat, i)
      while (j >= 0) { c += 1; i = j + pat.length; j = text.indexOf(pat, i) }
      c
    }
    // alphabet mixes 1-byte, 2-byte, and 3-byte UTF-8 chars so byte-
    // level matching is exercised across encodings and alignments
    val alpha = "abé日 "
    def randText(n: Int) = (1 to n).map(_ => alpha.charAt(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 4) {
      val pats = (1 to 30).map(_ => randText(1 + rnd.nextInt(4)))
        .distinct.filter(_.nonEmpty)
      val texts = (1L to 40L).map(i => (i, randText(rnd.nextInt(60))))
      val got = texts.toDF("id", "text")
        .select($"id", multiMatchCounts($"text", pats).as("c"))
        .as[(Long, Seq[Long])].collect().toMap
      texts.foreach { case (id, tx) =>
        val want = pats.map(naive(tx, _))
        assert(got(id) == want, s"trial $trial id=$id text='$tx'")
      }
    }
  }
}
