package graft

import graft.embed.DeterministicEmbedder
import graft.search.{SearchOptions, VectorSearch}
import graft.streaming.Streams
import graft.streaming.Streams.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("windowed event counts: watermarked tumbling window (streaming) == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val events = Seq(
      UserEvent(1, ts(5), "click", 1.0), UserEvent(1, ts(20), "click", 2.0),
      UserEvent(2, ts(70), "view", 3.5), UserEvent(1, ts(95), "click", 0.25))
    input.addData(events: _*)
    val q = Streams.windowedEventCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select("window_start", "event_type", "n_events", "value_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(got == Set(
        (ts(0), "click", 2L, 300L),
        (ts(60), "view", 1L, 350L),
        (ts(60), "click", 1L, 25L)))
      // batch twin: same function over a batch frame, same result
      val batch = Streams.windowedEventCounts(events.toDF(), "1 hour")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("sessionization: gap close + event-time timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = Streams.sessionizeStream(input.toDS(), gapSeconds = 1800, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then 40 min gap
      // (new session). Starts at minute 1: an event AT the initial
      // watermark (t=0) would be dropped as late.
      input.addData(
        UserEvent(1, ts(1), "a", 0), UserEvent(1, ts(11), "a", 0),
        UserEvent(1, ts(51), "a", 0))
      q.processAllAvailable()
      // sentinel far in the future advances the watermark past 50min+gap,
      // timing out the open session
      input.addData(UserEvent(99, ts(10000), "z", 0))
      q.processAllAvailable()
      input.addData(UserEvent(98, ts(20000), "z", 0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .as[Streams.UserSession].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime / 60000, s.session_end.getTime / 60000, s.n_events))
        .toSet
      assert(got == Set((1L, 11L, 2L), (51L, 51L, 1L)))
    } finally q.stop()
  }

  test("streaming funnel: watermark-flushed completions == batch funnelAgg") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val steps = Seq("signup", "view", "purchase")
    // u1 completes all 3 (with the view arriving OUT OF ORDER in a later
    // trigger — the buffered DP must still see it); u2 purchases before
    // viewing (depth 2); u3 never signs up (no row)
    val batch1 = Seq(
      UserEvent(1, ts(1), "signup", 0), UserEvent(1, ts(30), "purchase", 0),
      UserEvent(2, ts(1), "signup", 0), UserEvent(2, ts(10), "purchase", 0),
      UserEvent(2, ts(20), "view", 0), UserEvent(3, ts(5), "view", 0))
    val batch2 = Seq(UserEvent(1, ts(15), "view", 0))
    // 1-hour watermark delay: batch2's view (minute 15) arrives after a
    // minute-30 event — a 0s watermark would drop it as late
    val q = Streams.funnelStream(input.toDS(), steps,
        horizonSeconds = 3600, watermark = "1 hour")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // sentinel advances the watermark past every horizon -> flush all
      input.addData(UserEvent(99, ts(10000), "signup", 0))
      q.processAllAvailable()
      input.addData(UserEvent(98, ts(20000), "signup", 0))
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .as[Streams.FunnelCompletion].collect()
        .filter(_.user_id < 90)
        .map(c => c.user_id -> c.completions).toMap
      // unix_millis matches the stream path's Timestamp.getTime units
      val batch = graft.ops.EventAnalytics.funnelAgg(
          (batch1 ++ batch2).toDF()
            .withColumn("ts", org.apache.spark.sql.functions.expr("unix_millis(ts)")),
          "user_id", "event_type", "ts", steps)
        .collect().map(r => r.getLong(0) ->
          (1 to 3).map(i => if (r.isNullAt(i)) None
            else Some(r.getLong(i))).toSeq).toMap
      assert(got == batch)
      assert(got(1L).forall(_.isDefined) && got(2L)(2).isEmpty && !got.contains(3L))
    } finally q.stop()
  }

  test("streaming funnel: key active past the horizon survives the watermark") {
    // Regression: the event-time timeout is min(buffered ts) + horizon,
    // which never advances; once the watermark passes it, the next event
    // for the key used to call setTimeoutTimestamp(<= watermark), which
    // Spark rejects — killing the query. The clamp (watermark + 1) must
    // keep the key alive and flush one completion over ALL its events.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val steps = Seq("signup", "view")
    val q = Streams.funnelStream(input.toDS(), steps,
        horizonSeconds = 600, watermark = "1 minute")
      .writeStream.format("memory").queryName("funnel_long")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(UserEvent(1, ts(1), "signup", 0))
      q.processAllAvailable() // timeout pinned at minute 11
      input.addData(UserEvent(1, ts(30), "view", 0))
      q.processAllAvailable() // watermark -> minute 29 after this trigger
      // next event for u1 arrives with watermark (29) PAST min+horizon (11)
      input.addData(UserEvent(1, ts(31), "view", 0))
      q.processAllAvailable()
      // sentinels advance the watermark far enough to fire the timeout
      input.addData(UserEvent(99, ts(10000), "signup", 0))
      q.processAllAvailable()
      input.addData(UserEvent(98, ts(20000), "signup", 0))
      q.processAllAvailable()
      val got = spark.table("funnel_long")
        .as[Streams.FunnelCompletion].collect()
        .filter(_.user_id == 1L)
      assert(got.length == 1)
      assert(got.head.completions ==
        Seq(Some(ts(1).getTime), Some(ts(30).getTime)))
    } finally q.stop()
  }

  test("streaming first-touch: monotone update log reconstructs the batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    // u1's true first touch ("ad" at minute 1) arrives in a LATER
    // trigger than its purchase — the running min must absorb it
    val batch1 = Seq(
      UserEvent(1, ts(5), "view", 0), UserEvent(1, ts(30), "purchase", 0),
      UserEvent(2, ts(2), "email", 0), UserEvent(2, ts(3), "purchase", 0))
    val batch2 = Seq(
      UserEvent(1, ts(1), "ad", 0), UserEvent(1, ts(40), "purchase", 0),
      UserEvent(3, ts(7), "view", 0))
    val q = Streams.firstTouchStream(input.toDS(), convType = "purchase")
      .writeStream.format("memory").queryName("ft_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // components are monotone: min(first_ts,type) + max(nConv) over a
      // user's update rows IS the final state, whatever the triggers were
      val got = spark.table("ft_out").as[Streams.UserFirstTouch]
        .collect().groupBy(_.user_id)
        .map { case (u, rs) =>
          u -> (rs.map(r => (r.first_ts, r.first_touch)).min._2,
            rs.map(_.n_conversions).max)
        }
      val batch = graft.ops.EventAnalytics.firstTouchAttribution(
          (batch1 ++ batch2).toDF()
            .withColumn("ts", org.apache.spark.sql.functions.expr("unix_millis(ts)")),
          // the stream has no event id; type doubles as the tiebreak
          "user_id", "event_type", "ts", "event_type", convType = "purchase")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      val rollup = got.groupBy(_._2._1).map { case (t, us) =>
        t -> (us.size.toLong, us.map(_._2._2).sum)
      }
      assert(rollup == batch.map { case (t, (nu, nc)) => t -> (nu, nc) })
      assert(got(1L) == (("ad", 2L)) && got(2L) == (("email", 1L)) &&
        got(3L) == (("view", 0L)))
    } finally q.stop()
  }

  test("incremental ingest: new files become searchable chunks") {
    val src = Files.createTempDirectory("graft_stream_src")
    val db = Files.createTempDirectory("graft_stream_db")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt")
    val embedder = DeterministicEmbedder(dim = 32)

    Files.writeString(src.resolve("a.txt"), "the quick brown fox jumps over the lazy dog. " * 10)
    val q1 = Streams.incrementalIngest(spark, src.toString, db.toString,
      embedder, chunkSize = 100, checkpointDir = ckpt.toString)
    q1.awaitTermination()
    val n1 = spark.read.parquet(s"$db/chunks").count()
    assert(n1 > 0)

    // a second file arrives; a new AvailableNow run picks up ONLY it
    Files.writeString(src.resolve("b.txt"), "vector search over spark dataframes. " * 10)
    val q2 = Streams.incrementalIngest(spark, src.toString, db.toString,
      embedder, chunkSize = 100, checkpointDir = ckpt.toString)
    q2.awaitTermination()
    val chunks = spark.read.parquet(s"$db/chunks")
    assert(chunks.count() > n1)
    assert(chunks.select("file_name").distinct().count() == 2)

    // the appended index is immediately searchable with the batch engine
    val qv = embedder.embedQuery(spark, "vector search spark")
    val hits = VectorSearch.searchChunks(chunks, qv, "cosine",
      SearchOptions(k = 3, scoreThreshold = 0.0)).collect()
    assert(hits.nonEmpty)
  }

  test("streaming IVF-PQ maintenance: per-trigger upserts == batch rebuild; in-batch dup ids collapse") {
    implicit val sqlCtx = spark.sqlContext
    val mk = (i: Long, c: Int) => Array.tabulate(8)(d =>
      (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat)
    val vecs = (0L until 200L).map(i => (i, mk(i, (i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val model = graft.ops.ProductQuantization.ivfPqTrain(vecs, "vec_id",
      "embedding", dim = 8, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    val dir = Files.createTempDirectory("ivfpq_stream").toString
    graft.ops.ProductQuantization.ivfPqWrite(vecs, dir, "vec_id", "embedding", model)

    val input = MemoryStream[(Long, Array[Float])]
    val ckpt = Files.createTempDirectory("ivfpq_stream_ckpt").toString
    // trigger 1: a move (0 -> cluster 1) + an insert; the moved id
    // appears TWICE in-batch — the max-struct collapse must pick one
    // row deterministically before the upsert
    input.addData((0L, mk(0, 1)), (0L, mk(0, 1)), (500L, mk(500, 2)))
    val q1 = Streams.ivfPqMaintainStream(input.toDF().toDF("vec_id", "embedding"),
      dir, "vec_id", "embedding", ckpt)
    q1.awaitTermination()
    // trigger 2 (same checkpoint): replace the insert, add another
    input.addData((500L, mk(500, 3)), (501L, mk(501, 0)))
    val q2 = Streams.ivfPqMaintainStream(input.toDF().toDF("vec_id", "embedding"),
      dir, "vec_id", "embedding", ckpt)
    q2.awaitTermination()

    val finalCorpus = vecs.filter($"vec_id" =!= 0L)
      .unionByName(Seq((0L, mk(0, 1)), (500L, mk(500, 3)), (501L, mk(501, 0)))
        .toDF("vec_id", "embedding"))
    val rebuildDir = Files.createTempDirectory("ivfpq_stream_rebuild").toString
    graft.ops.ProductQuantization.ivfPqWrite(finalCorpus, rebuildDir,
      "vec_id", "embedding", model)
    def dump(d: String) = spark.read.parquet(s"$d/codes")
      .select($"vec_id", $"pq_code", $"bucket".cast("int"))
      .as[(Long, Seq[Byte], Int)].collect().toSet
    assert(dump(dir) == dump(rebuildDir))
  }

  test("streaming heavy hitters: summary merges across triggers, MG guarantee vs full history") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val summary = Files.createTempDirectory("mg_stream").resolve("summary.bin")
    val ckpt = Files.createTempDirectory("mg_stream_ckpt").toString
    val k = 8
    // trigger 1: small vocab — summary must be the exact counts
    val b1: Seq[String] = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++ Seq("c1", "c2")
    input.addData(b1)
    Streams.heavyHittersStream(input.toDF().toDF("w"), "w", k, summary, ckpt)
      .awaitTermination()
    val s1 = graft.functions.MgSummary.read(summary, k)
    assert(s1.counts.get("hot") == 30L && s1.counts.get("warm") == 10L)
    // trigger 2 (same checkpoint): adversarial vocab larger than k
    val b2: Seq[String] = Seq.fill(25)("hot") ++ (1 to 40).map(i => s"cold$i")
    input.addData(b2)
    Streams.heavyHittersStream(input.toDF().toDF("w"), "w", k, summary, ckpt)
      .awaitTermination()
    val s2 = graft.functions.MgSummary.read(summary, k)
    val history = b1 ++ b2
    val n = history.size
    val exact = history.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    assert(s2.counts.size <= k)
    // every guaranteed-heavy item present; no overestimates; deficit bound
    exact.foreach { case (w, tru) =>
      if (tru > n / (k + 1)) assert(s2.counts.containsKey(w), s"lost $w ($tru > ${n / (k + 1)})")
    }
    s2.counts.forEach { (w, est) =>
      assert(est <= exact(w), s"$w overestimated: $est > ${exact(w)}")
      assert(exact(w) - est <= n / (k + 1), s"$w deficit too large")
    }
  }

  test("streaming BM25 maintenance: maintained index == full rebuild, scores bit-identical") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.InvertedIndex
    val idxDir = Files.createTempDirectory("bm25_stream_idx").toString
    val ckpt = Files.createTempDirectory("bm25_stream_ckpt").toString
    val d1 = Seq((1L, "spark query engine"), (2L, "fast vector query"))
    val d2 = Seq((3L, "query planner rules"), (4L, "storage engine pages"))
    val d3 = Seq((5L, "vector index scan"))
    InvertedIndex.write(d1.toDF("doc_id", "text"), "doc_id", "text", idxDir, numBuckets = 8)
    val input = MemoryStream[(Long, String)]
    // trigger 1 (with an in-batch duplicate id that must collapse),
    // then trigger 2 on the same checkpoint
    input.addData(d2 :+ ((3L, "query planner rules")): _*)
    Streams.bm25MaintainStream(input.toDF().toDF("doc_id", "text"), idxDir,
      "doc_id", "text", ckpt).awaitTermination()
    input.addData(d3: _*)
    Streams.bm25MaintainStream(input.toDF().toDF("doc_id", "text"), idxDir,
      "doc_id", "text", ckpt).awaitTermination()
    // full rebuild over the complete corpus
    val fullDir = Files.createTempDirectory("bm25_full_idx").toString
    InvertedIndex.write((d1 ++ d2 ++ d3).toDF("doc_id", "text"),
      "doc_id", "text", fullDir, numBuckets = 8)
    for (terms <- Seq(Seq("query"), Seq("vector", "engine"), Seq("scan", "pages"))) {
      val a = InvertedIndex.bm25SearchIndexed(spark, idxDir, terms)
        .as[(Long, Double)].collect().toSeq
      val b = InvertedIndex.bm25SearchIndexed(spark, fullDir, terms)
        .as[(Long, Double)].collect().toSeq
      assert(a == b, s"terms=$terms maintained=$a rebuild=$b")
    }
    // stats row identical (exact integer sums drive avgdl); the replay
    // fence column differs by design (maintained records batch ids)
    val statCols = Seq("n", "avgdl", "num_buckets", "sum_dl")
    val sa = spark.read.parquet(s"$idxDir/stats")
      .select(statCols.map(col): _*).collect().head
    val sb = spark.read.parquet(s"$fullDir/stats")
      .select(statCols.map(col): _*).collect().head
    assert(sa == sb, s"stats: $sa vs $sb")
    assert(spark.read.parquet(s"$idxDir/stats").collect().head.getLong(4) == 1L,
      "maintained index must record the last stream batch id")
  }

  test("streaming pca: maintained model BIT-identical to batch fit over full history, replay fenced") {
    import graft.ops.Pca
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val state = Files.createTempDirectory("pca_stream").resolve("gram.bin")
    val ckpt = Files.createTempDirectory("pca_stream_ckpt").toString
    def mk(range: Range) = range.map { i =>
      (i.toLong, (0 until 8).map(j =>
        (math.sin(i * 0.31 + j * 1.7) * (1.0 + j % 3)).toFloat).toArray)
    }
    val b1 = mk(0 until 120)
    val b2 = mk(120 until 300)
    input.addData(b1)
    Streams.pcaMaintainStream(input.toDF().toDF("vec_id", "vec"), "vec", 8,
      state, ckpt).awaitTermination()
    input.addData(b2)
    Streams.pcaMaintainStream(input.toDF().toDF("vec_id", "vec"), "vec", 8,
      state, ckpt).awaitTermination()
    val streamed = Pca.modelFromState(state, 8, 3)
    val batch = Pca.fit((b1 ++ b2).toDF("vec_id", "vec"), "vec", 8, 3)
    // exact integer moments: not close — EQUAL
    assert(streamed.mean.toSeq == batch.mean.toSeq)
    assert(streamed.eigenvalues.toSeq == batch.eigenvalues.toSeq)
    assert(streamed.components.map(_.toSeq).toSeq ==
      batch.components.map(_.toSeq).toSeq)
    assert(streamed.trace == batch.trace)
    // replay fence: re-merging batch 1's gram by hand would inflate n;
    // the stream-side fence (gram.bin.batch == 1) blocks redelivery
    val fence = state.resolveSibling(state.getFileName.toString + ".batch")
    assert(Files.exists(fence) &&
      new String(Files.readAllBytes(fence)).trim.toLong == 1L)
    val st = Pca.GramIO.read(state, 8)
    assert(st.n == 300L)
  }

  test("streaming agg view: CDC triggers maintain rollup == recompute, bucket fences block replay") {
    import graft.ops.AggView
    implicit val sqlCtx = spark.sqlContext
    val viewDir = Files.createTempDirectory("graft_aggview_stream").toString
    val ckpt = Files.createTempDirectory("graft_aggview_ckpt").toString
    // base table: 60 rows across 3 keys
    val base = (0 until 60).map(i => (i.toLong, s"k${i % 3}", 10.0 + i))
      .toDF("id", "key", "v")
    AggView.build(base, viewDir, "key", "v", buckets = 4)
    // trigger 1: insert 20 new rows on keys k0/k3 (k3 is NEW); trigger
    // 2: delete ten of the base rows and bump ten others by +5
    val input = MemoryStream[(String, String, Option[Double], Option[Double])]
    def run() = Streams.aggViewCdcStream(
      input.toDF().toDF("op", "key", "value_before", "value_after"),
      viewDir, "key", ckpt).awaitTermination()
    input.addData((0 until 20).map(i =>
      ("insert", if (i % 2 == 0) "k0" else "k3", None: Option[Double],
        Some(100.0 + i))))
    run()
    input.addData(
      (0 until 10).map(i =>
        ("delete", s"k${(i * 3) % 3}", Some(10.0 + i * 3), None: Option[Double])) ++
      (30 until 40).map(i =>
        ("update", s"k${i % 3}", Some(10.0 + i), Some(15.0 + i))))
    run()
    // expected: recompute over the mutated row set
    val mutated = (0 until 60).filterNot(i => i % 3 == 0 && i < 30)
      .map { i =>
        val v = if (i >= 30 && i < 40) 15.0 + i else 10.0 + i
        (s"k${i % 3}", v)
      } ++ (0 until 20).map(i => (if (i % 2 == 0) "k0" else "k3", 100.0 + i))
    val want = mutated.groupBy(_._1).map { case (k, vs) =>
      (k, vs.size.toLong, vs.map(v => math.round(v._2 * 100)).sum)
    }.toSet
    val got = AggView.read(spark, viewDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got $got\nwant $want")
    // replay: a redelivered trigger carries the SAME batch id and the
    // same changes — every touched bucket's fence is already at 1, so
    // nothing rewrites
    val replay = ((0 until 10).map(i =>
        ("delete", s"k${(i * 3) % 3}", Some(10.0 + i * 3), None: Option[Double])) ++
      (30 until 40).map(i =>
        ("update", s"k${i % 3}", Some(10.0 + i), Some(15.0 + i))))
      .toDF("op", "key", "value_before", "value_after")
    assert(AggView.applyCdc(spark, replay, viewDir, "key", batchId = 1L) == 0)
    assert(AggView.read(spark, viewDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == want)
  }

  test("streaming ewma: out-of-order triggers, state equals batch series bit-exact, fenced") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val state = Files.createTempDirectory("ewma_stream").resolve("daily.tsv")
    val ckpt = Files.createTempDirectory("ewma_stream_ckpt").toString
    val day = 86400L * 1000000000L
    // trigger 1: days 0-4; trigger 2 revisits day 1 (late data) and
    // extends to day 6 — the daily-cents state absorbs both orders
    val b1 = (0 until 50).map(i =>
      ("a", (i % 5) * day + i, 1.0 + i * 0.13)) ++
      (0 until 30).map(i => ("b", (i % 3) * day + i, 2.0 + i * 0.07))
    val b2 = (0 until 40).map(i =>
      ("a", (if (i % 4 == 0) 1L else 5L + i % 2) * day + i, 3.0 + i * 0.11))
    def run() = Streams.ewmaMaintainStream(
      input.toDF().toDF("event_type", "ts", "value"), "event_type", "ts",
      "value", state, ckpt).awaitTermination()
    input.addData(b1); run()
    input.addData(b2); run()
    val streamed = graft.ops.EventAnalytics
      .ewmaFromState(spark, state, "event_type", alpha = 0.3)
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val batch = graft.ops.EventAnalytics.ewmaSmooth(
        (b1 ++ b2).toDF("event_type", "ts", "value"), "event_type", "ts",
        "value", alpha = 0.3)
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(streamed == batch, "streamed series must equal batch bit-exact")
    // fence: re-running with no new data must not double-merge
    val before = graft.ops.EventAnalytics.DailyStateIO.read(state)
    run()
    assert(graft.ops.EventAnalytics.DailyStateIO.read(state) == before)
  }

  test("streaming quantile sketch: summary merges across triggers, rank bound vs full history") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val summary = Files.createTempDirectory("qs_stream").resolve("summary.bin")
    val ckpt = Files.createTempDirectory("qs_stream_ckpt").toString
    val k = 32
    // trigger 1: under capacity — the persisted summary is exact
    val b1 = (1 to 20).map(_.toDouble)
    input.addData(b1)
    Streams.quantileSketchStream(input.toDF().toDF("x"), "x", k, summary, ckpt)
      .awaitTermination()
    val s1 = graft.functions.QSketchIO.read(summary, k)
    assert(s1.n == 20L && s1.errBound == 0L)
    assert(s1.valueAtRank(10L) == 10.0)
    // trigger 2 (same checkpoint): enough mass to force compaction;
    // the one-sided guarantee must hold against the FULL history
    val b2 = (1 to 2000).map(i => (i % 500).toDouble)
    input.addData(b2)
    Streams.quantileSketchStream(input.toDF().toDF("x"), "x", k, summary, ckpt)
      .awaitTermination()
    val s2 = graft.functions.QSketchIO.read(summary, k)
    val history = (b1 ++ b2).sorted
    assert(s2.n == history.size.toLong)
    assert(s2.errBound > 0L && s2.errBound < s2.n / 2)
    val summ = graft.functions.QSummary(s2.n, s2.errBound, s2.maxWeight,
      s2.sortedItems)
    for (q <- 1 to 9) {
      val t = math.ceil(q * s2.n / 10.0).toLong
      val v = summ.valueAtRank(t)
      val est = summ.estRank(v)
      val tru = history.count(_ <= v).toLong
      assert(est >= t && est <= tru && tru <= est + s2.errBound,
        s"q=$q v=$v est=$est true=$tru bound=${s2.errBound}")
    }
    // replay fence: the sidecar records the last applied batch id, and
    // a redelivered (not-newer) id must not double-merge — n/errBound
    // would silently inflate otherwise
    val fenceFile = summary.resolveSibling(summary.getFileName.toString + ".batch")
    assert(Files.exists(fenceFile) &&
      new String(Files.readAllBytes(fenceFile)).trim.toLong == 1L,
      "two triggers must leave fence = 1")
    Files.write(fenceFile, "999".getBytes) // all future ids <= fence
    input.addData((1 to 50).map(_.toDouble))
    val ckpt2 = Files.createTempDirectory("qs_stream_ckpt2").toString
    Streams.quantileSketchStream(input.toDF().toDF("x"), "x", k, summary, ckpt2)
      .awaitTermination()
    val s3 = graft.functions.QSketchIO.read(summary, k)
    assert(s3.n == s2.n && s3.errBound == s2.errBound,
      "fenced replay must not merge")
  }

  test("streaming embedding mean: two-trigger state == batch sums exactly (dyadic values)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val state = Files.createTempDirectory("mean_stream").resolve("state.txt")
    val ckpt = Files.createTempDirectory("mean_stream_ckpt").toString
    // multiples of 1/8: double sums are exact in ANY accumulation
    // order, so stream-merged sums must equal batch sums bit for bit
    val mk = (i: Long) => Array((i % 8) / 8.0f, ((i * 3) % 8) / 8.0f - 0.5f)
    val b1 = (1L to 40L).map(i => (i, mk(i)))
    val b2 = (41L to 100L).map(i => (i, mk(i)))
    input.addData(b1)
    Streams.embeddingMeanStream(input.toDF().toDF("vec_id", "embedding"),
      "embedding", dim = 2, state, ckpt).awaitTermination()
    input.addData(b2)
    Streams.embeddingMeanStream(input.toDF().toDF("vec_id", "embedding"),
      "embedding", dim = 2, state, ckpt).awaitTermination()
    val (n, sums) = Streams.MeanState.read(state, 2)
    assert(n == 100L)
    val all = b1 ++ b2
    val expect = Array(all.map(_._2(0).toDouble).sum, all.map(_._2(1).toDouble).sum)
    assert(sums.toSeq == expect.toSeq)
    // micro-snapped mean matches the batch drift op's snap convention
    val micro = Streams.MeanState.meanMicro(state, 2)
    assert(micro.toSeq == expect.map(s => math.round(s / 100 * 1e6)).toSeq)
  }

  test("streaming fuzzy decontamination: estimates match the batch signatures, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again forever " * 4
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, base), // verbatim: est 1.0
      (2L, base.replace("lazy", "idle")), // near-dup: high est
      (3L, "completely different material about distributed query engines " * 5))
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val out = Streams.minhashDecontaminateStream(
      input.toDF().toDF("doc_id", "text"), "text", bench, "doc_id", "text",
      n = 8, numHashes = 16, threshold = 0.25)
    val q = out.writeStream.format("memory").queryName("fuzzy_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty) // stateless plan
      val got = spark.table("fuzzy_out")
        .select($"doc_id", $"contaminated_fuzzy", $"best_est", $"best_bench_id")
        .as[(Long, Boolean, Double, Long)].collect().map(r => r._1 -> r).toMap
      assert(got(1L)._2 && got(1L)._3 == 1.0 && got(1L)._4 == 100L)
      assert(got(2L)._2 && got(2L)._3 >= 0.25)
      assert(!got(3L)._2)
      // the flagged set equals the batch op's at the same threshold
      // (bench of 1: banding has no false negatives to differ by)
      val batch = graft.ops.Dedup.minhashDecontaminate(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          bench, "doc_id", "text", n = 8, numHashes = 16, rowsPerBand = 2,
          threshold = 0.25)
        .select($"sid").as[Long].collect().toSet
      assert(got.filter(_._2._2).keySet == batch)
    } finally q.stop()
  }

  test("streaming decontamination: flags match the batch op, stateless plan") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "the quick brown fox jumps over a fence"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a completely original sentence with no overlap here at all"),
      (3L, "quick brown fox jumps over nothing important"))
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val stream = Streams.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), "text", bench, "doc_id", "text", n = 5)
    val q = stream.writeStream.format("memory").queryName("decontam_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("decontam_out").select("doc_id", "contaminated")
        .as[(Long, Boolean)].collect().toMap
      val batchFlagged = graft.ops.Dedup.decontaminate(
          docs.toDF("doc_id", "text"), "doc_id", "text", bench, "doc_id", "text", n = 5)
        .select("sid").as[Long].collect().toSet
      assert(got.filter(_._2).keySet == batchFlagged)
      assert(got.keySet == Set(1L, 2L, 3L)) // every doc passes through, flagged or not
    } finally q.stop()
  }

  test("streaming pipeline: quality -> dedup -> decontaminate -> split matches the batch chain") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val bench = Seq((100L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog today", ts(0)), // keeps
      (2L, "the quick brown fox jumps over a lazy dog today", ts(1)), // exact dup of 1
      (3L, "tiny doc", ts(2)), // fails quality
      (4L, "the one two three four five is a good list here", ts(3)), // contaminated
      (5L, "a different and entirely fine document the pipeline keeps", ts(4)))
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    input.addData(docs.take(3): _*)
    input.addData(docs.drop(3): _*)
    val out = Streams.pipelineStream(
      input.toDF().toDF("doc_id", "text", "ingest_ts"),
      "doc_id", "text", "ingest_ts", bench, "doc_id", "text", gramN = 5)
    val q = out.writeStream.format("memory").queryName("pipeline_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("pipeline_out").select($"doc_id", $"split")
        .as[(Long, String)].collect().toMap
      // batch replay of the same chain on the same rows
      val batchQ = graft.ops.TextAnalytics
        .qualityFilter(docs.toDF("doc_id", "text", "ingest_ts"), "text")
        .filter($"passes_quality").select($"doc_id", $"text")
      val batchEx = graft.ops.Dedup.exact(batchQ, "doc_id", "text")
      val flagged = graft.ops.Dedup.decontaminate(batchEx, "doc_id", "text",
        bench, "doc_id", "text", n = 5).select($"sid".as("doc_id"))
      val batch = graft.ops.TextAnalytics.hashSplit(
          batchEx.join(flagged, Seq("doc_id"), "left_anti"), "doc_id")
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.keySet == Set(1L, 5L))
    } finally q.stop()
  }

  test("streaming quality gate + stratified sample: stateless, match batch twins") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and it is a fine day in the sun"),
      (2L, "en", "tiny doc"),
      (3L, "zh", "#### $$$$ %%%% {{{{ }}}} <<<< >>>> #### $$$$ %%%%"),
      (4L, "zh", "the quick brown fox jumps over the lazy dog in a field of tall grass"))
    val input = MemoryStream[(Long, String, String)]
    input.addData(docs: _*)
    val streamDf = input.toDF().toDF("doc_id", "lang", "text")
    val gated = Streams.qualityGateStream(streamDf, "text")
    val q = gated.writeStream.format("memory").queryName("quality_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty) // stateless plan
      val got = spark.table("quality_out").select("doc_id").as[Long].collect().toSet
      val batch = graft.ops.TextAnalytics
        .qualityFilter(docs.toDF("doc_id", "lang", "text"), "text")
        .filter(org.apache.spark.sql.functions.col("passes_quality"))
        .select("doc_id").as[Long].collect().toSet
      assert(got == batch && got == Set(1L, 4L))
    } finally q.stop()

    val input2 = MemoryStream[(Long, String, String)]
    input2.addData(docs: _*)
    val sampled = Streams.stratifiedSampleStream(
      input2.toDF().toDF("doc_id", "lang", "text"), "doc_id", "lang",
      rates = Map("zh" -> 0.0), defaultRate = 1.0)
    val q2 = sampled.writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append).start()
    try {
      q2.processAllAvailable()
      assert(q2.lastProgress.stateOperators.isEmpty)
      val got = spark.table("sample_out").select("doc_id").as[Long].collect().toSet
      val batch = graft.ops.TextAnalytics.stratifiedSample(
          docs.toDF("doc_id", "lang", "text"), "doc_id", "lang",
          rates = Map("zh" -> 0.0), defaultRate = 1.0)
        .select("doc_id").as[Long].collect().toSet
      assert(got == batch && got == Set(1L, 2L)) // zh stratum fully dropped
    } finally q2.stop()
  }

  test("stream-stream interval join: attribution pairs == batch twin == hand-derived; outside-horizon and keyless points drop") {
    implicit val sqlCtx = spark.sqlContext
    val clickIn = MemoryStream[UserEvent]
    val convIn = MemoryStream[UserEvent]
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"ts".as("click_ts"), $"event_type".as("channel"))
    def convs(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"ts".as("conv_ts"), $"value")
    val joined = Streams.intervalJoinStream(
      clicks(clickIn.toDF()), convs(convIn.toDF()),
      "user_id", "click_ts", "conv_ts", horizonSeconds = 3600,
      watermark = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append).start()
    try {
      // trigger 1: user 1 clicks at 1' and 30', converts at 35' (both
      // clicks inside the 1h horizon); user 2 clicks at 10' only
      clickIn.addData(UserEvent(1, ts(1), "email", 0),
        UserEvent(1, ts(30), "ads", 0), UserEvent(2, ts(10), "ads", 0))
      convIn.addData(UserEvent(1, ts(35), "conv", 10.0))
      q.processAllAvailable()
      // trigger 2: user 1 converts at 61' — exactly horizon-end of the
      // 1' click (exclusive: 61' == 1'+3600s drops), inside the 30'
      // click's window; user 2 converts at 80' (70' past its click —
      // outside); user 3 converts with no click at all
      convIn.addData(UserEvent(1, ts(61), "conv", 20.0),
        UserEvent(2, ts(80), "conv", 30.0), UserEvent(3, ts(40), "conv", 40.0))
      q.processAllAvailable()
      val got = spark.table("attr_join")
        .select($"user_id", $"conv_ts", $"click_ts", $"channel", $"value")
        .as[(Long, Timestamp, Timestamp, String, Double)].collect().toSet
      val expected = Set(
        (1L, ts(35), ts(1), "email", 10.0),
        (1L, ts(35), ts(30), "ads", 10.0),
        (1L, ts(61), ts(30), "ads", 20.0))
      assert(got == expected, s"got $got")
      // batch twin: identical function over batch frames
      val cb = clicks(Seq(UserEvent(1, ts(1), "email", 0),
        UserEvent(1, ts(30), "ads", 0), UserEvent(2, ts(10), "ads", 0)).toDF())
      val vb = convs(Seq(UserEvent(1, ts(35), "conv", 10.0),
        UserEvent(1, ts(61), "conv", 20.0), UserEvent(2, ts(80), "conv", 30.0),
        UserEvent(3, ts(40), "conv", 40.0)).toDF())
      val batch = Streams.intervalJoinStream(cb, vb, "user_id", "click_ts",
          "conv_ts", horizonSeconds = 3600)
        .select($"user_id", $"conv_ts", $"click_ts", $"channel", $"value")
        .as[(Long, Timestamp, Timestamp, String, Double)].collect().toSet
      assert(batch == expected, s"batch $batch")
    } finally q.stop()
  }

  test("streaming dedup: duplicate content within the watermark is dropped") {
    val src = java.nio.file.Files.createTempDirectory("graft_dedup_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt")
    // three files, two with identical content -> identical sha256
    java.nio.file.Files.writeString(src.resolve("a.txt"), "same content here")
    java.nio.file.Files.writeString(src.resolve("b.txt"), "same content here")
    java.nio.file.Files.writeString(src.resolve("c.txt"), "different content")

    val docs = Streams.dedupStream(Streams.streamDocuments(spark, src.toString))
    val q = docs.writeStream
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("dedup_out").select("hash").collect().map(_.getString(0))
    assert(out.length == 2, s"expected 2 survivors, got ${out.length}")
    assert(out.distinct.length == 2)
  }

  test("streaming canary screen: leaked docs dropped at ingest, == batch twin, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val canaries = Seq("the secret benchmark question", "canary-guid-123")
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "clean document text"),
      (2L, "contains the secret benchmark question verbatim"),
      (3L, "also clean"),
      (4L, "tagged canary-guid-123 inside"))
    val screened = Streams.canaryScreenStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", canaries)
    val ckpt = Files.createTempDirectory("graft_canary_ckpt").toString
    val q = screened.writeStream.format("memory").queryName("canary_out")
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("canary_out").select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L), s"leaked docs must drop: $out")
    // stateless: no state store operator in the plan
    assert(!screened.queryExecution.analyzed.toString.contains("stateful"))
  }

  test("streaming validation report: counts merge across triggers == batch validate, fenced") {
    import graft.ops.DataProfile
    implicit val sqlCtx = spark.sqlContext
    val report = Files.createTempDirectory("dq_report").resolve("report.json")
    val ckpt = Files.createTempDirectory("dq_ckpt").toString
    val checks = Seq(DataProfile.notNull("v"), DataProfile.inRange("v", 0.0, 10.0))
    val input = MemoryStream[(Long, Option[Double])]
    input.addData((1L, Some(5.0)), (2L, None), (3L, Some(99.0)))
    val q1 = Streams.validateStream(
      input.toDF().toDF("k", "v"), checks, report, ckpt)
    q1.awaitTermination()
    input.addData((4L, Some(2.0)), (5L, None))
    val q2 = Streams.validateStream(
      input.toDF().toDF("k", "v"), checks, report, ckpt)
    q2.awaitTermination()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(report))
    assert(node.get("n_rows").asLong() == 5L)
    // not_null: rows 2 and 5; in_range: 2, 3 (99.0), 5
    assert(node.get("checks").get("not_null(v)").asLong() == 2L)
    assert(node.get("checks").get("in_range(v,0.0,10.0)").asLong() == 3L)
    // == one batch validate over the full history
    val batchAll = DataProfile.validate(
      Seq((1L, Some(5.0)), (2L, None), (3L, Some(99.0)),
        (4L, Some(2.0)), (5L, None)).toDF("k", "v"), checks)
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(batchAll("not_null(v)") == 2L && batchAll("in_range(v,0.0,10.0)") == 3L)
    // fence: replaying an old batch id leaves the report untouched
    DataProfile.mergeReport(report,
      Seq((9L, Option.empty[Double])).toDF("k", "v"), checks, batchId = 0L)
    val after = mapper.readTree(java.nio.file.Files.readAllBytes(report))
    assert(after.get("n_rows").asLong() == 5L, "fenced replay must not merge")
  }

  test("streaming paragraph dedup: first trigger wins across triggers, == batch op, index fenced") {
    import graft.ops.TextAnalytics
    import graft.store.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val idxDir = Files.createTempDirectory("para_idx").toString
    val tableDir = Files.createTempDirectory("para_table").toString
    val ckpt = Files.createTempDirectory("para_ckpt").toString
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "unique alpha\n\nshared boilerplate"),
      (2L, "shared boilerplate\n\nunique beta"))
    val q1 = Streams.paragraphDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", idxDir, tableDir, ckpt)
    q1.awaitTermination()
    input.addData((3L, "shared boilerplate\n\nunique gamma"))
    val q2 = Streams.paragraphDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", idxDir, tableDir, ckpt)
    q2.awaitTermination()
    val got = SnapshotLog.read(spark, tableDir)
      .select($"sid", $"cleaned_text").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unique alpha\n\nshared boilerplate",
      2L -> "unique beta",
      3L -> "unique gamma"), s"$got")
    // trigger order matched id order, so the streamed result equals
    // the batch op over the full corpus
    val batchTwin = TextAnalytics.dedupParagraphs(
      Seq((1L, "unique alpha\n\nshared boilerplate"),
        (2L, "shared boilerplate\n\nunique beta"),
        (3L, "shared boilerplate\n\nunique gamma")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"sid", $"cleaned_text").as[(Long, String)].collect().toMap
    assert(got == batchTwin)
    // fence: replaying an old batch id must not add this new paragraph
    val before = spark.read.parquet(s"$idxDir/hashes").count()
    TextAnalytics.dedupParagraphsIncremental(spark, idxDir,
      Seq((9L, "brand new paragraph")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 0L)
    assert(spark.read.parquet(s"$idxDir/hashes").count() == before,
      "fenced replay must not grow the index")
  }

  test("cdc snapshot maintenance: one version per trigger, upsert+delete combined, fenced") {
    import graft.store.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("snap_cdc").toString
    val ckpt = Files.createTempDirectory("snap_cdc_ckpt").toString
    SnapshotLog.init((1L to 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .repartition(3, $"doc_id"), dir)
    val input = MemoryStream[(String, Long, String)]
    input.addData(
      ("update", 3L, "UPDATED 3"),
      ("delete", 7L, null),
      ("insert", 11L, "text 11"))
    val q1 = Streams.snapshotCdcStream(
      input.toDF().toDF("op", "doc_id", "text"), dir, Seq("doc_id"), ckpt)
    q1.awaitTermination()
    val afterV = SnapshotLog.currentVersion(dir).get
    val got = SnapshotLog.read(spark, dir).as[(Long, String)].collect().toMap
    val want = ((1L to 10L).filterNot(_ == 7L).map(i => i -> s"text $i").toMap
      + (3L -> "UPDATED 3") + (11L -> "text 11"))
    assert(got == want, s"got ${got.size} rows")
    assert(SnapshotLog.readSnapshotMeta(dir, afterV).rowCount == 10L)
    // pre-CDC snapshot still pinnable
    assert(SnapshotLog.read(spark, dir, Some(0L)).count() == 10L)
    // fence: replaying the same batch id is a no-op
    val v = SnapshotLog.applyCdc(spark,
      Seq(("delete", 1L, null: String)).toDF("op", "doc_id", "text"),
      dir, Seq("doc_id"), batchId = 0L)
    assert(v == afterV && SnapshotLog.read(spark, dir).count() == 10L)
  }

  test("cdc bm25 maintenance: insert/update/delete triggers == rebuild of the evolved corpus") {
    import graft.ops.InvertedIndex
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark join window"),
      (2L, "join join nothing else"),
      (3L, "window words here")).toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("bm25_cdc_idx").toString
    InvertedIndex.write(docs, "doc_id", "text", idxDir, numBuckets = 16)
    val ckpt = Files.createTempDirectory("bm25_cdc_ckpt").toString
    val input = MemoryStream[(String, Long, String, String)]
    // trigger 1: update doc 2 (before-image!), delete doc 3, insert doc 4
    input.addData(
      ("update", 2L, "join join nothing else", "join rewritten body"),
      ("delete", 3L, "window words here", null),
      ("insert", 4L, null, "fresh spark doc"))
    val q1 = Streams.bm25CdcStream(
      input.toDF().toDF("op", "doc_id", "text_before", "text_after"),
      idxDir, "doc_id", ckpt)
    q1.awaitTermination()
    // trigger 2: delete the doc inserted in trigger 1
    input.addData(("delete", 4L, "fresh spark doc", null))
    val q2 = Streams.bm25CdcStream(
      input.toDF().toDF("op", "doc_id", "text_before", "text_after"),
      idxDir, "doc_id", ckpt)
    q2.awaitTermination()
    val finalCorpus = Seq(
      (1L, "spark join window"),
      (2L, "join rewritten body")).toDF("doc_id", "text")
    val rebuilt = Files.createTempDirectory("bm25_cdc_rb").toString
    InvertedIndex.write(finalCorpus, "doc_id", "text", rebuilt, numBuckets = 16)
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .select($"term", $"doc_id", $"dl", $"tf", $"bucket".cast("long"))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .select($"n", $"avgdl", $"num_buckets", $"sum_dl") // fence col aside
      .as[(Double, Double, Int, Long)].head()
    assert(postings(idxDir) == postings(rebuilt))
    assert(stats(idxDir) == stats(rebuilt))
    val a = InvertedIndex.bm25SearchIndexed(spark, idxDir, Seq("join", "spark"), topK = 5)
      .as[(Long, Double)].collect().toSeq
    val b = InvertedIndex.bm25SearchIndexed(spark, rebuilt, Seq("join", "spark"), topK = 5)
      .as[(Long, Double)].collect().toSeq
    assert(a == b, s"scores: $a vs $b")
  }

  test("streaming mini-batch kmeans: hand-derived running means, replay fenced, converges") {
    import graft.ops.MiniBatchKmeans
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft_mbk").resolve("kmeans.json")
    val ckpt = Files.createTempDirectory("graft_mbk_ckpt").toString
    val input = MemoryStream[(Long, Array[Double])]
    // trigger 1: seeds c0=0.0, c1=10.0 (lowest ids); assignment pairs
    // (0.0, 0.2) -> c0 and (10.0, 9.8) -> c1; running means 0.1 / 9.9
    input.addData((1L, Array(0.0)), (2L, Array(10.0)),
      (3L, Array(0.2)), (4L, Array(9.8)))
    val q1 = Streams.kmeansMaintainStream(
      input.toDF().toDF("id", "vec"), "id", "vec", dim = 1, k = 2, state, ckpt)
    q1.awaitTermination()
    val s1 = MiniBatchKmeans.read(state).get
    assert(s1.centroidsMicro == Vector(Vector(100000L), Vector(9900000L)), s"$s1")
    assert(s1.counts == Vector(2L, 2L))

    // trigger 2: one more point near c0 -> c0 = (0.1*2 + 0.4)/3 = 0.2
    input.addData((5L, Array(0.4)))
    val q2 = Streams.kmeansMaintainStream(
      input.toDF().toDF("id", "vec"), "id", "vec", dim = 1, k = 2, state, ckpt)
    q2.awaitTermination()
    val s2 = MiniBatchKmeans.read(state).get
    assert(s2.centroidsMicro == Vector(Vector(200000L), Vector(9900000L)), s"$s2")
    assert(s2.counts == Vector(3L, 2L) && s2.lastBatchId == 1L)

    // replay fence: re-processing an already-applied batch id is a no-op
    MiniBatchKmeans.processBatch(
      Seq((9L, Array(100.0))).toDF("id", "vec"), "id", "vec", 1, 2, state, 0L)
    assert(MiniBatchKmeans.read(state).get == s2, "replay must not mutate state")

    // convergence: a stream of two tight blobs ends with centroids at
    // the blob means regardless of per-trigger slicing
    val state2 = Files.createTempDirectory("graft_mbk2").resolve("kmeans.json")
    val blobs = (1L to 200L).map(i =>
      (i, Array(if (i % 2 == 0) 5.0 + (i % 7) * 0.01 else -5.0 - (i % 5) * 0.01)))
    // seed batch must contain both blobs' neighborhoods: ids 1,2
    blobs.grouped(50).zipWithIndex.foreach { case (chunk, bi) =>
      MiniBatchKmeans.processBatch(chunk.toDF("id", "vec"), "id", "vec", 1, 2,
        state2, bi.toLong)
    }
    val fin = MiniBatchKmeans.read(state2).get
    val cs = fin.centroids.map(_.head).sorted
    assert(math.abs(cs(0) - -5.02) < 0.05 && math.abs(cs(1) - 5.03) < 0.05,
      s"blob centroids off: $cs")
    assert(fin.counts.sum == 200L)
  }

  test("streaming z-order ingest: keyed appends, periodic OPTIMIZE restores disjoint ranges") {
    import graft.ops.ZOrder
    import graft.store.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_zstream").toString
    val ckpt = Files.createTempDirectory("graft_zstream_ckpt").toString
    val dims = Seq(ZOrder.fixedBucket(col("x"), 0.0, 1024.0, 8),
      ZOrder.hashBucket(col("cat"), 8))
    val input = MemoryStream[(Long, Long, String)]
    // two triggers of keyspace-spanning batches, compactEvery=2 →
    // the second trigger compacts after its append
    input.addData((0L until 300L).map(i => (i, (i * 37) % 1000, s"c${i % 5}")): _*)
    val q1 = Streams.zorderAppendStream(
      input.toDF().toDF("id", "x", "cat"), tableDir, dims, 8, ckpt,
      compactEvery = 2)
    q1.awaitTermination()
    input.addData((300L until 600L).map(i => (i, (i * 53) % 1000, s"c${i % 5}")): _*)
    val q2 = Streams.zorderAppendStream(
      input.toDF().toDF("id", "x", "cat"), tableDir, dims, 8, ckpt,
      compactEvery = 2)
    q2.awaitTermination()

    // content: every streamed row present exactly once, zkey matches
    // the batch derivation
    val got = SnapshotLog.read(spark, tableDir)
    assert(got.select("id").as[Long].collect().sorted.toSeq == (0L until 600L))
    val wantKeys = (0L until 600L).map(i =>
      (i, if (i < 300) (i * 37) % 1000 else (i * 53) % 1000, s"c${i % 5}"))
      .toDF("id", "x", "cat").withColumn("zkey", ZOrder.interleave(dims, 8))
      .select("id", "zkey").as[(Long, Long)].collect().toMap
    got.select("id", "zkey").as[(Long, Long)].collect().foreach { case (id, z) =>
      assert(z == wantKeys(id), s"zkey mismatch for $id")
    }

    // layout: the trailing OPTIMIZE left pairwise-disjoint z-ranges
    val v = SnapshotLog.currentVersion(tableDir).get
    val snap = SnapshotLog.readSnapshotMeta(tableDir, v)
    assert(snap.op.startsWith("optimize-zorder"),
      s"last commit must be the OPTIMIZE, got ${snap.op}")
    val zr = snap.files.flatMap(f => SnapshotLog.fileStats(tableDir, f)
      .flatMap(_.get("zkey")).map(cs => (cs.min.toLong, cs.max.toLong)))
      .sortBy(_._1)
    assert(zr.size == snap.files.size)
    zr.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin, s"overlap: $zr")
      case _ =>
    }
  }

  test("streaming snapshot append: versions per trigger, replay fenced, reads pin versions") {
    import graft.store.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_snapstream").toString
    val ckpt = Files.createTempDirectory("graft_snapstream_ckpt").toString
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "a"), (2L, "b"))
    val q1 = Streams.snapshotAppendStream(
      input.toDF().toDF("doc_id", "text"), tableDir, ckpt)
    q1.awaitTermination()
    assert(SnapshotLog.read(spark, tableDir).count() == 2L)
    val vAfterFirst = SnapshotLog.currentVersion(tableDir).get

    input.addData((3L, "c"))
    val q2 = Streams.snapshotAppendStream(
      input.toDF().toDF("doc_id", "text"), tableDir, ckpt)
    q2.awaitTermination()
    assert(SnapshotLog.read(spark, tableDir).count() == 3L)
    // the first trigger's snapshot is still pinnable mid-ingest
    assert(SnapshotLog.read(spark, tableDir, Some(vAfterFirst)).count() == 2L)

    // replay fence: re-delivering an already-committed batch id is a
    // no-op (foreachBatch is at-least-once; the log stays exactly-once)
    val fence = SnapshotLog.maxStreamBatchId(tableDir)
    val cur = SnapshotLog.currentVersion(tableDir).get
    val replayed = Seq((9L, "dup")).toDF("doc_id", "text")
    assert(SnapshotLog.appendIdempotent(replayed, tableDir, fence) == cur)
    assert(SnapshotLog.read(spark, tableDir).count() == 3L, "replay must not double-append")
    // a genuinely new batch id commits
    assert(SnapshotLog.appendIdempotent(replayed, tableDir, fence + 1) == cur + 1)
    assert(SnapshotLog.read(spark, tableDir).count() == 4L)
  }
}
