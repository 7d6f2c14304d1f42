package graft.tools

import graft.functions.VectorFunctions
import graft.ops.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: vector-search operators at 1000x the bench corpus (2M
  * synthetic 64-dim unit vectors built from range() — no files), to
  * validate the scan paths scale linearly and the bounded-shuffle
  * claims hold. Not part of the driver gates; results recorded in
  * BASELINE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    // optional 2nd arg gates one section
    // ("ann" | "dedup" | "events" | "r6ops" | "r7ops" | "r7b" | "r7c" | "unigram" | "ac" | "profile" | "graph" | "bq" | "zorder" | "r8ops"); default runs all —
    // single sections keep re-runs cheap and avoid cross-section
    // memory pressure when iterating on one probe
    val sec = args.drop(1).headOption.getOrElse("all")
    def on(s: String): Boolean = sec == "all" || sec == s
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val comps = (0 until dim).map(d =>
      (xxhash64(lit(d), col("id")).cast("double") / lit(Long.MaxValue.toDouble)).cast("float"))
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        VectorFunctions.l2Normalize(array(comps: _*)).as("embedding"))
      .repartition(32)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (on("ann") || on("dedup") || on("r6ops") || on("r7ops") || on("r7b") || on("bq") || on("r8ops")) {
      val t0 = System.nanoTime()
      vecs.count()
      println(f"[probe] materialize $n%d x $dim vectors: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def time(label: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%7.2f s")
    }

    val q = Array.tabulate(dim)(d => math.sin(d + 1.0))
    if (on("ann")) {
    time("brute-force top-10 (exact scan)") {
      SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10).collect()
    }
    time("brute-force top-10 (2nd run, warm)") {
      SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10).collect()
    }
    time("lsh top-10 (8 planes, probe<=1)") {
      SimilaritySearch.lshTopK(vecs, "vec_id", "embedding", dim, q, 10).collect()
    }
    // ANN recall@10 vs exact at 2M vectors, 20 corpus vectors as
    // queries, in BOTH data regimes: uniform-random vectors (the WORST
    // case for ANN — true neighbors are barely more aligned than
    // chance, so sign buckets carry little signal) and a 64-center
    // clustered corpus (the regime real embedding corpora live in —
    // neighbors share a center, so bucket structure aligns with true
    // neighborhoods). Exact ground truth comes from ONE heap-agg batch
    // pass per corpus.
    def recallSuite(tag: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val recallQs = corpus.filter(col("vec_id").between(100, 119))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val exactTop = SimilaritySearch.bruteForceTopKBatchAgg(
          corpus, "vec_id", "embedding", recallQs, "query_id", "qv", 10)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val qvecs = recallQs.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      def recall10(label: String)(approx: Array[Double] => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val rs = qvecs.map { case (qid, qv) =>
          val got = approx(qv).select("vec_id").collect().map(_.getLong(0)).toSet
          (got & exactTop(qid)).size / 10.0
        }
        println(f"[probe] recall@10 $label%-38s mean=${rs.sum / rs.length}%.3f " +
          f"min=${rs.min}%.2f  (${(System.nanoTime() - t0) / 1e9}%.1f s / 20 queries)")
      }
      for (ph <- Seq(1, 2, 3))
        recall10(s"$tag lsh 8 planes probe<=$ph") (qv =>
          SimilaritySearch.lshTopK(corpus, "vec_id", "embedding", dim, qv, 10,
            numPlanes = 8, probeHamming = ph))
      val ivfDir = java.nio.file.Files.createTempDirectory(s"graft-ivf-$tag").toString
      time(s"$tag ivf write (6 planes, bucket-partitioned)") {
        SimilaritySearch.ivfWrite(corpus, ivfDir, "embedding", dim, numPlanes = 6)
      }
      for (np <- Seq(4, 8, 16, 32))
        recall10(s"$tag ivf 64 buckets nProbe=$np") (qv =>
          SimilaritySearch.ivfTopKStored(spark, ivfDir, "vec_id", "embedding", qv, 10, np))
    }
    recallSuite("uniform", vecs)
    // clustered corpus: 64 deterministic unit centers; each vector is
    // its id-hashed center plus ~15% noise, renormalized (cosine to
    // own center ≈ 0.97, cross-center ≈ chance)
    val centerComps = (0 until dim).map(d =>
      (xxhash64(lit(d + 7919), pmod(xxhash64(col("id")), lit(64)))
        .cast("double") / lit(Long.MaxValue.toDouble)).cast("float"))
    val noiseComps = (0 until dim).map(d =>
      (xxhash64(lit(d), col("id")).cast("double") / lit(Long.MaxValue.toDouble))
        .cast("float") * lit(0.15f))
    val vecsC = spark.range(n).select(col("id").as("vec_id"),
        VectorFunctions.l2Normalize(array(
          centerComps.zip(noiseComps).map { case (c, nz) => c + nz }: _*)).as("embedding"))
      .repartition(32)
      .persist(StorageLevel.MEMORY_AND_DISK)
    vecsC.count()
    recallSuite("clustered", vecsC)
    vecsC.unpersist()

    // Embedding near-dup at 2M vectors: the all-pairs form is C(2M,2) =
    // 2e12 cosine evaluations — infeasible at any setting; the banded
    // sign-LSH path runs it as (band,key) equi-joins. 1000 planted
    // near-clones (cosine ~0.99998) are the recall target.
    val clones = vecs.filter(col("vec_id") < 1000)
      .select((col("vec_id") + lit(n)).as("vec_id"),
        VectorFunctions.l2Normalize(expr(
          "transform(embedding, (x, i) -> x + CASE WHEN i = 0 THEN CAST(0.01 AS FLOAT) ELSE CAST(0 AS FLOAT) END)"))
          .as("embedding"))
    val withClones = vecs.unionByName(clones).persist(StorageLevel.MEMORY_AND_DISK)
    withClones.count()
    time("near-dup bucketed (48 planes, 16-bit bands)") {
      println("[probe]   pairs=" + graft.ops.Dedup.embeddingNearDupsBucketed(
        withClones, "vec_id", "embedding", threshold = 0.95,
        numPlanes = 48, bandBits = 16, maxBucket = 4096).count())
    }
    withClones.unpersist()

    val queries = vecs.filter(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    time("batch 32-query top-10, window") {
      SimilaritySearch.bruteForceTopKBatchWindow(vecs, "vec_id", "embedding",
        queries, "query_id", "qv", 10).count()
    }
    time("batch 32-query top-10, heap agg") {
      SimilaritySearch.bruteForceTopKBatchAgg(vecs, "vec_id", "embedding",
        queries, "query_id", "qv", 10).count()
    }
    }

    if (on("dedup")) {
    // Dedup family at 10x the sf0.1 corpus: 50k docs = the 5k corpus
    // replicated 10x with distinct ids — every doc has 9 planted exact
    // replicas, so candidate/verify volume is ~45x the bench load
    // (225k+ true pairs) and hot shingles stress the df cap.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docs10 = (0 until 10).map(r =>
        base.select((col("doc_id") + lit(r * 1000000)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] dedup corpus: ${docs10.count()} docs")
    time("jaccard pairs (n=8, thr=0.5, cap=64)") {
      println("[probe]   pairs=" + graft.ops.Dedup.jaccardPairs(
        docs10, "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 64, minShared = 2).count())
    }
    // the cap is a FRACTION of the corpus, not a constant: 64/5k = 1.3%
    // of docs; at 50k docs the same fraction is 640. A fixed cap loses
    // recall under corpus growth (shingle df scales with corpus).
    time("jaccard pairs (cap=640 = same corpus fraction)") {
      println("[probe]   pairs=" + graft.ops.Dedup.jaccardPairs(
        docs10, "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 640, minShared = 2).count())
    }
    // The scalable shape for replica-heavy corpora: the dedup LADDER —
    // exact dedup first collapses duplicate groups (0.6s), then
    // near-dup jaccard runs on survivors at the base-corpus cost; the
    // dropped replicas inherit their survivor's pair set by transitivity.
    time("ladder: exact survivors -> jaccard") {
      val survivors = graft.ops.Dedup.exact(docs10, "doc_id", "text")
        .select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
      println("[probe]   survivors=" + survivors.count())
      println("[probe]   pairs=" + graft.ops.Dedup.jaccardPairs(
        survivors, "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 64, minShared = 2).count())
      survivors.unpersist()
    }
    time("minhash LSH candidates (16x4)") {
      println("[probe]   pairs=" + graft.ops.Dedup.minhashLshCandidates(
        docs10, "doc_id", "text", n = 8, numHashes = 16, rowsPerBand = 4).count())
    }
    time("simhash pairs (<=3 bits)") {
      println("[probe]   pairs=" + graft.ops.Dedup.simhashNearDups(
        docs10, "doc_id", "text", n = 8, maxHammingDistance = 3).count())
    }
    time("exact dedup survivors") {
      println("[probe]   rows=" + graft.ops.Dedup.exact(docs10, "doc_id", "text").count())
    }
    // Exact-substring span family at 10x: replicas make EVERY gram of a
    // replicated doc duplicated, so this is the worst-case span volume
    // (each non-keeper doc is one full-width span; drop-position
    // explode is maximal).
    time("duplicated spans (n=5)") {
      println("[probe]   spans=" + graft.ops.Dedup.duplicatedSpans(
        docs10, "doc_id", "text", n = 5).count())
    }
    time("span removal (n=5)") {
      val r = graft.ops.Dedup.removeDuplicatedSpans(docs10, "doc_id", "text", n = 5)
      println("[probe]   dropped_words=" + r.agg(sum(col("n_dropped"))).head().getLong(0))
    }
    // Transitive clustering over the replica-corpus pair graph: with 10
    // exact replicas per doc plus jaccard near-dups the components are
    // dense — both execution paths must agree and the distributed
    // label-propagation path must converge in a few rounds.
    val probePairs = graft.ops.Dedup.jaccardPairs(
      docs10, "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 640, minShared = 2)
    println(s"[probe] cluster input pairs=${probePairs.count()}")
    var localClusters = 0L
    time("clusters: driver union-find path") {
      val c = graft.ops.Dedup.dedupClusters(probePairs)
      localClusters = c.select("cluster").distinct().count()
      println(s"[probe]   clusters=$localClusters")
      c.unpersist()
    }
    time("clusters: distributed propagation path") {
      val c = graft.ops.Dedup.dedupClusters(probePairs, maxLocalPairs = 0)
      println(s"[probe]   clusters=${c.select("cluster").distinct().count()}" +
        s" (match=${c.select("cluster").distinct().count() == localClusters})")
      c.unpersist()
    }
    probePairs.unpersist()
    // Inverted-index amortization at 10x corpus: one build pass, then
    // per-query cost is the terms' posting buckets only — vs the scan
    // path's two full corpus passes PER query.
    val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-idx").toString
    time("inverted index build (50k docs)") {
      graft.ops.InvertedIndex.write(docs10, "doc_id", "text", idxDir)
    }
    time("bm25 x 5 queries, indexed") {
      Seq("spark", "join", "window", "hash", "stream").foreach { t =>
        graft.ops.InvertedIndex.bm25SearchIndexed(spark, idxDir, Seq(t)).count()
      }
    }
    time("bm25 x 5 queries, corpus scan") {
      Seq("spark", "join", "window", "hash", "stream").foreach { t =>
        graft.ops.TextAnalytics.bm25Search(docs10, "doc_id", "text", Seq(t)).count()
      }
    }
    // Decontamination at 10x: every 100th doc is the "benchmark"; the
    // corpus side is one explode + broadcast semi-join + count.
    time("decontaminate 50k docs vs 500-doc benchmark") {
      println("[probe]   flagged=" + graft.ops.Dedup.decontaminate(
        docs10.filter(col("doc_id") % 100 =!= 0), "doc_id", "text",
        docs10.filter(col("doc_id") % 100 === 0), "doc_id", "text", n = 5).count())
    }
    // K-means at the full vector corpus: each iteration is one
    // broadcast of k x dim doubles + one partial-aggregating shuffle,
    // so wall time should be ~iters x a scan, independent of k.
    time("kmeans k=8 x 2 iters (full corpus)") {
      val a = graft.ops.Clustering.kmeans(vecs, "vec_id", "embedding", dim,
        k = 8, iters = 2)
      println("[probe]   clusters=" + a.select("cluster").distinct().count())
    }
    }

    if (on("events")) {
    // Temporal/event ops at 10M events over 500k users: the interval
    // join must stay linear (bucketed equi-join — a theta join here
    // would be ~20 rows x 20 rows per user before filtering), the
    // funnel is three keyed partial aggregations, keep-latest one.
    val nEv = 10000000L
    val ev = spark.range(nEv).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id")), lit(500000L)).as("user_id"),
        (pmod(xxhash64(col("id"), lit(1)), lit(86400L * 30)) * 1000000000L).as("ts"),
        element_at(array(lit("signup"), lit("view"), lit("purchase"), lit("click")),
          (pmod(xxhash64(col("id"), lit(2)), lit(4)) + 1).cast("int")).as("event_type"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] events=${ev.count()}")
    time("interval join: purchase wins x views (10M ev)") {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"),
          (col("ts") + 1800L * 1000000000L).as("p_end"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
      println("[probe]   pairs=" + graft.ops.TemporalJoins.pointInIntervalJoin(
        p, v, "user_id", "p_ts", "p_end", "v_ts", grain = 1800L * 1000000000L).count())
    }
    time("funnel 3 steps (10M ev, 500k users)") {
      println("[probe]   " + graft.ops.EventAnalytics.funnelCounts(ev,
          "user_id", "event_type", "ts", Seq("signup", "view", "purchase"))
        .collect().map(r => s"${r.get(1)}=${r.getLong(2)}").mkString(" "))
    }
    time("keep-latest per user (10M ev)") {
      println("[probe]   users=" + graft.ops.Upsert.keepLatest(ev,
        Seq("user_id"), Seq("ts", "event_id")).count())
    }
    ev.unpersist()
    // Long funnel: 8 steps over 10M events. The funnel chains one
    // groupBy(user).min(ts) per step, so the probe confirms wall time
    // grows ~linearly in step count (not quadratically) and that AQE
    // broadcasts the monotonically-shrinking later step frames.
    val steps8 = (0 until 8).map(i => s"s$i")
    val ev8 = spark.range(nEv).select(
        pmod(xxhash64(col("id")), lit(500000L)).as("user_id"),
        (pmod(xxhash64(col("id"), lit(1)), lit(86400L * 30)) * 1000000000L).as("ts"),
        concat(lit("s"), pmod(xxhash64(col("id"), lit(3)), lit(8))).as("event_type"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] events(8-type)=${ev8.count()}")
    for (k <- Seq(3, 8)) time(s"funnel $k steps (10M ev, 500k users)") {
      println("[probe]   " + graft.ops.EventAnalytics.funnelCounts(ev8,
          "user_id", "event_type", "ts", steps8.take(k))
        .orderBy("step_idx")
        .collect().map(r => s"${r.get(1)}=${r.getLong(2)}").mkString(" "))
    }
    for (k <- Seq(3, 8)) time(s"funnelAgg $k steps (single-shuffle)") {
      println("[probe]   " + graft.ops.EventAnalytics.funnelCountsAgg(ev8,
          "user_id", "event_type", "ts", steps8.take(k))
        .orderBy("step_idx")
        .collect().map(r => s"${r.get(1)}=${r.getLong(2)}").mkString(" "))
    }
    ev8.unpersist()
    }

    if (on("r6ops")) {
    // Round-6 batch ops at probe scale: 2M labeled vectors, 10M
    // events, 50k docs — confirms the documented shapes (two-stage
    // outlier prune, windowless attribution, path window, broadcast
    // PMI joins) hold where the small-SF bench can't stress them.
    val labeled = vecs.withColumn("label", pmod(xxhash64(col("vec_id")), lit(10)).cast("int"))
    time("centroid outliers 2M vecs, 10 labels, k=5") {
      println("[probe]   rows=" + graft.ops.Clustering.centroidOutliers(
        labeled, "vec_id", "embedding", "label", dim = dim, k = 5).count())
    }
    val nEv2 = 10000000L
    val ev2 = spark.range(nEv2).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id")), lit(500000L)).as("user_id"),
        (pmod(xxhash64(col("id"), lit(1)), lit(86400L * 30)) * 1000000L).as("ts"),
        element_at(array(lit("signup"), lit("view"), lit("purchase"), lit("click")),
          (pmod(xxhash64(col("id"), lit(2)), lit(4)) + 1).cast("int")).as("event_type"),
        (pmod(xxhash64(col("id"), lit(4)), lit(50000L)).cast("double") / 100.0).as("value"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] events=${ev2.count()} (µs ts)")
    time("first-touch attribution (10M ev, 500k users)") {
      println("[probe]   " + graft.ops.EventAnalytics.firstTouchAttribution(
          ev2, "user_id", "event_type", "ts", "event_id", "purchase")
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))
    }
    time("time-decayed value (10M ev, 500k users)") {
      println("[probe]   users=" + graft.ops.EventAnalytics.timeDecayedValue(
        ev2, "user_id", "ts", "value", halfLifeUnits = 7L * 86400000000L).count())
    }
    time("event paths n=3 top-20 (10M ev)") {
      println("[probe]   paths=" + graft.ops.EventAnalytics.eventPaths(
        ev2, "user_id", "event_type", "ts", "event_id", n = 3, k = 20).count())
    }
    ev2.unpersist()
    val sfDir2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base2 = spark.read.parquet(s"$sfDir2/documents.parquet").select("doc_id", "text")
    val docs10b = (0 until 10).map(r =>
        base2.select((col("doc_id") + lit(r * 1000000)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] doc corpus=${docs10b.count()}")
    time("pmi collocations (50k docs)") {
      println("[probe]   rows=" + graft.ops.TextAnalytics.pmiCollocations(
        docs10b, "text", minCount = 5, k = 50).count())
    }
    time("bpe pair stats (50k docs)") {
      println("[probe]   rows=" + graft.ops.TextAnalytics.bpePairStats(
        docs10b, "text", k = 30).count())
    }
    time("decontaminate overlap (50k docs vs 500-doc bench)") {
      println("[probe]   rows=" + graft.ops.Dedup.decontaminateOverlap(
        docs10b.filter(col("doc_id") % 100 =!= 0), "doc_id", "text",
        docs10b.filter(col("doc_id") % 100 === 0), "doc_id", "text", n = 5).count())
    }
    // Incremental dedup amortization: the index is built ONCE at ingest
    // (a cost the full re-run pays every time in shingle recompute);
    // each subsequent 500-doc batch then dedups against 49.5k stored
    // docs in batch-sized work vs a full-corpus jaccard re-run.
    val storedP = docs10b.filter(col("doc_id") % 100 =!= 7)
    val batchP = docs10b.filter(col("doc_id") % 100 === 7)
    val incIdx = java.nio.file.Files.createTempDirectory("graft-probe-sidx").toString
    time("shingle index build (49.5k stored docs, once)") {
      graft.ops.Dedup.writeShingleIndex(storedP, "doc_id", "text", 8, incIdx)
    }
    time("incremental batch dedup (500 new vs 49.5k stored)") {
      println("[probe]   pairs=" + graft.ops.Dedup.incrementalJaccardPairs(
        spark, incIdx, batchP, "doc_id", "text",
        n = 8, threshold = 0.5, maxDocFreq = 640, minShared = 2).count())
    }
    time("full-corpus jaccard re-run (the alternative)") {
      println("[probe]   pairs=" + graft.ops.Dedup.jaccardPairs(
        docs10b, "doc_id", "text",
        n = 8, threshold = 0.5, maxDocFreq = 640, minShared = 2).count())
    }
    docs10b.unpersist()
    }

    if (on("r7ops")) {
    // Round-7 ops at probe scale: truncated-dim ranking arithmetic on
    // 2M vectors, and the two-stage token-budget cumsum on 50k docs.
    vecs.count() // materialize outside the timed probes
    val q7 = vecs.filter(col("vec_id") === 100L)
      .head().getSeq[Float](1).toArray.map(_.toDouble)
    time("brute-force exact top-10 (2M, full 64 dims)") {
      println("[probe]   rows=" + SimilaritySearch.bruteForceTopK(
        vecs, "vec_id", "embedding", q7, 10).count())
    }
    for (dp <- Seq(16, 8)) time(s"matryoshka prefix-$dp top-10 (2M, cand=2000)") {
      println("[probe]   rows=" + SimilaritySearch.matryoshkaTopK(
        vecs, "vec_id", "embedding", q7, 10, dPrefix = dp, candidates = 2000).count())
    }
    val sfDir7 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base7 = spark.read.parquet(s"$sfDir7/documents.parquet")
      .select("doc_id", "text", "lang")
    val docs7 = (0 until 10).map(r =>
        base7.select((col("doc_id") + lit(r * 1000000)).as("doc_id"),
          col("text"), col("lang")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] doc corpus=${docs7.count()}")
    time("token budget sample (50k docs, 1M tokens/lang, 64 shards)") {
      println("[probe]   kept=" + graft.ops.TextAnalytics.tokenBudgetSample(
        docs7, "doc_id", "text", "lang", budget = 1000000L, shards = 64).count())
    }
    time("token budget sample, single window (the reducer-bound twin)") {
      println("[probe]   kept=" + graft.ops.TextAnalytics.tokenBudgetSample(
        docs7, "doc_id", "text", "lang", budget = 1000000L, shards = 1).count())
    }
    docs7.unpersist()
    // the regime the two-stage shape exists for: ONE 5M-row stratum —
    // a single cumsum window funnels the whole corpus through one
    // reducer's sort; the sharded plan's stage 1 splits it 64 ways and
    // stage 2 sees only ~budget tokens per shard
    val one7 = spark.range(5000000L).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(_ => lit("w")): _*).as("text"),
        lit("en").as("lang"))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] single-stratum corpus=${one7.count()}")
    for (sh <- Seq(64, 1)) time(s"token budget, 1 stratum x 5M docs, shards=$sh") {
      println("[probe]   kept=" + graft.ops.TextAnalytics.tokenBudgetSample(
        one7, "doc_id", "text", "lang", budget = 1000000L, shards = sh).count())
    }
    one7.unpersist()
    }
    if (on("r7b")) {
    // Round-7 batch-2 ops at probe scale.
    //
    // Misra-Gries vs exact, 20M tokens over a 3M-word cold vocabulary
    // with a 10-word hot head (30% of the stream): the exact plan
    // shuffles 3M distinct keys; MG ships one <=k-entry buffer per
    // partition. The gap grows with the vocabulary, not the corpus.
    val toks = spark.range(20000000L).select(
        when(pmod(col("id"), lit(10)) < 3,
          concat(lit("hot"), pmod(col("id"), lit(10))))
          .otherwise(concat(lit("w"), pmod(col("id"), lit(3000000)))).as("w"))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] token stream=${toks.count()}")
    time("misra-gries k=256 over 20M tokens") {
      println("[probe]   counters=" + toks
        .agg(graft.functions.MgFunctions.misraGries(col("w"), 256).as("mg"))
        .select(explode(col("mg"))).count())
    }
    time("exact groupBy top-256 (the shuffle-everything twin)") {
      toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(256).collect()
    }
    toks.unpersist()
    // DSIR at 10x the bench corpus (50k docs): three word-level map
    // passes + one per-doc sum; the bucket model stays 1024 rows no
    // matter the corpus.
    val sfDirB = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val baseB = spark.read.parquet(s"$sfDirB/documents.parquet")
      .select("doc_id", "text", "lang")
    val docsB = (0 until 10).map(r =>
        baseB.select((col("doc_id") + lit(r * 1000000)).as("doc_id"),
          col("text"), col("lang")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] doc corpus=${docsB.count()}")
    time("dsir weights (50k docs, B=1024)") {
      println("[probe]   scored=" + graft.ops.TextAnalytics.dsirWeights(
        docsB, docsB.filter(col("lang") === "en"), "doc_id", "text", 1024).count())
    }
    time("dsir gumbel resample top-1000") {
      println("[probe]   kept=" + graft.ops.TextAnalytics.dsirResample(
        docsB, docsB.filter(col("lang") === "en"), "doc_id", "text", 1000, 1024).count())
    }
    docsB.unpersist()
    // hard negatives on the 2M-vector corpus, 50 anchors: the
    // heap-agg plan's exchange carries 50*k rows per partition.
    val labeled = vecs.withColumn("label", pmod(col("vec_id"), lit(16)))
    time("hard negatives 2M x 50 anchors k=5") {
      println("[probe]   rows=" + graft.ops.SimilaritySearch.hardNegatives(
        labeled, "vec_id", "embedding", "label",
        labeled.filter(col("vec_id") < 50), "vec_id", "embedding", "label", 5).count())
    }
    // the capstone pipeline at 10x bench (50k docs): quality -> exact dedup ->
    // decontaminate -> split. The replicated corpus is the dedup
    // worst case (each doc has 9 planted replicas) — the sha window
    // carries it, the rest is map-only / broadcast.
    val pipeDocs = (0 until 10).map(r =>
        baseB.select((col("doc_id") + lit(r * 1000000)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] pipeline corpus=${pipeDocs.count()}")
    time("pipeline: quality->dedup->decontaminate->split (50k docs)") {
      val bench = pipeDocs.filter(col("doc_id") % 10 === 0)
      val pool = pipeDocs.filter(col("doc_id") % 10 =!= 0)
      val q = graft.ops.TextAnalytics.qualityFilter(pool, "text")
        .filter(col("passes_quality")).select(col("doc_id"), col("text"))
      val ex = graft.ops.Dedup.exact(q, "doc_id", "text")
      val flagged = graft.ops.Dedup.decontaminate(ex, "doc_id", "text",
        bench, "doc_id", "text", n = 5).select(col("sid").as("doc_id"))
      val clean = ex.join(broadcast(flagged), Seq("doc_id"), "left_anti")
      println("[probe]   kept=" + graft.ops.TextAnalytics
        .hashSplit(clean, "doc_id").count())
    }
    pipeDocs.unpersist()
    }
    if (on("graph")) {
    // PageRank at probe scale: (a) the REAL near-dup pair graph of the
    // 10x replica corpus (the graph a curation pass actually ranks),
    // (b) a synthetic 10M-arc power-iteration to isolate per-round
    // join+agg cost on a graph too big for any driver-side shortcut.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val baseG = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docsG = (0 until 10).map(r =>
        baseG.select((col("doc_id") + lit(r * 1000000)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] graph corpus=${docsG.count()} docs")
    val pairsG = graft.ops.Dedup.jaccardPairs(
      docsG, "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 640, minShared = 2)
    println(s"[probe] near-dup pair graph edges=${pairsG.count()}")
    time("pagerank 5 iters, near-dup graph") {
      val r = graft.ops.GraphOps.pageRankUndirected(pairsG, iters = 5)
      println("[probe]   nodes=" + r.count())
      r.unpersist()
    }
    pairsG.unpersist()
    docsG.unpersist()
    // Synthetic scale-free-ish directed graph: 10M arcs over 1M nodes,
    // hub-skewed dst (xxhash mod with quadratic skew) — per-iteration
    // cost is one edges⋈ranks shuffle + one dst groupBy; 5 rounds.
    val m = 10000000L
    val arcs = spark.range(m).select(
        pmod(xxhash64(lit(1), col("id")), lit(1000000L)).as("src"),
        pmod(pmod(xxhash64(lit(2), col("id")), lit(1000L)) *
          pmod(xxhash64(lit(3), col("id")), lit(1000L)), lit(1000000L)).as("dst"))
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] synthetic arcs=${arcs.count()}")
    time("pagerank 5 iters, 10M arcs / 1M nodes") {
      val r = graft.ops.GraphOps.pageRankMicro(arcs, "src", "dst", iters = 5)
      println("[probe]   nodes=" + r.count())
      r.unpersist()
    }
    arcs.unpersist()
    }
    if (on("r7c")) {
      // KLL quantile sketch at 50M FULLY-DISTINCT doubles (the regime
      // that punishes the exact competitors: Spark's exact `percentile`
      // is a value→count map aggregate — cheap when distincts are few,
      // O(distinct) state when every value differs; percentile_approx
      // is the built-in GK baseline). The sketch ships ONE
      // <= k·log(n/k)-item buffer per partition regardless.
      val vals = spark.range(50000000L)
        .select((xxhash64(col("id")).cast("double") / lit(Long.MaxValue.toDouble)).as("x"))
        .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] values=${vals.count()} (all distinct)")
      def time2(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      for (k <- Seq(256, 1024)) time2(s"quantile_sketch k=$k over 50M") {
        val r = vals.agg(graft.functions.QsFunctions.quantileSketch(col("x"), k).as("qs"))
          .select(col("qs.n"), col("qs.err_bound")).head()
        println(s"[probe]   n=${r.getLong(0)} errBound=${r.getLong(1)} " +
          f"(eps=${r.getLong(1).toDouble / r.getLong(0)}%.5f)")
      }
      time2("percentile_approx(9 deciles) — Spark's GK baseline") {
        vals.agg(expr("percentile_approx(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")).head()
      }
      time2("exact percentile (value-counts aggregate, O(distinct) state)") {
        vals.agg(expr("percentile(x, array(0.1,0.5,0.9))")).head()
      }
      vals.unpersist()
    }
    if (on("unigram")) {
      // Unigram-LM training at a REAL vocabulary scale: 300k distinct
      // syllable-composed words under a zipf-ish count law (the bench
      // corpus has a ~50-word vocab — useless for this probe). The
      // claim under test: seed + EM cost is driven by DISTINCT words
      // (and the driver model stays seedSize + alphabet), not corpus
      // token count, because the E-step maps the distinct-word table.
      val syl = Array("ba", "ko", "ri", "ta", "mu", "ze", "lan", "dor",
        "vi", "qua", "pex", "shi", "tro", "gul", "nem", "yar")
      val wordsDf = spark.range(300000L).select(
        concat_ws("",
          element_at(lit(syl), (pmod(xxhash64(col("id"), lit(1)), lit(16)) + 1).cast("int")),
          element_at(lit(syl), (pmod(xxhash64(col("id"), lit(2)), lit(16)) + 1).cast("int")),
          element_at(lit(syl), (pmod(xxhash64(col("id"), lit(3)), lit(16)) + 1).cast("int")))
          .as("w"),
        (lit(1000000L) / (col("id") + 1) + 1).as("cnt")) // zipf-ish
      // pack words into synthetic docs so train() sees raw text; each
      // "doc" row is one word repeated cnt-weight times is infeasible —
      // instead weight via repetition of the word row itself in text
      val docs = wordsDf.select(concat_ws(" ", col("w"),
        when(col("cnt") > 100, col("w")).otherwise(lit(""))).as("text"))
        .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] unigram docs=${docs.count()} (300k distinct 4-6-char words)")
      def time3(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time3("unigram seed (substring rollup over 300k distinct words)") {
        println("[probe]   seed rows=" + graft.ops.UnigramLm
          .seedVocab(docs, "text", seedSize = 2048, maxTokenLen = 6).count())
      }
      time3("unigram train vocabSize=4096, 2 EM rounds + final recount") {
        val v = graft.ops.UnigramLm.train(docs, "text", vocabSize = 4096,
          iters = 2, seedSize = 4096, maxTokenLen = 6)
        println("[probe]   vocab rows=" + v.count())
      }
      docs.unpersist()
    }
    if (on("ac")) {
      // Aho–Corasick vs per-term plans as the pattern list grows. The
      // claim: AC walk time is O(len) per row — FLAT in P — while the
      // per-term filter chain (blocklistScore) is O(len·P) and its
      // generated code outgrows Janino's 64 KB method limit in the
      // hundreds of terms. 1M docs × ~60 chars; realistic pattern mix
      // of corpus words + junk terms that never match.
      val syl2 = Array("data", "scan", "merge", "table", "spark", "fast",
        "slow", "join", "sort", "hash", "row", "value", "key", "line")
      val docs2 = spark.range(1000000L).select(concat_ws(" ", (0 until 10).map(k =>
          element_at(lit(syl2), (pmod(xxhash64(col("id"), lit(k)), lit(14)) + 1).cast("int"))): _*)
        .as("text")).repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] ac docs=${docs2.count()}")
      def time4(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      def patList(p: Int): Seq[String] = {
        val rnd = new scala.util.Random(7)
        val real = for (a <- syl2; b <- syl2) yield s"$a $b" // 196 two-word phrases
        val junk = (1 to p).map(_ => (1 to 8).map(_ =>
          ('a' + rnd.nextInt(26)).toChar).mkString)
        (real ++ junk).distinct.take(p)
      }
      for (p <- Seq(64, 512, 4096)) {
        val pats = patList(p)
        time4(s"ac multi_match_total P=$p (flat-in-P claim)") {
          println("[probe]   hits=" + docs2.select(
            graft.functions.MultiMatchFunctions.multiMatchTotal(col("text"), pats).as("h"))
            .agg(sum(col("h"))).head().getLong(0))
        }
      }
      for (p <- Seq(64, 512)) { // per-term chain: already impractical at 512
        val pats = patList(p).map(_.replace(" ", "")) // single tokens for the token matcher
        time4(s"per-term filter chain P=$p (O(len*P) baseline)") {
          // at P=512 the reduce(_+_) sum is a 512-deep expression tree
          // and Catalyst's recursive transforms overflow the stack —
          // the per-term plan cannot even be PLANNED at list sizes AC
          // handles flat; record that instead of dying
          try println("[probe]   hits=" + graft.ops.TextAnalytics.blocklistScore(
              docs2, "text", "text", terms = pats)
              .agg(sum(col("n_hits"))).head().getLong(0))
          catch { case _: StackOverflowError =>
            println(s"[probe]   UNPLANNABLE: StackOverflowError in Catalyst at P=$p") }
        }
      }
      docs2.unpersist()
    }
    if (on("profile")) {
      // Deequ-style profile: exact multi-distinct pays Spark's expand
      // (one duplicated pass per distinct column); the HLL switch is
      // the 100 TB path. Measured on the sf0.1 orders table.
      val o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] profile orders rows=${o.count()}")
      val cols = Seq("o_custkey", "o_totalprice", "o_orderpriority")
      def time5(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time5("profile exactDistinct=true (expand plan)") {
        graft.ops.DataProfile.profile(o, cols, exactDistinct = true).collect()
      }
      time5("profile exactDistinct=false (HLL, single agg)") {
        graft.ops.DataProfile.profile(o, cols, exactDistinct = false).collect()
      }
      o.unpersist()
    }
    if (on("bq")) {
      // Compression-ladder stage-1 scan cost at 2M x 64 dims: exact
      // float cosine scan vs int8-reconstruction scan vs packed sign
      // bits + hamming. The bq scan touches 8 bytes/vector (vs 256
      // float, 64 int8) AND its distance is xor+popcount — both the IO
      // and the ALU story. Candidates sized to the tie-set coupling
      // documented on binaryTopK.
      val q2 = Array.tabulate(dim)(d => math.sin(d + 1.0))
      time("bq: exact float top-10 scan") {
        SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q2, 10).collect()
      }
      time("bq: int8 two-stage (cand=500)") {
        graft.ops.Quantization.quantizedTopK(
          vecs, "vec_id", "embedding", q2, 10, candidates = 500).collect()
      }
      // pre-encoded sign codes (the stored-sidecar scan shape)
      val codes = vecs.select(col("vec_id"),
          graft.ops.Quantization.signBitsColumn(col("embedding"), dim).as("bv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val qb = graft.ops.Quantization.packSignBits(q2)
      time("bq: hamming pre-rank over stored codes") {
        codes.withColumn("h",
            graft.ops.Quantization.hammingColumn(col("bv"), lit(qb)))
          .orderBy(col("h").asc, col("vec_id").asc).limit(500).collect()
      }
      time("bq: full two-stage from floats (cand=500)") {
        graft.ops.Quantization.binaryTopK(
          vecs, "vec_id", "embedding", q2, 10, candidates = 500).collect()
      }
      codes.unpersist()
    }
    if (on("zorder")) {
      // Z-order data-skipping at 2M rows on DISK (the pruning story is
      // scan BYTES, so this section writes real parquet): 64 clustered
      // files over (x: 0..100k numeric, cat: 64-value categorical),
      // then a 5%-of-keyspace range filter — full scan vs stats-pruned
      // scan, and the OPTIMIZE cost after a 5% unclustered append.
      import graft.ops.ZOrder
      import graft.store.SnapshotLog
      def mkRows(lo: Long, hi: Long) = spark.range(lo, hi).select(col("id"),
        pmod(xxhash64(col("id")), lit(100000L)).as("x"),
        concat(lit("cat"),
          pmod(xxhash64(col("id"), lit(7)), lit(64L)).cast("string")).as("cat"))
      def dims = Seq(ZOrder.fixedBucket(col("x"), 0.0, 100000.0, 8),
        ZOrder.hashBucket(col("cat"), 8))
      val zdir = java.nio.file.Files.createTempDirectory("zprobe").toString
      time(s"zorder: clusterWrite 64 files + init ($n rows)") {
        SnapshotLog.init(ZOrder.clusterWrite(mkRows(0, n), dims, 8, 64), zdir)
      }
      time("zorder: full-scan range count (5% of keyspace)") {
        SnapshotLog.read(spark, zdir).filter(col("x").between(1000, 6000)).count()
      }
      time("zorder: stats-pruned range count") {
        val (df, kept, total) = SnapshotLog.scanPruned(spark, zdir, "x", 1000.0, 6000.0)
        val c = df.count()
        println(s"  [zorder] files scanned $kept/$total, rows $c")
      }
      SnapshotLog.append(mkRows(n, n + n / 20)
        .withColumn("zkey", ZOrder.interleave(dims, 8)).coalesce(1), zdir)
      time("zorder: OPTIMIZE after 5% unclustered append") {
        ZOrder.compact(spark, zdir)
      }
      time("zorder: stats-pruned range count post-OPTIMIZE") {
        val (df, kept, total) = SnapshotLog.scanPruned(spark, zdir, "x", 1000.0, 6000.0)
        val c = df.count()
        println(s"  [zorder] files scanned $kept/$total, rows $c")
      }
    }
    if (on("r8ops")) {
      import graft.store.SnapshotLog
      // Round-8 operators at 1000x bench scale. Claims under test:
      // (a) the PCA gram pass is ONE bounded-buffer aggregate — cost
      //     scales with rows, shuffle stays at partitions x 17 KB;
      // (b) projection + Mahalanobis are map-only scan passes;
      // (c) KMV answers set overlap in two bounded aggs where the
      //     exact answer pays a full distinct + join;
      // (d) bloom sidecars skip files on a point predicate over a
      //     hash-distributed key (footer min/max provably can't);
      // (e) the degree-ordered triangle plan survives a 1M-edge graph
      //     with hubs.
      val vcount = vecs.count()
      println(s"[probe] r8ops corpus=$vcount x $dim")
      var model: graft.ops.Pca.Model = null
      time("pca fit (gram pass + driver jacobi)") {
        model = graft.ops.Pca.fit(vecs, "embedding", dim, 16)
        println(f"  [pca] top eig=${model.eigenvalues.head}%.6f trace=${model.trace}%.4f")
      }
      time("pca project k=16 (map-only)") {
        println("  [pca] rows=" + graft.ops.Pca
          .project(vecs, "vec_id", "embedding",
            model.copy(components = model.components.take(16)))
          .agg(sum(col("sq_norm"))).head().getDouble(0))
      }
      time("mahalanobis scores (map-only)") {
        println("  [pca] max=" + graft.ops.Pca
          .mahalanobisScores(vecs, "vec_id", "embedding", model)
          .agg(max(col("maha"))).head().getDouble(0))
      }
      // two overlapping key sets, ~60% Jaccard, built from the ids
      val a = spark.range(n).select((col("id") % (n / 2)).cast("string").as("k"))
      val b = spark.range(n).select(((col("id") % (n / 2)) + (n / 10)).cast("string").as("k"))
      time("kmv overlap (two k=512 sketches)") {
        import graft.functions.{KmvBuffer, KmvFunctions}
        def sk(df: org.apache.spark.sql.DataFrame) = KmvBuffer.fromSorted(
          df.agg(KmvFunctions.kmvSketch(col("k"), 512).as("s"))
            .head().getSeq[Long](0).toArray, 512)
        val (j, inter) = KmvBuffer.overlap(sk(a), sk(b))
        println(f"  [kmv] jaccard=$j%.4f inter=$inter%.0f")
      }
      time("exact overlap (distinct + join baseline)") {
        println("  [exact] inter=" + a.distinct().join(b.distinct(), "k").count())
      }
      val bdir = java.nio.file.Files.createTempDirectory("probe_bloom").toString
      time("bloom sidecars: snapshot init (32 files) + build") {
        SnapshotLog.init(spark.range(n).select(col("id"),
          concat(lit("key_"), (col("id") % 100000).cast("string")).as("k"))
          .repartition(32, col("k")), bdir)
        println("  [bloom] sidecars=" +
          SnapshotLog.writeBloomSidecars(spark, bdir, "k"))
      }
      time("bloom point scan (one key in 100k)") {
        val (df, kept, total) = SnapshotLog.scanPrunedPoint(spark, bdir, "k", "key_777")
        println(s"  [bloom] files scanned $kept/$total rows=${df.count()}")
      }
      time("full scan + filter baseline (same predicate)") {
        println("  [full] rows=" + SnapshotLog.read(spark, bdir)
          .filter(col("k") === "key_777").count())
      }
      // ~1M-edge graph with hubs: node i connects to i+1..i+3 (chain
      // triangles) and every 1000th node to 300 fanout neighbors
      val chain = spark.range(n / 4).selectExpr("id AS a")
        .select(col("a"), explode(expr("sequence(1, 3)")).as("d"))
        .select(col("a").as("id_a"), (col("a") + col("d")).as("id_b"))
      val hubs = spark.range(n / 4 / 1000).select((col("id") * 1000).as("id_a"),
          explode(expr("sequence(1, 300)")).as("d"))
        .select(col("id_a"), (col("id_a") + col("d") * 7).as("id_b"))
      time("triangles (degree-ordered, ~1M edges + hubs)") {
        val r = graft.ops.GraphOps.triangleStats(
          chain.unionByName(hubs), "id_a", "id_b").head()
        println(s"  [tri] nodes=${r.getLong(0)} edges=${r.getLong(1)} " +
          s"wedges=${r.getLong(2)} triangles=${r.getLong(3)}")
      }
      // 500k 8-hex keys in planted typo families of 4
      val keys = spark.range(500000L).select(col("id"),
          substring(md5(expr("CAST(id div 4 AS STRING)")), 1, 8).as("k0"))
        .select(col("id"), when(col("id") % 4 === 1,
            concat(lit("z"), substring(col("k0"), 2, 7)))
          .when(col("id") % 4 === 2, substring(col("k0"), 1, 7))
          .when(col("id") % 4 === 3, concat(col("k0"), lit("q")))
          .otherwise(col("k0")).as("key"))
      time("fuzzy key join (FastSS, 500k keys)") {
        println("  [fastss] pairs=" + graft.ops.Dedup
          .editDistanceJoin(keys, "id", "key", maxBlock = 64).count())
      }
      // the TopKWindowRewrite delta: Spark 4's own WindowGroupLimit
      // already fixes the SHUFFLE (k rows per group per map side),
      // but the plan still pays two full local sorts + the window;
      // the heap aggregate replaces both with O(n log k) inserts
      val lb = spark.range(n).select((col("id") % 1000).cast("string").as("grp"),
        col("id"), (xxhash64(col("id")).cast("double") / 1e18).as("score"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      lb.count()
      time("window top-3/group (WindowGroupLimit plan)") {
        import org.apache.spark.sql.expressions.{Window => W}
        val w = W.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id").asc)
        println("  [topk] rows=" + lb
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") <= 3).count())
      }
      time("heap-agg top-3/group (TopKWindowRewrite plan)") {
        println("  [topk] rows=" + lb.groupBy(col("grp"))
          .agg(graft.functions.TopKFunctions.topKHits(col("score"), col("id"), 3)
            .as("hits"))
          .select(col("grp"), explode(col("hits")))
          .count())
      }
      lb.unpersist()
    }
    // AQE skew-join vs explicit salting, A/B at a 50%-hot key: the
    // round-9 question "does Spark 4 AQE obsolete saltedJoin?".
    // Sort-merge forced (broadcast would hide the skew entirely);
    // the AQE skew threshold is lowered to 8MB so the optimization
    // can fire at probe scale (default 256MB targets real clusters).
    if (on("skew")) {
      val nKeys = 10000L
      val large = spark.range(n).select(
          when(col("id") % 2 === 0, 0L)
            .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
          col("id").as("payload"))
        .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      val small = spark.range(nKeys).select(col("id").as("k"),
        (col("id") * 7).as("v")).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] skew corpus: large=${large.count()} (50% on key 0), small=${small.count()}")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(label: String)(setup: => Unit): Unit = {
        setup
        time(label) {
          println("  [skew] rows=" + large.join(small, Seq("k")).count())
        }
      }
      run("SMJ join, AQE off") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      }
      run("SMJ join, AQE skew-join on (8MB thr)") {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("saltedJoin factor 16 (AQE off)") {
        println("  [skew] rows=" + graft.ops.Salting.saltedJoin(
          large, small, "k", factor = 16, spreadCols = Seq("payload")).count())
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      large.unpersist(); small.unpersist()
    }
    // Round-10 re-probe at PRODUCTION defaults: the r9 skew verdict
    // rests on an 8MB threshold override at 4-8M rows; here the corpus
    // is sized (≥64M rows, 50% on one key) so the hot partition's
    // shuffle bytes exceed the STOCK 256MB
    // skewedPartitionThresholdInBytes — no overrides at all — which is
    // the regime a production cluster actually sees.
    if (on("skew256")) {
      val n256 = math.max(n, 64000000L)
      val nKeys = 10000L
      val large = spark.range(n256).select(
          when(col("id") % 2 === 0, 0L)
            .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
          col("id").as("payload"))
        .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      val small = spark.range(nKeys).select(col("id").as("k"),
        (col("id") * 7).as("v")).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] skew256 corpus: large=${large.count()} (50% on key 0), small=${small.count()}")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(label: String)(setup: => Unit): Unit = {
        setup
        time(label) {
          println("  [skew256] rows=" + large.join(small, Seq("k")).count())
        }
      }
      run("SMJ join, AQE off") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      }
      run("SMJ join, AQE skew-join STOCK defaults (256MB thr)") {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("saltedJoin factor 16 (AQE off)") {
        println("  [skew256] rows=" + graft.ops.Salting.saltedJoin(
          large, small, "k", factor = 16, spreadCols = Seq("payload")).count())
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      large.unpersist(); small.unpersist()
    }
    // SIMD saxpy kernel vs the identical scalar loop, single thread —
    // the affine (y = x·W + b) inner loop is the forward pass's
    // bottleneck, and VectorKernels routes it through the Vector API
    // when the module is present. Results are bit-identical by
    // construction (element-parallel, no FMA); this times them.
    if (on("simd")) {
      println(s"[probe] simd enabled=${graft.embed.VectorKernels.simdEnabled()}" +
        s" lanes=${graft.embed.VectorKernels.lanes()}")
      for (h <- Seq(128, 384, 1024)) {
        val rnd = new java.util.Random(42)
        // float master, exact-widened double twin: all three paths see
        // the same values, so the bit-identity require below is valid
        val wmF = Array.fill(h, h)(rnd.nextFloat() * 0.1f)
        val wm = wmF.map(_.map(_.toDouble))
        val x = Array.fill(h)(rnd.nextDouble())
        val outV = new Array[Double](h)
        val outS = new Array[Double](h)
        val outL = new Array[Double](h)
        // the pre-round-10 inner loop: float rows, per-element widening
        def affineLegacy(): Unit = {
          var i = 0
          while (i < h) {
            val xi = x(i); val row = wmF(i)
            var o = 0
            while (o < h) { outL(o) += xi * row(o); o += 1 }
            i += 1
          }
        }
        def affineVector(): Unit = {
          var i = 0
          while (i + 4 <= h) {
            graft.embed.VectorKernels.saxpy4f(x(i), wmF(i), x(i + 1), wmF(i + 1),
              x(i + 2), wmF(i + 2), x(i + 3), wmF(i + 3), outV)
            i += 4
          }
          while (i < h) { graft.embed.VectorKernels.saxpyf(x(i), wmF(i), outV); i += 1 }
        }
        def affineScalar(): Unit = {
          var i = 0
          while (i < h) {
            val xi = x(i); val row = wm(i)
            var o = 0
            while (o < h) { outS(o) += xi * row(o); o += 1 }
            i += 1
          }
        }
        val reps = math.max(1000, (64 << 20) / (h * h))
        (1 to reps).foreach(_ => affineVector()) // warm all paths
        (1 to reps).foreach(_ => affineScalar())
        (1 to reps).foreach(_ => affineLegacy())
        val t0 = System.nanoTime()
        (1 to reps).foreach(_ => affineVector())
        val secV = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        (1 to reps).foreach(_ => affineScalar())
        val secS = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        (1 to reps).foreach(_ => affineLegacy())
        val secL = (System.nanoTime() - t2) / 1e9
        val flops = 2.0 * h * h * reps
        require(java.util.Arrays.equals(outV, outS), "SIMD/scalar drift")
        println(f"[probe] simd h$h%-4d legacy ${flops / secL / 1e9}%6.2f GFLOP/s" +
          f"  scalar ${flops / secS / 1e9}%6.2f  vector ${flops / secV / 1e9}%6.2f" +
          f"  vec/legacy ${secL / secV}%5.2fx  vec/scalar ${secS / secV}%5.2fx")
      }
    }
    // TransformerSession throughput: tokens/sec per (model size, batch)
    // — the JVM analogue of the reference's per-model batch-size table
    // (utilities_core.py:162-180). Single-session numbers; the Spark
    // mapPartitions path multiplies by cores (one session per
    // executor-thread partition).
    if (on("grtf")) {
      import graft.embed.{TransformerCheckpoint, TransformerSession}
      val seqLen = 128
      for ((hidden, layers, inter) <- Seq((32, 2, 64), (64, 4, 256), (128, 4, 512))) {
        val sess = new TransformerSession(TransformerCheckpoint.syntheticWeights(
          vocabSize = 1000, hidden = hidden, heads = 4, maxPos = seqLen,
          intermediate = inter, layers = layers, seed = 7L))
        for (batch <- Seq(1, 8, 32)) {
          val ids = Array.fill(batch)(Array.tabulate(seqLen)(i => (i % 996 + 4).toLong))
          val mask = Array.fill(batch)(Array.fill(seqLen)(1L))
          sess.run(ids, mask) // warm
          val reps = math.max(1, 64 / batch)
          val t0 = System.nanoTime()
          (1 to reps).foreach(_ => sess.run(ids, mask))
          val sec = (System.nanoTime() - t0) / 1e9
          val toks = reps.toLong * batch * seqLen
          println(f"[probe] grtf h$hidden%-3d L$layers batch=$batch%-2d " +
            f"${toks / sec}%9.0f tok/s (${toks / sec * 32}%9.0f tok/s @32 cores)")
        }
      }
    }
    // SemDeDup assignment A/B: corpus-scaled-k kmeans (r9, assignment
    // n·k = n²/512 — quadratic) vs LSH-sharded fixed-k kmeans (r11,
    // n·4 — linear). Corpus plants a 0.995-cosine near-dup at every
    // id%10==9 (a jittered copy of id-9), so pair RECALL — the
    // fraction of planted pairs landing in one cell — is measured
    // against a FREE construction-known ground truth, no n² scan.
    if (on("semdedup")) {
      import graft.ops.Dedup
      def compsOf(c: org.apache.spark.sql.Column) = (0 until dim).map(d =>
        (xxhash64(lit(d), c).cast("double") / lit(Long.MaxValue.toDouble)).cast("float"))
      def planted(m: Long) = {
        val src = when(col("id") % 10 === 9, col("id") - 9).otherwise(col("id"))
        val base = compsOf(src)
        val noise = compsOf(col("id") + lit(1000000007L))
        val mixed = (0 until dim).map(d => base(d) * lit(0.995f) +
          when(col("id") % 10 === 9, noise(d) * lit(0.1f)).otherwise(lit(0f)))
        spark.range(m).select(col("id").as("vec_id"),
          VectorFunctions.l2Normalize(array(mixed: _*)).as("embedding"))
      }
      def recall(out: org.apache.spark.sql.DataFrame, m: Long): Double = {
        val cells = out.select(col("vec_id"), col("cluster")).persist(StorageLevel.MEMORY_AND_DISK)
        val pairs = spark.range(m).filter(col("id") % 10 === 9)
          .select((col("id") - 9).as("ia"), col("id").as("ib"))
        val hit = pairs
          .join(cells.select(col("vec_id").as("ia"), col("cluster").as("ca")), "ia")
          .join(cells.select(col("vec_id").as("ib"), col("cluster").as("cb")), "ib")
          .filter(col("ca") === col("cb")).count()
        cells.unpersist()
        hit.toDouble / (m / 10).toDouble
      }
      for (m <- Seq(20000L, 200000L, 2000000L)) {
        val v = planted(m).persist(StorageLevel.MEMORY_AND_DISK)
        v.count()
        val bits = if (m <= 2048L) 0
          else 64 - java.lang.Long.numberOfLeadingZeros((m - 1L) / 2048L)
        var r = 0.0
        var drops = 0L
        // sum over kept forces the PAIR PHASE (column pruning would
        // otherwise skip it for the cluster-only recall join)
        def dropsOf(o: org.apache.spark.sql.DataFrame): Long =
          o.agg(sum(when(col("kept"), 0L).otherwise(1L))).head().getLong(0)
        time(f"semdedup SHARDED (bits=$bits%2d, k=4) n=$m%-8d") {
          val o = Dedup.semanticDedup(v, "vec_id", "embedding",
            dim = dim, k = 4, iters = 2, threshold = 0.4, shardBits = bits)
          drops = dropsOf(o); r = recall(o, m)
        }
        println(f"[probe]   sharded: recall $r%.3f dropped $drops%d")
        if (m <= 200000L) { // the quadratic path is the probe's POINT; 2M would be ~10 min
          val kOld = math.max(4L, m / 512L).toInt
          time(f"semdedup corpus-k (k=$kOld%4d)    n=$m%-8d") {
            val o = Dedup.semanticDedup(v, "vec_id", "embedding",
              dim = dim, k = kOld, iters = 2, threshold = 0.4)
            drops = dropsOf(o); r = recall(o, m)
          }
          println(f"[probe]   corpus-k: recall $r%.3f dropped $drops%d")
        }
        v.unpersist()
      }
    }
    spark.stop()
  }
}
