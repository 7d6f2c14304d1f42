package graft

import graft.functions.TextFunctions
import graft.ops.{Dedup, GraphOps, Multimodal, SimilaritySearch, TextAnalytics}
import org.apache.spark.sql.functions._

/** Scale-extension operators: dedup ladder, text analytics, similarity
  * search, multimodal plumbing. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per duplicate group") {
    val survivors = Dedup.exact(docs, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L))
  }

  test("duplicated spans: island merge; removal keeps the keeper's copy verbatim") {
    val docs = Seq(
      (1L, "a b c d e f g h unique1 tail1"),
      (2L, "a b c d e f g h unique2 tail2"),
      (3L, "totally different words over here now ok")).toDF("doc_id", "text")
    // 5-grams at word positions 1..4 are shared between docs 1 and 2:
    // one island -> one span covering words [1, 8]
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .select($"sid", $"span_start", $"span_end", $"span_words")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(spans == Seq((1L, 1L, 8L, 8L), (2L, 1L, 8L, 8L)))
    val rm = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .select($"sid", $"cleaned_text", $"n_kept", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // keeper (min doc id) keeps every word; the non-keeper loses the
    // covered span; the unrelated doc is untouched
    assert(rm(0) == ((1L, "a b c d e f g h unique1 tail1", 10L, 0L)))
    assert(rm(1) == ((2L, "unique2 tail2", 2L, 8L)))
    assert(rm(2) == ((3L, "totally different words over here now ok", 7L, 0L)))
    // a fully-duplicated non-keeper survives as an empty row
    val full = Seq((1L, "x y z w v"), (2L, "x y z w v")).toDF("doc_id", "text")
    val rmf = Dedup.removeDuplicatedSpans(full, "doc_id", "text", n = 5)
      .select($"sid", $"cleaned_text", $"n_kept").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rmf == Seq((1L, "x y z w v", 5L), (2L, "", 0L)))
  }

  test("jaccard: exact dups -> 1.0; near dups high; unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.7 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (x, y) => x == 4L || y == 4L })
  }

  test("collapsed jaccard pairs == direct pairs, incl. a clone-heavy corpus") {
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    // clone-heavy: 4 distinct texts × 5 verbatim clones each (strided
    // ids, the ScaleData shape), one near-dup bridge, one loner, one
    // too-short text whose clones share NO shingles (must emit nothing)
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta " * 3,
      "alpha beta gamma delta epsilon zeta eta thXta " * 3, // near-dup of 0
      "totally different content about joins and shuffles " * 3,
      "yet another unrelated block of words entirely here " * 3)
    val clones = for {
      (t, g) <- base.zipWithIndex
      c <- 0 until 5
    } yield ((c * 10 + g).toLong, t)
    val corpus = (clones ++ Seq((100L, "loner document with its own content " * 3),
      (101L, ""), (102L, ""))).toDF("doc_id", "text")
    for ((cap, shared) <- Seq((64, 2), (8, 1))) {
      val direct = Dedup.jaccardPairs(corpus, "doc_id", "text",
        n = 8, threshold = 0.2, maxDocFreq = cap, minShared = shared)
      val collapsed = Dedup.jaccardPairsCollapsed(corpus, "doc_id", "text",
        n = 8, threshold = 0.2, maxDocFreq = cap, minShared = shared)
      val (d, c) = (pairSet(direct), pairSet(collapsed))
      direct.unpersist(); collapsed.unpersist()
      assert(d == c, s"cap=$cap minShared=$shared: " +
        s"direct-only=${d -- c} collapsed-only=${c -- d}")
      assert(d.nonEmpty)
      assert(!d.exists { case (a, b, _) => a == 101L || b == 101L },
        "shingle-less clones must not pair")
    }
    // unique corpus (classes == docs): degenerates to the direct plan
    val uniq = Seq.tabulate(12)(i =>
      (i.toLong, s"unique words number $i with some shared prefix text " * 2))
      .toDF("doc_id", "text")
    val d2 = Dedup.jaccardPairs(uniq, "doc_id", "text",
      n = 8, threshold = 0.2, maxDocFreq = 6, minShared = 2)
    val c2 = Dedup.jaccardPairsCollapsed(uniq, "doc_id", "text",
      n = 8, threshold = 0.2, maxDocFreq = 6, minShared = 2)
    val eq = pairSet(d2) == pairSet(c2)
    d2.unpersist(); c2.unpersist()
    assert(eq)
  }

  test("collapsed simhash + minhash-lsh pairs == direct, incl. clone-heavy corpus") {
    // same ScaleData shape as the jaccard collapse spec: 4 distinct
    // texts × 5 verbatim clones (one near-dup bridge), a loner, and
    // shingle-less empties that must stay invisible to both paths
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta " * 3,
      "alpha beta gamma delta epsilon zeta eta thXta " * 3,
      "totally different content about joins and shuffles " * 3,
      "yet another unrelated block of words entirely here " * 3)
    val clones = for {
      (t, g) <- base.zipWithIndex
      c <- 0 until 5
    } yield ((c * 10 + g).toLong, t)
    val corpus = (clones ++ Seq((100L, "loner document with its own content " * 3),
      (101L, ""), (102L, ""))).toDF("doc_id", "text")

    def simSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (maxHam <- Seq(3, 0)) {
      val direct = simSet(Dedup.simhashNearDups(corpus, "doc_id", "text",
        n = 8, maxHammingDistance = maxHam))
      val coll = Dedup.simhashNearDupsCollapsed(corpus, "doc_id", "text",
        n = 8, maxHammingDistance = maxHam)
      val c = simSet(coll); coll.unpersist()
      assert(direct == c, s"simhash maxHam=$maxHam: " +
        s"direct-only=${direct -- c} collapsed-only=${c -- direct}")
      assert(c.nonEmpty)
      assert(!c.exists { case (a, b, _) => a >= 101L || b >= 101L },
        "shingle-less clones must not pair")
    }

    def lshSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped (fraction + floor low enough to engage the hot cap on the
    // clone corpus), fixed-cap, and uncapped branches
    // mdf=2 drives every clone class all-hot → exercises the
    // lowest-df fallback re-signature on both paths
    for ((mdf, frac, floor) <- Seq((0, 0.3, 2), (8, 0.0, 16), (2, 0.0, 16), (0, 0.0, 16))) {
      val direct0 = Dedup.minhashLshCandidates(corpus, "doc_id", "text",
        n = 8, numHashes = 16, rowsPerBand = 4,
        maxDocFreq = mdf, maxDocFreqFraction = frac, dfFloor = floor)
      val d = lshSet(direct0); direct0.unpersist()
      val coll = Dedup.minhashLshCandidatesCollapsed(corpus, "doc_id", "text",
        n = 8, numHashes = 16, rowsPerBand = 4,
        maxDocFreq = mdf, maxDocFreqFraction = frac, dfFloor = floor)
      val c = lshSet(coll); coll.unpersist()
      assert(d == c, s"lsh mdf=$mdf frac=$frac floor=$floor: " +
        s"direct-only=${d -- c} collapsed-only=${c -- d}")
      assert(c.nonEmpty)
    }

    // fuzzy decontamination: corpus-side collapse, identical rows
    val bench = Seq((1000L, base(0)), (1001L, "benchmark only text " * 4))
      .toDF("doc_id", "text")
    def fzSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fd = fzSet(Dedup.minhashDecontaminate(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 8, numHashes = 16, rowsPerBand = 4,
      threshold = 0.25))
    val fcoll = Dedup.minhashDecontaminateCollapsed(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 8, numHashes = 16, rowsPerBand = 4,
      threshold = 0.25)
    val fc = fzSet(fcoll); fcoll.unpersist()
    assert(fd == fc, s"fuzzy: direct-only=${fd -- fc} collapsed-only=${fc -- fd}")
    assert(fc.nonEmpty)
  }

  test("collapsed per-doc / weighted twins == direct: quality, repetition, " +
      "decontaminate(+overlap), novelty, diversity(+approx)") {
    // MULTISET compare + schema (name, dataType) equality: a twin that
    // duplicated/dropped repeated rows or changed a column type would
    // pass a Set[String]-of-Row.toString compare — this suite is the
    // correctness guarantee the production dispatch cites, so it must
    // be multiplicity- and type-sensitive (r12 ADVICE).
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted
      val p = df.select(cols.head, cols.tail: _*)
      (p.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        p.collect().map(_.toString).groupBy(identity)
          .map { case (k, v) => (k, v.length) })
    }
    def assertSame(direct: org.apache.spark.sql.DataFrame,
        collapsed: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val (dSchema, d) = rows(direct)
      val (cSchema, c) = rows(collapsed)
      collapsed.unpersist()
      assert(dSchema == cSchema,
        s"$what schema: direct=$dSchema collapsed=$cSchema")
      assert(d == c, s"$what: direct-only=${d.toSet -- c.toSet} " +
        s"collapsed-only=${c.toSet -- d.toSet}")
      assert(d.nonEmpty, s"$what: vacuous fixture")
    }
    // clone-heavy fixture with per-doc variety: long clean text (quota
    // clones), repetitive text, symbol junk, empty, loner — and the
    // SAME text planted under two different sources for the
    // group-keyed diversity collapse
    val clean = "the cat sat on the mat and it is a fine day in the sun " * 4
    val repet = "spam spam spam spam spam ham spam spam spam spam spam spam " * 3
    val docsRaw = (for {
      (t, g) <- Seq(clean, repet,
        "#### $$$$ %%%% {{{{ }}}} <<<< >>>> #### $$$$ %%%%",
        "yet another unrelated block of words entirely here now ok " * 3).zipWithIndex
      c <- 0 until 4
    } yield ((c * 10 + g).toLong, t, if (g % 2 == 0) "web" else "books")) ++
      Seq((100L, "loner document with its own content words here " * 3, "web"),
        (101L, "", "web"),
        (200L, clean, "books"), // same text, other source
        // clean clones on NON-%10 ids: land in the decontamination
        // POOL (the %10==0 clean clones land in bench) so the
        // contaminated output is non-vacuous
        (7L, clean, "web"), (17L, clean, "web"))
    val corpus = docsRaw.toDF("doc_id", "text", "source")

    assertSame(
      TextAnalytics.qualityFilter(corpus.select($"doc_id", $"text"), "text").drop("text"),
      Dedup.perDocCollapsed(corpus.select($"doc_id", $"text"), "doc_id", "text",
        outId = "doc_id") { reps =>
        TextAnalytics.qualityFilter(reps, "text").drop("text") },
      "qualityFilter")
    assertSame(
      TextAnalytics.repetitionStats(corpus, "doc_id", "text", gramN = 5),
      Dedup.perDocCollapsed(corpus, "doc_id", "text", outId = "sid") { reps =>
        TextAnalytics.repetitionStats(reps, "doc_id", "text", gramN = 5) },
      "repetitionStats")

    val pool = corpus.filter($"doc_id" % 10 =!= 0)
    val bench = corpus.filter($"doc_id" % 10 === 0)
    assertSame(
      Dedup.decontaminate(pool, "doc_id", "text", bench, "doc_id", "text", n = 5),
      Dedup.perDocCollapsed(pool, "doc_id", "text", outId = "sid") { reps =>
        Dedup.decontaminate(reps, "doc_id", "text", bench, "doc_id", "text", n = 5) },
      "decontaminate")
    assertSame(
      Dedup.decontaminateOverlap(pool, "doc_id", "text", bench, "doc_id", "text", n = 5),
      Dedup.perDocCollapsed(pool, "doc_id", "text", outId = "sid") { reps =>
        Dedup.decontaminateOverlap(reps, "doc_id", "text", bench, "doc_id", "text", n = 5) },
      "decontaminateOverlap")

    // novelty: direct formula vs the weighted-df collapse
    val grams = Dedup.wordGramHashes(corpus, "doc_id", "text", n = 5)
    val dfreq = grams.groupBy("gh").agg(count(lit(1)).as("__df"))
    val directNovelty = grams.join(dfreq, "gh")
      .groupBy(col("sid").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
    assertSame(directNovelty,
      Dedup.ngramNoveltyCollapsed(corpus, "doc_id", "text", n = 5),
      "ngramNovelty")

    assertSame(
      TextAnalytics.ngramDiversity(corpus, "source", "text", maxN = 3),
      TextAnalytics.ngramDiversityCollapsed(corpus, "source", "text", maxN = 3),
      "ngramDiversity")
    assertSame(
      TextAnalytics.ngramDiversityApprox(corpus, "source", "text", maxN = 3),
      TextAnalytics.ngramDiversityApproxCollapsed(corpus, "source", "text", maxN = 3),
      "ngramDiversityApprox")

    // weighted top-ngrams twin (count + containing-doc count per gram)
    assertSame(
      TextAnalytics.topNgrams(corpus, "doc_id", "text", n = 3, k = 50),
      TextAnalytics.topNgramsCollapsed(corpus, "doc_id", "text", n = 3, k = 50),
      "topNgrams")

    // DSIR: both model sides collapse to weighted counts; rep scores
    // expand verbatim; the Gumbel key rides after expansion. Target =
    // the 'books' slice, so clone siblings DISAGREE on membership —
    // the independent-collapse exactness claim is exercised.
    val dsirTarget = corpus.filter($"source" === "books")
      .select($"doc_id", $"text")
    val dsirPool = corpus.select($"doc_id", $"text")
    assertSame(
      TextAnalytics.dsirWeights(dsirPool, dsirTarget, "doc_id", "text", buckets = 64),
      TextAnalytics.dsirWeightsCollapsed(dsirPool, dsirTarget, "doc_id", "text", buckets = 64),
      "dsirWeights")
    assertSame(
      TextAnalytics.dsirResample(dsirPool, dsirTarget, "doc_id", "text", k = 7, buckets = 64),
      TextAnalytics.dsirResampleCollapsed(dsirPool, dsirTarget, "doc_id", "text", k = 7, buckets = 64),
      "dsirResample")

    // CDC dedup stats: weighted chunk counts, distinct-survivor set
    assertSame(
      TextAnalytics.cdcDedupStats(corpus.select($"doc_id", $"text"),
        "doc_id", "text", editPrefix = "prefix edit ", n = 4, divisor = 8),
      TextAnalytics.cdcDedupStatsCollapsed(corpus.select($"doc_id", $"text"),
        "doc_id", "text", editPrefix = "prefix edit ", n = 4, divisor = 8),
      "cdcDedupStats")

    // edit-verify: one levenshtein per distinct (text_a, text_b) combo
    val evPairs = corpus.select($"doc_id".as("id_a"))
      .crossJoin(corpus.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b" && ($"id_a" + $"id_b") % 3 === 0)
    assertSame(
      Dedup.editVerifyPairs(evPairs, corpus, "doc_id", "text", minSim = 0.3),
      Dedup.editVerifyPairsCollapsed(evPairs, corpus, "doc_id", "text", minSim = 0.3),
      "editVerifyPairs")

    // LM scores: weighted word/bigram counts + per-doc score expansion
    assertSame(
      TextAnalytics.unigramLogProb(corpus, "doc_id", "text"),
      TextAnalytics.unigramLogProbCollapsed(corpus, "doc_id", "text"),
      "unigramLogProb")
    assertSame(
      TextAnalytics.bigramLogProb(corpus, "doc_id", "text"),
      TextAnalytics.bigramLogProbCollapsed(corpus, "doc_id", "text"),
      "bigramLogProb")

    // tfidf / PMI: weighted df/counts + rep-scale rank windows
    assertSame(
      TextAnalytics.tfidfKeywords(corpus, "doc_id", "text", k = 3),
      TextAnalytics.tfidfKeywordsCollapsed(corpus, "doc_id", "text", k = 3),
      "tfidfKeywords")
    assertSame(
      TextAnalytics.pmiCollocations(corpus, "text", minCount = 2, k = 50),
      TextAnalytics.pmiCollocationsCollapsed(corpus, "doc_id", "text",
        minCount = 2, k = 50),
      "pmiCollocations")

    // multi-row per-doc expansion (chunk explodes)
    assertSame(
      TextAnalytics.contentDefinedChunks(corpus.select($"doc_id", $"text"),
        "doc_id", "text", n = 4, divisor = 8),
      Dedup.perDocCollapsed(corpus.select($"doc_id", $"text"),
        "doc_id", "text", outId = "doc_id") { reps =>
        TextAnalytics.contentDefinedChunks(reps, "doc_id", "text",
          n = 4, divisor = 8)
      },
      "contentDefinedChunks")

    // span family: weighted distinct-doc counts; the removal's keeper
    // rule factors into the rep/member variants. Fixture adds partial
    // cross-doc overlap so spans exist beyond whole-doc clones.
    val spanDocs = corpus.select($"doc_id", $"text").unionByName(Seq(
      (300L, "unique preamble " + clean),
      (301L, clean + " unique epilogue words here")).toDF("doc_id", "text"))
    val spanClasses = graft.ops.Dedup.cloneClasses(spanDocs, "doc_id", "text")
    val spanRepGrams = Dedup.positionalWordGramHashes(
      spanClasses.select($"rep".as("doc_id"), $"__text".as("text")),
      "doc_id", "text", n = 5)
    val directGrams = Dedup.positionalWordGramHashes(spanDocs, "doc_id", "text", n = 5)
    assertSame(
      Dedup.duplicatedSpansFromGrams(directGrams, n = 5),
      Dedup.duplicatedSpansFromGramsCollapsed(spanRepGrams, spanClasses, n = 5),
      "duplicatedSpans")
    assertSame(
      Dedup.removeDuplicatedSpansFromGrams(spanDocs, "doc_id", "text",
        directGrams, n = 5),
      Dedup.removeDuplicatedSpansFromGramsCollapsed(spanClasses,
        spanRepGrams, n = 5),
      "removeDuplicatedSpans")
    val spanBench = spanDocs.filter($"doc_id" % 10 === 0)
    val spanPool = spanDocs.filter($"doc_id" % 10 =!= 0)
    val poolClasses = graft.ops.Dedup.cloneClasses(spanPool, "doc_id", "text")
    val poolRepGrams = Dedup.positionalWordGramHashes(
      poolClasses.select($"rep".as("doc_id"), $"__text".as("text")),
      "doc_id", "text", n = 5)
    assertSame(
      Dedup.decontaminateSpansFromGrams(
        Dedup.positionalWordGramHashes(spanPool, "doc_id", "text", n = 5),
        spanBench, "doc_id", "text", n = 5),
      Dedup.decontaminateSpansFromGramsCollapsed(poolRepGrams, poolClasses,
        spanBench, "doc_id", "text", n = 5),
      "decontaminateSpans")

    // stupid-backoff: weighted tri/bi/uni counts + per-doc expansion
    val sbScore = corpus.filter($"doc_id" % 10 === 3).select($"doc_id", $"text")
    val sbCorpus = corpus.filter($"doc_id" % 10 =!= 3).select($"doc_id", $"text")
    assertSame(
      TextAnalytics.stupidBackoffScore(sbScore, sbCorpus, "doc_id", "text"),
      TextAnalytics.stupidBackoffScoreCollapsed(sbScore, sbCorpus, "doc_id", "text"),
      "stupidBackoffScore")
    assertSame(
      TextAnalytics.perplexityBuckets(corpus, "doc_id", "text", "source"),
      TextAnalytics.perplexityBucketsCollapsed(corpus, "doc_id", "text", "source"),
      "perplexityBuckets")

    // BM25: weighted stats + class-constant scores expand before top-k
    assertSame(
      TextAnalytics.bm25Search(corpus, "doc_id", "text",
        terms = Seq("cat", "spam", "words"), topK = 10),
      TextAnalytics.bm25SearchCollapsed(corpus, "doc_id", "text",
        terms = Seq("cat", "spam", "words"), topK = 10),
      "bm25Search")

    // pii boundary-split: redacting the id-enriched concatenation ==
    // collapsed text-half redaction + the constant tail (no pattern
    // can cross the space boundary; the tail is fully determined)
    val tailExpr = concat($"text",
      lit(" contact user"), $"doc_id", lit("@example.com or +1555010"),
      lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"),
      lit(" from 192.168."), pmod($"doc_id", lit(256)), lit(".1"))
    val piiDirect = TextAnalytics.redactPii(
        corpus.select($"doc_id", tailExpr.as("pii_text")), "pii_text")
      .select($"doc_id", $"n_email", $"n_ipv4", $"n_phone", $"redacted")
    val piiCollapsed = Dedup.perDocCollapsed(corpus.select($"doc_id", $"text"),
        "doc_id", "text", outId = "doc_id") { reps =>
        TextAnalytics.redactPii(reps, "text")
          .select($"doc_id", $"n_email", $"n_ipv4", $"n_phone", $"redacted")
      }
      .select($"doc_id", ($"n_email" + 1).as("n_email"),
        ($"n_ipv4" + 1).as("n_ipv4"), ($"n_phone" + 1).as("n_phone"),
        concat($"redacted", lit(" contact <EMAIL> or <PHONE> from <IP>"))
          .as("redacted"))
    assertSame(piiDirect, piiCollapsed, "piiRedact")

    // NULL and '' texts must land in DIFFERENT clone classes: the
    // direct path gives them different metrics (null words vs 0
    // words), so merging them (the old coalesce-only class key) made
    // the expanded rows nondeterministic across runs
    val neCorpus = Seq(
      (1L, Some("shared words here")), (2L, Some("")), (4L, Some("")),
      (3L, None: Option[String]), (5L, None: Option[String]))
      .toDF("doc_id", "text")
    assertSame(
      TextAnalytics.qualityFilter(neCorpus, "text").drop("text"),
      Dedup.perDocCollapsed(neCorpus, "doc_id", "text",
        outId = "doc_id") { reps =>
        TextAnalytics.qualityFilter(reps, "text").drop("text") },
      "qualityFilter-null-vs-empty")
  }

  test("round-13 collapsed twins == direct: exact-key rungs, tagged per-doc, " +
      "paragraph dedup") {
    import org.apache.spark.sql.{Column, DataFrame}
    def rows(df: DataFrame) = {
      val cols = df.columns.sorted
      val p = df.select(cols.head, cols.tail: _*)
      (p.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        p.collect().map(_.toString).groupBy(identity)
          .map { case (k, v) => (k, v.length) })
    }
    def assertSame(direct: DataFrame, collapsed: DataFrame,
        what: String): Unit = {
      val (dSchema, d) = rows(direct)
      val (cSchema, c) = rows(collapsed)
      collapsed.unpersist()
      assert(dSchema == cSchema,
        s"$what schema: direct=$dSchema collapsed=$cSchema")
      assert(d == c, s"$what: direct-only=${d.toSet -- c.toSet} " +
        s"collapsed-only=${c.toSet -- d.toSet}")
      assert(d.nonEmpty, s"$what: vacuous fixture")
    }
    // clone-heavy fixture: case/whitespace/digit-decoration variants
    // that byte-hash keeps apart but the canonical/aggressive keys
    // must merge; plus empty and loner
    val clean = "The Cat sat on the Mat and it is a Fine Day " * 3
    val corpus = ((for {
      (t, g) <- Seq(clean, clean.toLowerCase,
        "spam ham spam ham spam ham spam ham spam here " * 2,
        "unrelated block of words entirely here now ok " * 2).zipWithIndex
      c <- 0 until 4
    } yield ((c * 10 + g).toLong, t)) ++ Seq(
      (100L, "loner document with its own content words " * 2),
      (101L, ""))).toDF("doc_id", "text")

    // exact-key rungs: union with decorated twins, the dedup_unicode /
    // dedup_aggressive query shape
    val uni = corpus.unionByName(corpus.select(($"doc_id" + 1000L).as("doc_id"),
      concat(upper($"text"), lit("  Post #123, 4 views! ")).as("text")))
    assertSame(
      Dedup.exactNormalized(uni, "doc_id", "text"),
      Dedup.exactNormalizedCollapsed(uni, "doc_id", "text"),
      "exactNormalizedCollapsed")
    assertSame(
      Dedup.exactAggressive(uni, "doc_id", "text"),
      Dedup.exactAggressiveCollapsed(uni, "doc_id", "text"),
      "exactAggressiveCollapsed")

    // tagged per-doc collapse: enrichment mixing text with an
    // id-derived tag (the luhn/iban/mojibake planting pattern)
    val classes = Dedup.cloneClasses(corpus, "doc_id", "text")
    def tagF(d: DataFrame): DataFrame =
      d.select($"doc_id", $"__tag",
        length(concat($"text",
          when($"__tag", lit(" EVEN")).otherwise(lit(" odd!"))))
          .cast("long").as("len"),
        upper(concat($"text",
          when($"__tag", lit(" EVEN")).otherwise(lit(" odd!")))).as("u"))
    val directTagged = tagF(corpus.select($"doc_id",
        ($"doc_id" % 2 === 0).as("__tag"), $"text"))
      .drop("__tag")
    val collTagged = Dedup.perDocTaggedCollapsedWithClasses(classes,
      "text", "doc_id", id => id % 2 === 0)(tagF)
    assertSame(directTagged, collTagged, "perDocTaggedCollapsed")

    // paragraph dedup: 2-variant keeper-rule collapse (reps keep their
    // computed row, non-rep members keep nothing)
    def mlOf(text: Column) = concat_ws("\n\n",
      substring(text, 1, 30),
      lit("subscribe to our newsletter"),
      substring(text, 31, 30))
    assertSame(
      TextAnalytics.dedupParagraphs(
        corpus.select($"doc_id", mlOf($"text").as("ml")), "doc_id", "ml"),
      TextAnalytics.dedupParagraphsCollapsedWithClasses(classes, mlOf),
      "dedupParagraphsCollapsed")
  }

  test("collapsed-graph connected components == clustering the expanded pairs") {
    // clone-heavy corpus incl. a near-dup BRIDGE between two clone
    // classes (cross-class component), an isolated clone class
    // (within-only component), a loner, and shingle-less empties
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta " * 3,
      "alpha beta gamma delta epsilon zeta eta thXta " * 3, // near-dup of 0
      "totally different content about joins and shuffles " * 3,
      "yet another unrelated block of words entirely here " * 3)
    val clones = for {
      (t, g) <- base.zipWithIndex
      c <- 0 until 5
    } yield ((c * 10 + g).toLong, t)
    val corpus = (clones ++ Seq((100L, "loner document with its own content " * 3),
      (101L, ""), (102L, ""))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ccside").toString
    val pairs = Dedup.jaccardPairsCollapsed(corpus, "doc_id", "text",
      n = 8, threshold = 0.2, maxDocFreq = 64, minShared = 2,
      sideDir = Some(tmp))
    def cset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.dedupClusters(pairs)
    val collapsed = Dedup.dedupClustersFromCollapsed(
      spark.read.parquet(s"$tmp/classes"),
      spark.read.parquet(s"$tmp/reppairs"),
      spark.read.parquet(s"$tmp/withinreps"))
    val (d, c) = (cset(direct), cset(collapsed))
    direct.unpersist(); collapsed.unpersist(); pairs.unpersist()
    assert(d == c, s"direct-only=${d -- c} collapsed-only=${c -- d}")
    assert(d.nonEmpty)
    // the two near-dup clone classes form ONE cross-class component
    // labeled by the global min id (0); the other classes label by
    // their own reps
    assert(c.filter(_._2 == 0L).map(_._1) ==
      (0 until 5).flatMap(cc => Seq(cc * 10L, cc * 10L + 1L)).toSet)
  }

  test("quotient pagerank (global + personalized) == expanded-graph ranks") {
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta " * 3,
      "alpha beta gamma delta epsilon zeta eta thXta " * 3, // near-dup of 0
      "totally different content about joins and shuffles " * 3,
      "yet another unrelated block of words entirely here " * 3)
    // UNEVEN clone counts (3/5/2/4) so class weights actually matter,
    // plus a loner and empties
    val clones = for {
      (t, g) <- base.zipWithIndex
      c <- 0 until Seq(3, 5, 2, 4)(g)
    } yield ((c * 10 + g).toLong, t)
    val corpus = (clones ++ Seq((100L, "loner document with its own content " * 3),
      (101L, ""), (102L, ""))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_prside").toString
    val pairs = Dedup.jaccardPairsCollapsed(corpus, "doc_id", "text",
      n = 8, threshold = 0.2, maxDocFreq = 64, minShared = 2,
      sideDir = Some(tmp))
    val classes = spark.read.parquet(s"$tmp/classes")
    val repPairs = spark.read.parquet(s"$tmp/reppairs")
    val withinReps = spark.read.parquet(s"$tmp/withinreps")
    def rset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val d1 = rset(GraphOps.pageRankUndirected(pairs, iters = 5))
    val c1 = rset(GraphOps.pageRankUndirectedCollapsed(
      classes, repPairs, withinReps, iters = 5))
    assert(d1 == c1, s"global: direct-only=${d1 -- c1} collapsed-only=${c1 -- d1}")
    assert(d1.nonEmpty)
    // uneven weights must produce distinct per-class ranks somewhere
    assert(d1.map(_._2).size > 1)

    // seeds cut ACROSS classes (doc_id % 3) — exercises the 2-type split
    val seeds = corpus.select($"doc_id").filter($"doc_id" % 3 === 0)
    val d2 = rset(GraphOps.personalizedPageRankUndirected(pairs, seeds, iters = 5))
    val c2 = rset(GraphOps.personalizedPageRankUndirectedCollapsed(
      classes, repPairs, withinReps, seeds, iters = 5))
    pairs.unpersist()
    assert(d2 == c2, s"ppr: direct-only=${d2 -- c2} collapsed-only=${c2 -- d2}")
    assert(d2.nonEmpty)
    // seed and non-seed members of the same class must differ in rank
    // (teleport mass separates the types)
    assert(d2 != d1)
  }

  test("dedup ladder: exact collapse then near-dup, lower id survives") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (1L, base),                       // survives (lowest of exact group {1,2})
      (2L, base),                       // exact dup of 1 -> dropped in rung 1
      (3L, base + " tiny tail change"), // near-dup of 1 -> dropped in rung 2
      (4L, "completely different content about spark dataframes and joins " * 5),
      (5L, "another unrelated corpus document with its own words entirely " * 5)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupCorpus(docs, "doc_id", "text",
        n = 8, threshold = 0.5, maxDocFreqFraction = 0.013, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L, 5L))
  }

  /** The r13-verdict leak contract: eager dedup entry points release
    * every INTERMEDIATE cache themselves; their returned frames are
    * eager localCheckpoints whose blocks the ContextCleaner reclaims
    * once the caller drops the reference — so after consumption the
    * only persistent RDDs allowed are locally-checkpointed results
    * still referenced by this scope, and the CacheManager is empty. */
  private def assertNoLeakedCaches(): Unit = {
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached frames leaked past consumption")
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
    assert(leaked.isEmpty, s"non-checkpoint persisted RDDs leaked: $leaked")
  }

  test("dedup cache ownership: zero persisted blocks after round-trip + unpersist") {
    // a long-lived session running the ladder repeatedly must not
    // accumulate blocks: no cached plans, no persisted intermediates
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val ladder = Dedup.dedupCorpus(docs, "doc_id", "text",
      n = 4, threshold = 0.5, maxDocFreqFraction = 0.5, minShared = 2)
    ladder.count()
    ladder.unpersist(blocking = true)
    val mh = Dedup.minhashLshCandidates(docs, "doc_id", "text",
      n = 4, numHashes = 16, rowsPerBand = 4, maxDocFreq = 64)
    mh.count()
    mh.unpersist(blocking = true)
    val jp = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 4, threshold = 0.5, maxDocFreq = 64)
    jp.unpersist(blocking = true)
    assertNoLeakedCaches()
  }

  test("transitive clustering: chains collapse, components stay separate") {
    import spark.implicits._
    // component {1,2,3} via chain edges only (no 1-3 edge), component
    // {5,6}, and a 5-node path 10..14 that needs several propagation
    // rounds to converge
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L)
    // driver-side union-find path (the small-graph default)
    val local = Dedup.dedupClusters(pairs)
    assert(local.as[(Long, Long)].collect().toMap == expected)
    // distributed min-label propagation path: identical result
    val dist = Dedup.dedupClusters(pairs, maxLocalPairs = 0)
    val got = dist.as[(Long, Long)].collect().toMap
    dist.unpersist()
    assert(got == expected)
    // non-convergence guard: a diameter-4 path cannot converge in 1 round
    val e = intercept[IllegalStateException] {
      Dedup.dedupClusters(pairs, maxIters = 1, maxLocalPairs = 0)
    }
    assert(e.getMessage.contains("did not converge"))
    assertNoLeakedCaches()
  }

  test("transitive clustering accepts string ids on both execution paths") {
    import spark.implicits._
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y"))
      .toDF("id_a", "id_b")
    val expected = Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "x" -> "x", "y" -> "x")
    val local = Dedup.dedupClusters(pairs)
    assert(local.schema("cluster").dataType == org.apache.spark.sql.types.StringType)
    assert(local.as[(String, String)].collect().toMap == expected)
    val dist = Dedup.dedupClusters(pairs, maxLocalPairs = 0)
    val got = dist.as[(String, String)].collect().toMap
    dist.unpersist()
    assert(got == expected)
    assertNoLeakedCaches()
  }

  test("transitive ladder collapses shared-near-dup components; greedy keeps them") {
    import spark.implicits._
    // docs 1 and 2 are unrelated to each other but both near-dup doc 5:
    // pairs (1,5),(2,5) — greedy keeps {1,2}, transitive keeps {1} only
    val w = (1 to 40).map(i => s"tok$i")
    def doc(ixs: Range) = ixs.map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, doc(1 to 20)),
      (2L, doc(14 to 33)),
      (5L, doc(6 to 25)), // overlaps both 1 and 2
      (9L, "wholly unrelated content about nothing shared at all with others"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 8, threshold = 0.3, maxDocFreq = 0, minShared = 1)
    val pairSet = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairSet.contains((1L, 5L)) && pairSet.contains((2L, 5L)))
    assert(!pairSet.contains((1L, 2L)))
    val greedy = Dedup.dedupCorpus(docs, "doc_id", "text",
      n = 8, threshold = 0.3, maxDocFreqFraction = 0.9, minShared = 1)
    val greedyIds = greedy.select("doc_id").as[Long].collect().toSet
    greedy.unpersist()
    val trans = Dedup.dedupCorpusTransitive(docs, "doc_id", "text",
      n = 8, threshold = 0.3, maxDocFreqFraction = 0.9, minShared = 1)
    val transIds = trans.select("doc_id").as[Long].collect().toSet
    trans.unpersist()
    assert(greedyIds == Set(1L, 2L, 9L))
    assert(transIds == Set(1L, 9L))
  }

  test("transitive clustering end-to-end: planted A~B~C text chain -> one cluster") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"word$i")
    def doc(from: Int, until: Int) = w.slice(from, until).mkString(" ")
    val docs = Seq(
      (1L, doc(0, 20)), (2L, doc(4, 24)), (3L, doc(8, 28)), // sliding chain
      (9L, "entirely unrelated content about something else altogether")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 8, threshold = 0.55, maxDocFreq = 0, minShared = 1)
    val pairSet = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // adjacent docs overlap 16/24 words; 1 vs 3 only 12/28 — chain only
    assert(pairSet.contains((1L, 2L)) && pairSet.contains((2L, 3L)))
    assert(!pairSet.contains((1L, 3L)))
    val clusters = Dedup.dedupClusters(pairs)
    val got = clusters.as[(Long, Long)].collect().toMap
    clusters.unpersist(); pairs.unpersist()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("minhash LSH finds exact and near dup candidates") {
    val cand = Dedup.minhashLshCandidates(docs, "doc_id", "text",
        n = 4, numHashes = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L))) // identical docs share every band
    assert(!cand.exists { case (x, y) => x == 4L || y == 4L })
  }

  test("simhash: identical docs -> hamming 0; blocking finds them") {
    val dups = Dedup.simhashNearDups(docs, "doc_id", "text", n = 4, maxHammingDistance = 3)
      .selectExpr("id_a", "id_b", "cast(hamming as long) h")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(dups((1L, 2L)) == 0L)
  }

  test("embedding near-dups by cosine threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.04f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding near-dups: size guard refuses an unguarded cartesian") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.9, maxExactRows = 1L)
    }
    assert(e.getMessage.contains("embeddingNearDupsBucketed"))
  }

  test("bucketed embedding near-dups: subset of exact pairs, finds clones") {
    // 40 vectors in 4 well-separated directions + near-clones of id 1
    val dim = 16
    val vecs = (1L to 40L).map { i =>
      val base = Array.tabulate(dim)(d => if (d == (i % 4).toInt) 1.0f else 0.0f)
      if (i <= 4) base(dim - 1) = 0.02f * i // near-clones of the i%4 axis
      (i, base)
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Dedup.embeddingNearDupsBucketed(vecs, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 32, bandBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact))
    // clone pair (1,5): same axis, cosine ~0.9998 — the tiny perturbation
    // can flip at most a plane or two, leaving other bands identical, so
    // the pair is always a candidate and always verified
    assert(bucketed.contains((1L, 5L)))
    assert(bucketed.nonEmpty)
    // hot-bucket cap: capping at 1 kills every bucket of >=2 -> no pairs
    val capped = Dedup.embeddingNearDupsBucketed(vecs, "vec_id", "embedding",
      threshold = 0.0, numPlanes = 32, bandBits = 4, maxBucket = 1)
    assert(capped.count() == 0L)
  }

  test("int8 quantization: codes bounded, reconstruction close, rerank = exact top-k") {
    import spark.implicits._
    val dim = 8
    val vecs = (1L to 200L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val (mins, maxs) = ops.Quantization.dimStats(vecs, "embedding", dim)
    assert(mins.length == dim && maxs.length == dim)
    assert(mins.zip(maxs).forall { case (a, b) => a <= b })
    // codes fit in a tinyint and reconstruction error is within half a step
    val codes = ops.Quantization.quantize(vecs, "embedding", mins, maxs)
      .select("qvec").as[Seq[Byte]].collect()
    assert(codes.forall(_.length == dim))
    val recon = vecs.select(col("embedding"),
        ops.Quantization.dequantizedColumn("embedding", mins, maxs).as("xh"))
      .as[(Seq[Float], Seq[Double])].collect()
    recon.foreach { case (x, xh) =>
      x.zip(xh).zipWithIndex.foreach { case ((xi, xhi), d) =>
        val step = (maxs(d) - mins(d)) / 255.0
        assert(math.abs(xi - xhi) <= step / 2 + 1e-9)
      }
    }
    // with a generous candidate pool the reranked result IS the exact top-k
    val q = Array.tabulate(dim)(d => math.cos(d * 0.5))
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val quant = ops.Quantization.quantizedTopK(vecs, "vec_id", "embedding", q, 5, candidates = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(quant == exact)
  }

  test("product quantization: codebook shape/determinism, code bounds, rerank = exact top-k") {
    import spark.implicits._
    val dim = 8; val m = 2; val ksub = 4
    val vecs = (1L to 200L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = ops.ProductQuantization.train(vecs, "vec_id", "embedding", dim, m, ksub, iters = 2)
    assert(cb.words.length == m && cb.words.forall(_.length == ksub)
      && cb.words.forall(_.forall(_.length == dim / m)))
    // training is partitioning-invariant: micro-snapped means + rounded
    // argmin means the trajectory cannot depend on summation order
    val cb2 = ops.ProductQuantization.train(vecs.repartition(7), "vec_id", "embedding",
      dim, m, ksub, iters = 2)
    assert(cb == cb2)
    // persistable codes: m bytes, each in [-128, -128 + ksub)
    val codes = ops.ProductQuantization.encode(vecs, "embedding", cb)
      .select("pq_code").as[Seq[Byte]].collect()
    assert(codes.forall(_.length == m))
    assert(codes.forall(_.forall(c => c >= -128 && c < -128 + ksub)))
    // with a generous candidate pool the reranked result IS the exact top-k
    val q = Array.tabulate(dim)(d => math.cos(d * 0.5))
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val pq = ops.ProductQuantization.topK(vecs, "vec_id", "embedding", q,
        k = 5, m = m, ksub = ksub, iters = 1, candidates = 200)
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == exact)
    // a 0-iteration codebook is exactly the lowest-id seed subvectors
    val cb0 = ops.ProductQuantization.train(vecs, "vec_id", "embedding", dim, m, ksub, iters = 0)
    val seed1 = vecs.filter($"vec_id" === 1L).select("embedding")
      .as[Seq[Float]].head().map(_.toDouble)
    assert(cb0.words(0)(0) == seed1.take(dim / m).toVector)
    intercept[IllegalArgumentException] {
      ops.ProductQuantization.train(vecs, "vec_id", "embedding", dim, m = 3, ksub, iters = 1)
    }
  }

  test("pq kernel argmin fast path == naive 6dp argmin at large-magnitude near-ties") {
    // The kernel's prefilter window must stay inclusive where
    // ulp(distance) exceeds the old fixed 1e-9 margin (>= ~1e7): sweep
    // candidate distances across the 6dp rounding cut at magnitudes up
    // to 1e9 and assert the fast path selects exactly what the naive
    // round-everything argmin (ties to the lower index) selects.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def round6(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    for (mag <- Seq(1.0e6, 1.0e7, 1.0e8, 1.0e9); step <- -8 to 8) {
      // raw min is codeword 1 at distance ~mag; codeword 0 sits delta
      // above it, with delta swept in ulp steps around the 5e-7 cut
      val delta = 5.0e-7 + step * Math.ulp(mag)
      val words = Array(Array(Array(0.0, 0.0), Array(delta, 0.0)))
      val kern = new graft.functions.PqKernel(2, 1, 2, words)
      val x = new GenericArrayData(Array[Any](mag + delta, 0.0))
      val naive = {
        val d = words(0).map { w =>
          val dx = (mag + delta) - w(0)
          round6(math.sqrt(dx * dx))
        }
        if (d(0) <= d(1)) 0 else 1 // argmin, ties to the lower index
      }
      val fast = kern.codes(x, isFloat = false)(0)
      assert(fast == naive,
        s"mag=$mag step=$step: fast=$fast naive=$naive (d0-d1 delta=$delta)")
    }
  }

  test("product quantization: clustered corpus — approx scan finds the right cluster") {
    import spark.implicits._
    val dim = 8
    // 4 well-separated axis clusters, 50 members each, small jitter
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(d =>
        (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Array.tabulate(dim)(d => if (d == 2) 1.0 else 0.0) // cluster 1's axis
    // tight candidate pool (= k): the approximate ranking alone must
    // already be cluster-correct for the rerank to equal exact top-k
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = ops.ProductQuantization.topK(vecs, "vec_id", "embedding", q,
        k = 10, m = 4, ksub = 8, iters = 2, candidates = 30)
      .select("vec_id").as[Long].collect().toSet
    assert((exact intersect pq).size >= 9, s"recall too low: $pq vs $exact")
    pq.foreach(id => assert(id % 4 == 1, s"vector $id is not from the query's cluster"))
  }

  test("matryoshka truncated-dim search: full pool == exact; prefix carries the cluster signal") {
    import spark.implicits._
    val dim = 8
    // clusters live in the FIRST 4 dims; the tail is per-item noise —
    // the MRL regime where the prefix is the coarse representation
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(d =>
        (if (d == c) 1.0f else 0.0f) +
          (if (d >= 4) (math.sin(i * 1.7 + d) * 0.3).toFloat
           else (math.sin(i * 1.7 + d) * 0.05).toFloat)))
    }.toDF("vec_id", "embedding")
    val q = Array.tabulate(dim)(d => if (d == 1) 1.0 else 0.0) // cluster 1's axis
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    // generous pool: reranked result IS the exact top-k
    val full = SimilaritySearch.matryoshkaTopK(vecs, "vec_id", "embedding", q,
        k = 10, dPrefix = 4, candidates = 200)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    // tight pool (a quarter of the corpus): the 4-dim prefix ranking
    // alone must keep the true neighbors — the MRL bet
    val tight = SimilaritySearch.matryoshkaTopK(vecs, "vec_id", "embedding", q,
        k = 10, dPrefix = 4, candidates = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert((exact.toSet intersect tight.toSet).size >= 9,
      s"prefix ranking lost the neighbors: $tight vs $exact")
    intercept[IllegalArgumentException] {
      SimilaritySearch.matryoshkaTopK(vecs, "vec_id", "embedding", q, 10, 0, 50)
    }
  }

  test("IVF-PQ: train/encode/query — residual codes, pruned scan, rerank = exact") {
    import spark.implicits._
    val dim = 8
    // 4 well-separated axis clusters, 50 members each, small jitter
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(d =>
        (if (d == c * 2) 1.0f else 0.0f) + (math.sin(i * 1.7 + d) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val model = ops.ProductQuantization.ivfPqTrain(vecs, "vec_id", "embedding",
      dim, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    assert(model.coarse.length == 4 && model.coarse.forall(_.length == dim))
    // training is partitioning-invariant (micro-snapped means, rounded
    // argmins) — the same model from any physical layout
    val model2 = ops.ProductQuantization.ivfPqTrain(vecs.repartition(7),
      "vec_id", "embedding", dim, kCoarse = 4, m = 4, ksub = 8, coarseIters = 3, pqIters = 2)
    assert(model == model2)
    val encoded = ops.ProductQuantization.ivfPqEncode(vecs, "vec_id", "embedding", model)
    // index row = (id, coarse cell, m residual code bytes)
    val rows = encoded.collect()
    assert(rows.forall(_.getSeq[Byte](2).length == 4))
    assert(rows.map(_.getInt(1)).distinct.sorted.forall(b => b >= 0 && b < 4))
    // a coarse cell must isolate each axis cluster after 3 Lloyd
    // iterations: all 50 members of a cluster share one bucket
    val bucketsPerCluster = rows.groupBy(_.getLong(0) % 4)
      .map { case (_, rs) => rs.map(_.getInt(1)).distinct.length }
    assert(bucketsPerCluster.forall(_ == 1))
    val q = Array.tabulate(dim)(d => if (d == 2) 1.0 else 0.0) // cluster 1's axis
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    // nProbe=1: the scan reads ONE cell (50 of 200 rows) and the
    // reranked result still equals the exact top-k
    val got = ops.ProductQuantization.ivfPqTopK(encoded, vecs, "vec_id",
        "embedding", model, q, 10, nProbe = 1, candidates = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
    // decode is the pure codeword copy: centroid + decode(codes) over
    // the encoded frame == reconstruct(residual) over the raw frame
    val cents = model.centroidFrame(spark)
    val viaCodes = encoded.join(cents, "bucket")
      .select($"vec_id", zip_with($"centroid",
        graft.functions.PqFunctions.pqDecode($"pq_code", model.cb.kernel),
        (c, r) => c + r).as("xhat"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val viaRaw = vecs
      .withColumn("xhat", zip_with(
        graft.functions.PqFunctions.pqReconstruct(
          zip_with($"embedding".cast("array<double>"),
            graft.functions.PqFunctions.pqReconstruct(
              $"embedding".cast("array<double>"), model.coarseKernel),
            (x, c) => x - c), model.cb.kernel),
        graft.functions.PqFunctions.pqReconstruct(
          $"embedding".cast("array<double>"), model.coarseKernel),
        (r, c) => r + c))
      .select($"vec_id", $"xhat")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(viaCodes.toSeq == viaRaw.toSeq)
  }

  test("as-of join: latest at-or-before match per key, nulls when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L), (4L, 30L, 10L))
      .toDF("event_id", "key", "ts")
    val right = Seq((10L, 90L, 1.0), (10L, 250L, 2.0), (10L, 260L, 3.0), (20L, 60L, 9.0))
      .toDF("key", "ts", "v")
    val out = graft.ops.TemporalJoins.asofJoin(left, right, "key", "ts", Seq("v"))
      .select($"event_id", $"asof_ts", $"asof_v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == ((Some(90L), Some(1.0))))   // latest before 100
    assert(out(2L) == ((Some(250L), Some(2.0))))  // exact tie counts ("at or before")
    assert(out(3L) == ((None, None)))             // right exists but only after
    assert(out(4L) == ((None, None)))             // key has no right rows
    // every left row survives exactly once
    assert(graft.ops.TemporalJoins.asofJoin(left, right, "key", "ts", Seq("v")).count() == 4)
  }

  test("as-of join: null value column comes from the MATCHED row, not an older one") {
    import spark.implicits._
    val left = Seq((1L, 10L, 300L)).toDF("event_id", "key", "ts")
    // the matched row (ts=250) has v=null; an older row (ts=90) has v=1.0.
    // ASOF semantics (DuckDB parity): take the matched row's null, never
    // backfill v from the older row while reporting asof_ts=250.
    val right = Seq((10L, 90L, Some(1.0)), (10L, 250L, None))
      .toDF("key", "ts", "v")
    val r = graft.ops.TemporalJoins.asofJoin(left, right, "key", "ts", Seq("v"))
      .select($"asof_ts", $"asof_v").head()
    assert(r.getLong(0) == 250L)
    assert(r.isNullAt(1))
  }

  test("point-in-interval join: containment pairs only, no dup from multi-bucket spans") {
    import spark.implicits._
    // interval A [100, 400) spans 4 grain-10 buckets; B [95, 105) spans 2;
    // key 2 has no points
    val intervals = Seq((1L, "A", 100L, 400L), (1L, "B", 95L, 105L), (2L, "C", 0L, 1000L))
      .toDF("key", "iv_name", "start_ts", "end_ts")
    val points = Seq((1L, 10L, 99L), (1L, 11L, 100L), (1L, 12L, 399L), (1L, 13L, 400L))
      .toDF("key", "pt_id", "ts")
    val out = graft.ops.TemporalJoins.pointInIntervalJoin(
        intervals, points, "key", "start_ts", "end_ts", "ts", grain = 10L)
      .select($"iv_name", $"pt_id").as[(String, Long)].collect().toSet
    // 99 ∈ B only; 100 ∈ A and B; 399 ∈ A; 400 excluded (end-exclusive)
    assert(out == Set(("B", 10L), ("A", 11L), ("B", 11L), ("A", 12L)))
    // exactly one row per containment — the bucketed join must not duplicate
    val n = graft.ops.TemporalJoins.pointInIntervalJoin(
      intervals, points, "key", "start_ts", "end_ts", "ts", grain = 10L).count()
    assert(n == 4)
    // negative-domain bucketing is exact (floor, not truncate-toward-zero)
    val negIv = Seq((1L, -25L, -5L)).toDF("key", "start_ts", "end_ts")
    val negPt = Seq((1L, 77L, -25L), (1L, 78L, -6L), (1L, 79L, -5L)).toDF("key", "pt_id", "ts")
    val neg = graft.ops.TemporalJoins.pointInIntervalJoin(
        negIv, negPt, "key", "start_ts", "end_ts", "ts", grain = 10L)
      .select($"pt_id").as[Long].collect().toSet
    assert(neg == Set(77L, 78L))
    // an interval wider than the bucket cap fails fast instead of exploding
    val wide = Seq((1L, 0L, 100000L)).toDF("key", "start_ts", "end_ts")
    val e = intercept[Exception] {
      graft.ops.TemporalJoins.pointInIntervalJoin(
        wide, negPt, "key", "start_ts", "end_ts", "ts", grain = 1L,
        maxBucketsPerInterval = 16).count()
    }
    assert(e.getMessage.contains("coarser grain"))
  }

  test("stratified sampling: rate membership is a pure id function; quota ranks stable") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")
    val kept = TextAnalytics.stratifiedSample(df, "id", "lang",
      rates = Map("en" -> 0.5), defaultRate = 1.0)
    // default-rate stratum keeps everything; rated stratum keeps a strict subset
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("zh") == 200L)
    assert(byLang("en") > 0L && byLang("en") < 200L)
    // determinism: same membership on re-run
    val again = TextAnalytics.stratifiedSample(df, "id", "lang",
      rates = Map("en" -> 0.5), defaultRate = 1.0)
    assert(kept.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
    // quota: exactly `quota` rows per stratum, ranks 1..quota, and the
    // two-stage prune returns the same set as a direct global sort
    val q = TextAnalytics.stratifiedQuota(df, "id", "lang", quota = 7, shards = 4)
    val got = q.select($"lang", $"sample_rank", $"id").as[(String, Int, Long)].collect()
    assert(got.count(_._1 == "en") == 7 && got.count(_._1 == "zh") == 7)
    assert(got.filter(_._1 == "en").map(_._2).sorted.toSeq == (1 to 7))
    val direct = df.withColumn("__h", TextAnalytics.portableIdHash(col("id")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("__h").asc, col("id").asc)))
      .filter(col("rk") <= 7).select($"lang", $"id").as[(String, Long)].collect().toSet
    assert(got.map(t => (t._1, t._3)).toSet == direct)
  }

  test("token budget sample: prefix cut, oversize blocker, shard prune == single window") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, ("w " * ((i % 7) + 1).toInt).trim, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "lang")
    // shards=1 IS the definition (one global cumsum window); the
    // sharded two-stage plan must reproduce it exactly, under any
    // physical partitioning
    val one = TextAnalytics.tokenBudgetSample(docs, "doc_id", "text", "lang",
        budget = 40, shards = 1)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    val many = TextAnalytics.tokenBudgetSample(docs.repartition(7), "doc_id",
        "text", "lang", budget = 40, shards = 8)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(one == many)
    assert(one.nonEmpty && one.forall(_._4 <= 40))
    // maximality: per stratum the NEXT doc in hash order would cross
    val keptIds = one.map(_._2)
    val inOrder = docs.withColumn("__h", TextAnalytics.portableIdHash(col("doc_id")))
      .withColumn("nt", graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .select($"lang", $"doc_id", $"nt", $"__h").as[(String, Long, Long, Long)]
      .collect().groupBy(_._1)
    inOrder.foreach { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val keptTok = one.filter(_._1 == lang).map(_._4).maxOption.getOrElse(0L)
      val firstDropped = ordered.find(r => !keptIds.contains(r._2))
      firstDropped.foreach(r => assert(keptTok + r._3 > 40,
        s"$lang: first dropped doc ${r._2} would still have fit"))
    }
    // prefix (not skip-and-continue) semantics: an oversize doc at the
    // head of the priority order blocks the whole stratum, even though
    // the next doc alone would fit. md5("1") < md5("2") so doc 1 is
    // first in hash order.
    val blocked = TextAnalytics.tokenBudgetSample(
      Seq((1L, ("x " * 100).trim, "z"), (2L, "a b", "z")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", budget = 10, shards = 4)
    assert(blocked.count() == 0)
  }

  test("quality filter: each rule trips on its planted document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a fine day in the sun"),
      (2L, "tiny doc"),
      (3L, "#### $$$$ %%%% {{{{ }}}} <<<< >>>> #### $$$$ %%%%"),
      (4L, "x y z w v u t s r q " * 40),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalytics.qualityFilter(docs, "text")
      .select($"doc_id", $"ok_word_count", $"ok_word_len", $"ok_symbol",
        $"ok_stopword", $"passes_quality")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._6)           // too few words
    assert(!out(3L)._4 && !out(3L)._6)           // symbol soup
    assert(!out(4L)._3 && !out(4L)._6)           // 1-char words
    assert(!out(5L)._2 && !out(5L)._6)           // empty text: no div-by-zero
  }

  test("funnel: strict ordering, per-step shrinkage, out-of-order users drop") {
    import spark.implicits._
    // u1 completes all three in order; u2 purchases BEFORE viewing (view
    // at 30 never precedes a later purchase) — depth 2; u3 never signs up
    val ev = Seq(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      (2L, "signup", 10L), (2L, "purchase", 20L), (2L, "view", 30L),
      (3L, "view", 10L), (3L, "purchase", 20L))
      .toDF("user_id", "event_type", "ts")
    val steps = Seq("signup", "view", "purchase")
    val f = graft.ops.EventAnalytics.funnel(ev, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (2 to 3).map(i => if (r.isNullAt(i - 1)) None else Some(r.getLong(i - 1)))).toMap
    assert(f.keySet == Set(1L, 2L)) // u3 absent: never entered the funnel
    val counts = graft.ops.EventAnalytics
      .funnelCounts(ev, "user_id", "event_type", "ts", steps)
      .select($"step_idx", $"n_users").as[(Int, Long)].collect().toMap
    assert(counts == Map(0 -> 2L, 1 -> 2L, 2 -> 1L))
    // same-timestamp events do NOT complete the next step (strict >)
    val tie = Seq((1L, "signup", 10L), (1L, "view", 10L)).toDF("user_id", "event_type", "ts")
    val tc = graft.ops.EventAnalytics
      .funnelCounts(tie, "user_id", "event_type", "ts", Seq("signup", "view"))
      .select($"step_idx", $"n_users").as[(Int, Long)].collect().toMap
    assert(tc == Map(0 -> 1L, 1 -> 0L))
  }

  test("funnelTiming: exact integer delta stats per transition") {
    import spark.implicits._
    // u1: a@10 b@25 c@30; u2: a@10 b@15 (no c); u3: b@5 only (never enters)
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 25L), (1L, "c", 30L),
      (2L, "a", 10L), (2L, "b", 15L), (3L, "b", 5L))
      .toDF("user_id", "event_type", "ts")
    val got = graft.ops.EventAnalytics
      .funnelTiming(ev, "user_id", "event_type", "ts", Seq("a", "b", "c"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    // a->b: u1 delta 15, u2 delta 5 -> n=2 sum=20 min=5 max=15
    assert(got(1) == ((2L, 20L, 5L, 15L)))
    // b->c: u1 delta 5 only
    assert(got(2) == ((1L, 5L, 5L, 5L)))
    // no converters -> count 0, null stats
    val none = graft.ops.EventAnalytics
      .funnelTiming(ev, "user_id", "event_type", "ts", Seq("a", "missing"))
      .collect().head
    assert(none.getLong(2) == 0L && none.isNullAt(3) && none.isNullAt(4))
  }

  test("funnelAgg: single-shuffle path equals the k-join funnel row-for-row") {
    import spark.implicits._
    // 200 synthetic users x 5 steps with hash-scattered types/ts: covers
    // skipped steps, out-of-order arrivals, repeated step events, ties
    val ev = spark.range(4000).selectExpr(
      "id % 200 AS user_id",
      "element_at(array('a','b','c','d','e','x'), CAST(pmod(hash(id, 1), 6) + 1 AS INT)) AS event_type",
      "CAST(pmod(hash(id, 2), 50) AS BIGINT) AS ts")
    val steps = Seq("a", "b", "c", "d", "e")
    val joinPath = graft.ops.EventAnalytics
      .funnel(ev, "user_id", "event_type", "ts", steps)
    val aggPath = graft.ops.EventAnalytics
      .funnelAgg(ev, "user_id", "event_type", "ts", steps)
    assert(aggPath.columns.toSeq == joinPath.columns.toSeq)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 6).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))).toSeq).sortBy(_.toString).toSeq
    assert(canon(aggPath) == canon(joinPath))
    // counts twin agrees too
    val cj = graft.ops.EventAnalytics
      .funnelCounts(ev, "user_id", "event_type", "ts", steps)
      .select($"step_idx", $"n_users").as[(Int, Long)].collect().toMap
    val ca = graft.ops.EventAnalytics
      .funnelCountsAgg(ev, "user_id", "event_type", "ts", steps)
      .select($"step_idx", $"n_users").as[(Int, Long)].collect().toMap
    assert(ca == cj)
    // buffer cap fail-fasts instead of silently dropping events
    val err = intercept[org.apache.spark.SparkException] {
      graft.ops.EventAnalytics.funnelAgg(ev, "user_id", "event_type", "ts",
        steps, maxEventsPerKey = 4).collect()
    }
    assert(err.getMessage.contains("maxEvents") ||
      err.getCause != null && err.getCause.getMessage.contains("maxEvents"))
  }

  test("cohort retention: first-day cohorts, distinct users per offset") {
    import spark.implicits._
    val day = 86400L
    // u1 active day 0 (twice) and day 2; u2 active day 1 only
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 2 * day), (2L, day + 5L))
      .toDF("user_id", "ts")
    val got = graft.ops.EventAnalytics
      .cohortRetention(ev, "user_id", "ts", dayUnits = day)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("kmeans: separable clusters recovered; deterministic tie + trajectory") {
    import spark.implicits._
    // two tight groups around (0,0) and (10,10); ids 1-2 seed the init
    val vecs = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(10.0f, 9.9f)),
      (3L, Array(0.1f, -0.1f)), (4L, Array(9.9f, 10.1f)),
      (5L, Array(0.2f, 0.0f)), (6L, Array(10.2f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Clustering.kmeans(vecs, "vec_id", "embedding",
        dim = 2, k = 2, iters = 3)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(out.size == 6)
    assert(Set(out(1L), out(3L), out(5L)).size == 1) // near-origin group together
    assert(Set(out(2L), out(4L), out(6L)).size == 1)
    assert(out(1L) != out(2L))
    // re-run: identical assignment (no rand anywhere)
    val again = graft.ops.Clustering.kmeans(vecs, "vec_id", "embedding",
        dim = 2, k = 2, iters = 3)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(again == out)
  }

  test("bm25: rarer term outranks common term; tf saturates; absent term scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark common common"), // high tf of rare term
      (2L, "spark common common common common common"),
      (3L, "common common common common common common"),
      (4L, "unrelated words only here")).toDF("doc_id", "text")
    val got = TextAnalytics.bm25Search(docs, "doc_id", "text",
        terms = Seq("spark"), topK = 10)
      .as[(Long, Double)].collect()
    // only docs containing 'spark' score > 0; higher tf ranks first
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 > got(1)._2)
    // saturation: quadrupled tf is worth far less than 4x the score
    assert(got(0)._2 < got(1)._2 * 4)
  }

  test("keepLatest/upsertMerge: newest version per key wins, no window in plan") {
    import spark.implicits._
    val base = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c")).toDF("k", "v", "payload")
    val latest = graft.ops.Upsert.keepLatest(base, Seq("k"), Seq("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(latest == Set((1L, 2L, "b"), (2L, 1L, "c")))
    val updates = Seq((2L, 5L, "c2"), (3L, 1L, "d")).toDF("k", "v", "payload")
    val merged = graft.ops.Upsert.upsertMerge(base, updates, Seq("k"), Seq("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(merged == Set((1L, 2L, "b"), (2L, 5L, "c2"), (3L, 1L, "d")))
    // the aggregation plan must partial-aggregate, not window-sort
    val plan = graft.ops.Upsert.keepLatest(base, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("rrf fusion: both-list docs outrank single-list; absent lists contribute nothing") {
    import spark.implicits._
    val bm = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val vec = Seq((12L, 1), (13L, 2)).toDF("id", "rank")
    val fused = graft.ops.HybridRetrieval.rrfFuse(Seq(bm, vec), "id", "rank")
      .as[(Long, Double, Long)].collect()
    // 12 appears in both lists (ranks 3 and 1) and must fuse on top
    assert(fused.head._1 == 12L && fused.head._3 == 2L)
    assert(math.abs(fused.head._2 - (1.0 / 63 + 1.0 / 61)) < 1e-12)
    // singles ranked by their own reciprocal rank: 10 (r1) > 11,13 (r2) > ...
    assert(fused.map(_._1).toSeq == Seq(12L, 10L, 11L, 13L))
    // the 11 vs 13 tie (both rank 2, same score) breaks by id
    assert(fused(2)._1 == 11L && fused(3)._1 == 13L)
  }

  test("unigram LM score: common-word docs outscore rare-word docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),     // only the most frequent word
      (2L, "the the rare1 rare2"), // half rare singletons
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalytics.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L)) // empty doc: no tokens, no row (not NaN)
    assert(got(1L)._2 == 4L && got(2L)._2 == 4L)
    assert(got(1L)._3 > got(2L)._3)
    // exact value: doc1 = ln(6/8) each token
    assert(math.abs(got(1L)._3 - BigDecimal(math.log(6.0 / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("content-defined chunking: lossless cover; prefix insert shifts only a prefix") {
    import spark.implicits._
    // fixture chosen for provable interior cut points: at n=8/divisor=32
    // this text has exactly 3 interior cuts (verified by replaying the
    // md5-prefix hash outside Spark) — the cut-count assertion below
    // keeps the fixture honest if the hash family ever changes
    val text = (0 until 12).map(i =>
      f"token$i%03d spark shuffles data partition${i % 7} across executors").mkString(" ")
    val docs = Seq((1L, text), (2L, "xyz " + text), (3L, "short"), (4L, "")).toDF("doc_id", "text")
    val out = TextAnalytics.contentDefinedChunks(docs, "doc_id", "text", n = 8, divisor = 32)
      .as[(Long, Long, String)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // chunks concatenate back to the exact input (lossless, in order)
    assert(byDoc(1L).mkString == text)
    assert(byDoc(1L).size == 4)       // 3 interior cuts => 4 chunks
    assert(byDoc(3L) == Seq("short")) // sub-n doc: one whole-text chunk
    assert(!byDoc.contains(4L))       // empty doc emits nothing
    // CDC property: the prefix edit changes chunking only BEFORE the
    // first shared boundary — the chunk multiset tail is identical
    val c1 = byDoc(1L); val c2 = byDoc(2L)
    val shared = c1.toSet.intersect(c2.toSet)
    assert(shared.nonEmpty && c1.takeRight(shared.size) == c2.takeRight(shared.size))
    // a fixed-size chunker would share nothing after a 4-char shift
    assert(graft.functions.Chunker.chunkFixed("xyz " + text, 64).map(_.text)
      .toSet.intersect(graft.functions.Chunker.chunkFixed(text, 64).map(_.text).toSet).isEmpty)
  }

  test("cdc dedup stats: prefix-edited copies reuse >50% of chunks") {
    import spark.implicits._
    // long docs (~40 expected chunks at divisor 64) so the single
    // re-cut first chunk is a small fraction of each edited copy
    val docs = (1 to 6).map { d =>
      (d.toLong, (0 until 40).map(i =>
        f"doc$d%02d token$i%03d spark shuffles data partition${(d * i) % 7} across executors").mkString(" "))
    }.toDF("doc_id", "text")
    val row = TextAnalytics.cdcDedupStats(docs, "doc_id", "text",
        editPrefix = "prefix edit ", n = 8, divisor = 64)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    val (total, orig, edited, surviving, reused, reusePct) = row
    assert(total == orig + edited)
    assert(orig > 0 && edited > 0)
    // the defining property: most edited-copy chunks are byte-identical
    // to an original chunk, so chunk-level dedup collapses them
    assert(reusePct > 0.5, s"reuse_pct=$reusePct (reused=$reused/$edited)")
    assert(surviving < total) // dedup actually removed duplicates
  }

  test("doc centroids: unit-norm per-group means; zero group unnormalized") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Array(1.0f, 0.0f)), (2L, "a", Array(0.0f, 1.0f)),
      (3L, "b", Array(2.0f, 0.0f)),
      (4L, "z", Array(1.0f, -1.0f)), (5L, "z", Array(-1.0f, 1.0f))) // zero mean
      .toDF("id", "grp", "vec")
    val got = SimilaritySearch.docCentroids(df, "grp", "vec", dim = 2)
      .as[(String, Seq[Double])].collect().toMap
    val s = 1.0 / math.sqrt(2.0)
    assert(got("a").zip(Seq(s, s)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    assert(got("b") == Seq(1.0, 0.0))
    assert(got("z") == Seq(0.0, 0.0)) // zero vector stays, no NaN
  }

  test("brute-force top-k returns k best, deterministic tiebreak") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(-1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding",
      Array(1.0, 0.0), 3).select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 4L, 2L)) // ties (1,4) broken by id
  }

  test("LSH top-k: query bucket contains its own vector; recall on clones") {
    val base = Array.fill(8)(0.5f)
    val vecs = (1L to 20L).map { i =>
      (i, base.map(x => x + (i % 5).toFloat * 0.01f))
    }.toDF("vec_id", "embedding")
    val q = base.map(_.toDouble)
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val approx = SimilaritySearch.lshTopK(vecs, "vec_id", "embedding", 8, q, 5,
      numPlanes = 4, probeHamming = 4) // full probe = exact
    assert(approx.select("vec_id").as[Long].collect().toSet == exact)
  }

  test("IVF top-k: full probe = exact; pruned probe returns <= k from probed buckets") {
    val base = Array.fill(8)(0.5f)
    val vecs = (1L to 40L).map { i =>
      (i, base.map(x => x + (i % 7).toFloat * 0.02f - (if (i % 3 == 0) 0.9f else 0f)))
    }.toDF("vec_id", "embedding")
    val q = base.map(_.toDouble)
    val exact = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    // probing every bucket (nProbe = 2^planes) must equal brute force
    val full = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", 8, q, 5,
      numPlanes = 3, nProbe = 8)
    assert(full.select("vec_id").as[Long].collect().toSet == exact)
    // pruned probe: still k rows, each from the probed (nearest-centroid) set
    val pruned = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", 8, q, 5,
      numPlanes = 3, nProbe = 2)
    assert(pruned.count() <= 5)
  }

  test("IVF upsert: replace + insert + bucket move == full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_upsert").toString
    val dim = 8
    def mk(i: Long, neg: Boolean): (Long, Array[Float]) =
      (i, Array.tabulate(dim)(d =>
        (math.sin(i * 13.0 + d) * (if (neg) -1 else 1)).toFloat))
    val base = (1L to 100L).map(mk(_, neg = false)).toDF("vec_id", "embedding")
    SimilaritySearch.ivfWrite(base, dir, "embedding", dim, numPlanes = 3)

    // every member of vector 1's bucket moves out (negation flips every
    // plane sign -> a different bucket), plus 10 fresh inserts
    val stored = spark.read.parquet(s"$dir/vectors")
      .select($"vec_id", $"bucket".cast("long")).as[(Long, Long)].collect().toMap
    val bucketB = stored(1L)
    val movers = stored.collect { case (id, b) if b == bucketB => id }.toSeq
    // fresh inserts chosen OUTSIDE bucket B so the move leaves it empty
    val inserts = (1000L to 1040L).map(mk(_, neg = false))
      .toDF("vec_id", "embedding")
      .withColumn("b", SimilaritySearch.lshBucketColumn($"embedding", dim, 3))
      .filter($"b" =!= bucketB).drop("b")
      .limit(10).as[(Long, Array[Float])].collect().toSeq
    assert(inserts.size == 10)
    val upserts = (movers.map(mk(_, neg = true)) ++ inserts)
      .toDF("vec_id", "embedding")
    SimilaritySearch.ivfUpsert(spark, dir, upserts, "vec_id", "embedding", dim, 3)

    val after = spark.read.parquet(s"$dir/vectors")
      .select($"vec_id", $"bucket".cast("long"), $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    assert(after.length == 110 && after.map(_._1).distinct.length == 110,
      "one row per id: replaced, not duplicated")
    movers.foreach { id =>
      val row = after.find(_._1 == id).get
      assert(row._2 != bucketB, "moved id left its old bucket")
      assert(row._3(0) == -math.sin(id * 13.0 + 0).toFloat, "new vector won")
    }
    // the emptied bucket is gone: no rows, no partition dir, no centroid
    assert(!after.exists(_._2 == bucketB))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/vectors/bucket=$bucketB")))
    val centroidBuckets = spark.read.parquet(s"$dir/centroids")
      .select($"bucket").as[Long].collect().toSet
    assert(!centroidBuckets.contains(bucketB))

    // equivalence with a from-scratch build of the same logical corpus
    val logical = base.filter(!$"vec_id".isin(movers: _*))
      .unionByName(upserts)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_rebuild").toString
    SimilaritySearch.ivfWrite(logical, dir2, "embedding", dim, numPlanes = 3)
    def canonVecs(d: String) = spark.read.parquet(s"$d/vectors")
      .select($"vec_id", $"bucket".cast("long"), $"embedding")
      .as[(Long, Long, Array[Float])].collect()
      .map { case (i, b, v) => (i, b, v.toSeq) }.sortBy(_._1).toSeq
    assert(canonVecs(dir) == canonVecs(dir2))
    def canonCentroids(d: String) = spark.read.parquet(s"$d/centroids")
      .select($"bucket", $"n_vectors", $"centroid")
      .as[(Long, Long, Array[Double])].collect().sortBy(_._1)
    val (cu, cr) = (canonCentroids(dir), canonCentroids(dir2))
    assert(cu.map(c => (c._1, c._2)).toSeq == cr.map(c => (c._1, c._2)).toSeq)
    cu.zip(cr).foreach { case (a, b) =>
      a._3.zip(b._3).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    val q = Array.tabulate(dim)(d => math.cos(d.toDouble))
    val topU = SimilaritySearch.ivfTopKStored(spark, dir, "vec_id", "embedding", q, 5, 8)
      .select("vec_id").as[Long].collect().toSeq
    val topR = SimilaritySearch.ivfTopKStored(spark, dir2, "vec_id", "embedding", q, 5, 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(topU == topR)

    // compaction: repeated upserts fragment bucket partitions; compact
    // rewrites only oversized buckets to one file each, content unchanged
    def bucketFiles(): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(s"$dir/vectors")
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.list(p).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))).toMap
    }
    SimilaritySearch.ivfUpsert(spark,  dir,
      (2000L to 2004L).map(mk(_, neg = false)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim, 3)
    assert(bucketFiles().values.exists(_ > 1), "upserts fragment buckets")
    val before = canonVecs(dir)
    SimilaritySearch.ivfCompact(spark, dir)
    assert(bucketFiles().values.forall(_ == 1), "compaction leaves one file per bucket")
    assert(canonVecs(dir) == before, "compaction preserves content")
  }

  test("inverted index: bm25SearchIndexed == bm25Search; only term buckets read") {
    val docs = Seq(
      (1L, "spark join window spark spark"),
      (2L, "join join join window nothing else here"),
      (3L, "completely unrelated words about databases"),
      (4L, ""),                          // empty doc: counts for N/avgdl
      (5L, "window window spark")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "join", "absentterm")
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx").toString
    graft.ops.InvertedIndex.write(docs, "doc_id", "text", dir, numBuckets = 16)
    val scan = TextAnalytics.bm25Search(docs, "doc_id", "text", terms, topK = 10)
      .as[(Long, Double)].collect().toSeq
    val indexed = graft.ops.InvertedIndex.bm25SearchIndexed(spark, dir, terms, topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(indexed == scan, "indexed path must reproduce the scan path exactly")
    // the postings scan prunes to the query terms' hash buckets
    val plan = graft.ops.InvertedIndex.bm25SearchIndexed(spark, dir, terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
  }

  test("inverted index removeDocs: bit-identical to a rebuild without the docs; idempotent") {
    val docs = Seq(
      (1L, "spark join window spark spark"),
      (2L, "join join join window nothing else here"),
      (3L, "completely unrelated words about databases"),
      (4L, "window window spark"),
      (5L, "spark alone")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx_rm").toString
    graft.ops.InvertedIndex.write(docs, "doc_id", "text", dir, numBuckets = 16)
    // remove docs 2 and 5 (their text, as the deleting pipeline has it)
    graft.ops.InvertedIndex.removeDocs(spark, dir,
      docs.filter($"doc_id".isin(2L, 5L)), "doc_id", "text")
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_invidx_rb").toString
    graft.ops.InvertedIndex.write(docs.filter(!$"doc_id".isin(2L, 5L)),
      "doc_id", "text", rebuilt, numBuckets = 16)
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .select($"term", $"doc_id", $"dl", $"tf", $"bucket".cast("long"))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .select($"n", $"avgdl", $"num_buckets", $"sum_dl") // fence col aside
      .as[(Double, Double, Int, Long)].head()
    assert(postings(dir) == postings(rebuilt), "postings must match a rebuild")
    assert(stats(dir) == stats(rebuilt), "stats row must be bit-identical")
    val terms = Seq("spark", "join", "window")
    val a = graft.ops.InvertedIndex.bm25SearchIndexed(spark, dir, terms, topK = 10)
      .as[(Long, Double)].collect().toSeq
    val b = graft.ops.InvertedIndex.bm25SearchIndexed(spark, rebuilt, terms, topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(a == b, "scores must match the rebuild")
    // replayed removal (ids no longer present) is a no-op
    graft.ops.InvertedIndex.removeDocs(spark, dir,
      docs.filter($"doc_id".isin(2L, 5L)), "doc_id", "text")
    assert(postings(dir) == postings(rebuilt) && stats(dir) == stats(rebuilt),
      "replay must change nothing")
  }

  test("inverted index removeDocs: zero-term victims shrink n like a rebuild (no bucket touched)") {
    import graft.ops.InvertedIndex
    val docs = Seq((1L, "alpha beta"), (2L, "   "), (3L, "beta gamma"),
      (4L, "")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx_zt").toString
    InvertedIndex.write(docs, "doc_id", "text", dir, numBuckets = 8)
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .select($"n", $"avgdl", $"num_buckets", $"sum_dl")
      .as[(Double, Double, Int, Long)].head()
    // the build counted both empty docs into n (dl = 0)
    assert(stats(dir)._1 == 4.0 && stats(dir)._4 == 4L)
    // removing one empty doc touches no hash bucket but must still
    // decrement n, or avgdl/idf drift from a rebuild without the doc
    InvertedIndex.removeDocs(spark, dir,
      docs.filter($"doc_id" === 2L), "doc_id", "text")
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_invidx_ztr").toString
    InvertedIndex.write(docs.filter($"doc_id" =!= 2L), "doc_id", "text",
      rebuilt, numBuckets = 8)
    assert(stats(dir) == stats(rebuilt), s"${stats(dir)} vs ${stats(rebuilt)}")
    val a = InvertedIndex.bm25SearchIndexed(spark, dir, Seq("beta"))
      .as[(Long, Double)].collect().toSeq
    val b = InvertedIndex.bm25SearchIndexed(spark, rebuilt, Seq("beta"))
      .as[(Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty, "scores must match the rebuild")
    // a mixed batch (one empty + one posting doc) also matches a rebuild
    InvertedIndex.removeDocs(spark, dir,
      docs.filter($"doc_id".isin(3L, 4L)), "doc_id", "text")
    val rebuilt2 = java.nio.file.Files.createTempDirectory("graft_invidx_ztr2").toString
    InvertedIndex.write(docs.filter($"doc_id" === 1L), "doc_id", "text",
      rebuilt2, numBuckets = 8)
    assert(stats(dir) == stats(rebuilt2), s"${stats(dir)} vs ${stats(rebuilt2)}")
  }

  test("inverted index replay fence: redelivered append/cdc batch ids are no-ops") {
    import graft.ops.InvertedIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx_fence").toString
    InvertedIndex.write(Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), "doc_id", "text", dir, numBuckets = 8)
    def rawStats() = spark.read.parquet(s"$dir/stats").collect().head
    assert(rawStats().getLong(4) == -1L, "fresh build carries fence -1")
    // fenced append applies once and records its batch id
    val add = Seq((3L, "gamma delta")).toDF("doc_id", "text")
    InvertedIndex.appendDocs(spark, dir, add, "doc_id", "text", batchId = 0L)
    val s1 = rawStats()
    assert(s1.getDouble(0) == 3.0 && s1.getLong(4) == 0L)
    // redelivered trigger: same id merges nothing (postings included)
    InvertedIndex.appendDocs(spark, dir, add, "doc_id", "text", batchId = 0L)
    assert(rawStats() == s1, "replayed append must be a no-op")
    assert(spark.read.parquet(s"$dir/postings")
      .filter($"doc_id" === 3L).count() == 2L, "no doubled postings")
    // cdc batch applies once under its id, replay is a whole-batch no-op
    val changes = Seq(("delete", 1L, "alpha beta", null.asInstanceOf[String]))
      .toDF("op", "doc_id", "text_before", "text_after")
    InvertedIndex.applyCdc(spark, dir, changes, "doc_id", batchId = 1L)
    val s2 = rawStats()
    assert(s2.getDouble(0) == 2.0 && s2.getLong(4) == 1L)
    InvertedIndex.applyCdc(spark, dir, changes, "doc_id", batchId = 1L)
    assert(rawStats() == s2, "replayed cdc must be a no-op")
    // an unfenced (batch) call still works and leaves the fence alone
    InvertedIndex.appendDocs(spark, dir,
      Seq((9L, "zeta")).toDF("doc_id", "text"), "doc_id", "text")
    assert(rawStats().getDouble(0) == 3.0 && rawStats().getLong(4) == 1L)
  }

  test("decontamination: flags docs sharing word n-grams with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // contains bench gram
      (2L, "a completely original sentence with no overlap here at all"),
      (3L, "quick brown fox jumps over nothing important")) // 5-gram overlap via prefix
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps over a fence"))
      .toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "the quick brown fox jumps" + "quick brown fox jumps over";
    // doc 3 shares "quick brown fox jumps over"; doc 2 clean
    assert(flagged.keySet == Set(1L, 3L))
    assert(flagged(1L) == 2L && flagged(3L) == 1L)
    // docs shorter than n words emit no grams and cannot be flagged
    val shortDoc = Seq((9L, "quick brown fox")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(shortDoc, "doc_id", "text", bench, "doc_id", "text", n = 5)
      .count() == 0L)
  }

  test("repetition stats: boilerplate scores high, varied text low") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight entirely distinct words compose this small sentence")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.repetitionStats(df, "doc_id", "text", gramN = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (top1, distinct1, dup1) = got(1L)
    assert(top1 == 1.0 && distinct1 == 0.125)
    assert(dup1 > 0.8) // 6 grams, 1 distinct -> 5/6 duplicated
    val (top2, distinct2, dup2) = got(2L)
    assert(top2 == 0.125 && distinct2 == 1.0 && dup2 == 0.0)
  }

  test("pii redaction: sequential counts, ip not double-counted as phone") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail alice.smith@corp.example.org server 10.0.255.7 call +14155550101 done"),
      (2L, "no pii in this text at all")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.redactPii(df, "text")
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "redacted")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    val ((e1, i1, p1), red1) = got(1L)
    assert((e1, i1, p1) == ((1L, 1L, 1L)))
    assert(red1 == "mail <EMAIL> server <IP> call <PHONE> done")
    val ((e2, i2, p2), red2) = got(2L)
    assert((e2, i2, p2) == ((0L, 0L, 0L)) && red2 == "no pii in this text at all")
  }

  test("top n-grams: occurrence + doc counts, deterministic order") {
    import spark.implicits._
    val df = Seq(
      (1L, "to be or not to be"),
      (2L, "to be or something else entirely")).toDF("doc_id", "text")
    val top = TextAnalytics.topNgrams(df, "doc_id", "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top.head == (("to be or", 2L, 2L))) // in both docs
    assert(top.map(_._1).distinct.size == 3)
  }

  test("tfidf keywords: corpus-common words rank below distinctive ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "shared shared shared unique1 unique1 unique1 unique1"),
      (2L, "shared other2"),
      (3L, "shared other3")).toDF("doc_id", "text")
    val kw = TextAnalytics.tfidfKeywords(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    // 'shared' is in every doc -> idf 0 -> never the top keyword
    assert(kw.find(t => t._1 == 1L && t._3 == 1).get._2 == "unique1")
    assert(kw.find(t => t._1 == 2L && t._3 == 1).get._2 == "other2")
    assert(kw.find(t => t._1 == 3L && t._3 == 1).get._2 == "other3")
  }

  test("language id: marker argmax with en-first tiebreak, und on none") {
    val df = Seq(
      (1L, "the cat and the hat of a house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "xxxx yyyy zzzz")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalytics.langIdColumn($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "und")
  }

  test("token count + page range formatting") {
    assert(TextFunctions.formatPageRanges(Seq(1, 2, 3, 7, 9, 10)) == "1-3, 7, 9-10")
    assert(TextFunctions.formatPageRanges(Nil) == "")
    val n = Seq("  a b   c  ").toDF("t")
      .select(TextFunctions.tokenCount($"t")).head().getInt(0)
    assert(n == 3)
    assert(Seq("").toDF("t").select(TextFunctions.tokenCount($"t")).head().getInt(0) == 0)
  }

  test("multimodal: real image resize + batched feature extraction shapes") {
    val df = Seq((1L, MediaFixture.png(40, 25)), (2L, MediaFixture.jpeg(17, 9)),
      (3L, Array.emptyByteArray)).toDF("id", "payload")
    val resized = Multimodal.resize(df, "payload", 64, 32)
    assert(resized.columns.contains("resized"))
    assert(resized.select($"resize_dims.width").as[Int].head() == 64)
    // real images re-encode as PNG at exactly the target dims;
    // undecodable payloads resize to empty bytes
    val rz = resized.select($"id", $"resized").as[(Long, Array[Byte])].collect().toMap
    Seq(1L, 2L).foreach { id =>
      assert(MediaFixture.dims(rz(id)) == (64, 32), s"id=$id")
    }
    assert(rz(3L).isEmpty)
    // deterministic: resize encodes to identical bytes on a second run
    val rz2 = Multimodal.resize(df, "payload", 64, 32)
      .select($"id", $"resized").as[(Long, Array[Byte])].collect().toMap
    assert(rz(1L).sameElements(rz2(1L)))
    val feats = Multimodal.extractFeatures(df, "payload", dim = 16, batchSize = 2)
    assert(feats.columns.toSeq == Seq("id", "payload", "features"))
    val vecs = feats.select($"id", $"features").as[(Long, Array[Float])].collect().toMap
    assert(vecs.size == 3)
    vecs.values.foreach { v =>
      assert(v.length == 16)
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    }
    // deterministic: same payload -> same features
    val again = Multimodal.extractFeatures(df, "payload", dim = 16)
      .select($"id", $"features").as[(Long, Array[Float])].collect().toMap
    vecs.foreach { case (k, v) => assert(v.sameElements(again(k))) }
  }

  test("multimodal: real image header decode + frame sampling shapes") {
    val pngBytes = MediaFixture.png(123, 45)
    val df = Seq(
      (1L, pngBytes),
      (2L, MediaFixture.jpeg(31, 62)),
      (3L, "not an image at all, just text".getBytes("UTF-8")),
      (4L, pngBytes.take(12)), // PNG magic present, header truncated
      (5L, Array.emptyByteArray)).toDF("doc_id", "payload")
    val meta = Multimodal.withMediaMetadata(df, "payload")
    val m = meta.select("doc_id", "byte_size", "width", "height", "format")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(m(1L) == ((pngBytes.length.toLong, 123, 45, "png")))
    assert(m(2L)._2 == 31 && m(2L)._3 == 62 && m(2L)._4 == "jpeg")
    assert(m(3L)._2 == 0 && m(3L)._4 == "unknown")
    assert(m(4L)._4 == "corrupt")
    assert(m(5L) == ((0L, 0, 0, "empty")))
    // deterministic: same input -> same decode
    val again = Multimodal.withMediaMetadata(df, "payload")
      .select("doc_id", "width").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again(1L) == 123)
    // frame sampling: a real 3-frame AVI, stride 2 -> container
    // ordinals 0 and 2 with the exact muxed payloads; non-AVI rows
    // contribute no frames
    val avi = Multimodal.muxAvi(8, 8, 40000L,
      Seq("frame-zero".getBytes, "frame-one!".getBytes, "frame-two?".getBytes))
    val fdf = Seq((1L, avi), (2L, "y".getBytes)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(fdf, "doc_id", "payload", stride = 2)
      .select($"doc_id", $"frame_index", $"frame_bytes")
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(f => (f._1, f._2)).toSeq == Seq((1L, 0), (1L, 2)))
    assert(new String(frames(0)._3) == "frame-zero")
    assert(new String(frames(1)._3) == "frame-two?")
  }

  test("avi container: byte-level fixture parse, mux/demux round trip, truncation, mjpeg composition") {
    import graft.ops.Multimodal
    // --- independent hand-built AVI (not via the muxer): RIFF/LIST
    // offsets written explicitly so the parser is checked against the
    // SPEC, not against its own writer ---
    val f0 = "AAAA".getBytes("US-ASCII")
    val f1 = "BBBBB".getBytes("US-ASCII") // odd length: pad byte follows
    val handBytes = {
      val bb = new java.io.ByteArrayOutputStream()
      def t(s: String) = bb.write(s.getBytes("US-ASCII"), 0, 4)
      def w32(v: Int) = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff); bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff) }
      // avih payload: usPerFrame=50000, 7 dwords, width=320, height=240, 4 reserved
      val avihLen = 56
      val strhLen = 56; val strfLen = 40
      val strlLen = 4 + (8 + strhLen) + (8 + strfLen)
      val hdrlLen = 4 + (8 + avihLen) + (8 + strlLen)
      val moviLen = 4 + (8 + f0.length) + (8 + f1.length + 1) // +1 pad
      val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
      t("RIFF"); w32(riffLen); t("AVI ")
      t("LIST"); w32(hdrlLen); t("hdrl")
      t("avih"); w32(avihLen)
      w32(50000); w32(0); w32(0); w32(0x10); w32(2); w32(0); w32(1); w32(0)
      w32(320); w32(240); w32(0); w32(0); w32(0); w32(0)
      t("LIST"); w32(strlLen); t("strl")
      t("strh"); w32(strhLen)
      t("vids"); t("MJPG"); w32(0); w32(0); w32(0)
      w32(50000); w32(1000000); w32(0); w32(2); w32(0); w32(-1); w32(0); w32(0); w32(0)
      t("strf"); w32(strfLen)
      w32(40); w32(320); w32(240); w32(1 | (24 << 16)); t("MJPG")
      w32(320 * 240 * 3); w32(0); w32(0); w32(0); w32(0)
      t("LIST"); w32(moviLen); t("movi")
      t("00dc"); w32(f0.length); bb.write(f0, 0, f0.length)
      t("00dc"); w32(f1.length); bb.write(f1, 0, f1.length); bb.write(0) // pad
      bb.toByteArray
    }
    val meta = Multimodal.aviMeta(handBytes)
    assert(meta == Multimodal.AviMeta(320, 240, 50000L, 2L, "MJPG", "avi"))
    val got = Multimodal.aviFrames(handBytes)
    assert(got.length == 2 && new String(got(0)) == "AAAA" && new String(got(1)) == "BBBBB")
    // --- muxer round trip, incl. odd-length frames and empty set ---
    val frames = Seq("x".getBytes, "yy".getBytes, "zzz".getBytes, "!".getBytes)
    val muxed = Multimodal.muxAvi(64, 48, 40000L, frames)
    assert(Multimodal.aviMeta(muxed) == Multimodal.AviMeta(64, 48, 40000L, 4L, "MJPG", "avi"))
    assert(Multimodal.aviFrames(muxed).map(new String(_)) == Seq("x", "yy", "zzz", "!"))
    assert(Multimodal.aviFrames(Multimodal.muxAvi(8, 8, 1L, Seq.empty)).isEmpty)
    // --- truncation-safe: cutting mid-frame keeps the frames before it ---
    val cut = java.util.Arrays.copyOf(muxed, muxed.length) // find 'zzz' chunk & cut inside
    val zzzPos = {
      var i = 0; var found = -1
      while (found < 0 && i < cut.length - 3) {
        if (cut(i) == 'z' && cut(i + 1) == 'z' && cut(i + 2) == 'z') found = i
        i += 1
      }
      found
    }
    assert(zzzPos > 0)
    val truncated = java.util.Arrays.copyOfRange(muxed, 0, zzzPos + 1) // mid-chunk
    assert(Multimodal.aviFrames(truncated).map(new String(_)) == Seq("x", "yy"))
    // --- garbage / empty never throw ---
    assert(Multimodal.aviFrames("garbage".getBytes).isEmpty)
    assert(Multimodal.aviMeta(Array.emptyByteArray).format == "empty")
    assert(Multimodal.aviMeta("RIFFxxxxWAVE".getBytes).format == "unknown")
    // --- MJPEG composition: real JPEG frames demux into decodable
    // images (the sampled-frame -> image-op pipeline) ---
    val jpegAvi = Multimodal.muxAvi(31, 62, 40000L,
      Seq(MediaFixture.jpeg(31, 62), MediaFixture.jpeg(31, 62)))
    val jdf = Seq((1L, jpegAvi)).toDF("doc_id", "payload")
    val sampled = Multimodal.sampleFrames(jdf, "doc_id", "payload", stride = 1)
    val dims = Multimodal.withMediaMetadata(sampled, "frame_bytes")
      .select($"frame_index", $"width", $"height", $"format")
      .as[(Int, Int, Int, String)].collect().sortBy(_._1)
    assert(dims.toSeq == Seq((0, 31, 62, "jpeg"), (1, 31, 62, "jpeg")))
  }

  test("kmeansSharded: equals per-shard classic kmeans; verbatim dups co-shard; bits formula") {
    import graft.ops.Clustering
    val vecs = (1L to 200L).map { i =>
      // ids 151..160 are verbatim copies of ids 1..10 (dup co-shard check)
      val src = if (i > 150 && i <= 160) i - 150 else i
      (i, Array.tabulate(8)(d => math.sin(src * 0.37 + d * 1.13).toFloat))
    }.toDF("vec_id", "embedding")
    val bits = 2
    val sharded = Clustering.kmeansSharded(vecs, "vec_id", "embedding",
        dim = 8, k = 3, iters = 2, shardBits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sharded.length == 200)
    val byId = sharded.map(t => t._1 -> (t._2, t._3)).toMap
    (1L to 10L).foreach { i =>
      assert(byId(i) == byId(i + 150L),
        s"verbatim duplicate $i / ${i + 150} must share (shard, cluster)") }
    // independent replay: shard via signShard, then CLASSIC kmeans
    // inside each shard — the sharded op must be exactly that
    val withShard = vecs.withColumn("__s",
      Clustering.signShard(col("embedding").cast("array<double>"), bits, 8))
    val shards = withShard.select("__s").distinct().collect().map(_.getLong(0))
    assert(shards.length > 1, "test data must actually spread over shards")
    val expect = shards.flatMap { s =>
      Clustering.kmeans(withShard.filter(col("__s") === s),
          "vec_id", "embedding", dim = 8, k = 3, iters = 2)
        .collect().map(r => (r.getLong(0), s, r.getInt(1)))
    }
    assert(sharded.toSet == expect.toSet,
      "sharded assignment must equal per-shard classic kmeans")
    // the oracle's integer bits formula == the Queries formula
    def bitsOf(n: Long): Int = if (n <= 2048L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros((n - 1L) / 2048L)
    assert(Seq(1L, 500L, 2000L, 2048L, 2049L, 4096L, 4097L, 20000L, 200000L)
      .map(bitsOf) == Seq(0, 0, 0, 0, 1, 1, 2, 4, 7))
  }

  test("semantic dedup sharded: identical vectors dedup across the sharded path") {
    def v(xs: Double*): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    // 40 spread vectors + verbatim dups of ids 1 and 2 at high ids
    val base = (1L to 40L).map(i =>
      (i, v(math.cos(i * 0.7), math.sin(i * 0.7), math.cos(i * 0.3), 0.4)))
    val dups = Seq((41L, base(0)._2.clone()), (42L, base(1)._2.clone()))
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2, threshold = 0.999, shardBits = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.size == 42)
    assert(out(1L)._2 && out(2L)._2, "lowest id of each dup group survives")
    assert(!out(41L)._2 && !out(42L)._2,
      "verbatim dups always co-shard (identical dots => identical signs) and drop")
    assert(out(1L)._1 == out(41L)._1 && out(2L)._1 == out(42L)._1)
  }

  test("semantic dedup: within-cell min-id survivor; cross-cell near-dups untouched") {
    def v(xs: Double*): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    // two clean cells seeded by the two lowest ids (kmeans init rule);
    // 3 dups 1, 5 dups 2; 4 and 6 are same-cell but below threshold
    val vecs = Seq(
      (1L, v(1, 0, 0, 0)), (2L, v(0, 1, 0, 0)),
      (3L, v(0.99, 0.05, 0, 0)), (4L, v(0.8, 0.6, 0, 0)),
      (5L, v(0.05, 0.99, 0, 0)), (6L, v(0.6, 0.8, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.size == 6)
    assert(out(1L)._2 && out(2L)._2, "lowest id of each dup group survives")
    assert(!out(3L)._2 && !out(5L)._2, "higher-id near-dups dropped")
    assert(out(4L)._2 && out(6L)._2, "below-threshold cellmates kept")
    assert(out(1L)._1 == out(3L)._1 && out(2L)._1 == out(5L)._1,
      "dup pairs landed in the same cell")
    // quadratic-cell guard fails fast instead of running C(cell,2)
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(vecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 1, threshold = 0.95, maxCell = 2)
    }
  }

  test("shard assign: dense 0-based positions per shard, stable across runs") {
    val df = (1L to 100L).toDF("doc_id")
    val out = TextAnalytics.shardAssign(df, "doc_id", numShards = 4)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 100)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        "positions are a dense 0-based sequence within each shard")
    }
    val again = TextAnalytics.shardAssign(df, "doc_id", numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "deterministic")
  }

  test("temperature mixing: T=1 is proportional; T>1 up-samples small groups") {
    val docs = ((1L to 90L).map(i => (i, "big")) ++ (91L to 100L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    // T=1: q_g = p_g, so every group keeps exactly sampleFrac of the
    // hash space (bp = 5000) — realized counts match a direct hash scan
    val t1 = TextAnalytics.mixTemperature(docs, "doc_id", "lang", 1.0, 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = docs
      .filter(pmod(TextAnalytics.portableIdHash($"doc_id"), lit(10000)) < 5000)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t1 == direct)
    // T=2: the small group's keep-RATE strictly exceeds the big group's
    val t2 = TextAnalytics.mixTemperature(docs, "doc_id", "lang", 2.0, 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t2("small").toDouble / 10 > t2("big").toDouble / 90)
  }

  test("length histogram: power-of-two buckets, integer-exact") {
    val docs = Seq("", "one", "two words", "now three words",
      "a b c d e f g", "a b c d e f g h").toDF("text")
    val m = TextAnalytics.lengthHistogram(docs, "text")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // tokens: 0 -> bucket 0; 1 -> 1; 2,3 -> 2; 7 -> 3; 8 -> 4
    assert(m == Map(0 -> (1L, 0L), 1 -> (1L, 1L), 2 -> (2L, 5L),
      3 -> (1L, 7L), 4 -> (1L, 8L)))
  }

  test("linear probe: sigmoid scoring map-only, threshold on rounded score") {
    val w = Array(1.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, Array(5f, 0f, 0f)),    // z = 5  -> score ~1
      (2L, Array(-5f, 0f, 0f)),   // z = -5 -> score ~0
      (3L, Array(0f, 9f, 9f))     // z = 0  -> score exactly 0.5 -> keep
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Scoring.linearProbe(vecs, "embedding", w, bias = 0.0)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "probe scoring must be map-only")
    val m = out.select("vec_id", "score", "keep")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(m(1L)._1 > 0.99 && m(1L)._2)
    assert(m(2L)._1 < 0.01 && !m(2L)._2)
    assert(m(3L) == ((0.5, true)), "z=0 scores exactly 0.5, kept at the default gate")
  }

  test("blocklist score: hit counting, ratio gate, empty text safe") {
    val docs = Seq(
      (1L, "bad bad words here"),        // 2/4 hits -> flagged
      (2L, "clean text entirely"),       // 0 hits
      (3L, "")                           // empty: zero everything
    ).toDF("doc_id", "text")
    val out = TextAnalytics.blocklistScore(docs, "doc_id", "text",
        terms = Seq("bad", "evil"), maxRatio = 0.25)
      .select("doc_id", "n_hits", "hit_ratio", "flagged")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((2L, 0.5, true)))
    assert(out(2L) == ((0L, 0.0, false)))
    assert(out(3L) == ((0L, 0.0, false)))
  }

  test("pmi collocations: bound pair scores above independent pair; minCount prunes") {
    // "new york" always adjacent (bound); "data"/"lake" occur equally
    // often but never adjacent to each other except once (independent)
    val docs = Seq(
      (1L, "new york data x lake y new york data z lake w"),
      (2L, "new york lake a data b new york lake c data d"),
      (3L, "new york data lake new york q data r lake s")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.pmiCollocations(docs, "text", minCount = 2, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val (nNy, pmiNy) = out(("new", "york"))
    assert(nNy == 6L)
    // every "new" is followed by "york": PMI near the maximum for the pair
    assert(pmiNy > 1.5)
    // "data lake" adjacent only once -> below minCount=2, pruned
    assert(!out.contains(("data", "lake")))
    // no pair with count 1 survives
    assert(out.values.forall(_._1 >= 2L))
  }

  test("decontaminate overlap: exact fraction, zero-overlap docs included") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // 6 grams (n=3), of which [alpha beta gamma, beta gamma delta]
      // are in the benchmark -> 2/6 contaminated
      (1L, "alpha beta gamma delta x y z w"),
      (2L, "completely unrelated words only here"), // 0 overlap, still a row
      (3L, "too short")                             // < n words: no grams, absent
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateOverlap(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((6L, 2L, 0.333333))) // ratio rounded to 6 dp
    assert(out(2L) == ((3L, 0L, 0.0)))
  }

  test("centroid outliers: farthest-from-group-mean ranked first, ties to lower id") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f), "a"), (2L, Array(0.1f, 0.0f), "a"),
      (3L, Array(5.0f, 5.0f), "a"), // far from group-a mean
      (4L, Array(1.0f, 1.0f), "b"), (5L, Array(1.0f, 1.2f), "b"),
      (6L, Array(9.0f, 9.0f), "b")  // far from group-b mean
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Clustering.centroidOutliers(vecs, "vec_id", "embedding",
        "label", dim = 2, k = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out("a") == ((3L, 1)))
    assert(out("b") == ((6L, 1)))
  }

  test("first-touch attribution: entry type credited, exact conversion rate") {
    val events = Seq(
      // user 10: first touch 'ad' (ts tie broken by event_id), 2 purchases
      (1L, 10L, "ad", 100L), (2L, 10L, "view", 100L),
      (3L, 10L, "purchase", 200L), (4L, 10L, "purchase", 300L),
      // user 20: first touch 'ad', no purchase
      (5L, 20L, "ad", 50L), (6L, 20L, "view", 60L),
      // user 30: first touch 'email', 1 purchase
      (7L, 30L, "email", 10L), (8L, 30L, "purchase", 20L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.ops.EventAnalytics.firstTouchAttribution(
        events, "user_id", "event_type", "ts", "event_id", convType = "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("ad") == ((2L, 1L, 2L, 0.5)))
    assert(out("email") == ((1L, 1L, 1L, 1.0)))
    assert(out.size == 2)
  }

  test("time-decayed value: exact dyadic terms, halving cap") {
    // halfLife=10 units; tmax=100. ages 0, 10, 25, 1000 -> k = 0, 1, 2, cap(3)
    val events = Seq(
      (1L, 100L, 1.00), (1L, 90L, 1.00), (1L, 75L, 1.00), (1L, -900L, 8.00),
      (2L, 100L, 2.50) // k=0 only
    ).toDF("user_id", "ts", "value")
    val out = graft.ops.EventAnalytics.timeDecayedValue(events,
        "user_id", "ts", "value", halfLifeUnits = 10L, maxHalvings = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 100 + 100/2 + 100/4 + 800/8 = 275.0 exactly (all dyadic)
    assert(out(1L) == ((4L, 1100L, 275.0)))
    assert(out(2L) == ((1L, 250L, 250.0)))
  }

  test("bpe pair stats: in-word adjacent char pairs, count-desc ties lexicographic") {
    val docs = Seq((1L, "aaab aaab xy"), (2L, "ab x")).toDF("doc_id", "text")
    val out = TextAnalytics.bpePairStats(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "aaab" twice -> aa:2 each (4 total), ab:1 each (2) + standalone "ab" (1) = 3
    assert(out.head == (("aa", 4L)))
    assert(out.toMap == Map("aa" -> 4L, "ab" -> 3L, "xy" -> 1L))
    // single-char words ("x") contribute nothing
  }

  test("bpe train: frequency-weighted global merges, greedy leftmost apply, segmentation") {
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest low low"), (2L, "newer newest new low"),
      (3L, "wider wide wide")).toDF("doc_id", "text")
    val out = TextAnalytics.bpeTrain(docs, "text", merges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-derived trajectory ("low"×5, "lo"-prefix words 7): l+o wins,
    // then lo+w; rank 3-5 are the 3-count ties broken lexicographically
    assert(out.toSeq == Seq(
      (1, "l", "o", 6L), (2, "lo", "w", 6L), (3, "d", "e", 3L),
      (4, "e", "w", 3L), (5, "i", "de", 3L)))
    // segmentation replays the merge table in rank order
    val table = out.toSeq.map(t => (t._2, t._3))
    val seg = Seq("lowest", "aaa").toDF("w")
      .select(TextAnalytics.bpeSegment(col("w"), table.take(2)).as("t"))
      .as[Seq[String]].collect()
    assert(seg(0) == Seq("low", "e", "s", "t"))
    // greedy leftmost non-overlap: a merge (a,a) on "aaa" takes the FIRST pair
    val segAA = Seq("aaa").toDF("w")
      .select(TextAnalytics.bpeSegment(col("w"), Seq(("a", "a"))).as("t"))
      .as[Seq[String]].collect()
    assert(segAA(0) == Seq("aa", "a"))
    // exhaustion: more merges requested than pairs exist -> stops early
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val ex = TextAnalytics.bpeTrain(tiny, "text", merges = 10).collect()
    assert(ex.length == 1 && ex(0).getString(1) == "a" && ex(0).getString(2) == "b")
    // the induced vocabulary after (l,o) and (lo,w): "low" covers the
    // word low×4 plus the prefix of lower/lowest = 6; "e" stays a char
    // token (no merge touches it) with 10 occurrences
    val vocab = TextAnalytics.bpeVocab(docs, "text", merges = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vocab.head == (("e", 10L)))
    assert(vocab.toMap.apply("low") == 6L)
  }

  test("event paths: per-user ordered trigrams, short histories dropped") {
    val events = Seq(
      (1L, 10L, "a", 1L), (2L, 10L, "b", 2L), (3L, 10L, "c", 3L), (4L, 10L, "d", 4L),
      (5L, 20L, "x", 1L), (6L, 20L, "y", 2L), // only 2 events: no trigram
      // user 30 repeats a>b>c; ts tie at 1 broken by event_id (7 < 8)
      (7L, 30L, "a", 1L), (8L, 30L, "b", 1L), (9L, 30L, "c", 2L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.ops.EventAnalytics.eventPaths(events,
        "user_id", "event_type", "ts", "event_id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == (("a>b>c", 2L)))
    assert(out.toMap == Map("a>b>c" -> 2L, "b>c>d" -> 1L))
  }

  test("incremental dedup == full-corpus pairs restricted to the new batch") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val stored = Seq(
      (1L, base), (2L, base), // exact dups of each other (old-old: must NOT re-emit)
      (4L, "completely different content about spark dataframes and joins " * 5)
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (3L, base + " tiny tail change"),   // near-dup of stored 1 and 2
      (5L, "another unrelated corpus document with its own words entirely " * 5)
    ).toDF("doc_id", "text")
    val full = stored.unionByName(fresh)
    val idx = java.nio.file.Files.createTempDirectory("graft_inc_idx").toString
    Dedup.writeShingleIndex(stored, "doc_id", "text", n = 8, idx)
    val inc = Dedup.incrementalJaccardPairs(spark, idx, fresh,
        "doc_id", "text", n = 8, threshold = 0.5, maxDocFreq = 64, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Dedup.jaccardPairs(full, "doc_id", "text",
        n = 8, threshold = 0.5, maxDocFreq = 64, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => Set(3L, 5L)(p._1) || Set(3L, 5L)(p._2)) // ids 3,5 = the batch
      .toSet
    assert(inc == expected)
    assert(inc.map(p => (p._1, p._2)) == Set((1L, 3L), (2L, 3L)))
    // old-old pair (1,2) exists in the full run but is NOT re-emitted
    assert(!inc.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("corpus diff: added/removed/changed classified, unchanged dropped by default") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "X"), (4L, "d")).toDF("doc_id", "text")
    val d = TextAnalytics.corpusDiff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val full = TextAnalytics.corpusDiff(oldV, newV, "doc_id", "text", keepUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full(2L) == "unchanged" && full.size == 4)
  }

  test("bigram LM: Laplace-smoothed conditional, hand-checked") {
    // unigrams: a=3, b=1, solo=1 -> V=3; c(a,a)=1, c(a,b)=1, c(a)=3
    // -> both docs score one bigram with p = (1+1)/(3+3) = 1/3
    val docs = Seq((1L, "a a"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalytics.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp3 = BigDecimal(math.log(1.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((1L, exp3)) && out(2L) == ((1L, exp3)))
    assert(!out.contains(3L)) // single-word doc: no bigrams
  }

  test("skew report: hottest keys first, uniform-share factor") {
    // key 1: 6 rows, keys 2,3: 1 row each -> n=8, k=3
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 3L)).map(Tuple1(_)).toDF("k")
    val out = graft.ops.SkewReport.topKeys(df, "k", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.head == ((1L, 6L, 2.25))) // 6 * 3 / 8
    assert(out(1) == ((2L, 1L, 0.375))) // tie with key 3 -> lower key wins
  }

  test("bloom-prefiltered semi join: no false negatives, real pruning") {
    val probe = (1L to 2000L).map(Tuple1(_)).toDF("k")
    val build = Seq(5L, 500L, 1500L).map(Tuple1(_)).toDF("bk")
    val exact = probe.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
      .as[Long].collect().toSet
    val viaBloom = graft.ops.BloomFilterJoin.semiJoin(probe, "k", build, "bk",
        expectedKeys = 100, fpp = 0.03)
      .as[Long].collect().toSet
    assert(viaBloom == exact && exact == Set(5L, 500L, 1500L))
    // the map-side prune must drop the overwhelming non-matching bulk
    val kept = graft.ops.BloomFilterJoin.prefilter(probe, "k", build, "bk",
      expectedKeys = 100, fpp = 0.03).count()
    assert(kept >= 3 && kept <= 3 + 200, s"fpp blowout: kept=$kept of 2000")
  }

  test("leakage-safe split: near-dup clusters share a split; singletons == hashSplit") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " tiny tail change"), // one cluster
      (4L, "completely different content about spark dataframes and joins " * 5),
      (5L, "another unrelated corpus document with its own words entirely " * 5)
    ).toDF("doc_id", "text")
    val out = TextAnalytics.leakageSafeSplit(docs, "doc_id", "text",
        n = 8, threshold = 0.5, maxDocFreq = 64, minShared = 2)
      .select("doc_id", "split_key", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // cluster {1,2,3} keys on its min id and shares one split
    assert(Seq(1L, 2L, 3L).map(out(_)._1).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).toSet.size == 1)
    // singletons key on themselves -> identical to plain hashSplit
    val plain = TextAnalytics.hashSplit(docs.filter(col("doc_id") >= 4L), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) == ((4L, plain(4L))) && out(5L) == ((5L, plain(5L))))
  }

  test("cluster keywords: cluster-exclusive terms outrank shared vocabulary") {
    val docs = Seq(
      (1L, "common alpha alpha alpha"), (2L, "common alpha alpha"),
      (3L, "common beta beta beta"), (4L, "common beta beta")
    ).toDF("doc_id", "text")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("vid", "cluster")
    val out = graft.ops.Clustering.clusterKeywords(docs, "doc_id", "text",
        assign, "vid", "cluster", topK = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    // "common" is in both clusters -> ln(2/2) = 0; exclusives win
    assert(out(0L)._1 == "alpha" && out(1L)._1 == "beta")
    assert(out(0L)._2 > 0.0)
  }

  test("markov transitions: per-source exact probabilities, cross-user isolation") {
    val events = Seq(
      (1L, 10L, "a", 1L), (2L, 10L, "b", 2L), (3L, 10L, "a", 3L), (4L, 10L, "b", 4L),
      (5L, 20L, "a", 1L), (6L, 20L, "c", 2L) // user boundary: no b->a here
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.ops.EventAnalytics.markovTransitions(events,
        "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) == ((2L, 0.666667)))
    assert(out(("a", "c")) == ((1L, 0.333333)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3) // user 10's trailing b and user 20's c emit nothing
  }

  test("random projection: exact plane dot products; near pairs stay near") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // near-clone of 1
      (3L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.randomProject(vecs, "vec_id", "embedding",
        dimIn = 4, dimOut = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // component check: out_j(e_1) = planeComponent(j, 0) exactly
    (0 until 3).foreach { j =>
      assert(out(1L)(j) == graft.functions.LshBucket.planeComponent(j, 0))
    }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(out(1L), out(2L)) < d2(out(1L), out(3L)))
  }

  test("time-decayed value: exactness property — bit-identical across partitionings " +
      "and equal to rational arithmetic") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100000) / 100.0)
    }
    val hl = 50L // ts units per halving
    // driver-side EXACT expectation: cents / 2^k in BigDecimal (dyadic
    // rationals have finite decimal expansions, so this is exact)
    val tmax = rows.map(_._2).max
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      u -> evs.map { case (_, ts, v) =>
        val cents = BigDecimal(math.round(v * 100))
        val k = math.min((tmax - ts) / hl, 10L).toInt
        cents / BigDecimal(BigInt(1) << k)
      }.sum.toDouble
    }
    // Spark result must equal the exact value BIT FOR BIT, under any
    // partitioning (i.e. any distributed summation order)
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("user_id", "ts", "value").repartition(parts)
      val got = graft.ops.EventAnalytics.timeDecayedValue(df,
          "user_id", "ts", "value", halfLifeUnits = hl, maxHalvings = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("dsir: target-like docs outscore off-target docs; micro sum partition-invariant") {
    val target = Seq((101L, "alpha beta gamma delta"),
      (102L, "alpha beta epsilon zeta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"), // all words in-target
      (2L, "omega psi chi"), // none in-target
      (3L, "alpha beta omega"), // mixed
      (4L, "   ") // no words -> absent from output
    ).toDF("doc_id", "text")
    val w = TextAnalytics.dsirWeights(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(1L)._1 > w(3L)._1 && w(3L)._1 > w(2L)._1)
    // logw is EXACTLY micro/1e6 and the in-target doc scores positive,
    // the out-of-target doc negative
    assert(w(1L)._2 == w(1L)._1.toDouble / 1e6)
    assert(w(1L)._2 > 0 && w(2L)._2 < 0)
    // integer micro arithmetic: bit-identical under any partitioning
    val wr = TextAnalytics.dsirWeights(raw.repartition(7),
        target.repartition(3), "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wr == w.map { case (k, v) => k -> v._1 })
  }

  test("dsir resample: deterministic Gumbel top-k favors target-like docs") {
    val target = Seq((101L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val raw = (1L to 30L).map { i =>
      (i, if (i % 3 == 0) "alpha beta gamma alpha beta" else "omega psi chi omega psi")
    }.toDF("doc_id", "text")
    val sel = TextAnalytics.dsirResample(raw, target, "doc_id", "text",
      k = 10, buckets = 256)
    val ids = sel.select($"sid").as[Long].collect().toSeq
    assert(ids.size == 10 && ids.distinct.size == 10)
    // replay under a different partitioning selects the identical subset
    // in the identical order (portable-hash Gumbel draws)
    val ids2 = TextAnalytics.dsirResample(raw.repartition(5), target,
        "doc_id", "text", k = 10, buckets = 256)
      .select($"sid").as[Long].collect().toSeq
    assert(ids2 == ids)
    // softmax(logw) mass sits on the target-like third of the pool —
    // the sample should be dominated by it (deterministic, pinned)
    assert(ids.count(_ % 3 == 0) >= 7, s"selected: $ids")
  }

  test("decontaminate spans: leaked span located exactly, clean docs absent") {
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words here one two three four five six tail words end"),
      (2L, "totally unrelated text with nothing shared at all here")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.decontaminateSpans(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 5)
      .select($"sid", $"span_start", $"span_end", $"span_words")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // bench 5-grams start at word positions 4 and 5 of doc 1 ->
    // one island covering words [4, 9]
    assert(got == Seq((1L, 4L, 9L, 6L)), got.toString)
  }

  test("fuzzy decontamination: verbatim copy est=1.0, paraphrase caught, unrelated absent") {
    val base = "the quick brown fox jumps over the lazy dog again and again forever " * 4
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base), // verbatim benchmark copy
      (2L, base.replace("lazy", "idle")), // light paraphrase
      (3L, "completely different material about distributed query engines " * 5)
    ).toDF("doc_id", "text")
    // rowsPerBand = 2 -> 8 sensitive bands: the paraphrase (J ~ 0.7)
    // must surface as a candidate, not ride on band luck
    val got = graft.ops.Dedup.minhashDecontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 8, numHashes = 16, rowsPerBand = 2,
        threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 100L)) == 1.0)
    assert(got.contains((2L, 100L)) && got((2L, 100L)) >= 0.25)
    assert(!got.keySet.exists(_._1 == 3L))
  }

  test("hard negatives: same-label vectors excluded, ranked by cosine") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // anchor, label 0
      (1L, Array(0.99f, 0.1f), 0), // same label: must NOT appear
      (2L, Array(0.9f, 0.4f), 1), // closest other-label
      (3L, Array(0.5f, 0.8f), 1),
      (4L, Array(-1.0f, 0.0f), 2) // far other-label
    ).toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch.hardNegatives(vecs, "vec_id", "embedding", "label",
        vecs.filter($"vec_id" === 0L), "vec_id", "embedding", "label", k = 3)
      .select($"anchor_id", $"vec_id", $"rank").as[(Long, Long, Long)]
      .collect().sortBy(_._3).toSeq
    assert(got.map(_._2) == Seq(2L, 3L, 4L)) // cosine order, no label-0 row
    assert(got.forall(_._1 == 0L))
  }

  test("hard negatives / knn classify: non-integral id or label fails loudly at plan time") {
    // The SIMD partial-scorer reads ids and labels as primitive longs;
    // a string label would silently cast to null and DROP rows. The
    // contract must fail at plan time, never return an empty frame.
    val strLabels = Seq(
      (0L, Array(1.0f, 0.0f), "news"),
      (1L, Array(0.0f, 1.0f), "spam")).toDF("vec_id", "embedding", "label")
    val e1 = intercept[IllegalArgumentException] {
      SimilaritySearch.hardNegatives(strLabels, "vec_id", "embedding", "label",
        strLabels, "vec_id", "embedding", "label", k = 1)
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SimilaritySearch.knnClassify(strLabels, "vec_id", "embedding", "label", k = 1)
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    val strIds = Seq(("a", Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val e3 = intercept[IllegalArgumentException] {
      SimilaritySearch.knnClassify(strIds, "vec_id", "embedding", "label", k = 1)
    }
    assert(e3.getMessage.contains("integral"), e3.getMessage)
  }

  test("perplexity buckets: per-lang terciles, fluent docs head, rare-word docs tail") {
    // one language; fluency = how common the doc's words are in the
    // corpus-own unigram model: "common"x9 docs score high, singleton
    // rare words score low
    val docs = ((1L to 6L).map(i => (i, "common words shared across docs", "en")) ++
      Seq((7L, "zxqj vbnk wpro", "en"), (8L, "mlty qsdf ghjk", "en"),
        (9L, "common words rarely zzyx", "en"))).toDF("doc_id", "text", "lang")
    val got = TextAnalytics.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select($"doc_id", $"mean_logprob", $"ppl_bucket")
      .as[(Long, Double, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 9)
    // identical docs share a bucket; rare-word docs land strictly below
    assert(got(7L)._1 < got(1L)._1 && got(8L)._1 < got(1L)._1)
    assert(got(7L)._2 == "tail" && got(8L)._2 == "tail")
    assert(got(1L)._2 == got(2L)._2)
    // head/middle/tail are all non-empty and ordered by score
    val byBucket = got.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail") ||
      byBucket.keySet == Set("middle", "tail")) // 6 identical docs may pin both terciles
    if (byBucket.contains("head"))
      assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
  }

  test("mmr rerank: pure-relevance at lambda=1, near-dup demoted under diversity pressure") {
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)), // most relevant
      (2L, Array(0.9f, 0.12f, 0.0f)), // near-duplicate of 1
      (3L, Array(0.6f, 0.75f, 0.0f)), // diverse, moderately relevant
      (4L, Array(0.0f, 0.0f, 1.0f)) // orthogonal
    ).toDF("vec_id", "embedding")
    val q = Array(1.0, 0.0, 0.0)
    // lambdaNum = 10: MMR degenerates to relevance order
    val pure = SimilaritySearch.mmrRerank(vecs, "vec_id", "embedding", q,
        poolSize = 4, k = 4, lambdaNum = 10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L, 4L))
    // lambdaNum = 3: the near-duplicate is pushed below the diverse hit
    val div = SimilaritySearch.mmrRerank(vecs, "vec_id", "embedding", q,
        poolSize = 4, k = 3, lambdaNum = 3)
      .select($"vec_id").as[Long].collect().toSeq
    // greedy: 1 (top rel), then the orthogonal 4 (zero penalty), then
    // diverse 3 — the near-duplicate 2 is squeezed out entirely
    assert(div == Seq(1L, 4L, 3L), s"got $div")
    // stable under a different partitioning
    val div2 = SimilaritySearch.mmrRerank(vecs.repartition(3), "vec_id",
        "embedding", q, poolSize = 4, k = 3, lambdaNum = 3)
      .select($"vec_id").as[Long].collect().toSeq
    assert(div2 == div)
  }

  test("silhouette: separated clusters score near 1, one blob split in two scores low") {
    import graft.ops.Clustering
    val sep = (0 until 20).map { i =>
      val cx = if (i % 2 == 0) 10.0f else -10.0f
      (i.toLong, Array(cx + (i % 5) * 0.01f, (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val s1 = Clustering.silhouette(sep, "vec_id", "embedding", dim = 2, k = 2, iters = 2)
      .select($"mean_silhouette").as[Double].collect()
    assert(s1.length == 2 && s1.forall(_ > 0.9), s1.toSeq.toString)
    val blob = (0 until 20).map { i =>
      (i.toLong, Array((i % 5) * 0.1f, (i % 4) * 0.1f))
    }.toDF("vec_id", "embedding")
    val s2 = Clustering.silhouette(blob, "vec_id", "embedding", dim = 2, k = 2, iters = 2)
      .select($"mean_silhouette").as[Double].collect()
    assert(s2.forall(_ < 0.6), s2.toSeq.toString)
  }

  test("embedding drift: identical halves zero, shifted dimension detected, partition-invariant") {
    val mk = (i: Long, shift: Float) =>
      Array(math.sin(i).toFloat + shift, math.cos(i).toFloat, 0.25f)
    val a = (1L to 40L).map(i => Tuple1(mk(i, 0f))).toDF("embedding")
    val same = SimilaritySearch.embeddingDrift(a, a, "embedding", dim = 3)
      .select($"abs_drift").as[Double].collect()
    assert(same.forall(_ == 0.0))
    val b = (1L to 40L).map(i => Tuple1(mk(i, 0.5f))).toDF("embedding")
    val drift = SimilaritySearch.embeddingDrift(a, b, "embedding", dim = 3)
      .select($"d", $"abs_drift").as[(Long, Double)].collect().toMap
    assert(math.abs(drift(0L) - 0.5) < 0.001 && drift(1L) == 0.0 && drift(2L) == 0.0)
    // micro-snapped means: bit-identical under any partitioning
    val drift2 = SimilaritySearch.embeddingDrift(a.repartition(7), b.repartition(3),
        "embedding", dim = 3)
      .select($"d", $"abs_drift").as[(Long, Double)].collect().toMap
    assert(drift2 == drift)
  }

  test("contrastive triples: negative skips anchor + partners both ways, top cosine wins") {
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.85), (2L, 5L, 0.5))
      .toDF("id_a", "id_b", "jaccard")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.995f, 0.1f)), // partner of 1 (fwd), of 5 (anchor itself)
      (3L, Array(0.99f, 0.14f)), // partner of 1 (fwd)
      (4L, Array(0.9f, 0.436f)), // the hard negative for anchor 1
      (5L, Array(0.5f, 0.87f))
    ).toDF("vec_id", "embedding")
    val got = SimilaritySearch.contrastiveTriples(pairs, vecs, "vec_id", "embedding")
      .select($"anchor_id", $"positive_id", $"negative_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // anchor 1 excludes {1,2,3} -> best remaining is 4 (cos .9 beats 5's .5);
    // anchor 2 excludes {2,5} plus 1 via the REVERSED (1,2) pair -> 3 wins
    assert(got == Seq((1L, 2L, 4L), (1L, 3L, 4L), (2L, 5L, 3L)), got.toString)
  }

  test("item co-occurrence: per-user distinct pairs, min support, exact lift") {
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"), // dup (1,a) counts once
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b")
    ).toDF("user_id", "item")
    val got = graft.ops.EventAnalytics.itemCooccurrence(ev, "user_id", "item",
        k = 10, minSupport = 2)
      .select($"item_a", $"item_b", $"n_ab", $"lift")
      .as[(String, String, Long, Double)].collect().toSeq
    // only (a,b) clears support 2: all 3 users have both; lift = 3*3/(3*3)
    assert(got == Seq(("a", "b", 3L, 1.0)), got.toString)
  }

  test("linear attribution: equal split, remainder to earliest, credit conserved") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // 2 touches: 500k each
      (2L, "click", 1L), (2L, "view", 5L), (2L, "purchase", 4L), // view too late: click gets all
      (3L, "view", 1L), (3L, "click", 2L), (3L, "error", 3L), (3L, "purchase", 10L)
      // 3 touches: 333333 each, +1 remainder to the earliest (view)
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.EventAnalytics.linearAttribution(ev, "user_id",
        "event_type", "ts", "purchase")
      .select($"channel", $"n_touchpoints", $"credit_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("view") == ((2L, 500000L + 333334L)))
    assert(got("click") == ((3L, 500000L + 1000000L + 333333L)))
    assert(got("error") == ((1L, 333333L)))
    // one full unit of credit per conversion, conserved exactly
    assert(got.values.map(_._2).sum == 3000000L)
  }

  test("session stats: gap split, exact durations; daily anomalies: exact-moment z") {
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 100L), (1L, 12L, 4000L), (2L, 13L, 7L))
      .toDF("user_id", "event_id", "ts")
    val ss = graft.ops.EventAnalytics.sessionStats(ev, "user_id", "ts", "event_id",
        gapUnits = 1000L)
      .select($"user_id", $"session_idx", $"n_events", $"duration", $"session_start")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ss == Seq((1L, 1L, 2L, 100L, 0L), (1L, 2L, 1L, 0L, 4000L),
      (2L, 1L, 1L, 0L, 7L)))
    // daily counts 10,10,10,10,50: mean 18, exact std 16 -> z(50) = 2.0
    val days = (Seq.fill(4)(Seq.tabulate(10)(identity)).zipWithIndex.flatMap {
      case (xs, d) => xs.map(_ => ("click", d.toLong))
    } ++ (0 until 50).map(_ => ("click", 4L))).toDF("event_type", "day")
    val an = graft.ops.EventAnalytics.dailyAnomalies(days, "event_type", "day", 2.0)
      .select($"day", $"n", $"z").as[(Long, Long, Double)].collect().toSeq
    assert(an == Seq((4L, 50L, 2.0)), an.toString)
  }

  test("audio segmentation: break runs split, short silences stay, edge silences handled") {
    import graft.ops.Multimodal
    def segs(runs: (Boolean, Int)*): Seq[(Long, Long, Long)] =
      Multimodal.segmentWav(Multimodal.synthWavRuns(8000, 400, runs),
        threshold = 0, minSilenceRun = 16)._2
    // voiced / long gap / voiced -> two segments at exact bounds
    assert(segs((true, 50), (false, 30), (true, 40)) ==
      Seq((0L, 50L, 400L), (80L, 120L, 400L)))
    // a 10-sample silence is shorter than minSilenceRun: one segment,
    // peak unaffected by the interior zeros
    assert(segs((true, 50), (false, 10), (true, 40)) == Seq((0L, 100L, 400L)))
    // leading + trailing break silence is not part of any segment
    assert(segs((false, 20), (true, 30), (false, 25)) == Seq((20L, 50L, 400L)))
    // all-silent payload: no segments
    assert(segs((false, 64)) == Seq())
  }

  test("wav parse: synth round-trip exact; truncated and non-wav payloads deterministic") {
    val full = Multimodal.synthWav(8000, 500, 100)
    assert(Multimodal.wavMeta(full) == ((8000L, 1L, 16L, 100L, 12500L, 500.0, "pcm_s16le")))
    // non-WAV payloads
    assert(Multimodal.wavMeta("not audio at all, just text bytes ......".getBytes)._7 == "unknown")
    assert(Multimodal.wavMeta(Array.emptyByteArray)._7 == "unknown")
    // RIFF/WAVE wrapper without fmt/data chunks
    val hollow = java.util.Arrays.copyOf(full, 44)
    System.arraycopy("JUNK".getBytes("US-ASCII"), 0, hollow, 12, 4)
    assert(Multimodal.wavMeta(hollow)._7 == "corrupt")
    // truncated data chunk: parses the samples actually present
    val cut = java.util.Arrays.copyOf(full, 60) // 8 samples survive
    val m = Multimodal.wavMeta(cut)
    assert(m._4 == 8L && m._6 == 500.0 && m._7 == "pcm_s16le")
  }

  test("luhn cards: valid PAN detected+redacted, invalid PAN counted but kept, short runs ignored") {
    val docs = Seq(
      (1L, "pay 4111111111111111 now"), // Luhn-valid Visa test PAN
      (2L, "pay 4111111111111112 now"), // check digit off by one
      (3L, "order 123456789012 done"), // 12 digits: below candidate length
      (4L, "amex 378282246310005 ok") // 15-digit Luhn-valid
    ).toDF("doc_id", "text")
    val got = TextAnalytics.luhnCards(docs, "text")
      .select($"doc_id", $"n_card_candidates", $"n_luhn_valid", $"redacted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, "pay [CARD] now")))
    assert(got(1) == ((2L, 1L, 0L, "pay 4111111111111112 now")))
    assert(got(2) == ((3L, 0L, 0L, "order 123456789012 done")))
    assert(got(3) == ((4L, 1L, 1L, "amex [CARD] ok")))
  }

  test("iban mod-97: valid IBANs detected+redacted, corrupt check digits kept, letters in BBAN handled") {
    val docs = Seq(
      (1L, "acct DE89370400440532013000 ok"), // ISO 13616 example, valid
      (2L, "acct DE89370400440532013001 ok"), // last digit corrupted
      (3L, "acct GB29NWBK60161331926819 uk"), // letters inside the BBAN, valid
      (4L, "ref DE8937040044 short"), // below candidate length
      (5L, "two GB29NWBK60161331926819 and DE89370400440532013000 here")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.ibanAccounts(docs, "text")
      .select($"doc_id", $"n_iban_candidates", $"n_mod97_valid", $"redacted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, "acct [IBAN] ok")))
    assert(got(1) == ((2L, 1L, 0L, "acct DE89370400440532013001 ok")))
    assert(got(2) == ((3L, 1L, 1L, "acct [IBAN] uk")))
    assert(got(3) == ((4L, 0L, 0L, "ref DE8937040044 short")))
    assert(got(4) == ((5L, 2L, 2L, "two [IBAN] and [IBAN] here")))
  }

  test("count-min inner product: exact when collision-free, never under, partition-invariant") {
    import graft.functions.{CmBuffer, CmFunctions}
    def sk(df: org.apache.spark.sql.DataFrame, depth: Int, width: Int) =
      CmBuffer.fromRow(df.agg(CmFunctions.countMin($"k", depth, width).as("s"))
        .head().getStruct(0), depth, width)
    val a = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("y") ++ Seq.fill(7)("w")).toDF("k")
    val trueIp = 5L * 2 + 3L * 4 // keys x and y overlap
    // wide sketch: collision-free on 4 keys -> inner product is EXACT,
    // and point estimates equal true counts
    val (wa, wb) = (sk(a, 5, 4096), sk(b, 5, 4096))
    assert(CmBuffer.innerProduct(wa, wb) == trueIp)
    assert(wa.estimate("x") == 5L && wa.estimate("y") == 3L && wb.estimate("w") == 7L)
    // adversarial width 2: collisions everywhere, but never an underestimate
    val (na, nb) = (sk(a, 5, 2), sk(b, 5, 2))
    assert(CmBuffer.innerProduct(na, nb) >= trueIp)
    assert(na.estimate("z") >= 1L)
    // partition-invariance: the merged table is bit-identical under
    // any slicing (elementwise-add merge; MurmurHash3 fixed seeds)
    val s1 = sk(a.repartition(7), 5, 64)
    val s7 = sk(a.repartition(1), 5, 64)
    assert(s1.counts.toSeq == s7.counts.toSeq && s1.total == s7.total)
  }

  test("query registry: no duplicate keys in Queries.all or OracleSql (Map literals silently shadow)") {
    // a Map literal with a repeated key keeps only the LAST entry — a
    // name collision silently replaces an existing query and its
    // oracle (caught live in round 8: a new 'embedding_outliers' was
    // shadowed by the old one and the "verified" run tested the wrong
    // pairing). Parse the source and reject duplicates outright.
    def keysOf(path: String): Seq[String] = {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      """(?m)^    "([a-z0-9_]+)" ->""".r.findAllMatchIn(src).map(_.group(1)).toSeq
    }
    for (f <- Seq("src/main/scala/graft/Queries.scala",
        "src/main/scala/graft/OracleSql.scala")) {
      val ks = keysOf(f)
      val dups = ks.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
      assert(dups.isEmpty, s"$f has duplicate registrations: $dups")
      assert(ks.nonEmpty, s"$f parsed zero keys — pattern drift")
    }
    // and the runtime maps agree with each other: every oracle key has
    // a query; every query has an oracle (the driver treats a missing
    // oracle as a weaker rows-only check — keep the surface total)
    val q = Queries.all.keySet
    val o = OracleSql.all.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
  }

  test("scale-bound inventory tripwire: fractional slices audited; bound queries exist") {
    // rounds 9 and 10 each re-found the same bug class (a % mod slice
    // is a corpus FRACTION -> anchors x corpus is quadratic) in a new
    // place. The tripwire: recount the fractional-slice sites in
    // Queries.scala; drift from the audited constant fails until the
    // new site is either given a panel bound (+ ScaleBounds entry) or
    // confirmed a benign linear split and the audit count is bumped.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Queries.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val slices = """% \d+ (===|=!=)""".r.findAllMatchIn(src).size
    assert(slices == ScaleBounds.auditedFractionalSlices,
      s"Queries.scala now has $slices fractional % slices " +
        s"(audited: ${ScaleBounds.auditedFractionalSlices}). Audit the new " +
        "site against ScaleBounds' PANEL/SCALED-PARAM discipline, add an " +
        "entry if it feeds an anchor product, and bump auditedFractionalSlices.")
    // every inventory row points at live query keys
    val known = Queries.all.keySet
    val ghost = ScaleBounds.entries.flatMap(_.queries).filterNot(known)
    assert(ghost.isEmpty, s"ScaleBounds names unknown queries: $ghost")
    // and the flagship panel bounds keep their literal values in sync
    // with the oracle text (the replay is a string — drift is silent)
    val oracles = OracleSql.all
    assert(oracles("hard_negatives").contains("vec_id < 20000"))
    assert(oracles("embed_real").contains("doc_id < 50000"))
    assert(oracles("semantic_dedup").contains("(count(*) - 1) // 2048"))
    assert(oracles("contrastive_pairs")
      .contains("CASE WHEN count(*) <= 50000 THEN 1000 ELSE 250 END"))
  }

  test("correlation matrix: planted perfect/anti/zero correlations, zero-variance null, scale-invariant") {
    import graft.ops.DataProfile
    val rows = (0 until 400).map { i =>
      val x = (i % 20).toDouble / 20.0
      (x, 2.0 * x + 0.25, 1.0 - x, ((i * 7919) % 400).toDouble / 400.0, 0.42)
    }.toDF("x", "y2x", "anti", "noise", "const")
    val m = DataProfile.correlationMatrix(rows, Seq(("x", 1.0), ("y2x", 1.0),
      ("anti", 1.0), ("noise", 1.0), ("const", 1.0)))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(m(("x", "y2x")) == 1.0)
    assert(m(("x", "anti")) == -1.0)
    assert(math.abs(m(("x", "noise")).asInstanceOf[Double]) < 0.1)
    assert(m(("x", "const")) == null, "zero variance must be null")
    // scale invariance: dividing a column by a constant changes nothing
    val scaled = DataProfile.correlationMatrix(rows, Seq(("x", 50.0),
      ("y2x", 0.01), ("anti", 1.0), ("noise", 1.0), ("const", 1.0)))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(scaled(("x", "y2x")) == 1.0 && scaled(("x", "anti")) == -1.0)
  }

  test("sharded gram moments: BigInt shard combine == single exact buffer, any shard count") {
    import graft.functions.GramFunctions
    import org.apache.spark.sql.functions.{array, col}
    val rows = (0 until 999).map { i =>
      (((i * 31) % 97).toDouble / 97.0, ((i * 17) % 89).toDouble / 89.0,
        ((i * 7) % 83).toDouble / 83.0)
    }.toDF("a", "b", "c")
    val vec = array(col("a"), col("b"), col("c"))
    // reference: the plain single exact long buffer
    val ref = rows.agg(GramFunctions.gramMatrix(vec, 3).as("m"))
      .select(col("m")).head().getStruct(0)
    val (rn, rs, rg) = (ref.getLong(0),
      ref.getSeq[Long](1).map(BigInt(_)), ref.getSeq[Long](2).map(BigInt(_)))
    // sharded: force many content-hash shards; the BigInt combine must
    // reproduce the reference integers EXACTLY (not approximately)
    for (rps <- Seq(10L, 100L, 1000000L)) {
      val (n, s, g) = GramFunctions.momentsSharded(rows, vec, 3, rowsPerShard = rps)
      assert(n == rn && s.toSeq == rs && g.toSeq == rg,
        s"sharded moments diverged at rowsPerShard=$rps")
    }
    // and the consumer: sharded correlation == unsharded correlation
    import graft.ops.DataProfile
    val one = DataProfile.correlationMatrix(rows,
      Seq(("a", 1.0), ("b", 1.0), ("c", 1.0))).collect().toSeq
    assert(one.nonEmpty)
  }

  test("kmv sketch: exact under capacity, hash matches SQL replay, overlap recovers planted jaccard") {
    import graft.functions.{KmvBuffer, KmvFunctions}
    def sk(df: org.apache.spark.sql.DataFrame, k: Int) = KmvBuffer.fromSorted(
      df.agg(KmvFunctions.kmvSketch($"v", k).as("s"))
        .head().getSeq[Long](0).toArray, k)
    // under capacity: the sketch IS the distinct set (estimate exact),
    // duplicates collapse, partitioning irrelevant
    val a = (Seq("p", "q", "r", "p", "q") ++ Seq.fill(3)("s")).toDF("v")
    val sa = sk(a.repartition(5), 64)
    assert(sa.size == 4 && sa.estimateDistinct == 4.0)
    // JVM hash == the SQL portable md5-prefix hash, value for value
    val sqlHashes = a.distinct()
      .selectExpr("CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT) AS h")
      .as[Long].collect().sorted.toSeq
    assert(sa.sorted.toSeq == sqlHashes)
    // planted overlap: |A|=600, |B|=600, |A∩B|=300 → J = 1/3; a k=256
    // sketch must land within 3/√k of the truth on BOTH J and |A∩B|
    val big = (0 until 600).map(i => s"a_$i").toDF("v")
    val other = ((300 until 600).map(i => s"a_$i") ++
      (0 until 300).map(i => s"b_$i")).toDF("v")
    val (j, inter) = KmvBuffer.overlap(sk(big, 256), sk(other, 256))
    val eps = 3.0 / math.sqrt(256)
    assert(math.abs(j - 1.0 / 3.0) <= eps, s"jaccard $j")
    assert(math.abs(inter - 300.0) <= eps * 900.0, s"intersection $inter")
    // estimator sanity at capacity: distinct estimate within 3σ
    assert(math.abs(sk(big, 256).estimateDistinct - 600.0) <= eps * 600.0)
  }

  test("triangle count: hand-counted graphs, hub skew, duplicate/reversed edges collapse") {
    import graft.ops.GraphOps
    // K4 (4 triangles... no: K4 has C(4,3)=4 triangles) plus a
    // pendant edge and a duplicate/reversed noise
    val k4 = for (i <- 0 to 3; j <- 0 to 3 if i < j) yield (i.toLong, j.toLong)
    val edges = (k4 ++ Seq((3L, 9L), (9L, 3L), (1L, 0L)))
      .toDF("id_a", "id_b")
    val got = GraphOps.triangleStats(edges, "id_a", "id_b").head()
    assert(got.getLong(0) == 5)            // nodes 0-3 and 9
    assert(got.getLong(1) == 7)            // 6 K4 edges + pendant
    assert(got.getLong(3) == 4, s"K4 has 4 triangles: $got")
    // star hub: 1 center, 30 leaves — MANY wedges, zero triangles (the
    // skew case the degree orientation exists for: the hub emits none)
    val star = (1 to 30).map(i => (0L, i.toLong)).toDF("id_a", "id_b")
    val sg = GraphOps.triangleStats(star, "id_a", "id_b").head()
    assert(sg.getLong(2) == 435L && sg.getLong(3) == 0L)
    assert(sg.getDouble(4) == 0.0)
    // triangle fan on the hub: close one leaf pair → exactly 1 triangle
    val fan = star.union(Seq((7L, 8L)).toDF("id_a", "id_b"))
    assert(GraphOps.triangleStats(fan, "id_a", "id_b").head().getLong(3) == 1L)
  }

  test("pca: recovers planted 2D structure, projection energy matches eigenvalues, partition-invariant") {
    import graft.ops.Pca
    // planted basis in R^8: u along dims 0/1, w along dims 2/3, with
    // variance 9 along u and 1 along w — everything else exactly flat
    val r = 1.0 / math.sqrt(2.0)
    val u = Array(r, r, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val w = Array(0.0, 0.0, r, -r, 0.0, 0.0, 0.0, 0.0)
    val rows = (0 until 200).map { i =>
      val a = 3.0 * ((i % 20) - 9.5) / 9.5   // spread ±3 along u
      val b = 1.0 * ((i / 20) - 4.5) / 4.5   // spread ±1 along w
      (i.toLong, (0 until 8).map(j => (a * u(j) + b * w(j)).toFloat).toArray)
    }.toDF("vec_id", "vec")
    val m = Pca.fit(rows, "vec", 8, 3)
    // PC1 aligns with u, PC2 with w (sign-normalized, so just |cos|)
    def absCos(x: Array[Double], y: Array[Double]) =
      math.abs(x.zip(y).map { case (p, q) => p * q }.sum)
    assert(absCos(m.components(0), u) > 0.9999, m.components(0).toSeq)
    assert(absCos(m.components(1), w) > 0.9999, m.components(1).toSeq)
    // exactly two nonzero eigenvalues; λ1/λ2 ≈ var ratio 9:1-ish
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(math.abs(m.eigenvalues(2)) < 1e-6, m.eigenvalues.toSeq)
    assert(math.abs(m.eigenvalues.sum - m.trace) < 1e-9)
    // projection with k=2 captures ALL the energy (data is rank 2)
    val proj = Pca.project(rows, "vec_id", "vec", m.copy(components = m.components.take(2)))
    val got = proj.agg(sum($"sq_norm")).head().getDouble(0) / 200
    assert(math.abs(got - m.eigenvalues.take(2).sum) < 1e-4,
      s"$got vs ${m.eigenvalues.take(2).sum}")
    // exact-integer gram: the model is BIT-identical under any slicing
    val m1 = Pca.fit(rows.repartition(7), "vec", 8, 3)
    assert(m1.mean.toSeq == m.mean.toSeq)
    assert(m1.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
  }

  test("misra-gries: exact when vocab fits; guarantee holds under adversarial vocab + merges") {
    import graft.functions.MgFunctions.misraGries
    // vocab (3) <= k (8): the sketch IS the exact count
    val small = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val smallGot = small.toDF("w").agg(misraGries($"w", 8).as("mg"))
      .select(explode($"mg").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(smallGot == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    // 600 distinct cold words + two genuinely heavy ones, k = 10:
    // est <= true and deficit <= N/(k+1) for every surviving counter,
    // and both heavy items always survive — under any partitioning
    // (different merge trees)
    // a >64KB item must survive the shuffle serializer (DataOutput's
    // writeUTF ceiling would throw here; the buffer is length-prefixed)
    val giant = "g" * 100000
    val giantGot = (Seq.fill(5)(giant) ++ Seq("x")).toDF("w").repartition(3)
      .agg(misraGries($"w", 4).as("mg"))
      .select(explode($"mg").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(giantGot(giant) == 5L)
    val stream = Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 600).map(i => s"cold$i")
    val n = stream.size
    val exact = stream.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    for (parts <- Seq(1, 4, 13)) {
      val got = stream.toDF("w").repartition(parts)
        .agg(misraGries($"w", 10).as("mg"))
        .select(explode($"mg").as("e")).select($"e.item", $"e.est")
        .as[(String, Long)].collect().toMap
      assert(got.contains("hot") && got.contains("warm"), s"parts=$parts: $got")
      got.foreach { case (w, est) =>
        val tru = exact(w)
        assert(est <= tru, s"parts=$parts $w overestimates: $est > $tru")
        assert(tru - est <= n / 11, s"parts=$parts $w deficit: $tru - $est")
      }
    }
    // WEIGHTED form (the collapse-first feed: one (word, count) row per
    // distinct text): same stream pre-aggregated to weights must keep
    // the identical guarantee — heavies present, est <= true, deficit
    // <= W/(k+1) — under any partitioning/merge tree
    val weightedRows = exact.toSeq
    for (parts <- Seq(1, 4, 13)) {
      val got = weightedRows.toDF("w", "n").repartition(parts)
        .agg(graft.functions.MgFunctions
          .misraGriesWeighted($"w", $"n", 10).as("mg"))
        .select(explode($"mg").as("e")).select($"e.item", $"e.est")
        .as[(String, Long)].collect().toMap
      assert(got.contains("hot") && got.contains("warm"),
        s"weighted parts=$parts: $got")
      got.foreach { case (w, est) =>
        val tru = exact(w)
        assert(est <= tru, s"weighted parts=$parts $w overestimates: $est > $tru")
        assert(tru - est <= n / 11,
          s"weighted parts=$parts $w deficit: $tru - $est")
      }
    }
  }

  test("unigram LM tokenizer: seed counts hand-derived; Viterbi picks the modeled token; EM keeps the useful vocab; encode round") {
    import graft.ops.UnigramLm
    // seed stage: "abab"x2 + "cd"x1 — substrings of abab per word:
    // ab@1, ab@3 (2 each), ba@2, aba@1, bab@2, abab@1; cd: cd@1
    val docs = Seq("abab abab cd").toDF("text")
    val seeds = UnigramLm.seedCounts(docs, "text", maxTokenLen = 4)
      .as[(String, Long)].collect().toMap
    assert(seeds("ab") == 4L && seeds("ba") == 2L && seeds("abab") == 2L &&
      seeds("aba") == 2L && seeds("bab") == 2L && seeds("cd") == 1L)
    // viterbi: "ab" as one modeled token beats a+b (one logp beats two)
    val scores = Map("a" -> -3000000L, "b" -> -3000000L, "c" -> -3000000L,
      "d" -> -3000000L, "ab" -> -1000000L)
    assert(UnigramLm.viterbi("abab", scores, 4) == Seq("ab", "ab"))
    assert(UnigramLm.viterbi("cd", scores, 4) == Seq("c", "d"))
    // equal-score tie prefers the longer last token
    val tied = Map("a" -> -1000000L, "aa" -> -2000000L)
    assert(UnigramLm.viterbi("aa", tied, 4) == Seq("aa"))
    // full train: frequent "ab" survives EM with the dominant count;
    // alphabet closure always holds; result partition-invariant
    val corpus = Seq.fill(30)("abab").mkString(" ") + " " +
      Seq.fill(10)("cdcd").mkString(" ") + " xy"
    for (parts <- Seq(1, 4)) {
      val v = UnigramLm.train(Seq(corpus).toDF("text").repartition(parts),
          "text", vocabSize = 10, iters = 3, seedSize = 16, maxTokenLen = 4)
        .as[(String, Long, Long, Boolean)].collect()
      val byTok = v.map(r => r._1 -> r).toMap
      assert(Set("a", "b", "c", "d", "x", "y").subsetOf(byTok.keySet), s"alphabet: ${byTok.keySet}")
      val multi = v.filter(!_._4)
      assert(multi.nonEmpty && multi.map(_._1).contains("abab"),
        s"EM must keep the dominant substring: ${v.mkString(",")}")
      // the best segmentation of abab uses one vocab token, so its
      // E-step count equals the word count
      assert(byTok("abab")._2 == 30L, s"abab count: ${byTok("abab")}")
    }
    // encode with the trained vocab
    val trained = UnigramLm.train(Seq(corpus).toDF("text"), "text",
        vocabSize = 10, iters = 3, seedSize = 16, maxTokenLen = 4)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val enc = UnigramLm.encode(Seq((7L, "abab xy")).toDF("id", "text"),
        "id", "text", trained, maxTokenLen = 4)
      .as[(Long, Long, Long, String)].head()
    assert(enc._1 == 7L && enc._2 == 2L)
    assert(enc._4.startsWith("abab | "), s"seg: ${enc._4}")
  }

  test("sampled-anchor kNN eval: per-anchor predictions == exact LOO restricted to the sample") {
    import graft.ops.SimilaritySearch
    val dim = 8
    // 3 clusters of 8 vectors around orthogonal axes + noise dims
    val vecs = (0L until 24L).map { i =>
      val c = (i % 3).toInt
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10f else 0f) + ((i * 7 + d * 3) % 5) * 0.1f)
      (i, v.toSeq, c)
    }.toDF("vec_id", "embedding", "label")
    val exact = SimilaritySearch.knnClassify(vecs, "vec_id", "embedding", "label", k = 5)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    val sampled = SimilaritySearch.knnClassifySampled(vecs, "vec_id", "embedding",
        "label", k = 5, sampleMod = 4)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    // anchors are exactly the id % 4 == 0 rows...
    assert(sampled.keySet == (0L until 24L).filter(_ % 4 == 0).toSet)
    // ...and each sampled anchor's prediction is the exact eval's
    // verbatim (neighbors stay the full table)
    sampled.foreach { case (id, row) => assert(row == exact(id), s"anchor $id") }
    // sampleMod = 1 degenerates to the exact eval
    val all = SimilaritySearch.knnClassifySampled(vecs, "vec_id", "embedding",
        "label", k = 5, sampleMod = 1)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(all == exact)
  }

  test("ngram diversity HLL twin: estimates track exact counts; same gram universe") {
    val docs = Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the cat ran"),
      (3L, "b", "x y x y x y")).toDF("doc_id", "source", "text")
    val exact = TextAnalytics.ngramDiversity(docs, "source", "text", maxN = 3)
      .select($"grp", $"n", $"n_grams", $"n_distinct")
      .as[(String, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r).toMap
    val approx = TextAnalytics.ngramDiversityApprox(docs, "source", "text", maxN = 3)
      .select($"grp", $"n", $"n_grams", $"n_distinct_est")
      .as[(String, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(a._3 == e._3, s"$k: total gram counts must be identical")
      // HLL++ is exact at tiny cardinality; at scale the gate query
      // pins a 5% band — here we can demand equality
      assert(a._4 == e._4, s"$k: est ${a._4} vs exact ${e._4}")
    }
  }

  test("unigram LM alphabet pass: distributed char rollup == driver-side reference, any partitioning") {
    import graft.ops.UnigramLm
    // unicode + repeats: the distributed explode+groupBy must match a
    // driver-side char fold exactly (count desc, char asc order), so no
    // words.collect() alphabet pass can sneak back in
    val words = Seq(("abab", 3L), ("caña", 2L), ("日本", 1L), ("ab", 5L))
    val expected = words
      .flatMap { case (w, c) => w.map(ch => (ch.toString, c)) }
      .groupBy(_._1).map { case (ch, xs) => ch -> xs.map(_._2).sum }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    for (parts <- Seq(1, 4)) {
      val got = UnigramLm.alphabetCounts(
        words.toDF("__w", "cnt").repartition(parts))
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
  }

  test("filtered IVF: widens to the whole index when the predicate is scarce (never silently < k); dense case returns k") {
    import graft.ops.SimilaritySearch
    val dim = 8
    val vecs = (1L to 200L).map(i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 7 + d).toFloat), (i % 20).toInt))
      .toDF("vec_id", "embedding", "label")
    val q = Array.tabulate(dim)(d => math.cos(d + 1.0))
    // scarce: 10 matching rows scattered over buckets, k = 25 > total —
    // the probe set must become the whole index and return ALL matches
    // == the exact filtered top-k (a fixed-probe post-filter would
    // silently return however few landed in the first buckets)
    val scarce = SimilaritySearch.ivfTopKFiltered(vecs, "vec_id", "embedding",
        dim, q, k = 25, predicate = $"label" === 3, nProbeInit = 1, numPlanes = 4)
      .select($"vec_id", round($"cosine", 6).as("c")).as[(Long, Double)].collect()
    val exact = SimilaritySearch.bruteForceTopK(vecs.filter($"label" === 3),
        "vec_id", "embedding", q, 25)
      .select($"vec_id", round($"cosine", 6).as("c")).as[(Long, Double)].collect()
    assert(scarce.length == 10 && scarce.toSeq == exact.toSeq)
    // dense: plenty of matches — exactly k rows, all passing the
    // predicate, scores non-increasing
    val dense = SimilaritySearch.ivfTopKFiltered(vecs, "vec_id", "embedding",
        dim, q, k = 12, predicate = $"label" % 2 === 0, nProbeInit = 2, numPlanes = 4)
      .select($"vec_id", $"label", $"cosine").as[(Long, Int, Double)].collect()
    assert(dense.length == 12)
    assert(dense.forall(_._2 % 2 == 0))
    assert(dense.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // empty predicate: zero rows, no throw
    assert(SimilaritySearch.ivfTopKFiltered(vecs, "vec_id", "embedding",
      dim, q, k = 5, predicate = $"label" === 99, nProbeInit = 2, numPlanes = 4)
      .count() == 0L)
  }

  test("maxsim: per-token max then sum, hand-derived on orthogonal bags") {
    import graft.ops.SimilaritySearch
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)), (2L, Array(0.6f, 0.8f, 0f))).toDF("doc", "v")
    val qs = Seq(Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0))
    val got = SimilaritySearch.maxSimTopK(vecs, "doc", "v", qs, 10)
      .as[(Long, Double)].collect()
    // doc 2: max cos vs q1 = 0.6 (second vector), vs q2 = 1.0 -> 1.6
    // doc 1: max vs q1 = 1.0, vs q2 = 0.0 -> 1.0
    assert(got.toSeq == Seq((2L, 1.6), (1L, 1.0)))
  }

  test("retrieval eval: MRR and nDCG hand-derived; perfect ranking scores 1; no-relevant scores 0") {
    import graft.ops.RetrievalEval
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // b,c relevant at 2,3
      (2L, 20L, 1), (2L, 21L, 2),               // perfect: rel at 1, none at 2? -> make 20 relevant only
      (3L, 30L, 1), (3L, 31L, 2))               // nothing relevant
      .toDF("query_id", "doc_id", "rank")
    val labels = Seq((1L, 11L, 1), (1L, 12L, 1), (2L, 20L, 1))
      .toDF("query_id", "doc_id", "rel")
    val got = RetrievalEval.evalRanking(results, labels, 10)
      .select($"query_id", $"n_relevant", $"mrr", $"ndcg")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val l2 = math.log(2)
    def lg2(x: Double) = math.log(x) / l2
    val dcg1 = 1.0 / lg2(3.0) + 1.0 / lg2(4.0)
    val idcg1 = 1.0 / lg2(2.0) + 1.0 / lg2(3.0)
    def r6d(x: Double) = math.round(x * 1e6) / 1e6
    assert(got(0) == ((1L, 2L, 0.5, r6d(dcg1 / idcg1))))
    // q2: the single relevant doc sits at rank 1 — ideal == actual
    assert(got(1) == ((2L, 1L, 1.0, 1.0)))
    assert(got(2) == ((3L, 0L, 0.0, 0.0)))
  }

  test("url ops: host/site/registered-domain extraction and normalization rules") {
    import graft.ops.UrlOps._
    val df = Seq(
      "https://WWW.Example.COM:8080/Path/Sub/?q=1#f",
      "http://sub.shop.example.co.uk/a",
      "ftp://files.example.org/",
      "not a url").toDF("u")
    val got = df.select(hostOf($"u"), siteOf($"u"), registeredDomainOf($"u"),
      normalizeUrl($"u")).as[(String, String, String, String)].collect()
    // case folds on scheme+host only, port survives normalize but not
    // hostOf, query/fragment stripped, trailing slash dropped
    assert(got(0) == (("www.example.com", "example.com", "example.com",
      "https://www.example.com:8080/Path/Sub")))
    // two-level public suffix: the documented last-two-labels
    // approximation yields co.uk (PSL table is the fix, same slot)
    assert(got(1) == (("sub.shop.example.co.uk", "sub.shop.example.co.uk",
      "co.uk", "http://sub.shop.example.co.uk/a")))
    // root path collapses onto the authority
    assert(got(2) == (("files.example.org", "files.example.org",
      "example.org", "ftp://files.example.org")))
    // non-absolute input degrades to empty strings, never throws
    assert(got(3) == (("", "", "", "")))
  }

  test("aggressive dedup key: digit/punct variants collapse where the canonical key keeps both") {
    val docs = Seq(
      (1L, "Breaking news: market up. Post #123, 4 views!"),
      (2L, "Breaking news: market up. Post #456, 9 views!"), // digits differ only
      (3L, "breaking NEWS  market up   post views"),         // case/ws/punct variant
      (4L, "Completely different body text here")).toDF("doc_id", "text")
    val agg = Dedup.exactAggressive(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(agg == Set(1L, 4L), s"aggressive survivors: $agg")
    // the canonical key preserves digits/punct -> 1 and 2 both survive
    val canon = Dedup.exactNormalized(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(canon == Set(1L, 2L, 3L, 4L))
    // key sanity: strip leaves letters/whitespace only
    val k = docs.select(Dedup.aggressiveKey($"text")).as[String].collect()
    k.foreach(s => assert(s.matches("[a-z ]*"), s"key not clean: '$s'"))
  }

  test("edit-distance pair verification: classic DP values, similarity, threshold flag") {
    val docs = Seq(
      (1L, "kitten"), (2L, "sitting"),
      (3L, "the quick brown fox"), (4L, "the quick brown fax"),
      (5L, "")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.editVerifyPairs(pairs, docs, "doc_id", "text", minSim = 0.8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // kitten -> sitting: the textbook distance 3; maxLen 7
    assert(got((1L, 2L)) == ((1L, 2L, 3L, 0.571429, false)))
    // one substitution over 19 chars: sim 18/19, verified at 0.8
    assert(got((3L, 4L)) == ((3L, 4L, 1L, 0.947368, true)))
    // empty right side: distance = len(left), sim 0 (maxLen guard > 0)
    assert(got((1L, 5L)) == ((1L, 5L, 6L, 0.0, false)))
  }

  test("vocab coverage + per-source OOV: hand-derived ranks and rates") {
    val docs = Seq(
      (1L, "s1", "a a a b b c"),
      (2L, "s1", "a b d"),
      (3L, "s2", "e e f")).toDF("doc_id", "source", "text")
    // counts: a=4, b=3, e=2, c=1, d=1, f=1 (ties rank c<d<f lexically)
    val cov = TextAnalytics.vocabCoverage(docs, "text", Seq(1, 3, 100))
      .as[(Int, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(cov(1) == ((1, 1L, 4L, 12L, 0.333333)))
    assert(cov(3) == ((3, 3L, 9L, 12L, 0.75)))
    // size beyond the vocab: everything covered, n_types = |vocab|
    assert(cov(100) == ((100, 6L, 12L, 12L, 1.0)))
    // OOV vs top-2 vocab {a, b}: s1 has 9 tokens, oov {c, d} = 2;
    // s2 has 3 tokens, all oov
    val oov = TextAnalytics.sourceOovRate(docs, "source", "text", vocabSize = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(oov("s1") == (("s1", 9L, 2L, 0.222222)))
    assert(oov("s2") == (("s2", 3L, 3L, 1.0)))
  }

  test("binary quantization: packed sign bits, hamming == per-dim count, full-pool rerank == exact") {
    import graft.ops.Quantization
    val dim = 64
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d =>
        (math.sin(i * 13 + d * 7) * (if ((i + d) % 3 == 0) -1 else 1)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0).select($"embedding")
      .as[Seq[Float]].head().map(_.toDouble).toArray
    // packed-bits hamming == naive per-dim sign-mismatch count
    val got = vecs.select($"vec_id",
        Quantization.hammingColumn(
          Quantization.signBitsColumn($"embedding", dim),
          org.apache.spark.sql.functions.lit(Array.tabulate((dim + 63) / 64) { w =>
            (w * 64 until math.min(w * 64 + 64, dim)).foldLeft(0L)((acc, d) =>
              if (q(d) > 0) acc | (1L << (d - w * 64)) else acc)
          })).as("h"))
      .as[(Long, Long)].collect().toMap
    val raw = vecs.as[(Long, Seq[Float])].collect().toMap
    raw.foreach { case (id, v) =>
      val naive = (0 until dim).count(d => (v(d) > 0) != (q(d) > 0)).toLong
      assert(got(id) == naive, s"id $id: ${got(id)} vs $naive")
    }
    assert(got(0L) == 0L) // query vs itself
    // with candidates >= corpus the rerank equals the exact top-k
    val bq = Quantization.binaryTopK(vecs, "vec_id", "embedding", q,
        k = 5, candidates = 40)
      .select($"vec_id").as[Long].collect().toSeq
    val exact = vecs
      .withColumn("c", graft.functions.VectorFunctions.cosineSimilarity(
        $"embedding", org.apache.spark.sql.functions.lit(q)))
      .orderBy($"c".desc, $"vec_id".asc).limit(5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(bq == exact, s"$bq vs $exact")
  }

  test("domain quota sample: at most N per registrable domain, hash-priority deterministic") {
    import graft.ops.UrlOps
    val docs = (0L until 30L).map { i =>
      val host =
        if (i % 2 == 0) s"sub$i.example.co.uk" else s"u${i % 4}.github.io"
      (i, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val kept = UrlOps.domainQuotaSample(docs, "url", "doc_id", maxPerDomain = 3)
      .select($"doc_id", $"registrable_domain", $"sample_rank")
      .as[(Long, String, Int)].collect()
    val byDomain = kept.groupBy(_._2)
    // example.co.uk has 15 docs -> capped at 3; each github.io user page
    // is its own registrable domain (<= 4 docs each, also capped)
    assert(byDomain("example.co.uk").length == 3)
    byDomain.values.foreach(g => assert(g.length <= 3))
    assert(kept.forall(_._3 <= 3))
    // deterministic: rerun keeps the identical survivor set
    val again = UrlOps.domainQuotaSample(docs.repartition(7), "url", "doc_id", 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("url ops: PSL-backed registrable domain — 2/3-level suffixes, private section, fallbacks") {
    import graft.ops.UrlOps
    // the snapshot loaded and split by depth
    assert(UrlOps.pslSuffixes2.contains("co.uk") &&
      UrlOps.pslSuffixes2.contains("com.au") &&
      UrlOps.pslSuffixes2.contains("github.io"))
    assert(UrlOps.pslSuffixes3.contains("k12.ca.us"))
    assert(UrlOps.pslSuffixes2.forall(_.count(_ == '.') == 1))
    assert(UrlOps.pslSuffixes3.forall(_.count(_ == '.') == 2))
    val cases = Seq(
      // 2-level public suffix: registrant + co.uk, any subdomain depth
      "http://sub.shop.example.co.uk/a" -> "example.co.uk",
      "https://example.co.uk/" -> "example.co.uk",
      // host IS the suffix: no registrable domain per PSL — the host
      // itself comes back as the (documented) grouping key
      "https://co.uk/x" -> "co.uk",
      "https://news.paper.com.au/p" -> "paper.com.au",
      // private-section suffix: each user page its own registrant
      "https://alice.github.io/repo" -> "alice.github.io",
      // 3-level suffix, www alias stripped first
      "https://www.portal.k12.ca.us/home" -> "portal.k12.ca.us",
      // unlisted suffix falls back to last-two-labels
      "https://deep.sub.example.com/x" -> "example.com",
      "https://x.example.de/" -> "example.de",
      // mixed case + port normalize before the suffix match
      "https://A.B.Example.CO.UK:443/q" -> "example.co.uk",
      "nonsense" -> "")
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.registrableDomainOf($"u")).as[String].collect()
    cases.zip(got).foreach { case ((u, want), g) =>
      assert(g == want, s"$u -> $g, expected $want")
    }
  }

  test("ngram diversity: distinct-1/2/3 exact on a hand-derived corpus") {
    import graft.ops.TextAnalytics
    val docs = Seq((1L, "a b a b"), (2L, "a a a")).toDF("id", "text")
      .withColumn("src", lit("s"))
    val got = TextAnalytics.ngramDiversity(docs, "src", "text", maxN = 3)
      .select($"n", $"n_grams", $"n_distinct", $"diversity")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // n=1: 7 occurrences of {a,b}; n=2: 5 of {a b, b a, a a};
    // n=3: 3 of {a b a, b a b, a a a} — all distinct
    assert(got(0) == ((1L, 7L, 2L, 0.285714)))
    assert(got(1) == ((2L, 5L, 3L, 0.6)))
    assert(got(2) == ((3L, 3L, 3L, 1.0)))
  }

  test("quantile sketch: exact under capacity; self-reported rank bound holds under adversarial orders, ties, partitionings; grouped") {
    import graft.functions.{QsFunctions, QuantileSketchAgg}
    import org.apache.spark.sql.DataFrame
    def summarize(df: DataFrame, k: Int) = QuantileSketchAgg.fromRow(
      df.agg(QsFunctions.quantileSketch($"x", k).as("qs"))
        .select($"qs.n", $"qs.err_bound", $"qs.max_weight", $"qs.items").head())
    // n <= k: no compaction ever fires — the sketch IS the exact
    // multiset (errBound 0, every rank query exact)
    val s0 = summarize((1 to 100).map(_.toDouble).toDF("x"), 256)
    assert(s0.errBound == 0L && s0.n == 100L)
    for (t <- Seq(1L, 37L, 100L)) assert(s0.valueAtRank(t) == t.toDouble)
    // adversarial arrival orders x heavy ties, k=32 so compaction is
    // constant; the one-sided invariant est <= true <= est + errBound
    // must hold at EVERY query point under every partitioning (merge
    // tree), and the self-reported bound must stay non-vacuous
    val streams: Seq[(String, Seq[Double])] = Seq(
      "asc" -> (1 to 5000).map(_.toDouble),
      "desc" -> (5000 to 1 by -1).map(_.toDouble),
      "tied" -> Seq.tabulate(5000)(i => (i % 7).toDouble),
      "zig" -> Seq.tabulate(5000)(i => if (i % 2 == 0) i.toDouble else (10000 - i).toDouble))
    for ((name, xs) <- streams; parts <- Seq(1, 4, 13)) {
      val sk = summarize(xs.toDF("x").repartition(parts), 32)
      assert(sk.n == xs.size.toLong, s"$name parts=$parts n")
      assert(sk.errBound < sk.n / 2, s"$name parts=$parts vacuous bound ${sk.errBound}")
      val sorted = xs.sorted
      def trueRank(v: Double): Long = {
        var lo = 0; var hi = sorted.size // first index with sorted(i) > v
        while (lo < hi) { val m = (lo + hi) / 2; if (sorted(m) <= v) lo = m + 1 else hi = m }
        lo.toLong
      }
      for (q <- 1 to 9) {
        val t = math.max(1L, math.ceil(q * sk.n / 10.0).toLong)
        val v = sk.valueAtRank(t)
        val est = sk.estRank(v); val tru = trueRank(v)
        assert(est >= t, s"$name parts=$parts q=$q est=$est < target=$t")
        assert(est <= tru && tru <= est + sk.errBound,
          s"$name parts=$parts q=$q v=$v est=$est true=$tru bound=${sk.errBound}")
      }
      for (v <- Seq(0.0, 3.0, 2500.0, 4999.0, 10000.0)) {
        val est = sk.estRank(v); val tru = trueRank(v)
        assert(est <= tru && tru <= est + sk.errBound,
          s"$name parts=$parts point=$v est=$est true=$tru bound=${sk.errBound}")
      }
    }
    // grouped form: one independent bounded buffer per (partition, key)
    val rows = Seq.tabulate(2000)(i => (i % 2, i.toDouble)).toDF("k", "x")
      .repartition(5)
      .groupBy($"k").agg(QsFunctions.quantileSketch($"x", 16).as("qs"))
      .select($"k", $"qs.n", $"qs.err_bound", $"qs.items").collect()
    assert(rows.map(_.getInt(0)).toSet == Set(0, 1))
    rows.foreach(r => assert(r.getLong(1) == 1000L, s"group n: $r"))
  }

  test("pageRank: star center ranks highest; exact recurrence matches a scalar replay; partition-invariant") {
    import graft.ops.GraphOps
    // Star: 1 is the hub of 2..5 (undirected). Hub receives 4 full
    // contributions per round; leaves 1/4 of the hub's — center must
    // dominate every leaf, and the 4 leaves tie exactly.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val r = GraphOps.pageRankUndirected(star, iters = 5)
    val got = r.select($"id", $"rank_micro").as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert((2L to 5L).map(got).toSet.size == 1, s"leaves must tie exactly: $got")
    assert(got(1L) > got(2L), s"hub must outrank leaves: $got")
    // Scalar replay of the documented integer recurrence on the same
    // graph — the engine must match it EXACTLY (no float tolerance).
    val n = 5L
    var hub = 1000000L / n; var leaf = 1000000L / n
    for (_ <- 1 to 5) {
      val hubIn = 4L * (leaf / 1L)         // each leaf has outdeg 1
      val leafIn = hub / 4L                // hub has outdeg 4
      val t = 150000L / n
      val nh = t + (17L * hubIn) / 20L
      val nl = t + (17L * leafIn) / 20L
      hub = nh; leaf = nl
    }
    assert(got(1L) == hub && got(2L) == leaf,
      s"engine (${got(1L)}, ${got(2L)}) != scalar replay ($hub, $leaf)")
    // Partition invariance: integer arithmetic leaves no sum-order
    // residue — any repartitioning yields identical ranks.
    val skewed = star.repartition(7)
    val r2 = GraphOps.pageRankUndirected(skewed, iters = 5)
    val got2 = r2.select($"id", $"rank_micro").as[(Long, Long)].collect().toMap
    r2.unpersist()
    assert(got2 == got)
  }

  test("knnClassify: leave-one-out majority vote, deterministic tie to smaller label") {
    // Two tight clusters on orthogonal axes; each member's 2 nearest
    // (excluding self) are its cluster mates -> label recovered.
    def v(x: Double, y: Double, z: Double) = Seq(x.toFloat, y.toFloat, z.toFloat)
    val rows = Seq(
      (0L, v(1, 0.00, 0), 0), (1L, v(1, 0.01, 0), 0), (2L, v(1, -0.01, 0), 0),
      (3L, v(0, 1, 0.00), 1), (4L, v(0, 1, 0.01), 1), (5L, v(0, 1, -0.01), 1))
      .toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch.knnClassify(rows, "vec_id", "embedding", "label", k = 2)
      .select($"vec_id", $"true_label", $"pred_label")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(got.forall { case (_, t, p) => t == p }, s"clean clusters must classify: $got")
    // k=4 from a 1-vs-... actually force a 2-2 VOTE TIE: anchor 0 with
    // k=4 sees {1,2} (label 0) and two of {3,4,5} (label 1) -> tie on
    // count, deterministic pick = smaller label (0).
    val tied = SimilaritySearch.knnClassify(rows, "vec_id", "embedding", "label", k = 4)
      .filter($"vec_id" === 0L).select($"pred_label").as[Int].head()
    assert(tied == 0, s"2-2 tie must break to the smaller label, got $tied")
  }

  test("personalized pageRank: mass stays near the seed; unreachable nodes rank zero") {
    import graft.ops.GraphOps
    // Two disjoint undirected components: {1,2} and {3,4}. Seeding
    // only node 1 must leave the other component at exactly zero,
    // and rank(1) > rank(2) (teleport returns mass to the seed).
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = GraphOps.personalizedPageRankUndirected(pairs, seeds, iters = 5)
    val got = r.select($"id", $"rank_micro").as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(got(3L) == 0L && got(4L) == 0L, s"unseeded component must stay zero: $got")
    // (a 2-node pair is bipartite, so mass OSCILLATES between seed and
    // neighbor round to round — assert flow reached both, not ordering)
    assert(got(1L) > 0L && got(2L) > 0L,
      s"seed and neighbor both carry mass: $got")
    // seeds outside the graph are dropped; |S| counts node-seeds only,
    // so adding a phantom seed changes nothing
    val r2 = GraphOps.personalizedPageRankUndirected(
      pairs, Seq(Tuple1(1L), Tuple1(99L)).toDF("id"), iters = 5)
    val got2 = r2.select($"id", $"rank_micro").as[(Long, Long)].collect().toMap
    r2.unpersist()
    assert(got2 == got, s"phantom seed must not alter ranks: $got2 vs $got")
  }

  test("pageRank: directed sink absorbs nothing; chain ranks grow toward the sink") {
    import graft.ops.GraphOps
    // Directed chain 1→2→3: 3 is a sink (outdeg 0, redistributes
    // nothing); downstream nodes accumulate strictly more rank.
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphOps.pageRankMicro(chain, "src", "dst", iters = 5)
    val got = r.select($"id", $"rank_micro").as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(got(3L) > got(2L) && got(2L) > got(1L), s"chain must rank downstream higher: $got")
    // head gets teleport mass only: 150000/3 = 50000 every round
    assert(got(1L) == 50000L, s"head rank must be the teleport floor: $got")
  }

  // --- Aho–Corasick multi-pattern matching ---

  /** Leftmost non-overlapping count — the replace()-length semantic
    * the oracle replays; the reference both AC expressions must match. */
  private def naiveCount(text: String, pat: String): Long = {
    var i = 0; var c = 0L
    var j = text.indexOf(pat, i)
    while (j >= 0) { c += 1; i = j + pat.length; j = text.indexOf(pat, i) }
    c
  }

  test("aho-corasick: nested patterns all fire; self-overlap suppressed per pattern") {
    import graft.functions.MultiMatchFunctions._
    val pats = Seq("he", "she", "hers", "aa", "a a")
    val rows = Seq((1L, "ushers"), (2L, "aaaa"), (3L, "a a a"), (4L, ""), (5L, "xyz"))
      .toDF("id", "text")
    val got = rows.select($"id", multiMatchCounts($"text", pats).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    // "ushers": she@1, he@2 (inside she — distinct patterns independent), hers@2
    assert(got(1L) == Seq(1L, 1L, 1L, 0L, 0L), s"ushers: ${got(1L)}")
    // "aaaa": aa@0 then aa@2 (leftmost non-overlap = 2, not 3)
    assert(got(2L) == Seq(0L, 0L, 0L, 2L, 0L), s"aaaa: ${got(2L)}")
    // "a a a": "a a"@0 consumes through index 2; @2 overlaps -> 1
    assert(got(3L) == Seq(0L, 0L, 0L, 0L, 1L), s"a a a: ${got(3L)}")
    assert(got(4L) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(got(5L) == Seq(0L, 0L, 0L, 0L, 0L))
    val tot = rows.select($"id", multiMatchTotal($"text", pats).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(tot == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("aho-corasick: matches the naive replace-count on random corpora (seeded)") {
    import graft.functions.MultiMatchFunctions._
    val rnd = new scala.util.Random(42)
    // tiny alphabet maximizes overlap/nesting collisions
    def randText(n: Int) = (1 to n).map(_ => "ab ".charAt(rnd.nextInt(3))).mkString
    val pats = (1 to 40).map(_ => randText(1 + rnd.nextInt(4))).distinct
      .filter(_.nonEmpty).toSeq
    val texts = (1L to 60L).map(i => (i, randText(rnd.nextInt(80))))
    val got = texts.toDF("id", "text")
      .select($"id", multiMatchCounts($"text", pats).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.foreach { case (id, tx) =>
      val want = pats.map(naiveCount(tx, _))
      assert(got(id) == want, s"id=$id text='$tx': got ${got(id)} want $want")
    }
  }

  test("aho-corasick: utf-8 multi-byte patterns count at char-occurrence parity") {
    import graft.functions.MultiMatchFunctions._
    val pats = Seq("é", "héllo", "日本", "本語")
    val rows = Seq((1L, "héllo wörld héllo"), (2L, "日本語の日本"), (3L, "ascii only"))
      .toDF("id", "text")
    val got = rows.select($"id", multiMatchCounts($"text", pats).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(2L, 2L, 0L, 0L), s"${got(1L)}")
    // "日本語の日本": 日本@0 and @4, 本語@1 — nested CJK at byte level
    assert(got(2L) == Seq(0L, 0L, 2L, 1L), s"${got(2L)}")
    assert(got(3L) == Seq(0L, 0L, 0L, 0L))
  }

  test("aho-corasick: stays inside WholeStageCodegen over a parquet scan") {
    import graft.functions.MultiMatchFunctions._
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val dir = java.nio.file.Files.createTempDirectory("graft-ac-codegen").toString
    docs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(multiMatchTotal($"text", Seq("quick", "lazy dog")).as("t"))
    val inCodegen = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains("multi_match_total") => w
    }
    assert(inCodegen.nonEmpty,
      s"multi_match_total not inside a codegen span:\n${df.queryExecution.executedPlan}")
    // "quick" in docs 1-3 (3), "lazy dog" in docs 1-2 (2), doc 4 neither
    assert(df.agg(sum($"t")).head.getLong(0) == 5L)
  }

  test("data profile: hand-derived stats and constraint gate; one scan each") {
    import graft.ops.DataProfile
    val rows = Seq(
      (1L, Some(10.5), Some("a")), (2L, None, Some("b")),
      (2L, Some(20.0), None), (4L, Some(-3.25), Some("zz")))
      .toDF("k", "v", "s")
    val prof = DataProfile.profile(rows, Seq("k", "v", "s"))
      .as[(String, Long, Long, Long, String, String, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(prof("k") == (("k", 4L, 0L, 3L, "1", "4", Some(2.25))))
    assert(prof("v") == (("v", 4L, 1L, 3L, "-3.25", "20.0", Some(9.083333))))
    // string column: no mean, lexicographic min/max
    assert(prof("s") == (("s", 4L, 1L, 3L, "a", "zz", None)))

    val checks = DataProfile.validate(rows, Seq(
        DataProfile.notNull("v"),
        DataProfile.inRange("v", 0.0, 15.0),
        DataProfile.oneOf("s", Seq("a", "b"))))
      .unionByName(DataProfile.checkUnique(rows, Seq("k")))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(checks("not_null(v)") == ((1L, false)))
    // in_range: null v (1) + 20.0 (1) + -3.25 (1) = 3 violations
    assert(checks("in_range(v,0.0,15.0)") == ((3L, false)))
    // one_of: null s and "zz" violate
    assert(checks("one_of(s)") == ((2L, false)))
    // k=2 appears twice -> 1 violation
    assert(checks("unique(k)") == ((1L, false)))
    // all-conforming frame passes everything
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("k", "v", "s")
    assert(DataProfile.validate(clean, Seq(DataProfile.notNull("v")))
      .unionByName(DataProfile.checkUnique(clean, Seq("k")))
      .select($"passed").as[Boolean].collect().forall(identity))
    // scale shape: the profile is ONE scan — a single hash-agg
    // exchange, no joins, and the HLL DEFAULT avoids the
    // multi-exact-distinct Expand (one duplicated scan pass per
    // distinct column) that exactDistinct = true pays
    val plan = DataProfile.profile(rows, Seq("k", "v", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
    assert(!plan.contains("Expand"), s"HLL default must not Expand:\n$plan")
    val exactDf = DataProfile.profile(rows, Seq("k", "v", "s"),
      exactDistinct = true)
    val exactPlan = exactDf.queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      "exact distincts run as per-column single-distinct aggregations " +
        s"(1-row cross joins), never the multi-distinct Expand:\n$exactPlan")
    // exact == HLL at tiny cardinality, so the hand-derived stats
    // above pin the exact path too
    val exactProf = exactDf
      .as[(String, Long, Long, Long, String, String, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(exactProf == prof, "exact and HLL profiles must agree here")
    // HLL and exact agree at tiny cardinality (HLL++ is exact there),
    // so the hand-derived stats above hold under the default too
  }

  test("c4 line filter: terminal-punct + min-words rules, doc gate; paragraph dedup keeps first occurrence") {
    val rows = Seq(
      (1L, "Good line with punctuation.\nno terminal punct here\nshort.\nAnother keeper line!"),
      (2L, "only one keeper sentence.\njunk"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalytics.c4LineFilter(rows, "doc_id", "text",
        minWords = 3, minLines = 2)
      .select($"doc_id", $"cleaned_text", $"n_lines_kept", $"n_lines_dropped", $"kept")
      .as[(Long, String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc 1: keeps lines 1 and 4 ("short." fails minWords; line 2 no punct)
    assert(got(1L) == ((1L, "Good line with punctuation.\nAnother keeper line!", 2L, 2L, true)))
    assert(got(2L) == ((2L, "only one keeper sentence.", 1L, 1L, false)))
    assert(got(3L) == ((3L, "", 0L, 0L, false)))

    val paras = Seq(
      (1L, "unique alpha\n\nshared boilerplate\n\nunique beta"),
      (2L, "shared boilerplate\n\nunique gamma"),
      (3L, "shared boilerplate")).toDF("doc_id", "text")
    val pd = TextAnalytics.dedupParagraphs(paras, "doc_id", "text")
      .select($"sid", $"cleaned_text", $"n_paras_kept", $"n_paras_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 owns the first occurrence (pos 1); docs 2 and 3 lose it
    assert(pd(1L) == ((1L, "unique alpha\n\nshared boilerplate\n\nunique beta", 3L, 0L)))
    assert(pd(2L) == ((2L, "unique gamma", 1L, 1L)))
    assert(pd(3L) == ((3L, "", 0L, 1L)), "fully-boilerplate doc returns empty, not missing")
  }

  test("stupid backoff: all three branches hand-derived; short docs absent") {
    // corpus "a b c a b d": uni a2 b2 c1 d1 (N=6, V=4);
    // bi ab2 bc1 ca1 bd1; tri abc1 bca1 cab1 abd1
    val corpus = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val scoreDocs = Seq(
      (1L, "a b c x b d q"), // branches: tri, floor, floor, bi, floor
      (2L, "a b"))           // < 3 words -> no output row
      .toDF("doc_id", "text")
    val got = TextAnalytics.stupidBackoffScore(scoreDocs, corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(!got.contains(2L), "short docs have no trigram positions")
    val (n, mean) = got(1L)
    assert(n == 5L)
    val a = 0.4
    val expected = Seq(
      1.0 / 2.0,                      // (a,b,c): c3/c2ab
      a * a * (0.0 + 1) / (6 + 4),    // (b,c,x): x OOV floor
      a * a * (2.0 + 1) / (6 + 4),    // (c,x,b): floor, c1(b)=2
      a * 1.0 / 2.0,                  // (x,b,d): bigram bd / c1(b)
      a * a * (0.0 + 1) / (6 + 4))    // (b,d,q): q OOV floor
      .map(math.log).sum / 5
    assert(math.abs(mean - BigDecimal(expected).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"mean $mean != hand-derived $expected")
  }

  test("rfm segmentation: hand-derived quintile scores, boundary ties land low, no global sort") {
    import graft.ops.EventAnalytics
    // 5 customers, engineered so every dimension is distinct:
    // frequency 1..5, monetary 100..500 dollars, recency 10..50 days
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(k => (c.toLong, s"2024-01-${10 + c}",
        100.0 * c / c)) // each order $100; frequency c => monetary 100*c
    }.toDF("cust", "d", "price").withColumn("d", to_date($"d"))
    val got = EventAnalytics.rfmSegments(orders, "cust", "d", "price",
        to_date(lit("2024-02-10")))
      .select($"cust", $"recency_days", $"frequency", $"monetary_cents",
        $"r_score", $"f_score", $"m_score")
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect().sortBy(_._1)
    // recency: cust c last orders 2024-01-(10+c) -> days = 31-c -> c=5 most recent
    assert(got.map(_._2).toSeq == Seq(30L, 29L, 28L, 27L, 26L))
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._4).toSeq == Seq(10000L, 20000L, 30000L, 40000L, 50000L))
    // 5 distinct values, quintile boundaries interpolate between ranks:
    // strict-exceedance scoring gives 1..5 in dimension order
    assert(got.map(_._5).toSeq == Seq(1, 2, 3, 4, 5), s"r: ${got.toSeq}")
    assert(got.map(_._6).toSeq == Seq(1, 2, 3, 4, 5))
    assert(got.map(_._7).toSeq == Seq(1, 2, 3, 4, 5))
    // all-tied dimension: every value sits ON every boundary -> all
    // land in the LOWEST bucket (strict < never fires)
    val flat = Seq((1L, "2024-01-01", 5.0), (2L, "2024-01-01", 5.0))
      .toDF("cust", "d", "price").withColumn("d", to_date($"d"))
    val fg = EventAnalytics.rfmSegments(flat, "cust", "d", "price",
        to_date(lit("2024-02-10")))
      .select($"m_score").as[Int].collect().toSet
    assert(fg == Set(1), s"tied monetary must all score 1: $fg")
    // scale shape: no window/ntile global sort; bounds broadcast back
    val plan = EventAnalytics.rfmSegments(orders, "cust", "d", "price",
      to_date(lit("2024-02-10"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "rfm must not use a window rank")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bounds must broadcast:\n$plan")
  }

  test("fix_mojibake: pair fusion, clean-text identity, decoys, one layer per pass") {
    import graft.functions.UnicodeFunctions.fixMojibake
    def fix(s: String): String = Seq(Tuple1(s)).toDF("t")
      .select(fixMojibake($"t")).as[String].head()
    // the classic double-encodings: é (C3 A9), ö (C3 B6), nbsp (C2 A0)
    assert(fix("cafÃ©") == "café")
    assert(fix("schÃ¶nÂ x") == "schön x")
    // clean text — including real Ã/Â NOT followed by a trail — is
    // untouched (idempotence on healthy corpora)
    assert(fix("plain ascii") == "plain ascii")
    assert(fix("Ã1 and ÂZ") == "Ã1 and ÂZ")
    assert(fix("café") == "café") // already-repaired text is stable
    // trailing lead at end of string copies through
    assert(fix("oopsÃ") == "oopsÃ")
    // twice-encoded text loses exactly one layer per application
    val once = "cafÃ©"
    val twice = once.flatMap {
      case c if c >= 0x80 && c <= 0xBF => Seq('Â', c)
      case c if c >= 0xC0 && c <= 0xFF => Seq('Ã', (c - 0x40).toChar)
      case c => Seq(c)
    }.mkString
    assert(fix(twice) == once && fix(fix(twice)) == "café")
    // nulls preserved
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(fixMojibake($"t")).as[String].head() == null)
  }

  test("canonicalUrl: tracking strip + param sort, default ports, fragment, trailing slash") {
    import graft.ops.UrlOps
    def canon(s: String): String = Seq(Tuple1(s)).toDF("u")
      .select(UrlOps.canonicalUrl($"u")).as[String].head()
    assert(canon("HTTPS://Www.Ex.COM:443/A/b/?b=2&utm_source=m&a=1&fbclid=z#x")
      == "https://www.ex.com/A/b?a=1&b=2")
    assert(canon("http://ex.com:80/p") == "http://ex.com/p")
    assert(canon("http://ex.com:8080/p") == "http://ex.com:8080/p") // non-default kept
    assert(canon("https://ex.com/p?utm_campaign=x") == "https://ex.com/p") // emptied query drops '?'
    assert(canon("https://ex.com/Case/Kept") == "https://ex.com/Case/Kept") // path case preserved
    assert(canon("https://ex.com/p?ref=rss&z=1&a=2") == "https://ex.com/p?a=2&z=1")
  }

  test("nfc-normalized dedup: composed/decomposed, case, and whitespace variants collide") {
    import graft.functions.UnicodeFunctions.nfcNormalize
    // NFC output check: decomposed e+U+0301 composes to U+00E9
    val composed = "café"
    val decomposed = "café"
    val n = Seq(Tuple1(decomposed)).toDF("t")
      .select(nfcNormalize($"t")).as[String].head()
    assert(n == composed && n.length == 4)
    // ASCII fast path: identity, nulls preserved
    val fp = Seq(Tuple1("plain ascii"), Tuple1(null: String)).toDF("t")
      .select(nfcNormalize($"t")).as[String].collect()
    assert(fp.toSeq == Seq("plain ascii", null))
    // all four variants of one logical doc collapse to the lowest id
    val rows = Seq(
      (1L, s"the $composed menu"),
      (2L, s"the $decomposed menu"),
      (3L, s"THE $composed MENU"),
      (4L, s"  the   $decomposed  menu "),
      (5L, "a genuinely different doc")).toDF("doc_id", "text")
    val kept = Dedup.exactNormalized(rows, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"variants must collapse: $kept")
    // byte-exact dedup misses every pair (the gap this op closes)
    assert(Dedup.exact(rows, "doc_id", "text").count() == 5L)
  }

  test("compression ratio: repetition compresses, entropy doesn't; matches a reference deflate") {
    val repetitive = "buy cheap pills now " * 200
    val rnd = new scala.util.Random(9)
    val entropy = (1 to 4000).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val rows = Seq((1L, repetitive), (2L, entropy), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalytics.compressionStats(rows, "doc_id", "text", level = 6)
      .select($"doc_id", $"n_bytes", $"deflate_len", $"compression_ratio", $"flagged")
      .as[(Long, Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // ordering property (image-independent): template repeats compress
    // far better than printable noise
    assert(got(1L)._4 < 0.1, s"repetitive ratio must be tiny: ${got(1L)}")
    assert(got(2L)._4 > 0.5, s"high-entropy ratio must stay high: ${got(2L)}")
    assert(got(1L)._5 && !got(2L)._5, "only the repetitive doc is flagged")
    // empty text: defined ratio 1.0, unflagged
    assert(got(3L) == ((3L, 0L, 0L, 1.0, false)))
    // expression == a reference Deflater run (same JVM, raw mode)
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    assert(got(1L)._3 == ref(repetitive) && got(2L)._3 == ref(entropy))
  }

  test("aho-corasick term stats: totals and doc frequency hand-derived") {
    val got = TextAnalytics.blocklistTermStats(docs, "text", Seq("quick", "lazy", "o"))
      .as[(String, Long, Long)].collect().map { case (k, a, b) => (k, (a, b)) }.toMap
    // docs 1-3 each contain "quick" and "lazy" once; doc 4 neither.
    assert(got("quick") == ((3L, 3L)))
    assert(got("lazy") == ((3L, 3L)))
    // "o": brown fox...dog per doc: brown(1) fox(1) over(1) dog/cat(1 or 0)
    val naive = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different content about spark engines")
      .map(t => naiveCount(t, "o"))
    assert(got("o") == ((naive.sum, naive.count(_ > 0).toLong)))
  }
}
