package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus text-analysis operators for training-data pipelines
  * (SURVEY.md §7.1 module 7): token counting, quality scoring,
  * n-gram-marker language ID, k-min-hash document fingerprinting.
  * All pure column expressions (codegen'd, shuffle-free per row) so a
  * 100 TB corpus pass is a single map stage; only the corpus-level
  * rollups aggregate. */
object TextAnalytics {

  /** Per-document surface statistics. */
  def withStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_measured", length(t).cast("long"))
      .withColumn("n_tokens", TextFunctions.tokenCount(t).cast("long"))
      .withColumn("avg_token_len",
        when(TextFunctions.tokenCount(t) === 0, lit(0.0)).otherwise(
          length(regexp_replace(t, "\\s+", "")).cast("double") /
            TextFunctions.tokenCount(t).cast("double")))
      .withColumn("punct_ratio", TextFunctions.punctRatio(t))
      .withColumn("digit_ratio", TextFunctions.digitRatio(t))
      .withColumn("upper_ratio", TextFunctions.upperRatio(t))
  }

  /** Heuristic quality score in [0,1]: length band + word-shape +
    * low punctuation/digit noise. Deterministic arithmetic only (the
    * oracle replays the same formula). */
  def qualityScore(textCol: Column): Column = {
    val nTok = TextFunctions.tokenCount(textCol).cast("double")
    val lengthScore = least(nTok / lit(64.0), lit(1.0))
    val punctPenalty = least(TextFunctions.punctRatio(textCol) * 4.0, lit(1.0))
    val digitPenalty = least(TextFunctions.digitRatio(textCol) * 4.0, lit(1.0))
    TextFunctions.clip01(lengthScore * (lit(1.0) - punctPenalty * 0.5) * (lit(1.0) - digitPenalty * 0.5))
  }

  /** Stopword markers for [[qualityFilter]]'s prose-likeness gate,
    * space-padded for the same substring-occurrence counting as
    * [[langMarkers]]. */
  val stopwordMarkers: Seq[String] =
    Seq(" the ", " a ", " of ", " and ", " to ", " in ", " is ", " it ")

  /** Markup/symbol characters whose density marks non-prose (code,
    * tables, boilerplate) in [[qualityFilter]]. */
  val symbolMarkers: Seq[String] = Seq("#", "$", "%", "{", "}", "<", ">")

  /** Gopher-style hard quality gates — the rule-based document filter
    * of a training-data pipeline, one boolean per rule plus their
    * conjunction `passes_quality`:
    *
    *  - `ok_word_count`: whitespace word count in [minWords, maxWords];
    *  - `ok_word_len`: mean word length in [minAvgWordLen, maxAvgWordLen]
    *    (gibberish/char-soup gate);
    *  - `ok_symbol`: markup-symbol count per word ≤ maxSymbolRatio;
    *  - `ok_stopword`: stopword occurrences per word ≥ minStopwordFrac
    *    (prose-likeness gate).
    *
    * Counting uses the replace-length substring trick shared with
    * [[langIdColumn]] — exactly replayable in any SQL engine. Pure
    * column expressions: a single codegen'd map stage at any corpus
    * size, with ratios exposed (6 dp) for threshold tuning. */
  def qualityFilter(df: DataFrame, textCol: String,
      minWords: Int = 8, maxWords: Int = 100000,
      minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1, minStopwordFrac: Double = 0.02): DataFrame = {
    val t = col(textCol)
    val nW = TextFunctions.tokenCount(t).cast("long")
    val nWd = nW.cast("double")
    val avgLen = when(nW === 0, lit(0.0)).otherwise(
      length(regexp_replace(t, "\\s+", "")).cast("double") / nWd)
    val padded = concat(lit(" "), lower(t), lit(" "))
    val nStop = stopwordMarkers.map(m => TextFunctions.occurrences(padded, m)).reduce(_ + _)
    val nSym = symbolMarkers.map(m => TextFunctions.occurrences(t, m)).reduce(_ + _)
    val stopFrac = when(nW === 0, lit(0.0)).otherwise(nStop.cast("double") / nWd)
    val symRatio = when(nW === 0, lit(0.0)).otherwise(nSym.cast("double") / nWd)
    df.withColumn("n_words", nW)
      .withColumn("avg_word_len", avgLen)
      .withColumn("stopword_frac", stopFrac)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("ok_word_count", nW >= minWords && nW <= maxWords)
      .withColumn("ok_word_len", avgLen >= minAvgWordLen && avgLen <= maxAvgWordLen)
      .withColumn("ok_symbol", symRatio <= maxSymbolRatio)
      .withColumn("ok_stopword", stopFrac >= minStopwordFrac)
      .withColumn("passes_quality",
        col("ok_word_count") && col("ok_word_len") && col("ok_symbol") && col("ok_stopword"))
  }

  /** Language markers: high-frequency function words per language,
    * counted as ` word `-padded substring occurrences. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " a "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "fr" -> Seq(" le ", " et ", " la ", " les "),
    "es" -> Seq(" el ", " y ", " los ", " una "),
    "zh" -> Seq("的", "是", "了", "在"))

  /** N-gram-marker language ID: argmax of marker occurrence counts,
    * ties broken by marker-table order, zero evidence → "und". The text
    * is space-padded so boundary words count. */
  def langIdColumn(textCol: Column): Column = {
    val padded = concat(lit(" "), lower(textCol), lit(" "))
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => TextFunctions.occurrences(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in table order) achieving the max, if max > 0
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: the k smallest 60-bit md5-prefix hashes
    * ([[Dedup.shingleHashSets]]) of the doc's character n-gram shingles,
    * ','-concatenated — a k-min sketch usable for containment/similarity
    * estimation, reproducible in plain SQL (winnowing-style selection
    * without the rolling window). Shuffle-free: the per-doc hash set is
    * built in one map pass and sorted/sliced in-row. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String, n: Int, k: Int): DataFrame =
    Dedup.shingleHashSets(df, idCol, textCol, n)
      .select(col("sid"),
        concat_ws(",",
          transform(slice(array_sort(col("hs")), 1, k), _.cast("string"))).as("fingerprint"))

  /** Corpus-level rollup: per-language doc counts, token totals, quality
    * distribution, approximate distinct docs — the "corpus stats" pass a
    * pipeline runs before/after dedup. */
  def corpusStats(df: DataFrame, textCol: String): DataFrame = {
    withStats(df, textCol)
      .withColumn("lang_pred", langIdColumn(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .groupBy(col("lang_pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        avg(col("n_chars_measured")).as("avg_chars"),
        avg(col("quality")).as("avg_quality"),
        approx_count_distinct(col(textCol)).as("approx_distinct_docs"))
  }

  /** Within-document repetition signals (the Gopher/C4 quality-filter
    * family): fraction of word occurrences taken by the most frequent
    * word, distinct-word ratio, and the duplicate fraction of word
    * n-grams (1 − distinct/total). High top-word or duplicate-gram
    * fractions mark boilerplate and degenerate repetition. Two bounded
    * shuffles, both keyed by (doc, word|gram) with map-side partial
    * aggregation — no corpus-wide state. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      gramN: Int = 5): DataFrame = {
    val words = df.select(col(idCol).as("sid"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val wordAgg = words.groupBy("sid", "w").agg(count(lit(1)).as("c"))
      .groupBy("sid").agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_word_count"))
    val grams = df.select(col(idCol).as("sid"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= gramN)
      .select(col("sid"), explode(expr(
        s"transform(sequence(1, size(words) - ${gramN - 1}), i -> concat_ws(' ', slice(words, i, $gramN)))"))
        .as("g"))
    val gramAgg = grams.groupBy("sid").agg(
      count(lit(1)).as("n_grams"),
      count_distinct(col("g")).as("n_distinct_grams"))
    wordAgg.join(gramAgg, Seq("sid"), "left")
      .select(col("sid"),
        (col("top_word_count").cast("double") / col("n_words")).as("top_word_frac"),
        (col("n_distinct_words").cast("double") / col("n_words")).as("distinct_word_ratio"),
        coalesce(lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"),
          lit(0.0)).as("dup_gram_frac"))
  }

  /** PII redaction patterns: category → (RE2-safe regex, placeholder).
    * The patterns avoid lookaround/backreferences so the SQL oracle
    * (RE2) and Spark (java.util.regex) agree; application order is
    * fixed (emails first so their digits can't half-match as phones). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d().-]{7,}\\d", "<PHONE>"))

  /** PII detection + redaction: per-category match counts and the text
    * with every match replaced by its placeholder, patterns applied in
    * [[piiPatterns]] order. Each count is taken on the text AFTER the
    * preceding categories were redacted, so e.g. an IPv4 (digits and
    * dots) is never double-counted as a phone number. Map-only column
    * expressions (regexp_count / regexp_replace are codegen'd) — a
    * full-corpus redaction pass is one scan. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    var cur: Column = col(textCol)
    var acc = df
    piiPatterns.foreach { case (cat, pat, repl) =>
      acc = acc.withColumn(s"n_$cat", regexp_count(cur, lit(pat)).cast("long"))
      cur = regexp_replace(cur, pat, repl)
    }
    acc.withColumn("redacted", cur)
  }

  /** Payment-card detection with Luhn checksum validation — the PII
    * pass's high-precision tier: a 13-19 digit run is only a REAL card
    * number if its Luhn check digit holds, which cuts the
    * order-id/timestamp false positives a bare digit-run regex drowns
    * in. Detection, validation, and redaction (valid cards only) are
    * pure column expressions — map-only at any corpus size — built
    * from regexp + higher-order array functions that replay verbatim
    * in SQL (no lookarounds: RE2 engines lack them, so the boundary is
    * `\b`).
    *
    * Returns (… n_card_candidates, n_luhn_valid, redacted). */
  def luhnCards(df: DataFrame, textCol: String): DataFrame = {
    // \b doubled once more for Spark SQL's escaped string literals
    // (the parser would otherwise read '\b' as a backspace char)
    val pat = "\\\\b[0-9]{13,19}\\\\b"
    // Luhn over one candidate string c: sum over reversed digits, odd
    // positions as-is, even positions doubled with 9 subtracted past 9
    val luhnSum = (c: String) =>
      s"""aggregate(transform(sequence(1, length($c)), i ->
         |  CASE WHEN i % 2 = 0
         |    THEN CASE WHEN CAST(substring(reverse($c), i, 1) AS INT) * 2 > 9
         |      THEN CAST(substring(reverse($c), i, 1) AS INT) * 2 - 9
         |      ELSE CAST(substring(reverse($c), i, 1) AS INT) * 2 END
         |    ELSE CAST(substring(reverse($c), i, 1) AS INT) END),
         | 0, (a, x) -> a + x)""".stripMargin.replaceAll("\\s+", " ")
    df.withColumn("__cards", expr(s"regexp_extract_all($textCol, '$pat', 0)"))
      .withColumn("n_card_candidates", size(col("__cards")).cast("long"))
      .withColumn("n_luhn_valid", expr(
        s"size(filter(__cards, c -> ${luhnSum("c")} % 10 = 0))").cast("long"))
      .withColumn("redacted", expr(
        s"""aggregate(filter(__cards, c -> ${luhnSum("c")} % 10 = 0),
           | $textCol, (acc, c) -> replace(acc, c, '[CARD]'))"""
          .stripMargin.replaceAll("\\s+", " ")))
      .drop("__cards")
  }

  /** IBAN detection with ISO 13616 mod-97 validation — the
    * [[luhnCards]] sibling for bank-account PII: a candidate span
    * ([A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}) is a REAL IBAN only if moving
    * its first four chars to the end and expanding letters to two
    * digits (A=10..Z=35) leaves a number ≡ 1 (mod 97). The modulus
    * streams left-to-right with a tiny integer accumulator
    * ((a·10+d) mod 97 per digit, (a·100+v) mod 97 per letter) — never
    * a big-integer parse — as one codegen'd higher-order expression;
    * detection, validation, and redaction (valid spans only) are
    * map-only at any corpus size. */
  def ibanAccounts(df: DataFrame, textCol: String): DataFrame = {
    // \b doubled for Spark SQL's escaped string literals (see luhnCards)
    val pat = "\\\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\\\b"
    // mod-97 of rearranged candidate r: fold chars through the
    // streaming modulus (accumulator always < 9700)
    val mod97 = (c: String) =>
      s"""aggregate(transform(sequence(1, length($c)), i ->
         |  substring(substring($c, 5) || substring($c, 1, 4), i, 1)),
         | 0, (a, ch) ->
         |  CASE WHEN ch >= '0' AND ch <= '9'
         |    THEN (a * 10 + CAST(ch AS INT)) % 97
         |    ELSE (a * 100 + ascii(ch) - 55) % 97 END)""".stripMargin
        .replaceAll("\\s+", " ")
    df.withColumn("__ibans", expr(s"regexp_extract_all($textCol, '$pat', 0)"))
      .withColumn("n_iban_candidates", size(col("__ibans")).cast("long"))
      .withColumn("n_mod97_valid", expr(
        s"size(filter(__ibans, c -> ${mod97("c")} = 1))").cast("long"))
      .withColumn("redacted", expr(
        s"""aggregate(filter(__ibans, c -> ${mod97("c")} = 1),
           | $textCol, (acc, c) -> replace(acc, c, '[IBAN]'))"""
          .stripMargin.replaceAll("\\s+", " ")))
      .drop("__ibans")
  }

  /** Corpus-wide most frequent word n-grams — the boilerplate report a
    * pipeline runs before writing repetition filters: total occurrences
    * and containing-doc counts per gram, top `k`. One (gram) shuffle
    * with map-side partial aggregation, then TakeOrdered(k) — no
    * full sort. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col("sid"), explode(expr(
        s"transform(sequence(1, size(words) - ${n - 1}), i -> concat_ws(' ', slice(words, i, $n)))"))
        .as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("sid")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)

  /** [[topNgrams]] with EXACT-DUPLICATE COLLAPSE (identical output,
    * OpsSpec-asserted): gram occurrences become Σ class-weight ×
    * grams-per-distinct-text and containing-doc counts become
    * Σ class-weight over classes containing the gram (every clone of
    * a containing text contains it), so the corpus-dominating explode
    * runs once per distinct text. One (rep, gram) rollup replaces the
    * direct plan's count_distinct expansion. */
  def topNgramsCollapsed(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val reps = Dedup.cloneClasses(df, idCol, textCol)
      .select(col("rep").as("sid"), col("w"),
        split(trim(col("__text")), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
    reps
      .select(col("sid"), col("w"), explode(expr(
        s"transform(sequence(1, size(words) - ${n - 1}), i -> concat_ws(' ', slice(words, i, $n)))"))
        .as("gram"))
      .groupBy(col("gram"), col("sid"), col("w"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("gram"))
      .agg(sum(col("w") * col("__cnt")).as("n_occurrences"),
        sum(col("w")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)
  }

  /** Per-document top-`k` keywords by TF-IDF (tf · ln(N/df), N = docs
    * with ≥1 word). N and df are computed IN-PLAN (scalar aggregate
    * cross-joined in), so the pass is two bounded shuffles — (doc,
    * word) term counts and per-word doc frequencies — plus a per-doc
    * window over ≤ distinct-word rows. Scores are rounded to 6dp
    * BEFORE ranking so the rank order is reproducible across engines
    * (a 1-ulp `ln` difference must not flip a rank); ties break on the
    * word. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val words = df.select(col(idCol).as("sid"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val tf = words.groupBy("sid", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    // N = docs contributing ≥1 token == docs with non-whitespace text:
    // a single partial-agg scan of the text column, instead of
    // re-shuffling tf through distinct+count (one exchange fewer)
    val nDocs = df.filter(length(trim(col(textCol))) > 0)
      .agg(count(lit(1)).as("n_corpus_docs"))
    val scored = tf.join(dfreq, Seq("w")).crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf").cast("double") *
        log(col("n_corpus_docs").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("sid"))
      .orderBy(col("tfidf").desc, col("w").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("sid"), col("w").as("keyword"), col("rk"), col("tfidf"))
  }

  /** [[tfidfKeywords]] with EXACT-DUPLICATE COLLAPSE (identical rows,
    * OpsSpec-asserted): tf is a pure function of the text; df and N
    * are weighted sums over classes; scores and the per-doc rank
    * window are therefore class constants that expand to members. The
    * word explode and the rank window run at rep scale. */
  def tfidfKeywordsCollapsed(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = Dedup.cloneClasses(df, idCol, textCol).persist(lvl)
    val words = classes.select(col("rep").as("sid"), col("w").as("__cw0"),
        explode(split(trim(col("__text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val tf = words.groupBy("sid", "w")
      .agg(count(lit(1)).as("tf"), first(col("__cw0")).as("__cw0"))
    val dfreq = tf.groupBy("w").agg(sum(col("__cw0")).as("df"))
    val nDocs = classes.filter(length(trim(col("__text"))) > 0)
      .agg(coalesce(sum(col("w")), lit(0L)).as("n_corpus_docs"))
    val scored = tf.join(dfreq, Seq("w")).crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf").cast("double") *
        log(col("n_corpus_docs").cast("double") / col("df").cast("double")), 6))
    val win = Window.partitionBy(col("sid"))
      .orderBy(col("tfidf").desc, col("w").asc)
    val repOut = scored.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("sid"), col("w").as("keyword"), col("rk"), col("tfidf"))
    val out = repOut
      .join(classes.select(col("rep").as("sid"), col("members")), "sid")
      .select(explode(col("members")).as("sid"), col("keyword"),
        col("rk"), col("tfidf"))
      .localCheckpoint(true)
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** [[pmiCollocations]] with EXACT-DUPLICATE COLLAPSE (identical
    * rows): unigram/bigram counts and their totals are weighted sums
    * over distinct texts — every count the PMI formula reads is the
    * direct integer, so scores match to the bit. */
  def pmiCollocationsCollapsed(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val ws = Dedup.cloneClasses(df, idCol, textCol).select(col("w").as("__k0"),
      filter(split(trim(col("__text")), "\\s+"), x => x =!= lit("")).as("__ws"))
    val uni = ws.select(col("__k0"), explode(col("__ws")).as("__w"))
      .groupBy(col("__w")).agg(sum(col("__k0")).as("__cw"))
    val totalWords = uni.agg(sum(col("__cw")).as("__tw"))
    val bi = ws.filter(size(col("__ws")) >= 2)
      .select(col("__k0"), explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col("__k0"), col("__p.a").as("a"), col("__p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("__k0")).as("n_pairs"))
    val totalBigrams = bi.agg(sum(col("n_pairs")).as("__tb"))
    bi.filter(col("n_pairs") >= minCount)
      .join(broadcast(uni.select(col("__w").as("a"), col("__cw").as("__ca"))), "a")
      .join(broadcast(uni.select(col("__w").as("b"), col("__cw").as("__cb"))), "b")
      .crossJoin(broadcast(totalWords))
      .crossJoin(broadcast(totalBigrams))
      .withColumn("pmi", round(log(
        (col("n_pairs").cast("double") * col("__tw").cast("double") * col("__tw").cast("double")) /
          (col("__tb").cast("double") * col("__ca").cast("double") * col("__cb").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("n_pairs"), col("pmi"))
  }

  /** Portable 60-bit hash of an id rendered as a string: the
    * md5-prefix family shared with the shingle hashes — replayable in
    * any SQL engine, unlike xxhash64/rand. */
  def portableIdHash(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic train/val/test split by id hash: stable across
    * runs, partitionings, and engines (no rand(), no sampleBy seed
    * coupling); a document keeps its split forever, which is what a
    * training pipeline needs for held-out sets. `valPct`/`testPct` are
    * percentages of the 0-99 hash bucket space. */
  def hashSplit(df: DataFrame, idCol: String, valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    val bucket = pmod(portableIdHash(col(idCol)), lit(100))
    df.withColumn("split",
      when(bucket < lit(testPct), "test")
        .when(bucket < lit(testPct + valPct), "val")
        .otherwise("train"))
  }

  /** Weighted reservoir sample, k per group (Efraimidis–Spirakis
    * A-ES): each row draws u ∈ (0, 1] from its portable id hash and
    * ranks by key = u^(1/w) — the top-k keys per group are a
    * weight-proportional sample WITHOUT replacement. Deterministic
    * twice over: u is the md5-prefix hash (no rand(), replayable in
    * any engine) and the key rounds 6 dp with id tie-break before
    * ranking (cross-engine pow ulps cannot reorder).
    *
    * Scale shape: the ranking is the [[graft.functions.TopKFunctions
    * .topKHits]] heap aggregate — map-side k-prune, k·partitions rows
    * per group cross the exchange; a row_number window would shuffle
    * and sort EVERY row. Weights must be strictly positive; rows with
    * zero/negative/null weight are FILTERED OUT before the key is
    * computed (u^(1/w) at w ≤ 0 yields Infinity/NaN and degenerates
    * the sample) — a non-positive weight means "never sample", which
    * is exactly what dropping the row implements. */
  def weightedReservoir(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (portableIdHash(col(idCol)).cast("double") + lit(1.0)) /
      lit(math.pow(2.0, 60))
    val key = round(pow(u, lit(1.0) / weightCol.cast("double")), 6)
    df.filter(weightCol.cast("double") > 0.0)
      .select(col(groupCol).as("grp"), col(idCol).cast("long").as("__id"),
        key.as("__key"))
      .groupBy(col("grp"))
      .agg(graft.functions.TopKFunctions.topKHits(
        col("__key"), col("__id"), k).as("hits"))
      .select(col("grp"), posexplode(col("hits")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.score").as("key"))
  }

  /** Leakage-safe train/val/test split: [[hashSplit]]'s bucketing, but
    * keyed by the document's NEAR-DUP CLUSTER representative instead of
    * its own id — near-duplicate documents land in the SAME split by
    * construction, so a test doc can never have a train-set near-copy
    * (the eval-leakage failure mode of naive per-doc splits; cf.
    * benchmark decontamination, which guards against a different leak).
    * Docs with no near-dup keep their own id as key, reproducing
    * [[hashSplit]] exactly for the unduplicated bulk.
    *
    * Scale shape: the pair graph + connected components come from the
    * capped [[Dedup.jaccardPairs]]/[[Dedup.dedupClusters]] machinery
    * (corpus-tiny output by construction); the split itself is a left
    * join against that small cluster table plus the same map-only hash
    * bucketing as [[hashSplit]]. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int, minShared: Int = 1,
      valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val pairs = Dedup.jaccardPairs(df, idCol, textCol, n, threshold,
      maxDocFreq, minShared)
    val clusters = Dedup.dedupClusters(pairs)
    pairs.unpersist()
    leakageSafeSplitWithClusters(df, idCol, clusters, valPct, testPct)
  }

  /** [[leakageSafeSplit]] against a PREBUILT near-dup clustering
    * (columns `sid`, `cluster`) — the form a pipeline uses when the
    * pair graph is already materialized (it is the most expensive
    * artifact in the chain; build once, key every consumer on it). */
  def leakageSafeSplitWithClusters(df: DataFrame, idCol: String,
      clusters: DataFrame, valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val bucket = pmod(portableIdHash(col("split_key")), lit(100))
    df.join(clusters.withColumnRenamed("sid", "__cid"),
        col(idCol) === col("__cid"), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        when(bucket < lit(testPct), "test")
          .when(bucket < lit(testPct + valPct), "val")
          .otherwise("train"))
      .drop("__cid", "cluster")
  }

  /** Deterministic weighted corpus mixing — the data-mixing step of a
    * training run: each source contributes a hash-selected fraction of
    * its rows (fraction 1.0 = all; 0.25 = the quarter of ids whose
    * portable hash falls under the threshold). Membership is a pure
    * function of the id, so re-runs, retries, and other engines select
    * the same rows; sources then union by name. */
  def mixCorpus(sources: Seq[(DataFrame, Double)], idCol: String): DataFrame =
    sources.map { case (df, frac) =>
      require(frac > 0 && frac <= 1.0, s"fraction must be in (0,1], got $frac")
      if (frac >= 1.0) df
      else df.filter(
        pmod(portableIdHash(col(idCol)), lit(10000)) < lit((frac * 10000).toInt))
    }.reduce(_.unionByName(_))

  /** BM25 ranked retrieval for a literal term set — the lexical-search
    * complement to the vector search path (hybrid retrieval needs
    * both). Okapi BM25 with the Lucene-style idf
    * `ln((N - df + 0.5)/(df + 0.5) + 1)`.
    *
    * Scale shape: term frequencies and document length are row-local
    * expressions (map-only); N, per-term document frequencies, and the
    * exact average document length (integer token sum / count — no
    * order-dependent double accumulation) come from ONE global
    * aggregate whose single row is broadcast back; the final ranking is
    * TakeOrdered top-k. Two corpus passes total, no posting-list
    * shuffle — the right trade for a handful of query terms (a full
    * inverted index would pay a corpus-wide explode+shuffle to
    * amortize over many queries).
    *
    * Scores are rounded to 6 dp BEFORE ranking so a last-ulp `ln`
    * difference between engines cannot flip the order; ties break by
    * id. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    val words = split(trim(col(textCol)), "\\s+")
    val tfCols = terms.indices.map(i =>
      size(filter(words, w => w === lit(terms(i)))).cast("double").as(s"__tf$i"))
    val base = df.select(
      col(idCol) +: TextFunctions.tokenCount(col(textCol)).cast("long").as("__dl") +: tfCols: _*)
    val statAggs =
      count(lit(1)).cast("double").as("__n") +:
        (sum(col("__dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl") +:
        terms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).cast("double").as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val dl = col("__dl").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i"); val dfT = col(s"__df$i")
      log((col("__n") - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0)) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("__avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("bm25", round(score, 6))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("bm25"))
  }

  /** [[bm25Search]] with EXACT-DUPLICATE COLLAPSE (identical rows,
    * OpsSpec-asserted): tf and dl are pure functions of the text, so
    * the tokenize/filter passes run once per distinct text; the
    * corpus stats are weighted sums over classes (N = Σw, Σdl =
    * Σ w·dl_rep, df_t = Σw over classes containing t — all exact
    * integers, so avgdl and every idf are the direct doubles to the
    * bit); rep scores are class constants that expand to members
    * before the (score desc, id asc) top-k, which therefore selects
    * the identical docs. The expansion moves only (id, score) pairs —
    * the per-byte work is what collapses. */
  def bm25SearchCollapsed(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = Dedup.cloneClasses(df, idCol, textCol).persist(lvl)
    val words = split(trim(col("__text")), "\\s+")
    val tfCols = terms.indices.map(i =>
      size(filter(words, w => w === lit(terms(i)))).cast("double").as(s"__tf$i"))
    val repBase = classes.select(
      col("rep") +: col("members") +: col("w") +:
        TextFunctions.tokenCount(col("__text")).cast("long").as("__dl") +: tfCols: _*)
    val statAggs =
      sum(col("w")).cast("double").as("__n") +:
        (sum(col("w") * col("__dl")).cast("double") /
          sum(col("w")).cast("double")).as("__avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, col("w")).otherwise(0L))
            .cast("double").as(s"__df$i"))
    val stats = repBase.agg(statAggs.head, statAggs.tail: _*)
    val dl = col("__dl").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i"); val dfT = col(s"__df$i")
      log((col("__n") - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0)) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("__avgdl")))
    }.reduce(_ + _)
    val out = repBase.crossJoin(broadcast(stats))
      .withColumn("bm25", round(score, 6))
      .filter(col("bm25") > 0)
      .select(explode(col("members")).as(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topK)
      .localCheckpoint(true)
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Single-pass CDC chunker kernel: one in-row scan computing the
    * portable 60-bit md5-prefix hash of each full character n-gram
    * (the same hash family as `Dedup.shingleHashesUdf`, so cut points
    * replay in plain SQL as
    * `CAST('0x'||substring(md5(g),1,15) AS BIGINT) % divisor`), cutting
    * where the hash is ≡ 0 mod divisor. Each n-gram extraction is a
    * Java `String.substring` (O(n) copy), so a length-L doc costs
    * O(L·n) — NOT the O(L²) of the declarative
    * `filter(sequence, i -> md5(substring(text, i, n)))` form, whose
    * per-position UTF8String substring seeks from the string start
    * (the anti-pattern documented at Dedup.shingleHashesUdf). Positions
    * are UTF-16 code units vs the SQL replay's codepoints — identical
    * for ASCII/BMP text (same caveat as shingleHashesUdf). */
  private val cdcChunksUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, n: Int, divisor: Int) =>
      if (text == null || text.isEmpty) Array.empty[String]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val len = text.length
        val cuts = new scala.collection.mutable.ArrayBuilder.ofInt
        cuts += 1 // position 1 is always a cut
        var i = 2 // 1-based shingle starts 2..len-n+1: full n-grams only
        val last = len - n + 1
        while (i <= last) {
          md.reset()
          val d = md.digest(text.substring(i - 1, i - 1 + n)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          if (((v >>> 4) % divisor) == 0L) cuts += i // top 60 bits = 15 hex chars
          i += 1
        }
        cuts += len + 1
        val c = cuts.result()
        val out = new Array[String](c.length - 1)
        var k = 0
        while (k < out.length) { out(k) = text.substring(c(k) - 1, c(k + 1) - 1); k += 1 }
        out
      }
    }

  /** Content-defined chunking: chunk boundaries where the portable
    * 60-bit hash of the local character n-gram is ≡ 0 mod `divisor`
    * (expected chunk length ≈ divisor chars) — the dedup-friendly
    * chunker: because boundaries depend only on LOCAL content, an
    * insertion near the start shifts only the chunks up to the next
    * boundary, where a fixed-size chunker re-cuts the whole document
    * (so downstream chunk-level dedup keeps matching — see the
    * `chunk_cdc_dedup` query for the end-to-end property).
    *
    * One map stage: the [[cdcChunksUdf]] kernel emits the chunk list
    * in a single in-row pass, then posexplode yields
    * (id, chunk_idx, chunk_text). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, divisor: Int = 64): DataFrame = {
    require(n > 0 && divisor > 0, "n and divisor must be positive")
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        posexplode(cdcChunksUdf(col(textCol), lit(n), lit(divisor)))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_idx", (col("chunk_idx") + 1).cast("long"))
  }

  /** CDC dedup stability, end-to-end: chunk the corpus AND a
    * prefix-edited copy of every doc with [[contentDefinedChunks]],
    * exact-dedup chunk text with [[Dedup.exact]], and report reuse
    * counters in one row. Because cut points depend only on local
    * content, the edit re-cuts only the first chunk(s); the rest
    * hash-match the original doc's chunks and collapse under exact
    * dedup — expected reuse_pct ≈ 1 - divisor/len per doc (a
    * fixed-size chunker scores ~0 on the same edit).
    *
    * Scale shape: the chunkers are one map stage each; the reuse
    * check is a left-semi join on distinct original chunk text; the
    * three 1-row stat frames cross-join at the end. */
  def cdcDedupStats(df: DataFrame, idCol: String, textCol: String,
      editPrefix: String, n: Int = 8, divisor: Int = 64): DataFrame = {
    // tag provenance in a string id so it survives the chunker's
    // (id, chunk_idx, chunk_text) projection
    val tagged = df
      .select(concat(lit("o:"), col(idCol)).as("cid"), col(textCol).as("text"))
      .unionByName(df.select(concat(lit("e:"), col(idCol)).as("cid"),
        concat(lit(editPrefix), col(textCol)).as("text")))
    val chunks = contentDefinedChunks(tagged, "cid", "text", n, divisor)
    // unique, deterministic per-row key for exact dedup's winner pick
    val keyed = chunks.withColumn("chunk_key",
      concat_ws("#", col("cid"), col("chunk_idx")))
    val survivors = Dedup.exact(keyed, "chunk_key", "chunk_text")
      .agg(count(lit(1)).as("surviving_chunks"))
    val counts = chunks.agg(
      count(lit(1)).as("total_chunks"),
      sum(when(col("cid").startsWith("o:"), 1L).otherwise(0L)).as("orig_chunks"),
      sum(when(col("cid").startsWith("e:"), 1L).otherwise(0L)).as("edited_chunks"))
    val origTexts = chunks.filter(col("cid").startsWith("o:"))
      .select("chunk_text").distinct()
    val reused = chunks.filter(col("cid").startsWith("e:"))
      .join(origTexts, Seq("chunk_text"), "left_semi")
      .agg(count(lit(1)).as("reused_chunks"))
    counts.crossJoin(survivors).crossJoin(reused)
      .select(col("total_chunks"), col("orig_chunks"), col("edited_chunks"),
        col("surviving_chunks"), col("reused_chunks"),
        round(col("reused_chunks").cast("double") / col("edited_chunks"), 6)
          .as("reuse_pct"))
  }

  /** [[cdcDedupStats]] with EXACT-DUPLICATE COLLAPSE (identical single
    * output row, OpsSpec-asserted). Clones produce identical chunk
    * multisets (the chunker is a pure function of the text), so:
    * total/orig/edited/reused counts are weighted sums over rep
    * chunks; `surviving_chunks` — the exact-dedup winner count — is
    * the number of DISTINCT chunk texts, a set clones cannot grow, so
    * the rep-side distinct count is the corpus value verbatim. The
    * per-position md5 chunk scan (the query's whole cost) runs once
    * per distinct text. */
  def cdcDedupStatsCollapsed(df: DataFrame, idCol: String, textCol: String,
      editPrefix: String, n: Int = 8, divisor: Int = 64): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = Dedup.cloneClasses(df, idCol, textCol).persist(lvl)
    val tagged = classes
      .select(col("w"), concat(lit("o:"), col("rep")).as("cid"),
        col("__text").as("text"))
      .unionByName(classes.select(col("w"),
        concat(lit("e:"), col("rep")).as("cid"),
        concat(lit(editPrefix), col("__text")).as("text")))
    val weights = tagged.select(col("cid"), col("w"))
    val chunks = contentDefinedChunks(tagged, "cid", "text", n, divisor)
      .join(weights, "cid")
      .persist(lvl)
    val survivors = chunks.select(col("chunk_text")).distinct()
      .agg(count(lit(1)).as("surviving_chunks"))
    val counts = chunks.agg(
      coalesce(sum(col("w")), lit(0L)).as("total_chunks"),
      coalesce(sum(when(col("cid").startsWith("o:"), col("w")).otherwise(0L)),
        lit(0L)).as("orig_chunks"),
      coalesce(sum(when(col("cid").startsWith("e:"), col("w")).otherwise(0L)),
        lit(0L)).as("edited_chunks"))
    val origTexts = chunks.filter(col("cid").startsWith("o:"))
      .select("chunk_text").distinct()
    val reused = chunks.filter(col("cid").startsWith("e:"))
      .join(origTexts, Seq("chunk_text"), "left_semi")
      .agg(coalesce(sum(col("w")), lit(0L)).as("reused_chunks"))
    val out = counts.crossJoin(survivors).crossJoin(reused)
      .select(col("total_chunks"), col("orig_chunks"), col("edited_chunks"),
        col("surviving_chunks"), col("reused_chunks"),
        round(col("reused_chunks").cast("double") / col("edited_chunks"), 6)
          .as("reuse_pct"))
      .localCheckpoint(true)
    chunks.unpersist()
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Corpus snapshot diff — the dataset-versioning primitive: given
    * two corpus versions keyed by `idCol`, classify every id as
    * `added` (new only), `removed` (old only), `changed` (both, text
    * hash differs), or `unchanged`. Content compares by sha256, never
    * by full text equality on the join (hashes are 32 bytes; documents
    * can be megabytes).
    *
    * Scale shape: each side reduces to (id, hash) in a map stage, then
    * ONE full-outer join on the id key — a key-partitioned sort-merge
    * by necessity (both sides are corpus-sized and FULL OUTER keeps
    * every row, so neither can broadcast); only 40-byte (id, hash)
    * rows shuffle, never document text. Emits non-`unchanged` rows
    * only by default (a 100 TB diff is read for its deltas;
    * `keepUnchanged` for audits). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, keepUnchanged: Boolean = false): DataFrame = {
    val o = oldDf.select(col(idCol), sha2(col(textCol), 256).as("__oh"))
    val nw = newDf.select(col(idCol), sha2(col(textCol), 256).as("__nh"))
    val status = when(col("__oh").isNull, "added")
      .when(col("__nh").isNull, "removed")
      .when(col("__oh") =!= col("__nh"), "changed")
      .otherwise("unchanged")
    val d = o.join(nw, Seq(idCol), "full_outer")
      .select(col(idCol), status.as("status"))
    if (keepUnchanged) d else d.filter(col("status") =!= "unchanged")
  }

  /** Mean unigram log-probability under the corpus's own unigram LM —
    * the CCNet-style fluency/quality proxy (docs of common words score
    * high, gibberish and rare-token soup score low).
    *
    * Scale shape: one token explode, a count aggregation for the
    * frequency table, then a join back on the word key — vocabulary is
    * sublinear in corpus size (Heaps' law), so AQE turns the frequency
    * side into a broadcast at any realistic scale; hot stopword keys
    * skew the explode join's build side, not the stream side. Mean
    * log-prob is rounded to 6 dp (per-doc ln() summation order and a
    * last-ulp ln() divergence both vanish at that precision). */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol),
        explode(split(regexp_replace(col(textCol), "^\\s+|\\s+$", ""), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
    val freqs = words.groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
    val total = words.agg(count(lit(1)).as("__tc"))
    words.join(freqs, "__w").crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(col("__wc").cast("double") / col("__tc").cast("double"))).as("__lp"))
      .select(col(idCol), col("n_tokens"),
        round(col("__lp") / col("n_tokens").cast("double"), 6).as("mean_logprob"))
  }

  /** [[unigramLogProb]] with EXACT-DUPLICATE COLLAPSE (identical rows
    * up to the documented 6dp-round tolerance on the double log sum,
    * OpsSpec-asserted): word frequencies and the token total are
    * weighted sums over distinct texts, and a doc's mean log-prob is a
    * pure function of its text given those counts — rep scores expand
    * to clone members. The corpus word explode runs once per distinct
    * text. */
  def unigramLogProbCollapsed(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = Dedup.cloneClasses(df, idCol, textCol).persist(lvl)
    val words = classes.select(col("rep"), col("w"),
        explode(split(regexp_replace(col("__text"), "^\\s+|\\s+$", ""), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
    val freqs = words.groupBy(col("__w")).agg(sum(col("w")).as("__wc"))
    val total = words.agg(coalesce(sum(col("w")), lit(0L)).as("__tc"))
    val repScores = words.join(freqs, "__w").crossJoin(broadcast(total))
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(col("__wc").cast("double") / col("__tc").cast("double"))).as("__lp"))
    val out = repScores
      .join(classes.select(col("rep"), col("members")), "rep")
      .select(explode(col("members")).as(idCol), col("n_tokens"),
        round(col("__lp") / col("n_tokens").cast("double"), 6).as("mean_logprob"))
      .localCheckpoint(true)
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Deterministic stratified RATE sampling — the per-domain /
    * per-language downsampling step of a training-data mix: keep a row
    * iff its portable id-hash bucket (0-9999) falls under its stratum's
    * rate. Membership is a pure function of the id (no rand(), no seed
    * coupling), so re-runs, retries, and other engines keep the same
    * rows. Map-only — no shuffle at any corpus size. Strata missing
    * from `rates` use `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.toSeq.map(_._2) :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(
      pmod(portableIdHash(col(idCol)), lit(10000)) < (rate * 10000).cast("long"))
  }

  /** Deterministic stratified QUOTA sampling: the `quota` rows with the
    * smallest portable id-hash per stratum, ranked as `sample_rank` — a
    * fixed-size "random" sample that is stable across engines and runs.
    *
    * Scale shape: strata are few (languages, sources) while rows are
    * billions, so a single row_number window per stratum would sort the
    * whole corpus on a handful of reducers. Instead a two-stage prune:
    * a local top-`quota` per (stratum, id-hash shard) — `shards`-way
    * parallel, keeps ≤ shards·quota rows per stratum, and provably
    * retains every global top-`quota` row (a row's shard rank lower-
    * bounds its stratum rank) — then the exact global rank over that
    * pruned sliver. */
  def stratifiedQuota(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int, shards: Int = 64): DataFrame = {
    require(quota > 0 && shards > 0, "quota and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val shard = pmod(portableIdHash(col(idCol)), lit(shards))
    val wLocal = w.partitionBy(col(stratumCol), col("__shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    val wGlobal = w.partitionBy(col(stratumCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", portableIdHash(col(idCol)))
      .withColumn("__shard", shard)
      .withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= quota)
      .withColumn("sample_rank", row_number().over(wGlobal))
      .filter(col("sample_rank") <= quota)
      .drop("__h", "__shard", "__lr")
  }

  /** Token-budget sampling per stratum — the "N tokens per source"
    * curation step of a training-data mix: within each stratum, keep
    * documents in portable-hash priority order while the INCLUSIVE
    * running token total stays ≤ `budget`, stopping at the first
    * crossing (prefix semantics: a doc that crosses the budget blocks
    * everything after it — the deterministic, engine-replayable cut;
    * greedy skip-and-continue would fill tighter but couples every
    * keep decision to every earlier doc's size).
    *
    * Scale shape (the [[stratifiedQuota]] argument, on sums instead
    * of ranks): a per-stratum ordered cumsum window would sort whole
    * strata on single reducers, so stage 1 runs the cumsum per
    * (stratum, id-hash shard) and keeps rows whose EXCLUSIVE
    * shard-local prefix is ≤ budget — i.e. the shard's own kept
    * prefix PLUS its first crossing row. Keeping each shard's first
    * crosser is load-bearing: the stratum's first GLOBAL crosser is
    * some shard's first local crosser (prefix sums are monotone and
    * the shard order is the global order restricted), and stage 2
    * needs that row's mass in the sliver — its sliver cumsum then
    * crosses the budget at or before the true crossing point, so the
    * exact global pass over the sliver reproduces the full-data cut
    * (every globally-kept row's predecessors are all kept, hence all
    * in the sliver, hence its sliver cumsum is exact; every
    * globally-dropped sliver row sits at or after the first crosser,
    * whose sliver cumsum already exceeds the budget). Survivors are
    * bounded by ~budget tokens + one row per (stratum, shard), never
    * the corpus. Returns kept rows with `n_tokens` and the inclusive
    * `cum_tokens`. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val wLocalExcl = w.partitionBy(col(stratumCol), col("__shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wGlobal = w.partitionBy(col(stratumCol))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__h", portableIdHash(col(idCol)))
      .withColumn("__shard", pmod(col("__h"), lit(shards)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("__lbefore", coalesce(sum(col("n_tokens")).over(wLocalExcl), lit(0L)))
      .filter(col("__lbefore") <= budget)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wGlobal))
      .filter(col("cum_tokens") <= budget)
      .drop("__h", "__shard", "__lbefore")
  }

  /** Greedy sequence packing: assign docs (in id order within a hash
    * shard) to fixed token-budget bins — the batch-construction step of
    * a training pipeline. A doc starts in the bin its cumulative token
    * count (exclusive) falls into; long docs may overflow their bin,
    * greedy semantics. Sharding keys the window so the cumulative sum
    * parallelizes (one global ordered window would single-thread). */
  def tokenPacking(df: DataFrame, idCol: String, textCol: String,
      tokensPerBin: Int, numShards: Int = 8): DataFrame = {
    val shard = pmod(col(idCol), lit(numShards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shard.cast("long"))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", (col("cum_before") / tokensPerBin).cast("long"))
  }

  /** Deterministic global shuffle + shard assignment — the final
    * write-side step of a training-data pipeline: every row gets a
    * shard (portable id-hash mod numShards, so shard membership is
    * stable across runs and engines) and a position within its shard
    * (rank by (hash, id) — the hash ordering IS the shuffle; id breaks
    * the rare hash tie). Downstream loaders read shard files
    * sequentially and see a reproducible random document order.
    *
    * Scale shape: ONE exchange on the shard key, then a per-shard sort
    * — each shard sorts |N|/numShards rows independently, so the knob
    * for 100 TB is numShards (100k shards ⇒ ~1 GB sorts), never a
    * global order-by. */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", portableIdHash(col(idCol)))
      .withColumn("shard", pmod(col("__h"), lit(numShards)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__h")
  }

  /** Temperature-weighted source mixing (the multinomial-sampling rule
    * of multilingual/multi-domain training runs, e.g. mBERT/XLM-R):
    * group g with share p_g = n_g/N is sampled with probability
    * q_g ∝ p_g^(1/T), so T > 1 up-samples small groups (T = 1 is
    * proportional, T → ∞ uniform). With a total budget of
    * `sampleFrac · N` rows, group g's keep-rate is
    * min(1, sampleFrac · N · q_g / n_g). Membership is the portable
    * id-hash against the per-group rate snapped to basis points —
    * deterministic, engine-replayable, re-run-stable (same contract as
    * [[mixCorpus]], but rates are DERIVED from group sizes instead of
    * caller-fixed).
    *
    * Scale shape: one grouped count (tiny — one row per group), rates
    * computed on that aggregate, broadcast back; membership is a
    * map-only hash compare. Two corpus scans total, no shuffle of data
    * rows. */
  def mixTemperature(df: DataFrame, idCol: String, groupCol: String,
      temperature: Double, sampleFrac: Double): DataFrame = {
    require(temperature > 0 && sampleFrac > 0 && sampleFrac <= 1.0,
      s"need temperature > 0 and sampleFrac in (0,1], got T=$temperature frac=$sampleFrac")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__ng"))
    val tot = counts.agg(sum(col("__ng")).as("__n"),
      sum(pow(col("__ng").cast("double"), lit(1.0 / temperature))).as("__z"))
    // keep-rate per group in basis points, rounded once so a last-ulp
    // pow() difference between engines cannot move the hash threshold
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__bp", least(lit(10000L),
        round(lit(sampleFrac) * col("__n") *
          (pow(col("__ng").cast("double"), lit(1.0 / temperature)) / col("__z")) /
          col("__ng") * 10000.0).cast("long")))
      .select(col(groupCol), col("__bp"))
    df.join(broadcast(rates), groupCol)
      .filter(pmod(portableIdHash(col(idCol)), lit(10000)) < col("__bp"))
      .drop("__bp")
  }

  /** Power-of-two sequence-length histogram — the corpus profile a
    * packing/curriculum planner reads before choosing context length
    * and bin budgets. Bucket = bit length of the token count (0 for
    * empty docs), i.e. bucket b holds docs with 2^(b-1) ≤ tokens < 2^b;
    * integer-exact in any engine (no log/float). One partial-agg
    * shuffle of ≤ 64 groups. */
  def lengthHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(TextFunctions.tokenCount(col(textCol)).cast("long").as("__t"))
      .select(col("__t"),
        when(col("__t") === 0, lit(0))
          .otherwise(length(conv(col("__t"), 10, 2))).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("total_tokens"),
        min(col("__t")).as("min_tokens"), max(col("__t")).as("max_tokens"))

  /** Vocabulary coverage curve — the tokenizer-design profile: for
    * each candidate vocab size k, what fraction of corpus TOKEN
    * OCCURRENCES the top-k words (count desc, word asc — the
    * deterministic rank every engine replays) would cover. Answers
    * "how big must the vocab be before OOV is rare" before any
    * BPE/WordPiece training run.
    *
    * Scale shape: word counts = one partial-agg groupBy; the ranking
    * touches only the top max(sizes) rows (TakeOrdered — the
    * Heaps-law full vocab is never globally sorted); the cumulative
    * sum runs over that bounded table (≤ max(sizes) rows, driver-small
    * by construction). Integer-exact counts, coverage rounded 6 dp. */
  def vocabCoverage(df: DataFrame, textCol: String, sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ > 0), "sizes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totRow = counts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("t"),
      count(lit(1)).as("v")).head()
    val (total, vTypes) = (totRow.getLong(0), totRow.getLong(1))
    val top = counts
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(sizes.max)
      .as[(String, Long)].collect() // ≤ max(sizes) rows — bounded
    counts.unpersist()
    val cum = top.scanLeft(0L)(_ + _._2).drop(1)
    sizes.distinct.sorted.map { k =>
      val kEff = math.min(k, top.length)
      val covered = if (kEff == 0) 0L else cum(kEff - 1)
      (k, math.min(k.toLong, vTypes), covered, total,
        if (total == 0) 0.0 else math.round(covered.toDouble / total * 1e6) / 1e6)
    }.toDF("vocab_size", "n_types", "covered_tokens", "total_tokens", "coverage")
  }

  /** Per-source OOV rate against the corpus top-`vocabSize` vocabulary
    * — the source-mix health check [[vocabCoverage]] globalizes: a
    * source whose tokens fall outside the shared vocab will tokenize
    * into fragments/UNKs. Reference vocab = top-k by (count desc, word
    * asc) over the WHOLE corpus (broadcast semi-join back); counts
    * integer-exact, rate 6 dp. One groupBy for the vocab, one for the
    * rollup. */
  def sourceOovRate(df: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = df.select(col(groupCol).as("grp"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("grp"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Blocklist scoring — the word-list screen of a quality pipeline
    * (profanity/boilerplate/spam-term lists): per doc, total occurrences
    * of the listed terms among its whitespace tokens and the hit ratio,
    * flagged when the ratio crosses `maxRatio`. Terms are plan
    * literals (lists are ~10²-10⁴ terms — executor-local by
    * construction); the whole op is row-local map-only, codegen'd
    * `filter(words, ...)` per term, no UDF, no shuffle. */
  def blocklistScore(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], maxRatio: Double = 0.1): DataFrame = {
    require(terms.nonEmpty, "blocklistScore needs at least one term")
    val words = split(trim(col(textCol)), "\\s+")
    val hits = terms.map(t => size(filter(words, w => w === lit(t))).cast("long"))
      .reduce(_ + _)
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("n_hits", when(col("n_tokens") === 0, 0L).otherwise(hits))
      .withColumn("hit_ratio", round(when(col("n_tokens") === 0, 0.0)
        .otherwise(col("n_hits").cast("double") / col("n_tokens")), 6))
      .withColumn("flagged", col("hit_ratio") > lit(maxRatio))
  }

  /** Top-`k` adjacent-word collocations by pointwise mutual information
    * — PMI(a,b) = ln(p(a,b) / (p(a)·p(b))) with p(a,b) over adjacent
    * bigram occurrences and p(a) over unigram occurrences; the classic
    * collocation-extraction pass (Church & Hanks 1990) a corpus-analysis
    * pipeline runs to find multi-word terms. `minCount` suppresses the
    * low-count pairs whose PMI is all noise.
    *
    * Scale shape: one token explode + one bigram explode, each a
    * partial-aggregating count; the unigram table is vocabulary-sized
    * (sublinear, Heaps' law) so its two joins back onto the bigram
    * counts broadcast; totals are single-row cross-joins. Final ranking
    * is TakeOrdered top-k. PMI is computed in ONE fixed-association
    * double expression and rounded to 6 dp before ranking so an engine
    * replay ranks identically; ties break on the word pair. */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val ws = df.select(
      filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit("")).as("__ws"))
    val uni = ws.select(explode(col("__ws")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cw"))
    val totalWords = uni.agg(sum(col("__cw")).as("__tw"))
    val bi = ws.filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pairs"))
    val totalBigrams = bi.agg(sum(col("n_pairs")).as("__tb"))
    bi.filter(col("n_pairs") >= minCount)
      .join(broadcast(uni.select(col("__w").as("a"), col("__cw").as("__ca"))), "a")
      .join(broadcast(uni.select(col("__w").as("b"), col("__cw").as("__cb"))), "b")
      .crossJoin(broadcast(totalWords))
      .crossJoin(broadcast(totalBigrams))
      .withColumn("pmi", round(log(
        (col("n_pairs").cast("double") * col("__tw").cast("double") * col("__tw").cast("double")) /
          (col("__tb").cast("double") * col("__ca").cast("double") * col("__cb").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("n_pairs"), col("pmi"))
  }

  /** Mean bigram log-probability under the corpus's own add-one
    * (Laplace) smoothed bigram LM — [[unigramLogProb]]'s
    * context-sensitive sibling (CCNet-style fluency, one order up:
    * word-salad docs whose words are individually common score low
    * here): p(b|a) = (c(ab) + 1) / (c(a) + V), V = unigram vocabulary
    * size; score = mean ln p over the doc's adjacent bigrams. Docs
    * with < 2 words emit nothing.
    *
    * Scale shape: one bigram explode + one unigram explode, each
    * count-aggregated; the unigram and bigram frequency tables are
    * vocabulary-sized (sublinear) so their joins back broadcast under
    * AQE; V is a 1-row cross join. Mean rounded to 6 dp (ln summation
    * order, as in [[unigramLogProb]]). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = df.select(col(idCol),
      filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit("")).as("__ws"))
    val bi = ws.filter(size(col("__ws")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col(idCol), col("__p.a").as("__a"), col("__p.b").as("__b"))
    val uni = ws.select(explode(col("__ws")).as("__a"))
      .groupBy(col("__a")).agg(count(lit(1)).as("__ca"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val biCounts = bi.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__cab"))
    bi.join(biCounts, Seq("__a", "__b"))
      .join(uni, Seq("__a"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log((col("__cab").cast("double") + lit(1.0)) /
          (col("__ca").cast("double") + col("__v").cast("double")))).as("__lp"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__lp") / col("n_bigrams").cast("double"), 6).as("mean_bigram_logprob"))
  }

  /** [[bigramLogProb]] with EXACT-DUPLICATE COLLAPSE (identical rows
    * up to the documented 6dp-round tolerance on the double log sum,
    * OpsSpec-asserted): unigram/bigram counts are weighted sums over
    * distinct texts (the vocabulary — distinct words — is unchanged:
    * clones add no new words), and a doc's mean bigram log-prob is a
    * pure function of its text given those counts. The two corpus
    * explodes run once per distinct text. */
  def bigramLogProbCollapsed(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = Dedup.cloneClasses(df, idCol, textCol).persist(lvl)
    val ws = classes.select(col("rep"), col("w"),
      filter(split(trim(col("__text")), "\\s+"), x => x =!= lit("")).as("__ws"))
    val bi = ws.filter(size(col("__ws")) >= 2)
      .select(col("rep"), col("w"), explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col("rep"), col("w"), col("__p.a").as("__a"), col("__p.b").as("__b"))
    val uni = ws.select(col("w"), explode(col("__ws")).as("__a"))
      .groupBy(col("__a")).agg(sum(col("w")).as("__ca"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val biCounts = bi.groupBy(col("__a"), col("__b")).agg(sum(col("w")).as("__cab"))
    val repScores = bi.drop("w").join(biCounts, Seq("__a", "__b"))
      .join(uni, Seq("__a"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log((col("__cab").cast("double") + lit(1.0)) /
          (col("__ca").cast("double") + col("__v").cast("double")))).as("__lp"))
    val out = repScores
      .join(classes.select(col("rep"), col("members")), "rep")
      .select(explode(col("members")).as(idCol), col("n_bigrams"),
        round(col("__lp") / col("n_bigrams").cast("double"), 6).as("mean_bigram_logprob"))
      .localCheckpoint(true)
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** C4 line filter (Raffel et al. 2020 §2.2, the "clean" rules'
    * line-level subset): keep only lines that end in terminal
    * punctuation AND carry ≥ `minWords` words; a doc survives iff ≥
    * `minLines` lines remain. This is the TRANSFORM companion of the
    * [[lineStats]] signals — C4 rewrites docs line-by-line rather than
    * dropping them whole. Pure array expressions per row (split /
    * filter / array_join — no explode, no shuffle): a 100 TB pass is
    * one map stage. Regex `[.!?"]$` is RE2-safe for the oracle. */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 2): DataFrame = {
    val trimmed = transform(split(col(textCol), "\n"), l => trim(l))
    val keptLines = filter(trimmed, l =>
      l =!= "" && size(split(l, "\\s+")) >= minWords && l.rlike("[.!?\"]$"))
    df.select(col(idCol),
        array_join(keptLines, "\n").as("cleaned_text"),
        size(keptLines).cast("long").as("n_lines_kept"),
        (size(filter(trimmed, l => l =!= "")) - size(keptLines)).cast("long")
          .as("n_lines_dropped"))
      .withColumn("kept", col("n_lines_kept") >= minLines)
  }

  /** Corpus-wide paragraph dedup (the CCNet/RefinedWeb pass: boilerplate
    * paragraphs — nav text, legal footers — repeat across millions of
    * pages; the FIRST occurrence corpus-wide survives, every later
    * copy is excised while its document survives). Winner per
    * paragraph hash = min (doc, pos) — deterministic. Scale shape: one
    * paragraph explode, one per-hash min-struct partial agg (counts
    * and mins, never lists), a semi-join back, and the per-doc
    * sorted-struct rebuild of [[graft.ops.Dedup.removeDuplicatedSpans]].
    * Every doc row returns; a fully-boilerplate non-winner comes back
    * empty. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df.select(col(idCol).as("sid"),
        posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
      .withColumn("ph", sha2(col("para"), 256))
    val winners = paras.groupBy(col("ph"))
      .agg(min(struct(col("sid"), col("pos"))).as("__w"))
      .select(col("ph"), col("__w.sid").as("sid"), col("__w.pos").as("pos"))
    val kept = paras.join(winners, Seq("ph", "sid", "pos"), "left_semi")
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_paras_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x.getField("para")), "\n\n").as("cleaned_text"))
    val totals = df.select(col(idCol).as("sid"),
      size(filter(transform(split(col(textCol), "\n\n"), p => trim(p)),
        p => p =!= "")).cast("long").as("__total"))
    totals.join(kept, Seq("sid"), "left")
      .select(col("sid"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"),
        (col("__total") - coalesce(col("n_paras_kept"), lit(0L))).as("n_paras_dropped"))
  }

  /** [[dedupParagraphs]] with EXACT-DUPLICATE COLLAPSE (identical rows,
    * OpsSpec-asserted), the 2-variant keeper rule: clone-class reps are
    * min-id, so a paragraph's global min-(doc, pos) winner always has a
    * REP doc id (any doc containing it has a rep ≤ it with the same
    * text) — running the op over reps alone computes every rep's row
    * exactly. A non-rep member keeps NOTHING (its own rep holds every
    * one of its paragraphs at a smaller id), so its row is derivable
    * from the rep's: empty text, 0 kept, kept+dropped dropped.
    * `mlOf` builds the (pure-text) multi-line input from the raw text
    * column. Eager; returns a localCheckpoint-backed frame (no unpersist contract). */
  def dedupParagraphsCollapsedWithClasses(classes: DataFrame,
      mlOf: Column => Column): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val repOut = dedupParagraphs(
      classes.select(col("rep").as("sid"), mlOf(col("__text")).as("__ml")),
      "sid", "__ml")
    val out = repOut
      .join(classes.select(col("rep"), col("members")),
        repOut("sid") === col("rep"))
      .select(explode(col("members")).as("__mid"), col("rep"),
        col("cleaned_text"), col("n_paras_kept"), col("n_paras_dropped"))
      .select(col("__mid").as("sid"),
        when(col("__mid") === col("rep"), col("cleaned_text"))
          .otherwise(lit("")).as("cleaned_text"),
        when(col("__mid") === col("rep"), col("n_paras_kept"))
          .otherwise(lit(0L)).as("n_paras_kept"),
        when(col("__mid") === col("rep"), col("n_paras_dropped"))
          .otherwise(col("n_paras_kept") + col("n_paras_dropped"))
          .as("n_paras_dropped"))
      .localCheckpoint(true)
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Incremental paragraph dedup against a PERSISTED hash index — the
    * cross-batch form of [[dedupParagraphs]] for incremental ingest:
    * a paragraph seen in ANY earlier batch is excised (first writer
    * wins, the streaming-ingest analogue of the batch op's min-(doc,
    * pos) winner); within the batch the batch rule applies. The index
    * is an add-only set of paragraph hashes partitioned by a 64-way
    * hash bucket, so each batch reads ONLY its touched buckets
    * (partition-pruned anti-join) and appends only new hashes — work
    * per batch is O(batch + touched buckets), independent of corpus
    * history. A `state.json` batch-id fence keeps the INDEX
    * exactly-once under redelivery (hashes never double-commit); a
    * replayed trigger's recomputed OUTPUT sees the already-updated
    * index, so pair the stream with an idempotent downstream sink
    * (e.g. [[graft.store.SnapshotLog.appendIdempotent]], which drops
    * the replayed batch whole). Returns the batch's cleaned docs
    * (every doc row returns; fully-boilerplate docs come back
    * empty). */
  def dedupParagraphsIncremental(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, textCol: String,
      batchId: Long = -1L): DataFrame = {
    val statePath = java.nio.file.Paths.get(indexDir, "state.json")
    val hashesPath = s"$indexDir/hashes"
    val fence =
      if (!java.nio.file.Files.exists(statePath)) -1L
      else new String(java.nio.file.Files.readAllBytes(statePath)).trim.toLong
    val paras = batch.select(col(idCol).as("sid"),
        posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
      .withColumn("ph", sha2(col("para"), 256))
      .withColumn("bucket", pmod(conv(substring(col("ph"), 1, 15), 16, 10)
        .cast("long"), lit(64)))
    // in-batch winners (the batch op's min-(doc, pos) rule)
    val winners = paras.groupBy(col("ph"))
      .agg(min(struct(col("sid"), col("pos"))).as("__w"))
      .select(col("ph"), col("__w.sid").as("sid"), col("__w.pos").as("pos"))
    val inBatchKept = paras.join(winners, Seq("ph", "sid", "pos"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = inBatchKept.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val hasIndex = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(hashesPath))
    val kept =
      if (!hasIndex || touched.isEmpty) inBatchKept
      else inBatchKept.join(
        spark.read.parquet(hashesPath)
          .filter(col("bucket").isin(touched: _*)).select(col("ph")),
        Seq("ph"), "left_anti")
    val keptRows = kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rebuilt = {
      val agg = keptRows.groupBy(col("sid"))
        .agg(count(lit(1)).as("n_paras_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")), "\n\n").as("cleaned_text"))
      val totals = batch.select(col(idCol).as("sid"),
        size(filter(transform(split(col(textCol), "\n\n"), p => trim(p)),
          p => p =!= "")).cast("long").as("__total"))
      totals.join(agg, Seq("sid"), "left")
        .select(col("sid"),
          coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
          coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"),
          (col("__total") - coalesce(col("n_paras_kept"), lit(0L))).as("n_paras_dropped"))
        .localCheckpoint(true) // decouple from the caches released below
    }
    // commit the new hashes AFTER computing the result, fenced
    if (batchId > fence) {
      val newHashes = keptRows.select(col("ph"), col("bucket")).distinct()
      if (!newHashes.isEmpty) {
        newHashes.write.mode("append").partitionBy("bucket").parquet(hashesPath)
      }
      val tmp = statePath.resolveSibling("state.json.tmp")
      java.nio.file.Files.write(tmp, batchId.toString.getBytes)
      java.nio.file.Files.move(tmp, statePath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    inBatchKept.unpersist(); keptRows.unpersist()
    rebuilt
  }

  /** Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" §4 — the web-scale LM
    * recipe: raw relative frequencies with a fixed backoff multiplier
    * α, NO discounting/normalization, because at corpus scale
    * smoothing's statistical edge vanishes while its global
    * normalization pass does not). Per doc: mean log score over
    * trigram positions,
    *   S(c|a,b) = c₃(abc)/c₂(ab)            if the trigram was seen
    *            = α·c₂(bc)/c₁(b)            else if the bigram was
    *            = α²·(c₁(c)+1)/(N+V)        else (Laplace floor so
    *                                          OOV words stay defined
    *                                          — our one deviation
    *                                          from the paper's c/N).
    *
    * Counts come from `corpus`, scores go to `score` — the production
    * shape (score incoming/held-out docs against the corpus LM); a
    * self-scored corpus never exercises the backoff branches because
    * every trigram of every doc is in its own count table.
    *
    * Scale shape: three partial-aggregating count tables (uni/bi/tri —
    * vocabulary-sized, Heaps-sublinear in the corpus) joined back onto
    * the exploded trigram positions on their gram keys; the totals row
    * broadcasts. No normalization pass touches the corpus — the
    * entire point of the algorithm. Log-sum rounds 6 dp at the end
    * (the bigram_lm convention). */
  def stupidBackoffScore(score: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    def words(df: DataFrame, keep: Seq[Column]) = df.select(keep :+
      filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit("")).as("__ws"): _*)
    val cws = words(corpus, Seq.empty)
    val uni = cws.select(explode(col("__ws")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c1"))
    val totals = uni.agg(sum(col("__c1")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val bi = cws.filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col("__p.a").as("__a"), col("__p.b").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val triCounts = cws.filter(size(col("__ws")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 2), i -> struct(__ws[i-1] AS a, __ws[i] AS b, __ws[i+1] AS c))"))
        .as("__t"))
      .select(col("__t.a").as("__a"), col("__t.b").as("__b"), col("__t.c").as("__c"))
      .groupBy(col("__a"), col("__b"), col("__c")).agg(count(lit(1)).as("__c3"))
    val tri = words(score, Seq(col(idCol))).filter(size(col("__ws")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ws) - 2), i -> struct(__ws[i-1] AS a, __ws[i] AS b, __ws[i+1] AS c))"))
        .as("__t"))
      .select(col(idCol), col("__t.a").as("__a"), col("__t.b").as("__b"),
        col("__t.c").as("__c"))
    // a seen trigram implies its context bigram and words were seen
    // (they are substrings of that very occurrence), so the branch
    // denominators are never null when their branch fires; the
    // unigram floor is Laplace-smoothed so OOV words stay defined
    val scored = tri
      .join(triCounts, Seq("__a", "__b", "__c"), "left")
      .join(bi.select(col("__a"), col("__b"), col("__c2").as("__c2ab")),
        Seq("__a", "__b"), "left")
      .join(bi.select(col("__a").as("__b"), col("__b").as("__c"),
        col("__c2").as("__c2bc")), Seq("__b", "__c"), "left")
      .join(uni.select(col("__w").as("__b"), col("__c1").as("__c1b")),
        Seq("__b"), "left")
      .join(uni.select(col("__w").as("__c"), col("__c1").as("__c1c")),
        Seq("__c"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s",
        when(col("__c3").isNotNull,
          col("__c3").cast("double") / col("__c2ab").cast("double"))
          .when(col("__c2bc").isNotNull,
            lit(alpha) * col("__c2bc").cast("double") / col("__c1b").cast("double"))
          .otherwise(lit(alpha * alpha) *
            (coalesce(col("__c1c"), lit(0L)).cast("double") + lit(1.0)) /
            (col("__n") + col("__v"))))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(log(col("__s"))) / count(lit(1)).cast("double"), 6)
          .as("mean_sb_logprob"))
  }

  /** Corpus adjacent-character-pair counts within words — the
    * frequency table of BPE training's first merge step (Sennrich et
    * al. 2016: repeatedly merge the most frequent symbol pair; this is
    * iteration 1's candidate ranking, the part that is a corpus-scale
    * aggregation rather than a small driver loop). Top-`k` by count,
    * ties lexicographic.
    *
    * Scale shape (r11, the [[bpeTrain]] trick): corpus pair counts =
    * Σ over DISTINCT words of wordFreq × pairsInWord, so the corpus
    * pass is ONE word-frequency hash aggregate (map-side combine over
    * a tiny vocabulary) and the per-character pair explode runs on the
    * VOCAB-sized table only. The previous form exploded a substring
    * pair row per corpus character — linear, but its row churn was the
    * whole cost of the query at 100× (5G 2-char rows through two
    * explodes); this one's explode is corpus-size-independent. */
  def bpePairStats(df: DataFrame, textCol: String, k: Int = 30): DataFrame = {
    require(k >= 1, "k must be positive")
    df.select(explode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit(""))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
      .filter(length(col("__w")) >= 2)
      .select(col("__cnt"), explode(expr(
        "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("__cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(k)
  }

  /** Sentinel separating tokens in [[bpeTrain]]'s packed string form. */
  val BpeSentinel = "\u0001"

  /** Distributed BPE vocabulary TRAINING (Sennrich et al. 2015, the
    * corpus-scale merge loop [[bpePairStats]] only previews): `merges`
    * rounds of (count adjacent token pairs weighted by word frequency →
    * take the global top pair, ties broken (count desc, lhs asc, rhs
    * asc) → apply the merge everywhere). Returns the learned merge
    * table (merge_rank, lhs, rhs, pair_count) — the artifact a
    * tokenizer ships.
    *
    * The token sequence of each word is packed as a sentinel-prefixed
    * string (`<s>l<s>o<s>w`), so applying a merge is ONE
    * `replace(tok, "␁l␁o", "␁lo")` — and because SQL `replace` scans
    * leftmost non-overlapping, it IS BPE's greedy left-to-right merge
    * order (`␁a␁a␁a` merges its first pair only). No per-row loop
    * UDF, and an engine replay is the same `replace`.
    *
    * Scale shape: training runs on the DISTINCT-WORD table (corpus →
    * one `groupBy(word)` — vocab is orders of magnitude smaller than
    * the corpus and the only thing the loop touches). Each round is
    * one explode of words into adjacent pairs feeding a
    * partial-aggregating count, a driver take of ONE row, and a
    * map-only merge apply materialized via persist (the previous
    * round's cache is dropped each time — no cache leak, no lineage
    * blowup). Driver state is the merge table itself: `merges` rows. */
  /** Frequency-weighted distinct-word table — the thing BPE training
    * iterates on (vocab-sized, not corpus-sized). */
  private def bpeWordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit(""))).as("__w"))
      .filter(!col("__w").contains(lit(BpeSentinel)))
      .groupBy(col("__w")).agg(count(lit(1)).as("cnt"))

  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, "merges must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sent = BpeSentinel
    val base = bpeWordCounts(df, textCol)
      .select(regexp_replace(col("__w"), "(.)", sent + "$1").as("tok"), col("cnt"))
    var cur = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = cur
        .withColumn("__tl", filter(split(col("tok"), sent), x => x =!= lit("")))
        .filter(size(col("__tl")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(__tl) - 1),
            |  i -> struct(element_at(__tl, i) AS lhs, element_at(__tl, i + 1) AS rhs))"""
            .stripMargin)).as("z"), col("cnt"))
        .groupBy(col("z.lhs"), col("z.rhs")).agg(sum(col("cnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, l, rr, c))
        val next = cur
          .withColumn("tok",
            replace(col("tok"), lit(sent + l + sent + rr), lit(sent + l + rr)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist()
        cur = next
      }
      r += 1
    }
    cur.unpersist()
    learned.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Greedy BPE SEGMENTATION with a learned merge table — the apply
    * side of [[bpeTrain]], as a map-only column: the word's char
    * sequence replays each merge in rank order. Returns the packed
    * token string split back into an array. */
  def bpeSegment(wordCol: Column, mergeTable: Seq[(String, String)]): Column = {
    val sent = BpeSentinel
    val packed = mergeTable.foldLeft(
      regexp_replace(wordCol, "(.)", sent + "$1")) { case (acc, (l, rr)) =>
      replace(acc, lit(sent + l + sent + rr), lit(sent + l + rr))
    }
    filter(split(packed, sent), x => x =!= lit(""))
  }

  /** The learned subword VOCABULARY after `merges` BPE rounds — the
    * artifact a tokenizer ships next to the merge table: top-`k`
    * subword tokens by corpus occurrence (frequency-weighted over the
    * distinct-word table), ties lexicographic. One [[bpeTrain]] run +
    * one map-only [[bpeSegment]] re-apply + one partial-agg count. */
  def bpeVocab(df: DataFrame, textCol: String, merges: Int, k: Int): DataFrame =
    bpeVocabWithTable(df, textCol,
      bpeTrain(df, textCol, merges).collect()
        .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq, k)

  /** [[bpeVocab]] against an ALREADY-TRAINED merge table — the form a
    * pipeline uses when the table (the shipped artifact) is
    * materialized once and every consumer reads it. */
  def bpeVocabWithTable(df: DataFrame, textCol: String,
      table: Seq[(String, String)], k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    bpeWordCounts(df, textCol)
      .select(explode(bpeSegment(col("__w"), table)).as("token"), col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019, CCNet §4.3):
    * per language, documents split head / middle / tail at the
    * corpus-own LM-score terciles — the standard "keep the head, weigh
    * the middle, drop the tail" quality gate before training. The LM
    * here is the corpus's own unigram model ([[unigramLogProb]], the
    * repo's lm_score convention; CCNet proper scores with a
    * wiki-trained KenLM, which slots in as the same per-doc score
    * column). Higher mean log-prob = lower perplexity = "head".
    *
    * Engine-portable bucketing: assignment compares the 6 dp-ROUNDED
    * per-doc score against 6 dp-rounded exact interpolated per-lang
    * terciles — identical inputs on both engines give identical
    * percentiles, and boundary ties land in "middle" on both (strict
    * inequalities both sides).
    *
    * Scale shape: the LM pass (two word-level aggregates + one per-doc
    * sum), an id-keyed join to re-attach the language, one
    * ≤|langs|-row percentile aggregate broadcast back, then a map-only
    * label. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = unigramLogProb(df, idCol, textCol)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    val th = scored.groupBy(col(langCol)).agg(
      round(expr("percentile(mean_logprob, 0.333333)"), 6).as("__lo"),
      round(expr("percentile(mean_logprob, 0.666667)"), 6).as("__hi"))
    scored.join(broadcast(th), Seq(langCol))
      .withColumn("ppl_bucket",
        when(col("mean_logprob") > col("__hi"), "head")
          .when(col("mean_logprob") < col("__lo"), "tail")
          .otherwise("middle"))
      .select(col(idCol), col(langCol), col("n_tokens"),
        col("mean_logprob"), col("ppl_bucket"))
  }

  /** [[perplexityBuckets]] over the collapsed unigram-LM pass —
    * identical rows: per-doc scores expand before the per-language
    * percentile thresholds, so the bucket boundaries see the same
    * score multiset. */
  def perplexityBucketsCollapsed(df: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val scored = unigramLogProbCollapsed(df, idCol, textCol)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    val th = scored.groupBy(col(langCol)).agg(
      round(expr("percentile(mean_logprob, 0.333333)"), 6).as("__lo"),
      round(expr("percentile(mean_logprob, 0.666667)"), 6).as("__hi"))
    scored.join(broadcast(th), Seq(langCol))
      .withColumn("ppl_bucket",
        when(col("mean_logprob") > col("__hi"), "head")
          .when(col("mean_logprob") < col("__lo"), "tail")
          .otherwise("middle"))
      .select(col(idCol), col(langCol), col("n_tokens"),
        col("mean_logprob"), col("ppl_bucket"))
  }

  /** [[stupidBackoffScore]] with EXACT-DUPLICATE COLLAPSE on both
    * sides (identical rows up to the 6dp-round tolerance on the
    * double log sum, OpsSpec-asserted): corpus uni/bi/tri counts are
    * weighted sums over distinct texts; a scored doc's mean backoff
    * log-prob is a pure function of its text given those counts, so
    * rep scores expand to clone members. The corpus n-gram explodes —
    * the dominant cost — run once per distinct text on each side. */
  def stupidBackoffScoreCollapsed(score: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classesC = Dedup.cloneClasses(corpus, idCol, textCol)
    val classesS = Dedup.cloneClasses(score, idCol, textCol).persist(lvl)
    val cws = classesC.select(col("w"),
      filter(split(trim(col("__text")), "\\s+"), x => x =!= lit("")).as("__ws"))
    val uni = cws.select(col("w"), explode(col("__ws")).as("__w"))
      .groupBy(col("__w")).agg(sum(col("w")).as("__c1"))
    val totals = uni.agg(sum(col("__c1")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val bi = cws.filter(size(col("__ws")) >= 2)
      .select(col("w"), explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS a, __ws[i] AS b))"))
        .as("__p"))
      .select(col("w"), col("__p.a").as("__a"), col("__p.b").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(sum(col("w")).as("__c2"))
    val triCounts = cws.filter(size(col("__ws")) >= 3)
      .select(col("w"), explode(expr(
        "transform(sequence(1, size(__ws) - 2), i -> struct(__ws[i-1] AS a, __ws[i] AS b, __ws[i+1] AS c))"))
        .as("__t"))
      .select(col("w"), col("__t.a").as("__a"), col("__t.b").as("__b"),
        col("__t.c").as("__c"))
      .groupBy(col("__a"), col("__b"), col("__c")).agg(sum(col("w")).as("__c3"))
    val tri = classesS
      .select(col("rep"),
        filter(split(trim(col("__text")), "\\s+"), x => x =!= lit("")).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("rep"), explode(expr(
        "transform(sequence(1, size(__ws) - 2), i -> struct(__ws[i-1] AS a, __ws[i] AS b, __ws[i+1] AS c))"))
        .as("__t"))
      .select(col("rep"), col("__t.a").as("__a"), col("__t.b").as("__b"),
        col("__t.c").as("__c"))
    val scored = tri
      .join(triCounts, Seq("__a", "__b", "__c"), "left")
      .join(bi.select(col("__a"), col("__b"), col("__c2").as("__c2ab")),
        Seq("__a", "__b"), "left")
      .join(bi.select(col("__a").as("__b"), col("__b").as("__c"),
        col("__c2").as("__c2bc")), Seq("__b", "__c"), "left")
      .join(uni.select(col("__w").as("__b"), col("__c1").as("__c1b")),
        Seq("__b"), "left")
      .join(uni.select(col("__w").as("__c"), col("__c1").as("__c1c")),
        Seq("__c"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s",
        when(col("__c3").isNotNull,
          col("__c3").cast("double") / col("__c2ab").cast("double"))
          .when(col("__c2bc").isNotNull,
            lit(alpha) * col("__c2bc").cast("double") / col("__c1b").cast("double"))
          .otherwise(lit(alpha * alpha) *
            (coalesce(col("__c1c"), lit(0L)).cast("double") + lit(1.0)) /
            (col("__n") + col("__v"))))
    val repScores = scored.groupBy(col("rep"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(log(col("__s"))) / count(lit(1)).cast("double"), 6)
          .as("mean_sb_logprob"))
    val out = repScores
      .join(classesS.select(col("rep"), col("members")), "rep")
      .select(explode(col("members")).as(idCol), col("n_trigrams"),
        col("mean_sb_logprob"))
      .localCheckpoint(true)
    classesS.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  // -------------------------------------------------------------------
  // DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169)
  // -------------------------------------------------------------------

  /** Lowercased whitespace words of `textCol` hashed into `buckets`
    * feature buckets with the portable md5-prefix family — DSIR's
    * hashed bag-of-words feature space (§3.2 of the paper uses hashed
    * n-grams; unigrams keep the oracle SQL tractable and the bucket
    * table tiny). One map stage, no shuffle. */
  private def wordBuckets(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("sid"),
        pmod(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))

  /** DSIR importance weights: per raw document, the log-likelihood
    * ratio of its hashed-word features under a Laplace-smoothed
    * bag-of-buckets model of the TARGET distribution vs the RAW
    * distribution —
    * `logw(d) = Σ_w ln p̂_target(bucket(w)) − ln p̂_raw(bucket(w))`
    * with `p̂(b) = (count(b)+1)/(total+B)`. Positive means "looks more
    * like the target corpus than the raw pool".
    *
    * Cross-engine determinism: each bucket's log-ratio is rounded to
    * integer MICRO-units first and the per-doc sum runs in exact
    * 64-bit integer arithmetic (`Σ n_d[b]·lw_micro[b]`), so the score
    * is a pure function of the counts — no order-dependent double
    * accumulation for the SQL oracle to drift against. `logw` is the
    * exact value micro/1e6.
    *
    * Scale shape: two word scans aggregate into ≤`buckets` rows each
    * (map-side partial, B=O(1k) — the shuffle carries bucket ids, not
    * words); the 1-row totals are cross-joined in-plan; the ≤B-row
    * log-ratio table broadcasts onto the raw word scan; the only
    * per-corpus-sized shuffle is the final per-doc sum (one long per
    * doc after partial aggregation). A 100 TB raw pool is three
    * word-level map passes + one per-doc aggregate. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val tgt = wordBuckets(target, idCol, textCol, buckets)
    val rw = wordBuckets(raw, idCol, textCol, buckets)
    val tgtCounts = tgt.groupBy("b").agg(count(lit(1)).as("ct"))
    val rawCounts = rw.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgtTotal = tgt.agg(count(lit(1)).as("tt"))
    val rawTotal = rw.agg(count(lit(1)).as("tr"))
    // raw-side buckets are a SUPERSET of any scoring doc's buckets
    // (every bucket a raw doc touches has cr ≥ 1), so target-only
    // buckets can never score — a raw-anchored LEFT join covers the
    // whole domain and keeps both ≤B-row tables broadcastable (a
    // full-outer would force a sort-merge: no single build side)
    val ratio = rawCounts.join(broadcast(tgtCounts), Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tgtTotal)).crossJoin(broadcast(rawTotal))
      .select(col("b"),
        round((log((col("ct") + 1).cast("double") /
            (col("tt") + buckets).cast("double")) -
          log((col("cr") + 1).cast("double") /
            (col("tr") + buckets).cast("double"))) * 1e6)
          .cast("long").as("lw_micro"))
    rw.join(broadcast(ratio), Seq("b"))
      .groupBy("sid")
      .agg(sum(col("lw_micro")).as("logw_micro"))
      .select(col("sid"), col("logw_micro"),
        (col("logw_micro").cast("double") / 1e6).as("logw"))
  }

  /** [[dsirWeights]] with EXACT-DUPLICATE COLLAPSE on both sides
    * (identical output, OpsSpec-asserted). Every piece of DSIR is
    * count-shaped, so clones factor out exactly:
    *
    *  - bucket counts and totals are weighted sums over distinct
    *    texts (`Σ class-weight · per-rep bucket count` = the direct
    *    corpus counts — raw and target collapse INDEPENDENTLY, so
    *    clones that disagree on target membership stay exact);
    *  - the ≤B-row log-ratio table is therefore bit-identical;
    *  - a doc's score is a pure function of its text given that
    *    table, so rep scores expand to clone members verbatim.
    *
    * The corpus-dominating word explode + md5 runs once per distinct
    * text; only the sha collapse shuffle and the output-sized
    * expansion join are new. */
  def dsirWeightsCollapsed(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classesR = Dedup.cloneClasses(raw, idCol, textCol).persist(lvl)
    val classesT = Dedup.cloneClasses(target, idCol, textCol)
    def repBucketCounts(classes: DataFrame): DataFrame =
      wordBuckets(classes.select(col("rep"), col("__text")), "rep", "__text", buckets)
        .groupBy(col("sid"), col("b")).agg(count(lit(1)).as("nb"))
    // weighted bucket counts / totals == the direct corpus's
    def weighted(classes: DataFrame, cnt: String, tot: String)
        : (DataFrame, DataFrame) = {
      val per = repBucketCounts(classes)
        .join(classes.select(col("rep").as("sid"), col("w")), "sid")
      (per.groupBy("b").agg(sum(col("nb") * col("w")).as(cnt)),
        per.agg(coalesce(sum(col("nb") * col("w")), lit(0L)).as(tot)))
    }
    val (tgtCounts, tgtTotal) = weighted(classesT, "ct", "tt")
    val (rawCounts, rawTotal) = weighted(classesR, "cr", "tr")
    val ratio = rawCounts.join(broadcast(tgtCounts), Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tgtTotal)).crossJoin(broadcast(rawTotal))
      .select(col("b"),
        round((log((col("ct") + 1).cast("double") /
            (col("tt") + buckets).cast("double")) -
          log((col("cr") + 1).cast("double") /
            (col("tr") + buckets).cast("double"))) * 1e6)
          .cast("long").as("lw_micro"))
    val repScores = repBucketCounts(classesR)
      .join(broadcast(ratio), Seq("b"))
      .groupBy("sid")
      .agg(sum(col("nb") * col("lw_micro")).as("logw_micro"))
    val out = repScores
      .join(classesR.select(col("rep").as("sid"), col("members")), "sid")
      .select(explode(col("members")).as("sid"), col("logw_micro"),
        (col("logw_micro").cast("double") / 1e6).as("logw"))
      .localCheckpoint(true)
    classesR.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** DSIR resampling: top-`k` raw documents by importance weight plus
    * deterministic Gumbel noise — the Gumbel-max trick makes top-k of
    * `logw + g_d` an EXACT sample without replacement from the
    * softmax(logw) distribution (Xie et al. §3.3 resample step), and
    * drawing `g_d = −ln(−ln(u_d))` from the portable hash of the doc
    * id (`u_d = (h mod 1e6 + 0.5)/1e6`) makes the draw reproducible
    * across runs, partitionings, and engines — a re-run or an audit
    * replay selects the identical subset. Gumbel noise in micro-units,
    * summed in exact integer arithmetic like [[dsirWeights]].
    *
    * Scale shape: [[dsirWeights]]'s passes + a map-only key column +
    * TakeOrdered top-k (bounded driver result, no global sort). */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame =
    gumbelTopK(dsirWeights(raw, target, idCol, textCol, buckets), k)

  /** [[dsirResample]] over the collapsed weight pass — the Gumbel key
    * is a map-only function of (doc id, logw) applied AFTER the clone
    * expansion, so collapsing the weights changes nothing about which
    * docs the top-k keeps. Eager via the collapsed weights (caller
    * unpersists the returned frame's lineage is consumed by top-k). */
  def dsirResampleCollapsed(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame =
    gumbelTopK(dsirWeightsCollapsed(raw, target, idCol, textCol, buckets), k)

  /** The shared resample step: deterministic per-doc Gumbel noise on
    * top of the weight frame, TakeOrdered top-k. */
  private def gumbelTopK(weights: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val u = (pmod(portableIdHash(col("sid")), lit(1000000L)).cast("double") +
      lit(0.5)) / lit(1e6)
    weights
      .withColumn("gumbel_micro",
        round(-log(-log(u)) * 1e6).cast("long"))
      .withColumn("key_micro", col("logw_micro") + col("gumbel_micro"))
      .orderBy(col("key_micro").desc, col("sid").asc)
      .limit(k)
      .select(col("sid"), col("logw"),
        (col("key_micro").cast("double") / 1e6).as("gumbel_key"))
  }

  /** Line-level duplication/quality signals (the Gopher repetition
    * rules at LINE granularity — Rae et al. 2112.11446 Table A1
    * "duplicate line fraction" / "duplicate line character fraction",
    * plus C4's terminal-punctuation line rule; the line analogue of
    * [[repetitionStats]]'s word/n-gram signals). Per doc over
    * non-empty TRIMMED lines:
    *
    *  - `n_lines` — line occurrences;
    *  - `dup_line_frac` — occurrences beyond a line's first, / n_lines;
    *  - `dup_line_char_frac` — chars in those repeats / all line chars;
    *  - `punct_line_frac` — lines ending in `.` `!` `?`, / n_lines.
    *
    * Scale shape: one explode + two partial aggregations keyed by
    * (doc, line) then doc — both map-side combinable, no joins; ratios
    * are exact integer divisions rounded 6 dp (oracle convention). */
  def lineStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("sid"),
        explode(split(col(textCol), "\\r?\\n")).as("raw"))
      .select(col("sid"), trim(col("raw")).as("line"))
      .filter(col("line") =!= "")
    lines.groupBy("sid", "line").agg(count(lit(1)).as("c"))
      .groupBy("sid").agg(
        sum("c").as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum((col("c") - 1) * length(col("line"))).as("dup_chars"),
        sum(col("c") * length(col("line"))).as("tot_chars"),
        sum(when(col("line").rlike("[.!?]$"), col("c")).otherwise(0L)).as("punct_lines"))
      .select(col("sid"), col("n_lines"),
        round((col("n_lines") - col("n_distinct")).cast("double") / col("n_lines"), 6)
          .as("dup_line_frac"),
        round(col("dup_chars").cast("double") / col("tot_chars"), 6)
          .as("dup_line_char_frac"),
        round(col("punct_lines").cast("double") / col("n_lines"), 6)
          .as("punct_line_frac"))
  }

  /** Distinct-n diversity (Li et al. 2016's distinct-1/2/3, at corpus
    * granularity): per (group, n ≤ maxN) the fraction of word n-gram
    * OCCURRENCES that are distinct n-grams within the group — the
    * generation-diversity / template-detection complement of
    * [[repetitionStats]] (within-doc) and `ngram_novelty` (per-doc
    * against corpus df). A source whose diversity collapses at n=2,3
    * is emitting templated text even when its unigram mix looks fine.
    *
    * Scale shape: ONE scan — each doc's word array explodes to (n,
    * gram) pairs for all n at once (guarded `transform(sequence(...))`
    * per n, empty below n words), then a single (group, n, gram)
    * partial-agg rollup; no joins, no distinct over the raw corpus. */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame =
    ngramRows(df, groupCol, textCol, maxN)
      .groupBy("grp", "n").agg(
        count(lit(1)).as("n_grams"),
        count_distinct(col("g")).as("n_distinct"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_grams"), 6)
          .as("diversity"))

  /** HLL twin of [[ngramDiversity]] — the 100 TB path: the exact form
    * shuffles the DISTINCT GRAM SPACE per (group, n) key (Heaps-law
    * huge at crawl scale), while `approx_count_distinct` ships one
    * bounded sketch per partition per key. Same single-scan all-n
    * explode; the `ngram_diversity_approx` gate pins the estimate to
    * a 5% band around the exact count (the corpus_distinct_approx
    * pattern). */
  def ngramDiversityApprox(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3, rsd: Double = 0.02): DataFrame =
    ngramRows(df, groupCol, textCol, maxN)
      .groupBy("grp", "n").agg(
        count(lit(1)).as("n_grams"),
        approx_count_distinct(col("g"), rsd = rsd).as("n_distinct_est"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("n_grams"), col("n_distinct_est"),
        round(col("n_distinct_est").cast("double") / col("n_grams"), 6)
          .as("diversity_est"))

  /** Shared explode for the diversity family: one scan emits every
    * word n-gram for ALL n ≤ maxN as (grp, n, g) rows. */
  private def ngramRows(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int): DataFrame =
    ngramRowsW(df.select(col(groupCol).as("grp"), lit(1L).as("w"),
      col(textCol).as("__t")), maxN)

  /** [[ngramRows]] over pre-weighted rows (grp, w, __t): emits
    * (grp, w, n, g) — the occurrence weight rides along so collapsed
    * callers can count occurrences without re-exploding clones. */
  private def ngramRowsW(rows: DataFrame, maxN: Int): DataFrame = {
    require(maxN >= 1, "maxN must be >= 1")
    val withWords = rows.select(col("grp"), col("w"),
      split(trim(col("__t")), "\\s+").as("words"))
    val gramArms = (1 to maxN).map { n =>
      s"""CASE WHEN size(words) >= $n THEN
         |  transform(sequence(1, size(words) - ${n - 1}),
         |    i -> struct($n AS n, concat_ws(' ', slice(words, i, $n)) AS g))
         |ELSE array() END""".stripMargin
    }.mkString("flatten(array(", ", ", "))")
    withWords
      .select(col("grp"), col("w"), explode(expr(gramArms)).as("ng"))
      .select(col("grp"), col("w"), col("ng.n").as("n"), col("ng.g").as("g"))
      .filter(col("g") =!= "")
  }

  /** Clone classes per group for the weighted diversity twins: one row
    * per (grp, distinct text) with its clone count `w`. Keyed by the
    * GROUP TOO — clones in different groups stay separate, so the
    * collapse is exact even when id-siblings disagree on `groupCol`.
    * NULL and '' texts stay distinct classes ([[Dedup.textClassKey]]). */
  private def groupedTextClasses(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), col(textCol).as("__t0"))
      .groupBy(col("grp"), Dedup.textClassKey(col("__t0")).as("__k"))
      .agg(count(lit(1)).as("w"), first(col("__t0")).as("__t"))
      .select(col("grp"), col("w"), col("__t"))

  /** [[ngramDiversity]] with EXACT-DUPLICATE COLLAPSE (identical
    * output, OpsSpec-asserted): occurrence counts become Σ w ×
    * grams-per-distinct-text and the distinct-gram set is unchanged
    * (clones add no new grams), so the corpus-dominating explode runs
    * once per distinct text instead of once per clone. */
  def ngramDiversityCollapsed(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame =
    ngramRowsW(groupedTextClasses(df, groupCol, textCol), maxN)
      .groupBy("grp", "n").agg(
        sum(col("w")).as("n_grams"),
        count_distinct(col("g")).as("n_distinct"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_grams"), 6)
          .as("diversity"))

  /** [[ngramDiversityApprox]] with the same collapse — the HLL sketch
    * sees the identical DISTINCT value set (multiplicity-insensitive
    * by construction), so the estimate is bit-identical. */
  def ngramDiversityApproxCollapsed(df: DataFrame, groupCol: String,
      textCol: String, maxN: Int = 3, rsd: Double = 0.02): DataFrame =
    ngramRowsW(groupedTextClasses(df, groupCol, textCol), maxN)
      .groupBy("grp", "n").agg(
        sum(col("w")).as("n_grams"),
        approx_count_distinct(col("g"), rsd = rsd).as("n_distinct_est"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("n_grams"), col("n_distinct_est"),
        round(col("n_distinct_est").cast("double") / col("n_grams"), 6)
          .as("diversity_est"))

  /** Exact + HLL diversity in ONE gram pass — the
    * `ngram_diversity_approx` gate consumed [[ngramDiversityCollapsed]]
    * and [[ngramDiversityApproxCollapsed]] side by side, paying the
    * clone-class rollup and the corpus-dominating gram explode twice
    * for aggregates one groupBy carries together. Both aggregates see
    * the identical value stream, so `n_distinct` and `n_distinct_est`
    * are bit-equal to the two-pass twins' (the HLL register set is a
    * function of the distinct gram set alone). */
  def ngramDiversityWithApproxCollapsed(df: DataFrame, groupCol: String,
      textCol: String, maxN: Int = 3, rsd: Double = 0.02): DataFrame =
    // EXPLICIT two-level aggregate, not `count_distinct + approx` in
    // one groupBy: mixing them makes Spark keep the HLL partial buffer
    // (~410 long columns at rsd 0.02) alive per DISTINCT GRAM row
    // through both levels of its distinct rewrite — measured 2.75 →
    // 4.17 s at sf0.1. Deduping grams first costs the same exchange
    // the distinct rewrite pays anyway, and the HLL then only ever
    // exists per (grp, n). The register set is identical (HLL is
    // multiplicity-insensitive), so n_distinct_est is bit-equal.
    ngramRowsW(groupedTextClasses(df, groupCol, textCol), maxN)
      .groupBy("grp", "n", "g").agg(sum(col("w")).as("wg"))
      .groupBy("grp", "n").agg(
        sum(col("wg")).as("n_grams"),
        count(col("g")).as("n_distinct"),
        approx_count_distinct(col("g"), rsd = rsd).as("n_distinct_est"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("n_grams"), col("n_distinct"), col("n_distinct_est"))

  /** Unicode script mix: per-doc character fractions by script class —
    * the script-level complement of [[langIdColumn]]'s stopword
    * heuristic (a CJK doc defeats stopword lists; its script ratio is
    * unambiguous). Counts come from the length drop of a
    * single-char-class `regexp_replace` strip — map-only, codegen'd,
    * one scan, no UDF. Classes are spelled as properties that mean the
    * SAME thing in java.util.regex (Spark) and RE2 (the DuckDB
    * oracle): script properties `IsLatin`/`Latin`, `IsHan`/`Han`,
    * explicit `[0-9]`, and an explicit whitespace class (java's `\s`
    * and RE2's `\s` disagree on vertical tab). `main_script` is the
    * majority class (> half of chars), else "mixed". */
  def scriptMix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def cnt(pat: String): Column =
      length(col(textCol)) - length(regexp_replace(col(textCol), pat, ""))
    df.select(col(idCol).as("sid"),
        length(col(textCol)).as("n_chars"),
        cnt("\\p{IsLatin}").as("n_latin"),
        cnt("\\p{IsHan}").as("n_han"),
        cnt("[0-9]").as("n_digit"),
        cnt("[ \\t\\n\\r\\f]").as("n_space"))
      .filter(col("n_chars") > 0)
      .withColumn("n_other",
        col("n_chars") - col("n_latin") - col("n_han") - col("n_digit") - col("n_space"))
      .select(col("sid"), col("n_chars"),
        round(col("n_latin").cast("double") / col("n_chars"), 6).as("latin_frac"),
        round(col("n_han").cast("double") / col("n_chars"), 6).as("han_frac"),
        round(col("n_digit").cast("double") / col("n_chars"), 6).as("digit_frac"),
        round(col("n_other").cast("double") / col("n_chars"), 6).as("other_frac"),
        when(col("n_latin") * 2 > col("n_chars"), "latin")
          .when(col("n_han") * 2 > col("n_chars"), "han")
          .when(col("n_digit") * 2 > col("n_chars"), "digit")
          .otherwise("mixed").as("main_script"))
  }

  /** Compression-ratio screen (the Gopher/RefinedWeb signal): deflate
    * the row's UTF-8 bytes ([[graft.functions.DeflateLength]], row-
    * local thread-cached Deflater) and flag docs whose ratio falls
    * outside [minRatio, maxRatio] — below = template/boilerplate
    * repetition token-level stats miss (long-range repeats), above =
    * high-entropy junk. Map-only, no shuffle. Ratios are deterministic
    * within a cluster image but not engine-portable (no DuckDB
    * compression primitive) — the query carries a rows-only oracle
    * check and the spec pins ordering properties, not absolute
    * lengths. */
  def compressionStats(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6, minRatio: Double = 0.3, maxRatio: Double = 1.1): DataFrame = {
    import graft.functions.DeflateFunctions.deflateLength
    df.withColumn("n_bytes", octet_length(col(textCol)).cast("long"))
      .withColumn("deflate_len", deflateLength(col(textCol), level))
      .withColumn("compression_ratio", round(when(col("n_bytes") === 0, 1.0)
        .otherwise(col("deflate_len").cast("double") / col("n_bytes")), 6))
      .withColumn("flagged",
        col("compression_ratio") < minRatio || col("compression_ratio") > maxRatio)
  }

  /** Phrase-blocklist screen at large pattern counts — the
    * Aho–Corasick twin of [[blocklistScore]]. Where blocklistScore
    * matches whole whitespace tokens with one codegen'd filter per
    * term (fine to ~10² single-word terms, then the generated method
    * outgrows Janino), this matches SUBSTRINGS — so multi-word phrases
    * work — in O(len) per row regardless of pattern count, via one
    * automaton walk ([[graft.functions.MultiMatchTotal]]).
    *
    * Counts are leftmost non-overlapping per pattern (exactly DuckDB's
    * `(length(t) - length(replace(t, p, ''))) / length(p)`, which is
    * how the oracle replays them). Map-only, no shuffle; the pattern
    * list ships once per executor inside the (broadcast) task binary
    * and builds one cached automaton per JVM. */
  def blocklistPhrases(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], maxRatio: Double = 0.1): DataFrame = {
    require(phrases.nonEmpty, "blocklistPhrases needs at least one phrase")
    require(phrases.distinct.size == phrases.size,
      "blocklistPhrases phrases must be distinct (duplicates would count on the first copy only)")
    import graft.functions.MultiMatchFunctions.multiMatchTotal
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("n_hits", multiMatchTotal(col(textCol), phrases))
      .withColumn("hit_ratio", round(when(col("n_tokens") === 0, 0.0)
        .otherwise(col("n_hits").cast("double") / col("n_tokens")), 6))
      .withColumn("flagged", col("hit_ratio") > lit(maxRatio))
  }

  /** Canary-string contamination screen: count exact occurrences of
    * benchmark canary strings (document prefixes, answer keys, GUID
    * canaries) in each corpus doc via one Aho–Corasick walk — O(len)
    * per row no matter how many canaries the benchmark set yields.
    * The exact-substring complement of the gram-overlap
    * decontamination family: grams catch paraphrase-adjacent overlap,
    * canaries catch verbatim inclusion with certainty. */
  def canaryHits(df: DataFrame, idCol: String, textCol: String,
      canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "canaryHits needs at least one canary string")
    import graft.functions.MultiMatchFunctions.multiMatchTotal
    df.withColumn("n_canary_hits", multiMatchTotal(col(textCol), canaries))
      .withColumn("leaked", col("n_canary_hits") > 0)
  }

  /** Corpus-level rollup per blocklist phrase: total occurrences and
    * document frequency. One automaton walk per row emits the
    * per-phrase count vector; posexplode + partial-agg sum compacts to
    * P rows per partition before the single exchange, so corpus size
    * never crosses the shuffle — only the (pattern-count-sized)
    * partials do. The audit pass a pipeline runs to see WHICH list
    * entries actually fire before committing to a filter threshold. */
  def blocklistTermStats(df: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklistTermStats needs at least one phrase")
    require(phrases.distinct.size == phrases.size,
      "blocklistTermStats phrases must be distinct")
    import graft.functions.MultiMatchFunctions.multiMatchCounts
    val spark = df.sparkSession
    import spark.implicits._
    val terms = phrases.zipWithIndex.map { case (p, i) => (i, p) }.toDF("__pos", "term")
    df.select(posexplode(multiMatchCounts(col(textCol), phrases)).as(Seq("__pos", "__c")))
      .groupBy(col("__pos"))
      .agg(sum(col("__c")).as("n_occurrences"),
        sum(when(col("__c") > 0, 1L).otherwise(0L)).as("doc_freq"))
      .join(broadcast(terms), "__pos")
      .select(col("term"), col("n_occurrences"), col("doc_freq"))
  }
}
