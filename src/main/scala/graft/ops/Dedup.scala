package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators — the 100 TB training-data-pipeline
  * extensions (SURVEY.md §2.3 extension surface, §7.1 module 7). The
  * reference only has content-hash identity (document_processor.py:42-50,
  * used as the file natural key); everything past exactDedup is the
  * standard large-corpus dedup ladder: exact hash → n-gram Jaccard →
  * MinHash+LSH → embedding cosine.
  *
  * Scale notes, operator by operator:
  *  - exact: one hash-shuffle on sha256; partial agg map-side.
  *  - shingles: explode is map-side only (no shuffle); `maxDocFreq`
  *    caps stop-shingle posting lists, which is what keeps the
  *    candidate self-join from exploding on 100 TB (frequency cap =
  *    standard posting-list pruning).
  *  - minhash/LSH: signatures are one groupBy(doc, seed); banding turns
  *    the all-pairs problem into equality buckets — the join is on
  *    (band, key), never all-pairs.
  *  - embedding near-dup: brute-force pairs only for small candidate
  *    sets; at scale feed LSH/IVF buckets in as `candidates`.
  */
/** An unordered doc-id pair, canonicalized as id_a < id_b. */
case class IdPair(id_a: Long, id_b: Long)

object Dedup {

  /** Exact dedup by content hash: keep the lowest-id row per distinct
    * text (deterministic winner), drop the rest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // min_by over the text-class key instead of a row_number window:
    // identical survivor rows (min-id per class; ids are unique), but
    // the aggregate does MAP-SIDE partial aggregation — on a
    // replica-heavy corpus one candidate row per class per partition
    // crosses the exchange instead of every clone riding a full
    // shuffle-and-sort (guide-§2.3 aggregate-before-shuffle; the sort
    // itself disappears too).
    val cols = df.columns.map(col)
    df.groupBy(sha2(col(textCol), 256).as("__k"))
      .agg(min_by(struct(cols: _*), col(idCol)).as("__r"))
      .select(col("__r.*"))
  }

  /** Canonical dedup key: Unicode NFC ([[graft.functions.NfcNormalize]],
    * ASCII fast-path) + lowercase + outer trim + inner whitespace
    * collapse. Web text mixes composed and decomposed encodings of the
    * same characters — byte-level [[exact]] misses those pairs; this
    * key collapses them. Replayable in DuckDB as
    * `nfc_normalize(lower(...))` + the same regexes. */
  def normalizedKey(text: Column): Column =
    regexp_replace(trim(lower(
      graft.functions.UnicodeFunctions.nfcNormalize(text))), "\\s+", " ")

  /** Exact dedup under the canonical key — same keep-lowest-id rule as
    * [[exact]], same one-shuffle window shape, but composed/decomposed
    * and case/whitespace variants now collide. */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(normalizedKey(col(textCol)), 256))
      .orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Aggressive dedup key (the CCNet/RefinedWeb "fuzzy exact" pass):
    * NFC + lowercase, then strip digits and ASCII punctuation/symbols
    * and collapse whitespace — catches boilerplate pairs that differ
    * only in ids, dates, counters, or punctuation ("Post #123, 4
    * views" vs "Post #456, 9 views"), which the canonical
    * [[normalizedKey]] deliberately preserves. Classes are explicit
    * ASCII ranges (`[0-9]`, the four punctuation blocks) — RE2-safe
    * and engine-identical; Unicode punctuation (curly quotes,
    * em-dashes) survives the key by design, `\p{P}` semantics differ
    * between java.util.regex and RE2 and would break oracle replay. */
  def aggressiveKey(text: Column): Column =
    regexp_replace(trim(regexp_replace(
      lower(graft.functions.UnicodeFunctions.nfcNormalize(text)),
      """[0-9]|[!-/:-@\[-`{-~]""", "")), "\\s+", " ")

  /** Exact dedup under the aggressive key — keep-lowest-id, one keyed
    * shuffle, same shape as [[exact]]/[[exactNormalized]]; the third
    * rung of the dedup-key ladder (byte → canonical → aggressive). */
  def exactAggressive(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(aggressiveKey(col(textCol)), 256))
      .orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** [[exactNormalized]] with the BYTE-EXACT RUNG FIRST — identical
    * output rows (OpsSpec-asserted): the NFC + regex canonical key is
    * constant within a byte-identical clone class, so keep-lowest-id
    * under it factors through [[exact]] — the byte rung's per-class
    * min-id survivor is exactly the row the canonical-key group's
    * global min-id rule would pick (min over class minima = group
    * min), full payload intact. On an F×-replicated corpus the
    * expensive key then runs over ~1/F of the rows for one extra
    * cheap sha shuffle; on a unique corpus that shuffle is pure
    * overhead — dispatch on the duplication factor. */
  def exactNormalizedCollapsed(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    exactNormalized(exact(df, idCol, textCol), idCol, textCol)

  /** [[exactAggressive]] with the byte-exact rung first — same
    * identical-rows argument as [[exactNormalizedCollapsed]] (the
    * aggressive key is likewise constant per byte class). */
  def exactAggressiveCollapsed(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    exactAggressive(exact(df, idCol, textCol), idCol, textCol)

  /** Edit-distance verification of near-dup CANDIDATE pairs — the
    * exact-verify stage a production fuzzy-dedup pipeline runs after
    * LSH/banding (banded MinHash admits false positives; Levenshtein
    * similarity 1 − dist/maxLen is the standard arbiter). Candidates
    * only: the quadratic-per-pair DP cost is bounded by the candidate
    * graph, never corpus². `pairs` carries (id_a, id_b); texts join in
    * via broadcast-friendly keyed joins; output keeps every pair with
    * `edit_sim` and a `verified` flag at `minSim`. */
  def editVerifyPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, minSim: Double): DataFrame = {
    val ta = docs.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    pairs.join(ta, "id_a").join(tb, "id_b")
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim", round(lit(1.0) -
        col("edit_dist").cast("double") /
          greatest(length(col("__ta")), length(col("__tb")), lit(1)).cast("double"), 6))
      .withColumn("verified", col("edit_sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("edit_sim"),
        col("verified"))
  }

  /** [[editVerifyPairs]] with EXACT-DUPLICATE PAIR COLLAPSE (identical
    * rows, OpsSpec-asserted): edit distance is a pure function of the
    * two texts, so the O(|a|·|b|) levenshtein — the query's whole
    * cost — runs once per DISTINCT (text_a, text_b) combination and
    * the scored row fans back out to every pair carrying that combo.
    * On an F×-replicated corpus the combo count is ~1/F of the pair
    * count; on a unique corpus the extra (key, key) exchange makes the
    * direct form the right dispatch. */
  def editVerifyPairsCollapsed(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, minSim: Double): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ta = docs.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    val keyed = pairs.join(ta, "id_a").join(tb, "id_b")
      .select(col("id_a"), col("id_b"),
        textClassKey(col("__ta")).as("__ka"), textClassKey(col("__tb")).as("__kb"),
        col("__ta"), col("__tb"))
      .persist(lvl)
    val combos = keyed
      .groupBy(col("__ka"), col("__kb"))
      .agg(first(col("__ta")).as("__ta"), first(col("__tb")).as("__tb"))
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim", round(lit(1.0) -
        col("edit_dist").cast("double") /
          greatest(length(col("__ta")), length(col("__tb")), lit(1)).cast("double"), 6))
      .withColumn("verified", col("edit_sim") >= minSim)
      .select(col("__ka"), col("__kb"), col("edit_dist"), col("edit_sim"),
        col("verified"))
    val out = keyed.select(col("id_a"), col("id_b"), col("__ka"), col("__kb"))
      .join(combos, Seq("__ka", "__kb"))
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("edit_sim"),
        col("verified"))
      .localCheckpoint(true)
    keyed.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Edit-distance ≤ 1 similarity JOIN via deletion neighborhoods
    * (FastSS, Bocek et al. 2007) — the blocking that makes fuzzy key
    * matching linear instead of all-pairs: every key emits itself plus
    * its |k| single-deletion variants, and any two keys within one
    * edit (substitute / insert / delete) provably share a variant
    * (substitution at i ⇒ equal i-deletions; insertion ⇒ the longer
    * key's deletion equals the shorter key itself). Candidates come
    * from variant-block self-joins, then the exact `levenshtein ≤ 1`
    * verify arbitrates — the [[editVerifyPairs]] discipline, so
    * blocking only ever needs to be a SUPERSET.
    *
    * Scale shape: variant rows = Σ(len+1) per key — linear with a
    * length-bounded constant; block fan-out is C(block, 2), so hot
    * variants (very short or very common keys) are capped at
    * `maxBlock` — a fraction-of-corpus knob like the jaccard df cap,
    * dropping only blocks whose pairs the ladder's exact rung already
    * collapses. Returns distinct (id_a < id_b, key_a, key_b, dist). */
  def editDistanceJoin(df: DataFrame, idCol: String, keyCol: String,
      maxBlock: Int = 64): DataFrame = {
    require(maxBlock >= 2, "maxBlock must be >= 2")
    val keyed = df.select(col(idCol).cast("long").as("__id"),
      col(keyCol).cast("string").as("__k"))
    // variant 0 = the key itself; variant i = key minus char i
    val variants = keyed.select(col("__id"), col("__k"),
      explode(expr(
        """transform(sequence(0, length(__k)), i ->
          |  CASE WHEN i = 0 THEN __k
          |       ELSE concat(substring(__k, 1, i - 1),
          |                   substring(__k, i + 1, length(__k))) END)""".stripMargin))
        .as("__var")).distinct()
    // the jaccardPairs posting-list shape: ONE groupBy builds each
    // variant's block, the size filter IS the cap, and pairs emit
    // in-row — Σ C(block, 2) rows, no posting-list self-join
    val blocks = variants
      .groupBy(col("__var"))
      .agg(sort_array(collect_list(struct(col("__id"), col("__k")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBlock))
    blocks.select(explode(expr(
        """flatten(transform(sequence(1, size(ms) - 1), i ->
          |  transform(sequence(i + 1, size(ms)), j ->
          |    struct(ms[i-1].__id AS id_a, ms[j-1].__id AS id_b,
          |           ms[i-1].__k AS key_a, ms[j-1].__k AS key_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.key_a"), col("p.key_b"))
      .filter(col("id_a") < col("id_b")).distinct()
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Distinct character n-gram shingles per document:
    * (id, shingle) rows. Windows start at 1..max(len-n+1, 1), so every
    * non-empty doc has ≥1 shingle (the final one may be short). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        explode(expr(s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substring($textCol, i, $n))"))
          .as("shingle"))
      .distinct()

  /** Distinct 60-bit shingle hashes per document, one array per doc,
    * in a single O(len·n) pass. Hash = integer value of the first 15
    * md5 hex chars of the n-gram — replayable in SQL as
    * `CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)`.
    *
    * This is the workhorse the whole dedup/fingerprint family feeds
    * from, and it exists because the declarative alternative
    * (`transform(sequence(...), i -> substring(text, i, n))` + explode
    * + distinct) is quadratic — Spark's UTF8String substring seeks
    * from the string start, so extracting L windows costs O(L²) — and
    * needs a full (sid, shingle)-row shuffle just to dedup, while this
    * UDF dedups in-row and ships one compact long-array per doc.
    * (Caveat vs the SQL replay: positions here are UTF-16 code units,
    * SQL's are codepoints — identical for ASCII/BMP text.) */
  val shingleHashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, n: Int) =>
      if (text == null || text.isEmpty) Array.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val len = text.length
        val m = math.max(len - n + 1, 1)
        val seen = new java.util.HashSet[java.lang.Long](m * 2)
        val out = new scala.collection.mutable.ArrayBuilder.ofLong
        var i = 0
        while (i < m) {
          val g = text.substring(i, math.min(i + n, len))
          md.reset()
          val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          val h = v >>> 4 // top 60 bits = first 15 hex chars
          if (seen.add(h)) out += h
          i += 1
        }
        val r = out.result()
        // ascending sets: downstream intersection counts are linear
        // merges (SortedLongIntersectCount); hashes are >= 0 so signed
        // sort == unsigned sort
        java.util.Arrays.sort(r)
        r
      }
    }

  /** Per-doc shingle-hash sets: (sid, hs: array<long>, sz). One map
    * stage, no shuffle. */
  def shingleHashSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        shingleHashesUdf(col(textCol), lit(n)).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))

  /** Exploded (sid, h) rows from [[shingleHashSets]] — already distinct
    * per doc. */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashSets(df, idCol, textCol, n)
      .select(col("sid"), explode(col("hs")).as("h"))

  /** All ordered pairs (a < b) of a posting list (a shingle's doc ids).
    * Runs on df-capped lists only, so the output array is ≤ C(cap, 2). */
  private val postingPairsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { sids: Seq[Long] =>
      val s = sids.sorted.toArray
      val out = new scala.collection.mutable.ArrayBuffer[IdPair](s.length * (s.length - 1) / 2)
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) { out += IdPair(s(i), s(j)); j += 1 }
        i += 1
      }
      out.toSeq
    }

  /** [[postingPairsUdf]] with each pair packed as one long
    * `(a << 32) | b` (requires ids in [0, 2^31)): a primitive long
    * array instead of C(df,2) case-class rows through the generic UDF
    * encoder — the pair stream then shuffles/aggregates as a single
    * 8-byte key. */
  private val packedPostingPairsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { sids: Seq[Long] =>
      val s = sids.sorted.toArray
      val m = s.length
      val out = new Array[Long](m * (m - 1) / 2)
      var k = 0; var i = 0
      while (i < m) {
        val a = s(i) << 32
        var j = i + 1
        while (j < m) { out(k) = a | s(j); k += 1; j += 1 }
        i += 1
      }
      out
    }

  /** [[packedPostingPairsUdf]] exposed for the stage-timing diagnostic
    * in [[graft.tools.JaccardProbe]] only. */
  def packedPairsForProbe(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    packedPostingPairsUdf(c)

  /** Near-dup pairs (a < b) with **exact** n-gram Jaccard ≥ threshold,
    * computed with the standard scalable two-phase shape:
    *
    *  1. *Candidate generation* — inverted-index self-join restricted to
    *     shingles occurring in ≤ `maxDocFreq` docs (posting-list cap:
    *     the join cost is Σ df² over posting lists, and capping df
    *     removes the quadratic hot lists — 561M → 4.7M pair-rows on the
    *     sf0.1 corpus), keeping pairs that share ≥ `minShared` rare
    *     shingles (random single-shingle collisions are the bulk of the
    *     candidates; true near-dups share dozens).
    *  2. *Verification* — exact Jaccard on the candidates only, from
    *     each doc's full distinct-shingle set; |A∪B| = |A| + |B| − |A∩B|.
    *     The set table is first semi-joined down to candidate docs,
    *     then broadcast ONLY if its measured size fits under
    *     `broadcastBytesCap` — above the cap both verification joins
    *     fall back to shuffle equi-joins, so no corpus size can OOM
    *     the driver. NOTE: eager — the candidate and verification jobs
    *     run at call time and the returned (small) pair frame is
    *     persisted; intermediates are unpersisted before returning.
    *
    * Pairs whose overlap lives *only* in stop-shingles (df > cap) are
    * not candidates — by design: such overlap is boilerplate, not
    * duplication. `maxDocFreq <= 0` disables the cap (exact all-pairs
    * semantics; quadratic — small inputs only).
    *
    * Scale rules (measured, BASELINE.md "Dedup family at 10x corpus"):
    * `maxDocFreq` is a corpus FRACTION (~1.3% of docs), not a
    * constant — a fixed cap silently loses recall as the corpus grows;
    * and on replica-heavy corpora run [[exact]] FIRST — posting-pair
    * generation is quadratic in duplicate-group size, so collapsing
    * exact groups before the near-dup pass is the difference between
    * 2.4s and 63s at 50k docs. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Int = 0, minShared: Int = 1,
      broadcastBytesCap: Long = 128L << 20): DataFrame = {
    // All joins/intersections run on the 60-bit integer shingle hash of
    // [[shingleHashSets]]: long equi-joins and long-array intersections
    // are several× cheaper than their string equivalents, and collisions
    // (2^-60) only merge posting lists. The set table feeds BOTH the
    // candidate pipeline and the verification semi-join — persist it for
    // the pass so the md5-per-shingle build runs once, not twice.
    val sets = shingleHashSets(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = sets.select(col("sid"), explode(col("hs")).as("h"))
    // Candidate pairs straight off the posting lists: one groupBy
    // builds each shingle's doc list, the size filter IS the df cap,
    // and pairs are emitted in-row — Σ C(df,2) pair rows total, with
    // no posting-list self-join (which would also re-shuffle both
    // sides and emit the a/b-symmetric half it then filters away).
    // The uncapped path keeps the self-join: an unbounded hot posting
    // list must not be materialized as one in-row pair array.
    val cand = if (maxDocFreq > 0) {
      val lists = sh.groupBy("h").agg(collect_list(col("sid")).as("sids"))
        .filter(size(col("sids")) <= maxDocFreq)
      // Pack each pair into one long when ids fit in 31 bits: the
      // Σ C(df,2) pair stream becomes primitive 8-byte keys instead
      // of struct rows through the generic UDF encoder, and the
      // shared-count groupBy hashes a single long. The bounds check
      // runs on `sets` — this is the job that materializes the
      // persisted shingle build, so the raw table isn't rescanned and
      // every later stage reads the cache.
      val bounds = sets.agg(min(col("sid")).cast("long"), max(col("sid")).cast("long")).head()
      val packable = !bounds.isNullAt(0) &&
        bounds.getLong(0) >= 0 && bounds.getLong(1) < Int.MaxValue.toLong
      if (packable) {
        lists.select(explode(packedPostingPairsUdf(col("sids"))).as("p"))
          .groupBy("p").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= minShared)
          .select(shiftrightunsigned(col("p"), 32).as("id_a"),
            col("p").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
      } else {
        lists.select(explode(postingPairsUdf(col("sids"))).as("p"))
          .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= minShared)
          .select("id_a", "id_b")
      }
    } else {
      sh.as("a").join(sh.as("b"), col("a.h") === col("b.h"))
        .filter(col("a.sid") < col("b.sid"))
        .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .select("id_a", "id_b")
    }
    // Verification — scale-safe shape:
    //   1. persist the candidate pairs (used for the id set AND both
    //      verification joins — without the persist the whole
    //      posting-list build re-executes per use);
    //   2. semi-join the per-doc hash sets down to candidate docs ONLY
    //      (the full-corpus set table must never be broadcast: at real
    //      corpus sizes it exceeds any driver/broadcast limit);
    //   3. broadcast the pruned sets only if their MEASURED size fits
    //      under `broadcastBytesCap`, else fall back to shuffle
    //      equi-joins (AQE still converts them at runtime if small).
    // The function is eager (it runs the candidate+verify jobs when
    // called) so intermediates can be unpersisted before returning;
    // the returned pair frame itself is persisted — it is the small
    // end product of the pass and is typically consumed 2+ times
    // (drop-list + reporting).
    val cand2 = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = cand2.count()
    val candIds = cand2.select(explode(array(col("id_a"), col("id_b"))).as("sid")).distinct()
    // candidate-id side is 8-byte longs: broadcast it for a map-side
    // semi-join unless even the id list is too big for the cap
    val idsFit = nPairs * 2L * 24L < broadcastBytesCap
    val prunedSets = sets.join(
      if (idsFit) broadcast(candIds) else candIds, Seq("sid"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val st = prunedSets.agg(count(lit(1)), coalesce(sum(col("sz")), lit(0L))).head()
    val setsBytes = st.getLong(0) * 64L + st.getLong(1) * 8L
    val vsets = if (setsBytes < broadcastBytesCap) broadcast(prunedSets) else prunedSets
    val joinedA = cand2.join(vsets, cand2("id_a") === vsets("sid"))
      .select(col("id_a"), col("id_b"), col("hs").as("set_a"), col("sz").as("sz_a"))
    val verified = joinedA.join(vsets, joinedA("id_b") === vsets("sid"))
      .withColumn("inter",
        graft.functions.ArrayFunctions.sortedIntersectCount(col("set_a"), col("hs")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select("id_a", "id_b", "jaccard")
      .localCheckpoint(true) // eager: drop the (larger) intermediates below
    cand2.unpersist()
    prunedSets.unpersist()
    sets.unpersist()
    verified // eager localCheckpoint: ContextCleaner reclaims the blocks
  }

  /** [[jaccardPairs]] with EXACT-DUPLICATE COLLAPSE first — the scale
    * architecture for replica-heavy corpora, producing the IDENTICAL
    * pair set (asserted in OpsSpec against the direct path):
    *
    *  1. collapse byte-identical texts into classes (sha-256 key, rep =
    *     min id, member list carried);
    *  2. run the posting-list candidate machinery over REPRESENTATIVES
    *     only, with each shingle's df measured as the SUM OF CLASS
    *     SIZES — i.e. the full-corpus df, so the cap keeps its exact
    *     semantics;
    *  3. verify exact Jaccard on rep pairs (identical texts have
    *     identical shingle sets, so every member pair inherits its
    *     reps' jaccard verbatim);
    *  4. expand: within-class pairs (jaccard exactly 1.0 — emitted only
    *     when the class's capped-rare shingle count reaches `minShared`
    *     and 1.0 ≥ threshold, which is precisely when the direct path
    *     emits them) plus cross-class member products of the verified
    *     rep pairs.
    *
    * Why: the direct posting join materializes Σ C(df, 2) candidate
    * rows, and on a corpus where every doc has F−1 verbatim clones
    * every shingle's df is ≥ F — at sf10 (F = 100) that was ~12G
    * candidate rows and a disk-full, for a TRUE pair set of ~27M. The
    * collapsed form's candidate volume is the DISTINCT corpus's — it
    * no longer grows with the replication factor at all; only the
    * final output (which is the answer) does. On a mostly-unique
    * corpus classes ≈ docs and the plan degenerates to the direct one
    * plus a cheap sha groupBy. Eager; returns the persisted pair
    * frame (no unpersist contract). */
  def jaccardPairsCollapsed(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int, minShared: Int = 1,
      broadcastBytesCap: Long = 128L << 20,
      sideDir: Option[String] = None): DataFrame = {
    require(maxDocFreq > 0, "jaccardPairsCollapsed needs a posting-list cap")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // id type preserved (no cast): the collapsed path must be a
    // drop-in for [[jaccardPairs]], which keeps the input id type —
    // min/sort_array/least/greatest below are all type-generic
    val classes = df
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .groupBy(textClassKey(col("__text")).as("__k"))
      .agg(min(col("__id")).as("rep"),
        sort_array(collect_list(col("__id"))).as("members"),
        count(lit(1)).as("w"),
        first(col("__text")).as("__text"))
      .drop("__k")
      .persist(lvl)
    val weights = classes.select(col("rep").as("sid"), col("w"))
    val sets = shingleHashSets(
        classes.select(col("rep"), col("__text")), "rep", "__text", n)
      .persist(lvl)
    // plain equi-join: the weight table is rep-sized (could itself be
    // corpus-sized on a unique corpus) — AQE broadcasts it when small
    val sh = sets.select(col("sid"), explode(col("hs")).as("h"))
      .join(weights, Seq("sid"))
    // rare grams: the df CAP applies to the weighted (full-corpus)
    // doc frequency
    val rareGrams = sh.groupBy("h").agg(sum(col("w")).as("wdf"))
      .filter(col("wdf") <= maxDocFreq).select("h")
    val rare = sh.join(rareGrams, Seq("h"), "left_semi").select("sid", "h")
      .persist(lvl)
    // candidate pairs by STREAMING self-join (never an in-row pair
    // array: with a corpus-scaled cap, C(cap, 2) per-gram arrays OOM
    // an executor long before the shuffle volume hurts — measured at
    // sf10's 6400 cap)
    val cand = rare.as("a").join(rare.as("b"), col("a.h") === col("b.h"))
      .filter(col("a.sid") < col("b.sid"))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("id_a", "id_b")
      .persist(lvl)
    cand.count()
    // per-rep count of capped-rare shingles: gates within-class pairs
    // exactly like the direct path (clone pairs share their whole set,
    // so their shared-rare count is the set's rare count)
    val rareCnt = rare.groupBy("sid").agg(count(lit(1)).as("rare_cnt"))
    // exact-jaccard verification on rep pairs (same shape as
    // jaccardPairs' step 2, candidate volume is rep-scale here)
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("sid")).distinct()
    val prunedSets = sets.join(candIds, Seq("sid"), "left_semi").persist(lvl)
    val st = prunedSets.agg(count(lit(1)), coalesce(sum(col("sz")), lit(0L))).head()
    val vsets = if (st.getLong(0) * 64L + st.getLong(1) * 8L < broadcastBytesCap)
      broadcast(prunedSets) else prunedSets
    val joinedA = cand.join(vsets, cand("id_a") === vsets("sid"))
      .select(col("id_a"), col("id_b"), col("hs").as("set_a"), col("sz").as("sz_a"))
    val repPairs0 = joinedA.join(vsets, joinedA("id_b") === vsets("sid"))
      .withColumn("inter",
        graft.functions.ArrayFunctions.sortedIntersectCount(col("set_a"), col("hs")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("jaccard"))
    // two consumers when sideDir is set (expansion + the side write)
    val repPairs = if (sideDir.isDefined) repPairs0.persist(lvl) else repPairs0
    // expansion — within-class clone pairs (jaccard exactly 1.0) ...
    val withinEligible = classes.filter(col("w") > 1)
      .join(rareCnt.withColumnRenamed("sid", "rep"), Seq("rep"))
      .filter(col("rare_cnt") >= minShared && lit(1.0) >= lit(threshold))
    val within = withinEligible
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members) - i - 1),
          |    y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), lit(1.0).as("jaccard"))
    // ... and cross-class member products of the verified rep pairs
    val memA = classes.select(col("rep").as("rep_a"), col("members").as("__ma"))
    val memB = classes.select(col("rep").as("rep_b"), col("members").as("__mb"))
    val cross = repPairs.join(memA, Seq("rep_a")).join(memB, Seq("rep_b"))
      .select(explode(col("__ma")).as("a"), col("__mb"), col("jaccard"))
      .select(col("a"), explode(col("__mb")).as("b"), col("jaccard"))
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"), col("jaccard"))
    val out = within.unionByName(cross).localCheckpoint(true)
    // side outputs for graph consumers (the collapsed-CC path): clone
    // classes, the verified rep-level pair graph, and the reps whose
    // within-class clique pairs were emitted — together they determine
    // the expanded graph exactly, at distinct-corpus size
    sideDir.foreach { d =>
      classes.select(col("rep"), col("members"), col("w"))
        .write.mode("overwrite").parquet(s"$d/classes")
      repPairs.write.mode("overwrite").parquet(s"$d/reppairs")
      withinEligible.select(col("rep"))
        .write.mode("overwrite").parquet(s"$d/withinreps")
    }
    repPairs.unpersist()
    cand.unpersist(); rare.unpersist(); prunedSets.unpersist()
    sets.unpersist(); classes.unpersist()
    out
  }

  /** Persist the per-doc shingle-hash sets as a parquet index under
    * `dir/sets` — the stored half of INCREMENTAL dedup. Mode "append"
    * is the ingest-time upsert: after a batch is admitted, its sets
    * join the index so the next batch dedups against it. */
  def writeShingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, dir: String, mode: String = "overwrite"): Unit =
    shingleHashSets(df, idCol, textCol, n)
      .write.mode(mode).parquet(s"$dir/sets")

  /** Incremental near-dup: exact-Jaccard pairs (a < b, ≥ `threshold`)
    * between a NEW batch and the stored corpus index (plus within the
    * batch) — the operational shape of dedup at 100 TB: a daily crawl
    * increment must not re-dedup the whole corpus, only itself and its
    * overlap with what exists. Bit-identical to re-running
    * [[jaccardPairs]] over stored ∪ new and keeping the pairs touching
    * a new id (asserted in OpsSpec; the `dedup_incremental` oracle
    * replays exactly that SQL):
    *
    *  - candidate rarity (the df cap) is measured over stored ∪ new —
    *    but only for grams PRESENT in the new batch, because a pair
    *    touching a new doc can only share grams that doc has; the
    *    stored posting explode is therefore semi-joined down to the
    *    batch's gram set first (index work scales with batch overlap,
    *    not corpus size);
    *  - old-old pairs sharing batch grams are dropped — they were
    *    found when their own batches were ingested;
    *  - verification uses the full stored/new hash sets with the same
    *    measured-broadcast discipline as [[jaccardPairs]].
    *
    * Eager; returns a localCheckpoint-backed pair frame (no unpersist contract). */
  def incrementalJaccardPairs(spark: org.apache.spark.sql.SparkSession,
      dir: String, newDocs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int, minShared: Int = 1,
      broadcastBytesCap: Long = 128L << 20): DataFrame = {
    require(maxDocFreq > 0, "incrementalJaccardPairs needs a posting-list cap")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // COLLAPSE-FIRST (the [[jaccardPairsCollapsed]] architecture, keyed
    // on SET identity since the stored index has no text): Jaccard is a
    // function of the shingle sets alone, so docs with identical
    // (sorted) hash arrays are interchangeable — group them into
    // classes, run candidates + verification over representatives with
    // weighted dfs, and expand member pairs at the end. On the
    // replica-heavy corpora this op exists for, the per-gram pair work
    // stops growing with the replication factor; on unique corpora
    // classes ≈ docs and the plan degenerates to the direct one.
    // DRIVER-BARRIER BUDGET (r10 found 4 eager count()/agg barriers
    // made this the slowest sf0.1 query at 6.06 s despite the right
    // distributed shape): the new-gram and candIds semi-join build
    // sides are left to AQE's runtime-stats broadcast conversion
    // (both are batch-overlap-sized — AQE sees their shuffle stats
    // and broadcasts when they fit); the only explicit sizing agg
    // left is over the already-pruned verification sets. One driver
    // action plus the eager-contract count at return.
    val newSets = shingleHashSets(newDocs, idCol, textCol, n)
      .withColumn("__new", lit(true))
    val storedSets = spark.read.parquet(s"$dir/sets")
      .withColumn("__new", lit(false))
    // exact array grouping key (sorted hash arrays: set-equal ⟺
    // array-equal) — a hashed key would merge distinct classes
    // silently on collision
    val classes = storedSets.unionByName(newSets)
      .groupBy(col("hs"))
      .agg(min(col("sid")).as("rep"),
        sort_array(collect_list(struct(col("sid"), col("__new")))).as("members"),
        count(lit(1)).as("w"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("w_new"),
        first(col("sz")).as("sz"))
      .persist(lvl)
    // rarity: weighted df over stored ∪ new, but only for grams present
    // in the new batch (a pair touching a new doc can only share grams
    // that doc has — index work scales with batch overlap). ONE per-gram
    // aggregate carries both facts (df ≤ cap, present-in-batch): the
    // old newGrams-distinct → semi-join → df-groupBy chain re-exploded
    // the posting lists three times for the same answer — batch
    // presence only FILTERS grams, it never drops a kept gram's
    // postings, so df over the filtered postings equals df over all.
    val post = classes.select(col("rep").as("sid"), col("w"), col("w_new"),
      explode(col("hs")).as("h"))
    val rareGrams = post.groupBy("h")
      .agg(sum(col("w")).as("wdf"), sum(col("w_new")).as("w_new_tot"))
      .filter(col("w_new_tot") > 0 && col("wdf") <= maxDocFreq)
      .select("h")
    val rare = post.join(rareGrams, Seq("h"), "left_semi")
      .select("sid", "h", "w_new").persist(lvl)
    // rep candidates by streaming self-join (no in-row pair arrays —
    // C(cap, 2) arrays OOM at corpus-scaled caps), keeping pairs where
    // at least one side's class contains a new doc
    val cand = rare.as("a").join(rare.as("b"), col("a.h") === col("b.h"))
      .filter(col("a.sid") < col("b.sid") &&
        (col("a.w_new") > 0 || col("b.w_new") > 0))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("id_a", "id_b")
      .persist(lvl)
    val repSets = classes.select(col("rep").as("sid"), col("hs"), col("sz"))
    // candIds' broadcast-vs-shuffle call is AQE's: the build side's
    // runtime shuffle stats decide, no driver count barrier
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("sid")).distinct()
    val prunedSets = repSets.join(candIds, Seq("sid"), "left_semi")
      .persist(lvl)
    val st = prunedSets.agg(count(lit(1)), coalesce(sum(col("sz")), lit(0L))).head()
    val setsBytes = st.getLong(0) * 64L + st.getLong(1) * 8L
    val vsets = if (setsBytes < broadcastBytesCap) broadcast(prunedSets) else prunedSets
    val joinedA = cand.join(vsets, cand("id_a") === vsets("sid"))
      .select(col("id_a"), col("id_b"), col("hs").as("set_a"), col("sz").as("sz_a"))
    val repPairs = joinedA.join(vsets, joinedA("id_b") === vsets("sid"))
      .withColumn("inter",
        graft.functions.ArrayFunctions.sortedIntersectCount(col("set_a"), col("hs")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("jaccard"))
    // within-class expansion: clone pairs (jaccard exactly 1.0) with at
    // least one new member, gated by the class's rare-shingle count
    // like the direct path; old-old pairs were found at their own
    // ingest and are dropped
    val rareCnt = rare.groupBy("sid").agg(count(lit(1)).as("rare_cnt"))
    val within = classes.filter(col("w") > 1 && col("w_new") > 0)
      .join(rareCnt.withColumnRenamed("sid", "rep"), Seq("rep"))
      .filter(col("rare_cnt") >= minShared && lit(1.0) >= lit(threshold))
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members) - i - 1),
          |    y -> struct(x.sid AS id_a, y.sid AS id_b,
          |      x.__new OR y.__new AS touches_new))))""".stripMargin)).as("p"))
      .filter(col("p.touches_new"))
      .select(col("p.id_a"), col("p.id_b"), lit(1.0).as("jaccard"))
    // cross-class expansion of verified rep pairs, touching-new only
    val memA = classes.select(col("rep").as("rep_a"), col("members").as("__ma"))
    val memB = classes.select(col("rep").as("rep_b"), col("members").as("__mb"))
    val cross = repPairs.join(memA, Seq("rep_a")).join(memB, Seq("rep_b"))
      .select(explode(col("__ma")).as("a"), col("__mb"), col("jaccard"))
      .select(col("a"), explode(col("__mb")).as("b"), col("jaccard"))
      .filter(col("a.__new") || col("b.__new"))
      .select(least(col("a.sid"), col("b.sid")).as("id_a"),
        greatest(col("a.sid"), col("b.sid")).as("id_b"), col("jaccard"))
    val verified = within.unionByName(cross)
      .localCheckpoint(true) // eager: intermediates below can be released
    cand.unpersist(); rare.unpersist(); prunedSets.unpersist()
    classes.unpersist()
    verified // eager localCheckpoint: ContextCleaner reclaims the blocks
  }

  /** MinHash seed constants: per-hash affine coefficients (a_i, b_i),
    * < 2^31 so a_i · H (H < 2^28) never overflows a signed 64-bit int in
    * any engine (DuckDB errors on bigint overflow; Java wraps — both
    * stay in range). Shared with the SQL oracle, which replays the
    * identical family. */
  val MinhashP: Long = 1000000007L
  def minhashSeeds(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      ((2654435761L * (i + 1)) % 2147483647L, (40503L * (i + 7)) % 2147483647L)
    }

  /** Wide MinHash signatures over hashed shingles (a (sid, h) frame from
    * [[hashedShingles]]): one row per doc, columns mh0..mh{k-1} = min
    * over the doc's shingles of h_i(shingle). The base hash
    * H = h >>> 32 ∈ [0, 2^28) is the integer value of the first 7 md5
    * hex chars (the top 28 of the 60 hash bits) — engine-portable
    * (DuckDB: CAST('0x'||… AS BIGINT)); per-seed hashes are cheap
    * affine maps h_i = (a_i·H + b_i) mod p, so the minhash pass does
    * numHashes multiplies per row instead of numHashes md5s over an
    * exploded (row × seed) table. Single groupBy with map-side partial
    * aggregation — the shuffle carries only numHashes longs per doc,
    * never per-shingle rows. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val h = shiftright(col("h"), 32)
    val aggs = minhashSeeds(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((h * lit(a) + lit(b)) % lit(MinhashP)).as(s"mh$i")
    }
    sh.groupBy("sid").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over wide signatures: band b's key is the ','-joined
    * mins of seeds [b·rowsPerBand, (b+1)·rowsPerBand). Docs sharing any
    * (band, key) are candidate near-duplicates. */
  def lshBandKeys(signatures: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { bn =>
      val keyCols = (bn * rowsPerBand until (bn + 1) * rowsPerBand)
        .map(i => col(s"mh$i").cast("string"))
      struct(lit(bn).as("band"), concat_ws(",", keyCols: _*).as("band_key"))
    }
    signatures.select(col("sid"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("sid"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs (a < b) from LSH banding over character n-grams.
    * The join is on (band, band_key) equality buckets — never all-pairs.
    *
    * Hot-shingle cap: with `maxDocFreq` (fixed) or `maxDocFreqFraction`
    * (cap = greatest(floor(corpus × fraction), dfFloor), computed
    * IN-PLAN — the 1-row corpus-count aggregate is cross-joined onto
    * the doc-frequency table, so sizing the cap costs no separate
    * driver-side count job), shingles in more docs than the cap are
    * dropped before signatures — boilerplate would otherwise align
    * minhashes and make every band bucket quadratic.
    *
    * Fallback for all-hot docs: a doc whose EVERY shingle is over the
    * cap would otherwise lose all its rows — no signature, silently
    * invisible to LSH even when it has verbatim near-dups. Such docs
    * keep their `numHashes` lowest-df shingles instead ((df, h)
    * ordering — deterministic, replayed by the SQL oracle). The
    * fallback path touches only the lost docs' rows: the capped
    * mainline stays a broadcast anti-join, no corpus-wide window. */
  /** Distinct candidate pairs (a < b) from banded signatures: docs
    * sharing any (band, band_key) bucket. Shared by the direct and
    * collapsed LSH paths. */
  private def bandBucketPairs(signatures: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val bands = lshBandKeys(signatures, numHashes, rowsPerBand)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .distinct()
  }

  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, maxDocFreq: Int = 0,
      maxDocFreqFraction: Double = 0.0, dfFloor: Int = 16): DataFrame = {
    def bandPairs0(signatures: DataFrame): DataFrame =
      bandBucketPairs(signatures, numHashes, rowsPerBand)
    def bandPairs(sh: DataFrame): DataFrame =
      bandPairs0(minhashSignatures(sh, numHashes))
    if (maxDocFreq <= 0 && maxDocFreqFraction <= 0) {
      // uncapped: the shingle scan has a single consumer — stay lazy
      bandPairs(hashedShingles(df, idCol, textCol, n))
    } else {
      // The md5-per-shingle scan (the expensive pass) feeds THREE
      // lineages in the capped branch: the doc-frequency table, the
      // signature aggregation, and the (usually-empty) all-hot-doc
      // fallback. Persist the COMPACT per-doc set form for the pass —
      // one long-array row per doc, re-exploding is cheap next to the
      // md5 build — so the scan runs once, not 4-5×. Like
      // [[jaccardPairs]] the function is then eager: the (small)
      // candidate pair frame is materialized so the scan cache can be
      // released before returning. Caller owns the returned frame's
      // `unpersist()`.
      val sets = shingleHashSets(df, idCol, textCol, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val all = sets.select(col("sid"), explode(col("hs")).as("h"))
      val capDf =
        if (maxDocFreq > 0) df.sparkSession.range(1).select(lit(maxDocFreq.toLong).as("cap"))
        else df.agg(greatest(floor(count(lit(1)) * lit(maxDocFreqFraction)),
          lit(dfFloor.toLong)).as("cap"))
      val dfc = all.groupBy("h").agg(count(lit(1)).as("dfh"))
      val hot = dfc.crossJoin(broadcast(capDf))
        .filter(col("dfh") > col("cap")).select("h")
      // ONE groupBy computes both the over-cap-filtered signatures and
      // each doc's kept-row count: minhash mins over non-hot rows only,
      // via a broadcast hot-flag join — no separate kept/lost distinct
      // shuffles over the exploded rows (those two extra aggregations
      // were ~40% of the query's wall time at sf0.1).
      val h28 = shiftright(col("h"), 32)
      val keptMins = minhashSeeds(numHashes).zipWithIndex.map { case ((a, b), i) =>
        min(when(col("hot_flag").isNull,
          (h28 * lit(a) + lit(b)) % lit(MinhashP))).as(s"mh$i")
      }
      val sigs = all
        .join(broadcast(hot.withColumn("hot_flag", lit(1))), Seq("h"), "left")
        .groupBy("sid")
        .agg(keptMins.head, (keptMins.tail :+
          count(when(col("hot_flag").isNull, lit(1))).as("kept_cnt")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val okSigs = sigs.filter(col("kept_cnt") > 0).drop("kept_cnt")
      // all-hot docs: every shingle over the cap — no kept rows, so no
      // signature; rank THEIR rows by (df, h) and re-signature over the
      // numHashes lowest-df shingles. Touches only the lost docs' rows.
      val lost = sigs.filter(col("kept_cnt") === 0).select("sid")
      val fallbackRows = all.join(broadcast(lost), Seq("sid"), "left_semi")
        .join(dfc, Seq("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("sid")).orderBy(col("dfh").asc, col("h").asc)))
        .filter(col("rk") <= numHashes)
        .select("sid", "h")
      val allSigs = okSigs.unionByName(minhashSignatures(fallbackRows, numHashes))
      val result = bandPairs0(allSigs)
        .localCheckpoint(true) // eager: drop the scan + signature caches below
      sigs.unpersist()
      sets.unpersist()
      result // eager localCheckpoint: ContextCleaner reclaims the blocks
    }
  }

  /** Clone-class grouping key: sha-256 of the text with a NULL/non-NULL
    * flag prefixed, so a NULL text and an empty-string text land in
    * DIFFERENT classes. Without the flag `coalesce(text, '')` merges
    * them into one class whose `first(text)` representative is
    * nondeterministic, and per-doc collapsed twins would then give a
    * null-text doc the metrics of the ''-text rep (or vice versa) —
    * the direct path distinguishes them (null words vs 0 words). */
  private[graft] def textClassKey(text: Column): Column =
    sha2(concat(when(text.isNull, lit("0")).otherwise(lit("1")),
      coalesce(text, lit(""))), 256)

  /** Byte-identical-text clone classes — the shared first rung of the
    * collapse-first family ([[jaccardPairsCollapsed]]'s step 1 as a
    * reusable frame): one row per distinct text with `rep` = min id,
    * `members` = sorted id list, `w` = class size, `__text` carried
    * for the representative pass. One sha-256 hash-shuffle; id type
    * preserved; NULL and '' texts are distinct classes
    * ([[textClassKey]]). Package-visible: the weighted collapse twins
    * in [[TextAnalytics]] build on the same classes. */
  private[graft] def cloneClasses(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .groupBy(textClassKey(col("__text")).as("__k"))
      .agg(min(col("__id")).as("rep"),
        sort_array(collect_list(col("__id"))).as("members"),
        count(lit(1)).as("w"),
        first(col("__text")).as("__text"))
      .drop("__k")

  /** All within-class member pairs (a < b) of the multi-member clone
    * classes — members are sorted, so position order IS id order. */
  private def withinClassPairs(classes: DataFrame): DataFrame =
    classes.filter(col("w") > 1)
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members) - i - 1),
          |    y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

  /** Cross-class expansion: each verified representative pair
    * (`rep_a`, `rep_b`, carry…) becomes the full member product of its
    * two classes, re-canonicalized a < b (strided clone ids interleave
    * across classes). `carry` columns (hamming, jaccard, …) copy
    * through unchanged — they are functions of the texts, which are
    * identical within each class. */
  private def expandRepPairs(repPairs: DataFrame, classes: DataFrame,
      carry: Seq[String]): DataFrame = {
    val memA = classes.select(col("rep").as("rep_a"), col("members").as("__ma"))
    val memB = classes.select(col("rep").as("rep_b"), col("members").as("__mb"))
    repPairs.join(memA, Seq("rep_a")).join(memB, Seq("rep_b"))
      .select((explode(col("__ma")).as("__a") +: col("__mb") +: carry.map(col)): _*)
      .select((explode(col("__mb")).as("__b") +: col("__a") +: carry.map(col)): _*)
      .select((least(col("__a"), col("__b")).as("id_a") +:
        greatest(col("__a"), col("__b")).as("id_b") +: carry.map(col)): _*)
  }

  /** [[minhashLshCandidates]] with EXACT-DUPLICATE COLLAPSE first —
    * IDENTICAL pair set (OpsSpec-asserted), replica-proof cost:
    *
    *  1. collapse byte-identical texts ([[cloneClasses]]);
    *  2. signatures/banding over REPRESENTATIVES only, with each
    *     shingle's doc frequency measured as the SUM OF CLASS SIZES
    *     (= the full-corpus df, so the hot-shingle cap and the
    *     all-hot fallback ranking keep their exact semantics — both
    *     are content-determined, so clones always agree);
    *  3. expand: within-class pairs (identical texts ⇒ identical
    *     signatures ⇒ co-bucketed in every band — emitted whenever the
    *     class has ≥ 1 shingle, i.e. whenever it has a signature at
    *     all) plus cross-class member products of the rep band pairs.
    *
    * Why: on a corpus where every doc has F−1 verbatim clones, every
    * band bucket holds ≥ F aligned signatures — the direct bucket
    * self-join materializes F² rows per distinct bucket (and the md5
    * shingle pass runs F× too). Collapsed, candidate volume is the
    * DISTINCT corpus's; only the output (the answer) scales with F.
    * Eager; returns a localCheckpoint-backed pair frame (no unpersist contract). */
  def minhashLshCandidatesCollapsed(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, maxDocFreq: Int = 0,
      maxDocFreqFraction: Double = 0.0, dfFloor: Int = 16): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = cloneClasses(df, idCol, textCol).persist(lvl)
    val weights = classes.select(col("rep").as("sid"), col("w"))
    val sets = shingleHashSets(
        classes.select(col("rep"), col("__text")), "rep", "__text", n)
      .persist(lvl)
    val all = sets.select(col("sid"), explode(col("hs")).as("h"))
    val repPairs =
      if (maxDocFreq <= 0 && maxDocFreqFraction <= 0)
        bandBucketPairs(minhashSignatures(all, numHashes), numHashes, rowsPerBand)
      else {
        val capDf =
          if (maxDocFreq > 0)
            df.sparkSession.range(1).select(lit(maxDocFreq.toLong).as("cap"))
          else weights.agg(greatest(floor(sum(col("w")) * lit(maxDocFreqFraction)),
            lit(dfFloor.toLong)).as("cap"))
        // weighted df = full-corpus doc frequency (each clone counted)
        val dfc = all.join(weights, Seq("sid"))
          .groupBy("h").agg(sum(col("w")).as("dfh"))
        val hot = dfc.crossJoin(broadcast(capDf))
          .filter(col("dfh") > col("cap")).select("h")
        val h28 = shiftright(col("h"), 32)
        val keptMins = minhashSeeds(numHashes).zipWithIndex.map { case ((a, b), i) =>
          min(when(col("hot_flag").isNull,
            (h28 * lit(a) + lit(b)) % lit(MinhashP))).as(s"mh$i")
        }
        val sigs = all
          .join(broadcast(hot.withColumn("hot_flag", lit(1))), Seq("h"), "left")
          .groupBy("sid")
          .agg(keptMins.head, (keptMins.tail :+
            count(when(col("hot_flag").isNull, lit(1))).as("kept_cnt")): _*)
          .persist(lvl)
        val okSigs = sigs.filter(col("kept_cnt") > 0).drop("kept_cnt")
        val lost = sigs.filter(col("kept_cnt") === 0).select("sid")
        val fallbackRows = all.join(broadcast(lost), Seq("sid"), "left_semi")
          .join(dfc, Seq("h"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("sid")).orderBy(col("dfh").asc, col("h").asc)))
          .filter(col("rk") <= numHashes)
          .select("sid", "h")
        val allSigs = okSigs.unionByName(minhashSignatures(fallbackRows, numHashes))
        val p = bandBucketPairs(allSigs, numHashes, rowsPerBand).persist(lvl)
        p.count()
        sigs.unpersist()
        p
      }
    // a class is banded iff it has ≥ 1 shingle (kept rows sign its
    // mainline signature; an all-hot class still gets the fallback one)
    val sigful = sets.filter(col("sz") > 0).select(col("sid").as("rep"))
    val within = withinClassPairs(classes.join(sigful, Seq("rep"), "left_semi"))
    val cross = expandRepPairs(
      repPairs.withColumnRenamed("id_a", "rep_a").withColumnRenamed("id_b", "rep_b"),
      classes, carry = Seq.empty)
    val out = within.unionByName(cross).localCheckpoint(true)
    repPairs.unpersist(); sets.unpersist(); classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** FUZZY benchmark decontamination: corpus documents whose MinHash
    * signature overlaps a benchmark document's above `threshold` — the
    * near-duplicate complement of the exact n-gram [[decontaminate]]
    * pass (a lightly paraphrased test item shares few exact 8-grams
    * but most of its shingle sets; GPT-3 appendix-C-style fuzzy
    * decontamination catches it). Candidates come from LSH banding
    * ACROSS the two sides (never all-pairs), then the signature-match
    * fraction `|{i : mh_i^c = mh_i^b}| / numHashes` — an unbiased
    * Jaccard estimate, exactly replayable (x/numHashes is dyadic) —
    * gates the output.
    *
    * Scale shape: benchmark sets are corpus-tiny (thousands of eval
    * items vs billions of docs), so the bench signatures and band keys
    * BROADCAST; the corpus side pays one shingle scan + one
    * signature groupBy, and both joins (band-bucket candidates,
    * signature fetch-back) are map-side against broadcast tables — no
    * corpus-sized shuffle beyond the signature aggregation. */
  def minhashDecontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sigC = minhashSignatures(hashedShingles(corpus, corpusId, corpusText, n), numHashes)
    val sigB = minhashSignatures(hashedShingles(benchmark, benchId, benchText, n), numHashes)
    val bandsB = lshBandKeys(sigB, numHashes, rowsPerBand)
      .withColumnRenamed("sid", "bench_sid")
    val cand = lshBandKeys(sigC, numHashes, rowsPerBand)
      .join(broadcast(bandsB), Seq("band", "band_key"))
      .select(col("sid").as("cand_sid"), col("bench_sid")).distinct()
    val matches = (0 until numHashes).map(i =>
      when(col(s"c.mh$i") === col(s"b.mh$i"), 1).otherwise(0)).reduce(_ + _)
    sigC.as("c").join(broadcast(cand), col("c.sid") === col("cand_sid"))
      .join(broadcast(sigB.as("b")), col("bench_sid") === col("b.sid"))
      .select(col("c.sid").as("sid"), col("bench_sid").as("bench_id"),
        (matches.cast("double") / numHashes).as("minhash_est"))
      .filter(col("minhash_est") >= threshold)
  }

  /** [[minhashDecontaminate]] with EXACT-DUPLICATE COLLAPSE of the
    * CORPUS side first — identical output rows (OpsSpec-asserted):
    * both the LSH banding and the signature-match fraction are pure
    * functions of the text, so every clone of a flagged class is
    * flagged against the same bench ids with the same estimate. The
    * corpus-side shingle scan + signature groupBy (the whole cost at
    * scale — the bench side broadcasts) then run once per DISTINCT
    * text instead of once per clone. The benchmark side is left
    * as-is: it is corpus-tiny by contract. Eager; returns the
    * persisted frame (no unpersist contract). */
  def minhashDecontaminateCollapsed(corpus: DataFrame, corpusId: String,
      corpusText: String, benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = cloneClasses(corpus, corpusId, corpusText).persist(lvl)
    val repOut = minhashDecontaminate(
      classes.select(col("rep"), col("__text")), "rep", "__text",
      benchmark, benchId, benchText, n, numHashes, rowsPerBand, threshold)
    val out = repOut
      .join(classes.select(col("rep").as("sid"), col("members")), Seq("sid"))
      .select(explode(col("members")).as("sid"),
        col("bench_id"), col("minhash_est"))
      .localCheckpoint(true)
    classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Per-document n-gram novelty with EXACT-DUPLICATE COLLAPSE —
    * identical output to the direct form (OpsSpec-asserted): the
    * fraction of a doc's distinct word n-grams appearing in NO other
    * document. Gram document-frequency is the WEIGHTED df over
    * distinct texts (Σ class sizes = full-corpus df — a gram is novel
    * iff its only class has exactly one member), and per-doc counts
    * are class constants, so both the gram explode and the df join
    * run at distinct-text scale; only the per-doc output expansion is
    * corpus-sized. Eager; returns the persisted frame (caller
    * unpersists). */
  def ngramNoveltyCollapsed(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = cloneClasses(df, idCol, textCol).persist(lvl)
    val weights = classes.select(col("rep").as("sid"), col("w"))
    val grams = wordGramHashes(
        classes.select(col("rep"), col("__text")), "rep", "__text", n)
      .persist(lvl) // two consumers: weighted df + per-rep rollup
    val dfreq = grams.join(weights, Seq("sid"))
      .groupBy("gh").agg(sum(col("w")).as("__df"))
    val perRep = grams.join(dfreq, Seq("gh"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
    val out = perRep
      .join(classes.select(col("rep").as("sid"), col("members")), Seq("sid"))
      .select(explode(col("members")).as("doc_id"),
        col("n_grams"), col("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .localCheckpoint(true)
    grams.unpersist(); classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Generic EXACT-DUPLICATE COLLAPSE for per-doc, content-determined
    * transforms — the dictionary-execution combinator behind the
    * collapsed query family: run `f` over one representative of each
    * byte-identical text class, then expand every produced row to all
    * clone ids.
    *
    * Exactness contract: `f`'s output must be a PURE FUNCTION of the
    * text — any number of rows per input id (per-doc stats, chunk
    * explodes), carrying the id column named
    * `outId` plus content-determined columns (per-doc quality stats,
    * gram counts, fingerprints, contamination counts, …). Under that
    * contract the expansion reproduces the direct output row set
    * verbatim: clones have identical texts, hence identical rows up
    * to the id. Transforms that aggregate ACROSS docs (df counts,
    * corpus LMs) need a weighted twin instead — see
    * [[graft.ops.TextAnalytics.ngramDiversityCollapsed]].
    *
    * Cost: one sha-256 hash-shuffle of the corpus + `f` at
    * distinct-text scale + an output-sized expansion join, vs `f` at
    * corpus scale. On an F×-replicated corpus every per-byte pass
    * inside `f` (regex, md5, tokenization) runs F× less; on a
    * mostly-unique corpus it degenerates to `f` plus the one extra
    * exchange. Eager; returns the persisted frame (caller
    * unpersists). */
  def perDocCollapsed(df: DataFrame, idCol: String, textCol: String,
      outId: String)(f: DataFrame => DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = cloneClasses(df, idCol, textCol).persist(lvl)
    try perDocCollapsedWithClasses(classes, idCol, textCol, outId)(f)
    finally classes.unpersist()
  }

  /** [[perDocCollapsed]] over a PREBUILT classes frame (a
    * [[cloneClasses]] result, e.g. parquet-cached per corpus so many
    * collapsed queries share one collapse pass). Caller owns the
    * classes frame's lifecycle; same output contract. */
  private[graft] def perDocCollapsedWithClasses(classes: DataFrame,
      idCol: String, textCol: String, outId: String)(
      f: DataFrame => DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val reps = classes.select(col("rep").as(idCol), col("__text").as(textCol))
    val repOut = f(reps)
    // enforce the documented contract: the expansion join below would
    // silently mis-resolve if f's output reuses the internal class
    // column names, and it needs the id column to join on
    require(repOut.columns.contains(outId),
      s"perDocCollapsed: f's output must carry the id column '$outId' " +
        s"(got ${repOut.columns.mkString(", ")})")
    require(!repOut.columns.contains("rep") && !repOut.columns.contains("members"),
      "perDocCollapsed: f's output must not use the reserved internal " +
        "column names 'rep'/'members'")
    val carried = repOut.columns.filterNot(_ == outId).toSeq
    val out = repOut
      .join(classes.select(col("rep"), col("members")),
        repOut(outId) === col("rep"))
      .select((explode(col("members")).as(outId) +: carried.map(col)): _*)
      .localCheckpoint(true)
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** [[perDocCollapsedWithClasses]] for enrichments that depend on the
    * text AND a small ID-DERIVED TAG (the luhn/iban/mojibake planting
    * pattern: `when(doc_id % m === r, variantA).otherwise(variantB)`).
    * Collapsing on the enriched column works but still pays the
    * enrichment + sha-256 over EVERY row; this combinator instead
    * reuses the prebuilt raw-text classes — no full-text pass at all:
    * members explode to (rep, id, tag), `f` runs once per DISTINCT
    * (class, tag) combination (≤ |tags| rows per class), and results
    * join back on (rep, tag). `f` receives (`outId` = rep id, `__tag`,
    * `textCol`) and must return rows keyed by (outId, `__tag`) whose
    * other columns are pure functions of (text, tag) — identical
    * output to running `f` over the full corpus (OpsSpec-asserted per
    * consumer). Eager; returns the persisted frame (caller
    * unpersists). */
  private[graft] def perDocTaggedCollapsedWithClasses(classes: DataFrame,
      textCol: String, outId: String, tagOf: Column => Column)(
      f: DataFrame => DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val mem = classes.select(col("rep"), explode(col("members")).as(outId))
      .withColumn("__tag", tagOf(col(outId)))
      .persist(lvl)
    val work = mem.select(col("rep"), col("__tag")).distinct()
      .join(classes.select(col("rep"), col("__text")), Seq("rep"))
      .select(col("rep").as(outId), col("__tag"), col("__text").as(textCol))
    val repOut = f(work)
    require(repOut.columns.contains(outId) && repOut.columns.contains("__tag"),
      s"perDocTaggedCollapsed: f's output must carry '$outId' and '__tag' " +
        s"(got ${repOut.columns.mkString(", ")})")
    require(!repOut.columns.contains("rep") && !repOut.columns.contains("members"),
      "perDocTaggedCollapsed: f's output must not use the reserved " +
        "internal column names 'rep'/'members'")
    val carried = repOut.columns
      .filterNot(c => c == outId || c == "__tag").toSeq
    val out = mem
      .join(repOut.withColumnRenamed(outId, "rep"), Seq("rep", "__tag"))
      .select((col(outId) +: carried.map(col)): _*)
      .localCheckpoint(true)
    mem.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** SimHash: 60-bit fingerprint from per-shingle bit votes over the
    * portable 60-bit md5-prefix hash ([[shingleHashSets]]), so the SQL
    * oracle can replay it bit for bit. One wide groupBy (60 small sum
    * aggregates, map-side partial) per doc. */
  def simhash(sh: DataFrame): DataFrame = {
    val h = col("h")
    val bitVotes = (0 until 60).map { b =>
      sum(when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val votes = sh.groupBy("sid").agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 60).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("sid"), fp.as("simhash"))
  }

  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, n: Int,
      maxHammingDistance: Int): DataFrame = {
    val fps = simhash(hashedShingles(df, idCol, textCol, n))
    // block on 4×15-bit chunks: pairs within distance d ≤ 3 share at
    // least one exact 15-bit chunk (pigeonhole) — avoids all-pairs
    val chunks = fps.select(col("sid"), col("simhash"),
      explode(expr("sequence(0, 3)")).as("ci"))
      .withColumn("chunk", expr("shiftright(simhash, ci * 15)").bitwiseAND(lit(0x7FFFL)))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHammingDistance)
      .select("id_a", "id_b", "hamming")
  }

  /** [[simhashNearDups]] with EXACT-DUPLICATE COLLAPSE first —
    * IDENTICAL pair set (OpsSpec-asserted). SimHash is a pure function
    * of the text, so clones carry identical fingerprints: the direct
    * chunk self-join puts every F-clone class in the same 4 chunk
    * buckets and materializes ~4·F²/2 candidate rows per class before
    * the distinct — at 100× replication that is the query's entire
    * cost. Collapsed: fingerprints and the chunk join run on class
    * REPRESENTATIVES; within-class pairs expand directly (hamming 0 —
    * emitted whenever the class has ≥ 1 shingle, i.e. a fingerprint,
    * exactly when the direct path buckets them); cross-class rep pairs
    * expand to member products with the reps' hamming (fingerprints
    * are class constants). Eager; returns the persisted pair frame
    * (no unpersist contract). */
  def simhashNearDupsCollapsed(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxHammingDistance: Int): DataFrame = {
    require(maxHammingDistance >= 0, "maxHammingDistance must be >= 0")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val classes = cloneClasses(df, idCol, textCol).persist(lvl)
    val fps = simhash(hashedShingles(
        classes.select(col("rep"), col("__text")), "rep", "__text", n))
      .persist(lvl) // two consumers (chunk join + sigful gate): one md5 pass
    val chunks = fps.select(col("sid"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("ci"))
      .withColumn("chunk",
        expr("shiftright(simhash, ci * 15)").bitwiseAND(lit(0x7FFFL)))
    val repPairs = chunks.as("a").join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("rep_a"), col("b.sid").as("rep_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHammingDistance)
      .select("rep_a", "rep_b", "hamming")
    // fingerprinted ⇔ ≥ 1 shingle row survives the simhash groupBy
    val sigful = fps.select(col("sid").as("rep"))
    val within = withinClassPairs(classes.join(sigful, Seq("rep"), "left_semi"))
      .withColumn("hamming", lit(0L))
    val cross = expandRepPairs(repPairs, classes, carry = Seq("hamming"))
    val out = within.unionByName(cross).localCheckpoint(true)
    fps.unpersist(); classes.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * All-pairs within `df` — EXACT but quadratic, so it is guarded:
    * inputs larger than `maxExactRows` throw (the guard count is a
    * column-pruned scan of the id column — cheap next to C(N,2) cosine
    * evaluations it prevents). Intended for candidate sets and
    * small-to-mid tables; the corpus-scale path is
    * [[embeddingNearDupsBucketed]].
    *
    * Callers that already know the input is small (e.g. composing over a
    * pre-counted candidate set in a lazy plan) can pass
    * `maxExactRows = Long.MaxValue` to skip the guard scan entirely and
    * keep the call lazy. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxExactRows: Long = 100000L): DataFrame = {
    val n = if (maxExactRows == Long.MaxValue) 0L else df.select(col(idCol)).count()
    require(n <= maxExactRows,
      s"embeddingNearDups is all-pairs (C($n,2) cosine evaluations); " +
        s"input exceeds maxExactRows=$maxExactRows — use embeddingNearDupsBucketed " +
        "(banded sign-LSH candidates + exact verification) or raise the guard explicitly")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= lit(threshold))
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding near-dup pairs at corpus scale: banded sign-LSH candidate
    * generation + exact cosine verification — the same two-phase shape
    * as [[jaccardPairs]], with hyperplane sign bands playing the
    * posting-list role. Never all-pairs.
    *
    *  1. Each vector gets `numPlanes` deterministic hyperplane sign bits
    *     (one fused [[graft.functions.LshBucket]] codegen node), split
    *     into `numPlanes / bandBits` bands of `bandBits` bits. A pair is
    *     a CANDIDATE iff some band's bits match exactly — an equi-join
    *     on (band, key) buckets, Σ C(bucket, 2) pairs, never N².
    *     For cosine ≥ t the per-plane sign-agreement probability is
    *     p = 1 − arccos(t)/π, so candidate recall is
    *     1 − (1 − p^bandBits)^bands: more/narrower bands ⇒ higher
    *     recall + more candidates; wider bands ⇒ the reverse. Defaults
    *     (8 bands × 4 bits) give ~0.75 recall at t = 0.4 and ≥ 0.97 at
    *     t ≥ 0.8 (real near-dup territory).
    *  2. Exact cosine on candidate ids only (two fetch-back equi-joins
    *     on the id — AQE broadcasts the candidate side when small).
    *
    * `maxBucket > 0` skips buckets larger than the cap — at corpus
    * scale a hot band bucket (e.g. a degenerate all-zeros region) is
    * the analogue of a stop-shingle posting list: quadratic cost,
    * near-zero signal. Buckets are a column, so a Parquet layout
    * partitioned by (band, key) turns candidate generation into
    * co-located per-partition joins.
    *
    * Results are a recall-bounded SUBSET of [[embeddingNearDups]] with
    * identical (id_a, id_b, cosine) semantics per emitted pair. */
  def embeddingNearDupsBucketed(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 32, bandBits: Int = 4,
      maxBucket: Int = 0): DataFrame = {
    require(numPlanes > 0 && numPlanes <= 60 && numPlanes % bandBits == 0,
      s"numPlanes ($numPlanes) must be in (0, 60] and divisible by bandBits ($bandBits)")
    val bands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1L
    val vecs = df.select(col(idCol).as("sid"), col(vecCol).as("v"))
    val banded = vecs
      .select(col("sid"),
        graft.ops.SimilaritySearch.lshBucketColumn(col("v"), 0, numPlanes).as("bits"))
      .select(col("sid"), col("bits"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"))
      .select(col("sid"), col("band"),
        expr(s"shiftright(bits, band * $bandBits)").bitwiseAND(lit(mask)).as("key"))
    val pruned =
      if (maxBucket <= 0) banded
      else {
        val hot = banded.groupBy("band", "key").agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") > maxBucket).select("band", "key")
        banded.join(broadcast(hot), Seq("band", "key"), "left_anti")
      }
    val cand = pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .distinct()
    val va = vecs.select(col("sid").as("id_a"), col("v").as("v_a"))
    val vb = vecs.select(col("sid").as("id_b"), col("v").as("v_b"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= lit(threshold))
      .select("id_a", "id_b", "cosine")
  }

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023): k-means the
    * embedding space into k cells, then compare pairs ONLY within a
    * cell and greedily keep the lowest id of every near-dup pair — the
    * clustering bounds the candidate volume to Σ C(cell, 2) instead of
    * C(N, 2), trading cross-cell recall for a ~k× cost cut (a true
    * near-dup pair lands in one cell with high probability because
    * near-identical vectors share a nearest centroid).
    *
    * Returns every input id as (id, cluster, kept): kept = false iff a
    * LOWER-id same-cell neighbor with cosine ≥ threshold exists — the
    * same greedy min-id survivor rule as [[corpusDedup]], deterministic
    * and engine-replayable (the k-means trajectory is exact-snapped,
    * see [[graft.ops.Clustering.kmeans]]).
    *
    * Scale shape: k-means is per-iteration one k·dim broadcast + one
    * partial-agg shuffle; the pair phase is one self-join co-partitioned
    * on the cluster id. `maxCell` fail-fasts if any cell exceeds the
    * cap (quadratic blow-up guard — raise k, not the cap): one cheap
    * grouped count next to the C(cell,2) cosine evaluations it
    * prevents.
    *
    * `shardBits` > 0 switches cell assignment to
    * [[Clustering.kmeansSharded]] — sign-bit LSH shards × fixed-k
    * Lloyd, cluster id = shard·k + per-shard cl. That keeps the
    * assignment n·k (LINEAR) while cell count 2^shardBits·k scales
    * with the corpus; a corpus-scaled single-level k made every Lloyd
    * iteration n²/512 (17.2× per 10× data, measured at sf10).
    * shardBits = 0 is bit-identical to the classic path. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int, threshold: Double,
      maxCell: Long = 100000L, shardBits: Int = 0): DataFrame = {
    val assigned =
      if (shardBits <= 0)
        Clustering.kmeans(vecs, idCol, vecCol, dim, k, iters)
          .select(col(idCol).as("sid"), col("cluster"))
      else
        // the sharded trajectory is fully LAZY (collect-free): without
        // a cut, the maxCell guard + the pair self-join + the final
        // output each re-run the whole window/broadcast-join Lloyd
        // pipeline. The assignment is n narrow rows — an eager
        // localCheckpoint materializes it once (the r11 sf10 run
        // measured the recompute at ~2× the query)
        Clustering.kmeansSharded(vecs, idCol, vecCol, dim, k, iters, shardBits)
          .select(col(idCol).as("sid"),
            (col("shard") * k + col("cluster")).cast("int").as("cluster"))
          .localCheckpoint(true)
    val withVec = assigned.join(
      vecs.select(col(idCol).as("sid"), col(vecCol).as("v")), "sid")
    if (maxCell != Long.MaxValue) {
      val hot = withVec.groupBy("cluster").agg(count(lit(1)).as("n"))
        .filter(col("n") > maxCell).limit(1).collect()
      require(hot.isEmpty,
        s"semanticDedup cell ${hot.head.getInt(0)} has ${hot.head.getLong(1)} vectors " +
          s"(> maxCell=$maxCell): the within-cell pair phase is quadratic per cell — " +
          "raise k so cells shrink, or raise maxCell explicitly")
    }
    // COLLAPSE-FIRST pair phase (the [[jaccardPairsCollapsed]]
    // architecture): identical vectors always share a cell (identical
    // dots ⇒ identical shard and argmin), and cos(v, v) rounds to 1.0,
    // so the pairwise min-id drop rule FACTORS through clone classes:
    //   dropped(x) ⟺ (x ≠ min of its clone class ∧ threshold ≤ 1)
    //              ∨ (∃ neighbor class N in the cell with
    //                 round(cos(rep_N, rep_x), 6) ≥ threshold ∧ rep_N < x)
    // — bit-identical to the member-level self-join (rep vectors ARE
    // the member vectors), but the cosine work is C(distinct-in-cell, 2)
    // instead of C(cell, 2): on a 100×-replicated corpus that is a
    // 10⁴× cut in the quadratic term. On a unique corpus classes ≈
    // rows and this degenerates to the direct plan plus one groupBy.
    val classes = withVec.groupBy(col("cluster"), col("v"))
      .agg(min(col("sid")).as("rep"), collect_list(col("sid")).as("members"))
    val a = classes.select(col("cluster"), col("rep").as("rep_a"), col("v").as("v_a"))
    val b = classes.select(col("cluster"), col("rep").as("rep_b"), col("v").as("v_b"))
    // Round to 6 dp BEFORE thresholding (repo convention — Scoring/BM25/
    // kmeans do the same) so a pair sitting exactly at the threshold
    // cannot flip kept/dropped on a last-ulp accumulation difference
    // vs the DuckDB oracle's list_cosine_similarity.
    val neighborMin = a.join(b, Seq("cluster"))
      .filter(col("rep_a") =!= col("rep_b"))
      .filter(round(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")), 6) >= lit(threshold))
      .groupBy(col("rep_b").as("rep")).agg(min(col("rep_a")).as("__nmin"))
    val cloneDrops = 1.0 >= threshold // cos(v, v) = 1.0 ≥ t ⇒ non-rep members drop
    classes.join(neighborMin, Seq("rep"), "left")
      .select(col("cluster"), col("rep"), col("__nmin"),
        explode(col("members")).as("__m"))
      .select(col("__m").as(idCol), col("cluster"),
        ((col("__m") === col("rep") || lit(!cloneDrops)) &&
          (col("__nmin").isNull || col("__m") < col("__nmin"))).as("kept"))
  }

  /** The full dedup ladder as one corpus pass, in the measured-correct
    * order (BASELINE.md "Dedup family at 10x corpus"): exact dedup
    * FIRST (collapses replica groups — posting-pair generation is
    * quadratic in group size), then exact-Jaccard near-dup on the
    * survivors with the posting-list cap sized as a FRACTION of the
    * surviving corpus (a fixed cap loses recall as the corpus grows).
    * Of each near-dup pair the lower id survives; a doc is dropped if
    * ANY lower-id near-dup exists (greedy, deterministic — for
    * transitive A≈B≈C clustering see [[dedupClusters]]). Returns the
    * surviving rows as a persisted, materialized frame — every
    * intermediate cache (survivors, pairs) is released before
    * returning; the CALLER owns the returned frame's `unpersist()`. */
  /** Distinct word n-gram hashes per doc: (sid, gh) rows, gh = the
    * portable 60-bit md5-prefix hash of the space-joined n-gram —
    * replayable in SQL as `CAST('0x'||substring(md5(g),1,15) AS
    * BIGINT)`. Pure built-ins (split / slice / concat_ws / md5 / conv),
    * fully codegen — no UDF. Docs with fewer than n words emit no
    * grams (the GPT-3 decontamination convention). */
  def wordGramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col("sid"), explode(expr(
        s"transform(sequence(1, size(words) - ${n - 1}), i -> concat_ws(' ', slice(words, i, $n)))"))
        .as("gram"))
      .select(col("sid"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gh"))
      .distinct()

  /** Benchmark decontamination: flag corpus docs sharing ≥ `minOverlap`
    * exact word n-grams with an evaluation/benchmark set — the standard
    * train-set hygiene pass (GPT-3 used 13-gram overlap; smaller n is
    * stricter). Returns (sid, n_contaminated_grams) for flagged docs.
    *
    * Scale shape: the benchmark side is the SMALL side by construction
    * (eval sets are thousands of docs, the corpus is the 100 TB side) —
    * its distinct gram-hash set is broadcast when it fits under
    * `broadcastBytesCap` (measured with one count), else the overlap
    * join falls back to a hash shuffle on the 8-byte gram key. The
    * corpus side stays a single map-side explode → semi-join →
    * per-doc count: no corpus self-join anywhere. */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minOverlap: Long = 1,
      broadcastBytesCap: Long = 128L << 20): DataFrame = {
    val benchGrams = wordGramHashes(benchmark, benchId, benchText, n)
      .select(col("gh")).distinct()
    val corpusGrams = wordGramHashes(corpus, corpusId, corpusText, n)
    val nBench = benchGrams.count()
    val benchSide = if (nBench * 24L < broadcastBytesCap) broadcast(benchGrams) else benchGrams
    corpusGrams.join(benchSide, Seq("gh"), "left_semi")
      .groupBy("sid").agg(count(lit(1)).as("n_contaminated_grams"))
      .filter(col("n_contaminated_grams") >= minOverlap)
  }

  /** Per-document contamination FRACTION against a benchmark set —
    * [[decontaminate]]'s graded counterpart: instead of flagging docs
    * over a hard overlap count, report every corpus doc's distinct-gram
    * total, contaminated count (0 included), and their exact ratio, so
    * the pipeline can threshold or stratify on severity (the
    * "contamination budget" view of train-set hygiene).
    *
    * Scale shape: identical to [[decontaminate]] — benchmark gram set
    * broadcast under the cap, corpus side one map-side explode — except
    * the membership check is a broadcast LEFT join against the distinct
    * benchmark grams (no row multiplication) so hit and total counts
    * come out of ONE per-doc aggregation; docs with < n words emit no
    * grams and are absent, same convention both sides. The ratio is an
    * exact integer division rounded to 6 dp. */
  def decontaminateOverlap(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 8, broadcastBytesCap: Long = 128L << 20): DataFrame = {
    val benchGrams = wordGramHashes(benchmark, benchId, benchText, n)
      .select(col("gh")).distinct()
      .withColumn("__hit", lit(1L))
    val corpusGrams = wordGramHashes(corpus, corpusId, corpusText, n)
    val nBench = benchGrams.count()
    val benchSide = if (nBench * 24L < broadcastBytesCap) broadcast(benchGrams) else benchGrams
    corpusGrams.join(benchSide, Seq("gh"), "left")
      .groupBy("sid")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("overlap_frac",
        round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** Positional word n-gram hashes: (sid, pos, gh) with 1-based word
    * positions — [[wordGramHashes]] keeping position and every
    * occurrence (span detection needs both; dedup-by-membership
    * doesn't). Same md5-60-bit gram key convention. */
  def positionalWordGramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col("sid"), posexplode(expr(
        s"transform(sequence(1, size(words) - ${n - 1}), i -> concat_ws(' ', slice(words, i, $n)))")))
      .select(col("sid"), (col("pos") + 1).as("pos"),
        conv(substring(md5(col("col")), 1, 15), 16, 10).cast("long").as("gh"))

  /** Duplicated-substring REPORT (the exact-substring pass of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §4.1 — re-expressed as bounded relational ops
    * instead of a suffix array): every maximal word span whose every
    * length-`n` word gram occurs in ≥ 2 distinct docs. Consecutive
    * duplicated gram positions merge into one span (the island trick:
    * pos − row_number() is constant on a run), so the output is
    * (sid, span_start, span_end, span_words) with 1-based inclusive
    * word indices.
    *
    * Scale shape: one (sid,gh)-distinct + per-gram doc-count aggregate
    * (never posting LISTS — no df cap needed, a gram only carries a
    * count), one semi join back to positions, one per-doc window.
    * Shuffle volume is O(total words); the window partitions by doc so
    * its sort is bounded by document length, never corpus size. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    duplicatedSpansFromGrams(positionalWordGramHashes(df, idCol, textCol, n), n)

  /** [[duplicatedSpans]] over a PRECOMPUTED positional gram frame
    * ((sid, pos, gh) as produced by [[positionalWordGramHashes]]) —
    * the span family shares one expensive gram scan when several
    * passes run over the same corpus (report + removal + audit), so a
    * pipeline materializes the grams once and feeds each consumer. */
  def duplicatedSpansFromGrams(grams: DataFrame, n: Int,
      maxDocFreq: Long = 0L): DataFrame = {
    // maxDocFreq > 0 EXCLUDES grams occurring in more than that many
    // distinct docs from span detection — the boilerplate cap (the
    // [[jaccardPairs]] posting-list idiom): a gram in thousands of
    // docs is background text (headers, licenses), and its positions
    // would otherwise dominate the dupPos shuffle corpus-wide. Spans
    // made ONLY of such grams are not reported; 0 disables (exact).
    val dupGrams = grams.select("sid", "gh").distinct()
      .groupBy("gh").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2 &&
        (if (maxDocFreq > 0) col("__nd") <= maxDocFreq else lit(true)))
      .select("gh")
    val dupPos = grams.join(dupGrams, Seq("gh"), "left_semi")
      .select("sid", "pos").distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sid").orderBy("pos")
    dupPos.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("sid"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .select(col("sid"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"))
  }

  /** [[duplicatedSpansFromGrams]] with EXACT-DUPLICATE COLLAPSE
    * (identical rows, OpsSpec-asserted): a gram's distinct-doc count
    * is the weighted sum over classes containing it (every clone of a
    * containing text contains it), and a doc's spans are a pure
    * function of its text given the duplicated-gram set — so the
    * positional scan, the distinct, and the island window all run at
    * rep scale and the spans fan out to clone members. `repGrams`
    * must be [[positionalWordGramHashes]] over the class
    * representatives (sid = rep). */
  def duplicatedSpansFromGramsCollapsed(repGrams: DataFrame,
      classes: DataFrame, n: Int, maxDocFreq: Long = 0L): DataFrame = {
    val weights = classes.select(col("rep").as("sid"), col("w"))
    val dupGrams = repGrams.select("sid", "gh").distinct()
      .join(weights, "sid")
      .groupBy("gh").agg(sum(col("w")).as("__nd"))
      .filter(col("__nd") >= 2 &&
        (if (maxDocFreq > 0) col("__nd") <= maxDocFreq else lit(true)))
      .select("gh")
    val dupPos = repGrams.join(dupGrams, Seq("gh"), "left_semi")
      .select("sid", "pos").distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sid").orderBy("pos")
    dupPos.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("sid"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .join(classes.select(col("rep").as("sid"), col("members")), "sid")
      .select(explode(col("members")).as("sid"),
        col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"))
  }

  /** SURGICAL span-level decontamination — the cross-set form of
    * [[duplicatedSpans]]: for each corpus document, the maximal word
    * spans covered by word n-grams that ALSO occur in the benchmark
    * set. Where doc-level decontamination ([[decontaminate]]) drops a
    * whole training document for one leaked sentence, this localizes
    * WHICH words are benchmark text so the caller can excise the span
    * and keep the rest — the surgical variant of the GPT-3 appendix-C
    * pass. Island merge: CONSECUTIVE contaminated gram start
    * positions fuse into one span covering [first, last + n − 1]; any
    * start-position gap opens a new span (the [[duplicatedSpans]]
    * island rule, replayed verbatim by the oracle).
    *
    * Scale shape: bench grams are corpus-tiny → broadcast semi-join
    * onto the corpus's positional gram scan; one per-doc window over
    * CONTAMINATED positions only (bounded by actual leakage, not doc
    * length); no corpus-sized shuffle beyond the positional scan's
    * distinct. */
  def decontaminateSpans(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 5, broadcastBytesCap: Long = 128L << 20): DataFrame =
    decontaminateSpansFromGrams(
      positionalWordGramHashes(corpus, corpusId, corpusText, n),
      benchmark, benchId, benchText, n, broadcastBytesCap)

  /** [[decontaminateSpans]] over a precomputed CORPUS positional gram
    * frame (positional grams are row-local, so a slice predicate on
    * the corpus commutes to a `sid` filter on a shared gram table —
    * see [[duplicatedSpansFromGrams]]). */
  def decontaminateSpansFromGrams(corpusGrams: DataFrame,
      benchmark: DataFrame, benchId: String, benchText: String,
      n: Int = 5, broadcastBytesCap: Long = 128L << 20): DataFrame = {
    val benchGrams = wordGramHashes(benchmark, benchId, benchText, n)
      .select(col("gh")).distinct()
    val nBench = benchGrams.count()
    val benchSide = if (nBench * 24L < broadcastBytesCap) broadcast(benchGrams) else benchGrams
    val hitPos = corpusGrams
      .join(benchSide, Seq("gh"), "left_semi")
      .select("sid", "pos").distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sid").orderBy("pos")
    hitPos.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("sid"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .select(col("sid"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"))
  }

  /** [[decontaminateSpansFromGrams]] with EXACT-DUPLICATE COLLAPSE
    * (identical rows): contaminated spans are a pure function of the
    * text given the benchmark gram set, so the hit scan and island
    * window run at rep scale and fan out to members. */
  def decontaminateSpansFromGramsCollapsed(repGrams: DataFrame,
      classes: DataFrame, benchmark: DataFrame, benchId: String,
      benchText: String, n: Int = 5,
      broadcastBytesCap: Long = 128L << 20): DataFrame = {
    val benchGrams = wordGramHashes(benchmark, benchId, benchText, n)
      .select(col("gh")).distinct()
    val nBench = benchGrams.count()
    val benchSide = if (nBench * 24L < broadcastBytesCap) broadcast(benchGrams) else benchGrams
    val hitPos = repGrams
      .join(benchSide, Seq("gh"), "left_semi")
      .select("sid", "pos").distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sid").orderBy("pos")
    hitPos.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("sid"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .join(classes.select(col("rep").as("sid"), col("members")), "sid")
      .select(explode(col("members")).as("sid"),
        col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"))
  }

  /** Duplicated-substring REMOVAL — [[duplicatedSpans]]' rewrite
    * counterpart, keeping ONE canonical occurrence corpus-wide: each
    * duplicated gram's keeper is its minimum doc id; a word is dropped
    * iff covered by a duplicated gram whose keeper is another doc.
    * Keeper docs keep their text verbatim (modulo whitespace
    * normalization — the rebuild joins words with single spaces, same
    * convention both sides of the oracle); every doc row survives, a
    * fully-duplicated non-keeper comes back with empty text. Returns
    * (sid, cleaned_text, n_kept, n_dropped).
    *
    * Scale shape: per-gram (min, distinct-count) aggregate — counts and
    * mins, never lists — then one explode of DROPPED positions only
    * (bounded by actual duplication, not corpus size), an anti join on
    * (doc, position), and a per-doc sorted-struct rebuild identical to
    * the one [[graft.search.VectorSearch.ragPrompt]] uses. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    removeDuplicatedSpansFromGrams(df, idCol, textCol,
      positionalWordGramHashes(df, idCol, textCol, n), n)

  /** [[removeDuplicatedSpans]] over a precomputed positional gram
    * frame (must be the grams of exactly `df` — see
    * [[duplicatedSpansFromGrams]]). */
  def removeDuplicatedSpansFromGrams(df: DataFrame, idCol: String,
      textCol: String, grams: DataFrame, n: Int,
      maxDocFreq: Long = 0L): DataFrame = {
    // maxDocFreq: same boilerplate cap as [[duplicatedSpansFromGrams]]
    // — grams in more than that many distinct docs are background, not
    // duplication, and are left in place everywhere (no keeper; their
    // position explode would otherwise scale with corpus-wide
    // occurrences of the hottest gram). 0 disables (exact removal).
    val keepers = grams.groupBy("gh")
      .agg(min("sid").as("__keeper"), countDistinct("sid").as("__nd"))
      .filter(col("__nd") >= 2 &&
        (if (maxDocFreq > 0) col("__nd") <= maxDocFreq else lit(true)))
      .select("gh", "__keeper")
    val drops = grams.join(keepers, Seq("gh"))
      .filter(col("sid") =!= col("__keeper"))
      .select(col("sid"), explode(expr(s"sequence(pos, pos + ${n - 1})")).as("wpos"))
      .distinct()
    val words = df.select(col(idCol).as("sid"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .select(col("sid"), posexplode(col("words")))
      .select(col("sid"), (col("pos") + 1).as("wpos"), col("col").as("word"))
    val kept = words.join(drops, Seq("sid", "wpos"), "left_anti")
      .groupBy("sid")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("wpos"), col("word")))),
          x => x.getField("word")), " ").as("cleaned_text"))
    df.select(col(idCol).as("sid"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("__total"))
      .join(kept, Seq("sid"), "left")
      .select(col("sid"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** [[removeDuplicatedSpansFromGrams]] with EXACT-DUPLICATE COLLAPSE
    * (identical rows, OpsSpec-asserted). The keeper rule (a
    * duplicated gram's words survive only in the minimum containing
    * doc id) is NOT content-determined — but it factors through
    * classes into exactly TWO variants:
    *
    *  - a gram's keeper is the min containing doc = the min `rep`
    *    over containing classes (clones contain identical gram sets
    *    and `rep` is the class minimum);
    *  - a NON-REP member is never any gram's keeper (its rep contains
    *    the same gram with a smaller id), so it drops EVERY
    *    duplicated-gram position of its text;
    *  - the REP drops positions of grams whose keeper is a smaller
    *    rep.
    *
    * So each class rebuilds at most two cleaned texts (rep variant +
    * member variant, the latter only when w ≥ 2), and the per-doc
    * output copies the right variant to each member — text rebuild
    * cost is per distinct text, not per clone. */
  def removeDuplicatedSpansFromGramsCollapsed(classes: DataFrame,
      repGrams: DataFrame, n: Int, maxDocFreq: Long = 0L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val weights = classes.select(col("rep").as("sid"), col("w"))
    val keepers = repGrams.select("sid", "gh").distinct()
      .join(weights, "sid")
      .groupBy("gh")
      .agg(min(col("sid")).as("__keeper"), sum(col("w")).as("__nd"))
      .filter(col("__nd") >= 2 &&
        (if (maxDocFreq > 0) col("__nd") <= maxDocFreq else lit(true)))
      .select("gh", "__keeper")
    val gk = repGrams.join(keepers, Seq("gh")).persist(lvl)
    // rep variant ("r"): drop grams kept by a SMALLER rep; member
    // variant ("m"): drop all duplicated-gram positions
    val drops = gk.filter(col("__keeper") =!= col("sid"))
      .select(col("sid"), lit("r").as("__v"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("wpos"))
      .unionByName(gk.select(col("sid"), lit("m").as("__v"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("wpos")))
      .distinct()
    val variants = classes.select(col("rep").as("sid"), col("__text"),
      explode(when(col("w") > 1, array(lit("r"), lit("m")))
        .otherwise(array(lit("r")))).as("__v"))
    val words = variants
      .select(col("sid"), col("__v"),
        posexplode(split(trim(col("__text")), "\\s+")))
      .select(col("sid"), col("__v"), (col("pos") + 1).as("wpos"),
        col("col").as("word"))
    val kept = words.join(drops, Seq("sid", "__v", "wpos"), "left_anti")
      .groupBy("sid", "__v")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("wpos"), col("word")))),
          x => x.getField("word")), " ").as("cleaned_text"))
    val perVariant = variants
      .select(col("sid"), col("__v"),
        size(split(trim(col("__text")), "\\s+")).cast("long").as("__total"))
      .join(kept, Seq("sid", "__v"), "left")
      .select(col("sid").as("rep"), col("__v"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
    val cm = classes.select(col("rep"), col("members"))
    val repRows = perVariant.filter(col("__v") === "r").join(cm, "rep")
      .select(col("rep").as("sid"), col("cleaned_text"),
        col("n_kept"), col("n_dropped"))
    val memberRows = perVariant.filter(col("__v") === "m").join(cm, "rep")
      .select(explode(expr("filter(members, x -> x != rep)")).as("sid"),
        col("cleaned_text"), col("n_kept"), col("n_dropped"))
    val out = repRows.unionByName(memberRows).localCheckpoint(true)
    gk.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks (see q11)
  }

  /** Transitive near-dup clustering: connected components over an
    * undirected pair graph ((id_a, id_b) rows — e.g. [[jaccardPairs]] /
    * [[minhashLshCandidates]] / [[simhashNearDups]] output), so a chain
    * A≈B≈C collapses to ONE cluster even when (A, C) is not itself a
    * pair. Returns (sid, cluster) for every doc that appears in ≥1 pair;
    * `cluster` = the minimum doc id reachable in the component (the
    * deterministic representative — docs with no near-dup pair are
    * implicitly their own singleton cluster and are not emitted).
    *
    * Two execution paths behind one semantics (cluster = component min):
    *
    *  - **Small graphs** (≤ `maxLocalPairs`, measured by a count of the
    *    pair frame): collect the pairs and run driver-side union-find —
    *    O(E α(E)) and microseconds. A near-dup pair set is corpus-tiny
    *    by construction (it IS the duplication found), so this is the
    *    common path even on large corpora; 4M pairs ≈ 64 MB on the
    *    driver. The distributed loop below costs ~2-3 s of fixed
    *    job/codegen overhead PER ROUND regardless of size — pure waste
    *    under a few million rows.
    *  - **Large graphs**: iterative min-label propagation — each round
    *    every node adopts the min of its own and its neighbors' labels
    *    (one equi-join + one groupBy per round, both on the pair-graph
    *    rows only, never the corpus). Converges in graph-diameter
    *    rounds; near-dup components are small and dense, so 2-4 rounds
    *    in practice. Labels are persisted per round and the previous
    *    round released, so lineage stays flat at any iteration count. A
    *    component with diameter > `maxIters` throws rather than
    *    returning silently-unconverged clusters (at that shape the
    *    input is not a near-dup graph — raise `maxIters` deliberately
    *    if so; the local path always converges).
    *
    * Eager, like the pair generators: runs at call time and returns the
    * final localCheckpoint-backed (sid, cluster) frame (no unpersist contract). */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 50,
      maxLocalPairs: Long = 4000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val prj = pairs.select(col("id_a"), col("id_b"))
    if (maxLocalPairs > 0 && prj.count() <= maxLocalPairs) {
      // Generic-key union-find: the local path accepts the SAME input
      // domain as the distributed loop (ids of any orderable type, not
      // just numerics), and "union toward the smaller root" uses the
      // ordering Spark's min() applies in that loop — so the two paths
      // stay swappable via `maxLocalPairs` as documented.
      import org.apache.spark.sql.types._
      val idType = prj.schema("id_a").dataType
      val ord: Ordering[Any] = idType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Ordering.by((v: Any) => v.asInstanceOf[java.lang.Number].longValue())
        case FloatType | DoubleType =>
          Ordering.by((v: Any) => v.asInstanceOf[java.lang.Number].doubleValue())
        case _: DecimalType =>
          Ordering.by((v: Any) => scala.math.BigDecimal(v.asInstanceOf[java.math.BigDecimal]))
        case StringType => Ordering.by((v: Any) => v.asInstanceOf[String])
        case dt => throw new IllegalArgumentException(
          s"dedupClusters: unsupported id type $dt (integral, float, decimal, or string)")
      }
      val edgeArr = prj.collect().map(r => (r.get(0), r.get(1)))
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      edgeArr.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        // union toward the smaller root: the final root IS the min id
        val cmp = ord.compare(ra, rb)
        if (cmp < 0) parent.put(rb, ra) else if (cmp > 0) parent.put(ra, rb)
      }
      val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size)
      parent.keySet.forEach(sid => rows += org.apache.spark.sql.Row(sid, find(sid)))
      val sp = pairs.sparkSession
      val schema = StructType(Seq(
        StructField("sid", idType), StructField("cluster", idType)))
      return sp.createDataFrame(sp.sparkContext.parallelize(rows.toSeq, 1), schema)
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(lvl)
    var labels = edges.select(col("src").as("sid")).distinct()
      .withColumn("cluster", col("sid"))
      .persist(lvl)
    var handle = labels // the persisted frame backing `labels`
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // One aggregation yields both the new label (min over self +
      // neighbors) and the previous label (the own=1 row), so the
      // convergence check rides the same job that materializes the
      // round — no separate changed-count join. The loop re-executes a
      // structurally identical plan each round over persisted inputs,
      // so codegen is compiled once and lineage stays one round deep.
      val prop = edges.join(labels, edges("src") === labels("sid"))
        .select(col("dst").as("sid"), col("cluster"), lit(0).as("own"))
      val next = labels.withColumn("own", lit(1)).unionByName(prop)
        .groupBy("sid")
        .agg(min(col("cluster")).as("cluster"),
          min(when(col("own") === 1, col("cluster"))).as("prev"))
        .persist(lvl)
      changed = next.filter(col("cluster") < col("prev")).count()
      handle.unpersist()
      handle = next
      labels = next.drop("prev") // reads the cached aggregate via plan match
      iter += 1
    }
    edges.unpersist()
    if (changed > 0) {
      handle.unpersist()
      throw new IllegalStateException(
        s"dedupClusters did not converge in $maxIters rounds — the pair graph has a " +
          s"component of diameter > $maxIters, which no near-dup process produces; " +
          "raise maxIters explicitly if this topology is intended")
    }
    // re-root the (sid, cluster) projection via eager localCheckpoint:
    // lineage to the iteration caches is truncated, so the final
    // round's cache can be dropped here and the blocks behind the
    // returned frame are reclaimed by the ContextCleaner when it is
    // garbage-collected — no unpersist contract on the caller
    val result = labels.localCheckpoint(true)
    handle.unpersist()
    result // eager localCheckpoint: ContextCleaner reclaims the blocks
  }

  /** Connected-component clustering from the COLLAPSED pair graph (the
    * [[jaccardPairsCollapsed]] `sideDir` products) — identical
    * (sid, cluster) rows to `dedupClusters(expanded pairs)`
    * (OpsSpec-asserted), at distinct-corpus cost.
    *
    * Why exact: a clone class is a clique in the expanded graph, so
    * its members belong to exactly the component their representative
    * belongs to; and the min-id cluster label factors through classes
    * because each rep IS its class minimum (so the component minimum
    * over members equals the minimum over reps, which is what
    * propagation over the rep graph computes). Membership in the
    * graph matches the direct path too: a member appears iff its
    * class emitted within-clique pairs (`withinReps`) or sits in a
    * verified rep pair. On the 100×-replicated sf10 corpus the
    * expanded graph (~25M clique edges) forced the distributed
    * propagation loop (219 s); the rep graph is thousands of edges —
    * driver union-find territory. */
  def dedupClustersFromCollapsed(classes: DataFrame, repPairs: DataFrame,
      withinReps: DataFrame, maxIters: Int = 50,
      maxLocalPairs: Long = 4000000L): DataFrame = {
    val repEdges = repPairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b"))
    val repClusters = dedupClusters(repEdges, maxIters, maxLocalPairs)
    val inGraph = repEdges.select(col("id_a").as("rep"))
      .unionByName(repEdges.select(col("id_b").as("rep")))
      .unionByName(withinReps.select(col("rep")))
      .distinct()
    val out = classes.join(inGraph, Seq("rep"), "left_semi")
      // no broadcast hint: rep-graph nodes are distinct-corpus-sized on
      // a unique corpus — AQE broadcasts when the runtime stats allow
      .join(repClusters.withColumnRenamed("sid", "rep"), Seq("rep"), "left")
      .select(explode(col("members")).as("sid"),
        coalesce(col("cluster"), col("rep")).as("cluster"))
      .localCheckpoint(true)
    repClusters.unpersist()
    out // eager localCheckpoint: ContextCleaner reclaims the blocks
  }

  /** [[dedupCorpus]] with TRANSITIVE collapse: near-dup pairs are
    * clustered into connected components ([[dedupClusters]]) and only
    * each component's minimum id survives. Differs from the greedy
    * pair-drop when docs share a near-dup without being pairs
    * themselves — e.g. pairs (1,5),(2,5): greedy keeps {1,2}, the
    * transitive form collapses the whole component to {1}. Same
    * eager/persist contract as [[dedupCorpus]]. */
  def dedupCorpusTransitive(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, threshold: Double = 0.8, maxDocFreqFraction: Double = 0.013,
      minShared: Int = 2): DataFrame = {
    val survivors = exact(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = math.max(
      math.floor(survivors.count() * maxDocFreqFraction).toInt, 16)
    val pairs = jaccardPairs(survivors, idCol, textCol, n, threshold, cap, minShared)
    val clusters = dedupClusters(pairs)
    val drop = broadcast(
      clusters.filter(col("sid") =!= col("cluster")).select(col("sid").as(idCol)))
    val result = survivors.join(drop, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    clusters.unpersist()
    pairs.unpersist()
    survivors.unpersist()
    result // eager localCheckpoint: ContextCleaner reclaims the blocks
  }

  def dedupCorpus(df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      threshold: Double = 0.8, maxDocFreqFraction: Double = 0.013,
      minShared: Int = 2): DataFrame = {
    // survivors feed THREE consumers (the cap count, the jaccard pass,
    // the final anti-join) — persist so the exact-dedup window runs
    // once, spilling to disk if the surviving corpus outgrows memory.
    // (At 100 TB a staging parquet write is the equivalent durable
    // form.) The cache stays alive for the returned lazy plan; it is
    // evictable and the cap count below materializes it.
    val survivors = exact(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = math.max(
      math.floor(survivors.count() * maxDocFreqFraction).toInt, 16)
    // jaccardPairs is eager and returns a persisted (small) pair frame
    val pairs = jaccardPairs(survivors, idCol, textCol, n, threshold, cap, minShared)
    // near-dup ids are a small fraction of the corpus by construction —
    // broadcast the drop list so the anti-join is map-side (the static
    // planner can't estimate the UDF-derived pair count and would pick
    // a sort-merge join)
    val drop = broadcast(pairs.select(col("id_b").as(idCol)).distinct())
    val result = survivors.join(drop, Seq(idCol), "left_anti")
      .localCheckpoint(true) // eager: upstream caches can be released
    pairs.unpersist()
    survivors.unpersist()
    result // eager localCheckpoint — ContextCleaner reclaims the blocks
           // (at 100 TB: write to a staging parquet instead)
  }
}
