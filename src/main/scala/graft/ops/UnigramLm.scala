package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
  * "Subword Regularization", §3 — the Viterbi hard-EM variant),
  * completing the repo's tokenizer family: BPE
  * ([[TextAnalytics.bpeTrain]]) learns merges bottom-up, WordPiece
  * ([[graft.embed.WordPieceTokenizer]]) applies a fixed vocab, the
  * unigram LM starts from a LARGE seed vocabulary and prunes it under
  * a probabilistic model.
  *
  * Spark shape (the kmeans/bpeTrain discipline — heavy passes
  * distributed, model driver-small):
  *
  *  - **Seed** (the scale-dominant pass): the corpus ALPHABET plus the
  *    top `seedSize` multi-char substrings (length ≤ `maxTokenLen`) by
  *    frequency-weighted occurrence over the DISTINCT-WORD table —
  *    substring explosion is Σ len·maxTokenLen per distinct word, one
  *    partial-agg rollup, TakeOrdered; oracle-gated (`unigram_seed`).
  *  - **EM rounds** (`iters`): E-step Viterbi-segments every distinct
  *    word under the broadcast vocab (DP O(len·maxTokenLen) per word,
  *    inside mapPartitions — no per-token shuffle), emitting
  *    cnt-weighted token counts through ONE partial-agg exchange per
  *    round; M-step keeps alphabet ∪ top (vocabSize − |alphabet|)
  *    tokens by (count desc, token asc) and re-derives integer
  *    MICRO-log-probs (round(ln(cnt/total)·1e6)) — integer scores make
  *    every round bit-deterministic across partitionings and
  *    re-runs.
  *
  * Viterbi tie-break (deterministic by construction): higher score
  * wins; equal scores prefer the LONGER last token (repeatedly, this
  * pins a unique segmentation because two candidates at one position
  * with the same last-token length are the same token).
  */
object UnigramLm {

  /** Distinct words with total corpus occurrence counts. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("cnt"))

  /** Corpus alphabet with frequency-weighted counts, derived
    * DISTRIBUTED from the distinct-word table (`__w`, `cnt`): chars
    * explode executor-side, one partial-agg groupBy rolls them up, and
    * only the alphabet-sized result reaches the driver — the
    * distinct-word table itself (Heaps-law huge at crawl scale) never
    * does. Char granularity is the JVM UTF-16 code unit, matching
    * [[viterbi]]'s `substring` indexing. Sorted (count desc, char asc)
    * for a deterministic vocab order. */
  private[graft] def alphabetCounts(words: DataFrame): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.as[(String, Long)]
      .flatMap { case (w, c) => w.map(ch => (ch.toString, c)) }
      .toDF("ch", "c")
      .groupBy("ch").agg(sum("c").as("cnt"))
      .as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.toSeq
  }

  /** Seed candidates from a WEIGHTED distinct-word table
    * (`__w`, `cnt`): every (position, 2 ≤ length ≤ maxTokenLen)
    * substring, weighted by the word's corpus count. */
  private def seedCountsFromWords(words: DataFrame, maxTokenLen: Int): DataFrame = {
    require(maxTokenLen >= 2, "maxTokenLen must be >= 2")
    val subs = expr(
      s"""flatten(transform(sequence(1, length(__w)), i ->
         |  CASE WHEN length(__w) - i + 1 >= 2 THEN
         |    transform(sequence(2, least($maxTokenLen, length(__w) - i + 1)),
         |      l -> substring(__w, i, l))
         |  ELSE array() END))""".stripMargin)
    words
      .select(explode(subs).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("n_occ"))
  }

  /** Seed-stage candidate counts over raw text: every (position,
    * length ≤ maxTokenLen, length ≥ 2) substring of every distinct
    * word, weighted by the word's corpus count. */
  def seedCounts(df: DataFrame, textCol: String, maxTokenLen: Int): DataFrame =
    seedCountsFromWords(wordCounts(df, textCol), maxTokenLen)

  /** The oracle-gated seed stage: top `seedSize` multi-char substrings
    * by (weighted count desc, token asc). */
  def seedVocab(df: DataFrame, textCol: String, seedSize: Int,
      maxTokenLen: Int): DataFrame =
    seedCounts(df, textCol, maxTokenLen)
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(seedSize)

  /** Viterbi segmentation of one word under integer micro-log-prob
    * scores; ties prefer the longer last token at every DP cell. */
  private[graft] def viterbi(word: String, scores: Map[String, Long],
      maxTokenLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Long.MinValue)
    val bestLen = Array.fill(n + 1)(0)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(maxTokenLen, i)
      while (l <= maxL) {
        val j = i - l
        if (best(j) != Long.MinValue) {
          scores.get(word.substring(j, i)) match {
            case Some(sc) =>
              val cand = best(j) + sc
              if (cand > best(i) || (cand == best(i) && l > bestLen(i))) {
                best(i) = cand
                bestLen(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    require(best(n) != Long.MinValue,
      s"unsegmentable word '$word' — vocab must contain the alphabet")
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = bestLen(p)
      out.prepend(word.substring(p - l, p))
      p -= l
    }
    out.toSeq
  }

  /** Floor score for zero-count tokens (unused alphabet chars must
    * stay segmentable but never beat a modeled token; a raw ln(0) =
    * −∞ would overflow the integer DP). */
  private[ops] val FloorMicro = -30000000L

  /** Integer micro-log-probs from counts: round(ln(cnt/total)·1e6),
    * half away from zero (all values negative → the ceil(x − 0.5)
    * branch) — one convention, applied identically every round;
    * zero-count tokens get [[FloorMicro]]. */
  private def microLogProbs(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = math.max(1L, counts.map(_._2).sum).toDouble
    counts.map { case (t, c) =>
      t -> (if (c <= 0) FloorMicro
      else {
        val m = math.log(c / total) * 1e6 // always <= 0
        if (m >= 0) math.floor(m + 0.5).toLong else math.ceil(m - 0.5).toLong
      })
    }.toMap
  }

  /** Full training: returns the final vocabulary as
    * (token, n_occ, logp_micro, is_char) — n_occ from the LAST Viterbi
    * E-step (alphabet tokens unused by any best segmentation keep
    * count 0 and the floor score). */
  def train(df: DataFrame, textCol: String, vocabSize: Int, iters: Int,
      seedSize: Int = 512, maxTokenLen: Int = 6): DataFrame = {
    require(vocabSize >= 1 && iters >= 0, "vocabSize and iters must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordCounts(df, textCol)
      .as[(String, Long)].persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val alphabet: Seq[(String, Long)] = alphabetCounts(words.toDF("__w", "cnt"))
    val seed: Seq[(String, Long)] =
      seedCountsFromWords(words.toDF("__w", "cnt"), maxTokenLen)
        .orderBy(col("n_occ").desc, col("token").asc)
        .limit(seedSize)
        .as[(String, Long)].collect().toSeq
    var vocab: Seq[(String, Long)] = alphabet ++ seed
    // One Viterbi E-step: cnt-weighted token counts of every distinct
    // word's best segmentation under the given vocab scores.
    def estep(v: Seq[(String, Long)]): Seq[(String, Long)] = {
      val bScores = spark.sparkContext.broadcast(microLogProbs(v))
      val counted = words.mapPartitions { it =>
        val sc = bScores.value
        val acc = new java.util.HashMap[String, Long]()
        it.foreach { case (w, c) =>
          viterbi(w, sc, maxTokenLen).foreach { t =>
            acc.put(t, acc.getOrDefault(t, 0L) + c)
          }
        }
        acc.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
      }.toDF("token", "c").groupBy("token").agg(sum("c").as("n_occ"))
        .as[(String, Long)].collect().toSeq
      bScores.destroy()
      counted
    }
    val alphaSet = alphabet.map(_._1).toSet
    var round = 0
    var done = false
    while (round < iters && !done) {
      val counted = estep(vocab)
      val countMap = counted.toMap
      val keepMulti = counted.filter(t => !alphaSet.contains(t._1))
        .sortBy { case (t, c) => (-c, t) }
        .take(math.max(0, vocabSize - alphaSet.size))
      val next = alphabet.map { case (ch, _) => ch -> countMap.getOrElse(ch, 0L) } ++ keepMulti
      // EM converged when the kept token set stops changing
      done = next.map(_._1).toSet == vocab.map(_._1).toSet &&
        next.toMap == vocab.toMap
      vocab = next
      round += 1
    }
    // Refresh counts under the FINAL vocab (the pruning E-step above
    // counted under the previous round's vocab): the shipped counts are
    // then a partition of the corpus chars by the shipped tokens, so
    // Σ n_occ·len(token) == Σ cnt(word)·len(word) EXACTLY — the
    // conservation invariant the unigram_conservation oracle checks.
    if (iters > 0) {
      val finalCounts = estep(vocab).toMap
      vocab = vocab.map { case (t, _) => t -> finalCounts.getOrElse(t, 0L) }
    }
    words.unpersist()
    val scores = microLogProbs(vocab)
    vocab.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      (t, c, scores.getOrElse(t, FloorMicro), alphaSet.contains(t))
    }.toDF("token", "n_occ", "logp_micro", "is_char")
  }

  /** Apply side: Viterbi-encode every document with a trained vocab —
    * map-only (broadcast scores, per-word DP inside the expression
    * evaluation via mapPartitions), no shuffle. Output: id, n_words,
    * n_tokens, seg_str (tokens space-joined, words " | "-joined). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long], maxTokenLen: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val sc = b.value
        it.map { case (id, t) =>
          val ws = t.trim.split("\\s+").filter(_.nonEmpty)
          val segs = ws.map(w => viterbi(w, sc, maxTokenLen))
          (id, ws.length.toLong, segs.map(_.size.toLong).sum,
            segs.map(_.mkString(" ")).mkString(" | "))
        }
      }.toDF("id", "n_words", "n_tokens", "seg_str")
  }

  private implicit class JIterAsScala[A](val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
