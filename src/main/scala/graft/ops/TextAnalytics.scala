package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
}
