package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Scalar text operators of the reference, as codegen-friendly Column
  * builders (SURVEY.md §2.2, §2.8). Everything here is a built-in
  * expression chain — no UDF in the per-row hot path except the tiny
  * page-range formatter that runs on already-aggregated arrays. */
object TextFunctions {

  /** P2 — printable-ASCII clean before embedding: keep `\n`, `\t` and
    * chars 32..126, drop everything else (vector_db_creator.py:109-115).
    * Applied AFTER chunking, like the reference, so chunk boundaries are
    * computed on raw text. */
  def asciiClean(c: Column): Column =
    regexp_replace(c, "[^\\n\\t\\x20-\\x7e]", "")

  /** P7 — display whitespace normalization (vector_db_query.py:62-63):
    * `\n[ \t]+\n` → `\n\n`, then `\n\s*\n\s*\n*` → `\n\n` on the
    * stripped text. */
  def normalizeWhitespace(c: Column): Column = {
    val stripped = regexp_replace(regexp_replace(c, "\\n[ \\t]+\\n", "\n\n"),
      "^\\s+|\\s+$", "")
    regexp_replace(stripped, "\\n\\s*\\n\\s*\\n*", "\n\n")
  }

  /** S5 — content identity: sha256 hex of the text
    * (document_processor.py:42-50). */
  def contentHash(c: Column): Column = sha2(c.cast("string"), 256)

  /** P9 — text coercion before embedding (embedding_models.py:36-51):
    * null → " ", strip-or-space. */
  def coerceText(c: Column): Column = {
    val t = regexp_replace(coalesce(c.cast("string"), lit(" ")), "^\\s+|\\s+$", "")
    when(length(t) === 0, lit(" ")).otherwise(t)
  }

  /** P5 — case-insensitive substring keyword filter; empty/null term is
    * a no-op (vector_db_query.py:247-254). */
  def keywordPredicate(text: Column, term: String): Column =
    if (term == null || term.isEmpty) lit(true)
    else contains(lower(text), lit(term.toLowerCase))

  /** P6 — document_type equality filter; empty/null is a no-op
    * (vector_db_query.py:256-261). */
  def docTypePredicate(docType: Column, wanted: String): Column =
    if (wanted == null || wanted.isEmpty) lit(true)
    else docType === lit(wanted)

  /** Clip to [0,1] (np.clip of vector_db_query.py:172-202). */
  def clip01(c: Column): Column = least(greatest(c, lit(0.0)), lit(1.0))

  /** A3 — consecutive-run page-range compaction: sorted distinct pages →
    * "1-3, 7" (utilities.py:42-56). Runs on the post-aggregation array
    * (one small array per citation group), so a UDF costs nothing. */
  def formatPageRanges(pages: Seq[Int]): String = {
    if (pages == null || pages.isEmpty) return ""
    val sp = pages.distinct.sorted
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = sp.head; var prev = sp.head
    for (p <- sp.tail) {
      if (p == prev + 1) prev = p
      else { ranges += ((start, prev)); start = p; prev = p }
    }
    ranges += ((start, prev))
    ranges.map { case (s, e) => if (s == e) s"$s" else s"$s-$e" }.mkString(", ")
  }
  val formatPageRangesUdf: UserDefinedFunction = udf((pages: Seq[Int]) => formatPageRanges(pages))

  // ---- text-analytics column builders (scale extensions; SURVEY.md §7.1/7) --

  /** Whitespace token count; 0 for blank text. */
  def tokenCount(c: Column): Column =
    when(length(regexp_replace(c, "^\\s+|\\s+$", "")) === 0, lit(0))
      .otherwise(size(split(regexp_replace(c, "^\\s+|\\s+$", ""), "\\s+")))

  /** Ratio of characters of `cls` (a regex char class) in the text. */
  def charClassRatio(c: Column, cls: String): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, cls, ""))).cast("double") / length(c).cast("double"))

  def punctRatio(c: Column): Column = charClassRatio(c, "[.,;:!?'\"()\\[\\]{}-]")
  def digitRatio(c: Column): Column = charClassRatio(c, "[0-9]")
  def upperRatio(c: Column): Column = charClassRatio(c, "[A-Z]")

  /** BPE-ish tokenizer pattern: alphanumeric runs, or single
    * non-alphanumeric non-space chars (each punctuation mark its own
    * token — the shape of a byte-pair-encoding pre-tokenizer). Plain
    * ASCII classes so Java regex and RE2 (DuckDB) agree. */
  val BpeTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** BPE-ish token count over [[BpeTokenPattern]]. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Count of non-overlapping occurrences of a literal marker substring,
    * via length arithmetic (identical semantics in Spark and DuckDB —
    * used by the language-ID heuristic so the oracle can replicate it). */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) / lit(marker.length)).cast("long")
}
