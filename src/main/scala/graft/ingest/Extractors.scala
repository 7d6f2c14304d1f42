package graft.ingest

import java.nio.charset.StandardCharsets

/** Per-format text extraction — the leaf UDFs of the ingest scan
  * (SURVEY.md S2). The reference dispatches on extension to langchain
  * loaders, all forced to single-document mode
  * (document_processor.py:127-217); we keep extractors as pure
  * `bytes → text` functions so the Spark side stays a single
  * binaryFile scan + one dispatch UDF. Failures yield None and the row
  * is filtered, matching the reference's log-and-skip
  * (document_processor.py:209-217).
  *
  * Formats with heavyweight binary parsers (real PDF, DOCX, EPUB…) are
  * represented by the deterministic page-array fixture format
  * `.pages.json` (FIXTURES.md §1) — the engine semantics (page markers,
  * chunk/page attribution) are identical; swapping in pdfbox/poi later
  * changes only this leaf. */
object Extractors {

  /** Extensions we accept (subset of constants.py:294-311 expressible
    * without binary parser libraries; `.pages.json` stands in for
    * `.pdf`). */
  val supportedExtensions: Set[String] =
    Set(".txt", ".md", ".csv", ".html", ".htm", ".json", ".pages.json")

  private val TagRe = "(?s)<(script|style)[^>]*>.*?</\\1>".r
  private val AnyTagRe = "<[^>]+>".r
  private val EntityMap = Map("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  def text(bytes: Array[Byte]): String = new String(bytes, StandardCharsets.UTF_8)

  /** HTML → text: drop script/style, strip tags with a space separator,
    * decode common entities, collapse runs of spaces — mirroring the
    * BSHTMLLoader `get_text(separator=" ")` shape
    * (document_processor.py:160-168). */
  def html(bytes: Array[Byte]): String = {
    val raw = text(bytes)
    val noScript = TagRe.replaceAllIn(raw, " ")
    val noTags = AnyTagRe.replaceAllIn(noScript, " ")
    val decoded = EntityMap.foldLeft(noTags) { case (s, (k, v)) => s.replace(k, v) }
    decoded.replaceAll("[ \\t]+", " ").strip()
  }

  /** `.pages.json` fixture: `{"pages": ["...", ...]}` → page texts.
    * Minimal JSON parsing via jackson (already on the Spark classpath). */
  def pages(bytes: Array[Byte]): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(bytes)
    val arr = root.get("pages")
    if (arr == null || !arr.isArray) Seq.empty
    else (0 until arr.size()).map(i => arr.get(i).asText(""))
  }

  /** Dispatch: extension → plain text (PDF-fixture files are converted
    * to `[[pageN]]`-marked text so the downstream chunker sees exactly
    * the reference's parser output, document_processor.py:104-110). */
  def extract(fileName: String, bytes: Array[Byte]): Option[String] = {
    try {
      val lower = fileName.toLowerCase
      val out =
        if (lower.endsWith(".pages.json"))
          graft.functions.Chunker.pagesToMarkedText(pages(bytes))
        else if (lower.endsWith(".html") || lower.endsWith(".htm")) html(bytes)
        else text(bytes)
      if (out == null || out.strip().isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def isPdfLike(fileName: String): Boolean = {
    val lower = fileName.toLowerCase
    lower.endsWith(".pages.json") || lower.endsWith(".pdf")
  }
}
