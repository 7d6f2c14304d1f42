package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.collection.mutable.ArrayBuffer

/** Character-window chunking with exact reference parity (SURVEY.md O1/O3).
  *
  * Two distinct splitters exist in the reference:
  *  - non-PDF: FixedSizeTextSplitter — fixed windows `[i*sz, (i+1)*sz)`,
  *    NO overlap regardless of config (document_processor.py:78-92);
  *  - PDF: add_pymupdf_page_metadata — sliding windows with stride
  *    `chunk_size - chunk_overlap` over marker-cleaned text, each chunk
  *    assigned the page of the last `[[pageN]]` marker at-or-before its
  *    start, chunks with no page dropped (document_processor.py:248-292).
  *
  * Both strip each chunk (Python str.strip ≈ Java String.strip) and drop
  * empties. Pure per-row functions: distributing the document table does
  * not change results, and the UDF cost is O(doc length) once per doc.
  */
object Chunker {

  /** One produced chunk. `start` is the 0-based char offset in the
    * (marker-cleaned) source text; `ordinal` is the window index
    * *before* empty/no-page windows are dropped, making (docId, ordinal)
    * a stable natural key (SURVEY.md §4.3 — reference ids are random,
    * so oracles must key on natural keys). */
  final case class Chunk(text: String, page_number: Option[Int], ordinal: Int, start: Int)

  /** Non-PDF path: fixed windows, overlap ignored
    * (document_processor.py:84-91). */
  def chunkFixed(text: String, chunkSize: Int): Seq[Chunk] = {
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    if (text == null || text.isEmpty) return Nil
    val out = new ArrayBuffer[Chunk]
    var start = 0
    var ordinal = 0
    while (start < text.length) {
      val piece = text.substring(start, math.min(start + chunkSize, text.length)).strip()
      if (piece.nonEmpty) out += Chunk(piece, None, ordinal, start)
      start += chunkSize
      ordinal += 1
    }
    out.toSeq
  }

  private val MarkerRe = "\\[\\[page(\\d+)\\]\\]".r

  /** PDF path over `[[pageN]]`-marked text (document_processor.py:249-277).
    * Marker offsets are positions in the *cleaned* text; page lookup is
    * "last marker with pos <= chunk start"; windows slide by
    * `chunkSize - chunkOverlap`; chunks that precede every marker
    * (page == None) are dropped, exactly like the reference (:273). */
  def chunkMarked(text: String, chunkSize: Int, chunkOverlap: Int): Seq[Chunk] = {
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
      s"chunk_overlap must be in [0, chunk_size), got $chunkOverlap (size $chunkSize)")
    if (text == null || text.isEmpty) return Nil

    // marker positions measured in clean-text offsets (reference subtracts
    // the cumulative length of markers seen so far, :250-256)
    val markers = new ArrayBuffer[(Int, Int)] // (cleanPos, page)
    var removed = 0
    for (m <- MarkerRe.findAllMatchIn(text)) {
      markers += ((m.start - removed, m.group(1).toInt))
      removed += m.matched.length
    }
    val clean = MarkerRe.replaceAllIn(text, "")

    val stride = chunkSize - chunkOverlap
    val out = new ArrayBuffer[Chunk]
    var start = 0
    var ordinal = 0
    while (start < clean.length) {
      val end = math.min(start + chunkSize, clean.length)
      val piece = clean.substring(start, end).strip()
      // last marker at-or-before start (markers is ascending; binary search)
      var page: Option[Int] = None
      var lo = 0; var hi = markers.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (markers(mid)._1 <= start) { page = Some(markers(mid)._2); lo = mid + 1 }
        else hi = mid - 1
      }
      if (piece.nonEmpty && page.isDefined) out += Chunk(piece, page, ordinal, start)
      start += stride
      ordinal += 1
    }
    out.toSeq
  }

  /** Page-array form (our PDF fixture format; FIXTURES.md §1) → marked
    * text, replicating CustomPyMuPDFParser._lazy_parse: blank pages
    * skipped, 1-based page numbers, `[[pageN]]` prefix, pages
    * concatenated with no separator (document_processor.py:104-110). */
  def pagesToMarkedText(pages: Seq[String]): String = {
    val sb = new StringBuilder
    pages.zipWithIndex.foreach { case (p, i) =>
      if (p != null && p.strip().nonEmpty) sb.append(s"[[page${i + 1}]]").append(p)
    }
    sb.toString
  }

  /** Unified dispatcher matching split_documents (document_processor.py:294-320):
    * PDF docs take the sliding/marked path, everything else fixed windows. */
  def chunk(text: String, isPdf: Boolean, chunkSize: Int, chunkOverlap: Int): Seq[Chunk] =
    if (isPdf) chunkMarked(text, chunkSize, chunkOverlap) else chunkFixed(text, chunkSize)

  // ---- Spark surface --------------------------------------------------

  /** array<struct<text,page_number,ordinal,start>> from fixed windows. */
  val chunkFixedUdf: UserDefinedFunction =
    udf((text: String, size: Int) => chunkFixed(text, size))

  /** array<struct<...>> from marked sliding windows. */
  val chunkMarkedUdf: UserDefinedFunction =
    udf((text: String, size: Int, overlap: Int) => chunkMarked(text, size, overlap))

  /** Pages array → marked text (used ahead of chunkMarkedUdf). */
  val pagesToMarkedTextUdf: UserDefinedFunction =
    udf((pages: Seq[String]) => pagesToMarkedText(pages))

  def chunkFixedCol(text: Column, size: Column): Column = chunkFixedUdf(text, size)
  def chunkMarkedCol(text: Column, size: Column, overlap: Column): Column =
    chunkMarkedUdf(text, size, overlap)
}
