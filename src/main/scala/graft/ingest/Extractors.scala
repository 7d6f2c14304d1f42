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
    * `.pdf`). DOCX/EPUB are real binary formats parsed with
    * java.util.zip + XML stripping; EML is RFC-822 parsing. */
  val supportedExtensions: Set[String] =
    Set(".txt", ".md", ".csv", ".html", ".htm", ".json", ".pages.json",
      ".docx", ".epub", ".eml", ".odt", ".enex", ".rtf", ".xlsx")

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

  /** Zip entries as (name, bytes), in archive order. */
  private def zipEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += ((e.getName, zis.readAllBytes()))
      e = zis.getNextEntry
    }
    out.result()
  }

  /** DOCX → text: `word/document.xml` with paragraph/break/tab elements
    * mapped to \n / \n / \t, remaining XML stripped, entities decoded —
    * the Docx2txtLoader shape (document_processor.py:134). Pure
    * java.util.zip, no POI. */
  def docx(bytes: Array[Byte]): String = {
    val xml = zipEntries(bytes).collectFirst {
      case ("word/document.xml", b) => new String(b, StandardCharsets.UTF_8)
    }.getOrElse(return "")
    val withBreaks = xml
      .replaceAll("</w:p>", "\n")
      .replaceAll("<w:br[^>]*/?>", "\n")
      .replaceAll("<w:tab[^>]*/?>", "\t")
    val noTags = AnyTagRe.replaceAllIn(withBreaks, "")
    EntityMap.foldLeft(noTags) { case (s, (k, v)) => s.replace(k, v) }.strip()
  }

  /** EPUB → text: every (x)html content entry in archive order through
    * the HTML extractor, blank-line separated (UnstructuredEPubLoader
    * single-mode shape, document_processor.py:139). */
  def epub(bytes: Array[Byte]): String =
    zipEntries(bytes)
      .filter { case (n, _) =>
        val l = n.toLowerCase
        l.endsWith(".xhtml") || l.endsWith(".html") || l.endsWith(".htm") }
      .map { case (_, b) => html(b) }
      .filter(_.nonEmpty)
      .mkString("\n\n")

  /** XLSX → text: shared strings resolved into tab-separated cell rows
    * per sheet (sheets in entry-name order, blank-line separated) — the
    * UnstructuredExcelLoader single-mode shape
    * (document_processor.py:146-148). Covers shared ("t=\"s\""),
    * inline, and literal cell values; formulas surface as their cached
    * <v> result. */
  def xlsx(bytes: Array[Byte]): String = {
    val entries = zipEntries(bytes)
    def innerText(s: String): String = {
      val ts = "(?s)<t[^>]*>(.*?)</t>".r.findAllMatchIn(s).map(_.group(1)).mkString
      EntityMap.foldLeft(ts) { case (acc, (k, v)) => acc.replace(k, v) }
    }
    val shared: Vector[String] = entries.collectFirst {
      case ("xl/sharedStrings.xml", b) =>
        "(?s)<si>(.*?)</si>".r.findAllMatchIn(new String(b, StandardCharsets.UTF_8))
          .map(m => innerText(m.group(1))).toVector
    }.getOrElse(Vector.empty)
    val CellRe = "(?s)<c ([^>]*?)/?>((.*?)</c>)?".r
    entries
      .filter { case (n, _) => n.startsWith("xl/worksheets/") && n.endsWith(".xml") }
      .sortBy(_._1)
      .map { case (_, b) =>
        val xml = new String(b, StandardCharsets.UTF_8)
        "(?s)<row[^>]*>(.*?)</row>".r.findAllMatchIn(xml).map { r =>
          CellRe.findAllMatchIn(r.group(1)).flatMap { c =>
            val attrs = c.group(1)
            val inner = Option(c.group(3)).getOrElse("")
            if (attrs.contains("t=\"inlineStr\"")) Some(innerText(inner))
            else "(?s)<v>(.*?)</v>".r.findFirstMatchIn(inner).map(_.group(1)).map { v =>
              if (attrs.contains("t=\"s\"")) shared.lift(v.trim.toInt).getOrElse("") else v
            }
          }.mkString("\t")
        }.filter(_.nonEmpty).mkString("\n")
      }
      .filter(_.nonEmpty).mkString("\n\n")
  }

  /** ODT → text: `content.xml` with OpenDocument paragraph/heading ends
    * and tabs/line-breaks mapped, XML stripped, entities decoded
    * (UnstructuredODTLoader shape, document_processor.py:150). Same
    * zip+XML approach as [[docx]]. */
  def odt(bytes: Array[Byte]): String = {
    val xml = zipEntries(bytes).collectFirst {
      case ("content.xml", b) => new String(b, StandardCharsets.UTF_8)
    }.getOrElse(return "")
    val withBreaks = xml
      .replaceAll("</text:p>", "\n")
      .replaceAll("</text:h>", "\n")
      .replaceAll("<text:line-break[^>]*/?>", "\n")
      .replaceAll("<text:tab[^>]*/?>", "\t")
      .replaceAll("<text:s[^>]*/>", " ")
    val noTags = AnyTagRe.replaceAllIn(withBreaks, "")
    EntityMap.foldLeft(noTags) { case (s, (k, v)) => s.replace(k, v) }.strip()
  }

  /** ENEX (Evernote export) → text: per-note title + ENML content
    * (CDATA-wrapped XHTML, stripped like html), blank-line separated
    * (EverNoteLoader shape, document_processor.py:137). */
  def enex(bytes: Array[Byte]): String = {
    val raw = text(bytes)
    val notes = "(?s)<note>(.*?)</note>".r.findAllMatchIn(raw).map(_.group(1)).toSeq
    notes.map { n =>
      val title = "(?s)<title>(.*?)</title>".r.findFirstMatchIn(n).map(_.group(1).strip).getOrElse("")
      val content = "(?s)<content>\\s*(?:<!\\[CDATA\\[)?(.*?)(?:\\]\\]>)?\\s*</content>".r
        .findFirstMatchIn(n).map(_.group(1)).getOrElse("")
      val body = html(content.getBytes(StandardCharsets.UTF_8))
      Seq(title, body).filter(_.nonEmpty).mkString("\n\n")
    }.filter(_.nonEmpty).mkString("\n\n")
  }

  /** RTF → text: drop groups that carry no document text (fonttbl,
    * colortbl, stylesheet, info, pict...), map \par/\line/\tab, decode
    * \'hh hex escapes, strip remaining control words and braces
    * (UnstructuredRTFLoader shape, document_processor.py:152). A
    * pragmatic parser: covers the common writer output, not the full
    * spec. */
  def rtf(bytes: Array[Byte]): String = {
    var s = text(bytes)
    // destination groups whose content must not surface; innermost-first
    val destRe = "(?s)\\{\\\\\\*?\\\\?(?:fonttbl|colortbl|stylesheet|info|pict|themedata|generator)[^{}]*(?:\\{[^{}]*\\}[^{}]*)*\\}".r
    var prev: String = null
    while (prev != s) { prev = s; s = destRe.replaceAllIn(s, "") }
    // a control word consumes one following space as its delimiter
    s = s.replaceAll("\\\\par[d]?\\b ?", "\n")
      .replaceAll("\\\\line\\b ?", "\n")
      .replaceAll("\\\\tab\\b ?", "\t")
    s = "\\\\'([0-9A-Fa-f]{2})".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    s = s.replaceAll("\\\\[a-zA-Z]+-?\\d* ?", "") // control words
      .replaceAll("[{}]", "")
      .replaceAll("\\\\([\\\\{}])", "$1")
    s.replaceAll("  +", " ").strip()
  }

  private val QpRe = "=([0-9A-Fa-f]{2})".r

  /** EML → text: subject + body. Handles one level of multipart
    * (preferring text/plain over text/html), quoted-printable and
    * base64 transfer encodings (UnstructuredEmailLoader shape,
    * document_processor.py:141-144). */
  def eml(bytes: Array[Byte]): String = {
    val raw = text(bytes).replace("\r\n", "\n")
    val (headers, body) = raw.indexOf("\n\n") match {
      case -1 => (raw, "")
      case i  => (raw.substring(0, i), raw.substring(i + 2))
    }
    def header(name: String): Option[String] = {
      val unfolded = headers.replaceAll("\n[ \t]+", " ")
      unfolded.linesIterator.collectFirst {
        case l if l.toLowerCase.startsWith(name.toLowerCase + ":") =>
          l.substring(name.length + 1).trim
      }
    }
    def decodeBody(b: String, enc: Option[String]): String = enc.map(_.toLowerCase) match {
      case Some("base64") =>
        try new String(java.util.Base64.getMimeDecoder.decode(b.trim), StandardCharsets.UTF_8)
        catch { case scala.util.control.NonFatal(_) => b }
      case Some("quoted-printable") =>
        QpRe.replaceAllIn(b.replaceAll("=\n", ""),
          m => java.util.regex.Matcher.quoteReplacement(
            Integer.parseInt(m.group(1), 16).toChar.toString))
      case _ => b
    }
    val contentType = header("Content-Type").getOrElse("text/plain")
    val bodyText =
      if (contentType.toLowerCase.startsWith("multipart/")) {
        val boundary = "boundary=\"?([^\";]+)\"?".r
          .findFirstMatchIn(contentType).map(_.group(1))
        boundary match {
          case Some(bd) =>
            val parts = body.split(java.util.regex.Pattern.quote("--" + bd)).toSeq
              .map(_.strip).filter(p => p.nonEmpty && p != "--")
              .flatMap { p =>
                val (ph, pb) = p.indexOf("\n\n") match {
                  case -1 => (p, ""); case i => (p.substring(0, i), p.substring(i + 2))
                }
                val ct = ph.linesIterator.map(_.replaceAll("\n[ \t]+", " "))
                  .find(_.toLowerCase.startsWith("content-type:")).getOrElse("text/plain")
                val enc = ph.linesIterator
                  .find(_.toLowerCase.startsWith("content-transfer-encoding:"))
                  .map(_.split(":", 2)(1).trim)
                Some((ct.toLowerCase, decodeBody(pb, enc)))
              }
            parts.collectFirst { case (ct, b) if ct.contains("text/plain") => b }
              .orElse(parts.collectFirst {
                case (ct, b) if ct.contains("text/html") => html(b.getBytes(StandardCharsets.UTF_8)) })
              .getOrElse("")
          case None => body
        }
      } else if (contentType.toLowerCase.contains("text/html"))
        html(decodeBody(body, header("Content-Transfer-Encoding")).getBytes(StandardCharsets.UTF_8))
      else decodeBody(body, header("Content-Transfer-Encoding"))
    (header("Subject").map(_ + "\n\n").getOrElse("") + bodyText).strip()
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
        else if (lower.endsWith(".docx")) docx(bytes)
        else if (lower.endsWith(".epub")) epub(bytes)
        else if (lower.endsWith(".eml")) eml(bytes)
        else if (lower.endsWith(".odt")) odt(bytes)
        else if (lower.endsWith(".xlsx")) xlsx(bytes)
        else if (lower.endsWith(".enex")) enex(bytes)
        else if (lower.endsWith(".rtf")) rtf(bytes)
        else text(bytes)
      if (out == null || out.strip().isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def isPdfLike(fileName: String): Boolean = {
    val lower = fileName.toLowerCase
    lower.endsWith(".pages.json") || lower.endsWith(".pdf")
  }
}
