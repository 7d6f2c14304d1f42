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
      ".docx", ".epub", ".eml", ".odt", ".enex", ".rtf", ".xlsx", ".xlsm",
      ".pdf", ".msg", ".xls")

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
    // \uN unicode escapes (RTF 1.5+): emit codepoint N (negative N is
    // N + 65536 — RTF control-word params are signed 16-bit), then skip
    // the ANSI fallback run whose length the \ucN state sets (default
    // 1; \uc0 writers emit no fallback). Stateful linear scan: \ucN is
    // a mode switch, so a single regex can't honor it.
    s = {
      val sb = new StringBuilder(s.length)
      var uc = 1
      var i = 0
      val UcRe = "\\G\\\\uc(\\d+) ?".r
      val URe = "\\G\\\\u(-?\\d+) ?".r
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'u') {
          UcRe.findFirstMatchIn(s.substring(i)) match {
            case Some(m) => uc = m.group(1).toInt; i += m.end
            case None => URe.findFirstMatchIn(s.substring(i)) match {
              case Some(m) =>
                val n = m.group(1).toInt
                sb.append((if (n < 0) n + 65536 else n).toChar)
                i += m.end
                // fallback chars: plain chars or \'xx hex escapes
                var skip = uc
                while (skip > 0 && i < s.length) {
                  if (s.charAt(i) == '\\' && i + 3 < s.length && s.charAt(i + 1) == '\'') i += 4
                  else i += 1
                  skip -= 1
                }
              case None => sb.append(s.charAt(i)); i += 1
            }
          }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
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

  /** MSG (Outlook message, MS-OXMSG) → subject + body. The OLE2
    * container stores each MAPI property as a stream
    * `__substg1.0_<id><type>`: subject = 0x0037, body = 0x1000; type
    * 001F = UTF-16LE, 001E = 8-bit. Same output shape as [[eml]]
    * (UnstructuredEmailLoader handles both, document_processor.py:143).
    *
    * Properties are matched by storage PATH, not leaf name: a nested
    * attachment (`__attach_version1.0_#N/` storage) carries its own
    * subject/body streams that must NOT be mistaken for the message's.
    * Attachments surface below the body — display name (0x3001, long
    * filename 0x3707 / short 0x3704 fallbacks), and for attached
    * messages (embedded `__substg1.0_3701000D` storage) the nested
    * subject + body, one level deep. */
  def msg(bytes: Array[Byte]): String = {
    val sts = Ole2.streamsWithPath(bytes)
    def prop(scope: String, id: String): Option[String] =
      sts.collectFirst {
        case (p, b) if p == s"${scope}__substg1.0_${id}001F" =>
          new String(b, StandardCharsets.UTF_16LE)
      }.orElse(sts.collectFirst {
        case (p, b) if p == s"${scope}__substg1.0_${id}001E" =>
          new String(b, StandardCharsets.UTF_8)
      }).map(_.strip).filter(_.nonEmpty)
    def subjectBody(scope: String): String =
      (prop(scope, "0037").map(_ + "\n\n").getOrElse("") +
        prop(scope, "1000").getOrElse("")).strip
    val attachScopes = sts.map(_._1).collect {
      case p if p.startsWith("__attach_") && p.contains("/") =>
        p.substring(0, p.indexOf('/') + 1)
    }.distinct.sorted
    val attachTexts = attachScopes.map { sc =>
      val name = prop(sc, "3001").orElse(prop(sc, "3707")).orElse(prop(sc, "3704"))
      val nested = subjectBody(sc + "__substg1.0_3701000D/")
      (s"[attachment]${name.map(" " + _).getOrElse("")}" +
        (if (nested.nonEmpty) "\n" + nested else "")).strip
    }
    (Seq(subjectBody("")) ++ attachTexts).filter(_.nonEmpty).mkString("\n\n").strip
  }

  /** XLS (BIFF8 workbook) → tab-separated cell rows per sheet, the same
    * output shape as [[xlsx]]. Reads the `Workbook` stream's record
    * sequence: SST shared strings (simple and rich/extended headers;
    * strings that span Continue records are dropped, not mangled),
    * LABELSST / LABEL / NUMBER / RK / MULRK cells, BOF substream
    * boundaries for sheet order. Formulas surface only via their
    * cached RK/NUMBER results when present. */
  def xls(bytes: Array[Byte]): String = {
    val wb = Ole2.streams(bytes).collectFirst {
      case (n, b) if n == "Workbook" || n == "Book" => b
    }.getOrElse(return "")
    val buf = java.nio.ByteBuffer.wrap(wb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sst = scala.collection.mutable.ArrayBuffer[String]()
    // sheet → row → col → text
    val sheets = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.TreeMap[Int, scala.collection.mutable.TreeMap[Int, String]]]()
    def cell(sheet: Int, row: Int, col: Int, v: String): Unit =
      if (sheet >= 0 && sheet < sheets.length)
        sheets(sheet).getOrElseUpdate(row, scala.collection.mutable.TreeMap.empty)
          .update(col, v)
    def fmtNum(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
    def rkValue(rk: Long): Double = {
      val base =
        if ((rk & 2L) != 0) (rk.toInt >> 2).toDouble // 30-bit signed int (arithmetic shift on the 32-bit value)
        else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
      if ((rk & 1L) != 0) base / 100.0 else base
    }
    var sheet = -1 // BIFF globals substream precedes the first sheet
    var pos = 0
    while (pos + 4 <= wb.length) {
      val typ = buf.getShort(pos).toInt & 0xFFFF
      val len = buf.getShort(pos + 2).toInt & 0xFFFF
      val p = pos + 4
      if (p + len > wb.length) { pos = wb.length } // truncated record
      else {
        typ match {
          case 0x0809 => // BOF: dt at +2 (0x0005 globals, 0x0010 worksheet)
            if (len >= 4 && (buf.getShort(p + 2).toInt & 0xFFFF) == 0x0010) {
              sheets += scala.collection.mutable.TreeMap.empty
              sheet = sheets.length - 1
            }
          case 0x00FC => // SST: 8-byte header then XLUnicodeRichExtendedString*
            var q = p + 8
            var ok = true
            while (ok && q + 3 <= p + len) {
              val cch = buf.getShort(q).toInt & 0xFFFF
              val flags = wb(q + 2).toInt & 0xFF
              var r = q + 3
              val cRun = if ((flags & 0x08) != 0) {
                val v = if (r + 2 <= p + len) buf.getShort(r).toInt & 0xFFFF else 0
                r += 2; v
              } else 0
              val cbExt = if ((flags & 0x04) != 0) {
                val v = if (r + 4 <= p + len) buf.getInt(r) else 0
                r += 4; v
              } else 0
              val nBytes = if ((flags & 0x01) != 0) cch * 2 else cch
              if (r + nBytes + cRun * 4 + cbExt <= p + len) {
                sst += (if ((flags & 0x01) != 0)
                  new String(wb, r, nBytes, StandardCharsets.UTF_16LE)
                else new String(wb, r, nBytes, StandardCharsets.ISO_8859_1))
                q = r + nBytes + cRun * 4 + cbExt
              } else ok = false // string continues into a Continue record
            }
          case 0x00FD if len >= 10 => // LABELSST
            val idx = buf.getInt(p + 6)
            cell(sheet, buf.getShort(p).toInt & 0xFFFF, buf.getShort(p + 2).toInt & 0xFFFF,
              if (idx >= 0 && idx < sst.length) sst(idx) else "")
          case 0x0204 if len >= 9 => // LABEL (inline BIFF8 string)
            val cch = buf.getShort(p + 6).toInt & 0xFFFF
            val flags = wb(p + 8).toInt & 0xFF
            val nBytes = if ((flags & 0x01) != 0) cch * 2 else cch
            if (p + 9 + nBytes <= p + len)
              cell(sheet, buf.getShort(p).toInt & 0xFFFF, buf.getShort(p + 2).toInt & 0xFFFF,
                if ((flags & 0x01) != 0) new String(wb, p + 9, nBytes, StandardCharsets.UTF_16LE)
                else new String(wb, p + 9, nBytes, StandardCharsets.ISO_8859_1))
          case 0x0203 if len >= 14 => // NUMBER: xnum f64
            cell(sheet, buf.getShort(p).toInt & 0xFFFF, buf.getShort(p + 2).toInt & 0xFFFF,
              fmtNum(buf.getDouble(p + 6)))
          case 0x027E if len >= 10 => // RK
            cell(sheet, buf.getShort(p).toInt & 0xFFFF, buf.getShort(p + 2).toInt & 0xFFFF,
              fmtNum(rkValue(buf.getInt(p + 6).toLong & 0xFFFFFFFFL)))
          case 0x00BD if len >= 10 => // MULRK: row, colFirst, (ixfe, rk)*, colLast
            val row = buf.getShort(p).toInt & 0xFFFF
            val colFirst = buf.getShort(p + 2).toInt & 0xFFFF
            val nCells = (len - 6) / 6
            (0 until nCells).foreach { k =>
              cell(sheet, row, colFirst + k,
                fmtNum(rkValue(buf.getInt(p + 4 + k * 6 + 2).toLong & 0xFFFFFFFFL)))
            }
          case _ => ()
        }
        pos = p + len
      }
    }
    sheets.map { rows =>
      rows.values.map(_.values.mkString("\t")).filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty).mkString("\n\n")
  }

  // -------------------------------------------------------------------
  // Real binary PDF (ISO 32000): object scan → page-tree traversal →
  // FlateDecode → BT/ET text-operator extraction. The reference's
  // flagship loader is PyMuPDF page texts joined with [[pageN]] markers
  // (document_processor.py:95-113); this parser produces the same
  // page-text sequence for the dominant real-world shape — Flate or
  // uncompressed content streams, simple-font ASCII/Latin-1 text shown
  // with Tj / TJ / ' / ". PDF 1.5 object streams (/Type /ObjStm — the
  // container shape every xref-stream writer produces) are expanded
  // into the object map; the xref/xref-stream tables themselves are
  // never read (the object scan IS the index). Composite/subset fonts
  // are remapped through their /ToUnicode CMap (bfchar + bfrange,
  // 1- and 2-byte codespaces; /Resources inline or by ref, inherited
  // from the page tree) — the shape every embedded-subset-font writer
  // emits, where raw string bytes are glyph codes, not Latin-1. Out of
  // scope (extractor returns what it can): fonts with NO /ToUnicode
  // (would need per-font /Differences + glyph-name tables), encrypted
  // files, LZW/DCT-only streams.
  // -------------------------------------------------------------------

  /** One indirect object: its dictionary source and raw stream bytes. */
  private case class PdfObj(dict: String, stream: Array[Byte])

  private val ObjStartRe = "(\\d+)\\s+(\\d+)\\s+obj\\b".r
  private val RefRe = "(\\d+)\\s+\\d+\\s+R".r

  /** Scan every `N G obj … endobj` in the file. Stream extents come
    * from a direct /Length when present (binary stream data may contain
    * `endobj`/`endstream` byte runs, so delimiter search alone is not
    * safe), else the nearest `endstream`. */
  private def pdfObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    // ISO-8859-1 round-trips bytes 1:1, so offsets in this string are
    // byte offsets and stream segments convert back losslessly
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = Map.newBuilder[Int, PdfObj]
    for (m <- ObjStartRe.findAllMatchIn(s)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamKw = s.indexOf("stream", bodyStart)
      val endobj = s.indexOf("endobj", bodyStart)
      if (endobj >= 0) {
        if (streamKw >= 0 && streamKw < endobj) {
          val dict = s.substring(bodyStart, streamKw)
          var dataStart = streamKw + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val len = "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
            .map(_.group(1).toInt)
          val dataEnd = len match {
            case Some(n) if dataStart + n <= s.length => dataStart + n
            case _ => math.max(s.lastIndexOf("endstream",
              s.indexOf("endstream", dataStart) max dataStart), dataStart)
          }
          out += num -> PdfObj(dict,
            s.substring(dataStart, dataEnd).getBytes(StandardCharsets.ISO_8859_1))
        } else out += num -> PdfObj(s.substring(bodyStart, endobj), Array.emptyByteArray)
      }
    }
    val direct = out.result()
    // PDF 1.5+ object streams: files written with xref STREAMS park
    // their dict-only objects (catalog, page tree, fonts) inside
    // /Type /ObjStm containers — invisible to the `N G obj` scan. The
    // xref stream itself is never needed here (the scan IS the object
    // index); expanding each ObjStm's payload is: header of /N
    // whitespace-separated (objnum, offset) int pairs, object source at
    // /First + offset. Contained objects are dict-only by spec (no
    // nested streams), so empty stream bytes are correct.
    val fromStreams = direct.values.toSeq.collect {
      case o if "/Type\\s*/ObjStm\\b".r.findFirstIn(o.dict).isDefined =>
        try {
          val data = if (o.dict.contains("/FlateDecode")) inflate(o.stream) else o.stream
          val s2 = new String(data, StandardCharsets.ISO_8859_1)
          val nOpt = "/N\\s+(\\d+)".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
          val firstOpt = "/First\\s+(\\d+)".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
          (nOpt, firstOpt) match {
            case (Some(n), Some(first)) if first <= s2.length =>
              val header = s2.substring(0, first).trim.split("\\s+")
                .filter(_.nonEmpty).map(_.toInt)
              val pairs = header.grouped(2).collect { case Array(num, off) => (num, off) }
                .take(n).toSeq
              pairs.zipWithIndex.map { case ((num, off), i) =>
                val start = math.min(first + off, s2.length)
                val end = if (i + 1 < pairs.length)
                  math.min(first + pairs(i + 1)._2, s2.length) else s2.length
                num -> PdfObj(s2.substring(start, math.max(end, start)), Array.emptyByteArray)
              }
            case _ => Seq.empty
          }
        } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }.flatten
    // direct objects win on object-number collision (a directly-written
    // replacement in an incremental update supersedes the ObjStm copy)
    fromStreams.toMap ++ direct
  }

  /** Inflate a /FlateDecode stream (zlib-wrapped per spec; raw-deflate
    * fallback for writers that omit the wrapper). */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(data.length * 4)
        val buf = new Array[Byte](8192)
        var n = inf.inflate(buf)
        while (n > 0) { // n == 0 with !finished means corrupt/needs-dict: stop
          out.write(buf, 0, n)
          n = if (inf.finished()) 0 else inf.inflate(buf)
        }
        out.toByteArray
      } finally inf.end()
    }
    try run(false) catch { case scala.util.control.NonFatal(_) => run(true) }
  }

  /** Unicode mapping of one font: code byte-width (1 or 2) + glyph
    * code → text. Absent map = simple Latin-1 font (identity). */
  private[ingest] final case class FontMap(width: Int, map: Map[Int, String])

  /** Parse a /ToUnicode CMap stream: codespacerange fixes the code
    * width; bfchar pairs and bfrange runs (scalar-increment and
    * array-destination forms) fill the map. Destinations are UTF-16BE
    * hex strings (possibly multi-unit, e.g. ligature expansions). */
  private[ingest] def parseToUnicode(data: Array[Byte]): FontMap = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val HexRe = "<([0-9A-Fa-f]+)>".r
    var width = 0
    for (cs <- "begincodespacerange([\\s\\S]*?)endcodespacerange".r.findAllMatchIn(s);
         h <- HexRe.findFirstMatchIn(cs.group(1)))
      width = math.max(width, h.group(1).length / 2)
    def dst(hex: String): String =
      new String(hex.grouped(4).filter(_.length == 4)
        .map(Integer.parseInt(_, 16).toChar).toArray)
    val m = Map.newBuilder[Int, String]
    for (bc <- "beginbfchar([\\s\\S]*?)endbfchar".r.findAllMatchIn(s)) {
      HexRe.findAllMatchIn(bc.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, d) =>
          width = math.max(width, src.length / 2)
          m += Integer.parseInt(src, 16) -> dst(d)
        case _ =>
      }
    }
    for (br <- "beginbfrange([\\s\\S]*?)endbfrange".r.findAllMatchIn(s)) {
      val toks = "<([0-9A-Fa-f]+)>|(\\[)|(\\])".r.findAllMatchIn(br.group(1)).toSeq
      var i = 0
      while (i + 2 < toks.length) {
        val lo = Integer.parseInt(toks(i).group(1), 16)
        val hi = Integer.parseInt(toks(i + 1).group(1), 16)
        width = math.max(width, toks(i).group(1).length / 2)
        if (toks(i + 2).group(2) != null) { // array form: one dst per code
          var j = i + 3; var c = lo
          while (j < toks.length && toks(j).group(3) == null) {
            if (c <= hi) m += c -> dst(toks(j).group(1))
            c += 1; j += 1
          }
          i = j + 1 // past the closing bracket
        } else { // scalar form: destination increments with the code
          val dhex = toks(i + 2).group(1)
          // increment applies to the LAST 16-bit unit of the dst
          val prefix = dst(dhex.dropRight(4))
          val base = Integer.parseInt(dhex.takeRight(4), 16)
          var c = lo
          // Two clamps: the source stays inside the 2-byte codespace,
          // and the incremented destination unit stays ≤ 0xFFFF — the
          // CMap spec's increment is a byte-increment of the LAST unit,
          // so letting it wrap past the BMP would silently remap into
          // an unrelated char (and a carry into the prefix has no
          // defined scalar-form semantics). Truncate the range's tail
          // instead: unmapped codes fall through to the subset-font
          // "contributes nothing" path, never to a wrong char.
          val hiClamped = math.min(math.min(hi, lo + 0xFFFF),
            lo + (0xFFFF - base))
          while (c <= hiClamped) {
            m += c -> (prefix + (base + (c - lo)).toChar)
            c += 1
          }
          i += 3
        }
      }
    }
    FontMap(if (width >= 2) 2 else 1, m.result())
  }

  /** Decode the raw code units of one shown string through the active
    * font's ToUnicode map; no map = identity (simple Latin-1 font). A
    * 2-byte font consumes code units pairwise (big-endian); unmapped
    * codes in a mapped 2-byte font contribute nothing (subset fonts
    * only map the glyphs they embed), unmapped 1-byte codes fall back
    * to identity. */
  private def decodeShown(raw: CharSequence, fm: Option[FontMap]): String =
    fm match {
      case None => raw.toString
      case Some(FontMap(w, map)) =>
        val sb = new StringBuilder
        var i = 0
        while (i < raw.length) {
          if (w == 2) {
            if (i + 1 < raw.length) {
              val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
              sb.append(map.getOrElse(code, ""))
            }
            i += 2
          } else {
            val code = raw.charAt(i) & 0xff
            sb.append(map.getOrElse(code, raw.charAt(i).toString))
            i += 1
          }
        }
        sb.toString
    }

  /** Text shown by one content stream: literal/hex strings fed to the
    * text-show operators, in order; line moves (Td, TD, `T*`, ET) map
    * to '\n'. `fonts` carries the page's resolved ToUnicode maps; the
    * `Tf` operator selects which one decodes subsequent strings. */
  private def pdfContentText(data: Array[Byte],
      fonts: Map[String, FontMap] = Map.empty): String = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    val line = new StringBuilder
    var pending = new StringBuilder // decoded strings since the last operator
    var lastName = ""               // most recent /Name token (Tf operand)
    var curFont: Option[FontMap] = None
    def flushLine(): Unit = {
      if (line.nonEmpty) { sb.append(line.toString.strip()).append('\n'); line.clear() }
    }
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '(' => // literal string; parens nest, backslash escapes
          val raw = new StringBuilder
          var depth = 1; i += 1
          while (i < n && depth > 0) {
            s.charAt(i) match {
              case '\\' if i + 1 < n =>
                s.charAt(i + 1) match {
                  case 'n' => raw.append('\n'); i += 2
                  case 'r' => raw.append('\r'); i += 2
                  case 't' => raw.append('\t'); i += 2
                  case 'b' => raw.append('\b'); i += 2
                  case 'f' => raw.append('\f'); i += 2
                  case '\n' => i += 2 // line continuation
                  case c if c >= '0' && c <= '7' => // \ooo octal, 1-3 digits
                    var j = i + 1; var v = 0
                    while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                      v = v * 8 + (s.charAt(j) - '0'); j += 1
                    }
                    raw.append(v.toChar); i = j
                  case c => raw.append(c); i += 2
                }
              case '(' => depth += 1; raw.append('('); i += 1
              case ')' => depth -= 1; if (depth > 0) raw.append(')'); i += 1
              case c => raw.append(c); i += 1
            }
          }
          pending.append(decodeShown(raw, curFont))
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' => // hex string
          val close = s.indexOf('>', i)
          if (close < 0) i = n
          else {
            val raw = new StringBuilder
            val hex = s.substring(i + 1, close).replaceAll("\\s", "")
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            var k = 0
            while (k + 2 <= padded.length) {
              raw.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
              k += 2
            }
            pending.append(decodeShown(raw, curFont))
            i = close + 1
          }
        case '<' => i += 2 // '<<' dict open
        case '/' => // name token: remember it as the potential Tf operand
          val start = i + 1
          i += 1
          while (i < n && !s.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(s.charAt(i))) i += 1
          lastName = s.substring(start, i)
        case '%' => while (i < n && s.charAt(i) != '\n') i += 1 // comment
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !s.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(s.charAt(i))) i += 1
          s.substring(start, i) match {
            case "Tj" | "TJ" | "'" | "\"" =>
              line.append(pending); pending = new StringBuilder
            case "Td" | "TD" | "T*" => pending.clear(); flushLine()
            case "ET" => pending.clear(); flushLine()
            case "Tf" => // select font: strings after this decode through it
              curFont = fonts.get(lastName); pending.clear()
            case _ => pending.clear() // any other op: strings were operands
          }
        case _ => i += 1
      }
    }
    flushLine()
    sb.toString.strip()
  }

  /** Source text of the balanced `<< … >>` dictionary starting at
    * `start` (which must point at the opening `<<`). */
  private def balancedDictAt(s: String, start: Int): Option[String] = {
    if (start + 1 >= s.length || s.charAt(start) != '<' || s.charAt(start + 1) != '<')
      return None
    var depth = 0; var i = start
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some(s.substring(start, i))
      } else i += 1
    }
    None
  }

  /** Resolved SOURCE of a dict-valued key: inline `<< … >>` is sliced
    * balanced; an `N 0 R` value resolves through the object map. */
  private def dictValueSrc(src: String, key: String,
      objs: Map[Int, PdfObj]): Option[String] = {
    val km = ("/" + key + "(?![A-Za-z0-9])").r.findFirstMatchIn(src)
      .getOrElse(return None)
    val rest = src.substring(km.end)
    val trimmed = rest.indexWhere(!_.isWhitespace) match {
      case -1 => return None
      case p => p
    }
    if (rest.startsWith("<<", trimmed)) balancedDictAt(rest, trimmed)
    else "^(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(rest.substring(trimmed))
      .flatMap(m => objs.get(m.group(1).toInt)).map(_.dict)
  }

  /** ToUnicode font maps of one page: /Resources (own or inherited
    * from the page tree) → /Font → per-name font object → /ToUnicode
    * stream. Fonts without a /ToUnicode decode as identity Latin-1. */
  private def pageFontMaps(resourcesSrc: Option[String],
      objs: Map[Int, PdfObj]): Map[String, FontMap] =
    resourcesSrc.flatMap(dictValueSrc(_, "Font", objs)).map { fdict =>
      "/([A-Za-z0-9.#_+-]+)\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(fdict)
        .flatMap { fm =>
          objs.get(fm.group(2).toInt).flatMap { fo =>
            "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(fo.dict)
              .flatMap(t => objs.get(t.group(1).toInt)).flatMap { tu =>
                // a malformed CMap must not sink the document: fall
                // back to identity decoding for that font only
                try {
                  val data =
                    if (tu.dict.contains("/FlateDecode")) inflate(tu.stream)
                    else tu.stream
                  Some(fm.group(1) -> parseToUnicode(data))
                } catch { case scala.util.control.NonFatal(_) => None }
              }
          }
        }.toMap
    }.getOrElse(Map.empty)

  /** Page texts in page-tree order. Traversal: trailer-less — find the
    * /Catalog object, walk /Pages → /Kids recursively (inner nodes may
    * nest), resolve each page's /Contents ref(s); /Resources inherit
    * down the tree per spec (nearest ancestor wins). Falls back to
    * file-order /Type /Page objects when no catalog resolves. */
  def pdfPages(bytes: Array[Byte]): Seq[String] = {
    val objs = pdfObjects(bytes)
    val PageTypeRe = "/Type\\s*/Page\\b".r
    val KidsRe = "/Kids\\s*\\[([^\\]]*)\\]".r
    def ownResources(dict: String): Option[String] =
      dictValueSrc(dict, "Resources", objs)
    def pageOrder: Seq[(Int, Option[String])] = {
      val catalog = objs.collectFirst {
        case (_, o) if o.dict.contains("/Catalog") =>
          "/Pages\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
      }.flatten
      def walk(num: Int, depth: Int,
          inheritedRes: Option[String]): Seq[(Int, Option[String])] =
        if (depth > 64) Seq.empty
        else objs.get(num).toSeq.flatMap { o =>
          val res = ownResources(o.dict).orElse(inheritedRes)
          if (PageTypeRe.findFirstIn(o.dict).isDefined) Seq((num, res))
          else KidsRe.findFirstMatchIn(o.dict).toSeq.flatMap(k =>
            RefRe.findAllMatchIn(k.group(1)).map(_.group(1).toInt).toSeq
              .flatMap(walk(_, depth + 1, res)))
        }
      val viaTree = catalog.map(walk(_, 0, None)).getOrElse(Seq.empty)
      if (viaTree.nonEmpty) viaTree
      else objs.toSeq.sortBy(_._1).collect {
        case (num, o) if PageTypeRe.findFirstIn(o.dict).isDefined =>
          (num, ownResources(o.dict))
      }
    }
    // pages overwhelmingly INHERIT one /Resources dict (shared subset
    // fonts), so the CMap inflate+parse runs once per distinct
    // resources source, not once per page
    val fontCache = scala.collection.mutable.HashMap.empty[Option[String], Map[String, FontMap]]
    pageOrder.map { case (pnum, res) =>
      val dict = objs(pnum).dict
      val fonts = fontCache.getOrElseUpdate(res, pageFontMaps(res, objs))
      val contentRefs = "/Contents\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(dict)
        .map(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
        .orElse("/Contents\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(dict)
          .map(m => Seq(m.group(1).toInt)))
        .getOrElse(Seq.empty)
      contentRefs.flatMap(objs.get).map { c =>
        val data = if (c.dict.contains("/FlateDecode")) inflate(c.stream) else c.stream
        pdfContentText(data, fonts)
      }.filter(_.nonEmpty).mkString("\n")
    }
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
        else if (lower.endsWith(".pdf"))
          graft.functions.Chunker.pagesToMarkedText(pdfPages(bytes))
        else if (lower.endsWith(".html") || lower.endsWith(".htm")) html(bytes)
        else if (lower.endsWith(".docx")) docx(bytes)
        else if (lower.endsWith(".epub")) epub(bytes)
        else if (lower.endsWith(".eml")) eml(bytes)
        else if (lower.endsWith(".odt")) odt(bytes)
        // .xlsm is the same OOXML zip as .xlsx with a macro part added —
        // the worksheet/sharedStrings layout is identical
        else if (lower.endsWith(".xlsx") || lower.endsWith(".xlsm")) xlsx(bytes)
        else if (lower.endsWith(".xls")) xls(bytes)
        else if (lower.endsWith(".msg")) msg(bytes)
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
