package graft

import graft.ingest.Extractors
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

class ExtractorsSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("docx: paragraphs, tabs, breaks, entities") {
    val xml =
      """<?xml version="1.0"?><w:document xmlns:w="ns">
        |<w:body><w:p><w:r><w:t>Hello</w:t><w:tab/><w:t>World</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Q &amp; A</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin.replaceAll("\n", "")
    val bytes = zip("word/document.xml" -> xml, "[Content_Types].xml" -> "<x/>")
    val out = Extractors.docx(bytes)
    assert(out.contains("Hello\tWorld"))
    assert(out.contains("Q & A\nline two"))
  }

  test("docx without document.xml -> empty; extract filters it") {
    assert(Extractors.docx(zip("other.xml" -> "<x/>")) == "")
    assert(Extractors.extract("f.docx", zip("other.xml" -> "<x/>")).isEmpty)
  }

  test("epub: html entries in archive order, blank-line separated") {
    val bytes = zip(
      "mimetype" -> "application/epub+zip",
      "ch1.xhtml" -> "<html><body><p>Chapter one.</p></body></html>",
      "ch2.xhtml" -> "<html><body><p>Chapter two.</p></body></html>")
    val out = Extractors.epub(bytes)
    assert(out == "Chapter one.\n\nChapter two.")
  }

  test("eml: subject + plain body") {
    val raw = "From: a@b.c\nSubject: Greetings\nContent-Type: text/plain\n\nHi there.\nBye."
    assert(Extractors.eml(raw.getBytes(UTF_8)) == "Greetings\n\nHi there.\nBye.")
  }

  test("eml: multipart prefers text/plain; quoted-printable decoded") {
    val raw =
      """From: a@b.c
        |Subject: Multi
        |Content-Type: multipart/alternative; boundary="BOUND"
        |
        |--BOUND
        |Content-Type: text/plain
        |Content-Transfer-Encoding: quoted-printable
        |
        |caf=C3=A9 time
        |--BOUND
        |Content-Type: text/html
        |
        |<p>caf&eacute; time</p>
        |--BOUND--
        |""".stripMargin
    val out = Extractors.eml(raw.getBytes(UTF_8))
    assert(out.startsWith("Multi"))
    // =C3=A9 decodes byte-wise; the chars Ã© are the utf-8
    // bytes of é seen as latin-1 — presence of "caf" + "time" and no
    // raw =XX escapes is the contract here
    assert(out.contains("caf") && out.contains("time") && !out.contains("=C3"))
  }

  test("eml: base64 body") {
    val b64 = java.util.Base64.getEncoder.encodeToString("secret payload".getBytes(UTF_8))
    val raw = s"Subject: B\nContent-Transfer-Encoding: base64\n\n$b64"
    assert(Extractors.eml(raw.getBytes(UTF_8)) == "B\n\nsecret payload")
  }

  test("odt: paragraphs, headings, tabs, spaces") {
    val xml =
      """<?xml version="1.0"?><office:document-content xmlns:text="ns">
        |<office:body><office:text><text:h>Title</text:h>
        |<text:p>First<text:tab/>tabbed</text:p>
        |<text:p>A<text:s/>B<text:line-break/>C</text:p>
        |</office:text></office:body></office:document-content>""".stripMargin.replaceAll("\n", "")
    val out = Extractors.odt(zip("content.xml" -> xml, "mimetype" -> "odt"))
    assert(out.contains("Title\nFirst\ttabbed"))
    assert(out.contains("A B\nC"))
  }

  test("enex: note titles + ENML bodies, html-stripped") {
    val raw =
      """<?xml version="1.0"?><en-export>
        |<note><title>Note One</title>
        |<content><![CDATA[<en-note><div>Body &amp; text.</div></en-note>]]></content></note>
        |<note><title>Note Two</title>
        |<content><![CDATA[<en-note>Second body.</en-note>]]></content></note>
        |</en-export>""".stripMargin
    val out = Extractors.enex(raw.getBytes(UTF_8))
    assert(out == "Note One\n\nBody & text.\n\nNote Two\n\nSecond body.")
  }

  test("rtf: control words stripped, par/tab/hex decoded, fonttbl dropped") {
    val raw = """{\rtf1\ansi{\fonttbl{\f0 Calibri;}}\f0\fs22 Caf\'e9 text\par second\tab col}"""
    val out = Extractors.rtf(raw.getBytes(UTF_8))
    assert(out.contains("Café text"))
    assert(out.contains("second\tcol"))
    assert(!out.contains("Calibri"))
  }

  test("rtf: \\uN unicode escapes — fallback skipped, \\ucN honored, negatives wrap") {
    // default \uc1: one fallback char after each \uN must be dropped
    val U = "\\u" // built by concat: the Scala lexer would eat literal \-u-digits
    val raw = s"{\\rtf1\\ansi G${U}252 ?nter owes ${U}8364 ?5 and ${U}-10179 ?${U}-8704 ?}"
    val out = Extractors.rtf(raw.getBytes(UTF_8))
    assert(out.contains("Günter"), out)
    assert(out.contains("€"), out)
    // negative params wrap mod 65536: U+D83D U+DE00 is a surrogate pair
    assert(out.contains(new String(Character.toChars(0x1F600))), out)
    // \uc0: no fallback to skip; \uc2 skips two (incl. \'xx escapes)
    val raw2 = s"{\\rtf1\\uc0${U}945 x \\uc2${U}946\\'41\\'42y}"
    val out2 = Extractors.rtf(raw2.getBytes(UTF_8))
    assert(out2.contains("αx") || out2.contains("α x"), out2)
    assert(out2.contains("βy"), out2)
    assert(!out2.contains("AB"), out2)
  }

  test("xlsx: shared + inline + numeric cells, tab rows, sheet order") {
    val sharedXml =
      """<sst><si><t>Name</t></si><si><r><t>Wid</t></r><r><t>get</t></r></si></sst>"""
    val sheet1 =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="inlineStr"><is><t>inline!</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zip(
      "xl/sharedStrings.xml" -> sharedXml,
      "xl/worksheets/sheet1.xml" -> sheet1)
    val out = Extractors.xlsx(bytes)
    assert(out == "Name\t42\nWidget\tinline!")
  }

  import PdfFixture.mkPdf

  test("pdf: flate + raw streams, escapes, hex strings, TJ arrays, line moves") {
    val p1 = "BT /F1 12 Tf 72 720 Td (Hello) Tj ( ) Tj (World \\(nested\\) \\101B) Tj " +
      "0 -14 Td [(arr) -250 (ay)] TJ ET"
    val p2 = "BT 72 720 Td <48 65 6C 6C 6F 21> Tj ET"
    val bytes = mkPdf((p1, true), (p2, false))
    val pages = Extractors.pdfPages(bytes)
    assert(pages.size == 2)
    assert(pages(0) == "Hello World (nested) AB\narray")
    assert(pages(1) == "Hello!")
  }

  test("pdf: extract dispatch emits page markers for the chunker") {
    val bytes = mkPdf(("BT (First page.) Tj ET", true), ("BT (Second page.) Tj ET", true))
    val out = Extractors.extract("doc.pdf", bytes)
    assert(out.contains("[[page1]]First page.[[page2]]Second page."))
    assert(Extractors.isPdfLike("doc.pdf"))
    assert(Extractors.supportedExtensions.contains(".pdf"))
  }

  test("pdf: 1.5 object-stream file (xref stream, packed page tree) extracts all pages") {
    val bytes = PdfFixture.mkPdfObjStm(
      ("BT (Packed page one.) Tj ET", true),
      ("BT (Packed page two.) Tj ET", false))
    val pages = Extractors.pdfPages(bytes)
    assert(pages == Seq("Packed page one.", "Packed page two."))
    assert(Extractors.extract("m.pdf", bytes)
      .contains("[[page1]]Packed page one.[[page2]]Packed page two."))
    // a corrupt ObjStm payload must not take down the whole file: the
    // content objects are still directly visible via the page fallback
    val corrupted = bytes.clone()
    val probe = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val streamAt = probe.indexOf("stream\n") + "stream\n".length
    (streamAt until streamAt + 8).foreach(i => corrupted(i) = 0x7F)
    assert(Extractors.pdfPages(corrupted).isEmpty) // no page dicts resolvable
  }

  test("pdf: subset-font ToUnicode CMap — bfchar, bfrange scalar + array, inherited ref resources") {
    // Glyph codes are ARBITRARY (what an embedded-subset writer emits);
    // only the CMap gives them meaning. Exercises: multi-unit bfchar
    // destination (ligature ffi), non-ASCII bfchar (é), scalar bfrange
    // (0010..0019 → a..j), array bfrange (0020/0021 → X/Y), unmapped
    // code (0099 → dropped), hex whitespace, TJ arrays, Tf re-select.
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <0053>
        |<0002> <006600660069>
        |<0003> <00E9>
        |endbfchar
        |2 beginbfrange
        |<0010> <0019> <0061>
        |<0020> <0021> [<0058> <0059>]
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end end""".stripMargin
    val content = "BT /F1 12 Tf <000100020003> Tj 0 -14 Td " +
      "[<0010 0011> -120 <0020> <0099>] TJ ET"
    val bytes = PdfFixture.mkPdfType0(content, cmap)
    assert(Extractors.pdfPages(bytes) == Seq("Sffié\nabX"))
    assert(Extractors.extract("sub.pdf", bytes).contains("[[page1]]Sffié\nabX"))
    // corrupting the CMap stream must degrade to identity decoding of
    // that font, never sink the document
    val corrupted = bytes.clone()
    val probe = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val cmapAt = probe.indexOf("stream\n", probe.indexOf("8 0 obj")) + "stream\n".length
    (cmapAt until cmapAt + 4).foreach(i => corrupted(i) = 0x7F)
    assert(Extractors.pdfPages(corrupted).nonEmpty) // no throw, page present
  }

  test("pdf: blank pages skipped by markers; empty pdf -> None") {
    val bytes = mkPdf(("BT (Visible.) Tj ET", false), ("BT ( ) Tj ET", false))
    // pagesToMarkedText skips blank page texts, 1-based numbering kept
    assert(Extractors.extract("d.pdf", bytes).contains("[[page1]]Visible."))
    assert(Extractors.extract("e.pdf", "%PDF-1.4\n%%EOF".getBytes(UTF_8)).isEmpty)
    assert(Extractors.extract("f.pdf", Array[Byte](1, 2, 3)).isEmpty)
  }

  test("msg: OLE2 property streams -> subject + body; big bodies via main FAT") {
    val small = Ole2Fixture.msgFile("Quarterly report", "Body line one.\nLine two.")
    assert(Extractors.msg(small) == "Quarterly report\n\nBody line one.\nLine two.")
    assert(Extractors.extract("m.msg", small).contains("Quarterly report\n\nBody line one.\nLine two."))
    // a >4096-byte body lands in regular FAT sectors, not the ministream
    val longBody = "lorem ipsum " * 500
    val big = Ole2Fixture.msgFile("Big", longBody)
    assert(Extractors.msg(big) == "Big\n\n" + longBody.strip)
    // not an OLE2 container -> extract None
    assert(Extractors.extract("m.msg", Array[Byte](1, 2, 3)).isEmpty)
  }

  test("msg: nested attachment — storage-scoped props, no decoy leak, one-level recurse") {
    val bytes = Ole2Fixture.msgFileNested(
      "Outer subject", "Outer body.",
      "fwd.msg", "Inner subject", "Inner body.")
    val out = Extractors.msg(bytes)
    // the message's own subject/body come first and are NOT the
    // attachment's (path-scoped matching, not first-stream-wins)
    assert(out.startsWith("Outer subject\n\nOuter body."), out)
    assert(out.contains("[attachment] fwd.msg"), out)
    assert(out.contains("Inner subject\n\nInner body."), out)
    assert(out.indexOf("Inner subject") > out.indexOf("Outer body."), out)
    // path-aware walk exposes the storage hierarchy
    val paths = graft.ingest.Ole2.streamsWithPath(bytes).map(_._1)
    assert(paths.contains("__substg1.0_0037001F"))
    assert(paths.contains(
      "__attach_version1.0_#00000000/__substg1.0_3701000D/__substg1.0_0037001F"))
  }

  test("xls: BIFF8 SST/LABELSST/NUMBER/RK/MULRK cells, sheet rows") {
    val out = Extractors.xls(Ole2Fixture.xlsFile())
    assert(out == "Name\t42\n7\t1.5\t1.5\nWídget\t-1\t-2.5")
    assert(Extractors.extract("wb.xls", Ole2Fixture.xlsFile()).exists(_.contains("Wídget")))
    assert(Extractors.supportedExtensions.contains(".xls"))
    assert(Extractors.supportedExtensions.contains(".msg"))
  }

  test("pdf: property — random page texts round-trip through build + parse") {
    val rnd = new scala.util.Random(42) // deterministic
    val alphabet = "abcdefghijklmnopqrstuvwxyz ()\\%<>[]0123456789.,"
    (1 to 25).foreach { trial =>
      val nPages = 1 + rnd.nextInt(4)
      val pages = (1 to nPages).map { _ =>
        val lines = (1 to 1 + rnd.nextInt(3)).map { _ =>
          val len = 1 + rnd.nextInt(40)
          // strip() both here and in the parser: leading/trailing spaces
          // inside a shown string are not recoverable from layout alone
          (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
            .strip().replaceAll(" +", " ")
        }.filter(_.nonEmpty)
        (lines, rnd.nextBoolean())
      }.filter(_._1.nonEmpty)
      if (pages.nonEmpty) {
        val bytes = PdfFixture.mkPdf(pages.map { case (lines, compress) =>
          (PdfFixture.pageSource(lines: _*), compress)
        }: _*)
        val got = Extractors.pdfPages(bytes)
        val expected = pages.map(_._1.mkString("\n"))
        assert(got == expected, s"trial $trial: $got != $expected")
      }
    }
  }

  test("xlsm dispatches through the xlsx path") {
    val bytes = zip(
      "xl/sharedStrings.xml" -> "<sst><si><t>Macro</t></si></sst>",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>""",
      "xl/vbaProject.bin" -> "binary macro blob")
    assert(Extractors.extract("wb.xlsm", bytes).contains("Macro"))
    assert(Extractors.supportedExtensions.contains(".xlsm"))
  }

  test("embedder query prompts follow the reference family table") {
    import graft.embed.Embedder
    assert(Embedder.queryPromptFor("BAAI/bge-small-en-v1.5") ==
      "Represent this sentence for searching relevant passages: ")
    assert(Embedder.queryPromptFor("Qwen/Qwen3-Embedding-0.6B").startsWith("Instruct:"))
    assert(Embedder.queryPromptFor("sentence-transformers/all-MiniLM-L6-v2") == "")
  }

  test("extract dispatch covers the new formats and failure -> None") {
    assert(Extractors.extract("x.docx", Array[Byte](1, 2, 3)).isEmpty) // not a zip
    assert(Extractors.extract("x.eml", "Subject: s\n\nbody".getBytes(UTF_8)).contains("s\n\nbody"))
    assert(Extractors.supportedExtensions.contains(".docx"))
    assert(Extractors.supportedExtensions.contains(".epub"))
    assert(Extractors.supportedExtensions.contains(".eml"))
  }
}
