package graft

import java.io.ByteArrayOutputStream

/** Builds small structurally valid PDFs (header, page tree, content
  * streams, xref table, trailer) for extractor and end-to-end specs. */
object PdfFixture {

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** `pages` = (content-stream source, flate-compress?). Object layout:
    * catalog(1) → pages(2) → per-page page+content objects. */
  def mkPdf(pages: (String, Boolean)*): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size(); w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val kidRefs = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w(s"<< /Type /Pages /Kids [$kidRefs] /Count ${pages.size} >>\n"))
    pages.zipWithIndex.foreach { case ((src, compress), i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      obj(pageNum)(w(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $contNum 0 R >>\n"))
      val data = if (compress) deflate(src.getBytes(iso)) else src.getBytes(iso)
      obj(contNum) {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  /** PDF 1.5 shape: catalog + page tree + page dicts packed into ONE
    * Flate /Type /ObjStm container, content streams as regular
    * objects, cross-reference via an xref STREAM (not a table) — the
    * layout modern writers emit. The xref-stream object is a real
    * /Type /XRef dict with a syntactically valid (if minimal) payload;
    * the extractor never reads it, but its presence keeps the fixture
    * honest about the file shape. */
  def mkPdfObjStm(pages: (String, Boolean)*): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    w("%PDF-1.5\n")
    // packed objects: 1=catalog, 2=pages, 3..=page dicts
    val kidRefs = pages.indices.map(i => s"${3 + i} 0 R").mkString(" ")
    val packed: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kidRefs] /Count ${pages.size} >>") ++
      pages.indices.map(i => (3 + i) ->
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${100 + i} 0 R >>")
    val bodies = packed.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init
    val header = packed.zip(offs).map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = deflate((header + bodies.mkString).getBytes(iso))
    w(s"50 0 obj\n<< /Type /ObjStm /N ${packed.size} /First ${header.length} " +
      s"/Filter /FlateDecode /Length ${payload.length} >>\nstream\n")
    out.write(payload)
    w("\nendstream\nendobj\n")
    pages.zipWithIndex.foreach { case ((src, compress), i) =>
      val data = if (compress) deflate(src.getBytes(iso)) else src.getBytes(iso)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"${100 + i} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val xrefAt = out.size()
    val xrefPayload = deflate(Array[Byte](0, 0, 0)) // minimal single-row payload
    w(s"60 0 obj\n<< /Type /XRef /Size 61 /W [1 1 1] /Root 1 0 R " +
      s"/Filter /FlateDecode /Length ${xrefPayload.length} >>\nstream\n")
    out.write(xrefPayload)
    w(s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  /** A simple text-showing content stream for `lines` on one page. */
  def pageSource(lines: String*): String =
    "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"(${l.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")}) Tj")
        .mkString(" 0 -14 Td ") + " ET"

  /** Single-page PDF with an embedded-subset composite font: the page
    * INHERITS /Resources from the Pages node (spec inheritance), the
    * resources dict is a REF, and /F1 is a /Type0 font whose
    * /ToUnicode CMap stream (Flate) is `cmap`. `content` shows glyph
    * CODES (hex strings), so extraction only round-trips through the
    * CMap — the embedded-subset-font shape real-world writers emit. */
  def mkPdfType0(content: String, cmap: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size(); w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources 6 0 R >>\n"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\n"))
    val data = content.getBytes(iso)
    obj(4) {
      w(s"<< /Length ${data.length} >>\nstream\n"); out.write(data); w("\nendstream\n")
    }
    obj(6)(w("<< /Font << /F1 7 0 R >> >>\n"))
    obj(7)(w("<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+FakeSubset " +
      "/Encoding /Identity-H /ToUnicode 8 0 R >>\n"))
    val cmapData = deflate(cmap.getBytes(iso))
    obj(8) {
      w(s"<< /Length ${cmapData.length} /Filter /FlateDecode >>\nstream\n")
      out.write(cmapData); w("\nendstream\n")
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }
}
