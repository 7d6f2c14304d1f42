package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_16LE

/** Builds small structurally valid OLE2/CFBF compound files (512-byte
  * sectors, mini stream for sub-4096 streams, FAT/miniFAT/DIFAT header)
  * plus `.msg` and BIFF8 `.xls` payloads for extractor specs. */
object Ole2Fixture {

  private val Free = 0xFFFFFFFF
  private val EndChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  /** Directory tree node: stream names may be '/'-separated paths —
    * intermediate segments become storage (typ 1) entries, and the
    * writer emits real child/right-sibling DID pointers (left always
    * Free: a degenerate right-leaning sibling chain, valid for any
    * tree-walking reader). */
  private class TNode(val name: String, val typ: Int, var streamIdx: Int = -1) {
    val children = scala.collection.mutable.ListBuffer.empty[TNode]
  }

  def cfbf(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val sectorSize = 512
    val miniSize = 64
    val cutoff = 4096
    val (miniStreams, bigStreams) = streams.partition(_._2.length < cutoff)

    // ministream: each small stream padded to 64-byte mini sectors
    val miniData = new java.io.ByteArrayOutputStream()
    val miniStarts = miniStreams.map { case (_, data) =>
      val start = miniData.size() / miniSize
      miniData.write(data)
      val pad = (miniSize - miniData.size() % miniSize) % miniSize
      miniData.write(new Array[Byte](pad))
      start
    }
    val nMiniSectors = miniData.size() / miniSize
    val miniFatEntries = Array.fill(nMiniSectors)(Free)
    miniStreams.zip(miniStarts).foreach { case ((_, data), start) =>
      val n = math.max(1, (data.length + miniSize - 1) / miniSize)
      (0 until n - 1).foreach(k => miniFatEntries(start + k) = start + k + 1)
      if (data.length > 0) miniFatEntries(start + n - 1) = EndChain
    }

    // directory tree: '/'-separated stream paths imply storage entries
    val rootNode = new TNode("Root Entry", 5)
    streams.zipWithIndex.foreach { case ((path, _), idx) =>
      val parts = path.split('/')
      var cur = rootNode
      parts.init.foreach { st =>
        cur = cur.children.find(c => c.name == st && c.typ == 1).getOrElse {
          val n = new TNode(st, 1); cur.children += n; n
        }
      }
      cur.children += new TNode(parts.last, 2, idx)
    }
    val order = scala.collection.mutable.ArrayBuffer[TNode]()
    def dfs(n: TNode): Unit = { order += n; n.children.foreach(dfs) }
    dfs(rootNode)
    val did: collection.Map[TNode, Int] =
      scala.collection.mutable.LinkedHashMap(order.zipWithIndex.toSeq: _*)
    val rightOf = scala.collection.mutable.Map.empty[TNode, Int]
    order.foreach { n =>
      n.children.toSeq.sliding(2).foreach {
        case Seq(a, b) => rightOf(a) = did(b)
        case _ =>
      }
    }
    val nDirEntries = order.size
    val nDirSectors = math.max(1, (nDirEntries * 128 + sectorSize - 1) / sectorSize)
    val nMiniFatSectors = (nMiniSectors * 4 + sectorSize - 1) / sectorSize
    val nMiniStreamSectors = (miniData.size() + sectorSize - 1) / sectorSize
    val bigSectorCounts = bigStreams.map { case (_, d) => (d.length + sectorSize - 1) / sectorSize }

    // sector plan: [0]=FAT, dir, miniFAT, ministream, big streams
    val dirStart = 1
    val miniFatStart = dirStart + nDirSectors
    val miniStreamStart = miniFatStart + nMiniFatSectors
    val bigStart = miniStreamStart + nMiniStreamSectors
    val totalSectors = bigStart + bigSectorCounts.sum
    require(totalSectors <= sectorSize / 4, s"fixture too large: $totalSectors sectors")

    val fat = Array.fill(sectorSize / 4)(Free)
    fat(0) = FatSect
    def chain(start: Int, n: Int): Unit = if (n > 0) {
      (0 until n - 1).foreach(k => fat(start + k) = start + k + 1)
      fat(start + n - 1) = EndChain
    }
    chain(dirStart, nDirSectors)
    chain(miniFatStart, nMiniFatSectors)
    chain(miniStreamStart, nMiniStreamSectors)
    var cursor = bigStart
    val bigStarts = bigSectorCounts.map { n => val s = cursor; chain(s, n); cursor += n; s }

    val out = ByteBuffer.allocate((totalSectors + 1) * sectorSize).order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(graft.ingest.Ole2.Signature)
    out.putShort(24, 0x003E.toShort); out.putShort(26, 0x0003.toShort) // versions
    out.putShort(28, 0xFFFE.toShort) // little-endian marker
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort) // sector shifts
    out.putInt(44, 1) // one FAT sector
    out.putInt(48, dirStart)
    out.putInt(56, cutoff)
    out.putInt(60, if (nMiniFatSectors > 0) miniFatStart else EndChain)
    out.putInt(64, nMiniFatSectors)
    out.putInt(68, EndChain); out.putInt(72, 0) // no chained DIFAT
    out.putInt(76, 0) // DIFAT[0] → FAT at sector 0
    (1 until 109).foreach(i => out.putInt(76 + i * 4, Free))

    def sectorOffset(id: Int) = (id + 1) * sectorSize
    // FAT sector
    fat.zipWithIndex.foreach { case (v, i) => out.putInt(sectorOffset(0) + i * 4, v) }
    // directory
    def dirEntry(idx: Int, name: String, typ: Int, start: Int, size: Int,
        left: Int, right: Int, child: Int): Unit = {
      val base = sectorOffset(dirStart) + idx * 128
      val nameBytes = name.getBytes(UTF_16LE)
      out.position(base); out.put(nameBytes, 0, math.min(nameBytes.length, 62))
      out.putShort(base + 64, (math.min(nameBytes.length, 62) + 2).toShort)
      out.put(base + 66, typ.toByte); out.put(base + 67, 1.toByte)
      out.putInt(base + 68, left); out.putInt(base + 72, right); out.putInt(base + 76, child)
      out.putInt(base + 116, start); out.putInt(base + 120, size)
    }
    // leaf data placement follows INPUT order (mini/big partitions)
    val miniIdxs = streams.zipWithIndex.collect { case ((_, d), i) if d.length < cutoff => i }
    val bigIdxs = streams.zipWithIndex.collect { case ((_, d), i) if d.length >= cutoff => i }
    val startByIdx: Map[Int, Int] =
      (miniIdxs.zip(miniStarts) ++ bigIdxs.zip(bigStarts)).toMap
    order.zipWithIndex.foreach { case (n, idx) =>
      val childDid = n.children.headOption.map(did).getOrElse(Free)
      val right = rightOf.getOrElse(n, Free)
      n.typ match {
        case 5 => dirEntry(idx, n.name, 5,
          if (nMiniStreamSectors > 0) miniStreamStart else EndChain, miniData.size(),
          Free, Free, childDid)
        case 1 => dirEntry(idx, n.name, 1, 0, 0, Free, right, childDid)
        case _ =>
          val data = streams(n.streamIdx)._2
          dirEntry(idx, n.name, 2, startByIdx(n.streamIdx), data.length, Free, right, Free)
      }
    }
    // miniFAT
    miniFatEntries.zipWithIndex.foreach { case (v, i) =>
      out.putInt(sectorOffset(miniFatStart) + i * 4, v)
    }
    // ministream + big streams
    out.position(sectorOffset(miniStreamStart)); out.put(miniData.toByteArray)
    bigStreams.zip(bigStarts).foreach { case ((_, data), s) =>
      out.position(sectorOffset(s)); out.put(data)
    }
    out.array()
  }

  def msgFile(subject: String, body: String): Array[Byte] =
    cfbf(Seq(
      "__substg1.0_0037001F" -> subject.getBytes(UTF_16LE),
      "__substg1.0_1000001F" -> body.getBytes(UTF_16LE)))

  /** A `.msg` with one attachment storage holding a display name and a
    * nested embedded message (its own subject + body streams) — the
    * MS-OXMSG attached-message shape. */
  def msgFileNested(subject: String, body: String, attachName: String,
      nestedSubject: String, nestedBody: String): Array[Byte] = {
    val at = "__attach_version1.0_#00000000"
    cfbf(Seq(
      "__substg1.0_0037001F" -> subject.getBytes(UTF_16LE),
      "__substg1.0_1000001F" -> body.getBytes(UTF_16LE),
      s"$at/__substg1.0_3001001F" -> attachName.getBytes(UTF_16LE),
      s"$at/__substg1.0_3701000D/__substg1.0_0037001F" -> nestedSubject.getBytes(UTF_16LE),
      s"$at/__substg1.0_3701000D/__substg1.0_1000001F" -> nestedBody.getBytes(UTF_16LE)))
  }

  // ---- BIFF8 records for the .xls fixture ----

  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(typ.toShort).putShort(payload.length.toShort).put(payload)
    b.array()
  }
  private def u16(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putShort(v.toShort)); b.array()
  }

  /** Workbook: globals(SST: "Name" compressed, "Wídget" UTF-16) + one
    * sheet with LABELSST, NUMBER, RK(int), MULRK(two floats), LABELSST. */
  def xlsFile(): Array[Byte] = {
    val le = ByteOrder.LITTLE_ENDIAN
    val sstPayload = {
      val s1 = "Name".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val s2 = "Wídget".getBytes(UTF_16LE)
      val b = ByteBuffer.allocate(8 + 3 + s1.length + 3 + s2.length).order(le)
      b.putInt(2).putInt(2) // cstTotal, cstUnique
      b.putShort(4.toShort).put(0.toByte).put(s1) // compressed
      b.putShort(6.toShort).put(1.toByte).put(s2) // fHighByte
      b.array()
    }
    val number = {
      val b = ByteBuffer.allocate(14).order(le)
      b.putShort(0.toShort).putShort(1.toShort).putShort(0.toShort).putDouble(42.0)
      b.array()
    }
    val rkInt = { // row 1 col 0: integer 7 → rk = (7 << 2) | 2
      val b = ByteBuffer.allocate(10).order(le)
      b.putShort(1.toShort).putShort(0.toShort).putShort(0.toShort).putInt((7 << 2) | 2)
      b.array()
    }
    val mulrk = { // row 1 cols 1-2: 1.5 twice (float rk = top 30 bits of f64)
      val rk15 = ((java.lang.Double.doubleToLongBits(1.5) >> 32) & 0xFFFFFFFCL).toInt
      val b = ByteBuffer.allocate(18).order(le)
      b.putShort(1.toShort).putShort(1.toShort)
      b.putShort(0.toShort).putInt(rk15); b.putShort(0.toShort).putInt(rk15)
      b.putShort(2.toShort)
      b.array()
    }
    val labelSst0 = {
      val b = ByteBuffer.allocate(10).order(le)
      b.putShort(0.toShort).putShort(0.toShort).putShort(0.toShort).putInt(0)
      b.array()
    }
    val labelSst1 = {
      val b = ByteBuffer.allocate(10).order(le)
      b.putShort(2.toShort).putShort(0.toShort).putShort(0.toShort).putInt(1)
      b.array()
    }
    val rkNeg = { // row 2 col 1: integer -1 → rk = 0xFFFFFFFE (sign bit set)
      val b = ByteBuffer.allocate(10).order(le)
      b.putShort(2.toShort).putShort(1.toShort).putShort(0.toShort).putInt((-1 << 2) | 2)
      b.array()
    }
    val rkNegDiv = { // row 2 col 2: -250 with div-100 flag → -2.5
      val b = ByteBuffer.allocate(10).order(le)
      b.putShort(2.toShort).putShort(2.toShort).putShort(0.toShort).putInt((-250 << 2) | 3)
      b.array()
    }
    val biff =
      rec(0x0809, u16(0x0600, 0x0005, 0, 0)) ++ // BOF globals
        rec(0x00FC, sstPayload) ++
        rec(0x000A, Array.emptyByteArray) ++ // EOF globals
        rec(0x0809, u16(0x0600, 0x0010, 0, 0)) ++ // BOF worksheet
        rec(0x00FD, labelSst0) ++ rec(0x0203, number) ++
        rec(0x027E, rkInt) ++ rec(0x00BD, mulrk) ++ rec(0x00FD, labelSst1) ++
        rec(0x027E, rkNeg) ++ rec(0x027E, rkNegDiv) ++
        rec(0x000A, Array.emptyByteArray)
    cfbf(Seq("Workbook" -> biff))
  }
}
