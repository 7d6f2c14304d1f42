package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal OLE2 / Compound File Binary (CFBF, MS-CFB) reader — the
  * container format of legacy Office files (`.xls`, `.msg`, `.doc`).
  * Pure JVM: header → DIFAT → FAT chains → directory entries → stream
  * bytes, including the mini-stream (streams under the 4096-byte
  * cutoff live in 64-byte mini sectors addressed by the mini FAT
  * inside the root entry's stream).
  *
  * Scope: read-only, version 3 and 4 sector sizes, chained DIFAT
  * supported. [[streamsWithPath]] preserves storage nesting as
  * '/'-joined paths via the directory red-black tree (left/right
  * sibling + child DIDs, cycle-guarded) — required to tell a `.msg`
  * message's own property streams from those of a nested attachment;
  * [[streams]] is the flat leaf-name view. */
object Ole2 {

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  val Signature: Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(Signature)

  /** Every stream entry in the compound file as (leaf name, bytes). */
  def streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    streamsWithPath(bytes).map { case (p, d) =>
      (p.substring(p.lastIndexOf('/') + 1), d)
    }

  /** Every stream entry as ("storage/…/stream" path, bytes), walking
    * the directory tree from the root entry's child. Files whose
    * sibling/child pointers are absent (some synthetic writers leave
    * them Free) fall back to the flat entry scan with bare names. */
  def streamsWithPath(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(isOle2(bytes), "not an OLE2 compound file")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sectorShift = buf.getShort(30).toInt
    val miniShift = buf.getShort(32).toInt
    val sectorSize = 1 << sectorShift
    val miniSize = 1 << miniShift
    val numFat = buf.getInt(44)
    val dirStart = buf.getInt(48).toLong & 0xFFFFFFFFL
    val miniCutoff = buf.getInt(56)
    val miniFatStart = buf.getInt(60).toLong & 0xFFFFFFFFL
    val difatStart = buf.getInt(68).toLong & 0xFFFFFFFFL
    val numDifat = buf.getInt(72)

    def sectorOffset(sector: Long): Int = ((sector + 1) << sectorShift).toInt

    // DIFAT: 109 header entries + chained DIFAT sectors (each holds
    // sectorSize/4 - 1 FAT sector ids + a next-DIFAT pointer)
    val fatSectors = Seq.newBuilder[Long]
    var taken = 0
    var i = 0
    while (i < 109 && taken < numFat) {
      val v = buf.getInt(76 + i * 4).toLong & 0xFFFFFFFFL
      if (v != FreeSect) { fatSectors += v; taken += 1 }
      i += 1
    }
    var difatSector = difatStart
    var difatCount = 0
    while (difatSector != EndOfChain && difatSector != FreeSect && difatCount < numDifat) {
      val base = sectorOffset(difatSector)
      val perSector = sectorSize / 4 - 1
      var j = 0
      while (j < perSector && taken < numFat) {
        val v = buf.getInt(base + j * 4).toLong & 0xFFFFFFFFL
        if (v != FreeSect) { fatSectors += v; taken += 1 }
        j += 1
      }
      difatSector = buf.getInt(base + perSector * 4).toLong & 0xFFFFFFFFL
      difatCount += 1
    }

    // FAT: flat array of next-sector pointers
    val fat = fatSectors.result().flatMap { fs =>
      val base = sectorOffset(fs)
      (0 until sectorSize / 4).map(j => buf.getInt(base + j * 4).toLong & 0xFFFFFFFFL)
    }.toArray

    def chain(start: Long, maxSteps: Int = 1 << 22): Seq[Long] = {
      val out = Seq.newBuilder[Long]
      var cur = start
      var steps = 0
      while (cur != EndOfChain && cur != FreeSect && cur < fat.length && steps < maxSteps) {
        out += cur
        cur = fat(cur.toInt)
        steps += 1
      }
      out.result()
    }

    def readChain(start: Long, size: Long): Array[Byte] = {
      val secs = chain(start)
      // size the buffer from the actual chain length, not the caller's
      // declared size — directory/miniFAT reads pass a huge sentinel size
      val cap = math.min(math.min(size, secs.length.toLong * sectorSize),
        Int.MaxValue.toLong).toInt
      val out = new java.io.ByteArrayOutputStream(math.max(cap, 16))
      secs.foreach { s =>
        val off = sectorOffset(s)
        val n = math.min(sectorSize.toLong, bytes.length.toLong - off).toInt
        if (n > 0) out.write(bytes, off, n)
      }
      out.toByteArray.take(math.min(size, Int.MaxValue.toLong).toInt)
    }

    // Directory entries: 128 bytes each across the directory chain.
    // DIDs (did/left/right/child) index this table; left/right chain
    // same-level siblings (a binary search tree), child descends into
    // a storage.
    val dirBytes = readChain(dirStart, Long.MaxValue >> 1)
    case class Entry(did: Int, name: String, typ: Int, start: Long, size: Long,
      left: Long, right: Long, child: Long)
    val entries = (0 until dirBytes.length / 128).flatMap { k =>
      val e = ByteBuffer.wrap(dirBytes, k * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = e.getShort(k * 128 + 64).toInt
      if (nameLen < 2 || nameLen > 64) None
      else {
        val name = new String(dirBytes, k * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        val typ = dirBytes(k * 128 + 66).toInt & 0xFF
        val start = e.getInt(k * 128 + 116).toLong & 0xFFFFFFFFL
        val size = e.getInt(k * 128 + 120).toLong & 0xFFFFFFFFL
        val left = e.getInt(k * 128 + 68).toLong & 0xFFFFFFFFL
        val right = e.getInt(k * 128 + 72).toLong & 0xFFFFFFFFL
        val child = e.getInt(k * 128 + 76).toLong & 0xFFFFFFFFL
        Some(Entry(k, name, typ, start, size, left, right, child))
      }
    }

    // Mini stream: the root entry's regular chain; mini FAT maps
    // 64-byte mini sectors within it
    val root = entries.find(_.typ == 5)
    val miniStream = root.map(r => readChain(r.start, r.size)).getOrElse(Array.emptyByteArray)
    val miniFat: Array[Long] = {
      val mfBytes = readChain(miniFatStart, Long.MaxValue >> 1)
      (0 until mfBytes.length / 4).map { j =>
        ByteBuffer.wrap(mfBytes, j * 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
      }.toArray
    }
    def readMiniChain(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.min(size, 1 << 22).toInt)
      var cur = start
      var steps = 0
      while (cur != EndOfChain && cur != FreeSect && cur < miniFat.length && steps < (1 << 22)) {
        val off = (cur << miniShift).toInt
        val n = math.min(miniSize.toLong, miniStream.length.toLong - off).toInt
        if (n > 0) out.write(miniStream, off, n)
        cur = miniFat(cur.toInt)
        steps += 1
      }
      out.toByteArray.take(math.min(size, Int.MaxValue.toLong).toInt)
    }

    def dataOf(e: Entry): Array[Byte] =
      if (e.size < miniCutoff && root.isDefined) readMiniChain(e.start, e.size)
      else readChain(e.start, e.size)

    // Path-aware walk: in-order over each sibling tree, descend at
    // storages. Shared visited set + depth cap guard malformed files
    // (pointer cycles would otherwise loop; dids are table indices).
    val emap = entries.map(e => e.did -> e).toMap
    val visited = scala.collection.mutable.Set.empty[Int]
    def subtree(did: Long, prefix: String, depth: Int): Seq[(String, Entry)] =
      if (did == EndOfChain || did == FreeSect || did > Int.MaxValue ||
          depth > 256 || !visited.add(did.toInt)) Seq.empty
      else emap.get(did.toInt).toSeq.flatMap { e =>
        val self =
          if (e.typ == 2) Seq((prefix + e.name, e))
          else if (e.typ == 1) subtree(e.child, prefix + e.name + "/", depth + 1)
          else Seq.empty
        subtree(e.left, prefix, depth + 1) ++ self ++ subtree(e.right, prefix, depth + 1)
      }
    val walked = root.toSeq.flatMap(r => subtree(r.child, "", 0))
    val found =
      if (walked.nonEmpty) walked
      // fallback: writers that leave tree pointers Free — flat scan
      else entries.collect { case e if e.typ == 2 => (e.name, e) }
    found.map { case (path, e) => (path, dataOf(e)) }
  }
}
