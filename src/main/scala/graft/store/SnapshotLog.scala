package graft.store

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Versioned snapshots for a parquet corpus table — the
  * reproducibility primitive of a training-data pipeline: a training
  * run PINS a snapshot version while re-crawls keep appending, and a
  * bad batch rolls back without rewriting data.
  *
  * The lakehouse-table shape in miniature (immutable data files + a
  * metadata log; cf. the published Iceberg/Delta designs):
  *
  *   tableDir/
  *     data/part-<uuid>.parquet     immutable — written once, never edited
  *     _versions/v00000042.json     snapshot = explicit data-file list
  *                                  + op metadata (op, parent, count)
  *
  * Why a file list and not "the directory": at 100 TB, append and
  * upsert must be METADATA operations. Appending a crawl batch writes
  * only the new files and one JSON entry; readers of version N never
  * see half-written batches (the version file is tmp+atomic-move, and
  * data files are invisible until referenced). Time-travel is "read
  * the old list"; rollback is "write a new version pointing at an old
  * list" (never deleting — audit stays intact); vacuum deletes files
  * unreferenced by ANY retained version only.
  *
  * Upsert rewrites only the files that CONTAIN replaced keys (file
  * pruning via per-file key scan — the slot where parquet footer
  * min/max stats prune without reading data at scale); untouched files
  * carry over to the new version by reference.
  *
  * Single-writer discipline (one pipeline owns a table; Spark jobs
  * coordinate through the driver). Readers are lock-free and always
  * consistent: a version file is either fully present or absent.
  */
object SnapshotLog {

  private val mapper = new ObjectMapper()

  final case class Snapshot(version: Long, parent: Long, op: String,
      files: Seq[String], rowCount: Long, streamBatchId: Long = -1L)

  private def versionsDir(tableDir: String): Path = Paths.get(tableDir, "_versions")
  private def dataDir(tableDir: String): Path = Paths.get(tableDir, "data")
  private def statsDir(tableDir: String): Path = Paths.get(tableDir, "_filestats")
  private def versionPath(tableDir: String, v: Long): Path =
    versionsDir(tableDir).resolve(f"v$v%08d.json")

  private def listDir(d: Path): Seq[Path] = {
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala.toList finally s.close()
  }

  /** All committed versions, ascending. */
  def versions(tableDir: String): Seq[Long] =
    listDir(versionsDir(tableDir))
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{8}\\.json") => s.substring(1, 9).toLong }
      .sorted

  def currentVersion(tableDir: String): Option[Long] = versions(tableDir).lastOption

  def readSnapshotMeta(tableDir: String, v: Long): Snapshot = {
    val node = mapper.readTree(Files.readAllBytes(versionPath(tableDir, v)))
    Snapshot(
      version = node.get("version").asLong(),
      parent = node.get("parent").asLong(),
      op = node.get("op").asText(),
      files = node.get("files").elements().asScala.map(_.asText()).toSeq,
      rowCount = node.get("row_count").asLong(),
      streamBatchId = node.path("stream_batch_id").asLong(-1L))
  }

  private[graft] def writeSnapshotMeta(tableDir: String, s: Snapshot): Unit = {
    Files.createDirectories(versionsDir(tableDir))
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("parent", s.parent)
    root.put("op", s.op)
    root.put("row_count", s.rowCount)
    root.put("stream_batch_id", s.streamBatchId)
    // running fence = max stream batch id over the whole chain, carried
    // forward so the HEAD alone answers maxStreamBatchId in O(1) — a
    // per-commit fold over every version's JSON would make a long-lived
    // stream's commit latency O(history). Legacy metas without the
    // field fall back to the fold once; their successors then carry it.
    root.put("fence", math.max(s.streamBatchId,
      if (s.parent >= 0) fenceOf(tableDir, s.parent) else -1L))
    val arr = root.putArray("files")
    s.files.sorted.foreach(arr.add)
    // tmp name is unique PER WRITER: with a shared `.vN.json.tmp`, two
    // racers targeting the same version overwrite each other's staged
    // bytes and the createLink winner can publish the LOSER's content —
    // a lost update the version race itself would never catch.
    val tmp = versionsDir(tableDir).resolve(
      s".v${s.version}-${java.util.UUID.randomUUID().toString.take(8)}.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
      .getBytes(StandardCharsets.UTF_8))
    // commit = hard-link the tmp file to the version name: createLink
    // is ATOMICALLY create-new (POSIX rename would silently REPLACE a
    // concurrent writer's commit — the one failure mode a version log
    // must never have). Loser of a version-number race gets a clean
    // conflict error; optimistic concurrency under the single-writer
    // discipline.
    try {
      Files.createLink(versionPath(tableDir, s.version), tmp)
      Files.delete(tmp)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"snapshot v${s.version} was committed concurrently at $tableDir", e)
    }
  }

  // --------------------------------------------------------------------
  // Per-file column stats — the parquet-footer min/max manifest that
  // makes scans METADATA-prunable. Stats are a property of the
  // immutable data file (not of any snapshot), so they live in a 1:1
  // sidecar `_filestats/<file>.json` written once at file-creation
  // time from the parquet FOOTER (no data pages read) and deleted by
  // vacuum with the file. Every version's pruned scan is then: file
  // list from the snapshot → drop files whose [min,max] cannot
  // intersect the predicate → read the rest. Files with no sidecar or
  // no entry for the column are conservatively kept, so pruning is
  // always correctness-neutral. Compose with [[graft.ops.ZOrder]]
  // clustering to make the per-file ranges tight on EVERY z-dimension.
  // --------------------------------------------------------------------

  /** Footer min/max of one top-level primitive column, merged across
    * row groups. `kind` ∈ long | double | string; min/max serialized
    * as strings (exact for longs — no double round-trip). */
  final case class ColStats(kind: String, min: String, max: String, nulls: Long)

  /** Read one parquet footer and merge per-column row-group stats.
    * Nested paths and columns with incomplete statistics are skipped
    * (absent entry = never pruned on). */
  private def footerStats(p: Path, conf: org.apache.hadoop.conf.Configuration)
      : Map[String, ColStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.column.statistics._
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), conf)
    val r = ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map.empty[String, ColStats]
      val dropped = scala.collection.mutable.Set.empty[String]
      for (block <- r.getFooter.getBlocks.asScala;
           cc <- block.getColumns.asScala) {
        val path = cc.getPath.toArray
        if (path.length == 1 && !dropped.contains(path(0))) {
          val name = path(0)
          val st = cc.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) {
            dropped += name; acc.remove(name)
          } else {
            val parsed: Option[(String, String, String)] = st match {
              case s: LongStatistics =>
                Some(("long", s.genericGetMin.toString, s.genericGetMax.toString))
              case s: IntStatistics =>
                Some(("long", s.genericGetMin.toString, s.genericGetMax.toString))
              case s: DoubleStatistics =>
                Some(("double", s.genericGetMin.toString, s.genericGetMax.toString))
              case s: FloatStatistics =>
                Some(("double", s.genericGetMin.toDouble.toString,
                  s.genericGetMax.toDouble.toString))
              case s: BinaryStatistics =>
                Some(("string", s.genericGetMin.toStringUsingUTF8,
                  s.genericGetMax.toStringUsingUTF8))
              case _ => None
            }
            parsed match {
              case None => dropped += name; acc.remove(name)
              case Some((kind, mn, mx)) =>
                val merged = acc.get(name) match {
                  case None => ColStats(kind, mn, mx, st.getNumNulls)
                  case Some(prev) =>
                    def lt(a: String, b: String): Boolean = kind match {
                      case "long" => a.toLong < b.toLong
                      case "double" => a.toDouble < b.toDouble
                      case _ => a < b
                    }
                    ColStats(kind,
                      if (lt(mn, prev.min)) mn else prev.min,
                      if (lt(prev.max, mx)) mx else prev.max,
                      prev.nulls + st.getNumNulls)
                }
                acc(name) = merged
            }
          }
        }
      }
      acc.toMap
    } finally r.close()
  }

  private def writeFileStats(tableDir: String, file: String,
      stats: Map[String, ColStats]): Unit = {
    Files.createDirectories(statsDir(tableDir))
    val root = mapper.createObjectNode()
    root.put("file", file)
    val cols = root.putObject("cols")
    stats.toSeq.sortBy(_._1).foreach { case (name, s) =>
      val c = cols.putObject(name)
      c.put("kind", s.kind); c.put("min", s.min)
      c.put("max", s.max); c.put("nulls", s.nulls)
    }
    Files.write(statsDir(tableDir).resolve(s"$file.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Sidecar stats for one data file (None: no sidecar — always scan). */
  def fileStats(tableDir: String, file: String): Option[Map[String, ColStats]] = {
    val p = statsDir(tableDir).resolve(s"$file.json")
    if (!Files.exists(p)) return None
    val node = mapper.readTree(Files.readAllBytes(p))
    val cols = node.get("cols")
    Some(cols.fieldNames().asScala.map { n =>
      val c = cols.get(n)
      n -> ColStats(c.get("kind").asText(), c.get("min").asText(),
        c.get("max").asText(), c.get("nulls").asLong())
    }.toMap)
  }

  /** Stats-pruned range scan: read ONLY the snapshot's files whose
    * footer [min,max] on `colName` can intersect [lo, hi] (numeric
    * kinds; string columns never prune here). Returns (frame already
    * filtered to the range, files scanned, files in the snapshot) —
    * the counts are the pruning evidence specs and gates assert. The
    * result equals the full scan + filter by construction: a skipped
    * file PROVABLY holds no matching row, and kept-by-default covers
    * every stats gap. */
  def scanPruned(spark: SparkSession, tableDir: String, colName: String,
      lo: Double, hi: Double, version: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(currentVersion(tableDir)).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val s = readSnapshotMeta(tableDir, v)
    val kept = s.files.filter { f =>
      fileStats(tableDir, f).flatMap(_.get(colName)) match {
        case Some(cs) if cs.kind == "long" || cs.kind == "double" =>
          !(cs.max.toDouble < lo || cs.min.toDouble > hi)
        case _ => true
      }
    }
    val pred = col(colName) >= lit(lo) && col(colName) <= lit(hi)
    val df =
      if (kept.isEmpty)
        read(spark, tableDir, Some(v)).where(lit(false))
      else spark.read.parquet(
        kept.map(f => dataDir(tableDir).resolve(f).toString): _*).where(pred)
    (df, kept.size, s.files.size)
  }

  /** Multi-dimension stats-pruned scan: a file survives only if its
    * [min,max] intersects EVERY range (the conjunctive predicate a
    * z-ordered layout exists for — file survivor sets intersect, so
    * pruning multiplies across dimensions). Same conservative-keep
    * contract as [[scanPruned]] per dimension. */
  def scanPrunedMulti(spark: SparkSession, tableDir: String,
      ranges: Seq[(String, Double, Double)], version: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    require(ranges.nonEmpty, "scanPrunedMulti needs at least one range")
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(currentVersion(tableDir)).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val s = readSnapshotMeta(tableDir, v)
    val kept = s.files.filter { f =>
      val st = fileStats(tableDir, f)
      ranges.forall { case (colName, lo, hi) =>
        st.flatMap(_.get(colName)) match {
          case Some(cs) if cs.kind == "long" || cs.kind == "double" =>
            !(cs.max.toDouble < lo || cs.min.toDouble > hi)
          case _ => true
        }
      }
    }
    val pred = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val df =
      if (kept.isEmpty)
        read(spark, tableDir, Some(v)).where(lit(false))
      else spark.read.parquet(
        kept.map(f => dataDir(tableDir).resolve(f).toString): _*).where(pred)
    (df, kept.size, s.files.size)
  }

  // --------------------------------------------------------------------
  // Per-file Bloom sidecars — the POINT-predicate complement of the
  // footer min/max stats: equality on a high-cardinality or hash-
  // distributed column (ids, urls, categories spread across the
  // keyspace) never prunes on [min,max], but a per-file bloom answers
  // "can this file contain v?" from metadata alone. Like _filestats,
  // a bloom is a property of the immutable file: built once (ONE
  // column scan over all sidecar-less files, grouped by file name),
  // stored as `_filebloom/<file>.json`, deleted by vacuum with the
  // file. Missing sidecar or column ⇒ conservatively scanned — the
  // filter above the scan makes pruning correctness-neutral; only a
  // false POSITIVE (reads a file it needn't) is possible, never a
  // false negative.
  // --------------------------------------------------------------------

  private def bloomDir(tableDir: String): Path = Paths.get(tableDir, "_filebloom")

  /** Build bloom sidecars on `colName` for every current-version data
    * file that lacks one. One distributed pass: scan only the missing
    * files, group by file name, one [[graft.functions.BloomSketch]]
    * buffer each (OR-merge, numBits/64 longs). Returns the number of
    * sidecars written.
    *
    * Sizing: a bloom needs ~10 bits per DISTINCT key in the file for
    * a ~1% false-positive rate — an undersized filter saturates and
    * silently prunes nothing (measured: 4096 bits over 3.1k keys/file
    * left 28/32 files "maybe"; 64 KiB bits prune to the 1 true file).
    * The 8 KiB default covers ~6.5k distinct keys per file; size UP
    * for higher per-file cardinality — the sidecar cost is trivial
    * next to the data file. */
  def writeBloomSidecars(spark: SparkSession, tableDir: String,
      colName: String, numBits: Int = 65536, numHashes: Int = 5): Int = {
    val v = currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val missing = readSnapshotMeta(tableDir, v).files.filter { f =>
      val p = bloomDir(tableDir).resolve(s"$f.json")
      !Files.exists(p) || !mapper.readTree(Files.readAllBytes(p))
        .get("cols").has(colName)
    }
    if (missing.isEmpty) return 0
    import org.apache.spark.sql.functions.{col, element_at, input_file_name, split}
    val rows = spark.read.parquet(
        missing.map(f => dataDir(tableDir).resolve(f).toString): _*)
      .select(element_at(split(input_file_name(), "/"), -1).as("__file"),
        col(colName).cast("string").as("__v"))
      .groupBy(col("__file"))
      .agg(graft.functions.BloomFunctions.bloomSketch(
        col("__v"), numBits, numHashes).as("b"))
      .select(col("__file"), col("b.n"), col("b.words"))
      .collect()
    Files.createDirectories(bloomDir(tableDir))
    rows.foreach { r =>
      val file = r.getString(0)
      val p = bloomDir(tableDir).resolve(s"$file.json")
      val root =
        if (Files.exists(p))
          mapper.readTree(Files.readAllBytes(p))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        else {
          val n = mapper.createObjectNode()
          n.put("file", file); n.putObject("cols"); n
        }
      val c = root.get("cols")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .putObject(colName)
      c.put("bits", numBits); c.put("hashes", numHashes)
      c.put("n", r.getLong(1))
      val words = c.putArray("words")
      r.getSeq[Long](2).foreach(words.add)
      Files.write(p, mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    }
    rows.length
  }

  /** Bloom sidecar for (file, column), if present. */
  def fileBloom(tableDir: String, file: String, colName: String)
      : Option[graft.functions.BloomBuffer] = {
    val p = bloomDir(tableDir).resolve(s"$file.json")
    if (!Files.exists(p)) return None
    val cols = mapper.readTree(Files.readAllBytes(p)).get("cols")
    if (cols == null || !cols.has(colName)) return None
    val c = cols.get(colName)
    val words = (0 until c.get("words").size())
      .map(i => c.get("words").get(i).asLong()).toArray
    Some(graft.functions.BloomBuffer.fromWords(
      words, c.get("hashes").asInt(), c.get("n").asLong()))
  }

  /** Bloom-pruned POINT scan: read only the files whose bloom might
    * contain `value` (missing sidecar ⇒ kept). Returns (frame already
    * filtered to the equality, files scanned, files in snapshot) —
    * provably equal to scan+filter: a bloom never false-negatives. */
  def scanPrunedPoint(spark: SparkSession, tableDir: String,
      colName: String, value: String, version: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(currentVersion(tableDir)).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val s = readSnapshotMeta(tableDir, v)
    val bytes = value.getBytes(StandardCharsets.UTF_8)
    val kept = s.files.filter { f =>
      fileBloom(tableDir, f, colName).forall(_.mightContain(bytes))
    }
    val df =
      if (kept.isEmpty)
        read(spark, tableDir, Some(v)).where(lit(false))
      else spark.read.parquet(
          kept.map(f => dataDir(tableDir).resolve(f).toString): _*)
        .where(col(colName).cast("string") === lit(value))
    (df, kept.size, s.files.size)
  }

  /** Write `df` as new immutable data files; returns their names.
    * Files land under data/ with a unique batch prefix (Spark writes
    * into a scratch dir, then the parts move in — a crashed write
    * leaves only unreferenced scratch, never a corrupt snapshot). */
  private def writeDataFiles(df: DataFrame, tableDir: String): (Seq[String], Long) = {
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val scratch = Paths.get(tableDir, s".scratch-$batch")
    df.write.parquet(scratch.toString)
    Files.createDirectories(dataDir(tableDir))
    val moved = listDir(scratch)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val name = s"part-$batch-${p.getFileName.toString.stripPrefix("part-")}"
        Files.move(p, dataDir(tableDir).resolve(name), StandardCopyOption.ATOMIC_MOVE)
        name
      }
    listDir(scratch).foreach(Files.delete) // _SUCCESS etc.
    Files.delete(scratch)
    // footer-only stats sidecars for the new files (no data pages read)
    val conf = df.sparkSession.sessionState.newHadoopConf()
    moved.foreach { name =>
      writeFileStats(tableDir, name,
        footerStats(dataDir(tableDir).resolve(name), conf))
    }
    // row count from the written files' parquet footers (metadata-only
    // scan — no data read, and no recompute of df's lineage)
    val n = if (moved.isEmpty) 0L else df.sparkSession.read.parquet(
      moved.map(f => dataDir(tableDir).resolve(f).toString): _*).count()
    (moved, n)
  }

  /** Create version 0 from `df`. Fails if the table already has versions. */
  def init(df: DataFrame, tableDir: String): Long = {
    require(versions(tableDir).isEmpty, s"snapshot table already initialized: $tableDir")
    val (files, n) = writeDataFiles(df, tableDir)
    writeSnapshotMeta(tableDir, Snapshot(0L, -1L, "init", files, n))
    0L
  }

  /** Append-only commit: new files + carried-over references.
    * Concurrent appenders are safe: a lost version-number race
    * re-reads the new head and retries (see [[commitAppendRetry]]) —
    * an append's file list composes with ANY parent, so optimistic
    * retry cannot lose or duplicate data. */
  def append(df: DataFrame, tableDir: String): Long = {
    currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val (files, n) = writeDataFiles(df, tableDir)
    commitAppendRetry(tableDir, "append", files, n, batchId = -1L,
      allowInit = false)
  }

  /** Optimistic-retry commit for APPEND-ONLY snapshots. The data files
    * are already on disk (immutable, invisible until referenced); the
    * loop re-reads the head, builds the metadata entry against it, and
    * attempts the atomic createLink commit. Losing the race costs one
    * re-read of a head JSON — at fleet scale a lost race is a retried
    * METADATA write, not a failed ingest job.
    *
    * Append-only is the ONLY op where this is sound: new files compose
    * with any parent's file list, so commit order is irrelevant to the
    * final state. Upsert/CDC/compact commits compute their file
    * rewrites FROM a specific parent and still fail loudly on
    * conflict — replaying those against a moved head could resurrect
    * rows the winner deleted.
    *
    * A `batchId ≥ 0` marks a streaming append: the replay fence is
    * re-checked INSIDE the loop, so if the race loser discovers the
    * winner already committed the same batch, it returns the current
    * version without committing (its scratch files stay unreferenced
    * for vacuum) — exactly-once survives concurrent redelivery. */
  private def commitAppendRetry(tableDir: String, op: String,
      files: Seq[String], n: Long, batchId: Long, allowInit: Boolean,
      maxAttempts: Int = 8): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      if (batchId >= 0L && maxStreamBatchId(tableDir) >= batchId)
        return currentVersion(tableDir).get
      try {
        return currentVersion(tableDir) match {
          case None =>
            require(allowInit, s"no snapshot table at $tableDir")
            writeSnapshotMeta(tableDir,
              Snapshot(0L, -1L, op, files, n, batchId))
            0L
          case Some(c) =>
            val prev = readSnapshotMeta(tableDir, c)
            writeSnapshotMeta(tableDir, Snapshot(c + 1, c, op,
              prev.files ++ files, prev.rowCount + n, batchId))
            c + 1
        }
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(attempt * 5L)
      }
    }
    -1L // unreachable
  }

  /** Upsert commit: rows of `updates` replace same-key rows. Only data
    * files CONTAINING a replaced key are rewritten (file-pruned by a
    * per-file key semi-join — the parquet-footer-stats slot at scale);
    * unaffected files carry by reference. Update batches may also
    * carry new keys (insert part). */
  def upsert(spark: SparkSession, updates: DataFrame, tableDir: String,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "upsert needs key columns")
    val cur = currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val prev = readSnapshotMeta(tableDir, cur)
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    val keys = updates.select(keyCols.map(col): _*).distinct()
    // which existing files hold replaced keys? ONE column-pruned scan
    // of the key columns tagged with input_file_name — never a job per
    // file (a 10⁴-file table would pay 10⁴ job launches; this pays one
    // scan whose read schema is just the keys, the parquet-footer-
    // stats prune slot at 100 TB)
    val touchedPaths = spark.read.parquet(
        prev.files.map(f => dataDir(tableDir).resolve(f).toString): _*)
      .select(keyCols.map(col) :+ input_file_name().as("__f"): _*)
      .join(broadcast(keys), keyCols, "left_semi")
      .select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = prev.files.filter(f =>
      touchedPaths.exists(_.endsWith("/" + f)))
    val survivorsFromTouched =
      if (touched.isEmpty) None
      else Some(spark.read.parquet(
          touched.map(f => dataDir(tableDir).resolve(f).toString): _*)
        .join(broadcast(keys), keyCols, "left_anti"))
    val rewrite = survivorsFromTouched
      .map(_.unionByName(updates)).getOrElse(updates)
    val (files, n) = writeDataFiles(rewrite, tableDir)
    val kept = prev.files.filterNot(touched.contains)
    // exact row count: footer-only count over the kept refs when any
    // file was rewritten
    val keptCount =
      if (touched.isEmpty) prev.rowCount
      else if (kept.isEmpty) 0L
      else spark.read.parquet(
        kept.map(f => dataDir(tableDir).resolve(f).toString): _*).count()
    val next = cur + 1
    writeSnapshotMeta(tableDir,
      Snapshot(next, cur, "upsert", kept ++ files, keptCount + n))
    next
  }

  /** Running fence of one version: its meta's carried `fence` field,
    * or (legacy metas) the fold over its chain prefix. */
  private def fenceOf(tableDir: String, v: Long): Long = {
    val root = mapper.readTree(Files.readAllBytes(versionPath(tableDir, v)))
    Option(root.get("fence")).map(_.asLong()).getOrElse(
      versions(tableDir).filter(_ <= v).foldLeft(-1L)((m, x) =>
        math.max(m, readSnapshotMeta(tableDir, x).streamBatchId)))
  }

  /** Greatest stream batch id any committed version carries (-1 if
    * none): the replay fence for streaming appends. O(1) — read off
    * the head's carried running fence. */
  def maxStreamBatchId(tableDir: String): Long =
    currentVersion(tableDir) match {
      case None => -1L
      case Some(c) => fenceOf(tableDir, c)
    }

  /** Idempotent append for streaming sinks: Structured Streaming's
    * foreachBatch re-delivers a batch after a failed trigger, so the
    * committed version records its batch id and a replay whose id is
    * ≤ the fence becomes a no-op (returns the current version). This
    * is the standard transactional-sink discipline: the (batchId,
    * commit) pair makes at-least-once delivery exactly-once in the
    * log. Also initializes the table on the first batch. */
  def appendIdempotent(df: DataFrame, tableDir: String, batchId: Long): Long = {
    require(batchId >= 0L, "stream batch ids are non-negative")
    val fence = maxStreamBatchId(tableDir)
    if (batchId <= fence) return currentVersion(tableDir).get
    val (files, n) = writeDataFiles(df, tableDir)
    commitAppendRetry(tableDir, "stream-append", files, n, batchId,
      allowInit = true)
  }

  /** Quality-gated append: run the declarative
    * [[graft.ops.DataProfile.Check]]s over the batch FIRST (one scan,
    * violation counts) and commit only if every check passes —
    * otherwise throw with the per-check counts and write nothing (the
    * version log stays untouched, so a bad crawl batch cannot poison
    * a pinned training view). Returns the committed version. */
  def appendValidated(df: DataFrame, tableDir: String,
      checks: Seq[graft.ops.DataProfile.Check]): Long = {
    require(checks.nonEmpty, "appendValidated needs at least one check")
    val failures = graft.ops.DataProfile.validate(df, checks)
      .filter(org.apache.spark.sql.functions.col("passed") === false)
      .collect()
    if (failures.nonEmpty) {
      throw new IllegalArgumentException(
        "appendValidated rejected the batch: " + failures.map(r =>
          s"${r.getString(0)}=${r.getLong(1)} violations").mkString(", "))
    }
    append(df, tableDir)
  }

  /** CDC apply — one change batch, ONE version commit. `changes`
    * carries an `op` column ("insert" | "update" | "delete") plus the
    * table schema; inserts/updates upsert their payload rows, deletes
    * drop their keys. Only files CONTAINING an affected key rewrite
    * (the [[upsert]] single-scan prune); everything lands in a single
    * new version, fenced on `batchId` like [[appendIdempotent]] so a
    * redelivered trigger is a no-op. Returns the committed (or
    * current, when fenced) version. */
  def applyCdc(spark: SparkSession, changes: DataFrame, tableDir: String,
      keyCols: Seq[String], batchId: Long): Long = {
    require(keyCols.nonEmpty, "applyCdc needs key columns")
    val fence = maxStreamBatchId(tableDir)
    val cur = currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    if (batchId <= fence) return cur
    val prev = readSnapshotMeta(tableDir, cur)
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    val affectedKeys = changes.select(keyCols.map(col): _*).distinct()
    val upserts = changes.filter(col("op").isin("insert", "update")).drop("op")
    val touchedPaths = spark.read.parquet(
        prev.files.map(f => dataDir(tableDir).resolve(f).toString): _*)
      .select(keyCols.map(col) :+ input_file_name().as("__f"): _*)
      .join(broadcast(affectedKeys), keyCols, "left_semi")
      .select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = prev.files.filter(f => touchedPaths.exists(_.endsWith("/" + f)))
    val survivors =
      if (touched.isEmpty) None
      else Some(spark.read.parquet(
          touched.map(f => dataDir(tableDir).resolve(f).toString): _*)
        .join(broadcast(affectedKeys), keyCols, "left_anti"))
    val rewrite = survivors.map(_.unionByName(upserts)).getOrElse(upserts)
    val (files, n) = writeDataFiles(rewrite, tableDir)
    val kept = prev.files.filterNot(touched.contains)
    val keptCount =
      if (touched.isEmpty) prev.rowCount
      else if (kept.isEmpty) 0L
      else spark.read.parquet(
        kept.map(f => dataDir(tableDir).resolve(f).toString): _*).count()
    val next = cur + 1
    writeSnapshotMeta(tableDir,
      Snapshot(next, cur, "cdc", kept ++ files, keptCount + n, batchId))
    next
  }

  /** Compaction-style commit: drop `drop` (must all be referenced by
    * the current version), write `add` as new files, commit one new
    * version with the union — the primitive under layout maintenance
    * (z-order compaction, small-file merge): a METADATA swap whose
    * data writes touch only the files being reorganized. The caller
    * asserts row preservation semantics; this records exact counts
    * (footer-only reads, no data pages). */
  def replaceFiles(spark: SparkSession, tableDir: String, drop: Seq[String],
      add: DataFrame, op: String): Long = {
    val cur = currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val prev = readSnapshotMeta(tableDir, cur)
    val bad = drop.filterNot(prev.files.contains)
    require(bad.isEmpty, s"replaceFiles: not in current version: $bad")
    val droppedRows =
      if (drop.isEmpty) 0L
      else spark.read.parquet(
        drop.map(f => dataDir(tableDir).resolve(f).toString): _*).count()
    val (files, n) = writeDataFiles(add, tableDir)
    val next = cur + 1
    writeSnapshotMeta(tableDir, Snapshot(next, cur, op,
      prev.files.filterNot(drop.contains) ++ files,
      prev.rowCount - droppedRows + n))
    next
  }

  /** Roll the table back BY REFERENCE: a new version whose file list
    * is version `v`'s. History stays intact (audit); vacuum governs
    * actual file deletion. */
  def rollback(tableDir: String, v: Long): Long = {
    val target = readSnapshotMeta(tableDir, v)
    val cur = currentVersion(tableDir).get
    val next = cur + 1
    writeSnapshotMeta(tableDir,
      Snapshot(next, cur, s"rollback(to=$v)", target.files, target.rowCount))
    next
  }

  /** Read a specific subset of a snapshot's data files (layout
    * maintenance reads exactly the files it reorganizes). */
  def readFiles(spark: SparkSession, tableDir: String, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "readFiles needs at least one file")
    spark.read.parquet(files.map(f => dataDir(tableDir).resolve(f).toString): _*)
  }

  /** Read a snapshot (default: current) as a DataFrame over exactly
    * its file list. */
  def read(spark: SparkSession, tableDir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(tableDir)).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val s = readSnapshotMeta(tableDir, v)
    if (s.files.isEmpty)
      throw new IllegalStateException(s"snapshot v$v has no data files")
    spark.read.parquet(s.files.map(f => dataDir(tableDir).resolve(f).toString): _*)
  }

  /** Delete data files referenced by NO retained version, then drop
    * version entries older than `keepVersions` back from current.
    * Returns (versions dropped, data files deleted). The only
    * destructive op — everything else is append-only metadata.
    *
    * CONCURRENT-APPENDER SAFETY: an appender's data files are moved
    * into data/ BEFORE its metadata commit, so for a moment they are
    * referenced by no version — exactly what vacuum targets. Unreferenced
    * files younger than `graceMillis` (default 1 h) are therefore
    * SKIPPED: an in-flight append commits long within the grace window,
    * while genuinely orphaned scratch (crashed writers, losers of a
    * same-batch race) ages past it and is collected by the next run.
    * Set graceMillis = 0 only under a guaranteed no-writers window. */
  def vacuum(tableDir: String, keepVersions: Int = 2,
      graceMillis: Long = 3600000L): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the current version")
    val all = versions(tableDir)
    val keep = all.takeRight(keepVersions)
    val dropVs = all.dropRight(keepVersions)
    val referenced = keep.flatMap(v => readSnapshotMeta(tableDir, v).files).toSet
    val dd = dataDir(tableDir)
    val cutoff = System.currentTimeMillis() - graceMillis
    val deleted = listDir(dd)
      .filterNot(p => referenced.contains(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .map { p => Files.delete(p); 1 }.sum
    // sidecars die with their data files (stats are a file property);
    // a grace-skipped young file keeps its sidecar too
    val surviving = listDir(dd).map(_.getFileName.toString).toSet
    listDir(statsDir(tableDir))
      .filterNot(p => surviving.contains(
        p.getFileName.toString.stripSuffix(".json")))
      .foreach(Files.delete)
    listDir(bloomDir(tableDir))
      .filterNot(p => surviving.contains(
        p.getFileName.toString.stripSuffix(".json")))
      .foreach(Files.delete)
    dropVs.foreach(v => Files.delete(versionPath(tableDir, v)))
    (dropVs.size, deleted)
  }
}
