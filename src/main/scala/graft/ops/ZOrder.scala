package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the DATA-LAYOUT lever for
  * multi-dimensional data skipping at 100 TB (the published
  * Delta/Iceberg `OPTIMIZE ZORDER BY` idea): interleave the bits of
  * k bucketed dimensions into one sort key, range-partition the write
  * on that key, and every output file covers a compact hyper-rectangle
  * — so per-file parquet footer min/max stats are TIGHT on every
  * constituent dimension and a filter on ANY of them prunes files
  * (linear sort keys only prune on the leading column).
  *
  * Everything here is a map-only codegen'd expression (shift/mask/or
  * chains over integer columns — no UDF, no shuffle to compute keys);
  * the one shuffle is the explicit `repartitionByRange` of
  * [[clusterWrite]], which is the point of the operation. Pruning
  * itself is [[graft.store.SnapshotLog.scanPruned]] over the per-file
  * stats sidecars that every snapshot write records.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of each column: bit `b`
    * of column `ci` lands at position `b * cols.size + ci`, so equal
    * prefixes of the key pin a hyper-rectangle of the bucket grid.
    * Inputs must already be bucket ordinals in [0, 2^bits); the total
    * key width `bits * cols.size` must fit a signed long. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"key width ${bits * cols.size} must be in [1, 63]")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_.bitwiseOR(_)).as("zkey")
  }

  /** Fixed-width bucket of a numeric column into [0, 2^bits) over a
    * KNOWN value envelope [lo, hi) — deterministic and replayable in
    * any engine (quantile-balanced buckets need a stats pass and a
    * non-portable sketch; fixed grids are what footer-stats pruning
    * wants anyway). Values outside the envelope clamp to the edge
    * cells. */
  def fixedBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "bucket envelope must be non-empty")
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) * cells / (hi - lo)).cast("long")))
  }

  /** Portable hash bucket of a string column into [0, 2^bits) — the
    * categorical-dimension companion of [[fixedBucket]], using the
    * repo's engine-portable md5-prefix hash so oracles replay it. */
  def hashBucket(c: Column, bits: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(1L << bits))

  /** Cluster a frame for writing: compute the z-key, range-partition
    * into `files` output partitions and sort within each — every file
    * then covers one compact z-range. Compose with
    * [[graft.store.SnapshotLog.init]]/`append` (which write one
    * parquet file per partition and record per-file footer stats in
    * the sidecar manifest). The z-key column is kept in the output:
    * it is the table's cluster key, and its own file stats give exact
    * z-range pruning for free. */
  def clusterWrite(df: DataFrame, dims: Seq[Column], bits: Int,
      files: Int): DataFrame = {
    require(files >= 1, "files must be positive")
    df.withColumn("zkey", interleave(dims, bits))
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** Incremental OPTIMIZE: restore z-disjointness after appends.
    * Appended batches carry z-keys but their files OVERLAP the
    * clustered layout's ranges, eroding pruning. This reads NOTHING
    * but the sidecar stats to find the overlap clusters (classic
    * merge-overlapping-intervals over per-file [zmin, zmax] —
    * clusters are disjoint by construction), then rewrites ONLY
    * multi-file clusters, range-partitioned back into the same file
    * count, in one [[graft.store.SnapshotLog.replaceFiles]] commit.
    * Files already disjoint are untouched — at 100 TB a steady-state
    * table pays for the recently-appended slice only, never a full
    * rewrite. A file with no z-key stats conservatively joins every
    * cluster. Returns the committed version (current version
    * unchanged when the layout is already disjoint). */
  def compact(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      zkeyCol: String = "zkey"): Long = {
    import graft.store.SnapshotLog
    val cur = SnapshotLog.currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no snapshot table at $tableDir"))
    val snap = SnapshotLog.readSnapshotMeta(tableDir, cur)
    val ranges = snap.files.map { f =>
      SnapshotLog.fileStats(tableDir, f).flatMap(_.get(zkeyCol)) match {
        case Some(cs) if cs.kind == "long" || cs.kind == "double" =>
          (f, cs.min.toDouble, cs.max.toDouble)
        case _ => (f, Double.NegativeInfinity, Double.PositiveInfinity)
      }
    }.sortBy { case (f, mn, mx) => (mn, mx, f) }
    val clusters = scala.collection.mutable.ListBuffer
      .empty[(scala.collection.mutable.ListBuffer[String], Double)]
    ranges.foreach { case (f, mn, mx) =>
      if (clusters.nonEmpty && mn <= clusters.last._2) {
        val (fs, curMax) = clusters.last
        fs += f
        clusters(clusters.size - 1) = (fs, math.max(curMax, mx))
      } else clusters += ((scala.collection.mutable.ListBuffer(f), mx))
    }
    val victims = clusters.collect { case (fs, _) if fs.size > 1 => fs.toSeq }
      .flatten.toSeq
    if (victims.isEmpty) return cur
    val rewritten = SnapshotLog.readFiles(spark, tableDir, victims)
      .repartitionByRange(victims.size, col(zkeyCol))
      .sortWithinPartitions(zkeyCol)
    SnapshotLog.replaceFiles(spark, tableDir, victims, rewritten,
      s"optimize-zorder($zkeyCol)")
  }
}
