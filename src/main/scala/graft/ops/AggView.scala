package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate VIEW over a change-logged table —
  * the materialized-view maintenance primitive of a lakehouse: a
  * grouped (cnt, sum) rollup kept in lockstep with its base table from
  * the SAME CDC feed that maintains the table
  * ([[graft.store.SnapshotLog.applyCdc]]) and its indexes
  * ([[InvertedIndex.applyCdc]]), so a dashboard aggregate never pays a
  * full rescan. Count and sum are the self-maintainable aggregates
  * (deletes subtract exactly); min/max are deliberately out of scope —
  * they need a recount on delete.
  *
  * Scale shape (the [[InvertedIndex]] discipline): state lives in
  * `buckets` portable-hash key ranges; a CDC batch reduces to per-key
  * integer deltas (one partial-agg pass, exact cents), touches only
  * the buckets its keys hash into, and rewrites JUST those — steady
  * state pays for the changed slice of the keyspace, never the view.
  * Each bucket carries its own batch-id fence sidecar, so a replayed
  * (at-least-once) trigger skips buckets it already applied; a crash
  * between a bucket's data move and its fence write replays one merge
  * into that bucket — the same two-file window every persisted summary
  * in this repo documents.
  *
  * Change rows: (op ∈ insert|update|delete, <key>, value_before,
  * value_after) — update carries both sides so the delta is
  * new − old without consulting the base table. */
object AggView {

  private def bucketOf(keyCol: org.apache.spark.sql.Column, buckets: Int) =
    pmod(conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(buckets))

  private def bucketDir(dir: String, b: Long) =
    java.nio.file.Paths.get(dir, f"bucket=$b%04d")

  private def fencePath(dir: String, b: Long) =
    java.nio.file.Paths.get(dir, f"bucket=$b%04d.batch")

  private def readBucketFence(dir: String, b: Long): Long = {
    val p = fencePath(dir, b)
    if (!java.nio.file.Files.exists(p)) -1L
    else new String(java.nio.file.Files.readAllBytes(p)).trim.toLong
  }

  private def writeBucketFence(dir: String, b: Long, batchId: Long): Unit = {
    val p = fencePath(dir, b)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, batchId.toString.getBytes)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Initial materialization from the base table: one grouped pass,
    * written bucket by bucket (fence −1: every future batch applies). */
  def build(df: DataFrame, dir: String, keyCol: String, valueCol: String,
      buckets: Int = 16): Unit = {
    require(buckets > 0, "buckets must be positive")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // persist the rollup before fanning out: it is keyspace-sized
    // (tiny), but its LINEAGE is the full base scan — without the
    // persist the distinct-bucket probe and every bucket write each
    // replay that scan (1 + buckets full passes; 336 s at sf10 for a
    // 3-row result).
    val agg = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"))
      .withColumn("__b", bucketOf(col("key"), buckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bs = agg.select("__b").distinct().collect().map(_.getLong(0))
      bs.foreach { b =>
        agg.filter(col("__b") === b).drop("__b")
          .coalesce(1).write.mode("overwrite")
          .parquet(bucketDir(dir, b).toString)
      }
    } finally agg.unpersist()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_meta.json"),
      s"""{"buckets": $buckets}""".getBytes)
  }

  private def numBuckets(dir: String): Int = {
    val p = java.nio.file.Paths.get(dir, "_meta.json")
    val s = new String(java.nio.file.Files.readAllBytes(p))
    """"buckets":\s*(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
  }

  /** The view: (key, cnt, sum_cents) over all bucket dirs. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(dir)
    val dirs = java.nio.file.Files.list(root).iterator()
    val found = scala.collection.mutable.ArrayBuffer.empty[String]
    while (dirs.hasNext) {
      val p = dirs.next()
      if (java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
        found += p.toString
    }
    spark.read.parquet(found.toSeq: _*)
  }

  /** Apply one CDC batch: per-key integer deltas, touched-bucket-only
    * merge-rewrites, per-bucket fences. Returns buckets rewritten.
    *
    * CONTRACT — 'update' rows must keep the group key unchanged: the
    * delta (va − vb) is applied wholly to the row's CURRENT key, so an
    * upstream update that MOVES a row between keys must be emitted as
    * delete(old key, value_before) + insert(new key, value_after), the
    * standard CDC retraction encoding (Debezium/Flink changelog do the
    * same). A key-changing 'update' row would leave the old key's
    * cnt/sum stale. */
  def applyCdc(spark: SparkSession, changes: DataFrame, dir: String,
      keyCol: String, batchId: Long): Int = {
    val buckets = numBuckets(dir)
    val deltas = changes
      .select(col(keyCol).cast("string").as("key"), col("op"),
        round(coalesce(col("value_before"), lit(0.0)) * 100).cast("long").as("vb"),
        round(coalesce(col("value_after"), lit(0.0)) * 100).cast("long").as("va"))
      .withColumn("dcnt",
        when(col("op") === "insert", 1L)
          .when(col("op") === "delete", -1L).otherwise(0L))
      .withColumn("dcents",
        when(col("op") === "insert", col("va"))
          .when(col("op") === "delete", -col("vb"))
          .otherwise(col("va") - col("vb")))
      .groupBy(col("key"))
      .agg(sum(col("dcnt")).as("dcnt"), sum(col("dcents")).as("dcents"))
      .withColumn("__b", bucketOf(col("key"), buckets))
      .persist()
    val touched = deltas.select("__b").distinct().collect().map(_.getLong(0))
    var rewritten = 0
    touched.foreach { b =>
      if (batchId > readBucketFence(dir, b)) {
        val bd = bucketDir(dir, b)
        val cur =
          if (java.nio.file.Files.isDirectory(bd))
            spark.read.parquet(bd.toString)
          else spark.emptyDataFrame
            .withColumn("key", lit(null).cast("string"))
            .withColumn("cnt", lit(null).cast("long"))
            .withColumn("sum_cents", lit(null).cast("long"))
        val d = deltas.filter(col("__b") === b)
          .select(col("key").as("dkey"), col("dcnt"), col("dcents"))
        val merged = cur.join(d, cur("key") === d("dkey"), "full_outer")
          .select(
            coalesce(cur("key"), col("dkey")).as("key"),
            (coalesce(cur("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
              .as("cnt"),
            (coalesce(cur("sum_cents"), lit(0L)) +
              coalesce(col("dcents"), lit(0L))).as("sum_cents"))
          .filter(col("cnt") > 0)
        val tmp = java.nio.file.Paths.get(dir, f"_tmp_bucket_$b%04d")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val old = java.nio.file.Paths.get(dir, f"_old_bucket_$b%04d")
        if (java.nio.file.Files.isDirectory(bd)) {
          java.nio.file.Files.move(bd, old)
          java.nio.file.Files.move(tmp, bd)
          deleteRecursively(old)
        } else java.nio.file.Files.move(tmp, bd)
        writeBucketFence(dir, b, batchId)
        rewritten += 1
      }
    }
    deltas.unpersist()
    rewritten
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively)
      finally s.close()
    }
    java.nio.file.Files.delete(p)
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
