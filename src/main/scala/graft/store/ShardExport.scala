package graft.store

import graft.ops.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Training-shard export: the sink side of the pipeline — after
  * quality/dedup/decontaminate/split, a training run consumes the
  * corpus as deterministic JSONL shards plus a manifest describing
  * them (the layout every dataloader stack expects: one dir per
  * shard, line-delimited JSON, shard membership stable across
  * re-exports).
  *
  * Shard assignment is the portable id-hash (same function as
  * `TextAnalytics.shardAssign`), so a row's shard never depends on
  * partitioning, export order, or cluster size — re-exporting after
  * an incremental corpus change moves only the rows that changed.
  *
  * Scale shape: ONE shuffle (repartition by the shard column) so each
  * shard's rows land in exactly one task, then `partitionBy(shard)`
  * text-writes one file per shard in parallel; the manifest is one
  * grouped count over the same frame. No driver-side iteration, no
  * per-shard jobs. At 100 TB you raise `numShards` (thousands) and
  * the same two-job plan holds; a size-targeted export derives
  * numShards from `sum(length(text)) / targetBytes` first.
  */
object ShardExport {

  /** Write `df` as `numShards` JSONL shards under `outDir/shard=K/`
    * and a `_manifest` parquet beside them. Every column of `df` is
    * serialized into each JSON line (struct field order = column
    * order). Returns the manifest frame (shard, n_rows, n_chars —
    * n_chars counts the serialized JSON line lengths, the dataloader
    * budget figure). */
  def writeJsonlShards(df: DataFrame, idCol: String, outDir: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val cols = df.columns
    val lines = df
      .withColumn("shard",
        pmod(TextAnalytics.portableIdHash(col(idCol)), lit(numShards)).cast("int"))
      .withColumn("line", to_json(struct(cols.map(col): _*)))
      .select("shard", "line")
    // one shuffle: co-locate each shard into a single task so the
    // partitioned text write emits exactly one file per shard
    lines.repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .text(outDir)
    val manifest = lines.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("line")).cast("long")).as("n_chars"))
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Size-targeted variant: derives the shard count from the corpus's
    * total serialized length (`ceil(total_chars / targetChars)`, one
    * aggregate scan) so shard files land near a byte budget — the
    * form a dataloader with fixed shard-size expectations uses. */
  def writeJsonlShardsBySize(df: DataFrame, idCol: String, outDir: String,
      targetChars: Long): DataFrame = {
    require(targetChars > 0, "targetChars must be positive")
    val cols = df.columns
    val total = df
      .select(length(to_json(struct(cols.map(col): _*))).cast("long").as("l"))
      .agg(coalesce(sum(col("l")), lit(0L))).head().getLong(0)
    val shards = math.max(1L, (total + targetChars - 1) / targetChars)
    require(shards <= Int.MaxValue, s"derived shard count $shards overflows Int")
    writeJsonlShards(df, idCol, outDir, shards.toInt)
  }

  /** Read an exported shard tree back: the `shard=K` directory name is
    * recovered as the partition column; lines are parsed with the
    * caller's schema (the reader never infers — a dataloader contract
    * is explicit). */
  def readJsonlShards(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema) // partition col `shard` is appended by the reader
      .option("basePath", dir)
      .json(s"$dir/shard=*")
      .selectExpr((schema.fieldNames :+ "shard").map(n => s"`$n`"): _*)

  /** The stored manifest. */
  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_manifest")
}
