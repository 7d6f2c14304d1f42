package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: the round-14 gate queries (kmv_overlap,
  * join_size_estimate, dedup_incremental) compose DRIVER-SIDE job
  * sequences, so their returned frames explain to a LocalTableScan /
  * checkpoint scan — the real plans are the internal frames. This
  * dumps `.explain("formatted")` of each heavy internal frame for BOTH
  * the pre-round-14 formulation (copied verbatim from commit 2ac935a,
  * labeled BEFORE) and the current code path (labeled AFTER), so the
  * plan diff behind the r14 claims is checkable without running Spark.
  */
object GatePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: DataFrame): Unit = {
      println(s"\n---------- $name ----------")
      println(df.queryExecution.explainString(FormattedMode))
    }

    // ===== kmv_overlap =====
    val liK = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("pk"), col("l_orderkey"))
    val aK = liK.filter(col("l_orderkey") % 2 === 0).select("pk")
    val bK = liK.filter(col("l_orderkey") % 2 === 1).select("pk")
    // BEFORE: 2 sketch scans + intersect + union.distinct + distinct
    // (5 exact-side jobs, 3 of them full key shuffles of the halves)
    dump("kmv_overlap BEFORE sketch(a) [1 of 2 sketch scans]",
      aK.agg(graft.functions.KmvFunctions.kmvSketch(col("pk"), 512).as("s")))
    dump("kmv_overlap BEFORE exact intersect [1 of 3 exact jobs]",
      aK.intersect(bK))
    dump("kmv_overlap BEFORE exact union-distinct [2 of 3 exact jobs]",
      aK.union(bK).distinct())
    // AFTER: ONE dual-sketch pass + ONE per-key rollup
    val liK2 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("pk"),
        (col("l_orderkey") % 2 === 0).as("isA"))
    dump("kmv_overlap AFTER dual-sketch single pass",
      liK2.agg(
        graft.functions.KmvFunctions.kmvSketch(when(col("isA"), col("pk")), 512).as("sa"),
        graft.functions.KmvFunctions.kmvSketch(when(!col("isA"), col("pk")), 512).as("sb")))
    dump("kmv_overlap AFTER exact set stats single rollup",
      liK2.groupBy("pk")
        .agg(max(col("isA")).as("inA"), max(!col("isA")).as("inB"))
        .agg(sum(when(col("inA") && col("inB"), 1L).otherwise(0L)).as("inter"),
          count(lit(1)).as("uni"),
          sum(when(col("inA"), 1L).otherwise(0L)).as("da")))

    // ===== join_size_estimate =====
    val liJ = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("k"), col("l_orderkey"))
    val aJ = liJ.filter(col("l_orderkey") % 2 === 0).select("k")
    val bJ = liJ.filter(col("l_orderkey") % 2 === 1).select("k")
    dump("join_size_estimate BEFORE sketch(a) [1 of 2 sketch scans]",
      aJ.agg(graft.functions.CmFunctions.countMin(col("k"), 5, 2048).as("s")))
    dump("join_size_estimate BEFORE exact join-count (materializes the join)",
      aJ.join(bJ, "k").groupBy().count())
    val liJ2 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("k"),
        (col("l_orderkey") % 2 === 0).as("isA"))
    dump("join_size_estimate AFTER dual-sketch single pass",
      liJ2.agg(
        graft.functions.CmFunctions.countMin(when(col("isA"), col("k")), 5, 2048).as("sa"),
        graft.functions.CmFunctions.countMin(when(!col("isA"), col("k")), 5, 2048).as("sb")))
    dump("join_size_estimate AFTER exact size via per-key rollup (no join materialization)",
      liJ2.groupBy("k")
        .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("cb"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))))

    // ===== dedup_incremental: the rare-gram chain =====
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("gpd_shingle").toString
    graft.ops.Dedup.writeShingleIndex(
      docs.filter(col("doc_id") % 10 =!= 3), "doc_id", "text", n = 8, tmp)
    val newSets = graft.ops.Dedup.shingleHashSets(
        docs.filter(col("doc_id") % 10 === 3), "doc_id", "text", 8)
      .withColumn("__new", lit(true))
    val storedSets = spark.read.parquet(s"$tmp/sets")
      .withColumn("__new", lit(false))
    val classes = storedSets.unionByName(newSets)
      .groupBy(col("hs"))
      .agg(min(col("sid")).as("rep"),
        sort_array(collect_list(struct(col("sid"), col("__new")))).as("members"),
        count(lit(1)).as("w"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("w_new"),
        first(col("sz")).as("sz"))
    val post = classes.select(col("rep").as("sid"), col("w"), col("w_new"),
      explode(col("hs")).as("h"))
    val maxDocFreq = 64
    // BEFORE: newGrams distinct -> semi-join -> df groupBy -> semi-join
    // (the posting explode appears three times in one plan)
    val newGrams = post.filter(col("w_new") > 0).select("h").distinct()
    val batchPost = post.join(newGrams, Seq("h"), "left_semi")
    val rareGramsB = batchPost.groupBy("h").agg(sum(col("w")).as("wdf"))
      .filter(col("wdf") <= maxDocFreq).select("h")
    dump("dedup_incremental BEFORE rare postings (3 posting explodes)",
      batchPost.join(rareGramsB, Seq("h"), "left_semi")
        .select("sid", "h", "w_new"))
    // AFTER: one per-gram aggregate carries both facts (2 explodes)
    val rareGramsA = post.groupBy("h")
      .agg(sum(col("w")).as("wdf"), sum(col("w_new")).as("w_new_tot"))
      .filter(col("w_new_tot") > 0 && col("wdf") <= maxDocFreq)
      .select("h")
    dump("dedup_incremental AFTER rare postings (2 posting explodes)",
      post.join(rareGramsA, Seq("h"), "left_semi")
        .select("sid", "h", "w_new"))
    spark.stop()
  }
}
