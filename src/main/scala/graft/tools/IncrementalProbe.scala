package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: phase-level wall times of the dedup_incremental path
  * (the round-14 #1 sf0.1 resident). Mirrors
  * [[graft.ops.Dedup.incrementalJaccardPairs]] barrier-for-barrier so
  * each eager step can be timed separately. */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warmup scan path
    spark.read.parquet(s"$sfDir/documents.parquet").count(): Unit

    for (rnd <- 1 to 2) {
      System.err.println(s"[probe] === round $rnd ===")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val nDocs = phase("docs.count")(docs.count())
      val cap = math.max(64L, (nDocs * 0.0128).toLong).toInt
      val idx = phase("shingle index (cached dir)") {
        val tmp = java.nio.file.Files.createTempDirectory("probe_shingle").toString
        graft.ops.Dedup.writeShingleIndex(
          docs.filter(col("doc_id") % 10 =!= 3), "doc_id", "text", n = 8, tmp)
        tmp
      }
      // inlined body of incrementalJaccardPairs with per-barrier timers
      import graft.ops.Dedup
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val (threshold, minShared, maxDocFreq) = (0.2, 2, cap)
      val newDocs = docs.filter(col("doc_id") % 10 === 3)
      val newSets = Dedup.shingleHashSets(newDocs, "doc_id", "text", 8)
        .withColumn("__new", lit(true))
      val storedSets = spark.read.parquet(s"$idx/sets")
        .withColumn("__new", lit(false))
      val classes = storedSets.unionByName(newSets)
        .groupBy(col("hs"))
        .agg(min(col("sid")).as("rep"),
          sort_array(collect_list(struct(col("sid"), col("__new")))).as("members"),
          count(lit(1)).as("w"),
          sum(when(col("__new"), 1L).otherwise(0L)).as("w_new"),
          first(col("sz")).as("sz"))
        .persist(lvl)
      phase("classes materialize")(classes.count())
      val post = classes.select(col("rep").as("sid"), col("w"), col("w_new"),
        explode(col("hs")).as("h"))
      val newGrams = post.filter(col("w_new") > 0).select("h").distinct()
      val batchPost = post.join(newGrams, Seq("h"), "left_semi")
      val rareGrams = batchPost.groupBy("h").agg(sum(col("w")).as("wdf"))
        .filter(col("wdf") <= maxDocFreq).select("h")
      val rare = batchPost.join(rareGrams, Seq("h"), "left_semi")
        .select("sid", "h", "w_new").persist(lvl)
      phase("rare materialize")(rare.count())
      val cand = rare.as("a").join(rare.as("b"), col("a.h") === col("b.h"))
        .filter(col("a.sid") < col("b.sid") &&
          (col("a.w_new") > 0 || col("b.w_new") > 0))
        .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .select("id_a", "id_b")
        .persist(lvl)
      phase("cand materialize")(cand.count())
      val repSets = classes.select(col("rep").as("sid"), col("hs"), col("sz"))
      val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("sid")).distinct()
      val prunedSets = repSets.join(candIds, Seq("sid"), "left_semi")
        .persist(lvl)
      val st = phase("prunedSets sizing agg")(
        prunedSets.agg(count(lit(1)), coalesce(sum(col("sz")), lit(0L))).head())
      val setsBytes = st.getLong(0) * 64L + st.getLong(1) * 8L
      val vsets = if (setsBytes < (128L << 20)) broadcast(prunedSets) else prunedSets
      val joinedA = cand.join(vsets, cand("id_a") === vsets("sid"))
        .select(col("id_a"), col("id_b"), col("hs").as("set_a"), col("sz").as("sz_a"))
      val repPairs = joinedA.join(vsets, joinedA("id_b") === vsets("sid"))
        .withColumn("inter",
          graft.functions.ArrayFunctions.sortedIntersectCount(col("set_a"), col("hs")))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz_a") + col("sz") - col("inter")).cast("double"))
        .filter(col("jaccard") >= lit(threshold))
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("jaccard"))
      val rareCnt = rare.groupBy("sid").agg(count(lit(1)).as("rare_cnt"))
      val within = classes.filter(col("w") > 1 && col("w_new") > 0)
        .join(rareCnt.withColumnRenamed("sid", "rep"), Seq("rep"))
        .filter(col("rare_cnt") >= minShared && lit(1.0) >= lit(threshold))
        .select(explode(expr(
          """flatten(transform(members, (x, i) ->
            |  transform(slice(members, i + 2, size(members) - i - 1),
            |    y -> struct(x.sid AS id_a, y.sid AS id_b,
            |      x.__new OR y.__new AS touches_new))))""".stripMargin)).as("p"))
        .filter(col("p.touches_new"))
        .select(col("p.id_a"), col("p.id_b"), lit(1.0).as("jaccard"))
      val memA = classes.select(col("rep").as("rep_a"), col("members").as("__ma"))
      val memB = classes.select(col("rep").as("rep_b"), col("members").as("__mb"))
      val cross = repPairs.join(memA, Seq("rep_a")).join(memB, Seq("rep_b"))
        .select(explode(col("__ma")).as("a"), col("__mb"), col("jaccard"))
        .select(col("a"), explode(col("__mb")).as("b"), col("jaccard"))
        .filter(col("a.__new") || col("b.__new"))
        .select(least(col("a.sid"), col("b.sid")).as("id_a"),
          greatest(col("a.sid"), col("b.sid")).as("id_b"), col("jaccard"))
      val verified = within.unionByName(cross).persist(lvl)
      val cnt = phase("verify+expand materialize")(verified.count())
      cand.unpersist(); rare.unpersist(); prunedSets.unpersist()
      classes.unpersist()
      val fin = phase("final localCheckpoint") {
        val o = verified.select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard")).localCheckpoint(true)
        verified.unpersist(); o
      }
      System.err.println(s"[probe] pairs=$cnt / ${fin.count()}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
