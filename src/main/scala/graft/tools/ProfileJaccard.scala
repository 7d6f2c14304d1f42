package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timing of the scalable jaccard plan. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[pj] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }

    val sets = Dedup.shingleHashSets(docs, "doc_id", "text", 8)
    time("sets")(sets.count())
    time("sets (warm)")(sets.count())
    val sh = sets.select(col("sid"), explode(col("hs")).as("h"))
    time("sh exploded")(sh.count())
    val dfc = sh.groupBy("h").agg(count("*").as("df")).filter(col("df") <= 64).select("h")
    val rare = sh.join(dfc, Seq("h"), "left_semi")
    time("rare")(rare.count())
    val cand = rare.as("a").join(rare.as("b"), col("a.h") === col("b.h"))
      .filter(col("a.sid") < col("b.sid"))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count("*").as("shared")).filter(col("shared") >= 2)
      .select("id_a", "id_b")
    time("candidates")(cand.count())
    time("candidates (warm)")(cand.count())
    val joined = cand
      .join(sets.select(col("sid").as("id_a"), col("hs").as("set_a"), col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("hs").as("set_b"), col("sz").as("sz_b")), "id_b")
    time("cand+sets join")(joined.count())
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 8, 0.2, 64, 2)
    time("full")(full.count())
    time("full (warm)")(full.count())
    spark.stop()
  }
}
