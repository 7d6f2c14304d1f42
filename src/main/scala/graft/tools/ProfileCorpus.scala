package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: is corpus_stats dominated by codegen compile (one-off) or
  * per-row work? Runs it twice in one JVM. */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("corpus_stats cold", "corpus_stats warm", "corpus_stats warm2").foreach { label =>
      val t0 = System.nanoTime()
      graft.Queries.all("corpus_stats")(spark, sfDir).queryExecution.toRdd.count()
      println(f"[pc] $label%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
