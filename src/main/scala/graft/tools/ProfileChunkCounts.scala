package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: chunk_counts vs chunk_fixed — is the +1.6s the groupBy
  * stage or one-off codegen? */
object ProfileChunkCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("chunk_fixed", "chunk_counts", "chunk_fixed", "chunk_counts")) {
      val t0 = System.nanoTime()
      graft.Queries.all(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[pcc] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
