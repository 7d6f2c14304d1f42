package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. Each query is
  * forced via the physical plan's RDD (no extra count()-style column
  * pruning — the full declared plan executes). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: absorb parquet-reader init, codegen and JIT of the
    // scan path so the first timed query doesn't carry ~3s of one-off
    // JVM cost (standard JVM-bench practice; the per-query numbers then
    // measure the operators, not the first query's luck of the draw).
    try SparkEntry.queries("q2_topk_orders")(spark, sfDir).queryExecution.toRdd.count()
    catch { case _: Throwable => () }

    // Min of N runs per query (default 2): a single loaded-box sample
    // (GC pause, CPU contention from a co-tenant process) cannot then
    // masquerade as a code regression — the min is the best available
    // estimate of the query's intrinsic cost. Caches are cleared between
    // runs so eager queries (jaccard/minhash/corpus persist their
    // results under a caller-owns-unpersist contract) are measured cold
    // each time and cached blocks don't accumulate across the suite.
    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt, 1)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }
      name -> (if (samples.exists(_ >= 0)) samples.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
