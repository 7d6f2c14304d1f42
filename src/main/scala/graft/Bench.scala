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
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

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
    // Optional comma-separated query filter for single-operator timing
    // during development (unset => the full declared suite).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
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
    // Self-describing protocol fields: min-of-N runs and the box's
    // 1-minute load average at start vs end, so a reader can tell a
    // loaded-box outlier from a code regression without a re-run.
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","protocol":{"runs":$runs,"agg":"min","cpus":$cpus,"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f}}""")
    spark.stop()
  }
}
