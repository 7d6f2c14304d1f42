package graft.tools

import graft.{Queries, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev profiler: runs selected queries twice (cold + warm) to separate
  * codegen/JIT warmup from steady-state cost; prints both. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // same extensions as Bench — profile the production plans
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // local bench corpora arrive as one or two large parquet files;
      // the 128 MB default would scan them on 2 of 32 cores. 16 MB
      // splits match the core count at these file sizes (a multi-file
      // cluster layout would not need this). Partition count never
      // changes results: every declared query is partition-agnostic
      // (micro-snapped means, merge-deterministic sketches, bounded
      // heaps with total-order ties).
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // TypedImperativeAggregate plans (top_k_hits/rows, sketches) keep
      // tiny bounded buffers per group, but ObjectHashAggregate falls
      // back to SORT-BASED aggregation after only 128 distinct keys per
      // task (a default tuned for huge collect_list buffers) - a full
      // local sort that erases the heap plan's win on high-cardinality
      // groups (q4's 1.5M customers). 16 MB input splits bound per-task
      // key counts, so a 4M-key hash map is the cheaper, safe path.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS",
          (4 * 1024 * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        // eager queries return persisted frames under a caller-owns-
        // unpersist contract — this harness is that caller, and a
        // long profiling session must not accumulate cached plans
        spark.catalog.clearCache()
        dt
      }
      println(f"[profile] $name%-22s cold=${times(0)}%7.3f warm=${times(1)}%7.3f")
    }
    spark.stop()
  }
}
