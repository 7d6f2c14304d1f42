package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for BENCH data: builds sfN×10 from sfN by
  * replicating every fact/entity table `factor` times with per-entity
  * key STRIDES (copy c shifts each id by c·(max(id)+1)), preserving
  * referential integrity — every shifted lineitem still joins its
  * shifted order/part/supplier, every shifted order its shifted
  * customer. Dimension constants (region, nation) copy through
  * unchanged, exactly like TPC-H's fixed-cardinality dims; timestamps
  * keep their range (density grows, the TPC-H convention).
  *
  * `documents.text` and `embeddings.embedding` are replicated
  * VERBATIM: the copies form exact-duplicate groups of size `factor`,
  * which is the WORST case for the dedup family (posting lists,
  * LSH buckets and pair graphs all carry the full group load) — a
  * scale bench that exercised only the no-duplicate fast path would
  * flatter every near-dup operator.
  *
  * BENCH-ONLY data (oracle correctness always runs on the driver's
  * own sf0.01); output lands under bench_data/ which is gitignored.
  *
  * Usage: runMain graft.tools.ScaleData [srcDir] [outDir] [factor]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/bench_data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, "factor must be >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    // Per-entity strides from the SOURCE tables so FK arithmetic is
    // identical on both sides of every join.
    val custS = stride(rd("customer"), "c_custkey")
    val suppS = stride(rd("supplier"), "s_suppkey")
    val partS = stride(rd("part"), "p_partkey")
    val ordS = stride(rd("orders"), "o_orderkey")

    /** Cross the table with copies 0..factor-1, shifting each listed
      * id column by copy · its stride. */
    def amplify(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val withC = df.withColumn("__c",
        explode(sequence(lit(0L), lit(factor - 1L))))
      shifts.foldLeft(withC) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + col("__c") * lit(s))
      }.drop("__c")
    }

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(amplify(rd("customer"), "c_custkey" -> custS), "customer")
    wr(amplify(rd("supplier"), "s_suppkey" -> suppS), "supplier")
    wr(amplify(rd("part"), "p_partkey" -> partS), "part")
    wr(amplify(rd("orders"),
      "o_orderkey" -> ordS, "o_custkey" -> custS), "orders")
    wr(amplify(rd("lineitem"), "l_orderkey" -> ordS,
      "l_partkey" -> partS, "l_suppkey" -> suppS)
      .repartition(32), "lineitem")
    // events.ts ships as TIMESTAMP(NANOS): read it the way
    // Queries.events does (nanosAsLong => epoch-ns LongType) and write
    // the Long form — a plain rewrite would re-type it TIMESTAMP_NTZ,
    // which the query layer deliberately refuses to guess about.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val ev0 = rd("events")
    val ev = ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => ev0
      case _ => ev0.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
    wr(amplify(ev,
      "event_id" -> stride(ev, "event_id"),
      "user_id" -> stride(ev, "user_id")), "events")
    wr(amplify(rd("documents"),
      "doc_id" -> stride(rd("documents"), "doc_id")), "documents")
    wr(amplify(rd("embeddings"),
      "vec_id" -> stride(rd("embeddings"), "vec_id")), "embeddings")

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$out/$t.parquet").count())
    println(counts.map { case (t, n) => s"$t=$n" }.mkString(
      s"[scale-data] $src ×$factor → $out : ", ", ", ""))
    spark.stop()
  }
}
