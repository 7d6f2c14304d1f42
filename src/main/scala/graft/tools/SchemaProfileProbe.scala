package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times of the schema_profile query at
  * SPARK_GRAFT_SF_DIR. Not part of the driver gates. */
object SchemaProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/orders.parquet")
    def t(w: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[sp] $w%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("count")(o.count())
    t("base agg no micro")(o.agg(count(lit(1)),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)),
      min(col("o_custkey")).cast("string"),
      max(col("o_custkey")).cast("string")).collect())
    t("old decimal sum x2 (ref)")(o.agg(
      sum(round(col("o_custkey").cast("double") * 1000000).cast("decimal(28,0)")),
      sum(round(col("o_totalprice").cast("double") * 1000000).cast("decimal(28,0)")))
      .collect())
    t("cd custkey")(o.select(col("o_custkey"))
      .agg(countDistinct(col("o_custkey"))).collect())
    t("cd totalprice")(o.select(col("o_totalprice"))
      .agg(countDistinct(col("o_totalprice"))).collect())
    t("cd orderpriority")(o.select(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderpriority"))).collect())
    t("full profile")(graft.ops.DataProfile.profile(o,
      Seq("o_custkey", "o_totalprice", "o_orderpriority"),
      exactDistinct = true).collect())
    spark.stop()
  }
}
