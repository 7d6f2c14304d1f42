package graft

import org.apache.spark.sql.SparkSession

/** t1-style smoke: run the flagship [[SparkEntry.entry]] and print the
  * row count + first rows (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(6).foreach(r => println(s"[smoke] $r"))
    spark.stop()
  }
}
