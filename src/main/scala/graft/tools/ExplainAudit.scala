package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the declared queries and
  * flag plan smells (missing pushdown, unexpected full sorts, missing
  * broadcast). Read the output, don't trust the summary blindly. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val smells = Seq(
        "global Sort (no TakeOrdered)" ->
          (plan.contains("Sort [") && plan.contains("global=true") &&
            !plan.contains("TakeOrderedAndProject")),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"))
        .collect { case (s, true) => s }
      if (smells.nonEmpty) println(s"[audit:$name] SMELLS: ${smells.mkString("; ")}")
      val scans = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema")).map(_.trim)
      scans.foreach(l => println(s"[audit:$name] $l"))
    }
    spark.stop()
  }
}
