package graft.search

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Citation aggregation over a hit set (format_citations,
  * utilities.py:24-77; SURVEY.md A2-A4):
  * group hits by file_path; per group collect file name/type, min+max
  * similarity, and (PDF only) the distinct page set compacted to
  * consecutive-run ranges; order citations by group min score ascending
  * (utilities.py:73-74). HTML rendering is presentation-layer and out of
  * engine scope — this returns the structured citation table. */
object Citations {

  def aggregate(hits: DataFrame): DataFrame = {
    hits.groupBy(col("file_path"))
      .agg(
        first(col("file_name")).as("file_name"),
        first(col("file_type")).as("file_type"),
        min(col("similarity_score")).as("min_score"),
        max(col("similarity_score")).as("max_score"),
        sort_array(collect_set(when(col("file_type") === ".pdf", col("page_number"))))
          .as("pages"))
      .withColumn("page_ranges",
        when(col("file_type") === ".pdf", TextFunctions.formatPageRangesUdf(col("pages")))
          .otherwise(lit("")))
      .withColumn("score_range",
        when(col("min_score") === col("max_score"), format_string("%.4f", col("min_score")))
          .otherwise(format_string("%.4f-%.4f", col("min_score"), col("max_score"))))
      .orderBy(col("min_score").asc)
  }
}
