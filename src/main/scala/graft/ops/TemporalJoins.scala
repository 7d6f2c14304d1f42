package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively. The reference has no joins
  * beyond an id fetch-back (SURVEY.md §2.3); an as-of join is the
  * workhorse temporal operator of event pipelines — "for each left
  * event, the most recent right event at or before it, per key". */
object TemporalJoins {

  /** As-of join via the union + running-last window shape — the
    * scale-correct plan: ONE shuffle partitioned by `keyCol` (both
    * inputs co-partitioned into the same exchange), a per-key sorted
    * window carrying only the right side's value columns, and no
    * range-join row explosion (a naive `l.ts >= r.ts` theta join
    * produces O(|L|·|R|) intermediate rows per key before picking the
    * max — this produces exactly |L| + |R|).
    *
    * Rows from `right` are tagged to sort BEFORE left rows at equal
    * timestamps, so "at or before" includes exact ties; a left row
    * with no prior right row gets nulls. Output = every `left` row +
    * `asof_ts` (the matched right timestamp) + each requested value
    * column as `asof_<name>`. `left` must not already contain the
    * prefixed names. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val prefixed = valueCols.map(c => s"asof_$c")
    val r = right.select(
      (col(keyCol) +: col(tsCol).as("__r_ts") +:
        valueCols.zip(prefixed).map { case (c, p) => col(c).as(p) }) :+
        lit(0).as("__tag"): _*)
      .withColumn(tsCol, col("__r_ts"))
    val l = left.withColumn("__tag", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // One struct per RIGHT row (null on left rows, so ignoreNulls skips
    // them): ts and every value column are projected from the SAME
    // matched row, matching ASOF semantics even when a value column of
    // the matched row is null — running last() per column independently
    // would silently backfill such a column from an older right row.
    val rowStruct = when(col("__tag") === 0,
      struct(col("__r_ts").as("__ts") +: prefixed.map(col): _*))
    val withAsof = unioned
      .withColumn("__asof", last(rowStruct, ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn("asof_ts", col("__asof.__ts"))
    prefixed.foldLeft(withAsof) { case (df, p) => df.withColumn(p, col(s"__asof.$p")) }
      .drop("__tag", "__r_ts", "__asof")
  }
}
