package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Point-in-interval join: every (interval, point) pair with the same
    * key where `start <= ts < end` — the other workhorse temporal join
    * (attribution windows, incident correlation, session containment).
    *
    * The scale shape is a GRAIN-BUCKETED EQUI-JOIN, not the naive theta
    * join (which Spark plans as a per-key cartesian — O(|L|·|R|) per key
    * before the range filter): each interval explodes to the fixed-width
    * grain buckets it covers, each point carries its single bucket, and
    * the join is an equi-join on (key, bucket) followed by the exact
    * containment filter. A point can meet a given interval in exactly ONE
    * bucket (its own), so no distinct/dedup pass is needed; shuffle
    * volume is |points| + Σ ceil(span/grain) — linear, AQE/skew-join
    * eligible, and sized by `grain` (pick it near the typical interval
    * span so most intervals explode to 1-2 rows). An interval spanning
    * more than `maxBucketsPerInterval` grains fails fast with
    * `raise_error` rather than silently exploding the build side.
    *
    * Inputs: `intervals` carries `keyCol` + integer `startCol`/`endCol`
    * (end exclusive; empty intervals drop); `points` carries `keyCol` +
    * integer `tsCol`. Column names other than `keyCol` must be disjoint
    * across the two frames. Output = all interval columns + the point's
    * non-key columns, one row per containment. Bucketing uses exact
    * integer floor-division (pmod-then-div — no double rounding at
    * epoch-nano magnitudes), so negative values are handled correctly. */
  def pointInIntervalJoin(intervals: DataFrame, points: DataFrame,
      keyCol: String, startCol: String, endCol: String, tsCol: String,
      grain: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet) - keyCol
    require(overlap.isEmpty, s"non-key column names must be disjoint: $overlap")
    // exact floor division: c - pmod(c, g) is the largest multiple of g
    // <= c (pmod is non-negative), and integral `div` of an exact
    // multiple is exact for any sign — Column `/` would go through
    // DOUBLE, which mis-buckets at epoch-nano magnitudes (> 2^53)
    def floorMult(c: Column): Column = (c - pmod(c, lit(grain))).cast("long")
    def divGrain(name: String): Column = expr(s"$name div ${grain}L")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__s0", floorMult(col(startCol)))
      .withColumn("__e0", floorMult(col(endCol) - 1))
      .withColumn("__bs", divGrain("__s0"))
      .withColumn("__be", divGrain("__e0"))
      .drop("__s0", "__e0")
      .withColumn("__b",
        explode(when(col("__be") - col("__bs") < lit(maxBucketsPerInterval.toLong),
          sequence(col("__bs"), col("__be")))
          .otherwise(raise_error(concat(
            lit(s"pointInIntervalJoin: interval spans more than $maxBucketsPerInterval "),
            lit("grains — use a coarser grain ([") , col(startCol), lit(","), col(endCol), lit("))"))))))
      .drop("__bs", "__be")
    val ptCols = points.columns.filter(_ != keyCol)
    val pt = points.select(
      col(keyCol).as("__pk") +: col(tsCol).as("__pt") +: ptCols.map(col): _*)
      .withColumn("__p0", floorMult(col("__pt")))
      .withColumn("__pb", divGrain("__p0"))
      .drop("__p0")
    iv.join(pt, iv(keyCol) === pt("__pk") && iv("__b") === pt("__pb"))
      .filter(col("__pt") >= col(startCol) && col("__pt") < col(endCol))
      .drop("__b", "__pk", "__pt", "__pb")
  }
}
