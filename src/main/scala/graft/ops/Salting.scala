package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key skew report — the diagnostic a pipeline runs BEFORE
  * reaching for [[Salting]] or AQE skew hints: per key-column, the row
  * count, distinct-key count, the hottest keys, and the skew factor
  * (hottest key's share vs a uniform key). One partial-aggregating
  * count + a TakeOrdered top-k; the per-key count table never leaves
  * the executors except as the k report rows.
  *
  * skew_factor = max_key_count · n_keys / n_rows, exact integer inputs
  * divided once and rounded 6 dp — 1.0 means perfectly uniform; a
  * join whose build side has factor ≫ 10 straggles without salt. */
object SkewReport {
  import org.apache.spark.sql.functions._

  def topKeys(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__n"),
      count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_rows"),
        round(col("n_rows").cast("double") * col("__keys").cast("double") /
          col("__n").cast("double"), 6).as("skew_factor"))
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(k)
  }
}

/** Skew mitigation for shuffle joins and aggregations: salt the skewed
  * (large) side's key into `factor` sub-keys and replicate the small
  * side across all salt values, so one hot key's rows spread over
  * `factor` reducers instead of one straggler task.
  *
  * DEFAULT RECOMMENDATION (round-10 A/B at production scale,
  * `ScaleProbe 64000000 skew256` / `skew`, BASELINE.md — REVISES the
  * round-9 small-corpus verdict): for a KNOWN heavily-skewed join key
  * (skew factor ≫ 10 in [[SkewReport]]), prefer [[saltedJoin]]. At a
  * 50%-hot key over 64M rows, salting factor 16 beat plain SMJ 2.3×
  * and beat AQE skew-join at BOTH thresholds — stock 256MB (11.6 s vs
  * 5.6 s: the hot partition splits only ~640MB/256MB ≈ 2-3 ways) and
  * a tuned 8MB (8.9 s vs 6.6 s) — because the salt spreads the hot
  * key `factor` ways at MAP time while AQE can only split the already-
  * shuffled partition at reduce time, block by block, after paying
  * the skewed write. The round-9 result (AQE ahead at 4-8M rows with
  * an 8MB override) was the small-corpus regime where the salt's
  * small-side replication dominated; it does not extrapolate.
  *
  * AQE skew-join remains the right DEFAULT when skew is not known in
  * advance: it costs nothing when absent and rescues the straggler
  * unattended. Mind its trigger: only partitions over
  * `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`
  * (256MB stock) split, and the split granularity is that same size —
  * a 640MB hot partition gains only ~3-way parallelism unless the
  * threshold/advisory are lowered.
  *
  * Explicit salting is also the only tool when (a) the skewed stage is an
  * AGGREGATION with large per-key state (collect_set/distinct) that
  * map-side partial aggregation cannot compact — AQE never splits a
  * skewed GROUP, [[saltedAgg]]'s two-phase merge is the only spread;
  * (b) the join is shuffled-hash (AQE skew handling targets SMJ);
  * (c) one key is so hot that even a split partition's SORT straggles
  * and you want a deterministic spread keyed on row content. The salt
  * is `pmod(xxhash64(spreadCols), factor)` — a pure function of row
  * content, so task retries and recomputed partitions salt
  * identically (a `rand()` salt would not). */
object Salting {

  /** Join `large` (skewed keys) with `small` on `key`, spreading each
    * large-side key over `factor` salt buckets. `spreadCols` pick the
    * salt per large row — pass row-identifying columns (e.g. a primary
    * key) so the hot key's rows spread uniformly. Result equals
    * `large.join(small, key)` exactly, in any order. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int, spreadCols: Seq[String]): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(spreadCols.map(col): _*), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: groupBy(key) where one key
    * dominates. Phase 1 aggregates (key, salt) partials, phase 2
    * merges partials per key — the classic hot-key split. `aggs` maps
    * output column name -> (phase1 agg over input, phase2 merge over
    * phase-1 partials). Counts/sums merge with sum, min with min, etc. */
  def saltedAgg(df: DataFrame, key: String, factor: Int, spreadCols: Seq[String],
      aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(spreadCols.map(col): _*), lit(factor)).cast("int"))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, a, _) => a.as(s"__p_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, m) => m(col(s"__p_$n")).as(n) }: _*)
  }
}
