package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the standard big-join pruning move at
  * 100 TB: when the probe side is huge and the build side's key set is
  * small-ish, shuffling every probe row to discover that most match
  * nothing is wasted I/O. Build a Bloom filter over the build keys
  * (KBs-MBs regardless of probe size), broadcast it, drop probe rows
  * map-side, and run the exact join on the survivors only.
  *
  * Correctness: Bloom filters have NO false negatives, so
  * `semiJoin(probe, ...)` returns exactly the rows of a plain left-semi
  * join — the filter only reduces shuffle volume, never the answer
  * (the `bloom_prefilter` oracle hash-checks this; false POSITIVES are
  * removed by the exact semi join that follows). Spark's own runtime
  * row-level filtering does this adaptively for some shapes; the
  * explicit op is for when the build side is reused across many jobs
  * or the planner can't see the opportunity.
  *
  * Scale shape: one pass over the build side to aggregate the sketch
  * (driver holds only the bit array), one broadcast, then the probe
  * scan is map-only until the (pruned) exchange. */
object BloomFilterJoin {

  /** Probe rows whose key might be in the build side's key set —
    * map-only, superset of the true matches by ≤ fpp of the non-matching
    * rows. */
  def prefilter(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, expectedKeys: Long, fpp: Double = 0.03): DataFrame = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, "need expectedKeys > 0, fpp in (0,1)")
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    probe.filter(might(col(probeKey)))
  }

  /** Exact left-semi join with the Bloom pre-prune: identical rows to
    * `probe.join(build, key, "left_semi")`, shuffling survivors only. */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, expectedKeys: Long, fpp: Double = 0.03): DataFrame =
    prefilter(probe, probeKey, build, buildKey, expectedKeys, fpp)
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
}
