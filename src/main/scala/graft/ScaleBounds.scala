package graft

/** THE SCALE-BOUND INVENTORY — every corpus-scaled constant and fixed
  * id panel in the declared query surface, with its oracle-replay
  * rule, in one place.
  *
  * Why this exists: rounds 9 and 10 each re-discovered the same bug
  * class at a 10×/100× scaling run — a "sample" expressed as a corpus
  * FRACTION (`id % mod == 0`) crossed against the corpus is still
  * quadratic (N/mod · N), and a FIXED cap (df cap, band bits, k)
  * silently saturates or starves as the corpus grows. Both fixes
  * follow one discipline, named here so the next occurrence is a code
  * review lint instead of a 100×-rerun discovery:
  *
  *  - PANEL: an anchor/query side crossed against the corpus must be
  *    a bounded panel (`id < B`, or an explicit id-sliced batch),
  *    never a bare fraction. Pick B vacuous at the verify scales so
  *    oracle hashes are unchanged; the oracle replays the literal
  *    bound.
  *  - SCALED PARAM: a cap/width/shard-count whose correct value grows
  *    with the corpus is computed from count(*) with EXACT integer
  *    (or floor/greatest) arithmetic the oracle derives from the same
  *    count — never a float formula two engines could round apart.
  *  - Either way the small-scale value equals the old constant
  *    (vacuous-at-verify), so correctness hashes never move.
  *
  * OpsSpec's "scale-bound inventory tripwire" counts the fractional
  * `% N ===`/`=!=` slice sites in Queries.scala and fails when the
  * count drifts from [[auditedFractionalSlices]]: adding a new
  * fractional slice forces a re-audit — either it is a benign
  * corpus SPLIT (both sides consumed linearly: diff/overlap/drift
  * halves, CDC batch selectors, synthetic-data constructors) or it is
  * an anchor-product and must gain a PANEL bound plus an entry below.
  */
object ScaleBounds {

  final case class Bound(
      queries: Seq[String], // SparkEntry.queries keys gated by it
      site: String, // file:symbol
      kind: String, // "panel" | "scaled-param"
      rule: String, // the formula, engine side
      oracle: String) // how the oracle replays it

  /** Every active bound, audited r11. */
  val entries: Seq[Bound] = Seq(
    Bound(Seq("hard_negatives"),
      "Queries.hardNegatives", "panel",
      "anchors = vec_id % 100 == 0 AND vec_id < 20000 (<= 200 anchors; vacuous sf <= 1)",
      "literal `AND vec_id < 20000` in the anchor CTE"),
    Bound(Seq("embed_real"),
      "Queries.embedReal", "panel",
      "queries = doc_id % 100 == 0 AND doc_id < 50000 (<= 500 queries; vacuous sf <= 1); corpus/embed side unsliced",
      "literal `AND doc_id < 50000` on the query-doc selector"),
    Bound(Seq("knn_label_accuracy"),
      "Queries.knnLabelAccuracy", "panel",
      "anchor panel vec_id < 2048, tightening to 512 past 20k vectors (count()-tiered)",
      "CASE WHEN count(*) <= 20000 THEN 2048 ELSE 512 END replayed in the anchor CTE"),
    Bound(Seq("knn_label_accuracy_sampled"),
      "Queries.knnLabelAccuracySampled", "panel",
      "anchors = vec_id % 4 == 0 AND vec_id < 2000 (<= 500 anchors; vacuous sf <= 0.1)",
      "literal bound in the anchor CTE"),
    Bound(Seq("contrastive_pairs"),
      "Queries.contrastivePairs / SimilaritySearch.contrastiveTriples", "panel",
      "anchor pairs sliced to id_a < 1000, tightening to 250 past 50000 docs (count()-tiered; vacuous sf <= 1)",
      "id_a < (SELECT CASE WHEN count(*) <= 50000 THEN 1000 ELSE 250 END FROM documents)"),
    Bound(Seq("dedup_embedding"),
      "Queries.dedupEmbedding", "panel",
      "exact all-pairs twin sliced to vec_id < 2048 (constant 2048^2 pair space; vacuous sf <= 0.1)",
      "literal `vec_id < 2048` both sides; dedup_embedding_bucketed is the corpus-wide path"),
    Bound(Seq("semantic_dedup"),
      "Queries.semanticDedup / Clustering.kmeansSharded", "scaled-param",
      "shardBits = 0 if n <= 2048 else bitLength((n-1)/2048) (exact integer); k = 4 FIXED per shard",
      "CASE WHEN count(*) <= 2048 THEN 0 ELSE length(bin((count(*)-1)//2048)) END"),
    Bound(Seq("dedup_jaccard", "dedup_corpus", "dedup_corpus_transitive",
        "dedup_clusters", "dedup_cluster_sizes", "dedup_pagerank",
        "dedup_canonical", "dedup_best_keep", "dedup_cross_source",
        "dedup_edit_verify", "contrastive_pairs"),
      "Queries.pairDfCap (the njpairs prebuild)", "scaled-param",
      "posting df cap = max(64, floor(n_docs * 0.0128)) (vacuous <= 5000 docs)",
      "greatest(64, CAST(count(*) * 0.0128 AS BIGINT)) derived from the table"),
    Bound(Seq("dedup_incremental"),
      "Queries.dedupIncremental", "scaled-param",
      "same pairDfCap(n_docs) over stored UNION new",
      "same greatest(...) derivation"),
    Bound(Seq("dedup_minhash_lsh", "decontaminate_fuzzy"),
      "Queries MinhashDfFraction/MinhashDfFloor", "scaled-param",
      "df cap = max(16, floor(n * 0.013)) applied before signatures",
      "same greatest(...) derivation in the signature CTE"),
    Bound(Seq("dup_spans", "dedup_spans"),
      "Queries.spanDfCap", "scaled-param",
      "span 5-gram df cap = 0 (exact) at n <= 50000 else max(6500, floor(n * 0.013))",
      "CASE WHEN count(*) <= 50000 THEN <uncapped> ELSE greatest(6500, ...) END"),
    Bound(Seq("dedup_embedding_bucketed"),
      "Queries.dedupEmbeddingBucketed", "scaled-param",
      "LSH band bits tiered by count so EXPECTED bucket <= ~256 rows: 4 bits (n <= 4096), 8 (<= 65536), 16 beyond",
      "the same count(*) CASE tiers in the banding CTE"),
    Bound(Seq("pq_topk"),
      "Queries.PqTrainCap / ProductQuantization.train", "scaled-param",
      "train sample = vec_id % stride == 0, stride = (n + 32767) / 32768 exact integer (stride 1, i.e. full corpus, at n <= 32768 - vacuous sf <= 1)",
      "st CTE: (count(*) + 32767) // 32768; tr = v WHERE vec_id % stride = 0 feeds seeds + Lloyd means"),
    Bound(Seq("kmv_overlap"),
      "Queries.kmvOverlapQ", "scaled-param",
      "gate population slices to l_partkey % 8 == 0 past 10M lineitem rows (vacuous sf <= 1); sketch AND exact sides both sliced, so estimator accuracy is asserted identically",
      "m CTE: CASE WHEN count(*) > 10000000 THEN 8 ELSE 1 END, same predicate in both halves"),
    Bound(Seq("cms_check"),
      "Queries.cmsCheck", "scaled-param",
      "gate population slices to doc_id % 8 == 0 past 100k documents (vacuous sf <= 1, active at sf10's ~500k docs); CMS build and exact top-20 both sliced",
      "m CTE: CASE WHEN count(*) > 100000 THEN 8 ELSE 1 END over documents, same predicate in both halves"))

  /** The audited number of fractional `% N ===` / `% N =!=` slice
    * sites in Queries.scala (panels included, benign splits included).
    * OpsSpec recounts with the same regex; a drift fails the build
    * until the new site is audited (new entry above, or confirmed a
    * benign linear split) and this constant is bumped. */
  /** r12 audit: 67 → 69 — lm_stupid_backoff's benign `% 10` corpus
    * split now appears in BOTH branches of its duplication-adaptive
    * dispatch (collapsed + direct), same linear consumption as the
    * original single site. */
  // r14: kmv_overlap and join_size_estimate fold their half-splits
  // into a boolean projection feeding single-pass aggregates (two
  // `% 2 ===` filter sites removed; both remain benign linear splits)
  val auditedFractionalSlices: Int = 67
}
