package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the corpus
  * clustering / IVF-coarse-quantizer training step of an embedding
  * pipeline. Deterministic and engine-reproducible by construction:
  *
  *  - centroids initialize to the k lowest-id vectors (no rand);
  *  - after each update, centroid components are snapped to exact
  *    micro-units (`round(mean·1e6) as long / 1e6`), so distributed
  *    summation order can never leak into the trajectory — any engine
  *    computing the same means to 6 dp follows the same path;
  *  - assignment ties break to the lower cluster index;
  *  - vectors are cast to double before distance so the float→double
  *    widening point matches a plain-SQL replay.
  *
  * Scale shape: per iteration ONE broadcast of k·dim doubles (as plan
  * literals) and ONE partial-aggregating `groupBy(cluster)` — the
  * canonical distributed k-means; no per-row state, no driver data
  * beyond the k×dim centroid matrix. */
object Clustering {

  /** Runs `iters` Lloyd iterations; returns (idCol, cluster, dist)
    * for the LAST assignment (the one the final means were computed
    * from — dist is the distance to that assignment's centroid). */
  def kmeans(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int): DataFrame =
    kmeansCore(vecs, idCol, vecCol, dim, k, iters)._1
      .select(col("__id").as(idCol), col("cluster"), col("dist"))

  /** The Lloyd loop shared by [[kmeans]] and [[silhouette]]: returns
    * the final assignment frame (with __id/__v/cluster/dist) and the
    * final centroid matrix. */
  private def kmeansCore(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): (DataFrame, Seq[(Int, Seq[Double])]) = {
    require(k > 0 && iters > 0 && dim > 0, "k, iters, dim must be positive")
    val v = vecs.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    var centroids: Seq[(Int, Seq[Double])] =
      v.orderBy(col("__id").asc).limit(k).collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq

    def assign(): DataFrame = {
      val cands = centroids.map { case (ci, c) =>
        struct(
          VectorFunctions.euclideanDistance(col("__v"),
            array(c.map(lit): _*)).as("d"),
          lit(ci).as("cl"))
      }
      // least() over (d, cl) structs = argmin distance, ties to lower index
      v.withColumn("__best", least(cands: _*))
        .select(col("__id"), col("__v"),
          col("__best.cl").as("cluster"), col("__best.d").as("dist"))
    }

    var assigned = assign()
    for (_ <- 1 until iters) {
      // exact micro-unit snap: round→long→/1e6 yields the identical
      // double in any engine; a bare round(x, 6) can disagree by 1 ulp
      val meanCols = (0 until dim).map(i =>
        (round(avg(col("__v")(i)) * 1000000.0).cast("long") / 1000000.0).as(s"c$i"))
      centroids = assigned.groupBy(col("cluster"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), (1 to dim).map(r.getDouble).toSeq))
        .sortBy(_._1).toSeq
      assigned = assign()
    }
    (assigned, centroids)
  }

  /** Deterministic ±1 LSH shard projections: the sign for bit `j`,
    * component `i` is the low bit of md5("graft-shard:j:i") — the
    * repo's portable-hash idiom, structure-free (a multiplicative-
    * parity alternative produced near-complementary rows, i.e.
    * redundant hyperplanes) and balanced (~32/64 positive per row).
    * The SQL oracle interpolates these as LITERALS from this very
    * function, so the two engines cannot drift. */
  def shardProjections(bits: Int, dim: Int): Seq[Seq[Double]] =
    (0 until bits).map { j =>
      (0 until dim).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-shard:$j:$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 1) 1.0 else -1.0
      }
    }

  /** Sign-bit LSH shard key over `bits` hyperplanes:
    * shard = Σ_j 2^j · [⟨v, w_j⟩ ≥ 0] ∈ [0, 2^bits). Each dot product
    * is a strict left-to-right fold (i ascending) so the SQL replay's
    * `list_sum(list_transform(...))` adds in the same order; a sign
    * flip would need the dot to sit within one ulp of 0.0. bits = 0 →
    * constant shard 0 (the unsharded degenerate, vacuous at verify
    * scale). */
  def signShard(vecCol: Column, bits: Int, dim: Int): Column =
    if (bits <= 0) lit(0L)
    else {
      val w = shardProjections(bits, dim)
      (0 until bits).map { j =>
        val dot = (0 until dim).map(i => vecCol(i) * lit(w(j)(i))).reduceLeft(_ + _)
        when(dot >= 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduceLeft(_ + _)
    }

  /** LSH-sharded k-means — the SCALE form of cell assignment for
    * [[graft.ops.Dedup.semanticDedup]]: vectors are pre-sharded by
    * [[signShard]] (2^shardBits shards), then FIXED-k Lloyd runs
    * independently inside every shard. Assignment cost is n·k per
    * iteration with k constant — linear in the corpus — while cell
    * count (2^shardBits · k) scales with it; the corpus-scaled-k
    * single-level alternative (k ∝ n/512) made every Lloyd iteration
    * n²/512 (17.2× per 10× data, measured at sf10). Verbatim-replica
    * vectors always share a shard (identical dots ⇒ identical signs);
    * the recall trade for NON-identical near-dups is the usual LSH
    * one — a pair at angle θ agrees on one sign bit with probability
    * 1 − θ/π — on top of SemDeDup's own same-nearest-centroid
    * approximation.
    *
    * Same determinism contract as [[kmeans]]: seeds are the k
    * lowest-id vectors PER SHARD (cl = per-shard id-rank − 1), means
    * snap to exact micro-units, argmin ties break to the lower cl
    * (the fold below keeps the FIRST minimum of the cl-sorted
    * centroid array — strictly-less updates only).
    *
    * Scale shape, fully collect-free: the shard key is a map-side
    * projection; seeds are one row_number window over the shard key;
    * each iteration is one broadcast of the (2^shardBits · k)-row
    * centroid table joined back on the shard key plus one partial-agg
    * groupBy(shard, cluster) — no driver-side centroid matrix at any
    * shard count. Returns (idCol, shard, cluster) with cluster the
    * PER-SHARD index in [0, k). */
  def kmeansSharded(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int, shardBits: Int): DataFrame = {
    require(k > 0 && iters > 0 && dim > 0 && shardBits >= 0 && shardBits <= 20,
      "k, iters, dim must be positive; shardBits in [0, 20]")
    val v = vecs.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__shard", signShard(col("__v"), shardBits, dim))
      // co-partition by the shard key UP FRONT with an EXPLICIT
      // partition count: the seed window reuses this exact
      // partitioning (no second exchange), and — the r11 sf10
      // event-log lesson, twice — (a) a narrow parquet corpus (200k ×
      // 64 floats ≈ one 51 MB scan partition) would otherwise run
      // every per-row assignment evaluation on a single core
      // (15.7 s/pass measured), and (b) a bare repartition(col) gets
      // AQE-coalesced back to 2-3 tasks because its sizing is BYTES
      // and this stage is CPU-bound (higher-order-function distance
      // evals, ~75 µs/row interpreted). AQE honors user-specified
      // counts, so pin one: min(shard count, 4× default parallelism).
      .repartition(math.min(1 << math.min(shardBits, 16),
        vecs.sparkSession.sparkContext.defaultParallelism * 4).max(1), col("__shard"))
      // cache the sharded vectors: the seed window, every Lloyd
      // iteration, and the final assignment all re-read them — without
      // the cache each broadcast-build subjob re-runs the scan+shard
      // map side (single-task on a narrow corpus) from scratch. The
      // cache is n × (dim+2) doubles; the caller's eager materialization
      // of the returned assignment is what bounds its lifetime (the
      // bench/session cache clear releases it).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__id").asc)
    val seeds = v.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__shard"), (col("__rn") - 1).cast("int").as("cl"),
        col("__v").as("__e"))
    // shard -> cl-sorted centroid array (sort_array on struct orders
    // by the leading cl field); broadcast-joined back per iteration
    def centArr(c: DataFrame): DataFrame =
      c.groupBy(col("__shard"))
        .agg(sort_array(collect_list(struct(col("cl"), col("__e")))).as("__cents"))
    def assign(cents: DataFrame): DataFrame =
      v.join(broadcast(cents), Seq("__shard"))
        .withColumn("__best", aggregate(col("__cents"),
          struct(lit(Double.MaxValue).as("d"), lit(Int.MaxValue).as("cl")),
          (acc, c) => {
            // squared distance, strict i-ascending fold (the SQL
            // replay's list_sum order); sqrt dropped — argmin-invariant
            val dd = aggregate(
              zip_with(col("__v"), c("__e"), (a, b) => (a - b) * (a - b)),
              lit(0.0d), (s, x) => s + x)
            when(dd < acc("d"), struct(dd.as("d"), c("cl").as("cl")))
              .otherwise(acc)
          }))
        .select(col("__id"), col("__shard"), col("__v"),
          col("__best").getField("cl").as("cluster"))
    var assigned = assign(centArr(seeds))
    for (_ <- 1 until iters) {
      val meanCols = (0 until dim).map(i =>
        (round(avg(col("__v")(i)) * 1000000.0).cast("long") / 1000000.0).as(s"c$i"))
      val means = assigned.groupBy(col("__shard"), col("cluster"))
        .agg(meanCols.head, meanCols.tail: _*)
        .select(col("__shard"), col("cluster").as("cl"),
          array((0 until dim).map(i => col(s"c$i")): _*).as("__e"))
      assigned = assign(centArr(means))
    }
    assigned.select(col("__id").as(idCol), col("__shard").as("shard"),
      col("cluster"))
  }

  /** Centroid-based silhouette per cluster — the standard "are these
    * clusters real" diagnostic, in its scalable simplified form
    * (Kaufman & Rousseeuw's a/b over CENTROID distances instead of
    * all-pairs member distances — the only form that doesn't need an
    * O(n²) pass): per vector, `a` = distance to its own (assigned)
    * centroid, `b` = min distance to any OTHER centroid,
    * `s = (b − a) / max(a, b)`; per-row s is rounded to 6 dp before
    * the cluster mean so accumulation drift cannot cross engines.
    *
    * Scale shape: [[kmeans]]'s iterations plus ONE extra map stage
    * (k distances per row against broadcast centroid literals) and one
    * partial-agg groupBy — nothing all-pairs, no extra shuffle. */
  def silhouette(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int): DataFrame = {
    require(k >= 2, "silhouette needs k >= 2")
    val (assigned, centroids) = kmeansCore(vecs, idCol, vecCol, dim, k, iters)
    val dists = centroids.map { case (ci, c) =>
      struct(
        VectorFunctions.euclideanDistance(col("__v"),
          array(c.map(lit): _*)).as("d"),
        lit(ci).as("cl"))
    }
    // a = the assignment distance (min, ties low — already in `dist`);
    // b = the runner-up distance = 2nd element of the sorted (d, cl)
    // structs (if the top-2 distances tie, a == b and s == 0 either way)
    val sorted = sort_array(array(dists: _*))
    assigned
      .withColumn("__b", sorted(1)("d"))
      .withColumn("__s", round(
        when(greatest(col("dist"), col("__b")) === 0.0, 0.0)
          .otherwise((col("__b") - col("dist")) / greatest(col("dist"), col("__b"))), 6))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        round(avg(col("__s")), 6).as("mean_silhouette"),
        round(min(col("__s")), 6).as("min_silhouette"))
  }

  /** Per-group centroid outliers: the `k` vectors farthest (euclidean)
    * from their own group's mean vector — the embedding-space anomaly
    * screen of a curation pipeline (mislabeled / off-distribution docs
    * sit far from their group centroid). Returns (groupCol, idCol, rk,
    * dist) with rk 1..k per group, farthest first.
    *
    * Deterministic and engine-replayable by the same construction as
    * [[kmeans]]: centroid components snap to exact micro-units so
    * distributed mean order cannot leak; per-row distances round to
    * 6 dp BEFORE ranking; ties break on the id.
    *
    * Scale shape: one partial-aggregating `groupBy(group)` for the
    * centroids (group-count rows — broadcast back), one map stage for
    * distances, then a TWO-STAGE top-k: groups are few (labels,
    * sources) while rows are billions, so a single per-group window
    * would sort whole groups on single reducers — instead a local
    * top-k per (group, id-hash shard) prunes to ≤ shards·k rows per
    * group (a row's shard rank lower-bounds its group rank, so every
    * global top-k row survives — the [[graft.ops.TextAnalytics
    * .stratifiedQuota]] argument), then the exact global rank runs on
    * that sliver. No all-pairs, no driver data beyond the centroid
    * matrix. */
  def centroidOutliers(vecs: DataFrame, idCol: String, vecCol: String,
      groupCol: String, dim: Int, k: Int, shards: Int = 64): DataFrame = {
    require(k > 0 && dim > 0 && shards > 0, "k, dim, shards must be positive")
    val v = vecs.select(col(groupCol).as("__g"), col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val meanCols = (0 until dim).map(i =>
      (round(avg(col("__v")(i)) * 1000000.0).cast("long") / 1000000.0).as(s"__c$i"))
    val centroids = v.groupBy(col("__g"))
      .agg(meanCols.head, meanCols.tail: _*)
      .select(col("__g"), array((0 until dim).map(i => col(s"__c$i")): _*).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
    val wLocal = w.partitionBy(col("__g"), col("__shard"))
      .orderBy(col("dist").desc, col("__id").asc)
    val wGlobal = w.partitionBy(col("__g"))
      .orderBy(col("dist").desc, col("__id").asc)
    v.join(broadcast(centroids), "__g")
      .withColumn("dist",
        round(VectorFunctions.euclideanDistance(col("__v"), col("__c")), 6))
      .withColumn("__shard", pmod(TextAnalytics.portableIdHash(col("__id")), lit(shards)))
      .withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= k)
      .withColumn("rk", row_number().over(wGlobal))
      .filter(col("rk") <= k)
      .select(col("__g").as(groupCol), col("__id").as(idCol), col("rk"), col("dist"))
  }

  /** Cluster labeling: the top-`topK` terms per cluster by cluster-level
    * TF-IDF (tf = term occurrences in the cluster's documents, df =
    * number of clusters containing the term, N = cluster count) — the
    * "what is each cluster about" report a curation pass reads after
    * [[kmeans]]. Scores are 6 dp-rounded BEFORE ranking, ties on the
    * word.
    *
    * Scale shape: one broadcast-able join of the (corpus-tiny) cluster
    * assignment onto documents, one token explode into a
    * (clusters × vocab)-sized count — partial-agg'd map-side — and a
    * window over that small table; nCluster rows is never more than k. */
  def clusterKeywords(docs: DataFrame, idCol: String, textCol: String,
      assignments: DataFrame, assignIdCol: String, clusterCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val words = docs.join(assignments.select(col(assignIdCol).as(idCol),
        col(clusterCol)), idCol)
      .select(col(clusterCol),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
    val tf = words.groupBy(col(clusterCol), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    val dfq = tf.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
    val nCl = tf.select(col(clusterCol)).distinct()
      .agg(count(lit(1)).as("__ncl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol)).orderBy(col("tfidf").desc, col("__w").asc)
    tf.join(broadcast(dfq), "__w").crossJoin(broadcast(nCl))
      .withColumn("tfidf", round(col("__tf").cast("double") *
        log(col("__ncl").cast("double") / col("__df").cast("double")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col(clusterCol), col("__w").as("keyword"), col("rk"), col("tfidf"))
  }
}
