package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived graphs.
  *
  * The near-dup pair graph (Dedup.jaccardPairs et al.) is more than a
  * dedup input: its structure ranks documents by how central they are
  * to a duplication neighborhood, which curation pipelines use to pick
  * canonical/representative docs (the web-scale analogue ranks hosts
  * on the link graph before crawling — the reference app has no graph
  * ops, this is pure scale extension surface). PageRank here is the
  * standard damped power iteration, but carried out ENTIRELY in exact
  * integer micro-units (floor division at every step), so a fixed
  * iteration count yields bit-identical ranks on any partitioning and
  * in any engine that replays the same integer recurrence — the DuckDB
  * oracle unrolls the iterations as chained CTEs with `//`.
  *
  * Global recurrence (all Long micro-units of total mass 1e6):
  *   init(v)   = 1_000_000 div N
  *   contrib(u)= rank(u) div outdeg(u)
  *   rank'(v)  = (150_000 div N) + (17 * Σ_{u→v} contrib(u)) div 20
  * i.e. damping 0.85 = 17/20 and teleport (1-d)/N, with floors. The
  * PERSONALIZED variant restricts both init and teleport mass to a
  * seed set S (each seed gets 1_000_000 div |S| / 150_000 div |S|,
  * non-seeds 0) — rank then measures proximity to the seeds, the
  * query-expansion / "more like these" form. Floors leak a few
  * micro-units of mass per round — irrelevant for ranking, and the
  * price of exact cross-engine replay (float power iteration is
  * order-dependent under Spark's non-deterministic sum order).
  *
  * Scale shape: one equi-join (edges ⋈ ranks on src) plus one groupBy
  * (dst) per round, both over the EDGE frame only — never the corpus.
  * Edges+degrees are localCheckpoint'ed once and each round's ranks
  * re-checkpointed, so both the PHYSICAL lineage and the LOGICAL plan
  * stay depth-1 at any iteration count (see the in-body note: with
  * persist alone, Catalyst re-analysis of the embedded input plan
  * dominated wall time 50:1 on a real near-dup graph). A near-dup
  * pair graph is corpus-tiny by construction (it IS the found
  * duplication), so even at 100 TB corpus scale the per-round
  * shuffles are small; for genuinely huge graphs the shape is still
  * the canonical distributed PageRank (no driver collect anywhere).
  */
object GraphOps {

  /** The shared power-iteration loop. `nodes` must already be a
    * checkpointed (id, init_micro, tele_micro) frame; `e` a
    * checkpointed (src, dst) frame. */
  private def prLoop(e: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // one checkpointed (src, dst, deg) frame reused every round
    val edgeDeg = e.join(deg, "src").localCheckpoint()
    var ranks = nodes.select(col("id"), col("init_micro").as("rank_micro"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edgeDeg
        .join(ranks, edgeDeg("src") === ranks("id"))
        .select(col("dst"), expr("rank_micro div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_micro"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(nodes("id"),
          (col("tele_micro") +
            expr("(17 * coalesce(in_micro, 0L)) div 20")).as("rank_micro"))
        .localCheckpoint() // eager: materializes the round, depth-1 lineage
    }
    // superseded checkpoint blocks are released by the ContextCleaner
    // once unreferenced; the caller's unpersist() on the result is a
    // harmless no-op (kept for contract symmetry with the pair ops)
    ranks
  }

  /** Checkpointed (src, dst) edge projection + distinct node frame.
    * LINEAGE TRUNCATION, not just caching: every round's frame embeds
    * its inputs' LOGICAL plans, and cache substitution only happens at
    * physical planning — so if `edges` arrives with a deep plan (e.g.
    * a jaccard pair pipeline), each round would re-analyze a tree
    * containing dozens of copies of it. Measured on the 250k-edge
    * near-dup graph: 99 s with persist-only (all of it Catalyst
    * analysis), ~2 s with localCheckpoint. The checkpointed frames
    * are LogicalRDD leaves — O(1) plan size per round at any
    * iteration count. (On a multi-executor cluster prefer reliable
    * checkpoint() for the same truncation if executor loss matters;
    * the blocks here are also persisted MEMORY_AND_DISK.) The edge
    * projection is truncated FIRST so the input plan is analyzed
    * exactly once — everything else derives from the leaf. */
  private def edgeNodeFrames(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val ids = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    (e, ids)
  }

  /** Directed PageRank in exact integer micro-units; see object doc.
    * `edges` rows are (src, dst) arcs; node set = all endpoint ids
    * (sinks redistribute nothing — their mass leaves, matching the
    * plain recurrence the oracle replays). Returns (id, rank_micro). */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 0, s"pageRankMicro: iters must be >= 0, got $iters")
    val (e, ids) = edgeNodeFrames(edges, srcCol, dstCol)
    val n = ids.count()
    require(n > 0, "pageRankMicro: empty edge frame")
    val nodes = ids
      .withColumn("init_micro", lit(1000000L / n))
      .withColumn("tele_micro", lit(150000L / n))
    prLoop(e, nodes, iters)
  }

  /** PERSONALIZED PageRank: init + teleport mass restricted to the
    * seed id set — ranks measure graph proximity to the seeds ("more
    * like these" expansion of a hit set over the similarity graph).
    * `seeds` is a one-column frame of ids; seeds not present in the
    * graph contribute nothing (they are dropped by the node
    * intersection — |S| counts only seeds that ARE nodes, matching
    * the oracle's seed CTE). Broadcast semi-join tags seeds; the loop
    * shape is identical to the global variant. */
  def personalizedPageRankMicro(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, s"personalizedPageRankMicro: iters must be >= 0, got $iters")
    val (e, ids) = edgeNodeFrames(edges, srcCol, dstCol)
    val seedIds = seeds.toDF("id")
    val flagged = ids.join(broadcast(seedIds.withColumn("__seed", lit(1))),
        Seq("id"), "left")
      .withColumn("__seed", coalesce(col("__seed"), lit(0)))
      .localCheckpoint()
    val s = flagged.filter(col("__seed") === 1).count()
    require(s > 0, "personalizedPageRankMicro: no seed is a graph node")
    val nodes = flagged
      .withColumn("init_micro",
        when(col("__seed") === 1, lit(1000000L / s)).otherwise(lit(0L)))
      .withColumn("tele_micro",
        when(col("__seed") === 1, lit(150000L / s)).otherwise(lit(0L)))
      .select("id", "init_micro", "tele_micro")
    prLoop(e, nodes, iters)
  }

  /** Undirected wrapper: each pair (id_a, id_b) becomes both arcs, so
    * rank flows both ways — the natural form for similarity graphs. */
  def pageRankUndirected(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 5): DataFrame = {
    val arcs = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    pageRankMicro(arcs, "src", "dst", iters)
  }

  /** Undirected personalized wrapper; see [[personalizedPageRankMicro]]. */
  def personalizedPageRankUndirected(pairs: DataFrame, seeds: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      iters: Int = 5): DataFrame = {
    val arcs = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    personalizedPageRankMicro(arcs, "src", "dst", seeds, iters)
  }

  /** [[pageRankUndirected]] over the COLLAPSED pair graph (the
    * `jaccardPairsCollapsed(sideDir=…)` products) — identical
    * (id, rank_micro) rows to running the loop on the expanded pairs
    * (OpsSpec-asserted), at quotient-graph cost.
    *
    * Why exact: clone classes are STRUCTURALLY SYMMETRIC in the
    * expanded graph (every member of A links all members of adjacent
    * classes, plus its w−1 siblings when A's clique pairs were
    * emitted), so by induction every member of A carries the same
    * rank r_A, the same degree deg_A = (w_A−1)·[clique] + Σ_B w_B,
    * and the same per-arc contribution c_A = r_A div deg_A — and the
    * member recurrence collapses to the class recurrence
    * in_A = [clique]·(w_A−1)·c_A + Σ_B w_B·c_B,
    * r_A' = tele + (17·in_A) div 20, all in the SAME integer
    * micro-unit arithmetic as [[pageRankMicro]] (teleport and init
    * use the EXPANDED node count n = Σ w). The expanded sf10 graph is
    * ~25M clique edges × 2 arcs × 5 rounds; the quotient graph is
    * distinct-corpus-sized. */
  def pageRankUndirectedCollapsed(classes: DataFrame, repPairs: DataFrame,
      withinReps: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, s"pageRankUndirectedCollapsed: iters must be >= 0, got $iters")
    val (cls, adj, n) = quotientGraph(classes, repPairs, withinReps)
    require(n > 0, "pageRankUndirectedCollapsed: empty graph")
    var ranks = cls.select(col("rep"), lit(1000000L / n).as("rank_micro"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ranks.join(cls.select("rep", "w", "wi", "deg"), Seq("rep"))
        .select(col("rep"), col("w"), col("wi"),
          expr("rank_micro div deg").as("c"))
      val nbr = adj.join(contrib.select(col("rep").as("b"),
          (col("w") * col("c")).as("wc")), Seq("b"))
        .groupBy("a").agg(sum(col("wc")).as("nin"))
      ranks = contrib
        .join(nbr.withColumnRenamed("a", "rep"), Seq("rep"), "left")
        .select(col("rep"),
          (lit(150000L / n) +
            expr("(17 * ((w - 1) * wi * c + coalesce(nin, 0L))) div 20"))
            .as("rank_micro"))
        .localCheckpoint()
    }
    cls.select(col("rep"), col("members")).join(ranks, Seq("rep"))
      .select(explode(col("members")).as("id"), col("rank_micro"))
  }

  /** Personalized twin of [[pageRankUndirectedCollapsed]]: seed
    * membership refines each class into at most two STRUCTURALLY
    * SYMMETRIC member types (seed / non-seed — degrees are class
    * constants either way), so ranks are constant per (class, type)
    * and the quotient recurrence runs over typed class rows:
    * with m_A = s_A·c_{A,seed} + (w_A−s_A)·c_{A,non} (the total
    * contribution mass of A's members),
    * in_{A,t} = [clique]·(m_A − c_{A,t}) + Σ_B m_B and
    * r'_{A,t} = tele_t + (17·in) div 20 — the same integer micro
    * arithmetic, with init/teleport mass 1000000/s · [t=seed] over
    * s = Σ s_A seeds that are graph nodes, exactly
    * [[personalizedPageRankMicro]]'s. */
  def personalizedPageRankUndirectedCollapsed(classes: DataFrame,
      repPairs: DataFrame, withinReps: DataFrame, seeds: DataFrame,
      iters: Int = 5): DataFrame = {
    require(iters >= 0,
      s"personalizedPageRankUndirectedCollapsed: iters must be >= 0, got $iters")
    val (cls, adj, _) = quotientGraph(classes, repPairs, withinReps)
    val seedIds = seeds.toDF("id")
    // per-class seed count (one linear member pass)
    val sCnt = cls.select(col("rep"), explode(col("members")).as("id"))
      .join(broadcast(seedIds), Seq("id"), "left_semi")
      .groupBy("rep").agg(count(lit(1)).as("s"))
    val typed0 = cls.join(sCnt, Seq("rep"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
    val s = typed0.agg(coalesce(sum(col("s")), lit(0L))).head.getLong(0)
    require(s > 0, "personalizedPageRankUndirectedCollapsed: no seed is a graph node")
    // (class, type) rows with member counts; empty types dropped
    val typed = typed0
      .select(col("rep"), col("members"), col("w"), col("wi"), col("deg"),
        explode(expr("array(struct(1 AS t, s AS cnt), " +
          "struct(0 AS t, w - s AS cnt))")).as("ty"))
      .select(col("rep"), col("members"), col("w"), col("wi"), col("deg"),
        col("ty.t").as("t"), col("ty.cnt").as("cnt"))
      .filter(col("cnt") > 0)
      .localCheckpoint()
    var ranks = typed.select(col("rep"), col("t"),
        when(col("t") === 1, lit(1000000L / s)).otherwise(lit(0L))
          .as("rank_micro"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(typed.select("rep", "t", "cnt", "wi", "deg"), Seq("rep", "t"))
        .select(col("rep"), col("t"), col("cnt"), col("wi"),
          expr("rank_micro div deg").as("c"))
        .localCheckpoint() // consumed by the mass rollup AND the update
      val mass = contrib.groupBy("rep")
        .agg(sum(col("cnt") * col("c")).as("m"))
      val nbr = adj.join(mass.withColumnRenamed("rep", "b"), Seq("b"))
        .groupBy("a").agg(sum(col("m")).as("nin"))
      ranks = contrib
        .join(mass, Seq("rep"))
        .join(nbr.withColumnRenamed("a", "rep"), Seq("rep"), "left")
        .select(col("rep"), col("t"),
          (when(col("t") === 1, lit(150000L / s)).otherwise(lit(0L)) +
            expr("(17 * (wi * (m - c) + coalesce(nin, 0L))) div 20"))
            .as("rank_micro"))
        .localCheckpoint()
    }
    // expand: seed members take the seed-type rank, the rest non-seed
    val members = typed.select(col("rep"), explode(col("members")).as("id"))
      .distinct() // typed carries ≤ 2 rows per class
      .join(broadcast(seedIds.withColumn("__sd", lit(1))), Seq("id"), "left")
      .select(col("rep"), col("id"),
        coalesce(col("__sd"), lit(0)).as("t"))
    members.join(ranks, Seq("rep", "t")).select(col("id"), col("rank_micro"))
  }

  /** Shared quotient-graph construction for the collapsed PageRank
    * family: in-graph classes with clique flag `wi`, member degree
    * `deg` (a class constant), the rep adjacency (both directions),
    * and the EXPANDED node count Σ w. */
  private def quotientGraph(classes: DataFrame, repPairs: DataFrame,
      withinReps: DataFrame): (DataFrame, DataFrame, Long) = {
    val within = withinReps.select(col("rep")).withColumn("__wi", lit(1L))
    val adj = repPairs.select(col("rep_a").as("a"), col("rep_b").as("b"))
      .unionByName(repPairs.select(col("rep_b").as("a"), col("rep_a").as("b")))
      .localCheckpoint()
    val inGraph = adj.select(col("a").as("rep"))
      .unionByName(within.select("rep")).distinct()
    val base = classes.join(inGraph, Seq("rep"), "left_semi")
      .join(within, Seq("rep"), "left")
      .select(col("rep"), col("members"), col("w"),
        coalesce(col("__wi"), lit(0L)).as("wi"))
    val nbrW = adj.join(base.select(col("rep").as("b"), col("w").as("wb")), Seq("b"))
      .groupBy("a").agg(sum(col("wb")).as("adjw"))
    val cls = base.join(nbrW.withColumnRenamed("a", "rep"), Seq("rep"), "left")
      .select(col("rep"), col("members"), col("w"), col("wi"),
        ((col("w") - 1L) * col("wi") + coalesce(col("adjw"), lit(0L))).as("deg"))
      .localCheckpoint()
    val n = cls.agg(coalesce(sum(col("w")), lit(0L))).head.getLong(0)
    (cls, adj, n)
  }

  /** Exact triangle count with the degree-ordered orientation (Suri &
    * Vassilvitskii 2011) — the distributed-graph shape that survives
    * skew: every undirected edge orients from its lower (degree, id)
    * endpoint to the higher, so each node's OUT-degree is
    * O(√m) regardless of its real degree (a celebrity node of degree
    * 10⁶ emits no wedges — its neighbors point AT it), and every
    * triangle is generated by exactly one wedge at its lowest-order
    * corner. Two shuffles: wedge generation (self-join on the wedge
    * apex) and the closing-edge semi-join. A naive wedge join on raw
    * edges is Σ deg² — one hot node detonates it; this is Σ outdeg²
    * ≤ m^1.5.
    *
    * Input: undirected pairs (any orientation, duplicates fine).
    * Returns one row (n_nodes, n_edges, n_wedges, n_triangles,
    * clustering = 3·T / wedges, 6 dp). */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("x"))
      .unionByName(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // total order (d, x): orient each edge low → high
    val withDeg = e
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
    val oriented = withDeg.select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
    val ordDeg = deg // (x, d) — the order key both joins reuse
    // wedges at apex a: unordered pair {b1, b2}, emitted once with
    // b1 before b2 in the SAME (d, id) order the orientation uses
    val o1 = oriented.select(col("a"), col("b").as("b1"))
    val o2 = oriented.select(col("a"), col("b").as("b2"))
    val wedges = o1.join(o2, "a")
      .join(ordDeg.select(col("x").as("b1"), col("d").as("d1")), "b1")
      .join(ordDeg.select(col("x").as("b2"), col("d").as("d2")), "b2")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("b1") < col("b2")))
    // a triangle closes iff the oriented edge b1 → b2 exists
    val closing = oriented.select(col("a").as("ca"), col("b").as("cb"))
    val tri = wedges.join(closing,
      wedges("b1") === closing("ca") && wedges("b2") === closing("cb"),
      "left_semi")
    val nNodes = deg.count()
    val nEdges = e.count()
    val nWedges = deg.agg(
      sum((col("d") * (col("d") - 1) / 2).cast("long"))).head().getLong(0)
    val nTri = tri.count()
    val cc =
      if (nWedges == 0L) 0.0
      else BigDecimal(3.0 * nTri / nWedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark = pairs.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, nWedges, nTri, cc))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
  }
}
