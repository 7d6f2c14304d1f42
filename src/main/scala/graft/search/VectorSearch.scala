package graft.search

import graft.embed.Embedder
import graft.functions.{TextFunctions, VectorFunctions}
import graft.store.VectorStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (flat) vector search with the reference's full post-filter
  * chain (QueryVectorDB.search, vector_db_query.py:136-267; SURVEY.md
  * §3.1). The plan shape is:
  *
  *   chunks scan → distance expr → TakeOrderedAndProject(k)
  *     → batch similarity conversion → threshold / keyword / type filters
  *
  * Everything before the take is exchange-free and whole-stage-codegen'd
  * (per-partition top-k heaps, driver merges k·numPartitions rows).
  * Filters run ABOVE the take on purpose: the reference bounds the
  * candidate set at k first and never backfills after filtering
  * (SURVEY.md §7.4 #3) — pushing them down would change results.
  */
object SearchOptions {
  val DefaultK = 6          // config.py:28 "contexts"
  val DefaultThreshold = 0.4 // config.py:29 "similarity"
}

final case class SearchOptions(
    k: Int = SearchOptions.DefaultK,
    scoreThreshold: Double = SearchOptions.DefaultThreshold,
    searchTerm: String = "",
    documentTypes: String = "")

object VectorSearch {

  /** Distance of a stored vector to the query under the manifest metric.
    * Only "cosine" is ever written by the creator
    * (vector_db_creator.py:210) but all metrics are reachable by
    * manifest edit, so all are supported (vector_db_query.py:170-202). */
  def distanceColumn(metric: String, vec: Column, query: Column): Column = metric match {
    case "l2" => VectorFunctions.euclideanDistance(vec, query)
    case "sum_of_squares" =>
      val d = VectorFunctions.euclideanDistance(vec, query); d * d
    case "inner_product" => VectorFunctions.dotProduct(vec, query)
    case _ => VectorFunctions.cosineDistance(vec, query)
  }

  /** Top-k selection order for a raw `distance` column: smaller is
    * nearer for every metric EXCEPT inner_product, where the index
    * returns the LARGEST dot products (the reference's conversion,
    * vector_db_query.py:188-197, presumes exactly that: higher distance
    * ⇒ higher similarity). Ranking ascending-by-dot would select the k
    * LEAST similar vectors. */
  def rankOrder(metric: String, distance: Column): Column =
    if (metric == "inner_product") -distance else distance

  /** O4 — distance → similarity_score on the k-row hit batch
    * (vector_db_query.py:170-202). The l2 / sum_of_squares /
    * inner_product conversions are BATCH-RELATIVE (normalized by the
    * max/min of the returned top-k), so they must run after the take —
    * expressed as window aggregates partitioned by `batchCols` (empty =
    * the single-query case; query_id for batched search).
    *
    * PRECONDITION (empty `batchCols` only): `hits` must already be a
    * bounded top-k batch — ≤ k rows, as produced by [[searchChunks]]'s
    * take. The single-query path materializes the batch as ONE
    * collect_list array row to compute the batch stats without a
    * partition-less window; an unbounded input would put the whole
    * frame into a single array value in one task. With non-empty
    * `batchCols` the window is a real partitioned one and the input
    * may be any size. */
  def withSimilarity(hits: DataFrame, metric: String,
      batchCols: Seq[String] = Nil): DataFrame = {
    val d = col("distance")
    def sim(maxD: Column, minD: Column): Column = metric match {
      case "cosine" => TextFunctions.clip01(lit(1.0) - d)
      case "l2" | "sum_of_squares" =>
        TextFunctions.clip01(when(maxD > 0.0, lit(1.0) - d / maxD).otherwise(lit(1.0)))
      case "inner_product" =>
        // NB: no clip in this branch, and "all equal" ⇒ 1.0 (:188-197)
        when(maxD > minD, (d - minD) / (maxD - minD)).otherwise(lit(1.0))
      case _ => TextFunctions.clip01(lit(1.0) - (d * d) / 2.0)
    }
    val batchRelative = metric match {
      case "l2" | "sum_of_squares" | "inner_product" => true
      case _ => false
    }
    if (!batchRelative) {
      // cosine / unknown metrics are pointwise — no batch stats needed
      hits.withColumn("similarity_score", sim(lit(null), lit(null)))
    } else if (batchCols.nonEmpty) {
      // batched search: a real partition key — a declared, skew-free
      // window over k rows per query
      val w = Window.partitionBy(batchCols.map(col): _*)
      hits.withColumn("similarity_score", sim(max(d).over(w), min(d).over(w)))
    } else {
      // single-query case: the batch is ≤k rows by construction. A
      // partition-less window would warn ("No Partition Defined") and
      // `partitionBy(lit(0))` is erased by Spark 4's
      // EliminateWindowPartitions — so compute the batch stats and the
      // rows in ONE scalar aggregation pass (collect_list is safe: ≤k
      // rows) and re-explode. No window, no second scan of the take.
      val cols = hits.columns
      hits
        .agg(max(d).as("__maxd"), min(d).as("__mind"),
          collect_list(struct(cols.map(col): _*)).as("__rows"))
        .select(col("__maxd"), col("__mind"), explode(col("__rows")).as("__r"))
        .select(cols.map(c => col(s"__r.`$c`").as(c)) :+
          sim(col("__maxd"), col("__mind")).as("similarity_score"): _*)
    }
  }

  /** Core single-query search over a chunks DataFrame. `queryVec` is a
    * literal array — broadcast to every task inside the codegen'd
    * distance expression, no join, no shuffle before the take. */
  def searchChunks(chunks: DataFrame, queryVec: Array[Float], metric: String,
      opts: SearchOptions): DataFrame = {
    val q = lit(queryVec.map(_.toDouble))
    val hits = chunks
      .withColumn("distance", distanceColumn(metric, col("vector"), q))
      .orderBy(rankOrder(metric, col("distance")).asc)
      .limit(opts.k)
    withSimilarity(hits, metric)
      .filter(col("similarity_score") >= lit(opts.scoreThreshold)) // P4 (:206-213)
      .filter(TextFunctions.keywordPredicate(col("text"), opts.searchTerm)) // P5 (:247-254)
      .filter(TextFunctions.docTypePredicate(col("document_type"), opts.documentTypes)) // P6 (:256-261)
      .orderBy(rankOrder(metric, col("distance")).asc) // O5 — index order = nearest first
  }

  /** Full entry point against a stored database: embeds the query with
    * the database's embedder (prompt-prefixed, embedding_models.py:155-157)
    * and searches under the manifest's metric. */
  def search(spark: SparkSession, dbDir: String, query: String,
      embedder: Embedder, opts: SearchOptions = SearchOptions()): DataFrame = {
    val metric = VectorStore.readManifest(dbDir).distanceMetric
    val qv = embedder.embedQuery(spark, query)
    searchChunks(VectorStore.chunks(spark, dbDir), qv, metric, opts)
  }

  /** The O2→O4→P4-P6 chain for PURE-SQL users — the plan behind the
    * `graft_search(db, query[, k, threshold, term, types])`
    * table-valued function that [[graft.GraftExtensions]] registers:
    *
    * {{{
    *   SELECT id, text, distance, similarity_score
    *   FROM graft_search('/data/db', 'what is spark', 6, 0.4)
    * }}}
    *
    * The embedder is resolved FROM the manifest's model tag, so the
    * SQL caller never touches driver code: the tag must be EXACTLY
    * `DeterministicEmbedder` (resolved with its default empty
    * queryPrompt — the manifest stores only the class tag, so a db
    * built with a custom prompt has state this path cannot recover
    * and belongs on the view route below). Model-path embedders
    * (ONNX/GRTF) carry state a SQL literal cannot, so those databases
    * answer SQL search through a registered view over a programmatic
    * search instead — the error says exactly that. Everything
    * downstream of the query vector IS the standard chain,
    * bit-identical to [[search]]. */
  def searchSql(spark: SparkSession, dbDir: String, query: String,
      opts: SearchOptions = SearchOptions()): DataFrame = {
    val m = VectorStore.readManifest(dbDir)
    val embedder: Embedder =
      if (m.model == "DeterministicEmbedder")
        graft.embed.DeterministicEmbedder(m.dimensions)
      else throw new IllegalArgumentException(
        s"graft_search: manifest model '${m.model}' carries state the " +
          "manifest tag cannot reconstruct (a model path, or a custom " +
          "query prompt); use a programmatic Embedder and register a " +
          "view over VectorSearch.search(...) for SQL access to this db")
    search(spark, dbDir, query, embedder, opts)
  }

  /** Batched multi-query search (the scale path: N queries × M
    * chunks) — DEFAULT physical shape is the bounded-heap aggregate
    * ([[searchBatchAgg]]): map-side partials prune each partition to k
    * rows per query before the exchange, so shuffle volume is
    * k·partitions·M regardless of corpus size (8× the window plan at
    * the 2M-vector probe, BASELINE.md). The window twin survives as
    * [[searchBatchWindow]], asserted equal in ScaleOpsSpec. */
  def searchBatch(chunks: DataFrame, queries: DataFrame, metric: String,
      opts: SearchOptions): DataFrame =
    searchBatchAgg(chunks, queries, metric, opts)

  /** Reference-twin window plan: broadcast queries against the chunk
    * scan, per-query top-k via window ranking — shuffles every scored
    * row (N·M exchange volume). Kept for plan A/B; NOT the default. */
  def searchBatchWindow(chunks: DataFrame, queries: DataFrame, metric: String,
      opts: SearchOptions): DataFrame = {
    val joined = chunks.crossJoin(broadcast(queries))
      .withColumn("distance", distanceColumn(metric, col("vector"), col("query_vector")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(rankOrder(metric, col("distance")).asc, col("id").asc)
    val topk = joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= opts.k)
      .drop("rank", "query_vector")
    withSimilarity(topk, metric, Seq("query_id"))
      .filter(col("similarity_score") >= lit(opts.scoreThreshold))
      .filter(TextFunctions.keywordPredicate(col("text"), opts.searchTerm))
      .filter(TextFunctions.docTypePredicate(col("document_type"), opts.documentTypes))
  }

  /** The bounded-shuffle physical shape behind [[searchBatch]]:
    * per-query top-k via the [[graft.functions.TopKHits]] heap
    * aggregate (map-side partial prunes every partition to k rows per
    * query — 8× the window plan at 2M vectors, see BASELINE.md), then
    * the reference's own J1 fetch-back join (vector_db_query.py:215-219)
    * re-attaches text/metadata to the k·M surviving ids, and the
    * similarity conversion + post-filter chain runs unchanged.
    * Identical results to [[searchBatchWindow]]. */
  def searchBatchAgg(chunks: DataFrame, queries: DataFrame, metric: String,
      opts: SearchOptions): DataFrame = {
    val scored = chunks.select(col("id"), col("vector")).crossJoin(broadcast(queries))
      .withColumn("distance", distanceColumn(metric, col("vector"), col("query_vector")))
    // TopKHits keeps the LARGEST scores: feed -rankOrder so "nearest"
    // wins under every metric (raw dot for inner_product, negated
    // distance otherwise), then invert back to the raw distance.
    val hits = scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions.topKHits(
        -rankOrder(metric, col("distance")), col("id"), opts.k).as("hs"))
      .select(col("query_id"), explode(col("hs")).as("h"))
      .select(col("query_id"), col("h.id").as("id"),
        (-rankOrder(metric, col("h.score"))).as("distance"))
    val fetched = broadcast(hits).join(chunks.drop("vector"), "id")
    withSimilarity(fetched, metric, Seq("query_id"))
      .filter(col("similarity_score") >= lit(opts.scoreThreshold))
      .filter(TextFunctions.keywordPredicate(col("text"), opts.searchTerm))
      .filter(TextFunctions.docTypePredicate(col("document_type"), opts.documentTypes))
  }

  /** RAG prompt assembly, byte-exact to the reference
    * (chat_llm.py:45-50): `ragString`, a `\n\n---\n\n` rule, the
    * contexts joined with the same rule in hit order (nearest first),
    * then a five-dash `\n\n-----\n\n` rule before the user question.
    * Ordering is done IN-aggregate —
    * `array_sort(collect_list(struct(...)))` — because a pre-aggregate
    * `orderBy` is not guaranteed to survive into `collect_list` once an
    * exchange sits between them; the sorted-struct form is reproducible
    * under any partitioning. */
  def ragPrompt(hits: DataFrame, ragString: String, question: String,
      metric: String = "cosine"): String = {
    val ctx = hits
      .agg(array_join(transform(
        array_sort(collect_list(struct(
          rankOrder(metric, col("distance")).as("r"),
          col("id").as("i"), // tie-break by id, matching searchBatch + the oracle
          col("text").as("txt")))),
        x => x.getField("txt")), "\n\n---\n\n").as("ctx"))
      .head().getString(0)
    s"$ragString\n\n---\n\n$ctx\n\n-----\n\n$question"
  }

  /** Side-effect parity with the reference's pre-LLM dump files
    * (chat_llm.py:34-40): `contexts.txt` gets each hit's text followed
    * by a `\n\n---\n\n` rule, `metadata.txt` one JSON metadata line per
    * hit, both in rank order (distance rank, ties to the lower id —
    * the same order [[ragPrompt]] assembles). Driver-side file writes:
    * the input is a k-row search result, not a distributed table. */
  def dumpContexts(hits: DataFrame, outDir: String, metric: String = "cosine"): Unit = {
    val metaCols = hits.columns.filter(c =>
      c != "text" && c != "vector" && c != "distance" && c != "similarity_score")
    val rows = hits
      .orderBy(rankOrder(metric, col("distance")).asc, col("id").asc)
      .select((col("text") +: metaCols.map(col)): _*)
      .collect()
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    val contexts = new StringBuilder
    val metadata = new StringBuilder
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    rows.foreach { r =>
      contexts.append(r.getString(0)).append("\n\n---\n\n")
      val node = mapper.createObjectNode()
      metaCols.zipWithIndex.foreach { case (c, i) =>
        node.put(c, if (r.isNullAt(i + 1)) null else String.valueOf(r.get(i + 1)))
      }
      metadata.append(mapper.writeValueAsString(node)).append('\n')
    }
    java.nio.file.Files.write(dir.resolve("contexts.txt"),
      contexts.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(dir.resolve("metadata.txt"),
      metadata.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
