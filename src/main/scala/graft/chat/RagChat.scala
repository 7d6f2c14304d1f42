package graft.chat

import graft.embed.Embedder
import graft.search.{Citations, SearchOptions, VectorSearch}
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's full RAG ask flow (chat_llm.py:116-163 `ask_llm`):
  * search the database, dump `contexts.txt`/`metadata.txt`, assemble
  * the augmented prompt, stream the completion token-by-token, then
  * the citation table. The Spark work (search top-k, prompt
  * aggregation, citation groupBy) and the driver work (HTTP stream)
  * are composed here and nowhere else — the engine layers stay
  * independently testable. */
object RagChat {

  final case class RagResult(response: String, citations: DataFrame)

  /** One ask. `onToken` receives each streamed delta and then the
    * reference's trailing newline emission (chat_llm.py:150). Raises
    * IllegalArgumentException("No relevant contexts found.") on an
    * empty hit set — reference-exact (chat_llm.py:43-44), BEFORE any
    * HTTP traffic. `dumpDir` (default: the db directory) receives the
    * pre-LLM `contexts.txt`/`metadata.txt` side-effect files. */
  def ask(spark: SparkSession, dbDir: String, query: String,
      embedder: Embedder, client: ChatClient,
      opts: SearchOptions = SearchOptions(),
      dumpDir: Option[String] = None,
      onToken: String => Unit = _ => ()): RagResult = {
    val metric = VectorStore.readManifest(dbDir).distanceMetric
    val hits = VectorSearch.search(spark, dbDir, query, embedder, opts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the k-row hit set feeds three consumers (dump, prompt,
      // citations) — materialized once via the persist above
      require(hits.limit(1).count() > 0, "No relevant contexts found.")
      VectorSearch.dumpContexts(hits, dumpDir.getOrElse(dbDir), metric)
      val prompt = VectorSearch.ragPrompt(hits, ChatClient.RagString, query, metric)
      val messages = Seq(
        ChatMessage("system", ChatClient.SystemMessage),
        ChatMessage("user", prompt))
      val response = client.chatStream(messages, onToken)
      onToken("\n")
      // localCheckpoint (eager) cuts the citation frame's lineage off
      // the hit cache so the unpersist below cannot trigger a re-search
      // when the caller consumes the citations
      RagResult(response, Citations.aggregate(hits).localCheckpoint(true))
    } finally hits.unpersist()
  }
}
