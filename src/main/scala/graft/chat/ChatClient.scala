package graft.chat

import com.fasterxml.jackson.databind.ObjectMapper

/** OpenAI-protocol chat-completion client — the reference's LLM layer
  * (chat_llm.py:56-113) re-expressed on the JDK HTTP stack. The
  * reference talks to either a local LM Studio server or the OpenAI
  * API through the `openai` SDK with `stream=True` and consumes
  * server-sent-event deltas token by token; here the wire protocol
  * (POST `{base}/chat/completions`, `Authorization: Bearer`, SSE
  * `data:` frames, `choices[0].delta.content`, `[DONE]` terminator)
  * is implemented directly so the engine has no SDK dependency and
  * the whole layer is testable against an in-process HTTP server.
  *
  * This is DRIVER-side orchestration by design: one query → one
  * completion stream. Nothing here touches executors — the Spark side
  * of a RAG ask (search, prompt assembly, citations) stays in
  * [[graft.search.VectorSearch]]/[[graft.search.Citations]], and
  * [[RagChat.ask]] composes the two. */
trait LlmStrategy {
  /** Server base URL including the version segment, e.g.
    * `http://localhost:1234/v1` (config.yaml `server.connection_str`
    * in the reference). */
  def baseUrl: String
  /** Bearer token for the Authorization header. */
  def apiKey: String
  /** JSON body for POST /chat/completions. */
  def completionBody(messages: Seq[ChatMessage]): String
  /** LM Studio emits a leading space on the first token; the
    * reference lstrips it (chat_llm.py:85-86, 143-146). */
  def stripLeadingSpace: Boolean

  protected def baseBody(messages: Seq[ChatMessage], model: String): com.fasterxml.jackson.databind.node.ObjectNode = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("model", model)
    val arr = node.putArray("messages")
    messages.foreach { m =>
      val o = arr.addObject(); o.put("role", m.role); o.put("content", m.content)
    }
    node.put("stream", true)
    node
  }
}

final case class ChatMessage(role: String, content: String)

/** LM Studio strategy (chat_llm.py:70-88): fixed dummy key, fixed
  * `local-model` id (the server routes to whatever is loaded), no
  * temperature override, first-token space strip ON. */
final case class LmStudioStrategy(baseUrl: String) extends LlmStrategy {
  override val apiKey: String = "lm-studio"
  override def completionBody(messages: Seq[ChatMessage]): String =
    baseBody(messages, "local-model").toString
  override def stripLeadingSpace: Boolean = true
}

/** OpenAI strategy (chat_llm.py:90-113): real key required (the
  * reference raises with a settings hint when unset — same failure
  * here, at construction), configured model, temperature 0.1, no
  * space strip. */
final case class OpenAiStrategy(apiKey: String, model: String,
    baseUrl: String = "https://api.openai.com/v1") extends LlmStrategy {
  require(apiKey != null && apiKey.nonEmpty,
    "OpenAI API key not found in config. Please set it before creating the client.")
  override def completionBody(messages: Seq[ChatMessage]): String = {
    val node = baseBody(messages, model)
    node.put("temperature", 0.1)
    node.toString
  }
  override def stripLeadingSpace: Boolean = false
}

/** Streaming chat client over `java.net.http`. One instance per
  * strategy; the underlying HttpClient is shared and immutable. */
final class ChatClient(strategy: LlmStrategy,
    http: java.net.http.HttpClient = ChatClient.defaultHttp) {
  import java.net.http.{HttpRequest, HttpResponse}

  /** POST the completion request and stream deltas. `onToken` fires
    * once per non-empty content delta, in arrival order, after the
    * strategy's first-token space strip; returns the concatenated
    * response (chat_llm.py:128-148: accumulate `full_response` while
    * emitting each chunk). Non-2xx → IllegalStateException with the
    * status and body. */
  def chatStream(messages: Seq[ChatMessage], onToken: String => Unit): String = {
    val req = HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        strategy.baseUrl.stripSuffix("/") + "/chat/completions"))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer ${strategy.apiKey}")
      .POST(HttpRequest.BodyPublishers.ofString(strategy.completionBody(messages)))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofInputStream())
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      resp.body(), java.nio.charset.StandardCharsets.UTF_8))
    try {
      if (resp.statusCode() / 100 != 2) {
        val body = reader.lines().iterator()
        val sb = new StringBuilder
        while (body.hasNext && sb.length < 2048) sb.append(body.next()).append('\n')
        throw new IllegalStateException(
          s"chat/completions returned HTTP ${resp.statusCode()}: ${sb.toString.trim}")
      }
      val mapper = new ObjectMapper()
      val full = new StringBuilder
      var firstContent = true
      var done = false
      // SSE framing: `data:` payload lines accumulate until a blank
      // line dispatches the event; multi-line data joins with \n;
      // `event:`/`id:`/retry and `:` comments are ignored;
      // `data: [DONE]` ends the stream.
      val eventData = new StringBuilder
      def dispatch(): Unit = if (eventData.nonEmpty && !done) {
        val payload = eventData.toString
        eventData.clear()
        if (payload.trim == "[DONE]") { done = true; return }
        val delta = mapper.readTree(payload).path("choices").path(0).path("delta")
        val contentNode = delta.path("content")
        if (!contentNode.isMissingNode && !contentNode.isNull) {
          var content = contentNode.asText()
          if (firstContent && strategy.stripLeadingSpace) {
            // reference-exact: lstrip the FIRST content delta and mark
            // it consumed even if the strip leaves it empty
            // (chat_llm.py:143-146)
            content = content.replaceFirst("^\\s+", "")
            firstContent = false
          }
          if (content.nonEmpty) onToken(content)
          full.append(content)
        }
      }
      var line = reader.readLine()
      while (line != null && !done) {
        if (line.isEmpty) dispatch()
        else if (line.startsWith("data:")) {
          if (eventData.nonEmpty) eventData.append('\n')
          eventData.append(line.substring(5).stripPrefix(" "))
        } // else: event/id/retry/comment — ignored
        line = reader.readLine()
      }
      dispatch()
      full.toString
    } finally reader.close()
  }
}

object ChatClient {
  private lazy val defaultHttp = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  /** The reference's fixed system message (constants.py:403). */
  val SystemMessage: String =
    "You are a helpful person who clearly and directly answers questions in a " +
    "succinct fashion based on contexts provided to you. If you cannot find the " +
    "answer within the contexts simply tell me that the contexts do not provide " +
    "an answer. However, if the contexts partially address my question I still " +
    "want you to answer based on what the contexts say and then briefly " +
    "summarize the parts of my question that the contexts didn't provide an answer."

  /** The reference's fixed RAG preamble (constants.py:404 — including
    * its double space after "on."). */
  val RagString: String =
    "Here are the contexts to base your answer on.  However, I need to " +
    "reiterate that I only want you to base your response on these contexts " +
    "and do not use outside knowledge that you may have been trained with."

  /** Local-server health probe (chat_llm.py:205-213): GET
    * `{base}/models/`, true iff HTTP 200 within the timeout, false on
    * any connection error. */
  def isServerAvailable(baseUrl: String, timeoutMillis: Long = 5000): Boolean =
    try {
      val http = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(baseUrl.stripSuffix("/") + "/models/"))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .GET().build()
      http.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode() == 200
    } catch { case _: Exception => false }
}
