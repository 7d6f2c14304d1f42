package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.chat.{ChatClient, ChatMessage, LmStudioStrategy, OpenAiStrategy, RagChat}
import graft.embed.DeterministicEmbedder
import graft.search.SearchOptions
import graft.store.VectorStore

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The LLM chat layer against an in-process OpenAI-protocol server:
  * wire format, SSE framing, strategy differences, health probe, and
  * the full RAG ask flow (chat_llm.py parity without the network). */
class ChatSpec extends SparkSpec {

  /** One-shot SSE server: records the request, replies with `frames`
    * as `data:` events (verbatim payload strings), then [DONE]. */
  private def withSseServer(frames: Seq[String], status: Int = 200,
      rawBody: Option[String] = None)(
      f: (String, () => (String, Map[String, String])) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var reqBody = ""
    @volatile var reqHeaders = Map.empty[String, String]
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        reqBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        reqHeaders = Map(
          "Authorization" -> ex.getRequestHeaders.getFirst("Authorization"),
          "Content-Type" -> ex.getRequestHeaders.getFirst("Content-Type"))
        val body = rawBody.getOrElse(
          (frames.map(p => s"data: $p\n\n") :+ "data: [DONE]\n\n").mkString)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type",
          if (rawBody.isEmpty) "text/event-stream" else "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.createContext("/v1/models/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1",
      () => (reqBody, reqHeaders))
    finally server.stop(0)
  }

  private def delta(content: String): String =
    s"""{"choices":[{"delta":{"content":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(content)}}}]}"""

  test("LM Studio strategy: wire format, token stream, first-token space strip") {
    val frames = Seq(
      """{"choices":[{"delta":{"role":"assistant"}}]}""", // role-only: no content
      delta(" Hello"), delta(" world"), delta("!"))
    withSseServer(frames) { (base, req) =>
      val tokens = scala.collection.mutable.Buffer.empty[String]
      val full = new ChatClient(LmStudioStrategy(base))
        .chatStream(Seq(ChatMessage("system", "sys"), ChatMessage("user", "hi")),
          tokens += _)
      // leading space of the FIRST content delta stripped, later ones kept
      assert(tokens.toSeq == Seq("Hello", " world", "!"))
      assert(full == "Hello world!")
      val (body, headers) = req()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      assert(node.get("model").asText() == "local-model")
      assert(node.get("stream").asBoolean())
      assert(!node.has("temperature"))
      assert(node.get("messages").get(0).get("role").asText() == "system")
      assert(node.get("messages").get(1).get("content").asText() == "hi")
      assert(headers("Authorization") == "Bearer lm-studio")
      assert(headers("Content-Type") == "application/json")
    }
  }

  test("OpenAI strategy: temperature 0.1, no space strip, key required") {
    withSseServer(Seq(delta(" spaced"))) { (base, req) =>
      val full = new ChatClient(OpenAiStrategy("sk-test", "gpt-test", base))
        .chatStream(Seq(ChatMessage("user", "q")), _ => ())
      assert(full == " spaced") // no strip for OpenAI (chat_llm.py:112-113)
      val (body, headers) = req()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      assert(node.get("model").asText() == "gpt-test")
      assert(node.get("temperature").asDouble() == 0.1)
      assert(headers("Authorization") == "Bearer sk-test")
    }
    // reference-exact failure when the key is unset (chat_llm.py:96-101)
    intercept[IllegalArgumentException](OpenAiStrategy("", "gpt-test"))
  }

  test("SSE edge frames: multi-line data joins with newline, [DONE] stops, strip consumed by all-space first delta") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // multi-line SSE data joins with \n; JSON tolerates the break
        // between tokens, so the third event splits after "delta":
        val body = s"data: ${delta("  ")}\n\n" + // all-space first delta: strip leaves ""
          s"data: ${delta("x")}\n\n" +
          ": keep-alive comment, ignored\n" +
          "event: message\n" +
          "data: {\"choices\":[{\"delta\":\n" +
          "data: {\"content\":\"a\"}}]}\n\n" +
          "data: [DONE]\n\n" +
          s"data: ${delta("after done, never emitted")}\n\n"
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      val tokens = scala.collection.mutable.Buffer.empty[String]
      val full = new ChatClient(LmStudioStrategy(base))
        .chatStream(Seq(ChatMessage("user", "q")), tokens += _)
      // the all-space first delta consumed the strip (reference-exact:
      // first_content flips inside the strip branch, chat_llm.py:143-146)
      // so "x" keeps nothing stripped and arrives whole
      assert(tokens.toSeq == Seq("x", "a"))
      assert(full == "xa")
    } finally server.stop(0)
  }

  test("non-2xx response raises with status and body; health probe") {
    withSseServer(Nil, status = 500, rawBody = Some("""{"error":"boom"}""")) {
      (base, _) =>
        val e = intercept[IllegalStateException] {
          new ChatClient(LmStudioStrategy(base))
            .chatStream(Seq(ChatMessage("user", "q")), _ => ())
        }
        assert(e.getMessage.contains("500") && e.getMessage.contains("boom"))
        // /models/ probe (chat_llm.py:205-213)
        assert(ChatClient.isServerAvailable(base))
    }
    assert(!ChatClient.isServerAvailable("http://127.0.0.1:1/v1", timeoutMillis = 500))
  }

  test("RAG ask: search -> dump -> exact reference prompt -> stream -> citations") {
    val corpus = Files.createTempDirectory("graft-chat-corpus")
    Files.write(corpus.resolve("a.txt"),
      "alpha bravo charlie delta echo".getBytes(StandardCharsets.UTF_8))
    Files.write(corpus.resolve("b.txt"),
      "kilo lima mike november oscar".getBytes(StandardCharsets.UTF_8))
    val db = Files.createTempDirectory("graft-chat-db")
    val embedder = DeterministicEmbedder(dim = 16)
    VectorStore.create(spark, db.toString, corpus.toString, embedder,
      chunkSize = 100, chunkOverlap = 0)
    withSseServer(Seq(delta("Answer"), delta(" text"))) { (base, req) =>
      val tokens = scala.collection.mutable.Buffer.empty[String]
      val result = RagChat.ask(spark, db.toString, "alpha bravo",
        embedder, new ChatClient(LmStudioStrategy(base)),
        SearchOptions(k = 2, scoreThreshold = -1.0), onToken = tokens += _)
      assert(result.response == "Answer text")
      assert(tokens.last == "\n") // trailing newline emission (chat_llm.py:150)
      // prompt is byte-exact to chat_llm.py:45-50: rag string, ---
      // rule, contexts joined by --- rules, ----- rule, query
      val (body, _) = req()
      val prompt = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body).get("messages").get(1).get("content").asText()
      assert(prompt.startsWith(ChatClient.RagString + "\n\n---\n\n"))
      assert(prompt.endsWith("\n\n-----\n\nalpha bravo"))
      assert(prompt.contains("\n\n---\n\n"))
      val sys = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body).get("messages").get(0)
      assert(sys.get("role").asText() == "system")
      assert(sys.get("content").asText() == ChatClient.SystemMessage)
      // side-effect dumps landed next to the db (chat_llm.py:34-40)
      assert(Files.exists(db.resolve("contexts.txt")))
      assert(Files.exists(db.resolve("metadata.txt")))
      // citations present for the hit files
      val cites = result.citations.collect()
      assert(cites.nonEmpty)
      assert(cites.map(_.getString(1)).toSet.subsetOf(Set("a.txt", "b.txt")))
    }
    // empty hit set: reference-exact refusal BEFORE any HTTP call
    val e = intercept[IllegalArgumentException] {
      RagChat.ask(spark, db.toString, "anything", embedder,
        new ChatClient(LmStudioStrategy("http://127.0.0.1:1/v1")),
        SearchOptions(k = 2, scoreThreshold = 0.999999))
    }
    assert(e.getMessage.contains("No relevant contexts found."))
  }
}
