package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process mock transformer endpoint shared by TransformerClientSpec
  * and ClassifierE2ESpec — the zero-egress stand-in for a real
  * OpenAI/Ollama server. The mock VALIDATES every incoming request
  * against the reference wire shape (openai_client.rs:8-51 /
  * ollama_client.rs:8-28) before answering, so a drift in the request
  * body fails loudly in any spec that uses it.
  *
  * `fixture(table, template, col)` supplies the model content;
  * `garbageFor(template, col, attempt)` true → non-JSON content (the
  * malformed-model case the retry loop absorbs);
  * `failFor(table, template, col)` true → HTTP 500 (the 5xx-storm case:
  * the client retries, exhausts, and the column degrades to Queued).
  */
final class MockTransformerServer(
    serverType: String,
    fixture: (String, String, Int) => String,
    garbageFor: (String, Int, Int) => Boolean = (_, _, _) => false,
    failFor: (String, String, Int) => Boolean = (_, _, _) => false,
    delayMs: () => Long = () => 0L) {

  private val mapper = new ObjectMapper()
  val requests = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)] // (template, col, prompt)
  val wireErrors = scala.collection.mutable.ArrayBuffer.empty[String]
  private val attempts = scala.collection.mutable.Map.empty[(String, String, Int), Int]

  private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val d = delayMs()
      if (d > 0) Thread.sleep(d) // the slow-endpoint drill: latency > client timeout
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val node = mapper.readTree(body)
      // ---- wire-shape validation (reference request structs) ----
      val prompt = serverType match {
        case "openai" =>
          if (!node.path("model").isTextual) wireErrors += "openai: missing model"
          if (node.path("temperature").asDouble() != 0.75) wireErrors += "openai: temperature"
          if (node.path("response_format").path("type").asText() != "json_object")
            wireErrors += "openai: response_format"
          val msgs = node.path("messages")
          if (!msgs.isArray || msgs.size != 1 || msgs.get(0).path("role").asText() != "user")
            wireErrors += "openai: messages"
          val auth = ex.getRequestHeaders.getFirst("Authorization")
          if (auth == null || !auth.startsWith("Bearer ")) wireErrors += "openai: auth"
          msgs.path(0).path("content").asText("")
        case "ollama" =>
          if (!node.path("model").isTextual) wireErrors += "ollama: missing model"
          if (node.path("format").asText() != "json") wireErrors += "ollama: format"
          if (!node.path("stream").isBoolean || node.path("stream").asBoolean(true))
            wireErrors += "ollama: stream"
          if (node.path("options").path("temperature").asDouble() != 0.75)
            wireErrors += "ollama: temperature"
          node.path("prompt").asText("")
      }
      // ---- identify (table, template, column) from the rendered prompt ----
      val template =
        if (prompt.contains("Business Key Component Identification by Column")) "BKComponentIdentification"
        else if (prompt.contains("Business Key Naming")) "BKName"
        else if (prompt.contains("Identification of PII")) "DescriptorSensitive"
        else { wireErrors += "unknown template"; "?" }
      val table = "\"Table Name\": \"(\\w+)\"".r.findFirstMatchIn(prompt)
        .map(_.group(1)).getOrElse { wireErrors += "no table name"; "?" }
      // the prompt ends with the interpolated "Column No: <n>" tail
      val colStr = prompt.split("Column No: ").last.trim.takeWhile(_.isDigit)
      val col = if (colStr.nonEmpty) colStr.toInt
        else { wireErrors += "no trailing column no"; -1 }
      synchronized { requests += ((template, col, prompt)) }
      if (failFor(table, template, col)) {
        val err = """{"error": "mock storm"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(500, err.length)
        ex.getResponseBody.write(err); ex.close()
        return
      }
      val attempt = synchronized {
        val a = attempts.getOrElse((table, template, col), 0) + 1
        attempts((table, template, col)) = a; a
      }
      val content =
        if (garbageFor(template, col, attempt)) "I am not JSON, sorry."
        else fixture(table, template, col)
      val out = serverType match {
        case "openai" =>
          val env = mapper.createObjectNode()
          env.put("id", "chatcmpl-mock"); env.put("object", "chat.completion")
          env.put("created", 0L); env.put("model", node.path("model").asText())
          val ch = env.putArray("choices").addObject()
          val msg = ch.putObject("message")
          msg.put("role", "assistant"); msg.put("content", content)
          ch.put("finish_reason", "stop"); ch.put("index", 0); ch.putNull("logprobs")
          val us = env.putObject("usage")
          us.put("prompt_tokens", 1); us.put("completion_tokens", 1); us.put("total_tokens", 2)
          mapper.writeValueAsString(env)
        case "ollama" =>
          val env = mapper.createObjectNode()
          env.put("model", node.path("model").asText())
          env.put("created_at", "2026-01-01T00:00:00Z")
          env.put("response", content); env.put("done", true)
          mapper.writeValueAsString(env)
      }
      val bytes = out.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
  })
  server.start()
  val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
  def stop(): Unit = server.stop(0)
}
