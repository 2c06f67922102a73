package graft.dv

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The LIVE half of the transformer seam — the reference's model-client
  * stack re-expressed over `java.net.http` (no new dependencies; Jackson
  * rides Spark's classpath):
  *
  *  - wire shapes: `utility/openai_client.rs:8-51` (chat-completions
  *    request `{model, messages, temperature: 0.75, response_format:
  *    {type: json_object}}` with a Bearer token, content extracted from
  *    `choices[0].message.content`) and `utility/ollama_client.rs:8-28`
  *    (`/api/generate` request `{model, prompt, format: "json", stream:
  *    false, options: {temperature}}`, content in `response`);
  *  - backend dispatch: `utility/transformer_client.rs:5-34` (the
  *    server-type string parses case-insensitively to OpenAI | Ollama,
  *    anything else is an error);
  *  - the retry/decode loop: `controller/bgw_transformer_client.rs:74-213`
  *    (up to MAX_TRANSFORMER_RETRIES=3 attempts per request; a transport
  *    or JSON-parse failure re-renders the prompt with the hint nudge of
  *    bgw_transformer_client.rs:92; a response that parses but does not
  *    decode the template's struct retries without a new hint);
  *  - response composition: `bgw_transformer_client.rs:216-291` — BK
  *    identification + BK naming fold into one `Business Key Part` row
  *    whose confidence is the MIN of the two values ("the weakest link"),
  *    bk name spaces become underscores, reason = "BK Identified Reason:
  *    …, BK Naming Reason: …"; everything else defaults to `Descriptor`
  *    at confidence 1.0 unless DescriptorSensitive answered is_pii with
  *    confidence > 0.5.
  *
  * The request plan per table is the bgw worker's: BKComponentIdentification
  * for every column, BKName ONLY for columns the MODEL identified as key
  * parts (response-driven, unlike PromptBuilder.requestsFor's static
  * signal-driven plan), DescriptorSensitive for every column. All calls
  * run driver-side and sequential like the background worker itself —
  * request volume is metadata-scale (3 requests per catalog column), never
  * row-scale, so the client needs no distribution.
  *
  * Zero egress in this sandbox: TransformerClientSpec exercises both wire
  * shapes against an in-process `com.sun.net.httpserver` mock serving
  * recorded responses, and pins that the HTTP path's classification rows
  * byte-match [[JsonResponseClassifier]] fed the same fixtures.
  */
object TransformerClient {

  sealed trait ServerType
  case object OpenAI extends ServerType
  case object Ollama extends ServerType

  /** transformer_client.rs:14-20 — case-insensitive, invalid rejected. */
  def parseServerType(s: String): ServerType = s.toLowerCase match {
    case "openai" => OpenAI
    case "ollama" => Ollama
    case other    => throw new IllegalArgumentException(
      s"Invalid Transformer Server Type: '$other' (expected openai|ollama)")
  }

  /** guc.rs:34-98 surface: url, type, model, token (OpenAI only). */
  final case class Config(serverUrl: String, serverType: ServerType, model: String,
                          token: String = "", timeoutMs: Long = 60000L,
                          maxRetries: Int = 3)

  /** One composed auto_dw.transformer_responses row
    * (bgw_transformer_client.rs:218 insert columns).
    */
  final case class ResponseRow(tableName: String, columnName: String,
                               modelName: String, category: String,
                               businessKeyName: String, confidenceScore: Double,
                               reason: String) {
    /** The raw-response shape [[JsonResponseClassifier]] parses. */
    def responseJson: String = {
      val m = new ObjectMapper()
      val n = m.createObjectNode()
      n.put("Category", category)
      n.put("Confidence Value", confidenceScore)
      n.put("Reason", reason)
      m.writeValueAsString(n)
    }
  }

  private[dv] val HintTemplate =
    "Hint: Please ensure you provide a JSON response only.  This is your %d attempt."
}

final class TransformerClient(cfg: TransformerClient.Config) {
  import TransformerClient._

  /** Endpoint url (memoization key material for DvConfig's response cache). */
  def url: String = cfg.serverUrl

  private val mapper = new ObjectMapper()
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(cfg.timeoutMs)).build()

  /** The wire request body for one prompt (openai_client.rs:76-97 /
    * ollama_client.rs:48-61 — field names, temperature 0.75, json mode).
    */
  private[dv] def requestBody(prompt: String): String = {
    val root = mapper.createObjectNode()
    cfg.serverType match {
      case OpenAI =>
        root.put("model", cfg.model)
        val m = root.putArray("messages").addObject()
        m.put("role", "user")
        m.put("content", prompt)
        root.put("temperature", 0.75)
        root.putObject("response_format").put("type", "json_object")
      case Ollama =>
        root.put("model", cfg.model)
        root.put("prompt", prompt)
        root.put("format", "json")
        root.put("stream", false)
        root.putObject("options").put("temperature", 0.75)
    }
    mapper.writeValueAsString(root)
  }

  /** One POST: envelope parse + content-JSON parse. Any transport error,
    * non-2xx, missing choices, or non-JSON content is a Left — the retry
    * loop turns those into the hint nudge, exactly like the bgw's
    * Err(e) arm.
    */
  private[dv] def sendOnce(prompt: String): Either[String, JsonNode] =
    try {
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(cfg.serverUrl))
        .timeout(java.time.Duration.ofMillis(cfg.timeoutMs))
        .header("Content-Type", "application/json")
      val withAuth = cfg.serverType match {
        case OpenAI => builder.header("Authorization", s"Bearer ${cfg.token}")
        case Ollama => builder
      }
      val req = withAuth.POST(
        java.net.http.HttpRequest.BodyPublishers.ofString(requestBody(prompt))).build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2) Left(s"HTTP ${resp.statusCode()}")
      else {
        val env = mapper.readTree(resp.body())
        val content = cfg.serverType match {
          case OpenAI =>
            val choices = env.path("choices")
            if (!choices.isArray || choices.size == 0) null
            else choices.get(0).path("message").path("content").asText(null)
          case Ollama => env.path("response").asText(null)
        }
        if (content == null) Left("No choices in response")
        else Right(mapper.readTree(content))
      }
    } catch { case e: Exception => Left(e.toString) }

  /** Does the content decode the template's response struct
    * (bgw_transformer_client.rs:333-380 serde shapes)?
    */
  private[dv] def decodes(t: PromptBuilder.Template, json: JsonNode): Boolean = {
    val v = json.path(t.responseKey)
    v.isObject && t.responseFields.forall { f =>
      val n = v.path(f)
      f match {
        case "Confidence Value"                     => n.isNumber
        case "Is Business Key Component" | "Is PII" => n.isBoolean
        case _                                      => n.isTextual
      }
    }
  }

  /** The bgw retry loop for one (template, column): up to maxRetries
    * attempts; transport/parse failures set the hint for the NEXT render;
    * a decoded struct breaks out (bgw_transformer_client.rs:79-113).
    */
  def sendRequest(t: PromptBuilder.Template, tableJson: String, columnNo: Int): Option[JsonNode] = {
    var hints = ""
    var retries = 0
    var out: Option[JsonNode] = None
    while (retries < cfg.maxRetries && out.isEmpty) {
      sendOnce(PromptBuilder.render(t, tableJson, columnNo, hints)) match {
        case Right(json) if decodes(t, json) => out = Some(json)
        case Right(_)                        => () // structure mismatch: plain retry
        case Left(_) =>
          hints = HintTemplate.format(retries + 1)
      }
      retries += 1
    }
    out
  }

  /** The full worker pass for one table: three staged request waves, then
    * the reference's composition rules. Columns whose requests exhaust
    * their retries get NO row — they surface as 'Queued for Processing'
    * through the classifier seam, the same lag the asynchronous bgw shows.
    *
    * DELIBERATE PARITY DEVIATION (documented, not accidental): the
    * reference's insert loop (bgw_transformer_client.rs:257-288) emits a
    * default `Descriptor` row at confidence 1.0 even for a column whose
    * every request failed, so its responses table always has one row per
    * column. graft instead emits NO row for such a column and lets it
    * surface as 'Queued for Processing' — an all-requests-failed column is
    * model-silence, not a confident Descriptor verdict, and Queued is the
    * state the reference itself uses for not-yet-processed columns.
    * Downstream consumers must not assume the one-row-per-column invariant
    * when the http classifier is active.
    */
  def classifyTable(table: String): Seq[ResponseRow] = {
    val sigs = Classify.signals.filter(_.table == table)
    require(sigs.nonEmpty, s"unknown table $table")
    val cols = sigs.map(g => PromptBuilder.PromptColumn(
      g.ordinal, g.column.name, g.column.typeName,
      isPrimaryKey = g.nameBk && g.ordinal == 1))
    val json = PromptBuilder.tableDetailsJson(sigs.head.schema, table, cols)
    val ords = cols.sortBy(_.ordinal)

    val bki = ords.flatMap { c =>
      sendRequest(PromptBuilder.BKComponentIdentification, json, c.ordinal)
        .map(r => c.ordinal -> r.path("Business Key Component Identification"))
    }.toMap
    val bkn = ords.flatMap { c =>
      bki.get(c.ordinal).filter(_.path("Is Business Key Component").asBoolean(false))
        .flatMap(_ => sendRequest(PromptBuilder.BKName, json, c.ordinal))
        .map(r => c.ordinal -> r.path("Business Key Name"))
    }.toMap
    val ds = ords.flatMap { c =>
      sendRequest(PromptBuilder.DescriptorSensitive, json, c.ordinal)
        .map(r => c.ordinal -> r.path("Descriptor - Sensitive"))
    }.toMap

    ords.flatMap { c =>
      (bki.get(c.ordinal), bkn.get(c.ordinal)) match {
        case (Some(i), Some(n)) =>
          // Business Key Part: min confidence = the weakest link
          val conf = math.min(i.path("Confidence Value").asDouble(),
            n.path("Confidence Value").asDouble())
          Some(ResponseRow(table, c.name, cfg.model, "Business Key Part",
            n.path("Name").asText().replace(" ", "_"), conf,
            s"BK Identified Reason: ${i.path("Reason").asText()}, " +
              s"BK Naming Reason: ${n.path("Reason").asText()}"))
        case _ if bki.contains(c.ordinal) || ds.contains(c.ordinal) =>
          val base = ResponseRow(table, c.name, cfg.model, "Descriptor", "NA",
            1.0, "Defaulted of category 'Descriptor' maintained.")
          Some(ds.get(c.ordinal) match {
            case Some(d) if d.path("Is PII").asBoolean(false) &&
                d.path("Confidence Value").asDouble() > 0.5 =>
              base.copy(category = "Descriptor - Sensitive",
                confidenceScore = d.path("Confidence Value").asDouble(),
                reason = d.path("Reason").asText())
            case _ => base
          })
        case _ => None // every request for this column exhausted its retries
      }
    }
  }

  /** classifyTable over many tables → the (table_name, column_name,
    * response_json, …) frame [[JsonResponseClassifier]] consumes. The
    * frame is metadata-scale (catalog columns), built driver-side like the
    * bgw's INSERT.
    */
  def responsesFor(s: org.apache.spark.sql.SparkSession,
                   tables: Seq[String]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    tables.flatMap(classifyTable)
      .map(r => (r.tableName, r.columnName, r.modelName, r.category,
        r.businessKeyName, r.confidenceScore, r.reason, r.responseJson))
      .toDF("table_name", "column_name", "model_name", "category",
        "business_key_name", "confidence_score", "reason", "response_json")
  }
}
