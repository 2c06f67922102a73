package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.dv._
import graft.dv.TransformerClient.ResponseRow
import org.apache.spark.sql.functions._

/** The live transformer client against an in-process HTTP mock — the
  * zero-egress stand-in for a real OpenAI/Ollama endpoint. The mock
  * VALIDATES every incoming request against the reference wire shape
  * (openai_client.rs:8-51 / ollama_client.rs:8-28) before answering from
  * the recorded fixtures, so a drift in the request body fails loudly.
  */
class TransformerClientSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Deterministic mock model: customer.c_custkey is the key part (named
    * with a space to exercise the underscore rule), customer.c_name is
    * PII, customer.c_acctbal is PII below the 0.5 gate, everything else
    * everywhere a descriptor.
    */
  private def fixture(table: String, template: String, col: Int): String = template match {
    case "BKComponentIdentification" =>
      val is = table == "customer" && col == 1
      val (conf, why) = if (is) (0.92, "Unique customer identifier.") else (0.6, "Not a key.")
      s"""{"Business Key Component Identification": {"Is Business Key Component": $is, "Confidence Value": $conf, "Reason": "$why"}}"""
    case "BKName" =>
      """{"Business Key Name": {"Name": "customer key", "Confidence Value": 0.88, "Reason": "Attribute name is descriptive."}}"""
    case "DescriptorSensitive" =>
      (table, col) match {
        case ("customer", 2) => """{"Descriptor - Sensitive": {"Is PII": true, "Confidence Value": 0.88, "Reason": "Personal name is PII."}}"""
        case ("customer", 4) => """{"Descriptor - Sensitive": {"Is PII": true, "Confidence Value": 0.4, "Reason": "Balance might be financial PII."}}"""
        case _ => s"""{"Descriptor - Sensitive": {"Is PII": false, "Confidence Value": 0.9, "Reason": "Plain attribute."}}"""
      }
  }

  /** The rows classifyTable must compose from those fixtures, per the
    * reference's insert rules (bgw_transformer_client.rs:216-291).
    */
  private def expectedRows(model: String): Seq[ResponseRow] = Seq(
    ResponseRow("customer", "c_custkey", model, "Business Key Part", "customer_key",
      0.88, "BK Identified Reason: Unique customer identifier., BK Naming Reason: Attribute name is descriptive."),
    ResponseRow("customer", "c_name", model, "Descriptor - Sensitive", "NA",
      0.88, "Personal name is PII."),
    ResponseRow("customer", "c_nationkey", model, "Descriptor", "NA",
      1.0, "Defaulted of category 'Descriptor' maintained."),
    ResponseRow("customer", "c_acctbal", model, "Descriptor", "NA",
      1.0, "Defaulted of category 'Descriptor' maintained."),
    ResponseRow("customer", "c_mktsegment", model, "Descriptor", "NA",
      1.0, "Defaulted of category 'Descriptor' maintained."))

  /** The shared in-process mock ([[MockTransformerServer]] — wire-shape
    * validation + fixture answers), bound to this spec's fixture model.
    */
  private def MockServer(serverType: String,
                         garbageFor: (String, Int, Int) => Boolean = (_, _, _) => false) =
    new MockTransformerServer(serverType, fixture, garbageFor)

  private def client(url: String, serverType: String) = new TransformerClient(
    TransformerClient.Config(url, TransformerClient.parseServerType(serverType),
      model = "mock-model", token = "test-token"))

  test("openai wire: validated requests, staged plan, reference composition rules") {
    val srv = MockServer("openai")
    try {
      val rows = client(srv.url, "openai").classifyTable("customer")
      assert(srv.wireErrors.isEmpty, srv.wireErrors.distinct.mkString("; "))
      assert(rows == expectedRows("mock-model"))
      // staged plan: BKI for all 5 columns, BKName ONLY for the model-
      // identified key part (column 1), DescriptorSensitive for all 5
      val byTemplate = srv.requests.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
      assert(byTemplate("BKComponentIdentification") == Seq(1, 2, 3, 4, 5))
      assert(byTemplate("BKName") == Seq(1))
      assert(byTemplate("DescriptorSensitive") == Seq(1, 2, 3, 4, 5))
    } finally srv.stop()
  }

  test("ollama wire parity: the generate envelope composes identical rows") {
    val srv = MockServer("ollama")
    try {
      val rows = client(srv.url, "ollama").classifyTable("customer")
      assert(srv.wireErrors.isEmpty, srv.wireErrors.distinct.mkString("; "))
      assert(rows == expectedRows("mock-model"))
    } finally srv.stop()
  }

  test("retry loop: malformed content re-renders with the hint; exhaustion queues the column") {
    // DS for column 3 is garbage ONCE (then answers); BKI and DS for
    // column 5 are garbage on every attempt (a column the model never
    // answers — it must get NO row and surface as queued).
    val srv = MockServer("openai",
      garbageFor = (t, c, attempt) =>
        (t == "DescriptorSensitive" && c == 3 && attempt == 1) ||
          (c == 5 && (t == "BKComponentIdentification" || t == "DescriptorSensitive")))
    try {
      val rows = client(srv.url, "openai").classifyTable("customer")
      assert(rows == expectedRows("mock-model").filterNot(_.columnName == "c_mktsegment"))
      // the second DS/col-3 request must carry the bgw's hint nudge
      val dsCol3 = srv.requests.filter(r => r._1 == "DescriptorSensitive" && r._2 == 3)
      assert(dsCol3.size == 2)
      assert(!dsCol3(0)._3.contains("Hint:"))
      assert(dsCol3(1)._3.contains(
        "Hint: Please ensure you provide a JSON response only.  This is your 1 attempt."))
      // exhausted requests were retried exactly maxRetries times
      assert(srv.requests.count(r => r._1 == "BKComponentIdentification" && r._2 == 5) == 3)
      assert(srv.requests.count(r => r._1 == "DescriptorSensitive" && r._2 == 5) == 3)
      // through the classifier seam, the unanswered column is queued
      val respDf = {
        import spark.implicits._
        rows.map(r => (r.tableName, r.columnName, r.responseJson))
          .toDF("table_name", "column_name", "response_json")
      }
      val status = Classify.sourceColumnStatus(spark, sfDir,
        classifier = JsonResponseClassifier(respDf, "mock-model"))
      val seg = status.filter(col("table_name") === "customer" &&
        col("column_name") === "c_mktsegment").collect()
      assert(seg.length == 1 && seg(0).getAs[String]("status") == "Queued for Processing")
    } finally srv.stop()
  }

  test("DvConfig http classifier is byte-identical to JsonResponseClassifier on the same fixtures") {
    val srv = MockServer("openai")
    try {
      spark.conf.set(DvConfig.ClassifierKey, s"http:${srv.url}")
      spark.conf.set(DvConfig.ServerTypeKey, "openai")
      spark.conf.set(DvConfig.ServerTokenKey, "test-token")
      spark.conf.set(DvConfig.ModelKey, "mock-model")
      val live = DvConfig.sourceColumnStatus(spark, sfDir).collect().toSet
      // the recorded path: the same raw response fixtures, composed through
      // the same rules OUTSIDE the HTTP stack, fed to JsonResponseClassifier
      val recorded = {
        import spark.implicits._
        val all = Classify.signals.map(_.table).distinct
          .flatMap(t => mockRowsFor(t))
          .map(r => (r.tableName, r.columnName, r.responseJson))
          .toDF("table_name", "column_name", "response_json")
        Classify.sourceColumnStatus(spark, sfDir,
          classifier = JsonResponseClassifier(all, "mock-model")).collect().toSet
      }
      assert(live == recorded,
        s"live-vs-recorded diff: ${(live -- recorded).take(3)} / ${(recorded -- live).take(3)}")
      // the live run actually classified something as a BK through the wire
      assert(live.exists(r => r.getAs[String]("table_name") == "customer" &&
        r.getAs[String]("column_name") == "c_custkey" &&
        r.getAs[String]("category") == "Business Key Part"))
    } finally {
      srv.stop()
      Seq(DvConfig.ClassifierKey, DvConfig.ServerTypeKey, DvConfig.ServerTokenKey,
        DvConfig.ModelKey).foreach(spark.conf.unset)
    }
  }

  /** Driver-side re-composition of the fixtures for ANY table — mirrors
    * what the mock will answer so the recorded path needs no HTTP. Only
    * customer's column 1 is the fixture BK; for other tables every BKI
    * answers false, DS answers the per-ordinal fixture.
    */
  private def mockRowsFor(table: String): Seq[ResponseRow] = {
    val sigs = Classify.signals.filter(_.table == table)
    sigs.sortBy(_.ordinal).map { g =>
      val bkIs = table == "customer" && g.ordinal == 1
      if (bkIs)
        ResponseRow(table, g.column.name, "mock-model", "Business Key Part", "customer_key",
          0.88, "BK Identified Reason: Unique customer identifier., BK Naming Reason: Attribute name is descriptive.")
      else {
        val pii = table == "customer" && g.ordinal == 2
        if (pii)
          ResponseRow(table, g.column.name, "mock-model", "Descriptor - Sensitive", "NA",
            0.88, "Personal name is PII.")
        else
          ResponseRow(table, g.column.name, "mock-model", "Descriptor", "NA",
            1.0, "Defaulted of category 'Descriptor' maintained.")
      }
    }
  }
}
