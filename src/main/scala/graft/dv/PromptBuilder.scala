package graft.dv

/** The REQUEST half of the transformer seam — the reference's prompt
  * construction (model/prompt_template.rs:1-429 defines three templates;
  * model/queries.rs SOURCE_OBJECTS_JSON builds the per-table "JSON Source
  * Table Object" they interpolate; controller/bgw_transformer_client.rs
  * :59-213 drives one BKComponentIdentification and one
  * DescriptorSensitive request per column, plus a BKName request for every
  * column identified as a business-key part). graft already parses the
  * RESPONSE contract ([[JsonResponseClassifier]]); this renders the
  * request deterministically from the same catalog rows, so both halves
  * of the bgw contract are expressed without any egress: a live model
  * client is "render with PromptBuilder → call the model → write the raw
  * JSON into the responses table the JsonResponseClassifier reads".
  *
  * The machine-read surfaces are reproduced exactly: the column-detail
  * string format (queries.rs:39-46 concatenation, including its
  * no-space-after-the-period quirk when the primary-key clause fires),
  * the table-object JSON keys, the {hints} / {new_json} / {column_no}
  * interpolation tail, and the response-JSON schemas the client decodes
  * (bgw_transformer_client.rs:327-379). The free-form instruction prose
  * is condensed — the contract is the structure, not the wording.
  */
object PromptBuilder {

  sealed abstract class Template(val name: String, val responseKey: String,
                                 val responseFields: Seq[String], val instructions: String)

  /** prompt_template.rs:11-192 — is this column a business-key component? */
  case object BKComponentIdentification extends Template(
    "BKComponentIdentification",
    "Business Key Component Identification",
    Seq("Is Business Key Component", "Confidence Value", "Reason"),
    """Task Title: Business Key Component Identification by Column in JSON Source Table Object
      |
      |You have a JSON Source Table Object with the schema name, table name, and detailed column information.
      |Determine whether the specified column, identified by its column number ("column no"), is likely to
      |represent a business key or a component of a composite business key. A primary key is assumed to be a
      |business key component; emails or usernames count only when no better candidate exists.
      |
      |Confidence Value: a score between 0 and 1, rounded to two decimal places (0.80+ is reasonably confident).
      |Reason: indicate why you made the decision you did.""".stripMargin)

  /** prompt_template.rs:193-264 — name the identified business key. */
  case object BKName extends Template(
    "BKName",
    "Business Key Name",
    Seq("Name", "Confidence Value", "Reason"),
    """Task Title: Business Key Naming in JSON Source Table Object with specified Column
      |
      |The business key part column has already been identified; its column number is provided with the JSON
      |Source Table Object. Return a name that best represents the business key from a data vault perspective:
      |prefer the attribute name when descriptive, avoid generic terms like "ID" or "number", and fall back to
      |the table or schema name when the attribute is not descriptive enough.
      |
      |Confidence Value: a score between 0 and 1, rounded to two decimal places (0.80+ is reasonably confident).
      |Reason: indicate why you made the decision you did.""".stripMargin)

  /** prompt_template.rs:265-427 — is this descriptor PII? */
  case object DescriptorSensitive extends Template(
    "DescriptorSensitive",
    "Descriptor - Sensitive",
    Seq("Is PII", "Confidence Value", "Reason"),
    """Task Title: Identification of PII in JSON Source Table Object
      |
      |Identify if the descriptor column (by its column number) is a sensitive PII subtype. Classify as
      |"Descriptor - Sensitive" only on a direct match with the PII list (names, SSN, licences, passports,
      |email addresses, street addresses, extended zip codes, phone numbers, dates/places of birth, biometric,
      |medical, financial, employment, insurance or education records, online identifiers, identifying media,
      |national identifiers, geolocation, vehicle registrations); do not infer beyond the list. City, state,
      |country, 5-digit zip, age, plain dates/timestamps, gender, broad ethnicity categories, public records,
      |generic job titles and organization names are NOT PII.
      |
      |Confidence Value: a score between 0 and 1, rounded to two decimal places (0.80+ is reasonably confident).
      |Reason: indicate why you made the decision you did.""".stripMargin)

  /** One catalog column as the prompt pipeline sees it. */
  final case class PromptColumn(ordinal: Int, name: String, typeName: String,
                                isPrimaryKey: Boolean, comment: String = "NA")

  /** The reference's column-detail string (queries.rs:39-46) — including
    * the missing space before "Column Comments" when the primary-key
    * clause fires (the CASE branch is concatenated with no separator).
    */
  def columnDetail(c: PromptColumn): String =
    s"Column No: ${c.ordinal} Named: ${c.name} of type: ${c.typeName} " +
      (if (c.isPrimaryKey) "And is a primary key." else "") +
      s"Column Comments: ${c.comment}"

  /** The "JSON Source Table Object" (queries.rs:54-58 json_build_object,
    * pretty-printed the way the bgw worker serializes it before
    * interpolation, bgw_transformer_client.rs:61).
    */
  def tableDetailsJson(schemaName: String, tableName: String, cols: Seq[PromptColumn]): String = {
    def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val details = cols.sortBy(_.ordinal).map(c => s"    ${q(columnDetail(c))}").mkString(",\n")
    s"""{
       |  "Schema Name": ${q(schemaName)},
       |  "Table Name": ${q(tableName)},
       |  "Column Details": [
       |$details
       |  ]
       |}""".stripMargin
  }

  /** An example-output block: the response-JSON schema the model must
    * emit, which is EXACTLY what [[JsonResponseClassifier]] /
    * bgw_transformer_client.rs:327-379 decode.
    */
  def responseSchemaJson(t: Template): String = {
    val fields = t.responseFields.map {
      case f @ "Confidence Value"                         => s""""$f": 0.95"""
      case f @ ("Is Business Key Component" | "Is PII")   => s""""$f": true"""
      case f                                              => s""""$f": "...""""
    }.mkString(",\n    ")
    s"""{
       |  "${t.responseKey}": {
       |    $fields
       |  }
       |}""".stripMargin
  }

  /** Render the full prompt for one (template, table, column) request —
    * the {hints} / {new_json} / {column_no} interpolation of
    * prompt_template.rs:187-191 / 259-263 / 421-426. `hints` carries the
    * retry nudge the worker appends after a malformed response
    * (bgw_transformer_client.rs:92).
    */
  def render(t: Template, tableJson: String, columnNo: Int, hints: String = ""): String =
    s"""${t.instructions}
       |
       |Output: ensure the output is JSON matching this structure:
       |${responseSchemaJson(t)}
       |
       |Now, based on the instructions and examples above, please generate the JSON output for the following input. $hints
       |
       |JSON Source Table Object: $tableJson
       |
       |Column No: $columnNo
       |""".stripMargin

  /** The bgw worker's request plan for one table
    * (bgw_transformer_client.rs:74-213): BKComponentIdentification for
    * every column, BKName only for columns identified as key parts,
    * DescriptorSensitive for every column. Returns (template, column
    * ordinal, prompt) in the worker's processing order.
    */
  def requestsFor(schemaName: String, tableName: String, cols: Seq[PromptColumn],
                  bkOrdinals: Set[Int]): Seq[(String, Int, String)] = {
    val json = tableDetailsJson(schemaName, tableName, cols)
    val ords = cols.sortBy(_.ordinal).map(_.ordinal)
    ords.map(o => (BKComponentIdentification.name, o, render(BKComponentIdentification, json, o))) ++
      ords.filter(bkOrdinals).map(o => (BKName.name, o, render(BKName, json, o))) ++
      ords.map(o => (DescriptorSensitive.name, o, render(DescriptorSensitive, json, o)))
  }

  /** Requests for a cataloged source table, signals-driven: primary-key
    * flag and BK identification come from the same static signals the
    * rules classifier uses, so the request plan agrees with the response
    * table graft's own classifier would produce.
    */
  def requestsForTable(table: String): Seq[(String, Int, String)] = {
    val sigs = Classify.signals.filter(_.table == table)
    require(sigs.nonEmpty, s"unknown table $table")
    val cols = sigs.map(g => PromptColumn(g.ordinal, g.column.name, g.column.typeName,
      isPrimaryKey = g.nameBk && g.ordinal == 1))
    requestsFor(sigs.head.schema, table, cols, sigs.filter(_.nameBk).map(_.ordinal).toSet)
  }
}
