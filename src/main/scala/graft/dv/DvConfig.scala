package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config surface for the classifier/transformer client — the reference
  * exposes the transformer wiring as GUCs (utility/guc.rs:34-98:
  * pg_auto_dw.model, pg_auto_dw.transformer_server_url,
  * pg_auto_dw.accepted_transformer_confidence_level) so one setting flips
  * the deployment between model backends and confidence policies. graft
  * reads the Spark session conf: one place selects the classifier
  * implementation, the model name rendered in status responses, and the
  * confidence threshold every status view applies.
  *
  * Zero-egress by construction: the selectable implementations are the
  * deterministic rules engine and the pre-recorded JSON-responses client
  * ([[JsonResponseClassifier]], which parses the reference's raw response
  * contract from a table). A live network client would slot into the same
  * seam, but is out of scope here — only the selection mechanism is the
  * reference-parity surface.
  */
object DvConfig {

  /** accepted_transformer_confidence_level (guc.rs:90). */
  val ThresholdKey = "spark.graft.acceptedConfidenceLevel"

  /** Classifier selection: "rules" (default) or "json:<path>" — a path to
    * a JSON-lines table of raw model responses keyed by (table_name,
    * column_name), the auto_dw.transformer_responses analogue.
    */
  val ClassifierKey = "spark.graft.classifier"

  /** model name surfaced in status_response text (guc.rs pg_auto_dw.model). */
  val ModelKey = "spark.graft.modelName"

  def threshold(s: SparkSession): Double =
    s.conf.get(ThresholdKey, Classify.Threshold.toString).toDouble

  def classifier(s: SparkSession): Classifier =
    s.conf.get(ClassifierKey, "rules") match {
      case "rules" => RulesClassifier
      case spec if spec.startsWith("json:") =>
        val path = spec.stripPrefix("json:")
        JsonResponseClassifier(s.read.json(path),
          s.conf.get(ModelKey, "json-client-v0"))
      case other =>
        throw new IllegalArgumentException(
          s"$ClassifierKey must be 'rules' or 'json:<path>', got '$other'")
    }

  /** The status views under the configured classifier + threshold. */
  def sourceColumnStatus(s: SparkSession, dir: String): DataFrame =
    Classify.sourceColumnStatus(s, dir, threshold = threshold(s), classifier = classifier(s))

  def sourceTableStatus(s: SparkSession, dir: String): DataFrame =
    Classify.sourceTableStatus(s, dir, threshold = threshold(s), classifier = classifier(s))
}
