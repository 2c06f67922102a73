package graft.dv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The pluggable classifier seam — graft's re-expression of the reference's
  * swappable model-backed transformer architecture
  * (extension/src/controller/bgw_transformer_client.rs: a background worker
  * sends cataloged columns to a model client — openai_client.rs /
  * ollama_client.rs — and records category/confidence/reason in
  * auto_dw.transformer_responses; columns without a response yet surface as
  * 'Queued for Processing', model/queries.rs:372).
  *
  * A [[Classifier]] consumes the joined catalog+profile frame (one row per
  * source column: name signals + uniqueness stats) and returns it with
  * nullable `category` / `confidence` / `reason` response columns. NULL
  * confidence = "no response yet" — the status views render those rows as
  * queued, exactly like the reference. Implementations are plan fragments,
  * so any classifier (rules, a model client writing a responses table, a
  * hybrid) slots in without touching the status machinery.
  */
trait Classifier {
  /** model_name in the status response text. */
  def name: String

  /** Add nullable category/confidence/reason to the catalog+profile frame. */
  def respond(catalogProfile: DataFrame): DataFrame
}

/** The default deterministic implementation: name-signal + data-profile
  * rules (Classify's rule constants; SQL twin = Classify.classifiedSql).
  * Answers every column — nothing queued.
  */
object RulesClassifier extends Classifier {
  import Classify._

  val name: String = Model

  def respond(df: DataFrame): DataFrame = {
    val uniq = col("n_distinct").cast("double") / col("n_rows")
    val bkConf = when(uniq >= 0.999, 0.95).otherwise(0.85)
    val category =
      when(col("name_bk"), CatBk)
        .when(col("name_sens"), CatSens)
        .when(col("name_label"), CatDesc)
        .when(col("complex_t"), CatDesc)
        .when(col("uniq_ok_type") && uniq >= 0.95, CatBk)
        .otherwise(CatDesc)
    val confidence =
      when(col("name_bk"), bkConf)
        .when(col("name_sens"), 0.90)
        .when(col("name_label"), 0.90)
        .when(col("complex_t"), 0.55)
        .when(col("uniq_ok_type") && uniq >= 0.95, 0.75)
        .otherwise(0.90)
    val reason =
      when(col("name_bk") && uniq >= 0.999, ReasonBkUnique)
        .when(col("name_bk"), ReasonBkRepeat)
        .when(col("name_sens"), ReasonSensitive)
        .when(col("name_label"), ReasonLabel)
        .when(col("complex_t"), ReasonComplex)
        .when(col("uniq_ok_type") && uniq >= 0.95, ReasonUniqNoName)
        .otherwise(ReasonPlain)
    df.withColumn("category", coalesce(col("ov_category"), category))
      .withColumn("confidence", coalesce(col("ov_confidence"), confidence))
      .withColumn("reason", coalesce(col("ov_reason"), reason))
  }
}

/** A classifier mid-queue: `inner`'s responses exist only for columns
  * matching `answered`; everything else has no response yet (NULL category/
  * confidence/reason → 'Queued for Processing' in the status views). This
  * is the second implementation proving the seam — it models the
  * reference's asynchronous background worker whose response table lags the
  * catalog (bgw_transformer_client.rs processes source_objects in batches).
  */
final case class QueuedClassifier(inner: Classifier, answered: Column) extends Classifier {
  val name: String = inner.name

  def respond(df: DataFrame): DataFrame = {
    val full = inner.respond(df)
    full
      .withColumn("category", when(answered, col("category")))
      .withColumn("confidence", when(answered, col("confidence")))
      .withColumn("reason", when(answered, col("reason")))
  }
}

/** A model-client-backed classifier: consumes a table of RAW model JSON
  * responses keyed by (table, column) — the auto_dw.transformer_responses
  * analogue — and parses the reference's response contract
  * (prompt_template.rs:227-233: a JSON object carrying the category with
  * "Confidence Value" and "Reason") with from_json. Columns without a
  * response row stay NULL → 'Queued for Processing', exactly the lag
  * behavior of the asynchronous background worker. Swapping in a live
  * model client means only writing rows to the responses table; nothing
  * in the status machinery changes.
  */
final case class JsonResponseClassifier(responses: DataFrame,
                                        modelName: String = "json-client-v0") extends Classifier {
  val name: String = modelName

  def respond(df: DataFrame): DataFrame = {
    val parsed = responses.select(
      col("table_name"), col("column_name"),
      from_json(col("response_json"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "Category STRING, `Confidence Value` DOUBLE, Reason STRING")).as("r"))
      .select(col("table_name"), col("column_name"),
        col("r.Category").as("resp_category"),
        col("r.`Confidence Value`").as("resp_confidence"),
        col("r.Reason").as("resp_reason"))
    // A retrying model client can write several responses for one column —
    // keep exactly one (highest confidence, deterministic tie-break) so the
    // left join cannot fan catalog rows out.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("table_name", "column_name")
      .orderBy(col("resp_confidence").desc_nulls_last, col("resp_category"), col("resp_reason"))
    val dedup = parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // user update_context overrides outrank the model, same as the rules
    // engine (Classifier.scala:64)
    df.join(dedup, Seq("table_name", "column_name"), "left_outer")
      .withColumn("category", coalesce(col("ov_category"), col("resp_category")))
      .withColumn("confidence", coalesce(col("ov_confidence"), col("resp_confidence")))
      .withColumn("reason", coalesce(col("ov_reason"), col("resp_reason")))
      .drop("resp_category", "resp_confidence", "resp_reason")
  }
}
