package graft.dv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Column-classification status machinery — profiling, deploy-status
  * windows, and the SQL oracle twins. The classification itself lives
  * behind the pluggable [[Classifier]] seam (default: [[RulesClassifier]],
  * graft's deterministic stand-in for the reference's LLM transformer,
  * extension/src/controller/bgw_transformer_client.rs +
  * model/prompt_template.rs). This object re-expresses the reference's
  * exact deploy-status window logic (model/queries.rs:441-532: bk_hold /
  * bkp_cnt over the table, NULL confidence = 'Queued for Processing',
  * threshold = the pg_auto_dw.accepted_transformer_confidence_level GUC,
  * utility/guc.rs:90 — here a parameter defaulting to [[Threshold]]).
  *
  * Rules combine static name signals with one data-profiling pass per table
  * (uniqueness ratio from exact distinct counts). Zero egress, reproducible,
  * and — unlike the reference — expressible as SQL for the oracle twin.
  */
object Classify {

  /** Default accepted_transformer_confidence_level (reference guc.rs:90). */
  val Threshold = 0.80
  val Model = "graft-rules-v1"

  final case class Signal(
      schema: String, table: String, column: Col, ordinal: Int,
      nameBk: Boolean, nameSens: Boolean, nameLabel: Boolean,
      complexT: Boolean, uniqOkType: Boolean) {
    /** The rules consult the uniqueness ratio only for key-named columns and
      * for unnamed uniq-BK candidates that no earlier rule captures — exact
      * distinct counting is skipped everywhere else (it's the expensive part
      * of the profiling pass at scale).
      */
    def needsUniq: Boolean = nameBk || (uniqOkType && !nameSens && !nameLabel && !complexT)
  }

  /** Name signals for an arbitrary table schema — the rule set is a pure
    * function of (names, types), so any newly arriving schema (a streaming
    * re-scan, a landing-zone table) classifies with no registry entry.
    */
  def signalsFor(schema: String, table: String, cols: Seq[Col]): Seq[Signal] = {
    val partyTable = cols.exists(_.name.matches(".*acctbal$"))
    cols.zipWithIndex.map { case (c, i) =>
      Signal(
        schema = schema, table = table, column = c, ordinal = i + 1,
        nameBk = c.name.matches(".*(key|id)$"),
        nameSens = partyTable && c.name.matches(".*(name|acctbal)$"),
        nameLabel = c.name.matches(".*name$|^ts$|.*(date|time|_at)$"),
        complexT = SourceSchemas.isComplex(c),
        uniqOkType = Set("bigint", "int", "varchar").contains(c.typeName))
    }
  }

  /** Static name signals for every source column (shared by the Spark path
    * and the SQL generator, so both sides bake in identical flags).
    */
  val signals: Seq[Signal] = SourceSchemas.tables.flatMap { case (t, cols) =>
    signalsFor(SourceSchemas.schemaOf(t), t, cols)
  }

  // Rule constants (category, confidence, reason) — single source of truth.
  val ReasonBkUnique = "Key-pattern name with unique values; strong hub business key."
  val ReasonBkRepeat = "Key-pattern name with repeating values; relationship key part."
  val ReasonSensitive = "PII-pattern attribute on a party table; route to a sensitive satellite."
  val ReasonLabel = "Label or time attribute; descriptive by naming convention."
  val ReasonComplex = "Complex-typed payload column; descriptive, needs modeling context."
  val ReasonUniqNoName = "Near-unique values without a key-like name; candidate business key needing context."
  val ReasonPlain = "Attribute column with no key or sensitivity signal."

  val CatBk = "Business Key Part"
  val CatDesc = "Descriptor"
  val CatSens = "Descriptor - Sensitive"

  /** update_context equivalent (reference docs/sql_functions/update_context.md):
    * user-supplied context that overrides the automated classification of a
    * column. The demo overrides resolve the two auto-SKIPped tables the way
    * the reference's Act-2 walkthrough does.
    */
  type Overrides = Map[(String, String), (String, Double, String)]

  val demoContext: Overrides = Map(
    ("documents", "text") ->
      ((CatDesc, 0.90, "User context: free-text payload, not an identifier.")),
    ("embeddings", "embedding") ->
      ((CatDesc, 0.90, "User context: embedding payload for similarity search.")))

  // ------------------------------------------------------------------
  // Spark side: one profiling agg per table, stacked to long form.
  // ------------------------------------------------------------------
  // r15: through SessionCache (was a local identityHashCode-keyed TrieMap
  // — the GC'd-session collision hazard SessionCache's design notes warn
  // about, and invisible to the bench's memo_builds accounting)
  private def statsDf(s: SparkSession, dir: String): DataFrame =
    graft.queries.SessionCache.memo(s, "classify_stats", dir)(statsDfUncached(s, dir))

  private def statsDfUncached(s: SparkSession, dir: String): DataFrame = {
    val sigByTable = signals.groupBy(_.table)
    val perTable = SourceSchemas.tables.map { case (t, cols) =>
      val src = Tables.load(s, dir, t)
      val sigs = sigByTable(t)
      val atomic = cols.filterNot(SourceSchemas.isComplex)
      def needsUniq(c: Col) = sigs.find(_.column.name == c.name).exists(_.needsUniq)
      // r14 (guide §2.3 "aggregate before you shuffle" — the dv_source_
      // profile discipline applied to the classifier's own profiling pass):
      // k exact countDistincts in ONE Aggregate plan an Expand that
      // replicates the input (k+1)-fold through a single exchange —
      // measured ~13 s for the 10-table profile at sf0.1, the dominant
      // one-time cost of every classification session. Now: one plain
      // no-distinct aggregate per table (row count + per-column non-null
      // counts — scan-local partials, no Expand), plus one stack-unpivot
      // (column, value) two-phase agg for ONLY the uniq-consulted columns
      // — partial aggregation collapses repeated values map-side, and the
      // shuffle is keyed by VALUE so a high-cardinality column spreads
      // instead of concentrating (the same measured 2.5s→1.2s shape as
      // dv_source_profile). The distinct counts stay EXACT and identical:
      // CAST(x AS STRING) is injective for every uniq-consulted type
      // (guarded below — a drifted column type fails loudly, never counts
      // differently from the oracle's count(DISTINCT)).
      val uniqSafeTypes = Set("int", "bigint", "varchar", "date")
      val aggs = atomic.map(c => count(col(c.name)).as(s"nn_${c.name}")) :+
        count(lit(1)).as("n_rows")
      val one = src.agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${atomic.size}, " +
        atomic.map(c => s"'${c.name}', nn_${c.name}").mkString(", ") +
        ") as (column_name, n_nonnull)"
      val plain = one.select(lit(t).as("table_name"), col("n_rows"), expr(stackExpr))
      val uniqCols = atomic.filter(needsUniq)
      val withNd =
        if (uniqCols.isEmpty) plain.withColumn("n_distinct", lit(0L))
        else {
          uniqCols.filterNot(c => uniqSafeTypes.contains(c.typeName)).foreach(c =>
            throw new IllegalStateException(
              s"$t.${c.name} (${c.typeName}) is uniq-consulted but not injectively " +
                "string-castable — extend Classify.statsDfUncached's canon"))
          val uStack = s"stack(${uniqCols.size}, " +
            uniqCols.map(c => s"'${c.name}', CAST(${c.name} AS STRING)").mkString(", ") +
            ") as (column_name, v)"
          val nd = src.select(expr(uStack))
            .groupBy(col("column_name"), col("v")).agg(count(lit(1)).as("cnt"))
            .groupBy(col("column_name"))
            .agg(sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("nd"))
          plain.join(broadcast(nd), Seq("column_name"), "left")
            .withColumn("n_distinct", coalesce(col("nd"), lit(0L))).drop("nd")
        }
      val base = withNd.select(col("table_name"), col("n_rows"), col("column_name"),
        col("n_distinct"), col("n_nonnull"))
      val complexRows = cols.filter(SourceSchemas.isComplex).map(c =>
        one.select(lit(t).as("table_name"), col("n_rows"),
          lit(c.name).as("column_name"), lit(0L).as("n_distinct"), lit(0L).as("n_nonnull")))
      complexRows.foldLeft(base)(_ unionByName _)
    }
    perTable.reduce(_ unionByName _)
  }

  private def signalsDf(s: SparkSession, overrides: Overrides): DataFrame = {
    import s.implicits._
    signals.map { g =>
      val ov = overrides.get((g.table, g.column.name))
      (g.schema, g.table, g.column.name, g.ordinal, g.column.typeName,
        g.nameBk, g.nameSens, g.nameLabel, g.complexT, g.uniqOkType,
        ov.map(_._1), ov.map(_._2), ov.map(_._3))
    }.toDF("schema_name", "table_name", "column_name", "ordinal", "data_type",
      "name_bk", "name_sens", "name_label", "complex_t", "uniq_ok_type",
      "ov_category", "ov_confidence", "ov_reason")
  }

  /** The joined catalog+profile frame a [[Classifier]] consumes. */
  def catalogProfile(s: SparkSession, dir: String, overrides: Overrides = Map.empty): DataFrame =
    statsDf(s, dir).join(signalsDf(s, overrides), Seq("table_name", "column_name"))

  /** Reference status logic (model/queries.rs:483-497), verbatim semantics —
    * including NULL confidence (no classifier response yet) surfacing as
    * 'Queued for Processing' (queries.rs:486).
    */
  private def withStatus(df: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy("schema_name", "table_name")
    val isBkp = col("category") === CatBk
    val bkHold = max(when(isBkp && col("confidence") < threshold, 1).otherwise(0)).over(w)
    val bkpCnt = sum(when(isBkp, 1).otherwise(0)).over(w)
    val conf = col("confidence")
    val g = threshold
    df.withColumn("bk_hold", bkHold)
      .withColumn("bkp_cnt", bkpCnt)
      .withColumn("status",
        when(conf.isNull, "Queued for Processing")
          .when(isBkp && conf >= g && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Link Implementation")
          .when(!isBkp && conf >= g && col("bk_hold") === 0 && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Link Implementation")
          .when(!isBkp && conf >= g && col("bk_hold") === 1 && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation")
          .when(isBkp && conf >= g, "Ready to Deploy")
          .when(!isBkp && conf >= g && col("bk_hold") === 0, "Ready to Deploy")
          .when(!isBkp && conf >= g && col("bk_hold") === 1, "Ready to Deploy - Awaiting Business Key (BK)")
          .otherwise("Requires Attention"))
  }

  /** status_response text; '-' for queued rows (reference queries.rs:498). */
  private def responseCol(threshold: Double, model: String): Column = {
    val head = when(col("confidence") >= threshold, "Ready to Deploy").otherwise("Requires Attention")
    val pct = round(col("confidence") * 100, 0).cast("int").cast("string")
    when(col("confidence").isNull, lit("-")).otherwise(
      concat(lit("Status: "), head, lit(s": Model: $model categorized this column as a "),
        col("category"), lit(" with a confidence of "), pct,
        lit("%.  Model Reasoning: "), col("reason")))
  }

  /** source_column() — per-column classification + deploy status. */
  def sourceColumnStatus(s: SparkSession, dir: String, overrides: Overrides = Map.empty,
                         threshold: Double = Threshold,
                         classifier: Classifier = RulesClassifier): DataFrame = {
    val df = withStatus(classifier.respond(catalogProfile(s, dir, overrides)), threshold)
    df.select(
      col("schema_name"), col("table_name"), col("column_name"), col("ordinal"),
      col("category"), col("confidence"), col("status"),
      responseCol(threshold, classifier.name).as("status_response"))
      .orderBy("table_name", "ordinal")
  }

  /** source_table() — table rollup (RTD / SKIP, reference lib.rs:82 + docs);
    * tables with any still-unclassified column report 'Queued for
    * Processing' (the table cannot deploy or skip until the queue drains).
    */
  def sourceTableStatus(s: SparkSession, dir: String, overrides: Overrides = Map.empty,
                        threshold: Double = Threshold,
                        classifier: Classifier = RulesClassifier): DataFrame = {
    val cols = withStatus(classifier.respond(catalogProfile(s, dir, overrides)), threshold)
    cols.groupBy("schema_name", "table_name")
      .agg(count(lit(1)).as("n_columns"),
        sum(when(col("category") === CatBk, 1).otherwise(0)).as("n_bk_parts"),
        sum(when(col("confidence") < threshold, 1).otherwise(0)).as("n_attention"),
        sum(when(col("confidence").isNull, 1).otherwise(0)).as("n_queued"))
      .select(
        col("schema_name"), col("table_name"),
        col("n_columns"), col("n_bk_parts"),
        when(col("n_queued") > 0, "Queued for Processing")
          .when(col("n_attention") > 0, "Skipped").otherwise("Ready to Deploy").as("status"),
        when(col("n_queued") > 0, "QUEUE")
          .when(col("n_attention") > 0, "SKIP").otherwise("RTD").as("status_code"),
        when(col("n_queued") > 0, lit("Source Table has column(s) awaiting classification."))
          .when(col("n_attention") > 0,
            concat(lit("Source Table was skipped as column(s) need additional context. " +
              "Please run the following SQL query for more information: SELECT * FROM " +
              "dv_source_column_status WHERE table_name = '"), col("table_name"), lit("'.")))
          .otherwise("Source Table is ready to deploy.").as("status_response"))
      .orderBy("table_name")
  }

  // ------------------------------------------------------------------
  // SQL twin (DuckDB oracle) — generated from the same signals/constants.
  // ------------------------------------------------------------------
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private[dv] def statsSql(overrides: Overrides): String =
    signals.map { g =>
      val (nd, nn) =
        if (g.complexT) ("CAST(0 AS BIGINT)", "CAST(0 AS BIGINT)")
        else if (!g.needsUniq) ("CAST(0 AS BIGINT)", s"count(${g.column.name})")
        else (s"count(DISTINCT ${g.column.name})", s"count(${g.column.name})")
      val ov = overrides.get((g.table, g.column.name))
      val (ovC, ovF, ovR) = ov match {
        case Some((c, f, r)) => (sqlLit(c), s"CAST($f AS DOUBLE)", sqlLit(r))
        case None => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT ${sqlLit(g.schema)} AS schema_name, ${sqlLit(g.table)} AS table_name, ${sqlLit(g.column.name)} AS column_name,
         |  ${g.ordinal} AS ordinal, ${sqlLit(g.column.typeName)} AS data_type,
         |  ${if (g.nameBk) 1 else 0} AS name_bk, ${if (g.nameSens) 1 else 0} AS name_sens,
         |  ${if (g.nameLabel) 1 else 0} AS name_label, ${if (g.complexT) 1 else 0} AS complex_t,
         |  ${if (g.uniqOkType) 1 else 0} AS uniq_ok_type,
         |  $ovC AS ov_category, $ovF AS ov_confidence, $ovR AS ov_reason,
         |  $nd AS n_distinct, $nn AS n_nonnull, count(*) AS n_rows
         |FROM ${g.table}""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** SQL twin of the classifier seam: rules answers, NULLed out for rows a
    * mid-queue classifier has not reached (`queuedPredSql` = the SQL form
    * of QueuedClassifier.answered; None = everything answered).
    */
  private def classifiedSql(queuedPredSql: Option[String]): String = {
    val base = classifiedRulesSql
    queuedPredSql match {
      case None => base
      case Some(pred) =>
        s"""SELECT * EXCLUDE (category, confidence, reason),
           |  CASE WHEN $pred THEN category ELSE NULL END AS category,
           |  CASE WHEN $pred THEN confidence ELSE NULL END AS confidence,
           |  CASE WHEN $pred THEN reason ELSE NULL END AS reason
           |FROM ($base)""".stripMargin
    }
  }

  private[dv] def classifiedRulesSql: String = {
    val uniq = "CAST(n_distinct AS DOUBLE)/n_rows"
    s"""SELECT *,
       |  COALESCE(ov_category,
       |  CASE WHEN name_bk=1 THEN ${sqlLit(CatBk)}
       |       WHEN name_sens=1 THEN ${sqlLit(CatSens)}
       |       WHEN name_label=1 THEN ${sqlLit(CatDesc)}
       |       WHEN complex_t=1 THEN ${sqlLit(CatDesc)}
       |       WHEN uniq_ok_type=1 AND $uniq >= 0.95 THEN ${sqlLit(CatBk)}
       |       ELSE ${sqlLit(CatDesc)} END) AS category,
       |  COALESCE(ov_confidence,
       |  CASE WHEN name_bk=1 THEN (CASE WHEN $uniq >= 0.999 THEN CAST(0.95 AS DOUBLE) ELSE CAST(0.85 AS DOUBLE) END)
       |       WHEN name_sens=1 THEN CAST(0.90 AS DOUBLE)
       |       WHEN name_label=1 THEN CAST(0.90 AS DOUBLE)
       |       WHEN complex_t=1 THEN CAST(0.55 AS DOUBLE)
       |       WHEN uniq_ok_type=1 AND $uniq >= 0.95 THEN CAST(0.75 AS DOUBLE)
       |       ELSE CAST(0.90 AS DOUBLE) END) AS confidence,
       |  COALESCE(ov_reason,
       |  CASE WHEN name_bk=1 AND $uniq >= 0.999 THEN ${sqlLit(ReasonBkUnique)}
       |       WHEN name_bk=1 THEN ${sqlLit(ReasonBkRepeat)}
       |       WHEN name_sens=1 THEN ${sqlLit(ReasonSensitive)}
       |       WHEN name_label=1 THEN ${sqlLit(ReasonLabel)}
       |       WHEN complex_t=1 THEN ${sqlLit(ReasonComplex)}
       |       WHEN uniq_ok_type=1 AND $uniq >= 0.95 THEN ${sqlLit(ReasonUniqNoName)}
       |       ELSE ${sqlLit(ReasonPlain)} END) AS reason
       |FROM stats""".stripMargin
  }

  private def statusSql(threshold: Double): String =
    s"""SELECT *,
       |  max(CASE WHEN category = ${sqlLit(CatBk)} AND confidence < $threshold THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY schema_name, table_name) AS bk_hold,
       |  sum(CASE WHEN category = ${sqlLit(CatBk)} THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY schema_name, table_name) AS bkp_cnt
       |FROM classified""".stripMargin

  private def statusCaseSql(threshold: Double) =
    s"""CASE
       |  WHEN confidence IS NULL THEN 'Queued for Processing'
       |  WHEN category = '$CatBk' AND confidence >= $threshold AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Link Implementation'
       |  WHEN category <> '$CatBk' AND confidence >= $threshold AND bk_hold = 0 AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Link Implementation'
       |  WHEN category <> '$CatBk' AND confidence >= $threshold AND bk_hold = 1 AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation'
       |  WHEN category = '$CatBk' AND confidence >= $threshold THEN 'Ready to Deploy'
       |  WHEN category <> '$CatBk' AND confidence >= $threshold AND bk_hold = 0 THEN 'Ready to Deploy'
       |  WHEN category <> '$CatBk' AND confidence >= $threshold AND bk_hold = 1 THEN 'Ready to Deploy - Awaiting Business Key (BK)'
       |  ELSE 'Requires Attention' END""".stripMargin

  def sourceColumnStatusSql: String = sourceColumnStatusSql(Map.empty)

  def sourceColumnStatusSql(overrides: Overrides, threshold: Double = Threshold,
                            queuedPredSql: Option[String] = None): String =
    s"""WITH stats AS (
       |${statsSql(overrides)}
       |), classified AS (
       |${classifiedSql(queuedPredSql)}
       |), with_status AS (
       |${statusSql(threshold)}
       |)
       |SELECT schema_name, table_name, column_name, ordinal, category, confidence,
       |  ${statusCaseSql(threshold)} AS status,
       |  CASE WHEN confidence IS NULL THEN '-' ELSE
       |  'Status: ' ||
       |  (CASE WHEN confidence >= $threshold THEN 'Ready to Deploy' ELSE 'Requires Attention' END) ||
       |  ': Model: $Model categorized this column as a ' || category ||
       |  ' with a confidence of ' || CAST(CAST(round(confidence*100, 0) AS INT) AS VARCHAR) ||
       |  '%.  Model Reasoning: ' || reason END AS status_response
       |FROM with_status
       |ORDER BY table_name, ordinal""".stripMargin

  def sourceTableStatusSql: String = sourceTableStatusSql(Map.empty)

  def sourceTableStatusSql(overrides: Overrides, threshold: Double = Threshold,
                           queuedPredSql: Option[String] = None): String =
    s"""WITH stats AS (
       |${statsSql(overrides)}
       |), classified AS (
       |${classifiedSql(queuedPredSql)}
       |), rollup_t AS (
       |  SELECT schema_name, table_name,
       |    count(*) AS n_columns,
       |    CAST(sum(CASE WHEN category = ${sqlLit(CatBk)} THEN 1 ELSE 0 END) AS BIGINT) AS n_bk_parts,
       |    CAST(sum(CASE WHEN confidence < $threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_attention,
       |    CAST(sum(CASE WHEN confidence IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_queued
       |  FROM classified GROUP BY schema_name, table_name
       |)
       |SELECT schema_name, table_name, n_columns, n_bk_parts,
       |  CASE WHEN n_queued > 0 THEN 'Queued for Processing'
       |       WHEN n_attention > 0 THEN 'Skipped' ELSE 'Ready to Deploy' END AS status,
       |  CASE WHEN n_queued > 0 THEN 'QUEUE'
       |       WHEN n_attention > 0 THEN 'SKIP' ELSE 'RTD' END AS status_code,
       |  CASE WHEN n_queued > 0 THEN 'Source Table has column(s) awaiting classification.'
       |  WHEN n_attention > 0 THEN
       |    'Source Table was skipped as column(s) need additional context. Please run the following SQL query for more information: SELECT * FROM dv_source_column_status WHERE table_name = ''' || table_name || '''.'
       |  ELSE 'Source Table is ready to deploy.' END AS status_response
       |FROM rollup_t
       |ORDER BY table_name""".stripMargin
}
