package graft.dv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic column classifier — graft's stand-in for the reference's
  * LLM transformer (extension/src/controller/bgw_transformer_client.rs +
  * model/prompt_template.rs). Same output contract: a category
  * ('Business Key Part' / 'Descriptor' / 'Descriptor - Sensitive'), a
  * confidence score, and a reason per column; plus the reference's exact
  * deploy-status window logic (model/queries.rs:441-532: bk_hold / bkp_cnt
  * over the table, threshold = accepted_transformer_confidence_level).
  *
  * Rules combine static name signals with one data-profiling pass per table
  * (uniqueness ratio from exact distinct counts). Zero egress, reproducible,
  * and — unlike the reference — expressible as SQL for the oracle twin.
  */
object Classify {

  val Threshold = 0.80
  val Model = "graft-rules-v1"
  val Schema = "source"

  final case class Signal(
      table: String, column: Col, ordinal: Int,
      nameBk: Boolean, nameSens: Boolean, nameLabel: Boolean,
      complexT: Boolean, uniqOkType: Boolean) {
    /** The rules consult the uniqueness ratio only for key-named columns and
      * for unnamed uniq-BK candidates that no earlier rule captures — exact
      * distinct counting is skipped everywhere else (it's the expensive part
      * of the profiling pass at scale).
      */
    def needsUniq: Boolean = nameBk || (uniqOkType && !nameSens && !nameLabel && !complexT)
  }

  /** Static name signals for every source column (shared by the Spark path
    * and the SQL generator, so both sides bake in identical flags).
    */
  val signals: Seq[Signal] = SourceSchemas.tables.flatMap { case (t, cols) =>
    val partyTable = cols.exists(_.name.matches(".*acctbal$"))
    cols.zipWithIndex.map { case (c, i) =>
      Signal(
        table = t, column = c, ordinal = i + 1,
        nameBk = c.name.matches(".*(key|id)$"),
        nameSens = partyTable && c.name.matches(".*(name|acctbal)$"),
        nameLabel = c.name.matches(".*name$|^ts$|.*(date|time|_at)$"),
        complexT = SourceSchemas.isComplex(c),
        uniqOkType = Set("bigint", "int", "varchar").contains(c.typeName))
    }
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
  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def statsDf(s: SparkSession, dir: String): DataFrame =
    statsCache.getOrElseUpdate((System.identityHashCode(s).toString, dir),
      statsDfUncached(s, dir).cache())

  private def statsDfUncached(s: SparkSession, dir: String): DataFrame = {
    val sigByTable = signals.groupBy(_.table)
    val perTable = SourceSchemas.tables.map { case (t, cols) =>
      val src = Tables.load(s, dir, t)
      val sigs = sigByTable(t)
      val atomic = cols.filterNot(SourceSchemas.isComplex)
      def needsUniq(c: Col) = sigs.find(_.column.name == c.name).exists(_.needsUniq)
      val aggs = atomic.flatMap { c =>
        val nd =
          if (needsUniq(c)) countDistinct(col(c.name)).as(s"nd_${c.name}")
          else lit(0L).as(s"nd_${c.name}")
        Seq(nd, count(col(c.name)).as(s"nn_${c.name}"))
      } :+ count(lit(1)).as("n_rows")
      val one = src.agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${atomic.size}, " +
        atomic.map(c => s"'${c.name}', nd_${c.name}, nn_${c.name}").mkString(", ") +
        ") as (column_name, n_distinct, n_nonnull)"
      val stacked = one.select(lit(t).as("table_name"), col("n_rows"), expr(stackExpr))
      val complexRows = cols.filter(SourceSchemas.isComplex).map(c =>
        one.select(lit(t).as("table_name"), col("n_rows"),
          lit(c.name).as("column_name"), lit(0L).as("n_distinct"), lit(0L).as("n_nonnull")))
      complexRows.foldLeft(stacked)(_ unionByName _)
    }
    perTable.reduce(_ unionByName _)
  }

  private def signalsDf(s: SparkSession, overrides: Overrides): DataFrame = {
    import s.implicits._
    signals.map { g =>
      val ov = overrides.get((g.table, g.column.name))
      (g.table, g.column.name, g.ordinal, g.column.typeName,
        g.nameBk, g.nameSens, g.nameLabel, g.complexT, g.uniqOkType,
        ov.map(_._1), ov.map(_._2), ov.map(_._3))
    }.toDF("table_name", "column_name", "ordinal", "data_type",
      "name_bk", "name_sens", "name_label", "complex_t", "uniq_ok_type",
      "ov_category", "ov_confidence", "ov_reason")
  }

  /** Category/confidence/reason expressions over the joined stats+signals. */
  private def classified(df: DataFrame): DataFrame = {
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

  /** Reference status logic (model/queries.rs:483-497), verbatim semantics. */
  private def withStatus(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("table_name")
    val isBkp = col("category") === CatBk
    val bkHold = max(when(isBkp && col("confidence") < Threshold, 1).otherwise(0)).over(w)
    val bkpCnt = sum(when(isBkp, 1).otherwise(0)).over(w)
    val conf = col("confidence")
    val g = Threshold
    df.withColumn("bk_hold", bkHold)
      .withColumn("bkp_cnt", bkpCnt)
      .withColumn("status",
        when(isBkp && conf >= g && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Link Implementation")
          .when(!isBkp && conf >= g && col("bk_hold") === 0 && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Link Implementation")
          .when(!isBkp && conf >= g && col("bk_hold") === 1 && col("bkp_cnt") > 1, "Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation")
          .when(isBkp && conf >= g, "Ready to Deploy")
          .when(!isBkp && conf >= g && col("bk_hold") === 0, "Ready to Deploy")
          .when(!isBkp && conf >= g && col("bk_hold") === 1, "Ready to Deploy - Awaiting Business Key (BK)")
          .otherwise("Requires Attention"))
  }

  private def responseCol: Column = {
    val head = when(col("confidence") >= Threshold, "Ready to Deploy").otherwise("Requires Attention")
    val pct = round(col("confidence") * 100, 0).cast("int").cast("string")
    concat(lit("Status: "), head, lit(s": Model: $Model categorized this column as a "),
      col("category"), lit(" with a confidence of "), pct,
      lit("%.  Model Reasoning: "), col("reason"))
  }

  /** source_column() — per-column classification + deploy status. */
  def sourceColumnStatus(s: SparkSession, dir: String, overrides: Overrides = Map.empty): DataFrame = {
    val df = withStatus(classified(statsDf(s, dir)
      .join(signalsDf(s, overrides), Seq("table_name", "column_name"))))
    df.select(
      lit(Schema).as("schema_name"), col("table_name"), col("column_name"), col("ordinal"),
      col("category"), col("confidence"), col("status"), responseCol.as("status_response"))
      .orderBy("table_name", "ordinal")
  }

  /** source_table() — table rollup (RTD / SKIP, reference lib.rs:82 + docs). */
  def sourceTableStatus(s: SparkSession, dir: String, overrides: Overrides = Map.empty): DataFrame = {
    val cols = withStatus(classified(statsDf(s, dir)
      .join(signalsDf(s, overrides), Seq("table_name", "column_name"))))
    cols.groupBy("table_name")
      .agg(count(lit(1)).as("n_columns"),
        sum(when(col("category") === CatBk, 1).otherwise(0)).as("n_bk_parts"),
        sum(when(col("confidence") < Threshold, 1).otherwise(0)).as("n_attention"))
      .select(
        lit(Schema).as("schema_name"), col("table_name"),
        col("n_columns"), col("n_bk_parts"),
        when(col("n_attention") > 0, "Skipped").otherwise("Ready to Deploy").as("status"),
        when(col("n_attention") > 0, "SKIP").otherwise("RTD").as("status_code"),
        when(col("n_attention") > 0,
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

  private def statsSql(overrides: Overrides): String =
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
      s"""SELECT ${sqlLit(g.table)} AS table_name, ${sqlLit(g.column.name)} AS column_name,
         |  ${g.ordinal} AS ordinal, ${sqlLit(g.column.typeName)} AS data_type,
         |  ${if (g.nameBk) 1 else 0} AS name_bk, ${if (g.nameSens) 1 else 0} AS name_sens,
         |  ${if (g.nameLabel) 1 else 0} AS name_label, ${if (g.complexT) 1 else 0} AS complex_t,
         |  ${if (g.uniqOkType) 1 else 0} AS uniq_ok_type,
         |  $ovC AS ov_category, $ovF AS ov_confidence, $ovR AS ov_reason,
         |  $nd AS n_distinct, $nn AS n_nonnull, count(*) AS n_rows
         |FROM ${g.table}""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def classifiedSql: String = {
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

  private def statusSql: String =
    s"""SELECT *,
       |  max(CASE WHEN category = ${sqlLit(CatBk)} AND confidence < $Threshold THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY table_name) AS bk_hold,
       |  sum(CASE WHEN category = ${sqlLit(CatBk)} THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY table_name) AS bkp_cnt
       |FROM classified""".stripMargin

  private val statusCaseSql =
    s"""CASE
       |  WHEN category = '$CatBk' AND confidence >= $Threshold AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Link Implementation'
       |  WHEN category <> '$CatBk' AND confidence >= $Threshold AND bk_hold = 0 AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Link Implementation'
       |  WHEN category <> '$CatBk' AND confidence >= $Threshold AND bk_hold = 1 AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation'
       |  WHEN category = '$CatBk' AND confidence >= $Threshold THEN 'Ready to Deploy'
       |  WHEN category <> '$CatBk' AND confidence >= $Threshold AND bk_hold = 0 THEN 'Ready to Deploy'
       |  WHEN category <> '$CatBk' AND confidence >= $Threshold AND bk_hold = 1 THEN 'Ready to Deploy - Awaiting Business Key (BK)'
       |  ELSE 'Requires Attention' END""".stripMargin

  def sourceColumnStatusSql: String = sourceColumnStatusSql(Map.empty)

  def sourceColumnStatusSql(overrides: Overrides): String =
    s"""WITH stats AS (
       |${statsSql(overrides)}
       |), classified AS (
       |$classifiedSql
       |), with_status AS (
       |$statusSql
       |)
       |SELECT '$Schema' AS schema_name, table_name, column_name, ordinal, category, confidence,
       |  $statusCaseSql AS status,
       |  'Status: ' ||
       |  (CASE WHEN confidence >= $Threshold THEN 'Ready to Deploy' ELSE 'Requires Attention' END) ||
       |  ': Model: $Model categorized this column as a ' || category ||
       |  ' with a confidence of ' || CAST(CAST(round(confidence*100, 0) AS INT) AS VARCHAR) ||
       |  '%.  Model Reasoning: ' || reason AS status_response
       |FROM with_status
       |ORDER BY table_name, ordinal""".stripMargin

  def sourceTableStatusSql: String = sourceTableStatusSql(Map.empty)

  def sourceTableStatusSql(overrides: Overrides): String =
    s"""WITH stats AS (
       |${statsSql(overrides)}
       |), classified AS (
       |$classifiedSql
       |), rollup_t AS (
       |  SELECT table_name,
       |    count(*) AS n_columns,
       |    CAST(sum(CASE WHEN category = ${sqlLit(CatBk)} THEN 1 ELSE 0 END) AS BIGINT) AS n_bk_parts,
       |    CAST(sum(CASE WHEN confidence < $Threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_attention
       |  FROM classified GROUP BY table_name
       |)
       |SELECT '$Schema' AS schema_name, table_name, n_columns, n_bk_parts,
       |  CASE WHEN n_attention > 0 THEN 'Skipped' ELSE 'Ready to Deploy' END AS status,
       |  CASE WHEN n_attention > 0 THEN 'SKIP' ELSE 'RTD' END AS status_code,
       |  CASE WHEN n_attention > 0 THEN
       |    'Source Table was skipped as column(s) need additional context. Please run the following SQL query for more information: SELECT * FROM dv_source_column_status WHERE table_name = ''' || table_name || '''.'
       |  ELSE 'Source Table is ready to deploy.' END AS status_response
       |FROM rollup_t
       |ORDER BY table_name""".stripMargin
}
