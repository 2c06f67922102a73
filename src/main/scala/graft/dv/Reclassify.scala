package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-drift → re-classification, closed as one loop (the reference's
  * background re-scan: controller/bgw_source_objects.rs re-walks the
  * catalog, model/queries.rs:220-319 flips the SCD2 flags on drifted
  * source_objects rows, and controller/bgw_transformer_client.rs then
  * classifies only columns without a current response — existing
  * transformer_responses rows are preserved).
  *
  * graft's loop: [[CatalogScd2.merge]] computes the drift declaratively;
  * only columns whose CURRENT version opened at the re-scan timestamp go
  * back through the [[Classifier]] seam; every other column keeps its
  * prior response verbatim (provably — the kept rows are an anti-join of
  * the v1 response table, not a recomputation).
  */
object Reclassify {

  val T1 = "2024-01-01 00:00:00"
  val T2 = "2024-02-01 00:00:00"

  /** Simulated source drift for the oracle-checked demo: customer.c_acctbal
    * arrives re-typed varchar at the second scan — the lossy-upstream-export
    * drift a catalog re-scan exists to catch.
    */
  val DriftTable = "customer"
  val DriftColumn = "c_acctbal"
  val DriftType = "varchar"

  /** Catalog snapshot from the static registry, with optional per-column
    * type overrides standing in for upstream drift.
    */
  private[dv] def snapshot(s: SparkSession,
                           typeOverride: Map[(String, String), String]): DataFrame = {
    import s.implicits._
    Classify.signals.map { g =>
      val dt = typeOverride.getOrElse((g.table, g.column.name), g.column.typeName)
      (g.table, g.column.name, g.ordinal, dt)
    }.toDF("table_name", "column_name", "ordinal", "data_type")
  }

  /** Two scans, one drifted column, responses carried forward: the output
    * is the post-re-scan response table — `classified_at` shows exactly
    * which columns re-entered the classifier (the drifted one at T2, all
    * others keeping their T1 response), `data_type` shows the current
    * catalog version.
    */
  def reclassifyDrift(s: SparkSession, dir: String,
                      classifier: Classifier = RulesClassifier): DataFrame = {
    val snap1 = snapshot(s, Map.empty)
    val snap2 = snapshot(s, Map((DriftTable, DriftColumn) -> DriftType))
    val state = CatalogScd2.merge(CatalogScd2.init(snap1, T1), snap2, T2)
    val current = state.filter(col("current_flag") === "Y" && col("deleted_flag") === "N")
    // drifted = current versions the re-scan opened
    val drifted = current.filter(col("valid_from") === T2)
      .select("table_name", "column_name")
    val respCols = Seq("table_name", "column_name", "category", "confidence", "reason")
    // v1 = the first scan's full response table
    val v1 = classifier.respond(Classify.catalogProfile(s, dir))
      .select(respCols.map(col): _*)
      .withColumn("classified_at", lit(T1))
    // fresh responses ONLY for drifted columns — the same classifier seam
    // the background worker drives; prior responses stay untouched. The
    // re-scored profile carries the CURRENT catalog types (and the
    // type-derived signals recomputed from them), so the classifier
    // actually sees the drift it is re-scoring — with the name-signal
    // rules the drifted c_acctbal still lands on Descriptor - Sensitive,
    // which is what the static oracle pins.
    val driftedProfile = Classify.catalogProfile(s, dir)
      .drop("data_type")
      .join(current.select("table_name", "column_name", "data_type"),
        Seq("table_name", "column_name"))
      .withColumn("complex_t", !col("data_type").isin(SourceSchemas.atomicTypes.toSeq: _*))
      .withColumn("uniq_ok_type", col("data_type").isin("bigint", "int", "varchar"))
    val fresh = classifier.respond(driftedProfile)
      .join(drifted, Seq("table_name", "column_name"), "left_semi")
      .select(respCols.map(col): _*)
      .withColumn("classified_at", lit(T2))
    val kept = v1.join(drifted, Seq("table_name", "column_name"), "left_anti")
    kept.unionByName(fresh)
      .join(current.select("table_name", "column_name", "data_type"),
        Seq("table_name", "column_name"))
      .select(col("table_name"), col("column_name"), col("data_type"),
        col("category"), col("confidence"), col("classified_at"))
      .orderBy("table_name", "column_name")
  }

  /** Oracle twin: the rules classification (same stats/classified CTEs as
    * the status views) with data_type/classified_at patched for the one
    * drifted column.
    */
  def reclassifyDriftSql: String = {
    val isDrift = s"table_name = '$DriftTable' AND column_name = '$DriftColumn'"
    s"""WITH stats AS (
       |${Classify.statsSql(Map.empty)}
       |), classified AS (
       |${Classify.classifiedRulesSql}
       |)
       |SELECT table_name, column_name,
       |  CASE WHEN $isDrift THEN '$DriftType' ELSE data_type END AS data_type,
       |  category, confidence,
       |  CASE WHEN $isDrift THEN '$T2' ELSE '$T1' END AS classified_at
       |FROM classified
       |ORDER BY table_name, column_name""".stripMargin
  }
}
