package graft.queries

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Training-data curation over `documents` — the composite steps a corpus
  * pipeline runs after the per-doc analyses (quality / language / dedup)
  * have produced their signals.
  *
  * `pipeline_curate` composes the existing operators as DataFrames — the
  * Spark-first analogue of the reference's view-over-view layering: each
  * stage stays an independent declarative plan and Catalyst fuses the
  * composition (common scans dedup via the shared [[Docs]] pass).
  *
  * `sample_stratified` is deterministic hash-ordered stratified sampling:
  * rank by a stable 64-bit hash of the doc id inside each stratum and keep
  * the first k. No RNG, so the sample is reproducible across engines,
  * retries, and cluster sizes — at 100 TB this is one window per stratum
  * partition, no global sort and no driver-side sampling pass.
  */
object Curate extends QueryModule {

  // ------------------------------------------------- sample_stratified
  private val StratumChars = 500L // document-length bucket width
  private val SamplePerStratum = 10

  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val st = Docs.enriched(s, dir).select(
      col("doc_id"),
      expr(s"cast(length(text) as bigint) div $StratumChars").as("stratum"),
      md5Long64(col("doc_id").cast("string")).as("sample_key"))
    val w = Window.partitionBy("stratum").orderBy(col("sample_key"), col("doc_id"))
    st.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= SamplePerStratum)
      .select("stratum", "rk", "doc_id", "sample_key")
      .orderBy("stratum", "rk")
  }

  private val sampleStratifiedSql =
    s"""WITH st AS (
       |  SELECT doc_id,
       |         CAST(length(text) AS BIGINT) // $StratumChars AS stratum,
       |         ${md5Long64Sql("CAST(doc_id AS VARCHAR)")} AS sample_key
       |  FROM documents),
       |ranked AS (
       |  SELECT stratum, doc_id, sample_key,
       |         CAST(row_number() OVER (PARTITION BY stratum ORDER BY sample_key, doc_id) AS BIGINT) AS rk
       |  FROM st)
       |SELECT stratum, rk, doc_id, sample_key
       |FROM ranked WHERE rk <= $SamplePerStratum
       |ORDER BY stratum, rk""".stripMargin

  // --------------------------------------------------- pipeline_curate
  // Keep a document iff it (a) survives exact dedup, (b) clears the
  // quality bar, (c) has enough words, and (d) gets a confident language
  // call. Every signal is the already-oracle-checked operator's output;
  // the filters are joins, so at scale this is two hash-shuffles on
  // doc_id over signals that are each a single scan-bound pass.
  private val MinWords = 20L
  private val MinQuality = 0.40

  private def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val q = Text.quality(s, dir).select("doc_id", "n_words", "quality_score")
    val survivors = Text.dedupExact(s, dir).select(col("survivor_doc_id").as("doc_id"))
    val lang = Text.langId(s, dir).select("doc_id", "predicted_lang")
    q.join(survivors, "doc_id")
      .join(lang, "doc_id")
      .filter(col("n_words") >= MinWords && col("quality_score") >= MinQuality &&
        col("predicted_lang") =!= "unknown")
      .select("doc_id", "n_words", "quality_score", "predicted_lang")
      .orderBy("doc_id")
  }

  private val pipelineCurateSql =
    s"""WITH q AS (${Text.qualitySql}),
       |survivors AS (SELECT survivor_doc_id AS doc_id FROM (${Text.dedupExactSql})),
       |lang AS (SELECT doc_id, predicted_lang FROM (${Text.langIdSql}))
       |SELECT q.doc_id, q.n_words, q.quality_score, lang.predicted_lang
       |FROM q
       |JOIN survivors ON survivors.doc_id = q.doc_id
       |JOIN lang ON lang.doc_id = q.doc_id
       |WHERE q.n_words >= $MinWords AND q.quality_score >= $MinQuality
       |  AND lang.predicted_lang <> 'unknown'
       |ORDER BY q.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    QueryDef("pipeline_curate", pipelineCurate, Some(pipelineCurateSql))
  )
}
