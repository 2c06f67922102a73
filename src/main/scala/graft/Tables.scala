package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the driver-generated source tables (TESTDATA.md).
  *
  * These play the role of pg_auto_dw's "operational source schema"
  * (reference: extension/src/model/queries.rs:65 builds the source-object
  * catalog from pg_catalog; here the catalog derives from parquet footers).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Format-dispatching loader for landing-zone data — the reference's
    * catalog is storage-agnostic (pg_catalog lists every table however it
    * is stored, model/queries.rs:65-321); graft's equivalent is one loader
    * covering the common landing formats. CSV reads header + schema
    * inference; JSON is JSON-lines with inference (inferred fields come
    * back alphabetically ordered — Spark's JSON contract).
    */
  def loadAs(spark: SparkSession, path: String, format: String): DataFrame = format match {
    case "parquet" => spark.read.parquet(path)
    case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case "json" => spark.read.json(path)
    case other => throw new IllegalArgumentException(s"unsupported landing format: $other")
  }

  /** Session defaults applied by every entrypoint (Verify/Bench/tests).
    * nanosAsLong: events.ts is parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; read it as epoch-nanos LONG instead and
    * convert explicitly (ts div 1e6 == DuckDB epoch_ms, exact for t>0).
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString
  )

  def applyConfs(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
