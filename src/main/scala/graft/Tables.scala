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
