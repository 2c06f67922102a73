package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators register here as QueryDefs from the per-domain modules.
  */
object SparkEntry {

  /** Operator registry (SURVEY.md §2). */
  def modules: Seq[QueryModule] = Seq(
    _root_.graft.queries.Analytics,
    _root_.graft.queries.Analytics2,
    _root_.graft.queries.Analytics3,
    _root_.graft.queries.Analytics4,
    _root_.graft.queries.DataVault,
    _root_.graft.queries.Text,
    _root_.graft.queries.Curate,
    _root_.graft.queries.Bpe,
    _root_.graft.queries.Dedup,
    _root_.graft.queries.Spans,
    _root_.graft.queries.Rank,
    _root_.graft.queries.Similarity,
    _root_.graft.queries.Pq,
    _root_.graft.queries.Multimodal
  )

  private lazy val allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
