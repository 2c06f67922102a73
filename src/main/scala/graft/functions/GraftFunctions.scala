package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared deterministic column expressions, each with a DuckDB-SQL twin.
  *
  * The reference computes hash keys as sha256(array_to_string(parts, ','))
  * (extension/src/controller/dv_loader.rs:170,331 and lib.rs:153 `hash`).
  * graft keeps that contract: lowercase-hex SHA-256 over a ','-joined
  * canonical string form, with a per-type canonicalization that renders
  * identically in Spark and DuckDB (SURVEY.md §5).
  */
object GraftFunctions {

  /** Canonical string form of a column for hashing / _bk storage. */
  def canon(c: Column, typeName: String): Column = typeName match {
    case "double"    => c.cast(DecimalType(12, 2)).cast("string")
    case "timestamp" => unix_millis(c.cast("timestamp")).cast("string")
    case _           => c.cast("string")
  }

  def canonSql(name: String, typeName: String): String = typeName match {
    case "double"    => s"CAST(CAST($name AS DECIMAL(12,2)) AS VARCHAR)"
    case "timestamp" => s"CAST(epoch_ms($name) AS VARCHAR)"
    case _           => s"CAST($name AS VARCHAR)"
  }

  /** Data-vault hash key: sha256 over ','-joined canonical parts. */
  def dvHash(parts: Seq[Column]): Column =
    sha2(concat_ws(",", parts.map(c => coalesce(c, lit(""))): _*), 256)

  def dvHashSql(parts: Seq[String]): String =
    s"sha256(concat_ws(',', ${parts.map(p => s"COALESCE($p, '')").mkString(", ")}))"

  /** 64-bit token hash usable identically in both engines:
    * first 15 hex chars of md5 parsed base-16 (60 bits, always positive).
    * Spark: conv(substr(md5(x),1,15),16,10)::long
    * DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT
    */
  def md5Long64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def md5Long64Sql(e: String): String =
    s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"
}
