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

  /** Data-vault hash key: sha256 over ','-joined canonical parts, carried
    * as BINARY(32) (r12, the r11 verdict #6 spill finding: dv_go_build's
    * 46.5 GB sf10 spill was dominated by two 64-char hex strings per
    * sat/link row — 68 UTF-8 bytes each where the digest is 32). Every
    * vault shuffle, anti-join, bucket key and parquet write moves the
    * 32-byte form; hex rendering happens ONLY at the oracle-facing edge
    * ([[hexDigests]]), where lower(hex(x)) reproduces the reference's
    * lowercase-hex contract bit for bit. Binary is order-compatible:
    * Spark compares BinaryType by unsigned bytes and hex is monotonic in
    * that order, so ORDER BY binary == ORDER BY hex — no plan's row order
    * moves under the edge projection.
    */
  def dvHash(parts: Seq[Column]): Column = unhex(dvHashHex(parts))

  /** The hex-string form (the reference's own rendering, lib.rs:153) —
    * for edges that hash-compare against DuckDB's sha256. */
  def dvHashHex(parts: Seq[Column]): Column =
    sha2(concat_ws(",", parts.map(c => coalesce(c, lit(""))): _*), 256)

  def dvHashSql(parts: Seq[String]): String =
    s"sha256(concat_ws(',', ${parts.map(p => s"COALESCE($p, '')").mkString(", ")}))"

  /** Oracle-facing edge: render every BINARY column of `df` as lowercase
    * hex (Spark's hex() is uppercase — the reference and DuckDB's sha256
    * are lowercase). Generic by TYPE so no op can forget a digest column;
    * vault frames carry no other binary payloads.
    */
  def hexDigests(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bins = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.BinaryType).map(_.name)
    bins.foldLeft(df)((d, c) => d.withColumn(c, lower(hex(col(c)))))
  }

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
