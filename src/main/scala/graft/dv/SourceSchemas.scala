package graft.dv

/** Static registry of the source-table schemas as graft's readers observe
  * them. The runtime parquet introspection (Catalog.introspect) must agree
  * with this registry — asserted column-by-column in DataVaultSpec, so a
  * driver re-export that re-types any column fails ONE test that names the
  * drifted column — and oracle SQL can be generated without a live session.
  * events.ts: currently parquet TIMESTAMP(MICROS) (the 2026-08-13 testdata
  * regeneration re-typed it from TIMESTAMP(NANOS)-read-as-bigint); both
  * shapes normalize through Tables.loadEvents.
  */
object SourceSchemas {

  val tables: Seq[(String, Seq[Col])] = Seq(
    "region" -> Seq(
      Col("r_regionkey", "int"), Col("r_name", "varchar")),
    "nation" -> Seq(
      Col("n_nationkey", "int"), Col("n_name", "varchar"), Col("n_regionkey", "int")),
    "customer" -> Seq(
      Col("c_custkey", "bigint"), Col("c_name", "varchar"), Col("c_nationkey", "int"),
      Col("c_acctbal", "double"), Col("c_mktsegment", "varchar")),
    "supplier" -> Seq(
      Col("s_suppkey", "bigint"), Col("s_name", "varchar"), Col("s_nationkey", "int"),
      Col("s_acctbal", "double")),
    "part" -> Seq(
      Col("p_partkey", "bigint"), Col("p_name", "varchar"), Col("p_brand", "varchar"),
      Col("p_type", "varchar"), Col("p_size", "int"), Col("p_retailprice", "double")),
    "orders" -> Seq(
      Col("o_orderkey", "bigint"), Col("o_custkey", "bigint"), Col("o_orderstatus", "varchar"),
      Col("o_totalprice", "double"), Col("o_orderdate", "timestamp"), Col("o_orderpriority", "varchar")),
    "lineitem" -> Seq(
      Col("l_orderkey", "bigint"), Col("l_partkey", "bigint"), Col("l_suppkey", "bigint"),
      Col("l_linenumber", "int"), Col("l_quantity", "double"), Col("l_extendedprice", "double"),
      Col("l_discount", "double"), Col("l_tax", "double"), Col("l_returnflag", "varchar"),
      Col("l_linestatus", "varchar"), Col("l_shipdate", "timestamp")),
    "events" -> Seq(
      Col("event_id", "bigint"), Col("ts", "timestamp"), Col("user_id", "bigint"),
      Col("event_type", "varchar"), Col("value", "double"), Col("props", "varchar")),
    "documents" -> Seq(
      Col("doc_id", "bigint"), Col("text", "varchar"), Col("lang", "varchar"),
      Col("source", "varchar"), Col("n_chars", "bigint")),
    "embeddings" -> Seq(
      Col("vec_id", "bigint"), Col("embedding", "float[]"), Col("label", "int"))
  )

  def columns(table: String): Seq[Col] = tables.find(_._1 == table).get._2

  /** Schema dimension of the catalog (reference source_include walks
    * schema/table/column patterns, lib.rs:40-46): the operational TPC-H
    * tables live in `source`, the LLM-pipeline feeds in `staging`.
    */
  def schemaOf(table: String): String = table match {
    case "events" | "documents" | "embeddings" => "staging"
    case _                                     => "source"
  }

  val atomicTypes: Set[String] = Set("bigint", "int", "double", "varchar", "timestamp")
  def isComplex(c: Col): Boolean = !atomicTypes.contains(c.typeName)

  /** DECLARED landing-mirror re-typing rules (r9): how Spark's CSV/JSON
    * sniffers re-type each registry column when a source table is
    * mirrored to the landing zone. Pinned HERE — next to the registry the
    * mirrors derive from — so a testdata regeneration that shifts
    * inference fails DataVaultSpec's named mirror-agreement test, not a
    * mid-round oracle hash (the class bit in r7 AND r8). CSV narrowing is
    * value-dependent by design (the sniffer picks int only while every
    * value fits int32), so the CSV rule takes the observed fits-int fact
    * rather than guessing a constant.
    */
  def csvInferred(c: Col, fitsInt: Boolean): String = c.typeName match {
    case "int" | "bigint" => if (fitsInt) "int" else "bigint"
    case other            => other // doubles re-infer double, strings varchar
  }
  def jsonInferred(c: Col): String = c.typeName match {
    case "int" | "bigint" => "bigint" // JSON integrals always widen
    case other            => other
  }
}
