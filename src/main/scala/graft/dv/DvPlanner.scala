package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Source-catalog introspection + DV plan derivation.
  *
  * The reference walks pg_catalog (model/queries.rs:65-218) and lets an LLM
  * choose business keys; graft introspects parquet footers and derives the
  * plan from the deterministic classifier signals.
  */
object Catalog {

  def typeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType                 => "bigint"
      case IntegerType              => "int"
      case DoubleType               => "double"
      case StringType               => "varchar"
      case TimestampType            => "timestamp"
      case TimestampNTZType         => "timestamp"
      case FloatType                => "float"
      case ArrayType(FloatType, _)  => "float[]"
      case other                    => other.typeName
    }
  }

  /** source_include / source_exclude (reference lib.rs:39-79,
    * source_object_dw(schema, table, column) in queries.rs:65): regex
    * include/exclude patterns over (schema, table, column). Pattern
    * matching runs driver-side on metadata (as the reference's catalog SQL
    * does), with Java regex semantics on both the live and static paths.
    */
  def select(s: SparkSession, dir: String,
             tableInclude: String, columnInclude: String,
             tableExclude: String, columnExclude: String,
             schemaInclude: String = ".*", schemaExclude: String = "^$"): DataFrame = {
    import s.implicits._
    val rows = selectStatic(tableInclude, columnInclude, tableExclude, columnExclude,
      schemaInclude, schemaExclude)
    // Validate the static registry against live footers, then emit.
    val live = introspect(s, dir)
    rows.toDF("schema_name", "table_name", "column_name", "ordinal", "data_type", "name_bk_ind")
      .join(live.select("table_name", "column_name"), Seq("table_name", "column_name"), "left_semi")
      .orderBy("table_name", "ordinal")
  }

  def selectStatic(tableInclude: String, columnInclude: String,
                   tableExclude: String, columnExclude: String,
                   schemaInclude: String = ".*", schemaExclude: String = "^$"): Seq[(String, String, String, Int, String, Int)] =
    Classify.signals
      .filter(g => g.schema.matches(schemaInclude) && g.table.matches(tableInclude) &&
        g.column.name.matches(columnInclude))
      .filterNot(g => g.schema.matches(schemaExclude))
      .filterNot(g => g.table.matches(tableExclude) && g.column.name.matches(columnExclude))
      .map(g => (g.schema, g.table, g.column.name, g.ordinal, g.column.typeName,
        if (g.nameBk) 1 else 0))

  def selectSql(tableInclude: String, columnInclude: String,
                tableExclude: String, columnExclude: String,
                schemaInclude: String = ".*", schemaExclude: String = "^$"): String = {
    val rows = selectStatic(tableInclude, columnInclude, tableExclude, columnExclude,
      schemaInclude, schemaExclude)
      .map { case (sc, t, c, o, dt, bk) => s"('$sc', '$t', '$c', $o, '$dt', $bk)" }
    s"""SELECT * FROM (VALUES
       |  ${rows.mkString(",\n  ")}
       |) AS t(schema_name, table_name, column_name, ordinal, data_type, name_bk_ind)
       |ORDER BY table_name, ordinal""".stripMargin
  }

  /** Multi-format landing-zone catalog: CSV/JSON mirrors introspected with
    * the same catalog row shape as the parquet path. The reference's
    * catalog walks pg_catalog (queries.rs:65-321), which is storage-
    * agnostic — any table in the database is cataloged whatever its
    * storage; graft's equivalent is schema inference through the
    * format-dispatching loader (Tables.loadAs). The mirrors are written
    * from the parquet source into a temp landing dir, introspected, and
    * deleted (schema inference is eager, so nothing lazy survives the
    * cleanup). JSON ordinals follow Spark's alphabetical JSON field
    * order; CSV ordinals follow the header.
    */
  def introspectLanding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_landing_").toString
    try {
      Tables.load(s, dir, "customer").write.mode("overwrite")
        .option("header", "true").csv(s"$tmp/customer_csv")
      Tables.load(s, dir, "nation").write.mode("overwrite").json(s"$tmp/nation_json")
      val mirrors = Seq(
        ("customer_csv", "csv"), ("nation_json", "json"))
      val rows = mirrors.flatMap { case (t, fmt) =>
        Tables.loadAs(s, s"$tmp/$t", fmt).schema.fields.zipWithIndex.map { case (f, i) =>
          ("landing", t, fmt, f.name, i + 1, typeName(f.dataType),
            if (f.name.matches(".*(key|id)$")) 1 else 0)
        }
      }
      rows.toDF("schema_name", "table_name", "format", "column_name", "ordinal",
        "data_type", "name_bk_ind")
        .orderBy("table_name", "ordinal")
    } finally DvLoader.deletePath(java.nio.file.Paths.get(tmp))
  }

  /** Oracle twin of introspectLanding: the expected inference result as
    * constants — CSV narrows integral columns to the smallest fitting type
    * (int) and re-infers doubles; JSON infers integrals as bigint and
    * orders fields alphabetically.
    */
  def landingSql: String = {
    val expected = Seq(
      ("landing", "customer_csv", "csv", "c_custkey", 1, "int", 1),
      ("landing", "customer_csv", "csv", "c_name", 2, "varchar", 0),
      ("landing", "customer_csv", "csv", "c_nationkey", 3, "int", 1),
      ("landing", "customer_csv", "csv", "c_acctbal", 4, "double", 0),
      ("landing", "customer_csv", "csv", "c_mktsegment", 5, "varchar", 0),
      ("landing", "nation_json", "json", "n_name", 1, "varchar", 0),
      ("landing", "nation_json", "json", "n_nationkey", 2, "bigint", 1),
      ("landing", "nation_json", "json", "n_regionkey", 3, "bigint", 1))
    val rows = expected.map { case (sc, t, fmt, c, o, dt, bk) =>
      s"('$sc', '$t', '$fmt', '$c', $o, '$dt', $bk)"
    }
    s"""SELECT * FROM (VALUES
       |  ${rows.mkString(",\n  ")}
       |) AS t(schema_name, table_name, format, column_name, ordinal, data_type, name_bk_ind)
       |ORDER BY table_name, ordinal""".stripMargin
  }

  /** Live introspection of every source table's parquet schema. */
  def introspect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.all.flatMap { t =>
      val schema = Tables.load(s, dir, t).schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        (SourceSchemas.schemaOf(t), t, f.name, i + 1, typeName(f.dataType),
          if (f.name.matches(".*(key|id)$")) 1 else 0)
      }
    }
    rows.toDF("schema_name", "table_name", "column_name", "ordinal", "data_type", "name_bk_ind")
      .orderBy("table_name", "ordinal")
  }
}

/** The DV plan over the source schema: hubs, satellites, links.
  *
  * Derivation is signal-driven (classifier name rules + FK resolution by
  * TPC-H-style prefix stripping); the dependent-child treatment of
  * l_linenumber is a context override, the reference's update_context
  * equivalent (docs/sql_functions/update_context.md).
  */
object DvPlanner {

  /** c_custkey -> custkey (1-2 char prefixes only); doc_id stays doc_id. */
  def fkForm(column: String): String = column.split("_", 2) match {
    case Array(p, rest) if p.length <= 2 => rest
    case _ => column
  }

  /** The table a bk-named column resolves to, if any: its fkForm equals the
    * fkForm of another table's first bk column.
    */
  def resolve(column: String): Option[String] =
    SourceSchemas.tables.collectFirst {
      case (t, cols) if cols.headOption.exists(c => fkForm(c.name) == fkForm(column)) => t
    }

  val hubCustomer = HubSpec("customer", "customer", Seq(Col("c_custkey", "bigint")))
  val hubPart = HubSpec("part", "part", Seq(Col("p_partkey", "bigint")))
  val hubOrder = HubSpec("order", "orders", Seq(Col("o_orderkey", "bigint")))
  /** Composite business key (order key + dependent-child line number). */
  val hubLineitem = HubSpec("lineitem", "lineitem",
    Seq(Col("l_orderkey", "bigint"), Col("l_linenumber", "int")))

  val satCustomer = SatSpec("customer", "customer", "customer",
    bkParts = Seq(Col("c_custkey", "bigint")),
    descriptors = Seq(Col("c_nationkey", "int"), Col("c_mktsegment", "varchar")),
    sensitive = false)

  val satCustomerSensitive = SatSpec("customer_sensitive", "customer", "customer",
    bkParts = Seq(Col("c_custkey", "bigint")),
    descriptors = Seq(Col("c_name", "varchar"), Col("c_acctbal", "double")),
    sensitive = true)

  val linkOrders = LinkSpec("orders", "orders",
    Seq(LinkMember("order", Seq(Col("o_orderkey", "bigint"))),
      LinkMember("customer", Seq(Col("o_custkey", "bigint")))))

  val linkLineitem = LinkSpec("lineitem", "lineitem",
    Seq(LinkMember("order", Seq(Col("l_orderkey", "bigint"))),
      LinkMember("part", Seq(Col("l_partkey", "bigint"))),
      LinkMember("supplier", Seq(Col("l_suppkey", "bigint")))),
    degenerate = Seq(Col("l_linenumber", "int")))

  /** Link satellite: order attributes orbit the order-customer link. */
  val satLinkOrders = SatSpec("orders_link", "orders", "orders",
    bkParts = Seq(Col("o_orderkey", "bigint"), Col("o_custkey", "bigint")),
    descriptors = Seq(Col("o_orderstatus", "varchar"), Col("o_orderpriority", "varchar"),
      Col("o_totalprice", "double")),
    sensitive = false,
    hkColumn = Some("link_orders_hk"))

  val hubs: Seq[HubSpec] = Seq(hubCustomer, hubPart, hubOrder, hubLineitem)
}
