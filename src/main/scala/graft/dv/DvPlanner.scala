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
    } finally DvLoader.deletePathQuietly(java.nio.file.Paths.get(tmp), "landing mirror")
  }

  /** Oracle twin of introspectLanding: the expected inference result —
    * CSV narrows integral columns to the smallest fitting type and
    * re-infers doubles; JSON infers integrals as bigint and orders fields
    * alphabetically. The integral-narrowing expectation is DOMAIN-AWARE,
    * not a constant (the r7 sf1 lesson): Spark's CSV sniffer picks int
    * only while every value fits int32, so a key column that grows past
    * 2^31 at a bigger SF legitimately infers bigint — the oracle predicts
    * the narrowing from the data itself.
    */
  def landingSql: String = {
    def intOrBigint(c: String) =
      s"(SELECT CASE WHEN max($c) < 2147483648 THEN 'int' ELSE 'bigint' END FROM customer)"
    // data_type column carries a SQL EXPRESSION (literal or subquery)
    val expected = Seq(
      ("landing", "customer_csv", "csv", "c_custkey", 1, intOrBigint("c_custkey"), 1),
      ("landing", "customer_csv", "csv", "c_name", 2, "'varchar'", 0),
      ("landing", "customer_csv", "csv", "c_nationkey", 3, intOrBigint("c_nationkey"), 1),
      ("landing", "customer_csv", "csv", "c_acctbal", 4, "'double'", 0),
      ("landing", "customer_csv", "csv", "c_mktsegment", 5, "'varchar'", 0),
      ("landing", "nation_json", "json", "n_name", 1, "'varchar'", 0),
      ("landing", "nation_json", "json", "n_nationkey", 2, "'bigint'", 1),
      ("landing", "nation_json", "json", "n_regionkey", 3, "'bigint'", 1))
    val rows = expected.map { case (sc, t, fmt, c, o, dt, bk) =>
      s"('$sc', '$t', '$fmt', '$c', $o, $dt, $bk)"
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

  // ------------------------------------------------------------------
  // Plan derivation from the classified catalog — the reference's
  // dv_builder.rs:19-201 (accepted transformer responses → BusinessKey
  // tree → DDL/DML for ANY source table), re-expressed deterministically.
  // ------------------------------------------------------------------

  /** Singular entity form of a table name ("orders" → "order") — the
    * deterministic stand-in for the naming judgment the reference's BKName
    * model pass applies ("avoid unnecessary suffixes", prompt_template
    * .rs:202).
    */
  def singular(name: String): String =
    if (name.length > 3 && name.endsWith("s") && !name.endsWith("ss")) name.dropRight(1)
    else name

  /** Business-key name for a key column — the deterministic twin of the
    * reference's BusinessKeyName transformer pass
    * (bgw_transformer_client.rs:117-164 + prompt_template.rs:193-263):
    * prefer the attribute stem ("o_custkey" → "cust"), resolve it against
    * the cataloged table names ("cust" → customer → "customer") so the
    * same key carried by two tables gets ONE name and consolidates into
    * one hub; a stem no table claims names itself ("user_id" → "user");
    * a fully generic attribute ("id") falls back to the table name —
    * exactly the prompt's stated preference order.
    */
  def bkName(column: String, table: String, catalogTables: Seq[String]): String = {
    val stem = fkForm(column).replaceAll("_?(key|id)$", "")
    if (stem.isEmpty) singular(table)
    else catalogTables.sorted.find(_.startsWith(stem)).map(singular).getOrElse(stem)
  }

  /** One classified catalog row as the planner consumes it (bounded
    * metadata — one row per source COLUMN, the reference's
    * transformer_responses join, model/queries.rs:325-372).
    */
  final case class ClassifiedCol(table: String, column: String, ordinal: Int,
                                 dataType: String, category: String,
                                 confidence: Option[Double], overridden: Boolean,
                                 uniqueness: Double) {
    def col: Col = Col(column, dataType)
  }

  /** Derive the full vault plan from classified columns (pure function —
    * `planFromClassification` feeds it the live classifier output).
    *
    * Rules (each mapped to its reference analogue):
    *  - Only tables whose every column is accepted at `threshold` deploy
    *    (the table-level RTD/SKIP gate, model/queries.rs:441-532).
    *  - A business-key part's HOME is the catalog table where that key
    *    form is the first column and near-unique (the identity it
    *    resolves to). Parts homed here are the table's own identity;
    *    parts homed elsewhere are foreign keys; unresolved parts are
    *    either user-context dependent children (update_context made them
    *    key parts) or standalone entities (e.g. `user_id` — a hub with no
    *    home table, loaded from its carrying tables).
    *  - Hubs: own parts (+ dependent children) form `hub_<bk_name>`; a
    *    composite key names the hub after the table (the BKName prompt's
    *    table-name fallback). A dependent child without own identity
    *    borrows the first relationship part as its parent key (the DV
    *    dependent-child pattern: a line exists only within its order).
    *  - Consolidation: hubs group by bk_name; every relationship part
    *    naming an in-plan hub adds its table as a load source
    *    (dv_builder.rs:130-148 — one BusinessKey per name; the loader
    *    inserts from each carrier with its own record_source).
    *  - Links: a table with ≥2 foreign keys IS a relationship — all its
    *    foreign keys are members (even ones whose hub deploys later: the
    *    reference's 'Awaiting Link Implementation' status anticipates
    *    exactly that), dependent children ride as degenerate columns. A
    *    single foreign key links the table's own hub to its target only
    *    when the target deploys in this build; otherwise the lone key is
    *    DEMOTED to a descriptive attribute (a reference to an entity
    *    outside the warehouse is context, not a modelable relationship).
    *  - Satellites: accepted descriptors (+ demoted keys) in ordinal
    *    order, sensitive ones split into `sat_<table>_sensitive`
    *    (dv_builder.rs:403-439), orbiting the table's own hub — or the
    *    table's link when it has no hub of its own.
    */
  def planFrom(allCols: Seq[ClassifiedCol], scope: Seq[String],
               threshold: Double = Classify.Threshold): DvPlan = {
    import Classify.{CatBk, CatDesc, CatSens}
    def accepted(c: ClassifiedCol): Boolean = c.confidence.exists(_ >= threshold)
    val byTable = allCols.groupBy(_.table)
    val catalogTables = allCols.map(_.table).distinct.sorted
    val homes: Map[String, String] = allCols
      .filter(c => c.ordinal == 1 && c.category == CatBk && accepted(c) && c.uniqueness >= 0.999)
      .groupBy(c => fkForm(c.column))
      .map { case (form, cs) => form -> cs.map(_.table).min }
    def name(c: ClassifiedCol): String = bkName(c.column, c.table, catalogTables)

    val rtd = scope.filter(t => byTable.get(t).exists(cs => cs.nonEmpty && cs.forall(accepted)))

    final case class TablePlan(ownHub: Option[(String, Seq[ClassifiedCol])],
                               standalone: Seq[ClassifiedCol],
                               rel: Seq[ClassifiedCol],
                               link: Option[LinkSpec],
                               sats: Seq[SatSpec])

    val perTable: Seq[(String, TablePlan)] = rtd.map { t =>
      val rows = byTable(t).sortBy(_.ordinal)
      val bk = rows.filter(_.category == CatBk)
      val own = bk.filter(c => homes.get(fkForm(c.column)).contains(t))
      val fk = bk.filter(c => homes.get(fkForm(c.column)).exists(_ != t))
      val unresolved = bk.filter(c => !homes.contains(fkForm(c.column)))
      val dep = unresolved.filter(_.overridden)
      val standalone = unresolved.filterNot(_.overridden)
      val fkInScope = fk.filter(c => rtd.contains(homes(fkForm(c.column))))
      val rel = if (fk.size >= 2) fk else fkInScope
      val demoted = fk.filterNot(rel.contains)

      val ownHub: Option[(String, Seq[ClassifiedCol])] =
        if (own.nonEmpty) {
          val parts = (own ++ dep).sortBy(_.ordinal)
          Some((if (parts.size > 1) singular(t) else name(parts.head), parts))
        } else if (dep.nonEmpty && rel.nonEmpty) {
          Some((singular(t), (rel.head +: dep).sortBy(_.ordinal)))
        } else None

      val link: Option[LinkSpec] =
        if (rel.size >= 2) {
          val members = (if (own.nonEmpty) ownHub.map { case (n, ps) =>
            LinkMember(n, ps.map(_.col)) }.toSeq else Nil) ++
            rel.map(c => LinkMember(name(c), Seq(c.col)))
          Some(LinkSpec(t, t, members, degenerate = dep.map(_.col)))
        } else {
          val others = rel ++ standalone
          if (others.nonEmpty && own.nonEmpty)
            Some(LinkSpec(t, t,
              ownHub.map { case (n, ps) => LinkMember(n, ps.map(_.col)) }.toSeq ++
                others.map(c => LinkMember(name(c), Seq(c.col)))))
          else None
        }

      val desc = (rows.filter(c => c.category == CatDesc || c.category == CatSens) ++ demoted)
        .sortBy(_.ordinal)
      def satOf(cs: Seq[ClassifiedCol], sensitive: Boolean): Option[SatSpec] =
        if (cs.isEmpty) None
        else ownHub.map { case (hubName, parts) =>
          SatSpec(if (sensitive) s"${t}_sensitive" else t, t, hubName,
            parts.map(_.col), cs.map(_.col), sensitive)
        }.orElse(link.map { l =>
          SatSpec(if (sensitive) s"${t}_sensitive" else t, t, l.name,
            l.members.flatMap(_.parts) ++ l.degenerate, cs.map(_.col), sensitive,
            hkColumn = Some(l.hkName))
        })
      val sats = satOf(desc.filter(_.category != CatSens), sensitive = false).toSeq ++
        satOf(desc.filter(_.category == CatSens), sensitive = true).toSeq

      t -> TablePlan(ownHub, standalone, rel, link, sats)
    }

    // Hub consolidation by bk_name: home hubs first (their column names
    // define the hub's _bk columns), then standalone carriers, then every
    // relationship part naming the hub adds its table as a load source.
    final case class HubAcc(spec: HubSpec, sources: Seq[HubSource])
    val ordered = scala.collection.mutable.LinkedHashMap.empty[String, HubAcc]
    perTable.foreach { case (t, tp) =>
      tp.ownHub.foreach { case (n, parts) =>
        val src = HubSource(t, parts.map(_.col))
        ordered.get(n) match {
          case None => ordered(n) = HubAcc(HubSpec(n, t, parts.map(_.col)), Seq(src))
          case Some(acc) => ordered(n) = acc.copy(sources = acc.sources :+ src)
        }
      }
    }
    perTable.foreach { case (t, tp) =>
      tp.standalone.foreach { c =>
        val n = name(c)
        val src = HubSource(t, Seq(c.col))
        ordered.get(n) match {
          case None => ordered(n) = HubAcc(HubSpec(n, t, Seq(c.col)), Seq(src))
          case Some(acc) if acc.spec.bkParts.size == 1 =>
            ordered(n) = acc.copy(sources = acc.sources :+ src)
          case Some(_) => () // positional mismatch — cannot feed a composite hub
        }
      }
    }
    perTable.foreach { case (t, tp) =>
      tp.rel.foreach { c =>
        val n = name(c)
        ordered.get(n).foreach { acc =>
          if (acc.spec.bkParts.size == 1 && !acc.sources.exists(_.table == t))
            ordered(n) = acc.copy(sources = acc.sources :+ HubSource(t, Seq(c.col)))
        }
      }
    }

    DvPlan(
      hubs = ordered.values.map(a => DerivedHub(a.spec, a.sources)).toSeq,
      sats = perTable.flatMap(_._2.sats),
      links = perTable.flatMap(_._2.link))
  }

  /** Derive the plan from the LIVE classifier output — collect is bounded
    * by the catalog's column count (metadata, not data; the same scale as
    * the reference's transformer_responses table).
    */
  def planFromClassification(s: SparkSession, dir: String, scope: Seq[String],
                             overrides: Classify.Overrides = Map.empty,
                             threshold: Double = Classify.Threshold,
                             classifier: Classifier = RulesClassifier,
                             typeOverride: Map[(String, String), String] = Map.empty): DvPlan = {
    // typeOverride patches the profile's catalog types (and the
    // type-derived signals) before classification — how the planner
    // re-derives under a drifted-catalog world (Replan.replanDrift) without
    // the testdata itself changing underneath the test.
    val profile0 = Classify.catalogProfile(s, dir, overrides)
    val profile = if (typeOverride.isEmpty) profile0 else {
      import s.implicits._
      val tov = typeOverride.toSeq.map { case ((t, c), ty) => (t, c, ty) }
        .toDF("table_name", "column_name", "new_type")
      profile0.join(broadcast(tov), Seq("table_name", "column_name"), "left")
        .withColumn("data_type", coalesce(col("new_type"), col("data_type")))
        .drop("new_type")
        .withColumn("complex_t", !col("data_type").isin(SourceSchemas.atomicTypes.toSeq: _*))
        .withColumn("uniq_ok_type", col("data_type").isin("bigint", "int", "varchar"))
    }
    val classified = classifier.respond(profile)
      .select(col("table_name"), col("column_name"), col("ordinal"), col("data_type"),
        col("category"), col("confidence"), col("ov_category").isNotNull.as("overridden"),
        (col("n_distinct").cast("double") / col("n_rows")).as("uniqueness"))
    val rows = classified.collect().toSeq.map { r =>
      ClassifiedCol(
        r.getAs[String]("table_name"), r.getAs[String]("column_name"),
        r.getAs[Int]("ordinal"), r.getAs[String]("data_type"),
        r.getAs[String]("category"),
        Option(r.getAs[java.lang.Double]("confidence")).map(_.doubleValue),
        r.getAs[Boolean]("overridden"),
        Option(r.getAs[java.lang.Double]("uniqueness")).map(_.doubleValue).getOrElse(0.0))
    }
    planFrom(rows, scope, threshold)
  }

  /** The dependent-child user context go() derives with: l_linenumber has
    * no identity outside its parent order — update_context makes it a key
    * part (the reference's update_context walkthrough,
    * docs/sql_functions/update_context.md), and the planner's
    * dependent-child rule folds it into the composite lineitem hub.
    */
  val goContext: Classify.Overrides = Map(
    ("lineitem", "l_linenumber") -> ((Classify.CatBk, 0.85,
      "User context: dependent-child line number - identifies a line only with its parent order key.")))

  /** The demo build scope (the reference Act's included tables). */
  val GoScope: Seq[String] = Seq("customer", "part", "orders", "lineitem")

  /** Every cataloged table — the widest derivation scope. */
  val FullScope: Seq[String] = SourceSchemas.tables.map(_._1)

  /** Render a plan as one metadata row per vault object — the queryable
    * "what would go() build" face of the derivation (the reference's
    * dv_repo schema made human-readable). keys/attrs are '+'-joined so the
    * row shape stays flat and hashable.
    */
  def renderPlan(plan: DvPlan): Seq[(String, String, String, String, String)] = {
    val hubRows = plan.hubs.map(h => ("hub", h.spec.name, h.spec.sourceTable,
      h.spec.bkParts.map(_.name).mkString("+"), h.sources.map(_.table).mkString("+")))
    val satRows = plan.sats.map(t => ("sat", t.name, t.sourceTable,
      t.hkName, t.descriptors.map(_.name).mkString("+")))
    val linkRows = plan.links.map(l => ("link", l.name, l.sourceTable,
      l.members.map(m => s"${m.hubName}:${m.parts.map(_.name).mkString("+")}").mkString("+"),
      l.degenerate.map(_.name).mkString("+")))
    hubRows ++ satRows ++ linkRows
  }

  /** The expected full-catalog derivation — the static oracle twin of
    * `planFromClassification(FullScope)`: 11 hubs (every entity incl. the
    * homeless `user` and `vec` keys), 11 satellites, 6 links. With the
    * whole catalog deploying, keys that were demoted at GoScope become
    * links (customer↔nation, supplier↔nation, nation↔region). DeriveSpec
    * pins live derivation == this table; the dv_plan_catalog oracle hashes
    * it.
    */
  val expectedCatalogPlan: Seq[(String, String, String, String, String)] = Seq(
    ("hub", "region", "region", "r_regionkey", "region+nation"),
    ("hub", "nation", "nation", "n_nationkey", "nation+customer+supplier"),
    ("hub", "customer", "customer", "c_custkey", "customer+orders"),
    ("hub", "supplier", "supplier", "s_suppkey", "supplier+lineitem"),
    ("hub", "part", "part", "p_partkey", "part+lineitem"),
    ("hub", "order", "orders", "o_orderkey", "orders+lineitem"),
    ("hub", "lineitem", "lineitem", "l_orderkey+l_linenumber", "lineitem"),
    ("hub", "event", "events", "event_id", "events"),
    ("hub", "user", "events", "user_id", "events"),
    ("hub", "document", "documents", "doc_id", "documents"),
    ("hub", "vec", "embeddings", "vec_id", "embeddings"),
    ("sat", "region", "region", "hub_region_hk", "r_name"),
    ("sat", "nation", "nation", "hub_nation_hk", "n_name"),
    ("sat", "customer", "customer", "hub_customer_hk", "c_mktsegment"),
    ("sat", "customer_sensitive", "customer", "hub_customer_hk", "c_name+c_acctbal"),
    ("sat", "supplier_sensitive", "supplier", "hub_supplier_hk", "s_name+s_acctbal"),
    ("sat", "part", "part", "hub_part_hk", "p_name+p_brand+p_type+p_size+p_retailprice"),
    ("sat", "orders", "orders", "hub_order_hk", "o_orderstatus+o_totalprice+o_orderdate+o_orderpriority"),
    ("sat", "lineitem", "lineitem", "hub_lineitem_hk",
      "l_quantity+l_extendedprice+l_discount+l_tax+l_returnflag+l_linestatus+l_shipdate"),
    ("sat", "events", "events", "hub_event_hk", "ts+event_type+value+props"),
    ("sat", "documents", "documents", "hub_document_hk", "text+lang+source+n_chars"),
    ("sat", "embeddings", "embeddings", "hub_vec_hk", "embedding+label"),
    ("link", "nation", "nation", "nation:n_nationkey+region:n_regionkey", ""),
    ("link", "customer", "customer", "customer:c_custkey+nation:c_nationkey", ""),
    ("link", "supplier", "supplier", "supplier:s_suppkey+nation:s_nationkey", ""),
    ("link", "orders", "orders", "order:o_orderkey+customer:o_custkey", ""),
    ("link", "lineitem", "lineitem", "order:l_orderkey+part:l_partkey+supplier:l_suppkey", "l_linenumber"),
    ("link", "events", "events", "event:event_id+user:user_id", ""))

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

  // Oracle-expectation constants for the derived plan's remaining
  // satellites — the production path DERIVES these from classification
  // (planFromClassification); the constants exist so the DuckDB oracle can
  // be generated without a live session, and DeriveSpec pins that the
  // derivation reproduces them exactly.
  val satPart = SatSpec("part", "part", "part",
    bkParts = Seq(Col("p_partkey", "bigint")),
    descriptors = Seq(Col("p_name", "varchar"), Col("p_brand", "varchar"),
      Col("p_type", "varchar"), Col("p_size", "int"), Col("p_retailprice", "double")),
    sensitive = false)

  val satOrders = SatSpec("orders", "orders", "order",
    bkParts = Seq(Col("o_orderkey", "bigint")),
    descriptors = Seq(Col("o_orderstatus", "varchar"), Col("o_totalprice", "double"),
      Col("o_orderdate", "timestamp"), Col("o_orderpriority", "varchar")),
    sensitive = false)

  val satLineitem = SatSpec("lineitem", "lineitem", "lineitem",
    bkParts = Seq(Col("l_orderkey", "bigint"), Col("l_linenumber", "int")),
    descriptors = Seq(Col("l_quantity", "double"), Col("l_extendedprice", "double"),
      Col("l_discount", "double"), Col("l_tax", "double"), Col("l_returnflag", "varchar"),
      Col("l_linestatus", "varchar"), Col("l_shipdate", "timestamp")),
    sensitive = false)

  /** Link satellite: order attributes orbit the order-customer link. */
  val satLinkOrders = SatSpec("orders_link", "orders", "orders",
    bkParts = Seq(Col("o_orderkey", "bigint"), Col("o_custkey", "bigint")),
    descriptors = Seq(Col("o_orderstatus", "varchar"), Col("o_orderpriority", "varchar"),
      Col("o_totalprice", "double")),
    sensitive = false,
    hkColumn = Some("link_orders_hk"))

  val hubs: Seq[HubSpec] = Seq(hubCustomer, hubPart, hubOrder, hubLineitem)

  /** The hand-written specs above as a DvPlan (single-source hubs) — the
    * PARITY REFERENCE the derived plan is checked against (dv_go_derived),
    * and the seed plan for repo demos that build literal objects directly.
    * The production path is planFromClassification.
    */
  val literalPlan: DvPlan = DvPlan(
    hubs = hubs.map(h => DerivedHub(h, Seq(HubSource(h.sourceTable, h.bkParts)))),
    sats = Seq(satCustomer, satCustomerSensitive),
    links = Seq(linkOrders, linkLineitem))
}
