package graft.dv

import graft.functions.GraftFunctions.{canonSql, dvHashSql}

/** ANSI-SQL twin of DvBuild — graft generates loader SQL the way the
  * reference generates Postgres DML (extension/src/controller/dv_loader.rs),
  * but targets the DuckDB dialect used by the correctness oracle.
  */
object DvSqlGen {
  import DvDefaults._

  private def ghostSelect(spec: HubSpec, g: String): String = {
    val parts = spec.bkParts.map(_ => s"'$g'")
    val bkCols = spec.bkParts.map(p => s"'$g' AS ${p.name}_bk").mkString(", ")
    s"SELECT sha256(concat_ws(',', ${parts.mkString(", ")})) AS ${spec.hkName}, " +
      s"'$GhostTs' AS load_ts, '$GhostSource' AS record_source, $bkCols"
  }

  def hubSql(spec: HubSpec, loadTs: String = LoadTs): String = {
    val bkSelect = spec.bkParts.map(p => s"${canonSql(p.name, p.typeName)} AS ${p.name}_bk").mkString(", ")
    val hk = dvHashSql(spec.bkParts.map(p => s"${p.name}_bk"))
    s"""WITH keys AS (SELECT DISTINCT $bkSelect FROM ${spec.sourceTable})
       |${ghostSelect(spec, "-1")}
       |UNION ALL
       |${ghostSelect(spec, "-2")}
       |UNION ALL
       |SELECT $hk AS ${spec.hkName}, '$loadTs' AS load_ts,
       |  '${recordSource(spec.sourceTable)}' AS record_source,
       |  ${spec.bkParts.map(p => s"${p.name}_bk").mkString(", ")}
       |FROM keys
       |ORDER BY ${spec.hkName}""".stripMargin
  }

  /** Oracle twin of DvBuild.hubMultiFrom: the consolidated hub as chained
    * per-source inserts — each later source keeps only keys no earlier
    * source delivered (the reference's per-source WHERE hub_hk IS NULL
    * loads against one hub, dv_loader.rs:166-199). `sources` mirror the
    * Spark side: (table, key parts positionally matching the spec, WHERE).
    */
  def hubMultiSql(spec: HubSpec, sources: Seq[(String, Seq[Col], Option[String])],
                  loadTs: String = LoadTs): String = {
    val srcCtes = sources.zipWithIndex.map { case ((table, parts, where), i) =>
      val sel = parts.zip(spec.bkParts).map { case (p, b) =>
        s"${canonSql(p.name, p.typeName)} AS ${b.name}_bk"
      }.mkString(", ")
      val priorFilter =
        if (i == 0) ""
        else {
          // COALESCE both sides: the Spark twin anti-joins on the hash key,
          // whose inputs dvHash coalesces — a bare NOT IN would evaluate
          // NULL for a NULL key part and silently drop the row. (Multi-part
          // consolidation is planner-restricted to single-part hubs, so the
          // tuple compare matches the hash compare exactly.)
          val bkCols = spec.bkParts.map(p => s"COALESCE(${p.name}_bk, '')")
          val prior = (0 until i).map(j => s"SELECT ${bkCols.mkString(", ")} FROM src$j").mkString(" UNION ALL ")
          s"\n  WHERE (${bkCols.mkString(", ")}) NOT IN (SELECT * FROM ($prior))"
        }
      s"""src$i AS (
         |  SELECT DISTINCT $sel, 'source.$table' AS record_source
         |  FROM (SELECT * FROM $table${where.map(w => s" WHERE $w").getOrElse("")})$priorFilter
         |)""".stripMargin
    }
    val hk = dvHashSql(spec.bkParts.map(p => s"${p.name}_bk"))
    val bkList = spec.bkParts.map(p => s"${p.name}_bk").mkString(", ")
    val union = sources.indices.map(i => s"SELECT * FROM src$i").mkString("\nUNION ALL\n")
    s"""WITH ${srcCtes.mkString(",\n")},
       |all_src AS ($union)
       |${ghostSelect(spec, "-1")}
       |UNION ALL
       |${ghostSelect(spec, "-2")}
       |UNION ALL
       |SELECT $hk AS ${spec.hkName}, '$loadTs' AS load_ts, record_source, $bkList
       |FROM all_src
       |ORDER BY ${spec.hkName}""".stripMargin
  }

  def satSql(spec: SatSpec, loadTs: String = LoadTs): String = {
    val hk = dvHashSql(spec.bkParts.map(p => canonSql(p.name, p.typeName)))
    val hd = dvHashSql(spec.descriptors.map(d => canonSql(d.name, d.typeName)))
    val descNames = spec.descriptors.map(_.name).mkString(", ")
    s"""WITH versions AS (
       |  SELECT DISTINCT $hk AS ${spec.hkName}, $hd AS ${spec.hdName}, $descNames
       |  FROM ${spec.sourceTable})
       |SELECT ${spec.hkName}, '$loadTs' AS load_ts,
       |  '${recordSource(spec.sourceTable)}' AS record_source, ${spec.hdName}, $descNames
       |FROM versions
       |ORDER BY ${spec.hkName}, ${spec.hdName}""".stripMargin
  }

  def linkSql(spec: LinkSpec, loadTs: String = LoadTs): String = {
    val allParts = spec.members.flatMap(_.parts) ++ spec.degenerate
    val bkSelect = allParts.map(p => s"${canonSql(p.name, p.typeName)} AS ${p.name}_bk").mkString(", ")
    val linkHk = dvHashSql(allParts.map(p => s"${p.name}_bk"))
    val memberHks = spec.members.map(m =>
      s"${dvHashSql(m.parts.map(p => s"${p.name}_bk"))} AS hub_${m.hubName}_hk").mkString(",\n  ")
    s"""WITH keys AS (SELECT DISTINCT $bkSelect FROM ${spec.sourceTable})
       |SELECT $linkHk AS ${spec.hkName}, '$loadTs' AS load_ts,
       |  '${recordSource(spec.sourceTable)}' AS record_source,
       |  $memberHks,
       |  ${allParts.map(p => s"${p.name}_bk").mkString(", ")}
       |FROM keys
       |ORDER BY ${spec.hkName}""".stripMargin
  }

  /** Incremental hub demo: "existing" = orders before 1998, batch = all. */
  def hubIncrSql(loadTs: String = LoadTs): String =
    s"""WITH existing AS (
       |  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS o_orderkey_bk
       |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'),
       |batch AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS o_orderkey_bk FROM orders)
       |SELECT ${dvHashSql(Seq("o_orderkey_bk"))} AS hub_order_hk, '$loadTs' AS load_ts,
       |  'source.orders' AS record_source, o_orderkey_bk
       |FROM batch
       |WHERE o_orderkey_bk NOT IN (SELECT o_orderkey_bk FROM existing)
       |ORDER BY hub_order_hk""".stripMargin

  /** Incremental link demo: the link analogue of hubIncrSql — "existing" =
    * customer-order relationships observed before 1998, batch = all; only
    * link hash keys absent from the existing link insert (the reference
    * loads links with the same WHERE hk IS NULL anti-join as hubs,
    * dv_loader.rs:166-199).
    */
  def linkIncrSql(loadTs: String = LoadTs): String = {
    // part order matches the canonical link_orders hk (order, customer)
    val hk = dvHashSql(Seq("o_orderkey_bk", "o_custkey_bk"))
    s"""WITH existing AS (
       |  SELECT DISTINCT $hk AS link_orders_hk
       |  FROM (SELECT CAST(o_custkey AS VARCHAR) AS o_custkey_bk,
       |               CAST(o_orderkey AS VARCHAR) AS o_orderkey_bk
       |        FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01')),
       |batch AS (
       |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS o_custkey_bk,
       |                  CAST(o_orderkey AS VARCHAR) AS o_orderkey_bk
       |  FROM orders)
       |SELECT $hk AS link_orders_hk, '$loadTs' AS load_ts,
       |  'source.orders' AS record_source,
       |  ${dvHashSql(Seq("o_custkey_bk"))} AS hub_customer_hk,
       |  ${dvHashSql(Seq("o_orderkey_bk"))} AS hub_order_hk,
       |  o_custkey_bk, o_orderkey_bk
       |FROM batch
       |WHERE $hk NOT IN (SELECT link_orders_hk FROM existing)
       |ORDER BY link_orders_hk""".stripMargin
  }

  /** Incremental satellite demo: "existing" = (hk, hd) attribute versions
    * observed before the cutoff; batch = all versions; only version pairs
    * first seen after the cutoff load (the reference's sat anti-join on
    * (hk, hd), dv_loader.rs:339-346).
    */
  def satIncrSql(cutoff: String, loadTs: String = LoadTs): String =
    s"""WITH v AS (
       |  SELECT ${dvHashSql(Seq("CAST(user_id AS VARCHAR)"))} AS hub_user_hk,
       |         ${dvHashSql(Seq("props"))} AS sat_user_hd,
       |         CAST(user_id AS VARCHAR) AS user_id_bk, props, epoch_ms(ts) AS tms
       |  FROM events),
       |existing AS (SELECT DISTINCT hub_user_hk, sat_user_hd FROM v WHERE tms < epoch_ms(TIMESTAMP '$cutoff')),
       |batch AS (SELECT DISTINCT hub_user_hk, sat_user_hd, user_id_bk, props FROM v)
       |SELECT b.hub_user_hk, '$loadTs' AS load_ts, 'source.events' AS record_source,
       |       b.sat_user_hd, b.user_id_bk, b.props
       |FROM batch b
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM existing e
       |  WHERE e.hub_user_hk = b.hub_user_hk AND e.sat_user_hd = b.sat_user_hd)
       |ORDER BY hub_user_hk, sat_user_hd""".stripMargin

  def scd2EventsSql: String =
    s"""WITH versions AS (
       |  SELECT user_id, props, min(epoch_ms(ts)) AS first_seen_ms, count(*) AS n_obs
       |  FROM events GROUP BY user_id, props)
       |SELECT ${dvHashSql(Seq("CAST(user_id AS VARCHAR)"))} AS hub_user_hk,
       |  CAST(user_id AS VARCHAR) AS user_id_bk,
       |  ${dvHashSql(Seq("props"))} AS sat_user_hd,
       |  props, first_seen_ms, n_obs
       |FROM versions
       |ORDER BY hub_user_hk, sat_user_hd""".stripMargin

  def pitSql: String = {
    val dates = DvBuild.PitDates.map(d => s"('$d')").mkString(", ")
    s"""WITH dates(asof_date) AS (VALUES $dates),
       |e AS (SELECT user_id, event_id, props, epoch_ms(ts) AS tms FROM events),
       |ranked AS (
       |  SELECT d.asof_date, e.user_id, e.props, e.tms,
       |         row_number() OVER (PARTITION BY e.user_id, d.asof_date
       |                            ORDER BY e.tms DESC, e.event_id DESC) AS rk
       |  FROM e JOIN dates d ON e.tms <= epoch_ms(CAST(d.asof_date AS TIMESTAMP)))
       |SELECT asof_date,
       |  ${dvHashSql(Seq("CAST(user_id AS VARCHAR)"))} AS hub_user_hk,
       |  user_id,
       |  ${dvHashSql(Seq("props"))} AS sat_user_hd,
       |  tms AS version_ms
       |FROM ranked WHERE rk = 1
       |ORDER BY asof_date, user_id""".stripMargin
  }

  /** Oracle twin of DvBuild.pitBitemporal — same synthetic md5 arrival
    * lag, same end-of-day cutoffs, row_number in place of max(struct).
    */
  def pitBitemporalSql: String = {
    val cells = DvBuild.BiPitGrid.map { case (v, t) => s"('$v', '$t')" }.mkString(", ")
    val lag = graft.functions.GraftFunctions.md5Long64Sql("'lag_' || CAST(event_id AS VARCHAR)")
    s"""WITH grid(asof_date, knowledge_date) AS (VALUES $cells),
       |e AS (
       |  SELECT user_id, event_id, props, epoch_ms(ts) AS tms,
       |    (epoch_ms(ts) // 86400000 + 1 + ($lag % 3)) * 86400000 AS arrival_ms
       |  FROM events),
       |j AS (
       |  SELECT g.asof_date, g.knowledge_date, e.user_id, e.props, e.tms, e.event_id
       |  FROM e JOIN grid g
       |    ON e.tms <= epoch_ms(CAST(g.asof_date AS TIMESTAMP)) + 86399999
       |   AND e.arrival_ms <= epoch_ms(CAST(g.knowledge_date AS TIMESTAMP)) + 86399999),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY user_id, asof_date, knowledge_date
       |                       ORDER BY tms DESC, event_id DESC) AS rk,
       |    CAST(count(*) OVER (PARTITION BY user_id, asof_date, knowledge_date) AS BIGINT) AS n_known
       |  FROM j)
       |SELECT asof_date, knowledge_date,
       |  ${dvHashSql(Seq("CAST(user_id AS VARCHAR)"))} AS hub_user_hk,
       |  user_id,
       |  ${dvHashSql(Seq("props"))} AS sat_user_hd,
       |  tms AS version_ms, n_known
       |FROM ranked WHERE rk = 1
       |ORDER BY asof_date, knowledge_date, user_id""".stripMargin
  }

  def currentViewSql: String =
    s"""WITH ranked AS (
       |  SELECT user_id, props, epoch_ms(ts) AS tms, event_id,
       |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rk
       |  FROM events)
       |SELECT ${dvHashSql(Seq("CAST(user_id AS VARCHAR)"))} AS hub_user_hk,
       |  user_id, props AS current_props, tms AS version_ms
       |FROM ranked WHERE rk = 1
       |ORDER BY user_id""".stripMargin

  def ghostsSql(specs: Seq[HubSpec]): String =
    specs.map { spec =>
      Seq("-1", "-2").map { g =>
        val parts = spec.bkParts.map(_ => s"'$g'")
        s"SELECT '${spec.name}' AS hub_name, sha256(concat_ws(',', ${parts.mkString(", ")})) AS hk, " +
          s"'$GhostTs' AS load_ts, '$GhostSource' AS record_source, '$g' AS ghost_bk"
      }.mkString("\nUNION ALL\n")
    }.mkString("\nUNION ALL\n") + "\nORDER BY hub_name, ghost_bk DESC"

  /** Warehouse health: row counts, key cardinality, referential checks. */
  def healthSql: String =
    s"""SELECT 'hub_customer' AS object, 'row_count' AS metric,
       |       CAST(count(DISTINCT c_custkey) + 2 AS BIGINT) AS value FROM customer
       |UNION ALL
       |SELECT 'sat_customer', 'row_count', CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer
       |UNION ALL
       |SELECT 'sat_customer', 'orphan_hk', CAST(0 AS BIGINT)
       |UNION ALL
       |SELECT 'link_orders', 'row_count',
       |       CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT o_orderkey, o_custkey FROM orders) t
       |UNION ALL
       |SELECT 'link_orders', 'dangling_customer_hk', CAST(count(*) AS BIGINT) FROM (
       |  SELECT DISTINCT o_custkey FROM orders
       |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) t
       |ORDER BY object, metric""".stripMargin

  /** hash() parity probe (reference lib.rs:153). */
  def hashSql: String =
    s"""SELECT CAST(c_custkey AS VARCHAR) AS key_text,
       |  sha256(CAST(c_custkey AS VARCHAR)) AS hash_single,
       |  ${dvHashSql(Seq("CAST(c_custkey AS VARCHAR)", "c_mktsegment"))} AS hash_multi,
       |  ${graft.functions.GraftFunctions.md5Long64Sql("CAST(c_custkey AS VARCHAR)")} AS hash64
       |FROM customer
       |ORDER BY CAST(c_custkey AS BIGINT)
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  // DDL generation — the reference's build_sql_from_business_key
  // (controller/dv_builder.rs:378-448) emits CREATE TABLE statements for
  // hubs and satellites; graft mirrors the column layout in ANSI DDL.
  private def sqlType(t: String): String = t match {
    case "bigint"    => "BIGINT"
    case "int"       => "INTEGER"
    case "double"    => "DOUBLE"
    case "varchar"   => "VARCHAR"
    case "timestamp" => "TIMESTAMP"
    case other       => other.toUpperCase
  }

  def hubDdl(spec: HubSpec): String = {
    val bks = spec.bkParts.map(p => s"  ${p.name}_bk VARCHAR").mkString(",\n")
    s"""CREATE TABLE hub_${spec.name} (
       |  ${spec.hkName} VARCHAR NOT NULL,
       |  load_ts TIMESTAMP NOT NULL,
       |  record_source VARCHAR NOT NULL,
       |$bks
       |);""".stripMargin
  }

  def satDdl(spec: SatSpec): String = {
    val descs = spec.descriptors.map(d => s"  ${d.name} ${sqlType(d.typeName)}").mkString(",\n")
    s"""CREATE TABLE sat_${spec.name} (
       |  ${spec.hkName} VARCHAR NOT NULL,
       |  load_ts TIMESTAMP NOT NULL,
       |  record_source VARCHAR NOT NULL,
       |  ${spec.hdName} VARCHAR NOT NULL,
       |$descs
       |);""".stripMargin
  }

  def linkDdl(spec: LinkSpec): String = {
    val members = spec.members.map(m => s"  hub_${m.hubName}_hk VARCHAR NOT NULL").mkString(",\n")
    val parts = (spec.members.flatMap(_.parts) ++ spec.degenerate)
      .map(p => s"  ${p.name}_bk VARCHAR").mkString(",\n")
    s"""CREATE TABLE link_${spec.name} (
       |  ${spec.hkName} VARCHAR NOT NULL,
       |  load_ts TIMESTAMP NOT NULL,
       |  record_source VARCHAR NOT NULL,
       |$members,
       |$parts
       |);""".stripMargin
  }

  /** CREATE TABLE DDL for a vault plan, optionally scoped to the objects a
    * build actually materializes (go() passes its include filter so the
    * registered dv_schema.sql never advertises unbuilt objects).
    */
  def allDdl(plan: DvPlan, include: String => Boolean = _ => true): String =
    (plan.hubs.map(_.spec).filter(h => include(s"hub_${h.name}")).map(hubDdl) ++
      plan.sats.filter(t => include(s"sat_${t.name}")).map(satDdl) ++
      plan.links.filter(l => include(s"link_${l.name}")).map(linkDdl)).mkString("\n\n")

  /** Source catalog oracle: constants from the static schema registry. */
  def catalogSql: String = {
    val rows = Classify.signals.map { g =>
      s"('${g.schema}', '${g.table}', '${g.column.name}', ${g.ordinal}, " +
        s"'${g.column.typeName}', ${if (g.nameBk) 1 else 0})"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows
       |) AS t(schema_name, table_name, column_name, ordinal, data_type, name_bk_ind)
       |ORDER BY table_name, ordinal""".stripMargin
  }
}
