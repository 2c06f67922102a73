package graft

import graft.dv._
import graft.dv.DvPlanner._

/** Plan derivation from classification (the reference's dv_builder.rs:19-201
  * pipeline: accepted transformer responses → BusinessKey tree → vault).
  * Pins (1) the derived plan reproduces every hand-written spec, (2) tables
  * the planner has never been told about get a vault with NO code change,
  * (3) the deterministic bk-name pass consolidates shared keys.
  */
class DeriveSpec extends SparkSpec {

  private lazy val plan = DvPlanner.planFromClassification(spark, sfDir, GoScope, goContext)

  test("bk naming: attribute stem resolved against the catalog, table-name fallback") {
    val tables = SourceSchemas.tables.map(_._1)
    assert(bkName("c_custkey", "customer", tables) == "customer")
    assert(bkName("o_custkey", "orders", tables) == "customer") // consolidates with c_custkey
    assert(bkName("o_orderkey", "orders", tables) == "order")
    assert(bkName("l_suppkey", "lineitem", tables) == "supplier")
    assert(bkName("event_id", "events", tables) == "event")
    assert(bkName("user_id", "events", tables) == "user") // no home table: stem names itself
    assert(bkName("doc_id", "documents", tables) == "document")
    assert(bkName("id", "orders", tables) == "order") // generic attribute: table-name fallback
  }

  test("derived plan reproduces the hand-written hub/sat/link specs exactly") {
    assert(plan.hubs.map(_.spec) == DvPlanner.hubs)
    // consolidation: every carrier of a hub's business key is a load source,
    // home table first
    val sources = plan.hubs.map(h => h.spec.name -> h.sources).toMap
    assert(sources("customer") ==
      Seq(HubSource("customer", Seq(Col("c_custkey", "bigint"))),
        HubSource("orders", Seq(Col("o_custkey", "bigint")))))
    assert(sources("order") ==
      Seq(HubSource("orders", Seq(Col("o_orderkey", "bigint"))),
        HubSource("lineitem", Seq(Col("l_orderkey", "bigint")))))
    assert(sources("part") ==
      Seq(HubSource("part", Seq(Col("p_partkey", "bigint"))),
        HubSource("lineitem", Seq(Col("l_partkey", "bigint")))))
    assert(sources("lineitem") ==
      Seq(HubSource("lineitem", Seq(Col("l_orderkey", "bigint"), Col("l_linenumber", "int")))))
    assert(plan.sats == Seq(satCustomer, satCustomerSensitive, satPart, satOrders, satLineitem))
    assert(plan.links == Seq(linkOrders, linkLineitem))
  }

  test("a lone foreign key to an out-of-build entity demotes to a satellite attribute") {
    // c_nationkey is a BK part by classification, but nation is not in the
    // build scope and customer has no second FK — it lands in sat_customer
    val satCust = plan.sats.find(_.name == "customer").get
    assert(satCust.descriptors.map(_.name) == Seq("c_nationkey", "c_mktsegment"))
    assert(!plan.links.exists(_.sourceTable == "customer"))
  }

  test("an unlisted table gets a vault with no code change: events") {
    val p = DvPlanner.planFromClassification(spark, sfDir, Seq("events"))
    assert(p.hubs.map(_.spec.name) == Seq("event", "user"))
    assert(p.hubs.head.spec.bkParts == Seq(Col("event_id", "bigint")))
    // user_id has no home table anywhere in the catalog: a standalone hub
    // loaded from its carrying table (the consolidation shape)
    assert(p.hubs(1).sources == Seq(HubSource("events", Seq(Col("user_id", "bigint")))))
    val sat = p.sats.find(_.name == "events").get
    assert(sat.hubName == "event")
    assert(sat.descriptors.map(_.name) == Seq("ts", "event_type", "value", "props"))
    assert(p.links.map(l => (l.name, l.members.map(_.hubName))) ==
      Seq(("events", Seq("event", "user"))))
  }

  test("an unlisted table gets a vault with no code change: supplier") {
    val p = DvPlanner.planFromClassification(spark, sfDir, Seq("supplier"))
    assert(p.hubs.map(_.spec.name) == Seq("supplier"))
    assert(p.hubs.head.spec.bkParts == Seq(Col("s_suppkey", "bigint")))
    // s_nationkey: lone FK, nation not deploying -> demoted descriptor;
    // the PII-flagged columns split into the sensitive satellite
    assert(p.sats.map(t => (t.name, t.descriptors.map(_.name))) == Seq(
      ("supplier", Seq("s_nationkey")),
      ("supplier_sensitive", Seq("s_name", "s_acctbal"))))
    assert(p.links.isEmpty)
  }

  test("tables with unaccepted columns are excluded (the RTD gate)") {
    // documents.text classifies below threshold without user context
    val p = DvPlanner.planFromClassification(spark, sfDir, Seq("documents"))
    assert(p.hubs.isEmpty && p.sats.isEmpty && p.links.isEmpty)
    // with the demo context the same table deploys
    val withCtx = DvPlanner.planFromClassification(spark, sfDir, Seq("documents"),
      Classify.demoContext)
    assert(withCtx.hubs.map(_.spec.name) == Seq("document"))
    assert(withCtx.sats.map(_.name) == Seq("documents"))
  }

  test("full-catalog derivation: 28 objects, scope-sensitive links, no specs") {
    val p = DvPlanner.planFromClassification(spark, sfDir, DvPlanner.FullScope,
      Classify.demoContext ++ goContext)
    val rendered = DvPlanner.renderPlan(p)
    // exact equality against the static expectation the oracle hashes;
    // compare as sorted sets so a failure names the differing rows
    assert(rendered.sorted == DvPlanner.expectedCatalogPlan.sorted,
      (rendered.toSet -- DvPlanner.expectedCatalogPlan.toSet).toSeq.sorted.mkString("\nextra: ", "\nextra: ", "") +
        (DvPlanner.expectedCatalogPlan.toSet -- rendered.toSet).toSeq.sorted.mkString("\nmissing: ", "\nmissing: ", ""))
    // the scope-sensitivity headline: keys demoted at GoScope become links
    // once their target entity deploys
    assert(p.links.exists(l => l.name == "customer" &&
      l.members.map(_.hubName) == Seq("customer", "nation")))
    assert(p.sats.find(_.name == "customer").get.descriptors.map(_.name) == Seq("c_mktsegment"))
  }

  test("derived build matches the literal build object-for-object") {
    val parity = DvGo.goDerivedParity(spark, sfDir).collect()
    assert(parity.length == 8)
    assert(parity.forall(_.getAs[Boolean]("matches_literal")),
      parity.filterNot(_.getAs[Boolean]("matches_literal")).map(_.getString(0)).mkString(", "))
  }

  test("consolidated hub carries both record sources") {
    val srcs = DvGo.derivedPlan(spark, sfDir).hubs.find(_.spec.name == "customer").get
    assert(srcs.sources.map(_.table) == Seq("customer", "orders"))
    // orders-first load: early-order keys arrive as source.orders, the
    // master backfill delivers the rest
    import org.apache.spark.sql.functions._
    val hub = DvBuild.hubMultiFrom(spark, hubCustomer, Seq(
      ("orders", Tables.load(spark, sfDir, "orders")
        .filter(to_date(col("o_orderdate")) < lit("1996-07-01").cast("date")),
        Seq(Col("o_custkey", "bigint"))),
      ("customer", Tables.load(spark, sfDir, "customer"), Seq(Col("c_custkey", "bigint")))))
    val bySource = hub.groupBy("record_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("source.orders", 0L) > 0)
    assert(bySource.getOrElse("source.customer", 0L) > 0)
    // one row per key, ghosts included
    val total = Tables.load(spark, sfDir, "customer").select("c_custkey").distinct().count() + 2
    assert(hub.count() == total)
    assert(hub.select("c_custkey_bk").distinct().count() == total)
  }
}
