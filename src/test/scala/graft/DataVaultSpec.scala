package graft

import graft.dv._
import org.apache.spark.sql.functions._

class DataVaultSpec extends SparkSpec {

  test("runtime catalog introspection agrees with the static schema registry") {
    // Column-by-column, so a driver re-export that re-types ANY column of
    // ANY table (events.ts bigint→timestamp happened between rounds 4 and
    // 5) fails here first, naming the drifted column — not as 16 mysterious
    // analysis errors downstream.
    val live = Catalog.introspect(spark, sfDir)
      .select("table_name", "column_name", "ordinal", "data_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getInt(2), r.getString(3))).toMap
    val static0 = SourceSchemas.tables.flatMap { case (t, cols) =>
      cols.zipWithIndex.map { case (c, i) => (t, c.name) -> (i + 1, c.typeName) }
    }.toMap
    val drifted = (live.keySet ++ static0.keySet).toSeq.sorted.flatMap { k =>
      (live.get(k), static0.get(k)) match {
        case (Some(l), Some(s)) if l == s => None
        case (l, s) => Some(s"${k._1}.${k._2}: live=$l registry=$s")
      }
    }
    assert(drifted.isEmpty, s"schema drift (update SourceSchemas + check typed readers):\n  ${drifted.mkString("\n  ")}")
  }

  test("landing-mirror inference agrees with the declared re-typing rules") {
    // The mirror twin of the registry-agreement test (r9, verdict #6):
    // dv_source_catalog_csv's oracle predicts the CSV/JSON sniffers'
    // re-typing, and that prediction has broken on regenerated testdata
    // twice (r7, r8 — both value-dependent CSV narrowing). The rules are
    // now DECLARED in SourceSchemas (csvInferred/jsonInferred); this test
    // asserts live inference == declared rules column-by-column, naming
    // any drifted column.
    val live = Catalog.introspectLanding(spark, sfDir)
      .select("table_name", "column_name", "data_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // fits-int computed GENERICALLY per integral registry column (ADVICE
    // r9): the CSV sniffer picks int only while every value fits int32, so
    // measure min/max of each integral column instead of special-casing
    // c_custkey — the test stays valid as the registry evolves.
    val integralCols = SourceSchemas.columns("customer")
      .filter(c => Set("int", "bigint")(c.typeName)).map(_.name)
    val fits: Map[String, Boolean] = if (integralCols.isEmpty) Map.empty else {
      val aggs = integralCols.flatMap(n => Seq(
        max(col(n).cast("bigint")).as(s"max_$n"), min(col(n).cast("bigint")).as(s"min_$n")))
      val row = Tables.load(spark, sfDir, "customer").agg(aggs.head, aggs.tail: _*).collect()(0)
      integralCols.map(n => n -> (row.getAs[Long](s"max_$n") <= Int.MaxValue.toLong &&
        row.getAs[Long](s"min_$n") >= Int.MinValue.toLong)).toMap
    }
    def fitsInt(c: String): Boolean = fits.getOrElse(c, true)
    val declared =
      SourceSchemas.columns("customer").map(c =>
        ("customer_csv", c.name) -> SourceSchemas.csvInferred(c, fitsInt(c.name))) ++
      SourceSchemas.columns("nation").map(c =>
        ("nation_json", c.name) -> SourceSchemas.jsonInferred(c))
    val drifted = (live.keySet ++ declared.map(_._1).toSet).toSeq.sorted.flatMap { k =>
      (live.get(k), declared.toMap.get(k)) match {
        case (Some(l), Some(d)) if l == d => None
        case (l, d) => Some(s"${k._1}.${k._2}: live=$l declared=$d")
      }
    }
    assert(drifted.isEmpty,
      s"mirror inference drift (update SourceSchemas mirror rules AND Catalog.landingSql):\n  ${drifted.mkString("\n  ")}")
  }

  test("hub: ghost records present, hash key unique, bk round-trips") {
    val hub = DvBuild.hub(spark, sfDir, DvPlanner.hubCustomer)
    val n = hub.count()
    val distinctHk = hub.select("hub_customer_hk").distinct().count()
    assert(n == distinctHk, "hub hash keys must be unique")
    val ghosts = hub.filter(col("record_source") === "SYSTEM").collect()
    assert(ghosts.map(_.getAs[String]("c_custkey_bk")).sorted.toSeq == Seq("-1", "-2"))
    val custs = Tables.load(spark, sfDir, "customer").select("c_custkey").distinct().count()
    assert(n == custs + 2)
  }

  test("sat: hash-diff changes iff descriptors change") {
    val sat = DvBuild.sat(spark, sfDir, DvPlanner.satCustomer)
    val perKey = sat.groupBy("hub_customer_hk").agg(countDistinct("sat_customer_hd").as("v"))
    assert(perKey.filter(col("v") =!= 1).count() == 0) // customer attrs unique per key
  }

  test("link: lineitem link keys cover source cardinality") {
    val link = DvBuild.link(spark, sfDir, DvPlanner.linkLineitem)
    val src = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber").distinct().count()
    assert(link.count() == src)
    assert(link.columns.toSeq.contains("hub_order_hk") && link.columns.toSeq.contains("hub_part_hk"))
  }

  test("incremental hub load only emits new keys") {
    val o = Tables.load(spark, sfDir, "orders")
    val pre = o.filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
      .select(col("o_orderkey").cast("string").as("o_orderkey_bk")).distinct()
    val batch = o.select(col("o_orderkey").cast("string").as("o_orderkey_bk")).distinct()
    val inc = DvBuild.hubIncrement(pre, batch, "o_orderkey_bk")
    assert(inc.count() == batch.count() - pre.count())
  }

  test("classifier: expected categories on key columns") {
    val st = Classify.sourceColumnStatus(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")) ->
        (r.getAs[String]("category"), r.getAs[Double]("confidence"))).toMap
    assert(st(("customer", "c_custkey"))._1 == Classify.CatBk)
    assert(st(("customer", "c_custkey"))._2 == 0.95)
    assert(st(("customer", "c_name"))._1 == Classify.CatSens)
    assert(st(("customer", "c_acctbal"))._1 == Classify.CatSens)
    assert(st(("nation", "n_name"))._1 == Classify.CatDesc)
    assert(st(("orders", "o_custkey")) == (Classify.CatBk, 0.85))
    assert(st(("embeddings", "embedding"))._2 < Classify.Threshold)
  }

  test("table status: embeddings/documents SKIP, customer RTD") {
    val ts = Classify.sourceTableStatus(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[String]("status_code")).toMap
    assert(ts("embeddings") == "SKIP")
    assert(ts("documents") == "SKIP")
    assert(ts("customer") == "RTD")
    assert(ts("region") == "RTD")
  }

  test("fk resolution: o_custkey -> customer, l_partkey -> part") {
    assert(DvPlanner.resolve("o_custkey").contains("customer"))
    assert(DvPlanner.resolve("l_partkey").contains("part"))
    assert(DvPlanner.resolve("user_id").isEmpty)
  }

  test("sat incremental load: unchanged attributes produce zero inserts, changed produce one") {
    import org.apache.spark.sql.functions._
    val sat = dv.DvBuild.sat(spark, sfDir, DvPlanner.satCustomer)
    val again = dv.DvBuild.satIncrement(sat, sat, "hub_customer_hk", "sat_customer_hd")
    assert(again.count() == 0)
    val mutated = sat.withColumn("sat_customer_hd",
      when(col("c_mktsegment") === "BUILDING",
        unhex(sha2(concat(hex(col("sat_customer_hd")), lit("x")), 256)))
        .otherwise(col("sat_customer_hd")))
    val changed = dv.DvBuild.satIncrement(sat, mutated, "hub_customer_hk", "sat_customer_hd")
    val expected = sat.filter(col("c_mktsegment") === "BUILDING").count()
    assert(changed.count() == expected)
  }

  test("pit: snapshot count grows with as-of date") {
    val p = DvBuild.pit(spark, sfDir)
    val byDate = p.groupBy("asof_date").count().orderBy("asof_date")
      .collect().map(_.getLong(1))
    assert(byDate.sorted.toSeq == byDate.toSeq) // later dates see >= users
  }

  test("bitemporal pit: later knowledge sees more, valid-time bound holds") {
    val bp = DvBuild.pitBitemporal(spark, sfDir).collect()
    assert(bp.nonEmpty)
    // version never exceeds the valid-time cutoff (end of asof day)
    bp.foreach { r =>
      val asofEnd = java.time.LocalDate.parse(r.getAs[String]("asof_date"))
        .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli - 1
      assert(r.getAs[Long]("version_ms") <= asofEnd, s"version after valid cutoff: $r")
    }
    // at the same valid date, the later knowledge date knows >= events per
    // user, and strictly more in total (late arrivals became visible)
    val byCell = bp.groupBy(r => (r.getAs[String]("asof_date"), r.getAs[String]("knowledge_date")))
      .map { case (k, vs) => k -> vs.map(_.getAs[Long]("n_known")).sum }
    DvBuild.BiPitGrid.map(_._1).distinct.foreach { v =>
      val ts = DvBuild.BiPitGrid.filter(_._1 == v).map(_._2).sorted
      assert(byCell((v, ts.head)) < byCell((v, ts.last)),
        s"no late-arrival visibility gain at valid date $v")
    }
  }

  test("dv_mart_star: one fact row per order, hks resolve in the vault, sensitive attrs excluded") {
    import org.apache.spark.sql.functions._
    val mart = SparkEntry.queries("dv_mart_star")(spark, sfDir).cache()
    try {
      // fact grain: exactly one row per source order
      assert(mart.count() == Tables.load(spark, sfDir, "orders").count())
      assert(mart.select("hub_order_hk").distinct().count() == mart.count())
      // the mart is vault-consistent: every customer hash key exists in the hub
      val hub = DvBuild.hub(spark, sfDir, DvPlanner.hubCustomer)
        .select(col("hub_customer_hk"))
      val dangling = mart
        .select(graft.functions.GraftFunctions.dvHash(Seq(col("o_custkey_bk")))
          .as("hub_customer_hk"))
        .distinct().join(hub, Seq("hub_customer_hk"), "left_anti")
      assert(dangling.count() == 0)
      // the sensitive satellite never reaches the presentation layer
      val cols = mart.columns.toSet
      assert(!cols.contains("c_name") && !cols.contains("c_acctbal"))
      // dim side arrives broadcast; no nested-loop anywhere
      val plan = mart.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    } finally mart.unpersist()
  }

  test("dv_same_as_link: one link row per verified near-dup pair, hash keys recompute") {
    import org.apache.spark.sql.functions._
    val links = SparkEntry.queries("dv_same_as_link")(spark, sfDir).cache()
    try {
      val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      assert(links.count() == pairs.count() && links.count() > 0)
      assert(links.select("link_same_as_document_hk").distinct().count() == links.count())
      // pair order is canonical (a < b as document ids)
      assert(links.filter(col("doc_a_bk").cast("long") >= col("doc_b_bk").cast("long"))
        .count() == 0)
      // member hub keys are the dv hash of their business keys (the op's
      // edge renders digests as lowercase hex — recompute through the same
      // rendering)
      val recomputed = links.filter(
        lower(hex(graft.functions.GraftFunctions.dvHash(Seq(col("doc_a_bk"))))) =!= col("hub_document_hk_a") ||
          lower(hex(graft.functions.GraftFunctions.dvHash(Seq(col("doc_b_bk"))))) =!= col("hub_document_hk_b"))
      assert(recomputed.count() == 0)
    } finally links.unpersist()
  }

  test("dv_rts: load bitmap matches the cutoff slice and both loads are populated") {
    import org.apache.spark.sql.functions._
    val rts = SparkEntry.queries("dv_rts")(spark, sfDir).cache()
    try {
      val o = Tables.load(spark, sfDir, "orders")
      assert(rts.count() == o.select("o_orderkey").distinct().count())
      // in_load_1 is exactly the pre-cutoff membership
      val expected1 = o.filter(to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
        .select(col("o_orderkey").cast("string").as("o_orderkey_bk")).distinct()
      val flagged1 = rts.filter(col("in_load_1") === 1).select("o_orderkey_bk")
      assert(flagged1.exceptAll(expected1).isEmpty && expected1.exceptAll(flagged1).isEmpty)
      // the tracking is non-degenerate: keys exist on both sides of the cutoff
      assert(rts.filter(col("in_load_1") === 1).count() > 0)
      assert(rts.filter(col("in_load_1") === 0).count() > 0)
      // first_load consistent with the bitmap; everything is in the full feed
      assert(rts.filter(col("in_load_2") =!= 1).count() == 0)
      assert(rts.filter(col("first_load") =!= when(col("in_load_1") === 1, 1L).otherwise(2L))
        .count() == 0)
    } finally rts.unpersist()
  }

  test("dv_sat_multiactive: dense per-key subsequence, multi-active keys exist") {
    import org.apache.spark.sql.functions._
    val ma = SparkEntry.queries("dv_sat_multiactive")(spark, sfDir).cache()
    try {
      assert(ma.count() == Tables.load(spark, sfDir, "orders").count())
      // ma_seq is dense 1..n inside each hub key: max == count and sum == n(n+1)/2
      val bad = ma.groupBy("hub_customer_hk")
        .agg(count(lit(1)).as("n"), max("ma_seq").as("mx"), sum("ma_seq").as("sm"))
        .filter(col("mx") =!= col("n") || col("sm") =!= expr("n * (n + 1) div 2"))
      assert(bad.count() == 0)
      // the satellite is genuinely multi-active at this SF
      assert(ma.groupBy("hub_customer_hk").count().filter(col("count") > 1).count() > 0)
    } finally ma.unpersist()
  }

  test("dv_eff_sat: validity windows tile each driving key, one current row per key") {
    import org.apache.spark.sql.functions._
    val eff = SparkEntry.queries("dv_eff_sat")(spark, sfDir).cache()
    try {
      // exactly one open-ended current row per driving key
      val perKey = eff.groupBy("p_partkey_bk")
        .agg(sum("is_current").as("nc"), count(lit(1)).as("n"))
      assert(perKey.filter(col("nc") =!= 1).count() == 0)
      // windows tile: this row's eff_to equals the next row's eff_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p_partkey_bk").orderBy("eff_from", "s_suppkey_bk")
      val gaps = eff.withColumn("next_from", lead("eff_from", 1).over(w))
        .filter(col("next_from").isNotNull && col("eff_to") =!= col("next_from"))
      assert(gaps.count() == 0, "validity windows must tile without gaps/overlap")
      // current rows carry the vault high date
      assert(eff.filter(col("is_current") === 1 && col("eff_to") =!= "9999-12-31").count() == 0)
      // eff_from really is the (part, supp) first shipment
      val first = Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_partkey").cast("string").as("p_partkey_bk"),
          col("l_suppkey").cast("string").as("s_suppkey_bk"))
        .agg(min(to_date(col("l_shipdate"))).cast("string").as("true_from"))
      assert(eff.join(first, Seq("p_partkey_bk", "s_suppkey_bk"))
        .filter(col("eff_from") =!= col("true_from")).count() == 0)
    } finally eff.unpersist()
  }

  test("dv_mart_auto: the derived-vault answer equals the direct-source answer") {
    import org.apache.spark.sql.functions._
    val viaVault = SparkEntry.queries("dv_mart_auto")(spark, sfDir)
    val direct = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(Tables.load(spark, sfDir, "nation"), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.load(spark, sfDir, "region"), col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("r_name").as("region"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_revenue"))
    assert(viaVault.exceptAll(direct).isEmpty && direct.exceptAll(viaVault).isEmpty,
      "the vault-mediated aggregate must equal the direct one")
    // conservation: every order lands in exactly one cell
    val total = viaVault.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sfDir, "orders").count())
  }

  test("dv_ref_table: one row per code, resolvable by a broadcast join") {
    import org.apache.spark.sql.functions._
    val ref = SparkEntry.queries("dv_ref_table")(spark, sfDir).cache()
    try {
      assert(ref.count() == Tables.load(spark, sfDir, "nation").count())
      assert(ref.groupBy("ref_key").count().filter(col("count") > 1).count() == 0)
      // resolving a fact's code against the reference table loses nothing
      val resolved = Tables.load(spark, sfDir, "customer")
        .join(broadcast(ref), col("c_nationkey").cast("string") === col("ref_key"))
      assert(resolved.count() == Tables.load(spark, sfDir, "customer").count())
    } finally ref.unpersist()
  }

  test("dv_sat_status: I/U/D rows match the snapshot arithmetic, insert-only unique") {
    import org.apache.spark.sql.functions._
    val sts = SparkEntry.queries("dv_sat_status")(spark, sfDir).cache()
    try {
      val cust = Tables.load(spark, sfDir, "customer")
      val total = cust.count()
      val deleted = cust.filter(col("c_custkey") % 17 === 3).count()
      val updated = cust.filter(col("c_custkey") % 13 === 5 &&
        col("c_custkey") % 17 =!= 3).count()
      assert(sts.filter(col("status") === "I").count() == total)
      assert(sts.filter(col("status") === "D").count() == deleted)
      assert(sts.filter(col("status") === "U").count() == updated)
      assert(deleted > 0 && updated > 0, "simulated drift must be non-hollow")
      // insert-only: at most one status row per (hub key, load)
      assert(sts.groupBy("hub_customer_hk", "load_ts").count()
        .filter(col("count") > 1).count() == 0)
      // a deleted key's 'D' row pairs with its T1 'I' row (same hub hk)
      val orphans = sts.filter(col("status") === "D").select("hub_customer_hk")
        .join(sts.filter(col("status") === "I").select(col("hub_customer_hk").as("hk2")),
          col("hub_customer_hk") === col("hk2"), "left_anti")
      assert(orphans.count() == 0, "a delete arrived for a key the vault never saw")
    } finally sts.unpersist()
  }

  test("dv_pit_incr: micro-batch folds equal the rebuild; batches are non-hollow; bucketed state folds exchange-free") {
    import spark.implicits._
    // incremental == from-scratch rebuild, row for row (the oracle also
    // pins this: dv_pit_incr's oracle SQL IS the rebuild)
    val incr = SparkEntry.queries("dv_pit_incr")(spark, sfDir)
    val rebuild = SparkEntry.queries("dv_pit")(spark, sfDir)
    assert(incr.exceptAll(rebuild).isEmpty && rebuild.exceptAll(incr).isEmpty,
      "incremental PIT diverged from the rebuild")
    // each micro-batch does real work: folding it changes PIT cells
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("tms"), col("event_id"), col("props"))
    val dates = DvBuild.PitDates.toDF("asof_date")
      .withColumn("asof_ms", unix_millis(col("asof_date").cast("timestamp")))
    val Seq(c1, c2) = DvBuild.PitIncrCuts.map(d =>
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    val agg = DvBuild.pitVersionAgg(dates) _
    val state0 = agg(ev.filter(col("tms") < c1)).cache()
    val state1 = DvBuild.pitMerge(state0, agg(ev.filter(col("tms") >= c1 && col("tms") < c2))).cache()
    val state2 = DvBuild.pitMerge(state1, agg(ev.filter(col("tms") >= c2)))
    try {
      val d01 = DvBuild.pitProject(state1).exceptAll(DvBuild.pitProject(state0)).count()
      val d12 = DvBuild.pitProject(state2).exceptAll(DvBuild.pitProject(state1)).count()
      assert(d01 > 0, "first micro-batch folded to a no-op — hollow split")
      assert(d12 > 0, "second micro-batch folded to a no-op — hollow split")
      // the production shape: state persisted BUCKETED on the merge key
      // folds the next delta with ZERO stored-side exchange (only the
      // batch-sized delta shuffles — the point of incremental maintenance)
      val tbl = "graft_test_pit_state"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      try {
        state1.write.bucketBy(8, "user_id", "asof_date")
          .sortBy("user_id", "asof_date").format("parquet").saveAsTable(tbl)
        val folded = DvBuild.pitMerge(spark.table(tbl),
          agg(ev.filter(col("tms") >= c2)))
        // the STORED side of the fold join must carry no shuffle at all —
        // the bucketed scan feeds the join directly; only the delta side
        // may exchange (its aggregation + bucket-count alignment)
        val join = folded.queryExecution.sparkPlan.collectFirst {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec  => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }.getOrElse(fail("no shuffled join in the fold plan"))
        val storedSide = join.children.head
        val storedShuffles = storedSide.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(storedShuffles.isEmpty,
          s"stored PIT state reshuffled in the fold:\n$storedSide")
        assert(storedSide.toString.contains("Bucketed: true"),
          s"stored side not a bucketed scan:\n$storedSide")
        // the registered rebuild is hex at the edge; render the internal
        // fold's binary digests the same way before comparing
        assert(graft.functions.GraftFunctions.hexDigests(DvBuild.pitProject(folded))
          .exceptAll(rebuild).isEmpty,
          "bucketed-state fold diverged from the rebuild")
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    } finally { state0.unpersist(); state1.unpersist() }
  }
}
