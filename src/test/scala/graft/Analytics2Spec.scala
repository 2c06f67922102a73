package graft

import graft.queries.Analytics2
import org.apache.spark.sql.functions._

class Analytics2Spec extends SparkSpec {

  test("every tranche-2 analytics query runs and returns rows on sf0.001") {
    Analytics2.defs.foreach { d =>
      val out = d.run(spark, sfDir)
      assert(out.count() > 0, s"${d.name} returned no rows")
    }
  }

  test("q12 late + ontime counts sum to the joined line count") {
    val q12 = Analytics2.defs.find(_.name == "q12_late_shipments").get.run(spark, sfDir)
    val total = q12.agg(sum(col("n_late") + col("n_ontime"))).collect()(0).getLong(0)
    val l = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val joined = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    assert(total == joined)
  }

  test("q15 winner's revenue equals the max per-supplier revenue") {
    val q15 = Analytics2.defs.find(_.name == "q15_top_supplier").get.run(spark, sfDir)
    val winners = q15.collect()
    assert(winners.nonEmpty)
    val revs = winners.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all winners must share the max revenue")
    // VERDICT r5 #3: the global max is a bounded 1-row collect inlined as
    // a literal — no empty-partition-spec Window may appear in the plan
    val plan = Analytics2.defs.find(_.name == "q15_top_supplier").get.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q15 must not use a window:\n$plan")
  }

  test("q14 promo share is a percentage in (0, 100)") {
    val pct = Analytics2.defs.find(_.name == "q14_promo_effect").get.run(spark, sfDir)
      .collect()(0).getAs[Double]("promo_revenue_pct")
    assert(pct > 0.0 && pct < 100.0, s"promo pct $pct")
  }

  test("funnel stage counts are monotone non-increasing") {
    val f = Analytics2.defs.find(_.name == "events_funnel").get.run(spark, sfDir)
      .orderBy("stage").collect().map(_.getAs[Long]("n_users"))
    assert(f.length == 3 && f(0) >= f(1) && f(1) >= f(2) && f(0) > 0)
  }

  test("retention day-0 count equals the cohort size") {
    val r = Analytics2.defs.find(_.name == "events_retention").get.run(spark, sfDir).cache()
    val day0 = r.filter(col("k") === 0)
      .agg(sum("n_active")).collect()(0).getLong(0)
    val users = Tables.load(spark, sfDir, "events").select("user_id").distinct().count()
    assert(day0 == users) // every user is active on their own first day
    // retention never exceeds the cohort's day-0 size
    val d0 = r.filter(col("k") === 0)
      .select(col("cohort_day"), col("n_active").as("n0"))
    val bad = r.join(d0, "cohort_day").filter(col("n_active") > col("n0")).count()
    assert(bad == 0)
  }

  test("approx sketches land within bounds of the exact answers") {
    // the band checks now ride INSIDE the operator as in-band flags (so the
    // DuckDB oracle can assert them); the spec verifies the flags are all
    // raised and the exact column matches an independent recomputation
    val rows = Analytics2.defs.find(_.name == "events_approx_stats").get.run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("users_in_band") == 1, s"${r.getAs[String]("day")} HLL out of band")
      assert(r.getAs[Int]("p50_in_band") == 1, s"${r.getAs[String]("day")} p50 out of band")
      assert(r.getAs[Int]("p90_in_band") == 1, s"${r.getAs[String]("day")} p90 out of band")
    }
    val exact = Tables.loadEvents(spark, sfDir)
      .withColumn("day", to_date(timestamp_millis(col("tms"))).cast("string"))
      .groupBy("day").agg(countDistinct("user_id").as("users"))
      .collect().map(r => r.getAs[String]("day") -> r.getAs[Long]("users")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") == exact(r.getAs[String]("day")))
    }
  }

  test("range_join_events binned interval join equals the direct range join") {
    val binned = Analytics2.defs.find(_.name == "range_join_events").get.run(spark, sfDir).cache()
    // the op must not be hollow: some purchases have preceding views
    assert(binned.filter(col("n_views") > 0).count() > 0)
    // direct formulation (range-predicate join — quadratic, test-SF only)
    val e = Tables.loadEvents(spark, sfDir)
    val views = e.filter(col("event_type") === "view")
      .select(col("tms").as("vt"), expr("cast(floor(value * 1000) as bigint)").as("vmilli"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("tms").as("pt"))
    val direct = purchases
      .join(views, col("vt") >= col("pt") - 600000L && col("vt") < col("pt"), "left_outer")
      .groupBy("event_id")
      .agg(count(col("vt")).as("n_views"),
        coalesce(sum("vmilli"), lit(0L)).as("view_value_milli"))
      .select("event_id", "n_views", "view_value_milli")
    assert(binned.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(binned).count() == 0)
  }

  test("q8 market shares are fractions; q9 covers every nation") {
    val shares = Analytics2.defs.find(_.name == "q8_market_share").get.run(spark, sfDir)
      .collect().map(_.getAs[Double]("mkt_share"))
    assert(shares.nonEmpty && shares.forall(v => v >= 0.0 && v <= 1.0))
    val nations = Analytics2.defs.find(_.name == "q9_product_profit").get.run(spark, sfDir)
      .select("nation").distinct().count()
    val expected = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select("s_nationkey").distinct().count()
    assert(nations == expected && nations > 0)
  }

  test("win_order_gaps: gap count per customer is orders-1") {
    val gaps = Analytics2.defs.find(_.name == "win_order_gaps").get.run(spark, sfDir)
    val totalGaps = gaps.agg(sum("n_gaps")).collect()(0).getLong(0)
    val o = Tables.load(spark, sfDir, "orders")
    val orders = o.count()
    val customers = o.select("o_custkey").distinct().count()
    assert(totalGaps == orders - customers)
  }

  test("q22 selected customers all exceed the average balance") {
    val q22 = Analytics2.defs.find(_.name == "q22_idle_customers").get.run(spark, sfDir)
    assert(q22.count() > 0)
    // every reported nation's average selected balance must exceed the
    // population average of positive balances in the selected nations
    val c = Tables.load(spark, sfDir, "customer")
      .filter(col("c_nationkey").isin("11", "13", "15", "17") && col("c_acctbal") > 0.0)
    val popAvg = c.agg(avg("c_acctbal")).collect()(0).getDouble(0)
    q22.collect().foreach { r =>
      val avgSel = r.getAs[Double]("totacctbal") / r.getAs[Long]("numcust")
      assert(avgSel > popAvg, s"nation ${r.get(0)}: $avgSel <= $popAvg")
    }
  }

  test("q21: only-late supplier on multi-supplier finished orders") {
    val q21 = Analytics2.defs.find(_.name == "q21_waiting_supplier").get.run(spark, sfDir)
    val rows = q21.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // descending numwait with name tiebreak
    val nw = rows.map(r => (r.getAs[Long]("numwait"), r.getAs[String]("s_name")))
    assert(nw.sameElements(nw.sortBy { case (n, s) => (-n, s) }))
  }

  test("mm_dedup: frame-overlap pairs are ordered with bounded containment") {
    val d = SparkEntry.queries("mm_dedup")(spark, sfDir)
    assert(d.count() > 0)
    assert(d.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(d.filter(col("containment") > 1.0 || col("n_shared") < 2).count() == 0)
    assert(d.filter(col("n_shared") > least(col("n_a"), col("n_b"))).count() == 0)
  }

  test("events_anomaly: integer z-test matches the double formula") {
    val a = SparkEntry.queries("events_anomaly")(spark, sfDir).cache()
    assert(a.filter(col("anomaly") === 1).count() > 0)
    // cross-check against the naive double z-score on collected rows
    a.collect().groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val cnts = rows.map(_.getAs[Long]("cnt").toDouble)
      val n = cnts.length
      val mean = cnts.sum / n
      val sigma2 = cnts.map(c => (c - mean) * (c - mean)).sum / n
      rows.foreach { r =>
        val c = r.getAs[Long]("cnt").toDouble
        val expect = if ((c - mean) * (c - mean) > 4 * sigma2) 1L else 0L
        assert(r.getAs[Long]("anomaly") == expect, s"row $r")
      }
    }
  }

  test("q16/q20: part-supplier adaptations hold their invariants") {
    val q16 = SparkEntry.queries("q16_supplier_cnt")(spark, sfDir)
    assert(q16.count() > 0)
    assert(q16.filter(col("supplier_cnt") <= 0).count() == 0)
    val q20 = SparkEntry.queries("q20_dominant_supplier")(spark, sfDir).cache()
    // dominance: strictly more than half the part total, so at most one
    // dominant supplier per part
    assert(q20.filter(col("supp_qty") * 2 <= col("part_qty")).count() == 0)
    assert(q20.groupBy("p_partkey").count().filter(col("count") > 1).count() == 0)
  }
}
