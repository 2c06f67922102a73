package graft

import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {

  test("every analytics query runs and returns rows on sf0.001") {
    Analytics.defs.foreach { d =>
      val out = d.run(spark, sfDir)
      assert(out.count() > 0, s"${d.name} returned no rows")
    }
  }

  test("q1 aggregates are internally consistent") {
    val q1 = Analytics.defs.find(_.name == "q1_pricing_summary").get.run(spark, sfDir)
    val rows = q1.collect()
    assert(rows.length > 0 && rows.length <= 6) // |returnflag| x |linestatus|
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("sessionize: session counts sum to event count") {
    val sessions = Analytics.defs.find(_.name == "events_sessionize").get.run(spark, sfDir)
    val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    val events = Tables.load(spark, sfDir, "events").count()
    assert(total == events)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
