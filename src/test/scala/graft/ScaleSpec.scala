package graft

import graft.dv.{DvBuild, DvPlanner, Scale}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("bucketed hub: incremental anti-join has no Exchange on the stored side") {
    val hub = DvBuild.hub(spark, sfDir, DvPlanner.hubCustomer)
    Scale.writeBucketed(hub, "hub_customer_bucketed", "hub_customer_hk", buckets = 8)
    val batch = Tables.load(spark, sfDir, "customer")
      .select(sha2(col("c_custkey").cast("string"), 256).as("hub_customer_hk"))
    val inc = Scale.incrementAgainstBucketed(spark, batch, "hub_customer_bucketed", "hub_customer_hk")
    val physical = inc.queryExecution.executedPlan.toString
    // the bucketed (right/stored) side must be scan->join with no shuffle:
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).size
    assert(exchanges <= 1, s"expected at most the batch-side exchange, got:\n$physical")
    assert(inc.count() == 0) // same keys -> nothing new
  }

  test("bloom-prefiltered anti-join prunes the stored side and keeps the result exact") {
    // batch = orders after 1997-06; stored = hub of all earlier orders
    val o = Tables.load(spark, sfDir, "orders")
    val stored = o.filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      .select(sha2(col("o_orderkey").cast("string"), 256).as("hub_order_hk")).distinct()
    val batch = o.filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
      .select(sha2(col("o_orderkey").cast("string"), 256).as("hub_order_hk")).distinct()
    val direct = DvBuild.hubIncrement(stored, batch, "hub_order_hk")
    val bloomed = Scale.incrementBloomPruned(batch, stored, "hub_order_hk")
    // identical result (bloom has no false negatives)
    assert(bloomed.count() == direct.count())
    assert(bloomed.exceptAll(direct).count() == 0)
    // the bloom probe sits on the stored side before the anti-join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in:\n$plan")
  }

  test("new-op plans stay equi-join only (no cartesian / nested-loop)") {
    // the pair-generating and signal-joining operators added in round 2
    // must never degrade to CartesianProduct or BroadcastNestedLoopJoin
    Seq("dedup_cluster", "decontaminate", "mm_dedup", "text_lm_score",
      "pipeline_curate", "q21_waiting_supplier", "events_anomaly",
      "dedup_embed_cosine_prod", "range_join_events", "dedup_cluster_embed").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name has a nested loop:\n$plan")
    }
  }

  test("saltedSum equals the direct aggregation") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), floor(col("value") * 1000000).cast("long").as("micros"))
    val direct = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("micros").as("sum_v"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val salted = Scale.saltedSum(ev, col("user_id"), col("micros"))
      .withColumnRenamed("k", "user_id")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(salted == direct)
  }
}
