package graft

import graft.queries.{Analytics4, DataVault, Text}
import org.apache.spark.sql.functions._

class Analytics4Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("events_heavy_hitters: min(20, users) rows, ranked by count with real variation") {
    val rows = run("events_heavy_hitters").collect()
    val users = Tables.loadEvents(spark, sfDir).select("user_id").distinct().count()
    assert(rows.length == math.min(20L, users))
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length.toLong), "ranks not dense")
    assert(counts.head > counts.last, "no count variation — hollow ranking")
  }

  test("orders_basket_pairs: pairs well-formed, support positive, co-occurrence real") {
    val rows = run("orders_basket_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(r => r.getAs[Long]("p1") < r.getAs[Long]("p2")))
    val support = rows.map(_.getAs[Long]("support"))
    assert(support.forall(_ >= 1))
    assert(support.zip(support.tail).forall { case (a, b) => a >= b })
    // non-hollow: the pair universe is larger than the emitted top-K
    val op = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val nPairs = op.as("a").join(op.as("b"), Seq("l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey")).count()
    assert(nPairs >= rows.length, s"pair universe $nPairs smaller than output")
  }

  test("events_path_conversion: every path converts and multi-step paths exist") {
    val rows = run("events_path_conversion").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("path").split(">").contains("purchase")),
      "non-converting path in output")
    assert(rows.exists(_.getAs[String]("path").contains(">")), "no multi-event path")
    assert(rows.forall(_.getAs[Long]("n_user_days") >= 1))
  }

  test("text_feature_hash: bins bounded, per-doc vectors sparse and non-trivial") {
    val rows = run("text_feature_hash").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => { val d = r.getAs[Long]("dim"); d >= 0 && d < 256 }))
    assert(rows.forall(_.getAs[Long]("tf") >= 1))
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).map(_._2.length)
    assert(perDoc.exists(_ > 4), "feature vectors trivially small")
    assert(perDoc.forall(_ <= 256))
  }

  test("pipeline_dedup_full: flags consistent with their component operators") {
    val full = run("pipeline_dedup_full").collect()
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(full.length == docs, "one row per document")
    // keep is exactly the conjunction of the three gates
    full.foreach { r =>
      val keep = r.getAs[Long]("keep")
      val drops = r.getAs[Long]("exact_dup") + r.getAs[Long]("near_dup_drop") +
        r.getAs[Long]("substr_victim")
      assert((keep == 1L) == (drops == 0L), s"keep inconsistent: $r")
    }
    // non-hollow: the near-dup and substring gates each drop someone
    assert(full.map(_.getAs[Long]("near_dup_drop")).sum > 0, "near-dup gate hollow")
    assert(full.map(_.getAs[Long]("substr_victim")).sum > 0, "substring gate hollow")
    // component parity: near_dup_drop == 1 - keep_ind from dedup_keep_best
    val kb = run("dedup_keep_best").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_ind")).toMap
    full.foreach { r =>
      assert(r.getAs[Long]("near_dup_drop") == 1L - kb(r.getAs[Long]("doc_id")),
        s"near-dup flag diverges from dedup_keep_best at $r")
    }
  }

  test("corpus_split_safe: no near-dup cluster straddles splits, proportions sane") {
    val rows = run("corpus_split_safe").collect()
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == docs)
    // leakage safety: every member of a cluster carries the same split
    rows.groupBy(_.getAs[Long]("canon_id")).foreach { case (c, vs) =>
      assert(vs.map(_.getAs[String]("split")).distinct.length == 1,
        s"cluster $c straddles splits")
    }
    // a real multi-member cluster exists (the guarantee is non-vacuous)
    assert(rows.groupBy(_.getAs[Long]("canon_id")).exists(_._2.length > 1),
      "no multi-member cluster — leakage guarantee vacuous")
    val bySplit = rows.groupBy(_.getAs[String]("split")).map { case (k, v) => k -> v.length }
    assert(bySplit.keySet == Set("train", "val", "test"), s"missing split: $bySplit")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("graph_triangles: matches an independent driver-side recount at sf0.001") {
    val rows = run("graph_triangles").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("p_partkey"), r.getAs[Long]("n_triangles")))
    assert(rows.nonEmpty && rows.length <= 10)
    // independent plain-Scala recount: same degree cap, same orientation
    val op = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = op.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val edges = support.groupBy(_._1._1).values.flatMap { nbrs =>
      nbrs.toSeq.sortBy { case ((_, b), s) => (-s, b) }.take(20).map(_._1)
    }.toSet
    val bySrc = edges.groupBy(_._1)
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      (_, c) <- bySrc.getOrElse(b, Set.empty)
      if edges((a, c))
    } {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val want = triCount.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, n), i) => (i + 1L, p, n) }
    assert(rows.toSeq == want.toSeq, s"op ${rows.toSeq} vs recount ${want.toSeq}")
  }

  test("orders_assoc_rules: confidences bounded by 1, lift consistent with counts") {
    val rows = run("orders_assoc_rules").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (s, na, nb) = (r.getAs[Long]("support"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(s <= na && s <= nb, s"support exceeds a side's order count: $r")
      assert(r.getAs[Long]("conf_a_to_b_micro") == s * 1000000L / na)
      assert(r.getAs[Long]("conf_b_to_a_micro") == s * 1000000L / nb)
      assert(r.getAs[Long]("conf_a_to_b_micro") <= 1000000L)
      assert(r.getAs[Long]("lift_micro") > 0L)
    }
  }

  test("curate_importance_sample: kept fraction tracks mean weight, hash independent of quality") {
    val rows = run("curate_importance_sample").collect()
    val n = rows.length
    assert(n > 0)
    rows.foreach { r =>
      assert((r.getAs[Long]("keep") == 1L) ==
        (r.getAs[Long]("h_micros") < r.getAs[Long]("q_micros")))
    }
    val kept = rows.map(_.getAs[Long]("keep")).sum.toDouble / n
    val meanW = rows.map(_.getAs[Long]("q_micros")).sum.toDouble / n / 1e6
    // the uniform hash makes E[kept] = mean weight; allow generous slack
    assert(math.abs(kept - meanW) < 0.1, s"kept $kept vs mean weight $meanW")
    // both classes exist (non-hollow gate)
    assert(kept > 0.0 && kept < 1.0)
  }

  test("text_quality_calibration: deciles partition the corpus, rates bounded") {
    val rows = run("text_quality_calibration").collect()
    assert(rows.length > 1, "single decile — quality score degenerate")
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs, "deciles do not partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("decile") >= 0 && r.getAs[Long]("decile") <= 9)
      assert(r.getAs[Long]("lang_unknown_micro") <= 1000000L)
      assert(r.getAs[Long]("near_dup_micro") <= 1000000L)
      assert(r.getAs[Long]("n_lang_unknown") <= r.getAs[Long]("n_docs"))
    }
  }

  test("corpus_novelty: doc 0 fully novel, ratios bounded, burn-down real") {
    val rows = run("corpus_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("novelty_micros") <= 1000000L)
    }
    // the first doc's shingles are all first-seen by construction
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_micros") == 1000000L, s"doc 0 not fully novel: $first")
    // burn-down is real: some later doc is mostly non-novel
    assert(rows.exists(_.getAs[Long]("novelty_micros") < 500000L), "no repetition observed")
  }

  test("corpus_source_overlap: full pair matrix, bounded shares, real variation") {
    val rows = run("corpus_source_overlap").collect()
    val nSrc = Tables.load(spark, sfDir, "documents").select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, s"expected C($nSrc,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      val shared = r.getAs[Long]("n_shared")
      assert(shared >= 0 && shared <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      assert(r.getAs[Long]("share_a_micro") <= 1000000L &&
        r.getAs[Long]("share_b_micro") <= 1000000L)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    val shares = rows.map(_.getAs[Long]("share_a_micro"))
    assert(shares.max > shares.min, "no overlap variation — hollow matrix")
  }

  test("events_inter_arrival: one row per type, percentile ordering holds") {
    val rows = run("events_inter_arrival").collect()
    val types = Tables.loadEvents(spark, sfDir).select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") > 0)
      val (p50, p90, p99) = (r.getAs[Double]("p50_ms"), r.getAs[Double]("p90_ms"),
        r.getAs[Double]("p99_ms"))
      assert(p50 <= p90 && p90 <= p99 && p50 >= 0.0, s"percentiles disordered: $r")
    }
  }

  test("dv_quality_checks: clean data passes; planted violations are counted") {
    val clean = run("dv_quality_checks").collect()
    assert(clean.length == 6)
    assert(clean.forall(_.getAs[Long]("pass") == 1L), "clean sf data should pass all rules")
    // plant violations in a tampered copy of the three tables: a negative
    // order price with a dangling custkey, an orphaned lineitem with an
    // out-of-range quantity, a duplicated customer key
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq_").toString
    try {
      Seq("region", "nation", "supplier", "part", "events", "documents", "embeddings")
        .foreach(t => Tables.load(spark, sfDir, t).write.parquet(s"$tmp/$t.parquet"))
      val orders = Tables.load(spark, sfDir, "orders")
      val badOrder = orders.limit(1)
        .withColumn("o_orderkey", lit(999999999L))
        .withColumn("o_custkey", lit(888888888L))
        .withColumn("o_totalprice", lit(-5.0))
      orders.unionByName(badOrder).write.parquet(s"$tmp/orders.parquet")
      val li = Tables.load(spark, sfDir, "lineitem")
      val badLine = li.limit(1)
        .withColumn("l_orderkey", lit(777777777L))
        .withColumn("l_quantity", lit(99.0))
      li.unionByName(badLine).write.parquet(s"$tmp/lineitem.parquet")
      val cust = Tables.load(spark, sfDir, "customer")
      cust.unionByName(cust.limit(1)).write.parquet(s"$tmp/customer.parquet")
      val tampered = SparkEntry.queries("dv_quality_checks")(spark, tmp).collect()
        .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations")).toMap
      assert(tampered("o_totalprice_positive") == 1L, tampered.toString)
      assert(tampered("o_custkey_fk_customer") == 1L)
      assert(tampered("l_orderkey_fk_orders") == 1L)
      assert(tampered("l_quantity_range_1_50") == 1L)
      assert(tampered("c_custkey_unique") == 1L)
      assert(tampered("c_acctbal_not_null") == 0L)
    } finally graft.dv.DvLoader.deletePath(java.nio.file.Paths.get(tmp))
  }

  test("dv_source_profile: key columns fully unique, registry-complete") {
    val rows = run("dv_source_profile").collect()
    val byCol = rows.map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")) -> r).toMap
    // every registry column of the profiled tables appears exactly once
    val expected = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .flatMap(t => graft.dv.SourceSchemas.columns(t).map(c => (t, c.name)))
    assert(byCol.keySet == expected.toSet, "profile does not match the registry")
    // business keys profile as fully unique — the classifier's BK signal
    Seq(("customer", "c_custkey"), ("orders", "o_orderkey"), ("part", "p_partkey"))
      .foreach { k =>
        assert(byCol(k).getAs[Long]("uniq_micro") == 1000000L, s"$k not unique")
      }
    // a known low-cardinality descriptor profiles far from unique
    assert(byCol(("customer", "c_mktsegment")).getAs[Long]("uniq_micro") < 100000L)
    rows.foreach(r => assert(r.getAs[Long]("n_nulls") >= 0 &&
      r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows")))
    // the gate SFs all sit under the row budget: exact path everywhere,
    // and the exact path must NOT be the multi-distinct Expand shape
    assert(rows.forall(_.getAs[Long]("exact") == 1L))
    val exactPlan = run("dv_source_profile").queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      "exact profile path regressed to a multi-distinct Expand")
  }

  test("dv_source_profile: approx path above the row budget — no Expand, HLL within tolerance") {
    val exact = run("dv_source_profile").collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")) ->
        r.getAs[Long]("n_distinct")).toMap
    spark.conf.set("graft.profile.exactMaxRows", "0")
    try {
      val approxDf = run("dv_source_profile")
      assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
        "approx profile path must be a plain multi-agg (HLL sketches), never Expand")
      val approx = approxDf.collect()
      assert(approx.forall(_.getAs[Long]("exact") == 0L), "budget=0 must force approx")
      approx.foreach { r =>
        val k = (r.getAs[String]("table_name"), r.getAs[String]("column_name"))
        val a = r.getAs[Long]("n_distinct")
        val e = exact(k)
        // HLL++ default rsd 5%; allow 12% plus small-count slack
        assert(math.abs(a - e) <= math.max(4L, (e * 0.12).toLong),
          s"$k: approx $a too far from exact $e")
      }
    } finally spark.conf.unset("graft.profile.exactMaxRows")
  }

  test("dv_computed_sat: hub-key parity with hub_customer, exact attributes, hd tracks attrs") {
    val sat = run("dv_computed_sat")
    // every computed-sat key exists in hub_customer (the satellite hangs
    // off the raw hub; hash convention must match exactly)
    val hub = SparkEntry.queries("dv_hub_customer")(spark, sfDir)
      .select(col("hub_customer_hk"))
    val orphans = sat.select("hub_customer_hk").distinct()
      .join(hub, Seq("hub_customer_hk"), "left_anti").count()
    assert(orphans == 0, s"$orphans computed-sat keys missing from hub_customer")
    // attributes recompute: spot-check one customer end-to-end
    val row = sat.orderBy("hub_customer_hk").limit(1).collect()(0)
    assert(row.getAs[Long]("order_cnt") >= 1)
    assert(row.getAs[Long]("total_cents") > 0)
    // hash-diff is a function of the attributes: same attrs -> same hd
    val dup = sat.groupBy("sat_customer_bv_hd", "order_cnt", "total_cents", "last_order_ms")
      .count()
    val conflicting = sat.select("sat_customer_bv_hd", "order_cnt", "total_cents", "last_order_ms")
      .distinct().groupBy("sat_customer_bv_hd").count().filter(col("count") > 1).count()
    assert(conflicting == 0, "one hash-diff maps to two attribute tuples")
    dup.unpersist()
  }
}
