package graft

import graft.queries.{Docs, Rank}
import org.apache.spark.sql.functions._

/** The ranking ops re-derived in plain Scala over collected sf0.001 data —
  * an oracle independent of the DataFrame machinery (same IEEE/integer
  * arithmetic, so equality must be EXACT, not approximate).
  */
class RankSpec extends SparkSpec {

  private val queries = Seq(
    1L -> Seq("spark", "window"), 2L -> Seq("hash", "join", "table"),
    3L -> Seq("customer", "query"), 4L -> Seq("scan", "filter", "slow"),
    5L -> Seq("stream", "batch", "merge"), 6L -> Seq("vector", "sort", "group"))

  /** Per query: every candidate doc with (bm25 micro score, raw tf sum). */
  private def bruteScores(): Map[Long, Seq[(Long, Long, Long)]] = {
    val docs = Docs.enriched(spark, sfDir).select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val allQTerms = queries.flatMap(_._2).toSet
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(allQTerms).groupBy(identity).map { case (tm, xs) =>
        (id, tm, xs.length.toLong, toks.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).map { case (tm, xs) => tm -> xs.length.toLong }
    queries.map { case (q, terms) =>
      q -> tf.filter(x => terms.contains(x._2)).groupBy(_._1).map {
        case (id, xs) =>
          val bm25 = xs.map { case (_, tm, tfv, dl) =>
            // double-FIRST products, same op order as the Spark/oracle exprs
            val idf = (2.0 * (n - df(tm)) + 1.0) / (2.0 * df(tm) + 1.0)
            val tfp = (22.0 * t * tfv) /
              (10.0 * t * tfv + 3.0 * t + 9.0 * dl * n)
            math.floor(idf * tfp * 1000000.0).toLong
          }.sum
          (id, bm25, xs.map(_._3).sum)
      }.toSeq
    }.toMap
  }

  test("text_bm25 matches a driver-side brute-force BM25 exactly") {
    val out = SparkEntry.queries("text_bm25")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = bruteScores()
    val expected = queries.flatMap { case (q, _) =>
      brute(q).map { case (id, sc, _) => (id, sc) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10)
        .zipWithIndex.map { case ((id, sc), i) => (q, i + 1L, id, sc) }
    }
    assert(out.toSeq == expected, "spark top-k diverges from the brute-force ranking")
    // ranks are a dense 1..k sequence per query and scores non-increasing
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _           => true
      })
    }
  }

  test("rank_fusion matches driver-side RRF of the two rankers exactly") {
    val out = SparkEntry.queries("rank_fusion")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = bruteScores()
    val expected = queries.flatMap { case (q, _) =>
      val cands = brute(q)
      val ra = cands.map { case (id, sc, _) => (id, sc) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val rb = cands.map { case (id, _, ts) => (id, ts) }
        .sortBy { case (id, ts) => (-ts, id) }.take(10)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      (ra.keySet ++ rb.keySet).toSeq.map { id =>
        val rrf = ra.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L) +
          rb.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L)
        (id, rrf)
      }.sortBy { case (id, rrf) => (-rrf, id) }.take(10)
        .zipWithIndex.map { case ((id, rrf), i) => (q, i + 1L, id, rrf) }
    }
    assert(out.toSeq == expected, "spark fusion diverges from the brute-force RRF")
    // the tf-sum leg demonstrably matters: recompute the fusion with the
    // rank_b contribution dropped — the result must differ, i.e. the op
    // is not the BM25 ranking relabeled
    val bm25Only = queries.flatMap { case (q, _) =>
      brute(q).map { case (id, sc, _) => (id, sc) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10)
        .zipWithIndex.map { case ((id, _), i) => (id, 1000000L / (60L + i + 1L)) }
        .sortBy { case (id, rrf) => (-rrf, id) }
        .zipWithIndex.map { case ((id, rrf), i) => (q, i + 1L, id, rrf) }
    }
    assert(out.toSeq != bm25Only, "fusion output degenerated to the BM25 leg alone")
  }

  test("graph_pagerank matches a driver-side integer PageRank exactly") {
    val out = SparkEntry.queries("graph_pagerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pairs = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.map { case (c, s) => (c, s) } ++ pairs.map { case (c, s) => (s, c) }
    val deg = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val nNodes = deg.size.toLong
    val r0 = 1000000000000L / nNodes
    val tele = (15L * r0) / 100L
    var rank = deg.keys.map(_ -> r0).toMap
    for (_ <- 1 to 4) {
      val csum = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = csum.map { case (k, cs) => k -> (tele + (85L * cs) / 100L) }
    }
    val expected = rank.toSeq.map { case (id, r) =>
      (id, if (id % 2 == 0) "customer" else "supplier", r)
    }.sortBy { case (id, _, r) => (-r, id) }
    assert(out.toSeq == expected, "spark ranks diverge from the driver-side kernel")
    // mass conservation: damping + floor-division only ever LOSE pico-units
    val total = out.map(_._3).sum
    assert(total <= 1000000000000L && total > 0L)
    // the 10 suppliers are high-degree hubs in a bipartite trade graph —
    // every one of them must outrank every customer
    val minSupp = out.filter(_._2 == "supplier").map(_._3).min
    val maxCust = out.filter(_._2 == "customer").map(_._3).max
    assert(minSupp > maxCust, s"supplier floor $minSupp <= customer ceiling $maxCust")
  }

  test("pagerank internals plan-audit: edge build + iteration are equi-joins only") {
    // The registered op's surfaced plan (swept by ScaleSpec) contains the
    // chained iteration joins but NOT the edge build — edgesD surfaces as
    // a checkpoint scan there. This audits those hidden edge-build joins
    // on the un-checkpointed frames, plus one iteration for completeness.
    val edgesD = Rank.prEdges(spark, sfDir)
    val seed = edgesD.select(col("src").as("node_id")).distinct()
      .withColumn("r", lit(1000000L))
    val iter = Rank.prIteration(edgesD, seed, 45L)
    val plan = iter.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in pagerank internals:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in pagerank internals:\n$plan")
    // the audit is not vacuous: both the edge-deg join and the rank join
    // are present in this one plan
    assert("Join".r.findAllIn(plan).size >= 2, s"expected >=2 joins in:\n$plan")
  }

  test("pagerank rounds are exchange-free on the edge side (r10 verdict #4)") {
    // pagerank materializes repartition(src).localCheckpoint() so each
    // round's src-equi-join finds the corpus-scale edge frame already
    // clustered — only the node-scale rank frame moves. Pin that: under a
    // forced shuffle join (broadcast off; sparkPlan = pre-AQE, like the
    // op's own planning at cluster scale), the join child carrying `deg`
    // (the edge side) must plan with ZERO ShuffleExchange below it.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val edgesD = Rank.prEdges(spark, sfDir).repartition(col("src")).localCheckpoint()
      val seed = edgesD.select(col("src").as("node_id")).distinct()
        .withColumn("r", lit(1000000L))
      val iter = Rank.prIteration(edgesD, seed, 45L)
      val phys = iter.queryExecution.sparkPlan
      val joins = phys.collect { case j: BaseJoinExec => j }
      assert(joins.size == 1, s"expected exactly the round join, got:\n$phys")
      val edgeSide = joins.head.children.find(_.output.exists(_.name == "deg"))
        .getOrElse(fail(s"no join child carries deg in:\n$phys"))
      val shuffles = edgeSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"edge side re-shuffles inside the round:\n$edgeSide")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("search_hybrid: fusion arithmetic exact, dense side agrees with knn, both modalities live") {
    val rows = SparkEntry.queries("search_hybrid")(spark, sfDir).collect()
    // 20 probes x top-10
    assert(rows.groupBy(_.getAs[Long]("query_id")).size == 20)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach(g => assert(g.length == 10))
    // RRF is exactly the integer formula over the reported ranks
    rows.foreach { r =>
      val (rd, rs) = (r.getAs[Long]("rank_dense"), r.getAs[Long]("rank_sparse"))
      val expect = (if (rd > 0) 1000000L / (60L + rd) else 0L) +
        (if (rs > 0) 1000000L / (60L + rs) else 0L)
      assert(r.getAs[Long]("rrf_micro") == expect)
      assert(rd > 0 || rs > 0)
    }
    // the two modalities genuinely both contribute
    assert(rows.exists(r => r.getAs[Long]("rank_dense") > 0 && r.getAs[Long]("rank_sparse") > 0))
    assert(rows.exists(r => r.getAs[Long]("rank_dense") > 0 && r.getAs[Long]("rank_sparse") == 0))
    assert(rows.exists(r => r.getAs[Long]("rank_dense") == 0 && r.getAs[Long]("rank_sparse") > 0))
    // dense ranks agree with the exact knn_cosine baseline where both report
    val knn = SparkEntry.queries("knn_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Number]("rank").longValue).toMap
    rows.filter(r => r.getAs[Long]("rank_dense") >= 1 && r.getAs[Long]("rank_dense") <= 5)
      .foreach { r =>
        knn.get((r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).foreach { kr =>
          assert(kr == r.getAs[Long]("rank_dense"),
            s"dense rank diverges from knn for ${r}")
        }
      }
  }
}
