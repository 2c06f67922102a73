package graft

import org.apache.spark.sql.SparkSession

/** Per-round sf1 scale-ratio bench (round-6 verdict item 10): times the
  * ~30 most expensive / scale-interesting operators once at the driver's
  * largest gate SF and once at the deterministic 10x Sf1Gen scale-up,
  * and emits ONE JSON line of per-op ratios — so the at-worst-linear
  * property SF1_DRYRUN.md established is regression-checked continuously
  * instead of once. Absolute numbers are single-shot (noisier than
  * Bench's best-of); the RATIO is the metric: 10x data at ratio <= ~10 is
  * at-worst-linear, and the flat families (salted top-K, constant-probe
  * ANN) should stay near 1.
  *
  *   sbt "runMain graft.Sf1Gen /root/testdata/sf0.1 /tmp/sf1"
  *   sbt "runMain graft.Sf1Bench /root/testdata/sf0.1 /tmp/sf1"
  */
object Sf1Bench {

  /** The watched set: every op >= ~1s at sf0.1 plus the flat families
    * whose flatness IS the scale claim.
    */
  val Ops: Seq[String] = Seq(
    "dv_go_build", "dv_go_build_bucketed", "dv_go_derived", "dv_build_history",
    "dv_load_from_repo", "dv_source_profile", "dv_pit_incr",
    "graph_pagerank", "graph_triangles",
    "search_hybrid", "knn_cosine", "knn_label_vote",
    "ann_cosine_lsh", "ann_cosine_ivf", "ann_cosine_ivf_probe", "ann_cosine_int8",
    "ann_ivf_pq", "ann_l2_pq", "ann_ivf_incr", "ann_range_cosine",
    "dedup_embed_cosine", "dedup_embed_cosine_prod", "dedup_minhash_lsh",
    "dedup_substring", "sim_ngram_jaccard", "dedup_cluster",
    "q2_min_cost_supplier", "orders_rfm", "orders_assoc_rules", "events_heavy_hitters",
    "pipeline_curate_full", "pipeline_dedup_full", "text_lm_score", "bpe_train",
    "text_char_diversity", "corpus_zipf_check", "corpus_pack_write",
    "emb_covariance", "corpus_token_budget")

  def main(args: Array[String]): Unit = {
    val sfSmall = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sfBig = args.lift(1).getOrElse("/tmp/sf1")
    // optional 3rd arg: comma-separated op subset (e.g. the sf10 dry run
    // excludes the disclosed near-quadratic dedup family)
    val ops = args.lift(2).map(_.split(",").toSeq).getOrElse(Ops)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfSmall, sfBig)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen/reader paths at the smallest SF (Bench's methodology)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    ops.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    def time(name: String, dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, dir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        // a swallowed failure is undiagnosable (the r8 sf10 run abandoned
        // 24 of 29 ops with no recorded cause) — name the reason loudly
        System.err.println(s"[sf1bench] $name @ $dir FAILED: ${e.getClass.getName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        None
      }
    }
    // The SMALL side is timed TWICE and both passes recorded (r9 verdict
    // #2: the committed sf10 table's small sides were contaminated by a
    // concurrent compile — 22.6 s for an op other artifacts put at 4.1 s —
    // and a single pass cannot show that in the artifact itself). The min
    // is the denominator; a pass pair that disagrees wildly is visible
    // noise. The big side stays single-pass: it is minutes-long where the
    // small side is seconds, so proportional noise is far smaller and a
    // second pass would double a multi-hour run.
    //
    // Run order (r10 verdict #2): the three vault E2E writers run LAST —
    // dv_go_build (sf10 ~236 s), dv_go_derived, then dv_go_build_bucketed
    // (sf10 ~476 s) dead last — so their heap/GC wake leaves nothing to
    // pollute (the committed r10 dv_go_derived ratio read 2x its isolated
    // cost purely from running after the bucketed E2E). A stable sort
    // keeps every other op in declaration order.
    val heavyLast = Map("dv_go_build" -> 1, "dv_go_derived" -> 2, "dv_go_build_bucketed" -> 3)
    val ordered = ops.sortBy(n => heavyLast.getOrElse(n, 0))
    // Per-op transient-disk attribution (r10 verdict #7): when
    // GRAFT_SPILL_ROOT is set, sample `du -sb` of that root every ~3 s
    // during each op's BIG-side run and report peak-minus-baseline per op
    // — the whole-run sampler could only say "52 GB somewhere in 34 ops";
    // this says which op owns the peak, from inside the same artifact.
    val spillRoot = sys.env.get("GRAFT_SPILL_ROOT")
    def duBytes(d: String): Long =
      try scala.sys.process.Process(Seq("du", "-sb", d)).!!.trim.split("\\s+")(0).toLong
      catch { case _: Throwable => -1L }
    def sampled[A](f: => A): (A, Long) = spillRoot match {
      case None => (f, -1L)
      case Some(root) =>
        val base = duBytes(root)
        @volatile var peak = base
        @volatile var live = true
        val t = new Thread(() => while (live) {
          val b = duBytes(root); if (b > peak) peak = b; Thread.sleep(3000)
        })
        t.setDaemon(true); t.start()
        val r = f
        live = false; t.join(5000)
        val last = duBytes(root); if (last > peak) peak = last
        (r, if (base < 0 || peak < 0) -1L else peak - base)
    }
    val rows = ordered.map { n =>
      val s1 = time(n, sfSmall); val s2 = time(n, sfSmall)
      // settle the heap before the minutes-long big side so the timing is
      // the op's own cost, not the previous op's deferred GC debt
      System.gc(); Thread.sleep(2000)
      val (b, spill) = sampled(time(n, sfBig))
      (n, s1, Seq(s1, s2).flatten, b, spill)
    }
    // Locale.ROOT like Bench (ADVICE r9): f"" under a comma-decimal locale
    // would emit invalid JSON
    def f2(x: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, x)
    // ratio denominator = the FIRST small pass (cold/cold like the big
    // side): the second pass is session-memo-warmed (qVecs, band indexes,
    // codebooks) and using its minute-fraction times would overstate every
    // memoized op's ratio ~10x. Both passes stay in the artifact. A FAILED
    // first pass marks the op failed even when the warm second pass
    // succeeds (ADVICE r10): falling back to the warm denominator would
    // silently overstate that op's ratio ~10x with no trace in the JSON.
    val parts = rows.collect { case (n, Some(a), ss, Some(b), spill) =>
      val spillPart = if (spill >= 0) s""","spill_peak_mb":${spill / 1000000L}""" else ""
      s""""$n":{"small":${f2(a)},"small_passes":[${ss.map(f2).mkString(",")}],"big":${f2(b)},"ratio":${f2(b / a)}$spillPart}"""
    }
    val failed = rows.collect { case (n, s1, _, b, _) if s1.isEmpty || b.isEmpty => n }
    val ratios = rows.collect { case (_, Some(a), _, Some(b), _) => b / a }
    val maxR = if (ratios.nonEmpty) ratios.max else -1.0
    println(s"""{"metric":"sf1_ratios","sf_small":"$sfSmall","sf_big":"$sfBig","n_ops":${parts.size},"max_ratio":${f2(maxR)},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"ops":{${parts.mkString(",")}}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
