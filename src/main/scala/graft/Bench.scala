package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up before timing: run every query once at the smallest SF so
    // Janino-generated classes (whole-stage codegen caches on source text,
    // which is identical across SF dirs) and the parquet reader paths are
    // hot. The timed loop below then measures engine throughput at the
    // bench SF, not first-use compilation latency.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // Warm at the smallest SF when present, else at the bench SF itself —
    // a missing warm dir must not silently revert to cold-start numbers
    // (the warmed-methodology claim would be wrong).
    val warmDir = {
      val w = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
      if (new java.io.File(w).isDirectory) w
      else { System.err.println(s"[bench] warm dir $w missing; warming at $sfDir"); sfDir }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // Steady-state timing: pass 1 times every query but charges one-time
    // session caches (shared normalization passes, shuffle files) to
    // whichever query hits them first; queries slow enough for that to
    // matter are re-timed and the best of the two kept. Re-timing only the
    // slow tail keeps total bench wall-time near a single pass. The
    // methodology is recorded in the emitted JSON.
    val RetimeAboveSec = 0.75
    // A query that throws must never flatter the totals as a fail-fast
    // near-zero time (the round-4 lesson: 16 broken ops "ran" in 0.05s
    // each): failures are excluded from every total and named in a
    // `failed` list on BOTH output lines.
    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (name, fn) => name -> time(fn) }.toMap
    var retimed = 0
    // Every pass is RECORDED (r9, verdict #8): the detail line carries
    // [t1] or [t1, t2] per query, so a noisy second pass is visible in the
    // artifact itself and cross-round comparisons can use medians instead
    // of inferring which pass won. Totals still aggregate the best-of.
    val passes = ordered.flatMap { case (name, fn) =>
      pass1(name).map { t1 =>
        if (t1 >= RetimeAboveSec) { retimed += 1; name -> (Seq(t1) ++ time(fn)) }
        else name -> Seq(t1)
      }
    }
    val results = passes.map { case (k, ts) => k -> ts.min }
    val failed = ordered.map(_._1).filter(pass1(_).isEmpty)
    val qs = passes.map { case (k, ts) =>
      // Locale.ROOT: f"" uses the JVM default locale, and a comma-decimal
      // locale (de_DE) would make the detail line invalid JSON (ADVICE r9)
      s"\"" + k + "\":" + ts.map(t => "%.4f".formatLocal(java.util.Locale.ROOT, t))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val singlePassTotal = pass1.values.flatten.sum
    // Per-query detail first, compact totals-only line LAST: the driver's
    // artifact keeps the tail of the output, so the headline totals must be
    // on the final (short) line to survive truncation. Both statistics are
    // emitted so gate comparisons can use whichever matches the baseline's
    // methodology (single-pass vs best-of).
    println(s"""{"metric":"detail","unit":"sec","query_passes":$qs,"sf":"$sfDir","retimed":$retimed,"agg":"best-of-2-for-queries-at-or-above-${RetimeAboveSec}s-else-single-pass; per-query value is the list of recorded passes","failed":$failedJson}""")
    // The driver keeps only the TAIL of stdout; the full detail line above is
    // the first casualty of truncation, and it's exactly the heavy ops
    // (dv_go_build*, pagerank) whose regressions matter most. Emit a compact
    // top-20-by-cost line right before the totals so the expensive tail
    // always survives capture (round-6 verdict item 7).
    val top20 = results.sortBy(-_._2).take(20)
      .map { case (k, v) => s"\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"top20","unit":"sec","queries":$top20,"sf":"$sfDir"}""")
    // ADDITIVE accounting line (r14 verdict #2): one-time session-cache
    // builds (shared corpus passes like the tokenized docs / shingle /
    // band frames) execute inside whichever query triggers them first —
    // this line names each build and its wall-clock so per-query values
    // are interpretable (first-consumer value minus its builds = the
    // operator). Only builds at the BENCH sf are listed (warm-dir builds
    // happen outside the timed region). The methodology, the timed loop
    // and every pre-existing output line are unchanged.
    val memoBuilds = graft.queries.SessionCache.buildLog(spark)
      .filter(_._1.endsWith(s"@$sfDir")).sortBy(-_._2)
      .map { case (k, v) =>
        "\"" + k.stripSuffix(s"@$sfDir") + "\":" +
          "%.3f".formatLocal(java.util.Locale.ROOT, v)
      }.mkString("{", ",", "}")
    val memoTotal = "%.3f".formatLocal(java.util.Locale.ROOT,
      graft.queries.SessionCache.buildLog(spark)
        .filter(_._1.endsWith(s"@$sfDir")).map(_._2).sum)
    println(s"""{"metric":"memo_builds","unit":"sec","total":$memoTotal,"builds":$memoBuilds,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","single_pass_total":$singlePassTotal,"best_of_total":$total,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
