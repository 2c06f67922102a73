package graft

import org.apache.spark.sql.SparkSession

/** r15 diagnosis tool (guide §1.1/§7.3): attribute the measured
  * aged-session slowdown (fresh-session BenchOne times are 2-4x the full
  * bench's in-context times for the same query) to its mechanism.
  *
  * For each probe query it reports, BEFORE and AFTER aging the session with
  * the full registry pass: planning-only time (analysis + optimization +
  * physical planning, no execution), end-to-end noop time, cumulative GC
  * time, storage-memory residency and number of cached RDDs.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProbePollution q1 q2 ..."
  */
object ProbePollution {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_simhash", "text_tfidf")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def storage: (Long, Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum, infos.length)
    }
    // shuffle/blockmgr file accumulation: ContextCleaner only deletes
    // shuffle files when the driver GC collects the referencing objects —
    // with an 8 GB heap under low pressure that can be NEVER for a whole
    // bench, so the block-manager dirs grow monotonically.
    def blockFiles: (Long, Long) = {
      val dirs = Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
      val files = dirs.flatMap(walk)
      (files.length.toLong, files.map(_.length()).sum)
    }
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    def probe(label: String): Unit = names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // planning only: force the executed plan without running it
      val (tPlan, _) = time { fn(spark, sfDir).queryExecution.executedPlan }
      val (tRun, _) = time {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val (tRun2, _) = time {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val (mem, disk, nRdd) = storage
      val (nShuf, shufBytes) = blockFiles
      println(f"[probe] $label%-6s $n%-28s plan=$tPlan%6.2fs run=$tRun%6.2fs run2=$tRun2%6.2fs " +
        f"gc=${gcMs / 1000.0}%7.1fs storMem=${mem / 1e6}%8.1fMB nRdd=$nRdd%4d " +
        f"shufFiles=$nShuf%6d shufMB=${shufBytes / 1e6}%8.1f")
    }

    probe("fresh")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // phase 1: the bench's WARM loop at the small SF
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val (tWarm, _) = time {
      ordered.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    println(f"[probe] WARM loop at $warmDir took $tWarm%.1fs, gc=${gcMs / 1000.0}%.1fs")
    probe("warmed")
    // phase 2: one timed pass at the bench SF (the bench's pass 1), with
    // per-query times so the slow tail is attributable
    val perQ = ordered.map { case (name, fn) =>
      val (t, _) = time { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      name -> t
    }
    println(f"[probe] pass-1 at $sfDir took ${perQ.map(_._2).sum}%.1fs, gc=${gcMs / 1000.0}%.1fs")
    println("[probe] slowest 20: " + perQ.sortBy(-_._2).take(20)
      .map { case (n, t) => f"$n=$t%.2f" }.mkString(", "))
    probe("aged")
    // phase 3: drop every session-cache entry, re-probe — does clearing
    // the cached frames remove the slowdown?
    graft.queries.SessionCache.clear()
    probe("cleared")
    spark.stop()
  }
}
