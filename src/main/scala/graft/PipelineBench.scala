package graft

import java.nio.file.{Files, Paths}

import graft.dv.{ContinuousPipeline, DvGo, DvLoader, DvPlanner}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state dry-run of the composed bgw loop at scale (r9 verdict #8):
  * the ContinuousPipeline composition (SCD2 catalog re-scan → classify
  * opened columns → schema-driven incremental vault load) was spec-
  * verified at gate SF only. This main pins that the loop's PER-MICRO-
  * BATCH cost stays batch-sized, not corpus-sized: for each SF dir it
  * bootstraps the vault with the full customer feed (batch 0 — corpus-
  * sized by design), then drives three CONSTANT-size micro-batches of
  * novel keys through the live hook and times each. If steady-state cost
  * were corpus-sized, the big-SF steady times would scale with the stored
  * vault; batch-sized cost shows up as a near-flat ratio (the stored-side
  * anti-join scan is the only corpus-proportional term, and it reads one
  * column of the stored hub/sat).
  *
  *   sbt "runMain graft.PipelineBench /root/testdata/sf0.1 /tmp/sf1"
  *
  * Prints one JSON line per dir plus a final ratio line (Locale.ROOT
  * formatting — the artifact must stay machine-parseable).
  */
object PipelineBench {
  private def f2(x: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, x)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineBench <smallSfDir> <bigSfDir>")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"), args(0), args(1))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runAt(dir: String): (Long, Double, Seq[Double]) = {
      val tmp = Files.createTempDirectory("graft_pipebench_").toString
      val st = ContinuousPipeline.State(s"$tmp/catalog", s"$tmp/responses", s"$tmp/repo")
      Files.createDirectories(Paths.get(st.repoDir))
      val scope = Set("hub_customer", "sat_customer", "sat_customer_sensitive")
      Files.writeString(Paths.get(s"${st.repoDir}/dv_schema.json"),
        DvGo.planJson(DvPlanner.literalPlan, "pipebench", scope))
      val cust = Tables.load(spark, dir, "customer")
      val n = cust.count()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // batch 0: the full corpus feed — corpus-sized by design
      val boot = time(ContinuousPipeline.onBatch(spark, st, "customer", cust,
        "2024-01-01 00:00:00", "b0"))
      // steady state: three CONSTANT 1000-key micro-batches of novel keys
      // (the k=0 copy's lowest keys exist at every Sf1Gen SF, so the batch
      // content is identical across dirs; keys shift far above any SF's
      // range). Materialized driver-side — a real micro-batch arrives as
      // rows, not as a plan over the corpus files.
      val base = cust.filter(col("c_custkey") <= 1000)
      val baseLocal = spark.createDataFrame(
        java.util.Arrays.asList(base.collect(): _*), base.schema)
      val steady = (1 to 3).map { i =>
        val batch = baseLocal.withColumn("c_custkey",
          col("c_custkey") + lit(500000000000L + i * 10000000L))
        time(ContinuousPipeline.onBatch(spark, st, "customer", batch,
          f"2024-02-0$i 00:00:00", s"steady_$i"))
      }
      DvLoader.deletePathQuietly(Paths.get(tmp), "pipeline bench state")
      (n, boot, steady)
    }

    val results = args.toSeq.map { dir =>
      val (n, boot, steady) = runAt(dir)
      println(s"""{"metric":"pipeline_microbatch","dir":"$dir","customer_rows":$n,""" +
        s""""bootstrap_sec":${f2(boot)},"steady_sec":[${steady.map(f2).mkString(",")}],""" +
        s""""steady_min_sec":${f2(steady.min)}}""")
      (dir, n, boot, steady.min)
    }
    val (sd, sn, sb, ss) = results.head
    val (bd, bn, bb, bs) = results.last
    println(s"""{"metric":"pipeline_microbatch_ratio","small":"$sd","big":"$bd",""" +
      s""""data_ratio":${f2(bn.toDouble / sn)},"bootstrap_ratio":${f2(bb / sb)},""" +
      s""""steady_ratio":${f2(bs / ss)}}""")
    spark.stop()
  }
}
