package graft.dv

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Throwaway optimization-round phase profiler for the DV E2E operators
  * (not registered; dev tool only — DevProbe's sibling for the vault).
  */
object ProbeDv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val planWarm = t("derivedPlan")(DvGo.derivedPlan(spark, sfDir))
    require(planWarm != null)
    // go() internals, sequential, to see where the build time goes
    locally {
      import DvPlanner._
      val p = DvGo.derivedPlan(spark, sfDir)
      val neededCols: Map[String, Seq[String]] =
        (p.hubs.flatMap(h => h.sources.map(src => src.table -> src.parts.map(_.name))) ++
          p.sats.map(tt => tt.sourceTable -> (tt.bkParts ++ tt.descriptors).map(_.name)) ++
          p.links.map(l => l.sourceTable -> (l.members.flatMap(_.parts) ++ l.degenerate).map(_.name)))
          .groupBy(_._1).map { case (tb, cs) => tb -> cs.flatMap(_._2).distinct.toSeq }
      val shared = neededCols.map { case (tb, cs) =>
        tb -> Tables.load(spark, sfDir, tb).select(cs.map(col): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      t("shared persists (count each)")(shared.values.foreach(_.count()))
      val builds: Seq[(String, org.apache.spark.sql.DataFrame)] =
        p.hubs.map(h => s"hub_${h.spec.name}" -> DvBuild.hubMultiFrom(spark, h.spec,
          h.sources.map(src => (src.table, shared(src.table), src.parts)), DvDefaults.LoadTs,
          ordered = false)) ++
          p.sats.map(tt => s"sat_${tt.name}" ->
            DvBuild.satFrom(shared(tt.sourceTable), tt, DvDefaults.LoadTs, ordered = false)) ++
          p.links.map(l => s"link_${l.name}" ->
            DvBuild.linkFrom(shared(l.sourceTable), l, DvDefaults.LoadTs, ordered = false))
      val outp = java.nio.file.Files.createTempDirectory("probe_dv_seq_").toString
      builds.foreach { case (name, df) =>
        t(s"write plain $name")(df.write.mode("overwrite").parquet(s"$outp/$name"))
      }
      val outb = java.nio.file.Files.createTempDirectory("probe_dv_seqb_").toString
      val prefix = DvGo.tablePrefix(outb)
      builds.foreach { case (name, df) =>
        val keys = DvGo.bucketKeys(p, name)
        t(s"write bucketed $name")(
          df.repartition(16, keys.map(col): _*)
            .write.mode("overwrite").format("parquet")
            .bucketBy(16, keys.head, keys.tail: _*)
            .sortBy(keys.head, keys.tail: _*)
            .option("path", s"$outb/$name")
            .saveAsTable(s"$prefix$name"))
      }
      spark.catalog.listTables().collect().map(_.name).filter(_.startsWith(prefix))
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
      shared.values.foreach(_.unpersist())
      DvLoader.deletePathQuietly(java.nio.file.Paths.get(outp), "probe seq")
      DvLoader.deletePathQuietly(java.nio.file.Paths.get(outb), "probe seqb")
    }
    // single-exchange bucketed sat write: repartition on (hk, hd) BEFORE a
    // groupBy(hk, hd) dedup — the agg preserves the partitioning, so the
    // bucketed writer needs no second exchange. vs the current
    // distinct-then-repartition two-exchange shape.
    locally {
      import graft.functions.GraftFunctions.{canon, dvHash}
      val p = DvGo.derivedPlan(spark, sfDir)
      val spec = p.sats.find(_.name == "lineitem").get
      val src = Tables.load(spark, sfDir, spec.sourceTable)
        .select((spec.bkParts ++ spec.descriptors).map(_.name).distinct.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      src.count()
      val hk = dvHash(spec.bkParts.map(pp => canon(col(pp.name), pp.typeName))).as(spec.hkName)
      val hd = dvHash(spec.descriptors.map(d => canon(col(d.name), d.typeName))).as(spec.hdName)
      def projected = src.select((hk +: hd +: spec.descriptors.map(d => col(d.name))): _*)
      def twoEx = DvBuild.satFrom(src, spec, ordered = false)
        .repartition(16, col(spec.hkName), col(spec.hdName))
      def oneEx = projected
        .repartition(16, col(spec.hkName), col(spec.hdName))
        .groupBy(col(spec.hkName), col(spec.hdName))
        .agg(spec.descriptors.map(d => first(col(d.name)).as(d.name)).head,
          spec.descriptors.map(d => first(col(d.name)).as(d.name)).tail: _*)
        .select((col(spec.hkName) +: lit(DvDefaults.LoadTs).as("load_ts") +:
          lit(DvDefaults.recordSource(spec.sourceTable)).as("record_source") +:
          col(spec.hdName) +: spec.descriptors.map(d => col(d.name))): _*)
      println("[probe] oneEx exchanges: " + oneEx.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange")))
      println("[probe] twoEx exchanges: " + twoEx.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange")))
      (1 to 3).foreach { i =>
        def w(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val o = java.nio.file.Files.createTempDirectory(s"probe_${tag}_").toString
          val pr = s"probe_${tag}_${java.lang.Long.toHexString(System.nanoTime())}"
          t(s"$tag write $i")(
            df.write.mode("overwrite").format("parquet")
              .bucketBy(16, spec.hkName, spec.hdName).sortBy(spec.hkName, spec.hdName)
              .option("path", s"$o/sat").saveAsTable(pr))
          spark.sql(s"DROP TABLE IF EXISTS $pr")
          DvLoader.deletePathQuietly(java.nio.file.Paths.get(o), "probe")
        }
        w("twoEx", twoEx); w("oneEx", oneEx)
      }
      src.unpersist()
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      // goBucketedE2E phase by phase
      val out = java.nio.file.Files.createTempDirectory("probe_dv_bkt_").toString
      val prefix = DvGo.tablePrefix(out)
      val res = t("go(bucketed,16)")(DvGo.go(spark, sfDir, out, bucketed = true, buckets = 16))
      val shifted = Tables.load(spark, sfDir, "customer")
        .withColumn("c_custkey", col("c_custkey") + lit(100000000L))
      t("stream load 1 (novel)")(
        DvLoader.streamTableLoadBatch(spark, shifted, "customer", out, "2024-02-01 00:00:00"))
      t("stream load 2 (idem)")(
        DvLoader.streamTableLoadBatch(spark, shifted, "customer", out, "2024-02-02 00:00:00"))
      t("compact x3 (concurrent)") {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val objs = Seq("hub_customer", "sat_customer", "sat_customer_sensitive")
        Await.result(
          Future.sequence(objs.map(o => Future(DvMaintenance.compactBucketed(spark, out, o)))),
          Duration.Inf)
      }
      t("final counts") {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence(res.objects.map(_._1).sorted.map { obj =>
          Future(obj -> spark.table(s"$prefix$obj").count())
        }), Duration.Inf)
      }
      t("cleanup") {
        spark.catalog.listTables().collect().map(_.name).filter(_.startsWith(prefix))
          .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
        DvLoader.deletePathQuietly(java.nio.file.Paths.get(out), "probe vault")
      }
      // plain go() (dv_go_build) for comparison
      val out2 = java.nio.file.Files.createTempDirectory("probe_dv_plain_").toString
      t("go(plain)")(DvGo.go(spark, sfDir, out2))
      t("cleanup plain")(DvLoader.deletePathQuietly(java.nio.file.Paths.get(out2), "probe plain"))
    }
    spark.stop()
  }
}
