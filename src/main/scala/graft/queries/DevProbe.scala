package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway optimization-round step profiler (not registered; removed or
  * kept as a dev tool — never part of the query registry).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("PROBE_WSCG", "true"))
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm the memos the op would find warm in the bench
    t("warm qVecs")(Similarity.qVecs(spark, sfDir).count())
    val cents = t("warm storedCentroids")(Similarity.ivfStoredCentroids(spark, sfDir))
    val exprStr = t("build exprStr")(Similarity.topCellsExpr(cents, "q", 8))
    println(s"[probe] exprStr length ${exprStr.length}")
    val parsed = t("expr() parse")(expr(exprStr))
    val qv = Similarity.qVecs(spark, sfDir)
    t("select+count 1")(qv.select(parsed.as("cells")).count())
    t("select+count 2")(qv.select(parsed.as("cells")).count())
    t("assign count 1")(Similarity.assignCells(qv, cents).count())
    t("assign count 2")(Similarity.assignCells(qv, cents).count())
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("assign noop 1")(noop(Similarity.assignCells(qv, cents)))
    t("assign noop 2")(noop(Similarity.assignCells(qv, cents)))
    t("topcells noop")(noop(qv.select(parsed.as("cells"))))
    t("qv noop")(noop(qv))
    println(s"[probe] qv partitions ${qv.rdd.getNumPartitions}")
    t("range(1).count x5")((1 to 5).foreach(_ => spark.range(1).count()))
    t("qv.count x5")((1 to 5).foreach(_ => qv.count()))
    t("qv groupBy agg x3")((1 to 3).foreach(_ =>
      qv.groupBy(col("vec_id") % 7).count().collect()))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("noAQE qv groupBy agg x3")((1 to 3).foreach(_ =>
      qv.groupBy(col("vec_id") % 7).count().collect()))
    t("noAQE assign count x2")((1 to 2).foreach(_ =>
      Similarity.assignCells(qv, cents).count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val out = java.nio.file.Files.createTempDirectory("probe_ivf_").toString
      val prefix = s"probe_ivfrt_${java.lang.Long.toHexString(System.nanoTime())}_"
      val vecs = Similarity.qVecs(spark, sfDir)
      t("init")(graft.dv.IvfIndexRepo.init(spark, out,
        Similarity.ivfStoredCentroids(spark, sfDir), prefix, buckets = 8))
      t("appendBatch")(graft.dv.IvfIndexRepo.appendBatch(spark, out, vecs, "t0"))
      t("retrain.train") {
        Similarity.trainCentroidsFrom(vecs.select(col("vec_id"), col("q")))
      }
      t("retrain.train narrow") {
        Similarity.trainCentroidsFromNarrow(vecs.select(col("vec_id"), col("q")))
      }
      t("retrainIvf(all)")(graft.dv.IvfIndexRepo.retrainIvf(spark, out, vecs))
      t("read+sort+lc") {
        graft.dv.IvfIndexRepo.storedIndex(spark, out)
          .select(col("vec_id"), col("cell")).orderBy("vec_id")
          .localCheckpoint().count()
      }
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}ivf_index")
      graft.dv.DvLoader.deletePathQuietly(java.nio.file.Paths.get(out), "probe")
    }
    spark.stop()
  }
}
