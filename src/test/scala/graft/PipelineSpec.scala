package graft

import graft.dv._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The composed background loop (bgw_init analogue): source change →
  * CatalogScd2 merge → re-classify only what drifted → schema-driven
  * incremental vault load, with NO manual steps. Two micro-batches, the
  * second carrying a mid-stream schema drift (c_acctbal re-typed varchar).
  */
class PipelineSpec extends SparkSpec {

  test("continuous pipeline: two micro-batches with a schema drift land correct vault rows") {
    val tmp = Files.createTempDirectory("graft_pipeline").toString
    val st = ContinuousPipeline.State(s"$tmp/catalog", s"$tmp/responses", s"$tmp/repo")
    Files.createDirectories(Paths.get(st.repoDir))
    val scope = Set("hub_customer", "sat_customer", "sat_customer_sensitive")
    Files.writeString(Paths.get(s"${st.repoDir}/dv_schema.json"),
      DvGo.planJson(DvPlanner.literalPlan, "pipeline", scope))

    val cust = Tables.load(spark, sfDir, "customer")
    val evens = cust.filter(col("c_custkey") % 2 === 0)

    // ---- batch 0 rides a LIVE streaming trigger
    val src = s"$tmp/incoming"
    evens.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(cust.schema).parquet(src)
    val q = ContinuousPipeline.sink(stream, "customer", st, s"$tmp/ckpt").start()
    q.processAllAvailable()
    q.stop()

    val t0 = "2024-01-01 00:00:00"
    val cat0 = spark.read.parquet(st.catalogDir)
    assert(cat0.filter(col("current_flag") === "Y").count() == 5)
    assert(cat0.filter(col("valid_from") =!= t0).count() == 0)
    val resp0 = spark.read.parquet(st.responsesDir)
    assert(resp0.count() == 5 && resp0.filter(col("classified_at") =!= t0).count() == 0)
    val nEvens = evens.select("c_custkey").distinct().count()
    assert(spark.read.parquet(s"${st.repoDir}/hub_customer").count() == nEvens + 2)
    assert(spark.read.parquet(s"${st.repoDir}/sat_customer").count() == nEvens)

    // ---- batch 1: full feed, c_acctbal re-typed varchar (schema drift —
    // reaches a pipeline as a redeployed query, so it drives the same hook)
    val t1 = "2024-02-01 00:00:00"
    val drifted = cust.withColumn("c_acctbal", col("c_acctbal").cast("string"))
    ContinuousPipeline.onBatch(spark, st, "customer", drifted, t1, "drift_1")

    val cat1 = spark.read.parquet(st.catalogDir)
    val acct = cat1.filter(col("column_name") === "c_acctbal").collect()
    assert(acct.length == 2) // closed double version + current varchar version
    val current = acct.find(_.getAs[String]("current_flag") == "Y").get
    assert(current.getAs[String]("data_type") == "varchar" &&
      current.getAs[String]("valid_from") == t1)
    assert(acct.find(_.getAs[String]("current_flag") == "N").get.getAs[String]("valid_to") == t1)
    // every other column kept its first version
    assert(cat1.filter(col("column_name") =!= "c_acctbal" && col("valid_from") === t0)
      .count() == 4)
    // ONLY the drifted column re-entered the classifier
    val resp1 = spark.read.parquet(st.responsesDir)
    assert(resp1.filter(col("classified_at") === t1).collect()
      .map(_.getAs[String]("column_name")).toSeq == Seq("c_acctbal"))
    assert(resp1.filter(col("classified_at") === t0).count() == 4)
    // the vault grew by exactly the odd keys, and the drifted values were
    // conformed to the vault's declared double type
    val nAll = cust.select("c_custkey").distinct().count()
    assert(spark.read.parquet(s"${st.repoDir}/hub_customer").count() == nAll + 2)
    val sens = spark.read.parquet(s"${st.repoDir}/sat_customer_sensitive")
    assert(sens.schema("c_acctbal").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sens.count() == nAll)
    val cat1Count = cat1.count() // before the replay rewrites the directory

    // ---- replay of the drifted feed: no drift, no reclassification, no growth
    ContinuousPipeline.onBatch(spark, st, "customer", drifted, "2024-03-01 00:00:00", "drift_2")
    assert(spark.read.parquet(st.catalogDir).count() == cat1Count)
    assert(spark.read.parquet(st.responsesDir)
      .filter(col("classified_at") === "2024-03-01 00:00:00").count() == 0)
    assert(spark.read.parquet(s"${st.repoDir}/hub_customer").count() == nAll + 2)
    assert(spark.read.parquet(s"${st.repoDir}/sat_customer_sensitive").count() == nAll)

    DvLoader.deletePath(Paths.get(tmp))
  }
}
