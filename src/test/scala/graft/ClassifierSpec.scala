package graft

import graft.dv._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  test("mid-queue classifier surfaces 'Queued for Processing' for unanswered columns") {
    val queued = QueuedClassifier(RulesClassifier, col("ordinal") <= 2)
    val df = Classify.sourceColumnStatus(spark, sfDir, classifier = queued).cache()
    val q = df.filter(col("status") === "Queued for Processing")
    assert(q.count() > 0)
    // exactly the unanswered columns are queued, with '-' responses
    assert(q.filter(col("ordinal") <= 2).count() == 0)
    assert(df.filter(col("ordinal") > 2 && col("status") =!= "Queued for Processing").count() == 0)
    assert(q.filter(col("status_response") =!= "-").count() == 0)
    assert(q.filter(col("confidence").isNotNull).count() == 0)
    // table rollup reports the queue
    val t = Classify.sourceTableStatus(spark, sfDir, classifier = queued)
    assert(t.filter(col("status_code") === "QUEUE").count() > 0)
  }

  test("the seam accepts any Classifier implementation") {
    // a trivial third implementation: everything is a confident Descriptor
    object AllDesc extends Classifier {
      val name = "all-desc-v0"
      def respond(df: DataFrame): DataFrame = df
        .withColumn("category", lit(Classify.CatDesc))
        .withColumn("confidence", lit(0.99))
        .withColumn("reason", lit("mock"))
    }
    val df = Classify.sourceColumnStatus(spark, sfDir, classifier = AllDesc)
    // no BK parts anywhere -> every column plain Ready to Deploy
    assert(df.filter(col("status") =!= "Ready to Deploy").count() == 0)
    assert(df.filter(!col("status_response").contains("all-desc-v0")).count() == 0)
  }

  test("raw model JSON responses drive classification; missing responses queue") {
    import spark.implicits._
    // the transformer_responses analogue: raw model JSON per (table, column)
    val responses = Seq(
      ("customer", "c_custkey",
        """{"Category": "Business Key Part", "Confidence Value": 0.92, "Reason": "Primary identifier for the customer entity."}"""),
      ("customer", "c_name",
        """{"Category": "Descriptor - Sensitive", "Confidence Value": 0.88, "Reason": "Personal name is PII."}"""))
      .toDF("table_name", "column_name", "response_json")
    val df = Classify.sourceColumnStatus(spark, sfDir,
      classifier = JsonResponseClassifier(responses)).cache()
    val answered = df.filter(col("table_name") === "customer" &&
      col("column_name").isin("c_custkey", "c_name"))
    assert(answered.filter(col("status") === "Queued for Processing").count() == 0)
    assert(answered.filter(col("column_name") === "c_custkey")
      .collect()(0).getAs[Double]("confidence") == 0.92)
    // everything the model has not answered yet is queued
    val rest = df.filter(!(col("table_name") === "customer" &&
      col("column_name").isin("c_custkey", "c_name")))
    assert(rest.filter(col("status") =!= "Queued for Processing").count() == 0)
  }

  test("confidence threshold is configurable and flips statuses at 0.9") {
    val strict = Classify.sourceColumnStatus(spark, sfDir, threshold = 0.90)
    val default = Classify.sourceColumnStatus(spark, sfDir)
    // repeating business keys score 0.85: accepted at 0.80, held at 0.90
    val flipped = strict.as("s")
      .join(default.as("d"), Seq("table_name", "column_name"))
      .filter(col("s.status") =!= col("d.status"))
    assert(flipped.count() > 0)
    assert(strict.filter(col("status") === "Requires Attention").count() >
      default.filter(col("status") === "Requires Attention").count())
  }

  test("session conf selects classifier, model name, and threshold in one place") {
    // defaults: rules engine at 0.80
    assert(DvConfig.threshold(spark) == 0.80)
    assert(DvConfig.classifier(spark) == RulesClassifier)
    try {
      // threshold GUC flips statuses exactly like the explicit parameter
      spark.conf.set(DvConfig.ThresholdKey, "0.90")
      val viaConf = DvConfig.sourceColumnStatus(spark, sfDir)
      val viaParam = Classify.sourceColumnStatus(spark, sfDir, threshold = 0.90)
      assert(viaConf.exceptAll(viaParam).count() == 0)
      assert(viaParam.exceptAll(viaConf).count() == 0)
      // classifier GUC swaps in the JSON-responses client from a path
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_resp").toString
      Seq(("customer", "c_custkey",
        """{"Category": "Business Key Part", "Confidence Value": 0.92, "Reason": "Primary identifier."}"""))
        .toDF("table_name", "column_name", "response_json")
        .write.mode("overwrite").json(s"$tmp/responses")
      spark.conf.set(DvConfig.ClassifierKey, s"json:$tmp/responses")
      spark.conf.set(DvConfig.ModelKey, "recorded-run-7")
      val df = DvConfig.sourceColumnStatus(spark, sfDir).cache()
      val answered = df.filter(col("column_name") === "c_custkey" && col("table_name") === "customer")
      assert(answered.collect()(0).getAs[Double]("confidence") == 0.92)
      assert(answered.collect()(0).getAs[String]("status_response").contains("recorded-run-7"))
      assert(df.filter(col("status") === "Queued for Processing").count() == df.count() - 1)
      DvLoader.deletePath(java.nio.file.Paths.get(tmp))
    } finally {
      spark.conf.unset(DvConfig.ThresholdKey)
      spark.conf.unset(DvConfig.ClassifierKey)
      spark.conf.unset(DvConfig.ModelKey)
    }
  }

  test("multi-schema catalog: schema patterns filter the selection") {
    val staging = Catalog.select(spark, sfDir, ".*", ".*", "^$", "^$", schemaInclude = "^staging$")
    assert(staging.select("table_name").distinct().count() == 3)
    assert(staging.filter(col("schema_name") =!= "staging").count() == 0)
    val source = Catalog.select(spark, sfDir, ".*", ".*", "^$", "^$", schemaExclude = "^staging$")
    assert(source.filter(col("schema_name") === "staging").count() == 0)
  }
}
