package graft

import graft.queries.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  private def run(name: String) = Text.defs.find(_.name == name).get.run(spark, sfDir)

  test("token counts are positive and bpe >= words") {
    val df = run("text_token_count")
    assert(df.filter(col("n_words") <= 0).count() == 0)
    assert(df.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
  }

  test("quality score in [0,1]") {
    val df = run("text_quality")
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("lang_id emits a prediction for every doc") {
    val df = run("text_lang_id")
    assert(df.filter(col("predicted_lang").isNull).count() == 0)
    assert(df.count() == Tables.load(spark, sfDir, "documents").count())
  }

  test("dedup_exact: survivors <= docs, copies sum to docs") {
    val df = run("dedup_exact")
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() <= docs)
    val total = df.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == docs)
  }
}
