package graft

import graft.dv._
import graft.dv.PromptBuilder._
import org.apache.spark.sql.functions._

/** Request side of the transformer seam (prompt_template.rs +
  * bgw_transformer_client.rs): the rendered prompt carries the reference's
  * structure — table JSON block, column-detail strings, response schema,
  * interpolation tail — and a response written against it parses back
  * through JsonResponseClassifier, closing the request→response loop.
  */
class PromptSpec extends SparkSpec {

  test("column-detail strings match the reference's generated format") {
    assert(columnDetail(PromptColumn(1, "c_custkey", "bigint", isPrimaryKey = true)) ==
      "Column No: 1 Named: c_custkey of type: bigint And is a primary key.Column Comments: NA")
    assert(columnDetail(PromptColumn(2, "c_name", "varchar", isPrimaryKey = false)) ==
      "Column No: 2 Named: c_name of type: varchar Column Comments: NA")
  }

  test("rendered prompt carries the reference template structure") {
    val p = requestsForTable("customer")
      .collectFirst { case ("BKComponentIdentification", 1, text) => text }.get
    // the system/task block
    assert(p.contains("Task Title: Business Key Component Identification"))
    assert(p.contains("Confidence Value"))
    // the JSON Source Table Object block with every column in ordinal order
    assert(p.contains("\"Schema Name\": \"source\""))
    assert(p.contains("\"Table Name\": \"customer\""))
    val detailIdx = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .map(c => p.indexOf(s"Named: $c"))
    assert(detailIdx.forall(_ >= 0) && detailIdx == detailIdx.sorted)
    // the response-JSON schema the client decodes
    assert(p.contains("\"Business Key Component Identification\""))
    assert(p.contains("\"Is Business Key Component\""))
    // the interpolation tail: the column under evaluation comes last
    assert(p.trim.endsWith("Column No: 1"))
  }

  test("bgw request plan: BKName only for key-identified columns") {
    val reqs = requestsForTable("customer")
    val byTemplate = reqs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byTemplate("BKComponentIdentification") == Seq(1, 2, 3, 4, 5))
    assert(byTemplate("DescriptorSensitive") == Seq(1, 2, 3, 4, 5))
    // c_custkey (1) and c_nationkey (3) are the key-named columns
    assert(byTemplate("BKName") == Seq(1, 3))
  }

  test("a response to the rendered request parses through JsonResponseClassifier") {
    import spark.implicits._
    // the model answers with exactly the schema the prompt demands
    val p = requestsForTable("customer")
      .collectFirst { case ("BKComponentIdentification", 1, text) => text }.get
    assert(p.contains(responseSchemaJson(BKComponentIdentification).linesIterator.next()))
    val raw =
      """{"Category": "Business Key Part", "Confidence Value": 0.93, "Reason": "primary key"}"""
    val responses = Seq(("customer", "c_custkey", raw))
      .toDF("table_name", "column_name", "response_json")
    val out = JsonResponseClassifier(responses)
      .respond(Classify.catalogProfile(spark, sfDir))
      .filter(col("table_name") === "customer" && col("column_name") === "c_custkey")
      .select("category", "confidence").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "Business Key Part" && out(0).getDouble(1) == 0.93)
  }
}
