package graft

import graft.dv._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class GoSpec extends SparkSpec {

  test("update_context flips auto-SKIPped tables to RTD") {
    val ts = Classify.sourceTableStatus(spark, sfDir, Classify.demoContext).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[String]("status_code")).toMap
    assert(ts("documents") == "RTD")
    assert(ts("embeddings") == "RTD")
    assert(ts.values.forall(_ == "RTD")) // whole catalog deployable with context
  }

  test("source select applies include and exclude regexes") {
    val cat = Catalog.select(spark, sfDir, "^(customer|orders|lineitem)$", ".*", ".*", ".*acctbal$")
      .collect()
    val tables = cat.map(_.getAs[String]("table_name")).toSet
    assert(tables == Set("customer", "orders", "lineitem"))
    assert(!cat.exists(_.getAs[String]("column_name").endsWith("acctbal")))
  }

  test("go() materializes the vault and registers the schema") {
    val out = Files.createTempDirectory("graft_go_test").toString
    val res = DvGo.go(spark, sfDir, out)
    assert(res.objects.size == 8)
    assert(Files.exists(Paths.get(s"$out/dv_schema.json")))
    val hub = spark.read.parquet(s"$out/hub_customer")
    assert(hub.filter(col("record_source") === "SYSTEM").count() == 2)
    val sat = spark.read.parquet(s"$out/sat_customer_sensitive")
    assert(sat.columns.contains("c_name")) // sensitive split carries PII cols
    val schemaJson = Files.readString(Paths.get(s"$out/dv_schema.json"))
    assert(schemaJson.contains("\"build_id\"") && schemaJson.contains("hub"))
    val ddl = Files.readString(Paths.get(s"$out/dv_schema.sql"))
    assert(ddl.contains("CREATE TABLE hub_customer") && ddl.contains("CREATE TABLE sat_customer_sensitive")
      && ddl.contains("CREATE TABLE link_lineitem"))
  }
}
