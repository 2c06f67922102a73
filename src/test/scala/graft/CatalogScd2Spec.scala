package graft

import graft.dv.{Catalog, CatalogScd2}
import org.apache.spark.sql.functions._

class CatalogScd2Spec extends SparkSpec {

  test("catalog SCD2: change closes old version, drop flags deleted, add opens") {
    val snapA = Catalog.introspect(spark, sfDir)
      .select("table_name", "column_name", "ordinal", "data_type")
    val state0 = CatalogScd2.init(snapA, "t0")
    assert(state0.filter(col("current_flag") === "Y").count() == snapA.count())

    // simulate a re-scan: c_acctbal type widened, c_mktsegment dropped, c_note added
    val snapB = snapA
      .withColumn("data_type", when(col("column_name") === "c_acctbal", "decimal").otherwise(col("data_type")))
      .filter(col("column_name") =!= "c_mktsegment")
      .unionByName(spark.createDataFrame(Seq(("customer", "c_note", 6, "varchar")))
        .toDF("table_name", "column_name", "ordinal", "data_type"))

    val state1 = CatalogScd2.merge(state0, snapB, "t1")

    val acct = state1.filter(col("column_name") === "c_acctbal").orderBy("valid_from").collect()
    assert(acct.length == 2)
    assert(acct.exists(r => r.getAs[String]("current_flag") == "N" && r.getAs[String]("valid_to") == "t1"))
    assert(acct.exists(r => r.getAs[String]("current_flag") == "Y" && r.getAs[String]("data_type") == "decimal"))

    val seg = state1.filter(col("column_name") === "c_mktsegment").collect()
    assert(seg.length == 1 && seg(0).getAs[String]("deleted_flag") == "Y")

    val note = state1.filter(col("column_name") === "c_note").collect()
    assert(note.length == 1 && note(0).getAs[String]("current_flag") == "Y")

    // resurrect: merge snapA again -> c_mktsegment undeleted, c_note deleted
    val state2 = CatalogScd2.merge(state1, snapA, "t2")
    val seg2 = state2.filter(col("column_name") === "c_mktsegment" && col("current_flag") === "Y").collect()
    assert(seg2.length == 1 && seg2(0).getAs[String]("deleted_flag") == "N")
    // type back: the decimal version closes, a fresh double version opens
    val acct2 = state2.filter(col("column_name") === "c_acctbal" && col("current_flag") === "Y").collect()
    assert(acct2.length == 1 && acct2(0).getAs[String]("data_type") == "double")
  }
}
