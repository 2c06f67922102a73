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

  test("drift re-scan re-classifies ONLY the drifted column, preserving the rest") {
    import graft.dv.Reclassify
    val out = Reclassify.reclassifyDrift(spark, sfDir).collect()
    val drifted = out.filter(_.getAs[String]("classified_at") == Reclassify.T2)
    assert(drifted.length == 1)
    assert(drifted(0).getAs[String]("table_name") == "customer")
    assert(drifted(0).getAs[String]("column_name") == "c_acctbal")
    assert(drifted(0).getAs[String]("data_type") == "varchar") // the new version
    // every other column keeps its first-scan response and original type
    val kept = out.filter(_.getAs[String]("classified_at") == Reclassify.T1)
    assert(kept.length == out.length - 1)
    assert(kept.forall(_.getAs[Double]("confidence") > 0.0))
    // the carried-forward rows equal the first-scan classification verbatim
    val v1 = graft.dv.RulesClassifier.respond(graft.dv.Classify.catalogProfile(spark, sfDir))
      .select("table_name", "column_name", "category", "confidence").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getDouble(3))).toMap
    kept.foreach { r =>
      val k = (r.getAs[String]("table_name"), r.getAs[String]("column_name"))
      assert(v1(k) == ((r.getAs[String]("category"), r.getAs[Double]("confidence"))), s"$k changed")
    }
  }
}
