package graft

import graft.dv._
import org.apache.spark.sql.functions._

/** The drift→replan loop (Replan.replanDrift): catalog SCD2 detection feeds
  * plan re-derivation feeds per-object rebuild decisions.
  */
class ReplanSpec extends SparkSpec {

  private lazy val rows = Replan.replanDrift(spark, sfDir).collect()

  test("exactly the two canon-class-changing drifts trigger rebuilds") {
    val rebuilds = rows.filter(_.getAs[String]("action") == "rebuild")
      .map(r => (r.getAs[String]("object_type"), r.getAs[String]("object_name"),
        r.getAs[String]("drifted_cols"))).toSet
    // events.ts bigint→timestamp (the real round-5 testdata re-type)
    // invalidates the events satellite's hash-diff; c_acctbal
    // double→varchar invalidates the sensitive customer satellite. No hub
    // or link carries either column, so everything else keeps.
    assert(rebuilds == Set(("sat", "events", "ts"),
      ("sat", "customer_sensitive", "c_acctbal")))
  }

  test("every object of the full-catalog plan is decided, most keep") {
    assert(rows.length == DvPlanner.expectedCatalogPlan.length)
    assert(rows.count(_.getAs[String]("action") == "keep") == rows.length - 2)
  }

  test("a rebuild always names the drifted hash input it carries") {
    rows.foreach { r =>
      val action = r.getAs[String]("action")
      val drifted = r.getAs[String]("drifted_cols")
      assert((action == "rebuild") == drifted.nonEmpty,
        s"${r.getAs[String]("object_name")}: action=$action drifted='$drifted'")
      if (action == "rebuild")
        drifted.split('+').foreach(c => assert(r.getAs[String]("pre_sig").contains(c)))
    }
  }

  test("pre/post object sets are identical — drift re-types, it does not remodel") {
    // name signals drive the object set; a type drift must only change
    // signatures, otherwise keep/rebuild would silently drop objects in
    // the inner join
    val pre = DvPlanner.planFromClassification(spark, sfDir, DvPlanner.FullScope,
      Classify.demoContext ++ DvPlanner.goContext, typeOverride = Replan.PreTypes)
    val post = DvPlanner.planFromClassification(spark, sfDir, DvPlanner.FullScope,
      Classify.demoContext ++ DvPlanner.goContext, typeOverride = Replan.PostTypes)
    assert(pre.objectNames == post.objectNames)
  }
}
