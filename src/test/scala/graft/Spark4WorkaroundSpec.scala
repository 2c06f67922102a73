package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the two Spark 4.1 Catalyst defects that annIvfPq works around
  * (VERDICT r5 #6). Each test asserts BOTH halves by name:
  *   (a) the hazardous composition still fails — if a Spark upgrade fixes
  *       the bug, the `intercept` fails and tells us the workaround in
  *       Pq.scala can be retired;
  *   (b) the workaround form succeeds — if an upgrade re-breaks it
  *       differently, the positive half fails.
  * Both defects involve HOF-lambda-heavy projections derived from one
  * shared cached relation (the memoized qVecs).
  */
class Spark4WorkaroundSpec extends SparkSpec {

  test("spark4 workaround: self-join attribute rewrite loses HOF lambda refs (live probe side)") {
    val cents = Similarity.ivfCentroids(spark, sfDir)
    // probe side LIVE (the form annIvfPq avoids by driver-materializing
    // probeCells): explode(topCells) lambda projection over cached qVecs
    val probeLive = Similarity.qVecs(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q"),
        explode(expr(Similarity.topCellsExpr(cents, "q", Similarity.NProbe))).as("cell"))
    // corpus side: the argmax lambda projection over the SAME cached qVecs
    val assignLive = Similarity.ivfAssignments(spark, sfDir)
    val hazardous = assignLive.join(probeLive, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val failed =
      try { hazardous.count(); false }
      catch { case e: Throwable =>
        assert(e.toString.contains("INTERNAL_ERROR") || e.toString.contains("not found") ||
          e.toString.contains("LambdaVariable") || e.toString.contains("Resolved attribute"),
          s"hazard failed for an unexpected reason: $e")
        true
      }
    assert(failed,
      "the self-join lambda-loss hazard no longer reproduces — Spark may have " +
        "fixed it; consider retiring the driver-materialized probeCells in Pq.annIvfPq")
    // workaround form (the real op's shape): probe side driver-
    // materialized AND assignment side constraint-scrubbed — leaving the
    // assignment live would instead trip the constraint-leak defect the
    // second test pins
    import spark.implicits._
    val probeMat = probeLive.collect().toSeq.map(r => (r.getLong(0), r.getLong(2)))
      .toDF("query_id", "cell")
    val ck = assignLive.localCheckpoint()
    val scrubbed = spark.createDataFrame(ck.rdd, ck.schema)
    val n = scrubbed.join(broadcast(probeMat), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id")).count()
    assert(n > 0, "workaround join produced no candidates")
  }

  test("spark4 workaround: localCheckpoint leaks origin-plan constraints into join binding") {
    import spark.implicits._
    val probeMat = {
      val cents = Similarity.ivfCentroids(spark, sfDir)
      Similarity.qVecs(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          explode(expr(Similarity.topCellsExpr(cents, "q", Similarity.NProbe))).as("cell"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
        .toDF("query_id", "cell")
    }
    // hazardous: localCheckpoint alone — the LogicalRDD keeps the origin
    // plan's constraints, whose cell-defining argmax references the cached
    // q attribute the RDD no longer outputs; InferFiltersFromConstraints
    // then pushes it across the equi-join and binding crashes
    val ck = Similarity.ivfAssignments(spark, sfDir).localCheckpoint()
    val hazardous = ck.join(broadcast(probeMat), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val failed =
      try { hazardous.count(); false }
      catch { case e: Throwable =>
        assert(e.toString.contains("INTERNAL_ERROR") || e.toString.contains("not found") ||
          e.toString.contains("ATTRIBUTE_NOT_FOUND") || e.toString.contains("Resolved attribute"),
          s"hazard failed for an unexpected reason: $e")
        true
      }
    assert(failed,
      "the constraint-leak hazard no longer reproduces — Spark may have fixed " +
        "SPARK's LogicalRDD constraint carry-over; consider dropping the " +
        "createDataFrame(rdd, schema) rebuild in Pq.annIvfPq's memos")
    // workaround form: rebuild from the materialized rows — constraints
    // scrubbed, join binds and returns candidates
    val scrubbed = spark.createDataFrame(ck.rdd, ck.schema)
    val n = scrubbed.join(broadcast(probeMat), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id")).count()
    assert(n > 0, "workaround join produced no candidates")
  }
}
