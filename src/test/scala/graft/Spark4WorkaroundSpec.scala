package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the two Spark 4.1 Catalyst hazards that annIvfPq works around
  * (VERDICT r5 #6).
  *
  * Diagnosis note (r6): the runtime crash both hazards can produce
  * (INTERNAL_ERROR ATTRIBUTE_NOT_FOUND in task binding) is ExprId-
  * ALIGNMENT-dependent — whether the self-join rewrite's re-aliasing
  * collides with the lambda-bound ids depends on the JVM-global
  * NamedExpression counter state, so "the join crashes" is not a stable
  * regression signal (it reproduced or not depending on which suite ran
  * first in the shared session). These tests therefore assert the
  * hazards' deterministic envelope: each hazardous composition, WHEN it
  * executes at all, must agree row-for-row with the worked-around form —
  * and when it crashes instead, the failure must be the known binding
  * class. Either way the workaround path is proven correct, a
  * wrong-results regression fails the equality by name, and a new
  * failure class fails the classifier by name. (A "fails when Spark
  * fixes it" assert is impossible here: reproduction is a function of
  * global counter state, not Spark behavior alone.)
  */
class Spark4WorkaroundSpec extends SparkSpec {

  private def cents = Similarity.ivfCentroids(spark, sfDir)

  private def probeLive(): DataFrame =
    Similarity.qVecs(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q"),
        explode(expr(Similarity.topCellsExpr(cents, "q", Similarity.NProbe))).as("cell"))

  private def collectPairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("query_id", "cell", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def assertCrashOrMatch(hazardous: DataFrame,
                                 workaround: Set[(Long, Long, Long)], label: String): Unit =
    try {
      val live = collectPairs(hazardous)
      assert(live == workaround,
        s"$label DIVERGED from the worked-around form — the Spark defect may " +
          "have shifted from crash to wrong results")
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case e: Throwable =>
        assert(e.toString.contains("INTERNAL_ERROR") || e.toString.contains("not found") ||
          e.toString.contains("LambdaVariable") || e.toString.contains("Resolved attribute"),
          s"$label failed for an UNKNOWN reason (not the pinned binding class): $e")
    }

  private def probeMatDf() = {
    import spark.implicits._
    probeLive().collect().toSeq
      .map(r => (r.getLong(0), r.getLong(2))).toDF("query_id", "cell")
  }

  test("spark4 workaround: bare localCheckpoint join either crashes bindably or matches the scrub") {
    val probeMat = probeMatDf()
    val ck = Similarity.ivfAssignments(spark, sfDir).localCheckpoint()
    val scrubbed = spark.createDataFrame(ck.rdd, ck.schema)
    val workaround = collectPairs(
      scrubbed.join(broadcast(probeMat), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")))
    assert(workaround.nonEmpty, "workaround join produced no candidates")
    // hazardous: the checkpointed frame joined WITHOUT the rebuild — the
    // form Pq's memos avoid
    assertCrashOrMatch(
      ck.join(broadcast(probeMat), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")),
      workaround, "bare-localCheckpoint join")
  }

  test("spark4 workaround: live self-join composition either crashes bindably or matches the workaround") {
    val probeMat = probeMatDf()
    val ck = Similarity.ivfAssignments(spark, sfDir).localCheckpoint()
    val scrubbed = spark.createDataFrame(ck.rdd, ck.schema)
    val workaround = collectPairs(
      scrubbed.join(broadcast(probeMat), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")))
    assert(workaround.nonEmpty, "workaround join produced no candidates")
    // hazardous: lambda-heavy projections over the shared cached relation
    // on BOTH sides of the join — the form Pq's driver-materialized
    // probeCells avoids
    assertCrashOrMatch(
      Similarity.ivfAssignments(spark, sfDir).join(probeLive(), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")),
      workaround, "live self-join composition")
  }
}
