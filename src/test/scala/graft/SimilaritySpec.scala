package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("graft_cosine is registered via extensions and matches the HOF formulation") {
    val df = Tables.load(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    df.createOrReplaceTempView("e50")
    val both = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS native,
        |  aggregate(sequence(1, 64), cast(0 as double),
        |    (acc, i) -> acc + cast(element_at(a.embedding, i) as double) * cast(element_at(b.embedding, i) as double))
        |  / (sqrt(aggregate(sequence(1, 64), cast(0 as double),
        |       (acc, i) -> acc + cast(element_at(a.embedding, i) as double) * cast(element_at(a.embedding, i) as double)))
        |   * sqrt(aggregate(sequence(1, 64), cast(0 as double),
        |       (acc, i) -> acc + cast(element_at(b.embedding, i) as double) * cast(element_at(b.embedding, i) as double)))) AS hof
        |FROM e50 a JOIN e50 b ON a.vec_id < b.vec_id""".stripMargin)
    assert(both.filter(col("native") =!= col("hof")).count() == 0) // bit-identical
  }

  test("cosine of a vector with itself folds to exactly 1.0 via the optimizer rule") {
    val df = Tables.load(spark, sfDir, "embeddings").limit(10)
    val q = df.select(graft.functions.GraftColumns.graftCosine(col("embedding"), col("embedding")).as("c"))
    assert(q.queryExecution.optimizedPlan.toString.contains("1.0"))
    q.collect().map(_.getDouble(0)).foreach(c => assert(c == 1.0))
  }

  test("knn returns TopK neighbors per query, self excluded") {
    val knn = Similarity.defs.find(_.name == "knn_cosine").get.run(spark, sfDir)
    val bad = knn.filter(col("query_id") === col("neighbor_id")).count()
    assert(bad == 0)
    val perQuery = knn.groupBy("query_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(perQuery <= 5)
  }

  test("dedup_embed_cosine banded plan reproduces the exact all-pairs result (recall 1.0)") {
    val banded = Similarity.defs.find(_.name == "dedup_embed_cosine").get.run(spark, sfDir)
    val exact = Similarity.embedDedupAllPairs(spark, sfDir)
    assert(exact.count() > 0)
    assert(banded.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(banded).count() == 0)
  }

  test("dedup_embed_cosine executes a bucket equi-join, not a cartesian product") {
    val plan = Similarity.defs.find(_.name == "dedup_embed_cosine").get
      .run(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("trained IVF cells are balanced (max cell <= 4x mean)") {
    val cells = Similarity.ivfAssignments(spark, sfDir)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val mean = cells.sum.toDouble / cells.length
    assert(cells.max <= 4 * mean, s"max=${cells.max} mean=$mean cells=${cells.toSeq}")
  }

  test("ann candidates share the query's bucket") {
    val ann = Similarity.defs.find(_.name == "ann_cosine_lsh").get.run(spark, sfDir)
    assert(ann.count() > 0)
    assert(ann.filter(col("rank") > 3).count() == 0)
  }
}
