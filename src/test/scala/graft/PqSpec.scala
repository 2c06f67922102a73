package graft

import graft.queries.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def run(name: String) = Pq.defs.find(_.name == name).get.run(spark, sfDir)

  test("pq codes: M codes per vector, each a trained cell label") {
    val codes = run("emb_pq_codes").cache()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(codes.count() == n * Pq.M)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= Pq.M).count() == 0)
    // codes are the TRAINED CELL LABELS (seed vec_ids), not assumed-dense
    // [0, K) indices — the contract the vec_id-labeled cells establish
    val cells = Pq.pqCodebooks(spark, sfDir).head.map(_._1.toInt).toSet
    assert(cells.nonEmpty && cells.size <= Pq.K)
    assert(codes.filter(!col("code").isin(cells.toSeq: _*)).count() == 0)
    // non-degenerate codebooks: every subspace actually spreads vectors
    // over multiple of its trained cells (an all-one-cell codebook is a
    // hollow quantizer)
    val spread = codes.groupBy("m").agg(countDistinct("code").as("k_used"))
      .collect().map(r => r.getAs[Int]("m") -> r.getAs[Long]("k_used")).toMap
    assert(spread.size == Pq.M && spread.values.forall(_ >= cells.size / 2),
      s"code spread: $spread of ${cells.size} cells")
  }

  test("ADC search recalls a meaningful share of the exact L2 top-5") {
    val ann = run("ann_l2_pq").cache()
    assert(ann.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(ann.groupBy("query_id").count().agg(max("count")).collect()(0).getLong(0) <= Pq.PqTopK)
    // exact integer L2 over the same fixed-point vectors — constants come
    // from the operator under test so the ground truth cannot drift
    val q = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr(s"transform(embedding, e -> cast(floor(cast(e as double) * ${Pq.Scale}) as bigint))").as("q"))
    val queries = q.filter(col("vec_id") < Pq.PqQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val d2 = expr("aggregate(sequence(1, 64), cast(0 as bigint), " +
      "(acc, d) -> acc + (element_at(qq, d) - element_at(q, d)) * (element_at(qq, d) - element_at(q, d)))")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    val exact = q.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= Pq.PqTopK)
      .select("query_id", "neighbor_id").cache()
    val hits = ann.select("query_id", "neighbor_id").join(exact, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    // 4x16-dim subspaces at K=8 is a coarse quantizer on near-orthogonal
    // data; measured 0.124 at sf0.001 — pinned at 5x the 1% random-top-5
    // baseline with margin so training perturbations don't flake the suite
    assert(recall >= 0.05, s"ADC recall@5 = $recall")
  }
}
