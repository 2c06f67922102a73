package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-equivalent dry-run data generator (VERDICT r5 #7): scales an
  * existing SF directory 10x into `outDir` so the most expensive
  * operators can be timed one SF step beyond the driver's largest gate —
  * the cheapest way to catch the next sf-scaling surprise (the r4 ngram
  * df-cap saturation class) before the driver regenerates data.
  *
  * Scaling is deterministic and FK-consistent: ten copies k=0..9, all
  * entity keys shifted by k*1e9 together (customer/orders/lineitem key
  * chains move as a unit), dimension tables (region/nation/part/supplier)
  * kept 1x like TPC-H's fixed dimensions — so fact-per-dimension fan-out
  * grows 10x, the realistic shape. Text is rotated word-wise per copy
  * (so copies are NOT near-duplicates and dedup candidate volume scales
  * linearly, not quadratically); embeddings get per-(vec,dim,copy)
  * deterministic jitter for the same reason. The k=0 copy is verbatim,
  * so constant probe sets (vec_id < 50) stay constant.
  *
  *   sbt "runMain graft.Sf1Gen /root/testdata/sf0.1 /tmp/sf1"
  */
object Sf1Gen {
  private val Off = 1000000000L
  private var Copies = 10

  private def copies(s: SparkSession, base: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Copies).map(k => f(base, k)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    // optional 3rd arg: copy count (default 10 = the sf1 shape; 100 = an
    // sf10 dry-run directly from sf0.1 — max key shift 99e9, no overlap)
    Copies = args.lift(2).map(_.toInt).getOrElse(10)
    // <= 128: the embedding scheme (64 rotations x negation) has exactly
    // 128 distinct transforms, so copies k and k+128 would share one —
    // the previous 1000 cap silently permitted broken injectivity
    require(Copies >= 1 && Copies <= 128, s"copies out of range: $Copies")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$in/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dimensions: verbatim 1x
    Seq("region", "nation", "part", "supplier").foreach(t => wr(rd(t), t))

    wr(copies(spark, rd("customer"), (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * Off))), "customer")
    wr(copies(spark, rd("orders"), (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * Off))
        .withColumn("o_custkey", col("o_custkey") + lit(k * Off))), "orders")
    wr(copies(spark, rd("lineitem"), (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * Off))), "lineitem")
    wr(copies(spark, rd("events"), (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * Off))
        .withColumn("user_id", col("user_id") + lit(k * Off))), "events")
    // documents: rotate the word sequence by a copy-dependent stride so
    // shingle/bigram sets diverge (copies must not be near-dups). The
    // stride is taken MOD the word count (round-6 advice): a fixed stride
    // past a short document's end rotated it back to itself, making short
    // docs exact cross-copy duplicates and inflating dedup pair volume.
    // Two exact-dup leaks remained (round-7 advice), both fixed here:
    //   1. pmod(7k+2, n) == 0 left copy k byte-identical to the base for
    //      any doc whose word count n divides 7k+2 — the offset is bumped
    //      to 1 in that case (a 1-word rotation is still a rotation);
    //   2. copies k1 != k2 with 7(k1-k2) ≡ 0 mod n shared a rotation and
    //      were byte-identical to EACH OTHER — the copy-unique cp$k token,
    //      previously only prepended for k >= 10, now guards every k >= 1
    //      (rotation alone cannot be injective for docs shorter than the
    //      copy count; the token makes exactness impossible by construction
    //      at the cost of regenerating the sf1 artifact once).
    wr(copies(spark, rd("documents"), (d, k) => {
      val n = "size(split(text, ' '))"
      val rawOff = s"pmod(${k * 7 + 2}, $n)"
      val off = s"(CASE WHEN $rawOff = 0 THEN 1 ELSE $rawOff END)"
      if (k == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(k * Off))
        .withColumn("text", expr(
          s"""array_join(concat(
             |  slice(split(text, ' '), 1 + $off, $n),
             |  slice(split(text, ' '), 1, $off)), ' ')""".stripMargin))
        .withColumn("text", concat(lit(s"cp$k "), col("text")))
    }), "documents")
    // embeddings: per-copy DIMENSION ROTATION (stride 7k) — a vector and
    // its rotated copy are generically near-orthogonal, so copies are NOT
    // near-duplicates and near-dup pair volume scales linearly with the
    // corpus (small additive jitter left copies at cosine≈1 and inflated
    // dedup_embed_cosine 11x instead of 10x — the first dry-run lesson)
    // dimension rotation yields only 64 distinct transforms (gcd(7,64)=1
    // cycles all of them); copies with k >= 64 additionally NEGATE the
    // vector — cosine(v, -v) = -1, so the reused rotation cannot mint
    // exact-duplicate pairs and near-dup volume stays linear in copies
    wr(copies(spark, rd("embeddings"), (d, k) =>
      if (k == 0) d
      else {
        val rot = expr(
          s"transform(sequence(1, 64), i -> element_at(embedding, 1 + pmod(i - 1 + $k * 7, 64)))")
        d.withColumn("vec_id", col("vec_id") + lit(k * Off))
          .withColumn("embedding",
            if (k < 64) rot else expr(
              s"transform(sequence(1, 64), i -> -element_at(embedding, 1 + pmod(i - 1 + $k * 7, 64)))"))
      }),
      "embeddings")
    println(s"[sf1gen] wrote ${Copies}x of $in to $out")
    spark.stop()
  }
}
