package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** SURVEY.md §2.C (#32-34) — near-duplicate detection over `documents`.
  *
  * All candidate generation is band/bucket equi-joins (minhash bands,
  * simhash 15-bit chunks, rare-bigram inverted index) — never an O(n²)
  * cross join — and exact verification runs only on candidate pairs.
  * That is the 100 TB shape: shuffles are on compact keys, and the pair
  * set stays proportional to the true duplicate count.
  *
  * Word 3-shingles (not unigrams) are the unit: the synthetic corpus has a
  * ~30-word vocabulary, so token-set Jaccard saturates at 1.0; shingle sets
  * separate the planted near-dups (j >= 0.8) from background (j < 0.3).
  */
object Dedup extends QueryModule {

  private val toksDuck = Docs.toksDuck

  /** Distinct (doc_id, shingle) with 3-word shingles — memoized per
    * (session, sf-dir) since three dedup operators share it. Tokens come
    * from the shared [[Docs]] pass (no per-operator re-tokenization).
    */
  private[queries] def shingles(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "shingles", dir)(shinglesUncached(s, dir))

  private def shinglesUncached(s: SparkSession, dir: String): DataFrame =
    Docs.enriched(s, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks)-2), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2)))"))
        .as("shingle"))
      .distinct()

  private val shinglesDuck =
    s"""SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, len(toks)-1), k -> toks[k] || ' ' || toks[k+1] || ' ' || toks[k+2])) AS shingle
       |FROM (SELECT doc_id, $toksDuck AS toks FROM documents)
       |WHERE len(toks) >= 3""".stripMargin

  // ------------------------------------------------ dedup_minhash_lsh
  // h32(t) = md5-long64(t) mod p32; k=16 permutations h_i = (2i+1)*h + c_i.
  // private[graft]: the streaming near-dup gate (Streams.nearDupStream)
  // computes the SAME signatures row-locally and joins the same index.
  private[graft] val P32 = 4294967291L
  private[graft] val NumPerm = 16
  private[graft] val BandRows = 4
  private[graft] val MinhashThreshold = 0.6

  /** (doc_id, band, sig) LSH band signatures — one shuffle with 16
    * map-side partial mins; shared by dedup_minhash_lsh and
    * decontaminate_fuzzy, and referenced on BOTH sides of their joins, so
    * memoized+cached (the simhashKeyed pattern — an uncached plan would
    * run the shingle scan and signature aggregation once per subtree).
    */
  private def minhashBands(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "minhash_bands", dir) {
      val h = shingles(s, dir)
        .select(col("doc_id"), (md5Long64(col("shingle")) % P32).as("h32"))
      // One shuffle with map-side partial mins (16 agg columns) instead of
      // a 16x permutation explode — same minima, 100TB-friendly.
      val minCols = (0 until NumPerm).map(i =>
        min(((lit(2L * i + 1)) * col("h32") + lit(1000003L * i + 12345L)) % P32).as(s"m_$i"))
      val mins = h.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      val bandSigs = (0 until NumPerm / BandRows).map { b =>
        val cs = (0 until BandRows).map(r => s"cast(m_${b * BandRows + r} as string)").mkString(", ")
        s"$b, concat_ws(',', $cs)"
      }.mkString(", ")
      mins.select(col("doc_id"),
        expr(s"stack(${NumPerm / BandRows}, $bandSigs)").as(Seq("band", "sig")))
    }

  // ------------------------------------------------ dedup_incremental
  // Nightly-ingest dedup — the production shape a 100 TB pipeline actually
  // runs: only the ARRIVING batch (doc_id % IncrMod == 0, an SF-stable
  // 20% split standing in for today's crawl) is checked against the
  // existing corpus. Candidate generation joins new-side band signatures
  // against old-side signatures only, so per-ingest cost is O(batch)
  // band lookups against the (at scale: bucketed, band-keyed) index —
  // old↔old pairs are NEVER recomputed, unlike the full self-join
  // dedup_minhash_lsh runs. Exact-Jaccard verification touches candidates
  // only. The batch twin of stream_near_dup (same index, same verify).
  private val IncrMod = 5

  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val bands = minhashBands(s, dir)
    val isNew = col("doc_id") % IncrMod === 0
    val cand = bands.filter(isNew).as("a")
      .join(bands.filter(!isNew).as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("ta"), col("ta.doc_id") === col("new_id"))
      .join(sh.as("tb"), col("tb.doc_id") === col("old_id") &&
        col("tb.shingle") === col("ta.shingle"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("sa.doc_id") === col("new_id"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("old_id"))
      .select(col("new_id"), col("old_id"), col("n_common"),
        col("sa.n").as("n_new"), col("sb.n").as("n_old"),
        (col("n_common").cast("double") / (col("sa.n") + col("sb.n") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= MinhashThreshold)
      .orderBy("new_id", "old_id")
  }

  // def, not val: minhashBandsCtes is declared further down the object —
  // a val here would capture null during object init
  private def dedupIncrementalSql =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
       |  WHERE a.doc_id % $IncrMod = 0 AND b.doc_id % $IncrMod <> 0),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.new_id, c.old_id, CAST(count(*) AS BIGINT) AS n_common
       |  FROM cand c
       |  JOIN sh ta ON ta.doc_id = c.new_id
       |  JOIN sh tb ON tb.doc_id = c.old_id AND tb.shingle = ta.shingle
       |  GROUP BY c.new_id, c.old_id)
       |SELECT i.new_id, i.old_id, i.n_common, sa.n AS n_new, sb.n AS n_old,
       |       CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.new_id
       |JOIN sizes sb ON sb.doc_id = i.old_id
       |WHERE CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) >= $MinhashThreshold
       |ORDER BY new_id, old_id""".stripMargin

  // ------------------------------ row-local signatures (streaming twin)
  /** Per-row LSH band signatures computed scan-locally with array HOFs —
    * the exact hash/permutation/band constants of [[minhashBands]] with no
    * explode and no shuffle, so a STREAMING document row carries its own
    * signature (Streams.nearDupStream). Distinctness via array_distinct
    * cannot change any permutation minimum, so the signatures are
    * bit-identical to the batch frame — StreamingSpec pins the parity on
    * the live corpus.
    */
  private[graft] val RowShinglesExpr: String =
    "array_distinct(transform(sequence(1, size(toks)-2), k -> " +
      "concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2))))"

  /** md5-long64 mod p32 per shingle — the streaming form of h32. */
  private[graft] val RowH32sExpr: String =
    s"transform(shingles, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % ${P32}L)"

  /** array<struct<band,sig>> over the h32 array. */
  private[graft] def rowBandStructsExpr: String = {
    def minExpr(i: Int) =
      s"array_min(transform(h32s, h -> (${2 * i + 1}L * h + ${1000003L * i + 12345L}L) % ${P32}L))"
    (0 until NumPerm / BandRows).map { b =>
      val cs = (0 until BandRows).map(r => s"cast(${minExpr(b * BandRows + r)} as string)").mkString(", ")
      s"named_struct('band', $b, 'sig', concat_ws(',', $cs))"
    }.mkString("array(", ", ", ")")
  }

  /** The static corpus side of the streaming gate: the (doc_id, band, sig)
    * index and the per-doc shingle sets the exact-verify join consumes.
    */
  private[graft] def bandIndex(s: SparkSession, dir: String): DataFrame = minhashBands(s, dir)
  private[graft] def shingleSets(s: SparkSession, dir: String): DataFrame =
    shingles(s, dir).groupBy("doc_id").agg(collect_set("shingle").as("shingles"))

  /** All LSH-candidate pairs with their exact Jaccard — the pre-threshold
    * frame minhashLsh filters and the threshold-calibration curve bins.
    *
    * NOT memoized (r15; the r14 memo is gone per the r14 verdict): caching
    * this frame made every consumer's bench time measure a cache read
    * instead of the operator, charged the build to whichever query ran
    * first, and added pair-scale storage pressure. The expensive inputs
    * (shingles, band signatures) stay session-cached — each consumer pays
    * only its own candidate join + verification.
    */
  private[graft] def scoredCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val bands = minhashBands(s, dir)
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("ta"), col("ta.doc_id") === col("doc_a"))
      .join(sh.as("tb"), col("tb.doc_id") === col("doc_b") && col("tb.shingle") === col("ta.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"),
        (col("n_common").cast("double") / (col("sa.n") + col("sb.n") - col("n_common"))).as("jaccard"))
  }

  private[queries] def minhashLsh(s: SparkSession, dir: String): DataFrame =
    scoredCandidatePairs(s, dir)
      .filter(col("jaccard") >= MinhashThreshold)
      .orderBy("doc_a", "doc_b")

  // ---------------------------------------------- dedup_threshold_curve
  // Threshold calibration: how many pairs would each Jaccard cutoff keep?
  // The histogram production tunes τ against — bins are deciles of the
  // exact Jaccard over the LSH CANDIDATE set (the same population any τ
  // filter sees; pairs below the banding's reach are invisible to every
  // threshold equally, so the curve is exactly the tunable region).
  // floor(j·10) is one exact double op on a bit-identical input, the
  // cumulative count runs over the bounded 11-bin axis.
  private def dedupThresholdCurve(s: SparkSession, dir: String): DataFrame = {
    val binned = scoredCandidatePairs(s, dir)
      .select(expr("cast(floor(jaccard * 10) as bigint)").as("bin_decile"))
      .groupBy("bin_decile").agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin_decile").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    binned
      .withColumn("n_pairs_ge", sum("n_pairs").over(w))
      .orderBy("bin_decile")
  }

  // def, not val: minhashBandsCtes is declared further down (the
  // dedupIncrementalSql lesson — a val here would capture null)
  private def dedupThresholdCurveSql =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN sh ta ON ta.doc_id = c.doc_a
       |  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.shingle = ta.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |scored AS (
       |  SELECT CAST(floor((CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common)) * 10) AS BIGINT) AS bin_decile
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b),
       |binned AS (
       |  SELECT bin_decile, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM scored GROUP BY bin_decile)
       |SELECT bin_decile, n_pairs,
       |       CAST(sum(n_pairs) OVER (ORDER BY bin_decile DESC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
       |FROM binned ORDER BY bin_decile""".stripMargin

  /** Oracle CTE chain through the band signatures — shared by
    * dedup_minhash_lsh and decontaminate_fuzzy (MATERIALIZED: both
    * consumers reference sh/bands more than once).
    */
  private val minhashBandsCtes =
    s"""sh AS MATERIALIZED (
       |$shinglesDuck
       |), h AS (
       |  SELECT doc_id, ${md5Long64Sql("shingle")} % $P32 AS h32 FROM sh),
       |perms AS (SELECT unnest(generate_series(0, ${NumPerm - 1})) AS i),
       |mh AS (
       |  SELECT doc_id, i, min(((2*i+1)*h32 + (1000003*i+12345)) % $P32) AS minh
       |  FROM h CROSS JOIN perms GROUP BY doc_id, i),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, i // $BandRows AS band,
       |         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS sig
       |  FROM mh GROUP BY doc_id, i // $BandRows)""".stripMargin

  private[queries] val minhashSql =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN sh ta ON ta.doc_id = c.doc_a
       |  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.shingle = ta.shingle
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS n_a, sb.n AS n_b,
       |       CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) AS jaccard
       |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) >= $MinhashThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------- decontaminate_fuzzy
  // Production benchmark decontamination: the exact 5-gram overlap op
  // (Curate.decontaminate) misses paraphrased leakage — this is the
  // minhash form. The benchmark slice's band signatures are a CONSTANT
  // broadcast side; corpus bands equi-join them, exact Jaccard verifies
  // only the candidates, and each contaminated doc reports its best
  // benchmark match (ties → lowest benchmark id). Candidates are banded
  // — the production shape — and the oracle replicates the IDENTICAL
  // banding, so the hash-match checks the candidate set itself (the
  // guaranteed catch: an exact cross-set copy collides in every band;
  // CurateSpec pins it).
  // NOTE: deliberately wider than Curate.BenchDocs (20): the exact 5-gram
  // op's signal is dense, but cross-set NEAR-dups at >= tau only appear
  // with a 40-doc slice at every SF — the two ops model two differently
  // sized eval suites, not one shared benchmark.
  private[queries] val FuzzyBenchDocs = 40L
  private val FuzzyTau = 0.5

  private[queries] def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val bands = minhashBands(s, dir)
    val bench = broadcast(bands.filter(col("doc_id") < FuzzyBenchDocs)
      .select(col("band").as("bb"), col("sig").as("bsig"), col("doc_id").as("bench_doc")))
    val cand = bands.filter(col("doc_id") >= FuzzyBenchDocs)
      .join(bench, col("band") === col("bb") && col("sig") === col("bsig"))
      .select(col("doc_id").as("c_doc"), col("bench_doc")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("ta"), col("ta.doc_id") === col("c_doc"))
      .join(sh.as("tb"), col("tb.doc_id") === col("bench_doc") &&
        col("tb.shingle") === col("ta.shingle"))
      .groupBy("c_doc", "bench_doc").agg(count(lit(1)).as("n_common"))
    val scored = inter
      .join(sizes.as("sa"), col("sa.doc_id") === col("c_doc"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("bench_doc"))
      .select(col("c_doc"), col("bench_doc"), col("n_common"),
        col("sa.n").as("n_doc"), col("sb.n").as("n_bench"),
        (col("n_common").cast("double") / (col("sa.n") + col("sb.n") - col("n_common")))
          .as("jaccard"))
      .filter(col("jaccard") >= FuzzyTau)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_doc").orderBy(col("jaccard").desc, col("bench_doc"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("c_doc").as("doc_id"), col("bench_doc").as("match_doc"),
        col("n_common"), col("n_doc"), col("n_bench"), col("jaccard"))
      .orderBy("doc_id")
  }

  private[queries] val decontaminateFuzzySql =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS c_doc, b.doc_id AS bench_doc
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
       |  WHERE a.doc_id >= $FuzzyBenchDocs AND b.doc_id < $FuzzyBenchDocs),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.c_doc, c.bench_doc, CAST(count(*) AS BIGINT) AS n_common
       |  FROM cand c
       |  JOIN sh ta ON ta.doc_id = c.c_doc
       |  JOIN sh tb ON tb.doc_id = c.bench_doc AND tb.shingle = ta.shingle
       |  GROUP BY c.c_doc, c.bench_doc),
       |scored AS (
       |  SELECT i.c_doc, i.bench_doc, i.n_common, sa.n AS n_doc, sb.n AS n_bench,
       |         CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.c_doc
       |  JOIN sizes sb ON sb.doc_id = i.bench_doc
       |  WHERE CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) >= $FuzzyTau),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY c_doc ORDER BY jaccard DESC, bench_doc) AS rk
       |  FROM scored)
       |SELECT c_doc AS doc_id, bench_doc AS match_doc, n_common, n_doc, n_bench, jaccard
       |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- dedup_simhash
  // 60-bit simhash over shingle hashes; blocking key = a PAIR of 10-bit
  // chunks (C(6,2) = 15 combos, 20-bit key each). Pigeonhole: hamming <= 3
  // corrupts at most 3 of the 6 chunks, leaving >= 3 clean — so at least
  // one clean PAIR exists and recall is guaranteed, exactly like the old
  // single-chunk scheme. The win is the key space: 15 x 2^20 ≈ 15.7M keys
  // vs the old 4 x 2^15 = 131k — at 10^9+ docs a fixed 131k-bucket space
  // saturates (~30k docs/bucket -> O(n²/2^15) within-bucket pairs); the
  // pair keys keep expected occupancy at n/2^20 per combo, 480x smaller,
  // at the cost of 15 instead of 4 rows per doc in the blocking shuffle.
  private val SimBits = 60
  private val ChunkBits = 10
  private val NumChunks = SimBits / ChunkBits
  private val ChunkMask = (1 << ChunkBits) - 1
  private val MaxHamming = 3
  /** The 15 chunk pairs, as (combo id, lo chunk, hi chunk). */
  private val ChunkCombos: Seq[(Int, Int, Int)] = (for {
    i <- 0 until NumChunks; j <- i + 1 until NumChunks
  } yield (i, j)).zipWithIndex.map { case ((i, j), k) => (k, i, j) }

  /** (doc_id, sig, c, ck) blocking rows — split out so ScaleSpec can audit
    * per-bucket occupancy directly. Memoized + cached per (session, dir):
    * the candidate self-join references this frame on BOTH sides, and an
    * uncached plan would run the 60-partial-sum signature aggregation
    * twice (Spark does not dedup common subtrees across join sides).
    */
  private[graft] def simhashKeyed(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "simhash_keyed", dir)(simhashKeyedUncached(s, dir))

  private def simhashKeyedUncached(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val h = sh.select(col("doc_id"), md5Long64(col("shingle")).as("h60"))
    // One shuffle with 60 codegen'd partial sums instead of a 60x bit explode.
    val sumCols = (0 until SimBits).map(j =>
      sum(when(expr(s"(shiftright(h60, $j) & 1) = 1"), 1L).otherwise(-1L)).as(s"s_$j"))
    val sums = h.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    val sigExpr = (0 until SimBits)
      .map(j => s"(case when s_$j > 0 then cast(${1L << j} as bigint) else cast(0 as bigint) end)")
      .mkString(" + ")
    val sig = sums.select(col("doc_id"), expr(sigExpr).as("sig"))
    // 15 (combo, 20-bit key) rows per doc, generated scan-locally
    val keyedExpr = ChunkCombos.map { case (k, i, j) =>
      s"$k, (shiftright(sig, ${ChunkBits * i}) & $ChunkMask) * ${1 << ChunkBits} + (shiftright(sig, ${ChunkBits * j}) & $ChunkMask)"
    }.mkString(", ")
    sig.select(col("doc_id"), col("sig"),
      expr(s"stack(${ChunkCombos.size}, $keyedExpr)").as(Seq("c", "ck")))
  }

  private def simhash(s: SparkSession, dir: String): DataFrame = {
    val keyed = simhashKeyed(s, dir)
    val pairs = keyed.as("a")
      .join(keyed.as("b"), col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    pairs
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .filter(col("hamming") <= MaxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  private val simhashSql = {
    val combosRows = ChunkCombos.map { case (k, i, j) => s"($k, $i, $j)" }.mkString(", ")
    s"""WITH sh AS (
       |$shinglesDuck
       |), h AS (
       |  SELECT doc_id, ${md5Long64Sql("shingle")} AS h60 FROM sh),
       |bits AS (SELECT unnest(generate_series(0, ${SimBits - 1})) AS j),
       |contrib AS (
       |  SELECT doc_id, j,
       |         CAST(sum(CASE WHEN ((h60 >> j) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS sc
       |  FROM h CROSS JOIN bits GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
       |  FROM contrib GROUP BY doc_id),
       |combos(c, i, j) AS (VALUES $combosRows),
       |keyed AS (
       |  SELECT doc_id, sig, c,
       |         ((sig >> ($ChunkBits * i)) & $ChunkMask) * ${1 << ChunkBits} + ((sig >> ($ChunkBits * j)) & $ChunkMask) AS ck
       |  FROM sig CROSS JOIN combos),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM keyed a JOIN keyed b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |FROM pairs
       |WHERE bit_count(xor(sig_a, sig_b)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ----------------------------------------------- sim_ngram_jaccard
  // Word-bigram Jaccard via a rare-bigram inverted index (df cap bounds
  // candidate fan-out at scale), exact verification on full bigram sets.
  private val DfCap = 50
  private val JaccardThreshold = 0.5

  /** Distinct (doc_id, bigram) — memoized + cached per (session, sf-dir)
    * like the shingle set: the candidate join, the intersect join, and the
    * size aggregation all re-scan it, so one materialization serves all.
    */
  private[queries] def bigrams(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "bigrams", dir)(
      Docs.enriched(s, dir)
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks)-1), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1)))"))
          .as("bg"))
        .distinct())

  private[queries] val bigramsDuck =
    s"""SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, len(toks)), k -> toks[k] || ' ' || toks[k+1])) AS bg
       |FROM (SELECT doc_id, $toksDuck AS toks FROM documents)
       |WHERE len(toks) >= 2""".stripMargin

  /** Per-doc bigram-set sizes over the cached bigram frame. NOT memoized
    * (r15; the r14 memo is gone per the r14 verdict — it was contradicted
    * by the full-bench numbers anyway): the aggregation over the cached
    * bigrams is one cheap keyed agg per consumer, and identical agg
    * subtrees within one plan dedup through runtime exchange reuse.
    */
  private[queries] def bigramSizes(s: SparkSession, dir: String): DataFrame =
    bigrams(s, dir).groupBy("doc_id").agg(count(lit(1)).as("n"))

  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val bgr = bigrams(s, dir)
    val df = bgr.groupBy("bg").agg(count(lit(1)).as("d"))
    val rare = bgr.join(df.filter(col("d") <= DfCap), Seq("bg"))
    val cand = rare.as("a")
      .join(rare.as("b"), col("a.bg") === col("b.bg") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val sizes = bigramSizes(s, dir)
    val inter = cand
      .join(bgr.as("ta"), col("ta.doc_id") === col("doc_a"))
      .join(bgr.as("tb"), col("tb.doc_id") === col("doc_b") && col("tb.bg") === col("ta.bg"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"),
        (col("n_common").cast("double") / (col("sa.n") + col("sb.n") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  private val ngramSql =
    s"""WITH bgr AS (
       |$bigramsDuck
       |), df AS (SELECT bg, count(*) AS d FROM bgr GROUP BY bg),
       |rare AS (SELECT bgr.doc_id, bgr.bg FROM bgr JOIN df ON bgr.bg = df.bg WHERE df.d <= $DfCap),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.bg = b.bg AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM bgr GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN bgr ta ON ta.doc_id = c.doc_a
       |  JOIN bgr tb ON tb.doc_id = c.doc_b AND tb.bg = ta.bg
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS n_a, sb.n AS n_b,
       |       CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) AS jaccard
       |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE CAST(i.n_common AS DOUBLE)/(sa.n + sb.n - i.n_common) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------- dedup_cluster
  // Near-dup pairs are not yet a dedup decision: a cluster {a,b,c} found as
  // pairs (a,b),(b,c) must keep ONE survivor, which needs connected
  // components over the pair graph. Min-label propagation: every node
  // starts labeled with itself; each round a node takes the min of its own
  // and its neighbors' labels — one shuffle per round on the node id,
  // converging in O(cluster diameter) rounds (near-dup clusters are tiny;
  // if a pathological chain ever appears — a crawler loop at 100 TB — the
  // loop switches to pointer-jumping after JumpAfter rounds: each jump
  // rewrites lbl <- lbl(lbl), doubling the propagated distance per round,
  // so an L-node chain converges in JumpAfter + O(log L) rounds instead
  // of O(L)). The loop is driver-side over ITERATIONS, never over rows.
  private val MaxCcIters = 20
  private val JumpAfter = 8

  /** Converged (id, lbl) component labels over the minhash pair graph —
    * memoized + cached per (session, sf-dir) like the shingle set: the
    * labels are the session's materialized dedup assignment (tiny — only
    * docs that appear in a near-dup pair), and re-running the propagation
    * loop per invocation would redo the whole candidate pipeline.
    */
  private def ccLabels(s: SparkSession, dir: String): DataFrame =
    ccLabelsOver(s, dir, "cc_labels", minhashLsh(s, dir).select("doc_a", "doc_b"))

  /** Converged (id, lbl) component labels over an arbitrary 2-column pair
    * frame — the survivorship kernel shared by the text (minhash) and
    * embedding near-dup clusterers. Memoized per (session, tag, corpus).
    */
  private[graft] def ccLabelsOver(s: SparkSession, dir: String, tag: String,
                                  pairs: => DataFrame): DataFrame =
    SessionCache.memo(s, tag, dir) {
      val Seq(aCol, bCol) = pairs.columns.toSeq
      // Symmetrize with one explode instead of a self-union: a union would
      // evaluate the whole candidate pipeline twice (Spark does not dedup
      // common subtrees across union branches).
      val edges = pairs
        .select(explode(array(
          struct(col(aCol).as("src"), col(bCol).as("dst")),
          struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .cache()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")).cache()
      def lblSum(df: DataFrame): Long =
        df.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
      var prev = lblSum(labels)
      var converged = false
      var iters = 0
      while (!converged && iters < MaxCcIters) {
        val viaNbr = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), labels("lbl"))
        // localCheckpoint, NOT cache: `next` references `labels` twice
        // (union + join), so a cache-only loop DOUBLES the logical plan
        // every round — execution stays fast through the cache, but the
        // driver's plan objects/strings grow 2^rounds and OOM once the
        // graph needs more than a handful of rounds (hit at sf0.1 on the
        // embedding pair graph). Checkpointing truncates the lineage to
        // the materialized result each round, the standard shape for
        // iterative algorithms on Spark.
        val propagated = labels.select("id", "lbl").union(viaNbr)
          .groupBy("id").agg(min("lbl").as("lbl"))
        // Past JumpAfter rounds the graph has a longer diameter than any
        // near-dup cluster should: add a pointer-jumping step, lbl <-
        // lbl(lbl). Labels are node ids, so every lbl resolves in the
        // label table itself (left join for the fixpoint rows where lbl =
        // its own component min already). min-monotone, one extra hash
        // shuffle per round, distance doubles per round.
        val stepped =
          if (iters < JumpAfter) propagated
          else {
            val p = propagated.localCheckpoint(true)
            val lookup = p.select(col("id").as("p_id"), col("lbl").as("p_lbl"))
            p.join(lookup, col("lbl") === col("p_id"), "left_outer")
              .select(col("id"), coalesce(col("p_lbl"), col("lbl")).as("lbl"))
          }
        val next = stepped.localCheckpoint(true)
        val cur = lblSum(next) // labels only ever decrease: equal sum = fixpoint
        labels.unpersist()
        labels = next
        converged = cur == prev
        prev = cur
        iters += 1
      }
      // Fail loudly rather than silently emitting non-minimal labels: the
      // oracle computes the exact closure, so an unconverged result would
      // surface as an undiagnosable hash mismatch. Jumping does NOT
      // guarantee distance-doubling on arbitrary label topologies (the r8
      // oracle bug proved that bound false), but the sf0.1 gate graphs
      // converge well inside MaxCcIters (10 rounds measured, cap 20,
      // pinned by CcOracleConvergenceSpec) — a graph that still hits the
      // cap is malformed input, and this require makes that loud.
      require(converged, s"$tag: min-label propagation did not converge in $MaxCcIters rounds")
      // materialize the labels so the edge cache can be released now
      labels.count()
      edges.unpersist()
      labels
    }

  private[queries] def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val labels = ccLabels(s, dir)
    val assign = Docs.enriched(s, dir).select("doc_id")
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("canon_id"))
    val sizes = assign.groupBy("canon_id").agg(count(lit(1)).as("cluster_size"))
    assign.join(sizes, "canon_id")
      .select(col("doc_id"), col("canon_id"), col("cluster_size"),
        when(col("doc_id") === col("canon_id"), 1L).otherwise(0L).as("is_canonical"))
      .orderBy("doc_id")
  }

  // CC oracle via UNROLLED min-label propagation + pointer jumping (r7,
  // the dedup_cluster_embed pattern): the WITH RECURSIVE closure's reach
  // CTE is Σ|cluster|² rows — minutes at sf1 and re-evaluated by every
  // oracle that inlines this SQL (dedup_keep_best, pipeline_dedup_full);
  // label propagation is rounds × |E| (seconds). The round count is
  // MEASURED WITH MARGIN, not derived from a "diameter ≤ 2^rounds" bound
  // (that claim is false on real near-dup graphs — the embed twin's
  // 6-round oracle under-converged at sf0.1 once pair recall hit 1.0):
  // CcOracleConvergenceSpec replays this algorithm on the sf0.1 minhash
  // pair graph and asserts TextCcRounds exceeds the needed rounds by
  // ≥ 2. Raising it costs rounds × |E| only; under-convergence fails
  // the hash loudly, never silently.
  private[graft] val TextCcRounds = 14
  private[queries] val clusterSql = {
    val rounds = (1 to TextCcRounds).map { k =>
      val prev = if (k == 1) "l0" else s"j${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT l.id AS id, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
         |  FROM $prev l
         |  LEFT JOIN edges e ON e.src = l.id
         |  LEFT JOIN $prev nl ON nl.id = e.dst
         |  GROUP BY l.id, l.lbl
         |), j$k AS MATERIALIZED (
         |  SELECT p.id AS id, q.lbl AS lbl FROM p$k p JOIN p$k q ON q.id = p.lbl
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM ($minhashSql)
       |), edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), l0 AS MATERIALIZED (
       |  SELECT doc_id AS id, doc_id AS lbl FROM documents
       |),
       |$rounds,
       |assign AS (
       |  SELECT d.doc_id, j$TextCcRounds.lbl AS canon_id
       |  FROM documents d JOIN j$TextCcRounds ON j$TextCcRounds.id = d.doc_id
       |), sizes AS (
       |  SELECT canon_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM assign GROUP BY canon_id
       |)
       |SELECT a.doc_id, a.canon_id, s.cluster_size,
       |  CASE WHEN a.doc_id = a.canon_id THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_canonical
       |FROM assign a JOIN sizes s ON s.canon_id = a.canon_id
       |ORDER BY a.doc_id""".stripMargin
  }

  // ------------------------------------------------ dedup_keep_best
  // Quality-aware survivorship: production dedup keeps the BEST member of
  // each near-dup cluster, not the lowest id — canonical-by-min-id is a
  // stable label, not an editorial decision. Composes the CC cluster
  // assignment with the text_quality score (both session-memoized passes)
  // and picks the argmax by (quality_score desc, doc_id asc) under a
  // CLUSTER-keyed window — never a global one. The quality doubles are
  // bit-identical cross-engine (text_quality hash-matches), so the
  // ordering — and with the doc_id tie-break, the keeper — is
  // engine-stable.
  private[queries] def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val q = Text.quality(s, dir).select("doc_id", "quality_score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canon_id").orderBy(col("quality_score").desc, col("doc_id"))
    dedupCluster(s, dir).drop("is_canonical").join(q, "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("canon_id"), col("cluster_size"), col("quality_score"),
        when(col("rk") === 1, 1L).otherwise(0L).as("keep_ind"))
      .orderBy("doc_id")
  }

  private[queries] def dedupKeepBestSql =
    s"""WITH r AS (
       |  SELECT c.doc_id, c.canon_id, c.cluster_size, q.quality_score,
       |         row_number() OVER (
       |           PARTITION BY c.canon_id
       |           ORDER BY q.quality_score DESC, c.doc_id) AS rk
       |  FROM ($clusterSql) c
       |  JOIN (SELECT doc_id, quality_score FROM (${Text.qualitySql}) qq) q
       |    ON q.doc_id = c.doc_id)
       |SELECT doc_id, canon_id, cluster_size, quality_score,
       |  CASE WHEN rk = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep_ind
       |FROM r ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ pipeline_dedup_full
  // The END-TO-END dedup disposition — the three-layer production pass a
  // corpus runs before training, composed from the checked components
  // (the pipeline_curate_full pattern applied to dedup): per document,
  //   exact_dup       — not the min-id survivor of its norm-hash group
  //                     (dedup_exact's grouping),
  //   near_dup_drop   — lost the quality-aware survivorship inside its
  //                     minhash-LSH connected component (dedup_keep_best),
  //   substr_victim   — the higher-id side of a long exactly-shared token
  //                     span (dedup_substring / the span-mask convention),
  //   keep            — none of the above.
  // All component passes are session-memoized, so this op adds only the
  // final per-doc joins; the oracle inlines all three component SQLs.
  private def pipelineDedupFull(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_sha256")
    val exact = Docs.enriched(s, dir)
      .select(col("doc_id"), expr("sha2(norm, 256)").as("norm_sha256"))
      .withColumn("exact_dup",
        when(col("doc_id") === min("doc_id").over(w), 0L).otherwise(1L))
      .select("doc_id", "exact_dup")
    val nd = dedupKeepBest(s, dir)
      .select(col("doc_id"), (lit(1L) - col("keep_ind")).as("near_dup_drop"))
    val victims = Spans.dedupSubstring(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("substr_victim", lit(1L))
    exact.join(nd, "doc_id")
      .join(victims, Seq("doc_id"), "left")
      .withColumn("substr_victim", coalesce(col("substr_victim"), lit(0L)))
      .withColumn("keep",
        when(col("exact_dup") + col("near_dup_drop") + col("substr_victim") === 0L, 1L)
          .otherwise(0L))
      .select("doc_id", "exact_dup", "near_dup_drop", "substr_victim", "keep")
      .orderBy("doc_id")
  }

  private def pipelineDedupFullSql =
    s"""WITH ex AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY sha256(${graft.queries.Docs.normDuck}))
       |              THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS exact_dup
       |  FROM documents),
       |kb AS (
       |  SELECT doc_id, CAST(1 - keep_ind AS BIGINT) AS near_dup_drop
       |  FROM ($dedupKeepBestSql)),
       |v AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM (${Spans.dedupSubstringSql}))
       |SELECT ex.doc_id, ex.exact_dup, kb.near_dup_drop,
       |  CASE WHEN v.doc_id IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS substr_victim,
       |  CASE WHEN ex.exact_dup + kb.near_dup_drop +
       |            (CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END) = 0
       |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
       |FROM ex JOIN kb ON kb.doc_id = ex.doc_id
       |LEFT JOIN v ON v.doc_id = ex.doc_id
       |ORDER BY ex.doc_id""".stripMargin

  // ------------------------------------------------ corpus_source_overlap
  // Cross-SOURCE contamination matrix — which sources copy from each
  // other: for every source pair, how many distinct 3-gram shingles they
  // share, plus each side's share of its own shingle vocabulary in exact
  // micro-units. The basket-pairs shape on the shingle axis: one keyed
  // aggregation collects each shingle's (small, domain-bounded) source
  // set, pairs explode scan-locally — never a shingle-keyed self-join.
  // Output is #sources², a constant; the corpus-scale work is one
  // distinct + one aggregation over the memoized shingle pass.
  private def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ss = shingles(s, dir)
      .join(Docs.enriched(s, dir).select("doc_id", "source"), "doc_id")
      .select("shingle", "source").distinct()
    val perSource = ss.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = ss.groupBy("shingle").agg(array_sort(collect_set(col("source"))).as("srcs"))
      .select(explode(expr(
        """CASE WHEN size(srcs) < 2 THEN array()
          |ELSE flatten(transform(sequence(1, size(srcs) - 1), i ->
          |  transform(sequence(i + 1, size(srcs)), j ->
          |    named_struct('a', srcs[i - 1], 'b', srcs[j - 1]))))
          |END""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(perSource.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(perSource.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"), col("n_a"), col("n_b"),
        expr("n_shared * 1000000 div n_a").as("share_a_micro"),
        expr("n_shared * 1000000 div n_b").as("share_b_micro"))
      .orderBy("source_a", "source_b")
  }

  private val sourceOverlapSql =
    s"""WITH sh AS (
       |$shinglesDuck
       |), ss AS (
       |  SELECT DISTINCT sh.shingle, d.source
       |  FROM sh JOIN documents d ON d.doc_id = sh.doc_id),
       |per_source AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT p.source_a, p.source_b, p.n_shared, pa.n AS n_a, pb.n AS n_b,
       |       p.n_shared * 1000000 // pa.n AS share_a_micro,
       |       p.n_shared * 1000000 // pb.n AS share_b_micro
       |FROM pairs p
       |JOIN per_source pa ON pa.source = p.source_a
       |JOIN per_source pb ON pb.source = p.source_b
       |ORDER BY p.source_a, p.source_b""".stripMargin

  // --------------------------------------------------- corpus_novelty
  // Per-document NOVELTY — what fraction of a doc's 3-gram shingles has
  // never appeared in any earlier document (ingestion order = doc_id):
  // the burn-down curve that says when a crawl stops contributing new
  // content. A shingle is novel exactly in the doc that is its
  // min-doc_id carrier, so one (shingle → min doc) aggregation + one
  // per-doc rollup answers it — no ordered scan, no window over the
  // corpus, fully parallel. Exact integer micro-ratios.
  private def corpusNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val firstSeen = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val novel = sh.join(firstSeen, "shingle")
      .filter(col("doc_id") === col("first_doc"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty_micros", expr("n_novel * 1000000 div n_shingles"))
      .select("doc_id", "n_shingles", "n_novel", "novelty_micros")
      .orderBy("doc_id")
  }

  private val corpusNoveltySql =
    s"""WITH sh AS (
       |$shinglesDuck
       |), first_seen AS (
       |  SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
       |per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id),
       |novel AS (
       |  SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_novel
       |  FROM sh JOIN first_seen f ON f.shingle = sh.shingle AND f.first_doc = sh.doc_id
       |  GROUP BY sh.doc_id)
       |SELECT p.doc_id, p.n_shingles,
       |  coalesce(n.n_novel, 0) AS n_novel,
       |  coalesce(n.n_novel, 0) * 1000000 // p.n_shingles AS novelty_micros
       |FROM per_doc p LEFT JOIN novel n ON n.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  // ----------------------------------------------------- text_boilerplate
  // Corpus boilerplate mining (the CCNet/RefinedWeb "drop the navbars"
  // signal): a 3-gram appearing in ≥ BoilerMinDf distinct documents is
  // boilerplate; each document reports how much of it is made of such
  // grams, as an exact integer micro-ratio. Reuses the memoized shingle
  // pass; the df aggregation is one shuffle on the gram, the (small)
  // boilerplate set joins back semi-style, and the per-doc rollup is one
  // keyed aggregation — no all-pairs work anywhere.
  private val BoilerMinDf = 5L

  private def boilerplate(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val boiler = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerMinDf).select("shingle")
    val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = sh.join(boiler, "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    perDoc.join(hits, Seq("doc_id"), "left")
      .withColumn("n_boiler", coalesce(col("n_boiler"), lit(0L)))
      .withColumn("boiler_micros", expr("n_boiler * 1000000 div n_grams"))
      .select("doc_id", "n_grams", "n_boiler", "boiler_micros")
      .orderBy("doc_id")
  }

  private val boilerplateSql =
    s"""WITH sh AS (
       |$shinglesDuck
       |), boiler AS (
       |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= $BoilerMinDf),
       |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM sh GROUP BY doc_id),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
       |  FROM sh JOIN boiler USING (shingle) GROUP BY doc_id)
       |SELECT p.doc_id, p.n_grams,
       |  coalesce(h.n_boiler, 0) AS n_boiler,
       |  coalesce(h.n_boiler, 0) * 1000000 // p.n_grams AS boiler_micros
       |FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_minhash_lsh", minhashLsh, Some(minhashSql)),
    QueryDef("dedup_incremental", dedupIncremental, Some(dedupIncrementalSql)),
    QueryDef("decontaminate_fuzzy", decontaminateFuzzy, Some(decontaminateFuzzySql)),
    QueryDef("dedup_simhash", simhash, Some(simhashSql)),
    QueryDef("sim_ngram_jaccard", ngramJaccard, Some(ngramSql)),
    QueryDef("dedup_cluster", dedupCluster, Some(clusterSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("dedup_threshold_curve", dedupThresholdCurve, Some(dedupThresholdCurveSql)),
    QueryDef("pipeline_dedup_full", pipelineDedupFull, Some(pipelineDedupFullSql)),
    QueryDef("corpus_source_overlap", sourceOverlap, Some(sourceOverlapSql)),
    QueryDef("corpus_novelty", corpusNovelty, Some(corpusNoveltySql)),
    QueryDef("text_boilerplate", boilerplate, Some(boilerplateSql))
  )
}
