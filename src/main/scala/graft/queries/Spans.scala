package graft.queries

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** SURVEY.md §2.C — exact-substring duplication over `documents`.
  *
  * The doc-level dedup ops (minhash / simhash) answer "are these two
  * documents near-copies?". Production corpora also carry PARTIAL copies —
  * a quoted paragraph, a syndicated boilerplate block, a crawler re-stitch
  * — where the right action is to locate and cut the shared SPAN, not drop
  * a whole document (the exact-substring form of training-data dedup).
  *
  * Mechanism: positional K-token grams (K=8). Two documents sharing a run
  * of consecutive gram positions at a constant offset share an exact token
  * span of length run+K-1. Candidate generation is an equi-join on the
  * 64-bit gram hash over a df-capped inverted index (grams in more than
  * [[DfCap]] docs are hub terms — boilerplate detection's job, not span
  * matching's — and are dropped BEFORE the self-join, so fan-out per gram
  * is bounded at any corpus size). Run detection is the classic
  * pos − row_number() island trick, windowed on the compact
  * (doc_a, doc_b, offset) key — never a cross join, never a driver loop.
  *
  * At 100 TB the positional-gram pass is one corpus-token-scale shuffle
  * (the BM25 inverted-index shape) and everything after it is
  * candidate-scale. All outputs are BIGINT — nothing floating to hash.
  */
object Spans extends QueryModule {

  private[graft] val K = 8
  /** Inverted-index df cap: grams in more docs are hubs, not copy signal. */
  private val DfCap = 20
  /** Minimum shared-span length (tokens) to count as a duplicated span. */
  private val MinSpan = 20

  // ------------------------------------------------- positional grams
  /** (doc_id, pos, gh): every K-token gram occurrence with its 1-based
    * token position and 64-bit hash. Non-distinct (position matters) —
    * the positional twin of the shingle set. Memoized + cached: the df
    * aggregation and the inverted-index join both consume it.
    */
  private def posGrams(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "posgrams", dir) {
      Docs.enriched(s, dir)
        .filter(size(col("toks")) >= K)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(1, size(toks)-${K - 1}), k -> concat_ws(' ', slice(toks, k, $K)))")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), md5Long64(col("col")).as("gh"))
    }

  private val posGramsDuck =
    s"""SELECT doc_id, k AS pos, ${md5Long64Sql(s"list_aggregate(toks[k:k+${K - 1}], 'string_agg', ' ')")} AS gh
       |FROM (SELECT doc_id, ${Docs.toksDuck} AS toks FROM documents),
       |     unnest(generate_series(1, len(toks)-${K - 1})) AS u(k)
       |WHERE len(toks) >= $K""".stripMargin

  // ------------------------------------------------------- shared runs
  /** Maximal shared-span runs ≥ [[MinSpan]]: (doc_a, doc_b, span_tokens,
    * start_a, start_b). Shared by both span ops, so memoized (tiny — one
    * row per long duplicated span in the corpus).
    */
  private[graft] def spanRuns(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "span_runs", dir) {
      val pg = posGrams(s, dir)
      val df = pg.groupBy("gh").agg(countDistinct("doc_id").as("d"))
      val rare = pg.join(df.filter(col("d").between(2, DfCap)), Seq("gh"))
        .select("gh", "doc_id", "pos")
      val hits = rare.as("a")
        .join(rare.as("b"), col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pos_a"), col("b.pos").as("pos_b"),
          (col("a.pos") - col("b.pos")).as("diff"))
      val w = Window.partitionBy("doc_a", "doc_b", "diff").orderBy("pos_a")
      hits
        .withColumn("island", col("pos_a") - row_number().over(w))
        .groupBy("doc_a", "doc_b", "diff", "island")
        .agg((count(lit(1)) + (K - 1)).as("span_tokens"),
          min("pos_a").as("start_a"), min("pos_b").as("start_b"))
        .filter(col("span_tokens") >= MinSpan)
        .select("doc_a", "doc_b", "span_tokens", "start_a", "start_b")
    }

  /** Oracle CTE chain to the runs frame (materialized: both ops' oracles
    * reference it more than once).
    */
  private val spanRunsCtes =
    s"""pg AS (
       |$posGramsDuck
       |), gdf AS (SELECT gh, count(DISTINCT doc_id) AS d FROM pg GROUP BY gh),
       |rare AS (SELECT pg.gh, pg.doc_id, pg.pos FROM pg JOIN gdf USING (gh)
       |         WHERE gdf.d BETWEEN 2 AND $DfCap),
       |hits AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b,
       |         a.pos - b.pos AS diff
       |  FROM rare a JOIN rare b ON a.gh = b.gh AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT doc_a, doc_b, diff, pos_a, pos_b,
       |         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diff ORDER BY pos_a) AS island
       |  FROM hits),
       |runs AS MATERIALIZED (
       |  SELECT doc_a, doc_b,
       |         CAST(count(*) + ${K - 1} AS BIGINT) AS span_tokens,
       |         min(pos_a) AS start_a, min(pos_b) AS start_b
       |  FROM isl GROUP BY doc_a, doc_b, diff, island
       |  HAVING count(*) + ${K - 1} >= $MinSpan)""".stripMargin

  // --------------------------------------------------- dedup_substring
  /** Per cross-doc pair: the longest exactly-shared token span (and how
    * many distinct long spans the pair shares). The detector — its output
    * says WHERE the copy sits, which doc-level Jaccard cannot.
    */
  private[queries] def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    val runs = spanRuns(s, dir)
    val w = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("span_tokens").desc, col("start_a"), col("start_b"))
    runs
      .withColumn("rk", row_number().over(w))
      .withColumn("n_spans", count(lit(1)).over(Window.partitionBy("doc_a", "doc_b")))
      .filter(col("rk") === 1)
      .select("doc_a", "doc_b", "span_tokens", "start_a", "start_b", "n_spans")
      .orderBy("doc_a", "doc_b")
  }

  private[queries] val dedupSubstringSql =
    s"""WITH $spanRunsCtes,
       |r AS (
       |  SELECT doc_a, doc_b, span_tokens, start_a, start_b,
       |         row_number() OVER (PARTITION BY doc_a, doc_b
       |           ORDER BY span_tokens DESC, start_a, start_b) AS rk,
       |         CAST(count(*) OVER (PARTITION BY doc_a, doc_b) AS BIGINT) AS n_spans
       |  FROM runs)
       |SELECT doc_a, doc_b, span_tokens, start_a, start_b, n_spans
       |FROM r WHERE rk = 1 ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------- dedup_span_mask
  /** The curation ACTION for exact-substring dups: per victim document
    * (the higher doc_id of each pair — the min-id survivorship
    * convention), the merged token intervals to cut. Overlapping spans
    * from different partners merge via the running-max interval trick, so
    * a sequence writer can drop each masked range exactly once.
    */
  /** Merge overlapping [s, e] intervals per doc_id via the running-max
    * window trick — shared by the mask op and the generative property
    * test (PropertySpec drives it over arbitrary interval sets).
    */
  private[graft] def mergeIntervals(spans: DataFrame): DataFrame = {
    val ord = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevMax = max("e").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val grp = sum(when(col("s") > coalesce(prevMax, lit(-1L)), 1L).otherwise(0L))
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans
      .withColumn("grp", grp)
      .groupBy("doc_id", "grp")
      .agg(min("s").as("span_start"), max("e").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  private def dedupSpanMask(s: SparkSession, dir: String): DataFrame = {
    val spans = spanRuns(s, dir)
      .select(col("doc_b").as("doc_id"), col("start_b").as("s"),
        (col("start_b") + col("span_tokens") - 1).as("e"))
      .distinct()
    mergeIntervals(spans).orderBy("doc_id", "span_start")
  }

  private val dedupSpanMaskSql =
    s"""WITH $spanRunsCtes,
       |spans AS (
       |  SELECT DISTINCT doc_b AS doc_id, start_b AS s,
       |         start_b + span_tokens - 1 AS e
       |  FROM runs),
       |flagged AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS newgrp
       |  FROM spans),
       |grouped AS (
       |  SELECT doc_id, s, e,
       |         sum(newgrp) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM flagged)
       |SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
       |       max(e) - min(s) + 1 AS span_tokens
       |FROM grouped GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin

  // ----------------------------------------------------- corpus_ngrams
  /** Global top-50 word trigrams with total occurrences and document
    * frequency — the corpus-statistics table (Zipf head, template
    * detection, tokenizer sanity) every pipeline keeps. One gram-keyed
    * shuffle with map-side combine; top-K via TakeOrderedAndProject, rank
    * assigned on the constant 50-row result.
    */
  private val TopN = 50

  private def corpusNgrams(s: SparkSession, dir: String): DataFrame = {
    val grams = Docs.enriched(s, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks)-2), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2)))"))
        .as("gram"))
    val ord = Window.orderBy(col("tf").desc, col("gram"))
    grams.groupBy("gram")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("gram")).limit(TopN)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .orderBy("rank")
  }

  private val corpusNgramsSql =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks)-1), k -> toks[k] || ' ' || toks[k+1] || ' ' || toks[k+2])) AS gram
       |  FROM (SELECT doc_id, ${Docs.toksDuck} AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |st AS (
       |  SELECT gram, CAST(count(*) AS BIGINT) AS tf,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM g GROUP BY gram),
       |top AS (SELECT * FROM st ORDER BY tf DESC, gram LIMIT $TopN)
       |SELECT gram, tf, df,
       |       CAST(row_number() OVER (ORDER BY tf DESC, gram) AS BIGINT) AS rank
       |FROM top ORDER BY rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_substring", dedupSubstring, Some(dedupSubstringSql)),
    QueryDef("dedup_span_mask", dedupSpanMask, Some(dedupSpanMaskSql)),
    QueryDef("corpus_ngrams", corpusNgrams, Some(corpusNgramsSql))
  )
}
