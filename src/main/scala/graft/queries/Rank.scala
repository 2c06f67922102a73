package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C — ranking operators: lexical retrieval over the corpus
  * (BM25-shaped scoring, the sparse half of a hybrid search stack beside
  * the dense ANN ops) and graph authority (PageRank), both with exact
  * cross-engine arithmetic.
  *
  * Determinism (SURVEY §5): no libm anywhere — BM25's idf is the
  * Robertson–Sparck-Jones RATIO without the log (documented below), so
  * scoring is double products/ratios of exact integers in one fixed
  * written order: IEEE *, /, + are correctly rounded identically in both
  * engines (libm transcendentals are the only float hazard), and the
  * per-term scores are floor-scaled to BIGINT micro-units BEFORE
  * summation so accumulation is order-free integer addition. PageRank
  * never leaves BIGINT (integer division only).
  */
object Rank extends QueryModule {

  // ------------------------------------------------------------ text_bm25
  // Lexical top-k retrieval: a CONSTANT query set (the knn_cosine pattern —
  // queries are the bounded side by construction) against a term inverted
  // index. Corpus-scale work: one token scan filtered to query terms by a
  // broadcast semi-join, then ONE (doc, term) shuffle; df and query
  // mapping re-attach as vocabulary-sized broadcasts. The BM25 tf
  // saturation term uses k1=1.2, b=0.75 multiplied through by 10·T so the
  // numerator/denominator stay integers:
  //   tf_part = 22·T·tf / (10·T·tf + 3·T + 9·dl·N)     (= (k1+1)·tf / (tf + k1·(1-b+b·dl/avgdl)))
  //   idf     = (2·(N-df)+1) / (2·df+1)                (RSJ ratio, log-free)
  //   s_micro = floor(idf · tf_part · 1e6)  per term, summed as BIGINT.
  private val Bm25K = 10
  private val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "window"),
    2L -> Seq("hash", "join", "table"),
    3L -> Seq("customer", "query"),
    4L -> Seq("scan", "filter", "slow"),
    5L -> Seq("stream", "batch", "merge"),
    6L -> Seq("vector", "sort", "group"))

  /** Per (query, doc, term): tf, the BM25 micro-score, and the raw tf —
    * shared by text_bm25 and rank_fusion, memoized per session so the
    * token scan and the corpus-stats collect run once.
    */
  private def scoredTerms(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "bm25scored", dir) {
      import s.implicits._
      val docs = Docs.enriched(s, dir)
        .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      // Corpus stats: one aggregate, bounded 1-row collect (the q11 pattern).
      val stats = docs.agg(count(lit(1)).cast("long"), sum("dl")).head()
      val (n, t) = (stats.getLong(0), stats.getLong(1))
      val qterms = Bm25Queries
        .flatMap { case (q, ts) => ts.map(tm => (q, tm)) }.toDF("query_id", "term")
      val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(broadcast(qterms.select("term").distinct()), Seq("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df_), Seq("term"))
        .join(broadcast(qterms), Seq("term"))
        // Double-FIRST products (not int64-then-cast): 22·T·tf overflows
        // int64 once T·tf > ~4e17 — reachable on a 100 TB corpus — and
        // Spark wraps where DuckDB errors. Double multiplication of exact
        // integers is correctly rounded identically in both engines, and
        // bit-equals the integer path everywhere below 2^53.
        .withColumn("s_micro", expr(
          s"""cast(floor(
             |  ((2.0d * (${n}L - df) + 1.0d) / (2.0d * df + 1.0d))
             |  * ((22.0d * ${t}L * tf)
             |     / (10.0d * ${t}L * tf + 3.0d * ${t}L + 9.0d * dl * ${n}L))
             |  * 1000000.0d) as bigint)""".stripMargin))
    }

  /** Top-K per query over an aggregated score column, rank = dense 1..K. */
  private def topK(agg: DataFrame, scoreCol: String): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col(scoreCol).desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Bm25K)
  }

  private def bm25(s: SparkSession, dir: String): DataFrame =
    topK(scoredTerms(s, dir).groupBy("query_id", "doc_id")
        .agg(sum("s_micro").as("score_micro")), "score_micro")
      .select("query_id", "rank", "doc_id", "score_micro")
      .orderBy("query_id", "rank")

  /** Shared oracle CTE chain up through the per-(query, doc, term) scores —
    * text_bm25 and rank_fusion aggregate it differently.
    */
  private val bm25CoreCtes = {
    val qrows = Bm25Queries
      .flatMap { case (q, ts) => ts.map(tm => s"($q, '$tm')") }.mkString(", ")
    s"""q(query_id, term) AS (VALUES $qrows),
       |d AS (SELECT doc_id, ${Docs.toksDuck} AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
       |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |scored AS (
       |  -- every float literal cast ::DOUBLE: DuckDB types bare 2.0 as
       |  -- DECIMAL and would compute these products EXACTLY, rounding
       |  -- once at the division — Spark rounds stepwise in IEEE doubles,
       |  -- and above 2^53 the two disagree. The casts force the same
       |  -- stepwise double evaluation on both engines.
       |  SELECT q.query_id, tf.doc_id, tf.tf,
       |    CAST(floor(
       |      ((2.0::DOUBLE * (c.n - df.df) + 1.0::DOUBLE) / (2.0::DOUBLE * df.df + 1.0::DOUBLE))
       |      * ((22.0::DOUBLE * c.t * tf.tf)
       |         / (10.0::DOUBLE * c.t * tf.tf + 3.0::DOUBLE * c.t + 9.0::DOUBLE * dl.dl * c.n))
       |      * 1000000.0::DOUBLE) AS BIGINT) AS s_micro
       |  FROM tf
       |  JOIN q ON q.term = tf.term
       |  JOIN df ON df.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN corpus c),
       |agg AS (
       |  SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro
       |  FROM scored GROUP BY query_id, doc_id)""".stripMargin
  }

  private val bm25Sql =
    s"""WITH $bm25CoreCtes,
       |r AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM agg)
       |SELECT query_id, rank, doc_id, score_micro
       |FROM r WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------- rank_fusion
  // Reciprocal-rank fusion (the standard hybrid-retrieval combiner): two
  // rankers over the same query set — BM25 (tf-saturated) and raw
  // tf-sum — fuse as Σ 1e6 div (60 + rank), integer division only.
  // The fusion is rank-arithmetic over the two top-K lists (K-bounded
  // per query, a constant-size full-outer join), so the corpus-scale
  // work is the same single shared scoredTerms pass BM25 already pays —
  // the pattern that at 100 TB fuses a dense ANN list with this sparse
  // list without touching the corpus again.
  private def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val st = scoredTerms(s, dir)
    val ra = topK(st.groupBy("query_id", "doc_id")
        .agg(sum("s_micro").as("score_micro")), "score_micro")
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val rb = topK(st.groupBy("query_id", "doc_id")
        .agg(sum("tf").as("tf_sum")), "tf_sum")
      .select(col("query_id").as("qb"), col("doc_id").as("db"), col("rank").as("rank_b"))
    val fused = ra.join(rb,
        col("query_id") === col("qb") && col("doc_id") === col("db"), "full_outer")
      .select(coalesce(col("query_id"), col("qb")).as("query_id"),
        coalesce(col("doc_id"), col("db")).as("doc_id"),
        (coalesce(expr("1000000L div (60L + rank_a)"), lit(0L)) +
          coalesce(expr("1000000L div (60L + rank_b)"), lit(0L))).as("rrf_micro"))
    topK(fused, "rrf_micro")
      .select("query_id", "rank", "doc_id", "rrf_micro")
      .orderBy("query_id", "rank")
  }

  private val rankFusionSql =
    s"""WITH $bm25CoreCtes,
       |tfagg AS (
       |  SELECT query_id, doc_id, CAST(sum(tf) AS BIGINT) AS tf_sum
       |  FROM scored GROUP BY query_id, doc_id),
       |ra AS (
       |  SELECT query_id, doc_id, rank_a FROM (
       |    SELECT query_id, doc_id, CAST(row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank_a
       |    FROM agg) WHERE rank_a <= $Bm25K),
       |rb AS (
       |  SELECT query_id AS qb, doc_id AS db, rank_b FROM (
       |    SELECT query_id, doc_id, CAST(row_number() OVER (
       |      PARTITION BY query_id ORDER BY tf_sum DESC, doc_id) AS BIGINT) AS rank_b
       |    FROM tfagg) WHERE rank_b <= $Bm25K),
       |fused AS (
       |  SELECT COALESCE(query_id, qb) AS query_id, COALESCE(doc_id, db) AS doc_id,
       |    CAST(COALESCE(1000000 // (60 + rank_a), 0)
       |       + COALESCE(1000000 // (60 + rank_b), 0) AS BIGINT) AS rrf_micro
       |  FROM ra FULL OUTER JOIN rb ON qb = query_id AND db = doc_id),
       |r AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM fused)
       |SELECT query_id, rank, doc_id, rrf_micro
       |FROM r WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------- graph_pagerank
  // Authority over the customer↔supplier trade graph (an edge per distinct
  // trading pair through orders⋈lineitem, symmetrized) — the iterative
  // graph kernel a curation pipeline uses for source/domain authority
  // weighting. Exact BIGINT arithmetic end to end: ranks in pico-units
  // (1e12), per-edge contribution = rank div out-degree, damping 85/100 —
  // integer division only, identical both engines (all values positive, so
  // DuckDB's floor-// equals Spark's truncating div). Each round is one
  // edge equi-join + one dst-keyed aggregation (the textbook distributed
  // PageRank shuffle shape); the rounds CHAIN without per-round
  // checkpointing — each step references the iterated frame once, so
  // lineage grows linearly (the SURVEY §6 geometric-blowup rule applies
  // only to multi-reference steps like dedup_cluster/BPE) — while the
  // re-joined edge frame is materialized once up front.
  private val PrScale = 1000000000000L
  private val PrIters = 4

  /** The symmetrized (src, dst, deg) trade-graph frame, un-checkpointed —
    * package-visible because pagerank's eager localCheckpoint construction
    * hides these joins from the ScaleSpec full sweep (its surfaced plan is
    * a checkpoint scan), so RankSpec plan-audits this frame and
    * [[prIteration]] directly instead.
    */
  private[graft] def prEdges(s: SparkSession, dir: String): DataFrame =
    prEdgesOver(prPairs(s, dir))

  /** The distinct (customer, supplier) trading pairs — the expensive half
    * of the edge build (orders ⋈ lineitem + distinct). Split out so
    * pagerank() can materialize THIS frame once: the edge derivation
    * references it three times (two union branches + the degree
    * aggregation), and an unmaterialized plan re-evaluated the join +
    * distinct per reference (r15 — measured ~1 s of pagerank's per-run
    * cost was the duplicated subtree; runtime exchange reuse only dedups
    * the distinct's exchange, not the degree aggregation above it).
    */
  private[graft] def prPairs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()

  /** Symmetrize + degree-annotate a (possibly materialized) pair frame. */
  private[graft] def prEdgesOver(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    edges.join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
  }

  /** One PageRank round: rank flows src→dst over the degree-annotated
    * edges, one equi-join + one dst-keyed aggregation. `broadcastRank`
    * makes the intended small-n broadcast EXPLICIT (r14, guide §3.1): the
    * localCheckpoint'd frames are LogicalRDDs with no size statistics, so
    * the planner defaulted every round to SortMergeJoin — both sides
    * exchanged + sorted per round, relying on AQE to notice at runtime.
    * With the hint the rounds plan broadcast statically and the edge side
    * never exchanges (the choice stays gated on the measured node count —
    * pagerank() passes it only below PrBroadcastableNodes).
    */
  private[graft] def prIteration(edgesD: DataFrame, rank: DataFrame, tele: Long,
                                 broadcastRank: Boolean = false): DataFrame =
    edgesD.join(if (broadcastRank) broadcast(rank) else rank,
        edgesD("src") === rank("node_id"))
      .select(col("dst"), expr("r div deg").as("contrib"))
      .groupBy("dst").agg(sum("contrib").as("csum"))
      .select(col("dst").as("node_id"),
        (lit(tele) + expr("(85L * csum) div 100L")).as("r"))

  /** Above this node count the rank frame (~16 B/row) outgrows the 64 MB
    * broadcast threshold, the round joins plan as shuffle joins, and the
    * un-partitioned edge frame would re-shuffle EVERY round.
    */
  private val PrBroadcastableNodes = 4000000L

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    // Materialize the PAIR frame first (r15): the edge derivation below
    // references it three times, so checkpointing only the finished edge
    // frame paid the orders ⋈ lineitem + distinct more than once inside
    // one materialization. pairsD holds half the edge rows; the union +
    // degree join then run over checkpoint blocks.
    val pairsD = prPairs(s, dir).localCheckpoint()
    // (src, dst, deg) materialized once: every iteration re-joins it.
    val edgesRaw = prEdgesOver(pairsD).localCheckpoint()
    // Node count: one aggregate off the materialized edges — bounded.
    val n = edgesRaw.select("src").distinct().count()
    // ADAPTIVE pre-partitioning (r10 verdict #4, gated like the staging
    // threshold): below PrBroadcastableNodes the rank frame broadcasts
    // into every round join, so the edge side never shuffles anyway and
    // an up-front repartition is pure cost (measured +14 s at sf10,
    // where n = 16k). Past it the rounds plan as shuffle joins and the
    // un-partitioned edge set would re-shuffle all 4 rounds — there we
    // hash-partition ON THE JOIN KEY once and re-materialize:
    // localCheckpoint preserves the physical output partitioning into
    // the LogicalRDD, so each round's src-equi-join finds its clustered
    // distribution already satisfied on the (corpus-scale) edge side and
    // only the (node-scale) rank frame moves — the DvLoader.storedSide
    // bucketing discipline applied to the iteration. RankSpec pins the
    // partitioned round plan edge-side-exchange-free under forced
    // shuffle joins.
    val edgesD =
      if (n <= PrBroadcastableNodes) edgesRaw
      else edgesRaw.repartition(col("src")).localCheckpoint()
    val r0 = PrScale / n
    val tele = (15L * r0) / 100L
    var rank = edgesD.select(col("src").as("node_id")).distinct()
      .withColumn("r", lit(r0))
    // No per-round localCheckpoint: prIteration references the iterated
    // frame ONCE, so lineage grows linearly (4 chained join+agg stages in
    // one job) — the geometric-blowup rule (SURVEY §6) applies only to
    // steps that re-reference the iterated frame. edgesD IS materialized
    // above: it is re-joined every round.
    for (_ <- 1 to PrIters)
      rank = prIteration(edgesD, rank, tele, broadcastRank = n <= PrBroadcastableNodes)
    rank.select(col("node_id"),
        when(col("node_id") % 2 === 0, "customer").otherwise("supplier").as("node_type"),
        col("r").as("rank_pico"))
      .orderBy(col("rank_pico").desc, col("node_id"))
  }

  private val pagerankSql = {
    val iters = (1 to PrIters).map { i =>
      val prev = if (i == 1) "r0" else s"i${i - 1}"
      s"""i$i AS (
         |  SELECT e.dst AS node_id,
         |         CAST(p.tele + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
         |  FROM edges e
         |  JOIN deg d ON d.src = e.src
         |  JOIN $prev r ON r.node_id = e.src
         |  CROSS JOIN params p
         |  GROUP BY e.dst, p.tele)"""
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION ALL SELECT s AS src, c AS dst FROM pairs),
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |params AS (
       |  SELECT CAST($PrScale // count(*) AS BIGINT) AS r0,
       |         CAST((15 * ($PrScale // count(*))) // 100 AS BIGINT) AS tele
       |  FROM deg),
       |r0 AS (SELECT src AS node_id, p.r0 AS r FROM deg CROSS JOIN params p),
       |$iters
       |SELECT node_id,
       |       CASE WHEN node_id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |       r AS rank_pico
       |FROM i$PrIters ORDER BY rank_pico DESC, node_id""".stripMargin
  }

  // --------------------------------------------------------- search_hybrid
  // END-TO-END hybrid retrieval — the production "related documents"
  // query: for each probe document, fuse a DENSE ranking (exact cosine
  // over its embedding; doc_id and vec_id share an id space) with a
  // SPARSE ranking (word-bigram Jaccard against the corpus bigram sets)
  // by reciprocal-rank fusion. rank_fusion fuses two lexical rankers
  // over one shared pass; this op is the real two-modality stack — the
  // embedding side sees semantics the lexical side cannot, and the RRF
  // combiner needs no score calibration between them. Scale: the probe
  // set is a CONSTANT broadcast on both sides (the knn_cosine shape —
  // corpus work is one scan per modality), the sparse candidate join is
  // an equi-join on the bigram key, the fusion is a K-bounded
  // constant-size full-outer join, and every output is BIGINT (jaccard
  // in integer micro-units, cosine used for ordering only — the
  // bit-identical-double knn convention).
  private val HybridProbes = 20L
  private val HybridDim = 64

  private def searchHybrid(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftColumns.graftCosine
    // dense ranking: exact cosine over the probe embeddings
    val vecs = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") < HybridProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // two-phase salted top-K (VERDICT r5 #1): the dense candidate stream is
    // corpus-sized per probe, so the per-query ranking runs as local
    // (query_id, doc-salt) top-Ks inside the scan, then a bounded merge —
    // no window partition holds the corpus.
    val densePairs = vecs.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        graftCosine(col("qe"), col("embedding")).as("cosine"))
    val rd = graft.dv.Scale.saltedTopK(densePairs, Seq("query_id"),
        Seq(col("cosine").desc, col("doc_id")), col("doc_id"), Bm25K, "rank_dense_i")
      .withColumn("rank_dense", col("rank_dense_i").cast("long"))
      .select("query_id", "doc_id", "rank_dense")
    // sparse ranking: bigram-set Jaccard against the probe docs
    val bg = Dedup.bigrams(s, dir)
    val sizes = Dedup.bigramSizes(s, dir) // shared with sim_ngram_jaccard (r14)
    val pbg = broadcast(bg.filter(col("doc_id") < HybridProbes)
      .select(col("doc_id").as("query_id"), col("bg")))
    val psz = broadcast(sizes.filter(col("doc_id") < HybridProbes)
      .select(col("doc_id").as("query_id"), col("n").as("n_q")))
    val ws = Window.partitionBy("query_id").orderBy(col("jac_micro").desc, col("doc_id"))
    val rs = bg.join(pbg, Seq("bg")).filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_common"))
      .join(sizes, "doc_id").join(psz, "query_id")
      .select(col("query_id").as("qb"), col("doc_id").as("db"),
        expr("(n_common * 1000000) div (n_q + n - n_common)").as("jac_micro"))
      .withColumn("rank_sparse", row_number().over(
        Window.partitionBy("qb").orderBy(col("jac_micro").desc, col("db"))).cast("long"))
      .filter(col("rank_sparse") <= Bm25K)
      .select("qb", "db", "rank_sparse")
    // reciprocal-rank fusion over the two K-bounded lists
    val fused = rd.join(rs,
        col("query_id") === col("qb") && col("doc_id") === col("db"), "full_outer")
      .select(coalesce(col("query_id"), col("qb")).as("query_id"),
        coalesce(col("doc_id"), col("db")).as("doc_id"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        (coalesce(expr("1000000L div (60L + rank_dense)"), lit(0L)) +
          coalesce(expr("1000000L div (60L + rank_sparse)"), lit(0L))).as("rrf_micro"))
    val wf = Window.partitionBy("query_id").orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= Bm25K)
      .select("query_id", "rank", "doc_id", "rrf_micro", "rank_dense", "rank_sparse")
      .orderBy("query_id", "rank")
  }

  private def hybDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $HybridDim), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private val searchHybridSql =
    s"""WITH vecs AS (
       |  SELECT vec_id, embedding, ${hybDot("embedding", "embedding")} AS nrm FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM vecs WHERE vec_id < $HybridProbes),
       |rd AS (
       |  SELECT query_id, doc_id, rank_dense FROM (
       |    SELECT p.query_id, v.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY ${hybDot("p.qe", "v.embedding")} / (sqrt(p.qn) * sqrt(v.nrm)) DESC, v.vec_id) AS BIGINT) AS rank_dense
       |    FROM vecs v JOIN probes p ON v.vec_id <> p.query_id)
       |  WHERE rank_dense <= $Bm25K),
       |bg AS MATERIALIZED ($bigramsDuckRef),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_id AS query_id, c.doc_id, CAST(count(*) AS BIGINT) AS n_common
       |  FROM bg c JOIN bg p ON p.bg = c.bg
       |  WHERE p.doc_id < $HybridProbes AND c.doc_id <> p.doc_id
       |  GROUP BY p.doc_id, c.doc_id),
       |rs AS (
       |  SELECT query_id AS qb, doc_id AS db, rank_sparse FROM (
       |    SELECT i.query_id, i.doc_id,
       |      CAST(row_number() OVER (PARTITION BY i.query_id
       |        ORDER BY (i.n_common * 1000000) // (sq.n + sc.n - i.n_common) DESC, i.doc_id) AS BIGINT) AS rank_sparse
       |    FROM inter i
       |    JOIN sizes sq ON sq.doc_id = i.query_id
       |    JOIN sizes sc ON sc.doc_id = i.doc_id)
       |  WHERE rank_sparse <= $Bm25K),
       |fused AS (
       |  SELECT coalesce(rd.query_id, rs.qb) AS query_id,
       |         coalesce(rd.doc_id, rs.db) AS doc_id,
       |         coalesce(rd.rank_dense, 0) AS rank_dense,
       |         coalesce(rs.rank_sparse, 0) AS rank_sparse,
       |         coalesce(1000000 // (60 + rd.rank_dense), 0)
       |           + coalesce(1000000 // (60 + rs.rank_sparse), 0) AS rrf_micro
       |  FROM rd FULL JOIN rs ON rs.qb = rd.query_id AND rs.db = rd.doc_id)
       |SELECT query_id, rank, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       |       rank_dense, rank_sparse
       |FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM fused)
       |WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin

  private def bigramsDuckRef: String = Dedup.bigramsDuck

  val defs: Seq[QueryDef] = Seq(
    QueryDef("text_bm25", bm25, Some(bm25Sql)),
    QueryDef("rank_fusion", rankFusion, Some(rankFusionSql)),
    QueryDef("search_hybrid", searchHybrid, Some(searchHybridSql)),
    QueryDef("graph_pagerank", pagerank, Some(pagerankSql))
  )
}
