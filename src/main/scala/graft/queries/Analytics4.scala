package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B (fourth tranche) — three event/order mining operators
  * added in round 6, each built on the bounded-reducer shapes the repo
  * standardized (Scale.saltedTopK two-phase ranking; no global windows
  * over data-scale inputs, no data-sized broadcast sides).
  *
  * Determinism (SURVEY §5): all outputs integer/string; every ranking has
  * a total ORDER BY with a unique-key tie-break shared verbatim by the
  * DuckDB twin.
  */
object Analytics4 extends QueryModule {

  // ---------------------------------------------- events_heavy_hitters
  // Exact top-20 users by event volume — the heavy-hitter report run
  // before sharding/salting decisions (who are the skew keys?). The
  // per-user count is one partial-aggregated shuffle (reducer input
  // bounded by distinct keys per partition); the GLOBAL top-20 is the
  // two-phase salted ranking, so the merge window sees at most
  // saltBuckets x K rows — never the user dimension.
  private val HhK = 20

  private def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.loadEvents(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    graft.dv.Scale.saltedTopK(counts, Seq.empty,
        Seq(col("n_events").desc, col("user_id")), col("user_id"), HhK)
      .select(col("rank").cast("long").as("rank"), col("user_id"), col("n_events"))
      .orderBy("rank")
  }

  private val heavyHittersSql =
    s"""WITH counts AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id),
       |r AS (
       |  SELECT user_id, n_events,
       |         row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
       |  FROM counts)
       |SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events
       |FROM r WHERE rank <= $HhK ORDER BY rank""".stripMargin

  // ---------------------------------------------- orders_basket_pairs
  // Market-basket co-occurrence: the top-50 part pairs ordered together.
  // ONE scan: baskets come from a collect_set per order (per-order
  // distinct-part counts are small and data-independent of corpus size,
  // so the set is bounded), pairs explode scan-locally after the group —
  // pair volume is ~n_orders x C(basket,2), LINEAR in the data, never an
  // all-pairs join over the part dimension (the first draft self-joined
  // the distinct frame and paid the lineitem scan + distinct shuffle
  // TWICE — the plan audit caught it). The global top-50 is the salted
  // two-phase rank.
  private val BasketK = 50

  /** Per-order distinct part baskets — the one-scan kernel basket pairs,
    * association rules and the triangle graph all derive from (the r14
    * restructure that collapsed three lineitem scans into one per op).
    * NOT memoized (r15; the r14 cross-query memo is gone per the r14
    * verdict): each consumer pays its own single aggregation so its bench
    * time measures the operator.
    */
  private[queries] def orderBaskets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(array_sort(collect_set(col("l_partkey"))).as("parts"))

  /** Co-purchase pair support (a < b, count of co-ordering orders) — the
    * shared kernel shape under orders_basket_pairs / orders_assoc_rules /
    * graph_triangles (un-memoized, see [[orderBaskets]]).
    */
  private[queries] def pairSupport(s: SparkSession, dir: String): DataFrame =
    orderBaskets(s, dir)
      .select(explode(expr(
        """CASE WHEN size(parts) < 2 THEN array()
          |ELSE flatten(transform(sequence(1, size(parts) - 1), i ->
          |  transform(sequence(i + 1, size(parts)), j ->
          |    named_struct('a', parts[i - 1], 'b', parts[j - 1]))))
          |END""".stripMargin)).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("support"))

  private def basketPairs(s: SparkSession, dir: String): DataFrame = {
    val support = pairSupport(s, dir)
      .select(col("a").as("p1"), col("b").as("p2"), col("support"))
    graft.dv.Scale.saltedTopK(support, Seq.empty,
        Seq(col("support").desc, col("p1"), col("p2")),
        col("p1") * lit(1000003L) + col("p2"), BasketK)
      .select(col("rank").cast("long").as("rank"), col("p1"), col("p2"), col("support"))
      .orderBy("rank")
  }

  private val basketPairsSql =
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |cnt AS (
       |  SELECT p1, p2, CAST(count(*) AS BIGINT) AS support FROM pairs GROUP BY p1, p2),
       |r AS (
       |  SELECT p1, p2, support,
       |         row_number() OVER (ORDER BY support DESC, p1, p2) AS rank
       |  FROM cnt)
       |SELECT CAST(rank AS BIGINT) AS rank, p1, p2, support
       |FROM r WHERE rank <= $BasketK ORDER BY rank""".stripMargin

  // ---------------------------------------------- orders_assoc_rules
  // Association-rule mining over the basket pairs: for the top-50
  // co-ordered part pairs, directed confidence (P(b|a), P(a|b)) and lift
  // — all in exact integer micro-units (n_ab·1e6 div n_a;
  // n_ab·n_orders·1e6 div n_a·n_b — products stay far inside int64 at
  // any SF since n_ab ≤ n_a ≤ n_orders). Adds one per-part order-count
  // aggregation and two broadcast joins on top of the basket-pairs
  // pipeline; the pair set is K-bounded before the joins, so the rule
  // computation is constant work.
  private def assocRules(s: SparkSession, dir: String): DataFrame = {
    // per-part order counts and the order total both derive from the
    // basket frame (r14 restructure): parts is the per-order DISTINCT set,
    // so exploding it reproduces op = SELECT DISTINCT (l_orderkey,
    // l_partkey) exactly, and the basket row count IS the distinct-order
    // count — three lineitem scans collapse into one shared aggregation
    // shape (the identical agg subtrees dedup via runtime exchange reuse)
    val baskets = orderBaskets(s, dir)
    val nOrders = SessionCache.memoVal(s, "n_basket_orders", dir)(baskets.count())
    val perPart = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val top = basketPairs(s, dir)
    top
      .join(Tables.broadcastDim(s, dir, "part",
        perPart.select(col("l_partkey").as("p1"), col("n_part").as("n_a"))), "p1")
      .join(Tables.broadcastDim(s, dir, "part",
        perPart.select(col("l_partkey").as("p2"), col("n_part").as("n_b"))), "p2")
      .select(col("rank"), col("p1"), col("p2"), col("support"), col("n_a"), col("n_b"),
        expr("support * 1000000 div n_a").as("conf_a_to_b_micro"),
        expr("support * 1000000 div n_b").as("conf_b_to_a_micro"),
        expr(s"support * $nOrders * 1000000 div (n_a * n_b)").as("lift_micro"))
      .orderBy("rank")
  }

  private val assocRulesSql =
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
       |per_part AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM op GROUP BY l_partkey),
       |pairs AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |cnt AS (
       |  SELECT p1, p2, CAST(count(*) AS BIGINT) AS support FROM pairs GROUP BY p1, p2),
       |r AS (
       |  SELECT p1, p2, support,
       |         row_number() OVER (ORDER BY support DESC, p1, p2) AS rank
       |  FROM cnt)
       |SELECT CAST(r.rank AS BIGINT) AS rank, r.p1, r.p2, r.support,
       |  pa.n_part AS n_a, pb.n_part AS n_b,
       |  r.support * 1000000 // pa.n_part AS conf_a_to_b_micro,
       |  r.support * 1000000 // pb.n_part AS conf_b_to_a_micro,
       |  r.support * (SELECT n FROM n_orders) * 1000000 // (pa.n_part * pb.n_part) AS lift_micro
       |FROM r
       |JOIN per_part pa ON pa.l_partkey = r.p1
       |JOIN per_part pb ON pb.l_partkey = r.p2
       |WHERE r.rank <= $BasketK
       |ORDER BY r.rank""".stripMargin

  // ------------------------------------------------- graph_triangles
  // Triangle counting on the DEGREE-CAPPED co-purchase graph (parts =
  // nodes; per node the top-20 co-ordered neighbors by (support desc,
  // neighbor) — the kNN-graph idiom, and the scale-honest edge bound: a
  // global support threshold or top-E cut is SF-fragile AND needs a
  // corpus-scale ranking, while the per-node cap is a keyed salted top-K
  // whose merge windows stay ≤ saltBuckets×D). With every edge stored
  // a < b, the canonical ordered-join kernel counts each triangle once:
  // wedges from ONE equi-join on the middle node (a<b<c by
  // construction), closed by one more equi-join on (a, c) — no
  // orientation dedup pass. Wedge fan-out ≤ D² per node. Output: top-10
  // parts by triangle participation.
  private val TriDegCap = 20
  private val TriK = 10

  private def triangleEdges(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "copurchase_edges", dir) {
      graft.dv.Scale.saltedTopK(pairSupport(s, dir), Seq("a"),
          Seq(col("support").desc, col("b")), col("b"), TriDegCap, "deg_rank")
        .select("a", "b")
    }

  private def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val e = triangleEdges(s, dir)
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), "b")
    val tris = wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select("a", "b", "c")
    val perPart = tris.select(explode(array(col("a"), col("b"), col("c"))).as("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_triangles"))
    graft.dv.Scale.saltedTopK(perPart, Seq.empty,
        Seq(col("n_triangles").desc, col("p_partkey")), col("p_partkey"), TriK)
      .select(col("rank").cast("long").as("rank"), col("p_partkey"), col("n_triangles"))
      .orderBy("rank")
  }

  private val graphTrianglesSql =
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b
       |  FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |e AS (
       |  SELECT a, b FROM (
       |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY s DESC, b) AS rk
       |    FROM (SELECT a, b, count(*) AS s FROM pairs GROUP BY a, b))
       |  WHERE rk <= $TriDegCap),
       |tris AS (
       |  SELECT w.a, w.b, w.c
       |  FROM (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e2.a = e1.b) w
       |  JOIN e e3 ON e3.a = w.a AND e3.b = w.c),
       |per_part AS (
       |  SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_triangles FROM (
       |    SELECT a AS p_partkey FROM tris
       |    UNION ALL SELECT b FROM tris
       |    UNION ALL SELECT c FROM tris)
       |  GROUP BY p_partkey),
       |r AS (
       |  SELECT p_partkey, n_triangles,
       |         row_number() OVER (ORDER BY n_triangles DESC, p_partkey) AS rank
       |  FROM per_part)
       |SELECT CAST(rank AS BIGINT) AS rank, p_partkey, n_triangles
       |FROM r WHERE rank <= $TriK ORDER BY rank""".stripMargin

  // -------------------------------------------- events_path_conversion
  // Conversion-path mining: among per-(user, day) event sequences (capped
  // at the first 12 events — both engines cap identically), the top-20
  // paths that contain a purchase, by frequency. The sequence builder is
  // one keyed aggregation (collect + array_sort — index-ordered, total
  // order via the unique event_id); path cardinality is what the final
  // aggregation keys on, and the top-20 is the salted two-phase rank.
  private val PathLen = 12
  private val PathK = 20

  private def pathConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
      .select(col("user_id"), to_date(timestamp_millis(col("tms"))).as("day"),
        col("tms"), col("event_id"), col("event_type"))
    val paths = ev.groupBy("user_id", "day")
      .agg(collect_list(struct(col("tms"), col("event_id"), col("event_type"))).as("evs"))
      .select(expr(s"transform(slice(array_sort(evs), 1, $PathLen), x -> x.event_type)").as("types"))
      .select(array_join(col("types"), ">").as("path"),
        array_contains(col("types"), "purchase").as("converted"))
      .filter(col("converted"))
      .groupBy("path").agg(count(lit(1)).as("n_user_days"))
    graft.dv.Scale.saltedTopK(paths, Seq.empty,
        Seq(col("n_user_days").desc, col("path")), xxhash64(col("path")), PathK)
      .select(col("rank").cast("long").as("rank"), col("path"), col("n_user_days"))
      .orderBy("rank")
  }

  private val pathConversionSql =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, epoch_ms(ts) AS tms, event_id, event_type
       |  FROM events),
       |seq AS (
       |  SELECT user_id, day, tms, event_id, event_type,
       |         row_number() OVER (PARTITION BY user_id, day ORDER BY tms, event_id) AS rn
       |  FROM ev),
       |paths AS (
       |  SELECT user_id, day,
       |         string_agg(event_type, '>' ORDER BY tms, event_id) AS path,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
       |  FROM seq WHERE rn <= $PathLen GROUP BY user_id, day),
       |cnt AS (
       |  SELECT path, CAST(count(*) AS BIGINT) AS n_user_days
       |  FROM paths WHERE converted = 1 GROUP BY path),
       |r AS (
       |  SELECT path, n_user_days,
       |         row_number() OVER (ORDER BY n_user_days DESC, path) AS rank
       |  FROM cnt)
       |SELECT CAST(rank AS BIGINT) AS rank, path, n_user_days
       |FROM r WHERE rank <= $PathK ORDER BY rank""".stripMargin

  // -------------------------------------------- events_inter_arrival
  // Inter-arrival cadence per event type — the feed-health metric a
  // pipeline watches for stalls and bursts: gaps are computed under
  // (user, type)-KEYED lag windows (never a type-partitioned window over
  // the whole corpus), then summarized per type with exact interpolated
  // percentiles (the stats_percentiles cross-engine convention:
  // percentile() and quantile_cont interpolate bit-identically).
  private def interArrival(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("tms", "event_id")
    Tables.loadEvents(s, dir)
      .select(col("user_id"), col("event_type"), col("tms"), col("event_id"))
      .withColumn("prev", lag("tms", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_ms", col("tms") - col("prev"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_ms, 0.5)").as("p50_ms"),
        expr("percentile(gap_ms, 0.9)").as("p90_ms"),
        expr("percentile(gap_ms, 0.99)").as("p99_ms"))
      .orderBy("event_type")
  }

  private val interArrivalSql =
    """WITH g AS (
      |  SELECT event_type,
      |         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
      |           PARTITION BY user_id, event_type ORDER BY epoch_ms(ts), event_id) AS gap_ms
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |       quantile_cont(gap_ms, 0.5) AS p50_ms,
      |       quantile_cont(gap_ms, 0.9) AS p90_ms,
      |       quantile_cont(gap_ms, 0.99) AS p99_ms
      |FROM g WHERE gap_ms IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("events_inter_arrival", interArrival, Some(interArrivalSql)),
    QueryDef("events_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    QueryDef("orders_assoc_rules", assocRules, Some(assocRulesSql)),
    QueryDef("graph_triangles", graphTriangles, Some(graphTrianglesSql)),
    QueryDef("orders_basket_pairs", basketPairs, Some(basketPairsSql)),
    QueryDef("events_path_conversion", pathConversion, Some(pathConversionSql))
  )
}
