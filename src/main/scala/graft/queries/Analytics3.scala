package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B (third tranche) — q2 and q11, the last two TPC-H forms,
  * closing the full 22. The testdata has no `partsupp`, so both adapt the
  * part-supplier relation from `lineitem` (the same reduced-schema
  * adaptation q12/q19/q22 use): a supplier "supplies" a part iff it
  * shipped it, and its supply cost is its cheapest shipped line price.
  *
  * Determinism (SURVEY §5): all money math decimal-first, the global
  * fraction threshold in q11 is an exact integer-multiplier compare
  * (value*1000 > total — no division, no doubles), and every output has
  * a total deterministic ORDER BY including the supplier/part keys.
  */
object Analytics3 extends QueryModule with MoneyArithmetic {

  // ------------------------------------------------ q2_min_cost_supplier
  // Q2's shape: a per-part aggregate subquery (min supply cost within a
  // region) joined back against the supplying relation to pick the
  // cheapest supplier(s) for each selected part. Decorrelated into two
  // aggregations on the part key — co-partitioned, so the min-cost join
  // is shuffle-free after the first exchange. Supplier⋈nation⋈region and
  // part are broadcast dimension sides; the only corpus-scale work is
  // the (part, supp) aggregation of lineitem.
  private val Q2Region = "EUROPE"
  private val Q2Type = "STANDARD"
  private val Q2MaxSize = 10
  private val Q2TopK = 100

  private def q2(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === Q2Region)
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val partKeys = Tables.load(s, dir, "part")
      .filter(col("p_type") === Q2Type && col("p_size") <= Q2MaxSize)
      .select("p_partkey")
    // Pre-filter the big side BEFORE the (part, supp) aggregation (r14,
    // guide §3.2): only filtered-part × region-supplier lines can reach
    // the output — the min-cost subquery groups by (partkey, suppkey), so
    // dropping non-qualifying groups before the aggregate leaves every
    // surviving group's min unchanged. Two broadcast semi-joins cut the
    // rows entering the only corpus-scale exchange by ~the dimension
    // selectivities instead of aggregating all of lineitem.
    val cost = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(Tables.broadcastDim(s, dir, "part", partKeys),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.broadcastDim(s, dir, "supplier", supp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec2(col("l_extendedprice"))).as("cost"))
    val sc = cost.join(Tables.broadcastDim(s, dir, "supplier", supp), col("l_suppkey") === col("s_suppkey"))
    val minc = sc.groupBy(col("l_partkey").as("pk")).agg(min("cost").as("min_cost"))
    val parts = Tables.load(s, dir, "part")
      .filter(col("p_type") === Q2Type && col("p_size") <= Q2MaxSize)
      .select("p_partkey", "p_brand")
    sc.join(minc, col("l_partkey") === col("pk") && col("cost") === col("min_cost"))
      .join(Tables.broadcastDim(s, dir, "part", parts), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), col("cost").cast("double").as("supply_cost"), col("s_suppkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(Q2TopK)
  }

  private val q2Sql = s"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = '$Q2Region'),
    sc AS (
      SELECT c.l_partkey, c.cost, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name
      FROM cost c JOIN supp s ON s.s_suppkey = c.l_suppkey),
    minc AS (
      SELECT l_partkey AS pk, min(cost) AS min_cost FROM sc GROUP BY l_partkey)
    SELECT sc.s_acctbal, sc.s_name, sc.n_name, p.p_partkey, p.p_brand,
           CAST(sc.cost AS DOUBLE) AS supply_cost, sc.s_suppkey
    FROM sc
    JOIN minc ON minc.pk = sc.l_partkey AND sc.cost = minc.min_cost
    JOIN part p ON p.p_partkey = sc.l_partkey
    WHERE p.p_type = '$Q2Type' AND p.p_size <= $Q2MaxSize
    ORDER BY sc.s_acctbal DESC, sc.n_name, sc.s_name, p.p_partkey, sc.s_suppkey
    LIMIT $Q2TopK"""

  // ------------------------------------------------- q11_important_parts
  // Q11's shape: per-group value vs a fraction of the GLOBAL total. The
  // corpus-scale work is one (part) aggregation of the nation's lines;
  // the global total is a bounded ONE-ROW collect off that same compact
  // per-part frame (the BPE-argmax pattern), inlined as an exact decimal
  // literal — no single-partition window, no constant-key join for the
  // plan sweep to ban. The fraction compare is value*1000 > total:
  // integer multiplier, exact in both engines.
  // Region, not the classic single nation: the synthetic testdata has only
  // 10 suppliers at sf0.001 and some nations are empty there — a region is
  // populated at every SF, so the op is non-hollow at all three gates.
  private val Q11Region = "ASIA"

  private def q11(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === Q11Region)
      .select("s_suppkey")
    // localCheckpoint: the total collect and the filtered output are two
    // actions over this lineage — without materializing the compact
    // per-part frame the corpus aggregation would run twice.
    val value = Tables.load(s, dir, "lineitem")
      .join(Tables.broadcastDim(s, dir, "supplier", supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(discPrice).as("value"))
      .localCheckpoint()
    val total = value.agg(sum(col("value"))).head().getDecimal(0)
    value.filter(col("value") * lit(1000) > lit(total))
      .select(col("l_partkey").as("p_partkey"),
        col("value").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  private val q11Sql = s"""
    WITH supp AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = '$Q11Region'),
    value AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS value
      FROM lineitem JOIN supp ON s_suppkey = l_suppkey
      GROUP BY l_partkey),
    total AS (SELECT sum(value) AS t FROM value)
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
    FROM value, total
    WHERE value * 1000 > t
    ORDER BY part_value DESC, p_partkey"""

  // --------------------------------------------------- agg_grouping_sets
  // The third member of the multi-dimensional aggregate family (rollup and
  // cube are #23/#24): explicit GROUPING SETS with grouping_id
  // disambiguating a real NULL group from an aggregated-away dimension.
  // SQL surface deliberately (no DataFrame API for arbitrary sets) —
  // Catalyst expands it to one Expand + one aggregation, the same plan
  // shape rollup gets. Both engines put the FIRST grouping_id argument in
  // the most significant bit (Postgres semantics).
  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("c_mktsegment"), dec2(col("o_totalprice")).as("price"))
      .createOrReplaceTempView("graft_gs_src")
    s.sql("""
      SELECT coalesce(r_name, 'ALL') AS region,
             coalesce(c_mktsegment, 'ALL') AS segment,
             cast(grouping_id(r_name, c_mktsegment) as bigint) AS gid,
             cast(sum(price) as double) AS revenue,
             count(*) AS n_orders
      FROM graft_gs_src
      GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment))
      ORDER BY gid, region, segment""")
  }

  private val groupingSetsSql = """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(c_mktsegment, 'ALL') AS segment,
           CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS gid,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment))
    ORDER BY gid, region, segment"""

  // -------------------------------------------------------- events_pivot
  // PIVOT with an EXPLICIT value list: the implicit form would scan the
  // data to discover column names (a driver-side distinct at corpus
  // scale, and a schema that drifts with the data) — the fixed list keeps
  // the plan one groupBy + conditional aggregation, schema static.
  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  private def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    Tables.loadEvents(s, dir)
      .withColumn("day", to_date(timestamp_millis(col("tms"))).cast("string"))
      .groupBy("day").pivot("event_type", PivotTypes).agg(count(lit(1)))
      .na.fill(0L, PivotTypes)
      .select(col("day") +: PivotTypes.map(t => col(t).as(s"n_$t")): _*)
      .orderBy("day")
  }

  private val eventsPivotSql = {
    val cols = PivotTypes.map(t =>
      s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS n_$t").mkString(",\n           ")
    s"""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       |           $cols
       |    FROM events GROUP BY day ORDER BY day""".stripMargin
  }

  // --------------------------------------------------- events_transitions
  // First-order Markov transition matrix over the event stream — the path-
  // analysis primitive behind "what do users do after X". One keyed window
  // (per-user lag, never global) produces the (prev, next) pairs; two
  // aggregations over the TYPE×TYPE key space (25 cells here — bounded by
  // the type vocabulary, not the corpus) give counts and the per-prev
  // transition probability. Probability is exact BIGINT micro-units
  // ((n·1e6) div total — integer division, identical both engines); the
  // corpus-scale work is the one per-user shuffle every sessionize-family
  // op already pays.
  private def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    // ms + event_id ordering — the sessionize-family convention, and the
    // exact order the streaming twin (Streams.transitionsStream) uses, so
    // batch replay reproduces the stream's pairs under same-ms ties.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tms", "event_id")
    val pairs = Tables.loadEvents(s, dir)
      .select(col("user_id"), col("tms"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("prev_type")
      .agg(sum("n_transitions").as("n_from_prev"))
    pairs.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n_transitions"),
        col("n_from_prev"),
        // widen the product to DECIMAL(38,0) (oracle: HUGEINT) — a bare
        // int64 n·1e6 wraps once one cell passes ~9e12 transitions; div
        // stays exact integral division and the quotient is ≤ 1e6
        expr("(cast(n_transitions as decimal(38,0)) * 1000000) div n_from_prev")
          .as("p_micro"))
      .orderBy("prev_type", "next_type")
  }

  private val eventsTransitionsSql = """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type),
    totals AS (
      SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS n_from_prev
      FROM pairs GROUP BY prev_type)
    SELECT p.prev_type, p.next_type, p.n_transitions, t.n_from_prev,
           CAST((CAST(p.n_transitions AS HUGEINT) * 1000000) // t.n_from_prev AS BIGINT) AS p_micro
    FROM pairs p JOIN totals t ON t.prev_type = p.prev_type
    ORDER BY p.prev_type, p.next_type"""

  // --------------------------------------------------- events_attribution
  // Last-touch marketing attribution — for every purchase, the most recent
  // preceding click/view by the same user within a 30-minute window (the
  // conversion-credit primitive behind funnel ROI). One keyed window per
  // user carries the last touch forward (IGNORE NULLS last_value over an
  // explicit ROWS frame — Spark's default RANGE frame would include
  // same-ms ties, DuckDB's ROWS would not, so the frame is pinned to the
  // sessionize-family (tms, event_id) ROWS order in both engines). All
  // outputs BIGINT/string; unattributed purchases carry explicit 'none'
  // / -1 sentinels, so both classes land in the oracle hash.
  private val AttribWindowMs = 1800000L

  private def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val isTouch = col("event_type").isin("click", "view")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tms", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tagged = Tables.loadEvents(s, dir)
      .select(col("event_id"), col("user_id"), col("tms"), col("event_type"))
      .withColumn("touch_tms", last(when(isTouch, col("tms")), ignoreNulls = true).over(w))
      .withColumn("touch_type_raw", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
    val attributed = col("touch_tms").isNotNull &&
      col("touch_tms") >= col("tms") - AttribWindowMs
    tagged.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tms"),
        when(attributed, col("touch_type_raw")).otherwise("none").as("touch_type"),
        when(attributed, col("touch_tms")).otherwise(-1L).as("touch_tms"),
        when(attributed, col("tms") - col("touch_tms")).otherwise(-1L).as("latency_ms"))
      .orderBy("event_id")
  }

  private val eventsAttributionSql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_ms(ts) AS tms, event_type FROM events),
       |tagged AS (
       |  SELECT *,
       |    last_value(CASE WHEN event_type IN ('click','view') THEN tms END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY tms, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_tms,
       |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY tms, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type_raw
       |  FROM ev)
       |SELECT event_id, user_id, tms,
       |  CASE WHEN touch_tms IS NOT NULL AND touch_tms >= tms - $AttribWindowMs
       |       THEN touch_type_raw ELSE 'none' END AS touch_type,
       |  CASE WHEN touch_tms IS NOT NULL AND touch_tms >= tms - $AttribWindowMs
       |       THEN touch_tms ELSE -1 END AS touch_tms,
       |  CASE WHEN touch_tms IS NOT NULL AND touch_tms >= tms - $AttribWindowMs
       |       THEN tms - touch_tms ELSE -1 END AS latency_ms
       |FROM tagged WHERE event_type = 'purchase'
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------- orders_rfm
  // RFM customer segmentation (recency / frequency / monetary quintiles)
  // — the warehouse-side audience-building primitive. Quintiles do NOT
  // use a global ntile (a single-partition window over every customer —
  // the corpus_shards anti-pattern): each metric's quintile comes from a
  // value HISTOGRAM (compact: day grid, order-count grid, 100-currency
  // buckets), a cumulative window over the VALUE axis only, and an
  // equi-join back — bounded by the score space, never the customer
  // count. Floor arithmetic q = (cum_before·5) div n + 1 is exact BIGINT
  // in both engines, and equal metric values always share a score (which
  // ntile cannot promise). Money is decimal-first; the monetary DOUBLE is
  // one exact decimal→double cast, and its bucket is derived from exact
  // decimal cents, never from the double.
  private def ordersRfm(s: SparkSession, dir: String): DataFrame = {
    // memoized+cached: the three histogram builds, the n_cust aggregate,
    // and the final three joins all re-reference this customer-scale frame
    // — uncached, Spark would re-run the orders scan + aggregation ~8×
    val cust = SessionCache.memo(s, "rfm_cust", dir) {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
      val ref = o.agg(max("od").as("ref_date"), count(lit(1)).as("n_orders_all"))
      o.groupBy("o_custkey")
        .agg(max("od").as("last_od"), count(lit(1)).as("frequency"),
          sum(dec2(col("o_totalprice"))).as("mon_dec"))
        .crossJoin(broadcast(ref))
        .select(col("o_custkey"),
          datediff(col("ref_date"), col("last_od")).cast("long").as("recency_days"),
          col("frequency"),
          col("mon_dec").cast("double").as("monetary"),
          expr("cast(mon_dec * 100 as bigint) div 10000").as("mon_bucket"))
    }
    val n = broadcast(cust.agg(count(lit(1)).as("n_cust")))
    def qscore(metric: String, better: String): DataFrame = {
      // cumulative count of customers with a STRICTLY SMALLER value; the
      // window runs over the distinct-value histogram, not the customers
      val hist = cust.groupBy(metric).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(metric)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      hist.withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
        .crossJoin(n)
        .select(col(metric), expr("(cum_before * 5) div n_cust").as("q"))
        .withColumn(s"${better}_score",
          if (better == "r") lit(5L) - col("q") else col("q") + 1L)
        .select(metric, s"${better}_score")
    }
    cust
      .join(broadcast(qscore("recency_days", "r")), Seq("recency_days"))
      .join(broadcast(qscore("frequency", "f")), Seq("frequency"))
      .join(broadcast(qscore("mon_bucket", "m")), Seq("mon_bucket"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy("o_custkey")
  }

  private val ordersRfmSql =
    s"""WITH o AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice FROM orders),
       |ref AS (SELECT max(od) AS ref_date FROM o),
       |cust AS MATERIALIZED (
       |  SELECT o_custkey,
       |    CAST(date_diff('day', max(od), (SELECT ref_date FROM ref)) AS BIGINT) AS recency_days,
       |    CAST(count(*) AS BIGINT) AS frequency,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) // 10000 AS mon_bucket
       |  FROM o GROUP BY o_custkey),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM cust),
       |rh AS (
       |  SELECT recency_days, 5 - (coalesce(sum(cnt) OVER (ORDER BY recency_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 // (SELECT n_cust FROM n)) AS r_score
       |  FROM (SELECT recency_days, CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY recency_days)),
       |fh AS (
       |  SELECT frequency, (coalesce(sum(cnt) OVER (ORDER BY frequency
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 // (SELECT n_cust FROM n)) + 1 AS f_score
       |  FROM (SELECT frequency, CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY frequency)),
       |mh AS (
       |  SELECT mon_bucket, (coalesce(sum(cnt) OVER (ORDER BY mon_bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 // (SELECT n_cust FROM n)) + 1 AS m_score
       |  FROM (SELECT mon_bucket, CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY mon_bucket))
       |SELECT c.o_custkey, c.recency_days, c.frequency, c.monetary,
       |  CAST(rh.r_score AS BIGINT) AS r_score, CAST(fh.f_score AS BIGINT) AS f_score,
       |  CAST(mh.m_score AS BIGINT) AS m_score,
       |  CAST(rh.r_score AS VARCHAR) || CAST(fh.f_score AS VARCHAR) || CAST(mh.m_score AS VARCHAR) AS segment
       |FROM cust c
       |JOIN rh ON rh.recency_days = c.recency_days
       |JOIN fh ON fh.frequency = c.frequency
       |JOIN mh ON mh.mon_bucket = c.mon_bucket
       |ORDER BY c.o_custkey""".stripMargin

  // ---------------------------------------------------- orders_cohort_ltv
  // Cohort lifetime-value curves — the retention-economics table every
  // warehouse keeps: customers cohorted by first-order month, revenue
  // tracked by months-since-first-order, cumulative LTV per cohort.
  // Scale: one custkey shuffle for first-order dates, a co-partitioned
  // custkey join back, then aggregation and a cumulative window on the
  // compact (cohort × age) month grid — never a customer-scale window.
  // Money decimal-first; the cumulative sum accumulates DECIMAL inside
  // the window and casts once at the edge (a running double sum would
  // round stepwise).
  private def ordersCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        dec2(col("o_totalprice")).as("rev"))
    val first = o.groupBy("o_custkey").agg(min("od").as("fod"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_month").orderBy("age_months")
    o.join(first, "o_custkey")
      .select(date_format(col("fod"), "yyyy-MM").as("cohort_month"),
        ((year(col("od")) * 12 + month(col("od"))) -
          (year(col("fod")) * 12 + month(col("fod")))).cast("long").as("age_months"),
        col("o_custkey"), col("rev"))
      .groupBy("cohort_month", "age_months")
      .agg(countDistinct("o_custkey").as("n_customers"), sum("rev").as("rd"))
      .select(col("cohort_month"), col("age_months"), col("n_customers"),
        col("rd").cast("double").as("revenue"),
        sum("rd").over(w).cast("double").as("cum_revenue"))
      .orderBy("cohort_month", "age_months")
  }

  private val ordersCohortLtvSql =
    s"""WITH o AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
       |         CAST(o_totalprice AS DECIMAL(12,2)) AS rev
       |  FROM orders),
       |f AS (SELECT o_custkey, min(od) AS fod FROM o GROUP BY o_custkey),
       |j AS (
       |  SELECT strftime(f.fod, '%Y-%m') AS cohort_month,
       |         CAST((year(o.od)*12 + month(o.od)) - (year(f.fod)*12 + month(f.fod)) AS BIGINT) AS age_months,
       |         o.o_custkey, o.rev
       |  FROM o JOIN f USING (o_custkey)),
       |a AS (
       |  SELECT cohort_month, age_months,
       |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       |         sum(rev) AS rd
       |  FROM j GROUP BY cohort_month, age_months)
       |SELECT cohort_month, age_months, n_customers,
       |       CAST(rd AS DOUBLE) AS revenue,
       |       CAST(sum(rd) OVER (PARTITION BY cohort_month ORDER BY age_months) AS DOUBLE) AS cum_revenue
       |FROM a ORDER BY cohort_month, age_months""".stripMargin

  // --------------------------------------------------- events_active_users
  // DAU / WAU — the engagement dashboard's backbone. EXACT rolling
  // distinct (approx sketches trade the oracle away): each (day, user)
  // row fans out to the 7 target days its user counts toward, then one
  // countDistinct per target day. The fanout is on the (day, user)
  // DISTINCT frame (bounded by users × days, far below events), the
  // target-day key space is the calendar — both compact at any event
  // volume. Output days are restricted to days with events (the join
  // back to the DAU frame), so trailing empty windows don't fabricate
  // rows.
  private def eventsActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.loadEvents(s, dir)
      .select(to_date(timestamp_millis(col("tms"))).as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = du
      .select(col("user_id"), explode(expr("sequence(0, 6)")).as("off"), col("day"))
      .select(expr("date_add(day, off)").as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day").cast("string").as("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  private val eventsActiveUsersSql =
    s"""WITH du AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       |dau AS (
       |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
       |  FROM du GROUP BY day),
       |wau AS (
       |  SELECT tday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
       |  FROM (SELECT du.day + CAST(o.off AS INT) AS tday, du.user_id
       |        FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o)
       |  GROUP BY tday)
       |SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau
       |FROM dau JOIN wau ON wau.day = dau.day
       |ORDER BY day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supplier", q2, Some(q2Sql)),
    QueryDef("orders_rfm", ordersRfm, Some(ordersRfmSql)),
    QueryDef("orders_cohort_ltv", ordersCohortLtv, Some(ordersCohortLtvSql)),
    QueryDef("events_active_users", eventsActiveUsers, Some(eventsActiveUsersSql)),
    QueryDef("events_attribution", eventsAttribution, Some(eventsAttributionSql)),
    QueryDef("q11_important_parts", q11, Some(q11Sql)),
    QueryDef("agg_grouping_sets", groupingSets, Some(groupingSetsSql)),
    QueryDef("events_pivot", eventsPivot, Some(eventsPivotSql)),
    QueryDef("events_transitions", eventsTransitions, Some(eventsTransitionsSql))
  )
}
