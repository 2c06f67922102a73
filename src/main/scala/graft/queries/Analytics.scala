package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.B — the "query the warehouse" surface (the reference's product
  * is a Postgres schema the user hits with full SQL; these are the canonical
  * star-schema / window / sessionization workloads on the same data).
  *
  * Determinism rules (SURVEY.md §5): money sums go through DECIMAL casts
  * (exact integer arithmetic, partial-agg order can't change the result);
  * averages are a single IEEE division of exact operands; timestamps are
  * compared/emitted as epoch-millis BIGINTs or yyyy-MM-dd strings.
  */
object Analytics extends QueryModule with MoneyArithmetic {

  /** lineitem with l_shipdate usable as date. */
  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")

  /** Canonical event feed — `tms` epoch-millis via the schema-adaptive
    * loader (Tables.loadEvents handles ts arriving as nanos LONG,
    * TIMESTAMP_NTZ micros, or LTZ). */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)

  // ---------------------------------------------------------------- q1
  private def q1(s: SparkSession, dir: String): DataFrame = {
    li(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        // price sums via the 2^53-stable unscaled-integer cast (Money
        // .stableDouble): scales 2/4/6 — sum_charge's unscaled value
        // crosses 2^53 at sf1 and the direct cast diverges cross-engine
        stableDouble(sum(dec2(col("l_extendedprice"))), 2).as("sum_base_price"),
        stableDouble(sum(discPrice), 4).as("sum_disc_price"),
        stableDouble(sum(charge), 6).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(pct(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)                        AS sum_qty,
      ${stableDoubleSql("sum(CAST(l_extendedprice AS DECIMAL(12,2)))", 2)}          AS sum_base_price,
      ${stableDoubleSql("sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))))", 4)} AS sum_disc_price,
      ${stableDoubleSql("sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))) * (1.00 + CAST(l_tax AS DECIMAL(4,2))))", 6)} AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/count(*)               AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/count(*)          AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/count(*)                AS avg_disc,
      count(*)                                                                      AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------- q3
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders").filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
    val l = li(s, dir).filter(to_date(col("l_shipdate")) > lit("1998-01-01").cast("date"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).cast("string").as("orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql = """
    SELECT l_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  // ---------------------------------------------------------------- q5
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(s, dir, "nation")
    val c = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val o = Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
    val l = li(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql = """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  // ------------------------------------------------- win_top_customers
  private def winTop(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val w = Window.partitionBy("n_name").orderBy(col("c_acctbal").desc, col("c_custkey"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("n_name", "rk", "c_custkey", "c_name", "c_acctbal")
      .orderBy("n_name", "rk")
  }

  private val winTopSql = """
    SELECT n_name, rk, c_custkey, c_name, c_acctbal FROM (
      SELECT n_name, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rk <= 3
    ORDER BY n_name, rk"""

  // --------------------------------------------- win_running_revenue
  private def winRun(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val monthly = o
      .groupBy(substring(to_date(col("o_orderdate")).cast("string"), 1, 7).as("month"))
      .agg(sum(dec2(col("o_totalprice"))).as("mrev_dec"), count(lit(1)).as("n_orders"))
    monthly
      .withColumn("cum_revenue",
        sum(col("mrev_dec")).over(Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .withColumn("month_revenue", col("mrev_dec").cast("double"))
      .select("month", "month_revenue", "n_orders", "cum_revenue")
      .orderBy("month")
  }

  private val winRunSql = """
    WITH monthly AS (
      SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS month,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS mrev_dec,
             count(*) AS n_orders
      FROM orders GROUP BY month)
    SELECT month, CAST(mrev_dec AS DOUBLE) AS month_revenue, n_orders,
           CAST(sum(mrev_dec) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
    FROM monthly ORDER BY month"""

  // ---------------------------------------------------------- rollup
  private def rollupQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("revenue"), count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"), col("n_orders"))
      .orderBy("region", "nation")
  }

  private val rollupSql = """
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation"""

  // --------------------------------------------- events_sessionize
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    ev(s, dir)
      .withColumn("prev", lag(col("tms"), 1).over(w))
      .withColumn("is_new", when(col("prev").isNull || col("tms") - col("prev") > 1800000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("tms").as("start_ms"), max("tms").as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  private val sessionizeSql = """
    WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
    m AS (
      SELECT user_id, event_id, tms,
             CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
    sess AS (
      SELECT user_id, tms, sum(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      FROM m)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events, min(tms) AS start_ms, max(tms) AS end_ms
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  // --------------------------------------------- events_tumbling
  private def tumbling(s: SparkSession, dir: String): DataFrame = {
    ev(s, dir)
      .withColumn("day", to_date(timestamp_millis(col("tms"))).cast("string"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_micros"))
      .orderBy("day", "event_type")
  }

  private val tumblingSql = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type"""

  // --------------------------------------------------- agg_cube
  private def cubeQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")
  }

  private val cubeSql = """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  // ------------------------------------------------ q18_large_orders
  // HAVING on an aggregate (big-quantity orders), then rejoin detail.
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val big = l.groupBy("l_orderkey")
      .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > 200)
    val o = Tables.load(s, dir, "orders")
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).cast("string").as("orderdate"),
        col("qty_dec").cast("double").as("total_qty"))
      .orderBy("o_orderkey")
  }

  private val q18Sql = """
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 200)
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           CAST(qty_dec AS DOUBLE) AS total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    ORDER BY o_orderkey"""

  // -------------------------------------------- q17_below_avg_parts
  // Correlated-scalar-subquery pattern: lineitems under 50% of their
  // part's average quantity (decorrelated as an aggregate join).
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val avgQ = l.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    l.join(avgQ, l("l_partkey") === avgQ("p_key"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_small_items"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("small_revenue"))
      .orderBy("l_partkey")
  }

  private val q17Sql = """
    WITH avg_q AS (
      SELECT l_partkey AS p_key,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, count(*) AS n_small_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_revenue
    FROM lineitem JOIN avg_q ON l_partkey = p_key
    WHERE l_quantity < avg_qty * 0.5
    GROUP BY l_partkey
    ORDER BY l_partkey"""

  // --------------------------------------------- events_hopping
  /** Hopping-window aggregation (size 1 day, slide 12 h): each event lands
    * in exactly two windows — materialized as a 2-row explode, the batch
    * twin of window(ts, '1 day', '12 hours').
    */
  private def hopping(s: SparkSession, dir: String): DataFrame = {
    ev(s, dir)
      .withColumn("i", explode(array(lit(0L), lit(1L))))
      .withColumn("wstart_ms", (expr("tms div 43200000") - col("i")) * 43200000L)
      .groupBy("wstart_ms", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_micros"))
      .orderBy("wstart_ms", "event_type")
  }

  private val hoppingSql = """
    SELECT ((epoch_ms(ts) // 43200000) - i.i) * 43200000 AS wstart_ms, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
    FROM events CROSS JOIN (VALUES (0), (1)) AS i(i)
    GROUP BY wstart_ms, event_type
    ORDER BY wstart_ms, event_type"""

  // ----------------------------------------------- events_json_agg
  /** JSON payload processing: extract props.k, aggregate per event_type x
    * k-decile (the semi-structured-column workload).
    */
  private def jsonAgg(s: SparkSession, dir: String): DataFrame = {
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n_events"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type", "k_mod")
  }

  private val jsonAggSql = """
    WITH e AS (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type, k % 10 AS k_mod,
           count(*) AS n_events, min(k) AS min_k, max(k) AS max_k
    FROM e WHERE k IS NOT NULL
    GROUP BY event_type, k_mod
    ORDER BY event_type, k_mod"""

  // --------------------------------------------------- asof_join
  /** For each event, the customer's most recent order at-or-before the event
    * time (an as-of join, composed as join + windowed dedup; at cluster scale
    * the events side is range-partitioned on user_id and the per-key scan is a
    * single sort-merge pass — no cross product).
    */
  private def asof(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select("event_id", "user_id", "tms")
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("oms"))
    // max(struct(oms, o_orderkey)) replaces the row_number window (r14,
    // guide §2.3 "aggregate before you shuffle"): the window shipped every
    // (event × earlier-order) candidate row through the event_id exchange
    // and sorted it; the aggregate collapses each event's candidates to
    // one row MAP-SIDE before the exchange and needs no sort. The struct
    // max is exactly the (oms DESC, o_orderkey DESC) rk=1 row. event_id is
    // unique, so grouping by (event_id, user_id) only carries user_id.
    e.join(o, e("user_id") === o("o_custkey") && o("oms") <= e("tms"))
      .groupBy("event_id", "user_id")
      .agg(max(struct(col("oms"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("user_id"),
        col("m.o_orderkey").as("last_orderkey"), col("m.oms").as("last_order_ms"))
      .orderBy("event_id")
  }

  private val asofSql = """
    SELECT event_id, user_id, last_orderkey, last_order_ms FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey, epoch_ms(o.o_orderdate) AS last_order_ms,
             row_number() OVER (PARTITION BY e.event_id ORDER BY epoch_ms(o.o_orderdate) DESC, o.o_orderkey DESC) AS rk
      FROM events e
      JOIN orders o ON e.user_id = o.o_custkey AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)) t
    WHERE rk = 1
    ORDER BY event_id"""

  // ------------------------------------------------- q4 (EXISTS semi-join)
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1996-07-01").cast("date"))
    val l = li(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey").distinct()
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // ------------------------------- q13 (outer join + count distribution)
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql = """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  // -------------------------------------------- stats_percentiles
  // Exact interpolated percentiles: Spark percentile() and DuckDB
  // quantile_cont() interpolate identically (verified bit-equal).
  private def percentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .orderBy("o_orderpriority")
  }

  private val percentilesSql = """
    SELECT o_orderpriority, count(*) AS n_orders,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", q1, Some(q1Sql)),
    QueryDef("stats_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q4_order_priority", q4, Some(q4Sql)),
    QueryDef("q13_cust_distribution", q13, Some(q13Sql)),
    QueryDef("q3_shipping_priority", q3, Some(q3Sql)),
    QueryDef("q5_local_supplier", q5, Some(q5Sql)),
    QueryDef("win_top_customers", winTop, Some(winTopSql)),
    QueryDef("win_running_revenue", winRun, Some(winRunSql)),
    QueryDef("agg_rollup", rollupQ, Some(rollupSql)),
    QueryDef("agg_cube", cubeQ, Some(cubeSql)),
    QueryDef("q18_large_orders", q18, Some(q18Sql)),
    QueryDef("q17_below_avg_parts", q17, Some(q17Sql)),
    QueryDef("events_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("events_tumbling", tumbling, Some(tumblingSql)),
    QueryDef("events_hopping", hopping, Some(hoppingSql)),
    QueryDef("events_json_agg", jsonAgg, Some(jsonAggSql)),
    QueryDef("asof_join", asof, Some(asofSql))
  )
}
