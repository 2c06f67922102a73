package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.B (continued) — the second tranche of warehouse queries:
  * the remaining TPC-H forms expressible over the reduced star schema
  * (no partsupp / shipmode / phone columns in the testdata, so q12/q19/q22
  * are the standard adaptations on the columns that exist).
  *
  * Same determinism rules as Analytics (SURVEY.md §5): decimal-first money
  * arithmetic, date comparisons on CAST-to-DATE, a full deterministic
  * ORDER BY on every result.
  */
object Analytics2 extends QueryModule with MoneyArithmetic {

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")

  // ------------------------------------------------- q6_forecast_revenue
  // Pure scan + filter + single aggregate: the pushdown showcase — every
  // predicate reaches the parquet scan, no shuffle beyond the final 1-row
  // partial-agg merge.
  private def q6(s: SparkSession, dir: String): DataFrame = {
    li(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * pct(col("l_discount")))
        .cast("double").as("revenue"))
  }

  private val q6Sql = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24"""

  // ------------------------------------------------- q7_volume_shipping
  // Bidirectional nation-pair trade volume by year. Dims broadcast;
  // the only real shuffle is lineitem->orders.
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"), col("s_nationkey").as("snk"))
    val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"), col("c_nationkey").as("cnk"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    li(s, dir)
      .join(Tables.broadcastDim(s, dir, "supplier", sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.broadcastDim(s, dir, "customer", cust), col("o_custkey") === col("c_custkey"))
      .filter(col("snk").isin(1, 2, 3) && col("cnk").isin(1, 2, 3) && col("snk") =!= col("cnk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(to_date(col("l_shipdate"))).as("l_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(CAST(l_shipdate AS DATE)) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey IN (1, 2, 3) AND cn.n_nationkey IN (1, 2, 3)
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  // ------------------------------------------------- q10_returned_item
  // Customers who returned goods, ranked by lost revenue (top 20). The
  // limit is safe: revenue is an exact decimal sum (ties impossible to
  // differ across engines) and the ORDER BY is total.
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1996-04-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val c = Tables.load(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    li(s, dir).filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql = """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  // ------------------------------------------------ q12_late_shipments
  // q12 adapted to the reduced schema (no l_shipmode/commitdate): per order
  // priority, lines shipped more than 90 days after the order date vs on
  // time — the same join + conditional-count shape.
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li(s, dir).join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 90)
      .groupBy("o_orderpriority")
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(!col("late"), 1L).otherwise(0L)).as("n_ontime"))
      .orderBy("o_orderpriority")
  }

  private val q12Sql = """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 90 THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // -------------------------------------------------- q14_promo_effect
  // Promo revenue share for one month: two exact decimal sums, one final
  // IEEE division — the conditional-aggregate ratio form.
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    li(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-03-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .join(Tables.broadcastDim(s, dir, "part", p), col("l_partkey") === col("p_partkey"))
      .agg((sum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(new java.math.BigDecimal("0.00"))))
          .cast("double") * 100.0 /
        sum(discPrice).cast("double")).as("promo_revenue_pct"))
  }

  private val q14Sql = """
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST('0.00' AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'"""

  // -------------------------------------------------- q15_top_supplier
  // Supplier(s) with the maximum quarterly revenue — the "view + max"
  // form, decorrelated via the q11 bounded-1-row pattern (VERDICT r5 #3):
  // the per-supplier aggregate localCheckpoints once, its global max is a
  // ONE-ROW collect inlined as an exact decimal literal, and the filter
  // runs over the compact frame — no empty-partition-spec window anywhere
  // in the plan. Equality on exact decimals, so ties are engine-stable.
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = li(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("rev_dec"))
      .localCheckpoint()
    val maxRev = rev.agg(max(col("rev_dec"))).head().getDecimal(0)
    val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
    rev.filter(col("rev_dec") === lit(maxRev))
      .join(Tables.broadcastDim(s, dir, "supplier", sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql = """
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
    ORDER BY s_suppkey"""

  // ------------------------------------------------ q19_brand_revenue
  // Disjunctive multi-attribute predicate (brand x size x quantity bands)
  // — the OR-of-ANDs pushdown form, adapted to the columns that exist.
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val joined = li(s, dir).join(Tables.broadcastDim(s, dir, "part", p), col("l_partkey") === col("p_partkey"))
    val bands =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3"  && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
    joined.filter(bands)
      .agg(sum(discPrice).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
  }

  private val q19Sql = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  // ------------------------------------------------ q22_idle_customers
  // q22 adapted (no phone column): per selected nation, customers with an
  // above-average positive balance and no orders since 2001 (lapsed). The
  // threshold compare is exact integer/decimal arithmetic (bal * n > total)
  // — no double average anywhere, so the boundary set is engine-stable.
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val nations = Seq(11, 13, 15, 17).map(_.toString)
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_nationkey").isin(nations: _*) && col("c_acctbal") > 0.0)
      .select(col("c_custkey"), col("c_nationkey"), dec2(col("c_acctbal")).as("bal"))
    val avgStats = c.agg(count(lit(1)).as("n_pos"), sum(col("bal")).as("total_bal"))
    val o = Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("2001-01-01").cast("date"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgStats))
      .filter(col("bal") * col("n_pos") > col("total_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  private val q22Sql = """
    WITH pos AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
      WHERE c_nationkey IN (11, 13, 15, 17) AND c_acctbal > 0.0),
    stats AS (SELECT count(*) AS n_pos, sum(bal) AS total_bal FROM pos)
    SELECT c_nationkey, count(*) AS numcust, CAST(sum(bal) AS DOUBLE) AS totacctbal
    FROM pos, stats
    WHERE bal * n_pos > total_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND CAST(o_orderdate AS DATE) >= DATE '2001-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey"""

  // ------------------------------------------------- events_anomaly
  // Daily per-type volume anomalies (|z| > 2) in EXACT integer arithmetic:
  // (c − μ)² > 4σ²  ⇔  (n·c − S)² > 4·(n·Q − S²)  with S = Σc, Q = Σc²
  // — no sqrt, no double mean, so the boundary set is engine-stable.
  // The squared terms are compared in 38-digit arithmetic (Spark DECIMAL,
  // DuckDB HUGEINT — both exact): with daily counts near 1e9, S² ~ 1e22
  // overflows int64, where Spark would wrap silently and DuckDB would
  // error — diverging engines. dev_n itself (n·c − S ≲ 1e12 even at 100
  // TB) stays a BIGINT output column.
  // Plan: one shuffle for the daily counts; the per-type stats are a
  // type-cardinality aggregate broadcast back into the daily side.
  private def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.loadEvents(s, dir)
      .withColumn("day", expr("cast(cast(timestamp_millis(tms) as date) as string)"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("s"), sum(expr("cnt * cnt")).as("q"))
    val wide = "cast(dev_n as decimal(38,0)) * cast(dev_n as decimal(38,0)) > " +
      "4 * (cast(n_days as decimal(38,0)) * cast(q as decimal(38,0)) - cast(s as decimal(38,0)) * cast(s as decimal(38,0)))"
    daily.join(broadcast(stats), "event_type")
      .withColumn("dev_n", expr("n_days * cnt - s"))
      .withColumn("anomaly", when(expr(wide), 1L).otherwise(0L))
      .select("event_type", "day", "cnt", "dev_n", "anomaly")
      .orderBy("event_type", "day")
  }

  private val eventsAnomalySql = """
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, day),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS q
      FROM daily GROUP BY event_type),
    joined AS (
      SELECT d.event_type, d.day, d.cnt,
             CAST(st.n_days * d.cnt - st.s AS BIGINT) AS dev_n,
             CAST(st.n_days AS HUGEINT) AS n_h, CAST(st.s AS HUGEINT) AS s_h,
             CAST(st.q AS HUGEINT) AS q_h
      FROM daily d JOIN stats st ON st.event_type = d.event_type)
    SELECT event_type, day, cnt, dev_n,
           CASE WHEN CAST(dev_n AS HUGEINT) * CAST(dev_n AS HUGEINT)
                     > 4 * (n_h * q_h - s_h * s_h)
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS anomaly
    FROM joined
    ORDER BY event_type, day"""

  // ------------------------------------------------ q16_supplier_cnt
  // Q16 adapted: no partsupp table, so the part↔supplier relation is the
  // distinct (l_partkey, l_suppkey) observed in lineitem; "complaint"
  // suppliers are stood in by negative account balance. Distinct-supplier
  // counts per part attribute group; the exclusion is a broadcast
  // anti-join (the excluded set is supplier-cardinality, tiny vs lineitem).
  private def q16(s: SparkSession, dir: String): DataFrame = {
    // r14 (guide §2.3/§3.2): the (l_partkey, l_suppkey) pre-DISTINCT was a
    // redundant corpus-scale exchange — countDistinct(l_suppkey) per
    // (brand, type, size) group is unchanged by duplicate pairs (p_partkey
    // is unique, so the part join never multiplies suppliers). Dropping it
    // and joining the SELECTIVE filtered part side (broadcast) before the
    // aggregate leaves ONE exchange, over part-filtered rows only, instead
    // of two over the full pair set. Oracle unchanged — same distinct
    // supplier count per group.
    val pairs = Tables.load(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val excl = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" && !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs.join(Tables.broadcastDim(s, dir, "supplier", excl), pairs("l_suppkey") === excl("s_suppkey"), "left_anti")
      .join(Tables.broadcastDim(s, dir, "part", p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql = """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE ps.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
      AND p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size"""

  // ---------------------------------------------- q20_dominant_supplier
  // Q20 adapted (no partsupp.availqty): a supplier "dominates" a part if
  // it shipped more than half of that part's total 2001 volume for the
  // selected brand set. Exact DECIMAL quantity sums; the half-of-total
  // compare is 2·supp_qty > part_qty (no division). Two aggregations on
  // (part, supp) then part — both co-partitioned on the part key.
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")).between(lit("2001-01-01").cast("date"), lit("2001-12-31").cast("date")))
      .select(col("l_partkey"), col("l_suppkey"), dec2(col("l_quantity")).as("qty"))
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand").isin("Brand#11", "Brand#12", "Brand#13"))
      .select("p_partkey")
    val shipped = l.join(p, col("l_partkey") === col("p_partkey"))
    val bySupp = shipped.groupBy("l_partkey", "l_suppkey").agg(sum("qty").as("supp_qty"))
    val byPart = shipped.groupBy(col("l_partkey").as("pk")).agg(sum("qty").as("part_qty"))
    bySupp.join(byPart, col("l_partkey") === col("pk"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .join(Tables.broadcastDim(s, dir, "supplier", Tables.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("l_partkey").as("p_partkey"),
        col("supp_qty").cast("double").as("supp_qty"),
        col("part_qty").cast("double").as("part_qty"))
      .orderBy("s_name", "p_partkey")
  }

  private val q20Sql = """
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS DECIMAL(12,2)) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '2001-01-01' AND DATE '2001-12-31'
        AND p.p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')),
    by_supp AS (
      SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty
      FROM shipped GROUP BY l_partkey, l_suppkey),
    by_part AS (
      SELECT l_partkey, sum(qty) AS part_qty FROM shipped GROUP BY l_partkey)
    SELECT s.s_name, bs.l_partkey AS p_partkey,
           CAST(bs.supp_qty AS DOUBLE) AS supp_qty,
           CAST(bp.part_qty AS DOUBLE) AS part_qty
    FROM by_supp bs
    JOIN by_part bp ON bp.l_partkey = bs.l_partkey
    JOIN supplier s ON s.s_suppkey = bs.l_suppkey
    WHERE bs.supp_qty * 2 > bp.part_qty
    ORDER BY s.s_name, p_partkey"""

  // --------------------------------------------- q21_waiting_supplier
  // Q21 adapted (no receipt/commit dates): a supplier "kept an order
  // waiting" if, on a finished multi-supplier order, it was the ONLY
  // supplier that shipped a line more than 90 days after the order date.
  // The classic double-correlated EXISTS/NOT EXISTS decorrelates into two
  // aggregations: per-(order, supplier) lateness, then per-order supplier/
  // late-supplier counts — both shuffles on the order key, no correlated
  // re-scans of lineitem (the plan shape that survives 100x).
  private val Q21LateDays = 90
  private val Q21TopK = 10

  private def q21(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("sdate"))
    // ONE order-keyed exchange serves the whole decorrelation (r14, guide
    // §2.4 "two operations keyed the same way share one exchange"): the
    // (order, supplier) aggregate, the per-order rollup AND the
    // waiting⋈perOrder join all cluster by l_orderkey, but the planner's
    // ENSURE_REQUIREMENTS shape paid three separate order-scale exchanges
    // (the (okey, skey) partial barely shrinks — ~1 line per pair — so the
    // pre-agg shuffles saved nothing). Repartitioning the joined rows by
    // l_orderkey once satisfies every downstream distribution
    // (HashPartitioning(okey) clusters (okey, skey) too), and the
    // duplicated perSupp subtree dedupes through runtime exchange reuse.
    val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("sdate"), col("odate"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("sdate") > date_add(col("odate"), Q21LateDays), 1L).otherwise(0L)).as("late"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late_supp"))
    val waiting = perSupp.filter(col("late") === 1)
      .join(perOrder, "l_orderkey")
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
    // group by the supplier KEY (names are not unique by schema) and keep
    // s_suppkey in the output so the top-k cut is fully deterministic even
    // under (numwait, s_name) ties
    waiting.join(Tables.broadcastDim(s, dir, "supplier", Tables.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("s_suppkey"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"), col("s_suppkey"))
      .limit(Q21TopK)
  }

  private val q21Sql = s"""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL $Q21LateDays DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late_supp
      FROM per_supp GROUP BY l_orderkey)
    SELECT s.s_name, s.s_suppkey, CAST(count(*) AS BIGINT) AS numwait
    FROM per_supp ps
    JOIN per_order po ON po.l_orderkey = ps.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name, s.s_suppkey
    ORDER BY numwait DESC, s.s_name, s.s_suppkey
    LIMIT $Q21TopK"""

  // ----------------------------------------------- events_retention
  // Daily cohort retention: users grouped by first-activity day; for each
  // day offset k in 0..7, how many of the cohort were active again. Two
  // aggregations and one equi-join on user_id — co-partitioned at scale.
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .withColumn("day", to_date(timestamp_millis(col("tms"))))

  private def retention(s: SparkSession, dir: String): DataFrame = {
    val act = ev(s, dir).select("user_id", "day").distinct()
    val cohort = act.groupBy("user_id").agg(min("day").as("d0"))
    act.join(cohort, "user_id")
      .withColumn("k", datediff(col("day"), col("d0")))
      .filter(col("k").between(0, 7))
      .groupBy(col("d0").cast("string").as("cohort_day"), col("k"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_day", "k")
  }

  private val retentionSql = """
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    cohort AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id)
    SELECT CAST(d0 AS VARCHAR) AS cohort_day, (day - d0) AS k,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM act a JOIN cohort c ON a.user_id = c.user_id
    WHERE (day - d0) BETWEEN 0 AND 7
    GROUP BY cohort_day, k
    ORDER BY cohort_day, k"""

  // ------------------------------------------------- events_funnel
  // Strict sequential funnel view -> click -> purchase: each stage's
  // timestamp must follow the previous stage's first occurrence. Three
  // conditional aggregations chained by user_id equi-joins.
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select("user_id", "event_type", "tms")
    val f1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tms").as("t1"))
    val f2 = e.join(f1, "user_id")
      .filter(col("event_type") === "click" && col("tms") > col("t1"))
      .groupBy("user_id").agg(min("tms").as("t2"))
    val f3 = e.join(f2, "user_id")
      .filter(col("event_type") === "purchase" && col("tms") > col("t2"))
      .groupBy("user_id").agg(min("tms").as("t3"))
    def stageCount(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stageCount(f1, "1_view")
      .unionByName(stageCount(f2, "2_click"))
      .unionByName(stageCount(f3, "3_purchase"))
      .orderBy("stage")
  }

  private val funnelSql = """
    WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
    f1 AS (SELECT user_id, min(tms) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
    f2 AS (SELECT e.user_id, min(tms) AS t2 FROM e JOIN f1 USING (user_id)
           WHERE event_type = 'click' AND tms > t1 GROUP BY e.user_id),
    f3 AS (SELECT e.user_id, min(tms) AS t3 FROM e JOIN f2 USING (user_id)
           WHERE event_type = 'purchase' AND tms > t2 GROUP BY e.user_id)
    SELECT '1_view' AS stage, CAST((SELECT count(*) FROM f1) AS BIGINT) AS n_users
    UNION ALL
    SELECT '2_click', CAST((SELECT count(*) FROM f2) AS BIGINT)
    UNION ALL
    SELECT '3_purchase', CAST((SELECT count(*) FROM f3) AS BIGINT)
    ORDER BY stage"""

  // --------------------------------------------- events_approx_stats
  // The sketch path for 100 TB: HyperLogLog++ distinct users and KLL-style
  // approximate quantiles per day — what replaces exact countDistinct /
  // percentile when the data no longer fits a sort. Sketches are
  // mergeable, so partial aggregation stays map-side.
  //
  // Oracle strategy (VERDICT r2 "wrong" #3): sketch VALUES cannot
  // hash-match a different engine (implementations differ by design), so
  // the checked output carries the exact answers plus in-band flags the
  // Spark side computes by comparing its own sketches to the exact values
  // inline — HLL within the ±5% spec band, approximate quantiles inside
  // the exact [p40,p60] / [p85,p95] rank windows. The oracle recomputes
  // the exact columns and asserts every flag is 1: if a sketch ever drifts
  // out of band, the Spark flag flips to 0 and the hash check fails —
  // a real cross-engine gate on sketch quality without comparing sketch
  // internals. NOTE: this is deliberately the AUDIT form — it pays for
  // the exact aggregates alongside the sketches so the oracle can check
  // them. A production deployment runs the sketch-only aggregation on the
  // full corpus and this audit on a sampled slice; the sketch plan shape
  // (mergeable partials, map-side combine) is identical either way.
  private def approxStats(s: SparkSession, dir: String): DataFrame = {
    ev(s, dir)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("exact_users"),
        approx_count_distinct("user_id", 0.02).as("approx_users"),
        expr("percentile_approx(value, 0.5, 10000)").as("approx_p50"),
        expr("percentile_approx(value, 0.9, 10000)").as("approx_p90"),
        expr("percentile(value, 0.40)").as("p40"),
        expr("percentile(value, 0.60)").as("p60"),
        expr("percentile(value, 0.85)").as("p85"),
        expr("percentile(value, 0.95)").as("p95"))
      .select(col("day"), col("n_events"), col("exact_users"),
        when(abs(col("approx_users") - col("exact_users"))
          <= greatest(lit(1L), (col("exact_users") * 0.05).cast("long")), 1).otherwise(0)
          .as("users_in_band"),
        when(col("approx_p50").between(col("p40"), col("p60")), 1).otherwise(0)
          .as("p50_in_band"),
        when(col("approx_p90").between(col("p85"), col("p95")), 1).otherwise(0)
          .as("p90_in_band"))
      .orderBy("day")
  }

  private val approxStatsSql = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS users_in_band, 1 AS p50_in_band, 1 AS p90_in_band
    FROM events
    GROUP BY day
    ORDER BY day"""

  // -------------------------------------------------- q8_market_share
  // National market share: of ASIA-region customers' PROMO-part revenue,
  // the fraction supplied by NATION_1, by order year. Share = one IEEE
  // division of two exact decimal sums.
  private def q8(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.load(s, dir, "nation")
      .join(Tables.load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA").select(col("n_nationkey"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select("c_custkey")
    val promo = Tables.load(s, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val sup = Tables.load(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li(s, dir)
      .join(Tables.broadcastDim(s, dir, "part", promo), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.broadcastDim(s, dir, "customer", cust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(Tables.broadcastDim(s, dir, "supplier", sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(to_date(col("o_orderdate"))).as("o_year"))
      .agg((sum(when(col("s_nationkey") === 1, discPrice)
          .otherwise(lit(new java.math.BigDecimal("0.00")))).cast("double") /
        sum(discPrice).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  private val q8Sql = """
    SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
           CAST(sum(CASE WHEN s_nationkey = 1
                THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))
                ELSE CAST('0.00' AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_type = 'PROMO')
      AND EXISTS (SELECT 1 FROM customer
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                  WHERE c_custkey = o_custkey AND r_name = 'ASIA')
    GROUP BY o_year
    ORDER BY o_year"""

  // ------------------------------------------------ q9_product_profit
  // Q9 adapted (no partsupp.ps_supplycost): cost proxied by the part's
  // retail price per unit. Profit = disc revenue - qty*retailprice, all
  // exact decimal, grouped by supplier nation and order year.
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.load(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_retailprice")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate")
    li(s, dir)
      .join(Tables.broadcastDim(s, dir, "part", p), col("l_partkey") === col("p_partkey"))
      .join(Tables.broadcastDim(s, dir, "supplier", sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(to_date(col("o_orderdate"))).as("o_year"))
      .agg(sum(discPrice - dec2(col("l_quantity")) * dec2(col("p_retailprice")))
        .cast("double").as("profit"))
      .orderBy("nation", "o_year")
  }

  private val q9Sql = """
    SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year"""

  // -------------------------------------------------- win_order_gaps
  // lead/lag window form: inter-order gap per customer (orders sorted by
  // date then key), aggregated to mean gap for repeat customers.
  private def orderGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap", datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
      .filter(col("gap").isNotNull)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sum_gap_days"),
        (sum("gap").cast("double") / count(lit(1))).as("avg_gap_days"))
      .orderBy("o_custkey")
  }

  private val orderGapsSql = """
    WITH g AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) - CAST(lag(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS gap
      FROM orders)
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS sum_gap_days,
           CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / count(*) AS avg_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY o_custkey
    ORDER BY o_custkey"""

  // ------------------------------------------------ range_join_events
  // Big-big INTERVAL join with NO equality key: for every purchase event,
  // aggregate the view events (any user) in the strictly-preceding
  // 10-minute window — the trending-signal join. Naively this is a range
  // predicate between two large tables, which Spark can only plan as a
  // BroadcastNestedLoopJoin (quadratic, and broadcast-bound). The scale
  // shape is TIME BINNING (Flink's interval join / the range-join-hint
  // rewrite): bin both sides by the window width W, so a [t-W, t) window
  // spans at most TWO bins — the probe side explodes into ≤2 (bin) rows,
  // candidates come from a bin equi-join, and the exact window predicate
  // filters candidates. Shuffle keys = time bins (plentiful, skew bounded
  // by events-per-window); candidate volume = O(events in window) per
  // probe, independent of corpus span. Aggregates are exact integers
  // (count + floor(value·1000) sum), so no double-sum ordering can
  // diverge between engines.
  private val RangeWindowMs = 600000L // 10 minutes

  private def rangeJoinEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("tms").as("vt"),
        expr("cast(floor(value * 1000) as bigint)").as("vmilli"))
      .withColumn("bin", expr(s"vt div $RangeWindowMs"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("tms").as("pt"))
    // array_distinct: when the window lies inside one bin, a duplicate bin
    // probe would double-count every candidate
    val probes = purchases.withColumn("bin",
      explode(array_distinct(array(
        expr(s"(pt - $RangeWindowMs) div $RangeWindowMs"),
        expr(s"pt div $RangeWindowMs")))))
    val agg = probes.join(views, Seq("bin"))
      .filter(col("vt") >= col("pt") - RangeWindowMs && col("vt") < col("pt"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_views"), sum("vmilli").as("view_value_milli"))
    purchases.select("event_id")
      .join(agg, Seq("event_id"), "left_outer")
      .select(col("event_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("view_value_milli"), lit(0L)).as("view_value_milli"))
      .orderBy("event_id")
  }

  private val rangeJoinEventsSql = s"""
    WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS tms, value FROM events),
    v AS (SELECT tms AS vt, CAST(floor(value * 1000) AS BIGINT) AS vmilli
          FROM e WHERE event_type = 'view'),
    p AS (SELECT event_id, tms AS pt FROM e WHERE event_type = 'purchase')
    SELECT p.event_id,
           CAST(count(v.vt) AS BIGINT) AS n_views,
           CAST(coalesce(sum(v.vmilli), 0) AS BIGINT) AS view_value_milli
    FROM p LEFT JOIN v ON v.vt >= p.pt - $RangeWindowMs AND v.vt < p.pt
    GROUP BY p.event_id
    ORDER BY p.event_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("range_join_events", rangeJoinEvents, Some(rangeJoinEventsSql)),
    QueryDef("q6_forecast_revenue", q6, Some(q6Sql)),
    QueryDef("q8_market_share", q8, Some(q8Sql)),
    QueryDef("q9_product_profit", q9, Some(q9Sql)),
    QueryDef("win_order_gaps", orderGaps, Some(orderGapsSql)),
    QueryDef("events_approx_stats", approxStats, Some(approxStatsSql)),
    QueryDef("events_retention", retention, Some(retentionSql)),
    QueryDef("events_funnel", funnel, Some(funnelSql)),
    QueryDef("q7_volume_shipping", q7, Some(q7Sql)),
    QueryDef("q10_returned_item", q10, Some(q10Sql)),
    QueryDef("q12_late_shipments", q12, Some(q12Sql)),
    QueryDef("q14_promo_effect", q14, Some(q14Sql)),
    QueryDef("q15_top_supplier", q15, Some(q15Sql)),
    QueryDef("q19_brand_revenue", q19, Some(q19Sql)),
    QueryDef("events_anomaly", eventsAnomaly, Some(eventsAnomalySql)),
    QueryDef("q16_supplier_cnt", q16, Some(q16Sql)),
    QueryDef("q20_dominant_supplier", q20, Some(q20Sql)),
    QueryDef("q21_waiting_supplier", q21, Some(q21Sql)),
    QueryDef("q22_idle_customers", q22, Some(q22Sql))
  )
}
