package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ops.R2

/** Relational / batch-ETL core (SURVEY §2.A).
  *
  * Re-expresses the reference's batch flow (S3 → Spark → warehouse
  * marts; see /root/reference/README.md "Batch Flow" and
  * data_ingestion/loaders/data_loader.py:64-133 for the quality gate
  * and purchase categorization) as declarative Spark plans on the
  * TPC-H-ish star schema.
  *
  * Scale notes (100 TB): dims (region/nation/part/supplier) are
  * explicitly broadcast; fact-fact joins shuffle on their keys and
  * are AQE-skew-tolerant; every aggregate is a partial-agg groupBy;
  * all filters/projections sit directly on the parquet scan so
  * Catalyst pushes them down. No query collects to the driver;
  * top-k goes through TakeOrderedAndProject (orderBy+limit).
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def disc(c1: Column, c2: Column): Column = c1 * (lit(1.0) - c2)

  /** TPC-H Q1-style pricing summary: scan-heavy multi-aggregate. */
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2000-01-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        ops.sumMoney(col("l_quantity")).as("sum_qty"),
        ops.sumMoney(col("l_extendedprice")).as("sum_base_price"),
        ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        ops.sumMoney(disc(col("l_extendedprice"), col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        ops.avgMoney4(col("l_quantity")).as("avg_qty"),
        ops.avgMoney4(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       ${ops.SumMoney("l_quantity")} AS sum_qty,
       ${ops.SumMoney("l_extendedprice")} AS sum_base_price,
       ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
       ${ops.SumMoney("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
       ${ops.AvgMoney4("l_quantity")} AS avg_qty,
       ${ops.AvgMoney4("l_extendedprice")} AS avg_price,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
       GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2"""

  /** Q5-style star join: revenue per nation for one region/date range.
    * nation+region broadcast; customer/orders/lineitem shuffle on keys.
    */
  def q02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1999-01-01"))
      .groupBy("n_name")
      .agg(
        ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")

  private val q02Sql =
    s"""SELECT n_name, ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue, count(*) AS n_lines
       FROM lineitem JOIN orders ON l_orderkey=o_orderkey
       JOIN customer ON o_custkey=c_custkey
       JOIN nation ON c_nationkey=n_nationkey
       JOIN region ON n_regionkey=r_regionkey
       WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
       GROUP BY n_name ORDER BY n_name"""

  /** Q3-style top-k: unshipped-revenue style ranking with rounded
    * ranking key + unique tiebreaker for oracle-stable ordering. */
  def q03(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") > ts("1999-01-01"))
      .join(Tables(s, dir, "orders").filter(col("o_orderdate") < ts("1999-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  private val q03Sql =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue
       FROM lineitem JOIN orders ON l_orderkey=o_orderkey
       JOIN customer ON o_custkey=c_custkey
       WHERE l_shipdate > TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
         AND c_mktsegment='BUILDING'
       GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q4-style EXISTS: orders with >=1 returned line, per priority.
    * left_semi join = no row multiplication, no distinct needed. */
  def q04(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01"))
      .join(Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey AND l_returnflag='R')
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Revenue per market segment (customer ⋈ orders, agg). */
  def q05(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        ops.sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")

  private val q05Sql =
    s"""SELECT c_mktsegment, ${ops.SumMoney("o_totalprice")} AS revenue, count(*) AS n_orders,
       count(DISTINCT c_custkey) AS n_customers
       FROM orders JOIN customer ON o_custkey=c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Q6-style pushdown probe: tight filter + single global agg.
    * The whole WHERE clause must reach the parquet scan. */
  def q06(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 25)
      .agg(ops.sumMoney(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q06Sql =
    s"""SELECT ${ops.SumMoney("l_extendedprice*l_discount")} AS revenue, count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25"""

  /** Q10-style: top returned-revenue customers with nation. */
  def q07(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q07Sql =
    s"""SELECT c_custkey, c_name, n_name, ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue
       FROM lineitem JOIN orders ON l_orderkey=o_orderkey
       JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey
       WHERE l_returnflag='R'
       GROUP BY 1,2,3 ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** popular_products (mongodb init-db.js:67-92): total quantity +
    * revenue per product, top-k. Part dim broadcast. */
  def q08(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name", "p_brand")
      .agg(
        ops.sumMoney(col("l_quantity")).as("total_quantity"),
        ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("total_revenue"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("total_quantity").desc, col("p_partkey"))
      .limit(15)

  private val q08Sql =
    s"""SELECT p_partkey, p_name, p_brand, ${ops.SumMoney("l_quantity")} AS total_quantity,
       ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS total_revenue,
       count(DISTINCT l_orderkey) AS n_orders
       FROM lineitem JOIN part ON l_partkey=p_partkey
       GROUP BY 1,2,3 ORDER BY total_quantity DESC, p_partkey LIMIT 15"""

  /** Per-supplier daily revenue + running cumulative (window).
    * Pre-aggregate to (supplier, day) BEFORE the window so the
    * window input is small; window partitions by supplier key. */
  def q09(s: SparkSession, dir: String): DataFrame = {
    // Round to cents PER LINE ITEM, then sum longs: each item's
    // product is one deterministic FP multiply (identical in both
    // engines) and the integer sum is order-independent. Rounding
    // the group's double sum instead is order-DEPENDENT: partial-agg
    // accumulation order differs from the oracle's, and at sf0.1
    // four (supplier, day) groups landed exactly on a floor(x*100+.5)
    // boundary where one ulp flips the cent — found by the
    // off-gate sf0.1 oracle sweep, invisible at sf0.01.
    val daily = Tables(s, dir, "lineitem")
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(disc(col("l_extendedprice"), col("l_discount")) * 100.0 + 0.5)
        .cast("long")).as("cents"))
    val w = Window.partitionBy("l_suppkey").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(
        col("l_suppkey"), col("day"),
        (col("cents") / 100.0).as("daily_revenue"),
        (sum("cents").over(w) / 100.0).as("cum_revenue"))
      .orderBy("l_suppkey", "day")
  }

  private val q09Sql =
    """SELECT l_suppkey, day, cents/100.0 AS daily_revenue,
       (sum(cents) OVER (PARTITION BY l_suppkey ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))/100.0 AS cum_revenue
       FROM (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY 1,2)
       ORDER BY l_suppkey, day"""

  /** Top-3 parts per brand by revenue (rank window over pre-agg).
    * Ranking key is the ROUNDED revenue with partkey tiebreak so the
    * ordering is FP-stable across engines. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey", "p_name")
      .agg(ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy("p_brand", "rank")
  }

  private val q10Sql =
    s"""SELECT * FROM (
         SELECT p_brand, p_partkey, p_name, revenue,
                row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank
         FROM (SELECT p_brand, p_partkey, p_name,
               ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue
               FROM lineitem JOIN part ON l_partkey=p_partkey GROUP BY 1,2,3))
       WHERE rank <= 3 ORDER BY p_brand, rank"""

  /** Exact distinct-user counts per event type (two-phase exact
    * distinct; at 100 TB swap to approx_count_distinct when ±2% ok). */
  def q11(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        ops.sumMoney(col("value")).as("total_value"))
      .orderBy("event_type")

  private val q11Sql =
    s"""SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       ${ops.SumMoney("value")} AS total_value
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** HLL++ approximate distincts — the 100 TB substitute for q11's
    * exact two-phase countDistinct: one pass, fixed-size sketch per
    * group, mergeable map-side (no second shuffle of distinct
    * values). rows-only — sketch estimates are engine-specific;
    * RelationalSpec bounds the relative error against exact q11. */
  def q14(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Revenue ROLLUP by (nation, order year): grouping sets give the
    * detail rows plus per-nation and grand totals in ONE pass
    * (partial-aggregated; no self-union of three aggregations).
    * Rollup nulls are coalesced to 'ALL' / -1 sentinels in both
    * engines so the hash compare never sees NULL group keys. */
  def q15(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(ops.sumMoney(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        col("revenue"), col("n_orders"))
      .orderBy("nation", "o_year")

  private val q15Sql =
    s"""SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(year(o_orderdate), -1) AS o_year,
       ${ops.SumMoney("o_totalprice")} AS revenue, count(*) AS n_orders
       FROM orders JOIN customer ON o_custkey=c_custkey
       JOIN nation ON c_nationkey=n_nationkey
       GROUP BY ROLLUP(n_name, year(o_orderdate))
       ORDER BY nation, o_year"""

  /** data_loader.py:52-89 quality gate re-expressed: bounds filters,
    * derived total_amount / is_return, seasonal tagging — per-row,
    * fully codegen'd, filter pushed to scan. Anonymous-customer
    * handling per data_loader.py:52-63: a line whose order has no
    * customer gets a stable NEGATIVE id (the reference hands out
    * -1,-2,… from a driver-side counter; distributed we derive
    * -l_orderkey, equally unique and deterministic) and a
    * customer_type tag. Vacuous on TPC-H-shaped data (custkey is
    * never null) but the rule rides the oracle so it can't rot. */
  def q12(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_quantity") > 0 && col("l_quantity") < 100000 && col("l_extendedprice") > 0)
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("o_custkey"), -col("l_orderkey")).as("customer_id"),
        when(col("o_custkey").isNull, "anonymous").otherwise("registered").as("customer_type"),
        ops.r2(disc(col("l_extendedprice"), col("l_discount"))).as("total_amount"),
        (col("l_returnflag") === "R").as("is_return"),
        when(month(col("l_shipdate")).isin(11, 12), "holiday")
          .when(month(col("l_shipdate")).isin(3, 4, 5), "spring")
          .when(month(col("l_shipdate")).isin(6, 7, 8), "summer")
          .otherwise("fall").as("season"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q12Sql =
    """SELECT l_orderkey, l_linenumber,
       coalesce(o_custkey, -l_orderkey) AS customer_id,
       CASE WHEN o_custkey IS NULL THEN 'anonymous' ELSE 'registered' END AS customer_type,
       floor((l_extendedprice*(1.0-l_discount))*100.0 + 0.5)/100.0 AS total_amount,
       l_returnflag='R' AS is_return,
       CASE WHEN month(l_shipdate) IN (11,12) THEN 'holiday'
            WHEN month(l_shipdate) IN (3,4,5) THEN 'spring'
            WHEN month(l_shipdate) IN (6,7,8) THEN 'summer'
            ELSE 'fall' END AS season
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_quantity > 0 AND l_quantity < 100000 AND l_extendedprice > 0
       ORDER BY l_orderkey, l_linenumber"""

  /** data_loader.py:113-126 return subcategorization: for each
    * returned line, the most recent PRIOR purchase of the same part
    * by the same customer decides the class — full (quantities
    * equal), partial (differ), credit_note (no tracked prior
    * purchase; the reference keys this on 'C'-invoices, which have
    * no analog here — a return without purchase history is exactly
    * the case a credit note memorializes). The reference walks a
    * driver-side dict in date order; distributed this is a
    * last_value(ignoreNulls) window over (customer, part) — high
    * cardinality, no skew, scale-safe. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"),
        (col("l_returnflag") === "R").as("is_return"))
    val w = Window.partitionBy("custkey", "partkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prior_qty",
        last(when(!col("is_return"), col("l_quantity")), ignoreNulls = true).over(w))
      .filter(col("is_return"))
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"), col("partkey"),
        col("l_quantity").as("quantity"), col("prior_qty"),
        when(col("prior_qty").isNull, "credit_note_return")
          .when(col("l_quantity") === col("prior_qty"), "full_return")
          .otherwise("partial_return").as("return_class"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q16Sql =
    """WITH ev AS (
         SELECT o_custkey AS custkey, l_partkey AS partkey, l_orderkey, l_linenumber,
                l_quantity, l_shipdate, l_returnflag='R' AS is_return
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       pr AS (
         SELECT *, last_value(CASE WHEN NOT is_return THEN l_quantity END IGNORE NULLS)
           OVER (PARTITION BY custkey, partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_qty
         FROM ev)
       SELECT l_orderkey, l_linenumber, custkey, partkey,
              l_quantity AS quantity, prior_qty,
              CASE WHEN prior_qty IS NULL THEN 'credit_note_return'
                   WHEN l_quantity = prior_qty THEN 'full_return'
                   ELSE 'partial_return' END AS return_class
       FROM pr WHERE is_return
       ORDER BY l_orderkey, l_linenumber"""

  /** data_loader.py:108-141 purchase categorization: first vs repeat
    * vs high-value order per customer (history via window, not a
    * driver-side dict like the reference). */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .select(
        col("o_orderkey"), col("o_custkey"),
        when(col("rn") === 1, "first_purchase")
          .when(col("o_totalprice") > 400000, "high_value_purchase")
          .when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "priority_purchase")
          .otherwise("repeat_purchase").as("order_category"),
        when(month(col("o_orderdate")).isin(11, 12), "holiday")
          .when(month(col("o_orderdate")).isin(3, 4, 5), "spring")
          .when(month(col("o_orderdate")).isin(6, 7, 8), "summer")
          .otherwise("fall").as("season"))
      .orderBy("o_orderkey")
  }

  private val q13Sql =
    """SELECT o_orderkey, o_custkey,
       CASE WHEN rn = 1 THEN 'first_purchase'
            WHEN o_totalprice > 400000 THEN 'high_value_purchase'
            WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'priority_purchase'
            ELSE 'repeat_purchase' END AS order_category,
       CASE WHEN month(o_orderdate) IN (11,12) THEN 'holiday'
            WHEN month(o_orderdate) IN (3,4,5) THEN 'spring'
            WHEN month(o_orderdate) IN (6,7,8) THEN 'summer'
            ELSE 'fall' END AS season
       FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
       ORDER BY o_orderkey"""

  /** Order years present in the data — the explicit pivot column
    * domain (never let pivot() infer values: inference is an extra
    * full pass AND makes the output schema data-dependent). */
  private val PivotYears = 1995 to 2001

  /** Revenue pivot: nation rows × order-year columns. Spark's
    * `pivot` with an explicit value list compiles to one partial-agg
    * groupBy with a CASE per column — no extra shuffle vs the flat
    * aggregate, broadcast dims. */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables(s, dir, "nation").select("n_nationkey", "n_name")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("n_name")
      .pivot("yr", PivotYears.map(Integer.valueOf))
      .agg(ops.sumMoney(col("o_totalprice")))
      .orderBy("n_name")
  }

  private val q17Sql = {
    val cols = PivotYears.map(y =>
      s"""(sum(${ops.Cents("o_totalprice")}) FILTER (WHERE year(o_orderdate) = $y))/100.0 AS "$y"""").mkString(",\n       ")
    s"""SELECT n_name, $cols
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""
  }

  /** 7-day moving-average daily revenue per order priority — a RANGE
    * window frame over event-time (gaps in the calendar still cover
    * the trailing 6 days, unlike a ROWS frame). The scale story is
    * the PRE-AGGREGATION: the window runs over (priority × day) rows
    * — thousands per year regardless of fact-table size — after one
    * partial-agg groupBy over the facts. Daily revenue is exact
    * integer cents; the moving average divides a long sum, identical
    * arithmetic in both engines. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("cents"))
      .withColumn("dayn", datediff(col("day"), lit("1990-01-01").cast("date")))
    val w = Window.partitionBy("o_orderpriority").orderBy("dayn").rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d_avg", ops.r2(avg(col("cents")).over(w) / 100.0))
      .select(col("o_orderpriority"), col("day"),
        ops.r2(col("cents") / 100.0).as("revenue"), col("rev_7d_avg"))
      .orderBy("o_orderpriority", "day")
  }

  private val q18Sql =
    s"""WITH daily AS (
         SELECT o_orderpriority, o_orderdate::DATE AS day,
                CAST(sum(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
                date_diff('day', DATE '1990-01-01', o_orderdate::DATE) AS dayn
         FROM orders GROUP BY 1, 2)
       SELECT o_orderpriority, day, ${R2("cents / 100.0")} AS revenue,
              ${R2("""avg(cents) OVER (PARTITION BY o_orderpriority ORDER BY dayn
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0""")} AS rev_7d_avg
       FROM daily ORDER BY o_orderpriority, day"""

  /** Approximate per-group quantiles via Spark's built-in
    * Greenwald-Khanna sketch (`percentile_approx`) — the
    * mergeable-sketch path for percentiles at 100 TB, where an exact
    * per-group sort is a full shuffle of the fact table but the
    * sketch is a bounded partial aggregate. Companion of q14's
    * HLL++: both trade a bounded, spec-checked error for
    * merge-without-shuffle aggregation. Exact-percentile
    * interpolation differs per engine in final-ulp arithmetic, and
    * the sketch is Spark-specific → rows-only; RelationalSpec bounds
    * the error against exact in-group percentiles. */
  def q19(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90_approx"))
      .orderBy("p_brand")

  /** CDC LATEST-WINS APPLY over the orders snapshot
    * ([[graft.sources.Sources.upsert]] is the engine; this query is
    * its end-to-end face with a deterministic change feed derived
    * from the table itself): the base snapshot is version 1; every
    * 7th key gets a re-price (version 2, status → 'U', price + 1.0);
    * every 13th key gets a DELETE tombstone at version 3 — on 7·13
    * multiples the delete outranks the re-price, exercising the
    * winner-then-tombstone order of operations. Merge keeps, per
    * key, only the highest-version row and drops keys whose winner
    * is a tombstone.
    *
    * Cross-engine safety: every surviving o_totalprice is either a
    * parquet pass-through or one exact double `+ 1.0`
    * (Column-API lit, q60 pattern); versions are integer literals.
    * At 100 TB this is one map-side-partial groupBy on the snapshot
    * key — see the upsert Scaladoc for why not a window. */
  def q116(s: SparkSession, dir: String): DataFrame =
    graft.sources.Sources.upsert(
        changeFeed(s, dir),
        Seq("o_orderkey"), "version", Some("deleted"))
      .orderBy("o_orderkey")

  /** The deterministic change feed q116/q117 share: base snapshot at
    * version 1, re-price (version 2) on 7-multiples, DELETE tombstone
    * (version 3) on 13-multiples — 7·13 multiples exercise the
    * winner-then-tombstone order. [[FeedSql]] is its oracle spelling. */
  private def changeFeed(s: SparkSession, dir: String): DataFrame = {
    def orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base = orders
      .withColumn("version", lit(1L)).withColumn("deleted", lit(false))
    val reprice = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"),
        lit(2L).as("version"), lit(false).as("deleted"))
    val del = orders.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(3L).as("version"), lit(true).as("deleted"))
    base.unionByName(reprice).unionByName(del)
  }

  private val FeedSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
                1 AS version, false AS deleted FROM orders
         UNION ALL
         SELECT o_orderkey, 'U', o_totalprice + 1.0, 2, false
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey, NULL, NULL, 3, true
         FROM orders WHERE o_orderkey % 13 = 0"""

  private val q116Sql =
    s"""WITH u AS ($FeedSql),
       r AS (SELECT *, row_number() OVER (
               PARTITION BY o_orderkey ORDER BY version DESC) AS rn FROM u)
       SELECT o_orderkey, o_orderstatus, o_totalprice,
              CAST(version AS BIGINT) AS version
       FROM r WHERE rn = 1 AND NOT deleted ORDER BY o_orderkey"""

  /** SCD TYPE-2 DIMENSION HISTORY over the same change feed q116
    * merges: instead of keeping only each key's winner, materialize
    * every non-tombstone version as a validity interval —
    * (valid_from, valid_to) in version space, valid_to = the NEXT
    * feed row's version (tombstones included, so a delete CLOSES the
    * last interval and the key has no current row — the standard
    * warehouse history-table contract).
    *
    * Cross-engine safety: inherited from the feed (one exact `+ 1.0`,
    * integer versions); the interval assignment is a lead() over the
    * integer (key, version) total order — deterministic in both
    * engines.
    *
    * Scale shape: ONE window partitioned by the snapshot key —
    * millions of single-digit-row partitions, the high-cardinality
    * shape Window parallelizes well; no global sort, no second pass.
    * Contrast q116's groupBy/max_by: history needs every version, so
    * the window (which keeps all rows) is the right tool where the
    * upsert's map-side-combining agg was right for latest-wins. */
  def q117(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderkey").orderBy("version")
    changeFeed(s, dir)
      .withColumn("valid_to", lead(col("version"), 1).over(w))
      .filter(!col("deleted"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("version").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  private val q117Sql =
    s"""WITH u AS ($FeedSql),
       v AS (SELECT *, lead(version) OVER (
               PARTITION BY o_orderkey ORDER BY version) AS valid_to FROM u)
       SELECT o_orderkey, o_orderstatus, o_totalprice,
              CAST(version AS BIGINT) AS valid_from,
              CAST(valid_to AS BIGINT) AS valid_to,
              valid_to IS NULL AS is_current
       FROM v WHERE NOT deleted ORDER BY o_orderkey, valid_from"""

  /** EXACT PER-GROUP PERCENTILES by integer-histogram selection —
    * the exact companion of q19's GK sketch, and the member of the
    * percentile family that CAN sit in the oracle hash gate: where
    * interpolated percentiles differ cross-engine in final-ulp
    * arithmetic (the q19 rows-only rationale), percentile_disc
    * SELECTS an existing value at an integer rank — no interpolation,
    * no double ever compared except one shared /100.0 display divide.
    *
    * The rewrite is the 100 TB story: a naive per-group sort ranks
    * every fact row (full shuffle of the table into #groups ordered
    * partitions); the histogram form groupBy-counts (brand, cents) —
    * map-side combined, one bounded shuffle — then windows over the
    * HISTOGRAM, whose size is the price DOMAIN (≤ ~10⁵ distinct cent
    * values per brand), independent of corpus row count. p50/p90 =
    * the smallest cents whose running count reaches ceil(p·n), spelled
    * ceil-free as (n·P + 99) div 100 in both engines. */
  def q123(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), ops.cents(col("l_extendedprice")).as("cents"))
      .agg(count(lit(1)).as("c"))
    // r6: the cumulative used to be sum(c) OVER (PARTITION BY brand
    // ORDER BY cents) — a #brands-partition window that caps
    // parallelism at 25 tasks and sorts each brand's whole price
    // histogram in one task (at 100 TB: one task per brand, each
    // sorting ~n/25 rows). The two-phase range-partitioned cumsum
    // keeps full parallelism; identical integers, so the oracle SQL
    // (which stays the window form — DuckDB doesn't care) matches.
    ops.groupedGlobalCumsum(hist, "p_brand", col("c"), "cum", "n", col("cents"))
      .groupBy("p_brand")
      .agg(
        max("n").as("n_rows"),
        (min(when(col("cum") >= expr("(n*50 + 99) div 100"), col("cents"))) / lit(100.0)).as("p50"),
        (min(when(col("cum") >= expr("(n*90 + 99) div 100"), col("cents"))) / lit(100.0)).as("p90"))
      .orderBy("p_brand")
  }

  private val q123Sql =
    s"""WITH h AS (
         SELECT p_brand, ${ops.Cents("l_extendedprice")} AS cents, count(*) AS c
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
       w AS (
         SELECT p_brand, cents,
                CAST(sum(c) OVER (PARTITION BY p_brand ORDER BY cents) AS BIGINT) AS cum,
                CAST(sum(c) OVER (PARTITION BY p_brand) AS BIGINT) AS n
         FROM h)
       SELECT p_brand, CAST(max(n) AS BIGINT) AS n_rows,
              min(CASE WHEN cum >= (n*50 + 99) // 100 THEN cents END) / 100.0 AS p50,
              min(CASE WHEN cum >= (n*90 + 99) // 100 THEN cents END) / 100.0 AS p90
       FROM w GROUP BY 1 ORDER BY 1"""

  /** REFERENTIAL-INTEGRITY AUDIT — the relational member of the
    * validation family (q107/q108 validate document/embedding intake;
    * this audits the star schema's FK edges): for every foreign-key
    * edge, the row count, orphan count (no matching dimension row —
    * a NULL key is an orphan by definition: it references nothing),
    * and orphan rate in ppm (integer division). The live tables are
    * clean, so all-zero orphans IS the expected result (like
    * q107/q108, specs inject synthetic corruption to prove
    * detection).
    *
    * Scale shape: ONE scan per fact table regardless of how many of
    * its edges are audited — lineitem's three FK checks ride one
    * pass with three left joins (part/supplier broadcast — true
    * dimensions; orders joined by shuffle since at 100 TB it is
    * fact-sized, never broadcast); all counts are map-side-combined
    * aggregates; output is #edges rows. */
  def q126(s: SparkSession, dir: String): DataFrame = {
    def hit(df: DataFrame, key: String): DataFrame =
      df.select(col(key).as("k")).distinct().withColumn("_hit", lit(1))
    def row(name: String, checked: DataFrame, hitCol: String): DataFrame =
      checked.agg(count(lit(1)).as("n_rows"),
          sum(when(col(hitCol).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("check_name"), col("n_rows"), col("n_orphans"),
          expr("CASE WHEN n_rows = 0 THEN NULL ELSE (n_orphans * 1000000) div n_rows END")
            .as("orphan_ppm"))
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), lit(1).as("_ho")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(hit(Tables(s, dir, "part"), "p_partkey")
        .select(col("k").as("pk"), col("_hit").as("_hp"))),
        col("l_partkey") === col("pk"), "left")
      .join(broadcast(hit(Tables(s, dir, "supplier"), "s_suppkey")
        .select(col("k").as("sk"), col("_hit").as("_hs"))),
        col("l_suppkey") === col("sk"), "left")
    val ord = Tables(s, dir, "orders").select("o_custkey")
      .join(hit(Tables(s, dir, "customer"), "c_custkey"),
        col("o_custkey") === col("k"), "left")
    val cust = Tables(s, dir, "customer").select("c_nationkey")
      .join(broadcast(hit(Tables(s, dir, "nation"), "n_nationkey")),
        col("c_nationkey") === col("k"), "left")
    // lineitem's three edges ride ONE aggregate over the one scan,
    // stacked to rows afterwards — three union branches over the
    // same subtree would plan (up to) three scans
    val liRows = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_ho").isNull, 1L).otherwise(0L)).as("orph_o"),
        sum(when(col("_hp").isNull, 1L).otherwise(0L)).as("orph_p"),
        sum(when(col("_hs").isNull, 1L).otherwise(0L)).as("orph_s"))
      .select(explode(expr(
        """array(struct('lineitem_orderkey' AS check_name, n_rows, orph_o AS n_orphans),
                 struct('lineitem_partkey' AS check_name, n_rows, orph_p AS n_orphans),
                 struct('lineitem_suppkey' AS check_name, n_rows, orph_s AS n_orphans))""")).as("r"))
      .select(col("r.check_name"), col("r.n_rows"), col("r.n_orphans"))
      .withColumn("orphan_ppm",
        expr("CASE WHEN n_rows = 0 THEN NULL ELSE (n_orphans * 1000000) div n_rows END"))
    row("customer_nationkey", cust, "_hit")
      .unionByName(liRows)
      .unionByName(row("orders_custkey", ord, "_hit"))
      .orderBy("check_name")
  }

  private val q126Sql =
    """WITH li AS (
         SELECT o.o_orderkey AS ho, p.p_partkey AS hp, s.s_suppkey AS hs
         FROM lineitem l
         LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         LEFT JOIN part p ON l.l_partkey = p.p_partkey
         LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       liagg AS (
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN ho IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orph_o,
                CAST(sum(CASE WHEN hp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orph_p,
                CAST(sum(CASE WHEN hs IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orph_s
         FROM li),
       edges AS (
         SELECT 'lineitem_orderkey' AS check_name, n_rows, orph_o AS n_orphans FROM liagg
         UNION ALL SELECT 'lineitem_partkey', n_rows, orph_p FROM liagg
         UNION ALL SELECT 'lineitem_suppkey', n_rows, orph_s FROM liagg
         UNION ALL
         SELECT 'customer_nationkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         UNION ALL
         SELECT 'orders_custkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM orders o LEFT JOIN customer cu ON o.o_custkey = cu.c_custkey)
       SELECT check_name, n_rows, n_orphans,
              CASE WHEN n_rows = 0 THEN NULL
                   ELSE (n_orphans * 1000000) // n_rows END AS orphan_ppm
       FROM edges ORDER BY check_name"""

  /** ABC (PARETO) ANALYSIS — per-brand catalog classification by
    * cumulative revenue share (the merchandising view behind
    * "popular products": A = parts covering the first 80 % of the
    * brand's revenue, B = to 95 %, C = the tail), reported as class
    * part-counts, revenue, and revenue share.
    *
    * Scale shape: the fact scan collapses to a PART-LEVEL aggregate
    * first (map-side combined, one shuffle on the part key); the
    * cumulative window then runs per brand over that
    * dimension-sized frame — parts per brand, never fact rows. All
    * classification arithmetic is exact integer cents (cum·100 ≤
    * tot·80 — no share double ever drives a boundary); the one
    * displayed share is a single double divide of two exact longs. */
  def q128(s: SparkSession, dir: String): DataFrame = {
    val partRev = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sum(ops.cents(disc(col("l_extendedprice"), col("l_discount")))).as("cents"))
    val byBrand = Window.partitionBy("p_brand")
    partRev
      .withColumn("cum", sum("cents").over(byBrand.orderBy(col("cents").desc, col("p_partkey"))))
      .withColumn("tot", sum("cents").over(byBrand))
      .withColumn("abc_class",
        when(col("cum") * 100 <= col("tot") * 80, "A")
          .when(col("cum") * 100 <= col("tot") * 95, "B")
          .otherwise("C"))
      .groupBy("p_brand", "abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum("cents").as("cc"), max("tot").as("tot"))
      .select(col("p_brand"), col("abc_class"), col("n_parts"),
        (col("cc") / 100.0).as("class_revenue"),
        ops.r6(col("cc").cast("double") / col("tot").cast("double")).as("share6"))
      .orderBy("p_brand", "abc_class")
  }

  private val q128Sql =
    s"""WITH pr AS (
         SELECT p_brand, p_partkey,
                sum(${ops.Cents("l_extendedprice*(1.0-l_discount)")}) AS cents
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
       w AS (
         SELECT p_brand, cents,
                CAST(sum(cents) OVER (PARTITION BY p_brand
                  ORDER BY cents DESC, p_partkey) AS BIGINT) AS cum,
                CAST(sum(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS tot
         FROM pr),
       c AS (
         SELECT p_brand,
                CASE WHEN cum*100 <= tot*80 THEN 'A'
                     WHEN cum*100 <= tot*95 THEN 'B' ELSE 'C' END AS abc_class,
                cents, tot FROM w)
       SELECT p_brand, abc_class, count(*) AS n_parts,
              CAST(sum(cents) AS BIGINT)/100.0 AS class_revenue,
              ${ops.R6("CAST(sum(cents) AS DOUBLE)/CAST(max(tot) AS DOUBLE)")} AS share6
       FROM c GROUP BY 1, 2 ORDER BY 1, 2"""

  /** PRICE-DEMAND REGRESSION per brand — the cross-sectional price
    * sensitivity read merchandising runs on a catalog: OLS of total
    * quantity sold per part (demand) on the part's catalog price,
    * within each brand. q119's distributed-regression shape applied
    * across parts instead of days.
    *
    * Numerics (the q32/q119 integer-moment discipline): x = catalog
    * price cents, y = demand quantity-cents — both exact integers; all
    * five moments accumulate as decimals (DuckDB: HUGEINT), the
    * numerator n·Σxy−Σx·Σy and denominator n·Σx²−(Σx)² are computed
    * EXACTLY, and the slope is ONE double divide of the two exact
    * values. An all-same-price brand (zero denominator) reports NULL
    * — decided on the exact integer, not a double underflow.
    *
    * Scale shape: lineitem collapses to per-part demand first
    * (map-side combined, shuffle on partkey ≈ the dimension size);
    * the regression itself is a second map-side-combined aggregate
    * emitting 5 numbers per brand. */
  def q129(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(18,0)")
    val perPart = Tables(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(ops.cents(col("l_quantity"))).as("qc"))
      .join(broadcast(Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          ops.cents(col("p_retailprice")).as("pc"))),
        col("l_partkey") === col("p_partkey"))
    perPart.groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(d(col("pc"))).as("sx"),
        sum(d(col("qc"))).as("sy"),
        sum(d(col("pc")) * d(col("qc"))).as("sxy"),
        sum(d(col("pc")) * d(col("pc"))).as("sxx"))
      .withColumn("num", d(col("n_parts")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", d(col("n_parts")) * col("sxx") - col("sx") * col("sx"))
      .select(col("p_brand"), col("n_parts"),
        ops.r4(col("sy").cast("double") / (lit(100.0) * col("n_parts").cast("double")))
          .as("avg_demand"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(ops.r6(col("num").cast("double") / col("den").cast("double")))
          .as("slope6"))
      .orderBy("p_brand")
  }

  private val q129Sql =
    s"""WITH pp AS (
         SELECT l_partkey, sum(${ops.Cents("l_quantity")}) AS qc
         FROM lineitem GROUP BY 1),
       j AS (
         SELECT p_brand, ${ops.Cents("p_retailprice")} AS pc, qc
         FROM pp JOIN part ON l_partkey = p_partkey),
       m AS (
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                sum(pc) AS sx, sum(qc) AS sy,
                sum(pc*qc) AS sxy, sum(pc*pc) AS sxx
         FROM j GROUP BY 1)
       SELECT p_brand, n_parts,
              ${ops.R4("CAST(sy AS DOUBLE) / (100.0*CAST(n_parts AS DOUBLE))")} AS avg_demand,
              CASE WHEN n_parts*sxx - sx*sx = 0 THEN NULL
                   ELSE ${ops.R6("CAST(n_parts*sxy - sx*sy AS DOUBLE) / CAST(n_parts*sxx - sx*sx AS DOUBLE)")}
              END AS slope6
       FROM m ORDER BY 1"""

  /** REVENUE CONCENTRATION (GINI) per market segment — the
    * inequality KPI behind "top spenders": how concentrated is order
    * revenue across a segment's customers. Exact sorted-rank
    * formula G = 2·Σᵢ rankᵢ·xᵢ / (n·Σx) − (n+1)/n over per-customer
    * revenue cents; with ties the rank-block sum is order-invariant,
    * so the (cents, custkey) strict order makes the statistic exact
    * and deterministic.
    *
    * Scale shape: the global-sort trap is the point — ranking a
    * segment's customers with `row_number().over(partitionBy(seg))`
    * funnels ~n/5 rows through one task. `ops.groupedGlobalRank`
    * range-partitions on (segment, cents, custkey), ranks locally,
    * and rebases with broadcast per-(partition, segment) offsets —
    * both data-sized passes fully parallel (the globalNtile
    * machinery, generalized per group). Σrank·x accumulates as
    * decimal (rank·cents overflows a long at ~10¹⁰ customers);
    * the final statistic is one double formula over exact sums. */
  def q130(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(19,0)")
    val per = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_custkey")
      .agg(sum(ops.cents(col("o_totalprice"))).as("cents"))
    ops.groupedGlobalRank(per, "c_mktsegment", "rnk", col("cents"), col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum("cents").as("t"),
        sum(d(col("rnk")) * d(col("cents"))).as("sr"))
      .select(col("c_mktsegment"), col("n_customers"),
        (col("t") / 100.0).as("revenue"),
        ops.r6(lit(2.0) * col("sr").cast("double")
            / (col("n_customers").cast("double") * col("t").cast("double"))
          - (col("n_customers").cast("double") + lit(1.0)) / col("n_customers").cast("double"))
          .as("gini6"))
      .orderBy("c_mktsegment")
  }

  private val q130Sql =
    s"""WITH per AS (
         SELECT c_mktsegment, o_custkey, sum(${ops.Cents("o_totalprice")}) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
       r AS (
         SELECT c_mktsegment, CAST(cents AS BIGINT) AS cents,
                row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY cents, o_custkey) AS rnk
         FROM per),
       a AS (
         SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(cents) AS BIGINT) AS t, sum(rnk*cents) AS sr
         FROM r GROUP BY 1)
       SELECT c_mktsegment, n_customers, t/100.0 AS revenue,
              ${ops.R6("2.0*CAST(sr AS DOUBLE) / (CAST(n_customers AS DOUBLE)*CAST(t AS DOUBLE)) - (CAST(n_customers AS DOUBLE)+1.0)/CAST(n_customers AS DOUBLE)")} AS gini6
       FROM a ORDER BY 1"""

  /** SHIP-LATENCY PERCENTILES — the fulfillment SLA read (order date
    * → line ship date lag) per order priority: exact p50/p90/max in
    * whole days via q123's integer-histogram selection, so the
    * percentile is a SELECTED existing value (no interpolation, no
    * cross-engine ulp). The histogram domain is the lag range in
    * days (≤ a few hundred), independent of fact rows.
    *
    * Scale shape: lineitem⋈orders is the one fact-fact shuffle (both
    * sides keyed on orderkey — bucketing co-locates it at 100 TB);
    * the groupBy collapses to (priority × lag-days) before any
    * window touches data. */
  def q139(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("lag_days"))
      .agg(count(lit(1)).as("c"))
    // r7: the per-priority cumulative rides the same two-phase
    // range-partitioned core as q123 (a #priorities-partition window
    // capped parallelism at 5 tasks); identical integers, oracle SQL
    // stays the window form
    ops.groupedGlobalCumsum(hist, "o_orderpriority", col("c"), "cum", "n", col("lag_days"))
      .groupBy("o_orderpriority")
      .agg(
        max("n").as("n_lines"),
        min(when(col("cum") >= expr("(n*50 + 99) div 100"), col("lag_days"))).as("p50_days"),
        min(when(col("cum") >= expr("(n*90 + 99) div 100"), col("lag_days"))).as("p90_days"),
        max("lag_days").as("max_days"))
      .orderBy("o_orderpriority")
  }

  private val q139Sql =
    """WITH h AS (
         SELECT o_orderpriority,
                CAST(date_diff('day', o_orderdate::DATE, l_shipdate::DATE) AS INT) AS lag_days,
                count(*) AS c
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
       w AS (
         SELECT o_orderpriority, lag_days,
                CAST(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY lag_days) AS BIGINT) AS cum,
                CAST(sum(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
         FROM h)
       SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_lines,
              min(CASE WHEN cum >= (n*50 + 99) // 100 THEN lag_days END) AS p50_days,
              min(CASE WHEN cum >= (n*90 + 99) // 100 THEN lag_days END) AS p90_days,
              max(lag_days) AS max_days
       FROM w GROUP BY 1 ORDER BY 1"""

  /** WALLET DECILES — the actionable face of q130's Gini: customers
    * ranked globally by revenue and cut into 10 equal-frequency
    * bands, each with its count, revenue, corpus revenue share, and
    * running cumulative share (the "top decile holds X % of revenue"
    * table a CRM team acts on). Ranking goes through the parallel
    * `ops.globalNtile` (never a single-partition ntile window);
    * shares are integer-ppm divisions against a 1-row broadcast
    * total; the cumulative window runs over the 10-row decile frame. */
  def q142(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(ops.cents(col("o_totalprice"))).as("cents"))
    val tot = per.agg(sum("cents").as("t"))
    ops.globalNtile(per, 10, "decile", col("cents").desc, col("o_custkey"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("dc"))
      .join(broadcast(tot), lit(true), "left")
      // ppm through decimals: dc·10⁶ wraps a long once corpus cents
      // pass ~9.2e12 (Spark wraps silently, DuckDB raises — the
      // q121 asymmetric-failure class); div on decimals → BIGINT
      .withColumn("share_ppm", expr("(CAST(dc AS DECIMAL(38,0)) * 1000000) div t"))
      .withColumn("cum_share_ppm",
        expr("(CAST(sum(dc) OVER (ORDER BY decile) AS DECIMAL(38,0)) * 1000000) div t"))
      .select(col("decile"), col("n_customers"), (col("dc") / 100.0).as("revenue"),
        col("share_ppm"), col("cum_share_ppm"))
      .orderBy("decile")
  }

  private val q142Sql =
    s"""WITH per AS (
         SELECT o_custkey, sum(${ops.Cents("o_totalprice")}) AS cents
         FROM orders GROUP BY 1),
       tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM per),
       r AS (SELECT CAST(cents AS BIGINT) AS cents,
               CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS INT) AS decile
             FROM per),
       d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS dc
             FROM r GROUP BY 1)
       SELECT decile, n_customers, dc/100.0 AS revenue,
              CAST((dc::HUGEINT * 1000000) // t AS BIGINT) AS share_ppm,
              CAST((sum(dc) OVER (ORDER BY decile) * 1000000) // t AS BIGINT) AS cum_share_ppm
       FROM d LEFT JOIN tot ON true ORDER BY decile"""

  /** BRAND LOYALTY — the repeat-purchase read per brand: of the
    * customers who ever bought a brand, how many came back for it in
    * a LATER order (distinct order count ≥ 2), with the repeat share
    * in integer ppm and the brand's repeat-order revenue. The
    * merchandising complement of q125's corpus-wide cadence.
    *
    * Scale shape: facts collapse to distinct (customer, brand,
    * order) via one map-side-combined agg (part broadcast, orders
    * joined on the co-keyed orderkey); the per-(customer, brand)
    * order counts then reduce to a brand-level report — no windows,
    * counts all integer. */
  def q149(s: SparkSession, dir: String): DataFrame = {
    val cbo = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("p_brand", "o_custkey", "o_orderkey")
      .distinct()
    cbo.groupBy("p_brand", "o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"),
        sum("n_orders").as("n_brand_orders"))
      .select(col("p_brand"), col("n_customers"), col("n_repeat"),
        expr("(n_repeat * 1000000) div n_customers").as("repeat_ppm"),
        col("n_brand_orders"))
      .orderBy("p_brand")
  }

  private val q149Sql =
    """WITH cbo AS (
         SELECT DISTINCT p_brand, o_custkey, o_orderkey
         FROM lineitem JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey),
       cb AS (SELECT p_brand, o_custkey, CAST(count(*) AS BIGINT) AS n_orders
              FROM cbo GROUP BY 1, 2)
       SELECT p_brand, CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
              (CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                // count(*) AS repeat_ppm,
              CAST(sum(n_orders) AS BIGINT) AS n_brand_orders
       FROM cb GROUP BY 1 ORDER BY 1"""

  /** DISCOUNT LADDER — the pricing-response table: per whole-percent
    * discount band, line volume, exact average quantity and unit
    * price, and discounted revenue — the "does discount move
    * volume" read. The band is floor(discount·100 + 0.5) (the cents
    * transform on the discount fraction — exact both engines);
    * every average is an integer-cents sum with ONE divide
    * (avgMoney4 discipline). One map-side-combined groupBy to a
    * ≤ 101-row frame. */
  def q150(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(ops.cents(col("l_discount")).as("discount_pct"))
      .agg(count(lit(1)).as("n_lines"),
        ops.avgMoney4(col("l_quantity")).as("avg_qty"),
        ops.avgMoney4(col("l_extendedprice")).as("avg_price"),
        ops.sumMoney(disc(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy("discount_pct")

  private val q150Sql =
    s"""SELECT ${ops.Cents("l_discount")} AS discount_pct,
              count(*) AS n_lines,
              ${ops.AvgMoney4("l_quantity")} AS avg_qty,
              ${ops.AvgMoney4("l_extendedprice")} AS avg_price,
              ${ops.SumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  val qs: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_revenue_by_nation", q02, Some(q02Sql)),
    Q("q03_top_orders", q03, Some(q03Sql)),
    Q("q04_order_priority", q04, Some(q04Sql)),
    Q("q05_segment_revenue", q05, Some(q05Sql)),
    Q("q06_forecast_revenue", q06, Some(q06Sql)),
    Q("q07_returned_by_customer", q07, Some(q07Sql)),
    Q("q08_popular_products", q08, Some(q08Sql)),
    Q("q09_running_revenue", q09, Some(q09Sql)),
    Q("q10_top_parts_per_brand", q10, Some(q10Sql)),
    Q("q11_distinct_users", q11, Some(q11Sql)),
    Q("q12_quality_filter", q12, Some(q12Sql)),
    Q("q13_order_categorize", q13, Some(q13Sql)),
    Q("q14_approx_distinct", q14, None),
    Q("q15_revenue_rollup", q15, Some(q15Sql)),
    Q("q16_return_classes", q16, Some(q16Sql)),
    Q("q17_pivot_revenue", q17, Some(q17Sql)),
    Q("q18_moving_revenue", q18, Some(q18Sql)),
    Q("q19_approx_quantiles", q19, None),
    Q("q116_cdc_apply", q116, Some(q116Sql)),
    Q("q117_scd2_history", q117, Some(q117Sql)),
    Q("q123_exact_percentiles", q123, Some(q123Sql)),
    Q("q126_fk_audit", q126, Some(q126Sql)),
    Q("q128_abc_analysis", q128, Some(q128Sql)),
    Q("q129_price_demand", q129, Some(q129Sql)),
    Q("q130_revenue_gini", q130, Some(q130Sql)),
    Q("q139_ship_latency", q139, Some(q139Sql)),
    Q("q142_wallet_deciles", q142, Some(q142Sql)),
    Q("q149_brand_loyalty", q149, Some(q149Sql)),
    Q("q150_discount_ladder", q150, Some(q150Sql)))
}
