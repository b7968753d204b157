package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** One query definition: the Spark plan and (when SQL-expressible) the
  * equivalent DuckDB oracle SQL. Keeping both in one value prevents the
  * name/column drift the driver's hash-compare punishes.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The inherited relational surface (SURVEY.md §2.C): scans, projection /
  * filter, joins of every flavor, aggregation, windows, rollup/cube, set
  * ops, scalar string/date/JSON functions, dedup, top-k.
  *
  * Determinism vs the DuckDB oracle:
  *  - Double sums go through DECIMAL(18,4) (exact) and are cast back to
  *    double at the end — engine-order-of-addition can no longer change the
  *    result.
  *  - Timestamps are never emitted raw (parquet ns vs Spark µs truncation);
  *    they are cast to DATE or epoch millis.
  *  - Every ranking window has a total-order tie-break.
  *
  * Scale notes (100 TB): all queries are single declarative plans — filters
  * and projections reach the parquet scan via Catalyst pushdown; dimension
  * joins (region/nation/customer≤~1e7 rows) are broadcast; fact-fact joins
  * shuffle on their join keys only after pre-aggregation where possible.
  */
object BatchQueries {

  /** Exact sum of a double column: via decimal, back to double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact double of a DECIMAL(38,0)-summed scale-`s` unscaled-long column
    * — with [[graft.functions.DecimalFunctions.micro_quant]] the long-domain
    * form of the `sum(cast(x as DECIMAL(18,4)) * …)` money math (r18: the
    * decimal product chain was 1.9 s of q01's 2.5 s at sf0.1 — each row
    * paid 3-4 double→Decimal casts and 1-2 non-compact DECIMAL(37,8)
    * multiplies; the unscaled-long form computes the SAME rationals with
    * codegen'd integer ops and converts only the per-group sums back).
    * Equality is by construction: micro_quant is bit-identical to the
    * cast's HALF_UP quantization, integer products/sums are exact, and
    * unscaled_double is the old final decimal→double cast. */
  private def usum(c: Column, scale: Int): Column =
    graft.functions.DecimalFunctions.unscaled_double(
      sum(c.cast(DecimalType(38, 0))), scale)

  private def micro4(c: Column): Column =
    graft.functions.DecimalFunctions.micro_quant(c, 4)

  val specs: Seq[QuerySpec] = Seq(

    // ---- Aggregation: partial+final hash agg, multiple measures (TPC-H Q1 shape)
    QuerySpec(
      "q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        // long-domain money math (see usum): q4/p4/d4/t4 are the scale-4
        // unscaled quantizations the old DECIMAL(18,4) casts produced;
        // u8 = p4·(1e4 − d4) is the exact (37,8) product's unscaled value;
        // u6 rounds the (·(1e4 + t4)) scale-12 product HALF_UP to scale 6 —
        // exactly the adjustPrecisionScale the old (38,6) multiply applied
        // (the `+5e5 div 1e6` form assumes the positive money domain, which
        // the oracle re-verifies value-for-value)
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
          .select($"l_returnflag", $"l_linestatus",
            micro4($"l_quantity").as("q4"),
            micro4($"l_extendedprice").as("p4"),
            micro4($"l_discount").as("d4"),
            micro4($"l_tax").as("t4"))
          .withColumn("u8", $"p4" * (lit(10000L) - $"d4"))
          .withColumn("u6", expr("(u8 * (10000 + t4) + 500000) div 1000000"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            usum($"q4", 4).as("sum_qty"),
            usum($"p4", 4).as("sum_base_price"),
            usum($"u8", 8).as("sum_disc_price"),
            usum($"u6", 6).as("sum_charge"),
            (usum($"q4", 4) / count(lit(1))).as("avg_qty"),
            (usum($"p4", 4) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- Selective filter + single-row agg (TPC-H Q6 shape; predicate pushdown)
    QuerySpec(
      "q02_revenue_filter",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1998-01-01").cast("timestamp") &&
                  $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
          // p4·d4 = the exact (37,8) product's unscaled value (see usum)
          .select((micro4($"l_extendedprice") * micro4($"l_discount")).as("u8"))
          .agg(usum($"u8", 8).as("revenue"),
               count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // ---- Multi-way join, broadcast dims: revenue per nation (TPC-H Q5 shape)
    QuerySpec(
      "q03_revenue_by_nation",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        val n  = Tables.nation(s, d)
        val r  = Tables.region(s, d)
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          // p4·(1e4 − d4) = the exact (37,8) product's unscaled value (see usum)
          .select($"r_name", $"n_name",
            (micro4($"l_extendedprice") * (lit(10000L) - micro4($"l_discount"))).as("u8"))
          .groupBy($"r_name", $"n_name")
          .agg(usum($"u8", 8).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- Left-semi join (EXISTS)
    QuerySpec(
      "q04_semi_join",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 400000)
        c.join(bigOrders.select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ---- Left-anti join (NOT EXISTS)
    QuerySpec(
      "q05_anti_join",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val n = Tables.nation(s, d)
        c.join(o.select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_anti")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_customers_no_orders"))
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name, COUNT(*) AS n_customers_no_orders
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
        ORDER BY n_name""")),

    // ---- Left-outer join + agg over the join: order size distribution
    QuerySpec(
      "q06_outer_join_dist",
      (s, d) => {
        import s.implicits._
        val o  = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        o.join(li.select($"l_orderkey"), $"o_orderkey" === $"l_orderkey", "left_outer")
          .groupBy($"o_orderkey")
          .agg(count($"l_orderkey").as("n_items"))
          .groupBy($"n_items")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"n_items")
      },
      Some("""
        SELECT n_items, COUNT(*) AS n_orders FROM (
          SELECT o_orderkey, COUNT(l_orderkey) AS n_items
          FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY o_orderkey)
        GROUP BY n_items
        ORDER BY n_items""")),

    // ---- Ranking window: top-3 orders per customer (deterministic tie-break)
    QuerySpec(
      "q07_topk_per_customer",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        o.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rnk")
      },
      Some("""
        SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders)
        WHERE rnk <= 3
        ORDER BY o_custkey, rnk""")),

    // ---- Analytic window: lag + running sum over events per user
    QuerySpec(
      "q08_running_window",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        e.withColumn("prev_value", lag($"value", 1).over(w))
          .withColumn("running_value",
            sum(dec($"value")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
          .withColumn("seq", row_number().over(w))
          .select($"user_id", $"seq", $"event_id", $"value", $"prev_value", $"running_value")
          .filter($"seq" <= 5)
          .orderBy($"user_id", $"seq")
      },
      Some("""
        SELECT user_id, seq, event_id, value, prev_value, running_value FROM (
          SELECT user_id, event_id, value,
                 LAG(value, 1) OVER w AS prev_value,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
                 ROW_NUMBER() OVER w AS seq
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        WHERE seq <= 5
        ORDER BY user_id, seq""")),

    // ---- ROLLUP grouping sets
    QuerySpec(
      "q09_rollup",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_customers"),
               dsum($"c_acctbal").as("sum_acctbal"))
          .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")),

    // ---- CUBE grouping sets
    QuerySpec(
      "q10_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
               dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- Set operations: INTERSECT / EXCEPT / UNION with dedup semantics
    QuerySpec(
      "q11_set_ops",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
        val bigBuyers = o.filter($"o_totalprice" > 300000).select($"o_custkey".as("c_custkey"))
        val both    = building.intersect(bigBuyers).withColumn("tag", lit("both"))
        // built column-reversed on purpose: unionByName resolves by name
        // where positional union would mis-zip the columns
        val onlySeg = building.except(bigBuyers)
          .select(lit("only_building").as("tag"), $"c_custkey")
        both.unionByName(onlySeg)
          .groupBy($"tag").agg(count(lit(1)).as("n"))
          .orderBy($"tag")
      },
      Some("""
        WITH building  AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             bigbuyers AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000),
             tagged AS (
               SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM building INTERSECT SELECT * FROM bigbuyers)
               UNION ALL
               SELECT c_custkey, 'only_building' AS tag FROM (SELECT * FROM building EXCEPT SELECT * FROM bigbuyers))
        SELECT tag, COUNT(*) AS n FROM tagged GROUP BY tag ORDER BY tag""")),

    // ---- String scalar functions
    QuerySpec(
      "q12_string_fns",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(
            $"p_partkey",
            lower($"p_name").as("lname"),
            upper($"p_type").as("utype"),
            substring($"p_brand", 7, 2).as("brand_num"),
            length($"p_name").as("name_len"),
            concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
            regexp_replace($"p_name", "[aeiou]", "").as("no_vowels"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey,
               LOWER(p_name) AS lname,
               UPPER(p_type) AS utype,
               SUBSTRING(p_brand, 7, 2) AS brand_num,
               LENGTH(p_name) AS name_len,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels
        FROM part
        ORDER BY p_partkey""")),

    // ---- Date/time functions: monthly order rollup
    QuerySpec(
      "q13_datetime",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(
            date_trunc("month", $"o_orderdate").cast("date").as("month"),
            year($"o_orderdate").as("yr"))
          .agg(count(lit(1)).as("n_orders"),
               dsum($"o_totalprice").as("sum_price"))
          .orderBy($"month")
      },
      Some("""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
               EXTRACT(YEAR FROM o_orderdate) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY 1, 2
        ORDER BY month""")),

    // ---- JSON extraction from events.props
    QuerySpec(
      "q14_json",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("int"))
          // floor division: DuckDB CAST(double AS INT) rounds, Spark's
          // truncates — floor() makes both engines agree
          .withColumn("k_bucket", floor($"k" / 10).cast("int"))
          .groupBy($"event_type", $"k_bucket")
          .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
          .orderBy($"event_type", $"k_bucket")
      },
      Some("""
        SELECT event_type,
               CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, k_bucket""")),

    // ---- Exact + distinct aggregation
    QuerySpec(
      "q15_count_distinct",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n_users"),
               count(lit(1)).as("n_events"),
               dsum($"value").as("sum_value"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- CASE + math functions
    QuerySpec(
      "q16_case_math",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .select(
            $"c_custkey",
            when($"c_acctbal" < 0, "overdrawn")
              .when($"c_acctbal" < 5000, "standard")
              .otherwise("premium").as("tier"),
            abs($"c_acctbal").as("abs_bal"),
            sqrt(abs($"c_acctbal")).as("sqrt_bal"),
            pow($"c_nationkey".cast("double"), 2.0).as("nk_sq"),
            ($"c_custkey" % 7).as("mod7"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               ABS(c_acctbal) AS abs_bal,
               SQRT(ABS(c_acctbal)) AS sqrt_bal,
               POWER(CAST(c_nationkey AS DOUBLE), 2.0) AS nk_sq,
               c_custkey % 7 AS mod7
        FROM customer
        ORDER BY c_custkey""")),

    // ---- Exact deduplication: keep first event per (user_id, event_type)
    QuerySpec(
      "q17_dedup_exact",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val w = Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")
        e.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"event_id")
          .orderBy($"user_id", $"event_type")
      },
      Some("""
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
          FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // ---- SQL-text surface: same engine, spark.sql over registered views
    QuerySpec(
      "q19_sql_text",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c_mktsegment,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          WHERE o_orderstatus = 'F'
          GROUP BY c_mktsegment
          ORDER BY c_mktsegment""")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ---- Correlated EXISTS / NOT EXISTS: Catalyst decorrelates both to a
    // semi + anti join pair on l_suppkey (no per-row subquery execution) —
    // the subquery surface q04/q05 exercise only as explicit joins
    QuerySpec(
      "q58_correlated_exists",
      (s, d) => {
        Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql("""
          SELECT s_nationkey, COUNT(*) AS n_suppliers
          FROM supplier_v s
          WHERE EXISTS (SELECT 1 FROM lineitem_v l
                        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
            AND NOT EXISTS (SELECT 1 FROM lineitem_v l2
                            WHERE l2.l_suppkey = s.s_suppkey
                              AND l2.l_returnflag = 'R' AND l2.l_quantity >= 50)
          GROUP BY s_nationkey
          ORDER BY s_nationkey""")
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n_suppliers
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_suppkey = s.s_suppkey
                            AND l2.l_returnflag = 'R' AND l2.l_quantity >= 50)
        GROUP BY s_nationkey
        ORDER BY s_nationkey""")),

    // ---- Correlated scalar subqueries (one nested inside another): per
    // order, count lineitems above that order's OWN average quantity.
    // Decorrelates to two aggregations joined back on l_orderkey.
    // Determinism: quantities are integral doubles — sums exact, one IEEE
    // division per order — so the comparison is engine-independent.
    QuerySpec(
      "q59_correlated_scalar",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n_orders,
                 CAST(SUM(big_items) AS BIGINT) AS sum_big_items
          FROM (
            SELECT o.o_orderkey, o.o_orderpriority,
                   (SELECT COUNT(*) FROM lineitem_v l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_quantity > (SELECT AVG(l2.l_quantity)
                                          FROM lineitem_v l2
                                          WHERE l2.l_orderkey = l.l_orderkey)) AS big_items
            FROM orders_v o)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(big_items) AS BIGINT) AS sum_big_items
        FROM (
          SELECT o.o_orderkey, o.o_orderpriority,
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > (SELECT AVG(l2.l_quantity)
                                        FROM lineitem l2
                                        WHERE l2.l_orderkey = l.l_orderkey)) AS big_items
          FROM orders o)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- ntile quantile binning: assign docs to per-language quality
    // quartiles — the "quality band" step of a curation pipeline. Total
    // order (n_chars, doc_id) makes bin boundaries engine-independent.
    QuerySpec(
      "q62_ntile_bins",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
        Tables.documents(s, d)
          .withColumn("quartile", ntile(4).over(w))
          .groupBy($"lang", $"quartile")
          .agg(count(lit(1)).as("n_docs"),
            min($"n_chars").as("min_chars"),
            max($"n_chars").as("max_chars"))
          .orderBy($"lang", $"quartile")
      },
      Some("""
        SELECT lang, quartile, COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM (
          SELECT lang, n_chars,
                 NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
          FROM documents)
        GROUP BY lang, quartile
        ORDER BY lang, quartile""")),

    // ---- percent_rank / cume_dist: the remaining analytic-window pair
    // (q07/q62 cover ranking+ntile, q08/q34 cover lag/lead+frames).
    // Row-level output: each is ONE double division over exact integers
    // ((rank−1)/(n−1), n_le/n) → bit-identical cross-engine; rounded to
    // 6dp anyway. (n_chars, doc_id) total order keeps ranks unique.
    QuerySpec(
      "q78_quality_percentiles",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
        Tables.documents(s, d)
          .select($"lang", $"doc_id", $"n_chars",
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy($"lang", $"doc_id")
      },
      Some("""
        SELECT lang, doc_id, n_chars,
               round(PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS pct_rank,
               round(CUME_DIST() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS cume
        FROM documents
        ORDER BY lang, doc_id""")),

    // ---- approx_count_distinct (HLL++): sketch values are engine-specific
    // → rows-only check; the exact q15 covers value correctness
    QuerySpec(
      "q24_approx_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
               approx_count_distinct($"l_suppkey", 0.01).as("approx_supps"))
          .orderBy($"l_returnflag")
      },
      None),

    // ---- explode / lateral view: corpus word count, top 20
    QuerySpec(
      "q25_word_count",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(explode(split($"text", " ")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token")
          .limit(20)
      },
      Some("""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20""")),

    // ---- from_json with an explicit schema (struct access, not just path
    // extraction as in q14)
    QuerySpec(
      "q26_from_json",
      (s, d) => {
        import s.implicits._
        val schema = StructType(Seq(StructField("k", IntegerType)))
        Tables.events(s, d)
          .withColumn("parsed", from_json($"props", schema))
          .filter($"parsed.k" >= 50)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_high_k"),
               max($"parsed.k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n_high_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- exact interpolated percentiles (sort-based agg)
    QuerySpec(
      "q27_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(
            percentile($"o_totalprice", lit(0.5)).as("med"),
            percentile($"o_totalprice", lit(0.9)).as("p90"),
            min($"o_totalprice").as("lo"),
            max($"o_totalprice").as("hi"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS med,
               quantile_cont(o_totalprice, 0.9) AS p90,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- Correlated-style aggregation via join on pre-aggregated subquery
    QuerySpec(
      "q18_above_avg_orders",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val avgPrice = o.agg((dsum($"o_totalprice") / count(lit(1))).as("avg_price"))
        o.crossJoin(broadcast(avgPrice))
          .filter($"o_totalprice" > $"avg_price" * 1.5)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                              FROM orders) * 1.5
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- Right-outer join: preserved side is the build side of q06's shape
    QuerySpec(
      "q28_right_outer_join",
      (s, d) => {
        import s.implicits._
        val o  = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        li.select($"l_orderkey")
          .join(o, $"l_orderkey" === $"o_orderkey", "right_outer")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_rows"), count($"l_orderkey").as("n_items"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_items
        FROM (SELECT l_orderkey FROM lineitem) li
        RIGHT JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ---- Full-outer join over two disjoint-keyed aggregates: rows survive
    //      from either side (events users vs ordering customers)
    QuerySpec(
      "q29_full_outer_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
        val or = Tables.orders(s, d)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        ev.join(or, $"user_id" === $"o_custkey", "full_outer")
          .withColumn("side",
            when($"user_id".isNull, "orders_only")
              .when($"o_custkey".isNull, "events_only")
              .otherwise("both"))
          .groupBy($"side")
          .agg(count(lit(1)).as("n"),
               sum(coalesce($"n_events", lit(0L))).as("sum_events"),
               sum(coalesce($"n_orders", lit(0L))).as("sum_orders"))
          .orderBy($"side")
      },
      Some("""
        WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
             orc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        SELECT side, COUNT(*) AS n,
               CAST(SUM(COALESCE(n_events, 0)) AS BIGINT) AS sum_events,
               CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS sum_orders
        FROM (
          SELECT CASE WHEN user_id IS NULL THEN 'orders_only'
                      WHEN o_custkey IS NULL THEN 'events_only'
                      ELSE 'both' END AS side, n_events, n_orders
          FROM ev FULL JOIN orc ON user_id = o_custkey)
        GROUP BY side
        ORDER BY side""")),

    // ---- Analytic window: lead() + a RANGE frame (value-based, not row-based)
    QuerySpec(
      "q34_lead_range_window",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        e.withColumn("next_value", lead($"value", 1).over(w))
          .withColumn("range_sum",
            sum(dec($"value")).over(w.rangeBetween(-10, 0)).cast("double"))
          .withColumn("seq", row_number().over(w))
          .filter($"seq" <= 5)
          .select($"user_id", $"seq", $"event_id", $"value", $"next_value", $"range_sum")
          .orderBy($"user_id", $"seq")
      },
      Some("""
        SELECT user_id, seq, event_id, value, next_value, range_sum FROM (
          SELECT user_id, event_id, value,
                 LEAD(value, 1) OVER w AS next_value,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY event_id
                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum,
                 ROW_NUMBER() OVER w AS seq
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        WHERE seq <= 5
        ORDER BY user_id, seq""")),

    // ---- MapType scalar functions: construction, element access, keys/values.
    //      The oracle recomputes the same VALUES directly (DuckDB's MAP
    //      extraction semantics differ; the gate compares results, not plans).
    QuerySpec(
      "q35_map_functions",
      (s, d) => {
        import s.implicits._
        val meta = map(
          lit("brand"), $"p_brand",
          lit("ptype"), $"p_type",
          lit("size"), $"p_size".cast("string"))
        Tables.part(s, d)
          .filter($"p_size" > 40)
          .select($"p_partkey", meta.as("meta"))
          .select(
            $"p_partkey",
            element_at($"meta", "brand").as("brand"),
            element_at($"meta", "ptype").as("ptype"),
            size($"meta").as("n_keys"),
            array_join(sort_array(map_keys($"meta")), ",").as("keys_csv"),
            array_join(map_values($"meta"), "|").as("vals_csv"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey, p_brand AS brand, p_type AS ptype,
               3 AS n_keys,
               'brand,ptype,size' AS keys_csv,
               p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS vals_csv
        FROM part
        WHERE p_size > 40
        ORDER BY p_partkey""")),

    // ---- Explicit GROUPING SETS (beyond q09 rollup / q10 cube): the two
    //      single-column sets plus the grand total, via the Spark 4
    //      Dataset.groupingSets API
    QuerySpec(
      "q36_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
            $"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
               dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- pivot (long→wide): order counts by priority × status. Explicit
    //      pivot values keep the plan a single pass (no distinct-values
    //      pre-query) — the 100 TB form. Spark leaves empty cells null
    //      where conditional COUNT gives 0, hence the na.fill.
    QuerySpec(
      "q38_pivot",
      (s, d) => {
        val p = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        p.na.fill(0L, Seq("F", "O", "P")).orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- unpivot/melt (wide→long): per-flag measures to (metric, value)
    //      rows — pre-aggregated first so the unpivot touches F rows, not
    //      the fact table
    QuerySpec(
      "q39_unpivot",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
               dsum(col("l_extendedprice")).as("sum_price"))
          .unpivot(Array(col("l_returnflag")),
                   Array(col("sum_qty"), col("sum_price")),
                   "metric", "value")
          .orderBy(col("l_returnflag"), col("metric"))
      },
      Some("""
        WITH a AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
        ORDER BY l_returnflag, metric"""))
  )
}
