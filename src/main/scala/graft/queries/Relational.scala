package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef._

/** Core relational surface: scan/filter/project, hash & broadcast joins,
  * aggregation, window functions, top-k, set ops, rollup, subquery-style
  * plans. The reference delegates ad-hoc SQL to any Iceberg engine
  * (reference README "Bring Your Own Analytics"); these queries prove the
  * Spark engine covers that delegated surface with plans that push filters
  * to the parquet scan and broadcast small dimensions.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: wide aggregation with exact money sums (TPC-H Q1 shape) ----
    QueryDef(
      "q01_agg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            msum(col("l_quantity")).as("sum_qty"),
            msum(col("l_extendedprice")).as("sum_base_price"),
            psum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            psum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            mavg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: selective filter + narrow projection (pushdown/pruning) ----
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-06-01").cast(TimestampType) &&
            col("l_quantity") >= lit(48.0))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00' AND l_quantity >= 48.0
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: 3-way join + agg + ordered top-k (TPC-H Q3 shape) ----
    QueryDef(
      "q03_join_topk",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(psum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""
        SELECT o_orderkey, o_orderdate,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 20""")),

    // ---- q04: broadcast dimension join + agg by dimension attribute ----
    QueryDef(
      "q04_broadcast_join",
      (s, dir) => {
        val p = t(s, dir, "part")
        val l = t(s, dir, "lineitem")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_items"),
            msum(col("l_quantity")).as("sum_qty"),
            psum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ---- q05: 5-way snowflake join, revenue by nation (TPC-H Q5 shape) ----
    QueryDef(
      "q05_snowflake_join",
      (s, dir) => {
        val r = t(s, dir, "region")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // aggregate BELOW the join: revenue folds to one exact-decimal row
        // per order first, so the orders join probes ~4x fewer rows and
        // COUNT(DISTINCT o_orderkey) degenerates to count(*) — no expand.
        // Decimal addition is associative, so the two-level sum is
        // bit-identical to the flat psum.
        val perOrder = l.groupBy(col("l_orderkey"))
          .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("__rev"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum(col("__rev")).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- q06: window function — top-3 orders per customer ----
    QueryDef(
      "q06_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn""")),

    // ---- q07: global ordered top-k ----
    QueryDef(
      "q07_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),

    // ---- q08: set operation (EXCEPT, distinct semantics) ----
    QueryDef(
      "q08_set_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")).distinct()
          .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")).distinct())
          .orderBy(col("custkey"))
      },
      Some("""
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey""")),

    // ---- q09: distinct aggregation per group ----
    QueryDef(
      "q09_distinct_agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("o_custkey")).as("n_customers"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               COUNT(*) AS n_rows
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ---- q10: left-semi join (EXISTS) ----
    QueryDef(
      "q10_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey""")),

    // ---- q11: left-anti join (NOT EXISTS) ----
    QueryDef(
      "q11_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey""")),

    // ---- q12: rollup (multi-level aggregation) ----
    QueryDef(
      "q12_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("status"), col("priority")),
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- q13: conditional aggregation by time bucket ----
    QueryDef(
      "q13_case_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 1L)
              .otherwise(0L)).as("n_high"),
            msum(col("o_totalprice")).as("total"))
          .orderBy(col("month")),
      Some("""
        SELECT date_trunc('month', o_orderdate) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN substring(o_orderpriority, 1, 1) IN ('1','2') THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
        ORDER BY month""")),

    // ---- q14: aggregate-derived predicate (above-nation-average balance) --
    QueryDef(
      "q14_subquery_avg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val natAvg = c.groupBy(col("c_nationkey").as("nk"))
          .agg(mavg(col("c_acctbal")).as("nation_avg"))
        c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .select(col("c_custkey"), col("c_acctbal"), col("nation_avg"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_acctbal, nation_avg
        FROM customer
        JOIN (SELECT c_nationkey AS nk,
                     CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS nation_avg
              FROM customer GROUP BY c_nationkey) a
          ON c_nationkey = nk
        WHERE c_acctbal > nation_avg
        ORDER BY c_custkey""")),

    // ---- q72: pivot (wide-format counts per hour × event type). A FIXED
    // value list keeps the plan single-pass (no values-discovery job); the
    // oracle is the portable CASE form. Empty cells coalesce to 0 so both
    // engines agree. ns-ts gotcha: hour-truncate on both sides.
    QueryDef(
      "q72_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("ts_hour"))
          .pivot("event_type", types)
          .count()
        types.foldLeft(p)((d, c) => d.withColumn(c, coalesce(col(c), lit(0L))))
          .orderBy(col("ts_hour"))
      },
      Some("""
        SELECT date_trunc('hour', ts) AS ts_hour,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
        FROM events
        GROUP BY 1
        ORDER BY ts_hour""")),

    // ---- q74: salted skew join under the gate. events is the canonical
    // hot-key shape (5 event types across 100k rows — every key is hot);
    // Skew.saltedJoin fans each hot key across 8 salt sub-keys and
    // replicates the dim side per salt, so the shuffle spreads to 8 tasks
    // per key instead of one straggler. Salting must be SEMANTICALLY
    // INVISIBLE: the oracle is the plain inner join, so the gate proves
    // the salt fan-out/replication changes nothing.
    QueryDef(
      "q74_salted_join",
      (s, dir) => {
        val events = t(s, dir, "events")
        val dim = events.select(col("event_type")).distinct()
          .withColumn("weight", length(col("event_type")))
        graft.operators.Skew.saltedJoin(events, dim, "event_type", salts = 8)
          .groupBy(col("event_type"), col("weight"))
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT e.event_type, len(e.event_type) AS weight,
               COUNT(*) AS n, SUM(user_id)::BIGINT AS sum_users
        FROM events e
        JOIN (SELECT DISTINCT event_type FROM events) d USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type""")),

    // ---- q73: extended window functions (lag/lead/ntile/percent_rank/
    // cume_dist) in one per-user pass — ANSI semantics in both engines;
    // (value, event_id) ordering makes every rank deterministic, and the
    // rank ratios are exact integer divisions.
    QueryDef(
      "q73_window_extended",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            lag(col("event_id"), 1).over(w).as("prev_id"),
            lead(col("event_id"), 1).over(w).as("next_id"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id,
               LAG(event_id, 1) OVER w AS prev_id,
               LEAD(event_id, 1) OVER w AS next_id,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY event_id""")),

    // ---- q138: large-order lookup (TPC-H Q18 shape) — the IN-subquery
    // with a grouped HAVING, decorrelated to an aggregate + semi-shaped
    // join: the lineitem agg reduces to (orderkey, qty) pairs BEFORE any
    // join touches orders/customer, so the wide tables only ever join the
    // 200-row survivor set (broadcast at this size; at 100 TB the agg is
    // the one lineitem-scale shuffle and survivors stay tiny by the
    // HAVING's selectivity). Exact-decimal quantity sums (q01 convention).
    QueryDef(
      "q138_large_orders",
      (s, dir) => {
        val big = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(dec2(col("l_quantity"))).as("__q"))
          .filter(col("__q") > 250)
        Tables.load(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("__q").cast("double").as("total_qty"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(q AS DOUBLE) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
              FROM lineitem GROUP BY 1
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey""")),

    // ---- q139: NOT EXISTS decorrelation (TPC-H Q22 shape) — an
    // uncorrelated scalar subquery (global average balance, exact-decimal
    // mavg so both engines divide the same sum) plus a correlated NOT
    // EXISTS that Catalyst rewrites to a LEFT ANTI join: the anti side
    // ships only urgent orders' custkeys, customers never fan out.
    QueryDef(
      "q139_no_urgent_customers",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val avgBal = c.agg(
          (sum(dec6(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
            .as("__avg"))
        val urgent = Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("__avg"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                                       AS DOUBLE) / COUNT(*)
                           FROM customer)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey"""))
  )
}
