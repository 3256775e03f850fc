package graft.operators

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Core relational operators: scans, filters, projections, sorts, set ops
  * (SURVEY.md §2b "Scans", "Projections / filters", "Sorts / limits / set ops").
  *
  * Scale notes:
  *  - scan queries are written so Catalyst pushes predicates and prunes
  *    columns into the parquet reader (verify with .explain: PushedFilters /
  *    ReadSchema) — at 100 TB the scan reads only the referenced columns and
  *    skips row groups via min/max stats.
  *  - sort_limit plans as TakeOrderedAndProject: per-partition top-k then a
  *    driver-side merge of k·numPartitions rows — no global sort shuffle.
  *  - set ops are key-distinct shuffles on the (small) key domain, with
  *    partial aggregation map-side.
  */
object Relational {

  /** Projection + column pruning: scan must read only 3 of 11 columns. */
  val scanProject: GraftQuery = GraftQuery(
    "scan_project",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_orderkey, l_linenumber""")
  )

  /** Predicate pushdown: both filters reach the parquet scan. */
  val scanFilterPushdown: GraftQuery = GraftQuery(
    "scan_filter_pushdown",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" < lit("1996-01-01").cast("timestamp") && $"l_quantity" > 45.0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity > 45.0
            ORDER BY l_orderkey, l_linenumber""")
  )

  /** Compound predicates: AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL. */
  val filterPred: GraftQuery = GraftQuery(
    "filter_pred",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .filter(
          ($"o_orderpriority".like("1-%") ||
            ($"o_orderstatus".isin("F", "P") && !$"o_totalprice".between(1000.0, 50000.0))) &&
          $"o_orderdate".isNotNull)
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
            WHERE (o_orderpriority LIKE '1-%'
                   OR (o_orderstatus IN ('F','P') AND NOT (o_totalprice BETWEEN 1000.0 AND 50000.0)))
              AND o_orderdate IS NOT NULL
            ORDER BY o_orderkey""")
  )

  /** Computed columns: CASE WHEN, arithmetic, casts (floor-then-cast keeps
    * Spark truncate-vs-DuckDB-round cast semantics out of the comparison). */
  val projectCompute: GraftQuery = GraftQuery(
    "project_compute",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 200000.0, "large")
            .when($"o_totalprice" > 50000.0, "medium")
            .otherwise("small").as("size_class"),
          floor($"o_totalprice" / 1000.0).cast("long").as("price_k"),
          ($"o_totalprice" * 1.1).as("price_taxed"),
          concat($"o_orderstatus", lit("/"), $"o_orderpriority").as("status_pri"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CASE WHEN o_totalprice > 200000.0 THEN 'large'
                        WHEN o_totalprice > 50000.0 THEN 'medium'
                        ELSE 'small' END AS size_class,
                   CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k,
                   o_totalprice * 1.1 AS price_taxed,
                   o_orderstatus || '/' || o_orderpriority AS status_pri
            FROM orders ORDER BY o_orderkey""")
  )

  /** Global sort + limit — plans as TakeOrderedAndProject (no full sort). */
  val sortLimit: GraftQuery = GraftQuery(
    "sort_limit",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""")
  )

  private def fKeys(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
  }
  private def oKeys(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
  }

  /** Set union (distinct semantics, like SQL UNION). */
  val setUnion: GraftQuery = GraftQuery(
    "set_union",
    (s, dir) => {
      import s.implicits._
      fKeys(s, dir).union(oKeys(s, dir)).distinct().orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            UNION
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            ORDER BY o_custkey""")
  )

  /** Set intersection. */
  val setIntersect: GraftQuery = GraftQuery(
    "set_intersect",
    (s, dir) => {
      import s.implicits._
      fKeys(s, dir).intersect(oKeys(s, dir)).orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            ORDER BY o_custkey""")
  )

  /** Set difference. */
  val setExcept: GraftQuery = GraftQuery(
    "set_except",
    (s, dir) => {
      import s.implicits._
      fKeys(s, dir).except(oKeys(s, dir)).orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            ORDER BY o_custkey""")
  )

  /** The SQL-string surface: temp views + `spark.sql` through the same
    * Catalyst pipeline as the DataFrame API — proven here on a TPC-H
    * Q5-shaped five-table star join (revenue by nation within a region and
    * date range). Same plan quality as the fluent form: filters push to
    * scans, small dims broadcast, join order is Catalyst's. */
  val sqlStarQ5: GraftQuery = GraftQuery(
    "sql_star_q5",
    (s, dir) => {
      for (t <- Seq("region", "nation", "customer", "orders", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT n_name,
                      (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue,
                      count(*) AS n_lines
               FROM v_region
               JOIN v_nation   ON n_regionkey = r_regionkey
               JOIN v_customer ON c_nationkey = n_nationkey
               JOIN v_orders   ON o_custkey = c_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate <  TIMESTAMP '1998-01-01'
               GROUP BY n_name
               ORDER BY revenue DESC, n_name""")
    },
    Some("""SELECT n_name,
                   (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue,
                   count(*) AS n_lines
            FROM region
            JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name""")
  )

  /** TPC-H Q3-shaped shipping-priority query: a segment-filtered
    * customer⋈orders⋈lineitem join with a date window on both fact
    * predicates and a top-10 by computed revenue. The classic "filters
    * on both sides of the join push to the scans, small dim broadcasts,
    * top-k is a TakeOrderedAndProject" plan — at 100 TB the date
    * predicates prune partitions before any shuffle, and the limit never
    * materializes the full ordered result. */
  val sqlQ3: GraftQuery = GraftQuery(
    "sql_q3",
    (s, dir) => {
      for (t <- Seq("customer", "orders", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT l_orderkey,
                      (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue,
                      o_orderdate
               FROM v_customer
               JOIN v_orders   ON o_custkey = c_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1998-03-15'
                 AND l_shipdate  > TIMESTAMP '1998-03-15'
               GROUP BY l_orderkey, o_orderdate
               ORDER BY revenue DESC, l_orderkey
               LIMIT 10""")
    },
    Some("""SELECT l_orderkey,
                   (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate  > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10""")
  )

  /** TPC-H Q18-shaped large-volume-customer query: an IN-subquery over a
    * grouped-HAVING fact aggregate, joined back through orders to
    * customer. Catalyst plans the IN as a left-semi join against the
    * aggregated subquery — the aggregate reduces the fact table BEFORE
    * any join touches it, which is the only formulation that survives at
    * 100 TB (filtering orders by a per-order quantity sum). */
  val sqlQ18: GraftQuery = GraftQuery(
    "sql_q18",
    (s, dir) => {
      for (t <- Seq("customer", "orders", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                      (round(o_totalprice, 2) + 0.0) AS totalprice,
                      (round(sum(l_quantity), 2) + 0.0) AS sum_qty
               FROM v_customer
               JOIN v_orders   ON o_custkey = c_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               WHERE o_orderkey IN (
                 SELECT l_orderkey FROM v_lineitem
                 GROUP BY l_orderkey HAVING sum(l_quantity) > 120)
               GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
               ORDER BY totalprice DESC, o_orderkey""")
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   (round(o_totalprice, 2) + 0.0) AS totalprice,
                   (round(sum(l_quantity), 2) + 0.0) AS sum_qty
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey HAVING sum(l_quantity) > 120)
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY totalprice DESC, o_orderkey""")
  )

  /** TPC-H Q7-shaped bilateral trade volume: lineitem joined out to the
    * supplier nation AND (through orders) the customer nation, filtered
    * to one nation pair in both directions, aggregated by
    * (supp, cust, year). The scale shape: both nation filters reach the
    * two nation-dim scans (each a broadcast), so the fact side is
    * reduced by the semi-joinable supplier/customer keys BEFORE the big
    * orders⋈lineitem join — Catalyst's join reorder does this from the
    * declarative form; the year comes off the already-filtered rows as
    * a projection. Two fact shuffles total at any scale. */
  val sqlQ7: GraftQuery = GraftQuery(
    "sql_q7",
    (s, dir) => {
      for (t <- Seq("supplier", "customer", "orders", "lineitem", "nation"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      year(l_shipdate) AS l_year,
                      (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue
               FROM v_supplier
               JOIN v_lineitem ON s_suppkey = l_suppkey
               JOIN v_orders   ON o_orderkey = l_orderkey
               JOIN v_customer ON c_custkey = o_custkey
               JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
               JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
               WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1998-01-01'
               GROUP BY supp_nation, cust_nation, l_year
               ORDER BY supp_nation, cust_nation, l_year""")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year""")
  )

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer over one quarter, top-20. The date predicate prunes the
    * orders side and the returnflag predicate prunes lineitem BEFORE
    * their join (at 100 TB with date-partitioned orders this is a
    * partition-pruned scan); customer and nation broadcast onto the
    * aggregated result, and the top-20 is a TakeOrderedAndProject —
    * the full ordered customer ranking never materializes.
    *
    * Revenue accumulates in DECIMAL, not DOUBLE: the fixture's money
    * columns are exact 2-decimal values, and a double sum is
    * order-dependent in its last ulps — this query's sf0.01 result
    * lands EXACTLY on a round-half boundary (…3.595), where engine
    * summation order flips the rounded cent. Exact decimal aggregation
    * is order-independent (and what a real money pipeline uses). The
    * round must ALSO happen on the decimal, before the presentation
    * cast to DOUBLE: Spark rounds doubles through their shortest
    * decimal string while DuckDB rounds the binary value, so
    * round(CAST(.595 AS DOUBLE)) splits .60 vs .59 across engines —
    * round the exact value, then cast. */
  val sqlQ10: GraftQuery = GraftQuery(
    "sql_q10",
    (s, dir) => {
      for (t <- Seq("customer", "orders", "lineitem", "nation"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT c_custkey, c_name,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE) AS revenue,
                      (round(c_acctbal, 2) + 0.0) AS acctbal, n_name
               FROM v_customer
               JOIN v_orders   ON o_custkey = c_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               JOIN v_nation   ON c_nationkey = n_nationkey
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate <  TIMESTAMP '1996-04-01'
                 AND l_returnflag = 'R'
               GROUP BY c_custkey, c_name, c_acctbal, n_name
               ORDER BY revenue DESC, c_custkey
               LIMIT 20""")
    },
    Some("""SELECT c_custkey, c_name,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE) AS revenue,
                   (round(c_acctbal, 2) + 0.0) AS acctbal, n_name
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20""")
  )

  /** ANALYZE-style table statistics in one pass: row count, per-column
    * min/max, exact distinct counts, null-free aggregate sums — the
    * statistics every cost-based optimizer (including Catalyst's CBO)
    * feeds on, produced as a query instead of a catalog side effect so
    * they compose (per-partition stats, stats-over-time) like any other
    * result. One scan; all plain aggregates partial map-side; the
    * DISTINCT columns plan through Spark's Expand (one row-multiplying
    * operator, one shuffle, each distinct key counted in its own group)
    * — the real ANALYZE shape. At 100 TB production swaps the exact NDVs
    * for approx_count_distinct (HLL — same query, one function name, the
    * agg_approx_distinct path); exact is kept here because the DuckDB
    * oracle grades value equality. */
  val columnStats: GraftQuery = GraftQuery(
    "scan_column_stats",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        min($"l_orderkey").as("min_orderkey"),
        max($"l_orderkey").as("max_orderkey"),
        countDistinct($"l_orderkey").as("ndv_orderkey"),
        countDistinct($"l_partkey").as("ndv_partkey"),
        countDistinct($"l_returnflag").as("ndv_returnflag"),
        min($"l_shipdate").as("min_shipdate"),
        max($"l_shipdate").as("max_shipdate"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(sum($"l_extendedprice".cast("decimal(18,4)")), 2)
          .cast("double").as("sum_price"))
    },
    Some("""SELECT count(*) AS n_rows,
                   min(l_orderkey) AS min_orderkey,
                   max(l_orderkey) AS max_orderkey,
                   count(DISTINCT l_orderkey) AS ndv_orderkey,
                   count(DISTINCT l_partkey) AS ndv_partkey,
                   count(DISTINCT l_returnflag) AS ndv_returnflag,
                   min(l_shipdate) AS min_shipdate,
                   max(l_shipdate) AS max_shipdate,
                   (round(avg(l_quantity), 4) + 0.0) AS avg_qty,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                     AS sum_price
            FROM lineitem""")
  )

  /** TPC-H Q12-shaped shipping-lateness report, adapted to the fixture's
    * columns (no l_shipmode/l_receiptdate ship with the synthetic
    * lineitem, so lateness is shipdate vs orderdate and the grouping key
    * is the order priority): per priority class, how many lines shipped
    * more than 60 days after the order was placed. One fact⋈fact
    * equi-join on the order key feeding a single hash aggregate over a
    * 5-value grouping key — the join is the only shuffle, the CASE
    * conditionals fold into the aggregate map-side, and at 100 TB both
    * scans prune to the three referenced columns each. The DuckDB sum()
    * of a CASE is HUGEINT — cast to BIGINT in BOTH engines (round-5
    * oracle-type lesson). */
  val sqlQ12: GraftQuery = GraftQuery(
    "sql_q12",
    (s, dir) => {
      for (t <- Seq("orders", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT o_orderpriority,
                      CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                    THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
                      count(*) AS total_lines,
                      (round(CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                          THEN 1 ELSE 0 END) AS DOUBLE)
                            / count(*), 4) + 0.0) AS late_ratio
               FROM v_orders
               JOIN v_lineitem ON l_orderkey = o_orderkey
               GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority,
                   CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
                   count(*) AS total_lines,
                   (round(CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 4) + 0.0) AS late_ratio
            FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority""")
  )

  /** TPC-H Q14-shaped promo-revenue share, per ship month: what fraction
    * of revenue came from promotional parts. The part dimension
    * broadcasts onto the fact scan (no fact shuffle before the
    * aggregate); revenue accumulates in DECIMAL — exact and
    * order-independent, the sql_q10 money discipline — and both sums
    * are cast to DOUBLE BEFORE the ratio so the division is one IEEE
    * op on identical inputs in both engines (decimal-division scale
    * rules differ across engines; double division does not). The month
    * key comes off date_trunc in the scan projection, so at 100 TB a
    * shipdate-partitioned table prunes and the aggregate's key domain
    * is months, not rows. */
  val sqlQ14: GraftQuery = GraftQuery(
    "sql_q14",
    (s, dir) => {
      for (t <- Seq("part", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT date_trunc('month', l_shipdate) AS ship_month,
                      (round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                            / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                       * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                            4) + 0.0) AS promo_pct,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                        AS revenue
               FROM v_lineitem
               JOIN v_part ON p_partkey = l_partkey
               GROUP BY ship_month
               ORDER BY ship_month""")
    },
    Some("""SELECT date_trunc('month', l_shipdate) AS ship_month,
                   (round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                         4) + 0.0) AS promo_pct,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                     AS revenue
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            GROUP BY ship_month
            ORDER BY ship_month""")
  )

  /** TPC-H Q6-shaped forecasting-revenue query: a pure filter-aggregate —
    * three scan predicates, one global sum, one output row. The
    * simplest shape in the suite and the purest pushdown test: every
    * predicate must reach the parquet reader (row-group min/max stats
    * skip most of the file at 100 TB with a year's partition pruning on
    * top), and the aggregate is a map-side-complete partial + 1-row
    * final. Revenue in exact DECIMAL (money discipline). */
  val sqlQ6: GraftQuery = GraftQuery(
    "sql_q6",
    (s, dir) => {
      graft.sources.Tables.table(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""SELECT CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                    * CAST(l_discount AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                        AS revenue,
                      count(*) AS n_lines
               FROM v_lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1997-01-01'
                 AND l_discount BETWEEN 0.05 AND 0.07
                 AND l_quantity < 24""")
    },
    Some("""SELECT CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * CAST(l_discount AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                     AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24""")
  )

  /** TPC-H Q13-shaped customer order-count distribution: LEFT join
    * customers to orders, count per customer (outer-preserving — the
    * zero-order customers are the point of the query), then histogram
    * the counts. Two hash aggregates back to back, the second over a
    * tiny key domain; the left join shuffles each side once (or zero
    * for the customer side with a bucketed layout). The distribution
    * shape — most engines' first "how active is my user base" query. */
  val sqlQ13: GraftQuery = GraftQuery(
    "sql_q13",
    (s, dir) => {
      for (t <- Seq("customer", "orders"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT c_count, count(*) AS custdist
               FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                     FROM v_customer LEFT OUTER JOIN v_orders
                       ON c_custkey = o_custkey
                     GROUP BY c_custkey)
               GROUP BY c_count
               ORDER BY custdist DESC, c_count DESC""")
    },
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey
                  GROUP BY c_custkey) t
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC""")
  )

  /** TPC-H Q15-shaped top supplier: per-supplier quarterly revenue, then
    * the supplier(s) achieving the maximum — the "view + scalar
    * subquery against the same view" pattern. Catalyst evaluates the
    * revenue aggregate once per reference but the SHAPE is what grades:
    * the max is a 1-row scalar subquery joined back, never a sort of
    * the full supplier ranking. Exact DECIMAL revenue so the max
    * comparison is boundary-free (the money discipline means equal
    * revenues are EXACTLY equal). */
  val sqlQ15: GraftQuery = GraftQuery(
    "sql_q15",
    (s, dir) => {
      for (t <- Seq("supplier", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""WITH revenue AS (
                 SELECT l_suppkey AS supplier_no,
                        sum(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
                 FROM v_lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate <  TIMESTAMP '1996-04-01'
                 GROUP BY l_suppkey)
               SELECT s_suppkey, s_name,
                      CAST((round(total_revenue, 2) + 0.0) AS DOUBLE) AS total_revenue
               FROM v_supplier JOIN revenue ON s_suppkey = supplier_no
               WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
               ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     sum(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name,
                   CAST((round(total_revenue, 2) + 0.0) AS DOUBLE) AS total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey""")
  )

  /** TPC-H Q22-shaped global-sales-opportunity query, adapted to fixture
    * columns (no c_phone, so the country code is the nation key):
    * customers with above-average positive balances who have NEVER
    * ordered, grouped by nation. The two famous shapes in one query:
    * an uncorrelated 1-row threshold aggregate (count + cent-sum in ONE
    * pass over customer, cross-joined back as a 1-row broadcast) and a
    * NOT EXISTS that Catalyst plans as a left-ANTI join (never a
    * per-customer probe). Balance sums in exact DECIMAL, and the mean
    * threshold compares in SCALED-INTEGER space (bal·100·n > Σbal·100,
    * all BIGINT): `bal > avg(double)` puts a partition-order-dependent
    * double sum on a comparison boundary that a balance sitting exactly
    * at the mean could flip across engines (round-8 advice; the
    * FIXTURES.md money-column discipline). Two scalar subqueries (count,
    * sum separately) would be exact too but scan customer twice — the
    * 1-row cross join pays one scan and one BNLJ of one row. */
  val sqlQ22: GraftQuery = GraftQuery(
    "sql_q22",
    (s, dir) => {
      for (t <- Seq("customer", "orders"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""WITH thr AS (SELECT count(*) AS n,
                                   sum(CAST((round(c_acctbal * 100) + 0.0) AS BIGINT)) AS s_cents
                            FROM v_customer WHERE c_acctbal > 0.0)
               SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                      CAST((round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                        AS totacctbal
               FROM v_customer CROSS JOIN thr
               WHERE CAST((round(c_acctbal * 100) + 0.0) AS BIGINT) * thr.n > thr.s_cents
                 AND NOT EXISTS (SELECT 1 FROM v_orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderdate >= TIMESTAMP '2000-01-01')
               GROUP BY c_nationkey
               ORDER BY cntrycode""")
    },
    Some("""WITH thr AS (SELECT count(*) AS n,
                                sum(CAST((round(c_acctbal * 100) + 0.0) AS BIGINT)) AS s_cents
                         FROM customer WHERE c_acctbal > 0.0)
            SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                   CAST((round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                     AS totacctbal
            FROM customer CROSS JOIN thr
            WHERE CAST((round(c_acctbal * 100) + 0.0) AS BIGINT) * thr.n > thr.s_cents
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
            ORDER BY cntrycode""")
  )

  /** Correlated subqueries through the SQL surface: a correlated scalar
    * aggregate (balance above own-nation average) plus a correlated
    * EXISTS (has an urgent order). Catalyst DECORRELATES both — the
    * scalar subquery becomes an aggregate joined back on the correlation
    * key, EXISTS becomes a left-semi join — so the executed plan is
    * ordinary co-partitioned joins + hash aggregates, never a per-row
    * re-execution of the subquery (the thing that would be quadratic at
    * scale). Same SQL text runs in DuckDB as the oracle. */
  val sqlSubquery: GraftQuery = GraftQuery(
    "sql_subquery",
    (s, dir) => {
      for (t <- Seq("customer", "orders"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT c_custkey, (round(c_acctbal, 2) + 0.0) AS acctbal
               FROM v_customer c
               WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM v_customer c2
                                  WHERE c2.c_nationkey = c.c_nationkey)
                 AND EXISTS (SELECT 1 FROM v_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderpriority = '1-URGENT')
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, (round(c_acctbal, 2) + 0.0) AS acctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                               WHERE c2.c_nationkey = c.c_nationkey)
              AND EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey""")
  )

  /** Null cleaning (na.fill / na.drop / replace): nulls are introduced
    * deterministically via nullif so the fixtures' null-free data gains a
    * real null pattern, then cleaned both ways with counts proving each
    * policy. The na API is plain Catalyst projections — scan-side, no
    * shuffle. */
  val cleanNa: GraftQuery = GraftQuery(
    "clean_na",
    (s, dir) => {
      import s.implicits._
      val withNulls = graft.sources.Tables.events(s, dir)
        .select($"event_id", $"event_type",
          nullif($"value", round($"value", 0)).as("v"), // integral values -> null
          nullif($"user_id", lit(7L)).as("uid"))        // one hot user -> null
      val filled = withNulls.na.fill(Map("v" -> -1.0, "uid" -> -1L))
      val dropped = withNulls.na.drop(Seq("v", "uid"))
      filled.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum(when($"v" === -1.0, 1L).otherwise(0L)).as("n_filled_v"),
             sum(when($"uid" === -1L, 1L).otherwise(0L)).as("n_filled_uid"))
        .join(dropped.groupBy($"event_type").agg(count(lit(1)).as("n_complete")),
          Seq("event_type"), "left")
        .orderBy($"event_type")
    },
    Some("""WITH wn AS (
              SELECT event_type,
                     nullif(value, round(value, 0)) AS v,
                     nullif(user_id, 7) AS uid
              FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled_v,
                   CAST(sum(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled_uid,
                   CAST(sum(CASE WHEN v IS NOT NULL AND uid IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_complete
            FROM wn GROUP BY event_type ORDER BY event_type""")
  )

  /** Registers the part-supplier views (base tables + the DERIVED
    * partsupp — see [[graft.sources.Tables.partsupp]]; the fixture ships
    * no partsupp parquet, so both engines derive the identical table
    * with integer-exact arithmetic). */
  private def partsuppViews(s: org.apache.spark.sql.SparkSession,
                            dir: String, extra: String*): Unit = {
    for (t <- Seq("part", "supplier", "nation", "region") ++ extra)
      graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
    graft.sources.Tables.partsupp(s, dir).createOrReplaceTempView("v_partsupp")
  }

  private def psCte: String =
    s"partsupp AS (${graft.sources.Tables.partsuppOracleCte})"

  /** TPC-H Q2-shaped minimum-cost supplier: for every ECONOMY part under
    * size 20, the European supplier(s) offering it at the part's minimum
    * European supply cost. The cost comparison runs in exact CENTS
    * (BIGINT) — `= min(double)` would sit a tie on a representation
    * boundary (the q22 lesson).
    *
    * Scale shape: the correlated min-cost subquery DECORRELATES into a
    * per-part aggregate joined back on the part key (never a per-row
    * probe); region/nation broadcast onto supplier; the only real
    * shuffles are the partsupp⋈part and min-aggregate exchanges on the
    * part key — which AQE coalesces, and which a bucketed partsupp
    * layout would eliminate at 100 TB. */
  val sqlQ2: GraftQuery = GraftQuery(
    "sql_q2",
    (s, dir) => {
      partsuppViews(s, dir)
      s.sql("""SELECT (round(s_acctbal, 2) + 0.0) AS acctbal, s_name, n_name,
                      p_partkey, p_brand, ps_supplycost
               FROM v_partsupp
               JOIN v_part     ON p_partkey = ps_partkey
               JOIN v_supplier ON s_suppkey = ps_suppkey
               JOIN v_nation   ON n_nationkey = s_nationkey
               JOIN v_region   ON r_regionkey = n_regionkey
               WHERE p_type = 'ECONOMY' AND p_size < 20
                 AND r_name = 'EUROPE'
                 AND ps_supplycost_cents = (
                   SELECT min(ps2.ps_supplycost_cents)
                   FROM v_partsupp ps2
                   JOIN v_supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                   JOIN v_nation n2   ON n2.n_nationkey = s2.s_nationkey
                   JOIN v_region r2   ON r2.r_regionkey = n2.n_regionkey
                   WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
               ORDER BY acctbal DESC, n_name, s_name, p_partkey""")
    },
    Some(s"""WITH $psCte
             SELECT (round(s_acctbal, 2) + 0.0) AS acctbal, s_name, n_name,
                    p_partkey, p_brand, ps_supplycost
             FROM partsupp
             JOIN part     ON p_partkey = ps_partkey
             JOIN supplier ON s_suppkey = ps_suppkey
             JOIN nation   ON n_nationkey = s_nationkey
             JOIN region   ON r_regionkey = n_regionkey
             WHERE p_type = 'ECONOMY' AND p_size < 20
               AND r_name = 'EUROPE'
               AND ps_supplycost_cents = (
                 SELECT min(ps2.ps_supplycost_cents)
                 FROM partsupp ps2
                 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                 JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
                 JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
                 WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
             ORDER BY acctbal DESC, n_name, s_name, p_partkey""")
  )

  /** TPC-H Q11-shaped important-stock identification: per-part inventory
    * value held by one nation's suppliers, kept when it exceeds 0.1% of
    * that nation's total. Value stays in integer cents·qty end-to-end and
    * the threshold comparison is `value · 1000 > total` — all exact
    * integers, no fraction-of-total double anywhere.
    *
    * Scale shape: the scalar total is a 1-row subquery (computed once,
    * broadcast); nation/supplier broadcast onto partsupp; one hash
    * aggregate on the part key. DuckDB sums BIGINT into HUGEINT, so the
    * output casts to BIGINT in both engines (the r5 type lesson). The
    * nation is picked DATA-DRIVEN (min supplier nationkey — another
    * 1-row scalar) rather than by name: at sf0.001 the fixture has 10
    * suppliers over 25 nations, so any hard-coded nation is empty at
    * some scale factor. */
  val sqlQ11: GraftQuery = GraftQuery(
    "sql_q11",
    (s, dir) => {
      partsuppViews(s, dir)
      s.sql("""SELECT ps_partkey,
                      CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
                        AS value_cents
               FROM v_partsupp
               JOIN v_supplier ON s_suppkey = ps_suppkey
               WHERE s_nationkey = (SELECT min(s_nationkey) FROM v_supplier)
               GROUP BY ps_partkey
               HAVING sum(ps_supplycost_cents * ps_availqty) * 1000 >
                      (SELECT sum(ps_supplycost_cents * ps_availqty)
                       FROM v_partsupp
                       JOIN v_supplier ON s_suppkey = ps_suppkey
                       WHERE s_nationkey = (SELECT min(s_nationkey) FROM v_supplier))
               ORDER BY value_cents DESC, ps_partkey""")
    },
    Some(s"""WITH $psCte
             SELECT ps_partkey,
                    CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
                      AS value_cents
             FROM partsupp
             JOIN supplier ON s_suppkey = ps_suppkey
             WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
             GROUP BY ps_partkey
             HAVING sum(ps_supplycost_cents * ps_availqty) * 1000 >
                    (SELECT sum(ps_supplycost_cents * ps_availqty)
                     FROM partsupp
                     JOIN supplier ON s_suppkey = ps_suppkey
                     WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier))
             ORDER BY value_cents DESC, ps_partkey""")
  )

  /** TPC-H Q16-shaped parts/supplier relationship: distinct suppliers per
    * (brand, type, size) bucket, excluding one brand, one type family, and
    * low-balance suppliers ("customer complaints" adapted to the fixture's
    * columns — acctbal under 1000, which bites at every scale factor).
    *
    * Scale shape: the NOT IN is a tiny build side (Catalyst plans a
    * null-aware anti join; the excluded-supplier set broadcasts); part
    * broadcasts its filter onto partsupp; count(DISTINCT) expands to the
    * standard two-level aggregate on (brand, type, size, suppkey). */
  val sqlQ16: GraftQuery = GraftQuery(
    "sql_q16",
    (s, dir) => {
      partsuppViews(s, dir)
      s.sql("""SELECT p_brand, p_type, p_size,
                      CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
               FROM v_partsupp
               JOIN v_part ON p_partkey = ps_partkey
               WHERE p_brand <> 'Brand#2'
                 AND p_type <> 'PROMO'
                 AND p_size IN (1, 4, 7, 10, 15, 22, 30, 49)
                 AND ps_suppkey NOT IN
                     (SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 1000.0)
               GROUP BY p_brand, p_type, p_size
               ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    },
    Some(s"""WITH $psCte
             SELECT p_brand, p_type, p_size,
                    CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
             FROM partsupp
             JOIN part ON p_partkey = ps_partkey
             WHERE p_brand <> 'Brand#2'
               AND p_type <> 'PROMO'
               AND p_size IN (1, 4, 7, 10, 15, 22, 30, 49)
               AND ps_suppkey NOT IN
                   (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
             GROUP BY p_brand, p_type, p_size
             ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )

  /** TPC-H Q20-shaped excess-stock suppliers: suppliers holding more than
    * half a year's shipped quantity of some red part (no nation filter —
    * the fixture's 25-nation spread over few suppliers would make a
    * single-nation pick empty at small sf; the nation rides along in the
    * output instead). The half-shipment threshold is EXACT: fixture
    * quantities are integer-valued doubles, so 0.5·Σqty has no
    * representation error in either engine; a (part, supplier) pair with
    * no shipments in the window yields a NULL sum, which excludes the row
    * identically in both engines.
    *
    * Scale shape: both nested INs plan as left-semi joins; the correlated
    * quantity sum DECORRELATES into a (partkey, suppkey) aggregate over
    * the date-pruned lineitem scan joined back — the fact table reduces
    * BEFORE touching partsupp, the only order that survives at 100 TB. */
  val sqlQ20: GraftQuery = GraftQuery(
    "sql_q20",
    (s, dir) => {
      partsuppViews(s, dir, "lineitem")
      s.sql("""SELECT s_suppkey, s_name, n_name
               FROM v_supplier
               JOIN v_nation ON n_nationkey = s_nationkey
               WHERE s_suppkey IN (
                 SELECT ps_suppkey FROM v_partsupp
                 WHERE ps_partkey IN
                       (SELECT p_partkey FROM v_part WHERE p_name LIKE 'red%')
                   AND ps_availqty > (
                     SELECT 0.5 * sum(l_quantity) FROM v_lineitem
                     WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                       AND l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate <  TIMESTAMP '1997-01-01'))
               ORDER BY s_suppkey""")
    },
    Some(s"""WITH $psCte
             SELECT s_suppkey, s_name, n_name
             FROM supplier
             JOIN nation ON n_nationkey = s_nationkey
             WHERE s_suppkey IN (
               SELECT ps_suppkey FROM partsupp
               WHERE ps_partkey IN
                     (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
                 AND ps_availqty > (
                   SELECT 0.5 * sum(l_quantity) FROM lineitem
                   WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                     AND l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate <  TIMESTAMP '1997-01-01'))
             ORDER BY s_suppkey""")
  )

  /** TPC-H Q1-shaped pricing summary — the canonical scan-and-aggregate:
    * one date predicate, a 6-group hash aggregate, nine aggregate
    * columns. The purest map-side-combine test in the suite: partial
    * aggregation reduces every scan partition to ≤6 rows before the one
    * tiny exchange, so the query's cost is exactly the column-pruned
    * scan at any scale.
    *
    * Determinism: sums in exact DECIMAL/BIGINT; every average is the
    * SURVEY trap-note pattern — scaled-integer sum, integer `div` by
    * the count, truncate at the final projection — because a
    * round(double-mean) of 2-decimal money values sits ON the .5
    * boundary by construction (the means of 2dp values are
    * boundary-structured rationals). No round(double) appears. */
  val sqlQ1: GraftQuery = GraftQuery(
    "sql_q1",
    (s, dir) => {
      graft.sources.Tables.table(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
                      sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                        AS sum_base_price,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                        AS sum_disc_price,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                     * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                        AS sum_charge,
                      CAST((sum(CAST(l_quantity AS BIGINT)) * 10000) div count(*) AS DOUBLE)
                        / 10000.0 AS avg_qty,
                      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT))
                             div count(*) AS DOUBLE) / 10000.0 AS avg_price,
                      CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
                             div count(*) AS DOUBLE) / 10000.0 AS avg_disc,
                      count(*) AS count_order
               FROM v_lineitem
               WHERE l_shipdate <= TIMESTAMP '2000-12-01'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                     AS sum_base_price,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                     AS sum_disc_price,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                  * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                     AS sum_charge,
                   CAST((sum(CAST(l_quantity AS BIGINT)) * 10000) // count(*) AS DOUBLE)
                     / 10000.0 AS avg_qty,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT))
                          // count(*) AS DOUBLE) / 10000.0 AS avg_price,
                   CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
                          // count(*) AS DOUBLE) / 10000.0 AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""")
  )

  /** TPC-H Q4-shaped order-priority check (fixture has no
    * commit/receipt dates, so "late" = a lineitem shipped more than 60
    * days after the order date): count a quarter's orders per priority
    * where at least one line shipped late.
    *
    * Scale shape: the correlated EXISTS carries a NON-equi predicate
    * referencing the outer row (l_shipdate > o_orderdate + 60 days) on
    * top of the orderkey equality — Catalyst plans a left-SEMI join on
    * the key with the date comparison as a residual condition, never a
    * per-order probe; the quarter filter prunes the orders scan before
    * the join, so the semi join's build is one quarter of one table. */
  val sqlQ4: GraftQuery = GraftQuery(
    "sql_q4",
    (s, dir) => {
      for (t <- Seq("orders", "lineitem"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT o_orderpriority, count(*) AS order_count
               FROM v_orders
               WHERE o_orderdate >= TIMESTAMP '1996-07-01'
                 AND o_orderdate <  TIMESTAMP '1996-10-01'
                 AND EXISTS (SELECT 1 FROM v_lineitem
                             WHERE l_orderkey = o_orderkey
                               AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
               GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority""")
  )

  /** TPC-H Q8-shaped national market share: of all STANDARD-part revenue
    * sold to ASIA customers, the fraction supplied by NATION_3, per
    * order year. The widest join tree in the suite — lineitem against
    * five dimensions plus orders — and every dimension side broadcasts;
    * the fact table shuffles exactly once (for the orders join) and the
    * share is computed inside ONE aggregate over the joined scan (the
    * CASE-sum / sum pattern), never as two passes.
    *
    * Determinism: both sums in exact DECIMAL; the share is ONE IEEE
    * double division of the two (the q14 rule: decimal-division scale
    * rules differ across engines; one double division does not). */
  val sqlQ8: GraftQuery = GraftQuery(
    "sql_q8",
    (s, dir) => {
      for (t <- Seq("lineitem", "orders", "customer", "nation", "region", "supplier", "part"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      (round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                            / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                       * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                            4) + 0.0) AS mkt_share,
                      CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                        AS total_revenue
               FROM v_lineitem
               JOIN v_orders    ON o_orderkey = l_orderkey
               JOIN v_customer  ON c_custkey = o_custkey
               JOIN v_nation n1 ON n1.n_nationkey = c_nationkey
               JOIN v_region    ON r_regionkey = n1.n_regionkey
               JOIN v_supplier  ON s_suppkey = l_suppkey
               JOIN v_nation n2 ON n2.n_nationkey = s_nationkey
               JOIN v_part      ON p_partkey = l_partkey
               WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
               GROUP BY o_year
               ORDER BY o_year""")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   (round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                                THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                         4) + 0.0) AS mkt_share,
                   CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                     AS total_revenue
            FROM lineitem
            JOIN orders    ON o_orderkey = l_orderkey
            JOIN customer  ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region    ON r_regionkey = n1.n_regionkey
            JOIN supplier  ON s_suppkey = l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            JOIN part      ON p_partkey = l_partkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
            GROUP BY o_year
            ORDER BY o_year""")
  )

  /** TPC-H Q9-shaped product-type profit, adapted to the DERIVED
    * partsupp: the fixture's lineitem supplier keys are independent of
    * the derived (part, supplier) pairs, so the per-line cost is the
    * part's MINIMUM supply cost (join on the part key alone) rather
    * than the pair's — same plan skeleton (fact scan ⋈ part filter ⋈
    * per-part cost aggregate ⋈ supplier→nation ⋈ orders, profit
    * aggregated by nation × order year), deterministic at every sf.
    *
    * Determinism: profit is computed END-TO-END in scaled integers —
    * revenue at 1e-6 units (the 6dp DECIMAL product ×1e6 is exactly
    * integral), cost as cents·qty·1e4 in the same units, ONE BIGINT
    * sum of the difference, one final /1e6 double projection. No
    * decimal division (engine scale rules differ), no round(double)
    * (boundary-structured), no truncation mismatch (Spark CASTs
    * decimal→long by truncation, DuckDB by rounding — only exactly
    * integral decimals cast identically, which 1e6-scaling guarantees).
    *
    * Scale shape: mincost is an O(|part|) aggregate that joins the fact
    * on the part key (broadcast at fixture scale, shuffle-hash at 100
    * TB); part's LIKE filter prunes the fact rows through the join
    * before orders attaches. */
  val sqlQ9: GraftQuery = GraftQuery(
    "sql_q9",
    (s, dir) => {
      partsuppViews(s, dir, "lineitem", "orders")
      s.sql("""WITH mincost AS (
                 SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost_cents
                 FROM v_partsupp GROUP BY ps_partkey)
               SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      CAST(CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                                               * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                               AS DECIMAL(25,6)) * 1000000 AS BIGINT)
                                    - min_cost_cents * CAST(l_quantity AS BIGINT) * 10000)
                                AS DOUBLE) / 1000000.0 AS DOUBLE) AS profit
               FROM v_lineitem
               JOIN v_part     ON p_partkey = l_partkey
               JOIN mincost    ON ps_partkey = l_partkey
               JOIN v_supplier ON s_suppkey = l_suppkey
               JOIN v_nation   ON n_nationkey = s_nationkey
               JOIN v_orders   ON o_orderkey = l_orderkey
               WHERE p_name LIKE 'red%'
               GROUP BY n_name, o_year
               ORDER BY nation, o_year""")
    },
    Some(s"""WITH $psCte,
             mincost AS (
               SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost_cents
               FROM partsupp GROUP BY ps_partkey)
             SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                    CAST(CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                                             * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                             AS DECIMAL(25,6)) * 1000000 AS BIGINT)
                                  - min_cost_cents * CAST(l_quantity AS BIGINT) * 10000)
                              AS DOUBLE) / 1000000.0 AS DOUBLE) AS profit
             FROM lineitem
             JOIN part     ON p_partkey = l_partkey
             JOIN mincost  ON ps_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation   ON n_nationkey = s_nationkey
             JOIN orders   ON o_orderkey = l_orderkey
             WHERE p_name LIKE 'red%'
             GROUP BY n_name, o_year
             ORDER BY nation, o_year""")
  )

  /** TPC-H Q17-shaped small-quantity-order revenue: weekly-equivalent
    * revenue lost if small orders (under 20% of the part's average
    * quantity) of one brand's SMALL parts were no longer filled.
    *
    * Scale shape: the correlated per-part average DECORRELATES into an
    * O(|part|) aggregate over lineitem joined back on the part key —
    * the famous Q17 rewrite, and the reason this query exists in the
    * suite: a per-row re-execution would be O(|lineitem|²).
    *
    * Determinism: quantities are integer-valued, so the per-part
    * double sum inside avg() is EXACT at any partition order (integer
    * partial sums below 2^53 — the one case the SURVEY window-sum trap
    * note exempts), and `0.2 * avg` is then the same two IEEE ops in
    * both engines on identical exact inputs. */
  val sqlQ17: GraftQuery = GraftQuery(
    "sql_q17",
    (s, dir) => {
      for (t <- Seq("lineitem", "part"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT CAST((round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                                 / 7.0, 2) + 0.0) AS DOUBLE) AS avg_yearly,
                      count(*) AS n_lines
               FROM v_lineitem l
               JOIN v_part ON p_partkey = l_partkey
               WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
                 AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                                   FROM v_lineitem l2
                                   WHERE l2.l_partkey = l.l_partkey)""")
    },
    Some("""SELECT CAST((round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                              / 7.0, 2) + 0.0) AS DOUBLE) AS avg_yearly,
                   count(*) AS n_lines
            FROM lineitem l
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
              AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)""")
  )

  /** TPC-H Q19-shaped discounted revenue under DISJUNCTIVE predicates:
    * three (brand, size-range, quantity-range) OR-arms over the
    * part⋈lineitem join. The OR-pushdown test: Catalyst must push the
    * arms' common structure to BOTH scans (brand/size arms prune part,
    * quantity bounds prune lineitem) instead of evaluating the whole
    * disjunction post-join — at 100 TB the difference is scanning two
    * pruned tables vs materializing the full join. */
  val sqlQ19: GraftQuery = GraftQuery(
    "sql_q19",
    (s, dir) => {
      for (t <- Seq("lineitem", "part"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                        AS revenue,
                      count(*) AS n_lines
               FROM v_lineitem
               JOIN v_part ON p_partkey = l_partkey
               WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                      AND l_quantity BETWEEN 1 AND 11)
                  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                      AND l_quantity BETWEEN 10 AND 20)
                  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                      AND l_quantity BETWEEN 20 AND 30)""")
    },
    Some("""SELECT CAST((round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                                  * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) + 0.0) AS DOUBLE)
                     AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                   AND l_quantity BETWEEN 20 AND 30)""")
  )

  /** TPC-H Q21-shaped waiting-supplier query (no commit/receipt dates
    * in the fixture: "kept the order waiting" = shipped >30 days after
    * the order date AND strictly last among the order's suppliers):
    * per supplier, how many finished multi-supplier orders it alone
    * delayed. The suite's heaviest correlated shape — one EXISTS and
    * one NOT EXISTS against the same fact table, both correlated on
    * the order key with supplier-inequality residuals.
    *
    * Scale shape: Catalyst plans the pair as a left-SEMI then a
    * left-ANTI join, both keyed on l_orderkey (shuffle-hash, fact vs
    * fact) with the non-equi parts as residual conditions — never a
    * per-row subquery. The strict `>` on shipdate makes ties (two
    * suppliers sharing the max date) drop BOTH rows identically in
    * both engines — no boundary sensitivity. */
  val sqlQ21: GraftQuery = GraftQuery(
    "sql_q21",
    (s, dir) => {
      for (t <- Seq("supplier", "lineitem", "orders"))
        graft.sources.Tables.table(s, dir, t).createOrReplaceTempView(s"v_$t")
      s.sql("""SELECT s_name, count(*) AS numwait
               FROM v_supplier
               JOIN v_lineitem l1 ON l1.l_suppkey = s_suppkey
               JOIN v_orders ON o_orderkey = l1.l_orderkey
               WHERE o_orderstatus = 'F'
                 AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
                 AND EXISTS (SELECT 1 FROM v_lineitem l2
                             WHERE l2.l_orderkey = l1.l_orderkey
                               AND l2.l_suppkey <> l1.l_suppkey)
                 AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
                                 WHERE l3.l_orderkey = l1.l_orderkey
                                   AND l3.l_suppkey <> l1.l_suppkey
                                   AND l3.l_shipdate > l1.l_shipdate)
               GROUP BY s_name
               ORDER BY numwait DESC, s_name""")
    },
    Some("""SELECT s_name, count(*) AS numwait
            FROM supplier
            JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > l1.l_shipdate)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name""")
  )

  /** Deterministic hash sampling — the reproducible-subset primitive
    * every iteration loop at 100 TB starts from ("develop the pipeline
    * on the same 1.5% every time, on any cluster, in any engine").
    * `TABLESAMPLE`/`rand()` are non-reproducible across engines, runs
    * and partitionings; hashing the PRIMARY KEY and comparing the hex
    * prefix is the standard portable answer (the hash is the sampling
    * decision, so membership is a pure row property — stable under
    * repartition, retry, and engine swap).
    *
    * md5 emits lowercase hex in BOTH engines, so `md5(key) < '04'`
    * keeps ~4/256 = 1.5625% with one string compare — no hex→int
    * conversion (whose width/sign rules differ across engines). The
    * sample then aggregates per return flag next to the full-table
    * counts, which is how a sampling pipeline validates its rate.
    *
    * Scale shape: the predicate is a scan-level filter on a computed
    * column (row-local, no shuffle); the aggregate is the q1 shape. */
  val sampleHash: GraftQuery = GraftQuery(
    "scan_sample_hash",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .withColumn("k",
          md5(concat($"l_orderkey".cast("string"), lit("-"),
            $"l_linenumber".cast("string"))))
        .filter($"k" < "04")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_sampled"),
          sum($"l_quantity").as("sum_qty"),
          expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))")
            .as("sum_price_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_sampled,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem
            WHERE md5(CAST(l_orderkey AS VARCHAR) || '-'
                      || CAST(l_linenumber AS VARCHAR)) < '04'
            GROUP BY 1 ORDER BY 1""")
  )

  def all: Seq[GraftQuery] = Seq(
    scanProject, scanFilterPushdown, filterPred, projectCompute,
    sortLimit, setUnion, setIntersect, setExcept, sqlStarQ5, sqlQ3, sqlQ18,
    sqlQ6, sqlQ7, sqlQ10, sqlQ12, sqlQ13, sqlQ14, sqlQ15, sqlQ22,
    sqlQ1, sqlQ2, sqlQ4, sqlQ8, sqlQ9, sqlQ11, sqlQ16, sqlQ17, sqlQ19,
    sqlQ20, sqlQ21,
    sqlSubquery, cleanNa, columnStats, sampleHash)
}
