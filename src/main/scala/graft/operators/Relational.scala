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

  def all: Seq[GraftQuery] = Seq(
    scanProject, scanFilterPushdown, filterPred, projectCompute,
    sortLimit, setUnion, setIntersect, setExcept)
}
