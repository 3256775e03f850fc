package graft.operators

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Aggregation operators (SURVEY.md §2b "Aggregations").
  *
  * All of these compile to partial (map-side) + final hash aggregates in
  * Spark — at 100 TB the map-side combine keeps shuffle volume proportional
  * to group cardinality, not input rows. Group-by keys here are low-cardinality
  * (flags, dates, keys) so the shuffled state is tiny regardless of input size.
  */
object Aggregates {

  /** TPC-H Q1 shape: the flagship scan→filter→hash-aggregate pipeline.
    * Filter is pushed to the parquet scan; aggregation is map-side combined.
    */
  val q1Agg: GraftQuery = GraftQuery(
    "agg_hash_group",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                            AS sum_qty,
             round(sum(l_extendedprice), 2)                       AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2)  AS sum_disc_price,
             round(avg(l_quantity), 4)                            AS avg_qty,
             round(avg(l_discount), 6)                            AS avg_disc,
             count(*)                                             AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim)
  )

  def all: Seq[GraftQuery] = Seq(q1Agg)
}
