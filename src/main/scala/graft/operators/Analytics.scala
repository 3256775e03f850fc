package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Second-tier analytics operators: statistical aggregates, exact
  * percentiles, ordered string aggregation, pivot, structured JSON parsing.
  * All single-shuffle hash/sort aggregates — the 100 TB story is the same
  * as Aggregates.scala (map-side partials, group-cardinality-bound state).
  */
object Analytics {

  /** Statistical moments + correlation. Welford-style distributed variance
    * (Spark's CentralMomentAgg) vs DuckDB's — numerically different
    * accumulation orders, so results are rounded at 6dp. */
  val statsAgg: GraftQuery = GraftQuery(
    "agg_stats",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(corr($"l_extendedprice", $"l_quantity"), 6).as("corr_pq"),
          round(covar_samp($"l_extendedprice", $"l_discount"), 4).as("cov_pd"),
          // Spark's skewness is the population estimator g1; DuckDB reports
          // the bias-corrected sample estimator G1 = g1·√(n(n-1))/(n-2).
          round(skewness($"l_quantity") *
            sqrt(count(lit(1)) * (count(lit(1)) - 1)) / (count(lit(1)) - 2), 6)
            .as("skew_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   (round(stddev_samp(l_extendedprice), 4) + 0.0) AS sd_price,
                   (round(var_samp(l_quantity), 4) + 0.0) AS var_qty,
                   (round(corr(l_extendedprice, l_quantity), 6) + 0.0) AS corr_pq,
                   (round(covar_samp(l_extendedprice, l_discount), 4) + 0.0) AS cov_pd,
                   (round(skewness(l_quantity), 6) + 0.0) AS skew_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Exact percentiles (interpolated, SQL PERCENTILE_CONT semantics).
    * Exact percentile needs the sorted group — fine for bounded groups;
    * at 100 TB unbounded cardinality, switch to approx_percentile (fixed
    * sketch, single pass) — exposed rows-only below. */
  val percentiles: GraftQuery = GraftQuery(
    "agg_percentile",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 4).as("p50"),
          round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"), 4).as("p90"),
          round(expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice)"), 4).as("p99"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
                   (round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) + 0.0) AS p50,
                   (round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) + 0.0) AS p90,
                   (round(percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice), 4) + 0.0) AS p99
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Sketch percentile — the unbounded-cardinality path.
    *
    * Oracle via envelope-as-data (the approxDistinct device): the sketch
    * value itself can never hash-match a foreign engine, so the GRADED
    * columns are the exact group count and `p50_ok` — the approximate
    * median lies within the exact [p45, p55] interpolated band, i.e. rank
    * error ≤ 5% (50× the accuracy parameter's n/1000 guarantee, and both
    * band ends are computed IN SPARK so no interpolation arithmetic ever
    * crosses engines). The oracle pins the envelope as literal TRUE — a
    * sketch regression past the band is a hash failure. The exact band is
    * the audit harness; production keeps only the sketch side. */
  val approxPercentile: GraftQuery = GraftQuery(
    "agg_approx_percentile",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          approx_percentile($"o_totalprice", lit(0.5), lit(1000)).as("p50_approx"),
          expr("percentile_cont(0.45) WITHIN GROUP (ORDER BY o_totalprice)").as("lo"),
          expr("percentile_cont(0.55) WITHIN GROUP (ORDER BY o_totalprice)").as("hi"),
          count(lit(1)).as("n"))
        .select($"o_orderstatus", $"n",
          ($"p50_approx" >= $"lo" && $"p50_approx" <= $"hi").as("p50_ok"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n, TRUE AS p50_ok
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Ordered string aggregation (LISTAGG shape): deterministic via
    * sort_array over the collected set. */
  val stringAgg: GraftQuery = GraftQuery(
    "agg_string",
    (s, dir) => {
      import s.implicits._
      Tables.nation(s, dir)
        .groupBy($"n_regionkey")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"))
        .orderBy($"n_regionkey")
    },
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
  )

  /** Pivot: order counts per (year, status) as wide columns. */
  val pivotAgg: GraftQuery = GraftQuery(
    "agg_pivot",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select(year($"o_orderdate").as("o_year"), $"o_orderstatus")
        .groupBy($"o_year")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy($"o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS P
            FROM orders GROUP BY o_year ORDER BY o_year""")
  )

  /** Schema-on-read JSON parsing into a typed struct (from_json — the
    * full-document form of fn_json's path extraction). */
  val jsonStruct: GraftQuery = GraftQuery(
    "fn_json_struct",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id",
          from_json($"props", org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).as("p"))
        .select($"event_id", $"p.k".as("k"))
        .filter($"k".isNotNull && $"k" % 7 === 0)
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS INT) % 7 = 0
            ORDER BY event_id""")
  )

  /** TPC-H Q3-shaped composite: the shipping-priority top-N — a
    * three-table selective join, revenue aggregate, global sort, limit.
    * The canonical OLAP plan shape end-to-end: both filters push into
    * their scans before the join (BUILDING customers ≈ 1/5, orders before
    * the date ≈ half), customer is broadcast, and the final top-10 plans
    * as TakeOrderedAndProject — per-partition heaps, no global sort
    * materialization. */
  val topNRevenue: GraftQuery = GraftQuery(
    "agg_topn_revenue",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1998-06-30").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
                   (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-30'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10""")
  )

  /** Full pairwise Pearson correlation matrix over the fact table's
    * numeric measures — the EDA/feature-selection primitive. All six
    * pairwise corrs compute in ONE hash aggregate (one scan, six
    * DeclarativeAggregate buffers with map-side partials — the
    * single-pass property is the whole point at 100 TB: a naive
    * per-pair loop scans the fact table C(k,2) times); the pivot to
    * (col_a, col_b, corr_v) rows is a 1-row explode, presentation only.
    * Rounded at 6dp like agg_stats (Welford accumulation-order
    * differences between engines live far below that). */
  val corrMatrix: GraftQuery = GraftQuery(
    "agg_corr_matrix",
    (s, dir) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      Tables.lineitem(s, dir)
        .agg(pairs.head match { case (a, b) =>
            round(corr(col(a), col(b)), 6).as(s"${a}__$b") },
          pairs.tail.map { case (a, b) =>
            round(corr(col(a), col(b)), 6).as(s"${a}__$b") }: _*)
        .select(explode(array(pairs.map { case (a, b) =>
            struct(lit(a).as("col_a"), lit(b).as("col_b"),
              col(s"${a}__$b").as("corr_v")) }: _*)).as("p"))
        .select($"p.col_a".as("col_a"), $"p.col_b".as("col_b"),
          $"p.corr_v".as("corr_v"))
        .orderBy($"col_a", $"col_b")
    },
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      val aggCols = pairs.map { case (a, b) =>
        s"(round(corr($a, $b), 6) + 0.0) AS ${a}__$b" }.mkString(", ")
      val arms = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, ${a}__$b AS corr_v FROM m"
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (SELECT $aggCols FROM lineitem)
          $arms
          ORDER BY col_a, col_b"""
    }
  )

  /** Two-sample Kolmogorov–Smirnov drift test between the `view` and
    * `purchase` value distributions — the distribution-shift check a
    * training pipeline runs between data cohorts (yesterday vs today,
    * source A vs source B) before concluding a feature drifted. The
    * statistic D = max |F̂₁(v) − F̂₂(v)| over the pooled support.
    *
    * Determinism — EXACT RATIONAL: with integer per-value counts,
    * D = max |cum₁(v)·n₂ − cum₂(v)·n₁| / (n₁·n₂) — BIGINT numerator and
    * denominator, one final division of identical integers (the KN
    * convention; no round() anywhere). Values compare as exact cents.
    *
    * Scale shape: per-value counts are ONE hash aggregate whose state is
    * bounded by the value DOMAIN (cents of a price-like column — ~56k
    * distinct at any corpus size), not the event count; the cumulative
    * pass is a window over those domain-sized rows (a single-partition
    * sort of a bounded set — the same shape every ECDF implementation
    * uses), and the max is a 1-row fold. 100 TB of events reduce to the
    * domain before anything global happens. */
  val ksTest: GraftQuery = GraftQuery(
    "agg_ks_test",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"),
          $"event_type")
        .groupBy($"cv")
        .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c1"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
      val w = Window.orderBy($"cv")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = counts
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("cum2", sum($"c2").over(w))
        .localCheckpoint() // totals + deviation fold both read it
      val tot = cum.agg(max($"cum1").as("n1"), max($"cum2").as("n2"))
      cum.crossJoin(broadcast(tot))
        .agg(first($"n1").as("n1"), first($"n2").as("n2"),
          max(abs($"cum1" * $"n2" - $"cum2" * $"n1")).as("d_num"))
        .select($"n1", $"n2", $"d_num",
          ($"n1" * $"n2").as("d_den"),
          ($"d_num".cast("double") / ($"n1" * $"n2").cast("double")).as("d"))
    },
    Some("""WITH c AS (
              SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
              FROM events
              WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            cum AS (
              SELECT cv,
                     sum(c1) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum1,
                     sum(c2) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum2
              FROM c),
            tot AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM cum)
            SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
                   CAST(n1 * n2 AS BIGINT) AS d_den,
                   CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                     / CAST(n1 * n2 AS DOUBLE) AS d
            FROM cum CROSS JOIN tot
            GROUP BY n1, n2""")
  )

  /** Mann–Whitney U rank-sum test between the same two cohorts as
    * `agg_ks_test` — KS asks "is the distribution different anywhere?",
    * U asks "does one cohort stochastically dominate?" (the A/B-test
    * question). Ties get midranks.
    *
    * Determinism — EXACT INTEGERS throughout: a tie span [lo, hi] has
    * midrank (lo+hi)/2, so DOUBLED midranks are the integer lo+hi; the
    * doubled rank sum 2R₁ = Σ c₁(v)·(lo+hi) and the doubled statistics
    * 2U₁ = 2n₁n₂ + n₁(n₁+1) − 2R₁, 2U₂ likewise, are all BIGINT, and
    * the spec checks the closed identity 2U₁ + 2U₂ = 2n₁n₂. The
    * normal-approximation z (with the standard tie correction
    * Σ(t³−t)) is one sqrt over exact-integer inputs — identical
    * doubles in both engines, emitted raw (no round()).
    *
    * Scale shape: identical to agg_ks_test — per-value counts bounded by
    * the cents domain, one window pass over domain-sized rows, 1-row
    * fold. */
  val mannWhitney: GraftQuery = GraftQuery(
    "agg_mannwhitney",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"),
          $"event_type")
        .groupBy($"cv")
        .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c1"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
        .withColumn("t", $"c1" + $"c2")
      val w = Window.orderBy($"cv").rowsBetween(Window.unboundedPreceding, 0)
      val ranked = counts
        .withColumn("hi", sum($"t").over(w))            // cumulative pooled count
        .withColumn("lo", $"hi" - $"t" + 1)             // tie span start
        .localCheckpoint()
      ranked
        .agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          sum($"c1" * ($"lo" + $"hi")).as("r1_x2"),
          sum($"t" * $"t" * $"t" - $"t").as("tie_t3"))
        .select($"n1", $"n2",
          (lit(2L) * $"n1" * $"n2" + $"n1" * ($"n1" + 1L) - $"r1_x2").as("u1_x2"),
          (lit(2L) * $"n1" * $"n2" + $"n2" * ($"n2" + 1L)
            - (($"n1" + $"n2") * ($"n1" + $"n2" + 1L) - $"r1_x2")).as("u2_x2"),
          $"tie_t3",
          // z = (U1 - n1 n2 / 2) / sqrt(n1 n2 / 12 · ((N+1) - Σ(t³-t)/(N(N-1))))
          ((($"u1_x2".cast("double") / 2.0) - ($"n1" * $"n2").cast("double") / 2.0)
            / sqrt(($"n1" * $"n2").cast("double") / 12.0
              * (($"n1" + $"n2" + 1L).cast("double")
                - $"tie_t3".cast("double")
                  / (($"n1" + $"n2").cast("double")
                    * ($"n1" + $"n2" - 1L).cast("double"))))).as("z"))
    },
    Some("""WITH c AS (
              SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
              FROM events
              WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            r AS (
              SELECT cv, c1, c2, c1 + c2 AS t,
                     sum(c1 + c2) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS hi,
                     sum(c1 + c2) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) - (c1 + c2) + 1 AS lo
              FROM c),
            a AS (
              SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
                     CAST(sum(c1 * (lo + hi)) AS BIGINT) AS r1_x2,
                     CAST(sum(t * t * t - t) AS BIGINT) AS tie_t3
              FROM r)
            SELECT n1, n2,
                   CAST(2 * n1 * n2 + n1 * (n1 + 1) - r1_x2 AS BIGINT) AS u1_x2,
                   CAST(2 * n1 * n2 + n2 * (n2 + 1)
                        - ((n1 + n2) * (n1 + n2 + 1) - r1_x2) AS BIGINT) AS u2_x2,
                   tie_t3,
                   ((CAST(u1_x2_i AS DOUBLE) / 2.0) - CAST(n1 * n2 AS DOUBLE) / 2.0)
                     / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                            * (CAST(n1 + n2 + 1 AS DOUBLE)
                               - CAST(tie_t3 AS DOUBLE)
                                 / (CAST(n1 + n2 AS DOUBLE)
                                    * CAST(n1 + n2 - 1 AS DOUBLE)))) AS z
            FROM (SELECT *, 2 * n1 * n2 + n1 * (n1 + 1) - r1_x2 AS u1_x2_i FROM a)""")
  )

  /** Chi-squared independence test on the event_type × day-of-week
    * contingency table — "does activity MIX depend on the weekday?", the
    * categorical member of the cohort-statistics family (KS:
    * distribution, U: dominance, MK/Theil–Sen: trend, χ²: independence).
    *
    * Determinism — exact rationals + INTEGERIZED summation: each cell's
    * term is (o·N − r·c)²/(N·r·c) with BIGINT numerator and denominator,
    * so the per-cell doubles are identical in both engines; the SUM is
    * over Σ floor(term·1e12) in BIGINT (the llm_embed_quantize SSE
    * pattern — bias ≤ cells·1e-12, stated in the column name), because
    * even an ORDERED window cumsum of doubles diverges: DuckDB computes
    * windowed double sums through a segment tree (pairwise association;
    * SURVEY trap note a), which a first draft of this query re-proved
    * at the last ulp. Integer sums are associativity-immune.
    *
    * Scale shape: one hash aggregate onto the bounded cell domain
    * (map-side partials reduce every partition to ≤ cells rows), row and
    * column totals broadcast back, and the ordered fold runs on the
    * domain — 100 TB of events never reaches anything global. */
  val chiSq: GraftQuery = GraftQuery(
    "agg_chisq",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cells = Tables.events(s, dir)
        .groupBy($"event_type", dayofweek($"ts").as("dow"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // totals + fold both read it
      val rowT = cells.groupBy($"event_type").agg(sum($"o").as("r"))
      val colT = cells.groupBy($"dow").agg(sum($"o").as("c"))
      val nTot = cells.agg(sum($"o").as("n"),
        count(lit(1)).as("n_cells"),
        countDistinct($"event_type").as("n_rows"),
        countDistinct($"dow").as("n_cols"))
      cells
        .join(broadcast(rowT), "event_type")
        .join(broadcast(colT), "dow")
        .crossJoin(broadcast(nTot))
        .withColumn("dev", $"o" * $"n" - $"r" * $"c")
        .withColumn("term",
          ($"dev" * $"dev").cast("double")
            / ($"n" * $"r" * $"c").cast("double"))
        .groupBy($"n_cells", (($"n_rows" - 1) * ($"n_cols" - 1)).as("dof"))
        .agg(sum(floor($"term" * 1e12).cast("long")).as("chi2_e12"))
        .select($"n_cells", $"dof", $"chi2_e12",
          ($"chi2_e12".cast("double") / 1e12).as("chi2"))
    },
    Some("""WITH cells AS (
              SELECT event_type, dayofweek(ts) + 1 AS dow,
                     CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
            ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
            nt AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS n_cells,
                          count(DISTINCT event_type) AS n_rows,
                          count(DISTINCT dow) AS n_cols
                   FROM cells),
            terms AS (
              SELECT nt.n_cells, nt.n_rows, nt.n_cols,
                     CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
                       / CAST(n * r * c AS DOUBLE) AS term
              FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nt)
            SELECT n_cells, (n_rows - 1) * (n_cols - 1) AS dof,
                   CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS BIGINT) AS chi2_e12,
                   CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS chi2
            FROM terms GROUP BY n_cells, n_rows, n_cols""")
  )

  /** Gini coefficient of order value per order status — the
    * concentration measure ("do a few giant orders carry the book?")
    * a revenue or data-mixture owner reads next to the percentiles;
    * for a training corpus the same statistic over per-source token
    * counts is the mixture-skew gauge.
    *
    * Determinism — EXACT RATIONAL: with ascending ranks i over integer
    * cents, G = (2·Σ i·cᵢ − (n+1)·Σc) / (n·Σc) — BIGINT num/den, one
    * division of identical integers (ties are rank-order-invariant:
    * permuting equal values leaves Σ i·cᵢ unchanged, so the arbitrary
    * tie order inside row_number cannot move the statistic). Σ i·c
    * peaks ~6e16 at sf0.1 — inside BIGINT; at 100× shift the
    * accumulator to DECIMAL(38,0).
    *
    * Scale shape: one window rank per group + one hash aggregate — the
    * agg_percentile cost model (per-group sort; for unbounded groups the
    * production path is the binned Lorenz approximation, same shape as
    * approx_percentile). */
  val gini: GraftQuery = GraftQuery(
    "agg_gini",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"c", $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_orderstatus", $"o_orderkey",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sum($"c").as("sum_c"),
          sum($"i" * $"c").as("sum_ic"))
        .select($"o_orderstatus", $"n",
          (lit(2L) * $"sum_ic" - ($"n" + 1L) * $"sum_c").as("gini_num"),
          ($"n" * $"sum_c").as("gini_den"),
          ((lit(2L) * $"sum_ic" - ($"n" + 1L) * $"sum_c").cast("double")
            / ($"n" * $"sum_c").cast("double")).as("gini"))
        .orderBy($"o_orderstatus")
    },
    Some("""WITH r AS (
              SELECT o_orderstatus,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY o_orderstatus
                                        ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                                      * 100 AS BIGINT),
                                                 o_orderkey) AS i
              FROM orders),
            a AS (
              SELECT o_orderstatus, count(*) AS n,
                     CAST(sum(c) AS BIGINT) AS sum_c,
                     CAST(sum(i * c) AS BIGINT) AS sum_ic
              FROM r GROUP BY 1)
            SELECT o_orderstatus, n,
                   CAST(2 * sum_ic - (n + 1) * sum_c AS BIGINT) AS gini_num,
                   CAST(n * sum_c AS BIGINT) AS gini_den,
                   CAST(2 * sum_ic - (n + 1) * sum_c AS DOUBLE)
                     / CAST(n * sum_c AS DOUBLE) AS gini
            FROM a ORDER BY o_orderstatus""")
  )

  /** Welch's unequal-variance t-test between the same two cohorts as
    * `agg_ks_test`/`agg_mannwhitney` — the parametric member of the
    * cohort family ("is the MEAN value different?", the default metric
    * test on any experiment dashboard; Welch because nobody gets to
    * assume equal variances in production data).
    *
    * Determinism — the mannwhitney-z pattern: every input to the final
    * doubles is an EXACT BIGINT. Sufficient statistics per cohort are
    * n, S = Σ cents, Q = Σ cents² (one conditional hash aggregate);
    * the mean difference is the rational (S₁n₂ − S₂n₁)/(n₁n₂) and each
    * per-cohort s²/n is the rational (nQ − S²)/(n²(n−1)) — both emitted
    * as BIGINT num/den, so t = md/√(a+b) and the Welch–Satterthwaite
    * df = (a+b)²/(a²/(n₁−1) + b²/(n₂−1)) are scalar expression trees
    * over identical doubles in both engines (no double SUM anywhere —
    * trap note a only bites accumulation, not folds of identical
    * scalars). nQ peaks ~2e16 at sf0.1 — inside BIGINT; at 100× shift
    * the Q accumulator to DECIMAL(38,0) (the agg_gini note). The
    * headroom is ENFORCED, not just documented: the emitted t rides
    * GraftQuery.guarded on (n₁+n₂)²·max|c|² < 9e18, so past the bound
    * the query raises instead of silently wrapping.
    *
    * Scale shape: ONE map-side-combined hash aggregate over the fact
    * scan produces six BIGINTs; everything after is a 1-row projection.
    * This is the cheapest member of the family — no window, no domain
    * table, no join. */
  val ttestWelch: GraftQuery = GraftQuery(
    "agg_ttest_welch",
    (s, dir) => {
      import s.implicits._
      val cv = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val a = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select($"event_type", cv.as("cv"))
        .agg(
          sum(when($"event_type" === "view", 1L).otherwise(0L)).as("n1"),
          sum(when($"event_type" === "view", $"cv").otherwise(0L)).as("s1"),
          sum(when($"event_type" === "view", $"cv" * $"cv").otherwise(0L)).as("q1"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n2"),
          sum(when($"event_type" === "purchase", $"cv").otherwise(0L)).as("s2"),
          sum(when($"event_type" === "purchase", $"cv" * $"cv").otherwise(0L)).as("q2"),
          max(abs($"cv")).as("mc"))
        .withColumn("md_num", $"s1" * $"n2" - $"s2" * $"n1")
        .withColumn("v1_num", $"n1" * $"q1" - $"s1" * $"s1")
        .withColumn("v2_num", $"n2" * $"q2" - $"s2" * $"s2")
        .withColumn("va", $"v1_num".cast("double")
          / ($"n1" * $"n1" * ($"n1" - 1L)).cast("double"))
        .withColumn("vb", $"v2_num".cast("double")
          / ($"n2" * $"n2" * ($"n2" - 1L)).cast("double"))
      // Largest exact intermediate is n·Q ≤ (n₁+n₂)²·max|c|²: guard it
      // (in DOUBLE, so the check itself can't wrap) before emitting.
      val safe = pow(($"n1" + $"n2").cast("double"), 2.0) *
        pow($"mc".cast("double"), 2.0) < 9.0e18
      a.select($"n1", $"n2", $"md_num", $"v1_num", $"v2_num",
        GraftQuery.guarded(
          $"md_num".cast("double") / ($"n1" * $"n2").cast("double")
            / sqrt($"va" + $"vb"),
          safe,
          "agg_ttest_welch: BIGINT sufficient statistics near overflow — " +
            "shift the Q accumulator to DECIMAL(38,0)").as("t"),
        (($"va" + $"vb") * ($"va" + $"vb")
          / ($"va" * $"va" / ($"n1" - 1L).cast("double")
            + $"vb" * $"vb" / ($"n2" - 1L).cast("double"))).as("df"))
    },
    Some("""WITH a AS (
              SELECT
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN event_type = 'view'
                              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS s1,
                CAST(sum(CASE WHEN event_type = 'view'
                              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                   * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS q1,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS s2,
                CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                   * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS q2
              FROM events WHERE event_type IN ('view', 'purchase')),
            b AS (
              SELECT n1, n2,
                     CAST(s1 * n2 - s2 * n1 AS BIGINT) AS md_num,
                     CAST(n1 * q1 - s1 * s1 AS BIGINT) AS v1_num,
                     CAST(n2 * q2 - s2 * s2 AS BIGINT) AS v2_num,
                     CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                       / CAST(n1 * n1 * (n1 - 1) AS DOUBLE) AS va,
                     CAST(n2 * q2 - s2 * s2 AS DOUBLE)
                       / CAST(n2 * n2 * (n2 - 1) AS DOUBLE) AS vb
              FROM a)
            SELECT n1, n2, md_num, v1_num, v2_num,
                   CAST(md_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)
                     / sqrt(va + vb) AS t,
                   (va + vb) * (va + vb)
                     / (va * va / CAST(n1 - 1 AS DOUBLE)
                        + vb * vb / CAST(n2 - 1 AS DOUBLE)) AS df
            FROM b""")
  )

  /** Spearman rank correlation between the DAILY view and purchase
    * revenue series — "do view-heavy days monetize?", the monotonic-
    * association member of the cohort family (Pearson on ranks, so one
    * viral outlier day cannot fabricate correlation the way it can in
    * agg_corr_matrix's raw-value Pearson).
    *
    * Determinism — EXACT INTEGERS end-to-end: daily revenues are BIGINT
    * cent sums; DOUBLED midranks are lo+hi of the tie span (the
    * agg_mannwhitney device: 2·rank + tiecount − 1, all integers);
    * Pearson's num = nΣxy − ΣxΣy and the two den factors over doubled
    * ranks are BIGINT (ranks ≤ 2n, n = #days — tiny at any SF), and
    * ρ = num/√(den₁·den₂) is one sqrt over identical integers.
    *
    * Scale shape: the fact scan reduces to the bounded DAY domain in
    * one map-side-combined aggregate; ranking and the final fold run on
    * #days rows. 100 TB of events never reaches the window. */
  val spearman: GraftQuery = GraftQuery(
    "agg_spearman",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cv = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val daily = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .groupBy(to_date($"ts").as("d"))
        .agg(sum(when($"event_type" === "view", cv).otherwise(0L)).as("x"),
          sum(when($"event_type" === "purchase", cv).otherwise(0L)).as("y"))
      // Doubled midrank = 2·rank + tiecount − 1 (exact integers even
      // under ties; fixture day totals are almost surely distinct but
      // the statistic must not depend on that).
      def dranked(col: String, out: String) =
        (df: org.apache.spark.sql.DataFrame) => df
          .withColumn(out, lit(2L) * rank().over(Window.orderBy(df(col))).cast("long")
            + count(lit(1L)).over(Window.partitionBy(df(col))) - 1L)
      val ranked = daily
        .transform(dranked("x", "rx"))
        .transform(dranked("y", "ry"))
      ranked
        .agg(count(lit(1)).as("n"),
          sum($"rx").as("sx"), sum($"ry").as("sy"),
          sum($"rx" * $"ry").as("sxy"),
          sum($"rx" * $"rx").as("sxx"),
          sum($"ry" * $"ry").as("syy"))
        .select($"n",
          ($"n" * $"sxy" - $"sx" * $"sy").as("rho_num"),
          ($"n" * $"sxx" - $"sx" * $"sx").as("den_x"),
          ($"n" * $"syy" - $"sy" * $"sy").as("den_y"),
          (($"n" * $"sxy" - $"sx" * $"sy").cast("double")
            / sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")
              * ($"n" * $"syy" - $"sy" * $"sy").cast("double"))).as("rho"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(sum(CASE WHEN event_type = 'view'
                                   THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS y
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            r AS (
              SELECT
                CAST(2 * rank() OVER (ORDER BY x)
                     + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
                CAST(2 * rank() OVER (ORDER BY y)
                     + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
              FROM daily),
            a AS (
              SELECT count(*) AS n,
                     CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
                     CAST(sum(rx * ry) AS BIGINT) AS sxy,
                     CAST(sum(rx * rx) AS BIGINT) AS sxx,
                     CAST(sum(ry * ry) AS BIGINT) AS syy
              FROM r)
            SELECT n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS rho_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
                   CAST(n * syy - sy * sy AS BIGINT) AS den_y,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
            FROM a""")
  )

  /** Cramér's V effect size over the same event_type × day-of-week
    * contingency table as `agg_chisq` — χ² says "dependence exists",
    * V says HOW MUCH on a [0,1] scale that survives changing N (the
    * number every χ² reading should be paired with before anyone acts
    * on a significant-but-tiny dependence).
    *
    * Determinism: V² = (χ²/N)/(min(r,c)−1) is computed from the SAME
    * integerized χ² accumulator as agg_chisq (Σ floor(term·1e12) in
    * BIGINT — trap note a), so V = √ of a ratio of identical exact
    * integers. Scale shape: identical to agg_chisq — one hash aggregate
    * onto the bounded cell domain. */
  val cramersV: GraftQuery = GraftQuery(
    "agg_cramers_v",
    (s, dir) => {
      import s.implicits._
      val cells = Tables.events(s, dir)
        .groupBy($"event_type", dayofweek($"ts").as("dow"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // totals + fold both read it
      val rowT = cells.groupBy($"event_type").agg(sum($"o").as("r"))
      val colT = cells.groupBy($"dow").agg(sum($"o").as("c"))
      val nTot = cells.agg(sum($"o").as("n"),
        countDistinct($"event_type").as("n_rows"),
        countDistinct($"dow").as("n_cols"))
      cells
        .join(broadcast(rowT), "event_type")
        .join(broadcast(colT), "dow")
        .crossJoin(broadcast(nTot))
        .withColumn("dev", $"o" * $"n" - $"r" * $"c")
        .withColumn("term",
          ($"dev" * $"dev").cast("double")
            / ($"n" * $"r" * $"c").cast("double"))
        .groupBy($"n", least($"n_rows", $"n_cols").as("min_dim"))
        .agg(sum(floor($"term" * 1e12).cast("long")).as("chi2_e12"))
        .select($"n", $"min_dim", $"chi2_e12",
          sqrt($"chi2_e12".cast("double") / 1e12
            / $"n".cast("double") / ($"min_dim" - 1L).cast("double")).as("v"))
    },
    Some("""WITH cells AS (
              SELECT event_type, dayofweek(ts) + 1 AS dow,
                     CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
            ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
            nt AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                          count(DISTINCT event_type) AS n_rows,
                          count(DISTINCT dow) AS n_cols
                   FROM cells),
            terms AS (
              SELECT nt.n, least(nt.n_rows, nt.n_cols) AS min_dim,
                     CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
                       / CAST(n * r * c AS DOUBLE) AS term
              FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nt)
            SELECT n, CAST(min_dim AS BIGINT) AS min_dim,
                   CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS BIGINT) AS chi2_e12,
                   sqrt(CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
                        / CAST(n AS DOUBLE) / CAST(min_dim - 1 AS DOUBLE)) AS v
            FROM terms GROUP BY n, min_dim""")
  )

  /** Benford first-digit conformance of order totals — the fraud /
    * data-fabrication screen ("organically grown money values lead with
    * 1 thirty percent of the time; synthetic or tampered books don't").
    * On a training-data pipeline the same test flags machine-generated
    * numeric fields masquerading as organic measurements.
    *
    * Determinism: leading digits come from the DECIMAL STRING of the
    * integer cents (no log10 — log10(10^k) landing at k−ε would
    * misbucket entire magnitudes), so the per-digit counts are exact;
    * the Benford expectations log10(1+1/d) are NINE DECIMAL LITERALS
    * embedded identically in both queries (same literal → same nearest
    * double in both parsers — computing log10 at runtime would gamble
    * on two libms' last ulp), and the χ²-against-expectation terms are
    * folded with the Σ floor(term·1e12) BIGINT accumulator (trap note
    * a). Scale shape: one hash aggregate onto a NINE-row domain. */
  val benford: GraftQuery = GraftQuery(
    "agg_benford",
    (s, dir) => {
      import s.implicits._
      val probs = Seq(
        1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
        3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
        5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
        7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
        9 -> 0.04575749056067514)
      val pCol = probs.foldLeft(lit(0.0)) { case (acc, (d, p)) =>
        when($"digit" === d, lit(p)).otherwise(acc)
      }
      val digits = Tables.orders(s, dir)
        .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
        .select(substring($"c".cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("o"))
      val tot = digits.agg(sum($"o").as("n"))
      val terms = digits.crossJoin(broadcast(tot))
        .withColumn("exp_o", $"n".cast("double") * pCol)
        .withColumn("term_e12",
          floor(($"o".cast("double") - $"exp_o") * ($"o".cast("double") - $"exp_o")
            / $"exp_o" * 1e12).cast("long"))
        .localCheckpoint() // digit rows + the summary fold both read it
      val chi2 = terms.agg(sum($"term_e12").as("chi2_e12"))
      terms.crossJoin(broadcast(chi2))
        .select($"digit", $"o", $"n", $"exp_o", $"term_e12", $"chi2_e12",
          ($"chi2_e12".cast("double") / 1e12).as("chi2"))
        .orderBy($"digit")
    },
    Some("""WITH d AS (
              SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                       AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                     CAST(count(*) AS BIGINT) AS o
              FROM orders GROUP BY 1),
            nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM d),
            p(digit, p) AS (VALUES
              (1, 0.3010299956639812), (2, 0.17609125905568124),
              (3, 0.12493873660829992), (4, 0.09691001300805642),
              (5, 0.07918124604762482), (6, 0.06694678963061322),
              (7, 0.05799194697768673), (8, 0.05115252244738129),
              (9, 0.04575749056067514)),
            terms AS (
              SELECT d.digit, d.o, nt.n,
                     CAST(nt.n AS DOUBLE) * CAST(p.p AS DOUBLE) AS exp_o,
                     CAST(floor((CAST(d.o AS DOUBLE) - CAST(nt.n AS DOUBLE) * CAST(p.p AS DOUBLE))
                                * (CAST(d.o AS DOUBLE) - CAST(nt.n AS DOUBLE) * CAST(p.p AS DOUBLE))
                                / (CAST(nt.n AS DOUBLE) * CAST(p.p AS DOUBLE)) * 1e12)
                          AS BIGINT) AS term_e12
              FROM d JOIN p ON d.digit = p.digit CROSS JOIN nt),
            s AS (SELECT CAST(sum(term_e12) AS BIGINT) AS chi2_e12 FROM terms)
            SELECT digit, o, n, exp_o, term_e12, chi2_e12,
                   CAST(chi2_e12 AS DOUBLE) / 1e12 AS chi2
            FROM terms CROSS JOIN s ORDER BY digit""")
  )

  /** Skewness and excess kurtosis of the value distribution per event
    * type — the shape diagnostics beyond agg_stats' mean/stddev ("is
    * this metric long-tailed enough that the mean is a lie?"), and the
    * moments a drift monitor tracks when the KS alarm needs a cheap
    * always-on companion.
    *
    * Determinism — exact raw power sums, double CENTRAL folds: per type
    * one hash aggregate produces n, S=Σc, Q=Σc², C=Σc³ in BIGINT; the
    * 4th power c⁴ does NOT fit BIGINT even per row (56021⁴ = 9.85e18 >
    * 2⁶³; the sf0.1 tail already reaches it), so each row contributes
    * the exact pair (c⁴ div 1e9, c⁴ mod 1e9) computed WITHOUT forming
    * c⁴: with c² = h·1e5 + l, c⁴ = h²·1e10 + r where r = 2hl·1e5 + l²
    * (≤ ~6e14), and since h²·1e10 is a multiple of 1e9 the split is
    * hi = h²·10 + r div 1e9, lo = r mod 1e9 — all operands ≤ 1e15.
    * P = Σhi·1e9 + Σlo exactly, and the halves fold to a double as
    * hi·1e9 + lo — NOT via a DECIMAL(38,0) accumulator, whose cast to
    * DOUBLE DuckDB does NOT round correctly (measured 1 ulp off
    * python's float(int); Spark's BigDecimal.doubleValue is
    * exact-rounded — a cross-engine trap of the same family as trap
    * note a). The central moments m2/m3/m4 and g1/g2 are scalar
    * expression trees over those exact values with IDENTICAL
    * association in both queries (and m2^1.5 is written m2·√m2 —
    * pow() would gamble on two libms), so the doubles match
    * bit-for-bit. Σc³ peaks ~7e16 at sf0.1 — headroom to ~100×, then
    * split it like the 4th power.
    *
    * Scale shape: ONE map-side-combined hash aggregate; everything
    * after is a |types|-row projection. */
  /** The per-event row frame the moment sums aggregate — cents, square,
    * and the algebraic (div 1e9, mod 1e9) split pieces of the 4th power
    * (which does NOT fit int64 per row). Shared by agg_moments and the
    * per-wave partials of stream_moments. */
  private[graft] def momentRows(s: SparkSession, dir: String): DataFrame =
    momentRowsOf(Tables.events(s, dir))

  /** The cv/cv2/split-p4 derivation off an arbitrary events frame — the
    * per-micro-batch form (StreamingSpec's real checkpointed
    * stream_moments drive computes partials from each batch). */
  private[graft] def momentRowsOf(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    ev
      .select($"event_id", $"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      .withColumn("cv2", $"cv" * $"cv")
      .withColumn("h", expr("cv2 div 100000"))
      .withColumn("l", $"cv2" % 100000L)
      .withColumn("r", lit(2L) * $"h" * $"l" * 100000L + $"l" * $"l")
  }

  /** The six exact sufficient-statistic aggregates per group — the wave
    * partial AND the batch aggregate (integer sums are associative, so
    * sums of wave partials equal the one-pass sums bit-for-bit). */
  private[graft] def momentAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n"), sum(col("cv")).as("s"),
    sum(col("cv2")).as("q"), sum(col("cv2") * col("cv")).as("c3"),
    sum(col("h") * col("h") * 10L + expr("r div 1000000000")).as("p4_hi"),
    sum(col("r") % 1000000000L).as("p4_lo"),
    // max|c| rides along so momentsFold can ENFORCE the documented
    // headroom (merges under max() in the streaming twin).
    max(abs(col("cv"))).as("mc"))

  /** The skew/kurtosis fold over a (event_type, n, s, q, c3, p4_hi,
    * p4_lo) frame — shared by agg_moments and stream_moments. The p4
    * halves need NOT be normalized (lo < 1e9): hi·1e9 + lo is the exact
    * integer either way, and the double fold is the same two IEEE ops. */
  private[graft] def momentsFold(raw: DataFrame): DataFrame = {
    import raw.sparkSession.implicits._
    val nd = $"n".cast("double")
    val mu = $"s".cast("double") / nd
    val qn = $"q".cast("double") / nd
    val cn = $"c3".cast("double") / nd
    val pn = ($"p4_hi".cast("double") * lit(1.0e9) + $"p4_lo".cast("double")) / nd
    val m2 = qn - mu * mu
    val m3 = cn - lit(3.0) * mu * qn + lit(2.0) * mu * mu * mu
    val m4 = pn - lit(4.0) * mu * cn + lit(6.0) * mu * mu * qn -
      lit(3.0) * mu * mu * mu * mu
    // Largest exact accumulators: Σc³ ≤ n·max|c|³ and Σ of the split-p4
    // hi halves ≤ n·max|c|⁴/1e9 — enforce both in DOUBLE (GraftQuery
    // .guarded) so past the documented headroom the query raises instead
    // of silently wrapping.
    val mcd = $"mc".cast("double")
    val safe = (nd * pow(mcd, 3.0) < 9.0e18) &&
      (nd * pow(mcd, 4.0) / 1.0e9 < 9.0e18)
    raw.select($"event_type", $"n", $"s", $"q", $"c3", $"p4_hi", $"p4_lo",
        GraftQuery.guarded(m3 / (m2 * sqrt(m2)), safe,
          "agg_moments: BIGINT moment accumulators near overflow — " +
            "shift Q/c3/p4 to DECIMAL(38,0)").as("skew"),
        (m4 / (m2 * m2) - lit(3.0)).as("kurt"))
      .orderBy($"event_type")
  }

  val moments: GraftQuery = GraftQuery(
    "agg_moments",
    (s, dir) => {
      import s.implicits._
      momentsFold(momentRows(s, dir).groupBy($"event_type").agg(
        momentAggs.head, momentAggs.tail: _*))
    },
    Some("""WITH raw AS (
              SELECT event_type, count(*) AS n,
                     CAST(sum(cv) AS BIGINT) AS s,
                     CAST(sum(cv * cv) AS BIGINT) AS q,
                     CAST(sum(cv * cv * cv) AS BIGINT) AS c3,
                     CAST(sum(h * h * 10 + r // 1000000000) AS BIGINT) AS p4_hi,
                     CAST(sum(r % 1000000000) AS BIGINT) AS p4_lo
              FROM (SELECT event_type, cv, cv * cv AS cv2,
                           (cv * cv) // 100000 AS h, (cv * cv) % 100000 AS l,
                           2 * ((cv * cv) // 100000) * ((cv * cv) % 100000) * 100000
                             + ((cv * cv) % 100000) * ((cv * cv) % 100000) AS r
                    FROM (SELECT event_type,
                                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv
                          FROM events))
              GROUP BY 1),
            f AS (
              SELECT *,
                     CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                     CAST(q AS DOUBLE) / CAST(n AS DOUBLE) AS qn,
                     CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE) AS cn,
                     (CAST(p4_hi AS DOUBLE) * 1.0e9 + CAST(p4_lo AS DOUBLE))
                       / CAST(n AS DOUBLE) AS pn
              FROM raw),
            g AS (
              SELECT *, qn - mu * mu AS m2,
                     cn - 3.0 * mu * qn + 2.0 * mu * mu * mu AS m3,
                     pn - 4.0 * mu * cn + 6.0 * mu * mu * qn
                        - 3.0 * mu * mu * mu * mu AS m4
              FROM f)
            SELECT event_type, n, s, q, c3, p4_hi, p4_lo,
                   m3 / (m2 * sqrt(m2)) AS skew,
                   m4 / (m2 * m2) - 3.0 AS kurt
            FROM g ORDER BY event_type""")
  )

  /** Share-of-parent rollup — revenue share of each nation WITHIN its
    * region (the % column every drill-down dashboard puts beside the
    * absolute number; at the mixture level it is the domain-weights
    * readout of llm_domain_mix applied to money).
    *
    * Determinism — EXACT RATIONAL: order totals aggregate to BIGINT
    * cents per nation in one hash aggregate; the region denominator is
    * a WINDOW SUM OF BIGINTs over the nation rows (integer window sums
    * are associativity-immune — trap note a bites double windows only),
    * so share = nation/region is num/den BIGINT with one division.
    *
    * Scale shape: fact scan → one hash aggregate onto the bounded
    * nation domain (broadcast dim joins); the window runs on 25 rows. */
  val shareOfParent: GraftQuery = GraftQuery(
    "agg_share_of_parent",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val nations = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)
          .select($"n_nationkey", $"n_name", $"n_regionkey")),
          $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)
          .select($"r_regionkey", $"r_name")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name".as("region"), $"n_name".as("nation"))
        .agg(expr("sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))")
          .as("nation_cents"))
      val w = Window.partitionBy($"region")
      nations
        .withColumn("region_cents", sum($"nation_cents").over(w))
        .select($"region", $"nation", $"nation_cents", $"region_cents",
          ($"nation_cents".cast("double") / $"region_cents".cast("double"))
            .as("share"))
        .orderBy($"region", $"nation")
    },
    Some("""WITH n AS (
              SELECT r_name AS region, n_name AS nation,
                     CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                          AS BIGINT) AS nation_cents
              FROM orders
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2)
            SELECT region, nation, nation_cents,
                   CAST(sum(nation_cents) OVER (PARTITION BY region) AS BIGINT)
                     AS region_cents,
                   CAST(nation_cents AS DOUBLE)
                     / CAST(sum(nation_cents) OVER (PARTITION BY region) AS DOUBLE)
                     AS share
            FROM n ORDER BY region, nation""")
  )

  /** One-way ANOVA F across ALL FIVE event-type cohorts — the k-group
    * generalization of agg_ttest_welch ("is ANY cohort mean different?"
    * — the first gate before pairwise tests, which uncorrected would
    * fish through C(5,2) comparisons).
    *
    * Determinism — the Welch convention hardened for k groups: the
    * per-group sufficient statistics (n_g, S_g, Q_g) land as COLUMNS of
    * ONE conditional hash-aggregate row (the agg_corr_matrix device),
    * so the cross-group folds SSW = Σ_g (Q_g − S_g²/n_g) and
    * SSB = Σ_g S_g²/n_g − (ΣS)²/N are FIXED-ORDER scalar chains
    * (a+b+c+d+e in source order) — never an unordered SUM aggregate
    * over group rows, whose association differs between engines (trap
    * note a's k-group form). F = (SSB/(k−1))/(SSW/(N−k)) over those
    * identical doubles.
    *
    * Scale shape: ONE map-side-combined hash aggregate over the fact
    * scan; everything after is a 1-row projection. */
  val anova: GraftQuery = GraftQuery(
    "agg_anova",
    (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cv = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val aggs = types.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n$i"),
        sum(when($"event_type" === t, $"cv").otherwise(0L)).as(s"s$i"),
        sum(when($"event_type" === t, $"cv" * $"cv").otherwise(0L)).as(s"q$i"))
      } :+ max(abs($"cv")).as("mc") // overflow-guard bound (see `guarded`)
      val raw = Tables.events(s, dir).select($"event_type", cv.as("cv"))
        .agg(aggs.head, aggs.tail: _*)
      def d(c: String) = col(c).cast("double")
      val idx = types.indices
      val nTot = idx.map(i => col(s"n$i")).reduce(_ + _)
      val sTot = idx.map(i => col(s"s$i")).reduce(_ + _)
      // fixed-order chains: (((g0 + g1) + g2) + g3) + g4 in both engines
      val within = idx.map(i => d(s"q$i") - d(s"s$i") * d(s"s$i") / d(s"n$i"))
        .reduce(_ + _)
      val between = idx.map(i => d(s"s$i") * d(s"s$i") / d(s"n$i")).reduce(_ + _) -
        sTot.cast("double") * sTot.cast("double") / nTot.cast("double")
      // Largest exact accumulator is a per-group Q ≤ n·max|c|²: enforce
      // the documented headroom (raise, never wrap — see GraftQuery.guarded).
      val safe = nTot.cast("double") * pow($"mc".cast("double"), 2.0) < 9.0e18
      raw.select(nTot.as("n_total"), lit(types.length).as("k"),
          between.as("ssb"), within.as("ssw"),
          GraftQuery.guarded(
            (between / lit((types.length - 1).toDouble))
              / (within / (nTot.cast("double") - lit(types.length.toDouble))),
            safe,
            "agg_anova: BIGINT Q accumulators near overflow — " +
              "shift to DECIMAL(38,0)").as("f"))
    },
    Some("""WITH a AS (
              SELECT
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                CAST(sum(CASE WHEN event_type = 'click' THEN cv ELSE 0 END) AS BIGINT) AS s0,
                CAST(sum(CASE WHEN event_type = 'click' THEN cv * cv ELSE 0 END) AS BIGINT) AS q0,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN event_type = 'error' THEN cv ELSE 0 END) AS BIGINT) AS s1,
                CAST(sum(CASE WHEN event_type = 'error' THEN cv * cv ELSE 0 END) AS BIGINT) AS q1,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN cv ELSE 0 END) AS BIGINT) AS s2,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN cv * cv ELSE 0 END) AS BIGINT) AS q2,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                CAST(sum(CASE WHEN event_type = 'signup' THEN cv ELSE 0 END) AS BIGINT) AS s3,
                CAST(sum(CASE WHEN event_type = 'signup' THEN cv * cv ELSE 0 END) AS BIGINT) AS q3,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n4,
                CAST(sum(CASE WHEN event_type = 'view' THEN cv ELSE 0 END) AS BIGINT) AS s4,
                CAST(sum(CASE WHEN event_type = 'view' THEN cv * cv ELSE 0 END) AS BIGINT) AS q4
              FROM (SELECT event_type,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv
                    FROM events)),
            f AS (
              SELECT n0 + n1 + n2 + n3 + n4 AS n_total,
                     CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     + (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     + (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE))
                     + (CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)) AS ssw,
                     CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                     + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                     + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)
                     - CAST(s0 + s1 + s2 + s3 + s4 AS DOUBLE)
                       * CAST(s0 + s1 + s2 + s3 + s4 AS DOUBLE)
                       / CAST(n0 + n1 + n2 + n3 + n4 AS DOUBLE) AS ssb
              FROM a)
            SELECT CAST(n_total AS BIGINT) AS n_total, 5 AS k, ssb, ssw,
                   (ssb / 4.0) / (ssw / (CAST(n_total AS DOUBLE) - 5.0)) AS f
            FROM f""")
  )

  /** Wilcoxon signed-rank test on the PAIRED daily (view, purchase)
    * revenue series — the paired complement to agg_mannwhitney's
    * unpaired U ("on the same day, does one cohort reliably out-earn
    * the other?" — pairing by day removes the day-to-day traffic level
    * that inflates the unpaired test's variance).
    *
    * Determinism — EXACT INTEGERS via the mannwhitney device applied to
    * |differences|: daily diffs are BIGINT cents, zeros dropped (the
    * standard treatment), |d| tie spans give DOUBLED midranks lo+hi, so
    * 2·W⁺ = Σ_{d>0} (lo+hi) is BIGINT; the normal z uses the exact
    * variance numerator n(n+1)(2n+1)·2 − Σ(t³−t) (over 48·4, folded as
    * one sqrt over identical integers) and the doubled mean n(n+1)/2.
    *
    * Scale shape: fact scan reduces to the DAY domain; ranking and the
    * fold run on |days| rows. */
  val wilcoxon: GraftQuery = GraftQuery(
    "agg_wilcoxon",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cv = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val diffs = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .groupBy(to_date($"ts").as("d"))
        .agg((sum(when($"event_type" === "view", cv).otherwise(0L))
          - sum(when($"event_type" === "purchase", cv).otherwise(0L))).as("diff"))
        .filter($"diff" =!= 0L)
        .select($"diff", abs($"diff").as("ad"))
      val counts = diffs.groupBy($"ad")
        .agg(count(lit(1)).as("t"),
          sum(when($"diff" > 0, 1L).otherwise(0L)).as("c_pos"))
      val w = Window.orderBy($"ad").rowsBetween(Window.unboundedPreceding, 0)
      counts
        .withColumn("hi", sum($"t").over(w))
        .withColumn("lo", $"hi" - $"t" + 1)
        .agg(sum($"t").as("n"),
          sum($"c_pos" * ($"lo" + $"hi")).as("w_plus_x2"),
          sum($"t" * $"t" * $"t" - $"t").as("tie_t3"))
        .select($"n", $"w_plus_x2", $"tie_t3",
          // z = (2W⁺ − n(n+1)/2) / sqrt((2n(n+1)(2n+1) − Σ(t³−t)) / 12)
          // (doubled-statistic algebra: Var(2W⁺) = 4·Var(W⁺); the mean
          // term n(n+1)/2 uses INTEGER division — Column `/` is double
          // division, the ts_theilsen even-count lesson)
          (($"w_plus_x2" - expr("n * (n + 1) div 2")).cast("double")
            / sqrt((($"n" * ($"n" + 1L) * (lit(2L) * $"n" + 1L) * 2L - $"tie_t3")
              .cast("double")) / 12.0)).as("z"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(sum(CASE WHEN event_type = 'view'
                                   THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                   ELSE 0 END)
                          - sum(CASE WHEN event_type = 'purchase'
                                     THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS diff
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            nz AS (SELECT diff, abs(diff) AS ad FROM daily WHERE diff <> 0),
            c AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
                         CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos
                  FROM nz GROUP BY 1),
            r AS (SELECT *,
                         CAST(sum(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT) AS hi
                  FROM c),
            a AS (SELECT CAST(sum(t) AS BIGINT) AS n,
                         CAST(sum(c_pos * ((hi - t + 1) + hi)) AS BIGINT) AS w_plus_x2,
                         CAST(sum(t * t * t - t) AS BIGINT) AS tie_t3
                  FROM r)
            SELECT n, w_plus_x2, tie_t3,
                   CAST(w_plus_x2 - (n * (n + 1)) // 2 AS DOUBLE)
                     / sqrt(CAST(n * (n + 1) * (2 * n + 1) * 2 - tie_t3 AS DOUBLE) / 12.0) AS z
            FROM a""")
  )

  /** Per-day Shannon entropy of the event-type mix — the label-balance
    * monitor a training pipeline runs on every ingest day ("did today's
    * labels collapse to one class?"): H = ln n − Σ c·ln c / n over the
    * day's category counts, plus the ln(k)-normalized form in [0, 1].
    *
    * Determinism — the agg_anova device: the category domain is the
    * FIXED event-type set, so the per-day counts land as COLUMNS of one
    * aggregate row (5 conditional sums) and the entropy is a
    * fixed-order scalar chain over exact BIGINTs — identical doubles in
    * both engines, no double accumulation anywhere (c·ln c terms fold
    * in declaration order, 0·ln 0 = 0 by the c > 0 guard). round(6) at
    * the final projection (ln outputs are irrational — never on a
    * decimal boundary; the fold is exact so there is no association
    * error to cross one).
    *
    * Scale shape: ONE map-side-combined hash aggregate onto the bounded
    * day domain; the entropy fold is a per-row projection over days ×
    * k columns. */
  /** The fixed event-type domain and the per-day conditional count
    * columns + entropy fold — shared by agg_entropy and its streaming
    * twin (stream_entropy merges per-wave count partials into the same
    * (d, c0..c4) frame before this fold). */
  private[graft] val entropyTypes = Seq("click", "error", "purchase", "signup", "view")
  private[graft] def entropyAggs: Seq[Column] =
    entropyTypes.zipWithIndex.map { case (t, i) =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c$i")
    }
  private[graft] def entropyFold(raw: DataFrame): DataFrame = {
    val idx = entropyTypes.indices
    val n = idx.map(i => col(s"c$i")).reduce(_ + _)
    val k = idx.map(i => when(col(s"c$i") > 0L, 1L).otherwise(0L)).reduce(_ + _)
    val clnc = idx.map(i =>
      when(col(s"c$i") > 0L,
        col(s"c$i").cast("double") * log(col(s"c$i").cast("double")))
        .otherwise(lit(0.0))).reduce(_ + _)
    val h = log(n.cast("double")) - clnc / n.cast("double")
    raw.select(col("d"), n.as("n"), k.as("k_present"),
        round(h, 6).as("entropy"),
        round(h / log(lit(entropyTypes.length.toDouble)), 6).as("entropy_norm"))
      .orderBy(col("d"))
  }

  val entropy: GraftQuery = GraftQuery(
    "agg_entropy",
    (s, dir) => {
      import s.implicits._
      val aggs = entropyAggs
      entropyFold(Tables.events(s, dir)
        .select(to_date($"ts").as("d"), $"event_type")
        .groupBy($"d").agg(aggs.head, aggs.tail: _*))
    },
    Some("""WITH a AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                     CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                     CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c4
              FROM events GROUP BY 1),
            f AS (
              SELECT d, c0 + c1 + c2 + c3 + c4 AS n,
                     (CASE WHEN c0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN c1 > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN c2 > 0 THEN 1 ELSE 0 END) + (CASE WHEN c3 > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN c4 > 0 THEN 1 ELSE 0 END) AS k_present,
                     (CASE WHEN c0 > 0 THEN c0 * ln(CAST(c0 AS DOUBLE)) ELSE 0.0 END)
                   + (CASE WHEN c1 > 0 THEN c1 * ln(CAST(c1 AS DOUBLE)) ELSE 0.0 END)
                   + (CASE WHEN c2 > 0 THEN c2 * ln(CAST(c2 AS DOUBLE)) ELSE 0.0 END)
                   + (CASE WHEN c3 > 0 THEN c3 * ln(CAST(c3 AS DOUBLE)) ELSE 0.0 END)
                   + (CASE WHEN c4 > 0 THEN c4 * ln(CAST(c4 AS DOUBLE)) ELSE 0.0 END) AS clnc
              FROM a)
            SELECT d, CAST(n AS BIGINT) AS n, CAST(k_present AS BIGINT) AS k_present,
                   (round(ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE), 6) + 0.0) AS entropy,
                   (round((ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE)) / ln(5.0), 6) + 0.0)
                     AS entropy_norm
            FROM f ORDER BY d""")
  )

  /** Deequ-style data-quality expectation suite over lineitem — the
    * admission gate every 100 TB ingest runs before data reaches
    * training: completeness, domain membership, value ranges and
    * primary-key uniqueness, each emitted as a (check, metric,
    * threshold, ok) row so the caller alerts on `ok = 0` rows.
    *
    * All seven checks fold in ONE map-side-combined aggregate pass
    * (conditional BIGINT counts plus one exact count-distinct on the
    * synthetic BIGINT pk image l_orderkey·100 + l_linenumber — TPC-H
    * line numbers are < 8, so the image is injective and both engines
    * count identical integers); metrics are one-division doubles of
    * exact counts. The wide row unpivots via `stack` (a local
    * generator, no shuffle). At 100 TB this is one scan + one
    * single-row aggregate — the cheapest possible audit shape; adding
    * a check is adding a column, not a pass. */
  val expectations: GraftQuery = GraftQuery(
    "agg_expectations",
    (s, dir) => {
      import s.implicits._
      val frac = (c: org.apache.spark.sql.Column) =>
        c.cast("double") / count(lit(1)).cast("double")
      val a = Tables.lineitem(s, dir).agg(
        frac(sum(when($"l_quantity".isNotNull, 1L).otherwise(0L)))
          .as("m_complete_qty"),
        frac(sum(when($"l_quantity" >= 1.0 && $"l_quantity" <= 50.0, 1L)
          .otherwise(0L))).as("m_range_qty"),
        frac(sum(when($"l_discount" >= 0.0 && $"l_discount" <= 0.1, 1L)
          .otherwise(0L))).as("m_range_disc"),
        frac(sum(when($"l_returnflag".isin("A", "N", "R"), 1L).otherwise(0L)))
          .as("m_domain_flag"),
        frac(sum(when($"l_extendedprice" > 0.0, 1L).otherwise(0L)))
          .as("m_pos_price"),
        frac(sum(when($"l_shipdate".isNotNull, 1L).otherwise(0L)))
          .as("m_complete_ship"),
        frac(count_distinct($"l_orderkey" * lit(100L) +
          $"l_linenumber".cast("long"))).as("m_unique_pk"))
      a.selectExpr(
        """stack(7,
             'completeness_l_quantity', m_complete_qty, CAST(1.0 AS DOUBLE),
             'completeness_l_shipdate', m_complete_ship, CAST(1.0 AS DOUBLE),
             'domain_l_returnflag',     m_domain_flag,   CAST(1.0 AS DOUBLE),
             'positive_l_extendedprice',m_pos_price,     CAST(1.0 AS DOUBLE),
             'range_l_discount',        m_range_disc,    CAST(0.99 AS DOUBLE),
             'range_l_quantity',        m_range_qty,     CAST(0.99 AS DOUBLE),
             'uniqueness_pk',           m_unique_pk,     CAST(1.0 AS DOUBLE)
           ) AS (check_name, metric, threshold)""")
        .select($"check_name", $"metric", $"threshold",
          when($"metric" >= $"threshold", 1L).otherwise(0L).as("ok"))
        .orderBy($"check_name")
    },
    Some("""WITH a AS (
              SELECT count(*) AS n,
                     CAST(sum(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_q,
                     CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS r_q,
                     CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS r_d,
                     CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS d_f,
                     CAST(sum(CASE WHEN l_extendedprice > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS p_p,
                     CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_s,
                     count(DISTINCT l_orderkey * 100 + l_linenumber) AS u_pk
              FROM lineitem),
            m AS (
              SELECT 'completeness_l_quantity' AS check_name,
                     CAST(c_q AS DOUBLE) / CAST(n AS DOUBLE) AS metric, 1.0 AS threshold FROM a
              UNION ALL SELECT 'completeness_l_shipdate',
                     CAST(c_s AS DOUBLE) / CAST(n AS DOUBLE), 1.0 FROM a
              UNION ALL SELECT 'domain_l_returnflag',
                     CAST(d_f AS DOUBLE) / CAST(n AS DOUBLE), 1.0 FROM a
              UNION ALL SELECT 'positive_l_extendedprice',
                     CAST(p_p AS DOUBLE) / CAST(n AS DOUBLE), 1.0 FROM a
              UNION ALL SELECT 'range_l_discount',
                     CAST(r_d AS DOUBLE) / CAST(n AS DOUBLE), 0.99 FROM a
              UNION ALL SELECT 'range_l_quantity',
                     CAST(r_q AS DOUBLE) / CAST(n AS DOUBLE), 0.99 FROM a
              UNION ALL SELECT 'uniqueness_pk',
                     CAST(u_pk AS DOUBLE) / CAST(n AS DOUBLE), 1.0 FROM a)
            SELECT check_name, metric, CAST(threshold AS DOUBLE) AS threshold,
                   CAST(CASE WHEN metric >= threshold THEN 1 ELSE 0 END AS BIGINT) AS ok
            FROM m ORDER BY check_name""")
  )

  /** k-anonymity + l-diversity audit over the customer quasi-identifier
    * pair (nation, market segment) — the pre-release privacy check for
    * any dataset that ships user-derived rows: a group smaller than k
    * re-identifies its members; a group whose SENSITIVE attribute
    * (here the account-balance thousand-bucket, in exact cents) takes
    * fewer than l distinct values discloses it even at size ≥ k.
    *
    * Emits every quasi-identifier group with its size, its sensitive
    * diversity, and the two pass flags — the caller suppresses or
    * generalizes the `k_ok = 0 OR l_ok = 0` groups. One hash aggregate
    * with an exact count-distinct (the group domain is the bounded
    * nation × segment product, so the distinct expansion is bounded);
    * at 100 TB the shape is unchanged — group state, not row state. */
  val kanon: GraftQuery = GraftQuery(
    "agg_kanon",
    (s, dir) => {
      import s.implicits._
      val K = 5L; val L = 3L
      Tables.customer(s, dir)
        .select($"c_nationkey".cast("long").as("nation"), $"c_mktsegment".as("segment"),
          // +100000 shifts the cents domain positive before the integer
          // division: Spark `div` truncates toward zero while engines
          // disagree on negative integer division, so the bucket id is
          // only cross-engine-exact on a non-negative domain (c_acctbal
          // ≥ −999.99 per the fixture, so the shift suffices).
          expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) div 100000")
            .as("bal_bucket"))
        .groupBy($"nation", $"segment")
        .agg(count(lit(1)).as("n"), count_distinct($"bal_bucket").as("l_div"))
        .select($"nation", $"segment", $"n", $"l_div",
          when($"n" >= K, 1L).otherwise(0L).as("k_ok"),
          when($"l_div" >= L, 1L).otherwise(0L).as("l_ok"))
        .orderBy($"nation", $"segment")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
                   count(*) AS n,
                   count(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) // 100000) AS l_div,
                   CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
                   CAST(CASE WHEN count(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) // 100000) >= 3
                        THEN 1 ELSE 0 END AS BIGINT) AS l_ok
            FROM customer
            GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Herfindahl–Hirschman concentration index per nation — how
    * concentrated is line-item volume across a nation's suppliers
    * (1/n_s = perfectly even, 1.0 = single-supplier): the antitrust
    * number, and for a training pipeline the single-number form of
    * agg_pareto's curve (swap supplier → source, volume → documents —
    * "is this slice of the corpus effectively one provider?").
    *
    * Determinism — EXACT RATIONAL: per-supplier BIGINT line counts in
    * one hash aggregate; HHI = Σc² / (Σc)², both BIGINT folds on the
    * bounded supplier domain, one division of identical integers. The
    * squares ride GraftQuery.guarded on n_s·max(c)² (and total²)
    * headroom — past ~1000× sf0.1 the query RAISES (shift to
    * DECIMAL(38,0)).
    *
    * Scale shape: the fact scan reduces in one map-side-combined
    * aggregate onto the supplier domain (the nation tag rides a
    * broadcast dim join); the second fold is 25 rows. */
  val hhi: GraftQuery = GraftQuery(
    "agg_hhi",
    (s, dir) => {
      import s.implicits._
      val per = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)
          .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey".cast("long").as("nation"), $"l_suppkey")
        .agg(count(lit(1)).as("c"))
      val agg = per.groupBy($"nation")
        .agg(count(lit(1)).as("n_suppliers"), sum($"c").as("total"),
          sum($"c" * $"c").as("hhi_num"), max($"c").as("mc"))
      val safe = pow($"n_suppliers".cast("double"), 1.0) *
        pow($"mc".cast("double"), 2.0) < 9.0e18 &&
        pow($"total".cast("double"), 2.0) < 9.0e18
      val g = (c: Column) => graft.GraftQuery.guarded(c, safe,
        "agg_hhi: BIGINT square accumulators near overflow — " +
          "shift to DECIMAL(38,0)")
      agg.select($"nation", $"n_suppliers", $"total",
          g($"hhi_num").as("hhi_num"),
          (g($"hhi_num").cast("double")
            / ($"total" * $"total").cast("double")).as("hhi"))
        .orderBy($"nation")
    },
    Some("""WITH per AS (
              SELECT CAST(s_nationkey AS BIGINT) AS nation, l_suppkey, count(*) AS c
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2)
            SELECT nation, count(*) AS n_suppliers,
                   CAST(sum(c) AS BIGINT) AS total,
                   CAST(sum(c * c) AS BIGINT) AS hhi_num,
                   CAST(sum(c * c) AS DOUBLE)
                     / CAST(sum(c) * sum(c) AS DOUBLE) AS hhi
            FROM per GROUP BY nation
            ORDER BY nation""")
  )

  /** Poisson-bootstrap 95% confidence interval for the mean daily
    * revenue per event type — THE web-scale bootstrap: classical
    * resampling draws n observations WITH replacement per resample
    * (undistributable — every resample needs global coordination);
    * the Poisson bootstrap replaces each observation's multinomial
    * count with an independent Poisson(1) weight, so every row decides
    * its own weight in every resample locally — one pass, no
    * coordination, B resamples for free. The CI a mean without an
    * interval cannot honestly ship.
    *
    * Determinism (no RNG anywhere): the per-(row, resample) uniform is
    * the fn_checksum device — first 48 md5 bits of "type|day|b" over
    * 2⁴⁸ — and the Poisson(1) weight is the inverse CDF as a shared
    * literal threshold chain (cum_k = Σ e⁻¹/i!, computed driver-side
    * once, embedded as the SAME double literals in both engines; both
    * the uniform and the comparison are identical IEEE ops). Resample
    * means are single divisions of exact BIGINT folds; the 2.5/97.5
    * percentiles interpolate identical doubles (the agg_percentile
    * parity); rounding 4dp at the final projection only.
    *
    * Scale shape: the fact scan reduces ONCE to the (type, day) domain;
    * the ×B explode runs on that bounded domain (B·|domain| rows, never
    * B·|corpus|); one hash aggregate onto (type, b) cells; the
    * percentile fold is |types|×B rows. At 100 TB nothing but the first
    * aggregate ever sees the events table. */
  /** The daily (type, day, cents) frame the bootstrap resamples —
    * shared with the streaming twin, whose per-wave integer partials
    * merge to exactly this frame. */
  private[graft] def bootstrapDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
  }

  /** The resample-and-interval fold over a (event_type, d, v) daily
    * frame — deterministic given the frame's VALUES (the md5 uniforms
    * key on type|day|b), so any arrival slicing that reproduces the
    * frame reproduces the CI bit-for-bit. */
  private[graft] def bootstrapFold(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val B = 200
    // cum_k = P(Poisson(1) ≤ k), k = 0..8 — driver-side exact doubles
    // shared with the oracle as literals (tail mass past 9 ≈ 1e-7;
    // u ≥ cum_8 maps to weight 9 in BOTH engines identically).
    val cums = {
      val e = math.exp(-1.0); var fact = 1.0
      (0 to 8).map { k => if (k > 0) fact *= k; e / fact }
        .scanLeft(0.0)(_ + _).drop(1)
    }
    val wExpr = cums.map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")
    val means = daily
      .withColumn("b", explode(expr(s"sequence(0, ${B - 1})")))
      .withColumn("u", expr(
        """CAST(conv(substring(md5(concat(
             event_type, '|', CAST(d AS STRING), '|', CAST(b AS STRING)
           )), 1, 12), 16, 10) AS BIGINT) / 281474976710656.0"""))
      .withColumn("w", expr(wExpr))
      .groupBy($"event_type", $"b")
      // Overflow gate on the weighted fold (ADVICE r12): w reaches 9, so
      // the worst case is 9 * n_days * max|v| — checked in DOUBLE off the
      // SAME aggregate row, RAISES past the BIGINT headroom where
      // non-ANSI Spark would wrap silently and DuckDB would raise.
      .agg(graft.GraftQuery.guarded(sum($"w" * $"v"),
        lit(9.0) * count(lit(1)).cast("double") * max(abs($"v")).cast("double") < lit(9e18),
        "agg_bootstrap_ci: Poisson-weighted daily-revenue fold past the " +
          "BIGINT headroom (9 * n_days * max|v| >= 9e18) — rescale cents " +
          "to a coarser unit or widen the fold to DECIMAL(38,0)").as("sv"),
        sum($"w").as("sw"))
      .filter($"sw" > 0L)
      .select($"event_type",
        ($"sv".cast("double") / $"sw".cast("double")).as("m"))
    val point = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        (sum($"v").cast("double") / count(lit(1)).cast("double"))
          .as("mean_cents"))
    means.groupBy($"event_type")
      .agg(count(lit(1)).as("n_resamples"),
        expr("percentile_cont(0.025) WITHIN GROUP (ORDER BY m)").as("lo"),
        expr("percentile_cont(0.975) WITHIN GROUP (ORDER BY m)").as("hi"))
      .join(point, "event_type")
      .select($"event_type", $"n_days", $"n_resamples",
        round($"mean_cents", 4).as("mean_cents"),
        round($"lo", 4).as("ci_lo"), round($"hi", 4).as("ci_hi"))
      .orderBy($"event_type")
  }

  val bootstrapCi: GraftQuery = GraftQuery(
    "agg_bootstrap_ci",
    (s, dir) => bootstrapFold(bootstrapDaily(s, dir)),
    Some {
      val cums = {
        val e = math.exp(-1.0); var fact = 1.0
        (0 to 8).map { k => if (k > 0) fact *= k; e / fact }
          .scanLeft(0.0)(_ + _).drop(1)
      }
      val wExpr = cums.map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1, 2),
          rs AS (
            SELECT event_type, d, v, unnest(range(0, 200)) AS b FROM daily),
          uw AS (
            SELECT event_type, b, v,
                   CAST(('0x' || substr(md5(
                     event_type || '|' || strftime(d, '%Y-%m-%d') || '|' ||
                     CAST(b AS VARCHAR)), 1, 12)) AS BIGINT)
                     / 281474976710656.0 AS u
            FROM rs),
          cells AS (
            SELECT event_type, b,
                   CAST(sum($wExpr * v) AS BIGINT) AS sv,
                   CAST(sum($wExpr) AS BIGINT) AS sw
            FROM uw GROUP BY 1, 2),
          means AS (
            SELECT event_type,
                   CAST(sv AS DOUBLE) / CAST(sw AS DOUBLE) AS m
            FROM cells WHERE sw > 0),
          pt AS (
            SELECT event_type, count(*) AS n_days,
                   CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_cents
            FROM daily GROUP BY 1)
          SELECT event_type, n_days, count(*) AS n_resamples,
                 (round(any_value(mean_cents), 4) + 0.0) AS mean_cents,
                 (round(percentile_cont(0.025) WITHIN GROUP (ORDER BY m), 4) + 0.0) AS ci_lo,
                 (round(percentile_cont(0.975) WITHIN GROUP (ORDER BY m), 4) + 0.0) AS ci_hi
          FROM means JOIN pt USING (event_type)
          GROUP BY event_type, n_days
          ORDER BY event_type"""
    }
  )

  /** CUPED variance-reduced experiment readout — the industry-standard
    * A/B analysis device (Deng et al., Microsoft): the experiment
    * metric y adjusts by each unit's PRE-period covariate x
    * (y* = y − θ(x − x̄), θ = cov(x,y)/var(x)), which removes the
    * between-user variance the randomization already balanced and
    * shrinks the CI by the pooled ρ² — the difference between a
    * two-week and a two-day experiment at the same power. Arms split
    * deterministically on user parity; periods split at the derived
    * calendar midpoint; the emitted var_reduction IS ρ².
    *
    * Determinism: per-user period sums are exact BIGINT cents; the
    * pooled sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) fold in
    * BIGINT with the ts_ols guard discipline (all cross-products
    * bounded by n²·mx·my in DOUBLE — past headroom the query RAISES);
    * θ, ρ², and the adjusted means are divisions/products of identical
    * integers in identical order; rounding 4dp at the projection only.
    *
    * Scale shape: the fact scan reduces ONCE to per-user period sums
    * (one hash aggregate on user_id); the pooled stats and the date
    * bounds are 1-row broadcasts; arm rollups are a 2-group aggregate.
    * 100 TB of events never leaves the first aggregate. */
  /** The per-user (pre-period x, experiment-period y) cent frame under
    * the experimentation family — shared by agg_cuped and
    * agg_power_mde so the two read the SAME period split. */
  private[graft] def cupedUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val ev = Tables.events(s, dir).select($"user_id", to_date($"ts").as("d"),
      cents.as("c"))
    val bounds = ev.agg(min($"d").as("lo"), max($"d").as("hi"))
      .select($"lo", date_add($"lo",
        (datediff($"hi", $"lo") / 2).cast("int")).as("mid"))
    ev.crossJoin(broadcast(bounds))
      .groupBy($"user_id")
      .agg(sum(when($"d" <= $"mid", $"c").otherwise(0L)).as("x"),
        sum(when($"d" > $"mid", $"c").otherwise(0L)).as("y"))
  }

  val cuped: GraftQuery = GraftQuery(
    "agg_cuped",
    (s, dir) => {
      import s.implicits._
      val users = cupedUsers(s, dir)
      val pool = users.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        max(abs($"x")).as("mx"), max(abs($"y")).as("my"))
      val nD = $"n".cast("double")
      val safe =
        (lit(2.0) * pow(nD, 2.0) * $"mx".cast("double") * $"my".cast("double") < 9.0e18) &&
        (lit(2.0) * pow(nD, 2.0) * pow($"mx".cast("double"), 2.0) < 9.0e18) &&
        (lit(2.0) * pow(nD, 2.0) * pow($"my".cast("double"), 2.0) < 9.0e18)
      val g = (c: org.apache.spark.sql.Column) => graft.GraftQuery.guarded(
        c, safe, "agg_cuped: BIGINT sufficient statistics near overflow — " +
          "shift the folds to DECIMAL(38,0)")
      val stats = pool.select($"n", $"sx", $"sy",
        g($"n" * $"sxy" - $"sx" * $"sy").as("cxy"),
        g($"n" * $"sxx" - $"sx" * $"sx").as("vx"),
        g($"n" * $"syy" - $"sy" * $"sy").as("vy"))
      users
        .withColumn("arm", pmod($"user_id", lit(2)))
        .groupBy($"arm")
        .agg(count(lit(1)).as("n_users"),
          sum($"x").as("ax"), sum($"y").as("ay"))
        .crossJoin(broadcast(stats))
        .select($"arm", $"n_users",
          round($"ay".cast("double") / $"n_users".cast("double"), 4)
            .as("mean_y"),
          round($"ay".cast("double") / $"n_users".cast("double")
            - ($"cxy".cast("double") / $"vx".cast("double"))
              * ($"ax".cast("double") / $"n_users".cast("double")
                 - $"sx".cast("double") / $"n".cast("double")), 4)
            .as("mean_y_adj"),
          round($"cxy".cast("double") / $"vx".cast("double"), 6).as("theta"),
          round(($"cxy".cast("double") * $"cxy".cast("double"))
            / ($"vx".cast("double") * $"vy".cast("double")), 6)
            .as("var_reduction"))
        .orderBy($"arm")
    },
    Some("""WITH ev AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
            b AS (
              SELECT min(d) AS lo,
                     min(d) + CAST(CAST(datediff('day', min(d), max(d)) AS INT) // 2
                                   AS INT) AS mid
              FROM ev),
            u AS (
              SELECT user_id,
                     CAST(sum(CASE WHEN d <= (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN d > (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS y
              FROM ev GROUP BY user_id),
            p AS (
              SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM u),
            st AS (
              SELECT n, sx, sy,
                     CAST(n * sxy - sx * sy AS BIGINT) AS cxy,
                     CAST(n * sxx - sx * sx AS BIGINT) AS vx,
                     CAST(n * syy - sy * sy AS BIGINT) AS vy
              FROM p),
            a AS (
              SELECT user_id % 2 AS arm, count(*) AS n_users,
                     CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
              FROM u GROUP BY 1)
            SELECT arm, n_users,
                   (round(CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE), 4) + 0.0) AS mean_y,
                   (round(CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE)
                     - (CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE))
                       * (CAST(ax AS DOUBLE) / CAST(n_users AS DOUBLE)
                          - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 4) + 0.0) AS mean_y_adj,
                   (round(CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE), 6) + 0.0) AS theta,
                   (round((CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE))
                     / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) + 0.0) AS var_reduction
            FROM a CROSS JOIN st
            ORDER BY arm""")
  )

  /** Power analysis / minimum-detectable-effect readout — the question
    * every experiment answers BEFORE it runs ("how small a lift can
    * this setup see at 80% power?") and the one agg_cuped's ρ²
    * monetizes: MDE = (z_{α/2} + z_β)·sd·√(1/n_A + 1/n_B) at
    * α = .05 / power = .80, and the CUPED-adjusted MDE scales by
    * √(1−ρ²) — the emitted pair is the business case for shipping the
    * covariate adjustment (same MDE at (1−ρ²)× the sample, or
    * √(1−ρ²)× the MDE at the same sample).
    *
    * Determinism: same guarded BIGINT sufficient statistics as
    * agg_cuped off the SAME shared user frame; z constants are
    * driver-side literals embedded identically in both engines; sd/√
    * touch irrationals only at the final projection (rounded 4dp);
    * one row out. */
  val powerMde: GraftQuery = GraftQuery(
    "agg_power_mde",
    (s, dir) => {
      import s.implicits._
      val zA = 1.959963984540054 // z_{0.975}
      val zB = 0.8416212335729143 // z_{0.80}
      val u = cupedUsers(s, dir)
        .withColumn("arm", pmod($"user_id", lit(2)))
      val agg = u.agg(
        sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n_b"),
        count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        max(abs($"x")).as("mx"), max(abs($"y")).as("my"))
      val nD = $"n".cast("double")
      val safe =
        (lit(2.0) * pow(nD, 2.0) * $"mx".cast("double") * $"my".cast("double") < 9.0e18) &&
        (lit(2.0) * pow(nD, 2.0) * pow($"mx".cast("double"), 2.0) < 9.0e18) &&
        (lit(2.0) * pow(nD, 2.0) * pow($"my".cast("double"), 2.0) < 9.0e18)
      val g = (c: org.apache.spark.sql.Column) => graft.GraftQuery.guarded(
        c, safe, "agg_power_mde: BIGINT sufficient statistics near " +
          "overflow — shift the folds to DECIMAL(38,0)")
      agg
        .withColumn("cxy", g($"n" * $"sxy" - $"sx" * $"sy"))
        .withColumn("vx", g($"n" * $"sxx" - $"sx" * $"sx"))
        .withColumn("vy", g($"n" * $"syy" - $"sy" * $"sy"))
        .withColumn("sd", sqrt($"vy".cast("double")
          / ($"n".cast("double") * ($"n" - 1L).cast("double"))))
        .withColumn("rho2", ($"cxy".cast("double") * $"cxy".cast("double"))
          / ($"vx".cast("double") * $"vy".cast("double")))
        .withColumn("mde", lit(zA + zB) * $"sd" *
          sqrt(lit(1.0) / $"n_a".cast("double") + lit(1.0) / $"n_b".cast("double")))
        .select($"n_a", $"n_b",
          round($"sd", 4).as("sd_y"),
          round($"mde", 4).as("mde_abs"),
          round($"mde" * sqrt(lit(1.0) - $"rho2"), 4).as("mde_cuped"),
          round($"mde" / ($"sy".cast("double") / $"n".cast("double")), 6)
            .as("mde_rel"))
    },
    Some(s"""WITH ev AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
            b AS (
              SELECT min(d) AS lo,
                     min(d) + CAST(CAST(datediff('day', min(d), max(d)) AS INT) // 2
                                   AS INT) AS mid
              FROM ev),
            u AS (
              SELECT user_id,
                     CAST(sum(CASE WHEN d <= (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN d > (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS y
              FROM ev GROUP BY user_id),
            p AS (
              SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                     CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                     count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM u),
            f AS (
              SELECT n_a, n_b, n, sy,
                     CAST(n * sxy - sx * sy AS BIGINT) AS cxy,
                     CAST(n * sxx - sx * sx AS BIGINT) AS vx,
                     CAST(n * syy - sy * sy AS BIGINT) AS vy
              FROM p),
            m AS (
              SELECT n_a, n_b, n, sy, cxy, vx, vy,
                     sqrt(CAST(vy AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd,
                     (CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE))
                       / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) AS rho2,
                     CAST(${1.959963984540054 + 0.8416212335729143} AS DOUBLE)
                       * sqrt(CAST(vy AS DOUBLE)
                              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                       * sqrt(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) AS mde
              FROM f)
            SELECT n_a, n_b,
                   (round(sd, 4) + 0.0) AS sd_y,
                   (round(mde, 4) + 0.0) AS mde_abs,
                   (round(mde * sqrt(1.0 - rho2), 4) + 0.0) AS mde_cuped,
                   (round(mde / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0) AS mde_rel
            FROM m""")
  )

  /** Sample-ratio-mismatch check — the experiment VALIDITY gate that
    * runs before any readout is believed: if the realized arm split
    * deviates from the designed 50/50 beyond chance, the assignment
    * (or logging) is broken and every downstream metric is biased —
    * SRM is the single most common way A/B systems silently rot. For
    * two equal-design cells the chi-square statistic collapses to
    * (n_A − n_B)²/(n_A + n_B), compared against the 1-df 95% critical
    * value as a shared literal. Exact integers end-to-end; one division
    * at the projection; one row out of the same shared user frame. */
  val srm: GraftQuery = GraftQuery(
    "agg_srm",
    (s, dir) => {
      import s.implicits._
      cupedUsers(s, dir)
        .withColumn("arm", pmod($"user_id", lit(2)))
        .agg(sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n_a"),
          sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2",
          (($"n_a" - $"n_b") * ($"n_a" - $"n_b")).cast("double")
            / ($"n_a" + $"n_b").cast("double"))
        .select($"n_a", $"n_b", round($"chi2", 6).as("chi2"),
          ($"chi2" > 3.841458820694124).as("srm_detected"))
    },
    Some("""WITH ev AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
            b AS (
              SELECT min(d) AS lo,
                     min(d) + CAST(CAST(datediff('day', min(d), max(d)) AS INT) // 2
                                   AS INT) AS mid
              FROM ev),
            u AS (
              SELECT user_id,
                     CAST(sum(CASE WHEN d <= (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN d > (SELECT mid FROM b) THEN c ELSE 0 END) AS BIGINT) AS y
              FROM ev GROUP BY user_id),
            p AS (
              SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                     CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
              FROM u)
            SELECT n_a, n_b,
                   (round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE), 6) + 0.0) AS chi2,
                   CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE) > 3.841458820694124 AS srm_detected
            FROM p""")
  )

  /** First-order Markov transition matrix over per-user event journeys —
    * the user-flow model behind funnel diagnostics, next-action
    * prediction baselines, and bot detection (a scraper's transition row
    * is a delta function; a human's is spread): for consecutive events
    * of the same user, count (from, to) type transitions and emit the
    * row-conditional probabilities.
    *
    * Exact: transition counts are integers off ONE per-user lag window
    * (partitioned by user — one shuffle; arrival order pinned by
    * (ts, event_id) so every lag is deterministic); probabilities are
    * single divisions of identical integers (row marginal via a window
    * over the ≤|types|² count table), rounded at the projection. At
    * 100 TB: one shuffle on user_id, one hash aggregate onto the
    * bounded type×type domain. */
  val markov: GraftQuery = GraftQuery(
    "agg_markov",
    (s, dir) => {
      // Two-level per-user windows (round-13 hot-key fix, see
      // ts_sessionize): the lag window partitions by (user_id, day) so a
      // degenerate bot user's history never funnels into one task's
      // sort; the one cross-day transition per active (user, day) —
      // previous day's last event type → this day's first — rides the
      // per-(user, day) boundary table, whose per-user window is
      // day-count-sized. day(ts) is monotone in ts, so the
      // decomposition reproduces the single-window pair stream exactly.
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type",
          to_date($"ts").as("b"))
      val wb = Window.partitionBy($"user_id", $"b").orderBy($"ts", $"event_id")
      val localPairs = ev
        .withColumn("src_type", lag($"event_type", 1).over(wb))
        .filter($"src_type".isNotNull)
        .select($"src_type", $"event_type".as("dst_type"))
      // One row per (user, day) via rn=1 on the SAME (user, day) sort —
      // no string min/max aggregate (the SortAggregate trap); the day's
      // last type rides a full-frame window over that sort.
      val bounds = ev
        .withColumn("rn", row_number().over(wb))
        .withColumn("last_type", last($"event_type").over(
          wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter($"rn" === 1)
        .select($"user_id", $"b", $"event_type".as("first_type"), $"last_type")
      val wu = Window.partitionBy($"user_id").orderBy($"b")
      val boundaryPairs = bounds
        .withColumn("src_type", lag($"last_type", 1).over(wu))
        .filter($"src_type".isNotNull)
        .select($"src_type", $"first_type".as("dst_type"))
      localPairs.unionByName(boundaryPairs)
        .groupBy($"src_type", $"dst_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round($"n".cast("double")
          / sum($"n").over(Window.partitionBy($"src_type")).cast("double"), 6))
        .orderBy($"src_type", $"dst_type")
    },
    Some("""WITH j AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS src_type
              FROM events),
            c AS (
              SELECT src_type, event_type AS dst_type, count(*) AS n
              FROM j WHERE src_type IS NOT NULL GROUP BY 1, 2)
            SELECT src_type, dst_type, n,
                   (round(CAST(n AS DOUBLE)
                         / CAST(sum(n) OVER (PARTITION BY src_type) AS DOUBLE), 6) + 0.0) AS p
            FROM c ORDER BY src_type, dst_type""")
  )

  /** Cohort LTV triangle — cumulative revenue per signup cohort by age:
    * THE growth-analytics readout ("is the March cohort monetizing
    * faster than January's at the same age?") that payback-period and
    * LTV/CAC decisions read off directly. Cohort = ISO week of each
    * user's first active day; age in weeks since that day; the triangle
    * is (cohort_week × age_week) with per-age and cumulative cents and
    * the per-user LTV.
    *
    * Exact: cents are BIGINT; the user's first day is one min-window
    * over the user partition (no second fact scan, no join back); the
    * cumulative is a partitioned window over the bounded
    * weeks×ages triangle; LTV = one division of identical integers per
    * cell (cohort sizes via an exact distinct count on the bounded
    * cohort domain). At 100 TB: one user-partitioned window pass + one
    * hash aggregate onto the triangle — nothing else sees the events
    * table. */
  val cohortLtv: GraftQuery = GraftQuery(
    "agg_cohort_ltv",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cents = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val w = Window.partitionBy($"user_id")
      // Two-level hot-key fix (round-13, see ts_sessionize): the per-user
      // min(d) window runs over the per-(user, day) DAILY table, not raw
      // events — the (user_id, d) hash aggregate's map-side combine
      // reduces a bot user to its active-day count before any shuffle,
      // so no task ever holds one user's raw history. BIGINT cent sums
      // are associative, so the daily pre-fold is exact.
      val ev = Tables.events(s, dir)
        .select($"user_id", to_date($"ts").as("d"), cents.as("c"))
        .groupBy($"user_id", $"d").agg(sum($"c").as("c"))
        .withColumn("f", min($"d").over(w))
        .withColumn("cohort_week", to_date(date_trunc("week", $"f")))
        .withColumn("age_week", expr("CAST(datediff(d, f) AS BIGINT) div 7"))
      val sizes = ev.groupBy($"cohort_week")
        .agg(count_distinct($"user_id").as("n_users"))
      val cum = Window.partitionBy($"cohort_week").orderBy($"age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.groupBy($"cohort_week", $"age_week")
        .agg(sum($"c").as("revenue_cents"))
        .withColumn("cum_revenue_cents", sum($"revenue_cents").over(cum))
        .join(broadcast(sizes), "cohort_week")
        .select($"cohort_week".cast("string").as("cohort_week"), $"age_week",
          $"n_users", $"revenue_cents", $"cum_revenue_cents",
          round($"cum_revenue_cents".cast("double")
            / $"n_users".cast("double"), 4).as("ltv_per_user_cents"))
        .orderBy($"cohort_week", $"age_week")
    },
    Some("""WITH ev AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
            fe AS (
              SELECT user_id, d, c,
                     min(d) OVER (PARTITION BY user_id) AS f
              FROM ev),
            ce AS (
              SELECT strftime(CAST(date_trunc('week', f) AS DATE), '%Y-%m-%d')
                       AS cohort_week,
                     CAST(datediff('day', f, d) AS BIGINT) // 7 AS age_week,
                     user_id, c
              FROM fe),
            sz AS (
              SELECT cohort_week, count(DISTINCT user_id) AS n_users
              FROM ce GROUP BY 1),
            tri AS (
              SELECT cohort_week, age_week,
                     CAST(sum(c) AS BIGINT) AS revenue_cents
              FROM ce GROUP BY 1, 2),
            cm AS (
              SELECT cohort_week, age_week, revenue_cents,
                     CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
                       ORDER BY age_week
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_revenue_cents
              FROM tri)
            SELECT cm.cohort_week, cm.age_week, sz.n_users,
                   cm.revenue_cents, cm.cum_revenue_cents,
                   (round(CAST(cm.cum_revenue_cents AS DOUBLE)
                         / CAST(sz.n_users AS DOUBLE), 4) + 0.0) AS ltv_per_user_cents
            FROM cm JOIN sz USING (cohort_week)
            ORDER BY cohort_week, age_week""")
  )

  /** Kaplan–Meier survival over user lifetimes — the churn readout a
    * subscription/engagement team reads first: per lifetime-day t, who is
    * still at risk, who churned, who is censored, the product-limit
    * survival S(t), the Nelson–Aalen cumulative hazard H(t), and the
    * Greenwood standard error. Lifetime = days between a user's first and
    * last event; a user is CHURNED if their last event is >7 days before
    * the corpus max day, CENSORED otherwise (still alive at the data
    * edge — exactly the right-censoring the estimator exists for).
    *
    * Determinism — the agg_chisq integerized-cumsum device: d_t and n_t
    * are exact BIGINTs, each per-row term (ln((n−d)/n), d/n,
    * d/(n(n−d))) is therefore the identical double in both engines, and
    * every CUMULATIVE fold sums floor(term·1e12) in BIGINT (bias ≤
    * rows·1e-12, shared by both engines) — never a windowed double sum
    * (DuckDB's segment-tree association would diverge). S(t) =
    * exp(cum/1e12) (the classifier's cross-engine-exp precedent); once a
    * row has d = n the survival is pinned to exactly 0 from that t on
    * (the ln(0) row contributes 0 to the fold and a cumulative dead
    * flag takes over).
    *
    * Scale shape: one user-level aggregate (the only pass over the fact
    * table), one hash aggregate onto the bounded lifetime-day domain,
    * and unpartitioned windows over that DOMAIN (≤ calendar days rows —
    * PlanAudit-allowlisted). */
  /** The estimator fold over a per-user (fd, ld) span frame — shared by
    * the batch query and the streaming twin (stream_survival_km merges
    * per-wave min/max span partials into the same frame; min and max are
    * associative and commutative, so ANY arrival split serves identical
    * curves). The corpus edge dmax re-derives from the spans themselves
    * (max ld), so no second fact pass exists anywhere. */
  private[graft] def survivalFold(perUser: DataFrame): DataFrame = {
    val s = perUser.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    {
      // One materialization: the span frame feeds BOTH the censor-edge
      // aggregate and the duration projection — without the cut the
      // upstream fact aggregate would run twice.
      val pu = GraftQuery.cutStats(perUser)
      val dm = pu.agg(max($"ld").as("dmax"))
      val users = pu
        .crossJoin(broadcast(dm))
        .select(datediff($"ld", $"fd").cast("long").as("t"),
          when(datediff($"dmax", $"ld") > 7, 1L).otherwise(0L).as("churn"))
      val byT = users.groupBy($"t")
        .agg(sum($"churn").as("d_n"), sum(lit(1L) - $"churn").as("c_n"))
      val tot = byT.agg(sum($"d_n" + $"c_n").as("n_total"))
      val w = Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, 0)
      val wp = Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, -1)
      byT.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          $"n_total" - coalesce(sum($"d_n" + $"c_n").over(wp), lit(0L)))
        .withColumn("lnterm", when($"d_n" < $"n_risk",
          floor(log(($"n_risk" - $"d_n").cast("double")
            / $"n_risk".cast("double")) * lit(1e12))).otherwise(lit(0L)))
        .withColumn("nat",
          floor($"d_n".cast("double") / $"n_risk".cast("double") * lit(1e12)))
        .withColumn("gwt", when($"d_n" < $"n_risk",
          floor($"d_n".cast("double") / ($"n_risk".cast("double")
            * ($"n_risk" - $"d_n").cast("double")) * lit(1e12))).otherwise(lit(0L)))
        .withColumn("deadrow", when($"d_n" >= $"n_risk", 1).otherwise(0))
        .withColumn("cumln", sum($"lnterm").over(w))
        .withColumn("na_c", sum($"nat").over(w))
        .withColumn("gw_c", sum($"gwt").over(w))
        .withColumn("dead", max($"deadrow").over(w))
        .select($"t", $"n_risk",
          $"d_n".as("n_churned"), $"c_n".as("n_censored"),
          when($"dead" === 1, lit(0.0))
            .otherwise(round(exp($"cumln".cast("double") / lit(1e12)), 6)).as("s_km"),
          round($"na_c".cast("double") / lit(1e12), 6).as("h_na"),
          when($"dead" === 1, lit(0.0))
            .otherwise(round(exp($"cumln".cast("double") / lit(1e12))
              * sqrt($"gw_c".cast("double") / lit(1e12)), 6)).as("se_km"))
        .orderBy($"t")
    }
  }

  val survivalKm: GraftQuery = GraftQuery(
    "agg_survival_km",
    (s, dir) => {
      import s.implicits._
      survivalFold(Tables.events(s, dir)
        .select($"user_id", to_date($"ts").as("dd"))
        .groupBy($"user_id")
        .agg(min($"dd").as("fd"), max($"dd").as("ld")))
    },
    Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS dd
                        FROM events),
            dm AS (SELECT max(dd) AS dmax FROM ev),
            u AS (SELECT user_id, min(dd) AS fd, max(dd) AS ld FROM ev GROUP BY 1),
            uu AS (SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t,
                          CASE WHEN date_diff('day', ld, (SELECT dmax FROM dm)) > 7
                               THEN 1 ELSE 0 END AS churn
                   FROM u),
            bt AS (SELECT t, CAST(sum(churn) AS BIGINT) AS d_n,
                          CAST(sum(1 - churn) AS BIGINT) AS c_n
                   FROM uu GROUP BY 1),
            tot AS (SELECT CAST(sum(d_n + c_n) AS BIGINT) AS n_total FROM bt),
            r AS (SELECT t, d_n, c_n,
                         (SELECT n_total FROM tot)
                           - CAST(coalesce(sum(d_n + c_n) OVER
                               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
                  FROM bt),
            k AS (SELECT *,
                         CASE WHEN d_n < n_risk
                              THEN CAST(floor(ln(CAST(n_risk - d_n AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE)) * 1e12) AS BIGINT)
                              ELSE 0 END AS lnterm,
                         CAST(floor(CAST(d_n AS DOUBLE) / CAST(n_risk AS DOUBLE)
                              * 1e12) AS BIGINT) AS nat,
                         CASE WHEN d_n < n_risk
                              THEN CAST(floor(CAST(d_n AS DOUBLE)
                                   / (CAST(n_risk AS DOUBLE)
                                      * CAST(n_risk - d_n AS DOUBLE)) * 1e12) AS BIGINT)
                              ELSE 0 END AS gwt,
                         CASE WHEN d_n >= n_risk THEN 1 ELSE 0 END AS deadrow
                  FROM r),
            c AS (SELECT t, n_risk, d_n, c_n,
                         CAST(sum(lnterm) OVER w AS BIGINT) AS cumln,
                         CAST(sum(nat) OVER w AS BIGINT) AS na_c,
                         CAST(sum(gwt) OVER w AS BIGINT) AS gw_c,
                         max(deadrow) OVER w AS dead
                  FROM k
                  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW))
            SELECT t, n_risk, d_n AS n_churned, c_n AS n_censored,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE round(exp(CAST(cumln AS DOUBLE) / 1e12), 6) END AS s_km,
                   (round(CAST(na_c AS DOUBLE) / 1e12, 6) + 0.0) AS h_na,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE round(exp(CAST(cumln AS DOUBLE) / 1e12)
                             * sqrt(CAST(gw_c AS DOUBLE) / 1e12), 6) END AS se_km
            FROM c ORDER BY t""")
  )

  /** Theil inequality indices (T and L) of customer spend per market
    * segment — the decomposable complement to agg_gini: T weights by
    * income share (top-sensitive), L is the mean log deviation
    * (bottom-sensitive); together they say WHERE the inequality lives.
    *
    * Determinism: per-customer spend x is exact BIGINT cents; the share
    * ratio r = x·n/Σx is a double OF exact ints (the product computed in
    * double so it can never wrap), so each r·ln r / ln(1/r) term is the
    * identical double in both engines; the per-segment sums fold
    * floor(term·1e9) in BIGINT (the chisq device — unordered double
    * sums would diverge), overflow-gated off the same aggregate row.
    *
    * Scale shape: one orders-scan aggregate to the customer frame, a
    * broadcast of the ≤|segments| stats rows back onto it, one final
    * hash aggregate onto the 5 segments. */
  val theil: GraftQuery = GraftQuery(
    "agg_theil",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"c_custkey")
        .agg(expr("sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))").as("x"))
      val segs = cust.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      cust.join(broadcast(segs), "c_mktsegment")
        .withColumn("r", $"x".cast("double") * $"n".cast("double")
          / $"sx".cast("double"))
        .withColumn("tt", floor($"r" * log($"r") * lit(1e9)))
        .withColumn("tl", floor(-log($"r") * lit(1e9)))
        .groupBy($"c_mktsegment", $"n", $"sx")
        .agg(
          GraftQuery.guarded(sum($"tt"),
            count(lit(1)).cast("double") * greatest(abs(max($"tt")), abs(min($"tt")))
              .cast("double") < lit(9e18),
            "agg_theil: scaled r*ln(r) fold past BIGINT headroom \u2014 " +
              "lower the 1e9 scale").as("stt"),
          GraftQuery.guarded(sum($"tl"),
            count(lit(1)).cast("double") * greatest(abs(max($"tl")), abs(min($"tl")))
              .cast("double") < lit(9e18),
            "agg_theil: scaled ln fold past BIGINT headroom \u2014 " +
              "lower the 1e9 scale").as("stl"))
        .select($"c_mktsegment", $"n".as("n_customers"),
          round($"sx".cast("double") / $"n".cast("double"), 4).as("mean_cents"),
          round($"stt".cast("double") / ($"n".cast("double") * lit(1e9)), 6).as("theil_t"),
          round($"stl".cast("double") / ($"n".cast("double") * lit(1e9)), 6).as("theil_l"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH cu AS (
              SELECT c_mktsegment, o_custkey,
                     CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS x
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2),
            sg AS (SELECT c_mktsegment, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx
                   FROM cu GROUP BY 1),
            t AS (SELECT cu.c_mktsegment, sg.n, sg.sx,
                         CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE) AS r
                  FROM cu JOIN sg USING (c_mktsegment)),
            f AS (SELECT c_mktsegment, n, sx,
                         CAST(floor(r * ln(r) * 1e9) AS BIGINT) AS tt,
                         CAST(floor(-ln(r) * 1e9) AS BIGINT) AS tl
                  FROM t)
            SELECT c_mktsegment, n AS n_customers,
                   (round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0) AS mean_cents,
                   (round(CAST(sum(tt) AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9), 6) + 0.0) AS theil_t,
                   (round(CAST(sum(tl) AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9), 6) + 0.0) AS theil_l
            FROM f GROUP BY c_mktsegment, n, sx ORDER BY c_mktsegment""")
  )

  /** Log-log price elasticity of demand per part brand — the economics
    * readout behind every pricing decision: the OLS slope of ln(quantity)
    * on ln(price) across a brand's order lines (slope ≈ % quantity change
    * per % price change), with R² for how much the line explains.
    *
    * Determinism: price and quantity land as exact BIGINT cents, so each
    * ln is the identical double in both engines and each second-moment
    * term (lx², lx·ly, ly²) is too; the five sufficient-statistic sums
    * fold floor(term·1e8) in BIGINT (chisq device, overflow-gated);
    * slope/intercept/R² are then a fixed scalar chain over exact ints.
    *
    * Scale shape: one broadcast dim join (part), one hash aggregate onto
    * the ≤25-brand domain — map-side partials reduce every partition to
    * ≤ brands rows. */
  val elasticity: GraftQuery = GraftQuery(
    "agg_elasticity",
    (s, dir) => {
      import s.implicits._
      val rows = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .select($"p_brand",
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("pc"),
          expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("qc"))
        .withColumn("lx", log($"pc".cast("double")))
        .withColumn("ly", log($"qc".cast("double")))
      def g(c: Column, tag: String): Column = GraftQuery.guarded(sum(c),
        count(lit(1)).cast("double") * lit(2.5e10) < lit(9e18),
        s"agg_elasticity: $tag fold past BIGINT headroom \u2014 lower the 1e8 scale")
      rows.groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          g(floor($"lx" * lit(1e8)), "Sx").as("sx"),
          g(floor($"ly" * lit(1e8)), "Sy").as("sy"),
          g(floor($"lx" * $"lx" * lit(1e8)), "Sxx").as("sxx"),
          g(floor($"lx" * $"ly" * lit(1e8)), "Sxy").as("sxy"),
          g(floor($"ly" * $"ly" * lit(1e8)), "Syy").as("syy"))
        .select($"p_brand", $"n",
          round((($"n".cast("double") * $"sxy".cast("double") * lit(1e8)
            - $"sx".cast("double") * $"sy".cast("double"))
            / ($"n".cast("double") * $"sxx".cast("double") * lit(1e8)
              - $"sx".cast("double") * $"sx".cast("double"))), 4).as("elasticity"),
          round(
            pow($"n".cast("double") * $"sxy".cast("double") * lit(1e8)
              - $"sx".cast("double") * $"sy".cast("double"), 2.0)
            / (($"n".cast("double") * $"sxx".cast("double") * lit(1e8)
               - $"sx".cast("double") * $"sx".cast("double"))
              * ($"n".cast("double") * $"syy".cast("double") * lit(1e8)
                - $"sy".cast("double") * $"sy".cast("double"))), 4).as("r2"))
        .orderBy($"p_brand")
    },
    Some("""WITH r AS (
              SELECT p_brand,
                     ln(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DOUBLE)) AS lx,
                     ln(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DOUBLE)) AS ly
              FROM lineitem JOIN part ON l_partkey = p_partkey),
            a AS (SELECT p_brand, count(*) AS n,
                         CAST(sum(CAST(floor(lx * 1e8) AS BIGINT)) AS BIGINT) AS sx,
                         CAST(sum(CAST(floor(ly * 1e8) AS BIGINT)) AS BIGINT) AS sy,
                         CAST(sum(CAST(floor(lx * lx * 1e8) AS BIGINT)) AS BIGINT) AS sxx,
                         CAST(sum(CAST(floor(lx * ly * 1e8) AS BIGINT)) AS BIGINT) AS sxy,
                         CAST(sum(CAST(floor(ly * ly * 1e8) AS BIGINT)) AS BIGINT) AS syy
                  FROM r GROUP BY 1)
            SELECT p_brand, n,
                   (round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1e8
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1e8
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) + 0.0) AS elasticity,
                   (round(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1e8
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2.0)
                         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1e8
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) * 1e8
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0) AS r2
            FROM a ORDER BY p_brand""")
  )

  /** Winsorized and trimmed means per event type — the robust-mean pair
    * every metrics platform reports next to the raw mean (one whale
    * purchase should not move the KPI): values clamped to [p05, p95]
    * (winsorized) and values outside it dropped (trimmed).
    *
    * Determinism: the cutoffs are percentile_cont over exact-cents
    * doubles (the agg_percentile green precedent — identical
    * interpolation in both engines); every row's clamped value is then
    * the identical double, and the winsorized sum folds
    * floor(clamped·1e6) in BIGINT (chisq device, gated) while raw and
    * trimmed sums stay pure BIGINT. Membership tests compare UNROUNDED
    * doubles (gopher rule).
    *
    * Scale shape: one aggregate for the cutoffs (bounded |types| rows,
    * broadcast back), one final hash aggregate — two fact passes total,
    * the textbook two-pass robust-mean plan. */
  val winsorized: GraftQuery = GraftQuery(
    "agg_winsorized",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val cuts = ev.groupBy($"event_type").agg(
        expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY CAST(c AS DOUBLE))").as("p05"),
        expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY CAST(c AS DOUBLE))").as("p95"))
      ev.join(broadcast(cuts), "event_type")
        .withColumn("cw", least(greatest($"c".cast("double"), $"p05"), $"p95"))
        .withColumn("keep",
          $"c".cast("double") >= $"p05" && $"c".cast("double") <= $"p95")
        .groupBy($"event_type", $"p05", $"p95")
        .agg(count(lit(1)).as("n"), sum($"c").as("sraw"),
          GraftQuery.guarded(sum(floor($"cw" * lit(1e6))),
            count(lit(1)).cast("double") * (greatest(abs(max($"c")), abs(min($"c")))
              .cast("double") * lit(1e6) + lit(1.0)) < lit(9e18),
            "agg_winsorized: scaled winsorized fold past BIGINT headroom " +
              "\u2014 lower the 1e6 scale").as("sw"),
          sum(when($"keep", $"c").otherwise(lit(0L))).as("strim"),
          sum(when($"keep", 1L).otherwise(0L)).as("ntrim"))
        .select($"event_type", $"n",
          round($"p05", 4).as("p05"), round($"p95", 4).as("p95"),
          round($"sraw".cast("double") / $"n".cast("double"), 4).as("mean_raw"),
          round($"sw".cast("double") / ($"n".cast("double") * lit(1e6)), 4)
            .as("mean_winsor"),
          round($"strim".cast("double") / $"ntrim".cast("double"), 4)
            .as("mean_trim"),
          ($"n" - $"ntrim").as("n_clipped"))
        .orderBy($"event_type")
    },
    Some("""WITH ev AS (SELECT event_type,
                               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
                        FROM events),
            cuts AS (SELECT event_type,
                            percentile_cont(0.05) WITHIN GROUP
                              (ORDER BY CAST(c AS DOUBLE)) AS p05,
                            percentile_cont(0.95) WITHIN GROUP
                              (ORDER BY CAST(c AS DOUBLE)) AS p95
                     FROM ev GROUP BY 1),
            j AS (SELECT ev.event_type, c, p05, p95,
                         least(greatest(CAST(c AS DOUBLE), p05), p95) AS cw,
                         CAST(c AS DOUBLE) >= p05 AND CAST(c AS DOUBLE) <= p95 AS keep
                  FROM ev JOIN cuts USING (event_type))
            SELECT event_type, count(*) AS n,
                   (round(p05, 4) + 0.0) AS p05, (round(p95, 4) + 0.0) AS p95,
                   (round(CAST(sum(c) AS DOUBLE) / count(*), 4) + 0.0) AS mean_raw,
                   (round(CAST(sum(CAST(floor(cw * 1e6) AS BIGINT)) AS DOUBLE)
                         / (count(*) * 1e6), 4) + 0.0) AS mean_winsor,
                   (round(CAST(sum(CASE WHEN keep THEN c ELSE 0 END) AS DOUBLE)
                         / sum(CASE WHEN keep THEN 1 ELSE 0 END), 4) + 0.0) AS mean_trim,
                   CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_clipped
            FROM j GROUP BY event_type, p05, p95 ORDER BY event_type""")
  )

  /** Lorenz curve by revenue decile — the concentration readout behind
    * agg_gini drawn as the table analysts actually use ("the top decile
    * holds X% of revenue"): customers ranked by total spend, cut into
    * SQL-standard deciles, each decile's revenue share and the cumulative
    * share (the curve's y-values at x = 0.1 … 1.0).
    *
    * The scale point (the agg_rfm discipline): the global rank over the
    * corpus-growing customer domain runs through the factored
    * twoLevelRank device (range-partition → bucket-count prefix →
    * within-bucket row_number — no ntile(), no one-task sort); the
    * decile is then the exact ntile-distribution integer formula of
    * (rank, n), guarded on n ≥ 10. Everything after the rank is exact
    * BIGINT cents; shares are ratios of exact ints, double only at the
    * rounded projection. The only unpartitioned window is the cumulative
    * fold over the 10 DECILE rows (PlanAudit-allowlisted).
    *
    * Scale shape: one orders-scan aggregate to the customer frame, one
    * range exchange for the rank, one hash aggregate onto 10 cells. */
  val lorenz: GraftQuery = GraftQuery(
    "agg_lorenz",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cust = GraftQuery.cutStats(Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(expr("sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))").as("x")))
      val tot = cust.agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      val ranked = Windows.twoLevelRank(cust, Seq($"x".asc, $"o_custkey".asc), "r")
      val w = Window.orderBy($"decile").rowsBetween(Window.unboundedPreceding, 0)
      ranked.crossJoin(broadcast(tot))
        .withColumn("q", GraftQuery.guarded(expr("n div 10"), expr("n >= 10"),
          "agg_lorenz: decile curve requires n >= 10 customers \u2014 " +
            "gather more customers or drop to coarser tiles"))
        .withColumn("m", expr("n % 10"))
        .withColumn("decile", expr(
          """CASE WHEN r <= (q + 1) * m THEN (r - 1) div (q + 1) + 1
                  ELSE m + (r - (q + 1) * m - 1) div q + 1 END"""))
        .groupBy($"decile", $"sx")
        .agg(count(lit(1)).as("n_users"), sum($"x").as("decile_cents"))
        .withColumn("cum_cents", sum($"decile_cents").over(w))
        .select($"decile", $"n_users", $"decile_cents",
          round($"decile_cents".cast("double") / $"sx".cast("double"), 6).as("share"),
          round($"cum_cents".cast("double") / $"sx".cast("double"), 6).as("cum_share"))
        .orderBy($"decile")
    },
    Some("""WITH cu AS (
              SELECT o_custkey,
                     CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS x
              FROM orders GROUP BY 1),
            t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM cu),
            r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS r,
                         t.n, t.sx, t.n // 10 AS q, t.n % 10 AS m
                  FROM cu CROSS JOIN t),
            d AS (SELECT x, sx,
                         CASE WHEN r <= (q + 1) * m THEN (r - 1) // (q + 1) + 1
                              ELSE m + (r - (q + 1) * m - 1) // q + 1 END AS decile
                  FROM r),
            g AS (SELECT decile, sx, count(*) AS n_users,
                         CAST(sum(x) AS BIGINT) AS decile_cents
                  FROM d GROUP BY 1, 2)
            SELECT decile, n_users, decile_cents,
                   (round(CAST(decile_cents AS DOUBLE) / CAST(sx AS DOUBLE), 6) + 0.0) AS share,
                   (round(CAST(CAST(sum(decile_cents) OVER
                       (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS DOUBLE)
                     / CAST(sx AS DOUBLE), 6) + 0.0) AS cum_share
            FROM g ORDER BY decile""")
  )

  /** Market-basket association rules over daily event baskets — which
    * event types co-occur in a user's day, as support / confidence /
    * lift for every ordered type pair (the recommender-warmup and
    * behavioral-affinity readout: "users who error today also churn
    * today", lift >> 1).
    *
    * Scale shape: basket = (user_id, day); the item domain is the FIXED
    * event-type set, so the distinct frame carries ≤ |types| rows per
    * basket and the self-join on the basket key fans out ≤ |types|² per
    * basket — bucketed-not-all-pairs by construction (the Dedup
    * discipline). One distinct aggregate, one shuffle-hash self-join on
    * the basket key (the non-equi type≠type rides as a join residual),
    * two bounded-domain aggregates. All metrics are ratios of exact
    * BIGINT counts.
    *
    * At 100 TB: the distinct frame is the only fact-sized structure; the
    * pair table is ≤ 25 rows regardless of corpus size. */
  /** The rule fold over a DISTINCT (user_id, d, event_type) basket-item
    * frame — shared by the batch query and the streaming twin
    * (stream_assoc_rules merges per-wave distinct partials into the same
    * frame; set union is associative and idempotent, so ANY arrival
    * split serves identical rules). Expects the caller to have
    * lineage-cut the frame (it is read four ways). */
  private[graft] def assocFold(b: DataFrame): DataFrame = {
    val s = b.sparkSession
    import s.implicits._
    {
      val nb = b.select($"user_id", $"d").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val singles = b.groupBy($"event_type").agg(count(lit(1)).as("cnt"))
      val pairs = b.as("l")
        .join(b.as("r").hint("shuffle_hash"),
          col("l.user_id") === col("r.user_id") && col("l.d") === col("r.d") &&
            col("l.event_type") =!= col("r.event_type"))
        .groupBy(col("l.event_type").as("antecedent"),
          col("r.event_type").as("consequent"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(singles.select($"event_type".as("antecedent"),
          $"cnt".as("n_a"))), "antecedent")
        .join(broadcast(singles.select($"event_type".as("consequent"),
          $"cnt".as("n_c"))), "consequent")
        .crossJoin(broadcast(nb))
        .select($"antecedent", $"consequent", $"n_ab", $"n_a", $"n_c", $"n_baskets",
          round($"n_ab".cast("double") / $"n_baskets".cast("double"), 6).as("support"),
          round($"n_ab".cast("double") / $"n_a".cast("double"), 6).as("confidence"),
          round($"n_ab".cast("double") * $"n_baskets".cast("double")
            / ($"n_a".cast("double") * $"n_c".cast("double")), 6).as("lift"))
        .orderBy($"antecedent", $"consequent")
    }
  }

  val assocRules: GraftQuery = GraftQuery(
    "agg_assoc_rules",
    (s, dir) => {
      import s.implicits._
      assocFold(Tables.events(s, dir)
        .select($"user_id", to_date($"ts").as("d"), $"event_type")
        .distinct()
        .localCheckpoint()) // four consumers: baskets, singles, both join sides
    },
    Some("""WITH b AS (SELECT DISTINCT user_id,
                              CAST(date_trunc('day', ts) AS DATE) AS d,
                              event_type
                       FROM events),
            nb AS (SELECT count(*) AS n_baskets
                   FROM (SELECT DISTINCT user_id, d FROM b)),
            s AS (SELECT event_type, count(*) AS cnt FROM b GROUP BY 1),
            p AS (SELECT l.event_type AS antecedent, r.event_type AS consequent,
                         count(*) AS n_ab
                  FROM b l JOIN b r
                    ON l.user_id = r.user_id AND l.d = r.d
                   AND l.event_type <> r.event_type
                  GROUP BY 1, 2)
            SELECT antecedent, consequent, n_ab,
                   sa.cnt AS n_a, sc.cnt AS n_c, nb.n_baskets,
                   (round(CAST(n_ab AS DOUBLE) / nb.n_baskets, 6) + 0.0) AS support,
                   (round(CAST(n_ab AS DOUBLE) / sa.cnt, 6) + 0.0) AS confidence,
                   (round(CAST(n_ab AS DOUBLE) * nb.n_baskets
                         / (CAST(sa.cnt AS DOUBLE) * sc.cnt), 6) + 0.0) AS lift
            FROM p JOIN s sa ON sa.event_type = p.antecedent
                   JOIN s sc ON sc.event_type = p.consequent
                   CROSS JOIN nb
            ORDER BY antecedent, consequent""")
  )

  /** Standardized effect sizes for the view-vs-purchase value gap — the
    * numbers a readout should lead with BEFORE any p-value (agg_ttest
    * says "is it real", this says "is it big"): Cohen's d, the
    * small-sample Hedges' g correction, and the common-language effect
    * size CLES = P(purchase > view) + ½P(tie) — which is exactly the
    * Mann–Whitney U normalized, so it rides the agg_mannwhitney
    * tie-span device unchanged.
    *
    * Determinism: moments are (n, Σ, Σ²) exact BIGINT folds (gated);
    * the rank side aggregates onto the bounded distinct-cents domain
    * with integer tie spans; d/g/CLES are fixed scalar chains over
    * exact ints. The U-side frame is lineage-cut (mannwhitney
    * convention) so its domain window never reappears downstream.
    *
    * Scale shape: two bounded aggregates off one fact scan (a 1-row
    * moments frame and a distinct-cents-domain rank frame), one 1-row
    * readout. */
  /** The effect-size fold over a (cv, c1, c2) distinct-cents count frame
    * — shared by the batch query and the streaming twin
    * (stream_effect_size merges per-wave integer count partials into the
    * same frame; counts are exactly mergeable under any arrival split,
    * so the served d/g/CLES are bit-equal to batch). */
  private[graft] def effectFold(countsIn: DataFrame): DataFrame = {
    val s = countsIn.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    {
      val counts = countsIn.withColumn("t", $"c1" + $"c2")
      val w = Window.orderBy($"cv").rowsBetween(Window.unboundedPreceding, 0)
      val ranked = counts
        .withColumn("hi", sum($"t").over(w))
        .withColumn("lo", $"hi" - $"t" + 1)
        .localCheckpoint()
      def qGuard(c: Column) = GraftQuery.guarded(sum(c),
        sum($"t").cast("double") * max(abs($"cv")).cast("double")
          * max(abs($"cv")).cast("double") < lit(9e18),
        "agg_effect_size: \u03a3c\u00b2 fold past BIGINT headroom \u2014 "
          + "rescale to a coarser unit")
      val u = ranked.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          GraftQuery.guarded(sum($"c1" * ($"lo" + $"hi")),
            lit(2.0) * sum($"c1").cast("double") * sum($"c2").cast("double")
              < lit(9e18),
            "agg_effect_size: U fold past BIGINT headroom (2*n1*n2 >= 9e18)"
              + " \u2014 evaluate on a hash sample").as("r1_x2"),
          sum($"c1" * $"cv").as("s1x"),
          sum($"c2" * $"cv").as("s2x"),
          qGuard($"c1" * $"cv" * $"cv").as("q1x"),
          qGuard($"c2" * $"cv" * $"cv").as("q2x"))
        // 2U1 = 2R1 − n1(n1+1); r1_x2 is 2R1 (tie spans contribute lo+hi)
        .withColumn("u1_x2", $"r1_x2" - $"n1" * ($"n1" + 1L))
      u.select($"n1", $"n2",
          (($"n1" * $"q1x" - $"s1x" * $"s1x").cast("double")
            / ($"n1".cast("double") * ($"n1" - 1L).cast("double"))).as("v1"),
          (($"n2" * $"q2x" - $"s2x" * $"s2x").cast("double")
            / ($"n2".cast("double") * ($"n2" - 1L).cast("double"))).as("v2"),
          ($"s1x".cast("double") / $"n1".cast("double")
            - $"s2x".cast("double") / $"n2".cast("double")).as("md"),
          ($"u1_x2".cast("double")
            / (lit(2.0) * $"n1".cast("double") * $"n2".cast("double"))).as("cles"))
        .withColumn("sp", sqrt((($"n1" - 1L).cast("double") * $"v1"
          + ($"n2" - 1L).cast("double") * $"v2")
          / ($"n1" + $"n2" - 2L).cast("double")))
        .select($"n1", $"n2",
          round($"md" / $"sp", 6).as("cohen_d"),
          round($"md" / $"sp" * (lit(1.0) - lit(3.0)
            / (lit(4.0) * ($"n1" + $"n2").cast("double") - lit(9.0))), 6)
            .as("hedges_g"),
          round($"cles", 6).as("cles"))
    }
  }

  val effectSize: GraftQuery = GraftQuery(
    "agg_effect_size",
    (s, dir) => {
      import s.implicits._
      effectFold(Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select($"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
        .groupBy($"cv")
        .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c1"),
          sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c2")))
    },
    Some("""WITH ev AS (
              SELECT event_type,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv
              FROM events WHERE event_type IN ('view', 'purchase')),
            c AS (SELECT cv,
                         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
                  FROM ev GROUP BY 1),
            r AS (SELECT cv, c1, c2, c1 + c2 AS t,
                         sum(c1 + c2) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS hi,
                         sum(c1 + c2) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - (c1 + c2) + 1 AS lo
                  FROM c),
            a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                         CAST(sum(c2) AS BIGINT) AS n2,
                         CAST(sum(c1 * (lo + hi)) AS BIGINT) AS r1_x2,
                         CAST(sum(c1 * cv) AS BIGINT) AS s1x,
                         CAST(sum(c2 * cv) AS BIGINT) AS s2x,
                         CAST(sum(c1 * cv * cv) AS BIGINT) AS q1x,
                         CAST(sum(c2 * cv * cv) AS BIGINT) AS q2x
                  FROM r),
            m AS (SELECT n1, n2,
                         CAST(n1 * q1x - s1x * s1x AS DOUBLE)
                           / (CAST(n1 AS DOUBLE) * (n1 - 1)) AS v1,
                         CAST(n2 * q2x - s2x * s2x AS DOUBLE)
                           / (CAST(n2 AS DOUBLE) * (n2 - 1)) AS v2,
                         CAST(s1x AS DOUBLE) / n1 - CAST(s2x AS DOUBLE) / n2 AS md,
                         CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                           / (2.0 * n1 * n2) AS cles
                  FROM a),
            f AS (SELECT n1, n2, md, cles,
                         sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                              / CAST(n1 + n2 - 2 AS DOUBLE)) AS sp
                  FROM m)
            SELECT n1, n2,
                   (round(md / sp, 6) + 0.0) AS cohen_d,
                   (round(md / sp * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0)
                     AS hedges_g,
                   (round(cles, 6) + 0.0) AS cles
            FROM f""")
  )

  /** Laspeyres / Paasche / Fisher price indices by ship year over the
    * matched part basket — the canonical "how much did prices move,
    * holding the basket fixed" economics readout (Laspeyres weights by
    * base-year quantities, Paasche by current-year, Fisher is their
    * geometric mean — the superlative index national statistics use).
    * Base = the earliest ship year; only parts traded in BOTH years
    * enter a year's index (the matched-basket rule).
    *
    * Determinism: per-(part, year) revenue and quantity land as exact
    * BIGINT cents, so each unit price p = rev/qty and each p·q term is
    * the identical double in both engines; the four basket sums fold
    * floor(term·1e2) in BIGINT (gated — past the headroom the query
    * RAISES rather than wraps).
    *
    * Scale shape: one hash aggregate onto the (part, year) domain, a
    * self-join of base-year rows onto current-year rows keyed by part
    * (shuffle-hash — both sides catalog-sized), one bounded per-year
    * fold. */
  /** The index fold over a (pk, yr, rev, qty) part-year frame — shared
    * by the batch query and the streaming twin (stream_price_index
    * merges per-wave revenue/quantity sum partials into the same frame;
    * sums are exactly mergeable, so the served indices are bit-equal to
    * batch). Expects a lineage-cut frame (read by both slices). */
  private[graft] def priceFold(py: DataFrame): DataFrame = {
    val s = py.sparkSession
    import s.implicits._
    {
      val y0 = py.agg(min($"yr").as("y0"))
      val base = py.join(broadcast(y0), $"yr" === $"y0")
        .select($"pk", ($"rev".cast("double") / $"qty".cast("double")).as("p0"),
          ($"qty".cast("double") / lit(100.0)).as("q0"))
      val cur = py.join(broadcast(y0), $"yr" =!= $"y0")
        .select($"pk", $"yr",
          ($"rev".cast("double") / $"qty".cast("double")).as("p1"),
          ($"qty".cast("double") / lit(100.0)).as("q1"))
      def fold(term: Column, tag: String): Column = GraftQuery.guarded(
        sum(floor(term * lit(100.0))),
        count(lit(1)).cast("double") * max(abs(term)).cast("double") * lit(100.0)
          + count(lit(1)).cast("double") < lit(9e18),
        s"agg_price_index: $tag basket fold past BIGINT headroom \u2014 "
          + "lower the 1e2 scale")
      cur.join(base.hint("shuffle_hash"), "pk")
        .groupBy($"yr")
        .agg(count(lit(1)).as("n_parts"),
          fold($"p1" * $"q0", "\u03a3p1q0").as("l_num"),
          fold($"p0" * $"q0", "\u03a3p0q0").as("l_den"),
          fold($"p1" * $"q1", "\u03a3p1q1").as("p_num"),
          fold($"p0" * $"q1", "\u03a3p0q1").as("p_den"))
        .select($"yr", $"n_parts",
          round($"l_num".cast("double") / $"l_den".cast("double"), 6)
            .as("laspeyres"),
          round($"p_num".cast("double") / $"p_den".cast("double"), 6)
            .as("paasche"),
          round(sqrt(($"l_num".cast("double") / $"l_den".cast("double"))
            * ($"p_num".cast("double") / $"p_den".cast("double"))), 6)
            .as("fisher"))
        .orderBy($"yr")
    }
  }

  val priceIndex: GraftQuery = GraftQuery(
    "agg_price_index",
    (s, dir) => {
      import s.implicits._
      priceFold(Tables.lineitem(s, dir)
        .groupBy($"l_partkey".as("pk"), year($"l_shipdate").as("yr"))
        .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))").as("rev"),
          expr("sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))").as("qty"))
        .localCheckpoint()) // base slice and current slice both read it
    },
    Some("""WITH py AS (
              SELECT l_partkey AS pk, CAST(year(l_shipdate) AS INT) AS yr,
                     CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev,
                     CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty
              FROM lineitem GROUP BY 1, 2),
            y0 AS (SELECT min(yr) AS y0 FROM py),
            base AS (SELECT pk,
                            CAST(rev AS DOUBLE) / qty AS p0,
                            CAST(qty AS DOUBLE) / 100.0 AS q0
                     FROM py, y0 WHERE yr = y0.y0),
            cur AS (SELECT pk, yr,
                           CAST(rev AS DOUBLE) / qty AS p1,
                           CAST(qty AS DOUBLE) / 100.0 AS q1
                    FROM py, y0 WHERE yr <> y0.y0),
            j AS (SELECT yr,
                         CAST(sum(CAST(floor(p1 * q0 * 100.0) AS BIGINT)) AS BIGINT) AS l_num,
                         CAST(sum(CAST(floor(p0 * q0 * 100.0) AS BIGINT)) AS BIGINT) AS l_den,
                         CAST(sum(CAST(floor(p1 * q1 * 100.0) AS BIGINT)) AS BIGINT) AS p_num,
                         CAST(sum(CAST(floor(p0 * q1 * 100.0) AS BIGINT)) AS BIGINT) AS p_den,
                         count(*) AS n_parts
                  FROM cur JOIN base USING (pk)
                  GROUP BY 1)
            SELECT yr, n_parts,
                   (round(CAST(l_num AS DOUBLE) / l_den, 6) + 0.0) AS laspeyres,
                   (round(CAST(p_num AS DOUBLE) / p_den, 6) + 0.0) AS paasche,
                   (round(sqrt((CAST(l_num AS DOUBLE) / l_den)
                         * (CAST(p_num AS DOUBLE) / p_den)), 6) + 0.0) AS fisher
            FROM j ORDER BY yr""")
  )

  /** Brown–Forsythe / Levene homogeneity-of-variance test across event
    * types — the PRECONDITION check in front of agg_anova and
    * agg_ttest_welch (pooled-variance inference assumes equal spread;
    * this is the test that says whether that assumption holds, median-
    * centered per the robust Brown–Forsythe form).
    *
    * Determinism — the half-integer median trick: the group median of
    * integer cents interpolates at most halfway, so 2·median is an
    * EXACT integer and z = |2c − 2·med| is an exact BIGINT per row; the
    * per-group (n, Σz, Σz²) folds are pure integer sufficient
    * statistics (Σz² gated) and W is a fixed scalar chain over them
    * (the ×2 scale cancels in the ratio).
    *
    * Scale shape: one aggregate for the medians (bounded |types| rows,
    * broadcast back), one hash aggregate onto the type domain, one
    * 1-row fold. */
  val levene: GraftQuery = GraftQuery(
    "agg_levene",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val meds = ev.groupBy($"event_type").agg(
        expr("CAST((round(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(c AS DOUBLE)) * 2) + 0.0) AS BIGINT)")
          .as("med2"))
      val z = ev.join(broadcast(meds), "event_type")
        .withColumn("z", abs($"c" * 2L - $"med2"))
      // the agg_anova device: the type domain is FIXED, so the per-group
      // sufficient statistics land as COLUMNS of one aggregate row and
      // every cross-group combination is a fixed-order scalar chain —
      // never an unordered double sum (a 5-term groupBy fold already
      // differs across engines at the last ulp).
      val types = entropyTypes
      val aggs = types.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n$i"),
        sum(when($"event_type" === t, $"z").otherwise(0L)).as(s"s$i"),
        GraftQuery.guarded(
          sum(when($"event_type" === t, $"z" * $"z").otherwise(0L)),
          count(lit(1)).cast("double") * max($"z").cast("double")
            * max($"z").cast("double") < lit(9e18),
          "agg_levene: \u03a3z\u00b2 fold past BIGINT headroom \u2014 "
            + "rescale to a coarser unit").as(s"q$i"))
      }
      val idx = types.indices
      val one = z.agg(aggs.head, aggs.tail: _*)
      val k = lit(types.size)
      val nTot = idx.map(i => col(s"n$i")).reduce(_ + _)
      val szAll = idx.map(i => col(s"s$i")).reduce(_ + _)
      val sm2 = idx.map(i => col(s"s$i").cast("double") * col(s"s$i").cast("double")
        / col(s"n$i").cast("double")).reduce(_ + _)
      val qAll = idx.map(i => col(s"q$i").cast("double")).reduce(_ + _)
      one.select(k.cast("long").as("k"), nTot.as("n_total"),
        round(((nTot - k).cast("double") / (k - lit(1)).cast("double"))
          * ((sm2 - szAll.cast("double") * szAll.cast("double")
            / nTot.cast("double")) / (qAll - sm2)), 6).as("levene_w"))
    },
    Some("""WITH ev AS (SELECT event_type,
                               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
                        FROM events),
            m AS (SELECT event_type,
                         CAST((round(percentile_cont(0.5) WITHIN GROUP
                           (ORDER BY CAST(c AS DOUBLE)) * 2) + 0.0) AS BIGINT) AS med2
                  FROM ev GROUP BY 1),
            z AS (SELECT ev.event_type, abs(c * 2 - med2) AS z
                  FROM ev JOIN m USING (event_type)),
            g AS (SELECT
                    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                    CAST(sum(CASE WHEN event_type = 'click' THEN z ELSE 0 END) AS BIGINT) AS s0,
                    CAST(sum(CASE WHEN event_type = 'click' THEN z * z ELSE 0 END) AS BIGINT) AS q0,
                    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                    CAST(sum(CASE WHEN event_type = 'error' THEN z ELSE 0 END) AS BIGINT) AS s1,
                    CAST(sum(CASE WHEN event_type = 'error' THEN z * z ELSE 0 END) AS BIGINT) AS q1,
                    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                    CAST(sum(CASE WHEN event_type = 'purchase' THEN z ELSE 0 END) AS BIGINT) AS s2,
                    CAST(sum(CASE WHEN event_type = 'purchase' THEN z * z ELSE 0 END) AS BIGINT) AS q2,
                    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                    CAST(sum(CASE WHEN event_type = 'signup' THEN z ELSE 0 END) AS BIGINT) AS s3,
                    CAST(sum(CASE WHEN event_type = 'signup' THEN z * z ELSE 0 END) AS BIGINT) AS q3,
                    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n4,
                    CAST(sum(CASE WHEN event_type = 'view' THEN z ELSE 0 END) AS BIGINT) AS s4,
                    CAST(sum(CASE WHEN event_type = 'view' THEN z * z ELSE 0 END) AS BIGINT) AS q4
                  FROM z)
            SELECT CAST(5 AS BIGINT) AS k,
                   CAST(n0 + n1 + n2 + n3 + n4 AS BIGINT) AS n_total,
                   (round((CAST((n0 + n1 + n2 + n3 + n4) - 5 AS DOUBLE) / (5 - 1))
                         * (((CAST(s0 AS DOUBLE) * s0 / n0
                              + CAST(s1 AS DOUBLE) * s1 / n1
                              + CAST(s2 AS DOUBLE) * s2 / n2
                              + CAST(s3 AS DOUBLE) * s3 / n3
                              + CAST(s4 AS DOUBLE) * s4 / n4)
                             - CAST(s0 + s1 + s2 + s3 + s4 AS DOUBLE)
                               * (s0 + s1 + s2 + s3 + s4)
                               / (n0 + n1 + n2 + n3 + n4))
                            / ((CAST(q0 AS DOUBLE) + q1 + q2 + q3 + q4)
                               - (CAST(s0 AS DOUBLE) * s0 / n0
                                  + CAST(s1 AS DOUBLE) * s1 / n1
                                  + CAST(s2 AS DOUBLE) * s2 / n2
                                  + CAST(s3 AS DOUBLE) * s3 / n3
                                  + CAST(s4 AS DOUBLE) * s4 / n4))), 6) + 0.0) AS levene_w
            FROM g""")
  )

  /** MUTUAL INFORMATION between event type and the value decile — the
    * feature-screening number ("does this categorical carry signal about
    * the metric?") run before any model touches a column; for a training
    * pipeline, swap the pair for (source, quality-bucket) and this is
    * the "is quality confounded with provenance" audit.
    *
    * Determinism: MI decomposes as
    * (Σ n_tb·ln n_tb − Σ n_t·ln n_t − Σ n_b·ln n_b + N·ln N)/N — every
    * ln argument is an exact BIGINT cell count (identical in both
    * engines), each Σ runs over a BOUNDED domain (≤ 5·10 cells), and the
    * normalized form divides by √(H_t·H_b) of the same counts. Rounding
    * absorbs the bounded-domain double-sum association.
    *
    * Scale shape: ONE map-side-combined hash aggregate reduces the fact
    * scan to the ≤50-cell table; margins are two bounded re-aggregates;
    * the three 1-row stat frames assemble via broadcast crossJoin (the
    * agg_chisq pattern). */
  /** The MI serve fold over a (t, vb, n) cell table — shared verbatim by
    * agg_mutual_info and its streaming twin (integer cell counts are
    * exactly mergeable under any wave split). */
  private[graft] def miFold(cells: DataFrame): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    def nlogn(c: Column): Column = c.cast("double") * log(c.cast("double"))
    val sTb = cells.agg(sum(nlogn($"n")).as("stb"), sum($"n").as("ntot"))
    val sT = cells.groupBy($"t").agg(sum($"n").as("nt"))
      .agg(sum(nlogn($"nt")).as("st"))
    val sB = cells.groupBy($"vb").agg(sum($"n").as("nb"))
      .agg(sum(nlogn($"nb")).as("sb"))
    sTb.crossJoin(broadcast(sT)).crossJoin(broadcast(sB))
      .withColumn("nd", $"ntot".cast("double"))
      .withColumn("mi",
        ($"stb" - $"st" - $"sb" + $"nd" * log($"nd")) / $"nd")
      .withColumn("ht", log($"nd") - $"st" / $"nd")
      .withColumn("hb", log($"nd") - $"sb" / $"nd")
      .select($"ntot".as("n_total"),
        GraftQuery.roundNorm($"mi", 6).as("mi"),
        GraftQuery.roundNorm($"mi" / sqrt($"ht" * $"hb"), 6).as("nmi"))
  }

  /** The (t, vb) cell projection shared by batch and stream forms. */
  private[graft] def miCellsSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id", $"event_type".as("t"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 10000")
          .as("vb"))
  }

  val mutualInfo: GraftQuery = GraftQuery(
    "agg_mutual_info",
    (s, dir) => {
      import s.implicits._
      miFold(miCellsSource(s, dir)
        .groupBy($"t", $"vb").agg(count(lit(1)).as("n")))
    },
    Some("""WITH cells AS (
              SELECT event_type AS t,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 10000 AS vb,
                     count(*) AS n
              FROM events GROUP BY 1, 2),
            stb AS (SELECT sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS stb,
                           CAST(sum(n) AS BIGINT) AS ntot FROM cells),
            st AS (SELECT sum(CAST(nt AS DOUBLE) * ln(CAST(nt AS DOUBLE))) AS st
                   FROM (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells GROUP BY t)),
            sb AS (SELECT sum(CAST(nb AS DOUBLE) * ln(CAST(nb AS DOUBLE))) AS sb
                   FROM (SELECT CAST(sum(n) AS BIGINT) AS nb FROM cells GROUP BY vb)),
            f AS (SELECT ntot, CAST(ntot AS DOUBLE) AS nd,
                         (stb - st - sb + CAST(ntot AS DOUBLE) * ln(CAST(ntot AS DOUBLE)))
                           / CAST(ntot AS DOUBLE) AS mi,
                         ln(CAST(ntot AS DOUBLE)) - st / CAST(ntot AS DOUBLE) AS ht,
                         ln(CAST(ntot AS DOUBLE)) - sb / CAST(ntot AS DOUBLE) AS hb
                  FROM stb, st, sb)
            SELECT ntot AS n_total,
                   (round(mi, 6) + 0.0) AS mi,
                   (round(mi / sqrt(ht * hb), 6) + 0.0) AS nmi
            FROM f""")
  )

  /** FIXED-EFFECT META-ANALYSIS across order-priority strata — the
    * inverse-variance pooling table (pooled effect, Cochran's Q,
    * Higgins' I²) any experimentation platform prints when one metric
    * was measured in k independent slices: "do the strata agree, and
    * what is the precision-weighted combined mean?" (swap priority →
    * corpus shard and this is the cross-shard quality-score
    * reconciliation readout).
    *
    * Determinism: per-stratum (n, Σc, Σc²) are exact BIGINT folds
    * (guarded); each stratum's mean/se² is a fixed rational; the k=5
    * pooling sums ride the bounded stratum domain with final rounding.
    *
    * Scale shape: one map-side-combined hash aggregate onto the 5-row
    * priority domain; everything after is arithmetic on ≤5 rows. */
  val metaAnalysis: GraftQuery = GraftQuery(
    "agg_meta_analysis",
    (s, dir) => {
      import s.implicits._
      // WHOLE-DOLLAR integer metric (cents div 100): order totals reach
      // ~5.5e7 cents, so a cents-scale Σc² wraps int64 already at sf0.1
      // (ANSI throws); exact dollars keep ~1000× headroom at sf0.1 and
      // the guard still raises past it.
      val strata = Tables.orders(s, dir)
        .select($"o_orderpriority".as("stratum"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100")
            .as("c"))
        .groupBy($"stratum")
        .agg(count(lit(1)).as("n"), sum($"c").as("sc"),
          GraftQuery.guarded(sum($"c" * $"c"),
            count(lit(1)).cast("double")
              * max(abs($"c")).cast("double") * max(abs($"c")).cast("double")
              < lit(9e18),
            "agg_meta_analysis: BIGINT Σc² near overflow — " +
              "shift the fold to DECIMAL(38,0)").as("sc2"))
        .withColumn("mean", $"sc".cast("double") / $"n".cast("double"))
        .withColumn("var",
          ($"n".cast("double") * $"sc2".cast("double")
            - $"sc".cast("double") * $"sc".cast("double"))
            / ($"n".cast("double") * ($"n".cast("double") - 1.0)))
        .withColumn("w", $"n".cast("double") / $"var")
      val pooled = strata.agg(
        count(lit(1)).as("k"),
        sum($"w").as("sw"),
        sum($"w" * $"mean").as("swm"),
        sum($"w" * $"mean" * $"mean").as("swm2"))
        .withColumn("pooled_mean", $"swm" / $"sw")
        .withColumn("q", $"swm2" - $"swm" * $"swm" / $"sw")
        .withColumn("i2", greatest(lit(0.0),
          ($"q" - ($"k" - 1).cast("double")) / $"q") * 100.0)
      pooled.select($"k",
        GraftQuery.roundNorm($"pooled_mean", 4).as("pooled_mean"),
        GraftQuery.roundNorm(sqrt(lit(1.0) / $"sw"), 6).as("pooled_se"),
        GraftQuery.roundNorm($"q", 4).as("q"),
        GraftQuery.roundNorm($"i2", 2).as("i2_pct"))
    },
    Some("""WITH s AS (
              SELECT o_orderpriority AS stratum, count(*) AS n,
                     CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100) AS BIGINT) AS sc,
                     CAST(sum((CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)
                              * (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)) AS BIGINT) AS sc2
              FROM orders GROUP BY 1),
            t AS (
              SELECT stratum, n,
                     CAST(sc AS DOUBLE) / n AS mean,
                     (CAST(n AS DOUBLE) * sc2 - CAST(sc AS DOUBLE) * sc)
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var
              FROM s),
            u AS (SELECT stratum, n, mean, CAST(n AS DOUBLE) / var AS w FROM t),
            p AS (
              SELECT count(*) AS k, sum(w) AS sw, sum(w * mean) AS swm,
                     sum(w * mean * mean) AS swm2
              FROM u)
            SELECT k,
                   (round(swm / sw, 4) + 0.0) AS pooled_mean,
                   (round(sqrt(1.0 / sw), 6) + 0.0) AS pooled_se,
                   (round(swm2 - swm * swm / sw, 4) + 0.0) AS q,
                   (round(greatest(0.0, ((swm2 - swm * swm / sw) - (k - 1))
                                        / (swm2 - swm * swm / sw)) * 100.0, 2) + 0.0) AS i2_pct
            FROM p""")
  )

  /** ALWAYS-VALID A/B MONITORING — the mixture sequential probability
    * ratio test (mSPRT, the "peeking-proof p-value" behind every modern
    * experimentation platform's live dashboard): per calendar day, the
    * cumulative two-sample log mixture likelihood ratio for the
    * arm-mean difference under a N(0, τ²) effect prior; the test
    * rejects the first day log Λ ≥ ln(1/α), and unlike agg_ttest_welch
    * the guarantee survives continuous monitoring.
    *
    * log Λ_n = ½·ln(2σ²/(2σ² + n·τ²)) + n²τ²Δ²/(4σ²(2σ² + n·τ²)),
    * with n the mean per-arm count, σ² the pooled sample variance and
    * Δ the arm-mean difference — all exact-BIGINT sufficient statistics
    * cumulated per day (integer window sums over the bounded day
    * domain), so both engines evaluate identical doubles; ln(1/α)
    * interpolates as ONE shared literal into both engines.
    *
    * Scale shape: one hash aggregate onto the (arm, day) domain; the
    * cumulative pass is a window partitioned by arm over ≤days rows;
    * the two arms pivot into one row per day (bounded). */
  /** mSPRT constants — shared by the Spark plan and the oracle SQL so
    * both engines compare against the IDENTICAL literal. */
  private val MsprtTau2 = 100.0 // N(0, 10²) effect prior, dollars
  private val MsprtLnInvAlpha = math.log(20.0) // alpha = 0.05

  /** The per-(arm, day) partial projection shared by batch and stream
    * forms (event_id kept so the stream form can split by arrival). */
  private[graft] def msprtSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id", pmod($"user_id", lit(2L)).as("arm"),
        to_date($"ts").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
  }

  /** The mSPRT serve fold over merged (arm, day, dn, dsc, dsc2) daily
    * partials — shared verbatim by agg_msprt and its streaming twin
    * (integer sufficient statistics are exactly mergeable). */
  private[graft] def msprtFold(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val tau2 = MsprtTau2
    val lnInvAlpha = MsprtLnInvAlpha
    val wArm = Window.partitionBy($"arm").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = daily
        .withColumn("n", sum($"dn").over(wArm))
        .withColumn("sc", sum($"dsc").over(wArm))
        .withColumn("sc2", sum($"dsc2").over(wArm))
        .select($"arm", $"day", $"n", $"sc", $"sc2")
      val both = cum.filter($"arm" === 0L).as("a")
        .join(cum.filter($"arm" === 1L).as("b"), Seq("day"))
        .select($"day", $"a.n".as("nc"), $"a.sc".as("scc"), $"a.sc2".as("scc2"),
          $"b.n".as("nt"), $"b.sc".as("sct"), $"b.sc2".as("sct2"))
        .filter($"nc" >= 5L && $"nt" >= 5L)
      both
        .withColumn("sigma2",
          (($"scc2" + $"sct2").cast("double")
            - ($"scc".cast("double") * $"scc" / $"nc"
               + $"sct".cast("double") * $"sct" / $"nt"))
            / ($"nc" + $"nt" - 2L).cast("double") / 10000.0)
        .withColumn("delta",
          ($"sct".cast("double") / $"nt" - $"scc".cast("double") / $"nc") / 100.0)
        .withColumn("nbar", ($"nc" + $"nt").cast("double") / 2.0)
        .withColumn("den", lit(2.0) * $"sigma2" + $"nbar" * lit(tau2))
        .withColumn("log_lambda",
          when($"sigma2" > 1e-9,
            lit(0.5) * log(lit(2.0) * $"sigma2" / $"den")
              + $"nbar" * $"nbar" * lit(tau2) * $"delta" * $"delta"
                / (lit(4.0) * $"sigma2" * $"den")))
        .select($"day", $"nc", $"nt",
          GraftQuery.roundNorm($"delta", 4).as("delta"),
          GraftQuery.roundNorm($"log_lambda", 4).as("log_lambda"),
          when($"log_lambda" >= lnInvAlpha, 1L).otherwise(0L).as("reject"))
        .orderBy($"day")
  }

  /** Builds the (arm, day) daily partial aggregate from the source
    * projection — the map side of the fold (one per wave in the
    * streaming twin). */
  private[graft] def msprtDaily(src: DataFrame): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    src.groupBy($"arm", $"day")
      .agg(count(lit(1)).as("dn"), sum($"c").as("dsc"),
        GraftQuery.guarded(sum($"c" * $"c"),
          count(lit(1)).cast("double")
            * max(abs($"c")).cast("double") * max(abs($"c")).cast("double")
            < lit(9e18),
          "agg_msprt: BIGINT Σc² near overflow").as("dsc2"))
  }

  val msprt: GraftQuery = GraftQuery(
    "agg_msprt",
    (s, dir) => msprtFold(msprtDaily(msprtSource(s, dir))),
    Some(s"""WITH daily AS (
              SELECT user_id % 2 AS arm, CAST(ts AS DATE) AS day,
                     count(*) AS dn,
                     CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dsc,
                     CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                              * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dsc2
              FROM events GROUP BY 1, 2),
            cum AS (
              SELECT arm, day,
                     CAST(sum(dn) OVER w AS BIGINT) AS n,
                     CAST(sum(dsc) OVER w AS BIGINT) AS sc,
                     CAST(sum(dsc2) OVER w AS BIGINT) AS sc2
              FROM daily
              WINDOW w AS (PARTITION BY arm ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            pair AS (
              SELECT a.day, a.n AS nc, a.sc AS scc, a.sc2 AS scc2,
                     b.n AS nt, b.sc AS sct, b.sc2 AS sct2
              FROM cum a JOIN cum b USING (day)
              WHERE a.arm = 0 AND b.arm = 1 AND a.n >= 5 AND b.n >= 5),
            f AS (
              SELECT day, nc, nt,
                     (CAST(scc2 + sct2 AS DOUBLE)
                      - (CAST(scc AS DOUBLE) * scc / nc + CAST(sct AS DOUBLE) * sct / nt))
                       / CAST(nc + nt - 2 AS DOUBLE) / 10000.0 AS sigma2,
                     (CAST(sct AS DOUBLE) / nt - CAST(scc AS DOUBLE) / nc) / 100.0 AS delta,
                     CAST(nc + nt AS DOUBLE) / 2.0 AS nbar
              FROM pair),
            g AS (
              SELECT day, nc, nt, delta,
                     CASE WHEN sigma2 > 1e-9 THEN
                       0.5 * ln(2.0 * sigma2 / (2.0 * sigma2 + nbar * 100.0))
                       + nbar * nbar * 100.0 * delta * delta
                         / (4.0 * sigma2 * (2.0 * sigma2 + nbar * 100.0))
                     END AS log_lambda
              FROM f)
            SELECT day, nc, nt,
                   (round(delta, 4) + 0.0) AS delta,
                   (round(log_lambda, 4) + 0.0) AS log_lambda,
                   CAST(CASE WHEN log_lambda >= $MsprtLnInvAlpha THEN 1 ELSE 0 END AS BIGINT) AS reject
            FROM g ORDER BY day""")
  )

  /** RAKING (iterative proportional fitting) — survey-style weight
    * calibration of the (customer-nation-band × order-priority) cell
    * table to KNOWN margins (each band's customer share, each
    * priority's uniform fifth): three row/column scaling rounds, the
    * standard post-stratification device (for a training pipeline:
    * calibrate sampled-document weights to target (source × language)
    * mix — llm_domain_mix's two-margin generalization).
    *
    * Determinism: cell counts and margin targets are exact integers;
    * each IPF round is a fixed chain of divisions over the bounded
    * 5×5 cell domain (margin sums ride windows partitioned by the
    * 5-value keys); one rounding at the end.
    *
    * Scale shape: one hash aggregate onto the 25-cell domain; the
    * three scaling rounds cost 6 bounded window passes over 25 rows —
    * nothing downstream of the first aggregate sees data size. */
  val raking: GraftQuery = GraftQuery(
    "agg_raking",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val cells = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(pmod($"c_custkey", lit(5L)).as("band"),
          $"o_orderpriority".as("prio"))
        .groupBy($"band", $"prio").agg(count(lit(1)).as("n"))
      val wb = Window.partitionBy($"band")
      val wp = Window.partitionBy($"prio")
      val wall = Window.partitionBy(lit(1))
      // targets: per-band equal share, per-priority equal share of N
      val seeded = cells
        .withColumn("ntot", sum($"n").over(wall))
        .withColumn("tb", $"ntot".cast("double") / 5.0)
        .withColumn("tp", $"ntot".cast("double") / 5.0)
        .withColumn("w", $"n".cast("double"))
      val ipf = (1 to 3).foldLeft(seeded) { (df, _) =>
        df.withColumn("w", $"w" * $"tb" / sum($"w").over(wb))
          .withColumn("w", $"w" * $"tp" / sum($"w").over(wp))
      }
      ipf.select($"band", $"prio", $"n",
          GraftQuery.roundNorm($"w", 4).as("w"),
          GraftQuery.roundNorm($"w" / $"n".cast("double"), 6).as("factor"))
        .orderBy($"band", $"prio")
    },
    Some("""WITH cells AS (
              SELECT o.o_custkey % 5 AS band, o.o_orderpriority AS prio,
                     count(*) AS n
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            seeded AS (
              SELECT band, prio, n,
                     CAST(sum(n) OVER () AS DOUBLE) / 5.0 AS tb,
                     CAST(sum(n) OVER () AS DOUBLE) / 5.0 AS tp,
                     CAST(n AS DOUBLE) AS w
              FROM cells),
            r1 AS (SELECT band, prio, n, tb, tp,
                          w * tb / sum(w) OVER (PARTITION BY band) AS w1 FROM seeded),
            r1b AS (SELECT band, prio, n, tb, tp,
                           w1 * tp / sum(w1) OVER (PARTITION BY prio) AS w FROM r1),
            r2 AS (SELECT band, prio, n, tb, tp,
                          w * tb / sum(w) OVER (PARTITION BY band) AS w1 FROM r1b),
            r2b AS (SELECT band, prio, n, tb, tp,
                           w1 * tp / sum(w1) OVER (PARTITION BY prio) AS w FROM r2),
            r3 AS (SELECT band, prio, n, tb, tp,
                          w * tb / sum(w) OVER (PARTITION BY band) AS w1 FROM r2b),
            r3b AS (SELECT band, prio, n,
                           w1 * tp / sum(w1) OVER (PARTITION BY prio) AS w FROM r3)
            SELECT band, prio, n,
                   (round(w, 4) + 0.0) AS w,
                   (round(w / n, 6) + 0.0) AS factor
            FROM r3b ORDER BY band, prio""")
  )

  def all: Seq[GraftQuery] = Seq(
    statsAgg, percentiles, approxPercentile, stringAgg, pivotAgg, jsonStruct,
    topNRevenue, corrMatrix, ksTest, mannWhitney, chiSq, gini,
    ttestWelch, spearman, cramersV, benford, moments, shareOfParent, anova,
    wilcoxon, entropy, expectations, kanon, hhi, bootstrapCi, cuped, powerMde,
    srm, markov, cohortLtv, survivalKm, theil, elasticity, winsorized,
    lorenz, assocRules, effectSize, priceIndex, levene,
    mutualInfo, metaAnalysis, msprt, raking)
}
