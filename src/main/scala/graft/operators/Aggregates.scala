package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Aggregation operators (SURVEY.md §2b "Aggregations").
  *
  * All of these compile to partial (map-side) + final hash aggregates in
  * Spark — at 100 TB the map-side combine keeps shuffle volume proportional
  * to group cardinality, not input rows. `count(DISTINCT)` expands to a
  * two-stage aggregate (distinct shuffle then count); for very high
  * cardinality at scale prefer `approx_count_distinct` (HLL, fixed-size
  * sketch, single shuffle) — both are exposed below.
  */
object Aggregates {

  /** TPC-H Q1 shape: the flagship scan→filter→hash-aggregate pipeline. */
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

  /** Exact distinct counts (two-stage aggregate). */
  val distinctCount: GraftQuery = GraftQuery(
    "agg_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
             countDistinct($"l_suppkey").as("n_supps"),
             countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** HLL-sketch distinct — the 100 TB path for high-cardinality keys.
    *
    * Oracle via the ERROR-ENVELOPE-AS-DATA device: Spark's HLL++ estimate
    * can never hash-match a foreign engine's sketch, so the GRADED columns
    * are the exact count and a boolean `hll_ok` = |estimate − exact| ≤ 5%
    * of exact (5× the declared 1% rsd — deterministic for fixed data, not
    * a flake margin). The oracle computes the exact count and asserts the
    * envelope as literal TRUE: a sketch regression past the bound is now a
    * HASH failure, not a silently-weaker rows-only row. The exact column
    * is the AUDIT harness (runs on graded test data); production keeps
    * only the sketch side. AggregatesSpec still checks the raw estimate
    * directly. */
  val approxDistinct: GraftQuery = GraftQuery(
    "agg_approx_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey", 0.01).as("approx"),
             countDistinct($"l_orderkey").as("n_orders_exact"))
        .select($"l_returnflag", $"n_orders_exact",
          (abs($"approx" - $"n_orders_exact") <=
            $"n_orders_exact" * 0.05).as("hll_ok"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders_exact,
                   TRUE AS hll_ok
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** ROLLUP over (returnflag, linestatus); grouping-null keys are
    * coalesced to 'ALL' so Spark/DuckDB null-ordering differences can't
    * affect the comparison. */
  val rollupAgg: GraftQuery = GraftQuery(
    "agg_rollup",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
                coalesce($"l_linestatus", lit("ALL")).as("status"),
                $"sum_qty", $"n")
        .orderBy($"flag", $"status")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY flag, status""")
  )

  /** CUBE over (returnflag, linestatus). */
  val cubeAgg: GraftQuery = GraftQuery(
    "agg_cube",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
                coalesce($"l_linestatus", lit("ALL")).as("status"),
                $"sum_price", $"n")
        .orderBy($"flag", $"status")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY flag, status""")
  )

  /** Explicit GROUPING SETS (SQL surface). */
  val groupingSets: GraftQuery = GraftQuery(
    "agg_gsets",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).createOrReplaceTempView("orders_gsets")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
               FROM orders_gsets
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                       (o_orderstatus, o_orderpriority))
               ORDER BY status, priority""")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                    (o_orderstatus, o_orderpriority))
            ORDER BY status, priority""")
  )

  /** Post-aggregation filter (HAVING). */
  val having: GraftQuery = GraftQuery(
    "agg_having",
    (s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_parts"), round(avg($"p_retailprice"), 2).as("avg_price"))
        .filter($"n_parts" > 3)
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
            FROM part GROUP BY p_brand HAVING count(*) > 3 ORDER BY p_brand""")
  )

  /** Custom typed aggregate (Aggregator API): quantity-weighted mean price. */
  val typedCustom: GraftQuery = GraftQuery(
    "agg_typed_custom",
    (s, dir) => {
      import s.implicits._
      val wmean = udaf(graft.functions.WeightedMean)
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(round(wmean($"l_extendedprice", $"l_quantity"), 4).as("wmean_price"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Mergeable-sketch pre-aggregation — the 100 TB distinct-count
    * pattern: exact distincts don't re-aggregate (daily uniques can't
    * sum to weekly uniques), so the pre-agg cube stores DataSketches HLL
    * sketches per (event_type, day) and every coarser rollup is a sketch
    * UNION over the tiny cube — the raw table is scanned once at cube
    * build and never again.
    *
    * Scale shape: the daily-sketch build is one hash aggregate with
    * map-side partials (sketches merge associatively, so partial
    * aggregation applies); the rollup aggregates the bounded cube
    * (event_types × days rows, each a ~KB binary).
    *
    * Oracle via envelope-as-data (see approxDistinct): the graded columns
    * are exact (n_days, n_users_exact) plus two booleans the oracle pins
    * as literal TRUE — `merge_exact` (union-of-daily estimate ==
    * union-of-WEEKLY estimate, weeks built from the same daily cube: the
    * hierarchy-rollup invariance this operator sells — union register
    * state is associative, so re-aggregating along any grouping of the
    * cube is lossless; note one-shot streaming-built sketches are NOT
    * comparable, their HIP estimator differs from union's composite
    * estimator by design) and `hll_ok` (merged estimate within 5% of
    * exact). AggregatesSpec still checks the raw estimates directly. */
  val sketchMerge: GraftQuery = GraftQuery(
    "agg_sketch_merge",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(hll_sketch_agg($"user_id").as("sk"))
      val merged = daily
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
      // Re-aggregate the SAME daily cube through a weekly intermediate:
      // hierarchy-rollup invariance says this must give the identical
      // register state, hence the identical estimate.
      val viaWeekly = daily
        .groupBy($"event_type", weekofyear($"day").as("wk"))
        .agg(hll_union_agg($"sk").as("sk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_weekly"))
      // Exact distinct per type: the audit twin the envelope-as-data
      // grading compares against (see approxDistinct).
      val exact = Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users_exact"))
      merged.join(broadcast(viaWeekly), "event_type")
        .join(broadcast(exact), "event_type")
        .select($"event_type", $"n_days", $"n_users_exact",
          ($"est_merged" === $"est_weekly").as("merge_exact"),
          (abs($"est_merged" - $"n_users_exact") <=
            $"n_users_exact" * 0.05).as("hll_ok"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days,
                   count(DISTINCT user_id) AS n_users_exact,
                   TRUE AS merge_exact, TRUE AS hll_ok
            FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** Count-min dimensions: D independent hash rows × W buckets = the
    * ENTIRE sketch is D·W counters — fixed-size state no matter how many
    * events stream through, the same bounded-state property the HLL cube
    * exploits, for frequencies instead of cardinalities. */
  private[graft] val CmDepth = 4
  private[graft] val CmWidth = 256
  private[graft] val HeavyMin = 200L

  /** Heavy-hitter detection via a count-min sketch (Cormode & Muthu-
    * krishnan): build D×W counters (bucket j = md5-derived hash of the
    * key, salted by the row index — md5 so DuckDB reproduces the exact
    * buckets, the simhashPoly convention), estimate a key's frequency as
    * the MIN over its D counters, report keys estimated ≥ HeavyMin.
    *
    * The fixture constructs its hitters the way llm_dedup_exact
    * constructs duplicates: events of users ≡ 3 (mod 50) are unioned in
    * 4 extra times (~5× their base rate, ~330–430 vs a ≤ 86 background),
    * so the threshold separates cleanly. CM never underestimates, and
    * the overestimate (bucket collisions) is DETERMINISTIC given the
    * fixed hashes — both engines compute identical estimates, which is
    * what makes an exact-hash oracle possible for a sketch operator.
    *
    * Scale shape: the build is one hash aggregate over (row, bucket) —
    * map-side partial, output bounded at D·W rows REGARDLESS of stream
    * size; estimation joins candidates against the broadcast sketch
    * (KBs). Merging shards/windows is elementwise counter addition —
    * associative, so partial sketches combine exactly like the HLL cube
    * deltas. Candidate enumeration here is the distinct key set (bounded
    * fixture); at web scale candidates come from a sampled/windowed
    * stream, never a full distinct — the sketch itself stays the only
    * global state. */
  /** Bucket j of the count-min row `j` for key `k` (md5-derived so DuckDB
    * reproduces the exact buckets — the simhashPoly convention). Shared by
    * the one-shot and incremental CM builds, which MUST hash identically
    * for their sketches to be mergeable. */
  private[graft] def cmBucket(j: Int, k: Column): Column =
    conv(substring(md5(concat(k.cast("string"), lit("#" + j))), 1, 8),
      16, 10).cast("long") % CmWidth

  /** The skewed fixture stream both CM forms count: events with users
    * ≡ 3 (mod 50) unioned in 4 extra times (~5× their base rate). Carries
    * `ts` so the incremental form can cut daily deltas. */
  private[graft] def cmStream(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"ts", $"user_id")
    val hot = ev.filter($"user_id" % 50 === 3)
    (1 to 4).foldLeft(ev)((acc, _) => acc.unionAll(hot))
  }

  /** (j, b) bucket rows, CmDepth per input row — the pre-aggregation
    * explode both CM builds share. */
  private[graft] def cmRows(k: Column): Column =
    explode(array((0 until CmDepth).map(j =>
      struct(lit(j).as("j"), cmBucket(j, k).as("b"))): _*))

  /** Heavy hitters from a materialized CM counter table `cm` (j, b, c):
    * candidates probe the broadcast sketch, est = min over the D rows. */
  private def cmHeavy(s: SparkSession,
                      stream: org.apache.spark.sql.DataFrame,
                      cm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cand = stream.select($"user_id").distinct()
      .select($"user_id", cmRows($"user_id").as("rb"))
      .select($"user_id", $"rb.j".as("j"), $"rb.b".as("b"))
    cand.join(broadcast(cm), Seq("j", "b"))
      .groupBy($"user_id")
      .agg(min($"c").as("est"))
      .filter($"est" >= HeavyMin)
      .orderBy($"user_id")
  }

  val heavyHitters: GraftQuery = GraftQuery(
    "agg_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val stream = cmStream(s, dir)
      val cm = stream
        .select(cmRows($"user_id").as("rb"))
        .groupBy($"rb.j".as("j"), $"rb.b".as("b"))
        .agg(count(lit(1)).as("c"))
      cmHeavy(s, stream, cm)
    },
    Some(s"""WITH ev AS (SELECT user_id FROM events),
             hot AS (SELECT user_id FROM ev WHERE user_id % 50 = 3),
             stream AS (
               SELECT user_id FROM ev
               UNION ALL SELECT user_id FROM hot
               UNION ALL SELECT user_id FROM hot
               UNION ALL SELECT user_id FROM hot
               UNION ALL SELECT user_id FROM hot),
             rb AS (
               SELECT user_id, j,
                      CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' ||
                                               CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
                        % $CmWidth AS b
               FROM stream, range($CmDepth) r(j)),
             cm AS (SELECT j, b, count(*) AS c FROM rb GROUP BY 1, 2),
             cand AS (
               SELECT DISTINCT user_id, j,
                      CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' ||
                                               CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
                        % $CmWidth AS b
               FROM (SELECT DISTINCT user_id FROM stream), range($CmDepth) r(j))
             SELECT cand.user_id, CAST(min(cm.c) AS BIGINT) AS est
             FROM cand JOIN cm USING (j, b)
             GROUP BY cand.user_id
             HAVING min(cm.c) >= $HeavyMin
             ORDER BY user_id""")
  )

  /** Incremental count-min: build a CM counter DELTA per day (the natural
    * ingest unit), merge deltas by elementwise counter addition, extract
    * heavy hitters from the merged sketch — the same recurring-cost shape
    * as the HLL cube (agg_sketch_merge): each new day costs O(day), the
    * merge costs O(days × D·W counters), and nothing ever re-scans history.
    * CM counters add associatively, so merged-then-extract is EXACTLY the
    * one-shot sketch — this query shares agg_heavy_hitters' oracle
    * verbatim, and AggregatesSpec pins counter-level equality of the two
    * cubes.
    *
    * Scale shape: the daily build is one hash aggregate with map-side
    * partials keyed (day, j, b) — bounded at days × D·W rows regardless of
    * stream size; the merge is a second hash aggregate over that bounded
    * cube. In production the daily deltas persist (the Layouts convention)
    * and the merge reads only counters; here both stages run in-plan to
    * keep the graded query self-contained. */
  val heavyHittersIncremental: GraftQuery = GraftQuery(
    "agg_heavy_hitters_incremental",
    (s, dir) => {
      import s.implicits._
      val stream = cmStream(s, dir)
      val daily = stream
        .select(to_date($"ts").as("day"), cmRows($"user_id").as("rb"))
        .groupBy($"day", $"rb.j".as("j"), $"rb.b".as("b"))
        .agg(count(lit(1)).as("dc"))
      val merged = daily.groupBy($"j", $"b").agg(sum($"dc").as("c"))
      cmHeavy(s, stream, merged)
    },
    heavyHitters.oracle
  )

  /** Per-group mode (most frequent value), ties broken to the
    * lexicographically smallest — the categorical summary statistic
    * `mode()` gives you in DuckDB/pandas but with an EXPLICIT
    * deterministic tiebreak (a bare mode() is engine-dependent under
    * ties, which the oracle contract can't tolerate).
    *
    * Scale shape: the corpus-sized work is the (group, value) count —
    * a hash aggregate with map-side partials; the argmax then runs on
    * the already-reduced counts table (rows ∝ groups × distinct values,
    * not events) as a row_number window. The window's input is the
    * small table, so its sort is cheap; keeping the corpus pass a pure
    * fold is what makes this scale — mode is the textbook example of an
    * aggregate that is NOT associative in one pass but factors into
    * count-then-argmax. */
  /** The count-then-argmax mode pipeline over any (user_id, event_type)
    * frame — extracted so AggregatesSpec can drive synthetic tie cases
    * the fixture doesn't isolate. */
  private[graft] def modeOf(s: SparkSession,
                            ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    ev.groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("mode_type"), $"cnt")
      .orderBy($"user_id")
  }

  val aggMode: GraftQuery = GraftQuery(
    "agg_mode",
    (s, dir) => modeOf(s, Tables.events(s, dir)),
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS cnt
                       FROM events GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY cnt DESC, event_type) AS rn FROM c)
            SELECT user_id, event_type AS mode_type, cnt
            FROM r WHERE rn = 1 ORDER BY user_id""")
  )

  /** Equi-width numeric histogram via width_bucket — the profiling
    * aggregate behind every data-distribution dashboard (degree_dist is
    * the discrete cousin; this is the continuous one with explicit
    * bucket bounds). Bucket assignment is a scan projection; the
    * histogram is one hash aggregate on a BOUNDED key (NumBuckets+2
    * with the under/overflow buckets), so the shuffle carries buckets ×
    * partitions rows regardless of fact size. Sums stay in exact
    * DECIMAL (money discipline). Bounds are fixed constants — at scale
    * you either know the domain or take bounds from scan_column_stats'
    * min/max (two passes, the standard profile-then-histogram shape). */
  val histogram: GraftQuery = GraftQuery(
    "agg_histogram",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_totalprice",
          expr("width_bucket(o_totalprice, 0.0, 400000.0, 16)").as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_orders"),
          round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("total"))
        .orderBy($"bucket")
    },
    // DuckDB has no width_bucket — the oracle states the same assignment
    // arithmetically (bounds are exact doubles, so floor-division agrees
    // with Spark's WidthBucket at every boundary).
    Some("""SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                        WHEN o_totalprice >= 400000.0 THEN 17
                        ELSE CAST(floor(o_totalprice / 25000.0) AS BIGINT) + 1
                   END AS bucket,
                   count(*) AS n_orders,
                   round(min(o_totalprice), 2) AS lo,
                   round(max(o_totalprice), 2) AS hi,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                     AS total
            FROM orders
            GROUP BY bucket ORDER BY bucket""")
  )

  def all: Seq[GraftQuery] = Seq(
    q1Agg, distinctCount, approxDistinct, rollupAgg, cubeAgg,
    groupingSets, having, typedCustom, sketchMerge, heavyHitters,
    heavyHittersIncremental, aggMode, histogram)
}
