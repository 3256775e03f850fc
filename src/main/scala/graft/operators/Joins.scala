package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Join operators (SURVEY.md §2b "Joins").
  *
  * Scale notes:
  *  - Fact-to-fact equi joins (lineitem ⋈ orders) shuffle both sides on the
  *    join key; AQE picks shuffle-hash vs sort-merge and handles skew at
  *    runtime. At 100 TB this is the dominant shuffle — key choice
  *    (l_orderkey) is the natural co-partitioning key, so a bucketed layout
  *    on orderkey would eliminate it entirely; the code keeps the join key
  *    bare (no wrapping expressions) so bucketed tables still co-locate.
  *  - Dimension joins broadcast explicitly (`broadcast(...)`) — nation /
  *    region / supplier stay < a few MB even at SF 100k, so no shuffle on
  *    the fact side, ever.
  *  - The theta/range join is a bounded band join: the build side is tiny
  *    (supplier), so Spark plans BroadcastNestedLoopJoin — the fact side
  *    streams once; no quadratic shuffle.
  */
object Joins {

  /** Fact-to-fact equi inner join; planner picks SMJ/SHJ (AQE-adjusted). */
  val innerHash: GraftQuery = GraftQuery(
    "join_inner_hash",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select($"o_orderkey", $"l_linenumber", $"o_totalprice", $"l_extendedprice")
        .orderBy($"o_orderkey", $"l_linenumber")
    },
    Some("""SELECT o_orderkey, l_linenumber, o_totalprice, l_extendedprice
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ORDER BY o_orderkey, l_linenumber""")
  )

  /** Explicit broadcast of small dimensions — zero shuffle on the fact side. */
  val broadcastDim: GraftQuery = GraftQuery(
    "join_broadcast",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"), round(sum($"c_acctbal"), 2).as("sum_acctbal"))
        .orderBy($"r_name")
    },
    Some("""SELECT r_name, count(*) AS n_customers, (round(sum(c_acctbal), 2) + 0.0) AS sum_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name""")
  )

  /** Left outer join: customers keep their row even with zero orders. */
  val leftOuter: GraftQuery = GraftQuery(
    "join_left",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
             round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spend"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
                   (round(coalesce(sum(o_totalprice), 0.0), 2) + 0.0) AS total_spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey""")
  )

  /** Right outer join (mirror of join_left through the other side). */
  val rightOuter: GraftQuery = GraftQuery(
    "join_right",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey ORDER BY c_custkey""")
  )

  /** Full outer join of two derived key sets (nulls on both sides). */
  val fullOuter: GraftQuery = GraftQuery(
    "join_full",
    (s, dir) => {
      import s.implicits._
      val f = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
        .groupBy($"o_custkey".as("fk")).agg(count(lit(1)).as("n_f"))
      val p = Tables.orders(s, dir).filter($"o_orderstatus" === "P")
        .groupBy($"o_custkey".as("pk")).agg(count(lit(1)).as("n_p"))
      f.join(p, $"fk" === $"pk", "full")
        .select(coalesce($"fk", $"pk").as("custkey"),
                coalesce($"n_f", lit(0L)).as("n_f"),
                coalesce($"n_p", lit(0L)).as("n_p"))
        .orderBy($"custkey")
    },
    Some("""SELECT coalesce(f.fk, p.pk) AS custkey,
                   coalesce(f.n_f, 0) AS n_f, coalesce(p.n_p, 0) AS n_p
            FROM (SELECT o_custkey AS fk, count(*) AS n_f FROM orders
                  WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
            FULL JOIN (SELECT o_custkey AS pk, count(*) AS n_p FROM orders
                  WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
            ON f.fk = p.pk
            ORDER BY custkey""")
  )

  /** Left semi join — EXISTS. */
  val semi: GraftQuery = GraftQuery(
    "join_semi",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            ORDER BY c_custkey""")
  )

  /** Left anti join — NOT EXISTS. */
  val anti: GraftQuery = GraftQuery(
    "join_anti",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            ORDER BY c_custkey""")
  )

  /** Non-equi band join: tiny build side → BroadcastNestedLoopJoin. */
  val thetaRange: GraftQuery = GraftQuery(
    "join_theta_range",
    (s, dir) => {
      import s.implicits._
      val sup = broadcast(Tables.supplier(s, dir))
      val p   = Tables.part(s, dir)
      p.join(sup, p("p_retailprice").between(sup("s_acctbal") / 10.0,
                                             sup("s_acctbal") / 10.0 + 500.0))
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_parts_in_band"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, count(*) AS n_parts_in_band
            FROM part JOIN supplier
              ON p_retailprice BETWEEN s_acctbal / 10.0 AND s_acctbal / 10.0 + 500.0
            GROUP BY s_suppkey ORDER BY s_suppkey""")
  )

  /** Five-table star join; Catalyst reorders + broadcasts the dims. */
  val multiway: GraftQuery = GraftQuery(
    "join_multiway",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = broadcast(Tables.nation(s, dir))
      val r  = broadcast(Tables.region(s, dir))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", year($"o_orderdate").as("o_year"))
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy($"r_name", $"o_year")
    },
    Some("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
                   (round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0) AS revenue,
                   count(*) AS n_lines
            FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, o_year ORDER BY r_name, o_year""")
  )

  /** Interval-containment join via BINNING — the standard rewrite that
    * turns a pure non-equi range join (every event against every
    * interval: a nested-loop at any scale) into an equi-join: quantize
    * time into fixed bins (here calendar days), explode each interval to
    * the few bins it covers, map each event to its one bin, equi-join on
    * the bin, and re-check the exact bounds as the join's residual
    * filter. Work becomes O(events + intervals × bins-per-interval)
    * instead of O(events × intervals).
    *
    * The fixture anchors 72-hour observation windows on the 20
    * highest-value events (deterministic tiebreak on the id) and
    * counts events per window. The interval side is tiny → broadcast;
    * at scale with millions of intervals the same plan shuffles both
    * sides on the bin key — an ordinary partitioned equi-join, with bin
    * width as the fanout/selectivity dial (match it to median interval
    * length). Windows may overlap: an event landing in two windows
    * counts in both, exactly as the oracle's theta join does. */
  val rangeBinned: GraftQuery = GraftQuery(
    "join_range_binned",
    (s, dir) => {
      import s.implicits._
      val iv = Tables.events(s, dir)
        .orderBy($"value".desc, $"event_id").limit(20)
        .select($"event_id".as("win_id"),
          ($"ts" + expr("INTERVAL 1 HOUR")).as("t_lo"),
          ($"ts" + expr("INTERVAL 73 HOUR")).as("t_hi"))
      val ivBinned = iv.select($"win_id", $"t_lo", $"t_hi",
        explode(sequence(date_trunc("day", $"t_lo"), date_trunc("day", $"t_hi"),
          expr("INTERVAL 1 DAY"))).as("day"))
      Tables.events(s, dir)
        .select($"ts", $"value", date_trunc("day", $"ts").as("day"))
        .join(broadcast(ivBinned), Seq("day"))
        .filter($"ts" >= $"t_lo" && $"ts" < $"t_hi")
        .groupBy($"win_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
        .orderBy($"win_id")
    },
    Some("""WITH iv AS (
              SELECT event_id AS win_id,
                     ts + INTERVAL 1 HOUR AS t_lo,
                     ts + INTERVAL 73 HOUR AS t_hi
              FROM events ORDER BY value DESC, event_id LIMIT 20)
            SELECT win_id, count(*) AS n_events,
                   (round(sum(value), 4) + 0.0) AS sum_value
            FROM events e JOIN iv ON e.ts >= iv.t_lo AND e.ts < iv.t_hi
            GROUP BY win_id ORDER BY win_id""")
  )

  /** Bloom-filter bits (m) and hash count (k) for the prefilter. 4096
    * bits pack into 64 longs — the filter state is a ≤64-row table
    * regardless of how many keys it encodes. */
  private val BloomBits = 4096
  private val BloomHashes = 3

  /** Runtime-filter join: a Bloom filter built from the (selective) dim
    * side prunes the fact side BEFORE the join's shuffle — Spark's own
    * runtime row-group/bloom pushdown (spark.sql.optimizer.runtimeFilter)
    * expressed declaratively, for engines/paths where the optimizer
    * doesn't inject it. At 100 TB this is sideways information passing:
    * the segment predicate keeps ~1/5 of customers, and without the
    * prefilter every orders row ships through the join shuffle only for
    * 4/5 of them to be dropped at the probe; with it, the drop happens
    * at the SCAN, so shuffle bytes fall by the filter's selectivity
    * (modulo the Bloom false-positive rate ≈ (1−e^(−kn/m))^k).
    *
    * The filter is exact-conservative (no false negatives), so the
    * result — and the oracle — is IDENTICAL to the plain join. Build:
    * each dim key sets k=3 positions of an m=4096-bit array, reduced
    * with ONE hash aggregate into ≤64 (word, bits) rows (bit_or of
    * shifted bits — the bitmap never exists as driver state). Probe:
    * the fact side computes its 3 positions in the scan projection and
    * inner-joins the broadcast word table 3× on the word index, each
    * join checking the bit — a row whose word has no set bits falls out
    * of the inner join, which IS the filter. The surviving ~selectivity
    * fraction then pays the real shuffle_hash join (kept shuffled here
    * deliberately: the pattern's value is precisely when the dim is too
    * big to broadcast — a broadcast-joinable dim wouldn't need it). */
  /** The segment-filtered dim side of the Bloom-prefilter join. */
  private[graft] def bloomDim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name")
  }

  /** The fact side AFTER the Bloom prefilter (before the real join) —
    * factored out so JoinsSpec can assert the pruning/no-false-negative
    * properties of the intermediate, which the end-to-end oracle can't
    * see. */
  /** Generic Bloom build/probe over arbitrary key columns — the same
    * dataflow as the registered query, parameterized so PropertySpec can
    * drive it with generated key universes (conservativeness must hold
    * for EVERY dim/fact split, not just the fixture's). `dim`'s
    * `dimKeyCol` builds the filter; every row of `fact` whose
    * `factKeyCol` passes all k bit probes survives, other columns ride
    * through. */
  private[graft] def bloomSurvive(dim: DataFrame, dimKeyCol: String,
                                  fact: DataFrame, factKeyCol: String): DataFrame = {
    def positions(key: org.apache.spark.sql.Column) =
      (0 until BloomHashes).map(i =>
        pmod(xxhash64(lit(i), key), lit(BloomBits)))
    // Build: k positions per key -> (word, bits) -> bit_or, <=64 rows.
    val words = dim
      .select(explode(array(positions(col(dimKeyCol)): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("word")).agg(bit_or(col("bit")).as("bits"))
    // Probe: k broadcast joins on the word index, each checking its bit.
    var out = fact
    for (i <- 0 until BloomHashes) {
      val pos = pmod(xxhash64(lit(i), col(factKeyCol)), lit(BloomBits))
      val w = words.select(col("word").as(s"w$i"), col("bits").as(s"b$i"))
      out = out
        .withColumn(s"p$i", pos)
        .join(broadcast(w), (col(s"p$i") / 64).cast("int") === col(s"w$i"))
        .filter(expr(s"shiftright(b$i, CAST(p$i % 64 AS INT)) % 2 != 0"))
        .drop(s"p$i", s"w$i", s"b$i")
    }
    out
  }

  private[graft] def bloomSurvivors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bloomSurvive(bloomDim(s, dir), "c_custkey",
      Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      "o_custkey")
  }

  val bloomPrefilter: GraftQuery = GraftQuery(
    "join_bloom_prefilter",
    (s, dir) => {
      import s.implicits._
      val dim = bloomDim(s, dir)
      // The real join, deliberately shuffled (see scaladoc).
      bloomSurvivors(s, dir)
        .join(dim.hint("shuffle_hash"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("total_spend"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, count(*) AS n_orders,
                   CAST((round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) + 0.0) AS DOUBLE)
                     AS total_spend
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY c_custkey, c_name
            ORDER BY c_custkey""")
  )

  /** Point-in-time SCD2 lookup — the feature-store correctness
    * primitive: each probe must see the dimension version that was
    * valid AT ITS OWN sequence point, never a later one (training-time
    * leakage is exactly this join done wrong). The dimension is the
    * same change log `ingest_scd2` versions (key = event_id % 1000,
    * version boundary = change seq, deletes tombstone the key); probes
    * are the purchase events at their own event_id.
    *
    * Implementation: NOT a fact ⋈ version range join (BETWEEN
    * eff_from AND eff_to is a non-equi join that degenerates to BNLJ
    * or a binned range join) — the union + running-`last` window from
    * join_asof generalizes: change rows (kind 0) and probe rows
    * (kind 1) interleave per key ordered by (seq, kind), and the
    * running last change AT each probe row IS the PIT version, with
    * the delete flag carried so a tombstoned key reads NULL (absent,
    * not stale — the SCD2 semantics). One shuffle on the key, exactly
    * like the as-of join; ties (a probe whose id IS a change seq) read
    * the version effective at that seq, matching BETWEEN semantics. */
  val scd2Pit: GraftQuery = GraftQuery(
    "join_scd2_pit",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val changes = ev.select(
        pmod($"event_id", lit(1000L)).as("k"),
        $"event_id".as("seq"),
        when(pmod($"event_id", lit(7L)) === 0, 1).otherwise(0).as("del"),
        $"value", lit(0).as("kind"))
      val probes = ev.filter($"event_type" === "purchase").select(
        pmod($"event_id", lit(1000L)).as("k"),
        $"event_id".as("seq"),
        lit(0).as("del"), lit(0.0).as("value"), lit(1).as("kind"))
      val w = Window.partitionBy($"k").orderBy($"seq", $"kind")
        .rowsBetween(Window.unboundedPreceding, 0)
      changes.unionByName(probes)
        .withColumn("v_from",
          last(when($"kind" === 0, $"seq"), ignoreNulls = true).over(w))
        .withColumn("v_del",
          last(when($"kind" === 0, $"del"), ignoreNulls = true).over(w))
        .withColumn("v_value",
          last(when($"kind" === 0, $"value"), ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .withColumn("live", $"v_del" === 0)
        .select($"seq".as("probe_id"), $"k",
          when($"live", $"v_from").as("eff_from"),
          when($"live", round($"v_value", 4)).as("value"))
        .orderBy($"probe_id")
    },
    Some("""SELECT p.event_id AS probe_id, p.event_id % 1000 AS k,
                   CASE WHEN c.del = 0 THEN c.seq END AS eff_from,
                   CASE WHEN c.del = 0 THEN round(c.value, 4) END AS value
            FROM events p
            LEFT JOIN LATERAL (
              SELECT event_id AS seq,
                     CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS del, value
              FROM events c
              WHERE c.event_id % 1000 = p.event_id % 1000
                AND c.event_id <= p.event_id
              ORDER BY c.event_id DESC LIMIT 1
            ) c ON true
            WHERE p.event_type = 'purchase'
            ORDER BY probe_id""")
  )

  /** The shared BITEMPORAL change log: every event is a dimension write
    * carrying BOTH time axes — transaction time (tx = event_id, the
    * monotone record order: when the warehouse LEARNED the fact) and
    * valid time (valid_day = the event's own day shifted back 0–15 days
    * by an md5-derived offset: what period the fact is ABOUT, with late
    * corrections reaching up to 15 days back — the out-of-order
    * restatements that make bitemporality non-trivial; an id-modulus
    * shift would phase-lock against the id-modulus key and never
    * collide, so the shift hashes). The md5 hex digit maps to an int via
    * instr('0123456789abcdef', ·) − 1 — both engines agree and no
    * hex→int conversion (whose width/sign rules differ) is needed.
    * Values are exact BIGINT cents so every readout hash-compares. */
  private[graft] def bitemporalLog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).select(
      pmod($"event_id", lit(250L)).as("k"),
      $"event_id".as("tx"),
      expr("""date_sub(to_date(ts), CAST(instr('0123456789abcdef',
                substring(md5(CAST(event_id AS STRING)), 1, 1)) - 1 AS INT))""")
        .as("valid_day"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
  }

  /** The DuckDB form of [[bitemporalLog]] — shared by both bitemporal
    * oracles. */
  private val bitemporalLogCte =
    """log AS (
        SELECT event_id % 250 AS k, event_id AS tx,
               CAST(ts AS DATE)
                 - CAST(instr('0123456789abcdef',
                     substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1
                   AS INT) AS valid_day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events)"""

  /** Transaction-time snapshot of the bitemporal log: what the warehouse
    * believed, per (key, valid day), using only writes recorded at
    * tx ≤ T — the latest restatement of each valid point wins. One
    * window partitioned by (k, valid_day): no global sort anywhere. */
  private def bitemporalSnap(s: SparkSession, log: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"k", $"valid_day").orderBy($"tx".desc)
    log.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"valid_day", $"tx", $"cents")
  }

  /** Bitemporal RESTATEMENT AUDIT — the valid-time × transaction-time
    * query auditors actually run: diff the believed valid timeline at two
    * transaction snapshots (mid-corpus T1 vs latest) and report every
    * (key, valid day) whose belief CHANGED — newly learned periods
    * ('added') and periods whose value was rewritten by a later-arriving
    * correction ('restated', with a value_changed flag separating real
    * revisions from idempotent re-writes). This is the completion of the
    * SCD2 family: ingest_scd2 versions the rows, join_scd2_pit reads one
    * probe's point-in-time version on the TX axis, and this operator
    * explains belief EVOLUTION — "what did the quarter look like when we
    * closed it vs now" (earnings restatement, late-arriving-fact
    * reconciliation, training-data drift forensics).
    *
    * Scale shape: the log scans twice (once per snapshot — at 100 TB the
    * T1 side additionally partition-prunes on tx if the log is
    * tx-partitioned, the ingest_partitioned layout); each snapshot is ONE
    * window partitioned by (k, valid_day) — per-entity-per-day groups,
    * never a global or per-key-only sort, so a hot entity spreads across
    * its days; the diff is one full-width equi join on (k, valid_day).
    * Snapshots only accumulate (tx ≤ T1 ⊂ tx ≤ T2), so 'removed' cannot
    * exist and a LEFT join is exact. T1 is a 1-row broadcast off the same
    * scan (the watermark device). */
  val bitemporalDiff: GraftQuery = GraftQuery(
    "join_bitemporal_diff",
    (s, dir) => {
      import s.implicits._
      val log = bitemporalLog(s, dir)
      val t1 = log.agg(floor(max($"tx") / 2.0).cast("long").as("t1"))
      val s1 = bitemporalSnap(s, log.crossJoin(broadcast(t1))
          .filter($"tx" <= $"t1").drop("t1"))
        .select($"k", $"valid_day", $"tx".as("tx_was"), $"cents".as("cents_was"))
      val s2 = bitemporalSnap(s, log)
      s2.join(s1.hint("shuffle_hash"), Seq("k", "valid_day"), "left")
        .filter($"tx_was".isNull || $"tx_was" =!= $"tx")
        .select($"k", $"valid_day",
          when($"tx_was".isNull, lit("added")).otherwise(lit("restated"))
            .as("status"),
          $"cents_was", $"cents".as("cents_now"),
          $"tx_was", $"tx".as("tx_now"),
          ($"tx_was".isNotNull && $"cents_was" =!= $"cents")
            .as("value_changed"))
        .orderBy($"k", $"valid_day")
    },
    Some(s"""WITH $bitemporalLogCte,
            t AS (SELECT CAST(floor(max(tx) / 2.0) AS BIGINT) AS t1 FROM log),
            s1 AS (SELECT k, valid_day, tx AS tx_was, cents AS cents_was
                   FROM (SELECT log.*, row_number() OVER (
                           PARTITION BY k, valid_day ORDER BY tx DESC) AS rn
                         FROM log CROSS JOIN t WHERE tx <= t1)
                   WHERE rn = 1),
            s2 AS (SELECT k, valid_day, tx, cents
                   FROM (SELECT log.*, row_number() OVER (
                           PARTITION BY k, valid_day ORDER BY tx DESC) AS rn
                         FROM log)
                   WHERE rn = 1)
            SELECT s2.k, s2.valid_day,
                   CASE WHEN s1.tx_was IS NULL THEN 'added'
                        ELSE 'restated' END AS status,
                   s1.cents_was, s2.cents AS cents_now,
                   s1.tx_was, s2.tx AS tx_now,
                   (s1.tx_was IS NOT NULL AND s1.cents_was <> s2.cents)
                     AS value_changed
            FROM s2 LEFT JOIN s1
              ON s2.k = s1.k AND s2.valid_day = s1.valid_day
            WHERE s1.tx_was IS NULL OR s1.tx_was <> s2.tx
            ORDER BY s2.k, s2.valid_day""")
  )

  /** Bitemporal POINT-IN-TIME probe on the VALID axis — the backtest
    * join: "using everything we know NOW (latest transaction snapshot),
    * what was true AT each probe's own valid day?" Each purchase probe
    * reads the believed version whose valid_day is the latest ≤ its own
    * day — never a later period's value (look-ahead leakage is exactly
    * this join done wrong). Completes the bitemporal triangle:
    * join_scd2_pit walks the TX axis per probe, join_bitemporal_diff
    * diffs two TX snapshots, and this walks the VALID axis under a fixed
    * TX snapshot; the general per-probe (t, v) form is this same plan run
    * per report-time partition (the nightly-snapshot-view pattern).
    *
    * Implementation: NOT a probe ⋈ version range join (the non-equi
    * BETWEEN degenerates to BNLJ / version-count blowup on hot keys) —
    * the union + running-`last` interleave from join_asof: snapshot rows
    * (kind 0) and probes (kind 1) per key ordered by (valid_day, kind),
    * the running last snapshot row AT each probe IS the PIT version, a
    * probe landing ON a version's valid_day reads it (kind 0 sorts
    * first). One shuffle on the key; the snapshot window partitions by
    * (k, valid_day). */
  val bitemporalPit: GraftQuery = GraftQuery(
    "join_bitemporal_pit",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val snap = bitemporalSnap(s, bitemporalLog(s, dir))
        .select($"k", $"valid_day", $"cents", lit(0).as("kind"),
          lit(null).cast("long").as("probe_id"))
      val probes = Tables.events(s, dir).filter($"event_type" === "purchase")
        .select(pmod($"event_id", lit(250L)).as("k"),
          to_date($"ts").as("valid_day"),
          lit(null).cast("long").as("cents"), lit(1).as("kind"),
          $"event_id".as("probe_id"))
      val w = Window.partitionBy($"k").orderBy($"valid_day", $"kind")
        .rowsBetween(Window.unboundedPreceding, 0)
      // ONE last(struct) carries both snapshot fields, so they always
      // come from the SAME snapshot row — two independent
      // last(..., ignoreNulls) windows would pick different rows if a
      // snapshot ever carried a NULL cents (the oracle's LATERAL is
      // single-row by construction).
      snap.unionByName(probes)
        .withColumn("eff",
          last(when($"kind" === 0, struct($"valid_day", $"cents")),
            ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"probe_id", $"k", $"eff.valid_day".as("eff_valid_day"),
          $"eff.cents".as("cents"))
        .orderBy($"probe_id")
    },
    Some(s"""WITH $bitemporalLogCte,
            snap AS (SELECT k, valid_day, cents
                     FROM (SELECT log.*, row_number() OVER (
                             PARTITION BY k, valid_day ORDER BY tx DESC) AS rn
                           FROM log)
                     WHERE rn = 1)
            SELECT p.event_id AS probe_id, p.event_id % 250 AS k,
                   c.valid_day AS eff_valid_day, c.cents
            FROM events p
            LEFT JOIN LATERAL (
              SELECT valid_day, cents FROM snap
              WHERE snap.k = p.event_id % 250
                AND snap.valid_day <= CAST(p.ts AS DATE)
              ORDER BY valid_day DESC LIMIT 1
            ) c ON true
            WHERE p.event_type = 'purchase'
            ORDER BY probe_id""")
  )

  /** Grid-bucketed SPATIAL self-join — all point pairs within radius R
    * in a 2-D plane, the geo/feature-space neighbor primitive (store
    * proximity, sensor clustering, embedding-projection neighborhoods).
    * The naive form is the O(N²) cross join; the scale form here is the
    * classic fixed-grid bucketing: snap each point to an R×R cell, join
    * one side's 3×3 cell NEIGHBORHOOD (a 9-row generator explode, no
    * shuffle) against the other side's actual cell, then apply the
    * exact distance predicate as the join residual. Each qualifying
    * pair matches exactly once (b's cell appears once in a's
    * neighborhood), so no dedup pass is needed; cost is
    * O(N · 9 · density), never O(N²), and the shuffle keys on the cell
    * id — the spatial analog of join_range_binned's 1-D binning. At
    * 100 TB: same plan with a finer grid; skewed cells (cities) take
    * the documented salting/AQE-skew path.
    *
    * The fixture ships no geo columns, so the point cloud derives
    * deterministically from the customer key via a cascaded-modulus
    * mix (two rounds of multiply-mod over distinct primes — a single
    * LCG round leaves a visible lattice with NO near pairs at small N;
    * the cascade scatters all three SFs). Integer coordinates make
    * dist² an exact BIGINT in both engines — no floating boundary
    * anywhere. */
  val spatialGrid: GraftQuery = GraftQuery(
    "join_spatial_grid",
    (s, dir) => {
      import s.implicits._
      val R = 100L
      val pts = Tables.customer(s, dir).select($"c_custkey".as("id"),
          expr("((c_custkey * 2654435761) % 1000003) % 10000").as("x"),
          expr("((((c_custkey * 2654435761) % 1000003) * 40503 + 7919) % 999983) % 10000")
            .as("y"))
        .withColumn("cx", expr(s"x div $R"))
        .withColumn("cy", expr(s"y div $R"))
        .localCheckpoint() // both sides of the self-join read it
      val probe = pts
        .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("ncx", $"cx" + $"dx")
        .withColumn("ncy", $"cy" + $"dy")
      probe.as("a")
        .join(pts.as("b").hint("shuffle_hash"),
          $"a.ncx" === $"b.cx" && $"a.ncy" === $"b.cy" && $"a.id" < $"b.id")
        .select($"a.id".as("a_id"), $"b.id".as("b_id"),
          (($"a.x" - $"b.x") * ($"a.x" - $"b.x")
            + ($"a.y" - $"b.y") * ($"a.y" - $"b.y")).as("dist2"))
        .filter($"dist2" <= R * R)
        .orderBy($"a_id", $"b_id")
    },
    Some("""WITH p AS (
              SELECT c_custkey AS id,
                     ((c_custkey * 2654435761) % 1000003) % 10000 AS x,
                     ((((c_custkey * 2654435761) % 1000003) * 40503 + 7919) % 999983) % 10000 AS y
              FROM customer),
            g AS (SELECT *, x // 100 AS cx, y // 100 AS cy FROM p),
            n AS (
              SELECT g.*, cx + dx.d AS ncx, cy + dy.d AS ncy
              FROM g
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy)
            SELECT a.id AS a_id, b.id AS b_id,
                   (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
            FROM n a JOIN g b
              ON a.ncx = b.cx AND a.ncy = b.cy AND a.id < b.id
            WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 10000
            ORDER BY a_id, b_id""")
  )

  def all: Seq[GraftQuery] = Seq(
    innerHash, broadcastDim, leftOuter, rightOuter, fullOuter,
    semi, anti, thetaRange, multiway, rangeBinned, bloomPrefilter,
    scd2Pit, bitemporalDiff, bitemporalPit, spatialGrid)
}
