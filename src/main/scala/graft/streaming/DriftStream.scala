package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.operators.Analytics
import graft.sources.Tables

/** Streaming drift monitor — the micro-batch twin of `agg_ks_test`
  * (SURVEY.md §2b): as event waves land, each micro-batch contributes its
  * own per-value (cents, c1, c2) COUNT PARTIALS, and the serve step merges
  * them into the exact ECDF deviation. This is the monitor a training
  * pipeline keeps running against the live feed: "has the purchase-value
  * distribution drifted from the view-value distribution (or a frozen
  * reference cohort) since the last deploy?"
  *
  * Why the merge is EXACT at any wave split: the partials are integer
  * counts keyed by exact cents — associative and commutative under sum —
  * so Σ waves == the one-pass batch counts bit-for-bit, and everything
  * downstream (cumulative sums, the |cum₁·n₂ − cum₂·n₁| fold, the one
  * final division) is the identical BIGINT arithmetic `agg_ks_test` runs.
  * No double ever appears in a partial (the stream_resample lesson: a
  * double partial makes the merge order-sensitive). The oracle is the
  * batch twin's verbatim: batching must not change the one output row.
  *
  * Scale shape: each wave's partial is one hash aggregate bounded by the
  * value DOMAIN (~56k cents), so the appended state is waves × domain
  * rows, not waves × events; the merge re-aggregates domain-sized input.
  * Emulated arrival (event-id ranges + localCheckpoint per wave = one DAG
  * per micro-batch) per the repo's streaming-emulation convention; the
  * checkpointed kill/restart discipline is covered by the foreachBatch
  * drives in StreamingSpec for the same partial-merge pattern. */
object DriftStream {

  private val Waves = 3

  val streamKsDrift: GraftQuery = GraftQuery(
    "stream_ks_drift",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select($"event_id", $"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"cv")
          .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c1"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
          .localCheckpoint()
      }
      val counts = partials.reduce(_.unionAll(_))
        .groupBy($"cv").agg(sum($"c1").as("c1"), sum($"c2").as("c2"))
      val w = Window.orderBy($"cv")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = counts
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("cum2", sum($"c2").over(w))
        .localCheckpoint()
      val tot = cum.agg(max($"cum1").as("n1"), max($"cum2").as("n2"))
      cum.crossJoin(broadcast(tot))
        .agg(first($"n1").as("n1"), first($"n2").as("n2"),
          max(abs($"cum1" * $"n2" - $"cum2" * $"n1")).as("d_num"))
        .select($"n1", $"n2", $"d_num",
          ($"n1" * $"n2").as("d_den"),
          ($"d_num".cast("double") / ($"n1" * $"n2").cast("double")).as("d"))
    },
    // Batching must not change the one output row: the oracle is the
    // batch KS test's, verbatim.
    Analytics.ksTest.oracle
  )

  /** Streaming experiment monitor — the micro-batch twin of
    * `agg_ttest_welch`: each wave contributes one row of BIGINT
    * sufficient-statistic partials (n, Σcents, Σcents²) per cohort, and
    * the serve step sums them and applies the identical Welch fold. This
    * is the live A/B dashboard number: "is the purchase mean moving away
    * from the view mean as data lands?" — recomputed exactly per wave
    * without ever re-reading old events.
    *
    * The merge is EXACT at any wave split for the same reason as
    * stream_ks_drift: counts and integer sums are associative, so
    * Σ waves == the one-pass batch statistics bit-for-bit, and t/df are
    * the same scalar folds of identical doubles. The appended state is
    * ONE ROW per wave — the cheapest streaming state in the registry
    * (the KS monitor keeps domain-sized partials; the t monitor keeps
    * six BIGINTs). Oracle = the batch twin's, verbatim. */
  val streamTtest: GraftQuery = GraftQuery(
    "stream_ttest",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select($"event_id", $"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .agg(
            sum(when($"event_type" === "view", 1L).otherwise(0L)).as("n1"),
            sum(when($"event_type" === "view", $"cv").otherwise(0L)).as("s1"),
            sum(when($"event_type" === "view", $"cv" * $"cv").otherwise(0L)).as("q1"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n2"),
            sum(when($"event_type" === "purchase", $"cv").otherwise(0L)).as("s2"),
            sum(when($"event_type" === "purchase", $"cv" * $"cv").otherwise(0L)).as("q2"),
            max(abs($"cv")).as("mc")) // overflow-guard bound, merges under max
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .agg(sum($"n1").as("n1"), sum($"s1").as("s1"), sum($"q1").as("q1"),
          sum($"n2").as("n2"), sum($"s2").as("s2"), sum($"q2").as("q2"),
          max($"mc").as("mc"))
      merged
        .withColumn("md_num", $"s1" * $"n2" - $"s2" * $"n1")
        .withColumn("v1_num", $"n1" * $"q1" - $"s1" * $"s1")
        .withColumn("v2_num", $"n2" * $"q2" - $"s2" * $"s2")
        .withColumn("va", $"v1_num".cast("double")
          / ($"n1" * $"n1" * ($"n1" - 1L)).cast("double"))
        .withColumn("vb", $"v2_num".cast("double")
          / ($"n2" * $"n2" * ($"n2" - 1L)).cast("double"))
        .select($"n1", $"n2", $"md_num", $"v1_num", $"v2_num",
          // Same headroom enforcement as the batch twin (nQ <= N^2 max|c|^2).
          graft.GraftQuery.guarded(
            $"md_num".cast("double") / ($"n1" * $"n2").cast("double")
              / sqrt($"va" + $"vb"),
            pow(($"n1" + $"n2").cast("double"), 2.0) *
              pow($"mc".cast("double"), 2.0) < 9.0e18,
            "stream_ttest: BIGINT sufficient statistics near overflow — " +
              "shift the Q accumulator to DECIMAL(38,0)").as("t"),
          (($"va" + $"vb") * ($"va" + $"vb")
            / ($"va" * $"va" / ($"n1" - 1L).cast("double")
              + $"vb" * $"vb" / ($"n2" - 1L).cast("double"))).as("df"))
    },
    // Batching must not change the one output row: the oracle is the
    // batch Welch test's, verbatim.
    Analytics.ttestWelch.oracle
  )

  /** Streaming shift locator — the micro-batch twin of `ts_changepoint`:
    * each wave appends per-(type, day) BIGINT cent-sum partials, the
    * merge re-aggregates them into the exact daily frame, and the
    * identical AMOC gain-argmax fold answers "WHEN did the metric
    * shift?" against the full history without re-reading old events.
    * Integer partials keyed by (type, day) are associative at any wave
    * split — Σ waves == the one-pass daily frame bit-for-bit — so the
    * oracle is the batch twin's verbatim. Appended state is
    * waves × (types·days) rows, not waves × events. */
  val streamChangepoint: GraftQuery = GraftQuery(
    "stream_changepoint",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"event_type", to_date($"ts").as("d"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"event_type", $"d").agg(sum($"cv").as("v"))
          .localCheckpoint()
      }
      val daily = partials.reduce(_.unionAll(_))
        .groupBy($"event_type", $"d").agg(sum($"v").as("v"))
      graft.operators.TimeSeries.changepointFold(daily)
    },
    // Batching must not move the located split: the oracle is the batch
    // changepoint's, verbatim.
    graft.operators.TimeSeries.changepoint.oracle
  )

  /** Streaming shape monitor — the micro-batch twin of `agg_moments`,
    * completing the monitor quartet (KS: distribution, t: mean,
    * changepoint: when, moments: SHAPE — a fattening tail moves kurtosis
    * long before it moves the mean). Each wave appends one row of the
    * six exact sufficient statistics per event type (n, Σc, Σc², Σc³,
    * and the algebraic hi/lo halves of Σc⁴); the merge sums them —
    * integer partials, associative at any wave split, and the p4 halves
    * need no normalization (hi·1e9 + lo is the exact integer either
    * way) — and the shared fold emits the identical skew/kurt doubles.
    * Oracle = the batch twin's verbatim. */
  val streamMoments: GraftQuery = GraftQuery(
    "stream_moments",
    (s, dir) => {
      import s.implicits._
      val rows = graft.operators.Analytics.momentRows(s, dir)
      val bounds = rows.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val aggs = graft.operators.Analytics.momentAggs
      val partials = (0 until Waves).map { k =>
        rows.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"event_type").agg(aggs.head, aggs.tail: _*)
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"event_type")
        .agg(sum($"n").as("n"), sum($"s").as("s"), sum($"q").as("q"),
          sum($"c3").as("c3"), sum($"p4_hi").as("p4_hi"), sum($"p4_lo").as("p4_lo"),
          max($"mc").as("mc")) // the overflow-guard bound merges under max
      graft.operators.Analytics.momentsFold(merged)
    },
    // Batching must not move the shape statistics: the oracle is the
    // batch moments', verbatim.
    graft.operators.Analytics.moments.oracle
  )

  /** Streaming label-balance monitor — the micro-batch twin of
    * `agg_entropy`, extending the monitor quartet with the CLASS-MIX
    * alarm ("did today's labels collapse to one class as data landed?").
    * Each wave appends per-day conditional count partials over the fixed
    * event-type domain (5 BIGINT columns — the agg_anova device, so the
    * entropy fold stays a fixed-order scalar chain, never an unordered
    * double sum); the merge sums them per day — integer partials,
    * associative at any wave split, Σ waves == the one-pass daily counts
    * bit-for-bit — and the shared fold emits the identical entropy rows.
    * Appended state is waves × days rows of k integers. Oracle = the
    * batch twin's, verbatim. */
  val streamEntropy: GraftQuery = GraftQuery(
    "stream_entropy",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", to_date($"ts").as("d"), $"event_type")
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val aggs = Analytics.entropyAggs
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"d").agg(aggs.head, aggs.tail: _*)
          .localCheckpoint()
      }
      val idx = Analytics.entropyTypes.indices
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"d")
        .agg(sum(col("c0")).as("c0"),
          idx.tail.map(i => sum(col(s"c$i")).as(s"c$i")): _*)
      Analytics.entropyFold(merged)
    },
    // Batching must not change any day's entropy row: the oracle is the
    // batch label-balance monitor's, verbatim.
    Analytics.entropy.oracle
  )

  /** Streaming integrity monitor — the micro-batch twin of
    * `fn_checksum`: each wave appends per-day XOR digest partials, and
    * because BIT_XOR is associative, commutative AND closed on 64 bits,
    * the merge is just XOR again — the cheapest exactly-mergeable
    * streaming state in the registry (one BIGINT per day per wave, no
    * overflow condition at ANY scale, unlike sum-based partials). This
    * is how a replication pipeline verifies continuously: each side
    * folds digests as data lands and the per-day comparison never
    * requires re-reading history. Oracle = the batch twin's, verbatim. */
  val streamChecksum: GraftQuery = GraftQuery(
    "stream_checksum",
    (s, dir) => {
      import s.implicits._
      val rows = Tables.events(s, dir)
        .select($"event_id", to_date($"ts").as("d"),
          expr("""CAST(conv(substring(md5(concat(
                    CAST(event_id AS STRING), '|', event_type, '|',
                    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)
                  )), 1, 12), 16, 10) AS BIGINT)""").as("h"))
      val bounds = rows.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        rows.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"d")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("checksum"))
          .localCheckpoint()
      }
      partials.reduce(_.unionAll(_))
        .groupBy($"d")
        .agg(sum($"n").as("n"), expr("bit_xor(checksum)").as("checksum"))
        .orderBy($"d")
    },
    // Batching must not change a single day's digest: the oracle is the
    // batch checksum's, verbatim.
    graft.functions.ScalarQueries.fnChecksum.oracle
  )

  /** Streaming uncertainty monitor — the micro-batch twin of
    * `agg_bootstrap_ci`: each wave appends per-(type, day) integer cent
    * partials, the merge sums them (exact at any arrival split), and
    * the shared Poisson-bootstrap fold resamples the MERGED daily frame
    * — the md5 uniforms key on the frame's (type, day, b) VALUES, not
    * on arrival order, so the served CI is bit-equal to the batch CI.
    * This is the live form of "is today's mean shift outside the
    * interval?": recurring cost is O(batch) + a domain-sized fold,
    * never a rescan. Graded over the deterministic 3-way event_id
    * split against the batch oracle verbatim. */
  val streamBootstrapCi: GraftQuery = GraftQuery(
    "stream_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val partials = (0 until 3).map { k =>
        ev.filter(pmod($"event_id", lit(3)) === k)
          .groupBy($"event_type", to_date($"ts").as("d"))
          .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))")
            .as("v"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"event_type", $"d")
        .agg(sum($"v").as("v")) // wave merge: exact integer addition
      graft.operators.Analytics.bootstrapFold(merged)
    },
    // The fold is value-keyed, so batching cannot move the interval:
    // the oracle is the batch bootstrap's, verbatim.
    graft.operators.Analytics.bootstrapCi.oracle
  )

  /** Streaming effect-size monitor — the micro-batch twin of
    * `agg_effect_size`: the maintained state is the (distinct-cents,
    * purchase-count, view-count) table, and integer counts are exactly
    * mergeable under ANY arrival split, so the served Cohen's d /
    * Hedges' g / CLES are bit-equal to batch (shared effectFold — the
    * twins cannot drift). This is the effect-size line on a live
    * experiment dashboard: per-wave cost is one count aggregate over
    * the batch, merged state is bounded by the distinct-cents domain,
    * and no event is ever re-read. Oracle = the batch readout's,
    * verbatim. */
  val streamEffectSize: GraftQuery = GraftQuery(
    "stream_effect_size",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("view", "purchase"))
        .select($"event_id", $"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"cv")
          .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c1"),
            sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c2"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"cv").agg(sum($"c1").as("c1"), sum($"c2").as("c2"))
      Analytics.effectFold(merged)
    },
    // Batching must not move d, g, or CLES: the oracle is the batch
    // effect-size readout's, verbatim.
    Analytics.effectSize.oracle
  )

  /** Streaming price-index monitor — the micro-batch twin of
    * `agg_price_index`: the maintained state is the (part, year) revenue
    * and quantity sums, exactly mergeable integer partials under ANY
    * arrival split; the matched-basket Laspeyres/Paasche/Fisher fold
    * (shared priceFold) serves bit-equal indices — this is how a price
    * dashboard tracks inflation against a live order stream without
    * re-reading history. Waves split on l_orderkey (the lineitem
    * arrival key). Oracle = the batch indices', verbatim. */
  val streamPriceIndex: GraftQuery = GraftQuery(
    "stream_price_index",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_partkey", year($"l_shipdate").as("yr"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("pc"),
          expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("qc"))
      val bounds = li.agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        li.join(broadcast(bounds),
            $"l_orderkey" > edge(k) && $"l_orderkey" <= edge(k + 1))
          .groupBy($"l_partkey".as("pk"), $"yr")
          .agg(sum($"pc").as("rev"), sum($"qc").as("qty"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"pk", $"yr")
        .agg(sum($"rev").as("rev"), sum($"qty").as("qty"))
        .localCheckpoint()
      Analytics.priceFold(merged)
    },
    // Batching must not move one index: the oracle is the batch
    // matched-basket indices', verbatim.
    Analytics.priceIndex.oracle
  )

  /** Streaming feature-signal monitor — the micro-batch twin of
    * `agg_mutual_info`: each wave contributes (event_type, value-bucket)
    * COUNT partials (integer, exactly mergeable under any arrival
    * split); the shared miFold serves bit-equal MI/NMI — the live "has
    * the metric decoupled from the segment" drift light next to
    * stream_ks_drift's distribution alarm. State is bounded by the
    * ≤50-cell domain × waves. Oracle = the batch MI's, verbatim. */
  val streamMutualInfo: GraftQuery = GraftQuery(
    "stream_mutual_info",
    (s, dir) => {
      import s.implicits._
      val src = Analytics.miCellsSource(s, dir)
      val bounds = src.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        src.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"t", $"vb").agg(count(lit(1)).as("n"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"t", $"vb").agg(sum($"n").as("n"))
      Analytics.miFold(merged)
    },
    Analytics.mutualInfo.oracle
  )

  /** Streaming always-valid A/B monitor — the micro-batch twin of
    * `agg_msprt` (and the op whose SEMANTICS are inherently streaming:
    * mSPRT exists precisely because dashboards are watched while data
    * lands): each wave contributes per-(arm, day) BIGINT sufficient
    * statistics; the merge re-sums them and the shared msprtFold serves
    * the bit-equal cumulative log Λ path. State is (arms × days) rows
    * per wave. Oracle = the batch twin's, verbatim. */
  val streamMsprt: GraftQuery = GraftQuery(
    "stream_msprt",
    (s, dir) => {
      import s.implicits._
      val src = Analytics.msprtSource(s, dir)
      val bounds = src.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        Analytics.msprtDaily(
          src.join(broadcast(bounds),
            $"event_id" > edge(k) && $"event_id" <= edge(k + 1)))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"arm", $"day")
        .agg(sum($"dn").as("dn"), sum($"dsc").as("dsc"), sum($"dsc2").as("dsc2"))
      Analytics.msprtFold(merged)
    },
    Analytics.msprt.oracle
  )

  /** Streaming cointegration monitor — the micro-batch twin of
    * `ts_cointegration` (r15 verdict item 3): the live answer to "is the
    * click/purchase revenue pair still mean-reverting, or has the spread
    * started drifting?" — the regime-change alarm a pricing or
    * forecasting pipeline keeps against the landing feed. Each wave
    * contributes per-(event_type, day) BIGINT cents-sum partials; the
    * merge re-sums them per day and the shared Engle–Granger fold
    * (TimeSeries.cointegrationFold) serves the identical OLS → quantized
    * residuals → ADF-t chain.
    *
    * Why the merge is EXACT at any arrival split: a day's cents total is
    * an associative integer sum, so Σ waves == the one-pass daily table
    * bit-for-bit; the fold's stage-2 statistics are sums of exact
    * BIGINTs over QUANTIZED residuals (identical alpha/beta doubles →
    * identical IEEE residuals → identical floors — the r15 device), so
    * no double partial ever crosses a wave boundary. State is
    * O(types × days) rows per wave — day-domain-sized, never O(events).
    * Oracle = the batch twin's, verbatim. */
  val streamCointegration: GraftQuery = GraftQuery(
    "stream_cointegration",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"event_type", to_date($"ts").as("d"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds),
            $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"event_type", $"d").agg(sum($"c").as("v"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"event_type", $"d").agg(sum($"v").as("v"))
      graft.operators.TimeSeries.cointegrationFold(s, merged)
    },
    graft.operators.TimeSeries.cointegration.oracle
  )

  def all: Seq[GraftQuery] = Seq(streamKsDrift, streamTtest, streamChangepoint,
    streamMoments, streamEntropy, streamChecksum, streamBootstrapCi,
    streamEffectSize, streamPriceIndex, streamMutualInfo, streamMsprt,
    streamCointegration)
}
