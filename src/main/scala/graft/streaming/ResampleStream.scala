package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.operators.TimeSeries
import graft.sources.Tables

/** Streaming OHLC resample — `ts_resample`'s per-(user, day) downsample as
  * an arrival-graded incremental pipeline (the `stream_dedup_incremental`
  * pattern applied to pre-aggregation).
  *
  * The production shape: each micro-batch reduces its own events to
  * per-(user, day) OHLC PARTIALS — (n, sum_v, first/last offset, open,
  * close, lo, hi) — and appends them to a partials sink; serving merges
  * partials with the associative combine below. Every recurring cost is
  * O(batch); the raw events are never re-scanned. This is exactly how a
  * feature store keeps day-level candles current against an event stream,
  * and the combine is the same algebra a stateful streaming aggregate
  * applies per update. StreamingSpec drives the true form (file-source
  * readStream + checkpoint + foreachBatch appending partials over two
  * arrival waves, merge grading against the batch answer).
  *
  * The graded form batch-emulates three arrival waves as contiguous
  * event_id ranges (arrival order IS offset order for a log-structured
  * source — the ingest_incremental watermark contract). Merging must not
  * change one row: open/close anchor on the monotone offset, so the
  * merged open is the partial open with the smallest first-offset
  * (min_by), close symmetric, n/sum/lo/hi fold trivially, and the mean
  * re-derives from (Σ cents / Σ n) — never an average of averages, and
  * the cents partials are EXACT BIGINTs, so the merged mean equals the
  * batch twin's scaled-integer mean at any wave split (a double partial
  * would make the merge order-sensitive). min/max partials carry raw
  * doubles; rounding happens once, at the final merge projection
  * (oracle-determinism rule). The oracle is ts_resample's verbatim:
  * batching must not change one row.
  */
object ResampleStream {

  /** Number of emulated arrival waves in the graded form. */
  private val Waves = 3

  val streamResample: GraftQuery = GraftQuery(
    "stream_resample",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"value")
      // Offset span as one broadcast 1-row frame — the wave split stays
      // declarative (no driver collect), as in stream_dedup_incremental.
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
          .agg(count(lit(1)).as("n"),
            // exact cents partial (BIGINT): the final mean must merge to
            // ts_resample's scaled-integer mean bit-for-bit, and integer
            // partials are associative at ANY wave split — a double
            // sum_v would make the merged mean depend on wave order
            expr("sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))")
              .as("sum_c"),
            min($"event_id").as("first_eid"),
            min_by($"value", $"event_id").as("open"),
            max($"event_id").as("last_eid"),
            max_by($"value", $"event_id").as("close"),
            min($"value").as("lo_v"),
            max($"value").as("hi_v"))
          // Materialize each wave's (users × days)-sized partial eagerly —
          // one DAG per micro-batch, exactly how the true streaming form
          // executes, instead of a 3-wave mega-plan re-deriving the
          // shared scan three times in one first execution.
          .localCheckpoint()
      }
      partials.reduce(_.unionAll(_))
        .groupBy($"user_id", $"day")
        .agg(sum($"n").as("n"),
          round(min_by($"open", $"first_eid"), 4).as("open"),
          round(max_by($"close", $"last_eid"), 4).as("close"),
          round(min($"lo_v"), 4).as("lo"),
          round(max($"hi_v"), 4).as("hi"),
          (expr("sum(sum_c) div sum(n)").cast("double") / 10000.0).as("avg_v"))
        .orderBy($"user_id", $"day")
    },
    // Batching must not change one row: the oracle is the batch resample.
    TimeSeries.resample.oracle
  )

  /** Streaming engagement monitor — the micro-batch twin of
    * `ts_active_users`: each wave appends its DISTINCT (user, day)
    * pairs (presence rows — the dedup-state discipline: an active-user
    * metric's minimal exactly-mergeable state IS the key set; a count
    * partial cannot merge across waves because the same user can land
    * in two waves), the merge re-distincts the union, and the shared
    * DAU/WAU fold serves identical rows. State is O(active pairs) —
    * bounded by users × days, not events; the HLL-sketch form
    * (agg_sketch_merge's pattern) is the constant-state alternative
    * when approximate WAU suffices. Oracle = the batch twin's,
    * verbatim. */
  val streamActiveUsers: GraftQuery = GraftQuery(
    "stream_active_users",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", to_date($"ts").as("d"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): org.apache.spark.sql.Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(3.0)).cast("long")
      val partials = (0 until 3).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .select($"user_id", $"d").distinct()
          .localCheckpoint()
      }
      graft.operators.TimeSeries.activeUsersFold(
        partials.reduce(_.unionAll(_)).distinct())
    },
    // Batching must not change a day's actives: the oracle is the batch
    // engagement readout's, verbatim.
    graft.operators.TimeSeries.activeUsers.oracle
  )

  /** Streaming association-rule maintenance — the micro-batch twin of
    * `agg_assoc_rules`: the maintained state is the DISTINCT (user, day,
    * type) basket-item set, and set union is associative AND idempotent,
    * so per-wave distinct partials merge into exactly the batch frame
    * under ANY arrival split — including the hard case a count-partial
    * design gets wrong: a basket whose items land in different waves
    * (type A in wave 1, type B in wave 2) contributes the (A, B) pair
    * only at the merged level, never per-wave. The rule fold then runs
    * on the merged state (shared assocFold — the twins cannot drift).
    * Per-wave cost is one distinct aggregate over the batch; merged
    * state is bounded by baskets × |types|; raw events are never
    * re-scanned. Oracle = the batch rules', verbatim. */
  val streamAssocRules: GraftQuery = GraftQuery(
    "stream_assoc_rules",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", to_date($"ts").as("d"), $"event_type")
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .select($"user_id", $"d", $"event_type").distinct()
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_)).distinct().localCheckpoint()
      graft.operators.Analytics.assocFold(merged)
    },
    // Batching must not move one rule: the oracle is the batch table's.
    graft.operators.Analytics.assocRules.oracle
  )

  /** Streaming survival maintenance — the micro-batch twin of
    * `agg_survival_km`: the maintained state is one (first_day,
    * last_day) span per user, and min/max partials are associative and
    * commutative, so per-wave spans merge into exactly the batch user
    * frame under ANY arrival split; the product-limit fold (shared
    * survivalFold) then serves identical curves — INCLUDING the censor
    * edge dmax, which re-derives from the merged spans. This is how a
    * retention dashboard stays current against the event stream: per-
    * wave cost is one user aggregate over the batch, merged state is one
    * row per user, and history is never re-scanned (a user's span only
    * ever widens — the monotone-state property that makes survival
    * exactly maintainable). Oracle = the batch estimator's, verbatim. */
  val streamSurvivalKm: GraftQuery = GraftQuery(
    "stream_survival_km",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", to_date($"ts").as("dd"))
      val bounds = ev.agg(min($"event_id").as("lo"), max($"event_id").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        ev.join(broadcast(bounds), $"event_id" > edge(k) && $"event_id" <= edge(k + 1))
          .groupBy($"user_id")
          .agg(min($"dd").as("fd"), max($"dd").as("ld"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"user_id")
        .agg(min($"fd").as("fd"), max($"ld").as("ld"))
      graft.operators.Analytics.survivalFold(merged)
    },
    // Batching must not move one curve point: the oracle is the batch
    // estimator's, verbatim.
    graft.operators.Analytics.survivalKm.oracle
  )

  def all: Seq[GraftQuery] = Seq(streamResample, streamActiveUsers,
    streamAssocRules, streamSurvivalKm)
}
