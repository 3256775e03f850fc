package graft.streaming

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Event-time windowing and stateful-dedup operators (SURVEY.md §2b
  * "Streaming"). Each is expressed with the same `window()` /
  * `session_window()` / `dropDuplicates` primitives Structured Streaming
  * executes incrementally — here run in batch mode so the DuckDB oracle can
  * grade them; StreamingSpec drives the same pipelines through
  * MemoryStream with watermarks to cover the streaming-only semantics
  * (late-data drop, checkpoint resume).
  *
  * Scale notes: tumbling/sliding windows are hash aggregates on (window,
  * key) — partial aggregation map-side, shuffle carries one row per
  * (window × key). Session windows shuffle by user_id then merge sorted
  * runs per key — the streaming form keeps per-key state bounded by the
  * watermark.
  */
object StreamQueries {

  /** Tumbling 1-hour windows: count + sum per (window, event_type). */
  val tumbling: GraftQuery = GraftQuery(
    "stream_tumbling",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select($"window.start".as("wstart"), $"event_type", $"n", $"sum_value")
        .orderBy($"wstart", $"event_type")
    },
    Some("""SELECT date_trunc('hour', ts) AS wstart, event_type,
                   count(*) AS n, (round(sum(value), 4) + 0.0) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""")
  )

  /** Sliding windows (1 hour long, 15-minute slide): each event lands in 4
    * windows. Oracle reconstructs the window set arithmetically. */
  val sliding: GraftQuery = GraftQuery(
    "stream_sliding",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start".as("wstart"), $"event_type", $"n")
        .orderBy($"wstart", $"event_type")
    },
    Some("""SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                                  - CAST(k.k AS BIGINT) * 900000000) AS wstart,
                   event_type, count(*) AS n
            FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
            GROUP BY 1, 2 ORDER BY wstart, event_type""")
  )

  /** Session windows per user (10-minute gap). Spark's session end is
    * last-event-time + gap; the oracle mirrors that via gaps-and-islands. */
  val session: GraftQuery = GraftQuery(
    "stream_session",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "10 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
        .select($"user_id", $"session_window.start".as("session_start"),
                $"session_window.end".as("session_end"), $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH flagged AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            numbered AS (
              SELECT user_id, ts, value,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL '10 minutes' AS session_end,
                   count(*) AS n_events, (round(sum(value), 4) + 0.0) AS sum_value
            FROM numbered GROUP BY user_id, sid
            ORDER BY user_id, session_start""")
  )

  /** Offset-keyed dedup (the stateful `dropDuplicates` shape; streaming
    * form is dropDuplicatesWithinWatermark — StreamingSpec). The input is
    * doubled so the dedup collapses real duplicates. */
  val dedup: GraftQuery = GraftQuery(
    "stream_dedup",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"event_id", $"event_type")
      // replay dedup as a pure hash aggregate: dropDuplicates("event_id")
      // plans a sort-based partial_first (string agg buffers can't hash-agg),
      // but replayed records are bit-identical rows, so full-row distinct()
      // — strings in the GROUP BY key, empty buffer — dedups in
      // HashAggregate with no per-partition sort at 100 TB.
      ev.union(ev)
        .distinct()
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(DISTINCT event_id) AS n
            FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
            GROUP BY event_type ORDER BY event_type""")
  )

  /** Watermark late-data accounting, batch-emulated exactly as Structured
    * Streaming defines it: a record is late if its event time is below the
    * watermark — the max event time seen in *earlier* arrivals (arrival
    * order = event_id, the offset) minus the delay. StreamingSpec drives
    * the same policy through MemoryStream + withWatermark to show the
    * streaming engine agrees.
    *
    * The prefix max over arrival order is computed two-level so no task
    * ever sorts the whole table (the naive `Window.orderBy(event_id)` is a
    * single-partition sort — a one-task bottleneck at scale): rows bucket
    * by `floor(event_id / W)`; a per-bucket max (hash aggregate, N/W rows)
    * gets its own prefix max on the tiny bucket table; each row then
    * combines the prior-bucket prefix max (attached by broadcast) with a
    * within-bucket running max windowed BY bucket — distributed across W
    * buckets. Exact same semantics: earlier buckets ∪ earlier rows in own
    * bucket = all earlier arrivals. The bucket table is N/W rows; if that
    * ever outgrows one task, the same construction recurses (it never has
    * to in practice — W=4096 puts 100 TB of events at ~10^7 bucket rows,
    * one more level at ~10^3). In production this bookkeeping is the
    * streaming engine's per-microbatch watermark (O(1) state); this batch
    * form exists to grade the policy. */
  val watermarkLate: GraftQuery = GraftQuery(
    "stream_watermark_late",
    (s, dir) => {
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val bucketW = 4096
      val ev = Tables.events(s, dir)
        .select($"event_type", $"ts", $"event_id")
        .withColumn("b", floor($"event_id" / bucketW))
      val bucketPrefix = ev.groupBy($"b").agg(max($"ts").as("bmax"))
        .withColumn("prev_bmax",
          max($"bmax").over(W.orderBy($"b").rowsBetween(W.unboundedPreceding, -1)))
        .select($"b", $"prev_bmax")
      val withinW = W.partitionBy($"b").orderBy($"event_id")
        .rowsBetween(W.unboundedPreceding, -1)
      ev.join(broadcast(bucketPrefix), "b")
        .withColumn("in_max", max($"ts").over(withinW))
        // greatest() skips nulls (first row of first bucket has neither).
        .withColumn("max_seen", greatest($"prev_bmax", $"in_max"))
        .withColumn("late",
          $"max_seen".isNotNull &&
            $"ts" < $"max_seen" - expr("INTERVAL 10 MINUTES"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum(when($"late", 1L).otherwise(0L)).as("n_late"))
        .orderBy($"event_type")
    },
    Some("""WITH marked AS (
              SELECT event_type,
                     ts < max(ts) OVER (ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       - INTERVAL '10 minutes' AS late
              FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM marked GROUP BY event_type ORDER BY event_type""")
  )

  /** Stream-stream interval join, batch-graded: each purchase pairs with
    * every click by the same user in the preceding 30 minutes. This is the
    * exact shape Structured Streaming runs as a watermarked stream-stream
    * inner join (both sides buffered, state expired past the interval —
    * StreamingSpec drives that form); in batch it plans as one shuffle per
    * side on user_id with the time bound as the join residual. */
  val intervalJoin: GraftQuery = GraftQuery(
    "stream_join_interval",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
      purchases.join(clicks, Seq("user_id"))
        .filter($"c_ts" <= $"p_ts" &&
                $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
        .select($"purchase_id", $"click_id", $"user_id")
        .orderBy($"purchase_id", $"click_id")
    },
    Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
            ORDER BY purchase_id, click_id""")
  )

  /** Top-3 event types per tumbling hour — the trending-items staple.
    * Batch-graded form: windowed hash aggregate, then a rank window
    * PARTITIONED by the time window (distributed across windows; the
    * per-partition heap prunes to k via Spark 4's WindowGroupLimit before
    * the final filter). In production streaming this runs as the same
    * windowed aggregate with the rank applied per micro-batch in
    * foreachBatch (rank-over-agg isn't incrementalizable in-engine;
    * the aggregate state is, and it's watermark-bounded). */
  val topkWindow: GraftQuery = GraftQuery(
    "stream_topk_window",
    (s, dir) => {
      import s.implicits._
      val counts = Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"w").orderBy($"n".desc, $"event_type".asc)))
        .filter($"rnk" <= 3)
        .select($"w.start".as("ws"), $"rnk", $"event_type", $"n")
        .orderBy($"ws", $"rnk")
    },
    Some("""WITH c AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT ws, event_type, n,
                         row_number() OVER (PARTITION BY ws
                           ORDER BY n DESC, event_type) AS rnk
                  FROM c)
            SELECT ws, CAST(rnk AS INT) AS rnk, event_type, n
            FROM r WHERE rnk <= 3 ORDER BY ws, rnk""")
  )

  /** Streaming distinct-user analytics — the sketch cube maintained
    * incrementally: each micro-batch builds its own per-(event_type, day)
    * HLL sketches, which MERGE into the persisted cube by sketch union.
    * Union is associative and commutative, so ANY batching of arrivals
    * yields the identical cube — the foreachBatch sink needs no
    * reprocessing, no read-modify-write of raw history, just a sketch
    * union per touched cube cell (O(KB) state per cell, O(batch) work
    * per trigger). This is the streaming twin of agg_sketch_merge: the
    * batch form builds the cube in one pass; this form proves the same
    * cube assembles from arrival slices.
    *
    * Graded over a deterministic 3-way arrival split (the
    * stream_contamination convention): per-wave daily sketches → cube
    * merge per (event_type, day) → rollup per event_type, which must
    * reproduce agg_sketch_merge's answer. Oracle via envelope-as-data
    * (the approxDistinct device, shared with the batch twin verbatim):
    * graded columns are exact (n_days, n_users_exact) plus `merge_exact`
    * — the wave-assembled cube's estimate == the batch one-pass DAILY
    * cube's (arrival-slicing invariance of union register state, the
    * claim this operator sells, now hash-graded; one-shot streaming-built
    * sketches are not comparable — HIP vs composite estimator) — and
    * `hll_ok` (within 5% of exact). */
  val sketchMerge: GraftQuery = GraftQuery(
    "stream_sketch_merge",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val waves = (0 until 3).map { b =>
        ev.filter(pmod($"event_id", lit(3)) === b)
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(hll_sketch_agg($"user_id").as("sk"))
      }
      val merged = waves.reduce(_.unionAll(_))
        .groupBy($"event_type", $"day")
        .agg(hll_union_agg($"sk").as("sk")) // the per-cell cube merge
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
      // The batch twin's one-pass daily cube: arrival slicing must be
      // invisible in the final register state.
      val batchDaily = ev
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(hll_sketch_agg($"user_id").as("sk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_batch"))
      val exact = ev
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users_exact"))
      merged.join(broadcast(batchDaily), "event_type")
        .join(broadcast(exact), "event_type")
        .select($"event_type", $"n_days", $"n_users_exact",
          ($"est_merged" === $"est_batch").as("merge_exact"),
          (abs($"est_merged" - $"n_users_exact") <=
            $"n_users_exact" * 0.05).as("hll_ok"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days,
                   count(DISTINCT user_id) AS n_users_exact,
                   TRUE AS merge_exact, TRUE AS hll_ok
            FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** Streaming twin of `agg_qsketch_merge` — the quantile cube maintained
    * incrementally: each micro-batch appends its own per-(event_type,
    * day, bucket) integer log-bin COUNTS, and the serve step merges them
    * by plain addition. Unlike the HLL twin there is no estimator
    * subtlety at all: counters are exact integers, so the wave-assembled
    * cube is BIT-EQUAL to the one-pass batch cube under any arrival
    * slicing, and the full output (quantile estimates included) grades
    * against the batch oracle verbatim. Graded over the deterministic
    * 3-way event_id split (the stream_contamination convention). */
  val qsketchMerge: GraftQuery = GraftQuery(
    "stream_qsketch_merge",
    (s, dir) => {
      import s.implicits._
      val binned = graft.operators.Aggregates.qsketchBinned(s, dir)
      val waves = (0 until 3).map { b =>
        binned.filter(pmod($"event_id", lit(3)) === b)
          .groupBy($"event_type", $"day", $"bid")
          .agg(count(lit(1)).as("c"))
      }
      val sketch = waves.reduce(_.unionAll(_))
        .groupBy($"event_type", $"day", $"bid")
        .agg(sum($"c").as("c")) // per-cell wave merge
        .groupBy($"event_type", $"bid")
        .agg(sum($"c").as("c")) // cube rollup
      graft.operators.Aggregates.qsketchServe(s, sketch, binned)
    },
    // Exact-integer merge: batching cannot move ANY output column — the
    // oracle is the batch quantile cube's, verbatim.
    graft.operators.Aggregates.qsketchMerge.oracle
  )

  def all: Seq[GraftQuery] =
    Seq(tumbling, sliding, session, dedup, watermarkLate, intervalJoin,
        topkWindow, sketchMerge, qsketchMerge)
}
