package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The r14 skew-hardening contract: every query rewritten onto the
  * two-level (user, day)/(user, bucket) boundary-carry devices must be
  * BIT-IDENTICAL to the naive single-level per-user window it replaced.
  * Each test recomputes the naive form inline and diffs collected rows —
  * the direct regression guard for the carry algebra (day-boundary first
  * rows, multi-day gaps, short first days, adjacent-bucket reach).
  */
class TwoLevelParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def assertSame(q: String, naive: DataFrame): Unit = {
    val got = rowsOf(SparkEntry.queries(q)(spark, TestSpark.Sf))
    val want = rowsOf(naive)
    assert(got.size === want.size, s"$q row count")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"$q row $i")
    }
  }

  private def ev = Tables.events(spark, TestSpark.Sf)

  test("win_running == naive single-level window form") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    assertSame("win_running",
      ev.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("running_sum",
          round(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
        .withColumn("moving_avg4",
          round(avg($"value").over(w.rowsBetween(-3, 0)), 4))
        .drop("value", "ts")
        .orderBy($"user_id", $"event_id"))
  }

  test("win_lag_lead == naive single-level window form") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    assertSame("win_lag_lead",
      ev.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_value", lead($"value", 1).over(w))
        .withColumn("first_value", first($"value").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("value", "ts")
        .orderBy($"user_id", $"event_id"))
  }

  test("win_ntile == naive ntile/percent_rank/cume_dist form") {
    val w = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
    assertSame("win_ntile",
      ev.select($"user_id", $"event_id", $"value")
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .drop("value")
        .orderBy($"user_id", $"event_id"))
  }

  test("win_range_frame == naive RANGE frame form") {
    val byId = Window.partitionBy($"user_id").orderBy($"event_id")
      .rangeBetween(-5, 0)
    val byTime = Window.partitionBy($"user_id").orderBy($"tsec")
      .rangeBetween(-600, 0)
    assertSame("win_range_frame",
      ev.select($"user_id", $"event_id", $"value",
          floor($"ts".cast("double")).cast("long").as("tsec"))
        .withColumn("sum_id_range", round(sum($"value").over(byId), 4))
        .withColumn("sum_10min", round(sum($"value").over(byTime), 4))
        .drop("value", "tsec")
        .orderBy($"user_id", $"event_id"))
  }

  test("ts_ewma == naive lag-kernel form") {
    val alpha = 0.3; val k = 8
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val weights = (0 until k).map(i => alpha * math.pow(1 - alpha, i))
    val num = weights.zipWithIndex.map { case (wt, i) =>
      coalesce(lag($"value", i).over(w) * lit(wt), lit(0.0))
    }.reduce(_ + _)
    val den = weights.zipWithIndex.map { case (wt, i) =>
      when(lag($"value", i).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _)
    assertSame("ts_ewma",
      ev.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("ewma", round(num / den, 4))
        .select($"user_id", $"event_id", $"ewma")
        .orderBy($"user_id", $"event_id"))
  }

  test("ts_rolling_median == naive 15-row frame form") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-14, 0)
    assertSame("ts_rolling_median",
      ev.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("arr", sort_array(collect_list($"value").over(w)))
        .withColumn("n_window", size($"arr"))
        .withColumn("roll_median", round(
          when($"n_window" % 2 === 1,
            element_at($"arr", (($"n_window" + 1) / 2).cast("int")))
          .otherwise((element_at($"arr", ($"n_window" / 2).cast("int"))
            + element_at($"arr", ($"n_window" / 2).cast("int") + 1)) / 2.0), 4))
        .select($"user_id", $"event_id", $"n_window", $"roll_median")
        .orderBy($"user_id", $"event_id"))
  }

  test("ts_anomaly == naive -20..-1 integer-frame form") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-20, -1)
    assertSame("ts_anomaly",
      ev.select($"user_id", $"ts", $"event_id", $"value")
        .withColumn("c", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .withColumn("n_hist", count($"c").over(w))
        .withColumn("sum_c", sum($"c").over(w))
        .withColumn("sum_c2", sum($"c" * $"c").over(w))
        .filter($"n_hist" >= 10)
        .withColumn("mu", expr("(sum_c * 100) div n_hist").cast("double") / 10000.0)
        .withColumn("sd", sqrt(
          expr("CAST(n_hist * sum_c2 - sum_c * sum_c AS DOUBLE)")
            / expr("CAST(n_hist AS DOUBLE) * CAST(n_hist - 1 AS DOUBLE)")) / 100.0)
        .filter($"sd" > 1e-9)
        .withColumn("z", round(($"value" - $"mu") / $"sd", 4))
        .filter(abs($"z") > 3.0)
        .select($"user_id", $"event_id", $"value",
          $"mu", round($"sd", 4).as("sd"), $"z")
        .orderBy($"user_id", $"event_id"))
  }

  test("ts_anomaly bulk prefix-difference path == naive form on a >20-events/day fixture") {
    // The fixture corpus maxes at 11 events per user-day, so the bulk
    // rn >= 21 branch (prefix differences of UNFILTERED within-day
    // running sums) never fires on the registry drive. This synthetic
    // frame plants 45 events in one day (rows 21..45 take the bulk
    // path, row 21 exercising the coalesced missing lag-21) plus a
    // second short day (head-path carry across the boundary), for two
    // users with different value shapes including an outlier spike.
    import java.sql.Timestamp
    val rows = for {
      u <- Seq(1L, 2L)
      (day, n) <- Seq(("2024-01-01", 45), ("2024-01-02", 7))
      i <- 1 to n
    } yield {
      val base = if (u == 1L) 10.0 + (i % 5) * 0.25 else 50.0 + (i % 7) * 1.5
      val v = if (i == 40) base + 300.0 else base // planted anomaly in-day
      (u, Timestamp.valueOf(s"$day 00:0${i / 10}:${10 + i % 50}.${i % 10}"),
        (u * 1000 + (if (day == "2024-01-01") 0 else 100) + i), v)
    }
    val syn = rows.toDF("user_id", "ts", "event_id", "value")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-20, -1)
    val naive = syn.select($"user_id", $"ts", $"event_id", $"value")
      .withColumn("c", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("n_hist", count($"c").over(w))
      .withColumn("sum_c", sum($"c").over(w))
      .withColumn("sum_c2", sum($"c" * $"c").over(w))
      .filter($"n_hist" >= 10)
      .withColumn("mu", expr("(sum_c * 100) div n_hist").cast("double") / 10000.0)
      .withColumn("sd", sqrt(
        expr("CAST(n_hist * sum_c2 - sum_c * sum_c AS DOUBLE)")
          / expr("CAST(n_hist AS DOUBLE) * CAST(n_hist - 1 AS DOUBLE)")) / 100.0)
      .filter($"sd" > 1e-9)
      .withColumn("z", round(($"value" - $"mu") / $"sd", 4))
      .filter(abs($"z") > 3.0)
      .select($"user_id", $"event_id", $"value",
        $"mu", round($"sd", 4).as("sd"), $"z")
      .orderBy($"user_id", $"event_id")
    val got = rowsOf(operators.TimeSeries.anomalyOf(spark, syn))
    val want = rowsOf(naive)
    assert(want.nonEmpty, "fixture must flag at least the planted spike")
    assert(got.size === want.size, "ts_anomaly synthetic row count")
    got.zip(want).zipWithIndex.foreach { case ((g, wnt), i) =>
      assert(g === wnt, s"ts_anomaly synthetic row $i")
    }
  }

  test("ts_concurrency == naive single-DAY sweep form") {
    // The r15 (day, hour) two-level sweep vs the single-day window it
    // replaced: the in-day cumsum is an integer prefix sum, so the
    // hour-bucket carry must reassemble it bit-exactly.
    val sessions = operators.TimeSeries.sessionFrame(spark, TestSpark.Sf)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"ts").cast("long").as("t0"), max($"ts").cast("long").as("t1"))
    val clips = sessions
      .withColumn("day", explode(sequence(
        to_date(from_unixtime($"t0")), to_date(from_unixtime($"t1")))))
      .withColumn("d0", $"day".cast("timestamp").cast("long"))
      .withColumn("cs", greatest($"t0", $"d0"))
      .withColumn("ce", least($"t1" + 1L, $"d0" + 86400L))
    val events = clips.select($"user_id", $"session_seq", $"day",
        explode(array(
          struct($"cs".as("t"), lit(1L).as("dl")),
          struct($"ce".as("t"), lit(-1L).as("dl")))).as("e"))
      .select($"user_id", $"session_seq", $"day",
        $"e.t".as("t"), $"e.dl".as("dl"))
    val wd = Window.partitionBy($"day")
      .orderBy($"t", $"dl", $"user_id", $"session_seq")
      .rowsBetween(Window.unboundedPreceding, 0)
    assertSame("ts_concurrency",
      events
        .withColumn("cum", sum($"dl").over(wd))
        .groupBy($"day")
        .agg(sum(when($"dl" === 1L, 1L).otherwise(0L)).as("n_sessions"),
          max($"cum").as("peak_concurrency"),
          sum(when($"dl" === 1L, $"cum" - 1L).otherwise(0L)).as("overlap_pairs"))
        .orderBy($"day"))
  }

  test("ts_cusum == naive single-level prefix form") {
    val evc = ev.select($"user_id", $"event_id", $"ts",
      ($"value".cast("decimal(18,2)") * 100).cast("long").as("v100"))
    val tot = evc.groupBy($"user_id").agg(
      sum($"v100").as("t"), count(lit(1)).as("n"))
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val w = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val cusums = evc.join(tot.hint("shuffle_hash"), "user_id")
      .withColumn("d", abs(
        sum($"v100").over(w) * $"n"
          - row_number().over(wOrd).cast("long") * $"t"))
    val peak = cusums.groupBy($"user_id").agg(max($"d").as("peak"))
    assertSame("ts_cusum",
      cusums.join(peak.hint("shuffle_hash"), "user_id")
        .filter($"d" === $"peak")
        .groupBy($"user_id")
        .agg(min($"event_id").as("change_event"),
          (expr("first(peak * 100) div first(n)").cast("double") / 10000.0)
            .as("max_cusum"),
          (expr("first(t) * 100 div first(n)").cast("double") / 10000.0)
            .as("mu"))
        .orderBy($"user_id"))
  }

  test("join_asof family == naive union + running-last form") {
    val evs = ev.select($"user_id", $"ts", $"event_id", $"value", $"event_type")
    val tagged = evs.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value", lit(0).as("kind"))
      .unionByName(evs.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value", lit(1).as("kind")))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    assertSame("join_asof",
      tagged
        .withColumn("click_id",
          last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(w))
        .withColumn("click_value",
          last(when($"kind" === 0, $"value"), ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"event_id".as("purchase_id"), $"user_id", $"click_id", $"click_value")
        .orderBy($"purchase_id"))
    val bwd = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"kind".desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    def edgeOf(ws: org.apache.spark.sql.expressions.WindowSpec,
               c: org.apache.spark.sql.Column) =
      last(when($"kind" === 0, c), ignoreNulls = true).over(ws)
    assertSame("join_asof_nearest",
      tagged
        .withColumn("b_id", edgeOf(w, $"event_id"))
        .withColumn("b_val", edgeOf(w, $"value"))
        .withColumn("b_ts", edgeOf(w, $"ts"))
        .withColumn("a_id", edgeOf(bwd, $"event_id"))
        .withColumn("a_val", edgeOf(bwd, $"value"))
        .withColumn("a_ts", edgeOf(bwd, $"ts"))
        .filter($"kind" === 1)
        .withColumn("b_dist", unix_micros($"ts") - unix_micros($"b_ts"))
        .withColumn("a_dist", unix_micros($"a_ts") - unix_micros($"ts"))
        .withColumn("take_b",
          $"b_id".isNotNull && ($"a_id".isNull || $"b_dist" <= $"a_dist"))
        .select($"event_id".as("purchase_id"), $"user_id",
          when($"take_b", $"b_id").otherwise($"a_id").as("click_id"),
          when($"take_b", $"b_val").otherwise($"a_val").as("click_value"),
          when($"take_b", $"b_dist").otherwise($"a_dist").as("dist_us"))
        .orderBy($"purchase_id"))
    assertSame("join_asof_tolerance",
      tagged
        .withColumn("click_id",
          last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(w))
        .withColumn("click_value",
          last(when($"kind" === 0, $"value"), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .withColumn("fresh",
          unix_micros($"ts") - unix_micros($"click_ts")
            <= lit(3600L * 1000000L))
        .select($"event_id".as("purchase_id"), $"user_id",
          when($"fresh", $"click_id").as("click_id"),
          when($"fresh", $"click_value").as("click_value"))
        .orderBy($"purchase_id"))
  }
}
