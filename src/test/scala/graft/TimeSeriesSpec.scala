package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed semantics checks for the time-series operators on tiny
  * in-memory frames (the DuckDB oracle covers them at sf0.01; these pin the
  * corner cases: no-preceding-match as-of rows, gap runs, salt correctness).
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest preceding click, ts-equal click eligible, none -> null") {
    val out = operators.TimeSeries.asofJoin.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // every purchase row appears exactly once (left-join semantics)
    val nPurch = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type" === "purchase").count()
    assert(out.length.toLong === nPurch)
    // re-derive one user's matches by hand from the raw events
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val u = ev.filter(_._4 == "purchase").head._1
    val clicks = ev.filter(e => e._1 == u && e._4 == "click")
    for (p <- ev.filter(e => e._1 == u && e._4 == "purchase")) {
      val expected = clicks.filter(c => !c._2.after(p._2))
        .sortBy(c => (c._2.getTime, c._3)).lastOption
      val got = out.find(_.getAs[Long]("purchase_id") == p._3).get
      assert(Option(got.getAs[Any]("click_id")).map(_.asInstanceOf[Long])
        === expected.map(_._3), s"purchase ${p._3} of user $u")
    }
  }

  test("gap-fill emits a dense per-user day spine with carried-forward values") {
    val out = operators.TimeSeries.gapFill.run(spark, TestSpark.Sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // dense: per user, days are consecutive
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val days = rs.map(_.getAs[Timestamp]("day").getTime).sorted
      days.zip(days.tail).foreach { case (a, b) =>
        assert(b - a === 86400000L, "spine must be 1-day dense")
      }
    }
    // filled rows marked as gaps carry the previous non-gap value
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Timestamp]("day").getTime)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getAs[Boolean]("is_gap") =>
          assert(cur.getAs[Double]("v_filled") === prev.getAs[Double]("v_filled"))
        case _ =>
      }
    }
  }

  test("salted join equals the plain join") {
    val plain = {
      val ev = sources.Tables.events(spark, TestSpark.Sf)
      // same scaled-integer mean as the operator — this test proves the
      // SALTING is answer-preserving, not the mean formula
      val dim = ev.groupBy($"user_id").agg(
        (expr("sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) div count(1)")
          .cast("double") / 10000.0).as("user_avg"))
      ev.join(dim, Seq("user_id"))
        .select($"event_id", $"user_id", $"user_avg").orderBy($"event_id")
        .collect().toSeq
    }
    val salted = operators.TimeSeries.skewSalted.run(spark, TestSpark.Sf)
      .collect().toSeq
    assert(salted === plain)
  }

  test("resample: open/close anchor on the offset; lo/hi/avg recompute from raw events") {
    val raw = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", date_trunc("day", $"ts").as("day"), $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expected = raw.groupBy(t => (t._1, t._2)).map { case ((u, d), rs) =>
      val byOffset = rs.sortBy(_._3)
      (u, d) -> (rs.length.toLong,
        BigDecimal(byOffset.head._4).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(byOffset.last._4).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        rs.map(_._4).min, rs.map(_._4).max)
    }
    val out = operators.TimeSeries.resample.run(spark, TestSpark.Sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val key = (r.getLong(0), r.getTimestamp(1))
      val (n, open, close, lo, hi) = expected(key)
      assert(r.getLong(2) === n, s"$key n")
      assert(r.getDouble(3) === open, s"$key open must be the min-offset value")
      assert(r.getDouble(4) === close, s"$key close must be the max-offset value")
      assert(math.abs(r.getDouble(5) - lo) < 1e-4 && math.abs(r.getDouble(6) - hi) < 1e-4)
    }
  }

  test("funnel: staged mins respect event-time order; depth counts reached stages") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"event_type", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    def stageMin(u: Long, tpe: String, after: Option[Timestamp]): Option[Timestamp] = {
      val c = ev.filter(e => e._1 == u && e._2 == tpe &&
        after.forall(a => e._3.getTime > a.getTime)).map(_._3)
      if (c.isEmpty) None else Some(c.minBy(_.getTime))
    }
    val out = operators.TimeSeries.funnel.run(spark, TestSpark.Sf).collect()
    assert(out.length === ev.map(_._1).distinct.length)
    out.foreach { r =>
      val u = r.getLong(0)
      val t1 = stageMin(u, "view", None)
      val t2 = t1.flatMap(t => stageMin(u, "click", Some(t)))
      val t3 = t2.flatMap(t => stageMin(u, "purchase", Some(t)))
      assert(Option(r.getTimestamp(2)) === t1, s"user $u t_view")
      assert(Option(r.getTimestamp(3)) === t2, s"user $u t_click")
      assert(Option(r.getTimestamp(4)) === t3, s"user $u t_purchase")
      assert(r.getInt(1) === Seq(t1, t2, t3).count(_.isDefined), s"user $u depth")
    }
  }

  test("funnel gating: out-of-order and missing stages cap the depth (synthetic)") {
    // Every sf0.001 user happens to complete all 3 stages, so the ordering
    // gate never fires on the fixture — drive it directly. User 1: full
    // funnel. User 2: purchase BEFORE its first view (depth must stop at
    // the click). User 3: click precedes the first view (depth 1 — the
    // early click must not count). User 4: never views (depth 0 even
    // though it clicks and purchases).
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      (2L, "purchase", ts("2024-01-02 08:00:00")), (2L, "view", ts("2024-01-02 09:00:00")),
      (2L, "click", ts("2024-01-02 10:00:00")),
      (3L, "click", ts("2024-01-03 08:00:00")), (3L, "view", ts("2024-01-03 09:00:00")),
      (4L, "click", ts("2024-01-04 08:00:00")), (4L, "purchase", ts("2024-01-04 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.TimeSeries.funnelOf(spark, ev).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("windowed funnel: out-of-window stages don't count; depth never exceeds plain funnel") {
    // Synthetic: user 1 converts fully in-window; user 2's first click is
    // 4 days after the view (outside the 3-day window) so depth stops at
    // 1 even though a later purchase exists; user 3 clicks in-window but
    // purchases 5 days after the click (depth 2). User 4: a LATER
    // in-window click must count even when an earlier out-of-window one
    // exists? No — the gate is on min(ts) of qualifying rows: its day-2
    // click qualifies, its day-5 purchase (3 days after that click) does.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-02 10:00:00")),
      (1L, "purchase", ts("2024-01-03 10:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")), (2L, "click", ts("2024-01-05 10:00:00")),
      (2L, "purchase", ts("2024-01-06 10:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")), (3L, "click", ts("2024-01-02 10:00:00")),
      (3L, "purchase", ts("2024-01-07 10:00:00")),
      (4L, "view", ts("2024-01-01 10:00:00")), (4L, "click", ts("2024-01-03 09:00:00")),
      (4L, "purchase", ts("2024-01-05 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.TimeSeries.funnelWindowedOf(spark, ev).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 3))
    // on the fixture: windowed depth is pointwise <= the unbounded depth
    val plain = operators.TimeSeries.funnel.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val windowed = operators.TimeSeries.funnelWindowed.run(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(windowed.keySet === plain.keySet)
    windowed.foreach { case (u, d) =>
      assert(d <= plain(u), s"user $u windowed depth exceeds unbounded depth")
    }
  }

  test("cumulative users: growth curve brute-replicates first-day counting; dense and monotone") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val firstDay = ev.groupBy(_._1).map { case (_, xs) => xs.map(_._2).min }
    val newByDay = firstDay.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val days = ev.map(_._2).distinct.sorted
    var cum = 0L
    val expected = days.map { d =>
      val n = newByDay.getOrElse(d, 0L); cum += n; (d, n, cum)
    }
    val out = operators.TimeSeries.cumulativeUsers.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2))).toSeq
    assert(out === expected)
    // curve invariants: dense over observed days, monotone, ends at the
    // total distinct-user count
    assert(out.map(_._1) === days)
    assert(out.last._3 === ev.map(_._1).distinct.length.toLong)
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3))
  }

  test("paths: top-20 journey prefixes brute-replicate a per-user sorted walk") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(e => (e._2.getTime, e._3)).take(4).map(_._4).mkString(">")
    }
    val expected = paths.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = operators.TimeSeries.pathsTopK.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === expected)
    assert(out.nonEmpty && out.head._2 >= out.last._2)
  }

  test("calendar prorate: month exposure brute-replicates per-order interval splits") {
    val li = sources.Tables.lineitem(spark, TestSpark.Sf)
      .groupBy($"l_orderkey").agg(to_date(max($"l_shipdate")).as("e")).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val ords = sources.Tables.orders(spark, TestSpark.Sf)
      .select($"o_orderkey", to_date($"o_orderdate"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val agg = scala.collection.mutable.Map[java.time.LocalDate, (Long, Long, Long)]()
    ords.filter(o => li.contains(o._1)).foreach { case (k, start, cents) =>
      val end = Seq(li(k), start).max
      var m = start.withDayOfMonth(1)
      while (!m.isAfter(end)) {
        val mEnd = m.plusMonths(1).minusDays(1)
        val lo = Seq(start, m).max
        val hi = Seq(end, mEnd).min
        val days = java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1
        val (n, d, x) = agg.getOrElse(m, (0L, 0L, 0L))
        agg(m) = (n + 1, d + days, x + cents * days)
        m = m.plusMonths(1)
      }
    }
    val out = operators.TimeSeries.calendarProrate.run(spark, TestSpark.Sf)
      .collect().map(r => r.getDate(0).toLocalDate ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === agg.toMap)
    // an order spanning >1 month must exist or the split is untested
    assert(agg.values.map(_._1).sum > ords.count(o => li.contains(o._1)),
      "fixture inert: no order spans a month boundary")
  }

  test("attribution: channels brute-replicate a latest-touch walk; purchases conserve") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // brute: per purchase, the latest strictly-prior touch by (ts,
    // event_id); within the 7-day lookback it earns the purchase.
    val byUser = ev.groupBy(_._1)
    val brute = ev.filter(_._4 == "purchase").map { case (u, ts, id, _, c) =>
      val touches = byUser(u).filter(e => e._4 != "purchase" &&
        (e._2.getTime < ts.getTime ||
         (e._2.getTime == ts.getTime && e._3 < id)))
      val lt = if (touches.isEmpty) None
        else Some(touches.maxBy(e => (e._2.getTime, e._3)))
      lt match {
        case Some(t) if ts.getTime / 1000 - t._2.getTime / 1000 <= 604800L =>
          (t._4, c, Some(ts.getTime / 1000 - t._2.getTime / 1000))
        case _ => ("direct", c, None)
      }
    }
    val expected = brute.groupBy(_._1).map { case (ch, xs) =>
      val lags = xs.flatMap(_._3)
      ch -> (xs.length.toLong, xs.map(_._2).sum,
        if (lags.isEmpty) None
        else Some(BigDecimal(lags.sum.toDouble / lags.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val out = operators.TimeSeries.attribution.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_purchases")).sum === brute.length.toLong,
      "every purchase lands in exactly one channel")
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(out.length === expected.size)
    out.foreach { r =>
      val ch = r.getAs[String]("channel")
      val (n, rev, avg) = expected(ch)
      assert(r.getAs[Long]("n_purchases") === n, s"$ch purchases")
      assert(r.getAs[Long]("revenue_cents") === rev, s"$ch revenue")
      (avg, Option(r.getAs[Double]("avg_lag_sec"))) match {
        case (Some(e), got) => assert(math.abs(got.get - e) < 1e-6, s"$ch avg lag")
        case (None, _) => assert(r.isNullAt(r.fieldIndex("avg_lag_sec")), s"$ch lag null")
      }
    }
    assert(expected.contains("direct") && (expected.contains("click") ||
      expected.contains("view")), "fixture must exercise direct AND touched channels")
  }

  test("sessionize: gap runs recompute from raw events; invariants hold globally") {
    val out = operators.TimeSeries.sessionize.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // conservation: every event lands in exactly one session
    val nEvents = sources.Tables.events(spark, TestSpark.Sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === nEvents)
    // per user: session ids are 1..k contiguous; duration matches bounds
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val seqs = rs.map(_.getAs[Long]("session_seq")).sorted
      assert(seqs === (1L to seqs.length).toArray.toSeq, s"user $u session ids")
      rs.foreach { r =>
        val d = r.getAs[Timestamp]("t_end").getTime / 1000 -
          r.getAs[Timestamp]("t_start").getTime / 1000
        assert(r.getAs[Long]("duration_sec") === d, s"user $u duration")
      }
    }
    // full recompute for one user with >1 session: walk events in (ts,
    // event_id) order, split at >12h gaps (truncated-second arithmetic,
    // as both engines compute it)
    val u = out.groupBy(_.getAs[Long]("user_id"))
      .collectFirst { case (u, rs) if rs.length > 1 => u }.get
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"user_id" === u).select($"ts", $"event_id").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
      .sortBy { case (t, id) => (t.getTime, id) }
    var sid = 1L
    val sids = ev.indices.map { i =>
      if (i > 0 &&
          ev(i)._1.getTime / 1000 - ev(i - 1)._1.getTime / 1000 > 43200L) sid += 1
      sid
    }
    val expCounts = sids.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val gotCounts = out.filter(_.getAs[Long]("user_id") == u)
      .map(r => r.getAs[Long]("session_seq") -> r.getAs[Long]("n_events")).toMap
    assert(gotCounts === expCounts, s"user $u session event counts")
  }

  test("retention: offset-0 cell equals cohort size; cells never exceed it") {
    val out = operators.TimeSeries.retention.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val byCohort = out.groupBy(_.getAs[Timestamp]("cohort_day"))
    // cohort size = distinct users whose first active day is the cohort day
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", date_trunc("day", $"ts").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val firstDay = ev.groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2.getTime).min) }
    byCohort.foreach { case (cd, rs) =>
      val size = firstDay.count(_._2 == cd.getTime).toLong
      val zero = rs.find(_.getAs[Int]("day_offset") == 0).get.getAs[Long]("n_users")
      assert(zero === size, s"cohort $cd offset-0 must equal cohort size")
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= size,
        s"cohort $cd cell exceeds cohort size"))
    }
    // spot-recompute one non-zero cell
    val r = out.find(_.getAs[Int]("day_offset") > 0).get
    val cd = r.getAs[Timestamp]("cohort_day").getTime
    val off = r.getAs[Int]("day_offset")
    val cohortUsers = firstDay.filter(_._2 == cd).keySet
    val active = ev.filter { case (u, d) =>
      cohortUsers(u) && (d.getTime - cd) / 86400000L == off
    }.map(_._1).toSet
    assert(r.getAs[Long]("n_users") === active.size.toLong)
  }

  test("anomaly: flagged set recomputes exactly from a rolling 20-preceding window") {
    val out = operators.TimeSeries.anomaly.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("z"))).toSet
    assert(out.nonEmpty)
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      sorted.indices.flatMap { i =>
        val hist = sorted.slice(math.max(0, i - 20), i).map(_._4)
        if (hist.length < 10) None
        else {
          val mu = hist.sum / hist.length
          val sd = math.sqrt(hist.map(x => (x - mu) * (x - mu)).sum / (hist.length - 1))
          if (sd <= 1e-9) None
          else {
            val z = BigDecimal((sorted(i)._4 - mu) / sd)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (math.abs(z) > 3.0) Some((u, sorted(i)._3, z)) else None
          }
        }
      }
    }.toSet
    assert(out === expected, "flagged anomalies must recompute exactly")
  }

  test("interpolation: synthetic gaps blend linearly; known days pass through") {
    import org.apache.spark.sql.functions._
    // user 1: known days 1 and 5 (values 10, 30) → gap days 2,3,4 = 15,20,25
    // user 2: a single active day → 1-row grid, no interpolation
    val daily = Seq(
      (1L, "2024-03-01", 10.0), (1L, "2024-03-05", 30.0),
      (2L, "2024-03-02", 7.5))
      .toDF("user_id", "d", "v")
      .select($"user_id", $"d".cast("timestamp").as("day"), $"v")
    val out = operators.TimeSeries.interpolateOf(spark, daily).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("day").toString,
        r.getAs[Double]("v_interp"), r.getAs[Boolean]("is_gap")))
    assert(out.toSeq === Seq(
      (1L, "2024-03-01 00:00:00.0", 10.0, false),
      (1L, "2024-03-02 00:00:00.0", 15.0, true),
      (1L, "2024-03-03 00:00:00.0", 20.0, true),
      (1L, "2024-03-04 00:00:00.0", 25.0, true),
      (1L, "2024-03-05 00:00:00.0", 30.0, false),
      (2L, "2024-03-02 00:00:00.0", 7.5, false)))

    // fixture pass: non-gap rows reproduce the daily sums exactly
    val interp = operators.TimeSeries.interpolate.run(spark, TestSpark.Sf)
    val knownBack = interp.filter(!$"is_gap")
      .select($"user_id", $"day", $"v_interp".as("v"))
    val dailyFix = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(round(sum($"value"), 4).as("v"))
    assert(knownBack.except(dailyFix).count() === 0,
      "known days must pass through the interpolation unchanged")
    // and gap rows exist and stay within their neighbors' envelope
    val gaps = interp.filter($"is_gap").count()
    assert(gaps > 0, "fixture must contain gap days for the op to be exercised")
  }

  test("ewma: matches a driver-side truncated-kernel recomputation per user") {
    val alpha = 0.3
    val k = 8
    val out = operators.TimeSeries.ewma.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val series = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"event_id", $"ts", $"value")
      .orderBy($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    series.foreach { case (uid, rows) =>
      val vals = rows.map(_._3)
      rows.indices.foreach { t =>
        val terms = (0 until math.min(k, t + 1))
          .map(i => alpha * math.pow(1 - alpha, i))
        val num = terms.zipWithIndex.map { case (w, i) => w * vals(t - i) }.sum
        val expected =
          BigDecimal(num / terms.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        val got = BigDecimal(out((uid, rows(t)._2)))
        assert((got - expected).abs <= BigDecimal(0.0001),
          s"user $uid event ${rows(t)._2}: ewma $got, recomputed $expected")
      }
    }
    // head of each series: the first value passes through unchanged
    series.foreach { case (uid, rows) =>
      assert(math.abs(out((uid, rows.head._2)) - rows.head._3) < 0.0001,
        s"user $uid: ewma at t=0 must equal the first value")
    }
  }

  test("cusum: peak matches an exact integer-space recomputation per user") {
    val got = operators.TimeSeries.cusum.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val series = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"event_id", $"ts", $"value")
      .orderBy($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    assert(got.keySet == series.keySet)
    series.foreach { case (uid, rows) =>
      // the operator's own algebra: v100 exact, n·S_i = |P_i·n − i·T|
      val v100 = rows.map(r => BigDecimal(r._3).setScale(2).*(100).toLongExact)
      val t = v100.sum
      val n = v100.length.toLong
      var p = 0L
      val ds = v100.zipWithIndex.map { case (v, idx) =>
        p += v
        (rows(idx)._2, math.abs(p * n - (idx + 1L) * t))
      }
      val peak = ds.map(_._2).max
      val changeAt = ds.filter(_._2 == peak).map(_._1).min
      val expectedPeak = (peak * 100L / n).toDouble / 10000.0
      val (gotEvent, gotPeak) = got(uid)
      assert(gotPeak == expectedPeak,
        s"user $uid: peak $gotPeak vs recomputed $expectedPeak")
      assert(gotEvent == changeAt, s"user $uid: change event")
    }
  }

  test("rolling median: matches a driver-side trailing-window recomputation") {
    val out = operators.TimeSeries.rollingMedian.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    val series = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"event_id", $"ts", $"value")
      .orderBy($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    series.foreach { case (uid, rows) =>
      rows.indices.foreach { t =>
        val frame = rows.slice(math.max(0, t - 14), t + 1).map(_._3).sorted
        val n = frame.length
        val med = if (n % 2 == 1) frame(n / 2)
                  else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        val expected = BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        val (gotN, gotMed) = out((uid, rows(t)._2))
        assert(gotN == n, s"user $uid event ${rows(t)._2}: window size")
        assert((BigDecimal(gotMed) - expected).abs <= BigDecimal(0.0001),
          s"user $uid event ${rows(t)._2}: median $gotMed, recomputed $expected")
      }
    }
  }

  test("Mann-Kendall: S and tie-corrected variance match a brute pair count") {
    import java.sql.Timestamp
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type", org.apache.spark.sql.functions.date_trunc("day", $"ts").as("day"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val out = operators.TimeSeries.mkTrend.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tpe = r.getString(0)
      val series = daily.filter(_._1 == tpe).sortBy(_._2.getTime).map(_._3)
      val n = series.length.toLong
      var sStat = 0L
      for (i <- series.indices; j <- i + 1 until series.length)
        sStat += java.lang.Long.signum(series(j) - series(i))
      val tieTerm = series.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("s") === sStat, s"$tpe S mismatch")
      assert(r.getAs[Long]("var_x18") === n * (n - 1) * (2 * n + 5) - tieTerm)
      val z = r.getAs[Double]("z")
      assert(!z.isNaN && math.abs(z) < 10.0)
    }
  }

  test("Theil-Sen: lower-median pairwise slope matches a brute recompute") {
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type", org.apache.spark.sql.functions.date_trunc("day", $"ts").as("day"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val out = operators.TimeSeries.theilSen.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tpe = r.getString(0)
      val series = daily.filter(_._1 == tpe).sortBy(_._2.getTime)
      val pairs = for {
        i <- series.indices; j <- i + 1 until series.length
      } yield {
        val days = (series(j)._2.getTime - series(i)._2.getTime) / 86400000L
        val slope = (series(j)._3 - series(i)._3).toDouble / days.toDouble
        (slope, series(i)._2.getTime, series(j)._2.getTime,
          series(j)._3 - series(i)._3, days)
      }
      val sorted = pairs.sortBy(t => (t._1, t._2, t._3))
      val pick = sorted((pairs.length + 1) / 2 - 1)
      assert(r.getAs[Long]("n_pairs") === pairs.length.toLong)
      assert(r.getAs[Long]("slope_num") === pick._4, s"$tpe slope numerator")
      assert(r.getAs[Long]("slope_den") === pick._5, s"$tpe slope denominator")
      assert(r.getAs[Double]("slope") === pick._4.toDouble / pick._5.toDouble)
    }
  }

  test("Theil-Sen: even pair count still selects the lower median") {
    // Regression for the round-9 advice finding: Spark Column `/` is
    // DOUBLE division, so with an even n_pairs the rn === (n+1)/2 filter
    // compared against x.5 and silently dropped the event type. 28 days
    // gives C(28,2) = 378 pairs (even) — the fixture's 30-day series
    // (435, odd) could never exercise this.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_even").toString
    val rows = (0 until 28).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        1L, "evt", ((d * 37 + 11) % 100) / 4.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.theilSen.run(spark, dir).collect()
    assert(out.length === 1, "even pair count dropped the event type")
    val r = out.head
    assert(r.getAs[Long]("n_pairs") === 378L)
    // Brute lower median over the same integerized dailies.
    val daily = rows.map(t => (t._2.getTime / 86400000L,
      (BigDecimal(t._5).setScale(2) * 100).toLongExact))
    val pairs = for {
      i <- daily.indices; j <- i + 1 until daily.length
    } yield {
      val den = daily(j)._1 - daily(i)._1
      val num = daily(j)._2 - daily(i)._2
      (num.toDouble / den.toDouble, daily(i)._1, daily(j)._1, num, den)
    }
    val pick = pairs.sortBy(t => (t._1, t._2, t._3)).apply((pairs.length + 1) / 2 - 1)
    assert(r.getAs[Long]("slope_num") === pick._4)
    assert(r.getAs[Long]("slope_den") === pick._5)
  }

  test("ts_acf: exact integer autocovariance matches a brute calendar-lag recompute") {
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", to_date($"ts").as("d"), $"value").collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
      .groupBy(_._1).iterator.map { case (k, xs) => k -> xs.map(_._2).sum }.toMap
    val byType = daily.groupBy(_._1._1)
    val out = operators.TimeSeries.acf.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, lag) = (r.getString(0), r.getAs[Int]("lag"))
      val series = byType(t).map { case ((_, d), v) => d -> v }
      val n = series.size.toLong
      val s = series.values.sum
      val u = series.map { case (d, v) => d -> (n * v - s) }
      val num = u.iterator.flatMap { case (d, ud) =>
        u.get(d.plusDays(lag.toLong)).map(ub => ud * ub)
      }.sum
      val den = u.values.map(x => x * x).sum
      assert(r.getAs[Long]("acf_num") === num, s"$t lag $lag numerator")
      assert(r.getAs[Long]("acf_den") === den, s"$t lag $lag denominator")
      // Cauchy–Schwarz: |Σ u_d·u_{d+l}| ≤ Σ u², so |acf| ≤ 1
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-12)
    }
    // all 7 lags present for every type that has any row
    val lagsPerType = out.groupBy(_.getString(0)).map(_._2.map(_.getAs[Int]("lag")).toSet)
    lagsPerType.foreach(ls => assert(ls === (1 to 7).toSet))
  }

  test("asof tolerance: agrees with unbounded asof inside the window, nulls beyond") {
    val base = operators.TimeSeries.asofJoin.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_ => (r.getLong(2), r.getDouble(3))))
      .toMap
    // micros, not Timestamp.getTime millis: a match aged 3600.0005 s is
    // stale to the operator but would look exactly-3600s in millis
    val clickTs = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type" === "click")
      .select($"event_id", unix_micros($"ts")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val purchTs = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = operators.TimeSeries.asofTolerance.run(spark, TestSpark.Sf).collect()
    assert(out.length === base.size, "left rows must be preserved")
    var fresh = 0; var stale = 0
    out.foreach { r =>
      val pid = r.getLong(0)
      val bounded = Option(r.get(2)).map(_ => (r.getLong(2), r.getDouble(3)))
      base(pid) match {
        case Some((cid, cv)) =>
          val ageUs = purchTs(pid) - clickTs(cid)
          if (ageUs <= 3600L * 1000000) {
            assert(bounded === Some((cid, cv)), s"purchase $pid: fresh match must survive")
            fresh += 1
          } else {
            assert(bounded === None, s"purchase $pid: stale match (${ageUs}us) must null")
            stale += 1
          }
        case None => assert(bounded === None)
      }
    }
    assert(fresh > 0 && stale > 0,
      s"fixture must exercise both sides of the tolerance (fresh=$fresh stale=$stale)")
  }

  test("ts_pacf: matches a driver-side Durbin-Levinson solve over the acf outputs") {
    val rho = operators.TimeSeries.acf.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getAs[Int]("lag")) -> r.getAs[Double]("acf")).toMap
    val out = operators.TimeSeries.pacf.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val r1 = rho((t, 1)); val r2 = rho((t, 2))
      val r3 = rho((t, 3)); val r4 = rho((t, 4))
      val phi11 = r1
      val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val phi21 = r1 - phi22 * r1
      val phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1.0 - phi21 * r1 - phi22 * r2)
      val phi32 = phi22 - phi33 * phi21
      val phi31 = phi21 - phi33 * phi22
      val phi44 = (r4 - phi31 * r3 - phi32 * r2 - phi33 * r1) /
        (1.0 - phi31 * r1 - phi32 * r2 - phi33 * r3)
      val got = rows.map(r => r.getAs[Int]("lag") -> r.getAs[Double]("pacf")).toMap
      assert(got(1) === phi11, s"$t pacf(1) must equal acf(1)")
      assert(got(2) === phi22, s"$t pacf(2)")
      assert(got(3) === phi33, s"$t pacf(3)")
      assert(got(4) === phi44, s"$t pacf(4)")
    }
  }

  test("stream_moments: wave-merged partials reproduce the batch moments exactly") {
    val streamed = streaming.DriftStream.streamMoments
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = operators.Analytics.moments
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move the shape statistics")
  }

  test("ts_wow_growth: weekly sums brute-match on Monday anchors; first week's growth is NULL") {
    val weekly = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", to_date($"ts").as("d"), $"value").collect()
      .map { r =>
        val d = r.getDate(1).toLocalDate
        val monday = d.minusDays(d.getDayOfWeek.getValue - 1L)
        ((r.getString(0), monday),
          (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val out = operators.TimeSeries.wowGrowth.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toLocalDate)
      assert(r.getAs[Long]("v") === weekly(key), s"$key weekly cents")
      weekly.get((key._1, key._2.minusDays(7))) match {
        case Some(prev) =>
          assert(r.getAs[Long]("v_prev") === prev)
          val expected = (weekly(key) - prev).toDouble / prev.toDouble
          assert(math.abs(r.getAs[Double]("wow_growth") - expected) <= 5e-7,
            s"$key: growth vs brute $expected")
        case None =>
          assert(r.isNullAt(r.fieldIndex("wow_growth")),
            s"$key: growth with no prior week must be NULL")
      }
    }
  }

  test("stream_checksum: wave-merged XOR digests reproduce the batch digests exactly") {
    val streamed = streaming.DriftStream.streamChecksum
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = functions.ScalarQueries.fnChecksum
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not change a single day's digest")
  }

  test("stream_bootstrap_ci: wave-merged cent partials reproduce the batch CI bit-for-bit") {
    // The bootstrap fold keys its uniforms on the merged frame's VALUES,
    // so the 3-way arrival split must be invisible down to the last
    // interval digit.
    val streamed = streaming.DriftStream.streamBootstrapCi
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = operators.Analytics.bootstrapCi
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move the bootstrap interval")
  }

  test("stream_active_users: wave-merged presence rows reproduce the batch DAU/WAU exactly") {
    val streamed = streaming.ResampleStream.streamActiveUsers
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = operators.TimeSeries.activeUsers
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not change a day's actives")
  }

  test("stream_entropy: wave-merged count partials reproduce the batch entropy exactly") {
    val streamed = streaming.DriftStream.streamEntropy
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = operators.Analytics.entropy
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move any day's label-balance row")
  }

  private def dailyCents(): Map[String, Seq[(java.time.LocalDate, Long)]] =
    sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", to_date($"ts").as("d"), $"value").collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
      .groupBy(_._1).iterator.map { case (k, xs) => k -> xs.map(_._2).sum }
      .toSeq.groupBy(_._1._1)
      .map { case (t, xs) =>
        t -> xs.map { case ((_, d), v) => (d, v) }.sortBy(_._1.toEpochDay)
      }

  test("ts_peaks: exactly the strict local maxima of the daily series") {
    val brute = dailyCents().flatMap { case (t, series) =>
      series.sliding(3).collect {
        case Seq((_, p), (d, v), (_, n)) if v > p && v > n => (t, d.toString, v)
      }
    }.toSet
    val out = operators.TimeSeries.peaks.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getAs[Long]("cents"))).toSet
    assert(out === brute, "peak set must equal the brute strict-local-maxima set")
    assert(out.nonEmpty)
  }

  test("ts_streaks: longest strictly-increasing run with earliest-start tiebreak") {
    val out = operators.TimeSeries.streaks.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    assert(out.map(_.getString(0)).toSet === daily.keySet)
    out.foreach { r =>
      val t = r.getString(0)
      val series = daily(t)
      // brute: split into maximal strictly-increasing runs in order
      val runs = series.drop(1).foldLeft(List(List(series.head))) {
        case (acc @ cur :: rest, x) =>
          if (x._2 > cur.head._2) (x :: cur) :: rest else List(x) :: acc
        case (Nil, x) => List(List(x))
      }.map(_.reverse).reverse
      val maxLen = runs.map(_.length).max
      val pick = runs.filter(_.length == maxLen).minBy(_.head._1.toEpochDay)
      assert(r.getAs[Long]("streak_days") === maxLen.toLong, s"$t streak length")
      assert(r.getDate(2).toLocalDate === pick.head._1, s"$t run start")
      assert(r.getDate(3).toLocalDate === pick.last._1, s"$t run end")
    }
  }

  test("ts_changepoint: argmax split matches a brute gain sweep; segments conserve") {
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", to_date($"ts").as("d"), $"value").collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
      .groupBy(_._1).iterator.map { case (k, xs) => k -> xs.map(_._2).sum }.toMap
    val out = operators.TimeSeries.changepoint.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(0)
      val series = daily.collect { case ((tt, d), v) if tt == t => (d, v) }
        .toSeq.sortBy(_._1.toEpochDay)
      val n = series.length.toLong
      val s = series.map(_._2).sum
      // brute gain sweep over every split, earliest-day tiebreak
      val gains = series.map(_._2).scanLeft(0L)(_ + _).drop(1).zipWithIndex.init
        .map { case (c, i) =>
          val tt = i + 1L
          val a = n * c - tt * s
          (tt, c, a, a.toDouble * a.toDouble / (tt * (n - tt)).toDouble)
        }
      val best = gains.maxBy(_._4)
      val pick = gains.filter(_._4 == best._4).minBy(_._1)
      assert(r.getAs[Long]("cp_t") === pick._1, s"$t split index")
      assert(r.getAs[Long]("gain_num") === pick._3, s"$t gain numerator")
      assert(r.getAs[Long]("lsum") === pick._2, s"$t left segment sum")
      assert(r.getAs[Long]("lsum") + r.getAs[Long]("rsum") === s,
        s"$t segment sums must conserve the series total")
      assert(r.getAs[Long]("gain_den") === pick._1 * (n - pick._1))
    }
  }

  test("ts_holt: truncated kernel tracks the exact Holt recursion") {
    // The graded form is a K-term linear kernel (identical doubles across
    // engines); this pins its fidelity to the REAL sequential recursion:
    // on the last day (maximal warm-up) the truncation residual must be
    // inside the documented spectral-decay bound.
    val (a, b) = (operators.TimeSeries.HoltAlpha, operators.TimeSeries.HoltBeta)
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
      .orderBy($"event_type", $"d")
      .collect().groupBy(_.getString(0))
    val got = operators.TimeSeries.holt.run(spark, TestSpark.Sf)
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.maxBy(_.getDate(1).toString) }
    got.foreach { case (t, r) =>
      val xs = daily(t).map(_.getLong(2).toDouble)
      // Exact recursion, classic init: l_1 = x_1, b_1 = x_2 - x_1.
      var l = xs(0); var tr = xs(1) - xs(0)
      xs.drop(1).foreach { x =>
        val l2 = a * x + (1 - a) * (l + tr)
        tr = b * (l2 - l) + (1 - b) * tr
        l = l2
      }
      val lvl = r.getAs[Double]("holt_level")
      assert(math.abs(lvl - l) <= 0.02 * math.abs(l) + 1.0,
        s"$t: truncated level $lvl vs exact recursion $l")
      val fc = r.getAs[Double]("forecast_next")
      assert(math.abs(fc - (l + tr)) <= 0.05 * math.abs(l + tr) + 1.0,
        s"$t: truncated forecast $fc vs exact ${l + tr}")
    }
    assert(got.nonEmpty)
  }

  test("ts_holt_damped: kernel tracks the exact damped recursion; damping tightens truncation") {
    // Same fidelity pin as ts_holt, against the φ-scaled exact recursion;
    // plus the two claims the operator sells: (1) the damped kernel's
    // dropped tail is no heavier than undamped Holt's at equal K (φ < 1
    // shrinks the spectral radius), (2) the emitted asymptote is exactly
    // level + φ/(1−φ)·trend of the same row.
    val (a, b, p) = (operators.TimeSeries.HoltAlpha,
      operators.TimeSeries.HoltBeta, operators.TimeSeries.HoltPhi)
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
      .orderBy($"event_type", $"d")
      .collect().groupBy(_.getString(0))
    val got = operators.TimeSeries.holtDamped.run(spark, TestSpark.Sf)
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.maxBy(_.getDate(1).toString) }
    got.foreach { case (t, r) =>
      val xs = daily(t).map(_.getLong(2).toDouble)
      var l = xs(0); var tr = xs(1) - xs(0)
      xs.drop(1).foreach { x =>
        val l2 = a * x + (1 - a) * (l + p * tr)
        tr = b * (l2 - l) + (1 - b) * p * tr
        l = l2
      }
      val lvl = r.getAs[Double]("hd_level")
      assert(math.abs(lvl - l) <= 0.02 * math.abs(l) + 1.0,
        s"$t: truncated damped level $lvl vs exact recursion $l")
      val fc = r.getAs[Double]("forecast_next")
      assert(math.abs(fc - (l + p * tr)) <= 0.05 * math.abs(l + p * tr) + 1.0,
        s"$t: truncated damped forecast $fc vs exact ${l + p * tr}")
      val asym = r.getAs[Double]("forecast_asymptote")
      val expected = BigDecimal(r.getAs[Double]("hd_level")
        + p / (1 - p) * r.getAs[Double]("hd_trend"))
        .setScale(1, BigDecimal.RoundingMode.HALF_UP)
      assert((BigDecimal(asym).setScale(1, BigDecimal.RoundingMode.HALF_UP)
        - expected).abs <= BigDecimal("0.1"),
        s"$t: asymptote $asym vs level + φ/(1−φ)·trend $expected")
    }
    assert(got.nonEmpty)
    // Tail-weight claim: the would-be K-th kernel term (first dropped one)
    // is smaller in both coordinates for the damped transition.
    def tail(ws: Seq[(Double, Double)]) =
      math.abs(ws.last._1) + math.abs(ws.last._2)
    assert(tail(operators.TimeSeries.holtDampedWeights)
      <= tail(operators.TimeSeries.holtWeights) + 1e-12,
      "damping must not loosen the truncation at equal K")
  }

  test("ts_active_users: DAU and trailing-7-day WAU match a brute window recompute") {
    val ud = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val out = operators.TimeSeries.activeUsers.run(spark, TestSpark.Sf).collect()
    assert(out.length === days.length, "one row per observed day")
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter { case (_, ad) =>
        val diff = d.toEpochDay - ad.toEpochDay; diff >= 0 && diff <= 6
      }.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") === dau, s"$d dau")
      assert(r.getAs[Long]("wau") === wau, s"$d wau")
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"), "DAU never exceeds WAU")
    }
  }

  test("join_asof_nearest: picks exactly the brute nearest click with documented tiebreaks") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"value", $"event_type").collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant
        (r.getLong(0), i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getLong(2), r.getDouble(3), r.getString(4))
      }
    val clicks = ev.filter(_._5 == "click").groupBy(_._1)
    val out = operators.TimeSeries.asofNearest.run(spark, TestSpark.Sf).collect()
    val expectedN = ev.count(_._5 == "purchase")
    assert(out.length === expectedN, "one output row per purchase")
    val byId = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(4))))).toMap
    ev.filter(_._5 == "purchase").foreach { case (u, pts, pid, _, _) =>
      val cand = clicks.getOrElse(u, Array.empty)
      val got = byId(pid)
      if (cand.isEmpty) assert(got.isEmpty, s"purchase $pid: no clicks for user")
      else {
        // brute pick: min distance; tie → before side; before ties → max id,
        // after ties → min id
        val best = cand.minBy { case (_, cts, cid, _, _) =>
          val before = cts <= pts
          (math.abs(cts - pts), if (before) 0L else 1L,
            if (before) -cid else cid)
        }
        assert(got.contains((best._3, math.abs(best._2 - pts))),
          s"purchase $pid: got $got, brute ${(best._3, math.abs(best._2 - pts))}")
      }
    }
  }

  test("ts_rolling_ols: windowed sufficient statistics match a brute calendar-window recompute") {
    val out = operators.TimeSeries.rollingOls.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val daily = dailyCents()
    out.foreach { r =>
      val (t, d) = (r.getString(0), r.getDate(1).toLocalDate)
      val win = daily(t).filter { case (dd, _) =>
        val diff = d.toEpochDay - dd.toEpochDay; diff >= 0 && diff <= 13 }
      val xy = win.map { case (dd, v) => (dd.toEpochDay, v) }
      val n = xy.length.toLong
      assert(r.getAs[Long]("n_win") === n, s"$t $d window size")
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
      assert(r.getAs[Long]("slope_num") === n * sxy - sx * sy, s"$t $d Sxy")
      assert(r.getAs[Long]("slope_den") === n * sxx - sx * sx, s"$t $d Sxx")
    }
  }

  test("ts_forecast_eval: errors integerize the graded holt forecasts against next-day actuals") {
    val holt = operators.TimeSeries.holt.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getAs[Double]("forecast_next"))).toSeq
    val daily = dailyCents().map { case (t, xs) => t -> xs.toMap }
    val brute = holt.flatMap { case (t, d, fc) =>
      daily(t).get(d.plusDays(1)).map(actual =>
        t -> (math.round(fc) - actual))
    }.groupBy(_._1).map { case (t, es) =>
      t -> (es.length.toLong, es.map(e => math.abs(e._2)).sum, es.map(_._2).sum)
    }
    val out = operators.TimeSeries.forecastEval.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mae, bias) = brute(r.getString(0))
      assert(r.getAs[Long]("n_evals") === n, s"${r.getString(0)} n")
      assert(r.getAs[Long]("mae_num") === mae, s"${r.getString(0)} mae")
      assert(r.getAs[Long]("bias_num") === bias, s"${r.getString(0)} bias")
    }
  }

  test("ts_holt_winters: truncated kernel replays the exact zero-init seasonal recursion") {
    // The kernel IS the zero-init recursion with terms older than K
    // dropped, so on the last day (maximal warm-up) it must match the
    // sequential zero-init replay within the documented (1−γ)^(K/m)
    // seasonal truncation bound.
    import operators.TimeSeries.{HwAlpha => a, HwBeta => b, HwGamma => g, HwPeriod => m}
    val got = operators.TimeSeries.holtWinters.run(spark, TestSpark.Sf)
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.maxBy(_.getDate(1).toString) }
    assert(got.nonEmpty)
    got.foreach { case (t, r) =>
      val xs = dailyCents()(t).map(_._2.toDouble)
      var l = 0.0; var tr = 0.0
      val q = Array.fill(m)(0.0) // q(0)=s_t … q(m-1)=s_{t-m+1}, zero init
      xs.foreach { x =>
        val sOld = q(m - 1)
        val l2 = a * (x - sOld) + (1 - a) * (l + tr)
        tr = b * (l2 - l) + (1 - b) * tr
        val sNew = g * (x - l2) + (1 - g) * sOld
        l = l2
        for (j <- (m - 1) to 1 by -1) q(j) = q(j - 1)
        q(0) = sNew
      }
      val scale = xs.map(math.abs).max
      assert(math.abs(r.getAs[Double]("hw_level") - l) <= 0.08 * scale + 1.0,
        s"$t: truncated level vs exact $l")
      assert(math.abs(r.getAs[Double]("hw_season") - q(0)) <= 0.08 * scale + 1.0,
        s"$t: truncated season vs exact ${q(0)}")
      assert(math.abs(r.getAs[Double]("forecast_next") - (l + tr + q(m - 1)))
        <= 0.08 * scale + 1.0,
        s"$t: truncated forecast vs exact ${l + tr + q(m - 1)}")
    }
  }

  test("ts_holt_winters_damped: kernel replays the exact damped seasonal recursion") {
    // Same replay pin as the undamped test, with every trend READ scaled
    // by φ; plus the truncation-tightness claim (the first dropped kernel
    // term is no heavier than the undamped kernel's at equal K).
    import operators.TimeSeries.{HwAlpha => a, HwBeta => b, HwGamma => g,
      HwPeriod => m, HoltPhi => p}
    val got = operators.TimeSeries.holtWintersDamped.run(spark, TestSpark.Sf)
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.maxBy(_.getDate(1).toString) }
    assert(got.nonEmpty)
    got.foreach { case (t, r) =>
      val xs = dailyCents()(t).map(_._2.toDouble)
      var l = 0.0; var tr = 0.0
      val q = Array.fill(m)(0.0)
      xs.foreach { x =>
        val sOld = q(m - 1)
        val l2 = a * (x - sOld) + (1 - a) * (l + p * tr)
        tr = b * (l2 - l) + (1 - b) * p * tr
        val sNew = g * (x - l2) + (1 - g) * sOld
        l = l2
        for (j <- (m - 1) to 1 by -1) q(j) = q(j - 1)
        q(0) = sNew
      }
      val scale = xs.map(math.abs).max
      assert(math.abs(r.getAs[Double]("hwd_level") - l) <= 0.08 * scale + 1.0,
        s"$t: truncated damped level vs exact $l")
      assert(math.abs(r.getAs[Double]("hwd_season") - q(0)) <= 0.08 * scale + 1.0,
        s"$t: truncated damped season vs exact ${q(0)}")
      assert(math.abs(r.getAs[Double]("forecast_next") - (l + p * tr + q(m - 1)))
        <= 0.08 * scale + 1.0,
        s"$t: truncated damped forecast vs exact ${l + p * tr + q(m - 1)}")
    }
    // (No tail-weight ordering is asserted: the level↔ring coupling makes
    // individual kernel coordinates non-monotone in φ — measured, both
    // directions occur at K=22. The replay bound above IS the truncation
    // fidelity check; the seasonal ring's (1−γ)-per-period decay that
    // sets it is φ-independent by construction.)
    // φ = 1 must reproduce the undamped weights bit-for-bit (the graded
    // undamped query rides this identity).
    assert(operators.TimeSeries.holtWintersWeightsDamped(1.0)
      === operators.TimeSeries.holtWintersWeights)
  }

  test("ts_croston: kernel tracks the exact conditional recursion on a truly sparse calendar") {
    // Croston's recursion updates ONLY on demand days; the graded form
    // row-lags the demand-day subseries, so it must track the exact
    // sequential replay (classic init z=first size, p=first interval)
    // within the zero-init truncation band. Also pins the regime claim:
    // the calendar is actually intermittent (mean interval > 1 day).
    import operators.TimeSeries.{CrAlpha => a, CrK => k}
    val daily = sources.Tables.lineitem(spark, TestSpark.Sf)
      .join(sources.Tables.part(spark, TestSpark.Sf)
        .select($"p_partkey", $"p_brand".as("brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"brand", to_date($"l_shipdate").cast("string").as("d"))
      .agg(expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("qty"))
      .orderBy($"brand", $"d").collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
      .groupBy(_._1)
    val out = operators.TimeSeries.croston.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val brand = r.getString(0)
      val series = daily(brand).sortBy(_._2.toEpochDay)
      val sizes = series.map(_._3.toDouble)
      val epochs = series.map(_._2.toEpochDay)
      val gaps = epochs.zip(epochs.tail).map { case (x, y) => (y - x).toDouble }
      assert(gaps.sum / gaps.length > 1.0,
        s"$brand: the demand calendar must be intermittent for the test to mean anything")
      // exact conditional recursion, classic init
      var z = sizes.head
      sizes.tail.foreach { x => z = a * x + (1 - a) * z }
      var p = gaps.head
      gaps.tail.foreach { q => p = a * q + (1 - a) * p }
      val scale = sizes.max
      assert(math.abs(r.getAs[Double]("croston_size") - z)
        <= math.pow(1 - a, k) * scale * 2 + 1.0,
        s"$brand: truncated size vs exact $z")
      assert(math.abs(r.getAs[Double]("croston_interval") - p)
        <= math.pow(1 - a, k) * gaps.max * 2 + 0.5,
        s"$brand: truncated interval vs exact $p")
      assert(r.getAs[Double]("forecast_daily") > 0.0)
      assert(r.get(1).toString.take(10) === series.last._2.toString,
        s"$brand: last demand day")
    }
  }

  test("ts_intermittency: ADI and CV2 brute-match; quadrant labels recompute") {
    val daily = sources.Tables.lineitem(spark, TestSpark.Sf)
      .join(sources.Tables.part(spark, TestSpark.Sf)
        .select($"p_partkey", $"p_brand".as("brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"brand", to_date($"l_shipdate").cast("string").as("d"))
      .agg(expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("qty"))
      .collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
      .groupBy(_._1)
    val out = operators.TimeSeries.intermittency.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val series = daily(r.getString(0)).sortBy(_._2.toEpochDay)
      val n = series.length.toLong
      assert(r.getAs[Long]("n_demand_days") === n)
      val span = series.last._2.toEpochDay - series.head._2.toEpochDay
      val adi = span.toDouble / (n - 1).toDouble
      val sx = series.map(_._3).sum; val sxx = series.map(x => x._3 * x._3).sum
      val cv2 = (n * sxx - sx * sx).toDouble / (sx * sx).toDouble
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-4
      assert(close(r.getAs[Double]("adi"), adi), s"${r.getString(0)} adi")
      assert(close(r.getAs[Double]("cv2"), cv2), s"${r.getString(0)} cv2")
      val expected =
        if (adi < 1.32 && cv2 < 0.49) "smooth"
        else if (adi < 1.32) "erratic"
        else if (cv2 < 0.49) "intermittent"
        else "lumpy"
      assert(r.getAs[String]("pattern") === expected, s"${r.getString(0)} quadrant")
    }
  }

  test("ts_ols: exact rational slope matches brute sufficient statistics; R2 in [0,1]") {
    val brute = dailyCents().map { case (t, series) =>
      val d0 = series.map(_._1.toEpochDay).min
      val xy = series.map { case (d, v) => (d.toEpochDay - d0, v) }
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      t -> (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }
    val out = operators.TimeSeries.ols.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, num, den) = brute(r.getString(0))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("slope_num") === num,
        s"${r.getString(0)}: Sxy vs brute recompute")
      assert(r.getAs[Long]("slope_den") === den,
        s"${r.getString(0)}: Sxx vs brute recompute")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"R2 $r2 out of [0,1]")
      // the fitted line passes through the centroid: ȳ = slope·x̄ + intercept
      val xs = dailyCents()(r.getString(0))
      val d0 = xs.map(_._1.toEpochDay).min
      val xBar = xs.map(_._1.toEpochDay - d0).sum.toDouble / xs.length
      val yBar = xs.map(_._2).sum.toDouble / xs.length
      val fit = r.getAs[Double]("slope") * xBar + r.getAs[Double]("intercept")
      assert(math.abs(fit - yBar) <= math.abs(yBar) * 1e-9 + 1e-6,
        "OLS line must pass through the centroid")
    }
  }


  test("ts_drawdown: the reported fall replays the exact sequential peak-trough scan") {
    val out = operators.TimeSeries.drawdown.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    assert(out.length === daily.size)
    out.foreach { r =>
      val series = daily(r.getString(0)).map(_._2)
      var cum = 0L; var peak = Long.MinValue; var best = Long.MinValue
      var bestPeak = 0L; var bestCum = 0L; var bestIdx = -1
      series.zipWithIndex.foreach { case (v, i) =>
        cum += v; peak = math.max(peak, cum)
        if (peak - cum > best) {
          best = peak - cum; bestPeak = peak; bestCum = cum; bestIdx = i
        }
      }
      assert(r.getAs[Long]("max_drawdown_cents") === best)
      assert(r.getAs[Long]("peak_cents") === bestPeak)
      assert(r.getAs[Long]("trough_cents") === bestCum)
      assert(r.getDate(1).toLocalDate ===
        daily(r.getString(0))(bestIdx)._1, "earliest-trough tie-break")
    }
  }

  test("ts_bollinger: band arithmetic replays the exact trailing-window moments; flags consistent") {
    val out = operators.TimeSeries.bollinger.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    assert(out.length === daily.valuesIterator.map(_.size).sum)
    out.foreach { r =>
      val series = daily(r.getString(0))
      val i = series.indexWhere(_._1 == r.getDate(1).toLocalDate)
      val win = series.slice(math.max(0, i - 6), i + 1).map(_._2.toDouble)
      val mean = win.sum / win.length
      val sig = math.sqrt(win.map(v => (v - mean) * (v - mean)).sum / win.length)
      assert(r.getAs[Long]("n7") === win.length.toLong)
      assert(math.abs(r.getAs[Double]("mean7") - mean) <= 1e-2)
      assert(math.abs(r.getAs[Double]("sigma7") - sig) <= 1e-2)
      val v = series(i)._2.toDouble
      assert(r.getAs[Boolean]("breakout") ===
        (v > mean + 2 * sig + 1e-9 || v < mean - 2 * sig - 1e-9) ||
        math.abs(math.abs(v - mean) - 2 * sig) < 1e-6,
        "breakout flag must match the unrounded band test away from the boundary")
    }
  }

  test("ts_rsi: emitted only at full 14-diff windows and replays the rolling gain/loss ratio") {
    val out = operators.TimeSeries.rsi.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    out.foreach { r =>
      val series = daily(r.getString(0)).map(_._2)
      val i = daily(r.getString(0)).indexWhere(_._1 == r.getDate(1).toLocalDate)
      val diffs = series.zip(series.tail).map { case (a, b) => b - a }
      val wd = diffs.slice(math.max(0, i - 14), i) // diffs ending at day i
      val nDiffs = math.min(i, 14)
      assert(r.getAs[Long]("n_diffs") === nDiffs.toLong, "diff count in window")
      if (nDiffs == 14) {
        val g = wd.filter(_ > 0).sum.toDouble
        val l = -wd.filter(_ < 0).sum.toDouble
        if (g + l > 0)
          assert(math.abs(r.getAs[Double]("rsi") - 100.0 * g / (g + l)) <= 1e-2)
      } else assert(r.isNullAt(r.fieldIndex("rsi")), "partial windows emit NULL rsi")
    }
  }

  test("ts_sma_cross: every reported cross is a true sign flip of (sma3 - sma7), and none is missed") {
    val out = operators.TimeSeries.smaCross.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    val expected = daily.toSeq.flatMap { case (t, series) =>
      val vs = series.map(_._2)
      val signs = vs.indices.map { i =>
        if (i < 6) None
        else {
          val s3 = vs.slice(i - 2, i + 1).sum
          val s7 = vs.slice(i - 6, i + 1).sum
          Some(java.lang.Long.signum(s3 * 7 - s7 * 3))
        }
      }
      signs.indices.flatMap { i =>
        (for {
          cur <- signs(i); prev <- if (i > 0) signs(i - 1) else None
          if cur != prev && cur != 0 && prev != 0
        } yield (t, series(i)._1, if (cur > 0) "golden" else "death")).toSeq
      }
    }.toSet
    val got = out.map(r =>
      (r.getString(0), r.getDate(1).toLocalDate, r.getString(4))).toSet
    assert(got === expected)
  }

  test("ts_macd: truncated-kernel EMAs replay the renormalized lag fold; histogram is the difference") {
    val out = operators.TimeSeries.macd.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    def ema(vs: Seq[Double], i: Int, alpha: Double, k: Int): Double = {
      val terms = (0 until k).flatMap { j =>
        if (i - j >= 0) Some(alpha * math.pow(1 - alpha, j) -> vs(i - j)) else None
      }
      terms.map { case (w, v) => w * v }.sum / terms.map(_._1).sum
    }
    out.foreach { r =>
      val series = daily(r.getString(0))
      val i = series.indexWhere(_._1 == r.getDate(1).toLocalDate)
      val vs = series.map(_._2.toDouble)
      val macds = vs.indices.map(j =>
        ema(vs, j, 2.0 / 13, 16) - ema(vs, j, 2.0 / 27, 16))
      val signal = ema(macds, i, 2.0 / 10, 8)
      assert(math.abs(r.getAs[Double]("macd") - macds(i)) <= 1e-2)
      assert(math.abs(r.getAs[Double]("signal") - signal) <= 1e-2)
      assert(math.abs(r.getAs[Double]("hist")
        - (r.getAs[Double]("macd") - r.getAs[Double]("signal"))) <= 2e-4,
        "histogram = macd - signal up to independent rounding")
    }
  }

  test("ts_var_ratio: VR replays the exact trailing-diff variances; full windows only") {
    val out = operators.TimeSeries.varRatio.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    assert(out.length === daily.size)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    out.foreach { r =>
      val vs = daily(r.getString(0)).map(_._2)
      val d1 = vs.zip(vs.tail).map { case (a, b) => (b - a).toDouble }
      val d2 = d1.zip(d1.tail).map { case (a, b) => a + b }
      val d4 = d1.sliding(4).map(_.sum).toSeq
      assert(r.getAs[Long]("n_diffs") === d1.length.toLong)
      assert(math.abs(r.getAs[Double]("vr2")
        - variance(d2) / (2 * variance(d1))) <= 1e-4, "VR(2)")
      assert(math.abs(r.getAs[Double]("vr4")
        - variance(d4) / (4 * variance(d1))) <= 1e-4, "VR(4)")
    }
  }

  test("ts_did: the 2x2 cells and the DiD replay an independent split-and-mean") {
    val out = operators.TimeSeries.did.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    val daily = dailyCents().filter { case (t, _) => t == "purchase" || t == "view" }
    val days = daily.valuesIterator.flatMap(_.map(_._1.toEpochDay)).toSeq
    val (d0, d1) = (days.min, days.max)
    def cell(t: String, post: Boolean): Seq[Double] =
      daily(t).filter { case (d, _) =>
        ((d.toEpochDay - d0) * 2 > (d1 - d0)) == post
      }.map(_._2.toDouble)
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val didExp = (mean(cell("purchase", true)) - mean(cell("purchase", false))) -
      (mean(cell("view", true)) - mean(cell("view", false)))
    assert(r.getAs[Long]("n_t_post") === cell("purchase", true).length.toLong)
    assert(r.getAs[Long]("n_c_pre") === cell("view", false).length.toLong)
    assert(math.abs(r.getAs[Double]("did_cents") - didExp) <= 1e-2)
    // SE is the root of the four mean-variances; t = DiD / SE
    assert(math.abs(r.getAs[Double]("t_stat")
      - r.getAs[Double]("did_cents") / r.getAs[Double]("se")) <= 1e-2,
      "t-statistic consistency (up to independent rounding)")
  }

  test("ts_decompose: trend + seasonal + residual reconstruct v exactly; components replay") {
    val out = operators.TimeSeries.decompose.run(spark, TestSpark.Sf).collect()
    val daily = dailyCents()
    assert(out.nonEmpty)
    // full-window row count: each series loses 3 rows at each edge
    assert(out.length === daily.valuesIterator.map(s => math.max(0, s.size - 6)).sum)
    out.foreach { r =>
      val series = daily(r.getString(0))
      val i = series.indexWhere(_._1 == r.getDate(1).toLocalDate)
      assert(i >= 3 && i < series.length - 3, "only full centered windows emit")
      val trend = series.slice(i - 3, i + 4).map(_._2).sum / 7.0
      assert(math.abs(r.getAs[Double]("trend") - trend) <= 1e-2)
      // additivity up to independent rounding of the three components
      assert(math.abs(r.getAs[Long]("v").toDouble
        - (r.getAs[Double]("trend") + r.getAs[Double]("seasonal")
          + r.getAs[Double]("residual"))) <= 3e-4,
        "v = trend + seasonal + residual")
    }
    // per (type, dow): seasonal is the mean of detrended values
    val byKey = out.groupBy(r => (r.getString(0),
      r.getDate(1).toLocalDate.getDayOfWeek))
    byKey.foreach { case (_, rows) =>
      val seas = rows.map(_.getAs[Double]("seasonal")).distinct
      assert(seas.length === 1, "one seasonal component per (type, weekday)")
    }
  }

  test("ts_granger: F replays an exact two-regression OLS on the lagged daily pair") {
    val out = operators.TimeSeries.granger.run(spark, TestSpark.Sf).collect()
    assert(out.length === 2)
    val daily = dailyCents()
    val a = daily("click").toMap; val b = daily("purchase").toMap
    val days = a.keySet.intersect(b.keySet).toSeq.sortBy(_.toEpochDay)
    def fStat(y: Seq[Double], own: Seq[Double], cross: Seq[Double]): (Double, Double) = {
      val rows = (1 until y.length).map(i => (y(i), own(i - 1), cross(i - 1)))
      val n = rows.length.toDouble
      def c(f: ((Double, Double, Double)) => Double,
            g: ((Double, Double, Double)) => Double): Double =
        rows.map(r => f(r) * g(r)).sum - rows.map(f).sum * rows.map(g).sum / n
      val (cyy, c1y, c2y) = (c(_._1, _._1), c(_._2, _._1), c(_._3, _._1))
      val (c11, c22, c12) = (c(_._2, _._2), c(_._3, _._3), c(_._2, _._3))
      val rssR = cyy - c1y * c1y / c11
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val rssU = cyy - b1 * c1y - b2 * c2y
      (((rssR - rssU) * (n - 3)) / rssU, b2)
    }
    val ca = days.map(d => a(d).toDouble); val cb = days.map(d => b(d).toDouble)
    val expect = Map(
      "click->purchase" -> fStat(cb, cb, ca),
      "purchase->click" -> fStat(ca, ca, cb))
    out.foreach { r =>
      val (f, b2) = expect(r.getString(0))
      assert(r.getAs[Long]("n_days") === (days.length - 1).toLong)
      assert(math.abs(r.getAs[Double]("f_stat") - f) <= 1e-2, s"${r.getString(0)} F=$f")
      assert(math.abs(r.getAs[Double]("b_cross") - b2) <= 1e-4)
    }
  }

  test("ts_concurrency: sweep-line counts match a brute per-second overlap scan") {
    val out = operators.TimeSeries.concurrency.run(spark, TestSpark.Sf).collect()
    // brute: replay sessions, clip to days, count pairwise overlaps
    val sess = operators.TimeSeries.sessionize.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("t_start").getTime / 1000,
        r.getAs[java.sql.Timestamp]("t_end").getTime / 1000 + 1))
    val clips = sess.flatMap { case (t0, t1) =>
      val d0 = t0 / 86400; val d1 = (t1 - 1) / 86400
      (d0 to d1).map { d =>
        (d, math.max(t0, d * 86400), math.min(t1, (d + 1) * 86400)) }
    }.groupBy(_._1)
    assert(out.length === clips.size)
    out.foreach { r =>
      val day = r.getDate(0).toLocalDate.toEpochDay
      val cs = clips(day).map(c => (c._2, c._3))
      assert(r.getAs[Long]("n_sessions") === cs.length.toLong)
      // NOT .combinations(2): Scala dedups equal elements, undercounting
      // pairs of identical full-day clips — index the intervals instead.
      val ix = cs.toIndexedSeq
      val pairs = (for {
        i <- ix.indices; j <- (i + 1) until ix.length
        if ix(i)._1 < ix(j)._2 && ix(j)._1 < ix(i)._2
      } yield 1).size
      assert(r.getAs[Long]("overlap_pairs") === pairs.toLong, s"day $day pairs")
      // peak via brute sweep
      val evs = cs.flatMap { case (a0, a1) => Seq((a0, 1), (a1, -1)) }
        .sortBy(e => (e._1, e._2))
      var cur = 0; var peak = 0
      evs.foreach { e => cur += e._2; peak = math.max(peak, cur) }
      assert(r.getAs[Long]("peak_concurrency") === peak.toLong, s"day $day peak")
    }
  }
}
