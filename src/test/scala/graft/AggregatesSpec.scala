package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate properties not covered by the oracle. */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within declared 1% rsd of exact") {
    val li = sources.Tables.lineitem(spark, TestSpark.Sf)
    val rows = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact"),
           approx_count_distinct($"l_orderkey", 0.01).as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"exact=$e approx=$a")
    }
  }

  test("HLL sketch merge: re-aggregation lossless, estimates inside envelope") {
    // The re-aggregation contract agg_sketch_merge sells: union register
    // state is associative, so rolling the daily cube up through ANY
    // hierarchy (here a weekly intermediate) gives EXACTLY the estimate
    // of unioning the days directly — not just "close". (A one-shot
    // streaming-built sketch is deliberately NOT compared for equality:
    // its HIP estimator differs from union's composite estimator once
    // sketches go dense — measured at sf0.1: 1494 vs 1488 on exact 1500.)
    // All estimates must sit inside the HLL error envelope of exact.
    val ev = sources.Tables.events(spark, TestSpark.Sf)
    val daily = ev
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = daily
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val viaWeekly = daily
      .groupBy($"event_type", weekofyear($"day").as("wk"))
      .agg(hll_union_agg($"sk").as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val oneShot = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"),
           countDistinct($"user_id").as("exact"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = viaWeekly.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.collect().foreach { r =>
      val (et, one, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(m(et) == w(et), s"$et: daily=${m(et)} via-weekly=${w(et)} must be equal")
      assert(math.abs(one - exact).toDouble / exact < 0.05,
        s"$et: one-shot est=$one exact=$exact outside HLL envelope")
      assert(math.abs(m(et) - exact).toDouble / exact < 0.05,
        s"$et: merged est=${m(et)} exact=$exact outside HLL envelope")
    }
  }

  test("stream sketch merge reproduces the batch sketch cube exactly") {
    // Sketch union is associative+commutative, so assembling the cube
    // from 3 arrival waves must give byte-identical estimates to the
    // one-pass batch build — the no-reprocessing contract the streaming
    // form sells. Both registry forms now grade envelope booleans; full
    // rows (exact counts + both booleans) must agree, and every envelope
    // boolean must actually hold.
    val batch = operators.Aggregates.sketchMerge.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    val stream = streaming.StreamQueries.sketchMerge.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(batch.sameElements(stream))
    assert(batch.nonEmpty)
    batch.foreach { case (et, _, _, mergeExact, hllOk) =>
      assert(mergeExact, s"$et: union-of-daily != one-shot estimate")
      assert(hllOk, s"$et: merged estimate outside the 5% envelope")
    }
  }

  test("WeightedMean aggregator equals sum(x*w)/sum(w)") {
    val wm = udaf(functions.WeightedMean)
    val df = Seq((2.0, 1.0), (4.0, 3.0), (10.0, 0.0)).toDF("x", "w")
    val got = df.agg(wm($"x", $"w")).collect()(0).getDouble(0)
    assert(math.abs(got - (2.0 * 1 + 4.0 * 3) / 4.0) < 1e-12)
  }

  test("WeightedMean handles all-zero weights") {
    val wm = udaf(functions.WeightedMean)
    val df = Seq((2.0, 0.0), (4.0, 0.0)).toDF("x", "w")
    assert(df.agg(wm($"x", $"w")).collect()(0).getDouble(0) === 0.0)
  }

  test("count-min: never underestimates; heavy set = true heavy set on the fixture") {
    // CM's one-sided error bound: est(k) >= true(k) for EVERY key (each
    // of k's counters counts at least k's own occurrences), and on this
    // fixture the ~5x planted gap means thresholding the estimates
    // recovers exactly the true heavy set.
    val ev = sources.Tables.events(spark, TestSpark.Sf).select($"user_id")
    val hot = ev.filter($"user_id" % 50 === 3)
    val truth = (1 to 4).foldLeft(ev)((a, _) => a.unionAll(hot))
      .groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = operators.Aggregates.heavyHitters.run(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trueHeavy = truth.filter(_._2 >= operators.Aggregates.HeavyMin).keySet
    assert(est.keySet === trueHeavy, "thresholded estimates must equal true heavy set")
    est.foreach { case (k, e) =>
      assert(e >= truth(k), s"user $k: estimate $e underestimates true ${truth(k)}")
    }
    assert(trueHeavy.nonEmpty)
  }

  test("count-min incremental: daily-delta merge equals the one-shot cube counter-for-counter") {
    // CM counters add associatively, so sum-of-daily-deltas must be
    // EXACTLY the one-shot sketch — the property that makes the
    // incremental form's recurring cost O(day) instead of O(history).
    val stream = operators.Aggregates.cmStream(spark, TestSpark.Sf)
    val oneShot = stream
      .select(operators.Aggregates.cmRows($"user_id").as("rb"))
      .groupBy($"rb.j".as("j"), $"rb.b".as("b"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = stream
      .select(to_date($"ts").as("day"),
        operators.Aggregates.cmRows($"user_id").as("rb"))
      .groupBy($"day", $"rb.j".as("j"), $"rb.b".as("b"))
      .agg(count(lit(1)).as("dc"))
      .groupBy($"j", $"b").agg(sum($"dc").as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === oneShot)
    // and the graded outputs agree row-for-row
    val a = operators.Aggregates.heavyHitters.run(spark, TestSpark.Sf).collect().toSeq
    val b = operators.Aggregates.heavyHittersIncremental.run(spark, TestSpark.Sf).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("agg_mode: hand-recomputed winner for one user; ties break to the smaller value") {
    import spark.implicits._
    val out = operators.Aggregates.aggMode.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // recompute the first user's winner naively
    val u = out.head.getAs[Long]("user_id")
    val counts = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"user_id" === u)
      .groupBy($"event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = counts.minBy { case (t, c) => (-c, t) }
    assert(out.head.getAs[String]("mode_type") === expected._1)
    assert(out.head.getAs[Long]("cnt") === expected._2)

    // deterministic tiebreak: equal counts → lexicographically smallest
    val tied = Seq((1L, "zulu"), (1L, "alpha"), (1L, "zulu"), (1L, "alpha"),
      (2L, "beta")).toDF("user_id", "event_type")
    val rows = operators.Aggregates.modeOf(spark, tied).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "alpha", 2L), (2L, "beta", 1L)))
  }

  test("KS drift test: exact rational D matches a driver-side ECDF recompute") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
    val s1 = rows.filter(_._1 == "view").map(_._2).sorted
    val s2 = rows.filter(_._1 == "purchase").map(_._2).sorted
    val support = (s1 ++ s2).distinct.sorted
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val dNum = support.map { v =>
      val c1 = s1.count(_ <= v).toLong
      val c2 = s2.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    val out = operators.Analytics.ksTest.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
    assert(r.getAs[Long]("d_num") === dNum,
      "exact rational numerator must equal the brute ECDF deviation")
    assert(r.getAs[Long]("d_den") === n1 * n2)
    assert(r.getAs[Double]("d") === dNum.toDouble / (n1 * n2).toDouble)
  }

  test("Mann-Whitney U: doubled midranks match a brute rank recompute; U identity") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
    val pooled = rows.map(_._2).sorted
    // doubled midrank of value v = (first position + last position) of v's
    // tie span, 1-indexed — an integer even for even tie spans
    val lo = pooled.zipWithIndex.groupBy(_._1).map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val hi = pooled.zipWithIndex.groupBy(_._1).map { case (v, xs) => v -> (xs.map(_._2).max + 1) }
    val r1x2 = rows.filter(_._1 == "view").map(t => (lo(t._2) + hi(t._2)).toLong).sum
    val n1 = rows.count(_._1 == "view").toLong
    val n2 = rows.count(_._1 == "purchase").toLong
    val out = operators.Analytics.mannWhitney.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
    val (u1, u2) = (r.getAs[Long]("u1_x2"), r.getAs[Long]("u2_x2"))
    assert(u1 === 2 * n1 * n2 + n1 * (n1 + 1) - r1x2,
      "doubled U1 must match the brute midrank sum")
    assert(u1 + u2 === 2 * n1 * n2, "U1 + U2 = n1*n2 (doubled identity)")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("chi-squared: integerized statistic matches a brute contingency recompute") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", org.apache.spark.sql.functions.dayofweek($"ts").as("dow"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rT = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val cT = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val n = cells.values.sum
    val expected = cells.map { case ((t, d), o) =>
      val dev = o * n - rT(t) * cT(d)
      math.floor(dev.toDouble * dev.toDouble / (n.toDouble * rT(t) * cT(d)) * 1e12).toLong
    }.sum
    val out = operators.Analytics.chiSq.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_cells") === cells.size.toLong)
    assert(r.getAs[Long]("dof") === (rT.size - 1).toLong * (cT.size - 1))
    assert(r.getAs[Long]("chi2_e12") === expected,
      "integerized chi2 must match the brute contingency recompute")
    assert(r.getAs[Double]("chi2") === expected.toDouble / 1e12)
  }

  test("Gini: exact rational matches a brute Lorenz recompute, bounded in [0,1)") {
    val rows = sources.Tables.orders(spark, TestSpark.Sf)
      .select($"o_orderstatus", $"o_totalprice").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val out = operators.Analytics.gini.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val st = r.getString(0)
      val xs = rows.filter(_._1 == st).map(_._2).sorted
      val n = xs.length.toLong
      val sumC = xs.sum
      val sumIC = xs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("gini_num") === 2 * sumIC - (n + 1) * sumC,
        s"$st Gini numerator")
      assert(r.getAs[Long]("gini_den") === n * sumC)
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"$st gini $g out of range")
    }
  }

  private def cents(d: Double): Long =
    (BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong

  test("share-of-parent: nation cents partition the region total exactly") {
    val out = operators.Analytics.shareOfParent.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getString(1)).distinct.length === 25) // all TPC-H nations
    out.groupBy(_.getString(0)).foreach { case (region, rows) =>
      val regionCents = rows.map(_.getAs[Long]("region_cents")).distinct
      assert(regionCents.length === 1, s"$region: one denominator")
      assert(rows.map(_.getAs[Long]("nation_cents")).sum === regionCents.head,
        s"$region: nation cents must partition the region total exactly")
      val shareSum = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-12, s"$region shares sum $shareSum")
    }
  }

  test("Welch t: sufficient statistics match a brute recompute; df bracketed") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    def stats(t: String) = {
      val xs = rows.filter(_._1 == t).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n1, s1, q1) = stats("view")
    val (n2, s2, q2) = stats("purchase")
    val out = operators.Analytics.ttestWelch.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
    assert(r.getAs[Long]("md_num") === s1 * n2 - s2 * n1)
    assert(r.getAs[Long]("v1_num") === n1 * q1 - s1 * s1)
    assert(r.getAs[Long]("v2_num") === n2 * q2 - s2 * s2)
    val va = (n1 * q1 - s1 * s1).toDouble / (n1 * n1 * (n1 - 1)).toDouble
    val vb = (n2 * q2 - s2 * s2).toDouble / (n2 * n2 * (n2 - 1)).toDouble
    assert(r.getAs[Double]("t") ===
      (s1 * n2 - s2 * n1).toDouble / (n1 * n2).toDouble / math.sqrt(va + vb))
    val df = r.getAs[Double]("df")
    // Welch–Satterthwaite df is bracketed by min(n1,n2)−1 and n1+n2−2
    assert(df >= (math.min(n1, n2) - 1).toDouble - 1e-9 &&
      df <= (n1 + n2 - 2).toDouble + 1e-9, s"df $df outside bracket")
  }

  test("Spearman: doubled-midrank Pearson matches a brute recompute; |rho| <= 1") {
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select(to_date($"ts").as("d"), $"event_type", $"value").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), cents(r.getDouble(2))))
      .groupBy(_._1).iterator.map { case (_, xs) =>
        (xs.filter(_._2 == "view").map(_._3).sum,
          xs.filter(_._2 == "purchase").map(_._3).sum)
      }.toArray
    def dranks(xs: Array[Long]): Array[Long] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1L
        val hi = sorted.lastIndexWhere(_ == v) + 1L
        lo + hi // doubled midrank
      }
    }
    val rx = dranks(daily.map(_._1))
    val ry = dranks(daily.map(_._2))
    val n = daily.length.toLong
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(a => a * a).sum)
    val out = operators.Analytics.spearman.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("rho_num") === n * sxy - sx * sy,
      "doubled-rank Pearson numerator must match the brute recompute")
    assert(r.getAs[Long]("den_x") === n * sxx - sx * sx)
    assert(r.getAs[Long]("den_y") === n * syy - sy * sy)
    assert(math.abs(r.getAs[Double]("rho")) <= 1.0 + 1e-12)
  }

  test("Cramer's V: shares agg_chisq's integerized accumulator; V in [0,1]") {
    val chi = operators.Analytics.chiSq.run(spark, TestSpark.Sf).collect().head
    val out = operators.Analytics.cramersV.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("chi2_e12") === chi.getAs[Long]("chi2_e12"),
      "V must be computed from the SAME integerized chi2 as agg_chisq")
    val v = r.getAs[Double]("v")
    assert(v >= 0.0 && v <= 1.0, s"V $v out of [0,1]")
    assert(r.getAs[Double]("v") ===
      math.sqrt(r.getAs[Long]("chi2_e12").toDouble / 1e12
        / r.getAs[Long]("n").toDouble / (r.getAs[Long]("min_dim") - 1).toDouble))
  }

  test("ANOVA: sum-of-squares partition identity holds against a brute recompute") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val n = rows.length.toLong
    val sTot = rows.map(_._2).sum
    val qTot = rows.map(x => x._2 * x._2).sum
    val sst = qTot.toDouble - sTot.toDouble * sTot.toDouble / n.toDouble
    val out = operators.Analytics.anova.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Int]("k") === 5)
    val (ssb, ssw) = (r.getAs[Double]("ssb"), r.getAs[Double]("ssw"))
    assert(math.abs(ssb + ssw - sst) <= math.abs(sst) * 1e-9,
      "SSB + SSW must partition the total sum of squares")
    assert(ssb >= 0 && ssw > 0 && r.getAs[Double]("f") >= 0)
  }

  test("Wilcoxon: doubled signed-rank sum matches brute; W+ and W- conserve") {
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select(to_date($"ts").as("d"), $"event_type", $"value").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), cents(r.getDouble(2))))
      .groupBy(_._1).iterator.map { case (_, xs) =>
        xs.filter(_._2 == "view").map(_._3).sum - xs.filter(_._2 == "purchase").map(_._3).sum
      }.filter(_ != 0L).toArray
    val ads = daily.map(math.abs).sorted
    val lo = ads.zipWithIndex.groupBy(_._1).map { case (v, xs) => v -> (xs.map(_._2).min + 1L) }
    val hi = ads.zipWithIndex.groupBy(_._1).map { case (v, xs) => v -> (xs.map(_._2).max + 1L) }
    val wPlus2 = daily.filter(_ > 0).map(d => lo(math.abs(d)) + hi(math.abs(d))).sum
    val wMinus2 = daily.filter(_ < 0).map(d => lo(math.abs(d)) + hi(math.abs(d))).sum
    val n = daily.length.toLong
    val out = operators.Analytics.wilcoxon.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("w_plus_x2") === wPlus2,
      "doubled W+ must match the brute midrank recompute")
    assert(wPlus2 + wMinus2 === n * (n + 1), "2W+ + 2W- = n(n+1)")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("Benford: leading-digit counts match a brute string recompute; counts conserve") {
    val digits = sources.Tables.orders(spark, TestSpark.Sf)
      .select($"o_totalprice").collect()
      .map(r => cents(r.getDouble(0)).toString.head.asDigit.toLong)
    val brute = digits.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val out = operators.Analytics.benford.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(out.map(_.getAs[Long]("o")).sum === digits.length.toLong,
      "digit counts must conserve the row count")
    out.foreach { r =>
      assert(r.getAs[Long]("o") === brute(r.getAs[Long]("digit")),
        s"digit ${r.getAs[Long]("digit")} count")
      assert(r.getAs[Long]("n") === digits.length.toLong)
    }
    // every row repeats the same global statistic
    assert(out.map(_.getAs[Long]("chi2_e12")).distinct.length === 1)
  }

  test("quantile sketch cube: bounded state, accurate within bucket width, slicing-invariant") {
    val batch = operators.Aggregates.qsketchMerge.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(batch.nonEmpty)
    // Exact DISCRETE percentiles at the sketch's own ceil-rank rule —
    // the guarantee the sketch sells is |midpoint − disc value| ≤ bucket
    // width (interpolated percentile_cont is NOT the reference: at
    // fixture n≈190 a sparse p99 tail puts interpolation a whole tail-gap
    // away from ANY rank-based answer).
    val exact = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      .collect().groupBy(_.getString(0)).map { case (et, rows) =>
        val vs = rows.map(_.getLong(1)).sorted
        def disc(num: Int, den: Int) = vs((num * vs.length + den - 1) / den - 1)
        et -> (disc(1, 2), disc(9, 10), disc(99, 100))
      }
    batch.foreach { case (et, n, nBuckets, p50, p90, p99, bandOk) =>
      assert(bandOk, s"$et: exact disc percentile escaped its reported bucket")
      assert(n > 0)
      // State boundedness: ≤ 32 ids per octave × 64 possible octaves + zero.
      assert(nBuckets <= 32L * 64 + 1, s"$et: $nBuckets buckets")
      // Midpoint within one bucket width (≤ lo/16, values ≥ 16) of the
      // exact disc value at the same rank.
      Seq(p50 -> exact(et)._1, p90 -> exact(et)._2, p99 -> exact(et)._3)
        .foreach { case (est, ex) =>
          assert(math.abs(est - ex) <= ex / 16.0 + 1.0,
            s"$et: sketch $est vs exact disc $ex")
        }
    }
    // Arrival-slicing invariance: exact integer counters make the wave-
    // assembled cube's FULL output bit-equal to the batch cube's.
    val stream = streaming.StreamQueries.qsketchMerge.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(stream.sameElements(batch))
  }

  test("quantile cube serving: persisted-layout range serve == direct recompute") {
    import org.apache.spark.sql.functions.{broadcast, count => fcount, date_add, lit, min => fmin, sum => fsum}
    val served = operators.Aggregates.qsketchServeRange.run(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    // Direct recompute: bin raw events, restrict to the same relative
    // range, aggregate — no persisted cube involved. Layout serving must
    // be indistinguishable (exact integer counters).
    val binned = operators.Aggregates.qsketchBinned(spark, TestSpark.Sf)
    val d0 = broadcast(binned.agg(fmin($"day").as("d0")))
    val ranged = binned.crossJoin(d0)
      .filter($"day".between(date_add($"d0", 7), date_add($"d0", 21)))
    val direct = operators.Aggregates.qsketchServe(spark,
      ranged.groupBy($"event_type", $"bid").agg(fcount(lit(1)).as("c")),
      ranged)
      .collect().map(_.toSeq).toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("pinball: losses brute-replicate; exact quantile is the empirical minimizer") {
    val out = operators.Aggregates.pinball.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val cents = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cv"))
      .collect().groupBy(_.getString(0))
      .map { case (et, rows) => et -> rows.map(_.getLong(1)) }
    def pin(vs: Array[Long], yhat: Long, wUp: Long, wDn: Long): Long =
      vs.map(v => if (v >= yhat) wUp * (v - yhat) else wDn * (yhat - v)).sum
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vs = cents(et)
      assert(r.getAs[Long]("n") === vs.length.toLong)
      // Exact predictions are the ceil-rank discrete percentiles.
      val sorted = vs.sorted
      def disc(num: Int, den: Int) = sorted((num * sorted.length + den - 1) / den - 1)
      assert(r.getAs[Long]("p50_exact") === disc(1, 2))
      assert(r.getAs[Long]("p90_exact") === disc(9, 10))
      // Each ×10 loss column brute-replicates from the raw cents.
      assert(r.getAs[Long]("loss50_sketch_e1") ===
        pin(vs, r.getAs[Long]("p50_sketch"), 5, 5))
      assert(r.getAs[Long]("loss50_exact_e1") ===
        pin(vs, r.getAs[Long]("p50_exact"), 5, 5))
      assert(r.getAs[Long]("loss90_sketch_e1") ===
        pin(vs, r.getAs[Long]("p90_sketch"), 9, 1))
      assert(r.getAs[Long]("loss90_exact_e1") ===
        pin(vs, r.getAs[Long]("p90_exact"), 9, 1))
      // The structural invariant the query grades: the exact discrete
      // quantile minimizes the empirical pinball loss, so its loss can
      // never exceed the sketch estimate's — checked brute over EVERY
      // candidate value, not just the served pair.
      assert(r.getAs[Boolean]("exact_optimal"))
      val best50 = sorted.distinct.map(pin(vs, _, 5, 5)).min
      assert(r.getAs[Long]("loss50_exact_e1") === best50,
        s"$et: p50_exact is not the empirical pinball minimizer")
      val best90 = sorted.distinct.map(pin(vs, _, 9, 1)).min
      assert(r.getAs[Long]("loss90_exact_e1") === best90,
        s"$et: p90_exact is not the empirical pinball minimizer")
    }
  }

  test("overflow guard: passes values through under the bound, raises past it") {
    // The GraftQuery.guarded contract the Welch/ANOVA/moments/acf
    // accumulators rely on: while the no-overflow precondition holds the
    // guarded column IS the value (bit-for-bit — the oracles above prove
    // that end-to-end); when it fails the query must RAISE, because a
    // wrapped BIGINT sum would otherwise emit a silently wrong statistic.
    import org.apache.spark.sql.functions.{lit, col}
    val ok = spark.range(1)
      .select(GraftQuery.guarded(lit(42.5), col("id") < 1L, "boom").as("v"))
      .collect()
    assert(ok.head.getDouble(0) === 42.5)
    val e = intercept[Exception] {
      spark.range(1)
        .select(GraftQuery.guarded(lit(42.5), col("id") >= 1L, "boom").as("v"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("boom")),
      s"guard must surface its message, got: ${messages(e).mkString(" | ")}")
  }

  test("expectations: metrics match brute recomputes; audit flags the fixture's real pk defect") {
    val rows = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_quantity", $"l_discount", $"l_returnflag", $"l_extendedprice",
        $"l_orderkey", $"l_linenumber").collect()
    val n = rows.length.toDouble
    val brute = Map(
      "range_l_quantity" ->
        rows.count(r => r.getDouble(0) >= 1.0 && r.getDouble(0) <= 50.0) / n,
      "range_l_discount" ->
        rows.count(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 0.1) / n,
      "domain_l_returnflag" ->
        rows.count(r => Set("A", "N", "R")(r.getString(2))) / n,
      "uniqueness_pk" ->
        rows.map(r => r.getLong(4) * 100L + r.getInt(5)).distinct.length / n)
    val out = operators.Analytics.expectations.run(spark, TestSpark.Sf).collect()
    assert(out.length === 7)
    out.foreach { r =>
      val (name, metric) = (r.getString(0), r.getAs[Double]("metric"))
      brute.get(name).foreach(b =>
        assert(metric === b, s"$name metric vs brute recompute"))
      assert(r.getAs[Long]("ok") ===
        (if (metric >= r.getAs[Double]("threshold")) 1L else 0L))
      // The audit's value is that it FINDS defects: the synthetic fixture
      // genuinely repeats (l_orderkey, l_linenumber) pairs (~77% unique at
      // every SF), so uniqueness_pk must flag red while the six content
      // checks pass — an all-green suite on a dirty table would mean the
      // audit is decorative.
      if (name == "uniqueness_pk")
        assert(r.getAs[Long]("ok") === 0L && metric < 1.0,
          "the audit must flag the fixture's duplicated pk")
      else assert(r.getAs[Long]("ok") === 1L, s"fixture must pass $name")
    }
  }

  test("fn_checksum: digest matches a driver-side MD5/XOR recompute; one-row change flips it") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .select(to_date($"ts").as("d"), $"event_id", $"event_type", $"value").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getString(2),
        cents(r.getDouble(3))))
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val brute = rows.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map { case (_, id, t, c) => h48(s"$id|$t|$c") }.reduce(_ ^ _)
    }
    val out = functions.ScalarQueries.fnChecksum.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("checksum") === brute(r.getDate(0).toString),
        s"day ${r.getDate(0)}: digest vs driver recompute")
    }
    // sensitivity: perturbing one row's payload flips its day's digest
    val (d0, id0, t0, c0) = rows.head
    val flipped = brute(d0) ^ h48(s"$id0|$t0|$c0") ^ h48(s"$id0|$t0|${c0 + 1}")
    assert(flipped !== brute(d0), "a one-cent change must flip the digest")
  }

  test("HHI: exact rational concentration matches brute counts; bounded by [1/n, 1]") {
    val nationOf = sources.Tables.supplier(spark, TestSpark.Sf)
      .select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val counts = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_suppkey").collect().map(r => r.getLong(0))
      .groupBy(identity).map { case (k, xs) => (nationOf(k), k, xs.length.toLong) }
    val out = operators.Analytics.hhi.run(spark, TestSpark.Sf).collect()
    out.foreach { r =>
      val nation = r.getAs[Long]("nation")
      val cs = counts.filter(_._1 == nation).map(_._3).toSeq
      assert(r.getAs[Long]("n_suppliers") === cs.length.toLong)
      assert(r.getAs[Long]("total") === cs.sum)
      assert(r.getAs[Long]("hhi_num") === cs.map(c => c * c).sum)
      val h = r.getAs[Double]("hhi")
      assert(h >= 1.0 / cs.length - 1e-12 && h <= 1.0 + 1e-12,
        s"nation $nation HHI $h out of [1/n, 1]")
    }
    assert(out.nonEmpty)
  }

  test("pareto: cumulative shares match brute ranking; head flag is the exact cross-multiply") {
    val rev = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_partkey", $"l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }.toSeq
    val ranked = rev.sortBy { case (k, v) => (-v, k) }
    val total = rev.map(_._2).sum
    val cums = ranked.scanLeft(0L)(_ + _._2).tail
    val out = operators.Windows.pareto.run(spark, TestSpark.Sf).collect()
    assert(out.length === math.min(200, ranked.length))
    out.foreach { r =>
      // rn is BIGINT since the two-level rewrite (bucket prefix + within-
      // bucket row_number sum)
      val i = r.getAs[Long]("rn").toInt - 1
      assert(r.getAs[Long]("l_partkey") === ranked(i)._1, s"rank ${i + 1} key")
      assert(r.getAs[Long]("rev") === ranked(i)._2)
      assert(r.getAs[Long]("cum") === cums(i))
      assert(r.getAs[Long]("in_head80") ===
        (if (cums(i) * 5 <= total * 4) 1L else 0L))
    }
    // cumulative share is nondecreasing and ends ≤ 1
    val shares = out.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last <= 1.0 + 1e-12)
  }

  test("poisson bootstrap CI: weights, resample means, and percentiles brute-replicate") {
    // Full driver-side replay: same md5-derived uniforms, same Poisson(1)
    // threshold chain, same linear percentile interpolation — the CI must
    // reproduce to the emitted rounding. Pins the no-RNG determinism
    // claim end-to-end.
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type", to_date($"ts").cast("string").as("d"))
      .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val cums = {
      val e = math.exp(-1.0); var fact = 1.0
      (0 to 8).map { k => if (k > 0) fact *= k; e / fact }
        .scanLeft(0.0)(_ + _).drop(1)
    }
    def u48(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16).toDouble / 281474976710656.0
    }
    def pctl(sorted: Seq[Double], p: Double): Double = {
      val h = p * (sorted.length - 1)
      val lo = math.floor(h).toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val out = operators.Analytics.bootstrapCi.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(0)
      val rows = daily.filter(_._1 == t)
      val means = (0 until 200).flatMap { b =>
        val cells = rows.map { case (_, d, v) =>
          val u = u48(s"$t|$d|$b")
          val w = cums.count(u >= _).toLong
          (w * v, w)
        }
        val (sv, sw) = (cells.map(_._1).sum, cells.map(_._2).sum)
        if (sw > 0) Some(sv.toDouble / sw.toDouble) else None
      }
      assert(r.getAs[Long]("n_days") === rows.length.toLong)
      assert(r.getAs[Long]("n_resamples") === means.length.toLong)
      val sortedM = means.sorted
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-4
      assert(close(r.getAs[Double]("ci_lo"), pctl(sortedM, 0.025)), s"$t ci_lo")
      assert(close(r.getAs[Double]("ci_hi"), pctl(sortedM, 0.975)), s"$t ci_hi")
      val mean = rows.map(_._3).sum.toDouble / rows.length
      assert(close(r.getAs[Double]("mean_cents"), mean), s"$t mean")
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    }
  }

  test("CUPED: theta and adjusted means brute-replicate; adjustment conserves the pooled mean") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").cast("string").as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val mid = lo.plusDays((hi.toEpochDay - lo.toEpochDay) / 2)
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, rows.filter(!_._2.isAfter(mid)).map(_._3).sum,
        rows.filter(_._2.isAfter(mid)).map(_._3).sum)
    }.toSeq
    val n = users.length.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val syy = users.map(u => u._3 * u._3).sum
    val cxy = n * sxy - sx * sy; val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val theta = cxy.toDouble / vx.toDouble
    val out = operators.Analytics.cuped.run(spark, TestSpark.Sf).collect()
    assert(out.length === 2)
    def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol
    var pooledAdj = 0.0
    out.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val au = users.filter(_._1 % 2 == arm)
      assert(r.getAs[Long]("n_users") === au.length.toLong)
      val meanY = au.map(_._3).sum.toDouble / au.length
      assert(close(r.getAs[Double]("mean_y"), meanY, 1e-3), s"arm $arm mean_y")
      val adj = meanY - theta *
        (au.map(_._2).sum.toDouble / au.length - sx.toDouble / n)
      assert(close(r.getAs[Double]("mean_y_adj"), adj, 1e-3), s"arm $arm adj")
      assert(close(r.getAs[Double]("theta"), theta, 1e-5))
      val rho2 = cxy.toDouble * cxy.toDouble / (vx.toDouble * vy.toDouble)
      assert(close(r.getAs[Double]("var_reduction"), rho2, 1e-5))
      assert(r.getAs[Double]("var_reduction") >= 0.0
        && r.getAs[Double]("var_reduction") <= 1.0 + 1e-12)
      pooledAdj += r.getAs[Double]("mean_y_adj") * au.length
    }
    // CUPED must not move the pooled mean: Σ n_a·adj_a = Σ y (the
    // adjustment is mean-zero by construction).
    assert(close(pooledAdj, sy.toDouble, math.abs(sy.toDouble) * 1e-6 + 1.0),
      "adjustment must conserve the pooled mean")
  }

  test("power/MDE: sd, rho2 scaling, and relative MDE brute-replicate from user sums") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").cast("string").as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val mid = lo.plusDays((hi.toEpochDay - lo.toEpochDay) / 2)
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, rows.filter(!_._2.isAfter(mid)).map(_._3).sum,
        rows.filter(_._2.isAfter(mid)).map(_._3).sum)
    }.toSeq
    val n = users.length.toLong
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val syy = users.map(u => u._3 * u._3).sum
    val (cxy, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    val sd = math.sqrt(vy.toDouble / (n.toDouble * (n - 1).toDouble))
    val rho2 = cxy.toDouble * cxy.toDouble / (vx.toDouble * vy.toDouble)
    val nA = users.count(_._1 % 2 == 0).toLong
    val nB = n - nA
    val mde = (1.959963984540054 + 0.8416212335729143) * sd *
      math.sqrt(1.0 / nA + 1.0 / nB)
    val r = operators.Analytics.powerMde.run(spark, TestSpark.Sf).collect() match {
      case Array(row) => row
      case rows => fail(s"expected one row, got ${rows.length}")
    }
    def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol
    assert(r.getAs[Long]("n_a") === nA)
    assert(r.getAs[Long]("n_b") === nB)
    assert(close(r.getAs[Double]("sd_y"), sd, 1e-3))
    assert(close(r.getAs[Double]("mde_abs"), mde, 1e-3))
    assert(close(r.getAs[Double]("mde_cuped"), mde * math.sqrt(1 - rho2), 1e-3))
    assert(close(r.getAs[Double]("mde_rel"), mde / (sy.toDouble / n), 1e-5))
    assert(r.getAs[Double]("mde_cuped") <= r.getAs[Double]("mde_abs"),
      "the covariate adjustment can only shrink the MDE")
  }

  test("SRM: arm counts and the collapsed chi-square recompute; flag thresholds correctly") {
    val users = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id").distinct().collect().map(_.getLong(0))
    val nA = users.count(_ % 2 == 0).toLong
    val nB = users.length - nA
    val chi2 = (nA - nB).toDouble * (nA - nB).toDouble / (nA + nB).toDouble
    val r = operators.Analytics.srm.run(spark, TestSpark.Sf).collect()(0)
    assert(r.getAs[Long]("n_a") === nA)
    assert(r.getAs[Long]("n_b") === nB)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) <= 1e-6)
    assert(r.getAs[Boolean]("srm_detected") === (chi2 > 3.841458820694124))
  }

  test("RFM: segment cube brute-replicates; quintile marginals follow the ntile distribution") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").cast("string").as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
    val d0 = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, d0.toEpochDay - rows.map(_._2.toEpochDay).max,
        rows.length.toLong, rows.map(_._3).sum)
    }.toSeq
    val n = users.length.toLong
    assert(n >= 5, "fixture must have enough users for quintiles")
    def tiles(ranked: Seq[Long]): Map[Long, Long] = {
      // ranked: user ids in rank order; SQL-standard ntile distribution
      val q = n / 5; val m = n % 5
      ranked.zipWithIndex.map { case (u, i) =>
        val r = i + 1L
        val t = if (r <= (q + 1) * m) (r - 1) / (q + 1) + 1
                else m + (r - (q + 1) * m - 1) / q + 1
        u -> t
      }.toMap
    }
    val rT = tiles(users.sortBy(u => (u._2, u._1)).map(_._1))
    val fT = tiles(users.sortBy(u => (-u._3, u._1)).map(_._1))
    val mT = tiles(users.sortBy(u => (-u._4, u._1)).map(_._1))
    val brute = users.groupBy(u => (rT(u._1), fT(u._1), mT(u._1)))
      .map { case (cell, us) =>
        cell -> (us.length.toLong, us.map(_._3).sum, us.map(_._4).sum) }
    val out = operators.Windows.rfm.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_users")).sum === n,
      "every user lands in exactly one segment")
    assert(out.length === brute.size)
    out.foreach { r =>
      val cell = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (nu, fe, mo) = brute(cell)
      assert(r.getAs[Long]("n_users") === nu, s"$cell users")
      assert(r.getAs[Long]("n_events") === fe, s"$cell events")
      assert(r.getAs[Long]("monetary_cents") === mo, s"$cell monetary")
    }
    // each axis marginal follows the ntile size distribution (sizes
    // differ by at most one, larger tiles first)
    for ((axis, t) <- Seq(("r", rT), ("f", fT), ("m", mT))) {
      val sizes = t.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(sizes.keySet === (1L to 5L).toSet, s"$axis: five tiles")
      assert(sizes.values.max - sizes.values.min <= 1, s"$axis: balanced tiles")
    }
  }

  test("Markov transitions: counts brute-match per-user journeys; rows are distributions") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val brute = scala.collection.mutable.Map[(String, String), Long]()
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.tail).foreach { p =>
        brute(p) = brute.getOrElse(p, 0L) + 1L
      }
    }
    val out = operators.Analytics.markov.run(spark, TestSpark.Sf).collect()
    assert(out.length === brute.size)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === brute((r.getString(0), r.getString(1))),
        s"(${r.getString(0)} -> ${r.getString(1)}) count")
    }
    assert(out.map(_.getAs[Long]("n")).sum === brute.values.sum)
    // each source row's probabilities sum to ~1 (rounding at 6dp)
    out.groupBy(_.getString(0)).values.foreach { rows =>
      val sump = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(sump - 1.0) <= 1e-4, s"row distribution sums to $sump")
    }
  }

  test("cohort LTV: triangle brute-replicates; cumulative is monotone; revenue conserves") {
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").cast("string").as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2)))
    val first = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).minBy(_.toEpochDay) }
    def weekOf(d: java.time.LocalDate) =
      d.minusDays(d.getDayOfWeek.getValue - 1L).toString // ISO Monday
    val brute = ev.groupBy { case (u, d, _) =>
      (weekOf(first(u)), (d.toEpochDay - first(u).toEpochDay) / 7) }
      .map { case (cell, rows) => cell -> rows.map(_._3).sum }
    val sizes = first.groupBy { case (_, f) => weekOf(f) }
      .map { case (w, us) => w -> us.size.toLong }
    val out = operators.Analytics.cohortLtv.run(spark, TestSpark.Sf).collect()
    assert(out.length === brute.size)
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === ev.map(_._3).sum,
      "every cent lands in exactly one triangle cell")
    out.groupBy(_.getString(0)).foreach { case (cw, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("age_week"))
      var cum = 0L
      sorted.foreach { r =>
        val cell = (cw, r.getAs[Long]("age_week"))
        assert(r.getAs[Long]("revenue_cents") === brute(cell), s"$cell revenue")
        cum += r.getAs[Long]("revenue_cents")
        assert(r.getAs[Long]("cum_revenue_cents") === cum, s"$cell cumulative")
        assert(r.getAs[Long]("n_users") === sizes(cw), s"$cw size")
        assert(math.abs(r.getAs[Double]("ltv_per_user_cents")
          - cum.toDouble / sizes(cw)) <= 1e-3, s"$cell ltv")
      }
    }
  }

  test("k-anonymity: group sizes conserve; flags recompute; diversity bounded by size") {
    val out = operators.Analytics.kanon.run(spark, TestSpark.Sf).collect()
    val total = sources.Tables.customer(spark, TestSpark.Sf).count()
    assert(out.map(_.getAs[Long]("n")).sum === total,
      "every customer row must land in exactly one quasi-identifier group")
    out.foreach { r =>
      val (nG, lDiv) = (r.getAs[Long]("n"), r.getAs[Long]("l_div"))
      assert(lDiv >= 1L && lDiv <= nG,
        "l-diversity is at least 1 and at most the group size")
      assert(r.getAs[Long]("k_ok") === (if (nG >= 5L) 1L else 0L))
      assert(r.getAs[Long]("l_ok") === (if (lDiv >= 3L) 1L else 0L))
    }
  }

  test("agg_survival_km: estimator replays the exact sequential product-limit; risk set conserves") {
    val out = operators.Analytics.survivalKm.run(spark, TestSpark.Sf)
      .orderBy($"t").collect()
    assert(out.nonEmpty)
    // Independent replay from the raw events: per-user (duration, churn).
    val ev = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").as("dd")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val dmax = ev.map(_._2.toEpochDay).max
    val users = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val ds = rows.map(_._2.toEpochDay)
      (ds.max - ds.min, dmax - ds.max > 7)
    }
    val total = users.size.toLong
    var atRisk = total
    var sKm = 1.0
    var hNa = 0.0
    out.foreach { r =>
      val t = r.getAs[Long]("t")
      val d = users.count { case (tt, ch) => tt == t && ch }.toLong
      val c = users.count { case (tt, ch) => tt == t && !ch }.toLong
      assert(r.getAs[Long]("n_churned") === d, s"t=$t churned")
      assert(r.getAs[Long]("n_censored") === c, s"t=$t censored")
      assert(r.getAs[Long]("n_risk") === atRisk, s"t=$t risk set")
      sKm *= (atRisk - d).toDouble / atRisk
      hNa += d.toDouble / atRisk
      assert(math.abs(r.getAs[Double]("s_km") - sKm) <= 1e-5, s"t=$t KM")
      assert(math.abs(r.getAs[Double]("h_na") - hNa) <= 1e-5, s"t=$t NA")
      atRisk -= d + c
    }
    assert(atRisk === 0L, "every user leaves the risk set exactly once")
    // S(t) is nonincreasing and within [0, 1].
    val ss = out.map(_.getAs[Double]("s_km"))
    ss.zip(ss.tail).foreach { case (a, b) => assert(b <= a + 1e-12) }
    assert(ss.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("agg_theil: indices replay exactly and sit in their [0, ln n] band; equal incomes give 0") {
    val out = operators.Analytics.theil.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val spend = sources.Tables.orders(spark, TestSpark.Sf)
      .join(sources.Tables.customer(spark, TestSpark.Sf),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"c_custkey")
      .agg(expr("sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { r =>
      val xs = spend(r.getString(0)).map(_.toDouble)
      val mu = xs.sum / xs.length
      val tT = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
      val tL = xs.map(x => math.log(mu / x)).sum / xs.length
      assert(math.abs(r.getAs[Double]("theil_t") - tT) <= 1e-5, "Theil T")
      assert(math.abs(r.getAs[Double]("theil_l") - tL) <= 1e-5, "Theil L")
      assert(r.getAs[Double]("theil_t") >= -1e-9 &&
        r.getAs[Double]("theil_t") <= math.log(xs.length.toDouble) + 1e-9,
        "T in [0, ln n]")
      assert(r.getAs[Long]("n_customers") === xs.length.toLong)
    }
  }

  test("agg_elasticity: slope/R\u00b2 replay the exact OLS on ln cents; R\u00b2 bounded") {
    val out = operators.Analytics.elasticity.run(spark, TestSpark.Sf).collect()
    assert(out.length > 0)
    val rows = sources.Tables.lineitem(spark, TestSpark.Sf)
      .join(sources.Tables.part(spark, TestSpark.Sf),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("pc"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("qc"))
      .collect().map(r => (r.getString(0),
        math.log(r.getLong(1).toDouble), math.log(r.getLong(2).toDouble)))
      .groupBy(_._1)
    out.foreach { r =>
      val br = r.getString(0)
      val xs = rows(br).map(_._2); val ys = rows(br).map(_._3)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r2 = math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      // the 1e8 integerization bias is ~1e-8 per term; 1e-3 is generous
      assert(math.abs(r.getAs[Double]("elasticity") - slope) <= 1e-3,
        s"$br slope $slope")
      assert(math.abs(r.getAs[Double]("r2") - r2) <= 1e-3, s"$br r2 $r2")
      assert(r.getAs[Double]("r2") >= -1e-9 && r.getAs[Double]("r2") <= 1 + 1e-9)
      assert(r.getAs[Long]("n") === xs.length.toLong)
    }
  }

  test("agg_winsorized: robust means replay against an exact interpolated-percentile recomputation") {
    val out = operators.Analytics.winsorized.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val vals = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def pct(xs: Array[Double], q: Double): Double = {
      val h = (xs.length - 1) * q
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      xs(lo) + (h - lo) * (xs(hi) - xs(lo))
    }
    out.foreach { r =>
      val xs = vals(r.getString(0)).toArray
      val (p05, p95) = (pct(xs, 0.05), pct(xs, 0.95))
      val winsor = xs.map(x => math.min(math.max(x, p05), p95)).sum / xs.length
      val kept = xs.filter(x => x >= p05 && x <= p95)
      assert(math.abs(r.getAs[Double]("p05") - p05) <= 1e-3)
      assert(math.abs(r.getAs[Double]("p95") - p95) <= 1e-3)
      assert(math.abs(r.getAs[Double]("mean_winsor") - winsor) <= 1e-2)
      assert(math.abs(r.getAs[Double]("mean_trim") - kept.sum / kept.length) <= 1e-2)
      assert(r.getAs[Long]("n_clipped") === (xs.length - kept.length).toLong)
      // the winsorized mean sits between the trimmed bounds by construction
      assert(r.getAs[Double]("mean_winsor") >= p05 - 1e-6 &&
        r.getAs[Double]("mean_winsor") <= p95 + 1e-6)
    }
  }

  test("agg_lorenz: exactly 10 deciles, balanced, curve convex to the diagonal, ends at 1") {
    val out = operators.Analytics.lorenz.run(spark, TestSpark.Sf)
      .orderBy($"decile").collect()
    assert(out.length === 10)
    val total = sources.Tables.orders(spark, TestSpark.Sf)
      .select($"o_custkey").distinct().count()
    val sizes = out.map(_.getAs[Long]("n_users"))
    assert(sizes.sum === total)
    assert(sizes.max - sizes.min <= 1L, "ntile balance")
    // ascending-spend deciles: shares nondecreasing; cum_share hits 1.0
    val shares = out.map(_.getAs[Double]("share"))
    shares.zip(shares.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, "Lorenz shares must be nondecreasing") }
    assert(math.abs(out.last.getAs[Double]("cum_share") - 1.0) <= 1e-6)
    // cum_share below the diagonal everywhere (concentration)
    out.foreach { r =>
      assert(r.getAs[Double]("cum_share") <=
        r.getAs[Long]("decile").toDouble / 10.0 + 1e-6)
    }
  }

  test("agg_assoc_rules: pair counts symmetric, replayed from raw baskets; lift symmetric") {
    val out = operators.Analytics.assocRules.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val baskets = sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", to_date($"ts").as("d"), $"event_type")
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getDate(1)), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byPair = out.map(r => ((r.getString(0), r.getString(1)), r)).toMap
    byPair.foreach { case ((a, b), r) =>
      val nab = baskets.valuesIterator.count(s => s(a) && s(b)).toLong
      assert(r.getAs[Long]("n_ab") === nab, s"($a,$b) co-count")
      assert(r.getAs[Long]("n_a") ===
        baskets.valuesIterator.count(_(a)).toLong, s"$a singleton")
      assert(r.getAs[Long]("n_baskets") === baskets.size.toLong)
      // symmetry: support and lift agree with the reversed rule
      val rev = byPair((b, a))
      assert(rev.getAs[Long]("n_ab") === nab)
      assert(math.abs(rev.getAs[Double]("lift") - r.getAs[Double]("lift")) <= 1e-9)
    }
  }

  test("agg_effect_size: d and CLES replay brute-force moment and pairwise computations") {
    val out = operators.Analytics.effectSize.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val r = out.head
    val vals = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val xs = vals.filter(_._1 == "purchase").map(_._2)
    val ys = vals.filter(_._1 == "view").map(_._2)
    def meanVar(v: Array[Long]): (Double, Double) = {
      val m = v.map(_.toDouble).sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val ((m1, v1), (m2, v2)) = (meanVar(xs), meanVar(ys))
    val sp = math.sqrt(((xs.length - 1) * v1 + (ys.length - 1) * v2)
      / (xs.length + ys.length - 2))
    val d = (m1 - m2) / sp
    assert(r.getAs[Long]("n1") === xs.length.toLong)
    assert(math.abs(r.getAs[Double]("cohen_d") - d) <= 1e-5)
    assert(math.abs(r.getAs[Double]("hedges_g")
      - d * (1.0 - 3.0 / (4.0 * (xs.length + ys.length) - 9.0))) <= 1e-5)
    // brute pairwise CLES with half-credit ties
    val wins = (for (a <- xs; b <- ys) yield
      if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    assert(math.abs(r.getAs[Double]("cles")
      - wins / (xs.length.toDouble * ys.length)) <= 1e-6)
  }

  test("agg_price_index: indices replay the matched-basket sums; Fisher between L and P") {
    val out = operators.Analytics.priceIndex.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val py = sources.Tables.lineitem(spark, TestSpark.Sf)
      .groupBy($"l_partkey", year($"l_shipdate").as("yr"))
      .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))").as("rev"),
        expr("sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))").as("qty"))
      .collect().map(x => ((x.getLong(0), x.getInt(1)), (x.getLong(2), x.getLong(3))))
      .toMap
    val y0 = py.keysIterator.map(_._2).min
    out.foreach { r =>
      val yr = r.getInt(0)
      val matched = py.keysIterator.filter(_._2 == yr)
        .map(_._1).filter(pk => py.contains((pk, y0))).toSeq
      assert(r.getAs[Long]("n_parts") === matched.length.toLong)
      def terms(pk: Long): (Double, Double, Double, Double) = {
        val (rev1, qty1) = py((pk, yr)); val (rev0, qty0) = py((pk, y0))
        val (p1, p0) = (rev1.toDouble / qty1, rev0.toDouble / qty0)
        val (q1, q0) = (qty1 / 100.0, qty0 / 100.0)
        (p1 * q0, p0 * q0, p1 * q1, p0 * q1)
      }
      val ts = matched.map(terms)
      val l = ts.map(_._1).sum / ts.map(_._2).sum
      val pp = ts.map(_._3).sum / ts.map(_._4).sum
      assert(math.abs(r.getAs[Double]("laspeyres") - l) <= 1e-3, s"$yr L")
      assert(math.abs(r.getAs[Double]("paasche") - pp) <= 1e-3, s"$yr P")
      val (lo, hi) = (math.min(l, pp), math.max(l, pp))
      assert(r.getAs[Double]("fisher") >= lo - 1e-6 &&
        r.getAs[Double]("fisher") <= hi + 1e-6,
        "Fisher sits between Laspeyres and Paasche")
    }
  }

  test("stream_assoc_rules / stream_survival_km: wave-merged state reproduces the batch tables bit-for-bit") {
    // the straddling-basket case only exists when waves split a basket:
    // event_id waves do exactly that on the fixture (users act all month)
    val ba = operators.Analytics.assocRules.run(spark, TestSpark.Sf).collect()
    val sa = streaming.ResampleStream.streamAssocRules.run(spark, TestSpark.Sf).collect()
    assert(ba.map(_.toString).toSeq === sa.map(_.toString).toSeq,
      "arrival batching must not move one rule")
    val bk = operators.Analytics.survivalKm.run(spark, TestSpark.Sf).collect()
    val sk = streaming.ResampleStream.streamSurvivalKm.run(spark, TestSpark.Sf).collect()
    assert(bk.map(_.toString).toSeq === sk.map(_.toString).toSeq,
      "arrival batching must not move one curve point")
  }

  test("agg_levene: W replays the exact Brown-Forsythe statistic from raw groups") {
    val out = operators.Analytics.levene.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val vals = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def median(xs: Array[Double]): Double = {
      val h = (xs.length - 1) * 0.5
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      xs(lo) + (h - lo) * (xs(hi) - xs(lo))
    }
    val zs = vals.toSeq.map { case (_, xs) =>
      val m = median(xs.toArray); xs.map(x => math.abs(x - m))
    }
    val k = zs.length; val n = zs.map(_.length).sum
    val means = zs.map(g => g.sum / g.length)
    val grand = zs.flatten.sum / n
    val between = zs.zip(means).map { case (g, m) => g.length * (m - grand) * (m - grand) }.sum
    val within = zs.zip(means).map { case (g, m) => g.map(x => (x - m) * (x - m)).sum }.sum
    val w = ((n - k).toDouble / (k - 1)) * (between / within)
    assert(out.head.getAs[Long]("k") === k.toLong)
    assert(out.head.getAs[Long]("n_total") === n.toLong)
    assert(math.abs(out.head.getAs[Double]("levene_w") - w) <= 1e-4, s"W $w")
  }

  test("stream_effect_size / stream_price_index: merged count partials reproduce the batch readouts bit-for-bit") {
    val be = operators.Analytics.effectSize.run(spark, TestSpark.Sf).collect()
    val se = streaming.DriftStream.streamEffectSize.run(spark, TestSpark.Sf).collect()
    assert(be.map(_.toString).toSeq === se.map(_.toString).toSeq,
      "arrival batching must not move d, g, or CLES")
    val bp = operators.Analytics.priceIndex.run(spark, TestSpark.Sf).collect()
    val sp = streaming.DriftStream.streamPriceIndex.run(spark, TestSpark.Sf).collect()
    assert(bp.map(_.toString).toSeq === sp.map(_.toString).toSeq,
      "arrival batching must not move one index")
  }
}
