package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-operator semantics the oracle alone can't isolate: the binned
  * range join must be a pure REWRITE of the naive theta join — identical
  * rows, only a different (scalable) physical shape. */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned range join == naive theta join, row for row") {
    val binned = operators.Joins.rangeBinned.run(spark, TestSpark.Sf)
    val ev = sources.Tables.events(spark, TestSpark.Sf)
    val iv = ev.orderBy($"value".desc, $"event_id").limit(20)
      .select($"event_id".as("win_id"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("t_lo"),
        ($"ts" + expr("INTERVAL 73 HOUR")).as("t_hi"))
    val naive = ev.select($"ts", $"value")
      .join(iv, $"ts" >= $"t_lo" && $"ts" < $"t_hi")
      .groupBy($"win_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    assert(binned.except(naive).count() === 0)
    assert(naive.except(binned).count() === 0)
    assert(binned.count() > 0, "fixture windows must catch events")
  }

  test("binning bounds are inclusive-lo / exclusive-hi at the exact edge") {
    // An interval covering [10:00, 12:00) over day-bins: events exactly at
    // t_lo are kept, exactly at t_hi dropped, and an event in a bin the
    // interval only PARTIALLY covers is filtered by the residual bound.
    val iv = Seq((1L, "2024-01-05 10:00:00", "2024-01-05 12:00:00"))
      .toDF("win_id", "lo", "hi")
      .select($"win_id", $"lo".cast("timestamp").as("t_lo"),
        $"hi".cast("timestamp").as("t_hi"))
    val ivBinned = iv.select($"win_id", $"t_lo", $"t_hi",
      explode(sequence(date_trunc("day", $"t_lo"), date_trunc("day", $"t_hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val evs = Seq("2024-01-05 09:59:59", "2024-01-05 10:00:00",
      "2024-01-05 11:59:59", "2024-01-05 12:00:00")
      .toDF("s").select($"s".cast("timestamp").as("ts"),
        date_trunc("day", $"s".cast("timestamp")).as("day"))
    val kept = evs.join(broadcast(ivBinned), Seq("day"))
      .filter($"ts" >= $"t_lo" && $"ts" < $"t_hi")
      .select($"ts".cast("string")).as[String].collect().toSet
    assert(kept === Set("2024-01-05 10:00:00", "2024-01-05 11:59:59"))
  }

  test("bloom prefilter: prunes the fact side, with zero false negatives") {
    // The end-to-end oracle proves result equality with the plain join;
    // what it can't see is whether the Bloom stage did anything. Assert
    // the two properties that make it a runtime filter: (a) conservative
    // — every order whose customer is truly in the dim survives; (b)
    // selective — a real fraction of non-matching orders is dropped
    // BEFORE the join (at 4096 bits / 3 hashes / ~segment-filtered-dim
    // keys, the false-positive rate is well under 50%, so survivors must
    // sit strictly between the true matches and the full fact table).
    val total = sources.Tables.orders(spark, TestSpark.Sf).count()
    val trueKeys = operators.Joins.bloomDim(spark, TestSpark.Sf)
      .select($"c_custkey").as[Long].collect().toSet
    val survivors = operators.Joins.bloomSurvivors(spark, TestSpark.Sf)
      .select($"o_custkey").as[Long].collect()
    val trueMatches = sources.Tables.orders(spark, TestSpark.Sf)
      .filter($"o_custkey".isin(trueKeys.toSeq: _*)).count()
    assert(survivors.count(trueKeys.contains) === trueMatches,
      "bloom filter dropped a true match (false negative)")
    assert(survivors.length < total,
      "bloom filter pruned nothing — every fact row survived")
    assert(survivors.length >= trueMatches)
  }

  test("scd2 pit lookup: every probe reads its own point-in-time version") {
    val evs = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // driver-side: latest change at or before the probe, tombstone-aware
    val byKey = evs.map { case (id, _, v) => (id % 1000, id, id % 7 == 0, v) }
      .groupBy(_._1)
    val out = operators.Joins.scd2Pit.run(spark, TestSpark.Sf).collect()
    assert(out.length === evs.count(_._2 == "purchase"))
    var live = 0; var dead = 0
    out.foreach { r =>
      val probe = r.getLong(0); val k = r.getLong(1)
      val (_, seq, del, v) = byKey(k).filter(_._2 <= probe).maxBy(_._2)
      if (del) {
        assert(r.isNullAt(2) && r.isNullAt(3), s"probe $probe: tombstoned key must read NULL")
        dead += 1
      } else {
        assert(r.getLong(2) === seq, s"probe $probe: version eff_from")
        assert(math.abs(r.getDouble(3) - v) < 6e-5, // rounded at 4dp
          s"probe $probe: version value ${r.getDouble(3)} vs $v")
        live += 1
      }
    }
    assert(live > 0 && dead > 0,
      s"fixture must exercise live and tombstoned probes (live=$live dead=$dead)")
  }

  test("bitemporal diff: added/restated cells replay a brute two-snapshot recompute") {
    val log = operators.Joins.bitemporalLog(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate, r.getLong(3)))
    val t1 = log.map(_._2).max / 2
    def snap(cut: Long) = log.filter(_._2 <= cut)
      .groupBy(x => (x._1, x._3))
      .map { case (kv, xs) => kv -> xs.maxBy(_._2) } // latest tx wins
    val s1 = snap(t1); val s2 = snap(Long.MaxValue)
    val expected = s2.flatMap { case (kv, (_, tx2, _, c2)) =>
      s1.get(kv) match {
        case None => Some((kv._1, kv._2, "added", None, c2, None, tx2, false))
        case Some((_, tx1, _, c1)) if tx1 != tx2 =>
          Some((kv._1, kv._2, "restated", Some(c1), c2, Some(tx1), tx2, c1 != c2))
        case _ => None
      }
    }.toSet
    val out = operators.Joins.bitemporalDiff.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6),
        r.getBoolean(7))).toSet
    assert(out === expected)
    assert(out.exists(_._3 == "added") && out.exists(_._3 == "restated"),
      "fixture must exercise both added and restated cells")
    assert(out.exists(_._8), "fixture must contain a real value revision")
  }

  test("bitemporal pit: every probe reads the latest believed version at its valid day") {
    val log = operators.Joins.bitemporalLog(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate, r.getLong(3)))
    val snap = log.groupBy(x => (x._1, x._3))
      .map { case (kv, xs) => kv -> xs.maxBy(_._2)._4 }
    val byKey = snap.groupBy(_._1._1)
    val probes = sources.Tables.events(spark, TestSpark.Sf)
      .filter($"event_type" === "purchase")
      .select($"event_id", to_date($"ts").as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val out = operators.Joins.bitemporalPit.run(spark, TestSpark.Sf).collect()
    assert(out.length === probes.length)
    var hit = 0; var miss = 0
    val probeDay = probes.toMap
    out.foreach { r =>
      val probe = r.getLong(0); val k = r.getLong(1); val v = probeDay(probe)
      val cands = byKey.getOrElse(k, Map.empty)
        .filter { case ((_, d), _) => !d.isAfter(v) }
      if (cands.isEmpty) {
        assert(r.isNullAt(2) && r.isNullAt(3),
          s"probe $probe: no version valid yet must read NULL")
        miss += 1
      } else {
        val (bestKv, bestC) = cands.maxBy { case ((_, d), _) => d.toEpochDay }
        assert(r.getDate(2).toLocalDate === bestKv._2, s"probe $probe: eff_valid_day")
        assert(r.getLong(3) === bestC, s"probe $probe: cents")
        hit += 1
      }
    }
    assert(hit > 0, s"fixture inert: no probe found a valid version (hit=$hit miss=$miss)")
  }

  test("hash sampling: membership matches a driver-side MD5 recompute; rate sane") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    val sampled = rows.filter { case (ok, ln, _) => md5hex(s"$ok-$ln") < "04" }
    val brute = sampled.groupBy(_._3).map { case (f, xs) => f -> xs.length.toLong }
    val out = operators.Relational.sampleHash.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_sampled")).sum === sampled.length.toLong,
      "sampled row count must match the driver-side MD5 recompute")
    out.foreach { r =>
      assert(r.getAs[Long]("n_sampled") === brute(r.getString(0)), r.getString(0))
    }
    // rate ≈ 4/256; allow wide slack at the small fixture
    val rate = sampled.length.toDouble / rows.length
    assert(rate > 0.003 && rate < 0.05, s"sample rate $rate out of band")
  }

  test("spatial grid join: exactly the brute-force radius pairs, each reported once") {
    val keys = sources.Tables.customer(spark, TestSpark.Sf)
      .select($"c_custkey").collect().map(_.getLong(0))
    def mix(k: Long): (Long, Long) = {
      val h1 = (k * 2654435761L) % 1000003L
      (h1 % 10000L, ((h1 * 40503L + 7919L) % 999983L) % 10000L)
    }
    val pts = keys.map(k => k -> mix(k))
    val brute = (for {
      (a, (ax, ay)) <- pts; (b, (bx, by)) <- pts
      if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= 10000L
    } yield (a, b, d2)).toSet
    val out = operators.Joins.spatialGrid.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === out.distinct.length,
      "grid neighborhoods must not double-report a pair")
    assert(out.toSet === brute,
      "grid join must find exactly the O(N²) brute-force radius pairs")
    assert(brute.nonEmpty, "fixture must yield at least one near pair")
  }
}
