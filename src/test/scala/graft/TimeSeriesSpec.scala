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
      val dim = ev.groupBy($"user_id").agg(round(avg($"value"), 4).as("user_avg"))
      ev.join(dim, Seq("user_id"))
        .select($"event_id", $"user_id", $"user_avg").orderBy($"event_id")
        .collect().toSeq
    }
    val salted = operators.TimeSeries.skewSalted.run(spark, TestSpark.Sf)
      .collect().toSeq
    assert(salted === plain)
  }
}
