package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, SessionOut}

/** flatMapGroupsWithState sessionization and stream-stream joins — the
  * stateful streaming surface (SURVEY.md §2b streaming rows the batch
  * oracle can't grade). */
class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("flatMapGroupsWithState emits sessions closed by the inactivity gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // session A: 3 events within gap; then silence long past the gap
      input.addData(Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(1L, ts(9), 3.0))
      q.processAllAvailable()
      // same batch-key arrival far beyond the gap closes session A inline
      input.addData(Event(1L, ts(60), 10.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[SessionOut].collect()
      assert(rows.length === 1)
      val s = rows.head
      assert(s.user_id === 1L && s.n_events === 3 && s.sum_value === 6.0)
      assert(s.session_start === ts(0) && s.session_end === ts(19))
    } finally q.stop()
  }

  test("stateful sessionization agrees with session_window in batch") {
    val events = Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0),
      Event(1L, ts(30), 3.0),
      Event(2L, ts(2), 5.0))
      .toDF("user_id", "ts", "value")
    val viaWindow = events
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .select($"user_id", $"session_window.start".as("st"), $"n", $"s")
      .orderBy($"user_id", $"st")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    // drive the same events through the stateful op, closing all sessions
    // with a distant flush event per user
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sess_batch_cmp")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0),
        Event(1L, ts(30), 3.0), Event(2L, ts(2), 5.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(300), 0.0), Event(2L, ts(300), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_batch_cmp").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start, s.n_events.toLong, s.sum_value))
        .sortBy(x => (x._1, x._2.getTime))
      assert(got.toSeq === viaWindow.toSeq)
    } finally q.stop()
  }

  test("stream-stream inner join within event-time bounds") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "20 minutes")
    val v = views.toDF().toDF("v_user_id", "view_ts").withWatermark("view_ts", "20 minutes")
    val joined = c.join(v,
      $"user_id" === $"v_user_id" &&
        $"view_ts" >= $"click_ts" && $"view_ts" <= $"click_ts" + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(0)))
      views.addData((1L, ts(5)))   // within 10 min of user 1's click → joins
      views.addData((2L, ts(30)))  // 30 min later → outside bound, no join
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 1L)
    } finally q.stop()
  }
}
