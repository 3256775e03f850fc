package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingUpsert

/** The foreachBatch merge sink: latest-wins keyed state across
  * micro-batches, idempotent under batch redelivery. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed upserts merge latest-wins across runs; redelivery is a no-op") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_upsert").toString
    val state = s"$dir/state"
    val ckpt = s"$dir/ckpt"

    val input = MemoryStream[(Long, Long, Double)]
    def updates = input.toDF().toDF("key", "version", "value")

    // run 1: initial inserts + an in-batch supersede (key 1 v2 beats v1)
    input.addData((1L, 1L, 10.0), (1L, 2L, 11.0), (2L, 1L, 20.0))
    StreamingUpsert.runOnce(spark, updates, state, ckpt)
    val s1 = StreamingUpsert.state(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s1 === Map(1L -> ((2L, 11.0)), 2L -> ((1L, 20.0))))

    // run 2: update one key, insert another; checkpoint resumes — the
    // run-1 rows are NOT re-consumed
    input.addData((2L, 3L, 21.0), (3L, 1L, 30.0))
    StreamingUpsert.runOnce(spark, updates, state, ckpt)
    val s2 = StreamingUpsert.state(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s2 === Map(1L -> ((2L, 11.0)), 2L -> ((3L, 21.0)), 3L -> ((1L, 30.0))))

    // redelivery: re-applying an already-merged batch changes nothing
    val replay = Seq((2L, 3L, 21.0), (3L, 1L, 30.0)).toDF("key", "version", "value")
    StreamingUpsert.mergeBatch(spark, replay, state)
    val s3 = StreamingUpsert.state(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s3 === s2)

    // stale update loses: version 1 for key 1 must not displace version 2
    StreamingUpsert.mergeBatch(spark,
      Seq((1L, 1L, 99.0)).toDF("key", "version", "value"), state)
    val s4 = StreamingUpsert.state(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s4 === s2)
  }
}
