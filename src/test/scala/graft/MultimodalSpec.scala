package graft

import org.scalatest.funsuite.AnyFunSuite

/** The typed mapPartitions decode pipeline must agree with the SQL-surface
  * stub (same arithmetic, two execution paths). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed decodeStub equals SQL-surface mm_decode_stub") {
    val binDf = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val typed = llm.Multimodal.decodeStub(spark, binDf)
      .toDF().orderBy("doc_id").collect()
    val sql = llm.Multimodal.decodeStubQuery.run(spark, TestSpark.Sf).collect()
    assert(typed.length === sql.length)
    typed.zip(sql).foreach { case (t, s) =>
      assert(t.getLong(0) === s.getLong(0))
      assert(t.getInt(1) === s.getInt(1), s"width for doc ${t.getLong(0)}")
      assert(t.getInt(2) === s.getInt(2), s"height for doc ${t.getLong(0)}")
      assert(t.getInt(3) === s.getInt(3), s"n_frames for doc ${t.getLong(0)}")
      assert(t.getString(4) === s.getString(4), s"codec for doc ${t.getLong(0)}")
    }
  }

  test("decode stub is deterministic per payload") {
    val m1 = llm.Multimodal.decodeStubRecord(1L, "hello world".getBytes)
    val m2 = llm.Multimodal.decodeStubRecord(1L, "hello world".getBytes)
    assert(m1 === m2)
  }

  test("phash dedup: groups are byte-length classes, keeper is min id, singletons dropped") {
    import org.apache.spark.sql.functions._
    val out = llm.Multimodal.phashDedup.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // the stub signature is a pure function of payload byte length, so the
    // collision groups must be exactly the byte-length classes of size >= 2
    val lens = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", octet_length($"text".cast("binary")).as("b")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def sig(b: Long): Long =
      (((64 + b % 577) * 512 + (64 + (b * 7) % 417)) * 32 + (1 + b % 16)) * 4 + b % 3
    val expected = lens.groupBy(r => sig(r._2.toLong)).collect {
      case (p, rs) if rs.length >= 2 =>
        (p, rs.map(_._1).min, rs.length.toLong, rs.map(_._1).max)
    }.toSet
    val got = out.map(r => (r.getAs[Long]("phash"), r.getAs[Long]("keeper"),
      r.getAs[Long]("n_copies"), r.getAs[Long]("max_dup"))).toSet
    assert(got === expected, "collision groups must be exactly byte-length classes")
    // coarseness is the point: at least one group collapses DISTINCT payloads
    val byLen = lens.groupBy(_._2).filter(_._2.length >= 2)
    assert(byLen.nonEmpty, "fixture must contain equal-length distinct payloads")
  }
}
