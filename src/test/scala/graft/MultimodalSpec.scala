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
}
