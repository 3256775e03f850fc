package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MinHashSigAggregator, TextFunctions => TF}

/** The typed MinHash Aggregator must produce bit-identical signatures to
  * the codegen'd k-column min() formulation used in the dedup hot path. */
class AggregatorParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashSigAggregator matches the column-min signature table") {
    val k = 32
    val hashed = sources.Tables.documents(spark, TestSpark.Sf).limit(100)
      .select($"doc_id", explode(TF.hashedShingleSet(TF.tokens($"text"), 3)).as("sh"))
      .select($"doc_id", TF.shingleHash($"sh").as("h"))
      .cache()

    // column formulation: k codegen'd min() aggregates
    val mins = TF.minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(TF.permute($"h", a, b)).as(s"m$i")
    }
    val colSigs = hashed.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

    // typed formulation: Aggregator via udaf
    val aggSigs = hashed
      .groupBy($"doc_id")
      .agg(udaf(new MinHashSigAggregator(k)).apply($"h").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

    assert(aggSigs.keySet === colSigs.keySet)
    aggSigs.foreach { case (id, sig) =>
      assert(sig === colSigs(id), s"signature mismatch for doc $id")
    }
    hashed.unpersist()
  }
}
