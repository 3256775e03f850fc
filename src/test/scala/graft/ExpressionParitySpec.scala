package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArrayFunctions => AF, TextFunctions => TF}

/** Every native row-level expression must agree bit-for-bit with the
  * declarative (higher-order-function / dataflow) formulation it replaced
  * in the dedup hot path. */
class ExpressionParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = sources.Tables.documents(spark, TestSpark.Sf).limit(200)

  test("SortedHashedShingles == array_sort(shingleSetFromHashes(tokenHashes))") {
    val rows = docs
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .select($"doc_id", TF.tokenHashes($"toks").as("th"), $"toks")
      .select($"doc_id",
        AF.sortedShingles(spark, $"toks", 3).as("native"),
        array_sort(TF.shingleSetFromHashes($"th", 3)).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"shingle mismatch for doc ${r.getLong(0)}")
    }
  }

  test("MinHashSignature == explode + k min-aggregate column form") {
    val k = 16
    val sh = docs
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .select($"doc_id", AF.sortedShingles(spark, $"toks", 3).as("shingles"))
      .cache()
    val native = sh
      .select($"doc_id", AF.minhashSignature(spark, $"shingles", k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val mins = TF.minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(TF.permute($"h", a, b)).as(s"m$i")
    }
    val agg = sh.select($"doc_id", explode($"shingles").as("s"))
      .select($"doc_id", TF.shingleHash($"s").as("h"))
      .groupBy($"doc_id").agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(native.keySet === agg.keySet)
    native.foreach { case (id, sig) => assert(sig === agg(id), s"doc $id") }
    sh.unpersist()
  }

  test("SimHash64 == explode-tokens x 64-bit-votes dataflow form") {
    val native = docs
      .select($"doc_id", AF.simhash64(spark, TF.tokens($"text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dataflow = docs
      .select($"doc_id", explode(TF.tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(63))).as("bit"))
      .select($"doc_id", $"bit",
        when(expr("shiftright(h, CAST(bit AS INT))").bitwiseAND(lit(1L)) === 1L,
          lit(1)).otherwise(lit(-1)).as("sign"))
      .groupBy($"doc_id", $"bit").agg(sum($"sign").as("s"))
      .groupBy($"doc_id")
      .agg(sum(when($"s" > 0, expr("shiftleft(1L, CAST(bit AS INT))"))
        .otherwise(lit(0L))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.keySet === dataflow.keySet)
    native.foreach { case (id, sh) => assert(sh === dataflow(id), s"doc $id") }
  }

  test("PositionalHashedShingles: sort+distinct equals SortedHashedShingles") {
    val rows = docs
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .select($"doc_id",
        array_sort(array_distinct(
          AF.positionalShingles(spark, $"toks", 3))).as("posDeduped"),
        AF.sortedShingles(spark, $"toks", 3).as("sorted"),
        size(AF.positionalShingles(spark, $"toks", 3)).as("nPos"),
        (greatest(size($"toks") - 3, lit(0)) + 1).as("nExpected"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"hash-set mismatch for doc ${r.getLong(0)}")
      assert(r.getInt(3) === r.getInt(4),
        s"positional count mismatch for doc ${r.getLong(0)}")
    }
  }

  test("SimHashFromHashes == aggregate-per-bit declarative form (60-bit md5)") {
    val rows = docs
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .withColumn("hashes",
        expr("transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"))
      .select($"doc_id",
        AF.simhashFromHashes(spark, $"hashes", 60).as("native"),
        expr("""aggregate(sequence(0, 59), CAST(0 AS BIGINT),
                (acc, j) -> acc + IF(
                  aggregate(hashes, CAST(0 AS BIGINT),
                    (a, h) -> a + (shiftright(h, j) % 2) * 2 - 1) > 0,
                  CAST(pow(2, j) AS BIGINT), CAST(0 AS BIGINT)))""").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}")
    }
  }

  test("SortedLongIntersectSize == size(array_intersect) on sorted sets") {
    val sh = docs
      .select($"doc_id", AF.sortedShingles(spark, TF.tokens($"text"), 3).as("s"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id").limit(5000)
      .select(
        AF.sortedIntersectSize(spark, $"a.s", $"b.s").as("native"),
        size(array_intersect($"a.s", $"b.s")).as("builtin"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("signed zero: round() emits +0.0 and roundNorm pins the sign (r13 ts_macd)") {
    // The round-13 ts_macd lesson: a tiny NEGATIVE double rounding to
    // zero. Spark's round goes through BigDecimal (no -0.0 exists there)
    // → +0.0 always; DuckDB's round keeps the operand sign → -0.0. The
    // driver hashes a string render, so the pair diverges despite
    // numeric equality. roundNorm appends `+ 0.0`, which by IEEE-754
    // maps -0.0 → +0.0 and is the identity on every other value.
    val rows = Seq(-1.0e-9, -0.0, 0.0, -0.00004, 0.00004, -1.23455, 2.5)
      .toDF("x")
      .select(
        round($"x", 4).as("plain"),
        GraftQuery.roundNorm($"x", 4).as("norm"),
        GraftQuery.roundNorm($"x" * -1.0, 4).as("normNeg"))
      .collect()
    rows.foreach { r =>
      val Seq(plain, norm, normNeg) =
        Seq(0, 1, 2).map(i => java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
      val negZeroBits = java.lang.Double.doubleToRawLongBits(-0.0)
      assert(plain !== negZeroBits, "Spark round must never emit -0.0")
      assert(norm !== negZeroBits, "roundNorm must never emit -0.0")
      assert(normNeg !== negZeroBits, "roundNorm must never emit -0.0 (negated)")
      assert(norm === plain, "roundNorm must be the identity on round()'s output")
    }
    // And the raw hazard really exists: an unnormalized ARITHMETIC -0.0
    // (what DuckDB's round can emit) bit-differs from +0.0.
    assert(java.lang.Double.doubleToRawLongBits(-0.0) !==
      java.lang.Double.doubleToRawLongBits(0.0))
  }
}
