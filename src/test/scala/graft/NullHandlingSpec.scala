package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Null-semantics pins on in-memory frames (the parquet fixtures are
  * null-free, so these paths never exercise otherwise): joins skip null
  * keys, aggregates ignore nulls, windows order them, set ops match them,
  * and the custom native expressions are null-safe. */
class NullHandlingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(java.lang.Long, java.lang.Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      StructType(Seq(StructField("k", LongType, nullable = true),
                     StructField("v", DoubleType, nullable = true))))

  test("equi-join never matches null keys; outer join preserves them") {
    val a = df(Seq((1L, 1.0), (null, 2.0)))
    val b = df(Seq((1L, 10.0), (null, 20.0)))
    assert(a.join(b, a("k") === b("k")).count() === 1)
    val full = a.join(b.withColumnRenamed("k", "k2").withColumnRenamed("v", "v2"),
      a("k") === col("k2"), "full_outer")
    assert(full.count() === 3) // match + two unmatched null-key rows
  }

  test("aggregates ignore null values; count(*) does not; count(col) does") {
    val d = df(Seq((1L, 1.0), (1L, null), (2L, null)))
    val r = d.groupBy($"k").agg(
      count(lit(1)).as("n_star"), count($"v").as("n_v"),
      sum($"v").as("s"), avg($"v").as("a"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(r(1L).getAs[Long]("n_star") === 2)
    assert(r(1L).getAs[Long]("n_v") === 1)
    assert(r(1L).getAs[Double]("s") === 1.0)
    assert(r(1L).getAs[Double]("a") === 1.0) // avg over non-null only
    assert(r(2L).isNullAt(r(2L).fieldIndex("s"))) // all-null group sums to null
  }

  test("window functions: nulls order NULLS FIRST asc; last ignoreNulls carries") {
    val d = df(Seq((1L, 3.0), (1L, null), (1L, 1.0)))
    val w = Window.partitionBy(lit(1)).orderBy($"v".asc_nulls_first)
    val ordered = d.withColumn("rn", row_number().over(w))
      .orderBy($"rn").collect()
    assert(ordered.head.isNullAt(1), "null sorts first by default asc")
    val fill = Window.partitionBy(lit(1)).orderBy($"rn")
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = d.withColumn("rn", row_number().over(w))
      .withColumn("ff", last($"v", ignoreNulls = true).over(fill))
      .orderBy($"rn").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("ff"))) None
                else Some(r.getDouble(r.fieldIndex("ff"))))
    // null v sorts first (no prior non-null -> ff null), then carry-forward
    assert(filled.toSeq === Seq(None, Some(1.0), Some(3.0)))
  }

  test("set ops treat null as equal to null (unlike join keys)") {
    val a = df(Seq((null, null), (1L, 1.0)))
    val b = df(Seq((null, null)))
    assert(a.intersect(b).count() === 1)
    assert(a.except(b).count() === 1)
  }

  test("native expressions are null-safe: null input -> null output") {
    val schema = StructType(Seq(
      StructField("toks", ArrayType(StringType), nullable = true),
      StructField("vec", ArrayType(FloatType), nullable = true)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq("a", "b", "c", "d"), Seq(1.0f, 0.0f)),
        Row(null, null))),
      schema)
    val out = d.select(
      graft.functions.ArrayFunctions.sortedShingles(spark, $"toks", 3).as("sh"),
      graft.functions.ArrayFunctions.simhash64(spark, $"toks").as("sim"),
      graft.functions.VectorFunctions.cosine(spark, $"vec", $"vec").as("cos"))
      .collect()
    val nullRow = out(1)
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1) && nullRow.isNullAt(2))
    val okRow = out(0)
    assert(!okRow.isNullAt(0) && !okRow.isNullAt(1) && okRow.getDouble(2) === 1.0)
  }
}
