package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with GraftExtensions can call every native expression
  * from pure SQL — the installable-library contract. */
class ExtensionsSpec extends AnyFunSuite {

  /** Builder extensions only apply to a NEW session — getOrCreate would
    * silently return the suite-shared session, so clear the default/active
    * slots around construction and restore them for the other suites. */
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
    s
  }

  test("all graft functions resolve and evaluate from SQL") {
    val row = spark.sql("""
      SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                          array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
             graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dot,
             graft_simhash64(array('a', 'b')) AS sim,
             graft_sorted_shingles(array('a', 'b', 'c', 'd'), 3) AS sh,
             graft_minhash_sig(array(CAST(7 AS BIGINT)), 4, CAST(42 AS BIGINT)) AS sig
    """).collect().head
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 6.0)
    assert(row.getSeq[Long](3).length === 2) // 2 trigrams of a 4-token doc
    assert(row.getSeq[Long](4).length === 4)
    val isz = spark.sql("""
      SELECT graft_sorted_intersect_size(
        array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
        array(CAST(2 AS BIGINT), CAST(5 AS BIGINT), CAST(9 AS BIGINT))) AS n
    """).collect().head.getInt(0)
    assert(isz === 2)
    val row2 = spark.sql("""
      SELECT graft_positional_shingles(array('a', 'b', 'c', 'd'), 3) AS ps,
             graft_simhash_from_hashes(
               array(CAST(5 AS BIGINT), CAST(5 AS BIGINT)), 60) AS sh
    """).collect().head
    assert(row2.getSeq[Long](0).length === 2)
    // every hash = 5 (0b101): unanimous votes reproduce the hash itself
    assert(row2.getLong(1) === 5L)
    // positional sort+distinct == sorted form
    val parity = spark.sql("""
      SELECT array_sort(array_distinct(
               graft_positional_shingles(array('a', 'b', 'c', 'd'), 3)))
             = graft_sorted_shingles(array('a', 'b', 'c', 'd'), 3) AS eq
    """).collect().head.getBoolean(0)
    assert(parity)
  }

  test("SQL-form expressions agree with the Column-form registrations") {
    import spark.implicits._
    val d = sources.Tables.documents(spark, TestSpark.Sf).limit(20)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("toks"))
    d.createOrReplaceTempView("ext_docs")
    val sqlForm = spark.sql(
      "SELECT doc_id, graft_simhash64(toks) AS s FROM ext_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val colForm = d.select($"doc_id",
      graft.functions.ArrayFunctions.simhash64(spark, $"toks").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlForm === colForm)
  }
}
