package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md, FIXTURES.md).
  *
  * Scale note: these are plain parquet scans. On a real cluster the same code
  * points at a partitioned table root; Spark's DataSource V2 handles split
  * planning, predicate pushdown, column pruning and partition pruning — the
  * queries built on top of these loaders never assume single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (older fixtures,
    * which Spark's reader rejects without the nanos-as-long legacy conf) and
    * as TIMESTAMP(MICROS) without the UTC flag (current fixtures, which read
    * as TIMESTAMP_NTZ). Normalize both to a session-TZ TimestampType column —
    * the session TZ is pinned to UTC, so the wall-clock values are identical
    * either way (FIXTURES.md "Stream table" note).
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Set the legacy conf only when the fixture actually needs it: probe the
    // schema without it first (current MICROS fixtures load fine), and fall
    // back to nanos-as-long only for old TIMESTAMP(NANOS) fixtures. The conf
    // must then STAY set for the session — executors re-read it from the
    // session conf when converting each file footer at execution time — but
    // that path only engages on legacy fixtures, so a normal session never
    // has its nanos-timestamp reads silently degraded to longs.
    val raw =
      try spark.read.parquet(s"$sfDir/events.parquet")
      catch {
        case _: Exception =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$sfDir/events.parquet")
      }
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** The DERIVED partsupp table — the fixture ships no partsupp parquet,
    * so the TPC-H part-supplier queries (Q2/Q11/Q16/Q20 shapes) derive it
    * deterministically from part × a 4-row index, dbgen-style: part k's
    * i-th supplier is (k + i·(S div 4) + (k div S)) mod S over the LIVE
    * supplier count S, so every (part, supplier) edge lands on an existing
    * supplier at any scale factor, the 4 suppliers per part are distinct
    * (for S ≥ 4, 3·(S div 4) < S), and the DuckDB oracle reproduces the
    * identical table from the same arithmetic (integer-exact in both
    * engines — no floating boundary anywhere in the derivation).
    * Quantities and costs are hash-like integer mixes of the two keys;
    * cost is carried BOTH as exact cents (BIGINT — what aggregates and
    * comparisons use, per the FIXTURES.md money discipline) and as the
    * display double cents/100.
    *
    * Scale shape: a scan-side projection over part (the 4-way explode is
    * a generator, the supplier count a 1-row broadcast) — no shuffle; at
    * 100 TB this is exactly a column-derivation view over the part table,
    * and every query on top joins it like a real fact table. */
  def partsupp(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sCount = broadcast(supplier(spark, sfDir).agg(count(lit(1)).as("s")))
    part(spark, sfDir)
      .crossJoin(sCount)
      .select(col("p_partkey"), col("s"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(col("p_partkey").as("ps_partkey"),
        expr("(p_partkey + i * (s div 4) + (p_partkey div s)) % s")
          .as("ps_suppkey"))
      .withColumn("ps_availqty",
        ((col("ps_partkey") * 7 + col("ps_suppkey") * 13) % 9999 + 1).cast("int"))
      .withColumn("ps_supplycost_cents",
        (col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 100000 + 100)
      .withColumn("ps_supplycost",
        col("ps_supplycost_cents").cast("double") / 100.0)
  }

  /** The DuckDB-side twin of [[partsupp]], for interpolation into oracle
    * SQL as a WITH clause body (bind it as `partsupp AS (...)`). Kept next
    * to the Spark derivation so the two can only drift visibly. */
  val partsuppOracleCte: String =
    """SELECT ps_partkey, ps_suppkey,
              CAST((ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS INT) AS ps_availqty,
              (ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100 AS ps_supplycost_cents,
              CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
       FROM (SELECT p_partkey AS ps_partkey,
                    (p_partkey + ii.i * (sc.s // 4) + (p_partkey // sc.s)) % sc.s AS ps_suppkey
             FROM part
             CROSS JOIN (SELECT count(*) AS s FROM supplier) sc
             CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) ii)"""

  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame     = eventsRaw(spark, sfDir)
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
