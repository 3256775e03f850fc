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
