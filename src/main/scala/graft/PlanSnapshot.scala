package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan structure metrics for regression snapshots.
  *
  * Counts the node kinds whose appearance (or multiplication) in a plan is
  * a scale regression: shuffles, broadcasts, nested-loop joins, sort-based
  * aggregation, cartesian products. Counting is over the plan's string form
  * — the same surface PlanAuditSpec gates — so a snapshot diff points at
  * the exact node kind that crept in.
  */
object PlanMetrics {

  /** Ordered metric names; each maps to a substring/regex over the plan. */
  val Names: Seq[String] =
    Seq("shuffle", "broadcast", "bnlj", "sortagg", "cartesian", "smj")

  private val shuffleRe = "Exchange (hash|range|Single)".r

  /** Metrics for a query: its `auditPlans` frames summed when registered
    * (the un-memoized pipeline forms — ADVICE r15: a SessionMemo scan
    * would otherwise snapshot as shuffle=0 and hide regressions), else
    * `run`'s plan. */
  def ofQuery(q: GraftQuery, s: SparkSession, dir: String): Map[String, Int] =
    q.auditPlans match {
      case Some(build) =>
        build(s, dir).map(of).reduce((a, b) => a.map { case (k, v) => k -> (v + b(k)) })
      case None => of(q.run(s, dir))
    }

  def of(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString
    Map(
      "shuffle" -> shuffleRe.findAllIn(plan).length,
      "broadcast" -> "BroadcastExchange".r.findAllIn(plan).length,
      "bnlj" -> "BroadcastNestedLoopJoin".r.findAllIn(plan).length,
      "sortagg" -> "SortAggregate".r.findAllIn(plan).length,
      "cartesian" -> "CartesianProduct".r.findAllIn(plan).length,
      "smj" -> "SortMergeJoin".r.findAllIn(plan).length
    )
  }

  def line(name: String, m: Map[String, Int]): String =
    name + " " + Names.map(k => s"$k=${m(k)}").mkString(" ")

  def parse(line: String): (String, Map[String, Int]) = {
    val parts = line.trim.split("\\s+")
    (parts.head,
      parts.tail.map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v.toInt
      }.toMap)
  }
}

/** Regenerates the committed plan snapshot (`plans/PLAN_SNAPSHOT.txt`).
  * PlanSnapshotSpec fails when any query's current plan carries MORE of a
  * gated node kind than the snapshot records — run this main (and review
  * the diff!) to bless an intentional plan change.
  * Usage: run_class.sh graft.PlanSnapshot [sfDir] [outFile]
  *
  * Capture protocol — COLD CACHE, always: `spark.catalog.clearCache()` runs
  * before every query's plan is built, here and in PlanSnapshotSpec /
  * PlanAuditSpec. Spark's CacheManager substitutes ANY registered matching
  * subtree (materialized or not) with an InMemoryRelation at planning time,
  * so a plan captured after other queries cached shared subtrees (shingle
  * tables, bench grams) carries fewer visible exchanges than the same query
  * planned cold — the round-4 snapshot only reproduced in full-suite order.
  * Clearing first means the captured metrics are a pure function of the
  * query itself: deterministic in isolation, under reordering, and here.
  */
object PlanSnapshot {
  val DefaultPath = "plans/PLAN_SNAPSHOT.txt"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(DefaultPath)
    // Mirror TestSpark's session config so spec-time plans are comparable.
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = SparkEntry.registry.map { q =>
      spark.catalog.clearCache() // cold-cache protocol — see scaladoc above
      PlanMetrics.line(q.name, PlanMetrics.ofQuery(q, spark, sfDir))
    }
    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} plan metric lines to $out")
    spark.stop()
  }
}
