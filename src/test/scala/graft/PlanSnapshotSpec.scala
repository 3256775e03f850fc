package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression gate: every registered query's physical plan must not
  * carry MORE shuffles / broadcasts / nested-loop joins / sort aggregates /
  * cartesian products than the committed snapshot records. Catches the
  * silent plan regressions (an extra Exchange from a lost partitioning, a
  * join that fell off its broadcast) that row-level correctness can't see.
  *
  * Fewer nodes than the snapshot is allowed (improvements don't fail the
  * build) — regenerate via `tools/run_class.sh graft.PlanSnapshot` to
  * tighten the baseline, and review the diff before committing it.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val snapshot: Map[String, Map[String, Int]] = {
    val src = scala.io.Source.fromFile(PlanSnapshot.DefaultPath)
    try src.getLines().filter(_.trim.nonEmpty).map(PlanMetrics.parse).toMap
    finally src.close()
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name}: plan structure within snapshot bounds") {
      val recorded = snapshot.getOrElse(q.name,
        fail(s"${q.name} missing from ${PlanSnapshot.DefaultPath} — " +
          "regenerate with: tools/run_class.sh graft.PlanSnapshot"))
      // Cold-cache capture protocol (see PlanSnapshot's scaladoc): without
      // this, subtrees cached by earlier suites collapse into
      // InMemoryRelations and the metrics depend on suite order — the gate
      // then only passes in full-suite order (round-4 verdict finding #3).
      spark.catalog.clearCache()
      // Memoized queries audit their registered un-memoized build forms
      // (GraftQuery.auditPlans, ADVICE r15), not the checkpoint scan.
      val current = PlanMetrics.ofQuery(q, spark, TestSpark.Sf)
      for (metric <- PlanMetrics.Names) {
        assert(current(metric) <= recorded(metric),
          s"${q.name}: $metric grew ${recorded(metric)} -> ${current(metric)} " +
            "(plan regression; if intentional, regenerate the snapshot and " +
            "review the diff)")
      }
    }
  }
}
