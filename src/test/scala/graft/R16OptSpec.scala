package graft

import org.scalatest.funsuite.AnyFunSuite

/** r16 optimization gates for changed ITERATIVE internals (beyond
  * PcaParitySpec's kernel parity): the reworked loops must still reach
  * their exact fixpoints on shapes that exercise the new mechanics —
  * deep diameters (many double-step rounds + visited/union
  * consolidations), odd diameters (the half-step tail), and deep
  * recursion ladders. */
class R16OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** connectedComponents now double-steps min-label propagation per
    * lineage cut. A 41-vertex path (diameter 40, odd vertex count) needs
    * 20 double-rounds to carry label 0 to the far end — exercising both
    * the batched hop and convergence on a half-step boundary; a second
    * 3-cycle component pins that separated components stay separated. */
  test("connectedComponents: exact labels on a deep path + disjoint cycle") {
    import spark.implicits._
    val path = (0L until 40L).map(i => (i, i + 1))
    val cyc = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val labels = llm.Dedup.connectedComponents((path ++ cyc).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 40L).foreach(v => assert(labels(v) === 0L, s"path vertex $v"))
    Seq(100L, 101L, 102L).foreach(v => assert(labels(v) === 100L, s"cycle $v"))
    assert(labels.size === 44)
  }

  /** keyedReach now consolidates the visited union every 8 parts. A
    * 30-vertex directed cycle is one SCC whose pivot BFS walks ~30 hops
    * in each direction — crossing the every-8-parts consolidation
    * boundary several times in a single keyedReach call; a 12-hop path
    * (all singleton SCCs, found by trim+pivot recursion) pins the
    * recursion across one boundary. */
  test("fwbwLabels: exact labels across visited-consolidation boundaries") {
    import spark.implicits._
    val cycle = (0L until 30L).map(i => (i, (i + 1) % 30L))
    val lab2 = operators.Graph
      .fwbwLabels(spark, cycle.toDF("src", "dst"), closureThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach(v => assert(lab2(v) === 0L, s"cycle vertex $v"))
    val path = (0L until 12L).map(i => (i, i + 1))
    val lab1 = operators.Graph
      .fwbwLabels(spark, path.toDF("src", "dst"), closureThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 12L).foreach(v => assert(lab1(v) === v, s"path vertex $v"))
  }
}
