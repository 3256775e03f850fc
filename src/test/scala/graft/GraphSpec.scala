package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the graph-analytics family beyond the DuckDB oracle:
  * invariants (probability conservation, selection guarantees) and a
  * brute-force recomputation of the derived graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force edge set (src < dst, co-order support >= 2) recomputed
    * driver-side. */
  private def bruteEdges: Set[(Long, Long)] = {
    val lp = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // NOTE the .iterator before collect: `Map.collect` producing tuple
    // elements rebuilds a MAP (keyed by the pair's first element), which
    // silently collapsed the 2324 support-2 edges to 188 distinct low
    // endpoints in the first two formulations of this reference.
    val m = scala.collection.mutable.Map[(Long, Long), Int]()
    lp.groupBy(_._1).valuesIterator.foreach { lines =>
      val ps = lines.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) m((a, b)) = m.getOrElse((a, b), 0) + 1
    }
    m.iterator.collect { case (e, c) if c >= 2 => e }.toSet
  }

  test("pagerank: ranks stay a probability distribution (sum ≈ 1)") {
    val ranks = operators.Graph.pagerank.run(spark, TestSpark.Sf).collect()
    assert(ranks.nonEmpty)
    val total = ranks.map(_.getDouble(1)).sum
    // Rounding each of n ranks at 1e-4 bounds the drift by n/2 * 1e-4.
    assert(math.abs(total - 1.0) <= ranks.length * 5e-5 + 1e-6,
      s"rank mass $total drifted from 1.0 over ${ranks.length} vertices")
  }

  test("pagerank: every vertex of the derived graph is ranked, uniquely") {
    val ranks = operators.Graph.pagerank.run(spark, TestSpark.Sf).collect()
    val ranked = ranks.map(_.getLong(0))
    val vertices = bruteEdges.flatMap(e => Seq(e._1, e._2))
    assert(ranked.length == ranked.distinct.length)
    assert(ranked.toSet == vertices)
  }

  test("triangles: count matches a brute-force enumeration") {
    val row = operators.Graph.triangles.run(spark, TestSpark.Sf).collect().head
    val e = bruteEdges
    val byLow = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val brute = e.iterator.map { case (a, b) =>
      byLow.getOrElse(b, Set.empty).count(c => e.contains((a, c)))
    }.sum
    assert(row.getLong(0) == brute.toLong, "triangle count mismatch")
    assert(row.getLong(1) == e.size.toLong, "edge count mismatch")
    assert(row.getLong(2) == e.flatMap(p => Seq(p._1, p._2)).size.toLong,
      "vertex count mismatch")
  }

  test("degree distribution: masses to 2·|E| over |V| vertices") {
    val dist = operators.Graph.degreeDist.run(spark, TestSpark.Sf).collect()
    val e = bruteEdges
    val nVertices = dist.map(_.getLong(1)).sum
    val degMass = dist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(nVertices == e.flatMap(p => Seq(p._1, p._2)).size.toLong)
    assert(degMass == 2L * e.size) // each undirected edge contributes 2 degree
  }
}
