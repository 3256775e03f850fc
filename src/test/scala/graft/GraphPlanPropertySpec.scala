package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exchange-free property gate for the graph family's bucketed layouts.
  *
  * PlanSnapshotSpec upper-bounds TOTAL node counts per registered query,
  * but the graph family's load-bearing scale wins live in plans that
  * gate can't see: the iterative operators localCheckpoint every round,
  * so the per-round "O(E) edge side reads its bucketed layout
  * exchange-free, only the O(V) vector shuffles" property never appears
  * in the final audited plan. This spec rebuilds one representative
  * round frame per pattern and asserts the property STRUCTURALLY — a
  * refactor that drops a bucketed layout (or breaks its bucket-key
  * match with the join) reintroduces a per-round O(E) shuffle and goes
  * red here, not just slower in the bench.
  *
  * AQE is disabled per-frame for the capture (AdaptiveSparkPlanExec
  * hides the static tree behind a leaf wrapper); the property is about
  * the static plan — whether the bucketed scan satisfies the join's
  * distribution requirement — which AQE never changes.
  */
class GraphPlanPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def simpleName(p: SparkPlan): String = p.getClass.getSimpleName

  /** Build `df` with AQE off and a cold cache (the PlanAudit protocol),
    * returning its static executed plan. */
  private def staticPlan(build: => DataFrame): SparkPlan = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      spark.catalog.clearCache()
      build.queryExecution.executedPlan
    } finally spark.conf.set(key, prior)
  }

  /** The children of the DEEPEST join whose subtree reads the layout
    * identified by `token`, split into (layout sides, other sides). */
  private def deepestJoinSides(plan: SparkPlan, token: String)
      : (Seq[SparkPlan], Seq[SparkPlan]) = {
    val joins = plan.collect {
      case j if simpleName(j).contains("Join")
        && j.children.exists(_.toString.contains(token)) => j
    }
    assert(joins.nonEmpty, s"no join over a '$token' scan in:\n$plan")
    val j = joins.last // collect is pre-order: last match is deepest
    j.children.partition(_.toString.contains(token))
  }

  private def shuffles(p: SparkPlan): Int =
    p.collect { case e if simpleName(e).contains("ShuffleExchange") => e }.size

  /** Assert every layout-reading side of the deepest join is a bucketed
    * scan with NO exchange between scan and join. */
  private def assertEdgeSidesExchangeFree(build: => DataFrame, token: String,
      expectedLayoutSides: Int): Unit = {
    val plan = staticPlan(build)
    val (layoutSides, _) = deepestJoinSides(plan, token)
    assert(layoutSides.size == expectedLayoutSides,
      s"expected $expectedLayoutSides '$token' sides, got ${layoutSides.size}:\n$plan")
    layoutSides.foreach { side =>
      assert(shuffles(side) == 0,
        s"O(E) '$token' side shuffles before its join — the bucketed scan " +
          s"no longer satisfies the join's distribution:\n$side")
      assert(side.toString.contains("SelectedBucketsCount"),
        s"'$token' side is not a bucketed scan:\n$side")
    }
  }

  test("HITS auth half-round: edge layout (bucketed by c) joins the score vector exchange-free") {
    assertEdgeSidesExchangeFree(
      {
        val ebc = operators.Graph.bipartite(spark, TestSpark.Sf, "c")
        val h = ebc.select($"c").distinct()
          .withColumn("h", lit(1.0)).localCheckpoint()
        ebc.join(h.hint("shuffle_hash"), "c")
          .groupBy($"p").agg(sum($"h").as("a"))
      },
      token = "graft_hits_bc", expectedLayoutSides = 1)
  }

  test("HITS hub half-round: the OTHER orientation (bucketed by p) is also exchange-free") {
    assertEdgeSidesExchangeFree(
      {
        val ebp = operators.Graph.bipartite(spark, TestSpark.Sf, "p")
        val a = ebp.select($"p").distinct()
          .withColumn("a", lit(1.0)).localCheckpoint()
        ebp.join(a.hint("shuffle_hash"), "p")
          .groupBy($"c").agg(sum($"a").as("h"))
      },
      token = "graft_hits_bp", expectedLayoutSides = 1)
  }

  test("traversal round: adjacency layout joins an O(V) rank vector exchange-free on src") {
    // The pagerank / label-prop / BFS per-round shape.
    assertEdgeSidesExchangeFree(
      {
        val adj = operators.Graph.adjacency(spark, TestSpark.Sf)
        val rank = adj.select($"src".as("v")).distinct()
          .withColumn("r", lit(1.0)).localCheckpoint()
        adj.join(rank.hint("shuffle_hash"), $"src" === $"v")
          .groupBy($"dst").agg(sum($"r" / $"deg").as("contrib"))
      },
      token = "graft_graph_adj", expectedLayoutSides = 1)
  }

  test("wedge join: BOTH adjacency sides meet exchange-free (triangles/jaccard shape)") {
    assertEdgeSidesExchangeFree(
      {
        val adj = operators.Graph.adjacency(spark, TestSpark.Sf)
          .select($"src", $"dst")
        adj.as("a").join(adj.hint("shuffle_hash").as("b"),
            $"a.src" === $"b.src" && $"a.dst" < $"b.dst")
          .select($"a.dst".as("u"), $"b.dst".as("w"))
      },
      token = "graft_graph_adj", expectedLayoutSides = 2)
  }

  test("assortativity: zero joins, one bounded aggregate exchange over the bucketed scan") {
    val plan = staticPlan(
      SparkEntry.queries("graph_assortativity")(spark, TestSpark.Sf))
    val joins = plan.collect { case j if simpleName(j).contains("Join") => j }
    assert(joins.isEmpty,
      s"assortativity regrew a join — both endpoint degrees must stay " +
        s"denormalized on-row:\n$plan")
    assert(shuffles(plan) <= 1,
      s"assortativity must shuffle only the single-row final aggregate:\n$plan")
  }
}
