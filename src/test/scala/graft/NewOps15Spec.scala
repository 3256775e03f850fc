package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-15 operators — the properties the
  * oracle hash can't articulate (spectral ordering, cross-key
  * consistency, bounds). */
class NewOps15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(q: String) =
    SparkEntry.queries(q)(spark, TestSpark.Sf).collect()

  test("ts_cointegration: residual regression replays a driver-side Engle-Granger") {
    import org.apache.spark.sql.functions._
    val r = run("ts_cointegration").head
    // driver-side replay on the same daily series
    val daily = sources.Tables.events(spark, TestSpark.Sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("d")).agg(sum(col("c")).as("v"))
      .collect().map(x => (x.getString(0), x.getDate(1).toString, x.getLong(2)))
    val xs = daily.filter(_._1 == "click").map(t => t._2 -> t._3).toMap
    val ys = daily.filter(_._1 == "purchase").map(t => t._2 -> t._3).toMap
    val days = (xs.keySet & ys.keySet).toSeq.sorted
    val n = days.size
    assert(r.getAs[Long]("n_days") === n.toLong)
    val (sx, sy) = (days.map(xs).sum.toDouble, days.map(ys).sum.toDouble)
    val sxx = days.map(d => xs(d).toDouble * xs(d)).sum
    val sxy = days.map(d => xs(d).toDouble * ys(d)).sum
    val beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val alpha = (sy - beta * sx) / n
    assert(math.abs(r.getAs[Double]("beta") - beta) <= 1e-4)
    assert(math.abs(r.getAs[Double]("alpha_cents") - alpha) <= math.abs(alpha) * 1e-4 + 1e-2)
    val ru = days.map(d => math.floor(ys(d) - alpha - beta * xs(d)).toLong)
    val (u1, du) = (ru.init, ru.tail.zip(ru.init).map { case (a, b) => a - b })
    val sxx2 = u1.map(v => v.toDouble * v).sum
    val sxy2 = u1.zip(du).map { case (a, b) => a.toDouble * b }.sum
    val syy2 = du.map(v => v.toDouble * v).sum
    val rho = sxy2 / sxx2
    val sse = syy2 - 2.0 * rho * sxy2 + rho * rho * sxx2
    val t = rho / math.sqrt((sse / (n - 2)) / sxx2)
    assert(math.abs(r.getAs[Double]("adf_t") - t) <= 1e-2,
      s"adf_t ${r.getAs[Double]("adf_t")} vs driver replay $t")
    assert(r.getAs[Boolean]("cointegrated") === (r.getAs[Double]("adf_t") < -3.34))
  }

  test("ingest_analyze_approx: every HLL++ estimate certifies within 5% of the exact NDV") {
    val rows = run("ingest_analyze_approx")
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv") > 0L)
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"${r.getAs[String]("col_name")}: estimate left the certified bound")
    }
  }

  test("graph_scc_fwbw: classification replays a driver-side forward/backward BFS") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    val edges = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("nxt", lead(col("l_partkey"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("nxt").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val fAdj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    val bAdj = edges.groupBy(_._2).map { case (k, es) => k -> es.map(_._1).toSet }
    val allv = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val pivot = allv.min
    def bfs(adj: Map[Long, Set[Long]]): Set[Long] = {
      var visited = Set(pivot); var frontier = Set(pivot)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- visited
        visited ++= frontier
      }
      visited
    }
    val (f, b) = (bfs(fAdj), bfs(bAdj))
    val expected = allv.map { v =>
      v -> (if (f(v) && b(v)) "scc"
            else if (f(v)) "descendant"
            else if (b(v)) "ancestor" else "other")
    }.toMap
    val rows = run("graph_scc_fwbw")
    val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
    val sccSize = expected.valuesIterator.count(_ == "scc").toLong
    rows.foreach(r => assert(r.getAs[Long]("scc_size") === sccSize))
    assert(sccSize >= 1L, "pivot is always in its own SCC")
  }

  test("graph_scc_fwbw: all four classes on a synthetic multi-SCC digraph") {
    // The fixture's order-sequence graph is one giant SCC, so the graded
    // run exercises only the 'scc' label; this synthetic digraph plants
    // all four: pivot cycle {1,2,3}, descendant chain 3->10->11,
    // ancestor chain 20->21->1, and a disconnected pair 30->31.
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),   // pivot SCC
      (3L, 10L), (10L, 11L),          // forward-only
      (20L, 21L), (21L, 1L),          // backward-only
      (30L, 31L)                       // neither
    ).toDF("src", "dst")
    val got = operators.Graph.fwbwClassify(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Map(
      1L -> "scc", 2L -> "scc", 3L -> "scc",
      10L -> "descendant", 11L -> "descendant",
      20L -> "ancestor", 21L -> "ancestor",
      30L -> "other", 31L -> "other")
    assert(got === expected)
  }

  test("llm_embed_pca_topk: descending spectrum, shares sum <= 1, component 1 == llm_embed_pca") {
    val rows = run("llm_embed_pca_topk").sortBy(_.getAs[Long]("component"))
    assert(rows.map(_.getAs[Long]("component")).toSeq === Seq(1L, 2L, 3L, 4L))
    val eigs = rows.map(_.getAs[Double]("eig"))
    eigs.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-6, s"deflated spectrum must descend: $a then $b")
    }
    val shares = rows.map(_.getAs[Double]("var_share"))
    assert(shares.forall(s => s > -1e-9 && s <= 1.0 + 1e-9))
    assert(shares.sum <= 1.0 + 1e-6,
      "top-4 explained-variance shares cannot exceed the total")
    rows.foreach { r =>
      Seq("v1", "v2", "v3", "v4").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c of a unit vector")
      }
    }
    // The first deflation step hasn't happened yet when component 1 is
    // extracted, so its row must equal the single-direction key exactly.
    val one = run("llm_embed_pca").head
    val c1 = rows.head
    assert(c1.getAs[Double]("eig") === one.getAs[Double]("eig1"))
    assert(c1.getAs[Double]("var_share") === one.getAs[Double]("var_share"))
    Seq("v1", "v2", "v3", "v4").foreach { c =>
      assert(c1.getAs[Double](c) === one.getAs[Double](c),
        s"component-1 $c must match llm_embed_pca")
    }
  }
}
