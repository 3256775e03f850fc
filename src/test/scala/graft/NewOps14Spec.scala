package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-14 operators — each asserts the
  * mathematical properties the oracle hash can't articulate (bounds,
  * conservation, monotonicity, zero-copy equality). */
class NewOps14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(q: String) =
    SparkEntry.queries(q)(spark, TestSpark.Sf).collect()

  test("agg_raking: three IPF rounds calibrate the priority margins; weights conserve mass") {
    val rows = run("agg_raking")
    assert(rows.length === 25, "5 bands x 5 priorities")
    val ntot = rows.map(_.getAs[Long]("n")).sum.toDouble
    val target = ntot / 5.0
    // the LAST scaling step was by priority, so priority margins are
    // exact (up to fp) at the target; band margins are near-target
    rows.groupBy(_.getAs[String]("prio")).foreach { case (p, g) =>
      val m = g.map(_.getAs[Double]("w")).sum
      assert(math.abs(m - target) < 1e-4, s"prio $p margin $m vs $target")
    }
    rows.groupBy(_.getAs[Long]("band")).foreach { case (b, g) =>
      val m = g.map(_.getAs[Double]("w")).sum
      assert(math.abs(m - target) / target < 0.05,
        s"band $b margin $m should be within 5% of $target after 3 rounds")
    }
    rows.foreach(r => assert(r.getAs[Double]("factor") > 0.0))
  }

  test("agg_mutual_info: MI and NMI sit in their information-theoretic bands") {
    val r = run("agg_mutual_info").head
    val mi = r.getAs[Double]("mi"); val nmi = r.getAs[Double]("nmi")
    assert(mi >= 0.0, "MI is nonnegative")
    assert(nmi >= 0.0 && nmi <= 1.0, "NMI normalizes into [0, 1]")
    assert(r.getAs[Long]("n_total") > 0L)
  }

  test("agg_msprt: cumulative counts are monotone and reject tracks the threshold") {
    val rows = run("agg_msprt")
    assert(rows.nonEmpty)
    val lnInvAlpha = math.log(20.0)
    var (pc, pt) = (0L, 0L)
    rows.foreach { r =>
      val nc = r.getAs[Long]("nc"); val nt = r.getAs[Long]("nt")
      assert(nc >= pc && nt >= pt, "per-arm cumulative counts are monotone")
      pc = nc; pt = nt
      val ll = Option(r.getAs[java.lang.Double]("log_lambda")).map(_.toDouble)
      val rej = r.getAs[Long]("reject")
      ll match {
        case Some(v) => assert((rej == 1L) === (v >= lnInvAlpha - 1e-9),
          s"reject flag must track log_lambda >= ln(1/alpha): $v vs $rej")
        case None => assert(rej === 0L)
      }
    }
  }

  test("agg_meta_analysis: pooled mean convex in stratum means; Q >= 0; I2 in [0, 100]") {
    import org.apache.spark.sql.functions._
    val r = run("agg_meta_analysis").head
    assert(r.getAs[Long]("k") === 5L)
    val means = sources.Tables.orders(spark, TestSpark.Sf)
      .groupBy(col("o_orderpriority"))
      .agg(avg(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"))
        .as("m"))
      .collect().map(_.getAs[Double]("m"))
    val pooled = r.getAs[Double]("pooled_mean")
    assert(pooled >= means.min - 1e-6 && pooled <= means.max + 1e-6,
      "inverse-variance pooling is a convex combination of stratum means")
    assert(r.getAs[Double]("pooled_se") > 0.0)
    assert(r.getAs[Double]("q") >= 0.0)
    val i2 = r.getAs[Double]("i2_pct")
    assert(i2 >= 0.0 && i2 <= 100.0)
  }

  test("ts_adf: one row per event type; flag tracks the critical value") {
    val rows = run("ts_adf")
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") >= 20L, "30-day fixture leaves >= 28 obs")
      val t = r.getAs[Double]("adf_t")
      assert((r.getAs[Long]("stationary") == 1L) === (t < -2.89))
    }
  }

  test("ts_hurst: R/S positive, block counts match the 30-day domain") {
    val rows = run("ts_hurst")
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("nblk_5") === 6L)
      assert(r.getAs[Long]("nblk_10") === 3L)
      assert(r.getAs[Double]("rs_5") > 0.0)
      assert(r.getAs[Double]("rs_10") > 0.0)
      assert(!r.getAs[Double]("hurst").isNaN)
    }
  }

  test("graph_scc: a partition of the vertex set; labels are component minima") {
    val rows = run("graph_scc")
    val nations = rows.map(_.getAs[Long]("nation"))
    assert(nations.distinct.length === nations.length, "each vertex labeled once")
    rows.foreach { r =>
      assert(r.getAs[Long]("scc_id") <= r.getAs[Long]("nation"),
        "label is the component min")
      assert((r.getAs[Boolean]("in_bloc")) === (r.getAs[Long]("scc_size") > 1L))
    }
    val sizes = rows.groupBy(_.getAs[Long]("scc_id"))
    sizes.foreach { case (id, g) =>
      assert(g.map(_.getAs[Long]("scc_size")).distinct.length === 1)
      assert(g.head.getAs[Long]("scc_size") === g.length.toLong,
        s"scc $id declared size matches member count")
      assert(g.map(_.getAs[Long]("nation")).min === id,
        s"scc $id label equals its min member")
    }
  }

  test("llm_dedup_soft: effective mass never exceeds raw mass; ratios in (0, 1]") {
    val rows = run("llm_dedup_soft")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("chars_effective")
        <= r.getAs[Long]("chars_total").toDouble + 1e-6)
      val ratio = r.getAs[Double]("soft_ratio")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9)
    }
  }

  test("llm_embed_outliers: outliers bounded by population; distances nonnegative") {
    val rows = run("llm_embed_outliers")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Double]("mean_d2") >= 0.0)
    }
  }

  test("llm_embed_pca: unit eigenvector head, positive leading eigenvalue, share in (0, 1]") {
    val r = run("llm_embed_pca").head
    assert(r.getAs[Long]("n_vecs") > 0L)
    assert(r.getAs[Double]("eig1") > 0.0)
    val share = r.getAs[Double]("var_share")
    assert(share > 0.0 && share <= 1.0 + 1e-9)
    Seq("v1", "v2", "v3", "v4").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c component of a unit vector")
    }
  }

  test("ingest_clone: fresh clone bit-equal to source head; divergence drops exactly one group") {
    val rows = run("ingest_clone").map(r =>
      r.getAs[String]("snapshot") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("sum_cents"))).toMap
    assert(rows("2_clone_v1") === rows("1_src_head"), "zero-copy proof")
    assert(rows("3_clone_v2_drop_g3")._1 < rows("1_src_head")._1,
      "the metadata DROP PARTITION removed rows from the clone only")
  }

  test("ingest_restore: v3 head equals v1 exactly; v2 stays in history") {
    val rows = run("ingest_restore").map(r =>
      r.getAs[Long]("version") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("sum_cents"))).toMap
    assert(rows(3) === rows(1), "restore commits the old manifest as the new head")
    assert(rows(2)._1 >= rows(1)._1, "v2 carries the correction cohort")
  }
}
