package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-15 operators — the properties the
  * oracle hash can't articulate (spectral ordering, cross-key
  * consistency, bounds). */
class NewOps15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(q: String) =
    SparkEntry.queries(q)(spark, TestSpark.Sf).collect()

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
