package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** r16 optimization gate: the PCA family's native kernels must agree
  * BIT-FOR-BIT with the r15 declarative forms they replaced.
  *
  *  - covariance: PcaQuantGram + LongVecSum single-scan fold vs the r15
  *    posexplode²-self-join Gram pass (`pcaCovFrameJoinForm`) — exact
  *    BIGINT sums are association-free, so every cm cell and n_vecs must
  *    be identical doubles;
  *  - iterations: PcaPowerDeflate vs the r15 HOF fold tower
  *    (`pcaDeflateFoldForm`) — same IEEE op sequence, so every lam / sgn
  *    / v element must be identical doubles (not approximately: ==). */
class PcaParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pcaCovFrame (single-scan fold) == r15 join form, bit-exact") {
    import spark.implicits._
    val fast = llm.Similarity.pcaCovFrame(spark, TestSpark.Sf).head()
    val slow = llm.Similarity.pcaCovFrameJoinForm(spark, TestSpark.Sf).head()
    assert(fast.getAs[Long]("n_vecs") === slow.getAs[Long]("n_vecs"))
    val fc = fast.getSeq[Double](fast.fieldIndex("cm"))
    val sc = slow.getSeq[Double](slow.fieldIndex("cm"))
    assert(fc.length === sc.length)
    fc.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(fc(i)) ===
        java.lang.Double.doubleToRawLongBits(sc(i)),
        s"cm[$i]: ${fc(i)} vs ${sc(i)}")
    }
  }

  test("PcaPowerDeflate == r15 HOF fold tower, 4 components, bit-exact") {
    import spark.implicits._
    val cov = llm.Similarity.pcaCovFrame(spark, TestSpark.Sf)
    val K = 4
    val native = cov
      .select(posexplode(
        VectorFunctions.pcaPowerDeflate(spark, $"cm",
          llm.Similarity.PcaIters, K)).as(Seq("pos", "r")))
      .select($"pos", $"r.lam", $"r.sgn", $"r.v")
      .collect().sortBy(_.getInt(0))
    val fold = llm.Similarity.pcaDeflateFoldForm(cov, K).head()
    (1 to K).foreach { c =>
      val n = native(c - 1)
      def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
      assert(bits(n.getDouble(1)) === bits(fold.getAs[Double](s"lam$c")),
        s"lam$c: ${n.getDouble(1)} vs ${fold.getAs[Double](s"lam$c")}")
      assert(bits(n.getDouble(2)) === bits(fold.getAs[Double](s"sgn$c")),
        s"sgn$c")
      val nv = n.getSeq[Double](3)
      val fv = fold.getSeq[Double](fold.fieldIndex(s"v$c"))
      assert(nv.length === fv.length)
      nv.indices.foreach { i =>
        assert(bits(nv(i)) === bits(fv(i)), s"v$c[$i]: ${nv(i)} vs ${fv(i)}")
      }
    }
  }
}
