package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Classifier-evaluation properties not covered by the oracle: the exact
  * pairwise AUC replay, conservation identities across the lift /
  * calibration / confusion tables, and the streaming twin's bit-equality.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The shared (p_e4, y) frame, collected once. */
  private lazy val scored: Array[(Long, Long)] =
    llm.Eval.scored(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("p_e4"), r.getAs[Long]("y")))

  test("llm_clf_auc: matches the brute-force pairwise AUC with half-credit ties") {
    val out = llm.Eval.clfAuc.run(spark, TestSpark.Sf).collect()
    assert(out.length === 1)
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty,
      "fixture must carry both gold classes or the test is vacuous")
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = wins / (pos.length.toDouble * neg.length)
    val r = out.head
    assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    assert(r.getAs[Long]("n_neg") === neg.length.toLong)
    assert(math.abs(r.getAs[Double]("auc") - brute) <= 1e-6,
      s"exact pairwise AUC $brute")
    // sanity: the classifier must rank better than coin-flip on its teacher
    assert(r.getAs[Double]("auc") > 0.5)
  }

  test("llm_clf_lift: balanced deciles, conservation, gains end at 1, lift identity holds") {
    val out = llm.Eval.clfLift.run(spark, TestSpark.Sf)
      .orderBy($"decile").collect()
    assert(out.length === 10)
    val n = scored.length.toLong
    val p = scored.count(_._2 == 1L).toLong
    val sizes = out.map(_.getAs[Long]("n_docs"))
    assert(sizes.sum === n)
    assert(sizes.max - sizes.min <= 1L, "ntile balance")
    assert(out.map(_.getAs[Long]("n_pos")).sum === p)
    assert(math.abs(out.last.getAs[Double]("cum_gain") - 1.0) <= 1e-6)
    out.foreach { r =>
      // lift = pos_rate / overall rate, up to independent rounding
      val expect = r.getAs[Long]("n_pos").toDouble * n /
        (r.getAs[Long]("n_docs").toDouble * p)
      assert(math.abs(r.getAs[Double]("lift") - expect) <= 1e-6)
    }
    // cumulative gain is nondecreasing (positives only accumulate)
    val gains = out.map(_.getAs[Double]("cum_gain"))
    gains.zip(gains.tail).foreach { case (a, b) => assert(b >= a - 1e-12) }
  }

  test("llm_clf_calibration: bin conservation, exact Brier replay, bin boundaries hold") {
    val out = llm.Eval.clfCalibration.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === scored.length.toLong)
    val byBin = scored.groupBy { case (pe4, _) => math.min(pe4 / 1000, 9L) }
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val xs = byBin(bin)
      val brier = xs.map { case (pe4, y) =>
        val d = (pe4 - y * 10000L).toDouble / 1e4; d * d
      }.sum / xs.length
      assert(r.getAs[Long]("n_docs") === xs.length.toLong)
      assert(math.abs(r.getAs[Double]("brier") - brier) <= 1e-6)
      val mp = r.getAs[Double]("mean_pred")
      assert(mp >= bin / 10.0 - 1e-9 &&
        mp <= (if (bin == 9L) 1.0 else (bin + 1) / 10.0) + 1e-9,
        "mean prediction must sit inside its bin")
      assert(math.abs(r.getAs[Double]("gap")
        - (r.getAs[Double]("frac_pos") - mp)) <= 2e-6)
    }
  }

  test("llm_clf_confusion: marginals conserve at every threshold; counts monotone; 0.5 row matches the keep bit") {
    val out = llm.Eval.clfConfusion.run(spark, TestSpark.Sf)
      .orderBy($"threshold").collect()
    assert(out.length === 19)
    val p = scored.count(_._2 == 1L).toLong
    val nn = scored.count(_._2 == 0L).toLong
    out.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === p)
      assert(r.getAs[Long]("fp") + r.getAs[Long]("tn") === nn)
    }
    val tps = out.map(_.getAs[Long]("tp"))
    tps.zip(tps.tail).foreach { case (a, b) =>
      assert(b <= a, "TP must be nonincreasing in the threshold") }
    // the 0.5 operating point is exactly the classifier's keep decision
    val mid = out.find(r => math.abs(r.getAs[Double]("threshold") - 0.5) < 1e-9).get
    val kept = scored.count(_._1 >= 5000L).toLong
    assert(mid.getAs[Long]("tp") + mid.getAs[Long]("fp") === kept)
    // brute replay at 0.5
    assert(mid.getAs[Long]("tp") ===
      scored.count { case (pe4, y) => pe4 >= 5000L && y == 1L }.toLong)
  }

  test("stream_clf_calibration: wave-merged partials reproduce the batch table bit-for-bit") {
    val batch = llm.Eval.clfCalibration.run(spark, TestSpark.Sf).collect()
    val stream = streaming.CorpusStream.streamClfCalibration
      .run(spark, TestSpark.Sf).collect()
    assert(batch.map(_.toString).sorted.toSeq ===
      stream.map(_.toString).sorted.toSeq,
      "batching must not move one reliability bin")
  }
}
