package graft

import org.scalatest.funsuite.AnyFunSuite

/** llm_bpe_train has no SQL oracle (K chained argmax-dependent rewrites);
  * this spec IS its correctness gate: an independent driver-side reference
  * implementation of BPE merge learning, compared exactly. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference BPE: greedy scan-and-skip merge application (the textbook
    * definition, deliberately NOT the engine's fold formulation). */
  private def referenceMerges(wordFreq: Map[String, Long],
                              k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => w.split("").filter(_.nonEmpty).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (t <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      out += ((t, a, b, cnt))
      vocab = vocab.map { case (syms, f) =>
        val res = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            res += a + b; i += 2
          } else { res += syms(i); i += 1 }
        }
        res.toVector -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.toSeq
  }

  test("bpe train: learned merges match the scan-and-skip reference exactly") {
    val wordFreq = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expected = referenceMerges(wordFreq, 8)
    val got = llm.TextStats.bpeTrain.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"learned merges diverge from the reference\n got: $got\n exp: $expected")
  }

  test("bpe apply: per-doc piece counts match the reference tokenizer exactly") {
    val wordFreq = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val merges = referenceMerges(wordFreq, 8).map(m => (m._2, m._3))
    // reference scan-and-skip tokenizer: apply each merge in rank order
    def tokenize(word: String): Int = {
      var syms: Vector[String] = word.split("").filter(_.nonEmpty).toVector
      merges.foreach { case (a, b) =>
        val res = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            res += a + b; i += 2
          } else { res += syms(i); i += 1 }
        }
        syms = res.toVector
      }
      syms.length
    }
    val expected = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ")
        r.getLong(0) -> ((ws.length.toLong, ws.map(tokenize(_).toLong).sum))
      }.toMap
    val got = llm.TextStats.bpeApply.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, "engine piece counts diverge from the reference tokenizer")
    // merges must actually compress: total pieces < total characters
    val totalChars = wordFreq.map { case (w, f) => w.length * f }.sum
    val totalPieces = expected.values.map(_._2).sum
    assert(totalPieces > 0 && totalPieces < totalChars,
      s"learned merges never compressed ($totalPieces pieces / $totalChars chars)")
  }

  test("bpe train: merges are usable — applying them shrinks symbol counts") {
    val merges = llm.TextStats.bpeTrain.run(spark, TestSpark.Sf).collect()
    assert(merges.length == 8)
    // ranks are 1..8 in order and frequencies are positive
    assert(merges.map(_.getInt(0)).toSeq == (1 to 8))
    assert(merges.forall(_.getLong(3) > 0))
    // each merge's pair frequency is non-increasing is NOT guaranteed by
    // BPE (later merges can beat earlier residual counts), but every
    // learned rule must concatenate two non-empty symbols
    assert(merges.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }
}
