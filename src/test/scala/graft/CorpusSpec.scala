package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-curation operators beyond what the DuckDB
  * oracle grades: cross-checks against independent Scala recomputation. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsById: Map[Long, String] =
    sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def grams(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  test("contamination: reported docs are corpus-side and truly share an 8-gram") {
    val out = llm.Corpus.contamination.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val all = docsById
    val benchGrams = all.collect { case (id, t) if id % 10 == 2 => grams(t, 8) }
      .foldLeft(Set.empty[String])(_ ++ _)
    out.foreach { r =>
      val (id, nShared) = (r.getLong(0), r.getLong(1))
      assert(id % 10 != 2, s"doc $id is benchmark-side")
      val shared = grams(all(id), 8).intersect(benchGrams)
      assert(shared.size.toLong == nShared,
        s"doc $id: reported $nShared shared grams, recomputed ${shared.size}")
    }
  }

  test("contamination finds every corpus doc sharing a benchmark 8-gram") {
    val all = docsById
    val benchGrams = all.collect { case (id, t) if id % 10 == 2 => grams(t, 8) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = all.collect {
      case (id, t) if id % 10 != 2 && grams(t, 8).intersect(benchGrams).nonEmpty => id
    }.toSet
    val got = llm.Corpus.contamination.run(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("repetition: metrics match Scala recomputation, flag is consistent") {
    val out = llm.Corpus.repetition.run(spark, TestSpark.Sf).collect()
    val all = docsById
    assert(out.length === all.size)
    assert(out.exists(_.getAs[Boolean]("repetitive")) &&
           out.exists(!_.getAs[Boolean]("repetitive")),
      "thresholds should split the corpus non-trivially")
    out.take(50).foreach { r =>
      val toks = all(r.getLong(0)).split(" ").toSeq
      val n = toks.size
      val distinct = toks.distinct.size
      val topTok = toks.groupBy(identity).values.map(_.size).max
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val topBg = bigrams.groupBy(identity).values.map(_.size).max
      assert(r.getAs[Long]("n_tokens") == n.toLong)
      assert(math.abs(r.getAs[Double]("distinct_ratio") - distinct.toDouble / n) < 1e-4)
      assert(math.abs(r.getAs[Double]("top_token_ratio") - topTok.toDouble / n) < 1e-4)
      assert(math.abs(r.getAs[Double]("top_bigram_ratio") - topBg.toDouble / bigrams.size) < 1e-4)
      val flag = topTok.toDouble / n >= 0.15 || distinct.toDouble / n <= 0.35 ||
        topBg.toDouble / bigrams.size >= 0.10
      assert(r.getAs[Boolean]("repetitive") == flag, s"doc ${r.getLong(0)} flag")
    }
  }

  test("substring dedup: coverage matches Scala recomputation") {
    val out = llm.Corpus.substringDup.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val all = docsById
    // Recompute: grams occurring in >1 doc, per-doc occurrence + coverage.
    val byGram = all.toSeq.flatMap { case (id, t) =>
      t.split(" ").sliding(8).filter(_.length > 0).zipWithIndex
        .map { case (g, i) => (g.mkString(" "), id, i) }
    }
    val dupGrams = byGram.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val occ = byGram.filter(o => dupGrams(o._1))
    val expected = occ.groupBy(_._2).map { case (id, os) =>
      val n = all(id).split(" ").length
      val covered = os.flatMap(o => o._3 until math.min(o._3 + 8, n)).distinct.size
      id -> (os.size.toLong, covered.toLong)
    }
    assert(out.map(_.getLong(0)).toSet === expected.keySet)
    out.foreach { r =>
      val (nd, cov) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_dup_grams") == nd, s"doc ${r.getLong(0)} n_dup_grams")
      assert(r.getAs[Long]("covered") == cov, s"doc ${r.getLong(0)} covered")
      assert(math.abs(r.getAs[Double]("dup_coverage") -
        cov.toDouble / r.getAs[Long]("n_toks")) < 1e-4)
    }
  }

  test("pack_chunks: token runs are contiguous per bucket, offsets in range") {
    // The packing contract: within a bucket, doc i+1's start offset is
    // doc i's start + length (no gaps, no overlaps across the whole
    // concatenation), offsets stay inside the context window, and
    // sequence ids advance monotonically. Pins the semantics (not just
    // the hash) against window-frame refactors.
    val rows = llm.TextStats.packChunks.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, b) =>
      val inOrder = b.sortBy(_._2)
      val starts = inOrder.scanLeft(0L) { case (cum, (_, _, _, _, nTok)) => cum + nTok }
      inOrder.zip(starts).foreach { case ((_, id, seqId, off, _), expectedStart) =>
        assert(seqId === expectedStart / 2048, s"doc $id seq_id")
        assert(off === expectedStart % 2048, s"doc $id offset")
        assert(off >= 0 && off < 2048)
      }
      val seqIds = inOrder.map(_._3)
      assert(seqIds.zip(seqIds.tail).forall { case (a, c) => a <= c })
    }
  }

  test("stratified sample: deterministic, uniform within stratum, rates honored") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = llm.TextStats.sampleStratified.run(spark, TestSpark.Sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val keptAgain = llm.TextStats.sampleStratified.run(spark, TestSpark.Sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === keptAgain, "hash-threshold sample must be reproducible")
    val (en, rest) = docs.partition(_._2 == "en")
    assert(rest.forall(d => kept(d._1)), "non-en strata keep rate is 1.0")
    val enRate = en.count(d => kept(d._1)).toDouble / en.length
    info(f"en keep rate: $enRate%.2f of ${en.length} docs (target 0.25)")
    // binomial around 0.25; generous two-sided bound at fixture size
    assert(enRate > 0.05 && enRate < 0.5, s"en rate $enRate far from 0.25")
  }

  test("tfidf: 3 ranked terms per doc, scores descending, match recomputation") {
    val out = llm.Corpus.tfidf.run(spark, TestSpark.Sf).collect()
    val all = docsById
    assert(out.length === all.size * 3)
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // Independent recomputation for one doc.
    val nDocs = all.size
    val dfMap = all.values.flatMap(_.split(" ").distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val (sampleId, sampleText) = all.minBy(_._1)
    val toks = sampleText.split(" ").toSeq
    val expected = toks.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toDouble / toks.size * math.log(nDocs.toDouble / dfMap(t))
    }.toSeq
      .sortBy { case (t, s) => (-BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP), t) }
      .take(3)
    val got = byDoc(sampleId).sortBy(_.getInt(1)).map(r => (r.getString(2), r.getDouble(3)))
    expected.zip(got).foreach { case ((et, es), (gt, gs)) =>
      assert(et == gt, s"doc $sampleId term order")
      assert(math.abs(es - gs) < 1e-3, s"doc $sampleId score for $et")
    }
  }

  test("perplexity: in-domain docs score fluent; reference slice has no unseen bigrams") {
    // The filter's operating premise: text drawn from the LM's own domain
    // must score lower NLL than the corpus at large, and every bigram of a
    // reference-slice doc is by construction in the LM (n_unseen = 0).
    val out = llm.Corpus.perplexity.run(spark, TestSpark.Sf).collect()
    assert(out.length > 0)
    val srcOf = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (ref, rest) = out.partition(r => srcOf(r.getLong(0)) == llm.Corpus.PplRefSource)
    assert(ref.nonEmpty && rest.nonEmpty)
    assert(ref.forall(_.getAs[Long]("n_unseen") == 0L),
      "reference-slice docs must have every bigram in the LM")
    val avgRef = ref.map(_.getAs[Double]("nll")).sum / ref.length
    val avgRest = rest.map(_.getAs[Double]("nll")).sum / rest.length
    assert(avgRef < avgRest,
      f"in-domain avg NLL $avgRef%.3f must beat out-of-domain $avgRest%.3f")
    // Out-of-domain docs DO carry unseen bigrams — otherwise the fixture
    // couldn't distinguish the smoothing path from the seen path.
    assert(rest.exists(_.getAs[Long]("n_unseen") > 0L))
  }

  test("paragraph dedup: reassembly matches Scala recomputation; boilerplate drops") {
    val all = docsById
    def chunksOf(text: String): Seq[String] =
      text.split(" ").grouped(llm.Corpus.ParaW).map(_.mkString(" ")).toSeq
    val docCount = all.toSeq
      .flatMap { case (id, t) => chunksOf(t).map(c => (c, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val boiler = docCount.collect { case (c, n) if n >= 2 => c }.toSet
    val out = llm.Corpus.paragraphDedup.run(spark, TestSpark.Sf).collect()
    assert(out.length === all.size)
    var totalDropped = 0L
    out.foreach { r =>
      val (id, nChunks, nDropped, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val cs = chunksOf(all(id))
      assert(nChunks === cs.length.toLong, s"doc $id n_chunks")
      assert(nDropped === cs.count(boiler).toLong, s"doc $id n_dropped")
      assert(clean === cs.filterNot(boiler).mkString(" "), s"doc $id clean_text")
      totalDropped += nDropped
    }
    assert(totalDropped > 0, "fixture must exercise the removal path")
  }

  test("docBigrams: 1-token and empty docs emit no bigram rows (oracle parity)") {
    // Unguarded sequence(1, size-1) DESCENDS for size<2 ([1,0]) and would
    // emit two null-token rows per 1-token doc — rows the DuckDB oracle
    // (range(1, len) = empty) never produces. Latent in the fixture (no
    // 1-token docs); pin the guard directly.
    val docs = Seq(
      (1L, "ref", "single"),
      (2L, "ref", ""),
      (3L, "web", "two tokens here")
    ).toDF("doc_id", "source", "text")
    val bg = llm.Corpus.docBigrams(spark, docs).collect()
    assert(bg.forall(_.getLong(0) == 3L),
      s"only the multi-token doc may emit bigrams, got: ${bg.mkString(", ")}")
    assert(bg.length == 2)
    assert(bg.forall(r => r.getString(2) != null && r.getString(3) != null))
  }

  test("fuzzy vocab: symmetric-delete join is lossless at edit distance 1") {
    // The scaladoc claims the deletion-neighborhood equi-join has recall
    // 1.0 at distance <= 1 — prove it against brute-force Levenshtein over
    // the same constructed token set (vocab + first-char-doubled typos).
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = docsById.values.flatMap(_.split(" ")).toSet.filter(_.length >= 3)
    val toks = (vocab ++ vocab.map(t => t.take(1) + t)).toSeq
    val truth = (for {
      a <- toks; b <- toks if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    val out = llm.TextStats.vocabFuzzy.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(truth.nonEmpty, "constructed typos must create distance-1 pairs")
    assert(out === truth,
      "deletion-neighborhood candidates + exact verify must equal brute force")
  }

  test("sliding chunks tile every document: stride spacing, full coverage, bounded length") {
    val byDoc = llm.TextStats.chunkSliding.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("len_tok")))
      .groupBy(_._1)
    val nToks = docsById.map { case (id, t) => id -> t.split(" ", -1).length.toLong }
    assert(byDoc.keySet === nToks.keySet, "every doc must produce chunks")
    for ((doc, rows) <- byDoc) {
      val sorted = rows.sortBy(_._2)
      val n = nToks(doc)
      assert(sorted.head._3 === 0L, s"doc $doc: first chunk must start at 0")
      assert(sorted.last._3 + sorted.last._4 === n,
        s"doc $doc: last chunk must end at n_tok")
      assert(sorted.forall(c => c._4 >= 1 && c._4 <= 32),
        s"doc $doc: chunk length out of [1, 32]")
      assert(sorted.sliding(2).filter(_.length == 2).forall(p =>
        p(1)._3 - p(0)._3 == 24L), s"doc $doc: starts must advance by the stride")
      // every token position is covered by some chunk
      assert(sorted.forall(c => c._3 < n), s"doc $doc: chunk starts past the end")
      val covered = sorted.map(c => (c._3, c._3 + c._4))
        .foldLeft(0L) { case (hi, (lo, chunkHi)) =>
          assert(lo <= hi, s"doc $doc: coverage gap before $lo"); math.max(hi, chunkHi) }
      assert(covered === n, s"doc $doc: chunks must cover all $n tokens")
    }
    // multi-chunk docs exist, so overlap semantics are actually exercised
    assert(byDoc.values.exists(_.length >= 2), "fixture must produce overlapping chunks")
  }

  test("bm25: hand-recomputed score for the top document") {
    val out = llm.Corpus.bm25.run(spark, TestSpark.Sf).collect()
    assert(out.length > 0 && out.length <= 20)
    val terms = Set("spark", "join", "vector", "stream")
    val toks = docsById.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    val df = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = {
      val dl = toks(id).length.toDouble
      terms.toSeq.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val top = out.head
    assert(math.abs(top.getAs[Double]("score") - score(top.getAs[Long]("doc_id"))) < 1e-3,
      "top score must match the BM25 formula recomputed in Scala")
    // scores are descending with the doc_id tiebreak
    val scores = out.map(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id"))).toSeq
    assert(scores === scores.sorted, "ranking must be (score desc, doc_id)")
  }

  test("weighted sample: deterministic across runs and biased toward heavy docs") {
    val a = llm.TextStats.sampleWeighted.run(spark, TestSpark.Sf).collect()
    val b = llm.TextStats.sampleWeighted.run(spark, TestSpark.Sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "the hash-derived sample must be bit-reproducible")
    assert(a.length === 100)
    // priority ∝ weight/uniform ⇒ long docs overrepresented: the sample's
    // mean n_chars must exceed the corpus mean (deterministic given the fixture)
    val sampleMean = a.map(_.getAs[Long]("n_chars")).sum.toDouble / a.length
    val corpusMean = sources.Tables.documents(spark, TestSpark.Sf)
      .agg(org.apache.spark.sql.functions.avg($"n_chars")).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sampling must prefer long docs (sample $sampleMean vs corpus $corpusMean)")
  }

  test("winnow: selection equals the window-enumeration reference, with coverage") {
    // Reference = the textbook definition: enumerate every full window of
    // w=4 grams (the whole list when shorter) and take each window's
    // RIGHTMOST minimum. The engine computes the same set via run
    // counting without enumerating windows — this proves the equivalence.
    val w = 4
    val out = llm.TextStats.winnow.run(spark, TestSpark.Sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getInt(1)).toSet }
    def gramHashes(text: String): Array[Long] = {
      val h = text.split(" ").map(t => t.head.toLong * 31L + t.length)
      h.sliding(3).filter(_.length == 3)
        .map(_.foldLeft(0L)((a, b) => (a * 131 + b) % 1000000007L)).toArray
    }
    def rightmostMin(g: Array[Long], lo: Int, hi: Int): Int = // 1-based incl
      (lo to hi).maxBy(j => (-g(j - 1), j)) // min value, then max pos
    val docs = docsById.filter(_._2.split(" ").length >= 3)
    assert(out.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val g = gramHashes(text)
      val n = g.length
      val expected =
        if (n < w) Set(rightmostMin(g, 1, n))
        else (1 to n - w + 1).map(q => rightmostMin(g, q, q + w - 1)).toSet
      assert(out(id) == expected,
        s"doc $id: engine ${out(id).toSeq.sorted}, reference ${expected.toSeq.sorted}")
      // the guarantee the scheme exists for: every full window is covered
      if (n >= w) (w to n).foreach { i =>
        assert((i - w + 1 to i).exists(out(id).contains),
          s"doc $id: window [${i - w + 1},$i] has no fingerprint")
      }
    }
  }

  test("quality classifier: keep decision is exactly score >= 0.5") {
    val out = llm.TextStats.qualityClassifier.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p, keep) = (r.getDouble(1), r.getBoolean(2))
      assert(keep == (p >= 0.5), s"doc ${r.getLong(0)}: p=$p keep=$keep")
      assert(p >= 0.0 && p <= 1.0)
    }
    // the sigmoid must actually separate: both classes present at sf0.001
    assert(out.exists(_.getBoolean(2)) && out.exists(!_.getBoolean(2)),
      "fixture should produce both keep and drop decisions")
  }

  test("gopher rules: keep is the conjunction, and the bounded rules bite both ways") {
    val out = llm.TextStats.qualityGopher.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val (okW, okM, okA, okS, keep) = (5, 6, 7, 8, 9)
    out.foreach { r =>
      assert(r.getBoolean(keep) ==
        (r.getBoolean(okW) && r.getBoolean(okM) && r.getBoolean(okA) && r.getBoolean(okS)),
        s"doc ${r.getLong(0)}: keep is not the conjunction of its rules")
    }
    // Thresholds must discriminate on the fixture, not be vacuously true:
    // the two BOUNDED rules (word count, mean word length) reject some doc
    // and pass some doc, and the overall filter keeps a nonempty subset.
    for ((idx, nm) <- Seq(okW -> "word-count", okM -> "mean-word-length")) {
      assert(out.exists(!_.getBoolean(idx)), s"$nm rule never rejects")
      assert(out.exists(_.getBoolean(idx)), s"$nm rule never passes")
    }
    assert(out.exists(_.getBoolean(keep)) && out.exists(!_.getBoolean(keep)),
      "gopher filter should produce both keeps and drops at sf0.001")
  }

  test("dataset card: every field agrees with the signal it summarizes") {
    val card = llm.Corpus.datasetCard.run(spark, TestSpark.Sf).collect()
    assert(card.length == 1)
    val r = card.head
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("kept_docs") ==
      llm.Corpus.curate.run(spark, TestSpark.Sf).count(),
      "card keep count must equal the curation pipeline's")
    assert(r.getAs[Long]("contaminated_docs") ==
      llm.Corpus.contaminatedIds(spark, TestSpark.Sf).count())
    val scores = llm.TextStats.scoredDocs(spark, TestSpark.Sf)
      .collect().map(_.getDouble(1))
    val meanQ = scores.sum / scores.length
    assert(math.abs(r.getAs[Double]("mean_quality") - meanQ) < 2e-4,
      "mean quality must track the per-doc score mean (4-dp truncation)")
    assert(r.getAs[Long]("dup_docs") >= 0 &&
      r.getAs[Long]("dup_docs") < r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_tokens") > r.getAs[Long]("n_docs"),
      "token count must exceed doc count on this fixture")
  }

  test("trigram stupid backoff: hit accounting, in-domain saturation, backoff engages") {
    val out = llm.Corpus.perplexityTrigram.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out.nonEmpty)
    // hit classes partition: trigram hits + bigram backoffs <= total
    out.foreach { case (doc, (n, h3, h2, nll)) =>
      assert(h3 + h2 <= n, s"doc $doc: hit classes exceed trigram count")
      assert(!nll.isNaN && !nll.isInfinite, s"doc $doc: non-finite NLL")
      assert(nll > 0, s"doc $doc: NLL must be positive (scores are < 1)")
    }
    // reference-slice docs trained the model, so every one of their
    // trigrams is a hit and their NLL sits below the out-of-domain mean
    val bySource = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (ref, other) = out.partition { case (d, _) => bySource(d) == "src0" }
    assert(ref.nonEmpty && other.nonEmpty)
    ref.foreach { case (doc, (n, h3, _, _)) =>
      assert(h3 == n, s"in-domain doc $doc has an unseen trigram")
    }
    val refMean = ref.valuesIterator.map(_._4).sum / ref.size
    val otherMean = other.valuesIterator.map(_._4).sum / other.size
    assert(refMean < otherMean,
      s"in-domain mean NLL $refMean must undercut out-of-domain $otherMean")
    // the backoff ladder must actually engage somewhere on the fixture
    assert(other.valuesIterator.exists(_._3 > 0), "bigram backoff never used")
    assert(other.valuesIterator.exists(v => v._2 + v._3 < v._1),
      "unigram floor never used")
  }

  test("Kneser-Ney: exact integer normalization identity and probability sanity") {
    // KN sums to 1 over the FULL vocabulary. In the operator's exact
    // rational form (D = 3/4) that is the pure-integer identity
    //   Σ_w2 max(4·c12 − 3, 0) + 3·N1+(w1·) = 4·c(w1)
    // per context w1 (the discounted mass exactly equals what the
    // continuation term redistributes). Prove it for EVERY context from
    // the same frozen counts the operator reads.
    val bc = llm.Corpus.lmCounts(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(bc.nonEmpty)
    bc.groupBy(_._1).foreach { case (w1, rows) =>
      val c1 = rows.map(_._3).sum
      val n1fwd = rows.length.toLong
      val discounted = rows.map(r => math.max(4 * r._3 - 3, 0L)).sum
      assert(discounted + 3 * n1fwd === 4 * c1,
        s"context '$w1' breaks the KN normalization identity")
    }
    val out = llm.Corpus.knSmoothed.run(spark, TestSpark.Sf).collect()
    assert(out.length == math.min(50, bc.length))
    out.foreach { r =>
      val (num, den, p) = (r.getAs[Long]("kn_num"), r.getAs[Long]("kn_den"),
        r.getAs[Double]("p_kn"))
      assert(num > 0 && den > 0 && p > 0.0 && p <= 1.0)
      assert(p === num.toDouble / den.toDouble, "p_kn must be the exact quotient")
    }
  }

  test("trigram Kneser-Ney: both levels' integer normalization identities") {
    // Full-vocabulary sum-to-one, in the exact integer forms:
    //  trigram level, per (w1,w2):  Σ max(4c-3,0) = 4·c12 − 3·N1+(w1w2·)
    //  continuation level, per w2:  Σ_w3seen M·max(4·N1+(·w2w3)−3,0)
    //                               + 3·N1+(w2·)·Σ_all N1+(·w3)  = 4·N1+(·w2·)·M
    val tri = llm.Corpus.lmTrigrams(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(tri.nonEmpty)
    tri.groupBy(t => (t._1, t._2)).foreach { case ((w1, w2), rows) =>
      val c12 = rows.map(_._4).sum
      val disc = rows.map(r => math.max(4 * r._4 - 3, 0L)).sum
      assert(disc + 3L * rows.length === 4 * c12,
        s"trigram-level identity broken for ($w1, $w2)")
    }
    val mid = tri.map(t => (t._2, t._3)).groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong } // N1+(·w2w3)
    val m = mid.size.toLong
    val nendTotal = m // Σ_w3 N1+(·w3) counts each (w2,w3) type once
    mid.groupBy(_._1._1).foreach { case (w2, entries) =>
      val nmidctx = entries.values.sum
      val nafter = entries.size.toLong
      val discounted = entries.values.map(nc => m * math.max(4 * nc - 3, 0L)).sum
      assert(discounted + 3 * nafter * nendTotal === 4 * nmidctx * m,
        s"continuation-level identity broken for w2=$w2")
    }
    val out = llm.Corpus.kn3Smoothed.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (num, den, p) = (r.getAs[Long]("kn_num"), r.getAs[Long]("kn_den"),
        r.getAs[Double]("p_kn"))
      assert(num > 0 && den > 0 && p > 0.0 && p <= 1.0)
      assert(p === num.toDouble / den.toDouble)
    }
  }

  test("ngram_topk: in-row bigram construction matches a brute sliding recompute") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val brute = scala.collection.mutable.Map[String, (Long, Set[Long])]()
    for ((id, text) <- docs) {
      val toks = text.split(" ", -1) // split(text,' ') keeps empty tokens
      for (bg <- toks.sliding(2) if bg.length == 2) {
        val k = bg.mkString(" ")
        val (n, ds) = brute.getOrElse(k, (0L, Set.empty[Long]))
        brute(k) = (n + 1, ds + id)
      }
    }
    val out = llm.TextStats.ngramTopK.run(spark, TestSpark.Sf).collect()
    assert(out.length === math.min(50, brute.size))
    // the returned head must BE the global argmax under (n desc, bigram asc)
    val expectedTop = brute.iterator
      .map { case (k, (n, ds)) => (k, n, ds.size.toLong) }.toSeq
      .sortBy { case (k, n, _) => (-n, k) }.take(out.length)
    val got = out.map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("n_docs")))
    assert(got.toSeq === expectedTop,
      "top-50 bigrams must match the brute sliding-window recompute")
  }

  test("cooccurrence + PMI: pairs match a brute ±2 window; PMI recomputes from brute marginals") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"text").collect().map(_.getString(0))
    val brute = scala.collection.mutable.Map[(String, String), Long]()
    for (text <- docs) {
      val toks = text.split(" ", -1)
      for {
        i <- toks.indices; o <- 1 to 2
        if i + o < toks.length
        (a, b) <- Seq((toks(i), toks(i + o)), (toks(i + o), toks(i)))
      } brute((a, b)) = brute.getOrElse((a, b), 0L) + 1L
    }
    val co = llm.TextStats.cooccurrence.run(spark, TestSpark.Sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n")))
    val expectedTop = brute.toSeq
      .sortBy { case ((c, x), n) => (-n, c, x) }.take(co.length)
      .map { case (k, n) => (k, n) }
    assert(co.toSeq === expectedTop,
      "top co-occurrence pairs must match the brute ±2-window recompute")
    // PMI: every emitted row recomputes from the brute pair table's
    // marginals, and the support floor holds.
    val nc = brute.groupBy(_._1._1).map { case (c, xs) => c -> xs.values.sum }
    val nn = brute.values.sum
    val pmiOut = llm.TextStats.pmi.run(spark, TestSpark.Sf).collect()
    assert(pmiOut.nonEmpty)
    pmiOut.foreach { r =>
      val (c, x, n) = (r.getString(0), r.getString(1), r.getAs[Long]("n"))
      assert(n === brute((c, x)), s"($c,$x): support")
      assert(n >= 5, "support floor")
      val expected = BigDecimal(math.log(
        n.toDouble * nn.toDouble / (nc(c).toDouble * nc(x).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert((BigDecimal(r.getAs[Double]("pmi")) - expected).abs
        <= BigDecimal("0.000001"), s"($c,$x): PMI vs brute marginals")
    }
  }

  test("train manifest: cells recompute from the verified keep-list; digests brute-match") {
    // llm_curate's keep-list is hash-verified against DuckDB; the
    // manifest must be exactly its (split, shard) rollup with the md5
    // digest and documents-derived token counts.
    val keep = llm.Corpus.curate.run(spark, TestSpark.Sf).collect()
      .map(_.getLong(0))
    val tokens = sources.Tables.documents(spark, TestSpark.Sf)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def u48(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val brute = keep.groupBy(id =>
      (if (id % 100 < 95) "train" else "val", id % 8))
      .map { case (cell, ids) =>
        cell -> (ids.length.toLong, ids.map(tokens).sum,
          ids.map(id => u48(id.toString)).reduce(_ ^ _))
      }
    val out = llm.Corpus.trainManifest.run(spark, TestSpark.Sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === keep.length.toLong,
      "every kept doc lands in exactly one manifest cell")
    assert(out.length === brute.size)
    out.foreach { r =>
      val cell = (r.getString(0), r.getLong(1))
      val (n, t, dg) = brute(cell)
      assert(r.getAs[Long]("n_docs") === n, s"$cell docs")
      assert(r.getAs[Long]("n_tokens") === t, s"$cell tokens")
      assert(r.getAs[Long]("content_digest") === dg, s"$cell digest")
    }
  }

  test("stream_train_manifest: wave-merged cell partials reproduce the batch manifest bit-for-bit") {
    // Sums and XOR digests are both exactly mergeable, so the 3-way
    // arrival split must be invisible down to the last digest bit.
    val streamed = streaming.CorpusStream.streamTrainManifest
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = llm.Corpus.trainManifest
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move a manifest count or flip a digest bit")
  }

  test("tokenizer fertility: per-source rollup agrees with the verified per-doc BPE apply") {
    // llm_bpe_apply's per-doc (n_words, n_pieces) is hash-verified against
    // DuckDB; fertility must be exactly its source-grouped rollup.
    val bySrc = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = llm.TextStats.bpeApply.run(spark, TestSpark.Sf).collect()
      .map(r => (bySrc(r.getLong(0)), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces")))
    val brute = perDoc.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).sum)
    }
    val out = llm.TextStats.tokenizerFertility.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, nWords, nPieces) = brute(r.getString(0))
      assert(r.getAs[Long]("n_docs") === nDocs, s"${r.getString(0)} docs")
      assert(r.getAs[Long]("n_words") === nWords, s"${r.getString(0)} words")
      assert(r.getAs[Long]("n_pieces") === nPieces, s"${r.getString(0)} pieces")
      assert(math.abs(r.getAs[Double]("fertility")
        - nPieces.toDouble / nWords.toDouble) <= 1e-6)
      assert(r.getAs[Double]("fertility") >= 1.0,
        "a word is at least one piece")
    }
    assert(out.map(_.getAs[Long]("n_docs")).sum === bySrc.size.toLong,
      "every document lands in exactly one source row")
  }

  test("stream_cooccurrence: wave-merged pair counts reproduce the batch table bit-for-bit") {
    // Pairs never cross documents, so the 3-way arrival split must be
    // invisible: identical rows in identical order, including the top-100
    // cut (integer counts — no tie can move across the boundary in one
    // engine only).
    val streamed = streaming.CorpusStream.streamCooccurrence
      .run(spark, TestSpark.Sf).collect().map(_.toSeq).toSeq
    val batch = llm.TextStats.cooccurrence
      .run(spark, TestSpark.Sf).collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }

  test("stream_changepoint: wave-merged daily partials reproduce the batch split exactly") {
    val streamed = streaming.DriftStream.streamChangepoint
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = operators.TimeSeries.changepoint
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move the located changepoint")
  }

  test("moments: hi/lo split reconstructs the exact 4th-power sum; c3 matches brute") {
    val rows = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val out = operators.Analytics.moments.run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(0)
      val xs = rows.filter(_._1 == t).map(_._2)
      val p4 = xs.map(x => BigInt(x).pow(4)).sum
      assert(BigInt(r.getAs[Long]("p4_hi")) * BigInt(1000000000L)
        + BigInt(r.getAs[Long]("p4_lo")) === p4,
        s"$t: hi/lo halves must reconstruct the exact BigInt 4th-power sum")
      assert(r.getAs[Long]("c3") === xs.map(x => x * x * x).sum, s"$t cube sum")
      assert(!r.getAs[Double]("skew").isNaN && !r.getAs[Double]("kurt").isNaN)
    }
  }

  test("quality CI: counts brute-match; Wilson interval contains the rate; flag recomputes") {
    val passes = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"source").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val scores = llm.TextStats.quality.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("score") >= 0.5)).toMap
    val brute = passes.groupBy(_._2).map { case (src, ds) =>
      src -> (ds.size.toLong, ds.keys.count(scores(_)).toLong)
    }
    val globalRate = scores.values.count(identity).toDouble / scores.size
    val out = llm.TextStats.qualityCi.run(spark, TestSpark.Sf).collect()
    assert(out.length === brute.size)
    out.foreach { r =>
      val (n, k) = brute(r.getString(0))
      assert(r.getAs[Long]("n") === n, s"${r.getString(0)} n")
      assert(r.getAs[Long]("k") === k, s"${r.getString(0)} k")
      val (rate, lo, hi) = (r.getAs[Double]("rate"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      assert(lo - 1e-9 <= rate && rate <= hi + 1e-9,
        s"${r.getString(0)}: interval [$lo,$hi] must contain rate $rate")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, "Wilson bounds stay in [0,1]")
      if (r.getAs[Long]("sig_below_global") == 1L)
        assert(hi < globalRate + 1e-6,
          s"${r.getString(0)}: flag requires the upper bound below the global rate")
    }
  }

  test("stream_quality_ci: wave-merged pass partials reproduce the batch intervals exactly") {
    val streamed = streaming.CorpusStream.streamQualityCi
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    val batch = llm.TextStats.qualityCi
      .run(spark, TestSpark.Sf).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq,
      "batching must not move an interval or a significance flag")
  }

  test("llm_manifest_diff: digest verdicts localize exactly the cells holding kept src7 docs") {
    val out = llm.Corpus.manifestDiff.run(spark, TestSpark.Sf).collect()
    // the a-side must BE the canonical manifest
    val manifest = llm.Corpus.trainManifest.run(spark, TestSpark.Sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(out.length === manifest.size,
      "the replica loses docs, never whole cells, at this fixture")
    // kept src7 docs per cell, replayed from the keep-list
    val src7 = llm.Corpus.curatedKeepList(spark, TestSpark.Sf).select("doc_id")
      .join(sources.Tables.documents(spark, TestSpark.Sf)
        .filter($"source" === "src7"), "doc_id")
      .collect().map(_.getAs[Long]("doc_id"))
    assert(src7.nonEmpty, "fixture must keep some src7 docs or the diff is vacuous")
    val lostByCell = src7.groupBy(id =>
      (if (id % 100 < 95) "train" else "val", id % 8))
      .view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val cell = (r.getString(0), r.getLong(1))
      val lost = lostByCell.getOrElse(cell, 0L)
      assert(r.getAs[Long]("n_docs_a") === manifest(cell)._1)
      assert(r.getAs[Long]("n_docs_delta") === lost, s"$cell doc delta")
      assert(r.getAs[Boolean]("digest_match") === (lost == 0L),
        s"$cell digest verdict must flip exactly with loss")
    }
  }

  test("llm_vocab_coverage: per-source coverage replays the deterministic top-50 cut") {
    val out = llm.TextStats.vocabCoverage.run(spark, TestSpark.Sf).collect()
    val toks = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"source", explode(split($"text", " ")).as("t")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(50).map(_._1).toSet
    val bySrc = toks.groupBy(_._1)
    assert(out.length === bySrc.size)
    out.foreach { r =>
      val ts = bySrc(r.getString(0)).map(_._2)
      val covered = ts.count(vocab).toLong
      assert(r.getAs[Long]("n_tokens") === ts.length.toLong)
      assert(r.getAs[Long]("n_covered") === covered)
      assert(r.getAs[Long]("n_oov_types") ===
        ts.filterNot(vocab).distinct.length.toLong)
      assert(math.abs(r.getAs[Double]("coverage")
        - covered.toDouble / ts.length) <= 1e-6)
    }
  }

  test("llm_zipf: the slope replays an exact OLS on the deterministic top-100 rank curve") {
    val out = llm.TextStats.zipf.run(spark, TestSpark.Sf).collect()
    val toks = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"source", explode(split($"text", " ")).as("t")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    assert(out.length === toks.size)
    out.foreach { r =>
      val counts = toks(r.getString(0)).map(_._2)
        .groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(100).map(_._2)
      val pts = counts.zipWithIndex.map { case (c, i) =>
        (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getAs[Long]("n_terms") === pts.length.toLong)
      assert(math.abs(r.getAs[Double]("zipf_slope") - slope) <= 1e-3,
        s"${r.getString(0)} slope $slope")
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        "frequency must fall with rank")
    }
  }

  test("llm_ngram_entropy: H replays the exact bigram distribution; bounds hold") {
    val out = llm.TextStats.ngramEntropy.run(spark, TestSpark.Sf).collect()
    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))
      .groupBy(_._1)
    out.foreach { r =>
      val grams = docs(r.getString(0)).flatMap { case (_, w) =>
        w.zip(w.tail).map { case (a, b) => a + " " + b } }
      val cs = grams.groupBy(identity).view.mapValues(_.length.toLong).values.toSeq
      val n = cs.sum.toDouble
      val h = math.log(n) - cs.map(c => c * math.log(c.toDouble)).sum / n
      assert(r.getAs[Long]("n_types") === cs.length.toLong)
      assert(r.getAs[Long]("n") === cs.sum)
      assert(math.abs(r.getAs[Double]("h_nats") - h) <= 1e-3)
      assert(r.getAs[Double]("h_nats") >= -1e-9 &&
        r.getAs[Double]("h_nats") <= math.log(cs.length.toDouble) + 1e-9,
        "0 <= H <= ln(types)")
      assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) <= 0.1)
    }
  }

  test("llm_curriculum: stages are balanced quality quartiles; cells conserve the manifest") {
    val out = llm.Corpus.curriculum.run(spark, TestSpark.Sf).collect()
    val manifest = llm.Corpus.trainManifest.run(spark, TestSpark.Sf).collect()
    // conservation: curriculum cells repartition exactly the manifest docs
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      manifest.map(_.getAs[Long]("n_docs")).sum)
    assert(out.map(_.getAs[Long]("n_tokens")).sum ===
      manifest.map(_.getAs[Long]("n_tokens")).sum)
    // the XOR of all cell digests is split-invariant: curriculum cells
    // and manifest cells fold to the same corpus digest
    assert(out.map(_.getAs[Long]("content_digest")).reduce(_ ^ _) ===
      manifest.map(_.getAs[Long]("content_digest")).reduce(_ ^ _))
    // stage sizes balance (exact ntile distribution)
    val byStage = out.groupBy(_.getAs[Long]("stage")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byStage.keySet === Set(1L, 2L, 3L, 4L))
    assert(byStage.values.max - byStage.values.min <= 1L)
    // quality ordering: stage k's worst doc is at least stage k+1's best
    val spans = (1L to 4L).map(k => (
      out.filter(_.getAs[Long]("stage") == k).map(_.getAs[Long]("p_min")).min,
      out.filter(_.getAs[Long]("stage") == k).map(_.getAs[Long]("p_max")).max))
    spans.zip(spans.tail).foreach { case ((lo1, _), (_, hi2)) =>
      assert(lo1 >= hi2, "EASY\u2192HARD: earlier stages hold higher quality") }
  }
}
