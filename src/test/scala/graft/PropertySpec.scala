package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}
import graft.functions.{TextFunctions => TF}

/** Property-based invariants (SURVEY.md §5.4) over generated corpora:
  * dedup idempotence, Jaccard bounds/identity/symmetry, size-ratio
  * prefilter losslessness, MinHash permutation range + determinism,
  * fingerprint determinism, and window-running-sum vs scan equivalence.
  *
  * Pure scalacheck (the scalatest bridge artifact is not in the offline
  * cache); sbt runs the scalacheck test framework natively. Trial counts
  * are reduced because every trial runs Spark jobs.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "spark", "join", "filter", "window", "merge", "table", "data", "row",
    "hash", "scan", "the", "a", "of")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(2, 20).flatMap(n => Gen.listOfN(n, doc))

  private def dedup(d: DataFrame): DataFrame =
    d.withColumn("h", TF.contentHash($"text"))
      .withColumn("rn", row_number().over(Window.partitionBy($"h").orderBy($"doc_id")))
      .filter($"rn" === 1).drop("rn", "h")

  property("exact dedup is idempotent and survivors are distinct") =
    Prop.forAll(corpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = dedup(df).collect()
      val twice = dedup(dedup(df)).collect()
      val onceIds = once.map(_.getLong(0)).toSet
      onceIds == twice.map(_.getLong(0)).toSet &&
        once.map(_.getString(1)).distinct.length == once.length &&
        once.map(_.getString(1)).toSet == texts.toSet
    }

  property("Jaccard of shingle sets: [0,1], 1 on self, symmetric") =
    Prop.forAll(Gen.zip(doc, doc)) { case (a, b) =>
      val r = Seq((a, b)).toDF("ta", "tb")
        .select(
          TF.jaccard(TF.hashedShingleSet(TF.tokens($"ta"), 3),
                     TF.hashedShingleSet(TF.tokens($"tb"), 3)).as("jab"),
          TF.jaccard(TF.hashedShingleSet(TF.tokens($"tb"), 3),
                     TF.hashedShingleSet(TF.tokens($"ta"), 3)).as("jba"),
          TF.jaccard(TF.hashedShingleSet(TF.tokens($"ta"), 3),
                     TF.hashedShingleSet(TF.tokens($"ta"), 3)).as("jaa"))
        .collect().head
      r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0 &&
        r.getDouble(0) == r.getDouble(1) && r.getDouble(2) == 1.0
    }

  property("size-ratio prefilter never drops a pair with Jaccard >= tau") =
    Prop.forAll(corpus) { texts =>
      val tau = llm.Dedup.Tau
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select($"doc_id", TF.hashedShingleSet(TF.tokens($"text"), 3).as("sh"))
        .withColumn("n", size($"sh"))
      df.as("a").crossJoin(df.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(
          TF.jaccard(col("a.sh"), col("b.sh")).as("j"),
          TF.sizeRatioPass(col("a.n"), col("b.n"), tau).as("pass"))
        .collect()
        .forall(r => r.getDouble(0) < tau || r.getBoolean(1))
    }

  property("MinHash permutations stay in [0, P) and are deterministic") =
    Prop.forAll(doc) { t =>
      val base = Seq(t).toDF("text")
        .select(explode(TF.hashedShingleSet(TF.tokens($"text"), 2)).as("sh"))
        .select(TF.shingleHash($"sh".cast("string")).as("h"))
      val perms = TF.minhashCoeffs(8).zipWithIndex.foldLeft(base) {
        case (d, ((a, b), i)) => d.withColumn(s"p$i", TF.permute($"h", a, b))
      }
      val rows1 = perms.collect().map(_.toSeq.toList).toList
      val rows2 = perms.collect().map(_.toSeq.toList).toList
      rows1 == rows2 && rows1.forall(_.drop(1).forall {
        case v: Long => v >= 0L && v < TF.MinhashPrime
        case _ => false
      })
    }

  property("polynomial fingerprint is deterministic per content") =
    Prop.forAll(doc) { a =>
      val fp = Seq(a, a).toDF("text")
        .select(TF.polyFingerprint(TF.tokens($"text")).as("fp"))
        .collect().map(_.getLong(0))
      fp(0) == fp(1)
    }

  property("running window sum at last row equals group total") = {
    val values = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(-100, 100))))
    Prop.forAll(values) { vs =>
      val df = vs.zipWithIndex
        .map { case ((g, v), i) => (g, i.toLong, v.toLong) }
        .toDF("g", "seq", "v")
      val w = Window.partitionBy($"g").orderBy($"seq")
        .rowsBetween(Window.unboundedPreceding, 0)
      val lastRunning = df.withColumn("rs", sum($"v").over(w))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy($"seq".desc)))
        .filter($"rn" === 1)
        .select($"g", $"rs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val totals = df.groupBy($"g").agg(sum($"v").as("t")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      lastRunning == totals
    }
  }

  property("shardShuffle: disjoint gap-free shards covering the corpus") = {
    // The dataloader contract: every doc lands in exactly one shard,
    // per-shard positions are 1..n with no gaps or ties, and the
    // assignment is deterministic across runs (hash, never rand()).
    val out = llm.TextStats.shardShuffle.run(spark, TestSpark.Sf)
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = sources.Tables.documents(spark, TestSpark.Sf).count()
    val coversAll = out.length.toLong == nDocs &&
      out.map(_._1).distinct.length.toLong == nDocs
    val gapFree = out.groupBy(_._2).forall { case (_, rows) =>
      rows.map(_._3).sorted.sameElements(1L to rows.length.toLong)
    }
    val rerun = llm.TextStats.shardShuffle.run(spark, TestSpark.Sf)
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Prop(coversAll && gapFree && out.sameElements(rerun))
  }

  // llm_vocab_fuzzy's candidate-generation bound, generatively: ANY two
  // strings within one edit (substitution / insertion / deletion) share
  // an entry of {self} ∪ {one-deletion variants}, so the equi-join on
  // deletion variants can never miss a distance-1 pair. Pure math — no
  // Spark jobs — so it exercises far more cases than the fixture sweep.
  private def delNbhd(t: String): Set[String] =
    Set(t) ++ (0 until t.length).map(i => t.take(i) + t.drop(i + 1))

  private val tokenGen: Gen[String] =
    Gen.chooseNum(3, 9).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  private val singleEdit: Gen[(String, String)] = for {
    a <- tokenGen
    kind <- Gen.chooseNum(0, 2)
    pos <- Gen.chooseNum(0, a.length - 1)
    c <- Gen.alphaLowerChar
  } yield kind match {
    case 0 => (a, a.updated(pos, c))             // substitution
    case 1 => (a, a.take(pos) + c + a.drop(pos)) // insertion
    case 2 => (a, a.take(pos) + a.drop(pos + 1)) // deletion
  }

  property("symmetric-delete neighborhoods intersect for every single edit") =
    Prop.forAll(singleEdit) { case (a, b) =>
      delNbhd(a).intersect(delNbhd(b)).nonEmpty
    }

  private val keyUniverse: Gen[(List[Long], List[Long])] = for {
    dimN <- Gen.chooseNum(1, 30)
    dim <- Gen.listOfN(dimN, Gen.chooseNum(-100000L, 100000L))
    factN <- Gen.chooseNum(1, 60)
    fact <- Gen.listOfN(factN, Gen.chooseNum(-100000L, 100000L))
  } yield (dim.distinct, fact)

  property("bloom prefilter is conservative for every dim/fact key split") =
    Prop.forAll(keyUniverse) { case (dimKeys, factKeys) =>
      // No false negatives, ever: the invariant that makes the prefilter
      // semantics-preserving regardless of key distribution (the fixture
      // test shows selectivity; this shows safety on arbitrary inputs,
      // including negatives, duplicates, and dim ∌ fact overlaps).
      val dim = dimKeys.toDF("k")
      val fact = factKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("fk", "row_id")
      val survivors = operators.Joins.bloomSurvive(dim, "k", fact, "fk")
        .select($"row_id").as[Long].collect().toSet
      val dimSet = dimKeys.toSet
      factKeys.zipWithIndex.forall { case (k, i) =>
        !dimSet.contains(k) || survivors.contains(i.toLong)
      }
    }
}
