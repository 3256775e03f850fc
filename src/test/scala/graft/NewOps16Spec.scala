package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-16 operators — headlined by the
  * multi-SCC exercises of the FULL FW-BW recursion (the graded fixture
  * graph is one giant SCC, so the recursion's peel loop, trim pass and
  * closure base case are pinned here on graphs that actually have
  * ancestors/descendants/others and singleton mass). */
class NewOps16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A 4-class digraph: two cycles (SCCs {10,11,12} and {20,21,22,23}),
    * an ancestor chain 1→2→10, a descendant chain 12→30→31, a cross
    * SCC→SCC edge 12→20, a disconnected 2-cycle {40,41}, and a stray
    * path 50→51. Expected labels: each SCC to its min member, every
    * non-cycle vertex to itself. */
  private val edges = Seq(
    (10L, 11L), (11L, 12L), (12L, 10L),
    (20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L), (21L, 23L),
    (1L, 2L), (2L, 10L),
    (12L, 30L), (30L, 31L),
    (12L, 20L),
    (40L, 41L), (41L, 40L),
    (50L, 51L))
  private val expected = Map(
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
    1L -> 1L, 2L -> 2L, 30L -> 30L, 31L -> 31L,
    40L -> 40L, 41L -> 40L, 50L -> 50L, 51L -> 51L)

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def edgeDf = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  test("fwbwLabels: full recursion labels the 4-class synthetic digraph exactly") {
    val got = labelsOf(
      operators.Graph.fwbwLabels(spark, edgeDf, closureThreshold = 0L))
    assert(got === expected)
  }

  test("fwbwLabels: pure closure base case (threshold ∞) agrees with the recursion") {
    val viaClosure = labelsOf(
      operators.Graph.fwbwLabels(spark, edgeDf, closureThreshold = Long.MaxValue))
    assert(viaClosure === expected)
  }

  test("fwbwLabels: recursion == closure on the 16-bucket condensation ladder") {
    // The graded fixture's order-sequence digraph is one giant SCC; the
    // 16-bucket condensation transform (intra-bucket edges kept, cross-
    // bucket edges forward-only, so SCCs are provably bucket-confined)
    // yields a multi-SCC instance FROM the data — the recursion's trim,
    // peel and base-case paths all fire, and must agree bit-for-bit
    // with the pure closure form.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    val p = sources.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("nxt", lead(col("l_partkey"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("nxt").as("dst"))
      .distinct()
      .filter(pmod(col("src"), lit(16)) <= pmod(col("dst"), lit(16)))
    val rec = labelsOf(
      operators.Graph.fwbwLabels(spark, p, closureThreshold = 0L))
    val clo = labelsOf(
      operators.Graph.fwbwLabels(spark, p, closureThreshold = Long.MaxValue))
    assert(rec.nonEmpty && rec === clo)
    // multi-SCC sanity: the instance actually exercises the peel — it
    // has both non-trivial SCCs and singleton labels.
    val sizes = rec.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ > 1), "ladder lost its non-trivial SCCs")
    assert(sizes.exists(_ == 1), "ladder lost its singleton mass")
  }

  test("llm_sample_reservoir: partition-split invariant and window-rank exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val res = udaf(new functions.ReservoirTopK(20))
    val h = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS DOUBLE)")
    val pr = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"lang", $"doc_id",
        ($"n_chars" * lit(1152921504606846976L).cast("double") / h).as("p"))
    def reservoir(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.groupBy($"lang").agg(res($"p", $"doc_id").as("r"))
        .select($"lang", explode($"r").as("e"))
        .select($"lang", $"e._2".as("doc_id"), $"e._1".as("p"))
        .collect().map(_.toSeq).toSet
    // the reservoir content must be a pure function of the input SET:
    // any repartitioning (different per-partition reservoirs, different
    // merge trees) yields the identical sample.
    val base = reservoir(pr)
    assert(base.size === spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"lang").distinct.count() * 20)
    assert(reservoir(pr.repartition(1)) === base)
    assert(reservoir(pr.repartition(7, $"doc_id")) === base)
    assert(reservoir(pr.repartition(13, $"lang")) === base)
    // ...and equals the rank-window formulation exactly.
    import org.apache.spark.sql.expressions.Window
    val viaWindow = pr.withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"p".desc, $"doc_id")))
      .filter($"rn" <= 20).select($"lang", $"doc_id", $"p")
      .collect().map(_.toSeq).toSet
    assert(base === viaWindow)
  }

  test("ReservoirTopK: reduce/merge keep the (priority desc, id asc) top-k order") {
    val agg = new functions.ReservoirTopK(3)
    val full = Seq((5.0, 1L), (4.0, 7L), (3.0, 2L), (3.0, 9L), (1.0, 5L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(full === Vector((5.0, 1L), (4.0, 7L), (3.0, 2L)))
    // tie on priority breaks to the LOWER id
    val tied = agg.reduce(full, (3.0, 0L))
    assert(tied === Vector((5.0, 1L), (4.0, 7L), (3.0, 0L)))
    // merge of two reservoirs == reservoir of the union
    val a = Seq((9.0, 3L), (2.0, 4L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, full) ===
      Seq((9.0, 3L), (5.0, 1L), (4.0, 7L), (2.0, 4L), (3.0, 2L))
        .foldLeft(agg.zero)(agg.reduce))
    assert(agg.merge(agg.zero, full) === full)
    assert(agg.merge(full, agg.zero) === full)
  }

  test("graph_scc_fwbw_full: labels agree with graph_scc_fwbw's one-SCC classification") {
    val full = SparkEntry.queries("graph_scc_fwbw_full")(spark, TestSpark.Sf)
      .collect()
    val round = SparkEntry.queries("graph_scc_fwbw")(spark, TestSpark.Sf)
      .collect()
    // the fixture graph is one giant SCC: the round classifies every
    // vertex 'scc', and the full labeling must put them all in one
    // component labeled by the min vertex with scc_size = |V|.
    assert(round.forall(_.getAs[String]("side") == "scc"))
    val minV = full.map(_.getAs[Long]("part")).min
    assert(full.forall(r => r.getAs[Long]("scc_id") == minV &&
      r.getAs[Long]("scc_size") == full.length.toLong))
  }
}
