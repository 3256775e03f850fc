package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{ArrayFunctions => AF, TextFunctions => TF}
import graft.sources.Tables

/** Micro-benchmark: native row-level expressions vs the declarative
  * (higher-order-function / dataflow) formulations they replaced.
  * Run: `tools/run_class.sh graft.MicroBench [sfDir]`. Numbers land in
  * SCALE.md; ExpressionParitySpec pins that both forms agree bit-for-bit.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val skewOnly = args.contains("skew")
    val hubOnly = args.contains("hub")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    def best3[A](label: String)(f: => A): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-46s ${times.min}%8.3f s (best of 3)")
    }

    // Journey-window hot-key drive (round-12 verdict item 1): the
    // per-user window family (agg_markov, ts_sessionize, agg_cohort_ltv,
    // ts_funnel) partitions by user_id, so one degenerate bot user
    // funnels its whole history into ONE task's sort. Synthesize three
    // events fixtures — uniform, a 50×-median hot user, and a
    // partition-dominating 10⁶-event bot — through the queries' REAL
    // plans (written as events.parquet, served via SparkEntry.queries).
    // Numbers land in BASELINE.md's journey-skew ledger.
    if (!hubOnly) {
      val base = "/tmp/graft_skew"
      def mkEvents(tag: String, hotRows: Long, baseRows: Long = 200000L,
          users: Long = 2000L): String = {
        val out = s"$base/$tag"
        val uniform = spark.range(baseRows).select(
          $"id".as("event_id"),
          (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
            + ($"id" % 7776000L)).cast("timestamp").as("ts"),
          ($"id" % users).as("user_id"),
          element_at(array(lit("view"), lit("view"), lit("click"),
            lit("view"), lit("purchase")), ($"id" % 5 + 1).cast("int"))
            .as("event_type"),
          round(($"id" % 9973L).cast("double") / 100.0, 2).as("value"),
          lit("{}").as("props"))
        val hot = spark.range(hotRows).select(
          ($"id" + 10000000L).as("event_id"),
          (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
            + ($"id" % 7776000L)).cast("timestamp").as("ts"),
          lit(999999L).as("user_id"),
          element_at(array(lit("view"), lit("view"), lit("click"),
            lit("view"), lit("purchase")), ($"id" % 5 + 1).cast("int"))
            .as("event_type"),
          round(($"id" % 9973L).cast("double") / 100.0, 2).as("value"),
          lit("{}").as("props"))
        uniform.unionAll(hot).write.mode("overwrite")
          .parquet(s"$out/events.parquet")
        out
      }
      // median user carries 100 events; four rungs — wide1m is the
      // same-cardinality no-hot-user CONTROL for bot1m (bot1m has 6x
      // uniform's rows, so comparing it to uniform confounds corpus size
      // with skew; hot-task domination = bot1m vs wide1m).
      val dirs = Seq(
        "uniform" -> mkEvents("uniform", 0L),
        "hot50x" -> mkEvents("hot50x", 5000L),
        "wide1m" -> mkEvents("wide1m", 0L, baseRows = 1200000L, users = 12000L),
        "bot1m" -> mkEvents("bot1m", 1000000L),
        "wide4m" -> mkEvents("wide4m", 0L, baseRows = 4200000L, users = 42000L),
        "bot4m" -> mkEvents("bot4m", 4000000L))
      for (q <- Seq("agg_markov", "ts_sessionize", "agg_cohort_ltv", "ts_funnel");
           (tag, d) <- dirs) {
        best3(f"journey-skew $q%-16s $tag") {
          SparkEntry.queries(q)(spark, d).count()
        }
      }
      // r14 ladder: the ten single-level-per-user-window queries the
      // PlanAuditSpec hot-key rule flagged, re-measured after their
      // two-level rewrites (bot4m/wide4m ≤ ~1x = skew-immune; before
      // the rewrites these are the 3.1-3.5x class).
      val skew14 = Seq("join_asof", "win_running", "win_lag_lead",
        "win_ntile", "win_range_frame", "ts_ewma", "ts_anomaly",
        "ts_rolling_median", "ts_cusum", "ts_concurrency")
      for (q <- skew14;
           (tag, d) <- dirs.filter(x => Set("wide4m", "bot4m")(x._1))) {
        best3(f"journey-skew14 $q%-18s $tag") {
          SparkEntry.queries(q)(spark, d).count()
        }
      }
      if (skewOnly) { spark.stop(); return }
    }

    // Hot-GROUP reservoir ladder (r16): llm_sample_reservoir's claim is
    // that a bounded-state reservoir aggregate survives a group holding
    // the whole corpus where a rank window funnels that group through
    // ONE task's sort. Synthesize documents fixtures — uniform langs vs
    // one lang carrying ~all docs — and drive the GRADED reservoir plan
    // against the window-rank twin on identical data. Numbers land in
    // BASELINE.md's reservoir ladder.
    if (args.contains("reservoir")) {
      val base = "/tmp/graft_resv"
      def mkDocs(tag: String, rows: Long, hotShare: Int): String = {
        val out = s"$base/$tag"
        // hotShare of every 100 docs land in lang "hot"; the rest spread
        // over 20 cold langs. text kept tiny: the ladder stresses the
        // aggregate, not the scan.
        spark.range(rows).select(
          $"id".as("doc_id"), lit("t").as("text"),
          when($"id" % 100 < hotShare, lit("hot"))
            .otherwise(concat(lit("l"), ($"id" % 20).cast("string")))
            .as("lang"),
          lit("s").as("source"),
          ($"id" % 9973L + 1L).as("n_chars"))
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        out
      }
      val rungs = Seq(
        "uniform4m" -> mkDocs("uniform4m", 4000000L, 5),
        "hot4m"     -> mkDocs("hot4m", 4000000L, 95))
      for ((tag, d) <- rungs) {
        best3(f"reservoir agg      $tag") {
          SparkEntry.queries("llm_sample_reservoir")(spark, d).count()
        }
        best3(f"reservoir window   $tag") {
          import org.apache.spark.sql.expressions.Window
          val h = expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS DOUBLE)")
          Tables.documents(spark, d)
            .select($"lang", $"doc_id",
              ($"n_chars" * lit(1152921504606846976L).cast("double") / h).as("p"))
            .withColumn("rn", row_number().over(
              Window.partitionBy($"lang").orderBy($"p".desc, $"doc_id")))
            .filter($"rn" <= 20).count()
        }
      }
      spark.stop(); return
    }

    // Hot-VERTEX hub ladder (round-14 verdict item 2): the journey-bot
    // ladder covered per-USER windows; the graph family has the
    // analogous untested skew — one hub vertex with 10⁴–10⁵ edges
    // (every real interaction graph has one). Synthesize lineitem
    // fixtures whose co-occurrence graph is a ring (the same-edge-count
    // CONTROL) or a ring plus a planted H-degree hub, and drive the
    // GRADED query plans (via SparkEntry.queries — each rung dir builds
    // its own fingerprinted adjacency layout). Each edge (u, v) is two
    // 2-part orders, clearing MinSupport = 2; the derivation join is
    // order-keyed, so the hub stresses only the per-vertex operators.
    // Numbers land in BASELINE.md's hub-skew ladder table.
    if (hubOnly) {
      val base = "/tmp/graft_hub"
      // ring(v) edges over vertices 0..v-1; hub spokes 10^6+i — hub id
      // 10^6 keeps spoke/ring id spaces disjoint.
      def mkGraph(tag: String, ringV: Long, hubDeg: Long): String = {
        val out = s"$base/$tag"
        val ring = spark.range(ringV).select(
          ($"id" * 2).as("o"), $"id".as("u"), (($"id" + 1) % ringV).as("v"))
        val spokes = spark.range(hubDeg).select(
          ($"id" * 2 + 2 * ringV).as("o"), lit(1000000L).as("u"), $"id".as("v"))
        val edges = ring.unionAll(spokes)
        // two orders per edge (support 2 ≥ MinSupport), two lines each
        val li = edges.select(explode(array(lit(0L), lit(1L))).as("rep"),
            $"o", $"u", $"v")
          .select((($"o" * 2) + $"rep").as("l_orderkey"),
            explode(array($"u", $"v")).as("l_partkey"))
          .withColumn("l_linenumber", lit(1))
        li.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
        out
      }
      val rungs = Seq(
        "wide20k"  -> mkGraph("wide20k", 20000L, 0L),
        "hub10k"   -> mkGraph("hub10k", 10000L, 10000L),
        "wide200k" -> mkGraph("wide200k", 200000L, 0L),
        "hub100k"  -> mkGraph("hub100k", 100000L, 100000L))
      // graph_jaccard (uncapped) is EXCLUDED from the 100k rung by
      // design: its wedge set at the hub is C(10⁵,2) ≈ 5·10⁹ rows —
      // the degradation is semantic (the candidate-pair OUTPUT is
      // hub-quadratic), which is exactly why graph_jaccard_capped is
      // the graded production form. The 10k rung still measures it so
      // the uncapped-vs-capped gap is a recorded number, not prose.
      val hubQs = Seq("graph_pagerank", "graph_label_prop", "graph_kcore",
        "graph_triangles", "graph_clustering_coeff", "graph_louvain",
        "graph_jaccard_capped", "graph_adamic_adar_capped",
        "graph_adamic_adar", "graph_jaccard")
      for (q <- hubQs; (tag, d) <- rungs) {
        val skip = q == "graph_jaccard" && tag.endsWith("200k") ||
          q == "graph_jaccard" && tag == "hub100k" ||
          q == "graph_adamic_adar" && tag == "hub100k"
        if (!skip) best3(f"hub-skew $q%-24s $tag") {
          SparkEntry.queries(q)(spark, d).count()
        }
      }
      spark.stop(); return
    }

    val toks = Tables.documents(spark, dir)
      .select($"doc_id", TF.tokens($"text").as("toks")).cache()
    toks.count() // warm cache + JVM

    best3("shingles: HOF transform+distinct+sort") {
      toks.select($"doc_id", TF.tokenHashes($"toks").as("th"))
        .select(array_sort(TF.shingleSetFromHashes($"th", 3)).as("s"))
        .agg(sum(size($"s"))).collect()
    }
    best3("shingles: native SortedHashedShingles") {
      toks.select(AF.sortedShingles(spark, $"toks", 3).as("s"))
        .agg(sum(size($"s"))).collect()
    }

    val sh = toks.select($"doc_id",
      AF.sortedShingles(spark, $"toks", 3).as("shingles")).cache()
    sh.count()

    best3("minhash-128: explode + 128 min-aggregates") {
      val coeffs = TF.minhashCoeffs(128)
      val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
        min(TF.permute($"h", a, b)).as(s"m$i")
      }
      sh.select($"doc_id", explode($"shingles").as("s"))
        .select($"doc_id", TF.shingleHash($"s").as("h"))
        .groupBy($"doc_id").agg(mins.head, mins.tail: _*)
        .agg(count(lit(1))).collect()
    }
    best3("minhash-128: native MinHashSignature") {
      sh.select($"doc_id", AF.minhashSignature(spark, $"shingles", 128).as("sig"))
        .agg(sum(size($"sig"))).collect() // consume sig: defeat column pruning
    }

    best3("simhash: explode tokens x 64-bit votes") {
      toks.select($"doc_id", explode($"toks").as("tok"))
        .select($"doc_id", xxhash64($"tok").as("h"))
        .select($"doc_id", $"h", explode(sequence(lit(0), lit(63))).as("bit"))
        .select($"doc_id", $"bit",
          when(expr("shiftright(h, CAST(bit AS INT))").bitwiseAND(lit(1L)) === 1L,
            lit(1)).otherwise(lit(-1)).as("sign"))
        .groupBy($"doc_id", $"bit").agg(sum($"sign").as("s"))
        .groupBy($"doc_id")
        .agg(sum(when($"s" > 0, expr("shiftleft(1L, CAST(bit AS INT))"))
          .otherwise(lit(0L))).as("sig"))
        .agg(count(lit(1))).collect()
    }
    best3("simhash: native SimHash64") {
      toks.select($"doc_id", AF.simhash64(spark, $"toks").as("sig"))
        .agg(max($"sig")).collect() // consume sig: defeat column pruning
    }

    best3("simhash-60 md5: aggregate-per-bit HOF") {
      toks
        .withColumn("hashes",
          expr("transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"))
        .select(expr("""aggregate(sequence(0, 59), CAST(0 AS BIGINT),
            (acc, j) -> acc + IF(
              aggregate(hashes, CAST(0 AS BIGINT),
                (a, h) -> a + (shiftright(h, j) % 2) * 2 - 1) > 0,
              CAST(pow(2, j) AS BIGINT), CAST(0 AS BIGINT)))""").as("sig"))
        .agg(max($"sig")).collect()
    }
    best3("simhash-60 md5: native SimHashFromHashes") {
      toks
        .withColumn("hashes",
          expr("transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"))
        .select(AF.simhashFromHashes(spark, $"hashes", 60).as("sig"))
        .agg(max($"sig")).collect()
    }

    best3("positional 8-grams: concat_ws strings + xxhash64") {
      toks.select(posexplode(transform(
          sequence(lit(0), greatest(size($"toks") - 8, lit(0))),
          i => concat_ws(" ", slice($"toks", i + lit(1), lit(8)))))
          .as(Seq("pos", "g")))
        .select(xxhash64($"g").as("gh"))
        .agg(max($"gh")).collect()
    }
    best3("positional 8-grams: native PositionalHashedShingles") {
      toks.select(posexplode(AF.positionalShingles(spark, $"toks", 8))
          .as(Seq("pos", "gh")))
        .agg(max($"gh")).collect()
    }

    val pairs = sh.limit(500).as("a").crossJoin(sh.limit(500).as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.shingles".as("sa"), $"b.shingles".as("sb")).cache()
    pairs.count()

    best3("pair intersect: size(array_intersect)") {
      pairs.select(size(array_intersect($"sa", $"sb")).as("n"))
        .agg(sum($"n")).collect()
    }
    best3("pair intersect: native SortedLongIntersectSize") {
      pairs.select(AF.sortedIntersectSize(spark, $"sa", $"sb").as("n"))
        .agg(sum($"n")).collect()
    }

    // Hub-skew wedge drive (round-8 verdict item 4): a 5000-degree hub +
    // a 5000-vertex path, through the SAME wedgeCommon path the graded
    // jaccard pair uses. The hub mediates C(5000,2) ≈ 12.5M wedges; the
    // cap (34, the production DegCap) drops exactly those. Numbers land
    // in BASELINE.md's hub-skew ledger.
    {
      val hub = (1 to 5000).map(i => (0L, i.toLong))
      val path = (1 to 4999).map(i => (i.toLong, (i + 1).toLong))
      val und = hub.union(path).toDF("u", "v")
      val sym = und.union(und.select($"v", $"u"))
      val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
      val adj = sym.join(deg, "u")
        .join(deg.select($"u".as("v"), $"deg".as("ddeg")), "v")
        .select($"u".as("src"), $"v".as("dst"), $"deg", $"ddeg")
        .localCheckpoint()
      def wedges(cap: Option[Int]): Long =
        graft.operators.Graph.wedgeCommon(adj, cap)
          .agg(sum($"common")).collect()(0).getLong(0)
      val cap = graft.operators.Graph.DegCap
      println(s"hub-skew wedges uncapped=${wedges(None)} capped$cap=${wedges(Some(cap))}")
      best3("wedge enumeration: uncapped (5000-deg hub)") { wedges(None) }
      best3(s"wedge enumeration: capped at $cap") { wedges(Some(cap)) }
    }
    spark.stop()
  }
}
