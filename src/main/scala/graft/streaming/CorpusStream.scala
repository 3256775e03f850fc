package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.llm.Corpus
import graft.sources.Tables

/** Streaming corpus curation — benchmark-contamination detection as an
  * incremental foreachBatch pipeline (SURVEY.md §2b `stream_contamination`;
  * the round-2/3 "streaming graded forms of the corpus family" backlog).
  *
  * The production shape: the benchmark gram set is STATIC (the eval suite
  * is fixed and tiny next to the corpus), so contamination is per-document
  * against a broadcast side — embarrassingly incremental. New documents
  * stream in via the checkpointed incremental loader (IncrementalLoader);
  * each micro-batch is gram-hashed, joined against the broadcast benchmark
  * set, and its per-doc counts appended to the sink. No state crosses
  * micro-batches, so results are exactly the batch query's, independent of
  * how arrivals were batched — which is what the graded form exploits: it
  * runs the SAME per-batch increment over a deterministic 3-way split and
  * must reproduce `llm_contamination`'s oracle bit-for-bit.
  *
  * Scale shape per micro-batch: gram hashing is a scan projection (native
  * SortedHashedShingles — no strings), the bench join is a broadcast hash
  * join (bench set ~KBs–MBs), and the per-doc count is a map-side-partial
  * hash aggregate keyed by doc_id. The corpus side is never shuffled on
  * gram hash; the only exchange is the doc_id aggregate of the already
  * bench-filtered (tiny) match set. StreamingSpec drives the real
  * file-source + checkpoint + foreachBatch form over two arrival waves and
  * shows no micro-batch is reprocessed on resume.
  */
object CorpusStream {

  /** The static benchmark side: distinct hashed 8-grams of the eval docs.
    * Computed once per pipeline (in production: once per benchmark
    * release) and broadcast into every micro-batch's join. */
  def benchGrams(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    Corpus.gramSigs(s, docs.filter($"doc_id" % Corpus.BenchMod === Corpus.BenchRem))
      .select(explode($"ghs").as("gh"))
      .distinct()
  }

  /** The foreachBatch increment: contamination counts for one micro-batch
    * of newly-arrived docs. Pure per-document against the static bench
    * set — no cross-batch state, so union-of-batches == whole-corpus. Docs
    * that ARE benchmark members are excluded (they'd trivially self-match).
    * SortedHashedShingles dedups within a doc, so (doc_id, gh) rows are
    * already unique — no distinct, the batch side never shuffles pre-join. */
  def contaminationBatch(s: SparkSession, batch: DataFrame,
                         bench: DataFrame): DataFrame = {
    import s.implicits._
    Corpus.gramSigs(s, batch.filter($"doc_id" % Corpus.BenchMod =!= Corpus.BenchRem))
      .select($"doc_id", explode($"ghs").as("gh"))
      .join(broadcast(bench), "gh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Graded form: the incremental pipeline batch-emulated over a
    * deterministic 3-way arrival split (pmod(doc_id, 3) — the same
    * batch-independence argument StreamQueries uses for its windowed
    * forms). Oracle = llm_contamination's: batching must not change one
    * count. */
  val streamContamination: GraftQuery = GraftQuery(
    "stream_contamination",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val bench = benchGrams(s, docs).cache()
      (0 until 3)
        .map(b => contaminationBatch(s, docs.filter(pmod($"doc_id", lit(3)) === b), bench))
        .reduce(_.unionAll(_))
        .orderBy($"doc_id")
    },
    Some(s"""WITH grams AS (
               SELECT doc_id,
                      list_distinct(list_transform(range(1, greatest(len(w) - ${Corpus.ContamN - 2}, 1)),
                        i -> array_to_string(w[i:i+${Corpus.ContamN - 1}], ' '))) AS g
               FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
             bench AS (
               SELECT DISTINCT gu.x AS g FROM grams, unnest(g) AS gu(x)
               WHERE doc_id % ${Corpus.BenchMod} = ${Corpus.BenchRem}),
             corpus AS (
               SELECT DISTINCT doc_id, gu.x AS g FROM grams, unnest(g) AS gu(x)
               WHERE doc_id % ${Corpus.BenchMod} != ${Corpus.BenchRem})
             SELECT c.doc_id, count(*) AS n_shared
             FROM corpus c JOIN bench b ON c.g = b.g
             GROUP BY c.doc_id ORDER BY c.doc_id""")
  )

  /** The foreachBatch increment for LM quality scoring: one micro-batch
    * of newly-arrived docs scored against the FROZEN persisted bigram LM
    * (Corpus.lmModel — trained once on the reference slice, re-read per
    * batch). Pure per-document against static model state, so
    * union-of-batches == whole-corpus, independent of arrival batching —
    * the same argument as contaminationBatch. Recurring cost is O(batch)
    * bigrams through two LM-keyed joins; nothing corpus-sized recomputes. */
  def perplexityBatch(s: SparkSession, batch: DataFrame,
                      lm: Corpus.LmModel): DataFrame =
    Corpus.scoreBigrams(s, Corpus.docBigrams(s, batch), lm)

  /** Graded form: the scoring increment batch-emulated over the
    * deterministic 3-way arrival split, against the one persisted LM.
    * Oracle = llm_perplexity's, verbatim: batching must not change one
    * score (the CCNet production shape — the crawl streams through a
    * frozen model). */
  val streamPerplexity: GraftQuery = GraftQuery(
    "stream_perplexity",
    (s, dir) => {
      import s.implicits._
      val lm = Corpus.lmModel(s, dir)
      val docs = Tables.documents(s, dir)
      (0 until 3)
        .map(b => perplexityBatch(s, docs.filter(pmod($"doc_id", lit(3)) === b), lm)
          // One eagerly-executed DAG per emulated micro-batch (the true
          // streaming execution shape) instead of a 3-batch mega-plan that
          // re-derives the LM roll-ups three times in one first execution
          // — the stream_dedup_incremental convention.
          .localCheckpoint())
        .reduce(_.unionAll(_))
        .orderBy($"doc_id")
    },
    Some(Corpus.pplOracle)
  )

  /** Streaming quality classification: the linear classifier is a pure
    * per-document projection (no model state beyond frozen weights, no
    * cross-batch state at all), so the streaming form is the theoretical
    * best case for incremental curation — each micro-batch runs the
    * SHARED classifier projection (TextStats.classifierScores) at scan
    * speed and appends. Graded over the deterministic 3-way arrival
    * split against llm_quality_classifier's oracle verbatim: batching
    * must not change one score. */
  val streamQuality: GraftQuery = GraftQuery(
    "stream_quality",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      (0 until 3)
        .map(b => graft.llm.TextStats.classifierScores(
          docs.filter(pmod($"doc_id", lit(3)) === b)))
        .reduce(_.unionAll(_))
        .orderBy($"doc_id")
    },
    Some(graft.llm.TextStats.classifierOracle)
  )

  /** END-TO-END STREAMING CURATION — the engine's capstone composition:
    * the full seven-signal curate pipeline run as a per-batch increment.
    * Every conjunct is either per-doc pure (repetition, quality score,
    * classifier — computed OVER the batch by the shared curateBatch) or
    * a join against frozen per-dataset state (the broadcast
    * contaminated-id layout, the frozen bigram LM the batch scores
    * against, the persisted cluster labels, and the keeper table
    * materialized once before the stream) — so union-of-batches equals
    * the whole-corpus answer exactly, and the recurring cost is
    * O(batch) through doc_id-keyed joins. Graded over the deterministic
    * 3-way arrival split against llm_curate's composed oracle verbatim:
    * batching must not change one kept row. */
  /** The per-wave curated keep frames (frozen LM / keeper state, one
    * eagerly-executed DAG per emulated micro-batch) — shared by
    * stream_curate and stream_train_manifest so the two twins cannot
    * drift on what a wave keeps. */
  private def curateWaves(s: SparkSession, dir: String): Seq[DataFrame] =
    // Session memo (r15): stream_curate AND stream_train_manifest
    // consume these identical waves; each wave lands once per session
    // (the production shape) instead of once per consuming query.
    graft.SessionMemo.frames(s, s"curateWaves|$dir") {
      curateWavesBuild(s, dir)
    }

  /** `checkpoint = false` is the plan-audit form (ADVICE r15): identical
    * construction with every eager localCheckpoint elided, so the plan
    * gates see the real per-wave pipeline instead of checkpoint scans. */
  private def curateWavesBuild(s: SparkSession, dir: String,
                               checkpoint: Boolean = true): Seq[DataFrame] = {
    import s.implicits._
    def cut(df: DataFrame): DataFrame =
      if (checkpoint) df.localCheckpoint() else df
    val docs = Tables.documents(s, dir)
    val lm = Corpus.lmModel(s, dir)
    // Frozen once per stream, like the LM: the keeper table needs
    // whole-cluster context, so it is a per-dataset artifact, not a
    // per-batch computation.
    val keepers = cut(graft.llm.Dedup.clusterKeepers(s, dir))
    (0 until 3).map { b =>
      val batch = docs.filter(pmod($"doc_id", lit(3)) === b)
      // One eagerly-executed DAG per emulated micro-batch (the
      // stream_dedup_incremental convention).
      cut(Corpus.curateBatch(s, dir, batch,
        Corpus.scoreBigrams(s, Corpus.docBigrams(s, batch), lm), keepers))
    }
  }

  val streamCurate: GraftQuery = GraftQuery(
    "stream_curate",
    (s, dir) => {
      import s.implicits._
      curateWaves(s, dir).reduce(_.unionAll(_)).orderBy($"doc_id")
    },
    Some(Corpus.curateOracle),
    // Plan gates audit the un-checkpointed per-wave pipelines (ADVICE
    // r15): the served plan is a union of SessionMemo checkpoint scans.
    auditPlans = Some((s, dir) => curateWavesBuild(s, dir, checkpoint = false))
  )

  /** Streaming twin of `llm_train_manifest` — the manifest maintained as
    * the curated stream lands: each wave reduces its kept docs to
    * (split, shard) cell PARTIALS — doc count, token count, XOR digest —
    * and the merge is sums + XOR (both exactly mergeable; XOR is closed
    * on 64 bits with no ordering hazard), so the served manifest is
    * bit-equal to the batch manifest under any arrival split. This is
    * the live replication handshake: a downstream trainer diffs its
    * shard digests against this table without anyone rescanning the
    * corpus. Shares curateWaves with stream_curate (the twins cannot
    * drift on what a wave keeps) and the batch oracle verbatim. */
  /** One micro-batch's manifest cell partials: kept docs → (split,
    * shard) doc/token counts + XOR digest — the append-only delta a
    * foreachBatch drive writes per batch (StreamingSpec runs exactly
    * that with a checkpoint + kill/restart leg). */
  private[graft] def manifestPartials(kept: DataFrame,
                                      tokens: DataFrame): DataFrame = {
    val s = kept.sparkSession
    import s.implicits._
    kept.select($"doc_id")
      .join(tokens.hint("shuffle_hash"), "doc_id")
      .withColumn("split",
        when(pmod($"doc_id", lit(100)) < 95, "train").otherwise("val"))
      .withColumn("shard", pmod($"doc_id", lit(8)))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .groupBy($"split", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"),
        expr("bit_xor(h)").as("content_digest"))
  }

  val streamTrainManifest: GraftQuery = GraftQuery(
    "stream_train_manifest",
    (s, dir) => {
      import s.implicits._
      val tokens = Tables.documents(s, dir)
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens"))
      curateWaves(s, dir)
        .map(kept => manifestPartials(kept, tokens))
        .reduce(_.unionAll(_))
        .groupBy($"split", $"shard") // wave merge: sums + XOR of partials
        .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
          expr("bit_xor(content_digest)").as("content_digest"))
        .orderBy($"split", $"shard")
    },
    // Exactly-mergeable partials: batching cannot move a count or flip a
    // digest bit — the oracle is the batch manifest's, verbatim.
    Corpus.trainManifest.oracle,
    // Plan gates audit the manifest merge OVER the un-checkpointed wave
    // pipelines (ADVICE r15) — the full kept→partials→merge plan.
    auditPlans = Some((s, dir) => {
      import s.implicits._
      val tokens = Tables.documents(s, dir)
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens"))
      Seq(curateWavesBuild(s, dir, checkpoint = false)
        .map(kept => manifestPartials(kept, tokens))
        .reduce(_.unionAll(_))
        .groupBy($"split", $"shard")
        .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
          expr("bit_xor(content_digest)").as("content_digest")))
    })
  )

  /** Streaming source-quality monitor — the micro-batch twin of
    * `llm_quality_ci`: each wave appends one (source, n, k) row of
    * integer pass-count partials (the per-doc score is batch-pure, so
    * partials are exact at any arrival split), the merge sums them per
    * source, and the shared Wilson fold emits the identical intervals
    * and significance flags. This is the live form of the throttling
    * decision: "did src7's dip become significant as today's docs
    * landed?" — recomputed per wave from source-domain-sized state,
    * never re-scoring old documents. Oracle = the batch twin's,
    * verbatim. */
  val streamQualityCi: GraftQuery = GraftQuery(
    "stream_quality_ci",
    (s, dir) => {
      import s.implicits._
      val rows = graft.llm.TextStats.qualityPassRows(s, dir)
      val partials = (0 until 3).map { k =>
        rows.filter(pmod($"doc_id", lit(3)) === k)
          .groupBy($"source")
          .agg(count(lit(1)).as("n"), sum($"pass").as("k"))
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"source").agg(sum($"n").as("n"), sum($"k").as("k"))
        .localCheckpoint() // read by the fold and the global rate
      val global = merged.agg(
        (sum($"k").cast("double") / sum($"n").cast("double")).as("g"))
      graft.llm.TextStats.wilsonFold(merged, global)
    },
    // Batching must not move an interval or a flag: the oracle is the
    // batch Wilson monitor's, verbatim.
    graft.llm.TextStats.qualityCi.oracle
  )

  /** Streaming co-occurrence maintenance — the micro-batch twin of
    * `llm_cooccurrence`: skip-gram pairs never cross documents, so each
    * wave's per-pair integer counts are exact partials under ANY arrival
    * split, and the serve step merges them by plain addition (the
    * qsketch convention — no estimator subtlety, BIT-equal to the
    * one-pass batch cube). This is how the word2vec/GloVe input table
    * stays current as a corpus lands: per-wave cost is O(batch tokens),
    * merged state is the vocab²-bounded pair table, and old documents
    * are never re-tokenized. Graded over the deterministic 3-way doc_id
    * split against the batch oracle verbatim. */
  val streamCooccurrence: GraftQuery = GraftQuery(
    "stream_cooccurrence",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val mergedFwd = (0 until 3).map { b =>
        graft.llm.TextStats.skipgramPairsOf(
            docs.filter(pmod($"doc_id", lit(3)) === b))
          .groupBy($"c", $"x").agg(count(lit(1)).as("n"))
      }.reduce(_.unionAll(_))
        .groupBy($"c", $"x").agg(sum($"n").as("n")) // wave merge: addition
      // Serve-time symmetrization on the merged vocab²-bounded state —
      // commutes with the wave merge, so still bit-equal to batch.
      graft.llm.TextStats.symmetrize(mergedFwd)
        .orderBy($"n".desc, $"c", $"x")
        .limit(100)
        .select($"c".as("center"), $"x".as("context"), $"n")
    },
    // Exact-integer merge: batching cannot move any output row — the
    // oracle is the batch pair table's, verbatim.
    graft.llm.TextStats.cooccurrence.oracle
  )

  /** Streaming calibration monitor — the micro-batch twin of
    * `llm_clf_calibration`: per-bin (n, Σp_e4, Σy, Σ(p−y·10⁴)²) are
    * exact BIGINT partials over the fixed 10-bin domain, exactly
    * mergeable under ANY arrival split (the stream_moments convention;
    * the Brier guard bound is count-based, so the merged fold re-gates
    * on the merged n). This is how a curation pipeline watches its
    * classifier drift out of calibration as a corpus lands — per-wave
    * cost is one scan projection + a 10-row aggregate, merged state is
    * 10 rows of 4 integers, and no document is ever re-scored. Graded
    * over the deterministic 3-way doc_id split against the batch oracle
    * verbatim. */
  val streamClfCalibration: GraftQuery = GraftQuery(
    "stream_clf_calibration",
    (s, dir) => {
      import s.implicits._
      val binned = graft.llm.Eval.scored(s, dir)
        .withColumn("bin", least(floor($"p_e4" / lit(1000)), lit(9L)))
      val aggs = graft.llm.Eval.calibrationPartialAggs
      val partials = (0 until 3).map { k =>
        binned.filter(pmod($"doc_id", lit(3)) === k)
          .groupBy($"bin").agg(aggs.head, aggs.tail: _*)
          .localCheckpoint()
      }
      val merged = partials.reduce(_.unionAll(_))
        .groupBy($"bin")
        .agg(sum($"n").as("n"), sum($"sp").as("sp"), sum($"sy").as("sy"),
          GraftQuery.guarded(sum($"sq"),
            sum($"n").cast("double") * lit(1e8) < lit(9e18),
            "stream_clf_calibration: merged Brier fold past BIGINT " +
              "headroom (n >= 9e10) — evaluate on a hash sample").as("sq"))
      graft.llm.Eval.calibrationFold(merged)
    },
    // Batching must not move one reliability bin: the oracle is the
    // batch calibration table's, verbatim.
    Some(graft.llm.Eval.calibrationOracle)
  )

  /** Streaming weighted-reservoir maintenance — the micro-batch twin of
    * `llm_sample_reservoir`, and the op whose STATE is the reservoir
    * itself (the textbook reason reservoirs exist: sampling a stream
    * without storing it): each wave folds its docs into per-lang
    * bounded reservoirs (functions.ReservoirTopK — ≤ k (priority, id)
    * pairs per lang), and the serve step re-merges the wave reservoirs
    * through the SAME associative aggregate. Reservoir-of-union ==
    * merge-of-reservoirs (the merge law NewOps16Spec pins), and
    * priorities are deterministic md5-derived doubles, so the served
    * sample is bit-equal to the batch sample at any arrival split —
    * oracle verbatim. State per wave: langs × k pairs, regardless of
    * how many documents the wave carried. */
  val streamSampleReservoir: GraftQuery = GraftQuery(
    "stream_sample_reservoir",
    (s, dir) => {
      import s.implicits._
      val res = udaf(new graft.functions.ReservoirTopK(20))
      val h = expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS DOUBLE)")
      val pr = Tables.documents(s, dir)
        .select($"lang", $"doc_id",
          ($"n_chars" * lit(1152921504606846976L).cast("double") / h).as("p"))
      val partials = (0 until 3).map { k =>
        pr.filter(pmod($"doc_id", lit(3)) === k)
          .groupBy($"lang")
          .agg(res($"p", $"doc_id").as("r"))
          .localCheckpoint()
      }
      partials.reduce(_.unionAll(_))
        .select($"lang", explode($"r").as("e"))
        .groupBy($"lang")
        .agg(res($"e._1", $"e._2").as("r"))
        .select($"lang", explode($"r").as("e"))
        .select($"lang", $"e._2".as("doc_id"),
          graft.GraftQuery.roundNorm($"e._1", 4).as("priority"))
        .orderBy($"lang", $"priority".desc, $"doc_id")
    },
    // Merging wave reservoirs cannot change one kept doc: the oracle is
    // the batch reservoir's, verbatim.
    graft.llm.TextStats.sampleReservoir.oracle
  )

  def all: Seq[GraftQuery] =
    Seq(streamContamination, streamPerplexity, streamQuality, streamCurate,
      streamQualityCi, streamCooccurrence, streamTrainManifest,
      streamClfCalibration, streamSampleReservoir)
}
