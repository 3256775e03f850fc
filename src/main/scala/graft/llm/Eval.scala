package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Classifier-evaluation suite — the readouts a curation team runs before
  * trusting `llm_quality_classifier` to gate a 100 TB corpus: ROC AUC,
  * decile lift/gains, calibration (reliability + Brier), and the
  * threshold-sweep confusion table. The GOLD label is the hand-tuned
  * Gopher rule set (`llm_quality_gopher`'s keep bit) — "does the cheap
  * scan-speed classifier rank documents the way the expensive rule set
  * decides them?", the standard student-vs-teacher eval before swapping a
  * filter in the pipeline.
  *
  * Shared determinism device: every query consumes the SAME (doc_id,
  * p_e4, y) frame — the classifier score integerized to basis points
  * (p_keep is round(·,4), so round(p_keep·10⁴) is an exact BIGINT key in
  * both engines) and the 0/1 gold label. All four readouts are then
  * ratios of exact BIGINT counts; doubles appear only at final rounded
  * projections. The score DOMAIN is ≤ 10001 distinct basis-point values,
  * so every global ordered fold here runs over an aggregated bounded
  * domain, never corpus rows (PlanAudit rule 1 holds by construction).
  */
object Eval {

  /** The Gopher gold-label expression over raw document columns —
    * verbatim the four llm_quality_gopher keep conjuncts
    * (TextStats.qualityGopher), folded to one 0/1 column so the scored
    * frame is a single scan projection (no label join). */
  private def goldLabel: Column = {
    val toks = TF.tokens(col("text"))
    val nw = size(toks).cast("long")
    val mwl = (col("n_chars") - (nw - 1)).cast("double") / nw.cast("double")
    val alpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      nw.cast("double")
    val stops = size(filter(array(lit("the"), lit("a"), lit("of")),
      w => array_contains(toks, w)))
    when(nw >= 20 && nw <= 90 && mwl >= 3.8 && mwl <= 5.0 &&
      alpha >= 0.8 && stops >= 2, 1L).otherwise(0L)
  }

  /** One scan projection: (doc_id, p_e4, y). Shared by all four readouts
    * and the streaming calibration twin. */
  private[graft] def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextStats.classifierScores(Tables.documents(s, dir), Seq(goldLabel.as("y")))
      .select($"doc_id", round($"p_keep" * 10000).cast("long").as("p_e4"), $"y")
  }

  /** The DuckDB CTE chain ending in `sc(doc_id, p_e4, y)` — the oracle
    * twin of [[scored]], built on TextStats.classifierCtes plus the
    * Gopher label conjuncts verbatim. */
  private[graft] val scoredCtes: String =
    s"""${TextStats.classifierCtes},
       lab_t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w
                 FROM documents),
       lab_m AS (SELECT doc_id,
                        CAST(len(w) AS BIGINT) AS n_words,
                        CAST(n_chars - (len(w) - 1) AS DOUBLE) / len(w) AS mwl,
                        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                          AS DOUBLE) / len(w) AS alpha_ratio,
                        len(list_filter(['the','a','of'],
                          x -> list_contains(w, x))) AS stop_hits
                 FROM lab_t),
       lab AS (SELECT doc_id,
                      CASE WHEN n_words BETWEEN 20 AND 90
                            AND mwl >= 3.8 AND mwl <= 5.0
                            AND alpha_ratio >= 0.8 AND stop_hits >= 2
                           THEN 1 ELSE 0 END AS y
               FROM lab_m),
       sc AS (SELECT clf.doc_id,
                     CAST((round(p_keep * 10000) + 0.0) AS BIGINT) AS p_e4, y
              FROM clf JOIN lab ON clf.doc_id = lab.doc_id)"""

  /** Exact ROC AUC of the classifier against the Gopher gold label — the
    * one-number ranking-quality readout, computed EXACTLY (Mann–Whitney
    * form with the standard half-credit for score ties, the
    * agg_mannwhitney tie device): group docs by basis-point score, walk
    * the score domain once accumulating negatives-below, and
    * 2U = Σ pos·(2·neg_below + neg_tied); AUC = 2U / (2·P·N).
    *
    * Scale shape: one scan projection, one hash aggregate onto the
    * ≤ 10001-value score domain, one unpartitioned window over that
    * DOMAIN (PlanAudit-allowlisted), one 1-row readout. The 2U fold is
    * overflow-gated (P·N BIGINT products wrap past ~2.1e9 docs per
    * class under non-ANSI Spark where DuckDB raises). */
  val clfAuc: GraftQuery = GraftQuery(
    "llm_clf_auc",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wp = Window.orderBy($"p_e4").rowsBetween(Window.unboundedPreceding, -1)
      scored(s, dir)
        .groupBy($"p_e4")
        .agg(sum($"y").as("pos"), sum(lit(1L) - $"y").as("neg"))
        .withColumn("negbelow", coalesce(sum($"neg").over(wp), lit(0L)))
        .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
          GraftQuery.guarded(sum($"pos" * (lit(2L) * $"negbelow" + $"neg")),
            lit(2.0) * sum($"pos").cast("double") * sum($"neg").cast("double")
              < lit(9e18),
            "llm_clf_auc: 2U fold past BIGINT headroom (2*P*N >= 9e18) " +
              "— evaluate on a hash sample").as("u2"))
        .select($"n_pos", $"n_neg", $"u2",
          GraftQuery.guarded(
            round($"u2".cast("double")
              / (lit(2.0) * $"n_pos".cast("double") * $"n_neg".cast("double")), 6),
            $"n_pos" > 0L && $"n_neg" > 0L,
            "llm_clf_auc: AUC needs both classes present in the gold " +
              "label — check the label rule").as("auc"))
    },
    Some(s"""WITH $scoredCtes,
             g AS (SELECT p_e4, CAST(sum(y) AS BIGINT) AS pos,
                          CAST(sum(1 - y) AS BIGINT) AS neg
                   FROM sc GROUP BY 1),
             cw AS (SELECT pos, neg,
                           CAST(coalesce(sum(neg) OVER (ORDER BY p_e4
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                             0) AS BIGINT) AS negbelow
                    FROM g),
             a AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
                          CAST(sum(neg) AS BIGINT) AS n_neg,
                          CAST(sum(pos * (2 * negbelow + neg)) AS BIGINT) AS u2
                   FROM cw)
             SELECT n_pos, n_neg, u2,
                    (round(CAST(u2 AS DOUBLE)
                          / (2.0 * n_pos * n_neg), 6) + 0.0) AS auc
             FROM a""")
  )

  /** Decile lift/gains table — the business-facing companion to AUC
    * ("reading only the classifier's top 10% of docs captures X% of the
    * gold positives"): docs ranked by score descending, cut into
    * SQL-standard deciles via the exact ntile formula over the factored
    * twoLevelRank device (agg_rfm discipline — no ntile(), no one-task
    * sort over the corpus), then per-decile positive rate, cumulative
    * gain and lift as ratios of exact BIGINT counts.
    *
    * Ties break on doc_id so every rank is deterministic; requires
    * n ≥ 10 docs (guarded). The cumulative fold runs over the 10 DECILE
    * rows (PlanAudit-allowlisted). */
  val clfLift: GraftQuery = GraftQuery(
    "llm_clf_lift",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val sc = GraftQuery.cutStats(scored(s, dir))
      val tot = sc.agg(count(lit(1)).as("n"), sum($"y").as("n_pos_total"))
      val ranked = graft.operators.Windows.twoLevelRank(
        sc, Seq($"p_e4".desc, $"doc_id".asc), "r")
      val w = Window.orderBy($"decile").rowsBetween(Window.unboundedPreceding, 0)
      ranked.crossJoin(broadcast(tot))
        .withColumn("q", GraftQuery.guarded(expr("n div 10"), expr("n >= 10"),
          "llm_clf_lift: decile gains require n >= 10 docs — " +
            "evaluate on a larger slice"))
        .withColumn("m", expr("n % 10"))
        .withColumn("decile", expr(
          """CASE WHEN r <= (q + 1) * m THEN (r - 1) div (q + 1) + 1
                  ELSE m + (r - (q + 1) * m - 1) div q + 1 END"""))
        .groupBy($"decile", $"n", $"n_pos_total")
        .agg(count(lit(1)).as("n_docs"), sum($"y").as("n_pos"))
        .withColumn("cum_pos", sum($"n_pos").over(w))
        .select($"decile", $"n_docs", $"n_pos",
          round($"n_pos".cast("double") / $"n_docs".cast("double"), 6)
            .as("pos_rate"),
          round($"cum_pos".cast("double") / $"n_pos_total".cast("double"), 6)
            .as("cum_gain"),
          round($"n_pos".cast("double") * $"n".cast("double")
            / ($"n_docs".cast("double") * $"n_pos_total".cast("double")), 6)
            .as("lift"))
        .orderBy($"decile")
    },
    Some(s"""WITH $scoredCtes,
             t AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos_total
                   FROM sc),
             r AS (SELECT y, row_number() OVER (ORDER BY p_e4 DESC, doc_id ASC)
                            AS r,
                          t.n, t.n_pos_total, t.n // 10 AS q, t.n % 10 AS m
                   FROM sc CROSS JOIN t),
             d AS (SELECT y, n, n_pos_total,
                          CASE WHEN r <= (q + 1) * m THEN (r - 1) // (q + 1) + 1
                               ELSE m + (r - (q + 1) * m - 1) // q + 1 END
                            AS decile
                   FROM r),
             g AS (SELECT decile, n, n_pos_total, count(*) AS n_docs,
                          CAST(sum(y) AS BIGINT) AS n_pos
                   FROM d GROUP BY 1, 2, 3)
             SELECT decile, n_docs, n_pos,
                    (round(CAST(n_pos AS DOUBLE) / n_docs, 6) + 0.0) AS pos_rate,
                    (round(CAST(CAST(sum(n_pos) OVER (ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS DOUBLE) / n_pos_total, 6) + 0.0) AS cum_gain,
                    (round(CAST(n_pos AS DOUBLE) * n
                          / (CAST(n_docs AS DOUBLE) * n_pos_total), 6) + 0.0) AS lift
             FROM g ORDER BY decile""")
  )

  /** The shared calibration partial aggregates over a (bin, p_e4, y)
    * projection: n, Σp_e4, Σy, and the Brier numerator Σ(p_e4 − y·10⁴)²
    * — all exact BIGINT, exactly mergeable under any arrival split
    * (the stream_moments convention). The squared term is ≤ 10⁸, so the
    * Brier fold is gated on n < 9e10. */
  private[graft] def calibrationPartialAggs: Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(col("p_e4")).as("sp"),
    sum(col("y")).as("sy"),
    GraftQuery.guarded(
      sum((col("p_e4") - col("y") * lit(10000L))
        * (col("p_e4") - col("y") * lit(10000L))),
      count(lit(1)).cast("double") * lit(1e8) < lit(9e18),
      "llm_clf_calibration: Brier fold past BIGINT headroom (n >= 9e10) " +
        "— evaluate on a hash sample").as("sq"))

  /** The shared final projection over merged (bin, n, sp, sy, sq). */
  private[graft] def calibrationFold(merged: DataFrame): DataFrame = {
    val s = merged.sparkSession
    import s.implicits._
    merged.select($"bin", $"n".as("n_docs"),
      round($"sp".cast("double") / ($"n".cast("double") * lit(1e4)), 6)
        .as("mean_pred"),
      round($"sy".cast("double") / $"n".cast("double"), 6).as("frac_pos"),
      round($"sy".cast("double") / $"n".cast("double")
        - $"sp".cast("double") / ($"n".cast("double") * lit(1e4)), 6).as("gap"),
      round($"sq".cast("double") / ($"n".cast("double") * lit(1e8)), 6)
        .as("brier"))
      .orderBy($"bin")
  }

  /** Calibration / reliability table — 10 fixed score bins, each with the
    * mean predicted probability vs the empirical gold-positive rate (the
    * reliability-diagram rows), the gap, and the per-bin Brier score.
    * A classifier can rank perfectly (AUC 1.0) and still lie about
    * probabilities — this is the readout that catches it before anyone
    * thresholds on p_keep.
    *
    * All four statistics are exact BIGINT folds per bin (the score is
    * already basis-point integer; y·10⁴ makes the Brier term integer);
    * the bounded 10-bin domain makes this one map-side-combined hash
    * aggregate at any corpus size. */
  val clfCalibration: GraftQuery = GraftQuery(
    "llm_clf_calibration",
    (s, dir) => {
      import s.implicits._
      val binned = scored(s, dir)
        .withColumn("bin", least(floor($"p_e4" / lit(1000)), lit(9L)))
      val aggs = calibrationPartialAggs
      calibrationFold(binned.groupBy($"bin").agg(aggs.head, aggs.tail: _*))
    },
    Some(calibrationOracle)
  )

  /** The calibration oracle — shared verbatim with the streaming twin
    * (stream_clf_calibration): batching must not move one bin. */
  private[graft] lazy val calibrationOracle: String =
    s"""WITH $scoredCtes,
        b AS (SELECT least(CAST(floor(p_e4 / 1000) AS BIGINT), 9) AS bin,
                     p_e4, y
              FROM sc),
        g AS (SELECT bin, count(*) AS n,
                     CAST(sum(p_e4) AS BIGINT) AS sp,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum((p_e4 - y * 10000) * (p_e4 - y * 10000))
                       AS BIGINT) AS sq
              FROM b GROUP BY 1)
        SELECT bin, n AS n_docs,
               (round(CAST(sp AS DOUBLE) / (n * 1e4), 6) + 0.0) AS mean_pred,
               (round(CAST(sy AS DOUBLE) / n, 6) + 0.0) AS frac_pos,
               (round(CAST(sy AS DOUBLE) / n
                     - CAST(sp AS DOUBLE) / (n * 1e4), 6) + 0.0) AS gap,
               (round(CAST(sq AS DOUBLE) / (n * 1e8), 6) + 0.0) AS brier
        FROM g ORDER BY bin"""

  /** Threshold-sweep confusion table — TP/FP/FN/TN and
    * precision/recall/F1 at the 19 operating points 0.05 … 0.95, the
    * table a team reads to PICK the keep threshold (llm_curate's 0.5 is
    * one row of it).
    *
    * Scale shape — sweep the DOMAIN, not the corpus: docs aggregate once
    * onto the ≤ 10001-value basis-point score domain; the 19 thresholds
    * then explode over those domain rows (≤ 19·10001 rows total,
    * corpus-size-independent) and one bounded hash aggregate emits the
    * 19 operating points. A per-doc threshold explode would scan-amplify
    * the corpus 19× for identical output. */
  val clfConfusion: GraftQuery = GraftQuery(
    "llm_clf_confusion",
    (s, dir) => {
      import s.implicits._
      scored(s, dir)
        .groupBy($"p_e4")
        .agg(sum($"y").as("pos"), sum(lit(1L) - $"y").as("neg"))
        .withColumn("k", explode(expr("sequence(1, 19)")))
        .withColumn("thr_e4", $"k".cast("long") * lit(500L))
        .groupBy($"thr_e4")
        .agg(sum(when($"p_e4" >= $"thr_e4", $"pos").otherwise(0L)).as("tp"),
          sum(when($"p_e4" >= $"thr_e4", $"neg").otherwise(0L)).as("fp"),
          sum($"pos").as("p_total"), sum($"neg").as("n_total"))
        .select(round($"thr_e4".cast("double") / lit(1e4), 2).as("threshold"),
          $"tp", $"fp",
          ($"p_total" - $"tp").as("fn"), ($"n_total" - $"fp").as("tn"),
          when($"tp" + $"fp" > 0L,
            round($"tp".cast("double") / ($"tp" + $"fp").cast("double"), 6))
            .as("precision"),
          when($"p_total" > 0L,
            round($"tp".cast("double") / $"p_total".cast("double"), 6))
            .as("recall"),
          when($"tp" * 2L + $"fp" + $"p_total" - $"tp" > 0L,
            round(lit(2.0) * $"tp".cast("double")
              / (lit(2.0) * $"tp".cast("double") + $"fp".cast("double")
                + ($"p_total" - $"tp").cast("double")), 6)).as("f1"))
        .orderBy($"threshold")
    },
    Some(s"""WITH $scoredCtes,
             g AS (SELECT p_e4, CAST(sum(y) AS BIGINT) AS pos,
                          CAST(sum(1 - y) AS BIGINT) AS neg
                   FROM sc GROUP BY 1),
             x AS (SELECT p_e4, pos, neg, k * 500 AS thr_e4
                   FROM g, unnest(range(1, 20)) u(k)),
             a AS (SELECT thr_e4,
                          CAST(sum(CASE WHEN p_e4 >= thr_e4 THEN pos ELSE 0 END)
                            AS BIGINT) AS tp,
                          CAST(sum(CASE WHEN p_e4 >= thr_e4 THEN neg ELSE 0 END)
                            AS BIGINT) AS fp,
                          CAST(sum(pos) AS BIGINT) AS p_total,
                          CAST(sum(neg) AS BIGINT) AS n_total
                   FROM x GROUP BY 1)
             SELECT (round(thr_e4 / 1e4, 2) + 0.0) AS threshold,
                    tp, fp,
                    CAST(p_total - tp AS BIGINT) AS fn,
                    CAST(n_total - fp AS BIGINT) AS tn,
                    CASE WHEN tp + fp > 0
                         THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6)
                         END AS precision,
                    CASE WHEN p_total > 0
                         THEN round(CAST(tp AS DOUBLE) / p_total, 6)
                         END AS recall,
                    CASE WHEN tp * 2 + fp + p_total - tp > 0
                         THEN round(2.0 * tp
                              / (2.0 * tp + fp + (p_total - tp)), 6)
                         END AS f1
             FROM a ORDER BY threshold""")
  )

  def all: Seq[GraftQuery] = Seq(clfAuc, clfLift, clfCalibration, clfConfusion)
}
