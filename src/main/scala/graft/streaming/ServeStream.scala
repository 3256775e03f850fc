package graft.streaming

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.llm.Similarity
import graft.sources.Tables

/** Streaming ANN serving — query vectors arrive in micro-batches and each
  * batch is answered against the PERSISTED IVF index (SURVEY.md §2b
  * `stream_ivf_serve`).
  *
  * This is the deployment shape of every vector index: the index is a
  * frozen per-dataset artifact (built once, maintained by
  * llm_sim_index_append), and query traffic streams against it. Serving is
  * pure per-query — no cross-query or cross-batch state — so the union of
  * per-batch answers equals the one-shot batch answer ROW FOR ROW, no
  * matter how arrivals were batched. That independence is the graded
  * property: the emulated 3-way arrival split (pmod(qid, 3), the
  * stream_contamination convention) must reproduce
  * llm_sim_topk_ivf_persisted exactly (asserted in StreamingSpec), and —
  * since round 10 — both grade against the same planted-twin closed-form
  * DuckDB oracle: the query batch is the exact-direction twins, whose
  * rank-1 answer is their source at cosine exactly 1.0 under any
  * codebook (see Similarity.ivfPersistedTopK).
  *
  * Scale shape per micro-batch: the batch's probes broadcast with their
  * cid-group keys, the partitioned index scan DYNAMICALLY PRUNES to the
  * touched groups (the DPP property the one-shot form plan-asserts), and
  * the per-query top-K windows over probed lists only. Batch size dials
  * probe fan-in against scan amortization — bigger batches touch more
  * groups per scan but prune less; the index never rebuilds either way.
  */
object ServeStream {

  val streamIvfServe: GraftQuery = GraftQuery(
    "stream_ivf_serve",
    (s, dir) => {
      import s.implicits._
      val queries = Similarity.twinQueries(s, dir)
      val waves = (0 until 3).map { w =>
        Similarity.serveIvf(s, dir, queries.filter(pmod($"qid", lit(3)) === w))
      }
      waves.reduce(_ union _).filter($"rn" === 1).orderBy($"qid")
    },
    Some(s"""SELECT vec_id + ${Similarity.TwinOffset} AS qid, 1 AS rn,
                    vec_id AS nid, CAST(1.0 AS DOUBLE) AS sim
             FROM embeddings WHERE vec_id % 20 = 7 ORDER BY qid""")
  )

  def all: Seq[GraftQuery] = Seq(streamIvfServe)
}
