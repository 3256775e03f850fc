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
  * llm_sim_topk_ivf_persisted exactly (asserted in StreamingSpec; ANN
  * family = no DuckDB oracle).
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
      val queries = Tables.embeddings(s, dir)
        .filter($"vec_id" < Similarity.NumQueries)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val waves = (0 until 3).map { w =>
        Similarity.serveIvf(s, dir, queries.filter(pmod($"qid", lit(3)) === w))
      }
      waves.reduce(_ union _).orderBy($"qid", $"rn")
    },
    None
  )

  def all: Seq[GraftQuery] = Seq(streamIvfServe)
}
