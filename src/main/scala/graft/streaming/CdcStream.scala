package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.operators.Ingest
import graft.sources.Tables

/** Streaming CDC compaction — `ingest_cdc`'s last-writer-wins
  * materialization as an arrival-graded incremental pipeline (the
  * stream_resample pattern applied to state compaction).
  *
  * The production shape: each micro-batch of the change log compacts to
  * per-key PARTIALS — (last_del, last_value, last_seq, n_changes) via the
  * same fixed-width max_by folds the batch form uses — and appends them to
  * a partials sink; serving re-runs the identical folds over the partials
  * (argmax-by-seq is associative: the winner of winners IS the global
  * winner) and applies the tombstone filter only at serve time. A key
  * deleted in wave 1 and re-inserted in wave 3 correctly resurfaces, and a
  * key whose last change is a tombstone stays compacted-away — which is
  * why partials must carry the tombstone FLAG, never pre-filter it.
  * Every recurring cost is O(batch); prior log segments are never
  * re-scanned. This is the foreachBatch form of a MERGE INTO-maintained
  * mirror table, without the read-modify-write.
  *
  * The graded form batch-emulates three arrival waves as contiguous seq
  * ranges (arrival order IS offset order — the ingest_incremental
  * watermark contract). Merging must not change one row, so the oracle is
  * ingest_cdc's verbatim.
  */
object CdcStream {

  private val Waves = 3

  val streamCdc: GraftQuery = GraftQuery(
    "stream_cdc",
    (s, dir) => {
      import s.implicits._
      val log = Tables.events(s, dir).select(
        pmod($"event_id", lit(1000L)).as("k"),
        $"event_id".as("seq"),
        when(pmod($"event_id", lit(7L)) === 0, 1).otherwise(0).as("del"),
        $"value")
      val bounds = log.agg(min($"seq").as("lo"), max($"seq").as("hi")).localCheckpoint()
      def edge(k: Int): Column =
        $"lo" - 1 + floor(($"hi" - $"lo" + 1) * lit(k) / lit(Waves.toDouble)).cast("long")
      val partials = (0 until Waves).map { k =>
        log.join(broadcast(bounds), $"seq" > edge(k) && $"seq" <= edge(k + 1))
          .groupBy($"k")
          .agg(max_by($"del", $"seq").as("last_del"),
            max_by($"value", $"seq").as("last_value"),
            max($"seq").as("last_seq"),
            count(lit(1)).as("n_changes"))
          // One DAG per micro-batch, appended to the partials sink — the
          // eager per-wave execution the true streaming form pays.
          .localCheckpoint()
      }
      partials.reduce(_.unionAll(_))
        .groupBy($"k")
        .agg(max_by($"last_del", $"last_seq").as("last_del"),
          max_by($"last_value", $"last_seq").as("last_value"),
          max($"last_seq").as("last_seq"),
          sum($"n_changes").as("n_changes"))
        .filter($"last_del" === 0)
        .select($"k", round($"last_value", 4).as("value"),
          $"last_seq", $"n_changes")
        .orderBy($"k")
    },
    // Batching must not change one row: the oracle is the batch compaction.
    Ingest.ingestCdc.oracle
  )

  def all: Seq[GraftQuery] = Seq(streamCdc)
}
