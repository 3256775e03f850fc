package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{ConcurrentHashMap, ExecutionException, FutureTask}

/** Session-scoped memo of SHARED, already-materialized sub-frames — the
  * in-memory analog of the persisted bucketed layouts (`llm.Layouts`):
  * when two graded queries consume the identical intermediate (the
  * curate waves shared by stream_curate/stream_train_manifest, the
  * incremental pair set shared by llm_dedup_incremental/
  * llm_dedup_cluster_incremental), the first caller builds and
  * localCheckpoints it once per session and every later caller reads
  * the checkpoint — exactly how the production streaming form executes
  * (each wave lands ONCE; every consumer reads the materialized wave
  * output; recomputing per consumer was an artifact of the batch
  * emulation).
  *
  * Contract: `build` must return frames that are ALREADY executed and
  * lineage-cut (localCheckpoint) — the memo stores, it does not
  * materialize. Entries are O(queries × dirs) per session.
  *
  * Lifecycle (ADVICE r15): the outer map is a WeakHashMap keyed by the
  * SparkSession OBJECT — when a session becomes unreachable its entry
  * (and the checkpointed frames it holds) becomes collectable, and a
  * recycled identityHashCode can never alias a dead session's
  * checkpoints because the key is the live object itself, not a
  * derived string.
  *
  * Concurrency (ADVICE r15): builds memoize a FutureTask installed via
  * putIfAbsent and RUN OUTSIDE any map lock — two threads building
  * different keys never serialize on a hash bin, and a re-entrant
  * frame()/frames() call from inside a build function (a memoized
  * operator composed into another) recurses safely instead of
  * throwing IllegalStateException out of computeIfAbsent. A failed
  * build is evicted before the error propagates, so later callers
  * retry instead of replaying a poisoned entry.
  */
object SessionMemo {
  private val memo =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, FutureTask[Seq[DataFrame]]]]()

  private def tableFor(s: SparkSession): ConcurrentHashMap[String, FutureTask[Seq[DataFrame]]] =
    memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = new ConcurrentHashMap[String, FutureTask[Seq[DataFrame]]]()
        memo.put(s, m)
      }
      m
    }

  def frames(s: SparkSession, key: String)
            (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val table = tableFor(s)
    val task = new FutureTask[Seq[DataFrame]](() => build)
    val prior = table.putIfAbsent(key, task)
    val winner = if (prior == null) { task.run(); task } else prior
    try winner.get()
    catch {
      case e: ExecutionException =>
        table.remove(key, winner)
        throw e.getCause
    }
  }

  def frame(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    frames(s, key)(Seq(build)).head
}
