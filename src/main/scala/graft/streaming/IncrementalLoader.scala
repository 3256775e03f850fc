package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Checkpointed incremental loader — the Structured Streaming form of the
  * reference's consume-from-watermark-then-commit loop (SURVEY.md §2a
  * R2/R3).
  *
  * Reference semantics reproduced:
  *  - "run once, consume everything new, stop" → `Trigger.AvailableNow()`;
  *  - ZK offset commit after sink success → the checkpoint's offset/commit
  *    logs (a batch's offsets are committed only after its files land);
  *  - partitioned multi-file output with codec → `partitionBy` + codec
  *    option on the file sink;
  *  - offset-reset-to-earliest bootstrap → an empty checkpoint directory.
  *
  * Scale notes: the file source lists only unseen files per trigger
  * (`maxFilesPerTrigger` bounds micro-batch size); state is the file list
  * in the checkpoint, not data. The transform below is map-only — the
  * whole pipeline is shuffle-free, like the reference's zero-reducer job.
  */
object IncrementalLoader {

  /** One incremental run: consume all files not yet committed to the
    * checkpoint, write them to the partitioned sink, commit, stop.
    * Returns the number of micro-batches executed in this run. */
  def runOnce(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 4,
      codec: String = "snappy"): Long = {
    val in = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val bucketed = in.withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
    val q = bucketed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("compression", codec)
      .partitionBy("event_type", "d")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.length.toLong
    progress
  }

  /** Read back everything the loader has landed so far. */
  def loaded(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
