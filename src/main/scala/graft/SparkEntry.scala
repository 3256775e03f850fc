package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-family operator registries under
  * `graft.operators`, `graft.llm` and `graft.streaming`; each entry pairs an
  * idiomatic Spark pipeline with a DuckDB oracle (where SQL-expressible).
  */
object SparkEntry {

  /** All graded capabilities, one GraftQuery per SURVEY.md §2b row. */
  def registry: Seq[GraftQuery] =
    operators.Relational.all ++
    operators.Joins.all ++
    operators.Aggregates.all ++
    operators.Analytics.all ++
    operators.Windows.all ++
    operators.TimeSeries.all ++
    operators.Graph.all ++
    functions.ScalarQueries.all ++
    operators.Ingest.all ++
    streaming.StreamQueries.all ++
    streaming.CorpusStream.all ++
    streaming.DedupStream.all ++
    streaming.ResampleStream.all ++
    streaming.CdcStream.all ++
    streaming.DriftStream.all ++
    streaming.ServeStream.all ++
    llm.Dedup.all ++
    llm.Similarity.all ++
    llm.TextStats.all ++
    llm.Eval.all ++
    llm.Corpus.all ++
    llm.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.toQueryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraftQuery.toOracleMap(registry)
}
