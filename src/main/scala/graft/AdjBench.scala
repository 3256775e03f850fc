package graft

import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic (the MicroBench/TimeQuery family): INTERLEAVED
  * A/B timing for the r17 adjudications. This box carries external
  * ambient load bursts with a ~minutes period (BASELINE.md quiet-bench
  * protocol), so sequential per-variant timing attributes a burst to
  * whichever arm it lands on; running the arms round-robin in ONE
  * session makes a burst hit all arms roughly equally, and min-of-reps
  * absorbs the rest. /proc/loadavg is printed per rep so a contaminated
  * rep is adjudicable from the output alone.
  *
  * Run: `tools/run_class.sh graft.AdjBench <sfDir> <hits|reach> [reps]`.
  */
object AdjBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "hits"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ")(0)
      catch { case _: Throwable => "-1" }
    val arms: Seq[(String, () => Unit)] = what match {
      case "hits" => Seq(
        "hits-half1" -> (() => { operators.Graph.hitsPipeline(spark, dir, 1).count(); () }),
        "hits-half2" -> (() => { operators.Graph.hitsPipeline(spark, dir, 2).count(); () }),
        "hits-half4" -> (() => { operators.Graph.hitsPipeline(spark, dir, 4).count(); () }))
      case "reach" => Seq(
        "reach-every8" -> (() => {
          operators.Graph.ReachConsolidateEvery = 8
          SparkEntry.queries("graph_scc_fwbw")(spark, dir).count()
          SparkEntry.queries("graph_scc_fwbw_full")(spark, dir).count(); () }),
        "reach-every4" -> (() => {
          operators.Graph.ReachConsolidateEvery = 4
          SparkEntry.queries("graph_scc_fwbw")(spark, dir).count()
          SparkEntry.queries("graph_scc_fwbw_full")(spark, dir).count(); () }))
      case "probe" => Seq(
        "probe-observe" -> (() => {
          GraftQuery.ObserveProbes = true
          SparkEntry.queries("graph_scc_fwbw")(spark, dir).count()
          SparkEntry.queries("graph_scc_fwbw_full")(spark, dir).count(); () }),
        "probe-aggjob" -> (() => {
          GraftQuery.ObserveProbes = false
          SparkEntry.queries("graph_scc_fwbw")(spark, dir).count()
          SparkEntry.queries("graph_scc_fwbw_full")(spark, dir).count(); () }))
      case "dedup" => Seq(
        "dedup-ckpt" -> (() => {
          streaming.DedupStream.BatchShCheckpoint = true
          SparkEntry.queries("stream_dedup_incremental")(spark, dir).count(); () }),
        "dedup-cache" -> (() => {
          streaming.DedupStream.BatchShCheckpoint = false
          SparkEntry.queries("stream_dedup_incremental")(spark, dir).count(); () }))
      case other => sys.error(s"unknown adjudication '$other'")
    }
    // One untimed pass pays layout/codegen/catalog warmup for every arm.
    arms.foreach { case (_, f) => f() }
    val results = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    for (r <- 1 to reps; (n, f) <- arms) {
      val l0 = load()
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$n rep $r: $dt%6.2f s  (load $l0 -> ${load()})")
      results(n) = dt :: results.getOrElse(n, Nil)
    }
    results.foreach { case (n, ts) =>
      println(f"$n%-14s min=${ts.min}%6.2f  samples=${ts.reverse.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
