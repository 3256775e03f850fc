package graft

import org.apache.spark.sql.SparkSession

/** Repeated-timing harness for individual registered queries — for
  * separating environmental variance from real plan cost (BASELINE.md
  * "spike protocol"). Prints per-iteration seconds within one session.
  * Usage: run_class.sh graft.TimeQuery <sfDir> <iters> <queryName ...>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to iters; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$n iter $i%d: $dt%.2f s")
    }
    spark.stop()
  }
}
