package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-round changed-label counts for the LPA frontier sizing
  * decision (round-15). Not part of the driver contract. */
object DebugLpa {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val e = operators.Graph.adjacency(spark, dir).select($"src", $"dst")
    var labels = e.groupBy($"src").agg(count(lit(1)).as("deg"))
      .select($"src".as("v"), $"src".as("label")).localCheckpoint()
    val nV = labels.count()
    println(s"V=$nV E=${e.count()}")
    for (i <- 1 to 8) {
      val nl = operators.Graph.lpaRound(e, labels).localCheckpoint()
      val changed = nl.join(labels.withColumnRenamed("label", "old"), "v")
        .filter($"label" =!= $"old").count()
      println(s"round $i: changed=$changed")
      labels = nl
    }
    spark.stop()
  }
}
