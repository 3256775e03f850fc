package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Dev-only diagnostic (the MicroBench/Diag family): Spark job / stage /
  * task counts per query via a listener — the LOAD-INDEPENDENT metric
  * for comparing iterative-algorithm shapes (SURVEY §15 trap note (r):
  * this box's wall-clock is routinely dominated by ambient IO-wait, and
  * blocking-job count is what a fixpoint rework actually changes).
  * Run: `tools/run_class.sh graft.JobCount <query>...`
  * (SPARK_GRAFT_SF_DIR selects the dataset; r16 measured
  * graph_scc_fwbw at 89 → 56 jobs across the keyedReach rework). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(); val stages = new AtomicInteger()
    val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- args) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      Thread.sleep(500)
      println(f"$n: jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} wall=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
