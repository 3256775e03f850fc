package graft
import org.apache.spark.sql.SparkSession
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(s"$l: ${(System.nanoTime()-t0)/1e9}s"); r }
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    for (n <- args) t(n) { println("rows=" + SparkEntry.queries(n)(spark, dir).count()) }
    spark.stop()
  }
}
