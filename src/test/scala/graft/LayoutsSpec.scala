package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persisted-layout registration protocol (Layouts): re-register on a
  * matching dataset fingerprint, REBUILD on a mismatch — the round-5
  * staleness finding was that layouts keyed only by dir name trusted
  * whatever bytes sat at the path. */
class LayoutsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("catalog table layout: match re-registers, fingerprint change rebuilds") {
    val tbl = "graft_spec_layout"
    val path = "/tmp/graft_spec_layout"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val dir = new java.io.File(path)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    var builds = 0
    def reg(meta: String) =
      llm.Layouts.table(spark, tbl, path, meta) {
        s"""CREATE TABLE $tbl (`v` BIGINT) USING PARQUET
            CLUSTERED BY (v) SORTED BY (v) INTO 2 BUCKETS
            LOCATION '$path'"""
      } {
        builds += 1
        Seq(1L, 2L, 3L).toDF("v").repartition(2, $"v")
          .write.bucketBy(2, "v").sortBy("v")
          .option("path", path).mode("overwrite").saveAsTable(tbl)
      }

    assert(reg("count=3:max=3").count() == 3 && builds == 1)
    // catalog-warm: no re-check, no rebuild
    assert(reg("count=3:max=3").count() == 3 && builds == 1)
    // catalog-cold + matching meta: re-register without rebuilding
    spark.sql(s"DROP TABLE $tbl")
    assert(reg("count=3:max=3").count() == 3 && builds == 1)
    // catalog-cold + CHANGED fingerprint: stale layout must rebuild
    spark.sql(s"DROP TABLE $tbl")
    assert(reg("count=4:max=9").count() == 3 && builds == 2)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("parquet layout: match re-reads, fingerprint change rebuilds") {
    val path = "/tmp/graft_spec_pq_layout"
    val dir = new java.io.File(path)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    var builds = 0
    def reg(meta: String): Unit = {
      llm.Layouts.resetMemo() // simulate a fresh session per call
      llm.Layouts.parquetLayout(path, path, meta) {
        builds += 1
        Seq(1L, 2L).toDF("v").write.mode("overwrite").parquet(path)
      }
    }
    reg("A"); assert(builds == 1)
    reg("A"); assert(builds == 1) // complete + matching meta → no rebuild
    reg("B"); assert(builds == 2) // fingerprint changed → rebuild
    llm.Layouts.resetMemo()
  }

  test("fingerprint folds content: same count/max-id, changed text still invalidates") {
    val a = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val b = Seq((1L, "alpha"), (2L, "GAMMA")).toDF("doc_id", "text")
    val fa = llm.Layouts.fingerprint(a, "doc_id", "text")
    val fb = llm.Layouts.fingerprint(b, "doc_id", "text")
    // identical count and max id — the pre-round-7 fingerprint (count:max)
    // could not tell these apart; the content xor must
    assert(fa != fb)
    // row order must NOT move the fingerprint (xor is commutative)
    val aShuffled = Seq((2L, "beta"), (1L, "alpha")).toDF("doc_id", "text")
    assert(llm.Layouts.fingerprint(aShuffled, "doc_id", "text") == fa)
    // array content columns hash too (the embeddings call sites)
    val e1 = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e2 = Seq((1L, Array(1.0f, 3.0f))).toDF("vec_id", "embedding")
    assert(llm.Layouts.fingerprint(e1, "vec_id", "embedding") !=
           llm.Layouts.fingerprint(e2, "vec_id", "embedding"))
  }
}
