package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, count, lit, max, xxhash64}

/** Registration protocol for the derived layouts persisted under /tmp
  * (bucketed signature/prefix/label tables, the IVF index): written once
  * per dataset, RE-REGISTERED — not rebuilt — by later sessions, and
  * invalidated by a dataset fingerprint so a fixture change can never
  * silently serve stale derived state (the round-5 staleness finding:
  * layouts were keyed only by the sanitized dir name, so re-registration
  * trusted whatever bytes sat at the path).
  *
  * At 100 TB the same protocol is the catalog discipline for any
  * materialized derived table: the fingerprint plays the role of a
  * snapshot/version id tying the derived artifact to the source it was
  * computed from, and a mismatch is a rebuild, not a wrong answer.
  */
private[graft] object Layouts {

  /** Dataset fingerprint of the source table a layout derives from: row
    * count + max id + an order-independent content hash (xor of xxhash64
    * over the id and the caller-named content columns — xor, not sum, so
    * ANSI overflow can't bite), one agg paid only at registration time,
    * never on catalog-warm calls. Count catches appends and truncations;
    * max id catches the watermark-bearing layouts (corpus labels bake the
    * derived midpoint watermark into their contents, and the midpoint is
    * a pure function of max id); the content xor catches a regenerated
    * fixture with identical count/id-range but different text/embeddings
    * — the round-6 residual staleness hole. Callers name the column(s)
    * the layout actually derives from; hashing only those keeps the
    * registration scan to the relevant bytes.
    *
    * In-session caveat (by design): the catalog-warm path and the
    * per-JVM memo below do NOT re-validate — a fixture edited IN PLACE
    * mid-session requires `resetMemo()` + dropping the catalog table (or
    * a fresh JVM). The fingerprint guards cross-session staleness, which
    * is the real 100 TB failure mode (a snapshot id in the catalog);
    * within one session the source table is immutable by contract. */
  def fingerprint(src: DataFrame, idCol: String, contentCols: String*): String = {
    val hashCols = (idCol +: contentCols).map(col)
    val r = src.agg(count(lit(1)), max(col(idCol)),
      bit_xor(xxhash64(hashCols: _*))).head()
    s"${r.getLong(0)}:${r.get(1)}:${r.get(2)}"
  }

  private def metaFile(path: String) = new java.io.File(path, "_GRAFT_META")

  private def metaMatches(path: String, meta: String): Boolean = {
    val f = metaFile(path)
    f.exists() && {
      val src = scala.io.Source.fromFile(f)
      try src.mkString.trim == meta
      finally src.close()
    }
  }

  private def writeMeta(path: String, meta: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(metaFile(path).toPath, meta.getBytes("UTF-8"))
  }

  /** Register-or-build for a bucketed catalog-table layout. Catalog-warm
    * sessions serve the table directly (its fingerprint was checked when
    * it entered the catalog). A complete on-disk layout whose _GRAFT_META
    * matches re-registers via `registerDdl`; anything else — absent,
    * incomplete, or fingerprint-stale — rebuilds via `build` (which must
    * `saveAsTable` with mode overwrite at `path`) and stamps the meta. */
  def table(s: SparkSession, tbl: String, path: String, meta: => String)(
      registerDdl: => String)(build: => Unit): DataFrame = {
    if (!s.catalog.tableExists(tbl)) {
      val m = meta
      if (new java.io.File(path, "_SUCCESS").exists() && metaMatches(path, m)) {
        s.sql(registerDdl)
      } else {
        build
        writeMeta(path, m)
      }
    }
    s.table(tbl)
  }

  /** Same protocol for plain-parquet layouts (no catalog table — partition
    * discovery handles re-reads). `successProbe` is the file proving the
    * last write completed. The per-JVM memo plays the catalog's role so
    * repeated calls within a session don't re-run the fingerprint agg. */
  private val checkedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def parquetLayout(path: String, successProbe: String, meta: => String)(
      build: => Unit): Unit = {
    if (!checkedPaths.contains(path)) {
      val m = meta
      if (!(new java.io.File(successProbe, "_SUCCESS").exists() &&
            metaMatches(path, m))) {
        build
        writeMeta(path, m)
      }
      checkedPaths.add(path)
    }
  }

  /** Test hook: forget the per-JVM memo so a spec can exercise the
    * stale-fingerprint rebuild path. */
  private[graft] def resetMemo(): Unit = checkedPaths.clear()
}
