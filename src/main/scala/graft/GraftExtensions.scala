package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session-extensions installer: registers the engine's native expressions
  * as permanent SQL functions, so a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can call them from pure SQL —
  * no Scala API required. The Column-level helpers in
  * `VectorFunctions`/`ArrayFunctions` self-register per session as a
  * fallback; this is the installable-library form of the same registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "cosine similarity of two float vectors"),
      (e: Seq[Expression]) => FloatVecCosine(e(0), e(1))))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two float vectors"),
      (e: Seq[Expression]) => FloatVecDot(e(0), e(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit SimHash of a token array"),
      (e: Seq[Expression]) => SimHash64(e(0))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_shingles"),
      info("graft_sorted_shingles", "sorted distinct hashed n-gram shingles"),
      (e: Seq[Expression]) => SortedHashedShingles(e(0),
        e(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_size"),
      info("graft_sorted_intersect_size",
        "intersection size of two sorted long arrays"),
      (e: Seq[Expression]) => SortedLongIntersectSize(e(0), e(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "k-permutation MinHash signature"),
      (e: Seq[Expression]) => MinHashSignature(e(0),
        e(1).eval().asInstanceOf[Int], e(2).eval().asInstanceOf[Long])))
    ext.injectFunction((FunctionIdentifier("graft_positional_shingles"),
      info("graft_positional_shingles",
        "position-ordered hashed n-gram shingles"),
      (e: Seq[Expression]) => PositionalHashedShingles(e(0),
        e(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_simhash_from_hashes"),
      info("graft_simhash_from_hashes",
        "bits-wide SimHash of a pre-hashed token array"),
      (e: Seq[Expression]) => SimHashFromHashes(e(0),
        e(1).eval().asInstanceOf[Int])))
  }
}
