package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregate: folds a group of shingle base-hashes
  * into a k-wide signature (element-wise minimum over k permutations).
  * The Aggregator[IN,BUF,OUT] formulation of the same signature
  * `graft.llm.Dedup.minhashSignatures` computes as k codegen'd `min()`
  * columns — AggregatorParitySpec asserts the two agree bit-for-bit.
  *
  * Scale note: a true partial aggregate — `reduce` folds each hash into
  * the k-long buffer map-side, `merge` is element-wise min of buffers, so
  * shuffle traffic is one k×8-byte array per (doc × partition) no matter
  * how many shingles a document has. The codegen'd column formulation
  * stays the default in the dedup hot path (primitive min() beats a boxed
  * array buffer); this class exists for consumers that need signatures
  * through the typed Dataset API (e.g. KeyValueGroupedDataset.agg).
  */
class MinHashSigAggregator(k: Int = 128, seed: Long = 42L)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = TextFunctions.MinhashPrime
  private val as: Array[Long] = TextFunctions.minhashCoeffs(k, seed).map(_._1).toArray
  private val bs: Array[Long] = TextFunctions.minhashCoeffs(k, seed).map(_._2).toArray

  override def zero: Array[Long] = Array.fill(k)(P)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (as(i) * h + bs(i)) % P // a,h < 2^31: no Long overflow
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
