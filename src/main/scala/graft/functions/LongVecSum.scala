package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of equal-length array<long> rows — the mergeable
  * partial under the PCA covariance pass (and any fixed-domain integer
  * sufficient-statistic fold): each task folds its rows into ONE local
  * Array[Long] buffer in place, the exchange moves one buffer per task,
  * and merge adds buffers element-wise. Exact BIGINT addition is
  * associative and commutative, so any partial/merge grouping yields the
  * identical result — the property that lets the r15 posexplode²+join
  * Gram pass collapse to a single scan (PcaParitySpec pins equality).
  *
  * The empty-buffer sentinel (length 0) avoids fixing D in the aggregate:
  * the first reduce/merge adopts the incoming row's length.
  */
object LongVecSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], in: Array[Long]): Array[Long] =
    if (in == null || in.isEmpty) b // empty = identity (zero-length row or sentinel)
    else if (b.isEmpty) in.clone()
    else {
      require(b.length == in.length,
        s"LongVecSum: ragged input (${b.length} vs ${in.length})")
      var i = 0
      while (i < b.length) { b(i) += in(i); i += 1 }
      b
    }

  // The zero() sentinel is identity on BOTH sides (ADVICE r16): global
  // partial aggregation emits one zero-buffer row per partition and empty
  // scan partitions are routine, so a non-empty `a` can meet an empty `b`.
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a else reduce(a, b)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
