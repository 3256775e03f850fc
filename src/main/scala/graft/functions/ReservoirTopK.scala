package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state weighted reservoir: keeps the k HIGHEST-priority
  * (priority, id) pairs of a group, ordered (priority desc, id asc) —
  * the A-Res/priority-sampling reservoir as a true partial aggregate
  * (SURVEY §12: the scan_sample_hash device generalized to weighted
  * top-k with deterministic md5-derived priorities; r15 verdict item 4).
  *
  * Why an Aggregator and not a rank window — ADJUDICATED against Spark
  * 4's optimizer, not assumed: a `row_number ≤ k` filter plans a
  * PARTIAL WindowGroupLimit below the exchange, so the rank-window form
  * is ALSO skew-immune and shuffle-bounded (k rows per group ×
  * partition), and the r16 hot-lang ladder measured the two forms at
  * parity (BASELINE.md). The reservoir's remaining edges are: (a) no
  * map-side full sort — WindowGroupLimit consumes a Sort of the whole
  * input partition, the reservoir folds in O(n) compares with an O(1)
  * reject common case; (b) the buffer is a VALUE — mergeable state the
  * streaming twin (stream_sample_reservoir) persists per wave and
  * re-merges without re-reading documents, which no window form
  * provides; (c) it composes with the typed Dataset API
  * (KeyValueGroupedDataset.agg).
  *
  * Determinism: selection and merge use the TOTAL order (priority desc,
  * id asc) on raw IEEE priorities — both engines derive identical
  * doubles from integer weights and md5 prefixes, and the id tiebreak
  * makes every prefix of the order unique — so the reservoir content is
  * a pure function of the input SET: bit-reproducible across runs,
  * retries, and any partition split (NewOps16Spec pins repartition
  * invariance).
  */
class ReservoirTopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** (priority desc, id asc): a strictly better pair sorts FIRST. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] = {
    // Full reservoir and the newcomer is no better than the current
    // worst: O(1) reject — the map-side common case.
    if (buf.size >= k && !better(in, buf.last)) buf
    else {
      val i = buf.indexWhere(better(in, _))
      val ins = if (i < 0) buf :+ in
                else (buf.take(i) :+ in) ++ buf.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }
  }

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // Merge of two sorted bounded lists, keep the k best.
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
