package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries sketch state: stream length seen plus at most k surviving
  * (item -> estimated count) counters.
  */
case class MGSketch(n: Long, counts: Map[String, Long])

/** Misra-Gries frequent-items sketch as a typed MERGEABLE Aggregator —
  * the deterministic member of the sketch family (HLL q34 and CMS/Bloom
  * are probabilistic; this one's guarantee has no failure probability):
  * with k counters, EVERY item whose true frequency exceeds n/(k+1)
  * survives, and each surviving estimate undercounts by at most
  * n/(k+1). Buffer state is bounded by k counters per task regardless
  * of stream length or cardinality — the map-side shape that makes
  * corpus-wide heavy-hitter detection a narrow aggregation instead of a
  * full groupBy shuffle of the vocabulary.
  *
  * reduce: the classic stream update — increment a live counter, start
  * one if a slot is free, else decrement ALL counters (dropping zeros)
  * and discard the arrival. merge: the mergeable-summaries combine
  * (Agarwal et al., TODS'13) — sum counterparts, then subtract the
  * (k+1)-th largest combined count from every counter and drop the
  * non-positive ones, restoring the k-counter bound with the same error
  * envelope. Both paths keep the invariant (decrements applied to a
  * counter) * (k+1) <= n, which is the guarantee's whole proof.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MGSketch, MGSketch] {
  require(k >= 1, s"need at least one counter, got $k")

  override def zero: MGSketch = MGSketch(0L, Map.empty)

  override def reduce(b: MGSketch, item: String): MGSketch = {
    val m = b.counts
    m.get(item) match {
      case Some(c) => MGSketch(b.n + 1, m.updated(item, c + 1))
      case None if m.size < k => MGSketch(b.n + 1, m.updated(item, 1L))
      case None =>
        MGSketch(b.n + 1, m.collect { case (w, c) if c > 1 => w -> (c - 1) })
    }
  }

  override def merge(b1: MGSketch, b2: MGSketch): MGSketch = {
    val m = (b1.counts.keySet ++ b2.counts.keySet).iterator
      .map(w => w -> (b1.counts.getOrElse(w, 0L) + b2.counts.getOrElse(w, 0L)))
      .toMap
    val combined =
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (w, c) if c > cut => w -> (c - cut) }
      }
    MGSketch(b1.n + b2.n, combined)
  }

  override def finish(reduction: MGSketch): MGSketch = reduction

  override def bufferEncoder: Encoder[MGSketch] = ExpressionEncoder[MGSketch]()
  override def outputEncoder: Encoder[MGSketch] = ExpressionEncoder[MGSketch]()
}
