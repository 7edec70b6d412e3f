package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator: each partial-aggregation buffer
  * holds AT MOST k (score, id) pairs, kept sorted (score desc, id asc).
  *
  * Scale story vs the window formulation (q08): row_number() shuffles and
  * sorts EVERY row of every group; this aggregator's map-side partial
  * reduces each task's contribution to k rows per group before the
  * exchange, so shuffle volume is O(groups * k * tasks) instead of
  * O(rows) — the difference when groups are large and k is small. The
  * hot-path reduce is O(1) for rows that cannot enter the current top-k
  * (the common case once the buffer saturates).
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortWith(lt).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && !lt(a, b.last)) b // cannot enter the top-k: no work
    else trim(b :+ a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
