package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Streaming inverted-index maintenance under CONTINUOUS ARRIVAL AND
  * ERASURE — q149's tombstone semantics moved from a batch pass to a
  * change stream. Input is CDC-shaped: `(doc_id, text, op)` with
  * op = +1 for an arriving document and op = −1 for an erasure (the
  * delete record carries the before-image text, the standard CDC
  * convention, so retraction never re-reads the corpus).
  *
  * The streaming state is ONE keyed aggregate: the net weight of every
  * `(word, doc_id)` posting. Sum is commutative, so arrival order —
  * including an erasure overtaking its arrival — cannot change the
  * converged state; a posting is live iff net > 0. [[materialize]] is
  * the reader: filter net > 0 and fold to the q17/q149 index shape.
  *
  * Scale posture: state is partitioned by the grouping key exactly like
  * every other streaming aggregate here; in production this runs in
  * UPDATE mode feeding a keyed sink (only touched postings emit per
  * batch). The spec drives it in complete mode purely to read the final
  * snapshot from a memory sink; the keyed state machine is identical.
  * StreamingSpec proves end-of-stream materialization == batch
  * q149_index_retract.
  */
object IndexMaintenance {

  /** The write side (runs identically in batch and streaming): change
    * rows -> per-(word, doc_id) net posting weights. One streaming
    * aggregation, no posting lists in state.
    */
  def postingNetWeights(changes: DataFrame): DataFrame =
    changes
      .select(
        col("doc_id"),
        explode(array_distinct(text.normalizedTokens(col("text")))).as("word"),
        col("op"))
      .groupBy(col("word"), col("doc_id"))
      .agg(sum(col("op")).as("net"))

  /** The read side (batch over the maintained state): live postings ->
    * ranked index, q17/q149 output shape.
    */
  def materialize(netWeights: DataFrame): DataFrame =
    netWeights
      .where(col("net") > 0)
      .groupBy(col("word"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .select(
        col("word"),
        concat_ws(" ", col("ids")).as("doc_ids"),
        size(col("ids")).cast("long").as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("word"))
}
