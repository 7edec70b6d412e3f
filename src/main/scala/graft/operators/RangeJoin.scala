package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (range) self-join: pairs of rows with the same key whose numeric
  * values lie within `band` of each other.
  *
  * A naive inequality join is a nested loop — O(n^2) per key. The bucketed
  * form assigns each row to a bucket of width `band` and EXPLODES one side
  * into its three candidate buckets {b-1, b, b+1}: any in-band pair shares
  * exactly one (key, bucket) coordinate, so the equi-join produces each
  * candidate exactly once and a cheap exact filter finishes. One shuffle
  * on (key, bucket), candidates bounded by bucket co-membership — the
  * standard range-join optimization that survives at 100 TB.
  */
object RangeJoin {

  /** @param rows (key, value, id) — must be pre-materialized by the caller
    *             (persist/localCheckpoint) since it feeds both join sides.
    * @return (key, id_a, id_b, delta) for all pairs with id_a < id_b and
    *         |value_a - value_b| <= band.
    */
  def bandedSelfJoin(rows: DataFrame, key: String, value: String, id: String,
      band: Long): DataFrame = {
    val base = rows.select(col(key).as("k"), col(value).as("v"), col(id).as("id"))
    val bucket: Column = expr(s"v div ${band}L")
    val a = base.select(
      col("k"), col("v").as("va"), col("id").as("id_a"),
      explode(array(bucket - 1, bucket, bucket + 1)).as("bucket"))
    val b = base.select(
      col("k"), col("v").as("vb"), col("id").as("id_b"), bucket.as("bucket"))
    a.join(b, Seq("k", "bucket"))
      .where(col("id_a") < col("id_b") && abs(col("va") - col("vb")) <= band)
      .select(col("k"), col("id_a"), col("id_b"), abs(col("va") - col("vb")).as("delta"))
  }
}
