package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed storage layout — pre-shuffling at WRITE time so repeated
  * equi-joins stop paying a per-query exchange. Both sides bucketed by
  * their join key into the SAME bucket count hash-align on disk: the
  * join plans as a SortMergeJoin whose inputs need NO Exchange (each
  * bucket pairs with exactly one bucket on the other side), the
  * dominant cost of a large-fact x large-fact join at 100 TB. The
  * per-bucket `sortBy` additionally lets single-file buckets skip the
  * sort. Registry-surfaced by q74 (write + shuffle-free read-back in
  * one query) and plan-asserted in both QueryPlanSpec and StorageSpec.
  */
object BucketedStore {

  /** Physical (catalog) name for a logical table name: unqualified only
    * (the orphan cleanup below derives a warehouse path, which is only
    * valid in the default database), suffixed with this JVM's PID so two
    * concurrent sessions sharing a warehouse directory can never delete
    * or overwrite each other's live table directories (the in-memory
    * catalog is per-JVM but the warehouse dir is not). PID reuse implies
    * the previous owner is dead, so reclaiming its directory is safe.
    */
  private def physicalName(table: String): String = {
    require(!table.contains("."),
      s"BucketedStore requires an unqualified (default-database) table name, got '$table'")
    s"${table}_p${ProcessHandle.current().pid()}"
  }

  /** Save as a bucketed + per-bucket-sorted managed parquet table
    * (overwrite). Bucket count is the scale knob: size it so one bucket
    * of the LARGER table fits an executor's sort buffer.
    */
  def saveBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    val phys = physicalName(table)
    // The in-memory catalog is per-JVM but the warehouse directory is
    // not: a location left by a previous (dead, same-PID) session makes
    // CREATE fail with LOCATION_ALREADY_EXISTS even in overwrite mode
    // (the new catalog does not know the table). Clear the orphan before
    // writing — the PID suffix guarantees no LIVE session owns this dir.
    if (!s.catalog.tableExists(phys)) {
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, phys.toLowerCase)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    // Pre-partition on the bucket key with the bucket count: the write
    // then runs one task per bucket (parallel instead of one task
    // spraying all buckets) AND produces exactly one file per bucket —
    // the layout where Spark trusts the per-bucket sortBy at read time
    // and drops the SortExec under a sort-merge join.
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(phys)
  }

  /** Create the bucketed table only if this session has not already
    * created it — the write-once / join-many amortization that motivates
    * the layout (a repeated caller pays the pre-shuffle exactly once;
    * every later join is exchange-free reads). A fresh session always
    * (re)writes, so cross-session staleness reduces to the orphan
    * handling in [[saveBucketed]].
    */
  def ensureBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    if (!df.sparkSession.catalog.tableExists(physicalName(table)))
      saveBucketed(df, table, buckets, key)

  /** Whether the logical table already exists in this session (i.e. the
    * next [[ensureBucketed]] is a no-op and a join is exchange-free
    * steady state).
    */
  def isMaterialized(s: SparkSession, table: String): Boolean =
    s.catalog.tableExists(physicalName(table))

  /** Co-located equi-join of two same-bucket-count tables on their
    * bucket keys. The `merge` hint keeps the sort-merge path even when
    * one side is broadcast-small at test scale, so the plan exercised
    * locally IS the at-scale plan (broadcast would trivially avoid the
    * exchange and prove nothing about the layout).
    */
  def colocatedJoin(
      s: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    s.table(physicalName(left)).hint("merge")
      .join(s.table(physicalName(right)), col(leftKey) === col(rightKey))
}
