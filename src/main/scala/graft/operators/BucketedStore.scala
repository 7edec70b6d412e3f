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

  /** Raw (unmasked) read of a logical table. */
  def table(s: SparkSession, table: String): DataFrame =
    s.table(physicalName(table))

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

  /** DELETION for the bucketed layout — the sidecar pattern of
    * DeletableRangeLayout under the bucketing discipline: the tombstone
    * KEY SET is saved as a bucketed table on the same key and bucket
    * count, so the deletion mask (LEFT ANTI join) hash-aligns
    * bucket-for-bucket with the data and the masked read adds ZERO
    * exchanges — and because an anti-join preserves the left side's
    * partitioning and order, downstream co-located joins over the
    * masked relation stay exchange-free too (the whole masked
    * fact-x-fact join plans with no Exchange anywhere; plan-asserted in
    * StorageSpec). The `merge` hint keeps the at-scale sort-merge path
    * where a test-scale tombstone set would otherwise broadcast.
    */
  def maskedTable(
      s: SparkSession, table: String, tomb: String,
      key: String, tombKey: String): DataFrame =
    s.table(physicalName(table)).hint("merge")
      .join(s.table(physicalName(tomb)), col(key) === col(tombKey), "left_anti")

  /** Threshold-guarded compaction: when the tombstoned fraction of
    * `table` reaches `threshold`, physically rewrite the table without
    * its masked rows (write-once into the same bucketed layout) and
    * return true; below threshold leave the mask in place and return
    * false. Bucket files have no partition-directory grain, so
    * compaction here is a WHOLE-TABLE rewrite — the trade this layout
    * makes vs the range layout's per-pid compaction (cheap co-located
    * joins forever vs cheap selective rewrite). Tombstone-table cleanup
    * stays with the caller: dropping it only after every masked table
    * compacted keeps a crashed multi-table compaction retryable (stale
    * tombstones anti-join nothing, exactly like the range layout's
    * argument).
    */
  def compactMasked(
      s: SparkSession, table: String, tomb: String,
      key: String, tombKey: String, buckets: Int, threshold: Double): Boolean = {
    val total = s.table(physicalName(table)).count()
    val masked = maskedTable(s, table, tomb, key, tombKey)
    val live = masked.count()
    if (total == live || (total - live).toDouble < total * threshold) false
    else {
      // Materialize off the old files before overwriting them.
      saveBucketed(masked.localCheckpoint(), table, buckets, key)
      true
    }
  }

  /** Drop a logical table (used for tombstone-set cleanup post-compact). */
  def dropTable(s: SparkSession, table: String): Unit =
    s.sql(s"DROP TABLE IF EXISTS ${physicalName(table)}")
}
