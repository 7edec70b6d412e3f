package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Range layout with DELETE support — the layout analog of q149's
  * index-grain retract: rows can be removed from the q150-style
  * range-partitioned layout WITHOUT a full rewrite, then physically
  * reclaimed by an explicit, threshold-driven compaction pass.
  *
  * Model (the deletion-vector / tombstone-sidecar pattern of modern
  * table formats, re-expressed relationally):
  *
  *  - DELETE appends the matching rows' keys `(pid, l_orderkey,
  *    l_linenumber, v)` — (orderkey, linenumber, price-centi) is a
  *    verified unique key of the synthetic lineitem at every SF (the
  *    generator reuses (orderkey, linenumber) pairs, unlike real
  *    TPC-H, so the natural PK alone over-deletes) — to a
  *    `_tombstones` parquet sidecar INSIDE the
  *    layout directory. `_`-prefixed paths are invisible to Spark's
  *    file listing, so data scans never see the sidecar; the sidecar
  *    is bounded by the deleted fraction, not the table size.
  *  - READ is `data LEFT ANTI JOIN tombstones` on the full key. The
  *    tombstone rows carry `pid`, so the anti-join's probe side keeps
  *    the layout's partition pruning (a band scan only ever joins
  *    against the band pids' tombstones) and AQE broadcasts the
  *    (small) tombstone side in the common case.
  *  - COMPACT(threshold) rewrites exactly the pid directories whose
  *    deleted fraction crosses the threshold — survivors are written
  *    to a dot-prefixed tmp dir, swapped in, and only then are those
  *    pids' tombstones dropped. Crash-safety is by masking idempotence:
  *    if the process dies after a swap but before the tombstone drop,
  *    readers apply stale tombstones to already-compacted data, and
  *    the anti-join matches nothing — never a wrong answer, only a
  *    retried cleanup. Mutation (delete/compact) assumes a single
  *    mutator, like a table format whose commit log serializes
  *    writers; concurrent READERS are safe at every step.
  *
  * At 100 TB the points are: a delete touches metadata proportional to
  * the deleted keys (no data rewrite on the write path), reads stay
  * partition-pruned and pay one bounded anti-join, and the full-file
  * rewrite cost is deferred to an explicit maintenance pass that only
  * touches threshold-crossing partitions. Registry-surfaced by
  * q151_layout_delete (masked AND post-compact reads against one DuckDB
  * oracle); partial-compaction invariants proven in StorageSpec.
  *
  * Reference scope note: the reference engine (tema1a) has no mutable
  * storage at all — this is part of the extension surface's
  * training-data-pipeline story (erasure/recall over curated corpora).
  */
object DeletableRangeLayout {

  private val tombSchema = StructType(Seq(
    StructField("pid", IntegerType),
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("v", LongType)))

  /** Tombstone / anti-join key within one pid directory. */
  private val rowKey = Seq("l_orderkey", "l_linenumber", "v")

  /** Layouts this JVM has verified complete (fast path over the on-disk
    * completeness marker). Added only AFTER a publish succeeds.
    */
  private val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val lock = new Object

  /** Completeness marker, written last inside the tmp dir before the
    * atomic publish — same protocol as the q150 layout manifest.
    */
  private def manifestFile(dir: String) = new java.io.File(dir, "_graft_manifest.json")

  private def tombPath(dir: String) = s"$dir/_tombstones"

  /** Write lineitem range-partitioned by the EXACT boundary array (one
    * parquet directory per pid, `pid = 1 + |{uppers < v}|`), carrying
    * the (l_orderkey, l_linenumber) primary key so rows are individually
    * deletable. Idempotent atomic publish: tmp dir + manifest + rename.
    */
  def ensure(s: SparkSession, d: String, dir: String, uppers: Array[Long]): String = {
    if (written.contains(dir)) return dir
    lock.synchronized {
      if (written.contains(dir)) return dir
      if (!manifestFile(dir).isFile) {
        val tmp = dir + s".tmp-p${ProcessHandle.current().pid()}"
        val upLit = array(uppers.map(lit).toSeq: _*)
        graft.Tables.lineitem(s, d)
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .withColumn("pid", size(filter(upLit, u => u < col("v"))) + 1)
          .repartition(col("pid"))
          .write.mode("overwrite").partitionBy("pid").parquet(tmp)
        Files.write(manifestFile(tmp).toPath,
          uppers.mkString("[", ",", "]")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try Files.move(Paths.get(tmp), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException =>
            // Another JVM published first; its copy is byte-equivalent
            // (the boundary array is deterministic).
            if (!manifestFile(dir).isFile) throw new IllegalStateException(
              s"deletable layout rename to $dir failed and no complete layout exists")
            org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        }
      }
      written.add(dir)
      dir
    }
  }

  /** The raw layout data (pid as the inferred partition column). This is
    * the UNMASKED read — correct only when the tombstone set is empty
    * (e.g. right after a full compaction); ordinary readers use
    * [[maskedRead]].
    */
  def data(s: SparkSession, dir: String): DataFrame = s.read.parquet(dir)

  /** Current tombstone set (empty-schema DataFrame when none exist). */
  def tombstones(s: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(tombPath(dir))
    if (!f.isDirectory)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], tombSchema)
    // Explicit schema: an all-rows-compacted sidecar can be an empty
    // parquet dir, which would otherwise fail schema inference.
    else s.read.schema(tombSchema).parquet(tombPath(dir))
  }

  /** Swap in a new tombstone set (tmp + atomic renames). Single-mutator
    * commit, like a table-format log entry; readers racing the two
    * renames see either the old or the new complete set.
    */
  private[graft] def publishTombstones(df: DataFrame, dir: String): Unit = {
    val tag = ProcessHandle.current().pid()
    val tmp = s"${tombPath(dir)}.tmp-p$tag"
    // The sidecar is deleted-keys metadata (bounded by the deleted
    // fraction); one file keeps the swap a single rename. A 100 TB
    // deployment would shard this by pid — the read side already keys
    // by pid so nothing else changes.
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val live = Paths.get(tombPath(dir))
    val old = Paths.get(s"${tombPath(dir)}.old-p$tag")
    if (Files.exists(live)) Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), live, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }

  /** DELETE FROM layout WHERE cond: append the matching keys to the
    * tombstone sidecar (distinct-merged with any existing tombstones).
    * Touches no data file. Returns the total tombstone count after the
    * merge. Matching runs against the MASKED view, so re-deleting
    * already-deleted or already-compacted rows is a no-op.
    */
  def applyDelete(s: SparkSession, dir: String, cond: Column): Long = lock.synchronized {
    val hits = maskedRead(s, dir).where(cond)
      .select(col("pid").cast("int").as("pid"),
        col("l_orderkey"), col("l_linenumber"), col("v"))
    val merged = tombstones(s, dir).unionByName(hits).distinct().localCheckpoint()
    publishTombstones(merged, dir)
    merged.count()
  }

  /** The reader contract: layout rows minus tombstoned keys. */
  def maskedRead(s: SparkSession, dir: String): DataFrame =
    data(s, dir).join(
      tombstones(s, dir).select(("pid" +: rowKey).map(col): _*),
      "pid" +: rowKey, "left_anti")

  /** Per-pid live-row and tombstone counts — the bounded (≤ pid count)
    * stats compaction decides from.
    */
  def pidStats(s: SparkSession, dir: String): DataFrame =
    data(s, dir).groupBy(col("pid")).agg(count(lit(1)).as("n_rows"))
      .join(tombstones(s, dir).groupBy(col("pid")).agg(count(lit(1)).as("n_deleted")),
        Seq("pid"), "left")
      .na.fill(0L, Seq("n_deleted"))

  /** Rewrite every pid directory whose deleted fraction is at least
    * `threshold` (and which has any tombstones at all): survivors are
    * written to a dot-prefixed tmp dir, swapped in via two ATOMIC
    * renames (live -> `.compact-old-`, tmp -> live, then delete old —
    * the live path never holds a partially-written directory), and the
    * rewritten pids' tombstones are dropped LAST — see the object
    * scaladoc for the crash-safety argument. Returns the rewritten
    * pids, ascending.
    */
  def compact(s: SparkSession, dir: String, threshold: Double): Seq[Int] = lock.synchronized {
    // Recovery preamble. Crash windows of the rename protocol, keyed by
    // what survives: (a) tmp only — pre-swap crash; pid dir + tombstones
    // are still the whole truth, drop the tmp. (b) old + tmp, live
    // missing — crash between the two renames; finish the swap. (c) old
    // + live — crash before the old-dir delete; survivors landed, drop
    // the old copy. Every leftover is a COMPLETE directory (renames are
    // atomic), so no branch ever reads partial bytes.
    val entries = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    entries.filter(f => f.isDirectory && f.getName.startsWith(".compact-old-")).foreach { o =>
      val p = o.getName.stripPrefix(".compact-old-")
      val pdir = Paths.get(dir, s"pid=$p")
      val tmp = Paths.get(dir, s".compact-tmp-$p")
      if (!Files.exists(pdir)) {
        if (Files.exists(tmp)) Files.move(tmp, pdir, StandardCopyOption.ATOMIC_MOVE)
        else Files.move(o.toPath, pdir, StandardCopyOption.ATOMIC_MOVE) // defensive: un-swap
      }
      if (Files.exists(pdir) && Files.exists(o.toPath))
        org.apache.commons.io.FileUtils.deleteDirectory(o)
    }
    entries.filter(f => f.isDirectory && f.getName.startsWith(".compact-tmp-"))
      .foreach { t =>
        val pdir = Paths.get(dir, s"pid=${t.getName.stripPrefix(".compact-tmp-")}")
        if (!Files.exists(pdir)) Files.move(t.toPath, pdir, StandardCopyOption.ATOMIC_MOVE)
        else if (Files.exists(t.toPath))
          org.apache.commons.io.FileUtils.deleteDirectory(t) // stale tmp
      }
    val pids = pidStats(s, dir)
      .where(col("n_deleted") > 0 &&
        col("n_deleted") >= col("n_rows") * threshold)
      .select(col("pid")).collect().map(_.getInt(0)).sorted.toSeq // bounded: ≤ 32 pids
    if (pids.isEmpty) return Nil
    val tombs = tombstones(s, dir).localCheckpoint() // survives the swaps below
    pids.foreach { p =>
      val pdir = s"$dir/pid=$p"
      val survivors = s.read.parquet(pdir)
        .join(tombs.where(col("pid") === p).drop("pid"), rowKey, "left_anti")
      val tmp = s"$dir/.compact-tmp-$p"
      survivors.write.mode("overwrite").parquet(tmp) // evaluated before the swap
      // Atomic swap: the live path transitions complete-old -> absent ->
      // complete-new; a crash at any point leaves only complete dirs for
      // the preamble to reconcile (never a partially-deleted live dir).
      val old = Paths.get(s"$dir/.compact-old-$p")
      Files.move(Paths.get(pdir), old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), Paths.get(pdir), StandardCopyOption.ATOMIC_MOVE)
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    }
    publishTombstones(tombs.where(!col("pid").isin(pids: _*)), dir)
    pids
  }
}
