package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Persisted, generation-versioned state for the incrementally
  * maintainable LSH dedup index ([[Dedup.incrementalPairBands]]): each
  * generation `v<N>/` holds the three state tables — `bands` (doc_id,
  * band, key), `counts` (band, key, n), `pairbands` (band, key, doc_a,
  * doc_b) — and admits chain: generation N+1 is computed from
  * generation N plus ONLY the delta batch's band rows (untouched
  * buckets' pairs carried over verbatim, touched buckets recomputed
  * from a bounded fetch, over-cap buckets retracted; the base corpus is
  * never re-signatured).
  *
  * Commit protocol (single writer, the [[VersionedLayout]] discipline):
  * a generation is built complete under a dot-prefixed tmp dir — the
  * manifest JSON written LAST inside it — then atomically renamed to
  * `v<N>`, so readers only ever see complete generations and a crashed
  * admit leaves a tmp the next admit overwrites. The manifest carries a
  * `txn` stamp: [[admitOnce]] skips a batch whose stamp any existing
  * generation already records, which makes a replayed micro-batch
  * (a restarted `foreachBatch` stream re-delivering) commit exactly
  * once — the same idempotence contract as
  * [[VersionedLayout.appendInsertOnce]], now for index maintenance.
  *
  * At 100 TB each state table is a (band, key)-bucketed layout, the
  * admit's touched-bucket fetch prunes to the delta's keys, and old
  * generations are retention metadata (dropped like archives) — the
  * per-batch admit cost is O(delta + touched buckets + pair table),
  * never the corpus-wide band shuffle a rebuild pays.
  */
object LshIndexStore {

  private def genDir(dir: String, gen: Int) = s"$dir/v$gen"
  private def manifest(dir: String, gen: Int) =
    new java.io.File(genDir(dir, gen), "_graft_manifest.json")

  /** Highest COMPLETE generation (manifest present), -1 when none. */
  def currentGeneration(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.stripPrefix("v").toInt)
      .filter(g => manifest(dir, g).isFile)
      .maxOption.getOrElse(-1)

  private def txnOf(dir: String, gen: Int): Long = {
    val body = new String(Files.readAllBytes(manifest(dir, gen).toPath), StandardCharsets.UTF_8)
    body.split("\"txn\":")(1).split("[,}]")(0).trim.toLong
  }

  private def writeGeneration(
      s: SparkSession, dir: String, gen: Int, txn: Long,
      bands: DataFrame, counts: DataFrame, pairBands: DataFrame): Unit = {
    val tmp = s"$dir/.gen-tmp-v$gen-p${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    bands.write.mode("overwrite").parquet(s"$tmp/bands")
    counts.write.mode("overwrite").parquet(s"$tmp/counts")
    pairBands.write.mode("overwrite").parquet(s"$tmp/pairbands")
    Files.write(new java.io.File(tmp, "_graft_manifest.json").toPath,
      s"""{"generation":$gen,"txn":$txn}""".getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(Paths.get(dir))
    try Files.move(Paths.get(tmp), Paths.get(genDir(dir, gen)), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException =>
        // Lost a single-writer violation race; the published generation
        // is complete — treat like VersionedLayout's commit CAS and fail
        // loudly rather than clobber.
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        throw new IllegalStateException(
          s"generation $gen of $dir was committed by another writer")
    }
  }

  private def bandsOf(s: SparkSession, dir: String, gen: Int): DataFrame =
    s.read.parquet(s"${genDir(dir, gen)}/bands")
  private def countsOf(s: SparkSession, dir: String, gen: Int): DataFrame =
    s.read.parquet(s"${genDir(dir, gen)}/counts")
  private def pairBandsOf(s: SparkSession, dir: String, gen: Int): DataFrame =
    s.read.parquet(s"${genDir(dir, gen)}/pairbands")

  /** Generation 0: build the full index state from the initial corpus's
    * band rows. No-op if a generation already exists.
    */
  def init(s: SparkSession, dir: String, bands: DataFrame,
      maxBucket: Int = Dedup.defaultMaxBucket, txn: Long = -1L): Int = {
    if (currentGeneration(dir) >= 0) return currentGeneration(dir)
    val b = bands.localCheckpoint() // feeds all three state writes
    writeGeneration(s, dir, 0, txn, b, Dedup.bucketCounts(b), Dedup.indexPairBands(b, maxBucket))
    0
  }

  /** Admit a delta batch: compute generation N+1's state from
    * generation N plus the delta band rows and publish it atomically.
    * Returns the new generation number.
    */
  def admit(s: SparkSession, dir: String, deltaBands: DataFrame,
      maxBucket: Int = Dedup.defaultMaxBucket, txn: Long = -1L): Int = {
    val gen = currentGeneration(dir)
    require(gen >= 0, s"$dir has no generation 0 — call init first")
    val delta = deltaBands.localCheckpoint() // feeds bands/counts/pairbands
    val next = gen + 1
    writeGeneration(s, dir, next, txn,
      bandsOf(s, dir, gen).unionByName(delta),
      Dedup.mergedCounts(countsOf(s, dir, gen), delta),
      Dedup.incrementalPairBands(
        bandsOf(s, dir, gen), countsOf(s, dir, gen), pairBandsOf(s, dir, gen),
        delta, maxBucket))
    next
  }

  /** Exactly-once admit for streaming ingest: skip the batch if any
    * generation's manifest already records `txn` (the replayed
    * micro-batch of a restarted stream), else admit it.
    */
  def admitOnce(s: SparkSession, dir: String, deltaBands: DataFrame, txn: Long,
      maxBucket: Int = Dedup.defaultMaxBucket): Int = {
    val committed = (0 to currentGeneration(dir)).find(g => txnOf(dir, g) == txn)
    committed.getOrElse(admit(s, dir, deltaBands, maxBucket, txn))
  }

  /** The current generation's candidate pairs (the consumer surface —
    * identical to a ground-up rebuild over everything admitted so far).
    */
  def pairs(s: SparkSession, dir: String): DataFrame =
    pairBandsOf(s, dir, currentGeneration(dir))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
}
