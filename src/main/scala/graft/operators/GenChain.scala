package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The generation-chain commit protocol shared by the maintained index
  * stores ([[LshIndexStore]], [[IvfIndexStore]]): numbered generation
  * directories `v<N>/`, each built COMPLETE under a dot-prefixed tmp —
  * its manifest JSON written LAST inside — then atomically renamed, so
  * readers only ever see complete generations, a crashed mutation
  * leaves a tmp the next one overwrites, and a lost single-writer race
  * fails loudly on the rename instead of clobbering committed state.
  * Manifests carry a `txn` stamp for exactly-once streaming ingest
  * (the [[VersionedLayout.appendInsertOnce]] contract).
  */
private[operators] object GenChain {

  def genDir(dir: String, gen: Int) = s"$dir/v$gen"

  def manifest(dir: String, gen: Int) =
    new java.io.File(genDir(dir, gen), "_graft_manifest.json")

  /** Highest COMPLETE generation (manifest present), -1 when none. */
  def currentGeneration(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.stripPrefix("v").toInt)
      .filter(g => manifest(dir, g).isFile)
      .maxOption.getOrElse(-1)

  def txnOf(dir: String, gen: Int): Long = {
    val body = new String(
      Files.readAllBytes(manifest(dir, gen).toPath), StandardCharsets.UTF_8)
    body.split("\"txn\":")(1).split("[,}]")(0).trim.toLong
  }

  /** The generation whose manifest records `txn`, skipping vacuumed
    * (manifest-less) generations — the exactly-once replay check.
    */
  def committedGen(dir: String, txn: Long): Option[Int] =
    (0 to currentGeneration(dir))
      .filter(g => manifest(dir, g).isFile)
      .find(g => txnOf(dir, g) == txn)

  /** Publish generation `gen` from a complete tmp: manifest last, then
    * one atomic rename.
    */
  def publish(dir: String, gen: Int, txn: Long, tmp: String): Unit = {
    Files.write(new java.io.File(tmp, "_graft_manifest.json").toPath,
      s"""{"generation":$gen,"txn":$txn}""".getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(Paths.get(dir))
    try Files.move(Paths.get(tmp), Paths.get(genDir(dir, gen)), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        throw new IllegalStateException(
          s"generation $gen of $dir was committed by another writer")
    }
  }

  def freshTmp(dir: String, gen: Int): String = {
    val tmp = s"$dir/.gen-tmp-v$gen-p${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    Files.createDirectories(Paths.get(tmp))
    tmp
  }

  /** Drop generations BELOW `keepFrom` (caller asserts `keepFrom` is a
    * full-snapshot generation so the chain stays rooted).
    */
  def vacuumGenerations(dir: String, keepFrom: Int): Unit =
    (0 until keepFrom).foreach { g =>
      val d = new java.io.File(genDir(dir, g))
      if (d.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }

  /** ONE compaction policy for every maintained chain: fire at
    * `maxSegments` chain length, or when the merged read's row mass
    * reaches `maxOverheadMilli`/1000 of the folded mass (integer-exact
    * crossing test). `audit` is the chain's (segments, read rows,
    * folded rows); `doCompact` is its fold. Returns whether it fired.
    */
  def compactWhenNeeded(audit: (Int, Long, Long), doCompact: => Int,
      maxOverheadMilli: Long, maxSegments: Int): Boolean = {
    val (nSeg, readRows, foldedRows) = audit
    val fire = nSeg > 0 && (nSeg >= maxSegments ||
      (foldedRows > 0 && readRows * 1000L >= foldedRows * maxOverheadMilli))
    if (fire) { doCompact; () }
    fire
  }

  /** Per-id HIGHEST retract generation in (baseGen, gen], if any — the
    * GENERATION-SCOPED tombstone horizon shared by the stores: a
    * retract at generation r erases only rows whose segment generation
    * is below r, so an id retracted and later re-admitted is live
    * again. The horizon table is retracted-ids-sized (tiny next to the
    * corpus), so the mask join broadcasts at scale.
    */
  def retractHorizons(s: SparkSession, dir: String, baseGen: Int, gen: Int,
      idCol: String): Option[DataFrame] = {
    val segs = ((baseGen + 1) to gen).flatMap { g =>
      val d = new java.io.File(genDir(dir, g), "retract-ids")
      if (d.isDirectory)
        Seq(s.read.parquet(d.getAbsolutePath).withColumn("_retract_gen", lit(g)))
      else Nil
    }
    segs.reduceOption(_ unionByName _)
      .map(_.groupBy(col(idCol)).agg(max(col("_retract_gen")).as("_retract_gen")))
  }
}
