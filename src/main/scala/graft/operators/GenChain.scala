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
private[graft] object GenChain {

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
    * `txn < 0` is the NON-transactional sentinel every batch mutation
    * publishes with; matching it would make `admitOnce(txn = -1)`
    * silently skip real work (any v0 init or compact carries -1), so a
    * sentinel lookup is always "not committed".
    *
    * Consistency under concurrent maintenance: the checkpoint map and
    * the manifest-tail bound come from ONE checkpoint-file read (see
    * [[txnCheckpoint]] — a coverage re-read could have advanced past
    * generations the map we hold does not cover, making a committed
    * txn invisible), a mid-scan vanishing manifest (vacuum) retries,
    * and a lookup that misses re-checks whether the checkpoint
    * advanced underneath it before concluding "not committed".
    */
  def committedGen(dir: String, txn: Long): Option[Int] = {
    if (txn < 0) return None
    var last: Throwable = null
    (1 to 8).foreach { _ =>
      try {
        val (cov, idx) = txnCheckpoint(dir)
        idx.get(txn) match {
          case s @ Some(_) => return s
          case None =>
            val tail = ((cov + 1) to currentGeneration(dir))
              .filter(g => manifest(dir, g).isFile)
              .find(g => txnOf(dir, g) == txn)
            if (tail.isDefined) return tail
            // A checkpoint landing between our read and the tail scan
            // may have absorbed (and a vacuum deleted) the very
            // generation we were scanning for — only a STABLE view may
            // conclude absence.
            if (checkpointCoverage(dir) == cov) return None
        }
      } catch {
        // A manifest listed as present can vanish mid-scan under a
        // concurrent vacuum; its stamp is then in the (newer)
        // checkpoint — retry reads it.
        case e: java.nio.file.NoSuchFileException => last = e
      }
    }
    throw new IllegalStateException(
      s"txn index of $dir kept advancing across 8 lookup attempts", last)
  }

  /** (coverage, txn -> generation) read from ONE checkpoint file — the
    * newest at list time; a read that loses the race with a superseding
    * checkpoint's truncation re-lists (strictly newer state, bounded).
    */
  private def txnCheckpoint(dir: String): (Int, Map[Long, Int]) = {
    var last: Throwable = null
    (1 to 8).foreach { _ =>
      val n = checkpointCoverage(dir)
      if (n < 0) return (-1, Map.empty)
      try {
        val m = new String(Files.readAllBytes(
          new java.io.File(dir, s"_txn-ckpt-v$n.txt").toPath), StandardCharsets.UTF_8)
          .linesIterator.filter(_.nonEmpty).map { l =>
            val Array(t, g) = l.split(",", 2)
            t.toLong -> g.toInt
          }.toMap
        return (n, m)
      } catch {
        case e: java.nio.file.NoSuchFileException => last = e
      }
    }
    throw new IllegalStateException(
      s"txn checkpoint of $dir kept vanishing across 8 reads", last)
  }

  private def txnCkptFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("_txn-ckpt-v\\d+\\.txt"))

  /** Highest generation the newest txn checkpoint covers (-1 when none). */
  def checkpointCoverage(dir: String): Int =
    txnCkptFiles(dir)
      .map(_.getName.stripPrefix("_txn-ckpt-v").stripSuffix(".txt").toInt)
      .maxOption.getOrElse(-1)

  /** The newest txn checkpoint's txn -> generation map. Replay detection
    * reads this O(1) file plus only the post-checkpoint manifest tail,
    * instead of every `v<N>` manifest — the bound that keeps
    * `admitOnce` flat at 10^5 generations of continuous ingest. The map
    * also SURVIVES vacuuming the generations that carried the stamps
    * (see [[vacuumGenerations]]), so exactly-once holds across history
    * reclamation.
    */
  def txnIndex(dir: String): Map[Long, Int] = txnCheckpoint(dir)._2

  /** Consolidate every transactional (txn >= 0) stamp at or below the
    * current head into one checkpoint file named for its coverage,
    * then drop the older checkpoints it subsumes. Publish is a
    * write-then-hard-link CAS like the layout log's: a lost same-head
    * race is benign (both writers render identical content — the map is
    * deterministic from the chain). Returns the covered generation.
    */
  def checkpointTxns(dir: String): Int = {
    val head = currentGeneration(dir)
    require(head >= 0, s"$dir has no committed generation to checkpoint")
    // One consistent (coverage, map) read — a coverage re-read could
    // skip generations the map we hold does not cover.
    val (cov, prev) = txnCheckpoint(dir)
    val fresh = ((cov + 1) to head).filter(g => manifest(dir, g).isFile)
      .flatMap(g => { val t = txnOf(dir, g); if (t >= 0) Some(t -> g) else None })
    val all = prev ++ fresh
    val f = new java.io.File(dir, s"_txn-ckpt-v$head.txt")
    if (!f.isFile) {
      val tmp = new java.io.File(dir, s"._txn-ckpt-v$head.tmp-" +
        s"p${graft.JvmId.token}t${Thread.currentThread().getId}")
      Files.write(tmp.toPath, all.toSeq.sorted
        .map { case (t, g) => s"$t,$g" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      try Files.createLink(f.toPath, tmp.toPath)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp.toPath)
    }
    txnCkptFiles(dir)
      .filter(_.getName.stripPrefix("_txn-ckpt-v").stripSuffix(".txt").toInt < head)
      .foreach(old => Files.deleteIfExists(old.toPath))
    head
  }

  /** A lost generation compare-and-swap: the atomic-rename publish found
    * the target already committed by a concurrent writer. Marker type so
    * [[withChainRetry]] can rebase exactly these (still an
    * IllegalStateException for callers that match the loud-failure
    * contract).
    */
  final class ChainCasLostException(msg: String, cause: Throwable)
    extends IllegalStateException(msg, cause)

  /** Publish generation `gen` from a complete tmp: manifest last, then
    * one atomic rename.
    */
  def publish(dir: String, gen: Int, txn: Long, tmp: String): Unit = {
    Files.write(new java.io.File(tmp, "_graft_manifest.json").toPath,
      s"""{"generation":$gen,"txn":$txn}""".getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(Paths.get(dir))
    try Files.move(Paths.get(tmp), Paths.get(genDir(dir, gen)), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        throw new ChainCasLostException(
          s"generation $gen of $dir was committed by another writer", e)
    }
  }

  /** Writer-unique (process + thread) build dir: concurrent writers
    * preparing the SAME next generation write disjoint paths, so the
    * publish CAS loser's bytes are unreferenced garbage rather than a
    * silent overwrite of the winner's in-flight tmp — the
    * [[VersionedLayout]] writer-tag discipline applied to the chains.
    */
  def freshTmp(dir: String, gen: Int): String = {
    val tmp = s"$dir/.gen-tmp-v$gen-p${graft.JvmId.token}" +
      s"t${Thread.currentThread().getId}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    Files.createDirectories(Paths.get(tmp))
    tmp
  }

  /** OPTIMISTIC multi-writer mutation for the chain stores: run
    * `action`; if it loses the generation CAS to a concurrent writer,
    * re-run it against the new head. The rebase is correct for the
    * admit/retract family because each derives its artifacts
    * deterministically from (head at entry, the input batch) — the
    * re-run IS the same logical mutation serialized after the winner —
    * and writer-unique tmp dirs keep the loser's bytes out of every
    * read path. The exactly-once `*Once` entry points re-check their
    * txn stamp inside each attempt, so a batch the WINNER committed is
    * skipped, not duplicated. NOT for compact/vacuum: maintenance keeps
    * the single-writer contract (as [[VersionedLayout.withWriteRetry]]
    * documents for the layout's OPTIMIZE family).
    */
  def withChainRetry[T](attempts: Int = 5)(action: => T): T = {
    var last: Throwable = null
    (1 to attempts).foreach { _ =>
      try return action
      catch { case e: ChainCasLostException => last = e }
    }
    throw new IllegalStateException(
      s"lost the generation race $attempts times — livelocked against concurrent writers",
      last)
  }

  /** Drop generations BELOW `keepFrom` (caller asserts `keepFrom` is a
    * full-snapshot generation so the chain stays rooted). The txn stamps
    * of the generations about to vanish are consolidated into the txn
    * checkpoint FIRST — otherwise a restarted stream would re-commit a
    * vacuumed batch, breaking exactly-once across history reclamation.
    */
  def vacuumGenerations(dir: String, keepFrom: Int,
      orphanLeaseMs: Long = 15 * 60 * 1000L): Unit = {
    if (currentGeneration(dir) >= 0) checkpointTxns(dir)
    (0 until keepFrom).foreach { g =>
      val d = new java.io.File(genDir(dir, g))
      if (d.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    // Sweep abandoned writer tmps (crashed or CAS-lost attempts) past an
    // mtime lease. The lease checks the NEWEST mtime in the whole tree:
    // task part files land in subdirectories (`asg-delta/` etc.), which
    // updates the subdirectory's mtime, not the tmp root's — a root-only
    // check would sweep a >lease-long in-flight write out from under its
    // writer.
    val cutoff = System.currentTimeMillis() - orphanLeaseMs
    def newestMtime(f: java.io.File): Long =
      (f.lastModified() +: Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(newestMtime)).max
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".gen-tmp-")
        && newestMtime(f) <= cutoff)
      .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
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
        Seq(SnapshotCache.parquet(s, SnapshotCache.genStamp(dir, g), None,
          Seq(d.getAbsolutePath)).withColumn("_retract_gen", lit(g)))
      else Nil
    }
    segs.reduceOption(_ unionByName _)
      .map(_.groupBy(col(idCol)).agg(max(col("_retract_gen")).as("_retract_gen")))
  }
}
