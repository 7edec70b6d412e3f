package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted base+delta inverted-index chain with COMPACTION — the
  * maintenance step q146's algebraic merge implies but never
  * materializes: under continuous ingest each batch appends a small
  * `delta-N` index (only the batch is tokenized), readers pay an N-way
  * posting-list union, and an explicit `compact()` rewrites the chain
  * back to a single base so steady-state reads return to one table
  * scan. Complements [[InvertedIndex.retract]] (q149) on the additive
  * side: together the persisted index supports append, delete, and
  * physical reorganization without ever re-reading the corpus.
  *
  * Crash-safety is by MERGE IDEMPOTENCE: posting-list union is
  * idempotent and associative, so if compact() dies between publishing
  * the merged base and dropping the deltas, a reader merges
  * already-merged lists and gets the identical index — never a wrong
  * answer, only a redundant union until the cleanup is retried (the
  * same argument, in the index algebra, as DeletableRangeLayout's
  * stale-tombstone masking). Mutators assume a single writer, like a
  * table format whose commit log serializes them; readers are safe at
  * every intermediate state.
  *
  * At 100 TB: deltas are bounded by batch size (tokenizing a batch
  * never touches the base), the read-side union is one groupBy at index
  * grain (words), and compaction cost is proportional to the INDEX, not
  * the corpus — the corpus is never re-tokenized.
  *
  * Stored row shape: (word, file_ids sorted distinct array) — exactly
  * [[InvertedIndex.index]]'s first two columns; doc_freq/letter are
  * derivable and recomputed on read.
  */
object IndexStore {

  private val lock = new Object

  private val indexSchema = StructType(Seq(
    StructField("word", StringType),
    StructField("file_ids", ArrayType(LongType))))

  private def baseDir(store: String) = s"$store/base"

  /** Existing delta dirs, ascending by sequence number. */
  private def deltaDirs(store: String): Seq[String] = {
    val fs = Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.isDirectory && f.getName.startsWith("delta-"))
      .sortBy(_.getName.stripPrefix("delta-").toInt).map(_.getPath).toSeq
  }

  private def writeAtomic(df: DataFrame, dest: String): Unit = {
    val tmp = dest + s".tmp-p${ProcessHandle.current().pid()}"
    df.select(col("word"), col("file_ids")).write.mode("overwrite").parquet(tmp)
    val live = Paths.get(dest)
    val old = Paths.get(dest + s".old-p${ProcessHandle.current().pid()}")
    if (Files.exists(live)) Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), live, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }

  /** Create the store with `df` as its base (no-op if it exists). */
  def init(df: DataFrame, store: String): Unit = lock.synchronized {
    if (!new java.io.File(baseDir(store)).isDirectory) {
      Files.createDirectories(Paths.get(store))
      writeAtomic(df, baseDir(store))
    }
  }

  /** Append one ingest batch's index as the next delta in the chain. */
  def appendDelta(df: DataFrame, store: String): String = lock.synchronized {
    val next = deltaDirs(store).size + 1
    val dest = s"$store/delta-$next"
    writeAtomic(df, dest)
    dest
  }

  /** N-way index merge at index grain: posting lists unioned (inputs
    * already sorted+distinct), nothing re-tokenized. One groupBy over
    * index rows; a single input passes through untouched.
    */
  def mergeAll(sides: Seq[DataFrame]): DataFrame = sides match {
    case Seq(one) => one.select(col("word"), col("file_ids"))
    case many => many.map(_.select(col("word"), col("file_ids")))
      .reduce(_ unionByName _)
      .groupBy(col("word"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("file_ids")))))
        .as("file_ids"))
  }

  /** The reader contract: base ∪ deltas, merged. Readable at every
    * intermediate mutation state (see object scaladoc).
    */
  def read(s: SparkSession, store: String): DataFrame = {
    val dirs = baseDir(store) +: deltaDirs(store)
    mergeAll(dirs.map(d => s.read.schema(indexSchema).parquet(d)))
  }

  /** Rewrite base := merge(base, deltas), then drop the deltas. Returns
    * the number of deltas folded in (0 = chain already compact, no-op —
    * the base is NOT rewritten in that case).
    */
  def compact(s: SparkSession, store: String): Int = lock.synchronized {
    val deltas = deltaDirs(store)
    if (deltas.isEmpty) return 0
    // Materialize off the input files so the swap below can't race the
    // merge's own (lazy) reads of the old base.
    val merged = read(s, store).localCheckpoint()
    writeAtomic(merged, baseDir(store))
    deltas.foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    deltas.size
  }
}
