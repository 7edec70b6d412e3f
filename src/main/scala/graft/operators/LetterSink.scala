package graft.operators

import java.io.BufferedWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference engine's sink: 26 per-letter text files `a.txt`..`z.txt`,
  * each line `word:[id1 id2 ... idn]`, ids ascending, lines ordered by
  * (doc_freq desc, word asc) WITHIN each letter file
  * (reference: tema1a/src/main.cpp:150-174). Letters with no words still
  * produce an EMPTY file (golden fixture test_out_small/d.txt is 0 bytes).
  *
  * Implementation: hash-repartition on the letter (each letter lands wholly
  * in exactly one task; a task may own several letters), sort within
  * partitions by (letter, doc_freq desc, word), and stream each task's rows
  * to its letter files. The explicit `repartition(26, letter)` pins the
  * partitioning so AQE coalescing cannot split a letter across tasks (AQE
  * only merges whole partitions, which preserves the one-task-per-letter
  * invariant).
  *
  * Commit protocol: each task writes a letter to a task-attempt-private
  * temp file (`.tmp-<letter>-<taskAttemptId>`) in UTF-8 and ATOMICALLY
  * renames it over `<letter>.txt` when that letter's rows are exhausted.
  * Readers therefore never observe a partial file, a retried task simply
  * re-renames a complete file over the previous one, and two concurrent
  * speculative attempts cannot interleave — each renames its own complete
  * temp, and whichever commits last wins wholesale. Failed attempts leave
  * only `.tmp-*` litter that the next successful rename ignores. (On a
  * multi-node cluster `outDir` must be a shared filesystem whose rename is
  * atomic — the same contract HDFS/NFS output committers rely on.)
  */
object LetterSink {

  /** Write the ranked index (columns: word, file_ids, doc_freq, letter) as
    * the reference's 26 per-letter files under `outDir`.
    */
  def write(index: DataFrame, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    ('a' to 'z').foreach { c =>
      Files.write(Paths.get(outDir, s"$c.txt"), Array.emptyByteArray)
    }
    val spark = index.sparkSession
    import spark.implicits._

    index
      .select(
        col("letter"),
        col("word"),
        col("file_ids").cast("array<int>"),
        col("doc_freq").cast("int"),
      )
      .repartition(26, col("letter"))
      .sortWithinPartitions(col("letter").asc, col("doc_freq").desc, col("word").asc)
      .as[(String, String, Seq[Int], Int)]
      .foreachPartition { (it: Iterator[(String, String, Seq[Int], Int)]) =>
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        var current: String = null
        var tmp: Path = null
        var out: BufferedWriter = null
        def commit(): Unit = if (out != null) {
          out.close(); out = null
          Files.move(tmp, Paths.get(outDir, s"$current.txt"),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
        try {
          it.foreach { case (letter, word, ids, _) =>
            if (letter != current) {
              commit()
              current = letter
              tmp = Paths.get(outDir, s".tmp-$letter-$attempt")
              out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
            }
            out.write(word)
            out.write(":[")
            out.write(ids.mkString(" "))
            out.write("]\n")
          }
          commit()
        } finally if (out != null) { out.close(); Files.deleteIfExists(tmp) }
      }
  }
}
