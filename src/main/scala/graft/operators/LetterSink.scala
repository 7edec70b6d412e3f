package graft.operators

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths}

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
  * invariant; sortWithinPartitions order survives a merge of disjoint letter
  * sets only because rows are letter-prefixed and merged partitions are
  * concatenated — we disable coalescing ambiguity entirely by writing from
  * the pinned 26-partition exchange).
  *
  * Each letter file is opened in TRUNCATE mode by the single task that owns
  * the letter, so task retries are idempotent. Files are pre-created empty on
  * the driver for the empty-letter invariant. At cluster scale the same
  * pattern writes to a shared filesystem via temp-file + atomic rename; the
  * local test harness keeps it simple.
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
        var current: String = null
        var out: BufferedWriter = null
        try {
          it.foreach { case (letter, word, ids, _) =>
            if (letter != current) {
              if (out != null) out.close()
              out = new BufferedWriter(
                new FileWriter(new File(outDir, s"$letter.txt"), false))
              current = letter
            }
            out.write(word)
            out.write(":[")
            out.write(ids.mkString(" "))
            out.write("]\n")
          }
        } finally if (out != null) out.close()
      }
  }
}
