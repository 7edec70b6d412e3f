package graft.operators

import org.apache.spark.sql.SparkSession

import graft.sources.ManifestSource

/** End-to-end equivalent of the reference CLI `./tema1 M R manifest`
  * (reference: tema1a/src/main.cpp:179-270). M/R thread counts are
  * scheduling hints in the reference with no semantic effect (the checker
  * requires identical output for all nine M×R combos); in Spark the
  * scheduler plays that role, so they are simply not parameters here.
  */
object ReferenceJob {
  def run(spark: SparkSession, manifestPath: String, outDir: String): Unit = {
    val manifest = ManifestSource.read(manifestPath)
    val lines = ManifestSource.lines(spark, manifest)
    val index = InvertedIndex.fromLines(lines, "file_id", "line")
    LetterSink.write(index, outDir)
  }

  def main(args: Array[String]): Unit = {
    val Array(manifestPath, outDir) = args.takeRight(2)
    val spark = graft.GraftSession.local("graft-inverted-index")
    try run(spark, manifestPath, outDir)
    finally spark.stop()
  }
}
