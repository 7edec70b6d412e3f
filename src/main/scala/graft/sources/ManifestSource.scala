package graft.sources

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's input source: a manifest file whose first line is a
  * count N followed by N file paths (reference: tema1a/src/main.cpp:188-200).
  * File IDs are the 1-BASED POSITION IN THE MANIFEST (main.cpp:103), so ids
  * are assigned on the driver from manifest order — never inferred from
  * `input_file_name()` ordering, which is nondeterministic.
  *
  * Scale notes: the manifest itself is metadata (one line per file), so
  * reading it driver-side is correct at any scale; the DATA is read by
  * `spark.read.text` over all paths (distributed, splittable), and the tiny
  * (path -> id) mapping is broadcast-joined onto it. No data-scale bytes ever
  * pass through the driver.
  */
object ManifestSource {

  /** Parse the manifest into (fileId, absolutePath), ids 1-based in manifest
    * order. Relative paths resolve against the manifest's directory.
    */
  def read(manifestPath: String): Seq[(Int, String)] = {
    val p = Paths.get(manifestPath)
    val lines = Files.readAllLines(p).asScala.toSeq
    val n = lines.head.trim.toInt
    val dir: Path = Option(p.getParent).getOrElse(Paths.get("."))
    lines.slice(1, 1 + n).zipWithIndex.map { case (rel, i) =>
      val f = dir.resolve(rel.trim).normalize()
      (i + 1, f.toAbsolutePath.toString)
    }
  }

  /** DataFrame of (file_id: Int, line: String): all files read distributed,
    * each line tagged with the 1-based manifest id of its file.
    */
  def lines(spark: SparkSession, manifest: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    val byPath = manifest.map { case (id, path) => (path, id) }.toDF("path", "file_id")
    val raw = spark.read
      .textFile(manifest.map(_._2): _*)
      .select(
        // input_file_name() yields a URI ("file:///root/..."); normalize the
        // scheme back to a plain absolute path to join against the manifest.
        // Paths are URI-encoded, so decode (reference corpora are plain ASCII,
        // but keep it correct for e.g. spaces).
        url_decode(regexp_replace(input_file_name(), "^file:/+", "/")).as("path"),
        col("value").as("line"),
      )
    raw
      .join(broadcast(byPath), Seq("path"))
      .select(col("file_id"), col("line"))
  }
}
