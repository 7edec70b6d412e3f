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
        // Paths are URI-encoded, so decode — but '+' in a URI PATH is a
        // literal plus (only query strings encode spaces as '+'), while
        // url_decode treats it as a space; protect it as %2B first or a
        // manifest path containing '+' silently matches nothing and the
        // inner join drops every line of that file.
        url_decode(regexp_replace(
          regexp_replace(input_file_name(), "^file:/+", "/"),
          "\\+", "%2B")).as("path"),
        col("value").as("line"),
      )
    // Guard the decode logic without touching data: round-trip each
    // manifest path through the same URI encoding the scan will emit and
    // the same decode the column above applies. A mismatch would silently
    // lose the whole file to the inner join — fail at plan time instead.
    manifest.foreach { case (_, path) =>
      val uri = Paths.get(path).toUri.toASCIIString
      val normalized = uri.replaceFirst("^file:/+", "/").replace("+", "%2B")
      val decoded = java.net.URLDecoder.decode(normalized, "UTF-8")
      require(decoded == path,
        s"manifest path would not survive the scan's URI round-trip: '$path' -> '$decoded'")
    }
    raw
      .join(broadcast(byPath), Seq("path"))
      .select(col("file_id"), col("line"))
  }
}
