package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.VersionedLayout

/** STRUCTURED-STREAMING SOURCE over a [[graft.operators.VersionedLayout]]
  * change feed — the table-as-stream shape (`spark.readStream
  * .format("graft-layout").option("path", dir)`) a downstream index
  * subscribes to instead of re-reading the curated table per round.
  *
  * Offsets ARE commit-log versions: `getOffset` reports the head
  * version (pure log metadata — one directory listing, no data pass)
  * and `getBatch(start, end)` serves exactly
  * `changeFeed(startVersion, endVersion)` — the driver-composed plan
  * (segment scans for inserts, one bounded key join for delete
  * pre-images), never a driver-side row loop. Because the commit log
  * is immutable and append-only, any (start, end] range replays
  * byte-identically, which is what makes the engine's checkpointed
  * offsets EXACTLY-ONCE across restarts: a crashed trigger re-runs the
  * same version window and gets the same rows.
  *
  * The stream's schema is pinned at stream START — the schema of the
  * SUBSCRIPTION RANGE (startingVersion-1, head]. A range that already
  * crosses a typed re-add makes the subscription permanently TAGGED:
  * every batch serves the per-incarnation `name__as_<type>` columns
  * ([[graft.operators.VersionedLayout.changeFeedTagged]]), so both
  * incarnations arrive intact — this is how the source COMPOSES with
  * `changeFeedWindows`' window semantics. Later batches are CONFORMED
  * to the pinned schema: columns added by LATER evolution are dropped
  * until the subscriber re-subscribes, a column retired by a later
  * drop null-fills, and a flip happening AFTER stream start leaves
  * the new incarnation out (or fails the cast loudly under ANSI)
  * rather than corrupting the old column — re-subscribing at the flip
  * is the window split `changeFeedWindows` names.
  *
  * Options: `path` (the layout root, required); `startingVersion` (the
  * first change version to serve, default 1 — i.e. every change after
  * the base write).
  */
final class LayoutChangeSource(
    spark: SparkSession, dir: String, startExclusive: Int)
  extends Source {

  // Pinned at creation: the schema of the SUBSCRIPTION RANGE
  // (startExclusive, head-at-start]. If that range already crosses a
  // type flip, the subscription is permanently TAGGED — every batch
  // (including later in-window ones that would carry the plain name)
  // serves the per-incarnation `name__as_<type>` columns, so the
  // crossing history's both incarnations arrive intact instead of
  // being conformed away (plan-time only, no job).
  private val head0 = VersionedLayout.currentVersion(dir)
  require(head0 >= 0, s"no committed layout at $dir")
  private val tagged = head0 > startExclusive &&
    VersionedLayout.changeFeedWindows(spark, dir, startExclusive, head0).size > 1
  private def feedOf(fromV: Int, toV: Int): DataFrame =
    if (tagged) VersionedLayout.changeFeedTagged(spark, dir, fromV, toV)
    else VersionedLayout.changeFeed(spark, dir, fromV, toV)
  override val schema: StructType =
    feedOf(startExclusive, math.max(head0, startExclusive)).schema

  private def ver(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => LongOffset(s).offset.toInt
    case other => other.json().trim.toInt
  }

  override def getOffset: Option[Offset] = {
    val head = VersionedLayout.currentVersion(dir)
    if (head <= startExclusive) None else Some(LongOffset(head.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startExclusive)
    val toV = ver(end)
    val feed = feedOf(fromV, toV)
    // Conform to the stream-start schema (see class doc).
    val conformed = feed.select(schema.fields.toSeq.map { f =>
      if (feed.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // The DSv1 contract wants the batch frame MARKED streaming: hand
    // the engine the planned feed as a streaming-tagged LogicalRDD
    // (the physical plan — segment scans + the bounded delete-preimage
    // join — is unchanged; only the flag differs). See
    // [[org.apache.spark.sql.graftshim.StreamingShim]].
    org.apache.spark.sql.graftshim.StreamingShim.asStreaming(spark, conformed, schema)
  }

  override def stop(): Unit = ()
}

/** `format("graft-layout")` registration (DSv1 streaming provider —
  * the getBatch-returns-a-DataFrame contract is exactly what lets the
  * feed's delete-pre-image JOIN ride the source, which a DSv2
  * partition reader could not express).
  */
final class LayoutChangeSourceProvider
  extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-layout"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-layout source requires option 'path' (the layout root)"))

  private def startExclusiveOf(parameters: Map[String, String]): Int = {
    val startingVersion = parameters.get("startingVersion").map(_.toInt).getOrElse(1)
    require(startingVersion >= 1,
      s"startingVersion must be >= 1 (got $startingVersion) — v0 is the base write, not a change")
    startingVersion - 1
  }

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-layout source derives its schema from the layout")
    // One throwaway source — schema resolution shares the real
    // subscription-range (and flip-tagging) logic exactly.
    (shortName(), new LayoutChangeSource(sqlContext.sparkSession,
      dirOf(parameters), startExclusiveOf(parameters)).schema)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LayoutChangeSource(sqlContext.sparkSession, dirOf(parameters),
      startExclusiveOf(parameters))
}
