package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
  * the base write); `maxVersionsPerTrigger` (admission control for
  * catching-up subscribers, the `maxFilesPerTrigger` shape: cap each
  * micro-batch at N commit versions instead of planning one giant
  * (lastSeen, head] batch — at 100 TB a fresh subscriber of a
  * long-lived table must drain the backlog in bounded bites, not in
  * one trigger whose shuffle holds the whole history). The cap is a
  * BATCH BOUNDARY choice only — the union of the rate-limited batches
  * is byte-identical to the unlimited subscription, and exactly-once
  * survives restarts because the reporting position is persisted under
  * the query's own `metadataPath` (a regressed in-memory tracker could
  * otherwise re-report an old head after a restart whose last batch
  * already committed, and the engine's inequality test would replan
  * it).
  */
final class LayoutChangeSource(
    spark: SparkSession, dir: String, startExclusive: Int,
    maxVersionsPerTrigger: Option[Int] = None,
    metadataPath: Option[String] = None)
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

  // Rate-limit bookkeeping: the highest version this source has ever
  // REPORTED or SERVED. Persisted (tiny single-line file under the
  // query's metadataPath) so a restart whose last batch committed
  // cannot regress the next reported offset below the committed one —
  // the engine compares offsets by INEQUALITY, so a regressed report
  // would schedule a bogus backwards batch. Unlimited sources skip all
  // of this (head is monotone by construction).
  private val rateFile = metadataPath.map { p =>
    // metadataPath may arrive scheme-qualified (file:/...); resolve it
    // the way the layout resolves everything else — local filesystem
    // semantics (an object-store deployment would swap this single
    // touch point for its FileSystem API, like the commit log's CAS).
    val plain = if (p.startsWith("file:"))
      new java.io.File(java.net.URI.create(p).getPath)
    else new java.io.File(p)
    new java.io.File(plain, "graft-max-served")
  }
  private var maxServed: Int = rateFile match {
    case Some(f) if f.isFile =>
      val s0 = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      math.max(startExclusive, s0.toInt)
    case _ => startExclusive
  }
  // Persisted from getBatch ONLY: every batch — fresh, or replayed
  // after a crash — passes through getBatch before the engine commits
  // it, so the file always covers the engine's committed offset; a
  // getOffset-time persist would instead inflate the cap after a crash
  // between getOffset and getBatch (the next report would start from
  // the never-run batch's end).
  private def noteServed(v: Int): Unit = if (v > maxServed) {
    maxServed = v
    rateFile.foreach { f =>
      f.getParentFile.mkdirs()
      val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
      java.nio.file.Files.write(tmp.toPath,
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def getOffset: Option[Offset] = {
    val head = VersionedLayout.currentVersion(dir)
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(head, maxServed + n)
      case None => head
    }
    if (capped <= startExclusive) None else Some(LongOffset(capped.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startExclusive)
    val toV = ver(end)
    noteServed(math.max(fromV, toV))
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

/** BATCH-read handle for the layout (round 15): `spark.read
  * .format("graft-layout").load(dir)` — options `versionAsOf` /
  * `timestampAsOf` (mutually exclusive; default = head at read time).
  * The version is PINNED at table-resolution time, so the schema this
  * table reports and the plan that later replaces it can never see
  * different log states. The table deliberately carries no working
  * ScanBuilder: batch reads are planned by
  * [[graft.plans.GraftBatchReadRule]], which swaps the relation for
  * the engine's own as-of plan (union of parquet scans + tombstone
  * masks) — the SAME plan `VersionedLayout.readAsOf` builds, keeping
  * pushdown into the underlying scans and every layout guarantee. A
  * session without the graft extensions fails loudly here instead of
  * silently serving nothing.
  */
object GraftLayoutTable {
  /** Nonzero once any batch-format table was resolved in this JVM —
    * [[graft.plans.GraftBatchReadRule]]'s O(1) analyzer fast path.
    */
  val everCreated = new java.util.concurrent.atomic.AtomicLong(0L)
}

final case class GraftLayoutTable(dir: String, asOfVersion: Int,
    tableSchema: StructType) extends Table with SupportsRead {
  GraftLayoutTable.everCreated.incrementAndGet()
  override def name(): String = s"graft-layout `$dir` v$asOfVersion"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      "graft-layout batch reads are planned by graft.plans.GraftBatchReadRule — " +
        "install the engine extensions (spark.sql.extensions=graft.GraftExtensions)")
}

/** `format("graft-layout")` registration (DSv1 streaming provider —
  * the getBatch-returns-a-DataFrame contract is exactly what lets the
  * feed's delete-pre-image JOIN ride the source, which a DSv2
  * partition reader could not express). Also a DSv2 [[TableProvider]]
  * for BATCH reads (see [[GraftLayoutTable]]); Spark's stream reader
  * probes the v2 table first, finds no streaming capability, and falls
  * back to this same provider's DSv1 source — one `shortName`, both
  * directions.
  */
final class LayoutChangeSourceProvider
  extends StreamSourceProvider with DataSourceRegister with TableProvider {

  override def shortName(): String = "graft-layout"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-layout source requires option 'path' (the layout root)"))

  /** Resolve (dir, pinned version) from batch-read options. */
  private def batchTarget(options: CaseInsensitiveStringMap): (String, Int) = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-layout requires option 'path' (the layout root)"))
    val vOpt = Option(options.get("versionAsOf")).map(_.toInt)
    val tsOpt = Option(options.get("timestampAsOf")).map(_.toLong)
    require(vOpt.isEmpty || tsOpt.isEmpty,
      "graft-layout: versionAsOf and timestampAsOf are mutually exclusive")
    val head = VersionedLayout.currentVersion(dir)
    require(head >= 0, s"no committed layout at $dir")
    val v = vOpt.orElse(tsOpt.map(VersionedLayout.versionAtTimestamp(dir, _)))
      .getOrElse(head)
    (dir, v)
  }

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (dir, v) = batchTarget(options)
    // Plan-level only — building the as-of frame runs zero jobs.
    VersionedLayout.readAsOf(SparkSession.active, dir, v).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val (dir, v) = batchTarget(new CaseInsensitiveStringMap(properties))
    GraftLayoutTable(dir, v, schema)
  }

  private def startExclusiveOf(parameters: Map[String, String]): Int = {
    val sv = parameters.get("startingVersion").map(_.toInt)
    val st = parameters.get("startingTimestamp").map(_.toLong)
    require(sv.isEmpty || st.isEmpty,
      "graft-layout source: startingVersion and startingTimestamp are mutually exclusive")
    st match {
      // "Subscribe from time T" (round 15): resolve T on the same
      // monotonicized commit-time axis as the batch feed, so the
      // subscription serves exactly changeFeedByTimestamp(T, head] —
      // changes AFTER the version T resolves to. Resolution happens
      // ONCE at stream start (the offset axis stays versions; restarts
      // recover from the checkpointed version offsets, immune to any
      // later wall-clock weirdness).
      case Some(ts) => VersionedLayout.versionAtTimestamp(dirOf(parameters), ts)
      case None =>
        val startingVersion = sv.getOrElse(1)
        require(startingVersion >= 1,
          s"startingVersion must be >= 1 (got $startingVersion) — v0 is the base write, not a change")
        startingVersion - 1
    }
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

  private def maxPerTriggerOf(parameters: Map[String, String]): Option[Int] = {
    val m = parameters.get("maxVersionsPerTrigger").map(_.toInt)
    m.foreach(n => require(n >= 1, s"maxVersionsPerTrigger must be >= 1 (got $n)"))
    m
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LayoutChangeSource(sqlContext.sparkSession, dirOf(parameters),
      startExclusiveOf(parameters), maxPerTriggerOf(parameters),
      Some(metadataPath))
}
