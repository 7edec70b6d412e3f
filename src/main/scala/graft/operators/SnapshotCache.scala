package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped SNAPSHOT-METADATA cache shared by the engine's
  * stores (round 17, optimization guide §5/§6).
  *
  * Measured on this box (PlanCost, warm): one `spark.read.parquet`
  * call against an already-written source costs 314-427 ms of pure
  * driver time (path resolution + file listing + footer schema
  * inference) before a single row is read — and the engine's
  * multi-version readers rebuild the same relations dozens of times
  * per query, so plan construction dominated the layout family's
  * bench time (q220: 6.6 s of 7.5 s was DataFrame building).
  *
  * This is the cache every table format ships (Delta's snapshot
  * cache, Iceberg's metadata cache, Spark's own
  * filesourcePartitionFileCacheSize for catalog tables — path-based
  * reads bypass that built-in one). NOTHING HERE CACHES DATA: every
  * execution still scans parquet bytes from disk; what is reused is
  * the resolved relation (file list + schema) and composed logical
  * plans.
  *
  * Soundness: keys carry (a) the owning SparkSession (plans are
  * session-bound), and (b) a caller-supplied STAMP naming the
  * snapshot's identity — the layout uses its log head
  * (version + commit ts + writer tag), the generation chains use the
  * owning generation's manifest (mtime + length). Both change on any
  * commit AND on a same-path scenario rebuild; within one stamp the
  * underlying directories are immutable by construction (generation
  * dirs publish by atomic rename; layout artifacts only ever change
  * across commits). Bounded: cleared wholesale past 512 entries — a
  * wipe only costs the next build.
  */
private[graft] object SnapshotCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def plan(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (s, key)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val df = build
      if (cache.size() > 512) cache.clear()
      cache.put(k, df)
      df
    }
  }

  /** One resolved parquet relation per (session, stamp, source paths):
    * file listing and footer schema inference happen once per snapshot
    * instead of once per plan build.
    */
  def parquet(s: SparkSession, stamp: String,
      basePath: Option[String], paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    plan(s, s"pq|$stamp|${basePath.getOrElse("")}|${paths.mkString(",")}") {
      val rd0 = basePath.map(b => s.read.option("basePath", b)).getOrElse(s.read)
      val rd = schema.map(rd0.schema).getOrElse(rd0)
      rd.parquet(paths: _*)
    }

  /** A generation-chain snapshot stamp: the owning generation's
    * manifest identity (a published generation is immutable; a
    * same-path rebuild rewrites the manifest, changing its mtime).
    */
  def genStamp(dir: String, gen: Int): String = {
    val m = GenChain.manifest(dir, gen)
    s"g$gen:${m.lastModified()}:${m.length()}"
  }
}
