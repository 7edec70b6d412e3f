package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a [[VersionedLayout]] commit log —
  * the refresh path for derived aggregates: instead of rescanning the
  * table at every version, the materialized aggregate is updated by
  * each commit's bounded delta. An insert segment ADDS its aggregate; a
  * delete/upsert SUBTRACTS the aggregate of exactly the rows its
  * tombstones killed (recovered by a key join against the pre-state,
  * work proportional to the DELETE, not the table); a compaction and a
  * vacuum contribute nothing (no logical change). Exact for abelian
  * aggregates (count/sum) because the version-stamp rule makes each
  * commit's kill set disjoint from its insert set.
  *
  * [[audit]] additionally recomputes every version from scratch and
  * emits an `incremental_ok` flag per version — at 100 TB only the
  * incremental path runs; the recompute is the proof harness
  * (registry-surfaced as q162, where the oracle pins the flag TRUE).
  * Both sides run as ONE grouped aggregation each (union-all tagged by
  * version), so the whole audit is two jobs plus a bounded driver fold.
  *
  * Scope: this audit is a CONSUMER of the (table-generic) commit log,
  * bound to the lineitem layout's columns because its aggregates are
  * lineitem semantics — the generic surface is [[VersionedLayout]]'s
  * change feed, from which any table's consumer derives its own deltas
  * the same way (insert segments add, tombstone-killed rows subtract).
  */
object IncrementalView {

  private val key = Seq("pid", "l_orderkey", "l_linenumber", "v")

  /** (version -> (n_rows, sum v, sum quantity-centi)) for every logged
    * version, recomputed FROM SCRATCH — but in ONE shared-scan pass
    * instead of one as-of subtree per version (the round-13 profile:
    * the union-of-readAsOf spelling scanned the base five times and
    * re-ran a tombstone anti-join per version). Every logical row is
    * read ONCE (the v0 base through normal archive routing, plus each
    * insert/upsert segment) and tagged with its BIRTH version; its
    * DEATH is the first tombstone version above its birth (the
    * version-stamp rule), resolved by one broadcast join against the
    * bounded per-key tombstone-version lists; the row then contributes
    * to exactly the versions in [birth, death) via a sequence-explode
    * that partial aggregation collapses map-side. Still a recompute
    * independent of the incremental ledger — the proof semantics are
    * unchanged; only the pass count is.
    */
  def fullAggregates(s: SparkSession, dir: String): Map[Int, (Long, Long, Long)] = {
    val qtyCenti = expr("CAST(round(l_quantity * 100) AS BIGINT)")
    val entries = VersionedLayout.log(dir)
    val head = entries.last.version
    val base = VersionedLayout.readAsOf(s, dir, 0).withColumn("_birth", lit(0))
    val segs = entries
      .filter(e => e.action == "insert" || e.action == "upsert")
      .map(e => VersionedLayout.insertsAt(s, dir, e.version)
        .withColumn("_birth", lit(e.version)))
    // `v` is both a key column and the summed measure — select it once
    // (through the key list).
    val rows = (base +: segs).reduce(_ unionByName _)
      .select(Seq(col("_birth"), qtyCenti.as("qc")) ++ key.map(col): _*)
    val tombVers = entries
      .filter(e => e.action == "delete" || e.action == "upsert").map(_.version)
    val joined = tombVers match {
      case Nil => rows.withColumn("_death", lit(head + 1))
      case tvs =>
        // One (key -> sorted tombstone-version list) row per
        // ever-deleted key. No explicit broadcast hint: the set is
        // delta-sized in practice, but it accumulates over the WHOLE
        // history, so a delete-heavy table could outgrow the broadcast
        // limit — let AQE pick broadcast at runtime from the actual
        // post-agg size and fall back to shuffle when it doesn't fit
        // (round-13 advisor).
        val tombs = tvs.map(tv => VersionedLayout.tombstonesAt(s, dir, tv)
            .select(key.map(col) :+ lit(tv).as("_tv"): _*))
          .reduce(_ unionByName _)
          .groupBy(key.map(col): _*)
          .agg(sort_array(collect_list(col("_tv"))).as("_tvs"))
        rows.join(tombs, key, "left")
          .withColumn("_death", coalesce(
            // get (0-based) returns NULL for an empty filter result —
            // an upsert replacement whose only tombstones sit at or
            // below its own birth (ANSI element_at would throw there).
            get(filter(col("_tvs"), t => t > col("_birth")), lit(0)),
            lit(head + 1)))
    }
    val aggregated = joined
      .select(explode(sequence(col("_birth"),
        least(col("_death") - 1, lit(head)))).as("version"),
        col("v"), col("qc"))
      .groupBy(col("version"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("tc"), sum(col("qc")).as("qc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Metadata-only versions below the first data (none in practice)
    // and fully-erased windows aggregate to zero, not to a missing key.
    entries.map(e => e.version -> aggregated.getOrElse(e.version, (0L, 0L, 0L))).toMap
  }

  /** (version -> signed delta) for every mutating commit, in one
    * grouped aggregation: inserts count +1, tombstone-killed rows -1.
    */
  def commitDeltas(s: SparkSession, dir: String): Map[Int, (Long, Long, Long)] = {
    val qtyCenti = expr("CAST(round(l_quantity * 100) AS BIGINT)")
    val parts = VersionedLayout.log(dir).flatMap { e =>
      val ins =
        if (e.action == "insert" || e.action == "upsert")
          Seq(VersionedLayout.insertsAt(s, dir, e.version)
            .select(lit(e.version).as("version"), lit(1L).as("sign"),
              col("v"), qtyCenti.as("qc")))
        else Nil
      val killed =
        if (e.action == "delete" || e.action == "upsert")
          Seq(VersionedLayout.readAsOf(s, dir, e.version - 1)
            .join(VersionedLayout.tombstonesAt(s, dir, e.version)
              .select(key.map(col): _*), key, "left_semi")
            .select(lit(e.version).as("version"), lit(-1L).as("sign"),
              col("v"), qtyCenti.as("qc")))
        else Nil
      ins ++ killed
    }
    if (parts.isEmpty) Map.empty
    else parts.reduce(_ unionByName _)
      .groupBy(col("version"))
      .agg(sum(col("sign")).as("n"), sum(col("sign") * col("v")).as("tc"),
        sum(col("sign") * col("qc")).as("qc"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  /** The maintained view per version (seeded by v0's full aggregate,
    * refreshed by each commit's delta) alongside the from-scratch
    * answer: (version, n_rows, total_centi, qty_centi, incremental_ok).
    */
  def audit(s: SparkSession, dir: String): DataFrame = {
    val fulls = fullAggregates(s, dir)
    val deltas = commitDeltas(s, dir)
    val rows = VersionedLayout.log(dir).scanLeft((-1, fulls(0))) {
      case ((_, (n, tc, qc)), e) =>
        val (dn, dtc, dqc) =
          if (e.version == 0) (0L, 0L, 0L)
          else deltas.getOrElse(e.version, (0L, 0L, 0L))
        (e.version, (n + dn, tc + dtc, qc + dqc))
    }.drop(1).map { case (ver, mv @ (n, tc, qc)) =>
      (ver.toLong, n, tc, qc, mv == fulls(ver))
    }
    import s.implicits._
    rows.toDF("version", "n_rows", "total_centi", "qty_centi", "incremental_ok")
      .orderBy(col("version"))
  }
}
