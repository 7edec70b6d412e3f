package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Event-family invariants beyond the oracle: the schema-on-read
  * dead-letter routing (q102) and Markov row-normalization (q103).
  */
class ExtrasSpec extends SparkSpec {

  test("from_json schema-on-read routes malformed documents to NULL, not failure") {
    // The q102 scale contract: a 100 TB ingest ALWAYS contains broken
    // JSON; PERMISSIVE parsing turns each broken row into a NULL struct
    // (counted, not thrown), so one bad document cannot kill the job.
    val spark0 = spark
    import spark0.implicits._
    val props = Seq(
      """{"k": 7}""", // well-formed
      """{"k": "not a number"}""", // type mismatch -> k NULL
      """{"j": 1}""", // missing field -> k NULL
      """{broken""", // malformed -> NULL struct
      "", // empty -> NULL struct
    ).toDF("props")
    val ks = props
      .select(from_json(col("props"),
        StructType(Seq(StructField("k", LongType)))).getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(ks == Seq(Some(7L), None, None, None, None), ks.toString)
  }

  test("q103 transition probabilities are row-normalized (milli rows sum to ~1000)") {
    val rows = SparkEntry.queries("q103_markov_transitions")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // floor() loses < 1 milli per cell: each source type's outgoing row
    // must sum within (1000 - n_cells, 1000].
    rows.groupBy(_.getString(0)).foreach { case (src, out) =>
      val s = out.map(_.getLong(3)).sum
      assert(s <= 1000 && s > 1000 - out.length, s"$src: p_milli sum $s over ${out.length} cells")
    }
    // Conservation: total transitions = total events - one per user
    // (each user's last event has no successor).
    val events = Tables.events(spark, sf0001)
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("q128 retention cohorts: day-0 is total, cells bounded by cohort size, sizes partition the users") {
    val rows = SparkEntry.queries("q128_retention_cohorts")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (c, o, active, size, mille) =>
      assert(o >= 0, s"cohort $c has a negative offset $o")
      assert(active >= 1 && active <= size, s"cell ($c,$o): n_active $active vs size $size")
      assert(mille == 1000L * active / size, s"cell ($c,$o): per-mille not exact-integer")
    }
    // Day 0 of every cohort is by definition the whole cohort.
    rows.filter(_._2 == 0L).foreach { case (c, _, active, size, mille) =>
      assert(active == size && mille == 1000, s"cohort $c day-0 not total")
    }
    // Cohorts partition the user base: sizes sum to the distinct-user count.
    val sizes = rows.groupBy(_._1).map { case (_, rs) => rs.head._4 }
    val nUsers = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(sizes.sum == nUsers, s"cohort sizes ${sizes.sum} != $nUsers users")
    // The grid must discriminate: not every cell fully retained.
    assert(rows.exists(_._5 < 1000), "retention grid is degenerate (all 1000)")
  }

  test("q148 burstiness equals driver-side exact moments; synthetic arrivals read Poisson-like") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(r => (r._1, r._2)).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._3, r._4)).map(_._3)
      ts.sliding(2).filter(_.length == 2).map(w => (rows.head._2, (w(1) - w(0)) / 1000000))
    }.toSeq
    val got = SparkEntry.queries("q148_arrival_burstiness")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (ty, n, mean, cv) =>
      val g = gaps.filter(_._1 == ty).map(_._2)
      assert(n == g.length, s"$ty n_gaps")
      val (sx, sxx) = (BigInt(g.sum), g.map(x => BigInt(x) * x).sum)
      assert(mean == (sx / n).toLong, s"$ty mean")
      val want = math.floor(1000.0 *
        math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) / sx.toDouble).toLong
      assert(cv == want, s"$ty cv $cv != $want")
      // The generator is memoryless by construction; cv must sit near
      // the exponential's 1000 per-mille, not at heartbeat (~0) or
      // heavy-burst (>2000) regimes.
      assert(cv > 700 && cv < 1400, s"$ty cv $cv outside the Poisson band")
    }
  }

  test("q144 top paths equal a driver-side trigram count under the same total order") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(w => (w(0), w(1), w(2))).toSeq
    }.toSeq.groupMapReduce(identity)(_ => 1L)(_ + _)
      .toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = SparkEntry.queries("q144_top_paths")(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    assert(got.toSeq == want, s"top-20 paths differ\n got: ${got.take(3).mkString}\nwant: ${want.take(3).mkString}")
  }

  test("q139 point-in-time snapshot equals a driver-side replay of the changelog") {
    val t0 = queries.Extras.snapshotTUs
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = SparkEntry.queries("q139_snapshot_as_of")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == ev.map(_._1).distinct.length, "one row per user")
    got.foreach { case (uid, atT, latest, nAfter, changed) =>
      val mine = ev.filter(_._1 == uid)
      def top(rows: Seq[(Long, Long, Long, Long)]) =
        rows.maxByOption(r => (r._2, r._3)).map(_._4)
      assert(latest == top(mine).get, s"user $uid latest")
      assert(atT == top(mine.filter(_._2 <= t0)).getOrElse(-1L), s"user $uid as-of")
      assert(nAfter == mine.count(_._2 > t0), s"user $uid n_after")
      val expectChanged =
        top(mine.filter(_._2 <= t0)).isEmpty ||
          mine.maxBy(r => (r._2, r._3))._2 > t0
      assert(changed == (if (expectChanged) 1L else 0L), s"user $uid changed flag")
    }
  }

  test("q136 per-source KS drift equals a driver-side brute force over binned CDFs") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val w = queries.TextAnalysis.driftBinChars
    val bins = rows.map(_._2 / w).distinct.sorted
    val nAll = rows.length.toLong
    def cdfGap(src: String): Long = {
      val mine = rows.filter(_._1 == src)
      val n = mine.length.toLong
      bins.map { b =>
        val cumSrc = mine.count(_._2 / w <= b).toLong
        val cumAll = rows.count(_._2 / w <= b).toLong
        math.abs(1000 * cumSrc / n - 1000 * cumAll / nAll)
      }.max
    }
    val got = SparkEntry.queries("q136_source_drift")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (src, nDocs, ks) =>
      assert(nDocs == rows.count(_._1 == src), s"$src n_docs")
      assert(ks >= 0 && ks <= 1000, s"$src ks out of range")
      assert(ks == cdfGap(src), s"$src ks $ks != brute ${cdfGap(src)}")
    }
  }

  test("q137 frame dedup is consistent with the q49 frame inventory") {
    val frames = SparkEntry.queries("q49_frame_sample")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val want = frames.groupBy(_._2)
      .map { case (h, fs) =>
        h -> (fs.length.toLong, fs.map(_._1).distinct.length.toLong, fs.map(_._1).min)
      }
      .filter(_._2._1 >= 2)
    val got = SparkEntry.queries("q137_frame_dedup")(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"frame dedup differs: got ${got.size} want ${want.size}")
    assert(got.nonEmpty, "no duplicated frames at sf0.001 — query exercises nothing")
  }

  test("q118 SCD2 intervals tile each user's timeline: dense versions, abutting ranges, alternating states") {
    val rows = SparkEntry.queries("q118_scd2_intervals")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // Island event counts sum back to the full stream.
    assert(rows.map(_._6).sum == Tables.events(spark, sf0001).count())
    rows.groupBy(_._1).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_._2).toList
      assert(rs.map(_._2) == (1L to rs.length).toList, s"user $u versions not dense")
      assert(rs.count(_._7 == 1L) == 1 && rs.last._7 == 1L, s"user $u is_current")
      rs.sliding(2).foreach {
        case List(a, b) =>
          assert(a._5 == b._4, s"user $u intervals do not abut")
          assert(a._3 != b._3, s"user $u consecutive islands share a state")
        case _ => ()
      }
    }
  }
}
