package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Salted, Scored, TopKAggregator}
import graft.queries.ScalePatterns

/** Semantics of the scale-pattern operators beyond what the DuckDB oracle
  * covers: salted == direct aggregation, approx-distinct error envelope,
  * as-of tie semantics.
  */
class ScalePatternsSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct groupBy") {
    val words = graft.operators.InvertedIndex.words(
      Tables.documents(spark, sf0001), "doc_id", "text")
    val salted = Salted.countAndSum(
      words, col("word"), col("file_id"), length(col("word")).cast("long"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = words.groupBy(col("word"))
      .agg(count(lit(1)).as("n"), sum(length(col("word")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("TopKAggregator buffer stays bounded, ordered, tie-broken by id; saturated reduce is a no-op") {
    val agg = new TopKAggregator(2)
    val items = Seq(Scored(1.0, 5), Scored(3.0, 2), Scored(3.0, 1), Scored(2.0, 9), Scored(0.5, 0))
    val r = items.foldLeft(agg.zero)(agg.reduce)
    assert(r == Seq(Scored(3.0, 1), Scored(3.0, 2)), r.toString)
    // A row that cannot enter the saturated top-k must return the SAME buffer.
    assert(agg.reduce(r, Scored(0.1, 99)) eq r)
    val m = agg.merge(Seq(Scored(9.0, 7)), r)
    assert(m == Seq(Scored(9.0, 7), Scored(3.0, 1)), m.toString)
  }

  test("salted skew join equals the plain equi-join (hot key + duplicate rows)") {
    val spark0 = spark
    import spark0.implicits._
    // Key 1 is hot (1000 rows incl. exact duplicates); keys 2/3 are not.
    val probe = ((1 to 1000).map(i => (1L, i.toLong % 7)) ++ Seq((2L, 10L), (2L, 10L), (3L, 5L)))
      .toDF("k", "v").localCheckpoint()
    val build = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name").localCheckpoint()
    val salted = Salted.skewJoin(probe, build, "k", factor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = probe.join(build, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    // And the salt actually spreads the hot key across replicas.
    val saltSpread = probe.where(col("k") === 1L)
      .select(pmod(hash(col("k"), col("v")), lit(8))).distinct().count()
    assert(saltSpread > 1, "hot key not spread across salt buckets")
  }

  test("approx_percentile within 2% of exact percentile (q45's sketch sibling)") {
    // Exact percentile sorts each group's values; the sketch is the
    // unbounded-group escape hatch — bound its error like q34 does for
    // distinct counts.
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.5)").as("e"),
      org.apache.spark.sql.functions.expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a"),
    ).head()
    val (e, a) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e")
  }

  test("approx_count_distinct within 10% of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
  }

  test("banded self-join finds each in-band pair exactly once, boundary inclusive") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), (1L, 31L, 4L), (2L, 5L, 5L))
      .toDF("k", "v", "id").localCheckpoint()
    val got = graft.operators.RangeJoin.bandedSelfJoin(rows, "k", "v", "id", band = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    // |0-10| = 10 inclusive; |10-20| = 10; |20-31| = 11 out; cross-key out.
    assert(got == Seq((1L, 2L), (2L, 3L)))
  }

  test("skewJoin saltCols spreads an identical-row hot key the default salt cannot") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // Hot key whose rows are byte-identical except a row-id column — the
    // duplicate-row skew case the default all-column salt collapses on.
    val probe = (1 to 400).map(i => (1L, "x", i.toLong)).toDF("k", "payload", "row_id")
    val build = Seq((1L, "dim")).toDF("k", "dim")
    val salted = graft.operators.Salted
      .skewJoin(probe, build, "k", factor = 8, saltCols = Seq(col("row_id")))
    assert(salted.count() == 400) // exactly the plain join
    // The explicit salt really fans the hot key across replicas.
    val spread = probe.select(pmod(hash(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1, s"salt did not spread: $spread bucket(s)")
    // Degraded-but-correct: byte-identical rows under the default salt.
    val dupProbe = (1 to 400).map(_ => (1L, "x")).toDF("k", "payload")
    assert(graft.operators.Salted.skewJoin(dupProbe, build, "k", factor = 8).count() == 400)
  }

  test("count-min sketch bounds word-count estimates (never under, over by < eps*N)") {
    // Completes the sketch family next to HLL (q34) and Bloom (q67): the
    // distributed count_min_sketch aggregate merges per-partition sketches
    // and guarantees exact-count <= estimate <= exact + eps*N w.h.p.
    import org.apache.spark.sql.functions._
    val words = graft.operators.InvertedIndex
      .words(Tables.documents(spark, sf0001), "doc_id", "text")
    val skBytes = words
      .select(expr("count_min_sketch(word, 0.01d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val exact = words.groupBy(col("word")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (w, c) =>
      val est = sketch.estimateCount(w)
      assert(est >= c, s"$w underestimated: $est < $c")
      assert(est <= c + (0.01 * n).toLong + 1, s"$w overestimated: $est vs $c (N=$n)")
    }
  }

  test("bloom-pruned join equals the plain join; the probe predicate is in the plan") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf0001)
    val dim = Tables.customer(spark, sf0001)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val pruned = graft.operators.RuntimeFilter
      .bloomPrunedJoin(orders, dim, "o_custkey", "c_custkey", expectedItems = 10000L)
      .select(col("o_orderkey"), col("c_custkey"))
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("bloomPrunedJoin with an EMPTY build side returns the empty join (null-sketch path)") {
    val spark0 = spark
    import spark0.implicits._
    // The global BloomFilterAggregate over zero rows yields a NULL sketch;
    // might_contain(null) is null, the filter drops every probe row, and
    // the result equals the empty inner join. Pinned so the implicit
    // null-sketch path can't regress.
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val build = Seq((1L, "x")).toDF("bk", "bv").where(col("bk") < 0)
    assert(graft.operators.RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk").count() == 0)
  }

  test("q60 df prune: a corpus-wide stopword contributes NOTHING to the candidate join") {
    val spark0 = spark
    import spark0.implicits._
    // 300 docs; EVERY doc contains "the" (df = 100% > 90% cap); each block
    // of 10 docs shares a mid-frequency word (df = 10); each doc carries a
    // unique rare word. Without the prune, every query's candidate set is
    // the whole corpus via "the" — O(queries x corpus).
    // Tokenization strips non-letters, so the indices are spelled in
    // letters ("42" -> "ec") to keep every word distinct post-normalize.
    def let(n: Int): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    val docs = (0 until 300).map(i => (i.toLong, s"the shared${let(i / 10)} uniq${let(i)}"))
      .toDF("doc_id", "text")
    val weighted = graft.queries.TextCorpus.weightedPostings(docs, 90)
    val words = weighted.select("word").distinct().as[String].collect().toSet
    assert(!words.contains("the"), "corpus-wide stopword survived the df prune")
    assert(words.exists(_.startsWith("shared")), "mid-frequency terms were lost")
    val res = graft.queries.TextCorpus.sparseTopK(docs, 90, 256).collect()
    // Queries are doc_id % 100 == 7 -> 7, 107, 207; each has exactly 9
    // shared-block peers, so each fills its top-5 — and every neighbor
    // must come from the query's own block (the stopword never leaked).
    assert(res.length == 15, s"expected 3 queries x 5 rows, got ${res.length}")
    res.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(q / 10 == n / 10, s"candidate $n for query $q outside its block: stopword leaked")
    }
  }

  test("q60 posting cap keeps exactly the top-k impact-ordered postings of a hot term") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0 until 1000).map(i => (i.toLong, "hot", (i % 100).toLong))
    val capped = graft.queries.TextCorpus
      .cappedPostings(rows.toDF("doc_id", "word", "w_milli"), 256)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val expected = rows.map { case (id, _, w) => (id, w) }
      .sortBy { case (id, w) => (-w, id) }.take(256).toSet
    assert(capped == expected, "cap did not keep the (w_milli desc, doc_id asc) top-256")
  }

  test("as-of join: equal-time build row is visible; no match yields default") {
    val spark0 = spark
    import spark0.implicits._
    val build = Seq((1L, 10L, 100L), (1L, 10L, 101L), (1L, 20L, 102L), (2L, 50L, 200L))
      .toDF("k", "t", "ref")
    val probe = Seq((1L, 10L, 1L), (1L, 15L, 2L), (1L, 25L, 3L), (2L, 40L, 4L), (3L, 5L, 5L))
      .toDF("k", "t", "id")
    val got = AsOfJoin.lookup(probe, "k", "t", "id", build, "k", "t", "ref")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // id 1: equal time -> sees build@10, deduped to max ref 101
    // id 2: last build <= 15 is build@10 -> 101; id 3 -> build@20 -> 102
    // id 4: build@50 is in the future -> default; id 5: key absent -> default
    assert(got == Map(1L -> 101L, 2L -> 101L, 3L -> 102L, 4L -> -1L, 5L -> -1L))
  }

  test("bucketed as-of join == plain form on a hot-key timeline (empty buckets, negative times, ties)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    // Key 1 is hot (2000 probes over [-299, 299]) with SPARSE builds, so
    // most buckets are empty and answers flow through the carry window;
    // duplicate build times exercise the max-ref dedup; key 3 has no
    // build rows at all (default path).
    def withNullKey(df: org.apache.spark.sql.DataFrame, t: Long, v: Long) =
      df.unionByName(df.limit(1).select(
        expr("CAST(NULL AS BIGINT)").as(df.columns(0)),
        lit(t).as(df.columns(1)), lit(v).as(df.columns(2))))
    // A NULL key is its own window partition in the plain form; the
    // bucketed decomposition must preserve that (null-safe joins).
    val build = withNullKey(Seq(
      (1L, -95L, 10L), (1L, 0L, 11L), (1L, 7L, 12L), (1L, 7L, 9L),
      (1L, 230L, 13L), (2L, 50L, 200L)).toDF("k", "t", "ref"), 3L, 777L)
    val probe = withNullKey(((0 until 2000).map(i => (1L, rnd.nextLong() % 300, i.toLong))
      ++ Seq((2L, 40L, 9001L), (2L, 60L, 9002L), (3L, 5L, 9003L))).toDF("k", "t", "id"),
      5L, 9004L)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val plain = asMap(AsOfJoin.lookup(probe, "k", "t", "id", build, "k", "t", "ref"))
    val bucketed = asMap(AsOfJoin.lookupBucketed(
      probe, "k", "t", "id", build, "k", "t", "ref", bucketWidth = 16L))
    assert(bucketed == plain)
  }

  test("q123 sketch bracket provably contains the exact quantile and prunes the decide set") {
    // The scope/decide contract: the Greenwald-Khanna rank-error bound
    // (n / accuracy) means quantiles queried at p +/- 2/accuracy MUST
    // bracket the exact p-quantile; and the bracket must be SELECTIVE —
    // the decide pass only ranks in-bracket mass.
    val li = Tables.lineitem(spark, sf0001)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val exact = li.orderBy(col("v")).collect().map(_.getLong(0))
    val n = exact.length
    val m = 2.0 / graft.queries.ScalePatterns.quantileAccuracy
    for (p <- Seq(500L, 900L)) {
      val t = ((p * n + 999) / 1000).toInt
      val ev = exact(t - 1)
      val b = li.agg(expr(
        s"approx_percentile(v, array(${p / 1000.0 - m}, ${p / 1000.0 + m}), " +
          s"${graft.queries.ScalePatterns.quantileAccuracy})").as("b"))
        .head().getSeq[Long](0)
      assert(b(0) <= ev && ev <= b(1), s"p=$p bracket ${b(0)}..${b(1)} misses exact $ev")
      val inBracket = exact.count(v => v >= b(0) && v <= b(1))
      assert(inBracket * 10 < n, s"p=$p bracket keeps $inBracket of $n rows")
    }
  }

  test("q120 median/MAD match a driver-side brute force per language") {
    def lowMedian(xs: Array[Long]): Long = xs((xs.length + 1) / 2 - 1)
    val byLang = Tables.documents(spark, sf0001).select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    val out = SparkEntry.queries("q120_robust_dispersion")(spark, sf0001).collect()
    assert(out.length == byLang.size)
    out.foreach { r =>
      val xs = byLang(r.getString(0))
      assert(r.getLong(1) == xs.length)
      val med = lowMedian(xs)
      assert(r.getLong(2) == med, s"${r.getString(0)} median")
      assert(r.getLong(3) == lowMedian(xs.map(x => math.abs(x - med)).sorted),
        s"${r.getString(0)} MAD")
    }
  }

  test("q138 nearest-in-time equals a driver-side brute force and exercises both directions") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase").groupBy(_._1)
    val got = SparkEntry.queries("q138_nearest_in_time")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.length == ev.count(_._4 == "click"), "one row per click")
    got.foreach { case (eid, uid, pid, dist, dir) =>
      val (_, t, _, _) = ev.find(_._3 == eid).get
      purchases.get(uid) match {
        case None =>
          assert(pid == -1 && dist == -1 && dir == "none", s"click $eid expected none")
        case Some(ps) =>
          val best = ps.map { case (_, pt, pe, _) =>
            // distance, ties to backward (pt <= t first), then max id
            (math.abs(pt - t), if (pt <= t) 0 else 1, pt, pe)
          }.sorted.head
          val bestId = ps.filter(p => p._2 == best._3).map(_._3).max
          assert(dist == best._1, s"click $eid dist $dist != ${best._1}")
          assert(pid == bestId, s"click $eid id $pid != $bestId")
          assert(dir == (if (best._2 == 0) "backward" else "forward"), s"click $eid dir")
      }
    }
    assert(got.exists(_._5 == "backward") && got.exists(_._5 == "forward"),
      "nearest-in-time is degenerate: only one direction occurs")
  }

  test("q147 range-partition plan equals a driver-side sort: exact boundaries, counts sum to N") {
    val vs = Tables.lineitem(spark, sf0001)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .collect().map(_.getLong(0)).sorted
    val p = ScalePatterns.rangePlanParts
    val got = SparkEntry.queries("q147_range_plan")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1L to p.toLong), "partition ids dense 1..P")
    got.foreach { case (pid, bound, _) =>
      // boundary = the ceil(pid*N/P)-th smallest value
      val want = vs(((pid * vs.length + p - 1) / p - 1).toInt)
      assert(bound == want, s"partition $pid bound $bound != $want")
    }
    assert(got.map(_._3).sum == vs.length, "partition counts do not sum to N")
    assert(got.map(_._2).sliding(2).forall { case Array(a, b) => a < b; case _ => true },
      "bounds not strictly increasing")
    got.foreach { case (pid, bound, n) =>
      assert(n == vs.count(_ <= bound) - (if (pid == 1) 0
        else vs.count(_ <= got(pid.toInt - 2)._2)), s"partition $pid count")
    }
  }

  test("q145 peak concurrency equals a driver-side sweep line over the session intervals") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = ScalePatterns.concGapUs
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var st = ts.head; var en = ts.head
      ts.tail.foreach { t =>
        if (t - en > gap) { out += ((st, en)); st = t }
        en = t
      }
      out += ((st, en)); out
    }.toSeq
    val deltas = (sessions.map(s => s._1 -> 1L) ++ sessions.map(s => (s._2 + 1) -> -1L))
      .groupMapReduce(_._1)(_._2)(_ + _).toSeq.sortBy(_._1)
    val sweep = deltas.scanLeft((0L, 0L)) { case ((_, acc), (t, d)) => (t, acc + d) }.drop(1)
    val peak = sweep.map(_._2).max
    val r = SparkEntry.queries("q145_peak_concurrency")(spark, sf0001).collect().head
    assert(r.getLong(0) == sessions.length, s"n_sessions ${r.getLong(0)} != ${sessions.length}")
    assert(r.getLong(1) == peak, s"peak ${r.getLong(1)} != $peak")
    assert(r.getLong(2) == sweep.find(_._2 == peak).get._1, "first peak instant")
    assert(peak >= 2, "peak concurrency degenerate (never overlaps)")
  }

  test("q140 erasure audit balances, leaks nothing, and matches recomputed purges") {
    val rows = SparkEntry.queries("q140_erasure_audit")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("customer", "events", "orders"))
    rows.foreach { case (t, before, removed, after, leaked) =>
      assert(before == removed + after, s"$t does not balance")
      assert(leaked == 0, s"$t leaked $leaked listed rows past the purge")
      assert(removed > 0, s"$t removed nothing — the deletion list is empty here")
    }
    // Recompute one table's purge directly.
    val ev = Tables.events(spark, sf0001).select(col("user_id")).collect().map(_.getLong(0))
    val m = ScalePatterns.erasureMod
    val want = ev.count(_ % m == 0).toLong
    assert(rows.find(_._1 == "events").get._2 == ev.length)
    assert(rows.find(_._1 == "events").get._3 == want)
  }

  test("q140 leak check is independent of the purge: a broken purge surfaces n_leaked > 0") {
    // Inject a purge that deletes NOTHING: the semi-join against the
    // separately-derived deletion list must report every listed row as
    // leaked. (An inline negation of the purge predicate — the pre-r6
    // shape — would still report 0 here, proving nothing.)
    val ev = Tables.events(spark, sf0001)
    val r = ScalePatterns.erasureAudit("events", ev, "user_id",
      purgedOverride = Some(ev)).collect().head
    assert(r.getLong(4) == r.getLong(2) && r.getLong(4) > 0,
      s"broken purge must leak all ${r.getLong(2)} listed rows, got ${r.getLong(4)}")
  }

  test("q141 conversion-latency deciles equal a driver-side sort of the true latencies") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val purchases = ev.filter(_._3 == "purchase").groupBy(_._1)
    val lats = ev.filter(_._3 == "click").flatMap { case (u, t, _) =>
      purchases.getOrElse(u, Array.empty).map(_._2).filter(_ >= t)
        .minOption.map(pt => (pt - t) / 1000000)
    }.sorted
    val got = SparkEntry.queries("q141_conversion_latency")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1L to 9L), "deciles 1..9 present")
    got.foreach { case (dec, lat, n) =>
      assert(n == lats.length, s"decile $dec conversion count")
      // smallest latency whose cumulative count reaches ceil(d*N/10)
      val want = lats(((dec * lats.length + 9) / 10 - 1).toInt)
      assert(lat == want, s"decile $dec: $lat != $want")
    }
    assert(got.map(_._2).sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }

  test("q142 Benford audit: digits partition the orders and deviations are exact") {
    val rows = SparkEntry.queries("q142_benford_audit")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(rows.map(_._2).sum == nOrders, "digit counts do not partition orders")
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 9), "leading digit out of range")
    val expected = queries.Relational.benfordMilli.toMap
    rows.foreach { case (dig, n, freq, ben, dev) =>
      assert(freq == 1000L * n / nOrders, s"digit $dig freq not exact floor")
      assert(ben == expected(dig.toInt), s"digit $dig expectation drifted")
      assert(dev == math.abs(freq - ben), s"digit $dig deviation")
    }
  }

  test("q132 join-explosion audit equals a driver-side brute force over the key histogram") {
    val sizes = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey")).count()
      .collect().map(_.getLong(1)).sorted
    val k = sizes.length
    def pct(p: Int): Long = sizes((p * k + 99) / 100 - 1) // ceil(p*K/100)-th smallest
    val r = SparkEntry.queries("q132_join_explosion_audit")(spark, sf0001).collect().head
    assert(r.getLong(0) == sizes.sum, "n_rows")
    assert(r.getLong(1) == k, "n_keys")
    assert(r.getLong(2) == sizes.max, "max_group")
    assert(r.getLong(3) == pct(50), s"p50 ${r.getLong(3)} != ${pct(50)}")
    assert(r.getLong(4) == pct(99), s"p99 ${r.getLong(4)} != ${pct(99)}")
    assert(r.getLong(5) == sizes.map(n => n * n).sum, "selfjoin_rows")
    assert(r.getLong(6) == 1000L * sizes.map(n => n * n).sum / sizes.sum, "blowup_milli")
  }

  test("q129 zone-map skipping is sound (skips lose no matches) and clustering pays") {
    val rows = SparkEntry.queries("q129_zone_map_skipping")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (_, _, cTotal, cScanned, cMatch) = rows("clustered")
    val (nShards, nScannedShards, nTotal, nScanned, nMatch) = rows("natural")
    // Both layouts hold the same rows and must surface the same matches —
    // soundness: skipping a shard never loses a matching row (its zone
    // range provably excludes the predicate window).
    assert(cTotal == nTotal, s"layouts disagree on row count: $cTotal vs $nTotal")
    assert(cMatch == nMatch, s"skipping lost matches: $cMatch vs $nMatch")
    // Brute-force the match count straight off the table.
    val want = Tables.lineitem(spark, sf0001)
      .where(datediff(col("l_shipdate"), lit("1970-01-01"))
        .between(ScalePatterns.zoneLoDay, ScalePatterns.zoneHiDay))
      .count()
    assert(cMatch == want, s"match count $cMatch != brute force $want")
    // The ingest-ordered layout cannot skip (every shard straddles the
    // window); the clustered layout must actually prune IO.
    assert(nScannedShards == nShards && nScanned == nTotal, "natural layout skipped?")
    assert(cScanned < nScanned, s"clustered scan $cScanned not below natural $nScanned")
    // Scanned shards always cover at least the matching rows.
    assert(cScanned >= cMatch)
  }
}
