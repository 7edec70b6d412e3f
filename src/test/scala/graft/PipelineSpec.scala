package graft

import org.apache.spark.sql.functions._

/** Invariants of the training-data pipeline operators (q55-q62) beyond
  * the oracle's value equality: determinism under re-partitioning,
  * conservation laws, and the plan shapes their scale story claims.
  */
class PipelineSpec extends SparkSpec {

  test("q55 split is a pure function of doc_id: invariant under shuffle-partition count") {
    val a = SparkEntry.queries("q55_train_test_split")(spark, sf0001).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = SparkEntry.queries("q55_train_test_split")(spark, sf0001).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // All three splits materialize and train dominates (hash is spreading).
    val bySplit = a.map(r => r.getString(1) -> r.getLong(2))
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
    assert(bySplit("train") > bySplit("val") + bySplit("test"), bySplit)
  }

  test("q56 packing conserves tokens and numbers batches contiguously from 0") {
    val batches = SparkEntry.queries("q56_sequence_packing")(spark, sf0001).collect()
    val perLang = batches.groupBy(_.getString(0))
    perLang.foreach { case (lang, rows) =>
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids == (0L until ids.size).toSeq, s"$lang batch ids not contiguous: $ids")
    }
    val packed = batches.map(_.getLong(3)).sum
    val total = Tables.documents(spark, sf0001)
      .select(sum(size(graft.functions.text.normalizedTokens(col("text"))).cast("long")))
      .first().getLong(0)
    assert(packed == total, s"packed=$packed total=$total")
  }

  test("distributed prefix sum equals the single-partition window exactly") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("doc_id div 97").as("bkt")) // deliberately odd bucket width
    val scalable = graft.operators.PrefixSum
      .withRunningTotal(base, Seq("lang"), "bkt", Seq("doc_id"), "n_chars", "cum")
      .select(col("doc_id"), col("cum"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = base.withColumn("cum", sum(col("n_chars")).over(w))
      .select(col("doc_id"), col("cum"))
    assert(scalable.collect().toSet == plain.collect().toSet)
  }

  test("exclusive running min equals the single-partition exclusive window exactly") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("doc_id div 97").as("bkt"))
    val scalable = graft.operators.PrefixSum
      .withRunningMinExclusive(base, Seq("lang"), "bkt", Seq("doc_id"), "n_chars", "best")
      .select(col("doc_id"), col("best"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = base.withColumn("best", min(col("n_chars")).over(w))
      .select(col("doc_id"), col("best"))
    // Set compare includes the per-group first rows (best = NULL).
    assert(scalable.collect().toSet == plain.collect().toSet)
  }

  test("multi-value prefix sum == two single-partition windows (one pass, both outputs)") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("doc_id div 97").as("bkt"), lit(1L).as("one"))
    val scalable = graft.operators.PrefixSum
      .withRunningTotals(base, Seq("lang"), "bkt", Seq("doc_id"),
        Seq("n_chars" -> "cum", "one" -> "rk"))
      .select(col("doc_id"), col("cum"), col("rk"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = base
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("rk", sum(col("one")).over(w))
      .select(col("doc_id"), col("cum"), col("rk"))
    assert(scalable.collect().toSet == plain.collect().toSet)
  }

  test("q62 flags the docs with sample |z| > 2 (float cross-check, ulp-tolerant)") {
    val flagged = SparkEntry.queries("q62_outlier_docs")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stats = Tables.documents(spark, sf0001)
      .groupBy(col("lang"))
      .agg(avg(col("n_chars")).as("mu"), stddev_samp(col("n_chars")).as("sd"))
    // The exact integer test and the float moments can legitimately differ
    // on a row whose |z| sits within rounding error of 2.0, so bracket:
    // strictly-outside rows must be flagged, strictly-inside must not be.
    def zFiltered(factor: Double) = Tables.documents(spark, sf0001)
      .join(stats, "lang")
      .where(abs(col("n_chars") - col("mu")) > lit(factor) * col("sd"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val strictlyOutside = zFiltered(2.0 + 1e-9)
    val looseOutside = zFiltered(2.0 - 1e-9)
    assert(strictlyOutside.subsetOf(flagged), s"missing ${strictlyOutside -- flagged}")
    assert(flagged.subsetOf(looseOutside), s"extra ${flagged -- looseOutside}")
  }

  test("q58 compaction partial-aggregates (no window sort of the full stream)") {
    val df = SparkEntry.queries("q58_changelog_compact")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_max") || p.contains("partial_first"), p)
    assert(!p.contains("Window"), p)
  }

  test("q64 sampler == plain per-language window on a hot language, with bounded slices") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.expressions.Window
    // One language is 99% of the corpus — the shape that makes a plain
    // per-language row_number window ship most of the dataset to one task.
    val docs = ((0 until 990).map(i => (i.toLong, "hot", "x")) ++
      (990 until 1000).map(i => (i.toLong, s"l${i % 5}", "y")))
      .toDF("doc_id", "lang", "text").localCheckpoint()
    val sampled = graft.queries.Pipeline.sampledPerLang(docs, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val plain = docs
      .select(col("lang"), col("doc_id"),
        graft.functions.textstats.rollingHash(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sampled == plain)
    // Bounded per-task state: the hot language really spreads across salt
    // slices, so no first-pass task ranks more than ~1/salt of it...
    val spread = docs.where(col("lang") === "hot")
      .select(pmod(col("doc_id"), lit(graft.queries.Pipeline.sampleSalt)))
      .distinct().count()
    assert(spread == graft.queries.Pipeline.sampleSalt, s"salt spread: $spread")
    // ...and the second pass ranks at most salt*k survivors per language.
    val survivors = {
      val slice = Window
        .partitionBy(col("lang"), pmod(col("doc_id"), lit(graft.queries.Pipeline.sampleSalt)))
        .orderBy(col("h"), col("doc_id"))
      docs.select(col("lang"), col("doc_id"),
          graft.functions.textstats.rollingHash(col("doc_id").cast("string")).as("h"))
        .withColumn("r1", row_number().over(slice)).where(col("r1") <= 20)
        .groupBy(col("lang")).count().collect().map(_.getLong(1)).max
    }
    assert(survivors <= 20L * graft.queries.Pipeline.sampleSalt, s"survivors: $survivors")
  }

  test("q91 deciles: 10 balanced strata, conserved mass, no corpus-wide partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = SparkEntry.queries("q91_length_deciles")(spark, sf0001)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L), "expected exactly deciles 0..9")
    val n = rows.map(_.getLong(1)).sum
    val total = Tables.documents(spark, sf0001).count()
    assert(n == total, s"decile doc counts $n != corpus $total")
    // Equal-count cut: every stratum within 1 doc of N/10.
    assert(rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min <= 1, rows.mkString(","))
    // Strata are ordered: decile d's max length <= decile d+1's min.
    val byDecile = rows.sortBy(_.getLong(0))
    byDecile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2), s"strata overlap: $a vs $b")
    }
    // The global rank must ride the PrefixSum decomposition: any
    // partition-less window runs over the bucket-totals aggregate
    // (grouped by bkt), never over the corpus rows.
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.exists(_.partitionSpec.nonEmpty), "no bucket-partitioned local window")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overBucketTotals = w.collectFirst {
        case a: Aggregate
            if a.groupingExpressions.exists(_.references.exists(_.name == "bkt")) => a
      }.isDefined
      assert(overBucketTotals, s"partition-less window not over bucket totals:\n$w")
    }
  }

  test("q100 weighted sampler == plain priority window on a hot source; weights bias inclusion") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.expressions.Window
    // One source is 99% of the corpus; weights (n_chars) vary 1..1000.
    val docs = ((0 until 990).map(i => (i.toLong, "hot", 1L + (i * 37) % 1000)) ++
      (990 until 1000).map(i => (i.toLong, s"s${i % 5}", 500L)))
      .toDF("doc_id", "source", "n_chars").localCheckpoint()
    val sampled = graft.queries.Pipeline.weightedSamplePerSource(docs, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    val plain = docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        (graft.functions.textstats.rollingHash(
          concat(col("doc_id").cast("string"), lit("#priority"))).cast("double")
          / col("n_chars").cast("double")).as("pri"))
      .withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= 10)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(1))).toSet
    assert(sampled == plain)
    // Weight bias: the hot source's sampled docs skew heavy — their mean
    // weight beats the source's overall mean (uniform hash, 1/w priority).
    val hotSampleMean = graft.queries.Pipeline.weightedSamplePerSource(docs, 10)
      .where(col("source") === "hot").agg(avg(col("n_chars"))).first().getDouble(0)
    val hotMean = docs.where(col("source") === "hot")
      .agg(avg(col("n_chars"))).first().getDouble(0)
    assert(hotSampleMean > hotMean, s"sample mean $hotSampleMean <= corpus mean $hotMean")
  }

  test("q97 apportionment hits the budget exactly and never under-allocates q83's floors") {
    import graft.queries.Pipeline
    val rows = SparkEntry.queries("q97_mixture_apportion")(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum == Pipeline.mixtureBudget,
      "largest-remainder targets must sum to the budget exactly")
    // Each language's exact-budget target is its q83 floor or floor + 1.
    val floors = SparkEntry.queries("q83_lang_mixture")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    rows.foreach { r =>
      val (lang, t) = (r.getString(0), r.getLong(2))
      assert(t == floors(lang) || t == floors(lang) + 1, s"$lang: $t vs floor ${floors(lang)}")
    }
  }

  test("q60 retrieval ranks 5 hits per query doc, never the query itself") {
    val rows = SparkEntry.queries("q60_sparse_topk")(spark, sf0001).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L), s"ranks for $q")
      assert(!rs.map(_.getLong(2)).contains(q), s"query $q retrieved itself")
      // Scores are non-increasing in rank.
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(byRank == byRank.sorted.reverse, s"scores not monotone for $q: $byRank")
    }
  }
}
