package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.EventStreams

/** Multimodal + event-sessionization queries. The streaming transforms in
  * [[graft.streaming.EventStreams]] are exercised here in BATCH mode (the
  * Structured Streaming unification makes that the same code path); the
  * streaming-mode equivalence is asserted in StreamingSpec.
  */
object Extras {

  /** Batched stub-decode feature extraction over binary media columns. */
  private def q31(s: SparkSession, d: String): DataFrame =
    Multimodal
      .extractFeatures(Multimodal.fromDocuments(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("media_id"))

  /** Frame sampling over the media payloads: every 4th 32-byte chunk,
    * one row per kept frame with its content hash. Exercises the binary
    * chunking path end-to-end against the oracle (the corpus is ASCII,
    * so byte slicing == character slicing on the DuckDB side).
    */
  /** The NON-STUB multimodal kernel: each doc becomes a genuine binary
    * P6 PPM (real ASCII header + RGB24 pixels from a deterministic
    * formula), and [[graft.multimodal.Multimodal.decodePpmAHash]] — a
    * real parser + the standard 64-bit average-hash, division-free
    * integer math — decodes it batched per partition. Unlike q31/q70,
    * nothing here is simulated: the oracle regenerates the pixels from
    * the same formula and must reproduce the hash BIT-FOR-BIT through
    * the grayscale → 8x8 block-sum → threshold pipeline. Hash surfaces
    * as two uint32 halves so both engines stay inside signed BIGINT.
    */
  private def q153(s: SparkSession, d: String): DataFrame =
    Multimodal.imageHashes(Multimodal.ppmMedia(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("media_id"))

  /** Audio sibling of q153, same non-stub discipline: each doc becomes a
    * genuine RIFF/WAVE file (real header, canonical PCM fmt chunk, LE
    * PCM16 data) and [[graft.multimodal.Multimodal.decodeWavFeatures]]
    * — a real chunk-walking parser — decodes it and computes
    * exact-integer signal features (peak, energy as sum-of-squares so
    * no float is involved, zero crossings). The oracle regenerates the
    * samples from the same formula and must agree exactly.
    */
  private def q154(s: SparkSession, d: String): DataFrame =
    Multimodal.audioFeatures(Multimodal.wavMedia(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("media_id"))

  /** Corpus-wide IMAGE dedup by perceptual hash — the multimodal row in
    * the dedup matrix, over really-decoded images: payloads are built
    * from `doc_id % 40` (40 distinct source images shared by many docs,
    * the re-hosted/re-encoded duplicate shape of web corpora), every
    * payload is decoded by the REAL q153 kernel, and images cluster by
    * exact average-hash. At 100 TB this is the standard sketch→group
    * dedup shape (hash is 8 bytes per image, groupBy is map-side
    * combinable); Hamming-tolerant clustering rides q85's pigeonhole
    * banding over the same hash halves unchanged.
    */
  private def q155(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(id, "image/ppm", Multimodal.buildPpm(id % 40)))
    Multimodal.imageHashes(media).toDF()
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("rep_media_id"))
      .orderBy(col("rep_media_id"))
  }

  /** Video sibling of q153/q154 — the path q49/q137 cover with synthetic
    * byte chunks, now over REALLY-DECODED frames: each doc becomes a raw
    * concatenated-PPM stream (9 genuine P6 frames, 3 static "scenes" of
    * 3 identical frames — the shape frame dedup exploits), the real
    * parser decodes every frame (header re-parsed per frame, all pixels
    * visited), and per-video stats come off the frame-hash stream:
    * unique-frame count (dedup yield) and scene cuts (adjacent-hash
    * changes — cut detection). Per-video window is bounded (9 rows) and
    * partitioned by media_id; the decode itself is the same
    * partition-parallel batched shape as q153.
    */
  private def q156(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(id, "video/ppm-raw", Multimodal.buildPpmVideo(id)))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    Multimodal.videoFrameHashes(media).toDF()
      .withColumn("prev_lo", lag(col("ahash_lo"), 1).over(w))
      .withColumn("prev_hi", lag(col("ahash_hi"), 1).over(w))
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("ahash_hi"), col("ahash_lo")).as("n_unique_frames"),
        sum(when(col("prev_lo").isNotNull &&
            (col("ahash_lo") =!= col("prev_lo") || col("ahash_hi") =!= col("prev_hi")),
          1L).otherwise(0L)).as("n_scene_cuts"))
      .orderBy(col("media_id"))
  }

  private def q49(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.fromDocuments(Tables.documents(s, d)).toDF())
      .select(col("media_id"), posexplode(col("frames")))
      .select(
        col("media_id"),
        col("pos").cast("long").as("frame_idx"),
        md5(col("col")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Batched stub-resize over the media payloads: every 3rd byte kept
    * (the deterministic stand-in for decode -> downsample -> re-encode),
    * emitted with before/after sizes and a content hash. Completes the
    * multimodal op set next to decode/extract (q31) and frame sampling
    * (q49); same partition-parallel batch shape, no shuffle.
    */
  private def q70(s: SparkSession, d: String): DataFrame =
    Multimodal.resize(Multimodal.fromDocuments(Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("orig_bytes"), col("new_bytes"),
        md5(col("resized")).as("resized_md5"))
      .orderBy(col("media_id"))

  /** Tumbling 5-minute event-time windows per event type — EXACTLY the
    * transform the streaming path runs ([[EventStreams.windowedAggregates]],
    * watermark included), executed in batch mode so the DuckDB oracle
    * gate covers the streaming surface's flagship aggregation (the
    * batch==streaming output equivalence itself is asserted in
    * StreamingSpec; this pins the VALUES against an independent engine).
    */
  private def q87(s: SparkSession, d: String): DataFrame =
    EventStreams.windowedAggregates(Tables.events(s, d))
      .select(
        col("window_start"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding-window aggregate ([[EventStreams.slidingAggregates]]) in
    * batch mode — completes the windowing family on the oracle gate
    * (tumbling q87, session q32, sliding here). The oracle rebuilds the
    * hop membership explicitly: an event at second t belongs to the
    * windows starting at floor(t/300)*300 - k*300 for k in {0, 1}.
    */
  private def q92(s: SparkSession, d: String): DataFrame =
    EventStreams.slidingAggregates(Tables.events(s, d))
      .select(
        col("window_start"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy(col("window_start"), col("event_type"))

  /** Event-time session windows (8h gap) per user — the same transform
    * the streaming path runs.
    */
  private def q32(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionWindows(Tables.events(s, d))
      .select(
        col("user_id"), col("session_start"), col("n_events"),
        round(col("session_value"), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Semi-structured schema-on-read: `events.props` is a JSON string
    * column; parse it ONCE per row with an EXPLICIT schema via
    * `from_json` (codegen'd, vectorizable — never get_json_object per
    * field, which re-parses the document for every extraction) and
    * aggregate the extracted field. Malformed documents become NULL
    * structs (PERMISSIVE), so the n_k < n_events gap is the built-in
    * dead-letter signal — ExtrasSpec pins that routing on a fixture with
    * broken JSON. At scale this is one narrow projection + one partial
    * agg; the JSON never reaches the shuffle.
    */
  private def q102(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "k", org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** First-order Markov transition matrix over each user's event stream:
    * next event via lead() within (user, time) — the per-user window is
    * bounded by that user's event count, never corpus-global — then
    * transition counts and a row-normalized milli-probability whose
    * normalizing window runs over the TRANSITION-TYPE table (at most
    * |event_types|^2 rows), not over events. The (ts, event_id) compound
    * order makes simultaneous events deterministic on both engines.
    */
  private def q103(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_milli",
        floor(lit(1000) * col("n_trans")
          / sum(col("n_trans")).over(Window.partitionBy(col("event_type"))))
          .cast("long"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Time-series gap-fill: densify each user's event history into a
    * complete daily panel (missing days materialized with zero counts) —
    * the resample step every downstream window/trend computation
    * assumes. The generated dimension is bounded by span-days PER USER
    * (sequence + explode over the per-user [min, max] day range), never
    * a global calendar cross join; the panel then left-joins the daily
    * aggregate on (user, day) — two shuffles over day-grain tables that
    * are already orders of magnitude smaller than the event stream.
    */
  private def q107(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    span.select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNotNull.cast("long").as("active"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Epoch-day splitting base from delta for q113 (days 1..20 of the
    * 2024-01 corpus are "already materialized"; the rest is the new
    * ingest batch).
    */
  val ivmSplitDay = 19743L

  /** Incremental view maintenance: a per-user (count, sum) aggregate is
    * maintained by MERGING a materialized base aggregate with the delta
    * batch's aggregate — count and sum are commutative monoids, so
    * re-aggregating the UNION of the two partial-aggregate TABLES equals
    * the full recompute (which is exactly what the oracle runs). The
    * base aggregate is localCheckpoint'd: the plan touches base events
    * zero times after materialization — at scale the maintained view is
    * a parquet table and each refresh costs O(delta) + a merge on
    * aggregate-grain rows, never a rescan of history. Sums ride exact
    * centi integers so base+delta merge order cannot drift a float.
    */
  private def q113(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_centi"))
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_centi")).as("sum_centi"))
    val base = agg(e.where(col("day") < ivmSplitDay)).localCheckpoint()
    val delta = agg(e.where(col("day") >= ivmSplitDay))
    base.unionByName(delta)
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"), sum(col("sum_centi")).as("sum_centi"))
      .orderBy(col("user_id"))
  }

  /** Open-interval sentinel for q118: epoch micros of 10000-01-01 —
    * the conventional SCD "end of time" upper bound, so current rows
    * still carry a closed BIGINT range (timestamps never appear in
    * output columns).
    */
  val scdOpenEndUs = 253402300800000000L

  /** SCD Type-2 history build — gaps-and-islands over the event stream:
    * consecutive same-state events per user collapse into one validity
    * interval, versioned in arrival order, with [valid_from, valid_to)
    * closed by the NEXT island's start ([[scdOpenEndUs]] for the current
    * one). Every window partitions by user_id (bounded per-entity
    * history — the dimension-table grain), the island collapse is a
    * map-side-combinable groupBy on (user, version), and the closing
    * lead() runs over the already-collapsed island table, never the raw
    * stream. The warehouse dimension-maintenance shape, derived from a
    * changelog in one pass.
    */
  private def q118(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    val wIsle = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val e = Tables.events(s, d).select(
      col("user_id"), col("event_type").as("state"),
      expr("ts div 1000").as("t_us"), col("event_id"))
    e.withColumn("prev", lag(col("state"), 1).over(wOrd))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("state"), lit(1L)).otherwise(lit(0L)))
      .withColumn("version", sum(col("chg")).over(wOrd))
      .groupBy(col("user_id"), col("version"), col("state"))
      .agg(min(col("t_us")).as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("nxt", lead(col("valid_from_us"), 1).over(wIsle))
      .select(
        col("user_id"), col("version"), col("state"), col("valid_from_us"),
        coalesce(col("nxt"), lit(scdOpenEndUs)).as("valid_to_us"),
        col("n_events"),
        col("nxt").isNull.cast("long").as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Inter-arrival threshold for q124: 1 hour sits inside this stream's
    * gap distribution (~2% of same-(user,type) gaps are shorter), so the
    * filter provably drops something without flattening the stream.
    */
  val debounceUs = 3600L * 1000000

  /** Event debouncing — the batch mirror of the streaming
    * dropDuplicatesWithinWatermark path: an event is kept iff it is the
    * first of its (user, type) key or arrives >= [[debounceUs]] after
    * the key's previous RAW event (inter-arrival thinning — the
    * retry-storm / double-click collapse every ingest runs). One
    * bounded per-(user,type) lag window, then a map-side-combinable
    * per-type rollup of kept/dropped counts.
    */
  private def q124(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("t_us"), col("event_id"))
      .withColumn("prev", lag(col("t_us"), 1).over(w))
      .withColumn("kept",
        (col("prev").isNull || col("t_us") - col("prev") >= debounceUs).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("kept")).as("n_kept"))
      .withColumn("n_dropped", col("n_events") - col("n_kept"))
      .orderBy(col("event_type"))
  }

  /** Attribution lookback for q125: purchases more than 24 h after the
    * user's last marketing touch attribute to 'none'.
    */
  val attributionWindowUs = 24L * 3600 * 1000000

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent PRECEDING non-purchase event within
    * [[attributionWindowUs]], else 'none'. The "which channel drove the
    * conversion" rollup. The carried state is two last_value(IGNORE
    * NULLS) columns over the same bounded per-user frame (rows between
    * unbounded preceding and 1 preceding) — both pick the same source
    * row because their NULL pattern is identical, so no struct payload
    * has to ride the window. Purchases then roll up map-side per
    * attributed type.
    */
  private def q125(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonPurchase = col("event_type") =!= "purchase"
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("t_us"), col("event_id"))
      .withColumn("src_t", last(when(nonPurchase, col("t_us")), ignoreNulls = true).over(w))
      .withColumn("src_ty", last(when(nonPurchase, col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(when(col("src_t").isNotNull &&
          col("t_us") - col("src_t") <= attributionWindowUs, col("src_ty"))
        .otherwise(lit("none")).as("attributed_type"))
      .groupBy(col("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("attributed_type"))
  }

  /** Cohort-grid day length for q128 (microseconds). Day grain, not week:
    * this stream's users are all active every week (a week-grain grid
    * degenerates to retention == 1000 everywhere), while day-grain cells
    * genuinely vary — the query must discriminate, not rubber-stamp.
    */
  val cohortDayUs = 86400L * 1000000

  /** Daily retention cohorts: a user's cohort is the day of their FIRST
    * event; cell (cohort_day, offset_days) counts users active exactly
    * that many days later, with the retention rate as an exact integer
    * per-mille (`(1000 * n_active) div cohort_size` — no float division,
    * so the cell values hash identically across engines).
    *
    * Shape for scale: (1) collapse the stream to distinct (user, day) —
    * map-side combinable, the only corpus-sized shuffle; (2) per-user
    * min-day on the already-collapsed table (user grain, bounded);
    * (3) cells = user-day ⋈ first-day co-partitioned on user_id (both
    * sides arrive hash-partitioned on user_id from their aggregations —
    * no extra exchange), rolled up map-side to the days² cell grid;
    * (4) cohort sizes join the cells at grid size (broadcast). No window
    * ever sees more than one user's rows, and nothing downstream of (1)
    * is corpus-sized.
    */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val wk = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $cohortDayUs").as("day"))
      .distinct()
    val first = wk.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    wk.join(first, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention_per_mille", expr("(1000 * n_active) div cohort_size"))
      .select(col("cohort_day"), col("offset_days"), col("n_active"),
        col("cohort_size"), col("retention_per_mille"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** SCHEMA-PROJECTED JSON parsing over the event stream — the second
    * of Spark's two JSON surfaces, complementing q15's per-path
    * `get_json_object`: `from_json` parses each `props` object ONCE
    * against an explicit StructType and yields a typed struct, the
    * production shape when several fields are consumed (one parse, N
    * field reads — path evaluation re-parses per path) and the only
    * shape with declared-schema semantics: a missing or non-conforming
    * field degrades to a typed NULL, counted here by
    * `n_events - n_with_k`. The parse is a map-only projection feeding
    * a 5-row partial aggregate; at 100 TB the JSON cost is the scan
    * itself, which is why a production pipeline would next materialize
    * the struct (the q127 schema-evolution move).
    */
  private def q174(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).as("p"))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_k_over_50"))
      .orderBy(col("event_type"))

  /** Frame-level dedup across media: the q49 frame-sampling pipeline's
    * content hashes grouped corpus-wide, keeping hashes that occur more
    * than once — the multimodal mirror of exact text dedup (near-
    * identical intro/outro/logo frames repeated across videos are the
    * single biggest redundancy in a crawled video corpus, and exact
    * frame-hash grouping is stage 1 of every frame-dedup stack). One
    * map-side-combinable shuffle on the 16-byte hash; media lists never
    * materialize — only counts and the min exemplar id travel.
    */
  private def q137(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.fromDocuments(Tables.documents(s, d)).toDF())
      .select(col("media_id"), explode(col("frames")).as("frame"))
      .select(col("media_id"), md5(col("frame")).as("frame_md5"))
      .groupBy(col("frame_md5"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("media_id")).as("n_media"),
        min(col("media_id")).as("exemplar_media"))
      .where(col("n_occurrences") >= 2)
      .orderBy(col("frame_md5"))

  /** Point-in-time cut for q139: 2024-01-16T00:00:00Z in epoch micros —
    * mid-stream, so both the as-of and the post-cut tail are non-empty.
    */
  val snapshotTUs = 1705363200000000L

  /** Point-in-time snapshot reconstruction ("AS OF T") with drift audit:
    * per user, the latest event value AS OF [[snapshotTUs]] next to the
    * end-of-stream latest, plus whether the user changed after the cut —
    * the time-travel read every changelog-backed warehouse serves, as
    * one aggregation. Both snapshots come from a SINGLE map-side-
    * combinable pass: `max(struct(t, id, v))` is the latest-wins
    * compaction (the q58 shape) and the AS OF variant is the same
    * aggregate over a `when(t <= T)`-masked struct — no second scan, no
    * window, no join. Users born after the cut surface with -1 (values
    * are strictly positive), never dropped.
    */
  private def q139(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("user_id"), expr("ts div 1000").as("t_us"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    e.groupBy(col("user_id"))
      .agg(
        max(when(col("t_us") <= snapshotTUs,
          struct(col("t_us"), col("event_id"), col("v")))).as("at_t"),
        max(struct(col("t_us"), col("event_id"), col("v"))).as("latest"),
        sum(when(col("t_us") > snapshotTUs, 1L).otherwise(0L)).as("n_events_after"))
      .select(
        col("user_id"),
        coalesce(col("at_t.v"), lit(-1L)).as("value_at_t_centi"),
        col("latest.v").as("value_latest_centi"),
        col("n_events_after"),
        (col("at_t").isNull || col("at_t.t_us") =!= col("latest.t_us") ||
          col("at_t.event_id") =!= col("latest.event_id")).cast("long")
          .as("changed_after_t"))
      .orderBy(col("user_id"))
  }

  /** Top 3-step behavioral paths: the most frequent (event, next, next)
    * trigrams over each user's time-ordered stream — q103's Markov
    * transitions extended to the path grain (second-order behavior a
    * first-order matrix cannot see, e.g. whether view→click converts
    * differently after a search vs a purchase). Two bounded lead()
    * columns over the per-user window, one map-side-combinable rollup
    * on the (s1, s2, s3) key (bounded by |types|³), top-20 under a
    * total order via TakeOrdered — never a global ranking window.
    */
  private def q144(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("t_us"), col("event_id"))
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .where(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("s1"), col("s2"), col("s3"))
      .limit(20)
  }

  /** Inter-arrival burstiness audit, per event type: the coefficient of
    * variation of same-(user, type) inter-arrival gaps — the
    * Poisson-ness check an ops/capacity team runs (cv_milli ≈ 1000 for
    * memoryless exponential arrivals; far above = bursty/retry-storm,
    * far below = scheduled/heartbeat traffic). Gaps come from bounded
    * per-(user, type) lag windows in whole seconds; the moments are
    * EXACT (decimal(38) sums, HUGEINT in the oracle — order-independent,
    * the q62 promotion discipline, and second-grain squares keep even
    * the cross-term n·Σg² far inside decimal(38)); the final
    * cv = sqrt(n·Σg² − (Σg)²)/Σg then evaluates one identical IEEE
    * spelling on those exact inputs in both engines.
    */
  private def q148(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("t_us"), col("event_id"))
      .withColumn("prev", lag(col("t_us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"), expr("(t_us - prev) div 1000000").as("g"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("g").cast("decimal(38,0)")).as("sx"),
        sum(col("g").cast("decimal(38,0)") * col("g").cast("decimal(38,0)")).as("sxx"))
      .select(
        col("event_type"), col("n_gaps"),
        expr("CAST(sx div CAST(n_gaps AS DECIMAL(38,0)) AS BIGINT)").as("mean_gap_s"),
        // sx = 0 (every gap 0 whole seconds — same-second bursts) makes
        // cv 0/0 = NaN; Spark's non-ANSI cast would silently NULL it
        // while DuckDB errors on CAST(NaN AS BIGINT). Guard BOTH engines
        // to an explicit NULL so the degenerate case agrees.
        // greatest(disc, 0): when all gaps are equal and the moments
        // exceed double precision, n·Σg² − (Σg)² can round to a tiny
        // NEGATIVE double, sqrt gives NaN, and the engines diverge again
        // (Spark NULLs the cast, DuckDB errors). Clamp in BOTH engines.
        expr("CASE WHEN sx > 0 THEN" +
          " CAST(floor(1000.0 * sqrt(greatest(CAST(n_gaps AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) / CAST(sx AS DOUBLE)) AS BIGINT)" +
          " ELSE NULL END")
          .as("cv_milli"))
      .orderBy(col("event_type"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q148_arrival_burstiness", q148, Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t, event_id
        |           FROM events),
        |l AS (SELECT event_type,
        |        (t - lag(t) OVER (PARTITION BY user_id, event_type
        |           ORDER BY t, event_id)) // 1000000 AS g
        |      FROM e),
        |m AS (SELECT event_type, count(*) AS n_gaps,
        |        sum(CAST(g AS HUGEINT)) AS sx,
        |        sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sxx
        |      FROM l WHERE g IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps,
        |  CAST(sx // CAST(n_gaps AS HUGEINT) AS BIGINT) AS mean_gap_s,
        |  CASE WHEN sx > 0 THEN
        |    CAST(floor(1000.0 * sqrt(greatest(CAST(n_gaps AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) / CAST(sx AS DOUBLE)) AS BIGINT)
        |  ELSE NULL END AS cv_milli
        |FROM m ORDER BY event_type""".stripMargin)),
    QueryDef("q144_top_paths", q144, Some(
      """WITH e AS (SELECT user_id, event_type,
        |        epoch_ns(ts) // 1000 AS t_us, event_id FROM events),
        |p AS (SELECT event_type AS s1,
        |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS s2,
        |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS s3
        |      FROM e)
        |SELECT s1, s2, s3, count(*) AS n_paths
        |FROM p WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, s1, s2, s3 LIMIT 20""".stripMargin)),
    QueryDef("q139_snapshot_as_of", q139, Some(
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us, event_id,
         |             CAST(round(value * 100) AS BIGINT) AS v
         |           FROM events),
         |l AS (SELECT user_id, t_us, event_id, v, row_number() OVER (
         |        PARTITION BY user_id ORDER BY t_us DESC, event_id DESC) AS rn
         |      FROM e),
         |a AS (SELECT user_id, t_us, event_id, v, row_number() OVER (
         |        PARTITION BY user_id ORDER BY t_us DESC, event_id DESC) AS rn
         |      FROM e WHERE t_us <= $snapshotTUs),
         |na AS (SELECT user_id, CAST(sum(CASE WHEN t_us > $snapshotTUs THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_events_after
         |       FROM e GROUP BY user_id)
         |SELECT l.user_id,
         |  coalesce(a.v, -1) AS value_at_t_centi,
         |  l.v AS value_latest_centi,
         |  na.n_events_after,
         |  CAST(CASE WHEN a.user_id IS NULL OR a.t_us <> l.t_us
         |         OR a.event_id <> l.event_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS changed_after_t
         |FROM (SELECT * FROM l WHERE rn = 1) l
         |LEFT JOIN (SELECT * FROM a WHERE rn = 1) a USING (user_id)
         |JOIN na USING (user_id)
         |ORDER BY user_id""".stripMargin)),
    QueryDef("q137_frame_dedup", q137, Some(
      """WITH m AS (SELECT doc_id AS media_id, text FROM documents WHERE length(text) > 0),
        |idx AS (SELECT media_id, text,
        |          unnest(range(0, CAST(floor((length(text) - 1) / 32) AS BIGINT) + 1)) AS i
        |        FROM m),
        |kept AS (SELECT media_id, md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 32)) AS frame_md5
        |         FROM idx WHERE i % 4 = 0)
        |SELECT frame_md5, count(*) AS n_occurrences,
        |  count(DISTINCT media_id) AS n_media, min(media_id) AS exemplar_media
        |FROM kept GROUP BY frame_md5 HAVING count(*) >= 2
        |ORDER BY frame_md5""".stripMargin)),
    QueryDef("q174_json_struct", q174, Some(
      s"""WITH e AS (SELECT event_type,
         |        TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k FROM events)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(k) AS BIGINT) AS n_with_k,
         |  CAST(sum(k) AS BIGINT) AS sum_k,
         |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_over_50
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q128_retention_cohorts", q128, Some(
      s"""WITH wk AS (SELECT DISTINCT user_id,
         |        (epoch_ns(ts) // 1000) // $cohortDayUs AS day FROM events),
         |f AS (SELECT user_id, min(day) AS cohort_day FROM wk GROUP BY user_id),
         |c AS (SELECT cohort_day, day - cohort_day AS offset_days,
         |        count(*) AS n_active
         |      FROM wk JOIN f USING (user_id) GROUP BY 1, 2),
         |s AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1)
         |SELECT cohort_day, offset_days, n_active, cohort_size,
         |  (1000 * n_active) // cohort_size AS retention_per_mille
         |FROM c JOIN s USING (cohort_day)
         |ORDER BY cohort_day, offset_days""".stripMargin)),
    QueryDef("q124_debounce", q124, Some(
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t_us, event_id
         |           FROM events),
         |l AS (SELECT *, lag(t_us) OVER (PARTITION BY user_id, event_type
         |        ORDER BY t_us, event_id) AS prev FROM e),
         |k AS (SELECT event_type,
         |        CASE WHEN prev IS NULL OR t_us - prev >= $debounceUs
         |          THEN 1 ELSE 0 END AS kept FROM l)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(kept) AS BIGINT) AS n_kept,
         |  count(*) - CAST(sum(kept) AS BIGINT) AS n_dropped
         |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("q125_last_touch", q125, Some(
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t_us, event_id
         |           FROM events),
         |s AS (SELECT *,
         |        last_value(CASE WHEN event_type <> 'purchase' THEN t_us END IGNORE NULLS)
         |          OVER (PARTITION BY user_id ORDER BY t_us, event_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_t,
         |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
         |          OVER (PARTITION BY user_id ORDER BY t_us, event_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_ty
         |      FROM e)
         |SELECT CASE WHEN src_t IS NOT NULL AND t_us - src_t <= $attributionWindowUs
         |         THEN src_ty ELSE 'none' END AS attributed_type,
         |  count(*) AS n_purchases
         |FROM s WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q118_scd2_intervals", q118, Some(
      s"""WITH e AS (SELECT user_id, event_type AS state,
         |         epoch_ns(ts) // 1000 AS t_us, event_id FROM events),
         |l AS (SELECT *, lag(state) OVER (PARTITION BY user_id
         |        ORDER BY t_us, event_id) AS prev FROM e),
         |v AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR prev <> state
         |          THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
         |        ORDER BY t_us, event_id) AS BIGINT) AS version FROM l),
         |g AS (SELECT user_id, version, state, min(t_us) AS valid_from_us,
         |        count(*) AS n_events
         |      FROM v GROUP BY user_id, version, state),
         |t AS (SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id
         |        ORDER BY version) AS nxt FROM g)
         |SELECT user_id, version, state, valid_from_us,
         |  coalesce(nxt, $scdOpenEndUs) AS valid_to_us, n_events,
         |  CAST(nxt IS NULL AS BIGINT) AS is_current
         |FROM t ORDER BY user_id, version""".stripMargin)),
    QueryDef("q113_incremental_view", q113, Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_centi
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),
    QueryDef("q107_gap_fill", q107, Some(
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events),
        |daily AS (SELECT user_id, day, count(*) AS n FROM e GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |panel AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span)
        |SELECT p.user_id, p.day,
        |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
        |  CAST(CASE WHEN daily.n IS NULL THEN 0 ELSE 1 END AS BIGINT) AS active
        |FROM panel p LEFT JOIN daily ON p.user_id = daily.user_id AND p.day = daily.day
        |ORDER BY p.user_id, p.day""".stripMargin)),
    QueryDef("q102_json_extract", q102, Some(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(try_cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_k,
        |  CAST(sum(try_cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(try_cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(try_cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("q103_markov_transitions", q103, Some(
      """WITH nx AS (SELECT event_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |      FROM events),
        |t AS (SELECT event_type, next_type, count(*) AS n_trans
        |      FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, CAST(n_trans AS BIGINT) AS n_trans,
        |  CAST(floor(1000 * n_trans / sum(n_trans) OVER (PARTITION BY event_type)) AS BIGINT) AS p_milli
        |FROM t ORDER BY event_type, next_type""".stripMargin)),
    QueryDef("q31_multimodal_features", q31, Some {
      // encode() -> UTF-8 bytes; the corpus is ASCII so char ops == byte
      // ops (and the Spark side operates on the same UTF-8 payload bytes).
      val checksum = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(substr(text, 1, 64), ''), c -> CAST(ascii(c) AS BIGINT))), " +
        "(a, b) -> a + b)"
      s"""SELECT doc_id AS media_id, 'image' AS kind,
         |octet_length(encode(text)) AS n_bytes,
         |octet_length(encode(text)) % 640 AS width,
         |(octet_length(encode(text)) * 7) % 480 AS height,
         |$checksum AS checksum64
         |FROM documents ORDER BY media_id""".stripMargin
    }),
    QueryDef("q153_image_ahash", q153, Some(
      """WITH px AS (
        |  SELECT doc_id, i,
        |    (((doc_id*1009 + i*2003) % 256) + ((doc_id*733 + i*877) % 256)
        |      + ((doc_id*389 + i*1543) % 256)) // 3 AS gray,
        |    ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk
        |  FROM documents CROSS JOIN (SELECT unnest(range(256)) AS i)),
        |t AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) AS gray_total
        |      FROM px GROUP BY doc_id),
        |bs AS (SELECT doc_id, blk, CAST(sum(gray) AS BIGINT) AS bsum
        |       FROM px GROUP BY doc_id, blk),
        |bits AS (
        |  SELECT bs.doc_id, bs.blk,
        |    CASE WHEN bsum * 64 > t.gray_total THEN 1 ELSE 0 END AS bit
        |  FROM bs JOIN t ON bs.doc_id = t.doc_id)
        |SELECT b.doc_id AS media_id, CAST(16 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height, t.gray_total,
        |  CAST(sum(CASE WHEN blk < 32 THEN bit * (CAST(1 AS BIGINT) << blk)
        |    ELSE 0 END) AS BIGINT) AS ahash_lo,
        |  CAST(sum(CASE WHEN blk >= 32 THEN bit * (CAST(1 AS BIGINT) << (blk - 32))
        |    ELSE 0 END) AS BIGINT) AS ahash_hi
        |FROM bits b JOIN t ON b.doc_id = t.doc_id
        |GROUP BY b.doc_id, t.gray_total ORDER BY media_id""".stripMargin)),
    QueryDef("q154_audio_features", q154, Some(
      """WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id*7919 + i*4001 + (i*i % 9973) * 13) % 65536) - 32768 AS amp
        |  FROM documents CROSS JOIN (SELECT unnest(range(256)) AS i)),
        |x AS (
        |  SELECT doc_id, amp,
        |    lag(amp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM s)
        |SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(32000 AS BIGINT) AS duration_us,
        |  CAST(max(abs(amp)) AS BIGINT) AS peak_abs,
        |  CAST(sum(amp*amp) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND ((amp < 0) <> (prev < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM x GROUP BY doc_id ORDER BY media_id""".stripMargin)),
    QueryDef("q155_image_dedup", q155, Some(
      """WITH seeds AS (SELECT DISTINCT doc_id % 40 AS seed FROM documents),
        |px AS (
        |  SELECT seed, i,
        |    (((seed*1009 + i*2003) % 256) + ((seed*733 + i*877) % 256)
        |      + ((seed*389 + i*1543) % 256)) // 3 AS gray,
        |    ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk
        |  FROM seeds CROSS JOIN (SELECT unnest(range(256)) AS i)),
        |t AS (SELECT seed, CAST(sum(gray) AS BIGINT) AS total FROM px GROUP BY seed),
        |bs AS (SELECT seed, blk, CAST(sum(gray) AS BIGINT) AS bsum
        |       FROM px GROUP BY seed, blk),
        |bits AS (
        |  SELECT bs.seed, bs.blk,
        |    CASE WHEN bsum * 64 > t.total THEN 1 ELSE 0 END AS bit
        |  FROM bs JOIN t ON bs.seed = t.seed),
        |h AS (
        |  SELECT seed,
        |    CAST(sum(CASE WHEN blk < 32 THEN bit * (CAST(1 AS BIGINT) << blk)
        |      ELSE 0 END) AS BIGINT) AS ahash_lo,
        |    CAST(sum(CASE WHEN blk >= 32 THEN bit * (CAST(1 AS BIGINT) << (blk - 32))
        |      ELSE 0 END) AS BIGINT) AS ahash_hi
        |  FROM bits GROUP BY seed)
        |SELECT h.ahash_hi, h.ahash_lo, CAST(count(*) AS BIGINT) AS n_images,
        |  CAST(min(d.doc_id) AS BIGINT) AS rep_media_id
        |FROM documents d JOIN h ON d.doc_id % 40 = h.seed
        |GROUP BY h.ahash_hi, h.ahash_lo ORDER BY rep_media_id""".stripMargin)),
    QueryDef("q156_video_scene_stats", q156, Some(
      """WITH vids AS (SELECT doc_id, unnest(range(3)) AS scene FROM documents),
        |sd2 AS (SELECT doc_id, scene, doc_id*8 + scene AS seed FROM vids),
        |px2 AS (
        |  SELECT seed, i,
        |    (((seed*1009 + i*2003) % 256) + ((seed*733 + i*877) % 256)
        |      + ((seed*389 + i*1543) % 256)) // 3 AS gray,
        |    ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk
        |  FROM (SELECT DISTINCT seed FROM sd2)
        |  CROSS JOIN (SELECT unnest(range(256)) AS i)),
        |tot AS (SELECT seed, CAST(sum(gray) AS BIGINT) AS total FROM px2 GROUP BY seed),
        |bsm AS (SELECT seed, blk, CAST(sum(gray) AS BIGINT) AS bsum
        |        FROM px2 GROUP BY seed, blk),
        |bts AS (
        |  SELECT bsm.seed, bsm.blk,
        |    CASE WHEN bsum * 64 > tot.total THEN 1 ELSE 0 END AS bit
        |  FROM bsm JOIN tot ON bsm.seed = tot.seed),
        |hsh AS (
        |  SELECT seed,
        |    CAST(sum(CASE WHEN blk < 32 THEN bit * (CAST(1 AS BIGINT) << blk)
        |      ELSE 0 END) AS BIGINT) AS ahash_lo,
        |    CAST(sum(CASE WHEN blk >= 32 THEN bit * (CAST(1 AS BIGINT) << (blk - 32))
        |      ELSE 0 END) AS BIGINT) AS ahash_hi
        |  FROM bts GROUP BY seed),
        |seq AS (
        |  SELECT sd2.doc_id, sd2.scene, hsh.ahash_lo, hsh.ahash_hi,
        |    lag(hsh.ahash_lo) OVER (PARTITION BY sd2.doc_id ORDER BY sd2.scene) AS plo,
        |    lag(hsh.ahash_hi) OVER (PARTITION BY sd2.doc_id ORDER BY sd2.scene) AS phi
        |  FROM sd2 JOIN hsh ON sd2.seed = hsh.seed)
        |SELECT doc_id AS media_id, CAST(9 AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT (ahash_hi, ahash_lo)) AS BIGINT) AS n_unique_frames,
        |  CAST(sum(CASE WHEN plo IS NOT NULL
        |    AND (ahash_lo <> plo OR ahash_hi <> phi) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_scene_cuts
        |FROM seq GROUP BY doc_id ORDER BY media_id""".stripMargin)),
    QueryDef("q49_frame_sample", q49, Some(
      """WITH m AS (SELECT doc_id AS media_id, text FROM documents WHERE length(text) > 0),
        |idx AS (SELECT media_id, text,
        |          unnest(range(0, CAST(floor((length(text) - 1) / 32) AS BIGINT) + 1)) AS i
        |        FROM m),
        |kept AS (SELECT media_id, i, substr(text, CAST(i * 32 + 1 AS BIGINT), 32) AS frame
        |         FROM idx WHERE i % 4 = 0)
        |SELECT media_id, i // 4 AS frame_idx, md5(frame) AS frame_md5
        |FROM kept ORDER BY media_id, frame_idx""".stripMargin)),
    // LOAD-BEARING INVARIANT: the Spark side keeps every 3rd BYTE of the
    // UTF-8 payload while this oracle keeps every 3rd CHARACTER (DuckDB
    // has no BLOB substring to write the byte form) — equal only while
    // the corpus is pure ASCII. MultimodalSpec pins length(text) ==
    // octet_length(utf8(text)) over the whole table, so a non-ASCII
    // corpus fails loudly there instead of silently diverging here.
    QueryDef("q70_resize", q70, Some(
      """WITH rz AS (SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
        |  array_to_string(list_transform(
        |    list_filter(range(0, length(text)), i -> i % 3 = 0),
        |    i -> substr(text, CAST(i + 1 AS BIGINT), 1)), '') AS rs
        |  FROM documents)
        |SELECT media_id, orig_bytes, CAST(length(rs) AS BIGINT) AS new_bytes,
        |md5(rs) AS resized_md5
        |FROM rz ORDER BY media_id""".stripMargin)),
    QueryDef("q32_session_windows", q32, Some {
      val gapUs = 8L * 3600 * 1000000
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
         |o AS (SELECT user_id, us, value,
         |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= $gapUs
         |             THEN 1 ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
         |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
         |SELECT user_id, min(us) // 1000000 AS session_start,
         |  count(*) AS n_events, round(sum(value), 2) AS session_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
    }),
    // Tumbling windows align to the epoch (Spark's window() default), so
    // window_start = floor(event seconds / 300) * 300.
    QueryDef("q87_windowed_agg", q87, Some(
      """SELECT (epoch_ns(ts) // 1000000000) // 300 * 300 AS window_start,
        |event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin)),
    QueryDef("q92_sliding_agg", q92, Some(
      """WITH e AS (SELECT event_type, value,
        |        (epoch_ns(ts) // 1000000000) // 300 * 300 AS hop FROM events),
        |x AS (SELECT event_type, value, hop - k * 300 AS window_start
        |      FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS k) ks)
        |SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM x GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin)),
  )
}
