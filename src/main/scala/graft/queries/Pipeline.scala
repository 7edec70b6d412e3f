package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{text, textstats}

/** Training-data pipeline operators beyond dedup/similarity: deterministic
  * dataset splitting, context-window sequence packing, collocation mining,
  * and statistical outlier filtering. Everything is engine-portable by
  * construction (integer or integer-ratio arithmetic only — see
  * oracle-portability notes in the repo memory) and shuffle-parallel:
  * per-row hashing is a narrow map, the rest is one partial-aggregating
  * shuffle or one window sort each.
  */
object Pipeline {

  /** Deterministic stratified train/val/test split. The split is a pure
    * function of doc_id (portable polynomial hash, mod 10 → 80/10/10), so
    * any executor — and any retry, and tomorrow's incremental run — puts
    * the same document in the same split without coordination: the
    * property a reproducible 100 TB corpus split actually needs (a
    * rand()-based split has none of it). Summarized per (lang, split).
    */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(textstats.rollingHash(col("doc_id").cast("string")), lit(10))
    Tables.documents(s, d)
      .select(
        col("lang"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test").as("split"),
        col("n_chars"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** Sequence packing: assign documents to fixed token-budget context
    * batches (the LLM pretraining sharder). Documents are laid out in
    * deterministic (lang, doc_id) order; a doc's batch is the budget
    * window its cumulative-token OFFSET falls in. The running total is
    * the DISTRIBUTED prefix sum ([[graft.operators.PrefixSum]]) — a plain
    * `sum over (partition by lang order by doc_id)` would put an entire
    * language on one reducer, which dies at corpus scale; bucketing by
    * `doc_id div 500` keeps the result identical (proven in PipelineSpec)
    * with parallelism = buckets. Emits per-batch occupancy.
    */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val budget = 2048
    val base = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        size(text.normalizedTokens(col("text"))).cast("long").as("n_tok"),
        expr("doc_id div 500").as("bkt"))
      .localCheckpoint() // feeds both the local windows and the offsets
    graft.operators.PrefixSum
      .withRunningTotal(base, Seq("lang"), "bkt", Seq("doc_id"), "n_tok", "cum")
      .withColumn("batch_id", expr(s"(cum - n_tok) div $budget"))
      .groupBy(col("lang"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("batch_id"))
  }

  /** Collocation mining: bigrams ranked by pointwise mutual information.
    * PMI = log(p(xy)/(p(x)p(y))) is monotone in n_xy*N/(n_x*n_y), so the
    * ranking uses that ratio floor-scaled to integer milli-units — exact
    * in both engines, no log and no float ties. Corpus totals travel as a
    * broadcast 1-row table (no driver-side scalar).
    */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(text.normalizedTokens(col("text")).as("toks"))
      .localCheckpoint() // tokenization feeds the bigram AND unigram branches
    val bigrams = TextAnalysis.docBigramsTable(s, d)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
    // Unigram counts and the corpus total come from ALL documents — only
    // the bigram source needs the >= 2-token guard. (The oracle's uni CTE
    // is unfiltered too; scoping both to multi-token docs would diverge
    // on any corpus containing a single-token document.)
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // vocab-sized; feeds the n_x join, the n_y join, and the total
    val total = uni.agg(sum(col("n")).as("N"))
    bigrams
      .join(uni.select(col("w").as("w1"), col("n").as("n_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_y")), "w2")
      .crossJoin(broadcast(total))
      .where(col("n_xy") >= 5)
      // The numerator is promoted to decimal(38,0) BEFORE multiplying:
      // in 64-bit longs 1000*n_xy*N wraps silently (ANSI off) once the
      // corpus token count passes ~3e9, while DuckDB raises — decimal
      // keeps both engines exact to 1e38 (n_xy <= N, so the product is
      // bounded by 1000*N^2: safe past a 10^17-token corpus). `div` on
      // decimals is Spark's IntegralDivide — still an exact integer
      // quotient, returned as BIGINT.
      .withColumn("pmi_milli",
        expr("(CAST(1000 AS DECIMAL(38,0)) * n_xy * N) div (CAST(n_x AS DECIMAL(38,0)) * n_y)"))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"), col("pmi_milli"))
      .orderBy(col("pmi_milli").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** Quality filter: documents whose length is a per-language outlier
    * (|z| > 2 on n_chars). The MOMENTS are exact (decimal sums on the
    * Spark side, HUGEINT in the oracle — order-independent, no float
    * accumulation); the z²>4 comparison then evaluates the identical
    * IEEE-double expression on those exact inputs in both engines, so
    * the boolean cannot diverge — and unlike a fully-integer
    * cross-multiplication, (n-1)·dd² never overflows decimal(38) at any
    * group size (doubles carry the magnitude; exactness lives in the
    * inputs). Group moments are a 4-row broadcast; the filter itself is
    * a narrow map over the corpus.
    */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // Each operand is promoted to decimal(38,0) BEFORE its multiply: the
    // long-space spellings (n_chars * n_chars, n * n_chars) wrap silently
    // past n_chars ~3e9 with ANSI off while DuckDB errors — promotion
    // first keeps the moments genuinely exact to 1e38. The variance
    // combination n*sxx - sx*sx CAN top decimal(38) on huge groups, so it
    // runs in double space with the identical spelling in the oracle
    // (IEEE ops on exact inputs — both engines round the same way).
    val st = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
      sum(col("n_chars").cast("decimal(38,0)") * col("n_chars").cast("decimal(38,0)")).as("sxx"))
    docs.join(broadcast(st), "lang")
      .withColumn("dd",
        col("n").cast("decimal(38,0)") * col("n_chars").cast("decimal(38,0)") - col("sx"))
      .where(expr(
        "CAST(n - 1 AS DOUBLE) * CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE)" +
          " > CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)" +
          " * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Ordered funnel analysis: per user, the earliest view, the earliest
    * click AFTER that view, and the earliest purchase AFTER that click —
    * the stage-dependency makes this three chained aggregations (each one
    * shuffle on user_id), not a single conditional aggregate; absent
    * stages surface as -1 so the row schema is dense. The canonical
    * product-analytics asymmetric-sequence query over the event stream.
    */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("t"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t")).as("t_view"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id").where(col("t") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("t")).as("t_click"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("t") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("t")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(
        col("user_id"),
        when(col("t_purchase").isNotNull, "purchase")
          .when(col("t_click").isNotNull, "click").otherwise("view").as("stage"),
        col("t_view").as("t_view_us"),
        coalesce(col("t_click"), lit(-1L)).as("t_click_us"),
        coalesce(col("t_purchase"), lit(-1L)).as("t_purchase_us"))
      .orderBy(col("user_id"))
  }

  /** Deterministic uniform corpus sample: rank documents per language by
    * portable content-independent hash and keep the first k — the
    * reproducible eval-subset selector (same rows on every run, engine,
    * and cluster size; contrast TABLESAMPLE/rand(), which are none of
    * those). One window sort per language partition.
    */
  /** Salt slices for the q64 sampler — same role as
    * [[TextCorpus.postingSalt]]: a hot language ranks in `sampleSalt`
    * parallel slices instead of shipping its whole corpus to one task.
    */
  val sampleSalt = 16

  /** Per-language top-k sampler with bounded per-task state: rank within
    * (lang, doc_id % salt) slices and keep <= k per slice (every global
    * top-k row survives its own slice's cap), then rank the <= salt*k
    * survivors per language for the final rk. Identical to the plain
    * per-language `row_number <= k` — but no task ever sorts a whole
    * language's corpus (at 100 TB one language IS most of the corpus),
    * and both passes stay in whole-stage codegen (the typed
    * TopKAggregator alternative pays a per-row encode/decode plus a
    * first-execution JIT cliff — see [[TextCorpus.cappedPostings]]).
    * Exposed for the hot-language spec.
    */
  private[graft] def sampledPerLang(docs: DataFrame, k: Int): DataFrame = {
    val slice = Window
      .partitionBy(col("lang"), pmod(col("doc_id"), lit(sampleSalt)))
      .orderBy(col("h"), col("doc_id"))
    val global = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .select(col("lang"), col("doc_id"),
        textstats.rollingHash(col("doc_id").cast("string")).as("h"))
      .withColumn("r1", row_number().over(slice)).where(col("r1") <= k)
      .withColumn("rk", row_number().over(global).cast("long"))
      .where(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"))
  }

  private def q64(s: SparkSession, d: String): DataFrame =
    sampledPerLang(Tables.documents(s, d), 20)
      .orderBy(col("lang"), col("rk"))

  /** Weighted deterministic sample (q100): priority sampling (Duffield/
    * Lund/Thorup shape) — per source, keep the k docs with the smallest
    * priority = hash(doc_id) / n_chars, so a document's inclusion odds
    * scale with its weight (longer docs sampled preferentially) while
    * the choice stays a pure function of the data: re-runs, retries and
    * both engines pick the identical sample. The priority is one IEEE
    * double division of two exact integers — correctly rounded and
    * therefore bit-identical on every engine (same guarantee the
    * floor(1000*n/d) ratios lean on), with doc_id as total tie-break.
    * Ranking rides the q64 salted two-level window: slice ranks bound
    * per-task state on a hot source, the second pass ranks <= salt*k
    * survivors.
    *
    * The hash input is suffix-padded: the bare rolling hash of a 1-3
    * char id string is dominated by its LENGTH (polynomial of degree
    * len-1), so short ids would always win the minimum and erase the
    * weight bias; the suffix multiplies every id's contribution by
    * 31^9 mod P, spreading magnitudes over the full hash range
    * (bias measured in PipelineSpec).
    */
  private[graft] def weightedSamplePerSource(docs: DataFrame, k: Int): DataFrame = {
    val slice = Window
      .partitionBy(col("source"), pmod(col("doc_id"), lit(sampleSalt)))
      .orderBy(col("pri"), col("doc_id"))
    val global = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        (textstats.rollingHash(concat(col("doc_id").cast("string"), lit("#priority")))
          .cast("double") / col("n_chars").cast("double")).as("pri"))
      .withColumn("r1", row_number().over(slice)).where(col("r1") <= k)
      .withColumn("rk", row_number().over(global).cast("long"))
      .where(col("rk") <= k)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
  }

  private def q100(s: SparkSession, d: String): DataFrame =
    weightedSamplePerSource(Tables.documents(s, d), 10)
      .orderBy(col("source"), col("rk"))

  /** DuckDB replica of the doc_id hash — the ONE shared rolling-hash
    * replica ([[DedupQueries.rollSql]]), so a future hash/modulus change
    * cannot drift these oracles out of sync with the dedup ones.
    */
  private val hashSql = DedupQueries.rollSql("CAST(doc_id AS VARCHAR)")

  /** Length-decile stratification — the curriculum/length-bucketing pass
    * (order the corpus by document length, cut into 10 equal-count
    * strata, summarize each): a GLOBAL-order statistic, which the naive
    * `row_number() OVER (ORDER BY ...)` computes by shipping the entire
    * corpus to ONE task. Here the global rank rides the two-level
    * [[graft.operators.PrefixSum]] instead (running count of 1 bucketed
    * by the order-aligned `n_chars div 16`): local ranks parallel per
    * bucket, exclusive offsets from the tiny bucket-totals table, N from
    * a broadcast scalar — no task ever sees more than one bucket's rows.
    * decile = ((rank-1)*10) div N is exact integer both engines.
    */
  private def q91(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("N"))
    val base = docs.select(col("doc_id"), col("n_chars"), lit(1L).as("one"),
      expr("n_chars div 16").as("bkt"))
    graft.operators.PrefixSum
      .withRunningTotal(base, Seq.empty, "bkt", Seq("n_chars", "doc_id"), "one", "rn")
      .crossJoin(broadcast(n))
      .select(col("n_chars"), expr("((rn - 1) * 10) div N").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("decile"))
  }

  /** Document budget the q83 mixture allocates across languages. */
  val mixtureBudget = 100000L

  /** Exact-budget apportionment of the q83 temperature mixture (q97):
    * Hamilton's largest-remainder method. q83's floor-divided targets
    * under-shoot the budget by up to (n_langs - 1) docs; here the
    * leftover goes to the languages with the largest division remainders
    * (remainder desc, lang asc tie-break), so sum(target_docs) ==
    * [[mixtureBudget]] EXACTLY — the invariant a downstream sampler
    * needs before it can emit fixed-size shards. The ranking window is
    * partition-less by construction but runs over the language table
    * (bounded by the language inventory, never corpus rows).
    */
  private def q97(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("isq", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = st.agg(sum(col("isq")).as("sum_isq"))
    val b = st.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        expr(s"($mixtureBudget * isq) div sum_isq").as("base"),
        expr(s"($mixtureBudget * isq) % sum_isq").as("rem"))
    val lo = b.agg((lit(mixtureBudget) - sum(col("base"))).as("leftover"))
    b.crossJoin(broadcast(lo))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
      .select(col("lang"), col("n_docs"),
        (col("base") + when(col("rk") <= col("leftover"), lit(1L)).otherwise(lit(0L)))
          .as("target_docs"))
      .orderBy(col("lang"))
  }

  /** Output shard count for the q86 manifest. */
  val numShards = 32

  /** Deterministic output-shard manifest: assign every document to one of
    * [[numShards]] shards by the portable content-independent doc_id hash
    * and audit the balance (doc count, byte mass, id range per shard) —
    * the writer fan-out decision a 100 TB pipeline makes before the final
    * write, where shard skew becomes straggler tasks. Hash sharding is
    * retry-idempotent and cluster-size-independent (the same document
    * lands in the same shard on every run — `repartition(rand)` is
    * neither); the audit itself is one map-side-combined pass.
    */
  private def q86(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        pmod(textstats.rollingHash(col("doc_id").cast("string")), lit(numShards))
          .as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  /** Temperature-balanced language mixture (alpha = 1/2 — the resampling
    * a multilingual pretraining corpus applies so high-resource languages
    * stop drowning low-resource ones): per-language sampling weights and
    * target document counts proportional to sqrt(n_docs). Exactness:
    * isqrt = floor(sqrt(n)) is the same IEEE double in both engines
    * (sqrt is correctly rounded, and on integer inputs below 2^52 the
    * cast is exact), and every ratio after it is pure integer arithmetic.
    * Cost: ONE map-side-combined corpus pass; the language table and its
    * 1-row total are broadcast-sized.
    */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("isq", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = st.agg(sum(col("isq")).as("sum_isq"))
    st.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("isq"),
        expr("(1000 * isq) div sum_isq").as("weight_milli"),
        expr(s"($mixtureBudget * isq) div sum_isq").as("target_docs"))
      .withColumn("upsample_milli", expr("(1000 * target_docs) div n_docs"))
      .orderBy(col("lang"))
  }

  /** Chunk window/stride for q77: 48-token windows every 32 tokens
    * (16-token overlap) — the context-window split a tokenized corpus
    * goes through before packing/training. Sized to the test corpus
    * (10-99 tokens/doc) so most documents genuinely produce several
    * chunks; a production run raises both with the model context.
    */
  val chunkWindow = 48
  val chunkStride = 32

  /** Context-window chunking with overlap: split each document's token
    * stream into [[chunkWindow]]-token chunks every [[chunkStride]]
    * tokens. One narrow map + explode per document — embarrassingly
    * parallel, no shuffle until the output sort; chunk count per doc is
    * ceil(max(n-W,0)/S)+1 in exact integer arithmetic on both engines.
    * Each chunk is emitted with its token span and a content hash so the
    * oracle verifies the actual chunk text, not just the arithmetic.
    */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val (w, st) = (chunkWindow, chunkStride)
    Tables.documents(s, d)
      .select(col("doc_id"), text.normalizedTokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .withColumn("kmax",
        expr(s"CASE WHEN n <= $w THEN 0 ELSE (n - $w + ${st - 1}) div $st END"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("kmax"))).as("k"))
      .withColumn("chunk_start", col("k") * st)
      .withColumn("chunk_len", least(lit(w), col("n") - col("chunk_start")))
      .select(
        col("doc_id"),
        col("k").cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        col("chunk_len").cast("long").as("chunk_len"),
        md5(concat_ws(" ",
          slice(col("toks"), col("chunk_start") + 1, col("chunk_len"))).cast("binary"))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Decontamination n-gram length for q78. The right length is a
    * vocabulary property: real corpora use 8-13 tokens (chance
    * collisions vanish); this synthetic corpus draws from a 31-word
    * vocabulary, where 4 is the length that separates genuinely shared
    * passages from zero signal (measured: g=4 flags 8 train docs at
    * sf0.01, g>=6 flags none).
    */
  val contamGram = 4

  /** Train/eval decontamination: flag every train document sharing at
    * least one [[contamGram]]-token n-gram with the held-out eval set
    * (doc_id % 97 == 0 here; in production, the benchmark suite). The
    * eval side's distinct n-grams are the SMALL side — they broadcast —
    * and the train side streams through the semi-join shape without ever
    * pairing documents: cost is O(train n-grams), the only admissible
    * shape when the train corpus is 100 TB. n_shared counts distinct
    * shared n-grams per document (the triage signal a removal pass
    * ranks by).
    */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val g = contamGram
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), text.normalizedTokens(col("text")).as("toks"))
      .where(size(col("toks")) >= g)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("toks")) - (g - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(g)))))).as("gram"))
    val evalGrams = grams.where(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct()
    val hits = grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    Tables.documents(s, d)
      .where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q77_chunk_overlap", q77, Some(
      s"""WITH toks AS (SELECT doc_id, ${TextCorpus.tokensSql} AS t FROM documents),
         |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         |km AS (SELECT doc_id, t, n,
         |        CASE WHEN n <= $chunkWindow THEN 0
         |             ELSE (n - $chunkWindow + ${chunkStride - 1}) // $chunkStride END AS kmax
         |       FROM d),
         |c AS (SELECT doc_id, t, n, unnest(range(0, kmax + 1)) AS k FROM km),
         |ch AS (SELECT doc_id, k AS chunk_id, k * $chunkStride AS chunk_start,
         |        least($chunkWindow, n - k * $chunkStride) AS chunk_len, t FROM c)
         |SELECT doc_id, chunk_id, chunk_start, chunk_len,
         |md5(array_to_string(t[CAST(chunk_start + 1 AS BIGINT):CAST(chunk_start + chunk_len AS BIGINT)], ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)),
    QueryDef("q78_decontamination", q78, Some(
      s"""WITH toks AS (SELECT doc_id, ${TextCorpus.tokensSql} AS t FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |        range(1, len(t) - ${contamGram - 2}),
         |        i -> array_to_string(t[i:i + ${contamGram - 1}], ' ')))) AS gram
         |      FROM toks WHERE len(t) >= $contamGram),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
         |hits AS (SELECT doc_id, count(*) AS n_shared
         |         FROM g JOIN ev USING (gram) WHERE doc_id % 97 <> 0
         |         GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
         |CAST(coalesce(n_shared, 0) > 0 AS BIGINT) AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
         |LEFT JOIN hits USING (doc_id)
         |ORDER BY doc_id""".stripMargin)),
    QueryDef("q86_shard_manifest", q86, Some(
      s"""WITH h AS (SELECT doc_id, n_chars, $hashSql % $numShards AS shard FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),
    QueryDef("q100_weighted_sample", q100, Some(
      s"""WITH p AS (SELECT source, doc_id, n_chars,
         |        CAST(${DedupQueries.rollSql("CAST(doc_id AS VARCHAR) || '#priority'")} AS DOUBLE)
         |          / CAST(n_chars AS DOUBLE) AS pri
         |      FROM documents),
         |r AS (SELECT source, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
         |      FROM p)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
         |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),
    QueryDef("q97_mixture_apportion", q97, Some(
      s"""WITH st AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |i AS (SELECT lang, n_docs,
         |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq FROM st),
         |t AS (SELECT CAST(sum(isq) AS BIGINT) AS sum_isq FROM i),
         |b AS (SELECT lang, n_docs,
         |        ($mixtureBudget * isq) // sum_isq AS base,
         |        ($mixtureBudget * isq) % sum_isq AS rem
         |      FROM i CROSS JOIN t),
         |l AS (SELECT CAST($mixtureBudget - sum(base) AS BIGINT) AS leftover FROM b),
         |r AS (SELECT b.*, leftover,
         |        row_number() OVER (ORDER BY rem DESC, lang) AS rk
         |      FROM b CROSS JOIN l)
         |SELECT lang, n_docs,
         |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS target_docs
         |FROM r ORDER BY lang""".stripMargin)),
    QueryDef("q83_lang_mixture", q83, Some(
      s"""WITH st AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |i AS (SELECT lang, n_docs,
         |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq FROM st),
         |t AS (SELECT CAST(sum(isq) AS BIGINT) AS sum_isq FROM i)
         |SELECT lang, n_docs, isq,
         |(1000 * isq) // sum_isq AS weight_milli,
         |($mixtureBudget * isq) // sum_isq AS target_docs,
         |(1000 * (($mixtureBudget * isq) // sum_isq)) // n_docs AS upsample_milli
         |FROM i CROSS JOIN t ORDER BY lang""".stripMargin)),
    QueryDef("q55_train_test_split", q55, Some(
      s"""WITH h AS (SELECT lang, n_chars, $hashSql % 10 AS b FROM documents)
         |SELECT lang,
         |CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
         |count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM h GROUP BY lang, split ORDER BY lang, split""".stripMargin)),
    QueryDef("q56_sequence_packing", q56, Some(
      s"""WITH t AS (SELECT lang, doc_id, len(${TextCorpus.tokensSql}) AS n_tok FROM documents),
         |c AS (SELECT lang, doc_id, n_tok,
         |        sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT lang, CAST((cum - n_tok) // 2048 AS BIGINT) AS batch_id,
         |count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |min(doc_id) AS first_doc
         |FROM c GROUP BY lang, batch_id ORDER BY lang, batch_id""".stripMargin)),
    QueryDef("q57_bigram_collocations", q57, Some(
      s"""WITH toks AS (SELECT ${TextCorpus.tokensSql} AS t FROM documents),
         |pairs AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
         |          FROM toks WHERE len(t) >= 2),
         |bg AS (SELECT w1, w2, count(*) AS n_xy FROM pairs GROUP BY w1, w2),
         |uni AS (SELECT unnest(t) AS w FROM toks),
         |unic AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM unic)
         |SELECT w1, w2, n_xy, x.n AS n_x, y.n AS n_y,
         |CAST((1000 * CAST(n_xy AS HUGEINT) * n_total) // (CAST(x.n AS HUGEINT) * y.n) AS BIGINT) AS pmi_milli
         |FROM bg JOIN unic x ON bg.w1 = x.w JOIN unic y ON bg.w2 = y.w CROSS JOIN tot
         |WHERE n_xy >= 5
         |ORDER BY pmi_milli DESC, w1, w2 LIMIT 50""".stripMargin)),
    QueryDef("q63_funnel", q63, Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(t) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND t > t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND t > t_click GROUP BY e.user_id)
        |SELECT user_id,
        |CASE WHEN t_purchase IS NOT NULL THEN 'purchase'
        |     WHEN t_click IS NOT NULL THEN 'click' ELSE 'view' END AS stage,
        |t_view AS t_view_us,
        |coalesce(t_click, -1) AS t_click_us,
        |coalesce(t_purchase, -1) AS t_purchase_us
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin)),
    QueryDef("q91_length_deciles", q91, Some(
      """WITH r AS (SELECT doc_id, n_chars,
        |        row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |        count(*) OVER () AS n FROM documents)
        |SELECT ((rn - 1) * 10) // n AS decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM r GROUP BY decile ORDER BY decile""".stripMargin)),
    QueryDef("q64_corpus_sample", q64, Some(
      s"""WITH h AS (SELECT lang, doc_id, $hashSql AS h FROM documents),
         |r AS (SELECT lang, doc_id,
         |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk FROM h)
         |SELECT lang, rk, doc_id FROM r WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin)),
    QueryDef("q62_outlier_docs", q62, Some(
      """WITH st AS (SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS HUGEINT) AS sx,
        |  sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sxx
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, documents.lang AS lang, n_chars
        |FROM documents JOIN st ON documents.lang = st.lang
        |WHERE CAST(n - 1 AS DOUBLE) * CAST(n*n_chars - sx AS DOUBLE) * CAST(n*n_chars - sx AS DOUBLE)
        |      > CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |ORDER BY doc_id""".stripMargin)),
  )
}
