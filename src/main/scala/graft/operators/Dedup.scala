package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text, textstats}

/** Document deduplication operators for the training-data pipeline:
  * exact (content-hash groupBy), MinHash signatures + LSH banding,
  * SimHash. All shuffle-parallel: hash/signature computation is a per-row
  * map; the only shuffles are the final groupBy/join on hash keys, which
  * is the minimum any dedup needs. At 100 TB the LSH band join is the
  * scale path (candidates only), never the all-pairs comparison.
  *
  * All hashes are engine-portable (polynomial char fold, not Spark's
  * xxhash/murmur) so the DuckDB oracle can replicate results exactly.
  */
object Dedup {

  val P: Long = 1000000007L

  /** MinHash permutation parameters h_i(x) = (A(i)*x + B(i)) mod P.
    * Sixteen permutations are available; the REGISTRY default signature
    * width stays [[numHashes]] = 8 (the first eight — so widening the
    * pool changed no existing signature). Width is the recall/cost knob:
    * with (b, r) banding the candidate probability is 1-(1-s^r)^b, so
    * the default r=1, b=8 catches half of all pairs at Jaccard ~0.08
    * (near-everything above 0.3), while r=2, b=4 moves that 50% point to
    * s ~ 0.40 — the curves are measured, not just derived, in
    * DedupSpec's (b, r) sweep.
    */
  val A: Seq[Long] = Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L,
    23L, 29L, 31L, 37L, 41L, 43L, 47L, 53L)
  val B: Seq[Long] = Seq(1L, 7L, 13L, 19L, 25L, 31L, 37L, 43L,
    49L, 55L, 61L, 67L, 73L, 79L, 85L, 91L)

  /** Widest available signature. */
  val maxHashes: Int = A.size

  /** Registry-default signature width (unchanged across rounds). */
  val numHashes: Int = 8

  val shingleSize = 3
  val simhashBits = 16

  /** Space-joined normalized text (the canonical content for hashing). */
  def normalizedText(textCol: Column): Column =
    concat_ws(" ", text.normalizedTokens(textCol))

  /** word-`shingleSize`-gram strings of the normalized token array.
    * Guarded: fewer than `shingleSize` tokens yields an empty array
    * (unguarded, `sequence(1, size-2)` with stop < start infers step -1
    * and the resulting slice(toks, 0, 3) errors at runtime).
    */
  def shingles(tokens: Column): Column =
    when(
      size(tokens) >= shingleSize,
      transform(
        sequence(lit(1), size(tokens) - (shingleSize - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(shingleSize))),
      ),
    ).otherwise(array().cast("array<string>"))

  /** Base hashes of each shingle, as one materialized array column. The
    * string hashing is the expensive part of a signature; computing it in
    * its own projection guarantees it runs ONCE per shingle — inlining it
    * into the `numHashes` minhash lambdas (the r2 shape) re-hashed every
    * shingle once per hash function, because HOF lambda bodies evaluate
    * interpreted with no cross-column subexpression sharing.
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => textstats.rollingHash(s))

  /** MinHash signature columns mh0..mh{k-1} over pre-hashed shingles
    * ([[shingleHashes]]): each permutation is a cheap affine map over
    * longs, min-reduced. `k` is the signature-width knob (<= maxHashes).
    */
  def minhashCols(hashCol: Column, k: Int = numHashes): Seq[Column] = {
    require(k >= 1 && k <= maxHashes, s"signature width $k outside [1, $maxHashes]")
    (0 until k).map { i =>
      array_min(transform(hashCol, h => (lit(A(i)) * h + lit(B(i))) % P)).as(s"mh$i")
    }
  }

  /** doc_id + minhash signature for every document with >= shingleSize
    * tokens. One narrow map stage — no shuffle.
    */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, k: Int = numHashes): DataFrame = {
    val toks = text.normalizedTokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= shingleSize)
      .select(col("doc_id"), shingleHashes(shingles(col("toks"))).as("hs"))
      .select(Seq(col("doc_id")) ++ minhashCols(col("hs"), k): _*)
  }

  /** Degenerate-bucket cutoff for LSH band joins: a band key shared by B
    * docs contributes B*(B-1)/2 candidate pairs, so one hot key (a
    * boilerplate shingle whose hash is the corpus-wide minimum) turns the
    * O(collisions) join quadratic. Buckets above the cap carry no dedup
    * signal (they would pair everything with everything) and are dropped
    * — standard LSH practice. The default never binds on the test corpora
    * (both engines apply it, so output agrees either way).
    */
  val defaultMaxBucket = 1000

  /** LSH candidate pairs: docs sharing >= 1 of the `numHashes` single-row
    * bands (r=1, b=numHashes — tuned for low-jaccard corpora; see
    * [[lshCandidatesBanded]] for the general (b, r) precision knob). The
    * band join shuffles on (band, key): candidate generation is
    * O(collisions), not O(n^2), and `maxBucket` bounds the worst key so a
    * degenerate bucket cannot re-create the quadratic blowup.
    */
  def lshCandidates(signatures: DataFrame, maxBucket: Int = defaultMaxBucket): DataFrame =
    pairsFromBands(bandRows(signatures, 1), maxBucket)

  /** Classic (b, r) LSH banding with r = `rowsPerBand` rows per band and
    * b = numHashes / r bands: a pair becomes a candidate iff ALL r
    * minhashes of some band agree, so per-band match probability is s^r
    * (s = Jaccard similarity) — the precision/recall knob. r = 1 is
    * [[lshCandidates]]; larger r filters low-similarity noise before the
    * exact verify stage pays for it.
    */
  def lshCandidatesBanded(
      signatures: DataFrame,
      rowsPerBand: Int,
      maxBucket: Int = defaultMaxBucket): DataFrame =
    pairsFromBands(bandRows(signatures, rowsPerBand), maxBucket)

  /** One (doc_id, band, key) row per band. The key packs the band's r
    * consecutive minhashes injectively into one BIGINT: each mh < P, so
    * they are base-P digits (r <= 2 stays exact in signed 64-bit;
    * P^2 ~ 1e18). Engine-portable — the oracle rebuilds the same digits.
    */
  def bandRows(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    // Signature width is read off the schema, so banding works for any
    // minhashSignatures(k) without threading the width through callers.
    val width = signatures.columns.count(_.matches("mh\\d+"))
    require(width >= 1, s"no mh* signature columns in ${signatures.columns.mkString(",")}")
    // Contiguity, not just count: a frame with mh0..mh7 plus a stray mh9
    // would pass the count check and then band over a hole. Require
    // exactly mh0..mh{width-1}.
    val missing = (0 until width).map(i => s"mh$i").filterNot(signatures.columns.contains)
    require(missing.isEmpty,
      s"mh* columns not contiguous from mh0: missing ${missing.mkString(",")} " +
        s"in ${signatures.columns.filter(_.matches("mh\\d+")).mkString(",")}")
    require(width % rowsPerBand == 0, s"width=$width not divisible by r=$rowsPerBand")
    require(rowsPerBand <= 2, s"base-P band key packing overflows BIGINT for r > 2 (r=$rowsPerBand)")
    val numBands = width / rowsPerBand
    signatures.select(
      col("doc_id"),
      explode(array((0 until numBands).map { bnd =>
        val key = (0 until rowsPerBand)
          .map(r => col(s"mh${bnd * rowsPerBand + r}"))
          .reduce((acc, mh) => acc * P + mh)
        struct(lit(bnd).as("band"), key.as("key"))
      }: _*)).as("b"),
    ).select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** Turn band rows into distinct candidate pairs: count each bucket's
    * cardinality with a window on the same (band, key) partitioning and
    * drop degenerate buckets BEFORE any array is built — the window
    * buffers plain band rows in a spill-backed array, so a corpus-wide
    * hot key spills to disk instead of materializing an unbounded
    * collect_list aggregation buffer on one reducer; the surviving
    * buckets' collect_list then holds at most `maxBucket` ids. The
    * window's sort reuses the shuffle, so this is still ONE exchange on
    * (band, key). Pair expansion: gather each bucket's ids into one
    * sorted array (a doc appears at most once per bucket) and explode
    * the in-bucket pairs — `slice(ids, i+2, n)` enumerates each
    * element's strictly-later partners without a lambda HOF, so the pair
    * generator stays codegen-friendly. The band-table SELF-JOIN this
    * replaces shuffled the n*numHashes rows twice and materialized a
    * join build side for the same output (measured 3.6s -> faster at
    * sf0.1).
    */
  private def pairsFromBands(bands: DataFrame, maxBucket: Int): DataFrame =
    pairBandRows(
      bands.withColumn("bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .where(col("bn").between(2, maxBucket)))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))

  /** In-bucket pair expansion carrying (band, key) provenance: each
    * surviving bucket's ids gather into one sorted array and
    * `slice(ids, i+2, n)` enumerates strictly-later partners without a
    * lambda HOF (codegen-friendly). Provenance is what makes the pair
    * table incrementally maintainable — [[incrementalPairs]] replaces
    * exactly the buckets a delta touched and reuses the rest verbatim.
    * Input must already be bucket-filtered (2 <= bucket size <= cap).
    */
  private def pairBandRows(cappedBands: DataFrame): DataFrame =
    cappedBands
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("band"), col("key"), posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
      .select(col("band"), col("key"), col("doc_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))

  /** [[pairBandRows]] for maintainers ([[LshIndexStore.retract]]) whose
    * input is already bucket-filtered to pairable sizes.
    */
  def pairBandRowsOf(cappedBands: DataFrame): DataFrame = pairBandRows(cappedBands)

  /** Per-bucket cardinalities of a band-row table — with [[bandRows]]
    * and [[indexPairBands]] one of the three state tables a PERSISTED
    * LSH index keeps (counts are what make the degenerate-bucket cap
    * incrementally decidable: merged count = base + delta, no rescan).
    */
  def bucketCounts(bands: DataFrame): DataFrame =
    bands.groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))

  /** The persisted pair table WITH (band, key) provenance for an index
    * built from `bands` (under-cap buckets only — over-cap buckets
    * contribute nothing and are represented solely by their count row).
    */
  def indexPairBands(bands: DataFrame, maxBucket: Int = defaultMaxBucket): DataFrame =
    pairBandRows(
      bands.withColumn("bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .where(col("bn").between(2, maxBucket)))

  /** INCREMENTAL maintenance of a persisted LSH index: admit a delta
    * batch and produce the full updated candidate set WITHOUT
    * recomputing the base corpus — `(doc_a, doc_b, n_shared_bands)`
    * identical to a ground-up rebuild over base + delta (proven in
    * DedupSpec, and q167's oracle IS the full-rebuild SQL).
    *
    * The sharp edge is that the degenerate-bucket cap makes candidate
    * generation NON-MONOTONE: delta rows landing in a bucket can push
    * its total over `maxBucket`, which RETRACTS every base-base pair
    * that bucket contributed. Monotone band-row union alone is wrong.
    * The plan therefore touches three bucket classes, each bounded:
    *
    *   - UNTOUCHED (no delta row): pair contributions reused verbatim
    *     from the persisted provenance table — zero recompute;
    *   - TOUCHED, still under cap: recomputed from base + delta rows of
    *     exactly those (band, key) buckets — a semi-join fetch that a
    *     (band, key)-bucketed state layout prunes to the touched
    *     buckets, never a base scan;
    *   - TOUCHED, now over cap: dropped entirely (the retraction).
    *
    * Work is O(delta + rows in touched buckets + existing pair table);
    * at 100 TB that is the difference between a per-batch admit and
    * re-paying the corpus-wide band shuffle every batch.
    */
  def incrementalPairs(
      baseBands: DataFrame,
      baseCounts: DataFrame,
      basePairBands: DataFrame,
      deltaBands: DataFrame,
      maxBucket: Int = defaultMaxBucket): DataFrame =
    incrementalPairBands(baseBands, baseCounts, basePairBands, deltaBands, maxBucket)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))

  /** The updated pair table WITH provenance after a delta admit — what
    * [[LshIndexStore]] persists as the next generation's state (and
    * [[incrementalPairs]] aggregates for consumers).
    */
  def incrementalPairBands(
      baseBands: DataFrame,
      baseCounts: DataFrame,
      basePairBands: DataFrame,
      deltaBands: DataFrame,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    val (touched, recomputed) =
      touchedPairDelta(baseBands, baseCounts, deltaBands, maxBucket)
    basePairBands
      .join(touched, Seq("band", "key"), "left_anti")
      .unionByName(recomputed)
  }

  /** The SEGMENT form of [[incrementalPairBands]]: the delta's touched
    * (band, key) set and the recomputed pair rows of exactly those
    * buckets that remain pairable after the admit. The updated pair
    * table is (base minus touched) union recompute — but a maintainer
    * that persists (touched, recompute) as a segment NEVER has to read
    * or rewrite the base pair table at all: readers resolve
    * last-touch-wins per bucket ([[LshIndexStore]]'s chain read), which
    * is what makes an admit O(delta + touched buckets) while the
    * candidate mass grows without bound.
    */
  def touchedPairDelta(
      baseBands: DataFrame,
      baseCounts: DataFrame,
      deltaBands: DataFrame,
      maxBucket: Int = defaultMaxBucket): (DataFrame, DataFrame) = {
    val dc = deltaBands.groupBy(col("band"), col("key")).agg(count(lit(1)).as("dn"))
      .localCheckpoint() // bounded by |delta| x bands; feeds three joins
    val keep = dc.join(baseCounts, Seq("band", "key"), "left")
      .na.fill(0L, Seq("n"))
      .where((col("n") + col("dn")).between(2, maxBucket))
      .select(col("band"), col("key"))
    val touchedRows = baseBands.join(keep, Seq("band", "key"), "left_semi")
      .unionByName(deltaBands.join(keep, Seq("band", "key"), "left_semi"))
    // dc's checkpoint blocks stay live until the caller's action runs
    // (a few rows per touched bucket — freed with the session).
    (dc.select(col("band"), col("key")), pairBandRows(touchedRows))
  }


  /** Asymmetric LSH candidates for INCREMENTAL ingest: pair each incoming
    * document with the existing-corpus documents sharing >= 1 band — the
    * production shape for admitting a new batch into an already-deduped
    * 100 TB corpus, where re-running the full self-join (q25) per batch
    * would re-pay the whole corpus. Cost is one shuffle of each side on
    * (band, key); the existing side's degenerate buckets are capped with
    * the same spill-backed windowed pre-count as [[lshCandidates]].
    */
  def lshCandidatesAgainst(
      incoming: DataFrame,
      existing: DataFrame,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    val in = bandRows(incoming, 1)
      .select(col("doc_id").as("doc_new"), col("band"), col("key"))
    val ex = bandRows(existing, 1)
      .withColumn("bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .where(col("bn") <= maxBucket)
      .select(col("doc_id").as("doc_old"), col("band"), col("key"))
    in.join(ex, Seq("band", "key"))
      .groupBy(col("doc_new"), col("doc_old"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Connected-component canonicalization by min-label propagation
    * (Pregel-style): every doc starts labeled with itself; each round,
    * a doc adopts the minimum label among itself and its neighbors in
    * the near-duplicate pair graph; at the fixpoint every member of a
    * connected component carries the component's minimum doc_id — the
    * TRANSITIVE closure the 1-hop canonicalization (q43) approximates.
    * Rounds needed = component diameter (near-dup clusters are shallow).
    * Each iteration is ONE join (labels onto edges), unioned with the
    * self-labels and min-aggregated — no second join for the old-vs-new
    * comparison: labels only ever decrease, so the exact decimal label
    * SUM is strictly decreasing until fixpoint and a narrow aggregate
    * over the new table detects convergence. Labels are checkpointed per
    * round (truncating the iterative lineage) and the superseded round's
    * blocks are freed immediately, keeping executor storage flat; the
    * only driver-side values are the per-round sums.
    */
  def canonicalLabels(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.DatasetBridge
    var labels = docs.select(col("doc_id"), col("doc_id").as("label")).localCheckpoint()
    // Restrict edges to endpoints that exist in `docs` (the union-based
    // iteration would otherwise materialize a phantom label row for any
    // pair endpoint outside the doc set).
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("nbr"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("nbr")))
      .join(labels.select(col("doc_id").as("u")), Seq("u"), "left_semi")
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // sum over zero rows is null -> ZERO, so an empty doc set converges
      // on the first round instead of NPE'ing in the comparison.
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = labels
        .union(edges
          .join(labels.select(col("doc_id").as("nbr"), col("label")), "nbr")
          .select(col("u").as("doc_id"), col("label")))
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // Dataset.unpersist() would only clear cache-manager state; the
      // checkpoint blocks live on the underlying RDD.
      DatasetBridge.unpersistCheckpoint(labels)
      labels = next
      i += 1
    }
    DatasetBridge.unpersistCheckpoint(edges)
    labels
  }

  /** Hamming near-dup candidates over a (doc_id, simhash) table by
    * pigeonhole banding: the signature splits into `numBands` contiguous
    * bit bands, and any pair within Hamming distance `numBands - 1` must
    * agree exactly on at least one band — so candidate generation is a
    * band EQUI-join (one shuffle on (band, key)), never an all-pairs
    * distance scan. Same spill-backed windowed bucket cap and
    * lambda-free pair expansion as the MinHash path. Scale note: the
    * band key space is 2^(bits/numBands) — at corpus scale the signature
    * (and with it each band) must widen so buckets stay sub-quadratic;
    * the cap is the backstop, not the plan.
    */
  def hammingCandidates(
      simhashes: DataFrame,
      bits: Int = simhashBits,
      numBands: Int = 4,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    require(bits % numBands == 0, s"bits=$bits not divisible by numBands=$numBands")
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val bands = simhashes.select(
      col("doc_id"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    pairsFromBands(bands, maxBucket)
  }

  /** SimHash over occurrence-weighted token hashes ([[simhashBits]] wide
    * by default). `bits` is the scale knob the band-width curve in
    * DedupSpec measures: each of [[hammingCandidates]]'s band keys spans
    * bits/numBands bits, so widening the signature grows the key space
    * (2^(bits/numBands)) and shrinks band buckets — the lever that keeps
    * candidate generation sub-quadratic as the corpus grows. bits = 64
    * is exact: each summand below is a distinct power of two, so the
    * wrap-around on bit 63 lands exactly on the sign bit (the bit
    * pattern stays injective; the arithmetic-shift band extraction masks
    * the sign extension off).
    */
  /** EXACT set-similarity self-join by prefix filtering (the AllPairs /
    * PPJoin candidate scheme, Bayardo et al. WWW'07 / Xiao et al.
    * WWW'08) — the exact counterpart of the MinHash+LSH pipeline:
    * guaranteed NO false negatives, candidates still generated by an
    * equi-join instead of an all-pairs scan.
    *
    * Principle: order every set's elements by one GLOBAL total order
    * (ascending document frequency, ties by value — rarest first). If
    * J(A,B) >= tau then |A n B| >= ceil(tau * max(|A|,|B|)), and two
    * sets sharing >= alpha elements must collide within their first
    * (n - alpha + 1) elements under any common total order — so probing
    * only each set's (n - ceil(tau*n) + 1)-prefix finds every qualifying
    * pair. Rare-first ordering makes prefix tokens the LOW-df ones,
    * which is what bounds the candidate join's bucket sizes: a
    * corpus-wide stopword element lands in the (never-probed) suffix of
    * every large set.
    *
    * Cost shape: one df-count aggregation, one per-set sort (bounded by
    * set size), one equi-join on prefix elements (each bucket = the
    * element's PREFIX df, <= its df), one exact verify join over
    * candidates. The length filter (tau*|B| <= 1000*|A|, symmetric) is
    * applied inside the candidate join, pruning cross-size pairs before
    * the verify pays for them. All thresholds in exact integer milli —
    * no float boundary.
    *
    * Returns qualifying pairs (doc_a < doc_b) with exact overlap stats.
    * `sets` must hold one row per id with a DISTINCT-element array.
    */
  def prefixFilterPairs(sets: DataFrame, idCol: String, setCol: String,
      tauMilli: Int): DataFrame = {
    val base = sets.select(col(idCol).as("doc_id"), col(setCol).as("els"),
      size(col(setCol)).cast("long").as("n"))
    val verified = prefixCandidates(sets, idCol, setCol, tauMilli)
      .join(base.select(col("doc_id").as("doc_a"), col("els").as("els_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("els").as("els_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("els_a"), col("els_b"))).cast("long").as("n_common"),
        size(col("els_a")).cast("long").as("n_a"),
        size(col("els_b")).cast("long").as("n_b"))
    // J >= tau  <=>  (1000 + tau) * inter >= tau * (n_a + n_b), exactly.
    verified.where(col("n_common") * (1000 + tauMilli)
      >= (col("n_a") + col("n_b")) * tauMilli)
  }

  /** The candidate stage of [[prefixFilterPairs]], exposed so the
    * pruning factor (candidates vs the n*(n-1)/2 all-pairs space) is
    * measurable in spec. Returns DISTINCT (doc_a < doc_b) pairs that
    * collide on a prefix element and pass the length filter — a
    * guaranteed superset of the qualifying pairs.
    */
  def prefixCandidates(sets: DataFrame, idCol: String, setCol: String,
      tauMilli: Int): DataFrame = {
    require(tauMilli >= 1 && tauMilli <= 1000, s"tauMilli must be 1..1000, got $tauMilli")
    val ex = sets.select(col(idCol).as("doc_id"),
      size(col(setCol)).cast("long").as("n"), explode(col(setCol)).as("el"))
    val dfreq = ex.groupBy(col("el")).agg(count(lit(1)).as("df"))
    // Re-assemble each set sorted by (df, el): array_sort on an array of
    // structs orders field-lexicographically, so one bounded per-set sort
    // realizes the global rare-first order with no window over the corpus.
    val ordered = ex.join(dfreq, "el")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n"),
        array_sort(collect_list(struct(col("df"), col("el")))).as("ord"))
    // prefix length = n - ceil(tau*n) + 1 (integer ceil via (x+999)/1000)
    val plen = (col("n") - floor((col("n") * tauMilli + 999) / 1000) + 1).cast("int")
    // Positional filter (round 18, guide §2.3/§3 — the PPJoin tightening
    // of the basic prefix filter): carry each prefix element's POSITION
    // in the rare-first order; `rem = n - pos` is the element count from
    // it to the set's end (itself included). For a pair's FIRST common
    // element, every common element sits at-or-after it in BOTH sorted
    // sets (a common element ranked earlier would itself be an earlier
    // first), so overlap <= least(rem_a, rem_b) — collisions whose bound
    // cannot reach the threshold are dropped BEFORE the distinct and the
    // array_intersect verify. Exact: a qualifying pair always survives
    // via its first collision (bound >= true overlap >= threshold);
    // DedupSpec's brute-force equality covers this on the real corpus.
    val prefix = ordered
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("ord"), lit(1), plen)).as(Seq("i", "p")))
      .select(col("doc_id"), col("n"),
        (col("n") - col("i")).as("rem"), col("p.el").as("el"))
    prefix.select(col("doc_id").as("doc_a"), col("n").as("n_a"),
        col("rem").as("rem_a"), col("el"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("n").as("n_b"),
        col("rem").as("rem_b"), col("el")), Seq("el"))
      .where(col("doc_a") < col("doc_b")
        && col("n_a") * tauMilli <= col("n_b") * 1000
        && col("n_b") * tauMilli <= col("n_a") * 1000
        // overlap bound vs J >= tau  <=>  (1000+tau)*inter >= tau*(n_a+n_b)
        && least(col("rem_a"), col("rem_b")) * (1000 + tauMilli)
          >= (col("n_a") + col("n_b")) * tauMilli)
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = simhashBits): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash width must be 1..64, got $bits")
    val words = docs.select(
      col(idCol).as("doc_id"),
      explode(text.normalizedTokens(col(textCol))).as("word"))
    val h = words.select(col("doc_id"), col("word"),
      textstats.rollingHash(col("word")).as("h"))
    // Bits beyond the oracled 16-wide default draw from per-bit SEEDED
    // re-hashes of the token: the base hash is mod 1e9+7, so its bits
    // 30+ are constant and its TOP in-range bits (16..29) are the weak
    // bits of a mod-P value — bands built from either collapse into few
    // buckets and a "wider" signature silently gets WORSE (measured in
    // DedupSpec's width curve, not hypothetical). The seed goes in FRONT
    // of the token (a suffix seed only perturbs the last fold step, so
    // seeds of equal parity produce identical hash parities) and the
    // extracted bit is a middle one (bit 0 is the polynomial's parity,
    // which a +-1 seed change simply flips globally). The oracled
    // default ([[simhashBits]] = 16) uses base-hash bits only, unchanged.
    val sums = (0 until bits).map { j =>
      val bit =
        if (j < 16) shiftright(col("h"), j).bitwiseAND(lit(1L))
        else shiftright(
          textstats.rollingHash(concat(lit(s"$j#"), col("word"))), 15).bitwiseAND(lit(1L))
      sum(when(bit === 1L, 1L).otherwise(-1L)).as(s"s$j")
    }
    h.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(
        col("doc_id"),
        (0 until bits)
          .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"),
      )
  }
}
