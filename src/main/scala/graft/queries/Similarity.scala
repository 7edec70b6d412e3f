package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vectors

/** Similarity search over `embeddings` (ArrayType(FloatType), 64-dim):
  * embedding-cosine near-dup pairs, brute-force ANN top-k (the exactness
  * baseline), and the LSH-bucketed scale path.
  *
  * Scale notes: brute-force is O(n*q) — correct as the small-q baseline
  * or re-rank stage; the production path is the random-hyperplane LSH
  * bucketing (q30): signature is a per-row map, bucketing is one shuffle
  * on the signature, and candidate generation joins within buckets only.
  */
object Similarity {

  /** Deterministic pseudo-random integer hyperplanes (engine-portable:
    * same literals appear in the SQL oracle).
    */
  val dims = 64
  val numPlanes = 8
  val planes: Seq[Seq[Int]] =
    (0 until numPlanes).map(j => (0 until dims).map(k => ((j * 131 + k * 37) % 17) - 8))

  val neardupThreshold = 0.3

  /** DuckDB replicas of the double-precision sequential folds in
    * [[graft.functions.vectors]] (bit-identical op order).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), " +
      s"(x, y) -> x + y)"

  private def ssSql(a: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y)"

  def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${ssSql(a)}) * sqrt(${ssSql(b)})))"

  /** DuckDB replica of vectors.lshSignature over `v`. */
  def sigSql(v: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      val lits = p.mkString("[", ", ", "]")
      s"CASE WHEN ${dotSql(v, lits)} > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** All-pairs embedding-cosine near-duplicates above the threshold.
    * Norms are hoisted (computed once per vector, not once per pair) and
    * the streamed side is repartitioned so the nested-loop pair
    * generation parallelizes across all cores; cos = dot/(norm_a*norm_b)
    * is the same double arithmetic as the inline formula.
    */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), vectors.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
      .repartition(col("vec_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("c"))
      .where(col("c") >= neardupThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 6).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Brute-force cosine top-k: 5 query vectors against the full corpus.
    * Per-group top-k via ranking window with full tie-break.
    */
  private def q29(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), vectors.norm(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("nq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("nrm").as("nn"))
      .repartition(col("neighbor_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("c").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vectors.dot(col("qe"), col("ne")) / (col("nq") * col("nn"))).as("c"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("c"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH bucket inventory: random-hyperplane signature per vector, bucket
    * stats (the candidate-generation structure for ANN at scale).
    */
  private def q30(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), vectors.lshSignature(col("embedding"), planes).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("sig"))

  /** The full scalable near-dup pipeline: LSH signature -> bucket
    * equi-join (candidates only, one shuffle on the signature) -> exact
    * cosine verification. Contrast with q28's all-pairs baseline: same
    * verification math, O(collisions) instead of O(n^2) candidates.
    */
  private def q36(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(
        col("vec_id"), col("embedding"),
        vectors.lshSignature(col("embedding"), planes).as("sig"),
        vectors.norm(col("embedding")).as("nrm"))
      .localCheckpoint() // feeds both sides of the bucket self-join
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("sig").as("sig_a"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("sig").as("sig_b"), col("nrm").as("nb"))
    a.join(b, col("sig_a") === col("sig_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("sig_a").as("sig"),
        (vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("c"))
      .where(col("c") >= neardupThreshold)
      .select(col("vec_a"), col("vec_b"), col("sig"), round(col("c"), 6).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** IVF coarse quantization: assign every vector to its nearest of 16
    * "centroids" (deterministically: the first 16 vectors — a real IVF
    * would Lloyd-iterate, which only moves the centroid table, not the
    * assignment shape). The centroid table broadcasts; assignment is one
    * pass over the corpus; probing then searches only the query's cluster
    * — the third ANN regime next to brute force (q29) and LSH (q30/q36).
    */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), vectors.norm(col("embedding")).as("nrm"))
    val cents = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    e.join(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (vectors.dot(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("cluster"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q28_embedding_neardup", q28, Some(
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${cosSql("a.embedding", "b.embedding")} AS c
         |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(c, 6) AS cos FROM p
         |WHERE c >= $neardupThreshold ORDER BY vec_a, vec_b""".stripMargin)),
    QueryDef("q29_ann_bruteforce", q29, Some(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |        ${cosSql("q.qe", "e.embedding")} AS c
         |      FROM q JOIN embeddings e ON q.query_id <> e.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
         |      FROM c)
         |SELECT query_id, neighbor_id, rank, round(c, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    QueryDef("q30_ann_lsh_buckets", q30, Some(
      s"""WITH s AS (SELECT vec_id, CAST(${sigSql("embedding")} AS BIGINT) AS sig FROM embeddings)
         |SELECT sig, count(*) AS n_vecs, min(vec_id) AS min_vec
         |FROM s GROUP BY sig ORDER BY sig""".stripMargin)),
    QueryDef("q36_lsh_neardup", q36, Some(
      s"""WITH s AS (SELECT vec_id, embedding, CAST(${sigSql("embedding")} AS BIGINT) AS sig,
         |             sqrt(${ssSql("embedding")}) AS nrm FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.sig,
         |        ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS c
         |      FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, sig, round(c, 6) AS cos FROM p
         |WHERE c >= $neardupThreshold ORDER BY vec_a, vec_b""".stripMargin)),
    QueryDef("q37_ivf_assign", q37, Some(
      s"""WITH e AS (SELECT vec_id, embedding, sqrt(${ssSql("embedding")}) AS nrm FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM e WHERE vec_id < 16),
         |a AS (SELECT e.vec_id, c.cid,
         |        ${dotSql("e.embedding", "c.ce")} / (e.nrm * c.cn) AS cos
         |      FROM e CROSS JOIN c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
         |      FROM a)
         |SELECT cid AS cluster, count(*) AS n_vecs, min(vec_id) AS min_vec
         |FROM r WHERE rn = 1 GROUP BY cluster ORDER BY cluster""".stripMargin)),
  )
}
