package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** MinHash permutation parameters h_i(x) = (A(i)*x + B(i)) mod P. */
  val A: Seq[Long] = Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L)
  val B: Seq[Long] = Seq(1L, 7L, 13L, 19L, 25L, 31L, 37L, 43L)
  val numHashes: Int = A.size

  val shingleSize = 3
  val simhashBits = 16

  /** Space-joined normalized text (the canonical content for hashing). */
  def normalizedText(textCol: Column): Column =
    concat_ws(" ", text.normalizedTokens(textCol))

  /** word-`shingleSize`-gram strings of the normalized token array. */
  def shingles(tokens: Column): Column =
    transform(
      sequence(lit(1), size(tokens) - (shingleSize - 1)),
      i => concat_ws(" ", slice(tokens, i, lit(shingleSize))),
    )

  /** MinHash signature columns mh0..mh{k-1} over the shingle set. */
  def minhashCols(shingleCol: Column): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(shingleCol, s =>
        (lit(A(i)) * textstats.rollingHash(s) + lit(B(i))) % P)).as(s"mh$i")
    }

  /** doc_id + minhash signature for every document with >= shingleSize
    * tokens. One narrow map stage — no shuffle.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = text.normalizedTokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= shingleSize)
      .select(Seq(col("doc_id")) ++ minhashCols(shingles(col("toks"))): _*)
  }

  /** LSH candidate pairs: docs sharing >= 1 of the `numHashes` single-row
    * bands (r=1, b=numHashes — tuned for low-jaccard corpora; banding
    * params are the knob for precision/recall at scale). The band join
    * shuffles on (band, key): candidate generation is O(collisions), not
    * O(n^2).
    */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val bands = signatures.select(
      col("doc_id"),
      explode(array((0 until numHashes).map(i =>
        struct(lit(i).as("band"), col(s"mh$i").as("key"))): _*)).as("b"),
    ).select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 16-bit SimHash over occurrence-weighted token hashes. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(
      col(idCol).as("doc_id"),
      explode(text.normalizedTokens(col(textCol))).as("word"))
    val h = words.select(col("doc_id"), textstats.rollingHash(col("word")).as("h"))
    val sums = (0 until simhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"s$j")
    }
    h.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(
        col("doc_id"),
        (0 until simhashBits)
          .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"),
      )
  }
}
