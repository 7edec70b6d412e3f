package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The multimodal plumbing around the stubbed decode: schema, batched
  * partition-parallel execution (no shuffle), deterministic features,
  * frame sampling byte math.
  */
class MultimodalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  test("corpus text is pure ASCII (chars == UTF-8 bytes) — q49/q70 oracle equivalence depends on it") {
    import org.apache.spark.sql.functions._
    // The q70 (and q49) oracles slice CHARACTERS while the engine slices
    // payload BYTES; DuckDB cannot slice BLOBs, so the char/byte
    // equivalence is load-bearing. Pin it corpus-wide: any future
    // multibyte document must fail HERE, not silently diverge there.
    val nonAscii = Tables.documents(spark, sf0001)
      .where(length(col("text")) =!= length(col("text").cast("binary")))
      .count()
    assert(nonAscii == 0, s"$nonAscii documents contain multibyte characters")
  }

  test("extractFeatures: one feature row per media row, deterministic values") {
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(docs, col("media_id") === col("doc_id"))
    assert(feats.count() == docs.count())
    // ASCII corpus: payload bytes == chars; width/height derive from length.
    assert(joined.where(col("n_bytes") =!= col("n_chars")).count() == 0)
    assert(joined.where(col("width") =!= col("n_bytes") % 640).count() == 0)
    assert(joined.where(col("height") =!= (col("n_bytes") * 7) % 480).count() == 0)
    assert(feats.where(col("checksum64") <= 0).count() == 0)
  }

  test("extractFeatures plan has no shuffle (pure partition-parallel map)") {
    val plan = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("sampleFrames keeps every k-th chunk") {
    val media = Multimodal.fromDocuments(docs).toDF()
    val sampled = Multimodal.sampleFrames(media, chunkBytes = 32, every = 4)
    val row = sampled.join(docs, col("media_id") === col("doc_id"))
      .select(col("n_frames"), col("n_chars")).head()
    val totalChunks = (row.getLong(1) + 31) / 32
    val expected = (totalChunks + 3) / 4
    assert(row.getLong(0) == expected,
      s"n_frames ${row.getLong(0)} != expected $expected for ${row.getLong(1)} bytes")
  }
}
