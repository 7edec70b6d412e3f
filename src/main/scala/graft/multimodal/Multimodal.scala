package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads are opaque BINARY columns with typed metadata travelling
  * alongside; decode/feature-extraction runs batched per partition.
  *
  * The DECODE STEP IS A STUB — image/audio codecs are not in this
  * container, so `decodeStub` computes deterministic fake features
  * (dimensions derived from payload length, a leading-bytes checksum).
  * Everything around it is the real Spark plumbing and is what the tests
  * cover: binary schema, batched mapPartitions shape (mirroring
  * mapInPandas batch semantics), partition-parallel execution, and typed
  * output.
  */
object Multimodal {

  /** One media row: opaque bytes + metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features (deterministic fake — see decodeStub). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      checksum64: Long,
  )

  /** How many rows each decode call sees (the batch shape a real codec /
    * model-inference UDF would want — analogous to
    * spark.sql.execution.arrow.maxRecordsPerBatch for mapInPandas).
    */
  val decodeBatchSize = 64

  /** STUB decode: a real implementation would hand `batch` to an image
    * library here (and this signature — a batch of byte payloads in, a
    * batch of feature rows out — is exactly what that needs). The fake is
    * deterministic so the DuckDB oracle can replicate it.
    */
  def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val n = r.payload.length.toLong
      val checksum = r.payload.take(64).foldLeft(0L)((acc, b) => acc + (b & 0xff))
      MediaFeatures(r.media_id, r.kind, n, n % 640, (n * 7) % 480, checksum)
    }

  /** documents -> media rows: the text bytes stand in for image payloads
    * (deterministic fake corpus; real pipelines read binary files or
    * parquet BINARY columns the same way).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
    ).as[MediaRecord]
  }

  /** Partition-parallel batched decode: no shuffle, no driver round-trip;
    * each partition iterates in decodeBatchSize chunks.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** Resized media row (deterministic fake — see resizeStub). */
  case class ResizedMedia(
      media_id: Long,
      orig_bytes: Long,
      new_bytes: Long,
      resized: Array[Byte],
  )

  /** STUB resize: a real implementation would decode, nearest-neighbor
    * downsample, and re-encode here; the deterministic stand-in keeps
    * every `factor`-th payload byte (so the oracle can replicate it as
    * every factor-th character of the ASCII corpus). Same batched
    * signature as decodeStub — the shape a codec library wants.
    */
  def resizeStub(batch: Seq[MediaRecord], factor: Int): Seq[ResizedMedia] = {
    require(factor > 0, s"resize factor must be positive, got $factor")
    batch.map { r =>
      val len = r.payload.length
      val out = new Array[Byte]((len + factor - 1) / factor)
      var i = 0
      var j = 0
      while (j < len) { out(i) = r.payload(j); i += 1; j += factor }
      ResizedMedia(r.media_id, len.toLong, out.length.toLong, out)
    }
  }

  /** Partition-parallel batched resize — no shuffle, like extractFeatures. */
  def resize(media: Dataset[MediaRecord], factor: Int = 3): Dataset[ResizedMedia] = {
    require(factor > 0, s"resize factor must be positive, got $factor") // fail at call time, not per task
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(batch => resizeStub(batch, factor))
    }
  }

  /** Frame sampling for chunked payloads ("video"): split the payload into
    * fixed-size chunks and keep every k-th — pure Spark-side byte
    * plumbing (substring on binary), no UDF. Guarded: a zero-byte payload
    * yields an empty frame list (unguarded, `sequence(0, -1)` infers step
    * -1 and produces phantom chunks).
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int = 32, every: Int = 4): DataFrame =
    media.select(
      col("media_id"),
      when(octet_length(col("payload")) === 0, array().cast("array<binary>"))
        .otherwise(filter(
          transform(
            sequence(lit(0), floor((octet_length(col("payload")) - 1) / chunkBytes).cast("int")),
            i => col("payload").substr(i * chunkBytes + 1, lit(chunkBytes))),
          (_, i) => i % every === 0,
        )).as("frames"),
    ).withColumn("n_frames", size(col("frames")).cast("long"))
}
