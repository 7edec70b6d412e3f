package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads are opaque BINARY columns with typed metadata travelling
  * alongside; decode/feature-extraction runs batched per partition.
  *
  * Two tiers of kernel honesty here:
  *   - `decodeStub` / `resizeStub` (q31/q70) are STUBS — general
  *     image/audio codecs are not in this container, so they compute
  *     deterministic fakes; the Spark plumbing around them (binary
  *     schema, batched mapPartitions shape mirroring mapInPandas batch
  *     semantics, partition-parallel execution, typed output) is real
  *     and tested.
  *   - [[decodePpmAHash]] (q153) is NOT a stub: [[buildPpm]] emits
  *     genuine binary P6 PPM images and the kernel really parses the
  *     header and computes the standard 64-bit average-hash over the
  *     decoded RGB pixels, dependency-free.
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

  /** Fixture image dimensions for [[buildPpm]] (multiples of 8, see
    * [[decodePpmAHash]]).
    */
  val ppmW = 16
  val ppmH = 16

  /** Deterministic RGB for pixel `i` (row-major) of doc `docId` — the
    * formula is what makes the fixture SQL-replicable; the decoder
    * below never sees it.
    */
  private def ppmPixel(docId: Long, i: Long): (Int, Int, Int) = (
    ((docId * 1009 + i * 2003) % 256).toInt,
    ((docId * 733 + i * 877) % 256).toInt,
    ((docId * 389 + i * 1543) % 256).toInt)

  /** A genuine binary P6 PPM: ASCII header (`P6\n<w> <h>\n255\n`) +
    * raw RGB24 pixel bytes. Any PPM viewer opens these.
    */
  def buildPpm(docId: Long): Array[Byte] = {
    val header = s"P6\n$ppmW $ppmH\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + ppmW * ppmH * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < ppmW * ppmH) {
      val (r, g, b) = ppmPixel(docId, i.toLong)
      out(header.length + 3 * i) = r.toByte
      out(header.length + 3 * i + 1) = g.toByte
      out(header.length + 3 * i + 2) = b.toByte
      i += 1
    }
    out
  }

  /** documents -> real image rows: one P6 PPM payload per doc. */
  def ppmMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, "image/ppm", buildPpm(id)))
  }

  /** Average-hash of one decoded image, split into two uint32 halves so
    * both engines stay inside signed BIGINT.
    */
  case class ImageHash(
      media_id: Long,
      width: Long,
      height: Long,
      gray_total: Long,
      ahash_lo: Long,
      ahash_hi: Long,
  )

  /** The REAL (if tiny) codec kernel — this one is NOT a stub: parses
    * the P6 header (magic, width, height, maxval, any header
    * whitespace), checks the payload length against the decoded
    * dimensions, converts RGB24 to integer grayscale, downsamples to
    * 8x8 by block sums, and emits the standard 64-bit average-hash
    * (bit b = 1 iff block b's mean gray exceeds the global mean).
    * Division-free integer math throughout — `blockSum * (w*h) >
    * total * (bw*bh)` compares the means exactly — so a SQL oracle
    * can replicate the hash bit-for-bit. Works on any P6 image with
    * multiple-of-8 dimensions and maxval 255, not just the fixtures.
    */
  def decodePpmAHash(batch: Seq[MediaRecord]): Seq[ImageHash] = batch.map { rec =>
    val (img, next) = parsePpmFrame(rec.media_id, rec.payload, 0)
    require(next == rec.payload.length,
      s"media ${rec.media_id}: ${rec.payload.length - next} trailing bytes after image")
    img
  }

  /** Parse ONE P6 image starting at `start` and return its hash plus the
    * offset just past its pixel data — the unit both [[decodePpmAHash]]
    * (exactly one image) and [[decodeVideoFrameHashes]] (frames
    * concatenated in a raw stream) are built from.
    */
  private def parsePpmFrame(
      mediaId: Long, bytes: Array[Byte], start: Int): (ImageHash, Int) = {
    var pos = start
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val s0 = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      new String(bytes, s0, pos - s0,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"media $mediaId: not binary PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"media $mediaId: unsupported maxval $maxv")
    require(w % 8 == 0 && h % 8 == 0,
      s"media $mediaId: aHash needs multiple-of-8 dims, got ${w}x$h")
    pos += 1 // exactly one whitespace byte separates maxval from pixel data
    require(bytes.length - pos >= w * h * 3,
      s"media $mediaId: ${bytes.length - pos} pixel bytes for ${w}x$h")
    val bw = w / 8
    val bh = h / 8
    val blockSum = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < w * h) {
      val r = bytes(pos + 3 * i) & 0xff
      val g = bytes(pos + 3 * i + 1) & 0xff
      val b = bytes(pos + 3 * i + 2) & 0xff
      val gray = (r + g + b) / 3
      blockSum(((i / w) / bh) * 8 + ((i % w) / bw)) += gray
      total += gray
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var blk = 0
    while (blk < 64) {
      val bit = if (blockSum(blk) * (w.toLong * h) > total * (bw.toLong * bh)) 1L else 0L
      if (blk < 32) lo |= bit << blk else hi |= bit << (blk - 32)
      blk += 1
    }
    (ImageHash(mediaId, w.toLong, h.toLong, total, lo, hi), pos + w * h * 3)
  }

  /** Frames per fixture video and frames per scene (consecutive
    * identical frames — the static-shot shape real frame dedup exploits).
    */
  val videoFrames = 9
  val videoSceneLen = 3

  /** A raw "video": [[videoFrames]] complete P6 images concatenated
    * back-to-back (the PPM analog of raw YUV streams — each frame is
    * individually parseable, there is no container). Scene `f / 3`'s
    * pixels are generated from seed `docId * 8 + scene`, so each scene's
    * 3 frames are byte-identical.
    */
  def buildPpmVideo(docId: Long): Array[Byte] = {
    val frames = (0 until videoFrames)
      .map(f => buildPpm(docId * 8 + f / videoSceneLen))
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { fr =>
      System.arraycopy(fr, 0, out, off, fr.length)
      off += fr.length
    }
    out
  }

  /** Per-frame hash row of a decoded video stream. */
  case class VideoFrameHash(
      media_id: Long,
      frame_idx: Long,
      ahash_lo: Long,
      ahash_hi: Long,
  )

  /** Decode a raw concatenated-PPM stream frame by frame with the REAL
    * parser — each frame's header is re-parsed (dimensions may vary
    * mid-stream), every pixel is decoded, and each frame gets its own
    * average-hash. The per-frame hash stream is what video dedup /
    * scene-cut detection consume.
    */
  def decodeVideoFrameHashes(batch: Seq[MediaRecord]): Seq[VideoFrameHash] =
    batch.flatMap { rec =>
      val out = Seq.newBuilder[VideoFrameHash]
      var pos = 0
      var idx = 0L
      while (pos < rec.payload.length) {
        val (img, next) = parsePpmFrame(rec.media_id, rec.payload, pos)
        out += VideoFrameHash(rec.media_id, idx, img.ahash_lo, img.ahash_hi)
        pos = next
        idx += 1
      }
      out.result()
    }

  /** Partition-parallel batched video decode — same shape as
    * imageHashes; one input row fans out to one row per frame.
    */
  def videoFrameHashes(media: Dataset[MediaRecord]): Dataset[VideoFrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeVideoFrameHashes))
  }

  /** Partition-parallel batched decode+hash — same shape as
    * extractFeatures, real kernel inside.
    */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodePpmAHash))
  }

  /** Fixture audio parameters for [[buildWav]]. */
  val wavSampleRate = 8000
  val wavNumSamples = 256

  /** Deterministic PCM16 sample `i` of doc `docId` — like [[ppmPixel]],
    * the formula exists to make the fixture SQL-replicable; the parser
    * below never sees it.
    */
  private def wavSample(docId: Long, i: Long): Int =
    (((docId * 7919 + i * 4001 + (i * i % 9973) * 13) % 65536) - 32768).toInt

  /** A genuine RIFF/WAVE file: RIFF header, canonical 16-byte PCM
    * `fmt ` chunk (mono, 8 kHz, 16-bit), and a `data` chunk of
    * little-endian PCM16 samples. Any audio tool opens these.
    */
  def buildWav(docId: Long): Array[Byte] = {
    val n = wavNumSamples
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(36 + dataSize) // riff payload size
    out.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(16) // canonical PCM fmt chunk
    out.putShort(1) // audio format: PCM
    out.putShort(1) // channels
    out.putInt(wavSampleRate)
    out.putInt(wavSampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits per sample
    out.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(dataSize)
    var i = 0
    while (i < n) { out.putShort(wavSample(docId, i.toLong).toShort); i += 1 }
    out.array()
  }

  /** documents -> real audio rows: one WAV payload per doc. */
  def wavMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, "audio/wav", buildWav(id)))
  }

  /** Decoded audio features, all exact integers (sum of squares instead
    * of RMS, so no float ulp can diverge between engines).
    */
  case class AudioFeatures(
      media_id: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_us: Long,
      peak_abs: Long,
      sum_sq: Long,
      zero_crossings: Long,
  )

  /** The second NON-STUB kernel: a real RIFF/WAVE parser — validates the
    * RIFF/WAVE magic, WALKS THE CHUNK LIST (skipping unknown chunks and
    * their odd-length pad bytes, as the format requires), reads the PCM
    * `fmt ` fields, and decodes the little-endian PCM16 `data` payload —
    * then computes exact-integer signal features: peak amplitude, energy
    * (sum of squares), and zero crossings (sign change between
    * consecutive samples; zero counts as non-negative). Works on any
    * mono PCM16 WAV, not just the fixtures.
    */
  def decodeWavFeatures(batch: Seq[MediaRecord]): Seq[AudioFeatures] = batch.map { rec =>
    val buf = java.nio.ByteBuffer.wrap(rec.payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4)
      buf.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(fourCC() == "RIFF", s"media ${rec.media_id}: not a RIFF file")
    buf.getInt // riff payload size (trust the chunk walk, not this)
    require(fourCC() == "WAVE", s"media ${rec.media_id}: RIFF but not WAVE")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8) {
      val id = fourCC()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"media ${rec.media_id}: chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"media ${rec.media_id}: not PCM (fmt tag $fmt)")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort
          buf.position(buf.position() + size - 16) // fmt extensions, if any
        case "data" =>
          data = new Array[Byte](size)
          buf.get(data)
        case _ =>
          buf.position(buf.position() + size) // skip unknown chunk
      }
      if (size % 2 == 1 && buf.remaining() > 0) buf.position(buf.position() + 1)
    }
    require(sampleRate > 0 && data != null,
      s"media ${rec.media_id}: missing fmt or data chunk")
    require(channels == 1 && bits == 16,
      s"media ${rec.media_id}: expected mono PCM16, got ${channels}ch ${bits}bit")
    val pcm = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val n = pcm.remaining()
    var peak = 0L
    var sumSq = 0L
    var crossings = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val s = pcm.get(i).toInt
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (i > 0 && ((prev < 0) != (s < 0))) crossings += 1
      prev = s
      i += 1
    }
    AudioFeatures(rec.media_id, sampleRate.toLong, n.toLong,
      n.toLong * 1000000L / sampleRate, peak, sumSq, crossings)
  }

  /** Partition-parallel batched audio decode — same shape as
    * imageHashes, real kernel inside.
    */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeWavFeatures))
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
