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

  test("PPM aHash kernel: real parser — header-whitespace-invariant, flat image hashes to 0, malformed inputs rejected") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.MediaRecord
    // A fixture image decodes; re-serializing its pixels under a
    // DIFFERENT (still legal) header spelling yields the SAME hash —
    // the parser reads the format, not fixed byte offsets.
    val ppm = Multimodal.buildPpm(42L)
    val Seq(a) = Multimodal.decodePpmAHash(Seq(MediaRecord(42L, "image/ppm", ppm)))
    assert(a.width == 16 && a.height == 16)
    assert(a.ahash_lo != 0L || a.ahash_hi != 0L, "fixture image hashed to all-below-mean")
    val pixels = ppm.drop(ppm.length - 16 * 16 * 3)
    val alt = "P6  16\t16\r255\n".getBytes("US-ASCII") ++ pixels
    val Seq(b) = Multimodal.decodePpmAHash(Seq(MediaRecord(42L, "image/ppm", alt)))
    assert(b == a.copy(media_id = b.media_id), "hash changed under equivalent header spelling")
    // Flat image: every block mean EQUALS the global mean — strict
    // threshold means no bit is set (the canonical aHash edge case).
    val flat = "P6\n16 16\n255\n".getBytes("US-ASCII") ++ Array.fill(768)(77.toByte)
    val Seq(f) = Multimodal.decodePpmAHash(Seq(MediaRecord(1L, "image/ppm", flat)))
    assert(f.ahash_lo == 0L && f.ahash_hi == 0L && f.gray_total == 77L * 256)
    // Malformed inputs fail loudly, not with garbage hashes.
    intercept[IllegalArgumentException] {
      Multimodal.decodePpmAHash(Seq(MediaRecord(2L, "x", "P5\n16 16\n255\n".getBytes("US-ASCII") ++ pixels)))
    }
    intercept[IllegalArgumentException] { // truncated pixel data
      Multimodal.decodePpmAHash(Seq(MediaRecord(3L, "x", ppm.dropRight(1))))
    }
  }

  test("imageHashes runs partition-parallel with no shuffle and one row per doc") {
    import graft.multimodal.Multimodal
    val media = Multimodal.ppmMedia(Tables.documents(spark, sf0001))
    val hashed = Multimodal.imageHashes(media)
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(hashed.count() == nDocs)
    val plan = hashed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode path shuffles:\n$plan")
  }

  test("video kernel: frame-by-frame decode — scene structure recovered, mixed dims re-parsed per frame, truncation rejected") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.MediaRecord
    val video = Multimodal.buildPpmVideo(11L)
    val frames = Multimodal.decodeVideoFrameHashes(Seq(MediaRecord(11L, "video/ppm-raw", video)))
    assert(frames.length == Multimodal.videoFrames)
    assert(frames.map(_.frame_idx) == (0L until 9L))
    // Frames within a scene are identical; each frame's hash equals the
    // single-image kernel's hash of that scene's source image.
    frames.foreach { f =>
      val seed = 11L * 8 + f.frame_idx / Multimodal.videoSceneLen
      val Seq(img) = Multimodal.decodePpmAHash(
        Seq(MediaRecord(0L, "image/ppm", Multimodal.buildPpm(seed))))
      assert((f.ahash_lo, f.ahash_hi) == (img.ahash_lo, img.ahash_hi),
        s"frame ${f.frame_idx} hash diverged from its scene image")
    }
    // Mixed dimensions mid-stream: the header really is re-parsed per
    // frame (an offset-stepping fake would misread the second frame).
    val small = "P6\n8 8\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(192)(i => (i % 251).toByte)
    val mixed = Multimodal.buildPpm(3L) ++ small
    val two = Multimodal.decodeVideoFrameHashes(Seq(MediaRecord(5L, "video/ppm-raw", mixed)))
    assert(two.length == 2, s"mixed-dim stream decoded ${two.length} frames")
    // A stream truncated mid-frame fails loudly.
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFrameHashes(Seq(MediaRecord(6L, "x", video.dropRight(10))))
    }
  }

  test("WAV kernel: real chunk-walking parser — unknown/odd chunks skipped, hand-computed features exact, malformed rejected") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.MediaRecord
    import java.nio.{ByteBuffer, ByteOrder}
    def wav(samples: Seq[Int], extraChunk: Option[(String, Array[Byte])] = None): Array[Byte] = {
      val extra = extraChunk.map { case (id, body) =>
        val pad = body.length % 2 // RIFF pads odd chunks
        val b = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
        b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
        b.array()
      }.getOrElse(Array.empty[Byte])
      val dataSize = samples.length * 2
      val b = ByteBuffer.allocate(44 + extra.length + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra.length + dataSize)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put(extra)
      b.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(s => b.putShort(s.toShort))
      b.array()
    }
    // Hand-computed: crossings 1->-1, -1->2, 3->-5 (0 is non-negative).
    val samples = Seq(1, -1, 2, 0, 3, -5)
    val Seq(f) = Multimodal.decodeWavFeatures(Seq(MediaRecord(1L, "audio/wav", wav(samples))))
    assert(f.n_samples == 6 && f.peak_abs == 5 && f.zero_crossings == 3)
    assert(f.sum_sq == samples.map(s => s.toLong * s).sum && f.duration_us == 750)
    // An unknown ODD-sized chunk before data must be skipped with its pad
    // byte — features identical (the parser walks the format, not offsets).
    val withJunk = wav(samples, Some(("LIST", Array[Byte](1, 2, 3))))
    val Seq(g) = Multimodal.decodeWavFeatures(Seq(MediaRecord(1L, "audio/wav", withJunk)))
    assert(g == f, "unknown chunk changed decoded features")
    // The fixture generator round-trips through the parser.
    val Seq(h) = Multimodal.decodeWavFeatures(Seq(MediaRecord(7L, "audio/wav", Multimodal.buildWav(7L))))
    assert(h.sample_rate == 8000 && h.n_samples == 256 && h.duration_us == 32000)
    // Malformed inputs fail loudly.
    intercept[IllegalArgumentException] { // not RIFF
      Multimodal.decodeWavFeatures(Seq(MediaRecord(2L, "x", "RIFX".getBytes("US-ASCII") ++ wav(samples).drop(4))))
    }
    intercept[IllegalArgumentException] { // chunk size overruns payload
      Multimodal.decodeWavFeatures(Seq(MediaRecord(3L, "x", wav(samples).dropRight(2))))
    }
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
