package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = (0L until 10L).map { i =>
      Row(i, if (i % 2 == 0) "image" else "audio",
          s"payload-bytes-$i".getBytes("UTF-8"),
          Row(s"src${i % 3}", 64L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), Multimodal.MEDIA_SCHEMA)
  }

  test("decodeFeatures: schema, determinism, partition preservation") {
    val out = Multimodal.decodeFeatures(mediaDf, batchSize = 4)
    assert(out.schema === Multimodal.FEATURE_SCHEMA)
    assert(out.rdd.getNumPartitions === 3, "narrow map keeps partitioning")
    val rows = out.orderBy("media_id").collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getLong(2) > 0), "n_bytes populated")
    assert(rows.forall(_.getSeq[Float](4).length === 8), "embedding dim 8")
    val again = Multimodal.decodeFeatures(mediaDf, batchSize = 4)
      .orderBy("media_id").collect()
    assert(rows.sameElements(again), "stub decode is deterministic")
  }

  // --- real codec-free decoders (r15) ---

  /** P6 PPM: 2×2 image, maxval 255, known channel values (with a header
    * comment to exercise the netpbm grammar). */
  private def ppmBytes: Array[Byte] = {
    val header = "P6\n# synthetic test image\n2 2\n255\n".getBytes("US-ASCII")
    // pixels (R,G,B): (255,0,0) (0,255,0) (0,0,255) (255,255,255)
    val raster = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    header ++ raster
  }

  /** Minimal RIFF/WAVE: PCM-16 mono 8 kHz, 4 samples with known values. */
  private def wavBytes(samples: Seq[Short], rate: Int = 8000,
                       channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeMedia: real PPM decode — dimensions and exact channel means") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", ppmBytes, Row("s", 0L))), 1), Multimodal.MEDIA_SCHEMA)
    val r = Multimodal.decodeMedia(df).head()
    assert(r.getString(2) === "ppm")
    assert(r.getInt(4) === 2 && r.getInt(5) === 2 && r.getInt(6) === 3)
    assert(r.getLong(8) === 4L, "4 pixels")
    val Seq(mr, mg, mb) = r.getSeq[Double](9).toSeq
    // each channel: (255 + 0 + 0 + 255) / (4 * 255) = 0.5 exactly
    assert(mr === 0.5 && mg === 0.5 && mb === 0.5,
      s"channel means ($mr, $mg, $mb) != exact 0.5")
  }

  test("decodeMedia: real WAV decode — rate, frames, RMS and peak") {
    // samples ±16384 = ±0.5 normalized → RMS 0.5, peak 0.5, 4 frames
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(2L, "audio", wavBytes(Seq[Short](16384, -16384, 16384, -16384)),
            Row("s", 0L))), 1), Multimodal.MEDIA_SCHEMA)
    val r = Multimodal.decodeMedia(df).head()
    assert(r.getString(2) === "wav")
    assert(r.getInt(6) === 1 && r.getInt(7) === 8000)
    assert(r.getLong(8) === 4L, "4 sample frames")
    val Seq(rms, peak) = r.getSeq[Double](9).toSeq
    assert(math.abs(rms - 0.5) < 1e-12 && math.abs(peak - 0.5) < 1e-12,
      s"(rms=$rms, peak=$peak) != 0.5")
  }

  test("decodeMedia: malformed and compressed payloads fall back to opaque, never throw") {
    // adversarial WAV chunk sizes (review r15): a negative size once
    // stalled the chunk walk forever (o += 8 + size added <= 0) and a
    // near-Int.MaxValue size overflowed the offset into a throwing
    // String slice — both must now refuse-and-fall-back in bounded time
    def wavChunk(size: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(48)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(40)
        .put("WAVE".getBytes("US-ASCII"))
        .put("LIST".getBytes("US-ASCII")).putInt(size)
      bb.array()
    }
    val rows = Seq(
      Row(3L, "image", "P6\n2 2\n255\nshort".getBytes("US-ASCII"), Row("s", 0L)),
      Row(4L, "audio", "RIFFxxxxWAVEbroken".getBytes("US-ASCII"), Row("s", 0L)),
      Row(5L, "video", Array[Byte](-1, -40, -1, -32), Row("s", 0L)), // JPEG magic
      Row(6L, "image", null, Row("s", 0L)),
      Row(7L, "audio", wavChunk(-8), Row("s", 0L)),          // stall shape
      Row(8L, "audio", wavChunk(0x7ffffff8), Row("s", 0L)),  // overflow shape
      Row(9L, "image", "P6 99999999999 1 255 x".getBytes("US-ASCII"),
          Row("s", 0L)))                                     // toInt overflow
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MEDIA_SCHEMA)
    val out = Multimodal.decodeMedia(df).orderBy("media_id").collect()
    assert(out.length === 7)
    assert(out.forall(_.getString(2) === "opaque"),
      "undecodable payloads are marked opaque, not mis-decoded")
    // stub features still populated (deterministic pseudo-embedding)
    assert(out.forall(_.getSeq[Double](9).length === 8))
  }

  test("resizeStub truncates payload and caps declared_bytes") {
    val out = Multimodal.resizeStub(mediaDf, maxBytes = 5)
    val r = out.select(octet_length(col("payload")), col("meta.declared_bytes"))
      .collect()
    assert(r.forall(_.getInt(0) === 5))
    assert(r.forall(_.getLong(1) === 5L))
  }

  test("frameSampleStub emits every k-th frame window") {
    val one = mediaDf.filter(col("media_id") === 0) // "payload-bytes-0" = 15 bytes
    val frames = Multimodal.frameSampleStub(one, frameBytes = 4, everyK = 2)
      .orderBy("frame_no").collect()
    // 15 / 4 = 3 full frames (0,1,2); every 2nd → frames 0 and 2.
    assert(frames.map(_.getInt(2)).toSeq === Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]](3).length === 4))
  }

  test("frameSampleStub: payload shorter than one frame yields zero frames") {
    // "payload-bytes-0" is 15 bytes; frameBytes=32 must give no frames, not
    // the two bogus ones an unguarded descending sequence(0,-1) produced.
    val one = mediaDf.filter(col("media_id") === 0)
    assert(Multimodal.frameSampleStub(one, frameBytes = 32, everyK = 1).count() === 0L)
    // exact-fit payload: exactly one frame
    assert(Multimodal.frameSampleStub(one, frameBytes = 15, everyK = 1).count() === 1L)
  }

  // --- q_media_decode: synthetic payloads through the REAL decoders ---

  test("syntheticMedia never throws on negative ids (floorMod, review r16)") {
    import spark.implicits._
    // JVM % is sign-preserving: with plain %, id = -3 routes to the PPM
    // arm with w = 2 + (-3 % 7) = -1 and the raster allocation throws.
    val out = Multimodal.decodeMedia(
      Multimodal.syntheticMedia(Seq(-1L, -2L, -3L, -97L).toDF("doc_id")))
      .collect()
    assert(out.length === 4, "every negative id decodes or refuses, no crash")
    assert(out.forall(r => Set("ppm", "wav", "opaque").contains(r.getString(2))))
  }

  test("syntheticMedia round-trips through the real decoders with closed-form features") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 31L, 97L).toDF("doc_id")
    val out = Multimodal.decodeMedia(Multimodal.syntheticMedia(ids))
      .orderBy("media_id").collect()
    assert(out.length === 8)
    val byId = out.map(r => r.getLong(0) -> r).toMap

    // id 0: PPM, w=2 h=1 — byte at pixel p channel c is (p*7 + c*11) % 256
    val r0 = byId(0L)
    assert(r0.getString(2) === "ppm" && r0.getInt(4) === 2 && r0.getInt(5) === 1)
    assert(r0.getLong(3) === 11L + 2 * 1 * 3)
    val means0 = r0.getSeq[Double](9)
    assert(math.abs(means0(0) - (0 + 7).toDouble / (2 * 255)) < 1e-12)
    assert(math.abs(means0(1) - (11 + 18).toDouble / (2 * 255)) < 1e-12)

    // id 1: WAV — ch=2, rate=12000, n=2*(4+1)=10 samples → 5 frames
    val r1 = byId(1L)
    assert(r1.getString(2) === "wav" && r1.getInt(6) === 2 && r1.getInt(7) === 12000)
    assert(r1.getLong(8) === 5L)
    val samples = (0 until 10).map(k => (((131L + k * 7919L) % 65536L) - 32768L).toDouble / 32768.0)
    val rms = math.sqrt(samples.map(v => v * v).sum / 10)
    assert(math.abs(r1.getSeq[Double](9).head - rms) < 1e-9)
    assert(math.abs(r1.getSeq[Double](9)(1) - samples.map(math.abs).max) < 1e-12)

    // id 2: truncated PPM must refuse to opaque, not throw or misparse
    val r2 = byId(2L)
    assert(r2.getString(2) === "opaque")
    assert(r2.getLong(3) === r2.getLong(8), "opaque n_units = n_bytes")
    // the three arms cycle with id % 3
    assert(byId(3L).getString(2) === "ppm" && byId(4L).getString(2) === "wav" &&
           byId(5L).getString(2) === "opaque")
    assert(byId(31L).getString(2) === "wav" && byId(97L).getString(2) === "wav")
  }

  test("q_media_decode runs on sf0.001 with all three format arms populated") {
    val out = graft.queries.Media.queries("q_media_decode")(spark, sf0001)
    val counts = out.groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("ppm", "wav", "opaque"))
    val n = counts.values.sum
    // the arms cycle on doc_id % 3: each within 1 of a third
    assert(counts.values.forall(c => math.abs(c - n / 3.0) <= 1.0))
    // features present exactly where the format promises them
    val bad = out.filter(
      (col("format") === "ppm" && (col("f0").isNull || col("f2").isNull)) ||
      (col("format") === "wav" && (col("f0").isNull || col("f2").isNotNull)) ||
      (col("format") === "opaque" && col("f0").isNotNull)).count()
    assert(bad === 0L)
  }

  // --- perceptual hash + real upscale (r18) ---

  test("aHashPpm: planted near-dup pair — a 2x-upscaled image hashes identically") {
    // the q_media_phash plant: every byte of the upscaled twin differs
    // (different header, 4x the raster) yet the perceptual hash matches
    // by the sampling identity floor(floor(2a)/2) = floor(a)
    for (id <- Seq(0L, 9L, 18L, 36L, 12345L * 9)) {
      val orig = Multimodal.ppmPayload(id, truncate = false)
      val up = Multimodal.upscalePpm2x(orig)
        .getOrElse(fail(s"upscale refused a valid PPM (id=$id)"))
      assert(!java.util.Arrays.equals(orig, up), "twin bytes must differ")
      assert(Multimodal.aHashPpm(up) === Multimodal.aHashPpm(orig),
        s"upscaled twin of id=$id must hash identically")
    }
    // and a visually DIFFERENT image hashes differently: a left-right
    // gradient vs its inversion flips every grid bit that is off-mean
    def gradient(invert: Boolean): Array[Byte] = {
      val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val raster = new Array[Byte](8 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
        raster((y * 8 + x) * 3 + c) =
          (if (invert) 255 - x * 30 else x * 30).toByte
      header ++ raster
    }
    assert(Multimodal.aHashPpm(gradient(false)) !==
           Multimodal.aHashPpm(gradient(true)))
    // refusal paths: audio bytes and a truncated raster are None, not fake
    assert(Multimodal.aHashPpm(Multimodal.wavPayload(1L)) === None)
    assert(Multimodal.aHashPpm(
      Multimodal.ppmPayload(2L, truncate = true)) === None)
  }

  test("upscalePpm2x is a REAL re-encode: decoded dims double, channel means exact") {
    // nearest-neighbor doubling copies each pixel into a 2x2 block, so
    // the real decoder must see 2w x 2h and IDENTICAL channel means
    val orig = Multimodal.ppmPayload(7L * 3, truncate = false)
    val Some((w, h, means)) = Multimodal.decodePpm(orig)
    val Some((w2, h2, means2)) =
      Multimodal.decodePpm(Multimodal.upscalePpm2x(orig).get)
    assert((w2, h2) === (2 * w, 2 * h))
    assert(means2.toSeq === means.toSeq, "block duplication preserves means")
  }

  test("q_media_phash groups originals with their planted upscaled twins") {
    val out = graft.queries.Media.queries("q_media_phash")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "plant keeps the query non-vacuous at every SF")
    // every doc_id % 9 == 0 image's twin (id + 1e12) shares a cluster
    // with SOME original (usually its own source; tiny synthetic rasters
    // may merge clusters across ids — the oracle reproduces that too)
    val docIds = graft.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = docIds.filter(_ % 9 == 0)
    assert(planted.nonEmpty, "fixture sanity")
    val clustered = out.map(_._2).sum
    assert(clustered >= 2 * 1, "at least one (original, twin) pair grouped")
    // keepers are originals, never twins: min(media_id) precedes the 1e12 offset
    assert(out.forall(_._3 < 1000000000000L),
      "every cluster contains at least one original image")
  }

  test("q_media_phash_pairs: planted twin pair found at hamming 0; sub-floor images excluded") {
    import spark.implicits._
    // controlled corpus (the dedup-spec tmpDir pattern): doc_ids chosen
    // so id 18 is a PPM with a planted upscaled twin (18 % 9 == 0,
    // w=6 h=4 → 24 px), ids 24/33 are distinct large PPMs without twins,
    // and id 0 is a 2-pixel thumbnail BELOW the 12-px information floor
    // (its twin is 8 px — both sides must be excluded)
    val d = java.nio.file.Files.createTempDirectory("phash-pairs").toString
    Seq(0L, 18L, 24L, 33L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = graft.queries.Media.queries("q_media_phash_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twin18 = 18L + 1000000000000L
    assert(rows.contains((18L, twin18, 0L)),
      "the upscaled twin must pair with its original at hamming 0")
    assert(rows.forall { case (a, b, _) =>
      a != 0L && b != 0L && b != 1000000000000L },
      "sub-floor thumbnails (and their twins) never pair")
    assert(rows.forall(_._3 <= 3L), "threshold respected")
  }

  // --- diverse-raster rehearsal mode (r19) ---

  test("diverse raster mode: hash-diverse corpus, twins still recalled, gate refuses it") {
    import spark.implicits._
    // diversity: the default generator's rasters cycle with small id
    // moduli (the 10× regime edge); the diverse generator hashes every
    // (id, pixel, channel), so perceptual hashes must be (near-)unique
    // across a corpus slice where the default generator collapses to a
    // handful of values
    // only images over the pair join's 12-px information floor count:
    // a 2-px thumbnail collides regardless of content (the floor exists
    // exactly because the 8×8 grid oversamples it) and is excluded from
    // candidate generation on both sides
    val imageIds = (0L until 9000L by 3L) // id % 3 == 0 → PPM
      .filter(id => (2 + id % 7) * (1 + id % 5) >= 12).toSeq
    val divHashes = imageIds.flatMap(id =>
      Multimodal.aHashPpm(Multimodal.ppmPayloadDiverse(id, truncate = false)))
    val defHashes = imageIds.flatMap(id =>
      Multimodal.aHashPpm(Multimodal.ppmPayload(id, truncate = false)))
    assert(defHashes.distinct.size < imageIds.size / 4,
      "fixture sanity: the DEFAULT generator must actually collide heavily")
    assert(divHashes.distinct.size > (imageIds.size * 9) / 10,
      s"diverse rasters must hash near-uniquely, got ${divHashes.distinct.size}/${imageIds.size}")
    // the upscale identity is content-independent: a diverse raster's 2×
    // twin still hashes identically (the pair join's recall at any scale)
    for (id <- Seq(0L, 9L, 18L, 12345L * 9)) {
      val orig = Multimodal.ppmPayloadDiverse(id, truncate = false)
      assert(Multimodal.aHashPpm(Multimodal.upscalePpm2x(orig).get) ===
             Multimodal.aHashPpm(orig))
    }
    // end to end: the pair query in diverse mode still recalls the
    // planted twin at hamming 0 on a controlled corpus
    val d = java.nio.file.Files.createTempDirectory("phash-div").toString
    Seq(18L, 24L, 33L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    spark.conf.set("graft.media.diverse", "true")
    try {
      val rows = graft.queries.Media.queries("q_media_phash_pairs")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.contains((18L, 18L + 1000000000000L, 0L)),
        "planted twin recalled at hamming 0 in diverse mode")
      // under the correctness gate the mode must refuse loudly (the
      // occcutoff-knob lesson): the oracles mirror the default generator
      spark.conf.set("graft.gate", "true")
      val e = intercept[IllegalArgumentException] {
        graft.queries.Media.queries("q_media_phash_pairs")(spark, d)
      }
      assert(e.getMessage.contains("rehearsal lever"))
    } finally {
      spark.conf.unset("graft.media.diverse")
      spark.conf.unset("graft.gate")
    }
  }

  test("diverse clip mode: hash-diverse audio corpus, stretched twins still recalled, gate refuses it (r20)") {
    import spark.implicits._
    // the r19 raster lesson on the audio axis (VERDICT r19 next-round
    // #3): the default generator's samples are linear in small id
    // moduli, so fingerprints collide heavily (412 distinct over the
    // 2,625 floor-passing audio ids below — and the novel-clip fixture
    // already hit one real collision); the diverse generator hashes
    // every (id, k), so fingerprints must spread near-uniquely
    val audioIds = (1L until 9000L by 3L) // id % 3 == 1 → WAV
      .filter(id => (1 + id % 2) * (4 + id % 16) >= 8).toSeq
    def fps(gen: Long => Array[Byte]) =
      audioIds.flatMap(id => Multimodal.audioFpFull(gen(id)).map(_._1))
    val defFps = fps(Multimodal.wavPayload)
    val divFps = fps(Multimodal.wavPayloadDiverse)
    assert(defFps.distinct.size < audioIds.size / 4,
      "fixture sanity: the DEFAULT generator must actually collide heavily")
    assert(divFps.distinct.size > (audioIds.size * 9) / 10,
      s"diverse clips must fingerprint near-uniquely, got ${divFps.distinct.size}/${audioIds.size}")
    // the stretch identity is content-independent: a diverse clip's 2×
    // stream-doubled twin still fingerprints identically (recall at any
    // scale — the ⌊⌊2a⌋/2⌋ = ⌊a⌋ floor identity on the time axis)
    for (id <- Seq(4L, 13L, 22L, 12346L)) {
      val orig = Multimodal.wavPayloadDiverse(id)
      val st = Multimodal.stretchWav2x(orig)
        .getOrElse(fail(s"stretch refused a valid diverse WAV (id=$id)"))
      assert(Multimodal.audioFpFull(st).map(_._1) ===
             Multimodal.audioFpFull(orig).map(_._1))
    }
    // end to end: the pair query in diverse mode still recalls the
    // planted stretched twin at hamming 0 on a controlled corpus
    // (ids ≡ 4 mod 9 AND ≡ 1 mod 3 → audio rows that get twins)
    val d = java.nio.file.Files.createTempDirectory("audiofp-div").toString
    Seq(13L, 22L, 31L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    spark.conf.set("graft.media.diverse", "true")
    try {
      val rows = graft.queries.Media.queries("q_media_audiofp_pairs")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.contains((13L, 13L + 2000000000000L, 0L)),
        "planted stretched twin recalled at hamming 0 in diverse mode")
      // under the correctness gate the mode must refuse loudly for the
      // audio queries too: the afp oracles mirror the default generator
      spark.conf.set("graft.gate", "true")
      val e = intercept[IllegalArgumentException] {
        graft.queries.Media.queries("q_media_audiofp")(spark, d)
      }
      assert(e.getMessage.contains("rehearsal lever"))
    } finally {
      spark.conf.unset("graft.media.diverse")
      spark.conf.unset("graft.gate")
    }
  }

  // --- audio fingerprint + real time stretch (r19) ---

  test("audioFpFull: planted near-dup pair — a 2x time-stretched clip fingerprints identically") {
    // the q_media_audiofp plant: every data byte offset of the stretched
    // twin differs (2x the samples) yet the fingerprint matches by the
    // same floor identity the image upscale rides
    for (id <- Seq(1L, 4L, 13L, 22L, 12346L)) {
      val orig = Multimodal.wavPayload(id)
      val st = Multimodal.stretchWav2x(orig)
        .getOrElse(fail(s"stretch refused a valid WAV (id=$id)"))
      assert(!java.util.Arrays.equals(orig, st), "twin bytes must differ")
      assert(Multimodal.audioFpFull(st).map(_._1) ===
             Multimodal.audioFpFull(orig).map(_._1),
        s"stretched twin of id=$id must fingerprint identically")
      assert(Multimodal.audioFpFull(st).get._2 ===
             2 * Multimodal.audioFpFull(orig).get._2,
        "twin reports its own (doubled) sample count")
    }
    // audibly DIFFERENT clips fingerprint differently: a rising ramp vs
    // its reverse put their above-mean magnitudes at opposite ends
    def ramp(reverse: Boolean): Array[Byte] = {
      val n = 64
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * n)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(8000)
      bb.putInt(16000); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * n)
      for (k <- 0 until n)
        bb.putShort(((if (reverse) n - 1 - k else k) * 100).toShort)
      bb.array()
    }
    assert(Multimodal.audioFpFull(ramp(false)).map(_._1) !==
           Multimodal.audioFpFull(ramp(true)).map(_._1))
    // GAIN invariance: an exact 3x amplification (no clipping on the
    // ramp) cancels from both sides of mag*64 > total
    def amplified(f: Int): Array[Byte] = {
      val b = ramp(false)
      val Some((_, _, off, n)) = Multimodal.wavPcm(b)
      val out = b.clone()
      for (k <- 0 until n) {
        val v = (((b(off + 2 * k) & 0xff) | ((b(off + 2 * k + 1) & 0xff) << 8))
          .toShort * f).toShort
        out(off + 2 * k) = (v & 0xff).toByte
        out(off + 2 * k + 1) = ((v >> 8) & 0xff).toByte
      }
      out
    }
    assert(Multimodal.audioFpFull(amplified(3)).map(_._1) ===
           Multimodal.audioFpFull(ramp(false)).map(_._1),
      "exact re-amplification must not change the fingerprint")
    // refusal paths: image bytes and a truncated raster are None, not fake
    assert(Multimodal.audioFpFull(Multimodal.ppmPayload(3L, truncate = false)) === None)
    assert(Multimodal.audioFpFull(Multimodal.ppmPayload(2L, truncate = true)) === None)
  }

  test("stretchWav2x is a REAL re-encode: decoded frames double, rate/channels/RMS/peak exact") {
    // doubling every raw sample doubles sum(v^2) and n together, so the
    // real decoder must see 2x the frames at IDENTICAL rate, channel
    // count, RMS and peak
    val orig = Multimodal.wavPayload(13L)
    val Some((rate, ch, frames, feats)) = Multimodal.decodeWav(orig)
    val Some((rate2, ch2, frames2, feats2)) =
      Multimodal.decodeWav(Multimodal.stretchWav2x(orig).get)
    assert((rate2, ch2, frames2) === (rate, ch, 2 * frames))
    assert(feats2.toSeq === feats.toSeq, "sample duplication preserves RMS and peak")
  }

  test("q_media_audiofp groups originals with their planted stretched twins") {
    val out = graft.queries.Media.queries("q_media_audiofp")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "plant keeps the query non-vacuous at every SF")
    val docIds = graft.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    assert(docIds.exists(_ % 9 == 4), "fixture sanity")
    assert(out.map(_._2).sum >= 2, "at least one (original, twin) pair grouped")
    // keepers are originals, never twins: every twin's source clip is
    // itself decodable, so its cluster always contains the original
    assert(out.forall(_._3 < 2000000000000L),
      "every cluster contains at least one original clip")
  }

  test("q_media_audiofp_pairs: planted twins at hamming 0; sub-floor clips excluded") {
    import spark.implicits._
    // controlled corpus: ids ≡ 4 (mod 9) gain stretched twins. id 4 is
    // mono n=8 (at the floor), id 13 is stereo n=34 — both must pair with
    // their twins at hamming 0. id 112 (≡ 4 mod 9, n=4) sits BELOW the
    // 8-sample floor: its twin (n=8) passes, but the original is
    // excluded, so no pair may contain 112 itself.
    val d = java.nio.file.Files.createTempDirectory("audiofp-pairs").toString
    Seq(4L, 13L, 112L, 7L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = graft.queries.Media.queries("q_media_audiofp_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val off = 2000000000000L
    assert(rows.contains((4L, 4L + off, 0L)),
      "the stretched twin must pair with its original at hamming 0")
    assert(rows.contains((13L, 13L + off, 0L)),
      "stereo clips pair with their twins too")
    assert(rows.forall { case (a, b, _) => a != 112L && b != 112L },
      "sub-floor clips never pair")
    assert(rows.forall(_._3 <= 3L), "threshold respected")
  }

  test("exact dedup finds duplicate payloads (positive path for q_dedup_exact)") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val dups = docs.groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .filter(col("n_copies") > 1).collect()
    assert(dups.length === 1)
    assert(dups.head.getLong(1) === 2L && dups.head.getLong(2) === 1L)
  }
}
