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
