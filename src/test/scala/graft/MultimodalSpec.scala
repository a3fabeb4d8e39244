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
