package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video travel as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as a
  * partition-local batch map — the Scala analog of the Python
  * `mapInPandas` pattern (iterator of batches in, iterator of batches out,
  * no shuffle, schema declared up front).
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries): `stubDecode` derives deterministic pseudo-features from the
  * raw bytes. Everything around the stub — binary schema, batch iteration
  * shape, metadata struct, partition preservation — is the real plumbing a
  * production decoder would drop into.
  *
  * Scale notes: decode is the classic CPU-heavy narrow stage — no shuffle,
  * so it scales linearly with executors; `batchSize` bounds peak memory
  * per task (decoded frames never all materialize); column pruning still
  * applies upstream because the binary column is only deserialized inside
  * the partition iterator.
  */
object Multimodal {

  val MEDIA_SCHEMA: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  val FEATURE_SCHEMA: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder: a real implementation would decode the payload with a
    * codec and run a feature extractor; this derives deterministic values
    * from the bytes so the plumbing is testable offline. */
  private[operators] def stubDecode(payload: Array[Byte]): (Long, Array[Float]) = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc = (acc * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val emb = Array.tabulate(8)(j => (((acc >> (j * 4)) & 0xf).toFloat / 15.0f))
    (acc, emb)
  }

  /** Batch feature extraction over a binary media column.
    *
    * @param df        input with MEDIA_SCHEMA columns
    * @param batchSize records decoded per in-memory batch (peak-memory bound)
    */
  def decodeFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(FEATURE_SCHEMA)
    df.select("media_id", "kind", "payload")
      .mapPartitions { it =>
        // grouped() gives the mapInPandas batch shape: bounded batches
        // decoded together, streamed out lazily.
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
            val (checksum, emb) = stubDecode(payload)
            Row(r.getLong(0), r.getString(1), payload.length.toLong, checksum, emb.toSeq)
          }
        }
      }(enc)
  }

  /** STUB resize: a real version re-encodes the payload at the target
    * resolution; the stub truncates bytes deterministically, keeping the
    * byte-in/byte-out contract and the metadata update. */
  def resizeStub(df: DataFrame, maxBytes: Int): DataFrame =
    df.withColumn("payload", expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("meta", struct(col("meta.source"),
        least(col("meta.declared_bytes"), lit(maxBytes.toLong)).as("declared_bytes")))

  /** STUB frame sampling: every k-th fixed-size window of the payload
    * stands in for every k-th video frame. Payloads shorter than one
    * frame yield zero frames — the CASE guard matters because Spark's
    * `sequence(0, -1)` produces a descending `[0, -1]` (two bogus
    * frames), not an empty array. */
  def frameSampleStub(df: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val frames = expr(
      s"""filter(
            transform(
              CASE WHEN octet_length(payload) >= $frameBytes
                   THEN sequence(0, int(octet_length(payload) / $frameBytes) - 1)
                   ELSE CAST(array() AS ARRAY<INT>) END,
              i -> struct(i AS frame_no, substring(payload, i * $frameBytes + 1, $frameBytes) AS frame)),
            f -> f.frame_no % $everyK = 0)""")
    df.select(col("media_id"), col("kind"), explode(frames).as("f"))
      .select(col("media_id"), col("kind"), col("f.frame_no"), col("f.frame"))
  }
}
