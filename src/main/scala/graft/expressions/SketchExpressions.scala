package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Point-query into a serialized count-min sketch — the reader half of
  * PipelineDB's `freq_agg`/`cmsketch` surface (frequency of one item out
  * of a mergeable sketch). The sketch side is Spark's own
  * `count_min_sketch` aggregate; this expression deserializes its binary
  * output and calls `estimateCount`.
  *
  * The probe item must use the same representation the aggregate
  * inserted: strings are counted as their UTF-8 bytes, integral types as
  * longs (mirrors CountMinSketchAgg's update).
  *
  * Typical shape — one sketch row broadcast against a handful of probe
  * items — so this sits outside the hot path and takes the
  * CodegenFallback tier; the deserialized sketch is cached per-instance
  * keyed on the binary's identity, so a broadcast sketch parses once per
  * task, not once per row. */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_query"

  // Analysis-time validation: a non-binary sketch child or an unsupported
  // probe type is a resolution error, not a runtime ClassCastException.
  // (Hand-rolled rather than ExpectsInputTypes because TypeCollection is
  // private[sql] and this expression lives outside that package.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_query: sketch argument must be BINARY (a " +
          s"count_min_sketch aggregate result), got ${left.dataType}")
    else right.dataType match {
      case StringType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_query: probe type $t unsupported (string/int/long)")
    }

  // Single immutable (bytes, sketch) pair: Tuple2's final fields give safe
  // publication, so two threads evaluating the same shared expression
  // instance can never pair one thread's bytes with the other's sketch
  // (the hazard of two separately-mutated fields).
  @transient private var cached: (AnyRef, CountMinSketch) = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    var c = cached
    if (c == null || !(c._1 eq bytes)) {
      c = (bytes, CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cached = c
    }
    val sketch = c._2
    right.dataType match {
      case StringType => sketch.estimateCount(
        item.asInstanceOf[UTF8String].getBytes)
      case LongType => sketch.estimateCount(item.asInstanceOf[Long])
      case IntegerType =>
        sketch.estimateCount(item.asInstanceOf[Int].toLong)
      case t => throw new UnsupportedOperationException(
        s"graft_cms_query: unsupported probe type $t (string/int/long)")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

/** Membership probe into a serialized bloom filter — the reader half of
  * PipelineDB's `bloom_agg`/`bloom_contains` surface. The sketch side is
  * the registered `graft_bloom_agg` (Spark's own BloomFilterAggregate,
  * which serializes via the public `org.apache.spark.util.sketch
  * .BloomFilter` format this expression reads back).
  *
  * Spark's builtin `might_contain` insists the sketch be a CONSTANT or
  * scalar subquery (it exists for Catalyst's injected runtime join
  * filters); this probe takes any binary column, so per-group sketches
  * stored in a continuous view can be probed row-by-row — the actual
  * PipelineDB usage. Contract matches the builder: the probed value is
  * the xxhash64 LONG of the item, same convention on both sides.
  *
  * Deserialized sketch cached per-instance as one immutable pair (safe
  * publication via Tuple2's final fields — see [[CmsQuery]]); a
  * broadcast sketch parses once per task, not once per row. */
case class BloomQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: sketch argument must be BINARY (a " +
          s"graft_bloom_agg result), got ${left.dataType}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: item must be LONG (xxhash64 the value, " +
          s"as at build time), got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private var cached: (AnyRef, BloomFilter) = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    var c = cached
    if (c == null || !(c._1 eq bytes)) {
      c = (bytes, BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cached = c
    }
    c._2.mightContainLong(item.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomQuery =
    copy(left = newLeft, right = newRight)
}
