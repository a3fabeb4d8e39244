package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
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

/** Union-aggregate over SERIALIZED bloom filters — PipelineDB's
  * `bloom_union_agg`, the second half of what makes its sketches
  * mergeable: a continuous view persists one fixed-size sketch per
  * window/group, and rollups aggregate the sketches themselves, never
  * re-reading raw rows. Spark's own `BloomFilterAggregate` only ingests
  * raw values, so pre-built per-group sketches could not be rolled up
  * without this. Buffers hold the deserialized filter; partials merge
  * via `mergeInPlace` (throws on incompatible m/k — a real sizing bug,
  * surfaced loudly). Input nulls (empty groups) are skipped; an
  * all-null input yields NULL, like Spark's builtin. */
case class BloomUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bloom_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be BINARY (a graft_bloom_agg result), " +
        s"got ${child.dataType}")

  override def createAggregationBuffer(): BloomFilter = null

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) bf else { buffer.mergeInPlace(bf); buffer }
    }
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    if (b1 == null) b2
    else if (b2 == null) b1
    else { b1.mergeInPlace(b2); b1 }

  override def eval(buffer: BloomFilter): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bos = new java.io.ByteArrayOutputStream()
      buffer.writeTo(bos); bos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    if (bytes.isEmpty) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomUnionAgg =
    copy(child = newChild)
}

/** Union-aggregate over SERIALIZED count-min sketches — the merge half
  * of PipelineDB's `freq_agg`/`combine` surface (see [[BloomUnionAgg]];
  * same contract, CMS flavor: partials built by `count_min_sketch` with
  * identical depth/width/seed union into the exact sketch the global
  * aggregate would have built — CMS union is cellwise addition, so
  * estimates after the rollup equal the single-pass sketch's). */
case class CmsUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_cms_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be BINARY (a count_min_sketch result), " +
        s"got ${child.dataType}")

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) s else { buffer.mergeInPlace(s); buffer }
    }
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    if (b1 == null) b2
    else if (b2 == null) b1
    else { b1.mergeInPlace(b2); b1 }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bos = new java.io.ByteArrayOutputStream()
      buffer.writeTo(bos); bos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
}
