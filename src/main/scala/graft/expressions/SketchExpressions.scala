package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

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

  @transient private var cachedBytes: AnyRef = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    right.dataType match {
      case StringType => cachedSketch.estimateCount(
        item.asInstanceOf[UTF8String].getBytes)
      case LongType => cachedSketch.estimateCount(item.asInstanceOf[Long])
      case IntegerType =>
        cachedSketch.estimateCount(item.asInstanceOf[Int].toLong)
      case t => throw new UnsupportedOperationException(
        s"graft_cms_query: unsupported probe type $t (string/int/long)")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}
