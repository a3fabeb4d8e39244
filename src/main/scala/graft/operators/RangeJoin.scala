package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval (range) join: left rows carry a half-open time
  * interval `[start, end)`, right rows carry a point; output is every
  * (left, right) pair whose point falls inside the interval.
  *
  * A naive theta-join (`point >= start && point < end`) has no equi-key,
  * so Spark plans BroadcastNestedLoopJoin — or, with two large sides, a
  * cartesian product. Instead both sides are bucketed to fixed-width time
  * bins: each left row is replicated into every bin its interval overlaps
  * (at most `ceil(len/width) + 1` copies — bounded, because callers size
  * `binSeconds` near the interval length), the right side maps each point
  * to its single bin, the join is a plain equi-join on the bin id, and
  * the exact range predicate filters within the bin. The shuffle carries
  * bin ids, so the plan is one hash exchange per side + a sort-merge or
  * hash join — the same shape at 100 TB, with AQE free to split skewed
  * bins. This is the standard bucketed interval-join decomposition (as
  * used by interval-join implementations in streaming engines; e.g.
  * Flink's interval join keys by time bucket internally).
  *
  * Reference capability analog: PipelineDB continuous views join stream
  * rows against time ranges (reference README.md:66 demonstrates
  * arbitrary-SQL views; the range predicate is plain SQL there).
  */
object RangeJoin {

  /** @param left      interval side
    * @param right     point side
    * @param start     interval start column (timestamp, inclusive)
    * @param end       interval end column (timestamp, exclusive)
    * @param point     right-side timestamp column
    * @param binSeconds bucket width; choose ≈ the typical interval length
    *        so replication stays ≤ 2× (too small → more left copies, too
    *        large → more in-bin filtering)
    */
  def apply(left: DataFrame, right: DataFrame,
            start: Column, end: Column, point: Column,
            binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds=$binSeconds")
    val binOf: Column => Column = t => floor(unix_timestamp(t) / binSeconds)
    // end is exclusive: an interval ending exactly on a bin boundary does
    // not reach into that bin, hence the -1 microsecond step back
    val l = left.withColumn("__bin",
      explode(sequence(binOf(start),
                       binOf(end - expr("INTERVAL 1 MICROSECOND")))))
    val r = right.withColumn("__rbin", binOf(point))
    l.join(r, l("__bin") === r("__rbin") && point >= start && point < end)
      .drop("__bin", "__rbin")
  }
}
