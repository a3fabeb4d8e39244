package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key.
  *
  * Implementation is the union-and-carry pattern rather than a point-lookup
  * or a range join: tag both sides, union, and run one window pass
  * partitioned by key and ordered by (time, side, tiebreak). The last
  * non-null right-side payload seen at each left row is exactly the as-of
  * match. Cost at scale: a single hash shuffle of (|L|+|R|) rows on the join
  * key plus a per-partition sort — no O(|L|·|R|) blowup, no broadcast
  * requirement, skew-tolerant via AQE. Right rows that tie on time resolve
  * to the largest tiebreak value (deterministic).
  *
  * Reference capability analog: time-correlation of stream rows against a
  * slowly-changing table, the kind of continuous-view join PipelineDB runs
  * over streams (reference README.md:66).
  */
object AsOfJoin {

  /** @param left       left (probe/event) side
    * @param right      right (reference/state) side
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right
    * @param rightCols  right-side payload columns to carry (prefixed `asof_`)
    * @param rightTiebreak right column that breaks time ties (max wins)
    * @param toleranceSeconds if set, a match further than this behind the
    *        left time is nulled out (stale-state cutoff) — applied as a
    *        post-filter on the carried match time, so the plan shape is
    *        unchanged
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightCols: Seq[String], rightTiebreak: String,
            toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq

    // the payload carries the right event time too (hidden __rt field) so
    // a tolerance cutoff can be applied after the window pass
    val payloadCols = rightCols :+ "__rt"
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)) :+
          org.apache.spark.sql.types.StructField(
            "__rt", right.schema(rightTime).dataType))))

    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
      .withColumn("__payload",
        struct(rightCols.map(col) :+ col(rightTime).as("__rt"): _*))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
               Seq(col("__k"), col("__t"), col("__side"), col("__tb"), col("__payload"))): _*)

    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__k"), col("__t"), col("__side"), col("__tb"), col("__payload"))): _*)
      .unionByName(r)

    // Order: time asc, right-before-left at equal time (<= semantics),
    // larger tiebreak later so `last` picks it.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried0 = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val carried = toleranceSeconds match {
      case Some(tol) => carried0.withColumn("__match",
        // normalize via timestamp→double epoch seconds: TIMESTAMP_NTZ has
        // no direct numeric cast under ANSI
        when(col("__match").isNotNull &&
             col("__t").cast("timestamp").cast("double") -
               col("__match").getField("__rt").cast("timestamp").cast("double") <= tol,
          col("__match")))
      case None => carried0
    }

    val out = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("__match").getField(c))
    }
    out.select((leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c"))): _*)
  }

  /** Column-expression variant used by tests. */
  def matched(out: DataFrame): DataFrame = out.filter(out.columns
    .filter(_.startsWith("asof_")).map(col).map(_.isNotNull).reduce(_ && _))
}
