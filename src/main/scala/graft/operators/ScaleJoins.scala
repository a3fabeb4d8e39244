package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB regime.
  *
  * AQE's skew-join split handles most skew at runtime; these helpers cover
  * the cases it can't: extreme single-key skew on a non-broadcastable
  * build side (SaltedJoin) and repeated large-large joins on a stable key
  * (Bucketing — pay the shuffle once at write time, never again).
  */
object SaltedJoin {

  /** Inner equi-join with the left (skewed/fact) side salted.
    *
    * Each left row gets a deterministic salt derived from its full row
    * hash (content-deterministic — no rand(), so retries/speculative
    * tasks agree); the right side is replicated once per salt. A hot key's
    * rows then spread over `nSalts` reducers instead of one. Cost: right
    * side shuffles ×nSalts — use for dimension-ish right sides too big to
    * broadcast but far smaller than the fact side.
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}

object Bucketing {

  /** Write `df` as a bucketed+sorted table: the one-time shuffle that
    * makes every future equi-join on `key` co-located (no Exchange, no
    * Sort in the join plan — verified in BucketingSpec). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Co-located join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Hive-style partitioned layout: one directory per partition value, so
    * a filter on the partition column prunes whole directories before any
    * IO (`PartitionFilters` in the scan — verified in ScaleJoinsSpec).
    * The partition column should be low-cardinality (date, region,
    * source); at 100 TB this is the difference between scanning one day
    * and scanning the lake. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
