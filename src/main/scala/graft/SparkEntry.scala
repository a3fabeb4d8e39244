package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each operator key from SURVEY.md §2 to a DataFrame
  * builder over a scale-factor directory; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H1-style multi-aggregate — partial+final hash agg over lineitem.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.queries("q_agg_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ Aggregates.queries ++
      TimeWindows.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Relational2.queries ++ Relational3.queries ++
      Pipeline.queries ++ StreamingIngest.queries ++ Analytics.queries ++
      Media.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      TimeWindows.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Relational2.oracle ++ Relational3.oracle ++
      Pipeline.oracle ++ StreamingIngest.oracle ++ Analytics.oracle ++
      Media.oracle
}
