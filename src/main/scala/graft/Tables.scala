package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-generated parquet tables (TESTDATA.md).
  *
  * All query entry points receive a scale-factor directory and read the
  * tables lazily; Catalyst prunes columns/filters down to the parquet scan,
  * so at 100 TB only the referenced columns/row-groups are read.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // safety net: queries using graft_md5h/graft_cosine must resolve even
    // in sessions built without the GraftExtensions config
    org.apache.spark.sql.GraftRegistrar.register(spark)
    // The driver has shipped events.ts under two physical encodings across
    // rounds: TIMESTAMP(NANOS) — which Spark 4 refuses to read natively, so
    // we read nanos-as-long and truncate to µs (exactly what DuckDB's reader
    // does) — and plain timestamp[us], which Spark infers as TIMESTAMP_NTZ.
    // Branch on the LOADED schema rather than assuming either encoding, and
    // normalise both to session-TZ TIMESTAMP (sessions run UTC) so every
    // downstream query and the DuckDB oracle see identical wall-clock values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else df
  }

  val ALL = Seq("region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view so the whole engine surface
    * is reachable from `spark.sql(...)` — the interface the reference's
    * users actually use. */
  def registerAll(s: SparkSession, d: String): Unit =
    ALL.foreach(n => apply(s, d, n).createOrReplaceTempView(n))

  /** Exact row count of a test table from parquet FOOTER metadata — no
    * Spark job (ADVICE r16 #2: an eager `.count()` inside a query BUILDER
    * ran a full scan during mere plan construction). Footer record counts
    * are definitionally equal to `count(*)`, so a knob default keyed on
    * this matches the oracle's `count(*)` guard bit-for-bit. Cost: one
    * driver-side footer read per file — the catalog-statistics lookup a
    * production deployment would use, in file form. */
  def parquetRowCount(s: SparkSession, dir: String, name: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    parquetDataFiles(s, dir, name).map { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** The DATA files of a test table's parquet directory (recursive,
    * `_SUCCESS`/hidden files excluded) — the ONE definition of "the
    * corpus's files", shared by [[parquetRowCount]] and the ANN index
    * fingerprint so the two can't silently diverge (review r17). */
  def parquetDataFiles(s: SparkSession, dir: String,
                       name: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val conf = s.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val it = root.getFileSystem(conf).listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.LocatedFileStatus]()
    while (it.hasNext) {
      val st = it.next()
      val nm = st.getPath.getName
      if (st.isFile && !nm.startsWith("_") && !nm.startsWith(".")) buf += st
    }
    buf.toSeq
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** Shared helpers for oracle-deterministic numeric output.
  *
  * Rationale: double summation is order-dependent, and Spark (multi-partition
  * partial aggregation) and DuckDB (single-threaded) will sum in different
  * orders. All monetary columns in the test data are exact 2-decimal values,
  * so products with (1-discount)/(1+tax) are exact 4/6-decimal values; casting
  * to a decimal type with enough scale is lossless-after-rounding-noise and
  * makes the sum exact and order-independent on BOTH engines. The final cast
  * back to double is deterministic (round-to-nearest of an exact decimal).
  */
object Q {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Exact, order-independent sum of a ≤4-decimal double column. */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact, order-independent sum of a ≤6-decimal double column. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Order-independent average: exact decimal sum / count. */
  def davg4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1))

  /** Boundary-proof 4-decimal rounding for NON-NEGATIVE ratios of small
    * integers (stopword ratios, Jaccard, quality scores). Such ratios land
    * exactly on x.xxxx5 half-way points, where Spark's BigDecimal HALF_UP
    * and DuckDB's round() can disagree on the underlying binary double
    * (observed at sf0.1: quality 0.9362 vs 0.9363 on 6 rows). floor(x·1e4
    * + 0.5)/1e4 is pure IEEE arithmetic — identical on both engines.
    * SQL equivalent: [[r4Sql]]. */
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** DuckDB-side twin of [[r4]]: splice around a non-negative expression. */
  def r4Sql(expr: String): String = s"floor(($expr) * 10000.0 + 0.5) / 10000.0"
}
