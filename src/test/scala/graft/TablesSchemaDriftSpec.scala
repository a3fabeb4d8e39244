package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 regression gate: the driver regenerated events.parquet with
  * `ts: timestamp[us]` where earlier rounds shipped TIMESTAMP(NANOS)
  * (read as int64 via nanosAsLong), and a hard-coded `ts div 1000` in
  * Tables broke 24 queries at analysis. Tables now branches on the loaded
  * schema; this spec pins that behavior by writing tiny events tables in
  * BOTH encodings and asserting every declared query still analyzes (and a
  * sample fully executes) against each.
  *
  * Note: Spark cannot write parquet TIMESTAMP(NANOS) itself, so the legacy
  * encoding is modeled as a plain int64 ns column — exactly what the
  * nanosAsLong reader hands Tables, i.e. the same LongType branch.
  */
class TablesSchemaDriftSpec extends SparkSpec {

  /** Build a dir that mirrors sf0.001 but swaps in a synthetic events table
    * whose `ts` uses the given writer. */
  private def mkDir(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = tmpDir("drift")
    for (t <- Tables.ALL if t != "events")
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sf0001/$t.parquet"))
    import spark.implicits._
    val base = (1 to 40).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"),
       (i % 7).toLong, Seq("click", "view", "purchase")(i % 3), i * 1.5,
       s"""{"k":$i,"s":"v$i"}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    encode(base).coalesce(1).write.parquet(s"$dir/events.parquet.tmp")
    // Tables reads "$dir/events.parquet"; rename the part dir to that name
    val tmp = Paths.get(s"$dir/events.parquet.tmp")
    Files.move(tmp, Paths.get(s"$dir/events.parquet"))
    dir
  }

  private val encodings: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
    // legacy: ns since epoch as int64 (what nanosAsLong yields for NANOS)
    "ns-as-long" -> (df => df.withColumn("ts",
      (unix_micros(col("ts").cast(TimestampType)) * lit(1000L)))),
    // current driver encoding: timestamp[us] without UTC adjustment → NTZ
    "timestamp-ntz" -> (df => df.withColumn("ts", to_timestamp_ntz(col("ts")))),
    // future-proof: plain session-TZ timestamp passes through unchanged
    "timestamp-ltz" -> (df => df.withColumn("ts", col("ts").cast(TimestampType)))
  )

  test("date-column drift: lineitem/orders temporal columns as DATE still analyze") {
    // The same generator change that turned events.ts into timestamp[us]
    // could plausibly ship l_shipdate / o_orderdate as date32 next. Output
    // -type drift is symmetric (Spark dump and DuckDB oracle read the same
    // parquet), so the r12 failure mode to guard against is ANALYSIS
    // breakage — mixed-type comparisons/unions inside the queries.
    val dir = tmpDir("datedrift")
    for (t <- Tables.ALL if t != "lineitem" && t != "orders")
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sf0001/$t.parquet"))
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("l_shipdate", col("l_shipdate").cast(DateType))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_orderdate", col("o_orderdate").cast(DateType))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      if (name == "q_stream_ingest") None // reads no sfDir tables
      else try { fn(spark, dir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed analysis on DATE drift:\n${failures.mkString("\n")}")
  }

  for ((encName, enc) <- encodings) {
    test(s"events ts encoding '$encName': Tables normalises to TimestampType and all queries analyze") {
      val dir = mkDir(enc)
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"Tables must normalise events.ts to TIMESTAMP, got ${ev.schema("ts").dataType}")
      // all encodings must agree on wall-clock values (UTC session)
      val first = ev.orderBy("event_id").select("ts").as[Timestamp](
        org.apache.spark.sql.Encoders.TIMESTAMP).head()
      assert(first == Timestamp.valueOf("2024-01-01 00:01:00"), s"got $first")
      // every declared query must at least pass analysis against this dir.
      // q_stream_ingest is excluded: its builder eagerly runs the whole
      // 20k-record ingest engine and reads no sfDir tables at all — pure
      // cost, zero coverage for the schema drift under test.
      val failures = SparkEntry.queries.flatMap { case (name, fn) =>
        if (name == "q_stream_ingest") None
        else try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
        }
      }
      assert(failures.isEmpty, s"${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
      // and a representative events-heavy sample must fully execute
      for (q <- Seq("q_window_tumbling", "q_join_asof", "q_funnel", "q_json_funcs"))
        assert(SparkEntry.queries(q)(spark, dir).count() > 0, s"$q returned 0 rows")
    }
  }

  test("embedding dimension stays 64 (unrolled vector ops + oracles assume it)") {
    // Dim is DATA, not schema (array length), so schema checks can't catch
    // a regeneration that changes it — and the failure mode is silent:
    // VectorOps.dot/norm2 unroll positions 1…64 (a 128-dim corpus would
    // half-compute), q_similarity_pq's 8×8 subspace grid covers exactly
    // 64, and the trained-IVF DuckDB oracle hardcodes range(1, 65). The
    // native graft_cosine alone is length-adaptive, so a drift would break
    // queries INCONSISTENTLY — hash mismatches that look like engine bugs.
    // Fail loudly here first, naming the contract to update.
    import org.apache.spark.sql.functions._
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val dims = Tables.embeddings(spark, sf)
        .select(size(col("embedding")).as("d")).agg(min("d"), max("d")).head()
      assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
        s"$sf: embedding dims [${dims.getInt(0)}, ${dims.getInt(1)}] != 64 — " +
          "testdata regenerated with a new dimension; update VectorOps' " +
          "unrolled dim, q_similarity_pq's subspace grid, and the " +
          "trained-IVF oracle's range(1, 65) together")
    }
  }
}
