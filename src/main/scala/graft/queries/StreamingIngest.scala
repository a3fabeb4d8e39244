package graft.queries

import java.nio.file.Files

import graft.sources.ShardedLog
import graft.streaming.KinesisEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** End-to-end streaming-ingest measurement as a declared query: seed a
  * 4-shard log with 20k records, run the full engine pipeline (source →
  * text parse → continuous view) to completion, return the final counts.
  *
  * Output is deterministic (100 payloads × 200 each) and hash-compared
  * against a constants-only DuckDB oracle (see [[oracle]] — the oracle
  * can't observe the engine's temp dirs, but it CAN state the known
  * expected result); timing lands in the bench JSON, making single-node
  * ingest throughput comparable round-over-round against the reference's
  * ~4,000 records/s/shard design ceiling (BASELINE.md).
  */
object StreamingIngest {

  type Qf = (SparkSession, String) => DataFrame

  /** 20k records ≈ one microbatch per shard at batchsize 5000, so the
    * default drain time is startup-dominated (query planning + first
    * trigger); the official artifact stays comparable round-over-round.
    * Override GRAFT_INGEST_RECORDS (e.g. 100000 = 5 batches/shard) to
    * measure steady-state throughput with startup amortized. */
  private val N_RECORDS =
    sys.env.get("GRAFT_INGEST_RECORDS").map(_.toInt).getOrElse(20000)
  /** Records per shard per micro-batch (the reference's GetRecords limit
    * knob). Throughput is per-trigger-overhead bound, so it scales with
    * this, not with total records — override to demonstrate. */
  private val BATCHSIZE =
    sys.env.get("GRAFT_INGEST_BATCHSIZE").map(_.toInt).getOrElse(5000)
  private val N_SHARDS = 4

  /** Phase timings of the most recent q_stream_ingest run. The wall-clock
    * of this query has swung 2.6→42.7 s across rounds of IDENTICAL code
    * (streaming trigger waits amplify under box contention), so the bench
    * reports throughput and the phase split alongside raw seconds — a
    * contaminated run is then self-evident from the artifact instead of
    * masquerading as a regression. */
  final case class Stats(records: Long, seedS: Double, setupS: Double,
                         drainS: Double, stopS: Double) {
    def recPerS: Double = if (drainS > 0) records / drainS else 0.0
  }
  @volatile var lastStats: Option[Stats] = None

  val queries: Map[String, Qf] = Map(
    "q_stream_ingest" -> ((s, _) => {
      val root = Files.createTempDirectory("graft-ingest").toString
      val meta = Files.createTempDirectory("graft-ingest-meta").toString
      try {
        val t0 = System.nanoTime()
        for (sh <- 0 until N_SHARDS)
          ShardedLog.append(s"$root/stream", sh,
            (sh until N_RECORDS by N_SHARDS).map { i =>
              val p = s"foo${i % 100}"; (p, p)
            })
        val t1 = System.nanoTime()
        val eng = new KinesisEngine(s, meta)
        eng.addEndpoint("bench-ep", "local", url = root)
        eng.createStream("bench_stream",
          StructType(Seq(StructField("payload", StringType))))
        eng.createContinuousView("bench_ingest_view", "bench_stream",
          _.groupBy("payload").count())
        val t1b = System.nanoTime()
        // parallelism=4: one task per shard (the reference's worker knob);
        // the view materializes incrementally (update-mode parquet deltas),
        // so the bench times the scale path, not the driver memory sink.
        // Backfill = Trigger.AvailableNow: the queries snapshot the shard
        // ends, drain up to them, and STOP THEMSELVES — no polling wait to
        // amplify under box contention (the r5 bench measured 42.7 s for
        // this query purely from trigger-wait pile-up).
        eng.consumeBackfill("bench-ep", "stream", "bench_stream",
          format = "text", batchsize = BATCHSIZE, parallelism = 4)
        val t2 = System.nanoTime()
        eng.consumeEndAll() // no-op after a backfill; kept for symmetry
        // the result is 100 tiny rows: pin them driver-side so the temp
        // dirs can be deleted NOW rather than leak per bench iteration
        // (the leak polluted the queries benched after this one)
        val out = eng.viewTable("bench_ingest_view").orderBy("payload")
        val rows = out.collect().toIndexedSeq
        val t3 = System.nanoTime()
        lastStats = Some(Stats(N_RECORDS,
          seedS = (t1 - t0) / 1e9, setupS = (t1b - t1) / 1e9,
          drainS = (t2 - t1b) / 1e9, stopS = (t3 - t2) / 1e9))
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          out.schema)
      } finally {
        graft.Fs.rmTree(new java.io.File(root))
        graft.Fs.rmTree(new java.io.File(meta))
      }
    })
  )

  /** The end-to-end ingest RESULT is a known constant (payloads foo0…foo99,
    * 20000/100 = 200 records each), so the oracle states it as a
    * constants-only query: the driver's hash-compare then verifies the full
    * seed → source → parse → continuous-view pipeline produced exactly the
    * expected counts, not merely >0 rows. Pins the DEFAULT config — the
    * GRAFT_INGEST_* env knobs are local-iteration-only and must not be set
    * for a Verify run. */
  val oracle: Map[String, String] = Map(
    "q_stream_ingest" ->
      """SELECT 'foo' || CAST(i AS VARCHAR) AS payload,
                CAST(200 AS BIGINT) AS "count"
         FROM (SELECT unnest(range(100)) AS i)
         ORDER BY payload"""
  )
}
