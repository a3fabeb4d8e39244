package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import graft.sources.ShardedLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** Control-plane facade with the reference extension's API surface
  * (reference pipeline_kinesis--0.9.0.sql:33-83), re-expressed as plain
  * Scala methods over Structured Streaming:
  *
  *  - `addEndpoint`/`removeEndpoint` — endpoints catalog (C1/C2;
  *    pipeline_kinesis.c:120-188). `url` points at a sharded-log root dir.
  *  - `createStream` — CREATE STREAM: a named relation schema; the
  *    implicit `arrival_timestamp` column is injected at ingest and never
  *    user-supplied (pipeline_kinesis.c:249-256).
  *  - `createContinuousView` — a standing aggregation over a stream
  *    (PipelineDB CV, reference README.md:66), materialized to an
  *    in-memory queryable sink (`spark.table(viewName)`).
  *  - `consumeBegin`/`consumeEnd`(`All`) — upsert the consumer (C3),
  *    start/stop one StreamingQuery per continuous view on the target
  *    relation (the bgworker-launch analog, pipeline_kinesis.c:774-823;
  *    query handles play the shmem-registry role, D5).
  *  - `seqnums` — per-(consumer, shard) next sequence number, read from
  *    the streaming checkpoint's *committed* batches only (commit-gated,
  *    like the reference's upsert-after-COPY), plus a
  *    records_behind_latest lag column — the observability view of
  *    pipeline_kinesis--0.9.0.sql:26-31 / README.md:119-126 and the
  *    millisBehindLatest analog of kinesis_consumer.cpp:446-465.
  *
  * Catalog durability: endpoints, consumers, stream schemas and
  * SQL-declared views all persist under metaDir — a fresh engine over the
  * same metaDir resumes ingestion with `consumeBeginAll()` alone
  * (pipeline_kinesis.c:1038-1079). Closure-based views are application
  * code and must be re-registered by it.
  *
  * Delivery: the reference commits seqnums in a second transaction after
  * COPY (at-least-once, with poison batches dropped —
  * pipeline_kinesis.c:738-758). Here source replay + checkpointed state
  * give exactly-once view updates; parse failures are PERMISSIVE (nulls),
  * not batch drops.
  */
class KinesisEngine(spark: SparkSession, metaDir: String) {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[KinesisEngine])

  case class Endpoint(name: String, region: String, credfile: String, url: String)
  case class Consumer(id: Int, endpoint: String, stream: String, relation: String,
                      format: String, delimiter: String, quote: String, escape: String,
                      batchsize: Long, parallelism: Int, startSeq: Long)

  private case class View(relation: String, agg: DataFrame => DataFrame,
                          materialize: String, sql: Option[String])

  private val endpoints = mutable.LinkedHashMap[String, Endpoint]()
  private val streams = mutable.LinkedHashMap[String, StructType]()
  private val views = mutable.LinkedHashMap[String, View]()
  private val consumers = mutable.LinkedHashMap[(String, String, String), Consumer]()
  private val running = mutable.LinkedHashMap[Int, Seq[StreamingQuery]]()
  private var nextId = 1

  Files.createDirectories(Paths.get(metaDir))
  loadCatalog()

  // --- catalog persistence (the reference's endpoints/consumers tables
  // plus stream schemas and SQL view definitions,
  // pipeline_kinesis--0.9.0.sql:4-24): tab-separated rows under metaDir so
  // a fresh engine over the same metaDir restarts ingestion from the
  // catalog alone (consume_begin_all parity, pipeline_kinesis.c:1038-1079).
  // Only SQL-declared views persist — a closure view is application code
  // and must be re-registered by that code, like any UDF.

  // EVERY string field is base64-wrapped: the csv delimiter defaults to a
  // literal tab, and user-chosen names (endpoint/stream/relation/format)
  // may themselves contain tab or newline — either would corrupt a
  // tab-separated catalog row.
  private def esc(s: String): String =
    if (s == null) "-"
    else java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unesc(s: String): String =
    if (s == "-") null
    else new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private def saveCatalog(): Unit = {
    val ep = endpoints.values.map(e =>
      Seq(esc(e.name), esc(e.region), esc(e.credfile), esc(e.url)).mkString("\t"))
    Files.writeString(Paths.get(metaDir, "endpoints.tsv"), ep.mkString("\n"))
    val cs = consumers.values.map(c =>
      Seq(c.id.toString, esc(c.endpoint), esc(c.stream), esc(c.relation),
          esc(c.format), esc(c.delimiter), esc(c.quote), esc(c.escape),
          c.batchsize.toString, c.parallelism.toString, c.startSeq.toString)
        .mkString("\t"))
    Files.writeString(Paths.get(metaDir, "consumers.tsv"), cs.mkString("\n"))
    val st = streams.map { case (rel, schema) =>
      Seq(esc(rel), esc(schema.json)).mkString("\t")
    }
    Files.writeString(Paths.get(metaDir, "streams.tsv"), st.mkString("\n"))
    val vw = views.collect { case (name, v) if v.sql.isDefined =>
      Seq(esc(name), esc(v.relation), esc(v.sql.get), esc(v.materialize))
        .mkString("\t")
    }
    Files.writeString(Paths.get(metaDir, "views.tsv"), vw.mkString("\n"))
  }

  private def loadCatalog(): Unit = {
    def rows(file: String): Seq[Array[String]] = {
      val p = Paths.get(metaDir, file)
      if (!Files.exists(p)) Nil
      else Files.readString(p).split("\n").filter(_.nonEmpty)
        .map(_.split("\t", -1)).toSeq
    }
    rows("endpoints.tsv").foreach { f =>
      val name = unesc(f(0))
      endpoints(name) = Endpoint(name, unesc(f(1)), unesc(f(2)), unesc(f(3)))
    }
    rows("consumers.tsv").foreach { f =>
      val c = Consumer(f(0).toInt, unesc(f(1)), unesc(f(2)), unesc(f(3)),
        unesc(f(4)), unesc(f(5)), unesc(f(6)), unesc(f(7)), f(8).toLong,
        f(9).toInt, f(10).toLong)
      consumers((c.endpoint, c.stream, c.relation)) = c
      nextId = math.max(nextId, c.id + 1)
    }
    rows("streams.tsv").foreach { f =>
      streams(unesc(f(0))) =
        org.apache.spark.sql.types.DataType.fromJson(unesc(f(1)))
          .asInstanceOf[StructType]
    }
    rows("views.tsv").foreach { f =>
      val (name, relation, sql, mat) =
        (unesc(f(0)), unesc(f(1)), unesc(f(2)), unesc(f(3)))
      views(name) = View(relation, sqlAgg(relation, sql), mat, Some(sql))
    }
  }

  // --- catalog (C1/C2/C3) -------------------------------------------------

  /** Catalog inspection (the reference's SELECT over pipeline_kinesis
    * catalog tables). */
  def listEndpoints: Seq[Endpoint] = synchronized(endpoints.values.toSeq)
  def listConsumers: Seq[Consumer] = synchronized(consumers.values.toSeq)
  def listStreams: Map[String, StructType] = synchronized(streams.toMap)
  def listViewSql: Map[String, String] =
    synchronized(views.collect { case (n, v) if v.sql.isDefined => n -> v.sql.get }.toMap)

  def addEndpoint(name: String, region: String, credfile: String = null,
                  url: String = null): Unit = synchronized {
    endpoints(name) = Endpoint(name, region, credfile, url)
    saveCatalog()
  }

  def removeEndpoint(name: String): Unit = synchronized {
    require(!consumers.valuesIterator.exists(_.endpoint == name) ||
            !running.keySet.exists(id => consumers.valuesIterator.exists(c => c.id == id && c.endpoint == name)),
      s"endpoint $name has running consumers")
    endpoints.remove(name)
    saveCatalog()
  }

  def createStream(relation: String, schema: StructType): Unit = synchronized {
    require(!schema.fieldNames.contains("arrival_timestamp"),
      "arrival_timestamp is implicit and cannot be declared") // pipeline_kinesis.c:249-256
    streams(relation) = schema
    saveCatalog()
  }

  /** @param materialize "memory" (queryable via spark.table(name); test/
    *        demo scale) or "parquet" (complete-mode snapshot per batch at
    *        metaDir/views/name via foreachBatch — the production path for
    *        compact aggregates, readable with [[viewTable]]).
    *
    * A closure view does NOT persist across engine restarts (a Scala
    * lambda has no durable representation); use
    * [[createContinuousViewSql]] for catalog-durable views. */
  def createContinuousView(name: String, relation: String,
                           agg: DataFrame => DataFrame,
                           materialize: String = "memory"): Unit = synchronized {
    require(Set("memory", "parquet")(materialize), s"materialize=$materialize")
    views(name) = View(relation, agg, materialize, None)
  }

  private def sqlAgg(relation: String, sql: String): DataFrame => DataFrame =
    df => { df.createOrReplaceTempView(relation); spark.sql(sql) }

  /** CREATE CONTINUOUS VIEW … AS <sql> — the reference's actual UX
    * (README.md:66): the view is declared as SQL over the stream
    * relation's name. The parsed stream is registered as a temp view
    * named after the relation at consume time, so the SQL references it
    * directly. SQL views persist in the catalog and are restored by a
    * fresh engine over the same metaDir. */
  def createContinuousViewSql(name: String, relation: String, sql: String,
                              materialize: String = "memory"): Unit = synchronized {
    require(Set("memory", "parquet")(materialize), s"materialize=$materialize")
    views(name) = View(relation, sqlAgg(relation, sql), materialize, Some(sql))
    saveCatalog()
  }

  /** Read a parquet-materialized view's current snapshot. */
  def viewTable(name: String): DataFrame =
    spark.read.parquet(s"$metaDir/views/$name")

  /** Read the persistent stream table (every ingested row of a relation —
    * the B4 COPY-into-stream analog, parquet-append with its own
    * checkpoint). */
  def streamTable(relation: String): DataFrame =
    spark.read.schema(streams(relation)
        .add(StructField("arrival_timestamp", TimestampType)))
      .parquet(s"$metaDir/tables/$relation")

  /** PipelineDB sliding-window view analog (`WITH (sw = '5 minutes')`):
    * a query-time view over only the rows that arrived within `width` of
    * now — results age out continuously without any state mutation, the
    * same read-time-filter semantics PipelineDB uses for sw views. */
  def slidingView(relation: String, width: String): DataFrame =
    streamTable(relation).filter(
      col("arrival_timestamp") >= current_timestamp() - expr(s"INTERVAL $width"))

  /** PipelineDB TTL analog: physically drop stream-table rows whose
    * arrival_timestamp is older than the TTL (rewrite + swap, same
    * mechanics as compaction; consumer must be stopped). */
  def expireStreamTable(relation: String, ttl: String,
                        targetPartitions: Int = 8): Unit = {
    synchronized {
      val active = consumers.values.exists(c => c.relation == relation &&
        running.contains(c.id))
      require(!active, s"stop consumers of '$relation' before expiring")
    }
    val dir = Paths.get(s"$metaDir/tables/$relation")
    val tmp = Paths.get(s"$metaDir/tables/__expire_$relation")
    val old = Paths.get(s"$metaDir/tables/__oldx_$relation")
    streamTable(relation)
      .filter(col("arrival_timestamp") >=
              current_timestamp() - expr(s"INTERVAL $ttl"))
      .repartition(targetPartitions)
      .write.mode("overwrite").parquet(tmp.toString)
    Files.move(dir, old)
    Files.move(tmp, dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(old.toFile)
  }

  /** Compact a stream table: streaming append writes one file per
    * micro-batch per shard, which at continuous-ingest scale degrades
    * every downstream scan (the small-files problem). Rewrites the table
    * into `targetPartitions` files and swaps directories. Refuses while
    * the relation's consumer is running (the sink would keep appending
    * into the replaced directory). */
  def compactStreamTable(relation: String, targetPartitions: Int = 8): Unit = {
    synchronized {
      val active = consumers.values.exists(c => c.relation == relation &&
        running.contains(c.id))
      require(!active, s"stop consumers of '$relation' before compacting")
    }
    val dir = Paths.get(s"$metaDir/tables/$relation")
    val tmp = Paths.get(s"$metaDir/tables/__compact_$relation")
    val old = Paths.get(s"$metaDir/tables/__old_$relation")
    streamTable(relation).repartition(targetPartitions)
      .write.mode("overwrite").parquet(tmp.toString)
    Files.move(dir, old)
    Files.move(tmp, dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(old.toFile)
  }

  // --- data plane ---------------------------------------------------------

  /** The parsed stream for a consumer config: source → parse (B2) →
    * implicit-column injection (B3). Exposed for tests/batch inspection. */
  private def parsedStream(c: Consumer, url: String): DataFrame = {
    val schema = streams(c.relation)
    val raw = spark.readStream.format(ShardedLog.FORMAT)
      .option("path", s"$url/${c.stream}")
      .option("batchsize", c.batchsize)
      .option("startingposition", c.startPosOption)
      .load()
    val parsed = c.format match {
      case "text" =>
        // text COPY: the whole record lands in the relation's single
        // payload column (reference README.md:65 `foo_stream (payload text)`)
        require(schema.fields.length == 1, "text format needs a 1-column stream")
        raw.select(col("data").cast(schema.fields.head.dataType)
          .as(schema.fields.head.name))
      case "csv" =>
        val opts = Map("sep" -> c.delimiter) ++
          Option(c.quote).map("quote" -> _) ++ Option(c.escape).map("escape" -> _)
        raw.select(from_csv(col("data"), schema, opts).as("r")).select(col("r.*"))
      case "json" =>
        // beyond the reference's text/csv: JSON records parsed against the
        // declared stream schema, same PERMISSIVE poison policy
        raw.select(from_json(col("data"), schema).as("r")).select(col("r.*"))
      case "binary" =>
        // opaque-bytes parity (kinesis_consumer.h:65-69): producers put
        // base64(payload); the stream column receives the raw bytes. A
        // malformed base64 record yields null (PERMISSIVE), not a dropped
        // batch.
        require(schema.fields.length == 1 &&
                schema.fields.head.dataType == org.apache.spark.sql.types.BinaryType,
          "binary format needs a 1-column BINARY stream")
        raw.select(try_to_binary(col("data"), lit("base64"))
          .as(schema.fields.head.name))
      case other => throw new IllegalArgumentException(s"format $other")
    }
    parsed.withColumn("arrival_timestamp", current_timestamp())
  }

  private implicit class ConsumerOps(c: Consumer) {
    /** start_seq → starting position, the reference's encoding: −2 =
      * trim_horizon, −1 = latest, n ≥ 0 = after_sequence_number:n
      * (pipeline_kinesis.c:587-605,922-925). Only consulted when no saved
      * seqnum (checkpoint) exists — checkpoint resume wins, matching
      * pipeline_kinesis.c:592-604. */
    def startPosOption: String = c.startSeq match {
      case -2L => "trim_horizon"
      case -1L => "latest"
      case n if n >= 0 => s"after_sequence_number:$n"
      case bad => throw new IllegalArgumentException(s"start_seq $bad")
    }
  }

  /** consume_begin_sr analog (pipeline_kinesis.c:857-948): upsert consumer,
    * launch one StreamingQuery per continuous view over the relation. */
  def consumeBegin(endpoint: String, stream: String, relation: String,
                   format: String = "text", delimiter: String = "\t",
                   quote: String = null, escape: String = null,
                   batchsize: Long = 1000L, parallelism: Int = 1,
                   startSeq: Long = -2L): Int = synchronized {
    // MAX_PROCS parity: the reference silently caps worker processes at 8
    // (pipeline_kinesis.c:54,786-791); here parallelism is advisory (tasks
    // already scale with shards) but the recorded value keeps the cap.
    val par = math.min(parallelism, 8)
    val ep = endpoints.getOrElse(endpoint, sys.error(s"no endpoint $endpoint"))
    val key = (endpoint, stream, relation)
    val c = consumers.get(key) match {
      case Some(old) => // ON CONFLICT … DO UPDATE (C3)
        val upd = old.copy(format = format, delimiter = delimiter, quote = quote,
          escape = escape, batchsize = batchsize, parallelism = par,
          startSeq = startSeq)
        consumers(key) = upd; upd
      case None =>
        val c = Consumer(nextId, endpoint, stream, relation, format, delimiter,
          quote, escape, batchsize, par, startSeq)
        nextId += 1; consumers(key) = c; c
    }
    saveCatalog()
    if (!running.contains(c.id)) {
      val df = parsedStream(c, ep.url)
      // B4: every parsed row also lands in the persistent stream table —
      // rows flow whether or not any view aggregates them, like COPY into
      // a PipelineDB stream. Plain foreachBatch append (no _spark_metadata
      // sink log): the table stays a vanilla parquet dir, so compaction
      // and external readers work; delivery on the raw table is
      // at-least-once (a batch retried between write and checkpoint commit
      // can duplicate) — exactly the reference's stream semantics
      // (pipeline_kinesis.c:754-758); views stay exactly-once via state.
      val tableQ = df.writeStream
        .queryName(s"${relation}__table")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$metaDir/tables/$relation")
        }
        .option("checkpointLocation", s"$metaDir/checkpoints/${c.id}/__table")
        .start()
      val viewQs = views.toSeq.collect { case (vname, v) if v.relation == relation =>
        val writer = v.materialize match {
          case "memory" =>
            // demo/test default; the snapshot lives on the driver
            log.warn(s"continuous view '$vname' uses the in-memory complete-mode " +
              "sink: the full aggregate accumulates on the driver. Use " +
              "materialize=\"parquet\" for high-cardinality aggregates.")
            v.agg(df).writeStream.queryName(vname)
              .outputMode("complete").format("memory")
          case "parquet" =>
            v.agg(df).writeStream.queryName(vname)
              .outputMode("complete")
              .foreachBatch { (batch: DataFrame, _: Long) =>
                batch.write.mode("overwrite")
                  .parquet(s"$metaDir/views/$vname")
              }
        }
        writer.option("checkpointLocation",
            s"$metaDir/checkpoints/${c.id}/$vname")
          .start()
      }
      running(c.id) = tableQ +: viewQs
    }
    c.id
  }

  def consumeEnd(endpoint: String, stream: String, relation: String): Unit = synchronized {
    consumers.get((endpoint, stream, relation)).foreach { c =>
      running.remove(c.id).foreach(_.foreach(_.stop())) // D3: graceful stop
    }
  }

  def consumeBeginAll(): Unit =
    consumers.values.toSeq.foreach(c => consumeBegin(c.endpoint, c.stream, c.relation,
      c.format, c.delimiter, c.quote, c.escape, c.batchsize, c.parallelism,
      c.startSeq))

  def consumeEndAll(): Unit = synchronized {
    running.values.flatten.foreach(_.stop()); running.clear() // D4
  }

  def activeQueries: Seq[StreamingQuery] = synchronized(running.values.flatten.toSeq)

  /** Block until every running view has processed all currently-available
    * records (test/demo synchronization point). */
  def processAllAvailable(): Unit = activeQueries.foreach(_.processAllAvailable())

  // --- observability (seqnums view, README.md:119-126) --------------------

  /** List a directory's entries, closing the underlying stream
    * (`Files.list` holds a file handle until closed — leaked handles
    * accumulate under repeated polling). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.exists(p)) Nil
    else {
      val s = Files.list(p)
      try { val it = s.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
            while (it.hasNext) b += it.next(); b.result() }
      finally s.close()
    }

  /** Highest batch id recorded in a checkpoint subdirectory (offsets/ or
    * commits/ — files are named by batch id). */
  private def maxBatchId(dir: java.nio.file.Path): Option[Long] = {
    val ids = listDir(dir).map(_.getFileName.toString).filter(_.forall(_.isDigit))
    if (ids.isEmpty) None else Some(ids.map(_.toLong).max)
  }

  /** Per-(consumer, shard) committed sequence number plus how far behind
    * the shard tip it is — the reference's seqnums table + the
    * millisBehindLatest metric re-expressed in records
    * (pipeline_kinesis--0.9.0.sql:26-31; kinesis_consumer.cpp:446-465).
    *
    * COMMITTED means exactly that: the reported batch's offsets are only
    * used once `commits/<id>` exists, matching the reference's
    * upsert-after-COPY semantics (pipeline_kinesis.c:543-579) — the
    * offsets log alone is a write-ahead *intent* and would over-report
    * after a crash between offset write and batch commit. */
  def seqnums: DataFrame = {
    import spark.implicits._
    val consumerById = synchronized(consumers.values.map(c => c.id -> c).toMap)
    val ids = synchronized(running.keys.toSeq)
    val rows = ids.flatMap { id =>
      val committed = listDir(Paths.get(s"$metaDir/checkpoints/$id"))
        .flatMap { vdir =>
          maxBatchId(vdir.resolve("commits")).toSeq.flatMap { batch =>
            val offF = vdir.resolve("offsets").resolve(batch.toString)
            if (!Files.exists(offF)) Nil
            else {
              // offset-log format: v1 header, metadata json, then one
              // offset json line per source — ours is the
              // {shard: [bytePos, nextSeq]} map. readAllLines closes.
              import scala.jdk.CollectionConverters._
              Files.readAllLines(offF).asScala.toSeq.drop(2)
                .filter(l => l.startsWith("{") && l.contains(":"))
                .flatMap(l => ShardedLog.parseOffsetJson(l).toSeq)
                .map { case (shard, pos) => shard -> pos.recs }
            }
          }
        }
      if (committed.isEmpty) Nil
      else {
        // Multiple standing queries (stream table + each view) checkpoint
        // independently; report the furthest-committed seqnum per shard —
        // every reported record is durably ingested by at least one query
        // (each query's own checkpoint protects the laggards from loss).
        val bestCommitted = committed.groupBy(_._1)
          .map { case (shard, xs) => shard -> xs.map(_._2).max }
        val latest = consumerById.get(id).map { c =>
          ShardedLog.lineCounts(s"${endpoints(c.endpoint).url}/${c.stream}")
        }.getOrElse(Map.empty[String, Long])
        bestCommitted.toSeq.map { case (shard, seq) =>
          val behind = math.max(latest.getOrElse(shard, seq) - seq, 0L)
          (id, shard.stripSuffix(".log"), seq, behind)
        }
      }
    }
    rows.toDF("consumer_id", "shard_id", "seqnum", "records_behind_latest")
  }
}
