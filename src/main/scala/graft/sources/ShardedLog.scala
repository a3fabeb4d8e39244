package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Emulated sharded record log — the Kinesis-wire-protocol stand-in.
  *
  * Layout: `<path>/shard-<i>.log`, one record per line
  * (`partitionKey\tdata`, both fields backslash-escaped so payloads
  * containing tab/newline survive framing — the reference treats records
  * as opaque bytes, kinesis_consumer.h:65-69); a record's sequence number
  * is its line index. This models the reference's
  * shard/sequence-number/iterator surface (reference
  * kinesis_consumer.cpp:200-242 shard discovery, 296-325 shard iterators,
  * 364-434 GetRecords loop) without the AWS SDK (offline env — see
  * SURVEY.md §0).
  *
  * Spark-native mapping:
  *  - shard discovery → `planInputPartitions` (one InputPartition per
  *    shard, so executor tasks are the per-shard reader threads);
  *  - per-(consumer, shard) seqnum checkpoints → the streaming offset log
  *    ({shard → [bytePos, nextSeq]} JSON), committed by the engine's
  *    single commit log — strictly stronger than the reference's
  *    two-transaction COPY-then-upsert (pipeline_kinesis.c:738-758);
  *  - `GetRecords(limit=batchsize)` → `batchsize` option capping records
  *    per shard per micro-batch (kinesis_consumer.cpp:375-376);
  *  - start positions trim_horizon | latest | after_sequence_number:<n>
  *    (kinesis_consumer.cpp:259-291) → `startingposition` option.
  *
  * Scale design — offsets are BYTE positions (plus the record index for
  * seqnum semantics), so nothing ever re-reads a file prefix:
  *  - the driver's `latestOffset` scans only [lastOffset, lastOffset +
  *    batchsize records) of each shard — per-trigger cost is O(admitted
  *    batch), not O(total shard file);
  *  - `reportLatestOffset` advances a monotone in-memory tail cache by
  *    scanning only bytes appended since the previous call;
  *  - each `PartitionReader` seeks straight to its slice's first byte —
  *    cumulative read cost over a stream's lifetime is O(data), where the
  *    old line-index scheme re-read every prefix (O(n²)) and silently
  *    truncated past 2³¹ records via `.toInt`.
  */
object ShardedLog {
  val SCHEMA: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("partition_key", StringType, nullable = true),
    StructField("data", StringType, nullable = true),
    StructField("approximate_arrival_timestamp", TimestampType, nullable = false)))

  val FORMAT = "graft.sources.ShardedLogProvider"

  /** Position within one shard: byte offset (for seeking) and record
    * count (the user-visible sequence number). `bytes` always sits on a
    * record boundary. */
  case class ShardPos(bytes: Long, recs: Long)

  def shardFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("shard-") && f.getName.endsWith(".log"))
      .sortBy(_.getName).toSeq
  }

  // --- record framing ------------------------------------------------------
  // One record per '\n'-terminated line, fields separated by a literal
  // tab; tab/newline/CR/backslash inside a field are backslash-escaped, so
  // arbitrary payloads round-trip and a raw 0x0A byte in the file is
  // always a record boundary (UTF-8 continuation bytes never equal 0x0A).

  def escField(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def unescField(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); case 'n' => sb.append('\n')
          case 'r' => sb.append('\r'); case '\\' => sb.append('\\')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Test/demo helper: append records to one shard (`put-record` analog).
    * Writes UTF-8 explicitly — FileWriter's platform-default charset would
    * silently mangle non-ASCII payloads on a C-locale JVM while the reader
    * always decodes UTF-8. */
  def append(dir: String, shard: Int, records: Seq[(String, String)]): Unit = {
    val d = new java.io.File(dir); d.mkdirs()
    val f = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(new java.io.File(d, s"shard-$shard.log"), true),
      java.nio.charset.StandardCharsets.UTF_8)
    try records.foreach { case (pk, data) =>
      val line = if (pk == null) escField(data)
                 else s"${escField(pk)}\t${escField(data)}"
      f.write(line + "\n")
    }
    finally f.close()
  }

  /** Test instrumentation: cumulative bytes consumed by driver-side
    * [[scanForward]] calls. Lets specs assert the scale contract directly:
    * per-trigger scan cost must track the appended delta, not the file
    * size. */
  val bytesScanned = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Scan `file` forward from byte `fromBytes`, counting newline-terminated
    * records, stopping after `maxRecs` records or EOF. Returns the position
    * after the last counted record's newline (a trailing partial line —
    * e.g. a concurrent writer mid-append — is never included). */
  def scanForward(file: java.io.File, fromBytes: Long, maxRecs: Long): ShardPos = {
    val in = new java.io.FileInputStream(file)
    try {
      in.getChannel.position(fromBytes)
      val buf = new Array[Byte](1 << 16)
      var pos = fromBytes
      var lastBoundary = fromBytes
      var recs = 0L
      var n = in.read(buf)
      while (n > 0 && recs < maxRecs) {
        var i = 0
        while (i < n && recs < maxRecs) {
          if (buf(i) == '\n') { recs += 1; lastBoundary = pos + i + 1 }
          i += 1
        }
        pos += i
        n = if (recs < maxRecs && i == n) in.read(buf) else 0
      }
      bytesScanned.addAndGet(pos - fromBytes)
      ShardPos(lastBoundary, recs)
    } finally in.close()
  }

  /** Full positions of every shard (one complete scan — observability /
    * one-time initialization only; the streaming hot path never calls
    * this). */
  def latestPositions(dir: String): Map[String, ShardPos] =
    shardFiles(dir).map(f => f.getName -> scanForward(f, 0L, Long.MaxValue)).toMap

  /** Record counts per shard (full scan; see [[latestPositions]]). */
  def lineCounts(dir: String): Map[String, Long] =
    latestPositions(dir).map { case (k, v) => k -> v.recs }

  /** {"shard-0.log":[120,12],...} with sorted keys; [bytePos, nextSeq]. */
  def offsetJson(m: Map[String, ShardPos]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, p) => s""""$k":[${p.bytes},${p.recs}]""" }
      .mkString("{", ",", "}")

  def parseOffsetJson(s: String): Map[String, ShardPos] =
    s.trim.stripPrefix("{").stripSuffix("}").split("""(?<=\]),""").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        val Array(b, r) = v.trim.stripPrefix("[").stripSuffix("]").split(",", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          ShardPos(b.trim.toLong, r.trim.toLong)
      }.toMap
}

case class ShardedLogOffset(pos: Map[String, ShardedLog.ShardPos]) extends Offset {
  override def json(): String = ShardedLog.offsetJson(pos)
}

class ShardedLogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ShardedLog.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShardedLogTable(properties.get("path"),
      Option(properties.get("batchsize")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("startingposition")).getOrElse("trim_horizon"))
}

class ShardedLogTable(path: String, batchsize: Long, startPos: String)
    extends Table with SupportsRead {
  require(path != null, "ShardedLog requires a 'path' option")
  override def name(): String = s"sharded_log($path)"
  override def schema(): StructType = ShardedLog.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ShardedLogScan(path, batchsize, startPos)
}

class ShardedLogScan(path: String, batchsize: Long, startPos: String) extends Scan {
  override def readSchema(): StructType = ShardedLog.SCHEMA
  override def description(): String = s"ShardedLog($path)"

  override def toBatch: Batch = new Batch {
    // one whole-shard slice each; no pre-count needed — the reader streams
    // to the file's current length and derives seqnums as it goes
    override def planInputPartitions(): Array[InputPartition] =
      ShardedLog.shardFiles(path).map { f =>
        ShardedLogPartition(path, f.getName, 0L, f.length(), 0L): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = ShardedLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedLogMicroBatchStream(path, batchsize, startPos)
}

class ShardedLogMicroBatchStream(path: String, batchsize: Long, startPos: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  import ShardedLog.ShardPos

  // Monotone tail cache: latest known end-of-shard positions. Every
  // advance scans only bytes appended since the previous call, so the
  // driver's cumulative scan cost is O(data ingested), never O(data ×
  // triggers).
  private val tail = scala.collection.mutable.Map[String, ShardPos]()

  private def advanceTail(): Map[String, ShardPos] = synchronized {
    ShardedLog.shardFiles(path).foreach { f =>
      val t = tail.getOrElse(f.getName, ShardPos(0L, 0L))
      if (f.length() > t.bytes) {
        val d = ShardedLog.scanForward(f, t.bytes, Long.MaxValue)
        tail(f.getName) = ShardPos(d.bytes, t.recs + d.recs)
      }
    }
    tail.toMap
  }

  override def initialOffset(): Offset = {
    val init = startPos.toLowerCase match {
      case "trim_horizon" =>
        ShardedLog.shardFiles(path).map(f => f.getName -> ShardPos(0L, 0L)).toMap
      case "latest" => advanceTail()
      case p if p.startsWith("after_sequence_number:") =>
        val n = p.substring("after_sequence_number:".length).toLong
        // one-time bounded scan: byte position of record n+1 (or EOF)
        ShardedLog.shardFiles(path).map { f =>
          val d = ShardedLog.scanForward(f, 0L, n + 1)
          f.getName -> ShardPos(d.bytes, d.recs)
        }.toMap
      case other => throw new IllegalArgumentException(
        s"unknown startingposition '$other' (trim_horizon|latest|after_sequence_number:<n>)")
    }
    ShardedLogOffset(init)
  }

  // Admission control separates "what this trigger may ingest" (capped at
  // batchsize per shard — the GetRecords limit) from "what exists" —
  // Spark keeps triggering until the two agree, so processAllAvailable
  // drains a backlog through multiple capped micro-batches.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardedLogOffset].pos
    val next = ShardedLog.shardFiles(path).map { f =>
      val p = s.getOrElse(f.getName, ShardPos(0L, 0L))
      if (f.length() > p.bytes) {
        // scan only the admitted window: ≤ batchsize records past `start`
        val d = ShardedLog.scanForward(f, p.bytes, batchsize)
        f.getName -> ShardPos(d.bytes, p.recs + d.recs)
      } else f.getName -> p
    }.toMap
    ShardedLogOffset(next)
  }

  override def reportLatestOffset(): Offset = ShardedLogOffset(advanceTail())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    ShardedLogOffset(ShardedLog.parseOffsetJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardedLogOffset].pos
    val e = end.asInstanceOf[ShardedLogOffset].pos
    e.toSeq.sortBy(_._1).flatMap { case (shard, until) =>
      val from = s.getOrElse(shard, ShardPos(0L, 0L))
      if (until.bytes > from.bytes)
        Some(ShardedLogPartition(path, shard, from.bytes, until.bytes, from.recs): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ShardedLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One shard slice [fromBytes, untilBytes) — the unit of parallelism,
  * exactly the reference's shard→worker assignment
  * (pipeline_kinesis.c:439-451) with Spark's scheduler in place of the
  * modulo loop. `fromRec` seeds the sequence numbers for the slice; both
  * bounds sit on record boundaries. */
case class ShardedLogPartition(path: String, shard: String,
                               fromBytes: Long, untilBytes: Long, fromRec: Long)
    extends InputPartition

object ShardedLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardedLogPartition]
    new PartitionReader[InternalRow] {
      // seek straight to the slice: no prefix re-read, Long-safe positions
      private val in = new java.io.FileInputStream(new java.io.File(p.path, p.shard))
      in.getChannel.position(p.fromBytes)
      private val buf = new java.io.BufferedInputStream(in, 1 << 16)
      private var remaining = p.untilBytes - p.fromBytes
      private var seq = p.fromRec - 1
      private var line: String = _

      private def readLine(): String = {
        if (remaining <= 0) return null
        val out = new java.io.ByteArrayOutputStream(128)
        var b = 0
        while (remaining > 0 && { b = buf.read(); b >= 0 } && b != '\n') {
          out.write(b); remaining -= 1
        }
        if (b == '\n') { remaining -= 1 }
        else { remaining = 0; return null } // EOF before '\n': drop partial tail
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      }

      override def next(): Boolean = {
        line = readLine()
        if (line != null) { seq += 1; true } else false
      }

      override def get(): InternalRow = {
        val tab = line.indexOf('\t') // fields are escaped: first raw tab is the separator
        val (pk, data) = if (tab >= 0) (line.substring(0, tab), line.substring(tab + 1))
                         else (null, line)
        InternalRow(
          UTF8String.fromString(p.shard.stripSuffix(".log")),
          seq,
          if (pk == null) null else UTF8String.fromString(ShardedLog.unescField(pk)),
          UTF8String.fromString(ShardedLog.unescField(data)),
          System.currentTimeMillis() * 1000L)
      }

      override def close(): Unit = buf.close()
    }
  }
}
