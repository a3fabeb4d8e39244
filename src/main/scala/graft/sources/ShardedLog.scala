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
  * (`partitionKey\tdata`); a record's sequence number is its line index.
  * This models the reference's shard/sequence-number/iterator surface
  * (reference kinesis_consumer.cpp:200-242 shard discovery, 296-325 shard
  * iterators, 364-434 GetRecords loop) without the AWS SDK (offline env —
  * see SURVEY.md §0).
  *
  * Spark-native mapping:
  *  - shard discovery → `planInputPartitions` (one InputPartition per
  *    shard, so executor tasks are the per-shard reader threads);
  *  - per-(consumer, shard) seqnum checkpoints → the streaming offset log
  *    ({shard → nextSeq} JSON), committed by the engine's single commit
  *    log — strictly stronger than the reference's two-transaction
  *    COPY-then-upsert (pipeline_kinesis.c:738-758);
  *  - `GetRecords(limit=batchsize)` → `batchsize` option capping records
  *    per shard per micro-batch (kinesis_consumer.cpp:375-376);
  *  - start positions trim_horizon | latest | after_sequence_number:<n>
  *    (kinesis_consumer.cpp:259-291) → `startingposition` option.
  */
object ShardedLog {
  val SCHEMA: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("partition_key", StringType, nullable = true),
    StructField("data", StringType, nullable = true),
    StructField("approximate_arrival_timestamp", TimestampType, nullable = false)))

  val FORMAT = "graft.sources.ShardedLogProvider"

  def shardFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("shard-") && f.getName.endsWith(".log"))
      .sortBy(_.getName).toSeq
  }

  /** Test/demo helper: append records to one shard (`put-record` analog). */
  def append(dir: String, shard: Int, records: Seq[(String, String)]): Unit = {
    val d = new java.io.File(dir); d.mkdirs()
    val f = new java.io.FileWriter(new java.io.File(d, s"shard-$shard.log"), true)
    try records.foreach { case (pk, data) => f.write(s"$pk\t$data\n") }
    finally f.close()
  }

  def lineCounts(dir: String): Map[String, Long] =
    shardFiles(dir).map { f =>
      val src = scala.io.Source.fromFile(f)
      try f.getName -> src.getLines().size.toLong finally src.close()
    }.toMap

  /** {"shard-0.log":12,...} with sorted keys; values = next seq to read. */
  def offsetJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  def parseOffsetJson(s: String): Map[String, Long] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
      }.toMap
}

case class ShardedLogOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String = ShardedLog.offsetJson(counts)
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
    override def planInputPartitions(): Array[InputPartition] =
      ShardedLog.lineCounts(path).toSeq.sortBy(_._1).map { case (s, n) =>
        ShardedLogPartition(path, s, 0L, n): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = ShardedLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedLogMicroBatchStream(path, batchsize, startPos)
}

class ShardedLogMicroBatchStream(path: String, batchsize: Long, startPos: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = {
    val counts = ShardedLog.lineCounts(path)
    val init = startPos.toLowerCase match {
      case "latest" => counts
      case "trim_horizon" => counts.map { case (k, _) => k -> 0L }
      case p if p.startsWith("after_sequence_number:") =>
        val n = p.substring("after_sequence_number:".length).toLong
        counts.map { case (k, c) => k -> math.min(n + 1, c) }
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
    val counts = ShardedLog.lineCounts(path)
    val s = start.asInstanceOf[ShardedLogOffset].counts
    ShardedLogOffset(counts.map { case (k, c) =>
      k -> math.min(c, s.getOrElse(k, 0L) + batchsize)
    })
  }

  override def reportLatestOffset(): Offset = ShardedLogOffset(ShardedLog.lineCounts(path))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    ShardedLogOffset(ShardedLog.parseOffsetJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardedLogOffset].counts
    val e = end.asInstanceOf[ShardedLogOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (shard, until) =>
      val from = s.getOrElse(shard, 0L)
      if (until > from) Some(ShardedLogPartition(path, shard, from, until): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ShardedLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One shard slice [from, until) — the unit of parallelism, exactly the
  * reference's shard→worker assignment (pipeline_kinesis.c:439-451) with
  * Spark's scheduler in place of the modulo loop. */
case class ShardedLogPartition(path: String, shard: String, from: Long, until: Long)
    extends InputPartition

object ShardedLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardedLogPartition]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(new java.io.File(p.path, p.shard))
      private val it = src.getLines().zipWithIndex
        .slice(p.from.toInt, p.until.toInt)
      private var cur: (String, Long) = _
      override def next(): Boolean =
        if (it.hasNext) { val (l, i) = it.next(); cur = (l, i.toLong); true } else false
      override def get(): InternalRow = {
        val (line, seq) = cur
        val tab = line.indexOf('\t')
        val (pk, data) = if (tab >= 0) (line.substring(0, tab), line.substring(tab + 1))
                         else (null, line)
        InternalRow(
          UTF8String.fromString(p.shard.stripSuffix(".log")),
          seq,
          if (pk == null) null else UTF8String.fromString(pk),
          UTF8String.fromString(data),
          System.currentTimeMillis() * 1000L)
      }
      override def close(): Unit = src.close()
    }
  }
}
