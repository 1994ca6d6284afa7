package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming (and batch) DSv2 source over the Kafka wire
  * protocol — the streaming twin of [[KafkaWire.read]] (SURVEY §2.12
  * extension; the shape mirrors Spark's own kafka source: streaming
  * offsets are per-partition log-end watermarks from ListOffsets, and
  * every micro-batch plans ONE input partition per topic partition
  * covering its [start, end) slice, read on the executor through that
  * task's own broker connection).
  *
  * Options: `host`, `port`, `topic`, optional `maxBytes` per Fetch.
  * Usage: `spark.readStream.format(classOf[KafkaWireProvider].getName)
  * .option(...)...load()` — columns are [[KafkaWire.rawSchema]]. */
class KafkaWireProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWire.rawSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KafkaWireTable(
      opts.get("host"),
      opts.get("port").toInt,
      opts.get("topic"),
      Option(opts.get("maxBytes")).map(_.toInt).getOrElse(1 << 20))
  }
}

final class KafkaWireTable(host: String, port: Int, topic: String,
    maxBytes: Int) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kafka-wire:$topic"
  override def schema(): StructType = KafkaWire.rawSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaWireScan(host, port, topic, maxBytes)
    }

  /** INSERT surface over Produce v0 (reference: plugin/trino-kafka
    * KafkaPageSinkProvider — INSERT INTO a topic-table encodes each row
    * and produces it to the broker). Accepted input columns (by name):
    * `value` (string, required), `key` (string, nullable), `partition`
    * (int, an explicit override), `timestamp` (long millis or timestamp).
    * Without an explicit partition, rows route by key hash — one query's
    * key always lands on one partition, the broker-side ordering
    * guarantee producers rely on. Each TASK owns its own broker
    * connection and flushes bounded batches: no driver fan-in, no
    * unbounded buffering, at-least-once (the broker append is the commit
    * point, like the reference's page sink). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.fieldNames.exists(_.equalsIgnoreCase("value")),
      "kafka write requires a 'value' column")
    val bad = in.fields.filterNot(f =>
      Set("value", "key", "partition", "timestamp")(f.name.toLowerCase))
    require(bad.isEmpty,
      s"kafka write: unsupported columns ${bad.map(_.name).mkString(", ")} " +
        "(accepted: value, key, partition, timestamp)")
    in.fields.filter(f => Set("value", "key")(f.name.toLowerCase)).foreach(f =>
      require(f.dataType == StringType,
        s"kafka write: column ${f.name} must be STRING, got ${f.dataType}"))
    in.fields.filter(_.name.equalsIgnoreCase("partition")).foreach(f =>
      require(f.dataType == IntegerType,
        s"kafka write: partition must be INT, got ${f.dataType}"))
    new WriteBuilder {
      override def build(): Write = new Write {
        // one bounded driver metadata call for the partition count
        private def factory(): KafkaWireWriterFactory = {
          val c = new KafkaWire.Client(host, port)
          val n = try c.partitionCount(topic) finally c.close()
          new KafkaWireWriterFactory(host, port, topic, in, n)
        }
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DataWriterFactory = factory()
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
        /** Structured-Streaming SINK twin (writeStream → Produce): each
          * micro-batch's tasks produce like batch tasks do — the broker
          * append is the commit point, at-least-once across epoch
          * retries (Spark's own kafka sink contract). */
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(
              pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
            val f = factory()
            new StreamingDataWriterFactory {
              override def createWriter(partitionId: Int, taskId: Long,
                  epochId: Long): DataWriter[InternalRow] =
                f.createWriter(partitionId, taskId)
            }
          }
          override def commit(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

private final case class KafkaWireCommit(records: Long) extends WriterCommitMessage

private final class KafkaWireWriterFactory(host: String, port: Int,
    topic: String, schema: StructType, partitions: Int)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val client = new KafkaWire.Client(host, port)
      private def ix(name: String): Int =
        schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
      private val valueIx = ix("value")
      private val keyIx = ix("key")
      private val partIx = ix("partition")
      private val tsIx = ix("timestamp")
      private val buffers = Array.fill(partitions)(
        scala.collection.mutable.ArrayBuffer[KafkaWire.Msg]())
      private var written = 0L
      private val FlushAt = 500

      private def flush(p: Int): Unit = if (buffers(p).nonEmpty) {
        client.produce(topic, p, buffers(p).toSeq)
        buffers(p).clear()
      }

      override def write(row: InternalRow): Unit = {
        val value =
          if (row.isNullAt(valueIx)) null
          else row.getUTF8String(valueIx).getBytes
        val key =
          if (keyIx < 0 || row.isNullAt(keyIx)) null
          else row.getUTF8String(keyIx).getBytes
        val ts =
          if (tsIx < 0 || row.isNullAt(tsIx)) -1L
          else schema.fields(tsIx).dataType match {
            case TimestampType => row.getLong(tsIx) / 1000L // micros → millis
            case LongType => row.getLong(tsIx)
            case IntegerType => row.getInt(tsIx).toLong
            case other => throw new IllegalArgumentException(
              s"kafka write: timestamp column of type $other")
          }
        val p =
          if (partIx >= 0 && !row.isNullAt(partIx))
            math.floorMod(row.getInt(partIx), partitions)
          else if (key != null)
            math.floorMod(java.util.Arrays.hashCode(key), partitions)
          else math.floorMod(taskId.toInt, partitions)
        buffers(p) += KafkaWire.Msg(key, value, ts)
        written += 1
        if (buffers(p).length >= FlushAt) flush(p)
      }

      override def commit(): WriterCommitMessage = {
        buffers.indices.foreach(flush)
        KafkaWireCommit(written)
      }
      override def abort(): Unit = ()
      override def close(): Unit = client.close()
    }
}

final class KafkaWireScan(host: String, port: Int, topic: String,
    maxBytes: Int) extends Scan {
  override def readSchema(): StructType = KafkaWire.rawSchema

  private def endOffsets(): Map[Int, Long] = {
    val c = new KafkaWire.Client(host, port)
    try {
      val n = c.partitionCount(topic)
      (0 until n).map(p => p -> c.logEndOffset(topic, p)).toMap
    } finally c.close()
  }

  /** Batch mode: everything currently in the log. */
  override def toBatch: Batch = new Batch {
    private lazy val ends = endOffsets()
    override def planInputPartitions(): Array[InputPartition] =
      ends.toSeq.sortBy(_._1).map { case (p, end) =>
        KafkaWirePartition(host, port, topic, p, 0L, end, maxBytes)
          : InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new KafkaWireReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset =
        KafkaWireOffset(endOffsets().map { case (p, _) => p -> 0L })
      override def latestOffset(): Offset = KafkaWireOffset(endOffsets())
      override def deserializeOffset(json: String): Offset =
        KafkaWireOffset.fromJson(json)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = start.asInstanceOf[KafkaWireOffset].offsets
        val e = end.asInstanceOf[KafkaWireOffset].offsets
        e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
          val from = s.getOrElse(p, 0L)
          if (until > from)
            Some(KafkaWirePartition(host, port, topic, p, from, until, maxBytes)
              : InputPartition)
          else None
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new KafkaWireReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** Streaming offset: per-partition next-offset map, stable JSON. */
final case class KafkaWireOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}
object KafkaWireOffset {
  def fromJson(s: String): KafkaWireOffset = KafkaWireOffset(
    s.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
}

final case class KafkaWirePartition(host: String, port: Int, topic: String,
    partition: Int, from: Long, until: Long, maxBytes: Int) extends InputPartition

final class KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaWirePartition]
    new PartitionReader[InternalRow] {
      private val client = new KafkaWire.Client(p.host, p.port)
      private var offset = p.from
      private var buffer: Iterator[(Long, KafkaWire.Msg)] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!buffer.hasNext && offset < p.until) {
          val (_, msgs) = client.fetch(p.topic, p.partition, offset, p.maxBytes)
          if (msgs.isEmpty) return false // log truncated below `until`
          // a fetch may overshoot the batch's end offset: trim
          buffer = msgs.iterator.filter(_._1 < p.until)
          offset = msgs.last._1 + 1
          if (!buffer.hasNext && msgs.last._1 + 1 >= p.until) return false
        }
        if (!buffer.hasNext) return false
        val (off, m) = buffer.next()
        current = new GenericInternalRow(Array[Any](
          p.partition,
          off,
          if (m.key == null) null else UTF8String.fromBytes(m.key),
          if (m.value == null) null else UTF8String.fromBytes(m.value),
          if (m.timestamp < 0) null else m.timestamp * 1000L)) // micros
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = client.close()
    }
  }
}
