package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
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
    maxBytes: Int) extends Table with SupportsRead {
  override def name(): String = s"kafka-wire:$topic"
  override def schema(): StructType = KafkaWire.rawSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaWireScan(host, port, topic, maxBytes)
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
