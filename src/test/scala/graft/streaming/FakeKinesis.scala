package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Test-only DataSource V2 that registers under the SAME short name the
  * production Kinesis edge asks for (`aws-kinesis`, via the
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * entry in test resources), so [[Pipeline.KinesisLogSource]] can be
  * driven through a REAL `readStream.format(...).options(...).load()`
  * lookup against canned shard data — the strongest offline close for
  * operator O1 (StreamingJob.java:74-110): a typo in the option KEYS or
  * a wrong record schema now fails a spec instead of surfacing in
  * production.
  *
  * Semantics mirrored from the public AWS Labs
  * `spark-sql-kinesis-connector` at the seam the engine touches:
  *   - record schema `(data binary, streamName, partitionKey,
  *     sequenceNumber, approximateArrivalTimestamp)` — the engine reads
  *     only `data`;
  *   - `kinesis.startingPosition=LATEST` ⇒ the initial offset is the
  *     shard end AT STREAM START (backlog records are never delivered),
  *     `TRIM_HORIZON` ⇒ offset 0;
  *   - offsets are monotone record counts, replayable from the retained
  *     store, so checkpoint restart resumes exactly where it left off.
  */
object FakeKinesisStore {
  private val shards = mutable.Map.empty[String, mutable.ArrayBuffer[(Array[Byte], String)]]
  @volatile var capturedOptions: Map[String, String] = Map.empty

  def reset(stream: String): Unit = synchronized { shards.remove(stream); () }

  def append(stream: String, data: Array[Byte], partitionKey: String): Unit =
    synchronized {
      shards.getOrElseUpdate(stream, mutable.ArrayBuffer.empty) += ((data, partitionKey))
      ()
    }

  def size(stream: String): Long =
    synchronized(shards.get(stream).map(_.size.toLong).getOrElse(0L))

  def slice(stream: String, from: Long, until: Long): Array[(Array[Byte], String, Long)] =
    synchronized {
      shards.get(stream) match {
        case None => Array.empty
        case Some(buf) =>
          (from until math.min(until, buf.size.toLong)).map { i =>
            val (d, pk) = buf(i.toInt); (d, pk, i)
          }.toArray
      }
    }

  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))
}

class FakeKinesisProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "aws-kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeKinesisStore.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FakeKinesisTable(new CaseInsensitiveStringMap(properties))
}

final class FakeKinesisTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"fake-kinesis-${options.get("kinesis.streamname")}"
  override def schema(): StructType = FakeKinesisStore.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // capture exactly what arrived through the real lookup path, for the
    // spec's key-by-key parity assertion against KinesisLogSource.options
    val seen = Map.newBuilder[String, String]
    caseInsensitiveOptions.entrySet().forEach(e => seen += e.getKey -> e.getValue)
    FakeKinesisStore.capturedOptions = seen.result()
    new ScanBuilder {
      override def build(): Scan = new FakeKinesisScan(caseInsensitiveOptions)
    }
  }
}

final case class FakeKinesisOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class FakeKinesisScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = FakeKinesisStore.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKinesisMicroBatchStream(
      options.get("kinesis.streamname"),
      Option(options.get("kinesis.startingposition")).getOrElse("LATEST"))
}

final class FakeKinesisMicroBatchStream(stream: String, startingPosition: String)
    extends MicroBatchStream {

  override def initialOffset(): Offset = startingPosition.toUpperCase match {
    // LATEST = the shard end when the query starts: backlog is skipped
    case "LATEST" => FakeKinesisOffset(FakeKinesisStore.size(stream))
    case _        => FakeKinesisOffset(0L) // TRIM_HORIZON
  }

  override def latestOffset(): Offset = FakeKinesisOffset(FakeKinesisStore.size(stream))

  override def deserializeOffset(json: String): Offset = FakeKinesisOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rows = FakeKinesisStore.slice(stream,
      start.asInstanceOf[FakeKinesisOffset].n, end.asInstanceOf[FakeKinesisOffset].n)
    if (rows.isEmpty) Array.empty else Array(FakeKinesisPartition(stream, rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[FakeKinesisPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (data, pk, seq) = p.rows(i)
          InternalRow(
            data,
            UTF8String.fromString(p.stream),
            UTF8String.fromString(pk),
            UTF8String.fromString(seq.toString),
            seq * 1000000L) // deterministic micros stand-in for arrival time
        }
        override def close(): Unit = ()
      }
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class FakeKinesisPartition(stream: String, rows: Array[(Array[Byte], String, Long)])
    extends InputPartition
