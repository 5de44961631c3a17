package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource V2 connector — the connector leg of the extension
  * surface (the reference's "extract" side re-expressed as a Spark V2
  * source). Deterministic synthetic table `(id BIGINT, sq BIGINT)` over
  * `[start, end)`, split into `slices` input partitions.
  *
  * Demonstrates the full V2 read path: `TableProvider` → `Table`
  * (`SupportsRead`) → `ScanBuilder` with COLUMN PRUNING pushdown
  * (`SupportsPushDownRequiredColumns` — a `select(sq)` reads only `sq`,
  * pinned by a plan spec) → `Batch` → `InputPartition`s → per-partition
  * readers. The same skeleton is what a JDBC/warehouse/queue connector
  * fills in with real IO; partition planning is where a production source
  * encodes split/predicate pushdown so a 1000-executor cluster reads in
  * parallel.
  *
  * Usage: `spark.read.format("graft.sources.RangeSource")
  *   .option("start", 0).option("end", 100000).option("slices", 8).load()`
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))
}

class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name: String = s"graft_range($start,$end)"
  override def schema: StructType = RangeSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RangeScan(start, end, slices, required)
}

class RangeScan(start: Long, end: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description: String = s"graft_range($start,$end,$slices)"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val step = math.max(1L, (end - start + n - 1) / n)
    (0 until n).iterator
      .map(i => RangePartition(start + i * step, math.min(start + (i + 1) * step, end)))
      .filter(p => p.lo < p.hi)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

case class RangePartition(lo: Long, hi: Long) extends InputPartition

class RangeReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RangeReader(partition.asInstanceOf[RangePartition], cols)
}

class RangeReader(p: RangePartition, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private var cur = p.lo - 1
  override def next(): Boolean = { cur += 1; cur < p.hi }
  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toSeq.map {
      case "id" => cur
      case "sq" => cur * cur
    })
  override def close(): Unit = ()
}
