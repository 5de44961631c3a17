package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.{expressions => connectorExpressions}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("maxRowsPerTrigger", "0").toLong)
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))
}

class RangeTable(start: Long, end: Long, slices: Int, rowsPerBatch: Long = 0L)
    extends Table with SupportsRead {
  override def name: String = s"graft_range($start,$end)"
  override def schema: StructType = RangeSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices, rowsPerBatch)
}

class RangeScanBuilder(start: Long, end: Long, slices: Int,
    rowsPerBatch: Long = 0L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownTopN
    with SupportsPushDownLimit {
  private var required: StructType = RangeSource.schema
  private var lo = start
  private var hi = end
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Range comparisons on `id` tighten the [lo, hi) bounds BEFORE
    * partition planning — pushed filters shrink the split set itself (the
    * V2 analogue of partition pruning), not just per-row evaluation.
    * Accepted filters are exact, so nothing is returned as residual and
    * Spark drops its own Filter node for them. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Idempotent: Spark may re-invoke on a reused builder during
    // re-planning; compounding bounds from a prior call would silently
    // drop rows (accepted filters leave no residual Filter node)
    lo = start; hi = end; accepted = Array.empty
    // v == Long.MaxValue would overflow the v+1 exclusive-bound forms and,
    // because accepted filters leave NO residual Filter node, the overflow
    // would be silently wrong rather than slow — leave those to Spark
    val (ok, residual) = filters.partition {
      case GreaterThan("id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) if v < Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    accepted = ok
    residual
  }
  override def pushedFilters: Array[Filter] = accepted

  /** TopN/LIMIT pushdown (f5): because this source KNOWS its row layout
    * exactly (the range is the data), `ORDER BY id ASC LIMIT n` and
    * plain `LIMIT n` truncate the PLANNED RANGE itself — the engine
    * drops its own TakeOrderedAndProject entirely (complete pushdown)
    * and the scan reads exactly n rows. The readers emit ids ascending
    * within each contiguous split and splits are planned in ascending
    * order, so the required output order is the scan's natural order.
    * DESC (or any non-id ordering) is REFUSED — this source would have
    * to emit reversed rows to honor complete pushdown semantics — and
    * the engine keeps its TopN (gated as the f5 negative leg). */
  override def pushTopN(orders: Array[connectorExpressions.SortOrder],
      limit: Int): Boolean = {
    val idAsc = orders.length == 1 &&
      (orders.head.expression match {
        case r: connectorExpressions.NamedReference =>
          r.fieldNames.sameElements(Array("id"))
        case _ => false
      }) &&
      orders.head.direction == connectorExpressions.SortDirection.ASCENDING
    if (idAsc) { hi = math.min(hi, lo + limit); true } else false
  }
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit); true
  }
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = new RangeScan(lo, hi, slices, required, rowsPerBatch)
}

class RangeScan(start: Long, end: Long, slices: Int, required: StructType,
    rowsPerBatch: Long = 0L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(start, end, slices, required, rowsPerBatch)
  override def description: String = s"graft_range($start,$end,$slices)"
  override def planInputPartitions(): Array[InputPartition] =
    RangeScan.slice(start, end, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

object RangeScan {
  /** Shared split planner: [lo, hi) into ≤ n contiguous partitions. */
  def slice(lo: Long, hi: Long, n: Int): Array[InputPartition] = {
    val k = math.max(1, n)
    val step = math.max(1L, (hi - lo + k - 1) / k)
    (0 until k).iterator
      .map(i => RangePartition(lo + i * step, math.min(lo + (i + 1) * step, hi)))
      .filter(p => p.lo < p.hi)
      .toArray[InputPartition]
  }
}

/** The STREAMING leg of the connector (a11): the same deterministic range
  * served through the MicroBatchStream protocol — offsets are plain
  * positions in [start, end), `maxRowsPerTrigger` is honored through
  * SupportsAdmissionControl (the engine passes it back as the ReadLimit),
  * and Trigger.AvailableNow drains the remaining range in rate-limited
  * micro-batches via SupportsTriggerAvailableNow. This is the offset/
  * admission/availability contract a Kafka-class source implements, on a
  * source whose content is reproducible enough to ORACLE exactly.
  * Stateless across calls: every batch's work is derived from the
  * (start, end] offsets the engine hands back, so recovery-from-
  * checkpoint replays identical batches. */
class RangeMicroBatchStream(start: Long, end: Long, slices: Int,
    required: StructType, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = RangeStreamOffset(start)
  override def deserializeOffset(json: String): Offset =
    RangeStreamOffset(json.trim.toLong)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch > 0) ReadLimit.maxRows(rowsPerBatch)
    else ReadLimit.allAvailable()
  // bounded source: `end` is already the standing availability target, so
  // there is nothing to snapshot for AvailableNow
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def latestOffset(): Offset = sys.error(
    "admission-controlled source: the engine must call latestOffset(start, limit)")
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val pos = startOffset.asInstanceOf[RangeStreamOffset].pos
    val next = limit match {
      case r: ReadMaxRows => math.min(end, pos + r.maxRows())
      case _ => end
    }
    RangeStreamOffset(next)
  }
  override def reportLatestOffset(): Offset = RangeStreamOffset(end)
  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] =
    RangeScan.slice(startOff.asInstanceOf[RangeStreamOffset].pos,
      endOff.asInstanceOf[RangeStreamOffset].pos, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

case class RangeStreamOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
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
