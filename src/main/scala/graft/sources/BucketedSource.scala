package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 source that REPORTS ITS PARTITIONING (c23) — the connector
  * feature behind storage-partitioned joins: the data is physically
  * laid out one partition per `grp` value (the bucketed/partitioned
  * lake layout), the scan declares it via
  * [[SupportsReportPartitioning]] with a [[KeyGroupedPartitioning]] on
  * `identity(grp)`, and each input partition exposes its key through
  * [[HasPartitionKey]] — which lets the engine SKIP THE SHUFFLE for
  * any grp-clustered operation: a groupBy(grp) aggregates in place,
  * and a join of two such sources on grp becomes a STORAGE-PARTITIONED
  * JOIN (zero exchanges on either side, the c23 key gates both from
  * the executed plan).
  *
  * Rows are a deterministic closed form — (grp, k,
  * v = (grp·1000003 + k·7919) mod 100000) for grp < G, k < N — so the
  * DuckDB oracle reproduces them from generate_series; no files, no
  * randomness (the a8 RangeSource idiom, plus declared layout).
  *
  * At 100 TB this is THE connector-level shuffle eliminator: a
  * bucketed fact-fact join (orders ⋈ returns on order key, both
  * bucket-partitioned in the lake) moves ZERO rows over the network —
  * the same contract hive bucketing and Iceberg's bucket transforms
  * ship, expressed through the V2 read API. */
class BucketedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val g = Option(properties.get("groups")).map(_.toInt).getOrElse(
      sys.error("graft.sources.BucketedSource requires option(\"groups\", <n>)"))
    val n = Option(properties.get("rowsPerGroup")).map(_.toLong).getOrElse(
      sys.error("BucketedSource requires option(\"rowsPerGroup\", <n>)"))
    new BucketedTable(g, n)
  }
}

object BucketedSource {
  val schema: StructType = StructType(Seq(
    StructField("grp", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  def valueOf(grp: Long, k: Long): Long = (grp * 1000003L + k * 7919L) % 100000L
}

class BucketedTable(groups: Int, rowsPerGroup: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_bucketed($groups x $rowsPerGroup)"
  override def schema(): StructType = BucketedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BucketedScan(groups, rowsPerGroup)
}

class BucketedScan(groups: Int, rowsPerGroup: Long)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportOrdering {
  override def readSchema(): StructType = BucketedSource.schema
  override def toBatch: Batch = this
  /** the declared layout: one partition per grp value, keyed by it —
    * what the engine's EnsureRequirements consumes to skip exchanges */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("grp")), groups)
  /** the declared per-partition order: (grp, k) ascending — grp is
    * constant within a partition, so a grp-keyed merge join's sort
    * requirement is satisfied straight off the scan (the sorted-bucket
    * layout; lets the engine drop the SortExec under the join too) */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(Expressions.sort(Expressions.identity("grp"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
      Expressions.sort(Expressions.identity("k"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
  override def planInputPartitions(): Array[InputPartition] =
    (0 until groups).map(g =>
      BucketedPartition(g.toLong, rowsPerGroup): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    BucketedReaderFactory()
}

case class BucketedPartition(grp: Long, rows: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(grp)
}

case class BucketedReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BucketedPartition]
    new PartitionReader[InternalRow] {
      private var i = -1L
      override def next(): Boolean = { i += 1; i < p.rows }
      override def get(): InternalRow =
        InternalRow(p.grp, i, BucketedSource.valueOf(p.grp, i))
      override def close(): Unit = ()
    }
  }
}
