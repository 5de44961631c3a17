package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 sink that REQUESTS ITS WRITE LAYOUT (a36) — the write-side
  * counterpart of c23's reported read layout, via
  * [[RequiresDistributionAndOrdering]]: the Write declares it needs the
  * incoming rows CLUSTERED by the leading column and SORTED by (cluster,
  * order) — and the ENGINE inserts the shuffle + sort to honor it
  * before any task writes a byte. This is how an Iceberg-class sink
  * gets one-file-per-partition-value, internally sorted files without
  * trusting the query author to repartition: the layout contract lives
  * in the CONNECTOR, the plan work in the engine.
  *
  * The sink itself then just streams what it is handed: one TSV file
  * per non-empty task partition, rows in received order, staged + task
  * -committed (the CsvDirSink protocol). Which cluster value lands in
  * which numbered file is the engine's hash — deliberately NOT part of
  * the contract; what IS the contract, and what the a36 key proves
  * from the written bytes, is that each cluster value occupies exactly
  * ONE file and every file is internally sorted.
  *
  * At 100 TB this is the difference between a lake of interleaved
  * files (every reader re-shuffles) and a lake whose layout IS the
  * optimization: downstream scans get c23's storage-partitioned reads
  * for free because the write side put every key in one sorted file. */
class ClusteredCsvSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    sys.error("ClusteredCsvSink is write-only; schema comes from the query")
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "ClusteredCsvSink requires option(\"path\", dir)")
    new ClusteredSinkTable(path, schema)
  }
}

class ClusteredSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_clustered_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new ClusteredWrite(path, info.schema())
    }
}

class ClusteredWrite(path: String, schema: StructType)
    extends Write with RequiresDistributionAndOrdering {
  require(schema.fields.length >= 2,
    "ClusteredCsvSink needs (clusterCol, orderCol, ...)")
  private def c0 = schema.fields(0).name
  private def c1 = schema.fields(1).name
  /** the layout contract: cluster by the leading column… */
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(c0)))
  override def distributionStrictlyRequired(): Boolean = true
  /** …and sort every partition by (cluster, order) */
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.identity(c0), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity(c1), SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new ClusteredBatchWrite(path, schema)
}

case class ClusteredFileDone(name: String) extends WriterCommitMessage

class ClusteredBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ClusteredWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    java.nio.file.Files.write(new java.io.File(dir, "_graft_committed").toPath,
      java.util.Arrays.asList(messages.collect {
        case ClusteredFileDone(n) if n.nonEmpty => n }.sorted: _*))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ClusteredFileDone(n) if n.nonEmpty =>
        new java.io.File(path, n).delete(): Unit
      case _ =>
    }
}

case class ClusteredWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dir = new java.io.File(path); dir.mkdirs()
      private val tmp = new java.io.File(dir, s"._clu-$partitionId-$taskId.tmp")
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(tmp))
      private var n = 0L
      override def write(row: InternalRow): Unit = {
        val line = schema.fields.indices.map { j =>
          schema.fields(j).dataType match {
            case LongType => row.getLong(j).toString
            case DoubleType => row.getDouble(j).toString
            case StringType => row.getUTF8String(j).toString
            case dt => sys.error(s"unsupported sink type $dt")
          }
        }.mkString("\t")
        out.write(line); out.newLine(); n += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0) { tmp.delete(); ClusteredFileDone("") }
        else {
          val fin = f"shard-$partitionId%05d.tsv"
          require(tmp.renameTo(new java.io.File(dir, fin)),
            s"ClusteredCsvSink: rename to $fin failed")
          ClusteredFileDone(fin)
        }
      }
      override def abort(): Unit = { out.close(); tmp.delete(): Unit }
      override def close(): Unit = ()
    }
}
