package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource V2 WRITE connector — the sink leg of the extension
  * surface, completing the connector story started by the read-side
  * [[RangeSource]] (a8): `TableProvider` → `Table` (`SupportsWrite`,
  * `ACCEPT_ANY_SCHEMA`) → `WriteBuilder` → `BatchWrite` →
  * per-partition `DataWriter`s with the full task/job COMMIT PROTOCOL.
  *
  * Writes the dataframe as tab-separated text shards, one file per
  * partition, into `option("path", dir)`:
  *   - each task writes to a temp file keyed by (partition, task id);
  *   - `DataWriter.commit` renames it to the final `part-<p>.tsv` — the
  *     driver-side commit coordinator guarantees a single committing
  *     attempt per partition, so speculative/retried attempts either
  *     rename atomically or get aborted and deleted;
  *   - `BatchWrite.commit` drops a `_graft_committed` marker once every
  *     partition reported success — readers treat its absence as "job
  *     failed mid-write" (the same observable contract as Hadoop's
  *     `_SUCCESS`).
  * This mirrors, at demo scale, exactly what a warehouse/queue/lakehouse
  * sink implements in these hooks (staged upload / transaction begin in
  * the writer, atomic publish in the job commit); production code would
  * swap java.io for the `FileSystem` API — the protocol is the point.
  *
  * Serialization is deliberately exact-roundtrip: LONG via `toString`,
  * DOUBLE via `Double.toString` (shortest repr — parses back to the
  * identical bit pattern), STRING as-is (caller must keep the delimiter
  * out of string columns). Nulls are rejected loudly — this sink is for
  * aggregate-shaped results.
  */
class CsvDirSink extends TableProvider {
  // write-only source: the schema comes from the dataframe being written
  // (ACCEPT_ANY_SCHEMA), never inferred from the target directory
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CsvDirTable(properties.get("path"))
}

class CsvDirTable(path: String) extends Table with SupportsWrite {
  require(path != null, "graft.sources.CsvDirSink requires option(\"path\", dir)")
  override def name: String = s"graft_csv_sink($path)"
  override def schema: StructType = new StructType()
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CsvDirBatchWrite(path, info.schema())
      }
    }
}

class CsvDirBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CsvDirWriterFactory(path, schema)
  // useCommitCoordinator defaults to true: exactly one task attempt per
  // partition is allowed to commit (rename) — the others abort
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val marker = new File(path, "_graft_committed")
    val w = new BufferedWriter(new FileWriter(marker))
    try messages.foreach { case CsvShardCommitted(f, rows) => w.write(s"$f\t$rows\n") }
    finally w.close()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CsvShardCommitted(f, _) => new File(path, f).delete(): Unit
      case _ =>
    }
}

case class CsvShardCommitted(file: String, rows: Long) extends WriterCommitMessage

class CsvDirWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CsvShardWriter(path, schema, partitionId, taskId)
}

class CsvShardWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val dir = { val d = new File(path); d.mkdirs(); d }
  // temp name carries the TASK id: concurrent speculative attempts for one
  // partition write distinct files and only the committing one is renamed
  private val tmp = new File(dir, s"_tmp-$partitionId-$taskId")
  private val out = new BufferedWriter(new FileWriter(tmp))
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.indices.map { i =>
      require(!row.isNullAt(i),
        s"CsvDirSink: NULL in column ${schema.fields(i).name} — nulls unsupported")
      schema.fields(i).dataType match {
        case LongType => row.getLong(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(
          s"CsvDirSink: unsupported type $dt for column ${schema.fields(i).name}")
      }
    }.mkString("\t")
    out.write(line); out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val fin = s"part-$partitionId.tsv"
    val target = new File(dir, fin)
    require(tmp.renameTo(target), s"CsvDirSink: rename $tmp -> $target failed")
    CsvShardCommitted(fin, rows)
  }

  override def abort(): Unit = { out.close(); tmp.delete(): Unit }
  override def close(): Unit = ()
}
