package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource V2 WRITE connector — the sink leg of the extension
  * surface, completing the connector story started by the read-side
  * [[RangeSource]] (a8): `TableProvider` → `Table` (`SupportsWrite`,
  * `ACCEPT_ANY_SCHEMA`) → `WriteBuilder` → `BatchWrite` / `StreamingWrite`
  * → per-partition `DataWriter`s with the full task/job COMMIT PROTOCOL.
  *
  * Writes the dataframe as tab-separated text shards, one file per
  * partition, into `option("path", dir)`:
  *   - each task writes to a temp file keyed by (partition, task id);
  *   - batch: `DataWriter.commit` renames it to the final `part-<p>.tsv`
  *     — the driver-side commit coordinator guarantees a single
  *     committing attempt per partition, so speculative/retried attempts
  *     either rename atomically or get aborted and deleted;
  *   - batch: `BatchWrite.commit` drops a `_graft_committed` marker once
  *     every partition reported success — readers treat its absence as
  *     "job failed mid-write" (the same observable contract as Hadoop's
  *     `_SUCCESS`).
  *
  * STREAMING leg (`TableCapability.STREAMING_WRITE`): the micro-batch
  * engine hands every task an EPOCH id and may re-execute a whole epoch
  * after a crash-before-checkpoint — so the streaming protocol publishes
  * per epoch, idempotently:
  *   - tasks stage to `_staged-<epoch>-<partition>-<task>` and do NOT
  *     publish at task commit (the commit coordinator only serializes
  *     attempts WITHIN one epoch run — it cannot see that a whole epoch
  *     already published before a crash-and-replay, so the epoch-level
  *     decision belongs to the driver);
  *   - `StreamingWrite.commit(epoch, msgs)` runs once per epoch on the
  *     driver: if `_graft_epoch_<epoch>` already exists this is a REPLAYED
  *     epoch — the staged files are discarded and the published files kept
  *     (first-commit-wins = exactly-once downstream); otherwise any
  *     `part-<epoch>-*.tsv` leftovers from a crashed earlier attempt are
  *     deleted (no marker ⇒ the epoch never published ⇒ they are garbage,
  *     and a replay with fewer partitions must not leak the high-numbered
  *     ones), each staged file renames to `part-<epoch>-<partition>.tsv`,
  *     and the epoch marker is written LAST.
  * This mirrors, at demo scale, exactly what a warehouse/queue/lakehouse
  * sink implements in these hooks (staged upload / transaction begin in
  * the writer, atomic idempotent publish keyed by epoch in the job
  * commit); production code would swap java.io for the `FileSystem` API —
  * the protocol is the point.
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
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CsvDirBatchWrite(path, info.schema())
        override def toStreaming: StreamingWrite =
          new CsvDirStreamingWrite(path, info.schema())
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

/** Epoch-idempotent streaming leg: see the class doc for the protocol. */
class CsvDirStreamingWrite(path: String, schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new CsvDirStreamingWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = new File(path, s"_graft_epoch_$epochId")
    if (marker.exists()) {
      // replayed epoch: first commit won — discard this attempt's staging
      messages.foreach {
        case CsvStagedShard(staged, _, _) => new File(path, staged).delete(): Unit
        case _ =>
      }
    } else {
      // no marker ⇒ this epoch never published: shards left by a crashed
      // earlier attempt (crash BETWEEN renames and the marker write) are
      // garbage and must go before this attempt publishes — a replay with
      // fewer partitions would otherwise leak the dead attempt's
      // high-numbered part files into the read set
      Option(new File(path).list()).getOrElse(Array.empty)
        .filter(_.matches(s"part-$epochId-\\d+\\.tsv"))
        .foreach(f => new File(path, f).delete(): Unit)
      val published = messages.map { case CsvStagedShard(staged, pid, rows) =>
        val fin = s"part-$epochId-$pid.tsv"
        val ok = new File(path, staged).renameTo(new File(path, fin))
        require(ok, s"CsvDirSink: rename $staged -> $fin failed")
        s"$fin\t$rows"
      }
      // marker LAST: shards without their epoch marker are not yet
      // published (a crash here is safe — the replay rewrites them)
      val w = new BufferedWriter(new FileWriter(marker))
      try published.foreach { l => w.write(l); w.newLine() }
      finally w.close()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CsvStagedShard(staged, _, _) => new File(path, staged).delete(): Unit
      case _ =>
    }
}

class CsvDirStreamingWriterFactory(path: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CsvStagedShardWriter(path, schema, partitionId, taskId, epochId)
}

case class CsvShardCommitted(file: String, rows: Long) extends WriterCommitMessage
case class CsvStagedShard(staged: String, partitionId: Int, rows: Long)
    extends WriterCommitMessage

class CsvDirWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CsvShardWriter(path, schema, partitionId, taskId)
}

/** Shared line-serialization core: temp-file writer over the exact
  * long/double/string roundtrip encoding; subclasses decide what task
  * commit publishes. */
abstract class CsvLineWriter(path: String, schema: StructType, tmpName: String)
    extends DataWriter[InternalRow] {
  protected val dir: File = { val d = new File(path); d.mkdirs(); d }
  protected val tmp = new File(dir, tmpName)
  private val out = new BufferedWriter(new FileWriter(tmp))
  protected var rows = 0L

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

  protected def closeOut(): Unit = out.close()
  override def abort(): Unit = { out.close(); tmp.delete(): Unit }
  override def close(): Unit = ()
}

class CsvShardWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    // temp name carries the TASK id: concurrent speculative attempts for one
    // partition write distinct files and only the committing one is renamed
    extends CsvLineWriter(path, schema, s"_tmp-$partitionId-$taskId") {
  override def commit(): WriterCommitMessage = {
    closeOut()
    val fin = s"part-$partitionId.tsv"
    val target = new File(dir, fin)
    require(tmp.renameTo(target), s"CsvDirSink: rename $tmp -> $target failed")
    CsvShardCommitted(fin, rows)
  }
}

class CsvStagedShardWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long, epochId: Long)
    extends CsvLineWriter(path, schema, s"_staged-$epochId-$partitionId-$taskId") {
  // streaming tasks never publish: the epoch-level commit on the driver
  // renames (or discards, on replay) the staged file
  override def commit(): WriterCommitMessage = {
    closeOut()
    CsvStagedShard(tmp.getName, partitionId, rows)
  }
}
