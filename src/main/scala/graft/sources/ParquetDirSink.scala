package graft.sources

import java.io.File
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The STREAMING LAKE SINK — [[CsvDirSink]]'s epoch-idempotent publish
  * protocol composed with the hive-partitioned parquet layout of
  * `l28_partition_pruned_scan`: the production shape of "a stream keeps a
  * partitioned parquet lake current", at demo scale.
  *
  * `option("path", dir)` + `option("partitionBy", col)` (one STRING
  * partition column). Layout: `<col>=<value>/part-<epoch>-<p>-<n>.parquet`
  * — hive-style, so any engine (Spark partition discovery + pruning,
  * DuckDB hive_partitioning, Trino/Hive) reads it back with the partition
  * column reconstructed from the path and partition-pruned scans for free.
  *
  * Epoch protocol (same first-commit-wins contract as [[CsvDirSink]],
  * which documents the crash cases):
  *  - tasks write one STAGED parquet file per partition VALUE they see
  *    (`_staged-<epoch>-<p>-<task>-<n>.parquet`, top level — underscore
  *    names are invisible to readers), routing rows by the partition
  *    column and STRIPPING it from the file (hive layout: the value lives
  *    in the directory name, a duplicate column would break read-back);
  *  - `commit(epoch)` on the driver is idempotent: marker exists → this
  *    is a replayed epoch, discard the attempt's staging; otherwise sweep
  *    `part-<epoch>-*` orphans from every value directory (a crashed
  *    attempt that died between renames and its marker), rename staged
  *    shards into their value directories, write `_graft_epoch_<epoch>`
  *    LAST.
  * Parquet is the exact-roundtrip serialization here (INT64/DOUBLE carry
  * IEEE bits, BINARY(UTF8) carries strings verbatim), so the sink is
  * value-exact by construction — the i14 oracle (i9's watermark-horizon
  * cut) hashes the read-back against batch SQL. Nulls are rejected loudly
  * (required fields), same aggregate-shaped-results contract as the TSV
  * sink. Production swap: java.io renames → `FileSystem` API; the
  * protocol and layout are the point.
  */
class ParquetDirSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ParquetDirTable(properties.get("path"))
}

class ParquetDirTable(path: String) extends Table with SupportsWrite {
  require(path != null, "graft.sources.ParquetDirSink requires option(\"path\", dir)")
  override def name: String = s"graft_parquet_lake($path)"
  override def schema: StructType = new StructType()
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        // writer options (unlike the special-cased "path") arrive on the
        // write info, not the table properties
        override def toStreaming: StreamingWrite = {
          val pCol = info.options.get("partitionby")
          require(pCol != null,
            "graft.sources.ParquetDirSink requires option(\"partitionBy\", column)")
          new ParquetDirStreamingWrite(path, info.schema(), pCol)
        }
      }
    }
}

case class ParquetStagedShard(staged: String, partitionId: Int, value: String,
    rows: Long)
case class ParquetStagedShards(shards: Seq[ParquetStagedShard])
    extends WriterCommitMessage

class ParquetDirStreamingWrite(path: String, schema: StructType, pCol: String)
    extends StreamingWrite {
  require(schema.fieldNames.contains(pCol),
    s"ParquetDirSink: partitionBy column '$pCol' not in schema ${schema.simpleString}")

  /** Remove a staged shard AND the `.crc` sidecar Hadoop's checksummed
    * local FS writes next to it (the sidecar must never survive into, or
    * litter, the published lake). */
  private def dropStaged(root: File, staged: String): Unit = {
    new File(root, staged).delete(): Unit
    new File(root, s".$staged.crc").delete(): Unit
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ParquetDirStreamingWriterFactory(path, schema, pCol)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    val marker = new File(root, s"_graft_epoch_$epochId")
    val shards = messages.flatMap { case ParquetStagedShards(ss) => ss }
    if (marker.exists()) {
      // replayed epoch: first commit won — discard this attempt's staging
      shards.foreach(sh => dropStaged(root, sh.staged))
    } else {
      // no marker ⇒ epoch never published: sweep part-<epoch>-* orphans a
      // crashed earlier attempt may have renamed into the value dirs
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith(s"$pCol="))
        .foreach { d =>
          Option(d.list()).getOrElse(Array.empty)
            .filter(_.matches(s"part-$epochId-.*\\.parquet"))
            .foreach(f => new File(d, f).delete(): Unit)
        }
      val published = shards.zipWithIndex.map { case (sh, n) =>
        val dir = new File(root, s"$pCol=${sh.value}")
        dir.mkdirs()
        val fin = s"part-$epochId-${sh.partitionId}-$n.parquet"
        val ok = new File(root, sh.staged).renameTo(new File(dir, fin))
        require(ok, s"ParquetDirSink: rename ${sh.staged} -> ${dir.getName}/$fin failed")
        new File(root, s".${sh.staged}.crc").delete(): Unit
        s"$pCol=${sh.value}/$fin\t${sh.rows}"
      }
      // marker LAST: shards without their epoch marker are unpublished
      val w = new java.io.BufferedWriter(new java.io.FileWriter(marker))
      try published.foreach { l => w.write(l); w.newLine() }
      finally w.close()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ParquetStagedShards(ss) =>
        ss.foreach(sh => dropStaged(new File(path), sh.staged))
      case _ =>
    }
}

/** Ships (path, schema, pCol) to the executors; a standalone class, not a
  * closure, so nothing non-serializable is captured. */
class ParquetDirStreamingWriterFactory(path: String, schema: StructType,
    pCol: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ParquetStagedShardWriter(path, schema, pCol, partitionId, taskId, epochId)
}

/** Routes rows by the partition column into one staged parquet file per
  * value; the partition column itself is NOT written (hive layout). */
class ParquetStagedShardWriter(path: String, schema: StructType, pCol: String,
    partitionId: Int, taskId: Long, epochId: Long) extends DataWriter[InternalRow] {
  private val root = { val d = new File(path); d.mkdirs(); d }
  private val pIdx = schema.fieldIndex(pCol)
  private val dataFields = schema.fields.zipWithIndex.filter(_._2 != pIdx)
  private val mt: MessageType = {
    val b = Types.buildMessage()
    dataFields.foreach { case (f, _) =>
      f.dataType match {
        case LongType =>
          b.addField(Types.required(PrimitiveType.PrimitiveTypeName.INT64).named(f.name))
        case DoubleType =>
          b.addField(Types.required(PrimitiveType.PrimitiveTypeName.DOUBLE).named(f.name))
        case StringType =>
          b.addField(Types.required(PrimitiveType.PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case dt => throw new IllegalArgumentException(
          s"ParquetDirSink: unsupported type $dt for column ${f.name}")
      }
    }
    b.named("graft_lake")
  }
  private val factory = new SimpleGroupFactory(mt)
  private val conf = new Configuration()
  // one staged file per partition VALUE this task sees; n keeps names
  // stable for the epoch-commit rename
  private val writers =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, ParquetWriter[org.apache.parquet.example.data.Group])]
  private val rowCounts = scala.collection.mutable.Map.empty[String, Long]

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(pIdx),
      s"ParquetDirSink: NULL partition value in column $pCol — nulls unsupported")
    val value = row.getUTF8String(pIdx).toString
    require(value.matches("[A-Za-z0-9_.\\-]+"),
      s"ParquetDirSink: partition value '$value' is not path-safe")
    val (_, w) = writers.getOrElseUpdate(value, {
      val staged = s"_staged-$epochId-$partitionId-$taskId-${writers.size}.parquet"
      val pw = ExampleParquetWriter
        .builder(HadoopOutputFile.fromPath(
          new Path(new File(root, staged).getAbsolutePath), conf))
        .withConf(conf).withType(mt).build()
      (staged, pw)
    })
    val g = factory.newGroup()
    dataFields.foreach { case (f, i) =>
      require(!row.isNullAt(i),
        s"ParquetDirSink: NULL in column ${f.name} — nulls unsupported")
      f.dataType match {
        case LongType => g.add(f.name, row.getLong(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case StringType => g.add(f.name, row.getUTF8String(i).toString)
        case _ => // unreachable: mt construction already rejected it
      }
    }
    w.write(g)
    rowCounts(value) = rowCounts.getOrElse(value, 0L) + 1L
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._2.close())
    ParquetStagedShards(writers.map { case (value, (staged, _)) =>
      ParquetStagedShard(staged, partitionId, value, rowCounts(value))
    }.toSeq)
  }
  override def abort(): Unit = {
    writers.values.foreach { case (staged, w) =>
      try w.close() catch { case _: Throwable => () }
      new File(root, staged).delete(): Unit
      new File(root, s".$staged.crc").delete(): Unit
    }
  }
  override def close(): Unit = ()
}
