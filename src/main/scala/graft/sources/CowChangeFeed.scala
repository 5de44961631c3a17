package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** STREAMING CHANGE DATA FEED over a [[CowVersions]]-enabled table
  * (i25) — the Delta-streaming-source shape: snapshot VERSIONS are the
  * stream's offsets, and each micro-batch (a, b] emits, for every
  * version w in that range, the row-level diff of (w−1 → w) tagged
  * `(op, version)`. The diff comes from the MANIFEST (a28's
  * `manifestDiff`): files shared by both snapshots are never opened,
  * and a rewritten file's surviving rows cancel in the multiset
  * difference, so a batch's work is churn-sized, not table-sized.
  *
  * Offsets are plain committed version numbers, so recovery from a
  * checkpoint replays byte-identical batches (exactly-once downstream
  * with an idempotent sink — pinned by StreamingSpec's resume test),
  * and `Trigger.AvailableNow` drains up to the version count observed
  * at prepare time.
  *
  * Like the catalog's own delete path, the per-version diff here runs
  * where the driver runs (the changed files of one version — the
  * churn); the production version ships (version, fileA, fileB) tasks
  * to executors and reduces the diff per version — the protocol
  * (manifest diff → per-version change set → versioned offsets) is
  * identical. */
class CowChangeFeed extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CowChangeFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = properties.get("table")
    require(dir != null,
      "graft.sources.CowChangeFeed requires option(\"table\", <table dir>)")
    new CowFeedTable(new java.io.File(dir))
  }
}

object CowChangeFeed {
  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("st", StringType, nullable = false),
    StructField("total", DoubleType, nullable = false)))

  /** Row-level diff of (v−1 → v), from changed files only. */
  def changesOf(dir: java.io.File, v: Long): Seq[(String, Long, String, Double)] = {
    val (onlyA, onlyB, _) = CowVersions.manifestDiff(dir, v - 1, v)
    def rows(paths: Seq[String]): Seq[(Long, String, Double)] =
      paths.flatMap { p =>
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
          .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { ln =>
            val f = ln.split(",", -1)
            (f(0).toLong, f(1), f(2).toDouble)
          }
      }
    def ms(rs: Seq[(Long, String, Double)]) =
      rs.groupBy(identity).view.mapValues(_.size).toMap
    val (ra, rb) = (rows(onlyA), rows(onlyB))
    val (ma, mb) = (ms(ra), ms(rb))
    val removed = ma.toSeq.flatMap { case (r, n) =>
      Seq.fill(math.max(0, n - mb.getOrElse(r, 0)))(("D", r._1, r._2, r._3)) }
    val added = mb.toSeq.flatMap { case (r, n) =>
      Seq.fill(math.max(0, n - ma.getOrElse(r, 0)))(("I", r._1, r._2, r._3)) }
    (removed ++ added).sortBy(c => (c._1, c._2, c._3, c._4))
  }
}

class CowFeedTable(dir: java.io.File) extends Table with SupportsRead {
  require(CowVersions.enabled(dir),
    s"change feed requires a versioned table (no _versions.log in $dir)")
  override def name(): String = s"graft_cdf(${dir.getPath})"
  override def schema(): StructType = CowChangeFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CowFeedScan(dir)
}

class CowFeedScan(dir: java.io.File) extends Scan {
  override def readSchema(): StructType = CowChangeFeed.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CowFeedStream(dir)
  override def description: String = s"graft_cdf(${dir.getPath})"
}

class CowFeedStream(dir: java.io.File)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // the seed snapshot (v0) is table STATE, not a change — the feed
  // starts after it, exactly Delta's startingVersion convention
  override def initialOffset(): Offset = CowFeedOffset(0L)
  override def deserializeOffset(json: String): Offset =
    CowFeedOffset(json.trim.toLong)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()

  private def maxVersion(): Long = CowVersions.read(dir).map(_._1).max
  // AvailableNow pins the drain target at prepare time so a mutation
  // racing the drain cannot extend it
  @volatile private var target: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    target = Some(maxVersion())
  override def latestOffset(): Offset = sys.error(
    "admission-controlled source: the engine must call latestOffset(start, limit)")
  // change sets are churn-sized by design, so no per-batch row cap is
  // honored — every committed version up to the target is admitted
  override def latestOffset(startOffset: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    CowFeedOffset(target.getOrElse(maxVersion()))

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val a = startOff.asInstanceOf[CowFeedOffset].v
    val b = endOff.asInstanceOf[CowFeedOffset].v
    // one partition per version: a change set is churn-sized by design
    (a + 1 to b).map(w =>
      CowFeedPartition(w, CowChangeFeed.changesOf(dir, w))
        : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CowFeedReaderFactory()
}

case class CowFeedOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

case class CowFeedPartition(version: Long,
    rows: Seq[(String, Long, String, Double)]) extends InputPartition

case class CowFeedReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CowFeedPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.size }
      override def get(): InternalRow = {
        val (op, k, st, total) = p.rows(i)
        InternalRow(UTF8String.fromString(op), p.version, k,
          UTF8String.fromString(st), total)
      }
      override def close(): Unit = ()
    }
  }
}
