package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A V2 `TableCatalog` whose tables execute row-level DML the
  * MERGE-ON-READ way — the write-optimized counterpart of
  * [[CowDeleteCatalog]]'s copy-on-write tables, via the OTHER half of
  * the engine's row-level contract: `SupportsDelta`. Where the CoW
  * operation (a29/a30) hands the connector a full group post-image and
  * swaps data files, the delta operation hands it ONLY the changed
  * rows — the engine calls `DeltaWriter.delete/update/insert` per row,
  * keyed by the declared row identity (`k`) — and the connector
  * appends them to a DELTA LOG while the base data files stay
  * byte-identical (gated by the a31 key on file mtimes).
  *
  * Storage model = equality-deletes in miniature (the shape Iceberg v2
  * MoR / Hudi MOR / Paimon changelog tables all implement): base
  * `part-<i>-<lo>-<hi>.csv` files (same manifest-with-stats idiom as
  * the CoW tables) plus `_deltas/delta-<n>.csv`, one file per
  * committed statement, each line one op: `D,<k>` | `U,<k>,<row>` |
  * `I,<row>`. Commit stages per-task op files and publishes the
  * statement's single delta file with an atomic rename — a crash
  * before publish leaves the table unchanged (staged names are
  * invisible to the delta manifest).
  *
  * The READ side pays for the cheap writes: every scan folds the delta
  * log (ordered by commit sequence) into tombstones (deleted base
  * keys), patches (updated post-images) and inserts, then merges them
  * into the base rows per partition. The fold's cost model is the MoR
  * contract: delta state is MANIFEST-SCALE metadata (bounded by churn
  * since the last compaction, never by table size), distributed to
  * scan tasks exactly like a broadcast hash anti/semi join build side —
  * which IS the physical plan production MoR readers use for equality
  * deletes; partition-scoped delete files bound the broadcast further.
  * [[MorCompaction.compact]] folds the log back into the base files
  * (rewriting only files the log touches) and empties it — the
  * read-amplification amortizer every MoR format schedules when the
  * delta/base ratio passes a threshold.
  *
  * Economics at 100 TB: a CoW UPDATE of one row in a 1 GB group costs
  * a 1 GB rewrite at write time and nothing at read time; the MoR
  * UPDATE costs ~40 bytes at write time and a broadcast-map probe per
  * read. Streaming/CDC ingestion wants MoR; scan-heavy analytics wants
  * CoW — which is why the engine's row-level API supports both and
  * this library implements both halves.
  */
class MorDeltaCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      sys.error(s"catalog $name requires option 'root' (table directory root)"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier) = new java.io.File(root, ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  override def tableExists(ident: Identifier): Boolean = dirOf(ident).isDirectory
  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!dir.isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    new MorTable(s"$catalogName.${ident.name}", dir)
  }

  /** `VERSION AS OF n` (a33): MoR time travel is LOG-PREFIX REPLAY —
    * snapshot n = base files + the first n committed delta files, so a
    * historical read costs exactly what the current read costs (no
    * archive, no file copies: base files are immutable and delta files
    * are append-only). This is the structural advantage over the CoW
    * side's a27 versioning, which must retire file copies; the flip
    * side is that vacuuming old history requires compaction. Snapshots
    * are read-only (DML refused at analysis). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!dir.isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    val v = version.toLong
    val have = MorDeltas.deltaFiles(dir).map(_._1)
    val floor = MorDeltas.compactedSeq(dir)
    // valid snapshots: the compaction floor itself (= the folded base)
    // and every committed statement above it; below the floor the
    // pre-images were vacuumed by compaction — refuse, never serve the
    // folded state as history
    require(v == floor || (v > floor && have.contains(v)),
      s"VERSION AS OF $v: no such snapshot (have $floor${
        have.map("," + _).mkString}${
        if (floor > 0) s"; history below $floor vacuumed by compaction"
        else ""})")
    new MorTable(s"$catalogName.${ident.name}@v$v", dir, Some(v))
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("tables are seeded externally")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "MoR tables do not evolve (see CowDeleteCatalog for ADD COLUMNS)")
  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    val ok = d.isDirectory
    if (ok) MorDeltas.deleteRec(d)
    ok
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename unsupported")
}

/** The delta log: parsing, ordering, and the fold that turns committed
  * op files into the scan's merged-view state. */
object MorDeltas {
  // same columns as the CoW tables, but the row identity `k` is
  // declared NON-NULLABLE — the engine refuses a nullable rowId (NULL
  // never equals NULL, so delta ops could not be keyed)
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("st", StringType, nullable = true),
    StructField("total", DoubleType, nullable = true)))

  def deltaDir(dir: java.io.File) = new java.io.File(dir, "_deltas")

  private def compactMarker(dir: java.io.File) =
    new java.io.File(deltaDir(dir), "_compacted")

  /** The last statement sequence a compaction folded into base (0 =
    * never compacted). Snapshots below it are VACUUMED — their
    * pre-images no longer exist anywhere, so time travel to them must
    * refuse rather than silently serve the folded state. */
  def compactedSeq(dir: java.io.File): Long =
    if (!compactMarker(dir).isFile) 0L
    else java.nio.file.Files.readString(compactMarker(dir).toPath).trim.toLong

  def recordCompaction(dir: java.io.File, seq: Long): Unit = {
    deltaDir(dir).mkdirs()
    java.nio.file.Files.writeString(compactMarker(dir).toPath, seq.toString)
    ()
  }

  private val DeltaName = """delta-(\d+)\.csv""".r

  /** Committed delta files, ascending by statement sequence. */
  def deltaFiles(dir: java.io.File): Seq[(Long, java.io.File)] =
    Option(deltaDir(dir).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap { f =>
        f.getName match {
          case DeltaName(n) => Some((n.toLong, f))
          case _ => None
        }
      }.sortBy(_._1)

  /** The folded delta state. `patches` are base-row post-images;
    * `inserts` keep first-arrival order (re-inserting a key after its
    * delete re-appends). All three are bounded by churn since the last
    * compaction — the broadcast-sized invariant the read path relies
    * on. Rows are (k, st, total) as strings, the file encoding. */
  case class State(tombstones: Set[Long], patches: Map[Long, Array[String]],
      inserts: Seq[Array[String]]) {
    def isEmpty: Boolean =
      tombstones.isEmpty && patches.isEmpty && inserts.isEmpty
  }

  /** Fold the log (or, for a pinned `VERSION AS OF` snapshot, its
    * prefix ≤ upTo) into the scan's merged-view state. */
  def state(dir: java.io.File, upTo: Option[Long] = None): State = {
    val tomb = collection.mutable.Set.empty[Long]
    val patch = collection.mutable.Map.empty[Long, Array[String]]
    val ins = collection.mutable.LinkedHashMap.empty[Long, Array[String]]
    deltaFiles(dir).filter(df => upTo.forall(df._1 <= _)).foreach { case (_, f) =>
      java.nio.file.Files.readAllLines(f.toPath).forEach { ln =>
        val parts = ln.split(",", -1)
        val k = parts(1).toLong
        parts(0) match {
          case "D" =>
            if (ins.contains(k)) ins.remove(k): Unit
            else { tomb += k; patch.remove(k): Unit }
          case "U" =>
            if (ins.contains(k)) ins(k) = parts.drop(1)
            else { patch(k) = parts.drop(1); tomb -= k }
          case "I" => ins(k) = parts.drop(1)
          case op => sys.error(s"corrupt delta line in ${f.getName}: $op")
        }
      }
    }
    State(tomb.toSet, patch.toMap, ins.values.toSeq)
  }

  def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}

/** Fold the delta log back into the base files — MoR's compaction.
  * Rewrites ONLY base files the log touches (survivors with patches
  * applied; untouched files stay byte-identical — spec-gated), appends
  * inserts as one new base file with its own k-range stats, then
  * clears the log. Read-equivalence before/after is the contract
  * (spec-pinned). Production schedules this per partition when the
  * delta/base ratio passes a threshold; the fold itself is
  * embarrassingly parallel (file-local rewrite + one append). */
object MorCompaction {
  def compact(dir: java.io.File): Unit = {
    val st = MorDeltas.state(dir)
    if (st.isEmpty) return
    val touched = st.tombstones ++ st.patches.keySet
    CowTable.manifest(dir).foreach { case (f, lo, hi) =>
      // stats pruning: a file whose k-range holds no touched key is
      // left physically untouched
      if (touched.exists(k => lo <= k && k <= hi)) {
        val kept = new util.ArrayList[String]()
        var (nlo, nhi) = (Long.MaxValue, Long.MinValue)
        java.nio.file.Files.readAllLines(f.toPath).forEach { ln =>
          val k = ln.substring(0, ln.indexOf(',')).toLong
          if (!st.tombstones.contains(k)) {
            kept.add(st.patches.get(k).map(_.mkString(",")).getOrElse(ln))
            if (k < nlo) nlo = k
            if (k > nhi) nhi = k
          }
        }
        val idx = f.getName.split("-")(1)
        if (kept.isEmpty) { f.delete(): Unit }
        else {
          val tmp = new java.io.File(dir, s".tmp-${f.getName}")
          java.nio.file.Files.write(tmp.toPath, kept)
          f.delete()
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(dir, s"part-$idx-$nlo-$nhi.csv").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
    if (st.inserts.nonEmpty) {
      val ks = st.inserts.map(_.head.toLong)
      val base = CowTable.manifest(dir)
        .map(_._1.getName.split("-")(1).toInt).foldLeft(-1)(math.max) + 1
      java.nio.file.Files.write(
        new java.io.File(dir, s"part-$base-${ks.min}-${ks.max}.csv").toPath,
        java.util.Arrays.asList(st.inserts.map(_.mkString(",")): _*))
    }
    val folded = MorDeltas.deltaFiles(dir).map(_._1)
      .foldLeft(MorDeltas.compactedSeq(dir))(math.max)
    MorDeltas.deltaFiles(dir).foreach(_._2.delete())
    MorDeltas.recordCompaction(dir, folded)
  }
}

class MorTable(tableName: String, dir: java.io.File,
    pinned: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  override def name(): String = tableName
  override def schema(): StructType = MorDeltas.schema
  // a pinned snapshot (VERSION AS OF) is read-only by construction
  override def capabilities(): util.Set[TableCapability] =
    if (pinned.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = MorDeltas.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new MorScan(dir, required, pinned)
    }

  /** The DELTA-BASED row-level operation: `rowId` declares the row
    * identity the engine keys deletes/updates by; the rewrite plan is
    * `WriteDelta`, not `ReplaceData` — the connector sees only changed
    * rows. The operation's scan serves the current MERGED view (prior
    * deltas applied), so consecutive statements compose. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinned.isEmpty, "cannot mutate a VERSION AS OF snapshot")
    () => new MorDeltaOperation(dir, info.command)
  }

  /** Plain appends (INSERT INTO, and the engine's insert-only-MERGE
    * optimization, which lowers to AppendData instead of a row-level
    * op) also land in the DELTA LOG as `I` ops — base files stay
    * immutable until compaction, the log-file idiom of write-optimized
    * MoR tables. Reuses the delta write's stage/commit machinery: the
    * writer's plain `write` IS `insert`. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, "cannot append to a VERSION AS OF snapshot")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new MorDeltaBatchWrite(dir, info.schema())
      }
    }
  }
}

class MorDeltaOperation(dir: java.io.File,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def rowId(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("k"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = MorDeltas.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new MorScan(dir, required)
    }
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new MorDeltaBatchWrite(dir, info.schema())
      }
    }
}

/** Merged-view scan: one partition per base file (each applies the
  * folded tombstones/patches — the broadcast-build-side shape) plus
  * one partition serving the insert tail. Delta state is resolved ONCE
  * at scan build (driver side, manifest-scale) and shipped inside the
  * partitions/factory like any broadcast build side. */
class MorScan(dir: java.io.File, required: StructType,
    pinned: Option[Long] = None) extends Scan with Batch {
  private val state = MorDeltas.state(dir, pinned)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val basePartitions = CowTable.manifest(dir).map { case (f, lo, hi) =>
      // ship only the state slice this file's k-range can see — the
      // partition-scoped delete-file idiom
      MorBasePartition(f.getAbsolutePath,
        state.tombstones.filter(k => lo <= k && k <= hi),
        state.patches.filter { case (k, _) => lo <= k && k <= hi })
        : InputPartition
    }
    val insertTail =
      if (state.inserts.isEmpty) Seq.empty
      else Seq(MorInsertPartition(state.inserts): InputPartition)
    (basePartitions ++ insertTail).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    MorReaderFactory(required)
}

case class MorBasePartition(path: String, tombstones: Set[Long],
    patches: Map[Long, Array[String]]) extends InputPartition
case class MorInsertPartition(rows: Seq[Array[String]]) extends InputPartition

case class MorReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  private def toRow(parts: Array[String]): InternalRow = {
    val full = MorDeltas.schema
    InternalRow.fromSeq(required.fields.toSeq.map { f =>
      val j = full.fieldNames.indexOf(f.name)
      f.dataType match {
        case LongType => parts(j).toLong
        case DoubleType => parts(j).toDouble
        case StringType => UTF8String.fromString(parts(j))
        case dt => sys.error(s"unreachable: $dt")
      }
    })
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case MorBasePartition(path, tombstones, patches) =>
        val lines = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(path))
        new PartitionReader[InternalRow] {
          private var i = -1
          private var cur: InternalRow = _
          override def next(): Boolean = {
            i += 1
            while (i < lines.size() && {
              val ln = lines.get(i)
              tombstones.contains(ln.substring(0, ln.indexOf(',')).toLong)
            }) i += 1
            if (i >= lines.size()) false
            else {
              val ln = lines.get(i)
              val parts = ln.split(",", -1)
              cur = toRow(patches.getOrElse(parts(0).toLong, parts))
              true
            }
          }
          override def get(): InternalRow = cur
          override def close(): Unit = {}
        }
      case MorInsertPartition(rows) =>
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = toRow(rows(i))
          override def close(): Unit = {}
        }
      case other => sys.error(s"unreachable partition $other")
    }
}

case class MorStagedDelta(name: String, ops: Long) extends WriterCommitMessage

/** One committed statement = one published delta file. Tasks stage op
  * lines under dot-prefixed names (invisible to [[MorDeltas.deltaFiles]]);
  * the driver-side commit concatenates them in deterministic
  * (partition, task) order into `delta-<n>.csv` via temp-file +
  * ATOMIC_MOVE — crash before publish leaves no trace. Within one
  * statement each row identity appears at most once (the engine's
  * row-level contract on a unique rowId), so op order across tasks
  * cannot matter; ACROSS statements order is the file sequence. */
class MorDeltaBatchWrite(dir: java.io.File, rowSchema: StructType)
    extends DeltaBatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory =
    MorDeltaWriterFactory(MorDeltas.deltaDir(dir).getAbsolutePath, rowSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case m: MorStagedDelta if m.name.nonEmpty => m.name }.sorted
    val dd = MorDeltas.deltaDir(dir)
    val all = new util.ArrayList[String]()
    staged.foreach { n =>
      all.addAll(java.nio.file.Files.readAllLines(new java.io.File(dd, n).toPath))
    }
    if (!all.isEmpty) {
      val seq = MorDeltas.deltaFiles(dir).map(_._1)
        .foldLeft(MorDeltas.compactedSeq(dir))(math.max) + 1
      val tmp = new java.io.File(dd, s".publish-$seq")
      java.nio.file.Files.write(tmp.toPath, all)
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(dd, s"delta-$seq.csv").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    staged.foreach(n => new java.io.File(dd, n).delete())
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: MorStagedDelta if m.name.nonEmpty =>
      new java.io.File(MorDeltas.deltaDir(dir), m.name).delete() }: Unit
}

case class MorDeltaWriterFactory(deltaDirPath: String, rowSchema: StructType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] = {
    val dd = new java.io.File(deltaDirPath); dd.mkdirs()
    val staged = new java.io.File(dd, f".stage-$partitionId%05d-$taskId")
    new DeltaWriter[InternalRow] {
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(staged))
      private var n = 0L
      // the engine's row projection carries the table's data columns;
      // resolve positions by name once, defensively (a DELETE-only
      // write may omit them — then serializeRow is never called)
      private lazy val pos = MorDeltas.schema.fieldNames.map { n =>
        val i = rowSchema.fieldNames.indexOf(n)
        require(i >= 0, s"delta write schema ${rowSchema.fieldNames.mkString(",")} " +
          s"lacks data column $n")
        i
      }
      private def serializeRow(row: InternalRow): String = {
        val k = row.getLong(pos(0))
        val st = row.getUTF8String(pos(1)).toString
        require(st.nonEmpty && !st.contains(","),
          s"delta: st must be non-empty, comma-free (got '$st')")
        s"$k,$st,${row.getDouble(pos(2))}"
      }
      private def emit(line: String): Unit = {
        out.write(line); out.newLine(); n += 1
      }
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        emit(s"D,${id.getLong(0)}")
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        val line = serializeRow(row)
        require(line.substring(0, line.indexOf(',')).toLong == id.getLong(0),
          "delta update: post-image row id differs from the declared rowId " +
            "(UPDATE of the identity column must lower to delete+insert)")
        emit(s"U,$line")
      }
      override def insert(row: InternalRow): Unit =
        emit(s"I,${serializeRow(row)}")
      // the plain-append path (INSERT INTO / insert-only MERGE)
      override def write(row: InternalRow): Unit = insert(row)
      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0L) { staged.delete(); MorStagedDelta("", 0L) }
        else MorStagedDelta(staged.getName, n)
      }
      override def abort(): Unit = { out.close(); staged.delete(): Unit }
      override def close(): Unit = {}
    }
  }
}
