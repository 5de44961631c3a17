package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A V2 `TableCatalog` whose tables EXECUTE row-level `DELETE FROM` —
  * the missing half of j24 (plans/DmlSql lowers the DELETE *language*
  * over views; this connector implements the engine's actual row-level
  * contract, `SupportsDeleteV2`, so the SAME statement runs end-to-end
  * through analyzer → predicate translation → connector).
  *
  * Storage model = the copy-on-write lake shape in miniature: a table is
  * a directory of CSV data files, each carrying its own `k`-range STATS
  * in the file name (`part-<i>-<lo>-<hi>.csv` — the sidecar-stats idiom
  * every lakehouse format implements in its manifest). `deleteWhere`:
  *  1. translates the pushed V2 [[Predicate]]s (comparisons on the stats
  *     column `k`); `canDeleteWhere` REFUSES anything it cannot prove it
  *     can apply exactly — the engine then raises instead of silently
  *     half-deleting (the contract's whole point);
  *  2. FILE-LEVEL PRUNES: files whose [lo, hi] cannot intersect the
  *     predicate are left PHYSICALLY UNTOUCHED (verified by the a25
  *     key's in-query gate on file mtimes) — at 100 TB this is why a
  *     keyed delete costs minutes, not a full-table rewrite;
  *  3. rewrites only the intersecting files (filter survivors, write to
  *     a temp sibling, atomic rename) and refreshes their stats.
  *
  * The rewrite here is file-local and runs where the catalog runs (one
  * small file at a time); the production version distributes the same
  * per-file filter as tasks — the protocol (stats pruning + CoW swap +
  * exact-predicate refusal) is identical.
  */
class CowDeleteCatalog extends TableCatalog with StagingTableCatalog {
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
    new CowTable(s"$catalogName.${ident.name}", dir)
  }

  /** `VERSION AS OF n` (a27): a read-only table pinned to snapshot n's
    * file list — live or archived copies per the resolution rule.
    * Requires versioning enabled on the table ([[CowVersions.enable]]). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!dir.isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    require(CowVersions.enabled(dir),
      s"table ${ident.name} is not versioned — call CowVersions.enable first")
    val files = CowVersions.resolve(dir, version.toLong)
    new CowTable(s"$catalogName.${ident.name}@v$version", dir, Some(files))
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "tables are seeded externally or created atomically via CTAS (stageCreate)")

  /** ATOMIC CTAS (a32): `CREATE TABLE … AS SELECT` through the staging
    * contract — the engine stages the table, runs the whole data write
    * into it, and only a successful write COMMITS the staged changes;
    * any failure aborts and the namespace never saw a half-written
    * table (the a32 key gates this with a mid-write poison row). The
    * staged directory is a temp sibling invisible to `listTables`/
    * `loadTable`; commit is one atomic rename — the same
    * publish-by-rename protocol every write path of this connector
    * uses, now for table CREATION. Schema is persisted in a
    * `_base.tsv` sidecar (generalizing the fixed k/st/total demo
    * schema); the leading column must be BIGINT — it becomes the
    * file-stats/row-id column everything else here prunes on. */
  /** Shared validation + staging-directory setup for CTAS and RTAS. */
  private def stageValidated(ident: Identifier, schema: StructType,
      partitions: Array[Transform]): java.io.File = {
    require(partitions.isEmpty,
      "CTAS with PARTITIONED BY is unsupported (files are the partition unit)")
    require(schema.fields.nonEmpty && schema.fields.head.dataType == LongType,
      s"CTAS: the leading column must be BIGINT (the stats/row-id column); " +
        s"got ${schema.simpleString}")
    schema.fields.foreach { f =>
      require(CowTable.typeTag(f.dataType).isDefined,
        s"CTAS: unsupported column type ${f.name}: ${f.dataType.simpleString} " +
          "(long/double/string only)")
      require(!f.name.startsWith("_") && !f.name.contains(",") &&
        !f.name.contains("\t"), s"CTAS: invalid column name '${f.name}'")
    }
    val stage = new java.io.File(root,
      s".stage-${ident.name}-${java.util.UUID.randomUUID.toString.take(8)}")
    require(stage.mkdirs(), s"stageCreate: cannot create ${stage.getPath}")
    CowTable.persistBase(stage, schema)
    stage
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName, ident.name))
    val stage = stageValidated(ident, schema, partitions)
    new CowStagedTable(s"$catalogName.${ident.name}", dirOf(ident), stage, schema)
  }
  override def stageCreate(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable =
    stageCreate(ident,
      StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable))),
      partitions, properties)
  /** ATOMIC RTAS (a34): `REPLACE TABLE … AS SELECT` stages the new
    * content exactly like stageCreate; ONLY a successful data write
    * swaps it in. Between stage and commit — and after any failure —
    * readers keep seeing the ORIGINAL table (gated in-key by a poison
    * RTAS whose failure must leave the original byte-identical). The
    * commit is retire-then-publish: the old directory moves to an
    * invisible `.replaced-*` name, the staged tree renames into place,
    * the old tree is deleted — the same protocol as the per-file CoW
    * swap, at whole-table granularity. (A production catalog swaps a
    * METADATA POINTER instead, making the two renames one CAS — the
    * staging contract is identical; the window here is the
    * driver-local analogue, documented not hidden.) */
  override def stageReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    val schema =
      StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable)))
    val stage = stageValidated(ident, schema, partitions)
    new CowStagedTable(s"$catalogName.${ident.name}", dirOf(ident), stage,
      schema, replacing = true)
  }
  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable =
    if (tableExists(ident)) stageReplace(ident, columns, partitions, properties)
    else stageCreate(ident, columns, partitions, properties)

  /** Schema evolution, write-side (a26): ONLY trailing ADD COLUMN is
    * supported — the one evolution every lakehouse format ships first,
    * because it is metadata-only: history files are NEVER rewritten
    * (readers null-pad short rows against the current schema), and the
    * new column starts materializing with the next write. Everything
    * else (drop/rename/retype) would require a CoW rewrite of history
    * or versioned per-file schemas — REFUSED loudly rather than faked. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!dir.isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    val adds = changes.map {
      case a: TableChange.AddColumn
          if a.fieldNames.length == 1 && a.isNullable &&
            CowTable.typeTag(a.dataType).isDefined =>
        val name = a.fieldNames.head
        val taken = CowTable.currentSchema(dir).fieldNames.toSet
        require(!taken.contains(name),
          s"ADD COLUMN $name: column already exists in ${ident.name}")
        StructField(name, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"CowDeleteCatalog supports only nullable top-level ADD COLUMN " +
          s"of long/double/string (got $other)")
    }
    CowTable.persistAdded(dir, CowTable.addedColumns(dir) ++ adds)
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    val ok = d.isDirectory
    if (ok) { Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete()); d.delete() }
    ok
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename unsupported")
}

/** The staged side of a32's atomic CTAS: a write-only table whose data
  * write lands in the invisible staging directory; `commitStagedChanges`
  * publishes it with ONE atomic rename into the catalog namespace,
  * `abortStagedChanges` deletes the staging tree. Between stage and
  * commit the table does not exist for any reader — crash-consistency
  * by construction, the same staged-then-rename protocol the insert/
  * replace/delta writes use per file, here for the whole table. */
class CowStagedTable(tableName: String, finalDir: java.io.File,
    stageDir: java.io.File, tableSchema: StructType,
    replacing: Boolean = false)
    extends StagedTable with SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  // TRUNCATE because the engine plans RTAS as overwrite-by-truncate
  // into the staged table — truncating the (empty) staging tree is a
  // no-op; the real retire happens at commitStagedChanges
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
        this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: BatchWrite =
            new CowBatchWrite(stageDir, tableSchema)
        }
    }
  override def commitStagedChanges(): Unit =
    if (replacing) {
      // retire-then-publish (a34): the old tree moves to an invisible
      // name, the staged tree renames in, the old tree is deleted
      require(finalDir.exists(),
        s"commitStagedChanges: ${finalDir.getName} vanished during RTAS")
      val retired = new java.io.File(finalDir.getParentFile,
        s".replaced-${finalDir.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
      java.nio.file.Files.move(finalDir.toPath, retired.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(stageDir.toPath, finalDir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      abortRec(retired)
    } else {
      require(!finalDir.exists(),
        s"commitStagedChanges: ${finalDir.getName} already exists")
      java.nio.file.Files.move(stageDir.toPath, finalDir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  private def abortRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(abortRec)
    f.delete(): Unit
  }
  override def abortStagedChanges(): Unit = abortRec(stageDir)
}

/** Snapshot versioning for a [[CowTable]] directory (a27) — the other
  * half of the lakehouse storage story next to a25's CoW delete and
  * a26's metadata-only evolution: every mutation first snapshots the
  * pre-state, retired data files move to `_archive/` instead of being
  * deleted, and `_versions.log` records each snapshot's file list, so
  * `VERSION AS OF n` re-reads any historical state until `vacuum`
  * expires it. OPT-IN per table (`enable`): a25's un-versioned tables
  * keep their delete-means-delete contract unchanged.
  *
  * Collision safety: one file NAME can be created, retired, and
  * re-created (the insert path reuses freed indices), so archived
  * copies are keyed by the version whose mutation retired them
  * (`rv<m>-<name>`). Resolving `name` for snapshot v: the copy live AT
  * v is the one archived at the SMALLEST retirement version m > v —
  * retirement versions per name strictly increase, so that copy is
  * unique — else the currently-live file. `vacuum(keep)` drops log
  * entries below the cutoff and deletes exactly the archive copies
  * `rv<m>-*` with m ≤ the oldest kept version (such a copy only serves
  * snapshots v < m, all expired). */
object CowVersions {
  private def logFile(dir: java.io.File) = new java.io.File(dir, "_versions.log")
  private def archiveDir(dir: java.io.File) = new java.io.File(dir, "_archive")

  def enabled(dir: java.io.File): Boolean = logFile(dir).isFile

  /** version -> data-file names of that snapshot, ascending. */
  def read(dir: java.io.File): Seq[(Long, Seq[String])] =
    if (!enabled(dir)) Seq.empty
    else java.nio.file.Files.readAllLines(logFile(dir).toPath)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { ln =>
        val parts = ln.split("\t", 2)
        (parts(0).toLong,
          if (parts.length < 2 || parts(1).isEmpty) Seq.empty
          else parts(1).split(",").toSeq)
      }

  private def liveNames(dir: java.io.File): Seq[String] =
    CowTable.manifest(dir).map(_._1.getName)

  private def appendLine(dir: java.io.File, v: Long, names: Seq[String]): Unit =
    java.nio.file.Files.write(logFile(dir).toPath,
      java.util.Arrays.asList(s"$v\t${names.mkString(",")}"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  /** Turn versioning ON: record the current state as snapshot 0. */
  def enable(dir: java.io.File): Unit =
    if (!enabled(dir)) appendLine(dir, 0L, liveNames(dir))

  /** Retire a data file under the version the in-flight mutation will
    * create (move, never delete — snapshots still reference it). */
  def retire(dir: java.io.File, f: java.io.File): Unit = {
    val ad = archiveDir(dir); ad.mkdirs()
    val v = read(dir).map(_._1).max + 1
    java.nio.file.Files.move(f.toPath,
      new java.io.File(ad, s"rv$v-${f.getName}").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Record the post-mutation state as the next snapshot. */
  def commitSnapshot(dir: java.io.File): Unit =
    appendLine(dir, read(dir).map(_._1).max + 1, liveNames(dir))

  /** Absolute paths of snapshot v's files, per the resolution rule. */
  def resolve(dir: java.io.File, v: Long): Seq[java.io.File] = {
    val versions = read(dir)
    val entry = versions.find(_._1 == v).getOrElse(sys.error(
      s"VERSION AS OF $v: no such snapshot (have ${versions.map(_._1).mkString(",")})"))
    val Archived = """rv(\d+)-(.+)""".r
    val archived = Option(archiveDir(dir).listFiles()).getOrElse(Array.empty)
      .flatMap { f => f.getName match {
        case Archived(m, n) => Some((n, m.toLong, f))
        case _ => None
      }}.toSeq
    entry._2.map { name =>
      archived.filter { case (n, m, _) => n == name && m > v }
        .sortBy(_._2).headOption.map(_._3)
        .getOrElse {
          val live = new java.io.File(dir, name)
          require(live.isFile, s"snapshot $v references $name but neither a " +
            "live nor an archived copy exists — vacuumed or corrupt")
          live
        }
    }
  }

  /** Manifest diff for the change feed (a28): (onlyA, onlyB, common)
    * as resolved absolute paths. Files in `common` are byte-identical
    * in both snapshots (immutable data files) — a CDC reader skips
    * them without opening a single one. */
  def manifestDiff(dir: java.io.File, va: Long, vb: Long)
      : (Seq[String], Seq[String], Seq[String]) = {
    val a = resolve(dir, va).map(_.getAbsolutePath)
    val b = resolve(dir, vb).map(_.getAbsolutePath)
    val common = a.toSet.intersect(b.toSet)
    (a.filterNot(common), b.filterNot(common), common.toSeq.sorted)
  }

  /** Expire all but the newest `keep` snapshots; physically delete the
    * archive copies that only served expired snapshots. */
  def vacuum(dir: java.io.File, keep: Int): Unit = {
    require(keep >= 1, "vacuum must keep at least the latest snapshot")
    val versions = read(dir)
    val kept = versions.takeRight(keep)
    val minKept = kept.head._1
    val tmp = new java.io.File(dir, "._versions.log.tmp")
    java.nio.file.Files.write(tmp.toPath, java.util.Arrays.asList(
      kept.map { case (v, ns) => s"$v\t${ns.mkString(",")}" }: _*))
    java.nio.file.Files.move(tmp.toPath, logFile(dir).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val Archived = """rv(\d+)-.+""".r
    Option(archiveDir(dir).listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case Archived(m) if m.toLong <= minKept => f.delete(): Unit
        case _ =>
      }
    }
  }
}

object CowTable {
  // declared nullable so INSERT INTO ... SELECT from always-nullable
  // parquet reads passes V2 write analysis; the writer enforces base
  // columns non-null at runtime (the connector's own integrity check)
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("st", StringType, nullable = true),
    StructField("total", DoubleType, nullable = true)))

  /** round-trippable type tag for the schema sidecar (a26). */
  def typeTag(dt: DataType): Option[String] = dt match {
    case LongType => Some("long")
    case DoubleType => Some("double")
    case StringType => Some("string")
    case _ => None
  }
  private def tagType(tag: String): DataType = tag match {
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case other => sys.error(s"corrupt _schema.tsv: unknown type tag $other")
  }

  private def schemaFile(dir: java.io.File) = new java.io.File(dir, "_schema.tsv")

  /** Columns ADDED after seeding, from the `_schema.tsv` sidecar — the
    * table-level schema manifest (what a lakehouse format keeps in its
    * metadata log). Base files never learn about them; readers null-pad. */
  def addedColumns(dir: java.io.File): Seq[StructField] = {
    val f = schemaFile(dir)
    if (!f.isFile) Seq.empty
    else java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty).map { ln =>
        val Array(name, tag) = ln.split("\t", 2)
        StructField(name, tagType(tag), nullable = true)
      }
  }

  def persistAdded(dir: java.io.File, added: Seq[StructField]): Unit = {
    val lines = added.map(f => s"${f.name}\t${typeTag(f.dataType).get}")
    val tmp = new java.io.File(dir, "._schema.tsv.tmp")
    java.nio.file.Files.write(tmp.toPath, java.util.Arrays.asList(lines: _*))
    java.nio.file.Files.move(tmp.toPath, schemaFile(dir).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def baseFile(dir: java.io.File) = new java.io.File(dir, "_base.tsv")

  /** The table's SEEDED schema: the fixed k/st/total triple for the
    * externally-seeded tables, or the `_base.tsv` sidecar a staged CTAS
    * (a32) persisted — the storage format generalized past the fixed
    * demo schema while keeping one reader/writer/manifest. */
  def baseSchema(dir: java.io.File): StructType =
    if (!baseFile(dir).isFile) schema
    else StructType(
      java.nio.file.Files.readAllLines(baseFile(dir).toPath)
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { ln =>
          val Array(name, tag) = ln.split("\t", 2)
          StructField(name, tagType(tag), nullable = true)
        })

  def persistBase(dir: java.io.File, s: StructType): Unit = {
    val lines = s.fields.map(f => s"${f.name}\t${typeTag(f.dataType).get}").toSeq
    val tmp = new java.io.File(dir, "._base.tsv.tmp")
    java.nio.file.Files.write(tmp.toPath, java.util.Arrays.asList(lines: _*))
    java.nio.file.Files.move(tmp.toPath, baseFile(dir).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Columns [0, prefix) are integrity-required NON-NULL in the file
    * encoding; at and beyond it the empty field encodes NULL. Legacy
    * fixed-schema tables pin 3 (k/st/total all required); CTAS tables
    * require only the leading stats/row-id column. */
  def nonNullPrefix(dir: java.io.File): Int =
    if (baseFile(dir).isFile) 1 else 3

  def currentSchema(dir: java.io.File): StructType =
    StructType(baseSchema(dir).fields ++ addedColumns(dir))

  private val FileName = """part-(\d+)-(-?\d+)-(-?\d+)\.csv""".r
  // archived copies carry the retirement prefix (rv<m>-) but keep the
  // original stats-bearing name — the agg-pushdown scan (a35) reads
  // stats from pinned snapshot files too
  private val StatName = """(?:rv\d+-)?part-\d+-(-?\d+)-(-?\d+)\.csv""".r
  def statsOf(name: String): Option[(Long, Long)] = name match {
    case StatName(lo, hi) => Some((lo.toLong, hi.toLong))
    case _ => None
  }

  /** (file, lo, hi) for each data file — the manifest, parsed from names. */
  def manifest(dir: java.io.File): Seq[(java.io.File, Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap { f =>
        f.getName match {
          case FileName(_, lo, hi) => Some((f, lo.toLong, hi.toLong))
          case _ => None
        }
      }.sortBy(_._1.getName)

  /** One supported comparison on the stats column: k <op> literal
    * ("true" = the ALWAYS_TRUE predicate TRUNCATE routes through
    * SupportsDeleteV2's default `truncateTable`). */
  case class KBound(op: String, v: Long) {
    def rowMatches(k: Long): Boolean = op match {
      case "true" => true
      case "<" => k < v
      case "<=" => k <= v
      case ">" => k > v
      case ">=" => k >= v
      case "=" => k == v
    }
    /** can rows of a file with k-range [lo, hi] match? */
    def mayIntersect(lo: Long, hi: Long): Boolean = op match {
      case "true" => true
      case "<" => lo < v
      case "<=" => lo <= v
      case ">" => hi > v
      case ">=" => hi >= v
      case "=" => lo <= v && v <= hi
    }
  }

  /** Translate the engine's pushed predicates; None = not provably
    * exact, the catalog must refuse the delete. */
  def translate(predicates: Array[Predicate]): Option[Seq[KBound]] = {
    val bounds = predicates.map { p =>
      p.name() match {
        case "ALWAYS_TRUE" => Some(KBound("true", 0L))
        case op @ ("<" | "<=" | ">" | ">=" | "=") =>
          p.children() match {
            case Array(f: NamedReference, l: Literal[_])
                if f.fieldNames().sameElements(Array("k")) &&
                  (l.dataType == LongType || l.dataType == IntegerType) =>
              Some(KBound(op, l.value match {
                case i: java.lang.Integer => i.longValue
                case j: java.lang.Long => j.longValue
                case other => sys.error(s"unexpected literal $other")
              }))
            case _ => None
          }
        case _ => None
      }
    }
    if (bounds.forall(_.isDefined)) Some(bounds.flatten.toSeq) else None
  }
}

class CowTable(tableName: String, dir: java.io.File,
    pinned: Option[Seq[java.io.File]] = None)
    extends Table with SupportsRead with SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  import CowTable._

  /** `_file` metadata (a29's file-level groups): the group identity the
    * runtime group filter prunes on — the row-level scan serves it; the
    * replace write's commit swaps only the files it names. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
    })

  /** UPDATE execution (a29): the GROUP-BASED (copy-on-write) row-level
    * operation — the engine rewrites the affected group with the SET
    * expressions applied and the connector swaps the group's files.
    * Granularity here is the whole table (one group); a format with
    * finer groups adds `_file` metadata + runtime group filtering on
    * the same protocol. DELETE does NOT route here: `canDeleteWhere`'s
    * metadata path (a25) takes precedence for exact predicates, which
    * is the correct economics (metadata delete ≪ CoW rewrite). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty, "cannot mutate a VERSION AS OF snapshot")
    () => new CowRowLevelOperation(dir, info.command)
  }

  override def name(): String = tableName
  override def schema(): StructType = currentSchema(dir)
  // a pinned snapshot (VERSION AS OF) is read-only by construction
  override def capabilities(): util.Set[TableCapability] =
    if (pinned.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates {
      // serves pruned data columns plus `_file` when referenced (the
      // group-filter subquery of a29's row-level ops reads it through
      // THIS scan — the relation's scan, not the rewrite scan)
      private var required: StructType = currentSchema(dir)
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      /** Aggregate pushdown (a35): an ungrouped MIN/MAX over the stats
        * column is answered from the MANIFEST — zero data rows read.
        * Anything else (COUNT — the file names carry no row counts —
        * SUM, other columns, GROUP BY) is REFUSED and the engine falls
        * back to the row scan + its own aggregation; partial results
        * are never faked. */
      private var pushedAgg: Option[Seq[Boolean]] = None // true = Min
      private def statsCol = baseSchema(dir).fields.head.name
      private def isStatsRef(e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case r: NamedReference => r.fieldNames.sameElements(Array(statsCol))
          case _ => false
        }
      private def minMaxOnly(agg: aggregate.Aggregation): Option[Seq[Boolean]] =
        if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
          None
        else {
          val fs = agg.aggregateExpressions.toSeq.map {
            case m: aggregate.Min if isStatsRef(m.column) => Some(true)
            case m: aggregate.Max if isStatsRef(m.column) => Some(false)
            case _ => None
          }
          if (fs.forall(_.isDefined)) Some(fs.flatten) else None
        }
      override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
        minMaxOnly(agg).isDefined
      override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
        minMaxOnly(agg) match {
          case some @ Some(_) => pushedAgg = some; true
          case None => false
        }
      }
      override def build(): Scan = pushedAgg match {
        case Some(funcs) => new CowAggScan(dir, pinned, funcs)
        case None => new CowScan(dir, pinned, required)
      }
    }

  /** INSERT INTO leg (a26): rows arrive in the table's CURRENT schema.
    * Tasks stage to temp files; task commit (serialized by the commit
    * coordinator) renames to `part-<idx>-<lo>-<hi>.csv` with the file's
    * own k-range stats — a new file enters the manifest with exactly the
    * metadata the delete path (a25) prunes on. Base columns are
    * non-nullable and enforced; added columns encode NULL as the empty
    * field, matching how history files (shorter rows) read back. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new CowBatchWrite(dir, currentSchema(dir))
        }
    }

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    pinned.isEmpty && translate(predicates).isDefined

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(pinned.isEmpty, "cannot DELETE from a VERSION AS OF snapshot")
    val bounds = translate(predicates).getOrElse(
      sys.error(s"deleteWhere called with untranslatable predicates: " +
        predicates.mkString("[", ", ", "]")))
    val versioned = CowVersions.enabled(dir)
    var changed = false
    // a versioned table's touched files RETIRE to the archive (snapshots
    // still reference them); an un-versioned table keeps a25's
    // delete-means-delete contract
    def dispose(f: java.io.File): Unit =
      if (versioned) CowVersions.retire(dir, f) else { f.delete(): Unit }
    // conjunction semantics: a row is deleted iff EVERY predicate matches
    def deletes(k: Long) = bounds.forall(_.rowMatches(k))
    manifest(dir).foreach { case (f, lo, hi) =>
      // file-level pruning: every predicate must be able to match inside
      // [lo, hi] for any row of this file to be deletable — else the
      // file is left physically untouched (mtime-gated by the a25 key)
      if (bounds.forall(_.mayIntersect(lo, hi))) {
        changed = true
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        val kept = new util.ArrayList[String]()
        lines.forEach { ln =>
          if (!deletes(ln.substring(0, ln.indexOf(',')).toLong)) kept.add(ln)
        }
        val idx = f.getName.split("-")(1)
        if (kept.isEmpty) { dispose(f) }
        else {
          var (nlo, nhi) = (Long.MaxValue, Long.MinValue)
          kept.forEach { ln =>
            val k = ln.substring(0, ln.indexOf(',')).toLong
            if (k < nlo) nlo = k
            if (k > nhi) nhi = k
          }
          val tmp = new java.io.File(dir, s".tmp-${f.getName}")
          java.nio.file.Files.write(tmp.toPath, kept)
          val target = new java.io.File(dir, s"part-$idx-$nlo-$nhi.csv")
          dispose(f)
          java.nio.file.Files.move(tmp.toPath, target.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
    if (versioned && changed) CowVersions.commitSnapshot(dir)
  }
}

/** Batch scan: one input partition per data file (the lake parallelism
  * unit), line-parsed against the table's CURRENT schema — history files
  * written before an ADD COLUMN have fewer fields and read back with
  * NULLs in the added positions (the metadata-only-evolution contract).
  * Serves the pruned column set, including the `_file` group-identity
  * metadata column (each row's source file name). */
class CowScan(dir: java.io.File, pinned: Option[Seq[java.io.File]] = None,
    requiredOpt: StructType = null)
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  private val required =
    Option(requiredOpt).getOrElse(CowTable.currentSchema(dir))
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Runtime FILE pruning (c24) — the read-path twin of a29's runtime
    * group filter: a join's runtime IN/= values on the stats column
    * prune the manifest by each file's [lo, hi] BEFORE any file opens
    * (the Iceberg-style runtime file filtering the engine drives
    * through its dynamic-pruning machinery). Predicates the stats
    * cannot prove are ignored — pruning is an optimization, never a
    * correctness dependency. `prunedTo` is observable so the c24 key
    * can gate the file count from the executed plan. */
  private def statsCol = CowTable.baseSchema(dir).fields.head.name
  @volatile var prunedTo: Option[Int] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(statsCol))
  override def filter(predicates: Array[Predicate]): Unit = {
    def isStats(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array(statsCol))
        case _ => false
      }
    val values = predicates.flatMap { p =>
      p.name() match {
        case "IN" if isStats(p.children.head) =>
          p.children.tail.collect { case l: Literal[_] => l.value match {
            case i: java.lang.Integer => i.longValue
            case j: java.lang.Long => j.longValue
          }}
        case "=" if p.children.length == 2 && isStats(p.children.head) =>
          p.children.tail.collect { case l: Literal[_] => l.value match {
            case i: java.lang.Integer => i.longValue
            case j: java.lang.Long => j.longValue
          }}
        case _ => Array.empty[Long]
      }
    }
    if (values.nonEmpty) {
      val kept = files().filter(f => CowTable.statsOf(f.getName).exists {
        case (lo, hi) => values.exists(v => lo <= v && v <= hi) })
      runtimeKept = Some(kept)
      prunedTo = Some(kept.size)
    }
  }
  @volatile private var runtimeKept: Option[Seq[java.io.File]] = None
  private def files(): Seq[java.io.File] =
    pinned.getOrElse(CowTable.manifest(dir).map(_._1))

  override def planInputPartitions(): Array[InputPartition] =
    runtimeKept.getOrElse(files())
      .map(f => CowRowPartition(f.getAbsolutePath, f.getName)
        : InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    CowRowReaderFactory(required, CowTable.currentSchema(dir),
      CowTable.nonNullPrefix(dir))
}

/** The pushed-aggregate scan (a35): an ungrouped MIN/MAX over the
  * stats column, answered from the manifest's file-name stats — ZERO
  * data rows are read; the scan emits ONE pre-aggregated row. Works on
  * pinned `VERSION AS OF` snapshots too (archived names keep their
  * stats). Empty table → one all-NULL row, SQL's empty-aggregate
  * semantics. At 100 TB this is why `SELECT max(ts) FROM lake` costs a
  * manifest read, not a table scan — the same trick parquet footers
  * give the file sources, here at the connector layer. */
class CowAggScan(dir: java.io.File, pinned: Option[Seq[java.io.File]],
    isMin: Seq[Boolean]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    isMin.zipWithIndex.map { case (m, i) =>
      StructField(s"${if (m) "min" else "max"}_$i", LongType, nullable = true) })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val stats = pinned.getOrElse(CowTable.manifest(dir).map(_._1))
      .flatMap(f => CowTable.statsOf(f.getName))
    val values = isMin.map { m =>
      if (stats.isEmpty) None
      else Some(if (m) stats.map(_._1).min else stats.map(_._2).max)
    }
    Array(CowAggPartition(values))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    CowAggReaderFactory()
}

case class CowAggPartition(values: Seq[Option[Long]]) extends InputPartition

case class CowAggReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[CowAggPartition].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow =
        InternalRow.fromSeq(vs.map(_.map(Long.box).orNull))
      override def close(): Unit = ()
    }
  }
}

case class CowFileCommitted(name: String) extends WriterCommitMessage

/** INSERT INTO's physical write: `idxBase` is the driver-side successor
  * of the manifest's max file index, so concurrently-committing task
  * partitions claim disjoint final names. */
class CowBatchWrite(dir: java.io.File, schema: StructType) extends BatchWrite {
  private val idxBase: Int =
    CowTable.manifest(dir).map(_._1.getName.split("-")(1).toInt)
      .foldLeft(-1)(math.max) + 1
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    CowWriterFactory(dir.getAbsolutePath, schema, idxBase,
      CowTable.nonNullPrefix(dir))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val wroteAny = messages.exists {
      case CowFileCommitted(n) => n.nonEmpty
      case _ => false
    }
    if (wroteAny && CowVersions.enabled(dir)) CowVersions.commitSnapshot(dir)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CowFileCommitted(name) if name.nonEmpty =>
        new java.io.File(dir, name).delete(): Unit
      case _ =>
    }
}

case class CowWriterFactory(dirPath: String, schema: StructType, idxBase: Int,
    prefix: Int = 3)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val dir = new java.io.File(dirPath)
      private val tmp = new java.io.File(dir, s"._ins-$partitionId-$taskId.tmp")
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(tmp))
      private var n = 0L
      private var lo = Long.MaxValue
      private var hi = Long.MinValue

      override def write(row: InternalRow): Unit = {
        val line = schema.fields.indices.map { j =>
          val f = schema.fields(j)
          if (row.isNullAt(j)) {
            require(j >= prefix, s"INSERT: NULL in non-nullable base column ${f.name}")
            ""
          } else f.dataType match {
            case LongType => row.getLong(j).toString
            case DoubleType => row.getDouble(j).toString
            case StringType =>
              val s = row.getUTF8String(j).toString
              require(!s.contains(",") && s.nonEmpty,
                s"INSERT: string value for ${f.name} must be non-empty and comma-free")
              s
            case dt => sys.error(s"unreachable: $dt")
          }
        }.mkString(",")
        val k = row.getLong(0)
        if (k < lo) lo = k
        if (k > hi) hi = k
        out.write(line); out.newLine()
        n += 1
      }

      // the commit coordinator guarantees one committing attempt per
      // partition; empty partitions publish nothing
      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0) { tmp.delete(); CowFileCommitted("") }
        else {
          val fin = s"part-${idxBase + partitionId}-$lo-$hi.csv"
          val target = new java.io.File(dir, fin)
          require(tmp.renameTo(target), s"CowBatchWrite: rename to $fin failed")
          CowFileCommitted(fin)
        }
      }
      override def abort(): Unit = { out.close(); tmp.delete(): Unit }
      override def close(): Unit = ()
    }
}

/** a29: GROUP-BASED row-level operation — Spark's RewriteUpdateTable
  * plans `UPDATE` against this as: scan the affected group through
  * [[newScanBuilder]], apply the SET expressions (with three-valued
  * predicate semantics — the engine's own CASE rewrite), and hand the
  * group's FULL post-image to [[newWriteBuilder]]'s write, whose commit
  * atomically swaps the group's files (retiring them to the version
  * archive when the table is versioned, so UPDATE history time-travels
  * exactly like DELETE/INSERT history). */
class CowRowLevelOperation(dir: java.io.File,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  /** File names the runtime group filter proved affected; None = no
    * filter delivered → the write must swap every file (safe fallback).
    * Shared between this operation's scan and write — the standard
    * group-based coordination (the scan discovers the groups, the
    * write replaces exactly them). */
  @volatile var affected: Option[Set[String]] = None

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  // the group identity column the engine's runtime group filter prunes on
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowRowScanBuilder(dir, this)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: BatchWrite =
            new CowReplaceWrite(dir, info.schema(), CowRowLevelOperation.this)
        }
    }
}

/** Rewrite-scan builder: prunes to the engine's requested columns (data
  * columns plus `_file` when the group filter references it). */
class CowRowScanBuilder(dir: java.io.File, op: CowRowLevelOperation)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = CowTable.currentSchema(dir)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new CowRowScan(dir, op, required)
}

/** The row-level rewrite scan: serves data columns + `_file`, accepts
  * the runtime group filter on `_file`, and records the proven group
  * set on the operation so the replace write swaps ONLY those files. */
class CowRowScan(dir: java.io.File, op: CowRowLevelOperation,
    required: StructType)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

  override def filter(predicates: Array[Predicate]): Unit = {
    val names = predicates.flatMap { p =>
      def isFileRef(e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case r: NamedReference => r.fieldNames.sameElements(Array("_file"))
          case _ => false
        }
      p.name() match {
        case "IN" if isFileRef(p.children.head) =>
          p.children.tail.collect { case l: Literal[_] => l.value.toString }
        case "=" if p.children.length == 2 && isFileRef(p.children.head) =>
          p.children.tail.collect { case l: Literal[_] => l.value.toString }
        case _ => Array.empty[String]
      }
    }
    if (names.nonEmpty) op.affected = Some(names.toSet)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val files = CowTable.manifest(dir).map(_._1)
    val kept = op.affected match {
      case Some(set) => files.filter(f => set.contains(f.getName))
      case None => files
    }
    kept.map(f => CowRowPartition(f.getAbsolutePath, f.getName)
      : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    CowRowReaderFactory(required, CowTable.currentSchema(dir),
      CowTable.nonNullPrefix(dir))
}

case class CowRowPartition(path: String, fileName: String) extends InputPartition

case class CowRowReaderFactory(required: StructType, full: StructType,
    prefix: Int = 3)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CowRowPartition]
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(p.path))
    // per-required-field extractors: data columns by position in the
    // full schema (short rows null-pad), `_file` = this file's name
    val fileIdx = full.fieldNames.zipWithIndex.toMap
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.size() }
      override def get(): InternalRow = {
        val parts = lines.get(i).split(",", -1)
        val vals = required.fields.map { f =>
          if (f.name == "_file") UTF8String.fromString(p.fileName)
          else {
            val j = fileIdx(f.name)
            if (j >= parts.length || (j >= prefix && parts(j).isEmpty)) null
            else full.fields(j).dataType match {
              case LongType => parts(j).toLong
              case DoubleType => parts(j).toDouble
              case StringType => UTF8String.fromString(parts(j))
              case dt => sys.error(s"unreachable: $dt")
            }
          }
        }
        InternalRow.fromSeq(vals.toSeq)
      }
      override def close(): Unit = {}
    }
  }
}

case class CowStagedReplacement(name: String, lo: Long, hi: Long, rows: Long)
    extends WriterCommitMessage

/** The replacement write: tasks STAGE the group's post-image; the
  * driver-side commit swaps it in — retire-or-delete the AFFECTED
  * group's files (every file when no runtime group filter was
  * delivered — the safe whole-table fallback), publish the staged
  * files under fresh indices, snapshot if versioned. Staged files are
  * invisible to the manifest (the name pattern excludes them), so a
  * crash before commit leaves the table untouched. */
class CowReplaceWrite(dir: java.io.File, schema: StructType,
    op: CowRowLevelOperation) extends BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    CowReplaceWriterFactory(dir.getAbsolutePath, schema,
      CowTable.nonNullPrefix(dir))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case m: CowStagedReplacement if m.name.nonEmpty => m }
    val versioned = CowVersions.enabled(dir)
    val affected = op.affected
    CowTable.manifest(dir).foreach { case (f, _, _) =>
      if (affected.forall(_.contains(f.getName))) {
        if (versioned) CowVersions.retire(dir, f) else { f.delete(): Unit }
      }
    }
    // surviving (unaffected) files keep their indices; staged files
    // publish above them
    val base = CowTable.manifest(dir)
      .map(_._1.getName.split("-")(1).toInt).foldLeft(-1)(math.max) + 1
    staged.zipWithIndex.foreach { case (m, i) =>
      val target = new java.io.File(dir, s"part-${base + i}-${m.lo}-${m.hi}.csv")
      require(new java.io.File(dir, m.name).renameTo(target),
        s"CowReplaceWrite: rename ${m.name} -> ${target.getName} failed")
    }
    if (versioned) CowVersions.commitSnapshot(dir)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CowStagedReplacement(n, _, _, _) if n.nonEmpty =>
        new java.io.File(dir, n).delete(): Unit
      case _ =>
    }
}

case class CowReplaceWriterFactory(dirPath: String, schema: StructType,
    prefix: Int = 3)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val dir = new java.io.File(dirPath)
      private val tmp = new java.io.File(dir, s"._rpl-$partitionId-$taskId.tmp")
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(tmp))
      private var n = 0L
      private var lo = Long.MaxValue
      private var hi = Long.MinValue
      // the declared write schema may carry `_file` (the preserved group
      // metadata column) — serialize only the DATA fields
      private val dataFields = schema.fields.zipWithIndex
        .filter(_._1.name != "_file")
      private val kPos = dataFields.indexWhere(_._1.name == "k")

      override def write(row: InternalRow): Unit = {
        // the group-based rewrite's physical rows carry the engine's
        // LEADING row-operation marker column (a per-row constant used
        // for rewrite metrics) ahead of the declared write schema —
        // align by offset, and fail loud if the layout ever changes
        // shape rather than writing shifted garbage
        val off = row.numFields - schema.fields.length
        require(off >= 0 && off <= 1,
          s"replace: unexpected row layout (${row.numFields} fields for " +
            s"schema ${schema.fieldNames.mkString(",")})")
        var dj = -1
        val line = dataFields.map { case (f, idx) =>
          dj += 1
          val j = idx + off
          if (row.isNullAt(j)) {
            require(dj >= prefix, s"replace: NULL in non-nullable base column ${f.name}")
            ""
          } else f.dataType match {
            case LongType => row.getLong(j).toString
            case DoubleType => row.getDouble(j).toString
            case StringType =>
              val s = row.getUTF8String(j).toString
              require(!s.contains(",") && s.nonEmpty,
                s"replace: string for ${f.name} must be non-empty, comma-free")
              s
            case dt => sys.error(s"unreachable: $dt")
          }
        }.mkString(",")
        val k = row.getLong(dataFields(math.max(kPos, 0))._2 + off)
        if (k < lo) lo = k
        if (k > hi) hi = k
        out.write(line); out.newLine()
        n += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0) { tmp.delete(); CowStagedReplacement("", 0L, 0L, 0L) }
        else CowStagedReplacement(tmp.getName, lo, hi, n)
      }
      override def abort(): Unit = { out.close(); tmp.delete(): Unit }
      override def close(): Unit = ()
    }
}
