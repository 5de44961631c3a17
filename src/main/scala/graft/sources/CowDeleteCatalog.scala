package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
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
class CowDeleteCatalog extends TableCatalog {
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
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("tables are seeded externally")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("immutable schema")
  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    val ok = d.isDirectory
    if (ok) { Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete()); d.delete() }
    ok
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename unsupported")
}

object CowTable {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("st", StringType, nullable = false),
    StructField("total", DoubleType, nullable = false)))

  private val FileName = """part-(\d+)-(-?\d+)-(-?\d+)\.csv""".r

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

class CowTable(tableName: String, dir: java.io.File)
    extends Table with SupportsRead with SupportsDeleteV2 {
  import CowTable._

  override def name(): String = tableName
  override def schema(): StructType = CowTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CowScan(dir)

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    translate(predicates).isDefined

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val bounds = translate(predicates).getOrElse(
      sys.error(s"deleteWhere called with untranslatable predicates: " +
        predicates.mkString("[", ", ", "]")))
    // conjunction semantics: a row is deleted iff EVERY predicate matches
    def deletes(k: Long) = bounds.forall(_.rowMatches(k))
    manifest(dir).foreach { case (f, lo, hi) =>
      // file-level pruning: every predicate must be able to match inside
      // [lo, hi] for any row of this file to be deletable — else the
      // file is left physically untouched (mtime-gated by the a25 key)
      if (bounds.forall(_.mayIntersect(lo, hi))) {
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        val kept = new util.ArrayList[String]()
        lines.forEach { ln =>
          if (!deletes(ln.substring(0, ln.indexOf(',')).toLong)) kept.add(ln)
        }
        val idx = f.getName.split("-")(1)
        if (kept.isEmpty) { f.delete() }
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
          f.delete()
          java.nio.file.Files.move(tmp.toPath, target.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
  }
}

/** Batch scan: one input partition per data file (the lake parallelism
  * unit), line-parsed against the fixed schema. */
class CowScan(dir: java.io.File) extends Scan with Batch {
  override def readSchema(): StructType = CowTable.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    CowTable.manifest(dir).map(m => CowPartition(m._1.getAbsolutePath)).toArray
  override def createReaderFactory(): PartitionReaderFactory = CowReaderFactory()
}

case class CowPartition(path: String) extends InputPartition

case class CowReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(partition.asInstanceOf[CowPartition].path))
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.size() }
      override def get(): InternalRow = {
        val parts = lines.get(i).split(",", 3)
        InternalRow(parts(0).toLong, UTF8String.fromString(parts(1)),
          parts(2).toDouble)
      }
      override def close(): Unit = {}
    }
  }
}
