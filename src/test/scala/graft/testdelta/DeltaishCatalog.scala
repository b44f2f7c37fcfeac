package graft.testdelta

import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY in-memory DataSourceV2 catalog whose tables support
  * GROUP_BASED row-level operations — the seam that lets the ModelSpec
  * delta branches EXECUTE the exact DDL and `MERGE INTO` SQL that
  * [[graft.model.TableGen]]'s Delta dispatch emits, without Delta jars
  * (unavailable in this container — BASELINE.md's infeasibility note).
  *
  * This is NOT a Delta implementation: it is the minimal catalog
  * surface Spark requires to analyze + run `CREATE TABLE ... USING
  * delta`, positional INSERT, full scans, and group-based MERGE
  * (Spark's ReplaceData rewrite: read every group the merge touches —
  * here, the whole table — and write back the surviving rows). Delta
  * itself implements the same DSv2 contracts; executing through this
  * catalog therefore proves the dispatch path end-to-end while leaving
  * real-Delta semantics (time travel, log, concurrency) out of scope.
  *
  * Row storage lives in a JVM-static registry keyed by table name —
  * valid ONLY for local[..] test sessions (driver and executors share
  * the JVM); commit messages still round-trip rows through Spark's
  * writer-commit protocol like a real connector.
  */
class DeltaishCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def key(ident: Identifier) =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    DeltaishRegistry.tables.keys
      .filter(_.startsWith((catalogName +: namespace).mkString(".") + "."))
      .map(k => Identifier.of(namespace, k.split("\\.").last)).toArray

  override def loadTable(ident: Identifier): Table =
    DeltaishRegistry.tables.getOrElse(key(ident),
      throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "DeltaishCatalog does not support partitioning")
    val k = key(ident)
    if (DeltaishRegistry.tables.contains(k))
      throw new TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
    val t = new DeltaishTable(k, schema, properties.asScala.toMap)
    DeltaishRegistry.tables.put(k, t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER is out of this stub's scope")

  override def dropTable(ident: Identifier): Boolean =
    DeltaishRegistry.tables.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME is out of this stub's scope")
}

/** JVM-static row store (local-mode test catalog — see class doc). */
object DeltaishRegistry {
  val tables: TrieMap[String, DeltaishTable] = TrieMap.empty
  val rows: TrieMap[String, ArrayBuffer[InternalRow]] = TrieMap.empty
}

class DeltaishTable(val tableName: String, tableSchema: StructType,
                    props: Map[String, String])
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  DeltaishRegistry.rows.putIfAbsent(tableName, ArrayBuffer.empty)

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def properties(): util.Map[String, String] = props.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DeltaishScanBuilder(tableName, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DeltaishWriteBuilder(tableName, replace = false, info.schema(), tableSchema)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      // the operation reads every group (= the whole table) ...
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new DeltaishScanBuilder(tableName, tableSchema)
      // ... so its write REPLACES the whole table with the survivors
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
        new DeltaishWriteBuilder(tableName, replace = true, info.schema(), tableSchema)
    }
}

class DeltaishScanBuilder(tableName: String, schema: StructType) extends ScanBuilder {
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(DeltaishPartition(tableName))
    override def createReaderFactory(): PartitionReaderFactory =
      (partition: InputPartition) => {
        val rows = DeltaishRegistry
          .rows(partition.asInstanceOf[DeltaishPartition].tableName)
        val it = rows.synchronized(rows.toVector).iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
  }
}

case class DeltaishPartition(tableName: String) extends InputPartition

case class DeltaishCommit(rows: Seq[InternalRow]) extends WriterCommitMessage

/** `writeSchema` is what Spark actually sends ([[LogicalWriteInfo]]):
  * a row-level ReplaceData write can carry extra columns or a different
  * layout than the table, so rows are PROJECTED onto the stored table
  * schema by name before they enter the registry — storing them raw
  * mis-frames every later read (observed as corrupt UnsafeRow strings
  * and a SIGSEGV in the arraycopy stub). */
class DeltaishWriteBuilder(tableName: String, replace: Boolean,
                           writeSchema: StructType, tableSchema: StructType)
  extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new DeltaishWriterFactory(writeSchema, tableSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val incoming = messages.flatMap(_.asInstanceOf[DeltaishCommit].rows)
        val store = DeltaishRegistry.rows(tableName)
        store.synchronized {
          if (replace) store.clear()
          store ++= incoming
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

/** Top-level (serializable) factory: only the two schemas travel to the
  * executor; the projection is built per writer there. */
class DeltaishWriterFactory(writeSchema: StructType, tableSchema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      // byName covers a write whose schema matches the table in names
      // but not order; opStrip covers group-based ReplaceData from a
      // connector with NO declared metadata attributes — Spark's plain
      // DataWritingSparkTask then hands over the MergeRows output
      // verbatim: [__row_operation:int, data...] with op WRITE(5) or
      // WRITE_WITH_METADATA(6) (RowDeltaUtils; verified against the
      // 4.1.2 bytecode — ReplaceDataExec only applies its row
      // projection on the metadata task path).
      private val byName =
        if (writeSchema.fieldNames.sameElements(tableSchema.fieldNames)) None
        else Some(UnsafeProjection.create(tableSchema.fields.map { f =>
          val i = writeSchema.fieldIndex(f.name)
          BoundReference(i, writeSchema(i).dataType, writeSchema(i).nullable)
        }.toIndexedSeq))
      private lazy val opStrip = UnsafeProjection.create(
        tableSchema.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable)
        }.toIndexedSeq)
      private val buf = ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = {
        val out =
          if (record.numFields == tableSchema.length + 1) {
            val op = record.getInt(0)
            require(op == 5 || op == 6, // WRITE / WRITE_WITH_METADATA
              s"deltaish: unexpected __row_operation $op in ReplaceData write")
            opStrip(record)
          } else byName.fold(record)(p => p(record))
        buf += out.copy()
      }
      override def commit(): WriterCommitMessage = DeltaishCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
