package graft.lineage

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory `TableCatalog` with write-only tables — just enough
  * V2 surface to drive AppendData / OverwriteByExpression /
  * CreateTableAsSelect / ReplaceTableAsSelect through the REAL analyzer
  * and write planner, so the lineage extractor's V2 branches are
  * exercised end-to-end (the DSv1 parquet paths can't reach them).
  * Writers count and discard rows.
  */
class TestV2Catalog extends TableCatalog {
  private var catName: String = _
  private val tables = new util.concurrent.ConcurrentHashMap[Identifier, TestV2Table]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    import scala.jdk.CollectionConverters._
    tables.keySet().asScala.filter(_.namespace().sameElements(namespace)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = new TestV2Table(ident, schema)
    if (tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = loadTable(ident)
  override def dropTable(ident: Identifier): Boolean = tables.remove(ident) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = tables.remove(oldIdent)
    if (t == null) throw new NoSuchTableException(oldIdent)
    tables.put(newIdent, t)
  }
  override def tableExists(ident: Identifier): Boolean = tables.containsKey(ident)
}

class TestV2Table(ident: Identifier, tableSchema: StructType)
  extends Table with SupportsWrite with SupportsRead {

  val rowsWritten = new java.util.concurrent.atomic.AtomicLong()

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  // empty batch read — enough for the analyzer's capability check and
  // relation resolution, so DELETE/UPDATE/MERGE plans analyze against
  // this table (V2CommandLineageSpec never executes them)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = tableSchema
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            new org.apache.spark.sql.connector.read.Batch {
              override def planInputPartitions()
                  : Array[org.apache.spark.sql.connector.read.InputPartition] =
                Array.empty
              override def createReaderFactory()
                  : org.apache.spark.sql.connector.read.PartitionReaderFactory =
                throw new UnsupportedOperationException("write-only test table")
            }
        }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
            new CountingWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            rowsWritten.addAndGet(messages.collect { case CountMsg(n) => n }.sum)
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

case class CountMsg(n: Long) extends WriterCommitMessage

class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMsg(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
