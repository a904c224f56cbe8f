package graft.pipeline

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY DataSource V2 registered under the real connector's short
  * name `bigquery` (via the test classpath's META-INF/services entry —
  * never shipped in the library jar, so a deployment still resolves the
  * public `spark-bigquery-connector`). It lets
  * `Sink.bigQueryWriter(df, …).save()` — the exact production call, no
  * test-specific format switch — execute end-to-end in `sbt test`,
  * capturing what a connector would receive:
  *
  *   - the write OPTIONS (table, temporaryGcsBucket, partitionType=DAY,
  *     partitionField) — the WriteToBigQuery mapping of reference
  *     `code/beam.py:167-193`;
  *   - the MODE, structurally: this builder implements plain
  *     [[WriteBuilder]] only (no SupportsTruncate/SupportsOverwrite), so
  *     an append reaches [[BatchWrite]] while any overwrite attempt
  *     fails — proving `.mode("append")` (WRITE_APPEND) is what the
  *     writer requests;
  *   - CREATE_IF_NEEDED parity: the write proceeds with no pre-existing
  *     table object, matching the connector's create-on-first-write
  *     default;
  *   - the rows, counted through real executor [[DataWriter]]s and
  *     committed through the real two-phase commit. */
class BigQueryTestSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bigquery"
  // write-only stub: schema always comes with the data
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BigQueryTestTable(schema)
}

object BigQueryTestSource {
  final case class Captured(options: Map[String, String],
      schema: StructType, rows: Long)
  @volatile var lastCommitted: Option[Captured] = None
  def reset(): Unit = lastCommitted = None
}

private final case class BqCountMsg(n: Long) extends WriterCommitMessage

private class BigQueryTestTable(tableSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft-bq-test-capture"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo)
              : DataWriterFactory = new BqCountingWriterFactory
          override def commit(msgs: Array[WriterCommitMessage]): Unit =
            BigQueryTestSource.lastCommitted = Some(
              BigQueryTestSource.Captured(
                {
                  val m = scala.collection.mutable.Map[String, String]()
                  info.options.forEach((k, v) => m += k -> v)
                  m.toMap
                },
                info.schema(),
                msgs.map { case BqCountMsg(n) => n }.sum))
          override def abort(msgs: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private class BqCountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var n = 0L
    override def write(record: InternalRow): Unit = n += 1
    override def commit(): WriterCommitMessage = BqCountMsg(n)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
