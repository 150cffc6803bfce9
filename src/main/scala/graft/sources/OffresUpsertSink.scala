package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 keyed-upsert sink — the reference's ES `_bulk` indexing
  * with explicit `_id` (SURVEY S6, `ingestion-elasticsearch.py:36-55`)
  * as a Spark `BatchWrite`.
  *
  * Semantics: per-partition writers buffer (key → row) maps (later
  * writes win within a task, matching bulk-request ordering); commit
  * publishes each task's buffer into the keyed store with last-commit-
  * wins per key. Because rows are keyed, re-executed tasks (speculation,
  * retries) re-publish the same (key, row) pairs — the write is
  * idempotent, which is exactly why the reference chose `_id`-keyed
  * upsert over append.
  *
  * The store behind the sink is looked up in [[UpsertStoreRegistry]]
  * (tests use an in-memory map; a production deployment would register a
  * client for the real keyed store, e.g. an ES bulk endpoint).
  *
  * Usage: `df.write.format("graft.sources.OffresUpsertSink")
  *   .option("store", name).option("keyColumn", "id").mode("append").save()`.
  */
class OffresUpsertSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the DataFrame being written
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UpsertTable(schema, new CaseInsensitiveStringMap(properties))
}

/** Task→driver commit message; a top-level case object so it carries no
  * outer reference (an anonymous inner message would capture the writer,
  * which is not serializable — fine in local mode, fatal on a cluster).
  */
case object UpsertCommitted extends WriterCommitMessage

object UpsertStoreRegistry {
  /** store name → (key → serialized row values) */
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Seq[Any]]]()
  def store(name: String): ConcurrentHashMap[String, Seq[Any]] =
    stores.computeIfAbsent(name, _ => new ConcurrentHashMap[String, Seq[Any]]())
  def clear(name: String): Unit = stores.remove(name)
}

class UpsertTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"upsert_store_${options.get("store")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new UpsertBatchWrite(options.get("store"),
            Option(options.get("keyColumn")).getOrElse("id"),
            Option(options.get("opColumn")),
            info.schema())
      }
    }
}

class UpsertBatchWrite(storeName: String, keyColumn: String,
                       opColumn: Option[String], schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new UpsertWriterFactory(storeName, keyColumn, opColumn, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class UpsertWriterFactory(storeName: String, keyColumn: String,
                          opColumn: Option[String], schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new UpsertDataWriter(storeName, keyColumn, opColumn, schema)
}

/** Buffers the partition's rows keyed by `keyColumn` (within-task
  * later-write-wins), publishes on commit — the `foreachPartition`
  * bulk-writer pattern with idempotent keyed semantics.
  *
  * DELETE support (the ES bulk `_op_type: delete` analog, the
  * retirement half of the reference's `_id`-keyed store): when the
  * `opColumn` option names a column, a row whose op value is `delete`
  * (case-insensitive) RETIRES its key instead of upserting it. Deletes
  * buffer as tombstones in the same within-task order (an upsert after
  * a delete of the same key resurrects it, matching bulk-request
  * ordering) and publish as removals on commit. Replayed tasks re-apply
  * the same keyed ops, so the write stays idempotent.
  */
class UpsertDataWriter(storeName: String, keyColumn: String,
                       opColumn: Option[String], schema: StructType)
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldIndex(keyColumn)
  private val opIdx = opColumn.map(schema.fieldIndex)
  // None = tombstone (delete on commit), Some = upsert
  private val buffer = new scala.collection.mutable.LinkedHashMap[String, Option[Seq[Any]]]()

  override def write(row: InternalRow): Unit = {
    val values = schema.fields.zipWithIndex.map { case (f, i) =>
      row.get(i, f.dataType) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => other
      }
    }.toSeq
    val isDelete = opIdx.exists(i => "delete".equalsIgnoreCase(String.valueOf(values(i))))
    buffer.put(values(keyIdx).toString, if (isDelete) None else Some(values))
  }

  override def commit(): WriterCommitMessage = {
    val store = UpsertStoreRegistry.store(storeName)
    buffer.foreach {
      case (k, Some(v)) => store.put(k, v)
      case (k, None) => store.remove(k)
    }
    UpsertCommitted
  }

  override def abort(): Unit = buffer.clear()
  override def close(): Unit = ()
}
