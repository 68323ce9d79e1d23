package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized fast path for the ordered store source: when a space
  * directory holds exactly ONE sorted file (the steady state after
  * [[graft.engine.EsdbWriter.compact]]), the k-way merge degenerates to
  * a sequential read of that file — which Spark's vectorized parquet
  * decoder does batch-at-a-time an order of magnitude faster than the
  * row-at-a-time parquet-mr Group materialization the merge needs
  * (EsdbPartitionReader.scala). The reference's analog: a sealed
  * single-SSTable space is read by a straight block cursor, not the
  * multi-file merge heap (sst/reader.go; merge only spans the open
  * write set).
  *
  * Only unfiltered-by-the-source scans qualify: a pushed grouping
  * equality / grouping-not-null / ts bound is CLAIMED-handled (Spark
  * plans no re-filter), and the vectorized decoder has no exact
  * record-level filtering — so [[EsdbScan]] enables this path only when
  * no such claim is active (residual idx_* hints disable it too: a
  * selective hinted scan wins more from record skipping than from
  * vectorization). Layout order (grouping ASC, ts DESC, event_id ASC)
  * is preserved because batches stream the file sequentially.
  *
  * The `space` partition column is a [[ConstantColumnVector]] spliced
  * into the batch at its required position (driver-verified that every
  * other required column exists in the file with the canonical
  * physical type, so no null-padding is ever needed here).
  */
final class EsdbVectorReader(part: EsdbInputPartition, required: StructType, limit: Option[Int])
  extends PartitionReader[ColumnarBatch] {

  private val capacity = 4096
  private val fileCols: Seq[String] = required.fieldNames.toSeq.filterNot(_ == "space")

  private val reader = new VectorizedParquetRecordReader(/* useOffHeap = */ false, capacity)
  reader.initialize(part.files.head, fileCols.asJava)

  // file-side batch columns are in fileCols order; splice the constant
  // space vector at its required position
  private val inner: ColumnarBatch = reader.resultBatch()
  private val out: ColumnarBatch = {
    val vecs = new Array[ColumnVector](required.length)
    var fileIdx = 0
    required.fields.zipWithIndex.foreach { case (f, i) =>
      if (f.name == "space") {
        val c = new ConstantColumnVector(capacity, StringType)
        c.setUtf8String(UTF8String.fromString(part.space))
        vecs(i) = c
      } else {
        vecs(i) = inner.column(fileIdx)
        fileIdx += 1
      }
    }
    new ColumnarBatch(vecs)
  }

  private var remaining: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  override def next(): Boolean = {
    if (remaining <= 0 || !reader.nextBatch()) return false
    val n = math.min(inner.numRows().toLong, remaining).toInt
    out.setNumRows(n)
    remaining -= n
    EsdbMergeReader.RowsRead.addAndGet(n)
    EsdbVectorReader.BatchesRead.incrementAndGet()
    true
  }

  override def get(): ColumnarBatch = out

  override def close(): Unit = reader.close()
}

object EsdbVectorReader {
  /** Batches decoded by all vector readers in this JVM — local-mode
    * observable proving a scan actually took the vectorized path
    * (OrderedStoreSpec asserts it advances for qualifying scans and
    * stays put for claimed-filtered ones).
    */
  val BatchesRead = new java.util.concurrent.atomic.AtomicLong()

  /** Can `file` serve `required` on this path? True iff every required
    * non-`space` column exists in the file with the canonical store
    * physical type (the exact set the row-path `convert` supports — so
    * a fallback to the row path never widens the type surface) — and
    * the file is reachable through Hadoop's default filesystem config
    * (the vectorized reader's single-file initializer builds its own
    * `Configuration`; stores on credentialed object stores keep the
    * row path until the session conf is threaded through).
    */
  def eligible(conf: Configuration, file: String, required: StructType): Boolean = {
    val p = new Path(file)
    val scheme = p.toUri.getScheme
    if (scheme != null && scheme != "file") return false
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    val schema = try footer.getFileMetaData.getSchema finally footer.close()
    required.fields.forall(f => f.name == "space" || matches(schema, f.name, f.dataType))
  }

  private def matches(schema: MessageType, name: String, dt: DataType): Boolean = {
    if (!schema.containsField(name)) return false
    val field = schema.getType(schema.getFieldIndex(name))
    if (!field.isPrimitive) return false
    val prim = field.asPrimitiveType()
    val ann = prim.getLogicalTypeAnnotation
    def plain = ann == null // no logical annotation riding on the physical type
    def intAnn(bits: Int) = ann match {
      case a: LogicalTypeAnnotation.IntLogicalTypeAnnotation => a.getBitWidth == bits && a.isSigned
      case _ => false
    }
    (prim.getPrimitiveTypeName, dt) match {
      case (PrimitiveTypeName.BINARY, StringType) =>
        ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case (PrimitiveTypeName.BINARY, BinaryType) => plain
      case (PrimitiveTypeName.INT64, LongType) => plain || intAnn(64)
      case (PrimitiveTypeName.INT32, IntegerType) => plain || intAnn(32)
      case (PrimitiveTypeName.DOUBLE, DoubleType) => plain
      case (PrimitiveTypeName.FLOAT, FloatType) => plain
      case (PrimitiveTypeName.BOOLEAN, BooleanType) => plain
      case _ => false
    }
  }
}
