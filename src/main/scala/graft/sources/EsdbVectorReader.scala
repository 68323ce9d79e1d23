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

/** Vectorized fast path shared by the ordered store source and the log
  * source, for the shapes where their k-way merge degenerates to a
  * sequential read:
  *
  *  - a store space directory holding exactly ONE sorted file (the
  *    steady state after [[graft.engine.EsdbWriter.compact]]) — the
  *    reference's analog is a sealed single-SSTable space read by a
  *    straight block cursor, not the multi-file merge heap
  *    (sst/reader.go; merge only spans the open write set);
  *  - a log store whose files carry pairwise-DISJOINT event_id ranges
  *    (the write-time range partitioning; verified against the log
  *    manifest) — concatenating them in range order IS the merge, the
  *    reference's flat-file sequential read (stream/stream.go:10-13).
  *
  * Both decode through Spark's vectorized parquet reader batch-at-a-
  * time, an order of magnitude faster than the row-at-a-time
  * parquet-mr Group materialization the true merge needs.
  *
  * Only unfiltered-by-the-source scans qualify: a pushed grouping
  * equality / grouping-not-null / ts or id bound is CLAIMED-handled
  * (Spark plans no re-filter), and the vectorized decoder has no exact
  * record-level filtering — so the scans enable this path only when no
  * such claim is active (residual idx_* hints disable it too: a
  * selective hinted scan wins more from record skipping than from
  * vectorization). Layout order is preserved because batches stream
  * each file sequentially, in the order `files` is given.
  *
  * For space-partitioned stores the `space` column is a
  * [[ConstantColumnVector]] spliced into the batch at its required
  * position; the driver verifies every other required column exists in
  * every file with the canonical physical type, so no null-padding is
  * ever needed here.
  */
final class EsdbVectorReader(files: Seq[String], required: StructType, limit: Option[Int],
                             constSpace: Option[String])
  extends PartitionReader[ColumnarBatch] {

  private val capacity = 4096
  private val fileCols: Seq[String] =
    if (constSpace.isDefined) required.fieldNames.toSeq.filterNot(_ == "space")
    else required.fieldNames.toSeq

  private var fileIdx = -1
  private var reader: VectorizedParquetRecordReader = _
  private var inner: ColumnarBatch = _
  private var out: ColumnarBatch = _
  private var remaining: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  /** Open files(i); file-side batch columns are in fileCols order, with
    * the constant space vector spliced at its required position.
    */
  private def open(i: Int): Unit = {
    fileIdx = i
    reader = new VectorizedParquetRecordReader(/* useOffHeap = */ false, capacity)
    reader.initialize(files(i), fileCols.asJava)
    inner = reader.resultBatch()
    val vecs = new Array[ColumnVector](required.length)
    var src = 0
    required.fields.zipWithIndex.foreach { case (f, j) =>
      if (constSpace.isDefined && f.name == "space") {
        val c = new ConstantColumnVector(capacity, StringType)
        c.setUtf8String(UTF8String.fromString(constSpace.get))
        vecs(j) = c
      } else {
        vecs(j) = inner.column(src)
        src += 1
      }
    }
    out = new ColumnarBatch(vecs)
  }

  override def next(): Boolean = {
    while (remaining > 0) {
      if (reader == null) {
        if (fileIdx + 1 >= files.length) return false
        open(fileIdx + 1)
      }
      if (reader.nextBatch()) {
        val n = math.min(inner.numRows().toLong, remaining).toInt
        out.setNumRows(n)
        remaining -= n
        EsdbMergeReader.RowsRead.addAndGet(n)
        EsdbVectorReader.BatchesRead.incrementAndGet()
        return true
      }
      reader.close()
      reader = null
    }
    false
  }

  override def get(): ColumnarBatch = out

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

object EsdbVectorReader {
  /** Batches decoded by all vector readers in this JVM — local-mode
    * observable proving a scan actually took the vectorized path
    * (OrderedStoreSpec asserts it advances for qualifying scans and
    * stays put for claimed-filtered ones).
    */
  val BatchesRead = new java.util.concurrent.atomic.AtomicLong()

  /** Footer-derived facts about one column, used to prove a CLAIMED
    * filter vacuous (satisfied by every row of the file), which is the
    * only way a claimed filter may ride the vectorized path — the
    * decoder has no record-level filtering. Fields are None when any
    * row group lacks the statistic (unknown = unprovable = row path).
    */
  final case class ColFacts(range: Option[(Long, Long)], nulls: Option[Long])

  /** Can `file` serve `required` on this path, and what do its footer
    * stats prove? None when the file cannot serve the scan at all:
    * a required column (minus `space` when it is a partition constant)
    * is missing or not of the canonical store physical type (the exact
    * set the row-path `convert` supports — so a fallback to the row
    * path never widens the type surface), or the file is not reachable
    * through Hadoop's default filesystem config (the vectorized
    * reader's single-file initializer builds its own `Configuration`;
    * stores on credentialed object stores keep the row path until the
    * session conf is threaded through). Otherwise Some(facts) for each
    * requested stat column present in the file (ranges only for INT64
    * columns; null counts for any primitive).
    */
  def probe(conf: Configuration, file: String, required: StructType,
            constSpace: Boolean, statCols: Seq[String] = Nil): Option[Map[String, ColFacts]] = {
    val p = new Path(file)
    val scheme = p.toUri.getScheme
    if (scheme != null && scheme != "file") return None
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    val (schema, blocks) =
      try (footer.getFileMetaData.getSchema, footer.getFooter.getBlocks)
      finally footer.close()
    val ok = required.fields.forall(f =>
      (constSpace && f.name == "space") || matches(schema, f.name, f.dataType))
    if (!ok) return None
    val facts = statCols.filter(schema.containsField).map { name =>
      val isLong = schema.getType(schema.getFieldIndex(name)).isPrimitive &&
        schema.getType(schema.getFieldIndex(name)).asPrimitiveType()
          .getPrimitiveTypeName == PrimitiveTypeName.INT64
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var nulls = 0L
      var rangeKnown = true
      var nullsKnown = true
      blocks.forEach { b =>
        b.getColumns.forEach { c =>
          if (c.getPath.toDotString == name) {
            val st = c.getStatistics
            if (st == null || !st.isNumNullsSet) nullsKnown = false
            else nulls += st.getNumNulls
            if (!isLong || st == null || !st.hasNonNullValue) rangeKnown = false
            else {
              mn = math.min(mn, st.genericGetMin.asInstanceOf[java.lang.Long].longValue())
              mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            }
          }
        }
      }
      name -> ColFacts(
        if (rangeKnown && mn != Long.MaxValue) Some((mn, mx)) else None,
        if (nullsKnown) Some(nulls) else None)
    }.toMap
    Some(facts)
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
