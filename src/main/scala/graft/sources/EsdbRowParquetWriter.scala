package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Minimal parquet-mr writer for [[InternalRow]]s with a FLAT schema —
  * the executor-side half of the native streaming sink
  * ([[EsdbLogSource]]): each streaming task writes its partition of a
  * micro-batch straight to a final-named `stream-<epoch>-*` file (the
  * [[graft.engine.LogCommits]] protocol makes it invisible until the
  * epoch marker lands, so no staging or rename is ever needed).
  *
  * Flat primitive columns only (string/long/int/double/float/boolean/
  * binary) — the canonical event frame and its idx columns. Nested
  * schemas should ingest through
  * [[graft.streaming.StreamIngest.sinkLog]], whose staged batch write
  * uses Spark's full parquet writer. The physical types written here
  * match Spark's own parquet output (UTF8-annotated binary for
  * strings, plain int64/int32/double/float/boolean), so files from
  * both write paths merge interchangeably in the log reader.
  */
object EsdbRowParquetWriter {

  def supported(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | DoubleType | FloatType |
         BooleanType | BinaryType => true
    case _ => false
  }

  /** Parquet message type for a flat Spark schema (all fields
    * `optional`, exactly as Spark writes nullable columns).
    */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val prim = f.dataType match {
        case StringType =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType())
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case other => throw new IllegalArgumentException(
          s"streaming sink supports flat primitive columns; ${f.name}: $other " +
            "is not — ingest nested frames via StreamIngest.sinkLog (foreachBatch)")
      }
      // carry the column's parquet field ID into the file footer: an
      // ID-ed store's readers resolve by ID, so a streamed file missing
      // them would refuse to read ([[graft.engine.FieldIds]])
      val withId = graft.engine.FieldIds.idOf(f) match {
        case Some(id) => prim.id(id.toInt)
        case None => prim
      }
      b.addField(withId.named(f.name))
    }
    b.named("spark_schema")
  }

  private final class RowWriteSupport(schema: StructType) extends WriteSupport[InternalRow] {
    private val message = messageType(schema)
    private var consumer: RecordConsumer = _

    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(message, java.util.Collections.emptyMap[String, String]())

    override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc

    override def write(row: InternalRow): Unit = {
      consumer.startMessage()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val f = schema.fields(i)
          consumer.startField(f.name, i)
          f.dataType match {
            case StringType =>
              consumer.addBinary(Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
            case LongType => consumer.addLong(row.getLong(i))
            case IntegerType => consumer.addInteger(row.getInt(i))
            case DoubleType => consumer.addDouble(row.getDouble(i))
            case FloatType => consumer.addFloat(row.getFloat(i))
            case BooleanType => consumer.addBoolean(row.getBoolean(i))
            case BinaryType => consumer.addBinary(Binary.fromReusedByteArray(row.getBinary(i)))
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
          consumer.endField(f.name, i)
        }
        i += 1
      }
      consumer.endMessage()
    }
  }

  private final class Builder(path: Path, schema: StructType)
    extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new RowWriteSupport(schema)
  }

  /** Open a snappy parquet writer at `path` (must not exist). Row-group
    * sizing stays at parquet defaults (128 MB), matching the batch
    * writer's files.
    */
  def open(path: Path, schema: StructType, conf: Configuration,
           bloomCols: Seq[String] = Nil): ParquetWriter[InternalRow] = {
    // bloom filters on secondary-index columns, matching the batch
    // writer's `parquet.bloom.filter.enabled#idx_*` options: min/max
    // stats rarely prune idx values (they interleave across the sort
    // order), blooms can
    val b = new Builder(path, schema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
    bloomCols.foldLeft(b)((b, c) => b.withBloomFilterEnabled(c, true)).build()
  }
}
