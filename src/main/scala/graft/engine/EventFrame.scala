package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical event-stream shape — the Spark-native equivalent of one
  * esdb file / stream log (SURVEY.md §1.4; reference: esdb event =
  * opaque payload + int32 timestamp, event.go:16-34; organized into
  * space → grouping → secondary index, writer.go:43-57).
  *
  * Columns:
  *  - `space`    STRING — top-level partition (esdb space id; here the
  *    `event_type` column). At scale this is the `partitionBy` column,
  *    so `space == x` predicates become partition pruning, replacing
  *    the reference's file-level SSTable point lookup (esdb.go:41-60).
  *  - `grouping` STRING — sub-stream key (esdb grouping; here
  *    `user_id`). Events of one grouping are the unit of ordered scan.
  *  - `ts_us`    LONG — event time, micros since epoch UTC. Explicit
  *    integer micros (not TimestampType) so ordering/equality is exact
  *    and identical across engines; the reference truncates to int32
  *    seconds (event.go:31), we keep full micros.
  *  - `event_id` LONG — monotone insertion id. Plays three reference
  *    roles at once: the stable-sort tiebreak (event_block_writer.go:15
  *    stable ts-desc sort), the stream byte offset for resumable
  *    iteration (stream/stream.go:92-124), and the linked-list position
  *    for index scans (stream/event.go:23-25).
  *  - `value`    DOUBLE — numeric payload field (testdata).
  *  - `payload`  STRING or BINARY — opaque payload. The reference never
  *    interprets payload bytes (event.go:16-21; `TestBigEvent`
  *    esdb_test.go:112-154 round-trips an 8 KB blob), and neither does
  *    the store/stream core: BINARY payloads round-trip byte-exact
  *    through write/append/read/scan/iterate. STRING payloads
  *    additionally get JSON attr access as the secondary-index
  *    mechanism (space_writer.go:47-49 `"i"+name+":"+value` keys ≡
  *    `attr(name) === value` predicates); index ops over BINARY
  *    payloads require write-time-materialized `idx_*` columns
  *    (the reference likewise indexes only what the writer declared).
  */
object EventFrame {

  /** Normalize any supported physical timestamp column to micros-since-epoch. */
  def toMicros(df: DataFrame, tsCol: String): Column = df.schema(tsCol).dataType match {
    case LongType => expr(s"$tsCol div 1000") // parquet TIMESTAMP(NANOS) read as Long nanos
    case TimestampType => unix_micros(col(tsCol))
    case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType)) // session TZ is UTC
    case other => throw new IllegalArgumentException(s"unsupported ts type $other")
  }

  /** Adapt the driver `events` table to the canonical shape
    * (FIXTURES.md §C: space=event_type, grouping=user_id, index=props keys).
    */
  def fromEvents(raw: DataFrame): DataFrame =
    raw.select(
      col("event_type").as("space"),
      col("user_id").cast(StringType).as("grouping"),
      toMicros(raw, "ts").as("ts_us"),
      col("event_id"),
      col("value"),
      col("props").as("payload"))

  /** Secondary-index attribute accessor: esdb `name:value` index ≡
    * JSON key lookup on the payload (space.go:123-143). Uses the native
    * [[graft.functions.JsonAttr]] byte-scanner — `get_json_object` is a
    * CodegenFallback that builds a Jackson parser per row, which would
    * dominate every index-scan at scale.
    *
    * Name contract: `name` is a LITERAL top-level key, exactly like the
    * reference's index names (space_writer.go:47-49 concatenates the
    * raw name into the index key, no path syntax). A name containing
    * '.' matches a literal dotted key — it does NOT navigate nested
    * objects the way `get_json_object`'s `$.a.b` JSONPath would; callers
    * needing JSONPath semantics should call `get_json_object` directly.
    *
    * Registration is idempotent;
    * the active-session guard covers ad-hoc frames built on the
    * calling thread — multi-session JVMs should install
    * [[graft.engine.GraftExtensions]] or call `GraftSession.tune` on
    * each session (the registry is per-session state).
    */
  def attr(name: String): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.JsonFunctions.register)
    call_function("json_attr", col("payload"), lit(name))
  }
}
