package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Parquet field-ID plumbing for metadata-only column RENAME and DROP.
  *
  * Identity model: every column of an ID-ed store carries a stable
  * integer in the standard `parquet.field.id` metadata key — stamped
  * into both the schema sidecar and (via Spark's native
  * `spark.sql.parquet.fieldId.write.enabled`) every data file's
  * footer. A rename changes only the sidecar NAME (same ID): readers
  * resolve old files by ID, so no file is touched. A drop TOMBSTONES
  * the field in the sidecar (renamed to `__dropped_<id>`, flagged
  * `graft.dropped`) instead of removing it — the ID stays occupied, so
  * a later re-add of the same column name gets a FRESH ID and the
  * dropped data can never resurface from still-carried files. Full
  * compaction physically rewrites every file and is the one operation
  * allowed to forget tombstones.
  *
  * Invariant everything relies on: **a sidecar with IDs implies every
  * data file is ID-stamped.** Established at store creation and by
  * full compaction (the only `assign` sites); preserved everywhere
  * else because appends/rewrites decorate their batches from the
  * sidecar before writing, and carry-paths copy files that were
  * already stamped. Legacy stores (no IDs) keep name-resolution and
  * refuse rename/drop until one compaction stamps them.
  *
  * This is the standard columnar-format evolution scheme (Iceberg-
  * style field IDs), expressed through Spark's own parquet field-ID
  * support rather than a custom reader. Reference: the Go engine fixes
  * its event schema at the format level (event.go:14-34) and offers no
  * evolution; this is an extension.
  */
object FieldIds {

  val IdKey = "parquet.field.id"
  val DroppedKey = "graft.dropped"

  /** Partition-DIRECTORY columns: they never live inside a parquet
    * file (the layout encodes them in the path) and Spark's file index
    * reconstructs their StructFields without metadata on every read —
    * so they stay OUTSIDE the ID discipline entirely. Giving them IDs
    * would make the sidecar flap (a compaction re-reads them bare and
    * would re-assign) and would mean nothing to any reader.
    */
  val LayoutCols: Set[String] = Set("space", "bucket")

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** The queryable schema: tombstoned fields hidden. */
  def active(s: StructType): StructType = StructType(s.fields.filterNot(isDropped).toSeq)

  /** Highest ID in use, INCLUDING tombstones (0 when none): the floor
    * fresh IDs are allocated above, so an ID is never reused while any
    * carried file may still hold its column.
    */
  def maxId(s: StructType): Long = s.fields.flatMap(idOf).foldLeft(0L)(math.max)

  /** True when every active field carries an ID (the rename/drop
    * capability check).
    */
  def hasIds(s: StructType): Boolean = {
    val data = active(s).fields.filterNot(f => LayoutCols(f.name))
    data.nonEmpty && data.forall(f => idOf(f).isDefined)
  }

  private def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).build())

  /** Fill missing IDs sequentially above the current max (a schema
    * with none gets 1..n). Existing IDs are preserved — re-assignment
    * is stable across compactions.
    */
  def assign(s: StructType): StructType = {
    var next = maxId(s)
    StructType(s.fields.map { f =>
      if (LayoutCols(f.name) || idOf(f).isDefined) f
      else { next += 1; withId(f, next) }
    }.toSeq)
  }

  /** Carry `base`'s IDs onto `batch` by column name; columns `base`
    * has never seen get fresh IDs above base's max (tombstones
    * included). A base without IDs aligns to nothing — the batch stays
    * un-IDed, matching the legacy store it lands in.
    */
  def align(batch: StructType, base: StructType): StructType = {
    if (!hasIds(base)) return batch
    val byName = base.fields.filterNot(isDropped).map(f => f.name -> f).toMap
    var next = maxId(base)
    StructType(batch.fields.map { f =>
      if (LayoutCols(f.name)) f
      else byName.get(f.name).flatMap(idOf) match {
        case Some(id) => withId(f, id)
        case None => next += 1; withId(f, next)
      }
    }.toSeq)
  }

  /** Re-select `df` with `ids`'s per-column metadata attached, so the
    * parquet writer (fieldId.write) stamps the files. Columns `ids`
    * does not cover pass through untouched.
    */
  def decorate(df: DataFrame, ids: StructType): DataFrame = {
    val byName = ids.fields.map(f => f.name -> f.metadata).toMap
    df.select(df.columns.map { c =>
      byName.get(c) match {
        case Some(m) if m.contains(IdKey) => col(c).as(c, m)
        case _ => col(c)
      }
    }.toSeq: _*)
  }

  /** Tombstone for a dropped field: unique name (IDs are unique), ID
    * kept, dropped flag set. The type is retained for forensics only.
    */
  def tombstone(f: StructField): StructField = {
    val id = idOf(f).getOrElse(
      throw new IllegalStateException(s"cannot tombstone un-IDed field ${f.name}"))
    f.copy(name = s"__dropped_$id",
      metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putBoolean(DroppedKey, true).build())
  }
}
