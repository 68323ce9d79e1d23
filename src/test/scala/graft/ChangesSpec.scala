package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.engine.{EsdbWriter, Publish}

/** Change feeds that survive rewrites: per-version add/remove file
  * diffs from the `_FILES` snapshots (`cat.t.changes` + the rewrite-
  * aware `option("changesSince", v)` scan) and the row-level
  * [[EsdbWriter.changesFeed]] — carried files cancel by NAME for free,
  * only the rewrite footprint pays a row-level set difference, and the
  * feed stays exact across delete + update + full compaction.
  */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.delete()
    dir.getAbsolutePath
  }

  private def mk(ids: Range, spaceOf: Int => String = i => Seq("a", "b", "c")(i % 3)): DataFrame =
    ids.map(i => (spaceOf(i), s"g${i % 4}", i.toLong * 1000, i.toLong, i / 10.0, s"p$i"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  private def writeV1(p: String, df: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Publish.publish(conf, p, keepVersions = 8) { tmpDir =>
      EsdbWriter.write(df, tmpDir)
    }: Unit
  }

  private def feedRows(df: DataFrame): Set[(String, Long)] =
    df.select("_change", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("changesFeed is exact across append + delete + update + compact") {
    val p = tmp("chgfeed")
    writeV1(p, mk(1 to 60))
    // v2: versioned append of new ids
    EsdbWriter.appendVersioned(mk(100 to 129), p, keepVersions = 8)
    // v3: predicate delete (rewrite kind)
    EsdbWriter.deleteWhere(spark, p, Seq(LessThan("value", 1.0)), keepVersions = 8)
    // v4: redaction update (rewrite kind)
    EsdbWriter.updateWhere(spark, p, Map("payload" -> lit("{}")),
      Seq(GreaterThanOrEqual("value", 12.0)), keepVersions = 8)
    // v5: full compaction renames EVERYTHING; the feed must net it out
    EsdbWriter.compact(spark, p, keepVersions = 8)

    val feed = EsdbWriter.changesFeed(spark, p, 1L)
    // expected from first principles: deletes = v1 rows gone or changed;
    // inserts = rows now present that v1 lacked
    val v1 = (1 to 60).map(i => (i.toLong, i / 10.0, s"p$i"))
    val deleted = v1.filter(_._2 < 1.0).map(_._1).toSet // ids 1..9
    val redactedOld = v1.filter(t => t._2 >= 12.0).map(_._1).toSet // payload changed
    val expectedDeletes = deleted ++ redactedOld
    val appended = (100 to 129).map(_.toLong).toSet // all values 10.0-12.9 >= 1.0
    val appendedRedacted = (100 to 129).filter(i => i / 10.0 >= 12.0).map(_.toLong).toSet
    val expectedInserts = appended ++ redactedOld // redaction = delete old + insert new
    assert(feedRows(feed) ==
      expectedDeletes.map(("delete", _)) ++ expectedInserts.map(("insert", _)),
      "feed must equal the content diff of the two snapshots")
    // and the redacted insert rows carry the NEW payload
    val redactedRows = feed.where(col("_change") === "insert" && col("payload") === "{}")
      .select("event_id").as[Long].collect().toSet
    assert(redactedRows == (redactedOld ++ appendedRedacted))
  }

  test("changesFeed across ONLY a compaction nets to zero changes") {
    val p = tmp("chgnoop")
    writeV1(p, mk(1 to 40))
    EsdbWriter.compact(spark, p, keepVersions = 8)
    val feed = EsdbWriter.changesFeed(spark, p, 1L)
    assert(feed.count() == 0,
      "a pure compaction rewrites encodings, not content: the feed must be empty")
  }

  test("changesFeed ≡ diff of the two version-pinned snapshot scans") {
    val p = tmp("chgdiff")
    writeV1(p, mk(1 to 50))
    EsdbWriter.appendVersioned(mk(200 to 219), p, keepVersions = 8)
    EsdbWriter.deleteWhere(spark, p, Seq(GreaterThan("value", 3.0)), keepVersions = 8)
    val cols = Seq("space", "grouping", "ts_us", "event_id", "value", "payload")
    val atV1 = EsdbWriter.readOrderedAt(spark, p, 1L).select(cols.map(col): _*)
    val now = EsdbWriter.readOrdered(spark, p).select(cols.map(col): _*)
    val expected =
      now.except(atV1).withColumn("_change", lit("insert"))
        .unionByName(atV1.except(now).withColumn("_change", lit("delete")))
        .select(("_change" +: cols).map(col): _*) // except() is positional
    val feed = EsdbWriter.changesFeed(spark, p, 1L).select(("_change" +: cols).map(col): _*)
    assert(feed.except(expected).count() == 0 && expected.except(feed).count() == 0,
      "feed must equal the EXCEPT-diff of the pinned snapshot scans")
  }

  test("cat.t.changes classifies appends vs rewrites and flags at-head appends") {
    val p = tmp("chgmeta")
    writeV1(p, mk(1 to 30))
    EsdbWriter.appendVersioned(mk(50 to 59), p, keepVersions = 8) // v2 append
    EsdbWriter.deleteWhere(spark, p, Seq(LessThan("value", 0.5)), keepVersions = 8) // v3 rewrite
    EsdbWriter.append(mk(300 to 304), p) // at-head, uncommitted
    val name = new java.io.File(p).getName
    spark.conf.set("spark.sql.catalog.esdb_chg", classOf[graft.sources.EsdbCatalog].getName)
    spark.conf.set("spark.sql.catalog.esdb_chg.root", new java.io.File(p).getParent)
    val rows = spark.sql(
      s"SELECT version, kind, change, committed FROM esdb_chg.`$name`.changes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows.filter(_._1 == 1L).forall(r => r._2 == "append" && r._3 == "add"))
    assert(rows.filter(_._1 == 2L).forall(r => r._2 == "append" && r._3 == "add"),
      s"v2 was a pure append: $rows")
    val v3 = rows.filter(r => r._1 == 3L && r._4)
    assert(v3.nonEmpty && v3.forall(_._2 == "rewrite"), s"v3 was a rewrite: $rows")
    assert(v3.exists(_._3 == "add") && v3.exists(_._3 == "remove"),
      "a rewrite diff lists both added and removed files")
    val live = rows.filter(!_._4)
    assert(live.nonEmpty && live.forall(r => r._2 == "append" && r._3 == "add" && r._1 == 3L),
      s"at-head appends flag committed=false on the head version: $rows")
  }

  test("changesSince reads the pure append delta and refuses after a rewrite") {
    val p = tmp("chgsince")
    writeV1(p, mk(1 to 30))
    EsdbWriter.appendVersioned(mk(50 to 59), p, keepVersions = 8)
    EsdbWriter.append(mk(300 to 304), p)
    val got = spark.read.format("esdb").option("changesSince", "1").load(p)
      .select("event_id").as[Long].collect().toSet
    assert(got == ((50 to 59) ++ (300 to 304)).map(_.toLong).toSet,
      "append-only history: changesSince = the appended rows")
    // now a rewrite intervenes: file-level incremental must refuse
    EsdbWriter.deleteWhere(spark, p, Seq(LessThan("value", 0.5)), keepVersions = 8)
    val e = intercept[IllegalStateException] {
      spark.read.format("esdb").option("changesSince", "1").load(p).count()
    }
    assert(e.getMessage.contains("changesFeed"),
      s"refusal must point at the row-level feed: ${e.getMessage}")
    // sinceVersion (adds-only contract) still reads, re-surfacing renames
    assert(spark.read.format("esdb").option("sinceVersion", "1").load(p).count() > 0)
    // and the row-level feed handles it
    assert(EsdbWriter.changesFeed(spark, p, 1L).count() > 0)
  }

  test("the feed window is the retention window: a swept base version fails loudly") {
    val p = tmp("chgswept")
    writeV1(p, mk(1 to 20))
    EsdbWriter.appendVersioned(mk(30 to 39), p, keepVersions = 8)
    // aggressive retention: only the current version's data survives
    EsdbWriter.compact(spark, p, keepVersions = 1)
    Publish.vacuum(spark.sparkContext.hadoopConfiguration, p, keep = 1)
    intercept[Exception] {
      EsdbWriter.changesFeed(spark, p, 1L).count()
    }
  }
}
