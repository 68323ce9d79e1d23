package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{EsdbWriter, Maintenance, Publish}

/** Store cloning: one version's dir copies into a brand-new OPEN,
  * UNMANAGED store behind its own publish pointer — the dev/test
  * sandbox primitive.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.delete()
    dir.getAbsolutePath
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def ev(ids: Range): DataFrame =
    ids.map(i => (s"s${i % 3}", s"g${i % 5}", (i % 40).toLong * 1000, i.toLong,
      i / 10.0, s"""{"k": ${i % 9}}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("a clone matches the source, keeps its layout, and is fully independent") {
    val src = freshDir("clonesrc") + "/t"
    val dst = freshDir("clonedst") + "/c"
    Publish.publish(hconf, src, keepVersions = 4) { tmp =>
      EsdbWriter.write(ev(1 to 200), tmp, indexAttrs = Seq("k"), subparts = 2,
        clusterBy = Seq("value", "ts_us"), clusterChunks = 4, clusterCurve = "zorder")
    }: Unit

    EsdbWriter.cloneStore(spark, src, dst)
    assert(same(EsdbWriter.readOrdered(spark, dst), EsdbWriter.readOrdered(spark, src)))
    // layout markers traveled: the clone mutates under the same rules
    assert(EsdbWriter.subpartsOf(hconf, EsdbWriter.dataRoot(spark, dst)) == 2)
    assert(EsdbWriter.clusterOf(hconf, EsdbWriter.dataRoot(spark, dst)) ==
      EsdbWriter.Clustering(Seq("value", "ts_us"), 4, "zorder"))
    // independence: a destructive experiment on the clone leaves the
    // source byte-identical, and vice versa
    EsdbWriter.deleteWhere(spark, dst,
      Seq(org.apache.spark.sql.sources.LessThan("value", 5.0)))
    EsdbWriter.append(ev(201 to 210), src)
    assert(EsdbWriter.readOrdered(spark, src).count() == 210)
    assert(EsdbWriter.readOrdered(spark, dst).count() ==
      (1 to 200).count(_ / 10.0 >= 5.0))
    // refusal: an existing target never gets clobbered
    intercept[IllegalArgumentException] { EsdbWriter.cloneStore(spark, src, dst) }
  }

  test("a version-pinned clone freezes history; seal and policy do not travel") {
    val src = freshDir("clonepin") + "/t"
    Publish.publish(hconf, src, keepVersions = 4) { tmp =>
      EsdbWriter.write(ev(1 to 50), tmp)
    }: Unit
    EsdbWriter.appendVersioned(ev(51 to 80), src, keepVersions = 4) // v2
    Maintenance.setPolicy(hconf, src, Maintenance.Policy(maxFilesPerSpace = Some(1)))
    EsdbWriter.seal(spark, src, "k")

    val atV1 = freshDir("clonepin") + "/v1"
    EsdbWriter.cloneStore(spark, src, atV1, version = Some(1L))
    assert(EsdbWriter.readOrdered(spark, atV1).count() == 50, "pinned clone = v1 content")
    // the clone is OPEN (the source is sealed) and UNMANAGED
    assert(Maintenance.policyOf(hconf, atV1).isEmpty)
    EsdbWriter.append(ev(1000 to 1004), atV1) // would throw on a sealed store
    assert(EsdbWriter.readOrdered(spark, atV1).count() == 55)
  }

  test("a LOG store clone carries its epoch markers; CALL surface works") {
    val root = freshDir("clonelog")
    Publish.publish(hconf, s"$root/src", keepVersions = 4) { tmp =>
      EsdbWriter.writeLog(ev(1 to 40), tmp)
    }: Unit
    EsdbWriter.appendLogBatch(ev(41 to 60), s"$root/src", epochId = 3L)

    val cat = "esdbclone"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.EsdbCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val res = spark.sql(
      s"CALL $cat.system.clone_table(table => 'src', target => 'copy')").collect()
    assert(res.length == 1 && res(0).getString(1) == "copy")

    val ids = graft.engine.EventLog.iterate(EsdbWriter.readLog(spark, s"$root/copy"))
      .select("event_id").as[Long].collect().toSeq
    assert(ids == (1L to 60L),
      "epoch-marker-gated files must stay visible in the clone")
  }
}
