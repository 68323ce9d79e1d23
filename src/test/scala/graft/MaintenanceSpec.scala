package graft

import org.apache.spark.sql.DataFrame

import graft.engine.{EsdbWriter, Maintenance, Publish}

/** Policy-driven maintenance: declare retention / fragmentation /
  * version-sweep knobs once on the store, then `maintain` applies them
  * idempotently — a scheduler calls it blindly, a conforming store
  * commits nothing.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.delete()
    dir.getAbsolutePath
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** Events at hour granularity: id i sits i hours in the past of t0. */
  private def ev(ids: Range, t0: Long): DataFrame =
    ids.map(i => (s"s${i % 2}", s"g${i % 5}", t0 - i.toLong * 3600L * 1000000L,
      i.toLong, i / 10.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  test("policy round-trips through the marker; corrupt markers throw") {
    val p = freshDir("polrt")
    assert(Maintenance.policyOf(hconf, p).isEmpty)
    val pol = Maintenance.Policy(Some(1000L), Some(4), keepVersions = 3)
    Maintenance.setPolicy(hconf, p, pol)
    assert(Maintenance.policyOf(hconf, p).contains(pol))
    Maintenance.clearPolicy(hconf, p)
    assert(Maintenance.policyOf(hconf, p).isEmpty)
    // corrupt marker: fail, never silently skip maintenance
    val m = new org.apache.hadoop.fs.Path(p, Maintenance.PolicyMarker)
    val out = m.getFileSystem(hconf).create(m, true)
    out.write("retention_us=abc".getBytes("UTF-8")); out.close()
    intercept[IllegalStateException] { Maintenance.policyOf(hconf, p) }
  }

  test("maintain applies retention + fragmentation repair + vacuum, then converges") {
    val p = freshDir("polmaint") + "/t"
    val t0 = 1706659200000000L
    Publish.publish(hconf, p, keepVersions = 8) { tmp =>
      EsdbWriter.write(ev(1 to 100, t0), tmp)
    }: Unit
    // fragment: several appends (each adds a file per space)
    (1 to 3).foreach(k => EsdbWriter.append(ev((100 + k * 10) to (109 + k * 10), t0), p))

    Maintenance.setPolicy(hconf, p, Maintenance.Policy(
      retentionUs = Some(50L * 3600L * 1000000L), // keep the last 50 hours
      maxFilesPerSpace = Some(2), keepVersions = 1))

    val actions = Maintenance.maintain(spark, p, nowUs = Some(t0))
    assert(actions.contains("retention"), s"got $actions")
    assert(actions.contains("compaction") || actions.contains("vacuum"), s"got $actions")

    val left = EsdbWriter.readOrdered(spark, p)
    // ids 1..50 survive retention (cutoff exclusive: ts < t0-50h
    // expires, id 50 sits exactly at the cutoff); the appended
    // 110..139 are 110+ hours old — all expired
    assert(left.select("event_id").as[Long].collect().toSet == (1L to 50L).toSet)
    // a second run converges: nothing left to do
    val again = Maintenance.maintain(spark, p, nowUs = Some(t0))
    assert(again.isEmpty, s"maintain must converge, got $again")
    // version churn stopped too
    val v = Publish.currentVersion(hconf, p).get._1
    Maintenance.maintain(spark, p, nowUs = Some(t0)): Unit
    assert(Publish.currentVersion(hconf, p).get._1 == v)
  }

  test("maintain is layout-aware: a LOG store trims by ts and re-compacts to the target width") {
    val p = freshDir("polmaintlog") + "/log"
    val t0 = 1706659200000000L
    Publish.publish(hconf, p, keepVersions = 8) { tmp =>
      EsdbWriter.writeLog(ev(1 to 60, t0), tmp)
    }: Unit
    (1 to 4).foreach(k =>
      EsdbWriter.appendLog(ev((60 + k * 10) to (69 + k * 10), t0), p))

    Maintenance.setPolicy(hconf, p, Maintenance.Policy(
      retentionUs = Some(80L * 3600L * 1000000L), // keep the last 80 hours
      maxFilesPerSpace = Some(2), keepVersions = 1))
    val actions = Maintenance.maintain(spark, p, nowUs = Some(t0))
    assert(actions.contains("retention"), s"got $actions")
    assert(actions.contains("compaction"), s"got $actions")

    // base ids 1..60 (ages 1-60h) survive; appends cover 70..109 and
    // only 70..80 survive the 80h cutoff (exclusive: id 80 sits on it)
    val ids = graft.engine.EventLog.iterate(EsdbWriter.readLog(spark, p))
      .select("event_id").as[Long].collect().toSeq
    assert(ids == ((1L to 60L) ++ (70L to 80L)),
      s"got ${ids.take(5)}..${ids.takeRight(5)}")
    // converged: a second run does nothing
    assert(Maintenance.maintain(spark, p, nowUs = Some(t0)).isEmpty)
  }

  test("an unmanaged store is a no-op; CALL surface reports actions") {
    val root = freshDir("polcall")
    Publish.publish(hconf, s"$root/t", keepVersions = 8) { tmp =>
      EsdbWriter.write(ev(1 to 40, 1706659200000000L), tmp)
    }: Unit
    assert(Maintenance.maintain(spark, s"$root/t").isEmpty)

    val cat = "esdbpol"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.EsdbCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // an unmanaged store's policy metadata table is empty
    assert(spark.sql(s"SELECT * FROM $cat.t.policy").count() == 0)
    spark.sql(s"CALL $cat.system.set_policy(table => 't', max_files_per_space => 1)")
      .collect(): Unit
    assert(Maintenance.policyOf(hconf, s"$root/t")
      .contains(Maintenance.Policy(None, Some(1), 2)))
    // ... and SQL-discoverable once declared
    val pol = spark.sql(s"SELECT * FROM $cat.t.policy").collect()
    assert(pol.length == 1 && pol(0).isNullAt(0) &&
      pol(0).getInt(1) == 1 && pol(0).getInt(2) == 2, pol.mkString)
    // fragment then CALL maintain
    EsdbWriter.append(ev(41 to 60, 1706659200000000L), s"$root/t")
    val res = spark.sql(s"CALL $cat.system.maintain(table => 't')").collect()
    assert(res.length == 1)
    assert(res(0).getString(1).contains("compaction"), res(0).toString)
    assert(EsdbWriter.readOrdered(spark, s"$root/t").count() == 60)
    val res2 = spark.sql(s"CALL $cat.system.maintain(table => 't')").collect()
    assert(res2(0).getString(1) == "none" || res2(0).getString(1) == "vacuum",
      s"second CALL must converge, got ${res2(0)}")
  }

  /** r13: maintain keeps declared vector indexes fresh — a retention
    * delete moves the corpus stamp, and without the refresh every
    * maintained store's ANN probes refuse until a human rebuilds.
    */
  test("maintain refreshes a declared vector index after its own commits") {
    import org.apache.spark.sql.functions._
    val root = freshDir("polvec")
    val p = s"$root/t"
    val t0 = 1706659200000000L
    // events carrying an embedding in the payload, spread over hours
    val docs = (1 to 80).map { i =>
      (s"s${i % 2}", s"g${i % 5}", t0 - i.toLong * 3600L * 1000000L, i.toLong, 0.0,
        Array.tabulate(6)(d => (i * 6 + d).toFloat / 10f))
    }.toDF("space", "grouping", "ts_us", "event_id", "value", "emb")
      .select(col("space"), col("grouping"), col("ts_us"), col("event_id"),
        col("value"), to_json(struct(col("emb").as("embedding"))).as("payload"))
    Publish.publish(hconf, p, keepVersions = 8) { tmp =>
      EsdbWriter.write(docs, tmp)
    }: Unit
    val cat = "esdbpolvec"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.EsdbCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CALL $cat.system.build_vector_index(table => 't', lists => 4)").collect(): Unit
    assert(graft.ops.Ivf.registeredIndexes(hconf, p).map(_.attr) == Seq("embedding"))
    def search() = spark.sql(
      s"CALL $cat.system.vector_search(table => 't', query_id => 3, k => 5)").collect()
    assert(search().length == 5)
    // retention delete via maintain: index refresh rides the same run
    Maintenance.setPolicy(hconf, p, Maintenance.Policy(
      retentionUs = Some(50L * 3600L * 1000000L), keepVersions = 1))
    val actions = Maintenance.maintain(spark, p, nowUs = Some(t0))
    assert(actions.contains("retention"), s"got $actions")
    assert(actions.contains("index_refresh"), s"got $actions")
    // probes keep working without a manual rebuild, and the refreshed
    // index no longer serves retention-deleted vectors (id > 50)
    val hits = search()
    assert(hits.nonEmpty && hits.forall(_.getLong(0) <= 50L), hits.mkString(", "))
    // converged: a second maintain neither commits nor re-refreshes
    val again = Maintenance.maintain(spark, p, nowUs = Some(t0))
    assert(!again.contains("index_refresh") && !again.contains("retention"), s"got $again")
    // an indexless managed store never touches index machinery
    val p2 = s"$root/t2"
    Publish.publish(hconf, p2) { tmp => EsdbWriter.write(ev(1 to 10, t0), tmp) }: Unit
    Maintenance.setPolicy(hconf, p2, Maintenance.Policy(maxFilesPerSpace = Some(4)))
    assert(!Maintenance.maintain(spark, p2, nowUs = Some(t0)).contains("index_refresh"))
  }
}
