package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, struct, to_json}

import graft.engine.{EsdbWriter, Publish}

/** The SQL catalog plugin: stores published under a root directory are
  * plain SQL tables — SELECT, SHOW TABLES, nested namespaces, VERSION
  * AS OF time travel — with the same Sort-free ordered plans as the
  * DataFrame surface, because the catalog binds to the same DSv2
  * tables.
  */
class EsdbCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "esdbtest"

  /** Root with a bucketed store at `payments` (two publish versions:
    * v1 = 200 rows, v2 = 400), a log store at `prod.clicks`, and an
    * empty namespace dir `empty_ns`.
    */
  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("esdbcat").toString
    val conf = spark.sparkContext.hadoopConfiguration
    def ev(n: Int): DataFrame =
      (1 to n).map(i => (s"s${i % 2}", s"g${i % 5}", (i % 40).toLong * 1000,
        i.toLong, i / 10.0, s"""{"k": ${i % 3}}"""))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    Publish.publish(conf, s"$dir/payments", keepVersions = 2) { tmp =>
      EsdbWriter.write(ev(200), tmp)
    }
    Publish.publish(conf, s"$dir/payments", keepVersions = 2) { tmp =>
      EsdbWriter.write(ev(400), tmp)
    }
    Publish.publish(conf, s"$dir/prod/clicks") { tmp =>
      EsdbWriter.writeLog(ev(300), tmp)
    }
    new java.io.File(s"$dir/empty_ns").mkdirs()
    spark.conf.set(s"spark.sql.catalog.$Cat", classOf[graft.sources.EsdbCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", dir)
    dir
  }

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def hasSortNode(plan: String): Boolean =
    """(?m)^\W*\*?\(?\d*\)?\s*Sort """.r.findFirstIn(plan).isDefined ||
      plan.contains(") Sort [") || plan.contains("+- Sort [")

  test("SELECT over a catalog store matches the path-based ordered read") {
    root
    val sql = spark.sql(
      s"""SELECT event_id, ts_us, value FROM $Cat.payments
         |WHERE space = 's1' AND grouping = 'g3'
         |ORDER BY ts_us DESC, event_id""".stripMargin)
    val viaPath = graft.engine.EventStore.scan(
      EsdbWriter.readOrdered(spark, s"$root/payments"), "s1", "g3")
      .select("event_id", "ts_us", "value")
    assert(sql.collect().toSeq == viaPath.collect().toSeq)
    assert(sql.count() > 0)
  }

  test("catalog scans keep the layout-order contract: no Sort in the plan") {
    root
    val plan = executed(spark.sql(
      s"""SELECT event_id, ts_us, value FROM $Cat.payments
         |WHERE space = 's1' AND grouping = 'g3'
         |ORDER BY ts_us DESC, event_id""".stripMargin))
    assert(!hasSortNode(plan), "catalog-bound store scan must not re-sort:\n" + plan)
    assert(plan.contains("BatchScan"), plan)
  }

  test("log-layout stores bind to the log table: global id order, no Sort") {
    root
    val q = spark.sql(s"SELECT event_id FROM $Cat.prod.clicks ORDER BY event_id")
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 300L))
    assert(!hasSortNode(executed(
      spark.sql(s"SELECT event_id FROM $Cat.prod.clicks ORDER BY event_id"))))
  }

  test("SHOW TABLES and namespaces reflect the directory tree") {
    root
    val top = spark.sql(s"SHOW TABLES IN $Cat").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(top == Set(("", "payments")))
    val prod = spark.sql(s"SHOW TABLES IN $Cat.prod").collect()
      .map(_.getString(1)).toSet
    assert(prod == Set("clicks"))
    val ns = spark.sql(s"SHOW NAMESPACES IN $Cat").collect().map(_.getString(0)).toSet
    assert(ns == Set("prod", "empty_ns"))
  }

  test("VERSION AS OF pins a committed publish; retired/unknown versions fail loudly") {
    root
    val v2 = spark.sql(s"SELECT count(*) AS n FROM $Cat.payments").head().getLong(0)
    val v1 = spark.sql(s"SELECT count(*) AS n FROM $Cat.payments VERSION AS OF 1")
      .head().getLong(0)
    assert(v1 == 200L && v2 == 400L)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $Cat.payments VERSION AS OF 99").collect())
    assert(e.getMessage.contains("never committed"), e.getMessage)
  }

  test("readStream.table over a catalog log table drains to the batch iterate") {
    root
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ckpt = java.nio.file.Files.createTempDirectory("catstream").toString
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    spark.readStream.table(s"$Cat.prod.clicks")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    import scala.jdk.CollectionConverters._
    // the SQL-only user's streaming drain equals the batch iterate
    val batchIds = spark.sql(s"SELECT event_id FROM $Cat.prod.clicks ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.asScala.toSeq.sorted == batchIds && batchIds == (1L to 300L))
  }

  test("read options flow to catalog tables: option(parallel) plans a wide log scan") {
    root
    // a multi-file log (append batches land as separate files)
    def ev(r: Range): DataFrame =
      r.map(i => (s"s${i % 2}", s"g${i % 5}", (i % 40).toLong * 1000,
        i.toLong, i / 10.0, s"""{"k": ${i % 3}}"""))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    val conf = spark.sparkContext.hadoopConfiguration
    Publish.publish(conf, s"$root/prod/wide") { tmp =>
      EsdbWriter.writeLog(ev(1 to 300), tmp)
    }
    EsdbWriter.appendLog(ev(301 to 600), s"$root/prod/wide")
    val par = spark.read.option("parallel", "true").table(s"$Cat.prod.wide")
    val widths = par.select("event_id").queryExecution.toRdd.getNumPartitions
    assert(widths > 1, s"catalog log table with option(parallel) should plan wide, got $widths")
    assert(par.select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == (1L to 600L))
    // default stays the single global cursor
    assert(spark.read.table(s"$Cat.prod.wide")
      .select("event_id").queryExecution.toRdd.getNumPartitions == 1)
  }

  test("DDL surface: CREATE/ALTER rejected with guidance, DROP deletes, rename moves") {
    root
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $Cat.newstore (id BIGINT) USING esdb"))
    assert(e.getMessage.contains("EsdbWriter"), e.getMessage)

    // rename then drop a throwaway store; payments stays for other tests
    val conf = spark.sparkContext.hadoopConfiguration
    Publish.publish(conf, s"$root/scratch") { tmp =>
      EsdbWriter.writeLog(Seq(("s0", "g0", 0L, 1L, 0.0, "{}"))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload"), tmp)
    }
    // the RENAME target resolves within the same catalog (a qualified
    // target would read as a namespace path)
    spark.sql(s"ALTER TABLE $Cat.scratch RENAME TO scratch2")
    assert(spark.sql(s"SELECT count(*) FROM $Cat.scratch2").head().getLong(0) == 1L)
    spark.sql(s"DROP TABLE $Cat.scratch2")
    assert(!new java.io.File(s"$root/scratch2").exists())
    assert(spark.sql(s"SHOW TABLES IN $Cat").collect()
      .map(_.getString(1)).toSet == Set("payments"))
  }

  test("metadata tables: versions/files/groupings answer from pointers and manifests") {
    root
    // versions: two committed publishes, v2 current and twice the rows
    val vs = spark.sql(s"SELECT * FROM $Cat.payments.versions ORDER BY version").collect()
    assert(vs.map(_.getLong(0)).toSeq == Seq(1L, 2L), vs.mkString(","))
    assert(vs.map(_.getBoolean(2)).toSeq == Seq(false, true))
    assert(vs.forall(r => r.getLong(3) > 0 && r.getLong(4) > 0)) // n_files, bytes

    // files: the CURRENT version's data files, keyed by space
    val fs = spark.sql(s"SELECT * FROM $Cat.payments.files").collect()
    assert(fs.nonEmpty)
    assert(fs.forall(_.getString(0).startsWith("space=")))
    assert(fs.map(_.getString(1)).toSet == Set("s0", "s1"))
    assert(fs.forall(_.getLong(2) > 0))

    // groupings: the key-index manifest as a table — matches the data
    val gs = spark.sql(
      s"SELECT DISTINCT grouping FROM $Cat.payments.groupings ORDER BY grouping").collect()
    assert(gs.map(_.getString(0)).toSeq == (0 to 4).map(i => s"g$i"))

    // log store: files are top-level (no space dirs), space is null
    val lf = spark.sql(s"SELECT * FROM $Cat.prod.clicks.files").collect()
    assert(lf.nonEmpty && lf.forall(_.isNullAt(1)))

    // a real table still loads normally; unknown metadata name refuses
    assert(spark.sql(s"SELECT count(*) FROM $Cat.payments").head().getLong(0) == 400L)
    intercept[Exception](spark.sql(s"SELECT * FROM $Cat.payments.nope").collect())
  }

  test("CALL procedures run the maintenance lifecycle from pure SQL") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    // scratch store: create, append fragmentation, compact via CALL
    val p = s"$root/proc_scratch"
    def ev(ids: Range): DataFrame = ids.map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, s"""{"k": ${i % 2}}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    Publish.publish(conf, p) { tmp => EsdbWriter.write(ev(1 to 100), tmp) }
    EsdbWriter.append(ev(101 to 110), p)
    EsdbWriter.append(ev(111 to 120), p)

    val inc = spark.sql(
      s"CALL $Cat.system.compact_incremental(table => 'proc_scratch', max_files_per_space => 1)")
      .collect().head
    assert(inc.getString(0) == "proc_scratch")
    assert(inc.getBoolean(1), "3 files per space must trigger the incremental rewrite")
    assert(spark.sql(s"SELECT count(*) FROM $Cat.proc_scratch").head().getLong(0) == 120L)

    val full = spark.sql(
      s"CALL $Cat.system.compact(table => 'proc_scratch', keep_versions => 2)").collect().head
    assert(full.getLong(1) > inc.getLong(2), "compact must publish a newer version")

    // r13 layout evolution from SQL: re-bucket at full compaction
    val rebucket = spark.sql(
      s"CALL $Cat.system.compact(table => 'proc_scratch', keep_versions => 2, subparts => 4)")
      .collect().head
    assert(rebucket.getLong(1) > full.getLong(1))
    assert(EsdbWriter.subpartsOf(conf, Publish.resolve(conf, p)) == 4,
      "_SUBPARTS must carry the new count")
    assert(spark.sql(s"SELECT count(*) FROM $Cat.proc_scratch").head().getLong(0) == 120L)
    assert(spark.sql(s"SELECT count(*) FROM $Cat.proc_scratch WHERE grouping = 'g1'")
      .head().getLong(0) == 40L)

    val vac = spark.sql(s"CALL $Cat.system.vacuum(table => 'proc_scratch')").collect().head
    assert(vac.getLong(1) == rebucket.getLong(1))

    val sealRow = spark.sql(
      s"CALL $Cat.system.seal(table => 'proc_scratch', index_name => 'k')").collect().head
    assert(sealRow.getBoolean(1))
    intercept[Exception] { // sealed: writes refuse
      EsdbWriter.append(ev(121 to 130), p)
    }

    intercept[Exception] {
      spark.sql(s"CALL $Cat.system.nope(table => 'proc_scratch')").collect()
    }
  }

  /** r12: the scheduler entry point — one CALL sweeps EVERY table under
    * the catalog root and applies each store's declared `_POLICY`;
    * policy-less stores are reported untouched.
    */
  test("CALL maintain_all sweeps the catalog: policies converge, unmanaged untouched") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    def ev(ids: Range): DataFrame = ids.map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    // A: fragmented store with a compaction policy
    val pa = s"$root/ma_frag"
    Publish.publish(conf, pa) { tmp => EsdbWriter.write(ev(1 to 60), tmp) }
    EsdbWriter.append(ev(61 to 70), pa)
    EsdbWriter.append(ev(71 to 80), pa)
    graft.engine.Maintenance.setPolicy(conf, pa,
      graft.engine.Maintenance.Policy(None, Some(1), keepVersions = 2))
    // B: multi-version store in a NAMESPACE with a version-sweep policy
    val pb = s"$root/ma_ns/deep"
    Publish.publish(conf, pb) { tmp => EsdbWriter.write(ev(1 to 40), tmp) }
    EsdbWriter.compact(spark, pb, keepVersions = 5)
    EsdbWriter.compact(spark, pb, keepVersions = 5)
    graft.engine.Maintenance.setPolicy(conf, pb,
      graft.engine.Maintenance.Policy(None, None, keepVersions = 1))
    // C: unmanaged (no policy)
    val pc = s"$root/ma_plain"
    Publish.publish(conf, pc) { tmp => EsdbWriter.write(ev(1 to 20), tmp) }

    val swept = spark.sql(s"CALL $Cat.system.maintain_all()").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(swept("ma_frag") == "compaction", swept.toString)
    assert(swept("ma_ns.deep") == "vacuum", swept.toString)
    assert(swept("ma_plain") == "unmanaged", swept.toString)

    // idempotent: a second blind sweep changes nothing
    val again = spark.sql(s"CALL $Cat.system.maintain_all()").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again("ma_frag") == "none" && again("ma_ns.deep") == "none" &&
      again("ma_plain") == "unmanaged", again.toString)

    // data intact through the sweep
    assert(spark.sql(s"SELECT count(*) FROM $Cat.ma_frag").head().getLong(0) == 80L)
    assert(spark.sql(s"SELECT count(*) FROM $Cat.ma_ns.deep").head().getLong(0) == 40L)
    assert(graft.engine.Publish.committedVersions(conf, pb).size == 1,
      "version sweep must have retired B's old versions")
  }

  /** r12: ANN as pure SQL — build_vector_index persists a stamped IVF
    * index over a payload embedding attr; vector_search probes it with
    * "more like this" semantics and REFUSES after the store mutates.
    */
  test("CALL build_vector_index / vector_search: stamped ANN from SQL") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val embs = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p = s"$root/vec_store"
    Publish.publish(conf, p) { tmp =>
      EsdbWriter.write(
        embs.select(lit("emb").as("space"), col("vec_id").cast("string").as("grouping"),
          col("vec_id").as("ts_us"), col("vec_id").as("event_id"), lit(0.0).as("value"),
          to_json(struct(col("embedding"))).as("payload")),
        tmp)
    }: Unit
    val built = spark.sql(
      s"CALL $Cat.system.build_vector_index(table => 'vec_store', lists => 8)").collect().head
    assert(built.getString(0) == "vec_store" && built.getInt(2) == 8)
    // the index tree is catalog-invisible (underscore-prefixed)
    assert(!spark.sql(s"SHOW TABLES IN $Cat").collect().map(_.getString(1)).contains("_vecidx"))
    val hits = spark.sql(
      s"CALL $Cat.system.vector_search(table => 'vec_store', query_id => 3, k => 5)").collect()
    assert(hits.length == 5)
    assert(hits.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)), "ranks 1..5")
    assert(!hits.map(_.getLong(0)).contains(3L), "a row is not its own neighbor")
    // re-building against an unchanged store is a no-op (same version)
    val v0 = Publish.currentVersion(conf, s"$root/_vecidx/vec_store/embedding").get._1
    spark.sql(s"CALL $Cat.system.build_vector_index(table => 'vec_store', lists => 8)")
    assert(Publish.currentVersion(conf, s"$root/_vecidx/vec_store/embedding").get._1 == v0)
    // ...but a DIFFERENT lists request is a rebuild, not a silent no-op
    val retuned = spark.sql(
      s"CALL $Cat.system.build_vector_index(table => 'vec_store', lists => 4)").collect().head
    assert(retuned.getInt(2) == 4, retuned.toString)
    assert(Publish.currentVersion(conf, s"$root/_vecidx/vec_store/embedding").get._1 > v0,
      "changed lists must publish a new index version")
    spark.sql(s"CALL $Cat.system.build_vector_index(table => 'vec_store', lists => 8)")
    // mutation → stamped probe refuses, rebuild serves post-mutation rows
    EsdbWriter.deleteWhere(spark, p,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 400L)))
    val e = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store', query_id => 3)").collect()
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    spark.sql(s"CALL $Cat.system.build_vector_index(table => 'vec_store', lists => 8)")
    val fresh = spark.sql(
      s"CALL $Cat.system.vector_search(table => 'vec_store', query_id => 3, k => 10)").collect()
    assert(fresh.nonEmpty && fresh.forall(_.getLong(0) < 400L),
      "rebuilt index must not serve deleted vectors")
    // unknown probe id refuses loudly
    val miss = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store', query_id => 999999)").collect()
    }
    assert(miss.getMessage.contains("no row"), miss.getMessage)
  }

  /** r13: the fresh-embedding probe — `query => '[...]'` — so SQL can
    * search with a vector that is not already a row of the corpus (the
    * #1 real ANN use case; the r12 surface only did "more like this").
    */
  test("CALL vector_search with an arbitrary query vector") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val embs = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p = s"$root/vec_store2"
    Publish.publish(conf, p) { tmp =>
      EsdbWriter.write(
        embs.select(lit("emb").as("space"), col("vec_id").cast("string").as("grouping"),
          col("vec_id").as("ts_us"), col("vec_id").as("event_id"), lit(0.0).as("value"),
          to_json(struct(col("embedding"))).as("payload")),
        tmp)
    }: Unit
    spark.sql(s"CALL $Cat.system.build_vector_index(table => 'vec_store2', lists => 8)")
    // probe with row 3's own embedding passed as a LITERAL: must equal
    // the DataFrame-API answer for the same external vector
    val vec = embs.where(col("vec_id") === 3L)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
    val qjson = vec.mkString("[", ",", "]")
    val viaSql = spark.sql(
      s"CALL $Cat.system.vector_search(table => 'vec_store2', query => '$qjson', k => 5)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    import spark.implicits._
    val external = Seq((-1L, vec.toArray)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val viaApi = graft.ops.Ivf.ivfTopKIndexed(spark,
        s"$root/_vecidx/vec_store2/embedding", external,
        k = 5, nProbe = 4, corpusPath = Some(p))
      .select("neighbor_id", "rank", "cos_x1e6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == viaApi, s"sql=$viaSql api=$viaApi")
    assert(viaSql.length == 5 && viaSql.head._1 == 3L,
      s"the corpus row the probe was copied from must rank first: $viaSql")
    // exactly one probe form, well-formed
    val both = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store2', " +
        s"query_id => 3, query => '$qjson')").collect()
    }
    assert(both.getMessage.contains("exactly one"), both.getMessage)
    val neither = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store2')").collect()
    }
    assert(neither.getMessage.contains("exactly one"), neither.getMessage)
    val malformed = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store2', " +
        "query => 'not json')").collect()
    }
    assert(malformed.getMessage.contains("float array"), malformed.getMessage)
    // staleness refusal applies to the query-vector form too
    EsdbWriter.deleteWhere(spark, p,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 400L)))
    val stale = intercept[Exception] {
      spark.sql(s"CALL $Cat.system.vector_search(table => 'vec_store2', " +
        s"query => '$qjson')").collect()
    }
    assert(stale.getMessage.contains("stale"), stale.getMessage)
  }

  test("CALL rollback re-pins the live table to an older version without copying data") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/rollback_scratch"
    def ev(n: Int): DataFrame = (1 to n).map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    Publish.publish(conf, p, keepVersions = 3) { tmp => EsdbWriter.write(ev(100), tmp) }
    Publish.publish(conf, p, keepVersions = 3) { tmp => EsdbWriter.write(ev(250), tmp) }
    assert(spark.sql(s"SELECT count(*) FROM $Cat.rollback_scratch").head().getLong(0) == 250L)
    val r = spark.sql(
      s"CALL $Cat.system.rollback(table => 'rollback_scratch', version => 1)").collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L, r.toString)
    assert(spark.sql(s"SELECT count(*) FROM $Cat.rollback_scratch").head().getLong(0) == 100L)
    // the mistaken version stays pinnable while retained
    assert(spark.sql(s"SELECT count(*) FROM $Cat.rollback_scratch VERSION AS OF 2")
      .head().getLong(0) == 250L)
    // rolling back to a never-committed version refuses
    intercept[Exception] {
      spark.sql(s"CALL $Cat.system.rollback(table => 'rollback_scratch', version => 99)").collect()
    }
  }

  test("TIMESTAMP AS OF resolves the newest version committed at or before the instant") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/ts_travel"
    def ev(n: Int): DataFrame = (1 to n).map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    Publish.publish(conf, p, keepVersions = 3) { tmp => EsdbWriter.write(ev(100), tmp) }
    Thread.sleep(1100) // pointer mtimes are second-granular on some filesystems
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    Publish.publish(conf, p, keepVersions = 3) { tmp => EsdbWriter.write(ev(250), tmp) }
    val between = new java.sql.Timestamp(betweenMs)
    assert(spark.sql(
      s"SELECT count(*) FROM $Cat.ts_travel TIMESTAMP AS OF '$between'")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $Cat.ts_travel").head().getLong(0) == 250L)
    intercept[Exception] { // before any commit existed
      spark.sql(s"SELECT count(*) FROM $Cat.ts_travel TIMESTAMP AS OF '2001-01-01'").collect()
    }
  }

  test("ALTER TABLE ADD COLUMN is a sidecar-only evolution; non-additive changes refuse") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/alter_scratch"
    Publish.publish(conf, p) { tmp =>
      EsdbWriter.write((1 to 50).map(i =>
        ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}"))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload"), tmp)
    }
    spark.sql(s"ALTER TABLE $Cat.alter_scratch ADD COLUMN score DOUBLE")
    val t = spark.table(s"$Cat.alter_scratch")
    assert(t.columns.contains("score"))
    assert(t.where(col("score").isNull).count() == 50, "existing rows read null")
    // appends may now fill the column; the scan sees both
    EsdbWriter.append((51 to 60).map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}", i * 1.5))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload", "score"), p)
    assert(spark.table(s"$Cat.alter_scratch").where(col("score").isNotNull).count() == 10)
    intercept[Exception] { // cross-kind type change is not metadata-expressible
      spark.sql(s"ALTER TABLE $Cat.alter_scratch ALTER COLUMN value TYPE STRING")
    }
    intercept[Exception] { // drop is not metadata-expressible
      spark.sql(s"ALTER TABLE $Cat.alter_scratch DROP COLUMN payload")
    }
  }

  test("sinceVersion reads only post-snapshot appends; rewrites re-surface everything") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/inc_scratch"
    def batch(r: Range): DataFrame = r.map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    Publish.publish(conf, p) { tmp => EsdbWriter.write(batch(1 to 50), tmp) }
    EsdbWriter.append(batch(51 to 70), p)
    // catalog SQL surface: reader options flow into the scan builder
    val inc = spark.read.option("sinceVersion", "1").table(s"$Cat.inc_scratch")
    assert(inc.select("event_id").as[Long].collect().sorted.toSeq == (51L to 70L))
    assert(spark.table(s"$Cat.inc_scratch").count() == 70, "full read unaffected")
    // a new version snapshots at commit: nothing is "since" it yet
    EsdbWriter.compact(spark, p, keepVersions = 2)
    assert(spark.read.option("sinceVersion", "2").table(s"$Cat.inc_scratch").count() == 0)
    // appends after the commit surface incrementally again
    EsdbWriter.append(batch(71 to 75), p)
    assert(spark.read.option("sinceVersion", "2").table(s"$Cat.inc_scratch").count() == 5)
    // a never-committed baseline fails loudly, never silently full-scans
    intercept[Exception] {
      spark.read.option("sinceVersion", "99").table(s"$Cat.inc_scratch").collect()
    }
  }

  test("ALTER COLUMN TYPE widens int->long proactively; old files up-cast at scan") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/widen_scratch"
    Publish.publish(conf, p) { tmp =>
      EsdbWriter.write((1 to 30).map(i =>
        ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}", i))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload", "hits"), tmp)
    }
    spark.sql(s"ALTER TABLE $Cat.widen_scratch ALTER COLUMN hits TYPE BIGINT")
    val t = spark.table(s"$Cat.widen_scratch")
    assert(t.schema("hits").dataType == org.apache.spark.sql.types.LongType)
    assert(t.select(org.apache.spark.sql.functions.sum(col("hits"))).head.getLong(0) ==
      (1 to 30).map(_.toLong).sum)
    // a batch that genuinely needs long now appends cleanly
    EsdbWriter.append((31 to 40).map(i =>
      ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, "{}", i + 10000000000L))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload", "hits"), p)
    assert(spark.table(s"$Cat.widen_scratch")
      .where(col("hits") > 10000000000L).count() == 10)
    intercept[Exception] { // narrowing refuses
      spark.sql(s"ALTER TABLE $Cat.widen_scratch ALTER COLUMN hits TYPE INT")
    }
  }

  /** r14: the recall contract — `build_vector_index(recall_target =>
    * 0.9)` measures the recall-vs-probes curve on the built index and
    * stamps the smallest probes meeting the target as the default
    * operating point, so `vector_search` meets a DECLARED recall
    * instead of relying on the user reading a benchmark doc.
    */
  test("recall contract: recall_target stamps a measured default-probes operating point") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/vec_recall"
    // gaussian-mixture corpus (8 tight clusters x 64 vectors, dim 8):
    // the clustered regime IVF exists for — true neighbors share a list
    val rng = new scala.util.Random(7)
    val rows = (0 until 512).map { i =>
      val c = i % 8
      val emb = Array.tabulate(8)(d =>
        (if (d == c) 10f else 0f) + rng.nextFloat() * 0.5f)
      ("emb", s"g$c", i.toLong, i.toLong, 0.0, emb)
    }.toDF("space", "grouping", "ts_us", "event_id", "value", "emb")
      .select(col("space"), col("grouping"), col("ts_us"), col("event_id"),
        col("value"), to_json(struct(col("emb").as("embedding"))).as("payload"))
    Publish.publish(conf, p, keepVersions = 4) { tmp =>
      EsdbWriter.write(rows, tmp)
    }: Unit
    val built = spark.sql(
      s"CALL $Cat.system.build_vector_index(table => 'vec_recall', lists => 8, " +
        "recall_target => 0.9D)").collect().head
    val defProbes = built.getInt(4)
    assert(defProbes >= 1 && defProbes <= 8, s"operating point: $defProbes")
    assert(defProbes < 8, "clustered fixture must not need the full probe for 0.9")
    // the contract holds on an independent query sample: default-probe
    // results (probes omitted -> operating point) vs the full probe
    def hits(qid: Int, probes: String): Set[Long] = spark.sql(
      s"CALL $Cat.system.vector_search(table => 'vec_recall', query_id => $qid, " +
        s"k => 10$probes)").collect().map(_.getLong(0)).toSet
    val sample = Seq(11, 97, 203, 310, 441)
    val recall = sample.map { q =>
      val full = hits(q, ", probes => 8")
      hits(q, "").intersect(full).size.toDouble / math.max(1, full.size)
    }.sum / sample.size
    assert(recall >= 0.9, f"measured recall at the default operating point: $recall%.3f")
    // explicit probes still overrides (a 1-list probe runs and is
    // k-bounded; on this fixture it's already the operating point or
    // sharper, so only the surface is being asserted here)
    assert(hits(11, ", probes => 1").size <= 10)
    // maintain's index refresh RE-MEASURES: mutate the corpus so the
    // stamp moves, maintain rebuilds, and the new index version carries
    // a fresh _recall sidecar with a valid operating point
    val idxPath = s"$root/_vecidx/vec_recall/embedding"
    val v0 = Publish.currentVersionNumber(conf, idxPath).get
    EsdbWriter.deleteWhere(spark, p,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 480L)))
    graft.engine.Maintenance.setPolicy(conf, p,
      graft.engine.Maintenance.Policy(keepVersions = 2))
    val actions = graft.engine.Maintenance.maintain(spark, p)
    assert(actions.contains("index_refresh"), s"got $actions")
    assert(Publish.currentVersionNumber(conf, idxPath).get > v0)
    val remeasured = graft.ops.Ivf.defaultProbes(conf, idxPath)
    assert(remeasured.exists(np => np >= 1 && np <= 8),
      s"refresh must re-measure the operating point, got $remeasured")
    assert(hits(11, "").nonEmpty, "default-probe search works on the refreshed index")
  }

  /** r14: SHOW TBLPROPERTIES / DESCRIBE EXTENDED surface what the
    * sidecar markers know — layout, subparts, clustering, carry mode,
    * cdc retention, policy, declared vector indexes — so operators
    * stop spelunking `cat.t.policy` + `cat.t.clustering` + `_VECIDX`.
    */
  test("SHOW TBLPROPERTIES reflects the markers for store/log/cdc/clustered variants") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    def props(t: String): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $Cat.$t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // plain bucketed store
    val pay = props("payments")
    assert(pay.get("layout").contains("store") && pay.get("cdc").contains("false"), pay.toString)
    assert(pay.get("carry").exists(Set("link", "manifest")), pay.toString)
    assert(pay.contains("version") && pay.contains("subparts"), pay.toString)
    // log store
    val clk = props("prod.clicks")
    assert(clk.get("layout").contains("log"), clk.toString)
    // cdc + clustered + policy + vector index, via CTAS properties
    (1 to 60).map(i => (s"s${i % 2}", s"g${i % 5}", i.toLong * 1000, i.toLong,
      i.toDouble, s"""{"embedding": [${i / 10f}, ${i / 20f}]}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
      .createOrReplaceTempView("props_seed")
    spark.sql(s"CREATE TABLE $Cat.props_t TBLPROPERTIES(" +
      "'cdc'='true', 'keepVersions'='6', 'clusterBy'='value', 'clusterChunks'='2') " +
      "AS SELECT * FROM props_seed")
    graft.engine.Maintenance.setPolicy(conf, s"$root/props_t",
      graft.engine.Maintenance.Policy(maxFilesPerSpace = Some(4), keepVersions = 3))
    spark.sql(s"CALL $Cat.system.build_vector_index(table => 'props_t', lists => 2, " +
      "recall_target => 0.5D)").collect(): Unit
    val pt = props("props_t")
    assert(pt.get("cdc").contains("true") && pt.get("cdc.keepVersions").contains("6"),
      pt.toString)
    assert(pt.get("cluster.columns").contains("value") &&
      pt.get("cluster.chunks").contains("2"), pt.toString)
    assert(pt.get("policy.keep_versions").contains("3") &&
      pt.get("policy.max_files_per_space").contains("4"), pt.toString)
    assert(pt.get("vecidx.embedding").exists(v =>
      v.contains("lists=2") && v.contains("recall_target=0.5")), pt.toString)
    // toggling cdc off is visible, with the tombstoned retention intact
    spark.sql(s"ALTER TABLE $Cat.props_t SET TBLPROPERTIES('cdc'='false')")
    val off = props("props_t")
    assert(off.get("cdc").contains("false") && off.get("cdc.keepVersions").contains("6"),
      off.toString)
    // DESCRIBE EXTENDED carries the same map in its Table Properties row
    val desc = spark.sql(s"DESCRIBE EXTENDED $Cat.props_t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val tp = desc.getOrElse("Table Properties", "")
    assert(tp.contains("cluster.columns=value") && tp.contains("cdc=false"), tp)
  }

  test("metadata tables: tails serves the seal-time sidecar") {
    root
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"$root/sealed_meta"
    Publish.publish(conf, p) { tmp =>
      EsdbWriter.write((1 to 50).map(i =>
        ("s", s"g${i % 3}", i.toLong * 1000, i.toLong, 0.0, s"""{"k": ${i % 4}}"""))
        .toDF("space", "grouping", "ts_us", "event_id", "value", "payload"), tmp)
    }
    // tails before seal: empty (no sidecar yet)
    assert(spark.sql(s"SELECT * FROM $Cat.sealed_meta.tails").collect().isEmpty)
    EsdbWriter.seal(spark, EsdbWriter.dataRoot(spark, p), "k")
    val t = spark.sql(s"SELECT * FROM $Cat.sealed_meta.tails ORDER BY attr").collect()
    assert(t.nonEmpty)
    assert(t.forall(_.getString(0) == "k"))
    assert(t.map(_.getString(1)).toSet == Set("0", "1", "2", "3"))
  }
}
