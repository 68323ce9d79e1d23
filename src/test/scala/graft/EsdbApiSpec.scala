package graft

import java.nio.file.Files

import graft.api.{Esdb, Event, EventStream}

/** Exercises the reference-shaped façade end-to-end: write a store,
  * open it, and drive the callback API the way the reference's example
  * test does (example_test.go:16-115).
  */
class EsdbApiSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("esdbapi").toFile
    d.delete()
    d.getAbsolutePath
  }

  private lazy val ev = Seq(
    ("a", "g", 2L, 1L, 1.0, """{"i": "i1"}"""),
    ("a", "h", 3L, 2L, 2.0, """{"i": "i2"}"""),
    ("a", "h", 1L, 3L, 3.0, """{"i": "i1"}"""),
    ("b", "i", 2L, 4L, 4.0, """{"i": "i2"}""")
  ).toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  test("write → open → find/iterate/scan, callback early exit") {
    val dir = freshDir()
    Esdb.write(ev, dir)
    val db = Esdb.open(spark, dir)

    assert(db.spaces == Seq("a", "b"))
    assert(db.find("zz").isEmpty)

    val sp = db.find("a").get
    assert(sp.groupings == Seq("g", "h"))

    var seen = List.empty[Long]
    sp.scan("h") { e => seen ::= e.event_id; true }
    assert(seen.reverse == List(2L, 3L)) // ts desc

    // early exit: stop after the first event
    var count = 0
    sp.scan("h") { _ => count += 1; false }
    assert(count == 1)

    var viaIndex = List.empty[Long]
    sp.scanIndexN("i", "i1", 1) { e => viaIndex ::= e.event_id; true }
    assert(viaIndex == List(1L))

    // time-bounded scan: the Scanner-false-at-a-bound pattern, planned
    var since = List.empty[Long]
    sp.scanSince("h", sinceTsUs = 3L) { e => since ::= e.event_id; true }
    assert(since == List(2L)) // only ts=3; the ts=1 event is below the bound
  }

  test("stream: create → append → iterate/resume → close blocks writes") {
    val dir = freshDir()
    val s = EventStream.create(spark, dir, ev)

    var ids = List.empty[Long]
    val next = s.iterate() { e => ids ::= e.event_id; true }
    assert(ids.reverse == List(1L, 2L, 3L, 4L))
    assert(next == 5L)

    val more = Seq(("b", "i", 9L, 5L, 5.0, """{"i": "i1"}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    s.write(more)

    var resumed = List.empty[Long]
    s.iterate(next) { e => resumed ::= e.event_id; true }
    assert(resumed == List(5L))

    assert(s.first("i", "i1").contains(5L))
    assert(s.first("i", "nope").isEmpty)
    assert(s.tails("i") == Map("i1" -> 5L, "i2" -> 4L))

    s.close("i")
    assert(s.isClosed)
    intercept[IllegalArgumentException] { s.write(more) }
    // closed stream still serves tails (from the seal sidecar)
    assert(s.tails("i") == Map("i1" -> 5L, "i2" -> 4L))
  }

  test("stream views: ordered iterate plans no Sort; the live view drains appends") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = freshDir()
    val s = EventStream.create(spark, dir, ev)
    // the log layout's order is the iterate order — no Sort in the plan
    val plan = graft.engine.EventLog.iterate(s.logFrame)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("+- Sort [") && !plan.contains(") Sort ["),
      "facade iterate must ride the log layout's free order:\n" + plan)
    // the live view picks up an append made after the stream started life
    s.write(Seq(("c", "j", 9L, 5L, 5.0, """{"i": "i1"}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload"))
    val qname = "api_live_view"
    s.streamFrame.writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    assert(spark.table(qname).select("event_id").as[Long].collect().sorted.toSeq == (1L to 5L))
    spark.catalog.dropTempView(qname)
  }

  test("legacy space-partitioned stream stores keep iterating through the facade") {
    val dir = freshDir()
    graft.engine.EsdbWriter.write(ev, dir) // the pre-log-layout stream format
    val s = EventStream.open(spark, dir)
    var ids = List.empty[Long]
    val next = s.iterate() { e => ids ::= e.event_id; true }
    assert(ids.reverse == List(1L, 2L, 3L, 4L) && next == 5L)
    // appends stay in the store layout — never a mixed directory
    s.write(Seq(("b", "i", 9L, 5L, 5.0, """{"i": "i1"}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload"))
    var all = List.empty[Long]
    s.iterate() { e => all ::= e.event_id; true }
    assert(all.reverse == List(1L, 2L, 3L, 4L, 5L))
    // the live view is a log-layout feature and says so
    intercept[IllegalArgumentException] { s.streamFrame }
  }

  test("merge matches the reference ordering contract (merge_stream_test.go:59)") {
    val d1 = freshDir(); val d2 = freshDir(); val dm = freshDir()
    val s1 = EventStream.create(spark, d1, ev.where($"space" === "a"))
    val s2 = EventStream.create(spark, d2, ev.where($"space" === "b"))
    val m = EventStream.merge(spark, dm, Seq(s1, s2))
    var got = List.empty[(Long, String)]
    m.iterate() { e => got ::= (e.event_id, e.grouping); true }
    // src1's events (ids 1,2,3) in order, then src2's (id 4), renumbered 1..4
    assert(got.reverse == List((1L, "g"), (2L, "h"), (3L, "h"), (4L, "i")))
  }

  test("visits CSV adapter ingests the reference fixture shape") {
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val csv = s"$dir/visits.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "visit,a.com,austin,v1@x.com,1000\nvisit,b.com,dallas,v2@x.com,2000\n")
    val df = graft.engine.Tables.visitsCsv(spark, csv)
    assert(df.columns.toSeq == Seq("space", "grouping", "ts_us", "event_id", "value", "payload"))
    val rows = df.orderBy("event_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("space") == "visit")
    assert(rows(0).getAs[Long]("ts_us") == 1000000000L)
    assert(rows(0).getAs[String]("payload").contains("austin"))
  }
}
