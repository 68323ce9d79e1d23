package graft

import graft.engine.EventLog

/** Mirrors the reference's stream-read contracts
  * (stream/open_stream_test.go:89-114,153-186,226-257;
  * merge_stream_test.go:34-92): insertion-order iteration with offset
  * resumption, newest→oldest index scans, tails, ordered merge.
  */
class EventLogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val log = Seq(
    ("s", "u1", 10L, 1L, 0.0, """{"i": "a"}"""),
    ("s", "u2", 20L, 2L, 0.0, """{"i": "b"}"""),
    ("s", "u1", 30L, 3L, 0.0, """{"i": "a"}"""),
    ("s", "u2", 40L, 4L, 0.0, """{"i": "a"}""")
  ).toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  test("iterate: full insertion order (stream/stream.go:92-124)") {
    assert(EventLog.iterate(log).select("event_id").as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("iterate from offset resumes (open_stream_test.go:226-257)") {
    assert(EventLog.iterate(log, 3L).select("event_id").as[Long].collect().toSeq == Seq(3L, 4L))
  }

  test("scanIndex: newest to oldest (stream/stream.go:74-90)") {
    assert(EventLog.scanIndex(log, "i", "a").select("event_id").as[Long].collect().toSeq == Seq(4L, 3L, 1L))
  }

  test("first: head of an index list (open_stream.go:107-115)") {
    assert(EventLog.first(log, "i", "a").as[Long].collect().toSeq == Seq(4L))
  }

  test("tails: newest offset per index value (open_stream.go:219-241)") {
    assert(rowsOf(EventLog.tails(log, "i")) == Seq(Seq("a", 4L), Seq("b", 2L)))
  }

  test("merge: per-source insertion order, fresh contiguous ids (merge.go:7-34)") {
    val s1 = Seq((1L, "x"), (2L, "y")).toDF("event_id", "grouping")
    val s2 = Seq((1L, "z")).toDF("event_id", "grouping")
    val m = EventLog.merge(spark, Seq(s1, s2))
      .select("new_event_id", "src", "src_event_id", "grouping")
    assert(rowsOf(m.orderBy("new_event_id")) == Seq(
      Seq(1L, 0L, 1L, "x"), Seq(2L, 0L, 2L, "y"), Seq(3L, 1L, 1L, "z")))
  }
}
