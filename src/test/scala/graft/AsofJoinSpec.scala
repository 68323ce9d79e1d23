package graft

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, Long, Long)]) =
    rows.map { case (g, t, id) => (g, t, id) }.toDF("grouping", "ts_us", "event_id")

  test("matches the latest right row at or before each left ts, per key") {
    val left = frame(Seq(("u1", 10L, 100L), ("u1", 25L, 101L), ("u2", 5L, 102L)))
    val right = frame(Seq(("u1", 10L, 200L), ("u1", 20L, 201L), ("u2", 50L, 202L)))
    val got = AsofJoin.leftAsof(left, right).orderBy("event_id")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (100L, Some(200L)), // inclusive: right at the same ts matches
      (101L, Some(201L)), // latest of the two earlier rights
      (102L, None)))      // u2's only right is later → no match
  }

  test("left rows with no key on the right side get nulls") {
    val left = frame(Seq(("solo", 1L, 1L)))
    val right = frame(Seq(("other", 1L, 2L)))
    val got = AsofJoin.leftAsof(left, right)
      .select("asof_event_id").as[Option[Long]].collect()
    assert(got.sameElements(Array(Option.empty[Long])))
  }

  test("plan uses exactly one data shuffle (union-window, no range join)") {
    val left = frame(Seq(("u1", 10L, 100L)))
    val right = frame(Seq(("u1", 5L, 200L)))
    val df = AsofJoin.leftAsof(left, right)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the same physical exchange can print in several tree positions;
    // distinct plan ids count real shuffles
    val exchanges = "Exchange hashpartitioning[^\\[]*\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(exchanges == 1, s"expected a single shuffle, plan:\n$p")
  }
}
