package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.{EventLog, EventStore}

/** Property tests for the ordering/resumption contracts (SURVEY.md §5):
  * whatever the input distribution, scans are ts-desc with
  * insertion-order ties, iteration is offset-monotone and resumable,
  * and tails equals the per-key argmax. Uses raw ScalaCheck generators
  * with fixed seeds (the scalatest-scalacheck bridge artifact is not in
  * the offline dependency cache).
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val eventGen: Gen[Seq[(String, String, Long, Long, Double, String)]] = for {
    n <- Gen.choose(1, 40)
    ts <- Gen.listOfN(n, Gen.choose(0L, 5L)) // few distinct ts → many ties
    idx <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
  } yield ts.zip(idx).zipWithIndex.map { case ((t, ix), i) =>
    ("s", "g", t, i.toLong, 0.0, s"""{"i": "$ix"}""")
  }

  private def samples(count: Int): Seq[Seq[(String, String, Long, Long, Double, String)]] =
    (1 to count).flatMap(i => eventGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def toDf(rows: Seq[(String, String, Long, Long, Double, String)]) =
    rows.toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  test("scan order: ts desc, event_id asc on ties — for arbitrary inputs") {
    samples(10).foreach { rows =>
      val got = EventStore.scan(toDf(rows), "s", "g")
        .select("ts_us", "event_id").as[(Long, Long)].collect().toSeq
      val want = rows.map(r => (r._3, r._4)).sortBy { case (t, id) => (-t, id) }
      assert(got == want, s"input: $rows")
    }
  }

  test("iterate(o) == full iterate dropped to offset o — resumption contract") {
    samples(10).zipWithIndex.foreach { case (rows, i) =>
      val df = toDf(rows)
      val off = i * 4L
      val full = EventLog.iterate(df).select("event_id").as[Long].collect().toSeq
      val resumed = EventLog.iterate(df, off).select("event_id").as[Long].collect().toSeq
      assert(resumed == full.dropWhile(_ < off), s"offset $off input: $rows")
    }
  }

  test("tails == per-key argmax == head of each index scan") {
    samples(5).foreach { rows =>
      val df = toDf(rows)
      val tails = EventLog.tails(df, "i").as[(String, Long)].collect().toMap
      val byHand = rows.groupBy(r => r._6.split("\"")(3)).map { case (k, rs) => k -> rs.map(_._4).max }
      assert(tails == byHand, s"input: $rows")
      tails.foreach { case (k, head) =>
        val scanHead = EventLog.scanIndex(df, "i", k).select("event_id").as[Long].head()
        assert(scanHead == head)
      }
    }
  }
}
