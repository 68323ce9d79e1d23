package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode

import graft.engine.{EsdbWriter, EventLog, EventStore}
import graft.ops.Skew

class SkewAndIndexSpec extends SparkSpec {
  import spark.implicits._

  test("salted tails equals plain tails on a skewed distribution") {
    // 90% of events share one index value — the skew shape
    val rows = (1 to 1000).map { i =>
      val k = if (i % 10 == 0) s"v${i % 7}" else "hot"
      ("s", "g", i.toLong, i.toLong, 0.0, s"""{"i": "$k"}""")
    }
    val ev = rows.toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    val plain = EventLog.tails(ev, "i").as[(String, Long)].collect().toMap
    val salted = Skew.saltedTails(ev, "i").as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(plain("hot") == 999L)
  }

  test("write-time index attrs materialize and drive scanIndex pushdown") {
    val dir = { val d = Files.createTempDirectory("esdbidx").toFile; d.delete(); d.getAbsolutePath }
    val ev = Seq(
      ("a", "g", 1L, 1L, 0.0, """{"city": "austin", "v": "x"}"""),
      ("a", "g", 2L, 2L, 0.0, """{"city": "dallas", "v": "y"}"""),
      ("a", "h", 3L, 3L, 0.0, """{"city": "austin", "v": "z"}"""))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    EsdbWriter.write(ev, dir, indexAttrs = Seq("city"))
    val back = EsdbWriter.read(spark, dir)
    assert(back.columns.contains("idx_city"))

    // same results as JSON-path filtering...
    val viaIdx = EventStore.scanIndex(back, "a", "city", "austin")
      .select("event_id").as[Long].collect().toSeq
    assert(viaIdx == Seq(3L, 1L)) // ts desc

    // ...but the predicate is now a plain column comparison pushed to parquet
    val plan = EventStore.scanIndex(back, "a", "city", "austin")
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("EqualTo(idx_city,austin)"), plan)

    // un-declared attrs still work via JSON fallback (reference: no index → scan)
    val viaJson = EventStore.scanIndex(back, "a", "v", "z")
      .select("event_id").as[Long].collect().toSeq
    assert(viaJson == Seq(3L))
  }
}
