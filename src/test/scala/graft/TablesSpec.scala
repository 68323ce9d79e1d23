package graft

import java.nio.file.{Files, Paths}

import graft.engine.{GraftViews, Tables}

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("eventsJson ingests JSON-lines into the canonical frame") {
    val dir = Files.createTempDirectory("gjson").toString
    Files.writeString(Paths.get(dir, "ev.json"),
      """{"space":"a","grouping":"g","ts_us":1000,"event_id":1,"value":1.5,"payload":"{\"i\":\"x\"}"}
        |{"space":"b","grouping":"h","ts_us":2000,"event_id":2,"value":2.5,"payload":"{\"i\":\"y\"}"}
        |""".stripMargin)
    val df = Tables.eventsJson(spark, dir)
    assert(df.columns.toSeq == Seq("space", "grouping", "ts_us", "event_id", "value", "payload"))
    assert(df.orderBy("event_id").select("space", "ts_us").as[(String, Long)].collect().toSeq ==
      Seq(("a", 1000L), ("b", 2000L)))
  }

  test("GraftViews exposes tables + event frame + vec_dot to spark.sql") {
    GraftViews.register(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM events").as[Long].head() == 1000L)
    assert(spark.sql("SELECT count(DISTINCT space) FROM event_frame").as[Long].head() == 5L)
    val d = spark.sql(
      """SELECT vec_dot(embedding, embedding) AS sq FROM embeddings WHERE vec_id = 0""")
      .as[Double].head()
    assert(d > 0.0)
  }
}
