package graft

import org.apache.spark.sql.functions._

/** min_k_by_key: deterministic k-sampling aggregate contracts. */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { graft.functions.SampleFunctions.register(spark); () }

  test("picks the k smallest (key, payload) pairs, sorted") {
    registered()
    val df = Seq(("g", 50L, 1L), ("g", 10L, 2L), ("g", 30L, 3L), ("g", 20L, 4L), ("g", 40L, 5L))
      .toDF("grp", "h", "id")
    val got = df.groupBy("grp")
      .agg(call_function("min_k_by_key", col("h"), col("id"), lit(3)).as("s"))
      .select("s").as[Seq[Long]].head()
    assert(got == Seq(2L, 4L, 3L)) // ids of h=10,20,30
  }

  test("result is independent of partitioning and row order") {
    registered()
    val rows = (1 to 500).map(i => ("g" + (i % 3), (i.toLong * 2654435761L) % 10000, i.toLong))
    val a = rows.toDF("grp", "h", "id").repartition(13)
    val b = scala.util.Random.shuffle(rows).toDF("grp", "h", "id").repartition(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp").agg(call_function("min_k_by_key", col("h"), col("id"), lit(7)).as("s"))
        .orderBy("grp").select("grp", "s").as[(String, Seq[Long])].collect().toSeq
    assert(run(a) == run(b))
  }

  test("aggregates with map-side partial combine (no full-row shuffle)") {
    registered()
    val df = (1 to 100).map(i => ("g", i.toLong, i.toLong)).toDF("grp", "h", "id")
      .groupBy("grp").agg(call_function("min_k_by_key", col("h"), col("id"), lit(5)).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial phase before the exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_min_k_by_key"), plan)
  }

  test("non-positive or non-integer k fails analysis, not executors") {
    registered()
    val df = Seq(("g", 1L, 1L)).toDF("grp", "h", "id")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("grp").agg(call_function("min_k_by_key", col("h"), col("id"), lit(0))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("grp").agg(call_function("min_k_by_key", col("h"), col("id"), lit("x"))).collect()
    }
  }

  test("top_k_by_score matches a brute-force reference on random data, any partitioning") {
    registered()
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      ("g" + (i % 4), rnd.nextDouble() * 2 - 1, i.toLong) // scores in [-1, 1)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (s, p) => (-s, p) }.take(6).map(_._2)
    }
    Seq(1, 7).foreach { parts =>
      val got = rows.toDF("grp", "score", "id").repartition(parts)
        .groupBy("grp")
        .agg(call_function("top_k_by_score", col("score"), col("id"), lit(6)).as("t"))
        .select(col("grp"), col("t.payload").as("ids"))
        .as[(String, Seq[Long])].collect().toMap
      assert(got.view.mapValues(_.toSeq).toMap == expected, s"parts=$parts")
    }
  }

  test("top_k_by_score: ties break by payload, negatives and k>group handled") {
    registered()
    val df = Seq(("g", 0.5, 9L), ("g", 0.5, 2L), ("g", -0.75, 1L)).toDF("grp", "s", "id")
    val got = df.groupBy("grp")
      .agg(call_function("top_k_by_score", col("s"), col("id"), lit(10)).as("t"))
      .select(col("t.payload"), col("t.score")).as[(Seq[Long], Seq[Double])].head()
    assert(got._1 == Seq(2L, 9L, 1L)) // equal scores → smaller payload first
    assert(got._2 == Seq(0.5, 0.5, -0.75))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("grp").agg(call_function("top_k_by_score", col("s"), col("id"), lit(-1))).collect()
    }
  }

  test("handles groups smaller than k and null keys") {
    registered()
    val df = Seq(("g", Some(5L), 1L), ("g", None, 2L), ("h", Some(1L), 3L))
      .toDF("grp", "h", "id")
    val got = df.groupBy("grp")
      .agg(call_function("min_k_by_key", col("h"), col("id"), lit(10)).as("s"))
      .orderBy("grp").select("grp", "s").as[(String, Seq[Long])].collect().toSeq
    assert(got == Seq(("g", Seq(1L)), ("h", Seq(3L)))) // null key skipped
  }
}
