package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** freq_topk: mergeable Misra-Gries frequent-items contracts. */
class FreqTopKSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { graft.functions.SampleFunctions.register(spark); () }

  /** Zipf-ish corpus: item i appears ~N/i times — real heavy-hitter
    * shape, with a long tail to force compactions at small capacity.
    */
  private def zipfRows(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(math.max(n / i, 1))(s"item_$i"))

  private def summary(df: DataFrame, k: Int, cap: Int): Seq[(String, Long, Long)] =
    df.agg(call_function("freq_topk", col("item"), lit(k), lit(cap)).as("top"))
      .select(explode(col("top")).as("e"))
      .select("e.item", "e.count_lb", "e.err_ub")
      .as[(String, Long, Long)].collect().toSeq

  test("exact when capacity exceeds the domain: counts match groupBy, err 0") {
    registered()
    val rows = zipfRows(40)
    val df = scala.util.Random.shuffle(rows).toDF("item").repartition(7)
    val got = summary(df, 10, 1000)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.toSeq.sortBy { case (item, n) => (-n, item) }.take(10)
    assert(got.map(t => (t._1, t._2)) == want)
    assert(got.forall(_._3 == 0L))
  }

  test("Misra-Gries invariants hold under overflow, any partitioning") {
    registered()
    val rows = zipfRows(300) // ~300 distinct >> capacity 32
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 13)) {
      val df = scala.util.Random.shuffle(rows).toDF("item").repartition(parts)
      val got = summary(df, 64, 32) // k = 2*cap dumps the whole summary
      assert(got.nonEmpty && got.size <= 64)
      val err = got.head._3
      assert(got.forall(_._3 == err), "err_ub is summary-global")
      // total decremented mass is bounded by N/(cap+1)
      assert(err <= rows.size / 33, s"err $err exceeds N/(cap+1)")
      val present = got.map(t => t._1 -> t._2).toMap
      exact.foreach { case (item, n) =>
        present.get(item) match {
          case Some(lb) => assert(lb <= n && n <= lb + err, s"$item: lb=$lb n=$n err=$err")
          case None => assert(n <= err, s"absent $item has exact count $n > err $err")
        }
      }
      // the contrapositive users rely on: true heavy hitters are present
      exact.filter(_._2 > err).keys.foreach(h => assert(present.contains(h)))
    }
  }

  test("null items are ignored") {
    registered()
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
    val got = summary(df, 5, 100)
    assert(got == Seq(("a", 2L, 0L), ("b", 1L, 0L)))
  }

  test("plans as ObjectHashAggregate with a partial phase") {
    registered()
    val df = zipfRows(20).toDF("item")
      .agg(call_function("freq_topk", col("item"), lit(5), lit(64)).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_freq_topk"), plan)
  }

  test("bad k or capacity fails analysis, not executors") {
    registered()
    val df = Seq("a").toDF("item")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("freq_topk", col("item"), lit(0), lit(10))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("freq_topk", col("item"), lit(5), lit(1 << 25))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("freq_topk", lit(1L), lit(5), lit(10))).collect()
    }
  }
}
