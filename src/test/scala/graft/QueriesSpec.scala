package graft

/** Registry guard: every declared query must at least run at the
  * smallest scale factor, and every oracle-checked query must be
  * non-empty there (an empty oracle result still hash-matches, but a
  * query that silently selects nothing is a broken constant). This is
  * the pre-driver smoke for the whole SparkEntry contract.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  Queries.all.foreach { q =>
    test(s"${q.name} runs at sf0.001${if (q.oracle.isDefined) " (non-empty)" else ""}") {
      val n = q.run(spark, dir).count()
      if (q.oracle.isDefined) assert(n > 0, s"${q.name} selected nothing at sf0.001")
    }
  }

  test("oracle SQL column aliases match the Spark result columns") {
    // cheap structural check: every column name of the Spark result
    // appears verbatim in the oracle text (the driver compares by
    // sorted column name)
    Queries.all.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.run(spark, dir).columns
      val sql = q.oracle.get.toLowerCase
      cols.foreach { c =>
        assert(sql.contains(c.toLowerCase), s"${q.name}: column '$c' not named in oracle SQL")
      }
    }
  }

  test("entry returns rows on the smoke dataset") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
