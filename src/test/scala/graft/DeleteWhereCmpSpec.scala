package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Edge-of-domain comparisons for [[DeleteWhere]]'s footer-stat prover:
  * strings must order by unsigned UTF-8 bytes (what parquet min/max and
  * Spark both use — UTF-16 `String.compareTo` diverges on supplementary-
  * plane chars) and mixed numeric compares must be exact (a long stat
  * vs a double literal near 2^53 must not round into a false
  * "provably no match" that carries a file holding a matching row).
  */
class DeleteWhereCmpSpec extends graft.SparkSpec {
  import spark.implicits._

  private val twoTo53 = 9007199254740992L // 2^53

  test("cmp orders strings by UTF-8 bytes, not UTF-16 code units") {
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600, 4 UTF-8 bytes
    val ffff = "￿" // 3 UTF-8 bytes, but max UTF-16 code unit
    // UTF-16: '￿' > surrogate pair; UTF-8 bytes: F0 9F 98 80 > EF BF BF
    assert(DeleteWhere.cmp(emoji, ffff).exists(_ > 0),
      "supplementary-plane string must sort above U+FFFF in byte order")
    assert(DeleteWhere.cmp(ffff, emoji).exists(_ < 0))
    assert(DeleteWhere.cmp("a", "b").exists(_ < 0))
    assert(DeleteWhere.cmp("b", "b").contains(0))
  }

  test("cmp compares long stats vs double literals exactly at the 2^53 boundary") {
    val bigLong = java.lang.Long.valueOf(twoTo53 + 1) // not representable as double
    val dblAtBoundary = java.lang.Double.valueOf(twoTo53.toDouble)
    // double rounding would call these equal; exactly, 2^53+1 > 2^53
    assert(DeleteWhere.cmp(bigLong, dblAtBoundary).exists(_ > 0),
      "2^53+1 (long) must compare strictly greater than 2^53 (double)")
    assert(DeleteWhere.cmp(dblAtBoundary, bigLong).exists(_ < 0))
    assert(DeleteWhere.cmp(java.lang.Long.valueOf(twoTo53), dblAtBoundary).contains(0))
    // int vs float mixed kinds still work
    assert(DeleteWhere.cmp(java.lang.Integer.valueOf(3), java.lang.Double.valueOf(3.5)).exists(_ < 0))
    // NaN is incomparable (conservative); infinities order around finites
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(Double.NaN), bigLong).isEmpty)
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(Double.PositiveInfinity), bigLong).exists(_ > 0))
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(Double.NegativeInfinity), bigLong).exists(_ < 0))
  }

  test("cmp treats -0.0 equal to 0.0 (SQL semantics, not IEEE total order)") {
    // Double.compare orders -0.0 < 0.0; SQL (and a parquet writer that
    // records a -0.0 bound) treat them equal — a max stat of -0.0 must
    // not "prove" value >= 0.0 unmatchable
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(-0.0), java.lang.Double.valueOf(0.0)).contains(0))
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(-0.0)).contains(0))
    assert(DeleteWhere.cmp(java.lang.Float.valueOf(-0.0f), java.lang.Double.valueOf(0.0)).contains(0))
    // the NaN short-circuit survives the fast-path removal
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(Double.NaN),
      java.lang.Double.valueOf(0.0)).isEmpty)
    // and ordinary double/double compares still order correctly
    assert(DeleteWhere.cmp(java.lang.Double.valueOf(1.5), java.lang.Double.valueOf(2.5)).exists(_ < 0))
  }

  private def oneParquetFile(dir: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .head.getPath
  }

  test("fileMayMatch refuses to carry a file whose long stats straddle a double literal") {
    val dir = java.nio.file.Files.createTempDirectory("cmp53").toString
    Seq(twoTo53 + 1).toDF("event_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = oneParquetFile(dir)
    // the file's only row, 2^53+1, satisfies event_id > 2^53(double)
    assert(DeleteWhere.fileMayMatch(conf, f, None,
      Seq(GreaterThan("event_id", twoTo53.toDouble))),
      "double rounding must not prove a false no-match at the 2^53 boundary")
    // and a genuinely out-of-range literal is still proven unmatched
    assert(!DeleteWhere.fileMayMatch(conf, f, None,
      Seq(GreaterThan("event_id", (twoTo53 + 2).toDouble * 2))))
  }

  test("fileMayMatch keeps supplementary-plane strings inside the stat range") {
    val emoji = new String(Character.toChars(0x1F600))
    val dir = java.nio.file.Files.createTempDirectory("cmpUtf8").toString
    Seq("￿", emoji).toDF("grouping").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = oneParquetFile(dir)
    // UTF-16 order would invert min/max and prove '￿' out of range
    assert(DeleteWhere.fileMayMatch(conf, f, None,
      Seq(EqualTo("grouping", "￿"))),
      "a row equal to the UTF-8 min must stay a candidate")
    assert(DeleteWhere.fileMayMatch(conf, f, None, Seq(EqualTo("grouping", emoji))))
    // below both values in UTF-8 order: provably unmatched
    assert(!DeleteWhere.fileMayMatch(conf, f, None, Seq(EqualTo("grouping", "a"))))
  }

  test("deleteWhere removes a U+FFFF row co-resident with an emoji row") {
    val emoji = new String(Character.toChars(0x1F600))
    val dir = java.nio.file.Files.createTempDirectory("delutf8").toFile
    dir.delete()
    val p = dir.getAbsolutePath
    val df = Seq(
      ("s0", "￿", 1L, 1L, 1.0, "{}"),
      ("s0", emoji, 2L, 2L, 2.0, "{}"),
      ("s0", "plain", 3L, 3L, 3.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    EsdbWriter.write(df, p)
    EsdbWriter.deleteWhere(spark, p, Seq(EqualTo("grouping", "￿")))
    val left = EsdbWriter.readOrdered(spark, p)
      .select("grouping").as[String].collect().toSet
    assert(left == Set(emoji, "plain"),
      "the U+FFFF row must not silently survive a UTF-8-ordered stat range")
  }
}
