package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JsonFast

/** `json_attr` must be drop-in compatible with `get_json_object` for
  * `$.key` paths — the oracle-checked queries depend on it.
  */
class JsonAttrSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    """{"k": 42}""",
    """{"k": 42, "m": "x"}""",
    """{"m": "x", "k": "hello world"}""",
    """{"k": -3.25e2}""",
    """{"k": true}""",
    """{"k": false}""",
    """{"k": null}""",
    """{"m": 1}""", // missing key
    """{}""",
    """{"k": "with \"escaped\" quotes"}""",
    """{"k": "tab\there"}""",
    """{"a": "decoy \"k\": 7 inside a string", "k": 8}""",
    """{"a": {"k": 1}, "k": 2}""", // nested object contains the key
    """{"a": [1, {"k": 9}], "k": 3}""",
    """{"kk": 1, "k": 2}""", // key-prefix collision
    """{"k ": 1, "k": 2}""",
    """{ "k" : 42 }""", // whitespace everywhere
    """{"k": "héllo 世界"}""", // multi-byte neighbors
    """{"漢": 1, "k": 5}""",
    // literal backslash-u escaped KEY spelling "k" (string-concat dodges
    // Scala's unicode-escape preprocessing in source literals)
    "{\"\\" + """u006b": 11}""",
    """{"a": 1,}""", // trailing comma
    """{"k": "v", "m": """, // truncated AFTER the match
    """{"k": 1, "k": 2}""", // duplicate keys
    """{"k": "a\"b", "m""", // escaped value then truncation
    """[1, 2, 3]""", // non-object roots
    """42""",
    """""",
    """not json at all""",
    """{"k": 1""" // truncated
  )

  test("json_attr matches get_json_object on scalar/edge cases") {
    graft.functions.JsonFunctions.register(spark)
    val df = cases.toDF("j")
      .select(
        col("j"),
        call_function("json_attr", col("j"), lit("k")).as("fast"),
        get_json_object(col("j"), "$.k").as("builtin"))
    df.collect().foreach { r =>
      assert(r.get(1) == r.get(2), s"payload <${r.getString(0)}>: fast=${r.get(1)} builtin=${r.get(2)}")
    }
  }

  test("interpreted eval matches the byte scanner (no codegen)") {
    cases.foreach { j =>
      val interp = JsonFast.attr(UTF8String.fromString(j), UTF8String.fromString("k"))
      val viaDf = Seq(j).toDF("j")
        .select(get_json_object(col("j"), "$.k")).collect()(0).getString(0)
      val got = if (interp == null) null else interp.toString
      assert(got == viaDf, s"payload <$j>: scanner=$got builtin=$viaDf")
    }
  }

  test("fuzz: random flat/nested/escaped documents always match the builtin") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.oneOf("k", "kk", "a", "key with space", "漢字", "x.y")
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.choose(-99999L, 99999L).map(_.toString),
      Gen.choose(-1000.0, 1000.0).map(_.toString),
      Gen.oneOf("true", "false", "null"),
      Gen.alphaNumStr.map(s => "\"" + s + "\""),
      Gen.oneOf("\"with \\\"quote\\\"\"", "\"tab\\tchar\"", "\"uni \\u0041 esc\"",
        "\"ends with k\\\": 5\"", "[1, 2, {\"k\": 9}]", "{\"inner\": \"v\"}"))
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 5)
      ks <- Gen.listOfN(n, keyGen)
      vs <- Gen.listOfN(n, scalarGen)
      ws <- Gen.oneOf("", " ")
    } yield ks.zip(vs).map { case (k, v) => s""""$k":$ws$v""" }.mkString("{" + ws, "," + ws, ws + "}")
    val docs = (1 to 300).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    graft.functions.JsonFunctions.register(spark)
    val rows = docs.toDF("j").select(
      col("j"),
      call_function("json_attr", col("j"), lit("k")).as("fast"),
      get_json_object(col("j"), "$.k").as("builtin")).collect()
    rows.foreach(r => assert(r.get(1) == r.get(2),
      s"payload <${r.getString(0)}>: fast=${r.get(1)} builtin=${r.get(2)}"))
  }

  test("nested values take the jackson path and match the builtin") {
    graft.functions.JsonFunctions.register(spark)
    val nested = Seq("""{"k": {"a": 1, "b": [2, 3]}}""", """{"k": [1, {"x": "y"}]}""")
    val df = nested.toDF("j").select(
      call_function("json_attr", col("j"), lit("k")).as("fast"),
      get_json_object(col("j"), "$.k").as("builtin"))
    df.collect().foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }
}
