package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  * One parquet file per table under `dir` (= /root/testdata/sf*).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "events")

  /** Ingest JSON-lines events (the reference's payloads are JSON in
    * practice — README.md:85-99 marshals a map) with the canonical
    * field names; extra JSON fields are preserved inside `payload`.
    */
  def eventsJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    GraftSession.tune(spark)
    spark.read
      .schema("space STRING, grouping STRING, ts_us LONG, event_id LONG, value DOUBLE, payload STRING")
      .json(path)
      .select("space", "grouping", "ts_us", "event_id", "value", "payload")
  }

  /** Ingest the reference's `visits` CSV fixture shape
    * (testdata/build.go:15-59: `type,host,city,visitor,timestamp`, no
    * header, Unix-seconds timestamps) into the canonical event frame:
    * space=type, grouping=host, secondary indexes city/visitor carried
    * as JSON payload attrs, event_id = line position (via a window over
    * the natural order key, ts then insertion column order).
    */
  def visitsCsv(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    GraftSession.tune(spark)
    val raw = spark.read
      .schema("type STRING, host STRING, city STRING, visitor STRING, timestamp LONG")
      .csv(path)
    raw.select(
      col("type").as("space"),
      col("host").as("grouping"),
      (col("timestamp") * 1000000L).as("ts_us"),
      row_number().over(Window.orderBy("timestamp", "host", "visitor")).cast("long").as("event_id"),
      lit(0.0d).as("value"),
      to_json(struct(col("city"), col("visitor"))).as("payload"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
}
