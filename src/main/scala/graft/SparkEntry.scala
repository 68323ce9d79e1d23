package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[Queries]]; this object is the thin
  * harness-facing façade.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The minimum end-to-end slice (SURVEY.md §7.2): space + secondary
    * index predicate, ts-desc stable order, early-exit limit.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("space_scan_index_limit")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/minhash/cosine pipelines) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
