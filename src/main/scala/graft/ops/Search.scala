package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword search scoring over the documents corpus — BM25, the
  * inverted-index ranking function, expressed as the relational plan a
  * distributed engine should run it as:
  *
  *   1. one corpus pass computes per-(doc, query-term) term frequencies
  *      (explode + filter to the query's terms — everything else is
  *      dropped before any shuffle, so the shuffled volume is bounded
  *      by matches, not corpus size);
  *   2. document frequencies reduce to one tiny row per query term,
  *      broadcast back onto the matches;
  *   3. corpus statistics (N, total token count) reduce to ONE row,
  *      broadcast onto every match;
  *   4. per-document scores combine the per-term partials in declared
  *      term order, so double summation order is fixed — together with
  *      idf in rational form (no libm log, whose last-ulp varies by
  *      engine) every arithmetic step is an IEEE-exact operation on
  *      integers, making scores bit-identical across engines and the
  *      DuckDB oracle able to hash-match fixed-point scores;
  *   5. top-k by (score desc, doc_id) plans TakeOrderedAndProject —
  *      k rows per partition cross the wire, never the ranking.
  */
object Search {

  /** k1 = 1.2, b = 0.75 (the standard Robertson parameters), with the
    * probabilistic idf `(N - df + 0.5) / (df + 0.5)` kept rational:
    * written `(2N - 2df + 1) / (2df + 1)` over exact integers.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 50): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(size(TextOps.tokens(col("text"))).cast("long")).as("sum_dl"))
    val matches = docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("dl"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .where(col("tok").isin(terms: _*))
    val tf = matches.groupBy("doc_id", "tok")
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val w = tf
      .join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("w",
        ((lit(2.0) * col("n") - lit(2.0) * col("df") + lit(1.0)) /
          (lit(2.0) * col("df") + lit(1.0))) *
          (col("tf").cast("double") * lit(2.2) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("sum_dl").cast("double") / col("n").cast("double")))))))
    val partials = count(lit(1)).as("n_terms") +:
      terms.zipWithIndex.map { case (t, i) =>
        max(when(col("tok") === t, col("w"))).as(s"w_$i")
      }
    val score = terms.indices
      .map(i => coalesce(col(s"w_$i"), lit(0.0)))
      .reduce(_ + _)
    w.groupBy("doc_id").agg(partials.head, partials.tail: _*)
      .select(col("doc_id"), col("n_terms"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_terms"),
        floor(col("score") * 1000000).cast("long").as("score_x1e6"))
  }
}
