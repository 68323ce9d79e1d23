package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs — language filter × quality filter × dedup keep-list —
  * expressed as joins of the per-document operator outputs, so each
  * stage keeps its own scale shape (all three inputs are one-pass
  * projections or a hash-agg; the joins are equi-joins on doc_id that
  * AQE can broadcast when a filter is selective).
  *
  * At 100 TB the keep-list join is the canonical pattern: dedup emits a
  * small (doc_id) keeper table, and the corpus is anti-/semi-joined
  * against it rather than shuffling document bodies.
  */
object Corpus {

  /** Deterministic train/val/test assignment: bucket = first 60 bits of
    * md5("<seed>:<doc_id>") mod 100, split by cumulative weight
    * boundaries. Pure hash arithmetic — no sampling state, no RNG — so
    * the split is reproducible by any engine from the doc_id alone,
    * stable under corpus growth (a document's split never changes when
    * neighbors are added), and embarrassingly parallel: a projection in
    * the scan stage, no shuffle at any corpus size.
    */
  def splitAssign(docs: DataFrame, seed: String = "split",
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val bucket = expr(
      s"CAST(conv(substring(md5(concat('$seed:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100")
    docs.select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Documents surviving: exact-dedup keeper, predicted language ==
    * `lang`, quality_x1000 >= `minQualityX1000`. Output one row per
    * kept doc: (doc_id, n_chars, lang_pred, quality_x1000).
    */
  def cleanCorpus(docs: DataFrame, lang: String = "en",
                  minQualityX1000: Long = 25L): DataFrame = {
    val keep = Dedup.exact(docs).select(col("keep_doc_id").as("doc_id"))
    val langOk = TextOps.langId(docs)
      .where(col("lang_pred") === lang)
      .select("doc_id", "lang_pred")
    val qualOk = TextOps.qualityScore(docs)
      .where(col("quality_x1000") >= minQualityX1000)
      .select("doc_id", "quality_x1000")
    docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .join(keep, "doc_id")
      .join(langOk, "doc_id")
      .join(qualOk, "doc_id")
      .orderBy("doc_id")
  }
}
