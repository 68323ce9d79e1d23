package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.annTopK]]'s LSH: a k-means coarse
  * quantizer partitions the corpus into `nLists` inverted lists; a
  * query probes only its `nProbe` nearest centroids' lists and scores
  * exact cosine inside them.
  *
  * Scale shape: centroids are tiny (nLists × dims) and broadcast; the
  * candidate join is an equi-join on the list id, so candidate volume
  * is corpus × (nProbe / nLists) per query with no pairwise explosion.
  * At 100 TB the assignment (`list`) becomes a partition/bucket column
  * of the stored index so a probe prunes to nProbe buckets; here the
  * index is built in-query (deterministic seed) because the testdata
  * tables are read-only inputs.
  */
object Ivf {

  /** corpus → (vec_id, embedding, list) + the centroid table. */
  def buildIndex(corpus: DataFrame, nLists: Int = 16, seed: Long = 42L): (DataFrame, DataFrame) = {
    val sp = corpus.sparkSession
    VectorFunctions.register(sp)
    val withVec = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("fv", array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    // 5 Lloyd iterations: the coarse quantizer only needs rough cells
    // (recall comes from nProbe, not centroid polish), and each KMeans
    // iteration is a full RDD pass — the dominant cost of index build
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("list")
      .fit(withVec)
    val assigned = model.transform(withVec).select(col("vec_id"), col("embedding"), col("list"))
    import sp.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("list", "centroid")
    (assigned, centroids)
  }

  /** Exact-cosine top-k over the probed lists only. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val (assigned, centroids) = buildIndex(corpus, nLists)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    // probe: nProbe nearest centroids per query (centroid table broadcast)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("list").asc)
    val probes = q.join(broadcast(centroids))
      .withColumn("cdist", -Similarity.dot(col("qv"), col("centroid"))
        / (col("qn") * Similarity.norm(col("centroid"))))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("list"))
    // score only vectors in probed lists
    val scored = assigned.withColumn("cn", Similarity.norm(col("embedding")))
      .join(broadcast(probes), Seq("list"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (Similarity.dot(col("qv"), col("embedding")) / (col("qn") * col("cn"))).as("cos"))
    Similarity.topK(scored, k) // heap aggregate, not a window sort
  }
}
