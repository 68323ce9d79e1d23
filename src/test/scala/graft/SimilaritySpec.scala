package graft

import org.apache.spark.sql.functions.col

import graft.engine.Tables
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = embs.where(col("vec_id") < 5)

  test("brute top-k: k rows per query, ranks contiguous, cos descending") {
    val got = Similarity.bruteTopK(embs, queries, 5)
      .select("query_id", "rank", "cos_x1e6").as[(Long, Long, Long)].collect()
    assert(got.length == 25)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
      val sims = rows.sortBy(_._2).map(_._3)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("self-similarity: a duplicated vector is its own nearest neighbor") {
    val dup = embs.where(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = embs.unionByName(dup)
    val top1 = Similarity.bruteTopK(corpus, corpus.where(col("vec_id") === 100000), 1)
      .select("neighbor_id", "cos_x1e6").as[(Long, Long)].collect()
    assert(top1.length == 1)
    assert(top1(0)._1 == 0L)
    assert(top1(0)._2 >= 999999L)
  }

  test("full-probe IVF equals brute force on a fixture with cosine ties (assignment independence)") {
    // duplicated vectors give EXACT cosine ties: the winning order must
    // resolve on neighbor_id alone, never on list assignment — this
    // pins the r15 cheap-quantizer shortcut (nProbe >= nLists runs the
    // quantizer at maxIter=1/random-init), whose correctness rests on
    // probe keeping every (query, list) pair and topK tie-breaking on
    // (cos desc, neighbor_id asc). If a later change makes full-probe
    // results assignment-dependent, the tie rows here flip.
    val base = embs.where(col("vec_id") < 60)
    val dups = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val corpus = base.unionByName(dups)
    val qs = corpus.where(col("vec_id") < 3)
    val cols = Seq("query_id", "rank", "neighbor_id", "cos_x1e6")
    val brute = Similarity.bruteTopK(corpus, qs, 10)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    val full = graft.ops.Ivf.ivfTopK(corpus, qs, 10, nLists = 2, nProbe = 2)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(full == brute)
    // every query's top-10 contains its duplicate partner at cos ≈ 1
    assert(full.count(r => r(3).asInstanceOf[Long] >= 999999L) >= 3)
  }

  test("IVF recall vs brute force is usable and deterministic") {
    val k = 10
    val brute = Similarity.bruteTopK(embs, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf1 = graft.ops.Ivf.ivfTopK(embs, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf2 = graft.ops.Ivf.ivfTopK(embs, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf1 == ivf2) // fixed kmeans seed → same index, same answers
    val recall = (brute & ivf1).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
  }

  test("persisted IVF index: probe-only answers match the in-query build") {
    val k = 10
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    graft.ops.Ivf.ensureIndex(embs, path, nLists = 16)
    // the index lives in the version-pointer layout's current data root
    def root = graft.engine.Publish.resolve(spark.sparkContext.hadoopConfiguration, path)
    assert(new java.io.File(root, "centroids").isDirectory)
    val fromIndex = graft.ops.Ivf.ivfTopKIndexed(spark, path, queries, k)
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val inQuery = graft.ops.Ivf.ivfTopK(embs, queries, k)
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fromIndex == inQuery)
    // ensureIndex is idempotent: second call must not rebuild (same version)
    val before = root
    graft.ops.Ivf.ensureIndex(embs, path, nLists = 16)
    assert(root == before)
  }

  test("persisted IVF probe is a broadcast join: no exchange on the corpus side") {
    val path = java.nio.file.Files.createTempDirectory("ivfplan").toString + "/idx"
    graft.ops.Ivf.ensureIndex(embs, path, nLists = 16)
    val df = graft.ops.Ivf.ivfTopKIndexed(spark, path, queries, 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the assigned-table scan must feed the broadcast join directly —
    // any Exchange between scan and join would reshuffle the corpus
    val scanToJoin = p.linesIterator.dropWhile(l => !l.contains("BroadcastHashJoin")).toSeq
    assert(scanToJoin.exists(_.contains("assigned")), p)
    assert(!scanToJoin.takeWhile(l => !l.contains("assigned"))
      .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange")), p)
  }

  /** r12: the persisted index is version-STAMPED to a publish-managed
    * corpus store — a mutation (DELETE/MERGE/compaction) moves the
    * store's version, the stamped probe refuses the now-stale index,
    * and ensureIndex's build-if-absent becomes build-if-stale.
    */
  test("IVF index stamped to a mutable store: mutation → refusal → rebuild = full probe") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("ivfstamp").toString
    val storePath = s"$base/corpus"
    val idxPath = s"$base/idx"
    graft.engine.EsdbWriter.write(
      embs.select(lit("emb").as("space"), col("vec_id").cast("string").as("grouping"),
        col("vec_id").as("ts_us"), col("vec_id").as("event_id"), lit(0.0).as("value"),
        to_json(struct(col("embedding"))).as("payload")),
      storePath)
    val embed = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("event_id").as("vec_id"),
        from_json(col("payload"),
          org.apache.spark.sql.types.StructType.fromDDL("embedding array<float>")
        )("embedding").as("embedding"))
    def corpus = embed(graft.engine.EsdbWriter.read(spark, storePath))
    def q = corpus.where(col("vec_id") < 5)
    graft.ops.Ivf.ensureIndexFor(spark, storePath, idxPath, nLists = 8)(embed)
    assert(graft.ops.Ivf.ivfTopKIndexed(spark, idxPath, q, 10,
      corpusPath = Some(storePath)).count() > 0) // fresh: probes fine
    // mutate the corpus: the store's publish version moves
    graft.engine.EsdbWriter.deleteWhere(spark, storePath,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 400L)))
    val e = intercept[IllegalStateException] {
      graft.ops.Ivf.ivfTopKIndexed(spark, idxPath, q, 10, corpusPath = Some(storePath))
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // explicit staleness acceptance still serves the old vectors
    assert(graft.ops.Ivf.ivfTopKIndexed(spark, idxPath, q, 10,
      corpusPath = Some(storePath), allowStale = true).count() > 0)
    // ensureIndexFor sees the moved stamp and rebuilds — and because it
    // PINS the read to the version it stamps, a caller-held stale
    // corpus frame cannot poison the rebuild; full-probe equality
    graft.ops.Ivf.ensureIndexFor(spark, storePath, idxPath, nLists = 8)(embed)
    val fromIndex = graft.ops.Ivf.ivfTopKIndexed(spark, idxPath, q, 10, nProbe = 8,
      corpusPath = Some(storePath))
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val full = graft.ops.Ivf.ivfTopK(corpus, q, 10, nLists = 8, nProbe = 8)
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(fromIndex == full)
    assert(fromIndex.forall(_._3 < 400L), "rebuilt index must not serve deleted vectors")
  }

  test("ANN recall vs brute force is usable (>= 0.5 on sf0.001)") {
    val k = 10
    val brute = Similarity.bruteTopK(embs, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(embs, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }
}
