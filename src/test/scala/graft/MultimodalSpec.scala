package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")

  test("manifest exposes media as binary with type metadata") {
    val m = Multimodal.manifest(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val bytes = m.where($"doc_id" === 1L).select("media").as[Array[Byte]].collect().head
    assert(new String(bytes, "UTF-8") == "hello world")
  }

  test("feature extraction is deterministic and byte-accurate") {
    val f1 = Multimodal.extractFeatures(spark, Multimodal.manifest(docs)).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, Multimodal.manifest(docs)).collect().sortBy(_.doc_id)
    assert(f1.sameElements(f2))
    assert(f1(0).n_bytes == 11L)
    assert(f1(1).n_bytes == 5L)
    assert(f1.forall(r => r.width >= 64 && r.height >= 64))
  }
}
