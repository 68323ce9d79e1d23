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

  test("resize re-encodes deterministically at target dims") {
    val r1 = Multimodal.resize(spark, Multimodal.manifest(docs), 128, 128).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resize(spark, Multimodal.manifest(docs), 128, 128).collect().sortBy(_.doc_id)
    assert(r1.zip(r2).forall { case (a, b) => a.media.sameElements(b.media) })
    assert(r1.forall(r => r.width == 128 && r.height == 128 && r.media.nonEmpty))
  }

  test("frame sampling explodes one row per sampled frame, no shuffle") {
    val big = Seq((1L, "x" * 4096)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(spark, Multimodal.manifest(big), everyN = 4)
    val rows = frames.collect()
    assert(rows.map(_.frame_no).toSeq == Seq(0, 4, 8, 12)) // 16 chunks, every 4th
    assert(rows.forall(_.frame.length == 256))
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("streaming append sink lands micro-batches as parquet") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gsink").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamIngest.appendSink(
      mem.toDF().toDF("event_id", "payload"), s"$dir/data", s"$dir/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/data").count() == 3)
    } finally q.stop()
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
