package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Empirical probes for the manifest-carry read path. Vanilla parquet
  * partition inference REFUSES explicit file lists spanning sibling
  * version dirs (CONFLICTING_DIRECTORY_STRUCTURES, even with basePath)
  * — so the manifest-aware reader must attach `space` itself via a
  * driver-known (file → space) map joined on `_metadata.file_path`.
  * These probes pin the two behaviors that design stands on.
  */
class BasePathProbeSpec extends AnyFunSuite with SparkSpec {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def parquetFiles(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
    finally s.close()
  }

  test("metadata-join read attaches space across version dirs") {
    import spark.implicits._
    val root = tmp("bpprobe")
    val v1 = s"$root/_versions/1-aaaa"
    val v2 = s"$root/_versions/2-bbbb"
    Seq((1L, "x")).toDF("v", "payload").write.parquet(s"$v1/space=a")
    Seq((2L, "y")).toDF("v", "payload").write.parquet(s"$v2/space=b/bucket=1")
    val files = parquetFiles(s"$v1/space=a") ++ parquetFiles(s"$v2/space=b/bucket=1")
    val info = files.map(f =>
      (f.substring(f.lastIndexOf('/') + 1),
        if (f.contains("space=a")) "a" else "b")).toDF("_fname", "space")
    val df = spark.read.parquet(files: _*)
      .withColumn("_fname", substring_index(col("_metadata.file_path"), "/", -1))
      .join(broadcast(info), "_fname").drop("_fname")
    val got = df.select("space", "v").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 2L)))
  }

  test("flat (log-layout) explicit files across version dirs read fine") {
    import spark.implicits._
    val root = tmp("bpprobe3")
    val v1 = s"$root/_versions/1-aaaa"
    val v2 = s"$root/_versions/2-bbbb"
    Seq((1L, "x")).toDF("v", "payload").write.parquet(s"$root/stage1")
    Seq((2L, "y")).toDF("v", "payload").write.parquet(s"$root/stage2")
    // flat layout: files sit directly in the version dir
    def moveFlat(stage: String, vdir: String): Seq[String] = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(vdir))
      parquetFiles(stage).map { f =>
        val dst = java.nio.file.Paths.get(vdir, f.substring(f.lastIndexOf('/') + 1))
        java.nio.file.Files.move(java.nio.file.Paths.get(f), dst)
        dst.toString
      }
    }
    val files = moveFlat(s"$root/stage1", v1) ++ moveFlat(s"$root/stage2", v2)
    val got = spark.read.parquet(files: _*).select("v").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}
