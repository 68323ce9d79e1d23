package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.EsdbWriter

/** Randomized differential testing for keyed MERGE: for random stores
  * (flat and subpartitioned, null groupings and timestamps, multi-file
  * spaces, indexed and not) and random sources (overlapping and fresh
  * keys, changed values), the merged store must equal the model
  * `target.filter(key ∉ sourceKeys) ∪ source` exactly — multiset, all
  * columns — and the reported (replaced, inserted) counts must match
  * the model's.
  */
class MergeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def mkRows(ids: Seq[Long], nSpaces: Int, nGroupings: Int):
      Seq[(String, String, java.lang.Long, Long, Double, String)] =
    ids.map { i =>
      val g: String = if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(nGroupings)}"
      val ts: java.lang.Long =
        if (rnd.nextInt(12) == 0) null else java.lang.Long.valueOf(rnd.nextInt(100000).toLong)
      (s"s${rnd.nextInt(nSpaces)}", g, ts, i, rnd.nextInt(1000) / 10.0,
        s"""{"k": ${rnd.nextInt(9)}}""")
    }

  private def df(rows: Seq[(String, String, java.lang.Long, Long, Double, String)]): DataFrame =
    rows.toDF("space", "grouping", "ts_us", "event_id", "value", "payload")

  private def canon(d: DataFrame): Seq[(Long, String, String, Option[Long], Double, String)] =
    d.select("event_id", "space", "grouping", "ts_us", "value", "payload").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getDouble(4), r.getString(5)))
      .sortBy(t => (t._1, t._2, t._5))

  test("fuzz: random keyed merges equal the anti-join-plus-source model exactly") {
    for (trial <- 1 to 6) {
      val dir = java.nio.file.Files.createTempDirectory(s"mergefuzz$trial").toFile
      dir.delete()
      val p = dir.getAbsolutePath
      val base = mkRows(1L to 300L, nSpaces = 3, nGroupings = 6)
      val subparts = if (trial % 2 == 0) 3 else 1
      val indexAttrs = if (trial % 3 == 0) Seq("k") else Nil
      EsdbWriter.write(df(base), p, indexAttrs = indexAttrs, subparts = subparts)
      val extra = mkRows(1000L to 1100L, nSpaces = 3, nGroupings = 6)
      EsdbWriter.append(df(extra), p) // multi-file spaces
      val target = base ++ extra

      // random source: some keys hit the base, some hit the append,
      // some are fresh inserts — all rows fully re-randomized
      val hitKeys = rnd.shuffle(target.map(_._4)).take(rnd.nextInt(60))
      val freshKeys = (1 to (1 + rnd.nextInt(40))).map(_ => 5000L + rnd.nextInt(500))
      val srcKeys = (hitKeys ++ freshKeys).distinct
      val source = mkRows(srcKeys, nSpaces = 3, nGroupings = 6)
        .map { case (s, g, ts, id, v, pl) => // source groupings non-null for clarity
          (s, if (g == null) "g0" else g, ts, id, v, pl)
        }
      val (replaced, inserted) =
        EsdbWriter.mergeInto(spark, p, df(source), Seq("event_id"), keepVersions = 2)
      val keySet = srcKeys.toSet
      val expectReplaced = target.count(t => keySet(t._4))
      val expectInserted = srcKeys.size - target.map(_._4).toSet.intersect(keySet).size
      assert(replaced == expectReplaced && inserted == expectInserted,
        s"trial $trial: counts ($replaced,$inserted) != ($expectReplaced,$expectInserted)")

      val model = target.filterNot(t => keySet(t._4)) ++ source
      val got = EsdbWriter.readOrdered(spark, p)
      assert(canon(got) == canon(df(model)), s"trial $trial content mismatch " +
        s"(subparts=$subparts idx=$indexAttrs |src|=${source.size})")
      // indexed stores: idx_k recomputed from each surviving payload
      if (indexAttrs.nonEmpty) {
        val bad = got.where(col("idx_k") =!=
          get_json_object(col("payload"), "$.k")).count()
        assert(bad == 0, s"trial $trial: $bad rows with stale idx_k")
      }
      // the scan contract survives every merge
      val probe = got.select("space", "grouping").na.drop().head()
      val scan = graft.engine.EventStore.scan(
        EsdbWriter.readOrdered(spark, p), probe.getString(0), probe.getString(1))
      val ids = scan.select("ts_us", "event_id").na.drop("any", Seq("ts_us")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ids == ids.sortBy { case (ts, id) => (-ts, id) },
        s"trial $trial: scan order violated after merge")
    }
  }

  /** r12: the NATIVE SQL statements (`MERGE INTO`, `UPDATE`) planned
    * through SupportsRowLevelOperations must hit the same model the
    * engine-API fuzz pins — randomized stores (flat and subpartitioned,
    * null groupings/timestamps, multi-file spaces), randomized sources
    * and predicates.
    */
  test("fuzz: native SQL MERGE INTO and UPDATE equal their models exactly") {
    for (trial <- 1 to 4) {
      val rootDir = java.nio.file.Files.createTempDirectory(s"sqlfuzz$trial").toString
      val cat = s"sqlfuzz$trial"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.EsdbCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
      val p = s"$rootDir/t"
      val base = mkRows(1L to 250L, nSpaces = 3, nGroupings = 6)
      val subparts = if (trial % 2 == 0) 3 else 1
      EsdbWriter.write(df(base), p, subparts = subparts)
      val extra = mkRows(1000L to 1080L, nSpaces = 3, nGroupings = 6)
      EsdbWriter.append(df(extra), p)
      val target = base ++ extra

      // --- MERGE INTO ---
      val hitKeys = rnd.shuffle(target.map(_._4)).take(rnd.nextInt(50))
      val freshKeys = (1 to (1 + rnd.nextInt(30))).map(_ => 7000L + rnd.nextInt(400))
      val srcKeys = (hitKeys ++ freshKeys).distinct
      val source = mkRows(srcKeys, nSpaces = 3, nGroupings = 6)
        .map { case (s, g, ts, id, v, pl) => (s, if (g == null) "g0" else g, ts, id, v, pl) }
      df(source).createOrReplaceTempView(s"sqlfuzz_src$trial")
      spark.sql(s"""MERGE INTO $cat.t t USING sqlfuzz_src$trial s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val keySet = srcKeys.toSet
      val afterMerge = target.filterNot(t => keySet(t._4)) ++ source
      assert(canon(EsdbWriter.readOrdered(spark, p)) == canon(df(afterMerge)),
        s"trial $trial: SQL MERGE content mismatch (subparts=$subparts |src|=${source.size})")

      // --- UPDATE ... WHERE ---
      val cut = rnd.nextInt(900) / 10.0
      spark.sql(s"UPDATE $cat.t SET payload = '{}' WHERE value >= $cut")
      val afterUpdate = afterMerge.map { case t @ (s, g, ts, id, v, pl) =>
        if (v >= cut) (s, g, ts, id, v, "{}") else t
      }
      assert(canon(EsdbWriter.readOrdered(spark, p)) == canon(df(afterUpdate)),
        s"trial $trial: SQL UPDATE content mismatch (cut=$cut)")

      // the scan contract survives both statements
      val got = EsdbWriter.readOrdered(spark, p)
      val probe = got.select("space", "grouping").na.drop().head()
      val ids = graft.engine.EventStore.scan(got, probe.getString(0), probe.getString(1))
        .select("ts_us", "event_id").na.drop("any", Seq("ts_us")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ids == ids.sortBy { case (ts, id) => (-ts, id) },
        s"trial $trial: scan order violated after SQL DML")
    }
  }
}
