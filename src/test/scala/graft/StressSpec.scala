package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Carry, EsdbWriter, Publish}

/** Concurrent-mutator stress (r13 verdict #6): expectedVersion pinning
  * and predecessor carry interact under concurrency — a loser's retry
  * re-lists and re-carries against the winner's head. N threads mix
  * versioned appends, predicate DELETEs, incremental compaction,
  * vacuum, and head readers; the invariants:
  *  - every appendVersioned commit is fully visible (publishRetrying
  *    always lands, exactly once — no lost or duplicated batch);
  *  - every pinned rewrite either commits fully or conflicts LOUDLY
  *    ("publish conflict"), never silently drops a concurrent commit;
  *  - no reader ever observes a torn file set (carry drift, missing
  *    files) or a duplicated row;
  *  - the final store content is exactly base ∪ appends ∖ the deletes
  *    that reported success.
  * Run twice: hard-link carry (local default) and manifest carry (the
  * HDFS/S3 mode, where sweeps are refcount-aware per file).
  */
class StressSpec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    s"$d/store"
  }

  private def ev(ids: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.map(i => ("s1", s"g${i % 4}", 1000000L + i, i, i.toDouble, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
  }

  private def readIds(path: String): Seq[Long] = {
    import spark.implicits._
    EsdbWriter.read(spark, path).select("event_id").as[Long].collect().toSeq
  }

  /** One randomized interleave: 3 mutator threads × `opsPerThread`
    * operations each + 1 reader thread, against one store.
    */
  private def interleave(dir: String, seed: Long, opsPerThread: Int): Unit = {
    EsdbWriter.write(ev(0L until 50L), dir)
    EsdbWriter.compact(spark, dir, keepVersions = 8) // v1: versioned layout
    val deleted = new ConcurrentLinkedQueue[Long]() // groupings confirmed deleted
    val appended = new ConcurrentLinkedQueue[Long]() // batch bases confirmed appended
    val failures = new ConcurrentLinkedQueue[String]()
    val start = new CountDownLatch(1)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(4)
    // acceptable LOUD refusals: a publish conflict (the pin fired), or
    // a read outrun by retention (the operation's base version was
    // swept by >= keepVersions newer commits mid-flight — the engine's
    // documented long-reader contract; the operation ABORTS before its
    // pointer commit, so nothing is torn). Everything else fails.
    def loudAbort(e: Throwable): Boolean = e match {
      case io: java.io.IOException
          if io.getMessage != null && io.getMessage.startsWith("publish conflict") => true
      case _ =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .map(t => s"${t.getClass.getName} ${Option(t.getMessage).getOrElse("")}").mkString(" | ")
        msgs.contains("FILE_NOT_EXIST") || msgs.contains("FileNotFoundException") ||
          msgs.contains("PATH_NOT_FOUND") ||
          msgs.contains("is gone — its version was retired")
    }
    // mutators additionally accept "carry drift": their base version
    // can be legitimately retired mid-operation, after which a
    // manifest-mode enumeration refuses loudly — an abort BEFORE the
    // pointer commit. The READER never gets this tolerance: it reads
    // the freshly-resolved head, where drift is a real bug.
    def mutatorAbort(e: Throwable): Boolean = loudAbort(e) ||
      (e.isInstanceOf[IllegalStateException] && e.getMessage != null &&
        e.getMessage.contains("carry drift"))
    def guard(label: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable if mutatorAbort(e) => ()
        case e: Throwable =>
          failures.add(s"$label: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    (0 until 3).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          val rng = new scala.util.Random(seed * 31 + t)
          (0 until opsPerThread).foreach { i =>
            val base = 1000L + t * 10000L + i * 100L
            rng.nextInt(4) match {
              case 0 | 1 => // versioned append: lands or aborts LOUDLY
                try {
                  EsdbWriter.appendVersioned(ev(base until base + 5L), dir, keepVersions = 8)
                  appended.add(base)
                } catch {
                  case e: Throwable if mutatorAbort(e) => () // outrun: not recorded
                  case e: Throwable =>
                    failures.add(s"append: ${e.getClass.getSimpleName} ${e.getMessage}")
                }
              case 2 => // pinned rewrite: commit fully or conflict loudly
                guard("delete") {
                  val doomed = s"g${rng.nextInt(4)}"
                  EsdbWriter.deleteWhere(spark, dir,
                    Seq(org.apache.spark.sql.sources.EqualTo("grouping", doomed)),
                    keepVersions = 8)
                  deleted.add(doomed.drop(1).toLong)
                }
              case 3 => // maintenance: compaction conflicts loudly, vacuum never
                guard("maintain") {
                  if (rng.nextBoolean()) EsdbWriter.compactIncremental(spark, dir,
                    maxFilesPerSpace = 2, keepVersions = 8): Unit
                  else Publish.vacuum(hconf, dir, keep = 8)
                }
            }
          }
        }
      })
    }
    pool.submit(new Runnable { // reader: no torn snapshot, no dup rows
      override def run(): Unit = {
        start.await()
        while (!done.get()) {
          try {
            val ids = readIds(dir)
            if (ids.size != ids.distinct.size)
              failures.add(s"reader: duplicated rows (${ids.size} vs ${ids.distinct.size})")
          } catch {
            case e: Throwable if loudAbort(e) => () // outrun by retention
            case e: Throwable =>
              failures.add(s"reader: ${e.getClass.getSimpleName} ${e.getMessage}")
          }
        }
      }
    })
    start.countDown()
    pool.shutdown()
    // mutators finish, then stop the reader
    var waited = 0
    while (!pool.isTerminated && waited < 600) {
      if (pool.awaitTermination(1, TimeUnit.SECONDS)) () else waited += 1
      if (waited >= 1 && !done.get() &&
          pool.asInstanceOf[java.util.concurrent.ThreadPoolExecutor].getActiveCount == 1)
        done.set(true) // only the reader left
    }
    done.set(true)
    assert(pool.awaitTermination(60, TimeUnit.SECONDS), "stress pool did not drain")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty, s"unexpected failures:\n${failures.asScala.mkString("\n")}")
    // no committed version serves a torn file set: every retained
    // version's resolved listing succeeds (manifest drift would throw)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    Publish.committedVersions(hconf, dir).foreach { case (_, vdir) =>
      Carry.dataFiles(fs,
        new org.apache.hadoop.fs.Path(s"$dir/${Publish.VersionsDir}/$vdir")): Unit
    }
    // final content: base ∪ successful appends, minus rows whose
    // grouping was EVER successfully deleted AND not re-appended after —
    // order is unknowable, so assert the weaker exact invariants:
    // every surviving id was written, no id is duplicated, and every
    // confirmed append's ids are either present or covered by a
    // confirmed delete of their grouping
    val ids = readIds(dir)
    assert(ids.size == ids.distinct.size, "duplicated rows in final state")
    val written = (0L until 50L).toSet ++
      appended.asScala.flatMap(b => b until b + 5L).toSet
    assert(ids.toSet.subsetOf(written), "rows that were never written appeared")
    val deletedGs = deleted.asScala.toSet
    val missing = written -- ids.toSet
    assert(missing.forall(i => deletedGs.contains(i % 4)),
      s"lost rows outside any deleted grouping: ${missing.filterNot(i => deletedGs.contains(i % 4)).take(5)}")
  }

  test("randomized concurrent mutators: link-mode carry") {
    interleave(tmp("stresslink"), seed = 1L, opsPerThread = 6)
  }

  test("randomized concurrent mutators: manifest-mode carry") {
    hconf.set(Carry.ModeKey, "manifest")
    try interleave(tmp("stressmanifest"), seed = 2L, opsPerThread = 6)
    finally hconf.unset(Carry.ModeKey)
  }

  /** Deterministic regression: a pinned rewrite racing a versioned
    * append must either conflict loudly or land fully — and the append
    * is NEVER lost (the r13-verdict medium: mergeInto's listing→publish
    * window silently dropped concurrent commits before the pin).
    */
  test("deterministic: append landing inside a delete's listing→publish window is never lost") {
    val dir = tmp("stressdet")
    EsdbWriter.write(ev(0L until 50L), dir)
    EsdbWriter.compact(spark, dir, keepVersions = 8)
    // interpose: start the delete's listing by hand, then commit an
    // append, then publish the delete against the stale head
    val conf = hconf
    val (headAtScan, _) = Publish.resolveWithVersion(conf, dir)
    EsdbWriter.appendVersioned(ev(100L until 105L), dir, keepVersions = 8)
    val e = intercept[java.io.IOException] {
      Publish.publish(conf, dir, keepVersions = 8, expectedVersion = headAtScan) { tmp =>
        new java.io.File(tmp).mkdirs(): Unit
      }
    }
    assert(e.getMessage.startsWith("publish conflict"), e.getMessage)
    assert(readIds(dir).toSet == ((0L until 50L) ++ (100L until 105L)).toSet,
      "the concurrent append must survive the conflicting rewrite")
  }
}
