package graft

import graft.ops.{Corpus, Funnel, Search, TextOps}

class FunnelSearchSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros

  private lazy val ev = Seq(
    // u1 completes view -> click -> buy inside the windows
    ("view", "u1", 0L, 1L),
    ("click", "u1", 1 * H, 2L),
    ("buy", "u1", 2 * H, 3L),
    // u2 clicks BEFORE its view entry (doesn't count) and again past 6h
    ("click", "u2", 0L, 4L),
    ("view", "u2", 1 * H, 5L),
    ("click", "u2", 8 * H, 6L),
    // u3 views then clicks at exactly the window edge (excluded: < bound)
    ("view", "u3", 0L, 7L),
    ("click", "u3", 6 * H, 8L),
    // u4 never views; its click can't enter the funnel
    ("click", "u4", 0L, 9L)
  ).toDF("space", "grouping", "ts_us", "event_id")

  test("funnel counts survivors per stage with the window applied") {
    val got = rowsOf(Funnel.funnel(ev, Seq("view", "click", "buy")))
    assert(got == Seq(
      Seq(0L, "view", 3L),  // u1 u2 u3
      Seq(1L, "click", 1L), // only u1 (u2 too late+too early, u3 at edge)
      Seq(2L, "buy", 1L)))
  }

  test("funnel entry time is the earliest qualifying event") {
    // u5 views twice; the second view must not reset the window
    val ev5 = Seq(
      ("view", "u5", 0L, 1L), ("view", "u5", 10 * H, 2L),
      ("click", "u5", 12 * H, 3L) // 12h after first view, 2h after second
    ).toDF("space", "grouping", "ts_us", "event_id")
    val got = rowsOf(Funnel.funnel(ev5, Seq("view", "click")))
    assert(got == Seq(Seq(0L, "view", 1L), Seq(1L, "click", 0L)))
  }

  test("retention buckets activity weeks against the cohort week") {
    val W = 7L * 86400L * 1000000L
    val ev2 = Seq(
      ("signup", "a", 0L, 1L),          // cohort week 0
      ("buy", "a", 1L, 2L),             // week 0 -> offset 0
      ("buy", "a", W + 1, 3L),          // week 1 -> offset 1
      ("buy", "a", W + 2, 4L),          // same week, distinct-folded
      ("signup", "b", W, 5L),           // cohort week 1
      ("buy", "b", 0L, 6L),             // BEFORE cohort week -> dropped
      ("buy", "b", 2 * W, 7L)           // offset 1
    ).toDF("space", "grouping", "ts_us", "event_id")
    val got = rowsOf(Funnel.retention(ev2, "signup", "buy"))
    assert(got == Seq(Seq(0L, 0L, 1L), Seq(0L, 1L, 1L), Seq(1L, 1L, 1L)))
  }

  private lazy val docs = Seq(
    (1L, "spark spark spark stream"),
    (2L, "spark stream vector"),
    (3L, "unrelated words only here"),
    (4L, "vector")
  ).toDF("doc_id", "text")

  test("bm25 ranks multi-term matches above rare-term-only docs deterministically") {
    val got = rowsOf(Search.bm25TopK(docs, Seq("spark", "vector", "stream"), 10))
    val byDoc = got.map(r => r.head -> r(1)).toMap
    assert(byDoc.keySet == Set(1L, 2L, 4L)) // doc 3 never shuffles/scores
    assert(byDoc(2L) == 3L && byDoc(1L) == 2L && byDoc(4L) == 1L)
    // doc 2 matches all three terms -> highest score
    assert(got.head.head == 2L)
    // scores strictly ordered desc, fixed-point long
    val scores = got.map(_(2).asInstanceOf[Long])
    assert(scores == scores.sortBy(-_))
  }

  test("bm25 score matches a hand-computed reference for a single term") {
    // corpus: N=4, sum_dl=12, avgdl=3; term "vector": df=2
    // doc 4: tf=1, dl=1 -> idf=(2*4-2*2+1)/(2*2+1)=5/5=1
    //   w = 1 * (1*2.2 / (1 + 1.2*(0.25 + 0.75*(1/3))))
    val w = 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * (1.0 / 3.0)))
    val got = Search.bm25TopK(docs, Seq("vector"), 10)
      .where($"doc_id" === 4L).select("score_x1e6").as[Long].head()
    assert(got == math.floor(w * 1e6).toLong)
  }

  test("repetition signals: token counts, top-token share, duplicate bigrams") {
    val d = Seq(
      (1L, "a a a b"),   // 4 toks, 2 distinct, top 3/4=750, bigrams: aa,aa,ab -> 1 dup of 3
      (2L, "x"),         // single token: no bigrams -> 0
      (3L, "p q p q p")  // 5 toks, 2 distinct, top 3/5=600, bigrams pq,qp,pq,qp -> 2 dups of 4
    ).toDF("doc_id", "text")
    assert(rowsOf(TextOps.repetition(d)) == Seq(
      Seq(1L, 4L, 2L, 750L, 333L),
      Seq(2L, 1L, 1L, 1000L, 0L),
      Seq(3L, 5L, 2L, 600L, 500L)))
  }

  test("split assignment is a pure function of doc_id with correct boundaries") {
    val ids = (1L to 400L).toDF("doc_id")
    val got = Corpus.splitAssign(ids).collect()
    got.foreach { r =>
      val bucket = r.getLong(1)
      assert(bucket >= 0 && bucket < 100)
      val want = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
      assert(r.getString(2) == want)
      // reproduce the bucket from first 60 bits of md5("split:<id>")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:${r.getLong(0)}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      assert(bucket == java.lang.Long.parseLong(hex, 16) % 100)
    }
    // all three splits occupied at n=400, and assignment is stable under growth
    assert(got.map(_.getString(2)).distinct.sorted.toSeq == Seq("test", "train", "val"))
    val sub = Corpus.splitAssign((1L to 100L).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.filter(_.getLong(0) <= 100).foreach(r => assert(sub(r.getLong(0)) == r.getString(2)))
  }
}
