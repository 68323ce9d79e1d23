package graft

import graft.ops.{Sessionize, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "spark"),
    (3L, "a b c d e")
  ).toDF("doc_id", "text")

  test("token counts") {
    assert(rowsOf(TextOps.tokenCounts(docs)) == Seq(
      Seq(1L, 6L, 22L), Seq(2L, 1L, 5L), Seq(3L, 5L, 9L)))
  }

  test("quality score integer formulas") {
    val got = rowsOf(TextOps.qualityScore(docs).where($"doc_id" === 1L))
    // "the cat sat on the mat": 6 tokens, 17 non-space chars,
    // avg_tok_len_x100 = 1700/6 = 283, hits_the = 2, quality = 2000/6 = 333
    assert(got == Seq(Seq(1L, 6L, 283L, 2L, 333L)))
  }

  test("lang id is deterministic and scores stopword hits") {
    val got = rowsOf(TextOps.langId(docs).where($"doc_id" === 1L))
    assert(got.head(1) == "en") // "the" ×2 + "a" absent → en profile wins
  }

  test("md5 fingerprint matches JVM md5") {
    val fp = TextOps.fingerprint(docs).where($"doc_id" === 2L)
      .select("fp").as[String].collect().head
    val jvm = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp == jvm)
  }

  test("rolling fingerprint: equal docs equal, different docs differ") {
    val d2 = Seq((1L, "the cat sat on the mat"), (2L, "the cat sat on the hat"))
      .toDF("doc_id", "text")
    val fps = TextOps.rollingFingerprint(d2).select("rolling_fp").as[Long].collect()
    assert(fps.distinct.length == 2)
    val again = TextOps.rollingFingerprint(d2).select("rolling_fp").as[Long].collect()
    assert(fps.sameElements(again))
  }

  test("rolling fingerprint matches an independent BigInt reference fold") {
    // guards the mod-2^56 long arithmetic against overflow mistakes:
    // recompute with arbitrary-precision integers and md5 hex parsing
    val text = "the quick brown fox jumps over the lazy dog"
    val got = TextOps.rollingFingerprint(Seq((1L, text)).toDF("doc_id", "text"))
      .select("rolling_fp").as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = text.split(" ", -1).foldLeft(BigInt(0)) { (acc, t) =>
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(14)
      (acc * 31 + BigInt(hex, 16)) % BigInt(TextOps.RollingMod)
    }
    assert(BigInt(got) == want)
  }

  test("normalize + scrub masks PII and canonicalizes whitespace/case") {
    val d = Seq((1L, "Call Bob at 555-1234, mail bob.x@corp.example NOW!"))
      .toDF("doc_id", "text")
    val r = TextOps.normalizeScrub(d).collect()(0)
    assert(r.getString(1) == "call bob at 555 1234 mail bob x corp example now")
    assert(r.getString(2) == "Call Bob at <num>-<num>, mail <email> NOW!")
  }

  test("contamination report flags planted benchmark overlap only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // benchmark
      (2L, "totally different words with no overlap at all here"), // benchmark
      (50L, "prefix alpha beta gamma delta epsilon zeta eta theta tail"), // contains bench 8-gram
      (51L, "alpha beta gamma delta other words entirely changed now"), // only 4-gram overlap
      (52L, "clean document about unrelated spark query planning topics")
    ).toDF("doc_id", "text")
    val got = TextOps.contaminationReport(corpus, $"doc_id" < 10, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(50L))
    assert(got(50L) >= 1L)
  }

  test("cross-doc span dedup: shared tumbling windows found, intra-doc repeats excluded") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")          // one aligned window
    val other = (1 to 10).map(i => s"z$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$ten $other"),          // spans: [ten], [other]
      (2L, s"$ten unique tail words that fill out another span x y z"), // shares [ten]
      (3L, "completely different content everywhere in this document body here now"),
      (4L, s"$other $other"),        // intra-doc repeat only — 2 spans, 1 doc
      (5L, "short doc")              // < w tokens: no spans
    ).toDF("doc_id", "text")
    val got = TextOps.crossDocSpans(corpus, w = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // [ten] appears in docs 1 and 2 (cross-doc); [other] appears in docs 1 and 4
    val expectTen = org.apache.commons.codec.digest.DigestUtils.md5Hex(ten)
    val expectOther = org.apache.commons.codec.digest.DigestUtils.md5Hex(other)
    assert(got.map(_._1).toSet == Set(expectTen, expectOther))
    val byHash = got.map(r => r._1 -> r).toMap
    assert(byHash(expectTen) == ((expectTen, 2L, 2L, 1L)))
    assert(byHash(expectOther) == ((expectOther, 2L, 3L, 1L))) // doc4 carries it twice
    assert(got == got.sortBy(_._1), "output must be ordered by span_hash")
  }

  test("unigramSurprisal: exact bit-width surprisal, rare tokens score higher") {
    // corpus tokens: a a b a c -> total=5; counts a=3, b=1, c=1
    // bits: a = len(bin(5 DIV 3 = 1)) = 1; b = len(bin(5)) = 3; c = 3
    val docs = Seq((1L, "a A b"), (2L, "a c")).toDF("doc_id", "text")
    val got = rowsOf(TextOps.unigramSurprisal(docs))
    // doc1: (1+1+3)*1000 DIV 3 = 1666; doc2: (1+3)*1000 DIV 2 = 2000
    assert(got == Seq(Seq(1L, 3L, 1666L), Seq(2L, 2L, 2000L)))
    // the rare-token-heavy doc scores strictly higher — the tail a
    // perplexity filter trims
    assert(got(1)(2).asInstanceOf[Long] > got(0)(2).asInstanceOf[Long])
  }

  test("redactPii counts then redacts emails/phones/IPs; clean text keeps everything else") {
    val docs = Seq(
      (1L, "mail a.b+c@sub.example.org now or 10.0.0.1 or call 555-123-4567 twice 555-123-4567"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.co")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.redactPii(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got(0) == ((1L, 1L, 2L, 1L,
      "mail <EMAIL> now or <IP> or call <PHONE> twice <PHONE>")))
    assert(got(1) == ((2L, 0L, 0L, 0L, "no pii here at all")))
    assert(got(2) == ((3L, 2L, 0L, 0L, "two mails <EMAIL> and <EMAIL>")))
    // scan-stage kernel: no exchange anywhere before the final sort
    val plan = graft.ops.TextOps.redactPii(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sessionize splits on gaps > 30min") {
    val ev = Seq(
      ("u1", 0L, 1L), ("u1", 60L * 1000000, 2L),                  // session 1: 0s, 60s
      ("u1", 10L * 60 * 60 * 1000000L, 3L),                       // session 2: 10h
      ("u2", 0L, 4L)                                              // u2 session 1
    ).toDF("grouping", "ts_us", "event_id")
    val got = rowsOf(Sessionize.sessions(ev).select("grouping", "session_seq", "n_events"))
    assert(got == Seq(Seq("u1", 1L, 2L), Seq("u1", 2L, 1L), Seq("u2", 1L, 1L)))
  }

  test("bpeTrain learns deterministic merges; overlap counts and greedy merges match by hand") {
    import spark.implicits._
    // corpus: "aaab aaab ab" x freq via repetition
    //   words: aaab (freq 2), ab (freq 1)
    //   round 1 pairs: (a,a): 2 per aaab x2 = 4 (overlap counted); (a,b): 2+1 = 3
    //     -> merge (a,a) cnt 4; aaab -> [aa, a, b] (greedy left-to-right, non-overlap)
    //   round 2 pairs: (aa,a): 2, (a,b): 2+1=3 -> merge (a,b) cnt 3
    //   round 3: aaab=[aa,ab], ab=[ab] -> (aa,ab): 2 -> merge (aa,ab) cnt 2
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val rules = graft.ops.TextOps.bpeTrain(docs, numMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rules == Seq((0, "a", "a", 4L), (1, "a", "b", 3L), (2, "aa", "ab", 2L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val rules = graft.ops.TextOps.bpeTrain(docs, numMerges = 5).collect()
    assert(rules.length == 1) // after merging (a,b) every word is one symbol
    assert(rules.head.getString(1) == "a" && rules.head.getString(2) == "b")
  }

  test("bpeTrain distributed branch matches the driver-local branch (forced by tiny thresholds)") {
    import spark.implicits._
    // ties everywhere: same counts force the (count desc, lhs, rhs)
    // order through both argmax implementations; multi-byte symbols
    // (é) exercise the local branch's UTF-8 byte tie order against the
    // distributed ORDER BY's BINARY string order
    val docs = Seq(
      (1L, "aaab aaab ab zz zz"),
      (2L, "éz éz zz b a xy xy")
    ).toDF("doc_id", "text")
    def run(rows: Long, syms: Long) =
      graft.ops.TextOps.bpeTrain(docs, numMerges = 6,
        localVocabRows = rows, localVocabSymbols = syms).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val local = run(1000000L, 8000000L)
    val distRows = run(0L, 8000000L)     // row cap forces distributed
    val distSyms = run(1000000L, 0L)     // symbol (byte) cap forces distributed
    assert(local.nonEmpty)
    assert(distRows == local)
    assert(distSyms == local)
  }

  test("trainQualityClassifier: hand-checked batch-perceptron weights") {
    import spark.implicits._
    // dim=4, minTokens=1: "aa" hashes to (97*1 + 97*2) % 4 = 3; "b" to 98 % 4 = 2
    //   doc 1: "aa aa" -> 2 tokens > 1 -> y=+1, x = {3: 2}
    //   doc 2: "b"     -> 1 token      -> y=-1, x = {2: 1}
    // round 1 (w=0, all misclassified): w = {3: +2, 2: -1}
    // round 2: doc1 score=+4 (margin +4 > 0, correct); doc2 score=-(-1)=... y*score = (-1)*(-1)=1 > 0 correct
    //   -> no updates; final w = (0,0,-1,2)
    val docs = Seq((1L, "aa aa"), (2L, "b")).toDF("doc_id", "text")
    val w = graft.ops.TextOps.trainQualityClassifier(docs, dim = 4, iters = 2, minTokens = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(w == Seq((0, 0L), (1, 0L), (2, -1L), (3, 2L)))
  }
}
