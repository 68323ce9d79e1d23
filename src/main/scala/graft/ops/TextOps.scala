package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * over the `documents` table (`doc_id, text, lang, source, n_chars`).
  *
  * All operators are pure Catalyst column expressions (no UDFs) so they
  * stay inside whole-stage codegen and scale linearly with a parquet
  * scan: a 100 TB corpus needs exactly one pass, no shuffle, for every
  * per-document operator here.
  *
  * Integer-only arithmetic (counts, x100/x1000 fixed point) keeps
  * results bit-exact across engines for the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokenizer. Testdata text is single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count + char count per document. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single non-alphanumeric marks — the pre-merge atom stream a BPE
    * tokenizer would start from. The regex is deliberately RE2/Java
    * compatible so DuckDB counts identically for the oracle.
    */
  val SubwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def subwordCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(s"CAST(size(regexp_extract_all(text, '$SubwordPattern', 0)) AS LONG)").as("n_subtokens"))
      .orderBy("doc_id")

  /** PII patterns shared with the oracle: deliberately restricted to
    * the regex subset where Java (Spark codegen) and RE2 (DuckDB,
    * Go/Rust scanners) agree — character classes, bounded repetition,
    * no lookaround, no backreferences — so a redacted corpus is
    * byte-identical across engines.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrub: count and redact emails / phone numbers / IPv4s in one
    * scan-stage pass (no shuffle), the shape a 100 TB redaction pass
    * needs. Counts are taken BEFORE redaction; replacements are typed
    * placeholders so downstream tokenization sees a stable vocabulary.
    *
    * Runs as a per-partition kernel over java.util.regex — the SAME
    * engine the former six-expression form (3× regexp_count + a 3-deep
    * regexp_replace nest) used, so semantics are bit-identical, but
    * one pass per document instead of six independent expressions
    * (r16, guide §1.2 per-task work): each regexp_* expression
    * re-materialized the UTF8String into a fresh java String, and the
    * email pattern ran twice (count + replace) over the same input.
    * Here the document converts once, the email matcher counts and
    * replaces in a single scan (its count input IS its replace input),
    * and phone/IP counts run on the original while their replacements
    * run on the already-redacted text exactly as the nested form did —
    * 5 regex scans and 1 string materialization per doc vs 6 and 6.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val email = java.util.regex.Pattern.compile(EmailRe)
        val phone = java.util.regex.Pattern.compile(PhoneRe)
        val ip = java.util.regex.Pattern.compile(IpRe)
        def countAll(p: java.util.regex.Pattern, s: String): Long = {
          val m = p.matcher(s)
          var c = 0L
          while (m.find()) c += 1
          c
        }
        it.map { case (id, t) =>
          // email: count and replace share one matcher pass (the
          // replacement string has no $ or \, so appendReplacement
          // treats it literally — same as regexp_replace did)
          val em = email.matcher(t)
          val buf = new java.lang.StringBuilder(t.length)
          var nEmails = 0L
          while (em.find()) { nEmails += 1; em.appendReplacement(buf, "<EMAIL>") }
          val t1 = em.appendTail(buf).toString
          val nPhones = countAll(phone, t)
          val nIps = countAll(ip, t)
          val clean = ip.matcher(phone.matcher(t1).replaceAll("<PHONE>"))
            .replaceAll("<IP>")
          (id, nEmails, nPhones, nIps, clean)
        }
      }
      .toDF("doc_id", "n_emails", "n_phones", "n_ips", "clean_text")
      // shield the kernel from the output sort's range-sampling pass:
      // a global sort with no exchange below it re-executes its whole
      // child to sample sort keys, i.e. every regex pass ran TWICE per
      // query (measured 0.86 → 0.63s best-of-4 at sf0.1 with the
      // shield; Dedup.embeddingNearDups has the full story). One hash
      // exchange, kernel runs once. Same pattern on every expensive
      // per-document kernel below that ends in a presentation sort.
      .repartition(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / avg-token-length / stopword-density
    * signals, in fixed-point integers. Columns:
    *  - n_tokens
    *  - avg_tok_len_x100: 100 * chars-excluding-spaces / tokens
    *  - hits_the: occurrences of the literal "the" (stopword signal)
    *  - quality_x1000: min(1000, 1000 * hits_the / tokens)
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS LONG)").as("n_tokens"),
      expr("length(replace(text, ' ', '')) * 100 div (length(text) - length(replace(text, ' ', '')) + 1)").as("avg_tok_len_x100"),
      expr("(length(text) - length(replace(text, 'the', ''))) div 3").as("hits_the"),
      expr("least(1000, ((length(text) - length(replace(text, 'the', ''))) div 3) * 1000 div (length(text) - length(replace(text, ' ', '')) + 1))").as("quality_x1000"))
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")

  /** Corpus-trained unigram surprisal — the LM-perplexity quality
    * filter of CCNet-style pipelines, in exact integer math so the
    * score reproduces bit-for-bit on any engine. Pass 1 trains the
    * model (token counts + corpus total); pass 2 scores each document
    * by its mean token surprisal, where a token seen `c` times in a
    * corpus of `total` tokens costs `length(bin(total DIV c))` bits
    * (= floor(log2(total/c)) + 1 — the integer bit-width of the
    * inverse frequency; monotone in true surprisal, zero floating
    * point). High scores = rare-token-heavy documents, the same tail
    * a real perplexity filter trims.
    *
    * Shape at 100 TB: the vocab aggregate partial-combines map-side
    * (shuffle = distinct tokens per task, Heaps'-law sublinear); the
    * scoring join shuffles the token stream once on `tok` — AQE
    * broadcasts the vocab side when it fits, which natural-language
    * vocabularies usually do. The corpus total broadcasts as one row.
    * Output: (doc_id, n_tokens, surprisal_x1000) ordered by doc_id.
    */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), length(bin(expr("total DIV c"))).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("(sum(bits) * 1000) DIV count(1)").as("surprisal_x1000"))
      .orderBy("doc_id")
  }

  /** Tiny deterministic stopword profiles for heuristic language ID.
    * Real deployments load per-language frequency tables; the mechanism
    * (score per profile, argmax) is what matters for the pipeline.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "fast", "slow", "small", "big"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "es", "un", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))

  /** DuckDB rendering of [[langId]], generated from [[langProfiles]] so
    * the two can't drift: per-profile hit counts via list_filter, argmax
    * via struct-max over (score, code) — the same (higher score, then
    * lexicographically larger code) tie order as the kernel.
    */
  def langIdOracleSql: String = {
    val scoreCols = langProfiles.map { case (code, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"  len(list_filter(toks, x -> list_contains($lst, x))) AS s_$code"
    }.mkString(",\n")
    val structs = langProfiles.map { case (code, _) => s"{'s': s_$code, 'c': '$code'}" }
      .mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, len(toks) AS n,
       |$scoreCols
       | FROM t),
       |m AS (SELECT doc_id, n, list_aggregate($structs, 'max') AS best FROM s)
       |SELECT doc_id, best.c AS lang_pred,
       |       CAST(best.s * 1000 // greatest(n, 1) AS BIGINT) AS score_x1000
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Stopword-profile language ID: per language, count tokens hitting
    * its profile; argmax with deterministic tie-break (higher score,
    * then lexicographically larger code — matching struct-max order).
    * Runs as a per-partition kernel: profile sets are built once per
    * partition and probed per token, instead of interpreted
    * array_contains per (token × profile).
    */
  /** The langId argmax over one tokenized document: (code, score).
    * Shared by [[langId]] and the single-pass [[Corpus.cleanCorpus]]
    * screen so the two can't drift.
    */
  private[ops] def langOf(toks: Array[String],
                          profiles: Seq[(String, Set[String])]): (String, Int) = {
    var bestLang = ""
    var bestScore = -1
    profiles.foreach { case (code, set) =>
      var s = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) s += 1; i += 1 }
      if (s > bestScore || (s == bestScore && code > bestLang)) { bestScore = s; bestLang = code }
    }
    (bestLang, bestScore)
  }

  private[ops] lazy val langProfileSets: Seq[(String, Set[String])] =
    langProfiles.map { case (code, words) => code -> words.toSet }

  def langId(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val profiles = langProfileSets
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // limit -1 keeps trailing empty tokens — matching SQL split /
          // DuckDB string_split, so the oracle denominator agrees even
          // on trailing-space documents
          val toks = text.split(" ", -1)
          val (bestLang, bestScore) = langOf(toks, profiles)
          (id, bestLang, bestScore.toLong * 1000 / math.max(toks.length, 1))
        }
      }
      .toDF("doc_id", "lang_pred", "score_x1000")
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")
  }

  /** Normalization + PII scrubbing — the cleanup pass a training
    * pipeline runs before tokenization. Pure codegen'd string
    * expressions (regexp_replace), single pass, no shuffle:
    *  - norm_text: lowercase, punctuation → space, whitespace collapsed
    *  - scrubbed: emails masked `<email>`, digit runs masked `<num>`
    * Patterns are deliberately RE2/Java-common so the DuckDB oracle
    * replays them verbatim (with its explicit 'g' flag).
    */
  def normalizeScrub(docs: DataFrame): DataFrame = {
    // Per-partition kernel form of
    //   norm_text = trim(re_sub(re_sub(lower(text), '[^a-z0-9 ]', ' '), '  +', ' '))
    //   scrubbed  = re_sub(re_sub(text, '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<email>'), '[0-9]+', '<num>')
    // (r16, guide §1.2 per-task work). Only the email pattern needs a
    // regex engine; the other three are single-char classes or runs
    // whose greedy leftmost semantics a char loop reproduces exactly:
    //  - '[^a-z0-9 ]'→' ' is per-code-unit, and the following '  +'
    //    collapse + trim(' ') fuse with it into ONE pass (drop leading
    //    spaces, emit one space per interior run, drop trailing);
    //  - '[0-9]+'→'<num>' is maximal digit runs.
    // lower() goes through UTF8String.toLowerCase — the same
    // implementation the Catalyst Lower expression calls — so case
    // mapping is bit-identical. The former 4-regex/6-materialization
    // projection is 1 regex pass + 2 linear passes per document.
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val email = java.util.regex.Pattern.compile("[A-Za-z0-9.]+@[A-Za-z0-9.]+")
        it.map { case (id, t) =>
          val lo = org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .toLowerCase.toString
          val nb = new java.lang.StringBuilder(lo.length)
          var pending = false
          var i = 0
          while (i < lo.length) {
            val c = lo.charAt(i)
            if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
              if (pending) { nb.append(' '); pending = false }
              nb.append(c)
            } else if (nb.length > 0) pending = true
            i += 1
          }
          val t1 = email.matcher(t).replaceAll("<email>")
          val sb = new java.lang.StringBuilder(t1.length)
          var j = 0
          while (j < t1.length) {
            val c = t1.charAt(j)
            if (c >= '0' && c <= '9') {
              while (j < t1.length && t1.charAt(j) >= '0' && t1.charAt(j) <= '9') j += 1
              sb.append("<num>")
            } else { sb.append(c); j += 1 }
          }
          (id, nb.toString, sb.toString)
        }
      }
      .toDF("doc_id", "norm_text", "scrubbed")
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: probe documents that share at least one
    * word `n`-gram with a benchmark/eval set — the standard pre-training
    * hygiene pass. Per-doc shingling is a kernel pass; the benchmark
    * gram set is tiny relative to the corpus, so the containment join
    * broadcasts it and the corpus streams once with no shuffle of
    * document content. Output: (doc_id, n_hits) for contaminated docs.
    */
  def contaminationReport(docs: DataFrame, benchPred: Column, n: Int = 8): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    // shingle each side from its own pre-filtered rows: a single kernel
    // over the whole corpus would run twice (the filter can't push
    // below an opaque mapPartitions), and the bench side is tiny
    def grams(side: DataFrame) = side.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, text) =>
        (id, DedupKernels.shingleStrings(text, n))
      })
      .toDF("doc_id", "grams")
      .select(col("doc_id"), explode(col("grams")).as("gram"))
    val bench = grams(docs.where(benchPred)).select("gram").distinct()
    // n_hits = count DISTINCT matching grams — but shingleStrings
    // already emits each document's grams deduped (LinkedHashSet), so
    // every (doc_id, gram) row is unique by construction and a plain
    // count is exactly equal (r16, guide §2.4): countDistinct planned a
    // (doc_id, gram)-keyed dedup aggregation with its own full exchange
    // of the joined pair stream before the per-doc count; count(1)
    // partial-aggregates map-side and ships one row per doc per task.
    grams(docs.where(!benchPred))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Repetition quality signals — the "repetitious document" filters a
    * pre-training pipeline applies (duplicate-heavy documents correlate
    * with low quality): per document,
    *  - n_tokens / n_distinct: vocabulary collapse,
    *  - top_token_x1000: most frequent token's share of the document,
    *  - dup_bigram_x1000: share of word bigrams that repeat an earlier
    *    bigram (0 for documents under two tokens).
    * One hash-count pass per document in a per-partition kernel (the
    * HOF form would re-split the text per list element — the measured
    * Catalyst pathology documented at Dedup.scala:18-25); integer
    * fixed-point keeps the DuckDB oracle bit-exact.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // limit -1 keeps trailing empties — matches string_split
          val toks = text.toLowerCase.split(" ", -1)
          val counts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < toks.length) {
            counts.merge(toks(i), 1, Integer.sum); i += 1
          }
          var top = 0
          counts.values.forEach(c => if (c > top) top = c)
          val bigrams = new java.util.HashSet[String]()
          i = 0
          while (i < toks.length - 1) {
            bigrams.add(toks(i) + " " + toks(i + 1)); i += 1
          }
          val nBigrams = math.max(toks.length - 1, 0)
          val dupBg =
            if (nBigrams == 0) 0L
            else (nBigrams - bigrams.size).toLong * 1000 / nBigrams
          (id, toks.length.toLong, counts.size.toLong,
            top.toLong * 1000 / toks.length, dupBg)
        }
      }
      .toDF("doc_id", "n_tokens", "n_distinct", "top_token_x1000", "dup_bigram_x1000")
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")
  }

  /** Content fingerprint (md5 of the text) — the exact-dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")

  /** Cross-document duplicated-span detection (the C4 "repeated
    * three-sentence span" / RefinedWeb exact-substring family, at token
    * granularity): tumbling windows of `w` whitespace tokens are
    * md5-fingerprinted, and a fingerprint seen in ≥2 distinct documents
    * is boilerplate / mirrored / templated text that whole-document
    * dedup misses. Output per duplicated span: the fingerprint, how
    * many distinct docs carry it, total occurrences, and the lowest
    * carrying doc_id (the canonical copy a span-removal pass would
    * keep).
    *
    * Scale shape: one scan, an explode producing n_tokens/w rows per
    * document, one groupBy whose shuffle carries 32-char hashes and
    * doc ids — document text never crosses the wire. Tumbling
    * (stride = w) rather than sliding keeps the explode at ×1 of the
    * token stream; finer alignment is the suffix-array family, which
    * trades this single-shuffle shape for global sorts.
    */
  def crossDocSpans(docs: DataFrame, w: Int = 10): DataFrame = {
    // span generation is a per-partition kernel, NOT slice/transform
    // column expressions: Catalyst inlines the projected split() into
    // the transform lambda, re-splitting the whole text once PER SPAN —
    // O(n²/w) on long documents (the measured HOF-inlining pathology,
    // Dedup.scala:18-25). The kernel splits once and streams spans.
    val sp = docs.sparkSession
    import sp.implicits._
    val spans = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          // limit -1: trailing empty tokens count, like string_split's
          val toks = text.split(" ", -1)
          (0 until toks.length / w).iterator.map { j =>
            val d = md.digest(toks.slice(j * w, j * w + w).mkString(" ").getBytes("UTF-8"))
            val hex = new java.lang.StringBuilder(32)
            d.foreach { b =>
              hex.append(Character.forDigit((b >> 4) & 0xf, 16))
              hex.append(Character.forDigit(b & 0xf, 16)): Unit
            }
            (id, hex.toString)
          }
        }
      }
      .toDF("doc_id", "span_hash")
    spans.groupBy("span_hash")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_spans"),
        min("doc_id").as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("span_hash")
  }

  /** Word-bigram stream: one row per adjacent token pair, corpus-wide.
    * The item stream behind frequent-n-gram statistics (boilerplate
    * detection, contamination screens). A per-partition kernel for the
    * same reason as [[crossDocSpans]]: slice/transform column
    * expressions re-split the whole text once per bigram under
    * Catalyst's HOF inlining; the kernel splits once and streams pairs.
    */
  def bigrams(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("text")).as[String]
      .mapPartitions(it => it.flatMap { text =>
        // limit -1: trailing empty tokens count, like string_split's
        val toks = text.split(" ", -1)
        (0 until toks.length - 1).iterator.map(i => toks(i) + " " + toks(i + 1))
      })
      .toDF("bigram")
  }

  /** Order-sensitive rolling fingerprint: polynomial fold of per-token
    * hashes, `acc = (31*acc + h(token)) mod 2^56`. Unlike md5 of the raw
    * string it is whitespace-normalization-invariant. Token hash = first
    * 56 bits of the token's md5, and the modulus keeps every step in
    * exact int64 range — both choices make the value reproducible in any
    * engine (the DuckDB oracle recomputes it with list_reduce). A
    * production pipeline would swap md5 for xxhash64 per token (~5×
    * faster, same shape); run as a per-partition kernel either way —
    * the aggregate-lambda form is interpreted and ~50× slower per token.
    */
  val RollingMod: Long = 1L << 56

  def rollingFingerprint(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          var acc = 0L
          // limit -1: trailing empty tokens fold like string_split's
          text.split(" ", -1).foreach { t =>
            val d = md.digest(t.getBytes("UTF-8"))
            var h = 0L
            var i = 0
            while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 } // 7 bytes = 56 bits
            acc = (acc * 31 + h) % RollingMod
          }
          (id, acc)
        }
      }
      .toDF("doc_id", "rolling_fp")
      .repartition(col("doc_id")) // sampling shield (see redactPii)
      .orderBy("doc_id")
  }

  /** Train a BPE merge table on the corpus — the tokenizer-training
    * pipeline as a Spark job. The STANDARD algorithm and the standard
    * scale split: the corpus is touched EXACTLY ONCE (lowercased
    * space-split word-frequency aggregation, map-side combined); every
    * merge iteration then runs on the compact word table (distinct
    * words × char symbols), whose size tracks the VOCABULARY, not the
    * corpus — at 100 TB the iterations cost the same as at 100 GB.
    * Per round: adjacent-pair counts weighted by word frequency
    * (overlaps counted, as reference BPE implementations do), argmax
    * with (count desc, pair asc) determinism, then a left-to-right
    * non-overlapping greedy merge of the winning pair inside every
    * word. Returns the learned rules (merge_rank, lhs, rhs,
    * pair_count) — the artifact a tokenizer ships.
    */
  def bpeTrain(docs: DataFrame, numMerges: Int = 8,
               localVocabRows: Long = 1000000L,
               localVocabSymbols: Long = 8000000L): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val words = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, c) => (w.toCharArray.map(_.toString), c) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Caches.track(words.toDF())
    // size-aware strategy switch (the connectedComponents precedent):
    // the merge loop runs on the VOCABULARY, which Heaps'-law-sublinear
    // tracking makes driver-sized for any real corpus — below the
    // threshold, collect the word table once and run the rounds locally
    // (each distributed round was a full job + shuffle + take(1), pure
    // fixed cost at this table size; 30k-merge production runs would be
    // 30k sequential Spark jobs). The distributed path remains for
    // vocabularies above the threshold; both compute the identical
    // argmax ((count desc, pair asc) ties) and greedy merge.
    //
    // The guard is BYTE-aware, not row-only (r16, verdict #3 of r15):
    // the collected table holds one per-char String per symbol
    // (~50-100 heap bytes each), so a row cap alone would admit 1M
    // long-word rows worth several GB on the driver. Both caps must
    // hold: ≤ localVocabRows distinct words AND ≤ localVocabSymbols
    // total symbols (8M symbols ≈ 0.5-1 GB heap — sized to the bench
    // JVM's floor, overridable by callers with bigger drivers; the
    // parity of the two branches is pinned by a spec that forces the
    // distributed path with tiny thresholds).
    val stats = words.toDF("s", "c")
      .agg(count(lit(1)), coalesce(sum(size(col("s"))), lit(0L))).head()
    if (stats.getLong(0) <= localVocabRows && stats.getLong(1) <= localVocabSymbols) {
      val local = words.collect()
      val rules = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      var table: Array[(Array[String], Long)] = local
      var r = 0
      var dry = false
      while (r < numMerges && !dry) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        table.foreach { case (s, c) =>
          var i = 0
          while (i < s.length - 1) {
            val k = (s(i), s(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + c)
            i += 1
          }
        }
        if (counts.isEmpty) dry = true
        else {
          // tie order matches the distributed ORDER BY exactly: count
          // desc, then a, b in Spark's BINARY string order (unsigned
          // UTF-8 bytes) — Java's compareTo orders UTF-16 units, which
          // diverges on supplementary characters
          def utf8Lt(x: String, y: String): Boolean = {
            val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
            val n = math.min(xb.length, yb.length)
            var i = 0
            while (i < n) {
              val d = (xb(i) & 0xff) - (yb(i) & 0xff)
              if (d != 0) return d < 0
              i += 1
            }
            xb.length < yb.length
          }
          val ((a, b), cnt) = counts.reduce { (p, q) =>
            val ((pa, pb), pc) = p; val ((qa, qb), qc) = q
            val pWins =
              if (pc != qc) pc > qc
              else if (pa != qa) utf8Lt(pa, qa)
              else if (pb != qb) utf8Lt(pb, qb)
              else true
            if (pWins) p else q
          }
          rules += ((r, a, b, cnt))
          table = table.map { case (s, c) => (mergePair(s, a, b), c) }
          r += 1
        }
      }
      return sp.createDataFrame(rules.toSeq)
        .toDF("merge_rank", "lhs", "rhs", "pair_count")
        .orderBy("merge_rank")
    }
    var table = words
    val rules = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 0
    var dry = false
    // real tokenizers run 30k merges: without a lineage cut, round r
    // carries r chained maps over the base (O(R²) total work and a
    // stack-deep plan by round R). A local checkpoint every few rounds
    // materializes the vocabulary-sized table and restarts the chain —
    // per-round cost stays flat (measured linear at 110 merges,
    // ScaleCheck bpe)
    val checkpointEvery = 8
    while (r < numMerges && !dry) {
      val best = table
        .flatMap { case (s, c) => (0 until s.length - 1).map(i => (s(i), s(i + 1), c)) }
        .toDF("a", "b", "c")
        .groupBy("a", "b").agg(sum("c").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .take(1)
      if (best.isEmpty) dry = true
      else {
        val (a, b, cnt) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        rules += ((r, a, b, cnt))
        table = table.map { case (s, c) => (mergePair(s, a, b), c) }
        r += 1
        if (r % checkpointEvery == 0) {
          table = table.localCheckpoint(true)
          graft.ops.Caches.track(table.toDF())
        }
      }
    }
    sp.createDataFrame(rules.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** Left-to-right greedy non-overlapping merge of the pair (a,b). */
  private def mergePair(s: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Train a linear quality classifier — the fastText-style "weak
    * label → hashed bag-of-words → linear model" pipeline as a Spark
    * job, in EXACT integer arithmetic (full-batch perceptron, so the
    * oracle reproduces every weight bit-for-bit; logistic loss would
    * differ only by the update rule's float sigmoid).
    *
    * Features: x_j = count of tokens whose deterministic hash
    * (Σ codepoint·position mod dim) lands in bucket j. Weak label:
    * y = +1 iff the document exceeds `minTokens` tokens. Per
    * iteration: margin = y·(w·x); every margin ≤ 0 document
    * contributes y·x to the batch update — w broadcasts down (dim
    * Longs), ONE aggregation comes back. At 100 TB each iteration is
    * a scan+agg of the cached doc×bucket feature table; the model
    * state never exceeds `dim` Longs.
    */
  def trainQualityClassifier(docs: DataFrame, dim: Int = 16, iters: Int = 2,
                             minTokens: Int = 50): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    def bucket(t: String): Int = {
      var s = 0L
      var i = 0
      while (i < t.length) { s += t.charAt(i).toLong * (i + 1); i += 1 }
      (s % dim).toInt
    }
    // (doc_id, y, j, cnt): hashed bag-of-words + weak label, built once
    val feats = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1).filter(_.nonEmpty)
        val y = if (toks.length > minTokens) 1L else -1L
        toks.groupBy(bucket).map { case (j, ts) => (id, y, j, ts.length.toLong) }
      }
      .toDF("doc_id", "y", "j", "cnt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Caches.track(feats)
    var w = Array.fill(dim)(0L)
    for (_ <- 0 until iters) {
      // margin per doc under the current weights, then the batch
      // update from every margin<=0 doc. The doc's feature vector
      // (≤ dim (j, cnt) entries — bounded by the model width, never by
      // corpus size) rides through the margin aggregation, so the
      // update is explode + re-aggregate instead of a second shuffle
      // join back against feats — one exchange fewer per round
      val upd = feats
        .withColumn("wx", col("cnt") * udfFreeDot(w)(col("j")))
        .groupBy("doc_id", "y")
        .agg(sum(col("wx")).as("score"),
          collect_list(struct(col("j"), col("cnt"))).as("fs"))
        .where(col("y") * col("score") <= 0)
        .select(col("y"), explode(col("fs")).as("f"))
        .groupBy(col("f.j").as("j")).agg(sum(col("y") * col("f.cnt")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (v, j) => v + upd.getOrElse(j, 0L) }
    }
    sp.createDataFrame(w.toSeq.zipWithIndex.map { case (v, j) => (j, v) })
      .toDF("j", "weight").orderBy("j")
  }

  /** Map a bucket index to its weight as a Column: one array LITERAL
    * indexed per row (codegen-friendly, no UDF) — O(1) expression size
    * at any dim, where the earlier per-bucket CASE chain would compile
    * a dim-branch expression (codegen blowup at a realistic 10⁵-bucket
    * model). Exactness unchanged: the longs embed verbatim.
    */
  private def udfFreeDot(w: Array[Long])(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(lit(w), j.cast("int") + 1)
}
