package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs — language filter × quality filter × dedup keep-list —
  * expressed as joins of the per-document operator outputs, so each
  * stage keeps its own scale shape (all three inputs are one-pass
  * projections or a hash-agg; the joins are equi-joins on doc_id that
  * AQE can broadcast when a filter is selective).
  *
  * At 100 TB the keep-list join is the canonical pattern: dedup emits a
  * small (doc_id) keeper table, and the corpus is anti-/semi-joined
  * against it rather than shuffling document bodies.
  */
object Corpus {

  /** Deterministic train/val/test assignment: bucket = first 60 bits of
    * md5("<seed>:<doc_id>") mod 100, split by cumulative weight
    * boundaries. Pure hash arithmetic — no sampling state, no RNG — so
    * the split is reproducible by any engine from the doc_id alone,
    * stable under corpus growth (a document's split never changes when
    * neighbors are added), and embarrassingly parallel: a projection in
    * the scan stage, no shuffle at any corpus size.
    */
  /** The split-bucket column (0..99) for a doc_id, shared by
    * [[splitAssign]] and [[decontaminate]] so both sides of any screen
    * agree on membership by construction.
    */
  def splitBucket(seed: String): org.apache.spark.sql.Column = expr(
    s"CAST(conv(substring(md5(concat('$seed:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100")

  def splitAssign(docs: DataFrame, seed: String = "split",
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val bucket = splitBucket(seed)
    docs.select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Fixed-size training chunks with overlap: document i's whitespace
    * tokens split into windows of `chunkTokens` advancing by
    * `chunkTokens - overlap`; the last window is clipped to the
    * document, and a document shorter than one window yields exactly
    * one chunk. Chunk count = max(1, ceil((n - overlap) / stride)), so
    * every token lands in at least one chunk and consecutive chunks
    * share `overlap` tokens — the standard pre-training tokenizer prep.
    *
    * Shape at 100 TB: a per-partition kernel (one pass, no shuffle;
    * the HOF slice/transform route would re-split the text per chunk —
    * the measured Catalyst pathology at Dedup.scala:18-25). Output
    * grows ~1/(1-overlap/chunkTokens)× the corpus, streamed straight
    * to the sink — nothing is held per task beyond one document.
    */
  def chunk(docs: DataFrame, chunkTokens: Int = 256, overlap: Int = 64): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          val n = toks.length
          val nChunks = math.max(1L, (n - overlap + stride - 1L) / stride)
          (0L until nChunks).iterator.map { i =>
            val start = (i * stride).toInt
            val end = math.min(start + chunkTokens, n)
            (id, i, (end - start).toLong,
              String.join(" ", java.util.Arrays.asList(toks.slice(start, end): _*)))
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .orderBy("doc_id", "chunk_idx")
  }

  /** Greedy sequence packing: documents are laid end-to-end per source
    * in doc_id order, and a document's training sequence is the context
    * window its first token falls in (seq_id = floor(start_offset /
    * budget)). One running-total window per source — sources pack
    * independently and in parallel, and the assignment is a pure
    * function of (source, doc_id order, token counts), so any engine
    * reproduces it. At 100 TB the partition key would be refined
    * (source × shard) to bound window state; the algebra is unchanged.
    */
  def pack(docs: DataFrame, budgetTokens: Long = 8192L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("start_tok") / budgetTokens).cast("long").as("seq_id"))
      .orderBy("doc_id")
  }

  /** Deterministic epoch shuffle: the global training-order
    * permutation every pre-training run draws per epoch, as pure hash
    * arithmetic — position = rank of md5("<seed>:<epoch>:<doc_id>").
    * Changing `epoch` re-permutes; the same (seed, epoch) reproduces
    * the identical order on any engine, with no RNG state to
    * checkpoint.
    *
    * Shape at 100 TB: hash keys are uniform, so the single
    * range-partitioned sort behind the global rank is perfectly
    * balanced — and that one exchange IS the shuffle (a training
    * shuffle is definitionally a global reorder). A production writer
    * that only needs shuffled SHARDS (file = hash mod N, order within
    * shard free) drops the sort entirely and writes from the scan
    * stage; the total order here is the strictest, certifiable form.
    * Positions are assigned as in [[graft.engine.EventLog.merge]]:
    * range-partition on the key, sort within partitions, zipWithIndex
    * — never a single-partition row_number window.
    */
  def epochShuffle(docs: DataFrame, seed: String = "shuffle", epoch: Int = 0): DataFrame = {
    val sp = docs.sparkSession
    val key = expr(
      s"md5(concat('$seed:', '$epoch', ':', CAST(doc_id AS STRING)))")
    val ordered = docs.select(col("doc_id"), key.as("shuffle_key"))
      .repartitionByRange(col("shuffle_key"), col("doc_id"))
      .sortWithinPartitions(col("shuffle_key"), col("doc_id"))
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("epoch_pos",
        org.apache.spark.sql.types.LongType, nullable = false) +: ordered.schema.fields)
    val rows = ordered.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq((i + 1L) +: r.toSeq)
    }
    sp.createDataFrame(rows, schema)
  }

  /** Domain-mixture sampling: keep each document with its source's
    * mixture probability, decided by hash — a document is kept iff
    * md5("<seed>:<doc_id>") mod 1e6 < weight(source)·1e6. The standard
    * corpus-reweighting step (upweight curated sources, downweight
    * crawl) as a pure scan-stage filter: no RNG, no shuffle, no state;
    * the same (seed, weights) reproduces the exact subcorpus anywhere,
    * and a document's fate never changes as neighbors are added —
    * the sampling analog of [[splitAssign]]'s stability.
    */
  def mixSample(docs: DataFrame, weights: Map[String, Double],
                defaultWeight: Double = 1.0, seed: String = "mix"): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(w => w >= 0 && w <= 1),
      "mixture weights must be probabilities in [0, 1]")
    val bucket = expr(
      s"CAST(conv(substring(md5(concat('$seed:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000")
    val threshold = weights.foldLeft(lit((defaultWeight * 1e6).toLong)) {
      case (acc, (src, w)) => when(col("source") === src, lit((w * 1e6).toLong)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"), bucket.as("bucket"))
      .where(col("bucket") < threshold)
      .orderBy("doc_id")
  }

  /** Documents surviving: exact-dedup keeper, predicted language ==
    * `lang`, quality_x1000 >= `minQualityX1000`. Output one row per
    * kept doc: (doc_id, n_chars, lang_pred, quality_x1000).
    */
  /** Benchmark decontamination: flag TRAIN documents sharing any
    * n-token shingle with a TEST document — the standard contamination
    * screen run before training (a test answer verbatim inside a
    * training document inflates the benchmark). Splits come from
    * [[splitAssign]]'s deterministic buckets; the overlap unit is the
    * md5 of the n-token window.
    *
    * 100 TB shape: each side reduces to (doc_id, 16-byte shingle hash)
    * in the scan stage — document text never crosses the wire — and
    * the per-doc local HashSet dedupes windows before the shuffle. The
    * test side (benchmarks, a few per mille of the corpus) is
    * broadcast, so the screen costs one scan of the train corpus plus
    * a broadcast hash join; the result is a small keep/flag list to
    * anti-join against, the same pattern as the dedup keeper tables.
    */
  def decontaminate(docs: DataFrame, n: Int = 8, seed: String = "split",
                    trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(trainPct + valPct < 100, "train+val must leave room for test")
    // bucket is a scan-stage projection on each side — no join, no
    // sort; each side's filter prunes before the shingle kernel runs
    val tagged = docs.select(col("doc_id"), col("text"),
      splitBucket(seed).as("bucket"))
    // 64-bit shingle keys (first 8 md5 bytes, as one LONG): half the
    // shuffle bytes of a full digest, collision odds ~n²/2^64 —
    // vanishing for a screen that tolerates the odd extra flag. r15:
    // the key is the raw 8 bytes as a big-endian long instead of their
    // 16-char hex rendering (bijective, so join/count semantics are
    // unchanged) — an 8-byte fixed-width join key instead of a 16-char
    // string (guide §2.3, narrower types), and the kernel feeds the
    // digest incrementally from per-token UTF-8 byte arrays computed
    // once per document instead of building + encoding a fresh shingle
    // string per window (same byte stream, same digest).
    def shingles(side: DataFrame): DataFrame =
      side.select($"doc_id".as[Long], $"text".as[String]).mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val space = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        it.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          val tokBytes = toks.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val seen = new scala.collection.mutable.HashSet[Long]()
          (0 to toks.length - n).iterator.flatMap { i =>
            md.reset()
            var j = i
            while (j < i + n) {
              if (j > i) md.update(space)
              md.update(tokBytes(j))
              j += 1
            }
            val d = md.digest()
            val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
            if (seen.add(h)) Some((id, h)) else None
          }
        }
      }.toDF("doc_id", "shingle")
    val train = shingles(tagged.where($"bucket" < trainPct))
    val test = shingles(tagged.where($"bucket" >= trainPct + valPct))
      .select("shingle").distinct()
    train.join(broadcast(test), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits")) // per-doc shingles pre-deduped
      .orderBy("doc_id")
  }

  /** The full curation pipeline, composed end-to-end: quality/language/
    * dedup keep-list ([[cleanCorpus]]) minus contaminated train docs
    * ([[decontaminate]]), split-assigned, reported as per-split doc and
    * char counts — the one-call form of the standard pre-training prep.
    * Every stage keeps its own scale shape; the composition adds only
    * keep-list anti-joins (small doc_id sets, broadcastable) — document
    * text never shuffles anywhere in the pipeline.
    */
  def curatePipeline(docs: DataFrame, n: Int = 4, seed: String = "split",
                     trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val kept = cleanCorpus(docs).select("doc_id", "n_chars")
    val flagged = decontaminate(docs, n, seed, trainPct, valPct).select("doc_id")
    kept.join(flagged, Seq("doc_id"), "left_anti")
      .withColumn("bucket", splitBucket(seed))
      .withColumn("split", when(col("bucket") < trainPct, "train")
        .when(col("bucket") < trainPct + valPct, "val")
        .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("n_chars"))
      .orderBy("split")
  }

  /** Keep-list screen: exact-dup survivors that are also `lang` and at
    * least `minQualityX1000`. r15: the language/quality/n_chars screens
    * are all per-row functions of `text`, so they run in ONE pass over
    * the corpus (quality and n_chars as codegen expressions feeding the
    * same langId profile kernel [[TextOps.langOf]] uses), replacing the
    * previous four scans + three joins with one scan + the single join
    * against the dedup keep-list that a shuffle genuinely requires —
    * guide §2.4 (remove shuffles outright) and §1.2 (don't re-read what
    * one pass can produce). At 100 TB that is 1 corpus read instead
    * of 4 and 1 small-key join instead of 3.
    */
  def cleanCorpus(docs: DataFrame, lang: String = "en",
                  minQualityX1000: Long = 25L): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val keep = Dedup.exact(docs).select(col("keep_doc_id").as("doc_id"))
    val profiles = TextOps.langProfileSets
    // quality_x1000 ≡ TextOps.qualityScore's integer expression
    //   least(1000, ((len - len(replace(text,'the',''))) div 3) * 1000
    //               div (len - len(replace(text,' ','')) + 1))
    // computed directly: the numerator is 3×(left-to-right
    // non-overlapping 'the' occurrences) div 3, the denominator is
    // (space count + 1) = token count; n_chars counts codepoints
    // exactly as SQL length() does.
    val screened = docs.select($"doc_id".as[Long], $"text".as[String])
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          val (bestLang, _) = TextOps.langOf(toks, profiles)
          if (bestLang != lang) None
          else {
            var occ = 0L
            var idx = text.indexOf("the")
            while (idx >= 0) { occ += 1; idx = text.indexOf("the", idx + 3) }
            val q = math.min(1000L, occ * 1000L / toks.length)
            if (q < minQualityX1000) None
            else Some((id, text.codePointCount(0, text.length).toLong, bestLang, q))
          }
        }
      }
      .toDF("doc_id", "n_chars", "lang_pred", "quality_x1000")
    screened
      .join(keep, "doc_id")
      .orderBy("doc_id")
  }
}
