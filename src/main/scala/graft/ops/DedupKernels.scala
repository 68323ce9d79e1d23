package graft.ops

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** JIT-compiled per-row kernels for [[Dedup]] signatures. Deterministic:
  * fixed xxhash64 seeds, no RNG — repeated runs (and the driver's
  * re-runs) produce identical signatures.
  */
object DedupKernels {

  private val Seed = 42L

  /** xxhash64 of a string's UTF-8 bytes (same family as Spark's
    * `xxhash64` SQL function).
    */
  def hashStr(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
  }

  /** Distinct hashes of lowercase word `n`-gram shingles; whole text as
    * one shingle when shorter than `n` tokens.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = text.toLowerCase.split(' ')
    if (toks.length < n) return Array(hashStr(toks.mkString(" ")))
    val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = hashStr(sb.toString)
      if (seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** Distinct lowercase word n-gram STRINGS (not hashes) — for
    * operators whose oracle must rebuild the shingles in SQL. Same
    * shape as [[shingleHashes]]: whole text as one shingle when
    * shorter than `n` tokens; split keeps trailing empties to match
    * SQL string_split.
    */
  def shingleStrings(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split(" ", -1)
    if (toks.length < n) return Array(toks.mkString(" "))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** `perms`-permutation MinHash: sig(p) = min over shingles of
    * xxhash64(shingleHash, p).
    */
  def minhashSig(shash: Array[Long], perms: Int): Array[Long] = {
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < shash.length) {
      var p = 0
      while (p < perms) {
        val h = XXH64.hashLong(shash(i), p.toLong)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** One key per band: fold the band's signature slots through hashLong. */
  def bandKeys(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = 0
      while (j < rowsPerBand) {
        acc = XXH64.hashLong(sig(b * rowsPerBand + j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** 64-bit SimHash: bit j set iff the ±1 vote (bit j of each token's
    * xxhash64) sums positive.
    */
  def simhash(text: String): Long = {
    val toks = text.toLowerCase.split(' ')
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashStr(toks(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
