package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries frequent-items summary: counter map plus the
  * total decremented mass `err` (the summary-wide overcount bound).
  */
final class FreqSummary(val counts: java.util.HashMap[String, java.lang.Long], var err: Long)

/** `freq_topk(item, k, capacity)` — approximate frequent items (heavy
  * hitters) over a string column via a mergeable Misra-Gries summary,
  * returned as `array<struct<item string, count_lb bigint, err_ub
  * bigint>>` sorted (count_lb desc, item asc), at most k entries.
  *
  * The third classic sketch next to HLL (`agg_approx_distinct`) and
  * the quantile sketch (`agg_value_quantiles`): exact top-k over a
  * high-cardinality domain (`text_vocab_topk`'s shape) must shuffle
  * EVERY distinct item's partial count; this aggregate keeps at most
  * `2*capacity` counters per group per task, so map-side partial
  * aggregation bounds the shuffle at O(tasks × capacity) regardless
  * of domain size — at 10^11 tokens the difference between shuffling
  * the vocabulary and shuffling a few KB per task.
  *
  * Contract (the Misra-Gries invariants, which hold under ANY
  * partitioning / merge order — the summaries are mergeable in the
  * Agarwal et al., "Mergeable Summaries" sense):
  *  - `count_lb <= true_count` — counters are only incremented on
  *    actual occurrences, then jointly decremented;
  *  - `true_count <= count_lb + err_ub` — each compaction subtracts
  *    the same threshold from every item's estimate and adds it to
  *    `err`, so the undercount is bounded by the decremented total;
  *  - an item absent from the summary has `true_count <= err_ub`,
  *    hence any item with `true_count > err_ub` is guaranteed present
  *    (`err_ub <= N / (capacity+1)` in total mass N).
  * `count_lb` values are partitioning-dependent (only the bounds are
  * invariant), so queries declare the sketch rows-only and certify the
  * invariants against an exact twin, like the other sketches.
  *
  * Buffers compact lazily at `2*capacity`: the threshold is the
  * `(capacity+1)`-th largest counter, so at most `capacity` survive
  * and every compaction subtracts a positive mass (amortized O(1)
  * updates, worst-case memory 2×capacity counters per buffer).
  */
case class FreqTopK(
    itemExpr: Expression,
    kExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  private lazy val cap: Int = capExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (itemExpr.dataType, kExpr.dataType, capExpr.dataType) match {
      case (StringType, IntegerType | LongType, IntegerType | LongType)
          if kExpr.foldable && capExpr.foldable =>
        val kv = kExpr.eval(InternalRow.empty)
        val cv = capExpr.eval(InternalRow.empty)
        val kl = if (kv == null) -1L else kv.asInstanceOf[Number].longValue()
        // bounded well under Int.MaxValue/2: the lazy compaction buffer
        // holds 2*capacity counters and the serialized form must fit
        val cl = if (cv == null) -1L else cv.asInstanceOf[Number].longValue()
        if (kl < 1 || kl > Int.MaxValue)
          TypeCheckResult.TypeCheckFailure(s"k must be in [1, ${Int.MaxValue}], got $kv")
        else if (cl < 1 || cl > (1 << 24))
          TypeCheckResult.TypeCheckFailure(s"capacity must be in [1, ${1 << 24}], got $cv")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "freq_topk requires (string item, integer literal k, integer literal capacity)")
    }

  override def children: Seq[Expression] = Seq(itemExpr, kExpr, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lb", LongType, nullable = false),
      StructField("err_ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_topk"

  override def createAggregationBuffer(): FreqSummary =
    new FreqSummary(new java.util.HashMap[String, java.lang.Long], 0L)

  // transient: the expression ships to executors via Java serialization
  // and an anonymous BiFunction is not Serializable
  @transient private lazy val addCounts =
    new java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] {
      def apply(a: java.lang.Long, b: java.lang.Long): java.lang.Long = a + b
    }

  /** Subtract the (cap+1)-th largest counter from every counter and
    * drop the non-positive ones: ≤ cap survive (only values strictly
    * above the threshold can), and the subtracted mass lands in `err`.
    */
  private def compact(s: FreqSummary): Unit = {
    if (s.counts.size <= cap) return
    val vals = new Array[Long](s.counts.size)
    var i = 0
    val vit = s.counts.values().iterator()
    while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val t = vals(vals.length - 1 - cap) // (cap+1)-th largest
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - t
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
    s.err += t
  }

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val v = itemExpr.eval(input)
    if (v != null) {
      // toString copies out of the row's reused UTF8String buffer
      buf.counts.merge(v.toString, java.lang.Long.valueOf(1L), addCounts)
      if (buf.counts.size > 2 * cap) compact(buf)
    }
    buf
  }

  override def merge(buf: FreqSummary, other: FreqSummary): FreqSummary = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.counts.merge(e.getKey, e.getValue, addCounts)
    }
    buf.err += other.err
    if (buf.counts.size > 2 * cap) compact(buf)
    buf
  }

  override def eval(buf: FreqSummary): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val top = entries.sortBy { case (item, n) => (-n, item) }.take(k)
    new GenericArrayData(top.map { case (item, n) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), n, buf.err))
    })
  }

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val items = new Array[(Array[Byte], Long)](buf.counts.size)
    var bytes = 0
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      items(i) = (b, e.getValue)
      bytes += 12 + b.length
      i += 1
    }
    val bb = ByteBuffer.allocate(12 + bytes)
    bb.putLong(buf.err)
    bb.putInt(items.length)
    items.foreach { case (b, n) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val err = bb.getLong
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long](n * 2)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, "UTF-8"), bb.getLong)
    }
    new FreqSummary(m, err)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqTopK =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1), capExpr = newChildren(2))
}
