package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_by_score(score, payload, k)` — the k (payload, score) pairs
  * with the highest (score, then lowest payload) per group, returned
  * best-first as `array<struct<payload bigint, score double>>`.
  *
  * The similarity top-k shape: the window form
  * (`row_number() OVER (PARTITION BY q ORDER BY cos DESC) <= k`)
  * shuffles and sorts EVERY scored candidate; this aggregate keeps a
  * k-bounded heap per group per task, so map-side partial aggregation
  * reduces the shuffle to k candidates per group per task — the plan
  * that survives a corpus × queries scale-up.
  */
case class TopKByScore(
    scoreExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, payloadExpr.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType | LongType) if kExpr.foldable =>
        val kv = kExpr.eval(InternalRow.empty)
        val lv = if (kv == null) -1L else kv.asInstanceOf[Number].longValue()
        // upper bound too: intValue() truncation would turn k >= 2^31
        // into a negative or silently-small heap bound
        if (lv < 1 || lv > Int.MaxValue)
          TypeCheckResult.TypeCheckFailure(s"k must be in [1, ${Int.MaxValue}], got $kv")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "top_k_by_score requires (double score, bigint payload, positive integer literal k)")
    }

  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("payload", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  // heap root = the WORST kept pair under (score desc, payload asc):
  // ranks worse elements higher so PriorityQueue.head is the evictee
  @transient private lazy val worseFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = worse = ranks higher
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher payload = worse
      }
    }

  private def newHeap() =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worseFirst)

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    newHeap()

  private def add(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                  p: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (worseFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val sv = scoreExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (sv != null && pv != null) add(buf, (sv.asInstanceOf[Double], pv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                     other: scala.collection.mutable.PriorityQueue[(Double, Long)]):
      scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by worseFirst = least-worse first = best-first
    val best = buf.toArray.sorted(worseFirst)
    new GenericArrayData(best.map { case (s, p) =>
      new GenericInternalRow(Array[Any](p, s))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = newHeap()
    (0 until n).foreach(_ => heap.enqueue((bb.getDouble, bb.getLong)))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), payloadExpr = newChildren(1), kExpr = newChildren(2))
}
