package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column maintenance operators for the `embeddings` table
  * (`vec_id, embedding: array<float>, label`) — the storage-side prep
  * an ANN/similarity deployment runs ahead of serving.
  *
  * Both operators are engine-reproducible: all float math is widened to
  * double (exact for float inputs), combined in a fixed order, and
  * reported in integer fixed-point, so a DuckDB oracle hash-matches
  * bit-for-bit.
  */
object Embeddings {

  /** Symmetric int8 scalar quantization: q_d = floor(x_d * 127 /
    * max_abs) per vector (all-zero vectors quantize to zeros). Emits
    * per-vector integer certificates — the scale factor and the
    * quantized vector's sum / squared norm / min / max — rather than
    * the int8 array itself, so correctness is checkable without
    * array-typed compares.
    *
    * Shape at 100 TB: one kernel pass, no shuffle (a per-row transform
    * in the scan stage; the HOF route would recompute max_abs per
    * element — the inlining pathology at Dedup.scala:18-25). This is
    * the 4× memory lever for the IVF/ANN serving path.
    */
  def quantize(emb: DataFrame): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          var maxAbs = 0.0
          var i = 0
          while (i < v.length) {
            val a = math.abs(v(i).toDouble)
            if (a > maxAbs) maxAbs = a
            i += 1
          }
          var qSum = 0L; var qNorm2 = 0L
          var qMin = 0L; var qMax = 0L
          if (maxAbs > 0) {
            qMin = Long.MaxValue; qMax = Long.MinValue
            i = 0
            while (i < v.length) {
              val q = math.floor(v(i).toDouble * 127.0 / maxAbs).toLong
              qSum += q; qNorm2 += q * q
              if (q < qMin) qMin = q
              if (q > qMax) qMax = q
              i += 1
            }
          }
          (id, math.floor(maxAbs * 1e9).toLong, qSum, qNorm2, qMin, qMax)
        }
      }
      .toDF("vec_id", "maxabs_x1e9", "q_sum", "q_norm2", "q_min", "q_max")
      .orderBy("vec_id")
  }

  /** Per-label centroids in fixed-point: element d of label L's
    * centroid is floor(sum(floor(x_d * 1e6)) / n) — the inner floor
    * makes the summation exact integer arithmetic (order-independent,
    * unlike a double sum), the outer division is exact while the sum
    * stays under 2^53 (|x| ≲ 1 ⇒ holds beyond 10^9 vectors per label).
    *
    * Shape at 100 TB: posexplode fans each vector into (label, pos)
    * cells, but partial aggregation folds them map-side to
    * n_labels × dim rows per task before the one tiny shuffle — the
    * same shape KMeans update steps use.
    */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * 1e6).cast("long").as("fx"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum(col("fx")).as("sum_fx"))
      .select(col("label"), col("pos"), col("n"),
        floor(col("sum_fx").cast("double") / col("n").cast("double"))
          .cast("long").as("centroid_x1e6"))
      .orderBy("label", "pos")
}
