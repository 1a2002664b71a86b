package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch — Bar-Yossef et al.,
  * "Counting distinct elements in a data stream" (RANDOM'02): keep the
  * k smallest values of a uniform hash; with U_k the k-th smallest
  * hash as a fraction of the hash space, the distinct count estimates
  * as `(k-1)/U_k` (the unbiased form). When fewer than k distinct
  * hashes were seen the sketch IS the distinct set and the count is
  * exact — the estimator only engages past k.
  *
  * Deterministic and cross-engine replayable BY CONSTRUCTION: the hash
  * is the first 12 hex chars of md5 (48 bits — exact in a double), so
  * DuckDB can rebuild the identical sketch with a window function and
  * the oracle compares the ESTIMATE bit-for-bit, not within a
  * tolerance band (`('0x' || substring(md5(x), 1, 12))::BIGINT` there,
  * `conv(substring(md5(x), 1, 12), 16, 10)` here).
  *
  * Scale: the state is ≤ k longs (k ≈ 32-1024), merge is a bounded
  * sorted-insert union — a classic partial-aggregable sketch: partials
  * combine map-side, the shuffle carries ≤ 8k bytes per group, and
  * sketches of DIFFERENT corpora union losslessly (distinct counts
  * don't sum; KMV states do), the same re-aggregation contract as
  * [[BitmapSketchAgg]] without the bounded-domain restriction.
  */
class KmvDistinctAgg(k: Int)
    extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: Array[Long] = Array.empty[Long]

  private def insert(b: Array[Long], h: Long): Array[Long] =
    if (b.length == k && h >= b(k - 1)) b
    else {
      val idx = java.util.Arrays.binarySearch(b, h)
      if (idx >= 0) b // already in the sketch
      else {
        val ins = -idx - 1
        val n = math.min(b.length + 1, k)
        if (ins >= n) b
        else {
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

  override def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  /** Exact below k distinct; `(k-1)/U_k` past it. */
  override def finish(r: Array[Long]): Double =
    if (r.length < k) r.length.toDouble
    else (k - 1) * KmvDistinctAgg.HashSpace / r(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinctAgg {
  /** 2^48 — the hash space of a 12-hex-char md5 prefix. */
  val HashSpace: Double = 281474976710656.0
}
