package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.12b (second sketch family) — Count-Min frequency sketch as a
  * custom typed `Aggregator`: fixed-width counter matrix (Depth×Width
  * longs), element-wise-ADD merge — associative and commutative, so Spark
  * partial-aggregates map-side and a 100 TB key stream folds into one
  * 32 KB buffer per group. Point-frequency estimates then read
  * `min_r cms[r][h_r(k)]` straight off the merged array with Column
  * arithmetic (see `hashCol` twin below) — no second scan, no UDF.
  *
  * The row hashes are universal-family `((a·k + b) mod P) mod Width` with
  * FIXED coefficients: deterministic across runs, engines, and partition
  * orders, and overflow-free for any key below ~2^32 (a < 2^20, so
  * a·k + b < 2^52 ≪ 2^63) — immune to ANSI-mode overflow semantics.
  * Estimate guarantee: exact ≤ est, and est ≤ exact + e·N/Width w.h.p.
  * (Cormode & Muthukrishnan 2005) — the catalog query gates both bounds
  * as booleans next to the exact count, the self-validating-approximation
  * pattern of q_agg_approx_distinct.
  */
object CountMinAgg extends Aggregator[Long, Array[Long], Seq[Long]] {

  val Depth = 4
  val Width = 1024
  val P = 2147483647L // 2^31 - 1, Mersenne prime
  val A: Array[Long] = Array(92821L, 689287L, 200087L, 145007L)
  val B: Array[Long] = Array(53987L, 57163L, 92801L, 121021L)

  /** Row-r bucket of key k — the JVM twin of the Column-side expression. */
  def bucket(r: Int, k: Long): Int =
    (((A(r) * k + B(r)) % P + P) % P % Width).toInt

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], k: Long): Array[Long] = {
    var r = 0
    while (r < Depth) {
      buf(r * Width + bucket(r, k)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
