package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.12b (third sketch family) — EXACT distinct counting over a
  * bounded integer key domain via bitmap partials: each partition sets
  * bits in a fixed 8 KB bitmap, buffers OR-merge across the shuffle, and
  * popcount finishes. The roaring-bitmap pattern of warehouse engines,
  * in its dense fixed-domain form: when the key space is bounded (user
  * ids, product ids, enum codes), exact distinct becomes as mergeable
  * as a sketch — no HLL tolerance machinery, and the oracle checks
  * EQUALITY, not a bound.
  *
  * Out-of-domain keys (negative or ≥ MaxId) are counted into a separate
  * overflow counter rather than silently dropped — the caller sees
  * `popcount + (overflow > 0 ? …)`; here the domain is asserted by the
  * catalog query's data contract (user_id < 2^16 at every SF).
  */
object BitmapDistinctAgg extends Aggregator[Long, Array[Long], Long] {

  val MaxId = 1 << 16
  private val Words = MaxId / 64

  /** word index [0, Words); the last slot is the overflow counter. */
  override def zero: Array[Long] = new Array[Long](Words + 1)

  override def reduce(buf: Array[Long], k: Long): Array[Long] = {
    if (k >= 0 && k < MaxId) buf((k >> 6).toInt) |= 1L << (k & 63)
    else buf(Words) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a(Words) += b(Words)
    a
  }

  override def finish(r: Array[Long]): Long = {
    require(r(Words) == 0L,
      s"${r(Words)} keys outside [0, $MaxId) — widen MaxId or pre-filter")
    var i = 0
    var n = 0L
    while (i < Words) { n += java.lang.Long.bitCount(r(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
