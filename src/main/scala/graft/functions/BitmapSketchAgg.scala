package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The two-level form of [[BitmapDistinctAgg]] — exact distinct counts
  * that RE-AGGREGATE: `BitmapSketchAgg` folds keys into a serialized
  * bitmap per group (the daily cube partial), `BitmapOrCountAgg` then
  * OR-merges those bitmaps across groups and popcounts (the monthly
  * rollup). Distinct counts don't sum — `Σ daily distinct ≥ monthly
  * distinct` — but bitmap partials union losslessly, so a 100 TB
  * pipeline can materialize per-(key, day) bitmaps ONCE and answer any
  * coarser rollup exactly, never rescanning the event stream. This is
  * the datelike-cube pattern warehouse engines ship as
  * `bitmap_construct_agg` / `bitmap_or_agg`, with the same bounded
  * dense-domain contract as [[BitmapDistinctAgg]] (out-of-domain keys
  * fail loudly rather than silently dropping).
  */
object BitmapSketchAgg extends Aggregator[Long, Array[Long], Array[Byte]] {
  private val Words = BitmapDistinctAgg.MaxId / 64

  override def zero: Array[Long] = BitmapDistinctAgg.zero
  override def reduce(b: Array[Long], k: Long): Array[Long] =
    BitmapDistinctAgg.reduce(b, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BitmapDistinctAgg.merge(a, b)

  override def finish(r: Array[Long]): Array[Byte] = {
    require(r(Words) == 0L,
      s"${r(Words)} keys outside [0, ${BitmapDistinctAgg.MaxId}) — " +
        "widen MaxId or pre-filter")
    val bb = ByteBuffer.allocate(Words * 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < Words) { bb.putLong(r(i)); i += 1 }
    bb.array()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** OR-merge serialized bitmaps ([[BitmapSketchAgg]] outputs) and count
  * the set bits — the rollup side of the two-level exact distinct. */
object BitmapOrCountAgg extends Aggregator[Array[Byte], Array[Long], Long] {
  private val Words = BitmapDistinctAgg.MaxId / 64

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(buf: Array[Long], bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < Words) { buf(i) |= bb.getLong(i * 8); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Long = {
    var i = 0
    var n = 0L
    while (i < Words) { n += java.lang.Long.bitCount(r(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
