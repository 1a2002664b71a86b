package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.12b — a custom typed `Aggregator[IN, BUF, OUT]` for sketch
  * merging: combines per-document MinHash signatures into one signature
  * per group (corpus/source/partition) by element-wise minimum.
  *
  * MinHash signatures merge associatively and commutatively, so Spark can
  * partial-aggregate map-side and merge buffers across the shuffle — the
  * property that makes a 100 TB corpus sketch a single cheap groupBy. The
  * signature elements are md5-hex strings (the engine's cross-engine hash
  * choice, see DedupQueries); lexicographic min == numeric min over the
  * leading bits, and "￿" sorts above every hex digit as the zero
  * element.
  */
object MinHashAgg extends Aggregator[Seq[String], Array[String], Seq[String]] {

  val SigLen = 8
  private val Top = "￿"

  override def zero: Array[String] = Array.fill(SigLen)(Top)

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] = {
    var i = 0
    while (i < SigLen) {
      val v = sig(i)
      if (v != null && v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < SigLen) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[String]): Seq[String] = r.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    implicitly[Encoder[Array[String]]](Encoders.kryo[Array[String]])

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
