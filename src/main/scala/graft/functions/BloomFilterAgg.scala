package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.12b (fourth sketch family) — a mergeable Bloom filter over
  * 64-bit keys, the build side of [[graft.operators.BloomJoin]]'s runtime
  * join-pruning filter (the pattern Spark's own AQE runtime filter and
  * every warehouse engine's "sideways information passing" implement:
  * summarize the small side's key set into a few KB, broadcast it, and
  * drop non-matching probe rows AT THE SCAN, before they pay the
  * shuffle).
  *
  * Mergeability: partitions build independent bitmaps and buffers
  * OR-merge across the shuffle — exactly associative, so the filter is
  * identical regardless of partitioning. Hashing is Kirsch–Mitzenmacher
  * double hashing over ONE xxhash64 evaluation: position_i =
  * (low32 + i·(high32|1)) mod m. The base hash is Spark's own
  * `XXH64.hashLong(k, 42)` — bit-for-bit what the SQL `xxhash64(bigint)`
  * computes — so the probe-side membership test is a pure codegen'd
  * Column expression over the broadcast bitmap (no UDF on the hot path;
  * see [[graft.operators.BloomJoin.mightContainSql]]).
  *
  * False positives only (never false negatives): callers that need exact
  * semantics re-verify survivors with the real join — the filter only
  * shrinks the data that reaches it.
  */
class BloomFilterAgg(val numWords: Int, val numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numWords >= 1 && numHashes >= 1, "numWords/numHashes must be >= 1")

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(buf: Array[Long], k: Long): Array[Long] = {
    val h = XXH64.hashLong(k, BloomFilterAgg.Seed)
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    val m = numWords * 64L
    var i = 0
    while (i < numHashes) {
      val p = java.lang.Math.floorMod(h1 + i * h2, m)
      buf((p >>> 6).toInt) |= 1L << (p & 63L).toInt
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomFilterAgg {
  /** Spark's fixed `xxhash64(…)` SQL seed — the JVM build side and the
    * SQL probe side MUST agree on it or membership tests are garbage. */
  val Seed = 42L
}
