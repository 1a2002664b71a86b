package graft.operators

import org.apache.spark.sql.Dataset

/** Opaque media record: content as raw bytes + typed metadata — the
  * multimodal column shape from the builder brief (image/audio/video as
  * `binary` with schema'd metadata riding alongside). */
final case class MediaRecord(
    doc_id: Long,
    text: String, // decode source (the container has no codec libs)
    bin: Array[Byte],
    width: Int,
    height: Int)

/** Typed decode output: fixed-width integer "feature vector" + per-frame
  * chunk digests. */
final case class DecodedMedia(
    doc_id: Long,
    features: Seq[Int],
    frames: Seq[String])

/** Batched per-partition media decode — the Scala twin of the brief's
  * "Pandas UDFs over `mapInPandas`": records stream through
  * `mapPartitions` in FIXED-SIZE BATCHES (`Iterator.grouped`), the
  * decoder runs once per batch (where a real codec would amortize model
  * or codec-context setup), and results come back as a typed
  * `Dataset[DecodedMedia]` via case-class Encoders. The DECODE ITSELF is
  * a clearly-marked deterministic fake (no image/audio libraries ship in
  * this container): features are character codes at strided offsets,
  * frames are md5 digests of fixed 100-char chunks — both chosen to be
  * exactly replayable by the DuckDB oracle. Swapping in a real decoder
  * changes only `decodeOne`; the schema / partitioning / batch shape —
  * the actual Spark plumbing — is what this operator pins down.
  */
object Multimodal {

  val FeatureWidth = 8
  val FrameChunk = 100
  val FrameCount = 3

  /** STUB decoder (deterministic fake — see object scaladoc). Indexes by
    * Unicode CODE POINTS, not UTF-16 code units (ADVICE r4): the DuckDB
    * oracle's `substring`/`length`/`ascii` are character-based, so
    * charAt-style indexing would silently skew every offset — and break
    * the hash gate with no hint why — on the first astral-plane character
    * in a document. */
  private def decodeOne(r: MediaRecord): DecodedMedia = {
    val cps = r.text.codePoints().toArray
    val n = cps.length
    val features =
      if (n == 0) Seq.fill(FeatureWidth)(0)
      else (0 until FeatureWidth).map(i => cps((i * 37) % n))
    val md = java.security.MessageDigest.getInstance("MD5")
    def chunkDigest(f: Int): String = {
      val from = f * FrameChunk
      val chunk =
        if (from >= n) "" else new String(cps, from, math.min(FrameChunk, n - from))
      md.reset()
      md.digest(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    DecodedMedia(r.doc_id, features, (0 until FrameCount).map(chunkDigest))
  }

  /** Decode a media dataset in per-partition batches of `batchSize`.
    * One decoder instantiation per batch, streaming (never materializes
    * a partition), executor-side only — survives any partitioning. */
  def decodeBatched(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[DecodedMedia] = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would open its codec context HERE, once per batch
        batch.map(decodeOne)
      }
    }
  }
}
