package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** REAL image codec for the uncompressed formats that need no native
  * library — binary PPM (P6, the Netpbm interchange format: ASCII header
  * `P6 <w> <h> <maxval>` + raw RGB bytes). Upgrades the multimodal
  * column's decode tier from "stub everything" to "real decode for
  * container-safe formats, stub only for codec formats (JPEG/PNG stay a
  * declared limitation — no libjpeg/libpng in this container)". Pure
  * JVM, executor-safe, no shared state — usable straight inside the
  * batched `mapPartitions` pipeline ([[Multimodal.decodeBatched]]'s
  * sanctioned tier).
  */
object ImageCodec {

  /** Row-major interleaved RGB, 8 bits per channel. */
  final case class RawImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != ${width}x${height}x3")
  }

  def encodePpm(img: RawImage): Array[Byte] =
    s"P6\n${img.width} ${img.height}\n255\n".getBytes(US_ASCII) ++ img.pixels

  /** Strict P6 parser: magic, whitespace/comment-tolerant header tokens
    * (the Netpbm grammar allows `#` comments anywhere in the header),
    * exactly one whitespace byte before the raster. Fails loud on
    * anything else — a malformed blob must never decode quietly. */
  def decodePpm(bytes: Array[Byte]): RawImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM (magic)")
    var pos = 2
    def skipWsAndComments(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def token(): Int = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      require(pos > start, s"malformed PPM header at byte $start")
      new String(bytes, start, pos - start, US_ASCII).toInt
    }
    val (w, h, maxval) = (token(), token(), token())
    require(maxval == 255, s"only 8-bit PPM supported (maxval $maxval)")
    pos += 1 // the single whitespace byte after maxval
    require(bytes.length - pos == w * h * 3,
      s"raster size ${bytes.length - pos} != ${w}x${h}x3")
    RawImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }

  /** Nearest-neighbor resize: source index `floor(x2·w/w2)` per axis —
    * the integer mapping every engine replays exactly. */
  def resizeNearest(img: RawImage, w2: Int, h2: Int): RawImage = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * img.height / h2
      var x2 = 0
      while (x2 < w2) {
        val sx = x2 * img.width / w2
        val src = (sy * img.width + sx) * 3
        val dst = (y2 * w2 + x2) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x2 += 1
      }
      y2 += 1
    }
    RawImage(w2, h2, out)
  }

  /** Exact per-channel sums (unsigned bytes) — the mean-color feature
    * without float drift. */
  def channelSums(img: RawImage): (Long, Long, Long) = {
    var (r, g, b) = (0L, 0L, 0L)
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      b += img.pixels(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }
}
