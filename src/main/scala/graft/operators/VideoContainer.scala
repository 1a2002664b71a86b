package graft.operators

/** Raw multi-frame media container: back-to-back binary PPM frames —
  * the uncompressed-video analog (y4m-style concatenated rasters) that
  * closes the frame-sampling tier of the multimodal brief with REAL
  * byte-walking. Each frame is a self-describing P6 image, so the
  * container needs no index: the header walk computes every frame's
  * byte length (magic + three ASCII ints with whitespace/comments + one
  * separator + w×h×3 raster) and frame N starts where frame N-1 ends.
  *
  * Frame-sampling ("give the pipeline every N-th frame") then never
  * touches the skipped frames' rasters — at 100 TB of video that skip
  * is the operator. Compressed codecs (H.264 etc.) remain the declared
  * container limitation, like JPEG beside [[ImageCodec]]; the
  * container-walking tier is real and loud on malformed bytes.
  */
object VideoContainer {

  /** Byte length of the P6 frame starting at `off` — header token walk
    * only, no raster decode. Fails loud on non-PPM bytes. */
  private def ppmLength(b: Array[Byte], off: Int): Int = {
    require(off + 2 <= b.length && b(off) == 'P' && b(off + 1) == '6',
      s"not a P6 frame at offset $off")
    var i = off + 2
    val dims = new Array[Int](3)
    var v = 0
    while (v < 3) {
      var scanning = true
      while (scanning) {
        if (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' ||
            b(i) == '\t')) i += 1
        else if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else scanning = false
      }
      require(i < b.length && b(i) >= '0' && b(i) <= '9',
        s"bad PPM header token at offset $i")
      var x = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        x = x * 10 + (b(i) - '0')
        i += 1
      }
      dims(v) = x
      v += 1
    }
    i += 1 // the single whitespace byte after maxval
    val end = i + dims(0) * dims(1) * 3
    require(end <= b.length, s"truncated raster: frame at $off needs $end")
    end - off
  }

  /** Split a container into its frames and keep every `everyN`-th
    * (frame 0 always kept): `(frameIndex, frameBytes)`. Skipped frames
    * cost only the header walk. */
  def sampleFrames(bytes: Array[Byte],
      everyN: Int): Seq[(Int, Array[Byte])] = {
    require(everyN >= 1, s"everyN must be >= 1 (got $everyN)")
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var off = 0
    var idx = 0
    while (off < bytes.length) {
      val len = ppmLength(bytes, off)
      if (idx % everyN == 0)
        out += ((idx, java.util.Arrays.copyOfRange(bytes, off, off + len)))
      off += len
      idx += 1
    }
    out.result()
  }
}
