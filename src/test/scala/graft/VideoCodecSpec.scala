package graft

import graft.multimodal.{ImageCodec, Multimodal, VideoCodec}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** The MJPEG-in-AVI video codec: RIFF walking, per-frame JPEG decode,
  * defensive truncation handling, and the real-vs-stub contract inside
  * the distributed decode path. */
class VideoCodecSpec extends SparkTestBase {

  private def frameJpeg(seed: Int): Array[Byte] =
    ImageCodec.encodeJpeg(32, 24, (x, y) => (x * 5 + y * 11 + seed * 37) % 256)

  test("mjpeg avi round-trip yields every frame at the real dimensions, deterministically") {
    val avi = VideoCodec.encodeMjpegAvi((0 until 3).map(frameJpeg))
    val frames = VideoCodec.decode(avi).get
    assert(frames.length === 3)
    frames.foreach { case (w, h, px) =>
      assert(w === 32 && h === 24)
      assert(px.length === 32 * 24)
    }
    // frames are distinct content (JPEG is lossy but the patterns differ)
    assert(frames.map(_._3.toSeq).distinct.length === 3)
    assert(VideoCodec.decode(avi).get.map(_._3.toSeq) === frames.map(_._3.toSeq))
  }

  test("non-avi and truncated payloads degrade to None / fewer frames, never throw") {
    assert(VideoCodec.decode("not a video".getBytes("UTF-8")) === None)
    assert(VideoCodec.decode(Array.empty[Byte]) === None)
    val avi = VideoCodec.encodeMjpegAvi((0 until 3).map(frameJpeg))
    // cut mid-way through the last frame: the walker returns what fits
    val cut = VideoCodec.decode(avi.take(avi.length - 50))
    assert(cut.forall(_.length <= 3))
    // cut inside the RIFF header: no container, None
    assert(VideoCodec.decode(avi.take(10)) === None)
  }

  test("deeply nested LISTs walk iteratively — no stack overflow escapes decode") {
    // ~200k nested LIST chunks: a recursive walker would throw
    // StackOverflowError (fatal — Try does not catch it) out of decode
    val depth = 200000
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val body = 4 + depth * 12 // "AVI " + nested LIST headers
    for (shift <- Seq(0, 8, 16, 24)) out.write((body >> shift) & 0xFF)
    out.write("AVI ".getBytes("US-ASCII"))
    var remaining = depth * 12
    while (remaining > 0) {
      out.write("LIST".getBytes("US-ASCII"))
      val inner = remaining - 8
      for (shift <- Seq(0, 8, 16, 24)) out.write((inner >> shift) & 0xFF)
      out.write("mov ".getBytes("US-ASCII"))
      remaining -= 12
    }
    assert(VideoCodec.decode(out.toByteArray) === None) // no frames, no throw
  }

  test("a chunk with a huge declared size clamps instead of wrapping negative") {
    // frame 1 is valid; the next chunk declares size 0xFFFFFFF0 — Int
    // arithmetic would wrap the offset negative, throw inside Try, and
    // silently discard the already-decoded frame
    val good = VideoCodec.encodeMjpegAvi(Seq(frameJpeg(0)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, good.length)
    out.write("00dc".getBytes("US-ASCII"))
    for (b <- Seq(0xF0, 0xFF, 0xFF, 0xFF)) out.write(b)
    val avi = out.toByteArray
    // patch the RIFF size so the trailing chunk is inside the container
    val riffBody = avi.length - 8
    for ((shift, i) <- Seq(0, 8, 16, 24).zipWithIndex)
      avi(4 + i) = ((riffBody >> shift) & 0xFF).toByte
    val frames = VideoCodec.decode(avi)
    assert(frames.map(_.length) === Some(1)) // the good frame survives
  }

  test("uncompressed BI_RGB avi decodes exactly: luma arithmetic, row order, padding") {
    // width 10 → 30-byte rows padded to 32: exercises the 4-byte row
    // alignment; pattern varies in all of (frame, x, y) and channels
    def rgb(n: Int, x: Int, y: Int) = ((x * 23 + n) % 256, (y * 41) % 256, (x * 7 + y * 13) % 256)
    val avi = VideoCodec.encodeRgbAvi(10, 6, 3, rgb)
    val frames = VideoCodec.decode(avi).get
    assert(frames.length === 3)
    for ((f, n) <- frames.zipWithIndex) {
      val (w, h, px) = f
      assert(w === 10 && h === 6 && px.length === 60)
      for (y <- 0 until 6; x <- 0 until 10) {
        val (r, g, b) = rgb(n, x, y)
        val want = (r * 299 + g * 587 + b * 114) / 1000
        assert((px(y * 10 + x) & 0xFF) === want, s"frame $n pixel ($x,$y)")
      }
    }
    // determinism + truncation discipline: cutting the last frame keeps
    // the complete ones (a partial DIB never fits rowSize*h and is skipped)
    assert(VideoCodec.decode(avi).get.map(_._3.toSeq) === frames.map(_._3.toSeq))
    val cut = VideoCodec.decode(avi.take(avi.length - 40)).get
    assert(cut.length === 2)
  }

  test("8bpp frames map indices through the stream palette, not index-as-gray") {
    // inverted-ramp palette: index i -> gray 255-i; index-as-gray would
    // emit i itself and every pixel assert below would fail
    val avi = VideoCodec.encodePal8Avi(8, 4, 2,
      palette = i => (255 - i, 255 - i, 255 - i),
      pix = (n, x, y) => (n * 64 + y * 8 + x) % 256)
    val frames = VideoCodec.decode(avi).get
    assert(frames.length === 2)
    for ((f, n) <- frames.zipWithIndex; y <- 0 until 4; x <- 0 until 8) {
      val idx = (n * 64 + y * 8 + x) % 256
      val (r, g, b) = (255 - idx, 255 - idx, 255 - idx)
      assert((f._3(y * 8 + x) & 0xFF) === (r * 299 + g * 587 + b * 114) / 1000)
    }
  }

  test("crafted strf heights (Int.MinValue) are rejected — no throw, no bogus frame") {
    val avi = VideoCodec.encodeRgbAvi(10, 6, 2, (_, _, _) => (9, 9, 9))
    // patch biHeight (strf data offset 8) to 0x80000000: abs() keeps it
    // negative in Int space, which must not bypass the geometry guards
    val strfAt = avi.indexOfSlice("strf".getBytes("US-ASCII"))
    val hAt = strfAt + 8 + 8
    avi(hAt) = 0; avi(hAt + 1) = 0; avi(hAt + 2) = 0; avi(hAt + 3) = 0x80.toByte
    assert(VideoCodec.decode(avi) === None)
  }

  test("raw chunks of an undeclared stream are not decoded with another stream's format") {
    val avi = VideoCodec.encodeRgbAvi(10, 6, 3, (n, x, y) => (n, x, y))
    // relabel the second frame's chunk to stream 01 (same size, no strf
    // declared for stream 1): it must be skipped, not mis-decoded with
    // stream 0's geometry
    val first = avi.indexOfSlice("00db".getBytes("US-ASCII"))
    val second = avi.indexOfSlice("00db".getBytes("US-ASCII"), first + 1)
    avi(second + 1) = '1'
    val frames = VideoCodec.decode(avi).get
    assert(frames.length === 2)
  }

  test("a non-vids strf does not arm DIB decode; undeclared raw chunks stay undecoded") {
    // same container but the stream header claims an AUDIO stream: the
    // 00db chunks are headerless raw bytes no codec may claim
    val avi = VideoCodec.encodeRgbAvi(10, 6, 1, (_, _, _) => (1, 2, 3))
    val pos = avi.indexOfSlice("vids".getBytes("US-ASCII"))
    avi(pos) = 'a'; avi(pos + 1) = 'u'; avi(pos + 2) = 'd'; avi(pos + 3) = 's'
    assert(VideoCodec.decode(avi) === None)
  }

  test("decodeFrames samples every frameStep-th real frame, stub only for undecodable video") {
    import spark.implicits._
    val avi = VideoCodec.encodeMjpegAvi((0 until 5).map(frameJpeg))
    // metadata deliberately lies: real decode must report the raster's
    // 32x24; the undecodable payload falls back to the stub at meta dims
    val rows = Seq(
      MediaRow(1L, "video", avi, MediaMeta("avi", 99, 77, 5000L)),
      MediaRow(2L, "video", "h264 bytes".getBytes("UTF-8"), MediaMeta("mp4", 16, 16, 5000L)))
    val frames = Multimodal.decodeFrames(rows.toDS(), frameStep = 2).collect()
    val real = frames.filter(_.media_id == 1L).sortBy(_.frame_index)
    assert(real.map(_.frame_index).toSeq === Seq(0, 2, 4)) // container indices kept
    real.foreach(f => assert(f.width === 32 && f.height === 24))
    val stub = frames.filter(_.media_id == 2L)
    assert(stub.nonEmpty)
    stub.foreach(f => assert(f.width === 16 && f.height === 16))
  }
}
