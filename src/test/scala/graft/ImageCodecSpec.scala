package graft

import graft.multimodal.{ImageCodec, Multimodal}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** The javax.imageio-backed image codec: real decode, real resize, and the
  * stub fallback contract inside the distributed decode path. */
class ImageCodecSpec extends SparkTestBase {

  private def gradient(x: Int, y: Int): Int = (x * 7 + y * 13) % 256

  test("png round-trip recovers the exact gray raster") {
    val (w, h) = (40, 25)
    val png = ImageCodec.encodePng(w, h, gradient)
    val (dw, dh, px) = ImageCodec.decode(png).get
    assert(dw === w && dh === h)
    // gray g encodes to RGB(g,g,g); integer luma of (g,g,g) is exactly g
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xFF) === gradient(x, y))
  }

  test("decodeResized caps the longer side, never upscales, and is deterministic") {
    val png = ImageCodec.encodePng(40, 25, gradient)
    val (w, h, px) = ImageCodec.decodeResized(png, 20).get
    assert(w === 20 && h === 12)
    assert(px.distinct.length > 1, "resize produced a constant raster")
    assert(ImageCodec.decodeResized(png, 20).get._3.toSeq === px.toSeq)
    // maxDim above the source leaves the raster at source size
    val (fw, fh, full) = ImageCodec.decodeResized(png, 100).get
    assert(fw === 40 && fh === 25 && full.toSeq === ImageCodec.decode(png).get._3.toSeq)
  }

  test("undecodable payloads are None, not an exception") {
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")) === None)
    assert(ImageCodec.decode(Array.empty[Byte]) === None)
    // truncated PNG header
    val png = ImageCodec.encodePng(8, 8, gradient)
    assert(ImageCodec.decode(png.take(12)) === None)
  }

  test("decodeFrames uses the real raster for images and the stub elsewhere") {
    import spark.implicits._
    val png = ImageCodec.encodePng(30, 20, gradient)
    // metadata deliberately lies about the dimensions: the real decode
    // must report the raster's 30x20, the fallbacks the metadata's
    val rows = Seq(
      MediaRow(1L, "image", png, MediaMeta("png", 99, 77, 0L)),
      MediaRow(2L, "image", "garbage".getBytes("UTF-8"), MediaMeta("png", 16, 16, 0L)),
      MediaRow(3L, "audio", "pcm".getBytes("UTF-8"), MediaMeta("mp4", 16, 16, 5000L)))
    val frames = Multimodal.decodeFrames(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(frames(1L).width === 30 && frames(1L).height === 20)
    assert(frames(1L).pixels.toSeq ===
      ImageCodec.decode(png).get._3.toSeq, "distributed decode != local decode")
    assert(frames(2L).width === 16 && frames(2L).height === 16, "fallback keeps meta dims")
    assert(frames(2L).pixels.toSeq ===
      Multimodal.StubCodec.decode("garbage".getBytes("UTF-8"), MediaMeta("png", 16, 16, 0L)).toSeq)
    assert(frames(3L).pixels.nonEmpty)
  }
}
