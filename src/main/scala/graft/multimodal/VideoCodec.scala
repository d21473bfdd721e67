package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ListBuffer
import scala.util.Try

/** REAL video codec for the two mainstream AVI classes decodable with
  * nothing but the JDK:
  *
  *   - **MJPEG**: AVI is a plain RIFF chunk container and Motion-JPEG
  *     stream chunks are complete JPEG images, which `javax.imageio`
  *     decodes.
  *   - **Uncompressed BI_RGB (DIB)**: stream chunks are raw bottom-up
  *     BGR(A)/gray rasters described by the stream's BITMAPINFOHEADER
  *     (`strf`) — no entropy coding at all, pure arithmetic.
  *
  * Inter-coded codecs (H.264 etc.) still fall back to the labeled stub —
  * the JDK ships no entropy decoder for them, and an honest fallback
  * beats a fake one.
  *
  * The parser is a defensive RIFF walker: it validates the
  * `RIFF....AVI ` signature, then walks chunks (`LIST` recursively),
  * collecting video stream-data chunks (FourCC `NNdb`/`NNdc`) and
  * decoding each as JPEG (SOI-marked chunks) or as a raw DIB frame
  * (when a `vids` stream declared biCompression=0). Every size is
  * bounds-checked against the payload — a truncated crawl payload
  * yields the frames that fit, never an exception ([[ImageCodec]]'s
  * decode-failure-is-a-value discipline).
  *
  * Determinism: chunk order is the container's, JPEG decode through
  * ImageIO is deterministic, and the luma transform is ImageCodec's
  * integer arithmetic ((299·R + 587·G + 114·B) / 1000) for both paths.
  */
object VideoCodec {

  /** Decode an MJPEG or uncompressed-RGB AVI payload into grayscale
    * frames (width, height, row-major bytes), container order. None when
    * the payload is not a RIFF/AVI or contains no decodable stream
    * chunk. */
  def decode(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Byte])]] =
    Try {
      if (payload.length < 12 || !fourccAt(payload, 0, "RIFF") ||
          !fourccAt(payload, 8, "AVI ")) None
      else {
        val end = math.min(payload.length.toLong, 8L + u32(payload, 4)).toInt
        val frames = ListBuffer.empty[(Int, Int, Array[Byte])]
        walk(payload, 12, end, frames)
        if (frames.isEmpty) None else Some(frames.toList)
      }
    }.toOption.flatten

  /** A `vids` stream's uncompressed format: geometry plus, for 8bpp, the
    * stream's RGBQUAD palette pre-folded to luma (8-bit DIB pixels are
    * palette INDICES — emitting them as gray levels would be a fake
    * decode for any non-identity palette). */
  private final case class DibFormat(w: Int, h: Int, bpp: Int, topDown: Boolean,
                                     palette: Array[Byte])

  /** Iterative chunk walk with an explicit range stack — recursion would
    * let a crafted payload of deeply nested LISTs throw
    * StackOverflowError, which is FATAL (Try does not catch it) and
    * would escape [[decode]] and kill the Spark task. All offset
    * arithmetic is in Long: a declared chunk size near 2^32 must clamp
    * to the range end, not wrap an Int negative (which would abort the
    * walk and silently discard the frames already decoded). */
  private def walk(p: Array[Byte], from: Int, end: Int,
                   out: ListBuffer[(Int, Int, Array[Byte])]): Unit = {
    // explicit continuation stack preserving depth-first container order:
    // descending into a LIST pushes the resume-point of the current range
    var off = from.toLong
    var rEnd = end.toLong
    var resume = List.empty[(Long, Long)]
    // stream-format state: stream numbers follow `strl` declaration order
    // (every `strh` increments), and a `strh`(fccType=vids) arms the next
    // `strf` to be parsed as that stream's BITMAPINFOHEADER;
    // biCompression=0 declares raw DIB frames. Formats are keyed BY
    // STREAM NUMBER — a multi-stream AVI must never decode stream 01's
    // chunks with stream 00's geometry. hdrl precedes movi in every
    // spec-conforming AVI, so the depth-first walk sees the formats
    // before the first frame chunk.
    var streamNo = -1
    var awaitVideoStrf = false
    val dib = scala.collection.mutable.Map.empty[Int, DibFormat]
    while (off + 8 <= rEnd || resume.nonEmpty) {
      if (off + 8 > rEnd) {
        off = resume.head._1; rEnd = resume.head._2; resume = resume.tail
      } else {
        val size = u32(p, off.toInt + 4)
        val dataStart = off + 8
        val dataEnd = math.min(rEnd, dataStart + size)
        // chunks are word-aligned: odd sizes carry one pad byte; a
        // size-0 chunk still advances 8 header bytes, so the walk always
        // terminates
        val next = dataStart + size + (size & 1L)
        if (fourccAt(p, off.toInt, "LIST") && dataStart + 4 <= dataEnd) {
          resume ::= (next, rEnd) // come back to the sibling after the LIST
          off = dataStart + 4
          rEnd = dataEnd
        } else {
          if (fourccAt(p, off.toInt, "strh")) {
            streamNo += 1
            awaitVideoStrf =
              dataStart + 4 <= dataEnd && fourccAt(p, dataStart.toInt, "vids")
          } else if (fourccAt(p, off.toInt, "strf")) {
            if (awaitVideoStrf && dataEnd - dataStart >= 40) {
              val ds = dataStart.toInt
              val w = u32(p, ds + 4).toInt
              val hRaw = u32(p, ds + 8).toInt
              val bpp = ((p(ds + 14) & 0xFF) | ((p(ds + 15) & 0xFF) << 8))
              val compression = u32(p, ds + 16)
              // h bound via Long abs: hRaw = Int.MinValue would survive
              // math.abs (still negative) and bypass both decodeDib guards
              val h = math.abs(hRaw.toLong)
              // 8bpp needs the palette (256 RGBQUADs after the 40-byte
              // header; biClrUsed may declare fewer) — without one the
              // stream is NOT claimed, an index dump is not a decode
              val palette: Array[Byte] =
                if (bpp != 8) Array.emptyByteArray
                else {
                  val clrUsed = u32(p, ds + 32)
                  val n = if (clrUsed > 0 && clrUsed <= 256) clrUsed.toInt else 256
                  if (dataEnd - dataStart < 40L + 4L * n) null
                  else Array.tabulate[Byte](256) { i =>
                    val q = ds + 40 + 4 * math.min(i, n - 1) // clamp out-of-range indices
                    val b = p(q) & 0xFF; val g = p(q + 1) & 0xFF; val r = p(q + 2) & 0xFF
                    ((r * 299 + g * 587 + b * 114) / 1000).toByte
                  }
                }
              if (compression == 0L && (bpp == 8 || bpp == 24 || bpp == 32) &&
                  w > 0 && h > 0 && h <= Int.MaxValue && palette != null)
                dib(streamNo) = DibFormat(w, h.toInt, bpp, topDown = hRaw < 0, palette)
            }
            awaitVideoStrf = false
          } else if (isVideoData(p, off.toInt) && dataEnd > dataStart) {
            val data = java.util.Arrays.copyOfRange(p, dataStart.toInt, dataEnd.toInt)
            // JPEG chunks carry the SOI marker; raw DIB chunks are
            // headerless and need THEIR stream's declared format (the NN
            // FourCC digits). The final ImageCodec attempt keeps decoding
            // nonstandard-but-readable embedded images (e.g. PNG frames)
            // that neither path claims.
            val chunkStream = (p(off.toInt) - '0') * 10 + (p(off.toInt + 1) - '0')
            val frame =
              if (data.length >= 2 && (data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8)
                // a raw DIB frame can open with 0xFFD8 by pixel accident
                // (e.g. bottom-left B=255 G=216) — fall back to the
                // stream's declared format when the JPEG attempt fails
                ImageCodec.decode(data)
                  .orElse(dib.get(chunkStream).flatMap(f => decodeDib(data, f)))
              else dib.get(chunkStream).flatMap(f => decodeDib(data, f))
                .orElse(ImageCodec.decode(data))
            frame.foreach(out += _)
          }
          off = next
        }
      }
    }
  }

  /** Raw DIB frame → grayscale raster. Rows are 4-byte aligned; frames
    * are bottom-up unless the header declared a negative height. Bounds
    * and a 16 MP area cap guard crafted headers (a frame that does not
    * fully fit is skipped, consistent with the truncation discipline). */
  private def decodeDib(data: Array[Byte], f: DibFormat): Option[(Int, Int, Array[Byte])] = {
    val rowSize = ((f.w.toLong * f.bpp + 31) / 32) * 4
    if (f.w.toLong * f.h > (16L << 20) || data.length < rowSize * f.h) None
    else {
      val out = new Array[Byte](f.w * f.h)
      var y = 0
      while (y < f.h) {
        val base = ((if (f.topDown) y else f.h - 1 - y) * rowSize).toInt
        var x = 0
        while (x < f.w) {
          val lum = f.bpp match {
            case 8 => f.palette(data(base + x) & 0xFF) & 0xFF
            case 24 =>
              val b = data(base + x * 3) & 0xFF
              val g = data(base + x * 3 + 1) & 0xFF
              val r = data(base + x * 3 + 2) & 0xFF
              (r * 299 + g * 587 + b * 114) / 1000
            case _ => // 32: BGRA, alpha ignored
              val b = data(base + x * 4) & 0xFF
              val g = data(base + x * 4 + 1) & 0xFF
              val r = data(base + x * 4 + 2) & 0xFF
              (r * 299 + g * 587 + b * 114) / 1000
          }
          out(y * f.w + x) = lum.toByte
          x += 1
        }
        y += 1
      }
      Some((f.w, f.h, out))
    }
  }

  /** Stream-data FourCC `NNdb`/`NNdc` (NN = stream number digits). */
  private def isVideoData(p: Array[Byte], off: Int): Boolean = {
    def digit(b: Byte) = b >= '0' && b <= '9'
    digit(p(off)) && digit(p(off + 1)) && p(off + 2) == 'd' &&
      (p(off + 3) == 'b' || p(off + 3) == 'c')
  }

  private def fourccAt(p: Array[Byte], off: Int, s: String): Boolean =
    off + 4 <= p.length && p(off) == s(0).toByte && p(off + 1) == s(1).toByte &&
      p(off + 2) == s(2).toByte && p(off + 3) == s(3).toByte

  private def u32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  private def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc.getBytes("US-ASCII"))
    writeU32(bos, data.length)
    bos.write(data)
    if ((data.length & 1) == 1) bos.write(0) // word alignment pad
    bos.toByteArray
  }

  private def riffAvi(parts: Array[Byte]*): Array[Byte] = {
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    parts.foreach(riffBody.write)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    writeU32(out, riffBody.size())
    riffBody.writeTo(out)
    out.toByteArray
  }

  /** Build a minimal MJPEG AVI from pre-encoded JPEG frames — the
    * fixture generator for specs and synthetic media (RIFF + `movi` list
    * of `00dc` chunks; hdrl metadata is omitted, which [[decode]]'s
    * chunk walker — like any real demuxer's frame scan — does not
    * need). */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val moviBody = new ByteArrayOutputStream()
    moviBody.write("movi".getBytes("US-ASCII"))
    jpegFrames.foreach(f => moviBody.write(chunk("00dc", f)))
    riffAvi(chunk("LIST", moviBody.toByteArray))
  }

  /** Shared DIB-AVI fixture builder: `hdrl`→`strl` with a `vids`/`DIB `
    * stream header + a BITMAPINFOHEADER at the given bit depth (plus any
    * trailing strf payload, e.g. a palette), then `movi` with one raw
    * bottom-up `00db` DIB per frame. `writePixel(frame, x, y, row, xOff)`
    * writes one pixel's bytes into the row buffer. */
  private def encodeDibAvi(width: Int, height: Int, nFrames: Int, bpp: Int,
                           strfTail: Array[Byte],
                           writePixel: (Int, Int, Int, Array[Byte], Int) => Unit)
      : Array[Byte] = {
    val strh = new ByteArrayOutputStream()
    strh.write("vids".getBytes("US-ASCII"))
    strh.write("DIB ".getBytes("US-ASCII"))
    strh.write(new Array[Byte](48)) // rate/scale/etc — unused by the walker
    val strf = new ByteArrayOutputStream()
    writeU32(strf, 40); writeU32(strf, width); writeU32(strf, height)
    strf.write(1); strf.write(0) // biPlanes = 1
    strf.write(bpp); strf.write(0) // biBitCount
    writeU32(strf, 0) // biCompression = BI_RGB
    strf.write(new Array[Byte](20)) // size/ppm/clrUsed/clrImportant
    strf.write(strfTail)
    val strlBody = new ByteArrayOutputStream()
    strlBody.write("strl".getBytes("US-ASCII"))
    strlBody.write(chunk("strh", strh.toByteArray))
    strlBody.write(chunk("strf", strf.toByteArray))
    val hdrlBody = new ByteArrayOutputStream()
    hdrlBody.write("hdrl".getBytes("US-ASCII"))
    hdrlBody.write(chunk("LIST", strlBody.toByteArray))
    val rowSize = ((width * bpp + 31) / 32) * 4
    val bytesPerPx = bpp / 8
    def frame(n: Int): Array[Byte] = {
      val d = new Array[Byte](rowSize * height)
      for (y <- 0 until height; x <- 0 until width)
        writePixel(n, x, y, d, (height - 1 - y) * rowSize + x * bytesPerPx)
      d
    }
    val moviBody = new ByteArrayOutputStream()
    moviBody.write("movi".getBytes("US-ASCII"))
    (0 until nFrames).foreach(n => moviBody.write(chunk("00db", frame(n))))
    riffAvi(chunk("LIST", hdrlBody.toByteArray), chunk("LIST", moviBody.toByteArray))
  }

  /** Build a minimal uncompressed 24bpp BI_RGB AVI. Frame pixels are
    * (frameIdx, x, y) → (r, g, b). */
  def encodeRgbAvi(width: Int, height: Int, nFrames: Int,
                   rgb: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeDibAvi(width, height, nFrames, bpp = 24, Array.emptyByteArray,
      (n, x, y, row, o) => {
        val (r, g, b) = rgb(n, x, y)
        row(o) = b.toByte; row(o + 1) = g.toByte; row(o + 2) = r.toByte
      })

  /** Build a minimal 8bpp palettized BI_RGB AVI: BITMAPINFOHEADER +
    * 256-entry RGBQUAD palette, frames of raw palette indices.
    * Frame pixels are (frameIdx, x, y) → palette index. */
  def encodePal8Avi(width: Int, height: Int, nFrames: Int,
                    palette: Int => (Int, Int, Int),
                    pix: (Int, Int, Int) => Int): Array[Byte] = {
    val pal = new ByteArrayOutputStream()
    for (i <- 0 until 256) { // RGBQUAD = B, G, R, reserved
      val (r, g, b) = palette(i)
      pal.write(b); pal.write(g); pal.write(r); pal.write(0)
    }
    encodeDibAvi(width, height, nFrames, bpp = 8, pal.toByteArray,
      (n, x, y, row, o) => row(o) = pix(n, x, y).toByte)
  }

  private def writeU32(bos: ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
    bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
  }
}
