package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ListBuffer
import scala.util.Try

/** REAL video codec for MJPEG-in-AVI — the one mainstream video format
  * decodable with nothing but the JDK: AVI is a plain RIFF chunk
  * container, and Motion-JPEG stream chunks are complete JPEG images,
  * which `javax.imageio` decodes. This closes the last stubbed modality
  * for the format class that needs no external binary; other codecs
  * (H.264 etc.) still fall back to the labeled stub — the JDK ships no
  * entropy decoder for them, and an honest fallback beats a fake one.
  *
  * The parser is a defensive RIFF walker: it validates the
  * `RIFF....AVI ` signature, then walks chunks (`LIST` recursively),
  * collecting video stream-data chunks (FourCC `NNdb`/`NNdc`) and
  * decoding each as JPEG. Every size is bounds-checked against the
  * payload — a truncated crawl payload yields the frames that fit, never
  * an exception ([[ImageCodec]]'s decode-failure-is-a-value discipline).
  *
  * Determinism: chunk order is the container's, JPEG decode through
  * ImageIO is deterministic, and the luma transform is ImageCodec's
  * integer arithmetic.
  */
object VideoCodec {

  /** Decode an MJPEG AVI payload into grayscale frames (width, height,
    * row-major bytes), container order. None when the payload is not a
    * RIFF/AVI or contains no decodable JPEG stream chunk. */
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
          if (isVideoData(p, off.toInt) && dataEnd > dataStart) {
            val jpeg = java.util.Arrays.copyOfRange(p, dataStart.toInt, dataEnd.toInt)
            ImageCodec.decode(jpeg).foreach(out += _)
          }
          off = next
        }
      }
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

  /** Build a minimal MJPEG AVI from pre-encoded JPEG frames — the
    * fixture generator for specs and synthetic media (RIFF + `movi` list
    * of `00dc` chunks; hdrl metadata is omitted, which [[decode]]'s
    * chunk walker — like any real demuxer's frame scan — does not
    * need). */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(fourcc.getBytes("US-ASCII"))
      writeU32(bos, data.length)
      bos.write(data)
      if ((data.length & 1) == 1) bos.write(0) // word alignment pad
      bos.toByteArray
    }
    val moviBody = new ByteArrayOutputStream()
    moviBody.write("movi".getBytes("US-ASCII"))
    jpegFrames.foreach(f => moviBody.write(chunk("00dc", f)))
    val movi = chunk("LIST", moviBody.toByteArray)
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    riffBody.write(movi)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    writeU32(out, riffBody.size())
    riffBody.writeTo(out)
    out.toByteArray
  }

  private def writeU32(bos: ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
    bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
  }
}
