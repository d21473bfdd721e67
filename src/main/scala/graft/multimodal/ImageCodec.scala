package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Try

import javax.imageio.ImageIO

/** REAL image codec on `javax.imageio` — JDK-built-in, so it adds no
  * dependency and runs headless. This replaces the stubbed decode for the
  * image modality: PNG/BMP/GIF/JPEG payload bytes decode to an actual
  * grayscale raster, and resize renders through `java.awt.Graphics2D`.
  *
  * Decode failure is a VALUE (`None`), not an exception: a 100 TB media
  * crawl always contains truncated and mislabeled payloads, and a codec
  * that throws inside `mapPartitions` kills the stage. Callers
  * ([[Multimodal.decodeFrames]]) fall back to the deterministic stub —
  * which is also the honest path for the synthetic fixture corpus, whose
  * payloads are UTF-8 text rather than image bytes.
  *
  * Everything is deterministic: PNG decode is exact, the luma transform is
  * integer arithmetic, and resize uses nearest-neighbor rendering hints so
  * no platform-dependent filtering enters the raster.
  */
object ImageCodec {

  /** Decoded grayscale raster: row-major, one byte per pixel (ITU-R BT.601
    * integer luma: (299·R + 587·G + 114·B) / 1000). */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    Try(Option(ImageIO.read(new ByteArrayInputStream(payload)))).toOption.flatten
      .map(toGray)

  /** Decode then nearest-neighbor downscale so the longer side is at most
    * `maxDim` (never upscales). The real-raster twin of
    * [[Multimodal.resizeMeta]]'s metadata transform. */
  def decodeResized(payload: Array[Byte], maxDim: Int): Option[(Int, Int, Array[Byte])] =
    Try(Option(ImageIO.read(new ByteArrayInputStream(payload)))).toOption.flatten
      .map { img =>
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        if (scale >= 1.0) toGray(img)
        else {
          val w = math.max(1, (img.getWidth * scale).toInt)
          val h = math.max(1, (img.getHeight * scale).toInt)
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          toGray(dst)
        }
      }

  private def toGray(img: BufferedImage): (Int, Int, Array[Byte]) = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        out(y * w + x) = lum.toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** JPEG-encode a grayscale pattern — the MJPEG frame fixture for
    * [[VideoCodec]] specs (lossy, so asserts compare dimensions and
    * determinism, not exact bytes). */
  def encodeJpeg(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** PNG-encode a grayscale pattern — the fixture generator for specs and
    * synthetic media (PNG is lossless, so decode(encode(p)) == p). */
  def encodePng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
