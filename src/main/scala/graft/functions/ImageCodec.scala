package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JVM image codec for the multimodal pipeline (SURVEY §2 E12).
  *
  * `javax.imageio` ships with the JDK (PNG/BMP/GIF readers — no native
  * libraries, headless-safe), so the decode stage of the media pipeline
  * can be REAL for those formats: bytes → BufferedImage → pixel
  * statistics / resample → re-encoded bytes. Formats the JDK can't
  * read (JPEG2000, video containers, audio) return None and callers
  * fall back to their byte-level path — the production shape, where a
  * decoder plugin handles what it can and flags the rest.
  */
object ImageCodec {

  // ImageIO's default disk scratch cache serializes concurrent decodes
  // through temp-file creation; per-executor-thread in-memory streams
  // are both faster and safe under local[32]
  ImageIO.setUseCache(false)

  /** bytes → decoded image, None for undecodable/non-image payloads. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** BMP: the JDK codec WITHOUT deflate — the cheap container for bulk
    * synthesized fixtures (same decode path as PNG, ~10x the encode
    * throughput).
    */
  def encodeBmp(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Per-channel mean intensities in [0,1] — the real feature a decode
    * stage feeds a model (here: a fixed 3-vector of channel statistics).
    */
  def channelMeans(img: BufferedImage): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h * 255
    Array(r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Deterministic interpolating resample (area-averaging for shrink,
    * bilinear-ish nearest for grow) — pure pixel arithmetic, no
    * Graphics2D rendering pipeline, so results are bit-stable across
    * JVMs/platforms (a rendering-hint rasterizer is not).
    */
  def resample(img: BufferedImage, targetW: Int, targetH: Int): BufferedImage = {
    val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    var y = 0
    while (y < targetH) {
      val sy0 = y * sh / targetH
      val sy1 = math.max((y + 1) * sh / targetH, sy0 + 1)
      var x = 0
      while (x < targetW) {
        val sx0 = x * sw / targetW
        val sx1 = math.max((x + 1) * sw / targetW, sx0 + 1)
        var r = 0L; var g = 0L; var b = 0L
        var sy = sy0
        while (sy < sy1) {
          var sx = sx0
          while (sx < sx1) {
            val p = img.getRGB(sx, sy)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            sx += 1
          }
          sy += 1
        }
        val n = (sy1 - sy0).toLong * (sx1 - sx0)
        out.setRGB(x, y,
          (((r / n).toInt & 0xFF) << 16) | (((g / n).toInt & 0xFF) << 8) |
            ((b / n).toInt & 0xFF))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Average-hash perceptual fingerprint (the aHash of every
    * image-dedup pipeline): resample to 8×8 (area-averaging, so the
    * hash sees block means), gray each cell, threshold against the
    * global mean → 64 bits. Invariant under uniform brightness shift
    * and any resize that preserves block structure; near-duplicate
    * images land within a few bits of Hamming distance.
    */
  def aHash64(img: BufferedImage): Long = {
    val small = resample(img, 8, 8)
    val gray = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val p = small.getRGB(i % 8, i / 8)
      gray(i) = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      sum += gray(i)
      i += 1
    }
    val mean = sum / 64
    var h = 0L
    i = 0
    while (i < 64) {
      if (gray(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Deterministic synthetic PNG — a seeded RGB gradient pattern. Used
    * by tests and by pipelines that need real decodable payloads
    * without external media files.
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] =
    encodePng(syntheticImage(width, height, seed))

  def syntheticBmp(width: Int, height: Int, seed: Long): Array[Byte] =
    encodeBmp(syntheticImage(width, height, seed))

  /** Deterministic pseudo-random pixels via one bulk setRGB (the
    * per-pixel setRGB loop color-converts per call and dominated
    * fixture synthesis).
    */
  private def syntheticImage(width: Int, height: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    var i = 0
    while (i < px.length) {
      val v = seed * 6364136223846793005L + i * 1442695040888963407L
      px(i) = ((v >>> 40) & 0xFFFFFF).toInt
      i += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    img
  }
}
