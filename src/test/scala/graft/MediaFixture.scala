package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image fixture bytes for the multimodal specs: deterministic
  * gradient-filled PNG/JPEG payloads encoded with the JDK's own
  * ImageIO writers — actual format headers, not synthetic magic. */
object MediaFixture {

  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        img.setRGB(x, y, ((x * 31 + y * 7) * 2654435761L).toInt & 0xffffff)
        y += 1
      }
      x += 1
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  def png(w: Int, h: Int): Array[Byte] = encode(gradient(w, h), "png")
  def jpeg(w: Int, h: Int): Array[Byte] = encode(gradient(w, h), "jpg")

  /** Decode (width, height) of an encoded image, for round-trip asserts. */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    (img.getWidth, img.getHeight)
  }
}
