package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec

/** Real image decode kernel (operators/Multimodal.scala MediaCodec —
  * javax.imageio): container parsing is genuine, not a byte passthrough.
  */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG round trip is lossless: dimensions and every sample survive") {
    val payload = (0 until 24).map(i => (i * 11 % 128).toByte).toArray
    val png = MediaCodec.encodeGrayPng(payload, 6, 4)
    // a PNG container, not raw bytes: magic header present, size differs
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val st = MediaCodec.decodeImage(7L, png)
    assert(st.doc_id == 7L && st.width == 6 && st.height == 4 && st.channels == 1)
    val px = payload.map(_ & 0xFF)
    assert(st.min_px == px.min && st.max_px == px.max)
    assert(st.mean_px == BigDecimal(px.sum.toDouble / px.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("zero-padding past the payload end; dimensions drive the pixel count") {
    val st = MediaCodec.decodeImage(1L,
      MediaCodec.encodeGrayPng(Array[Byte](100, 100), 4, 3)) // 2 bytes into 12 px
    assert(st.width == 4 && st.height == 3)
    assert(st.min_px == 0 && st.max_px == 100)
    assert(st.mean_px == BigDecimal(200.0 / 12)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("decode handles other registered containers (JPEG, 3-band RGB)") {
    val img = new java.awt.image.BufferedImage(
      5, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 5) img.setRGB(x, y, 0x406080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val st = MediaCodec.decodeImage(2L, bos.toByteArray)
    // lossy codec: assert container facts, not exact samples
    assert(st.width == 5 && st.height == 2 && st.channels == 3)
    assert(st.min_px >= 0 && st.max_px <= 255 && st.mean_px > 0)
  }

  test("garbage bytes are rejected loudly, not decoded to nonsense") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeImage(3L, Array[Byte](1, 2, 3, 4, 5)))
  }
}
