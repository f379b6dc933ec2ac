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

  test("WAV round trip is lossless: header facts and every sample survive") {
    val payload = (0 until 30).map(i => (i * 17 % 256).toByte).toArray
    val wav = MediaCodec.encodeWav(payload, 16000, 1)
    // a RIFF/WAVE container, not raw bytes
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val st = MediaCodec.decodeAudio(7L, wav)
    assert(st.doc_id == 7L && st.sample_rate == 16000 && st.channels == 1)
    assert(st.bits == 8 && st.n_frames == 30)
    assert(st.duration_ms == 1.875) // 30 frames / 16 kHz = 1.875 ms exactly
    val px = payload.map(_ & 0xFF)
    assert(st.min_amp == px.min && st.max_amp == px.max)
    assert(st.mean_amp == BigDecimal(px.sum.toDouble / px.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stereo WAV with odd byte count pads to a whole frame") {
    val st = MediaCodec.decodeAudio(1L,
      MediaCodec.encodeWav(Array[Byte](10, 20, 30), 8000, 2))
    assert(st.channels == 2 && st.n_frames == 2) // 3 bytes + 1 pad = 2 frames
    assert(st.min_amp == 0 && st.max_amp == 30)  // the pad byte is in-band
    assert(st.mean_amp == 15.0)                  // (10+20+30+0)/4
  }

  test("decode handles other registered containers (AIFF, signed 8-bit)") {
    import javax.sound.sampled._
    val data = Array[Byte](-128, 0, 127, 64) // signed PCM, AIFF's native 8-bit
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 8, 1, 1, 8000f, true)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 4),
      AudioFileFormat.Type.AIFF, bos)
    val st = MediaCodec.decodeAudio(2L, bos.toByteArray)
    // signed samples normalize into the same 0..255 amplitude domain
    assert(st.sample_rate == 8000 && st.channels == 1 && st.n_frames == 4)
    assert(st.min_amp == 0 && st.max_amp == 255)
    assert(st.mean_amp == BigDecimal((0 + 128 + 255 + 192) / 4.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("audio garbage bytes are rejected loudly") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeAudio(3L, Array[Byte](82, 73, 70, 70, 1, 2, 3)))
  }

  // ---------------------------------------------------------------- video

  test("golden AVI: a container hand-built from the RIFF/AVI spec decodes") {
    // built byte-by-byte HERE, independent of MediaCodec's encoder, so the
    // parser is checked against the published layout, not against itself
    // (the RCFileSpec golden-decode posture). 2x1 video, 2 DIB frames,
    // 5 fps: frame 1 pixels (10, 20), frame 2 pixels (30, 40).
    val bb = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String) = bb.put(s.getBytes("US-ASCII"))
    val stride = 8 // 2px * 3B = 6, aligned up to 8
    val frameSz = stride * 1
    val movi = 4 + 2 * (8 + frameSz)
    val hdrl = 4 + 64 + (8 + 4 + 64 + 48)
    tag("RIFF"); bb.putInt(4 + 8 + hdrl + 8 + movi); tag("AVI ")
    tag("LIST"); bb.putInt(hdrl); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(200000); bb.putInt(0); bb.putInt(0); bb.putInt(0x10)
    bb.putInt(2); bb.putInt(0); bb.putInt(1); bb.putInt(frameSz)
    bb.putInt(2); bb.putInt(1); bb.putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(4 + 64 + 48); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("DIB ")
    bb.putInt(0); bb.putShort(0); bb.putShort(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(5) // scale 1, rate 5 → 5 fps
    bb.putInt(0); bb.putInt(2); bb.putInt(frameSz); bb.putInt(-1); bb.putInt(0)
    bb.putShort(0); bb.putShort(0); bb.putShort(2); bb.putShort(1)
    tag("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(2); bb.putInt(1); bb.putShort(1); bb.putShort(24)
    bb.putInt(0); bb.putInt(frameSz); bb.putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(movi); tag("movi")
    for (px <- Seq((10, 20), (30, 40))) {
      tag("00db"); bb.putInt(frameSz)
      for (v <- Seq(px._1, px._1, px._1, px._2, px._2, px._2))
        bb.put(v.toByte)
      bb.putShort(0) // row pad to stride 8
    }
    val avi = java.util.Arrays.copyOf(bb.array(), bb.position())
    val st = MediaCodec.decodeVideo(11L, avi)
    assert(st.width == 2 && st.height == 1 && st.fps == 5.0)
    assert(st.n_frames == 2 && st.n_sampled == 2 && st.duration_ms == 400.0)
    assert(st.min_px == 10 && st.max_px == 40 && st.mean_px == 25.0)
  }

  test("AVI DIB round trip is lossless; frame sampling skips frames") {
    val payload = (0 until 48).map(i => (i * 7 % 200).toByte).toArray
    val avi = MediaCodec.encodeAviDib(payload, 4, 3, 12) // 4 frames of 12 px
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val all = MediaCodec.decodeVideo(5L, avi)
    assert(all.width == 4 && all.height == 3 && all.fps == 12.0)
    assert(all.n_frames == 4 && all.n_sampled == 4)
    val px = payload.map(_ & 0xFF)
    assert(all.min_px == px.min && all.max_px == px.max)
    assert(all.mean_px == BigDecimal(px.sum.toDouble / px.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every 3rd frame → frames 0 and 3 only
    val s3 = MediaCodec.decodeVideo(5L, avi, sampleEvery = 3)
    val sampled = px.slice(0, 12) ++ px.slice(36, 48)
    assert(s3.n_frames == 4 && s3.n_sampled == 2)
    assert(s3.min_px == sampled.min && s3.max_px == sampled.max)
    assert(s3.mean_px == BigDecimal(sampled.sum.toDouble / sampled.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("AVI tail frame zero-pads; odd geometry exercises row-stride padding") {
    // 3px * 3B = 9-byte rows pad to 12-byte stride; 7 bytes into 2 frames
    val st = MediaCodec.decodeVideo(6L,
      MediaCodec.encodeAviDib(Array[Byte](50, 50, 50, 50, 50, 50, 50), 3, 2, 10))
    assert(st.width == 3 && st.height == 2 && st.n_frames == 2)
    assert(st.min_px == 0 && st.max_px == 50)
    assert(st.mean_px == BigDecimal(350.0 / 12)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("AVI MJPG frames decode through the JDK JPEG reader") {
    // lossy codec: container facts exact, amplitude within JPEG tolerance
    val payload = Array.fill(32)(120.toByte)
    val avi = MediaCodec.encodeAviMjpeg(payload, 4, 4, 8) // 2 frames
    val st = MediaCodec.decodeVideo(7L, avi)
    assert(st.width == 4 && st.height == 4 && st.fps == 8.0)
    assert(st.n_frames == 2 && st.duration_ms == 250.0)
    assert(math.abs(st.mean_px - 120.0) < 4.0,
      s"flat-gray JPEG mean drifted: ${st.mean_px}")
  }

  test("video garbage and unsupported codecs are rejected loudly") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeVideo(8L, Array[Byte](1, 2, 3, 4)))
    // a valid RIFF that is not AVI (the WAV container) must also reject
    val wav = MediaCodec.encodeWav(Array.tabulate(16)(_.toByte), 8000, 1)
    intercept[IllegalArgumentException](MediaCodec.decodeVideo(9L, wav))
  }

  test("video probe: ffprobe pipe when installed, loud documented-drop otherwise") {
    if (MediaCodec.ffprobeAvailable) {
      // a WAV container proves the stdin→JSON pipe end-to-end (ffprobe
      // parses any container it knows; the plug point is format-agnostic)
      val wav = MediaCodec.encodeWav(Array.tabulate(64)(_.toByte), 8000, 1)
      val json = MediaCodec.probeVideo(1L, wav)
      assert(json.contains("format_name"), s"unexpected probe output: $json")
    } else {
      val e = intercept[IllegalStateException](
        MediaCodec.probeVideo(1L, Array[Byte](1, 2, 3)))
      assert(e.getMessage.contains("ffprobe") &&
        e.getMessage.contains("documented"),
        "absence must surface as the documented drop, never a stub result")
    }
  }
}
