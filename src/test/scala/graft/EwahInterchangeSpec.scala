package graft

import graft.functions.{BitmapCodec, EwahCodec}
import org.roaringbitmap.RoaringBitmap

/** Interchange with the reference's on-disk EWAH `array<bigint>` bitmaps
  * (GenericUDAFEWAHBitmap.java:53 via BitmapObjectOutput.java:104-112 —
  * one array element per javaewah-0.2 serialize() writeInt/writeLong call).
  *
  * The expected word streams below are HAND-ENCODED from the disassembled
  * format (EWAHCompressedBitmap.serialize + RunningLengthWord bit layout:
  * bit 0 run bit, bits 1..32 run length, bits 33..63 literal count;
  * stream = [sizeinbits, actualsizeinwords, buffer.length, words..., rlw
  * .position]) — independent of the codec under test, so encode and decode
  * are checked against the format, not against each other.
  *
  * Validated out-of-band against the REAL javaewah-0.2 jar the reference
  * bundles (scratch harness, not a build dependency: a DataInput/Output
  * shim equivalent to BitmapObjectInput/Output): every stream below
  * deserializes in javaewah to the expected bit set and survives its
  * and(); javaewah's own serialize() of {0,300} is word-for-word this
  * file's fixture ([301, 4, 4, 1<<33, 1, (3<<1)|(1<<33), 1<<44, 2]), and
  * of {0,2,64} it differs only in the allocation-size word ([65, 3, 4,
  * ...] vs our tight [65, 3, 3, ...]) which the deserializer treats as
  * capacity, covered by the alloc > actual test.
  */
class EwahInterchangeSpec extends SparkSpec {

  private def rbOf(bits: Int*): RoaringBitmap = RoaringBitmap.bitmapOf(bits: _*)

  private def bits(rb: RoaringBitmap): Seq[Int] = {
    val b = scala.collection.mutable.ArrayBuffer[Int]()
    val it = rb.getIntIterator
    while (it.hasNext) b += it.next()
    b.toSeq
  }

  // ---- decode against hand-encoded reference streams ----

  test("decode: two literal words under one marker") {
    // bits {0,2,64}: marker(run 0, 2 literals), literals 0b101 and 0b1
    val stream = Array[Long](65, 3, 3, 2L << 33, 5L, 1L, 0)
    assert(bits(EwahCodec.decode(stream)) === Seq(0, 2, 64))
  }

  test("decode: zero-run gap between markers") {
    // bits {0,300}: marker(1 literal), lit 1; marker(zero-run 3, 1 literal),
    // lit bit 44 of word 4 (300 = 4*64 + 44); last marker at buffer index 2
    val stream = Array[Long](301, 4, 4, 1L << 33, 1L, (3L << 1) | (1L << 33), 1L << 44, 2)
    assert(bits(EwahCodec.decode(stream)) === Seq(0, 300))
  }

  test("decode: ones-run fill words") {
    // bits {0..127}: one marker, run bit 1, run length 2, no literals
    val stream = Array[Long](128, 1, 1, (2L << 1) | 1L, 0)
    val rb = EwahCodec.decode(stream)
    assert(rb.getCardinality === 128)
    assert(rb.contains(0) && rb.contains(127) && !rb.contains(128))
  }

  test("decode: empty bitmap is one all-zero marker") {
    assert(EwahCodec.decode(Array[Long](0, 1, 1, 0, 0)).isEmpty)
  }

  test("decode: allocated buffer may exceed actualsizeinwords") {
    // javaewah buffers grow amortized; serialize writes buffer.length (the
    // ALLOCATION) as word [2] but only actualsizeinwords words follow
    val stream = Array[Long](65, 3, 8, 2L << 33, 5L, 1L, 0)
    assert(bits(EwahCodec.decode(stream)) === Seq(0, 2, 64))
  }

  // ---- encode against the same hand-encoded streams ----

  test("encode: literals and gaps match the hand encoding") {
    // word [2] is javaewah's buffer ALLOCATION (starts at 4, doubles)
    assert(EwahCodec.encode(rbOf(0, 2, 64)).toSeq ===
      Seq[Long](65, 3, 4, 2L << 33, 5L, 1L, 0))
    assert(EwahCodec.encode(rbOf(0, 300)).toSeq ===
      Seq[Long](301, 4, 4, 1L << 33, 1L, (3L << 1) | (1L << 33), 1L << 44, 2))
  }

  test("encode: full words become a ones-run, not 64-bit literals") {
    val rb = new RoaringBitmap(); rb.add(0L, 128L); rb.add(200)
    // marker(ones-run 2, 0 lit) then marker(zero-run 1, 1 lit): bit 8 of word 3
    assert(EwahCodec.encode(rb).toSeq ===
      Seq[Long](201, 3, 4, (2L << 1) | 1L, (1L << 1) | (1L << 33), 1L << 8, 1))
  }

  test("encode: a stray bit near 2^31 stays O(cardinality)") {
    val enc = EwahCodec.encode(rbOf(3, Int.MaxValue - 1))
    // one literal + gap markers (gap 2^25 words fits one run marker) + literal
    assert(enc.length < 12, s"dense-walk blowup: ${enc.length} words")
    assert(bits(EwahCodec.decode(enc)) === Seq(3, Int.MaxValue - 1))
  }

  // ---- round trips and SQL surface ----

  test("round trip: decode∘encode is identity on the Roaring bytes") {
    for (set <- Seq(Seq(), Seq(0), Seq(5, 6, 7), (0 until 500).map(_ * 3),
        Seq(0, 63, 64, 65, 4096), (100 to 400) ++ Seq(100000))) {
      val rb = rbOf(set: _*)
      val back = EwahCodec.decode(EwahCodec.encode(rb))
      assert(BitmapCodec.toBytes(back).toSeq === BitmapCodec.toBytes(rb).toSeq,
        s"set $set did not survive the EWAH round trip")
    }
  }

  test("SQL: ewah_encode/ewah_decode compose with the bitmap family") {
    val row = spark.sql(
      """SELECT bitmap_count(ewah_decode(ewah_encode(ewah_bitmap(id)))) AS n,
                bitmap_count(bitmap_and(ewah_decode(ewah_encode(ewah_bitmap(id))),
                                        ewah_bitmap(id * 2))) AS evens
         FROM range(0, 1000) """).head()
    assert(row.getInt(0) === 1000)
    assert(row.getInt(1) === 500) // evens 0..998 intersect 0..999
  }

  // ---- in-tree golden fixture (ADVICE r8): streams serialized by the REAL
  //      javaewah-0.2 jar the reference bundles (scratch javac/java harness
  //      against /root/reference/lib/javaewah-0.2.jar with the DataOutput
  //      shim described in the header comment; each writeInt/writeLong call
  //      = one array element, exactly BitmapObjectOutput's mapping). Pasted
  //      verbatim — these words are DATA produced by the reference's own
  //      codec, the strongest interchange evidence available offline.

  private val golden: Seq[(Seq[Int], Seq[Long])] = Seq(
    Seq(0, 2, 64) -> Seq(65L, 3L, 4L, 17179869184L, 5L, 1L, 0L),
    Seq(0, 300) -> Seq(301L, 4L, 4L, 8589934592L, 1L, 8589934598L,
      17592186044416L, 2L),
    (0 until 128) -> Seq(128L, 1L, 4L, 5L, 0L),
    Seq(5) -> Seq(6L, 2L, 4L, 8589934592L, 32L, 0L),
    Seq(63, 64, 65) -> Seq(66L, 3L, 4L, 17179869184L,
      -9223372036854775808L, 3L, 0L), // bit 63 literal: sign bit in play
    Seq(1000, 9999) -> Seq(10000L, 4L, 4L, 8589934622L, 1099511627776L,
      8589934872L, 32768L, 2L))

  test("golden: javaewah-0.2-serialized streams decode to their bit sets") {
    golden.foreach { case (want, stream) =>
      assert(bits(EwahCodec.decode(stream.toArray)) === want, s"golden $want")
    }
  }

  test("golden: encode matches javaewah word-for-word incl the alloc word") {
    golden.foreach { case (set, jar) =>
      // word-for-word INCLUDING the alloc word: encode reproduces
      // javaewah's buffer-growth rule (max(4, doubling) >= actual)
      assert(EwahCodec.encode(rbOf(set: _*)).toSeq === jar, s"golden $set")
    }
  }

  test("null array words are rejected loudly, not NPE'd (ADVICE r8)") {
    val e = intercept[Exception](
      spark.sql("SELECT ewah_decode(array(65L, CAST(NULL AS BIGINT), 3L)) AS b")
        .head())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage)).mkString(" | ")
    assert(msgs.contains("null word"), msgs)
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException](EwahCodec.decode(Array[Long](0, 1, 1, 0)))
    intercept[IllegalArgumentException]( // literal count overruns the buffer
      EwahCodec.decode(Array[Long](65, 1, 1, 9L << 33, 0)))
    intercept[IllegalArgumentException]( // rlw.position outside the buffer
      EwahCodec.decode(Array[Long](0, 1, 1, 0, 7)))
  }
}
