package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, Multimodal}

/** Real pure-JVM media decoding: BMP (24-bit) and WAV (PCM16) parse genuine
  * binaries — headers, padding, chunk walking, pixel/sample payloads. */
class MediaCodecsSpec extends AnyFunSuite {

  test("BMP encode/decode roundtrip preserves every pixel (incl. padded odd widths)") {
    for (w <- Seq(1, 2, 3, 5, 16); h <- Seq(1, 2, 7)) {
      def rgb(x: Int, y: Int): Int = ((x * 37 + y * 101) % 255) << 16 |
        ((x * 11 + y) % 255) << 8 | ((x + y * 13) % 255)
      val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, rgb))
      assert(img.width == w && img.height == h)
      for (x <- 0 until w; y <- 0 until h)
        assert((img.argb(y * w + x) & 0xffffff) == rgb(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("BMP decode reads known hand-built pixels") {
    // 2x2: red, green / blue, white
    val px = Map((0, 0) -> 0xff0000, (1, 0) -> 0x00ff00, (0, 1) -> 0x0000ff, (1, 1) -> 0xffffff)
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(2, 2, (x, y) => px((x, y))))
    assert((img.argb(0) & 0xffffff) == 0xff0000)
    assert((img.argb(1) & 0xffffff) == 0x00ff00)
    assert((img.argb(2) & 0xffffff) == 0x0000ff)
    assert((img.argb(3) & 0xffffff) == 0xffffff)
  }

  test("resize + grayscale embedding: constant image gives constant embedding") {
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(33, 17, (_, _) => 0x808080))
    val emb = MediaCodecs.imageEmbedding(img)
    assert(emb.length == 64)
    val expected = (0x80 * (0.299 + 0.587 + 0.114) / 255.0).toFloat
    emb.foreach(v => assert(math.abs(v - expected) < 1e-6))
    // resize picks real source pixels: a half-black/half-white image
    val bw = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(16, 16,
      (x, _) => if (x < 8) 0x000000 else 0xffffff))
    val e2 = MediaCodecs.imageEmbedding(bw)
    assert(e2(0) < 0.01f && e2(7) > 0.99f)
  }

  test("WAV encode/decode roundtrip preserves samples, rate, channels") {
    val samples = Array.tabulate(500)(i => (math.sin(i / 10.0) * 20000).toShort)
    val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWav(8000, samples))
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.sameElements(samples))
  }

  test("WAV chunk walker skips unknown chunks before data") {
    val samples = Array[Short](100, -100, 200, -200)
    val base = MediaCodecs.encodeWav(16000, samples)
    // splice a LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    val spliced = base.take(fmtEnd) ++ extra.array() ++ base.drop(fmtEnd)
    val wav = MediaCodecs.decodeWav(spliced)
    assert(wav.sampleRate == 16000)
    assert(wav.samples.sameElements(samples))
  }

  test("audio features are physically sensible for a pure sine") {
    val sr = 8000
    val freq = 400.0
    val samples = Array.tabulate(8000)(i =>
      (math.sin(2 * math.Pi * freq * i / sr) * 16384).toShort)
    val f = MediaCodecs.audioFeatures(MediaCodecs.decodeWav(MediaCodecs.encodeWav(sr, samples)))
    assert(math.abs(f(0) - 1.0f) < 0.01f, s"duration ${f(0)}")
    // sine rms = amplitude/sqrt(2) = 16384/32768/1.414 ≈ 0.354
    assert(math.abs(f(1) - 0.3536f) < 0.01f, s"rms ${f(1)}")
    // zero crossings: 2 per cycle, 400 cycles/s → 800/8000 = 0.1
    assert(math.abs(f(2) - 0.1f) < 0.005f, s"zcr ${f(2)}")
    assert(f(3) > 0.49f && f(3) <= 0.51f, s"peak ${f(3)}")
  }

  test("real media table decodes end-to-end in Spark and matches driver-side decode") {
    val spark = SparkTestSession.spark
    val got = Multimodal.decodeReal(Multimodal.realMediaTable(spark, 40))
      .collect().map(_.toString).sorted
    val want = (0 until 40)
      .map(i => Multimodal.decodeRow(Multimodal.realMediaRow(i.toLong)))
      .map(t => s"[${t.productIterator.mkString(",")}]").sorted
    assert(got.length == 40)
    assert(got.sameElements(want))
  }
}
