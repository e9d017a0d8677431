package graft.operators

/** Pure-JVM decoders for the two multimodal formats a container with no
  * native codecs can still handle for real: uncompressed 24-bit BMP images
  * and 16-bit PCM WAV audio. These retire the image/audio halves of the
  * Multimodal decode stub — parsing real headers and real pixel/sample data
  * — while video (which needs a real codec) stays the documented stub slot.
  *
  * Encoders exist so fixtures and the synthetic media table are genuine
  * binary files of the format, not look-alikes.
  */
object MediaCodecs {

  // -------------------------------------------------------------- BMP image

  final case class Bmp(width: Int, height: Int, argb: Array[Int])

  /** Minimal BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit, no compression. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val c = rgb(x, y)
        b.put((c & 0xff).toByte)          // blue
        b.put(((c >> 8) & 0xff).toByte)   // green
        b.put(((c >> 16) & 0xff).toByte)  // red
        x += 1
      }
      var pad = width * 3
      while (pad % 4 != 0) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  def decodeBmp(bytes: Array[Byte]): Bmp = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOffset = b.getInt(10)
    val width = b.getInt(18)
    val heightRaw = b.getInt(22)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    require(bpp == 24 && compression == 0, s"unsupported BMP: bpp=$bpp comp=$compression")
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    val rowSize = (width * 3 + 3) / 4 * 4
    val px = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val y = if (topDown) row else height - 1 - row
      val off = dataOffset + row * rowSize
      var x = 0
      while (x < width) {
        val i = off + x * 3
        val blue = bytes(i) & 0xff
        val green = bytes(i + 1) & 0xff
        val red = bytes(i + 2) & 0xff
        px(y * width + x) = 0xff000000 | (red << 16) | (green << 8) | blue
        x += 1
      }
      row += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbor resize to (w, h) — the real "resize" op. */
  def resize(img: Bmp, w: Int, h: Int): Bmp = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        out(y * w + x) = img.argb(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Bmp(w, h, out)
  }

  /** 8×8 grayscale thumbnail as a 64-dim unit-range embedding — a real
    * image feature suitable for the ANN operators. */
  def imageEmbedding(img: Bmp, side: Int = 8): Array[Float] = {
    val small = resize(img, side, side)
    small.argb.map { c =>
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val bl = c & 0xff
      ((0.299 * r + 0.587 * g + 0.114 * bl) / 255.0).toFloat
    }
  }

  // -------------------------------------------------------------- WAV audio

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** RIFF/WAVE, PCM 16-bit mono/stereo. */
  def encodeWav(sampleRate: Int, samples: Array[Short], channels: Int = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  def decodeWav(bytes: Array[Byte]): Wav = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 && new String(bytes, 0, 4, "ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "ASCII") == "WAVE", "not a WAV")
    // walk chunks: fmt then data (other chunks skipped)
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || sampleRate == 0)) {
      val id = new String(bytes, pos, 4, "ASCII")
      val size = b.getInt(pos + 4)
      id match {
        case "fmt " =>
          require(b.getShort(pos + 8) == 1, "not PCM")
          channels = b.getShort(pos + 10)
          sampleRate = b.getInt(pos + 12)
          bits = b.getShort(pos + 22)
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = b.getShort(pos + 8 + i * 2); i += 1 }
        case _ =>
      }
      pos += 8 + size + (size & 1)
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    Wav(sampleRate, channels, samples)
  }

  /** Real audio features: duration, RMS energy, zero-crossing rate, peak. */
  def audioFeatures(w: Wav): Array[Float] = {
    val n = math.max(1, w.samples.length)
    var sumSq = 0.0
    var zc = 0
    var peak = 0
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toInt
      sumSq += s.toDouble * s
      if (i > 0 && ((s >= 0) != (w.samples(i - 1) >= 0))) zc += 1
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    Array(
      w.samples.length.toFloat / (w.sampleRate * w.channels), // seconds
      math.sqrt(sumSq / n).toFloat / 32768f,                  // rms
      zc.toFloat / n,                                         // zcr
      peak.toFloat / 32768f)
  }
}
