package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a batched per-partition decode pass — the
  * Scala/Dataset equivalent of a `mapInPandas` decode stage. Three
  * codecs, all decoded for REAL from actual bytes:
  *
  *   - IMAGE/PNG: pure byte logic + zlib, both in the JDK —
  *     [[decodePng]] validates the signature, walks the chunk stream
  *     verifying every CRC32, reads width/height from the actual IHDR
  *     bytes, inflates the IDAT pixel stream, checks the scanline
  *     layout, and aggregates decoded pixel values.
  *   - IMAGE/GIF: a second image codec with a genuinely different
  *     compression — [[decodeGif]] walks the GIF87a/89a container and
  *     implements GIF-variant LZW (9→12-bit codes, KwKwK, mid-stream
  *     clears, interlacing) from scratch; [[encodeGifPixels]] is the
  *     inverse. Cross-checked BOTH directions against
  *     `javax.imageio` (our bytes → their decoder; their bytes → ours).
  *   - AUDIO: RIFF/WAVE PCM16 is plain little-endian byte logic —
  *     [[decodeWav]] validates RIFF/WAVE magics and lengths, checks
  *     every fmt field, and folds the decoded sample stream.
  *
  * Payloads are genuine PNGs synthesized per document ([[encodePng]]):
  * an 8-bit grayscale image whose dimensions and pixels are a
  * deterministic formula of (doc_id, n_chars). That formula is the
  * oracle contract — DuckDB recomputes width/height/px_sum
  * arithmetically while Spark extracts them by actually decoding the
  * bytes, making [[mm_decode]] a hash-checked entry (the sum of
  * decoded pixels is an integer, so no float drift).
  *
  * At 100 TB the shape is unchanged: binary column in parquet, narrow
  * batched `mapPartitions` decode with memory bounded by one batch per
  * task, typed feature rows out. A codec-library decode (JPEG frames,
  * audio samples) plugs into the same seam in [[decodeFeatures]].
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_frames: Int, n_bytes: Long, px_sum: Long)

  // --------------------------------------------------- generator contract

  /** Image dimensions for a doc — the formula the DuckDB oracle
    * replays: width 16..63 from the text length, height 16..47 from
    * the id. */
  private[ops] def imageDims(docId: Long, nChars: Long): (Int, Int) =
    (16 + (nChars % 48).toInt, 16 + (docId % 32).toInt)

  /** Grayscale pixel value at (x, y) — also oracle-replayed. */
  private[ops] def pixel(docId: Long, x: Int, y: Int): Int =
    ((x * 31 + y * 17 + docId) % 256).toInt

  // ------------------------------------------------------- PNG encode

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val tb = tag.getBytes("US-ASCII")
    val out = ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(tb).put(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** A REAL standards-shaped PNG from raw grayscale pixels: signature,
    * IHDR (8-bit grayscale), one IDAT of zlib-deflated filter-0
    * scanlines, IEND — every chunk with a correct CRC32. Any PNG
    * reader decodes it. */
  private[ops] def encodePngPixels(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h, "pixel buffer does not match dimensions")
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)                          // bit depth
      .put(0.toByte)                          // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // per-scanline filter byte: 0 = None
      System.arraycopy(px, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngSignature ++ pngChunk("IHDR", ihdr.array()) ++
      pngChunk("IDAT", bos.toByteArray) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** The per-document fixture image: formula pixels (oracle contract). */
  private[ops] def encodePng(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imageDims(docId, nChars)
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(docId, x, y).toByte; x += 1 }
      y += 1
    }
    encodePngPixels(px, w, h)
  }

  // ------------------------------------------------------- PNG decode

  /** One parsed PNG image: dimensions, IDAT chunk count, decoded
    * scanlines (empty when the walk skipped inflation), and the offset
    * just past its IEND — so consecutive frames in a multi-image
    * payload can be walked. */
  private[ops] case class PngImage(width: Int, height: Int, nIdat: Int,
                                   pixels: Array[Byte], end: Int)

  /** Walk ONE (grayscale, filter-0) PNG starting at `offset`:
    * signature check, chunk walk with CRC verification of every chunk,
    * IHDR dimensions; with `inflate = true` the IDAT stream is
    * decompressed and the scanline layout validated (a real decode) —
    * with `false` only the container structure is verified, which is
    * the cheap walk frame-sampling uses to SKIP unsampled frames.
    * Throws loudly on malformed input — a decode stage must not
    * silently pass garbage. */
  private[ops] def walkPng(payload: Array[Byte], offset: Int, inflate: Boolean): PngImage = {
    require(payload.length - offset >= 8 &&
        java.util.Arrays.equals(payload, offset, offset + 8, PngSignature, 0, 8),
      "not a PNG: bad signature")
    val bb = ByteBuffer.wrap(payload)
    bb.position(offset + 8)
    var width = -1
    var height = -1
    var nIdat = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len + 8, "corrupt PNG: truncated chunk")
      val tag = new Array[Byte](4); bb.get(tag)
      val data = new Array[Byte](len); bb.get(data)
      val crcStored = bb.getInt
      val crc = new CRC32()
      crc.update(tag); crc.update(data)
      val name = new String(tag, "US-ASCII")
      require(crc.getValue.toInt == crcStored, s"corrupt PNG: bad CRC in $name chunk")
      name match {
        case "IHDR" =>
          val ib = ByteBuffer.wrap(data)
          width = ib.getInt; height = ib.getInt
          require(ib.get() == 8 && ib.get() == 0,
            "unsupported PNG: decoder handles 8-bit grayscale")
        case "IDAT" => nIdat += 1; if (inflate) idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks: skip
      }
    }
    require(done, "corrupt PNG: no IEND")
    require(width > 0 && height > 0, "corrupt PNG: no IHDR")
    val pixels =
      if (!inflate) Array.emptyByteArray
      else {
        val inf = new Inflater()
        inf.setInput(idat.toByteArray)
        val raw = new Array[Byte](height * (width + 1))
        var off = 0
        while (!inf.finished() && off < raw.length) off += inf.inflate(raw, off, raw.length - off)
        inf.end()
        require(off == raw.length, "corrupt PNG: scanline payload length mismatch")
        val px = new Array[Byte](height * width)
        var i = 0
        var y = 0
        while (y < height) {
          require(raw(i) == 0, "unsupported PNG: non-None scanline filter")
          i += 1
          System.arraycopy(raw, i, px, y * width, width)
          i += width
          y += 1
        }
        px
      }
    PngImage(width, height, nIdat, pixels, bb.position())
  }

  /** Full single-image decode: (width, height, nIdatChunks, pixelSum). */
  private[ops] def decodePng(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val img = walkPng(payload, 0, inflate = true)
    var sum = 0L
    var i = 0
    while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
    (img.width, img.height, img.nIdat, sum)
  }

  // ------------------------------------------------------- WAV encode

  /** Audio parameters for a doc — the formula the oracle replays:
    * 8 kHz mono PCM16, 500..2499 samples from the text length, sample
    * i = ((i² + doc_id·31) mod 65536) − 32768. */
  private[ops] val SampleRate = 8000
  private[ops] def audioSamples(nChars: Long): Int = 500 + ((nChars * 7) % 2000).toInt
  private[ops] def pcmSample(docId: Long, i: Int): Int =
    (((i.toLong * i + docId * 31) % 65536L) - 32768L).toInt

  /** A REAL RIFF/WAVE file: canonical 44-byte header (PCM format chunk
    * with consistent byte-rate/block-align) + little-endian 16-bit
    * samples. Any WAV reader decodes it. */
  private def wavBytes(samples: Array[Short],
                       rate: Int = SampleRate): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(rate)
      .putInt(rate * 2)                  // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  private[ops] def encodeWav(docId: Long, nChars: Long): Array[Byte] =
    wavBytes(Array.tabulate(audioSamples(nChars))(i => pcmSample(docId, i).toShort))

  // ------------------------------------------------------- WAV decode

  /** Decode a PCM16 mono WAV from its actual bytes: RIFF/WAVE
    * validation, fmt-chunk field checks (format, channels, rate,
    * block align), then the raw sample stream — returning
    * (sampleRate, samples). Throws loudly on malformed input. */
  private[ops] def decodeWavRaw(payload: Array[Byte]): (Int, Array[Short]) = {
    require(payload.length >= 44, "not a WAV: too short")
    val bb = ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a WAV: bad RIFF magic")
    val riffLen = bb.getInt
    require(riffLen == payload.length - 8, "corrupt WAV: RIFF length mismatch")
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAV: bad WAVE magic")
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val tag = new Array[Byte](4); bb.get(tag)
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len, "corrupt WAV: truncated chunk")
      new String(tag, "US-ASCII") match {
        case "fmt " =>
          require(len == 16, "unsupported WAV: non-PCM fmt chunk")
          require(bb.getShort == 1, "unsupported WAV: not PCM")
          require(bb.getShort == 1, "unsupported WAV: not mono")
          rate = bb.getInt
          bb.getInt // byte rate
          require(bb.getShort == 2, "unsupported WAV: block align != 2")
          require(bb.getShort == 16, "unsupported WAV: not 16-bit")
        case "data" =>
          require(rate > 0, "corrupt WAV: data before fmt")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ => bb.position(bb.position() + len)
      }
    }
    require(samples != null, "corrupt WAV: no data chunk")
    (rate, samples)
  }

  /** Feature view of [[decodeWavRaw]]: (rate, nSamples, sumAbs). */
  private[ops] def decodeWav(payload: Array[Byte]): (Int, Int, Long) = {
    val (rate, samples) = decodeWavRaw(payload)
    var sumAbs = 0L
    var i = 0
    while (i < samples.length) { sumAbs += math.abs(samples(i).toLong); i += 1 }
    (rate, samples.length, sumAbs)
  }

  // ------------------------------------------------- GIF encode (LZW)

  /** GIF-variant LZW compression of an 8-bit index stream (min code
    * size 8): clear/EOI codes 256/257, little-endian bit packing, code
    * width growing 9→12 as the dictionary fills, dictionary reset via
    * an explicit CLEAR when code 4096 would be assigned. The
    * dictionary keys sequences as (prefix code, next byte) — constant
    * work per input byte. Width bookkeeping mirrors the decoder
    * exactly: after assigning code v the width bumps when v ≥ 2^w
    * (encoder) ⇔ the reader bumps when its just-assigned v = 2^w − 1,
    * one code earlier in its own timeline — cross-verified both
    * directions against `javax.imageio` in MultimodalOpsSpec. */
  private[ops] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val bos = new ByteArrayOutputStream()
    var bitBuf = 0L
    var nBits = 0
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) { bos.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; nBits -= 8 }
    }
    val dict = new scala.collection.mutable.LongMap[Int]()
    var nextCode = Eoi + 1
    emit(Clear)
    var prefix = data(0) & 0xFF
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xFF
      val key = (prefix.toLong << 8) | b
      dict.get(key) match {
        case Some(code) => prefix = code
        case None =>
          emit(prefix)
          if (nextCode < 4096) {
            dict(key) = nextCode
            if (nextCode >= (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          } else {
            emit(Clear)
            dict.clear()
            nextCode = Eoi + 1
            codeSize = 9
          }
          prefix = b
      }
      i += 1
    }
    emit(prefix)
    emit(Eoi)
    if (nBits > 0) bos.write((bitBuf & 0xFF).toInt)
    bos.toByteArray
  }

  private def writeLE16(bos: ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
  }

  /** A REAL standards-shaped GIF89a from raw grayscale pixels: logical
    * screen descriptor, 256-entry grayscale global color table (entry
    * i = (i,i,i), so palette index = gray value), one non-interlaced
    * image descriptor, LZW-compressed indices in ≤255-byte sub-blocks,
    * trailer. Any GIF reader decodes it ([[javax.imageio]] asserted in
    * the spec). */
  private[ops] def encodeGifPixels(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h, "pixel buffer does not match dimensions")
    val bos = new ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    writeLE16(bos, w); writeLE16(bos, h)
    bos.write(0xF7) // global color table present, 8-bit color, 256 entries
    bos.write(0)    // background color index
    bos.write(0)    // pixel aspect ratio: none
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
    bos.write(0x2C) // image descriptor
    writeLE16(bos, 0); writeLE16(bos, 0); writeLE16(bos, w); writeLE16(bos, h)
    bos.write(0)    // no local color table, not interlaced
    bos.write(8)    // LZW minimum code size
    val lzw = lzwCompress(px)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      bos.write(n)
      bos.write(lzw, off, n)
      off += n
    }
    bos.write(0)    // block terminator
    bos.write(0x3B) // trailer
    bos.toByteArray
  }

  /** The per-document fixture GIF: the SAME formula pixels as
    * [[encodePng]], through a genuinely different codec (LZW vs
    * DEFLATE) — so [[mm_gif_decode]] shares [[mm_decode]]'s arithmetic
    * oracle. */
  private[ops] def encodeGif(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imageDims(docId, nChars)
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(docId, x, y).toByte; x += 1 }
      y += 1
    }
    encodeGifPixels(px, w, h)
  }

  // ------------------------------------------------- GIF decode (LZW)

  /** GIF-variant LZW decompression (min code size 8), the exact
    * inverse of [[lzwCompress]] including the KwKwK case (a code equal
    * to the next unassigned one) and mid-stream CLEAR resets. The
    * dictionary is two flat arrays (prefix chain + suffix byte);
    * expansion walks the chain into the output buffer back-to-front —
    * no per-code allocation. */
  private[ops] def lzwDecompress(data: Array[Byte], expected: Int): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val chainLen = new Array[Int](4096)
    var c = 0
    while (c < 256) { prefix(c) = -1; suffix(c) = c.toByte; chainLen(c) = 1; c += 1 }
    val out = new Array[Byte](expected)
    var outPos = 0
    var codeSize = 9
    var nextCode = Eoi + 1
    var bitBuf = 0L
    var nBits = 0
    var pos = 0
    var prev = -1
    def firstByte(code: Int): Byte = {
      var cc = code
      while (prefix(cc) >= 0) cc = prefix(cc)
      suffix(cc)
    }
    def writeChain(code: Int, extra: Int): Unit = {
      val len = chainLen(code) + (if (extra >= 0) 1 else 0)
      require(outPos + len <= expected, "corrupt GIF: more pixels than the image holds")
      var i = outPos + len - 1
      if (extra >= 0) { out(i) = extra.toByte; i -= 1 }
      var cc = code
      while (cc >= 0) { out(i) = suffix(cc); i -= 1; cc = prefix(cc) }
      outPos += len
    }
    var done = false
    while (!done) {
      while (nBits < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xFFL) << nBits
        pos += 1
        nBits += 8
      }
      require(nBits >= codeSize, "corrupt GIF: LZW stream truncated before EOI")
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      nBits -= codeSize
      if (code == Clear) {
        nextCode = Eoi + 1
        codeSize = 9
        prev = -1
      } else if (code == Eoi) {
        done = true
      } else if (prev < 0) {
        require(code < 256, "corrupt GIF: first code after clear must be a literal")
        writeChain(code, -1)
        prev = code
      } else {
        require(code < nextCode || code == nextCode,
          s"corrupt GIF: code $code beyond dictionary ($nextCode)")
        if (code < nextCode) writeChain(code, -1)
        else writeChain(prev, firstByte(prev) & 0xFF) // KwKwK: prev + first(prev)
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = if (code < nextCode) firstByte(code) else firstByte(prev)
          chainLen(nextCode) = chainLen(prev) + 1
          if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
          nextCode += 1
        }
        prev = code
      }
    }
    require(outPos == expected, s"corrupt GIF: decoded $outPos of $expected pixels")
    out
  }

  /** Row order of a GIF interlaced image: four passes at strides
    * 8/8/4/2 starting at rows 0/4/2/1 — the decoded stream stores rows
    * in pass order. */
  private def interlaceRows(h: Int): Array[Int] =
    Array((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (start, step) =>
      start until h by step
    }

  /** Walk ONE GIF: header + logical screen descriptor, global color
    * table, any extension blocks (skipped structurally), the image
    * descriptor (interlaced or not — `javax.imageio` writes interlaced
    * by default, so the de-interlace path is exercised against foreign
    * bytes in the spec), LZW sub-blocks → decompressed palette indices
    * → grayscale values via the color table (validated r=g=b). Returns
    * (width, height, row-major gray pixels). Throws loudly on
    * malformed input like [[walkPng]]. */
  private[ops] def decodeGifGray(payload: Array[Byte]): (Int, Int, Array[Byte]) = try {
    require(payload.length >= 13, "not a GIF: too short")
    val header = new String(payload, 0, 6, "US-ASCII")
    require(header == "GIF89a" || header == "GIF87a", s"not a GIF: header $header")
    val bb = ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(6)
    bb.getShort; bb.getShort // logical screen w/h (per-image descriptor rules)
    val packed = bb.get() & 0xFF
    bb.get(); bb.get()       // background index, aspect ratio
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      palette = new Array[Byte](3 * (2 << (packed & 7)))
      bb.get(palette)
    }
    var result: (Int, Int, Array[Byte]) = null
    var done = false
    while (!done) {
      require(bb.remaining() > 0, "corrupt GIF: no trailer")
      (bb.get() & 0xFF) match {
        case 0x3B => done = true // trailer
        case 0x21 =>             // extension: label + sub-blocks, skip
          bb.get()
          var n = bb.get() & 0xFF
          while (n != 0) { bb.position(bb.position() + n); n = bb.get() & 0xFF }
        case 0x2C =>             // image descriptor
          require(result == null, "unsupported GIF: multiple images")
          bb.getShort; bb.getShort // left, top
          val w = bb.getShort & 0xFFFF
          val h = bb.getShort & 0xFFFF
          val ipacked = bb.get() & 0xFF
          val interlaced = (ipacked & 0x40) != 0
          var table = palette
          if ((ipacked & 0x80) != 0) {
            table = new Array[Byte](3 * (2 << (ipacked & 7)))
            bb.get(table)
          }
          require(table != null, "corrupt GIF: no color table")
          val minCode = bb.get() & 0xFF
          require(minCode == 8, s"unsupported GIF: LZW min code size $minCode")
          val lzw = new ByteArrayOutputStream()
          var n = bb.get() & 0xFF
          while (n != 0) {
            val chunk = new Array[Byte](n)
            bb.get(chunk)
            lzw.write(chunk)
            n = bb.get() & 0xFF
          }
          val idx = lzwDecompress(lzw.toByteArray, w * h)
          val gray = new Array[Byte](w * h)
          val rowOf: Int => Int =
            if (interlaced) { val order = interlaceRows(h); order(_) } else identity
          var srcRow = 0
          while (srcRow < h) {
            val y = rowOf(srcRow)
            var x = 0
            while (x < w) {
              val pi = idx(srcRow * w + x) & 0xFF
              require(3 * pi + 2 < table.length, "corrupt GIF: index beyond palette")
              val r = table(3 * pi) & 0xFF
              require(r == (table(3 * pi + 1) & 0xFF) && r == (table(3 * pi + 2) & 0xFF),
                "unsupported GIF: non-grayscale palette entry")
              gray(y * w + x) = r.toByte
              x += 1
            }
            srcRow += 1
          }
          result = (w, h, gray)
        case other => throw new IllegalArgumentException(
          f"corrupt GIF: unknown block 0x$other%02x")
      }
    }
    require(result != null, "corrupt GIF: no image block")
    result
  } catch {
    case _: java.nio.BufferUnderflowException | _: IndexOutOfBoundsException =>
      throw new IllegalArgumentException("corrupt GIF: truncated")
  }

  /** Full single-image decode: (width, height, pixelSum). */
  private[ops] def decodeGif(payload: Array[Byte]): (Int, Int, Long) = {
    val (w, h, gray) = decodeGifGray(payload)
    var sum = 0L
    var i = 0
    while (i < gray.length) { sum += gray(i) & 0xFF; i += 1 }
    (w, h, sum)
  }

  // ----------------------------------------------------------- tables

  /** documents → opaque media table (doc_id, mime, payload binary):
    * the pure binary-column plumbing facet, payload = UTF-8 text bytes
    * so the metadata query stays DuckDB-oracle-checkable. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        lit("application/octet-stream").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))

  /** documents → genuine PNG media table: one real encoded image per
    * doc. Synthesis is per-partition imperative byte work (exactly what
    * a Dataset map is for — there is no SQL expression for deflate). */
  def pngTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) => MediaRecord(id, "image/png", encodePng(id, n)) }
      .toDF()
  }

  /** documents → genuine GIF media table: one real LZW-compressed
    * image per doc. */
  def gifTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) => MediaRecord(id, "image/gif", encodeGif(id, n)) }
      .toDF()
  }

  /** documents → genuine WAV media table: one real PCM16 audio clip
    * per doc. */
  def wavTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) => MediaRecord(id, "audio/wav", encodeWav(id, n)) }
      .toDF()
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Int,
                           duration_ms: Long, sum_abs: Long)

  /** Batched per-partition audio decode — same mapPartitions seam as
    * the image path, different codec. */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (rate, n, sumAbs) = decodeWav(r.payload)
            AudioFeatures(r.doc_id, rate, n, n.toLong * 1000L / rate, sumAbs)
          }
        }
      }
  }

  /** Batched per-partition decode: the mapInPandas shape. Batches of
    * `batchSize` amortize per-batch setup (a real codec/model init
    * would live at the batch boundary); memory is bounded by one batch
    * of payloads per task, never the partition. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would go here (decoder init, model load)
          batch.iterator.map { r =>
            val (w, h, frames, pxSum) = decodePng(r.payload)
            MediaFeatures(r.doc_id, w, h, frames, r.payload.length.toLong, pxSum)
          }
        }
      }
  }

  // ---------------------------------------------------------- queries

  /** Binary metadata pass — size + content hash straight off the
    * binary column (codegen'd, no decode involved), oracle-checked. */
  val mm_binary_meta: Q = (s, d) =>
    mediaTable(s, d)
      .select(col("doc_id"), col("mime"),
        length(col("payload")).as("n_bytes"),
        substring(sha2(col("payload"), 256), 1, 16).as("hash16"))
      .orderBy(col("doc_id"))

  /** The REAL decode pipeline end-to-end: genuine PNG bytes → chunk
    * walk → inflate → decoded features. Hash-checked: the oracle
    * recomputes width/height/px_sum from the generator formula, Spark
    * extracts them by decoding the actual image. (n_bytes is excluded
    * from the checked projection — it depends on deflate's compressed
    * size, which SQL cannot replay; the spec covers it.) */
  val mm_decode: Q = (s, d) =>
    decodeFeatures(pngTable(s, d)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"), col("px_sum"))
      .orderBy(col("doc_id"))

  case class GifFeatures(doc_id: Long, width: Int, height: Int, px_sum: Long)

  /** The THIRD modality codec at the same seam: genuine GIF bytes →
    * header/palette walk → LZW decompression → palette-mapped pixels.
    * Same formula pixels as [[mm_decode]] through a genuinely
    * different compression (LZW vs DEFLATE), so the arithmetic oracle
    * is shared; cross-codec parity against `javax.imageio` is asserted
    * in MultimodalOpsSpec. */
  val mm_gif_decode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    gifTable(s, d).select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            val (w, h, sum) = decodeGif(r.payload)
            GifFeatures(r.doc_id, w, h, sum)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** The REAL audio decode pipeline: genuine WAV bytes → RIFF chunk
    * walk → PCM samples → decoded features. Hash-checked like
    * [[mm_decode]]: the oracle recomputes rate/samples/duration and the
    * integer sum of absolute amplitudes from the generator formula. */
  val mm_audio_decode: Q = (s, d) =>
    decodeAudio(wavTable(s, d)).toDF()
      .orderBy(col("doc_id"))

  case class ResizedFeatures(doc_id: Long, width: Int, height: Int, px_sum: Long)

  /** Decode → RESIZE → re-encode → re-decode, every step on real
    * bytes: nearest-neighbor ½× downscale of the decoded pixels
    * (out(x,y) = in(2x, 2y), w' = ⌈w/2⌉), re-encoded as a genuine PNG
    * and decoded AGAIN, so the emitted features prove the whole loop.
    * Hash-checked: the oracle evaluates the same nearest-neighbor
    * formula arithmetically. */
  val mm_resize: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    pngTable(s, d).select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            val img = walkPng(r.payload, 0, inflate = true)
            val (w2, h2) = ((img.width + 1) / 2, (img.height + 1) / 2)
            val out = new Array[Byte](w2 * h2)
            var y = 0
            while (y < h2) {
              var x = 0
              while (x < w2) {
                out(y * w2 + x) = img.pixels(2 * y * img.width + 2 * x)
                x += 1
              }
              y += 1
            }
            val (rw, rh, _, rsum) = decodePng(encodePngPixels(out, w2, h2))
            ResizedFeatures(r.doc_id, rw, rh, rsum)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- frame sampling

  /** Frames per doc in the multi-frame payload (1..4). */
  private[ops] def frameCount(docId: Long): Int = 1 + (docId % 4).toInt
  private val FrameSeed = 1000003L

  /** A multi-frame media payload: [[frameCount]] genuine PNGs
    * concatenated back-to-back — the moral equivalent of an animation
    * container. Every frame shares the doc's dimensions (as real
    * animation frames do); frame k's PIXELS use the formula seeded
    * with doc_id + k·FrameSeed. */
  private[ops] def encodeFrames(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imageDims(docId, nChars)
    val bos = new ByteArrayOutputStream()
    var k = 0
    while (k < frameCount(docId)) {
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = pixel(docId + k * FrameSeed, x, y).toByte; x += 1 }
        y += 1
      }
      bos.write(encodePngPixels(px, w, h))
      k += 1
    }
    bos.toByteArray
  }

  case class FrameSampleFeatures(doc_id: Long, n_frames: Int, n_sampled: Int,
                                 sampled_px_sum: Long)

  /** FRAME-SAMPLE over the multi-frame payload: walk the container,
    * fully decoding only every SECOND frame — unsampled frames get the
    * cheap structural walk (chunk lengths + CRCs, no inflate), which is
    * exactly how production frame-sampling avoids paying full decode
    * for dropped frames. Hash-checked via the formula oracle. */
  val mm_frame_sample: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) => MediaRecord(id, "video/x-png-frames", encodeFrames(id, n)) }
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            var offset = 0
            var k = 0
            var sampled = 0
            var sum = 0L
            while (offset < r.payload.length) {
              val takeThis = k % 2 == 0
              val img = walkPng(r.payload, offset, inflate = takeThis)
              if (takeThis) {
                sampled += 1
                var i = 0
                while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
              }
              offset = img.end
              k += 1
            }
            FrameSampleFeatures(r.doc_id, k, sampled, sum)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  case class ResampledAudio(doc_id: Long, out_rate: Int, n_out: Int,
                            duration_ms: Long, sum_abs: Long)

  /** AUDIO RESAMPLING (8 kHz → 4 kHz by 2:1 decimation) — the sample-
    * rate normalization every audio corpus runs before feature
    * extraction: decode the real WAV, keep every second sample,
    * RE-ENCODE as a genuine 4 kHz RIFF/WAVE (header byte-rate and all),
    * and decode that — so the witness certifies the full
    * decode → transform → encode → decode loop on bytes the first
    * decoder never saw, the same round-trip discipline as
    * [[mm_resize]]. (Production decimation low-pass-filters first;
    * pure decimation keeps the arithmetic integer-exact so the oracle
    * can replay every output sample from the PCM generator formula.)
    * Batched `mapPartitions`; memory is one batch of clips per task. */
  val mm_audio_resample: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    wavTable(s, d).select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            val (rate, samples) = decodeWavRaw(r.payload)
            val out = Array.tabulate((samples.length + 1) / 2)(j => samples(2 * j))
            val re = wavBytes(out, rate / 2)
            val (rate2, n2, sumAbs2) = decodeWav(re)
            ResampledAudio(r.doc_id, rate2, n2, n2.toLong * 1000L / rate2, sumAbs2)
          }
        }
      }.toDF().orderBy(col("doc_id"))
  }

  // --------------------------------------------------- scene-cut detection

  /** Scene length of [[mm_scene_cut]]'s planted footage: alternates by
    * `(id / 4) % 2` — INDEPENDENT of the frame-count residue `id % 4`,
    * so every (frames, scene-length) combination occurs and the corpus
    * carries all three classes: multi-frame zero-cut docs (one scene),
    * boundary-only cuts, and every-pair cuts. */
  private[ops] def sceneLen(docId: Long): Int = 1 + ((docId / 4) % 2).toInt

  /** Multi-frame payload with PLANTED SCENE STRUCTURE: frames inside a
    * scene are pixel-identical (seeded by the scene index), a scene
    * change re-seeds — consecutive-frame deltas are exactly 0 within a
    * scene and large at a boundary, so the detector's threshold is
    * meaningfully load-bearing rather than always-firing. */
  private[ops] def encodeScenes(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imageDims(docId, nChars)
    val bos = new ByteArrayOutputStream()
    var k = 0
    while (k < frameCount(docId)) {
      val scene = k / sceneLen(docId)
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = pixel(docId + scene * FrameSeed, x, y).toByte; x += 1
        }
        y += 1
      }
      bos.write(encodePngPixels(px, w, h))
      k += 1
    }
    bos.toByteArray
  }

  case class SceneCuts(doc_id: Long, n_frames: Int, n_cuts: Int,
                       first_cut: Int, total_delta: Long)

  /** SCENE-CUT DETECTION over real multi-frame payloads — the video
    * curation step that picks keyframe boundaries: decode every frame
    * (genuine PNG walk + inflate), difference consecutive frames
    * pixel-by-pixel, and declare a cut where the absolute-delta sum
    * exceeds 10·w·h (mean per-pixel change > 10 — within-scene deltas
    * are exactly 0 here, boundary deltas average ~99, so the threshold
    * separates them with a wide margin). Work is one sequential frame
    * walk per doc inside batched `mapPartitions` — docs parallelize
    * across tasks, memory is two frames per task, nothing shuffles but
    * the per-doc summary row. The oracle recomputes every per-pixel
    * |difference| arithmetically from the generator formula, so cuts,
    * first-cut index AND the exact total delta are hash-pinned. */
  val mm_scene_cut: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) => MediaRecord(id, "video/x-png-frames", encodeScenes(id, n)) }
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            var offset = 0
            var k = 0
            var nCuts = 0
            var firstCut = -1
            var totalDelta = 0L
            var prev: Array[Byte] = null
            var wh = 0L
            while (offset < r.payload.length) {
              val img = walkPng(r.payload, offset, inflate = true)
              wh = img.width.toLong * img.height
              if (prev != null) {
                var deltaSum = 0L
                var i = 0
                while (i < img.pixels.length) {
                  deltaSum += math.abs((img.pixels(i) & 0xFF) - (prev(i) & 0xFF))
                  i += 1
                }
                totalDelta += deltaSum
                if (deltaSum > 10L * wh) {
                  nCuts += 1
                  if (firstCut < 0) firstCut = k
                }
              }
              prev = img.pixels
              offset = img.end
              k += 1
            }
            SceneCuts(r.doc_id, k, nCuts, firstCut, totalDelta)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------ perceptual-hash dedup

  /** Hamming threshold and band count of the 64-bit dHash LSH. */
  private[ops] val PhashK = 3
  private val PhashBands = 4
  private[ops] val BrightOffset = 400000L
  private[ops] val SpotOffset = 800000L

  /** 64-bit difference hash over a decoded grayscale image: sample a
    * 9×8 point grid (x_c = c·w/9, y_r = r·h/8, floor division) and set
    * bit r·8+c when the left sample exceeds its right neighbor. The
    * gradient-sign encoding is what makes it PERCEPTUAL: a global
    * brightness/contrast shift moves both samples together and leaves
    * every bit unchanged, so a re-encoded brightened copy — whose
    * BYTES and content hash are completely different — collides. */
  private[ops] def dHash64(px: Array[Byte], w: Int, h: Int): Long = {
    var hash = 0L
    var r = 0
    while (r < 8) {
      val y = r * h / 8
      var c = 0
      while (c < 8) {
        val pa = px(y * w + c * w / 9) & 0xFF
        val pb = px(y * w + (c + 1) * w / 9) & 0xFF
        if (pa > pb) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Corpus with planted perceptual near-dups, every variant built by
    * DECODING the original PNG, transforming real pixels, and
    * re-encoding: a +2 brightness shift for doc_id % 5 == 0 (dHash-
    * invariant — hamming 0 — yet byte-distinct) and a +100 spot
    * change at one sampled grid point for doc_id % 7 == 0 (flips a
    * couple of gradient signs — hamming 1..2, the banded-match path). */
  private[ops] def phashCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .flatMap { case (id, n) =>
        val orig = encodePng(id, n)
        val base = Seq(MediaRecord(id, "image/png", orig))
        val bright = if (id % 5 == 0) {
          val img = walkPng(orig, 0, inflate = true)
          val out = img.pixels.map(b => math.min((b & 0xFF) + 2, 255).toByte)
          Seq(MediaRecord(id + BrightOffset, "image/png",
            encodePngPixels(out, img.width, img.height)))
        } else Nil
        val spot = if (id % 7 == 0) {
          val img = walkPng(orig, 0, inflate = true)
          val out = img.pixels.clone()
          val idx = (2 * img.height / 8) * img.width + 3 * img.width / 9
          out(idx) = math.min((out(idx) & 0xFF) + 100, 255).toByte
          Seq(MediaRecord(id + SpotOffset, "image/png",
            encodePngPixels(out, img.width, img.height)))
        } else Nil
        base ++ bright ++ spot
      }.toDF()
  }

  /** Image near-dup pairs at hamming ≤ [[PhashK]] over the dHash of
    * every DECODED image, found through banded LSH: the 64-bit hash
    * splits into 4 × 16-bit bands, candidates come from an EQUI-join
    * on (band, key) — pigeonhole-complete for hamming ≤ 3, never
    * all-pairs — and survivors are verified with the codegen'd
    * `bit_count(xor)`. The DuckDB oracle recomputes every hash
    * arithmetically from the pixel formula and runs the EXHAUSTIVE
    * pair scan, so the hash match proves both the real-bytes decode →
    * dHash pipeline and the completeness of the banding. At 100 TB
    * this is image dedup without a pixel ever crossing the shuffle:
    * only (doc_id, 64-bit hash) rows move. */
  val mm_phash_dedup: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val hashes = phashCorpus(s, d).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map { r =>
          val img = walkPng(r.payload, 0, inflate = true)
          (r.doc_id, dHash64(img.pixels, img.width, img.height))
        })
      }.toDF("doc_id", "phash")
    val bands = hashes.select(col("doc_id"), col("phash"),
        explode(array((0 until PhashBands).map(b =>
          struct(lit(b).as("b"),
            shiftrightunsigned(col("phash"), 16 * b)
              .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.b").as("b"), col("bk.key").as("key"))
    val left = bands.select(col("b"), col("key"),
      col("doc_id").as("id_a"), col("phash").as("ha"))
    val right = bands.select(col("b"), col("key"),
      col("doc_id").as("id_b"), col("phash").as("hb"))
    left.join(right, Seq("b", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("ham"))
      .distinct()
      .filter(col("ham") <= PhashK)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------- audio fingerprint matching

  /** Frame length (samples), band count, planted-variant id offset,
    * and the minimum clip length (frames) a match must span — short
    * fingerprints carry too few bits to be evidence, exactly as in
    * production audio identification. */
  private[ops] val FpFrame = 250
  private[ops] val FpBands = 4
  private[ops] val ClipOffset = 1600000L
  private[ops] val MinClipFrames = 5

  /** Haitsma–Kalker-style audio fingerprint, integer-exact: the PCM
    * splits into [[FpFrame]]-sample frames, each frame's energy lands
    * in [[FpBands]] interleaved bands (E(f,b) = Σ|s| over in-frame
    * positions ≡ b mod 4 — all integer sums, so the oracle replays
    * them exactly), and bit (f−1)·4+b is set when band b's energy
    * ROSE from frame f−1 to f. The sign-of-change encoding is what
    * makes it a fingerprint: any monotone amplitude scaling preserves
    * every comparison, while the bits still track the signal's
    * temporal structure. Returns (nFrames, packed bits ≤ 36, and the
    * frame-major flattened band-energy sequence the verify step
    * compares exactly). */
  private[ops] def audioFingerprint(samples: Array[Short]): (Int, Long, Array[Long]) = {
    val nf = samples.length / FpFrame
    val e = Array.ofDim[Long](nf, FpBands)
    var f = 0
    while (f < nf) {
      var j = 0
      while (j < FpFrame) {
        e(f)(j % FpBands) += math.abs(samples(f * FpFrame + j).toLong)
        j += 1
      }
      f += 1
    }
    var fp = 0L
    f = 1
    while (f < nf) {
      var b = 0
      while (b < FpBands) {
        if (e(f)(b) > e(f - 1)(b)) fp |= 1L << ((f - 1) * FpBands + b)
        b += 1
      }
      f += 1
    }
    (nf, fp, e.flatten)
  }

  /** A real WAV whose PCM is the original's with the FIRST FRAME
    * dropped — the planted "same recording, offset start" variant
    * (byte-distinct, duration-distinct, content-identical from sample
    * 250 on). */
  private[ops] def encodeWavClipped(docId: Long, nChars: Long): Array[Byte] =
    wavBytes(Array.tabulate(audioSamples(nChars) - FpFrame)(i =>
      pcmSample(docId, i + FpFrame).toShort))

  /** WAV corpus with planted clipped variants for doc_id % 6 == 0. */
  private[ops] def audioFpCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .flatMap { case (id, n) =>
        val base = Seq(MediaRecord(id, "audio/wav", encodeWav(id, n)))
        val clip =
          if (id % 6 == 0)
            Seq(MediaRecord(id + ClipOffset, "audio/wav", encodeWavClipped(id, n)))
          else Nil
        base ++ clip
      }.toDF()
  }

  /** AUDIO IDENTIFICATION BY SUB-FINGERPRINT SHIFT MATCHING — the
    * audio sibling of [[mm_phash_dedup]]: every clip's fingerprint is
    * computed from its REAL WAV bytes (decode → frame → band energies
    * → change bits), and "b is a one-frame-offset copy of a" becomes
    * a pure EQUI-JOIN: fp_b = fp_a >> [[FpBands]] with one fewer
    * frame, because dropping the first frame shifts the change-bit
    * sequence by exactly one frame's worth of bits. The join is the
    * CANDIDATE stage (the change bits are a lossy sketch — on this
    * low-entropy synthetic signal they collide often, as weak
    * fingerprints do on silence-heavy audio in production); survivors
    * are VERIFIED by exact equality of the shifted band-energy
    * sequence — the same candidates-then-verify shape as
    * [[mm_phash_dedup]]'s banded LSH. Matches must span at least
    * [[MinClipFrames]] frames, the minimum-overlap rule of production
    * matchers. The DuckDB oracle recomputes every band energy
    * arithmetically from the PCM formula and replays both stages, so
    * the hash match proves the real-bytes decode pipeline AND the
    * shift-match algebra. At 100 TB, only (doc_id, nf, fp, nf·4
    * energy longs) rows ever shuffle — audio identification without
    * a sample crossing the wire. */
  val mm_audio_fingerprint: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val fps = audioFpCorpus(s, d).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.iterator.map { r =>
          val (_, samples) = decodeWavRaw(r.payload)
          val (nf, fp, earr) = audioFingerprint(samples)
          (r.doc_id, nf, fp, earr)
        })
      }.toDF("doc_id", "nf", "fp", "earr")
    val left = fps.filter(col("nf") >= MinClipFrames + 1)
      .select(col("doc_id").as("id_a"), (col("nf") - 1).as("nf_m"),
        shiftrightunsigned(col("fp"), FpBands).as("fp_m"),
        slice(col("earr"), lit(FpBands + 1),
          (col("nf") - 1) * lit(FpBands)).as("ea_tail"))
    val right = fps.filter(col("nf") >= MinClipFrames)
      .select(col("doc_id").as("id_b"), col("nf").as("nf_m"),
        col("fp").as("fp_m"), col("earr").as("eb"))
    left.join(right, Seq("nf_m", "fp_m"))
      .filter(col("id_a") =!= col("id_b") && col("ea_tail") === col("eb"))
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "mm_audio_fingerprint" -> mm_audio_fingerprint,
    "mm_binary_meta" -> mm_binary_meta,
    "mm_decode" -> mm_decode,
    "mm_gif_decode" -> mm_gif_decode,
    "mm_audio_decode" -> mm_audio_decode,
    "mm_resize" -> mm_resize,
    "mm_frame_sample" -> mm_frame_sample,
    "mm_scene_cut" -> mm_scene_cut,
    "mm_audio_resample" -> mm_audio_resample,
    "mm_phash_dedup" -> mm_phash_dedup,
  )

  val oracles: Map[String, String] = Map(
    // recompute every band energy arithmetically from the PCM formula
    // (orig + clipped variants via the generator-index offset), pack
    // the change bits, and replay the same shift-match equi-join.
    // SUM of shifted BIGINTs is HUGEINT — folded back to BIGINT (fp
    // is ≤ 36 bits, so no sign subtlety).
    "mm_audio_fingerprint" ->
      s"""WITH p AS (SELECT doc_id, 500 + (n_chars * 7) % 2000 AS n FROM documents),
         |w AS (
         |  SELECT doc_id AS id, doc_id AS src, 0 AS off, n FROM p
         |  UNION ALL
         |  SELECT doc_id + $ClipOffset, doc_id, $FpFrame, n - $FpFrame
         |  FROM p WHERE doc_id % 6 = 0),
         |e AS (
         |  SELECT w.id, w.n // $FpFrame AS nf, f.f AS f, b.b AS b,
         |    list_sum(list_transform(generate_series(b.b, ${FpFrame - 1}, $FpBands),
         |      j -> abs((((w.off + f.f * $FpFrame + j) * (w.off + f.f * $FpFrame + j)
         |                 + w.src * 31) % 65536) - 32768))) AS en
         |  FROM w, generate_series(0, 9) AS f(f), generate_series(0, ${FpBands - 1}) AS b(b)
         |  WHERE f.f < w.n // $FpFrame),
         |bits AS (
         |  SELECT a.id,
         |    CAST(SUM(CASE WHEN a.en > prev.en
         |      THEN CAST(1 AS BIGINT) << ((a.f - 1) * $FpBands + a.b)
         |      ELSE 0 END) AS BIGINT) AS fp
         |  FROM e a JOIN e prev
         |    ON a.id = prev.id AND a.b = prev.b AND prev.f = a.f - 1
         |  GROUP BY a.id),
         |earr AS (
         |  SELECT id, list(en ORDER BY f, b) AS ea FROM e GROUP BY id),
         |fp AS (
         |  SELECT w.id, w.n // $FpFrame AS nf, COALESCE(b.fp, 0) AS fp, earr.ea
         |  FROM w LEFT JOIN bits b ON w.id = b.id
         |  JOIN earr ON w.id = earr.id)
         |SELECT a.id AS id_a, c.id AS id_b
         |FROM fp a JOIN fp c
         |  ON c.nf = a.nf - 1 AND c.fp = (a.fp >> $FpBands) AND c.id <> a.id
         |WHERE a.nf >= ${MinClipFrames + 1}
         |  AND c.ea = a.ea[${FpBands + 1}:]
         |ORDER BY id_a, id_b""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  substr(sha256(text), 1, 16) AS hash16
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode" ->
      """SELECT doc_id,
        |  CAST(16 + (n_chars % 48) AS INTEGER) AS width,
        |  CAST(16 + (doc_id % 32) AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS n_frames,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, (16 + (doc_id % 32)) - 1),
        |    y -> list_transform(generate_series(0, (16 + (n_chars % 48)) - 1),
        |      x -> (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT) AS px_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_gif_decode" ->
      """SELECT doc_id,
        |  CAST(16 + (n_chars % 48) AS INTEGER) AS width,
        |  CAST(16 + (doc_id % 32) AS INTEGER) AS height,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, (16 + (doc_id % 32)) - 1),
        |    y -> list_transform(generate_series(0, (16 + (n_chars % 48)) - 1),
        |      x -> (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT) AS px_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_audio_decode" ->
      """WITH p AS (SELECT doc_id, 500 + (n_chars * 7) % 2000 AS n FROM documents)
        |SELECT doc_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> abs(((i * i + doc_id * 31) % 65536) - 32768))) AS BIGINT) AS sum_abs
        |FROM p ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH p AS (SELECT doc_id,
        |    (16 + (n_chars % 48) + 1) // 2 AS w2,
        |    (16 + (doc_id % 32) + 1) // 2 AS h2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(w2 AS INTEGER) AS width, CAST(h2 AS INTEGER) AS height,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, h2 - 1),
        |    y -> list_transform(generate_series(0, w2 - 1),
        |      x -> (2 * x * 31 + 2 * y * 17 + doc_id) % 256)))) AS BIGINT) AS px_sum
        |FROM p ORDER BY doc_id""".stripMargin,
    // every surviving sample replayed from the PCM generator formula
    // at the decimated indices; duration via the same integer division
    "mm_audio_resample" ->
      """WITH p AS (SELECT doc_id, 500 + ((n_chars * 7) % 2000) AS n FROM documents)
        |SELECT doc_id,
        |  CAST(4000 AS INTEGER) AS out_rate,
        |  CAST((n + 1) // 2 AS INTEGER) AS n_out,
        |  CAST(((n + 1) // 2) * 1000 // 4000 AS BIGINT) AS duration_ms,
        |  CAST(list_sum(list_transform(generate_series(0, (n + 1) // 2 - 1),
        |    j -> abs(((2 * j) * (2 * j) + doc_id * 31) % 65536 - 32768))) AS BIGINT)
        |    AS sum_abs
        |FROM p ORDER BY doc_id""".stripMargin,
    // per-pair pixel |differences| recomputed from the scene-seeded
    // generator formula: cuts, first-cut index AND exact total delta
    "mm_scene_cut" -> {
      def delta(f: String) =
        s"""list_sum(flatten(list_transform(generate_series(0, h - 1),
           |        y -> list_transform(generate_series(0, w - 1),
           |          x -> abs(((x * 31 + y * 17 + doc_id + (($f // slen)) * 1000003) % 256)
           |                 - ((x * 31 + y * 17 + doc_id + ((($f - 1) // slen)) * 1000003) % 256))))))""".stripMargin
      s"""WITH p AS (SELECT doc_id,
         |    1 + (doc_id % 4) AS k, 1 + ((doc_id // 4) % 2) AS slen,
         |    16 + (n_chars % 48) AS w, 16 + (doc_id % 32) AS h
         |  FROM documents),
         |d AS (SELECT doc_id, k, slen, w, h,
         |    list_transform(generate_series(1, k - 1), f -> ${delta("f")}) AS deltas
         |  FROM p)
         |SELECT doc_id, CAST(k AS INTEGER) AS n_frames,
         |  CAST(len(list_filter(deltas, dd -> dd > 10 * w * h)) AS INTEGER) AS n_cuts,
         |  CAST(COALESCE(list_filter(generate_series(1, k - 1),
         |    f -> ${delta("f")} > 10 * w * h)[1], -1) AS INTEGER) AS first_cut,
         |  CAST(COALESCE(list_sum(deltas), 0) AS BIGINT) AS total_delta
         |FROM d ORDER BY doc_id""".stripMargin
    },
    "mm_frame_sample" ->
      """WITH p AS (SELECT doc_id,
        |    1 + (doc_id % 4) AS k,
        |    16 + (n_chars % 48) AS w,
        |    16 + (doc_id % 32) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(k AS INTEGER) AS n_frames,
        |  CAST((k + 1) // 2 AS INTEGER) AS n_sampled,
        |  CAST(list_sum(flatten(flatten(
        |    list_transform(list_filter(generate_series(0, k - 1), f -> f % 2 = 0),
        |      f -> list_transform(generate_series(0, h - 1),
        |        y -> list_transform(generate_series(0, w - 1),
        |          x -> (x * 31 + y * 17 + doc_id + f * 1000003) % 256)))))) AS BIGINT)
        |    AS sampled_px_sum
        |FROM p ORDER BY doc_id""".stripMargin,
    // recompute every dHash arithmetically from the pixel formula (with
    // the same planted brightness/spot variants), then run the
    // EXHAUSTIVE hamming scan — a hash match proves the real-bytes
    // decode pipeline AND that the banded LSH loses no pair. The hash
    // accumulates in HUGEINT (bit 63 overflows a BIGINT shift) and is
    // folded to the signed 64-bit value Spark computes.
    "mm_phash_dedup" -> {
      def pv(x: String, y: String) =
        s"""CASE WHEN variant = 1 THEN least(($x * 31 + $y * 17 + base) % 256 + 2, 255)
           |         WHEN variant = 2 AND $x = (3 * w) // 9 AND $y = (2 * h) // 8
           |           THEN least(($x * 31 + $y * 17 + base) % 256 + 100, 255)
           |         ELSE ($x * 31 + $y * 17 + base) % 256 END""".stripMargin
      s"""WITH dims AS (
         |  SELECT doc_id, doc_id AS base, 0 AS variant,
         |    16 + (n_chars % 48) AS w, 16 + (doc_id % 32) AS h FROM documents
         |  UNION ALL
         |  SELECT doc_id + $BrightOffset, doc_id, 1,
         |    16 + (n_chars % 48), 16 + (doc_id % 32) FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + $SpotOffset, doc_id, 2,
         |    16 + (n_chars % 48), 16 + (doc_id % 32) FROM documents WHERE doc_id % 7 = 0),
         |grid AS (
         |  SELECT d.doc_id, d.base, d.variant, d.w, d.h, gr.r, gc.c,
         |    (gr.r * d.h) // 8 AS y, (gc.c * d.w) // 9 AS xa, ((gc.c + 1) * d.w) // 9 AS xb
         |  FROM dims d, generate_series(0, 7) AS gr(r), generate_series(0, 7) AS gc(c)),
         |bits AS (
         |  SELECT doc_id, r, c,
         |    CASE WHEN (${pv("xa", "y")})
         |            > (${pv("xb", "y")})
         |         THEN CAST(1 AS HUGEINT) << (r * 8 + c) ELSE CAST(0 AS HUGEINT) END AS bit
         |  FROM grid),
         |hashes AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN SUM(bit) >= 9223372036854775808
         |              THEN SUM(bit) - 18446744073709551616
         |              ELSE SUM(bit) END AS BIGINT) AS phash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS ham
         |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashK
         |ORDER BY id_a, id_b""".stripMargin
    },
  )
}
