package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a batched per-partition decode pass — the
  * Scala/Dataset equivalent of a `mapInPandas` decode stage. Two
  * modalities, both decoded for REAL from actual bytes:
  *
  *   - IMAGE: PNG is pure byte logic + zlib, both in the JDK —
  *     [[decodePng]] validates the signature, walks the chunk stream
  *     verifying every CRC32, reads width/height from the actual IHDR
  *     bytes, inflates the IDAT pixel stream, checks the scanline
  *     layout, and aggregates decoded pixel values.
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
  private[ops] def encodeWav(docId: Long, nChars: Long): Array[Byte] = {
    val n = audioSamples(nChars)
    val dataLen = n * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(pcmSample(docId, i).toShort); i += 1 }
    bb.array()
  }

  // ------------------------------------------------------- WAV decode

  /** Decode a PCM16 mono WAV from its actual bytes: RIFF/WAVE
    * validation, fmt-chunk field checks (format, channels, rate,
    * block align), then the sample stream — returning
    * (sampleRate, nSamples, sumAbsAmplitude). Throws loudly on
    * malformed input. */
  private[ops] def decodeWav(payload: Array[Byte]): (Int, Int, Long) = {
    require(payload.length >= 44, "not a WAV: too short")
    val bb = ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a WAV: bad RIFF magic")
    val riffLen = bb.getInt
    require(riffLen == payload.length - 8, "corrupt WAV: RIFF length mismatch")
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAV: bad WAVE magic")
    var rate = -1
    var nSamples = -1
    var sumAbs = 0L
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
          nSamples = len / 2
          var i = 0
          while (i < nSamples) { sumAbs += math.abs(bb.getShort.toLong); i += 1 }
        case _ => bb.position(bb.position() + len)
      }
    }
    require(nSamples >= 0, "corrupt WAV: no data chunk")
    (rate, nSamples, sumAbs)
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

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "mm_binary_meta" -> mm_binary_meta,
    "mm_decode" -> mm_decode,
    "mm_audio_decode" -> mm_audio_decode,
    "mm_resize" -> mm_resize,
    "mm_frame_sample" -> mm_frame_sample,
  )

  val oracles: Map[String, String] = Map(
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
  )
}
