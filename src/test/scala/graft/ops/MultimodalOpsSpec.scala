package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("scene cuts: every planted class present and cut positions match scene boundaries") {
    val rows = MultimodalOps.mm_scene_cut(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // planted classes all occur: no-cut docs (single scene), boundary
    // cuts, and odd-id docs where EVERY consecutive pair is a cut
    assert(rows.exists { case (_, k, c, _) => k > 1 && c == 0 })
    assert(rows.exists { case (_, k, c, _) => c > 0 && c < k - 1 })
    assert(rows.exists { case (_, k, c, _) => k > 1 && c == k - 1 })
    rows.foreach { case (id, k, cuts, first) =>
      val slen = 1 + ((id / 4) % 2).toInt
      val expectCuts = (1 until k).count(f => f / slen != (f - 1) / slen)
      assert(cuts == expectCuts, s"doc $id: $cuts cuts, scene arithmetic says $expectCuts")
      val expectFirst = (1 until k).find(f => f / slen != (f - 1) / slen).getOrElse(-1)
      assert(first == expectFirst, s"doc $id first cut $first != $expectFirst")
    }
  }

  test("media table: one binary payload per doc, byte length == n_chars (ascii)") {
    val m = MultimodalOps.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val joined = m.join(Tables.documents(spark, sf), "doc_id")
      .filter(length(col("payload")) =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("synthesized payloads are REAL PNGs: an independent JDK decoder agrees") {
    // javax.imageio knows nothing of our encoder; if it can read the
    // bytes and sees the same dimensions and pixels, the PNG is genuine.
    val png = MultimodalOps.encodePng(docId = 123L, nChars = 200L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not decode the synthesized PNG")
    val (w, h) = MultimodalOps.imageDims(123L, 200L)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray == MultimodalOps.pixel(123L, x, y), s"pixel ($x,$y)")
    }
  }

  test("decodePng extracts dims, frame count and pixel sum from the actual bytes") {
    val (w0, h0) = MultimodalOps.imageDims(7L, 100L)
    val expectedSum = (for (y <- 0 until h0; x <- 0 until w0)
      yield MultimodalOps.pixel(7L, x, y).toLong).sum
    val (w, h, frames, sum) = MultimodalOps.decodePng(MultimodalOps.encodePng(7L, 100L))
    assert((w, h, frames, sum) == (w0, h0, 1, expectedSum))
  }

  test("decodePng rejects corrupted payloads loudly") {
    val png = MultimodalOps.encodePng(5L, 80L)
    val truncated = png.take(png.length - 20)
    assertThrows[IllegalArgumentException](MultimodalOps.decodePng(truncated))
    val badCrc = png.clone()
    badCrc(30) = (badCrc(30) ^ 0x55).toByte // flip bits inside IHDR
    assertThrows[IllegalArgumentException](MultimodalOps.decodePng(badCrc))
    assertThrows[IllegalArgumentException](
      MultimodalOps.decodePng("definitely not a png".getBytes("UTF-8")))
  }

  test("synthesized payloads are REAL GIFs: an independent JDK decoder agrees") {
    val gif = MultimodalOps.encodeGif(docId = 123L, nChars = 200L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO could not decode the synthesized GIF")
    val (w, h) = MultimodalOps.imageDims(123L, 200L)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = new java.awt.Color(img.getRGB(x, y)).getRed
      assert(gray == MultimodalOps.pixel(123L, x, y), s"pixel ($x,$y)")
    }
  }

  test("GIF LZW survives code-width growth and dictionary resets (large random image)") {
    // 256x192 of seeded random bytes: the LZW dictionary hits 4096 and
    // resets mid-stream, and the code width walks 9→12 — exactly the
    // paths a tiny fixture image never exercises. ImageIO is the
    // independent referee for our encoder; our decoder must agree too.
    val rng = new scala.util.Random(42)
    val (w, h) = (256, 192)
    val px = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val gif = MultimodalOps.encodeGifPixels(px, w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO could not decode the random GIF")
    for (y <- 0 until h; x <- 0 until w) {
      val gray = new java.awt.Color(img.getRGB(x, y)).getRed
      assert(gray == (px(y * w + x) & 0xFF), s"pixel ($x,$y)")
    }
    val (dw, dh, sum) = MultimodalOps.decodeGif(gif)
    assert((dw, dh) == (w, h))
    assert(sum == px.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("decodeGif reads GIFs our encoder did NOT write (ImageIO-encoded bytes)") {
    // the reverse direction: javax.imageio writes a grayscale GIF with
    // its own palette/extension choices; our decoder must handle them.
    val rng = new scala.util.Random(7)
    val (w, h) = (61, 37)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, rng.nextInt(256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "ImageIO has no GIF writer?")
    // per-pixel, ORDER-SENSITIVE compare: ImageIO writes interlaced
    // GIFs by default, so this also proves the de-interlace path
    val (dw, dh, gray) = MultimodalOps.decodeGifGray(bos.toByteArray)
    assert((dw, dh) == (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert((gray(y * w + x) & 0xFF) == img.getRaster.getSample(x, y, 0), s"pixel ($x,$y)")
  }

  test("LZW round-trips arbitrary byte streams (100 random shapes incl. degenerate)") {
    val rng = new scala.util.Random(11)
    val shapes = Seq(
      Array[Byte](0),                                  // single byte
      Array.fill[Byte](4096)(7),                       // one repeated run (deep KwKwK chains)
      Array.tabulate[Byte](512)(i => (i % 2).toByte),  // alternating
      (0 until 256).map(_.toByte).toArray              // each literal once
    ) ++ (1 to 96).map(_ => Array.fill[Byte](1 + rng.nextInt(20000))(rng.nextInt(256).toByte))
    for ((data, i) <- shapes.zipWithIndex) {
      val back = MultimodalOps.lzwDecompress(MultimodalOps.lzwCompress(data), data.length)
      assert(java.util.Arrays.equals(back, data), s"shape $i (len ${data.length})")
    }
  }

  test("decodeGif rejects corrupted payloads loudly") {
    val gif = MultimodalOps.encodeGif(5L, 80L)
    val truncated = gif.take(gif.length - 10)
    assertThrows[IllegalArgumentException](MultimodalOps.decodeGif(truncated))
    assertThrows[IllegalArgumentException](
      MultimodalOps.decodeGif("definitely not a gif".getBytes("UTF-8")))
  }

  test("synthesized WAVs are REAL audio: the independent JDK decoder agrees sample-for-sample") {
    val wav = MultimodalOps.encodeWav(docId = 11L, nChars = 123L)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    val n = MultimodalOps.audioSamples(123L)
    assert(in.getFrameLength == n)
    val raw = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n)
      assert(bb.getShort.toInt == MultimodalOps.pcmSample(11L, i), s"sample $i")
  }

  test("decodeWav extracts rate, count and amplitude sum from the actual bytes") {
    val n = MultimodalOps.audioSamples(77L)
    val expectedSum = (0 until n).map(i => math.abs(MultimodalOps.pcmSample(3L, i)).toLong).sum
    val (rate, count, sum) = MultimodalOps.decodeWav(MultimodalOps.encodeWav(3L, 77L))
    assert((rate, count, sum) == (8000, n, expectedSum))
  }

  test("decodeWav rejects corrupted payloads loudly") {
    val wav = MultimodalOps.encodeWav(9L, 60L)
    assertThrows[IllegalArgumentException](MultimodalOps.decodeWav(wav.take(wav.length - 7)))
    assertThrows[IllegalArgumentException](MultimodalOps.decodeWav("RIFFnot really a wav".getBytes("UTF-8")))
  }

  test("decode pipeline is deterministic and covers every record") {
    val a = MultimodalOps.mm_decode(spark, sf).collect()
    val b = MultimodalOps.mm_decode(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sf).count())
    a.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) <= 63)  // width
      assert(r.getInt(2) >= 16 && r.getInt(2) <= 47)  // height
      assert(r.getInt(3) == 1)                        // one IDAT chunk
      assert(r.getLong(4) > 0)                        // px_sum
    }
  }

  test("resize halves dimensions and keeps only nearest-neighbor source pixels") {
    val r = MultimodalOps.mm_resize(spark, sf).collect()
    assert(r.length == Tables.documents(spark, sf).count())
    r.foreach { row =>
      assert(row.getInt(1) >= 8 && row.getInt(1) <= 32)  // ceil(16..63 / 2)
      assert(row.getInt(2) >= 8 && row.getInt(2) <= 24)  // ceil(16..47 / 2)
    }
    // direct check on one doc: resized sum equals the formula over even coords
    val (w, h) = MultimodalOps.imageDims(42L, 300L)
    val expected = (for (y <- 0 until (h + 1) / 2; x <- 0 until (w + 1) / 2)
      yield MultimodalOps.pixel(42L, 2 * x, 2 * y).toLong).sum
    val img = MultimodalOps.walkPng(MultimodalOps.encodePng(42L, 300L), 0, inflate = true)
    val sum = (for (y <- 0 until (h + 1) / 2; x <- 0 until (w + 1) / 2)
      yield (img.pixels(2 * y * w + 2 * x) & 0xFF).toLong).sum
    assert(sum == expected)
  }

  test("frame sampling decodes only every second frame of the multi-frame payload") {
    val r = MultimodalOps.mm_frame_sample(spark, sf).collect()
    assert(r.length == Tables.documents(spark, sf).count())
    r.foreach { row =>
      val (n, sampled) = (row.getInt(1), row.getInt(2))
      assert(n >= 1 && n <= 4)
      assert(sampled == (n + 1) / 2, s"sampled=$sampled of $n")
      assert(row.getLong(3) > 0)
    }
    assert(r.map(_.getInt(1)).distinct.sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("codec round-trips hold on 50 random parameter pairs (property sample)") {
    val rng = new scala.util.Random(2026)
    for (_ <- 1 to 50) {
      val id = rng.nextLong().abs % 1000000L
      val nc = 1L + rng.nextLong().abs % 2000L
      val (w, h) = MultimodalOps.imageDims(id, nc)
      val expectedPx = (for (y <- 0 until h; x <- 0 until w)
        yield MultimodalOps.pixel(id, x, y).toLong).sum
      assert(MultimodalOps.decodePng(MultimodalOps.encodePng(id, nc)) ==
        ((w, h, 1, expectedPx)), s"png id=$id nc=$nc")
      val n = MultimodalOps.audioSamples(nc)
      val expectedAbs = (0 until n).map(i => math.abs(MultimodalOps.pcmSample(id, i)).toLong).sum
      assert(MultimodalOps.decodeWav(MultimodalOps.encodeWav(id, nc)) ==
        ((8000, n, expectedAbs)), s"wav id=$id nc=$nc")
    }
  }

  test("batching does not change results (batch boundary invariance)") {
    val m = MultimodalOps.pngTable(spark, sf)
    val big = MultimodalOps.decodeFeatures(m, batchSize = 1000).collect().sortBy(_.doc_id)
    val tiny = MultimodalOps.decodeFeatures(m, batchSize = 3).collect().sortBy(_.doc_id)
    assert(big.toSeq == tiny.toSeq)
    assert(big.forall(f => f.n_bytes > 0))
  }

  test("phash dedup: brightness copies collide at hamming 0, spot copies via banding, bytes differ") {
    val pairs = MultimodalOps.mm_phash_dedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    // every brightness variant pairs with its original at hamming 0:
    // dHash compares neighbors, so a uniform +2 shift flips no bit
    for (id <- ids if id % 5 == 0) {
      val p = pairs.find(t => t._1 == id && t._2 == id + 400000L)
      assert(p.isDefined, s"bright pair for doc $id not found")
      assert(p.get._3 == 0, s"bright pair for doc $id at hamming ${p.get._3}")
    }
    // every spot variant is found too (pigeonhole: <= 2 flipped bits
    // cannot touch all 4 bands), and at least one flips a bit — the
    // nonzero-hamming banded path is genuinely exercised
    val spot = for (id <- ids if id % 7 == 0)
      yield pairs.find(t => t._1 == id && t._2 == id + 800000L)
    assert(spot.forall(_.isDefined), "spot pair lost by banding")
    assert(spot.exists(_.get._3 > 0), "no spot variant flipped any dHash bit")
    assert(spot.forall(_.get._3 <= MultimodalOps.PhashK))
    // the perceptual collision is NOT a byte collision: exact content
    // dedup (sha2 of payload) would miss every one of these pairs
    val payloads = MultimodalOps.phashCorpus(spark, sf).collect()
      .map(r => r.getLong(0) -> java.util.Arrays.hashCode(r.getAs[Array[Byte]]("payload")))
      .toMap
    for (id <- ids if id % 5 == 0)
      assert(payloads(id) != payloads(id + 400000L), s"doc $id variant bytes identical")
  }

  test("audio fingerprint: clipped WAVs are real bytes, matches are exactly the planted pairs") {
    import org.apache.spark.sql.functions._
    // the clipped variant is a genuine decodable WAV: one frame
    // shorter, every surviving sample identical to the original's tail
    val docs = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val someId = docs.keys.filter(_ % 6 == 0).min
    val (_, orig) = MultimodalOps.decodeWavRaw(
      MultimodalOps.encodeWav(someId, docs(someId)))
    val (_, clip) = MultimodalOps.decodeWavRaw(
      MultimodalOps.encodeWavClipped(someId, docs(someId)))
    assert(clip.length == orig.length - MultimodalOps.FpFrame)
    assert(clip.toSeq == orig.drop(MultimodalOps.FpFrame).toSeq,
      "clipped samples must be the original's tail")

    // the match set is EXACTLY the planted (orig, clip) pairs long
    // enough to clear the minimum-overlap rule: candidates the lossy
    // change-bit join over-generates are killed by the energy verify
    val got = MultimodalOps.mm_audio_fingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.collect {
      case (id, n) if id % 6 == 0 &&
        (500 + (n * 7) % 2000) / MultimodalOps.FpFrame >= MultimodalOps.MinClipFrames + 1 =>
        (id, id + MultimodalOps.ClipOffset)
    }.toSet
    assert(planted.nonEmpty, "fixture must plant clip pairs above the overlap floor")
    assert(got == planted,
      s"matches != planted pairs (extra: ${got -- planted}, missing: ${planted -- got})")
  }
}
