package graft

import graft.operators.Multimodal

/** Multimodal plumbing: real container-header decoders (validated against
  * the JDK's own encoders and a committed fixture) + typed mapPartitions
  * feature extraction. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ---- real bytes: JDK encoders are independent implementations of the
  // same public formats, so round-tripping through them is the strongest
  // no-dependency validation available here.

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
    out.toByteArray
  }

  test("decodeHeader parses JDK-encoded PNG / JPEG / GIF / BMP") {
    for ((fmt, w, h) <- Seq(("png", 17, 9), ("jpg", 40, 23), ("gif", 5, 300), ("bmp", 64, 2))) {
      val m = Multimodal.decodeHeader(imageBytes(fmt, w, h))
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(m.format === want, s"$fmt detection")
      assert(m.width === w, s"$fmt width")
      assert(m.height === h, s"$fmt height")
    }
  }

  test("decodeHeader parses JDK-encoded WAV fmt chunk") {
    val af = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val frames = 8
    val data = new Array[Byte](frames * af.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), af, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val m = Multimodal.decodeHeader(out.toByteArray)
    assert(m.format === "wav")
    assert(m.width === 16000)  // sample rate
    assert(m.height === 2)     // channels
    assert(m.depth === 16)     // bits per sample
  }

  test("decodeHeader parses a committed real 1x1 PNG fixture") {
    // Classic minimal 1x1 RGBA PNG (public-domain byte sequence).
    val b64 = "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    val m = Multimodal.decodeHeader(java.util.Base64.getDecoder.decode(b64))
    assert(m.format === "png")
    assert(m.width === 1)
    assert(m.height === 1)
    assert(m.depth === 8)
  }

  test("decodeHeader agrees with the in-repo header writers (independent paths)") {
    assert(Multimodal.decodeHeader(Multimodal.pngHeader(800, 600)) match {
      case Multimodal.MediaFeature(_, "png", _, 800, 600, 8, _) => true; case _ => false
    })
    assert(Multimodal.decodeHeader(Multimodal.gifHeader(320, 200)) match {
      case Multimodal.MediaFeature(_, "gif", _, 320, 200, 8, _) => true; case _ => false
    })
    assert(Multimodal.decodeHeader(Multimodal.wavHeader(44100, 2, 16)) match {
      case Multimodal.MediaFeature(_, "wav", _, 44100, 2, 16, _) => true; case _ => false
    })
  }

  test("decodeHeader does not false-positive on text payloads") {
    for (s <- Seq("hello world, plain text", "BMrandom text that is not a bitmap!!",
                  "GIFted writers are rare", "RIFFing on a theme but not WAVE data", ""))
      assert(Multimodal.decodeHeader(s.getBytes("UTF-8")).format === "unknown", s)
  }

  test("extractFeatures decodes per partition with a fixed schema") {
    val docs = Seq((1L, "abc", "web"), (2L, "", "web"), (3L, "xyz!", "pdf"))
      .toDF("doc_id", "text", "source")
    val f = Multimodal.extractFeatures(spark, docs, "doc_id", "text")
      .collect().map(m => m.doc_id -> m).toMap
    assert(f(1L).n_bytes === 3L)
    assert(f(1L).format === "unknown")
    assert(f(1L).checksum === 3L * 31 + 'a' + 'c')
    assert(f(2L) === Multimodal.MediaFeature(2L, "unknown", 0L, 0, 0, 0, 0L))
    assert(f(3L).checksum === 4L * 31 + 'x' + '!')
  }

  test("sampleFrames: one-to-many decode with even byte windows") {
    val docs = Seq(
      (1L, "abcdefgh"), // 8 bytes → 4 frames of 2
      (2L, "ab"),       // shorter than nFrames → one frame per byte
      (3L, ""))         // empty → no frames
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", "text", nFrames = 4)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).length === 4)
    assert(frames(1L).sortBy(_.frame_no).map(_.offset).toSeq === Seq(0L, 2L, 4L, 6L))
    assert(frames(1L).forall(_.n_bytes === 2))
    // frame 0 checksum = 'a'*31 + 'b'
    assert(frames(1L).find(_.frame_no == 0).get.checksum === 'a'.toLong * 31 + 'b'.toLong)
    assert(frames(2L).length === 2)
    assert(frames(2L).forall(_.n_bytes === 1))
    assert(!frames.contains(3L))
  }

  test("audioFrameFeatures decodes real 16-bit PCM (JDK-encoded WAV)") {
    // Encode via the JDK (independent WAV implementation), decode via ours.
    val samples = Array(1000, -2000, 0, 3000, -1, 1, 500, -500)
    val af = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(v => pcm.putShort(v.toShort))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), af, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val docs = Seq((1L, out.toByteArray)).toDF("doc_id", "wav")
    val fs = Multimodal.audioFrameFeatures(spark, docs, "doc_id", "wav", nFrames = 2)
      .collect().sortBy(_.frame_no)
    assert(fs.length === 2)
    // frame 0 = [1000,-2000,0,3000]: peak 3000, sum 6000, flips 1000→-2000, -2000→3000
    assert(fs(0) === Multimodal.AudioFrame(1L, 0, 4, 3000, 6000L, 2))
    // frame 1 = [-1,1,500,-500]: peak 500, sum 1002, flips -1→1, 500→-500
    assert(fs(1) === Multimodal.AudioFrame(1L, 1, 4, 500, 1002L, 2))
  }

  test("audioFrameFeatures decodes 8-bit unsigned PCM and skips non-WAV") {
    // 8-bit unsigned: stored byte = sample + 128.
    val vals = Array(100, -100, 0, 127, -128, 5)
    val bytes = vals.map(v => (v + 128).toByte)
    val dataLen = bytes.length
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(8000)
    b.putShort(1).putShort(8)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen).put(bytes)
    val docs = Seq((1L, b.array()), (2L, "not a wav at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val fs = Multimodal.audioFrameFeatures(spark, docs, "doc_id", "payload", nFrames = 1)
      .collect()
    assert(fs.length === 1) // non-WAV payload emits no frames
    // zero sample is sign-neutral: flips 100→-100, -100→127, 127→-128, -128→5
    assert(fs(0) === Multimodal.AudioFrame(1L, 0, 6, 128, 460L, 4))
  }

  test("audioFrameFeatures round-trips through the in-repo wavFile16 writer") {
    val docs = Seq((7L, Multimodal.wavFile16(16000, Array(10, -10, 10, -10))))
      .toDF("doc_id", "wav")
    val fs = Multimodal.audioFrameFeatures(spark, docs, "doc_id", "wav", nFrames = 1)
      .collect()
    assert(fs.toSeq === Seq(Multimodal.AudioFrame(7L, 0, 4, 10, 40L, 3)))
  }

  test("decodeBmpGray agrees with JDK ImageIO on distinct-channel pixels") {
    // JDK-encoded BMP (independent implementation: stride, bottom-up rows,
    // BGR order) decoded by ours; luma recomputed from getRGB.
    val w = 5; val h = 3 // w*3=15 → real stride padding
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 50) << 16) | ((y * 80) << 8) | (x * 20 + y * 30))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val Some((dw, dh, g)) = Multimodal.decodeBmpGray(out.toByteArray)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val want = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
      assert(g(y * w + x) === want, s"pixel ($x,$y)")
    }
  }

  test("ImageIO decodes our bmpFile24 writer's bytes (both directions)") {
    val w = 3; val h = 4
    def gray(x: Int, y: Int) = (x * 40 + y * 25) % 256
    val bytes = Multimodal.bmpFile24(w, h, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not parse our BMP")
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === gray(x, y), s"r ($x,$y)")
      assert((rgb & 0xff) === gray(x, y), s"b ($x,$y)")
    }
    val Some((dw, dh, g)) = Multimodal.decodeBmpGray(bytes)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w) assert(g(y * w + x) === gray(x, y))
  }

  test("resizeNearest floor mapping; identity at same size") {
    val g = Array(0, 1, 2, 3, 4, 5) // 3x2
    assert(Multimodal.resizeNearest(g, 3, 2, 3, 2).toSeq === g.toSeq)
    // down to 1x1 → src (0,0); up 2x2 from 1x1 → all the same pixel
    assert(Multimodal.resizeNearest(g, 3, 2, 1, 1).toSeq === Seq(0))
    assert(Multimodal.resizeNearest(Array(9), 1, 1, 2, 2).toSeq === Seq(9, 9, 9, 9))
    // 3→4 upscale: sx = x*3/4 = 0,0,1,2
    assert(Multimodal.resizeNearest(g, 3, 2, 4, 1).toSeq === Seq(0, 0, 1, 2))
  }

  test("imageResizeCells skips non-BMP payloads and emits the full grid") {
    val docs = Seq(
      (1L, Multimodal.bmpFile24(3, 2, (x, y) => x + y)),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val cells = Multimodal.imageResizeCells(spark, docs, "doc_id", "payload", 2, 2)
      .collect().sortBy(c => (c.y, c.x))
    assert(cells.forall(_.doc_id == 1L))
    assert(cells.length === 4)
    // sy = y*2/2 = y; sx = x*3/2 = 0,1 → gray = sx + sy
    assert(cells.map(_.gray).toSeq === Seq(0, 1, 1, 2))
  }

  test("WAV 16-bit decode matches a JDK-side recomputation on random PCM") {
    // randomized cross-validation: JDK encodes random samples; our decoder's
    // frame features must equal a direct scala recomputation over the
    // original sample array (windows s0 = f*n/k).
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(6)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val docs = Seq((trial.toLong, Multimodal.wavFile16(8000, samples)))
        .toDF("doc_id", "wav")
      val got = Multimodal.audioFrameFeatures(spark, docs, "doc_id", "wav", k)
        .collect().sortBy(_.frame_no)
      val kk = math.min(k, n)
      assert(got.length === kk, s"trial $trial")
      for (f <- 0 until kk) {
        val s0 = (f.toLong * n / kk).toInt; val s1 = ((f + 1).toLong * n / kk).toInt
        val w = samples.slice(s0, s1)
        val nz = w.filter(_ != 0).map(Integer.signum)
        val zc = nz.sliding(2).count(p => p.length == 2 && p(0) != p(1))
        assert(got(f) === Multimodal.AudioFrame(trial.toLong, f, s1 - s0,
          if (w.isEmpty) 0 else w.map(math.abs).max,
          w.map(v => math.abs(v).toLong).sum, zc), s"trial $trial frame $f")
      }
    }
  }

  test("BMP decode matches JDK ImageIO on random dims and pixels") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 12) {
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(13)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt(1 << 24))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", out))
      val Some((dw, dh, g)) = Multimodal.decodeBmpGray(out.toByteArray)
      assert((dw, dh) === (w, h), s"trial $trial dims")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val want = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        assert(g(y * w + x) === want, s"trial $trial pixel ($x,$y)")
      }
    }
  }

  test("featureStats rolls up per source; text counts zero detected media") {
    val docs = Seq((1L, "abc", "web"), (2L, "de", "web"))
      .toDF("doc_id", "text", "source")
    val r = Multimodal.featureStats(spark, docs).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("total_bytes") === 5L)
    assert(r.getAs[Long]("n_media") === 0L)
  }

  test("decodePngGray agrees with JDK ImageIO on RGB and gray PNGs") {
    // JDK-encoded PNGs (independent deflate + filter choices) decoded by
    // ours; luma recomputed from getRGB. TYPE_BYTE_GRAY exercises color
    // type 0, TYPE_INT_RGB color type 2.
    val w = 7; val h = 5
    // color type 2 (RGB): luma recomputed from getRGB
    val rgbImg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 41 + y * 73 + x * y * 11) % 256
      rgbImg.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
    }
    val rgbOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgbImg, "png", rgbOut))
    val Some((rw, rh, rg)) = Multimodal.decodePngGray(rgbOut.toByteArray)
    assert((rw, rh) === (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = rgbImg.getRGB(x, y)
      val want = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
      assert(rg(y * w + x) === want, s"rgb pixel ($x,$y)")
    }
    // color type 0 (gray): compare RASTER samples — getRGB on
    // TYPE_BYTE_GRAY applies a gray→sRGB colorspace conversion, so the
    // raster is the byte-level truth our decoder returns
    val gImg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gImg.getRaster.setSample(x, y, 0, (x * 41 + y * 73 + x * y * 11) % 256)
    val gOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gImg, "png", gOut))
    val Some((gw, gh, gg)) = Multimodal.decodePngGray(gOut.toByteArray)
    assert((gw, gh) === (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert(gg(y * w + x) === gImg.getRaster.getSample(x, y, 0),
        s"gray pixel ($x,$y)")
  }

  test("decodePngColor: exact RGB roundtrip through pngFileRgb, JDK " +
    "cross-check, gray files replicate planes") {
    val w = 6; val h = 11 // >= 6 rows: all five filters appear (y % 5)
    def rf(x: Int, y: Int) = (x * 40 + y * 25 + x * y * 3) % 256
    def gf(x: Int, y: Int) = (x * 17 + y * 9 + 31) % 256
    def bf(x: Int, y: Int) = (x * 5 + y * 61 + x * y * 7) % 256
    val bytes = Multimodal.pngFileRgb(w, h, (x, y) => (rf(x, y), gf(x, y), bf(x, y)))
    val Some((dw, dh, r, g, b)) = Multimodal.decodePngColor(bytes)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      assert(r(y * w + x) === rf(x, y), s"r ($x,$y)")
      assert(g(y * w + x) === gf(x, y), s"g ($x,$y)")
      assert(b(y * w + x) === bf(x, y), s"b ($x,$y)")
    }
    // JDK ImageIO decodes our RGB writer's bytes identically
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ===
        ((rf(x, y), gf(x, y), bf(x, y))), s"jdk ($x,$y)")
    }
    // a JDK-encoded RGB PNG (independent filter/deflate choices) decodes
    // to the same channels
    val jimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      jimg.setRGB(x, y, (rf(x, y) << 16) | (gf(x, y) << 8) | bf(x, y))
    val jout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(jimg, "png", jout))
    val Some((jw, jh, jr, jg, jb)) = Multimodal.decodePngColor(jout.toByteArray)
    assert((jw, jh) === (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert((jr(y * w + x), jg(y * w + x), jb(y * w + x)) ===
        ((rf(x, y), gf(x, y), bf(x, y))), s"jdk-enc ($x,$y)")
    // grayscale files decode with three equal planes
    val gray = Multimodal.pngFileGray(w, h, rf)
    val Some((_, _, c1, c2, c3)) = Multimodal.decodePngColor(gray)
    for (i <- 0 until w * h) {
      assert(c1(i) === rf(i % w, i / w))
      assert(c1(i) === c2(i) && c2(i) === c3(i))
    }
  }

  test("ImageIO decodes our pngFileGray writer's bytes (both directions)") {
    val w = 6; val h = 11 // >= 6 rows: all five filters appear (y % 5)
    def gray(x: Int, y: Int) = (x * 40 + y * 25 + x * y * 3) % 256
    val bytes = Multimodal.pngFileGray(w, h, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not parse our PNG")
    // raster samples, not getRGB: gray-PNG getRGB goes through a
    // colorspace conversion (see the decode test above)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === gray(x, y), s"jdk ($x,$y)")
    val Some((dw, dh, g)) = Multimodal.decodePngGray(bytes)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) === gray(x, y), s"ours ($x,$y)")
  }

  test("decodePngGray rejects malformed and unsupported payloads") {
    val good = Multimodal.pngFileGray(4, 4, (x, y) => x + y)
    assert(Multimodal.decodePngGray(good).isDefined)
    // truncated IDAT: cut the file before the stream completes
    assert(Multimodal.decodePngGray(good.take(good.length - 20)).isEmpty)
    // oversized declared dims must not allocate (adversarial header)
    val big = Multimodal.pngFileGray(4, 4, (x, y) => 0).clone()
    // IHDR width field lives at offset 16 (big-endian)
    big(16) = 0x7f.toByte
    assert(Multimodal.decodePngGray(big).isEmpty)
    // not a PNG at all
    assert(Multimodal.decodePngGray("hello".getBytes).isEmpty)
  }

  test("pngDecodeRoundtrip recovers the formula through all five filters") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val cells = Multimodal.pngDecodeRoundtrip(spark, docs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // every doc decodes: 16 cells each with n_docs = 5
    assert(cells.size === 16)
    assert(cells.values.forall(_._1 === 5L))
    // hand-check cell (0,0): sx=sy=0 → gray = (id*37) % 256
    val want00 = (0 until 5).map(id => (id * 37L) % 256L).sum
    assert(cells((0, 0))._2 === want00)
  }

  test("mediaDecodeRoundtrip: encode→decode recovers the derived dims") {
    val docs = Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 2000L))
      .toDF("doc_id", "n_chars")
    val byFmt = Multimodal.mediaDecodeRoundtrip(spark, docs)
      .collect().map(r => r.getString(0) -> r).toMap
    // doc 0 → png w=11 h=1; doc 3 → png w=1001%... (2000%1000)+1=1 h=4
    assert(byFmt("png").getAs[Long]("n_docs") === 2L)
    assert(byFmt("png").getAs[Long]("sum_width") === 11L + 1L)
    assert(byFmt("png").getAs[Long]("sum_height") === 1L + 4L)
    // doc 1 → gif w=12 h=2
    assert(byFmt("gif").getAs[Long]("sum_width") === 12L)
    // doc 2 → wav rate=8000+13*4 ch=1 bits=8
    assert(byFmt("wav").getAs[Long]("sum_width") === 8052L)
    assert(byFmt("wav").getAs[Long]("sum_depth") === 8L)
  }

  test("ImageIO decodes our gifFileGray writer's bytes (both directions)") {
    // big enough (100×40 = 4000 px of noisy data) that the LZW stream
    // grows past 9-bit codes — the width-bump path is exercised, not just
    // the initial dictionary
    val w = 100; val h = 40
    def gray(x: Int, y: Int) = (x * 37 + y * 91 + x * y * 13) % 256
    val bytes = Multimodal.gifFileGray(w, h, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not parse our GIF")
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      // gray palette (i,i,i): every channel equals the index
      assert((rgb & 0xff) === gray(x, y), s"jdk ($x,$y)")
    }
    val Some((dw, dh, g)) = Multimodal.decodeGifGray(bytes)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) === gray(x, y), s"ours ($x,$y)")
  }

  test("decodeGifGray agrees with JDK ImageIO encodings") {
    // JDK-encoded GIF (independent LZW encoder, its own palette order)
    // decoded by ours. Raster samples, not getRGB: TYPE_BYTE_GRAY getRGB
    // applies a gray→sRGB colorspace conversion (see the PNG spec above),
    // while the GIF writer palettizes the raw raster bytes as (v,v,v) —
    // whose BT.601 luma is v again.
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 29 + y * 53 + x * y * 7) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val Some((dw, dh, g)) = Multimodal.decodeGifGray(out.toByteArray)
    assert((dw, dh) === (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) === img.getRaster.getSample(x, y, 0),
        s"pixel ($x,$y)")
  }

  test("GIF codec round-trips random dims and pixels (incl. 10-bit codes)") {
    val rnd = new scala.util.Random(421)
    for (trial <- 0 until 12) {
      val w = rnd.nextInt(60) + 1
      val h = rnd.nextInt(40) + 1
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val bytes = Multimodal.gifFileGray(w, h, (x, y) => px(y * w + x))
      val Some((dw, dh, g)) = Multimodal.decodeGifGray(bytes)
      assert((dw, dh) === (w, h), s"trial $trial dims")
      assert(g.sameElements(px), s"trial $trial pixels")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"trial $trial: JDK parse")
      for (i <- 0 until w * h)
        assert((img.getRGB(i % w, i / w) & 0xff) === px(i), s"trial $trial jdk")
    }
  }

  test("GIF LZW dictionary reset: uniform-noise image past 4096 entries") {
    // 256×96 = 24576 noisy pixels force the dictionary to 4096 and
    // through at least one clear/reset cycle; byte-exact recovery proves
    // the reset handshake between encoder and decoder
    val rnd = new scala.util.Random(99)
    val w = 256; val h = 96
    val px = Array.fill(w * h)(rnd.nextInt(256))
    val bytes = Multimodal.gifFileGray(w, h, (x, y) => px(y * w + x))
    val Some((dw, dh, g)) = Multimodal.decodeGifGray(bytes)
    assert((dw, dh) === (w, h))
    assert(g.sameElements(px))
  }

  test("decodeGifGray rejects malformed and unsupported payloads") {
    val good = Multimodal.gifFileGray(5, 4, (x, y) => x + y)
    assert(Multimodal.decodeGifGray(good).isDefined)
    // truncated mid-stream
    assert(Multimodal.decodeGifGray(good.take(good.length - 10)).isEmpty)
    // oversized declared dims must not allocate (adversarial header):
    // image-descriptor width (LE) lives at 6 (header) + 7 (LSD) +
    // 768 (GCT) + 5 (0x2C, left, top) = 786
    val big = good.clone()
    big(786) = 0xff.toByte; big(787) = 0x7f.toByte
    assert(Multimodal.decodeGifGray(big, maxPixels = 1 << 16).isEmpty)
    // header only, no image data
    assert(Multimodal.decodeGifGray(Multimodal.gifHeader(4, 4)).isEmpty)
    // not a GIF at all
    assert(Multimodal.decodeGifGray("hello".getBytes).isEmpty)
  }

  test("goertzelPower: hand-derived three-sample fold") {
    // c = 2 (Q14 value 32768 would be 2.0; pick c raw = 32768):
    // s-updates: s0 = x + (c*s1 >> 14) - s2
    val c = 32768L // exactly 2.0 in Q14
    // samples 3, 5, 7: s=(3,0) → (5+6,3)=(11,3) → (7+22-3,11)=(26,11)
    // power = 26² + 11² − (2·26)·11 = 676 + 121 − 572 = 225
    assert(Multimodal.goertzelPower(Array(3, 5, 7), c) === 225L)
  }

  test("Goertzel picks out the matching tone bin through the WAV codec") {
    val n = 32
    // a pure bin-4 tone, amplitudes decoded through a real WAV round trip
    val tone = Array.tabulate(n)(t =>
      math.round(999.0 * math.cos(2.0 * math.Pi * 4 * t / n)).toInt)
    val wav = Multimodal.wavFile16(8000, tone)
    // canonical 44-byte RIFF/fmt/data header, then 16-bit LE samples
    val off = 44
    assert((wav.length - off) / 2 === n)
    val decoded = Array.tabulate(n) { s =>
      (wav(off + 2 * s) & 0xff) | (wav(off + 2 * s + 1).toInt << 8)
    }
    assert(decoded.sameElements(tone))
    val powers = Seq(1, 2, 4, 8).map(k =>
      k -> Multimodal.goertzelPower(decoded, Multimodal.goertzelCoefQ14(k, n)))
    val best = powers.maxBy(_._2)._1
    assert(best === 4, s"bin powers: $powers")
    // the matching bin dominates every other bin by an order of magnitude
    val p4 = powers.toMap.apply(4).toDouble
    assert(powers.filter(_._1 != 4).forall(_._2 < p4 / 10), s"powers: $powers")
  }

  test("gifDecodeRoundtrip recovers the formula through LZW") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val cells = Multimodal.gifDecodeRoundtrip(spark, docs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(cells.size === 16)
    assert(cells.values.forall(_._1 === 5L))
    // hand-check cell (0,0): sx=sy=0 → gray = (id*29) % 256
    val want00 = (0 until 5).map(id => (id * 29L) % 256L).sum
    assert(cells((0, 0))._2 === want00)
  }

  test("imageEqualizeRoundtrip: hand-derived cdf remap, full-range stretch") {
    import spark.implicits._
    // doc 0: 3×2 image, g = ((3x + 5y) % 64) + 32 → {32,35,38,37,40,43},
    // all distinct → cdf 1..6, cdfmin 1, denom 5 → e = (cdf−1)·255/5 =
    // {0,51,102,153,204,255}: sum 765, band [32,43] stretched to [0,255]
    val rows = Multimodal.imageEqualizeRoundtrip(spark,
      Seq(0L, 1L, 7L).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r0 = rows(0L)
    assert(r0.getAs[Long]("n_px") === 6L)
    assert(r0.getAs[Long]("min_in") === 32L && r0.getAs[Long]("max_in") === 43L)
    assert(r0.getAs[Long]("min_eq") === 0L && r0.getAs[Long]("max_eq") === 255L)
    assert(r0.getAs[Long]("sum_eq") === 765L)
    // the remap stretches EVERY image's narrow band to the full range
    rows.values.foreach { r =>
      assert(r.getAs[Long]("max_in") < 96L)
      assert(r.getAs[Long]("min_eq") === 0L)
      assert(r.getAs[Long]("max_eq") === 255L)
    }
  }

  test("audioResampleRoundtrip: decode+interp match an independent twin") {
    import spark.implicits._
    // independent reimplementation of formula + interpolation (no WAV
    // bytes): catches sign-extension or truncation slips in the decode
    // path, since encode/decode only cancel when both are correct
    def expected(id: Long): (Long, Long, Long, Long, Long) = {
      val s = Array.tabulate(48)(t =>
        ((id * 7L + 13L * t + (t.toLong * t % 97L) * 31L) % 2001L - 1000L).toInt)
      val ys = (0 until 31).map { j =>
        val i0 = (j * 3) / 2; val fr = (j * 3) % 2
        (s(i0) + (fr.toLong * (s(i0 + 1) - s(i0))) / 2L, j)
      }
      (ys.map(_._1).sum, ys.map { case (y, j) => (j + 1) * y }.sum,
        ys.map(_._1).min, ys.map(_._1).max, 31L)
    }
    val docs = Seq(0L, 5L, 13L).toDF("doc_id")
    val got = Multimodal.audioResampleRoundtrip(spark, docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(1)))
      .toMap
    Seq(0L, 5L, 13L).foreach(id => assert(got(id) === expected(id), s"id=$id"))
  }
}
