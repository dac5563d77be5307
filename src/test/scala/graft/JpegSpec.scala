package graft

import java.awt.image.BufferedImage

import graft.operators.Jpeg

class JpegSpec extends SparkSpec {

  private def formula(id: Long)(x: Int, y: Int): Int =
    ((id * 29L + x * 13L + y * 19L) % 256L).toInt

  private def imageIoDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    // raw raster samples — getRGB on TYPE_BYTE_GRAY would run a nonlinear
    // gray→sRGB colorspace conversion and corrupt the comparison
    for (y <- 0 until h; x <- 0 until w)
      out(y * w + x) = img.getRaster.getSample(x, y, 0)
    (w, h, out)
  }

  private def imageIoEncodeGray(w: Int, h: Int, gray: (Int, Int) => Int,
                                quality: Float): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, gray(x, y)) // raw, no sRGB mapping
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    out.toByteArray
  }

  test("block-constant images roundtrip BIT-EXACTLY (DC quant 8)") {
    for (id <- Seq(1L, 7L, 42L, 255L)) {
      val bw = (id % 3).toInt + 2; val bh = (id % 2).toInt + 2
      def g(x: Int, y: Int): Int = formula(id)(x / 8, y / 8)
      val bytes = Jpeg.jpegFileGray(bw * 8, bh * 8, g)
      val Some((w, h, out)) = Jpeg.decodeJpegGray(bytes)
      assert((w, h) === (bw * 8, bh * 8))
      for (y <- 0 until h; x <- 0 until w)
        assert(out(y * w + x) === g(x, y), s"id=$id pixel ($x,$y)")
    }
  }

  test("our ENCODER is standard: JDK ImageIO decodes block-constant " +
    "output to the same values (±1 for its integer IDCT)") {
    val id = 13L
    def g(x: Int, y: Int): Int = formula(id)(x / 8, y / 8)
    val bytes = Jpeg.jpegFileGray(32, 16, g)
    val (w, h, out) = imageIoDecodeGray(bytes)
    assert((w, h) === (32, 16))
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs(out(y * w + x) - g(x, y)) <= 1, s"pixel ($x,$y)")
  }

  test("our ENCODER on full-detail images: ImageIO and our decoder agree " +
    "within IDCT rounding (±2) on the same bytes") {
    // non-constant blocks exercise the AC path end to end
    val bytes = Jpeg.jpegFileGray(40, 24, formula(3L))
    val Some((w, h, ours)) = Jpeg.decodeJpegGray(bytes)
    val (w2, h2, theirs) = imageIoDecodeGray(bytes)
    assert((w, h) === (w2, h2))
    var maxDiff = 0
    for (i <- 0 until w * h)
      maxDiff = math.max(maxDiff, math.abs(ours(i) - theirs(i)))
    assert(maxDiff <= 2, s"decoders disagree by $maxDiff")
  }

  test("our DECODER reads JDK-ImageIO-encoded grayscale JPEGs (Annex K " +
    "tables, JFIF APP0) within ±2 of ImageIO's own decode") {
    for (quality <- Seq(0.95f, 0.75f)) {
      val bytes = imageIoEncodeGray(48, 33, formula(9L), quality)
      val Some((w, h, ours)) = Jpeg.decodeJpegGray(bytes)
      assert((w, h) === (48, 33), "non-multiple-of-8 dims must crop right")
      val (_, _, theirs) = imageIoDecodeGray(bytes)
      var maxDiff = 0
      for (i <- 0 until w * h)
        maxDiff = math.max(maxDiff, math.abs(ours(i) - theirs(i)))
      assert(maxDiff <= 2, s"quality $quality: decoders disagree by $maxDiff")
    }
  }

  test("our DECODER extracts luma from 3-component (subsampled) color " +
    "JPEGs written by ImageIO") {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32) {
      val r = (x * 8) % 256; val g = (y * 11) % 256; val b = (x * 3 + y * 5) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val bytes = out.toByteArray
    val Some((w, h, ours)) = Jpeg.decodeJpegGray(bytes)
    assert((w, h) === (32, 24))
    // reference luma via ImageIO's decoded RGB → BT.601 (the decoder's own
    // YCbCr→RGB→Y path reintroduces ≤ ~2 of rounding; allow 3)
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = dec.getRGB(x, y)
      val lum = math.round(0.299 * ((rgb >> 16) & 0xff) +
        0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)).toInt
      maxDiff = math.max(maxDiff, math.abs(ours(y * w + x) - lum))
    }
    assert(maxDiff <= 3, s"luma disagrees by $maxDiff")
  }

  test("COLOR: block-constant YCbCr planes roundtrip BIT-EXACTLY through " +
    "the 3-component codec") {
    for (id <- Seq(2L, 11L, 250L)) {
      val bw = (id % 3).toInt + 2; val bh = (id % 2).toInt + 2
      def yv(x: Int, y: Int) = ((id * 31 + (x / 8) * 17 + (y / 8) * 23) % 256).toInt
      def cb(x: Int, y: Int) = ((id * 13 + (x / 8) * 7 + (y / 8) * 29) % 256).toInt
      def cr(x: Int, y: Int) = ((id * 19 + (x / 8) * 11 + (y / 8) * 5) % 256).toInt
      val bytes = Jpeg.jpegFileYCbCr(bw * 8, bh * 8, yv, cb, cr)
      val Some((w, h, yp, cbp, crp)) = Jpeg.decodeJpegColor(bytes)
      assert((w, h) === (bw * 8, bh * 8))
      for (y <- 0 until h; x <- 0 until w) {
        assert(yp(y * w + x) === yv(x, y), s"id=$id Y ($x,$y)")
        assert(cbp(y * w + x) === cb(x, y), s"id=$id Cb ($x,$y)")
        assert(crp(y * w + x) === cr(x, y), s"id=$id Cr ($x,$y)")
      }
    }
  }

  test("COLOR: our 3-component encoder is standard — ImageIO decodes it " +
    "to the BT.601-converted RGB within rounding (±2)") {
    def yv(x: Int, y: Int) = 80 + 16 * (x / 8)
    def cb(x: Int, y: Int) = 100 + 20 * (y / 8)
    def cr(x: Int, y: Int) = 140 + 10 * ((x / 8 + y / 8) % 3)
    val bytes = Jpeg.jpegFileYCbCr(32, 16, yv, cb, cr)
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(dec != null && dec.getWidth === 32 && dec.getHeight === 16)
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 32) {
      val rgb = dec.getRGB(x, y)
      val (er, eg, eb) = Jpeg.ycbcrToRgb(yv(x, y), cb(x, y), cr(x, y))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - er))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - eg))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - eb))
    }
    assert(maxDiff <= 2, s"ImageIO's RGB disagrees by $maxDiff")
  }

  test("COLOR: our decoder reconstructs chroma from ImageIO-written " +
    "subsampled color JPEGs (RGB within ±4 of ImageIO's own decode)") {
    // smooth low-frequency content: chroma subsampling loses little, so
    // the comparison isolates the reconstruction path, not the format loss
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32) {
      val r = 60 + x * 3; val g = 90 + y * 2; val b = 200 - x * 2 - y
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val bytes = out.toByteArray
    val Some((w, h, yp, cbp, crp)) = Jpeg.decodeJpegColor(bytes)
    assert((w, h) === (32, 24))
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = dec.getRGB(x, y)
      val (r, g, b) = Jpeg.ycbcrToRgb(yp(y * w + x), cbp(y * w + x), crp(y * w + x))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - r))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - g))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - b))
    }
    assert(maxDiff <= 4, s"reconstructed RGB disagrees by $maxDiff")
  }

  test("COLOR: a grayscale file decodes with neutral chroma") {
    val bytes = Jpeg.jpegFileGray(16, 16, formula(5L))
    val Some((w, h, yp, cbp, crp)) = Jpeg.decodeJpegColor(bytes)
    val Some((_, _, gray)) = Jpeg.decodeJpegGray(bytes)
    assert(yp.toSeq === gray.toSeq)
    assert(cbp.forall(_ == 128) && crp.forall(_ == 128))
  }

  test("dirty-corpus contract: malformed inputs return None, never throw") {
    val good = Jpeg.jpegFileGray(16, 16, formula(1L))
    assert(Jpeg.decodeJpegGray(Array[Byte](0x12, 0x34)) === None)
    assert(Jpeg.decodeJpegGray(good.take(20)) === None) // truncated header
    assert(Jpeg.decodeJpegGray(good.dropRight(good.length / 2)) === None)
    // flip SOF0 → SOF2 (progressive): must be rejected, not mis-decoded
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodeJpegGray(prog) === None)
    // oversized dimensions guard
    assert(Jpeg.decodeJpegGray(good, maxPixels = 64) === None)
    // garbage in the entropy segment must not loop or throw
    val mangled = good.clone()
    mangled(good.length - 10) = 0x55
    Jpeg.decodeJpegGray(mangled) // any result, just no exception
  }

  test("spark roundtrip query: every block carries its formula value") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Jpeg.jpegDecodeRoundtrip(spark, docs).collect()
    // grid positions: bx 0..3, by 0..2, docs present where dims reach
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (by, bx, n, sum) = (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val expect = (0L until 40L)
        .filter(id => bx < (id % 3) + 2 && by < (id % 2) + 2)
        .map(id => ((id * 31L + bx * 17L + by * 23L) % 256L))
      assert(n === expect.length.toLong, s"cell ($by,$bx)")
      assert(sum === expect.sum, s"cell ($by,$bx) — a -1 poison means a " +
        "non-uniform decoded block leaked through")
    }
  }
}
