package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Baseline sequential JPEG (ITU-T T.81) — encoder and decoder in pure
  * JVM integer/double arithmetic, no imaging libraries. The last pixel
  * format the multimodal family lacked: a real 100 TB image corpus is
  * overwhelmingly JPEG, where BMP/PNG/GIF cover the lossless tail.
  *
  * Decoder surface (the part a dirty corpus exercises): marker walk
  * (APPn/COM skip, DQT 8/16-bit, SOF0 baseline only — progressive SOF2
  * rejected, DHT canonical rebuild from the file's own BITS/HUFFVAL, DRI),
  * entropy decode with 0xFF00 unstuffing and RSTn handling, dequantize,
  * dezigzag, double-precision IDCT, level shift + clamp. 1-component
  * grayscale and 3-component YCbCr (any sampling factors ≤ 2×2) both
  * decode: [[decodeJpegGray]] reconstructs the luma plane only (chroma is
  * entropy-decoded — the bitstream cannot be skipped — but skips the
  * IDCT), while [[decodeJpegColor]] reconstructs all three planes with
  * nearest chroma upsample and BT.601 [[ycbcrToRgb]] on call. Anything
  * malformed returns None, the same dirty-corpus contract as
  * [[Multimodal.decodePngGray]].
  *
  * Encoder: level shift → forward DCT (double) → quantize (round half
  * away from zero, libjpeg's convention) → zigzag → DC-differential +
  * run-length AC → canonical Huffman. The emitted tables are CUSTOM
  * (fixed-length canonical codes: 12×4-bit DC categories, 162×8-bit AC
  * symbols — a legal-by-construction Kraft assignment that never touches
  * the reserved all-ones code) and are written to DHT, so any standard
  * decoder reads the file; the spec cross-validates against JDK ImageIO
  * in BOTH directions.
  *
  * Exactness lever for the oracle: an 8×8-constant block has only a DC
  * coefficient (8·(v−128), exact in double), so with DC quant step 8 the
  * quantized value is v−128 with NO rounding anywhere, and decode returns
  * v bit-exactly — [[Queries]]' `mm_jpeg_pixels` builds such images from
  * an integer formula and the DuckDB oracle replays the formula without
  * ever seeing a byte (same pattern as `mm_gif_pixels`).
  *
  * Scale shape: decode is a narrow mapPartitions over binary payloads —
  * embarrassingly parallel, O(image) memory per task; the double IDCT is
  * a per-block 64×64 kernel an AAN/integer IDCT could replace drop-in.
  */
object Jpeg {

  // ---- shared tables ----

  /** Zigzag order: zz(i) = raster index of the i-th zigzag coefficient. */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15) { // anti-diagonals
      val range = math.max(0, s - 7) to math.min(7, s)
      val cells = if (s % 2 == 0) range.reverse else range
      for (y <- cells) { val x = s - y; out(i) = y * 8 + x; i += 1 }
    }
    out
  }

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Default quant table (raster order): DC step 8 — the exact-roundtrip
    * lever for constant blocks — and a mild flat 16 for AC. */
  def defaultQuant: Array[Int] = {
    val q = Array.fill(64)(16)
    q(0) = 8
    q
  }

  // ---- encoder ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s
      val pad = 8 - nbits
      put((1 << pad) - 1, pad)
    }
  }

  /** Canonical code assignment from a BITS histogram + symbol list:
    * symbol → (code, length). */
  private def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) { m += vals(k) -> ((code, len)); code += 1; k += 1; i += 1 }
      code <<= 1
    }
    m.result()
  }

  // encoder tables: all DC categories at 4 bits, all 162 AC symbols at 8
  // bits — valid canonical sets that never reach the all-ones code
  private val EncDcBits = { val b = new Array[Int](16); b(3) = 12; b }
  private val EncDcVals = (0 until 12).toArray
  private val EncAcVals: Array[Int] =
    0x00 +: 0xf0 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s).toArray
  private val EncAcBits = { val b = new Array[Int](16); b(7) = EncAcVals.length; b }
  private val EncDc = canonical(EncDcBits, EncDcVals)
  private val EncAc = canonical(EncAcBits, EncAcVals)

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Materialize a per-pixel function into a row-major plane ONCE, so the
    * encoder's 8×8 block loop reads plain array elements — the function
    * call site in the old per-sample form went megamorphic once several
    * encoders (gray fixtures, color fixtures, video frames) shared
    * [[writeJpeg]], and the uninlined Function2 dispatch in the innermost
    * loop cost the r10 driver run ~1.8× on `mm_jpeg_pixels`. O(image)
    * extra memory per task, the codec's documented shape anyway. */
  private def materialize(width: Int, height: Int,
                          f: (Int, Int) => Int): Array[Int] = {
    // validate BEFORE allocating: the codec's own bound (0xffff per axis)
    // admits products past Int.MaxValue, which would otherwise surface as
    // a NegativeArraySizeException instead of this message
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"image dimensions ${width}x$height outside 1..65535")
    require(width.toLong * height <= (1L << 30),
      s"image ${width}x$height exceeds the 1-gigapixel per-task plane cap")
    val a = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { a(y * width + x) = f(x, y); x += 1 }
      y += 1
    }
    a
  }

  /** Encode a grayscale image as a baseline single-component JPEG. */
  def jpegFileGray(width: Int, height: Int, gray: (Int, Int) => Int,
                   quant: Array[Int] = defaultQuant): Array[Byte] =
    writeJpeg(width, height, Array(materialize(width, height, gray)), quant)

  /** Encode a 3-component 4:4:4 baseline JPEG straight from YCbCr planes
    * (component ids 1/2/3, all 1×1 sampling, one shared quant + Huffman
    * table set — legal per T.81 and read by any standard decoder). Taking
    * YCbCr directly keeps the color-transform out of the codec, so a
    * block-constant integer plane round-trips BIT-EXACTLY (the same
    * DC-quant-8 lever as the gray path) — the `mm_jpeg_color` oracle
    * leans on exactly that. RGB callers go through [[rgbToYCbCr]]. */
  def jpegFileYCbCr(width: Int, height: Int,
                    yf: (Int, Int) => Int, cbf: (Int, Int) => Int,
                    crf: (Int, Int) => Int,
                    quant: Array[Int] = defaultQuant): Array[Byte] =
    writeJpeg(width, height, Array(
      materialize(width, height, yf), materialize(width, height, cbf),
      materialize(width, height, crf)), quant)

  private def writeJpeg(width: Int, height: Int,
                        planes: Array[Array[Int]],
                        quant: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff)
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 (gray) or 3 (YCbCr) components")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64) // DQT, 8-bit table 0
    out.write(0x00)
    for (i <- 0 until 64) out.write(quant(Zigzag(i)))
    marker(0xc0); u16(8 + 3 * nc) // SOF0, all components 1x1 sampling
    out.write(8); u16(height); u16(width); out.write(nc)
    for (c <- 1 to nc) { out.write(c); out.write(0x11); out.write(0) }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, EncDcBits, EncDcVals)
    dht(1, 0, EncAcBits, EncAcVals)
    marker(0xda); u16(6 + 2 * nc) // SOS
    out.write(nc)
    for (c <- 1 to nc) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    def putMagnitude(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v >= 0) v else v - 1 + (1 << s), s)
    val prevDc = new Array[Int](nc)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val bY = (height + 7) / 8
    val bX = (width + 7) / 8
    // 4:4:4 interleaved MCU = one 8x8 block per component per position.
    // All hot loops are while-form over plain arrays (no closure capture,
    // no Function2 dispatch); the summation ORDER is unchanged from the
    // original for-comprehension, so every coefficient — and therefore
    // every output byte — is bit-identical to the pre-optimization codec.
    for (byi <- 0 until bY; bxi <- 0 until bX; ci <- 0 until nc) {
      val plane = planes(ci)
      // edge-replicated 8x8 block, level-shifted
      var y = 0
      while (y < 8) {
        val sy = math.min(byi * 8 + y, height - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(bxi * 8 + x, width - 1)
          block(y * 8 + x) = (plane(sy * width + sx) & 0xff) - 128.0
          x += 1
        }
        y += 1
      }
      // forward DCT + quantize, straight from T.81 A.3.3
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var sum = 0.0
          var yy = 0
          while (yy < 8) {
            val cu8y = CosTab(u * 8 + yy)
            var xx = 0
            while (xx < 8) {
              sum += block(yy * 8 + xx) * CosTab(v * 8 + xx) * cu8y
              xx += 1
            }
            yy += 1
          }
          val cu = if (u == 0) InvSqrt2 else 1.0
          val cv = if (v == 0) InvSqrt2 else 1.0
          val f = 0.25 * cu * cv * sum
          val q = quant(u * 8 + v)
          val scaled = f / q
          coef(u * 8 + v) = // round half away from zero
            if (scaled >= 0) (scaled + 0.5).toInt else -((-scaled + 0.5).toInt)
          v += 1
        }
        u += 1
      }
      val diff = coef(0) - prevDc(ci)
      prevDc(ci) = coef(0)
      val s = category(diff)
      val (dc, dl) = EncDc(s)
      bw.put(dc, dl); putMagnitude(diff, s)
      var run = 0
      var lastNz = 0
      for (i <- 1 until 64) if (coef(Zigzag(i)) != 0) lastNz = i
      for (i <- 1 to lastNz) {
        val v = coef(Zigzag(i))
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = EncAc(0xf0); bw.put(c, l); run -= 16 }
          val sz = category(v)
          val (c, l) = EncAc((run << 4) | sz)
          bw.put(c, l); putMagnitude(v, sz)
          run = 0
        }
      }
      if (lastNz < 63) { val (c, l) = EncAc(0x00); bw.put(c, l) } // EOB
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** JFIF/BT.601 full-range color transforms, `rint`-rounded and clamped —
    * the forward/inverse pair every standard JPEG codec uses. */
  def rgbToYCbCr(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(v: Double): Int =
      math.max(0, math.min(255, math.rint(v).toInt))
    (cl(0.299 * r + 0.587 * g + 0.114 * b),
      cl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
      cl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
  }

  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Double): Int =
      math.max(0, math.min(255, math.rint(v).toInt))
    (cl(y + 1.402 * (cr - 128)),
      cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
      cl(y + 1.772 * (cb - 128)))
  }

  // ---- decoder ----

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // standard canonical decode tables (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var broken = false
    /** next entropy bit; handles 0xFF00 unstuffing. Marker or EOF → broken. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) { broken = true; return 0 }
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { broken = true; return 0 }
          val b2 = p(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed
          else { broken = true; return 0 } // a real marker: stop
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    def decode(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | bit()
        len += 1
        if (broken) return -1
        if (t.maxCode(len) >= code && t.minCode(len) <= code) return t.value(len, code)
      }
      broken = true; -1
    }
    /** byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      nbits = 0
      if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff ||
        (p(pos + 1) & 0xff) != (0xd0 + n)) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var td: Int = 0, var ta: Int = 0)

  /** Decode the LUMA plane of a baseline JPEG: Some((w, h, gray)) or None
    * on anything malformed / non-baseline. A truncated stream can trip a
    * bounds read mid-segment — contained here so the dirty-corpus
    * contract (None, never throw) holds without littering every
    * segment parser with length checks. Chroma blocks are entropy-decoded
    * (the bitstream cannot be skipped) but not reconstructed — use
    * [[decodeJpegColor]] when the chroma matters. */
  def decodeJpegGray(p: Array[Byte],
                     maxPixels: Int = 1 << 24): Option[(Int, Int, Array[Int])] =
    decodeJpeg(p, maxPixels, lumaOnly = true)
      .map { case (w, h, planes) => (w, h, planes(0)) }

  /** Full color decode: Some((w, h, yPlane, cbPlane, crPlane)) with every
    * plane at FULL resolution — subsampled chroma (any ≤ 2×2 factors) is
    * dequantized, IDCT'd, and sample-replicated up to the luma grid
    * (nearest upsample, the JFIF box-filter default). A 1-component gray
    * file decodes with neutral chroma (128). [[ycbcrToRgb]] converts
    * per-pixel when RGB is wanted. */
  def decodeJpegColor(p: Array[Byte], maxPixels: Int = 1 << 24)
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    decodeJpeg(p, maxPixels, lumaOnly = false).map { case (w, h, planes) =>
      if (planes.length == 3) (w, h, planes(0), planes(1), planes(2))
      else (w, h, planes(0),
        Array.fill(w * h)(128), Array.fill(w * h)(128))
    }

  private def decodeJpeg(p: Array[Byte], maxPixels: Int, lumaOnly: Boolean)
      : Option[(Int, Int, Array[Array[Int]])] =
    try decodeJpegUnsafe(p, maxPixels, lumaOnly)
    catch { case _: ArrayIndexOutOfBoundsException => None }

  private def decodeJpegUnsafe(p: Array[Byte], maxPixels: Int,
                               lumaOnly: Boolean)
      : Option[(Int, Int, Array[Array[Int]])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

    while (pos + 3 < p.length) {
      if ((p(pos) & 0xff) != 0xff) return None
      val m = p(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => return None // EOI before SOS
        case 0xd8 => return None // repeated SOI (no length field)
        case 0x01 => () // TEM, no payload
        case x if x >= 0xd0 && x <= 0xd7 => () // stray RST, no payload
        case 0xdb => // DQT: one or more tables
          val len = u16(pos); var i = pos + 2
          while (i < pos + len) {
            val pq = (p(i) & 0xff) >> 4; val tq = p(i) & 0x0f
            if (tq > 3 || pq > 1) return None
            i += 1
            val t = new Array[Int](64)
            for (k <- 0 until 64) {
              t(Zigzag(k)) = if (pq == 1) { val v = u16(i); i += 2; v }
                             else { val v = p(i) & 0xff; i += 1; v }
              if (t(Zigzag(k)) == 0) return None
            }
            quant(tq) = t
          }
          pos += len
        case 0xc4 => // DHT: one or more tables
          val len = u16(pos); var i = pos + 2
          while (i < pos + len) {
            val tc = (p(i) & 0xff) >> 4; val th = p(i) & 0x0f
            if (tc > 1 || th > 3) return None
            i += 1
            val bits = Array.tabulate(16)(k => p(i + k) & 0xff)
            i += 16
            val n = bits.sum
            if (n == 0 || n > 256 || i + n > p.length) return None
            val vals = Array.tabulate(n)(k => p(i + k) & 0xff)
            i += n
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
          }
          pos += len
        case 0xc0 | 0xc1 => // SOF0/1: baseline (extended-sequential ok too)
          val len = u16(pos)
          if ((p(pos + 2) & 0xff) != 8) return None // 8-bit precision only
          h = u16(pos + 3); w = u16(pos + 5)
          val nc = p(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { c =>
            val o = pos + 8 + 3 * c
            val hv = p(o + 1) & 0xff
            Component(p(o) & 0xff, hv >> 4, hv & 0x0f, p(o + 2) & 0x0f)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2))
            return None
          pos += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // progressive / hierarchical / arithmetic: not baseline
        case 0xdd => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS: bind tables, then entropy-coded data follows
          if (comps == null) return None
          val len = u16(pos)
          val ns = p(pos + 2) & 0xff
          if (ns != comps.length) return None
          for (i <- 0 until ns) {
            val cid = p(pos + 3 + 2 * i) & 0xff
            val tt = p(pos + 4 + 2 * i) & 0xff
            comps.find(_.id == cid) match {
              case Some(c) => c.td = tt >> 4; c.ta = tt & 0x0f
              case None => return None
            }
          }
          return decodeScan(p, pos + len, comps, w, h, quant, dcTabs, acTabs,
            restartInterval, lumaOnly)
        case _ => // APPn, COM, anything with a length field: skip
          if (pos + 1 >= p.length) return None
          val len = u16(pos)
          if (len < 2) return None
          pos += len
      }
    }
    None
  }

  private def decodeScan(p: Array[Byte], start: Int, comps: Array[Component],
                         w: Int, h: Int, quant: Array[Array[Int]],
                         dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
                         restartInterval: Int,
                         lumaOnly: Boolean): Option[(Int, Int, Array[Array[Int]])] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcuY = (h + 8 * vMax - 1) / (8 * vMax)
    // one MCU-padded plane per reconstructed component, each at its OWN
    // sampled resolution (chroma upsampling happens after the scan);
    // lumaOnly skips chroma reconstruction but still entropy-decodes it
    val planeWs = comps.map(c => mcuX * c.h * 8)
    val planes = comps.indices.map { i =>
      if (lumaOnly && i > 0) null
      else new Array[Int](planeWs(i) * mcuY * comps(i).v * 8)
    }.toArray
    for (c <- comps)
      if (quant(c.tq) == null || dcTabs(c.td) == null || acTabs(c.ta) == null)
        return None
    val br = new BitReader(p, start)
    val prevDc = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var rstN = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          if (!br.restart(rstN)) return None
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
          mcusSinceRestart = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // one block: DC + 63 AC
              java.util.Arrays.fill(coef, 0)
              val s = br.decode(dcTabs(c.td))
              if (br.broken || s < 0 || s > 15) return None
              val diff = extend(br.bits(s), s)
              prevDc(ci) += diff
              coef(0) = prevDc(ci) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decode(acTabs(c.ta))
                if (br.broken || rs < 0) return None
                val r = rs >> 4; val sz = rs & 0x0f
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  if (k > 63) return None
                  coef(Zigzag(k)) = extend(br.bits(sz), sz) * q(Zigzag(k))
                  k += 1
                }
              }
              if (br.broken) return None
              if (!lumaOnly || ci == 0) {
                // IDCT (T.81 A.3.3) + level shift, into this component's plane
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    var sum = 0.0
                    var u = 0
                    while (u < 8) {
                      val cu = if (u == 0) InvSqrt2 else 1.0
                      val cy = CosTab(u * 8 + y) * cu
                      var v = 0
                      while (v < 8) {
                        val cv = if (v == 0) InvSqrt2 else 1.0
                        sum += cv * coef(u * 8 + v) * CosTab(v * 8 + x) * cy
                        v += 1
                      }
                      u += 1
                    }
                    out(y * 8 + x) = 0.25 * sum
                    x += 1
                  }
                  y += 1
                }
                val planeW = planeWs(ci)
                val plane = planes(ci)
                val px = (mx * c.h + bx) * 8
                val py = (my * c.v + by) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    val vD = math.rint(out(yy * 8 + xx) + 128.0).toInt
                    plane((py + yy) * planeW + (px + xx)) =
                      math.max(0, math.min(255, vD))
                    xx += 1
                  }
                  yy += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    // crop each plane to the declared dimensions; subsampled components
    // sample-replicate up to the luma grid (nearest — JFIF's box default)
    val outPlanes = comps.indices.map { i =>
      if (planes(i) == null) null
      else {
        val c = comps(i)
        val pw = planeWs(i)
        val full = new Array[Int](w * h)
        if (c.h == hMax && c.v == vMax) {
          var y = 0
          while (y < h) {
            System.arraycopy(planes(i), y * pw, full, y * w, w)
            y += 1
          }
        } else {
          var y = 0
          while (y < h) {
            val sy = y * c.v / vMax
            var x = 0
            while (x < w) {
              full(y * w + x) = planes(i)(sy * pw + x * c.h / hMax)
              x += 1
            }
            y += 1
          }
        }
        full
      }
    }.toArray
    Some((w, h, outPlanes))
  }

  final case class ColorCell(doc_id: Long, y: Int, x: Int,
                             yv: Int, cb: Int, cr: Int)

  /** The COLOR counterpart of [[jpegDecodeRoundtrip]]: block-constant
    * integer Y/Cb/Cr planes → real 3-component 4:4:4 encode → real color
    * decode (chroma dequant + IDCT + upsample) → per-block-position
    * aggregate over ALL THREE channels. Block-constant planes make the
    * roundtrip bit-exact (DC-quant-8 lever), so the DuckDB oracle replays
    * the formula bytes-blind — the chroma path only cancels if entropy
    * decode, dequantization, and reconstruction are all correct. */
  def jpegColorRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val bw = (id % 3L).toInt + 2
          val bh = (id % 2L).toInt + 2
          def yVal(bx: Int, by: Int): Int = ((id * 31L + bx * 17L + by * 23L) % 256L).toInt
          def cbVal(bx: Int, by: Int): Int = ((id * 13L + bx * 7L + by * 29L) % 256L).toInt
          def crVal(bx: Int, by: Int): Int = ((id * 19L + bx * 11L + by * 5L) % 256L).toInt
          val bytes = jpegFileYCbCr(bw * 8, bh * 8,
            (x, y) => yVal(x / 8, y / 8),
            (x, y) => cbVal(x / 8, y / 8),
            (x, y) => crVal(x / 8, y / 8))
          decodeJpegColor(bytes) match {
            case Some((wp, hp, yp, cbp, crp)) =>
              (0 until hp / 8).iterator.flatMap(by =>
                (0 until wp / 8).iterator.map { bx =>
                  // carry a channel's value only if all 64 decoded pixels
                  // agree (else poison with -1 — never matches the formula)
                  def uni(pl: Array[Int]): Int = {
                    val v0 = pl(by * 8 * wp + bx * 8)
                    var ok = true
                    for (y <- 0 until 8; x <- 0 until 8)
                      if (pl((by * 8 + y) * wp + bx * 8 + x) != v0) ok = false
                    if (ok) v0 else -1
                  }
                  ColorCell(id, by, bx, uni(yp), uni(cbp), uni(crp))
                })
            case None => Iterator.empty
          }
        }
      }.toDF()
      .groupBy("y", "x")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("yv").cast("long")).as("sum_y"),
        sum(col("cb").cast("long")).as("sum_cb"),
        sum(col("cr").cast("long")).as("sum_cr"))
      .orderBy("y", "x")
  }

  /** Formula → REAL JPEG encode (DCT/quant/Huffman) → REAL decode (marker
    * walk/Huffman/dequant/IDCT) → per-block-position aggregate. Blocks are
    * 8×8-CONSTANT by construction, so with DC quant 8 the roundtrip is
    * bit-exact (see the object scaladoc) and the DuckDB oracle recomputes
    * the formula bytes-blind — the codec paths only cancel if both are
    * correct. */
  def jpegDecodeRoundtrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    import Multimodal.PixelCell
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val bw = (id % 3L).toInt + 2 // blocks across: 2..4
          val bh = (id % 2L).toInt + 2 // blocks down: 2..3
          def blockVal(bx: Int, by: Int): Int =
            ((id * 31L + bx * 17L + by * 23L) % 256L).toInt
          val bytes = jpegFileGray(bw * 8, bh * 8,
            (x, y) => blockVal(x / 8, y / 8))
          decodeJpegGray(bytes) match {
            case Some((wp, hp, g)) =>
              (0 until hp / 8).iterator.flatMap(by =>
                (0 until wp / 8).iterator.map { bx =>
                  // the roundtrip claim is per-PIXEL: carry the block value
                  // only if all 64 decoded pixels agree (else poison with
                  // -1, which can never match the oracle's formula)
                  val v0 = g(by * 8 * wp + bx * 8)
                  var uniform = true
                  for (y <- 0 until 8; x <- 0 until 8)
                    if (g((by * 8 + y) * wp + bx * 8 + x) != v0) uniform = false
                  PixelCell(id, by, bx, if (uniform) v0 else -1)
                })
            case None => Iterator.empty
          }
        }
      }.toDF()
      .groupBy("y", "x")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("gray").cast("long")).as("sum_gray"),
        sum(when(col("gray") >= 128, 1L).otherwise(0L)).as("n_bright"))
      .orderBy("y", "x")
  }
}
