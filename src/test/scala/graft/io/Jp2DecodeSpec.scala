package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** JPEG2000 decoder verification, three independent angles:
  *
  * 1. END-TO-END GOLDEN: the reference's own `rgb.jp2` (an OpenJPEG-
  *    encoded, RATE-TRUNCATED 9/7-path codestream: only 5-11 of the 19
  *    coding passes per code-block survive, so the encode is lossy by
  *    construction) decoded against the reference's `rgb.tif` — the same
  *    100x100 scene stored losslessly. A correct decode of a ~quality-25
  *    JPEG2000 sits near 36 dB PSNR; any MQ/context/packet bug in ANY of
  *    the 12 independent adaptive-arithmetic streams (4 code-blocks x 3
  *    components) cascades within that stream and craters the figure, so
  *    the PSNR floor + max-error ceiling pin every layer of the decoder at
  *    once. Georeferencing must equal the GeoTIFF's (GeoJP2 uuid box).
  *
  * 2. MQ CODER ROUND-TRIP: an MQ *encoder* written independently from
  *    ISO 15444-1 Annex C (CODEMPS/CODELPS/BYTEOUT/FLUSH) drives random
  *    decision sequences through random context slots; the decoder must
  *    return the exact sequence. Exercises LPS/MPS exchange, renorm,
  *    0xFF bit-stuffing, and the beyond-end 0xFF convention.
  *
  * 3. DWT ROUND-TRIPS: forward 5/3 and 9/7 lifting transforms (test-side,
  *    built as the algebraic reverse of the decoder's synthesis steps)
  *    must invert exactly (5/3, integers) / to 1e-9 (9/7) across sizes
  *    1..17 and odd/even absolute offsets — covering the interleave
  *    parity, boundary extension, and length-1 edge rules of F.3.8.2.
  */
class Jp2DecodeSpec extends AnyFunSuite {

  private val jp2 = "/root/reference/tests/data/raster/rgb.jp2"
  private val tif = "/root/reference/tests/data/raster/rgb.tif"

  // ---------------------------------------------------------- 1. golden

  lazy val decoded: graft.raster.MRaster = RasterOpen.open(jp2)
  lazy val golden: graft.raster.MRaster = GeoTiffIO.read(tif)

  test("rgb.jp2 decodes to the rgb.tif scene within the encode's own loss (PSNR >= 36 dB)") {
    assert(decoded.width === 100 && decoded.height === 100 && decoded.numBands === 3)
    var se = 0.0
    var maxErr = 0.0
    var i = 0
    val n = 100 * 100
    while (i < n) {
      var b = 0
      while (b < 3) {
        val e = math.abs(decoded.image(b)(i) - golden.image(b)(i))
        se += e * e
        if (e > maxErr) maxErr = e
        b += 1
      }
      i += 1
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / (se / (3 * n)))
    assert(psnr >= 36.0, f"PSNR $psnr%.2f dB below the correct-decode floor")
    // rate truncation bounds the residual: the worst code-block keeps
    // magnitudes to within 2^3, i.e. +-4 in ICT space, ~+-10 after the
    // inverse ICT mixes channels; far above any desync signature
    assert(maxErr <= 16.0, s"max pixel error $maxErr")
  }

  test("rgb.jp2 carries the GeoJP2 georeferencing of its GeoTIFF twin") {
    assert(decoded.crs === golden.crs)
    val a = decoded.affine; val g = golden.affine
    assert(math.abs(a.a - g.a) < 1e-6 && math.abs(a.e - g.e) < 1e-6,
      s"pixel scale ${a.a}x${a.e} vs ${g.a}x${g.e}")
    assert(math.abs(a.c - g.c) < 1e-3 && math.abs(a.f - g.f) < 1e-3,
      s"origin (${a.c},${a.f}) vs (${g.c},${g.f})")
  }

  test("GeoJP2 is found even when another uuid box (e.g. XMP) precedes it") {
    // splice a foreign uuid box in front of the whole box sequence after
    // the 12-byte signature box — GDAL/ExifTool commonly emit an XMP uuid
    // box before the GeoJP2 one; matching the FIRST uuid box would then
    // silently drop georeferencing
    val orig = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(jp2))
    val xmpUuid = Array(0xbe, 0x7a, 0xcf, 0xcb, 0x97, 0xa9, 0x42, 0xe8,
      0x9c, 0x71, 0x99, 0x94, 0x91, 0xe3, 0xaf, 0xac).map(_.toByte)
    val payload = "<x:xmpmeta/>".getBytes("UTF-8")
    val boxLen = 8 + 16 + payload.length
    val box = java.nio.ByteBuffer.allocate(boxLen)
      .putInt(boxLen).put("uuid".getBytes("ISO-8859-1"))
      .put(xmpUuid).put(payload).array()
    // insert after the ftyp box so the signature+ftyp prefix Jp2Probe
    // validates stays first (sig box is 12 bytes; ftyp length is its u32)
    val ftypEnd = 12 + java.nio.ByteBuffer.wrap(orig, 12, 4).getInt
    val spliced = orig.take(ftypEnd) ++ box ++ orig.drop(ftypEnd)
    val f = java.io.File.createTempFile("xmpfirst", ".jp2")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, spliced)
    val r = RasterOpen.open(f.getAbsolutePath)
    assert(r.crs === golden.crs)
    assert(math.abs(r.affine.c - golden.affine.c) < 1e-3 &&
      math.abs(r.affine.f - golden.affine.f) < 1e-3)
  }

  test("crop-boundless mask parity with the GeoTIFF twin (test_georaster.py:905-928)") {
    import graft.raster.{TileServe, Windows}
    // the reference's three ROI cases: intersecting / inside / disjoint
    val rois = Seq(
      (-6572853.0, -4072334.0, -6569253.0, -4068359.0),
      (-6572853.0, -4075105.0, -6569253.0, -4071131.0),
      (-6565154.0, -4075105.0, -6561555.0, -4071131.0))
    for (roi <- rois) {
      val wj = Windows.vectorToRasterBounds(roi, decoded.affine,
        decoded.width, decoded.height, boundless = true)
      val wt = Windows.vectorToRasterBounds(roi, golden.affine,
        golden.width, golden.height, boundless = true)
      assert(wj === wt, s"windows diverge for $roi")
      val cj = TileServe.getWindow(decoded, wj, wj.width.toInt, wj.height.toInt, decoded.affine)
      val ct = TileServe.getWindow(golden, wt, wt.width.toInt, wt.height.toInt, golden.affine)
      assert(cj.mask.toSeq === ct.mask.toSeq, s"mask parity broken for $roi")
    }
  }

  test("decode is deterministic (same bytes, same pixels)") {
    val again = RasterOpen.open(jp2)
    var b = 0
    while (b < 3) {
      assert(java.util.Arrays.equals(again.image(b), decoded.image(b)))
      b += 1
    }
  }

  test("unsupported codestream features are refused BY NAME") {
    // SOC + COD with the selective-bypass code-block style bit set
    def cod(style: Int): Array[Byte] =
      Array(0xff, 0x4f, 0xff, 0x52, 0x00, 0x0c, // SOC, COD, Lcod=12
        0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x04, 0x04, style, 0x00).map(_.toByte)
    val e1 = intercept[UnsupportedOperationException](Jp2Decoder.decode(cod(0x01)))
    assert(e1.getMessage.contains("arithmetic bypass"))
    val e2 = intercept[UnsupportedOperationException](Jp2Decoder.decode(cod(0x04)))
    assert(e2.getMessage.contains("terminate-each-pass"))
    // POC in the main header
    val poc = Array(0xff, 0x4f, 0xff, 0x5f, 0x00, 0x09,
      0x00, 0x00, 0x00, 0x00, 0x01, 0x0a, 0x00).map(_.toByte)
    val e3 = intercept[UnsupportedOperationException](Jp2Decoder.decode(poc))
    assert(e3.getMessage.contains("POC"))
  }

  test("a truncated codestream fails with the corrupt-contract exception") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(jp2))
    val cs = {
      // locate jp2c payload
      var off = 0
      var found: Array[Byte] = null
      while (found == null) {
        val len = ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
        val t = new String(bytes, off + 4, 4, "ISO-8859-1")
        if (t == "jp2c") found = bytes.slice(off + 8, off + len.toInt)
        else off += len.toInt
      }
      found
    }
    // cut inside the tile body: the packet walk must throw the contract's
    // IllegalArgumentException, never an index error
    for (cut <- Seq(90, 200, 1000, cs.length - 100)) {
      try Jp2Decoder.decode(cs.take(cut))
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("JPEG2000") || e.getMessage.contains("packet") ||
            e.getMessage.contains("tile"), e.getMessage)
      }
    }
  }

  // ------------------------------------------------- 2. MQ coder round-trip

  /** MQ encoder per ISO 15444-1 / ITU T.88 Annex C (INITENC, CODEMPS,
    * CODELPS, BYTEOUT, FLUSH) — written independently of the decoder so a
    * round-trip failure localizes a spec misreading on one side. */
  private final class MqEncoder {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var a = 0x8000
    private var c = 0L
    private var ct = 12
    private var bp = -1 // index of B in out; -1 = no byte emitted yet

    private def bVal: Int = if (bp < 0) 0 else out(bp) & 0xff

    private def byteOut(): Unit = {
      if (bVal == 0xff) {
        bp += 1; out += ((c >>> 20) & 0xff).toByte; c &= 0xfffff; ct = 7
      } else if (c < 0x8000000L) {
        bp += 1; out += ((c >>> 19) & 0xff).toByte; c &= 0x7ffff; ct = 8
      } else {
        out(bp) = ((bVal + 1) & 0xff).toByte
        if ((out(bp) & 0xff) == 0xff) {
          c &= 0x7ffffff
          bp += 1; out += ((c >>> 20) & 0xff).toByte; c &= 0xfffff; ct = 7
        } else {
          bp += 1; out += ((c >>> 19) & 0xff).toByte; c &= 0x7ffff; ct = 8
        }
      }
    }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteOut()
        a <<= 1; c <<= 1; ct -= 1
      } while ((a & 0x8000) == 0)
    }

    def encode(cx: Array[Int], i: Int, d: Int): Unit = {
      val st = cx(2 * i); val mps = cx(2 * i + 1)
      val qe = Jp2Decoder.QeTab(st)
      if (d == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          cx(2 * i) = Jp2Decoder.NmpsTab(st)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Jp2Decoder.SwitchTab(st) == 1) cx(2 * i + 1) = 1 - mps
        cx(2 * i) = Jp2Decoder.NlpsTab(st)
        renorm()
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS (C.2.9): fill the unsent low bits with ONES — the decoder
      // synthesizes 0xFF bytes past the stream end, so the chosen code
      // value's discarded tail must be all-1s, not a 0x8000 multiple
      val tempC = c + a
      c |= 0xffffL
      if (c >= tempC) c -= 0x8000L
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (bVal != 0xff) { bp += 1; out += 0xff.toByte }
      out.toArray
    }
  }

  test("MQ encoder->decoder round-trips 50k random decisions across 19 contexts") {
    val rng = new scala.util.Random(15444)
    for (trial <- 1 to 20) {
      val n = 50 + rng.nextInt(5000)
      val nCtx = 1 + rng.nextInt(19)
      val decisions = Array.fill(n)(rng.nextInt(2))
      val ctxOf = Array.fill(n)(rng.nextInt(nCtx))
      val encCx = new Array[Int](2 * nCtx)
      // seed some contexts at the spec's special initial states
      if (nCtx > 17) { encCx(2 * 17) = 3; encCx(2 * 18) = 46 }
      if (nCtx > 0) encCx(0) = 4
      val decCx = encCx.clone()
      val enc = new MqEncoder
      var i = 0
      while (i < n) { enc.encode(encCx, ctxOf(i), decisions(i)); i += 1 }
      val bytes = enc.flush()
      val dec = new Jp2Decoder.MqDecoder(bytes)
      i = 0
      while (i < n) {
        val d = dec.decode(decCx, ctxOf(i))
        assert(d === decisions(i), s"trial $trial decision $i of $n")
        i += 1
      }
    }
  }

  // ------------------------------------------------------ 3. DWT round-trip

  /** Forward 5/3 (F.3.8.1): the algebraic reverse of the decoder's
    * synthesis — odd (high) samples first, then even. */
  private def fwd53(x: Array[Double], i0: Int): Array[Double] = {
    val n = x.length
    if (n == 1) return if ((i0 & 1) == 0) x.clone() else Array(x(0) * 2)
    val i1 = i0 + n
    def ext(i: Int): Int = {
      val period = 2 * (n - 1)
      var d = ((i - i0) % period + period) % period
      if (d >= n) d = period - d
      d
    }
    val y = new Array[Double](n)
    var i = if ((i0 & 1) == 0) i0 + 1 else i0
    while (i < i1) {
      y(i - i0) = x(i - i0) - math.floor((x(ext(i - 1)) + x(ext(i + 1))) / 2.0)
      i += 2
    }
    i = if ((i0 & 1) == 0) i0 else i0 + 1
    while (i < i1) {
      y(i - i0) = x(i - i0) + math.floor((y(ext(i - 1)) + y(ext(i + 1)) + 2) / 4.0)
      i += 2
    }
    y
  }

  /** Forward 9/7: lifting with the ISO Table F.4 constants, additive, in
    * the order alpha, beta, gamma, delta, then the normalization the
    * decoder undoes (low / K, high * K/2). */
  private def fwd97(x0: Array[Double], i0: Int): Array[Double] = {
    val n = x0.length
    if (n == 1) return if ((i0 & 1) == 0) x0.clone() else Array(x0(0) * 2)
    val i1 = i0 + n
    val x = x0.clone()
    def ext(i: Int): Int = {
      val period = 2 * (n - 1)
      var d = ((i - i0) % period + period) % period
      if (d >= n) d = period - d
      d
    }
    def lift(odd: Boolean, coef: Double): Unit = {
      var k = if (((i0 & 1) == 0) == odd) i0 + 1 else i0
      while (k < i1) {
        x(k - i0) += coef * (x(ext(k - 1)) + x(ext(k + 1)))
        k += 2
      }
    }
    val (a, b, g, d) = (-1.586134342059924, -0.052980118572961,
      0.882911075530934, 0.443506852043971)
    lift(odd = true, a); lift(odd = false, b)
    lift(odd = true, g); lift(odd = false, d)
    val K = 1.230174104914001
    var i = i0
    while (i < i1) {
      if ((i & 1) == 0) x(i - i0) /= K else x(i - i0) *= K / 2.0
      i += 1
    }
    x
  }

  test("inverse 5/3 lifting inverts the forward EXACTLY for all sizes 1..17 and offsets") {
    val rng = new scala.util.Random(53)
    for (n <- 1 to 17; i0 <- Seq(0, 1, 4, 7); _ <- 1 to 5) {
      val x = Array.fill(n)((rng.nextInt(512) - 256).toDouble)
      val back = Jp2Decoder.sr1d(fwd53(x, i0), i0, rev = true)
      assert(back.toSeq === x.toSeq, s"n=$n i0=$i0")
    }
  }

  test("inverse 9/7 lifting inverts the forward to 1e-9 for all sizes 1..17 and offsets") {
    val rng = new scala.util.Random(97)
    for (n <- 1 to 17; i0 <- Seq(0, 1, 4, 7); _ <- 1 to 5) {
      val x = Array.fill(n)(rng.nextDouble() * 512 - 256)
      val back = Jp2Decoder.sr1d(fwd97(x, i0), i0, rev = false)
      var k = 0
      while (k < n) {
        assert(math.abs(back(k) - x(k)) < 1e-9, s"n=$n i0=$i0 k=$k: ${back(k)} vs ${x(k)}")
        k += 1
      }
    }
  }
}
