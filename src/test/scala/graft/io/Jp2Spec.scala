package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** JPEG2000 error contract (VERDICT r3 "What's missing" #1): the engine
  * cannot decode JP2 codestreams (no JVM codec), but opening the
  * reference's own fixture must fail INFORMATIVELY — with the parsed image
  * geometry and the conversion hint — never with a generic unknown-format
  * error. Reference: tests/data/raster/rgb.jp2, used across
  * tests/test_georaster.py. */
class Jp2Spec extends AnyFunSuite {

  private val fixture = "/root/reference/tests/data/raster/rgb.jp2"

  test("reference rgb.jp2 parses: 100x100, 3 components, 8-bit") {
    val h = Jp2Probe.header(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture)))
    assert(h.width === 100 && h.height === 100)
    assert(h.nc === 3 && h.bpc === 8)
  }

  test("RasterOpen.open refuses rgb.jp2 with the parsed geometry in the message") {
    val e = intercept[UnsupportedOperationException](RasterOpen.open(fixture))
    assert(e.getMessage.contains("100×100 3-component 8-bit JPEG2000"))
    assert(e.getMessage.contains("gdal_translate"), "conversion hint missing")
  }

  test("a non-JP2 file with a .jp2 extension fails the signature check") {
    val p = java.nio.file.Files.createTempFile("fake", ".jp2")
    java.nio.file.Files.write(p, "definitely not a jp2".getBytes)
    val e = intercept[IllegalArgumentException](RasterOpen.open(p.toString))
    assert(e.getMessage.contains("missing the 12-byte JP2 signature box"))
  }

  test("a truncated JP2 container names the box the data ends inside") {
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    // cut inside ftyp (box claims 24 bytes, 20 remain)
    val e1 = intercept[IllegalArgumentException](Jp2Probe.header(full.take(32)))
    assert(e1.getMessage.contains("truncated 'ftyp' box"))
    // cut exactly at a box boundary before jp2h appears
    val e2 = intercept[IllegalArgumentException](Jp2Probe.header(full.take(57)))
    assert(e2.getMessage.contains("no jp2h"))
    // cut inside the jp2h superbox (the pre-round-4 parser crashed with
    // ArrayIndexOutOfBounds here instead of the contract's exception)
    val e3 = intercept[IllegalArgumentException](Jp2Probe.header(full.take(80)))
    assert(e3.getMessage.contains("truncated 'jp2h' box"))
  }

  test("EVERY prefix of rgb.jp2 either parses or throws the contract exception") {
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    var parsed = 0
    for (n <- 0 to full.length) {
      try {
        val h = Jp2Probe.header(full.take(n))
        assert(h.width === 100 && h.height === 100 && h.nc === 3)
        parsed += 1
      } catch {
        case _: IllegalArgumentException => // the contract
        // anything else (ArrayIndexOutOfBounds, NegativeArraySize…) fails
      }
    }
    assert(parsed > 0, "no prefix parsed — sweep is vacuous")
  }

  /** [len][type] with u32 length, then payload. */
  private def box(t: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length); b.put(t.getBytes("ISO-8859-1")); b.put(payload)
    b.array()
  }

  private val signature = Array(0x00, 0x00, 0x00, 0x0c, 0x6a, 0x50, 0x20,
    0x20, 0x0d, 0x0a, 0x87, 0x0a).map(_.toByte)

  private def ihdr(h: Int, w: Int, nc: Int, bpcMinus1: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(14)
    b.putInt(h); b.putInt(w); b.putShort(nc.toShort)
    b.put(bpcMinus1.toByte); b.put(7.toByte); b.put(1.toByte); b.put(0.toByte)
    b.array()
  }

  test("XLBox extended-length boxes (length field 1, u64 follows) are walked, not rejected") {
    // a uuid metadata box in XLBox form before jp2h — spec-valid (ISO 15444-1 I.4)
    val payload = Array.fill[Byte](10)(0x55)
    val xl = java.nio.ByteBuffer.allocate(16 + payload.length)
    xl.putInt(1); xl.put("uuid".getBytes("ISO-8859-1"))
    xl.putLong(16L + payload.length); xl.put(payload)
    val doc = signature ++ xl.array() ++ box("jp2h", box("ihdr", ihdr(7, 9, 2, 7)))
    val h = Jp2Probe.header(doc)
    assert(h.height === 7 && h.width === 9 && h.nc === 2 && h.bpc === 8)
  }

  test("a lying >2 GiB box length is reported truncated, never a negative index") {
    val bad = java.nio.ByteBuffer.allocate(8)
    bad.putInt(0x80000010) // 2^31 + 16 — negative if truncated to Int
    bad.put("uuid".getBytes("ISO-8859-1"))
    val e = intercept[IllegalArgumentException](
      Jp2Probe.header(signature ++ bad.array()))
    assert(e.getMessage.contains("truncated 'uuid' box"))
  }

  test("an intact jp2h whose ihdr payload is shorter than the spec's 14 bytes") {
    val doc = signature ++ box("jp2h", box("ihdr", Array.fill[Byte](8)(0)))
    val e = intercept[IllegalArgumentException](Jp2Probe.header(doc))
    assert(e.getMessage.contains("ihdr payload is 8 bytes"))
  }

  test("fuzz: random bytes after a valid signature never escape the contract") {
    val rng = new scala.util.Random(0x6a5032) // deterministic ("jP2")
    for (_ <- 1 to 2000) {
      val body = Array.fill[Byte](rng.nextInt(200))(rng.nextInt(256).toByte)
      try Jp2Probe.header(signature ++ body)
      catch { case _: IllegalArgumentException => () } // the contract
      // any other exception (index/negative-size/…) fails the test
    }
  }
}
