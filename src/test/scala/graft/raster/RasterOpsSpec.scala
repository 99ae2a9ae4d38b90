package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom

/** crop/resize/stretch/zoom helpers vs reference semantics
  * (georaster.py:1374-1425 resize matrix, :1264-1309 pixel_crop,
  * util/histogram.py, plotting.py:70-93, util/general.py:5-17),
  * plus the crop ≡ get_window metamorphic relation the reference's own
  * suite relies on (tests/test_georaster_tiling.py:217-343). */
class RasterOpsSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, dtype: String = "uint8"): MRaster = {
    val img = Array.tabulate(w * h)(i => (i % 200).toDouble + 1)
    MRaster(Array(img), Array.fill(w * h)(false), w, h,
      Affine.northUp(0, h, 1, 1), 3857, Seq("1"), dtype, None)
  }

  test("resize validation matrix (georaster.py:1391-1394)") {
    val r = gradient(10, 10)
    intercept[IllegalArgumentException](RasterOps.resize(r)) // nothing
    intercept[IllegalArgumentException](
      RasterOps.resize(r, ratio = Some(2.0), destWidth = Some(5))) // two
    assert(RasterOps.resize(r, ratio = Some(2.0)).width === 20)
    assert(RasterOps.resize(r, destWidth = Some(5), destHeight = Some(7)).height === 7)
    assert(RasterOps.resize(r, destResolution = Some(2.0)).width === 5)
    val r2 = RasterOps.resize(r, ratioX = Some(2.0), ratioY = Some(0.5))
    assert(r2.width === 20 && r2.height === 5)
    // affine scales inversely (georaster.py:1413)
    assert(r2.affine.a === 0.5 && r2.affine.e === -2.0)
  }

  test("pixel slice translates affine (georaster.py:1064-1092)") {
    val r = gradient(10, 10)
    val s = RasterOps.pixelSlice(r, 2, 3, 7, 8)
    assert(s.width === 5 && s.height === 5)
    assert(s.affine.c === 2.0 && s.affine.f === 7.0) // f = 10 - 3
    assert(s.get(0, 0, 0) === r.get(0, 2, 3))
  }

  test("pixel_crop shape contracts (test_merge_all.py:146-154)") {
    val r = gradient(100, 100)
    assert(RasterOps.pixelCrop(r, (0, 0, 100, 100)).width === 100)
    val small = RasterOps.pixelCrop(r, (0, 0, 10, 10), Some(10), Some(10))
    assert(small.width === 10 && small.height === 10)
    val up = RasterOps.pixelCrop(r, (0, 0, 50, 50), Some(100), Some(100))
    assert(up.width === 100 && up.height === 100)
  }

  test("metamorphic: crop ≡ get_window on the same world bounds (test_georaster_tiling.py:217-343)") {
    val r = gradient(64, 64)
    val bounds = (10.0, 20.0, 42.0, 52.0)
    val cropped = RasterOps.crop(r, bounds)
    val w = Windows.vectorToRasterBounds(bounds, r.affine, r.width, r.height, boundless = false)
    val windowed = TileServe.getWindow(r, w, cropped.width, cropped.height, cropped.affine)
    assert(cropped.image(0).toSeq === windowed.image(0).toSeq)
    assert(cropped.mask.toSeq === windowed.mask.toSeq)
  }

  test("stretch_histogram by value and error contracts (util/histogram.py)") {
    val r = gradient(10, 10)
    val s = RasterOps.stretchHistogram(r, darkClipValue = Some(1.0),
      brightClipValue = Some(100.0)) // gradient values span 1..100
    // v=1 → dstMin(0); v=100 → dstMax(255)
    assert(s.image(0).min === 0.0)
    assert(s.image(0).max === 255.0)
    intercept[IllegalArgumentException](
      RasterOps.stretchHistogram(r, darkClipPercentile = Some(0.1),
        darkClipValue = Some(1.0)))
    val const = MRaster.filled(4, 4, 9, Seq("1"), Affine.northUp(0, 4, 1, 1), 3857, "uint8", None)
    intercept[RasterOps.HistogramStretchingError](
      RasterOps.stretchHistogram(const))
  }

  test("meter↔degree helpers (util/general.py:5-17)") {
    val (mLat, mLon) = GeoUnits.meterToLatLonDeg(0.0)
    assert(math.abs(mLat - 1 / 111320.0) < 1e-12)
    assert(math.abs(mLon - 1 / 111320.0) < 1e-12)
    val (dLon60, dLat60) = GeoUnits.resolutionMetersToDeg(60.0, 1000.0)
    assert(math.abs(dLat60 - 1000.0 / 111320.0) < 1e-9)
    assert(dLon60 > dLat60 * 1.9 && dLon60 < dLat60 * 2.1) // cos(60°)=0.5
  }

  test("zoom_level_from_geometry: median_low over 4×4 split (plotting.py:70-93)") {
    // the baotou AOI (tests/test_geovector.py:551-566) sits inside one z15
    // tile; a 4x4 split gives small chunks with deep bounding tiles.
    val bb = Geom.BBox(109.612458654485849, 40.864326676241866,
      109.619116438865731, 40.867336965196827)
    val z = GeoUnits.zoomLevelFromGeometry(bb)
    assert(z >= 15 && z <= 22, s"z=$z")
    // a hemisphere-scale bbox must give a small zoom
    val world = Geom.BBox(-120, -40, 60, 50)
    assert(GeoUnits.zoomLevelFromGeometry(world) <= 3)
  }

  test("bounding tile zoom basics (mercantile.bounding_tile semantics)") {
    // a bbox inside one z15 tile
    val (w, s, e, n) = Mercantile.tileBounds(26361, 12301, 15)
    val z = GeoUnits.boundingTileZoom(w + 1e-4, s + 1e-4, e - 1e-4, n - 1e-4)
    assert(z >= 15)
  }

  test("limit_to_bands preserves order, errors on missing (georaster.py:1680-1689)") {
    val img = Array(Array.fill(4)(1.0), Array.fill(4)(2.0), Array.fill(4)(3.0))
    val r = MRaster(img, Array.fill(4)(false), 2, 2, Affine.northUp(0, 2, 1, 1),
      3857, Seq("red", "green", "blue"), "uint8", None)
    val sel = RasterOps.limitToBands(r, Seq("blue", "red"))
    assert(sel.bandNames === Seq("blue", "red"))
    assert(sel.get(0, 0, 0) === 3.0 && sel.get(1, 0, 0) === 1.0)
    intercept[IllegalArgumentException](RasterOps.limitToBands(r, Seq("nir")))
  }

  test("mask by vector: outside-default and inverted (georaster.py:1850-1871)") {
    val r = gradient(10, 10)
    val shape = Geom.polygonFromBounds(2, 2, 6, 6)
    val outside = RasterOps.maskByVector(r, Seq(shape))
    assert(outside.masked(0, 0))          // outside the shape → masked
    assert(!outside.masked(3, 5))         // inside stays
    val inside = RasterOps.maskByVector(r, Seq(shape), maskShapeNodata = true)
    assert(!inside.masked(0, 0))
    assert(inside.masked(3, 5))
    // pixel counts complement (mask ∪ original false mask)
    assert(outside.numPixelsNodata + inside.numPixelsNodata === r.numPixels)
  }

  test("mask_by_value and invert (georaster.py:1845-1881)") {
    val img = Array(Array(0.0, 5.0, 0.0, 7.0))
    val r = MRaster(img, Array.fill(4)(false), 2, 2, Affine.northUp(0, 2, 1, 1),
      3857, Seq("1"), "uint8", None)
    val m = RasterOps.maskByValue(r, 0.0)
    assert(m.mask.toSeq === Seq(true, false, true, false))
    assert(RasterOps.invertMask(m).mask.toSeq === Seq(false, true, false, true))
  }

  test("cross-CRS get_tile: 4326 raster → 3857 tile, canonical affine") {
    // a WGS84 raster covering the whole bbox of tile (2,2,2)
    val (w, s, e, n) = graft.core.Mercator.lngLatBounds(2, 2, 2)
    val width = 256; val height = 256
    val r = MRaster(Array(Array.fill(width * height)(9.0)),
      Array.fill(width * height)(false), width, height,
      Affine.northUp(w, n, (e - w) / width, (n - s) / height), 4326,
      Seq("1"), "uint8", None)
    val t = RasterOps.getTile4326(r, 2, 2, 2)
    assert(t.crs === 3857)
    assert(t.width === 256 && t.height === 256)
    assert(math.abs(t.affine.a - graft.core.Mercator.resolution(2)) < 1e-9)
    assert(!t.mask.exists(identity))
    assert(t.image(0).forall(_ === 9.0))
    // a disjoint tile leaves everything masked
    val miss = RasterOps.getTile4326(r, 0, 0, 2)
    assert(miss.mask.forall(identity))
  }

  private object Mercantile {
    def tileBounds(x: Long, y: Long, z: Int): (Double, Double, Double, Double) =
      graft.core.Mercator.lngLatBounds(x, y, z)
  }
}
