package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** calc_transform parameter matrix + error contracts, mirroring
  * tests/test_georaster_reproject.py (23 cases) over the engine's working
  * CRS pair. */
class ReprojectSpec extends AnyFunSuite {

  private def src(w: Int = 100, h: Int = 50, crs: Int = 4326): MRaster =
    MRaster.filled(w, h, 7.0, Seq("1"), Affine.northUp(10, 40, 0.1, 0.2), crs,
      "uint8", None) // bounds (10, 30, 20, 40)

  test("invalid-param combinations raise with the reference's messages") {
    val r = src()
    val e1 = intercept[IllegalArgumentException](
      Reproject.calcTransform(r, targetAlignedPixels = true))
    assert(e1.getMessage.contains("cannot be used without resolution"))
    val e2 = intercept[IllegalArgumentException](
      Reproject.calcTransform(r, resolution = Some((1, 1)),
        srcBounds = Some((0, 0, 1, 1)), targetAlignedPixels = true))
    assert(e2.getMessage.contains("cannot be used with src_bounds or dst_bounds"))
    val e3 = intercept[IllegalArgumentException](
      Reproject.calcTransform(r, dimensions = Some((5, 5)), resolution = Some((1, 1))))
    assert(e3.getMessage.contains("dimensions cannot be used"))
    val e4 = intercept[IllegalArgumentException](
      Reproject.calcTransform(r, srcBounds = Some((0, 0, 1, 1)),
        dstBounds = Some((0, 0, 1, 1))))
    assert(e4.getMessage.contains("may not be specified simultaneously"))
    val e5 = intercept[IllegalArgumentException](
      Reproject.calcTransform(r, dstCrs = Some(3857), srcBounds = Some((0, 0, 1, 1))))
    assert(e5.getMessage.contains("resolution is required"))
  }

  test("no params → identity grid") {
    val r = src()
    val g = Reproject.calcTransform(r)
    assert(g.dstCrs === r.crs && g.transform === r.affine)
    assert(g.width === r.width && g.height === r.height)
  }

  test("same-CRS resolution change") {
    val g = Reproject.calcTransform(src(), resolution = Some((0.5, 0.5)))
    assert(g.width === 20 && g.height === 20) // 10° x 10° at 0.5°
    assert(g.transform.a === 0.5 && g.transform.e === -0.5)
    assert(g.transform.c === 10.0 && g.transform.f === 40.0)
  }

  test("same-CRS dimensions change computes resolution") {
    val g = Reproject.calcTransform(src(), dimensions = Some((50, 25)))
    assert(g.width === 50 && g.height === 25)
    assert(g.transform.a === 0.2 && g.transform.e === -0.4)
  }

  test("same-CRS src_bounds uses source resolution by default") {
    val g = Reproject.calcTransform(src(), srcBounds = Some((12.0, 32.0, 14.0, 36.0)))
    assert(g.transform.c === 12.0 && g.transform.f === 36.0)
    assert(g.width === 20 && g.height === 20) // 2°/0.1, 4°/0.2
  }

  test("cross-CRS default transform preserves coverage") {
    val g = Reproject.calcTransform(src(), dstCrs = Some(3857))
    assert(g.dstCrs === 3857)
    // 10..20 lon → ~1113 km; bounds must cover the reprojected extent
    val (xmin, _, xmax, _) = Reproject.transformBounds(4326, 3857, (10, 30, 20, 40))
    assert(math.abs(g.transform.c - xmin) < 1e-6)
    assert(g.transform.c + g.transform.a * g.width >= xmax - g.transform.a)
  }

  test("target_aligned_pixels snaps bounds to the resolution grid") {
    val g = Reproject.calcTransform(src(), resolution = Some((0.3, 0.3)),
      targetAlignedPixels = true)
    assert(math.abs(g.transform.c / 0.3 - math.rint(g.transform.c / 0.3)) < 1e-9)
    assert(math.abs(g.transform.f / 0.3 - math.rint(g.transform.f / 0.3)) < 1e-9)
  }

  test("metamorphic: reproject 4326→3857→4326 preserves data (nearest)") {
    val r = src()
    val m = Reproject.reproject(r, dstCrs = Some(3857))
    assert(m.crs === 3857)
    assert(m.numPixelsData > 0)
    val back = Reproject.reproject(m, dstCrs = Some(4326),
      resolution = Some((0.1, 0.2)))
    assert(back.crs === 4326)
    // constant-fill raster survives the round trip wherever unmasked
    val vals = back.image(0).zip(back.mask).collect { case (v, false) => v }
    assert(vals.nonEmpty && vals.forall(_ === 7.0))
  }

  test("cubic kernel: partition of unity + Keys a=-0.5 shape") {
    // Σ w(t-2..t+1) == 1 for any phase t
    for (t <- Seq(0.0, 0.13, 0.5, 0.99)) {
      val s = (-1 to 2).map(d => Resample.cubicWeight(d - t)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"phase $t")
    }
    assert(Resample.cubicWeight(0.0) === 1.0)
    assert(Resample.cubicWeight(1.0) === 0.0)
    assert(Resample.cubicWeight(2.0) === 0.0)
  }

  test("cubic resampling reproduces constants and linear ramps exactly (interior)") {
    val w = 32; val h = 32
    val ramp = Array.tabulate(w * h)(i => 2.0 * (i % w) + 3.0 * (i / w) + 5.0)
    val r = MRaster(Array(ramp), Array.fill(w * h)(false), w, h,
      Affine.northUp(0, h, 1.0, 1.0), 4326, Seq("1"), "float64", None)
    // regrid onto a half-pixel-shifted, 1.5x-upsampled grid
    val out = Reproject.reproject(r,
      dstBounds = Some((4.25, 4.25, 27.75, 27.75)),
      resolution = Some((0.66, 0.66)), resampling = Resample.Cubic)
    var i = 0
    var checked = 0
    while (i < out.width * out.height) {
      if (!out.mask(i)) {
        val (gx, gy) = out.affine(i % out.width + 0.5, i / out.width + 0.5)
        // interior only: edge clamping breaks linearity in the outer 2 px
        if (gx > 2 && gx < w - 2 && gy > 2 && gy < h - 2) {
          val expect = 2.0 * (gx - 0.5) + 3.0 * ((h - gy) - 0.5) + 5.0
          assert(math.abs(out.image(0)(i) - expect) < 1e-9, s"at ($gx,$gy)")
          checked += 1
        }
      }
      i += 1
    }
    assert(checked > 500)
  }

  test("cubic vs nearest tolerance on a smooth field; all-masked stays masked") {
    val w = 64; val h = 64
    val f = Array.tabulate(w * h) { i =>
      val x = (i % w) / 8.0; val y = (i / w) / 8.0
      100.0 + 40.0 * math.sin(x) * math.cos(y)
    }
    val mask = Array.tabulate(w * h)(i => i % w >= w - 8) // masked right strip
    val r = MRaster(Array(f), mask, w, h, Affine.northUp(0, h, 1, 1), 4326, Seq("1"), "float64", None)
    val cub = Reproject.reproject(r, dimensions = Some((48, 48)), resampling = Resample.Cubic)
    val near = Reproject.reproject(r, dimensions = Some((48, 48)), resampling = Resample.Nearest)
    var i = 0
    while (i < 48 * 48) {
      // masked region agrees; unmasked cubic stays within the local range
      assert(cub.mask(i) === near.mask(i) || !cub.mask(i))
      if (!cub.mask(i) && !near.mask(i))
        assert(math.abs(cub.image(0)(i) - near.image(0)(i)) < 15.0)
      i += 1
    }
    // fully-masked source → fully-masked output
    val dead = r.copy(mask = Array.fill(w * h)(true))
    val deadOut = Reproject.reproject(dead, dimensions = Some((16, 16)), resampling = Resample.Cubic)
    assert(deadOut.mask.forall(identity))
  }

  test("cubic_spline: flat field exact, smooth field near cubic, low-frequency field near nearest") {
    val w = 64; val h = 64
    // flat uint8 field: partition-of-unity kernel + dtype rounding → exact
    val flat = MRaster.filled(w, h, 7.0, Seq("1"),
      Affine.northUp(0, h, 1, 1), 4326, "uint8", None)
    val flatOut = Reproject.reproject(flat, dimensions = Some((40, 40)),
      resampling = Resample.CubicSpline)
    assert(flatOut.image(0).forall(_ === 7.0))
    assert(!flatOut.mask.exists(identity))

    // smooth field: spline is a smoother (no overshoot) — must track the
    // Keys cubic within a tolerance AND stay within the local value range
    val f = Array.tabulate(w * h) { i =>
      val x = (i % w) / 8.0; val y = (i / w) / 8.0
      100.0 + 40.0 * math.sin(x) * math.cos(y)
    }
    val r = MRaster(Array(f), Array.fill(w * h)(false), w, h,
      Affine.northUp(0, h, 1, 1), 4326, Seq("1"), "float64", None)
    val spl = Reproject.reproject(r, dimensions = Some((48, 48)),
      resampling = Resample.CubicSpline)
    val cub = Reproject.reproject(r, dimensions = Some((48, 48)),
      resampling = Resample.Cubic)
    var i = 0
    while (i < 48 * 48) {
      assert(math.abs(spl.image(0)(i) - cub.image(0)(i)) < 8.0)
      assert(spl.image(0)(i) >= 60.0 - 1e-9 && spl.image(0)(i) <= 140.0 + 1e-9,
        "B-spline must not overshoot the data range")
      i += 1
    }

    // metamorphic vs nearest at LOW frequency: a slowly-varying ramp is
    // reproduced to within the per-pixel step by the approximating spline
    val ramp = Array.tabulate(w * h)(i => 1000.0 + 0.5 * (i % w) + 0.25 * (i / w))
    val rr = MRaster(Array(ramp), Array.fill(w * h)(false), w, h,
      Affine.northUp(0, h, 1, 1), 4326, Seq("1"), "float64", None)
    val sOut = Reproject.reproject(rr, dimensions = Some((32, 32)),
      resampling = Resample.CubicSpline)
    val nOut = Reproject.reproject(rr, dimensions = Some((32, 32)),
      resampling = Resample.Nearest)
    i = 0
    while (i < 32 * 32) {
      assert(math.abs(sOut.image(0)(i) - nOut.image(0)(i)) <= 1.5)
      i += 1
    }

    // fully-masked source stays masked
    val dead = r.copy(mask = Array.fill(w * h)(true))
    assert(Reproject.reproject(dead, dimensions = Some((16, 16)),
      resampling = Resample.CubicSpline).mask.forall(identity))
  }

  test("cubic_spline vs cubic on the reference rgb.tif fixture (cross-CRS get_tile default)") {
    val r = graft.io.GeoTiffIO.read("/root/reference/tests/data/raster/rgb.tif")
    // band-0 means under both kernels on a modest reprojection must agree
    // closely (the spline smooths, it must not bias)
    val spl = Reproject.reproject(r, dimensions = Some((64, 64)),
      resampling = Resample.CubicSpline)
    val cub = Reproject.reproject(r, dimensions = Some((64, 64)),
      resampling = Resample.Cubic)
    var diffSum = 0.0; var n = 0
    var i = 0
    while (i < 64 * 64) {
      if (!spl.mask(i) && !cub.mask(i)) {
        diffSum += math.abs(spl.image(0)(i) - cub.image(0)(i)); n += 1
      }
      assert(spl.mask(i) === cub.mask(i), "kernels must agree on validity")
      i += 1
    }
    assert(n > 1000, s"too few valid pixels: $n")
    assert(diffSum / n < 10.0, s"mean |spline−cubic| = ${diffSum / n}")
  }

  test("reproject matches getTile4326 on a tile-aligned target") {
    // same sampling rule ⇒ same pixels for a 4326 source onto a 3857 grid
    val (w, s, e, n) = graft.core.Mercator.lngLatBounds(2, 2, 2)
    val r = MRaster.filled(128, 128, 3.0, Seq("1"),
      Affine.northUp(w, n, (e - w) / 128, (n - s) / 128), 4326, "uint8", None)
    val viaTile = RasterOps.getTile4326(r, 2, 2, 2, Resample.Nearest)
    val b = graft.core.Mercator.xyBounds(2, 2, 2)
    val res = graft.core.Mercator.resolution(2)
    val viaReproject = Reproject.reproject(r, dstCrs = Some(3857),
      resolution = Some((res, res)), dstBounds = Some((b.left, b.bottom, b.right, b.top)))
    assert(viaReproject.width === 256 && viaReproject.height === 256)
    assert(viaReproject.image(0).toSeq === viaTile.image(0).toSeq)
    assert(viaReproject.mask.toSeq === viaTile.mask.toSeq)
  }
}
