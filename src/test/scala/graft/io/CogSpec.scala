package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.raster.{Affine, MRaster, RasterArtifact}

/** Single-file Cloud-Optimized GeoTIFF (save_cloud_optimized,
  * georaster.py:1923-1943): the writer's layout is validated by the Scala
  * port of the GDAL validator the reference vendors
  * (tests/util/validate_cloud_optimized_geotiff.py), then reopened and
  * compared band-for-band incl. the internal mask. */
class CogSpec extends AnyFunSuite {

  private def fixture(w: Int = 600, h: Int = 500): MRaster = {
    val img = (0 until 2).map { b =>
      Array.tabulate(w * h)(i => ((i * 31 + b * 7) % 251).toDouble)
    }.toArray
    val mask = Array.tabulate(w * h)(i => i % 97 == 0) // scattered invalid
    MRaster(img, mask, w, h, Affine.northUp(20.0, 30.0, 0.01, 0.01),
      4326, Seq("red", "nir"), "uint8", Some(255.0))
  }

  test("write → validate: zero errors from the ported GDAL COG checks") {
    val r = fixture()
    val path = Files.createTempDirectory("cog").resolve("c.tif").toString
    CogWriter.write(r, path)
    val errors = CogValidator.validate(path)
    assert(errors.isEmpty, errors.mkString("; "))
  }

  test("write → reopen ≡ id: pixels, mask, geo, dtype, band names, nodata") {
    val r = fixture()
    val path = Files.createTempDirectory("cog").resolve("c.tif").toString
    RasterOpen.save(r, path, cog = true)
    val back = RasterOpen.open(path)
    assert(back.width === r.width && back.height === r.height)
    assert(back.dtype === r.dtype && back.crs === r.crs)
    assert(back.bandNames === r.bandNames)
    assert(back.nodata === r.nodata)
    assert(math.abs(back.affine.a - r.affine.a) < 1e-12)
    assert(math.abs(back.affine.c - r.affine.c) < 1e-12)
    assert(math.abs(back.affine.f - r.affine.f) < 1e-12)
    (0 until r.numBands).foreach { b =>
      assert(back.image(b).toSeq === r.image(b).toSeq, s"band $b pixels")
    }
    // the internal mask IFD must reproduce the EXACT mask — including
    // valid pixels whose value happens to equal nodata (the heuristic the
    // mask IFD supersedes could not distinguish those)
    assert(back.mask.toSeq === r.mask.toSeq)
  }

  test("overview count and sizes follow _calc_overviews_factors; small rasters skip overviews") {
    val r = fixture()
    val path = Files.createTempDirectory("cog").resolve("c.tif").toString
    CogWriter.write(r, path)
    val factors = RasterArtifact.overviewFactors(r)
    assert(factors === Seq(2, 4), s"600×500 @256 blocksize: $factors")
    assert(CogValidator.validate(path).isEmpty)

    // < 512px: untiled/no-overview checks don't fire, file stays valid
    val small = fixture(200, 150)
    val p2 = Files.createTempDirectory("cog").resolve("s.tif").toString
    CogWriter.write(small, p2)
    assert(CogValidator.validate(p2).isEmpty)
    val back = GeoTiffIO.read(p2)
    assert(back.image(0).toSeq === small.image(0).toSeq)
    assert(back.mask.toSeq === small.mask.toSeq)
  }

  test("prop: randomized dtype/dims/bands/mask round-trips — validate + reopen ≡ id (20 cases)") {
    val rnd = new scala.util.Random(7)
    val dtypes = Seq("uint8", "uint16", "int16", "int32", "float32", "float64")
    val dir = Files.createTempDirectory("cogprop")
    (1 to 20).foreach { i =>
      val w = 1 + rnd.nextInt(700)
      val h = 1 + rnd.nextInt(600)
      val bands = 1 + rnd.nextInt(3)
      val dtype = dtypes(rnd.nextInt(dtypes.length))
      val img = (0 until bands).map { b =>
        Array.tabulate(w * h) { j =>
          val v = (j * 37 + b * 11 + i) % 251
          dtype match {
            case "float32" => java.lang.Float.valueOf(v + 0.5f).toDouble // f32-exact
            case "float64" => v + 0.25
            case "int16" | "int32" => (v - 125).toDouble
            case _ => v.toDouble
          }
        }
      }.toArray
      val mask = Array.tabulate(w * h)(j => (j * 13 + i) % (2 + rnd.nextInt(97)) == 0)
      val r = MRaster(img, mask, w, h,
        Affine.northUp(rnd.nextInt(100), rnd.nextInt(80), 0.01, 0.01),
        if (rnd.nextBoolean()) 4326 else 3857,
        (0 until bands).map(b => s"b$b"), dtype, None)
      val path = dir.resolve(s"p$i.tif").toString
      CogWriter.write(r, path)
      val errors = CogValidator.validate(path)
      assert(errors.isEmpty, s"case $i ($dtype ${w}x$h×$bands): $errors")
      val back = GeoTiffIO.read(path)
      assert(back.dtype === dtype && back.crs === r.crs, s"case $i meta")
      (0 until bands).foreach { b =>
        assert(back.image(b).toSeq === r.image(b).toSeq, s"case $i band $b")
      }
      assert(back.mask.toSeq === r.mask.toSeq, s"case $i mask")
    }
  }

  test("negative control: main-data-first layout is flagged by the ordering checks") {
    val r = fixture()
    val path = Files.createTempDirectory("cog").resolve("mainfirst.tif").toString
    CogWriter.writeLayout(r, path, CogWriter.BlockSize, cogDataOrder = false)
    val errors = CogValidator.validate(path)
    assert(errors.exists(_.contains("main resolution image")),
      s"ordering violation not flagged: $errors")
    // still a structurally valid TIFF — the reader reproduces it exactly
    val back = GeoTiffIO.read(path)
    assert(back.image(0).toSeq === r.image(0).toSeq)
    assert(back.mask.toSeq === r.mask.toSeq)
  }

  test("negative control: the baseline strip writer is NOT cloud-optimized for large rasters") {
    val r = fixture()
    val path = Files.createTempDirectory("cog").resolve("strips.tif").toString
    GeoTiffWriter.write(r, path)
    val errors = CogValidator.validate(path)
    assert(errors.exists(_.contains("not tiled")), errors.mkString("; "))
    assert(errors.exists(_.contains("no overviews")), errors.mkString("; "))
  }

  test("multi-level pyramid: 1200×900 gets factors 2, 4, 8, all checks green") {
    val w = 1200; val h = 900
    val img = Array(Array.tabulate(w * h)(i => (i % 211).toDouble))
    val r = MRaster(img, Array.fill(w * h)(false), w, h,
      Affine.northUp(0, 90, 0.1, 0.1), 4326, Seq("b"), "uint8", None)
    assert(RasterArtifact.overviewFactors(r) === Seq(2, 4, 8))
    val path = Files.createTempDirectory("cog").resolve("p.tif").toString
    CogWriter.write(r, path)
    assert(CogValidator.validate(path).isEmpty)
    val back = GeoTiffIO.read(path)
    assert(back.image(0).toSeq === r.image(0).toSeq)
    assert(!back.mask.exists(identity))

    // IFD inventory: main(0) + 3 overviews(1) + full-res mask(4) + 3
    // overview masks(5) — the GDAL internal-mask chain layout
    val chain = CogValidator.ifdSummary(path)
    assert(chain.map(_._1) === Seq(0L, 1L, 1L, 1L, 4L, 5L, 5L, 5L), chain)
    assert(chain.head === ((0L, w, h)))
    assert(chain(4) === ((4L, w, h)), "full-res mask dims")
    assert(chain(1)._2 === chain(5)._2 && chain(1)._3 === chain(5)._3,
      "overview mask dims match overview dims")
  }
}
