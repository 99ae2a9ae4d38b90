package graft.raster

import graft.core.{Geom, Mercator}

/** Remaining GeoRaster2 physical ops (SURVEY.md §2.2/§2.3/§2.10):
  * crop/pixel_crop, resize with telluric's validation matrix,
  * stretch_histogram, meter↔degree helpers, zoom_level_from_geometry. */
object RasterOps {

  /** resize (georaster.py:1374-1425): exactly one of ratio | (ratioX,ratioY)
    * | dest width/height | destResolution; nearest resampling (min/max/
    * med/q1/q3 forbidden by the reference — we expose nearest only). */
  def resize(r: MRaster,
             ratio: Option[Double] = None,
             ratioX: Option[Double] = None,
             ratioY: Option[Double] = None,
             destWidth: Option[Int] = None,
             destHeight: Option[Int] = None,
             destResolution: Option[Double] = None): MRaster = {
    val provided = Seq(
      ratio.isDefined,
      ratioX.isDefined && ratioY.isDefined,
      destWidth.isDefined || destHeight.isDefined,
      destResolution.isDefined).count(identity)
    if (provided != 1)
      throw new IllegalArgumentException(
        "please provide either ratio, or {ratio_x,ratio_y}, or {dest_height, dest_width}, or dest_resolution")
    val (rx, ry): (Double, Double) =
      if (destWidth.isDefined && destHeight.isDefined)
        (destWidth.get.toDouble / r.width, destHeight.get.toDouble / r.height)
      else if (destWidth.isDefined) {
        val v = destWidth.get.toDouble / r.width; (v, v)
      } else if (destHeight.isDefined) {
        val v = destHeight.get.toDouble / r.height; (v, v)
      } else if (destResolution.isDefined) {
        val v = r.resolution / destResolution.get; (v, v)
      } else if (ratio.isDefined) (ratio.get, ratio.get)
      else (ratioX.get, ratioY.get)
    resizeBy(r, rx, ry)
  }

  /** _resize (georaster.py:1410-1425): ceil sizes, affine * scale(1/r). */
  def resizeBy(r: MRaster, ratioX: Double, ratioY: Double): MRaster = {
    val newW = math.ceil(r.width * ratioX).toInt
    val newH = math.ceil(r.height * ratioY).toInt
    val destAffine = r.affine.scaled(1.0 / ratioX, 1.0 / ratioY)
    TileServe.getWindow(r,
      Windows.Window(0, 0, r.width.toDouble, r.height.toDouble),
      newW, newH, destAffine)
  }

  /** __getitem__ pixel slice (georaster.py:1064-1092): crop by pixel bounds
    * (xmin, ymin, xmax, ymax exclusive), affine translated. */
  def pixelSlice(r: MRaster, xmin: Int, ymin: Int, xmax: Int, ymax: Int): MRaster = {
    val x0 = math.max(0, xmin); val y0 = math.max(0, ymin)
    val x1 = math.min(r.width, xmax); val y1 = math.min(r.height, ymax)
    val w = x1 - x0; val h = y1 - y0
    val img = Array.fill(r.numBands)(new Array[Double](w * h))
    val mask = new Array[Boolean](w * h)
    var row = 0
    while (row < h) {
      var colI = 0
      while (colI < w) {
        val i = row * w + colI
        mask(i) = r.masked(x0 + colI, y0 + row)
        var b = 0
        while (b < r.numBands) { img(b)(i) = r.get(b, x0 + colI, y0 + row); b += 1 }
        colI += 1
      }
      row += 1
    }
    val (cx, cy) = r.affine(x0.toDouble, y0.toDouble)
    r.copy(image = img, mask = mask, width = w, height = h,
      affine = r.affine.copy(c = cx, f = cy))
  }

  /** pixel_crop (georaster.py:1264-1309): slice then optional resize. */
  def pixelCrop(r: MRaster, bounds: (Int, Int, Int, Int),
                xsize: Option[Int] = None, ysize: Option[Int] = None): MRaster = {
    val out = pixelSlice(r, bounds._1, bounds._2, bounds._3, bounds._4)
    (xsize, ysize) match {
      case (Some(xs), Some(ys)) if xs != out.width || ys != out.height =>
        resize(out, destWidth = Some(xs), destHeight = Some(ys))
      case _ => out
    }
  }

  /** crop(vector-bounds) (georaster.py:1197-1249): window from world bounds
    * with the reference's rounding rules, then pixel crop. */
  def crop(r: MRaster, bounds: (Double, Double, Double, Double),
           resolution: Option[Double] = None): MRaster = {
    val w = Windows.vectorToRasterBounds(bounds, r.affine, r.width, r.height,
      boundless = false)
    val out = pixelSlice(r, w.colOff.toInt, w.rowOff.toInt,
      (w.colOff + w.width).toInt, (w.rowOff + w.height).toInt)
    resolution match {
      case Some(res) if res != r.resolution =>
        resize(out, destResolution = Some(res))
      case _ => out
    }
  }

  /** limit_to_bands (georaster.py:1680-1689): order preserved, missing
    * bands error. */
  def limitToBands(r: MRaster, bands: Seq[String]): MRaster = {
    val idx = bands.map { b =>
      val i = r.bandNames.indexOf(b)
      if (i < 0) throw new IllegalArgumentException(s"band $b is not in the raster")
      i
    }
    r.copy(image = idx.map(r.image(_)).toArray, bandNames = bands)
  }

  /** mask(vector, mask_shape_nodata) (georaster.py:1850-1871): burn the
    * shapes into a boolean grid (pixel-center rule, same kernel as
    * rasterize); default masks pixels OUTSIDE the shapes, `maskShape=true`
    * masks pixels inside. */
  def maskByVector(r: MRaster, shapes: Seq[Geom.Geometry],
                   maskShapeNodata: Boolean = false): MRaster = {
    val burned = Rasterize.rasterize(shapes, r.crs,
      Some {
        val (x0, y0) = r.affine(0, 0)
        val (x1, y1) = r.affine(r.width.toDouble, r.height.toDouble)
        (math.min(x0, x1), math.min(y0, y1), math.max(x0, x1), math.max(y0, y1))
      },
      (math.abs(r.affine.a), math.abs(r.affine.e)),
      fillValue = Some(1.0), dtypeOpt = Some("uint8"))
    val inside = burned.image(0).map(_ == 1.0)
    val newMask = r.mask.zipWithIndex.map { case (m, i) =>
      m || (if (maskShapeNodata) inside(i) else !inside(i))
    }
    r.copy(mask = newMask)
  }

  /** mask_by_value(nodata) (georaster.py:1873-1881). */
  def maskByValue(r: MRaster, nodata: Double): MRaster = {
    val n = r.width * r.height
    val newMask = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      var allNodata = true
      var b = 0
      while (b < r.numBands && allNodata) {
        if (r.image(b)(i) != nodata) allNodata = false
        b += 1
      }
      newMask(i) = allNodata
      i += 1
    }
    r.copy(mask = newMask, nodata = Some(nodata))
  }

  /** __invert__ (georaster.py:1845-1848): flip the mask. */
  def invertMask(r: MRaster): MRaster = r.copy(mask = r.mask.map(!_))

  /** get_tile for a WGS84 raster (the cross-CRS path of
    * georaster.py:2067-2082): closed-form reproject of the 256² sampling
    * grid onto the Mercator tile. Default resampling is CUBIC B-SPLINE —
    * the reference pins `Resampling.cubic_spline` for exactly this
    * reprojection (georaster.py:2079); nearest/cubic remain selectable. */
  def getTile4326(r: MRaster, x: Long, y: Long, z: Int,
                  resampling: Resample.Method = Resample.CubicSpline): MRaster = {
    require(r.crs == 4326, "getTile4326 expects EPSG:4326 input")
    val b = Mercator.xyBounds(x, y, z)
    val res = Mercator.resolution(z)
    val out = MRaster.filled(256, 256, 0.0, r.bandNames,
      Affine(res, 0.0, b.left, 0.0, -res, b.top), 3857, r.dtype, r.nodata,
      allMasked = true)
    val inv = r.affine.inverse
    val img = Array.fill(r.numBands)(new Array[Double](256 * 256))
    val mask = Array.fill(256 * 256)(true)
    val roundInt = Dtypes.isInteger(r.dtype)
    var row = 0
    while (row < 256) {
      var colI = 0
      while (colI < 256) {
        // output pixel center in 3857 → lon/lat → continuous source pixel
        val mx = b.left + (colI + 0.5) * res
        val my = b.top - (row + 0.5) * res
        val (lon, lat) = Mercator.metersToLngLat(mx, my)
        val sc = inv.a * lon + inv.b * lat + inv.c
        val sr = inv.d * lon + inv.e * lat + inv.f
        if (sc >= 0 && sc < r.width && sr >= 0 && sr < r.height) {
          val i = row * 256 + colI
          var bd = 0
          var anyValid = false
          while (bd < r.numBands) {
            val v = resampling match {
              case Resample.Nearest     => Resample.sampleNearest(r, bd, sc, sr)
              case Resample.Cubic       => Resample.sampleCubic(r, bd, sc, sr)
              case Resample.CubicSpline => Resample.sampleSpline(r, bd, sc, sr)
            }
            if (!v.isNaN) {
              img(bd)(i) = if (roundInt) Dtypes.clampToDtype(v, r.dtype) else v
              anyValid = true
            }
            bd += 1
          }
          if (anyValid) mask(i) = false
        }
        colI += 1
      }
      row += 1
    }
    out.copy(image = img, mask = mask)
  }

  class HistogramStretchingError extends IllegalArgumentException("degenerate stretch range")

  /** stretch_histogram (util/histogram.py:10-53): percentile-or-value clip
    * then linear gain/offset to the dtype range; zeros ignored by default. */
  def stretchHistogram(r: MRaster, band: Int = 0,
                       darkClipPercentile: Option[Double] = None,
                       brightClipPercentile: Option[Double] = None,
                       darkClipValue: Option[Double] = None,
                       brightClipValue: Option[Double] = None,
                       ignoreZero: Boolean = true): MRaster = {
    if ((darkClipPercentile.isDefined && darkClipValue.isDefined) ||
        (brightClipPercentile.isDefined && brightClipValue.isDefined))
      throw new IllegalArgumentException(
        "Provided parameters for both by-percentile and by-value stretch, need only one of those.")
    val dcp = if (darkClipPercentile.isEmpty && darkClipValue.isEmpty) Some(0.001) else darkClipPercentile
    val bcp = if (brightClipPercentile.isEmpty && brightClipValue.isEmpty) Some(0.001) else brightClipPercentile
    val values = r.image(band).zipWithIndex
      .collect { case (v, i) if !r.mask(i) && (!ignoreZero || v != 0.0) => v }
      .sorted
    def percentile(p: Double): Double = {
      // numpy linear-interpolation percentile
      if (values.isEmpty) 0.0
      else {
        val idx = p / 100.0 * (values.length - 1)
        val lo = math.floor(idx).toInt
        val hi = math.ceil(idx).toInt
        if (lo == hi) values(lo)
        else values(lo) + (values(hi) - values(lo)) * (idx - lo)
      }
    }
    val dark = darkClipValue.getOrElse(percentile(100 * dcp.get))
    val bright = brightClipValue.getOrElse(percentile(100 * (1 - bcp.get)))
    if (bright == dark) throw new HistogramStretchingError
    val dstMin = Dtypes.min(r.dtype)
    val dstMax = Dtypes.max(r.dtype)
    val gain = (dstMax - dstMin) / (bright - dark)
    val offset = -gain * dark + dstMin
    val out = r.image.map(_.map { v =>
      val s = math.min(math.max(gain * v + offset, dstMin), dstMax)
      if (Dtypes.isInteger(r.dtype)) s.toLong.toDouble else s
    })
    r.copy(image = out)
  }
}

/** Spherical meter↔degree helpers (util/general.py:5-17) and
  * zoom_level_from_geometry (plotting.py:70-93). */
object GeoUnits {
  /** 1 degree latitude ≈ 111.32 km. */
  def meterToLatLonDeg(latDeg: Double): (Double, Double) =
    (1.0 / 111320.0, 1.0 / (111320.0 * math.cos(math.toRadians(latDeg))))

  def resolutionMetersToDeg(positionLat: Double, gsdMetric: Double): (Double, Double) = {
    val (mLat, mLon) = meterToLatLonDeg(positionLat)
    (gsdMetric * mLon, gsdMetric * mLat)
  }

  /** mercantile.bounding_tile: the smallest tile fully containing a bbox. */
  def boundingTileZoom(west: Double, south: Double, east: Double, north: Double): Int = {
    val tmin = Mercator.tileAt(west, north, 32)
    val tmax = Mercator.tileAt(east - Mercator.LLEpsilon, south + Mercator.LLEpsilon, 32)
    // common prefix depth of the two z32 tiles
    var z = 32
    var (x1, y1, x2, y2) = (tmin.x, tmin.y, tmax.x, tmax.y)
    while (z > 0 && (x1 != x2 || y1 != y2)) {
      x1 >>= 1; y1 >>= 1; x2 >>= 1; y2 >>= 1; z -= 1
    }
    z
  }

  /** zoom_level_from_geometry: median_low of bounding-tile zooms over a 4×4
    * grid split of the geometry (plotting.py:70-93). */
  def zoomLevelFromGeometry(bbox: Geom.BBox, splits: Int = 4): Int = {
    val xs = (0 to splits).map(i => bbox.xmin + (bbox.xmax - bbox.xmin) * i / splits)
    val ys = (0 to splits).map(i => bbox.ymin + (bbox.ymax - bbox.ymin) * i / splits)
    val levels = for {
      iy <- 0 until splits
      ix <- 0 until splits
    } yield boundingTileZoom(xs(ix), ys(iy), xs(ix + 1), ys(iy + 1))
    val sorted = levels.sorted
    // statistics.median_low: lower of the two middle values
    sorted((sorted.length - 1) / 2)
  }
}
