package graft.raster

import graft.core.Mercator

/** Plan-time reprojection grid computation — calc_transform ported
  * rule-for-rule (util/raster_utils.py:124-269), covering the full
  * parameter matrix dst_crs / resolution / dimensions / src_bounds /
  * dst_bounds / target_aligned_pixels and its error combinations
  * (:166-178), then a nearest regrid kernel executes on the computed grid
  * (the reference delegates the pixel pass to GDAL; here the same role is
  * played by `TileServe.getWindow`/`Merge.prepareOther`-style kernels).
  * Cross-CRS support is the engine's working set 4326↔3857 (closed form,
  * exact — `Geom.reproject`). */
object Reproject {

  final case class Grid(dstCrs: Int, transform: Affine, width: Int, height: Int)

  /** transform_bounds for the supported CRS pair: corner transform is exact
    * for the axis-aligned 4326↔3857 case. */
  def transformBounds(srcCrs: Int, dstCrs: Int,
                      b: (Double, Double, Double, Double)): (Double, Double, Double, Double) = {
    if (srcCrs == dstCrs) b
    else {
      val f: (Double, Double) => (Double, Double) = (srcCrs, dstCrs) match {
        case (4326, 3857) => Mercator.lngLatToMeters
        case (3857, 4326) => Mercator.metersToLngLat
        case _ => throw new IllegalArgumentException(
          s"unsupported CRS transform $srcCrs->$dstCrs")
      }
      val (x0, y0) = f(b._1, b._2)
      val (x1, y1) = f(b._3, b._4)
      (math.min(x0, x1), math.min(y0, y1), math.max(x0, x1), math.max(y0, y1))
    }
  }

  private def srcBoundsOf(src: MRaster): (Double, Double, Double, Double) = {
    val bb = src.footprint.bbox
    (bb.xmin, bb.ymin, bb.xmax, bb.ymax)
  }

  /** rasterio.warp.calculate_default_transform for the supported pair:
    * preserve pixel count along the diagonal, square pixels. */
  private def calcDefaultTransform(srcCrs: Int, dstCrs: Int, width: Int, height: Int,
                                   bounds: (Double, Double, Double, Double)): (Affine, Int, Int) = {
    val (xmin, ymin, xmax, ymax) = transformBounds(srcCrs, dstCrs, bounds)
    val res = math.max((xmax - xmin) / width, (ymax - ymin) / height)
    val w = math.max(math.round((xmax - xmin) / res).toInt, 1)
    val h = math.max(math.round((ymax - ymin) / res).toInt, 1)
    (Affine(res, 0, xmin, 0, -res, ymax), w, h)
  }

  def calcTransform(src: MRaster,
                    dstCrs: Option[Int] = None,
                    resolution: Option[(Double, Double)] = None,
                    dimensions: Option[(Int, Int)] = None,
                    srcBounds: Option[(Double, Double, Double, Double)] = None,
                    dstBounds: Option[(Double, Double, Double, Double)] = None,
                    targetAlignedPixels: Boolean = false): Grid = {
    // error matrix (util/raster_utils.py:166-178) — messages verbatim
    if (targetAlignedPixels) {
      if (resolution.isEmpty)
        throw new IllegalArgumentException(
          "target_aligned_pixels cannot be used without resolution")
      if (srcBounds.isDefined || dstBounds.isDefined)
        throw new IllegalArgumentException(
          "target_aligned_pixels cannot be used with src_bounds or dst_bounds")
    } else if (dimensions.isDefined) {
      if (dstBounds.isDefined || resolution.isDefined)
        throw new IllegalArgumentException(
          "dimensions cannot be used with dst_bounds or resolution")
    }
    if (srcBounds.isDefined && dstBounds.isDefined)
      throw new IllegalArgumentException(
        "src_bounds and dst_bounds may not be specified simultaneously")

    val grid: Grid = dstCrs match {
      case Some(crs) =>
        if (dimensions.isDefined) {
          val (dw, dh) = dimensions.get
          val (xmin, ymin, xmax, ymax) =
            transformBounds(src.crs, crs, srcBounds.getOrElse(srcBoundsOf(src)))
          Grid(crs, Affine((xmax - xmin) / dw.toDouble, 0, xmin, 0,
            (ymin - ymax) / dh.toDouble, ymax), dw, dh)
        } else if (srcBounds.isDefined || dstBounds.isDefined) {
          val res = resolution.getOrElse(throw new IllegalArgumentException(
            "resolution is required when using src_bounds or dst_bounds"))
          val (xmin, ymin, xmax, ymax) = srcBounds match {
            case Some(sb) => transformBounds(src.crs, crs, sb)
            case None => dstBounds.get
          }
          Grid(crs, Affine(res._1, 0, xmin, 0, -res._2, ymax),
            math.max(math.ceil((xmax - xmin) / res._1).toInt, 1),
            math.max(math.ceil((ymax - ymin) / res._2).toInt, 1))
        } else {
          val (t0, w0, h0) = calcDefaultTransform(src.crs, crs, src.width,
            src.height, srcBoundsOf(src))
          resolution match {
            case Some((rx, ry)) =>
              val (xmin, ymin, xmax, ymax) =
                transformBounds(src.crs, crs, srcBoundsOf(src))
              Grid(crs, Affine(rx, 0, xmin, 0, -ry, ymax),
                math.max(math.ceil((xmax - xmin) / rx).toInt, 1),
                math.max(math.ceil((ymax - ymin) / ry).toInt, 1))
            case None => Grid(crs, t0, w0, h0)
          }
        }
      case None =>
        if (dimensions.isDefined) {
          val (dw, dh) = dimensions.get
          val (l, b, r, t) = srcBounds.getOrElse(srcBoundsOf(src))
          Grid(src.crs, Affine((r - l) / dw.toDouble, 0, l, 0,
            (b - t) / dh.toDouble, t), dw, dh)
        } else if (srcBounds.isDefined || dstBounds.isDefined) {
          val res = resolution.getOrElse((src.affine.a, -src.affine.e))
          val (xmin, ymin, xmax, ymax) = srcBounds.getOrElse(dstBounds.get)
          Grid(src.crs, Affine(res._1, 0, xmin, 0, -res._2, ymax),
            math.max(math.ceil((xmax - xmin) / res._1).toInt, 1),
            math.max(math.ceil((ymax - ymin) / res._2).toInt, 1))
        } else resolution match {
          case Some((rx, ry)) =>
            val (l, b, r, t) = srcBoundsOf(src)
            Grid(src.crs, Affine(rx, 0, l, 0, -ry, t),
              math.max(math.ceil((r - l) / rx).toInt, 1),
              math.max(math.ceil((t - b) / ry).toInt, 1))
          case None => Grid(src.crs, src.affine, src.width, src.height)
        }
    }

    if (targetAlignedPixels) {
      // rasterio.warp.aligned_target: snap bounds outward to resolution
      val (rx, ry) = resolution.get
      val t = grid.transform
      val xmin = math.floor(t.c / rx) * rx
      val ymax = math.ceil(t.f / ry) * ry
      val xmax = math.ceil((t.c + t.a * grid.width) / rx) * rx
      val ymin = math.floor((t.f + t.e * grid.height) / ry) * ry
      Grid(grid.dstCrs, Affine(rx, 0, xmin, 0, -ry, ymax),
        math.max(math.round((xmax - xmin) / rx).toInt, 1),
        math.max(math.round((ymax - ymin) / ry).toInt, 1))
    } else grid
  }

  /** full reproject: compute the grid, then regrid the source into it.
    * Resampling: Nearest (the r1 path, exact-parity tested) or Cubic —
    * Keys a=−0.5 cubic convolution, the reference's `_reproject` default
    * (georaster.py:1454-1506); cubic outputs for integer dtypes round to
    * the dtype as GDAL does. */
  def reproject(src: MRaster,
                dstCrs: Option[Int] = None,
                resolution: Option[(Double, Double)] = None,
                dimensions: Option[(Int, Int)] = None,
                srcBounds: Option[(Double, Double, Double, Double)] = None,
                dstBounds: Option[(Double, Double, Double, Double)] = None,
                targetAlignedPixels: Boolean = false,
                resampling: Resample.Method = Resample.Nearest): MRaster = {
    val g = calcTransform(src, dstCrs, resolution, dimensions, srcBounds,
      dstBounds, targetAlignedPixels)
    val inv = src.affine.inverse
    val n = g.width * g.height
    val img = Array.fill(src.numBands)(new Array[Double](n))
    val mask = Array.fill(n)(true)
    val toSrcCrs: (Double, Double) => (Double, Double) =
      if (g.dstCrs == src.crs) (x, y) => (x, y)
      else (g.dstCrs, src.crs) match {
        case (3857, 4326) => Mercator.metersToLngLat
        case (4326, 3857) => Mercator.lngLatToMeters
        case _ => throw new IllegalArgumentException("unsupported CRS pair")
      }
    val roundInt = Dtypes.isInteger(src.dtype)
    var row = 0
    while (row < g.height) {
      var colI = 0
      while (colI < g.width) {
        val (dx, dy) = g.transform(colI + 0.5, row + 0.5)
        val (sx, sy) = toSrcCrs(dx, dy)
        val sc = inv.a * sx + inv.b * sy + inv.c
        val sr = inv.d * sx + inv.e * sy + inv.f
        // cubic only samples inside the source footprint (boundless reads
        // would hallucinate data from edge extension)
        val insideSrc = sc >= 0 && sc < src.width && sr >= 0 && sr < src.height
        if (insideSrc) {
          val i = row * g.width + colI
          var b = 0
          var anyValid = false
          while (b < src.numBands) {
            val v = resampling match {
              case Resample.Nearest     => Resample.sampleNearest(src, b, sc, sr)
              case Resample.Cubic       => Resample.sampleCubic(src, b, sc, sr)
              case Resample.CubicSpline => Resample.sampleSpline(src, b, sc, sr)
            }
            if (!v.isNaN) {
              img(b)(i) = if (roundInt) Dtypes.clampToDtype(v, src.dtype) else v
              anyValid = true
            }
            b += 1
          }
          if (anyValid) mask(i) = false
        }
        colI += 1
      }
      row += 1
    }
    src.copy(image = img, mask = mask, width = g.width, height = g.height,
      affine = g.transform, crs = g.dstCrs)
  }
}
