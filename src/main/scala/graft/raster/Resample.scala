package graft.raster

/** Resampling kernels for regrid/reproject/overviews (SURVEY.md §2.10;
  * reference `_reproject` default is Resampling.cubic,
  * georaster.py:1454-1506).
  *
  * Cubic = Keys cubic-convolution with a = −0.5 — the kernel GDAL calls
  * "cubic". Masked source pixels are excluded with weight renormalization
  * (GDAL's nodata handling); an all-masked 4×4 neighborhood yields a masked
  * output pixel. Edges clamp (GDAL edge extension). The kernel is a
  * partition of unity, so constants reproduce exactly and linear ramps
  * reproduce exactly away from mask/edge effects — both property-tested. */
object Resample {

  sealed trait Method
  case object Nearest extends Method
  case object Cubic extends Method
  case object CubicSpline extends Method

  private final val A = -0.5

  def cubicWeight(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 1.0) ((A + 2.0) * ax - (A + 3.0)) * ax * ax + 1.0
    else if (ax < 2.0) A * (((ax - 5.0) * ax + 8.0) * ax - 4.0)
    else 0.0
  }

  /** Cubic B-spline kernel — GDAL/rasterio's `cubic_spline` (the reference
    * pins it for the cross-CRS get_tile reprojection,
    * georaster.py:2067-2082). Same 4×4 support as Keys cubic; everywhere
    * non-negative (no overshoot/ringing, an approximating — not
    * interpolating — smoother) and a partition of unity, so flat fields
    * reproduce exactly under the renormalizing sampler. */
  def splineWeight(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 1.0) (4.0 + (3.0 * ax - 6.0) * ax * ax) / 6.0
    else if (ax < 2.0) { val t = 2.0 - ax; t * t * t / 6.0 }
    else 0.0
  }

  @inline private def clamp(i: Int, lo: Int, hi: Int): Int =
    if (i < lo) lo else if (i > hi) hi else i

  /** Sample band `bi` at continuous source pixel coordinates (sc, sr)
    * where integer values are pixel EDGES (centers at k+0.5 — the same
    * convention as `affine.inverse` applied to a geo point).
    * Returns NaN for a fully-masked neighborhood. */
  def sampleCubic(src: MRaster, bi: Int, sc: Double, sr: Double): Double =
    sample4x4(src, bi, sc, sr, spline = false)

  /** B-spline sibling of [[sampleCubic]] — same mask renormalization and
    * edge clamping, [[splineWeight]] kernel. */
  def sampleSpline(src: MRaster, bi: Int, sc: Double, sr: Double): Double =
    sample4x4(src, bi, sc, sr, spline = true)

  private def sample4x4(src: MRaster, bi: Int, sc: Double, sr: Double,
                        spline: Boolean): Double = {
    val u = sc - 0.5
    val v = sr - 0.5
    val i0 = math.floor(u).toInt
    val j0 = math.floor(v).toInt
    val tu = u - i0
    val tv = v - j0
    var num = 0.0
    var den = 0.0
    var dj = -1
    while (dj <= 2) {
      val j = clamp(j0 + dj, 0, src.height - 1)
      val wy = if (spline) splineWeight(dj - tv) else cubicWeight(dj - tv)
      var di = -1
      while (di <= 2) {
        val i = clamp(i0 + di, 0, src.width - 1)
        if (!src.masked(i, j)) {
          val wx = if (spline) splineWeight(di - tu) else cubicWeight(di - tu)
          val w = wy * wx
          num += w * src.get(bi, i, j)
          den += w
        }
        di += 1
      }
      dj += 1
    }
    if (math.abs(den) < 1e-12) Double.NaN else num / den
  }

  /** Nearest sample; NaN when outside or masked (the r1 semantics). */
  def sampleNearest(src: MRaster, bi: Int, sc: Double, sr: Double): Double = {
    val i = math.floor(sc).toInt
    val j = math.floor(sr).toInt
    if (i < 0 || i >= src.width || j < 0 || j >= src.height || src.masked(i, j))
      Double.NaN
    else src.get(bi, i, j)
  }
}
