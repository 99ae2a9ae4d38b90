package graft.core

/** Web-Mercator (EPSG:3857) slippy-map tile grid — the engine's cell index.
  *
  * This is a from-scratch Scala implementation of the XYZ zoom-pyramid cell
  * system the reference uses (telluric delegates to the public `mercantile`
  * package; see `/root/reference/telluric/vectors.py:522-538` and the
  * resolution table at `/root/reference/telluric/constants.py:25-29`).
  * Formulas are the published Web-Mercator closed forms; rounding/clamping
  * semantics match mercantile so the reference's golden tile values
  * (`tests/test_geovector.py:551-566`) hold bit-for-bit.
  */
object Mercator {
  /** Earth radius used by EPSG:3857 (spherical). */
  val R: Double = 6378137.0
  /** Half circumference: pi * R = 20037508.342789244 (constants.py:25). */
  val OriginShift: Double = math.Pi * R
  /** Full circumference 2*pi*R. */
  val CE: Double = 2.0 * math.Pi * R
  /** Latitude bound of the square Web-Mercator world. */
  val MaxLat: Double = 85.0511287798066
  /** mercantile's internal epsilons (public constants). */
  val Epsilon: Double = 1e-14
  val LLEpsilon: Double = 1e-11

  /** Tile size in pixels (georaster.py:1014-1016, constants.py:25). */
  val TileSize: Int = 256

  /** resolution (meters/pixel) at zoom z — constants.py:25-29, bit-equal. */
  def resolution(z: Int): Double = (2.0 * OriginShift) / (TileSize * math.pow(2.0, z))

  /** Precomputed z=0..20 map, mirroring MERCATOR_RESOLUTION_MAPPING. */
  val ResolutionMapping: Map[Int, Double] = (0 to 20).map(z => z -> resolution(z)).toMap

  /** A slippy-map tile id. */
  final case class TileId(x: Long, y: Long, z: Int) {
    /** Packed 64-bit key: 5 bits zoom | 29 bits x | 29 bits y (z<=28). */
    def packed: Long = TileId.pack(x, y, z)
    def parent: TileId = TileId(x >> 1, y >> 1, z - 1)
    def children: Seq[TileId] =
      Seq(TileId(2 * x, 2 * y, z + 1), TileId(2 * x + 1, 2 * y, z + 1),
          TileId(2 * x, 2 * y + 1, z + 1), TileId(2 * x + 1, 2 * y + 1, z + 1))
  }
  object TileId {
    def pack(x: Long, y: Long, z: Int): Long =
      (z.toLong << 58) | (x << 29) | y
    def unpack(k: Long): TileId =
      TileId((k >> 29) & ((1L << 29) - 1), k & ((1L << 29) - 1), (k >> 58).toInt)
  }

  /** Web-Mercator meter bounds of a tile (mercantile.xy_bounds). */
  final case class XyBounds(left: Double, bottom: Double, right: Double, top: Double)

  def xyBounds(x: Long, y: Long, z: Int): XyBounds = {
    val tileSize = CE / math.pow(2.0, z)
    val left = x * tileSize - CE / 2.0
    val right = left + tileSize
    val top = CE / 2.0 - y * tileSize
    val bottom = top - tileSize
    XyBounds(left, bottom, right, top)
  }

  /** WGS84 degree bounds of a tile (mercantile.bounds). */
  def lngLatBounds(x: Long, y: Long, z: Int): (Double, Double, Double, Double) = {
    val z2 = math.pow(2.0, z)
    val west = x / z2 * 360.0 - 180.0
    val east = (x + 1) / z2 * 360.0 - 180.0
    val north = yToLat(y / z2)
    val south = yToLat((y + 1) / z2)
    (west, south, east, north)
  }

  private def yToLat(yNorm: Double): Double =
    math.toDegrees(math.atan(math.sinh(math.Pi * (1.0 - 2.0 * yNorm))))

  /** lon/lat → normalized mercator square coords in [0,1] (mercantile._xy). */
  def normXY(lng: Double, lat: Double): (Double, Double) = {
    val x = lng / 360.0 + 0.5
    val sinlat = math.sin(math.toRadians(lat))
    val y = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.Pi
    (x, y)
  }

  /** lon/lat → EPSG:3857 meters (mercantile.xy / PROJ closed form). */
  def lngLatToMeters(lng: Double, lat: Double): (Double, Double) = {
    val x = R * math.toRadians(lng)
    val y =
      if (lat <= -90.0) Double.NegativeInfinity
      else if (lat >= 90.0) Double.PositiveInfinity
      else R * math.log(math.tan((math.Pi * 0.25) + (0.5 * math.toRadians(lat))))
    (x, y)
  }

  /** EPSG:3857 meters → lon/lat (inverse closed form). */
  def metersToLngLat(x: Double, y: Double): (Double, Double) = {
    val lng = math.toDegrees(x / R)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0)
    (lng, lat)
  }

  /** The tile containing a lon/lat at zoom z (mercantile.tile semantics:
    * clamp to edge tiles, +1e-14 epsilon before floor). */
  def tileAt(lng: Double, lat: Double, z: Int): TileId = {
    val (x, y) = normXY(lng, lat)
    val z2 = math.pow(2.0, z)
    val xt =
      if (x <= 0.0) 0L
      else if (x >= 1.0) (z2 - 1).toLong
      else math.floor((x + Epsilon) * z2).toLong
    val yt =
      if (y <= 0.0) 0L
      else if (y >= 1.0) (z2 - 1).toLong
      else math.floor((y + Epsilon) * z2).toLong
    TileId(xt, yt, z)
  }

  /** Allocation-free packed variant of [[tileAt]] — the per-row hot path. */
  def tileAtPacked(lng: Double, lat: Double, z: Int): Long = {
    val x = lng / 360.0 + 0.5
    val sinlat = math.sin(math.toRadians(lat))
    val y = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.Pi
    val z2 = math.pow(2.0, z)
    val xt =
      if (x <= 0.0) 0L
      else if (x >= 1.0) (z2 - 1).toLong
      else math.floor((x + Epsilon) * z2).toLong
    val yt =
      if (y <= 0.0) 0L
      else if (y >= 1.0) (z2 - 1).toLong
      else math.floor((y + Epsilon) * z2).toLong
    TileId.pack(xt, yt, z)
  }

  /** All tiles intersecting a WGS84 bbox at the given zooms
    * (mercantile.tiles semantics: clamp, antimeridian split, LL_EPSILON
    * shrink on the lower-right corner). Row-major per zoom:
    * x outer, y inner — matches mercantile iteration order, which the
    * reference's golden list order depends on (test_geovector.py:551-566). */
  def tilesFor(west: Double, south: Double, east: Double, north: Double,
               zooms: Seq[Int]): Seq[TileId] = {
    val boxes =
      if (west > east) Seq((-180.0, south, east, north), (west, south, 180.0, north))
      else Seq((west, south, east, north))
    val out = Seq.newBuilder[TileId]
    for ((w0, s0, e0, n0) <- boxes) {
      val w = math.max(-180.0, w0)
      val s = math.max(-85.051129, s0)
      val e = math.min(180.0, e0)
      val n = math.min(85.051129, n0)
      for (z <- zooms) {
        val ul = tileAt(w, n, z)
        val lr = tileAt(e - LLEpsilon, s + LLEpsilon, z)
        var i = ul.x
        while (i <= lr.x) {
          var j = ul.y
          while (j <= lr.y) { out += TileId(i, j, z); j += 1 }
          i += 1
        }
      }
    }
    out.result()
  }

  /** Neighbor ring at Chebyshev distance r around a tile (same zoom), with
    * antimeridian x-wrap and y clamped to the pyramid. Ring 0 = the tile.
    * Used for kNN cell-ring expansion (SURVEY.md §2.4). */
  def ring(t: TileId, r: Int): Seq[TileId] = {
    val n = 1L << t.z
    def wrapX(x: Long): Long = ((x % n) + n) % n
    if (r == 0) Seq(t)
    else {
      val out = Seq.newBuilder[TileId]
      var dx = -r
      while (dx <= r) {
        var dy = -r
        while (dy <= r) {
          if (math.max(math.abs(dx), math.abs(dy)) == r) {
            val y = t.y + dy
            if (y >= 0 && y < n) out += TileId(wrapX(t.x + dx), y, t.z)
          }
          dy += 1
        }
        dx += 1
      }
      out.result()
    }
  }

  /** Interleaved Morton (Z-order) key for (x,y) — write-locality sort key
    * for tile sinks (SURVEY.md §4). */
  def morton(x: Long, y: Long): Long = {
    def part(v: Long): Long = {
      var w = v & 0xFFFFFFFFL
      w = (w | (w << 16)) & 0x0000FFFF0000FFFFL
      w = (w | (w << 8)) & 0x00FF00FF00FF00FFL
      w = (w | (w << 4)) & 0x0F0F0F0F0F0F0F0FL
      w = (w | (w << 2)) & 0x3333333333333333L
      w = (w | (w << 1)) & 0x5555555555555555L
      w
    }
    part(x) | (part(y) << 1)
  }
}
