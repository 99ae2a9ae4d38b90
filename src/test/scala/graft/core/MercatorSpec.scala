package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden tile math from the reference's own tests + mercantile identities.
  * Cites: /root/reference/tests/test_geovector.py:551-566 (tiles goldens),
  * /root/reference/telluric/constants.py:25-29 (resolution table). */
class MercatorSpec extends AnyFunSuite {

  test("MERCATOR_RESOLUTION_MAPPING parity (constants.py:25-29)") {
    // res(z) = 2*20037508.342789244 / (256*2^z)
    assert(Mercator.resolution(0) === 2 * 20037508.342789244 / 256)
    assert(Mercator.resolution(12) === 2 * 20037508.342789244 / (256 * 4096))
    assert(Mercator.ResolutionMapping.size === 21)
    assert(math.abs(Mercator.resolution(14) - 9.554628535647032) < 1e-12)
  }

  // the baotou AOI from tests/test_geovector.py:551-566
  private val aoi = Seq(
    (109.612458654485849, 40.867336965196827),
    (109.619116438865731, 40.867336965196827),
    (109.61872894876953, 40.864459877761597),
    (109.612599559975365, 40.864326676241866),
    (109.612458654485849, 40.867336965196827))
  private val west = aoi.map(_._1).min
  private val east = aoi.map(_._1).max
  private val south = aoi.map(_._2).min
  private val north = aoi.map(_._2).max

  test("tiles(15) golden == [(26361,12301,15)] (test_geovector.py:562-563)") {
    val ts = Mercator.tilesFor(west, south, east, north, Seq(15))
    assert(ts === Seq(Mercator.TileId(26361, 12301, 15)))
  }

  test("tiles([15,16]) golden incl. order (test_geovector.py:565-566)") {
    val ts = Mercator.tilesFor(west, south, east, north, Seq(15, 16))
    assert(ts === Seq(
      Mercator.TileId(26361, 12301, 15),
      Mercator.TileId(52722, 24603, 16),
      Mercator.TileId(52723, 24603, 16)))
  }

  test("xyBounds identities: tile 0/0/0 spans the mercator square") {
    val b = Mercator.xyBounds(0, 0, 0)
    assert(b.left === -Mercator.OriginShift)
    assert(b.right === Mercator.OriginShift)
    assert(b.top === Mercator.OriginShift)
    assert(b.bottom === -Mercator.OriginShift)
  }

  test("tileAt/lngLatBounds round-trip") {
    for (z <- Seq(1, 5, 9, 12, 16); lng <- Seq(-179.9, -42.1, 0.3, 109.6153); lat <- Seq(-84.0, -11.5, 0.0, 40.8655)) {
      val t = Mercator.tileAt(lng, lat, z)
      val (w, s, e, n) = Mercator.lngLatBounds(t.x, t.y, t.z)
      assert(lng >= w - 1e-9 && lng <= e + 1e-9, s"$lng not in [$w,$e] z=$z")
      assert(lat >= s - 1e-9 && lat <= n + 1e-9, s"$lat not in [$s,$n] z=$z")
    }
  }

  test("lngLat<->meters closed form is exact at known anchors") {
    val (x, y) = Mercator.lngLatToMeters(180.0, 0.0)
    assert(math.abs(x - Mercator.OriginShift) < 1e-6)
    assert(math.abs(y) < 1e-9)
    val (lng, lat) = Mercator.metersToLngLat(Mercator.OriginShift, Mercator.OriginShift)
    assert(math.abs(lng - 180.0) < 1e-9)
    assert(math.abs(lat - Mercator.MaxLat) < 1e-9)
  }

  test("pack/unpack round-trip and Morton monotonicity block") {
    val t = Mercator.TileId(26361, 12301, 15)
    assert(Mercator.TileId.unpack(t.packed) === t)
    assert(Mercator.morton(0, 0) === 0L)
    assert(Mercator.morton(1, 0) === 1L)
    assert(Mercator.morton(0, 1) === 2L)
    assert(Mercator.morton(1, 1) === 3L)
  }

  test("ring expansion: counts and wrap") {
    val t = Mercator.TileId(0, 5, 4)
    assert(Mercator.ring(t, 0) === Seq(t))
    assert(Mercator.ring(t, 1).size === 8) // x wraps, y in range
    assert(Mercator.ring(t, 1).contains(Mercator.TileId(15, 5, 4))) // wrapped x
    val top = Mercator.TileId(3, 0, 4)
    assert(Mercator.ring(top, 1).size === 5) // y<0 clipped
  }

  test("parent/children pyramid relations") {
    val t = Mercator.TileId(52722, 24603, 16)
    assert(t.parent === Mercator.TileId(26361, 12301, 15))
    assert(t.parent.children.contains(t))
  }
}
