package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants over the geometry/tile kernels — randomized
  * sweeps with fixed seeds (the scalatest↔scalacheck bridge artifact is not
  * in the offline cache, so the sweeps are hand-rolled; semantics match
  * forAll over 2000 cases each). */
class PropertySpec extends AnyFunSuite {

  private def sweep(n: Int, seed: Long)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    (1 to n).foreach(_ => body(rnd))
  }

  private def randLon(r: scala.util.Random) = r.nextDouble() * 359.998 - 179.999
  private def randLat(r: scala.util.Random) = r.nextDouble() * 169.8 - 84.9

  test("prop: tileAt within pyramid bounds, parent-consistent (±1 at seams)") {
    sweep(2000, 1) { r =>
      val (x, y, z) = (randLon(r), randLat(r), r.nextInt(19))
      val t = Mercator.tileAt(x, y, z)
      assert(t.x >= 0 && t.x < (1L << z))
      assert(t.y >= 0 && t.y < (1L << z))
      if (z > 0) {
        val parent = Mercator.tileAt(x, y, z - 1)
        assert(math.abs((t.x >> 1) - parent.x) <= 1)
        assert(math.abs((t.y >> 1) - parent.y) <= 1)
      }
    }
  }

  test("prop: point lies inside its own tile's bounds") {
    sweep(2000, 2) { r =>
      val (x, y, z) = (randLon(r), randLat(r), 1 + r.nextInt(16))
      val t = Mercator.tileAt(x, y, z)
      val (w, s, e, n) = Mercator.lngLatBounds(t.x, t.y, t.z)
      assert(x >= w - 1e-7 && x <= e + 1e-7, s"$x [$w,$e] z=$z")
      assert(y >= s - 1e-7 && y <= n + 1e-7, s"$y [$s,$n] z=$z")
    }
  }

  test("prop: tileAtPacked == tileAt.packed") {
    sweep(2000, 3) { r =>
      val (x, y, z) = (randLon(r), randLat(r), r.nextInt(21))
      assert(Mercator.tileAtPacked(x, y, z) === Mercator.tileAt(x, y, z).packed)
    }
  }

  test("prop: pack/unpack identity") {
    sweep(2000, 4) { r =>
      val z = r.nextInt(21)
      val x = math.abs(r.nextLong()) % (1L << z max 1)
      val y = math.abs(r.nextLong()) % (1L << z max 1)
      assert(Mercator.TileId.unpack(Mercator.TileId.pack(x, y, z)) ===
        Mercator.TileId(x, y, z))
    }
  }

  test("prop: 4326→3857→4326 round-trips within 1e-9 deg") {
    sweep(2000, 5) { r =>
      val (x, y) = (randLon(r), randLat(r))
      val (mx, my) = Mercator.lngLatToMeters(x, y)
      val (bx, by) = Mercator.metersToLngLat(mx, my)
      assert(math.abs(bx - x) < 1e-9)
      assert(math.abs(by - y) < 1e-9)
    }
  }

  test("prop: WKB round-trip preserves polygon vertices exactly") {
    sweep(500, 6) { r =>
      val n = 3 + r.nextInt(10)
      val shell = (0 until n).map(_ => (randLon(r), randLat(r)))
      val g = Geom.polygon(shell: _*)
      val back = Geom.fromWkb(Geom.toWkb(g)).asInstanceOf[Geom.GPolygon]
      assert(back.shell.toSeq === g.shell.toSeq)
    }
  }

  test("prop: ray-cast PIP agrees with JTS on random convex polygons") {
    val reader = new org.locationtech.jts.io.WKBReader()
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    var tested = 0
    sweep(2000, 7) { r =>
      val nVerts = 3 + r.nextInt(10)
      val cx = r.nextDouble() * 300 - 150
      val cy = r.nextDouble() * 150 - 75
      val rad = 1.0 + r.nextDouble() * 20
      val ring = (0 until nVerts).map { k =>
        val a = 2 * math.Pi * k / nVerts
        (cx + rad * math.cos(a), cy + rad * math.sin(a))
      }
      val g = Geom.polygon(ring: _*)
      val jts = reader.read(Geom.toWkb(g))
      val (px, py) = (randLon(r), randLat(r))
      val pt = gf.createPoint(new org.locationtech.jts.geom.Coordinate(px, py))
      if (jts.getBoundary.distance(pt) > 1e-9) {
        assert(Geom.polygonContains(px, py, g) === jts.contains(pt),
          s"($px,$py) vs $ring")
        tested += 1
      }
    }
    assert(tested > 1500)
  }

  test("prop: signed ring area positive CCW, negated by reversal") {
    sweep(1000, 8) { r =>
      val n = 3 + r.nextInt(8)
      val rad = 1.0 + r.nextDouble() * 5
      val ring = (0 until n).map { k =>
        val a = 2 * math.Pi * k / n
        Geom.Pt(rad * math.cos(a), rad * math.sin(a))
      }.toArray :+ Geom.Pt(rad, 0)
      val area = Geom.signedRingArea(ring)
      assert(area > 0)
      assert(math.abs(Geom.signedRingArea(ring.reverse) + area) < 1e-9)
    }
  }

  test("prop: st_contains_ring computePrim matches Geom.rayCastInRing") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.sql.StContainsRing(null, null, null, null)
    sweep(500, 9) { r =>
      val n = 4 + r.nextInt(8)
      val ring = (0 until n).map { k =>
        val a = 2 * math.Pi * k / n
        Geom.Pt(math.cos(a) * 10, math.sin(a) * 10)
      }.toArray :+ Geom.Pt(10, 0)
      val xs = ArrayData.toArrayData(ring.map(_.x))
      val ys = ArrayData.toArrayData(ring.map(_.y))
      val (px, py) = (r.nextDouble() * 30 - 15, r.nextDouble() * 30 - 15)
      assert(expr.computePrim(xs, ys, px, py) ===
        Geom.rayCastInRing(px, py, ring))
    }
  }
}
