package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Typed-API Column wrappers over the registered function surface.
  * Requires a session built with [[GraftExtensions]] (see [[GraftSession]]).
  * Mirrors `org.apache.spark.sql.functions` style. */
object functions {
  private def f(name: String, cols: Column*): Column = call_function(name, cols: _*)

  def st_point(x: Column, y: Column): Column = f("st_point", x, y)
  def st_makebbox(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    f("st_makebbox", xmin, ymin, xmax, ymax)
  def st_geomfromgeojson(s: Column): Column = f("st_geomfromgeojson", s)
  def st_asgeojson(g: Column): Column = f("st_asgeojson", g)
  def st_geomfromtext(s: Column): Column = f("st_geomfromtext", s)
  def st_astext(g: Column): Column = f("st_astext", g)

  def st_x(g: Column): Column = f("st_x", g)
  def st_y(g: Column): Column = f("st_y", g)
  def st_xmin(g: Column): Column = f("st_xmin", g)
  def st_ymin(g: Column): Column = f("st_ymin", g)
  def st_xmax(g: Column): Column = f("st_xmax", g)
  def st_ymax(g: Column): Column = f("st_ymax", g)
  def st_area(g: Column): Column = f("st_area", g)
  def st_area_eck4(g: Column): Column = f("st_area_eck4", g)
  def st_isempty(g: Column): Column = f("st_isempty", g)
  def st_isvalid(g: Column): Column = f("st_isvalid", g)
  def st_issimple(g: Column): Column = f("st_issimple", g)

  def st_boundary(g: Column): Column = f("st_boundary", g)
  def st_centroid(g: Column): Column = f("st_centroid", g)
  def st_convexhull(g: Column): Column = f("st_convexhull", g)
  def st_envelope(g: Column): Column = f("st_envelope", g)
  def st_buffer(g: Column, dist: Column): Column = f("st_buffer", g, dist)
  def st_buffer(g: Column, dist: Column, capStyle: Column): Column =
    f("st_buffer", g, dist, capStyle)
  def st_simplify(g: Column, tol: Column): Column = f("st_simplify", g, tol)
  def st_transform(g: Column, srcSrid: Column, dstSrid: Column): Column =
    f("st_transform", g, srcSrid, dstSrid)

  def st_contains(a: Column, b: Column): Column = f("st_contains", a, b)
  def st_contains_xy(poly: Column, lon: Column, lat: Column): Column =
    f("st_contains_xy", poly, lon, lat)
  def st_contains_ring(xs: Column, ys: Column, lon: Column, lat: Column): Column =
    f("st_contains_ring", xs, ys, lon, lat)
  def st_within(a: Column, b: Column): Column = f("st_within", a, b)
  def st_intersects(a: Column, b: Column): Column = f("st_intersects", a, b)
  def st_disjoint(a: Column, b: Column): Column = f("st_disjoint", a, b)
  def st_equals(a: Column, b: Column): Column = f("st_equals", a, b)
  def st_touches(a: Column, b: Column): Column = f("st_touches", a, b)
  def st_crosses(a: Column, b: Column): Column = f("st_crosses", a, b)
  def st_overlaps(a: Column, b: Column): Column = f("st_overlaps", a, b)
  def st_covers(a: Column, b: Column): Column = f("st_covers", a, b)
  def st_equals_exact(a: Column, b: Column, tol: Column): Column =
    f("st_equals_exact", a, b, tol)
  def st_almost_equals(a: Column, b: Column, decimal: Column): Column =
    f("st_almost_equals", a, b, decimal)
  def st_relate(a: Column, b: Column): Column = f("st_relate", a, b)
  def st_has_z(g: Column): Column = f("st_has_z", g)
  def st_is_closed(g: Column): Column = f("st_is_closed", g)
  def st_is_ring(g: Column): Column = f("st_is_ring", g)
  def st_exterior(g: Column): Column = f("st_exterior", g)
  def st_interiors(g: Column): Column = f("st_interiors", g)
  def st_coords(g: Column): Column = f("st_coords", g)
  def st_xy(g: Column): Column = f("st_xy", g)

  def st_intersection(a: Column, b: Column): Column = f("st_intersection", a, b)
  def st_union(a: Column, b: Column): Column = f("st_union", a, b)
  def st_difference(a: Column, b: Column): Column = f("st_difference", a, b)
  def st_symdifference(a: Column, b: Column): Column = f("st_symdifference", a, b)
  def st_distance(a: Column, b: Column): Column = f("st_distance", a, b)

  def st_tile(lon: Column, lat: Column, z: Column): Column = f("st_tile", lon, lat, z)
  def st_tile(lon: Column, lat: Column, z: Int): Column = f("st_tile", lon, lat, lit(z))
  def tile_x(cell: Column): Column = f("tile_x", cell)
  def tile_y(cell: Column): Column = f("tile_y", cell)
  def tile_z(cell: Column): Column = f("tile_z", cell)
  def tile_parent(cell: Column, dz: Column): Column = f("tile_parent", cell, dz)
  def tile_bounds_3857(cell: Column): Column = f("tile_bounds_3857", cell)
  def tile_geom(cell: Column): Column = f("tile_geom", cell)
  def mercator_res(z: Column): Column = f("mercator_res", z)
  def st_morton(x: Column, y: Column): Column = f("st_morton", x, y)

  def tiles_for(g: Column, zooms: Column): Column = f("tiles_for", g, zooms)
  def cell_ring(cell: Column, r: Column): Column = f("cell_ring", cell, r)
  def grid_cells(g: Column, nx: Column, ny: Column): Column = f("grid_cells", g, nx, ny)

  def st_envelope_agg(g: Column): Column = f("st_envelope_agg", g)
  def st_union_agg(g: Column): Column = f("st_union_agg", g)
}
