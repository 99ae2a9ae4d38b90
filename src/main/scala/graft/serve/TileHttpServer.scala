package graft.serve

import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.raster.{MRaster, Png, TileServe}

/** Local HTTP tile server — the serving edge of the engine (reference:
  * `/root/reference/telluric/util/local_tile_server.py`): a thread-pool
  * HTTP app answering `/{object_id}/{x}/{y}/{z}.png` with a 256² PNG tile
  * and `/ok` as the liveness probe. JDK `com.sun.net.httpserver` + a
  * 50-thread executor (the reference's `ThreadPoolExecutor(50)` default,
  * `local_tile_server.py:30`).
  *
  * Semantics mirrored from `TileServerHandler.get`
  * (`local_tile_server.py:43-66`):
  *  - tile footprint must intersect the object's footprint, else 404;
  *  - hit → `get_tile` → PNG bytes with `Content-type: image/png`
  *    (single-band rasters encode as grayscale — the visual equivalent of
  *    the reference's `colorize("gray")` pre-pass);
  *  - unknown object id or malformed path → 404.
  *
  * Scale posture: the server is a READ edge over precomputed artifacts —
  * the mosaics/pyramids it serves are produced by the Spark jobs
  * (PyramidJob, Merge); one process per serving replica, no Spark session
  * in the request path. */
class TileHttpServer(threads: Int = 50) {

  private val objects = new ConcurrentHashMap[Int, MRaster]()
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** register a raster; returns its object id (reference: add_object). */
  def addObject(raster: MRaster): Int = {
    val id = nextId.getAndIncrement()
    objects.put(id, raster)
    id
  }

  /** start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    pool = Executors.newFixedThreadPool(threads)
    server.setExecutor(pool)
    server.createContext("/", handle _)
    server.start()
    server.getAddress.getPort
  }

  /** stop the listener AND the worker pool (its threads are non-daemon —
    * leaving them up pins the JVM past main()). */
  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }

  private val TilePath = """/(\d+)/(\d+)/(\d+)/(\d+)\.png""".r

  private def handle(ex: HttpExchange): Unit = {
    try {
      ex.getRequestURI.getPath match {
        case "/ok" => respond(ex, 200, "text/plain", "OK".getBytes)
        case TilePath(id, x, y, z) =>
          val raster = objects.get(id.toInt)
          if (raster == null) respond(ex, 404, "text/plain", "no such object".getBytes)
          else serveTile(ex, raster, x.toLong, y.toLong, z.toInt)
        case _ => respond(ex, 404, "text/plain", "not found".getBytes)
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, "text/plain", String.valueOf(e.getMessage).getBytes)
    } finally ex.close()
  }

  private def serveTile(ex: HttpExchange, raster: MRaster, x: Long, y: Long, z: Int): Unit = {
    val b = graft.core.Mercator.xyBounds(x, y, z)
    val fp = raster.footprint.bbox
    if (!fp.intersects(graft.core.Geom.BBox(b.left, b.bottom, b.right, b.top))) {
      respond(ex, 404, "text/plain", "tile outside footprint".getBytes)
    } else {
      val tile = TileServe.getTile(raster, x, y, z)
      respond(ex, 200, "image/png", Png.toPng(tile))
    }
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, body.length)
    val os = ex.getResponseBody
    os.write(body)
    os.close()
  }
}
