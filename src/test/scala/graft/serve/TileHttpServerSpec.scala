package graft.serve

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Affine, MRaster, Png, TileServe}

/** HTTP serving edge vs the reference tile server contract
  * (`/root/reference/telluric/util/local_tile_server.py`): `/ok` liveness,
  * `/{id}/{x}/{y}/{z}.png` tile bytes, 404 on footprint miss / unknown id. */
class TileHttpServerSpec extends AnyFunSuite {

  private def fetch(url: String): (Int, String, Array[Byte]) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(10000)
    val code = conn.getResponseCode
    val ctype = String.valueOf(conn.getContentType)
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) Array.emptyByteArray else is.readAllBytes()
    conn.disconnect()
    (code, ctype, body)
  }

  test("serves /ok, PNG tiles inside footprint, 404 outside and for unknown ids") {
    // raster covering exactly tile (2,2,2)
    val b = graft.core.Mercator.xyBounds(2, 2, 2)
    val res = (b.right - b.left) / 512
    val raster = MRaster.filled(512, 512, 7.0, Seq("1"),
      Affine.northUp(b.left, b.top, res, res), 3857, "uint8", None)
    val srv = new TileHttpServer(threads = 4)
    val id = srv.addObject(raster)
    val port = srv.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val (okCode, _, okBody) = fetch(s"$base/ok")
      assert(okCode === 200 && new String(okBody) === "OK")

      val (code, ctype, body) = fetch(s"$base/$id/2/2/2.png")
      assert(code === 200 && ctype === "image/png")
      // bytes are exactly the engine's own tile encoding
      val expected = Png.toPng(TileServe.getTile(raster, 2, 2, 2))
      assert(body.sameElements(expected))
      // and a real decodable 256² PNG
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(body))
      assert(img.getWidth === 256 && img.getHeight === 256)

      // tile outside the footprint → 404 (local_tile_server.py:64-66)
      assert(fetch(s"$base/$id/0/0/2.png")._1 === 404)
      // unknown object id → 404
      assert(fetch(s"$base/99/2/2/2.png")._1 === 404)
      // malformed path → 404
      assert(fetch(s"$base/not/a/tile")._1 === 404)
    } finally srv.stop()
  }

  test("concurrent tile fetches through the thread pool") {
    val b = graft.core.Mercator.xyBounds(2, 2, 2)
    val res = (b.right - b.left) / 512
    val raster = MRaster.filled(512, 512, 9.0, Seq("1"),
      Affine.northUp(b.left, b.top, res, res), 3857, "uint8", None)
    val srv = new TileHttpServer(threads = 8)
    val id = srv.addObject(raster)
    val port = srv.start()
    try {
      val expected = Png.toPng(TileServe.getTile(raster, 2, 2, 2))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 16).map(_ => Future(
          fetch(s"http://127.0.0.1:$port/$id/2/2/2.png")))), 60.seconds)
      assert(results.forall(_._1 == 200))
      assert(results.forall(_._3.sameElements(expected)))
    } finally srv.stop()
  }
}
