package graft.ops

import graft.sql.SparkTestBase
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** REAL image decode/resize via the JDK codecs (javax.imageio) — the
  * multimodal columns are no longer stub-only: PNG/JPEG/BMP payloads give
  * true dimensions/bands/luma features; non-image payloads fall back to
  * the deterministic stub on the same schema. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(1, w - 1)) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real PNG decode: true dims, bands, luma histogram over actual pixels") {
    val png = encode(gradient(32, 16), "png")
    assert(MultimodalOps.sniffFormat(png) === Some("png"))
    val df = Seq((7L, png)).toDF("doc_id", "payload")
    val out = MultimodalOps.decode(df).collect()(0)
    assert(out.format === "png")
    assert(out.width === 32 && out.height === 16 && out.bands === 3)
    assert(out.features.sum === 512f) // one histogram count per pixel
    // gradient spans dark→light: first and last luma bins both populated
    assert(out.features(0) > 0 && out.features(MultimodalOps.FeatureDim - 1) > 0)
  }

  test("real JPEG and BMP decode route by magic bytes") {
    val jpg = encode(gradient(20, 10), "jpg")
    val bmp = encode(gradient(8, 8), "bmp")
    assert(MultimodalOps.sniffFormat(jpg) === Some("jpeg"))
    assert(MultimodalOps.sniffFormat(bmp) === Some("bmp"))
    val df = Seq((1L, jpg), (2L, bmp)).toDF("doc_id", "payload")
    val out = MultimodalOps.decode(df).collect().sortBy(_.doc_id)
    assert(out(0).format === "jpeg" && out(0).width === 20 && out(0).height === 10)
    assert(out(1).format === "bmp" && out(1).width === 8 && out(1).height === 8)
  }

  test("mixed batch: images decode for real, html falls back to stub, one schema") {
    val df = Seq(
      (1L, encode(gradient(16, 16), "png")),
      (2L, "<html>not an image</html>".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.decode(df).collect().sortBy(_.doc_id)
    assert(out(0).format === "png" && out(0).width === 16)
    assert(out(1).format === "raw") // stub path, same MediaMeta schema
    assert(out(1).byte_len === 25)
  }

  test("real thumbnail: aspect-preserving resize, PNG re-encode, reopenable") {
    val png = encode(gradient(64, 32), "png")
    val df = Seq((1L, png), (2L, "plain".getBytes)).toDF("doc_id", "payload")
    val out = MultimodalOps.thumbnails(df, maxDim = 16).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)))
      .toMap
    assert(out(2L) === null) // non-image → null thumb
    val thumb = ImageIO.read(new java.io.ByteArrayInputStream(out(1L)))
    assert(thumb.getWidth === 16 && thumb.getHeight === 8) // 64×32 → 16×8
    // monotone gradient survives the resample: left darker than right
    val l = thumb.getRGB(0, 4) & 0xFF
    val r = thumb.getRGB(15, 4) & 0xFF
    assert(l < r)
  }
}
