package graft.io

import java.nio.file.{Files, Paths}

import graft.raster.{Affine, MRaster}

/** GDAL VRT (virtual raster) reader — the reference builds VRTs as its
  * mosaic/boundless/WMS plumbing (`/root/reference/telluric/vrt.py`,
  * tests/test_vrt.py) and ships .vrt fixtures. Composes the GeoTIFF codec:
  * parse the VRTDataset XML (JDK DOM), open each source once, and paint
  * every Simple/ComplexSource's SrcRect onto the target grid's DstRect with
  * nearest resampling (GDAL's default), masked source pixels skipped
  * (UseMaskBand semantics) and later sources overwriting earlier ones
  * (GDAL paint order). Target pixels never painted stay masked — the
  * "boundless" part of boundless_vrt_doc. */
object VrtIO {

  def read(path: String, resolve: String => String = identity): MRaster = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(path))))
    val root = doc.getDocumentElement
    require(root.getTagName == "VRTDataset", "not a VRTDataset")
    val w = root.getAttribute("rasterXSize").toInt
    val h = root.getAttribute("rasterYSize").toInt

    val gt = text(root, "GeoTransform").split(",").map(_.trim.toDouble)
    val affine = Affine(gt(1), gt(2), gt(0), gt(4), gt(5), gt(3))
    val crs = {
      val srs = text(root, "SRS")
      """AUTHORITY\["EPSG","(\d+)"\]""".r.findAllMatchIn(srs).toSeq.lastOption
        .map(_.group(1).toInt).getOrElse(0)
    }

    val bandNodes = children(root, "VRTRasterBand").filter(_.hasAttribute("band"))
    val nBands = bandNodes.length
    val dtype = bandNodes.headOption.map(_.getAttribute("dataType")) match {
      case Some("Byte") => "uint8"
      case Some("UInt16") => "uint16"
      case Some("Int16") => "int16"
      case Some("UInt32") => "uint32"
      case Some("Int32") => "int32"
      case Some("Float32") => "float32"
      case Some("Float64") => "float64"
      case other => throw new IllegalArgumentException(s"unsupported VRT dataType $other")
    }

    val image = Array.fill(nBands)(new Array[Double](w * h))
    val mask = Array.fill(w * h)(true) // unpainted = masked (boundless)
    val cache = scala.collection.mutable.Map.empty[String, MRaster]
    def source(fn: String): MRaster =
      cache.getOrElseUpdate(fn, GeoTiffIO.read(resolve(fn)))

    bandNodes.foreach { bn =>
      val bandIdx = bn.getAttribute("band").toInt - 1
      (children(bn, "ComplexSource") ++ children(bn, "SimpleSource")).foreach { srcNode =>
        val fn = text(srcNode, "SourceFilename")
        val srcBand = text(srcNode, "SourceBand").trim match {
          case s if s.startsWith("mask") => -1
          case s => s.toInt - 1
        }
        if (srcBand >= 0) {
          val src = source(fn)
          val sr = rect(srcNode, "SrcRect")
          val dr = rect(srcNode, "DstRect")
          paint(src, srcBand, sr, dr, image(bandIdx), mask, w, h)
        }
      }
    }
    MRaster(image, mask, w, h, affine, crs,
      (0 until nBands).map(_.toString), dtype, None)
  }

  /** nearest-resampled paint of src's SrcRect onto the target's DstRect;
    * masked source pixels don't paint; painted pixels unmask. */
  private def paint(src: MRaster, band: Int,
      sr: (Double, Double, Double, Double), dr: (Double, Double, Double, Double),
      out: Array[Double], mask: Array[Boolean], w: Int, h: Int): Unit = {
    val (sx0, sy0, sw, sh) = sr
    val (dx0, dy0, dw, dh) = dr
    val x0 = math.max(0, math.floor(dx0).toInt)
    val y0 = math.max(0, math.floor(dy0).toInt)
    val x1 = math.min(w, math.ceil(dx0 + dw).toInt)
    val y1 = math.min(h, math.ceil(dy0 + dh).toInt)
    var y = y0
    while (y < y1) {
      val sy = math.floor(sy0 + (y + 0.5 - dy0) * sh / dh).toInt
      if (sy >= 0 && sy < src.height) {
        var x = x0
        while (x < x1) {
          val sx = math.floor(sx0 + (x + 0.5 - dx0) * sw / dw).toInt
          if (sx >= 0 && sx < src.width) {
            val si = sy * src.width + sx
            if (!src.mask(si)) {
              val di = y * w + x
              out(di) = src.image(band)(si)
              mask(di) = false
            }
          }
          x += 1
        }
      }
      y += 1
    }
  }

  private def children(n: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val kids = n.getChildNodes
    (0 until kids.getLength).map(kids.item)
      .collect { case e: org.w3c.dom.Element if e.getTagName == tag => e }
  }

  private def text(n: org.w3c.dom.Element, tag: String): String = {
    val found = n.getElementsByTagName(tag)
    require(found.getLength > 0, s"missing <$tag>")
    found.item(0).getTextContent
  }

  private def rect(n: org.w3c.dom.Element, tag: String): (Double, Double, Double, Double) = {
    val e = children(n, tag).head
    (e.getAttribute("xOff").toDouble, e.getAttribute("yOff").toDouble,
      e.getAttribute("xSize").toDouble, e.getAttribute("ySize").toDouble)
  }
}
