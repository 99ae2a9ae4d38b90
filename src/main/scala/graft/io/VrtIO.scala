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

  // ------------------------------------------------------------- VRT writer

  /** raster_list_vrt (vrt.py:173-263): mosaic a list of (filename, raster)
    * into one VRTDataset document — union extent, target resolution from
    * the COARSEST member (max resolution(), vrt.py:214-216), grid via the
    * same rint-based raster_data rule, bands unified BY NAME across
    * members, each member a per-band SimpleSource with full-precision
    * DstRect offsets, plus a MaskBand mirroring every source
    * (`SourceBand mask,1`). `read(write(rs))` reproduces the reference's
    * own expected_overlaps.vrt mosaic pixel-for-pixel. */
  def write(sources: Seq[(String, MRaster)], path: String): Unit = {
    require(sources.nonEmpty, "empty raster list")
    val crs = sources.head._2.crs
    require(sources.forall(_._2.crs == crs), "all rasters should have the same CRS")
    require(sources.forall(_._2.dtype == sources.head._2.dtype),
      "all rasters should have the same dtype") // bands share one dataType tag

    val coarsest = sources.map(_._2).maxBy(_.resolution)
    val (resX, resY) = (math.abs(coarsest.affine.a), math.abs(coarsest.affine.e))
    val bbs = sources.map(_._2.footprint.bbox)
    val (bxmin, bymin, bxmax, bymax) =
      (bbs.map(_.xmin).min, bbs.map(_.ymin).min,
        bbs.map(_.xmax).max, bbs.map(_.ymax).max)
    // the mosaic grid is VIRTUAL (only an XML document) — same rint rule
    // as Rasterize.rasterData without its materialization pixel budget
    // (the reference's raster_data has no cap either)
    val w = math.rint((bxmax - bxmin) / resX).toInt
    val h = math.rint((bymax - bymin) / resY).toInt
    val affine = graft.raster.Affine.northUp(bxmin, bymax, resX, resY)

    val dtypeName = sources.head._2.dtype match {
      case "uint8" => "Byte"
      case "uint16" => "UInt16"
      case "int16" => "Int16"
      case "uint32" => "UInt32"
      case "int32" => "Int32"
      case "float32" => "Float32"
      case "float64" => "Float64"
      case d => throw new IllegalArgumentException(s"cannot write VRT dtype $d")
    }
    def colorInterp(name: String): String =
      if (Set("red", "green", "blue")(name.toLowerCase)) name.toLowerCase.capitalize
      else "Gray"

    def sourceXml(fn: String, r: MRaster, band: String): String = {
      val xoff = (r.affine.c - affine.c) / affine.a
      val yoff = (r.affine.f - affine.f) / affine.e
      val xsize = r.width * r.affine.a / affine.a
      val ysize = r.height * r.affine.e / affine.e
      s"""    <SimpleSource>
         |      <SourceFilename relativeToVRT="1">$fn</SourceFilename>
         |      <SourceBand>$band</SourceBand>
         |      <SrcRect xOff="0" yOff="0" xSize="${r.width}" ySize="${r.height}" />
         |      <DstRect xOff="$xoff" yOff="$yoff" xSize="$xsize" ySize="$ysize" />
         |    </SimpleSource>""".stripMargin
    }

    // unify bands by NAME across members (vrt.py:236-244)
    val bandOrder = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[String]]
    sources.foreach { case (fn, r) =>
      r.bandNames.zipWithIndex.foreach { case (bn, i) =>
        bandOrder.getOrElseUpdate(bn.toString,
          scala.collection.mutable.ArrayBuffer.empty) += sourceXml(fn, r, (i + 1).toString)
      }
    }
    val bandsXml = bandOrder.zipWithIndex.map { case ((bn, srcs), idx) =>
      s"""  <VRTRasterBand dataType="$dtypeName" band="${idx + 1}">
         |    <ColorInterp>${colorInterp(bn)}</ColorInterp>
         |${srcs.mkString("\n")}
         |  </VRTRasterBand>""".stripMargin
    }.mkString("\n")
    val maskXml =
      s"""  <MaskBand>
         |    <VRTRasterBand dataType="Byte">
         |${sources.map { case (fn, r) => sourceXml(fn, r, "mask,1") }.mkString("\n")}
         |    </VRTRasterBand>
         |  </MaskBand>""".stripMargin

    // Locale.ROOT: a default de_DE/fr_FR JVM would format "3,82e+06" and
    // break read()'s comma-split GeoTransform parse
    val gt = Seq(affine.c, affine.a, affine.b, affine.f, affine.d, affine.e)
      .map(v => String.format(java.util.Locale.ROOT, "%.16e", Double.box(v)))
      .mkString(",  ")
    val doc =
      s"""<VRTDataset rasterXSize="$w" rasterYSize="$h">
         |  <SRS>AUTHORITY["EPSG","$crs"]</SRS>
         |  <GeoTransform>  $gt</GeoTransform>
         |$bandsXml
         |$maskXml
         |</VRTDataset>
         |""".stripMargin
    Files.write(Paths.get(path), doc.getBytes("US-ASCII"))
  }

  /** GeoMultiRaster (georaster.py:2363-2392): a virtual mosaic over a
    * raster list, realized exactly the way the reference realizes it — a
    * generated raster_list_vrt document read back through the VRT path.
    * A single-member multiraster is pixel-identical to its member
    * (test_geomultiraster.py:18-25). */
  def multiRaster(sources: Seq[(String, MRaster)],
                  resolve: String => String = identity): MRaster = {
    val tmp = Files.createTempFile("multiraster", ".vrt")
    val mosaic =
      try {
        write(sources, tmp.toString)
        read(tmp.toString, resolve)
      } finally Files.deleteIfExists(tmp)
    // read() only sees lossy ColorInterp tags — restore the member band
    // names via the same first-seen by-name unification write() applied,
    // so a single-member multiraster is FULLY identical to its member
    val names = sources.flatMap(_._2.bandNames.map(_.toString)).distinct
    mosaic.copy(bandNames = names)
  }

  /** wms_vrt (vrt.py:23-98): a VRT document over a GDAL_WMS description
    * file — the tiled-web-service half of `from_wms`. Pure deterministic
    * XML math (no network): the WMS DataWindow at its TileLevel resolution
    * gives the virtual source grid; the requested bounds (in the service
    * projection) at the requested resolution give the target grid; the
    * SrcRect is the target bounds windowed onto the virtual grid
    * (rasterio from_bounds arithmetic). Numbers golden-matched against the
    * reference's own google_israel.vrt fixture. */
  def wmsVrt(wmsPath: String, bounds: (Double, Double, Double, Double),
             resolution: Double): String = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(wmsPath))))
    val root = doc.getDocumentElement
    def opt(tag: String): Option[String] = {
      val found = root.getElementsByTagName(tag)
      if (found.getLength > 0) Some(found.item(0).getTextContent.trim) else None
    }
    val serviceName = {
      val svc = root.getElementsByTagName("Service")
      require(svc.getLength > 0, "Service tag is required")
      svc.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute("name")
    }
    val virtualEarth = serviceName == "VirtualEarth"
    val left = opt("UpperLeftX").map(_.toDouble)
      .getOrElse(if (virtualEarth) -20037508.34 else -180.0)
    val up = opt("UpperLeftY").map(_.toDouble)
      .getOrElse(if (virtualEarth) 20037508.34 else 90.0)
    val right = opt("LowerRightX").map(_.toDouble)
      .getOrElse(if (virtualEarth) 20037508.34 else 180.0)
    val bottom = opt("LowerRightY").map(_.toDouble)
      .getOrElse(if (virtualEarth) -20037508.34 else -90.0)
    val tileLevel = opt("TileLevel").map(_.toInt).getOrElse(if (virtualEarth) 19 else 0)
    val crs = opt("Projection").map(_.replaceAll("EPSG:\\s*", "").trim.toInt)
      .getOrElse(if (virtualEarth) 3857 else 4326)
    val blockx = opt("BlockSizeX").getOrElse(if (virtualEarth) "256" else "1024")
    val blocky = opt("BlockSizeY").getOrElse(if (virtualEarth) "256" else "1024")
    val bandsCount = opt("BandsCount").map(_.toInt).getOrElse(3)
    val dataType = opt("DataType").getOrElse("Byte")
    require(bandsCount == 3, "We support currently on 3 bands WMS")

    // the VIRTUAL source grid (256·2^tileLevel square) is never
    // materialized, so the rasterize-time pixel budget doesn't apply —
    // same rint rule as Rasterize.rasterData, without the guard
    val srcRes = graft.core.Mercator.resolution(tileLevel)
    val origW = math.rint((right - left) / srcRes).toInt
    val origH = math.rint((up - bottom) / srcRes).toInt
    val origT = graft.raster.Affine.northUp(left, up, srcRes, srcRes)
    val (xmin, ymin, xmax, ymax) = bounds
    val w = math.rint((xmax - xmin) / resolution).toInt
    val h = math.rint((ymax - ymin) / resolution).toInt
    val t = graft.raster.Affine.northUp(xmin, ymax, resolution, resolution)
    // rasterio windows.from_bounds on the virtual source grid
    val sxOff = (xmin - origT.c) / origT.a
    val syOff = (ymax - origT.f) / origT.e
    val sxSize = (xmax - xmin) / origT.a
    val sySize = (ymin - ymax) / origT.e

    val gt = Seq(t.c, t.a, t.b, t.f, t.d, t.e).mkString(",")
    val absPath = Paths.get(wmsPath).toAbsolutePath.toString
    val bands = Seq("Red", "Green", "Blue").zipWithIndex.map { case (ci, i) =>
      s"""<VRTRasterBand dataType="$dataType" band="${i + 1}"><ColorInterp>$ci</ColorInterp><ComplexSource><SourceFilename relativeToVRT="0">$absPath</SourceFilename><SourceBand>${i + 1}</SourceBand><SourceProperties RasterXSize="$origW" RasterYSize="$origH" BlockXSize="$blockx" BlockYSize="$blocky" DataType="$dataType"/><SrcRect xOff="$sxOff" yOff="$syOff" xSize="$sxSize" ySize="$sySize"/><DstRect xOff="0" yOff="0" xSize="$w" ySize="$h"/><UseMaskBand>true</UseMaskBand></ComplexSource></VRTRasterBand>"""
    }.mkString
    s"""<VRTDataset rasterXSize="$w" rasterYSize="$h"><SRS>AUTHORITY["EPSG","$crs"]</SRS><GeoTransform>$gt</GeoTransform><Metadata domain="IMAGE_STRUCTURE"><MDI key="INTERLEAVE">PIXEL</MDI></Metadata>$bands</VRTDataset>"""
  }
}
