package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.raster.{MRaster, Reproject, Resample, RasterArtifact}

/** Single-file Cloud-Optimized GeoTIFF writer — `save_cloud_optimized`
  * parity (georaster.py:1923-1943; layout contract = the checks of the
  * GDAL validator the reference vendors,
  * tests/util/validate_cloud_optimized_geotiff.py, ported to
  * [[CogValidator]]):
  *
  *  - classic little-endian TIFF, main IFD at byte 8;
  *  - 256² Deflate tiles (tags 322/323/324/325) for the main image and
  *    every overview;
  *  - overview IFDs (NewSubfileType 254 = 1) chained after the main IFD in
  *    DESCENDING size order, all IFDs and their external values written
  *    before any pixel data;
  *  - internal per-dataset mask IFDs (NewSubfileType = 4 full-res,
  *    5 per overview; 1-bit, PhotometricInterpretation = 4 —
  *    GDAL_TIFF_INTERNAL_MASK layout, bit 1 = valid) carrying
  *    `MRaster.mask` and its overview downsamples;
  *  - pixel data ordered smallest-overview → … → largest-overview → main
  *    image LAST (mask tiles first), so a range reader fetching the head
  *    of the file gets every IFD plus the low-resolution pyramid;
  *  - overview factors follow `_calc_overviews_factors`
  *    (util/raster_utils.py) via [[RasterArtifact.overviewFactors]];
  *    overview resampling = cubic (this engine's documented default for
  *    the reference's gauss).
  *
  * `GeoTiffIO.read(write(r)) ≡ r` on the main image incl. the mask. */
object CogWriter {

  val BlockSize = 256

  private final case class Entry(tag: Int, ttype: Int, count: Int,
                                 payload: Array[Byte])

  private def shorts(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putShort(v.toShort)); b.array()
  }
  private def longs(vs: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putInt(v.toInt)); b.array()
  }
  private def dbls(vs: Double*): Array[Byte] = {
    val b = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble); b.array()
  }
  private def ascii(s: String): Array[Byte] = (s + " ").getBytes("ISO-8859-1")

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def dtypeInfo(dtype: String): (Int, Int) = dtype match {
    case "uint8" => (1, 8)
    case "uint16" => (1, 16)
    case "uint32" => (1, 32)
    case "int16" => (2, 16)
    case "int32" => (2, 32)
    case "float32" => (3, 32)
    case "float64" => (3, 64)
    case d => throw new IllegalArgumentException(s"cannot write dtype $d")
  }

  /** chunky-interleaved deflated sample tile (padded to tile dims). */
  private def sampleTile(r: MRaster, tx: Int, ty: Int, tw: Int, th: Int,
                         bytesPerSample: Int): Array[Byte] = {
    val spp = r.numBands
    val raw = ByteBuffer.allocate(tw * th * spp * bytesPerSample)
      .order(ByteOrder.LITTLE_ENDIAN)
    var row = 0
    while (row < th) {
      val gy = ty * th + row
      var c = 0
      while (c < tw) {
        val gx = tx * tw + c
        val inside = gx < r.width && gy < r.height
        var s = 0
        while (s < spp) {
          val v = if (inside) r.image(s)(gy * r.width + gx) else 0.0
          val at = ((row * tw + c) * spp + s) * bytesPerSample
          r.dtype match {
            case "uint8" => raw.put(at, v.toInt.toByte)
            case "uint16" | "int16" => raw.putShort(at, v.toInt.toShort)
            case "uint32" | "int32" => raw.putInt(at, v.toLong.toInt)
            case "float32" => raw.putFloat(at, v.toFloat)
            case "float64" => raw.putDouble(at, v)
          }
          s += 1
        }
        c += 1
      }
      row += 1
    }
    deflate(raw.array())
  }

  /** 1-bit mask tile, MSB-first fill order, bit 1 = VALID (GDAL mask). */
  private def maskTile(r: MRaster, tx: Int, ty: Int, tw: Int, th: Int): Array[Byte] = {
    val rowBytes = (tw + 7) / 8
    val raw = new Array[Byte](rowBytes * th)
    var row = 0
    while (row < th) {
      val gy = ty * th + row
      var c = 0
      while (c < tw) {
        val gx = tx * tw + c
        val valid = gx < r.width && gy < r.height && !r.mask(gy * r.width + gx)
        if (valid)
          raw(row * rowBytes + (c >> 3)) =
            (raw(row * rowBytes + (c >> 3)) | (0x80 >> (c & 7))).toByte
        c += 1
      }
      row += 1
    }
    deflate(raw)
  }

  private final case class Ifd(entries: Seq[Entry], tiles: Seq[Array[Byte]])

  /** external values are even-padded (TIFF 6.0: values begin on a word
    * boundary; ASCII payloads can be odd-length). */
  private def padded(len: Int): Int = len + (len & 1)

  /** IFD block size on disk: entry table + next pointer + external values. */
  private def ifdBlockSize(e: Seq[Entry]): Int =
    2 + 12 * e.length + 4 + e.map(_.payload.length).filter(_ > 4).map(padded).sum

  def write(r: MRaster, path: String, blocksize: Int = BlockSize): Unit =
    writeLayout(r, path, blocksize, cogDataOrder = true)

  /** test hook: `cogDataOrder = false` writes the SAME IFDs but puts the
    * main image's data FIRST — a structurally valid TIFF that violates the
    * COG data-ordering contract, proving the validator's ordering checks
    * are not vacuous. */
  private[io] def writeLayout(r: MRaster, path: String, blocksize: Int,
                              cogDataOrder: Boolean): Unit = {
    val (sampleFormat, bps) = dtypeInfo(r.dtype)
    val spp = r.numBands
    val bytesPerSample = bps / 8
    val tw = blocksize
    val th = blocksize

    // overview pyramid, cubic-resampled, DESCENDING size
    val factors = RasterArtifact.overviewFactors(r, blocksize)
    val overviews = factors.map { f =>
      Reproject.reproject(r,
        dimensions = Some(((r.width + f - 1) / f, (r.height + f - 1) / f)),
        resampling = Resample.Cubic)
    }

    def tilesOf(lvl: MRaster): Seq[Array[Byte]] = {
      val ta = (lvl.width + tw - 1) / tw
      val td = (lvl.height + th - 1) / th
      (0 until td).flatMap(ty => (0 until ta).map(tx =>
        sampleTile(lvl, tx, ty, tw, th, bytesPerSample)))
    }
    def maskTilesOf(lvl: MRaster): Seq[Array[Byte]] = {
      val ta = (lvl.width + tw - 1) / tw
      val td = (lvl.height + th - 1) / th
      (0 until td).flatMap(ty => (0 until ta).map(tx => maskTile(lvl, tx, ty, tw, th)))
    }

    val nodataStr = r.nodata.map(nd =>
      if (nd == nd.toLong) nd.toLong.toString else nd.toString)
    val bandNamesXml =
      "<GDALMetadata>\n  <Item name=\"band_names\" domain=\"rastile\">[" +
        r.bandNames.mkString(", ") + "]</Item>\n</GDALMetadata>\n"
    val geographic = r.crs == 4326
    val geoKeys: Seq[Int] = Seq(
      1, 1, 0, 3,
      1024, 0, 1, if (geographic) 2 else 1,
      1025, 0, 1, 1) ++
      (if (geographic) Seq(2048, 0, 1, r.crs) else Seq(3072, 0, 1, r.crs))

    // entries with PLACEHOLDER 324 offsets; counts (hence sizes) are final
    def imageIfd(lvl: MRaster, isOverview: Boolean, withGeo: Boolean): Ifd = {
      val tiles = tilesOf(lvl)
      val es = (Seq.empty[Entry] ++
        (if (isOverview) Seq(Entry(254, 4, 1, longs(1L))) else Nil) ++ Seq(
        // dims as LONG (TIFF allows SHORT or LONG): a pyramided raster
        // routinely exceeds 65535 px and a SHORT would silently wrap
        Entry(256, 4, 1, longs(lvl.width.toLong)),
        Entry(257, 4, 1, longs(lvl.height.toLong)),
        Entry(258, 3, spp, shorts(Seq.fill(spp)(bps): _*)),
        Entry(259, 3, 1, shorts(8)),
        Entry(262, 3, 1, shorts(if (spp >= 3) 2 else 1)),
        Entry(277, 3, 1, shorts(spp)),
        Entry(284, 3, 1, shorts(1)),
        Entry(322, 3, 1, shorts(tw)),
        Entry(323, 3, 1, shorts(th)),
        Entry(324, 4, tiles.length, longs(tiles.map(_ => 0L): _*)),
        Entry(325, 4, tiles.length, longs(tiles.map(_.length.toLong): _*)),
        Entry(339, 3, spp, shorts(Seq.fill(spp)(sampleFormat): _*))) ++
        (if (withGeo) Seq(
          Entry(33550, 12, 3, dbls(r.affine.a, -r.affine.e, 0.0)),
          Entry(33922, 12, 6, dbls(0, 0, 0, r.affine.c, r.affine.f, 0)),
          Entry(34735, 3, geoKeys.length, shorts(geoKeys: _*)),
          Entry(42112, 2, bandNamesXml.length + 1, ascii(bandNamesXml))) ++
          nodataStr.map(s => Entry(42113, 2, s.length + 1, ascii(s))).toSeq
        else Nil)).sortBy(_.tag)
      Ifd(es, tiles)
    }
    // subfileType 4 = mask of the full-res image; 5 = FILETYPE_REDUCEDIMAGE
    // | FILETYPE_MASK — mask of an overview (GDAL internal-mask layout)
    def maskIfd(lvl: MRaster, subfileType: Long): Ifd = {
      val tiles = maskTilesOf(lvl)
      val es = Seq(
        Entry(254, 4, 1, longs(subfileType)),
        Entry(256, 4, 1, longs(lvl.width.toLong)),
        Entry(257, 4, 1, longs(lvl.height.toLong)),
        Entry(258, 3, 1, shorts(1)),
        Entry(259, 3, 1, shorts(8)),
        Entry(262, 3, 1, shorts(4)),
        Entry(277, 3, 1, shorts(1)),
        Entry(284, 3, 1, shorts(1)),
        Entry(322, 3, 1, shorts(tw)),
        Entry(323, 3, 1, shorts(th)),
        Entry(324, 4, tiles.length, longs(tiles.map(_ => 0L): _*)),
        Entry(325, 4, tiles.length, longs(tiles.map(_.length.toLong): _*)),
        Entry(339, 3, 1, shorts(1))).sortBy(_.tag)
      Ifd(es, tiles)
    }

    // chain order = main, overviews (descending), full-res mask, overview
    // masks (the GDAL internal-mask IFD layout)
    val nOvr = overviews.length
    val ifds: Seq[Ifd] =
      (imageIfd(r, isOverview = false, withGeo = true) +:
        overviews.map(o => imageIfd(o, isOverview = true, withGeo = false))) ++
        (maskIfd(r, 4L) +: overviews.map(o => maskIfd(o, 5L)))

    // layout: [header][IFD blocks in chain order][all mask data]
    //         [smallest-ovr data]…[largest-ovr data][main data]
    val ifdOffsets = ifds.scanLeft(8)((off, ifd) => off + ifdBlockSize(ifd.entries)).init
    val dataStart = 8 + ifds.map(i => ifdBlockSize(i.entries)).sum
    // data write order by IFD index: masks first, then overviews reversed
    // (smallest first), then main (index 0) LAST
    val dataOrder: Seq[Int] =
      if (cogDataOrder) (nOvr + 1 until ifds.length) ++ (nOvr to 1 by -1) ++ Seq(0)
      else Seq(0) ++ (nOvr + 1 until ifds.length) ++ (nOvr to 1 by -1)
    var cursor = dataStart.toLong
    val tileOffsets: Map[Int, Seq[Long]] = dataOrder.map { idx =>
      val offs = ifds(idx).tiles.map { t =>
        val o = cursor; cursor += t.length; o
      }
      idx -> offs
    }.toMap
    require(cursor < Int.MaxValue.toLong,
      s"COG would be $cursor bytes — classic TIFF offsets are 32-bit; " +
        "shard the raster (RasterArtifact) or reduce it before writing " +
        "(BigTIFF is out of scope)")
    val total = cursor.toInt

    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 'I'.toByte); out.put(1, 'I'.toByte)
    out.putShort(2, 42); out.putInt(4, 8)
    ifds.zipWithIndex.foreach { case (ifd, idx) =>
      val base = ifdOffsets(idx)
      val entries = ifd.entries.map { e =>
        if (e.tag == 324) e.copy(payload = longs(tileOffsets(idx): _*)) else e
      }
      out.putShort(base, entries.length.toShort)
      var extOff = base + 2 + 12 * entries.length + 4
      entries.zipWithIndex.foreach { case (e, i) =>
        val at = base + 2 + 12 * i
        out.putShort(at, e.tag.toShort)
        out.putShort(at + 2, e.ttype.toShort)
        out.putInt(at + 4, e.count)
        if (e.payload.length <= 4)
          System.arraycopy(e.payload.padTo(4, 0.toByte), 0, out.array(), at + 8, 4)
        else {
          System.arraycopy(longs(extOff.toLong), 0, out.array(), at + 8, 4)
          System.arraycopy(e.payload, 0, out.array(), extOff, e.payload.length)
          extOff += padded(e.payload.length)
        }
      }
      val next = if (idx + 1 < ifds.length) ifdOffsets(idx + 1) else 0
      out.putInt(base + 2 + 12 * entries.length, next)
    }
    ifds.indices.foreach { idx =>
      ifds(idx).tiles.zip(tileOffsets(idx)).foreach { case (t, o) =>
        System.arraycopy(t, 0, out.array(), o.toInt, t.length)
      }
    }
    Files.write(Paths.get(path), out.array())
  }
}

/** Scala port of the structural checks in the GDAL COG validator the
  * reference vendors (tests/util/validate_cloud_optimized_geotiff.py):
  * returns the error list (empty = valid). Reads only IFD metadata. */
object CogValidator {

  /** (NewSubfileType, width, height) per chained IFD — spec hook for
    * asserting the main/overview/mask IFD inventory. */
  def ifdSummary(path: String): Seq[(Long, Int, Int)] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val order =
      if (bytes(0) == 'I' && bytes(1) == 'I') ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    var out = Vector.empty[(Long, Int, Int)]
    var off = (buf.getInt(4) & 0xFFFFFFFFL).toInt
    while (off != 0) {
      val n = buf.getShort(off) & 0xFFFF
      var sub = 0L; var w = 0; var h = 0
      (0 until n).foreach { i =>
        val e = off + 2 + 12 * i
        val tag = buf.getShort(e) & 0xFFFF
        val ttype = buf.getShort(e + 2) & 0xFFFF
        def inlineLong: Long =
          if (ttype == 3) (buf.getShort(e + 8) & 0xFFFF).toLong
          else buf.getInt(e + 8) & 0xFFFFFFFFL
        tag match {
          case 254 => sub = inlineLong
          case 256 => w = inlineLong.toInt
          case 257 => h = inlineLong.toInt
          case _ => ()
        }
      }
      out = out :+ ((sub, w, h))
      off = buf.getInt(off + 2 + 12 * n)
    }
    out
  }

  def validate(path: String): Seq[String] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val order =
      if (bytes(0) == 'I' && bytes(1) == 'I') ByteOrder.LITTLE_ENDIAN
      else if (bytes(0) == 'M' && bytes(1) == 'M') ByteOrder.BIG_ENDIAN
      else return Seq("not a TIFF (bad byte-order mark)")
    val buf = ByteBuffer.wrap(bytes).order(order)
    if (buf.getShort(2) != 42) return Seq("not a classic TIFF (bad magic)")

    val errors = Seq.newBuilder[String]
    val mainIfdOffset = buf.getInt(4) & 0xFFFFFFFFL
    if (mainIfdOffset != 8)
      errors += s"The offset of the main IFD should be 8 for ClassicTIFF. It is $mainIfdOffset instead"

    // walk the IFD chain
    final case class IfdInfo(offset: Long, subfileType: Long, width: Int,
                             height: Int, tiled: Boolean, firstBlock: Long)
    var chain = Vector.empty[IfdInfo]
    var off = mainIfdOffset
    while (off != 0) {
      val o = off.toInt
      val n = buf.getShort(o) & 0xFFFF
      var sub = 0L; var w = 0; var h = 0; var tiled = false; var block0 = -1L
      (0 until n).foreach { i =>
        val e = o + 2 + 12 * i
        val tag = buf.getShort(e) & 0xFFFF
        val ttype = buf.getShort(e + 2) & 0xFFFF
        val count = buf.getInt(e + 4)
        def inlineLong: Long =
          if (ttype == 3) (buf.getShort(e + 8) & 0xFFFF).toLong
          else buf.getInt(e + 8) & 0xFFFFFFFFL
        tag match {
          case 254 => sub = inlineLong
          case 256 => w = inlineLong.toInt
          case 257 => h = inlineLong.toInt
          case 322 => tiled = true
          case 324 | 273 =>
            block0 =
              if (count == 1) inlineLong
              else {
                val ext = buf.getInt(e + 8) & 0xFFFFFFFFL
                buf.getInt(ext.toInt) & 0xFFFFFFFFL
              }
          case _ => ()
        }
      }
      chain = chain :+ IfdInfo(off, sub, w, h, tiled, block0)
      off = buf.getInt(o + 2 + 12 * n) & 0xFFFFFFFFL
    }
    if (chain.isEmpty) return Seq("no IFD found")

    val main = chain.head
    // masks (bit 4 of NewSubfileType) are excluded from overview ordering,
    // exactly as the GDAL validator walks band overviews only
    val overviews = chain.tail.filter(i => (i.subfileType & 4L) == 0L)

    if (main.width >= 512 || main.height >= 512) {
      if (!main.tiled)
        errors += "The file is greater than 512xH or Wx512, but is not tiled"
      if (overviews.isEmpty)
        errors += "The file is greater than 512xH or Wx512, but has no overviews"
    }

    // overviews by descending size; IFD offsets strictly increasing
    overviews.zipWithIndex.foreach { case (ovr, i) =>
      val prev = if (i == 0) main else overviews(i - 1)
      if (ovr.width > prev.width || ovr.height > prev.height)
        errors += (if (i == 0) "First overview has larger dimension than main band"
        else s"Overview of index $i has larger dimension than overview of index ${i - 1}")
      if (!ovr.tiled) errors += s"Overview of index $i is not tiled"
      if (ovr.offset < prev.offset)
        errors += s"The offset of the IFD for overview of index $i is ${ovr.offset}, " +
          s"whereas it should be greater than the previous one at ${prev.offset}"
    }

    // imagery starts with the smallest overview and ends with the main image
    val dataOffsets = main.firstBlock +: overviews.map(_.firstBlock)
    val lastIfdOffset = (main +: overviews).map(_.offset).max
    if (dataOffsets.last < lastIfdOffset)
      errors += (if (overviews.nonEmpty)
        "The offset of the first block of the smallest overview should be after its IFD"
      else "The offset of the first block of the image should be after its IFD")
    (dataOffsets.length - 2 to 1 by -1).foreach { i =>
      if (dataOffsets(i) < dataOffsets(i + 1))
        errors += s"The offset of the first block of overview of index ${i - 1} " +
          s"should be after the one of the overview of index $i"
    }
    if (dataOffsets.length >= 2 && dataOffsets(0) < dataOffsets(1))
      errors += "The offset of the first block of the main resolution image " +
        s"should be after the one of the overview of index ${overviews.length - 1}"

    errors.result()
  }
}
