package graft.io

/** JPEG2000 (.jp2) container BOX validation layer (ISO/IEC 15444-1 Annex
  * I): walks the signature box, ftyp brand, and the jp2h superbox's ihdr,
  * proving the file IS a conforming JP2 and extracting its image geometry
  * BEFORE [[Jp2Decoder]] touches the codestream — so a non-JP2 file with a
  * .jp2 extension, or a truncated/lying container, always fails with this
  * contract's specific IllegalArgumentException (fuzz-swept in Jp2Spec)
  * rather than a decoder crash. */
object Jp2Probe {

  /** (height, width, numComponents, bitsPerComponent) from the ihdr box. */
  final case class Jp2Header(height: Int, width: Int, nc: Int, bpc: Int)

  private val Signature: Array[Byte] =
    Array(0x00, 0x00, 0x00, 0x0c, 0x6a, 0x50, 0x20, 0x20,
      0x0d, 0x0a, 0x87, 0x0a).map(_.toByte)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "ISO-8859-1")

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  /** Parse the container header; IllegalArgumentException if the bytes are
    * not a JP2 container (bad signature / truncated / no ihdr). Every index
    * is bounds-checked against the DATA, never a box's claimed length, so
    * a truncated or lying container always gets the contract's
    * IllegalArgumentException rather than an array crash; the XLBox
    * extended-length form (length field 1 → u64 follows, ISO 15444-1 §I.4)
    * and >2 GiB claimed lengths are handled without 32-bit truncation. */
  def header(bytes: Array[Byte]): Jp2Header = {
    if (bytes.length < 12 || !bytes.take(12).sameElements(Signature))
      throw new IllegalArgumentException(
        "not a JPEG2000 (.jp2) container: missing the 12-byte JP2 signature box")
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"corrupt JP2 container: $msg")
    // walk [length][4-char type][payload] boxes in bytes[start, end) until
    // `want` is found; length 0 = box runs to the end of the data, length
    // 1 = 64-bit extended length follows the type. Returns the payload
    // bounds, both proven to lie inside the data.
    def findBox(start: Int, end: Int, want: String, where: String): (Int, Int) = {
      var off = start
      while (off + 8 <= end) {
        val t = boxType(bytes, off + 4)
        val len0 = u32(bytes, off)
        val (hdrLen, len) =
          if (len0 == 1) {
            if (off + 16 > end) fail(s"truncated XLBox header of '$t' box")
            (16L, u64(bytes, off + 8))
          } else (8L, len0)
        if (len != 0 && len < hdrLen)
          fail(s"box '$t' with impossible length $len")
        // compare len against the REMAINING bytes, never `off + len`: a
        // crafted near-Long.MaxValue XLBox length would wrap `off + len`
        // negative, dodge a boxEnd>end check, and walk the loop backwards
        // forever (round-4 review finding)
        if (len > end - off)
          fail(s"truncated '$t' box: claims ${len} bytes, " +
            s"only ${end - off} remain")
        val boxEnd = if (len == 0) end else (off + len).toInt
        if (t == want) return ((off + hdrLen).toInt, boxEnd)
        off = boxEnd // len ≥ hdrLen ≥ 8 ⇒ strictly forward
      }
      fail(s"no $want box in $where")
    }
    // ISO 15444-1 §I.5.2: the File Type box shall IMMEDIATELY follow the
    // signature box, and 'jp2 ' must be the major brand or listed in the
    // compatibility list — without it the file is not a conforming JP2
    // container and the "valid JPEG2000 image" verdict would be a lie.
    val (ftyp, ftypEnd) = findBox(12, bytes.length, "ftyp",
      "the container (ftyp = File Type box, required directly after the signature)")
    if (ftyp != 20) fail(
      "the File Type (ftyp) box does not immediately follow the signature box")
    if (ftypEnd - ftyp < 8) fail(
      s"ftyp payload is ${ftypEnd - ftyp} bytes, spec requires at least 8")
    val brands = boxType(bytes, ftyp) +:
      (ftyp + 8).until(ftypEnd - 3, 4).map(boxType(bytes, _))
    if (!brands.contains("jp2 ")) fail(
      s"ftyp brand(s) ${brands.map(b => s"'$b'").mkString(", ")} do not " +
        "include 'jp2 ' — not a conforming JP2 file")
    val (jp2h, jp2hEnd) = findBox(ftypEnd, bytes.length, "jp2h",
      "the container (jp2h = JP2 Header superbox)")
    val (ih, ihEnd) = findBox(jp2h, jp2hEnd, "ihdr",
      "the jp2h superbox (ihdr = Image Header box)")
    if (ihEnd - ih < 14) fail(
      s"ihdr payload is ${ihEnd - ih} bytes, spec requires 14")
    Jp2Header(
      height = u32(bytes, ih).toInt,
      width = u32(bytes, ih + 4).toInt,
      nc = ((bytes(ih + 8) & 0xff) << 8) | (bytes(ih + 9) & 0xff),
      bpc = (bytes(ih + 10) & 0x7f) + 1)
  }

}
