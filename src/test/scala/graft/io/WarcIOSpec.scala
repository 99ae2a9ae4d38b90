package graft.io

import graft.sql.SparkTestBase

/** WARC codec contracts: round-trip identity on both framings, Common
  * Crawl per-record gzip members, offset coordinates, and loud failure on
  * the malformed inputs a crawl pipeline actually meets (truncation,
  * missing length, wrong version). */
class WarcIOSpec extends SparkTestBase {

  private def rec(i: Int, payload: Array[Byte]) =
    ("response", s"<urn:test:$i>", s"https://example.org/p/$i",
      "2024-03-01T12:00:00Z", "application/http; msgtype=response", payload)

  private def tmpFile(suffix: String): java.io.File = {
    val f = java.io.File.createTempFile("warcspec", suffix)
    f.deleteOnExit(); f
  }

  test("gz round-trip: every field and payload byte survives") {
    val payloads = (0 until 5).map { i =>
      Array.tabulate[Byte](100 + 37 * i)(j => ((i * 131 + j * 7) % 251).toByte)
    }
    val f = tmpFile(".warc.gz")
    WarcIO.writeLocal(payloads.zipWithIndex.map { case (p, i) => rec(i, p) }.iterator, f)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // Common Crawl framing: N gzip member headers in the file
    val members = bytes.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(members >= 5, s"expected one gzip member per record, saw $members headers")

    val out = WarcIO.parseAll(f.getName, bytes).toVector
    assert(out.size == 5)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.warc_type == "response" && r.record_id == s"<urn:test:$i>")
      assert(r.target_uri == s"https://example.org/p/$i")
      assert(r.warc_date == "2024-03-01T12:00:00Z")
      assert(r.content_length == payloads(i).length.toLong)
      assert(java.util.Arrays.equals(r.payload, payloads(i)), s"payload $i differs")
    }
    // offsets strictly increase and start at 0 in the uncompressed stream
    assert(out.head.record_offset == 0L)
    assert(out.map(_.record_offset) == out.map(_.record_offset).sorted)
    assert(out.map(_.record_offset).distinct.size == 5)
  }

  test("plain .warc framing parses identically") {
    val payload = "hello warc body".getBytes("UTF-8")
    val f = tmpFile(".warc")
    WarcIO.writeLocal(Iterator(rec(0, payload)), f, gzipPerRecord = false)
    val out = WarcIO.parseAll(f.getName, java.nio.file.Files.readAllBytes(f.toPath)).toVector
    assert(out.size == 1 && new String(out.head.payload, "UTF-8") == "hello warc body")
  }

  test("empty payload record is legal (Content-Length: 0)") {
    val f = tmpFile(".warc.gz")
    WarcIO.writeLocal(Iterator(rec(0, Array.emptyByteArray)), f)
    val out = WarcIO.parseAll(f.getName, java.nio.file.Files.readAllBytes(f.toPath)).toVector
    assert(out.size == 1 && out.head.content_length == 0L && out.head.payload.isEmpty)
  }

  test("truncated payload fails loudly with file+offset coordinates") {
    val full = WarcIO.recordBytes("response", "<urn:t:0>", "u", "d", "ct",
      Array.fill[Byte](64)(7))
    val cut = full.dropRight(30)
    val e = intercept[IllegalArgumentException] {
      WarcIO.parseAll("cut.warc", cut).toVector
    }
    assert(e.getMessage.contains("cut.warc") && e.getMessage.contains("truncated"))
  }

  test("missing Content-Length and wrong version line are rejected") {
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("ISO-8859-1")
    val e1 = intercept[IllegalArgumentException] {
      WarcIO.parseAll("nolen.warc", noLen).toVector
    }
    assert(e1.getMessage.contains("Content-Length"))
    val badVer = ("WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n").getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] {
      WarcIO.parseAll("badver.warc", badVer).toVector
    }
    assert(e2.getMessage.contains("version"))
  }

  test("non-ASCII target URIs round-trip as UTF-8 (ISO 28500 header encoding)") {
    val uris = Seq("https://example.org/café", "https://example.org/页面/λ",
      "https://example.org/emoji/éß")
    val f = tmpFile(".warc.gz")
    WarcIO.writeLocal(uris.zipWithIndex.map { case (u, i) =>
      ("response", s"<urn:t:$i>", u, "2024-03-01T12:00:00Z", "ct",
        s"p$i".getBytes("UTF-8"))
    }.iterator, f)
    val out = WarcIO.parseAll(f.getName, java.nio.file.Files.readAllBytes(f.toPath))
      .toVector
    assert(out.map(_.target_uri) == uris,
      "two distinct non-Latin URIs must stay distinct after a round-trip")
  }

  test("seeded fuzz: adversarial payloads never confuse the framing") {
    // payloads embedding CRLFs, fake version lines, fake headers, gzip
    // magic, and every byte value — the parser is length-delimited, so
    // record boundaries must come ONLY from Content-Length
    val rnd = new scala.util.Random(20260818)
    val adversarial = Vector(
      "\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 999\r\n\r\n".getBytes("ISO-8859-1"),
      Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0),
      Array.tabulate[Byte](256)(_.toByte),
      Array.emptyByteArray,
      "Content-Length: 0\r\n\r\n\r\n\r\n".getBytes("ISO-8859-1"))
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(6)
      val payloads = (0 until n).map { _ =>
        if (rnd.nextBoolean()) adversarial(rnd.nextInt(adversarial.size))
        else Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt(256).toByte)
      }
      val gz = rnd.nextBoolean()
      val f = tmpFile(if (gz) ".warc.gz" else ".warc")
      WarcIO.writeLocal(payloads.zipWithIndex.map { case (p, i) => rec(i, p) }.iterator,
        f, gzipPerRecord = gz)
      val out = WarcIO.parseAll(s"fuzz$trial", java.nio.file.Files.readAllBytes(f.toPath)).toVector
      assert(out.size == n, s"trial $trial: got ${out.size} of $n records")
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.record_id == s"<urn:test:$i>", s"trial $trial record $i order")
        assert(java.util.Arrays.equals(r.payload, payloads(i)),
          s"trial $trial record $i payload")
      }
      f.delete()
    }
  }

  test("record_offset is a replayable coordinate in the uncompressed stream") {
    val payloads = (0 until 6).map(i => s"replay body $i ${"x" * i}".getBytes("UTF-8"))
    for (gz <- Seq(false, true)) {
      val f = tmpFile(if (gz) ".warc.gz" else ".warc")
      WarcIO.writeLocal(payloads.zipWithIndex.map { case (p, i) => rec(i, p) }.iterator,
        f, gzipPerRecord = gz)
      val raw = java.nio.file.Files.readAllBytes(f.toPath)
      // the offsets address the UNCOMPRESSED stream: decompress first
      val bytes = if (!gz) raw else {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw), 1 << 16)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      }
      val recs = WarcIO.parseAll(f.getName, raw).toVector
      recs.foreach { r =>
        // seeking to the stored offset and parsing yields exactly this
        // record — the lineage-replay contract of the coordinate
        val replay = WarcIO.parseAll("replay", bytes.drop(r.record_offset.toInt)).next()
        assert(replay.record_id == r.record_id, s"gz=$gz id at ${r.record_offset}")
        assert(java.util.Arrays.equals(replay.payload, r.payload),
          s"gz=$gz payload at ${r.record_offset}")
      }
      f.delete()
    }
  }

  test("parseStream is O(record): early records stream out of a prefix whose tail does not exist yet") {
    // A stream that serves only the first two records' bytes and THROWS on
    // any read past them — a parser that materialized (or read ahead more
    // than its 64 KiB buffer of) the archive would explode before yielding
    // record 0. Payloads are ~50 KB each so the two-record prefix already
    // exceeds the parser's buffer.
    val recs = (0 until 4).map(i => WarcIO.recordBytes("response",
      s"<urn:t:$i>", s"u$i", "d", "ct",
      Array.tabulate[Byte](50000)(j => ((i * 31 + j) % 251).toByte)))
    val landed = recs.take(2).flatten.toArray
    val in = new java.io.InputStream {
      private var pos = 0
      private def guard(): Unit =
        if (pos >= landed.length)
          throw new java.io.IOException("read past the landed prefix")
      def read(): Int = { guard(); val b = landed(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        guard()
        val n = math.min(len, landed.length - pos)
        System.arraycopy(landed, pos, b, off, n); pos += n; n
      }
    }
    val it = WarcIO.parseStream("lazy.warc", in)
    val r0 = it.next(); val r1 = it.next()
    assert(r0.record_id == "<urn:t:0>" && r1.record_id == "<urn:t:1>")
    assert(r1.payload.length == 50000)
    assert(java.util.Arrays.equals(r0.payload,
      Array.tabulate[Byte](50000)(j => (j % 251).toByte)))
  }

  test("spark read parses an archive far larger than the parse buffer (records, not the archive, bound memory)") {
    val dir = java.nio.file.Files.createTempDirectory("warcbig").toFile
    val n = 24 // 24 × ~100 KB ≈ 2.4 MB uncompressed — 37× the 64 KiB buffer
    WarcIO.writeLocal((0 until n).map(i =>
      rec(i, Array.tabulate[Byte](100000)(j => ((i + j * 13) % 251).toByte))).iterator,
      new java.io.File(dir, "big.warc.gz"))
    val got = WarcIO.read(spark, dir.getAbsolutePath, "*.warc.gz")
      .selectExpr("record_id", "content_length", "md5(payload) as m")
      .collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 100000L))
    // the batch reader never routes through binaryFile, so its Int.MaxValue
    // whole-file cap and O(archive) row materialization cannot apply
    val plan = WarcIO.read(spark, dir.getAbsolutePath, "*.warc.gz")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("binaryFile"), s"expected a stream-parse scan:\n$plan")
  }

  test("spark read: file-per-task ingest, no shuffle before the output") {
    val dir = java.nio.file.Files.createTempDirectory("warcspark").toFile
    (0 until 3).foreach { fi =>
      WarcIO.writeLocal((0 until 4).map(i =>
        rec(fi * 10 + i, s"file $fi rec $i".getBytes("UTF-8"))).iterator,
        new java.io.File(dir, f"part-$fi%05d.warc.gz"))
    }
    val df = WarcIO.read(spark, dir.getAbsolutePath, "*.warc.gz")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ingest must be shuffle-free:\n$plan")
    val rows = df.collect()
    assert(rows.length == 12)
    val uris = rows.map(_.getAs[String]("target_uri")).toSet
    assert(uris == (0 until 3).flatMap(fi => (0 until 4).map(i =>
      s"https://example.org/p/${fi * 10 + i}")).toSet)
  }

  test("directory reads skip hidden (dot/underscore) names: an in-flight dotted archive is never opened") {
    val dir = java.nio.file.Files.createTempDirectory("warchidden").toFile
    WarcIO.writeLocal(Iterator(rec(1, "landed".getBytes("UTF-8"))),
      new java.io.File(dir, "a.warc.gz"))
    // a producer mid-copy under the atomic-landing convention: dotted name,
    // TRUNCATED content — globStatus's `*` would match it, a FileIndex
    // would not; opening it would fail the whole ingest loudly
    val full = new java.io.File(dir, "tmpsrc.bin")
    WarcIO.writeLocal(Iterator(rec(2, "inflight".getBytes("UTF-8"))), full)
    val bytes = java.nio.file.Files.readAllBytes(full.toPath)
    java.nio.file.Files.write(new java.io.File(dir, ".b.warc.gz").toPath,
      bytes.take(bytes.length / 2))
    java.nio.file.Files.write(new java.io.File(dir, "_c.warc.gz").toPath,
      bytes.take(3))
    assert(full.delete())
    val rows = WarcIO.read(spark, dir.getAbsolutePath).collect()
    assert(rows.map(_.getAs[String]("target_uri")).toSeq ===
      Seq("https://example.org/p/1"))
    // naming a hidden file EXPLICITLY still honors the caller; the torn
    // content then fails with coordinates, proving it was actually opened
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.read(spark,
        new java.io.File(dir, ".b.warc.gz").getAbsolutePath).collect()
    }
    assert(e.getMessage.contains(".b.warc.gz"))
  }
}
