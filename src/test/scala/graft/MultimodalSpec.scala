package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column operators: sniffing, hashing, stub decode,
  * sample assembly. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withMagic(magic: Array[Byte], payload: String): Array[Byte] =
    magic ++ payload.getBytes("UTF-8")

  test("modality sniffs magic bytes; RIFF containers disambiguate by form tag") {
    // RIFF layout: 'RIFF' + 4-byte size + 4-byte form tag + payload
    def riff(form: String): Array[Byte] =
      Multimodal.RiffMagic ++ Array[Byte](0, 0, 0, 0) ++
        form.getBytes("US-ASCII") ++ "payload".getBytes("US-ASCII")
    val rows = Seq(
      (1L, withMagic(Multimodal.JpegMagic, "jpegdata")),
      (2L, withMagic(Multimodal.PngMagic, "pngdata")),
      (3L, riff("WAVE")),
      (4L, "plain text".getBytes("UTF-8")),
      (5L, Array[Byte](0x00, 0x01)), // shorter than 4 bytes of magic match
      (6L, riff("WEBP")),            // WebP image rides the RIFF container
      (7L, riff("AVI ")),
      (8L, withMagic(Multimodal.RiffMagic, "xx"))) // truncated: no form tag
      .toDF("doc_id", "media")
    val got = rows.select($"doc_id", Multimodal.modality($"media").as("m"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "image/jpeg", 2L -> "image/png", 3L -> "audio/wav",
      4L -> "application/octet-stream", 5L -> "application/octet-stream",
      6L -> "image/webp", 7L -> "video/avi", 8L -> "application/riff"))
  }

  test("mediaMeta: byte count, stable hash, modality in one struct") {
    val rows = Seq((1L, withMagic(Multimodal.JpegMagic, "x"))).toDF("doc_id", "media")
    val got = rows.select(Multimodal.mediaMeta($"media").as("meta"))
      .select($"meta.n_bytes", $"meta.content_md5", $"meta.modality")
      .as[(Long, String, String)].head()
    assert(got._1 == 5L) // 4 magic bytes + 1 payload byte
    assert(got._2.matches("[0-9a-f]{32}"))
    assert(got._3 == "image/jpeg")
    // hash is deterministic and content-sensitive
    val h2 = rows.select(Multimodal.contentHash($"media")).as[String].head()
    assert(h2 == got._2)
    val other = Seq((1L, withMagic(Multimodal.JpegMagic, "y"))).toDF("doc_id", "media")
      .select(Multimodal.contentHash($"media")).as[String].head()
    assert(other != got._2)
  }

  test("pngDims/jpegDims parse real header dimensions; corrupt payloads yield null, never throw") {
    // well-formed headers round-trip the planted dimensions
    val built = Seq((640L, 480L), (1L, 1L), (1920L, 1080L)).toDF("w", "h")
      .select($"w", $"h",
        concat(Multimodal.pngHeader($"w", $"h"), lit("tail".getBytes("UTF-8"))).as("png"),
        concat(Multimodal.jpegHeader($"w", $"h"), lit("tail".getBytes("UTF-8"))).as("jpg"))
    val got = built.select(
      $"w", $"h",
      Multimodal.pngDims($"png").as("pd"), Multimodal.jpegDims($"jpg").as("jd"))
      .select($"w", $"h", $"pd.width", $"pd.height", $"jd.width", $"jd.height")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (w, h, pw, ph, jw, jh) =>
      assert((pw, ph) == ((w, h)) && (jw, jh) == ((w, h)))
    }
    // a JPEG whose SOF0 hides behind a COM segment still parses (the
    // walker skips unknown segments by their length fields): SOI + 6-byte
    // COM + the canonical header's SOF0 slice (bytes 21+, after SOI+APP0)
    val withCom = Seq(1).toDF("x")
      .select(Multimodal.jpegDims(concat(
        lit(Array(0xFF, 0xD8, 0xFF, 0xFE, 0x00, 0x04, 0x41, 0x42).map(_.toByte)),
        substring(Multimodal.jpegHeader(lit(320L), lit(200L)), 21, 999))).as("d"))
      .select($"d.width", $"d.height").as[(Long, Long)].head()
    assert(withCom == ((320L, 200L)))
    // corrupt / non-image payloads: null dims, no exception
    val bad = Seq(
      Multimodal.JpegMagic ++ "garbage after magic".getBytes("UTF-8"), // desynced walk
      Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x00, 0x00, 0x00, 0x00).map(_.toByte), // SOS first
      Multimodal.PngMagic ++ "short".getBytes("UTF-8"), // truncated PNG, no IHDR
      Multimodal.RiffMagic ++ "wav".getBytes("UTF-8"),
      "plain".getBytes("UTF-8"),
      Array.empty[Byte])
    val nulls = bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("i", "b")
      .select(Multimodal.imageDims($"b").as("d")).collect()
    assert(nulls.forall(_.isNullAt(0)), "corrupt payload produced non-null dims")
  }

  test("wavMeta parses canonical PCM headers; non-WAV payloads yield null") {
    val built = Seq((1L, 44100L, 16L, 88200L), (2L, 8000L, 8L, 4000L))
      .toDF("c", "r", "bits", "db")
      .select($"c", $"r", $"bits", $"db",
        concat(Multimodal.wavHeader($"c", $"r", $"bits", $"db"),
          lit("pcm".getBytes("UTF-8"))).as("wav"))
    val got = built.select($"c", $"r", $"bits", $"db", Multimodal.wavMeta($"wav").as("m"))
      .select($"c", $"r", $"bits", $"db",
        $"m.n_channels", $"m.sample_rate", $"m.bits_per_sample", $"m.data_bytes", $"m.duration_ms")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (c, r, bits, db, pc, pr, pb, pdb, dur) =>
      assert((pc, pr, pb, pdb) == ((c, r, bits, db)))
      assert(dur == db * 1000L / (r * c * bits / 8)) // 88200/(44100*1*2)=1000ms; 4000/8000=500ms
    }
    // not WAV: RIFF magic alone (no WAVEfmt), or a PNG → null, no throw
    val bad = Seq(
      Multimodal.RiffMagic ++ "AVI LIST".getBytes("UTF-8") ++ Array.fill[Byte](40)(0),
      "plain".getBytes("UTF-8"))
    assert(bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("i", "b")
      .select(Multimodal.wavMeta($"b").as("m")).collect().forall(_.isNullAt(0)))
  }

  test("mediaInventory groups a mixed corpus by (source, sniffed modality) with byte mass") {
    val rows = Seq(
      ("a", withMagic(Multimodal.JpegMagic, "12345")),   // 9 B jpeg
      ("a", withMagic(Multimodal.JpegMagic, "1")),       // 5 B jpeg
      ("a", withMagic(Multimodal.PngMagic, "")),         // 4 B png
      ("b", "plain".getBytes("UTF-8"))                   // 5 B octet-stream
    ).toDF("source", "media")
    val got = Multimodal.mediaInventory(rows)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "image/jpeg") -> ((2L, 14L)),
      ("a", "image/png") -> ((1L, 4L)),
      ("b", "application/octet-stream") -> ((1L, 5L))))
  }

  test("mp4Header: byte layout matches hand-computed ISO-BMFF hex (the anti-compensating-bug pin)") {
    // every offset computed by hand from the spec: ftyp(16) 'isom',
    // moov(116) > mvhd(108) v0, timescale 600 = 0x258, duration 1200 =
    // 0x4B0, rate 1.0, volume 1.0, unity matrix, next_track_ID 1
    val expected =
      "000000106674797069736F6D00000200" +                    // ftyp
        "000000746D6F6F76" +                                  // moov
        "0000006C6D76686400000000" +                          // mvhd v0+flags
        "0000000000000000" +                                  // ctime, mtime
        "00000258" + "000004B0" +                             // timescale, duration
        "000100000100" + "00" * 10 +                          // rate, volume, reserved
        "000100000000000000000000000000000001000000000000000000000000000040000000" +
        "00" * 24 + "00000001"                                // pre_defined, next_track_ID
    val got = Seq(1).toDF("i")
      .select(hex(Multimodal.mp4Header(lit(600L), lit(1200L))).as("h"))
      .as[String].head()
    assert(got == expected)
  }

  test("mp4Meta decodes v0 and v1 mvhd, hops non-moov boxes, nulls on corrupt payloads") {
    def mvhdTail = "000100000100" + "00" * 10 +
      "000100000000000000000000000000000001000000000000000000000000000040000000" +
      "00" * 24 + "00000001"
    val ftyp = "000000106674797069736F6D00000200"
    // v1: 64-bit ctime/mtime/duration → mvhd 120 (0x78), moov 128 (0x80)
    val v1 = ftyp + "000000806D6F6F76" + "000000786D76686401000000" +
      "00" * 16 + "00000258" + "00000000000004B0" + mvhdTail
    // a 'free' box (16 bytes) between ftyp and moov — the walker must hop
    val hop = ftyp + "0000001066726565" + "00" * 8 +
      "000000746D6F6F76" + "0000006C6D76686400000000" + "00" * 8 +
      "00000258" + "000004B0" + mvhdTail
    val rows = Seq(
      (1L, v1), (2L, hop),
      (3L, ftyp),                              // ftyp alone: no moov → null
      (4L, "00000010667265650000000000000000"), // no ftyp → null
      (5L, ftyp.take(20))                       // truncated → null
    ).toDF("doc_id", "hx")
      .select($"doc_id", unhex($"hx").as("b"))
    val got = rows
      .select($"doc_id", Multimodal.mp4Meta($"b").as("m"))
      .select($"doc_id", $"m.version", $"m.timescale", $"m.duration", $"m.duration_ms")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(1L), Some(600L), Some(1200L), Some(2000L))))
    assert(got(2L) == ((Some(0L), Some(600L), Some(1200L), Some(2000L))))
    assert(got(3L) == ((None, None, None, None)))
    assert(got(4L) == ((None, None, None, None)))
    assert(got(5L) == ((None, None, None, None)))
    // a payload appended after the header changes nothing
    val withTail = Seq((1L, v1 + "DEADBEEF" * 16)).toDF("doc_id", "hx")
      .select(Multimodal.mp4Meta(unhex($"hx")).as("m")).select($"m.duration_ms")
      .as[Option[Long]].head()
    assert(withTail.contains(2000L))
    // modality sniffs the box-type magic at bytes 5-8
    val mod = Seq((1L, v1)).toDF("doc_id", "hx")
      .select(Multimodal.modality(unhex($"hx"))).as[String].head()
    assert(mod == "video/mp4")
  }

  test("decodeImageStub is deterministic with plausible bounds (codec plug-in point)") {
    val rows = Seq((1L, "payload-a".getBytes("UTF-8")), (2L, "payload-b".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val got = rows.select(Multimodal.decodeImageStub($"media").as("d"))
      .select($"d.width", $"d.height", $"d.channels").as[(Int, Int, Int)].collect()
    assert(got.forall { case (w, h, c) => w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && c == 3 })
    val again = rows.select(Multimodal.decodeImageStub($"media").as("d"))
      .select($"d.width", $"d.height", $"d.channels").as[(Int, Int, Int)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("framePositionsMs samples every interval within the duration; zero-length media yields no frames") {
    val got = Seq(10_000L, 0L).toDF("duration")
      .select(Multimodal.framePositionsMs($"duration", 3_000L).as("f"))
      .as[Seq[Long]].collect()
    assert(got(0) == Seq(0L, 3000L, 6000L, 9000L))
    assert(got(1) == Seq.empty)
  }

  test("decodePartitions: the DEFAULT codec really decodes PNG/JPEG/WAV; junk drops; the stub is opt-in only") {
    // real payloads of each dispatched modality, built by the repo's own
    // byte-pinned fixture encoders (which ImageIO/hand-hex tests pin)
    val grayPx = Array.tabulate(72)(i => ((i * 37 + 11) & 0xff).toByte)
    val png = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = -1, stored = false))
      .as[Array[Byte]].head()
    val rgba = Array.tabulate(72 * 4)(i => ((i * 2654435761L >> 5) & 0xff).toByte)
    val pngColor = Seq(Tuple1(rgba)).toDF("px")
      .select(Multimodal.pngEncodeRgb($"px", lit(9), filterMode = -1, stored = false,
        alpha = true)).as[Array[Byte]].head()
    val jpegPx = Array.tabulate(96 * 16)(i => if (((i / 8 + i / (96 * 8)) % 2) == 0) 30.toByte else 220.toByte)
    val jpeg = Seq(Tuple1(jpegPx)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(96))).as[Array[Byte]].head()
    val wav = wavOf(Array.tabulate(720)(i => (i * 41 % 2000 - 1000).toShort), 1, 8000)
    // MJPEG clips (first frame = the real 96×16 JPEG above): the video
    // entry of the codec boundary, both containers — and a RIFF-WEBP
    // that must NOT reach the WAV core (form-tag dispatch) but drop
    val aviClip = encAvi(Seq(jpeg, jpeg), 96, 16)
    val mp4Clip = encMp4(Seq(jpeg, jpeg), 96, 16)
    val webp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++
      (Array[Byte](10, 0, 0, 0, 1) ++ new Array[Byte](9)) // inter frame
    val webpLossless = Seq(Tuple1(grayPx.flatMap(v => Array(v, v, v)))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(9))).as[Array[Byte]].head()
    val rows = Seq(
      (1L, png), (2L, pngColor), (3L, jpeg), (4L, wav),
      (5L, "not any media format".getBytes("UTF-8")), // → dropped
      (6L, Array.empty[Byte]),                        // → dropped
      (7L, aviClip), (8L, mp4Clip),                   // → first-frame luma
      (9L, webp),                                     // inter-frame VP8 → dropped, never WAV-walked
      (10L, webpLossless))                            // VP8L → real luma decode
      .toDF("doc_id", "media").repartition(2)
    val got = Multimodal.decodePartitions(rows)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "width", "height", "channels", "feature"))
    val decoded = got.orderBy($"doc_id")
      .select($"doc_id", $"width", $"height", $"channels").as[(Long, Int, Int, Int)].collect()
    // TRUE dimensions from the real decoders, not hash-derived fakes
    assert(decoded.toSeq == Seq((1L, 9, 8, 1), (2L, 9, 8, 1), (3L, 96, 16, 1), (4L, 72, 1, 1),
      (7L, 96, 16, 1), (8L, 96, 16, 1), (10L, 9, 8, 1)),
      decoded.mkString(", "))
    // the clips' features equal the plain JPEG row's (same first frame)
    val jpegFeat = got.filter($"doc_id" === 3L).select($"feature").as[Seq[Float]].head()
    Seq(7L, 8L).foreach { id =>
      val f = got.filter($"doc_id" === id).select($"feature").as[Seq[Float]].head()
      assert(f == jpegFeat, s"clip $id feature diverged from its frame's")
    }
    // features are real normalized luma/energy histograms: 8 bins summing to 1
    val feats = got.select($"feature").as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 8 && math.abs(f.sum - 1f) < 1e-4 &&
      f.forall(v => v >= 0f && v <= 1f)))
    // the PNG row's histogram equals the analytic bin counts of the luma
    val lumaHist = new Array[Int](8)
    grayPx.foreach(b => lumaHist((b & 0xff) >> 5) += 1)
    val pngFeat = got.filter($"doc_id" === 1L).select($"feature").as[Seq[Float]].head()
    assert((0 until 8).forall(k => math.abs(pngFeat(k) - lumaHist(k) / 72f) < 1e-6))
    // custom codec (including the stub, now opt-in) plugs in without
    // changing the pipeline
    val custom = Multimodal.decodePartitions(rows,
      b => if (b.length > 15) Some((640, 480, 1, Array(1f))) else None)
    assert(custom.select($"width").as[Int].collect().toSet == Set(640))
    val viaStub = Multimodal.decodePartitions(
      Seq((7L, "webp-ish payload".getBytes("UTF-8"))).toDF("doc_id", "media"),
      Multimodal.fakeCodec)
    assert(viaStub.count() == 1 && viaStub.select($"channels").as[Int].head() == 3)
  }

  test("decodeDropReport: planted corrupt classes land in their reasons with exact counters; decodable payloads contribute nothing") {
    val grayPx = Array.tabulate(72)(i => ((i * 37 + 11) & 0xff).toByte)
    val png = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = 0, stored = true))
      .as[Array[Byte]].head()
    val wav = wavOf(Array.tabulate(144)(i => (i * 100).toShort), 1, 8000)
    // decodable clips carry REAL JPEG frames — the classifier holds video
    // to the same first-frame-decodes bar as realCodec and the near-dup
    // tier; a clip whose frames extract but are not JPEGs is corrupt
    val frame = Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9))).as[Array[Byte]].head()
    val avi = encAvi(Seq(frame), 9, 8)
    val junkAvi = Seq(Tuple1(Seq(png))).toDF("f") // png bytes walk as frames, decode fails
      .select(Multimodal.aviMjpegEncode($"f", 9, 8)).as[Array[Byte]].head()
    // gray+alpha DECODES now — the unsupported plant is a spec-illegal
    // (type, depth) pair: gray+alpha at depth 4
    val grayAlphaPng = png.clone(); grayAlphaPng(24) = 4; grayAlphaPng(25) = 4
    val bombPng = png.clone()
    bombPng(16) = 0x07; bombPng(17) = 0xFF.toByte; bombPng(18) = 0xFF.toByte; bombPng(19) = 0xFF.toByte
    // a bare ftyp with NO moov is structural damage, not an unsupported
    // codec — the classifier now walks the real sample tables
    val mp4ish = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII") ++ new Array[Byte](12)
    val webp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++
      (Array[Byte](10, 0, 0, 0, 1) ++ new Array[Byte](9)) // inter frame
    val junk = "garbage payload bytes".getBytes("UTF-8")
    val truncAvi = avi.take(avi.length - 9)
    val mp4 = encMp4(Seq(frame), 9, 8)
    val mp4Avc = encMp4(Seq(png), 9, 8, format = "avc1") // never reaches frame decode
    val truncMp4 = mp4.take(40) // ftyp survives, moov (written last) gone
    val webpGood = Seq(Tuple1(grayPx.flatMap(v => Array(v, v, v)))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(9))).as[Array[Byte]].head()
    val truncWebp = webpGood.take(24) // VP8L chunk size overruns the payload
    // a structurally sound VP8L whose 14-bit header dims (16384×16384)
    // demand more than the shared bomb cap → bomb_guard, not corrupt —
    // the same distinction the PNG branch draws
    val bombWebp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](18, 0, 0, 0) ++
      "WEBPVP8L".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](0x2f, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x0f, 0x00)
    val rows = Seq(
      ("a", png), ("a", wav), ("a", avi), ("a", mp4), // all decodable → NO rows
      ("a", webpGood),                               // VP8L decodes → NO row
      ("a", junk), ("b", junk),                      // bad_magic, split by source
      ("a", grayAlphaPng), ("a", bombPng),
      ("a", png.take(40)),                           // header ok, decode fails → corrupt
      ("b", mp4ish), ("b", webp), ("b", truncAvi),
      ("b", mp4Avc), ("b", truncMp4), ("b", truncWebp),
      ("a", bombWebp),
      ("b", junkAvi))
      .toDF("source", "media")
    val got = Multimodal.decodeDropReport(rows)
      .as[(String, String, String, Long, Long)].collect().toSet
    val expected = Set(
      ("a", "application/octet-stream", "bad_magic", 1L, junk.length.toLong),
      ("b", "application/octet-stream", "bad_magic", 1L, junk.length.toLong),
      ("a", "image/png", "unsupported_profile", 1L, grayAlphaPng.length.toLong),
      ("a", "image/png", "bomb_guard", 1L, bombPng.length.toLong),
      ("a", "image/png", "corrupt", 1L, 40L),
      ("b", "video/mp4", "corrupt", 2L, mp4ish.length.toLong + 40L),
      ("b", "image/webp", "unsupported_profile", 1L, webp.length.toLong),
      ("b", "video/avi", "corrupt", 2L, truncAvi.length.toLong + junkAvi.length.toLong),
      ("b", "video/mp4", "unsupported_profile", 1L, mp4Avc.length.toLong),
      ("b", "image/webp", "corrupt", 1L, truncWebp.length.toLong),
      ("a", "image/webp", "bomb_guard", 1L, bombWebp.length.toLong))
    assert(got == expected, s"got $got")
  }

  test("GIF round-trip: decode(encode(px)) is the identity across interlace × localPalette, with multi-sub-block streams") {
    // 40×30 = 1200 px: the 9-bit LZW stream spans several 255-byte data
    // sub-blocks, so the reader's sub-block reassembly is in the path;
    // the gray palette makes luma601(i,i,i) = i, hence exact identity
    val px = Array.tabulate(40 * 30)(i => ((i * 131 + 17) & 0xff).toByte)
    for (interlace <- Seq(false, true); localPal <- Seq(false, true)) {
      val gif = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.gifEncodeGray8($"px", lit(40), interlace, localPal))
        .as[Array[Byte]].head()
      val got = Seq(Tuple1(gif)).toDF("g")
        .select(Multimodal.gifDecodeLuma($"g")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(got, px),
        s"round-trip failed at interlace=$interlace localPalette=$localPal")
      // dims through the declarative parser
      val dims = Seq(Tuple1(gif)).toDF("g")
        .select(Multimodal.gifDims($"g").getField("width"),
          Multimodal.gifDims($"g").getField("height")).as[(Long, Long)].head()
      assert(dims == ((40L, 30L)))
    }
  }

  test("GIF decode: LZW width growth, KwKwK, animation-first-frame, and corrupt streams match hand-built spec vectors") {
    def luma(hexStr: String): Array[Byte] =
      Seq(Tuple1(hexBytesT(hexStr))).toDF("g")
        .select(Multimodal.gifDecodeLuma($"g")).as[Array[Byte]].head()
    val gct4 = "0000000A0A0A1414141E1E1E" // palette: luma of entry i = 10·i
    // width growth: 5×1 raster of index 1, minCode 2 — the decoder's
    // dictionary hits next == 1<<3 after the third literal, so the last
    // two literals and EOI arrive at 4 bits (codes 4,1,1,1 @3b then
    // 1,1,5 @4b, hand-packed LSB-first = 4C 12 51)
    val growth = "47494638396105000100F10000" + gct4 +
      "2C000000000500010000" + "02" + "034C1251" + "00" + "3B"
    assert(luma(growth).toSeq == Seq.fill(5)(10.toByte))
    // KwKwK: codes 4,0,6,0 — code 6 names the entry being defined
    // (string(prev)+first(prev)); raster = 4 zeros (data 84 51)
    val kwkwk = "47494638396104000100F10000" + gct4 +
      "2C000000000400010000" + "02" + "028451" + "00" + "3B"
    assert(luma(kwkwk).toSeq == Seq.fill(4)(0.toByte))
    // animation: a comment extension, a GCE, frame 1 (the growth
    // stream), then a SECOND frame — decode returns frame 1 only
    val anim = "47494638396105000100F10000" + gct4 +
      "21FE03414243" + "00" + // comment "ABC"
      "21F9040100000000" + // GCE, transparent flag set on index 0
      "2C000000000500010000" + "02" + "034C1251" + "00" +
      "2C000000000400010000" + "02" + "028451" + "00" + "3B"
    assert(luma(anim).toSeq == Seq.fill(5)(10.toByte))
    def reason(hexStr: String): String = {
      val r = Seq(Tuple1(hexBytesT(hexStr))).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(reason(growth) == null && reason(anim) == null)
    // EOI before the raster completes → corrupt
    val earlyEoi = "47494638396104000100F10000" + gct4 +
      "2C000000000400010000" + "02" + "012C00" + "3B"
    assert(luma(earlyEoi) == null && reason(earlyEoi) == "corrupt")
    // LZW-valid literal 7 with a 4-entry palette → index out of table
    val badIndex = "47494638396101000100F10000" + gct4 +
      "2C000000000100010000" + "03" + "0178" + "00" + "3B"
    assert(luma(badIndex) == null && reason(badIndex) == "corrupt")
    // trailer before any image descriptor → corrupt, not truncated
    val noImage = "47494638396101000100F10000" + gct4 + "3B"
    assert(reason(noImage) == "corrupt")
    // cut inside the global color table → truncated
    assert(reason("47494638396104000100F10000" + "0000000A0A") == "truncated")
    // no color table anywhere → unsupported_profile
    assert(reason("474946383961040001007000002C00000000040001000002012C003B")
      == "unsupported_profile")
    // 65535×65535 frame dims → bomb_guard before any palette/LZW work
    assert(reason("474946383961FFFFFFFF7000002C00000000FFFFFFFF003B")
      == "bomb_guard")
    // STRUCTURAL census: the hand-built two-frame stream counts 2
    // frames with no loop extension (null), a truncated file nulls out
    def census(hexStr: String): (Option[Int], Option[Int]) = {
      val r = Seq(Tuple1(hexBytesT(hexStr))).toDF("g")
        .select(Multimodal.gifFrameCount($"g"), Multimodal.gifLoopCount($"g"))
        .collect().head
      (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))
    }
    assert(census(anim) == ((Some(2), None)))
    assert(census(growth) == ((Some(1), None)))
    assert(census(anim.dropRight(4)) == ((None, None))) // no trailer → incomplete
    assert(census(noImage) == ((None, None))) // zero frames
    // encoder-planted animation: 3 identical frames, NETSCAPE loop 7 —
    // census recovers both, the pixel tier still decodes frame 0
    val animGif = Seq(Tuple1(hexBytesT("00010203040506070809101112131415" * 9).take(72)))
      .toDF("px").select(Multimodal.gifEncodeGray8($"px", lit(9), frames = 3, loop = 7))
      .as[Array[Byte]].head()
    val row = Seq(Tuple1(animGif)).toDF("g")
      .select(Multimodal.gifFrameCount($"g"), Multimodal.gifLoopCount($"g"),
        Multimodal.gifDecodeLuma($"g")).collect().head
    assert(row.getInt(0) == 3 && row.getInt(1) == 7 && !row.isNullAt(2))
    // and the classifier counts an animated GIF decodable (frame-0 bar)
    val animReason = Seq(Tuple1(animGif)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).collect().head
    assert(animReason.isNullAt(0))
  }

  test("recognized-but-undecodable magics classify unsupported_profile under their real mime — never bad_magic") {
    val junk = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    val cases = Seq(
      ("4F676753", "audio/ogg"), ("1A45DFA3", "video/webm"))
    cases.foreach { case (magicHex, mime) =>
      val b = hexBytesT(magicHex) ++ junk
      val row = Seq(Tuple1(b)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b"),
          Multimodal.modality($"b")).collect().head
      assert(!row.isNullAt(0) && row.getString(0) == "unsupported_profile",
        s"$mime: got ${if (row.isNullAt(0)) "null" else row.getString(0)}")
      assert(row.getString(1) == mime, s"$magicHex sniffed as ${row.getString(1)}")
      assert(Multimodal.realCodec(b).isEmpty) // recognized ≠ decodable
    }
    // MP3 graduated in r16 (mono) and r17 (MS stereo + short blocks):
    // the audio/mpeg unsupported_profile representative is the surviving
    // typed refusal — an MS fixture with mode_ext flipped to intensity,
    // behind the ID3 envelope; ID3+junk is honestly truncated
    // (recognized tag, no frames)
    val mods = Array(5, 4, 4, 4, 2, 2) ++ Array.fill(10)(11)
    val spec = (for (g <- 0 until 4; j <- 0 until 16)
      yield ((g * 31 + 7 * j + 3) % mods(j)).toByte).toArray
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)
    val stereo = graft.functions.Mp3L3.encodeFixture(spec, 5).clone()
    stereo(3) = 0x50.toByte // mode 1, mode_ext 1 = intensity stereo
    val mp3Row = Seq(Tuple1(id3 ++ stereo)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b"),
        Multimodal.modality($"b")).collect().head
    assert(mp3Row.getString(0) == "unsupported_profile")
    assert(mp3Row.getString(1) == "audio/mpeg")
    val id3JunkRow = Seq(Tuple1(hexBytesT("494433") ++ junk)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b"),
        Multimodal.modality($"b")).collect().head
    assert(id3JunkRow.getString(0) == "truncated")
    assert(id3JunkRow.getString(1) == "audio/mpeg")
    // FLAC is no longer merely recognized — 16-bit streams decode for
    // real; a magic+junk prefix shorter than STREAMINFO is now honestly
    // `truncated` under audio/flac (the cut-PNG stance), and the
    // out-of-contract 24-bit profile classifies unsupported_profile
    val flacCut = hexBytesT("664C6143") ++ junk
    val flacRow = Seq(Tuple1(flacCut)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b"),
        Multimodal.modality($"b")).collect().head
    assert(flacRow.getString(0) == "truncated" && flacRow.getString(1) == "audio/flac")
    assert(Multimodal.realCodec(flacCut).isEmpty)
    // BMP is no longer merely recognized — BI_RGB, RLE and (since r14)
    // the 16-bit/BITFIELDS masks and embedded streams decode for real;
    // the out-of-contract pin is a BI_PNG label at a NONZERO biBitCount
    // (embedded streams require biBitCount 0 per spec) under image/bmp
    val bfBmp = hexBytesT("424D7604000000000000360400002800000004000000020000000100" +
      "1000050000000000000000000000000000000000000000000000")
    val bfRow = Seq(Tuple1(bfBmp)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b"),
        Multimodal.modality($"b")).collect().head
    assert(bfRow.getString(0) == "unsupported_profile" && bfRow.getString(1) == "image/bmp")
    assert(Multimodal.realCodec(bfBmp).isEmpty)
    // TIFF likewise decodes for real now — CCITT G4/MH bilevel decode
    // since r14, so the out-of-contract pin is the Compression entry
    // patched 1 → 2 on this DEPTH-8 file (CCITT is bilevel-only; an
    // 8-bit CCITT label is a profile this pipeline refuses) under
    // image/tiff
    val ccittTiff = Seq(Tuple1(Array.tabulate(9 * 8)(_.toByte))).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    ccittTiff(54) = 2
    val ccittRow = Seq(Tuple1(ccittTiff)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b"),
        Multimodal.modality($"b")).collect().head
    assert(ccittRow.getString(0) == "unsupported_profile" && ccittRow.getString(1) == "image/tiff")
    assert(Multimodal.realCodec(ccittTiff).isEmpty)
    // plain junk still lands in bad_magic — recognition must not leak
    val junkRow = Seq(Tuple1("garbage payload bytes".getBytes("UTF-8"))).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).collect().head
    assert(junkRow.getString(0) == "bad_magic")
    // a bare MPEG frame sync is NOT recognized (UTF-16LE text and 0xFF
    // padding begin the same way — only ID3v2-tagged MP3s sniff as
    // audio); both stay bad_magic junk
    Seq(hexBytesT("FFFB9000") ++ junk, hexBytesT("FFFE") ++ "Hello".getBytes("UTF-16LE"))
      .foreach { b =>
        val r = Seq(Tuple1(b)).toDF("b")
          .select(graft.functions.Native.decodeDropReason($"b"),
            Multimodal.modality($"b")).collect().head
        assert(r.getString(0) == "bad_magic" &&
          r.getString(1) == "application/octet-stream")
      }
    // sub-12-byte prefixes of recognized magics classify truncated, not
    // bad_magic — the same stance the image formats get
    Seq("4F67675331", "49443304", "664C6143", "1A45DFA3").foreach { h =>
      val r = Seq(Tuple1(hexBytesT(h))).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      assert(r.getString(0) == "truncated", s"$h: got ${r.getString(0)}")
    }
  }

  test("BMP round-trip: decode(encode(px)) is the identity, bottom-up and top-down, with padded rows") {
    // width 9: rowBytes pads 9 → 12, so the padding walk is in every path
    val px = Array.tabulate(9 * 8)(i => ((i * 131 + 17) & 0xff).toByte)
    for (topDown <- Seq(false, true)) {
      val bmp = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.bmpEncodeGray8($"px", lit(9), topDown))
        .as[Array[Byte]].head()
      val got = Seq(Tuple1(bmp)).toDF("b")
        .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(got, px), s"round-trip failed at topDown=$topDown")
      val dims = Seq(Tuple1(bmp)).toDF("b")
        .select(Multimodal.bmpDims($"b").getField("width"),
          Multimodal.bmpDims($"b").getField("height")).as[(Long, Long)].head()
      assert(dims == ((9L, 8L)), s"dims $dims at topDown=$topDown")
    }
  }

  test("BMP decode: 24-bit and 32-bit BGR(X) hand vectors, bottom-up row order, failure classes") {
    def luma(hexStr: String): Array[Byte] =
      Seq(Tuple1(hexBytesT(hexStr))).toDF("b")
        .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(hexStr: String): String = {
      val r = Seq(Tuple1(hexBytesT(hexStr))).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // 2×2 24-bit: file rows bottom-up, BGR order, 2 pad bytes per row —
    // luma601 of (R,G,B): top row (9,8,7)→8, (12,11,10)→11; bottom row
    // (3,2,1)→2, (6,5,4)→5
    val bmp24 = "424D4600000000000000360000002800000002000000020000000100" +
      "1800000000001000000000000000000000000000000000000000" +
      "010203040506" + "0000" + "0708090A0B0C" + "0000"
    assert(luma(bmp24).toSeq == Seq[Byte](8, 11, 2, 5))
    assert(reason(bmp24) == null)
    // 1×1 32-bit BGRX: (3,2,1)→2, the X byte ignored
    val bmp32 = "424D3A00000000000000360000002800000001000000010000000100" +
      "2000000000000400000000000000000000000000000000000000" + "010203FF"
    assert(luma(bmp32).toSeq == Seq[Byte](2))
    // pixel array cut short → truncated
    assert(reason(bmp24.dropRight(4)) == "truncated")
    // 65535×65535 header dims → bomb_guard
    val bombBmp = "424D46000000000000003600000028000000FFFF0000FFFF00000100" +
      "1800000000001000000000000000000000000000000000000000"
    assert(reason(bombBmp) == "bomb_guard")
    // planes ≠ 1 → corrupt
    val badPlanes = "424D4600000000000000360000002800000002000000020000000200" +
      "1800000000001000000000000000000000000000000000000000" +
      "010203040506" + "0000" + "0708090A0B0C" + "0000"
    assert(reason(badPlanes) == "corrupt" && luma(badPlanes) == null)
    // BITMAPCOREHEADER (size 12) DECODES now: a 2×2 24-bit core file,
    // pixels straight after the header (no palette), bottom-up BGR
    val core24 = hexBytesT("424D2A000000000000001A000000" + "0C000000" +
      "0200020001001800" +
      "102030" + "405060" + "0000" + // file row 0 (display row 1), padded
      "708090" + "A0B0C0" + "0000")
    val coreLuma = Seq(Tuple1(core24)).toDF("b")
      .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    // luma601 of (r,g,b) = (0x30,0x20,0x10), (0x60,0x50,0x40) on top row
    def l601(r: Int, g: Int, bb: Int) = ((299 * r + 587 * g + 114 * bb + 500) / 1000).toByte
    assert(coreLuma.toSeq == Seq(
      l601(0x90, 0x80, 0x70), l601(0xC0, 0xB0, 0xA0),
      l601(0x30, 0x20, 0x10), l601(0x60, 0x50, 0x40)))
    // 8-bit core: the palette is RGB TRIPLES (3 bytes, not quads) —
    // gray triples make decode the identity on the index bytes
    val palCore = {
      val o = new java.io.ByteArrayOutputStream()
      val hdr = hexBytesT("424D000000000000000" + "01A030000" + // off 794
        "0C000000" + "0300020001000800")
      o.write(hdr, 0, hdr.length)
      (0 until 256).foreach { i => o.write(i); o.write(i); o.write(i) }
      o.write(Array[Byte](1, 2, 3, 0, 4, 5, 6, 0), 0, 8) // 3×2, rowBytes 4
      o.toByteArray
    }
    val palLuma = Seq(Tuple1(palCore)).toDF("b")
      .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    assert(palLuma.toSeq == Seq[Byte](4, 5, 6, 1, 2, 3))
    // the OS/2 V2 truncated-header family DECODES since r15: a minimal
    // 16-byte header (i32 dims 2×2, 24bpp, no compression/clrUsed
    // fields) over 4 hand-planted BGR pixels
    val os2 = "424D2E00000000000000" + "1E000000" + "10000000" +
      "02000000" + "02000000" + "0100" + "1800" +
      // bottom row (y=1 in image order): BGR (255,0,0)=blue, (0,0,255)=red
      "FF0000" + "0000FF" + "0000" + // rowBytes 8: 2 pad bytes
      "00FF00" + "FFFFFF" + "0000"   // top row: green, white
    assert(reason(os2) == null)
    // luma601: blue 29, red 76, green 150, white 255; file rows are
    // bottom-up, so image row 0 = the SECOND coded row
    assert(Seq(Tuple1(hexBytesT(os2))).toDF("b")
      .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head().toSeq ==
      Seq[Byte](150.toByte, 255.toByte, 29, 76))
    // the OS/2-ONLY codings stay refused: a 64-byte V2 header whose
    // compression field carries 3 (OS/2 Huffman 1D — NOT the Windows
    // BITFIELDS meaning at this header size)
    val os2huff = "424D660000000000000052000000" + "40000000" +
      "02000000020000000100010003000000" + "00" * 48 + "00" * 20
    assert(reason(os2huff) == "unsupported_profile")
    // 13..15 fits no published header → corrupt
    val noHdr = "424D2E0000000000000022000000" + "0E000000" + "00" * 20
    assert(reason(noHdr) == "corrupt")
  }

  test("PNG depth matrix hand vectors: sub-byte packing, 16-bit high byte, gray+alpha luma") {
    // assemble real PNGs around HAND-PACKED scanlines: the packing and
    // reduction semantics are pinned by the hand bytes; only the entropy
    // layer rides java.util.zip (the TIFF-predictor vector stance)
    def mkPng(w: Int, h: Int, depth: Int, colorType: Int,
        raw: Array[Byte]): Array[Byte] = {
      val z = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](256)
      while (!d.finished()) z.write(buf, 0, d.deflate(buf))
      d.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte), 0, 8)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val len = data.length
        out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
        out.write((len >> 8) & 0xff); out.write(len & 0xff)
        val td = typ.getBytes("US-ASCII") ++ data
        out.write(td, 0, td.length)
        val c = new java.util.zip.CRC32()
        c.update(td)
        val cv = c.getValue
        out.write(((cv >> 24) & 0xff).toInt); out.write(((cv >> 16) & 0xff).toInt)
        out.write(((cv >> 8) & 0xff).toInt); out.write((cv & 0xff).toInt)
      }
      chunk("IHDR", Array[Byte](
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        depth.toByte, colorType.toByte, 0, 0, 0))
      chunk("IDAT", z.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    def luma(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.pngDecodeLuma($"b")).as[Array[Byte]].head()
    // 2-bit 5×1: pixels 3,0,2,1,3 pack MSB-first to 11 00 10 01 | 11…
    // = C9 C0; §12 scaling ·85
    val p2 = mkPng(5, 1, 2, 0, Array[Byte](0, 0xC9.toByte, 0xC0.toByte))
    assert(luma(p2).toSeq == Seq(255, 0, 170, 85, 255).map(_.toByte))
    // 1-bit 10×1: 1011 0010 | 11 → B2 C0, scaling ·255
    val p1 = mkPng(10, 1, 1, 0, Array[Byte](0, 0xB2.toByte, 0xC0.toByte))
    assert(luma(p1).toSeq ==
      Seq(255, 0, 255, 255, 0, 0, 255, 0, 255, 255).map(_.toByte))
    // 16-bit 2×1: samples 0x1234, 0xFF01 → the HIGH bytes 12, FF
    val p16 = mkPng(2, 1, 16, 0,
      Array[Byte](0, 0x12, 0x34, 0xFF.toByte, 0x01))
    assert(luma(p16).toSeq == Seq(0x12, 0xFF).map(_.toByte))
    // gray+alpha 2×1: (g 7, a 200), (g 250, a 0) — alpha ignored even
    // when fully transparent
    val pga = mkPng(2, 1, 8, 4,
      Array[Byte](0, 7, 200.toByte, 250.toByte, 0))
    assert(luma(pga).toSeq == Seq(7, 250).map(_.toByte))
    // spec-ILLEGAL pairs refuse: truecolor at depth 4, palette at 16
    def reason(b: Array[Byte]): String = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(reason(mkPng(2, 1, 4, 2, Array[Byte](0, 0, 0))) == "unsupported_profile")
    assert(reason(mkPng(2, 1, 16, 3, Array[Byte](0, 0, 0))) == "unsupported_profile")
    // and a legal exotic pair CLASSIFIES decodable
    assert(reason(p2) == null)
  }

  test("PNG depth matrix cross-decoder: ImageIO reads the deep builder; this decoder reads ImageIO's 16-bit and interlaced 1-bit") {
    import javax.imageio.ImageIO
    def luma(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.pngDecodeLuma($"b")).as[Array[Byte]].head()
    // builder → ImageIO at every depth (the emitted streams are valid
    // to a third-party reader, filters cycled)
    val vals = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    for ((depth, ga) <- Seq((1, false), (2, false), (4, false), (16, false),
      (8, true), (16, true))) {
      val px =
        if (depth < 8) vals.map(v => ((v & 0xff) % (1 << depth)).toByte)
        else vals
      val png = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.pngEncodeGrayDeep($"px", lit(9), depth,
          grayAlpha = ga, filterMode = -1)).as[Array[Byte]].head()
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected depth=$depth ga=$ga")
      val got = new Array[Int](72)
      img.getRaster.getSamples(0, 0, 9, 8, 0, got) // channel 0 = gray
      val want = px.map { v =>
        val u = v & 0xff
        if (depth < 8) u // ImageIO reports raw sub-byte sample values
        else if (depth == 16 && !ga) (u << 8) | (u ^ 0xA5)
        else if (depth == 16) (u << 8) | (u ^ 0xA5)
        else u
      }
      assert(got.sameElements(want), s"ImageIO misread depth=$depth ga=$ga")
    }
    // ImageIO 16-bit writer → this decoder keeps the high byte
    val img16 = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val s16 = Array.tabulate(72)(i => (i * 911 + 5) & 0xffff)
    img16.getRaster.setSamples(0, 0, 9, 8, 0, s16)
    val bos16 = new java.io.ByteArrayOutputStream()
    ImageIO.write(img16, "png", bos16)
    val mine16 = luma(bos16.toByteArray)
    assert(mine16 != null && mine16.length == 72)
    assert(mine16.toSeq == s16.map(v => (v >> 8).toByte).toSeq)
    // ImageIO interlaced 1-bit (TYPE_BYTE_BINARY + progressive mode) →
    // this decoder: sub-byte packing WITHIN Adam7 pass rows
    val bin = new java.awt.image.BufferedImage(13, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    (0 until 13).foreach(x => (0 until 7).foreach(y =>
      bin.setRGB(x, y, if ((x * 3 + y) % 4 == 0) 0xFFFFFF else 0)))
    val w = ImageIO.getImageWritersByFormatName("png").next()
    val pr = w.getDefaultWriteParam
    pr.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bosB = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bosB)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(bin, null, null), pr)
    ios.close(); w.dispose()
    val pngB = bosB.toByteArray
    assert(pngB(28) == 1, "ImageIO did not write an interlaced PNG")
    val mineB = luma(pngB)
    assert(mineB != null && mineB.length == 13 * 7)
    (0 until 13).foreach(x => (0 until 7).foreach { y =>
      val want = if ((x * 3 + y) % 4 == 0) 255 else 0
      assert((mineB(y * 13 + x) & 0xff) == want, s"interlaced 1-bit ($x,$y)")
    })
  }

  test("BMP RLE8 round-trip: encoded runs, absolute packets and odd-length pads decode to the identity") {
    // run-heavy pixels force REAL repeat packets; the inter-run noise
    // forces absolute packets including odd lengths (word-align pad)
    val px = Array.tabulate(9 * 8)(i =>
      (if ((i / 5) % 2 == 0) 0x40 else i & 0xff).toByte)
    val bmp = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.bmpEncodeGray8($"px", lit(9), rle = true))
      .as[Array[Byte]].head()
    val got = Seq(Tuple1(bmp)).toDF("b")
      .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(got, px))
    assert(bmp(30) == 1 && bmp(28) == 8, "compression/bpp fields")
    // ImageIO reads the encoder's RLE8 stream back to the same pixels —
    // the stream is spec-valid to a third-party reader
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO rejected the RLE8 stream")
    val back = new Array[Int](72)
    img.getRaster.getPixels(0, 0, 9, 8, back)
    assert(back.map(_.toByte).sameElements(px), "ImageIO misread the RLE8 stream")
  }

  test("BMP RLE8 delta/EOB, RLE4, and 1/4-bit uncompressed decode hand vectors") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    // --- RLE8 delta + early EOB on a 4×3 canvas: splice a hand stream
    // into the fixture's (oracle-pinned) header+palette, skipped pixels
    // land on palette index 0 ---
    val base = Seq(Tuple1(new Array[Byte](12))).toDF("px")
      .select(Multimodal.bmpEncodeGray8($"px", lit(4), rle = true))
      .as[Array[Byte]].head()
    val stream = hexBytesT("0241" + "00020101" + "0142" + "0001")
    val spliced = base.take(14 + 40 + 1024) ++ stream
    spliced(2) = ((14 + 40 + 1024 + stream.length) & 0xff).toByte // fileSize lo
    spliced(34) = stream.length.toByte // biSizeImage
    assert(luma(spliced).toSeq == Seq[Byte](0, 0, 0, 0,
      0, 0, 0, 0x42, 0x41, 0x41, 0, 0))
    // --- RLE4 (5×2, 16-gray palette i·17): an encoded alternating run,
    // a 3-pixel absolute packet, EOL/EOB escapes ---
    val pal16 = (0 until 16).map(i => f"${i * 17}%02X" * 3 + "00").mkString
    val rle4 = hexBytesT("424D84000000000000007600000028000000" +
      "0500000002000000" + "0100" + "0400" + "02000000" + "0E000000" +
      "00000000" + "00000000" + "10000000" + "00000000" + pal16 +
      "0512" + "0000" + "00034560" + "0270" + "0000" + "0001")
    assert(luma(rle4).toSeq == Seq(68, 85, 102, 119, 0, 17, 34, 17, 34, 17)
      .map(_.toByte))
    // --- 4-bit uncompressed (3×1): MSB-first nibbles, padded row ---
    val flat4 = hexBytesT("424D7A000000000000007600000028000000" +
      "0300000001000000" + "0100" + "0400" + "00000000" + "04000000" +
      "00000000" + "00000000" + "10000000" + "00000000" + pal16 +
      "45600000")
    assert(luma(flat4).toSeq == Seq(68, 85, 102).map(_.toByte))
    // --- 1-bit uncompressed (10×1): MSB-first bits, 2-entry palette ---
    val flat1 = hexBytesT("424D42000000000000003E00000028000000" +
      "0A00000001000000" + "0100" + "0100" + "00000000" + "04000000" +
      "00000000" + "00000000" + "02000000" + "00000000" +
      "00000000" + "FFFFFF00" + "B2C00000")
    assert(luma(flat1).toSeq ==
      Seq(255, 0, 255, 255, 0, 0, 255, 0, 255, 255).map(_.toByte))
    // ImageIO's own 1-bit writer → this decoder (independent encoder)
    val bin = new java.awt.image.BufferedImage(16, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    (0 until 16).foreach(x => (0 until 4).foreach(y =>
      bin.setRGB(x, y, if ((x + y) % 3 == 0) 0xFFFFFF else 0)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bin, "bmp", bos)
    val mine = luma(bos.toByteArray)
    assert(mine != null && mine.length == 64)
    (0 until 16).foreach(x => (0 until 4).foreach { y =>
      val want = if ((x + y) % 3 == 0) 255 else 0
      assert((mine(y * 16 + x) & 0xff) == want, s"1-bit pixel ($x,$y)")
    })
    // a top-down RLE BMP is structurally invalid per spec → corrupt
    val td = base.clone()
    td(22) = 0xFD.toByte; td(23) = 0xFF.toByte // height 3 → -3
    td(24) = 0xFF.toByte; td(25) = 0xFF.toByte
    val r = Seq(Tuple1(td)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).as[String].head()
    assert(r == "corrupt")
  }

  test("TIFF round-trip: decode(encode(px)) is the identity in both byte orders, packed or not") {
    // run-heavy pixels so the PackBits encoder emits REAL repeat packets
    // (runs of 5) interleaved with literals — both §9 packet kinds in
    // every packed round-trip
    val px = Array.tabulate(9 * 8)(i =>
      (if ((i / 5) % 2 == 0) 0x40 else i & 0xff).toByte)
    for (be <- Seq(false, true); pb <- Seq(false, true)) {
      val tiff = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(9), be, pb)).as[Array[Byte]].head()
      val got = Seq(Tuple1(tiff)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(got, px),
        s"round-trip failed at bigEndian=$be packBits=$pb")
      if (pb) assert(tiff.length < 122 + px.length, "packBits did not compress runs")
    }
  }

  test("TIFF decode: RGB, WhiteIsZero inversion, multi-strip storage, and failure classes match hand vectors") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // 2×1 RGB, LE: BitsPerSample count-3 array via OFFSET (122), strip
    // at 128 — luma601(9,8,7)=8, luma601(12,11,10)=11
    val rgb = hexBytesT("49492A00080000000900" +
      "000103000100000002000000" + "010103000100000001000000" +
      "0201030003000000" + "7A000000" + "030103000100000001000000" +
      "060103000100000002000000" + "1101040001000000" + "80000000" +
      "150103000100000003000000" + "160103000100000001000000" +
      "170104000100000006000000" + "00000000" +
      "080008000800" + "090807" + "0C0B0A")
    assert(luma(rgb).toSeq == Seq[Byte](8, 11))
    assert(reason(rgb) == null)
    // WhiteIsZero: the gray fixture with Photometric patched 1 → 0 at
    // its spec offset inverts every sample
    val px = Array.tabulate(9 * 8)(i => ((i * 37) & 0xff).toByte)
    val white = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    white(66) = 0 // entry 5 (tag 262) value field
    assert(luma(white).toSeq == px.toSeq.map(v => (255 - (v & 0xff)).toByte))
    // 2×2 gray in TWO strips (RowsPerStrip 1): offsets and counts are
    // count-2 LONG arrays behind offsets; rows land in display order
    val twoStrip = hexBytesT("49492A00080000000900" +
      "000103000100000002000000" + "010103000100000002000000" +
      "020103000100000008000000" + "030103000100000001000000" +
      "060103000100000001000000" + "1101040002000000" + "7A000000" +
      "150103000100000001000000" + "160103000100000001000000" +
      "1701040002000000" + "82000000" + "00000000" +
      "8A0000008C000000" + "0200000002000000" + "1522" + "3744")
    assert(luma(twoStrip).toSeq == Seq[Byte](0x15, 0x22, 0x37, 0x44))
    assert(reason(twoStrip) == null)
    // strip data cut off → truncated; IFD pointer past the payload → truncated
    assert(reason(twoStrip.dropRight(2)) == "truncated")
    assert(reason(hexBytesT("49492A00FF00000000000000")) == "truncated")
    // 65535×65535 dims → bomb_guard (patch the gray fixture's dims)
    val bomb = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    bomb(18) = 0xFF.toByte; bomb(19) = 0xFF.toByte // width = 65535
    bomb(30) = 0xFF.toByte; bomb(31) = 0xFF.toByte // height = 65535
    assert(reason(bomb) == "bomb_guard")
    // the cap counts BYTES, not pixels: 5000×5000 RGB is under the pixel
    // cap but its 3-byte samples put the strip allocation over — the
    // PackBits buffer must never outgrow the shared bomb bound
    val bombRgb = rgb.clone()
    bombRgb(18) = 0x88.toByte; bombRgb(19) = 0x13 // width 5000
    bombRgb(30) = 0x88.toByte; bombRgb(31) = 0x13 // height 5000
    assert(reason(bombRgb) == "bomb_guard")
    // planar configuration 2 → unsupported_profile (tiles decode now;
    // retag entry 6, 277 SamplesPerPixel, as 284 PlanarConfiguration=2
    // — samples then defaults to 1, so the planar field is the refusal)
    val planar = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    planar(10 + 6 * 12) = 0x1C; planar(10 + 6 * 12 + 1) = 0x01
    planar(10 + 6 * 12 + 8) = 2
    assert(reason(planar) == "unsupported_profile")
    // PackBits hand vector (6×1): a -128 no-op, a repeat packet
    // (-2 → 3×0x41), then a literal packet (3 bytes) — decoded strip
    // 41 41 41 01 02 03; StripByteCounts is the COMPRESSED length 7
    val packed = hexBytesT("49492A00080000000900" +
      "000103000100000006000000" + "010103000100000001000000" +
      "020103000100000008000000" + "0301030001000000" + "05800000" +
      "060103000100000001000000" + "11010400010000007A000000" +
      "150103000100000001000000" + "160103000100000001000000" +
      "170104000100000007000000" + "00000000" + "80FE4102010203")
    assert(luma(packed).toSeq == Seq[Byte](0x41, 0x41, 0x41, 1, 2, 3))
    assert(reason(packed) == null)
    // control stream runs dry before the raster fills → corrupt
    assert(reason(packed.dropRight(5) ++
      Array[Byte](0, 0, 0, 0, 0)) == "corrupt") // counts intact, stream zeroed short
  }

  test("TIFF LZW + Deflate round-trip: decode(encode) is the identity across byte orders and Predictor 2") {
    val px = Array.tabulate(9 * 8)(i =>
      (if ((i / 5) % 2 == 0) 0x40 else i & 0xff).toByte)
    for (be <- Seq(false, true); lzw <- Seq(false, true); pred <- Seq(false, true)) {
      val tiff = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(9), bigEndian = be,
          lzw = lzw, deflate = !lzw, predictor = pred)).as[Array[Byte]].head()
      val got = Seq(Tuple1(tiff)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(got, px),
        s"round-trip failed at bigEndian=$be lzw=$lzw predictor=$pred")
    }
    // a 64×64 varied raster drives the LZW table past the 511 and 1023
    // width boundaries AND the 4094-entry ClearCode reset — if encoder
    // and decoder disagreed on the EARLY width change, every code after
    // entry 510 would misalign and the round-trip would collapse
    val big = Array.tabulate(64 * 64)(i => ((i * 131 + 7) % 251).toByte)
    val tiffBig = Seq(Tuple1(big)).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(64), lzw = true))
      .as[Array[Byte]].head()
    val gotBig = Seq(Tuple1(tiffBig)).toDF("b")
      .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(gotBig, big))
  }

  test("TIFF LZW hand vector: MSB-first 9-bit codes incl. KwKwK decode to the planted strip") {
    // strip [1,2,2,2,3] compresses to codes 256(Clear),1,2,259,3,257(EOI)
    // — 259 is emitted BEFORE the decoder has table entry 259 (the KwKwK
    // case) — hand-packed MSB-first at 9 bits:
    //   100000000 000000001 000000010 100000011 000000011 100000001 + 00
    //   = 80 00 40 50 30 1C 04
    val lzw5 = hexBytesT("49492A00080000000900" +
      "000103000100000005000000" + "010103000100000001000000" +
      "020103000100000008000000" + "030103000100000005000000" +
      "060103000100000001000000" + "11010400010000007A000000" +
      "150103000100000001000000" + "160103000100000001000000" +
      "170104000100000007000000" + "00000000" + "80004050301C04")
    val got = Seq(Tuple1(lzw5)).toDF("b")
      .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    assert(got.toSeq == Seq[Byte](1, 2, 2, 2, 3))
    // an all-ones code stream (first code 511 — not a literal, no table
    // entry after Clear-state) → corrupt
    val broken = lzw5.clone()
    java.util.Arrays.fill(broken, 122, 129, 0xFF.toByte)
    val r = Seq(Tuple1(broken)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).as[String].head()
    assert(r == "corrupt")
  }

  test("BMP 16-bit/BITFIELDS/2-bit decode: 555 hand vector, mask-driven non-BGR extraction, honest mask failures") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // 1×1 16-bit BI_RGB (implicit 555) HAND vector: word 0x555F =
    // r5 21, g5 10, b5 31 → widened 172/82/255 → luma601 129
    val bmp555 = hexBytesT("424D3A00000000000000360000002800000001000000010000000100" +
      "1000000000000400000000000000000000000000000000000000" + "5F550000")
    assert(luma(bmp555).toSeq == Seq[Byte](129.toByte))
    assert(reason(bmp555) == null)
    // fixture round-trips: every deep mode must equal its closed form
    val px = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    def deep(mode: String): Array[Byte] = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.bmpEncodeDeep($"px", lit(9), mode)).as[Array[Byte]].head()
    def w5(v: Int) = (v >> 3) * 255 / 31
    def w6(v: Int) = (v >> 2) * 255 / 63
    assert(luma(deep("rgb555")).toSeq ==
      px.map(p => w5(p & 0xff).toByte).toSeq)
    assert(luma(deep("bf565")).toSeq ==
      px.map { p => val v = p & 0xff
        ((413 * w5(v) + 587 * w6(v) + 500) / 1000).toByte }.toSeq)
    // the NON-BGR 8888 masks: a decoder assuming BGR byte order would
    // compute luma601(b=(v), g=(255−v), r=(7v%256)) instead and fail
    assert(luma(deep("bf8888")).toSeq ==
      px.map { p => val v = p & 0xff
        ((299 * v + 587 * (255 - v) + 114 * ((7 * v) % 256) + 500) / 1000).toByte }.toSeq)
    assert(luma(deep("pal2")).toSeq ==
      px.map(p => (((p & 0xff) % 4) * 85).toByte).toSeq)
    // mask honesty: non-contiguous red mask → corrupt, overlapping
    // green/red masks → corrupt (structural damage, not a profile)
    val nc = deep("bf565"); nc(54) = 0x01; nc(55) = 0xF8.toByte // 0xF801
    assert(reason(nc) == "corrupt")
    val ov = deep("bf565"); ov(58) = 0x00; ov(59) = 0xF8.toByte // G = R
    assert(reason(ov) == "corrupt")
    // a 16-bit BITFIELDS header cut before its mask DWORDs → truncated
    assert(reason(deep("bf565").take(60)) == "truncated")
  }

  test("BMP embedded BI_JPEG/BI_PNG streams decode through the pipeline's own cores; dim mismatch is corruption") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val gray = Array.tabulate(9 * 8)(i => ((i * 41 + 3) & 0xff).toByte)
    val png = Seq(Tuple1(gray)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = 0,
        stored = true)).as[Array[Byte]].head()
    val bmpPng = Seq(Tuple1(png)).toDF("s")
      .select(Multimodal.bmpEncodeStream($"s", png = true)).as[Array[Byte]].head()
    assert(luma(bmpPng).toSeq == gray.toSeq) // stored PNG is the identity
    assert(reason(bmpPng) == null)
    val jpeg = Seq(Tuple1(Array.fill(12 * 10)(200.toByte))).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(12))).as[Array[Byte]].head()
    val direct = Seq(Tuple1(jpeg)).toDF("b")
      .select(Multimodal.jpegDecodeGray8($"b")).as[Array[Byte]].head()
    val bmpJpg = Seq(Tuple1(jpeg)).toDF("s")
      .select(Multimodal.bmpEncodeStream($"s", png = false)).as[Array[Byte]].head()
    assert(luma(bmpJpg).toSeq == direct.toSeq)
    // a header whose dims disagree with the embedded IHDR → corrupt
    val lied = bmpPng.clone(); lied(18) = 8 // header width 9 → 8
    assert(reason(lied) == "corrupt")
    // cut mid-stream: the declared biSizeImage now overruns → truncated
    assert(reason(bmpPng.dropRight(6)) == "truncated")
  }

  test("CCITT G4 hand vectors: all-white rows are V0 bits; H+V rows and pass mode match hand-coded T.6 bytes; EOFB written") {
    def g4(px: Array[Byte], w: Int, be: Boolean = false, rps: Int = 0): Array[Byte] =
      Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(w), bigEndian = be,
          rowsPerStrip = rps)).as[Array[Byte]].head()
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    def stripBytes(tiff: Array[Byte]): Array[Byte] = {
      // single-strip fixture layout: 9 entries → strip at 8+2+108+4=122
      java.util.Arrays.copyOfRange(tiff, 122, tiff.length)
    }
    // 1) two all-white rows of 8: each row is one V0 bit (the imaginary
    //    change at w against the all-white reference), then EOFB —
    //    hand-packed: 11 000000000001 000000000001 + pad = C0 04 00 40
    val white = Array.fill[Byte](16)(-1) // 255 = white (>= 128)
    assert(stripBytes(g4(white, 8)).toSeq ==
      Seq(0xC0, 0x04, 0x00, 0x40).map(_.toByte))
    assert(luma(g4(white, 8)).toSeq == Seq.fill(16)(-1: Byte))
    // 2) row0 black run at cols 2..4 (H: white-2 0111, black-3 10, then
    //    V0), row1 black at 3..4 (VR1, V0, V0):
    //    0010111101 01111 EOFB pad → 2F 5E 00 20 02
    val hv = Array.fill[Byte](16)(-1)
    hv(2) = 0; hv(3) = 0; hv(4) = 0 // row0 cols 2..4
    hv(8 + 3) = 0; hv(8 + 4) = 0 // row1 cols 3..4
    assert(stripBytes(g4(hv, 8)).toSeq ==
      Seq(0x2F, 0x5E, 0x00, 0x20, 0x02).map(_.toByte))
    assert(luma(g4(hv, 8)).toSeq == hv.toSeq.map(v => if (v == 0) 0: Byte else -1: Byte))
    // 3) pass mode: row0 black at 2..5, row1 all white — row1 must code
    //    PASS (0001) under the reference black run, then V0:
    //    00101110111 00011 EOFB pad → 2E E3 00 10 01
    val pv = Array.fill[Byte](16)(-1)
    pv(2) = 0; pv(3) = 0; pv(4) = 0; pv(5) = 0
    assert(stripBytes(g4(pv, 8)).toSeq ==
      Seq(0x2E, 0xE3, 0x00, 0x10, 0x01).map(_.toByte))
    assert(luma(g4(pv, 8)).toSeq == pv.toSeq.map(v => if (v == 0) 0: Byte else -1: Byte))
    // 4) G3-1D Modified Huffman (Compression 2): row0 white-2 (0111)
    //    black-3 (10) white-3 (1000) = 0x7A 0x00 after the §10 byte
    //    pad; row1 white-8 (10011) = 0x98 — hand-packed
    def g3(px: Array[Byte], w: Int): Array[Byte] =
      Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(w), coding = "mh")).as[Array[Byte]].head()
    val mh = Array.fill[Byte](16)(-1)
    mh(2) = 0; mh(3) = 0; mh(4) = 0
    assert(stripBytes(g3(mh, 8)).toSeq == Seq(0x7A, 0x00, 0x98).map(_.toByte))
    assert(luma(g3(mh, 8)).toSeq == mh.toSeq.map(v => if (v == 0) 0: Byte else -1: Byte))
    // 5) T.4 1-D (Compression 3): EVERY row EOL-framed — same rows as
    //    the MH vector, no byte alignment between rows:
    //    EOL 0111 10 1000 EOL 10011 pad → 00 17 A0 00 66
    def t4(px: Array[Byte], w: Int, coding: String): Array[Byte] =
      Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(w), coding = coding))
        .as[Array[Byte]].head()
    assert(stripBytes(t4(mh, 8, "t4")).toSeq ==
      Seq(0x00, 0x17, 0xA0, 0x00, 0x66).map(_.toByte))
    assert(luma(t4(mh, 8, "t4")).toSeq ==
      mh.toSeq.map(v => if (v == 0) 0: Byte else -1: Byte))
    // 6) T.4 2-D: row0 1-D behind tag 1, row1 2-D behind tag 0 coded
    //    VR1 V0 V0 against row0 — EOL 1 0111101000 EOL 0 01111 pad →
    //    00 1B D0 00 27 80 (strip at 134: the T4Options entry makes a
    //    10-entry IFD)
    val hv2 = Array.fill[Byte](16)(-1)
    hv2(2) = 0; hv2(3) = 0; hv2(4) = 0
    hv2(8 + 3) = 0; hv2(8 + 4) = 0
    val t42dBlob = t4(hv2, 8, "t42d")
    assert(java.util.Arrays.copyOfRange(t42dBlob, 134, t42dBlob.length).toSeq ==
      Seq(0x00, 0x1B, 0xD0, 0x00, 0x27, 0x80).map(_.toByte))
    assert(luma(t42dBlob).toSeq ==
      hv2.toSeq.map(v => if (v == 0) 0: Byte else -1: Byte))
  }

  test("CCITT G4 round-trips: pseudorandom bilevel both byte orders, multi-strip, make-up chains past 2560, inverted photometric") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    val rnd = new scala.util.Random(41)
    val w = 61; val h = 17
    val px = Array.tabulate(w * h)(_ => if (rnd.nextBoolean()) -1: Byte else 0: Byte)
    val want = px.toSeq
    for (be <- Seq(false, true); rps <- Seq(0, 5);
         coding <- Seq("g4", "mh", "t4", "t42d")) {
      val tiff = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(w), bigEndian = be,
          rowsPerStrip = rps, coding = coding)).as[Array[Byte]].head()
      assert(luma(tiff).toSeq == want, s"be=$be rps=$rps coding=$coding")
    }
    // make-up chain: a 2700-wide line forces 2560-extended + 128 make-up
    // + terminating white codes (and the same for black on row 2)
    val wide = Array.fill[Byte](2700 * 2)(-1)
    var i = 2700
    while (i < 5400) { wide(i) = 0; i += 1 }
    val tw = Seq(Tuple1(wide)).toDF("px")
      .select(Multimodal.tiffG4Encode($"px", lit(2700))).as[Array[Byte]].head()
    assert(luma(tw).toSeq == wide.toSeq)
    // photometric 1 (BlackIsZero) inverts the emitted luma — patch the
    // fixture's tag-262 value field (entry 5 of 9: offset 10+4*12+8)
    val inv = Seq(Tuple1(px.take(w * 3))).toDF("px")
      .select(Multimodal.tiffG4Encode($"px", lit(w))).as[Array[Byte]].head()
    val patched = inv.clone()
    patched(10 + 4 * 12 + 8) = 1
    assert(luma(patched).toSeq ==
      px.take(w * 3).toSeq.map(v => if (v == 0) -1: Byte else 0: Byte))
  }

  test("CCITT G4 cross-decoder: the JDK ImageIO TIFF reader reproduces the fixture's bilevel raster exactly") {
    import javax.imageio.ImageIO
    val rnd = new scala.util.Random(43)
    val w = 64; val h = 32
    val px = Array.tabulate(w * h)(_ => if (rnd.nextInt(4) == 0) 0: Byte else -1: Byte)
    for (coding <- Seq("g4", "mh", "t4", "t42d")) {
      val tiff = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(w), coding = coding)).as[Array[Byte]].head()
      val img = ImageIO.read(new java.io.ByteArrayInputStream(tiff))
      assert(img != null, s"ImageIO could not read the CCITT fixture ($coding)")
      assert(img.getWidth == w && img.getHeight == h)
      val mine = Seq(Tuple1(tiff)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val iio = img.getRGB(x, y) & 0xff
          assert(iio == (mine(y * w + x) & 0xff), s"($x,$y) $coding")
          x += 1
        }
        y += 1
      }
    }
  }

  test("CCITT honest failures: truncation, extension codes, relabeled streams, T4 uncompressed option; drop report agrees") {
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val px = Array.fill[Byte](16)(-1)
    px(2) = 0; px(3) = 0
    val tiff = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffG4Encode($"px", lit(8))).as[Array[Byte]].head()
    assert(reason(tiff) == null) // a sound G4 file decodes
    // cut the MMR stream mid-row: the strip count still points past the
    // buffer → truncated
    assert(reason(tiff.dropRight(3)) == "truncated")
    // an extension code (0000001…) mid-strip is a hard decode failure
    val extd = tiff.clone()
    extd(122) = 0x01 // first strip byte: 0000 0001 → extension prefix
    assert(reason(extd) == "corrupt")
    // Compressions 2 and 3 DECODE since r14 — but a G4 stream relabeled
    // MH/T.4 is not a valid stream of either framing (no EOLs, wrong
    // alphabet positioning): honest corruption, not a refusal
    for (c <- Seq(2, 3)) {
      val relabeled = tiff.clone()
      relabeled(10 + 3 * 12 + 8) = c.toByte // tag 259 value (entry 4 of 9)
      assert(reason(relabeled) == "corrupt", s"compression $c")
    }
    // the T.4 uncompressed-mode option (T4Options bit 1) stays refused:
    // patch the t42d fixture's tag-292 value (entry 10 of 10) from 1 → 3
    val t42d = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffG4Encode($"px", lit(8), coding = "t42d"))
      .as[Array[Byte]].head()
    assert(reason(t42d) == null)
    val unc = t42d.clone()
    assert((unc(10 + 9 * 12 + 8) & 0xff) == 1, "T4Options layout moved")
    unc(10 + 9 * 12 + 8) = 3
    assert(reason(unc) == "unsupported_profile")
  }

  test("r15 print/legacy tiers: TIFF CMYK hand inks + round trip, BMP OS/2 V2 round trip, honest refusals") {
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    def tiffLuma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    // CMYK hand inks: no ink = white; all inks = black; pure cyan kills
    // red only → luma601(0,255,255) = 179; pure black ink = 0
    val inks = Array[Byte](0, 0, 0, 0,
      -1, -1, -1, -1,
      -1, 0, 0, 0,
      0, 0, 0, -1)
    val cmyk = Seq(Tuple1(inks)).toDF("px")
      .select(Multimodal.tiffEncodeDeep($"px", lit(4), mode = "cmyk8"))
      .as[Array[Byte]].head()
    assert(tiffLuma(cmyk).toSeq == Seq[Byte](-1, 0, 179.toByte, 0))
    assert(reason(cmyk) == null)
    // round trip on iid ink bytes, both byte orders: decode must equal
    // the closed-form conversion of the planted inks
    val rnd = new scala.util.Random(23)
    val px4 = Array.fill(9 * 8 * 4)(rnd.nextInt(256).toByte)
    def lumaOf(i: Int): Byte = {
      val c = px4(4 * i) & 0xff; val m = px4(4 * i + 1) & 0xff
      val y = px4(4 * i + 2) & 0xff; val k = px4(4 * i + 3) & 0xff
      (((299 * ((255 - c) * (255 - k) / 255) +
        587 * ((255 - m) * (255 - k) / 255) +
        114 * ((255 - y) * (255 - k) / 255) + 500) / 1000)).toByte
    }
    for (be <- Seq(false, true)) {
      val t = Seq(Tuple1(px4)).toDF("px")
        .select(Multimodal.tiffEncodeDeep($"px", lit(9), bigEndian = be,
          mode = "cmyk8")).as[Array[Byte]].head()
      assert(tiffLuma(t).toSeq == (0 until 72).map(lumaOf), s"be=$be")
    }
    // CMYK+spot shapes stay refused: patch SamplesPerPixel (entry 6,
    // value at 10+12·6+8) from 4 to 5
    val spot = cmyk.clone()
    assert((spot(90) & 0xff) == 4, "IFD layout moved")
    spot(90) = 5
    assert(reason(spot) == "unsupported_profile")
    // OS/2 V2 fixture round trip: the 16-byte truncated header over the
    // full 256-gray palette decodes to the identity
    val gray = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    val os2bmp = Seq(Tuple1(gray)).toDF("px")
      .select(Multimodal.bmpEncodeGray8($"px", lit(9), os2 = true))
      .as[Array[Byte]].head()
    assert((os2bmp(14) & 0xff) == 16, "OS/2 header size")
    assert(reason(os2bmp) == null)
    assert(Seq(Tuple1(os2bmp)).toDF("b")
      .select(Multimodal.bmpDecodeLuma($"b")).as[Array[Byte]].head().toSeq ==
      gray.toSeq)
    // and the Windows-path round trip is unchanged by the os2 flag work
    val winBmp = Seq(Tuple1(gray)).toDF("px")
      .select(Multimodal.bmpEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    assert((winBmp(14) & 0xff) == 40)
    // ADVICE r16: OS/2 V2 headers truncate on field boundaries only — a
    // size that SPLITS a field (17..19 cut the compression u32, 50 cuts
    // size1) is corrupt, not a default-the-absent-fields header
    for (splitting <- Seq(17, 18, 19, 50)) {
      val cut = os2bmp.clone()
      cut(14) = splitting.toByte
      assert(reason(cut) == "corrupt", s"hdrSize $splitting must be corrupt")
    }
  }

  test("ADVICE r14 pins: MH row overrun, BMP zero BITFIELDS masks, WAV trailing garbage") {
    // 1) MH: a row whose run chains overrun w must be rejected, not
    //    filled into the next row's region. Hand-packed per the T.4
    //    terminating alphabet: white-4 = 1011, black-8 = 000101 →
    //    row "1011000101" pads to B1 40; x reaches 12 > w=8. A second
    //    row (white-8 = 10011 → 98) makes the pre-fix stream decode
    //    end-to-end, which is exactly the bug.
    val overrun = Array(0xB1, 0x40, 0x98).map(_.toByte)
    assert(graft.functions.Native.Ccitt.decodeMh(overrun, 0, 3, 8, 2) == null)
    // last-row variant: pre-fix the fill ran past the output array
    assert(graft.functions.Native.Ccitt.decodeMh(
      Array(0xB1, 0x40).map(_.toByte), 0, 2, 8, 1) == null)
    // positive control: white-8 row then white-4+black-4 (1011 011 → B6)
    val good = graft.functions.Native.Ccitt.decodeMh(
      Array(0x98, 0xB6).map(_.toByte), 0, 2, 8, 2)
    assert(good != null &&
      good.toSeq == (Seq.fill(12)(0: Byte) ++ Seq.fill(4)(1: Byte)))

    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // 2) BMP BI_BITFIELDS with all three masks zero is structural
    //    damage at BOTH depths — pre-fix 16bpp read 3 bytes at a
    //    2-byte stride and 32bpp silently decoded as BGRX
    val px = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    def deep(mode: String): Array[Byte] = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.bmpEncodeDeep($"px", lit(9), mode)).as[Array[Byte]].head()
    for (mode <- Seq("bf565", "bf8888")) {
      val z = deep(mode)
      java.util.Arrays.fill(z, 54, 66, 0: Byte)
      assert(reason(z) == "corrupt", s"zero masks, $mode")
    }

    // 3) WAV: a malformed trailing chunk after fmt+data (size field
    //    overrunning the buffer — trailing garbage is common in real
    //    corpora) must not turn a decodable file into `truncated`
    val pcm = Array.tabulate(100)(i => (i * 131 - 6000).toShort)
    val pcmBytes = new Array[Byte](200)
    pcm.indices.foreach { i =>
      pcmBytes(2 * i) = (pcm(i) & 0xff).toByte
      pcmBytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
    }
    val blob = Seq(Tuple1(pcmBytes)).toDF("b")
      .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, "pcm24"))
      .as[Array[Byte]].head()
    def canon(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    val clean = canon(blob)
    assert(clean != null)
    val junk = blob ++ Array[Byte]('J', 'U', 'N', 'K',
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) ++ Array[Byte](1, 2, 3)
    // RIFF size at offset 4 need not cover the garbage — the walk keys
    // on the buffer, so only the trailing chunk header matters
    assert(java.util.Arrays.equals(canon(junk), clean))
    // a chunk overrunning BEFORE data is resolved is still truncation
    val cut = blob.take(50) // inside the data payload
    val cutHdr = cut.clone()
    assert(canon(cutHdr) == null)
  }

  test("JPEG SOF1 decodes at 8 bits (SOF0's coding) AND 12 bits; Pq/precision mismatches are corrupt; SOF3 refused") {
    val blocks = Array[Byte](33, 220.toByte, 17, 199.toByte)
    val px = new Array[Byte](12 * 10)
    var i = 0
    while (i < px.length) {
      val x = i % 12; val y = i / 12
      px(i) = blocks((y / 8) * 2 + (x / 8)); i += 1
    }
    val base = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(12))).as[Array[Byte]].head()
    val sof = (0 until base.length - 1).find(i =>
      (base(i) & 0xff) == 0xFF && (base(i + 1) & 0xff) == 0xC0).get
    val sof1 = base.clone(); sof1(sof + 1) = 0xC1.toByte
    def dec(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.jpegDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(dec(sof1) != null && dec(sof1).toSeq == dec(base).toSeq)
    // the same Huffman stream RELABELED precision 12 is a VALID 12-bit
    // file (Pq=0 tables are legal at either precision): DC-only blocks
    // reconstruct to (dcq + 2048) >> 4 = (plant + 1920) >> 4
    val relabeled = sof1.clone(); relabeled(sof + 4) = 12
    assert(reason(relabeled) == null)
    assert(dec(relabeled).toSeq ==
      dec(base).toSeq.map(v => (((v & 0xff) + 1920) >> 4).toByte))
    // the REAL 12-bit fixture: SOF1 precision 12 with a Pq=1 16-bit
    // DQT; same closed form
    val deep = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(12), deep = true))
      .as[Array[Byte]].head()
    assert(reason(deep) == null)
    assert(dec(deep).toSeq ==
      px.toSeq.map(v => (((v & 0xff) + 1920) >> 4).toByte))
    // a Pq=1 table under an 8-bit frame is structural damage (T.81
    // B.2.4.1) — patch the deep fixture's precision back to 8
    val sofD = (0 until deep.length - 1).find(i =>
      (deep(i) & 0xff) == 0xFF && (deep(i + 1) & 0xff) == 0xC1).get
    val mix = deep.clone(); mix(sofD + 4) = 8
    assert(reason(mix) == "corrupt")
    // lossless (SOF3) stays the profile limit
    val sof3 = base.clone(); sof3(sof + 1) = 0xC3.toByte
    assert(reason(sof3) == "unsupported_profile")
    // and 16-bit-class precision on SOF1 stays refused
    val p16 = sof1.clone(); p16(sof + 4) = 16
    assert(reason(p16) == "unsupported_profile")
  }

  test("JPEG-in-TIFF (Compression 7): full-stream and JPEGTables-split strips route through the JPEG cores; color rides photometric 6") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    // per-block-constant 12×10 gray plant → DC-only baseline JPEG
    // (bit-exact round trip, the multimodal_decode_jpeg contract)
    val rnd = new scala.util.Random(47)
    val blocks = Array.tabulate(4)(_ => { val v = rnd.nextInt(128)
      (if (v < 64) v + 1 else v + 128).toByte })
    val px = new Array[Byte](12 * 10)
    var y = 0
    while (y < 10) {
      var x = 0
      while (x < 12) {
        px(y * 12 + x) = blocks((y / 8) * 2 + (x / 8)); x += 1
      }
      y += 1
    }
    val jpeg = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(12))).as[Array[Byte]].head()
    val direct = Seq(Tuple1(jpeg)).toDF("b")
      .select(Multimodal.jpegDecodeGray8($"b")).as[Array[Byte]].head()
    for (be <- Seq(false, true); split <- Seq(false, true)) {
      val tiff = Seq(Tuple1(jpeg)).toDF("j")
        .select(Multimodal.tiffJpegEncode($"j", bigEndian = be, split = split))
        .as[Array[Byte]].head()
      assert(luma(tiff).toSeq == direct.toSeq, s"be=$be split=$split")
      if (split) {
        // DQT/DHT must have MOVED: the TIFF is smaller than header +
        // full stream (the strip lost its table segments to tag 347),
        // and still decodes — proving the splice path really ran
        var hits = 0
        var i = 0
        while (i + 1 < tiff.length) {
          if ((tiff(i) & 0xff) == 0xFF &&
            ((tiff(i + 1) & 0xff) == 0xDB || (tiff(i + 1) & 0xff) == 0xC4)) hits += 1
          i += 1
        }
        assert(hits >= 2, "JPEGTables stream lost its DQT/DHT")
      }
    }
    // progressive stream through the same seam
    val prog = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Prog($"px", lit(12))).as[Array[Byte]].head()
    val progDirect = Seq(Tuple1(prog)).toDF("b")
      .select(Multimodal.jpegDecodeLuma($"b")).as[Array[Byte]].head()
    val progTiff = Seq(Tuple1(prog)).toDF("j")
      .select(Multimodal.tiffJpegEncode($"j")).as[Array[Byte]].head()
    assert(luma(progTiff).toSeq == progDirect.toSeq)
    // color: the YCbCr fixture wraps under photometric 6
    val cpx = new Array[Byte](32 * 16)
    java.util.Arrays.fill(cpx, 200.toByte)
    val cjpeg = Seq(Tuple1(cpx)).toDF("px")
      .select(Multimodal.jpegEncodeYccDc($"px", lit(32), 2, 1, 32, 224))
      .as[Array[Byte]].head()
    val cDirect = Seq(Tuple1(cjpeg)).toDF("b")
      .select(Multimodal.jpegDecodeLuma($"b")).as[Array[Byte]].head()
    val cTiff = Seq(Tuple1(cjpeg)).toDF("j")
      .select(Multimodal.tiffJpegEncode($"j", split = true)).as[Array[Byte]].head()
    assert(luma(cTiff).toSeq == cDirect.toSeq)
  }

  test("TIFF planar configuration 2: plane-major strip arrays combine to the 601 luma; planar-2 off the 8-bit RGB profile stays refused") {
    // hand-built 3×2 RGB, planes in three uncompressed strips
    val r = Array[Byte](10, 20, 30, 40, 50, 60)
    val g = Array[Byte](110, 120, 130.toByte, 140.toByte, 150.toByte, 160.toByte)
    val b = Array[Byte](210.toByte, 220.toByte, 230.toByte, 240.toByte, 250.toByte, 255.toByte)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def short1(v: Int): Unit = { w16(v); w16(0) }
    def entry(tag: Int, typ: Int, cnt: Int)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt); value
    }
    val nEntries = 10
    val arraysOff = 8 + 2 + nEntries * 12 + 4
    // bits [8,8,8] (6B) + offsets[3] (12B) + counts[3] (12B)
    val dataOff = arraysOff + 6 + 12 + 12
    out.write('I'); out.write('I'); w16(42); w32(8)
    w16(nEntries)
    entry(256, 3, 1)(short1(3)); entry(257, 3, 1)(short1(2))
    entry(258, 3, 3)(w32(arraysOff))
    entry(259, 3, 1)(short1(1)); entry(262, 3, 1)(short1(2))
    entry(273, 4, 3)(w32(arraysOff + 6))
    entry(277, 3, 1)(short1(3)); entry(278, 3, 1)(short1(2))
    entry(279, 4, 3)(w32(arraysOff + 18))
    entry(284, 3, 1)(short1(2))
    w32(0)
    w16(8); w16(8); w16(8)
    w32(dataOff); w32(dataOff + 6); w32(dataOff + 12)
    w32(6); w32(6); w32(6)
    out.write(r); out.write(g); out.write(b)
    val tiff = out.toByteArray
    val got = Seq(Tuple1(tiff)).toDF("b")
      .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    val want = (0 until 6).map(i => ((299 * (r(i) & 0xff) + 587 * (g(i) & 0xff) +
      114 * (b(i) & 0xff) + 500) / 1000).toByte)
    assert(got.toSeq == want)
    // planar-2 gray (photometric 1) is off the rider's profile
    val gray = tiff.clone()
    gray(10 + 4 * 12 + 8) = 1 // tag 262 → 1
    val reason = Seq(Tuple1(gray)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).collect().head
    assert(!reason.isNullAt(0) && reason.getString(0) == "unsupported_profile")
  }

  test("TIFF Predictor 2 hand vector: hand-differenced rows integrate back; predictor on uncompressed is out of contract") {
    // 3×2 pixels [10,20,15 / 7,7,250] stored as per-row deltas
    // [10,10,-5 / 7,0,243] (hand-computed), zlib-deflated by the JDK —
    // the differencing semantics are pinned by the hand array, only the
    // entropy layer rides java.util.zip
    val diffed = Array[Byte](10, 10, -5, 7, 0, 243.toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(diffed); d.finish()
    val buf = new Array[Byte](64)
    val zn = d.deflate(buf); d.end()
    val z = buf.take(zn)
    // 10-entry IFD (Predictor tag 317 appended in tag order), strip at
    // 8+2+120+4 = 134 = 0x86, Compression 8 (zlib)
    val hdr = hexBytesT("49492A00080000000A00" +
      "000103000100000003000000" + "010103000100000002000000" +
      "020103000100000008000000" + "030103000100000008000000" +
      "060103000100000001000000" + "110104000100000086000000" +
      "150103000100000001000000" + "160103000100000002000000" +
      "1701040001000000" + f"${zn}%02X000000" +
      "3D0103000100000002000000" + "00000000")
    val tiff = hdr ++ z
    val got = Seq(Tuple1(tiff)).toDF("b")
      .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    assert(got.toSeq == Seq[Byte](10, 20, 15, 7, 7, 250.toByte))
    // the same file with Compression patched to 1 (uncompressed +
    // predictor — outside the decoder's contract) → unsupported_profile
    val unc = tiff.clone()
    unc(54) = 1 // entry 3 (tag 259) value field at 10 + 3·12 + 8
    val r = Seq(Tuple1(unc)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).as[String].head()
    assert(r == "unsupported_profile")
    // a CCITT label (Compression 2) on this 8-BIT file stays
    // recognized-but-unsupported — CCITT is bilevel-only (the bilevel
    // MH/MMR profiles themselves decode since r14)
    val ccitt = tiff.clone()
    ccitt(54) = 2
    val r2 = Seq(Tuple1(ccitt)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).as[String].head()
    assert(r2 == "unsupported_profile")
  }

  test("TIFF palette and 16-bit decode: builder round-trips, hand-vector 16-bit RGB, honest refusals") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val px = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    // palette: the planted ColorMap (i, 255−i, (7i)%256 per channel
    // high byte) must land on the PNG palette oracle's luma closed form
    def lumaOfIdx(i: Int) =
      ((299 * i + 587 * (255 - i) + 114 * ((7 * i) % 256) + 500) / 1000).toByte
    for (be <- Seq(false, true)) {
      val pal = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeDeep($"px", lit(9), bigEndian = be))
        .as[Array[Byte]].head()
      assert(luma(pal).toSeq == px.map(v => lumaOfIdx(v & 0xff)).toSeq,
        s"palette bigEndian=$be")
      // 16-bit gray: the planted nonzero low byte must be DROPPED
      val g16 = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeDeep($"px", lit(9), bigEndian = be,
          mode = "gray16")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(luma(g16), px), s"gray16 bigEndian=$be")
      // ImageIO reads both profiles back to the same pixels
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(g16))
      assert(img != null, s"ImageIO rejected gray16 be=$be")
      val got = new Array[Int](72)
      img.getRaster.getSamples(0, 0, 9, 8, 0, got)
      assert(got.toSeq == px.map(v => ((v & 0xff) << 8) | ((v & 0xff) ^ 0xA5)).toSeq,
        s"ImageIO misread gray16 be=$be")
    }
    // hand-assembled 2×1 16-bit RGB (LE): samples (0x1234,0x5678,0x9ABC)
    // and (0xFF00,0x0100,0x00FF) → luma601 of the HIGH bytes = 73, 77
    val rgb16 = hexBytesT("49492A00080000000900" +
      "000103000100000002000000" + "010103000100000001000000" +
      "0201030003000000" + "7A000000" + "030103000100000001000000" +
      "060103000100000002000000" + "1101040001000000" + "80000000" +
      "150103000100000003000000" + "160103000100000001000000" +
      "1701040001000000" + "0C000000" + "00000000" +
      "100010001000" + "34127856BC9A" + "00FF0001FF00")
    assert(luma(rgb16).toSeq == Seq[Byte](73, 77))
    assert(reason(rgb16) == null)
    // refusals: 16-bit palette, predictor on 16-bit, mixed depths
    val pal16 = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffEncodeDeep($"px", lit(9)))
      .as[Array[Byte]].head()
    pal16(42) = 16 // BitsPerSample value field (entry 2 at 10+2·12+8)
    assert(reason(pal16) == "unsupported_profile")
    val pred16 = rgb16.clone()
    // retag entry 8 (278 RowsPerStrip) → 317 Predictor=2: a 16-bit file
    // claiming byte-wise differencing is out of contract
    pred16(10 + 8 * 12) = 0x3D; pred16(10 + 8 * 12 + 1) = 0x01
    pred16(10 + 8 * 12 + 8) = 2
    assert(reason(pred16) == "unsupported_profile")
    val mixed = rgb16.clone()
    mixed(0x7A + 4) = 8 // third BitsPerSample 16 → 8: mixed depths
    assert(reason(mixed) == "unsupported_profile")
  }

  test("TIFF sub-byte gray/palette and ExtraSamples RGBA: hand-packed 1/2-bit vectors, 4-bit round-trips, alpha skipped") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    // hand-built 5×1 depth-2 gray (BlackIsZero): samples [0,1,2,3,2]
    // pack MSB-first to 0x1B 0x80; luma scales ·85
    val d2 = hexBytesT("49492A00080000000900" +
      "000103000100000005000000" + "010103000100000001000000" +
      "020103000100000002000000" + "030103000100000001000000" +
      "060103000100000001000000" + "11010400010000007A000000" +
      "150103000100000001000000" + "160103000100000001000000" +
      "170104000100000002000000" + "00000000" + "1B80")
    assert(luma(d2).toSeq == Seq[Byte](0, 85, 170.toByte, 255.toByte, 170.toByte))
    // the same file at depth 1: the first 5 bits of 0x1B = 0,0,0,1,1
    val d1 = d2.clone(); d1(10 + 2 * 12 + 8) = 1
    assert(luma(d1).toSeq == Seq[Byte](0, 0, 0, 255.toByte, 255.toByte))
    // WhiteIsZero inverts the scaled gray
    val d2inv = d2.clone(); d2inv(10 + 4 * 12 + 8) = 0
    assert(luma(d2inv).toSeq == Seq[Byte](255.toByte, 170.toByte, 85, 0, 85))
    // fixture round-trips: gray4 = (v>>4)·17; pal4 = the stretched
    // palette closed form over e = 17·(v mod 16), big-endian walk
    val px = Array.tabulate(9 * 8)(i => ((i * 37 + 11) & 0xff).toByte)
    def deep(mode: String, be: Boolean = false): Array[Byte] =
      Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeDeep($"px", lit(9), bigEndian = be,
          mode = mode)).as[Array[Byte]].head()
    assert(luma(deep("gray4")).toSeq ==
      px.map(p => (((p & 0xff) >> 4) * 17).toByte).toSeq)
    for (be <- Seq(false, true))
      assert(luma(deep("pal4", be)).toSeq ==
        px.map { p => val e = 17 * ((p & 0xff) % 16)
          ((299 * e + 587 * (255 - e) + 114 * ((7 * e) % 256) + 500) / 1000).toByte
        }.toSeq, s"pal4 be=$be")
    // RGBA: planted 4-byte pixels whose ALPHA byte would corrupt the
    // luma if the stride or the ExtraSamples skip were wrong
    val rgba = Array.tabulate(9 * 8 * 4) { i =>
      val p = i / 4
      (i % 4 match {
        case 0 => (p * 31 + 5) & 0xff
        case 1 => (p * 57 + 99) & 0xff
        case 2 => (p * 83 + 7) & 0xff
        case _ => 0xEE // alpha: a loud constant
      }).toByte
    }
    val rgbaTiff = Seq(Tuple1(rgba)).toDF("px")
      .select(Multimodal.tiffEncodeDeep($"px", lit(9), mode = "rgba8"))
      .as[Array[Byte]].head()
    val want = Array.tabulate(9 * 8) { p =>
      ((299 * ((p * 31 + 5) & 0xff) + 587 * ((p * 57 + 99) & 0xff) +
        114 * ((p * 83 + 7) & 0xff) + 500) / 1000).toByte
    }
    assert(luma(rgbaTiff).toSeq == want.toSeq)
    // ImageIO cross-pins: the JDK reader agrees on gray4 and RGBA
    for (blob <- Seq(deep("gray4"), rgbaTiff)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img != null && img.getWidth == 9 && img.getHeight == 8)
      val mine = luma(blob)
      var i = 0
      while (i < 72) {
        val rgb = img.getRGB(i % 9, i / 9)
        val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff) + 500) / 1000
        assert(l == (mine(i) & 0xff), s"px $i")
        i += 1
      }
    }
    // CMYK-shaped 4-sample file WITHOUT ExtraSamples stays refused
    val cmykish = rgbaTiff.clone()
    // zero out the ExtraSamples tag id (338 → an unknown tag id keeps
    // the entry parse valid but removes the alpha declaration)
    val e338 = (0 until 10).find(k =>
      (cmykish(10 + 12 * k) & 0xff) == 0x52 && (cmykish(11 + 12 * k) & 0xff) == 0x01).get
    cmykish(10 + 12 * e338) = 0x99.toByte
    val reason = Seq(Tuple1(cmykish)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).collect().head
    assert(!reason.isNullAt(0) && reason.getString(0) == "unsupported_profile")
  }

  test("TIFF tiled layout: multi-tile grid with edge clipping, ImageIO's tiled LZW writer, refusals") {
    def luma(bytes: Array[Byte]): Array[Byte] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
    // a 20×18 image over 16×16 tiles = a 2×2 grid where BOTH edge
    // dimensions clip (right tiles 4 px wide, bottom tiles 2 px tall)
    val px = Array.tabulate(20 * 18)(i => ((i * 53 + 7) & 0xff).toByte)
    val tiledBlob = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.tiffEncodeDeep($"px", lit(20), mode = "tiles8"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(luma(tiledBlob), px), "2×2 tile grid")
    // ImageIO reads the builder's tiled file to the same pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiledBlob))
    assert(img != null, "ImageIO rejected the tiled file")
    val got = new Array[Byte](20 * 18)
    img.getRaster.getDataElements(0, 0, 20, 18, got)
    assert(java.util.Arrays.equals(got, px), "ImageIO misread the tiled file")
    // ImageIO's own TILED writer (LZW-compressed tiles!) → this decoder:
    // tile addressing AND the LZW path through an independent encoder
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    p.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setTiling(16, 16, 0, 0)
    val big = Array.tabulate(40 * 33)(i => ((i * 131 + 7) % 251).toByte)
    val bimg = new java.awt.image.BufferedImage(40, 33,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    bimg.getRaster.setDataElements(0, 0, 40, 33, big)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(bimg, null, null), p)
    ios.close(); w.dispose()
    val mine = luma(bos.toByteArray)
    assert(mine != null, "decoder rejected ImageIO's tiled LZW file")
    assert(java.util.Arrays.equals(mine, big), "decoder misread ImageIO's tiled LZW file")
    // a file claiming BOTH strip and tile addressing is corrupt, and a
    // tile-count mismatch refuses
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val both = tiledBlob.clone()
    // retag entry 5 (277 SamplesPerPixel) as 273 StripOffsets — now the
    // file carries tile AND strip addressing
    both(10 + 5 * 12) = 0x11; both(10 + 5 * 12 + 1) = 0x01
    assert(reason(both) == "corrupt")
  }

  test("TIFF LZW/Deflate cross-decoder: ImageIO reads this encoder's streams and this decoder reads ImageIO's") {
    import javax.imageio.ImageIO
    val px = Array.tabulate(64 * 64)(i => ((i * 131 + 7) % 251).toByte)
    // this encoder → ImageIO (pins that the emitted LZW/Deflate streams
    // are spec-valid to a third-party reader, not just self-consistent)
    for ((lzw, defl) <- Seq((true, false), (false, true))) {
      val tiff = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(64), lzw = lzw,
          deflate = defl, predictor = lzw)).as[Array[Byte]].head()
      val img = ImageIO.read(new java.io.ByteArrayInputStream(tiff))
      assert(img != null, s"ImageIO rejected lzw=$lzw deflate=$defl")
      val got = new Array[Byte](64 * 64)
      img.getRaster.getDataElements(0, 0, 64, 64, got)
      assert(java.util.Arrays.equals(got, px),
        s"ImageIO misread the encoder's stream at lzw=$lzw deflate=$defl")
    }
    // ImageIO's writer → this decoder (pins the decoder — including the
    // EARLY width change past entry 510 — against an independent encoder)
    for (ctype <- Seq("LZW", "ZLib", "Deflate")) {
      val w = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(ctype)
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, 64, 64, px)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
      val got = Seq(Tuple1(bos.toByteArray)).toDF("b")
        .select(Multimodal.tiffDecodeLuma($"b")).as[Array[Byte]].head()
      assert(got != null, s"decoder rejected ImageIO's $ctype stream")
      assert(java.util.Arrays.equals(got, px),
        s"decoder misread ImageIO's $ctype stream")
    }
  }

  test("flacHeader writes the spec's STREAMINFO byte layout (hand-computed hex) and flacMeta inverts it") {
    // 44100 Hz stereo 16-bit, 1e6 samples — every packed field computed
    // by hand from the published layout: rate 0x0AC44 → 0A C4 4·,
    // channels−1=1 → ·2, bits−1=15 → F·, total 0x0F4240
    val hdr = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.flacHeader(lit(44100L), lit(2L), lit(16L), lit(1000000L)))
      .as[Array[Byte]].head()
    val expect = "664C6143" + "80000022" + "10001000" + "000000000000" +
      "0AC442F0" + "000F4240" + "00" * 16
    assert(hdr.map("%02X".format(_)).mkString == expect)
    // parse-back across the packed-field edges: 8 channels, 24 bits, a
    // 36-bit total that straddles into byte 3's low nibble
    val big = 4294967296L * 2 + 5 // 2^33 + 5
    val blob = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.flacHeader(lit(96000L), lit(8L), lit(24L), lit(big))
        .as("f"))
      .select(Multimodal.flacMeta($"f").as("m"))
      .select($"m.sample_rate", $"m.n_channels", $"m.bits_per_sample",
        $"m.total_samples", $"m.duration_ms")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(blob == ((96000L, 8L, 24L, big, big * 1000 / 96000L)))
    // null, never a misparse: junk, a non-first STREAMINFO, a short blob
    val badFirst = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.flacHeader(lit(44100L), lit(2L), lit(16L), lit(0L)))
      .as[Array[Byte]].head()
    badFirst(4) = 0x84.toByte // first block type = 4 (VORBIS_COMMENT)
    val nulls = Seq(
      Tuple1("fLaC but not really".getBytes("UTF-8")),
      Tuple1(badFirst),
      Tuple1(Array[Byte]('f', 'L', 'a', 'C', 0x00.toByte)))
      .toDF("b").select(Multimodal.flacMeta($"b")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  // ---- WebM (EBML) + Ogg metadata census ----

  test("webmHeader writes a hand-verified EBML byte layout and webmMeta inverts it") {
    // width 320, height 240, duration 2500 ms, V_VP8 + A_OPUS. Duration's
    // float64 bits computed BY HAND: 2500 = 1.220703125 × 2^11 →
    // exponent 1023+11 = 0x40A, mantissa 2500·2^(52−11) − 2^52 =
    // 0x38A0000000000 → bytes 40A3880000000000... check: 2500 decimal =
    // 100111000100b (12 bits, e=11); bits = (0x40A << 52) | (2500 <<
    // 41) − 2^52. 2500<<41 = 0x4E2000000000000... recompute in the
    // assertion instead: compare against java's own doubleToLongBits.
    val webm = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.webmHeader(lit(320L), lit(240L), lit(2500L),
        lit("V_VP8"), lit("A_OPUS"))).as[Array[Byte]].head()
    val durBits = java.lang.Double.doubleToLongBits(2500.0)
    val durHex = (0 until 8).map(i => f"${(durBits >> (8 * (7 - i))) & 0xff}%02X").mkString
    val expect = "1A45DFA39F" +
      "4286810142F7810142F2810442F38108" +
      "4282847765626D" + "4287810242858102" +
      "18538067CD" +
      "1549A96692" + "2AD7B1830F4240" + "448988" + durHex +
      "1654AE6BB1" +
      "AE9B" + "D78101" + "73C58101" + "838101" + "8685" + "565F565038" + // "V_VP8"
      "E088" + "B082" + "0140" + "BA82" + "00F0" +
      "AE92" + "D78102" + "73C58102" + "838102" + "8686" + "415F4F505553" // "A_OPUS"
    assert(webm.map("%02X".format(_)).mkString == expect,
      "webmHeader byte layout drifted from the hand-computed hex")
    // the real walker inverts every field
    val m = Seq(Tuple1(webm)).toDF("w")
      .select(Multimodal.webmMeta($"w").as("m"))
      .select($"m.doc_type", $"m.timescale_ns", $"m.duration_ms", $"m.n_tracks",
        $"m.width", $"m.height", $"m.video_codec", $"m.audio_codec")
      .as[(String, Long, Long, Long, Long, Long, String, String)].head()
    assert(m == (("webm", 1000000L, 2500L, 2L, 320L, 240L, "V_VP8", "A_OPUS")))
  }

  test("webmMeta walks general EBML: unknown elements skipped, unknown-size Segment, 4-byte float Duration, spec default timescale; refusals never misparse") {
    // hand-built blob: EBML header with an UNKNOWN extra element (7F 81
    // 00 — a void-ish 1-byte element), Segment with UNKNOWN size (01 FF
    // FF FF FF FF FF FF), Info with NO TimestampScale (spec default 1e6)
    // and a FLOAT32 Duration (1500.0 → 0x44BB8000), one audio-only track
    def hx(s: String) = hexBytesT(s)
    val blob = hx("1A45DFA3" + "8A") ++ // EBML header, content 10
      hx("4282847765626D") ++           // DocType "webm"
      hx("EC8100") ++                   // a Void element, skipped by size
      hx("18538067" + "01FFFFFFFFFFFFFF") ++ // Segment, UNKNOWN size
      hx("1549A966" + "87" + "4489" + "84" + "44BB8000") ++ // Info: float32 1500.0
      hx("1654AE6B" + "8D") ++          // Tracks, content 13
      hx("AE8B" + "838102" + "8686" + "415F464C4143") // audio track, A_FLAC
    val m = Seq(Tuple1(blob)).toDF("w")
      .select(Multimodal.webmMeta($"w").as("m"))
      .select($"m.doc_type", $"m.timescale_ns", $"m.duration_ms", $"m.n_tracks",
        $"m.width", $"m.video_codec", $"m.audio_codec")
      .collect().head
    assert(m.getString(0) == "webm" && m.getLong(1) == 1000000L &&
      m.getLong(2) == 1500L && m.getLong(3) == 1L && m.isNullAt(4) &&
      m.isNullAt(5) && m.getString(6) == "A_FLAC", s"got $m")
    // refusals: junk, truncated element, a size overrunning the buffer
    val good = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.webmHeader(lit(320L), lit(240L), lit(2500L),
        lit("V_VP8"), lit("A_OPUS"))).as[Array[Byte]].head()
    val overrun = good.clone(); overrun(4) = 0xFF.toByte // EBML header size → 127
    Seq("junk bytes here!".getBytes("UTF-8"), good.take(30), overrun).foreach { b =>
      val r = Seq(Tuple1(b)).toDF("w").select(Multimodal.webmMeta($"w")).collect().head
      assert(r.isNullAt(0), s"must refuse, got $r")
    }
  }

  test("oggPages writes real CRC'd pages (independent CRC check) and oggMeta inverts the census; CRC flips and truncation refuse") {
    val ogg = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.oggPages(lit(777), lit(5), nStreams = 2))
      .as[Array[Byte]].head()
    // independent CRC verification of the FIRST page (own implementation)
    val nSegs = ogg(26) & 0xff
    val bodyLen = (0 until nSegs).map(i => ogg(27 + i) & 0xff).sum
    val pageLen = 27 + nSegs + bodyLen
    var crc = 0
    (0 until pageLen).foreach { i =>
      val by = if (i >= 22 && i < 26) 0 else ogg(i) & 0xff
      crc ^= by << 24
      (0 until 8).foreach(_ =>
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04C11DB7 else crc << 1)
    }
    val stored = (0 until 4).map(i => (ogg(22 + i) & 0xff) << (8 * i)).sum
    assert(crc == stored, "page 0 CRC does not verify independently")
    // header fields at the spec offsets: capture pattern, version 0, BOS
    assert(new String(ogg.take(4), "US-ASCII") == "OggS" && ogg(4) == 0)
    assert((ogg(5) & 0x02) != 0, "first page must carry BOS")
    val m = Seq(Tuple1(ogg)).toDF("o")
      .select(Multimodal.oggMeta($"o").as("m"))
      .select($"m.n_pages", $"m.n_streams", $"m.first_serial", $"m.last_granule",
        $"m.payload_bytes")
      .as[(Long, Long, Long, Long, Long)].head()
    // payload = Σ_{i<5}(27 + i%5) = 135 + (0+1+2+3+4) = 145
    assert(m == ((5L, 2L, 777L, 441L * 4, 145L)))
    // CRC flip in the SECOND page refuses the whole census
    val flip = ogg.clone(); flip(pageLen + 30) = (flip(pageLen + 30) ^ 1).toByte
    assert(Seq(Tuple1(flip)).toDF("o").select(Multimodal.oggMeta($"o"))
      .collect().head.isNullAt(0))
    // truncation mid-page refuses
    assert(Seq(Tuple1(ogg.dropRight(3))).toDF("o").select(Multimodal.oggMeta($"o"))
      .collect().head.isNullAt(0))
    // junk refuses
    assert(Seq(Tuple1("OggX junk".getBytes("UTF-8"))).toDF("o")
      .select(Multimodal.oggMeta($"o")).collect().head.isNullAt(0))
  }

  // ---- FLAC frame decode ----

  private def encFlac(pcm: Array[Short], ch: Int, rate: Int,
      blockSize: Int = 1024): Array[Byte] = {
    val le = new Array[Byte](pcm.length * 2)
    pcm.indices.foreach { i =>
      le(2 * i) = (pcm(i) & 0xff).toByte; le(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
    }
    Seq(Tuple1(le)).toDF("p")
      .select(Multimodal.flacEncodePcm16($"p", lit(ch), rate, blockSize))
      .as[Array[Byte]].head()
  }
  private def decFlacWav(b: Array[Byte]): Array[Byte] =
    Seq(Tuple1(b)).toDF("f")
      .select(Multimodal.flacDecodeWav($"f")).as[Array[Byte]].head()
  private def wavSamples(wav: Array[Byte]): Array[Short] =
    Array.tabulate((wav.length - 44) / 2)(i =>
      ((wav(44 + 2 * i) & 0xff) | (wav(45 + 2 * i) << 8)).toShort)

  test("FLAC round-trip: decode(encode(pcm)) is byte-exact — mono/stereo, multi-frame, both end-of-header block-size forms, CONSTANT/VERBATIM/FIXED subframes") {
    val rnd = new scala.util.Random(77)
    val cases = Seq(
      ("mono multi-frame (1024 + 128: 16-bit AND 8-bit bs codes)",
        Array.fill(1152)((rnd.nextInt(65536) - 32768).toShort), 1, 16000),
      ("stereo single frame", Array.fill(1400)((rnd.nextInt(65536) - 32768).toShort), 2, 44100),
      ("constant block (CONSTANT subframe)", Array.fill(300)(1234.toShort), 1, 8000),
      ("two samples (VERBATIM subframe)", Array[Short](-5, 17), 1, 8000),
      ("repeat-heavy (small Rice params)", Array.tabulate(640)(i => ((i / 16) * 100).toShort), 1, 8000))
    for ((name, pcm, ch, rate) <- cases) {
      val flac = encFlac(pcm, ch, rate)
      assert(flac != null, s"$name: encode refused")
      // a genuine FLAC: magic + the census parser reads the true geometry
      val meta = Seq(Tuple1(flac)).toDF("f")
        .select(Multimodal.flacMeta($"f").as("m"))
        .select($"m.sample_rate", $"m.n_channels", $"m.total_samples")
        .as[(Long, Long, Long)].head()
      assert(meta == ((rate.toLong, ch.toLong, (pcm.length / ch).toLong)), name)
      val wav = decFlacWav(flac)
      assert(wav != null, s"$name: decode refused")
      assert(wavSamples(wav).sameElements(pcm), s"$name: samples differ")
      // and the WAV header is the canonical layout the tier consumes
      val wm = Seq(Tuple1(wav)).toDF("w")
        .select(Multimodal.wavMeta($"w").as("m"))
        .select($"m.n_channels", $"m.sample_rate", $"m.bits_per_sample", $"m.data_bytes")
        .as[(Long, Long, Long, Long)].head()
      assert(wm == ((ch.toLong, rate.toLong, 16L, pcm.length * 2L)), name)
    }
  }

  test("a WAV and its FLAC encode hash identically through the audio tier (lossless, same envelope)") {
    val rnd = new scala.util.Random(9)
    val pcm = Array.fill(1152)((rnd.nextInt(65536) - 32768).toShort)
    val wavDirect = wavOf(pcm, 1, 16000)
    val viaFlac = decFlacWav(encFlac(pcm, 1, 16000))
    assert(viaFlac != null && viaFlac.sameElements(wavDirect),
      "FLAC round-trip WAV is not byte-identical to the direct WAV")
  }

  /** FLAC hand-assembly: own bit writer, own CRC implementations —
    * independent of both the production decoder and the fixture encoder,
    * written straight from the published bitstream layout. */
  private object FlacHand {
    def crc8(b: Seq[Byte]): Int =
      b.foldLeft(0) { (c0, x) =>
        var c = c0 ^ (x & 0xff)
        (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
        c
      }
    def crc16(b: Seq[Byte]): Int =
      b.foldLeft(0) { (c0, x) =>
        var c = c0 ^ ((x & 0xff) << 8)
        (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
        c
      }
    final class Bw {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var nb = 0
      def bit(v: Int): Unit = {
        acc = (acc << 1) | (v & 1); nb += 1
        if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
      }
      def bits(v: Long, n: Int): Unit = { var i = n - 1; while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 } }
      def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
      def rice(v: Int, p: Int): Unit = {
        val u = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
        unary((u >>> p).toInt)
        if (p > 0) bits(u & ((1L << p) - 1), p)
      }
      def alignZ(): Unit = while (nb != 0) bit(0)
    }
    def streaminfo(rate: Int, ch: Int, total: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      "fLaC".getBytes("US-ASCII").foreach(o.write(_))
      o.write(0x80); o.write(0); o.write(0); o.write(34)
      o.write(16); o.write(0); o.write(16); o.write(0) // min/max blocksize 4096
      (0 until 6).foreach(_ => o.write(0))
      o.write(rate >> 12); o.write((rate >> 4) & 0xff)
      o.write(((rate & 15) << 4) | ((ch - 1) << 1) | 0) // bits−1=15: top bit 0
      o.write((15 << 4) | 0)
      o.write(total >> 24); o.write((total >> 16) & 0xff)
      o.write((total >> 8) & 0xff); o.write(total & 0xff)
      (0 until 16).foreach(_ => o.write(0))
      o.toByteArray
    }
    /** One frame: blockSize via the 8-bit end-of-header form, frame 0,
      * rate from STREAMINFO, 16-bit samples, given channel assignment. */
    def frame(n: Int, chAssign: Int)(body: Bw => Unit): Array[Byte] = {
      val hdr = Seq(0xFF, 0xF8, (6 << 4) | 0, (chAssign << 4) | (4 << 1), 0, n - 1)
        .map(_.toByte)
      val bw = new Bw
      body(bw)
      bw.alignZ()
      val pre = hdr ++ Seq(crc8(hdr).toByte) ++ bw.out.toByteArray.toSeq
      val c16 = crc16(pre)
      (pre ++ Seq((c16 >> 8).toByte, (c16 & 0xff).toByte)).toArray
    }
  }

  test("FLAC spec vectors: LPC + wasted bits, Rice2 escape + partitions, and all three stereo decorrelations decode to hand-computed PCM") {
    import FlacHand._
    // ---- V1: LPC order 1 (coef 1, shift 0) with ONE wasted bit, mono,
    // n=8. Shifted-domain samples 50..57 (warmup 50, residuals +1);
    // decoder shifts left → 100,102,...,114.
    val v1 = streaminfo(8000, 1, 8) ++ frame(8, 0) { bw =>
      bw.bit(0); bw.bits(0x20L, 6) // LPC order 1 (100000)
      bw.bit(1); bw.unary(0)       // wasted-bits flag, unary 0 → wasted=1
      bw.bits(50L & 0x7fff, 15)    // warmup in eb=15 bits
      bw.bits(1L, 4)               // precision−1 = 1 → 2-bit coefs
      bw.bits(0L, 5)               // shift 0
      bw.bits(1L, 2)               // coef = 1
      bw.bits(0L, 2); bw.bits(0L, 4); bw.bits(1L, 4) // Rice m0, po 0, p=1
      (0 until 7).foreach(_ => bw.rice(1, 1))
    }
    val d1 = decFlacWav(v1)
    assert(d1 != null && wavSamples(d1).sameElements(
      Array.tabulate(8)(i => (100 + 2 * i).toShort)),
      s"LPC+wasted vector decoded ${if (d1 == null) "null" else wavSamples(d1).toSeq}")
    // ---- V2: FIXED order 0, Rice2 (method 1, 5-bit params), partition
    // order 1: partition A escapes to 7-bit raw, partition B is normal
    // Rice2 with p=2 → PCM [3,-3,50,-50, 5,-5,0,10].
    val v2 = streaminfo(8000, 1, 8) ++ frame(8, 0) { bw =>
      bw.bit(0); bw.bits(0x08L, 6); bw.bit(0) // FIXED order 0
      bw.bits(1L, 2)  // residual method 1 (RICE2)
      bw.bits(1L, 4)  // partition order 1 → 2 partitions of 4
      bw.bits(31L, 5) // partition A: escape
      bw.bits(7L, 5)  // raw bits = 7
      Seq(3, -3, 50, -50).foreach(v => bw.bits(v.toLong & 0x7f, 7))
      bw.bits(2L, 5)  // partition B: p=2
      Seq(5, -5, 0, 10).foreach(v => bw.rice(v, 2))
    }
    val d2 = decFlacWav(v2)
    assert(d2 != null && wavSamples(d2).sameElements(
      Array[Short](3, -3, 50, -50, 5, -5, 0, 10)),
      s"Rice2+escape vector decoded ${if (d2 == null) "null" else wavSamples(d2).toSeq}")
    // ---- V3: stereo decorrelations, CONSTANT subframes, n=4. The side
    // channel carries eb=17 bits per the spec.
    def const(bw: Bw, v: Int, eb: Int): Unit = {
      bw.bit(0); bw.bits(0L, 6); bw.bit(0)
      bw.bits(v.toLong & ((1L << eb) - 1), eb)
    }
    // left/side: left=1000, side=100 → right = 900
    val ls = streaminfo(8000, 2, 4) ++ frame(4, 8) { bw =>
      const(bw, 1000, 16); const(bw, 100, 17)
    }
    val dls = decFlacWav(ls)
    assert(dls != null && wavSamples(dls).sameElements(
      Array.fill(4)(Seq(1000, 900)).flatten.map(_.toShort)), "left/side")
    // right/side: side=100 (first), right=900 → left = 1000
    val rs = streaminfo(8000, 2, 4) ++ frame(4, 9) { bw =>
      const(bw, 100, 17); const(bw, 900, 16)
    }
    val drs = decFlacWav(rs)
    assert(drs != null && wavSamples(drs).sameElements(
      Array.fill(4)(Seq(1000, 900)).flatten.map(_.toShort)), "right/side")
    // mid/side: mid=1000, side=2 → left=1001, right=999
    val ms = streaminfo(8000, 2, 4) ++ frame(4, 10) { bw =>
      const(bw, 1000, 16); const(bw, 2, 17)
    }
    val dms = decFlacWav(ms)
    assert(dms != null && wavSamples(dms).sameElements(
      Array.fill(4)(Seq(1001, 999)).flatten.map(_.toShort)), "mid/side")
  }

  test("FLAC refusals: CRC flips, 24-bit profile, truncation, bomb totals, trailing garbage — null, never misparse") {
    val rnd = new scala.util.Random(13)
    val pcm = Array.fill(300)((rnd.nextInt(65536) - 32768).toShort)
    val good = encFlac(pcm, 1, 8000)
    assert(decFlacWav(good) != null)
    // header CRC-8 flip (byte right after the 6-byte frame header at
    // offset 42: magic 4 + STREAMINFO 38)
    val badC8 = good.clone(); badC8(48) = (badC8(48) ^ 0x5a).toByte
    assert(decFlacWav(badC8) == null)
    // frame CRC-16 flip (last two bytes of the stream)
    val badC16 = good.clone(); badC16(badC16.length - 1) = (badC16(badC16.length - 1) ^ 1).toByte
    assert(decFlacWav(badC16) == null)
    // 24-bit STREAMINFO → unsupported (null), even with valid-ish tail
    val hdr24 = Seq(Tuple1(1)).toDF("x")
      .select(Multimodal.flacHeader(lit(8000L), lit(1L), lit(24L), lit(8L)))
      .as[Array[Byte]].head()
    assert(decFlacWav(hdr24 ++ good.drop(42)) == null)
    // truncated mid-frame
    assert(decFlacWav(good.dropRight(7)) == null)
    // trailing garbage after the last frame
    assert(decFlacWav(good ++ Array[Byte](1, 2, 3)) == null)
    // bomb: STREAMINFO total past the cap
    val bomb = good.clone()
    bomb(21) = (bomb(21) | 0x0f).toByte // total-samples high nibble
    assert(decFlacWav(bomb) == null)
    // classifier agreement on the distinctions
    def reasonOf(b: Array[Byte]): String = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(reasonOf(good) == null)
    assert(reasonOf(badC16) == "corrupt")
    assert(reasonOf(hdr24 ++ good.drop(42)) == "unsupported_profile")
    assert(reasonOf(good.take(20)) == "truncated")
    assert(reasonOf(bomb) == "bomb_guard")
  }

  test("audioNearDupFlac pairs identical FLAC clips at hamming 0 through the real frame decode") {
    val rnd = new scala.util.Random(31)
    def clip(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      encFlac(Array.tabulate(1152)(i => ((r2.nextInt(8) * 4000 - 16000) + i % 3).toShort), 1, 16000)
    }
    val rows = Seq(
      (1L, clip(5)), (2L, clip(5)),  // bit-identical pair
      (3L, clip(6)), (4L, clip(7)),
      (5L, "not flac".getBytes("UTF-8"))) // drops at decode
      .toDF("id", "flac")
    val pairs = Multimodal.audioNearDupFlac(rows)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("mp3Meta inverts the builder geometry: all four mono/stereo × Xing variants, syncsafe > 127, ID3v1 tail") {
    val id3 = Array.tabulate(163)(i => (i * 5 & 0x7f).toByte) // crosses 2^7
    def meta(bIdx: Int, rIdx: Int, mono: Boolean, xing: Boolean, nf: Int) = {
      val blob = Seq(Tuple1(id3)).toDF("p")
        .select(Multimodal.mp3Frames($"p", lit(nf), bIdx, rIdx, mono, xing))
        .as[Array[Byte]].head()
      Seq(Tuple1(blob)).toDF("b").select(Multimodal.mp3Meta($"b").as("m"))
        .select($"m.version", $"m.layer", $"m.bitrate_kbps", $"m.sample_rate",
          $"m.n_channels", $"m.n_frames", $"m.duration_ms")
        .as[(String, Int, Int, Int, Int, Int, Long)].head()
    }
    assert(meta(9, 0, mono = true, xing = true, 7) ==
      (("1", 3, 128, 44100, 1, 7, 7L * 1152 * 1000 / 44100)))
    assert(meta(5, 1, mono = false, xing = false, 3) ==
      (("1", 3, 64, 48000, 2, 3, 3L * 1152 * 1000 / 48000)))
    assert(meta(14, 2, mono = false, xing = true, 12) ==
      (("1", 3, 320, 32000, 2, 12, 12L * 1152 * 1000 / 32000)))
    // the Xing frame count surfaces only when the header is present
    val withX = Seq(Tuple1(id3)).toDF("p")
      .select(Multimodal.mp3Frames($"p", lit(5), 9, 0, mono = true, xing = true))
      .as[Array[Byte]].head()
    val noX = Seq(Tuple1(id3)).toDF("p")
      .select(Multimodal.mp3Frames($"p", lit(5), 9, 0, mono = true))
      .as[Array[Byte]].head()
    def xf(b: Array[Byte]): Option[Long] = {
      val r = Seq(Tuple1(b)).toDF("b").select(Multimodal.mp3Meta($"b").as("m"))
        .select($"m.xing_frames").collect().head
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    assert(xf(withX).contains(5L) && xf(noX).isEmpty)
  }

  test("MP3 hand vectors: MPEG2/2.5, Layer I/II lengths, free-format and reserved refusals, bare streams") {
    def meta(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
      val r = Seq(Tuple1(b)).toDF("b").select(Multimodal.mp3Meta($"b").as("m"))
        .select($"m.version", $"m.layer", $"m.bitrate_kbps", $"m.sample_rate",
          $"m.duration_ms").collect().head
      if (r.isNullAt(0)) None
      else Some((r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    }
    def frame(b1: Int, b2: Int, b3: Int, len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte; f(1) = b1.toByte; f(2) = b2.toByte; f(3) = b3.toByte
      f
    }
    // MPEG2 Layer III, 8 kbps idx 1, 16 kHz idx 2: len = 72000·8/16000
    // = 36; 576 samples → 36 ms (hand-computed)
    val v2 = frame(0xF3, (1 << 4) | (2 << 2), 0xC0, 36)
    assert(meta(v2).contains(("2", 3, 8, 16000, 36L)))
    // MPEG2.5 Layer III, 24 kbps idx 3, 11025 Hz idx 0: len =
    // 72000·24/11025 = 156 (floor); 576 samples → 52 ms (floor)
    val v25 = frame(0xE3, (3 << 4) | (0 << 2), 0xC0, 156)
    assert(meta(v25).contains(("2.5", 3, 24, 11025, 576L * 1000 / 11025)))
    // MPEG1 Layer II, 48 kbps idx 2, 44100 Hz: len = 144000·48/44100
    // = 156 (floor); 1152 samples
    val l2 = frame(0xFD, (2 << 4) | (0 << 2), 0xC0, 156)
    assert(meta(l2).contains(("1", 2, 48, 44100, 1152L * 1000 / 44100)))
    // MPEG1 Layer I, 32 kbps idx 1, 44100 Hz: len = (12000·32/44100)·4
    // = 32 (the ×4 slot formula); 384 samples
    val l1 = frame(0xFF, (1 << 4) | (0 << 2), 0xC0, 32)
    assert(meta(l1).contains(("1", 1, 32, 44100, 384L * 1000 / 44100)))
    // two contiguous frames sum their samples (bare stream, no ID3)
    assert(meta(v2 ++ v2).contains(("2", 3, 8, 16000, 72L)))
    // free-format (bitrate idx 0), reserved version (bits 01), reserved
    // rate (idx 3), a frame cut mid-payload, and trailing non-ID3v1
    // garbage all refuse — null, never a misparse
    assert(meta(frame(0xF3, 0 << 4 | 2 << 2, 0xC0, 36)).isEmpty)
    assert(meta(frame(0xEB, 1 << 4 | 2 << 2, 0xC0, 36)).isEmpty)
    assert(meta(frame(0xF3, 1 << 4 | 3 << 2, 0xC0, 36)).isEmpty)
    assert(meta(v2.dropRight(5)).isEmpty)
    assert(meta(v2 ++ Array[Byte](1, 2, 3)).isEmpty)
    // version/layer switching mid-stream refuses
    assert(meta(v2 ++ l2).isEmpty)
  }

  test("oggIdent: chained streams skip unrecognized BOS pages, pre-skip clamps, damage refuses") {
    def ident(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
      val r = Seq(Tuple1(b)).toDF("b").select(Multimodal.oggIdent($"b").as("m"))
        .select($"m.codec", $"m.n_channels", $"m.sample_rate", $"m.duration_ms")
        .collect().head
      if (r.isNullAt(0)) None
      else Some((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    def blob(c: org.apache.spark.sql.Column): Array[Byte] =
      Seq(Tuple1(1)).toDF("x").select(c).as[Array[Byte]].head()
    // a chained file: an unrecognized filler stream first, then the
    // Vorbis stream — identification must skip the filler BOS and bind
    // duration to the VORBIS stream's granules (5 pages → 441·4)
    val filler = blob(Multimodal.oggPages(lit(900), lit(2), nStreams = 1))
    val vorbis = blob(Multimodal.oggAudio(lit(901), lit(5), "vorbis", 2, 44100))
    assert(ident(filler ++ vorbis).contains(
      ("vorbis", 2L, 44100L, 441L * 4 * 1000 / 44100)))
    // Opus pre-skip beyond the final granule clamps duration to 0, per
    // the mapping (granules count 48 kHz samples less pre-skip)
    val opus = blob(Multimodal.oggAudio(lit(7), lit(2), "opus", 1, 48000,
      preskip = 1000))
    assert(ident(opus).contains(("opus", 1L, 48000L, 0L)))
    // a flipped CRC bit refuses the whole walk (the OggMeta contract)
    val bad = blob(Multimodal.oggAudio(lit(8), lit(3), "vorbis", 1, 8000))
    bad(22) = (bad(22) ^ 1).toByte
    assert(ident(bad).isEmpty)
    // a Vorbis ident with a nonzero version field is not identified —
    // re-CRC the patched BOS page so the refusal is the VERSION check,
    // not the checksum
    val v1 = blob(Multimodal.oggAudio(lit(9), lit(3), "vorbis", 1, 8000))
    v1(28 + 7) = 1 // BOS body begins at 28; version u32le at body+7
    locally {
      val pageLen = 27 + 1 + 30
      var crc = 0
      (0 until pageLen).foreach { i =>
        val by = if (i >= 22 && i < 26) 0 else v1(i) & 0xff
        crc ^= by << 24
        (0 until 8).foreach { _ =>
          crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04C11DB7 else crc << 1
        }
      }
      (0 until 4).foreach(k => v1(22 + k) = ((crc >> (8 * k)) & 0xff).toByte)
    }
    assert(ident(v1).isEmpty)
    // filler-only streams carry no recognized audio → null
    assert(ident(filler).isEmpty)
  }

  test("wavCanonical normalizes every builder profile to the identical canonical PCM16 bytes") {
    val pcm = Array.tabulate(100)(i => ((i * 331 - 16000) % 32768).toShort)
    val pcmBytes = new Array[Byte](200)
    pcm.indices.foreach { i =>
      pcmBytes(2 * i) = (pcm(i) & 0xff).toByte
      pcmBytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
    }
    val canon = wavOf(pcm, 1, 16000)
    // pcm24/pcm32/float32/extensible/fmt18 are exact; pcm8 quantizes to
    // the top byte
    for (p <- Seq("pcm24", "pcm32", "float32", "extensible", "fmt18")) {
      val blob = Seq(Tuple1(pcmBytes)).toDF("b")
        .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, p))
        .as[Array[Byte]].head()
      val got = Seq(Tuple1(blob)).toDF("b")
        .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(got, canon), s"profile $p")
      // and the stats/envelope tier consumes the profile directly (the
      // internal canonicalization seam)
      val st = Seq(Tuple1(blob)).toDF("b")
        .select(Multimodal.wavPcm16Stats($"b").getField("n_samples"))
        .as[Long].head()
      assert(st == 100L, s"stats through $p")
    }
    val p8 = Seq(Tuple1(pcmBytes)).toDF("b")
      .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, "pcm8"))
      .as[Array[Byte]].head()
    val got8 = Seq(Tuple1(p8)).toDF("b")
      .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    val want8 = wavOf(pcm.map(s => ((s >> 8) << 8).toShort), 1, 16000)
    assert(java.util.Arrays.equals(got8, want8))
    // already-canonical payloads pass through byte-identical
    val self = Seq(Tuple1(canon)).toDF("b")
      .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(self, canon))
  }

  test("G.711 hand anchors: the published A-law/mu-law extreme and zero codes expand exactly") {
    // the four corners every G.711 table agrees on: mu-law 0xFF→0,
    // 0x00→−32124, 0x80→+32124; A-law 0x55→−8, 0xD5→+8, 0x2A→−32256,
    // 0xAA→+32256
    def decode(profile: String, codes: Array[Byte]): Seq[Int] = {
      val blob = Seq(Tuple1(codes)).toDF("b")
        .select(Multimodal.wavProfileEncode($"b", lit(1), 8000, profile))
        .as[Array[Byte]].head()
      val canon = Seq(Tuple1(blob)).toDF("b")
        .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
      codes.indices.map(i =>
        ((canon(44 + 2 * i) & 0xff) | (canon(45 + 2 * i) << 8)).toShort.toInt)
    }
    assert(decode("mulaw", Array[Byte](0xFF.toByte, 0x7F, 0x00, 0x80.toByte)) ==
      Seq(0, 0, -32124, 32124))
    assert(decode("alaw", Array[Byte](0x55, 0xD5.toByte, 0x2A, 0xAA.toByte)) ==
      Seq(-8, 8, -32256, 32256))
  }

  test("float32 WAV hand vectors: clamp, NaN, and half-even rounding at the int16 boundary") {
    // builder output for 6 samples, then the 6 float words at the spec
    // data offset (58) patched to hand-chosen IEEE bit patterns
    val blob = Seq(Tuple1(new Array[Byte](12))).toDF("b")
      .select(Multimodal.wavProfileEncode($"b", lit(1), 8000, "float32"))
      .as[Array[Byte]].head()
    val words = Array(
      0x40000000, // +2.0  → clamps to 32767
      0xC0000000, // −2.0  → clamps to −32768
      0x7FC00000, // NaN   → 0
      0x3E800000, // 0.25  → 8192 exactly
      0x37800000, // 2⁻¹⁶  → ·32768 = 0.5 → rint half-even → 0
      0x38400000) // 3·2⁻¹⁶ → 1.5 → rint half-even → 2
    words.indices.foreach { i =>
      val o = 58 + 4 * i
      blob(o) = (words(i) & 0xff).toByte
      blob(o + 1) = ((words(i) >> 8) & 0xff).toByte
      blob(o + 2) = ((words(i) >> 16) & 0xff).toByte
      blob(o + 3) = ((words(i) >>> 24) & 0xff).toByte
    }
    val got = Seq(Tuple1(blob)).toDF("b")
      .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    val samples = (0 until 6).map(i =>
      ((got(44 + 2 * i) & 0xff) | (got(45 + 2 * i) << 8)).toShort)
    assert(samples == Seq[Short](32767, -32768, 0, 8192, 0, 2))
  }

  test("stereo IMA ADPCM hand vector: per-channel headers, 4-byte word interleave, isolated state") {
    // one block, blockAlign 16: ch0 header (pred 100, idx 0), ch1 header
    // (pred −50, idx 88), then one all-zero-nibble word per channel.
    // Nibble 0 adds step>>3 and steps the index down by 1, so ch0 stays
    // flat (step 7 >> 3 = 0) while ch1 climbs by the hand-computed
    // deltas 4095, 3724, 3385, 3077, 2798, 2543, 2312, 2102.
    val hdr = hexBytesT("52494646" + "34000000" + "57415645666D7420" + "10000000" +
      "1100" + "0200" + "401F0000" + "803E0000" + "1000" + "0400" +
      "64617461" + "10000000" +
      "64000000" + "CEFF5800" + "00000000" + "00000000")
    val got = Seq(Tuple1(hdr)).toDF("b")
      .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    assert(got != null, "stereo ADPCM did not decode")
    val n = (0 until 18).map(i =>
      ((got(44 + 2 * i) & 0xff) | (got(45 + 2 * i) << 8)).toShort.toInt)
    val ch1 = Seq(-50, 4045, 7769, 11154, 14231, 17029, 19572, 21884, 23986)
    val expect = (0 until 9).flatMap(k => Seq(100, ch1(k)))
    assert(n == expect)
  }

  test("WAV profile refusals and classifier honesty: GSM, bad geometry, 3 channels, cut chunks") {
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val pcmBytes = Array.tabulate(200)(i => (i * 7).toByte)
    def blob(p: String): Array[Byte] = Seq(Tuple1(pcmBytes)).toDF("b")
      .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, p))
      .as[Array[Byte]].head()
    // decodable profiles classify null — the tier's graduation
    for (p <- Seq("pcm8", "pcm24", "float32", "float64", "extensible",
      "fmt18", "alaw", "mulaw"))
      assert(reason(blob(p)) == null, s"profile $p should decode")
    // format-tag surgery at the spec offsets → honest refusals
    val ms = blob("fmt18"); ms(20) = 2 // tag 2 at 16 bits: not MS-ADPCM's 4
    assert(reason(ms) == "unsupported_profile")
    val gsm = blob("fmt18"); gsm(20) = 0x31 // GSM 6.10
    assert(reason(gsm) == "unsupported_profile")
    // bits 32 → 64 WITHOUT fixing blockAlign: float64 itself decodes
    // now, so a mismatched blockAlign is structural damage, not a
    // profile refusal
    val f64 = blob("float32"); f64(34) = 64
    assert(reason(f64) == "corrupt")
    val tri = blob("fmt18"); tri(22) = 3 // 3 channels
    assert(reason(tri) == "unsupported_profile")
    // the EXTENSIBLE GUID dispatch: a non-PCM SubFormat refuses
    val guid = blob("extensible"); guid(44) = 6 // GUID tag byte → A-law
    assert(reason(guid) == "unsupported_profile")
    // a data chunk whose size runs past the payload → truncated
    assert(reason(blob("fmt18").dropRight(10)) == "truncated")
    // a clean chunk walk that ends without fmt/data → corrupt; an
    // unknown chunk whose size overruns the payload → truncated
    assert(reason(hexBytesT("5249464640000000" + "57415645" +
      "4A554E4B" + "34000000" + "00" * 52)) == "corrupt")
    assert(reason(hexBytesT("5249464640000000" + "57415645" +
      "4A554E4B" + "FF000000" + "00" * 20)) == "truncated")
  }

  test("MS-ADPCM hand vectors: coefficient prediction, truncating /256, adaptation floor — decoded samples match hand arithmetic") {
    def samples(wav: Array[Byte]): Seq[Int] = {
      val c = Seq(Tuple1(wav)).toDF("b")
        .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
      (0 until (c.length - 44) / 2).map(i =>
        ((c(44 + 2 * i) & 0xff) | (c(45 + 2 * i) << 8)).toShort.toInt)
    }
    // one block, blockAlign 8 (1 nibble byte), initPred 0: predictor
    // pair (256, 0), iDelta 16, seeds −30000/−30000; nibbles HIGH-first
    // from 0x12 → 1 then 2:
    //   pred = trunc(−30000·256/256) = −30000 → v = −29984; delta stays
    //   floored at 16 → next pred −29984 → v = −29952
    val ms1 = Seq(Tuple1(Array[Byte](0x12))).toDF("n")
      .select(Multimodal.msAdpcmWav($"n", lit(0), 8000, 8)).as[Array[Byte]].head()
    assert(samples(ms1) == Seq(-30000, -30000, -29984, -29952))
    // initPred 1: pair (512, −256) exercises the NEGATIVE second
    // coefficient and exact /256 divisions; iDelta 47, seeds
    // −29869/−29827; nibbles from 0x8F → −8 then −1:
    //   pred = (−29869·512 + 29827·256)/256 = −29911 → v = −30287,
    //   delta → (768·47)>>8 = 141 → pred −30705 → v = −30846
    val ms2 = Seq(Tuple1(Array[Byte](0x8F.toByte))).toDF("n")
      .select(Multimodal.msAdpcmWav($"n", lit(1), 8000, 8)).as[Array[Byte]].head()
    assert(samples(ms2) == Seq(-29827, -29869, -30287, -30846))
    // float64: s/32768 is exact in IEEE double → canonicalization is
    // the identity on the planted PCM16
    val pcm = Array.tabulate(96)(i => ((i * 173 + 7) & 0xff).toByte)
    val f64 = Seq(Tuple1(pcm)).toDF("b")
      .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, "float64"))
      .as[Array[Byte]].head()
    val canon = Seq(Tuple1(f64)).toDF("b")
      .select(Multimodal.wavCanonical($"b")).as[Array[Byte]].head()
    assert(canon.drop(44).toSeq == pcm.toSeq)
    // a fact chunk one sample short trims the padded final block —
    // the ADVICE-r13 walk fix means it is honored even AFTER data
    // (patch the fixture's fact value: RIFF(12) + fmt(8+50) + fact at
    // 70, value at 78)
    val msT = Seq(Tuple1(Array[Byte](0x12, 0x34))).toDF("n")
      .select(Multimodal.msAdpcmWav($"n", lit(0), 8000, 8)).as[Array[Byte]].head()
    assert((msT(70 + 8) & 0xff) == 8, "fact layout moved; fix the patch offset")
    val trimmed = msT.clone(); trimmed(70 + 8) = 7
    assert(samples(trimmed).length == 7)
  }

  test("realCodec and decodeDropReason AGREE on decodability across the full planted battery") {
    // the invariant the drop report exists for: a payload it counts
    // dropped must be one the default codec path cannot decode, and vice
    // versa. One documented divergence class stays out of the battery:
    // a valid PCM WAV shorter than the 72-bucket envelope (the PAYLOAD
    // decodes — classifier null — but that one consumer needs ≥72
    // samples), which is a consumer constraint, not decodability.
    val grayPx = Array.tabulate(72)(i => ((i * 37 + 11) & 0xff).toByte)
    val png = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = 0, stored = true))
      .as[Array[Byte]].head()
    val pngColor = Seq(Tuple1(rgbPix(72, 4))).toDF("px")
      .select(Multimodal.pngEncodeRgb($"px", lit(9), filterMode = -1, stored = false,
        alpha = true)).as[Array[Byte]].head()
    val jpeg = Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9))).as[Array[Byte]].head()
    val wav = wavOf(Array.tabulate(144)(i => (i * 100).toShort), 1, 8000)
    val avi = encAvi(Seq(jpeg), 9, 8)
    val mp4 = encMp4(Seq(jpeg), 9, 8)
    val webpGood = Seq(Tuple1(rgbPix(72, 3))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(9))).as[Array[Byte]].head()
    // gray+alpha DECODES now — the unsupported plant is a spec-illegal
    // (type, depth) pair: gray+alpha at depth 4
    val grayAlphaPng = png.clone(); grayAlphaPng(24) = 4; grayAlphaPng(25) = 4
    val bombPng = png.clone()
    bombPng(16) = 0x07; bombPng(17) = 0xFF.toByte; bombPng(18) = 0xFF.toByte; bombPng(19) = 0xFF.toByte
    val lossyWebp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++
      (Array[Byte](10, 0, 0, 0, 1) ++ new Array[Byte](9)) // inter frame
    val junkAvi = Seq(Tuple1(Seq(png))).toDF("f")
      .select(Multimodal.aviMjpegEncode($"f", 9, 8)).as[Array[Byte]].head()
    val battery: Seq[(String, Array[Byte])] = Seq(
      "png" -> png, "pngColor" -> pngColor, "jpeg" -> jpeg, "wav" -> wav,
      "avi" -> avi, "mp4" -> mp4, "webp" -> webpGood,
      "junk" -> "garbage payload bytes".getBytes("UTF-8"),
      "cutPng" -> png.take(40), "grayAlphaPng" -> grayAlphaPng, "bombPng" -> bombPng,
      "wav8bit" -> wavOf(Array.tabulate(144)(i => (i * 100).toShort), 1, 8000).clone()
        .patch(34, Array[Byte](8, 0), 2).toArray,
      "lossyWebp" -> lossyWebp, "cutWebp" -> webpGood.take(24),
      "cutAvi" -> avi.take(avi.length - 9), "junkFramesAvi" -> junkAvi,
      "cutMp4" -> mp4.take(40),
      "avc1Mp4" -> encMp4(Seq(jpeg), 9, 8, format = "avc1"),
      "gif" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.gifEncodeGray8($"px", lit(9), interlace = true))
        .as[Array[Byte]].head(),
      "cutGif" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.gifEncodeGray8($"px", lit(9))).as[Array[Byte]].head().take(20),
      "noPaletteGif" -> hexBytesT(
        "474946383961040001007000002C00000000040001000002012C003B"),
      "bombGif" -> hexBytesT("474946383961FFFFFFFF7000002C00000000FFFFFFFF003B"),
      "id3Mp3" -> ("ID3".getBytes("US-ASCII") ++ Array.fill(12)(9.toByte)),
      "ogg" -> ("OggS".getBytes("US-ASCII") ++ Array.fill(12)(9.toByte)),
      "tiff" -> (hexBytesT("49492A00") ++ Array.fill(12)(9.toByte)),
      "bmp" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.bmpEncodeGray8($"px", lit(9), topDown = true))
        .as[Array[Byte]].head(),
      "tiffLe" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head(),
      "tiffBe" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(9), bigEndian = true))
        .as[Array[Byte]].head(),
      "cutTiff" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
        .dropRight(8),
      "cutBmp" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.bmpEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
        .dropRight(8),
      "rleBmp" -> hexBytesT("424D760400000000000036040000280000000400000002000000" +
        "01000800010000000000000000000000000000000000000000000000"),
      "pal8" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.pngEncodePal8($"px", lit(9), trns = true))
        .as[Array[Byte]].head(),
      "pal8Adam7" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.pngEncodePal8($"px", lit(9), interlace = true))
        .as[Array[Byte]].head(),
      // palette PNG with its PLTE chunk (fixed 780 bytes at offset 33)
      // spliced out: header in contract, decode must fail → corrupt
      "pal8NoPlte" -> {
        val ok = Seq(Tuple1(grayPx)).toDF("px")
          .select(Multimodal.pngEncodePal8($"px", lit(9)))
          .as[Array[Byte]].head()
        ok.take(33) ++ ok.drop(33 + 780)
      },
      "jpegProg" -> Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
        .select(Multimodal.jpegEncodeGray8Prog($"px", lit(9)))
        .as[Array[Byte]].head(),
      "flacGood" -> encFlac(Array.tabulate(144)(i => (i * 100).toShort), 1, 8000),
      // 24-bit profile: recognized, undecodable → unsupported_profile
      "flac24" -> (Seq(Tuple1(1)).toDF("x")
        .select(Multimodal.flacHeader(lit(8000L), lit(1L), lit(24L), lit(144L)))
        .as[Array[Byte]].head() ++ Array.fill(24)(9.toByte)),
      // 16-bit STREAMINFO with junk where frames should be → corrupt
      "flacJunkFrames" -> (Seq(Tuple1(1)).toDF("x")
        .select(Multimodal.flacHeader(lit(8000L), lit(1L), lit(16L), lit(144L)))
        .as[Array[Byte]].head() ++ Array.fill(24)(9.toByte)),
      // 8-bit SOF1 decodes since r14 and 12-BIT since r15 (relabeling
      // the precision byte makes a VALID 12-bit file) — the battery's
      // two-sided check now holds this entry on the DECODES side
      "jpegSof1at12" -> {
        val ok = Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
          .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9)))
          .as[Array[Byte]].head()
        val sof = (0 until ok.length - 1).find(i =>
          (ok(i) & 0xff) == 0xFF && (ok(i + 1) & 0xff) == 0xC0).get
        val m = ok.clone(); m(sof + 1) = 0xC1.toByte; m(sof + 4) = 12; m
      },
      // 8-bit SOF1 relabel of a sequential stream: must DECODE
      "jpegSof1at8" -> {
        val ok = Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
          .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9)))
          .as[Array[Byte]].head()
        val sof = (0 until ok.length - 1).find(i =>
          (ok(i) & 0xff) == 0xFF && (ok(i + 1) & 0xff) == 0xC0).get
        val m = ok.clone(); m(sof + 1) = 0xC1.toByte; m
      },
      // r14 graduations: each must DECODE through the default codec
      // path (the battery's two-sided agreement makes a silent
      // classifier/codec split impossible)
      "tiffG4" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(9))).as[Array[Byte]].head(),
      "tiffG3mh" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.tiffG4Encode($"px", lit(9), coding = "mh")).as[Array[Byte]].head(),
      "tiffJpeg7" -> Seq(Tuple1(jpeg)).toDF("j")
        .select(Multimodal.tiffJpegEncode($"j", split = true)).as[Array[Byte]].head(),
      "msAdpcm" -> Seq(Tuple1(Array.tabulate(42)(i => (i * 13).toByte))).toDF("n")
        .select(Multimodal.msAdpcmWav($"n", lit(7), 8000, 28)).as[Array[Byte]].head(),
      "wavF64" -> Seq(Tuple1(Array.tabulate(200)(i => (i * 7).toByte))).toDF("b")
        .select(Multimodal.wavProfileEncode($"b", lit(1), 16000, "float64"))
        .as[Array[Byte]].head(),
      "bmpPng" -> Seq(Tuple1(png)).toDF("s")
        .select(Multimodal.bmpEncodeStream($"s", png = true)).as[Array[Byte]].head(),
      "bmpJpeg" -> Seq(Tuple1(jpeg)).toDF("s")
        .select(Multimodal.bmpEncodeStream($"s", png = false)).as[Array[Byte]].head(),
      // r15 graduations: each must DECODE two-sidedly
      "vp8Lossy" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.webpEncodeVp8($"px", lit(9), nparts = 2))
        .as[Array[Byte]].head(),
      "vp8Real" -> Vp8Vectors.vp8Webp_simple, // a real libwebp stream
      "jpeg12" -> Seq(Tuple1(Array.fill(9 * 8)(33.toByte))).toDF("px")
        .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9), deep = true))
        .as[Array[Byte]].head(),
      "bmpOs2" -> Seq(Tuple1(grayPx)).toDF("px")
        .select(Multimodal.bmpEncodeGray8($"px", lit(9), os2 = true))
        .as[Array[Byte]].head(),
      "tiffCmyk" -> Seq(Tuple1(Array.tabulate(288)(i => (i * 31).toByte))).toDF("px")
        .select(Multimodal.tiffEncodeDeep($"px", lit(9), mode = "cmyk8"))
        .as[Array[Byte]].head(),
      "tiny" -> Array[Byte](1, 2))
    battery.foreach { case (name, b) =>
      val decodes = Multimodal.realCodec(b).isDefined
      val reason = Seq(Tuple1(b)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      val dropped = !reason.isNullAt(0)
      assert(decodes != dropped,
        s"$name: realCodec decodes=$decodes but drop reason=" +
          s"${if (dropped) reason.getString(0) else "null"}")
    }
  }

  test("decoder fuzz battery: seeded mutations of EVERY format never throw — realCodec and the classifier stay total") {
    // crawl bytes are adversarial by default; the codec boundary and the
    // drop classifier must be total functions over arbitrary payloads.
    // 60 seeded mutations per format (byte flips into headers/tables/
    // payload, truncations at every depth, flip+cut combos).
    val grayPx = Array.fill(72)(33.toByte)
    val png = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = -1, stored = false))
      .as[Array[Byte]].head()
    val pngColor = Seq(Tuple1(rgbPix(72, 4))).toDF("px")
      .select(Multimodal.pngEncodeRgb($"px", lit(9), filterMode = -1, stored = false,
        alpha = true)).as[Array[Byte]].head()
    val jpeg = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(9))).as[Array[Byte]].head()
    val wav = wavOf(Array.tabulate(144)(i => (i * 100).toShort), 1, 8000)
    val avi = encAvi(Seq(jpeg), 9, 8)
    val mp4 = encMp4(Seq(jpeg), 9, 8)
    val webp = Seq(Tuple1(rgbPix(72, 3))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(9))).as[Array[Byte]].head()
    val gif = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.gifEncodeGray8($"px", lit(9), interlace = true))
      .as[Array[Byte]].head()
    val bmp = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.bmpEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    val tiff = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.tiffEncodeGray8($"px", lit(9))).as[Array[Byte]].head()
    val pal8 = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.pngEncodePal8($"px", lit(9), interlace = true, trns = true))
      .as[Array[Byte]].head()
    val jpegProg = Seq(Tuple1(grayPx)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Prog($"px", lit(9))).as[Array[Byte]].head()
    val flac = encFlac(Array.tabulate(256)(i => (i * 257 - 32768).toShort), 2, 16000)
    // the round-13 tiers: compressed/tiled/deep TIFF, RLE BMP, deep
    // PNG, the WAV profile zoo, ADPCM, MP3 and Ogg-audio streams
    def one(c: org.apache.spark.sql.Column): Array[Byte] =
      Seq(Tuple1(1)).toDF("x").select(c).as[Array[Byte]].head()
    val grayCol = lit(grayPx)
    val tiffLzw = one(Multimodal.tiffEncodeGray8(grayCol, lit(9),
      lzw = true, predictor = true))
    val tiffPal = one(Multimodal.tiffEncodeDeep(grayCol, lit(9)))
    val tiff16 = one(Multimodal.tiffEncodeDeep(grayCol, lit(9), mode = "gray16"))
    val tiffTiled = one(Multimodal.tiffEncodeDeep(grayCol, lit(9), mode = "tiles8"))
    val bmpRle = one(Multimodal.bmpEncodeGray8(grayCol, lit(9), rle = true))
    val pngDeep = one(Multimodal.pngEncodeGrayDeep(
      lit(grayPx.map(v => ((v & 0xff) % 4).toByte)), lit(9), 2, filterMode = -1))
    val pngGa = one(Multimodal.pngEncodeGrayDeep(grayCol, lit(9), 16,
      grayAlpha = true))
    val pcm = Array.tabulate(144)(i => ((i * 100) & 0xff).toByte)
    val wavF32 = one(Multimodal.wavProfileEncode(lit(pcm), lit(1), 8000, "float32"))
    val wavExt = one(Multimodal.wavProfileEncode(lit(pcm), lit(1), 8000, "extensible"))
    val adpcm = one(Multimodal.imaAdpcmWav(lit(Array.tabulate(48)(i => (i * 11).toByte)),
      lit(17), 8000, 28))
    val mp3 = one(Multimodal.mp3Frames(lit(Array.fill(20)(3.toByte)), lit(4), 9, 0,
      mono = true, xing = true))
    val oggV = one(Multimodal.oggAudio(lit(77), lit(4), "vorbis", 2, 44100))
    val oggO = one(Multimodal.oggAudio(lit(78), lit(3), "opus", 1, 48000, preskip = 312))
    // the round-14 tiers: CCITT G4 (single- and multi-strip) and
    // new-JPEG Compression 7 (full and JPEGTables-split)
    val tiffG4 = one(Multimodal.tiffG4Encode(grayCol, lit(9)))
    val tiffG4ms = one(Multimodal.tiffG4Encode(
      lit(Array.tabulate(72)(i => if (i % 3 == 0) 0.toByte else -1.toByte)),
      lit(9), rowsPerStrip = 3))
    val tiffG3 = one(Multimodal.tiffG4Encode(grayCol, lit(9), coding = "mh"))
    val tiffT4 = one(Multimodal.tiffG4Encode(grayCol, lit(9), coding = "t4"))
    val tiffT42d = one(Multimodal.tiffG4Encode(grayCol, lit(9), coding = "t42d"))
    val tiffGray4 = one(Multimodal.tiffEncodeDeep(grayCol, lit(9), mode = "gray4"))
    val tiffPal4 = one(Multimodal.tiffEncodeDeep(grayCol, lit(9), mode = "pal4"))
    val tiffRgba = one(Multimodal.tiffEncodeDeep(
      lit(Array.tabulate(288)(i => (i * 29).toByte)), lit(9), mode = "rgba8"))
    val tiffJpeg = one(Multimodal.tiffJpegEncode(lit(jpeg)))
    val tiffJpegSplit = one(Multimodal.tiffJpegEncode(lit(jpeg), split = true))
    val msAdpcm = one(Multimodal.msAdpcmWav(
      lit(Array.tabulate(42)(i => (i * 13).toByte)), lit(7), 8000, 28))
    val wavF64 = one(Multimodal.wavProfileEncode(lit(pcm), lit(1), 8000, "float64"))
    val bmp565 = one(Multimodal.bmpEncodeDeep(grayCol, lit(9), "bf565"))
    val bmp8888 = one(Multimodal.bmpEncodeDeep(grayCol, lit(9), "bf8888"))
    val bmpPal2 = one(Multimodal.bmpEncodeDeep(grayCol, lit(9), "pal2"))
    val bmpPngEmb = one(Multimodal.bmpEncodeStream(lit(png), png = true))
    val bmpJpgEmb = one(Multimodal.bmpEncodeStream(lit(jpeg), png = false))
    // the round-15 tiers: lossy VP8 (fixture + a REAL libwebp stream),
    // 12-bit JPEG, OS/2 V2 BMP, CMYK TIFF
    val webpVp8 = one(Multimodal.webpEncodeVp8(grayCol, lit(9), nparts = 2))
    val webpVp8Real = Vp8Vectors.vp8Webp_q75
    val jpeg12 = one(Multimodal.jpegEncodeGray8Dc(grayCol, lit(9), deep = true))
    val bmpOs2 = one(Multimodal.bmpEncodeGray8(grayCol, lit(9), os2 = true))
    val tiffCmyk = one(Multimodal.tiffEncodeDeep(
      lit(Array.tabulate(288)(i => (i * 31).toByte)), lit(9), mode = "cmyk8"))
    val rnd = new scala.util.Random(90210)
    val mutated: Seq[Array[Byte]] =
      Seq(png, pngColor, jpeg, wav, avi, mp4, webp, gif, bmp, tiff, pal8, jpegProg,
        flac, tiffLzw, tiffPal, tiff16, tiffTiled, bmpRle, pngDeep, pngGa,
        wavF32, wavExt, adpcm, mp3, oggV, oggO,
        tiffG4, tiffG4ms, tiffG3, tiffT4, tiffT42d, tiffJpeg, tiffJpegSplit, msAdpcm, wavF64,
        bmp565, bmp8888, bmpPal2, tiffGray4, tiffPal4, tiffRgba,
        bmpPngEmb, bmpJpgEmb,
        webpVp8, webpVp8Real, jpeg12, bmpOs2, tiffCmyk).flatMap { base =>
        (0 until 60).map { i =>
          i % 3 match {
            case 0 =>
              val m = base.clone()
              (0 to rnd.nextInt(4)).foreach(_ =>
                m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
              m
            case 1 => base.take(rnd.nextInt(base.length + 1))
            case _ =>
              val cut = base.take(1 + rnd.nextInt(base.length))
              if (cut.length > 4)
                cut(rnd.nextInt(cut.length)) = rnd.nextInt(256).toByte
              cut
          }
        }
      }
    // codec totality, driver-side (the same code a mapPartitions task runs)
    mutated.foreach(b => Multimodal.realCodec(b)) // must not throw
    // classifier totality through the expression path, one job
    val reasons = mutated.map(Tuple1(_)).toDF("b")
      .select(graft.functions.Native.decodeDropReason($"b")).collect()
    assert(reasons.length == mutated.length)
    // the census/normalization expressions are total too — one job over
    // every mutation, all four surfaces at once
    val censuses = mutated.map(Tuple1(_)).toDF("b")
      .select(Multimodal.wavCanonical($"b"), Multimodal.mp3Meta($"b"),
        Multimodal.oggIdent($"b"), Multimodal.tiffDecodeLuma($"b"))
      .collect()
    assert(censuses.length == mutated.length)
  }

  test("webpDecodeLuma never throws under seeded mutation/truncation fuzz") {
    val base = Seq(Tuple1(rgbPix(13 * 7, 3))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(13))).as[Array[Byte]].head()
    val rnd = new scala.util.Random(4242)
    var decoded = 0; var refused = 0
    (0 until 400).foreach { i =>
      val b: Array[Byte] = i % 3 match {
        case 0 => // flip 1-4 bytes anywhere (headers, code tables, pixels)
          val m = base.clone()
          (0 to rnd.nextInt(4)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m
        case 1 => base.take(rnd.nextInt(base.length + 1))
        case 2 =>
          val m = base.take(12 + rnd.nextInt(base.length - 12 + 1))
          if (m.nonEmpty && m.length > 20)
            m(20 + rnd.nextInt(m.length - 20)) = rnd.nextInt(256).toByte
          m
      }
      // plain-JVM entry: must return None or a value, NEVER throw — the
      // contract a parser over crawl bytes lives or dies by
      graft.functions.Native.webpLumaBytes(b) match {
        case Some(_) => decoded += 1
        case None => refused += 1
      }
    }
    assert(decoded + refused == 400)
    assert(refused > 0, "fuzz never produced a refusal — mutations too weak")
  }

  test("gifDecodeLuma never throws under seeded mutation/truncation fuzz") {
    val base = Seq(Tuple1(Array.tabulate(13 * 7)(i => ((i * 89 + 5) & 0xff).toByte)))
      .toDF("px").select(Multimodal.gifEncodeGray8($"px", lit(13), interlace = true))
      .as[Array[Byte]].head()
    val rnd = new scala.util.Random(1337)
    var decoded = 0; var refused = 0
    val fuzzed = scala.collection.mutable.ArrayBuffer.empty[Tuple1[Array[Byte]]]
    (0 until 400).foreach { i =>
      val b: Array[Byte] = i % 3 match {
        case 0 => // flip 1-4 bytes anywhere (LSD, palette, LZW stream)
          val m = base.clone()
          (0 to rnd.nextInt(4)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m
        case 1 => base.take(rnd.nextInt(base.length + 1))
        case 2 =>
          val m = base.take(12 + rnd.nextInt(base.length - 12 + 1))
          if (m.nonEmpty && m.length > 20)
            m(20 + rnd.nextInt(m.length - 20)) = rnd.nextInt(256).toByte
          m
      }
      graft.functions.Native.gifLumaBytes(b) match {
        case Some(_) => decoded += 1
        case None => refused += 1
      }
      fuzzed.append(Tuple1(b)) // census totality checked below in one job
    }
    assert(decoded + refused == 400)
    assert(refused > 0, "fuzz never produced a refusal — mutations too weak")
    val censusRows = fuzzed.toSeq.toDF("b")
      .select(Multimodal.gifFrameCount($"b"), Multimodal.gifLoopCount($"b")).count()
    assert(censusRows == 400)
  }

  test("a decodable MJPEG MP4 pairs in videoNearDup AND contributes no decodeDropReport row — the surfaces agree") {
    def frame(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      encYcc(mcuBitmap(72, 64, 1, 1, Array.fill(72)(cat7(r2))), 72, 1, 1)
    }
    val footage = Seq(frame(11), frame(12))
    val clips = Seq(
      (1L, encMp4(footage, 72, 64)),
      (2L, encMp4(footage, 72, 64))) // identical footage, re-keyed
      .toDF("id", "avi")
    val pairs = Multimodal.videoNearDup(clips, 72, 64, nSample = 2, maxHamming = 1)
      .select($"id_a", $"id_b", $"hamming".cast("bigint"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
    // the SAME payloads through the drop report: decodable → zero rows
    // (pre-r11 the MP4 branch called every ISO-BMFF payload
    // unsupported_profile — a clip the near-dup tier pairs would have
    // been counted dropped)
    val dropped = Multimodal.decodeDropReport(
      clips.select(lit("s").as("source"), $"avi".as("media")))
    assert(dropped.count() == 0L)
  }

  test("resizePlan fits within the max box preserving aspect ratio, never upscales") {
    val dims = Seq((1920, 1080), (100, 50), (512, 1024)).toDF("w", "h")
    val got = dims.select(Multimodal.resizePlan($"w", $"h", 512).as("r"))
      .select($"r.target_width", $"r.target_height").as[(Int, Int)].collect().toSeq
    assert(got == Seq((512, 288), (100, 50), (256, 512)))
    // FP edge: dim·(maxDim/dim) can exceed maxDim in the last ulp and
    // ceil would emit maxDim+1 without the clamp (147 @ maxDim 10,
    // 293 @ 224 are such cases)
    val edges = Seq((147, 100, 10), (293, 100, 224)).toDF("w", "h", "m")
    val boxed = edges.collect().map { r =>
      val m = r.getInt(2)
      val plan = dims.sparkSession.range(1).select(
        Multimodal.resizePlan(lit(r.getInt(0)), lit(r.getInt(1)), m).as("r"))
        .select($"r.target_width").as[Int].head()
      plan <= m
    }
    assert(boxed.forall(identity), "resize target escaped the maxDim box")
  }

  /** Reference dHash (identity 9×8 case) for the fixture bitmaps. */
  private def refDHash(px: Array[Byte]): Long = {
    var sig = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if ((px(r * 9 + c) & 0xff) > (px(r * 9 + c + 1) & 0xff))
        sig |= 1L << (r * 8 + c)
    sig
  }

  test("dHash: 9×8 identity case matches the bit-definition reference") {
    val bitmaps = (0 until 16).map { seed =>
      seed.toLong -> Array.tabulate(72) { i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed-$i".getBytes("UTF-8"))(0)
      }
    }
    val got = bitmaps.toDF("id", "img")
      .select($"id", Multimodal.dHash($"img", 9, 8).as("h"))
      .as[(Long, Long)].collect().toMap
    bitmaps.foreach { case (id, px) =>
      assert(got(id) == refDHash(px), s"id=$id")
    }
  }

  test("dHash: block-average resize — an integer-upscaled bitmap hashes identically") {
    // 2× upscale in both axes: every 2×2 block of the 18×16 bitmap is one
    // original pixel, so the block means ARE the original pixels and the
    // hash must be invariant (the real-resize correctness of the
    // averaging path, without needing a codec)
    val px = Array.tabulate(72) { i =>
      java.security.MessageDigest.getInstance("MD5").digest(s"up-$i".getBytes("UTF-8"))(0)
    }
    val up = Array.tabulate(16 * 18) { j =>
      val (y, x) = (j / 18, j % 18)
      px((y / 2) * 9 + (x / 2))
    }
    val got = Seq((1L, px, up)).toDF("id", "small", "big")
      .select(
        Multimodal.dHash($"small", 9, 8).as("hs"),
        Multimodal.dHash($"big", 18, 16).as("hb"))
      .as[(Long, Long)].head()
    assert(got._1 == got._2, f"small=${got._1}%016X big=${got._2}%016X")
  }

  test("dHash: a corrupt-length blob hashes to NULL, and imageNearDup drops it") {
    val rows = Seq(
      (1L, Array.fill[Byte](72)(7)),
      (2L, Array.fill[Byte](71)(7))). // truncated
      toDF("id", "img")
    val hashed = rows.select(Multimodal.dHash($"img", 9, 8).as("h"))
      .as[Option[Long]].collect()
    assert(hashed.count(_.isEmpty) == 1)
    assert(Multimodal.imageNearDup(rows, 9, 8).isEmpty) // nothing pairs
  }

  test("imageNearDup pairs bit-identical planted copies at hamming 0, nothing else") {
    val base = (0L until 40L).map { id =>
      id -> Array.tabulate(72) { i =>
        java.security.MessageDigest.getInstance("MD5").digest(s"$id-$i".getBytes("UTF-8"))(0)
      }
    }
    val all = (base ++ base.map { case (id, px) => (id + 1000L) -> px }).toDF("id", "img")
    val got = Multimodal.imageNearDup(all, 9, 8, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == (0L until 40L).map(id => (id, id + 1000L, 0)).toSet, got.toString)
  }

  test("pngEncodeGray8: byte layout matches hand-computed PNG hex (the anti-compensating-bug pin)") {
    // 3×2 image, pixels 10..60, filter 0, STORED deflate blocks: every
    // byte hand-derived from the PNG + zlib specs (sig, IHDR with CRC,
    // one stored block per scanline, Adler-32, IEND) — pinning the
    // ENCODER against the spec, so the decode oracle in SparkEntry
    // genuinely pins the DECODER rather than a shared layout bug
    val expected =
      "89504E470D0A1A0A0000000D4948445200000003000000020800000000B81F39C6" +
        "00000018494441547801000400FBFF000A141E010400FBFF0028323C027400D3E3" +
        "E8F09C0000000049454E44AE426082"
    val got = Seq(Tuple1(Array[Byte](10, 20, 30, 40, 50, 60))).toDF("px")
      .select(hex(Multimodal.pngEncodeGray8($"px", lit(3), filterMode = 0, stored = true)))
      .as[String].head()
    assert(got == expected)
  }

  test("pngDecodeGray8 decodes an EXTERNALLY-encoded PNG (python zlib, mixed filters)") {
    // 9×8 planted bitmap (doc 7), forward-filtered r%5 and deflated by
    // CPython's zlib — an independent encoder implementation, so this pin
    // cannot share any bug with pngEncodeGray8
    val png =
      "89504E470D0A1A0A0000000D49484452000000090000000808000000000EA68A69" +
        "0000005B49444154789C015000AFFF0030A56AD5D73A1DF1E401C04B9516B03190" +
        "55C302AC2891F6BD0B8DD90203B6EDB41E491DA8707304658BC11143A5F6CCA200" +
        "2FB510C37DFA7CFAFF01FCB1E633323897F1C802C7156B9324EEC74B7EF4AE2702" +
        "049C29970000000049454E44AE426082"
    val expectedPx =
      "30A56AD5D73A1DF1E4C00BA0B66697277C3F6C3331AC23A2B45541EC7C0A7997B9" +
        "5EC9F851DC3D8ADA7F54956B2FB510C37DFA7CFAFFFCAD93C6F830C7B880C3C2FE" +
        "591C1E8E03FE"
    val got = Seq(Tuple1(png)).toDF("hex")
      .select(hex(Multimodal.pngDecodeGray8(unhex($"hex"))))
      .as[String].head()
    assert(got == expectedPx)
  }

  test("PNG round-trip: decode(encode(px)) == px for every filter mode, stored and deflated") {
    // random-ish but deterministic pixels, width NOT a multiple of
    // anything special, heights exercising every scanline filter
    def pix(n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * 2654435761L >> 3) & 0xff).toByte)
    for {
      (w, h) <- Seq((13, 7), (9, 8), (1, 1), (32, 5))
      fm <- Seq(-1, 0, 1, 2, 3, 4)
      st <- Seq(true, false)
    } {
      val px = pix(w * h)
      val got = Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.pngDecodeGray8(
          Multimodal.pngEncodeGray8($"px", lit(w), filterMode = fm, stored = st)))
        .as[Array[Byte]].head()
      assert(got != null && got.sameElements(px), s"round-trip failed w=$w h=$h fm=$fm stored=$st")
    }
  }

  test("pngDecodeGray8 nulls on corrupt/out-of-contract payloads, never throws") {
    val goodPng = Seq(Tuple1(pixBytes)).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = 0, stored = true))
      .as[Array[Byte]].head()
    def decodes(b: Array[Byte]): Boolean =
      Seq(Tuple1(b)).toDF("png").select(Multimodal.pngDecodeGray8($"png"))
        .as[Array[Byte]].head() != null
    assert(decodes(goodPng))
    // flipped byte inside IDAT data → CRC mismatch → null
    val badCrc = goodPng.clone(); badCrc(50) = (badCrc(50) ^ 0x01).toByte
    assert(!decodes(badCrc))
    // truncated before IEND → null
    assert(!decodes(goodPng.take(goodPng.length - 13)))
    // color type 2 (RGB) → out of the gray8 contract → null
    val rgb = goodPng.clone(); rgb(25) = 2
    // (CRC now fails first, which is fine — still null, never a misparse)
    assert(!decodes(rgb))
    // decompression-bomb guard survives signed overflow: u32 dims whose
    // PRODUCT wraps past Long.MaxValue (w=2^31+9, h=2^32−1 ⇒ w*h < 0)
    // must be rejected at the per-dimension check, not reach allocation
    // with truncated ints — a crafted valid-CRC header, not a corrupt one
    val overflowBomb = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def u32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val ihdrBody = u32(0x80000009L) ++ u32(0xffffffffL) ++
        Array[Byte](8, 0, 0, 0, 0)
      val ihdr = "IHDR".getBytes("US-ASCII") ++ ihdrBody
      val crc = new java.util.zip.CRC32(); crc.update(ihdr)
      out.write(u32(13)); out.write(ihdr); out.write(u32(crc.getValue))
      // an empty IDAT keeps the payload above the 57-byte structural
      // minimum so the reject provably happens at the dimension check
      val idat = "IDAT".getBytes("US-ASCII")
      val crc1 = new java.util.zip.CRC32(); crc1.update(idat)
      out.write(u32(0)); out.write(idat); out.write(u32(crc1.getValue))
      val iend = "IEND".getBytes("US-ASCII")
      val crc2 = new java.util.zip.CRC32(); crc2.update(iend)
      out.write(u32(0)); out.write(iend); out.write(u32(crc2.getValue))
      out.toByteArray
    }
    assert(!decodes(overflowBomb))
    // stored-block encode refuses widths whose scanline exceeds the
    // 2-byte LEN field (w+1 > 65535) instead of silently truncating
    val wide = Seq(Tuple1(Array.fill(65535 * 2)(7.toByte))).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(65535), filterMode = 0, stored = true))
      .as[Array[Byte]].head()
    assert(wide == null)
    // ...but the same width through REAL deflate still encodes (the cap
    // is a stored-block framing limit, not a PNG one)
    val wideDeflate = Seq(Tuple1(Array.fill(65535 * 2)(7.toByte))).toDF("px")
      .select(Multimodal.pngEncodeGray8($"px", lit(65535), filterMode = 0, stored = false))
      .as[Array[Byte]].head()
    assert(wideDeflate != null && decodes(wideDeflate))
    // not a PNG at all / empty-adjacent sizes
    assert(!decodes("just text, definitely not a PNG........".getBytes("UTF-8")))
    assert(!decodes(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
    // dimension bomb: hand-build a tiny blob claiming 2^13×2^13+1 px > cap
    // is caught by MaxPixels (here just assert a huge-claim header nulls)
    val bomb = goodPng.clone()
    bomb(16) = 0x7F; bomb(17) = 0xFF.toByte; bomb(18) = 0xFF.toByte; bomb(19) = 0xFF.toByte
    assert(!decodes(bomb))
  }

  test("imageNearDupPng pairs identical PNGs at hamming 0 through the real decode path") {
    val imgs = Seq(
      (1L, pixBytes),
      (2L, pixBytes), // bit-identical content re-encoded → hamming 0 pair
      (3L, pixBytes.map(b => (~b).toByte))) // inverted → far away
      .toDF("id", "px")
      .select($"id",
        Multimodal.pngEncodeGray8($"px", lit(9), filterMode = -1, stored = false).as("png"))
    val pairs = Multimodal.imageNearDupPng(imgs, 9, 8, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
    // a corrupt payload drops at decode, silently
    val withBad = imgs.union(Seq((9L, "nope".getBytes("UTF-8"))).toDF("id", "png"))
    val pairs2 = Multimodal.imageNearDupPng(withBad, 9, 8, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs2 == Set((1L, 2L, 0)))
  }

  private lazy val pixBytes: Array[Byte] =
    Array.tabulate(72)(i => ((i * 37 + 11) & 0xff).toByte)

  // ---- truecolor PNG: RGB(A) encode fixture, luma decode, ImageIO pins ----

  /** The decoder's exact luma formula (Native.Png.luma601) re-stated
    * independently — integer ITU-R 601 with truncating division. */
  private def luma601(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b + 500) / 1000
  /** Deterministic interleaved RGB(A) test pixels. */
  private def rgbPix(n: Int, bpp: Int): Array[Byte] =
    Array.tabulate(n * bpp)(i => ((i * 2654435761L >> 5) & 0xff).toByte)
  private def lumaOf(px: Array[Byte], bpp: Int): Array[Byte] =
    Array.tabulate(px.length / bpp) { i =>
      luma601(px(i * bpp) & 0xff, px(i * bpp + 1) & 0xff, px(i * bpp + 2) & 0xff).toByte
    }
  private def encRgb(px: Array[Byte], w: Int, fm: Int, st: Boolean, alpha: Boolean): Array[Byte] =
    Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.pngEncodeRgb($"px", lit(w), fm, st, alpha)).as[Array[Byte]].head()
  private def decPngLuma(b: Array[Byte]): Array[Byte] =
    Seq(Tuple1(b)).toDF("png")
      .select(Multimodal.pngDecodeLuma($"png")).as[Array[Byte]].head()

  test("color PNG round-trip: decodeLuma(encodeRgb(px)) == exact-integer luma, all filters, RGB and RGBA, stored and deflated") {
    for {
      (w, h) <- Seq((13, 7), (9, 8), (1, 1), (32, 5))
      fm <- Seq(-1, 0, 1, 2, 3, 4)
      st <- Seq(true, false)
      alpha <- Seq(false, true)
    } {
      val bpp = if (alpha) 4 else 3
      val px = rgbPix(w * h, bpp)
      val got = decPngLuma(encRgb(px, w, fm, st, alpha))
      assert(got != null && got.sameElements(lumaOf(px, bpp)),
        s"color round-trip failed w=$w h=$h fm=$fm stored=$st alpha=$alpha")
    }
  }

  test("pngDecodeLuma on GRAYSCALE PNGs is byte-identical to pngDecodeGray8 (shared core, superset contract)") {
    for (fm <- Seq(-1, 0, 4); st <- Seq(true, false)) {
      val png = Seq(Tuple1(pixBytes)).toDF("px")
        .select(Multimodal.pngEncodeGray8($"px", lit(9), filterMode = fm, stored = st))
        .as[Array[Byte]].head()
      val viaGray = Seq(Tuple1(png)).toDF("png")
        .select(Multimodal.pngDecodeGray8($"png")).as[Array[Byte]].head()
      val viaLuma = decPngLuma(png)
      assert(viaGray != null && viaLuma != null && viaGray.sameElements(viaLuma))
    }
  }

  test("alpha never leaks into luma: RGBA images differing ONLY in alpha decode identically") {
    val w = 9; val h = 8
    val rgba = rgbPix(w * h, 4)
    val rgbaOtherAlpha = rgba.clone()
    var i = 3
    while (i < rgbaOtherAlpha.length) { rgbaOtherAlpha(i) = (~rgbaOtherAlpha(i)).toByte; i += 4 }
    val a = decPngLuma(encRgb(rgba, w, -1, st = false, alpha = true))
    val b = decPngLuma(encRgb(rgbaOtherAlpha, w, -1, st = false, alpha = true))
    assert(a != null && b != null && a.sameElements(b))
  }

  // ---- palette + Adam7 PNG ------------------------------------------------

  /** The fixture encoder's analytic PLTE restated independently: index i →
    * luma601(i, 255−i, (7·i) mod 256). */
  private def palLuma(idx: Array[Byte]): Array[Byte] =
    idx.map { b => val i = b & 0xff; luma601(i, 255 - i, (7 * i) % 256).toByte }
  private def encPal(px: Array[Byte], w: Int, interlace: Boolean, trns: Boolean,
      fm: Int): Array[Byte] =
    Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.pngEncodePal8($"px", lit(w), interlace, trns, fm))
      .as[Array[Byte]].head()
  /** Hand-assembly helper: signature + IHDR + optional PLTE/tRNS + one
    * real-deflate IDAT over the given raw (filtered) stream + IEND, every
    * chunk CRC32'd — independent of BOTH the decoder and the fixture
    * encoder (no shared pass table, no shared filter code). */
  private def handPng(w: Int, h: Int, colorType: Int, interlace: Boolean,
      raw: Array[Byte], plte: Array[Byte] = null,
      trns: Array[Byte] = null): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32(); crc.update(td)
      val c = crc.getValue
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    }
    chunk("IHDR", Array[Byte](
      ((w >> 24) & 0xff).toByte, ((w >> 16) & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      ((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      8, colorType.toByte, 0, 0, (if (interlace) 1 else 0).toByte))
    if (plte != null) chunk("PLTE", plte)
    if (trns != null) chunk("tRNS", trns)
    val z = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    } finally d.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("palette PNG round-trip: decodeLuma(encodePal8(idx)) == analytic palette luma across interlace × trns × filters × shapes") {
    for {
      (w, h) <- Seq((9, 8), (13, 7), (1, 1), (8, 8), (32, 5), (3, 3), (2, 9))
      interlace <- Seq(false, true)
      trns <- Seq(false, true)
      fm <- Seq(-1, 0, 4)
    } {
      val idx = Array.tabulate(w * h)(i => ((i * 41 + 7) & 0xff).toByte)
      val got = decPngLuma(encPal(idx, w, interlace, trns, fm))
      assert(got != null && got.sameElements(palLuma(idx)),
        s"palette round-trip failed w=$w h=$h interlace=$interlace trns=$trns fm=$fm")
    }
  }

  test("tRNS never leaks into luma: the trns twin decodes byte-identically; a hand vector with a FULLY transparent entry keeps its palette luma") {
    val idx = Array.tabulate(72)(i => ((i * 13 + 3) & 0xff).toByte)
    val a = decPngLuma(encPal(idx, 9, interlace = false, trns = false, fm = -1))
    val b = decPngLuma(encPal(idx, 9, interlace = false, trns = true, fm = -1))
    assert(a != null && b != null && a.sameElements(b), "tRNS altered the luma")
    // hand vector: 2×1, two-entry palette, entry 0 alpha 0 (fully
    // transparent) — luma must STILL be the palette color's luma
    // (luma601(10,20,30)=18, luma601(200,100,50)=124); a decoder that
    // composited or zeroed transparent pixels fails here
    val hand = handPng(2, 1, 3, interlace = false,
      raw = Array[Byte](0, 0, 1),
      plte = Array[Byte](10, 20, 30, 200.toByte, 100, 50),
      trns = Array[Byte](0))
    val got = decPngLuma(hand)
    assert(got != null && got.sameElements(Array[Byte](18, 124.toByte)),
      s"tRNS hand vector decoded ${if (got == null) "null" else got.toSeq}")
  }

  test("palette violations refuse, never misparse: missing PLTE, PLTE after IDAT, index beyond the table, oversized tRNS") {
    val rawPlain = Array[Byte](0, 0, 1) // 2×1, filter 0, indices 0 1
    val plte2 = Array[Byte](10, 20, 30, 40, 50, 60)
    // missing PLTE
    assert(decPngLuma(handPng(2, 1, 3, interlace = false, rawPlain)) == null)
    // index 2 with a 2-entry palette
    assert(decPngLuma(handPng(2, 1, 3, interlace = false,
      Array[Byte](0, 0, 2), plte = plte2)) == null)
    // tRNS longer than the palette (3 alphas, 2 entries)
    assert(decPngLuma(handPng(2, 1, 3, interlace = false, rawPlain,
      plte = plte2, trns = Array[Byte](1, 2, 3))) == null)
    // PLTE after IDAT: splice the valid fixture's PLTE chunk (fixed 780
    // bytes at offset 33) to AFTER the IDAT chunk
    val ok = encPal(Array[Byte](0, 1), 2, interlace = false, trns = false, fm = 0)
    val plteChunk = ok.slice(33, 33 + 780)
    val without = ok.take(33) ++ ok.drop(33 + 780)
    val iendAt = without.length - 12
    val moved = without.take(iendAt) ++ plteChunk ++ without.drop(iendAt)
    assert(decPngLuma(ok) != null && decPngLuma(moved) == null)
  }

  test("Adam7 hand vectors: pass boundaries and scatter match the spec grid (3×3 edge case and the full 8×8 pattern)") {
    // 3×3 grayscale: passes 2 and 3 are EMPTY (contribute no bytes, not
    // even filter bytes). Stream hand-laid pass by pass with filter 0;
    // expected placement hand-written from the spec §8.2 figure.
    val raw3 = Array[Byte](
      0, 11,        // pass 1: (0,0)
                    // pass 2: empty (x0=4 ≥ w)   pass 3: empty (y0=4 ≥ h)
      0, 41,        // pass 4: (2,0)
      0, 51, 52,    // pass 5: (0,2) (2,2)
      0, 61, 0, 62, // pass 6: (1,0) (1,2) — two one-pixel rows
      0, 71, 72, 73) // pass 7: (0,1) (1,1) (2,1)
    val got3 = decPngLuma(handPng(3, 3, 0, interlace = true, raw3))
    val want3 = Array[Byte](11, 61, 41, 71, 72, 73, 51, 62, 52)
    assert(got3 != null && got3.sameElements(want3),
      s"3x3 Adam7 decoded ${if (got3 == null) "null" else got3.toSeq}")
    // 8×8: every pass non-empty. The ownership grid is the spec figure
    // verbatim (NOT the decoder's pass table); pixel value = 30·pass + k
    // where k is the pixel's row-major rank within its pass. Any error in
    // pass order, pass dims, or scatter misplaces at least one value.
    val grid = Array(
      Array(1, 6, 4, 6, 2, 6, 4, 6),
      Array(7, 7, 7, 7, 7, 7, 7, 7),
      Array(5, 6, 5, 6, 5, 6, 5, 6),
      Array(7, 7, 7, 7, 7, 7, 7, 7),
      Array(3, 6, 4, 6, 3, 6, 4, 6),
      Array(7, 7, 7, 7, 7, 7, 7, 7),
      Array(5, 6, 5, 6, 5, 6, 5, 6),
      Array(7, 7, 7, 7, 7, 7, 7, 7))
    val expected = new Array[Byte](64)
    val raw8 = new java.io.ByteArrayOutputStream()
    for (p <- 1 to 7) {
      var k = 0
      for (y <- 0 until 8) {
        val rowCells = (0 until 8).filter(x => grid(y)(x) == p)
        if (rowCells.nonEmpty) {
          raw8.write(0) // filter byte per pass scanline
          rowCells.foreach { x =>
            val v = (30 * p + k).toByte
            expected(y * 8 + x) = v
            raw8.write(v & 0xff)
            k += 1
          }
        }
      }
    }
    val got8 = decPngLuma(handPng(8, 8, 0, interlace = true, raw8.toByteArray))
    assert(got8 != null && got8.sameElements(expected),
      s"8x8 Adam7 decoded ${if (got8 == null) "null" else got8.toSeq}")
  }

  test("Adam7 filters reference WITHIN-pass neighbors: Sub/Up across pass rows round-trip (truecolor via ImageIO progressive writer)") {
    // ImageIO's PNG writer emits REAL Adam7 streams in progressive mode —
    // a third-party interlaced encoder, so a decoder bug that the
    // fixture encoder shares (pass table, within-pass filtering) cannot
    // hide. 13×11 exercises ragged pass widths.
    val w = 13; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val px = rgbPix(w * h, 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y,
        ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) | (px(o + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    assert(bytes(28) == 1, "ImageIO did not write an interlaced PNG")
    val got = decPngLuma(bytes)
    assert(got != null && got.sameElements(lumaOf(px, 3)),
      "third-party Adam7 PNG decoded wrong")
  }

  // ---- WebP VP8L ----------------------------------------------------------
  // spec-derived decoder vectors: each stream is hand-assembled straight
  // from the public lossless bitstream spec (tools/gen_vp8l_vectors.py —
  // independent of the Scala decoder AND of the fixture encoder, which
  // never emits these features), with analytically-stated expected ARGB.
  private def argbOf(webpHex: String): Seq[Int] = {
    val d = graft.functions.Native.webpArgbForTest(hexBytesT(webpHex))
    assert(d != null, s"decode failed for $webpHex")
    d.toSeq
  }
  private def hexBytesT(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("VP8L decode: LZ77 reference, color cache, and simple codes match hand-built spec streams") {
    // webpLz77: literal then a length-3 distance-1 LZ77 reference (overlapping copy)
    val webpLz77 = "524946461e000000574542505650384c110000002f03000000009204ffbf76450f9ad0ff1400"
    val webpLz77Px = Array(0xff070109, 0xff070109, 0xff070109, 0xff070109) // 4x1 ARGB
    assert(argbOf(webpLz77) == webpLz77Px.toSeq)
    // webpCache: two literals then a color-cache hit (cache_bits=4, slot 4)
    val webpCache = "524946461e000000574542505650384c120000002f0200000012214192f0fffce28088fe8706"
    val webpCachePx = Array(0xff000500, 0xff000600, 0xff000500) // 3x1 ARGB
    assert(argbOf(webpCache) == webpCachePx.toSeq)
    // webpMeta: meta prefix image: two groups split the row at x=4
    val webpMeta = "5249464622000000574542505650384c150000002f070000008403044444d885ccfe472d2a5081fe0700"
    val webpMetaPx = Array(0xff010b01, 0xff010b01, 0xff010b01, 0xff010b01,
      0xff021602, 0xff021602, 0xff021602, 0xff021602) // 8x1 ARGB
    assert(argbOf(webpMeta) == webpMetaPx.toSeq)
  }

  test("VP8L decode: a meta prefix image may declare MORE than 256 entropy groups (16-bit meta index)") {
    // generated by tools/gen_vp8l_vectors.py (case_meta_many): 300 group
    // code tables, every tile mapped to group 299 — a decoder capping
    // nGroups at 256 refuses this spec-valid stream (the pre-r12 bug);
    // the bomb cap, not a group cap, is the memory bound
    val webpMetaMany = "5249464616070000574542505650384c090700002f0700000084ae64444444ffa307d981fe471d2a5083fe472b3ad084fe47394a5086fe47475ad087fe47556a5089fe47637ad08afe47718a508cfe477f9ad08dfe478daa508ffe479bbad090fe47a9ca5092fe47b7dad093fe47c5ea5095fe47d3fad096fe47e10a5198fe47ef1ad199fe47fd2a519bfe470b3bd19cfe47194b519efe47275bd19ffe47356b51a1fe47437bd1a2fe47518b51a4fe475f9bd1a5fe476dab51a7fe477bbbd1a8fe4789cb51aafe4797dbd1abfe47a5eb51adfe47b3fbd1aefe47c10b52b0fe47cf1bd2b1fe47dd2b52b3fe47eb3bd2b4fe47f94b52b6fe47075ad2b7fe47156a52b9fe47237ad2bafe47318a52bcfe473f9ad2bdfe474daa52bffe475bbad2c0fe4769ca52c2fe4777dad2c3fe4785ea52c5fe4793fad2c6fe47a10a53c8fe47af1ad3c9fe47bd2a53cbfe47cb3ad3ccfe47d94a53cefe47e75ad3cffe47f56a53d1fe47037bd3d2fe47118b53d4fe471f9bd3d5fe472dab53d7fe473bbbd3d8fe4749cb53dafe4757dbd3dbfe4765eb53ddfe4773fbd3defe47810b54e0fe478f1bd4e1fe479d2b54e3fe47ab3bd4e4fe47b94b54e6fe47c75bd4e7fe47d56b54e9fe47e37bd4eafe47f18b54ecfe47ff9bd4edfe470daa54effe471bbad4f0fe4729ca54f2fe4737dad4f3fe4745ea54f5fe4753fad4f6fe47610a55f8fe476f1ad5f9fe477d2a55fbfe478b3ad5fcfe47994a55fefe47a75ad5fffe47b56a5581fe47c37ad582fe47d18a5584fe47df9ad585fe47edaa5587fe47fbbad588fe4709cb558afe4717dbd58bfe4725eb558dfe4733fbd58efe47410b5690fe474f1bd691fe475d2b5693fe476b3bd694fe47794b5696fe47875bd697fe47956b5699fe47a37bd69afe47b18b569cfe47bf9bd69dfe47cdab569ffe47dbbbd6a0fe47e9cb56a2fe47f7dbd6a3fe4705ea56a5fe4713fad6a6fe47210a57a8fe472f1ad7a9fe473d2a57abfe474b3ad7acfe47594a57aefe47675ad7affe47756a57b1fe47837ad7b2fe47918a57b4fe479f9ad7b5fe47adaa57b7fe47bbbad7b8fe47c9ca57bafe47d7dad7bbfe47e5ea57bdfe47f3fad7befe47010b58c0fe470f1bd8c1fe471d2b58c3fe472b3bd8c4fe47394b58c6fe47475bd8c7fe47556b58c9fe47637bd8cafe47718b58ccfe477f9bd8cdfe478dab58cffe479bbbd8d0fe47a9cb58d2fe47b7dbd8d3fe47c5eb58d5fe47d3fbd8d6fe47e10b59d8fe47ef1bd9d9fe47fd2b59dbfe470b3ad9dcfe47194a59defe47275ad9dffe47356a59e1fe47437ad9e2fe47518a59e4fe475f9ad9e5fe476daa59e7fe477bbad9e8fe4789ca59eafe4797dad9ebfe47a5ea59edfe47b3fad9eefe47c10a5af0fe47cf1adaf1fe47dd2a5af3fe47eb3adaf4fe47f94a5af6fe47075bdaf7fe47156b5af9fe47237bdafafe47318b5afcfe473f9bdafdfe474dab5afffe475bbb9afd8fd296b504fd8feeb6b507fd8f0ad7b50afd8f26f7b50dfd8f4217b610fd8f5e37b613fd8f7a57b616fd8f9677b619fd8fb297b61cfd8fceb7b61ffd8fead7b622fd8fec6d4bfa1f45286e51fa1f7d686e57fa1fb5a86e5dfa1fede86e63fa1f25296f69fa1f5d696f6ffa1f95a96f75fa1fcde96f7bfa1f052a7081fa1f3d6a7087fa1f75aa708dfa1fadea7093fa1fe52a7199fa1f1d6b719ffa1f55ab71a5fa1f8deb71abfa1fc52b72b1fa1ffd6b72b7fa1f35ac72bdfa1f6dec72c3fa1fa52c73c9fa1fdd6c73cffa1f15ad73d5fa1f4ded73dbfa1f852d74e1fa1fbd6d74e7fa1ff5ad74edfa1f2dee74f3fa1f652e75f9fa1f9d6e75fffa1fd5ae7505fb1f0def750bfb1f452f7611fb1f7d6f7617fb1fb5af761dfb1fedef7623fb1f25287729fb1f5d68772ffb1f95a87735fb1fcde8773bfb1f05297841fb1f3d697847fb1f75a9784dfb1fade97853fb1fe5297959fb1f1d6a795ffb1f55aa7965fb1f8dea796bfb1fc52a7a71fb1ffd6a7a77fb1f35ab7a7dfb1f6deb7a83fb1fa52b7b89fb1fdd6b7b8ffb1f15ac7b95fb1f4dec7b9bfb1f852c7ca1fb1fbd6c7ca7fb1ff5ac7cadfb1f2ded7cb3fb1f652d7db9fb1f9d6d7dbffb1fd5ad7dc5fb1f0dee7dcbfb1f452e7ed1fb1f7d6e7ed7fb1fb5ae7eddfb1fedee7ee3fb1f252f7fe9fb1f5d6f7feffb1f95af7ff5fb1fcdef7ffbfb1f11d1ffe84176a0ff51870ad4a0ffd18a0e34a1ff518e1294a1ffd19116f4a1ff51951a54a2ffd1981eb4a2ff519c2214a3ffd19f2674a3ff51a32ad4a3ffd1a62e34a4ff51aa3294a4ffd1ad36f4a4ff51b13a54a5ffd1b43eb4a5ff51b84214a6ffd1bb4674a6ff51bf4ad4a6ffd1c24e34a7ff51c65294a7ffd1c956f4a7ff51cd5a54a8ffd1d05eb4a8ff51d46214a9ffd1d76674a9ff51db6ad4a9ffd1de6e34aaff51e27294aaffd1e576f4aaff51e97a54abffd1ec7eb4abff51f08214acffd1f38674acff51f78ad4acffd1fa8e34adff51fe9294adffd18196f4adff51859a54aeffd1889eb4aeff518ca214afffd18fa674afff5193aad4afffd1b11ef4a0ff0100"
    assert(argbOf(webpMetaMany) == Seq.fill(8)(0xff076307))
  }

  test("VP8L decode: all four transforms match hand-built spec streams") {
    // webpSubGreen: subtract-green inverse: r and b shift by green mod 256
    val webpSubGreen = "5249464618000000574542505650384c0c0000002f010000004515aa5f82fe07"
    val webpSubGreenPx = Array(0xff040a0e, 0xff040a0e) // 2x1 ARGB
    assert(argbOf(webpSubGreen) == webpSubGreenPx.toSeq)
    // webpPredictor: predictor transform, one block, mode 2 (T); top row L, origin black
    val webpPredictor = "524946461c000000574542505650384c0f0000002f01400000810a4444a0051de8410600"
    val webpPredictorPx = Array(0x00030507, 0x01060a0e, 0x01060a0e, 0x02090f15) // 2x2 ARGB
    assert(argbOf(webpPredictor) == webpPredictorPx.toSeq)
    // webpColor: color transform inverse: signed 3.5 fixed-point channel deltas
    val webpColor = "524946461e000000574542505650384c120000002f01000000830e94a002112850c92ad3ff00"
    val webpColorPx = Array(0xff684045, 0xff684045) // 2x1 ARGB
    assert(argbOf(webpColor) == webpColorPx.toSeq)
    // webpIndexed: 2-color palette, 8 pixels packed into one green byte 0x96
    val webpIndexed = "5249464622000000574542505650384c160000002f070000000f70018307207c80e0ff0081875a464400"
    val webpIndexedPx = Array(0xff010203, 0xff090807, 0xff090807, 0xff010203,
      0xff090807, 0xff010203, 0xff010203, 0xff090807) // 8x1 ARGB
    assert(argbOf(webpIndexed) == webpIndexedPx.toSeq)
  }

  test("WebP round-trip: webpDecodeLuma(webpEncodeVp8l(px)) == exact-integer luma, RGB and RGBA") {
    for {
      (w, h) <- Seq((13, 7), (9, 8), (1, 1), (32, 5))
      alpha <- Seq(false, true)
    } {
      val bpp = if (alpha) 4 else 3
      val px = rgbPix(w * h, bpp)
      val got = Seq((px, w)).toDF("px", "w")
        .select(Multimodal.webpDecodeLuma(Multimodal.webpEncodeVp8l($"px", $"w", alpha)))
        .as[Array[Byte]].head()
      assert(got != null && got.sameElements(lumaOf(px, bpp)),
        s"webp round-trip failed w=$w h=$h alpha=$alpha")
    }
  }

  test("VP8 lossy goldens: real libwebp-encoded streams decode to libwebp's own Y plane bit-exactly") {
    // the strongest available check for a lossy coding: the reference
    // implementation encoded these AND decoded them; our decoder must
    // reproduce its Y plane to the byte, loop filter included
    for ((name, webp, luma, (w, h)) <- Vp8Vectors.all) {
      val got = Seq(Tuple1(webp)).toDF("b")
        .select(Multimodal.webpDecodeLuma($"b")).as[Array[Byte]].head()
      assert(got != null, name)
      assert(got.length == w * h, s"$name dims")
      assert(java.util.Arrays.equals(got, luma), s"$name pixel mismatch")
      val r = Seq(Tuple1(webp)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      assert(r.isNullAt(0), s"$name classified dropped")
      assert(Multimodal.realCodec(webp).isDefined, s"$name realCodec")
    }
  }

  test("VP8 zero-run-to-16 without EOB: neighbor context reads 'consumed' (ADVICE r15)") {
    // a legal token shape no known encoder emits: one Y subblock spends
    // its budget on a zero-run that reaches coefficient 16 with no EOB.
    // All its coefficients are zero, yet libwebp's GetCoeffs contract
    // (n > first) marks the block "consumed" for the neighbor context,
    // so the encoder codes subblocks 1 and 4 at ctx 1 — a value-based
    // nonzero flag would read their EOBs with ctx-0 probabilities and
    // desync the arithmetic decoder for the rest of the frame
    val w = 32; val h = 32
    val consts = Array(80, 140, 200, 30)
    val px = Array.tabulate(w * h)(i =>
      consts(((i / w) / 16) * 2 + ((i % w) / 16)).toByte)
    val plain = graft.functions.Native.Vp8.encodeDc(px, w, h, 1)
    val crafted = graft.functions.Native.Vp8.encodeDc(px, w, h, 1, zeroRunMb = 0)
    assert(plain != null && crafted != null)
    assert(!java.util.Arrays.equals(plain, crafted), "streams must differ")
    def dec(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.webpDecodeLuma($"b")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(dec(plain), px))
    assert(java.util.Arrays.equals(dec(crafted), px),
      "zero-run-to-16 stream must decode to the same pixels through faithful contexts")
  }

  test("VP8 fixture encoder round-trips: per-MB-constant images, all partition counts, odd dims, skip coverage") {
    def enc(px: Array[Byte], w: Int, nparts: Int): Array[Byte] =
      Seq(Tuple1(px)).toDF("px")
        .select(Multimodal.webpEncodeVp8($"px", lit(w), nparts)).as[Array[Byte]].head()
    def dec(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.webpDecodeLuma($"b")).as[Array[Byte]].head()
    val rnd = new scala.util.Random(19)
    for ((w, h, nparts) <- Seq((16, 16, 1), (32, 32, 1), (48, 32, 2),
        (64, 80, 4), (80, 48, 8), (17, 23, 1), (40, 18, 2))) {
      val mbw = (w + 15) / 16
      // per-MB constants; force at least one zero residual so the
      // skip-flag path (and its context clearing) is in the stream
      val consts = Array.fill((mbw) * ((h + 15) / 16))(rnd.nextInt(256))
      if (consts.length > 2) consts(2) = if (consts(1) == 0) 128 else consts(1)
      val px = Array.tabulate(w * h)(i =>
        consts(((i / w) / 16) * mbw + ((i % w) / 16)).toByte)
      val webp = enc(px, w, nparts)
      assert(webp != null, s"${w}x$h parts=$nparts encode")
      val got = dec(webp)
      assert(got != null && java.util.Arrays.equals(got, px),
        s"${w}x$h parts=$nparts round trip")
      val r = Seq(Tuple1(webp)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      assert(r.isNullAt(0), s"${w}x$h parts=$nparts dropped")
    }
  }

  test("VP8 honest failures: truncation, inter frame, reserved version, bad start code, zero/bomb dims") {
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    val webp = Vp8Vectors.vp8Webp_q75
    assert(new String(webp.slice(12, 16), "US-ASCII") == "VP8 ", "fixture layout")
    val payload = webp.drop(20)
    def wrap(p: Array[Byte]): Array[Byte] = {
      val pad = p.length & 1
      val riffSize = 4 + 8 + p.length + pad
      ("RIFF".getBytes("US-ASCII") :+ (riffSize & 0xFF).toByte) ++
        Array(((riffSize >> 8) & 0xFF).toByte, ((riffSize >> 16) & 0xFF).toByte,
          ((riffSize >> 24) & 0xFF).toByte) ++
        "WEBPVP8 ".getBytes("US-ASCII") ++
        Array((p.length & 0xFF).toByte, ((p.length >> 8) & 0xFF).toByte,
          ((p.length >> 16) & 0xFF).toByte, ((p.length >> 24) & 0xFF).toByte) ++
        p ++ (if (pad == 1) Array(0: Byte) else Array.empty[Byte])
    }
    assert(reason(wrap(payload)) == null) // the wrap itself is sound
    // payload cut before the first partition completes → truncated
    assert(reason(wrap(payload.take(12))) == "truncated")
    // inter frame (tag bit 0): keyframes decode; no still carries this
    val inter = payload.clone(); inter(0) = (inter(0) | 1).toByte
    assert(reason(wrap(inter)) == "unsupported_profile")
    // reserved version (> 3) → corrupt
    val ver = payload.clone(); ver(0) = (ver(0) | 0x08).toByte
    assert(reason(wrap(ver)) == "corrupt")
    // damaged start code → corrupt
    val sc = payload.clone(); sc(4) = 0x02
    assert(reason(wrap(sc)) == "corrupt")
    // zero width → corrupt
    val zw = payload.clone(); zw(6) = 0; zw(7) = (zw(7) & 0xC0).toByte
    assert(reason(wrap(zw)) == "corrupt")
    // 16383×16383 header dims demand more than the shared cap →
    // bomb_guard BEFORE any decode work, like the PNG/VP8L branches
    val bomb = payload.clone()
    bomb(6) = 0xFF.toByte; bomb(7) = 0x3F
    bomb(8) = 0xFF.toByte; bomb(9) = 0x3F
    assert(reason(wrap(bomb)) == "bomb_guard")
  }

  test("animated WebP decodes its FIRST frame through the same cores; metadata-only and damaged frames classify honestly") {
    def luma(b: Array[Byte]): Array[Byte] =
      Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.webpDecodeLuma($"b")).as[Array[Byte]].head()
    def reason(bytes: Array[Byte]): String = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.Native.decodeDropReason($"b")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val sz = payload.length
      tag.getBytes("US-ASCII") ++ Array((sz & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 24) & 0xFF).toByte) ++ payload ++
        (if ((sz & 1) == 1) Array(0: Byte) else Array.empty[Byte])
    }
    def riff(chunks: Array[Byte]): Array[Byte] = {
      val sz = 4 + chunks.length
      "RIFF".getBytes("US-ASCII") ++ Array((sz & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 24) & 0xFF).toByte) ++ "WEBP".getBytes("US-ASCII") ++ chunks
    }
    // VP8X (anim flag) + ANIM + one ANMF wrapping a real image chunk —
    // built once around the VP8L fixture and once around a REAL
    // libwebp-encoded lossy stream (its image chunk re-wrapped)
    val vp8x = chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++
      Array[Byte](8, 0, 0) ++ Array[Byte](7, 0, 0)) // canvas 9×8 (−1 coded)
    val anim = chunk("ANIM", new Array[Byte](6))
    val gray = Array.tabulate(9 * 8)(i => ((i * 41 + 3) & 0xff).toByte)
    val stillL = Seq(Tuple1(gray.flatMap(v => Array(v, v, v)))).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(9))).as[Array[Byte]].head()
    val vp8lChunk = stillL.drop(12) // the still's VP8L chunk, header stripped
    val anmfHdr = new Array[Byte](16) // geometry/duration: unused by this tier
    val animL = riff(vp8x ++ anim ++ chunk("ANMF", anmfHdr ++ vp8lChunk))
    assert(java.util.Arrays.equals(luma(animL), luma(stillL)),
      "first-frame VP8L decode must equal the still's")
    assert(reason(animL) == null)
    val stillV = Vp8Vectors.vp8Webp_tiny
    val vp8Chunk = stillV.drop(12)
    val animV = riff(vp8x ++ anim ++ chunk("ANMF", anmfHdr ++ vp8Chunk))
    assert(java.util.Arrays.equals(luma(animV), luma(stillV)),
      "first-frame VP8 decode must equal the still's")
    assert(reason(animV) == null)
    // metadata-only extended file: sound chunks, no image data anywhere
    val metaOnly = riff(vp8x ++ anim)
    assert(reason(metaOnly) == "unsupported_profile")
    // an ANMF too small to hold any image sub-chunk, and one whose
    // payload is junk sub-chunks: structural damage, not a profile
    val anmfTiny = riff(vp8x ++ anim ++ chunk("ANMF", new Array[Byte](16)))
    assert(reason(anmfTiny) == "corrupt")
    val anmfJunk = riff(vp8x ++ anim ++
      chunk("ANMF", anmfHdr ++ chunk("JUNK", Array[Byte](1, 2, 3, 4))))
    assert(reason(anmfJunk) == "corrupt")
  }

  test("webpDecodeLuma nulls off contract, never throws: lossy, truncated, junk, version, dims") {
    val px = rgbPix(6, 3)
    val good = Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.webpEncodeVp8l($"px", lit(3))).as[Array[Byte]].head()
    val lossy = "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++
      (Array[Byte](10, 0, 0, 0, 1) ++ new Array[Byte](9)) // inter frame
    val cases = Seq(
      lossy,                       // recognized container, no VP8L
      good.take(25),               // truncated mid-stream
      good.take(12),               // bare RIFF-WEBP header
      "RIFFxxxxWEBQ".getBytes("US-ASCII"),
      Array[Byte](1, 2, 3))
    cases.foreach { b =>
      val r = Seq(Tuple1(b)).toDF("b")
        .select(Multimodal.webpDecodeLuma($"b")).collect().head
      assert(r.isNullAt(0), s"expected null for ${b.take(16).mkString(",")}")
    }
    // and the good payload does decode
    val ok = Seq(Tuple1(good)).toDF("b")
      .select(Multimodal.webpDecodeLuma($"b")).as[Array[Byte]].head()
    assert(ok != null && ok.length == 6)
  }

  test("imageNearDupWebp pairs re-keyed identical lossless WebPs at hamming 0, nothing else") {
    def img(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      Array.fill(9 * 8 * 3)(r2.nextInt(256).toByte)
    }
    val rows = Seq((1L, img(1)), (2L, img(1)), (3L, img(3)), (4L, img(4)))
      .toDF("id", "px")
      .select($"id", Multimodal.webpEncodeVp8l($"px", lit(9)).as("webp"))
    val pairs = Multimodal.imageNearDupWebp(rows, 9, 8, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming".cast("bigint"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("pngEncodeRgb refuses overflow-scale widths: null, never a negative-height IHDR") {
    // w·bpp overflows Int to a small/negative divisor; Java's % follows
    // the dividend's sign, so a divisible pixel length would pass the old
    // guard and a nonsense height would land in IHDR. The encoder must
    // bound w at the decoder's bomb cap instead (MaxPixels / bpp).
    val px = rgbPix(6, 3)
    for (w <- Seq(1431655766, Int.MaxValue, (1 << 26) / 3 + 1)) {
      val got = Seq((px, w)).toDF("px", "w")
        .select(Multimodal.pngEncodeRgb($"px", $"w", filterMode = 0, stored = true))
        .as[Array[Byte]].head()
      assert(got == null, s"width $w must refuse to encode")
    }
    // the cap itself still encodes (bound, not off-by-one under it)
    val okW = 6
    val ok = Seq((px, okW)).toDF("px", "w")
      .select(Multimodal.pngEncodeRgb($"px", $"w", filterMode = 0, stored = true))
      .as[Array[Byte]].head()
    assert(ok != null)
  }

  test("pngEncodeRgb emits a REAL truecolor PNG: ImageIO reads back the exact planted channels (both color types)") {
    for (alpha <- Seq(false, true)) {
      val bpp = if (alpha) 4 else 3
      val w = 13; val h = 7
      val px = rgbPix(w * h, bpp)
      val png = encRgb(px, w, -1, st = false, alpha = alpha)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, "ImageIO rejected the encoder's output")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val o = (y * w + x) * bpp
        assert(((argb >> 16) & 0xff) == (px(o) & 0xff), s"R mismatch at ($x,$y) alpha=$alpha")
        assert(((argb >> 8) & 0xff) == (px(o + 1) & 0xff), s"G mismatch at ($x,$y) alpha=$alpha")
        assert((argb & 0xff) == (px(o + 2) & 0xff), s"B mismatch at ($x,$y) alpha=$alpha")
        if (alpha)
          assert(((argb >>> 24) & 0xff) == (px(o + 3) & 0xff), s"A mismatch at ($x,$y)")
      }
    }
  }

  test("pngDecodeLuma decodes an EXTERNALLY-encoded color PNG (ImageIO writer) to the exact luma — lossless, no tolerance") {
    val w = 17; val h = 9
    val px = rgbPix(w * h, 3)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y,
        ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) | (px(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val got = decPngLuma(bos.toByteArray)
    // PNG is lossless and the luma formula is exact integer arithmetic, so
    // cross-decoder equality is EXACT (unlike the ±1 IDCT JPEG pins)
    assert(got != null && got.sameElements(lumaOf(px, 3)),
      "third-party color PNG decoded wrong")
  }

  test("pngDecodeLuma: third-party PALETTE PNGs decode (ImageIO cross-pin); 16-bit stays out of contract") {
    // ImageIO writes TYPE_BYTE_INDEXED as a palette (color type 3, depth
    // 8) PNG with its own PLTE — a third-party palette encoder, so a PLTE
    // lookup bug shared with the fixture encoder cannot hide. Fill with
    // varied colors and pin our luma against ImageIO's own RGB read.
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, ((x * 28) << 16) | ((y * 31) << 8) | ((x * y * 7) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    assert(bytes(25) == 3, "ImageIO did not write a palette PNG")
    val got = decPngLuma(bytes)
    // expected luma from ImageIO's own decode of its own bytes (the
    // round-tripped palette colors, not the setRGB inputs — indexed
    // images quantize to the palette)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val want = Array.tabulate(72) { i =>
      val rgb = back.getRGB(i % 9, i / 9)
      luma601((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff).toByte
    }
    assert(got != null && got.sameElements(want), "third-party palette PNG decoded wrong")
    // 16-bit grayscale DECODES now (high byte — the depth-matrix tests
    // pin the reduction); a blank 16-bit canvas lands on all-zero luma
    val img16 = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val bos16 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img16, "png", bos16))
    val got16 = decPngLuma(bos16.toByteArray)
    assert(got16 != null && got16.length == 64 && got16.forall(_ == 0))
    // and the usual corrupt-payload stance
    assert(decPngLuma("not a png at all, truly".getBytes("UTF-8")) == null)
  }

  test("imageNearDupPng pairs identical TRUECOLOR PNGs at hamming 0 through the real color decode path") {
    val rgba = rgbPix(72, 4)
    val inverted = rgba.map(b => (~b).toByte)
    val imgs = Seq((1L, rgba), (2L, rgba), (3L, inverted)).toDF("id", "px")
      .select($"id",
        Multimodal.pngEncodeRgb($"px", lit(9), filterMode = -1, stored = false,
          alpha = true).as("png"))
    val pairs = Multimodal.imageNearDupPng(imgs, 9, 8, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("assembleSamples joins text + media + embedding into one sample struct per doc") {
    val dir = TestSpark.Sf0001
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val media = docs.select($"doc_id", $"text".cast("binary").as("media"))
    val emb = Tables.embeddings(spark, dir)
    val got = Multimodal.assembleSamples(docs, media, emb)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "sample"))
    val one = got.select($"sample.meta.n_bytes", $"sample.meta.modality").limit(1)
      .as[(Long, String)].head()
    assert(one._1 > 0 && one._2 == "application/octet-stream")
    assert(got.count() > 0)
  }

  // ---- baseline JPEG: encode fixture, real decode, cross-decoder pins ----

  /** Per-8×8-block-constant bitmap: pixel (y,x) = vals(blockRow·bx + blockCol). */
  private def blockBitmap(w: Int, h: Int, vals: Array[Int]): Array[Byte] = {
    val bx = (w + 7) / 8
    Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      vals((y / 8) * bx + x / 8).toByte
    }
  }
  /** A value in [1,64] ∪ [192,255] — DC category 7, the fixture contract. */
  private def cat7(rnd: scala.util.Random): Int = {
    val low = rnd.nextInt(128)
    if (low < 64) low + 1 else low + 128
  }
  private def encJpeg(px: Array[Byte], w: Int): Array[Byte] =
    Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Dc($"px", lit(w))).as[Array[Byte]].head()
  private def decJpeg(b: Array[Byte]): Array[Byte] =
    Seq(Tuple1(b)).toDF("j")
      .select(Multimodal.jpegDecodeGray8($"j")).as[Array[Byte]].head()
  private def imageIoPixels(jpeg: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    if (img == null) None
    else {
      val r = img.getRaster
      Some((img.getWidth, img.getHeight,
        Array.tabulate(img.getWidth * img.getHeight)(i =>
          r.getSample(i % img.getWidth, i / img.getWidth, 0))))
    }
  }

  test("jpegEncodeGray8Dc emits a real baseline JPEG that round-trips bit-exactly and ImageIO accepts") {
    val rnd = new scala.util.Random(42)
    val vals = Array.fill(9 * 8)(cat7(rnd))
    val px = blockBitmap(72, 64, vals)
    val jpeg = encJpeg(px, 72)
    assert(jpeg != null)
    // a genuine JPEG: modality sniff + the SOF-walking dims parser agree
    val (mod, dw, dh) = Seq(Tuple1(jpeg)).toDF("j")
      .select(Multimodal.modality($"j").as("m"), Multimodal.jpegDims($"j").as("d"))
      .select($"m", $"d.width", $"d.height")
      .as[(String, Long, Long)].head()
    assert(mod == "image/jpeg" && dw == 72L && dh == 64L)
    // our decoder: bit-exact on DC-only blocks (integer closed form)
    val mine = decJpeg(jpeg)
    assert(mine != null && mine.sameElements(px))
    // an INDEPENDENT standards decoder agrees (its fixed-point IDCT may
    // differ by the usual ±1 — T.81 does not pin IDCT rounding)
    val Some((iw, ih, ref)) = imageIoPixels(jpeg)
    assert(iw == 72 && ih == 64)
    val maxDiff = ref.indices.map(i => math.abs(ref(i) - (px(i) & 0xff))).max
    assert(maxDiff <= 1, s"ImageIO disagrees by $maxDiff")
    // analytic layout: MCU i's magnitude byte sits verbatim at 162 + 4i,
    // its EXTEND inverse is the planted block value (the SQL oracle's move)
    vals.indices.foreach { i =>
      val d = jpeg(162 + 4 * i) & 0xff
      val dc = if (d < 64) d - 127 else d
      assert(dc + 128 == vals(i), s"block $i")
      assert((jpeg(163 + 4 * i) & 0xff) == 0x7F)
    }
    // restart markers cycle D0..D7 between the aligned MCU cells
    (0 until vals.length - 1).foreach { i =>
      assert((jpeg(164 + 4 * i) & 0xff) == 0xFF)
      assert((jpeg(165 + 4 * i) & 0xff) == 0xD0 + (i % 8), s"RST after MCU $i")
    }
  }

  test("jpegDecodeGray8 crops partial edge blocks: 12×10 decodes exactly over a 2×2 block grid") {
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(4)(cat7(rnd))
    val px = blockBitmap(12, 10, vals)
    val jpeg = encJpeg(px, 12)
    assert(jpeg != null)
    val mine = decJpeg(jpeg)
    assert(mine != null && mine.sameElements(px))
    val Some((iw, ih, ref)) = imageIoPixels(jpeg)
    assert(iw == 12 && ih == 10)
    assert(ref.indices.map(i => math.abs(ref(i) - (px(i) & 0xff))).max <= 1)
  }

  test("jpegDecodeGray8 decodes third-party (ImageIO) JPEGs with real AC coefficients, stuffing, within IDCT tolerance") {
    // a gradient+noise gray image through the JDK's own encoder: standard
    // Annex-K-style tables, AC run/size symbols, EOBs, and (asserted
    // below) at least one stuffed 0xFF00 in the entropy-coded data — the
    // decode paths the DC-only fixture can't reach
    val w = 41; val h = 22 // non-multiples of 8: third-party crop path too
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 128 + 90 * math.sin(x * 0.9) + 30 * math.cos(y * 1.7) + rnd.nextInt(31) - 15
      img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, v.toInt)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    // find the scan (SOS segment) and confirm a stuffed FF00 exists in it
    val sos = (0 until jpeg.length - 1).find(i =>
      (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) == 0xDA).get
    val hasStuffing = (sos until jpeg.length - 1).exists(i =>
      (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) == 0x00)
    assert(hasStuffing, "fixture regression: no byte stuffing in this encode; change the seed")
    val mine = decJpeg(jpeg)
    assert(mine != null && mine.length == w * h)
    val Some((iw, ih, ref)) = imageIoPixels(jpeg)
    assert(iw == w && ih == h)
    val diffs = ref.indices.map(i => math.abs(ref(i) - (mine(i) & 0xff)))
    assert(diffs.max <= 2, s"max cross-decoder diff ${diffs.max}")
    assert(diffs.sum.toDouble / diffs.size <= 0.5, "systematic decode bias")
  }

  test("jpegDecodeGray8/jpegEncodeGray8Dc null out of contract, never throw") {
    def decodes(b: Array[Byte]): Boolean = decJpeg(b) != null
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(4)(cat7(rnd))
    val good = encJpeg(blockBitmap(16, 16, vals), 16)
    assert(decodes(good))
    // encoder: a mid-gray block mean (DC 0) is outside category 7 — the
    // documented fixture contract — so the encode refuses, not corrupts
    assert(encJpeg(Array.fill(64)(128.toByte), 8) == null)
    // truncated scan
    assert(!decodes(good.dropRight(6)))
    // progressive marker (SOF0 → SOF2 patch; CRC-free format, so the
    // parse must hit the explicit out-of-contract reject)
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(!decodes(prog))
    // a restart marker out of sequence
    val badRst = good.clone()
    val rst = (162 until badRst.length - 1).find(i =>
      (badRst(i) & 0xff) == 0xFF && (badRst(i + 1) & 0xff) >= 0xD0 &&
        (badRst(i + 1) & 0xff) <= 0xD7).get
    badRst(rst + 1) = (0xD0 + (((badRst(rst + 1) & 0x0f) + 3) % 8)).toByte
    assert(!decodes(badRst))
    // 3-component color JPEG: out of the grayscale contract
    val cimg = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(cimg, "jpg", bos)
    assert(!decodes(bos.toByteArray))
    // not a JPEG at all
    assert(!decodes("definitely not a JPEG".getBytes("UTF-8")))
    assert(!decodes(Array[Byte](0xFF.toByte, 0xD8.toByte)))
  }

  // ---- progressive (SOF2) JPEG ----

  private def encJpegProg(px: Array[Byte], w: Int): Array[Byte] =
    Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeGray8Prog($"px", lit(w))).as[Array[Byte]].head()
  private def decJpegLumaT(b: Array[Byte]): Array[Byte] =
    Seq(Tuple1(b)).toDF("j")
      .select(Multimodal.jpegDecodeLuma($"j")).as[Array[Byte]].head()

  test("progressive fixture round-trips bit-exactly (5 real scans: DC SA, banded AC, EOB runs); SOF2 present; narrow gray8 pin refuses") {
    val rnd = new scala.util.Random(23)
    for ((w, h) <- Seq((72, 64), (12, 10), (8, 8), (96, 96), (17, 9))) {
      val bx = (w + 7) / 8; val by = (h + 7) / 8
      val px = blockBitmap(w, h, Array.fill(bx * by)(cat7(rnd)))
      val jpeg = encJpegProg(px, w)
      assert(jpeg != null, s"$w x $h encode refused")
      // genuinely progressive: the stream's SOF marker is C2
      val sof = (0 until jpeg.length - 1).find(i =>
        (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) >= 0xC0 &&
          (jpeg(i + 1) & 0xff) <= 0xCF && (jpeg(i + 1) & 0xff) != 0xC4).get
      assert((jpeg(sof + 1) & 0xff) == 0xC2)
      // five scans on the wire
      val nScans = (0 until jpeg.length - 1).count(i =>
        (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) == 0xDA)
      assert(nScans == 5, s"expected 5 scans, found $nScans")
      // wide decode: bit-exact on DC-only blocks (integer closed form)
      val mine = decJpegLumaT(jpeg)
      assert(mine != null && mine.sameElements(px), s"$w x $h round-trip failed")
      // an independent standards decoder agrees within IDCT tolerance
      val Some((iw, ih, ref)) = imageIoPixels(jpeg)
      assert(iw == w && ih == h)
      assert(ref.indices.map(i => math.abs(ref(i) - (px(i) & 0xff))).max <= 1)
      // the narrow baseline-gray pin refuses progressive streams
      assert(decJpeg(jpeg) == null)
    }
  }

  /** Hand-assembly: a progressive gray JPEG from explicit scan payloads —
    * independent of the production encoder (its own bit writer, its own
    * Huffman tables, written straight from T.81 Annex G). */
  private object ProgHand {
    final class BitW {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var nb = 0
      def bit(v: Int): Unit = {
        acc = (acc << 1) | (v & 1); nb += 1
        if (nb == 8) {
          out.write(acc); if (acc == 0xFF) out.write(0x00); acc = 0; nb = 0
        }
      }
      def bits(v: Int, t: Int): Unit = { var i = t - 1; while (i >= 0) { bit((v >> i) & 1); i -= 1 } }
      def flush(): Unit = while (nb != 0) bit(1)
    }
    // DC table: categories 0..7, all at length 4 → code of cat c is c.
    // AC table: these symbols, all at length 4 → code of a symbol is its
    // index here.
    val AcSyms = Seq(0x00, 0x02, 0x03, 0x11, 0x12, 0x21, 0x22, 0x23, 0x31, 0xE3, 0xF0, 0x10)
    def dcCat(bw: BitW, c: Int): Unit = bw.bits(c, 4)
    def ac(bw: BitW, sym: Int): Unit = bw.bits(AcSyms.indexOf(sym), 4)
    def mag(bw: BitW, v: Int, cat: Int): Unit =
      bw.bits(if (v > 0) v else v + (1 << cat) - 1, cat)
    /** 16×8 single-component SOF2 stream with the shared tables, DRI
      * `ri` (0 = none), and the given scans: (Ss, Se, Ah, Al, payload). */
    def stream(scans: Seq[(Int, Int, Int, Int, Array[Byte])], ri: Int = 0): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def wr(bytes: Int*): Unit = bytes.foreach(v => o.write(v & 0xff))
      wr(0xFF, 0xD8)
      wr(0xFF, 0xDB, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => o.write(8))
      wr(0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x10, 0x01, 0x01, 0x11, 0x00)
      wr(0xFF, 0xC4, 0x00, 0x1B, 0x00)
      wr(0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      wr(0, 1, 2, 3, 4, 5, 6, 7)
      wr(0xFF, 0xC4, 0x00, 16 + 3 + AcSyms.length, 0x10)
      wr(0, 0, 0, AcSyms.length, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      AcSyms.foreach(o.write)
      if (ri > 0) wr(0xFF, 0xDD, 0x00, 0x04, (ri >> 8) & 0xff, ri & 0xff)
      scans.foreach { case (ss, se, ah, al, payload) =>
        wr(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, ss, se, (ah << 4) | al)
        o.write(payload)
      }
      wr(0xFF, 0xD9)
      o.toByteArray
    }
  }

  test("progressive spec vectors: one-shot, successive-approximation, and band-split codings of the SAME coefficients decode identically (ZRL, cross-block EOB runs, refinement births and correction bits)") {
    import ProgHand._
    // target (zig-zag indices): block0 dc=80, k1=5, k20=7;
    //                           block1 dc=90, k2=-3, k5=+1
    // ---- variant A: plain spectral selection, Al=0 throughout ----
    val a1 = new BitW // DC first Al=0: diffs 80 (cat7), 10 (cat4)
    dcCat(a1, 7); mag(a1, 80, 7); dcCat(a1, 4); mag(a1, 10, 4); a1.flush()
    val a2 = new BitW // AC first 1..63 Al=0
    ac(a2, 0x03); mag(a2, 5, 3)          // b0 k1=5
    ac(a2, 0xF0)                          // ZRL: 16 zeros
    ac(a2, 0x23); mag(a2, 7, 3)          // +2 zeros → k20=7
    ac(a2, 0x00)                          // EOB0
    ac(a2, 0x12); mag(a2, -3, 2)         // b1: 1 zero → k2=-3
    ac(a2, 0x21); mag(a2, 1, 1)          // 2 zeros → k5=+1
    ac(a2, 0x00)                          // EOB0
    a2.flush()
    val va = stream(Seq((0, 0, 0, 0, a1.out.toByteArray), (1, 63, 0, 0, a2.out.toByteArray)))
    // ---- variant B: successive approximation (Al=1 then refine) ----
    val b1 = new BitW // DC first Al=1: diffs of 40, 45 → 40 (cat6), 5 (cat3)
    dcCat(b1, 6); mag(b1, 40, 6); dcCat(b1, 3); mag(b1, 5, 3); b1.flush()
    val b2 = new BitW // DC refine: low bits 0, 0
    b2.bit(0); b2.bit(0); b2.flush()
    val b3 = new BitW // AC first Al=1: high halves (5→2, 7→3, -3→-1, 1→0)
    ac(b3, 0x02); mag(b3, 2, 2)          // b0 k1 high=2
    ac(b3, 0xF0)
    ac(b3, 0x22); mag(b3, 3, 2)          // k20 high=3
    ac(b3, 0x00)
    ac(b3, 0x11); mag(b3, -1, 1)         // b1 k2 high=-1
    ac(b3, 0x00)                          // k5 high=0: not coded
    b3.flush()
    val b4 = new BitW // AC refine to Al=0
    // block0: EOB0, then the sweep's correction bits for k1 (5&1=1) and
    // k20 (7&1=1)
    ac(b4, 0x00); b4.bit(1); b4.bit(1)
    // block1: (r=3, s=1) — three zero-HISTORY slots (k1, k3, k4; the
    // nonzero k2 doesn't count) then birth +1 at k5; the advance crosses
    // k2 and appends its correction bit (|-3|&1 = 1)
    ac(b4, 0x31); b4.bit(1) // sign: positive birth
    b4.bit(1)               // correction bit for k2 → -3
    ac(b4, 0x00)            // EOB0 for the rest of the band
    b4.flush()
    val vb = stream(Seq((0, 0, 0, 1, b1.out.toByteArray), (0, 0, 1, 0, b2.out.toByteArray),
      (1, 63, 0, 1, b3.out.toByteArray), (1, 63, 1, 0, b4.out.toByteArray)))
    // ---- variant C: band split with a cross-block EOB run ----
    val c2 = new BitW // AC first 1..5 Al=0
    ac(c2, 0x03); mag(c2, 5, 3)          // b0 k1=5
    ac(c2, 0x00)                          // EOB0 (k2..5 zero)
    ac(c2, 0x12); mag(c2, -3, 2)         // b1 k2=-3
    ac(c2, 0x21); mag(c2, 1, 1)          // k5=+1 lands on Se: no EOB follows
    c2.flush()
    val c3 = new BitW // AC first 6..63 Al=0
    ac(c3, 0xE3); mag(c3, 7, 3)          // b0: 14 zeros → k20=7
    ac(c3, 0x10); c3.bits(0, 1)          // EOB run of 2: covers b0's tail AND b1
    c3.flush()
    val vc = stream(Seq((0, 0, 0, 0, a1.out.toByteArray), (1, 5, 0, 0, c2.out.toByteArray),
      (6, 63, 0, 0, c3.out.toByteArray)))
    val da = decJpegLumaT(va); val db = decJpegLumaT(vb); val dc = decJpegLumaT(vc)
    assert(da != null && db != null && dc != null, "a spec vector failed to decode")
    assert(da.sameElements(db), "successive-approximation coding decoded differently")
    assert(da.sameElements(dc), "band-split coding decoded differently")
    // absolute grounding: an independent standards decoder agrees
    val Some((iw, ih, ref)) = imageIoPixels(va)
    assert(iw == 16 && ih == 8)
    assert(ref.indices.map(i => math.abs(ref(i) - (da(i) & 0xff))).max <= 1,
      "ImageIO disagrees with the spec-vector decode")
  }

  test("progressive restart markers: byte-align + sequence check + predictor reset; out-of-sequence refuses") {
    import ProgHand._
    // DC-only stream, DRI=1, RST0 between the two blocks — each block's
    // diff is its absolute DC because the predictor resets
    val s1 = new BitW
    dcCat(s1, 7); mag(s1, 80, 7); s1.flush()
    val s1b = new BitW
    dcCat(s1b, 7); mag(s1b, 90, 7); s1b.flush()
    val payload = s1.out.toByteArray ++ Array[Byte](0xFF.toByte, 0xD0.toByte) ++ s1b.out.toByteArray
    val v = stream(Seq((0, 0, 0, 0, payload)), ri = 1)
    val got = decJpegLumaT(v)
    // DC-only blocks: flat dcq+128 (the fixture closed form)
    val want = Array.tabulate(16 * 8)(i => (if (i % 16 < 8) 208 else 218).toByte)
    assert(got != null && got.sameElements(want),
      s"restart vector decoded ${if (got == null) "null" else got.toSeq}")
    // out-of-sequence restart refuses
    val bad = v.clone()
    val rst = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xFF && (bad(i + 1) & 0xff) == 0xD0).get
    bad(rst + 1) = 0xD3.toByte
    assert(decJpegLumaT(bad) == null)
  }

  test("progressive via a third-party encoder: ImageIO MODE_DEFAULT multi-scan streams (gray and color) decode within IDCT tolerance") {
    def progBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    def sofOf(b: Array[Byte]): Int = {
      val i = (0 until b.length - 1).find(j =>
        (b(j) & 0xff) == 0xFF && (b(j + 1) & 0xff) >= 0xC0 &&
          (b(j + 1) & 0xff) <= 0xCF && (b(j + 1) & 0xff) != 0xC4).get
      b(i + 1) & 0xff
    }
    // gray: gradient + noise so the scans carry real AC coefficients,
    // EOB runs, and refinement correction bits
    val w = 41; val h = 22
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 128 + 90 * math.sin(x * 0.9) + 30 * math.cos(y * 1.7) + rnd.nextInt(31) - 15
      img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, v.toInt)))
    }
    val jpeg = progBytes(img)
    assert(sofOf(jpeg) == 0xC2, "ImageIO did not write a progressive JPEG")
    val nScans = (0 until jpeg.length - 1).count(i =>
      (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) == 0xDA)
    assert(nScans > 1, "not multi-scan")
    val mine = decJpegLumaT(jpeg)
    assert(mine != null && mine.length == w * h)
    val Some((iw, ih, ref)) = imageIoPixels(jpeg)
    assert(iw == w && ih == h)
    val diffs = ref.indices.map(i => math.abs(ref(i) - (mine(i) & 0xff)))
    assert(diffs.max <= 2, s"max cross-decoder diff ${diffs.max}")
    assert(diffs.sum.toDouble / diffs.size <= 0.5, "systematic decode bias")
    // color: 3-component progressive — luma scans decode, chroma-only AC
    // scans are marker-skipped; our Y vs ImageIO's RGB→luma within the
    // YCbCr round-trip tolerance
    val cimg = new java.awt.image.BufferedImage(37, 19, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 19; x <- 0 until 37)
      cimg.setRGB(x, y, ((x * 7 % 256) << 16) | ((y * 13 % 256) << 8) | ((x * y) % 256))
    val cjpeg = progBytes(cimg)
    assert(sofOf(cjpeg) == 0xC2)
    val cmine = decJpegLumaT(cjpeg)
    assert(cmine != null && cmine.length == 37 * 19)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cjpeg))
    val cdiffs = (0 until 37 * 19).map { i =>
      val rgb = back.getRGB(i % 37, i / 37)
      val l = luma601((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      math.abs(l - (cmine(i) & 0xff))
    }
    assert(cdiffs.max <= 3, s"max color cross-decoder diff ${cdiffs.max}")
  }

  test("imageNearDupJpeg: decode → dHash → Hamming-LSH pairs bit-identical JPEG copies only") {
    val rnd = new scala.util.Random(5)
    def jpegOf(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      encJpeg(blockBitmap(72, 64, Array.fill(72)(cat7(r2))), 72)
    }
    val imgs = Seq(
      (1L, jpegOf(101)), (2L, jpegOf(101)), // bit-identical pair
      (3L, jpegOf(202)), (4L, jpegOf(303)),
      (5L, "corrupt".getBytes("UTF-8"))) // drops at decode, never pairs
      .toDF("id", "jpeg")
    val pairs = Multimodal.imageNearDupJpeg(imgs, 72, 64, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  // ---------- color (YCbCr) baseline JPEG: luma decode path ----------

  /** Per-MCU-constant bitmap for luma sampling hs×vs: pixel (y,x) =
    * vals(mcuRow·mxN + mcuCol) — the [[Multimodal.jpegEncodeYccDc]]
    * fixture contract shape. */
  private def mcuBitmap(w: Int, h: Int, hs: Int, vs: Int, vals: Array[Int]): Array[Byte] = {
    val mxN = (w + 8 * hs - 1) / (8 * hs)
    Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      vals((y / (8 * vs)) * mxN + x / (8 * hs)).toByte
    }
  }
  private def encYcc(px: Array[Byte], w: Int, hs: Int, vs: Int,
      cb: Int = 128, cr: Int = 128): Array[Byte] =
    Seq(Tuple1(px)).toDF("px")
      .select(Multimodal.jpegEncodeYccDc($"px", lit(w), hs, vs, cb, cr))
      .as[Array[Byte]].head()
  private def decLuma(b: Array[Byte]): Array[Byte] =
    Seq(Tuple1(b)).toDF("j")
      .select(Multimodal.jpegDecodeLuma($"j")).as[Array[Byte]].head()

  test("jpegEncodeYccDc round-trips bit-exactly through jpegDecodeLuma at all four samplings, partial edge MCUs included") {
    val rnd = new scala.util.Random(17)
    for ((hs, vs) <- Seq((1, 1), (2, 1), (1, 2), (2, 2))) {
      // dims chosen to leave a partial MCU on both axes for the 2× factors
      val w = 8 * hs * 2 + 5; val h = 8 * vs * 2 + 3
      val mxN = (w + 8 * hs - 1) / (8 * hs); val myN = (h + 8 * vs - 1) / (8 * vs)
      val px = mcuBitmap(w, h, hs, vs, Array.fill(mxN * myN)(cat7(rnd)))
      val jpeg = encYcc(px, w, hs, vs, cb = 32, cr = 224)
      assert(jpeg != null, s"encode refused at ${hs}x$vs")
      // genuine JPEG: sniff + the SOF-walking dims parser agree
      val (mod, dw, dh) = Seq(Tuple1(jpeg)).toDF("j")
        .select(Multimodal.modality($"j").as("m"), Multimodal.jpegDims($"j").as("d"))
        .select($"m", $"d.width", $"d.height")
        .as[(String, Long, Long)].head()
      assert(mod == "image/jpeg" && dw == w && dh == h, s"dims at ${hs}x$vs")
      val mine = decLuma(jpeg)
      assert(mine != null && mine.sameElements(px), s"round-trip at ${hs}x$vs")
      // the gray decoder keeps its documented single-component contract
      assert(decJpeg(jpeg) == null, s"gray decoder must refuse color at ${hs}x$vs")
    }
  }

  test("jpegEncodeYccDc with neutral chroma: an INDEPENDENT standards decoder (ImageIO) sees the luma as gray, within IDCT tolerance") {
    val rnd = new scala.util.Random(23)
    val px = mcuBitmap(48, 32, 2, 2, Array.fill(3 * 2)(cat7(rnd)))
    // Cb = Cr = 128 ⇒ YCbCr→RGB is the identity on Y, so ImageIO's RGB
    // must be (Y,Y,Y) up to its fixed-point IDCT's usual ±1
    val jpeg = encYcc(px, 48, 2, 2)
    assert(jpeg != null)
    val Some((iw, ih, ref)) = imageIoPixels(jpeg) // band 0 = R
    assert(iw == 48 && ih == 32)
    val maxDiff = ref.indices.map(i => math.abs(ref(i) - (px(i) & 0xff))).max
    assert(maxDiff <= 1, s"ImageIO disagrees by $maxDiff")
  }

  test("jpegEncodeYccDc byte layout: luma DC magnitudes at 173 + stride·i, repeat/chroma cells, RST cycle (the anti-compensating-bug pin)") {
    val rnd = new scala.util.Random(31)
    val vals = Array.fill(2 * 2)(cat7(rnd))
    val px = mcuBitmap(24, 20, 2, 2, vals) // 2×2 MCU grid, partial edges
    val jpeg = encYcc(px, 24, 2, 2, cb = 32, cr = 224)
    assert(jpeg != null)
    val stride = 2 * (2 * 2 + 2) + 2 // four Y cells + Cb + Cr, then RSTₙ
    vals.indices.foreach { i =>
      val base = 173 + stride * i
      // first luma cell: EXTEND⁻¹ of the magnitude byte is the planted value
      val d = jpeg(base) & 0xff
      val dc = if (d < 64) d - 127 else d
      assert(dc + 128 == vals(i), s"MCU $i DC")
      assert((jpeg(base + 1) & 0xff) == 0x00, s"MCU $i EOB")
      // repeated luma blocks: category-0 cells
      (1 to 3).foreach { j =>
        assert((jpeg(base + 2 * j) & 0xff) == 0x80, s"MCU $i repeat $j")
        assert((jpeg(base + 2 * j + 1) & 0xff) == 0x00)
      }
      // chroma cells: cb−128 = −96 → mag 31; cr−128 = 96 → mag 96
      assert((jpeg(base + 8) & 0xff) == 31, s"MCU $i Cb")
      assert((jpeg(base + 10) & 0xff) == 96, s"MCU $i Cr")
      if (i < vals.length - 1) {
        assert((jpeg(base + 12) & 0xff) == 0xFF)
        assert((jpeg(base + 13) & 0xff) == 0xD0 + (i % 8), s"RST after MCU $i")
      }
    }
    assert((jpeg(jpeg.length - 2) & 0xff) == 0xFF && (jpeg(jpeg.length - 1) & 0xff) == 0xD9)
  }

  test("jpegDecodeLuma decodes third-party (ImageIO) COLOR JPEGs — real subsampled chroma, AC coefficients — within cross-decoder tolerance") {
    // gray-content COLOR image (R=G=B ⇒ Cb≈Cr≈128): the JDK writer emits a
    // real 3-component subsampled YCbCr JPEG, and converting its decoded
    // RGB back to luma is exact up to rounding — isolating OUR luma path
    // from chroma reconstruction differences
    val w = 37; val h = 26
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rnd = new scala.util.Random(13)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255,
        (128 + 80 * math.sin(x * 0.7) + 40 * math.cos(y * 1.3) + rnd.nextInt(21) - 10).toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    // confirm it really is 3-component (SOF0 Nf byte)
    val sof = (0 until jpeg.length - 1).find(i =>
      (jpeg(i) & 0xff) == 0xFF && (jpeg(i + 1) & 0xff) == 0xC0).get
    assert((jpeg(sof + 9) & 0xff) == 3, "fixture regression: JDK wrote a non-color JPEG")
    val mine = decLuma(jpeg)
    assert(mine != null && mine.length == w * h, "luma decode refused a JDK color JPEG")
    val ref = {
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      Array.tabulate(w * h) { i =>
        val rgb = back.getRGB(i % w, i / w)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val bl = rgb & 0xff
        math.round(0.299 * r + 0.587 * g + 0.114 * bl).toInt
      }
    }
    val diffs = ref.indices.map(i => math.abs(ref(i) - (mine(i) & 0xff)))
    assert(diffs.max <= 3, s"max cross-decoder luma diff ${diffs.max}")
    assert(diffs.sum.toDouble / diffs.size <= 1.0, "systematic luma decode bias")
    // and the gray decoder keeps refusing color — the luma expression is
    // the documented superset, not a changed contract
    assert(decJpeg(jpeg) == null)
  }

  test("jpegEncodeYccDc/jpegDecodeLuma null out of contract, never throw") {
    val rnd = new scala.util.Random(41)
    val px = mcuBitmap(32, 32, 2, 2, Array.fill(4)(cat7(rnd)))
    val good = encYcc(px, 32, 2, 2)
    assert(decLuma(good) != null)
    // encoder: luma not per-MCU-constant — block (0,0) at 224 while the
    // rest of its MCU sits at 40 puts two different block DCs in one MCU
    val uneven = Array.tabulate(32 * 32) { j =>
      val y = j / 32; val x = j % 32
      (if (y < 8 && x < 8) 224 else 40).toByte
    }
    assert(encYcc(uneven, 32, 2, 2) == null)
    // encoder: out-of-category chroma rejected at construction (require)
    intercept[Exception] { encYcc(px, 32, 2, 2, cb = 100) }
    // decoder: luma sampling factor outside {1,2}
    val badSamp = good.clone()
    val sof = (0 until badSamp.length - 1).find(j =>
      (badSamp(j) & 0xff) == 0xFF && (badSamp(j + 1) & 0xff) == 0xC0).get
    badSamp(sof + 11) = 0x33.toByte // Y sampling 3×3
    assert(decLuma(badSamp) == null)
    // decoder: chroma sampling exceeding luma's (luma must carry the max)
    val badMax = good.clone()
    badMax(sof + 11) = 0x11.toByte // Y 1×1 while Cb stays… also 1×1 — craft Cb 2×1
    badMax(sof + 14) = 0x21.toByte
    assert(decLuma(badMax) == null)
    // truncated color scan
    assert(decLuma(good.dropRight(6)) == null)
    // a color restart marker out of sequence
    val badRst = good.clone()
    val rst = (173 until badRst.length - 1).find(j =>
      (badRst(j) & 0xff) == 0xFF && (badRst(j + 1) & 0xff) >= 0xD0 &&
        (badRst(j + 1) & 0xff) <= 0xD7).get
    badRst(rst + 1) = (0xD0 + (((badRst(rst + 1) & 0x0f) + 3) % 8)).toByte
    assert(decLuma(badRst) == null)
    // not a JPEG at all
    assert(decLuma("nope".getBytes("UTF-8")) == null)
  }

  test("imageNearDupJpeg pairs identical COLOR JPEGs at hamming 0 through the luma decode path") {
    val rnd = new scala.util.Random(59)
    def colorJpegOf(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      // 144×128 at 4:2:0: a 9×8 grid of 16×16 constant MCU tiles — the
      // dHash grid is then an identity over tile values
      encYcc(mcuBitmap(144, 128, 2, 2, Array.fill(72)(cat7(r2))), 144, 2, 2)
    }
    val imgs = Seq(
      (1L, colorJpegOf(7)), (2L, colorJpegOf(7)), // bit-identical pair
      (3L, colorJpegOf(8)), (4L, colorJpegOf(9)),
      (5L, "corrupt".getBytes("UTF-8")))
      .toDF("id", "jpeg")
    val pairs = Multimodal.imageNearDupJpeg(imgs, 144, 128, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  // ---------- WAV: real PCM sample decode ----------

  /** Hand-built canonical 16-bit PCM WAV — independent of [[Multimodal
    * .wavHeader]] so the expression and the fixture builder can't share a
    * compensating layout bug. */
  private def wavOf(samples: Array[Short], channels: Int, rate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit = (0 until n).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    bos.write("RIFF".getBytes("US-ASCII")); le(36L + data.length, 4)
    bos.write("WAVEfmt ".getBytes("US-ASCII")); le(16L, 4)
    le(1L, 2); le(channels, 2); le(rate, 4)
    le(rate.toLong * channels * 2, 4); le(channels * 2, 2); le(16L, 2)
    bos.write("data".getBytes("US-ASCII")); le(data.length, 4)
    bos.write(data)
    bos.toByteArray
  }
  private def pcmStats(wav: Array[Byte], thr: Int = 328): Option[(Long, Long, Long, Long, Long, Long)] = {
    val r = Seq(Tuple1(wav)).toDF("wav")
      .select(Multimodal.wavPcm16Stats($"wav", thr).as("s"))
      .select($"s.n_samples", $"s.peak_abs", $"s.sum_abs", $"s.sum_sq",
        $"s.n_clipped", $"s.n_silent")
      .collect().head
    if (r.isNullAt(0)) None
    else Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
  }

  test("wavPcm16Stats matches a plain-Scala reference on random PCM, and javax.sound agrees on the geometry") {
    val rnd = new scala.util.Random(67)
    val samples = Array.fill(257)((rnd.nextInt(65536) - 32768).toShort) ++
      Array[Short](32767, -32768, 0, 5, -327) // force clip + silence hits
    val wav = wavOf(samples, channels = 1, rate = 16000)
    // an INDEPENDENT reader accepts it and sees the same frame geometry
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFrameLength == samples.length)
    assert(ais.getFormat.getSampleSizeInBits == 16 && ais.getFormat.getChannels == 1)
    val Some((n, peak, sumAbs, sumSq, clipped, silent)) = pcmStats(wav)
    val abs = samples.map(s => math.abs(s.toLong))
    assert(n == samples.length)
    assert(peak == abs.max)
    assert(sumAbs == abs.sum)
    assert(sumSq == abs.map(a => a * a).sum)
    assert(clipped == samples.count(s => s == 32767 || s == -32768))
    assert(silent == abs.count(_ < 328))
  }

  test("wavPcm16Stats counts interleaved stereo samples across both channels") {
    val samples = Array[Short](1000, -1000, 2000, -2000, 32767, 3)
    val Some((n, peak, sumAbs, _, clipped, silent)) =
      pcmStats(wavOf(samples, channels = 2, rate = 8000))
    assert(n == 6 && peak == 32767 && sumAbs == 1000 + 1000 + 2000 + 2000 + 32767 + 3)
    assert(clipped == 1 && silent == 1)
  }

  test("wavPcm16Stats nulls inconsistent geometry: tag/bits flipped without blockAlign, odd/overrunning data, non-WAV") {
    // NOTE: valid float32 / 8-bit PCM profiles now DECODE (the [[Wav]]
    // canonicalization seam) — these patched fixtures refuse because the
    // surgery leaves the geometry inconsistent, not because of the tag
    val good = wavOf(Array[Short](100, -100, 200), 1, 8000)
    assert(pcmStats(good).isDefined)
    val floatWav = good.clone(); floatWav(20) = 3 // float tag but 16 bits
    assert(pcmStats(floatWav).isEmpty)
    val bits8 = good.clone(); bits8(34) = 8 // 8 bits but blockAlign 2
    assert(pcmStats(bits8).isEmpty)
    val odd = good.clone(); odd(40) = 5 // declared data size odd
    assert(pcmStats(odd).isEmpty)
    val overrun = good.clone(); overrun(40) = 64 // declares more than present
    assert(pcmStats(overrun).isEmpty)
    assert(pcmStats("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(pcmStats(Array[Byte]()).isEmpty)
  }

  test("wavEnvelope: bucket boundaries and mean-|s|>>7 values match a plain-Scala reference; too-short and non-WAV null") {
    val rnd = new scala.util.Random(73)
    val samples = Array.fill(701)((rnd.nextInt(65536) - 32768).toShort) // 701 ∤ 72: uneven buckets
    val wav = wavOf(samples, channels = 1, rate = 16000)
    val got = Seq(Tuple1(wav)).toDF("wav")
      .select(Multimodal.wavEnvelope($"wav", 72)).as[Array[Byte]].head()
    assert(got != null && got.length == 72)
    val want = Array.tabulate(72) { k =>
      val start = (k.toLong * samples.length / 72).toInt
      val end = ((k + 1).toLong * samples.length / 72).toInt
      val mean = (start until end).map(i => math.abs(samples(i).toLong)).sum / (end - start)
      math.min(mean >> 7, 255L).toByte
    }
    assert(got.sameElements(want))
    // too short to bucket (fewer samples than buckets) → null, not junk
    val short = wavOf(Array.fill(50)(1000.toShort), 1, 8000)
    assert(Seq(Tuple1(short)).toDF("wav")
      .select(Multimodal.wavEnvelope($"wav", 72)).as[Array[Byte]].head() == null)
    assert(Seq(Tuple1("not audio".getBytes("UTF-8"))).toDF("wav")
      .select(Multimodal.wavEnvelope($"wav", 72)).as[Array[Byte]].head() == null)
  }

  test("audioNearDup pairs bit-identical WAV copies at hamming 0 through the envelope → dHash path, nothing else") {
    def clipOf(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      // 72 constant 16-sample segments — one envelope bucket per segment
      wavOf(Array.tabulate(72 * 16)(i => (r2.nextInt(32768)).toShort)
        .grouped(16).toArray.flatMap(g => Array.fill(16)(g.head)), 1, 16000)
    }
    val clips = Seq(
      (1L, clipOf(11)), (2L, clipOf(11)), // bit-identical pair
      (3L, clipOf(22)), (4L, clipOf(33)),
      (5L, "static".getBytes("UTF-8"))) // undecodable: drops before the shuffle
      .toDF("id", "wav")
    val pairs = Multimodal.audioNearDup(clips, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  // ---------- video: MJPEG AVI container + frame decode ----------

  private def encAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 25): Array[Byte] =
    Seq(Tuple1(frames)).toDF("f")
      .select(Multimodal.aviMjpegEncode($"f", w, h, fps)).as[Array[Byte]].head()
  private def encMp4(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 25,
      format: String = "jpeg"): Array[Byte] =
    Seq(Tuple1(frames)).toDF("f")
      .select(Multimodal.mp4MjpegEncode($"f", w, h, fps, format)).as[Array[Byte]].head()
  private def decAvi(avi: Array[Byte], maxFrames: Int = 4096): Seq[Array[Byte]] = {
    val r = Seq(Tuple1(avi)).toDF("a")
      .select(Multimodal.aviMjpegFrames($"a", maxFrames)).collect().head
    if (r.isNullAt(0)) null else r.getSeq[Array[Byte]](0)
  }

  test("aviMjpegEncode: byte layout matches hand-computed RIFF hex (the anti-compensating-bug pin)") {
    // two toy payloads, the second odd-length to force the RIFF pad byte
    val avi = encAvi(Seq(Array[Byte](0xAB.toByte, 0xCD.toByte), Array[Byte](1, 2, 3)), 320, 240, 25)
    assert(avi != null)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    // movi content = 'movi'(4) + (8+2) + (8+3+1pad) = 26; riff = 4 + 200 + 8 + 26 = 238
    val want =
      "52494646" + "EE000000" + "41564920" +            // RIFF 238 'AVI '
      "4C495354" + "C0000000" + "6864726C" +            // LIST 192 'hdrl'
      "61766968" + "38000000" +                         // avih 56
      "409C0000" + "00000000" + "00000000" + "00000000" + // 40000 µs/frame, 0, 0, 0
      "02000000" + "00000000" + "01000000" + "03000000" + // 2 frames, 0, 1 stream, buf 3
      "40010000" + "F0000000" +                         // 320 × 240
      "00000000" * 4 +                                  // reserved
      "4C495354" + "74000000" + "7374726C" +            // LIST 116 'strl'
      "73747268" + "38000000" +                         // strh 56
      "76696473" + "4D4A5047" +                         // 'vids' 'MJPG'
      "00000000" + "00000000" + "00000000" +            // flags, prio/lang, initial
      "01000000" + "19000000" +                         // scale 1, rate 25
      "00000000" + "02000000" + "03000000" +            // start, length 2, buf 3
      "FFFFFFFF" + "00000000" +                         // quality −1, sample size 0
      "00000000" + "4001F000" +                         // rcFrame (0,0,320,240)
      "73747266" + "28000000" +                         // strf 40
      "28000000" + "40010000" + "F0000000" +            // biSize 40, 320, 240
      "01001800" + "4D4A5047" + "00840300" +            // planes 1/bits 24, 'MJPG', 320·240·3
      "00000000" * 4 +                                  // pels, clr
      "4C495354" + "1A000000" + "6D6F7669" +            // LIST 26 'movi'
      "30306463" + "02000000" + "ABCD" +                // 00dc 2
      "30306463" + "03000000" + "010203" + "00"         // 00dc 3 + pad
    assert(hex(avi) == want)
  }

  test("AVI round-trip: frames out == frames in, JPEG payloads included; walker hops junk and caps at maxFrames") {
    val rnd = new scala.util.Random(83)
    val jpegs = (0 until 5).map(_ =>
      encYcc(mcuBitmap(16, 16, 1, 1, Array.fill(4)(cat7(rnd))), 16, 1, 1))
    assert(jpegs.forall(_ != null))
    val avi = encAvi(jpegs, 16, 16)
    val got = decAvi(avi)
    assert(got != null && got.length == 5)
    got.zip(jpegs).foreach { case (a, b) => assert(a.sameElements(b)) }
    // each extracted frame is itself a decodable color JPEG
    assert(decLuma(got.head) != null)
    // a JUNK chunk spliced before the movi LIST is hopped, not fatal
    val junk = Array[Byte]('J', 'U', 'N', 'K', 4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = avi.take(212) ++ junk ++ avi.drop(212) // 212 = RIFF(12) + hdrl LIST(200)
    // RIFF size field must grow by the splice
    val riffSize = (avi(4) & 0xff) | ((avi(5) & 0xff) << 8) | ((avi(6) & 0xff) << 16)
    val newSize = riffSize + 12
    spliced(4) = (newSize & 0xff).toByte; spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte
    val hopped = decAvi(spliced)
    assert(hopped != null && hopped.length == 5 && hopped.head.sameElements(jpegs.head))
    // bomb stance: maxFrames caps extraction instead of allocating for a liar
    assert(decAvi(avi, maxFrames = 2).length == 2)
  }

  test("aviMjpegFrames nulls off contract, never throws") {
    val rnd = new scala.util.Random(89)
    val jpeg = encYcc(mcuBitmap(16, 16, 1, 1, Array.fill(4)(cat7(rnd))), 16, 1, 1)
    val avi = encAvi(Seq(jpeg), 16, 16)
    assert(decAvi(avi) != null)
    assert(decAvi("RIFFxxxxAVI but not really".getBytes("UTF-8")) == null)
    assert(decAvi(Array[Byte](1, 2, 3)) == null)
    // truncated mid-movi
    assert(decAvi(avi.dropRight(10)) == null)
    // a WAV is RIFF but not 'AVI ' form
    assert(decAvi(wavOf(Array[Short](1, 2, 3, 4), 1, 8000)) == null)
    // declared RIFF size overrunning the buffer
    val lying = avi.clone(); lying(4) = (lying(4) + 64).toByte
    assert(decAvi(lying) == null)
  }

  test("videoFrameSigs: identity at n == nSample, even sampling at n > nSample, null on short or corrupt clips") {
    val rnd = new scala.util.Random(97)
    val frames = (0 until 8).map(_ =>
      encYcc(mcuBitmap(72, 64, 1, 1, Array.fill(72)(cat7(rnd))), 72, 1, 1))
    val avi8 = encAvi(frames, 72, 64)
    val avi4 = encAvi(Seq(0, 2, 4, 6).map(frames), 72, 64)
    val df = Seq((1L, avi8), (2L, avi4)).toDF("id", "avi")
      .select($"id", Multimodal.videoFrameSigs($"avi", 72, 64, 4).as("sig"))
    val got = df.as[(Long, Seq[Long])].collect().toMap
    // sampling 8 frames at nSample=4 picks exactly indices 0,2,4,6
    assert(got(1L) == got(2L) && got(1L).length == 4)
    // per-frame dHash equals the direct single-frame hash
    val direct = Seq(Tuple1(frames.head)).toDF("j")
      .select(Multimodal.dHash(Multimodal.jpegDecodeLuma($"j"), 72, 64)).as[Long].head()
    assert(got(1L).head == direct)
    // too few frames
    val avi2 = encAvi(frames.take(2), 72, 64)
    val short = Seq(Tuple1(avi2)).toDF("avi")
      .select(Multimodal.videoFrameSigs($"avi", 72, 64, 4)).collect().head
    assert(short.isNullAt(0))
    // one sampled frame corrupt → whole signature null (all-or-nothing)
    val corrupt = encAvi(frames.take(3) :+ "bad".getBytes("UTF-8"), 72, 64)
    val cres = Seq(Tuple1(corrupt)).toDF("avi")
      .select(Multimodal.videoFrameSigs($"avi", 72, 64, 4)).collect().head
    assert(cres.isNullAt(0))
  }

  test("mjpegClipSig (one-pass native) agrees bit-for-bit with the composed videoFrameSigs form, nulls included") {
    val rnd = new scala.util.Random(103)
    def frame() = encYcc(mcuBitmap(72, 64, 1, 1, Array.fill(72)(cat7(rnd))), 72, 1, 1)
    val clips = Seq(
      (1L, encAvi((0 until 4).map(_ => frame()), 72, 64)),   // identity sampling
      (2L, encAvi((0 until 7).map(_ => frame()), 72, 64)),   // uneven sampling
      (3L, encAvi((0 until 2).map(_ => frame()), 72, 64)),   // too short → null
      (4L, encAvi(Seq(frame(), frame(), "x".getBytes, frame()), 72, 64)), // corrupt frame → null
      (5L, "not a container".getBytes("UTF-8")))             // off contract → null
      .toDF("id", "avi")
    val got = clips.select($"id",
      Multimodal.videoFrameSigs($"avi", 72, 64, 4).as("composed"),
      Multimodal.mjpegClipSig($"avi", 72, 64, 4).as("native"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null disagreement for id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"sig disagreement for id ${r.getLong(0)}")
    }
    assert(got.count(!_.isNullAt(2)) == 2)
  }

  test("videoNearDup pairs bit-identical MJPEG clips at hamming 0; a clip with one different frame stays out") {
    val rnd = new scala.util.Random(101)
    def frame(seed: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      encYcc(mcuBitmap(72, 64, 1, 1, Array.fill(72)(cat7(r2))), 72, 1, 1)
    }
    def clip(seeds: Int*): Array[Byte] = encAvi(seeds.map(frame), 72, 64)
    val clips = Seq(
      (1L, clip(1, 2, 3, 4)), (2L, clip(1, 2, 3, 4)), // identical footage
      (3L, clip(1, 2, 3, 9)), // shares 3 sampled frames — blocked as candidate, fails verify
      (4L, clip(5, 6, 7, 8)),
      (5L, "no video".getBytes("UTF-8")))
      .toDF("id", "avi")
    val pairs = Multimodal.videoNearDup(clips, 72, 64, nSample = 4, maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming".cast("bigint"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("audioQualityGate: clean clips pass; clipped, silent, and corrupt clips fail with visible stats") {
    def tone(amp: Int, n: Int) = Array.tabulate(n)(i =>
      (if (i % 2 == 0) amp else -amp).toShort)
    val clips = Seq(
      (1L, wavOf(tone(5000, 64), 1, 8000)),   // clean: loud, no clip, no silence
      (2L, wavOf(tone(32767, 64), 1, 8000)),  // every sample at full scale
      (3L, wavOf(Array.fill[Short](64)(0), 1, 8000)), // dead air
      (4L, "not audio".getBytes("UTF-8")))    // undecodable
      .toDF("id", "wav")
    val got = Multimodal.audioQualityGate(clips)
      .select($"id", $"passes", $"n_samples".isNull.as("undecoded"))
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (id, p, u) => id -> ((p, u)) }.toMap
    assert(got(1L) == ((true, false)))
    assert(got(2L) == ((false, false))) // clip fraction 100%
    assert(got(3L) == ((false, false))) // silent and zero RMS
    assert(got(4L) == ((false, true)))  // fails but stays in the report
  }
}
