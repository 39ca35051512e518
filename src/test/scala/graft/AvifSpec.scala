package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.InternalRow

import graft.functions.Native

/** Pins for the HEIF/AVIF image census ([[graft.functions.Native.Bmff]])
  * against REAL encoder output: the committed vectors were produced
  * in-sandbox by libheif.so.1 with the box's aom (AV1) and x265 (HEVC)
  * encoders (tools/gen_avif_vectors.py) — the libwebp-ctypes validation
  * method, container edition. */
class AvifSpec extends AnyFunSuite {

  private def census(b: Array[Byte]): InternalRow =
    Native.AvifMeta(Literal(b)).eval(null).asInstanceOf[InternalRow]

  test("real libheif/aom AVIF: brand, av01 primary, geometry, item count") {
    val r = census(AvifVectors.Avif64x48)
    assert(r != null)
    assert(r.getString(0) == "avif")
    assert(r.getString(1) == "av01")
    assert(r.getString(2) == "av01")
    assert(r.getInt(3) == 64 && r.getInt(4) == 48)
    assert(r.getInt(5) == 1)
  }

  test("real libheif/x265 HEIC: grid primary reports DISPLAY ispe, not tile") {
    val r = census(AvifVectors.Heic64x48Grid)
    assert(r != null)
    assert(r.getString(0) == "heic")
    // the primary item is a derived GRID (2 items: hvc1 tile + grid);
    // its ipma-associated ispe is the 64x48 display size — the 64x64
    // tile ispe sits first in ipco, so a naive first-ispe census would
    // report the wrong geometry (this is the pin's reason to exist)
    assert(r.getString(1) == "grid")
    assert(r.getString(2) == "hevc")
    assert(r.getInt(3) == 64 && r.getInt(4) == 48)
    assert(r.getInt(5) == 2)
  }

  test("fixture builder round-trips through the census; overhead constant") {
    val payload = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    for (heic <- Seq(false, true)) {
      val img = Native.AvifMetaEncode.build(payload, 640, 480, heic)
      assert(img.length == Native.AvifMetaEncode.Overhead + payload.length)
      val r = census(img)
      assert(r != null, s"heic=$heic")
      assert(r.getString(0) == (if (heic) "heic" else "avif"))
      assert(r.getString(1) == (if (heic) "hvc1" else "av01"))
      assert(r.getString(2) == (if (heic) "hevc" else "av01"))
      assert(r.getInt(3) == 640 && r.getInt(4) == 480)
      assert(r.getInt(5) == 1)
    }
  }

  test("classifier: sound HEIF/AVIF is census-depth unsupported, damage is corrupt") {
    def reason(b: Array[Byte]): String = {
      val r = Native.DecodeDropReason(Literal(b)).eval(null)
      if (r == null) null else r.toString
    }
    assert(reason(AvifVectors.Avif64x48) == "unsupported_profile")
    assert(reason(AvifVectors.Heic64x48Grid) == "unsupported_profile")
    // ftyp intact, meta truncated away mid-file → structural damage
    assert(reason(AvifVectors.Avif64x48.take(40)) == "corrupt")
    // an MP4 brand still routes through the sample-table walk, not Bmff
    val mp4ish = AvifVectors.Avif64x48.clone()
    System.arraycopy("isom".getBytes("US-ASCII"), 0, mp4ish, 8, 4)
    assert(reason(mp4ish) == "corrupt") // no moov: the Mp4 walk refuses
  }

  test("census refusals: non-image brand, bomb dims, missing boxes") {
    assert(Native.Bmff.census("not a container".getBytes) == null)
    val payload = Array[Byte](1, 2, 3)
    val img = Native.AvifMetaEncode.build(payload, 640, 480, heic = false)
    // brand swapped to isom → census declines (the Mp4 walk's territory)
    val swapped = img.clone()
    System.arraycopy("isom".getBytes("US-ASCII"), 0, swapped, 8, 4)
    assert(Native.Bmff.census(swapped) == null)
    // ispe width patched past the bomb cap → null (2^20 > 2^16 cap);
    // ispe payload starts at ipco+8+12+8: locate by scanning for 'ispe'
    val bombed = img.clone()
    var i = 0
    var at = -1
    while (at < 0 && i + 4 <= bombed.length) {
      if (bombed(i) == 'i' && bombed(i + 1) == 's' && bombed(i + 2) == 'p' &&
        bombed(i + 3) == 'e') at = i
      i += 1
    }
    assert(at > 0)
    bombed(at + 8) = 0x7f.toByte // width high byte → 2^30-ish
    assert(Native.Bmff.census(bombed) == null)
  }
}
