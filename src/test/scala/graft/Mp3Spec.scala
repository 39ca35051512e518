package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Mp3L3, Mp3Tables}

/** Pins for the MPEG Audio Layer III decode core ([[graft.functions
  * .Mp3L3]]) — the cross-language goldens were produced by the validated
  * Python prototype (tools/mp3_proto.py), so this suite asserts the
  * Scala port is BIT-IDENTICAL to it: same fixture stream bytes out of
  * the encoder, same canonical WAV bytes out of the decoder. The
  * prototype itself was validated in-sandbox by the format's own
  * invariants (Kraft/prefix-complete Huffman tables, granule bit-count
  * exactness on a real encoder stream, the filterbank's near-perfect-
  * reconstruction property, and decode∘encode equality against an
  * independent formula recompute) — see the Mp3L3 scaladoc. */
class Mp3Spec extends AnyFunSuite {

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** The committed golden spec: 4 granules x 16 bytes, (g*31+7*j+3) mod
    * the per-field modulus — same closed form in tools and the oracle. */
  private val goldenSpec: Array[Byte] = {
    val mods = Array(5, 4, 4, 4, 2, 2) ++ Array.fill(10)(11)
    (for (g <- 0 until 4; j <- 0 until 16)
      yield ((g * 31 + 7 * j + 3) % mods(j)).toByte).toArray
  }

  test("fixture encoder matches the prototype byte-for-byte (both variants)") {
    val v0 = Mp3L3.encodeFixture(goldenSpec, 0)
    val v1 = Mp3L3.encodeFixture(goldenSpec, 1)
    assert(v0.length == 834 && v1.length == 834)
    assert(sha256(v0) == "af38da69ab0a1f0e87ff7f4ecd57416cad8cb5f5548538803714bae57b5cd58c")
    assert(sha256(v1) == "d6bb882fae07a06af385771b8db72d3a5d57a290eb19eb4d650bfe7e3777eee9")
    assert(!java.util.Arrays.equals(v0, v1), "variants must be byte-different")
  }

  test("decode matches the prototype bit-for-bit; variants decode identically") {
    val w0 = Mp3L3.decodeToWav(Mp3L3.encodeFixture(goldenSpec, 0))
    val w1 = Mp3L3.decodeToWav(Mp3L3.encodeFixture(goldenSpec, 1))
    assert(sha256(w0) == "d5faf0c4f7f7e2c34f26287f29b69f6717135dd965e640333925690c9e7b3c97")
    assert(java.util.Arrays.equals(w0, w1),
      "byte-different Huffman codings of the same spectrum must decode identically")
    // spot samples (int16 LE at data offset 44): the prototype's values
    def s16(w: Array[Byte], i: Int): Int =
      ((w(44 + 2 * i) & 0xff) | (w(45 + 2 * i) << 8)).toShort.toInt
    val expect = Array(2314, 2306, 2292, 2273, 2248, 2217, 2181, 2139)
    for (k <- 0 until 8) assert(s16(w0, 600 + k) == expect(k), s"sample ${600 + k}")
    assert((0 until 2304).map(i => math.abs(s16(w0, i))).max == 8141)
  }

  test("scfsi variant: reused groups substitute granule 0's scalefactors") {
    val v2 = Mp3L3.encodeFixture(goldenSpec, 2)
    val v0 = Mp3L3.encodeFixture(goldenSpec, 0)
    assert(!java.util.Arrays.equals(v0, v2), "scfsi stream must differ")
    // side info: mdb(9)+private(5) then 4 scfsi bits → bits 14..17 of the
    // side info = low bits of byte 5 + high bits of byte 6 of the frame
    val scfsiBits = (((v2(4 + 1) & 0x03) << 2) | ((v2(4 + 2) & 0xc0) >>> 6))
    assert(scfsiBits == 0xA, f"scfsi field 0x$scfsiBits%X != 1010")
    // a spec whose granule-1/3 sf plants EQUAL granule-0/2's decodes
    // IDENTICALLY under variants 0 and 2 (reuse substitutes the same
    // values; only the bit layout differs) — the reuse-semantics pin
    val eqSpec = goldenSpec.clone()
    for (g <- Seq(1, 3); j <- 1 to 5)
      eqSpec(16 * g + j) = eqSpec(16 * (g - 1) + j)
    val wEq0 = Mp3L3.decodeToWav(Mp3L3.encodeFixture(eqSpec, 0))
    val wEq2 = Mp3L3.decodeToWav(Mp3L3.encodeFixture(eqSpec, 2))
    assert(java.util.Arrays.equals(wEq0, wEq2),
      "equal-plant spec must decode identically under scfsi reuse")
    // and with DIFFERING granule-1 plants the decodes must differ —
    // proving the reused (not the planted) scalefactors drive granule 1
    val w0 = Mp3L3.decodeToWav(v0)
    val w2 = Mp3L3.decodeToWav(v2)
    assert(!java.util.Arrays.equals(w0, w2),
      "differing plants: scfsi reuse must change granule-1 audio")
  }

  test("table-10 variant: third byte-different coding, identical decode") {
    // r17: table 10 graduated from the refusal list (independent
    // re-transcription, Kraft/prefix/completeness clean on first
    // contact). The variant-3 stream codes the SAME planted spectrum
    // under table 10 — byte-different from both prior codings, and its
    // decode must land on the SAME committed prototype golden, which
    // pins the transcription's decode side through the shared-table
    // encoder: any same-length code permutation that survived the
    // validator would still decode fixtures consistently (documented
    // residual), but a wrong LENGTH or misplaced code cannot.
    val v3 = Mp3L3.encodeFixture(goldenSpec, 3)
    val v0 = Mp3L3.encodeFixture(goldenSpec, 0)
    val v1 = Mp3L3.encodeFixture(goldenSpec, 1)
    assert(!java.util.Arrays.equals(v3, v0) && !java.util.Arrays.equals(v3, v1))
    // it really selects table 10 in granule 0: table_select(0) sits at
    // side-info bits 52..56 (mdb 9 + private 5 + scfsi 4 + p23 12 +
    // big_values 9 + global_gain 8 + sfc 4 + wsf 1 = 52) — the low
    // nibble of frame byte 10 and the top bit of frame byte 11
    assert((((v3(4 + 6) & 0x0f) << 1) | ((v3(4 + 7) & 0xff) >>> 7)) == 10)
    val w3 = Mp3L3.decodeToWav(v3)
    assert(sha256(w3) == "d5faf0c4f7f7e2c34f26287f29b69f6717135dd965e640333925690c9e7b3c97",
      "table-10 coding must decode to the committed prototype golden")
  }

  /** 8-block golden spec for the stereo class (granules x M,S). */
  private val goldenSpec8: Array[Byte] = {
    val mods = Array(5, 4, 4, 4, 2, 2) ++ Array.fill(10)(11)
    (for (g <- 0 until 8; j <- 0 until 16)
      yield ((g * 31 + 7 * j + 3) % mods(j)).toByte).toArray
  }

  test("preflag variant: sfb-11 plants through the ISO pretab, prototype goldens") {
    // variant 4 moves the 5 value pairs to lines 62..71 (sfb 11, pretab
    // 1) with preflag=1 — the r16 ADVICE class. The prototype proved
    // decode == independent recompute bit-identically AND that a decoder
    // with the old shifted pretab lands 0.176 full-scale away, so this
    // golden (and its DuckDB oracle row) has teeth against exactly that
    // bug class. Hashes from tools/mp3_proto.py `goldens`.
    val v4 = Mp3L3.encodeFixture(goldenSpec, 4)
    assert(sha256(v4) == "460dae2bc4229fb7190ca040fb0ac22de9e9fbfd3679eef075df3791bb722de7",
      "fixture bytes must match the prototype encoder")
    val w4 = Mp3L3.decodeToWav(v4)
    assert(sha256(w4) == "bc9f99fba72f2203e5a13b64b9f876c1523a885508d6d080f2284f1796106f16",
      "decode must match the prototype bit-for-bit")
  }

  test("MS stereo variant: joint-stereo decode, interleaved WAV, prototype goldens") {
    // variant 5: granule-blocks alternate M,S; header mode 1 + mode_ext
    // 2; decoder matrixes L=(M+S)*ISqrt2, R=(M-S)*ISqrt2 and interleaves.
    // Decode == independent recompute proven in the prototype
    // (roundtrip_ms); these hashes pin the port bit-exactly.
    val v5 = Mp3L3.encodeFixture(goldenSpec8, 5)
    assert(sha256(v5) == "718bfb4944794aa3c25b21f69d399ee8b5c8c3a30e5a01bbc1f8e47b940121b5")
    assert((v5(3) & 0xff) == 0x60, "mode 1 (joint), mode_ext 2 (MS)")
    val w5 = Mp3L3.decodeToWav(v5)
    assert(sha256(w5) == "f4455c2c4087b34a7b2e1d7c29c3e86f563d3fe7a6cb7b51f86210b0b9d9b5e7")
    // stereo WAV header fields: channels 2, block align 4
    assert((w5(22) & 0xff) == 2 && (w5(32) & 0xff) == 4)
    // 2 frames x 2 granules x 576 x 2ch = 4608 samples
    assert(w5.length == 44 + 2 * 4608)
    // variant 7: same planted stereo audio coded under tables (9,9),
    // frame-aligned — byte-different stream, bit-identical decode (the
    // dedup_audio_mp3_stereo pairing)
    val v7 = Mp3L3.encodeFixture(goldenSpec8, 7)
    assert(sha256(v7) == "5e4d3ea5e7d1f11ab3f996ab1a19777be74ee5a4a39f4d7c7e243b5f9b93fa02")
    assert(!java.util.Arrays.equals(v7, v5))
    assert(java.util.Arrays.equals(Mp3L3.decodeToWav(v7), w5),
      "byte-different stereo codings must decode identically")
  }

  test("short-block variant: block_type 2 triple-IMDCT path, prototype goldens") {
    // variant 6: the first fixture to EXECUTE the short-block path — it
    // carried an out-of-range window placement (6+12w for 6+6w) that the
    // long-only fixtures never reached (the r16 verdict's scope-claim
    // gap, now closed with decode == independent recompute in the
    // prototype and this cross-language pin).
    val v6 = Mp3L3.encodeFixture(goldenSpec, 6)
    assert(sha256(v6) == "fb0860bdadd8043b8a3c97a7f45bf53a7d11fcfb55c399544f4f87e7ec9af0b9")
    val w6 = Mp3L3.decodeToWav(v6)
    assert(sha256(w6) == "8157c5b658af079f1e6d2d01e5c92a49e9b1bb179856c99d5c23310e8966ed29")
  }

  test("nonzero main_data_begin: variant 0 really exercises the bit reservoir") {
    val v0 = Mp3L3.encodeFixture(goldenSpec, 0)
    val v1 = Mp3L3.encodeFixture(goldenSpec, 1)
    // frame 1 header at offset 417; main_data_begin = first 9 bits after it
    def mdb(b: Array[Byte]): Int = ((b(417 + 4) & 0xff) << 1) | ((b(417 + 5) & 0xff) >> 7)
    assert(mdb(v0) == 40, "variant 0 carries a 40-byte reservoir")
    assert(mdb(v1) == 0, "variant 1 is frame-aligned")
  }

  test("typed refusals: intensity stereo, escape tables, unvalidated tables") {
    // r17: stereo DECODES (mono/LR/dual/MS); the typed stereo refusal
    // narrows to the intensity extension — flip a valid MS fixture's
    // mode_ext to 1 (intensity on)
    val msSpec = {
      val mods = Array(5, 4, 4, 4, 2, 2) ++ Array.fill(10)(11)
      (for (g <- 0 until 8; j <- 0 until 16)
        yield ((g * 31 + 7 * j + 3) % mods(j)).toByte).toArray
    }
    val it = Mp3L3.encodeFixture(msSpec, 5).clone()
    assert((it(3) & 0xff) == 0x60, "MS fixture header: mode 1, mode_ext 2")
    it(3) = 0x50.toByte // mode 1, mode_ext 1 = intensity stereo
    assert(Mp3L3.dropReason(it) == "mp3_intensity_stereo_unsupported")
    // a mono stream whose mode field is flipped to stereo no longer gets
    // the blanket refusal — its 17-byte side info misparses as 32 and
    // the grammar checks refuse it some typed way, never a wrong answer
    val st = Mp3L3.encodeFixture(goldenSpec, 0).clone()
    st(3) = 0x00.toByte // mode 0 = stereo
    assert(Mp3L3.dropReason(st) != null)
    // table_select forced to 16 (escape) in granule 0: side-info bits
    // 18(mdb+priv)+4(scfsi)+12+9+8+4+1 = 56 bits in → table_select at bit 56
    val esc = Mp3L3.encodeFixture(goldenSpec, 0).clone()
    // byte 4+7=11 of the frame holds bits 56..63 of side info
    esc(4 + 7) = ((16 << 3) | (esc(4 + 7) & 0x07)).toByte
    val r = Mp3L3.dropReason(esc)
    assert(r != null && r.startsWith("mp3_huffman"), r)
  }

  test("real encoder stream (env asset): geometry, reservoir, exact silence") {
    val f = new java.io.File(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(f.isFile, "gsutil test asset not present on this box")
    val data = java.nio.file.Files.readAllBytes(f.toPath)
    val wav = Mp3L3.decodeToWav(data)
    assert(wav != null, "the real LSF mono stream must decode")
    // 45 frames x 576 samples at 22050 Hz, all EXACTLY zero (the asset is
    // digital silence; its side info still walks a full 255-byte
    // reservoir, which is what this golden pins)
    assert(wav.length == 44 + 2 * 45 * 576)
    var i = 44
    while (i < wav.length) { assert(wav(i) == 0, s"nonzero at $i"); i += 1 }
  }

  test("table sanity re-asserted in Scala: Kraft-complete, prefix-free, sfb sums") {
    val all: Seq[(String, Array[Int], Array[Int])] = Seq(
      ("t1", Mp3Tables.HuffLen1, Mp3Tables.HuffCode1),
      ("t2", Mp3Tables.HuffLen2, Mp3Tables.HuffCode2),
      ("t3", Mp3Tables.HuffLen3, Mp3Tables.HuffCode3),
      ("t5", Mp3Tables.HuffLen5, Mp3Tables.HuffCode5),
      ("t6", Mp3Tables.HuffLen6, Mp3Tables.HuffCode6),
      ("t7", Mp3Tables.HuffLen7, Mp3Tables.HuffCode7),
      ("t8", Mp3Tables.HuffLen8, Mp3Tables.HuffCode8),
      ("t9", Mp3Tables.HuffLen9, Mp3Tables.HuffCode9),
      ("t11", Mp3Tables.HuffLen11, Mp3Tables.HuffCode11),
      ("t12", Mp3Tables.HuffLen12, Mp3Tables.HuffCode12),
      ("c1a", Mp3Tables.Count1Len0, Mp3Tables.Count1Code0),
      ("c1b", Mp3Tables.Count1Len1, Mp3Tables.Count1Code1))
    for ((name, ls, cs) <- all) {
      val kraft = ls.map(l => 1L << (19 - l)).sum
      assert(kraft == (1L << 19), s"$name Kraft")
      val codes = ls.zip(cs)
      assert(codes.distinct.length == codes.length, s"$name duplicate")
      for (((l1, c1), i) <- codes.zipWithIndex; ((l2, c2), j) <- codes.zipWithIndex
           if i != j && l2 > l1)
        assert((c2 >> (l2 - l1)) != c1, s"$name prefix violation")
    }
    for ((w, hz) <- Seq(
        (Mp3Tables.SfbLong44100, 44100), (Mp3Tables.SfbLong48000, 48000),
        (Mp3Tables.SfbLong32000, 32000), (Mp3Tables.SfbLong22050, 22050),
        (Mp3Tables.SfbLong24000, 24000), (Mp3Tables.SfbLong16000, 16000)))
      assert(w.sum == 576 && w.length == 22, s"long sfb $hz")
    for ((w, hz) <- Seq(
        (Mp3Tables.SfbShort44100, 44100), (Mp3Tables.SfbShort48000, 48000),
        (Mp3Tables.SfbShort32000, 32000), (Mp3Tables.SfbShort22050, 22050),
        (Mp3Tables.SfbShort24000, 24000), (Mp3Tables.SfbShort16000, 16000)))
      assert(w.sum == 192 && w.length == 13, s"short sfb $hz")
    // the synthesis window's integer prototype: 257 entries, documented
    // peak, zero head — the PR-test-selected construction derives from it
    assert(Mp3Tables.WinBase.length == 257)
    assert(Mp3Tables.WinBase(0) == 0 && Mp3Tables.WinBase(256) == -75038)
    assert(Mp3Tables.DWindow.length == 512)
  }

  test("drop-reason classifier: decoded MP3 is null, refusals classify") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def reason(b: Array[Byte]): String = {
      val r = graft.functions.Native.DecodeDropReason(Literal(b)).eval(null)
      if (r == null) null else r.toString
    }
    // a decodable fixture wrapped in the ID3 envelope the classifier keys on
    val fix = Mp3L3.encodeFixture(goldenSpec, 0)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0) ++ fix
    assert(reason(id3) == null, "decodable MP3 must not be dropped")
    val st = fix.clone(); st(3) = 0x00.toByte
    assert(reason(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0) ++ st)
      == "unsupported_profile")
    // bare ID3 tag with no frames
    assert(reason(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0, 0, 0))
      == "truncated")
  }
}
