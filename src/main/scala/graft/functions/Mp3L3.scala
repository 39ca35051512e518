package graft.functions

import scala.util.control.NonFatal

/** MPEG Audio Layer III decode core (MPEG-1 and MPEG-2 LSF, mono), a 1:1
  * port of the validated Python prototype in tools/mp3_proto.py.
  *
  * Reference behavior studied from the public ISO 11172-3 / 13818-3 specs
  * only (no reference-repo analogue exists:
  * /root/reference feeds Kafka topics, it has no media tier). Validation
  * in this sandbox, where no MP3 decoder library ships (the VP8 round had
  * libwebp.so to extract ground truth from; audio has no equivalent):
  *
  *   - Huffman tables: prefix-free + Kraft-complete machine checks
  *     (tools/mp3_tables.py). Only the validated subset
  *     {1,2,3,5,6,7,8,9,10,11,12}+A/B is carried (10 graduated in r17 —
  *     an independent re-transcription passed Kraft/prefix/completeness
  *     on first contact); streams selecting tables 13/15/16..31 are
  *     REFUSED with a typed reason instead of being decoded with guessed
  *     256-entry code data (an r17 attempt at the two escape codebooks
  *     failed the validator diffusely and was discarded).
  *   - The bitstream grammar is self-checking: every granule must consume
  *     exactly `part2_3_length` bits; the one real encoder-produced MP3
  *     on the box (gsutil's 45-frame 22.05 kHz LSF mono test asset)
  *     passes 45/45 granules bit-exactly and decodes to exact silence
  *     (it is digital silence), pinning frame geometry, side info layout
  *     and the bit-reservoir walk against a real encoder.
  *   - The synthesis window construction was SELECTED by the filterbank's
  *     near-perfect-reconstruction property (46 dB analysis→synthesis
  *     round trip at the canonical 481-sample delay — the spec design's
  *     own amplitude-ripple floor; every wrong sign/mirror construction
  *     scores < 10 dB) plus a per-64-block smoothness screen on the
  *     integer prototype. Residual single-ulp (1/65536) transcription
  *     uncertainty sits ~50 dB below that floor and is documented rather
  *     than hidden.
  *   - decode(encode(fixture)) is bit-identical to an independent
  *     straight-from-the-formula recompute (the same algebra the DuckDB
  *     oracle restates in SQL), and the ScalaTest goldens pin this port
  *     bit-exactly against the prototype's committed output.
  *
  * Honest scope (refusals are typed, never wrong answers): mono, stereo,
  * dual-channel and joint stereo with the MS extension decode (r17;
  * intensity stereo refused); long AND short blocks decode, both
  * fixture-pinned (r17 — the short path also fixed the ISO 6-sample
  * window overlap the long-only fixtures never executed); mixed blocks
  * refused, escape tables refused, MPEG-2.5 refused, free-format
  * refused. All
  * float work is IEEE double with frozen single-sourced constants
  * (Mp3Tables.scala) so the decoder, the Python prototype and the DuckDB
  * oracle agree bit-for-bit.
  *
  * Scale shape: pure per-payload function — fuses map-side into the
  * payload scan like every other decode native; no shuffle, no state.
  * Bomb stance: frame count capped, output capped at 2^24 samples. */
private[graft] object Mp3L3 {
  import Mp3Tables._

  final case class Refused(reason: String) extends Exception(reason)

  // ------------------------------------------------------------- bits

  private final class Bits(val d: Array[Byte], var p: Int) {
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = d(p >>> 3)
        v = (v << 1) | ((b >>> (7 - (p & 7))) & 1)
        p += 1
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------ frame layer

  private val BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val SrV1 = Array(44100, 48000, 32000, 0)
  private val SrV2 = Array(22050, 24000, 16000, 0)

  private final case class Hdr(off: Int, ver: Int, prot: Int, kbps: Int,
      hz: Int, pad: Int, mode: Int, modeExt: Int, flen: Int, spf: Int)

  private def parseHeader(b: Array[Byte], off: Int): Hdr = {
    if (off + 4 > b.length || (b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return null
    val ver = (b(off + 1) >> 3) & 3
    val layer = (b(off + 1) >> 1) & 3
    val prot = b(off + 1) & 1
    val br = (b(off + 2) >> 4) & 15
    val sr = (b(off + 2) >> 2) & 3
    val pad = (b(off + 2) >> 1) & 1
    val mode = (b(off + 3) >> 6) & 3
    val modeExt = (b(off + 3) >> 4) & 3
    if (layer != 1 || br == 0 || br == 15 || sr == 3) return null
    if (ver == 1 || ver == 0) return null // reserved / MPEG-2.5 (unclaimed)
    val (kbps, hz, spf) =
      if (ver == 3) (BitrateV1(br), SrV1(sr), 1152)
      else (BitrateV2(br), SrV2(sr), 576)
    val flen = (spf / 8) * kbps * 1000 / hz + pad
    Hdr(off, ver, prot, kbps, hz, pad, mode, modeExt, flen, spf)
  }

  private def frames(data: Array[Byte]): Vector[Hdr] = {
    var i = 0
    if (data.length >= 10 && data(0) == 'I' && data(1) == 'D' && data(2) == '3') {
      i = 10 + (((data(6) & 0x7f) << 21) | ((data(7) & 0x7f) << 14) |
        ((data(8) & 0x7f) << 7) | (data(9) & 0x7f))
    }
    val out = Vector.newBuilder[Hdr]
    var n = 0
    while (i + 4 <= data.length) {
      val h = parseHeader(data, i)
      if (h == null) i += 1
      else {
        out += h
        i += h.flen
        n += 1
        if (n > (1 << 18)) throw Refused("mp3_frame_bomb")
      }
    }
    out.result()
  }

  private final class Granule {
    var part23Length = 0
    var bigValues = 0
    var globalGain = 0
    var scalefacCompress = 0
    var wsf = 0
    var blockType = 0
    var mixed = 0
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0Count = 0
    var region1Count = 0
    var preflag = 0
    var scalefacScale = 0
    var count1Table = 0
  }

  /** (mainDataBegin, scfsi per channel, granules(gr)(ch), mainDataOffset).
    * Mono and 2-channel (r17: stereo graduated from blanket refusal). */
  private def sideInfo(data: Array[Byte], h: Hdr): (Int, Array[Array[Int]], Array[Array[Granule]], Int) = {
    val nch = if (h.mode == 3) 1 else 2
    val off = h.off + 4 + (if (h.prot == 0) 2 else 0)
    val b = new Bits(data, off * 8)
    val (mdb, ngr) =
      if (h.ver == 3) { val m = b.read(9); b.read(if (nch == 1) 5 else 3); (m, 2) }
      else { val m = b.read(8); b.read(if (nch == 1) 1 else 2); (m, 1) }
    val scfsi =
      if (h.ver == 3) Array.fill(nch)(Array.fill(4)(b.read(1)))
      else Array.fill(nch)(Array.fill(4)(0))
    val grs = Array.fill(ngr)(Array.fill(nch) {
      val g = new Granule
      g.part23Length = b.read(12)
      g.bigValues = b.read(9)
      g.globalGain = b.read(8)
      g.scalefacCompress = b.read(if (h.ver == 3) 4 else 9)
      g.wsf = b.read(1)
      if (g.wsf == 1) {
        g.blockType = b.read(2)
        g.mixed = b.read(1)
        g.tableSelect(0) = b.read(5); g.tableSelect(1) = b.read(5)
        g.subblockGain(0) = b.read(3); g.subblockGain(1) = b.read(3); g.subblockGain(2) = b.read(3)
        if (g.blockType == 0) throw Refused("mp3_bad_block_type")
        if (g.mixed == 1) throw Refused("mp3_mixed_blocks_unsupported")
      } else {
        g.tableSelect(0) = b.read(5); g.tableSelect(1) = b.read(5); g.tableSelect(2) = b.read(5)
        g.region0Count = b.read(4)
        g.region1Count = b.read(3)
      }
      g.preflag = if (h.ver == 3) b.read(1) else 0
      g.scalefacScale = b.read(1)
      g.count1Table = b.read(1)
      g
    })
    val siBytes =
      if (h.ver == 3) { if (nch == 1) 17 else 32 }
      else { if (nch == 1) 9 else 17 }
    (mdb, scfsi, grs, off + siBytes)
  }

  // ----------------------------------------------------- scalefactors

  private def sfbLong(hz: Int): Array[Int] = {
    var i = 0
    while (i < SfbRates.length && SfbRates(i) != hz) i += 1
    i match {
      case 0 => SfbLong16000; case 1 => SfbLong22050; case 2 => SfbLong24000
      case 3 => SfbLong32000; case 4 => SfbLong44100; case 5 => SfbLong48000
      case _ => throw Refused("mp3_bad_rate")
    }
  }

  private def sfbShort(hz: Int): Array[Int] = {
    var i = 0
    while (i < SfbRates.length && SfbRates(i) != hz) i += 1
    i match {
      case 0 => SfbShort16000; case 1 => SfbShort22050; case 2 => SfbShort24000
      case 3 => SfbShort32000; case 4 => SfbShort44100; case 5 => SfbShort48000
      case _ => throw Refused("mp3_bad_rate")
    }
  }

  /** LSF non-intensity slen/nr partitioning (13818-3). */
  private def lsfSlenNr(sfc: Int, blockType: Int, mixed: Int): (Array[Int], Array[Int], Int) = {
    val blocknumber = if (blockType != 2) 0 else if (mixed == 1) 2 else 1
    if (sfc < 400) {
      val slen = Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4)
      val nr = Seq(Array(6, 5, 5, 5), Array(9, 9, 9, 9), Array(6, 9, 9, 9)).apply(blocknumber)
      (slen, nr, 0)
    } else if (sfc < 500) {
      val v = sfc - 400
      val slen = Array((v >> 2) / 5, (v >> 2) % 5, v % 4, 0)
      val nr = Seq(Array(6, 5, 7, 3), Array(9, 9, 12, 6), Array(6, 9, 12, 6)).apply(blocknumber)
      (slen, nr, 0)
    } else {
      val v = sfc - 500
      val slen = Array(v / 3, v % 3, 0, 0)
      val nr = Seq(Array(11, 10, 0, 0), Array(18, 18, 0, 0), Array(15, 18, 0, 0)).apply(blocknumber)
      (slen, nr, 1)
    }
  }

  /** Long-block scalefactors → (sf(22), preflag). Short-block → flattened
    * sf(13*3) via sfShortOut. */
  private def readScalefacs(b: Bits, g: Granule, ver: Int, scfsi: Array[Int],
      gr: Int, prevLong: Array[Int], sfLongOut: Array[Int],
      sfShortOut: Array[Int]): Int = {
    if (g.blockType == 2 && g.wsf == 1) {
      if (ver == 3) {
        val s1 = Slen1(g.scalefacCompress); val s2 = Slen2(g.scalefacCompress)
        var sfb = 0
        while (sfb < 12) {
          val sl = if (sfb < 6) s1 else s2
          var w = 0
          while (w < 3) { sfShortOut(3 * sfb + w) = b.read(sl); w += 1 }
          sfb += 1
        }
        g.preflag
      } else {
        val (slen, nr, pre) = lsfSlenNr(g.scalefacCompress, 2, 0)
        var idx = 0
        var part = 0
        while (part < 4) {
          var k = 0
          while (k < nr(part)) {
            if (idx < 36) sfShortOut(idx) = b.read(slen(part))
            idx += 1; k += 1
          }
          part += 1
        }
        pre
      }
    } else if (ver == 3) {
      val s1 = Slen1(g.scalefacCompress); val s2 = Slen2(g.scalefacCompress)
      // groups 0-5, 6-10 (slen1), 11-15, 16-20 (slen2); scfsi reuse on gr 1
      val bounds = Array(0, 6, 11, 16, 21)
      var gi = 0
      while (gi < 4) {
        val sl = if (gi < 2) s1 else s2
        var sfb = bounds(gi)
        while (sfb < bounds(gi + 1)) {
          sfLongOut(sfb) = if (gr == 1 && scfsi(gi) == 1) prevLong(sfb) else b.read(sl)
          sfb += 1
        }
        gi += 1
      }
      g.preflag
    } else {
      val (slen, nr, pre) = lsfSlenNr(g.scalefacCompress, g.blockType, g.mixed)
      var sfb = 0
      var part = 0
      while (part < 4) {
        var k = 0
        while (k < nr(part)) {
          if (sfb < 22) sfLongOut(sfb) = b.read(slen(part))
          sfb += 1; k += 1
        }
        part += 1
      }
      pre
    }
  }

  // --------------------------------------------------------- huffman

  /** (len<<19|code) -> packed (x<<8|y)+1; 0 = absent. */
  private val huffMaps: Map[Int, java.util.HashMap[Integer, Integer]] = {
    def build(ny: Int, ls: Array[Int], cs: Array[Int]): java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer]()
      var i = 0
      while (i < ls.length) {
        m.put((ls(i) << 19) | cs(i), ((i / ny) << 8 | (i % ny)) + 1)
        i += 1
      }
      m
    }
    Map(
      1 -> build(2, HuffLen1, HuffCode1), 2 -> build(3, HuffLen2, HuffCode2),
      3 -> build(3, HuffLen3, HuffCode3), 5 -> build(4, HuffLen5, HuffCode5),
      6 -> build(4, HuffLen6, HuffCode6), 7 -> build(6, HuffLen7, HuffCode7),
      8 -> build(6, HuffLen8, HuffCode8), 9 -> build(6, HuffLen9, HuffCode9),
      10 -> build(8, HuffLen10, HuffCode10),
      11 -> build(8, HuffLen11, HuffCode11), 12 -> build(8, HuffLen12, HuffCode12))
  }
  private val huffMaxLen: Map[Int, Int] = Map(
    1 -> HuffLen1.max, 2 -> HuffLen2.max, 3 -> HuffLen3.max, 5 -> HuffLen5.max,
    6 -> HuffLen6.max, 7 -> HuffLen7.max, 8 -> HuffLen8.max, 9 -> HuffLen9.max,
    10 -> HuffLen10.max, 11 -> HuffLen11.max, 12 -> HuffLen12.max)

  private val count1Maps: Array[java.util.HashMap[Integer, Integer]] = {
    def build(ls: Array[Int], cs: Array[Int]): java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer]()
      var i = 0
      while (i < 16) { m.put((ls(i) << 19) | cs(i), i + 1); i += 1 }
      m
    }
    Array(build(Count1Len0, Count1Code0), build(Count1Len1, Count1Code1))
  }
  private val count1MaxLen = Array(Count1Len0.max, Count1Len1.max)

  /** Refuse when a mandatory sign bit would cross part2_3_length. */
  private def signBit(b: Bits, limit: Int): Unit =
    if (b.p >= limit) throw Refused("mp3_truncated_main_data")

  private def huffSymbol(b: Bits, m: java.util.HashMap[Integer, Integer],
      maxLen: Int, limit: Int): Int = {
    var l = 0
    var c = 0
    while (l < maxLen) {
      if (b.p >= limit) throw Refused("mp3_huffman_overrun")
      c = (c << 1) | b.read(1)
      l += 1
      val hit = m.get((l << 19) | c)
      if (hit != null) return hit - 1
    }
    throw Refused("mp3_huffman_desync")
  }

  /** region1/region2 start lines for big_values. r16 ADVICE fix: for
    * window-switching LONG windows (start/stop, block_type 1/3) the
    * boundary is sfb 8's end from the RATE's long table — 36 only equals
    * that on MPEG-1 rates (e.g. 54 at 22.05 kHz LSF); 36 is exact for
    * short blocks (block_type 2) by construction (3 windows x 12). */
  private def regionBounds(g: Granule, hz: Int): (Int, Int) = {
    val widths = sfbLong(hz)
    val bounds = new Array[Int](23)
    var i = 0
    while (i < 22) { bounds(i + 1) = bounds(i) + widths(i); i += 1 }
    if (g.wsf == 1) (if (g.blockType == 2) 36 else bounds(8), 576)
    else {
      val r1 = bounds(math.min(g.region0Count + 1, 22))
      val r2 = bounds(math.min(g.region0Count + 1 + g.region1Count + 1, 22))
      (r1, r2)
    }
  }

  private def huffmanDecode(b: Bits, g: Granule, hz: Int, limit: Int): Array[Int] = {
    val is = new Array[Int](576)
    val (r1, r2) = regionBounds(g, hz)
    val nbig = g.bigValues * 2
    if (nbig > 576) throw Refused("mp3_big_values_overflow")
    var i = 0
    while (i < nbig) {
      val region = if (i < r1) 0 else if (i < r2) 1 else 2
      val tid = g.tableSelect(if (g.wsf == 1) math.min(region, 1) else region)
      if (tid == 0) { i += 2 }
      else {
        if (!huffMaps.contains(tid)) throw Refused(s"mp3_huffman_table_unvalidated_$tid")
        val m = huffMaps(tid)
        val ml = huffMaxLen(tid)
        val xy = huffSymbol(b, m, ml, limit)
        val x = xy >> 8
        val y = xy & 0xff
        // r16 ADVICE fix: a nonzero value's sign bit is part of the code;
        // landing exactly on part2_3_length is malformed — refuse, never
        // silently decode positive (b.p > limit could not catch == limit).
        if (i < 576) {
          is(i) = if (x != 0) { signBit(b, limit); if (b.read(1) == 1) -x else x } else x
        }
        i += 1
        if (i < 576) {
          is(i) = if (y != 0) { signBit(b, limit); if (b.read(1) == 1) -y else y } else y
        }
        i += 1
      }
    }
    val m = count1Maps(g.count1Table)
    val ml = count1MaxLen(g.count1Table)
    while (b.p < limit && i + 4 <= 576) {
      val q = huffSymbol(b, m, ml, limit)
      var k = 3
      while (k >= 0) {
        val v = (q >> k) & 1
        if (i < 576) {
          is(i) = if (v == 1) { signBit(b, limit); if (b.read(1) == 1) -1 else 1 } else v
        }
        i += 1
        k -= 1
      }
    }
    is
  }

  // ----------------------------------------- requantize through IMDCT

  private def pow2(e: Double): Double =
    if (e == math.floor(e) && math.abs(e) < 1000) {
      // exact dyadic scaling on the integer-exponent path (the fixture/
      // oracle path is integer-exponent by construction)
      java.lang.Math.scalb(1.0, e.toInt)
    } else StrictMath.pow(2.0, e)

  private def requantize(is: Array[Int], g: Granule, sfLong: Array[Int],
      sfShort: Array[Int], preflag: Int, hz: Int): Array[Double] = {
    val xr = new Array[Double](576)
    val gain = g.globalGain - 210
    val sfsMult = 0.5 * (1 + g.scalefacScale)
    if (g.blockType == 2 && g.wsf == 1) {
      val widths = sfbShort(hz)
      var i = 0
      var sfb = 0
      while (sfb < 13) {
        var w = 0
        while (w < 3) {
          var k = 0
          while (k < widths(sfb)) {
            if (i < 576) {
              val v = is(i)
              if (v != 0) {
                val sf = if (sfb < 12) sfShort(3 * sfb + w) else 0
                val e = 0.25 * (gain - 8 * g.subblockGain(w)) - sfsMult * sf
                val mag = Pow43Of(math.abs(v)) * pow2(e)
                xr(i) = if (v < 0) -mag else mag
              }
            }
            i += 1; k += 1
          }
          w += 1
        }
        sfb += 1
      }
    } else {
      val widths = sfbLong(hz)
      val bounds = new Array[Int](23)
      var k = 0
      while (k < 22) { bounds(k + 1) = bounds(k) + widths(k); k += 1 }
      var sfb = 0
      var i = 0
      while (i < 576) {
        if (i >= bounds(sfb + 1) && sfb < 21) sfb += 1
        val v = is(i)
        if (v != 0) {
          val pre = if (preflag == 1) Pretab(sfb) else 0
          val e = 0.25 * gain - sfsMult * (sfLong(sfb) + pre)
          val mag = Pow43Of(math.abs(v)) * pow2(e)
          xr(i) = if (v < 0) -mag else mag
        }
        i += 1
      }
    }
    xr
  }

  private def Pow43Of(v: Int): Double =
    if (v < Pow43.length) Pow43(v) else StrictMath.pow(v.toDouble, 4.0 / 3.0)

  private def reorderShort(xr: Array[Double], hz: Int): Array[Double] = {
    val out = new Array[Double](576)
    val widths = sfbShort(hz)
    var src = 0
    var start = 0
    var sfb = 0
    while (sfb < 13) {
      val w = widths(sfb)
      var win = 0
      while (win < 3) {
        var k = 0
        while (k < w) {
          val dst = 3 * (start + k) + win
          if (dst < 576 && src < 576) out(dst) = xr(src)
          src += 1; k += 1
        }
        win += 1
      }
      start += w
      sfb += 1
    }
    out
  }

  private def aliasReduce(xr: Array[Double], blockType: Int): Unit = {
    val nb = if (blockType != 2) 32 else 0
    var sb = 1
    while (sb < nb) {
      var i = 0
      while (i < 8) {
        val a = xr(18 * sb - 1 - i)
        val b = xr(18 * sb + i)
        xr(18 * sb - 1 - i) = a * AliasCs(i) - b * AliasCa(i)
        xr(18 * sb + i) = b * AliasCs(i) + a * AliasCa(i)
        i += 1
      }
      sb += 1
    }
  }

  /** 36-sample windowed IMDCT of one subband's 18 lines. */
  private def imdctBlock(xr: Array[Double], off: Int, blockType: Int,
      out: Array[Double]): Unit = {
    java.util.Arrays.fill(out, 0.0)
    // all-zero subband → the full transform yields exact +0.0 everywhere
    // (products of ±0.0 sum from a +0.0 accumulator, windows are ≥ 0):
    // skip the 36x18 multiply wall. Most subbands of most granules are
    // zero in both real frames and the fixture class.
    var z = 0
    while (z < 18 && xr(off + z) == 0.0) z += 1
    if (z == 18) return
    if (blockType == 2) {
      // three 12-point windowed IMDCTs overlapped at 6-sample offsets:
      // window w spans [6+6w, 6+6w+11] (r17 fix: was 6+12w — an
      // out-of-range placement the long-only fixtures never executed;
      // now pinned by the short-block fixture class and its oracle)
      var win = 0
      while (win < 3) {
        var n = 0
        while (n < 12) {
          var s = 0.0
          var k = 0
          while (k < 6) { s += xr(off + 3 * k + win) * CosS(n * 6 + k); k += 1 }
          out(6 + 6 * win + n) += s * WinShort(n)
          n += 1
        }
        win += 1
      }
    } else {
      val w = blockType match {
        case 0 => WinLong
        case 1 => WinStart
        case 3 => WinStop
        case _ => throw Refused("mp3_bad_block_type")
      }
      var n = 0
      while (n < 36) {
        var s = 0.0
        var k = 0
        while (k < 18) { s += xr(off + k) * CosL(n * 18 + k); k += 1 }
        out(n) = s * w(n)
        n += 1
      }
    }
  }

  // ----------------------------------------------------- synthesis

  /** ISO polyphase synthesis: 1024-slot V FIFO shifted by 64 per slot,
    * published U shuffle, D-windowed 16-tap sum. */
  private final class Synth {
    // V as a RING: instead of memmoving 960 doubles down every slot (the
    // ISO figure's literal FIFO — measured as the decoder's hottest cost
    // at 18 slots/granule), keep a write base that steps back by 64 and
    // read through `(base + x) & 1023`. Conceptual v[x] of the shifting
    // formulation = v[(base + x) & 1023] here; every float value and
    // every accumulation order below is IDENTICAL to the shifting code,
    // so the goldens and the DuckDB hash oracle are unchanged by
    // construction (integer index algebra only).
    private val v = new Array[Double](1024)
    private var base = 0

    private val nzIdx = new Array[Int](32)

    def slot(s: Array[Double], sOff: Int, pcm: Array[Double], pOff: Int): Unit = {
      base = (base - 64) & 1023
      // gather the nonzero subbands once: skipping an exactly-zero term
      // skips an `acc += c * 0.0` — bit-identical except for the sign of
      // an all-zero accumulator, which no int16 sample can see. Real
      // Layer III frames rarely excite all 32 subbands and the fixture
      // class excites one, so this cuts the 64x32 matrixing to 64 x nnz
      // (the goldens and the DuckDB oracle are unchanged by construction).
      var nnz = 0
      var k = 0
      while (k < 32) {
        if (s(sOff + k) != 0.0) { nzIdx(nnz) = k; nnz += 1 }
        k += 1
      }
      // matrixing writes the slot's 64 new values at v[base .. base+63]
      // (base is a multiple of 64, so the run never wraps)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        var j = 0
        while (j < nnz) {
          val kk = nzIdx(j)
          acc += NCos(i * 32 + kk) * s(sOff + kk)
          j += 1
        }
        v(base + i) = acc
        i += 1
      }
      // D-window directly over the ring — the published U shuffle
      // u[64t + j] = v[128t + j], u[64t + 32 + j] = v[128t + 96 + j]
      // is pure re-indexing, so the 16-tap sum reads v through the same
      // mapping instead of copying 512 doubles per slot. Tap order stays
      // i = 0,1,2,…,15 (t-th iteration adds taps 2t then 2t+1), so the
      // accumulation order is exactly the original's.
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var vIdx = base + j // tap 2t reads v[(base + 128t + j) & 1023]
        var dIdx = j //        tap 2t uses DWindow[64t + j]
        var t = 0
        while (t < 8) {
          acc += v(vIdx & 1023) * DWindow(dIdx)
          acc += v((vIdx + 96) & 1023) * DWindow(dIdx + 32)
          vIdx += 128
          dIdx += 64
          t += 1
        }
        pcm(pOff + j) = acc
        j += 1
      }
    }
  }

  // ------------------------------------------------------- decoder

  private val MaxSamples = 1 << 24

  /** Decode → (pcm doubles in [-1,1], sampleRate, channels, granules).
    * Stereo output is interleaved L0,R0,L1,R1,... — the WAV sample
    * layout. Mono, stereo, dual-channel, and joint stereo with the MS
    * extension decode (r17); intensity stereo (mode_ext 1/3) refuses
    * with a typed reason. Throws [[Refused]] on any unsupported/odd
    * shape; null-contract callers catch at the expression boundary. */
  def decodeAll(data: Array[Byte]): (Array[Double], Int, Int, Int) = {
    val fs = frames(data)
    if (fs.isEmpty) throw Refused("mp3_no_frames")
    val hz0 = fs.head.hz
    val ver0 = fs.head.ver
    val nch0 = if (fs.head.mode == 3) 1 else 2
    var store = new Array[Byte](0)
    val overlap = Array.ofDim[Double](nch0, 32, 18)
    val synths = Array.fill(nch0)(new Synth)
    val block = new Array[Double](36)
    val slotBuf = new Array[Double](576)
    val pcmParts = Vector.newBuilder[Array[Double]]
    var total = 0L
    var granules = 0
    val sfLong = new Array[Int](22)
    val sfShort = new Array[Int](36)
    val prevLong = Array.ofDim[Int](nch0, 22)
    val xrs = new Array[Array[Double]](nch0)
    for (h <- fs) {
      if (h.hz != hz0 || h.ver != ver0) throw Refused("mp3_mixed_stream")
      val nch = if (h.mode == 3) 1 else 2
      if (nch != nch0) throw Refused("mp3_mixed_stream")
      if (h.mode == 1 && (h.modeExt & 1) != 0)
        throw Refused("mp3_intensity_stereo_unsupported")
      val ms = h.mode == 1 && (h.modeExt & 2) != 0
      val (mdb, scfsi, grs, mainOff) = sideInfo(data, h)
      val frameEnd = h.off + h.flen
      if (mainOff > frameEnd || frameEnd > data.length) throw Refused("mp3_truncated_frame")
      val main = java.util.Arrays.copyOfRange(data, mainOff, frameEnd)
      if (mdb > store.length) {
        // reservoir underrun at stream start: silence per spec practice
        store = appendCapped(store, main)
        val z = new Array[Double](576 * grs.length * nch)
        pcmParts += z
        total += z.length
        granules += grs.length * nch
      } else {
        val buf = new Array[Byte](store.length + main.length)
        System.arraycopy(store, 0, buf, 0, store.length)
        System.arraycopy(main, 0, buf, store.length, main.length)
        val b = new Bits(buf, (store.length - mdb) * 8)
        var gr = 0
        while (gr < grs.length) {
          val chs = grs(gr)
          // all channels' spectra decode first (main-data bit order),
          // then the joint-stereo matrix, then per-channel rendering
          var ch = 0
          while (ch < nch) {
            val g = chs(ch)
            val limit = b.p + g.part23Length
            if (limit > buf.length * 8) throw Refused("mp3_truncated_main_data")
            java.util.Arrays.fill(sfLong, 0)
            java.util.Arrays.fill(sfShort, 0)
            val preflag = readScalefacs(b, g, h.ver, scfsi(ch), gr, prevLong(ch), sfLong, sfShort)
            val is = huffmanDecode(b, g, h.hz, limit)
            if (b.p > limit) throw Refused("mp3_part23_overrun")
            b.p = limit
            var xr = requantize(is, g, sfLong, sfShort, preflag, h.hz)
            if (g.blockType == 2 && g.wsf == 1) xr = reorderShort(xr, h.hz)
            else System.arraycopy(sfLong, 0, prevLong(ch), 0, 22)
            xrs(ch) = xr
            ch += 1
          }
          if (ms) {
            var i = 0
            while (i < 576) {
              val m = xrs(0)(i); val s2 = xrs(1)(i)
              xrs(0)(i) = (m + s2) * ISqrt2
              xrs(1)(i) = (m - s2) * ISqrt2
              i += 1
            }
          }
          val outCh = new Array[Array[Double]](nch)
          ch = 0
          while (ch < nch) {
            val g = chs(ch)
            val xr = xrs(ch)
            aliasReduce(xr, if (g.wsf == 1) g.blockType else 0)
            var sb = 0
            while (sb < 32) {
              imdctBlock(xr, 18 * sb, if (g.wsf == 1) g.blockType else 0, block)
              val ov = overlap(ch)(sb) // hoisted: 2 array derefs per granule, not 36
              var n = 0
              while (n < 18) {
                var v = block(n) + ov(n)
                ov(n) = block(n + 18)
                if ((sb & 1) == 1 && (n & 1) == 1) v = -v
                slotBuf(n * 32 + sb) = v
                n += 1
              }
              sb += 1
            }
            val pcm = new Array[Double](576)
            var s = 0
            while (s < 18) { synths(ch).slot(slotBuf, 32 * s, pcm, 32 * s); s += 1 }
            outCh(ch) = pcm
            granules += 1
            ch += 1
          }
          val out =
            if (nch == 1) outCh(0)
            else {
              val o = new Array[Double](1152)
              var i = 0
              while (i < 576) { o(2 * i) = outCh(0)(i); o(2 * i + 1) = outCh(1)(i); i += 1 }
              o
            }
          pcmParts += out
          total += out.length
          if (total > MaxSamples) throw Refused("mp3_output_bomb")
          gr += 1
        }
        store = appendCapped(store, main)
      }
    }
    val parts = pcmParts.result()
    val pcm = new Array[Double](total.toInt)
    var o = 0
    for (p <- parts) { System.arraycopy(p, 0, pcm, o, p.length); o += p.length }
    (pcm, hz0, nch0, granules)
  }

  /** Mono decode → (pcm, sampleRate, granulesDecoded); kept for the
    * mono-contract pins. */
  def decodeMono(data: Array[Byte]): (Array[Double], Int, Int) = {
    val (pcm, hz, nch, granules) = decodeAll(data)
    if (nch != 1) throw Refused("mp3_stereo_unsupported")
    (pcm, hz, granules)
  }

  private def appendCapped(store: Array[Byte], main: Array[Byte]): Array[Byte] = {
    val cat = new Array[Byte](store.length + main.length)
    System.arraycopy(store, 0, cat, 0, store.length)
    System.arraycopy(main, 0, cat, store.length, main.length)
    if (cat.length <= 2880) cat
    else java.util.Arrays.copyOfRange(cat, cat.length - 2880, cat.length)
  }

  /** Decode to the canonical 44-byte-header PCM16 WAV (the same layout
    * every WAV-tier consumer already holds; stereo: 2-channel header,
    * samples already interleaved by [[decodeAll]]). Quantization:
    * floor(x*32768 + 0.5), clamped — restated identically by the oracle. */
  def decodeToWav(data: Array[Byte]): Array[Byte] = {
    val (pcm, hz, nch, _) = decodeAll(data)
    val n = pcm.length
    val out = new Array[Byte](44 + 2 * n)
    def put(o: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = { w16(o, (v & 0xffff).toInt); w16(o + 2, ((v >> 16) & 0xffff).toInt) }
    put(0, "RIFF"); w32(4, 36L + 2 * n)
    put(8, "WAVEfmt "); w32(16, 16L)
    w16(20, 1); w16(22, nch); w32(24, hz.toLong)
    w32(28, hz.toLong * 2 * nch); w16(32, 2 * nch); w16(34, 16)
    put(36, "data"); w32(40, 2L * n)
    var i = 0
    while (i < n) {
      var q = math.floor(pcm(i) * 32768.0 + 0.5).toInt
      if (q > 32767) q = 32767
      if (q < -32768) q = -32768
      w16(44 + 2 * i, q & 0xffff)
      i += 1
    }
    out
  }

  /** Typed refusal reason, or null when the stream decodes. */
  def dropReason(data: Array[Byte]): String =
    try { decodeAll(data); null }
    catch {
      case Refused(r) => r
      case NonFatal(_) => "mp3_corrupt"
    }

  // ------------------------------------------------ fixture encoder

  /** Bit accumulation for the fixture encoder. */
  private final class BitWriterB {
    private val bs = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { bs += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def lengthBits: Int = bs.length * 8 + nb
    def bytesPadded(): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= bs
      if (nb > 0) out += (cur << (8 - nb)).toByte
      out.toArray
    }
  }

  /** One granule's 59 side-info bits (MPEG-1), both block layouts. */
  private def writeSideGranule(bw: BitWriterB, g: Granule): Unit = {
    bw.write(g.part23Length, 12)
    bw.write(g.bigValues, 9)
    bw.write(g.globalGain, 8)
    bw.write(g.scalefacCompress, 4)
    bw.write(g.wsf, 1)
    if (g.wsf == 1) {
      bw.write(g.blockType, 2)
      bw.write(g.mixed, 1)
      bw.write(g.tableSelect(0), 5); bw.write(g.tableSelect(1), 5)
      bw.write(g.subblockGain(0), 3); bw.write(g.subblockGain(1), 3); bw.write(g.subblockGain(2), 3)
    } else {
      bw.write(g.tableSelect(0), 5); bw.write(g.tableSelect(1), 5); bw.write(g.tableSelect(2), 5)
      bw.write(g.region0Count, 4)
      bw.write(g.region1Count, 3)
    }
    bw.write(g.preflag, 1)
    bw.write(g.scalefacScale, 1)
    bw.write(g.count1Table, 1)
  }

  /** Shared fixture gain plant: 170..186 ≡ 210 (mod 4) — integer requant
    * exponents (the oracle's exact-dyadic path) at a level that never
    * clips int16; clipping would let decoder differences hide behind
    * the clamp. */
  private def fixtureGain(s: Array[Byte]): Int = 170 + 4 * ((s(0) & 0xff) % 5)

  /** MPEG-1 long-block fixture granule (variants 0..5): scalefactors
    * with optional scfsi omission, 5 value pairs, two zero count1 quads.
    * leadZeroPairs > 0 (preflag class) shifts the 5 planted pairs to
    * lines 2*leadZeroPairs.. via (0,0) pairs under table_select(0). */
  private def writeLongGranule(bw: BitWriterB, s: Array[Byte], g: Granule,
      tables: Array[Int], scfsi: Array[Int], gr: Int,
      leadZeroPairs: Int, preflag: Int): Unit = {
    def groupOf(sfb: Int): Int =
      if (sfb < 6) 0 else if (sfb < 11) 1 else if (sfb < 16) 2 else 3
    // scalefactors: scalefac_compress=8 → slen1=2 (bands 0..10), slen2=1
    // (bands 11..20); scfsi-reused groups are omitted on granule 1
    var sfb = 0
    while (sfb < 11) {
      if (gr == 0 || scfsi(groupOf(sfb)) == 0)
        bw.write(if (sfb < 3) s(1 + sfb) & 3 else 0, 2)
      sfb += 1
    }
    while (sfb < 21) {
      if (gr == 0 || scfsi(groupOf(sfb)) == 0)
        bw.write(if (sfb == 11 || sfb == 12) s(sfb - 7) & 1 else 0, 1)
      sfb += 1
    }
    val nbig = leadZeroPairs + 5
    val bounds = new Array[Int](23)
    val widths = sfbLong(44100)
    var k = 0
    while (k < 22) { bounds(k + 1) = bounds(k) + widths(k); k += 1 }
    val r1 = bounds(math.min(g.region0Count + 1, 22))
    val r2 = bounds(math.min(g.region0Count + 1 + g.region1Count + 1, 22))
    var p = 0
    while (p < nbig) {
      val line = 2 * p
      val region = if (line < r1) 0 else if (line < r2) 1 else 2
      val tid = tables(region)
      if (p < leadZeroPairs) writePair(bw, tid, 0, 0)
      else {
        val i = 2 * (p - leadZeroPairs)
        writePair(bw, tid, (s(6 + i) & 0xff) - 5, (s(6 + i + 1) & 0xff) - 5)
      }
      p += 1
    }
    // count1: two zero quads under table A (len-1 code for (0,0,0,0))
    bw.write(Count1Code0(0), Count1Len0(0))
    bw.write(Count1Code0(0), Count1Len0(0))
    g.bigValues = nbig
    g.globalGain = fixtureGain(s)
    g.scalefacCompress = 8
    g.tableSelect(0) = tables(0); g.tableSelect(1) = tables(1); g.tableSelect(2) = tables(2)
    g.preflag = preflag
    g.scalefacScale = 1
  }

  /** MPEG-1 SHORT-block fixture granule (variant 6, block_type 2,
    * non-mixed): sf_short(0)(w) planted from bytes 1..3, subblock gains
    * (0, b4&1, b5&1), 5 value pairs at src lines 0..9 (all below line
    * 36 → region 0), two zero count1 quads. */
  private def writeShortGranule(bw: BitWriterB, s: Array[Byte], g: Granule): Unit = {
    var sfb = 0
    while (sfb < 6) {       // slen1 = 2 bits
      var w = 0
      while (w < 3) {
        bw.write(if (sfb == 0) s(1 + w) & 3 else 0, 2)
        w += 1
      }
      sfb += 1
    }
    while (sfb < 12) {      // slen2 = 1 bit
      var w = 0
      while (w < 3) { bw.write(0, 1); w += 1 }
      sfb += 1
    }
    var i = 0
    while (i < 10) {
      writePair(bw, 7, (s(6 + i) & 0xff) - 5, (s(6 + i + 1) & 0xff) - 5)
      i += 2
    }
    bw.write(Count1Code0(0), Count1Len0(0))
    bw.write(Count1Code0(0), Count1Len0(0))
    g.bigValues = 5
    g.globalGain = fixtureGain(s)
    g.scalefacCompress = 8
    g.wsf = 1
    g.blockType = 2
    g.mixed = 0
    g.tableSelect(0) = 7; g.tableSelect(1) = 8
    g.subblockGain(0) = 0
    g.subblockGain(1) = s(4) & 1
    g.subblockGain(2) = s(5) & 1
    g.scalefacScale = 1
  }

  /** MPEG-1 Layer III fixture frames. Spec bytes (16 per granule-block):
    * b0 → global_gain 170+4*(b0%5), b1..b3 → sf plants (0..3), b4..b5 →
    * slen2 sf plants (0..1; short class: subblock gains), b6..b15 → ten
    * spectral values biased −5. Variants pick byte-DIFFERENT codings or
    * distinct decode paths over the SAME closed-form plant:
    *   0 → long blocks, tables (7,8), 40-byte bit reservoir;
    *   1 → long, tables (9,9), no reservoir (decode-identical to 0 — the
    *       dedup_audio_mp3 pairing that exists only through real decode);
    *   2 → scfsi 1010: each frame's second granule omits the reused
    *       scalefactor groups (the MPEG-1 reuse path);
    *   3 → long, tables (10,10) — the r17 Kraft-validated table 10;
    *   4 → preflag=1 with the 5 value pairs moved to lines 62..71
    *       (sfb 11, pretab 1 — the r17 ADVICE class: only a decoder with
    *       the CORRECT ISO pretab hash-matches its oracle);
    *   5 → joint stereo with MS extension: granule-blocks alternate
    *       M,S channels (frame = 4 blocks), L=(M+S)·ISqrt2, R=(M−S)·ISqrt2;
    *   6 → short blocks (block_type 2, non-mixed): the 12-point IMDCT
    *       triple at 6-sample offsets, subblock gains, reorder map;
    *   7 → MS stereo like 5 but tables (9,9) and frame-aligned (no
    *       reservoir): a byte-DIFFERENT stereo coding that decodes
    *       identically to 5 — the dedup pairing, stereo edition. */
  def encodeFixture(spec: Array[Byte], variant: Int): Array[Byte] = {
    require(spec.length % 16 == 0 && spec.length > 0 && spec.length <= 64 * 16,
      s"spec multiple of 16 bytes, got ${spec.length}")
    require(variant >= 0 && variant <= 7, s"variant 0..7, got $variant")
    val nch = if (variant == 5 || variant == 7) 2 else 1
    val perFrame = 2 * nch
    val nblocks = spec.length / 16
    require(nblocks % perFrame == 0, s"whole frames only ($perFrame blocks each)")
    val tables =
      if (variant == 1 || variant == 7) Array(9, 9, 0)
      else if (variant == 3) Array(10, 10, 0)
      else Array(7, 8, 0)
    val reservoir = if (variant == 1 || variant == 7) 0 else 40
    // variant 2: scfsi groups 0 and 2 reused — granule 1 of each frame
    // OMITS the scalefactors of bands 0..5 and 11..15 and the decoder
    // must substitute granule 0's (the MPEG-1 scfsi path, which no real
    // asset on this box exercises: the one real stream is LSF)
    val scfsi = if (variant == 2) Array(1, 0, 1, 0) else Array(0, 0, 0, 0)
    val kbpsIdx = 9 // 128 kbps
    val flen = 144 * BitrateV1(kbpsIdx) * 1000 / 44100
    val siBytes = if (nch == 1) 17 else 32
    val cap = flen - 4 - siBytes
    val nfr = nblocks / perFrame
    // per-frame padded main data + side info fields
    val mains = new Array[Array[Byte]](nfr)
    val sides = Array.ofDim[Granule](nfr, perFrame)
    var f = 0
    while (f < nfr) {
      val bw = new BitWriterB
      var slot = 0
      while (slot < perFrame) {
        val s = spec.slice(16 * (perFrame * f + slot), 16 * (perFrame * f + slot) + 16)
        val gr = slot / nch
        val before = bw.lengthBits
        val g = new Granule
        variant match {
          case 6 => writeShortGranule(bw, s, g)
          case 4 =>
            g.region0Count = 11; g.region1Count = 0
            writeLongGranule(bw, s, g, tables, scfsi, gr,
              leadZeroPairs = 31, preflag = 1)
          case _ =>
            g.region0Count = 0; g.region1Count = 1
            writeLongGranule(bw, s, g, tables, scfsi, gr,
              leadZeroPairs = 0, preflag = 0)
        }
        g.part23Length = bw.lengthBits - before
        sides(f)(slot) = g
        slot += 1
      }
      val m = bw.bytesPadded()
      val target = if (f == 0 && nfr > 1) cap - reservoir else cap
      require(m.length <= target, "fixture overflows frame")
      mains(f) = m ++ new Array[Byte](target - m.length)
      f += 1
    }
    val stream = new scala.collection.mutable.ArrayBuffer[Byte]()
    mains.foreach(stream ++= _)
    while (stream.length < nfr * cap) stream += 0
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var consumed = 0
    var offset = 0
    f = 0
    while (f < nfr) {
      val mdb = if (f > 0) consumed - offset else 0
      require(mdb >= 0 && mdb <= 511, s"mdb $mdb")
      offset += mains(f).length
      out += 0xff.toByte
      out += 0xfb.toByte
      out += ((kbpsIdx << 4) | 0).toByte
      // mono: mode 3; stereo class: joint stereo (mode 1) with MS ext
      out += (if (nch == 1) 0xc0 else 0x60).toByte
      val bw = new BitWriterB
      bw.write(mdb, 9)
      bw.write(0, if (nch == 1) 5 else 3)
      var ch = 0
      while (ch < nch) {
        bw.write(scfsi(0), 1); bw.write(scfsi(1), 1)
        bw.write(scfsi(2), 1); bw.write(scfsi(3), 1)
        ch += 1
      }
      var slot = 0
      while (slot < perFrame) {
        writeSideGranule(bw, sides(f)(slot))
        slot += 1
      }
      val si = bw.bytesPadded()
      require(si.length == siBytes, si.length.toString)
      out ++= si
      var k = consumed
      while (k < consumed + cap) { out += stream(k); k += 1 }
      consumed += cap
      f += 1
    }
    out.toArray
  }

  private def writePair(bw: BitWriterB, tid: Int, x: Int, y: Int): Unit = {
    val (ny, ls, cs) = tid match {
      case 7 => (6, HuffLen7, HuffCode7)
      case 8 => (6, HuffLen8, HuffCode8)
      case 9 => (6, HuffLen9, HuffCode9)
      case 10 => (8, HuffLen10, HuffCode10)
      case _ => throw Refused("mp3_fixture_table")
    }
    val ax = math.abs(x); val ay = math.abs(y)
    require(ax < ny && ay < ny, s"value out of table range: $x,$y")
    val i = ax * ny + ay
    bw.write(cs(i), ls(i))
    if (x != 0) bw.write(if (x < 0) 1 else 0, 1)
    if (y != 0) bw.write(if (y < 0) 1 else 0, 1)
  }
}
