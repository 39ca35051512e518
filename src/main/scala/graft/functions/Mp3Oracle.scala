package graft.functions

/** DuckDB oracle SQL for `multimodal_decode_mp3`: an INDEPENDENT
  * straight-from-the-formula restatement of the entire Layer III decode
  * chain — requantize (exact dyadic exponents by fixture construction),
  * the 36x18 IMDCT, long-window application, granule overlap-add, and
  * the polyphase synthesis reduced to its (D, NCos) tap algebra — over
  * the SAME frozen IEEE-754 constants the decoder uses
  * ([[Mp3Tables]]; libm trig differs across runtimes in the last ulp,
  * so the constants were evaluated once in the prototype and shared —
  * the STRUCTURE of this recompute shares nothing with the decoder's
  * control flow, which is what the oracle pins).
  *
  * Bit-exactness contract with [[Mp3L3]]: every floating-point operation
  * here mirrors the decoder's operation ORDER (left-associated term
  * chains; `D * (N * S)` two-step rounding; explicit `+ 0.0` where the
  * decoder adds a zero overlap), because IEEE-754 addition is not
  * associative. The fixture plants only subband-0 spectral lines, so
  * alias reduction is the identity and the synthesis collapses to the
  * single-subband tap form
  *   PCM[32s+j] = sum_i D[j+32i] * (NCos[j+32(i mod 2)][0] * S0[s-i]),
  * an index mapping PROVEN in the prototype (decode == recompute
  * bit-identical; tools/mp3_proto.py roundtrip_check). Output int16
  * quantization is floor(x*32768+0.5) with clamp on both sides. */
private[graft] object Mp3Oracle {

  private def d(v: Double): String = {
    val s = java.lang.Double.toString(v)
    s
  }

  private def list(vals: Seq[String]): String = vals.mkString("[", ", ", "]")

  /** 44-byte canonical WAV header for n total samples (interleaved when
    * nch=2) at 44.1 kHz, hex. */
  private def wavHeaderHex(n: Int, nch: Int = 1): String = {
    val out = new Array[Byte](44)
    def put(o: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = { w16(o, (v & 0xffff).toInt); w16(o + 2, ((v >> 16) & 0xffff).toInt) }
    put(0, "RIFF"); w32(4, 36L + 2L * n)
    put(8, "WAVEfmt "); w32(16, 16L)
    w16(20, 1); w16(22, nch); w32(24, 44100L)
    w32(28, 88200L * nch); w16(32, 2 * nch); w16(34, 16)
    put(36, "data"); w32(40, 2L * n)
    out.map(b => f"${b & 0xff}%02X").mkString
  }

  /** The oracle for 4 granules (2 frames, 2304 samples). */
  lazy val decodeSql: String = build(scfsi = false)

  /** The scfsi-variant oracle: fixture variant 2 reuses scalefactor
    * groups 0 and 2 on each frame's second granule, and the planted
    * bands (0..2 slen1, 11..12 slen2) all live in those groups — so the
    * effective scalefactors of an ODD granule are the EVEN granule's
    * plant, a one-index change in the restatement that only a decoder
    * actually honoring scfsi can hash-match. */
  lazy val decodeScfsiSql: String = build(scfsi = true)

  /** The preflag-class oracle (fixture variant 4): 5 value pairs at
    * lines 62..71 (sfb 11) with preflag=1, so every nonzero line's
    * exponent carries the ISO pretab's +1 — a decoder with the r16
    * shifted pretab lands 0.176 full-scale away (proven in the
    * prototype). Lines 62..71 sit in subband 3; the boundary-72 alias
    * butterflies leak into subband 4; subband 3 is odd, so its
    * overlap-added output is frequency-inverted at odd slots; synthesis
    * runs over NCos columns 3 and 4. Exact algebra proven bit-identical
    * to the decoder in tools/mp3_proto.py (roundtrip_preflag). */
  lazy val decodePreflagSql: String = buildPreflag()

  /** The MS joint-stereo oracle (fixture variant 5): granule-blocks
    * alternate M,S; the decoder matrixes L=(M+S)·ISqrt2, R=(M−S)·ISqrt2
    * on the requantized spectra, then two independent subband-0 chains
    * interleave into the stereo WAV layout. Proven bit-identical in
    * tools/mp3_proto.py (roundtrip_ms). */
  lazy val decodeMsSql: String = buildMs()

  /** The short-block oracle (fixture variant 6, block_type 2): the ten
    * src-order values land in subband 0 through the reorder map
    * (dst = 3k+w), requantized with per-window subblock gains, and the
    * three 12-point IMDCTs overlap at 6-sample offsets (the ISO
    * placement this round FIXED in the decoder — the long-only fixtures
    * never executed it). Proven bit-identical in tools/mp3_proto.py
    * (roundtrip_short). */
  lazy val decodeShortSql: String = buildShort()

  private def specBytesCte(nblocks: Int): String = {
    val mods = "CASE i % 16 WHEN 0 THEN 5 WHEN 1 THEN 4 WHEN 2 THEN 4 " +
      "WHEN 3 THEN 4 WHEN 4 THEN 2 WHEN 5 THEN 2 ELSE 11 END"
    s"""SELECT doc_id,
       |  [ ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-m3' || CAST(i AS VARCHAR)), 1, 2))::INT
       |      % ($mods) for i in range(0, ${16 * nblocks})] AS sb
       |  FROM documents""".stripMargin
  }

  private def quantHex(pcmExpr: String, n: Int, nch: Int): String = {
    val hdr = wavHeaderHex(n, nch)
    s"""q AS (SELECT doc_id,
       |  [ least(32767, greatest(-32768, CAST(floor(v * 32768.0 + 0.5) AS BIGINT)))
       |    for v in $pcmExpr] AS qq FROM p)
       |SELECT doc_id,
       |  '$hdr' AS wav_hdr_hex,
       |  array_to_string([ printf('%02X%02X', v & 255, (v >> 8) & 255) for v in qq], '') AS pcm_hex
       |FROM q""".stripMargin
  }

  private def buildPreflag(): String = {
    import Mp3Tables._
    val nGr = 4
    val nSamples = 576 * nGr
    val nSlots = 18 * nGr
    val cl = list((0 until 36 * 18).map(i => d(CosL(i))))
    val wl = list((0 until 36).map(i => d(WinLong(i))))
    val dw = list((0 until 512).map(i => d(DWindow(i))))
    val nc3 = list((0 until 64).map(i => d(NCos(i * 32 + 3))))
    val nc4 = list((0 until 64).map(i => d(NCos(i * 32 + 4))))
    val p43 = list((0 until 6).map(i => d(Pow43(i))))
    val cs = list((0 until 8).map(i => d(AliasCs(i))))
    val ca = list((0 until 8).map(i => d(AliasCa(i))))
    // pre-alias subband-3 lines (kk = line - 54): planted kk 8..17 from
    // spec bytes 6..15 (1-based kk-1); e = m - 11 - sf11 — the 11 is
    // 10 + pretab[11], the preflag term under test
    val xr3Cell =
      s"""CASE WHEN kk < 8 OR sb[16*g + kk - 1] = 5 THEN 0.0 ELSE
        | (CASE WHEN sb[16*g + kk - 1] < 5 THEN -1.0 ELSE 1.0 END) *
        | (p43[abs(sb[16*g + kk - 1] - 5) + 1] *
        |  power(2.0, CAST(sb[16*g + 1] - 11 - sb[16*g + 5] AS DOUBLE))) END""".stripMargin.replace("\n", " ")
    val x3 = s"[[ $xr3Cell for kk in range(0, 18)] for g in range(0, $nGr)]"
    // boundary-72 alias butterflies, decoder expressions kept verbatim
    // (the b side is zero): i = 17-kk for the a side, i = kk for b
    val x3p = s"[[ CASE WHEN kk >= 10 THEN x3[g+1][kk+1] * cs[18 - kk] - 0.0 * ca[18 - kk] " +
      s"ELSE x3[g+1][kk+1] END for kk in range(0, 18)] for g in range(0, $nGr)]"
    val x4 = s"[[ CASE WHEN kk < 8 THEN 0.0 * cs[kk + 1] + x3[g+1][18 - kk] * ca[kk + 1] " +
      s"ELSE 0.0 END for kk in range(0, 18)] for g in range(0, $nGr)]"
    def imdOf(src: String) = {
      val chain = (0 until 18).map(k => s"$src[g+1][${k + 1}] * cl[n*18 + ${k + 1}]").mkString(" + ")
      s"[[ ($chain) * wl[n+1] for n in range(0, 36)] for g in range(0, $nGr)]"
    }
    def slotsOf(src: String, invert: Boolean) = {
      val base = s"CASE WHEN s >= 18 THEN $src[s//18 + 1][s%18 + 1] + $src[s//18][s%18 + 19] " +
        s"ELSE $src[1][s%18 + 1] + 0.0 END"
      val cell = if (invert) s"CASE WHEN s%18 % 2 = 1 THEN -($base) ELSE ($base) END" else base
      s"[ $cell for s in range(0, $nSlots)]"
    }
    val taps = (0 until 16).map { i =>
      s"(CASE WHEN t//32 - $i >= 0 THEN dw[t%32 + ${32 * i} + 1] * " +
        s"(nc3[t%32 + ${32 * (i % 2)} + 1] * s3[t//32 - $i + 1] + " +
        s"nc4[t%32 + ${32 * (i % 2)} + 1] * s4[t//32 - $i + 1]) ELSE 0.0 END)"
    }.mkString(" + ")
    s"""WITH k AS (SELECT $cl AS cl, $wl AS wl, $dw AS dw, $nc3 AS nc3, $nc4 AS nc4,
       |  $p43 AS p43, $cs AS cs, $ca AS ca),
       |b AS (${specBytesCte(nGr)}),
       |x AS (SELECT doc_id, $x3 AS x3 FROM b, k),
       |xp AS (SELECT doc_id, $x3p AS x3p, $x4 AS x4 FROM x, k),
       |m3 AS (SELECT doc_id, ${imdOf("x3p").replace("x3p[", "x3p[")} AS m3 FROM xp, k),
       |m4 AS (SELECT doc_id, ${imdOf("x4")} AS m4 FROM xp, k),
       |mm AS (SELECT m3.doc_id, m3.m3 AS m3, m4.m4 AS m4 FROM m3 JOIN m4 USING (doc_id)),
       |s AS (SELECT doc_id, ${slotsOf("m3", invert = true)} AS s3,
       |  ${slotsOf("m4", invert = false)} AS s4 FROM mm),
       |p AS (SELECT doc_id, [ $taps for t in range(0, $nSamples)] AS pcm FROM s, k),
       |${quantHex("pcm", nSamples, 1)}""".stripMargin
  }

  private def buildMs(): String = {
    import Mp3Tables._
    val nGr = 4
    val perCh = 576 * nGr
    val nSlots = 18 * nGr
    val cl = list((0 until 36 * 18).map(i => d(CosL(i))))
    val wl = list((0 until 36).map(i => d(WinLong(i))))
    val dw = list((0 until 512).map(i => d(DWindow(i))))
    val nc0 = list((0 until 64).map(i => d(NCos(i * 32))))
    val p43 = list((0 until 6).map(i => d(Pow43(i))))
    val c = d(ISqrt2)
    // requantized subband-0 lines of one granule-block (blk = spec block
    // index expression): the long-class cell with per-block indexing
    def cell(blk: String) =
      s"""CASE WHEN kk >= 10 OR sb[16*($blk) + 7 + kk] = 5 THEN 0.0 ELSE
        | (CASE WHEN sb[16*($blk) + 7 + kk] < 5 THEN -1.0 ELSE 1.0 END) *
        | (p43[abs(sb[16*($blk) + 7 + kk] - 5) + 1] *
        |  power(2.0, CAST(sb[16*($blk) + 1] - 10 -
        |    sb[16*($blk) + 2 + (CASE WHEN kk < 4 THEN 0 WHEN kk < 8 THEN 1 ELSE 2 END)]
        |    AS DOUBLE))) END""".stripMargin.replace("\n", " ")
    val xm = s"[[ ${cell("2*g")} for kk in range(0, 18)] for g in range(0, $nGr)]"
    val xs = s"[[ ${cell("2*g + 1")} for kk in range(0, 18)] for g in range(0, $nGr)]"
    val xl = s"[[ (xm[g+1][kk+1] + xs[g+1][kk+1]) * $c for kk in range(0, 18)] for g in range(0, $nGr)]"
    val xr = s"[[ (xm[g+1][kk+1] - xs[g+1][kk+1]) * $c for kk in range(0, 18)] for g in range(0, $nGr)]"
    def imdOf(src: String) = {
      val chain = (0 until 18).map(k => s"$src[g+1][${k + 1}] * cl[n*18 + ${k + 1}]").mkString(" + ")
      s"[[ ($chain) * wl[n+1] for n in range(0, 36)] for g in range(0, $nGr)]"
    }
    def slotsOf(src: String) =
      s"[ CASE WHEN s >= 18 THEN $src[s//18 + 1][s%18 + 1] + $src[s//18][s%18 + 19] " +
        s"ELSE $src[1][s%18 + 1] + 0.0 END for s in range(0, $nSlots)]"
    def tapsOf(sl: String) = (0 until 16).map { i =>
      s"(CASE WHEN t//32 - $i >= 0 THEN dw[t%32 + ${32 * i} + 1] * " +
        s"(nc0[t%32 + ${32 * (i % 2)} + 1] * $sl[t//32 - $i + 1]) ELSE 0.0 END)"
    }.mkString(" + ")
    val inter = s"[ CASE WHEN t % 2 = 0 THEN pl[t//2 + 1] ELSE pr[t//2 + 1] END " +
      s"for t in range(0, ${2 * perCh})]"
    s"""WITH k AS (SELECT $cl AS cl, $wl AS wl, $dw AS dw, $nc0 AS nc0, $p43 AS p43),
       |b AS (${specBytesCte(2 * nGr)}),
       |x0 AS (SELECT doc_id, $xm AS xm, $xs AS xs FROM b, k),
       |x AS (SELECT doc_id, $xl AS xl, $xr AS xr FROM x0),
       |ml AS (SELECT doc_id, ${imdOf("xl")} AS ml FROM x, k),
       |mr AS (SELECT doc_id, ${imdOf("xr")} AS mr FROM x, k),
       |mm AS (SELECT ml.doc_id, ml.ml AS ml, mr.mr AS mr FROM ml JOIN mr USING (doc_id)),
       |s AS (SELECT doc_id, ${slotsOf("ml")} AS sl, ${slotsOf("mr")} AS sr FROM mm),
       |p AS (SELECT doc_id, [ ${tapsOf("sl")} for t in range(0, $perCh)] AS pl,
       |  [ ${tapsOf("sr")} for t in range(0, $perCh)] AS pr FROM s, k),
       |${quantHex(inter, 2 * perCh, 2)}""".stripMargin
  }

  private def buildShort(): String = {
    import Mp3Tables._
    val nGr = 4
    val nSamples = 576 * nGr
    val nSlots = 18 * nGr
    val dw = list((0 until 512).map(i => d(DWindow(i))))
    val nc0 = list((0 until 64).map(i => d(NCos(i * 32))))
    val p43 = list((0 until 6).map(i => d(Pow43(i))))
    val csS = list((0 until 12 * 6).map(i => d(CosS(i))))
    val ws = list((0 until 12).map(i => d(WinShort(i))))
    // post-reorder subband-0 lines: dst d = 3k+w ← src 4w+k (w<2) / 8+k
    // (w=2, k<2); exponent m - 10 - 2*ssg[w] - sf0[w] (exact integer)
    def xrD(dIdx: Int): String = {
      val w = dIdx % 3
      val k = dIdx / 3
      val src = if (w < 2) { if (k < 4) Some(4 * w + k) else None }
      else { if (k < 2) Some(8 + k) else None }
      src match {
        case None => "0.0"
        case Some(s0) =>
          val byte = s"sb[16*g + ${7 + s0}]"
          val ssg = w match {
            case 0 => ""
            case 1 => " - 2*sb[16*g + 5]"
            case 2 => " - 2*sb[16*g + 6]"
          }
          s"CASE WHEN $byte = 5 THEN 0.0 ELSE " +
            s"(CASE WHEN $byte < 5 THEN -1.0 ELSE 1.0 END) * " +
            s"(p43[abs($byte - 5) + 1] * " +
            s"power(2.0, CAST(sb[16*g + 1] - 10$ssg - sb[16*g + ${2 + w}] AS DOUBLE))) END"
      }
    }
    val xr = s"[[ ${(0 until 18).map(xrD).mkString(", ")} ] for g in range(0, $nGr)]"
    // windowed 12-point IMDCT triple at 6-sample offsets, windows
    // ascending (decoder accumulation order); positions 0..5 and 30..35
    // receive no window → exact 0.0
    def imdN(n: Int): String = {
      val terms = (0 until 3).flatMap { w =>
        val nn = n - 6 - 6 * w
        if (nn < 0 || nn > 11) None
        else {
          val chain = (0 until 6).map(k => s"xr[g+1][${3 * k + w + 1}] * csS[${nn * 6 + k + 1}]").mkString(" + ")
          Some(s"($chain) * ws[${nn + 1}]")
        }
      }
      if (terms.isEmpty) "0.0" else terms.mkString(" + ")
    }
    val imd = s"[[ ${(0 until 36).map(imdN).mkString(", ")} ] for g in range(0, $nGr)]"
    val slots = s"[ CASE WHEN s >= 18 THEN imd[s//18 + 1][s%18 + 1] + imd[s//18][s%18 + 19] " +
      s"ELSE imd[1][s%18 + 1] + 0.0 END for s in range(0, $nSlots)]"
    val taps = (0 until 16).map { i =>
      s"(CASE WHEN t//32 - $i >= 0 THEN dw[t%32 + ${32 * i} + 1] * " +
        s"(nc0[t%32 + ${32 * (i % 2)} + 1] * sl[t//32 - $i + 1]) ELSE 0.0 END)"
    }.mkString(" + ")
    s"""WITH k AS (SELECT $dw AS dw, $nc0 AS nc0, $p43 AS p43, $csS AS csS, $ws AS ws),
       |b AS (${specBytesCte(nGr)}),
       |x AS (SELECT doc_id, $xr AS xr FROM b, k),
       |m AS (SELECT doc_id, $imd AS imd FROM x, k),
       |s AS (SELECT doc_id, $slots AS sl FROM m),
       |p AS (SELECT doc_id, [ $taps for t in range(0, $nSamples)] AS pcm FROM s, k),
       |${quantHex("pcm", nSamples, 1)}""".stripMargin
  }

  private def build(scfsi: Boolean): String = {
    import Mp3Tables._
    // granule whose spec bytes supply the scalefactors
    val sfG = if (scfsi) "(g - g%2)" else "g"
    val nGr = 4
    val nSamples = 576 * nGr
    val nSlots = 18 * nGr
    // literal constant lists
    val cl = list((0 until 36 * 18).map(i => d(CosL(i))))
    val wl = list((0 until 36).map(i => d(WinLong(i))))
    val dw = list((0 until 512).map(i => d(DWindow(i))))
    // k = 0 column of the 64x32 synthesis matrix — the only column a
    // single-subband fixture excites
    val nc0 = list((0 until 64).map(i => d(NCos(i * 32))))
    val p43 = list((0 until 6).map(i => d(Pow43(i))))
    // spec bytes: i-th byte = md5(doc_id || '-m3' || i) first-byte mod m_i
    val mods = "CASE i % 16 WHEN 0 THEN 5 WHEN 1 THEN 4 WHEN 2 THEN 4 " +
      "WHEN 3 THEN 4 WHEN 4 THEN 2 WHEN 5 THEN 2 ELSE 11 END"
    // requantized spectral lines: per granule g (0-based), 18 values, only
    // k<10 nonzero; e = m - 10 - sf(k) is an exact integer exponent
    val xrCell =
      s"""CASE WHEN kk >= 10 OR sb[16*g + 7 + kk] = 5 THEN 0.0 ELSE
        | (CASE WHEN sb[16*g + 7 + kk] < 5 THEN -1.0 ELSE 1.0 END) *
        | (p43[abs(sb[16*g + 7 + kk] - 5) + 1] *
        |  power(2.0, CAST(sb[16*g + 1] - 10 -
        |    sb[16*$sfG + 2 + (CASE WHEN kk < 4 THEN 0 WHEN kk < 8 THEN 1 ELSE 2 END)]
        |    AS DOUBLE))) END""".stripMargin.replace("\n", " ")
    val xr = s"[[ $xrCell for kk in range(0, 18)] for g in range(0, $nGr)]"
    // IMDCT + long window: 18-term left-associated chain, decoder order
    val imdChain = (0 until 18).map(k =>
      s"xr[g+1][${k + 1}] * cl[n*18 + ${k + 1}]").mkString(" + ")
    val imd = s"[[ ($imdChain) * wl[n+1] for n in range(0, 36)] for g in range(0, $nGr)]"
    // overlap-add into the 18-per-granule slot series (+ 0.0 mirrors the
    // decoder's zero-initialized overlap on granule 0)
    val slots = s"[ CASE WHEN s >= 18 THEN imd[s//18 + 1][s%18 + 1] + imd[s//18][s%18 + 19] " +
      s"ELSE imd[1][s%18 + 1] + 0.0 END for s in range(0, $nSlots)]"
    // synthesis: 16 taps, D * (N * S) two-step rounding, ascending i
    val taps = (0 until 16).map { i =>
      s"(CASE WHEN t//32 - $i >= 0 THEN dw[t%32 + ${32 * i} + 1] * " +
        s"(nc0[t%32 + ${32 * (i % 2)} + 1] * sl[t//32 - $i + 1]) ELSE 0.0 END)"
    }.mkString(" + ")
    val pcm = s"[ $taps for t in range(0, $nSamples)]"
    val hdr = wavHeaderHex(nSamples)
    s"""WITH k AS (SELECT $cl AS cl, $wl AS wl, $dw AS dw, $nc0 AS nc0, $p43 AS p43),
       |b AS (SELECT doc_id,
       |  [ ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-m3' || CAST(i AS VARCHAR)), 1, 2))::INT
       |      % ($mods) for i in range(0, ${16 * nGr})] AS sb
       |  FROM documents),
       |x AS (SELECT doc_id, $xr AS xr FROM b, k),
       |m AS (SELECT doc_id, $imd AS imd FROM x, k),
       |s AS (SELECT doc_id, $slots AS sl FROM m),
       |p AS (SELECT doc_id, $pcm AS pcm FROM s, k),
       |q AS (SELECT doc_id,
       |  [ least(32767, greatest(-32768, CAST(floor(v * 32768.0 + 0.5) AS BIGINT)))
       |    for v in pcm] AS qq FROM p)
       |SELECT doc_id,
       |  '$hdr' AS wav_hdr_hex,
       |  array_to_string([ printf('%02X%02X', v & 255, (v >> 8) & 255) for v in qq], '') AS pcm_hex
       |FROM q""".stripMargin
  }
}
