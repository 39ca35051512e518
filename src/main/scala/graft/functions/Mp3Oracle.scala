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

  /** 44-byte canonical WAV header for n samples at 44.1 kHz mono, hex. */
  private def wavHeaderHex(n: Int): String = {
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
    w16(20, 1); w16(22, 1); w32(24, 44100L)
    w32(28, 88200L); w16(32, 2); w16(34, 16)
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
