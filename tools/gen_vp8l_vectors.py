#!/usr/bin/env python3
"""Generate VP8L (WebP lossless) test vectors straight from the public
"WebP Lossless Bitstream Specification", independently of the Scala
decoder under test (src/main/scala/graft/functions/Native.scala, object
Webp). Each case hand-assembles a bit stream per the spec and states the
expected ARGB pixels analytically; the hex + expectations are embedded
as constants in MultimodalSpec — so a decoder bug cannot be compensated
by an encoder bug (the streams exercise features the fixture encoder
never emits: LZ77 references, the color cache, all four transforms, the
meta prefix image, simple codes).

Run: python3 tools/gen_vp8l_vectors.py
"""


class BW:
    """LSB-first bit writer (the VP8L convention)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def msb(self, v, n):
        """Write an n-bit canonical CODE, MSB first."""
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def container(payload):
    pad = len(payload) & 1
    sz = 4 + 8 + len(payload) + pad
    out = b"RIFF" + sz.to_bytes(4, "little") + b"WEBP" + b"VP8L"
    out += len(payload).to_bytes(4, "little") + payload
    if pad:
        out += b"\x00"
    return out


def header(bw, w, h):
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version


def simple1(bw, sym):
    """Simple prefix code, one symbol (0-bit reads afterwards)."""
    bw.w(1, 1)          # simple
    bw.w(0, 1)          # nsym-1 = 0
    if sym < 2:
        bw.w(0, 1)      # 1-bit symbol
        bw.w(sym, 1)
    else:
        bw.w(1, 1)      # 8-bit symbol
        bw.w(sym, 8)


def simple2(bw, s0, s1):
    """Simple prefix code, two symbols (each decode reads 1 bit).
    Canonical: lower symbol gets code 0."""
    bw.w(1, 1)          # simple
    bw.w(1, 1)          # nsym-1 = 1
    bw.w(1, 1)          # first symbol in 8 bits
    bw.w(s0, 8)
    bw.w(s1, 8)


def code_for_2(s0, s1, sym):
    """Canonical 1-bit code of sym in a {s0, s1} simple code."""
    lo = min(s0, s1)
    return 0 if sym == lo else 1


def group_single(bw, g, r, b, a):
    """A prefix-code group whose literal reads consume 0 bits."""
    simple1(bw, g)   # green
    simple1(bw, r)   # red
    simple1(bw, b)   # blue
    simple1(bw, a)   # alpha
    simple1(bw, 0)   # distance


def argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def show(name, payload, w, h, pixels, note):
    data = container(payload)
    print(f"// {name}: {note}")
    print(f'val {name} = "{data.hex()}"')
    px = ", ".join(f"0x{p:08x}" for p in pixels)
    print(f"val {name}Px = Array({px}) // {w}x{h} ARGB")
    print()


def cache_slot(v, bits):
    return ((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - bits)


def zero_runs(n):
    """Split n zero code-lengths into 17/18-repeat chunks (3..10 via 17,
    11..138 via 18), never leaving an unreachable remainder of 1-2."""
    out = []
    while n > 0:
        if 3 <= n <= 138:
            take = n
        elif n > 138:
            take = 138 if n - 138 >= 3 else 135
        else:
            raise SystemExit(f"cannot emit a zero-run of {n}")
        out.append(take)
        n -= take
    return out


def emit_zero_runs(bw, cl, n):
    for take in zero_runs(n):
        if take <= 10:
            bw.msb(cl(17), 2)
            bw.w(take - 3, 3)
        else:
            bw.msb(cl(18), 2)
            bw.w(take - 11, 7)


# ---- case 1: LZ77 backward reference -------------------------------------
# 4x1 image. Green code = simple2 over {1 (literal green), 256+2 (length
# prefix code 2 -> length 3)}. r/b/a single-symbol. distance = simple2
# {0, 1}: prefix code 0 -> dist 1... we need dist code value: planeToDist
# uses prefixValue(distcode)=1 -> plane code 1 -> (0,1)?? plane code 1 is
# (dx,dy)=(0,1): dist = 1*4+0 = 4 -- NOT 1. Use prefix value > 120+...
# Simplest: distance prefix symbol that yields raw dist: code c with
# prefixValue v; planeToDist maps v>120 to v-120. v=121 needs extra bits.
# Easier: dist plane code 2 = (1,0) -> dist = 0*4+1 = 1. prefixValue must
# be 2 -> distance prefix symbol 1 (code<4 -> code+1=2). So distance code
# = simple1(1): every ref reads 0 bits and distances resolve to 1.
def case_lz77():
    w, h = 4, 1
    bw = BW()
    header(bw, w, h)
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no color cache
    bw.w(0, 1)  # no meta image
    # green: lengths {1:1, 258:1} via the NORMAL code-length form (a
    # simple code carries 8-bit symbols only, and 258 needs the length
    # alphabet); canonical: 1 -> 0, 258 -> 1
    bw.w(0, 1)   # not simple
    bw.w(0, 4)   # num_code_lengths = 4: ClOrder 17,18,0,1
    for v in [2, 2, 2, 2]:
        bw.w(v, 3)   # {0:2, 1:2, 17:2, 18:2} -- complete 2-bit cl code

    def cl(sym):
        return {0: 0b00, 1: 0b01, 17: 0b10, 18: 0b11}[sym]
    bw.w(0, 1)        # no max-symbol cap
    bw.msb(cl(0), 2)  # symbol 0: length 0
    bw.msb(cl(1), 2)  # symbol 1: length 1
    emit_zero_runs(bw, cl, 256)   # symbols 2..257
    bw.msb(cl(1), 2)  # symbol 258: length 1
    emit_zero_runs(bw, cl, 280 - 259)  # tail zeros to the 280 alphabet
    simple1(bw, 7)    # red
    simple1(bw, 9)    # blue
    simple1(bw, 0xFF)  # alpha
    simple1(bw, 1)    # distance: prefix symbol 1 -> value 2 -> plane (1,0) -> dist 1
    # pixels: literal (green=1), then backref len 3 dist 1
    bw.w(code_for_2(1, 258, 1), 1)     # literal
    bw.w(code_for_2(1, 258, 258), 1)   # length symbol 258 = prefix code 2 -> len 3
    px0 = argb(0xFF, 7, 1, 9)
    return "webpLz77", bw.bytes(), w, h, [px0] * 4, \
        "literal then a length-3 distance-1 LZ77 reference (overlapping copy)"


# ---- case 2: color cache --------------------------------------------------
# 3x1, cache_bits=4. Two literals A, B then a cache hit for A.
def case_cache():
    w, h = 3, 1
    bits = 4
    A = argb(0xFF, 0, 5, 0)
    B = argb(0xFF, 0, 6, 0)
    sa, sb = cache_slot(A, bits), cache_slot(B, bits)
    assert sa != sb, (sa, sb)
    bw = BW()
    header(bw, w, h)
    bw.w(0, 1)           # no transforms
    bw.w(1, 1)           # color cache
    bw.w(bits, 4)
    bw.w(0, 1)           # no meta image
    # green alphabet includes cache symbols 280+slot
    g5, g6, gc = 5, 6, 280 + sa
    # three-symbol green code: lengths {5:1, 6:2, 280+sa:2}
    # canonical: 5 -> 0 (1 bit), 6 -> 10, cache -> 11
    # write via the normal code-length form
    bw.w(0, 1)           # not simple
    # code-length code: need lengths {1:?, 2:?} for symbols 1 and 2 plus 0s
    # symbols used: 1 (len code), 2 (len code), 17/18 for zero runs
    # ClOrder = 17,18,0,1,2,3,4,5,16,6,7,8,9,10,11,12,13,14,15
    # give: 17 -> 2, 18 -> 2, 1 -> 2, 2 -> 2  => complete 2-bit code over 4 syms
    # canonical order by (len, symbol): 1:00, 2:01, 17:10, 18:11
    bw.w(1, 4)           # num_code_lengths = 5 (17,18,0,1,2)
    for v in [2, 2, 0, 2, 2]:
        bw.w(v, 3)
    bw.w(0, 1)           # no max-symbol cap

    def cl(sym):
        return {1: 0b00, 2: 0b01, 17: 0b10, 18: 0b11}[sym]
    # lengths: idx 0..4 zeros (17, rep 3+2) -> then idx5: len1, idx6: len2
    bw.msb(cl(17), 2)
    bw.w(2, 3)           # 3+2 = 5 zeros (symbols 0..4)
    bw.msb(cl(1), 2)     # symbol 5: length 1
    bw.msb(cl(2), 2)     # symbol 6: length 2
    # zeros up to 280+sa: count = gc - 7
    emit_zero_runs(bw, cl, gc - 7)
    bw.msb(cl(2), 2)     # symbol 280+sa: length 2
    # remaining lengths: none read past the last nonzero only if loop ends
    # at alphabet size; alphabet = 256+24+16 = 296; we are at gc+1, need
    # zeros to 296
    emit_zero_runs(bw, cl, 296 - (gc + 1))
    simple1(bw, 0)       # red
    simple1(bw, 0)       # blue
    simple1(bw, 0xFF)    # alpha
    simple1(bw, 0)       # distance
    # pixels: literal 5 (code 0, 1 bit), literal 6 (10), cache hit (11)
    bw.msb(0b0, 1)
    bw.msb(0b10, 2)
    bw.msb(0b11, 2)
    return "webpCache", bw.bytes(), w, h, [A, B, A], \
        f"two literals then a color-cache hit (cache_bits=4, slot {sa})"


# ---- case 3: subtract-green transform -------------------------------------
def case_subgreen():
    w, h = 2, 1
    bw = BW()
    header(bw, w, h)
    bw.w(1, 1)  # transform present
    bw.w(2, 2)  # SUBTRACT_GREEN
    bw.w(0, 1)  # no more transforms
    bw.w(0, 1)  # no cache
    bw.w(0, 1)  # no meta
    # residual pixel: g=10, r=250, b=4 -> final r=(250+10)&255=4, b=14
    group_single(bw, 10, 250, 4, 0xFF)
    # two identical pixels, zero bits each
    exp = argb(0xFF, (250 + 10) & 0xFF, 10, (4 + 10) & 0xFF)
    return "webpSubGreen", bw.bytes(), w, h, [exp, exp], \
        "subtract-green inverse: r and b shift by green mod 256"


# ---- case 4: predictor transform ------------------------------------------
# 2x2, block bits=2 (one block), mode sub-image 1x1 green=2 (predict T).
# Residuals: all literals equal; top row predicts L, (0,0) predicts black.
def case_predictor():
    w, h = 2, 2
    bw = BW()
    header(bw, w, h)
    bw.w(1, 1)
    bw.w(0, 2)   # PREDICTOR
    bw.w(0, 3)   # size_bits = 2
    # sub-image 1x1 (not level0): no meta bit; cache bit then 5 codes
    bw.w(0, 1)   # no cache
    group_single(bw, 2, 0, 0, 0)  # mode = green = 2 (T)
    bw.w(0, 1)   # no more transforms
    bw.w(0, 1)   # no cache
    bw.w(0, 1)   # no meta
    # residuals: a=1, r=3, g=5, b=7 every pixel
    group_single(bw, 5, 3, 7, 1)
    # decode: (0,0): res + ARGB(ff,0,0,0) = (1+ff, 3, 5, 7)
    p00 = argb(0x00, 3, 5, 7)  # alpha 1+0xff = 0x00 mod 256
    p10 = argb((0x00 + 1) & 0xFF, 6, 10, 14)  # + L
    p01 = argb(1, 6, 10, 14)   # wait, recompute below properly
    # compute per spec: p01 = res + T(p00); channels add mod 256
    def addpx(x, y):
        out = 0
        for s in (0, 8, 16, 24):
            out |= ((((x >> s) & 0xFF) + ((y >> s) & 0xFF)) & 0xFF) << s
        return out
    res = argb(1, 3, 5, 7)
    p00 = addpx(res, 0xFF000000)
    p10 = addpx(res, p00)   # top row: L
    p01 = addpx(res, p00)   # mode T
    p11 = addpx(res, p10)   # mode T
    return "webpPredictor", bw.bytes(), w, h, [p00, p10, p01, p11], \
        "predictor transform, one block, mode 2 (T); top row L, origin black"


# ---- case 5: color transform ----------------------------------------------
# 2x1, block bits=2, cte sub-image 1x1: g2r=2 (blue ch), g2b=3 (green ch),
# r2b=4 (red ch).
def case_color():
    w, h = 2, 1
    bw = BW()
    header(bw, w, h)
    bw.w(1, 1)
    bw.w(1, 2)   # COLOR
    bw.w(0, 3)   # size_bits = 2
    bw.w(0, 1)   # sub-image: no cache
    # cte pixel: argb(0, r2b=4, g2b=3, g2r=2)
    group_single(bw, 3, 4, 2, 0)
    bw.w(0, 1)   # end transforms
    bw.w(0, 1)   # no cache
    bw.w(0, 1)   # no meta
    # stored pixel: g=64, r=100, b=50, a=255
    group_single(bw, 64, 100, 50, 0xFF)

    def d(t, c):
        # signed int8 product >> 5 (arithmetic)
        def s8(v):
            return v - 256 if v > 127 else v
        return (s8(t) * s8(c)) >> 5
    g = 64
    r = (100 + d(2, g)) & 0xFF
    b = (50 + d(3, g)) & 0xFF
    b = (b + d(4, r)) & 0xFF
    exp = argb(0xFF, r, g, b)
    return "webpColor", bw.bytes(), w, h, [exp, exp], \
        "color transform inverse: signed 3.5 fixed-point channel deltas"


# ---- case 6: color indexing with packing ----------------------------------
# 8x1, palette {A, B} -> xbits 3, packed width 1; indices 0,1,1,0,1,0,0,1
def case_index():
    w, h = 8, 1
    A = argb(0xFF, 1, 2, 3)
    B = argb(0xFF, 9, 8, 7)
    bw = BW()
    header(bw, w, h)
    bw.w(1, 1)
    bw.w(3, 2)    # COLOR_INDEXING
    bw.w(1, 8)    # palette size - 1 = 1
    # palette sub-image 2x1, delta-coded: first A, then B-A per channel
    bw.w(0, 1)    # no cache
    # two literals: greens {2, (8-2)&255=6}; reds {1, 8}; blues {3, 4}; alpha {255, 0}
    simple2(bw, 2, 6)
    simple2(bw, 1, 8)
    simple2(bw, 3, 4)     # blue delta: B.b - A.b = 7-3 = 4
    simple2(bw, 0xFF, 0)
    simple1(bw, 0)        # distance
    # pixel 1: A = (g2, r1, b3, a255); pixel 2 deltas: g6, r8, b4, a0
    bw.w(code_for_2(2, 6, 2), 1)
    bw.w(code_for_2(1, 8, 1), 1)
    bw.w(code_for_2(3, 4, 3), 1)
    bw.w(code_for_2(0xFF, 0, 0xFF), 1)
    bw.w(code_for_2(2, 6, 6), 1)
    bw.w(code_for_2(1, 8, 8), 1)
    bw.w(code_for_2(3, 4, 4), 1)
    bw.w(code_for_2(0xFF, 0, 0), 1)
    bw.w(0, 1)    # end transforms
    # MAIN image at packed width 1: 1x1 pixel, green byte = packed indices
    bw.w(0, 1)    # no cache
    bw.w(0, 1)    # no meta image
    idx = [0, 1, 1, 0, 1, 0, 0, 1]
    packed = 0
    for pos, v in enumerate(idx):
        packed |= v << pos  # 1 bit per index (xbits 3)
    group_single(bw, packed, 0, 0, 0)
    exp = [A if v == 0 else B for v in idx]
    return "webpIndexed", bw.bytes(), w, h, exp, \
        f"2-color palette, 8 pixels packed into one green byte 0x{packed:02x}"


# ---- case 7: meta prefix image --------------------------------------------
# 8x1, meta bits=2 -> blocks of 4 -> entropy image 2x1 with groups 0, 1.
# Group 0 emits green 11, group 1 emits green 22.
def case_meta():
    w, h = 8, 1
    bw = BW()
    header(bw, w, h)
    bw.w(0, 1)    # no transforms
    bw.w(0, 1)    # no cache
    bw.w(1, 1)    # meta prefix image present
    bw.w(0, 3)    # meta bits = 2
    # entropy image 2x1 (not level0): pixels' (r<<8|g) = group id
    bw.w(0, 1)    # no cache in sub-image
    simple2(bw, 0, 1)   # greens: 0 then 1
    simple1(bw, 0)      # red
    simple1(bw, 0)      # blue
    simple1(bw, 0)      # alpha
    simple1(bw, 0)      # distance
    bw.w(code_for_2(0, 1, 0), 1)
    bw.w(code_for_2(0, 1, 1), 1)
    # two groups
    group_single(bw, 11, 1, 1, 0xFF)
    group_single(bw, 22, 2, 2, 0xFF)
    ga = argb(0xFF, 1, 11, 1)
    gb = argb(0xFF, 2, 22, 2)
    return "webpMeta", bw.bytes(), w, h, [ga] * 4 + [gb] * 4, \
        "meta prefix image: two groups split the row at x=4"


def case_meta_many():
    """Past the spec's 8-bit-looking surface: the meta index is 16-bit
    ((argb >> 8) & 0xffff), so a stream may declare far more than 256
    entropy groups. 300 groups here — every tile maps to group 299, so
    the decoder must parse all 300 group code tables and index past the
    old 256 cap."""
    w, h = 8, 1
    bw = BW()
    header(bw, w, h)
    bw.w(0, 1)    # no transforms
    bw.w(0, 1)    # no cache
    bw.w(1, 1)    # meta prefix image present
    bw.w(0, 3)    # meta bits = 2 (2x1 tiles for 8x1)
    # entropy image: constant pixel with (r<<8)|g = 299 -> r=1, g=43
    bw.w(0, 1)    # no cache in sub-image
    simple1(bw, 43)   # green
    simple1(bw, 1)    # red
    simple1(bw, 0)    # blue
    simple1(bw, 0)    # alpha
    simple1(bw, 0)    # distance
    # 300 group tables; only #299 is ever used by a tile
    for g in range(299):
        group_single(bw, (g * 7) % 256, g % 256, (g * 3) % 256, 0xFF)
    group_single(bw, 99, 7, 7, 0xFF)
    px = argb(0xFF, 7, 99, 7)
    return "webpMetaMany", bw.bytes(), w, h, [px] * 8, \
        "meta prefix image declaring 300 entropy groups (16-bit meta index)"


if __name__ == "__main__":
    for case in (case_lz77, case_cache, case_subgreen, case_predictor,
                 case_color, case_index, case_meta, case_meta_many):
        show(*case())
