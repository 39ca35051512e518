#!/usr/bin/env python3
"""Prototype VP8 (lossy WebP) intra-keyframe decoder, written from
RFC 6386, validated bit-exactly against the system libwebp before the
Scala port. NOT shipped — a verification harness only, the same stance
as gen_vp8l_vectors.py.

Usage: python3 tools/vp8_proto.py   (self-test against libwebp)
"""
import ctypes
import struct
import sys

LIB = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
SO = open('/usr/lib/x86_64-linux-gnu/libwebp.so.7', 'rb').read()

# ---- published tables, extracted from the .so (extract_vp8_tables.py)
_bm = SO.find(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
KF_BMODE_PROBS = list(SO[_bm:_bm + 900])          # [above][left][9]
COEFF_UPDATE_PROBS = list(SO[_bm - 1056:_bm])     # [4][8][3][11]
_p0 = SO.find(bytes([253, 136, 254, 255, 228, 219, 128])) - 33
DEFAULT_COEFF_PROBS = list(SO[_p0:_p0 + 1056])    # [4][8][3][11]
_dc = SO.find(bytes([4, 5, 6, 7, 8, 9, 10, 10]))
DC_QLOOKUP = list(SO[_dc:_dc + 128])
_ac = SO.find(struct.pack('<8H', 4, 5, 6, 7, 8, 9, 10, 11))
AC_QLOOKUP = list(struct.unpack_from('<128H', SO, _ac))

KF_YMODE_PROBS = [145, 156, 163, 128]
KF_UV_PROBS = [142, 114, 183]
# mode enums: DC=0 V=1 H=2 TM=3 B_PRED=4
KF_YMODE_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]
UV_TREE = [-0, 2, -1, 4, -2, -3]
BMODE_TREE = [-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16,
              -8, -9]
COEFF_TREE = [-11, 2,        # 11 = EOB sentinel token id
              -0, 4,
              -1, 6,
              8, 12,
              -2, 10,
              -3, -4,
              14, 16,
              -5, -6,        # cat1, cat2
              18, 20,
              -7, -8,        # cat3, cat4
              -9, -10]       # cat5, cat6
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASE = [5, 7, 11, 19, 35, 67]
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
# libwebp renumbers its B-mode enum to tree-appearance order (RD=4,
# VR=5, LD=6); the extracted kBModesProba rows use that order, RFC
# enums need this permutation when indexing
LIBWEBP_BORDER = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]


class Bool:
    """RFC 6386 section 7 boolean decoder."""

    def __init__(self, buf, start, size):
        self.buf = buf
        self.pos = start
        self.end = start + size
        self.range = 255
        self.value = (self._byte() << 8) | self._byte()
        self.bit_count = 0

    def _byte(self):
        if self.pos < self.end:
            b = self.buf[self.pos]
            self.pos += 1
            return b
        self.pos += 1
        return 0

    def bool(self, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        SPLIT = split << 8
        if self.value >= SPLIT:
            ret = 1
            self.range -= split
            self.value -= SPLIT
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        return ret

    def lit(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def sig(self, n):
        v = self.lit(n)
        return -v if self.bool(128) else v

    def tree(self, tree, probs, start=0):
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


def clamp255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def avg2(a, b):
    return (a + b + 1) >> 1


def avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def idct4x4(coeffs, out, oo, ostride):
    """RFC 6386 14.3 inverse DCT, adding into out[oo...] (pred already
    there), clamping to 0..255."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[i + 8]
        b1 = coeffs[i] - coeffs[i + 8]
        t1 = (coeffs[i + 4] * 35468) >> 16
        t2 = coeffs[i + 12] + ((coeffs[i + 12] * 20091) >> 16)
        c1 = t1 - t2
        t1 = coeffs[i + 4] + ((coeffs[i + 4] * 20091) >> 16)
        t2 = (coeffs[i + 12] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * 35468) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * 20091) >> 16)
        t2 = (tmp[base + 3] * 35468) >> 16
        d1 = t1 + t2
        o = oo + i * ostride
        out[o + 0] = clamp255(out[o + 0] + ((a1 + d1 + 4) >> 3))
        out[o + 3] = clamp255(out[o + 3] + ((a1 - d1 + 4) >> 3))
        out[o + 1] = clamp255(out[o + 1] + ((b1 + c1 + 4) >> 3))
        out[o + 2] = clamp255(out[o + 2] + ((b1 - c1 + 4) >> 3))


def iwht4x4(ip):
    """RFC 6386 14.3 inverse WHT -> 16 DC values in raster order."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base + 0] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


class Frame:
    pass


def parse_header(d):
    f = Frame()
    tag = d[0] | (d[1] << 8) | (d[2] << 16)
    f.keyframe = not (tag & 1)
    f.version = (tag >> 1) & 7
    f.show = (tag >> 4) & 1
    f.part0_size = tag >> 5
    assert f.keyframe, 'inter frame'
    assert d[3] == 0x9D and d[4] == 0x01 and d[5] == 0x2A, 'start code'
    w = d[6] | (d[7] << 8)
    h = d[8] | (d[9] << 8)
    f.width = w & 0x3FFF
    f.height = h & 0x3FFF
    f.mb_w = (f.width + 15) >> 4
    f.mb_h = (f.height + 15) >> 4
    bd = Bool(d, 10, f.part0_size)
    f.color_space = bd.bool(128)
    f.clamping = bd.bool(128)
    # segmentation
    f.seg_enabled = bd.bool(128)
    f.seg_update_map = 0
    f.seg_abs = 0
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    f.seg_tree_probs = [255, 255, 255]
    if f.seg_enabled:
        f.seg_update_map = bd.bool(128)
        update_data = bd.bool(128)
        if update_data:
            f.seg_abs = bd.bool(128)
            for i in range(4):
                if bd.bool(128):
                    f.seg_quant[i] = bd.sig(7)
            for i in range(4):
                if bd.bool(128):
                    f.seg_lf[i] = bd.sig(6)
        if f.seg_update_map:
            for i in range(3):
                if bd.bool(128):
                    f.seg_tree_probs[i] = bd.lit(8)
    # loop filter
    f.filter_type = bd.bool(128)  # 1 = simple
    f.filter_level = bd.lit(6)
    f.sharpness = bd.lit(3)
    f.lf_adj = bd.bool(128)
    f.ref_lf_deltas = [0, 0, 0, 0]
    f.mode_lf_deltas = [0, 0, 0, 0]
    if f.lf_adj:
        if bd.bool(128):
            for i in range(4):
                if bd.bool(128):
                    f.ref_lf_deltas[i] = bd.sig(6)
            for i in range(4):
                if bd.bool(128):
                    f.mode_lf_deltas[i] = bd.sig(6)
    # token partitions
    f.nparts = 1 << bd.lit(2)
    # quant
    f.y_ac_qi = bd.lit(7)
    f.y_dc_delta = bd.sig(4) if bd.bool(128) else 0
    f.y2_dc_delta = bd.sig(4) if bd.bool(128) else 0
    f.y2_ac_delta = bd.sig(4) if bd.bool(128) else 0
    f.uv_dc_delta = bd.sig(4) if bd.bool(128) else 0
    f.uv_ac_delta = bd.sig(4) if bd.bool(128) else 0
    f.refresh_entropy = bd.bool(128)
    # coefficient probability updates
    probs = list(DEFAULT_COEFF_PROBS)
    for i in range(1056):
        if bd.bool(COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.lit(8)
    f.coeff_probs = probs
    f.mb_no_skip = bd.bool(128)
    f.skip_prob = bd.lit(8) if f.mb_no_skip else 0
    f.bd = bd
    return f


def quant_for(f, seg):
    q = f.y_ac_qi
    if f.seg_enabled:
        q = f.seg_quant[seg] if f.seg_abs else q + f.seg_quant[seg]
    q = max(0, min(127, q))

    def cl(x):
        return max(0, min(127, x))
    y1dc = DC_QLOOKUP[cl(q + f.y_dc_delta)]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[cl(q + f.y2_dc_delta)] * 2
    y2ac = AC_QLOOKUP[cl(q + f.y2_ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    return y1dc, y1ac, y2dc, y2ac


def decode_coeffs(bd, probs, first, ctx, qdc, qac):
    """Decode one 4x4 block's tokens. Returns (coeffs[16] dequantized,
    has_nonzero)."""
    out = [0] * 16
    nz = False
    c = first
    prev_zero = False
    while c < 16:
        band = COEFF_BANDS[c]
        p = (0 * 8 + band) * 3  # filled by caller offset; see below
        base = (band * 3 + ctx) * 11
        pr = probs[base:base + 11]
        if prev_zero:
            tok = bd.tree(COEFF_TREE, pr, start=2)
        else:
            tok = bd.tree(COEFF_TREE, pr)
        if tok == 11:  # EOB
            break
        if tok == 0:
            prev_zero = True
            ctx = 0
            c += 1
            continue
        prev_zero = False
        if tok <= 4:
            val = tok
        else:
            cat = tok - 5
            extra = 0
            for pp in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.bool(pp)
            val = CAT_BASE[cat] + extra
        if bd.bool(128):
            val = -val
        out[ZIGZAG[c]] = val * (qdc if c == 0 else qac)
        nz = True
        ctx = 1 if (val == 1 or val == -1) else 2
        c += 1
    return out, nz


def pred16(plane, stride, ox, oy, mode, mbx, mby):
    """16x16 intra prediction into plane at (ox, oy)."""
    up = oy > 0
    left = ox > 0

    def A(c):
        return plane[(oy - 1) * stride + ox + c] if up else 127

    def L(r):
        return plane[(oy + r) * stride + ox - 1] if left else 129
    if up:
        P = plane[(oy - 1) * stride + ox - 1] if left else 129
    else:
        P = 127
    if mode == 0:  # DC
        if up and left:
            s = sum(A(c) for c in range(16)) + sum(L(r) for r in range(16))
            dc = (s + 16) >> 5
        elif up:
            dc = (sum(A(c) for c in range(16)) + 8) >> 4
        elif left:
            dc = (sum(L(r) for r in range(16)) + 8) >> 4
        else:
            dc = 128
        for r in range(16):
            for c in range(16):
                plane[(oy + r) * stride + ox + c] = dc
    elif mode == 1:  # V
        row = [A(c) for c in range(16)]
        for r in range(16):
            for c in range(16):
                plane[(oy + r) * stride + ox + c] = row[c]
    elif mode == 2:  # H
        for r in range(16):
            v = L(r)
            for c in range(16):
                plane[(oy + r) * stride + ox + c] = v
    else:  # TM
        for r in range(16):
            lr = L(r)
            for c in range(16):
                plane[(oy + r) * stride + ox + c] = clamp255(lr + A(c) - P)


def pred4(plane, stride, ox, oy, mode, ar_override=None):
    """4x4 B_PRED subblock prediction at pixel (ox, oy).
    ar_override: the 4 above-right pixels when the natural in-plane read
    is not the spec source (col-3 subblocks); None = read in-plane.
    """
    up = oy > 0
    left = ox > 0

    def A(c):
        return plane[(oy - 1) * stride + ox + c] if up else 127
    if up:
        P = plane[(oy - 1) * stride + ox - 1] if left else 129
    else:
        P = 127

    def L(r):
        return plane[(oy + r) * stride + ox - 1] if left else 129
    if ar_override is not None:
        AR = ar_override
    elif up:
        AR = [plane[(oy - 1) * stride + ox + 4 + i] for i in range(4)]
    else:
        AR = [127] * 4
    a = [A(0), A(1), A(2), A(3)] + AR
    l = [L(0), L(1), L(2), L(3)]
    X = [[0] * 4 for _ in range(4)]
    if mode == 0:  # B_DC
        dc = (sum(a[:4]) + sum(l) + 4) >> 3
        for r in range(4):
            for c in range(4):
                X[r][c] = dc
    elif mode == 1:  # B_TM
        for r in range(4):
            for c in range(4):
                X[r][c] = clamp255(l[r] + a[c] - P)
    elif mode == 2:  # B_VE
        ap = [avg3(P if c == 0 else a[c - 1], a[c], a[c + 1])
              for c in range(4)]
        for r in range(4):
            for c in range(4):
                X[r][c] = ap[c]
    elif mode == 3:  # B_HE
        lp = [avg3(P if r == 0 else l[r - 1], l[r],
                   l[3] if r == 3 else l[r + 1]) for r in range(4)]
        for r in range(4):
            for c in range(4):
                X[r][c] = lp[r]
    elif mode == 4:  # B_LD
        for r in range(4):
            for c in range(4):
                d = r + c
                X[r][c] = (avg3(a[d], a[d + 1], a[d + 2]) if d < 6
                           else avg3(a[6], a[7], a[7]))
    elif mode == 5:  # B_RD
        E = [l[3], l[2], l[1], l[0], P, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                X[r][c] = avg3(E[3 + c - r], E[4 + c - r], E[5 + c - r])
    elif mode == 6:  # B_VR
        E = [l[3], l[2], l[1], l[0], P, a[0], a[1], a[2], a[3]]
        X[3][0] = avg3(E[1], E[2], E[3])
        X[2][0] = avg3(E[2], E[3], E[4])
        X[3][1] = X[1][0] = avg3(E[3], E[4], E[5])
        X[2][1] = X[0][0] = avg2(E[4], E[5])
        X[3][2] = X[1][1] = avg3(E[4], E[5], E[6])
        X[2][2] = X[0][1] = avg2(E[5], E[6])
        X[3][3] = X[1][2] = avg3(E[5], E[6], E[7])
        X[2][3] = X[0][2] = avg2(E[6], E[7])
        X[1][3] = avg3(E[6], E[7], E[8])
        X[0][3] = avg2(E[7], E[8])
    elif mode == 7:  # B_VL
        X[0][0] = avg2(a[0], a[1])
        X[1][0] = avg3(a[0], a[1], a[2])
        X[2][0] = X[0][1] = avg2(a[1], a[2])
        X[1][1] = X[3][0] = avg3(a[1], a[2], a[3])
        X[2][1] = X[0][2] = avg2(a[2], a[3])
        X[3][1] = X[1][2] = avg3(a[2], a[3], a[4])
        X[2][2] = X[0][3] = avg2(a[3], a[4])
        X[3][2] = X[1][3] = avg3(a[3], a[4], a[5])
        X[2][3] = avg3(a[4], a[5], a[6])
        X[3][3] = avg3(a[5], a[6], a[7])
    elif mode == 8:  # B_HD
        E = [l[3], l[2], l[1], l[0], P, a[0], a[1], a[2], a[3]]
        X[3][0] = avg2(E[0], E[1])
        X[3][1] = avg3(E[0], E[1], E[2])
        X[2][0] = X[3][2] = avg2(E[1], E[2])
        X[2][1] = X[3][3] = avg3(E[1], E[2], E[3])
        X[2][2] = X[1][0] = avg2(E[2], E[3])
        X[2][3] = X[1][1] = avg3(E[2], E[3], E[4])
        X[1][2] = X[0][0] = avg2(E[3], E[4])
        X[1][3] = X[0][1] = avg3(E[3], E[4], E[5])
        X[0][2] = avg3(E[4], E[5], E[6])
        X[0][3] = avg3(E[5], E[6], E[7])
    else:  # B_HU
        X[0][0] = avg2(l[0], l[1])
        X[0][1] = avg3(l[0], l[1], l[2])
        X[0][2] = X[1][0] = avg2(l[1], l[2])
        X[0][3] = X[1][1] = avg3(l[1], l[2], l[3])
        X[1][2] = X[2][0] = avg2(l[2], l[3])
        X[1][3] = X[2][1] = avg3(l[2], l[3], l[3])
        X[2][2] = X[2][3] = l[3]
        X[3][0] = X[3][1] = X[3][2] = X[3][3] = l[3]
    for r in range(4):
        for c in range(4):
            plane[(oy + r) * stride + ox + c] = X[r][c]


def decode_y(d):
    """Full VP8 keyframe decode -> (width, height, Y plane bytes,
    frame for debugging)."""
    f = parse_header(d)
    bd = f.bd
    # token partitions
    p0_end = 10 + f.part0_size
    sizes = []
    off = p0_end + 3 * (f.nparts - 1)
    for i in range(f.nparts - 1):
        o = p0_end + 3 * i
        sizes.append(d[o] | (d[o + 1] << 8) | (d[o + 2] << 16))
    sizes.append(len(d) - off - sum(sizes))
    parts = []
    for s in sizes:
        parts.append(Bool(d, off, s))
        off += s
    # per-MB mode parse (all in partition 0)
    mbw, mbh = f.mb_w, f.mb_h
    seg_ids = [0] * (mbw * mbh)
    skips = [0] * (mbw * mbh)
    ymodes = [0] * (mbw * mbh)
    bmodes = [None] * (mbw * mbh)
    # subblock-mode rows for kf_bmode context
    above_bm = [0] * (4 * mbw)
    for mby in range(mbh):
        left_bm = [0, 0, 0, 0]
        for mbx in range(mbw):
            i = mby * mbw + mbx
            if f.seg_update_map:
                p = f.seg_tree_probs
                if bd.bool(p[0]):
                    seg_ids[i] = 2 + bd.bool(p[2])
                else:
                    seg_ids[i] = bd.bool(p[1])
            if f.mb_no_skip:
                skips[i] = bd.bool(f.skip_prob)
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == 4:  # B_PRED
                bm = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above = above_bm[4 * mbx + c] if r == 0 else bm[sb - 4]
                    lft = left_bm[r] if c == 0 else bm[sb - 1]
                    pa, pl = LIBWEBP_BORDER[above], LIBWEBP_BORDER[lft]
                    probs = KF_BMODE_PROBS[(pa * 10 + pl) * 9:
                                           (pa * 10 + pl) * 9 + 9]
                    bm[sb] = bd.tree(BMODE_TREE, probs)
                bmodes[i] = bm
                for c in range(4):
                    above_bm[4 * mbx + c] = bm[12 + c]
                for r in range(4):
                    left_bm[r] = bm[4 * r + 3]
            else:
                # implied submodes for context: DC->B_DC, V->B_VE,
                # H->B_HE, TM->B_TM
                imp = [0, 2, 3, 1][ym]
                for c in range(4):
                    above_bm[4 * mbx + c] = imp
                for r in range(4):
                    left_bm[r] = imp
            bd.tree(UV_TREE, KF_UV_PROBS)  # uv mode: parsed, unused
    # residuals + reconstruction
    W = mbw * 16
    H = mbh * 16
    plane = bytearray([0]) * 0
    plane = bytearray(W * H)
    # nonzero context: per MB column, Y 4 + U 2 + V 2 + Y2 1
    above_nz = [[0] * 9 for _ in range(mbw)]
    mb_has_coeffs = [0] * (mbw * mbh)
    all_coeffs = [None] * (mbw * mbh)
    for mby in range(mbh):
        left_nz = [0] * 9
        td = parts[mby % f.nparts]
        for mbx in range(mbw):
            i = mby * mbw + mbx
            seg = seg_ids[i]
            y1dc, y1ac, y2dc, y2ac = quant_for(f, seg)
            ym = ymodes[i]
            has_y2 = ym != 4
            anz = above_nz[mbx]
            if skips[i]:
                # all-zero: clear contexts; Y2 ctx cleared only when
                # this MB HAS a Y2 block
                for k in range(8):
                    anz[k] = 0
                    left_nz[k] = 0
                if has_y2:
                    anz[8] = 0
                    left_nz[8] = 0
                mb_has_coeffs[i] = 0
                all_coeffs[i] = None
                continue
            coeffs = [[0] * 16 for _ in range(25)]  # 16 Y, 4 U, 4 V, Y2
            mbnz = False
            dc16 = None
            if has_y2:
                ctx = left_nz[8] + anz[8]
                cs, nz = decode_coeffs(
                    td, f.coeff_probs[1 * 264:2 * 264], 0, ctx, y2dc, y2ac)
                left_nz[8] = anz[8] = 1 if nz else 0
                mbnz = mbnz or nz
                dc16 = iwht4x4(cs)
            plane_id = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            nzgrid = [0] * 16
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                lnz = left_nz[r] if c == 0 else nzgrid[sb - 1]
                unz = anz[c] if r == 0 else nzgrid[sb - 4]
                cs, nz = decode_coeffs(
                    td, f.coeff_probs[plane_id * 264:(plane_id + 1) * 264],
                    first, lnz + unz, y1dc, y1ac)
                if dc16 is not None:
                    cs[0] = dc16[sb]
                    # Y2's DC counts toward "has coefficients" via mbnz
                coeffs[sb] = cs
                nzgrid[sb] = 1 if nz else 0
                mbnz = mbnz or nz
            for r in range(4):
                left_nz[r] = nzgrid[4 * r + 3]
            for c in range(4):
                anz[c] = nzgrid[12 + c]
            # chroma tokens (plane 2) -- parsed for sync, not rendered
            uvq = quant_for_uv(f, seg)
            for pl in range(2):
                grid = [0] * 4
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    base = 4 + 2 * pl
                    lnz = left_nz[base + r] if c == 0 else grid[sb - 1]
                    unz = anz[base + c] if r == 0 else grid[sb - 2]
                    cs, nz = decode_coeffs(
                        td, f.coeff_probs[2 * 264:3 * 264], 0,
                        lnz + unz, uvq[0], uvq[1])
                    coeffs[16 + 4 * pl + sb] = cs
                    grid[sb] = 1 if nz else 0
                    mbnz = mbnz or nz
                left_nz[4 + 2 * pl] = grid[1]
                left_nz[4 + 2 * pl + 1] = grid[3]
                anz[4 + 2 * pl] = grid[2]
                anz[4 + 2 * pl + 1] = grid[3]
            mb_has_coeffs[i] = 1 if mbnz else 0
            all_coeffs[i] = coeffs
    # reconstruction pass (prediction needs final modes but runs in the
    # same raster order the bitstream implies)
    for mby in range(mbh):
        for mbx in range(mbw):
            i = mby * mbw + mbx
            ox, oy = mbx * 16, mby * 16
            ym = ymodes[i]
            coeffs = all_coeffs[i]
            if ym != 4:
                pred16(plane, W, ox, oy, ym, mbx, mby)
                if coeffs is not None:
                    for sb in range(16):
                        r, c = sb >> 2, sb & 3
                        idct4x4(coeffs[sb], plane,
                                (oy + 4 * r) * W + ox + 4 * c, W)
            else:
                bm = bmodes[i]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    sx, sy = ox + 4 * c, oy + 4 * r
                    # above-right: col<3 subblocks read it in-plane
                    # (the subblock above-right, already decoded). Col-3
                    # subblocks use the MB "top-right": the above MB
                    # row's cols 16..19 — replicated down every subblock
                    # row — and for the RIGHTMOST MB column, 4 copies of
                    # the above row's col 15 (127s when mby == 0)
                    if c < 3:
                        pred4(plane, W, sx, sy, bm[sb])
                    else:
                        if oy == 0:
                            ar = [127] * 4
                        elif mbx == mbw - 1:
                            ar = [plane[(oy - 1) * W + sx + 3]] * 4
                        else:
                            ar = [plane[(oy - 1) * W + sx + 4 + i]
                                  for i in range(4)]
                        pred4(plane, W, sx, sy, bm[sb], ar)
                    if coeffs is not None:
                        idct4x4(coeffs[sb], plane, sy * W + sx, W)
    f.bmodes = bmodes
    f.all_coeffs = all_coeffs
    return f, W, H, plane, mb_has_coeffs, seg_ids, ymodes


def quant_for_uv(f, seg):
    q = f.y_ac_qi
    if f.seg_enabled:
        q = f.seg_quant[seg] if f.seg_abs else q + f.seg_quant[seg]
    q = max(0, min(127, q))

    def cl(x):
        return max(0, min(127, x))
    uvdc = DC_QLOOKUP[cl(q + f.uv_dc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[cl(q + f.uv_ac_delta)]
    return uvdc, uvac


# ---------------- loop filter (RFC 6386 section 15) ----------------

def s8(v):
    # RFC 6386 15.1: pixels convert to signed by subtracting 128
    return v - 128


def c8(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def u8(v):
    v += 128
    return 0 if v < 0 else (255 if v > 255 else v)


def common_adjust(use_outer, px, i, st):
    """px: plane bytearray; i: index of q0; st: stride toward q1."""
    p1 = s8(px[i - 2 * st])
    p0 = s8(px[i - st])
    q0 = s8(px[i])
    q1 = s8(px[i + st])
    a = c8((c8(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    F = c8(a + 4) >> 3
    E = c8(a + 3) >> 3
    px[i] = u8(c8(q0 - F))
    px[i - st] = u8(c8(p0 + E))
    return F


def filter_mask(I, E, px, i, st):
    p3, p2, p1, p0 = px[i - 4 * st], px[i - 3 * st], px[i - 2 * st], px[i - st]
    q0, q1, q2, q3 = px[i], px[i + st], px[i + 2 * st], px[i + 3 * st]
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E and
            abs(p3 - p2) <= I and abs(p2 - p1) <= I and
            abs(p1 - p0) <= I and abs(q1 - q0) <= I and
            abs(q2 - q1) <= I and abs(q3 - q2) <= I)


def hev(T, px, i, st):
    return abs(px[i - 2 * st] - px[i - st]) > T or \
        abs(px[i + st] - px[i]) > T


def subblock_filter(T, I, E, px, i, st):
    if filter_mask(I, E, px, i, st):
        hv = hev(T, px, i, st)
        a = common_adjust(hv, px, i, st)
        if not hv:
            a = (a + 1) >> 1
            px[i + st] = u8(c8(s8(px[i + st]) - a))
            px[i - 2 * st] = u8(c8(s8(px[i - 2 * st]) + a))


def mbedge_filter(T, I, E, px, i, st):
    if filter_mask(I, E, px, i, st):
        if not hev(T, px, i, st):
            p2, p1, p0 = s8(px[i - 3 * st]), s8(px[i - 2 * st]), s8(px[i - st])
            q0, q1, q2 = s8(px[i]), s8(px[i + st]), s8(px[i + 2 * st])
            w = c8(c8(p1 - q1) + 3 * (q0 - p0))
            a = c8((27 * w + 63) >> 7)
            q0 = c8(q0 - a)
            p0 = c8(p0 + a)
            a = c8((18 * w + 63) >> 7)
            q1 = c8(q1 - a)
            p1 = c8(p1 + a)
            a = c8((9 * w + 63) >> 7)
            q2 = c8(q2 - a)
            p2 = c8(p2 + a)
            px[i - 3 * st] = u8(p2)
            px[i - 2 * st] = u8(p1)
            px[i - st] = u8(p0)
            px[i] = u8(q0)
            px[i + st] = u8(q1)
            px[i + 2 * st] = u8(q2)
        else:
            common_adjust(True, px, i, st)


def simple_filter(E, px, i, st):
    p1, p0, q0, q1 = px[i - 2 * st], px[i - st], px[i], px[i + st]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E:
        common_adjust(True, px, i, st)


def loop_filter(f, W, H, plane, mb_has_coeffs, seg_ids, ymodes):
    if f.filter_level == 0:
        return
    mbw, mbh = f.mb_w, f.mb_h
    for mby in range(mbh):
        for mbx in range(mbw):
            i = mby * mbw + mbx
            level = f.filter_level
            if f.seg_enabled:
                level = (f.seg_lf[seg_ids[i]] if f.seg_abs
                         else level + f.seg_lf[seg_ids[i]])
            if f.lf_adj:
                level += f.ref_lf_deltas[0]  # INTRA_FRAME
                if ymodes[i] == 4:
                    level += f.mode_lf_deltas[0]  # B_PRED
            level = max(0, min(63, level))
            if level == 0:
                continue
            interior = level
            if f.sharpness:
                interior >>= 2 if f.sharpness > 4 else 1
                if interior > 9 - f.sharpness:
                    interior = 9 - f.sharpness
            if interior < 1:
                interior = 1
            hev_t = 0
            if level >= 40:
                hev_t = 2
            elif level >= 15:
                hev_t = 1
            mb_e = (level + 2) * 2 + interior
            sb_e = level * 2 + interior
            inner = mb_has_coeffs[i] or ymodes[i] == 4
            ox, oy = mbx * 16, mby * 16
            if f.filter_type == 0:  # normal
                if mbx > 0:
                    for r in range(16):
                        mbedge_filter(hev_t, interior, mb_e, plane,
                                      (oy + r) * W + ox, 1)
                if inner:
                    for cx in (4, 8, 12):
                        for r in range(16):
                            subblock_filter(hev_t, interior, sb_e, plane,
                                            (oy + r) * W + ox + cx, 1)
                if mby > 0:
                    for c in range(16):
                        mbedge_filter(hev_t, interior, mb_e, plane,
                                      oy * W + ox + c, W)
                if inner:
                    for ry in (4, 8, 12):
                        for c in range(16):
                            subblock_filter(hev_t, interior, sb_e, plane,
                                            (oy + ry) * W + ox + c, W)
            else:  # simple: luma only
                if mbx > 0:
                    for r in range(16):
                        simple_filter(mb_e, plane, (oy + r) * W + ox, 1)
                if inner:
                    for cx in (4, 8, 12):
                        for r in range(16):
                            simple_filter(sb_e, plane,
                                          (oy + r) * W + ox + cx, 1)
                if mby > 0:
                    for c in range(16):
                        simple_filter(mb_e, plane, oy * W + ox + c, W)
                if inner:
                    for ry in (4, 8, 12):
                        for c in range(16):
                            simple_filter(sb_e, plane,
                                          (oy + ry) * W + ox + c, W)


def extract_vp8_chunk(webp):
    assert webp[:4] == b'RIFF' and webp[8:12] == b'WEBP'
    p = 12
    while p + 8 <= len(webp):
        tag = webp[p:p + 4]
        size = struct.unpack_from('<I', webp, p + 4)[0]
        if tag == b'VP8 ':
            return webp[p + 8:p + 8 + size]
        p += 8 + size + (size & 1)
    raise ValueError('no VP8 chunk')


# ---------------- libwebp golden helpers ----------------

def libwebp_encode_rgb(rgb, w, h, quality):
    LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    LIB.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float,
                                  ctypes.POINTER(ctypes.c_void_p)]
    out = ctypes.c_void_p()
    n = LIB.WebPEncodeRGB(bytes(rgb), w, h, w * 3,
                          ctypes.c_float(quality), ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out.value, n)
    LIB.WebPFree(out)
    return buf


def libwebp_decode_y(webp):
    LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(webp, len(webp), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y
    W, H, S = w.value, h.value, stride.value
    plane = bytes(bytearray(ctypes.string_at(y, S * H)))
    rows = [plane[r * S:r * S + W] for r in range(H)]
    LIB.WebPFree(y)
    return W, H, b''.join(rows)


class _Features(ctypes.Structure):
    _fields_ = [('width', ctypes.c_int), ('height', ctypes.c_int),
                ('has_alpha', ctypes.c_int), ('has_animation', ctypes.c_int),
                ('format', ctypes.c_int), ('pad', ctypes.c_uint * 5)]


class _Options(ctypes.Structure):
    _fields_ = [('bypass_filtering', ctypes.c_int),
                ('no_fancy_upsampling', ctypes.c_int),
                ('use_cropping', ctypes.c_int),
                ('crop_left', ctypes.c_int), ('crop_top', ctypes.c_int),
                ('crop_width', ctypes.c_int), ('crop_height', ctypes.c_int),
                ('use_scaling', ctypes.c_int),
                ('scaled_width', ctypes.c_int), ('scaled_height', ctypes.c_int),
                ('use_threads', ctypes.c_int),
                ('dithering_strength', ctypes.c_int),
                ('flip', ctypes.c_int),
                ('alpha_dithering_strength', ctypes.c_int),
                ('pad', ctypes.c_uint * 5)]


class _YUVA(ctypes.Structure):
    _fields_ = [('y', ctypes.POINTER(ctypes.c_ubyte)),
                ('u', ctypes.POINTER(ctypes.c_ubyte)),
                ('v', ctypes.POINTER(ctypes.c_ubyte)),
                ('a', ctypes.POINTER(ctypes.c_ubyte)),
                ('y_stride', ctypes.c_int), ('u_stride', ctypes.c_int),
                ('v_stride', ctypes.c_int), ('a_stride', ctypes.c_int),
                ('y_size', ctypes.c_size_t), ('u_size', ctypes.c_size_t),
                ('v_size', ctypes.c_size_t), ('a_size', ctypes.c_size_t)]


class _RGBA(ctypes.Structure):
    _fields_ = [('rgba', ctypes.POINTER(ctypes.c_ubyte)),
                ('stride', ctypes.c_int), ('size', ctypes.c_size_t)]


class _BufUnion(ctypes.Union):
    _fields_ = [('RGBA', _RGBA), ('YUVA', _YUVA)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [('colorspace', ctypes.c_int),
                ('width', ctypes.c_int), ('height', ctypes.c_int),
                ('is_external_memory', ctypes.c_int),
                ('u', _BufUnion), ('pad', ctypes.c_uint * 4),
                ('private_memory', ctypes.c_void_p)]


class _DecConfig(ctypes.Structure):
    # decode.h order: input features, then output buffer, then options
    _fields_ = [('input', _Features), ('output', _DecBuffer),
                ('options', _Options)]


def libwebp_decode_y_nofilter(webp):
    """Y plane with the in-loop filter bypassed (debug isolation)."""
    cfg = _DecConfig()
    assert LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), 0x0209)
    cfg.options.bypass_filtering = 1
    cfg.output.colorspace = 11  # MODE_YUV
    r = LIB.WebPDecode(bytes(webp), len(webp), ctypes.byref(cfg))
    assert r == 0, f'VP8StatusCode {r}'
    W, H = cfg.output.width, cfg.output.height
    S = cfg.output.u.YUVA.y_stride
    plane = ctypes.string_at(cfg.output.u.YUVA.y, S * H)
    rows = [plane[r * S:r * S + W] for r in range(H)]
    LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return W, H, b''.join(rows)


class _EncConfig(ctypes.Structure):
    _fields_ = [('lossless', ctypes.c_int), ('quality', ctypes.c_float),
                ('method', ctypes.c_int), ('image_hint', ctypes.c_int),
                ('target_size', ctypes.c_int), ('target_PSNR', ctypes.c_float)
                ] + [(n, ctypes.c_int) for n in (
                    'segments', 'sns_strength', 'filter_strength',
                    'filter_sharpness', 'filter_type', 'autofilter',
                    'alpha_compression', 'alpha_filtering', 'alpha_quality',
                    'pass_', 'show_compressed', 'preprocessing', 'partitions',
                    'partition_limit', 'emulate_jpeg_size', 'thread_level',
                    'low_memory', 'near_lossless', 'exact',
                    'use_delta_palette', 'use_sharp_yuv', 'qmin', 'qmax')]


class _MemWriter(ctypes.Structure):
    _fields_ = [('mem', ctypes.c_void_p), ('size', ctypes.c_size_t),
                ('max_size', ctypes.c_size_t), ('pad', ctypes.c_uint * 1)]


class _Picture(ctypes.Structure):
    _fields_ = [('use_argb', ctypes.c_int), ('colorspace', ctypes.c_int),
                ('width', ctypes.c_int), ('height', ctypes.c_int),
                ('y', ctypes.c_void_p), ('u', ctypes.c_void_p),
                ('v', ctypes.c_void_p),
                ('y_stride', ctypes.c_int), ('uv_stride', ctypes.c_int),
                ('a', ctypes.c_void_p), ('a_stride', ctypes.c_int),
                ('pad1', ctypes.c_uint * 2),
                ('argb', ctypes.c_void_p), ('argb_stride', ctypes.c_int),
                ('pad2', ctypes.c_uint * 3),
                ('writer', ctypes.c_void_p), ('custom_ptr', ctypes.c_void_p),
                ('extra_info_type', ctypes.c_int),
                ('extra_info', ctypes.c_void_p),
                ('stats', ctypes.c_void_p), ('error_code', ctypes.c_int),
                ('progress_hook', ctypes.c_void_p),
                ('user_data', ctypes.c_void_p),
                ('pad3', ctypes.c_uint * 3),
                ('pad4', ctypes.c_void_p), ('pad5', ctypes.c_void_p),
                ('pad6', ctypes.c_uint * 8),
                ('memory_', ctypes.c_void_p),
                ('memory_argb_', ctypes.c_void_p),
                ('pad7', ctypes.c_void_p * 2)]


def libwebp_encode_cfg(rgb, w, h, **kw):
    """Advanced-API encode: kw override WebPConfig fields (partitions,
    filter_type, filter_sharpness, quality, ...)."""
    cfg = _EncConfig()
    assert LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), 0x020f)
    for k, v in kw.items():
        setattr(cfg, k, ctypes.c_float(v) if k == 'quality' else v)
    assert LIB.WebPValidateConfig(ctypes.byref(cfg)), kw
    pic = _Picture()
    assert LIB.WebPPictureInitInternal(ctypes.byref(pic), 0x020f)
    pic.width = w
    pic.height = h
    buf = ctypes.create_string_buffer(bytes(rgb), len(rgb))
    assert LIB.WebPPictureImportRGB(ctypes.byref(pic), buf, w * 3)
    wr = _MemWriter()
    LIB.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(LIB.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok, f'encode failed, error_code={pic.error_code} {kw}'
    out = ctypes.string_at(wr.mem, wr.size)
    LIB.WebPMemoryWriterClear(ctypes.byref(wr))
    LIB.WebPPictureFree(ctypes.byref(pic))
    return out


def gen_test_image(w, h, seed):
    rgb = bytearray(w * h * 3)
    s = seed
    for i in range(w * h):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        x, y = i % w, i // w
        r = (x * 7 + (s & 31)) & 0xFF
        g = (y * 5 + ((s >> 5) & 31)) & 0xFF
        b = ((x + y) * 3 + ((s >> 10) & 31)) & 0xFF
        rgb[3 * i] = r
        rgb[3 * i + 1] = g
        rgb[3 * i + 2] = b
    return bytes(rgb)


def main():
    ok = True
    cases = [
        ((32, 32, 1), dict(quality=75)),
        ((48, 40, 2), dict(quality=50)),
        ((100, 60, 3), dict(quality=90)),
        ((17, 23, 4), dict(quality=30)),
        ((8, 8, 5), dict(quality=60)),            # sub-MB frame
        ((1, 300, 6), dict(quality=60)),          # 1-px wide
        ((320, 240, 7), dict(quality=75)),        # larger
        ((64, 48, 8), dict(quality=75, partitions=3)),   # 8 partitions
        ((64, 48, 9), dict(quality=75, filter_type=0)),  # simple filter
        ((64, 48, 10), dict(quality=75, filter_sharpness=5)),
        ((64, 48, 11), dict(quality=0)),
        ((64, 48, 12), dict(quality=100)),
        ((64, 48, 13), dict(quality=75, autofilter=1)),
        ((64, 48, 14), dict(quality=75, segments=1)),
        ((48, 48, 15), dict(quality=40, method=0)),
        ((48, 48, 16), dict(quality=85, method=6)),
    ]
    for (w, h, seed), kw in cases:
        q = kw
        rgb = gen_test_image(w, h, seed)
        webp = libwebp_encode_cfg(rgb, w, h, **kw)
        gw, gh, gy = libwebp_decode_y(webp)
        _, _, gy_nf = libwebp_decode_y_nofilter(webp)
        d = extract_vp8_chunk(webp)
        f, W, H, plane, mbc, segs, ymodes = decode_y(bytearray(d))
        raw = b''.join(bytes(plane[r * W:r * W + gw]) for r in range(gh))
        loop_filter(f, W, H, plane, mbc, segs, ymodes)
        mine = b''.join(bytes(plane[r * W:r * W + gw]) for r in range(gh))

        def report(tag, a, b):
            if a == b:
                return f'{tag}:MATCH'
            diffs = sum(1 for x, y in zip(a, b) if x != y)
            md = max(abs(x - y) for x, y in zip(a, b))
            # first differing MB
            fd = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            return (f'{tag}:DIFF {diffs}px max{md} '
                    f'first@mb({(fd % gw) // 16},{(fd // gw) // 16})')
        print(f'{w}x{h} q{q}: ftype={f.filter_type} lvl={f.filter_level} '
              f'seg={f.seg_enabled} parts={f.nparts} '
              f'{report("recon", raw, gy_nf)} {report("final", mine, gy)}')
        ok = ok and mine == gy
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()


# ---------------- fixture ENCODER (DC-only keyframes) ----------------
# Shares only the published tables/trees with the decoder. Per-16x16-MB
# constant images encode exactly: qi=0 makes the Y2 DC quantizer 8, so
# level 8r reconstructs to +r per pixel with zero rounding error.

class BoolEnc:
    """RFC 6386 section 7.3 boolean encoder."""

    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bool(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def lit(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bool(128, (v >> i) & 1)

    def flush(self):
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def tree_path(tree, leaf):
    """(bits, prob_indices) from root to the leaf value."""
    res = {}

    def walk(i, bits, idxs):
        for b in (0, 1):
            t = tree[i + b]
            nb = bits + [b]
            ni = idxs + [i >> 1]
            if t <= 0:
                res[-t] = (nb, ni)
            else:
                walk(t, nb, ni)
    walk(0, [], [])
    return res[leaf]


def encode_tree(be, tree, probs, leaf):
    bits, idxs = tree_path(tree, leaf)
    for b, i in zip(bits, idxs):
        be.bool(probs[i], b)


def encode_token(be, probs, off, level, ctx_in):
    """One Y2 coefficient at position 0 + EOB at position 1; returns
    nothing. probs = flat 1056 defaults; off = plane base."""
    a = abs(level)
    if a <= 4:
        tok = a
        extra = None
    else:
        cat = next(c for c in range(5, -1, -1) if a >= CAT_BASE[c])
        tok = 5 + cat
        extra = a - CAT_BASE[cat]
    p0 = off + (COEFF_BANDS[0] * 3 + ctx_in) * 11
    encode_tree(be, COEFF_TREE, probs[p0:p0 + 11], tok)
    if tok > 4:
        cat = tok - 5
        cp = CAT_PROBS[cat]
        nb = len(cp)
        for k in range(nb):  # MSB-first, probs in table order
            be.bool(cp[k], (extra >> (nb - 1 - k)) & 1)
    be.bool(128, 1 if level < 0 else 0)
    # EOB at position 1, context from the coefficient just written
    ctx = 1 if a == 1 else 2
    p1 = off + (COEFF_BANDS[1] * 3 + ctx) * 11
    encode_tree(be, COEFF_TREE, probs[p1:p1 + 11], 11)


def encode_eob(be, probs, off, band, ctx):
    p = off + (COEFF_BANDS[band] * 3 + ctx) * 11 if False else \
        off + (band * 3 + ctx) * 11
    encode_tree(be, COEFF_TREE, probs[p:p + 11], 11)


def make_dc_vp8(consts, mbw, mbh, nparts=1):
    """VP8 keyframe: mb (x,y) is the constant consts[y*mbw+x]."""
    probs = list(DEFAULT_COEFF_PROBS)
    # reconstruct-side prediction bookkeeping (exact, since DC-only)
    recon = [0] * (mbw * mbh)
    levels = [0] * (mbw * mbh)
    for y in range(mbh):
        for x in range(mbw):
            i = y * mbw + x
            up = recon[i - mbw] if y > 0 else None
            left = recon[i - 1] if x > 0 else None
            if up is not None and left is not None:
                pred = (16 * up + 16 * left + 16) >> 5
            elif up is not None:
                pred = up
            elif left is not None:
                pred = left
            else:
                pred = 128
            r = consts[i] - pred
            levels[i] = 8 * r
            recon[i] = pred + r  # exact
    # ---- partition 0 ----
    be = BoolEnc()
    be.bool(128, 0)  # color space
    be.bool(128, 0)  # clamping
    be.bool(128, 0)  # segmentation off
    be.bool(128, 0)  # filter type (moot at level 0)
    be.lit(0, 6)     # filter level 0: no loop filter
    be.lit(0, 3)     # sharpness
    be.bool(128, 0)  # lf_adj off
    be.lit({1: 0, 2: 1, 4: 2, 8: 3}[nparts], 2)
    be.lit(0, 7)     # y_ac_qi = 0 -> y2dc quantizer = 8
    for _ in range(5):
        be.bool(128, 0)  # no quant deltas
    be.bool(128, 0)  # refresh entropy (keyframe: ignored for stills)
    for i in range(1056):
        be.bool(COEFF_UPDATE_PROBS[i], 0)  # keep default probs
    be.bool(128, 1)  # mb_no_coeff_skip
    be.lit(128, 8)   # skip prob
    for y in range(mbh):
        for x in range(mbw):
            i = y * mbw + x
            be.bool(128, 1 if levels[i] == 0 else 0)  # skip flag
            # ymode DC_PRED: kf tree path 1,0,0
            encode_tree(be, KF_YMODE_TREE, KF_YMODE_PROBS, 0)
            encode_tree(be, UV_TREE, KF_UV_PROBS, 0)
    part0 = be.flush()
    # ---- token partitions ----
    encs = [BoolEnc() for _ in range(nparts)]
    # Y2 nonzero context per column / per row-in-flight
    above_nz = [0] * mbw
    for y in range(mbh):
        te = encs[y % nparts]
        left_nz = 0
        for x in range(mbw):
            i = y * mbw + x
            L = levels[i]
            if L == 0:  # skipped: contexts zero (MB has Y2)
                above_nz[x] = 0
                left_nz = 0
                continue
            ctx = left_nz + above_nz[x]
            encode_token(te, probs, 1 * 264, L, ctx)
            above_nz[x] = 1
            left_nz = 1
            # 16 Y blocks: plane 0, first coeff 1, band(1)=1, ctx 0
            for _ in range(16):
                encode_eob(te, probs, 0 * 264, COEFF_BANDS[1], 0)
            # 8 chroma blocks: plane 2, coeff 0, band 0, ctx 0
            for _ in range(8):
                encode_eob(te, probs, 2 * 264, 0, 0)
    parts = [e.flush() for e in encs]
    # ---- uncompressed header ----
    w = mbw * 16
    h = mbh * 16
    tag = (len(part0) << 5) | (1 << 4) | 0  # keyframe, ver 0, show 1
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                 0x9D, 0x01, 0x2A,
                 w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    sizes = b''.join(len(p).to_bytes(3, 'little') for p in parts[:-1])
    payload = hdr + part0 + sizes + b''.join(parts)
    riff = b'VP8 ' + len(payload).to_bytes(4, 'little') + payload
    if len(payload) & 1:
        riff += b'\x00'
    return b'RIFF' + (4 + len(riff)).to_bytes(4, 'little') + b'WEBP' + riff


def test_encoder():
    import random
    rnd = random.Random(7)
    for (mbw, mbh, nparts) in [(1, 1, 1), (2, 2, 1), (3, 2, 2), (4, 5, 4),
                               (5, 3, 8), (2, 1, 1)]:
        consts = [rnd.randrange(256) for _ in range(mbw * mbh)]
        if mbw * mbh > 3:
            consts[2] = consts[1]  # force at least one skip
        webp = make_dc_vp8(consts, mbw, mbh, nparts)
        gw, gh, gy = libwebp_decode_y(webp)
        want = bytes(consts[(r // 16) * mbw + (c // 16)]
                     for r in range(gh) for c in range(gw))
        tag = f'{mbw}x{mbh} parts={nparts}'
        assert (gw, gh) == (mbw * 16, mbh * 16), tag
        assert gy == want, f'{tag}: libwebp decodes differently'
        # and the prototype decoder agrees end-to-end
        f, W, H, plane, mbc, segs, ym = decode_y(bytearray(extract_vp8_chunk(webp)))
        loop_filter(f, W, H, plane, mbc, segs, ym)
        assert bytes(plane) == want, f'{tag}: prototype disagrees'
        print(f'{tag}: ENCODER OK ({len(webp)}B)')
