#!/usr/bin/env python3
"""MPEG Audio Layer III decode prototype (MPEG-1 + MPEG-2 LSF, mono focus).

Validation stance (the VP8 method, adapted): no MP3 library ships in this
sandbox, so ground truth is (a) the ISO 11172-3 / 13818-3 bitstream
GRAMMAR, which is exactly self-checking — every granule's scalefactor +
Huffman read must consume exactly `part2_3_length` bits, an invariant a
wrong Huffman table essentially cannot survive across a real encoder's
stream — and (b) the one real encoder-produced stream on the box
(google-cloud-sdk's gsutil test asset, 45 frames of 22.05 kHz mono LSF).

This prototype is the authoring ground for the Scala port: tables are
validated here (Kraft equality + prefix-freeness + stream consumption),
then emitted into Scala/oracle-SQL by tools/gen_mp3_tables.py.
"""
import sys

TEST_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


class Bits:
    def __init__(self, data, pos_bits=0):
        self.d = data
        self.p = pos_bits

    def read(self, n):
        v = 0
        for _ in range(n):
            byte = self.d[self.p >> 3]
            v = (v << 1) | ((byte >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v


BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
SR_V1 = [44100, 48000, 32000, 0]
SR_V2 = [22050, 24000, 16000, 0]
SR_V25 = [11025, 12000, 8000, 0]


def parse_header(h):
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    ver = (h[1] >> 3) & 3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h[1] >> 1) & 3    # 1 = Layer III
    prot = h[1] & 1            # 0 = CRC present
    br = (h[2] >> 4) & 15
    sr = (h[2] >> 2) & 3
    pad = (h[2] >> 1) & 1
    mode = (h[3] >> 6) & 3     # 3 = mono
    mode_ext = (h[3] >> 4) & 3
    if layer != 1 or br in (0, 15) or sr == 3 or ver == 1:
        return None
    if ver == 3:
        kbps, hz, spf = BITRATE_V1_L3[br], SR_V1[sr], 1152
    elif ver == 2:
        kbps, hz, spf = BITRATE_V2_L3[br], SR_V2[sr], 576
    else:
        kbps, hz, spf = BITRATE_V2_L3[br], SR_V25[sr], 576
    flen = (spf // 8) * kbps * 1000 // hz + pad
    return dict(ver=ver, prot=prot, kbps=kbps, hz=hz, pad=pad, mode=mode,
                mode_ext=mode_ext, flen=flen, spf=spf, sr_idx=sr)


def frames_of(data):
    i = 0
    if data[:3] == b"ID3":
        i = 10 + ((data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9])
    out = []
    while i + 4 <= len(data):
        h = parse_header(data[i:i + 4])
        if h is None:
            i += 1
            continue
        h["off"] = i
        out.append(h)
        i += h["flen"]
    return out


def side_info(data, h):
    """Parse side info; returns (main_data_begin, granules) where each granule
    is a per-channel dict list."""
    off = h["off"] + 4 + (0 if h["prot"] else 2)
    nch = 1 if h["mode"] == 3 else 2
    b = Bits(data, off * 8)
    if h["ver"] == 3:
        mdb = b.read(9)
        b.read(5 if nch == 1 else 3)
        scfsi = [[b.read(1) for _ in range(4)] for _ in range(nch)]
        ngr = 2
    else:
        mdb = b.read(8)
        b.read(1 if nch == 1 else 2)
        scfsi = [[0] * 4 for _ in range(nch)]
        ngr = 1
    grs = []
    for _ in range(ngr):
        chs = []
        for _ in range(nch):
            g = {}
            g["part2_3_length"] = b.read(12)
            g["big_values"] = b.read(9)
            g["global_gain"] = b.read(8)
            g["scalefac_compress"] = b.read(4 if h["ver"] == 3 else 9)
            g["wsf"] = b.read(1)
            if g["wsf"]:
                g["block_type"] = b.read(2)
                g["mixed"] = b.read(1)
                g["table_select"] = [b.read(5), b.read(5)]
                g["subblock_gain"] = [b.read(3) for _ in range(3)]
                g["region0_count"] = 7 if g["block_type"] != 2 or g["mixed"] else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed"] = 0
                g["table_select"] = [b.read(5), b.read(5), b.read(5)]
                g["region0_count"] = b.read(4)
                g["region1_count"] = b.read(3)
            if h["ver"] == 3:
                g["preflag"] = b.read(1)
            g["scalefac_scale"] = b.read(1)
            g["count1table_select"] = b.read(1)
            chs.append(g)
        grs.append(chs)
    si_bytes = (17 if nch == 1 else 32) if h["ver"] == 3 else (9 if nch == 1 else 17)
    assert (b.p - off * 8) == si_bytes * 8, (b.p - off * 8, si_bytes * 8)
    return mdb, scfsi, grs, off + si_bytes


def main():
    data = open(TEST_MP3, "rb").read()
    fr = frames_of(data)
    print(f"{len(fr)} frames; ver={fr[0]['ver']} {fr[0]['kbps']}kbps {fr[0]['hz']}Hz mode={fr[0]['mode']}")
    from collections import Counter
    tsel = Counter()
    bt = Counter()
    c1t = Counter()
    mdbs = []
    for h in fr:
        mdb, scfsi, grs, _ = side_info(data, h)
        mdbs.append(mdb)
        for chs in grs:
            for g in chs:
                bt[(g["wsf"], g["block_type"], g["mixed"])] += 1
                c1t[g["count1table_select"]] += 1
                nt = 2 if g["wsf"] else 3
                for t in g["table_select"][:nt]:
                    tsel[t] += 1
    print("block types (wsf, bt, mixed):", dict(bt))
    print("table_select census:", dict(sorted(tsel.items())))
    print("count1 table:", dict(c1t))
    print("main_data_begin range:", min(mdbs), max(mdbs), "nonzero:", sum(1 for m in mdbs if m))


if __name__ == "__main__":
    main()
