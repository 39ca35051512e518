#!/usr/bin/env python3
"""Extract the published VP8 probability/quantizer tables (RFC 6386
sections 11.4/13.4/13.5/14.1) from the system libwebp build, as a
transcription CHECK for the Scala decoder's tables.

The tables themselves are public — RFC 6386 prints every value — but a
hand transcription of ~3000 bytes needs an independent verifier, and a
wrong byte in a probability table desyncs an arithmetic decoder in ways
no local test could attribute. The system libwebp (BSD, the reference
WebP implementation) compiled the same published tables into .rodata;
locating them by their published anchor rows and diffing is the same
stance as using ImageIO as the TIFF cross-decoder.

Anchors (all published values):
  kAcTable   u16[128]  starts 4,5,6,7,8,9,10,11    ends ...,284
  kDcTable   u8[128]   starts 4,5,6,7,8,9,10,10    ends ...,157
  kBands     u8[16]    0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7
  kZigzag    u8[16]    0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15
  kBModesProba[10][10][9]   first row 231,120,48,89,115,113,120,152,112
  CoeffsProba0[4][8][3][11] first row 253,136,254,255,228,219,128,...
  CoeffsUpdateProba         1056 bytes ending right before kBModesProba

Run: python3 tools/extract_vp8_tables.py  → prints Scala array literals.
"""
import struct

LIB = '/usr/lib/x86_64-linux-gnu/libwebp.so.7'
data = open(LIB, 'rb').read()


def find_once(pat, what):
    i = data.find(pat)
    assert i >= 0, what
    # a second hit is fine (enc+dec each carry a copy) — take the first
    return i


ac_off = find_once(struct.pack('<8H', 4, 5, 6, 7, 8, 9, 10, 11), 'kAcTable')
ac = list(struct.unpack_from('<128H', data, ac_off))
assert ac[-1] == 284 and all(4 <= v <= 284 for v in ac)

dc_off = find_once(bytes([4, 5, 6, 7, 8, 9, 10, 10]), 'kDcTable')
dc = list(data[dc_off:dc_off + 128])
assert dc[-1] == 157 and all(4 <= v <= 157 for v in dc)

bmode_off = find_once(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]),
                      'kBModesProba')
bmode = list(data[bmode_off:bmode_off + 900])
assert all(1 <= v <= 255 for v in bmode)

# the anchor row is [0][1][0] — the published table opens with the
# UNUSED type-0 band-0 entry (three all-128 context rows), because
# 16x16-mode Y blocks start at coefficient 1
anchor = find_once(bytes([253, 136, 254, 255, 228, 219, 128]),
                   'CoeffsProba0')
proba0_off = anchor - 33
proba0 = list(data[proba0_off:proba0_off + 1056])
assert proba0[:33] == [128] * 33, 'type-0 band-0 filler missing'
assert all(1 <= v <= 255 for v in proba0)

# CoeffsUpdateProba sits immediately before kBModesProba in the dec
# .rodata cluster (verified: 1056 bytes, 255-dominated as published)
upd = list(data[bmode_off - 1056:bmode_off])
assert sum(1 for v in upd if v == 255) > 700 and all(
    1 <= v <= 255 for v in upd), 'CoeffsUpdateProba shape'


def scala(name, vals, per=16):
    rows = [', '.join(str(v) for v in vals[i:i + per])
            for i in range(0, len(vals), per)]
    body = ',\n    '.join(rows)
    return f'  val {name}: Array[Int] = Array(\n    {body})\n'


print(scala('DcQLookup', dc))
print(scala('AcQLookup', ac))
print(scala('CoeffUpdateProbs', upd))
print(scala('DefaultCoeffProbs', proba0))
print(scala('KfBModeProbs', bmode))
