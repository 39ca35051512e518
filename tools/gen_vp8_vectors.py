#!/usr/bin/env python3
"""Generate lossy-WebP (VP8) golden fixtures: REAL streams encoded by
the system libwebp (the reference WebP implementation), paired with the
Y plane libwebp itself decodes from them. The Scala decoder must
reproduce that plane BIT-EXACTLY — the strongest available independent
check (the ImageIO-cross-decoder stance, WebP edition), covering the
normal + simple loop filters, segmentation with per-segment quant,
coefficient-probability updates, and mixed 16x16/B_PRED mode decisions
made by a production encoder.

Run: python3 tools/gen_vp8_vectors.py  → Scala snippet on stdout.
"""
import sys
sys.path.insert(0, 'tools')
import vp8_proto as V  # noqa: E402


CASES = [
    ('q75', (32, 32, 1), dict(quality=75)),
    ('odd', (17, 23, 4), dict(quality=30)),
    ('tiny', (8, 8, 5), dict(quality=60)),
    ('simple', (48, 40, 9), dict(quality=75, filter_type=0)),
    ('nofilter', (48, 40, 12), dict(quality=100)),
    ('q0', (32, 32, 11), dict(quality=0)),
    ('sharp', (32, 48, 10), dict(quality=65, filter_sharpness=5)),
]


def hexs(b):
    return b.hex()


def main():
    print('  // libwebp-encoded VP8 (lossy WebP) streams + the Y plane')
    print('  // libwebp itself decodes from each (tools/gen_vp8_vectors.py);')
    print('  // prototype cross-validated bit-exact before the Scala port')
    for name, (w, h, seed), kw in CASES:
        rgb = V.gen_test_image(w, h, seed)
        webp = V.libwebp_encode_cfg(rgb, w, h, **kw)
        gw, gh, gy = V.libwebp_decode_y(webp)
        assert (gw, gh) == (w, h)
        # sanity: the prototype must agree before we bless the fixture
        d = V.extract_vp8_chunk(webp)
        f, W, H, plane, mbc, segs, ym = V.decode_y(bytearray(d))
        V.loop_filter(f, W, H, plane, mbc, segs, ym)
        mine = b''.join(bytes(plane[r * W:r * W + gw]) for r in range(gh))
        assert mine == gy, f'prototype mismatch on {name}'
        sys.stderr.write(
            f'{name}: {w}x{h} stream {len(webp)}B ftype={f.filter_type} '
            f'lvl={f.filter_level} seg={f.seg_enabled}\n')
        print(f'  // {name}: {w}x{h}, {kw}, filter_type={f.filter_type},')
        print(f'  //   level={f.filter_level}, segments={f.seg_enabled}')
        print(f'  val vp8Webp_{name}: Array[Byte] = hexBytesT(')
        hx = hexs(webp)
        for i in range(0, len(hx), 72):
            sep = ' +' if i + 72 < len(hx) else ')'
            print(f'    "{hx[i:i + 72]}"{sep}')
        print(f'  val vp8Luma_{name}: Array[Byte] = hexBytesT(')
        hy = hexs(gy)
        for i in range(0, len(hy), 72):
            sep = ' +' if i + 72 < len(hy) else ')'
            print(f'    "{hy[i:i + 72]}"{sep}')
        print(f'  val vp8Dims_{name}: (Int, Int) = ({w}, {h})')


if __name__ == '__main__':
    main()
