#!/usr/bin/env python3
"""ISO 11172-3 Layer III Huffman tables — the machine-VALIDATED subset
{1,2,3,5,6,7,8,9,10,11,12} plus count1 tables A/B, transcribed from the
published spec (Annex B, tables 3-B.7), row-major (x,y) layout. Each
table is (xmax, ymax, lengths[], codes[]).

Table 10 graduated in r17: an INDEPENDENT re-transcription passed the
validator on first contact — Kraft sum exactly 1, zero duplicate
codewords, zero prefix violations. For a COMPLETE prefix code every
single-entry error necessarily surfaces as a collision or a hole (the
256 half-open dyadic intervals must tile [0,1) exactly), so a clean pass
is strong evidence of verbatim fidelity; the residual undetectable class
is a same-length value permutation, documented here like the carried
tables' single-ulp window uncertainty.

Tables 13, 15 and the escape tables 16..31 are deliberately NOT carried:
r16-and-earlier transcriptions of 13/15 FAILED the validator (duplicate
codewords / prefix violations / Kraft imbalance with no unique repair),
and an r17 re-transcription attempt at the two escape codebooks (shared
by ids 16..23 and 24..31) failed it diffusely (Kraft off by thousands of
2^-19 units, ~50 violations each — noise, not localized slips). No
ground-truth asset exists in this sandbox to correct them against (no
MP3 decoder library ships here; the one real MP3 on the box is digital
silence, which exercises no Huffman codes). The decoder refuses streams
selecting any uncarried table rather than guessing at 256-entry code
data. The validator caught and localized two single-entry slips in
tables 6 and 8 whose unique Kraft-restoring corrections were forced.

Machine-checked properties (run this file):
  - every table is a PREFIX-FREE code (no codeword is a prefix of another);
  - every table is COMPLETE (Kraft sum == 1), which the spec tables are —
    together these make a mis-transcribed entry nearly always detectable;
  - codeword values fit their stated lengths.

Escape tables 16..31 are deliberately NOT carried: their 512 codeword
values could not be independently cross-validated in this sandbox (no
MP3 decoder library ships here, unlike libwebp for the VP8 round), so the
decoder refuses streams that select them rather than guessing.
"""

# table id -> (nx, ny, lengths row-major, codes row-major)
TABLES = {
    1: (2, 2, [1, 3, 2, 3], [1, 1, 1, 0]),
    2: (3, 3, [1, 3, 6, 3, 3, 5, 5, 5, 6], [1, 2, 1, 3, 1, 1, 3, 2, 0]),
    3: (3, 3, [2, 2, 6, 3, 2, 5, 5, 5, 6], [3, 2, 1, 1, 1, 1, 3, 2, 0]),
    5: (4, 4, [1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8],
        [1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0]),
    6: (4, 4, [3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7],
        [7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0]),
    7: (6, 6,
        [1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8, 8, 9,
         7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10],
        [1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17, 8, 4,
         12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4, 5, 3, 2, 0]),
    8: (6, 6,
        [2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8, 8, 9,
         8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11],
        [3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14, 7, 3,
         19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4, 4, 1, 1, 0]),
    9: (6, 6,
        [3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6, 7, 8,
         6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9],
        [7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8, 8, 5,
         15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4, 6, 2, 6, 0]),
    10: (8, 8,
         [1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
          6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
          8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
          8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11],
         [1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
          11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
          20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
          14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0]),
    11: (8, 8,
         [2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8,
          5, 5, 6, 7, 8, 9, 8, 8, 7, 6, 7, 9, 8, 10, 8, 9,
          8, 8, 8, 9, 9, 10, 9, 10, 8, 8, 9, 10, 10, 11, 10, 11,
          8, 7, 7, 8, 9, 10, 10, 10, 8, 7, 8, 9, 10, 10, 10, 10],
         [3, 4, 10, 24, 34, 33, 21, 15, 5, 3, 4, 10, 32, 17, 11, 10,
          11, 7, 13, 18, 30, 31, 20, 5, 25, 11, 19, 59, 27, 18, 12, 5,
          35, 33, 31, 58, 30, 16, 7, 5, 28, 26, 32, 19, 17, 15, 8, 14,
          14, 12, 9, 13, 14, 9, 4, 1, 11, 4, 6, 6, 6, 3, 2, 0]),
    12: (8, 8,
         [4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
          5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
          7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
          8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10],
         [9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
          17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
          32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
          27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0]),
}

# count1 tables: 16 quads (v,w,x,y), index = v*8 + w*4 + x*2 + y
COUNT1 = {
    0: ([1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6],
        [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]),
    1: ([4] * 16, list(range(15, -1, -1))),
}


def validate(name, lengths, codes):
    """Prefix-free + complete (Kraft == 1) + codes fit lengths."""
    assert len(lengths) == len(codes), name
    kraft = 0
    seen = {}
    for l, c in zip(lengths, codes):
        assert 0 < l <= 19, (name, l)
        assert 0 <= c < (1 << l), (name, l, c)
        key = (l, c)
        assert key not in seen, (name, "duplicate codeword", key)
        seen[key] = True
        kraft += 1 << (19 - l)
    assert kraft == 1 << 19, (name, "Kraft sum", kraft / (1 << 19))
    # prefix-freeness: no codeword is a prefix of a longer one
    by_len = {}
    for l, c in zip(lengths, codes):
        by_len.setdefault(l, set()).add(c)
    for l1 in by_len:
        for l2 in by_len:
            if l2 <= l1:
                continue
            for c2 in by_len[l2]:
                assert (c2 >> (l2 - l1)) not in by_len[l1], \
                    (name, "prefix violation", l1, l2, c2)


def validate_all():
    for tid, (nx, ny, ls, cs) in TABLES.items():
        assert len(ls) == nx * ny and len(cs) == nx * ny, tid
        validate(f"table{tid}", ls, cs)
    for tid, (ls, cs) in COUNT1.items():
        validate(f"count1{'AB'[tid]}", ls, cs)
    print("all Layer III Huffman tables: prefix-free and Kraft-complete")


if __name__ == "__main__":
    validate_all()
