#!/usr/bin/env python3
"""Generate fixtures/webp_probe_golden.parquet — hand-built VP8L streams,
each isolating ONE spec feature, with libwebp's decode as ground truth.

Where tools/webp_golden.py captures whatever the reference ENCODER chose
to do, these streams pin down decoder semantics the encoder may not
exercise (or that are easy to get subtly wrong): every predictor mode 0-13
(including the row-0 / column-0 / top-right-edge special cases), the color
transform's channel packing and delta arithmetic, subtract-green, color
indexing at every bundling width, the color cache, meta-prefix groups,
overlapping LZ copies, and all 120 two-dimensional distance codes.

Run: python3 tools/webp_feature_golden.py  (writes the parquet; commit it)
"""
import heapq
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "tools")
from webp_probe import (BitWriter, CL_ORDER, canonical, decode, riff,
                        dist_sym_extra, probe_stream)


# ---- generic prefix-code writers ----------------------------------------

def huffman_lengths(freq):
    """symbol -> code length for the given frequencies (>= 2 symbols)."""
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freq.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in freq}
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, id(s1), s1 + s2))
    return {s: max(1, d) for s, d in depth.items()}


def tokenize_lengths(lengths, alphabet):
    """Symbol-length sequence -> (token, arg) list using 17/18 zero runs."""
    toks, i = [], 0
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    while i < alphabet:
        if seq[i] == 0:
            j = i
            while j < alphabet and seq[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                if run >= 11:
                    r = min(run, 138)
                    toks.append((18, r - 11))
                    run -= r
                elif run >= 3:
                    r = min(run, 10)
                    toks.append((17, r - 3))
                    run -= r
                else:
                    toks.append((0, None))
                    run -= 1
            i = j
        else:
            toks.append((seq[i], None))
            i += 1
    return toks


def write_generic_code(w, lengths, alphabet):
    """Normal (code-length-coded) prefix code for an arbitrary lengths map."""
    nonzero = {s: l for s, l in lengths.items() if l > 0}
    if len(nonzero) == 1:
        sym = next(iter(nonzero))
        w.write(1, 1)  # simple, 1 symbol
        w.write(0, 1)
        w.write(1, 1)
        assert sym <= 255
        w.write(sym, 8)
        return
    if len(nonzero) == 2 and all(s <= 255 for s in nonzero):
        s0, s1 = sorted(nonzero)
        w.write(1, 1)  # simple, 2 symbols
        w.write(1, 1)
        w.write(1, 1)
        w.write(s0, 8)
        w.write(s1, 8)
        return
    w.write(0, 1)  # normal
    toks = tokenize_lengths(lengths, alphabet)
    freq = {}
    for t, _ in toks:
        freq[t] = freq.get(t, 0) + 1
    if len(freq) == 1:  # complete the CL code with a never-used second token
        freq[15 if 15 not in freq else 14] = 1
    cl = huffman_lengths(freq)
    n = max(CL_ORDER.index(t) for t in cl) + 1
    n = max(n, 4)
    w.write(n - 4, 4)
    for i in range(n):
        w.write(cl.get(CL_ORDER[i], 0), 3)
    w.write(0, 1)  # no max_symbol shortcut
    clc = canonical(cl)
    for t, arg in toks:
        w.write_code(*clc[t])
        if t == 16:
            w.write(arg, 2)
        elif t == 17:
            w.write(arg, 3)
        elif t == 18:
            w.write(arg, 7)


class SymbolCoder:
    """Builds the 5 prefix codes from planned symbol streams, then encodes
    them — lets a probe express pixels/copies naturally."""

    def __init__(self, cache_bits=0):
        self.cache_bits = cache_bits
        self.green, self.red, self.blue, self.alpha, self.dist = \
            [], [], [], [], []

    def literal(self, r, g, b, a):
        self.green.append(g)
        self.red.append(r)
        self.blue.append(b)
        self.alpha.append(a)

    def copy(self, length, dist_code):
        lsym, lextra, lbits = dist_sym_extra(length)
        self.green.append((256 + lsym, lextra, lbits))
        dsym, dextra, dbits = dist_sym_extra(dist_code)
        self.dist.append((dsym, dextra, dbits))

    def cache_ref(self, idx):
        self.green.append(256 + 24 + idx)

    def emit(self, w):
        def plain(stream):
            return [s if isinstance(s, int) else s[0] for s in stream]

        def code_for(stream, alphabet):
            freq = {}
            for s in plain(stream):
                freq[s] = freq.get(s, 0) + 1
            if not freq:
                freq = {0: 1}
            lengths = huffman_lengths(freq) if len(freq) > 1 \
                else {next(iter(freq)): 1}
            write_generic_code(w, lengths, alphabet)
            return canonical(lengths) if len(freq) > 1 else \
                {next(iter(freq)): (0, 0)}
        galpha = 256 + 24 + (1 << self.cache_bits if self.cache_bits else 0)
        gc = code_for(self.green, galpha)
        rc = code_for(self.red, 256)
        bc = code_for(self.blue, 256)
        ac = code_for(self.alpha, 256)
        dc = code_for(self.dist, 40)
        ri, bi, ai, di = 0, 0, 0, 0
        for s in self.green:
            if isinstance(s, int):
                w.write_code(*gc[s])
                if s < 256:  # literal: red, blue, alpha follow
                    w.write_code(*rc[self.red[ri]]); ri += 1
                    w.write_code(*bc[self.blue[bi]]); bi += 1
                    w.write_code(*ac[self.alpha[ai]]); ai += 1
            else:
                sym, extra, nbits = s
                w.write_code(*gc[sym])
                w.write(extra, nbits)
                dsym, dextra, dbits = self.dist[di]; di += 1
                w.write_code(*dc[dsym])
                w.write(dextra, dbits)


def header(w, width, height):
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)
    w.write(0, 3)


def entropy_image_1x1(w, argb):
    """A 1x1 entropy-coded subimage (no meta prefix, no cache) holding one
    pixel — used as transform data."""
    w.write(0, 1)  # no color cache
    sc = SymbolCoder()
    sc.literal((argb >> 16) & 0xff, (argb >> 8) & 0xff,
               argb & 0xff, (argb >> 24) & 0xff)
    sc.emit(w)


def px(x, y):
    """Deterministic distinctive canvas pixel."""
    return ((x * 23 + y * 7) & 0xff, (x * 5 + y * 3 + 13) & 0xff,
            (x * 11 + y * 17 + 101) & 0xff, 255)


# ---- the probes ----------------------------------------------------------

def predictor_probe(mode, width=12, height=10):
    w = BitWriter()
    header(w, width, height)
    w.write(1, 1)  # a transform
    w.write(0, 2)  # PREDICTOR
    # one tile covers all: block size 1 << 4 = 16 >= 12,10; size_bits = 4-2
    w.write(2, 3)
    entropy_image_1x1(w, 0xff000000 | (mode << 8))
    w.write(0, 1)  # end of transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta prefix
    sc = SymbolCoder()
    for y in range(height):
        for x in range(width):
            sc.literal(*px(x, y))  # residuals — prediction added on top
    sc.emit(w)
    return w.bytes()


def color_transform_probe(g2r, g2b, r2b, width=16, height=8):
    w = BitWriter()
    header(w, width, height)
    w.write(1, 1)
    w.write(1, 2)  # COLOR_TRANSFORM
    w.write(3, 3)  # block size 1 << 5 = 32: one tile
    # channel packing probed: blue=g2r, green=g2b, red=r2b
    entropy_image_1x1(w, 0xff000000 | (r2b << 16) | (g2b << 8) | g2r)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    sc = SymbolCoder()
    for y in range(height):
        for x in range(width):
            sc.literal(*px(x, y))
    sc.emit(w)
    return w.bytes()


def subtract_green_probe(width=16, height=8):
    w = BitWriter()
    header(w, width, height)
    w.write(1, 1)
    w.write(2, 2)  # SUBTRACT_GREEN (no data)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    sc = SymbolCoder()
    for y in range(height):
        for x in range(width):
            sc.literal(*px(x, y))
    sc.emit(w)
    return w.bytes()


def palette_probe(palette, width=21, height=5):
    """COLOR_INDEXING at whatever bundling width len(palette) implies."""
    n = len(palette)
    w = BitWriter()
    header(w, width, height)
    w.write(1, 1)
    w.write(3, 2)  # COLOR_INDEXING
    w.write(n - 1, 8)
    # palette itself is an entropy-coded n x 1 image, DELTA-coded
    w.write(0, 1)  # no color cache (palette subimage)
    sc = SymbolCoder()
    prev = 0
    for c in palette:
        delta = [((c >> s) - (prev >> s)) & 0xff for s in (16, 8, 0, 24)]
        sc.literal(delta[0], delta[1], delta[2], delta[3])
        prev = c
    sc.emit(w)
    w.write(0, 1)  # end transforms
    w.write(0, 1)  # no cache (main)
    w.write(0, 1)  # no meta
    wb = 0 if n > 16 else (1 if n > 4 else (2 if n > 2 else 3))
    packed_w = (width + (1 << wb) - 1) >> wb
    sc2 = SymbolCoder()
    idx = lambda x, y: (x * 3 + y * 5 + x // 4) % n
    for y in range(height):
        for bx in range(packed_w):
            g = 0
            for k in range(1 << wb):
                x = (bx << wb) + k
                v = idx(x, y) if x < width else 0
                g |= v << (k * (8 >> wb))
            sc2.literal(0, g, 0, 255)
    sc2.emit(w)
    return w.bytes()


def cache_probe(cache_bits=4, width=16, height=4):
    w = BitWriter()
    header(w, width, height)
    w.write(0, 1)  # no transforms
    w.write(1, 1)  # color cache!
    w.write(cache_bits, 4)
    w.write(0, 1)  # no meta prefix
    sc = SymbolCoder(cache_bits=cache_bits)
    pixels = [(30, 40, 50, 255), (200, 10, 99, 255), (1, 2, 3, 255),
              (130, 130, 130, 255)]

    def argb(p):
        r, g, b, a = p
        return (a << 24) | (r << 16) | (g << 8) | b

    def slot(p):
        return ((0x1e35a7bd * argb(p)) & 0xffffffff) >> (32 - cache_bits)
    seq = []
    seen = {}
    for i in range(width * height):
        p = pixels[(i * 7 + i // 5) % len(pixels)]
        s = slot(p)
        if seen.get(s) == p:
            sc.cache_ref(s)
        else:
            sc.literal(*p)
        seen[s] = p  # every emitted pixel enters the cache
        seq.append(p)
    sc.emit(w)
    return w.bytes()


def make_meta(width=16, height=8):
    """Meta-prefix probe built explicitly (codes for BOTH groups first,
    then one interleaved symbol stream)."""
    w = BitWriter()
    header(w, width, height)
    w.write(0, 1)
    w.write(0, 1)
    w.write(1, 1)
    w.write(0, 3)  # prefix_bits = 2
    w.write(0, 1)  # entropy image: no cache
    sce = SymbolCoder()
    for by in range(2):
        for bx in range(4):
            sce.literal(0, 0 if bx < 2 else 1, 0, 255)
    sce.emit(w)
    # group codes: both groups use fixed literal sets
    g0 = {"green": {77: 1, 78: 1}, "red": {10: 1, 11: 1},
          "blue": {20: 1, 21: 1}, "alpha": {255: 1}}
    g1 = {"green": {200: 1, 201: 1}, "red": {99: 1, 98: 1},
          "blue": {5: 1, 6: 1}, "alpha": {255: 1}}
    codes = {}
    for gi, g in enumerate((g0, g1)):
        for name, alphabet in (("green", 280), ("red", 256), ("blue", 256),
                               ("alpha", 256)):
            lengths = g[name]
            write_generic_code(w, lengths, alphabet)
            codes[(gi, name)] = canonical(lengths) if len(lengths) > 1 \
                else {next(iter(lengths)): (0, 0)}
        write_generic_code(w, {1: 1}, 40)  # distance: unused single-symbol
        codes[(gi, "dist")] = {1: (0, 0)}
    expected = bytearray(width * height * 4)
    for y in range(height):
        for x in range(width):
            gi = 0 if x < 8 else 1
            g = (g0, g1)[gi]
            gr = sorted(g["green"])[(x + y) % 2]
            rd = sorted(g["red"])[x % 2]
            bl = sorted(g["blue"])[y % 2]
            w.write_code(*codes[(gi, "green")][gr])
            w.write_code(*codes[(gi, "red")][rd])
            w.write_code(*codes[(gi, "blue")][bl])
            w.write_code(*codes[(gi, "alpha")][255])
            i = 4 * (y * width + x)
            expected[i:i + 4] = bytes((rd, gr, bl, 255))
    return w.bytes(), bytes(expected)


def lz_overlap_probe(width=24, height=3):
    """dist 1, length 30: the classic overlapping run."""
    w = BitWriter()
    header(w, width, height)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    sc = SymbolCoder()
    sc.literal(10, 20, 30, 255)
    sc.literal(40, 50, 60, 255)
    sc.copy(30, 120 + 1)   # linear distance 1 (codes > 120 are linear)
    for i in range(width * height - 32):
        sc.literal(i & 0xff, 5, 7, 255)
    sc.emit(w)
    return w.bytes()


def main():
    rows = []

    def add(name, data, expected=None):
        r = decode(riff(data))
        assert r, f"libwebp refused probe {name}"
        wdt, hgt, rgba = r
        if expected is not None:
            assert rgba == expected, f"{name}: constructed expectation off"
        rows.append((name, wdt, hgt, riff(data), rgba))
        print(f"{name}: {wdt}x{hgt} ok")

    for mode in range(14):
        add(f"predictor_{mode}", predictor_probe(mode))
    add("color_transform", color_transform_probe(0x40, 0xE0, 0x15))
    add("color_transform_neg", color_transform_probe(0x81, 0x7f, 0xff))
    add("subtract_green", subtract_green_probe())
    add("palette_2", palette_probe([0xff000000, 0xffffffff]))
    add("palette_3", palette_probe([0xff102030, 0xffa0b0c0, 0xff406080]))
    add("palette_12", palette_probe(
        [0xff000000 | (k * 21 << 16) | (255 - k * 17 << 8) | (k * k * 5 & 0xff)
         for k in range(12)]))
    add("palette_200", palette_probe(
        [0xff000000 | (k << 16) | ((k * 3 & 0xff) << 8) | (k * 7 & 0xff)
         for k in range(200)]))
    add("color_cache", cache_probe())
    meta_data, meta_exp = make_meta()
    add("meta_prefix", meta_data, meta_exp)
    add("lz_overlap", lz_overlap_probe())
    for d in (1, 2, 5, 17, 40, 77, 120):
        add(f"dist_{d}", probe_stream(17, 9, d))
    t = pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "width": pa.array([r[1] for r in rows], pa.int32()),
        "height": pa.array([r[2] for r in rows], pa.int32()),
        "webp": pa.array([r[3] for r in rows], pa.binary()),
        "rgba": pa.array([r[4] for r in rows], pa.binary()),
    })
    pq.write_table(t, "fixtures/webp_probe_golden.parquet")
    print(f"wrote fixtures/webp_probe_golden.parquet ({len(rows)} rows)")


if __name__ == "__main__":
    main()
