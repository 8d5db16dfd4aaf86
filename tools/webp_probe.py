#!/usr/bin/env python3
"""Empirical VP8L (WebP-lossless) spec probe against the system libwebp.

Hand-crafts minimal VP8L bitstreams with a from-scratch bit writer and
decodes them with /usr/lib/x86_64-linux-gnu/libwebp.so.7 to pin down the
spec details the Scala decoder hardcodes — most importantly the 120-entry
2D distance-code map, which is an explicit table in the spec and is
derived HERE from the reference decoder's observable behavior (each probe
stream emits one LZ77 copy with distance code D over a canvas of distinct
pixels; the copied pixel's value identifies the linear distance, and two
canvas widths disambiguate (dx, dy)).

Also exercised on the way: the LSB-first bit reader, canonical prefix
codes read MSB-of-code-first, the code-length code (order
17,18,0,1,..,15; runs 16/17/18), simple 1/2-symbol codes, zero-bit
single-symbol codes, and the length/distance prefix-value coding.

Run: python3 tools/webp_probe.py   (prints the Scala distance-map literal)
"""
import ctypes

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        """n bits, LSB-first (header fields, extra bits)."""
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code, length):
        """Prefix code bits, MSB-of-code-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)


def canonical(lengths):
    """symbol -> (code, length) canonical assignment (JPEG/DEFLATE style)."""
    pairs = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes, code, prev_len = {}, 0, 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def write_normal_code(w, sym_lengths, alphabet, cl_lengths, emit):
    """Normal (code-length-coded) prefix code. `emit(cl_codes, w)` writes
    the symbol-length sequence using the code-length code."""
    w.write(0, 1)  # not simple
    used = [CL_ORDER.index(s) for s in cl_lengths]
    n = max(used) + 1
    w.write(n - 4, 4)
    for i in range(n):
        w.write(cl_lengths.get(CL_ORDER[i], 0), 3)
    w.write(0, 1)  # no max_symbol shortcut
    emit(canonical(cl_lengths), w)


def write_simple1(w, sym):
    w.write(1, 1)  # simple
    w.write(0, 1)  # 1 symbol
    w.write(1, 1)  # 8-bit symbol
    w.write(sym, 8)


def green_code(w, lit_green, len_sym):
    """Greens: {lit_green: 1 bit, 256+len_sym... here 256: 1 bit}."""
    lengths = {lit_green: 1, 256: 1}
    cl = {1: 1, 18: 1}

    def emit(clc, w):
        def run18(k):
            while k > 0:
                r = min(k, 138)
                if r < 11:  # can't express; pad with... never happens here
                    raise ValueError(r)
                w.write_code(*clc[18])
                w.write(r - 11, 7)
                k -= r
        run18(lit_green)
        w.write_code(*clc[1])
        run18(256 - lit_green - 1)
        w.write_code(*clc[1])
        run18(280 - 257)
    write_normal_code(w, lengths, 280, cl, emit)


def flat8_code(w):
    """All 256 symbols length 8 -> canonical code(s) == s."""
    cl = {8: 1, 16: 1}

    def emit(clc, w):
        w.write_code(*clc[8])
        left = 255
        while left > 0:
            r = min(left, 6)
            if r < 3:
                for _ in range(r):
                    w.write_code(*clc[8])
                left = 0
            else:
                w.write_code(*clc[16])
                w.write(r - 3, 2)
                left -= r
    write_normal_code(w, {s: 8 for s in range(256)}, 256, cl, emit)


def dist_sym_extra(v):
    """LZ77 prefix-value coding: value v>=1 -> (symbol, extra, nbits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    b = x.bit_length() - 1
    half = 1 if (x - (1 << b)) >= (1 << (b - 1)) else 0
    sym = 2 * b + half
    offset = (2 + (sym & 1)) << (b - 1)
    return sym, x - offset, b - 1


def probe_stream(width, height, dist_code):
    """Distinct literals for all but one pixel; one len-1 copy with the
    given distance CODE at pixel index width*(height-1)."""
    w = BitWriter()
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta prefix
    green_code(w, 100, 0)
    flat8_code(w)           # red = index & 0xff
    flat8_code(w)           # blue = index >> 8
    write_simple1(w, 255)   # alpha
    # distance code: single symbol, zero read bits
    dsym, dextra, dnbits = dist_sym_extra(dist_code)
    write_simple1(w, dsym)
    copy_at = width * (height - 1)
    total = width * height
    for i in range(total):
        if i == copy_at:
            w.write_code(1, 1)          # green sym 256 -> length code 0 (len 1)
            w.write(dextra, dnbits)     # distance extras (symbol itself: 0 bits)
        else:
            w.write_code(0, 1)          # green literal 100
            w.write_code(i & 0xff, 8)   # red
            w.write_code((i >> 8) & 0xff, 8)  # blue
    return w.bytes()


def riff(vp8l):
    if len(vp8l) % 2:
        vp8l += b"\x00"
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def decode(data):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(wi), ctypes.byref(hi))
    if not p:
        return None
    n = wi.value * hi.value * 4
    out = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    LIB.WebPFree(p)
    return wi.value, hi.value, out


def literal_selfcheck(width, height):
    data = riff(probe_stream(width, height, 1))
    r = decode(data)
    assert r, "libwebp refused the hand-built stream"
    w, h, px = r
    assert (w, h) == (width, height)
    for i in range(w * h):
        if i == width * (height - 1):
            continue
        r_, g_, b_, a_ = px[4 * i:4 * i + 4]
        assert (r_, g_, b_, a_) == (i & 0xff, 100, (i >> 8) & 0xff, 255), \
            (i, r_, g_, b_, a_)


def derive_map(width, height):
    m = {}
    for d in range(1, 121):
        r = decode(riff(probe_stream(width, height, d)))
        assert r, f"refused at dist code {d}"
        w, h, px = r
        i = width * (height - 1)
        src = px[4 * i] + (px[4 * i + 2] << 8)
        assert px[4 * i + 1] == 100, f"copy target not a copied pixel at {d}"
        m[d] = i - src
    return m


def main():
    literal_selfcheck(17, 9)
    literal_selfcheck(29, 9)
    print("literal self-check OK: header/prefix-code/bit conventions verified")
    m17 = derive_map(17, 9)
    m29 = derive_map(29, 9)
    entries = []
    for d in range(1, 121):
        # model: linear = max(1, dy*xsize + dx)
        solved = None
        for dy in range(0, 16):
            dx = m17[d] - dy * 17
            if -16 <= dx <= 16:
                lin29 = dy * 29 + dx
                if max(1, lin29) == m29[d]:
                    solved = (dx, dy)
                    break
        assert solved, (d, m17[d], m29[d])
        entries.append(solved)
    print("// empirically derived from libwebp 7.1.5 (tools/webp_probe.py):")
    print("// distance code 1..120 -> (dx, dy); linear = max(1, dy*w + dx)")
    for row in range(0, 120, 6):
        print("  " + ", ".join(f"({dx}, {dy})"
                               for dx, dy in entries[row:row + 6]) + ",")


if __name__ == "__main__":
    main()
