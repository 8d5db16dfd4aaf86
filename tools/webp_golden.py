#!/usr/bin/env python3
"""Generate fixtures/webp_golden.parquet — REAL lossless-WebP payloads from
the system libwebp encoder over deterministic, generator-known pixels.

Each row: (name, width, height, webp blob, rgba blob). The pixels are
drawn HERE by simple integer formulas (re-stated independently in the
Scala specs); WebPEncodeLosslessRGBA is lossless, so the Scala VP8L
decoder must reproduce the rgba blob byte-for-byte. Content is chosen to
steer the encoder through its whole toolbox: smooth gradients (predictor
transform), channel-correlated content (color transform), few-color cards
(color-indexing + pixel bundling), repeated tiles (LZ77 + color cache),
noise (plain literals), plus alpha variation and odd sizes.

Run: python3 tools/webp_golden.py  (writes the parquet; commit it)
"""
import ctypes

import pyarrow as pa
import pyarrow.parquet as pq

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


def encode(rgba, w, h):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0, "encode failed"
    data = bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    LIB.WebPFree(out)
    return data


def verify(webp, rgba, w, h):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(wi), ctypes.byref(hi))
    assert p and (wi.value, hi.value) == (w, h)
    n = w * h * 4
    back = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    LIB.WebPFree(p)
    assert back == bytes(rgba), "encoder was not lossless?!"


# ---- deterministic cards (formulas restated in Vp8lSpec.scala) ----

def card(name, w, h, f):
    rgba = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r, g, b, a = f(x, y)
            i = 4 * (y * w + x)
            rgba[i:i + 4] = bytes((r & 0xff, g & 0xff, b & 0xff, a & 0xff))
    return name, w, h, rgba


def cards():
    yield card("gradient", 96, 64, lambda x, y: (
        x * 2 + y, (x + y * 2) // 2, 255 - x - y // 2, 255))
    yield card("correlated", 80, 60, lambda x, y: (
        (x * 3 + y) & 0xff, ((x * 3 + y) // 2 + 40) & 0xff,
        ((x * 3 + y) // 3 + 90) & 0xff, 255))
    yield card("palette4", 64, 64, lambda x, y: [
        (0, 0, 0, 255), (255, 0, 0, 255), (0, 255, 0, 255),
        (0, 0, 255, 255)][((x // 8) + (y // 8)) % 4])
    yield card("palette13", 52, 39, lambda x, y: [
        (k * 19, 255 - k * 17, (k * k * 7) % 256, 255)
        for k in range(13)][(x // 4 + y // 3) % 13])
    yield card("tiles", 72, 48, lambda x, y: (
        (x % 12) * 21, (y % 8) * 31, ((x % 12) + (y % 8)) * 11, 255))
    yield card("noise", 48, 48, lambda x, y: (
        (x * 2654435761 + y * 40503) >> 7 & 0xff,
        (x * 40503 + y * 2654435761) >> 9 & 0xff,
        (x * y * 2246822519 + 7) >> 5 & 0xff, 255))
    yield card("constant", 40, 30, lambda x, y: (120, 200, 40, 255))
    # alpha stays >= 40: the default encoder config (exact=0) rewrites RGB
    # under fully-transparent pixels, which would break the known-pixels
    # contract
    yield card("alpha_ramp", 33, 21, lambda x, y: (
        x * 7 & 0xff, y * 11 & 0xff, 60, 40 + (x * 7 + y) % 216))
    yield card("tiny", 1, 1, lambda x, y: (9, 201, 77, 255))
    yield card("wide", 300, 3, lambda x, y: (
        x & 0xff, (x >> 1) & 0xff, (x * 3 + y) & 0xff, 255))
    yield card("tall", 3, 300, lambda x, y: (
        y & 0xff, (y * 5 + x) & 0xff, (y >> 2) & 0xff, 255))
    yield card("text_like", 120, 40, lambda x, y: (
        (0, 0, 0, 255) if ((x * 7919 + y * 104729 + (x // 3) * (y // 5))
                           % 11) < 3 else (250, 250, 245, 255)))

    # large mixed-region card: smooth sky / noisy texture / flat block /
    # repeated tiles in quadrants — steers the encoder into meta-prefix
    # groups (per-region entropy codes) and the color cache
    def mixed(x, y):
        if x < 200 and y < 150:
            return (x + y // 2, 120 + y // 3, 200 - x // 4, 255)
        if x >= 200 and y < 150:
            h = (x * 2654435761 + y * 2246822519) >> 8
            return (h & 0xff, (h >> 8) & 0xff, (h >> 16) & 0xff, 255)
        if x < 200:
            return (30, 160, 90, 255)
        return ((x % 16) * 15, (y % 16) * 15, ((x + y) % 16) * 15, 255)
    yield card("mixed_regions", 400, 300, mixed)


def main():
    names, ws, hs, webps, rgbas = [], [], [], [], []
    for name, w, h, rgba in cards():
        data = encode(rgba, w, h)
        verify(data, rgba, w, h)
        names.append(name)
        ws.append(w)
        hs.append(h)
        webps.append(data)
        rgbas.append(bytes(rgba))
        print(f"{name}: {w}x{h} -> {len(data)} bytes")
    t = pa.table({
        "name": pa.array(names, pa.string()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "webp": pa.array(webps, pa.binary()),
        "rgba": pa.array(rgbas, pa.binary()),
    })
    pq.write_table(t, "fixtures/webp_golden.parquet")
    print("wrote fixtures/webp_golden.parquet")


if __name__ == "__main__":
    main()
