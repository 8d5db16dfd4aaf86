#!/usr/bin/env python3
"""Generate fixtures/webp_anim_golden.parquet — animated WebP payloads in
the honest-decode subset (every frame full-canvas, no-blend, VP8L), with
per-frame expected RGBA.

Each frame's VP8L stream comes from the REAL libwebp lossless encoder over
generator-known pixels and is individually round-trip-verified against
libwebp's still decoder (RIFF-wrapped); the ANMF/ANIM container assembly
follows the public WebP container spec. Durations are per-frame
milliseconds. Rows: (name, width, height, n_frames, durations_ms,
webp blob, frame rgba blobs concatenated).

Also emits refusal rows: a sub-canvas frame, an alpha-BLEND frame, and a
lossy (VP8) frame — the decoder must take the metadata-only branch on
each.

Run: python3 tools/webp_anim_golden.py  (writes the parquet; commit it)
"""
import ctypes
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "tools")
from webp_probe import decode as still_decode

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


def le24(v):
    return bytes((v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff))


def le32(v):
    return v.to_bytes(4, "little")


def chunk(tag, body):
    pad = b"\x00" if len(body) % 2 else b""
    return tag + le32(len(body)) + body + pad


def encode_vp8l_chunk(rgba, w, h):
    """Encode with libwebp, verify the still round-trips, extract the
    VP8L chunk (header + payload) from the produced file."""
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0
    data = bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    LIB.WebPFree(out)
    r = still_decode(data)
    assert r and r[2] == bytes(rgba), "frame still-decode mismatch"
    # walk RIFF for the VP8L chunk
    i = 12
    while i + 8 <= len(data):
        tag = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        if tag == b"VP8L":
            return data[i:i + 8 + size + (size & 1)]
        i += 8 + size + (size & 1)
    raise AssertionError("no VP8L chunk in encoder output")


def anmf(x, y, w, h, dur_ms, payload, no_blend=True, dispose_bg=False):
    flags = (2 if no_blend else 0) | (1 if dispose_bg else 0)
    body = (le24(x // 2) + le24(y // 2) + le24(w - 1) + le24(h - 1) +
            le24(dur_ms) + bytes([flags]) + payload)
    return chunk(b"ANMF", body)


def vp8x(w, h, anim=True, alpha=False):
    flags = (0x02 if anim else 0) | (0x10 if alpha else 0)
    body = bytes([flags, 0, 0, 0]) + le24(w - 1) + le24(h - 1)
    return chunk(b"VP8X", body)


def anim_header(bg=0, loops=0):
    return chunk(b"ANIM", le32(bg) + loops.to_bytes(2, "little"))


def assemble(w, h, frames):
    body = vp8x(w, h) + anim_header() + b"".join(frames)
    return b"RIFF" + le32(4 + len(body)) + b"WEBP" + body


def frame_pixels(w, h, k):
    rgba = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            i = 4 * (y * w + x)
            rgba[i:i + 4] = bytes(((x * 3 + y + k * 41) & 0xff,
                                   (x + y * 2 + k * 17) & 0xff,
                                   (x * 2 + k * 71) & 0xff, 255))
    return bytes(rgba)


def main():
    rows = []
    w, h = 48, 32

    def anim_row(name, k0, durs, trim=0):
        frames, rgbas = [], []
        for j, d in enumerate(durs):
            rgba = frame_pixels(w, h, k0 + j + trim)
            frames.append(anmf(0, 0, w, h, d, encode_vp8l_chunk(rgba, w, h)))
            rgbas.append(rgba)
        rows.append((name, w, h, len(durs), list(durs),
                     assemble(w, h, frames), b"".join(rgbas)))

    # base animation and a trimmed twin (shares frames 1.. of the base —
    # the near-dup diagonal case), plus a variable-duration one
    anim_row("anim_base", 0, [100, 100, 100, 100, 100, 100])
    anim_row("anim_trim", 0, [100, 100, 100, 100, 100], trim=1)
    anim_row("anim_vardur", 50, [40, 250, 40, 500])
    anim_row("anim_single", 90, [120])

    # refusal rows: decoders must take the metadata-only branch
    sub = anmf(0, 0, w // 2, h, 100,
               encode_vp8l_chunk(frame_pixels(w // 2, h, 7), w // 2, h))
    rows.append(("refuse_subcanvas", w, h, 0, [],
                 assemble(w, h, [sub]), b""))
    blend = anmf(0, 0, w, h, 100,
                 encode_vp8l_chunk(frame_pixels(w, h, 8), w, h),
                 no_blend=False)
    rows.append(("refuse_blend", w, h, 0, [],
                 assemble(w, h, [blend]), b""))
    lossy = anmf(0, 0, w, h, 100,
                 chunk(b"VP8 ", b"\x00" * 26))
    rows.append(("refuse_lossy", w, h, 0, [],
                 assemble(w, h, [lossy]), b""))

    t = pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "width": pa.array([r[1] for r in rows], pa.int32()),
        "height": pa.array([r[2] for r in rows], pa.int32()),
        "n_frames": pa.array([r[3] for r in rows], pa.int32()),
        "durations_ms": pa.array([r[4] for r in rows],
                                 pa.list_(pa.int32())),
        "webp": pa.array([r[5] for r in rows], pa.binary()),
        "frames_rgba": pa.array([r[6] for r in rows], pa.binary()),
    })
    pq.write_table(t, "fixtures/webp_anim_golden.parquet")
    for r in rows:
        print(f"{r[0]}: {r[3]} frames, {len(r[5])} bytes")
    print("wrote fixtures/webp_anim_golden.parquet")


if __name__ == "__main__":
    main()
