"""Randomized matrix pin for the stdlib PNG decoder: an INDEPENDENT
forward-filter encoder lives in this test (the decoder only ever inverts
filters, so agreement is a two-implementation check, not a tautology),
and every legal (ctype, depth) × interlace combination decodes random
images — random sizes, random per-row filter types 0–4 — back to ground
truth. This is the coverage the fixed byte-literal fixtures can't give:
Paeth at bpp=8 (16-bit RGBA), Average on packed sub-byte rows, Adam7
pass geometry on awkward sizes, palettes under interlace."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from sparkstreaming_gmall_scala_spark.operators.multimodal import (
    _decode_png,
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_LEGAL = [
    (ctype, depth)
    for ctype, depths in {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }.items()
    for depth in depths
]
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
_SCALE = {1: 255, 2: 85, 4: 17}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _pack_row(pixels, depth, n_ch) -> bytes:
    """Pixels (tuples of raw sample ints) → packed scanline bytes."""
    if depth == 8:
        return bytes(s for px in pixels for s in px)
    if depth == 16:
        return b"".join(
            struct.pack(">H", s) for px in pixels for s in px
        )
    out = bytearray()
    acc = nbits = 0
    for px in pixels:
        acc = (acc << depth) | px[0]
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def _filter_row(raw: bytes, prior: bytes, bpp: int, ftype: int) -> bytes:
    """FORWARD filter (the encoder side the decoder never contains)."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _encode(img, depth, ctype, interlace, rng) -> bytes:
    """img: 2D list of per-pixel sample tuples (raw, pre-scaling)."""
    h, w = len(img), len(img[0])
    n_ch = _CHANNELS[ctype]
    bpp = max(1, depth * n_ch // 8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    idat = bytearray()
    for x0, y0, xs, ys in passes:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        prior = bytes((pw * depth * n_ch + 7) // 8)
        for r in range(ph):
            raw = _pack_row(
                [img[y0 + r * ys][x0 + c * xs] for c in range(pw)],
                depth,
                n_ch,
            )
            ftype = rng.randrange(5)
            idat += bytes([ftype]) + _filter_row(raw, prior, bpp, ftype)
            prior = raw
    extra = b""
    if ctype == 3:
        n_entries = 1 << depth
        plte = bytes(
            rng.randrange(256) for _ in range(3 * n_entries)
        )
        extra = _chunk(b"PLTE", plte)
        _encode.last_plte = plte
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace),
        )
        + extra
        + _chunk(b"IDAT", zlib.compress(bytes(idat)))
        + _chunk(b"IEND", b"")
    )


def _expected(img, depth, ctype) -> bytes:
    out = bytearray()
    for row in img:
        for px in row:
            if ctype == 3:
                idx = px[0]
                out += _encode.last_plte[idx * 3 : idx * 3 + 3]
            elif depth == 16:
                out += bytes(s >> 8 for s in px)
            elif depth < 8:
                out.append(px[0] * _SCALE[depth])
            else:
                out += bytes(px)
    return bytes(out)


@pytest.mark.parametrize("ctype,depth", _LEGAL)
@pytest.mark.parametrize("interlace", [0, 1])
def test_random_images_decode_to_ground_truth(ctype, depth, interlace):
    rng = random.Random(1000 * ctype + 10 * depth + interlace)
    n_ch = _CHANNELS[ctype]
    top = (1 << depth) - 1
    for _ in range(3):
        w, h = rng.randrange(1, 13), rng.randrange(1, 13)
        img = [
            [
                tuple(rng.randrange(top + 1) for _ in range(n_ch))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        payload = _encode(img, depth, ctype, interlace, rng)
        assert _decode_png(payload) == _expected(img, depth, ctype), (
            ctype, depth, interlace, w, h,
        )
