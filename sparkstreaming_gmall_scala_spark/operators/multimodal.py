"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the (external) media libraries would touch whole
batches, never rows. Two formats decode stdlib-REAL in this container —
the full PNG spec (every legal depth/ctype/interlace combination) and
uncompressed-PCM WAV; formats that genuinely need PIL/librosa/av (JPEG,
MP3, MP4, …) stay behind a loud ``NotImplementedError`` with an
injected-decoder seam, and a deterministic fake path keeps the plumbing
(schema, batch shape, partitioning) testable end to end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Injected decoder signature: (payload bytes, mime) -> decoded content
#: bytes (raw pixels for images, PCM samples for audio, concatenated
#: frames for video). Runs inside the Arrow batch loop on executors.
Decoder = Callable[[bytes, str], bytes]


def to_binary_payload(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a column as the canonical multimodal shape:
    (id, payload binary, meta struct<n_bytes, mime>)."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


#: Adam7 interlace pass geometry: (x_start, y_start, x_step, y_step).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

#: Sample scaling for sub-byte greyscale depths: v * (255 // (2^d − 1))
#: is exact (the PNG-spec bit-replication), so a depth-1 white pixel is
#: 255, a depth-4 0xF is 255 — content comparable across depth twins.
_SUBBYTE_SCALE = {1: 255, 2: 85, 4: 17}


def _unfilter(raw: bytes, pos: int, ph: int, stride: int, bpp: int):
    """Reverse the five standard scanline filters over one (sub-)image of
    ``ph`` rows × ``stride`` bytes starting at ``raw[pos]`` (each row is
    prefixed by its filter-type byte). Returns (rows, new_pos)."""
    rows = []
    prior = bytes(stride)
    for _ in range(ph):
        f, data = raw[pos], bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        for i in range(stride):
            a = data[i - bpp] if i >= bpp else 0
            b = prior[i]
            if f == 1:
                data[i] = (data[i] + a) & 0xFF
            elif f == 2:
                data[i] = (data[i] + b) & 0xFF
            elif f == 3:
                data[i] = (data[i] + ((a + b) >> 1)) & 0xFF
            elif f == 4:
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                data[i] = (data[i] + pred) & 0xFF
        prior = bytes(data)
        rows.append(bytes(data))
    return rows, pos


def _row_pixels(
    data: bytes, pw: int, depth: int, n_ch: int, ctype: int
) -> list[bytes]:
    """One defiltered scanline → per-pixel 8-bit sample bytes. 16-bit
    samples keep their high byte (the PIL I;16→L convention — exact for
    files that bit-replicated 8-bit content); sub-byte samples unpack
    MSB-first and greyscale ones scale by the spec's bit replication
    (palette indices stay raw)."""
    if depth == 8:
        return [data[px * n_ch : (px + 1) * n_ch] for px in range(pw)]
    if depth == 16:
        return [
            bytes(
                data[(px * n_ch + c) * 2] for c in range(n_ch)
            )
            for px in range(pw)
        ]
    scale = 1 if ctype == 3 else _SUBBYTE_SCALE[depth]
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    out = []
    for px in range(pw):
        byte = data[px // per_byte]
        shift = 8 - depth * (px % per_byte + 1)
        out.append(bytes([((byte >> shift) & mask) * scale]))
    return out


def _decode_png(payload: bytes) -> bytes:
    """Raw 8-bit pixel bytes from a PNG: zlib-inflate the IDAT stream,
    reverse the five standard scanline filters (None/Sub/Up/Average/
    Paeth) per (sub-)image, and normalize samples to 8-bit — pure
    stdlib, no PIL. Full spec coverage as of r12: greyscale (0), RGB
    (2), palette (3), grey+alpha (4) and RGBA (6) at every legal bit
    depth (1/2/4/8/16 grey, 8/16 color, 1/2/4/8 palette), Adam7
    interlace deinterleaved into scan order. Palette indices resolve
    through the PLTE table to RGB (RGBA when a tRNS chunk supplies
    alpha), sub-byte greys bit-replicate to 8-bit and 16-bit samples
    keep their high byte — so files carrying the same image at any
    depth/ctype/interlace combination decode to identical content
    bytes (pinned in tests/test_text_multimodal.py)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, idat = 8, []
    width = height = None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    legal_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    n_ch = None
    depth = ctype = interlace = None
    plte = trns = None
    while pos + 8 <= len(payload):
        (n,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + n]
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if ctype not in channels or depth not in legal_depths[ctype] \
                    or interlace not in (0, 1):
                raise ValueError(
                    f"illegal PNG depth={depth} color={ctype} "
                    f"interlace={interlace} combination (spec 11.2.2)"
                )
            n_ch = channels[ctype]
        elif tag == b"PLTE":
            if len(body) % 3 or not body:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + n
    if n_ch is None:
        raise ValueError("PNG missing IHDR")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = zlib.decompress(b"".join(idat))
    img: list[list[bytes | None]] = [
        [None] * width for _ in range(height)
    ]
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    rpos = 0
    bits_pp = depth * n_ch
    bpp = max(1, bits_pp // 8)
    for x0, y0, xs, ys in passes:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * bits_pp + 7) // 8
        rows, rpos = _unfilter(raw, rpos, ph, stride, bpp)
        for ri, data in enumerate(rows):
            for pi, px in enumerate(
                _row_pixels(data, pw, depth, n_ch, ctype)
            ):
                img[y0 + ri * ys][x0 + pi * xs] = px
    out = bytearray()
    for row_px in img:
        for px in row_px:
            if px is None:  # truncated IDAT left holes
                raise ValueError("PNG pixel data incomplete")
            out += px
    if ctype != 3:
        return bytes(out)
    # palette indexing: each defiltered byte is a PLTE index; emit RGB
    # (RGBA when tRNS supplies per-index alpha, 255 past its end — the
    # PNG spec default), so content matches the equivalent ctype-2/6 file
    n_entries = len(plte) // 3
    px = bytearray()
    for idx in out:
        if idx >= n_entries:
            raise ValueError(f"palette index {idx} outside PLTE({n_entries})")
        px += plte[idx * 3 : idx * 3 + 3]
        if trns is not None:
            px.append(trns[idx] if idx < len(trns) else 255)
    return bytes(px)


def _decode_wav(payload: bytes) -> bytes:
    """PCM frame bytes from an uncompressed WAV via the stdlib ``wave``
    module (unknown trailing chunks skipped per the RIFF contract);
    compressed codecs raise ``wave.Error`` — those need librosa/av."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        return wf.readframes(wf.getnframes())


def encode_png_grey(content: bytes) -> bytes:
    """Encode arbitrary bytes as a 1×N 8-bit greyscale PNG (stdlib zlib;
    one filter-0 scanline) — the deterministic inverse of
    :func:`_decode_png` for this shape, used to exercise the full
    binary-column round trip without external imaging libs."""
    import struct
    import zlib

    if not content:
        raise ValueError("PNG requires at least one pixel")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", len(content), 1, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" + content))
        + chunk(b"IEND", b"")
    )


def to_png_payload(media: DataFrame, id_col: str) -> DataFrame:
    """Re-encode every payload as a 1×N greyscale PNG (stdlib encoder,
    executor-side) — gives downstream stages a REAL container format to
    decode, so the binary-column plumbing is exercised with actual codec
    bytes rather than pass-through text. Empty payloads must be filtered
    upstream (a 0×1 PNG is invalid)."""
    out_schema = (
        f"{id_col} long, payload binary, "
        "meta struct<n_bytes: bigint, mime: string>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            enc = [encode_png_grey(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": enc,
                    "meta": [
                        {"n_bytes": len(b), "mime": "image/png"} for b in enc
                    ],
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def content_digest(
    media: DataFrame, id_col: str, decoder: Decoder | None = None
) -> DataFrame:
    """(id, n_bytes, content_md5) over the DECODED payload — the
    oracle-friendly content fingerprint (md5 is computable by any engine
    from the pre-encode source, so a round trip through a real container
    format is exact-value checkable). Decoder contract as in
    :func:`extract_features`; default :func:`decode_media`."""
    import hashlib

    dec = decoder if decoder is not None else decode_media
    out_schema = f"{id_col} long, n_bytes long, content_md5 string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mimes = (
                pdf["meta"].map(lambda m: m["mime"])
                if "meta" in pdf.columns
                else pd.Series(
                    ["application/octet-stream"] * len(pdf), index=pdf.index
                )
            )
            decoded = [
                dec(b, m) for b, m in zip(pdf["payload"], mimes)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(
                        [len(b) for b in decoded], index=pdf.index
                    ).astype("int64"),
                    "content_md5": [
                        hashlib.md5(b).hexdigest() for b in decoded
                    ],
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode a media payload to its CONTENT bytes (raw pixels / PCM
    samples). Stdlib-real for the two formats Python decodes without
    external libs — PNG (zlib + defilter) and uncompressed WAV (wave) —
    so the binary → decode → features → dedup path runs end-to-end in
    this container; every other format (JPEG, MP3, MP4, …) needs
    PIL/librosa/av, absent from this image, and raises. On a cluster
    with those libs, either swap this body or inject a decoder callable
    via ``extract_features(..., decoder=...)`` — same signature."""
    if mime == "image/png":
        return _decode_png(payload)
    if mime in ("audio/wav", "audio/x-wav"):
        return _decode_wav(payload)
    raise NotImplementedError(
        f"decoding {mime} requires media libs not present in this image; "
        "inject a decoder callable (see extract_features)"
    )


def extract_features(
    media: DataFrame,
    id_col: str,
    deterministic_fake: bool = True,
    decoder: Decoder | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    With ``deterministic_fake`` (and no ``decoder``) the 'features' are
    cheap exact functions of the raw bytes (length, first byte, byte sum
    mod 2^31) so the pipeline is testable end-to-end without media libs.

    ``decoder`` injects a real decoder callable (payload, mime) -> bytes;
    it runs inside the Arrow batch loop and the features fingerprint the
    DECODED content (pixels / PCM samples), not the container bytes — two
    files whose containers differ (compression level, metadata chunks)
    but whose content matches produce identical feature rows, which is
    exactly what content-level media dedup needs. The mime threads from
    the ``meta`` struct when present. Without an injected decoder,
    ``deterministic_fake=False`` falls back to :func:`decode_media` (the
    environment stub that raises until real codecs exist on the cluster).
    """
    # All-BIGINT output: the correctness oracle's value-hash is
    # type-sensitive, and DuckDB arithmetic lands on BIGINT — int32 here
    # would match values but fail the hash.
    out_schema = f"{id_col} long, n_bytes long, first_byte long, byte_sum long"
    dec = decoder
    if dec is None and not deterministic_fake:
        dec = decode_media

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if dec is not None:
                if "meta" in pdf.columns:
                    mimes = pdf["meta"].map(
                        lambda m: m["mime"] if m is not None else
                        "application/octet-stream"
                    )
                else:
                    mimes = pd.Series(
                        ["application/octet-stream"] * len(pdf),
                        index=pdf.index,
                    )
                payloads = pd.Series(
                    [dec(b, m) for b, m in zip(payloads, mimes)],
                    index=pdf.index,
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "byte_sum": payloads.map(lambda b: sum(b) % 2147483647).astype(
                        "int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def resize_payload(
    media: DataFrame, id_col: str, target_bytes: int
) -> DataFrame:
    """Resize every payload to exactly ``target_bytes`` — the media-agnostic
    stand-in for image resize / audio resample: truncate long payloads,
    cycle-repeat short ones (deterministic fake; a real resampler drops
    into the same Arrow batch shape). Emits the resized payload plus
    integrity scalars (n_bytes, checksum) so downstream stages and the
    oracle can verify without decoding."""
    out_schema = f"{id_col} long, payload binary, n_bytes long, checksum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize(b: bytes) -> bytes:
            if not b:
                return bytes(target_bytes)
            reps = -(-target_bytes // len(b))  # ceil division
            return (b * reps)[:target_bytes]

        for pdf in it:
            resized = pdf["payload"].map(resize)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "checksum": resized.map(
                        lambda b: sum(b) % 2147483647
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def frame_sample(media: DataFrame, id_col: str, stride: int) -> DataFrame:
    """Sample every ``stride``-th byte of the payload as a 'frame' — the
    plumbing shape of video frame-sampling (stride over the time axis);
    a real decoder swaps the byte stride for a frame stride with the
    identical batch signature. Emits frame count + integrity scalars."""
    out_schema = f"{id_col} long, n_frames long, first_frame long, frame_sum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = pdf["payload"].map(lambda b: b[::stride])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_frames": frames.map(len).astype("int64"),
                    "first_frame": frames.map(
                        lambda f: f[0] if len(f) else -1
                    ).astype("int64"),
                    "frame_sum": frames.map(
                        lambda f: sum(f) % 2147483647
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)
