"""Pure-python image codecs (BMP + PNG here, baseline JPEG in
multimodal/jpeg.py) — the image half of the real multimodal decode
seam (≙ the reference's loader boundary, design.md:451-475).

No external libraries: BMP is a fixed header + raw BGR rows; PNG is
zlib (stdlib) + per-row filters; JPEG is the T.81 baseline chain
(canonical-Huffman entropy decode, dequant, zig-zag, 8x8 IDCT, YCbCr).
Supported: uncompressed 24/32-bit BMP (bottom-up or top-down),
non-interlaced 8-bit PNG in grayscale / RGB / RGBA / gray+alpha,
baseline sequential JPEG (4:4:4 / 4:2:0, restart intervals).
Anything else raises LoadError at the documented seam.

``decode_image`` returns the luminance plane as float64 in [0, 1] —
the fixed contract the feature extractor consumes (mirrors the audio
decoder's mono float signal). Encoders exist for round-trip tests and
as minimal sinks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from audio_feature_extraction_spark.core.errors import LoadError


def decode_image(payload: bytes) -> np.ndarray:
    """Image bytes -> (H, W) float64 luminance in [0, 1]."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        rgb = decode_png(payload)
    elif payload[:2] == b"BM":
        rgb = decode_bmp(payload)
    elif payload[:2] == b"\xff\xd8":
        from audio_feature_extraction_spark.multimodal.jpeg import decode_jpeg

        rgb = decode_jpeg(payload)
    else:
        raise LoadError("unsupported image format (PNG, BMP and baseline "
                        "JPEG decode here; WebP etc. need a codec library)")
    return rgb.mean(axis=2) / 255.0


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise LoadError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise LoadError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise LoadError(f"unsupported BMP: compression={compression} bpp={bpp}")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if len(payload) < need:
        raise LoadError("truncated BMP payload")
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1] if nch >= 3 else px)


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG -> (H, W, 3) uint8 RGB."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise LoadError("not a PNG payload")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise LoadError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0:
        raise LoadError(f"unsupported PNG: depth={depth} interlace={interlace}")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise LoadError(f"unsupported PNG color type {color}")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise LoadError(f"bad PNG zlib stream: {e}") from e
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise LoadError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.empty(stride, dtype=np.int32)
            pr = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = pr[x]
                if ft == 1:
                    cur[x] = (row[x] + a) & 0xFF
                elif ft == 3:
                    cur[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = pr[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise LoadError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    px = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # drop alpha


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


def encode_png(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> non-interlaced PNG (filter 0 rows)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
