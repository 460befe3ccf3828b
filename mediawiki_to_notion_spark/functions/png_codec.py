"""Pure-stdlib PNG codec (encode + decode) for the multimodal pipeline.

The container has no PIL/libvips, but PNG itself needs only ``zlib`` and
``struct``: a PNG is chunks (length/type/data/crc) wrapping a
zlib-compressed stream of filtered scanlines.  This module implements a
REAL codec for the common uncompressed-workflow subset:

- color types 0 (grayscale) and 2 (RGB), bit depth 8, non-interlaced;
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
- encode with a configurable per-row filter (so decode paths are
  exercised by round-trips, not just filter-0 files).

Reference: the PNG specification (RFC 2083 / W3C PNG), which is public.
Anything outside the subset (16-bit, palette, alpha, interlace) raises
``UnsupportedPNGError`` with the offending feature named — the honest
boundary where a full imaging library would take over
(reference parity: process-mw-dump.py:147-177 treats embedded media as
opaque files; here the decode stage becomes real for PNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour raster resize (the minimal real resample op,
    co-located with the raster codec): pixel-center mapping
    src = floor((dst + 0.5) * scale), the convention PIL NEAREST and
    OpenCV INTER_NEAREST share."""
    a = np.asarray(pixels)
    h, w = a.shape[:2]
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad target size {out_w}x{out_h}")
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
    return a[ys][:, xs]


class PNGError(ValueError):
    """Malformed PNG byte stream."""


class UnsupportedPNGError(PNGError):
    """Valid PNG using a feature outside this codec's subset."""


# ---------------------------------------------------------------------------
# encode


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array.

    ``filter_type`` 0-4 applies that PNG filter to every scanline —
    useful for exercising each decode path; 0 (None) is the default
    and what a throughput-oriented writer would emit."""
    a = np.asarray(pixels)
    if a.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {a.dtype}")
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w = a.shape[:2]
    bpp = channels

    raw = bytearray()
    prev = np.zeros((w, channels), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        raw.append(filter_type)
        raw.extend(_filter_row(row, prev, bpp, filter_type).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _filter_row(row: np.ndarray, prev: np.ndarray, bpp: int,
                ft: int) -> np.ndarray:
    cur = row.astype(np.int16)
    up = prev.astype(np.int16)
    left = np.zeros_like(cur)
    left[1:] = cur[:-1]
    ul = np.zeros_like(up)
    ul[1:] = up[:-1]
    if ft == 0:
        out = cur
    elif ft == 1:
        out = cur - left
    elif ft == 2:
        out = cur - up
    elif ft == 3:
        out = cur - (left + up) // 2
    else:  # Paeth
        out = cur - _paeth(left, up, ul)
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# ---------------------------------------------------------------------------
# decode


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PNG bytes → (width, height, uint8 array (H, W[, 3])).

    Supports the encode subset plus any mix of per-row filters."""
    if data[:8] != _SIGNATURE:
        raise PNGError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PNGError("truncated chunk")
        crc_expect = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc_expect:
            raise PNGError(f"bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise UnsupportedPNGError(f"bit depth {depth} (only 8)")
            if color_type not in (0, 2):
                raise UnsupportedPNGError(
                    f"color type {color_type} (only 0=gray, 2=RGB)"
                )
            if interlace != 0:
                raise UnsupportedPNGError("interlaced (Adam7) PNG")
            if comp != 0 or filt != 0:
                raise PNGError("nonstandard compression/filter method")
            channels = 1 if color_type == 0 else 3
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PNGError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PNGError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.empty((height, width, channels), dtype=np.uint8)
    prev = np.zeros((width, channels), dtype=np.int16)
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).reshape(width, channels).astype(np.int16)
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-referencing filters are inherently sequential per row
            cur = np.empty_like(row)
            for x in range(width):
                left = cur[x - 1] if x else np.zeros(channels, dtype=np.int16)
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(channels, dtype=np.int16)
                if ft == 1:
                    cur[x] = (row[x] + left) % 256
                elif ft == 3:
                    cur[x] = (row[x] + (left + up) // 2) % 256
                else:
                    cur[x] = (row[x] + _paeth(left, up, ul)) % 256
        else:
            raise PNGError(f"unknown scanline filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, out[:, :, 0] if channels == 1 else out
