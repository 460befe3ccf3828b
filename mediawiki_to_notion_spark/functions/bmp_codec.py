"""Pure-stdlib+numpy BMP (Windows DIB) codec for the multimodal
pipeline: BITMAPFILEHEADER + BITMAPINFOHEADER with uncompressed
BI_RGB pixel data at 8 (palette), 24, and 32 bits per pixel — the
layouts that cover essentially all real .bmp files.  Rows are 4-byte
aligned and stored bottom-up (negative heights = top-down, honored on
decode).  RLE and bitfield compressions raise ``UnsupportedBMPError``
by name."""

from __future__ import annotations

import struct

import numpy as np


class BMPError(ValueError):
    """Malformed BMP byte stream."""


class UnsupportedBMPError(BMPError):
    """Valid BMP using a feature outside this codec's subset."""


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (H, W, 3) RGB uint8 as 24-bit BI_RGB (the canonical
    interchange layout): BGR byte order, bottom-up, rows padded to 4
    bytes."""
    a = np.asarray(pixels)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + data


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode BMP bytes → (width, height, (H, W, 3) RGB uint8)."""
    if data[:2] != b"BM":
        raise BMPError("not a BMP: bad magic")
    if len(data) < 54:
        raise BMPError("truncated header")
    (_sz, _r1, _r2, off) = struct.unpack("<IHHI", data[2:14])
    (hdr_size, w, h, planes, bpp, comp) = struct.unpack(
        "<IiiHHI", data[14:34])
    if hdr_size < 40:
        raise UnsupportedBMPError(f"header size {hdr_size} (core/OS2)")
    if comp != 0:
        raise UnsupportedBMPError(f"compression {comp} (only BI_RGB)")
    if planes != 1:
        raise BMPError(f"bad plane count {planes}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise BMPError(f"bad dimensions {w}x{h}")
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off:pal_off + n_colors * 4], dtype=np.uint8)
        if len(pal) != n_colors * 4:
            raise BMPError("truncated palette")
        pal = pal.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        raw = np.frombuffer(data[off:off + stride * h], dtype=np.uint8)
        if len(raw) != stride * h:
            raise BMPError("truncated pixel data")
        idx = raw.reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= n_colors:
            raise BMPError("pixel index outside palette")
        rgb = pal[idx]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        raw = np.frombuffer(data[off:off + stride * h], dtype=np.uint8)
        if len(raw) != stride * h:
            raise BMPError("truncated pixel data")
        px = raw.reshape(h, stride)[:, :w * nb].reshape(h, w, nb)
        rgb = px[:, :, 2::-1]  # BGR(X) → RGB
    else:
        raise UnsupportedBMPError(f"{bpp} bpp (only 8/24/32)")
    if not top_down:
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)
