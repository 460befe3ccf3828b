"""Pure-stdlib PNG codec (encode + decode) for the multimodal pipeline.

The container has no PIL/libvips, but PNG itself needs only ``zlib`` and
``struct``: a PNG is chunks (length/type/data/crc) wrapping a
zlib-compressed stream of filtered scanlines.  This module implements a
REAL codec for the common uncompressed-workflow subset:

As of r4 this covers the COMPLETE baseline PNG format:

- every color type — 0 (grayscale), 2 (RGB), 3 (palette, with
  optional tRNS alpha), 4 (gray+alpha), 6 (RGBA) — at every legal bit
  depth per the spec's table 11.1 (1/2/4/8/16 gray, 1/2/4/8 palette,
  8/16 for the multi-channel types; sub-byte gray decodes with the
  libpng bit-replication scaling to 8-bit);
- BOTH interlace methods: progressive (none) and Adam7 (the seven-pass
  sub-grid layout), encode and decode;
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode,
  applied at the BYTE level with the bytes-per-pixel distance the spec
  defines (one filter engine serves every depth — sub-byte rows filter
  on their packed scanline bytes with bpp=1 — and per Adam7 pass,
  where each sub-image filters independently);
- encode for types 0/2/4/6 by array shape ((H,W) / (H,W,3) / (H,W,2) /
  (H,W,4)) and dtype (uint8 → depth 8, uint16 → depth 16; ``depth=``
  1/2/4 packs sub-byte grayscale) with a configurable per-row filter
  (so decode paths are exercised by round-trips, not just filter-0
  files), plus ``encode_png_palette`` for type 3 at depths 1/2/4/8.

Reference: the PNG specification (RFC 2083 / W3C PNG), which is
public.  ``UnsupportedPNGError`` now only fires for unknown color
types (private extensions); illegal depth/type combinations and
unknown interlace methods are rejected as MALFORMED, matching the
spec's conformance language (reference parity:
process-mw-dump.py:147-177 treats embedded media as opaque files;
here the decode stage is real for all of PNG).  A tRNS chunk on color
types 0/2 (single transparent color) is valid PNG and is deliberately
ignored rather than rejected.
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


# array shape (last axis) → (IHDR color type, channel count)
_SHAPE_TO_COLOR_TYPE = {1: (0, 1), 2: (4, 2), 3: (2, 3), 4: (6, 4)}
_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray, filter_type: int = 0,
               interlace: bool = False, depth: int | None = None) -> bytes:
    """Encode an array by shape — (H, W) grayscale, (H, W, 2)
    gray+alpha, (H, W, 3) RGB, (H, W, 4) RGBA — and dtype: uint8
    encodes at bit depth 8, uint16 at depth 16 (big-endian samples,
    as the spec requires).  ``depth`` of 1/2/4 selects a sub-byte
    grayscale encoding (only for (H, W) uint8 input whose values fit
    the depth — the 1-bit B/W and 4-bit gray files common on the web).

    ``filter_type`` 0-4 applies that PNG filter to every scanline —
    useful for exercising each decode path; 0 (None) is the default
    and what a throughput-oriented writer would emit.  ``interlace``
    writes the seven-pass Adam7 layout."""
    a = np.asarray(pixels)
    if a.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"pixels must be uint8 or uint16, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _SHAPE_TO_COLOR_TYPE:
        raise ValueError(f"expected (H,W) or (H,W,{{2,3,4}}), got {a.shape}")
    color_type, channels = _SHAPE_TO_COLOR_TYPE[a.shape[2]]
    if depth in (1, 2, 4):
        if color_type != 0 or a.dtype != np.uint8:
            raise ValueError("sub-byte depth needs (H, W) uint8 grayscale")
        if a.max(initial=0) >= (1 << depth):
            raise ValueError(f"sample exceeds {depth}-bit range")
        return _encode_scanlines(a, 0, depth, filter_type,
                                 interlace=interlace)
    if depth not in (None, 8, 16):
        raise ValueError(f"bad depth {depth}")
    if a.dtype == np.uint16:
        # byte matrix (H, W, channels*2), big-endian sample order
        b = np.ascontiguousarray(a).astype(">u2").view(np.uint8)
        return _encode_scanlines(b, color_type, 16, filter_type,
                                 interlace=interlace)
    return _encode_scanlines(a, color_type, 8, filter_type,
                             interlace=interlace)


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    filter_type: int = 0,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Encode a color-type-3 PNG: ``indices`` is (H, W) uint8 palette
    indices, ``palette`` is (N, 3) uint8 RGB entries (N <= 256), and
    ``trns`` optionally gives per-entry alpha (its length may be
    shorter than the palette — trailing entries default opaque, as the
    spec allows).  ``depth`` 1/2/4 packs indices sub-byte (the tiny
    icon/favicon layout); indices must fit the depth."""
    idx = np.asarray(indices)
    pal = np.asarray(palette)
    if idx.dtype != np.uint8 or idx.ndim != 2:
        raise ValueError(f"indices must be (H,W) uint8, got {idx.shape}")
    if pal.dtype != np.uint8 or pal.ndim != 2 or pal.shape[1] != 3 \
            or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (N<=256, 3) uint8, got {pal.shape}")
    if idx.max(initial=0) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette depth must be 1/2/4/8, got {depth}")
    if depth < 8 and idx.max(initial=0) >= (1 << depth):
        raise ValueError(f"index exceeds {depth}-bit range")
    extra = _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        t = np.asarray(trns)
        if t.dtype != np.uint8 or t.ndim != 1 or len(t) > pal.shape[0]:
            raise ValueError("trns must be uint8, at most one per entry")
        extra += _chunk(b"tRNS", t.tobytes())
    return _encode_scanlines(idx[:, :, None], 3, depth, filter_type, extra,
                             interlace=interlace)


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# per-color-type legal bit depths (PNG spec, table 11.1)
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

# hostile-input ceiling: decode allocations scale with header-declared
# dimensions, so cap total pixels (64 MP covers any sane corpus image)
MAX_PIXELS = 1 << 26


def _expected_stream_bytes(width: int, height: int, channels: int,
                           depth: int, interlace: int) -> int:
    """Exact size of the filtered scanline stream — the inflate bound."""

    def image_bytes(w, h):
        if w == 0 or h == 0:
            return 0
        return h * (1 + (w * channels * depth + 7) // 8)

    if not interlace:
        return image_bytes(width, height)
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        total += image_bytes((width - x0 + dx - 1) // dx,
                             (height - y0 + dy - 1) // dy)
    return total


def _pack_samples(a: np.ndarray, depth: int) -> np.ndarray:
    """(H, W, 1) sub-byte samples → (H, stride, 1) packed scanline
    bytes, depth bits per sample MSB-first, rows padded to a byte
    boundary (the spec's packing)."""
    h, w = a.shape[:2]
    bits = np.unpackbits(a[:, :, 0][:, :, None], axis=2)[:, :, 8 - depth:]
    bits = bits.reshape(h, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)[:, :, None]


def _unpack_samples(b: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(H, stride, 1) packed scanline bytes → (H, width, 1) samples."""
    h = b.shape[0]
    bits = np.unpackbits(b[:, :, 0], axis=1)[:, :width * depth]
    bits = bits.reshape(h, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2).astype(np.uint8)[:, :, None]


def _filter_image(a: np.ndarray, filter_type: int) -> bytearray:
    """Filter one (sub-)image's scanlines: ``a`` is an (H, W, bpp) BYTE
    matrix; each pass/image starts with a zero 'previous row' as the
    spec requires."""
    raw = bytearray()
    prev = np.zeros(a.shape[1:], dtype=np.uint8)
    for y in range(a.shape[0]):
        row = a[y]
        raw.append(filter_type)
        raw.extend(_filter_row(row, prev, filter_type).tobytes())
        prev = row
    return raw


def _encode_scanlines(a: np.ndarray, color_type: int, depth: int,
                      filter_type: int, extra_chunks: bytes = b"",
                      interlace: bool = False) -> bytes:
    """``a`` is the (H, W, bpp) BYTE matrix of the image at depths
    8/16 (one row of ``bpp`` bytes per pixel: channels at depth 8,
    channels*2 big-endian at depth 16) or the (H, W, 1) SAMPLE matrix
    at sub-byte depths (packed per scanline just before filtering).
    The spec's filters operate on exactly the byte view: 'left' is the
    byte bpp positions earlier.  With ``interlace`` the seven Adam7
    sub-images are packed and filtered independently in pass order."""
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w = a.shape[:2]

    def to_bytes(sub: np.ndarray) -> np.ndarray:
        return _pack_samples(sub, depth) if depth < 8 else sub

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes NO bytes (spec)
            raw += _filter_image(to_bytes(sub), filter_type)
    else:
        raw = _filter_image(to_bytes(a), filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra_chunks
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _filter_row(row: np.ndarray, prev: np.ndarray, ft: int) -> np.ndarray:
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


def _unfilter_image(raw: bytes, off: int, width: int, height: int,
                    bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image of ``height`` scanlines of ``width``
    pixels x ``bpp`` bytes starting at ``raw[off]``; returns the
    (H, W, bpp) byte array and the offset just past the consumed
    bytes.  The 'previous row' starts at zero per image/pass."""
    stride = width * bpp
    if off + height * (stride + 1) > len(raw):
        raise PNGError("truncated image data")
    out = np.empty((height, width, bpp), dtype=np.uint8)
    prev = np.zeros((width, bpp), dtype=np.int16)
    for y in range(height):
        ft = raw[off]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).reshape(width, bpp).astype(np.int16)
        off += stride + 1
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-referencing filters are inherently sequential per row
            cur = np.empty_like(row)
            for x in range(width):
                left = cur[x - 1] if x else np.zeros(bpp, dtype=np.int16)
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(bpp, dtype=np.int16)
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
    return out, off


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# ---------------------------------------------------------------------------
# decode


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PNG bytes → (width, height, pixel array).

    Output shape by color type: 0 → (H, W); 4 → (H, W, 2);
    2 / 3-without-tRNS → (H, W, 3); 6 / 3-with-tRNS → (H, W, 4).
    Dtype follows the file's bit depth: uint8 at depth 8, uint16 at
    depth 16.  Supports the encode subset plus any mix of per-row
    filters."""
    if data[:8] != _SIGNATURE:
        raise PNGError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = channels = None
    palette = None
    trns = None
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
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise UnsupportedPNGError(f"color type {color_type}")
            if depth not in (1, 2, 4, 8, 16):
                raise PNGError(f"bad bit depth {depth}")
            if depth not in _VALID_DEPTHS[color_type]:
                # e.g. palette at 16 or RGB at 4 — malformed per spec
                raise PNGError(
                    f"bit depth {depth} invalid for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise PNGError(f"unknown interlace method {interlace}")
            if comp != 0 or filt != 0:
                raise PNGError("nonstandard compression/filter method")
            channels = _COLOR_TYPE_CHANNELS[color_type]
        elif ctype == b"PLTE":
            if length % 3 != 0 or not 3 <= length <= 256 * 3:
                raise PNGError(f"bad PLTE length {length}")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            # palette alpha for type 3; for types 0/2 tRNS names a
            # single transparent color — valid, deliberately ignored
            if color_type == 3:
                if palette is None or length > len(palette):
                    raise PNGError("tRNS without/exceeding PLTE")
                trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PNGError("missing IHDR")
    if color_type == 3 and palette is None:
        raise PNGError("palette image missing PLTE")
    if width * height > MAX_PIXELS:
        # hostile-header guard: dimensions come from 8 attacker bytes,
        # and every allocation below scales with them — refuse before
        # touching memory (the decompression-bomb posture a 100 TB
        # media scan needs; one crafted row must not OOM an executor)
        raise PNGError(f"image too large ({width}x{height})")
    # bound the inflate by the exact expected stream size: a zlib bomb
    # (tiny IDAT → GB output) stops at the cap instead of allocating
    expected = _expected_stream_bytes(width, height, channels, depth,
                                      interlace)
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    while len(raw) <= expected and d.unconsumed_tail:
        raw += d.decompress(d.unconsumed_tail, expected + 1 - len(raw))
    if len(raw) > expected:
        raise PNGError("decompressed data exceeds expected size")
    # bytes per pixel (the filter distance): sub-byte depths filter on
    # whole scanline bytes with bpp = 1, per the spec
    bpp = max(1, channels * (depth // 8))

    def read_subimage(raw, off, w_px, h_px):
        """Unfilter one (sub-)image → ((h, w, bpp) array, new offset);
        sub-byte rows unfilter as ceil(w*depth/8) byte columns, then
        unpack to one sample byte per pixel."""
        if depth >= 8:
            return _unfilter_image(raw, off, w_px, h_px, bpp)
        stride = (w_px * depth + 7) // 8
        packed, off = _unfilter_image(raw, off, stride, h_px, 1)
        return _unpack_samples(packed, w_px, depth), off

    if interlace:
        out = np.empty((height, width, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            if w_p == 0 or h_p == 0:
                continue  # empty pass has no bytes in the stream
            sub, off = read_subimage(raw, off, w_p, h_p)
            out[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise PNGError(
                f"decompressed size {len(raw)} != expected {off}"
            )
    else:
        row_bytes = (width * channels * depth + 7) // 8
        if len(raw) != height * (row_bytes + 1):
            raise PNGError(
                f"decompressed size {len(raw)} != expected "
                f"{height * (row_bytes + 1)}"
            )
        out, _ = read_subimage(raw, 0, width, height)
    if depth < 8:
        if color_type == 0:
            # bit-replication scaling to 8-bit (17/85/255 factors are
            # exact: 0..2^d-1 maps onto 0..255 like libpng/PIL)
            return width, height, (out[:, :, 0]
                                   * (255 // ((1 << depth) - 1))
                                   ).astype(np.uint8)
        # color type 3: fall through to the palette mapping below
    if depth == 16:
        # reassemble big-endian sample pairs → native uint16 (H, W, C)
        out16 = out.reshape(height, width, channels, 2)
        px = (out16[..., 0].astype(np.uint16) << 8) | out16[..., 1]
        return width, height, px[:, :, 0] if color_type == 0 else px
    if color_type == 3:
        idx = out[:, :, 0]
        if idx.max(initial=0) >= len(palette):
            raise PNGError("palette index out of range")
        rgb = palette[idx]  # (H, W, 3)
        if trns is None:
            return width, height, rgb
        # spec: entries beyond the tRNS array are fully opaque
        alpha_lut = np.full(len(palette), 255, dtype=np.uint8)
        alpha_lut[:len(trns)] = trns
        return width, height, np.dstack([rgb, alpha_lut[idx]])
    if color_type == 0:
        return width, height, out[:, :, 0]
    return width, height, out
