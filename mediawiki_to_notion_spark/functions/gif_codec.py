"""Pure-stdlib+numpy GIF codec for the multimodal pipeline.

Implements the GIF87a/89a format (the public W3C/CompuServe
specification): logical screen descriptor, global/local color tables,
variable-width LZW with clear/EOI codes and the 4096-entry dictionary
cap, data sub-block framing, the 4-pass row interlace, and the 89a
graphic-control extension (transparency index).

Encoder: palette-indexed frames (the native GIF model — quantizing
arbitrary RGB is a separate concern) → a single-frame GIF with a real
LZW compressor.  Decoder: first frame of any GIF (animated files
decode their first frame, the standard thumbnail/feature-extract
behavior), honoring local color tables, interlace, and transparency
(→ RGBA).  Reference parity: process-mw-dump.py:147-177 treats
embedded media as opaque files; here GIF decode becomes real.
"""

from __future__ import annotations

import struct

import numpy as np


class GIFError(ValueError):
    """Malformed GIF byte stream."""


# 4-pass interlace row schedule: (start, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

# hostile-input ceiling: frame/canvas allocations scale with the
# header-declared dimensions, so cap total pixels before allocating
MAX_PIXELS = 1 << 26


# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF-variant LZW: variable code width (min+1 .. 12), clear code
    resets the dictionary, EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    # bit reader: LSB-first within bytes (GIF's packing order)
    acc = 0
    nbits = 0
    pos = 0

    def init_dict():
        return {i: bytes([i]) for i in range(clear)}

    table = init_dict()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GIFError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = init_dict()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= next_code:
                raise GIFError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GIFError(f"LZW code {code} out of range")
        if n_out + len(entry) > n_expected:
            entry = entry[:n_expected - n_out]  # over-long final entry
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if n_out >= n_expected:
            break
    if n_out < n_expected:
        raise GIFError(f"LZW stream ended early ({n_out}/{n_expected})")
    return out


def _lzw_encode(samples: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for s in samples.tobytes():
        cur = prev + bytes([s])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([s])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# encode


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               transparent: int | None = None,
               interlace: bool = False) -> bytes:
    """Single-frame GIF89a from (H, W) uint8 palette indices and an
    (N, 3) uint8 palette (N <= 256); ``transparent`` marks one index
    transparent via a graphic-control extension."""
    idx = np.asarray(indices)
    pal = np.asarray(palette)
    if idx.dtype != np.uint8 or idx.ndim != 2:
        raise ValueError(f"indices must be (H,W) uint8, got {idx.shape}")
    if pal.dtype != np.uint8 or pal.ndim != 2 or pal.shape[1] != 3 \
            or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (N<=256, 3) uint8, got {pal.shape}")
    if idx.max(initial=0) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    # color table size field: 2**(field+1) entries
    field = max(1, (pal.shape[0] - 1).bit_length())
    n_entries = 1 << field
    table = np.zeros((n_entries, 3), dtype=np.uint8)
    table[:pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (field - 1), 0, 0)
    out += table.tobytes()
    if transparent is not None:
        if not 0 <= transparent < pal.shape[0]:
            raise ValueError("transparent index out of range")
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    if interlace:
        rows = [r for start, step in _INTERLACE
                for r in range(start, h, step)]
        samples = idx[rows].reshape(-1)
    else:
        samples = idx.reshape(-1)
    min_code = max(2, field)
    out.append(min_code)
    lzw = _lzw_encode(samples, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])  # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the FIRST frame → (width, height, uint8 (H, W, 3) RGB or
    (H, W, 4) RGBA when a transparency index is declared)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GIFError("not a GIF: bad signature")
    if len(data) < 13:
        raise GIFError("truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if sw * sh > MAX_PIXELS:
        raise GIFError(f"logical screen too large ({sw}x{sh})")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + n * 3], dtype=np.uint8)
        if len(gct) != n * 3:
            raise GIFError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += n * 3
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            raise GIFError("no image data before trailer")
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                raise GIFError("truncated extension")
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and pos < len(data) and data[pos] == 4:
                if pos + 5 > len(data):
                    raise GIFError("truncated extension")
                gce_flags = data[pos + 1]
                if gce_flags & 0x01:
                    transparent = data[pos + 4]
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1  # block terminator
            continue
        if b != 0x2C:
            raise GIFError(f"unexpected block 0x{b:02x}")
        if pos + 10 > len(data):
            raise GIFError("truncated image descriptor")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB",
                                                  data[pos + 1:pos + 10])
        if iw * ih > MAX_PIXELS:
            raise GIFError(f"frame too large ({iw}x{ih})")
        pos += 10
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data[pos:pos + n * 3], dtype=np.uint8)
            if len(lct) != n * 3:
                raise GIFError("truncated local color table")
            lct = lct.reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise GIFError("image with no color table")
        if pos >= len(data):
            raise GIFError("missing LZW code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise GIFError(f"bad LZW minimum code size {min_code}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            chunk = data[pos + 1:pos + 1 + n]
            if len(chunk) != n:
                raise GIFError("truncated image sub-block")
            lzw += chunk
            pos += 1 + n
        samples = _lzw_decode(bytes(lzw), min_code, iw * ih)
        if samples.max(initial=0) >= len(lct):
            raise GIFError("pixel index outside color table")
        if iflags & 0x40:  # interlaced: inverse of the 4-pass order
            rows = [r for start, step in _INTERLACE
                    for r in range(start, ih, step)]
            frame = np.empty((ih, iw), dtype=np.uint8)
            frame[rows] = samples.reshape(ih, iw)
        else:
            frame = samples.reshape(ih, iw)
        rgb = lct[frame]
        # place the frame on the logical screen (usually identical);
        # clip to the visible region — a corrupt descriptor may place
        # the frame partly or wholly off-screen (vis_* <= 0), which
        # must not escape as a numpy broadcast ValueError
        if (left, top, iw, ih) != (0, 0, sw, sh):
            vis_h = min(ih, sh - top)
            vis_w = min(iw, sw - left)
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if vis_h > 0 and vis_w > 0:
                canvas[top:top + vis_h, left:left + vis_w] = \
                    rgb[:vis_h, :vis_w]
            rgb = canvas
            if transparent is not None:
                a = np.zeros((sh, sw), dtype=np.uint8)
                if vis_h > 0 and vis_w > 0:
                    af = np.where(frame == transparent, 0, 255) \
                        .astype(np.uint8)
                    a[top:top + vis_h, left:left + vis_w] = \
                        af[:vis_h, :vis_w]
                return sw, sh, np.dstack([rgb, a])
            return sw, sh, rgb
        if transparent is not None:
            alpha = np.where(frame == transparent, 0, 255).astype(np.uint8)
            return sw, sh, np.dstack([rgb, alpha])
        return sw, sh, rgb
    raise GIFError("no image descriptor found")
