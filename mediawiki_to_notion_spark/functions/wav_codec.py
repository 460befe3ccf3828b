"""Pure-stdlib WAV (RIFF) codec for the multimodal pipeline.

A canonical WAV file is a RIFF container with an ``fmt `` chunk
describing sample parameters and a ``data`` chunk of little-endian
samples — parseable with ``struct`` alone.  As of r4 this covers the
real-world WAV surface:

- integer PCM (format tag 1) at 8/16/24/32-bit depths (24-bit is the
  packed 3-byte studio layout, sign-extended to int32 on decode);
- IEEE float (format tag 3) at 32/64-bit;
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping either of the above —
  the layout writers use for >2 channels or 24-bit — resolved via the
  SubFormat GUID;
- any channel count and sample rate;
- late-r5: G.711 A-law (tag 6) and μ-law (tag 7) telephony WAVs,
  decoded through the shared ITU companding tables in
  ``functions.au_codec``.

Remaining compressed formats (ADPCM, MP3-in-WAV, …) raise
``UnsupportedWAVError`` naming the tag — the honest boundary where a
full audio library would take over."""

from __future__ import annotations

import struct

import numpy as np


class WAVError(ValueError):
    """Malformed WAV byte stream."""


class UnsupportedWAVError(WAVError):
    """Valid WAV using a feature outside this codec's subset."""


_DEPTH_DTYPE = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPE = {32: np.dtype("<f4"), 64: np.dtype("<f8")}
# the KSDATAFORMAT_SUBTYPE_* GUID tail shared by PCM and IEEE-float:
# the 16-byte GUID {xxxx0000-0000-0010-8000-00AA00389B71} minus its
# leading 2-byte format tag (Data1 low word, little-endian)
_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               depth: int | None = None) -> bytes:
    """Encode (n,) mono or (n, channels) samples.  dtype selects the
    format: uint8/int16/int32 → integer PCM (tag 1) at 8/16/32 bits,
    float32/float64 → IEEE float (tag 3).  ``depth=24`` packs int32
    input (whose values must fit 24 bits) as 3-byte PCM."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels), got {a.shape}")
    n, channels = a.shape
    if depth == 24:
        if a.dtype != np.int32:
            raise ValueError("depth=24 needs int32 samples")
        if a.size and (a.max() >= 1 << 23 or a.min() < -(1 << 23)):
            raise ValueError("sample exceeds 24-bit range")
        u = (a.astype(np.int64) & 0xFFFFFF).astype("<u4")
        b = u.view(np.uint8).reshape(n, channels, 4)[:, :, :3]
        data = np.ascontiguousarray(b).tobytes()
        tag, bits = 1, 24
    elif a.dtype == np.uint8:
        tag, bits, data = 1, 8, a.tobytes()
    elif a.dtype == np.int16:
        tag, bits, data = 1, 16, a.astype("<i2").tobytes()
    elif a.dtype == np.int32:
        tag, bits, data = 1, 32, a.astype("<i4").tobytes()
    elif a.dtype == np.float32:
        tag, bits, data = 3, 32, a.astype("<f4").tobytes()
    elif a.dtype == np.float64:
        tag, bits, data = 3, 64, a.astype("<f8").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    if depth is not None and depth != bits:
        raise ValueError(f"depth {depth} conflicts with dtype {a.dtype}")
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, byte_rate, block_align, bits
    )
    pad = b"\x00" if len(data) & 1 else b""  # chunks are word-aligned
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _resolve_extensible(body: bytes, length: int) -> int:
    """WAVE_FORMAT_EXTENSIBLE: the real format lives in the first two
    bytes of the 16-byte SubFormat GUID; the tail must be the standard
    media-subtype GUID."""
    if length < 40:
        raise WAVError("extensible fmt chunk too short")
    sub = body[24:40]
    if sub[2:] != _GUID_TAIL:
        raise UnsupportedWAVError(f"unknown SubFormat GUID {sub.hex()}")
    return struct.unpack("<H", sub[:2])[0]


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode WAV bytes → (sample_rate, channels, (n, channels) array).
    Integer PCM decodes to uint8/int16/int32 (24-bit sign-extends into
    int32); IEEE float to float32/float64."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WAVError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    fmt_body = b""
    fmt_len = 0
    raw = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise WAVError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            if length < 16:
                raise WAVError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body, fmt_len = body, length
        elif ctype == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WAVError("missing fmt or data chunk")
    tag, channels, sample_rate, _byte_rate, _block_align, depth = fmt
    if channels <= 0:
        raise WAVError(f"bad channel count {channels}")
    if tag == 0xFFFE:
        tag = _resolve_extensible(fmt_body, fmt_len)
    if tag == 1:
        if depth == 24:
            frame = channels * 3
            n = len(raw) // frame
            b = np.frombuffer(raw, dtype=np.uint8, count=n * channels * 3) \
                .reshape(n, channels, 3).astype(np.int32)
            v = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
            samples = np.where(v >= 1 << 23, v - (1 << 24), v) \
                .astype(np.int32)
            return sample_rate, channels, samples
        if depth not in _DEPTH_DTYPE:
            raise UnsupportedWAVError(
                f"bit depth {depth} (only 8/16/24/32 PCM)"
            )
        dtype = _DEPTH_DTYPE[depth]
    elif tag == 3:
        if depth not in _FLOAT_DTYPE:
            raise WAVError(f"bit depth {depth} invalid for IEEE float")
        dtype = _FLOAT_DTYPE[depth]
    elif tag in (6, 7):  # WAVE_FORMAT_ALAW / WAVE_FORMAT_MULAW (G.711)
        if depth not in (0, 8):
            raise WAVError(f"bit depth {depth} invalid for G.711")
        from mediawiki_to_notion_spark.functions.au_codec import (
            _alaw_decode,
            _mulaw_decode,
        )

        n = len(raw) // channels
        codes = np.frombuffer(raw, dtype=np.uint8, count=n * channels)
        decoded = _alaw_decode(codes) if tag == 6 else _mulaw_decode(codes)
        return sample_rate, channels, decoded.reshape(n, channels)
    else:
        raise UnsupportedWAVError(
            f"format tag {tag} (1 = integer PCM, 3 = IEEE float, "
            "6/7 = G.711 A-law/mu-law are built in)"
        )
    frame = channels * depth // 8
    n = len(raw) // frame
    samples = np.frombuffer(raw, dtype=dtype, count=n * channels) \
        .reshape(n, channels)
    return sample_rate, channels, samples
