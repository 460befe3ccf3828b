"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal pipeline.

A canonical WAV file is a RIFF container with an ``fmt `` chunk
describing PCM parameters and a ``data`` chunk of little-endian
samples — parseable with ``struct`` alone.  Supports integer PCM
(format tag 1) at 8/16/32-bit depths, any channel count and sample
rate; compressed formats (IEEE float, ADPCM, MP3-in-WAV) raise
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


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode (n,) mono or (n, channels) PCM samples (uint8/int16/int32)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels), got {a.shape}")
    if a.dtype == np.uint8:
        depth = 8
    elif a.dtype == np.int16:
        depth = 16
    elif a.dtype == np.int32:
        depth = 32
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    n, channels = a.shape
    block_align = channels * depth // 8
    byte_rate = sample_rate * block_align
    data = a.astype(_DEPTH_DTYPE[depth]).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, depth
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode WAV bytes → (sample_rate, channels, (n, channels) array)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WAVError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
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
        elif ctype == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WAVError("missing fmt or data chunk")
    tag, channels, sample_rate, _byte_rate, _block_align, depth = fmt
    if tag != 1:
        raise UnsupportedWAVError(f"format tag {tag} (only 1 = integer PCM)")
    if depth not in _DEPTH_DTYPE:
        raise UnsupportedWAVError(f"bit depth {depth} (only 8/16/32)")
    dtype = _DEPTH_DTYPE[depth]
    frame = channels * depth // 8
    n = len(raw) // frame
    samples = np.frombuffer(raw, dtype=dtype, count=n * channels) \
        .reshape(n, channels)
    return sample_rate, channels, samples
