"""Pure-stdlib+numpy AIFF codec: the big-endian IFF counterpart of
WAV (FORM/AIFF container, COMM chunk with an 80-bit extended-float
sample rate, SSND chunk of big-endian PCM).  Covers integer PCM at
8/16/24/32 bits, any channel count — i.e. the uncompressed .aiff
files Apple toolchains produce — plus the AIFC 'sowt' byte-swap
variant and (late-r5) AIFC G.711 'ulaw'/'alaw' companding via the
shared ITU tables in ``functions.au_codec``.  Other AIFC compressed
variants raise ``UnsupportedAIFFError`` by name."""

from __future__ import annotations

import struct

import numpy as np


class AIFFError(ValueError):
    """Malformed AIFF byte stream."""


class UnsupportedAIFFError(AIFFError):
    """Valid AIFF/AIFC using a feature outside this codec's subset."""


def _pack_extended(rate: int) -> bytes:
    """IEEE 754 80-bit extended float (the COMM sampleRate field)."""
    if rate <= 0:
        raise ValueError(f"bad sample rate {rate}")
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)  # explicit leading 1 in bit 63
    return struct.pack(">HQ", 16383 + exp, mant)


def _unpack_extended(b: bytes) -> int:
    se, mant = struct.unpack(">HQ", b)
    exp = (se & 0x7FFF) - 16383
    if se & 0x8000 or not 0 <= exp <= 62:
        raise AIFFError("unreasonable sample rate")
    return round(mant / (1 << (63 - exp)))


_DEPTH_DTYPE = {8: np.dtype(">i1"), 16: np.dtype(">i2"),
                32: np.dtype(">i4")}


def encode_aiff(samples: np.ndarray, sample_rate: int = 16000,
                depth: int | None = None) -> bytes:
    """Encode (n,) mono or (n, channels) signed PCM samples (int8 /
    int16 / int32; ``depth=24`` packs int32 input as 3-byte PCM)."""
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
        u = (a.astype(np.int64) & 0xFFFFFF).astype(">u4")
        data = np.ascontiguousarray(
            u.view(np.uint8).reshape(n, channels, 4)[:, :, 1:]).tobytes()
        bits = 24
    elif a.dtype == np.int8:
        bits, data = 8, a.astype(">i1").tobytes()
    elif a.dtype == np.int16:
        bits, data = 16, a.astype(">i2").tobytes()
    elif a.dtype == np.int32:
        bits, data = 32, a.astype(">i4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    if depth is not None and depth != bits:
        raise ValueError(f"depth {depth} conflicts with dtype {a.dtype}")
    comm = struct.pack(">hIh", channels, n, bits) + _pack_extended(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    out = b"COMM" + struct.pack(">I", len(comm)) + comm
    out += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        out += b"\x00"  # chunks are word-aligned
    body = b"AIFF" + out
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode AIFF bytes → (sample_rate, channels, (n, channels)
    array); 24-bit sign-extends into int32."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise AIFFError("not an AIFF: bad FORM header")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = None
    comp = b"NONE"
    raw = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack(">I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise AIFFError(f"truncated {ctype!r} chunk")
        if ctype == b"COMM":
            if length < 18:
                raise AIFFError("COMM chunk too short")
            channels, n_frames, bits = struct.unpack(">hIh", body[:8])
            rate = _unpack_extended(body[8:18])
            comm = (channels, n_frames, bits, rate)
            if is_aifc and length >= 22:
                comp = body[18:22]
        elif ctype == b"SSND":
            if length < 8:
                raise AIFFError("SSND chunk too short")
            (offset, _block) = struct.unpack(">II", body[:8])
            raw = body[8 + offset:]
        pos += 8 + length + (length & 1)
    if comm is None or raw is None:
        raise AIFFError("missing COMM or SSND chunk")
    channels, n_frames, bits, rate = comm
    if channels <= 0:
        raise AIFFError(f"bad channel count {channels}")
    if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        # AIFC G.711 companding: 8-bit codes (COMM still declares the
        # 16-bit decoded width), decoded via the shared ITU tables
        from mediawiki_to_notion_spark.functions.au_codec import (
            _alaw_decode,
            _mulaw_decode,
        )

        n = min(n_frames, len(raw) // channels)
        codes = np.frombuffer(raw, dtype=np.uint8, count=n * channels)
        dec = _mulaw_decode if comp in (b"ulaw", b"ULAW") else _alaw_decode
        return rate, channels, dec(codes).reshape(n, channels)
    if comp not in (b"NONE", b"sowt"):
        raise UnsupportedAIFFError(f"AIFC compression {comp!r}")
    little = comp == b"sowt"  # AIFC's byte-swapped PCM variant
    if bits == 24:
        frame = channels * 3
        n = min(n_frames, len(raw) // frame)
        b = np.frombuffer(raw, dtype=np.uint8, count=n * channels * 3) \
            .reshape(n, channels, 3).astype(np.int32)
        if little:
            v = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
        else:
            v = (b[:, :, 0] << 16) | (b[:, :, 1] << 8) | b[:, :, 2]
        samples = np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.int32)
        return rate, channels, samples
    if bits not in _DEPTH_DTYPE:
        raise UnsupportedAIFFError(f"bit depth {bits} (only 8/16/24/32)")
    dtype = _DEPTH_DTYPE[bits].newbyteorder("<") if little \
        else _DEPTH_DTYPE[bits]
    frame = channels * bits // 8
    n = min(n_frames, len(raw) // frame)
    samples = np.frombuffer(raw, dtype=dtype, count=n * channels) \
        .reshape(n, channels)
    return rate, channels, samples
