"""Pure-stdlib+numpy MJPEG-in-AVI video codec.

AVI is a RIFF container (the same chunk grammar as WAV): a ``hdrl``
LIST carries the main header (``avih``) and one stream header per
stream (``strl`` → ``strh``/``strf``), a ``movi`` LIST carries the
frame chunks (``00dc`` = stream 0, compressed video), and an optional
``idx1`` chunk indexes them.  In an MJPEG AVI every ``00dc`` payload
is a complete baseline JPEG image — no inter-frame state — so the
existing pure-numpy JPEG codec (functions.jpeg_codec) decodes each
frame independently and frame SAMPLING can skip entropy-decoding the
frames it doesn't keep.

This closes most of the repo's former "video decode" rejection: intra-
frame (MJPEG) video is now real end to end; inter-frame codecs
(H.26x/VP9/AV1) remain named rejections — their reference decoders
cannot be reproduced from the public spec with confidence in a
stdlib-only sandbox.

Layout follows the public RIFF/AVI documentation (msdn AVI RIFF File
Reference; OpenDML AVI extensions are not needed for the single-video-
stream files produced here).  Reference parity context: the reference
pipeline treats embedded media as opaque base64 payloads
(process-mw-dump.py:147-177); this codec is the north-star extension
that makes the video modality decodable.
"""

from __future__ import annotations

import struct

import numpy as np

from mediawiki_to_notion_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)


class AVIError(ValueError):
    """Malformed or unsupported AVI input."""


# decompression-bomb caps (the WAV/PNG/JPEG discipline): a hostile
# header may declare anything, so bound what we are willing to touch.
MAX_FRAMES = 4096
MAX_TOTAL_PIXELS = 1 << 28  # declared frames * width * height


def _u32(x: int) -> bytes:
    return struct.pack("<I", x)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """Encode RGB frames (each H x W x 3 uint8, identical shapes) as a
    single-stream MJPEG AVI: every frame is one baseline-JPEG ``00dc``
    chunk; an ``idx1`` index marks all frames as keyframes (true for
    MJPEG)."""
    if not frames:
        raise AVIError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise AVIError("frames differ in shape")
    if fps <= 0:
        raise AVIError(f"bad fps {fps}")
    # enforce the decode-side caps at encode time too: a valid encode
    # must roundtrip (encode(x) the decoder refuses is a bug, not a file)
    if len(frames) > MAX_FRAMES:
        raise AVIError(f"{len(frames)} frames > cap {MAX_FRAMES}")
    if len(frames) * w * h > MAX_TOTAL_PIXELS:
        raise AVIError("pixel volume exceeds cap")
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + _u32(len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,            # dwMicroSecPerFrame
        max(len(b) for b in blobs) * fps,  # dwMaxBytesPerSec (advisory)
        0,                           # dwPaddingGranularity
        0x10,                        # dwFlags: AVIF_HASINDEX
        len(blobs),                  # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        max(len(b) for b in blobs),  # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                  # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,                 # dwFlags, wPriority, wLanguage
            0,                       # dwInitialFrames
            1, fps,                  # dwScale, dwRate -> fps
            0, len(blobs),           # dwStart, dwLength (frames)
            max(len(b) for b in blobs),  # dwSuggestedBufferSize
            0, 0,                    # dwQuality, dwSampleSize
            0, 0, w, h,              # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        max(len(b) for b in blobs), 0, 0, 0, 0,
    )
    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)

    movi_parts: list[bytes] = []
    index_parts: list[bytes] = []
    movi_len = 0
    for b in blobs:
        # offset within the movi LIST data, counted from the list type
        # fourcc (the convention players expect)
        index_parts.append(b"00dc" + _u32(0x10) + _u32(4 + movi_len)
                           + _u32(len(b)))
        c = chunk(b"00dc", b)
        movi_parts.append(c)
        movi_len += len(c)
    movi = list_chunk(b"movi", b"".join(movi_parts))
    idx1 = chunk(b"idx1", b"".join(index_parts))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _u32(len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    run; validates bounds and even-byte padding."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise AVIError("chunk overruns container")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def probe_avi(data: bytes) -> tuple[int, int, int, int]:
    """Header-only metadata: (width, height, fps, n_frames).  Never
    touches frame bytes — the cheap first pass a 100 TB media scan
    runs before deciding what to decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AVIError(f"not an AVI (magic {data[:4]!r}/{data[8:12]!r})")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    avih = strh = None
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[start:start + 4] != b"hdrl":
            continue
        for fc2, s2, z2 in _iter_chunks(data, start + 4, start + size):
            if fc2 == b"avih" and z2 >= 40:
                avih = struct.unpack_from("<10I", data, s2)
            elif fc2 == b"LIST" and data[s2:s2 + 4] == b"strl":
                for fc3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                    if (fc3 == b"strh" and z3 >= 36
                            and data[s3:s3 + 4] == b"vids"):
                        if data[s3 + 4:s3 + 8] != b"MJPG":
                            raise AVIError(
                                "unsupported video codec "
                                f"{data[s3 + 4:s3 + 8]!r} (only MJPG)"
                            )
                        strh = struct.unpack_from("<IHHIIIII", data, s3 + 8)
        break
    if avih is None or strh is None:
        raise AVIError("missing avih/vids strh header")
    n_frames, width, height = avih[4], avih[8], avih[9]
    scale, rate = strh[4], strh[5]
    if scale <= 0 or rate <= 0:
        raise AVIError(f"bad rate/scale {rate}/{scale}")
    fps = rate // scale
    if n_frames > MAX_FRAMES:
        raise AVIError(f"declared {n_frames} frames > cap {MAX_FRAMES}")
    if n_frames * width * height > MAX_TOTAL_PIXELS:
        raise AVIError("declared pixel volume exceeds cap")
    return width, height, fps, n_frames


def decode_avi_mjpeg(
    data: bytes, frame_step: int = 1, strict_frame_count: bool = False,
) -> tuple[int, int, int, int, list[np.ndarray]]:
    """Decode an MJPEG AVI → (width, height, fps, n_frames, frames),
    keeping every ``frame_step``-th frame (frames 0, step, 2*step, …).
    Skipped frames are never entropy-decoded — intra-frame coding
    makes sampling O(kept frames), the property the frame-sample
    pipeline relies on.

    Real-world MJPEG AVIs (stream-copied / appended files) frequently
    carry a stale ``avih`` dwTotalFrames, so a header/movi disagreement
    is tolerated by default — the returned n_frames is the number of
    frame chunks actually seen.  ``strict_frame_count=True`` restores
    the hard check for the roundtrip-certificate path, where our own
    encoder guarantees agreement (ADVICE r5)."""
    if frame_step < 1:
        raise AVIError(f"bad frame_step {frame_step}")
    width, height, fps, n_declared = probe_avi(data)
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    frames: list[np.ndarray] = []
    n_seen = 0

    def eat_frame(s2: int, z2: int) -> None:
        nonlocal n_seen
        if n_seen >= MAX_FRAMES:
            raise AVIError("more frame chunks than the cap allows")
        # probe_avi capped pixel volume against the DECLARED count;
        # under the tolerant path the movi stream may be longer, so
        # re-enforce the bomb cap on frames actually seen.
        if (n_seen + 1) * width * height > MAX_TOTAL_PIXELS:
            raise AVIError("movi pixel volume exceeds cap")
        if n_seen % frame_step == 0:
            w, h, pix = decode_jpeg(data[s2:s2 + z2])
            if (w, h) != (width, height):
                raise AVIError(
                    f"frame {n_seen} is {w}x{h}, header says "
                    f"{width}x{height}"
                )
            frames.append(pix)
        n_seen += 1

    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[start:start + 4] != b"movi":
            continue
        for fc2, s2, z2 in _iter_chunks(data, start + 4, start + size):
            if fc2 in (b"00dc", b"00db"):
                eat_frame(s2, z2)
            elif fc2 == b"LIST" and data[s2:s2 + 4] == b"rec ":
                # VFW interleaved layout groups frame chunks inside
                # 'rec ' sub-lists of movi (one level deep per spec)
                for fc3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                    if fc3 in (b"00dc", b"00db"):
                        eat_frame(s3, z3)
        break
    if strict_frame_count and n_seen != n_declared:
        raise AVIError(
            f"header declares {n_declared} frames, movi has {n_seen}"
        )
    return width, height, fps, n_seen, frames
