"""Pure-stdlib+numpy FLAC codec (decode: full fixed-blocking subframe
surface; encode: the fixed-predictor subset used for fixtures).

FLAC is the one compressed audio format whose reference behavior is
fully reproducible from the public specification (RFC 9639) without
perceptual tables: Rice/Golomb-coded residuals of fixed or LPC
predictors inside CRC-framed blocks.  Implementing it closes the
engine's "compressed audio" rejection down to perceptual-only codecs
(MP3/AAC/Opus — VERDICT r5 item 5).

Decoder coverage:
- STREAMINFO parse + metadata-block walk (all other block types
  skipped structurally);
- frames with fixed or variable blocking strategy, all block-size /
  sample-rate / sample-size header codes, CRC-8 header and CRC-16
  frame verification;
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (orders
  1-32, signed quantized coefficients + shift), wasted bits;
- residuals: 4-bit Rice and 5-bit Rice2 partitions (any partition
  order), escape partitions (raw n-bit residuals);
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries bps+1), plus 1-8 independent channels.

Encoder subset (fixture generator, same discipline as
``avi_codec.encode_avi_mjpeg``): independent channels, per-subframe
best of CONSTANT / FIXED orders 0-2, single-partition Rice with
exact cost search and raw-escape fallback.  Every valid encode obeys
the decoder's bomb caps and roundtrips bit-exactly (FLAC is
lossless), which the roundtrip certificate query checks by value.

Decompression-bomb caps mirror the other codecs: declared and decoded
sample volume, channel count, block size, and metadata walk lengths
are all bounded before any allocation.
"""

from __future__ import annotations

import struct

import numpy as np


class FLACError(ValueError):
    """Malformed FLAC byte stream."""


class UnsupportedFLACError(FLACError):
    """Valid FLAC using a feature outside this decoder's subset."""


MAX_SAMPLES = 1 << 26     # decoded samples x channels
MAX_CHANNELS = 8
MAX_BLOCK = 65535
MAX_META_BLOCKS = 64

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
              11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes | memoryview) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in bytes(data):
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes | memoryview) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in bytes(data):
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _BitReader:
    __slots__ = ("buf", "pos", "n")

    def __init__(self, buf: bytes, start_byte: int = 0):
        self.buf = buf
        self.pos = start_byte * 8
        self.n = len(buf) * 8

    def bits(self, k: int) -> int:
        p = self.pos
        q = p + k
        if q > self.n:
            raise FLACError("truncated stream")
        self.pos = q
        if k == 0:
            return 0
        b0 = p >> 3
        b1 = (q + 7) >> 3
        v = int.from_bytes(self.buf[b0:b1], "big")
        return (v >> ((b1 << 3) - q)) & ((1 << k) - 1)

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        p = self.pos
        n = self.n
        buf = self.buf
        count = 0
        while True:
            if p >= n:
                raise FLACError("truncated unary code")
            rem = 8 - (p & 7)
            chunk = buf[p >> 3] & ((1 << rem) - 1)
            if chunk == 0:
                count += rem
                p += rem
            else:
                lead = rem - chunk.bit_length()
                self.pos = p + lead + 1
                return count + lead

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise FLACError("unaligned byte position")
        return self.pos >> 3


def _coded_number(br: _BitReader) -> int:
    """The frame header's UTF-8-style coded frame/sample number
    (1-7 bytes, up to 36 bits)."""
    b = br.bits(8)
    if b < 0x80:
        return b
    n_follow = 0
    for i in range(1, 8):
        if (b >> (7 - i)) & 1 == 0:
            n_follow = i - 1
            break
    else:
        raise FLACError("bad coded-number prefix")
    if n_follow == 0 or n_follow > 6:
        raise FLACError("bad coded-number prefix")
    val = b & (0x7F >> (n_follow + 1))
    for _ in range(n_follow):
        c = br.bits(8)
        if c >> 6 != 0b10:
            raise FLACError("bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def probe_flac(data: bytes) -> tuple[int, int, int, int]:
    """Header-only STREAMINFO probe → (sample_rate, channels,
    bits_per_sample, total_samples).  Enforces the bomb caps without
    decoding any audio."""
    if data[:4] != b"fLaC":
        raise FLACError("not a FLAC stream (bad magic)")
    off = 4
    rate = channels = bps = total = None
    for i in range(MAX_META_BLOCKS + 1):
        if i == MAX_META_BLOCKS:
            raise FLACError("metadata block walk exceeds cap")
        if off + 4 > len(data):
            raise FLACError("truncated metadata header")
        hdr = int.from_bytes(data[off:off + 4], "big")
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        off += 4
        if off + blen > len(data):
            raise FLACError("truncated metadata block")
        if i == 0:
            if btype != 0 or blen != 34:
                raise FLACError("first metadata block must be STREAMINFO")
            si = data[off:off + 34]
            packed = int.from_bytes(si[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        elif btype == 0:
            raise FLACError("duplicate STREAMINFO")
        off += blen
        if last:
            break
    else:
        raise FLACError("unterminated metadata")
    if rate == 0 or rate > 1_048_575:
        raise FLACError(f"bad sample rate {rate}")
    if channels > MAX_CHANNELS:
        raise FLACError(f"{channels} channels > cap {MAX_CHANNELS}")
    if total * channels > MAX_SAMPLES:
        raise FLACError("declared sample volume exceeds cap")
    return rate, channels, bps, total


def _first_audio_byte(data: bytes) -> int:
    off = 4
    while True:
        hdr = int.from_bytes(data[off:off + 4], "big")
        last, blen = hdr >> 31, hdr & 0xFFFFFF
        off += 4 + blen
        if last:
            return off


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.bits(2)
    if method > 1:
        raise FLACError(f"reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise FLACError("block size not divisible by partition count")
    res: list[int] = []
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise FLACError("predictor order exceeds first partition")
        param = br.bits(pbits)
        if param == escape:
            rbits = br.bits(5)
            if rbits == 0:
                res.extend([0] * n)
            else:
                res.extend(br.sbits(rbits) for _ in range(n))
        else:
            bits = br.bits
            unary = br.unary
            for _ in range(n):
                u = (unary() << param) | bits(param)
                res.append((u >> 1) ^ -(u & 1))
    return res


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.bits(1):
        raise FLACError("subframe header padding bit set")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FLACError("wasted bits exceed sample size")
    if stype == 0:
        v = br.sbits(eff)
        out = [v] * blocksize
    elif stype == 1:
        sb = br.sbits
        out = [sb(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:
        order = stype - 8
        if order > blocksize:
            raise FLACError("fixed order exceeds block size")
        out = [br.sbits(eff) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            p = sum(c * out[order + i - 1 - j] for j, c in enumerate(coefs))
            out.append(r + p)
    elif stype >= 32:
        order = (stype & 31) + 1
        if order > blocksize:
            raise FLACError("LPC order exceeds block size")
        out = [br.sbits(eff) for _ in range(order)]
        prec = br.bits(4)
        if prec == 0b1111:
            raise FLACError("invalid LPC precision code")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise FLACError("negative LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for i, r in enumerate(res):
            acc = sum(c * out[order + i - 1 - j]
                      for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise FLACError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, channels, bits_per_sample,
    samples) with samples shaped (n, channels), dtype int32."""
    rate, channels, bps, total = probe_flac(data)
    start = _first_audio_byte(data)
    br = _BitReader(data, start)
    chans: list[list[int]] = [[] for _ in range(channels)]
    n_decoded = 0
    while br.pos + 16 <= br.n:
        frame_start = br.byte_pos()
        sync = br.bits(14)
        if sync != 0b11111111111110:
            raise FLACError(f"bad frame sync at byte {frame_start}")
        if br.bits(1):
            raise FLACError("reserved frame-header bit set")
        br.bits(1)  # blocking strategy (both handled uniformly)
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        if br.bits(1):
            raise FLACError("reserved frame-header bit set")
        _coded_number(br)
        if bs_code == 0:
            raise FLACError("reserved block-size code 0")
        elif bs_code == 6:
            blocksize = br.bits(8) + 1
        elif bs_code == 7:
            blocksize = br.bits(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise FLACError("invalid sample-rate code 15")
        if ss_code == 0b011:
            raise FLACError("reserved sample-size code")
        frame_bps = bps if ss_code == 0 else _BPS_CODE[ss_code]
        if frame_bps != bps:
            raise UnsupportedFLACError("per-frame bps override")
        if ch_code <= 7:
            n_ch, mode = ch_code + 1, "indep"
        elif ch_code == 8:
            n_ch, mode = 2, "left_side"
        elif ch_code == 9:
            n_ch, mode = 2, "right_side"
        elif ch_code == 10:
            n_ch, mode = 2, "mid_side"
        else:
            raise FLACError(f"reserved channel assignment {ch_code}")
        if n_ch != channels:
            raise FLACError("frame channel count != STREAMINFO")
        if blocksize > MAX_BLOCK:
            raise FLACError("block size exceeds cap")
        if (n_decoded + blocksize) * channels > MAX_SAMPLES:
            raise FLACError("decoded sample volume exceeds cap")
        hdr_end = (br.pos + 7) >> 3
        crc8 = br.bits(8)
        if crc8 != _crc8(data[frame_start:hdr_end]):
            raise FLACError("frame header CRC-8 mismatch")
        subs = []
        for ch in range(n_ch):
            ch_bps = frame_bps
            if (mode == "left_side" and ch == 1) or \
               (mode == "right_side" and ch == 0) or \
               (mode == "mid_side" and ch == 1):
                ch_bps += 1
            subs.append(_decode_subframe(br, blocksize, ch_bps))
        br.align()
        crc_pos = br.byte_pos()
        crc16 = br.bits(16)
        if crc16 != _crc16(data[frame_start:crc_pos]):
            raise FLACError("frame CRC-16 mismatch")
        if mode == "left_side":
            left = subs[0]
            subs = [left, [l - s for l, s in zip(left, subs[1])]]
        elif mode == "right_side":
            right = subs[1]
            subs = [[s + r for s, r in zip(subs[0], right)], right]
        elif mode == "mid_side":
            mid, side = subs[0], subs[1]
            left = [(((m << 1) | (s & 1)) + s) >> 1
                    for m, s in zip(mid, side)]
            right = [(((m << 1) | (s & 1)) - s) >> 1
                     for m, s in zip(mid, side)]
            subs = [left, right]
        for ch in range(channels):
            chans[ch].extend(subs[ch])
        n_decoded += blocksize
        if total and n_decoded >= total:
            break
    if total and n_decoded != total:
        raise FLACError(
            f"decoded {n_decoded} samples, STREAMINFO declares {total}")
    out = np.array(chans, dtype=np.int64).T
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.size and (out.min() < lo or out.max() > hi):
        raise FLACError("decoded sample exceeds declared bit depth")
    return rate, channels, bps, out[:total if total else None].astype(
        np.int32)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (value & ((1 << k) - 1))
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise FLACError("unaligned writer")
        return bytes(self.out)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + (k + 1) * len(u)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = len(x)
    if n > 0 and (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)   # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    # pick the fixed order 0-2 with the smallest residual magnitude
    cands = {0: x.copy()}
    if n > 1:
        cands[1] = np.concatenate(([x[0]], np.diff(x)))
    if n > 2:
        d2 = x[2:] - 2 * x[1:-1] + x[:-2]
        cands[2] = np.concatenate((x[:2], d2))
    order = min(cands, key=lambda o: int(np.abs(cands[o][o:]).sum()))
    res = cands[order][order:]
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for w in x[:order]:
        bw.write(int(w), bps)
    # residual: 4-bit Rice, partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    u = np.where(res >= 0, res.astype(np.int64) * 2,
                 -res.astype(np.int64) * 2 - 1)
    best_k, best_cost = 0, None
    for k in range(15):
        c = _rice_cost(u, k)
        if best_cost is None or c < best_cost:
            best_k, best_cost = k, c
    rbits = max(int(v).bit_length() + 1 for v in res) if len(res) else 1
    if best_cost > rbits * len(res) + 5:
        bw.write(0xF, 4)          # escape: raw residuals
        bw.write(rbits, 5)
        for v in res:
            bw.write(int(v), rbits)
    else:
        bw.write(best_k, 4)
        for uv in u:
            bw.write_unary(int(uv) >> best_k)
            bw.write(int(uv), best_k)


def encode_flac(samples: np.ndarray, sample_rate: int = 8000,
                block_size: int = 1024) -> bytes:
    """Encode int16 samples (n,) or (n, channels) as a FLAC stream
    (fixed-predictor subset, independent channels).  Lossless: decode
    returns the input bit-exactly."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.dtype != np.int16:
        raise FLACError("samples must be int16 (n,) or (n, channels)")
    n, channels = a.shape
    if n == 0 or channels < 1 or channels > MAX_CHANNELS:
        raise FLACError("bad sample shape")
    if not (1 <= sample_rate <= 655350):
        raise FLACError("bad sample rate")
    if n * channels > MAX_SAMPLES:
        raise FLACError("sample volume exceeds cap")
    if not (16 <= block_size <= MAX_BLOCK):
        raise FLACError("bad block size")
    bps = 16
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2            # min/max frame size unknown
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16                   # MD5 unknown
    head = b"fLaC" + struct.pack(">I", (1 << 31) | (0 << 24) | 34) + si

    frames = bytearray()
    x64 = a.astype(np.int64)
    frame_no = 0
    for off in range(0, n, block_size):
        blk = x64[off:off + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)                   # reserved
        bw.write(0, 1)                   # fixed blocking strategy
        bw.write(7, 4)                   # block size: 16-bit at end
        bw.write(13 if sample_rate < 65536 else 0, 4)
        bw.write(channels - 1, 4)        # independent channels
        bw.write(4, 3)                   # 16-bit samples
        bw.write(0, 1)                   # reserved
        # coded frame number (UTF-8 style)
        fn = frame_no
        if fn < 0x80:
            bw.write(fn, 8)
        elif fn < 0x800:
            bw.write(0b110 << 5 | (fn >> 6), 8)
            bw.write(0b10 << 6 | (fn & 0x3F), 8)
        else:
            raise FLACError("fixture encoder caps at 2048 frames")
        bw.write(bs - 1, 16)
        if sample_rate < 65536:
            bw.write(sample_rate, 16)
        hdr = bytes(bw.out) if bw.nbits == 0 else None
        if hdr is None:
            raise FLACError("frame header must be byte-aligned here")
        bw.write(_crc8(hdr), 8)
        for ch in range(channels):
            _encode_subframe(bw, blk[:, ch], bps)
        bw.align()
        body = bw.getvalue()
        frames += body + struct.pack(">H", _crc16(body))
        frame_no += 1
    return head + bytes(frames)
