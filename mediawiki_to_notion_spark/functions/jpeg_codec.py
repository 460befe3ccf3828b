"""Pure-stdlib+numpy baseline JPEG codec for the multimodal pipeline.

Implements the baseline sequential DCT process of ITU-T T.81 (the
public JPEG specification): 8x8 block DCT, quantization, zigzag,
differential-DC + run-length-AC entropy coding with canonical Huffman
tables, the 0xFF byte-stuffing rule, and the marker segment structure
(SOI / DQT / SOF0 / DHT / DRI / SOS / RSTn / EOI).

Encoder: grayscale (H, W) or RGB (H, W, 3) uint8 → 4:4:4 baseline
JPEG at a libjpeg-style ``quality`` (1-100).  The Huffman tables are
built PER IMAGE from the actual symbol sets (fixed-length canonical
codes, always legal, always < 16 bits) and written to DHT — a JPEG
file carries its own code tables, so nothing depends on the spec's
example tables and any conforming decoder can read the output.

Decoder: any baseline-sequential OR progressive (SOF2) JPEG —
arbitrary DQT/DHT tables (i.e. real-web files with the Annex K tables
or optimized ones), component sampling factors 1-2 in each axis
(4:4:4 / 4:2:2 / 4:2:0, chroma upsampled by replication), restart
intervals, multi-scan baseline files (one scan per component), and
the full progressive scan grammar: spectral selection, successive
approximation (DC and AC first/refine passes), EOB runs.  Arithmetic
coding, 12-bit, lossless and hierarchical processes raise
``UnsupportedJPEGError`` by name — the honest boundary (reference
parity: process-mw-dump.py:147-177 treats embedded media as opaque;
here JPEG decode becomes real).

JPEG is lossy: round-trips are verified within a quantization-error
tolerance, plus bit-exact determinism of the encoder itself.
"""

from __future__ import annotations

import struct

import numpy as np


class JPEGError(ValueError):
    """Malformed JPEG byte stream."""


# hostile-input ceiling: decode allocations scale with the SOF-declared
# dimensions (4 attacker bytes), so cap total pixels before allocating
MAX_PIXELS = 1 << 26


class UnsupportedJPEGError(JPEGError):
    """Valid JPEG using a process outside this codec's subset."""


# zigzag scan order: index i of the zigzag sequence → (row*8 + col)
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# base quantization tables (ITU T.81 Annex K.1 — the only spec tables
# used; they are short enough to transcribe reliably and are carried
# in the file's own DQT anyway, so a mistake would still round-trip)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling of a base table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.int32)


# 2D DCT-II / DCT-III basis (orthonormal, the JPEG fdct/idct up to the
# standard scale factors)
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8) * np.cos((2 * k[None, :] + 1) * k[:, None]
                                  * np.pi / 16)
    c[0, :] = np.sqrt(1.0 / 8)
    return c


_DCT = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT coefficients."""
    return _DCT @ blocks @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# ---------------------------------------------------------------------------
# color transforms (ITU T.871 / JFIF)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128
    cr = ycc[..., 2].astype(np.float64) - 128
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


# ---------------------------------------------------------------------------
# Huffman machinery


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: BITS (count of codes per length
    1..16) + the value list → {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A legal Huffman table giving every used symbol the same code
    length L with 2**L > n (so the all-ones code stays unused, as the
    standard tables also ensure).  Simple, always valid, and carried in
    the file's DHT — interoperability does not depend on optimality."""
    vals = sorted(symbols) if symbols else [0]
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with 2**L > n
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at any
    other marker (leaving it for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JPEGError("truncated entropy-coded data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) \
                else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise JPEGError("marker inside entropy-coded data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Discard pad bits; position must then sit on an 0xFF marker."""
        self.acc = 0
        self.nbits = 0


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the ``size``-bit amplitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


class _HuffDecoder:
    """MINCODE/MAXCODE table decode (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise JPEGError("invalid Huffman code")
            code = (code << 1) | br.read_bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


# ---------------------------------------------------------------------------
# encoder


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (H, W) float plane to 8x8 multiples by edge replication
    and split into raster-ordered (n, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * bw, 8, 8)
    return blocks, bh, bw


def _quantize_component(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) samples → (n_blocks, 64) zigzagged quantized coefficients."""
    blocks, _, _ = _plane_blocks(plane.astype(np.float64) - 128.0)
    coef = _fdct(blocks)
    quant = np.round(coef / q[None, :, :]).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[int, list, int]:
    """One zigzagged block → (dc_size_symbol, [(acsym, size, amp)...],
    new predictor); the encoder runs this twice (symbol collection,
    then emission)."""
    dc = int(zz[0])
    diff = dc - pred
    dsize = _category(diff)
    acs = []
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        size = _category(v)
        acs.append(((run << 4) | size, size, _amplitude(v, size)))
        run = 0
    if last_nz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return dsize, acs, dc


def _box_downsample(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean chroma downsample (edge-replicated to even size)."""
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return plane.reshape(plane.shape[0] // 2, 2,
                         plane.shape[1] // 2, 2).mean(axis=(1, 3))


def _prepare_components(pixels: np.ndarray, quality: int,
                        subsample: str):
    """Shared encoder front half: color transform, optional chroma
    downsample, quantization — returns the per-component zigzagged
    block grids (padded to the MCU grid) plus the frame geometry the
    sequential and progressive back halves both need."""
    a = np.asarray(pixels)
    if a.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {a.dtype}")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample}")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        ycc = _rgb_to_ycbcr(a)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad dimensions {w}x{h}")
    qy = _scaled_quant(_Q_LUMA, quality)
    qc = _scaled_quant(_Q_CHROMA, quality)
    n_comp = len(planes)
    qtabs = [qy] if n_comp == 1 else [qy, qc]
    comp_q = [0] if n_comp == 1 else [0, 1, 1]  # quant/huff class per comp
    sub = subsample == "420" and n_comp == 3
    samp = [(1, 1)] if n_comp == 1 else \
        ([(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component zigzagged block grids, padded to the MCU grid
    grids = []
    for ci in range(n_comp):
        plane = planes[ci]
        if sub and ci > 0:
            plane = _box_downsample(plane)
        ch, cw = samp[ci]
        tgt_h, tgt_w = mcuy * 8 * cw, mcux * 8 * ch
        ph, pw = tgt_h - plane.shape[0], tgt_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        zz = _quantize_component(plane, qtabs[comp_q[ci]])
        grids.append(zz.reshape(tgt_h // 8, tgt_w // 8, 64))
    return (grids, qtabs, comp_q, samp, h, w,
            hmax, vmax, mcux, mcuy)


def _headers(h, w, n_comp, qtabs, comp_q, samp, sof_marker):
    """SOI + DQT + SOFn byte prefix shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in enumerate(qtabs):
        zz_q = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += _seg(0xFFDB, bytes([tid]) + zz_q.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, ch << 4 | cv, comp_q[ci]])
    out += _seg(sof_marker, sof)
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 → baseline
    sequential JPEG.  ``subsample``: '444' (one block per component
    per MCU) or '420' (2x2 luma sampling, box-mean chroma — the
    dominant web layout).  ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs.  Deterministic: same inputs →
    identical bytes."""
    (grids, qtabs, comp_q, samp, h, w,
     hmax, vmax, mcux, mcuy) = _prepare_components(
        pixels, quality, subsample)
    n_comp = len(grids)

    def mcu_blocks():
        """Yield (comp_index, zigzag_block) in MCU interleave order,
        with None sentinels at restart boundaries."""
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                yield None, m
            my, mx = divmod(m, mcux)
            for ci in range(n_comp):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        yield ci, grids[ci][my * cv + by, mx * ch + bx]

    # pass 1: collect symbols per table class
    dc_syms: list[set] = [set(), set()]
    ac_syms: list[set] = [set(), set()]
    preds = [0] * n_comp
    for ci, zz in mcu_blocks():
        if ci is None:
            preds = [0] * n_comp
            continue
        cls = comp_q[ci]
        dsize, acs, preds[ci] = _block_symbols(zz, preds[ci])
        dc_syms[cls].add(dsize)
        ac_syms[cls].update(s for s, _, _ in acs)
    n_cls = 1 if n_comp == 1 else 2
    dc_tables = [_fixed_length_table(dc_syms[c]) for c in range(n_cls)]
    ac_tables = [_fixed_length_table(ac_syms[c]) for c in range(n_cls)]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    # pass 2: entropy-coded segment
    ecs = bytearray()
    bw_ = _BitWriter()
    preds = [0] * n_comp
    rst = 0
    for ci, zz in mcu_blocks():
        if ci is None:
            bw_.flush()
            ecs += bw_.out
            ecs += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw_ = _BitWriter()
            preds = [0] * n_comp
            continue
        cls = comp_q[ci]
        dc = int(zz[0])
        diff = dc - preds[ci]
        preds[ci] = dc
        dsize = _category(diff)
        code, length = dc_codes[cls][dsize]
        bw_.write(code, length)
        if dsize:
            bw_.write(_amplitude(diff, dsize), dsize)
        _, acs, _ = _block_symbols(zz, dc)  # predictor unused for AC
        for sym, size, amp in acs:
            code, length = ac_codes[cls][sym]
            bw_.write(code, length)
            if size:
                bw_.write(amp, size)
    bw_.flush()
    ecs += bw_.out

    out = _headers(h, w, n_comp, qtabs, comp_q, samp, 0xFFC0)
    for cls in range(n_cls):
        for tclass, (bits, vals) in ((0, dc_tables[cls]),
                                     (1, ac_tables[cls])):
            out += _seg(0xFFC4, bytes([tclass << 4 | cls])
                        + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        cls = comp_q[ci]
        sos += bytes([ci + 1, cls << 4 | cls])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode baseline-sequential OR progressive (SOF2) JPEG bytes →
    (width, height, uint8 array): (H, W) for 1-component frames,
    (H, W, 3) RGB for 3-component YCbCr frames.

    All scans accumulate into per-component natural-order coefficient
    arrays sized on the FRAME MCU grid (frame-level Hmax/Vmax per
    T.81 A.1.1), so legal multi-scan baseline files (one scan per
    component) and every progressive scan script (spectral selection
    + successive approximation, DC and AC first/refine passes,
    EOB runs, restarts) reconstruct correctly; the IDCT runs once at
    EOI over the accumulated coefficients."""
    if data[:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    coefs: dict[int, np.ndarray] = {}
    scanned: set[int] = set()
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JPEGError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker, and a trailing stuffed 0xFF00 from the entropy
        # segment's pad bits is data, not a marker — skip both
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0x00:
            pos += 2  # stray stuffed byte after a scan
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # parameterless markers outside a scan
            continue
        if pos + 4 > len(data):
            raise JPEGError("truncated marker segment")
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        if len(body) != length - 2:
            raise JPEGError("truncated marker segment")
        if marker == 0xDB:  # DQT — possibly several tables
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if prec else 1)
                if p + n > len(body):
                    raise JPEGError("truncated DQT")
                if prec:
                    q = np.frombuffer(body[p:p + n], dtype=">u2")
                else:
                    q = np.frombuffer(body[p:p + n], dtype=np.uint8)
                zz = np.zeros(64, dtype=np.int64)
                zz[_ZIGZAG] = q.astype(np.int64)
                qtabs[tid] = zz.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(body):
                tclass, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                if len(bits) != 16:
                    raise JPEGError("truncated DHT bits table")
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise JPEGError("truncated DHT")
                huff[(tclass, tid)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JPEGError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext.seq / prog
            if len(body) < 6:
                raise JPEGError("truncated SOF header")
            prec = body[0]
            if prec != 8:
                raise UnsupportedJPEGError(f"{prec}-bit precision")
            fh, fw, nc = struct.unpack(">HHB", body[1:6])
            if fh * fw > MAX_PIXELS:
                raise JPEGError(f"image too large ({fw}x{fh})")
            if nc not in (1, 3):
                raise UnsupportedJPEGError(
                    f"{nc}-component frame (grayscale/YCbCr only)"
                )
            if len(body) < 6 + 3 * nc:
                raise JPEGError("truncated SOF component list")
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "q": qid})
            if any(not 1 <= c["h"] <= 2 or not 1 <= c["v"] <= 2
                   for c in comps):
                raise UnsupportedJPEGError("sampling factor > 2")
            if len({c["id"] for c in comps}) != nc:
                raise JPEGError("duplicate component id")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            frame = {"h": fh, "w": fw, "comps": comps,
                     "hmax": hmax, "vmax": vmax,
                     "mcux": mcux, "mcuy": mcuy,
                     "progressive": marker == 0xC2}
            # natural-order coefficients on the frame MCU grid; every
            # scan (interleaved or not) lands inside this padding
            coefs = {
                c["id"]: np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJPEGError(
                f"SOF{marker - 0xC0} process "
                f"(baseline sequential / progressive only)"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise JPEGError("SOS before SOF")
            if len(body) < 1:
                raise JPEGError("truncated SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise JPEGError("truncated SOS header")
            scan = []
            for si in range(ns):
                cid, tabs = body[1 + si * 2], body[2 + si * 2]
                comp = next((c for c in frame["comps"] if c["id"] == cid),
                            None)
                if comp is None:
                    raise JPEGError(f"scan references unknown component "
                                    f"{cid}")
                scan.append((comp, tabs >> 4, tabs & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            if frame["progressive"]:
                if se > 63 or ss > se or (ss == 0) != (se == 0):
                    raise JPEGError(f"bad spectral selection {ss}..{se}")
                if ss > 0 and ns != 1:
                    raise JPEGError("interleaved progressive AC scan")
                if ah and ah != al + 1:
                    raise JPEGError("bad successive approximation")
            elif (ss, se, ah, al) != (0, 63, 0, 0):
                raise JPEGError("non-full-band scan in sequential frame")
            for comp, _, _ in scan:
                scanned.add(comp["id"])
            pos = _decode_scan(
                data, pos + 2 + length, frame, scan, huff,
                restart_interval, coefs, ss, se, ah, al,
            )
            continue
        # APPn / COM / anything else: skipped
        pos += 2 + length
    if frame is None or not scanned:
        raise JPEGError("missing SOF/SOS")
    if scanned != {c["id"] for c in frame["comps"]}:
        raise JPEGError("component never scanned")
    planes = _reconstruct(frame, coefs, qtabs)
    h, w = frame["h"], frame["w"]
    if len(planes) == 1:
        return w, h, planes[0][:h, :w]
    ycc = np.stack([p[:h, :w] for p in planes], axis=-1)
    return w, h, _ycbcr_to_rgb(ycc)


def _expect_restart(br: _BitReader, data: bytes) -> None:
    br.align_to_marker()
    if not (br.pos + 2 <= len(data) and data[br.pos] == 0xFF
            and 0xD0 <= data[br.pos + 1] <= 0xD7):
        raise JPEGError("expected restart marker")
    br.pos += 2


def _decode_scan(data, pos, frame, scan, huff, restart_interval,
                 coefs, ss, se, ah, al):
    """Entropy-decode ONE scan into the per-component coefficient
    arrays; returns the byte offset just past the scan's data.

    Covers all four progressive scan kinds (DC/AC x first/refine,
    T.81 G.1.2 incl. EOB runs) plus full-band sequential scans as the
    ss=0,se=63,ah=al=0 case.  Geometry: interleaved scans walk the
    frame MCU grid; single-component scans walk the component's OWN
    block grid ceil(ceil(dim * samp / max_samp) / 8) — the
    non-interleaved rule of T.81 A.2.2."""
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
        bw = bh = 0
    else:
        c0 = scan[0][0]
        bw = (-(-(w * c0["h"]) // hmax) + 7) // 8
        bh = (-(-(h * c0["v"]) // vmax) + 7) // 8
        n_units = bw * bh
    for c, dct, act in scan:
        if ss == 0 and ah == 0 and (0, dct) not in huff:
            raise JPEGError("missing Huffman table for scan")
        if se > 0 and (1, act) not in huff:
            raise JPEGError("missing Huffman table for scan")
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    state = {"eobrun": 0}
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            _expect_restart(br, data)
            preds = {c["id"]: 0 for c, _, _ in scan}
            state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for c, dct, act in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = coefs[c["id"]][my * c["v"] + by,
                                             mx * c["h"] + bx]
                        _decode_block(br, blk, huff, dct, act, preds,
                                      c["id"], ss, se, ah, al, state)
        else:
            c, dct, act = scan[0]
            byy, bxx = divmod(u, bw)
            _decode_block(br, coefs[c["id"]][byy, bxx], huff, dct, act,
                          preds, c["id"], ss, se, ah, al, state)
    # past the last unit: skip pad bits; caller resumes at next marker
    br.align_to_marker()
    return br.pos


def _decode_block(br, blk, huff, dct, act, preds, cid, ss, se, ah, al,
                  state):
    """Decode one 8x8 block's contribution from the current scan into
    ``blk`` (natural-order int32)."""
    if ah == 0:
        _decode_block_first(br, blk, huff, dct, act, preds, cid,
                            ss, se, al, state)
    elif ss == 0:
        # DC successive-approximation refinement: one raw bit
        if br.read_bit():
            blk[0] |= 1 << al
    else:
        _decode_block_ac_refine(br, blk, huff[(1, act)], ss, se, al,
                                state)


def _decode_block_first(br, blk, huff, dct, act, preds, cid, ss, se, al,
                        state):
    """First (non-refinement) pass: differential DC and/or RLE AC,
    shifted left by the successive-approximation bit position."""
    if ss == 0:
        s = huff[(0, dct)].decode(br)
        if s > 11:
            raise JPEGError(f"bad DC size {s}")
        preds[cid] += _extend(br.receive(s), s)
        blk[0] = preds[cid] << al
    if se == 0:
        return
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    ac_dec = huff[(1, act)]
    k = max(ss, 1)
    while k <= se:
        rs = ac_dec.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            # EOBn: 2^r - 1 MORE all-done blocks after this one
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.receive(r)
            break
        k += r
        if k > se:
            raise JPEGError("AC run past block end")
        blk[_ZIGZAG[k]] = _extend(br.receive(s), s) << al
        k += 1


def _decode_block_ac_refine(br, blk, ac_dec, ss, se, al, state):
    """AC successive-approximation refinement (T.81 G.1.2.3 /
    libjpeg's decode_mcu_AC_refine structure): newly-nonzero
    coefficients arrive as ±1<<al; every already-nonzero coefficient
    crossed on the way absorbs a correction bit."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = ac_dec.decode(br)
            r, s = rs >> 4, rs & 0xF
            sval = 0
            if s:
                if s != 1:
                    raise JPEGError("bad AC refinement size")
                sval = p1 if br.read_bit() else -p1
            elif r != 15:
                state["eobrun"] = 1 << r
                if r:
                    state["eobrun"] += br.receive(r)
                break
            while k <= se:
                z = _ZIGZAG[k]
                if blk[z] != 0:
                    if br.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                blk[_ZIGZAG[k]] = sval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if blk[z] != 0:
                if br.read_bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else -p1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, coefs, qtabs):
    """Dequantize + batched IDCT each component's accumulated
    coefficients, then upsample to full (padded) frame resolution by
    replication."""
    planes = []
    for c in frame["comps"]:
        if c["q"] not in qtabs:
            raise JPEGError(f"missing quant table {c['q']}")
        q = qtabs[c["q"]].astype(np.float64)
        arr = coefs[c["id"]]
        nby, nbx = arr.shape[:2]
        co = arr.reshape(nby, nbx, 8, 8).astype(np.float64) * q
        blocks = _idct(co) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = frame["vmax"] // c["v"], frame["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(np.clip(np.round(plane), 0, 255).astype(np.uint8))
    return planes


# ---------------------------------------------------------------------------
# progressive encoder (T.81 G.1.2 — spectral selection + successive
# approximation).  Primary use: generating real progressive streams so
# the decoder's scan-accumulation paths are testable end to end; the
# token stream per scan is materialized first (symbol pass) so each
# scan can carry its own fixed-length canonical DHT, matching the
# per-image-table discipline of the sequential encoder.


def _flush_eobrun_toks(toks, run_state):
    """Emit the pending EOBn symbol (+ extension bits + any buffered
    correction bits) into the token list."""
    n = run_state["eobrun"]
    if n:
        r = n.bit_length() - 1
        toks.append(("sym", r << 4))
        if r:
            toks.append(("bits", n - (1 << r), r))
        for b in run_state["be_bits"]:
            toks.append(("bits", b, 1))
        run_state["eobrun"] = 0
        run_state["be_bits"] = []


def _toks_ac_first(blocks, ss, se, al, restart_interval=0):
    """AC first-pass tokens for one non-interleaved scan: RLE with
    point transform |v| >> al and cross-block EOB runs.  A restart
    interval injects ('rst',) markers every that many blocks (flushing
    any pending EOB run first — runs may not cross restarts)."""
    toks: list = []
    rs = {"eobrun": 0, "be_bits": []}
    for u, zz in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            _flush_eobrun_toks(toks, rs)
            toks.append(("rst",))
        band = [int(v) for v in zz[ss:se + 1]]
        vals = [(v >> al) if v >= 0 else -((-v) >> al) for v in band]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            rs["eobrun"] += 1
            if rs["eobrun"] == 0x7FFF:
                _flush_eobrun_toks(toks, rs)
            continue
        _flush_eobrun_toks(toks, rs)
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                toks.append(("sym", 0xF0))  # ZRL
                run -= 16
            s = _category(v)
            toks.append(("sym", (run << 4) | s))
            toks.append(("bits", _amplitude(v, s), s))
            run = 0
        if nz[-1] < se - ss:
            rs["eobrun"] = 1
    _flush_eobrun_toks(toks, rs)
    return toks


def _toks_ac_refine(blocks, ss, se, al, restart_interval=0):
    """AC refinement tokens (libjpeg encode_mcu_AC_refine structure):
    correction bits for already-nonzero coefficients buffer behind the
    next symbol; blocks with no newly-significant coefficient fold
    into a cross-block EOB run carrying their buffered bits."""
    toks: list = []
    rs = {"eobrun": 0, "be_bits": []}
    for u, zz in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            _flush_eobrun_toks(toks, rs)
            toks.append(("rst",))
        band = [int(v) for v in zz[ss:se + 1]]
        temp = [abs(v) >> al for v in band]
        eob_pos = max((i for i, t in enumerate(temp) if t == 1),
                      default=-1)
        r = 0
        br_bits: list = []
        for i, t in enumerate(temp):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_pos:
                _flush_eobrun_toks(toks, rs)
                toks.append(("sym", 0xF0))  # ZRL
                r -= 16
                for b in br_bits:
                    toks.append(("bits", b, 1))
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)  # correction bit
                continue
            # newly-significant coefficient (magnitude exactly 1)
            _flush_eobrun_toks(toks, rs)
            toks.append(("sym", (r << 4) | 1))
            toks.append(("bits", 1 if band[i] > 0 else 0, 1))
            for b in br_bits:
                toks.append(("bits", b, 1))
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            rs["eobrun"] += 1
            rs["be_bits"].extend(br_bits)
            if rs["eobrun"] == 0x7FFF:
                _flush_eobrun_toks(toks, rs)
    _flush_eobrun_toks(toks, rs)
    return toks


def _toks_to_bytes(toks) -> tuple[bytes, bytes | None]:
    """Token list → (entropy bytes, DHT payload or None).  Builds a
    fixed-length canonical table over the scan's own symbol set."""
    syms = {t[1] for t in toks if t[0] == "sym"}
    dht = None
    codes = {}
    if syms:
        bits, vals = _fixed_length_table(syms)
        codes = _canonical_codes(bits, vals)
        dht = bytes(bits) + bytes(vals)
    out = bytearray()
    bw = _BitWriter()
    rst = 0
    for t in toks:
        if t[0] == "rst":
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
        elif t[0] == "sym":
            bw.write(*codes[t[1]])
        else:
            bw.write(t[1], t[2])
    bw.flush()
    out += bw.out
    return bytes(out), dht


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsample: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels → progressive (SOF2) JPEG with the
    classic libjpeg-style scan script: interleaved DC first pass at
    Al=1, per-component AC first passes in two spectral bands
    (1-5, 6-63) at Al=1, then DC and AC refinement passes down to
    Al=0 — so a conforming decoder reconstructs EXACTLY the same
    quantized coefficients as :func:`encode_jpeg` of the same inputs.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs/blocks in every scan (predictors and EOB runs reset at each).
    Deterministic: same inputs → identical bytes."""
    (grids, qtabs, comp_q, samp, h, w,
     hmax, vmax, mcux, mcuy) = _prepare_components(
        pixels, quality, subsample)
    n_comp = len(grids)

    def comp_blocks(ci):
        """Raster block order over component ci's OWN grid (the
        non-interleaved geometry of T.81 A.2.2)."""
        ch, cv = samp[ci]
        bw_ = (-(-(w * ch) // hmax) + 7) // 8
        bh_ = (-(-(h * cv) // vmax) + 7) // 8
        for byy in range(bh_):
            for bxx in range(bw_):
                yield grids[ci][byy, bxx]

    def dc_units():
        """Restart units for the DC scan: one MCU (interleaved) or one
        block (single-component frame), each a list of (ci, block)."""
        if n_comp == 1:
            for blk in comp_blocks(0):
                yield [(0, blk)]
            return
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            unit = []
            for ci in range(n_comp):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        unit.append((ci, grids[ci][my * cv + by,
                                                   mx * ch + bx]))
            yield unit

    def dc_toks(al, refine):
        toks: list = []
        preds = [0] * n_comp
        for u, unit in enumerate(dc_units()):
            if restart_interval and u and u % restart_interval == 0:
                toks.append(("rst",))
                preds = [0] * n_comp
            for ci, zz in unit:
                dc = int(zz[0]) >> al  # arithmetic shift (T.81 G.1.2.1)
                if refine:
                    toks.append(("bits", dc & 1, 1))
                    continue
                diff = dc - preds[ci]
                preds[ci] = dc
                s = _category(diff)
                toks.append(("sym", s))
                if s:
                    toks.append(("bits", _amplitude(diff, s), s))
        return toks

    def sos(comps, tids, ss, se, ah, al):
        p = bytes([len(comps)])
        for ci, tid in zip(comps, tids):
            p += bytes([ci + 1, tid])
        return p + bytes([ss, se, ah << 4 | al])

    out = _headers(h, w, n_comp, qtabs, comp_q, samp, 0xFFC2)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scans = [("dc", list(range(n_comp)), 0, 0, 0, 1)]
    for lo, hi in ((1, 5), (6, 63)):
        for ci in range(n_comp):
            scans.append(("ac", [ci], lo, hi, 0, 1))
    scans.append(("dc", list(range(n_comp)), 0, 0, 1, 0))
    for lo, hi in ((1, 5), (6, 63)):
        for ci in range(n_comp):
            scans.append(("ac", [ci], lo, hi, 1, 0))
    for kind, comps, ss, se, ah, al in scans:
        if kind == "dc":
            toks = dc_toks(al, refine=ah > 0)
            tclass = 0
        else:
            toks = _toks_ac_first(comp_blocks(comps[0]), ss, se, al,
                                  restart_interval) \
                if ah == 0 else \
                _toks_ac_refine(comp_blocks(comps[0]), ss, se, al,
                                restart_interval)
            tclass = 1
        ecs, dht = _toks_to_bytes(toks)
        if dht is not None:
            out += _seg(0xFFC4, bytes([tclass << 4]) + dht)
        # every scan uses table id 0 of its class (re-emitted per scan)
        out += _seg(0xFFDA, sos(comps, [0x00] * len(comps),
                                ss, se, ah, al))
        out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)
