"""WebP-lossless (VP8L) codec tests: encoder-path roundtrips, and
hand-built bitstreams for the decoder paths the minimal encoder never
emits (predictor/color transforms, color cache, mapped short
distances, meta prefix groups) with expected pixels derived from an
independent forward re-statement of the spec in the test.  Fuzz and
bomb-cap checks follow the PNG/FLAC discipline."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mediawiki_to_notion_spark.functions.webp_codec import (
    DISTANCE_MAP,
    UnsupportedWebPError,
    WebPError,
    _BitWriter,
    _emit_entropy_image,
    _value_to_prefix,
    _write_prefix_code,
    decode_webp,
    encode_webp,
    probe_webp,
)


def _wrap(payload_bits: _BitWriter) -> bytes:
    payload = b"\x2f" + payload_bits.getvalue()
    padded = payload + (b"\x00" if len(payload) % 2 else b"")
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(padded)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + padded)


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _argb(r, g, b, a=255):
    return (a << 24) | (r << 16) | (g << 8) | b


# --------------------------------------------------------------------------
# encoder-path roundtrips

@pytest.mark.parametrize("kw,shape,ncolors", [
    ({}, (13, 17, 3), 256),
    ({"subtract_green": True}, (8, 9, 4), 256),
    ({"palette": True}, (20, 11), 4),     # 2-bit packed indices
    ({"palette": True}, (9, 33), 2),      # 1-bit packed
    ({"palette": True}, (15, 10), 13),    # 4-bit packed
    ({"palette": True}, (6, 7, 3), 256),  # unpacked palette
    ({"rle": False}, (5, 40, 3), 2),
    ({}, (1, 1, 3), 256),
])
def test_roundtrip(kw, shape, ncolors):
    rng = np.random.default_rng(hash((shape, ncolors)) % 2**32)
    img = (rng.integers(0, ncolors, shape) * (255 // (ncolors - 1) if ncolors > 1 else 1)).astype(np.uint8)
    blob = encode_webp(img, **kw)
    w, h, out = decode_webp(blob)
    assert (w, h) == (shape[1], shape[0])
    expect3 = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
    assert (out[..., :3] == expect3[..., :3]).all()
    if img.ndim == 3 and img.shape[-1] == 4:
        assert (out[..., 3] == img[..., 3]).all()
    else:
        assert (out[..., 3] == 255).all()
    assert probe_webp(blob) == (w, h)


def test_roundtrip_heavy_runs_uses_lz77():
    # constant rows -> long identical-pixel runs -> dist=1 back-refs
    img = np.repeat(
        np.arange(30, dtype=np.uint8).reshape(30, 1, 1), 32, axis=1
    ).repeat(3, axis=2)
    rle = encode_webp(img, rle=True)
    lit = encode_webp(img, rle=False)
    assert len(rle) < len(lit)          # back-references actually fired
    for blob in (rle, lit):
        _, _, out = decode_webp(blob)
        assert (out[..., :3] == img).all()
        assert (out[..., 3] == 255).all()


# --------------------------------------------------------------------------
# distance map: pinned against the spec's table prefix

def test_distance_map_pins():
    assert len(DISTANCE_MAP) == 120
    assert len(set(DISTANCE_MAP)) == 120
    # RFC 9649 table prefix (first 34 entries)
    assert DISTANCE_MAP[:34] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2),
    ]
    assert DISTANCE_MAP[-1] == (8, 7)
    # every offset resolves to a strictly-previous pixel for wide rows
    for dx, dy in DISTANCE_MAP:
        assert dy > 0 or dx > 0


# --------------------------------------------------------------------------
# hand-built streams: decoder-only paths

def _forward_predict(img: np.ndarray, mode_of) -> list:
    """Forward predictor residuals (spec re-statement, plain loops):
    (0,0) predicts ARGB black, row 0 predicts L, column 0 predicts T,
    otherwise the tile's mode.  img is (h, w) int ARGB."""
    h, w = img.shape
    from mediawiki_to_notion_spark.functions.webp_codec import _predict

    flat = [int(v) for v in img.ravel()]
    res = []
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = flat[pos - 1]
            elif x == 0:
                pred = flat[pos - w]
            else:
                pred = _predict(mode_of(x, y), flat, pos, w)
            cur = flat[pos]
            r = 0
            for sh in (24, 16, 8, 0):
                r |= ((((cur >> sh) & 0xFF) - ((pred >> sh) & 0xFF))
                      & 0xFF) << sh
            res.append(r)
    return res


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 13])
def test_predictor_transform_single_tile(mode):
    rng = np.random.default_rng(mode)
    h, w = 5, 7
    img = rng.integers(0, 2**32, (h, w), dtype=np.uint64).astype(object)
    img = np.vectorize(lambda v: int(v) | 0xFF000000)(img)
    bits = 4                       # one 16x16 tile covers the image
    res = _forward_predict(img, lambda x, y: mode)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)                 # PREDICTOR
    bw.write(bits - 2, 3)
    _emit_entropy_image(bw, [0xFF000000 | (mode << 8)], rle=False,
                        top_level=False)
    bw.write(0, 1)                 # no more transforms
    _emit_entropy_image(bw, res, rle=False)
    dw, dh, out = decode_webp(_wrap(bw))
    assert (dw, dh) == (w, h)
    got = ((out[..., 3].astype(np.uint32) << 24)
           | (out[..., 0].astype(np.uint32) << 16)
           | (out[..., 1].astype(np.uint32) << 8)
           | out[..., 2].astype(np.uint32))
    want = np.array([[int(img[y, x]) for x in range(w)] for y in range(h)],
                    dtype=np.uint32)
    assert (got == want).all(), f"mode {mode}"


def test_predictor_transform_multi_tile():
    rng = np.random.default_rng(99)
    h, w = 6, 9
    bits = 2                       # 4x4 tiles -> 3x2 tile grid
    modes = [[1, 2, 7], [4, 12, 3]]
    img = np.vectorize(lambda v: int(v) | 0xFF000000)(
        rng.integers(0, 2**32, (h, w), dtype=np.uint64).astype(object))
    res = _forward_predict(img, lambda x, y: modes[y >> bits][x >> bits])
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(bits - 2, 3)
    tile_px = [0xFF000000 | (modes[ty][tx] << 8)
               for ty in range(2) for tx in range(3)]
    _emit_entropy_image(bw, tile_px, rle=False, top_level=False)
    bw.write(0, 1)
    _emit_entropy_image(bw, res, rle=False)
    _, _, out = decode_webp(_wrap(bw))
    got = ((out[..., 3].astype(np.uint32) << 24)
           | (out[..., 0].astype(np.uint32) << 16)
           | (out[..., 1].astype(np.uint32) << 8)
           | out[..., 2].astype(np.uint32))
    want = np.array([[int(img[y, x]) for x in range(w)] for y in range(h)],
                    dtype=np.uint32)
    assert (got == want).all()


def test_color_transform_inverse():
    rng = np.random.default_rng(7)
    h, w = 4, 5
    g2r, g2b, r2b = 37, 0xF3, 0x85   # mixed-sign int8 elements
    img = [int(v) | 0xFF000000
           for v in rng.integers(0, 2**32, h * w, dtype=np.uint64)]

    def delta(t, c):
        if t >= 128:
            t -= 256
        if c >= 128:
            c -= 256
        return (t * c) >> 5

    res = []
    for px in img:                  # forward transform (spec re-statement)
        green = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        nr = (red - delta(g2r, green)) & 0xFF
        nb = (blue - delta(g2b, green) - delta(r2b, red)) & 0xFF
        res.append((px & 0xFF00FF00) | (nr << 16) | nb)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)                  # COLOR_TRANSFORM
    bw.write(4 - 2, 3)              # one 16x16 tile
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    _emit_entropy_image(bw, [cte], rle=False, top_level=False)
    bw.write(0, 1)
    _emit_entropy_image(bw, res, rle=False)
    _, _, out = decode_webp(_wrap(bw))
    got = ((out[..., 3].astype(np.uint32) << 24)
           | (out[..., 0].astype(np.uint32) << 16)
           | (out[..., 1].astype(np.uint32) << 8)
           | out[..., 2].astype(np.uint32)).ravel().tolist()
    assert got == img


def test_color_cache_hits():
    from mediawiki_to_notion_spark.functions.webp_codec import (
        CACHE_MULTIPLIER,
    )

    w, h, cache_bits = 6, 1, 4
    px = _argb(10, 200, 30)
    idx = ((CACHE_MULTIPLIER * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)                  # no transforms
    bw.write(1, 1)                  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)                  # no meta prefix image
    green_alpha = 256 + 24 + (1 << cache_bits)
    g_codes = _write_prefix_code(
        bw, {200: 1, 256 + 24 + idx: 5}, green_alpha)
    r_codes = _write_prefix_code(bw, {10: 1}, 256)
    b_codes = _write_prefix_code(bw, {30: 1}, 256)
    a_codes = _write_prefix_code(bw, {255: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    c, ln = g_codes[200]
    bw.write_code(c, ln)
    for codes, sym in ((r_codes, 10), (b_codes, 30), (a_codes, 255)):
        cc, cl = codes[sym]
        bw.write_code(cc, cl)
    for _ in range(w - 1):          # five cache hits
        c, ln = g_codes[256 + 24 + idx]
        bw.write_code(c, ln)
    dw, dh, out = decode_webp(_wrap(bw))
    assert (dw, dh) == (w, h)
    assert (out[0, :, 0] == 10).all() and (out[0, :, 1] == 200).all() \
        and (out[0, :, 2] == 30).all()


def test_mapped_short_distance_copies_row_above():
    w, h = 5, 3
    rng = np.random.default_rng(3)
    rows = [[_argb(*rng.integers(0, 256, 3)) for _ in range(w)]
            for _ in range(2)]
    lits = rows[0] + rows[1]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)                  # no cache
    bw.write(0, 1)                  # no meta
    gf = {}
    rf = {}
    bf = {}
    af = {}
    for p in lits:
        for d, v in ((gf, (p >> 8) & 0xFF), (rf, (p >> 16) & 0xFF),
                     (bf, p & 0xFF), (af, (p >> 24) & 0xFF)):
            d[v] = d.get(v, 0) + 1
    l_prefix, l_extra, l_nbits = _value_to_prefix(w)   # length = one row
    gf[256 + l_prefix] = gf.get(256 + l_prefix, 0) + 1
    g_codes = _write_prefix_code(bw, gf, 256 + 24)
    r_codes = _write_prefix_code(bw, rf, 256)
    b_codes = _write_prefix_code(bw, bf, 256)
    a_codes = _write_prefix_code(bw, af, 256)
    d_codes = _write_prefix_code(bw, {0: 1}, 40)   # dist prefix value 1
    for p in lits:
        for codes, sym in ((g_codes, (p >> 8) & 0xFF),
                           (r_codes, (p >> 16) & 0xFF),
                           (b_codes, p & 0xFF),
                           (a_codes, (p >> 24) & 0xFF)):
            c, ln = codes[sym]
            bw.write_code(c, ln)
    c, ln = g_codes[256 + l_prefix]
    bw.write_code(c, ln)
    bw.write(l_extra, l_nbits)
    c, ln = d_codes[0]
    bw.write_code(c, ln)            # dist_code 1 -> map[0] = (0,1) -> w
    _, _, out = decode_webp(_wrap(bw))
    got_row2 = [(int(out[2, x, 3]) << 24) | (int(out[2, x, 0]) << 16)
                | (int(out[2, x, 1]) << 8) | int(out[2, x, 2])
                for x in range(w)]
    assert got_row2 == rows[1]      # (0,1) offset copies the row above


def test_meta_prefix_groups():
    w, h = 8, 1
    bits = 2                        # two 4-wide tiles
    a_px = _argb(1, 2, 3)
    b_px = _argb(9, 8, 7)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)                  # no transforms
    bw.write(0, 1)                  # no cache
    bw.write(1, 1)                  # meta prefix image present
    bw.write(bits - 2, 3)
    _emit_entropy_image(
        bw, [0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)],
        rle=False, top_level=False)
    for px in (a_px, b_px):         # group 0 then group 1
        _write_prefix_code(bw, {(px >> 8) & 0xFF: 1}, 256 + 24)
        _write_prefix_code(bw, {(px >> 16) & 0xFF: 1}, 256)
        _write_prefix_code(bw, {px & 0xFF: 1}, 256)
        _write_prefix_code(bw, {(px >> 24) & 0xFF: 1}, 256)
        _write_prefix_code(bw, {0: 1}, 40)
    # all ten codes are 0-bit single-symbol: the pixel stream is empty
    _, _, out = decode_webp(_wrap(bw))
    assert (out[0, :4] == [1, 2, 3, 255]).all()
    assert (out[0, 4:] == [9, 8, 7, 255]).all()


# --------------------------------------------------------------------------
# robustness

def test_rejects_lossy_and_garbage():
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(encode_webp(img))
    with pytest.raises(UnsupportedWebPError):
        decode_webp(bytes(blob).replace(b"VP8L", b"VP8 ", 1))
    with pytest.raises(WebPError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE" + bytes(16))
    with pytest.raises(WebPError):
        decode_webp(b"")
    with pytest.raises(WebPError):
        probe_webp(b"RIFF" + bytes(30))


def test_dimension_bomb_capped():
    bw = _BitWriter()
    _header(bw, 16384, 16384)       # 268M pixels > MAX_PIXELS
    with pytest.raises(WebPError):
        decode_webp(_wrap(bw))


def test_fuzz_truncate_and_flip():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    for kw in ({}, {"palette": False, "subtract_green": True}):
        blob = encode_webp(img, **kw)
        for cut in range(20, len(blob), 7):
            try:
                decode_webp(blob[:cut])
            except WebPError:
                pass                # typed error is the contract
        for _ in range(60):
            mut = bytearray(blob)
            i = int(rng.integers(20, len(mut)))
            mut[i] ^= 1 << int(rng.integers(0, 8))
            try:
                decode_webp(bytes(mut))
            except WebPError:
                pass


@pytest.mark.parametrize("mode", range(14))
def test_predictor_encoder_roundtrip(mode):
    rng = np.random.default_rng(mode + 100)
    img = rng.integers(0, 256, (40, 70, 3)).astype(np.uint8)  # multi-tile
    for sg in (False, True):
        blob = encode_webp(img, predictor=mode, subtract_green=sg)
        _, _, out = decode_webp(blob)
        assert (out[..., :3] == img).all()
        assert (out[..., 3] == 255).all()


def test_predictor_encoder_compresses_smooth_gradients():
    smooth = np.stack(
        [np.add.outer(np.arange(40), np.arange(70)).astype(np.uint8)] * 3,
        axis=-1)
    assert len(encode_webp(smooth, predictor=2)) < len(encode_webp(smooth)) / 10


def test_long_run_split_at_4096():
    """A solid run longer than VP8L's max LZ77 length (4096) must be
    split into multiple refs; with one distinct leading pixel the
    green alphabet is non-degenerate, so an unsplit run >4096 would
    emit a length symbol outside the 256+24 alphabet and produce an
    undecodable stream (r6 ADVICE repro: 70x70)."""
    img = np.zeros((70, 70, 3), dtype=np.uint8)
    img[0, 0] = (200, 10, 30)          # one distinct pixel
    img[img.sum(axis=-1) == 0] = 7     # solid remainder: 4899-pixel run
    data = encode_webp(img)
    w, h, out = decode_webp(data)
    assert (w, h) == (70, 70)
    assert np.array_equal(out[..., :3], img)


def test_long_run_split_boundary_exact():
    """Runs of exactly 4096 and 4097 pixels after one literal."""
    for extra in (4096, 4097):
        flat = np.full((1, extra + 1, 3), 9, dtype=np.uint8)
        flat[0, 0] = (1, 2, 3)
        if extra + 1 > 1 << 14:
            continue
        data = encode_webp(flat)
        _, _, out = decode_webp(data)
        assert np.array_equal(out[..., :3], flat)


def test_write_prefix_code_rejects_out_of_alphabet_symbol():
    bw = _BitWriter()
    with pytest.raises(WebPError, match="outside alphabet"):
        _write_prefix_code(bw, {5: 3, 300: 1}, 280)
