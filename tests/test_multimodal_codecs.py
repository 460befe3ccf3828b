"""Real PNG/WAV/JPEG codecs (pure stdlib+numpy) + the real-decode
Spark pipeline.

These close the r2 'real image/audio codecs absent' gap: complete
baseline PNG (r4: every color type/depth/interlace), the real-world
WAV surface (r4: PCM 8-32 incl. 24-bit, IEEE float, extensible), and
JPEG (r4: baseline Huffman + IDCT, 4:4:4/4:2:0, restart markers;
r5: progressive SOF2 scan accumulation + multi-scan baseline).  Only
genuinely out-of-scope processes (WebP, MP3, H.264) remain behind
import-tries / named rejections.
"""

from __future__ import annotations

import numpy as np
import pytest

from mediawiki_to_notion_spark.functions.png_codec import (
    PNGError,
    UnsupportedPNGError,
    decode_png,
    encode_png,
)
from mediawiki_to_notion_spark.functions.wav_codec import (
    UnsupportedWAVError,
    WAVError,
    decode_wav,
    encode_wav,
)


def _image(h, w, channels, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type, channels):
    """Every scanline filter the spec defines decodes back bit-exact,
    for grayscale, gray+alpha, RGB, and RGBA (color types 0/4/2/6)."""
    img = _image(13, 17, channels, seed=filter_type * 10 + channels)
    data = encode_png(img, filter_type=filter_type)
    w, h, out = decode_png(data)
    assert (w, h) == (17, 13)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_16bit(filter_type, channels):
    """Depth-16 images (big-endian samples, byte-level filters with
    bpp = channels*2) decode back bit-exact for every color type."""
    rng = np.random.default_rng(filter_type * 10 + channels)
    shape = (11, 7) if channels == 1 else (11, 7, channels)
    img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    data = encode_png(img, filter_type=filter_type)
    w, h, out = decode_png(data)
    assert (w, h) == (7, 11)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_palette_roundtrip(filter_type):
    """Color type 3: indices map through PLTE (+ optional tRNS alpha,
    with entries beyond the tRNS array defaulting opaque)."""
    from mediawiki_to_notion_spark.functions.png_codec import (
        encode_png_palette,
    )

    rng = np.random.default_rng(filter_type)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, size=(9, 11), dtype=np.uint8)
    w, h, out = decode_png(encode_png_palette(idx, pal,
                                              filter_type=filter_type))
    assert (w, h) == (11, 9)
    np.testing.assert_array_equal(out, pal[idx])
    # with per-entry alpha on the first 4 entries only
    trns = np.array([0, 64, 128, 255], dtype=np.uint8)
    w, h, out = decode_png(encode_png_palette(idx, pal, trns=trns,
                                              filter_type=filter_type))
    assert out.shape == (9, 11, 4)
    np.testing.assert_array_equal(out[:, :, :3], pal[idx])
    alpha_lut = np.array([0, 64, 128, 255, 255, 255, 255], dtype=np.uint8)
    np.testing.assert_array_equal(out[:, :, 3], alpha_lut[idx])


def test_png_palette_index_out_of_range_is_error():
    from mediawiki_to_notion_spark.functions.png_codec import (
        encode_png_palette,
    )

    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((2, 2), 9, dtype=np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        encode_png_palette(idx, pal)
    # and a FILE with out-of-range indices (hand-built: palette smaller
    # than the encoded index stream) must fail decode, not mis-index
    good = encode_png_palette(np.full((2, 2), 3, dtype=np.uint8),
                              np.zeros((4, 3), dtype=np.uint8))
    import struct as _s
    import zlib as _z
    small_plte = np.zeros((2, 3), dtype=np.uint8).tobytes()
    rebuilt = bytearray()
    pos = 8
    rebuilt += good[:8]
    while pos + 8 <= len(good):
        (length,) = _s.unpack(">I", good[pos:pos + 4])
        ctype = good[pos + 4:pos + 8]
        body = good[pos + 8:pos + 8 + length]
        if ctype == b"PLTE":
            body = small_plte
        rebuilt += _s.pack(">I", len(body)) + ctype + body + _s.pack(
            ">I", _z.crc32(ctype + body) & 0xFFFFFFFF)
        pos += 12 + length
    with pytest.raises(PNGError, match="index out of range"):
        decode_png(bytes(rebuilt))


def test_png_gradient_and_edge_sizes():
    # gradients stress Sub/Average/Paeth correctness; 1x1 and 1xN are
    # the degenerate strides
    grad = np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8)
    for ft in range(5):
        _, _, out = decode_png(encode_png(grad, filter_type=ft))
        np.testing.assert_array_equal(out, grad)
    one = np.array([[7]], dtype=np.uint8)
    assert decode_png(encode_png(one))[2][0, 0] == 7
    row = np.arange(256, dtype=np.uint8).reshape(1, 256)
    np.testing.assert_array_equal(decode_png(encode_png(row, 4))[2], row)


def test_png_rejects_malformed_and_unsupported():
    img = _image(4, 4, 1, seed=1)
    good = encode_png(img)
    with pytest.raises(PNGError, match="signature"):
        decode_png(b"JFIF" + good[4:])
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IHDR/IDAT → CRC fails
    with pytest.raises(PNGError, match="CRC"):
        decode_png(bytes(corrupt))
    # unsupported subset features are named, not mis-decoded
    import struct as _s
    import zlib as _z

    def ihdr_chunk(depth, color, interlace):
        body = _s.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        return _s.pack(">I", len(body)) + b"IHDR" + body + _s.pack(
            ">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF
        )

    with pytest.raises(PNGError, match="bad bit depth 3"):
        decode_png(good[:8] + ihdr_chunk(3, 0, 0))
    with pytest.raises(PNGError, match="unknown interlace method"):
        decode_png(good[:8] + ihdr_chunk(8, 0, 2))
    # per-color-type depth legality (spec table 11.1)
    with pytest.raises(PNGError, match="invalid for color type 3"):
        decode_png(good[:8] + ihdr_chunk(16, 3, 0))
    with pytest.raises(PNGError, match="invalid for color type 2"):
        decode_png(good[:8] + ihdr_chunk(4, 2, 0))
    with pytest.raises(UnsupportedPNGError, match="color type 5"):
        decode_png(good[:8] + ihdr_chunk(8, 5, 0))
    # Adam7 (interlace 1) is SUPPORTED — an interlaced header whose
    # stream doesn't follow the pass layout fails as MALFORMED
    # (truncated / bad filter byte), never as unsupported
    with pytest.raises(PNGError) as exc:
        decode_png(good[:8] + ihdr_chunk(8, 0, 1)
                   + good[8 + 12 + 13:])  # original progressive IDAT+IEND
    assert not isinstance(exc.value, UnsupportedPNGError)


@pytest.mark.parametrize("dtype,depth", [(np.uint8, 8), (np.int16, 16),
                                         (np.int32, 32)])
def test_wav_roundtrip_depths(dtype, depth):
    rng = np.random.default_rng(depth)
    info = np.iinfo(dtype)
    mono = rng.integers(info.min, info.max, size=500).astype(dtype)
    rate, ch, out = decode_wav(encode_wav(mono, sample_rate=22050))
    assert (rate, ch) == (22050, 1)
    np.testing.assert_array_equal(out[:, 0], mono)
    stereo = rng.integers(info.min, info.max, size=(300, 2)).astype(dtype)
    rate, ch, out = decode_wav(encode_wav(stereo, sample_rate=8000))
    assert (rate, ch) == (8000, 2)
    np.testing.assert_array_equal(out, stereo)


def test_wav_rejects_malformed_and_unsupported():
    with pytest.raises(WAVError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    good = encode_wav(np.zeros(10, dtype=np.int16))
    # flip the format tag to 2 (ADPCM, compressed) — named, not mis-read
    bad = bytearray(good)
    assert bad[20] == 1
    bad[20] = 2
    with pytest.raises(UnsupportedWAVError, match="format tag 2"):
        decode_wav(bytes(bad))
    # IEEE float (tag 3) is now SUPPORTED — but only at 32/64 bits, so
    # tag 3 with the original 16-bit depth is malformed, not unsupported
    bad[20] = 3
    with pytest.raises(WAVError, match="invalid for IEEE float"):
        decode_wav(bytes(bad))


def test_wav_float_roundtrip():
    rng = np.random.default_rng(3)
    for dtype in (np.float32, np.float64):
        s = rng.standard_normal((301, 2)).astype(dtype)
        rate, ch, out = decode_wav(encode_wav(s, sample_rate=48000))
        assert (rate, ch) == (48000, 2)
        assert out.dtype == dtype
        np.testing.assert_array_equal(out, s)


def test_wav_24bit_roundtrip_and_range():
    rng = np.random.default_rng(24)
    s = rng.integers(-(1 << 23), 1 << 23, size=(257, 3)).astype(np.int32)
    s[0] = [-(1 << 23), (1 << 23) - 1, 0]  # exact range endpoints
    rate, ch, out = decode_wav(encode_wav(s, sample_rate=96000, depth=24))
    assert (rate, ch) == (96000, 3)
    np.testing.assert_array_equal(out, s)
    with pytest.raises(ValueError, match="24-bit range"):
        encode_wav(np.array([1 << 23], dtype=np.int32), depth=24)


def test_wav_extensible_wrapper_decodes():
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE): real format resolved from
    the SubFormat GUID — here wrapping plain PCM16."""
    import struct as _s

    s = np.arange(-50, 50, dtype=np.int16).reshape(-1, 2)
    plain = encode_wav(s, sample_rate=44100)
    # rebuild with an extensible fmt chunk (cbSize=22 + GUID)
    guid = _s.pack("<H", 1) + bytes.fromhex("000000001000800000aa00389b71")
    fmt = _s.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16) \
        + _s.pack("<HHI", 22, 16, 0b11) + guid
    data = plain[plain.find(b"data"):]
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt + data
    ext = b"RIFF" + _s.pack("<I", len(body)) + body
    rate, ch, out = decode_wav(ext)
    assert (rate, ch) == (44100, 2)
    np.testing.assert_array_equal(out, s)
    # unknown SubFormat GUID → named rejection
    bad_guid = _s.pack("<H", 1) + b"\x00" * 14
    fmt_bad = fmt[:24] + bad_guid
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt_bad)) + fmt_bad + data
    with pytest.raises(UnsupportedWAVError, match="SubFormat"):
        decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        channels=st.sampled_from([1, 2, 3, 4]),
        filter_type=st.integers(0, 4), seed=st.integers(0, 2**16),
    )
    def test_png_roundtrip_fuzz(h, w, channels, filter_type, seed):
        img = _image(h, w, channels, seed)
        ww, hh, out = decode_png(encode_png(img, filter_type=filter_type))
        assert (ww, hh) == (w, h)
        np.testing.assert_array_equal(out, img)

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 16), w=st.integers(1, 16),
        channels=st.sampled_from([1, 2, 3, 4]),
        filter_type=st.integers(0, 4), seed=st.integers(0, 2**16),
    )
    def test_png_roundtrip_16bit_fuzz(h, w, channels, filter_type, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if channels == 1 else (h, w, channels)
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        ww, hh, out = decode_png(encode_png(img, filter_type=filter_type))
        assert (ww, hh) == (w, h)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, img)

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20), w=st.integers(1, 20),
        channels=st.sampled_from([1, 2, 3, 4]),
        depth=st.sampled_from([8, 16]),
        filter_type=st.integers(0, 4), seed=st.integers(0, 2**16),
    )
    def test_png_adam7_roundtrip_fuzz(h, w, channels, depth, filter_type,
                                      seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if channels == 1 else (h, w, channels)
        if depth == 8:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        else:
            img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        ww, hh, out = decode_png(
            encode_png(img, filter_type=filter_type, interlace=True))
        assert (ww, hh) == (w, h)
        np.testing.assert_array_equal(out, img)

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        n_pal=st.integers(1, 256), n_trns=st.integers(0, 256),
        filter_type=st.integers(0, 4), seed=st.integers(0, 2**16),
    )
    def test_png_palette_roundtrip_fuzz(h, w, n_pal, n_trns, filter_type,
                                        seed):
        from mediawiki_to_notion_spark.functions.png_codec import (
            encode_png_palette,
        )

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
        idx = rng.integers(0, n_pal, size=(h, w), dtype=np.uint8)
        n_trns = min(n_trns, n_pal)
        trns = (rng.integers(0, 256, size=n_trns, dtype=np.uint8)
                if n_trns else None)
        ww, hh, out = decode_png(
            encode_png_palette(idx, pal, trns=trns, filter_type=filter_type))
        assert (ww, hh) == (w, h)
        if trns is None:
            np.testing.assert_array_equal(out, pal[idx])
        else:
            np.testing.assert_array_equal(out[:, :, :3], pal[idx])
            lut = np.full(n_pal, 255, dtype=np.uint8)
            lut[:n_trns] = trns
            np.testing.assert_array_equal(out[:, :, 3], lut[idx])

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 400), channels=st.integers(1, 4),
        depth=st.sampled_from([8, 16, 32]),
        rate=st.integers(1, 192000), seed=st.integers(0, 2**16),
    )
    def test_wav_roundtrip_fuzz(n, channels, depth, rate, seed):
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[depth]
        info = np.iinfo(dtype)
        rng = np.random.default_rng(seed)
        s = rng.integers(info.min, info.max, size=(n, channels)).astype(dtype)
        r, ch, out = decode_wav(encode_wav(s, sample_rate=rate))
        assert (r, ch) == (rate, channels)
        np.testing.assert_array_equal(out, s)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_resize_nearest_semantics():
    from mediawiki_to_notion_spark.functions.png_codec import resize_nearest

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    # 2x downsample picks pixel centers: rows/cols 1 and 3 under the
    # (dst+0.5)*scale convention
    np.testing.assert_array_equal(
        resize_nearest(img, 2, 2), img[[1, 3]][:, [1, 3]]
    )
    # identity resize is exact
    np.testing.assert_array_equal(resize_nearest(img, 4, 4), img)
    # upsample replicates without fabricating values
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8) and set(up.ravel()) <= set(img.ravel())


def test_real_resize_pipeline_in_spark(spark):
    """decode→resize→re-encode over real PNG bytes in mapInPandas; the
    emitted thumbnails are themselves decodable (chainable stage)."""
    from mediawiki_to_notion_spark.operators.multimodal import (
        RESIZE_REAL_SCHEMA,
        resize_real_media,
    )

    img = _image(40, 60, 3, seed=5)
    rows = [
        (1, bytearray(encode_png(img, filter_type=3))),
        (2, bytearray(b"\x89PNG\r\n\x1a\nnot really")),
    ]
    src = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r.doc_id: r
        for r in src.mapInPandas(resize_real_media, RESIZE_REAL_SCHEMA).collect()
    }
    assert (out[1].orig_width, out[1].orig_height) == (60, 40)
    w, h, thumb = decode_png(bytes(out[1].resized_png))
    assert (w, h) == (16, 16)
    # thumbnail pixels are actual source pixels (nearest-neighbour)
    assert thumb.dtype == np.uint8 and thumb.shape == (16, 16, 3)
    assert out[2].decode_error is not None and out[2].resized_png is None


def test_real_wav_energy_pipeline_in_spark(spark):
    """Windowed energy over REAL decoded PCM: a known ramp signal's
    per-window sums are exactly predictable; corrupt audio quarantines."""
    from mediawiki_to_notion_spark.operators.multimodal import (
        REAL_ENERGY_SCHEMA,
        REAL_ENERGY_WINDOW,
        wav_window_energy,
    )

    n = REAL_ENERGY_WINDOW * 3 + 17  # 3 full windows + a remainder
    ramp = np.arange(n, dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(ramp, sample_rate=8000))),
        (2, bytearray(b"RIFFgarbage!")),
    ]
    src = spark.createDataFrame(rows, "doc_id long, content binary")
    out = src.mapInPandas(wav_window_energy, REAL_ENERGY_SCHEMA).collect()
    good = sorted((r for r in out if r.doc_id == 1),
                  key=lambda r: r.window_idx)
    assert [r.window_idx for r in good] == [0, 1, 2]  # remainder dropped
    W = REAL_ENERGY_WINDOW
    for w, r in enumerate(good):
        assert r.energy == sum(range(w * W, (w + 1) * W))
        assert r.sample_rate == 8000 and r.decode_error is None
    bad = [r for r in out if r.doc_id == 2]
    assert len(bad) == 1 and bad[0].decode_error is not None


def _enc_jpeg_e2e():
    from mediawiki_to_notion_spark.functions.jpeg_codec import encode_jpeg

    rgb = np.stack([_image(12, 19, 1, seed=6)] * 3, axis=-1)
    return encode_jpeg(rgb, quality=90, subsample="420")


def test_real_decode_pipeline_in_spark(spark):
    """End-to-end: REAL PNG and WAV bytes flow through the actual
    mapInPandas kernel; dimensions/rates come from genuinely parsed
    headers and a corrupt payload lands in decode_error instead of
    failing the stage."""
    from mediawiki_to_notion_spark.operators.multimodal import (
        REAL_FEATURE_SCHEMA,
        extract_real_features,
    )

    rows = [
        (1, "image/png", bytearray(encode_png(_image(24, 32, 3, seed=9),
                                              filter_type=4))),
        (2, "image/png", bytearray(encode_png(_image(5, 7, 1, seed=2)))),
        (3, "audio/wav", bytearray(encode_wav(
            np.arange(-400, 400, dtype=np.int16), sample_rate=44100))),
        (4, "image/png", bytearray(b"\x89PNG\r\n\x1a\nGARBAGE")),
        (5, "image/jpeg", bytearray(b"\xff\xd8\xff\xe0 not decodable")),
        (6, "image/jpeg", bytearray(_enc_jpeg_e2e())),
    ]
    src = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    out = {
        r.doc_id: r
        for r in src.mapInPandas(
            extract_real_features, REAL_FEATURE_SCHEMA
        ).collect()
    }
    assert (out[1].width, out[1].height) == (32, 24)
    assert out[1].decode_error is None
    assert (out[2].width, out[2].height) == (7, 5)
    assert (out[3].sample_rate, out[3].channels, out[3].n_samples) == \
        (44100, 1, 800)
    assert out[4].decode_error is not None and out[4].width is None
    # a torn JPEG quarantines; a real baseline JPEG decodes (r4 codec)
    assert out[5].decode_error is not None
    assert out[5].width is None  # undecodable never fabricates dims
    assert (out[6].width, out[6].height) == (19, 12)
    assert out[6].decode_error is None


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_adam7_roundtrip(filter_type, channels):
    """Adam7 interlaced files round-trip bit-exact for every color
    type and filter; sizes below 8 exercise empty passes."""
    for h, w in ((13, 17), (1, 1), (3, 9), (8, 8), (2, 2)):
        img = _image(h, w, channels, seed=h * 100 + w + filter_type)
        data = encode_png(img, filter_type=filter_type, interlace=True)
        ww, hh, out = decode_png(data)
        assert (ww, hh) == (w, h)
        np.testing.assert_array_equal(out, img)


def test_png_adam7_16bit_and_palette():
    from mediawiki_to_notion_spark.functions.png_codec import (
        encode_png_palette,
    )

    rng = np.random.default_rng(7)
    img16 = rng.integers(0, 65536, size=(11, 13, 3), dtype=np.uint16)
    w, h, out = decode_png(encode_png(img16, filter_type=4, interlace=True))
    assert (w, h) == (13, 11) and out.dtype == np.uint16
    np.testing.assert_array_equal(out, img16)

    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, size=(9, 6), dtype=np.uint8)
    trns = np.array([0, 128], dtype=np.uint8)
    w, h, out = decode_png(
        encode_png_palette(idx, pal, trns=trns, filter_type=2,
                           interlace=True))
    assert (w, h) == (6, 9)
    np.testing.assert_array_equal(out[:, :, :3], pal[idx])
    lut = np.array([0, 128, 255, 255, 255], dtype=np.uint8)
    np.testing.assert_array_equal(out[:, :, 3], lut[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_subbyte_roundtrip(depth, interlace):
    """Sub-byte depths (1/2/4): gray samples scale by bit replication
    (x255/x85/x17, the libpng rule); palette indices map via PLTE.
    Widths that don't fill the last byte exercise row padding."""
    from mediawiki_to_notion_spark.functions.png_codec import (
        encode_png_palette,
    )

    rng = np.random.default_rng(depth * 10 + interlace)
    for ft in range(5):
        for h, w in ((9, 13), (1, 1), (3, 8), (16, 5)):
            img = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
            ww, hh, out = decode_png(
                encode_png(img, filter_type=ft, interlace=interlace,
                           depth=depth))
            assert (ww, hh) == (w, h)
            scale = 255 // ((1 << depth) - 1)
            np.testing.assert_array_equal(out, img * scale)

            n_pal = 1 << depth
            pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
            idx = rng.integers(0, n_pal, size=(h, w), dtype=np.uint8)
            ww, hh, out = decode_png(
                encode_png_palette(idx, pal, filter_type=ft,
                                   interlace=interlace, depth=depth))
            assert (ww, hh) == (w, h)
            np.testing.assert_array_equal(out, pal[idx])


def test_png_subbyte_range_guards():
    from mediawiki_to_notion_spark.functions.png_codec import (
        encode_png_palette,
    )

    with pytest.raises(ValueError, match="2-bit range"):
        encode_png(np.full((2, 2), 4, dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="1-bit range"):
        encode_png_palette(np.full((2, 2), 2, dtype=np.uint8),
                           np.zeros((3, 3), dtype=np.uint8), depth=1)
    with pytest.raises(ValueError, match="sub-byte depth needs"):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint8), depth=4)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, r4)


def _smooth(h, w, seed=0):
    """Low-frequency test image — the content JPEG is designed for."""
    rng = np.random.default_rng(seed)
    yy = np.linspace(0, 4 * np.pi, h)[:, None]
    xx = np.linspace(0, 3 * np.pi, w)[None, :]
    base = 120 + 60 * np.sin(yy) * np.cos(xx) + 40 * np.sin(xx / 2)
    base = base + rng.normal(0, 2, size=(h, w))
    return np.clip(base, 0, 255).astype(np.uint8)


def test_jpeg_gray_roundtrip_tolerance():
    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth(41, 57)
    for quality, tol in ((95, 6), (75, 14)):
        w, h, out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert (w, h) == (57, 41)
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= tol, (quality, diff.max())
    # determinism: identical bytes for identical input
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_jpeg_rgb_roundtrip_all_layouts(subsample, restart):
    """RGB through every encoder layout: 4:4:4 and 4:2:0 (the decoder's
    generic MCU interleave + chroma upsampling), with and without
    restart markers.  The luma channel must stay tight; chroma loss is
    layout-inherent, so the bound is on the Y plane."""
    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth(37, 51, seed=3)
    rgb = np.stack([img, np.roll(img, 9, axis=0), 255 - img], axis=-1)
    data = encode_jpeg(rgb, quality=92, subsample=subsample,
                       restart_interval=restart)
    w, h, out = decode_jpeg(data)
    assert (w, h) == (51, 37) and out.shape == (37, 51, 3)
    y_in = _rgb_to_ycbcr(rgb)[..., 0]
    y_out = _rgb_to_ycbcr(out)[..., 0]
    assert np.abs(y_in - y_out).max() <= 10
    if subsample == "444":
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 14


def test_jpeg_rejects_malformed_and_unsupported():
    import struct as _s

    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        JPEGError,
        UnsupportedJPEGError,
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(_smooth(16, 16))
    with pytest.raises(JPEGError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    with pytest.raises(JPEGError, match="truncated"):
        decode_jpeg(good[:len(good) // 2])
    # flip SOF0 → SOF3 (lossless): named rejection.  The SOF0 marker
    # is the first \xff\xc0 in the stream.
    i = good.index(b"\xff\xc0")
    with pytest.raises(UnsupportedJPEGError, match="SOF3"):
        decode_jpeg(good[:i + 1] + b"\xc3" + good[i + 2:])
    # flip SOF0 → SOF2 (progressive): now SUPPORTED — but a full-band
    # 0..63 scan is illegal in a progressive frame, so the mismatch is
    # detected as malformed rather than decoded as garbage.
    with pytest.raises(JPEGError, match="spectral selection"):
        decode_jpeg(good[:i + 1] + b"\xc2" + good[i + 2:])
    # 12-bit precision: named rejection
    with pytest.raises(UnsupportedJPEGError, match="12-bit"):
        decode_jpeg(good[:i + 4] + bytes([12]) + good[i + 5:])
    # sampling factor 3: named rejection (rebuild the SOF payload)
    (seglen,) = _s.unpack(">H", good[i + 2:i + 4])
    sof = bytearray(good[i + 4:i + 2 + seglen])
    sof[7] = 0x31  # component 1 sampling 3x1
    with pytest.raises(UnsupportedJPEGError, match="sampling factor"):
        decode_jpeg(good[:i + 4] + bytes(sof) + good[i + 2 + seglen:])


def test_jpeg_feeds_decode_image_dispatcher():
    from mediawiki_to_notion_spark.functions.jpeg_codec import encode_jpeg
    from mediawiki_to_notion_spark.operators.multimodal import decode_image

    w, h = decode_image(encode_jpeg(_smooth(24, 31)))
    assert (w, h) == (31, 24)
    # WEBP containers route to the r6 VP8L codec (typed error on a
    # garbage chunk), truly unknown magics still reject by name
    from mediawiki_to_notion_spark.functions.webp_codec import WebPError

    with pytest.raises(WebPError):
        decode_image(b"RIFFxxxxWEBP" + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image(b"FORMxxxxNOPE" + b"\x00" * 20)


try:
    from hypothesis import given as _given, settings as _settings
    from hypothesis import strategies as _st

    @_settings(max_examples=20, deadline=None)
    @_given(
        h=_st.integers(1, 40), w=_st.integers(1, 40),
        rgb=_st.booleans(), quality=_st.integers(30, 100),
        subsample=_st.sampled_from(["444", "420"]),
        restart=_st.integers(0, 4), seed=_st.integers(0, 2**16),
    )
    def test_jpeg_never_crashes_and_preserves_shape(h, w, rgb, quality,
                                                    subsample, restart,
                                                    seed):
        """Arbitrary sizes (including < 8), qualities, layouts: encode
        and decode must succeed with the exact input shape back —
        content fidelity is quality-dependent, shape fidelity is not."""
        from mediawiki_to_notion_spark.functions.jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ww, hh, out = decode_jpeg(
            encode_jpeg(img, quality=quality, subsample=subsample,
                        restart_interval=restart))
        assert (ww, hh) == (w, h)
        assert out.shape == shape
except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# GIF + BMP (r4)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("n_pal", [2, 5, 64, 256])
def test_gif_roundtrip(interlace, n_pal):
    """LZW (incl. the 4096-entry dictionary reset on big frames) and
    the 4-pass interlace round-trip bit-exact through the palette."""
    from mediawiki_to_notion_spark.functions.gif_codec import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(n_pal + interlace)
    pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    for h, w in ((1, 1), (7, 13), (64, 64)):
        idx = rng.integers(0, n_pal, size=(h, w), dtype=np.uint8)
        ww, hh, out = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert (ww, hh) == (w, h)
        np.testing.assert_array_equal(out, pal[idx])


def test_gif_transparency_and_errors():
    from mediawiki_to_notion_spark.functions.gif_codec import (
        GIFError,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(9, 9), dtype=np.uint8)
    good = encode_gif(idx, pal, transparent=2)
    w, h, out = decode_gif(good)
    assert out.shape == (9, 9, 4)
    np.testing.assert_array_equal(out[:, :, 3], np.where(idx == 2, 0, 255))
    with pytest.raises(GIFError, match="signature"):
        decode_gif(b"NOTAGIF" + good)
    with pytest.raises(GIFError):
        decode_gif(good[:20])  # truncated inside the color table/blocks


def test_bmp_roundtrip_and_variants():
    from mediawiki_to_notion_spark.functions.bmp_codec import (
        BMPError,
        UnsupportedBMPError,
        decode_bmp,
        encode_bmp,
    )
    import struct as _s

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(15, 22, 3), dtype=np.uint8)
    good = encode_bmp(rgb)
    w, h, out = decode_bmp(good)
    assert (w, h) == (22, 15)
    np.testing.assert_array_equal(out, rgb)
    with pytest.raises(BMPError, match="magic"):
        decode_bmp(b"PM" + good[2:])
    # RLE8 compression → named rejection
    bad = bytearray(good)
    _s.pack_into("<I", bad, 30, 1)
    with pytest.raises(UnsupportedBMPError, match="compression 1"):
        decode_bmp(bytes(bad))
    # top-down (negative height) decodes to the same pixels
    td = bytearray(encode_bmp(rgb[::-1]))
    _s.pack_into("<i", td, 22, -15)
    w, h, out = decode_bmp(bytes(td))
    np.testing.assert_array_equal(out, rgb)


def test_gif_bmp_feed_decode_image_dispatcher():
    from mediawiki_to_notion_spark.functions.bmp_codec import encode_bmp
    from mediawiki_to_notion_spark.functions.gif_codec import encode_gif
    from mediawiki_to_notion_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(10, 17), dtype=np.uint8)
    assert decode_image(encode_gif(idx, pal)) == (17, 10)
    rgb = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert decode_image(encode_bmp(rgb)) == (9, 6)


# ---------------------------------------------------------------------------
# AIFF (r4)


@pytest.mark.parametrize("dtype,depth", [(np.int8, 8), (np.int16, 16),
                                         (np.int32, 32)])
def test_aiff_roundtrip_depths(dtype, depth):
    from mediawiki_to_notion_spark.functions.aiff_codec import (
        decode_aiff,
        encode_aiff,
    )

    rng = np.random.default_rng(depth)
    info = np.iinfo(dtype)
    stereo = rng.integers(info.min, info.max, size=(311, 2)).astype(dtype)
    rate, ch, out = decode_aiff(encode_aiff(stereo, sample_rate=44100))
    assert (rate, ch) == (44100, 2)
    np.testing.assert_array_equal(out, stereo)


def test_aiff_24bit_extended_rate_and_errors():
    from mediawiki_to_notion_spark.functions.aiff_codec import (
        AIFFError,
        UnsupportedAIFFError,
        decode_aiff,
        encode_aiff,
    )

    rng = np.random.default_rng(5)
    s = rng.integers(-(1 << 23), 1 << 23, size=(101, 1)).astype(np.int32)
    s[0, 0] = -(1 << 23)
    # odd rates stress the 80-bit extended-float sample-rate field
    for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
        r, ch, out = decode_aiff(encode_aiff(s, sample_rate=rate, depth=24))
        assert (r, ch) == (rate, 1)
        np.testing.assert_array_equal(out, s)
    with pytest.raises(AIFFError, match="FORM"):
        decode_aiff(b"RIFF" + b"\x00" * 40)
    good = bytearray(encode_aiff(np.zeros(4, dtype=np.int16)))
    good[8:12] = b"AIFC"  # claim AIFC; COMM has no compression field →
    # short COMM still decodes as NONE; now fake a compressed AIFC COMM
    import struct as _s
    comm = _s.pack(">hIh", 1, 4, 16) + b"\x40\x0d" + b"\xfa\x00" + b"\x00" * 6 \
        + b"ima4"
    body = b"AIFC" + b"COMM" + _s.pack(">I", len(comm)) + comm \
        + b"SSND" + _s.pack(">I", 8) + b"\x00" * 8
    # (AIFC 'ulaw'/'alaw' DECODE as of late r5 — pinned in
    # test_aifc_g711_compression_types; 'ima4' stays a named rejection)
    with pytest.raises(UnsupportedAIFFError, match="ima4"):
        decode_aiff(b"FORM" + _s.pack(">I", len(body)) + body)


def test_aiff_feeds_decode_audio_dispatcher():
    from mediawiki_to_notion_spark.functions.aiff_codec import encode_aiff
    from mediawiki_to_notion_spark.operators.multimodal import decode_audio

    s = np.arange(-100, 100, dtype=np.int16)
    assert decode_audio(encode_aiff(s, sample_rate=22050)) == (22050, 1, 200)


def test_jpeg_trailing_stuffed_ff00_before_eoi():
    """Regression: when the entropy segment's last byte is 0xFF the
    writer stuffs 0x00, leaving FF 00 immediately before EOI — the
    marker loop must treat it as data, not a marker (T.81 B.1.1.2).
    Seeds chosen so the ECS provably ends with the stuffed pair."""
    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    hit = 0
    for seed in (12, 13, 85):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        data = encode_jpeg(img, quality=40)
        if data[-4:-2] == b"\xff\x00":
            hit += 1
        w, h, out = decode_jpeg(data)
        assert (w, h) == (8, 8) and out.shape == (8, 8)
    assert hit >= 1, "test fixture drifted: no trailing FF00 produced"


def test_decoders_refuse_decompression_bombs():
    """Hostile-header hardening: decode allocations scale with
    attacker-declared dimensions, so a 4-byte header claiming a
    gigapixel image (or a zlib bomb inflating past the scanline
    budget) must be REFUSED before memory is touched — a crafted row
    in a 100 TB media scan must quarantine, not OOM the executor."""
    import struct as _s
    import zlib as _z

    from mediawiki_to_notion_spark.functions.gif_codec import (
        GIFError,
        decode_gif,
        encode_gif,
    )
    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        JPEGError,
        decode_jpeg,
        encode_jpeg,
    )

    # PNG: 65535x65535 header on a tiny file
    def ihdr(w, h):
        body = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return _s.pack(">I", len(body)) + b"IHDR" + body + _s.pack(
            ">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)

    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(PNGError, match="too large"):
        decode_png(good[:8] + ihdr(65535, 65535) + good[8 + 25:])
    # PNG: zlib bomb — sane dims but IDAT inflating to ~1 GB
    bomb = _z.compress(b"\x00" * (1 << 30), 9)  # ~1 MB compressed
    idat = _s.pack(">I", len(bomb)) + b"IDAT" + bomb + _s.pack(
        ">I", _z.crc32(b"IDAT" + bomb) & 0xFFFFFFFF)
    iend = _s.pack(">I", 0) + b"IEND" + _s.pack(
        ">I", _z.crc32(b"IEND") & 0xFFFFFFFF)
    with pytest.raises(PNGError, match="exceeds expected size"):
        decode_png(good[:8] + ihdr(64, 64) + idat + iend)

    # JPEG: gigapixel SOF
    jgood = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    i = jgood.index(b"\xff\xc0")
    huge = _s.pack(">HH", 65535, 65535)
    with pytest.raises(JPEGError, match="too large"):
        decode_jpeg(jgood[:i + 5] + huge + jgood[i + 9:])

    # GIF: gigapixel logical screen / frame
    ggood = bytearray(encode_gif(
        np.zeros((4, 4), dtype=np.uint8), np.zeros((2, 3), dtype=np.uint8)))
    _s.pack_into("<HH", ggood, 6, 65535, 65535)
    with pytest.raises(GIFError, match="too large"):
        decode_gif(bytes(ggood))


# ---------------------------------------------------------------------------
# progressive JPEG (r5): the decoder accumulates coefficients across
# scans, so a progressive stream of the same quantized coefficients
# must decode bit-identically to the baseline stream.


@pytest.mark.parametrize("shape,subsample", [
    ((16, 16), "444"),        # grayscale, exact blocks
    ((33, 22, 3), "444"),     # RGB, ragged dims
    ((40, 27, 3), "420"),     # subsampled, ragged dims
    ((8, 8), "444"),          # single block
])
def test_jpeg_progressive_decodes_identical_to_baseline(shape, subsample):
    import numpy as np

    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for q in (30, 85):
        wb, hb, base = decode_jpeg(encode_jpeg(img, quality=q,
                                               subsample=subsample))
        wp, hp, prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=q, subsample=subsample))
        assert (wb, hb) == (wp, hp) == (shape[1], shape[0])
        assert np.array_equal(base, prog)


def test_jpeg_progressive_eob_runs_cross_blocks():
    """A smooth low-quality image drives long cross-block EOB runs in
    both the AC-first and AC-refinement scans — the G.1.2 paths a
    per-block-EOB-only fixture would never reach."""
    import numpy as np

    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = _smooth(64, 96, seed=5)
    data = encode_jpeg_progressive(img, quality=20)
    _, _, prog = decode_jpeg(data)
    _, _, base = decode_jpeg(encode_jpeg(img, quality=20))
    assert np.array_equal(base, prog)


def test_jpeg_multiscan_baseline_per_component():
    """The ADVICE r4 case: a LEGAL baseline JPEG whose three
    components arrive in three separate single-component sequential
    scans must decode identically to the interleaved single-scan file
    (per-component planes accumulate; non-interleaved scan geometry
    uses the component's own block grid)."""
    import struct as _s

    import numpy as np

    from mediawiki_to_notion_spark.functions import jpeg_codec as J

    img = _smooth(37, 29, seed=9)
    rgb = np.stack([img, img[::-1], np.roll(img, 5, axis=1)], axis=-1)
    for subsample in ("444", "420"):
        (grids, qtabs, comp_q, samp, h, w,
         hmax, vmax, mcux, mcuy) = J._prepare_components(
            rgb, 70, subsample)
        out = J._headers(h, w, 3, qtabs, comp_q, samp, 0xFFC0)
        for ci in range(3):
            ch, cv = samp[ci]
            bw_ = (-(-(w * ch) // hmax) + 7) // 8
            bh_ = (-(-(h * cv) // vmax) + 7) // 8
            toks = []
            pred = 0
            for byy in range(bh_):
                for bxx in range(bw_):
                    zz = grids[ci][byy, bxx]
                    dc = int(zz[0])
                    diff = dc - pred
                    pred = dc
                    dsize = J._category(diff)
                    toks.append(("sym_dc", dsize))
                    if dsize:
                        toks.append(("bits", J._amplitude(diff, dsize),
                                     dsize))
                    _, acs, _ = J._block_symbols(zz, dc)
                    for sym, size, amp in acs:
                        toks.append(("sym_ac", sym))
                        if size:
                            toks.append(("bits", amp, size))
            dc_syms = {t[1] for t in toks if t[0] == "sym_dc"}
            ac_syms = {t[1] for t in toks if t[0] == "sym_ac"}
            dc_t = J._fixed_length_table(dc_syms)
            ac_t = J._fixed_length_table(ac_syms)
            dc_codes = J._canonical_codes(*dc_t)
            ac_codes = J._canonical_codes(*ac_t)
            out += J._seg(0xFFC4, bytes([0x00]) + bytes(dc_t[0])
                          + bytes(dc_t[1]))
            out += J._seg(0xFFC4, bytes([0x10]) + bytes(ac_t[0])
                          + bytes(ac_t[1]))
            bw2 = J._BitWriter()
            for t in toks:
                if t[0] == "sym_dc":
                    bw2.write(*dc_codes[t[1]])
                elif t[0] == "sym_ac":
                    bw2.write(*ac_codes[t[1]])
                else:
                    bw2.write(t[1], t[2])
            bw2.flush()
            out += J._seg(0xFFDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
            out += bytes(bw2.out)
        out += b"\xff\xd9"
        _, _, multi = J.decode_jpeg(bytes(out))
        _, _, single = J.decode_jpeg(
            J.encode_jpeg(rgb, quality=70, subsample=subsample))
        assert np.array_equal(multi, single), subsample


def test_jpeg_progressive_truncation_never_hangs():
    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        JPEGError,
        decode_jpeg,
        encode_jpeg_progressive,
    )

    good = encode_jpeg_progressive(_smooth(24, 24, seed=2), quality=40)
    for cut in (len(good) // 4, len(good) // 2, 3 * len(good) // 4,
                len(good) - 3):
        with pytest.raises(JPEGError):
            decode_jpeg(good[:cut])


def test_wav_zero_channels_is_waverror():
    """ADVICE r4: channels=0 in fmt must raise WAVError, not
    ZeroDivisionError."""
    import struct as _s

    from mediawiki_to_notion_spark.functions.wav_codec import (
        WAVError,
        decode_wav,
        encode_wav,
    )
    import numpy as np

    good = bytearray(encode_wav(
        np.zeros(16, dtype=np.int16), sample_rate=8000))
    i = bytes(good).index(b"fmt ")
    # fmt body starts at i+8: tag(2) channels(2) ...
    good[i + 10:i + 12] = _s.pack("<H", 0)
    with pytest.raises(WAVError, match="channel"):
        decode_wav(bytes(good))


def test_gif_truncated_gce_is_giferror():
    """ADVICE r4: a graphic-control extension cut off after its size
    byte must raise GIFError, not IndexError."""
    from mediawiki_to_notion_spark.functions.gif_codec import (
        GIFError,
        decode_gif,
        encode_gif,
    )
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, size=(8, 8), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    good = encode_gif(img, pal, transparent=1)
    i = good.index(b"\x21\xf9")
    with pytest.raises(GIFError, match="truncated"):
        decode_gif(good[:i + 3])  # 0x21 0xF9 0x04, then nothing


# ---------------------------------------------------------------------------
# r5 adversarial stream fuzzing: arbitrary truncation and byte
# corruption of real JPEG (sequential + progressive) and GIF streams
# must either decode (benign flips in entropy data are legal) or raise
# the codec's typed error — never IndexError/ZeroDivisionError/
# struct.error, never hang, never overallocate (the MAX_PIXELS caps
# fire before any allocation scales with attacker bytes).

try:
    from hypothesis import given as _fgiven, settings as _fsettings
    from hypothesis import strategies as _fst

    _FUZZ_JPEG = [
        __import__(
            "mediawiki_to_notion_spark.functions.jpeg_codec",
            fromlist=["encode_jpeg"],
        ).encode_jpeg(_smooth(16, 16, seed=1), quality=50),
        __import__(
            "mediawiki_to_notion_spark.functions.jpeg_codec",
            fromlist=["encode_jpeg_progressive"],
        ).encode_jpeg_progressive(_smooth(16, 16, seed=1), quality=50),
    ]

    @_fsettings(max_examples=120, deadline=None)
    @_fgiven(
        which=_fst.integers(0, 1),
        mode=_fst.sampled_from(["truncate", "flip", "marker"]),
        pos=_fst.integers(2, 10_000),
        val=_fst.integers(0, 255),
    )
    def test_jpeg_stream_fuzz_typed_errors_only(which, mode, pos, val):
        from mediawiki_to_notion_spark.functions.jpeg_codec import (
            JPEGError,
            decode_jpeg,
        )

        good = _FUZZ_JPEG[which]
        pos %= len(good)
        if mode == "truncate":
            data = good[:pos]
        elif mode == "flip":
            data = good[:pos] + bytes([good[pos] ^ (val or 1)]) \
                + good[pos + 1:]
        else:  # inject a marker byte mid-stream
            data = good[:pos] + bytes([0xFF, val]) + good[pos:]
        try:
            decode_jpeg(data)
        except JPEGError:
            pass  # typed (includes UnsupportedJPEGError)

    _FUZZ_GIF = None

    @_fsettings(max_examples=80, deadline=None)
    @_fgiven(
        mode=_fst.sampled_from(["truncate", "flip"]),
        pos=_fst.integers(0, 10_000),
        val=_fst.integers(1, 255),
    )
    def test_gif_stream_fuzz_typed_errors_only(mode, pos, val):
        import numpy as np

        from mediawiki_to_notion_spark.functions.gif_codec import (
            GIFError,
            decode_gif,
            encode_gif,
        )

        global _FUZZ_GIF
        if _FUZZ_GIF is None:
            rng = np.random.default_rng(5)
            _FUZZ_GIF = encode_gif(
                rng.integers(0, 8, size=(16, 16), dtype=np.uint8),
                rng.integers(0, 256, size=(8, 3), dtype=np.uint8),
            )
        good = _FUZZ_GIF
        pos %= len(good)
        if mode == "truncate":
            data = good[:pos]
        else:
            data = good[:pos] + bytes([good[pos] ^ val]) + good[pos + 1:]
        try:
            decode_gif(data)
        except GIFError:
            pass

    _FUZZ_AVI = None

    @_fsettings(max_examples=80, deadline=None)
    @_fgiven(
        mode=_fst.sampled_from(["truncate", "flip"]),
        pos=_fst.integers(0, 10_000),
        val=_fst.integers(1, 255),
    )
    def test_avi_stream_fuzz_typed_errors_only(mode, pos, val):
        import numpy as np

        from mediawiki_to_notion_spark.functions.avi_codec import (
            AVIError,
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )
        from mediawiki_to_notion_spark.functions.jpeg_codec import JPEGError

        global _FUZZ_AVI
        if _FUZZ_AVI is None:
            rng = np.random.default_rng(6)
            frames = [
                np.stack([rng.integers(0, 256, size=(16, 16),
                                       dtype=np.uint8)] * 3, axis=-1)
                for _ in range(3)
            ]
            _FUZZ_AVI = encode_avi_mjpeg(frames, fps=5, quality=60)
        good = _FUZZ_AVI
        pos %= len(good)
        if mode == "truncate":
            data = good[:pos]
        else:
            data = good[:pos] + bytes([good[pos] ^ val]) + good[pos + 1:]
        try:
            decode_avi_mjpeg(data)
        except (AVIError, JPEGError):
            pass  # typed (flipping a frame's bytes is a JPEG error)

    _FUZZ_AU = None

    @_fsettings(max_examples=80, deadline=None)
    @_fgiven(
        mode=_fst.sampled_from(["truncate", "flip"]),
        pos=_fst.integers(0, 2_000),
        val=_fst.integers(1, 255),
    )
    def test_au_stream_fuzz_typed_errors_only(mode, pos, val):
        import numpy as np

        from mediawiki_to_notion_spark.functions.au_codec import (
            AUError,
            decode_au,
            encode_au,
        )

        global _FUZZ_AU
        if _FUZZ_AU is None:
            sig = (np.sin(np.arange(300) / 4) * 15000).astype(np.int16)
            _FUZZ_AU = encode_au(sig, 8000, "mulaw")
        good = _FUZZ_AU
        pos %= len(good)
        if mode == "truncate":
            data = good[:pos]
        else:
            data = good[:pos] + bytes([good[pos] ^ val]) + good[pos + 1:]
        try:
            decode_au(data)
        except AUError:
            pass  # flips inside companded data legally decode

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


@pytest.mark.parametrize("shape,subsample,ri", [
    ((33, 22, 3), "444", 2),
    ((40, 27, 3), "420", 3),
    ((24, 24), "444", 1),
])
def test_jpeg_progressive_restart_markers(shape, subsample, ri):
    """Progressive scans with DRI/RSTn: predictors and EOB runs reset
    at every restart in EVERY scan kind (DC first/refine, AC
    first/refine), and the result still decodes bit-identically to
    the baseline stream of the same coefficients."""
    import numpy as np

    from mediawiki_to_notion_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    _, _, base = decode_jpeg(encode_jpeg(img, quality=55,
                                         subsample=subsample))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(
        img, quality=55, subsample=subsample, restart_interval=ri))
    assert np.array_equal(base, prog)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video (r5): RIFF container + per-frame JPEG.

def _clip(w, h, n, seed=0):
    return [
        np.stack(
            [((np.add.outer(np.arange(h) * 3, np.arange(w) * 7) + seed + k)
              % 256).astype(np.uint8)] * 3, axis=-1,
        )
        for k in range(n)
    ]


@pytest.mark.parametrize("w,h,n,fps", [(16, 16, 1, 1), (32, 24, 5, 12),
                                       (47, 25, 7, 30)])
def test_avi_mjpeg_roundtrip(w, h, n, fps):
    from mediawiki_to_notion_spark.functions.avi_codec import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        probe_avi,
    )

    blob = encode_avi_mjpeg(_clip(w, h, n), fps=fps, quality=90)
    assert probe_avi(blob) == (w, h, fps, n)
    dw, dh, dfps, dn, frames = decode_avi_mjpeg(blob)
    assert (dw, dh, dfps, dn) == (w, h, fps, n)
    assert len(frames) == n
    assert all(f.shape == (h, w, 3) and f.dtype == np.uint8 for f in frames)


@pytest.mark.parametrize("step,expected", [(1, 7), (2, 4), (3, 3), (7, 1),
                                           (10, 1)])
def test_avi_frame_sampling_counts(step, expected):
    from mediawiki_to_notion_spark.functions.avi_codec import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    blob = encode_avi_mjpeg(_clip(20, 18, 7), fps=4)
    _w, _h, _fps, n, frames = decode_avi_mjpeg(blob, frame_step=step)
    assert n == 7 and len(frames) == expected
    # sampled frames are frames 0, step, 2*step, ... of the clip
    full = decode_avi_mjpeg(blob)[4]
    for i, f in enumerate(frames):
        assert np.array_equal(f, full[i * step])


def test_avi_errors_and_bomb_caps():
    from mediawiki_to_notion_spark.functions.avi_codec import (
        AVIError,
        MAX_FRAMES,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        probe_avi,
    )

    with pytest.raises(AVIError):
        encode_avi_mjpeg([], fps=5)
    with pytest.raises(AVIError):
        encode_avi_mjpeg(_clip(16, 16, 1) + _clip(18, 16, 1), fps=5)
    with pytest.raises(AVIError):
        encode_avi_mjpeg(_clip(16, 16, 1), fps=0)
    blob = bytearray(encode_avi_mjpeg(_clip(16, 16, 2), fps=5))
    with pytest.raises(AVIError):
        decode_avi_mjpeg(bytes(blob), frame_step=0)
    # header declaring more frames than the cap must refuse pre-decode
    import struct as _s

    pos = bytes(blob).find(b"avih") + 8
    hostile = bytearray(blob)
    hostile[pos + 16:pos + 20] = _s.pack("<I", MAX_FRAMES + 1)
    with pytest.raises(AVIError):
        probe_avi(bytes(hostile))
    # non-MJPG vids stream is a named rejection
    hostile = bytearray(blob)
    p = bytes(blob).find(b"vids") + 4
    hostile[p:p + 4] = b"H264"
    with pytest.raises(AVIError):
        probe_avi(bytes(hostile))
    # frame-count mismatch between header and movi: tolerated by
    # default (stream-copied wild files carry stale dwTotalFrames —
    # ADVICE r5), returns frames actually seen; strict mode (the
    # roundtrip-certificate path, where OUR encoder wrote the header)
    # still refuses.
    hostile = bytearray(blob)
    hostile[pos + 16:pos + 20] = _s.pack("<I", 3)
    _w, _h, _fps, n_seen, frames = decode_avi_mjpeg(bytes(hostile))
    assert n_seen == len(frames) == 2
    with pytest.raises(AVIError):
        decode_avi_mjpeg(bytes(hostile), strict_frame_count=True)


def test_avi_truncation_and_bitflips_never_hang():
    from mediawiki_to_notion_spark.functions.avi_codec import (
        AVIError,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from mediawiki_to_notion_spark.functions.jpeg_codec import JPEGError

    blob = encode_avi_mjpeg(_clip(24, 16, 3), fps=6)
    for cut in (4, 11, 12, 40, 57, 100, len(blob) // 2, len(blob) - 3):
        try:
            decode_avi_mjpeg(blob[:cut])
        except (AVIError, JPEGError):
            pass
    rng = np.random.default_rng(7)
    for _ in range(50):
        noisy = bytearray(blob)
        for i in rng.integers(0, len(blob), size=4):
            noisy[i] ^= int(rng.integers(1, 256))
        try:
            decode_avi_mjpeg(bytes(noisy))
        except (AVIError, JPEGError, NotImplementedError):
            pass


def test_avi_feeds_decode_video_dispatcher():
    from mediawiki_to_notion_spark.functions.avi_codec import encode_avi_mjpeg
    from mediawiki_to_notion_spark.operators.multimodal import decode_video

    blob = encode_avi_mjpeg(_clip(18, 14, 4), fps=9)
    w, h, fps, n, frames = decode_video(blob, frame_step=2)
    assert (w, h, fps, n, len(frames)) == (18, 14, 9, 4, 2)
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)


# ---------------------------------------------------------------------------
# Sun AU / G.711 mu-law + A-law (r5).

def test_g711_codebook_idempotence():
    """encode(decode(b)) == b for every wire byte — the property that
    pins both companding tables to the ITU formulas.  The single
    mu-law exception is canonical: 0x7F (negative zero) re-encodes as
    0xFF (positive zero)."""
    from mediawiki_to_notion_spark.functions.au_codec import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )

    b = np.arange(256, dtype=np.uint8)
    mu = _mulaw_encode(_mulaw_decode(b))
    assert [(int(x), int(y)) for x, y in zip(b, mu) if x != y] \
        == [(0x7F, 0xFF)]
    assert np.array_equal(_alaw_encode(_alaw_decode(b)), b)


def test_g711_bit_exact_vs_audioop():
    """All four companding tables match CPython audioop's g711.c tables
    bit-exactly on every input (encode: all 65,536 int16 values;
    decode: all 256 wire bytes).  audioop is removed in Python 3.13 —
    pin while the sandbox still ships it (VERDICT r5 item 3)."""
    audioop = pytest.importorskip("audioop")
    from mediawiki_to_notion_spark.functions.au_codec import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        _mulaw_encode(x),
        np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), dtype=np.uint8),
    )
    assert np.array_equal(
        _alaw_encode(x),
        np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), dtype=np.uint8),
    )
    assert np.array_equal(
        _mulaw_decode(b),
        np.frombuffer(audioop.ulaw2lin(b.tobytes(), 2), dtype=np.int16),
    )
    assert np.array_equal(
        _alaw_decode(b),
        np.frombuffer(audioop.alaw2lin(b.tobytes(), 2), dtype=np.int16),
    )


def test_g711_quantization_error_bounds():
    from mediawiki_to_notion_spark.functions.au_codec import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    mu_err = np.abs(_mulaw_decode(_mulaw_encode(x)).astype(np.int32)
                    - x.astype(np.int32))
    al_err = np.abs(_alaw_decode(_alaw_encode(x)).astype(np.int32)
                    - x.astype(np.int32))
    # top-segment step is 1024 for both laws; midpoint error <= step/2
    # plus mu-law's 132-sample clip region
    assert mu_err.max() <= 644
    assert al_err.max() <= 512


@pytest.mark.parametrize("enc", ["mulaw", "alaw", "pcm16"])
@pytest.mark.parametrize("channels", [1, 2])
def test_au_container_roundtrip(enc, channels):
    from mediawiki_to_notion_spark.functions.au_codec import (
        decode_au,
        encode_au,
    )

    sig = (np.sin(np.arange(400) / 5) * 20000).astype(np.int16)
    data = sig if channels == 1 else np.stack([sig, -sig], axis=1)
    blob = encode_au(data, sample_rate=8000, encoding=enc)
    rate, ch, out = decode_au(blob)
    assert (rate, ch) == (8000, channels)
    assert out.shape == (400, channels)
    tol = 0 if enc == "pcm16" else 520
    assert np.abs(out[:, 0].astype(np.int32)
                  - sig.astype(np.int32)).max() <= tol


def test_au_errors_and_dispatcher():
    from mediawiki_to_notion_spark.functions.au_codec import (
        AUError,
        decode_au,
        encode_au,
    )
    from mediawiki_to_notion_spark.operators.multimodal import decode_audio

    sig = np.zeros(16, dtype=np.int16)
    blob = encode_au(sig, 8000, "mulaw")
    assert decode_audio(blob) == (8000, 1, 16)
    with pytest.raises(AUError):
        decode_au(b"junk")
    with pytest.raises(AUError):
        decode_au(b".snd" + b"\x00" * 8)       # truncated header
    with pytest.raises(AUError):
        decode_au(b".snd" + bytes(20))          # offset 0 < 24
    import struct as _s

    hostile = bytearray(blob)
    hostile[12:16] = _s.pack(">I", 23)          # encoding 23 = G.721
    with pytest.raises(AUError):
        decode_au(bytes(hostile))
    with pytest.raises(AUError):
        encode_au(sig.astype(np.float32), 8000, "mulaw")
    # truncation never hangs, always typed
    for cut in (5, 11, 23, 25, len(blob) - 1):
        try:
            decode_au(blob[:cut])
        except AUError:
            pass


def test_wav_g711_tags_decode_via_shared_tables():
    """WAVE_FORMAT_MULAW (7) / ALAW (6) telephony WAVs decode through
    the same ITU tables as the AU codec."""
    import struct as _s

    from mediawiki_to_notion_spark.functions.au_codec import (
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )
    from mediawiki_to_notion_spark.functions.wav_codec import decode_wav

    sig = (np.sin(np.arange(200) / 3) * 15000).astype(np.int16)
    for tag, enc in ((7, _mulaw_encode), (6, _alaw_encode)):
        codes = enc(sig).tobytes()
        fmt = _s.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
                + b"data" + _s.pack("<I", len(codes)) + codes)
        blob = b"RIFF" + _s.pack("<I", len(body)) + body
        rate, ch, out = decode_wav(blob)
        assert (rate, ch, out.shape) == (8000, 1, (200, 1))
        assert out.dtype == np.int16
        # quantization error bounded by the law's max step
        assert np.abs(out[:, 0].astype(np.int32)
                      - sig.astype(np.int32)).max() <= 520
    # round-trip exactness against the AU decode path for mu-law
    codes = _mulaw_encode(sig)
    assert np.array_equal(
        decode_wav(
            b"RIFF" + _s.pack("<I", 36 + len(codes)) + b"WAVE"
            + b"fmt " + _s.pack("<I", 16)
            + _s.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
            + b"data" + _s.pack("<I", len(codes)) + codes.tobytes()
        )[2][:, 0],
        _mulaw_decode(codes),
    )


def test_aifc_g711_compression_types():
    import struct as _s

    from mediawiki_to_notion_spark.functions.aiff_codec import (
        UnsupportedAIFFError,
        decode_aiff,
    )
    from mediawiki_to_notion_spark.functions.au_codec import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_encode,
    )

    def build_aifc(comp, codes, n):
        # 80-bit extended for 8000 Hz: value = m * 2^(e-16383-63) with
        # the integer bit at the mantissa MSB -> e = 16395, m = 8000<<51
        ext = _s.pack(">hQ", 16395, 8000 << 51)
        comm = _s.pack(">hIh", 1, n, 16) + ext + comp + b"\x00\x00"
        ssnd = _s.pack(">II", 0, 0) + codes
        body = (b"AIFC" + b"COMM" + _s.pack(">I", len(comm)) + comm
                + b"SSND" + _s.pack(">I", len(ssnd)) + ssnd)
        return b"FORM" + _s.pack(">I", len(body)) + body

    sig = (np.sin(np.arange(120) / 4) * 12000).astype(np.int16)
    for comp, enc in ((b"ulaw", _mulaw_encode), (b"alaw", _alaw_encode)):
        blob = build_aifc(comp, enc(sig).tobytes(), len(sig))
        rate, ch, out = decode_aiff(blob)
        assert (rate, ch, out.shape) == (8000, 1, (120, 1))
        assert np.abs(out[:, 0].astype(np.int32)
                      - sig.astype(np.int32)).max() <= 520
    # A-law via the exact table
    blob = build_aifc(b"ALAW", _alaw_encode(sig).tobytes(), len(sig))
    assert np.array_equal(decode_aiff(blob)[2][:, 0],
                          _alaw_decode(_alaw_encode(sig)))
    with pytest.raises(UnsupportedAIFFError):
        decode_aiff(build_aifc(b"ima4", b"\x00" * 120, 120))


def test_avi_short_strh_is_typed_error():
    """A vids strh chunk declaring size 32 (too short for the 36 bytes
    the header parse needs) must raise AVIError, never a raw
    struct.error (r5 review catch)."""
    import struct as _s

    from mediawiki_to_notion_spark.functions.avi_codec import (
        AVIError,
        encode_avi_mjpeg,
        probe_avi,
    )

    blob = bytearray(encode_avi_mjpeg(_clip(16, 16, 1), fps=3))
    p = bytes(blob).find(b"strh")
    blob[p + 4:p + 8] = _s.pack("<I", 32)  # lie: strh payload is 56
    try:
        probe_avi(bytes(blob))
    except AVIError:
        pass  # typed rejection is the contract; garbage parse is not


def test_avi_rec_list_interleaved_layout_decodes():
    """Frames grouped inside 'LIST rec ' sub-lists of movi (the VFW
    interleaved layout) must decode identically to the flat layout."""
    import struct as _s

    from mediawiki_to_notion_spark.functions.avi_codec import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    flat = encode_avi_mjpeg(_clip(20, 16, 3), fps=6)
    # rebuild: wrap each 00dc chunk of movi in its own 'rec ' LIST
    i = flat.find(b"LIST", flat.find(b"movi") - 8)
    (movi_size,) = _s.unpack_from("<I", flat, i + 4)
    movi_data = flat[i + 12:i + 8 + movi_size]  # after 'movi' fourcc
    pos, recs = 0, []
    while pos + 8 <= len(movi_data):
        (sz,) = _s.unpack_from("<I", movi_data, pos + 4)
        c = movi_data[pos:pos + 8 + sz + (sz % 2)]
        recs.append(b"LIST" + _s.pack("<I", 4 + len(c)) + b"rec " + c
                    + (b"\x00" if len(c) % 2 else b""))
        pos += 8 + sz + (sz % 2)
    new_movi_payload = b"movi" + b"".join(recs)
    new_movi = b"LIST" + _s.pack("<I", len(new_movi_payload)) \
        + new_movi_payload
    rebuilt = flat[:i] + new_movi + flat[i + 8 + movi_size + (movi_size % 2):]
    rebuilt = b"RIFF" + _s.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    w, h, fps, n, frames = decode_avi_mjpeg(rebuilt)
    assert (w, h, fps, n, len(frames)) == (20, 16, 6, 3, 3)
    ref = decode_avi_mjpeg(flat)[4]
    for a, b in zip(frames, ref):
        assert np.array_equal(a, b)


def test_avi_encoder_enforces_decode_caps():
    """encode must refuse what decode would refuse: valid encoder input
    always roundtrips (r5 review catch)."""
    from mediawiki_to_notion_spark.functions.avi_codec import (
        AVIError,
        MAX_FRAMES,
        encode_avi_mjpeg,
    )

    one = _clip(16, 16, 1)
    with pytest.raises(AVIError, match="cap"):
        encode_avi_mjpeg(one * (MAX_FRAMES + 1), fps=5)
    big = _clip(1024, 1024, 1) * 300  # 300 * 2^20 px > 2^28
    with pytest.raises(AVIError, match="cap"):
        encode_avi_mjpeg(big, fps=5)


def test_gif_offscreen_frame_descriptor_is_clipped():
    """A corrupt image descriptor placing the frame partly or wholly
    off the logical screen must decode (clipped) or raise GIFError —
    never a raw numpy broadcast ValueError (hypothesis catch, pinned
    explicitly: flip of the descriptor's left-position byte)."""
    from mediawiki_to_notion_spark.functions.gif_codec import (
        GIFError,
        decode_gif,
        encode_gif,
    )

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    img = (np.add.outer(np.arange(16), np.arange(16)) % 256) \
        .astype(np.uint8)
    blob = bytearray(encode_gif(img, pal))
    # image descriptor: 0x2C, left u16, top u16, w u16, h u16, flags
    p = bytes(blob).index(b"\x2c")
    for left in (16, 17, 1000):  # at/HERE/far beyond the 16-px screen
        bad = bytearray(blob)
        bad[p + 1:p + 3] = int(left).to_bytes(2, "little")
        try:
            w, h, _px = decode_gif(bytes(bad))
            assert (w, h) == (16, 16)  # logical screen wins
        except GIFError:
            pass  # typed rejection also acceptable


# ---------------------------------------------------------------------------
# FLAC (r6): Rice-coded fixed/LPC predictors, CRC framing.  No external
# FLAC reference exists in the sandbox, so the decoder-only paths (LPC,
# stereo decorrelation, Rice2, partitions, wasted bits) are pinned with
# hand-built bit streams whose expected samples the TESTS compute
# independently with numpy predictor math.

def _flac_mod():
    from mediawiki_to_notion_spark.functions import flac_codec
    return flac_codec


@pytest.mark.parametrize("channels,block", [(1, 256), (2, 256), (3, 1024)])
def test_flac_roundtrip_lossless(channels, block):
    fc = _flac_mod()
    rng = np.random.default_rng(11 + channels)
    t = np.arange(4000)
    base = 5000 * np.sin(2 * np.pi * t / 37) + rng.normal(0, 300, 4000)
    x = np.stack(
        [(base / (c + 1)).astype(np.int16) for c in range(channels)], axis=1
    )
    blob = fc.encode_flac(x, 16000, block_size=block)
    rate, ch, bps, y = fc.decode_flac(blob)
    assert (rate, ch, bps) == (16000, channels, 16)
    assert np.array_equal(y, x)
    assert fc.probe_flac(blob) == (16000, channels, 16, 4000)


def test_flac_compresses_predictable_signals():
    fc = _flac_mod()
    ramp = np.arange(-4000, 4000, dtype=np.int16)
    blob = fc.encode_flac(ramp, 8000)
    assert len(blob) < ramp.nbytes // 4
    assert np.array_equal(fc.decode_flac(blob)[3][:, 0], ramp)


def _flac_frame(fc, subframe_writers, blocksize, channels_code,
                rate=8000, bps_code=4):
    """Build one hand-rolled FLAC frame (fixed blocking, frame 0)."""
    bw = fc._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)              # 16-bit block size at end
    bw.write(13, 4)             # 16-bit sample rate at end
    bw.write(channels_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.write(0, 8)              # frame number 0
    bw.write(blocksize - 1, 16)
    bw.write(rate, 16)
    hdr = bytes(bw.out)
    bw.write(fc._crc8(hdr), 8)
    for w in subframe_writers:
        w(bw)
    bw.align()
    body = bw.getvalue()
    return body + fc._crc16(body).to_bytes(2, "big")


def _flac_stream(fc, frame, n_samples, channels, rate=8000, bps=16):
    import struct as _s

    si = _s.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) \
        | n_samples
    si += packed.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + _s.pack(">I", (1 << 31) | 34) + si + frame


def _write_verbatim(bw, samples, bps=16):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in samples:
        bw.write(int(v), bps)


def test_flac_lpc_subframe_decodes():
    """LPC order 2, coefs [3, -1], shift 1: s[i] = r[i] +
    ((3*s[i-1] - s[i-2]) >> 1) — expected values computed here."""
    fc = _flac_mod()
    warm = [100, 110]
    res = [5, -3, 7, 0, -2, 1]
    n = len(warm) + len(res)

    def lpc(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)        # LPC, order 2
        bw.write(0, 1)
        for w in warm:
            bw.write(w, 16)
        bw.write(14, 4)            # precision 15
        bw.write(1, 5)             # shift 1
        bw.write(3, 15)
        bw.write(-1, 15)
        bw.write(0, 2)             # Rice, 4-bit
        bw.write(0, 4)             # partition order 0
        bw.write(0xF, 4)           # escape partition
        bw.write(8, 5)             # raw 8-bit residuals
        for r in res:
            bw.write(r, 8)

    frame = _flac_frame(fc, [lpc], n, channels_code=0)
    _, _, _, y = fc.decode_flac(_flac_stream(fc, frame, n, 1))
    exp = list(warm)
    for r in res:
        exp.append(r + ((3 * exp[-1] - exp[-2]) >> 1))
    assert y[:, 0].tolist() == exp


@pytest.mark.parametrize("mode_code", [8, 9, 10])
def test_flac_stereo_decorrelation_modes(mode_code):
    """left/side, right/side, mid/side hand-built frames must rebuild
    the same (left, right) the test derives independently."""
    fc = _flac_mod()
    left = np.array([100, -50, 3000, 0, -32768, 32767, 7, -1],
                    dtype=np.int64)
    right = np.array([90, -60, 2990, 5, -32768, 32760, -7, 1],
                     dtype=np.int64)
    side = left - right
    if mode_code == 8:
        ch0, b0, ch1, b1 = left, 16, side, 17
    elif mode_code == 9:
        ch0, b0, ch1, b1 = side, 17, right, 16
    else:
        mid = (left + right) >> 1
        ch0, b0, ch1, b1 = mid, 16, side, 17
    frame = _flac_frame(
        fc,
        [lambda bw: _write_verbatim(bw, ch0, b0),
         lambda bw: _write_verbatim(bw, ch1, b1)],
        len(left), channels_code=mode_code,
    )
    _, _, _, y = fc.decode_flac(_flac_stream(fc, frame, len(left), 2))
    assert y[:, 0].tolist() == left.tolist()
    assert y[:, 1].tolist() == right.tolist()


def test_flac_rice2_partitions_and_wasted_bits():
    """5-bit Rice2 method, partition order 1, plus 2 wasted bits on a
    fixed-order-1 subframe."""
    fc = _flac_mod()
    n = 8
    # samples all multiples of 4 -> 2 wasted bits; fixed order 1
    samples = [4, 8, 20, 16, 4, 0, -8, -4]
    shifted = [s >> 2 for s in samples]
    res = [shifted[0]] + [shifted[i] - shifted[i - 1] for i in range(1, n)]

    def sub(bw):
        bw.write(0, 1)
        bw.write(9, 6)             # FIXED order 1
        bw.write(1, 1)             # wasted-bits flag
        bw.write(1, 2)             # unary 01 -> wasted = 2
        bw.write(shifted[0], 14)   # warmup at bps - wasted
        bw.write(1, 2)             # residual method: Rice2
        bw.write(1, 4)             # partition order 1 -> 2 partitions
        for part, lo, hi in ((0, 1, 4), (1, 4, 8)):
            bw.write(2, 5)         # rice2 param k=2
            for r in res[lo:hi]:
                u = r * 2 if r >= 0 else -r * 2 - 1
                bw.write_unary(u >> 2)
                bw.write(u, 2)

    frame = _flac_frame(fc, [sub], n, channels_code=0)
    _, _, _, y = fc.decode_flac(_flac_stream(fc, frame, n, 1))
    assert y[:, 0].tolist() == samples


def test_flac_errors_and_bomb_caps():
    fc = _flac_mod()
    x = np.arange(100, dtype=np.int16)
    blob = bytearray(fc.encode_flac(x, 8000))
    with pytest.raises(fc.FLACError):
        fc.decode_flac(b"NOPE" + bytes(blob[4:]))
    # declared sample volume above cap must refuse pre-decode
    big = bytearray(blob)
    packed = int.from_bytes(big[18:26], "big")
    packed = (packed & ~((1 << 36) - 1)) | (fc.MAX_SAMPLES + 1)
    big[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(fc.FLACError):
        fc.probe_flac(bytes(big))
    # corrupt frame CRC-16 -> typed error
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(fc.FLACError):
        fc.decode_flac(bytes(bad))
    # encoder input validation
    with pytest.raises(fc.FLACError):
        fc.encode_flac(x.astype(np.int32), 8000)
    with pytest.raises(fc.FLACError):
        fc.encode_flac(x, 0)
    with pytest.raises(fc.FLACError):
        fc.encode_flac(np.zeros((0,), dtype=np.int16), 8000)


def test_flac_truncation_and_bitflips_never_hang():
    fc = _flac_mod()
    rng = np.random.default_rng(5)
    x = (rng.normal(0, 2000, 3000)).astype(np.int16)
    blob = fc.encode_flac(x, 8000, block_size=256)
    for cut in (3, 4, 7, 8, 41, 42, 80, len(blob) // 2, len(blob) - 2):
        try:
            fc.decode_flac(blob[:cut])
        except fc.FLACError:
            pass
    for _ in range(60):
        noisy = bytearray(blob)
        for i in rng.integers(0, len(blob), size=4):
            noisy[i] ^= int(rng.integers(1, 256))
        try:
            fc.decode_flac(bytes(noisy))
        except fc.FLACError:
            pass
