"""Codec round trips, adversarial format details, and the real-decode
Spark plumbing (batch shape, fan-out cardinality, sniff dispatch)."""

import numpy as np
import pytest

from lnex_spark.operators import media_codec as mc


RNG = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (13, 17), (16, 32), (7, 1)])
def test_bmp_roundtrip(h, w):
    # odd widths exercise the 4-byte row-pad path
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (mc.decode_bmp(mc.encode_bmp(px)) == px).all()


def test_bmp_channel_order_and_row_order():
    # a pixel with distinct R/G/B in a known corner pins BGR + bottom-up
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = [10, 20, 30]  # top-left
    px[1, 1] = [200, 100, 50]  # bottom-right
    b = mc.encode_bmp(px)
    out = mc.decode_bmp(b)
    assert list(out[0, 0]) == [10, 20, 30]
    assert list(out[1, 1]) == [200, 100, 50]


@pytest.mark.parametrize("h,w", [(1, 1), (5, 9), (16, 32)])
def test_ppm_roundtrip(h, w):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (mc.decode_ppm(mc.encode_ppm(px)) == px).all()


def test_ppm_header_with_comment():
    px = RNG.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    raw = b"P6\n# a netpbm comment line\n3 2\n255\n" + px.tobytes()
    assert (mc.decode_ppm(raw) == px).all()


def test_pgm_roundtrip():
    g = RNG.integers(0, 256, (6, 7), dtype=np.uint8)
    assert (mc.decode_pgm(mc.encode_pgm(g)) == g).all()


def test_wav_roundtrip_mono_and_stereo():
    s = RNG.integers(-32768, 32768, 4321).astype(np.int16)
    d, rate, ch = mc.decode_wav(mc.encode_wav(s, 22050))
    assert (d == s).all() and rate == 22050 and ch == 1

    st = RNG.integers(-32768, 32768, (100, 2)).astype(np.int16)
    d2, rate2, ch2 = mc.decode_wav(mc.encode_wav(st, 8000, channels=2))
    assert d2.shape == (100, 2) and (d2 == st).all() and ch2 == 2


def test_wav_chunk_walk_skips_list_chunk():
    # a LIST chunk before data is legal RIFF; fixed-44-byte parsers break
    import struct

    s = np.arange(-5, 5, dtype=np.int16)
    b = mc.encode_wav(s, 16000)
    # splice an odd-length LIST chunk between fmt and data (tests 2-byte alignment too)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    spliced = struct.pack("<4sI", b"RIFF", len(spliced) - 8) + spliced[8:]
    d, rate, _ = mc.decode_wav(spliced)
    assert (d == s).all() and rate == 16000


def test_vid_container():
    frames = [RNG.integers(0, 256, (4, 6, 3), dtype=np.uint8) for _ in range(5)]
    b = mc.encode_vid(frames)
    assert mc.vid_frame_count(b) == 5
    for k, f in mc.iter_vid_frames(b):
        assert (f == frames[k]).all()
    assert (mc.decode_vid_frame(b, 3) == frames[3]).all()
    with pytest.raises(IndexError):
        mc.decode_vid_frame(b, 5)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_resize_nn_matches_naive():
    px = RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    out = mc.resize_nn(px, 5, 7)
    ref = np.array([[px[(i * 13) // 5, (j * 17) // 7] for j in range(7)] for i in range(5)])
    assert (out == ref).all()


def test_resize_nn_identity_and_upscale():
    px = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert (mc.resize_nn(px, 4, 4) == px).all()
    up = mc.resize_nn(px, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == px).all()  # each src pixel lands on the even grid


def test_luminance_histogram_integer_exact():
    px = np.full((2, 2, 3), 255, dtype=np.uint8)
    h = mc.luminance_histogram(px, bins=8)
    # Y = (77+150+29)*255 >> 8 = 255 -> top bin
    assert h[7] == 4 and h.sum() == 4


def test_audio_stats():
    s = np.array([3, -1, 0, 2, -2], dtype=np.int16)
    st = mc.audio_stats(s)
    assert st == {
        "n_samples": 5,
        "amp_sum": 2,
        "abs_sum": 8,
        "peak": 3,
        "zero_cross": 2,  # 3->-1 and 2->-2 (0 boundaries are not strict sign flips)
    }


def test_sniff_dispatch():
    px = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    assert mc.sniff(mc.encode_bmp(px)) == "bmp"
    assert mc.sniff(mc.encode_ppm(px)) == "ppm"
    assert mc.sniff(mc.encode_pgm(px[:, :, 0])) == "pgm"
    assert mc.sniff(mc.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert mc.sniff(mc.encode_vid([px])) == "vid0"
    assert mc.sniff(b"\xff\xd8\xff\xe0 jpeg") == "unknown"
    with pytest.raises(NotImplementedError):
        mc.decode_image(b"\xff\xd8\xff\xe0 jpeg")  # JPEG stays env-gated
    # a bare PNG signature now dispatches to the real decoder, which
    # rejects the truncated stream
    assert mc.sniff(b"\x89PNG\r\n\x1a\n") == "png"
    with pytest.raises(ValueError, match="IHDR"):
        mc.decode_image(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def test_real_media_ops_end_to_end(spark):
    from lnex_spark.operators.multimodal import (
        _synth_payload,
        audio_stats_op,
        frame_stats,
        image_stats,
        resize_stats,
        synthesize_real_media,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    media = synthesize_real_media(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 30
    # payloads are the exact deterministic bytes
    for mid in (0, 1, 2, 7, 11):
        kind, payload = _synth_payload(mid)
        assert rows[mid]["kind"] == kind
        assert bytes(rows[mid]["payload"]) == payload

    img = {r["media_id"]: r for r in image_stats(media).collect()}
    assert set(img) == {m for m in range(30) if m % 3 == 0}
    for mid, r in img.items():
        expect = 16 * sum((c + ch + mid) % 256 for c in range(32) for ch in range(3))
        assert r["px_sum"] == expect
        assert r["fmt"] == (
            "bmp" if mid % 2 == 0 else ("ppm" if mid % 4 == 1 else "png")
        )

    aud = {r["media_id"]: r for r in audio_stats_op(media).collect()}
    for mid, r in aud.items():
        assert r["amp_sum"] == sum((7 * i + mid) % 512 - 256 for i in range(2000))
        assert r["n_samples"] == 2000

    # fan-out cardinality: one video row -> n_frames output rows
    fr = frame_stats(media).groupBy("media_id").count().collect()
    for r in fr:
        assert r["count"] == r["media_id"] % 5 + 1

    rs = {r["media_id"]: r for r in resize_stats(media).collect()}
    for mid, r in rs.items():
        expect = 8 * sum((4 * cc + ch + mid) % 256 for cc in range(8) for ch in range(3))
        assert r["px_sum"] == expect


def test_decode_features_real_decoder(spark):
    """use_real_decoder=True now genuinely decodes BMP/PPM/WAV/VID0."""
    from lnex_spark.operators.multimodal import decode_features, synthesize_real_media

    docs = spark.range(0, 9).withColumnRenamed("id", "doc_id")
    media = synthesize_real_media(docs)
    feats = {r["media_id"]: r for r in decode_features(media, use_real_decoder=True).collect()}
    assert len(feats) == 9
    # image feature[0..2] are channel means: mean over c of (c+ch+mid)%256
    for mid in (0, 3, 6):
        for ch in range(3):
            expect = sum((c + ch + mid) % 256 for c in range(32)) / 32
            assert abs(feats[mid]["feature"][ch] - expect) < 1e-9
    # audio feature[4] = n_samples, [5] = rate
    for mid in (1, 4, 7):
        assert feats[mid]["feature"][4] == 2000.0
        assert feats[mid]["feature"][5] == 16000.0
    # video feature[7] = frame count
    for mid in (2, 5, 8):
        assert feats[mid]["feature"][7] == float(mid % 5 + 1)


def test_real_decoder_env_gate(spark):
    """Unknown magic (JPEG) still raises — the honest env-gate."""
    import pandas as pd

    from lnex_spark.operators.multimodal import decode_features

    pdf = pd.DataFrame(
        {"media_id": [1], "kind": ["image"], "payload": [b"\xff\xd8\xff\xe0fakejpeg"], "meta": [None]}
    )
    media = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="no pure-Python decoder"):
        decode_features(media, use_real_decoder=True).collect()


def test_image_stats_pgm_grayscale(spark):
    """image_stats claims formats mix freely in one column — a PGM
    (single-channel) payload must not crash the BT.601 luma math
    (regression: px[:, :, 1] IndexError on (H, W, 1) arrays)."""
    from lnex_spark.operators.multimodal import image_stats

    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    rows = [(0, "image", bytearray(mc.encode_pgm(g)))]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = image_stats(media).collect()[0]
    assert got["fmt"] == "pgm" and (got["width"], got["height"]) == (8, 6)
    assert got["px_sum"] == int(g.sum())
    assert got["y_sum"] == int(g.sum())  # BT.601 of equal channels = identity


def test_png_round_trip_all_filters():
    """encode_png(filters='cycle') writes one row per filter type
    (None/Sub/Up/Average/Paeth for >=5 rows); decode must invert all
    five, for RGB, grayscale, and RGBA."""
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, (9, 13, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgb)), rgb)
    gray = rng.randint(0, 256, (7, 5), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(gray))[:, :, 0], gray)
    rgba = rng.randint(0, 256, (6, 4, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba)), rgba)
    # filter 0 only
    assert np.array_equal(mc.decode_png(mc.encode_png(rgb, filters="none")), rgb)


def test_png_filters_match_spec_reference():
    """Decode against an independently filtered raster: filters applied
    with the literal spec §9 formulas in this test (per-byte Python),
    not via the codec's vectorized encoder."""
    import struct as st
    import zlib

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    h, w, ch = px.shape
    rows = px.reshape(h, w * ch).astype(int)
    raster = bytearray()
    for r in range(h):
        ft = r % 5
        raster.append(ft)
        for i in range(w * ch):
            x = rows[r][i]
            a = rows[r][i - ch] if i >= ch else 0          # left
            b = rows[r - 1][i] if r > 0 else 0             # up
            c = rows[r - 1][i - ch] if (r > 0 and i >= ch) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pred
            raster.append(v & 255)
    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raster))) + chunk(b"IEND", b""))
    assert np.array_equal(mc.decode_png(png), px)


def test_png_palette():
    import struct as st
    import zlib

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = st.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raster = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b""))
    assert np.array_equal(mc.decode_png(png), pal[idx])


def test_png_rejects_corrupt_crc_and_sniffs():
    good = mc.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert mc.sniff(good) == "png"
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_png(bytes(bad))
    assert np.array_equal(
        mc.decode_image(good), np.zeros((4, 4, 3), dtype=np.uint8)
    )
