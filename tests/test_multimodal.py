"""Multimodal plumbing: schema, actor-pool signature, stub semantics."""

import pytest

import ray.data

from etlray.functions import multimodal as M


@pytest.fixture(scope="module")
def media_ds(ray_session):
    return ray.data.from_arrow(M.synth_media_table(32))


def test_decode_stub_emits_dims(media_ds):
    out = media_ds.map_batches(M.ImageDecodeStage, batch_format="pyarrow",
                               batch_size=8, concurrency=1).take_all()
    assert len(out) == 32
    assert all(isinstance(r["decoded_width"], int) for r in out)
    # deterministic: same payload → same fake dims across runs
    again = media_ds.map_batches(M.ImageDecodeStage, batch_format="pyarrow",
                                 batch_size=8, concurrency=1).take_all()
    assert [r["decoded_width"] for r in out] == [r["decoded_width"] for r in again]


def test_feature_stage_schema(media_ds):
    out = media_ds.map_batches(
        M.ImageFeatureStage, fn_constructor_kwargs={"dim": 16},
        batch_format="pyarrow", batch_size=8, concurrency=1)
    rows = out.take(3)
    assert all(len(r["features"]) == 16 for r in rows)


def test_strict_mode_raises(media_ds):
    with pytest.raises(Exception):  # NotImplementedError surfaces via Ray
        media_ds.map_batches(
            M.ImageFeatureStage, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", batch_size=8, concurrency=1).take_all()


def test_frame_sampler_layout(media_ds):
    out = media_ds.map_batches(M.FrameSampleStage, batch_format="pyarrow",
                               batch_size=8, concurrency=1)
    rows = out.take_all()
    assert len(rows) == 32 * 4
    assert {r["frame_index"] for r in rows} == {0, 1, 2, 3}


# ---- real no-dependency codec paths (BMP / WAV) ----

def test_bmp_roundtrip():
    import numpy as np

    from etlray.functions import multimodal as M

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd width → row padding
    out = M.decode_bmp(M.encode_bmp(img))
    assert out is not None and np.array_equal(out, img)
    assert M.decode_bmp(b"not a bmp") is None


def test_wav_roundtrip():
    import numpy as np

    from etlray.functions import multimodal as M

    samples = (np.sin(np.linspace(0, 20, 400)) * 10000).astype(np.int16)
    x, rate = M.decode_wav(M.encode_wav(samples, rate=8000))
    assert rate == 8000 and len(x) == 400
    assert np.allclose(x, samples / 32768.0, atol=1e-4)
    assert M.decode_wav(b"junk") is None


def test_image_decode_real_bmp_dims(ray_session):
    import ray.data

    from etlray.functions import multimodal as M

    tbl = M.synth_bmp_table(n=12)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(M.ImageDecodeStage, fn_constructor_args=("payload", True),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).take_all()
    for r in out:
        assert r["decoded_width"] == r["width"]   # REAL decode, strict=True
        assert r["decoded_height"] == r["height"]


def test_image_resize_and_features_real(ray_session):
    import ray.data

    from etlray.functions import multimodal as M

    ds = ray.data.from_arrow(M.synth_bmp_table(n=6))
    out = ds.map_batches(M.ImageResizeStage, fn_constructor_args=("payload", 16, 16, True),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).take_all()
    for r in out:
        img = M.decode_bmp(r["resized_payload"])
        assert img.shape == (16, 16, 3)
    feats = ray.data.from_arrow(M.synth_bmp_table(n=6)).map_batches(
        M.ImageFeatureStage, fn_constructor_args=("payload", 64, True),
        batch_format="pyarrow", batch_size=4, concurrency=2).take_all()
    for r in feats:
        v = r["features"]
        assert len(v) == 64 and all(0.0 <= x <= 1.0 for x in v)


def test_audio_features_real(ray_session):
    import ray.data

    from etlray.functions import multimodal as M

    ds = ray.data.from_arrow(M.synth_wav_table(n=5))
    out = ds.map_batches(M.AudioFeatureStage, fn_constructor_args=("payload", True),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).take_all()
    for r in out:
        assert r["duration_sec"] == pytest.approx(r["duration_hint"], abs=0.01)
        assert 0.1 < r["rms"] < 0.5               # sine at 12k/32768 amplitude
        assert r["spectral_centroid"] > 50


def test_png_roundtrip_all_filters():
    import numpy as np

    from etlray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(12)
    for ft in range(5):
        img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type=ft))
        assert out is not None and np.array_equal(out, img), ft


def test_png_rejects_non_png_and_unsupported():
    from etlray.functions.multimodal import decode_png, encode_bmp
    import numpy as np

    assert decode_png(b"") is None
    assert decode_png(b"not a png at all") is None
    bmp = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    assert decode_png(bmp) is None


def test_png_query_strict_decodes_real_dims(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    from etlray.queries import QUERIES

    out = QUERIES["multimodal_decode_png"]("/root/testdata/sf0.001").take_all()
    from etlray.functions.multimodal import synth_png_table

    t = synth_png_table(256)
    want = {(m, w, h) for m, w, h in zip(t["media_id"].to_pylist(),
                                         t["width"].to_pylist(),
                                         t["height"].to_pylist())}
    got = {(r["media_id"], r["decoded_width"], r["decoded_height"])
           for r in out}
    assert got == want


def test_resize_stage_reencodes_png_as_png(ray_session):
    import ray.data

    from etlray.functions.multimodal import (ImageResizeStage, decode_png,
                                             synth_png_table)

    ds = ray.data.from_arrow(synth_png_table(8))
    out = ds.map_batches(ImageResizeStage,
                         fn_constructor_kwargs={"out_w": 12, "out_h": 9,
                                                "strict": True},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1).take_all()
    for r in out:
        img = decode_png(r["resized_payload"])
        assert img is not None and img.shape == (9, 12, 3)


def test_jpeg_roundtrip_both_subsamplings():
    import numpy as np

    from etlray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    for shape in [(8, 8), (16, 16), (24, 17), (33, 41)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        y_in = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])
        for sub in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(img, subsampling=sub))
            assert out is not None and out.shape == img.shape
            if sub == "4:4:4":
                # flat quant 4/6: full round-trip stays within the
                # quantization bound even on noise
                assert np.abs(out.astype(int) - img.astype(int)).max() <= 16
            # luma is preserved under BOTH samplings (chroma is
            # genuinely lossy at 4:2:0 on noise — that's the codec
            # working, not a bug). Bound is loose because luma here is
            # recomputed from the CLIPPED RGB: a pixel whose averaged
            # chroma drives a channel past [0,255] shifts its apparent
            # luma after the clamp (standard JPEG behavior).
            y_out = (0.299 * out[..., 0] + 0.587 * out[..., 1]
                     + 0.114 * out[..., 2])
            assert np.abs(y_in - y_out).max() <= 40
            assert np.abs(y_in - y_out).mean() <= 3


def test_jpeg_smooth_near_lossless():
    import numpy as np

    from etlray.functions.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 64)
    img = np.repeat(np.repeat(x[None, :, None], 64, 0), 3, 2) \
        .astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rejects_garbage_and_non_baseline():
    from etlray.functions.jpeg import decode_jpeg
    from etlray.functions.multimodal import encode_bmp

    import numpy as np

    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only
    bmp = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    assert decode_jpeg(bmp) is None


def test_jpeg_query_strict_decodes_real_dims(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    from etlray.queries import QUERIES

    out = QUERIES["multimodal_decode_jpeg"]("/root/testdata/sf0.001") \
        .take_all()
    from etlray.functions.multimodal import synth_jpeg_table

    t = synth_jpeg_table(128)
    want = {(m, w, h) for m, w, h in zip(t["media_id"].to_pylist(),
                                         t["width"].to_pylist(),
                                         t["height"].to_pylist())}
    got = {(r["media_id"], r["decoded_width"], r["decoded_height"])
           for r in out}
    assert got == want


def test_jpeg_nonflat_quant_table_decodes(monkeypatch):
    """Regression: the decoder must dequantize ZIGZAG-ordered
    coefficients with the quant table in zigzag order too — with a
    non-flat table (every real-world JPEG) a natural-order multiply
    decodes to garbage (max error 247 observed before the fix)."""
    import numpy as np

    from etlray.functions import jpeg as J

    q_l = np.full(64, 2, dtype=np.int64)
    q_l[8] = 40            # natural-order position (1,0): non-flat
    q_l[1] = 24
    q_c = np.full(64, 3, dtype=np.int64)
    q_c[9] = 30
    monkeypatch.setattr(J, "_QUANT_LUMA", q_l)
    monkeypatch.setattr(J, "_QUANT_CHROMA", q_c)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out is not None
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 60 and err.mean() <= 12  # quant-bounded, not garbage


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes — inject some between segments and decode."""
    import numpy as np

    from etlray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    # insert fill bytes before the DQT marker (first 0xFF 0xDB)
    i = bytes(enc).index(b"\xff\xdb")
    padded = bytes(enc[:i]) + b"\xff\xff\xff" + bytes(enc[i:])
    out = decode_jpeg(padded)
    assert out is not None and out.shape == img.shape


def test_resize_stage_reencodes_jpeg_as_jpeg(ray_session):
    """Decoded JPEG payloads must re-encode as JPEG — the old binary
    png-vs-bmp flag silently turned them into uncompressed BMPs."""
    import ray.data

    from etlray.functions.jpeg import decode_jpeg
    from etlray.functions.multimodal import (ImageResizeStage,
                                             synth_jpeg_table)

    ds = ray.data.from_arrow(synth_jpeg_table(4))
    out = ds.map_batches(ImageResizeStage,
                         fn_constructor_kwargs={"out_w": 12, "out_h": 9,
                                                "strict": True},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=1).take_all()
    for r in out:
        p = r["resized_payload"]
        assert p[:2] == b"\xff\xd8"          # still a JPEG container
        img = decode_jpeg(p)
        assert img is not None and img.shape == (9, 12, 3)


def test_audio_zero_frame_duration_is_zero():
    import numpy as np
    import pyarrow as pa

    from etlray.functions.multimodal import AudioFeatureStage, encode_wav

    empty = encode_wav(np.array([], dtype=np.int16), rate=8000)
    stage = AudioFeatureStage(strict=True)
    out = stage(pa.table({"payload": pa.array([empty], pa.binary())}))
    assert out["duration_sec"][0].as_py() == 0.0


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn path: encode with restart intervals (DC predictors
    reset, RSTn cycling D0-D7), decode through the segment-split LUT
    path, and match the no-restart decode exactly — restart markers
    change the stream framing, not the pixels."""
    import numpy as np

    from etlray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        plain = decode_jpeg(encode_jpeg(img, subsampling=sub))
        for interval in (1, 2, 5):  # exercises >8 RSTs → index cycling
            enc = encode_jpeg(img, subsampling=sub,
                              restart_mcus=interval)
            assert b"\xff\xdd" in enc  # DRI present
            out = decode_jpeg(enc)
            assert out is not None
            assert np.array_equal(out, plain), (sub, interval)


def test_jpeg_encode_rejects_bad_restart_interval():
    """The DRI interval is a 2-byte field: out-of-range values must be
    an up-front ValueError, not a struct.error after the full encode."""
    import numpy as np

    from etlray.functions.jpeg import encode_jpeg

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for bad in (70000, -3):
        with pytest.raises(ValueError, match="restart_mcus"):
            encode_jpeg(img, restart_mcus=bad)


def test_jpeg_windowed_entropy_decode_refill(monkeypatch):
    """The per-window lookahead list (memory fix: no whole-scan boxed
    int list) must decode identically when the scan spans MANY refill
    windows. Forced by shrinking the window to 4 KiB on a noise image
    whose restart-free scan is tens of KiB."""
    import numpy as np

    from etlray.functions import jpeg as J

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    enc = J.encode_jpeg(img)  # no restarts → ONE entropy segment
    assert len(enc) > 16384  # scan large enough to need >1 window
    plain = J.decode_jpeg(enc)
    assert plain is not None
    monkeypatch.setattr(J, "_SEG_WINDOW_BYTES", 4096)
    monkeypatch.setattr(J, "_SEG_SLACK_BYTES", 2048)
    out = J.decode_jpeg(enc)
    assert out is not None
    assert np.array_equal(out, plain)
