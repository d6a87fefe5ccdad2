"""Tests for STM stats, harmonic fit, SeriesUDF, sampling/splits,
class weights, confusion matrix, multimodal stages, transforms."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.stages.extract import extract, to_long
from sits_classification_ray.stages.multimodal import (BinaryFeatureExtract,
                                                       binary_features,
                                                       sample_frames)
from sits_classification_ray.stages.sampling import (class_weights,
                                                     classification_report,
                                                     confusion_matrix,
                                                     stratified_sample,
                                                     train_test_split)
from sits_classification_ray.stages.series import assemble_series
from sits_classification_ray.stages.stm import (HarmonicFit, apply_series_udf,
                                                temporal_metrics)

CFG = EngineConfig()


def _long(crawl_ds):
    return to_long(assemble_series(extract(crawl_ds, CFG), CFG), CFG.metrics)


def test_temporal_metrics_values(crawl_ds, crawl_pdf):
    got = temporal_metrics(_long(crawl_ds)).to_pandas()
    row = got[(got["metric"] == "text_len")].iloc[0]
    # recompute that url's stats in plain numpy
    from sits_classification_ray.oracle.reference import (dedup_oracle,
                                                          extract_oracle)
    obs = dedup_oracle(extract_oracle(crawl_pdf, CFG.n_buckets))
    v = obs[obs["url"] == row["url"]]["text_len"].to_numpy(np.float64)
    assert row["count"] == len(v)
    assert row["min"] == v.min() and row["max"] == v.max()
    assert row["q50"] == round(float(np.quantile(v, 0.5)), 6)
    assert row["mean"] == round(v.sum() / len(v), 6)


def test_harmonic_fit_recovers_signal():
    # pure harmonic input → fit must reproduce it almost exactly
    h = HarmonicFit(period_seconds=86400.0, k=1, grid_seconds=3600)
    ts = (np.arange(0, 72) * 3_600_000_000).astype(np.int64)
    vals = 5.0 + 2.0 * np.cos(2 * np.pi * ts / 86400e6) \
        + 1.0 * np.sin(2 * np.pi * ts / 86400e6)
    grid, pred = h.apply(ts, vals)
    expect = 5.0 + 2.0 * np.cos(2 * np.pi * grid / 86400e6) \
        + 1.0 * np.sin(2 * np.pi * grid / 86400e6)
    np.testing.assert_allclose(pred, expect, atol=1e-8)
    assert h.residual_std(ts, vals) < 1e-8


def test_series_udf_runs_distributed(crawl_ds):
    udf = HarmonicFit(period_seconds=7 * 86400.0, k=2, grid_seconds=86400)
    out = apply_series_udf(_long(crawl_ds), udf).to_pandas()
    assert len(out) > 0
    assert set(out["metric"]) == {"harmonic"}
    assert out["value"].notna().all()


def test_stratified_sample_deterministic_and_proportional():
    n = 20000
    df = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                   "lang": pa.array(["en", "de"] * (n // 2), pa.string())})
    ds = rd.from_arrow(df)
    s1 = stratified_sample(ds, "lang", 0.3, seed=1).to_pandas()
    s2 = stratified_sample(ds, "lang", 0.3, seed=1).to_pandas()
    pd.testing.assert_frame_equal(
        s1.sort_values("doc_id").reset_index(drop=True),
        s2.sort_values("doc_id").reset_index(drop=True))
    rate = len(s1) / n
    assert 0.25 < rate < 0.35
    # per-stratum dict rates
    s3 = stratified_sample(ds, "lang", {"en": 0.5, "de": 0.0},
                           seed=1).to_pandas()
    assert set(s3["lang"]) == {"en"}


def test_train_test_split_sizes():
    ds = rd.range(1000)
    train, test = train_test_split(ds, test_frac=0.2, seed=42)
    nt, ns = train.count(), test.count()
    assert nt + ns == 1000
    assert abs(ns - 200) <= 1


def test_class_weights_inverse_frequency():
    t = pa.table({"label": pa.array([0] * 30 + [1] * 10, pa.int64())})
    out = class_weights(rd.from_arrow(t), "label")
    assert list(out["n"]) == [30, 10]
    assert out["weight"].iloc[0] == 40 / (30 * 2)
    assert out["weight"].iloc[1] == 40 / (10 * 2)


def test_confusion_matrix_and_report():
    t = pa.table({"truth": pa.array(["a", "a", "b", "b", "b"]),
                  "pred": pa.array(["a", "b", "b", "b", "a"])})
    conf = confusion_matrix(rd.from_arrow(t), "truth", "pred")
    rep = classification_report(conf, "truth", "pred")
    assert rep["n"] == 5
    assert rep["accuracy"] == 3 / 5
    assert rep["per_class"]["b"]["precision"] == 2 / 3


def test_binary_features_deterministic():
    ext = BinaryFeatureExtract(payload_col="p")
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "p": pa.array([b"aaaa", b"ab12 \t"], pa.binary())})
    out = ext(t).to_pandas()
    assert out["byte_len"].tolist() == [4, 6]
    assert out["entropy"].iloc[0] == 0.0        # constant bytes
    assert out["frac_lower"].iloc[0] == 1.0
    assert out["mode_byte"].iloc[0] == ord("a")


def test_binary_features_strict_stub_raises():
    ext = BinaryFeatureExtract(payload_col="p", strict=True)
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "p": pa.array([b"x"], pa.binary())})
    with pytest.raises(NotImplementedError):
        ext(t)


def test_frame_sampler_layout(crawl_ds):
    ds = crawl_ds.rename_columns({"url": "asset_id"})
    frames = sample_frames(ds.limit(50), n_frames=4, payload_col="html",
                           id_col="asset_id").to_pandas()
    assert len(frames) == 50 * 4
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    # every asset row exploded to exactly n_frames rows (a url can have
    # several snapshots → its count is a multiple of 4)
    counts = frames.groupby("asset_id").size()
    assert (counts % 4 == 0).all()


def test_transforms_roundtrip():
    from sits_classification_ray.functions.transforms import (exp10m1_column,
                                                              log1p10_column,
                                                              scale_column,
                                                              unscale_column)

    ds = rd.from_arrow(pa.table({"y": pa.array([0.0, 9.0, 99.0])}))
    fwd = log1p10_column(ds, "y", "p")
    back = exp10m1_column(fwd, "p", "y2").to_pandas()
    np.testing.assert_allclose(back["y2"], back["y"], atol=1e-9)
    np.testing.assert_allclose(back["p"], [0.0, 1.0, 2.0])

    s = unscale_column(scale_column(ds, "y", 1e-4, "s"), "s", 1e-4,
                       "y3").to_pandas()
    np.testing.assert_allclose(s["y3"], s["y"])

def test_weighted_sample_proportional_to_weight(ray_session):
    """A-ES property: heavy items are sampled far more often. One
    item with 100x the weight of 999 others must appear in the k=10
    sample; determinism: identical output across partitionings."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.sampling import weighted_sample

    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "g": ["x"] * 1000,
                       "w": np.where(np.arange(1000) == 7, 10000.0, 1.0)})
    s1 = weighted_sample(rd.from_pandas(df).repartition(2),
                         ["g"], "id", "w", k=10).to_pandas()
    s2 = weighted_sample(rd.from_pandas(df).repartition(17),
                         ["g"], "id", "w", k=10).to_pandas()
    assert len(s1) == 10
    assert 7 in set(s1["id"])                    # heavy item selected
    assert sorted(s1["id"]) == sorted(s2["id"])  # partition-invariant


def test_pgm_roundtrip_and_resize(ray_session):
    """PGM encode→parse roundtrip; nearest-neighbor identity when
    out size == in size; known 2x downsample takes top-left pixels."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.multimodal import (PgmThumbnailer,
                                                           make_pgm,
                                                           parse_pgm,
                                                           resize_pgm)

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    p = make_pgm(img.tobytes(), 4, 4)
    w, h, off = parse_pgm(p)
    assert (w, h) == (4, 4)
    assert np.frombuffer(p, np.uint8, 16, off).reshape(4, 4).tolist() \
        == img.tolist()

    ds = rd.from_pandas(pd.DataFrame({"id": [1], "payload": [p]}))
    out = resize_pgm(ds, out_w=2, out_h=2).to_pandas()
    w2, h2, off2 = parse_pgm(out["thumb"].iloc[0])
    small = np.frombuffer(out["thumb"].iloc[0], np.uint8, 4, off2)
    # floor(i*4/2) -> rows/cols 0 and 2
    assert small.tolist() == [0, 2, 8, 10]
    assert out["pixel_sum"].iloc[0] == 0 + 2 + 8 + 10


def test_wav_roundtrip_and_features(ray_session):
    """WAV encode→parse roundtrip and exact feature values on a known
    signal: alternating +1/−1 has max zero crossings; a loud tail
    moves the peak frame."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.multimodal import (make_wav,
                                                           parse_wav,
                                                           wav_features)

    x = np.zeros(600, np.int16)
    x[:10] = np.array([1, -1] * 5, np.int16)   # 9 sign flips
    x[512:600] = 100                           # frame 2 is loudest
    wav = make_wav(x.tobytes(), sample_rate=16000)
    rate, back = parse_wav(wav)
    assert rate == 16000 and np.array_equal(back, x)

    ds = rd.from_pandas(pd.DataFrame({"id": [1], "payload": [wav]}))
    out = wav_features(ds, frame=256).to_pandas().iloc[0]
    assert out["n_samples"] == 600
    assert out["energy"] == 10 * 1 + 88 * 100 * 100
    assert out["zero_crossings"] == 9
    assert out["peak_frame"] == 2


def test_y4m_roundtrip_and_scene_cut(ray_session):
    """Y4M encode→parse roundtrip; identical consecutive frames give
    l1=0/no cut; an inverted frame fires the cut flag."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.multimodal import (make_y4m,
                                                           parse_y4m,
                                                           y4m_scene_stats)

    a = np.full(64, 10, np.uint8)
    inv = (255 - a)
    y4m = make_y4m([a.tobytes(), a.tobytes(), inv.tobytes()], 8, 8)
    w, h, frames = parse_y4m(y4m)
    assert (w, h, len(frames)) == (8, 8, 3)
    assert np.array_equal(frames[2], inv.reshape(8, 8))

    ds = rd.from_pandas(pd.DataFrame({"vid": [7], "payload": [y4m]}))
    out = y4m_scene_stats(ds, id_cols=("vid",)).to_pandas() \
        .sort_values("frame_idx")
    assert out["l1_prev"].tolist() == [0, 0, 64 * 235]
    assert out["is_cut"].tolist() == [False, False, True]
    assert out["luma_sum"].tolist() == [640, 640, 64 * 245]


def test_stl_decompose_additive_identity_and_seasonality(ray_session):
    """value == trend + seasonal + residual (to rounding); a planted
    weekly pattern shows up in the seasonal component."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.stm import stl_decompose_daily

    days = pd.date_range("2024-01-01", periods=56, freq="D")
    dow_effect = np.array([0, 0, 0, 0, 0, 30, 30])  # weekend bump
    rows = pd.DataFrame({
        "url": "u", "metric": "m", "warc_ts": days,
        "value": (100.0 + dow_effect[days.dayofweek]),
    })
    out = stl_decompose_daily(rd.from_pandas(rows)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert len(out) == 56
    recon = out["trend"] + out["seasonal"] + out["residual"]
    assert np.allclose(recon, out["value"], atol=2e-6)
    mid = out.iloc[7:-7]       # away from edge-shrunk windows
    dow = pd.DatetimeIndex(mid["day"]).dayofweek
    assert mid.loc[dow >= 5, "seasonal"].mean() > \
        mid.loc[dow < 5, "seasonal"].mean() + 10


def test_png_codec_roundtrip_and_thumbnail(ray_session):
    """PNG encode→decode identity for gray and RGB (all five scanline
    filters exercised — heights ≥ 5 rows cycle 0..4), a hand-checked
    Paeth vector, honest NotImplementedError on unsupported variants,
    and the actor-pool thumbnail stage on a known gradient."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.multimodal import (PngThumbnailer,
                                                           _paeth,
                                                           decode_png,
                                                           make_png,
                                                           png_thumbnails)

    # spec §9.4: nearest to p = a+b−c; ties break left, up, up-left
    assert _paeth(1, 2, 3) == 1          # p=0: pa=1 < pb=2 < pc=3 → left
    assert _paeth(10, 20, 15) == 15      # p=15: pc=0 wins → up-left
    assert _paeth(5, 5, 5) == 5
    rng = np.random.RandomState(7)
    for shape in [(6, 4), (9, 5, 3), (1, 1), (5, 1, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_png(make_png(img)), img)

    # 16-bit depth must raise NotImplementedError, not mis-decode:
    # hand-build a minimal PNG whose IHDR declares depth=16
    import pytest as _pytest

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError):
        decode_png(bad)

    # thumbnail stage: 4×4 gradient → 2×2 top-left nearest-neighbor
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    ds = rd.from_pandas(pd.DataFrame({"id": [1],
                                      "payload": [make_png(img)]}))
    out = png_thumbnails(ds, out_w=2, out_h=2).to_pandas().iloc[0]
    assert out["pixel_sum"] == 0 + 2 + 8 + 10
    assert (out["width"], out["height"]) == (4, 4)
    assert out["thumb_crc32"] == zlib.crc32(bytes([0, 2, 8, 10]))
