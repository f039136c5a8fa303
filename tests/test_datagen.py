"""TS synthesis engine tests: seeded determinism, per-change invariants,
attribute/label back-fill, text/caption rendering (SURVEY §4 prescription)."""
import re

import numpy as np
import pytest

from chatts_tpu.datagen import changes as changes_lib
from chatts_tpu.datagen import trends as trends_lib
from chatts_tpu.datagen.config import DatagenConfig
from chatts_tpu.datagen.generator import (
    ALL_ATTRIBUTE_SET,
    TimeSeriesGenerator,
    attribute_to_caption,
    attribute_to_text,
    prompt_to_inference,
)


def make_gen(seed=0, **kw):
    return TimeSeriesGenerator(DatagenConfig(**kw), seed=seed)


def test_seeded_determinism():
    for seed in (0, 7):
        g1, g2 = make_gen(seed), make_gen(seed)
        a1 = g1.generate_random_attributes(seq_len=256)
        a2 = g2.generate_random_attributes(seq_len=256)
        assert a1 == a2
        y1, p1 = g1.generate(a1, 256)
        y2, p2 = g2.generate(a2, 256)
        np.testing.assert_array_equal(y1, y2)
        assert p1["statistics"] == p2["statistics"]


def test_all_19_change_types_apply():
    assert len(changes_lib.supported_change_types()) == 19
    assert set(changes_lib.supported_change_types()) == set(
        ALL_ATTRIBUTE_SET["change"]
    )
    for i, ctype in enumerate(changes_lib.supported_change_types()):
        rng = np.random.default_rng(i)
        delta, recs = changes_lib.apply_local_changes(
            rng, [{"type": ctype}], overall_amplitude=10.0, seq_len=512
        )
        assert len(recs) == 1, ctype
        rec = recs[0]
        assert rec["type"] == ctype
        assert 0 <= rec["position_start"] < rec["position_end"] < 512
        assert rec["amplitude"] > 0
        assert rec["detail"]
        # the change actually moved the series inside its window
        assert np.abs(delta).max() > 0


def test_change_never_exceeds_seq_len():
    for seed in range(30):
        rng = np.random.default_rng(seed)
        types = list(np.random.default_rng(seed).choice(
            changes_lib.supported_change_types(), size=3
        ))
        _, recs = changes_lib.apply_local_changes(
            rng, [{"type": t} for t in types], overall_amplitude=5.0, seq_len=128
        )
        for rec in recs:
            assert rec["position_end"] < 128


def test_changes_do_not_overlap():
    rng = np.random.default_rng(3)
    _, recs = changes_lib.apply_local_changes(
        rng,
        [{"type": "upward spike"}, {"type": "downward spike"}, {"type": "shake"}],
        overall_amplitude=5.0,
        seq_len=512,
    )
    recs = sorted(recs, key=lambda r: r["position_start"])
    for a, b in zip(recs, recs[1:]):
        assert a["position_end"] <= b["position_start"]


def test_short_sequence_degradation():
    g = make_gen(1)
    pool = g.generate_random_attributes(seq_len=16)
    assert pool["seasonal"]["type"] == "no periodic fluctuation"
    assert pool["frequency"]["type"] == "no periodicity"
    assert pool["noise"]["type"] == "almost no noise"


def test_generate_backfills_labels():
    g = make_gen(2)
    pool = g.generate_random_attributes(seq_len=256)
    y, pool = g.generate(pool, 256)
    assert len(y) == 256
    assert "statistics" in pool
    st = pool["statistics"]
    assert st["max"] == round(float(np.max(y)), 2)
    assert st["min_pos"] == int(np.argmin(y))
    assert "trend_list" in pool["trend"]
    assert "detail" in pool["noise"]
    # all <|idx|> placeholders substituted
    for c in pool["local"]:
        assert not re.search(r"<\|\d+\|>", c["detail"])


def test_controlled_attributes():
    attribute_set = {
        "seasonal": {
            "attributes": ["sin periodic fluctuation"],
            "amplitude": {"min": 5.0, "max": 10.0},
            "period": {"min": 20, "max": 40},
        },
        "trend": {
            "attributes": ["increase"],
            "start": {"min": 100.0, "max": 200.0},
            "amplitude": {"min": 10.0, "max": 20.0},
        },
        "change": {
            "attributes": ["upward spike"],
            "amplitude": {"min": 3.0, "max": 5.0},
        },
        "noise": {"attributes": ["almost no noise"]},
    }
    g = make_gen(4)
    desc = g.generate_controlled_attributes(
        attribute_set, change_positions=[(None, None)], seq_len=256
    )
    assert desc["seasonal"]["type"] == "sin periodic fluctuation"
    assert desc["trend"]["type"] == "increase"
    assert 100.0 <= desc["trend"]["start"] <= 200.0
    assert desc["local"][0]["type"] == "upward spike"
    assert 3.0 <= desc["local"][0]["amplitude"] <= 5.0
    y, pool = g.generate(desc, 256)
    # controlled period honored in realized labels
    assert 20 <= pool["frequency"]["period"] <= 40
    # trend increases overall
    assert pool["trend"]["amplitude"] > 0


def test_attribute_to_text_and_caption():
    g = make_gen(5)
    pool = g.generate_random_attributes(
        change_positions=[(None, None)], seq_len=128
    )
    y, pool = g.generate(pool, 128)
    text = attribute_to_text(y, pool)
    assert "The length of the time series is 128." in text
    assert "Specific data details" in text
    text_novals = attribute_to_text(y, pool, generate_values=False)
    assert "Specific data details" not in text_novals
    caption = attribute_to_caption(y, pool, rng=np.random.default_rng(0))
    assert "In terms of the trend and changes" in caption


def test_multiple_trend_generates_segments():
    g = make_gen(6)
    pool = {
        "seasonal": {"type": "no periodic fluctuation"},
        "trend": {"type": "multiple"},
        "local": [],
        "frequency": {"type": "no periodicity"},
        "noise": {"type": "almost no noise"},
        "seq_len": 512,
    }
    y, pool = g.generate(pool, 512)
    assert len(pool["trend"]["trend_list"]) > 1
    for trend, a, b in pool["trend"]["trend_list"]:
        assert trend in ("increase", "decrease", "steady")
        assert 0 <= a < b <= 511


def test_disable_multiple_trend_downgrades():
    g = make_gen(7, enable_multiple_trend=False)
    pool = {
        "seasonal": {"type": "sin periodic fluctuation"},
        "trend": {"type": "multiple"},
        "local": [],
        "frequency": {"type": "low frequency"},
        "noise": {"type": "almost no noise"},
        "seq_len": 128,
    }
    y, pool = g.generate(pool, 128)
    assert pool["trend"]["type"] in ("increase", "decrease", "keep steady")
    assert pool["seasonal"]["type"] == "periodic fluctuation"


def test_trend_utils():
    rng = np.random.default_rng(8)
    points, ctype = trends_lib.generate_random_points(rng, 256)
    assert points[0][0] == 0 and points[-1][0] == 255
    xs = [p[0] for p in points]
    assert xs == sorted(xs)
    _, curve, _ = trends_lib.generate_trend_curve(rng, 256, points)
    assert len(curve) == 256
    prompt = trends_lib.generate_trend_prompt(points)
    assert "From point 0" in prompt
    tl = trends_lib.generate_trend_list(points, 256)
    assert tl[-1][2] == 255


def test_seasonal_wave_types():
    g = make_gen(9)
    for wave in ("sin", "square", "triangle"):
        y = g.seasonal_wave(32.0, [5.0], [0, 256], 256, wave)
        assert len(y) == 256
        assert abs(float(np.mean(y))) < 1.0
        assert np.max(y) - np.min(y) > 1.0


def test_prompt_to_inference():
    out = prompt_to_inference([[[1.23456, 2.0]]], "a <ts><ts/> b")
    assert out == "a <ts>[[1.2346, 2.0]]<ts/> b"


def test_generation_sweep_lengths():
    """Rejection-style sweep: many (seed, len) combos must produce finite
    series with consistent labels."""
    for seed in range(8):
        for seq_len in (5, 64, 256, 1024):
            g = make_gen(seed * 100 + seq_len)
            pool = g.generate_random_attributes(seq_len=seq_len)
            y, pool = g.generate(pool, seq_len)
            assert np.all(np.isfinite(y))
            for c in pool["local"]:
                assert c["position_end"] < seq_len
