"""Alignment datagen pipeline tests: jsonl schema, QA structure, determinism."""
import json

import numpy as np
import pytest

from chatts_tpu.datagen.align import (
    mts_local_template_qa,
    mts_shape_template_qa,
    uts_template_qa,
)
from chatts_tpu.datagen.generator import TimeSeriesGenerator
from chatts_tpu.datagen.metric_set import MetricSet


def test_uts_template_rows(tmp_path):
    out = tmp_path / "uts.jsonl"
    n = uts_template_qa.main(str(out), num_data=12, seed=0, seq_len=128)
    assert n == 12
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 12
    for row in rows:
        assert set(row) == {"input", "output", "timeseries"}
        assert "<ts><ts/>" in row["input"]
        assert isinstance(row["timeseries"], list)
    # at least the two shape questions and the JSON dump appear
    assert any("JSON format" in r["input"] for r in rows)
    assert any("periodicity, trend, local characteristics" in r["input"] for r in rows)


def test_uts_template_json_answer_parses():
    samples = list(uts_template_qa.generate_samples(20, seed=1, seq_len=128))
    json_rows = [s for s in samples if "JSON format" in s["input"]]
    assert json_rows
    parsed = json.loads(json_rows[0]["output"])
    assert "trend" in parsed and "seasonal" in parsed
    assert "statistics" not in parsed  # stripped from public dump
    assert "overall_amplitude" not in parsed


def test_uts_template_deterministic():
    a = list(uts_template_qa.generate_samples(6, seed=7, seq_len=64))
    b = list(uts_template_qa.generate_samples(6, seed=7, seq_len=64))
    assert a == b


def test_uts_sample_seq_len_ladder():
    gen = TimeSeriesGenerator(seed=0)
    lengths = {uts_template_qa.sample_seq_len(gen) for _ in range(300)}
    assert 256 in lengths
    assert any(l < 64 for l in lengths) or any(l > 1024 for l in lengths)
    gen2 = TimeSeriesGenerator(seed=0)
    no_extreme = [
        uts_template_qa.sample_seq_len(gen2, disable_extreme=True)
        for _ in range(300)
    ]
    assert all(64 <= l <= 1024 or l == 256 for l in no_extreme)


def test_mts_shape_rows():
    rows = list(mts_shape_template_qa.generate_samples(8, seed=0, seq_len=128))
    assert len(rows) == 8
    for row in rows:
        assert row["input"].startswith("There are ")
        n_series = int(row["input"].split(" ")[2])
        assert row["input"].count("<ts><ts/>") == n_series
        assert len(row["timeseries"]) == n_series
    assert any("trend" in r["input"] for r in rows)


def test_mts_shape_correlation_answers():
    rows = list(mts_shape_template_qa.generate_samples(40, seed=3, seq_len=128))
    corr = [r for r in rows if "correlation of trend" in r["input"]]
    assert corr
    assert any("similar trends" in r["output"] or "different" in r["output"] for r in corr)


def test_mts_local_rows():
    rows = list(mts_local_template_qa.generate_samples(10, seed=0, seq_len=256))
    assert len(rows) == 10
    find_related = [r for r in rows if "find other time series" in r["input"]]
    assert find_related
    for r in find_related:
        assert (
            "I found the following" in r["output"]
            or "did not find any other" in r["output"]
        )


def test_metric_set_default_and_lookup():
    ms = MetricSet.load()
    assert ms.metric_to_controlled_attributes("CPU Usage") is not None
    assert ms.metric_to_controlled_attributes("nonexistent") is None
    assert "CPU Usage" in ms.all_metrics()
    assert ms.category_of("Temperature") == "Environment"
    clusters = ms.clusters("Web Service")
    assert "Load Metrics" in clusters
    # every clustered metric exists in the category metric list
    for metrics in clusters.values():
        for m in metrics:
            assert m in ms.all_metrics()
    # attribute schema usable by generate_controlled_attributes
    gen = TimeSeriesGenerator(seed=0)
    attrs = ms.metric_to_controlled_attributes("CPU Usage")
    desc = gen.generate_controlled_attributes(attrs, [(None, None)], 256)
    y, pool = gen.generate(desc, 256)
    assert len(y) == 256


def test_metric_set_loads_reference_format(tmp_path):
    custom = [{
        "category": "Test",
        "metrics": ["M1"],
        "cluster": {"C": ["M1"]},
        "attributes": {"M1": {
            "unit": "s",
            "seasonal": {"attributes": ["no periodic fluctuation"],
                         "amplitude": {"min": 0, "max": 0},
                         "period": {"min": 0, "max": 0}},
            "trend": {"attributes": ["increase"],
                      "start": {"min": 0, "max": 1},
                      "amplitude": {"min": 1, "max": 2}},
            "noise": {"attributes": ["almost no noise"]},
            "change": {"attributes": ["upward spike"],
                       "amplitude": {"min": 1, "max": 2}},
        }},
    }]
    path = tmp_path / "ms.json"
    path.write_text(json.dumps(custom))
    ms = MetricSet.load(str(path))
    assert ms.all_metrics() == ["M1"]
    assert ms.metric_to_controlled_attributes("M1")["unit"] == "s"
