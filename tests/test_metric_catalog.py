"""Reference-scale metric-domain prior (VERDICT r1 item 7): the generated
catalog matches the reference metric_set.json's breadth (25 categories /
~500 metrics / 29k JSON lines there; 32 / 452 / ~24k here) and drives the
controlled-datagen and mts_llm pipelines across >= 10 categories."""
import numpy as np

from chatts_tpu.datagen.generator import ALL_ATTRIBUTE_SET, TimeSeriesGenerator
from chatts_tpu.datagen.metric_catalog import build_metric_set
from chatts_tpu.datagen.metric_set import MetricSet
from chatts_tpu.utils.llm_client import LLMClient


def test_catalog_scale_and_schema():
    cats = build_metric_set()
    assert len(cats) >= 30
    all_metrics = [m for c in cats for m in c["metrics"]]
    assert len(all_metrics) >= 450
    valid_changes = set(ALL_ATTRIBUTE_SET["change"])
    valid_seasonal = set(ALL_ATTRIBUTE_SET["overall_attribute"]["seasonal"])
    valid_trend = set(ALL_ATTRIBUTE_SET["overall_attribute"]["trend"])
    valid_noise = set(ALL_ATTRIBUTE_SET["overall_attribute"]["noise"])
    for c in cats:
        assert len(c["metrics"]) == len(set(c["metrics"]))  # unique per category
        assert c["cluster"], c["category"]
        clustered = [m for members in c["cluster"].values() for m in members]
        assert set(clustered) == set(c["metrics"])  # clusters partition metrics
        for m in c["metrics"]:
            a = c["attributes"][m]
            assert set(a["change"]["attributes"]) <= valid_changes, m
            assert set(a["seasonal"]["attributes"]) <= valid_seasonal, m
            assert set(a["trend"]["attributes"]) <= valid_trend, m
            assert set(a["noise"]["attributes"]) <= valid_noise, m
            for section, key in (("seasonal", "amplitude"), ("trend", "start"),
                                 ("trend", "amplitude"), ("change", "amplitude")):
                rng = a[section][key]
                assert rng["min"] <= rng["max"], (m, section, key)


def test_load_defaults_to_full_catalog(monkeypatch):
    monkeypatch.delenv("METRIC_SET_PATH", raising=False)
    monkeypatch.delenv("METRIC_SET_SCALE", raising=False)
    ms = MetricSet.load()
    assert len(ms.categories) >= 20
    # invariants the compact prior also guaranteed
    assert "CPU Usage" in ms.all_metrics()
    assert ms.category_of("Temperature") == "Environment"
    monkeypatch.setenv("METRIC_SET_SCALE", "compact")
    assert len(MetricSet.load().categories) == 3


def test_controlled_datagen_across_ten_categories():
    ms = MetricSet.load()
    gen = TimeSeriesGenerator(seed=7)
    covered = set()
    for c in ms.categories[:12]:
        metric = c["metrics"][0]
        attrs = ms.metric_to_controlled_attributes(metric)
        desc = gen.generate_controlled_attributes(attrs, [(None, None)], 256)
        y, pool = gen.generate(desc, 256)
        assert len(y) == 256
        assert np.all(np.isfinite(y)), metric
        covered.add(c["category"])
    assert len(covered) >= 10


def test_mts_llm_pipeline_spans_ten_categories():
    from chatts_tpu.datagen.align.mts_llm_qa import MTSLocalLLMQAGenerator

    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.0,
                       dryrun_output="a scripted explanation")
    ms = MetricSet.load()
    g = MTSLocalLLMQAGenerator(metric_set=ms, seed=3, seq_len=128)
    # the finalized dataset path still works over the full prior
    rows, evol_labels, labels = g.generate_dataset(40, client)
    assert rows and evol_labels
    # each item draws one category; drive enough items to span the prior
    categories = set()
    for _ in range(30):
        try:
            item, label, corr_pool = g.generate_prompt_data()
        except (ValueError, IndexError):
            continue
        for metric in item["metrics"]:
            cat = ms.category_of(metric)
            if cat:
                categories.add(cat)
    assert len(categories) >= 10, sorted(categories)
