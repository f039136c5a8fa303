"""Native TS tools + ReAct agent + baselines + inference driver tests."""
import json

import numpy as np
import pytest

from chatts_tpu.eval import baselines, inference, react_agent, ts_tools
from chatts_tpu.eval.train_rocket_tsc import (
    build_dataset,
    change_type_list,
    train,
)
from chatts_tpu.utils.llm_client import LLMClient


def test_find_period_detects_sine():
    t = np.arange(512)
    ts = np.sin(2 * np.pi * t / 50)
    period = ts_tools.find_period(ts)
    assert period is not None
    assert 40 <= period <= 60


def test_find_period_none_on_noise():
    rng = np.random.default_rng(0)
    assert ts_tools.find_period(rng.normal(0, 1, 64), min_period=30) in (None, *range(30, 64))


def test_stl_decompose_recovers_components():
    t = np.arange(600)
    trend = 0.05 * t
    seasonal = 3 * np.sin(2 * np.pi * t / 50)
    ts = trend + seasonal
    res = ts_tools.stl_decompose(ts, period=50)
    # trend slope approximately recovered in the interior
    inner = slice(60, -60)
    slope = np.polyfit(t[inner], res.trend[inner], 1)[0]
    assert slope == pytest.approx(0.05, rel=0.2)
    assert np.max(res.seasonal) == pytest.approx(3.0, rel=0.25)
    assert np.std(res.resid[inner]) < 1.0


def test_ar_anomaly_detects_spike():
    rng = np.random.default_rng(1)
    ts = rng.normal(0, 0.1, 256)
    ts[100] += 8.0
    flags = ts_tools.ar_anomaly_detect(ts)
    starts = ts_tools.anomaly_block_starts(flags)
    assert any(98 <= s <= 103 for s in starts)
    # clean series: no anomalies
    clean = np.sin(np.arange(256) / 10)
    assert ts_tools.anomaly_block_starts(ts_tools.ar_anomaly_detect(clean)) == []


def test_rocket_classifier_separates_basic_classes(tmp_path):
    # 3-class toy problem: flat vs spike vs step
    rng = np.random.default_rng(2)
    X, y = [], []
    for _ in range(30):
        base = rng.normal(0, 0.1, 64)
        X.append(base.copy()); y.append(0)
        spike = base.copy(); spike[32] += 5; X.append(spike); y.append(1)
        step = base.copy(); step[32:] += 5; X.append(step); y.append(2)
    X, y = np.stack(X), np.asarray(y)
    clf = ts_tools.RocketClassifier(num_kernels=200, seed=0).fit(X, y)
    assert clf.score(X, y) > 0.9
    # save/load round trip
    path = tmp_path / "rocket.npz"
    clf.save(str(path))
    clf2 = ts_tools.RocketClassifier.load(str(path))
    np.testing.assert_array_equal(clf.predict(X), clf2.predict(X))


def test_rocket_trainer_on_change_types(tmp_path):
    acc = train(str(tmp_path / "rocket.npz"), samples_per_class=8,
                num_kernels=300, seed=0)
    assert len(change_type_list) == 19
    # 19-way with tiny data: far above chance (1/19 ~ 0.05)
    assert acc > 0.2


def test_correlation_tools():
    t = np.arange(256)
    a = np.sin(t / 20)
    b = np.sin(t / 20) + 0.01 * np.random.default_rng(0).normal(size=256)
    c = np.cos(t / 5)
    out = ts_tools.correlation_tool([a, b, c], 0, ["A", "B", "C"])
    assert "A" in out and "B" in out
    out2 = ts_tools.trend_correlation_tool([a, b, c], 0, ["A", "B", "C"])
    assert "high correlation" in out2
    assert "B" in out2.split("high correlation (>0.7) are:")[1]


def test_fluctuation_correlation_tool():
    rng = np.random.default_rng(3)
    base = rng.normal(0, 0.1, 256)
    a = base.copy(); a[100] += 10
    b = base.copy(); b[102] += 8  # within 5% tolerance
    c = rng.normal(0, 0.1, 256)  # nothing
    out = ts_tools.fluctuation_correlation_tool([a, b, c], 0, ["A", "B", "C"])
    assert "B: has matching fluctuations" in out
    assert "C: no matching fluctuations" in out


def test_react_agent_tool_loop():
    ts = [np.sin(np.arange(128) / 10) * 5]
    cols = ["CPU Usage"]
    calls = []

    def scripted_llm(prompt):
        calls.append(prompt)
        if len(calls) == 1:
            return (
                "Thought: I should check a value.\n"
                "Action: datapoint_value\n"
                'Action Input: {"name": "CPU Usage", "position": 10}\n'
            )
        assert "The value of datapoint 10" in prompt  # observation fed back
        return "Thought: I know now.\nFinal Answer: The value is about 4.2."

    answer = react_agent.answer_question_react(
        "What is the value at point 10?", ts, cols, scripted_llm
    )
    assert answer == "The value is about 4.2."
    assert len(calls) == 2


def test_react_agent_unknown_tool_recovers():
    ts = [np.arange(64.0)]
    calls = []

    def llm(prompt):
        calls.append(prompt)
        if len(calls) == 1:
            return "Action: bogus_tool\nAction Input: {}\n"
        assert "not found" in prompt
        return "Final Answer: done"

    out = react_agent.answer_question_react("q", ts, ["M"], llm)
    assert out == "done"


def test_react_step_cap():
    def looping_llm(prompt):
        return 'Action: datapoint_value\nAction Input: {"name": "M", "position": 0}\n'

    out = react_agent.answer_question_react(
        "q", [np.arange(8.0)], ["M"], looping_llm, max_steps=3
    )
    assert "Max steps" in out


def test_baseline_text_and_resume(tmp_path):
    dataset = [
        {"question": "What is the trend? <ts><ts/>", "timeseries": [[1, 2, 3]]},
        {"question": "Any spikes? <ts><ts/>", "timeseries": [[5, 50, 5]]},
    ]
    calls = []

    def client(prompt):
        calls.append(prompt)
        return "increasing"

    out_path = tmp_path / "gpt_text.json"
    results = baselines.evaluate_gpt_text(dataset, client, str(out_path), num_workers=2)
    assert len(results) == 2
    assert "1.00, 2.00, 3.00" in calls[0] + calls[1]
    # resume: no new calls on rerun
    n_calls = len(calls)
    baselines.evaluate_gpt_text(dataset, client, str(out_path), num_workers=2)
    assert len(calls) == n_calls


def test_baseline_vision_renders_image(tmp_path):
    b64 = baselines.render_series_image([[1, 2, 3], [3, 2, 1]])
    assert len(b64) > 1000  # a real JPEG came out
    import base64

    assert base64.b64decode(b64)[:2] == b"\xff\xd8"  # JPEG magic


def test_inference_driver_shards_and_merge(tmp_path):
    dataset = [
        {"question": f"q{i} <ts><ts/>", "timeseries": [[1.0, 2.0, 3.0, 4.0]]}
        for i in range(5)
    ]
    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.0,
                       dryrun_output="1. increasing")
    for shard in range(2):
        inference.run_inference(
            dataset, client, "test_exp", exp_root=str(tmp_path),
            shard_idx=shard, num_shards=2, patch_size=2,
        )
    merged = inference.merge_shards("test_exp", str(tmp_path))
    assert [m["idx"] for m in merged] == [0, 1, 2, 3, 4]
    assert all(m["response"] == "1. increasing" for m in merged)
    # end-to-end scoring over the merged shards
    for s in dataset:
        s["ability_types"] = ["trend"]
        s["attributes"] = [{"type": "increase", "start": 1.0, "amplitude": 3.0}]
        s["cols"] = []
    summary = inference.evaluate_experiment(
        dataset, "test_exp", exp_root=str(tmp_path), num_workers=1
    )
    assert summary["overall_categorical"] == 1.0
