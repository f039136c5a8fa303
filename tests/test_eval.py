"""Eval harness tests: rule scorers, answer splitting, batch aggregation with
a mocked judge (SURVEY §4: RAGAS judge mocked, error->0.0 fallback)."""
import json

import numpy as np
import pytest

from chatts_tpu.eval import scorers
from chatts_tpu.eval.ragas_judge import AnswerCorrectnessJudge
from chatts_tpu.utils.json_utils import parse_llm_json


def test_split_sentences_protects_decimals_and_abbrev():
    out = scorers.split_sentences("value is 3.14, rising. Dr. Smith said so")
    assert any("3.14" in s for s in out)
    assert any("Dr." in s for s in out)


def test_trend_scorer():
    attr = {"type": "increase", "start": 100.0, "amplitude": 50.0}
    answer = "The trend is increasing. The start value is around 90. The change value from left to right is 55."
    cate, num, reason, _ = scorers.evaluate_trend(answer, attr, [])
    assert cate == [True]
    assert num[0] == pytest.approx(1 - 10 / 100)
    assert num[1] == pytest.approx(1 - 5 / 50)

    cate, num, _, _ = scorers.evaluate_trend("the curve keeps steady", attr, [])
    assert cate == [False]


def test_trend_scorer_small_start():
    attr = {"type": "keep steady", "start": 0.1, "amplitude": 0.0}
    cate, num, _, _ = scorers.evaluate_trend(
        "steady. the start value is 0.2", attr, []
    )
    assert cate == [True]
    assert num == [1.0]  # |label|<0.5 and |pred|<0.5 -> exact credit


def test_season_scorer():
    attr = {"type": "sin periodic fluctuation", "period": 32.0, "amplitude": 5.0}
    ans = "There is periodic fluctuation. each period is about 30 points. the amplitude is 4.5"
    cate, num, _, _ = scorers.evaluate_season(ans, attr, [])
    assert cate == [True]
    assert num[0] == pytest.approx(1 - 2 / 32)
    assert num[1] == pytest.approx(1 - 0.5 / 5)

    attr2 = {"type": "no periodic fluctuation"}
    cate, num, _, _ = scorers.evaluate_season("no periodic fluctuation", attr2, [])
    assert cate == [True] and num == []


def test_noise_scorer():
    attr = {"type": "noisy", "std": 2.0}
    cate, num, _, _ = scorers.evaluate_noise(
        "the curve is noisy. the noise std is 1.8", attr, []
    )
    assert cate == [True]
    assert num[0] == pytest.approx(1 - 0.2 / 2)


def test_local_scorer_position_gate():
    attr = [{"type": "upward spike", "position": 100, "amplitude": 10.0}]
    good = "an upward spike around point 110, with an amplitude of 9"
    cate, num, _, _ = scorers.evaluate_local(good, attr, [])
    assert cate == [True]
    assert num[0] == pytest.approx(1 - 10 / 100)
    assert num[1] == pytest.approx(1 - 1 / 10)
    # 64-point gate rejects far positions
    far = "an upward spike around point 400, with an amplitude of 9"
    cate, num, _, _ = scorers.evaluate_local(far, attr, [])
    assert cate == [False]


def test_cluster_f1():
    attr = {"cols": ["cpu_usage", "mem_usage"], "explain": "because"}
    judge = lambda q, r, l: (0.5, {"mock": True})
    ans = "cpu_usage, mem_usage, disk_io. Because they share load."
    cate, num, reason, detail = scorers.evaluate_shape_cluster_inductive(
        ans, attr, ["cpu_usage", "mem_usage", "disk_io"], judge
    )
    # tp=2 fp=1 fn=0 -> F1 = 4/5
    assert cate[0] == pytest.approx(0.8)
    assert reason == [0.5]


def test_deductive_yes_no_shortcut():
    _, _, reason, _ = scorers.evaluate_deductive("Yes, it is", "Yes. explanation", [])
    assert reason == [1.0]
    _, _, reason, _ = scorers.evaluate_deductive("No", "Yes. explanation", [])
    assert reason == [0.0]


def test_causal_and_mcq2():
    _, _, r, _ = scorers.evaluate_causal("CPU Usage is the cause", "cpu usage", [])
    assert r == [1.0]
    _, _, r, _ = scorers.evaluate_mcq2("the answer is B", "B", [])
    assert r == [1.0]


def test_split_numbered_answers():
    ans = "1. first answer\n2. second answer\n3. third"
    out = scorers.split_numbered_answers(ans, 3)
    assert len(out) == 3
    assert out[0].strip() == "first answer"
    # single answer without numbering
    out = scorers.split_numbered_answers("just an answer", 1)
    assert out == [] or out[0]


def test_evaluate_qa_dispatch_and_merge():
    sample = {
        "ability_types": ["trend", "noise"],
        "attributes": [
            {"type": "increase", "start": 10.0, "amplitude": 5.0},
            {"type": "almost no noise"},
        ],
        "cols": [],
    }
    answer = "1. The trend is increasing. the start value is 10\n2. There is no noise"
    result = scorers.evaluate_qa(answer, sample)
    assert result["trend"][0] == [True]
    assert result["noise"][0] == [True]


def test_evaluate_batch_qa_writes_results(tmp_path):
    dataset = [
        {
            "ability_types": ["trend"],
            "attributes": [{"type": "increase", "start": 1.0, "amplitude": 2.0}],
            "cols": [],
            "answer": "increasing",
        }
    ]
    generated = [{"idx": 0, "response": "1. it is increasing. start value 1", "num_tokens": 42}]
    summary = scorers.evaluate_batch_qa(
        dataset, generated, "test_exp", num_workers=1, exp_root=str(tmp_path)
    )
    assert summary["overall_categorical"] == 1.0
    assert summary["consumed_tokens"] == 42
    with open(tmp_path / "test_exp" / "result.json") as f:
        assert json.load(f)["overall_categorical"] == 1.0


def test_parse_llm_json():
    assert parse_llm_json('{"a": 1}') == {"a": 1}
    assert parse_llm_json('prefix {"a": [1, 2,]} suffix') == {"a": [1, 2]}
    assert parse_llm_json("```json\n{\"k\": true}\n```") == {"k": True}
    assert parse_llm_json("{'single': 'quotes'}") == {"single": "quotes"}
    assert parse_llm_json("{\"py\": True}") == {"py": True}
    assert parse_llm_json("no json here") is None


def test_answer_correctness_judge_with_fake_llm(tmp_path):
    calls = []

    def fake_llm(prompt):
        calls.append(prompt)
        if "gt_keywords" in prompt and "overlapping" not in prompt:
            return '{"gt_keywords": ["nuclear fusion", "light"]}'
        return '{"overlapping_keywords": ["light"]}'

    judge = AnswerCorrectnessJudge(fake_llm, data_dir=str(tmp_path))
    score, detail = judge("What powers the sun?", "It emits light", "fusion and light")
    assert score == pytest.approx(0.5)
    assert detail["num_ok"] == 1 and detail["num_all"] == 2
    # keyword extraction is cached: second call with same label skips step 1
    n_before = len(calls)
    judge("What powers the sun?", "another answer", "fusion and light")
    assert len(calls) == n_before + 1  # only the overlap call


def test_judge_error_fallback(tmp_path):
    def broken_llm(prompt):
        raise ConnectionError("api down")

    judge = AnswerCorrectnessJudge(broken_llm, data_dir=str(tmp_path))
    score, detail = judge("q", "r", "label")
    assert score == 0.0
    assert "error" in detail


def test_fuzzy_match_threshold(tmp_path):
    def llm(prompt):
        if "overlapping" not in prompt:
            return '{"gt_keywords": ["maintain a healthy weight"]}'
        return '{"overlapping_keywords": ["maintains healthy weight"]}'

    judge = AnswerCorrectnessJudge(llm, data_dir=str(tmp_path))
    score, _ = judge("benefits?", "it maintains healthy weight", "maintain a healthy weight")
    assert score == 1.0  # difflib ratio >= 0.6
