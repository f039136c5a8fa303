"""End-to-end L4 chain tests: MTS LLM QA -> labels -> IFT -> reason/rewrite,
all with dryrun/scripted LLMs (reference test strategy, SURVEY §4.1)."""
import json

import numpy as np
import pytest

from chatts_tpu.datagen.align.mts_llm_qa import (
    MTSLocalLLMQAGenerator,
    MTSShapeLLMQAGenerator,
    write_outputs,
)
from chatts_tpu.datagen.sft.generate_ift_dataset import generate_dataset as ift_generate
from chatts_tpu.datagen.sft.reason import (
    MTSReasonGenerator,
    UTSReasonGenerator,
    UTS_REASONING_TEMPLATES,
    MTS_REASONING_TEMPLATES,
)
from chatts_tpu.datagen.sft.rewrite import RewritePrompt, rewrite_dataset
from chatts_tpu.utils.llm_client import LLMClient


def dryrun(output="This is a test answer."):
    return LLMClient(engine="dryrun", dryrun_sleep_s=0.0, dryrun_output=output)


def qa_llm():
    def fake(prompt):
        if "Your Judgement" in prompt:
            return "Valid"
        if "请检查" in prompt:
            return "pass"
        return json.dumps([
            {"question": "Is there an anomaly?", "answer": "Yes, because of the spike."},
            {"question": "Which option fits? A) X B) Y", "answer": "A. Reasoning."},
        ])

    return LLMClient(engine="openai", openai_client=fake)


def test_mts_local_llm_qa_labels():
    g = MTSLocalLLMQAGenerator(seed=0, seq_len=256)
    rows, evol_labels, labels = g.generate_dataset(5, dryrun())
    assert rows and labels
    label = labels[0]["label"]
    assert "cols" in label and "position" in label and "situation" in label
    assert isinstance(label["correlations"], list)
    for corr in label["correlations"]:
        assert set(corr) == {"pair", "explain", "label"}
        assert "<|prompt" not in corr["explain"]  # holes filled
    for row in rows:
        assert "<|prompt" not in row["output"]


def test_mts_shape_llm_qa_labels():
    g = MTSShapeLLMQAGenerator(seed=1, seq_len=128)
    rows, evol_labels, labels = g.generate_dataset(5, dryrun())
    assert rows
    label = labels[0]["label"]
    assert label["clusters"], "shape clusters must be recorded"
    cluster = label["clusters"][0]
    assert set(cluster) == {"col_idx", "cols", "explain"}
    assert len(cluster["col_idx"]) == len(cluster["cols"])


def test_ift_from_generated_labels(tmp_path):
    # produce labels via the local MTS pipeline, then IFT over them
    g = MTSLocalLLMQAGenerator(seed=2, seq_len=256)
    rows, evol_labels, labels = g.generate_dataset(4, dryrun())
    label_path = tmp_path / "mts_local_labels.json"
    label_path.write_text(json.dumps(labels))

    # UTS labels: craft from the uts_llm pipeline format
    from chatts_tpu.datagen.align.uts_llm_qa import UTSLLMQAGenerator

    ug = UTSLLMQAGenerator(seed=3, seq_len=128)
    _, _, uts_labels = ug.generate_dataset(4, dryrun())
    uts_path = tmp_path / "uts_labels.json"
    uts_path.write_text(json.dumps(uts_labels))

    out = tmp_path / "ift.jsonl"
    n = ift_generate(
        [(str(label_path), "local"), (str(uts_path), "uts")],
        target_cnt=6, output_path=str(out), seed=0,
    )
    assert n == 6
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    for row in rows:
        assert "answer the following questions" in row["input"]
        # numbered questions with strict footer
        assert "1. " in row["input"]
        assert "Strictly formatted answer" in row["input"]
        assert row["output"].startswith("1. ")


def test_uts_reason_generator():
    assert len(UTS_REASONING_TEMPLATES) >= 29
    g = UTSReasonGenerator(seed=0, seq_len=128)
    rows, labels = g.generate_dataset(3, qa_llm())
    assert rows
    assert all("Is there an anomaly?" in r["input"] or "Which option" in r["input"]
               for r in rows)
    assert len(labels) == len(rows)


def test_uts_reason_cn_native_corpus():
    """chinese=True draws from the native Chinese template corpus
    (VERDICT r4 item 7): ~30+ original CJK templates, fully Chinese
    prompt framing, CJK in the instruction that lands in dataset rows."""
    from chatts_tpu.datagen.sft.reason import UTS_REASONING_TEMPLATES_CN

    def has_cjk(s):
        return any("一" <= ch <= "鿿" for ch in s)

    assert len(UTS_REASONING_TEMPLATES_CN) >= 30
    # every template example is real Chinese, and the taxonomy heads exist
    assert all(has_cjk(t["example"])
               for t in UTS_REASONING_TEMPLATES_CN.values())
    qtypes = {t["question_type"] for t in UTS_REASONING_TEMPLATES_CN.values()}
    assert qtypes == {"judgment", "multiple_choice", "open_ended"}

    g = UTSReasonGenerator(seed=3, seq_len=128, chinese=True)
    for _ in range(4):
        item = g.generate_prompt_data()
        assert item["template"] in UTS_REASONING_TEMPLATES_CN
        assert has_cjk(item["instruction"])  # dataset-row text is Chinese
        assert has_cjk(item["prompt"])
        assert "Generate QA pairs" not in item["prompt"]  # no EN framing
        assert "示例答案" in item["prompt"]  # CN example-answer block wired


def test_uts_reason_cn_consistency_filter():
    g = UTSReasonGenerator(seed=1, seq_len=128, chinese=True)

    calls = {"checks": 0}

    def fake(prompt):
        if "请检查" in prompt:
            calls["checks"] += 1
            # fail every other QA
            return "pass" if calls["checks"] % 2 == 1 else "fail"
        return json.dumps([
            {"question": "问题一?", "answer": "答案一."},
            {"question": "问题二?", "answer": "答案二."},
        ])

    client = LLMClient(engine="openai", openai_client=fake)
    rows, _ = g.generate_dataset(2, client)
    assert calls["checks"] > 0
    # only 'pass' QAs kept: half of them
    assert 0 < len(rows) < calls["checks"] + 1


def test_mts_reason_generator():
    assert len(MTS_REASONING_TEMPLATES) >= 6
    g = MTSReasonGenerator(seed=0, seq_len=128)
    rows, labels = g.generate_dataset(3, qa_llm())
    assert rows
    assert all(r["input"].startswith("I have a set of") for r in rows)
    # multivariate: multiple series attached
    assert all(len(r["timeseries"]) >= 2 for r in rows)


def test_rewrite_dataset():
    from chatts_tpu.datagen.generator import TimeSeriesGenerator

    gen = TimeSeriesGenerator(seed=5)
    pool = gen.generate_random_attributes(change_positions=[(None, None)], seq_len=64)
    ts, pool = gen.generate(pool, 64)
    seed = RewritePrompt(
        ts_idx=0, seed_q="What happened?", seed_a="A spike happened.",
        seed_fields={"local": [0]}, instruction="Expert:",
        timeseries=np.stack([ts]), attribute_pool=[pool],
        metrics=["CPU Usage"], corr_pool=[], rng=np.random.default_rng(0),
    )

    def fake(prompt):
        if "Your Judgement" in prompt:
            return "Valid"
        return '{"question": "Rewritten?", "answer": "Rewritten answer."}'

    rows = rewrite_dataset([seed], total_cnt=3,
                           llm_client=LLMClient(engine="openai", openai_client=fake))
    assert len(rows) == 3
    assert all(r["output"] == "Rewritten answer." for r in rows)


def test_rewrite_rejects_invalid_taxonomy():
    from chatts_tpu.datagen.generator import TimeSeriesGenerator

    gen = TimeSeriesGenerator(seed=6)
    pool = gen.generate_random_attributes(seq_len=64)
    ts, pool = gen.generate(pool, 64)
    seed = RewritePrompt(
        ts_idx=0, seed_q="Q?", seed_a="A.", seed_fields={"trend": [0]},
        instruction="Expert:", timeseries=np.stack([ts]),
        attribute_pool=[pool], metrics=["M"], corr_pool=[],
        rng=np.random.default_rng(0),
    )

    def fake(prompt):
        if "Your Judgement" in prompt:
            return "Invalid(meaning changed)"
        return '{"question": "Rw?", "answer": "RwA."}'

    rows = rewrite_dataset([seed], total_cnt=3,
                           llm_client=LLMClient(engine="openai", openai_client=fake))
    assert rows == []
