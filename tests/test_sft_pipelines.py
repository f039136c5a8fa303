"""SFT pipeline tests: seed QA generation, evol state machine, TSEvol DFS
with a scripted fake LLM (the reference's dryrun strategy, SURVEY §4.1)."""
import json

import numpy as np
import pytest

from chatts_tpu.datagen.align.uts_llm_qa import (
    UTSLLMQAGenerator,
    main as uts_llm_main,
    replace_prompts,
)
from chatts_tpu.datagen.sft.evol import EvolPrompt, attribute_prompt
from chatts_tpu.datagen.sft.generate_llm_qa import LLMQAGenerator, main as llm_qa_main
from chatts_tpu.datagen.sft.tsevol import TSEvolEngine, evol_instruct, load_seeds
from chatts_tpu.utils.llm_client import LLMClient


def scripted_llm(mutation='{"question": "Evolved Q?", "answer": "Evolved A."}',
                 verdict="Valid"):
    def fake(prompt):
        if "Your Judgement" in prompt:
            return verdict
        return mutation

    return LLMClient(engine="openai", openai_client=fake)


def test_replace_prompts():
    out = replace_prompts(["X", "Y"], {"a": "see <|prompt0|>", "b": ["<|prompt1|>"]})
    assert out == {"a": "see X", "b": ["Y"]}


def test_uts_llm_qa_main(tmp_path):
    n = uts_llm_main(
        str(tmp_path / "d.jsonl"), str(tmp_path / "labels.json"),
        str(tmp_path / "evol.json"), num_data=6, seed=0, seq_len=128,
    )
    assert n >= 6
    rows = [json.loads(l) for l in (tmp_path / "d.jsonl").read_text().splitlines()]
    # holes filled by the dryrun answer
    assert all("<|prompt" not in r["output"] for r in rows)
    assert any("This is a test answer." in r["output"] for r in rows)
    labels = json.loads((tmp_path / "labels.json").read_text())
    assert all("label" in l and "ts_idx" in l for l in labels)
    evol_labels = json.loads((tmp_path / "evol.json").read_text())
    assert all("attribute_pool" in l and "fields" in l for l in evol_labels)


def test_llm_qa_dataset(tmp_path):
    n = llm_qa_main(
        str(tmp_path / "qa.jsonl"), str(tmp_path / "evol.json"),
        total_cnt=5, seed=0, seq_len=128,
    )
    assert n >= 5
    rows = [json.loads(l) for l in (tmp_path / "qa.jsonl").read_text().splitlines()]
    assert all("This is a test question." in r["input"] for r in rows)
    labels = json.loads((tmp_path / "evol.json").read_text())
    assert len(labels) == len(rows)


def make_seed_evol(n_series=2, seq_len=64, seed=0):
    from chatts_tpu.datagen.generator import TimeSeriesGenerator

    gen = TimeSeriesGenerator(seed=seed)
    series, pools = [], []
    for _ in range(n_series):
        pool = gen.generate_random_attributes(
            change_positions=[(None, None)], seq_len=seq_len
        )
        ts, pool = gen.generate(pool, seq_len)
        series.append(ts)
        pools.append(pool)
    return EvolPrompt(
        ts_idx=0, seed_q="What is the trend?", seed_a="It increases.",
        seed_fields={"trend": [0]},
        instruction="You are an expert.",
        timeseries=np.stack(series), attribute_pool=pools,
        metrics=["CPU Usage", "Memory Usage"],
        corr_pool=[([0, 1], "CPU and Memory rise together under load.")],
        rng=np.random.default_rng(0),
    )


def test_evol_unlocks_fields():
    ep = make_seed_evol()
    before = {k: list(v) for k, v in ep.fields.items()}
    total_before = sum(len(v) for v in ep.fields.values())
    ep.evol()
    total_after = sum(len(v) for v in ep.fields.values())
    assert total_after == total_before + 1
    # repeated evolution eventually saturates all (field, series) pairs
    for _ in range(50):
        ep.evol()
    assert sum(len(set(v)) for v in ep.fields.values()) <= 2 * 5 + 1


def test_evol_prompt_contains_context_and_constraints():
    ep = make_seed_evol()
    ep.fields = {"trend": [0], "correlation": [0]}
    prompt = ep.generate_prompt()
    assert "#Context#" in prompt
    assert "#Constraints#" in prompt
    assert "#The Given Q&A#" in prompt
    assert "CPU Usage" in prompt
    assert "rise together" in prompt  # correlation context rendered
    comparison = ep.generate_comparison_prompt("new q", "new a")
    # verdict vocabulary (the protocol) must survive any prose rewrite
    for word in ("Equal", "Invalid", "Valid"):
        assert word in comparison
    assert "new q" in comparison


def test_qa_history_ring():
    ep = make_seed_evol()
    ep.push("q2", "a2")
    ep.push("q3", "a3")
    assert len(ep.qa_history) == 2
    assert ep.qa_history[-1] == ("q3", "a3")


def test_attribute_prompt_field_restriction():
    ep = make_seed_evol()
    text = attribute_prompt(
        ep.timeseries, ep.attribute_pool, ep.metrics, {"noise": [0]}, ep.corr_pool
    )
    assert "noise information" in text
    assert "trend information" not in text


def test_tsevol_engine_dfs(tmp_path):
    # seed files on disk
    ds_file = tmp_path / "seed.jsonl"
    label_file = tmp_path / "seed_labels.json"
    ep = make_seed_evol()
    ts_list = ep.timeseries.tolist()
    ds_file.write_text(json.dumps({"output": "It increases.", "timeseries": ts_list}) + "\n")
    label_file.write_text(json.dumps([{
        "ts_idx": 0, "question": "What is the trend?",
        "fields": {"trend": [0]}, "instruction": "You are an expert.",
        "metrics": ["CPU Usage", "Memory Usage"],
        "corr_pool": [], "attribute_pool": [p for p in ep.attribute_pool],
    }]))

    out_file = tmp_path / "evol_out.jsonl"
    rows = evol_instruct(
        [(str(ds_file), str(label_file))], str(out_file), total_cnt=5,
        llm_client=scripted_llm(), seed=0,
    )
    assert len(rows) == 5
    written = [json.loads(l) for l in out_file.read_text().splitlines()]
    assert len(written) == 5
    assert all(r["output"] == "Evolved A." for r in written)
    assert all("Evolved Q?" in r["input"] for r in written)


def test_tsevol_rejects_invalid():
    ep = make_seed_evol()
    engine = TSEvolEngine(scripted_llm(verdict="Invalid"), rng=np.random.default_rng(0))
    rows = engine.run([ep], total_cnt=5)
    assert rows == []
    assert engine.validation_failed > 0


def test_tsevol_rejects_equal():
    ep = make_seed_evol()
    engine = TSEvolEngine(scripted_llm(verdict="Equal"), rng=np.random.default_rng(0))
    rows = engine.run([ep], total_cnt=5)
    assert rows == []


def test_tsevol_handles_garbage_mutation():
    ep = make_seed_evol()
    engine = TSEvolEngine(
        scripted_llm(mutation="not json at all"), rng=np.random.default_rng(0)
    )
    rows = engine.run([ep], total_cnt=3)
    assert rows == []
    assert engine.parse_failed > 0
