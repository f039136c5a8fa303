"""Full-loop integration test (BASELINE config[2] shape): synthesize an eval
dataset -> run batch inference through the serving engine -> score.

With a tiny-random model the answers are noise, so scoring correctness is
validated with an oracle client that returns the ground truth (scores must be
~1.0) and a garbage client (scores must be ~0.0)."""
import json

import numpy as np
import pytest

from chatts_tpu.eval.inference import evaluate_experiment, run_inference
from chatts_tpu.eval.make_eval_dataset import build_dataset
from chatts_tpu.utils.llm_client import LLMClient


def test_dataset_schema():
    samples = build_dataset(5, seed=0, seq_len=128)
    assert len(samples) == 5
    for s in samples:
        assert set(s) >= {"question", "timeseries", "ability_types",
                          "attributes", "answer", "cols"}
        assert s["question"].count("<ts><ts/>") == len(s["timeseries"])
        assert len(s["ability_types"]) == len(s["attributes"])
        assert len(s["ability_types"]) >= 3


def test_oracle_answers_score_high(tmp_path):
    samples = build_dataset(6, seed=1, seq_len=128)

    class OracleClient:
        """Returns the ground-truth answer for each prompt (by matching)."""

        def __init__(self, dataset):
            self.by_prompt = {s["question"]: s["answer"] for s in dataset}

        def llm_batch_generate(self, prompts, ts_lists=None, **kw):
            out = []
            for p in prompts:
                # strip the chat template wrapper
                body = p.split("<|im_start|>user\n", 1)[1].rsplit("<|im_end|>", 1)[0]
                out.append(self.by_prompt[body])
            return out

    run_inference(samples, OracleClient(samples), "oracle_exp",
                  exp_root=str(tmp_path))
    summary = evaluate_experiment(samples, "oracle_exp", exp_root=str(tmp_path),
                                  num_workers=1)
    assert summary["overall_categorical"] >= 0.99
    assert summary["overall_numerical"] >= 0.95


def test_garbage_answers_score_low(tmp_path):
    samples = build_dataset(5, seed=2, seq_len=128)
    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.0,
                       dryrun_output="1. banana\n2. banana\n3. banana\n4. banana")
    run_inference(samples, client, "garbage_exp", exp_root=str(tmp_path))
    summary = evaluate_experiment(samples, "garbage_exp",
                                  exp_root=str(tmp_path), num_workers=1)
    assert summary["overall_categorical"] <= 0.2


def test_tiny_model_end_to_end(tmp_path):
    """The real serving path: tiny model answers, scored without crashing."""
    import jax
    import jax.numpy as jnp

    from chatts_tpu.core.config import tiny_config
    from chatts_tpu.models import chatts
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import ServeEngine
    from tests.helpers import FakeTokenizer

    cfg = tiny_config(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=16,
                      max_sequence_length=256, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    engine = ServeEngine(params, cfg, proc, max_batch_size=2,
                         max_model_len=2048, cache_dtype=jnp.float32,
                         attn_impl="xla", decode_chunk=4)
    client = LLMClient(engine="tpu-ts", serve_engine=engine,
                       sampling_params={"max_tokens": 8, "temperature": 0.0})
    try:
        samples = build_dataset(2, seed=3, seq_len=64)
        run_inference(samples, client, "tiny_exp", exp_root=str(tmp_path),
                      patch_size=cfg.ts.patch_size)
        summary = evaluate_experiment(samples, "tiny_exp",
                                      exp_root=str(tmp_path), num_workers=1)
        assert "overall_categorical" in summary
        assert summary["consumed_tokens"] > 0
    finally:
        client.kill()


def test_mts_correlation_samples_schema_and_scoring(tmp_path):
    from chatts_tpu.eval.make_eval_dataset import build_mts_dataset

    samples = build_mts_dataset(3, seed=0, seq_len=128)
    assert len(samples) == 3
    for s in samples:
        assert s["ability_types"] == ["local_correlation_inductive",
                                      "local_cluster_inductive"]
        assert len(s["timeseries"]) == 3
        assert s["question"].count("<ts><ts/>") == 3

    class Oracle:
        def __init__(self, dataset):
            self.by_prompt = {x["question"]: x["answer"] for x in dataset}

        def llm_batch_generate(self, prompts, ts_lists=None, **kw):
            out = []
            for p in prompts:
                body = p.split("<|im_start|>user\n", 1)[1].rsplit("<|im_end|>", 1)[0]
                out.append(self.by_prompt[body])
            return out

    from chatts_tpu.eval.inference import evaluate_experiment, run_inference

    run_inference(samples, Oracle(samples), "mts_exp", exp_root=str(tmp_path))
    summary = evaluate_experiment(samples, "mts_exp", exp_root=str(tmp_path),
                                  num_workers=1)
    # oracle answers must hit both categorical scorers
    assert summary["overall_categorical"] >= 0.99
