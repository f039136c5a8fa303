"""LLMClient dispatcher tests: dryrun parity, ordering, tpu-ts engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.serve.scheduler import ServeEngine
from chatts_tpu.utils.llm_client import LLMClient
from tests.helpers import FakeTokenizer


def test_dryrun_engine_preserves_order():
    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.01,
                       dryrun_output="canned")
    out = client.llm_batch_generate([f"p{i}" for i in range(10)])
    assert out == ["canned"] * 10
    client.kill()
    # after kill, results are None
    out2 = client.llm_batch_generate(["x"])
    assert out2 == [None]


def test_unknown_engine_rejected():
    with pytest.raises(ValueError):
        LLMClient(engine="cuda")


def test_tpu_ts_engine_generates():
    cfg = tiny_config(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    engine = ServeEngine(params, cfg, proc, max_batch_size=2,
                         max_model_len=256, cache_dtype=jnp.float32,
                         attn_impl="xla", decode_chunk=4)
    client = LLMClient(
        engine="tpu-ts", serve_engine=engine,
        sampling_params={"max_tokens": 4, "temperature": 0.0},
    )
    try:
        out = client.llm_batch_generate(
            ["describe <ts><ts/>", "and <ts><ts/>"],
            [[np.arange(8.0)], [np.arange(12.0)]],
        )
        assert len(out) == 2
        assert all(isinstance(o, str) and o for o in out)
    finally:
        client.kill()


def test_openai_engine_uses_client():
    calls = []

    def fake_client(prompt):
        calls.append(prompt)
        return f"echo:{prompt}"

    client = LLMClient(engine="openai", openai_client=fake_client)
    out = client.llm_batch_generate(["a", "b", "c"])
    assert out == ["echo:a", "echo:b", "echo:c"]
    assert sorted(calls) == ["a", "b", "c"]
