"""Tensor-parallel inference on the virtual 8-device CPU mesh: sharded params
through the real engine must reproduce the single-device greedy outputs
(GSPMD propagates the TP layout; no code changes in the engine)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import GenerationConfig, tiny_config
from chatts_tpu.models import chatts
from chatts_tpu.parallel import mesh as mesh_lib
from chatts_tpu.parallel import sharding
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.runtime.engine import InferenceEngine
from tests.helpers import FakeTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    return cfg, params, proc


def test_tp_sharded_generate_matches_single_device(setup):
    cfg, params, proc = setup
    batch = proc(["analyze <ts><ts/> now", "and <ts><ts/> too"],
                 [np.arange(12.0), np.sin(np.arange(8.0))])
    gen = GenerationConfig(max_new_tokens=6, greedy=True)

    ref = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False).generate(batch, gen)

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    q_kernel = sharded["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]
    assert len(q_kernel.sharding.device_set) == 4

    eng = InferenceEngine(sharded, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False)
    out = eng.generate(batch, gen)
    assert out.token_ids == ref.token_ids


def test_dp_tp_mesh_generate(setup):
    cfg, params, proc = setup
    batch = proc(["one <ts><ts/>", "two <ts><ts/>", "three <ts><ts/>",
                  "four <ts><ts/>"],
                 [np.arange(8.0) * (i + 1) for i in range(4)])
    gen = GenerationConfig(max_new_tokens=4, greedy=True)
    ref = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False).generate(batch, gen)

    mesh = mesh_lib.create_mesh(dp=2, tp=4)
    sharded = sharding.place_params(mesh, cfg, params)
    out = InferenceEngine(sharded, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False).generate(batch, gen)
    assert out.token_ids == ref.token_ids


def test_maybe_fuse_refuses_sharded(setup):
    cfg, params, proc = setup
    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    fused = chatts.maybe_fuse(sharded)
    # TP-sharded params must stay unfused (Megatron shards constituents).
    assert "qkv_proj" not in fused["llm"]["layers"][0]["self_attn"]


def test_tp_sharded_serving_engine(setup):
    """The continuous-batching engine (slot admission placement, decode scan,
    per-slot sampling) must reproduce single-device outputs with TP-sharded
    params — GSPMD propagates the layout through every serve-path op."""
    from chatts_tpu.serve.scheduler import SamplingParams, ServeEngine

    cfg, params, proc = setup
    prompt = "serve <ts><ts/> sharded"
    ts = [np.arange(12.0)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    with ServeEngine(params, cfg, proc, max_batch_size=2, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="xla",
                     decode_chunk=4, fuse=False) as eng:
        ref = eng.generate_sync(prompt, ts, sp).output_tokens

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    with ServeEngine(sharded, cfg, proc, max_batch_size=2, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="xla",
                     decode_chunk=4, fuse=False, prefill_chunk=32) as eng:
        got = eng.generate_sync(prompt, ts, sp).output_tokens
        # chunked long-prompt admission under TP as well
        long_prompt = "analyze <ts><ts/> " + "tok " * 150
        long_out = eng.generate_sync(long_prompt, [np.arange(16.0)], sp)
    assert got == ref
    assert len(long_out.output_tokens) == 6


def test_tp_sharded_mixed_admission_token_exact(setup):
    """The fused mixed prefill+decode step under a TP mesh: an admission
    arriving while a sharded engine decodes must stay token-exact vs the
    single-device batch engine (exercises forward_mixed's combined cache
    scatter and admission-row gather under GSPMD)."""
    import time

    from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine

    cfg, params, proc = setup
    gen = GenerationConfig(max_new_tokens=30, greedy=True)
    be = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                         attn_impl="xla", fuse=False)

    p1, t1 = "runner <ts><ts/> decodes long", [np.arange(12.0)]
    p2, t2 = "joins <ts><ts/> mid flight", [np.sin(np.arange(8.0))]
    exp1 = be.generate(proc([p1], t1), gen).token_ids[0]
    exp2 = be.generate(
        proc([p2], t2), GenerationConfig(max_new_tokens=5, greedy=True)
    ).token_ids[0]

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    with ServeEngine(sharded, cfg, proc, max_batch_size=4, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="xla",
                     decode_chunk=4, fuse=False) as eng:
        assert eng.mesh is not None
        r1 = Request(p1, t1, SamplingParams(max_tokens=30, temperature=0.0))
        eng.submit(r1)
        dl = time.time() + 120
        while not r1.output_tokens:
            assert time.time() < dl
            time.sleep(0.005)
        r2 = Request(p2, t2, SamplingParams(max_tokens=5, temperature=0.0))
        eng.submit(r2)
        saw_mixed = False
        while any(r.finished_s is None and r.error is None for r in (r1, r2)):
            saw_mixed = saw_mixed or eng._pending_mixed is not None
            assert time.time() < dl
            time.sleep(0.002)
    assert r1.error is None and r2.error is None
    assert saw_mixed, "admission did not take the mixed path"
    assert r1.output_tokens == exp1
    assert r2.output_tokens == exp2
