"""TP-mesh ragged decode attention (VERDICT r1 item 5): the Pallas kernel
routed through shard_map over the (slot, kv-head) grid on the virtual
8-device CPU mesh (interpret mode), equivalent to the dense reference, and
actually exercised — not silently skipped — by TP-sharded serving."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.ops import ragged_decode_attention as rda
from chatts_tpu.parallel import mesh as mesh_lib
from chatts_tpu.parallel import sharding
from tests.test_ragged_attention import reference_decode


def _random_case(b, h, kvh, d, s, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (1, 8)])
def test_tp_kernel_matches_reference(dp, tp):
    b, h, kvh, d, s = 4, 8, 8, 128, 512
    q, k, v = _random_case(b, h, kvh, d, s)
    lens = jnp.asarray([512, 300, 1, 17], jnp.int32)
    mesh = mesh_lib.create_mesh(dp=dp, tp=tp, devices=jax.devices()[:dp * tp])

    ref = reference_decode(q, k, v, lens)
    out = rda.ragged_decode_attention_tp(
        q, k, v, lens, mesh=mesh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_kernel_on_placed_shards():
    """With inputs actually device_put on the mesh (the serving layout:
    kv heads over tp), outputs still match the reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, h, kvh, d, s = 2, 8, 4, 128, 512
    q, k, v = _random_case(b, h, kvh, d, s, seed=1)
    lens = jnp.asarray([100, 512], jnp.int32)
    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    qs = jax.device_put(q, NamedSharding(mesh, P(None, "tp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, "tp", None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(None, "tp", None, None)))

    ref = reference_decode(q, k, v, lens)
    out = rda.ragged_decode_attention_tp(
        qs, ks, vs, lens, mesh=mesh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_kernel_int8_matches_dequantized_reference():
    b, h, kvh, d, s = 2, 8, 4, 128, 512
    q, k, v = _random_case(b, h, kvh, d, s, seed=2)
    lens = jnp.asarray([256, 511], jnp.int32)
    mesh = mesh_lib.create_mesh(dp=2, tp=4)  # all 8 virtual devices

    from chatts_tpu.models.qwen import _quantize_kv

    k_q, k_s = _quantize_kv(k)
    v_q, v_s = _quantize_kv(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    ref = reference_decode(q, k_deq, v_deq, lens)

    out = rda.ragged_decode_attention_int8_tp(
        q, k_q, v_q, k_s, v_s, lens, mesh=mesh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_supported_tp_gate():
    mesh = mesh_lib.create_mesh(dp=2, tp=4)
    assert rda.supported_tp(mesh, batch=4, kv_heads=4, num_heads=8)
    assert not rda.supported_tp(mesh, batch=4, kv_heads=3, num_heads=8)
    assert not rda.supported_tp(mesh, batch=3, kv_heads=4, num_heads=8)
    assert not rda.supported_tp(mesh, batch=4, kv_heads=4, num_heads=6)


@pytest.fixture()
def ragged_interpret(monkeypatch):
    monkeypatch.setenv("CHATTS_RAGGED_INTERPRET", "1")


def _tp_serving_case(cache_dtype, seed=0):
    from chatts_tpu.core.config import tiny_config
    from chatts_tpu.models import chatts
    from chatts_tpu.processor.processor import ChatTSProcessor
    from tests.helpers import FakeTokenizer

    # head_dim 128 not required in interpret mode, but kvh must divide tp.
    cfg = tiny_config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    return cfg, params, proc


def test_tp_serving_exercises_ragged_kernel(ragged_interpret, monkeypatch):
    """TP-sharded ServeEngine with attn_impl='ragged' must (a) reproduce the
    single-device greedy tokens and (b) actually enter the shard_map kernel
    path — a counter proves no silent fallback to dense XLA."""
    from chatts_tpu.serve.scheduler import SamplingParams, ServeEngine

    cfg, params, proc = _tp_serving_case(jnp.float32)
    prompt = "serve <ts><ts/> ragged"
    ts = [np.arange(12.0)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    with ServeEngine(params, cfg, proc, max_batch_size=4, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="xla",
                     decode_chunk=4, fuse=False) as eng:
        ref = eng.generate_sync(prompt, ts, sp).output_tokens

    calls = {"tp": 0}
    real = rda.ragged_decode_attention_tp

    def counting(*args, **kwargs):
        calls["tp"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(rda, "ragged_decode_attention_tp", counting)

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    with ServeEngine(sharded, cfg, proc, max_batch_size=4, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="ragged",
                     decode_chunk=4, fuse=False) as eng:
        assert eng.mesh is not None
        got = eng.generate_sync(prompt, ts, sp).output_tokens

    assert got == ref
    assert calls["tp"] >= cfg.llm.num_hidden_layers  # once per layer at trace


def test_tp_batch_engine_ragged_matches_xla(ragged_interpret):
    """InferenceEngine decode through the TP kernel == dense XLA decode."""
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    cfg, params, proc = _tp_serving_case(jnp.float32, seed=3)
    batch = proc(["analyze <ts><ts/> now", "and <ts><ts/> too"],
                 [np.arange(12.0), np.sin(np.arange(8.0))])
    gen = GenerationConfig(max_new_tokens=6, greedy=True)

    ref = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False).generate(batch, gen)

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    eng = InferenceEngine(sharded, cfg, cache_dtype=jnp.float32,
                          attn_impl="ragged", fuse=False)
    assert eng.mesh is not None
    out = eng.generate(batch, gen)
    assert out.token_ids == ref.token_ids


def test_tp_serving_int8_kv_ragged(ragged_interpret):
    """int8 KV cache through the TP kernel path on the virtual mesh."""
    from chatts_tpu.serve.scheduler import SamplingParams, ServeEngine

    cfg, params, proc = _tp_serving_case(jnp.float32, seed=4)
    prompt = "int8 <ts><ts/> cache"
    ts = [np.arange(16.0)]
    sp = SamplingParams(max_tokens=5, temperature=0.0)

    with ServeEngine(params, cfg, proc, max_batch_size=4, max_model_len=256,
                     cache_dtype=jnp.float32, attn_impl="xla",
                     decode_chunk=4, fuse=False) as eng:
        ref = eng.generate_sync(prompt, ts, sp).output_tokens

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    with ServeEngine(sharded, cfg, proc, max_batch_size=4, max_model_len=256,
                     cache_dtype=jnp.int8, attn_impl="ragged",
                     decode_chunk=4, fuse=False) as eng:
        got = eng.generate_sync(prompt, ts, sp).output_tokens
    # int8 KV is near-lossless; greedy tokens match on this tiny model
    assert got == ref
