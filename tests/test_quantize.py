"""Int8 weight-only quantization: round-trip error, forward closeness,
memory halving, greedy agreement."""
import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import GenerationConfig, tiny_config
from chatts_tpu.models import chatts, quantize
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.runtime.engine import InferenceEngine
from tests.helpers import FakeTokenizer


def make(seed=0):
    cfg = tiny_config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    return cfg, params


def test_quantize_dequantize_error():
    cfg, params = make()
    layer = params["llm"]["layers"][0]["self_attn"]["q_proj"]
    q = quantize.quantize_dense(layer)
    deq = quantize.dequantize_dense(q, dtype=jnp.float32)
    w = np.asarray(layer["kernel"])
    err = np.abs(np.asarray(deq["kernel"]) - w)
    # per-channel int8: max error <= scale/2 per channel
    scales = np.asarray(q["scales"])
    assert np.all(err <= scales[None, :] * 0.51)


def test_quantized_forward_close():
    cfg, params = make()
    qparams = quantize.quantize_params(params)
    ids = np.arange(12)[None] % 256
    pos = np.arange(12)[None]

    def logits(p):
        hidden, _ = chatts.forward(p, cfg, jnp.asarray(ids), jnp.asarray(pos),
                                   attn_impl="xla")
        return np.asarray(chatts.compute_logits(p, cfg, hidden))

    l1, l2 = logits(params), logits(qparams)
    # int8 weight-only: logits close in relative terms
    denom = np.abs(l1).max()
    assert np.abs(l1 - l2).max() / denom < 0.05


def test_quantized_memory_halved():
    cfg, params = make()
    qparams = quantize.quantize_params(params)
    full = quantize.param_bytes(params["llm"])
    quant = quantize.param_bytes(qparams["llm"])
    # fp32 baseline -> int8 on the projection majority: > 2x smaller
    assert quant < full / 2


def test_quantized_engine_generates():
    cfg, params = make(seed=3)
    qparams = quantize.quantize_params(params)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    batch = proc(["analyze <ts><ts/>"], [np.arange(16.0)])
    gen = GenerationConfig(max_new_tokens=8, greedy=True)
    r_full = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                             attn_impl="xla", fuse=False).generate(batch, gen)
    r_q = InferenceEngine(qparams, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", fuse=False).generate(batch, gen)
    assert len(r_q.token_ids[0]) == 8
    # greedy outputs mostly agree on a tiny random model (allow some drift)
    agree = sum(a == b for a, b in zip(r_full.token_ids[0], r_q.token_ids[0]))
    assert agree >= 4


def test_fuse_then_quantize():
    cfg, params = make(seed=4)
    fused = chatts.maybe_fuse(params)
    q = quantize.quantize_params(fused)
    assert "kernel_q" in q["llm"]["layers"][0]["self_attn"]["qkv_proj"]
    ids = np.arange(8)[None] % 256
    pos = np.arange(8)[None]
    h1, _ = chatts.forward(fused, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           attn_impl="xla")
    h2, _ = chatts.forward(q, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           attn_impl="xla")
    rel = np.abs(np.asarray(h1) - np.asarray(h2)).max() / (np.abs(np.asarray(h1)).max() + 1e-9)
    assert rel < 0.1


def test_init_quantized_params_direct():
    cfg, _ = make()
    from chatts_tpu.models.quantize import init_quantized_params

    import jax

    qp = init_quantized_params(cfg, jax.random.PRNGKey(0))
    layer0 = qp["llm"]["layers"][0]
    assert "qkv_proj" in layer0["self_attn"]
    assert layer0["self_attn"]["qkv_proj"]["kernel_q"].dtype.name == "int8"
    assert "lm_head_q" in qp["llm"]
    # runs a forward pass
    import jax.numpy as jnp
    import numpy as np
    from chatts_tpu.models import chatts

    ids = np.arange(8)[None] % cfg.llm.vocab_size
    pos = np.arange(8)[None]
    hidden, _ = chatts.forward(qp, cfg, jnp.asarray(ids), jnp.asarray(pos),
                               attn_impl="xla")
    logits = chatts.compute_logits(qp, cfg, hidden)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_quantized_checkpoint_load(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chatts_tpu.models import chatts, weights

    cfg, params = make(seed=7)
    weights.save_checkpoint(str(tmp_path), cfg, params)
    cfg2, qparams = weights.load_checkpoint(
        str(tmp_path), dtype=jnp.bfloat16, quantize_int8=True
    )
    assert "kernel_q" in qparams["llm"]["layers"][0]["self_attn"]["q_proj"]
    assert "lm_head_q" in qparams["llm"]
    ids = np.arange(8)[None] % cfg.llm.vocab_size
    pos = np.arange(8)[None]

    def logits(p, c):
        hidden, _ = chatts.forward(p, c, jnp.asarray(ids), jnp.asarray(pos),
                                   attn_impl="xla")
        return np.asarray(chatts.compute_logits(p, c, hidden))

    l_full = logits(params, cfg)
    l_q = logits(qparams, cfg2)
    rel = np.abs(l_full - l_q).max() / (np.abs(l_full).max() + 1e-9)
    assert rel < 0.1


def test_int8_kv_cache_decode_close_to_bf16():
    """Decode with int8 KV caches must track the bf16-cache decode closely."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.models import chatts
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.runtime.engine import InferenceEngine
    from tests.helpers import FakeTokenizer

    cfg, params = make(seed=11)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    batch = proc(["compare <ts><ts/> caches", "again <ts><ts/>"],
                 [np.arange(16.0), np.sin(np.arange(12.0)) * 4])
    gen = GenerationConfig(max_new_tokens=10, greedy=True)
    r_bf16 = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                             attn_impl="xla", fuse=False).generate(batch, gen)
    r_int8 = InferenceEngine(params, cfg, cache_dtype=jnp.int8,
                             attn_impl="xla", fuse=False).generate(batch, gen)
    # int8 KV is near-lossless: most greedy tokens agree on a random model
    for a, b in zip(r_bf16.token_ids, r_int8.token_ids):
        agree = sum(x == y for x, y in zip(a, b))
        assert agree >= len(a) // 2, (a, b)


def test_int8_kv_quantize_roundtrip():
    import jax.numpy as jnp
    import numpy as np
    from chatts_tpu.models.qwen import _quantize_kv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (2, 4, 8, 128)), jnp.float32)
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4, 8)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    rel = np.abs(deq - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01  # per-token int8: <1% relative error


def test_ragged_int8_matches_dequant_reference():
    """int8 ragged kernel (interpret mode) vs dequantized einsum reference."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    import chatts_tpu.ops.ragged_decode_attention as mod
    from chatts_tpu.models.qwen import _quantize_kv
    from tests.test_ragged_attention import reference_decode

    b, h, kvh, d, s = 2, 8, 4, 128, 512
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    lens = jnp.asarray([512, 300], jnp.int32)
    k_q, k_s = _quantize_kv(k)
    v_q, v_s = _quantize_kv(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    ref = reference_decode(q, k_deq, v_deq, lens)

    out = mod.ragged_decode_attention_int8(
        q, k_q, v_q, k_s, v_s, lens, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
