"""Golden test: our functional JAX decoder vs HF transformers' torch
Qwen2/Qwen3 on a tiny-random checkpoint (SURVEY §4 prescription: tiny-random
Qwen2 -> logits vs fixtures; here the fixture generator is transformers
itself, available in-environment)."""
import numpy as np
import pytest

from chatts_tpu.core.config import QwenConfig
from chatts_tpu.models import qwen

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def build_hf_qwen2(seed=0):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Qwen2Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        use_sliding_window=False,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = QwenConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        rope_theta=10000.0,
        attention_bias=True,
        qk_norm=False,
        dtype="float32",
    )
    return model, cfg


def build_hf_qwen3(seed=0):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Qwen3Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = QwenConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=10000.0,
        attention_bias=False,
        qk_norm=True,
        dtype="float32",
    )
    return model, cfg


def to_numpy_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("family", ["qwen2", "qwen3"])
def test_logits_match_hf(family):
    import jax.numpy as jnp

    model, cfg = build_hf_qwen2() if family == "qwen2" else build_hf_qwen3()
    params = qwen.load_torch_state_dict(
        to_numpy_state_dict(model), cfg, dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    positions = np.tile(np.arange(12), (2, 1))
    embeds = qwen.embed_tokens(params, jnp.asarray(ids))
    hidden, _ = qwen.forward(
        params, cfg, embeds, jnp.asarray(positions), attn_impl="xla"
    )
    logits = np.asarray(qwen.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    """Prefill+decode through the cache must equal a single full forward."""
    import jax.numpy as jnp

    model, cfg = build_hf_qwen2(seed=1)
    params = qwen.load_torch_state_dict(
        to_numpy_state_dict(model), cfg, dtype=jnp.float32
    )
    from chatts_tpu.runtime import kv_cache

    rng = np.random.default_rng(1)
    full_len = 10
    prefill_len = 6
    ids = rng.integers(0, cfg.vocab_size, size=(2, full_len))
    positions_full = np.tile(np.arange(full_len), (2, 1))

    # Reference: single full forward.
    embeds = qwen.embed_tokens(params, jnp.asarray(ids))
    hidden_full, _ = qwen.forward(
        params, cfg, embeds, jnp.asarray(positions_full), attn_impl="xla"
    )

    # Prefill 6, then decode 4 tokens one at a time.
    cache_len = 16
    caches = kv_cache.allocate(cfg, 2, cache_len, jnp.float32)
    kv_positions = jnp.tile(jnp.arange(cache_len)[None], (2, 1))
    seq_lens = jnp.asarray([prefill_len, prefill_len])
    kv_valid = kv_positions < seq_lens[:, None]
    embeds_p = qwen.embed_tokens(params, jnp.asarray(ids[:, :prefill_len]))
    hidden_p, caches = qwen.forward(
        params, cfg, embeds_p, jnp.asarray(positions_full[:, :prefill_len]),
        kv_caches=caches, write_pos=None,
        kv_valid=kv_valid, kv_positions=kv_positions, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(hidden_p),
        np.asarray(hidden_full)[:, :prefill_len],
        rtol=1e-4, atol=1e-4,
    )

    cur = seq_lens
    for step in range(prefill_len, full_len):
        tok = jnp.asarray(ids[:, step : step + 1])
        embeds_d = qwen.embed_tokens(params, tok)
        pos = cur[:, None]
        kv_valid_d = kv_positions <= cur[:, None]
        hidden_d, caches = qwen.forward(
            params, cfg, embeds_d, pos,
            kv_caches=caches, write_pos=pos,
            kv_valid=kv_valid_d, kv_positions=kv_positions, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(hidden_d)[:, 0],
            np.asarray(hidden_full)[:, step],
            rtol=1e-4, atol=1e-4,
        )
        cur = cur + 1


def test_padded_batch_matches_unpadded():
    """Right-padding + position masking must not change valid-token logits."""
    import jax.numpy as jnp

    model, cfg = build_hf_qwen2(seed=2)
    params = qwen.load_torch_state_dict(
        to_numpy_state_dict(model), cfg, dtype=jnp.float32
    )
    rng = np.random.default_rng(2)
    ids_short = rng.integers(0, cfg.vocab_size, size=(1, 5))

    # Unpadded forward.
    embeds = qwen.embed_tokens(params, jnp.asarray(ids_short))
    hidden_ref, _ = qwen.forward(
        params, cfg, embeds, jnp.asarray(np.arange(5)[None]), attn_impl="xla"
    )

    # Same tokens padded to 8 with junk, masked via kv_valid.
    ids_pad = np.concatenate([ids_short, np.full((1, 3), 7)], axis=1)
    positions = np.arange(8)[None]
    kv_valid = (np.arange(8) < 5)[None]
    embeds_p = qwen.embed_tokens(params, jnp.asarray(ids_pad))
    hidden_pad, _ = qwen.forward(
        params, cfg, embeds_p, jnp.asarray(positions),
        kv_valid=jnp.asarray(kv_valid), kv_positions=jnp.asarray(positions),
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(hidden_pad)[:, :5], np.asarray(hidden_ref),
        rtol=1e-4, atol=1e-4,
    )


def test_scatter_token_spans_semantics():
    """The span-window cache write must equal a reference loop: contiguous
    (KVH, T[, D]) blocks land at (row, :, start); out-of-bounds rows drop
    whole windows (the inactive/padded routing contract)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, kvh, s, d, a, t = 6, 2, 32, 4, 4, 8
    cache = jnp.asarray(rng.normal(size=(b, kvh, s, d)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(a, kvh, t, d)), jnp.float32)
    rows = jnp.asarray([1, 4, b + 2, 0], jnp.int32)  # row 2 is OOB -> drop
    starts = jnp.asarray([0, 8, 16, 24], jnp.int32)

    out = qwen._scatter_token_spans(cache, vals, rows, starts)
    ref = np.array(cache)
    for i, (r, st) in enumerate([(1, 0), (4, 8), (None, 16), (0, 24)]):
        if r is None:  # OOB row: window dropped
            continue
        ref[r, :, st:st + t] = np.array(vals)[i]
    np.testing.assert_allclose(np.array(out), ref, rtol=0, atol=0)

    # scalar start broadcast + rank-3 (scales) operand
    cache3 = jnp.zeros((b, kvh, s), jnp.float32)
    vals3 = jnp.ones((a, kvh, t), jnp.float32)
    out3 = qwen._scatter_token_spans(
        cache3, vals3, jnp.asarray([0, 1, 2, 3], jnp.int32), jnp.int32(4))
    expect = np.zeros((b, kvh, s), np.float32)
    expect[:4, :, 4:12] = 1.0
    np.testing.assert_allclose(np.array(out3), expect)
