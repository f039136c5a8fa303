"""Fused qkv / gate_up projection parity."""
import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts, qwen


def test_fused_forward_matches_unfused():
    cfg = tiny_config(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, patch_size=4,
                      max_sequence_length=32, ts_token_start_index=120)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    fused = chatts.maybe_fuse(params)
    assert "qkv_proj" in fused["llm"]["layers"][0]["self_attn"]
    assert "gate_up_proj" in fused["llm"]["layers"][0]["mlp"]
    # idempotent
    assert chatts.maybe_fuse(fused) is fused

    ids = np.arange(10)[None] % 128
    pos = np.arange(10)[None]

    def logits(p):
        hidden, _ = chatts.forward(p, cfg, jnp.asarray(ids), jnp.asarray(pos),
                                   attn_impl="xla")
        return np.asarray(chatts.compute_logits(p, cfg, hidden))

    np.testing.assert_allclose(logits(params), logits(fused), rtol=1e-5, atol=1e-5)


def test_fused_qwen3_with_qk_norm():
    cfg = tiny_config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60,
                      qwen3=True)
    params = chatts.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    fused = chatts.maybe_fuse(params)
    ids = np.arange(6)[None] % 64
    pos = np.arange(6)[None]
    h1, _ = chatts.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           attn_impl="xla")
    h2, _ = chatts.forward(fused, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)
