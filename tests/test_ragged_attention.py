"""Ragged decode attention vs XLA reference (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.ops.attention import mha_reference
from chatts_tpu.ops import ragged_decode_attention as rda


def reference_decode(q, k_cache, v_cache, lengths):
    """Decode via the einsum reference: q (B, H, D) against valid prefixes.
    Caches are head-major (B, KVH, S, D)."""
    b, h, d = q.shape
    s = k_cache.shape[2]
    q4 = q[:, None, :, :]  # (B, 1, H, D)
    kv_positions = jnp.tile(jnp.arange(s)[None], (b, 1))
    kv_valid = kv_positions < lengths[:, None]
    q_positions = (lengths - 1)[:, None]
    out = mha_reference(
        q4, jnp.swapaxes(k_cache, 1, 2), jnp.swapaxes(v_cache, 1, 2),
        q_positions=q_positions, kv_positions=kv_positions, kv_valid=kv_valid,
    )
    return out[:, 0]


@pytest.mark.parametrize("lengths", [[1024, 300, 1, 513], [256, 256, 256, 256]])
def test_ragged_matches_reference(lengths):
    b, h, kvh, d, s = 4, 8, 4, 128, 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)

    ref = reference_decode(q, k, v, lens)

    # interpret-mode pallas on CPU
    out = rda.ragged_decode_attention(q, k, v, lens, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_supported_gate():
    q = jnp.zeros((2, 8, 128))
    k = jnp.zeros((2, 4, 1024, 128))
    assert rda.supported_hm(q, k)
    k_bad = jnp.zeros((2, 4, 1000, 128))
    assert not rda.supported_hm(q, k_bad)
