"""Pallas flash attention vs XLA reference attention (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU — exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.ops.attention import mha_reference
from chatts_tpu.ops.flash_attention import flash_attention, supported


def make_inputs(b, t, h, kvh, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, t, kvh, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, t, kvh, d)), dtype)
    positions = jnp.tile(jnp.arange(t)[None], (b, 1))
    return q, k, v, positions


@pytest.mark.parametrize("b,t,h,kvh,d", [(1, 256, 4, 2, 128), (2, 512, 4, 4, 128),
                                          (1, 1024, 4, 2, 128)])  # 1024: adaptive 256x512 blocks, multi-k-block
def test_flash_matches_reference_causal(b, t, h, kvh, d):
    q, k, v, positions = make_inputs(b, t, h, kvh, d)
    seq_lens = jnp.asarray([t] * b) if b == 1 else jnp.asarray([t, t - 200])
    kv_valid = positions < seq_lens[:, None]

    ref = mha_reference(
        q, k, v, q_positions=positions, kv_positions=positions, kv_valid=kv_valid
    )
    out = flash_attention(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_valid=kv_valid, interpret=True,
    )
    # Compare only valid query rows (invalid rows are junk in both).
    mask = np.asarray(kv_valid)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(out)[i][mask[i]],
            np.asarray(ref)[i][mask[i]],
            rtol=2e-4, atol=2e-4,
        )


def test_flash_fully_masked_rows_are_zero():
    b, t, h, kvh, d = 1, 256, 2, 2, 128
    q, k, v, positions = make_inputs(b, t, h, kvh, d, seed=1)
    kv_valid = jnp.zeros((b, t), bool)  # nothing valid
    out = flash_attention(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_valid=kv_valid, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flash_bfloat16():
    b, t, h, kvh, d = 1, 256, 4, 2, 128
    q, k, v, positions = make_inputs(b, t, h, kvh, d, seed=2, dtype=jnp.bfloat16)
    kv_valid = jnp.ones((b, t), bool)
    ref = mha_reference(
        q, k, v, q_positions=positions, kv_positions=positions, kv_valid=kv_valid
    )
    out = flash_attention(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_valid=kv_valid, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_supported_gate():
    q, k, _, _ = make_inputs(1, 256, 4, 2, 128)
    assert supported(q, k)
    q2, k2, _, _ = make_inputs(1, 100, 4, 2, 128)  # t not block-aligned
    assert not supported(q2, k2)
    q3, k3, _, _ = make_inputs(1, 256, 4, 2, 96)  # odd head dim
    assert not supported(q3, k3)


def test_auto_dispatch_takes_kernel_at_512(monkeypatch):
    """attn 'auto' routes T>=512 prefills to the flash kernel (measured
    crossover, BENCHMARKS.md r2); CHATTS_FLASH_INTERPRET=1 exercises the
    exact dispatch on CPU."""
    from chatts_tpu.ops import attention as attn_mod

    monkeypatch.setenv("CHATTS_FLASH_INTERPRET", "1")
    b, t, h, kvh, d = 1, 512, 4, 2, 128
    q, k, v, positions = make_inputs(b, t, h, kvh, d)
    kv_valid = positions < t

    called = {}
    orig = flash_attention

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(
        "chatts_tpu.ops.flash_attention.flash_attention", spy)
    out = attn_mod.attention(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_valid=kv_valid, impl="auto",
    )
    assert called.get("yes"), "auto did not take the flash kernel at T=512"
    ref = mha_reference(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_valid=kv_valid,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
