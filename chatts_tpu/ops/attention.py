"""Attention ops.

``mha_reference`` is the pure-XLA grouped-query attention used for correctness
and as the fallback path; :mod:`chatts_tpu.ops.flash_attention` provides the
Pallas prefill kernel validated against it.  This replaces the reference's
flash-attn CUDA dependency (reference: requirements.txt:22-24, SURVEY §2.4).

Positions-based masking covers every phase with one formula:
  attend(i, j) <=> kv_valid[j] and kv_positions[j] <= q_positions[i]
which is causal prefill, padded-batch prefill, and single-token decode against
a KV cache all at once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def mha_reference(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, KVH, D)
    v: jnp.ndarray,  # (B, S, KVH, D)
    *,
    q_positions: jnp.ndarray,  # (B, T) int
    kv_positions: jnp.ndarray,  # (B, S) int
    kv_valid: jnp.ndarray,  # (B, S) bool
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention with position-based causal masking.

    Softmax and score accumulation are float32 regardless of input dtype.
    Returns (B, T, H, D) in q's dtype.
    """
    b, t, h, d = q.shape
    _, s, kvh, _ = k.shape
    groups = h // kvh
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(b, t, kvh, groups, d)
    # (B, KVH, G, T, S)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores.astype(jnp.float32) * scale

    mask = kv_valid[:, None, :] & (
        kv_positions[:, None, :] <= q_positions[:, :, None]
    )  # (B, T, S)
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # Rows with no valid kv (fully masked) produce uniform probs over masked
    # entries; zero them for cleanliness.
    any_valid = jnp.any(mask, axis=-1)[:, None, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)

    out = jnp.einsum(
        "bkgts,bskd->btkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, h, d).astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_positions: jnp.ndarray,
    kv_positions: jnp.ndarray,
    kv_valid: jnp.ndarray,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch between XLA reference attention and the Pallas flash kernel.

    "auto" picks by the measured crossover (VERDICT r1 item 3).  A/B on the
    real v5e, full 28-layer 8B-shape forward with a data fetch (per-op
    microbenchmarks on the axon tunnel are dispatch-dominated and unusable),
    causal prompts, r2 kernel (block skipping + adaptive 256x512 blocks):

        | shape      | XLA einsum | flash kernel |
        |------------|-----------:|-------------:|
        | B32 T512   |    1517 ms |      1513 ms |
        | B8  T2048  |    2318 ms |      1719 ms |
        | B1  T2048  |     244 ms |       210 ms |
        | B1  T6144  |    1096 ms |       693 ms |
        | B1  T12288 | OOM(scores)|      1690 ms |

    The einsum materializes (H, T, S) f32 scores, so it loses HBM traffic
    as T grows and cannot run the reference's 12k streaming contexts at
    all; the kernel wins or ties everywhere it applies.  "auto" therefore
    takes flash whenever the shape fits the kernel (blocks divide, T >=
    512); short/ragged blocks stay on XLA, whose fused softmax is optimal
    there.  impl="flash"/"xla" force a path."""
    from chatts_tpu.ops import flash_attention as fa

    interp = fa.interpret_enabled()
    take_flash = impl == "flash"
    if (impl == "auto" and q.shape[1] >= 512
            and (jax.default_backend() == "tpu" or interp)):
        take_flash = True
    if take_flash and fa.supported(q, k):
        return fa.flash_attention(
            q, k, v,
            q_positions=q_positions,
            kv_positions=kv_positions,
            kv_valid=kv_valid,
            scale=scale,
            interpret=interp,
        )
    return mha_reference(
        q, k, v,
        q_positions=q_positions,
        kv_positions=kv_positions,
        kv_valid=kv_valid,
        scale=scale,
    )
