"""Pallas flash attention (prefill) for TPU.

Replaces the reference's flash-attn CUDA dependency
(reference: requirements.txt:22-24, README.md:69; SURVEY §2.4).  Blockwise
online-softmax attention with grouped-query head mapping and position-based
causal/validity masking, matching the semantics of
:func:`chatts_tpu.ops.attention.mha_reference` bit-for-bit up to fp tolerance
(validated in tests/test_flash_attention.py).

Layout: grid (B, H, nQ, nK) with the kv-block axis innermost — TPU grid
iteration is sequential over the minor axis, so VMEM scratch carries the
running max/denominator/accumulator across kv blocks of one q block.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_FLASH_SEQ_LEN = 256
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def interpret_enabled() -> bool:
    """Pallas interpret mode (CHATTS_FLASH_INTERPRET=1): lets CPU runs
    exercise the exact kernel dispatch the TPU takes under attn_impl
    'auto' (mirrors ragged_decode_attention / int4_matmul)."""
    import os

    return os.environ.get("CHATTS_FLASH_INTERPRET", "") == "1"

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Whether shapes/dtypes fit the kernel's constraints."""
    b, t, h, d = q.shape
    _, s, kvh, _ = k.shape
    return (
        d in (64, 128, 256)
        and t % DEFAULT_BLOCK_Q == 0
        and s % DEFAULT_BLOCK_K == 0
        and h % kvh == 0
        and q.dtype in (jnp.bfloat16, jnp.float32)
    )


def _flash_kernel(
    lim_ref,  # scalar prefetch: (B, nQ) int32 — last live k-block per q block
    q_pos_ref,  # (B, BQ) int32 — all batch rows of this q block
    kv_pos_ref,  # (B, BK) int32
    kv_valid_ref,  # (B, BK) int32
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D)
    v_ref,  # (1, 1, BK, D)
    out_ref,  # (1, 1, BQ, D)
    m_scratch,  # (BQ, 128) f32
    l_scratch,  # (BQ, 128) f32
    acc_scratch,  # (BQ, D) f32
    *,
    scale: float,
    num_k_blocks: int,
):
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # Causal block skipping: k blocks entirely in this q block's future are
    # masked to zero contribution, so skip their compute (the index maps
    # also clamp their DMAs to a block already resident — no HBM traffic).
    @pl.when(j <= lim_ref[bi, qi])
    def _compute():
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]  # (BK, D)

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        s = s * scale

        q_pos = q_pos_ref[bi]  # (BQ,)
        kv_pos = kv_pos_ref[bi]  # (BK,)
        kv_ok = kv_valid_ref[bi]  # (BK,)
        mask = (kv_ok[None, :] > 0) & (kv_pos[None, :] <= q_pos[:, None])
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scratch[:, :1]  # (BQ, 1)
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)  # kill fully-masked rows' spurious 1.0s
        alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)

        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        out_ref[0, 0] = (acc_scratch[:] / safe_l).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, KVH, D)
    v: jnp.ndarray,  # (B, S, KVH, D)
    *,
    q_positions: jnp.ndarray,  # (B, T)
    kv_positions: jnp.ndarray,  # (B, S)
    kv_valid: jnp.ndarray,  # (B, S) bool
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    _, s_len, kvh, _ = k.shape
    groups = h // kvh
    if scale is None:
        scale = d ** -0.5

    # Adaptive blocks: each Mosaic grid step carries ~0.35 us of fixed
    # overhead, so long prompts want the largest blocks the shape divides
    # (T=6144: 128x128 blocks -> 64k steps/head-batch; 256x512 -> 8k).
    # Working set stays ~2.5 MB of VMEM double-buffered.
    if block_q == DEFAULT_BLOCK_Q and t % 256 == 0:
        block_q = 256
    if block_k == DEFAULT_BLOCK_K and s_len % 512 == 0:
        block_k = 512

    # (B, H, T, D) layout for clean 2-D blocks per (batch, head).
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    n_q = t // block_q
    n_k = s_len // block_k
    grid = (b, h, n_q, n_k)

    # Causal block-skip limits: lim[bi, qi] = last k block with any position
    # <= this q block's max position.  Blocks past the limit contribute
    # nothing (fully masked), so the kernel skips their compute and the k/v
    # index maps clamp to an already-resident block (no re-DMA) — for
    # standard causal prefill this halves both MXU work and K/V traffic.
    kv_min = kv_positions.astype(jnp.int32).reshape(b, n_k, block_k).min(axis=2)
    qmax = q_positions.astype(jnp.int32).reshape(b, n_q, block_q).max(axis=2)
    live = kv_min[:, None, :] <= qmax[:, :, None]  # (B, nQ, nK)
    lim = jnp.max(
        jnp.where(live, jnp.arange(n_k, dtype=jnp.int32)[None, None, :], 0),
        axis=-1,
    )  # (B, nQ)

    kernel = functools.partial(
        _flash_kernel, scale=float(scale), num_k_blocks=n_k
    )

    def kv_index(bi, hi, qi, ki, lim_ref, g=groups):
        return (bi, hi // g, jnp.minimum(ki, lim_ref[bi, qi]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # Mask arrays ride along with all B rows per block (Pallas TPU
            # requires the last-two block dims aligned or full); the kernel
            # row-indexes by program_id(0).
            pl.BlockSpec((b, block_q), lambda bi, hi, qi, ki, lim: (0, qi)),
            pl.BlockSpec((b, block_k), lambda bi, hi, qi, ki, lim: (0, ki)),
            pl.BlockSpec((b, block_k), lambda bi, hi, qi, ki, lim: (0, ki)),
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi, ki, lim: (bi, hi, qi, 0),
            ),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki, lim: (bi, hi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(
        lim,
        q_positions.astype(jnp.int32),
        kv_positions.astype(jnp.int32),
        kv_valid.astype(jnp.int32),
        qt,
        kt,
        vt,
    )
    return jnp.swapaxes(out, 1, 2)
