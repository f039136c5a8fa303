"""KV cache allocation for the batch inference engine.

Dense per-slot layout: per layer a pair of **(B, KVH, S, D)** arrays —
head-major so the ragged decode kernel can DMA per-(slot, head) blocks that
stay aligned to the (S, D) tile (a (…, KVH, D) layout makes single-head
slices unaligned under Mosaic's tiling).  This is the TPU replacement for the
part of vLLM's paged KV machinery that batch inference actually needs
(reference dependency: vLLM 0.8.5, SURVEY §2.4); the serving path adds slot
reuse on top (``chatts_tpu.serve``).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from chatts_tpu.core.config import QwenConfig

LayerCache = Tuple[jnp.ndarray, jnp.ndarray]


def allocate(
    cfg: QwenConfig, batch_size: int, max_seq_len: int, dtype=jnp.bfloat16
) -> List[LayerCache]:
    """bf16 mode: per layer (k, v).  int8 mode (dtype=jnp.int8): per layer
    (k_q, v_q, k_scale, v_scale) with per-(slot, head, position) float32
    scales — halves KV bandwidth/capacity cost at near-lossless accuracy."""
    shape = (batch_size, cfg.num_key_value_heads, max_seq_len, cfg.head_dim)
    if jnp.dtype(dtype) == jnp.int8:
        sshape = shape[:3]
        return [
            (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
             jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32))
            for _ in range(cfg.num_hidden_layers)
        ]
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_hidden_layers)
    ]


def cache_bytes(cfg: QwenConfig, batch_size: int, max_seq_len: int, dtype=jnp.bfloat16) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    return (
        2
        * cfg.num_hidden_layers
        * batch_size
        * max_seq_len
        * cfg.num_key_value_heads
        * cfg.head_dim
        * itemsize
    )
