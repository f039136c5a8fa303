"""ChatTS = Qwen2/Qwen3 decoder + time-series patch encoder + embedding merge.

TPU-native counterpart of ``Qwen2TSForCausalLM`` / ``Qwen3TSForCausalLM``
(reference: chatts/vllm/chatts_vllm.py:452-625,633-806).  Differences by
design:

* The reference merges patch embeddings by masking ``input_ids`` positions
  equal to ``ts_token_start_index`` at runtime (chatts_vllm.py:564-574).
  Here the processor precomputes an explicit (series, patch) -> (seq, token)
  scatter map on host, so the device graph is a single static-shape
  ``.at[].set(mode="drop")`` scatter — no dynamic shapes, no boolean
  compaction.
* The TS encoder runs fully batched (no per-sample loop) in float32.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from chatts_tpu.core.config import ChatTSConfig
from chatts_tpu.models import qwen, ts_encoder

Params = Dict[str, Any]


def init_params(cfg: ChatTSConfig, key: jax.Array, dtype=None) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ts_encoder": ts_encoder.init_params(cfg.ts, k1),
        "llm": qwen.init_params(cfg.llm, k2, dtype=dtype),
    }


def load_torch_state_dict(state_dict, cfg: ChatTSConfig, dtype=None) -> Params:
    return {
        "ts_encoder": ts_encoder.load_torch_state_dict(state_dict, cfg.ts),
        "llm": qwen.load_torch_state_dict(state_dict, cfg.llm, dtype=dtype),
    }


def maybe_fuse(params: Params) -> Params:
    """Fuse qkv / gate_up projections when params live on a single device
    (decode-throughput optimization; no-op for already-fused or TP-sharded
    params)."""
    layer0 = params["llm"]["layers"][0]
    if "qkv_proj" in layer0["self_attn"]:
        return params
    if "kernel" not in layer0["self_attn"]["q_proj"]:
        # Quantized layouts (kernel_q / kernel_q4): fuse before quantizing
        # (quantize.init_quantized_params(fused=True)) — post-hoc fusion
        # would have to repack nibbles/scales.
        return params
    kernel = layer0["self_attn"]["q_proj"]["kernel"]
    sharding = getattr(kernel, "sharding", None)
    if sharding is not None and len(getattr(sharding, "device_set", [1])) > 1:
        return params
    return {
        "ts_encoder": params["ts_encoder"],
        "llm": qwen.fuse_projections(params["llm"]),
    }


def merge_embeddings(
    token_embeds: jnp.ndarray,  # (B, T, H)
    patch_embeds: jnp.ndarray,  # (N, Pmax, H)
    scatter_seq: jnp.ndarray,  # (N, Pmax) int32; OOB => dropped
    scatter_tok: jnp.ndarray,  # (N, Pmax) int32
) -> jnp.ndarray:
    """Scatter patch embeddings into placeholder token positions.

    Equivalent to vLLM's ``merge_multimodal_embeddings``
    (reference: chatts_vllm.py:571-573) but with host-computed indices and
    ``mode='drop'`` handling padded patch slots.
    """
    h = token_embeds.shape[-1]
    flat_patches = patch_embeds.reshape(-1, h).astype(token_embeds.dtype)
    return token_embeds.at[scatter_seq.reshape(-1), scatter_tok.reshape(-1)].set(
        flat_patches, mode="drop"
    )


def input_embeddings(
    params: Params,
    cfg: ChatTSConfig,
    input_ids: jnp.ndarray,  # (B, T)
    ts_values: Optional[jnp.ndarray] = None,  # (N, Lmax)
    ts_mask: Optional[jnp.ndarray] = None,  # (N, Lmax)
    scatter_seq: Optional[jnp.ndarray] = None,  # (N, Pmax)
    scatter_tok: Optional[jnp.ndarray] = None,  # (N, Pmax)
) -> jnp.ndarray:
    """Token embeddings with TS patch embeddings merged in."""
    embeds = qwen.embed_tokens(params["llm"], input_ids)
    if ts_values is not None and ts_values.shape[0] > 0:
        patch_embeds, _, _ = ts_encoder.forward(
            params["ts_encoder"], ts_values, ts_mask, cfg.ts
        )
        embeds = merge_embeddings(embeds, patch_embeds, scatter_seq, scatter_tok)
    return embeds


def forward(
    params: Params,
    cfg: ChatTSConfig,
    input_ids: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    ts_values=None,
    ts_mask=None,
    scatter_seq=None,
    scatter_tok=None,
    kv_caches: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    write_pos=None,
    kv_valid=None,
    kv_positions=None,
    attn_impl: str = "auto",
    mesh=None,
    act_int8: bool = False,
):
    """Full forward: merge-embed -> decoder -> hidden states.

    Returns (hidden (B, T, H), new kv caches).
    """
    embeds = input_embeddings(
        params, cfg, input_ids, ts_values, ts_mask, scatter_seq, scatter_tok
    )
    return qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=kv_caches, write_pos=write_pos,
        kv_valid=kv_valid, kv_positions=kv_positions, attn_impl=attn_impl,
        mesh=mesh, act_int8=act_int8,
    )


def compute_logits(params: Params, cfg: ChatTSConfig, hidden: jnp.ndarray,
                   mesh=None):
    return qwen.compute_logits(params["llm"], cfg.llm, hidden, mesh=mesh)
