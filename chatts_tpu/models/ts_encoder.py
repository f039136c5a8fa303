"""TPU-native time-series patch encoder.

Functional re-design of the reference ``TimeSeriesEmbedding``
(reference: chatts/vllm/chatts_vllm.py:61-193).  The reference packs patches
with a per-sample Python loop on the hot request path; here the whole batch is
one fused masked computation with static shapes:

  (N, Lmax) values + (N, Lmax) valid mask
    -> pad-with-last-value via a clipped gather
    -> (N, Pmax, patch_size) patchify [+ position features]
    -> one MLP over all patches (MXU-friendly: a single large matmul stack)
    -> (N, Pmax, hidden) embeddings + (N, Pmax) patch-valid mask

All arithmetic accumulates in float32: value-QA answers ("how large is the
spike?") are sensitive to encoder precision (SURVEY §7 "Numerical parity").
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import TSEncoderConfig

Params = Dict[str, jnp.ndarray]


def init_params(cfg: TSEncoderConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Initialize encoder parameters (Lecun-normal kernels, zero bias)."""
    params: Params = {}
    sizes = [cfg.mlp_input_size] + [cfg.hidden_size] * cfg.num_layers
    keys = jax.random.split(key, cfg.num_layers + 1)
    layers = []
    for i in range(cfg.num_layers):
        fan_in = sizes[i]
        kernel = jax.random.normal(keys[i], (fan_in, sizes[i + 1]), dtype) / np.sqrt(
            fan_in
        )
        layers.append({"kernel": kernel, "bias": jnp.zeros((sizes[i + 1],), dtype)})
    params["mlp"] = layers
    if cfg.use_position_embedding:
        params["position_embedding"] = (
            jax.random.normal(
                keys[-1], (cfg.max_sequence_length + 1, cfg.embedding_dim), dtype
            )
            * 0.02
        )
    return params


def unpack_interleaved(encoded: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split the sp-encoding (N, 2L, 1) value/valid interleave into
    (N, L) values and (N, L) mask (reference: chatts_vllm.py:95-99 consumes the
    last feature channel as the mask)."""
    n = encoded.shape[0]
    x = encoded.reshape(n, -1, 2)
    return x[:, :, 0], x[:, :, 1]


def pad_with_last_value(values: jnp.ndarray, valid_lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace every position >= valid_length with the series' last valid value
    (reference semantics: chatts_vllm.py:121-125), vectorized as a clipped
    take_along_axis instead of a per-sample loop."""
    n, lmax = values.shape
    idx = jnp.arange(lmax)[None, :]
    last = jnp.maximum(valid_lengths[:, None] - 1, 0)
    gather_idx = jnp.minimum(idx, last)
    return jnp.take_along_axis(values, gather_idx, axis=1)


def forward(
    params: Params,
    values: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: TSEncoderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode a batch of ragged series.

    Args:
      params: encoder parameters.
      values: (N, Lmax) float series values, junk beyond each valid length.
      mask: (N, Lmax) 1.0 for valid points, 0.0 for padding.
      cfg: encoder config. Lmax must be a multiple of cfg.patch_size.

    Returns:
      embeddings: (N, Pmax, hidden) float32, junk rows where patch invalid.
      patch_cnt: (N,) int32 = ceil(valid_len / patch_size)
        (reference: chatts_vllm.py:100).
      patch_mask: (N, Pmax) bool, True for real patches.
    """
    n, lmax = values.shape
    p = cfg.patch_size
    if lmax % p != 0:
        raise ValueError(f"Lmax={lmax} must be a multiple of patch_size={p}")
    pmax = lmax // p

    values = values.astype(jnp.float32)
    valid_lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    patch_cnt = (valid_lengths + p - 1) // p
    patch_mask = jnp.arange(pmax)[None, :] < patch_cnt[:, None]

    padded = pad_with_last_value(values, valid_lengths)
    patches = padded.reshape(n, pmax, p)

    if cfg.use_position_embedding:
        # Real positions keep their index; padding points use the dedicated
        # padding slot of the embedding table (reference: chatts_vllm.py:73-76,
        # 119-129).
        pos = jnp.arange(lmax)[None, :]
        pos = jnp.where(pos < valid_lengths[:, None], pos, cfg.padding_idx)
        table = params["position_embedding"].astype(jnp.float32)
        pos_emb = jnp.take(table, pos, axis=0)  # (N, Lmax, emb)
        pos_feat = pos_emb.reshape(n, pmax, p * cfg.embedding_dim)
        x = jnp.concatenate([patches, pos_feat], axis=-1)
    elif cfg.use_position_idx:
        # Normalized float position channel, interleaved per point as
        # [v0, p0, v1, p1, ...]; normalization is by the *batch-global* max
        # valid length, padding marked -1 (reference: chatts_vllm.py:143-154).
        pos = jnp.arange(lmax, dtype=jnp.float32)[None, :]
        denom = jnp.maximum(1, jnp.max(valid_lengths) - 1).astype(jnp.float32)
        pos = pos / denom
        pos = jnp.where(jnp.arange(lmax)[None, :] < valid_lengths[:, None], pos, -1.0)
        x = jnp.stack([padded, pos], axis=-1).reshape(n, pmax, 2 * p)
    else:
        x = patches

    for i, layer in enumerate(params["mlp"]):
        kernel = layer["kernel"].astype(jnp.float32)
        bias = layer["bias"].astype(jnp.float32)
        # HIGHEST precision: value-QA accuracy depends on true-fp32 encoder
        # matmuls (the default matmul precision truncates inputs to bf16).
        x = (
            jnp.dot(
                x, kernel,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + bias
        )
        if i < len(params["mlp"]) - 1:
            # torch.nn.GELU default is the exact erf formulation.
            x = jax.nn.gelu(x, approximate=False)

    return x, patch_cnt.astype(jnp.int32), patch_mask


def load_torch_state_dict(
    state_dict, cfg: TSEncoderConfig, prefix: str = "ts_encoder."
) -> Params:
    """Convert a HF/torch state dict (numpy arrays) into our param pytree.

    torch Linear stores weight as (out, in); our kernels are (in, out).
    """
    params: Params = {"mlp": []}
    for i in range(cfg.num_layers):
        # torch Sequential indices: Linear at even slots (GELU between).
        slot = 2 * i
        w = np.asarray(state_dict[f"{prefix}mlp.{slot}.weight"])
        b = np.asarray(state_dict[f"{prefix}mlp.{slot}.bias"])
        params["mlp"].append(
            {"kernel": jnp.asarray(w.T, jnp.float32), "bias": jnp.asarray(b, jnp.float32)}
        )
    if cfg.use_position_embedding:
        emb = np.asarray(state_dict[f"{prefix}position_embedding.weight"])
        params["position_embedding"] = jnp.asarray(emb, jnp.float32)
    return params
