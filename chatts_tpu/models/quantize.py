"""Weight-only int8 quantization for decode throughput and memory.

Parity role: the reference ships GPTQ-Int4 checkpoint variants
(reference: README.md:260-263) and relies on vLLM's quant kernels; here
per-output-channel symmetric int8 is first-party.  Decode is HBM-bound —
halving weight bytes roughly halves the per-token floor — and int8 weights
let ChatTS-8B fit a single 16 GB v5e chip.

Layout: each quantized dense layer stores ``kernel_q`` (in, out) int8 and
``scales`` (out,) float32 with ``W ≈ kernel_q * scales``; the matmul runs
``dot(x, kernel_q.astype(bf16)) * scales`` — XLA fuses the int8->bf16
convert into the dot's HBM read, so only int8 bytes stream from memory.
Per-output-channel scaling applied after the matmul is mathematically exact.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "qkv_proj",
    "gate_proj", "up_proj", "down_proj",
    "gate_up_proj",
)


def quantize_dense(layer: Dict[str, Any]) -> Dict[str, Any]:
    """{'kernel': (in, out)} -> {'kernel_q': int8, 'scales': f32 (out,)}.

    Runs on device (jnp) — no host round trip, so quantizing a multi-GB
    model takes milliseconds, not minutes over a device tunnel.
    """
    kernel = jnp.asarray(layer["kernel"]).astype(jnp.float32)
    scales = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    scales = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(kernel / scales), -127, 127).astype(jnp.int8)
    out: Dict[str, Any] = {"kernel_q": q, "scales": scales}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def dequantize_dense(layer: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    kernel = (
        jnp.asarray(layer["kernel_q"], jnp.float32) * layer["scales"][None, :]
    ).astype(dtype)
    out = {"kernel": kernel}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def quantize_llm(llm_params: Dict[str, Any], quantize_lm_head: bool = True) -> Dict[str, Any]:
    """Quantize all decoder projection layers (norms, embeddings, and the TS
    encoder stay full precision)."""
    new_layers = []
    for layer in llm_params["layers"]:
        new_layer = dict(layer)
        for group_name in ("self_attn", "mlp"):
            group = dict(new_layer[group_name])
            for mod, sub in list(group.items()):
                if mod in QUANT_TARGETS and isinstance(sub, dict) and "kernel" in sub:
                    group[mod] = quantize_dense(sub)
            new_layer[group_name] = group
        new_layers.append(new_layer)
    out = dict(llm_params)
    out["layers"] = new_layers
    if quantize_lm_head and "lm_head" in out:
        out["lm_head_q"] = quantize_dense({"kernel": out.pop("lm_head")})
    return out


def quantize_params(params: Dict[str, Any], quantize_lm_head: bool = True) -> Dict[str, Any]:
    return {
        "ts_encoder": params["ts_encoder"],
        "llm": quantize_llm(params["llm"], quantize_lm_head),
    }


def param_bytes(params: Any) -> int:
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params)
        if hasattr(leaf, "dtype")
    )
