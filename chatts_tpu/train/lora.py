"""LoRA adapters for ChatTS fine-tuning.

The reference consumes LoRA through PEFT load+merge
(reference: demo/demo_lora.ipynb cells 2-4) and declares the fused target
groups qkv / gate_up for adaptation (reference: chatts_vllm.py:454-464).
Here adapters are first-party: a LoRA pytree (A: (in, r) random, B: (r, out)
zero) over the same target modules, applied functionally as
``W_eff = W + scale * A @ B`` inside jit — gradients flow only into the
adapter leaves, the base stays frozen via ``stop_gradient``.

``merge_lora`` produces plain merged params exportable with
``weights.save_checkpoint`` (the PEFT merge analog).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    target_modules: Sequence[str] = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora(params: Dict[str, Any], cfg: LoRAConfig, key: jax.Array,
              dtype=jnp.float32) -> Dict[str, Any]:
    """LoRA pytree mirroring params['llm']['layers'] structure: per layer,
    per target module, {'a': (in, r), 'b': (r, out)}."""
    layers = []
    keys = jax.random.split(key, len(params["llm"]["layers"]))
    for layer, k in zip(params["llm"]["layers"], keys):
        entry: Dict[str, Any] = {}
        subkeys = iter(jax.random.split(k, len(cfg.target_modules)))
        for module in cfg.target_modules:
            group = "self_attn" if module.endswith(("q_proj", "k_proj", "v_proj", "o_proj")) else "mlp"
            kernel = layer[group][module]["kernel"]
            fan_in, fan_out = kernel.shape
            entry[module] = {
                "a": (jax.random.normal(next(subkeys), (fan_in, cfg.rank)) * 0.02).astype(dtype),
                "b": jnp.zeros((cfg.rank, fan_out), dtype),
            }
        layers.append(entry)
    return {"layers": layers}


def _module_group(module: str) -> str:
    return "self_attn" if module.endswith(("q_proj", "k_proj", "v_proj", "o_proj")) else "mlp"


def apply_lora(params: Dict[str, Any], lora: Dict[str, Any],
               cfg: LoRAConfig, *, train: bool = True) -> Dict[str, Any]:
    """Effective params with adapters folded in.  With ``train=True`` the
    base weights are stop_gradient'ed so only adapter leaves receive grads."""
    base = jax.lax.stop_gradient(params) if train else params

    new_layers = []
    for layer, adapters in zip(base["llm"]["layers"], lora["layers"]):
        new_layer = dict(layer)
        for module, ab in adapters.items():
            group = _module_group(module)
            new_group = dict(new_layer[group])
            dense = dict(new_group[module])
            delta = (
                ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)
            ) * cfg.scale
            dense["kernel"] = (
                dense["kernel"].astype(jnp.float32) + delta
            ).astype(dense["kernel"].dtype)
            new_group[module] = dense
            new_layer[group] = new_group
        new_layers.append(new_layer)

    new_llm = dict(base["llm"])
    new_llm["layers"] = new_layers
    return {"ts_encoder": base["ts_encoder"], "llm": new_llm}


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any],
               cfg: LoRAConfig) -> Dict[str, Any]:
    """Permanently merge adapters into plain params (PEFT merge analog)."""
    return apply_lora(params, lora, cfg, train=False)


def lora_param_count(lora: Dict[str, Any]) -> int:
    return sum(
        int(ab[k].size)
        for layer in lora["layers"]
        for ab in layer.values()
        for k in ("a", "b")
    )
