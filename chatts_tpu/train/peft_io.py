"""PEFT LoRA adapter interop.

The reference loads and merges LoRA adapters via PEFT
(reference: demo/demo_lora.ipynb cells 2-4).  This module reads a PEFT
adapter directory (``adapter_config.json`` + ``adapter_model.safetensors``)
into our LoRA pytree so published ChatTS adapters merge natively, and writes
our adapters back out in PEFT layout.

PEFT tensor naming:
  base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight  (r, in)
  base_model.model.model.layers.{i}.mlp.gate_proj.lora_B.weight     (out, r)
Our layout per layer/module: {"a": (in, r), "b": (r, out)} with
scale = lora_alpha / r.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from chatts_tpu.train.lora import LoRAConfig, _module_group

_PEFT_PREFIXES = (
    "base_model.model.model.layers.",
    "base_model.model.layers.",
    "model.layers.",
)


def load_peft_adapter(path: str) -> Tuple[LoRAConfig, Dict[str, Any]]:
    """(LoRAConfig, lora pytree) from a PEFT adapter directory."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    rank = int(acfg.get("r", 8))
    alpha = float(acfg.get("lora_alpha", rank * 2))
    targets = tuple(acfg.get("target_modules", []))

    from safetensors import safe_open

    tensor_file = os.path.join(path, "adapter_model.safetensors")
    tensors: Dict[str, np.ndarray] = {}
    with safe_open(tensor_file, framework="np") as f:
        for name in f.keys():
            tensors[name] = f.get_tensor(name)

    # Group by (layer_idx, module).
    by_layer: Dict[int, Dict[str, Dict[str, np.ndarray]]] = {}
    for name, tensor in tensors.items():
        stripped = None
        for prefix in _PEFT_PREFIXES:
            if name.startswith(prefix):
                stripped = name[len(prefix):]
                break
        if stripped is None:
            continue
        parts = stripped.split(".")
        # {i}.self_attn.q_proj.lora_A.weight
        layer_idx = int(parts[0])
        module = parts[2]
        ab = "a" if "lora_A" in name else "b"
        by_layer.setdefault(layer_idx, {}).setdefault(module, {})[ab] = tensor

    num_layers = max(by_layer) + 1 if by_layer else 0
    modules = sorted({m for layer in by_layer.values() for m in layer})
    layers = []
    for i in range(num_layers):
        entry: Dict[str, Any] = {}
        for module in modules:
            ab = by_layer.get(i, {}).get(module)
            if ab is None or "a" not in ab or "b" not in ab:
                continue
            entry[module] = {
                # PEFT lora_A (r, in) -> a (in, r); lora_B (out, r) -> b (r, out)
                "a": jnp.asarray(np.ascontiguousarray(ab["a"].T), jnp.float32),
                "b": jnp.asarray(np.ascontiguousarray(ab["b"].T), jnp.float32),
            }
        layers.append(entry)

    cfg = LoRAConfig(rank=rank, alpha=alpha,
                     target_modules=targets or tuple(modules))
    return cfg, {"layers": layers}


def save_peft_adapter(
    path: str, lora_cfg: LoRAConfig, lora_params: Dict[str, Any]
) -> None:
    """Write our adapter in PEFT layout (loadable by the reference flow)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(lora_params["layers"]):
        for module, ab in layer.items():
            group = _module_group(module)
            base = f"base_model.model.model.layers.{i}.{group}.{module}"
            tensors[f"{base}.lora_A.weight"] = np.ascontiguousarray(
                np.asarray(ab["a"], np.float32).T
            )
            tensors[f"{base}.lora_B.weight"] = np.ascontiguousarray(
                np.asarray(ab["b"], np.float32).T
            )
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({
            "peft_type": "LORA",
            "r": lora_cfg.rank,
            "lora_alpha": lora_cfg.alpha,
            "target_modules": list(lora_cfg.target_modules),
            "task_type": "CAUSAL_LM",
        }, f, indent=2)
