"""GSPMD sharding rules for ChatTS parameters, caches, and batches.

Megatron-style tensor parallelism expressed as PartitionSpecs, replacing the
reference's delegation to vLLM's tensor_parallel_size (reference:
README.md:127, chatts/utils/llm_utils.py:95,154; SURVEY §2.5).  The fused
qkv / gate_up groups the reference declares for joint sharding
(packed_modules_mapping, chatts_vllm.py:454-464) map here to: all of q/k/v
column-sharded + o row-sharded; gate/up column-sharded + down row-sharded —
one all-reduce per sublayer, riding ICI.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chatts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _col_specs() -> Dict[str, Any]:
    """Column-parallel dense: output dim over tp, for every weight layout
    (bf16 kernel; int8 kernel_q + per-channel scales; int4 kernel_q4 packed
    rows + group scales — both quant layouts keep the out dim last)."""
    return {
        "kernel": P(None, MODEL_AXIS), "bias": P(MODEL_AXIS),
        "kernel_q": P(None, MODEL_AXIS), "scales": P(MODEL_AXIS),
        "kernel_q4": P(None, MODEL_AXIS), "scales4": P(None, MODEL_AXIS),
        # GPTQ asym/desc_act extras: group zero-bias shards with the out
        # dim; the input permutation replicates.
        "zeros4": P(None, MODEL_AXIS), "perm4": P(),
    }


def _row_specs() -> Dict[str, Any]:
    """Row-parallel dense: input dim over tp; per-out-channel int8 scales
    replicate, int4 group scales shard with their input groups."""
    return {
        "kernel": P(MODEL_AXIS, None),
        "kernel_q": P(MODEL_AXIS, None), "scales": P(),
        "kernel_q4": P(MODEL_AXIS, None), "scales4": P(MODEL_AXIS, None),
        "zeros4": P(MODEL_AXIS, None), "perm4": P(),
    }


def _attn_specs() -> Dict[str, Any]:
    col = _col_specs()
    return {
        "q_proj": col,
        "k_proj": col,
        "v_proj": col,
        "o_proj": _row_specs(),
        "q_norm": P(),
        "k_norm": P(),
    }


def _mlp_specs() -> Dict[str, Any]:
    col = _col_specs()
    return {
        "gate_proj": col,
        "up_proj": col,
        "down_proj": _row_specs(),
    }


def layer_specs() -> Dict[str, Any]:
    return {
        "input_layernorm": P(),
        "post_attention_layernorm": P(),
        "self_attn": _attn_specs(),
        "mlp": _mlp_specs(),
    }


def llm_param_specs(num_layers: int) -> Dict[str, Any]:
    return {
        # Vocab-parallel embedding and lm_head: vocab dim over tp.
        "embed_tokens": P(MODEL_AXIS, None),
        "layers": [layer_specs() for _ in range(num_layers)],
        "norm": P(),
        "lm_head": P(None, MODEL_AXIS),
        "lm_head_q": _col_specs(),
    }


def ts_encoder_param_specs(num_layers: int) -> Dict[str, Any]:
    # The patch-encoder MLP is tiny relative to the LLM; shard only the
    # hidden (output) dim of each layer so its activations already live in
    # the tp layout the merge expects, falling back to replication for the
    # (small) first-layer input dim.
    return {
        "mlp": [
            {"kernel": P(None, MODEL_AXIS) if i == num_layers - 1 else P(),
             "bias": P(MODEL_AXIS) if i == num_layers - 1 else P()}
            for i in range(num_layers)
        ],
        "position_embedding": P(),
    }


def chatts_param_specs(cfg) -> Dict[str, Any]:
    """PartitionSpec pytree matching chatts.init_params structure."""
    return {
        "ts_encoder": ts_encoder_param_specs(cfg.ts.num_layers),
        "llm": llm_param_specs(cfg.llm.num_hidden_layers),
    }


def _prune_to_tree(specs: Any, tree: Any) -> Any:
    """Restrict a spec tree to the keys actually present in a param tree
    (e.g. drop q_norm for Qwen2, lm_head when tied)."""
    if isinstance(tree, dict):
        return {k: _prune_to_tree(specs[k], v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(
            _prune_to_tree(s, v) for s, v in zip(specs, tree)
        )
    return specs


def sanitize_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes that do not divide the corresponding dim.

    Megatron TP assumes tp | heads (and tp | kv_heads); when a model's kv-head
    count is smaller than the tp degree, the clean fallback is replication of
    that tensor rather than a GSPMD error."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for dim, axis in zip(shape, entries):
        if axis is None:
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        out.append(axis if dim % size == 0 else None)
    return P(*out)


def shardings_for_params(
    mesh: Mesh, cfg, params: Dict[str, Any]
) -> Dict[str, Any]:
    """NamedSharding pytree congruent with ``params``, with non-divisible
    dims falling back to replication."""
    specs = _prune_to_tree(chatts_param_specs(cfg), params)
    return jax.tree.map(
        lambda spec, leaf: NamedSharding(
            mesh, sanitize_spec(spec, leaf.shape, mesh)
        ),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )


def kv_cache_specs(num_layers: int) -> List[Tuple[P, P]]:
    # (B, KVH, S, D) head-major: batch over dp, kv heads over tp.
    spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    return [(spec, spec) for _ in range(num_layers)]


def batch_specs() -> Dict[str, P]:
    """Specs for ProcessedBatch device arrays: batch-sharded over dp; TS
    series and scatter tables replicated (they cross-reference sequences)."""
    return {
        "input_ids": P(DATA_AXIS),
        "positions": P(DATA_AXIS),
        "seq_lens": P(DATA_AXIS),
        "ts_values": P(),
        "ts_mask": P(),
        "scatter_seq": P(),
        "scatter_tok": P(),
    }


def place_params(mesh: Mesh, cfg, params: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put params with TP/DP shardings applied."""
    return jax.device_put(params, shardings_for_params(mesh, cfg, params))


def infer_mesh(params: Dict[str, Any]) -> Mesh | None:
    """The mesh the params were placed on, or None for single-device params.

    Engines use this to decide whether device steps must route mesh-aware
    ops (e.g. the ragged decode kernel's shard_map wrapper) — a bare
    pallas_call inside jit has no partitioning rule under GSPMD."""
    for leaf in jax.tree.leaves(params):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding) and len(sharding.mesh.devices.flat) > 1:
            return sharding.mesh
    return None
