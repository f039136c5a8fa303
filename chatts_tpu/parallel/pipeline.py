"""Pipeline parallelism: GPipe-style microbatched decoder over a ``pp`` mesh
axis.

The reference only *declares* PP support (``SupportsPP`` — forward threads
``intermediate_tensors``; the actual scheduling lives in vLLM, reference:
chatts/vllm/chatts_vllm.py:452,490-491, SURVEY §2.5).  This module is a
working TPU-native implementation: decoder layers are stacked and sharded
over the ``pp`` axis (each device holds L/S contiguous layers), microbatch
activations rotate stage-to-stage with ``ppermute`` over ICI inside one
``shard_map``, and the whole schedule is a ``lax.scan`` over
M + S - 1 ticks — reverse-mode differentiable, so the same machinery
serves the PP train step.

For 8-14B models on a v5e-8, TP is the right default (BENCHMARKS.md); PP
exists for parity-plus (models whose layers outgrow a TP shard, or
DCN-spanning stages where per-layer all-reduces would cross slow links).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chatts_tpu.core.config import QwenConfig
from chatts_tpu.models import qwen

PIPE_AXIS = "pp"


def create_pp_mesh(pp: int, *, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < pp:
        raise ValueError(f"need {pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:pp]), (PIPE_AXIS,))


def stack_layers(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """layers: list of per-layer pytrees -> one pytree with leading (L, …)
    axis (all decoder layers are structurally identical)."""
    layers = llm_params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = dict(llm_params)
    out["layers"] = stacked
    return out


def place_stacked(mesh: Mesh, stacked_llm: Dict[str, Any]) -> Dict[str, Any]:
    """Shard the stacked layer axis over pp; everything else replicated."""
    def shard(path_is_layer, leaf):
        spec = P(PIPE_AXIS) if path_is_layer else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = {
        k: jax.tree.map(functools.partial(shard, k == "layers"), v)
        for k, v in stacked_llm.items()
    }
    return out


def pipeline_forward(
    stacked_llm: Dict[str, Any],
    cfg: QwenConfig,
    embeds: jnp.ndarray,  # (M, mb, T, hidden) microbatched inputs
    positions: jnp.ndarray,  # (M, mb, T)
    kv_valid: jnp.ndarray,  # (M, mb, T) bool
    *,
    mesh: Mesh,
) -> jnp.ndarray:
    """Run the decoder stack pipeline-parallel.  Returns hidden
    (M, mb, T, hidden) after the final norm, replicated.

    Schedule: M + S - 1 ticks; at tick t, stage s processes microbatch
    t - s (when in range) through its local layers, then every stage
    ppermutes its activation to the next stage.  The scan is reverse-mode
    differentiable (GPipe backward falls out of jax.grad).
    """
    m, mb, t_len, hidden = embeds.shape
    s_count = mesh.shape[PIPE_AXIS]
    stacked_layers = stacked_llm["layers"]
    n_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    if n_layers % s_count:
        raise ValueError(f"{n_layers} layers not divisible by pp={s_count}")

    def stage_fn(layers_local, embeds_all, pos_all, valid_all):
        s_idx = jax.lax.axis_index(PIPE_AXIS)

        def run_local(x, pos, valid):
            def layer_step(h, layer_slice):
                h, _ = qwen.decoder_layer(
                    layer_slice, h, pos, cfg, None, None, valid, pos, "xla",
                )
                return h, None

            x, _ = jax.lax.scan(layer_step, x, layers_local)
            return x

        def tick(carry, t):
            buf, outputs = carry
            mb_in = jnp.clip(t, 0, m - 1)
            mb_own = jnp.clip(t - s_idx, 0, m - 1)
            x0 = jax.lax.dynamic_index_in_dim(embeds_all, mb_in, 0,
                                              keepdims=False)
            x_in = jnp.where(s_idx == 0, x0, buf)
            pos = jax.lax.dynamic_index_in_dim(pos_all, mb_own, 0,
                                               keepdims=False)
            valid = jax.lax.dynamic_index_in_dim(valid_all, mb_own, 0,
                                                 keepdims=False)
            y = run_local(x_in, pos, valid)
            is_last = s_idx == s_count - 1
            in_range = (t - s_idx >= 0) & (t - s_idx < m)
            cur = jax.lax.dynamic_index_in_dim(outputs, mb_own, 0,
                                               keepdims=False)
            new = jnp.where(is_last & in_range, y, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, new,
                                                          mb_own, 0)
            nxt = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(i, (i + 1) % s_count) for i in range(s_count)],
            )
            return (nxt, outputs), None

        buf0 = jnp.zeros((mb, t_len, hidden), embeds_all.dtype)
        out0 = jnp.zeros((m, mb, t_len, hidden), embeds_all.dtype)
        (buf, outputs), _ = jax.lax.scan(
            tick, (buf0, out0), jnp.arange(m + s_count - 1)
        )
        # Only the last stage holds real outputs; psum replicates them.
        outputs = jnp.where(s_idx == s_count - 1, outputs, 0.0)
        return jax.lax.psum(outputs, PIPE_AXIS)

    hidden_out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(PIPE_AXIS), stacked_layers),
            P(), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )(stacked_layers, embeds, positions, kv_valid)
    # Final norm (replicated) applied outside the pipeline.
    return qwen.rms_norm(hidden_out, stacked_llm["norm"], cfg.rms_norm_eps)


@dataclasses.dataclass(frozen=True)
class PipelineTrainConfig:
    learning_rate: float = 1e-5
    microbatches: int = 2


def make_pp_train_step(cfg: QwenConfig, mesh: Mesh,
                       tc: PipelineTrainConfig):
    """GPipe train step: pp-sharded layer grads via jax.grad straight
    through the pipeline scan (ppermute transposes to the reverse rotation).
    Returns (step_fn, optimizer); params are the STACKED llm pytree."""
    import optax

    optimizer = optax.adamw(tc.learning_rate)

    def loss_fn(stacked_llm, batch):
        m = tc.microbatches
        ids = batch["input_ids"]
        b, t_len = ids.shape
        if b % m:
            raise ValueError(f"batch {b} not divisible by microbatches {m}")
        mb = b // m
        embeds = qwen.embed_tokens(stacked_llm, ids).reshape(m, mb, t_len, -1)
        positions = batch["positions"].reshape(m, mb, t_len)
        kv_valid = batch["attention_mask"].astype(bool).reshape(m, mb, t_len)
        hidden = pipeline_forward(
            stacked_llm, cfg, embeds, positions, kv_valid, mesh=mesh
        ).reshape(b, t_len, -1)
        logits = qwen.compute_logits(stacked_llm, cfg, hidden)
        from chatts_tpu.train.loss import cross_entropy

        loss, count = cross_entropy(logits, batch["targets"],
                                    batch["loss_mask"])
        return loss, {"loss": loss, "tokens": count}

    @jax.jit
    def step(stacked_llm, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(stacked_llm, batch)
        updates, opt_state = optimizer.update(grads, opt_state, stacked_llm)
        new_params = optax.apply_updates(stacked_llm, updates)
        return new_params, opt_state, metrics

    return step, optimizer
