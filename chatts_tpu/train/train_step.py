"""SFT training step, pjit-sharded over a (dp, tp) mesh.

TPU-native counterpart of a DeepSpeed/torch training loop: parameters and
optimizer state are TP-sharded (Megatron-style, chatts_tpu.parallel.sharding),
the batch is DP-sharded, gradients reduce over ICI/DCN via XLA collectives —
no NCCL analog needed (SURVEY §5 "Distributed communication backend").

``jax.checkpoint`` wraps each decoder layer's loss path implicitly via remat
of the forward closure when ``remat=True`` — trading FLOPs for HBM on long
sequences.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from chatts_tpu.core.config import ChatTSConfig
from chatts_tpu.models import chatts
from chatts_tpu.train.loss import cross_entropy


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0
    remat: bool = True


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(
            tc.learning_rate, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay
        ),
    )


def loss_fn(
    params: Dict[str, Any],
    cfg: ChatTSConfig,
    batch: Dict[str, jnp.ndarray],
    remat: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    fwd = chatts.forward
    if remat:
        fwd = jax.checkpoint(
            functools.partial(chatts.forward, attn_impl="xla"),
            static_argnums=(1,),
        )
    kv_valid = batch["attention_mask"].astype(bool)
    hidden, _ = fwd(
        params, cfg, batch["input_ids"], batch["positions"],
        ts_values=batch.get("ts_values"),
        ts_mask=batch.get("ts_mask"),
        scatter_seq=batch.get("scatter_seq"),
        scatter_tok=batch.get("scatter_tok"),
        kv_valid=kv_valid,
        kv_positions=batch["positions"],
    )
    logits = chatts.compute_logits(params, cfg, hidden)
    loss, count = cross_entropy(logits, batch["targets"], batch["loss_mask"])
    return loss, {"loss": loss, "tokens": count}


def train_step(
    params: Dict[str, Any],
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg: ChatTSConfig,
    tc: TrainConfig,
    optimizer: optax.GradientTransformation,
):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, metrics), grads = grad_fn(params, cfg, batch, tc.remat)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics


def make_train_step(cfg: ChatTSConfig, tc: Optional[TrainConfig] = None):
    """Returns (jit'd step, optimizer). Under a Mesh context with sharded
    params/batch, GSPMD propagates the TP/DP layout through grads and
    optimizer state automatically."""
    tc = tc or TrainConfig()
    optimizer = make_optimizer(tc)

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, batch):
        return train_step(params, opt_state, batch, cfg, tc, optimizer)

    return step, optimizer


def build_training_batch(processed, targets, loss_mask):
    """Assemble a train-step batch dict from a ProcessedBatch + labels."""
    return {
        "input_ids": processed.input_ids,
        "positions": processed.positions,
        "attention_mask": processed.attention_mask,
        "ts_values": processed.ts_values,
        "ts_mask": processed.ts_mask,
        "scatter_seq": processed.scatter_seq,
        "scatter_tok": processed.scatter_tok,
        "targets": targets,
        "loss_mask": loss_mask,
    }
