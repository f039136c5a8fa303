"""LoRA SFT training driver (BASELINE config[4]).

End-to-end fine-tune loop: jsonl datasets (from chatts_tpu.datagen) ->
loss-masked batches -> jit'd LoRA train step over a (dp, tp) mesh ->
orbax-checkpointed train state -> merged-weight export via
weights.save_checkpoint.  First-party replacement for the reference's
external PEFT/DeepSpeed training path (reference: demo/demo_lora.ipynb,
SURVEY §5 checkpoint/resume gap).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chatts_tpu.core.config import ChatTSConfig
from chatts_tpu.models import chatts
from chatts_tpu.train import data as data_lib
from chatts_tpu.train.lora import LoRAConfig, apply_lora, init_lora, merge_lora
from chatts_tpu.train.loss import cross_entropy
from chatts_tpu.train.train_step import TrainConfig, make_optimizer


def lora_loss_fn(lora_params, base_params, cfg: ChatTSConfig,
                 lora_cfg: LoRAConfig, batch, remat: bool):
    params = apply_lora(base_params, lora_params, lora_cfg, train=True)
    fwd = chatts.forward
    if remat:
        fwd = jax.checkpoint(
            functools.partial(chatts.forward, attn_impl="xla"),
            static_argnums=(1,),
        )
    hidden, _ = fwd(
        params, cfg, batch["input_ids"], batch["positions"],
        ts_values=batch.get("ts_values"), ts_mask=batch.get("ts_mask"),
        scatter_seq=batch.get("scatter_seq"),
        scatter_tok=batch.get("scatter_tok"),
        kv_valid=batch["attention_mask"].astype(bool),
        kv_positions=batch["positions"],
    )
    logits = chatts.compute_logits(params, cfg, hidden)
    loss, count = cross_entropy(logits, batch["targets"], batch["loss_mask"])
    return loss, {"loss": loss, "tokens": count}


def make_lora_train_step(cfg: ChatTSConfig, lora_cfg: LoRAConfig,
                         tc: Optional[TrainConfig] = None):
    tc = tc or TrainConfig(learning_rate=1e-4)
    optimizer = make_optimizer(tc)

    @jax.jit
    def step(lora_params, opt_state, base_params, batch):
        grad_fn = jax.value_and_grad(lora_loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(
            lora_params, base_params, cfg, lora_cfg, batch, tc.remat
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, metrics

    return step, optimizer


@dataclasses.dataclass
class SFTResult:
    losses: List[float]
    steps: int
    lora_params: Dict[str, Any]


def train_lora_sft(
    params: Dict[str, Any],
    cfg: ChatTSConfig,
    processor,
    dataset_rows: List[dict],
    *,
    lora_cfg: Optional[LoRAConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    batch_size: int = 4,
    num_epochs: int = 1,
    max_steps: Optional[int] = None,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    log_every: int = 10,
) -> SFTResult:
    """Run LoRA SFT; optionally orbax-checkpoints (adapter + opt state) for
    resume."""
    lora_cfg = lora_cfg or LoRAConfig()
    train_cfg = train_cfg or TrainConfig(learning_rate=1e-4)
    step_fn, optimizer = make_lora_train_step(cfg, lora_cfg, train_cfg)

    lora_params = init_lora(params, lora_cfg, jax.random.PRNGKey(seed))
    opt_state = optimizer.init(lora_params)
    start_step = 0

    mngr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2),
        )
        latest = mngr.latest_step()
        if latest is not None:
            restored = mngr.restore(
                latest,
                args=ocp.args.StandardRestore(
                    {"lora": lora_params, "opt": opt_state}
                ),
            )
            lora_params = restored["lora"]
            opt_state = restored["opt"]
            start_step = latest
            print(f"[sft] resumed from step {latest}")

    losses: List[float] = []
    step_idx = start_step
    t0 = time.perf_counter()
    done = False
    for epoch in range(num_epochs):
        if done:
            break
        for batch_np in data_lib.batch_iterator(
            processor, dataset_rows, batch_size, seed=seed + epoch
        ):
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            lora_params, opt_state, metrics = step_fn(
                lora_params, opt_state, params, batch
            )
            loss = float(metrics["loss"])
            losses.append(loss)
            step_idx += 1
            if step_idx % log_every == 0:
                rate = (step_idx - start_step) / (time.perf_counter() - t0)
                print(f"[sft] step {step_idx} loss {loss:.4f} ({rate:.2f} it/s)")
            if mngr and step_idx % checkpoint_every == 0:
                import orbax.checkpoint as ocp

                mngr.save(
                    step_idx,
                    args=ocp.args.StandardSave(
                        {"lora": lora_params, "opt": opt_state}
                    ),
                )
            if max_steps is not None and step_idx - start_step >= max_steps:
                done = True
                break
    if mngr:
        mngr.wait_until_finished()
    return SFTResult(losses=losses, steps=step_idx, lora_params=lora_params)


def export_merged(
    params: Dict[str, Any],
    lora_params: Dict[str, Any],
    cfg: ChatTSConfig,
    lora_cfg: LoRAConfig,
    output_dir: str,
) -> None:
    """Merge adapters and write an HF-layout checkpoint (the demo_lora
    load+merge+save flow)."""
    from chatts_tpu.models import weights

    merged = merge_lora(params, lora_params, lora_cfg)
    weights.save_checkpoint(output_dir, cfg, merged)
