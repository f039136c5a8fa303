"""Training losses: next-token cross-entropy with prompt masking.

The reference repo trains via external tooling (checkpoints arrive trained;
LoRA adapters are merged with PEFT — reference: demo/demo_lora.ipynb cells
2-4).  Here SFT is first-party: loss masks prompt tokens and padding, in the
standard causal-LM shift arrangement.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,  # (B, T, V) float32
    targets: jnp.ndarray,  # (B, T) int32
    loss_mask: jnp.ndarray,  # (B, T) float — 1 where the target counts
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean masked token cross-entropy. Returns (loss, token_count)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    target_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    nll = logz - target_logit
    mask = loss_mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / count, count
