"""Token sampling: greedy / temperature / top-k / top-p.

Jit-compatible: the GenerationConfig is a static (hashable) argument so the
branch structure is resolved at trace time.  Matches the reference's sampling
envelope (temperature 0.2, max_tokens 512 for eval —
reference: chatts/utils/inference_tsmllm_vllm.py:43-46).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from chatts_tpu.core.config import GenerationConfig

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask everything below the k-th largest logit. logits: (..., V)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of sorted probs with
    cumulative mass >= p (always keeps the top token)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Position i is kept if the cumulative mass *before* it is < p.
    keep_sorted = (cum - probs) < p
    # Threshold logit = smallest kept logit.
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(masked, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, _NEG_INF, logits)


def sample(
    logits: jnp.ndarray,  # (B, V) float32
    key: jax.Array,
    gen_cfg: GenerationConfig,
) -> jnp.ndarray:
    """Sample next token ids (B,) int32."""
    if gen_cfg.greedy or gen_cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gen_cfg.temperature
    if gen_cfg.top_k > 0:
        logits = apply_top_k(logits, gen_cfg.top_k)
    if gen_cfg.top_p < 1.0:
        logits = apply_top_p(logits, gen_cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_per_slot(
    logits: jnp.ndarray,  # (B, V) float32
    key: jax.Array,
    temperature: jnp.ndarray,  # (B,) float32; <= 0 means greedy
    top_p: jnp.ndarray,  # (B,) float32; >= 1 disables
) -> jnp.ndarray:
    """Per-row sampling for the continuous-batching server, where every slot
    carries its own request's sampling params (vLLM-parity behavior)."""
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    safe_temp = jnp.where(temperature > 0, temperature, 1.0)
    scaled = logits / safe_temp[:, None]

    # Per-row nucleus filtering (vectorized over the batch).
    sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < jnp.clip(top_p, 0.0, 1.0)[:, None]
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(masked, axis=-1, keepdims=True)
    filtered = jnp.where(scaled < threshold, _NEG_INF, scaled)
    filtered = jnp.where(top_p[:, None] >= 1.0, scaled, filtered)

    sampled = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy_tok)
