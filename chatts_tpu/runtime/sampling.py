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


# Candidate cap for per-slot sampling: nucleus filtering runs inside the
# top-K candidates instead of a full-vocab sort.  A (B, 32k) jnp.sort per
# decode step cost ~3 ms on v5e (over 40% of slot TPOT); top_k(64) is ~free.
# Probability mass beyond the top 64 tokens is negligible at serving
# temperatures, so the truncation is inaudible (vLLM-style top-k cap).
TOP_K_CAP = 64


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

    # Per-row nucleus filtering inside the top-K candidate set.
    k = min(TOP_K_CAP, scaled.shape[-1])
    vals, idx = jax.lax.top_k(scaled, k)  # (B, K) descending
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < jnp.clip(top_p, 0.0, 1.0)[:, None]
    filtered = jnp.where(keep, vals, _NEG_INF)
    filtered = jnp.where(top_p[:, None] >= 1.0, vals, filtered)

    choice = jax.random.categorical(key, filtered, axis=-1)  # (B,) in [0, K)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    return jnp.where(temperature > 0, sampled.astype(jnp.int32), greedy_tok)
