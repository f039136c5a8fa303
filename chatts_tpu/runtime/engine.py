"""Single-program batch inference engine: jit'd prefill + decode loop.

TPU-native replacement for the reference's HF ``model.generate`` path
(reference: README.md:81-104) and the DeepSpeed batch driver
(reference: chatts/utils/inference_tsmllm_deepspeed.py:64-115).  Everything
under jit has static shapes; variable prompt/series shapes are bucketed by the
processor, so each (token-bucket, series-bucket, cache-capacity) triple
compiles once and is cached.

Exposes TTFT / TPOT counters, the observability gap SURVEY §5 flags.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, GenerationConfig
from chatts_tpu.models import chatts, qwen
from chatts_tpu.processor.processor import ProcessedBatch
from chatts_tpu.runtime import kv_cache, sampling


@dataclasses.dataclass
class GenerateResult:
    token_ids: List[List[int]]  # generated ids per row (EOS trimmed)
    prompt_lens: List[int]
    ttft_s: float  # time to first token (prefill + 1 sample)
    tpot_s: float  # mean time per output token after the first
    total_s: float

    @property
    def total_new_tokens(self) -> int:
        return sum(len(t) for t in self.token_ids)


def _prefill(
    params,
    cfg: ChatTSConfig,
    cache_len: int,
    cache_dtype,
    attn_impl: str,
    gen_cfg: GenerationConfig,
    input_ids,
    positions,
    seq_lens,
    ts_values,
    ts_mask,
    scatter_seq,
    scatter_tok,
    rng,
):
    b, t = input_ids.shape
    caches = kv_cache.allocate(cfg.llm, b, cache_len, cache_dtype)
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    kv_valid = kv_positions < seq_lens[:, None]
    hidden, caches = chatts.forward(
        params, cfg, input_ids, positions,
        ts_values=ts_values, ts_mask=ts_mask,
        scatter_seq=scatter_seq, scatter_tok=scatter_tok,
        kv_caches=caches, write_pos=None,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl,
    )
    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )  # (B, 1, H)
    logits = chatts.compute_logits(params, cfg, last)[:, 0]  # (B, V)
    next_token = sampling.sample(logits, rng, gen_cfg)
    return caches, next_token


def _decode_step(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    gen_cfg: GenerationConfig,
    caches,
    tokens,  # (B,) current input token
    cur_lens,  # (B,) tokens already in cache
    rng,
):
    b = tokens.shape[0]
    cache_len = caches[0][0].shape[1]
    positions = cur_lens[:, None].astype(jnp.int32)
    embeds = qwen.embed_tokens(params["llm"], tokens[:, None])
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    kv_valid = kv_positions <= cur_lens[:, None]
    hidden, caches = qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=caches, write_pos=positions,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl,
    )
    logits = chatts.compute_logits(params, cfg, hidden)[:, 0]  # (B, V)
    next_token = sampling.sample(logits, rng, gen_cfg)
    return caches, next_token


class InferenceEngine:
    """Owns jit-compiled prefill/decode and a Python generation loop."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ChatTSConfig,
        *,
        cache_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        donate_cache: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.cache_dtype = cache_dtype
        self.attn_impl = attn_impl
        self._prefill_jit = jax.jit(
            functools.partial(_prefill),
            static_argnames=("cfg", "cache_len", "cache_dtype", "attn_impl", "gen_cfg"),
        )
        decode_kwargs = dict(static_argnames=("cfg", "attn_impl", "gen_cfg"))
        if donate_cache:
            decode_kwargs["donate_argnames"] = ("caches",)
        self._decode_jit = jax.jit(functools.partial(_decode_step), **decode_kwargs)

    def generate(
        self,
        batch: ProcessedBatch,
        gen_cfg: Optional[GenerationConfig] = None,
        *,
        rng: Optional[jax.Array] = None,
        cache_len: Optional[int] = None,
    ) -> GenerateResult:
        gen_cfg = gen_cfg or GenerationConfig()
        if rng is None:
            rng = jax.random.PRNGKey(0)
        b, t = batch.input_ids.shape
        if cache_len is None:
            cache_len = t + gen_cfg.max_new_tokens
            # Round cache capacity to a bucket to limit recompiles.
            cache_len = -(-cache_len // 128) * 128

        start = time.perf_counter()
        rng, step_key = jax.random.split(rng)
        caches, next_token = self._prefill_jit(
            self.params, self.cfg, cache_len, self.cache_dtype,
            self.attn_impl, gen_cfg,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.positions),
            jnp.asarray(batch.seq_lens),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
            step_key,
        )
        first_tokens = np.asarray(next_token)
        ttft = time.perf_counter() - start

        eos = set(gen_cfg.eos_token_ids)
        outputs: List[List[int]] = [[int(first_tokens[i])] for i in range(b)]
        done = np.array([int(first_tokens[i]) in eos for i in range(b)])
        cur_lens = jnp.asarray(batch.seq_lens)
        tokens = next_token

        decode_start = time.perf_counter()
        steps = 0
        for _ in range(gen_cfg.max_new_tokens - 1):
            if done.all():
                break
            if int(cur_lens.max()) + 1 >= cache_len:
                break
            rng, step_key = jax.random.split(rng)
            caches, tokens = self._decode_jit(
                self.params, self.cfg, self.attn_impl, gen_cfg,
                caches, tokens, cur_lens, step_key,
            )
            cur_lens = cur_lens + 1
            steps += 1
            host_tokens = np.asarray(tokens)
            for i in range(b):
                if not done[i]:
                    tid = int(host_tokens[i])
                    outputs[i].append(tid)
                    if tid in eos:
                        done[i] = True
        total = time.perf_counter() - start
        decode_time = time.perf_counter() - decode_start
        tpot = decode_time / max(steps, 1)

        # Trim trailing EOS token from each row.
        trimmed = [
            row[:-1] if (row and row[-1] in eos) else row for row in outputs
        ]
        return GenerateResult(
            token_ids=trimmed,
            prompt_lens=[int(x) for x in batch.seq_lens],
            ttft_s=ttft,
            tpot_s=tpot,
            total_s=total,
        )
