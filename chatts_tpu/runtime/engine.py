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


def recent_mode_ok(attn_impl: str, cache_len: int) -> bool:
    """Recent-KV decode mode applies exactly where the DENSE attention path
    would run anyway: the ragged Pallas kernel reads the big cache directly
    (no way to combine a chunk-local buffer without its logsumexp), so when
    the dispatch would pick it — forced, or auto at capacity >= 2048 on a
    backend that can run it — the per-step scatter path stays."""
    from chatts_tpu.ops import ragged_decode_attention as rda

    if attn_impl == "ragged":
        return False
    ragged_capable = jax.default_backend() == "tpu" or rda.interpret_enabled()
    return not (attn_impl == "auto" and cache_len >= 2048 and ragged_capable)


def _prefill(
    params,
    cfg: ChatTSConfig,
    cache_len: int,
    cache_dtype,
    attn_impl: str,
    act_int8: bool,
    gen_cfg: GenerationConfig,
    input_ids,
    positions,
    seq_lens,
    ts_values,
    ts_mask,
    scatter_seq,
    scatter_tok,
    rng,
    mesh=None,
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
        attn_impl=attn_impl, mesh=mesh, act_int8=act_int8,
    )
    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )  # (B, 1, H)
    logits = chatts.compute_logits(params, cfg, last, mesh=mesh)[:, 0]  # (B, V)
    next_token = sampling.sample(logits, rng, gen_cfg)
    return caches, next_token


def _embed_prompt(params, cfg, input_ids, ts_values, ts_mask, scatter_seq, scatter_tok):
    return chatts.input_embeddings(
        params, cfg, input_ids, ts_values, ts_mask, scatter_seq, scatter_tok
    )


def _prefill_chunk(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    kv_limit: int,
    caches,
    embeds,  # (B, C, H) chunk of merged input embeddings
    positions,  # (B, C)
    write_slots,  # (B, C) absolute cache slots for this chunk
    seq_lens,  # (B,)
    mesh=None,
):
    """One transformer pass over a prompt chunk, writing KV at write_slots.

    Chunked prefill bounds compile shapes and activation memory for long
    prompts: each (chunk, kv_limit) pair compiles once and is reused across
    prompts of any length.  Correctness falls out of positions-based masking
    (ops/attention.py): unwritten cache slots carry kv_positions greater than
    every query position in the chunk, so they are causally masked, and slots
    beyond a row's seq_len stay kv_valid=False forever.
    """
    b = embeds.shape[0]
    cache_len = caches[0][0].shape[2]
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    kv_valid = kv_positions < seq_lens[:, None]
    hidden, caches = qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=caches, write_pos=write_slots,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl, kv_limit=kv_limit, mesh=mesh,
    )
    return hidden, caches


def _sample_last(params, cfg, gen_cfg, hidden, seq_lens, rng, mesh=None):
    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )
    logits = chatts.compute_logits(params, cfg, last, mesh=mesh)[:, 0]
    return sampling.sample(logits, rng, gen_cfg)


def _decode_step(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    gen_cfg: GenerationConfig,
    caches,
    tokens,  # (B,) current input token
    cur_lens,  # (B,) tokens already in cache
    rng,
    mesh=None,
):
    b = tokens.shape[0]
    cache_len = caches[0][0].shape[2]
    positions = cur_lens[:, None].astype(jnp.int32)
    embeds = qwen.embed_tokens(params["llm"], tokens[:, None])
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    kv_valid = kv_positions <= cur_lens[:, None]
    hidden, caches = qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=caches, write_pos=positions,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl,
        kv_lengths=(cur_lens + 1).astype(jnp.int32),
        mesh=mesh,
    )
    logits = chatts.compute_logits(params, cfg, hidden, mesh=mesh)[:, 0]  # (B, V)
    next_token = sampling.sample(logits, rng, gen_cfg)
    return caches, next_token


def _decode_chunk(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    gen_cfg: GenerationConfig,
    chunk_size: int,
    pad_id: int,
    caches,
    tokens,  # (B,) last sampled token
    cur_lens,  # (B,)
    done,  # (B,) bool
    rng,
    mesh=None,
    use_recent: bool = False,
):
    """Run ``chunk_size`` decode steps fully on device via lax.scan.

    One host sync per chunk instead of per token — the decode hot loop stays
    on-chip (SURVEY hot loop #1).  EOS detection and freezing of finished
    rows happen on device.

    use_recent (dense-attention path only; the caller gates): each step's
    K/V goes to a chunk-local (B, KVH, chunk, D) buffer at a uniform step
    index instead of a per-(row, head, position) element scatter into the
    big cache (~0.16 us each on v5e — ~1.1 ms of a b32 8B step over 28
    layers), with two-piece attention over cache + recent and ONE
    span-window merge per chunk.  Safe whenever capacity >= prompt +
    max_new_tokens (the caller checks): a merge window that would cross
    capacity can then only belong to a row with no further chunks to read
    it.  Rows frozen (done) mid-chunk leave junk in their tail window
    positions >= their final cur_len, which no later read validates."""
    eos_ids = jnp.asarray(list(gen_cfg.eos_token_ids) or [-1], jnp.int32)

    if use_recent:
        b = tokens.shape[0]
        cache_len = caches[0][0].shape[2]
        kv_positions = jnp.tile(
            jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
        recents0 = qwen.init_recents(caches, cfg.llm, b, chunk_size)
        base_lens = cur_lens
        # Big-cache validity is static across the chunk: it holds the
        # prompt (positions < chunk-start length); this chunk's tokens
        # live in the recent buffers until the merge.
        base_valid = kv_positions < base_lens[:, None]

        def body_recent(carry, i):
            recents, tokens, cur_lens, done, rng = carry
            rng, key = jax.random.split(rng)
            positions = cur_lens[:, None].astype(jnp.int32)
            embeds = qwen.embed_tokens(params["llm"], tokens[:, None])
            rec_valid = jnp.arange(chunk_size, dtype=jnp.int32) <= i
            hidden, recents = qwen.forward(
                params["llm"], cfg.llm, embeds, positions,
                kv_caches=caches, write_pos=positions,
                kv_valid=base_valid, kv_positions=kv_positions,
                attn_impl=attn_impl, mesh=mesh,
                recents=recents, rec_idx=i, rec_valid=rec_valid,
            )
            logits = chatts.compute_logits(params, cfg, hidden,
                                           mesh=mesh)[:, 0]
            next_tok = sampling.sample(logits, key, gen_cfg)
            next_tok = jnp.where(done, pad_id, next_tok)
            new_done = done | jnp.any(
                next_tok[:, None] == eos_ids[None, :], axis=1)
            cur_lens = cur_lens + jnp.where(done, 0, 1).astype(cur_lens.dtype)
            return (recents, next_tok, cur_lens, new_done, rng), next_tok

        (recents, tokens, cur_lens, done, rng), toks = jax.lax.scan(
            body_recent, (recents0, tokens, cur_lens, done, rng),
            jnp.arange(chunk_size, dtype=jnp.int32),
        )
        caches = qwen.merge_recent_kv(
            caches, recents, jnp.arange(b, dtype=jnp.int32),
            base_lens.astype(jnp.int32))
        return caches, tokens, cur_lens, done, rng, toks.T  # (B, chunk)

    def body(carry, _):
        caches, tokens, cur_lens, done, rng = carry
        rng, key = jax.random.split(rng)
        caches, next_tok = _decode_step(
            params, cfg, attn_impl, gen_cfg, caches, tokens, cur_lens, key,
            mesh=mesh,
        )
        next_tok = jnp.where(done, pad_id, next_tok)
        new_done = done | jnp.any(next_tok[:, None] == eos_ids[None, :], axis=1)
        cur_lens = cur_lens + jnp.where(done, 0, 1).astype(cur_lens.dtype)
        return (caches, next_tok, cur_lens, new_done, rng), next_tok

    (caches, tokens, cur_lens, done, rng), toks = jax.lax.scan(
        body, (caches, tokens, cur_lens, done, rng), None, length=chunk_size
    )
    return caches, tokens, cur_lens, done, rng, toks.T  # (B, chunk)


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
        decode_chunk: int = 64,
        pad_id: int = 0,
        fuse: bool = True,
        prefill_chunk: Optional[int] = None,
        prefill_act_int8: bool = False,
        decode_recent_kv: bool = True,
    ):
        if fuse:
            params = chatts.maybe_fuse(params)
        self.params = params
        self.cfg = cfg
        self.cache_dtype = cache_dtype
        self.attn_impl = attn_impl
        self.decode_chunk = decode_chunk
        self.pad_id = pad_id
        # Prompts longer than prefill_chunk are prefilled in fixed-size
        # chunks (one compile per (chunk, kv_limit) pair, reused across
        # prompt lengths) instead of one monolithic block.
        self.prefill_chunk = prefill_chunk
        # int8 activations for the prompt-side matmuls (v5e MXU int8 path,
        # 2x bf16 TOPS); decode stays bf16.
        self.prefill_act_int8 = prefill_act_int8
        # Recent-KV decode scan on the dense path (chunk-local K/V buffer,
        # one span-window merge per chunk) — ~1.4x the b32 step on v5e.
        # False keeps the per-step scatter path (the token-exact oracle in
        # tests and the ragged-kernel form).
        self.decode_recent_kv = decode_recent_kv
        self._prefill_jit = jax.jit(
            functools.partial(_prefill),
            static_argnames=("cfg", "cache_len", "cache_dtype", "attn_impl",
                             "act_int8", "gen_cfg", "mesh"),
        )
        # Mesh-aware decode: TP/DP-sharded params route the ragged kernel
        # through shard_map (the mesh is a hashable static arg).
        from chatts_tpu.parallel.sharding import infer_mesh

        self.mesh = infer_mesh(params)
        decode_kwargs = dict(
            static_argnames=("cfg", "attn_impl", "gen_cfg", "chunk_size",
                             "pad_id", "mesh", "use_recent")
        )
        if donate_cache:
            decode_kwargs["donate_argnames"] = ("caches",)
        self._decode_chunk_jit = jax.jit(
            functools.partial(_decode_chunk), **decode_kwargs
        )
        self._embed_jit = jax.jit(_embed_prompt, static_argnames=("cfg",))
        self._prefill_chunk_jit = jax.jit(
            _prefill_chunk,
            static_argnames=("cfg", "attn_impl", "kv_limit", "mesh"),
            donate_argnames=("caches",) if donate_cache else (),
        )
        self._sample_last_jit = jax.jit(
            _sample_last, static_argnames=("cfg", "gen_cfg", "mesh")
        )

    def _chunked_prefill(self, batch: ProcessedBatch, gen_cfg, cache_len, rng):
        """Prefill a long prompt in fixed-size chunks.

        Embeddings (token + TS merge) are computed once over the full prompt;
        the transformer then runs chunk by chunk, writing KV at absolute slot
        indices and attending over a statically-sliced cache prefix
        (kv_limit), so compile shapes stay bounded regardless of prompt
        length."""
        b, t = batch.input_ids.shape
        c = self.prefill_chunk
        t_pad = -(-t // c) * c
        embeds = self._embed_jit(
            self.params, self.cfg,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
        )
        positions = jnp.asarray(batch.positions)
        if t_pad > t:
            embeds = jnp.pad(embeds, ((0, 0), (0, t_pad - t), (0, 0)))
            positions = jnp.pad(positions, ((0, 0), (0, t_pad - t)),
                                mode="edge")
        seq_lens = jnp.asarray(batch.seq_lens)
        caches = kv_cache.allocate(self.cfg.llm, b, cache_len, self.cache_dtype)

        # kv_limit steps in coarse increments so compiles are shared across
        # several consecutive chunks (and across prompts of differing length).
        kv_step = max(2 * c, 2048)
        hiddens = []
        for o in range(0, t_pad, c):
            kv_limit = min(cache_len, -(-(o + c) // kv_step) * kv_step)
            write_slots = jnp.tile(
                jnp.arange(o, o + c, dtype=jnp.int32)[None], (b, 1)
            )
            hidden, caches = self._prefill_chunk_jit(
                self.params, self.cfg, self.attn_impl, kv_limit,
                caches, embeds[:, o:o + c], positions[:, o:o + c],
                write_slots, seq_lens, mesh=self.mesh,
            )
            hiddens.append(hidden)
        full_hidden = jnp.concatenate(hiddens, axis=1)
        next_token = self._sample_last_jit(
            self.params, self.cfg, gen_cfg, full_hidden, seq_lens, rng,
            mesh=self.mesh,
        )
        return caches, next_token

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
        chunked = self.prefill_chunk is not None and t > self.prefill_chunk
        if cache_len is None:
            cache_len = t + gen_cfg.max_new_tokens
            if chunked:
                # Chunk writes cover the whole padded prompt, and capacity
                # buckets coarsely (kv_step multiples) so the per-chunk
                # compiles — keyed on the cache shape — are shared across
                # prompts of different lengths.
                kv_step = max(2 * self.prefill_chunk, 2048)
                cache_len = max(cache_len, -(-t // self.prefill_chunk)
                                * self.prefill_chunk)
                cache_len = -(-cache_len // kv_step) * kv_step
            # Round cache capacity to a bucket to limit recompiles; 256 is
            # also the ragged decode kernel's block size (capacity must be a
            # multiple or the kernel disables itself).
            cache_len = -(-cache_len // 256) * 256

        start = time.perf_counter()
        rng, step_key = jax.random.split(rng)
        if chunked:
            caches, next_token = self._chunked_prefill(
                batch, gen_cfg, cache_len, step_key
            )
        else:
            caches, next_token = self._prefill_jit(
                self.params, self.cfg, cache_len, self.cache_dtype,
                self.attn_impl, self.prefill_act_int8, gen_cfg,
                jnp.asarray(batch.input_ids),
                jnp.asarray(batch.positions),
                jnp.asarray(batch.seq_lens),
                jnp.asarray(batch.ts_values),
                jnp.asarray(batch.ts_mask),
                jnp.asarray(batch.scatter_seq),
                jnp.asarray(batch.scatter_tok),
                step_key,
                mesh=self.mesh,
            )
        first_tokens = np.asarray(next_token)
        ttft = time.perf_counter() - start

        eos = set(gen_cfg.eos_token_ids)
        done_host = np.array([int(first_tokens[i]) in eos for i in range(b)])
        cur_lens = jnp.asarray(batch.seq_lens)
        done = jnp.asarray(done_host)
        tokens = next_token

        # Chunked on-device decode: one host sync per chunk, not per token.
        chunk = max(1, min(self.decode_chunk, gen_cfg.max_new_tokens - 1))
        # Recent-KV mode needs every merge window a later chunk reads to fit
        # capacity, guaranteed when capacity covers the whole generation
        # (always true for the default cache_len = t + max_new_tokens; a
        # caller-tightened cache_len falls back to per-step scatters).
        use_recent = (self.decode_recent_kv
                      and recent_mode_ok(self.attn_impl, cache_len)
                      and cache_len >= t + gen_cfg.max_new_tokens)
        decode_start = time.perf_counter()
        steps = 0
        remaining = gen_cfg.max_new_tokens - 1
        collected: List[np.ndarray] = []
        while remaining > 0 and not done_host.all():
            step = chunk if remaining >= chunk else remaining
            rng, loop_key = jax.random.split(rng)
            caches, tokens, cur_lens, done, rng_out, toks = self._decode_chunk_jit(
                self.params, self.cfg, self.attn_impl, gen_cfg,
                step, self.pad_id,
                caches, tokens, cur_lens, done, loop_key,
                mesh=self.mesh, use_recent=use_recent,
            )
            collected.append(np.asarray(toks))  # (B, step)
            done_host = np.asarray(done)
            remaining -= step
            steps += step
        total = time.perf_counter() - start
        decode_time = time.perf_counter() - decode_start
        tpot = decode_time / max(steps, 1)

        # Assemble per-row outputs: first token + chunk tokens up to first EOS.
        all_toks = (
            np.concatenate(collected, axis=1) if collected else np.zeros((b, 0), np.int32)
        )
        outputs: List[List[int]] = []
        for i in range(b):
            first = int(first_tokens[i])
            if first in eos:
                outputs.append([])
                continue
            row = [first]
            for t in all_toks[i]:
                if int(t) in eos:
                    break
                row.append(int(t))
            else:
                outputs.append(row)
                continue
            outputs.append(row)
        return GenerateResult(
            token_ids=outputs,
            prompt_lens=[int(x) for x in batch.seq_lens],
            ttft_s=ttft,
            tpot_s=tpot,
            total_s=total,
        )
