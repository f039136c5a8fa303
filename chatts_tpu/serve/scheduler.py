"""Continuous-batching serving engine.

TPU-native replacement for vLLM's scheduler + runtime
(reference dependency: vLLM 0.8.5 + the fork xiez22/vllm@timeseries,
SURVEY §2.4): a slot-based host scheduler over one persistent donated KV
cache.  Requests prefill into free slots (TS patch embeddings computed at
admission and scattered before the decoder runs, exactly like the reference's
prefill-time multimodal merge — chatts_vllm.py:538-574), then every decode
step advances ALL active slots at once through one jit'd chunked step.

Prefix caching is off by design for multimodal requests, following the
reference's explicit choice (reference: chatts/utils/llm_utils.py:154).

Host loop (thread) -> jit'd device functions; all shapes static per
(prefill-bucket, cache-capacity) pair so compilation is one-time.
TTFT/TPOT are tracked per request (SURVEY §5 observability gap).

Round forms (r3):
- pure decode round: all live slots advance decode_chunk steps.
- BLOCK admission round: the decode scan PLUS the whole admission as one
  monolithic (A, T) prefill block in a single executable — prompt K/V
  span-scattered into the big caches, first tokens sampled in-round.
  Chosen whenever a*T <= block_token_budget (measured ~76% MXU vs ~30-50%
  for scan-sliced prompt consumption).
- scan-sliced mixed round: long prompts consume decode_chunk*npt tokens
  per round inside the decode scan (bounded compile shapes).
The loop is pipelined: the next admission's host prep (processor, embeds,
staging uploads) runs while the current round executes on device.
"""
from __future__ import annotations

import dataclasses
import queue
import sys
import threading
import time
import uuid
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig
from chatts_tpu.models import chatts, qwen
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.runtime import kv_cache, sampling


@dataclasses.dataclass
class SamplingParams:
    max_tokens: int = 512
    temperature: float = 0.2
    top_p: float = 1.0
    stop_token_ids: Sequence[int] = ()


@dataclasses.dataclass
class Request:
    prompt: str
    timeseries: List[np.ndarray]
    params: SamplingParams
    request_id: str = dataclasses.field(default_factory=lambda: uuid.uuid4().hex)
    # Filled by the engine:
    created_s: float = dataclasses.field(default_factory=time.perf_counter)
    first_token_s: Optional[float] = None
    finished_s: Optional[float] = None
    prompt_tokens: int = 0
    output_tokens: List[int] = dataclasses.field(default_factory=list)
    stream_queue: "queue.Queue[Optional[List[int]]]" = dataclasses.field(
        default_factory=queue.Queue
    )
    finish_reason: Optional[str] = None
    error: Optional[str] = None
    cancelled: bool = False
    # Length class for admission grouping (engine-filled, cached): the
    # pow2 >= 256 ceiling of the exact prompt token count, or -1 when the
    # prompt fails to encode (such a request admits alone so the existing
    # per-request error isolation catches it without poisoning a wave).
    token_class: Optional[int] = None

    def cancel(self) -> None:
        """Request cancellation (client disconnect); honored at the next
        scheduler round."""
        self.cancelled = True

    @property
    def ttft_s(self) -> Optional[float]:
        if self.first_token_s is None:
            return None
        return self.first_token_s - self.created_s


class _WaitQueue:
    """FIFO wait queue the admission path can also inspect in place.

    Implements the queue.Queue surface the engine and its callers use
    (put/get_nowait/empty/qsize) over a deque, plus snapshot/remove so
    length-classed admission can pick a same-class wave from the middle
    of the backlog without losing arrival order for everyone else."""

    def __init__(self):
        self._d: "list[Request]" = []
        self._lock = threading.Lock()

    def put(self, item) -> None:
        with self._lock:
            self._d.append(item)

    def get_nowait(self):
        with self._lock:
            if not self._d:
                raise queue.Empty
            return self._d.pop(0)

    def empty(self) -> bool:
        with self._lock:
            return not self._d

    def qsize(self) -> int:
        with self._lock:
            return len(self._d)

    def snapshot(self) -> list:
        with self._lock:
            return list(self._d)

    def remove(self, items) -> None:
        with self._lock:
            ids = {id(r) for r in items}
            self._d = [r for r in self._d if id(r) not in ids]

    def requeue(self, items) -> None:
        """Put overflow back at the FRONT (they were the oldest of their
        class; appending would let newer arrivals jump them)."""
        with self._lock:
            self._d = list(items) + self._d


def _prefill_batch(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    act_int8: bool,
    caches,  # persistent big caches, donated
    inv_ids,  # (B,) int32 — prefill row that owns big-cache slot b (0 if none)
    slot_mask,  # (B,) bool — slot b receives a freshly prefilled row
    input_ids,  # (Bp, T)
    positions,  # (Bp, T)
    seq_lens,  # (Bp,)
    ts_values,
    ts_mask,
    scatter_seq,
    scatter_tok,
    temperature,  # (Bp,) float32
    top_p,  # (Bp,) float32
    rng,
    mesh=None,
):
    """Prefill up to Bp requests in ONE forward pass and place each row's
    prompt K/V into its cache slot.  Batched admission is what keeps serving
    prefill at batch-engine efficiency instead of one jit call per request.

    Slot placement is formulated as a host-computed row GATHER
    (``small[inv_ids]``) + dense select instead of a device scatter: the
    scheduler knows the slot assignment, so inv_ids[b] names the prefill row
    whose K/V belongs in slot b, and slots not admitted this round keep
    their old content via jnp.where.  All-dense ops — XLA lowers general
    scatters on TPU to serialized row updates that dominated admission
    latency (measured on v5e)."""
    bp, t = input_ids.shape
    embeds = chatts.input_embeddings(
        params, cfg, input_ids, ts_values, ts_mask, scatter_seq, scatter_tok
    )
    kv_positions = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (bp, 1))
    kv_valid = kv_positions < seq_lens[:, None]
    # Self-contained prefill over the T block; collect per-layer K/V.
    # int8 KV mode (4-tuple caches): small caches carry per-token scales too,
    # quantized by the same _quantize_kv path the decode step uses.
    int8_kv = len(caches[0]) == 4
    small_caches = [
        (
            jnp.zeros((bp, c[0].shape[1], t, c[0].shape[3]), c[0].dtype),
            jnp.zeros((bp, c[1].shape[1], t, c[1].shape[3]), c[1].dtype),
        )
        + (
            (jnp.ones((bp, c[0].shape[1], t), jnp.float32),
             jnp.ones((bp, c[1].shape[1], t), jnp.float32))
            if int8_kv else ()
        )
        for c in caches
    ]
    hidden, small_caches = qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=small_caches, write_pos=None,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl, mesh=mesh, act_int8=act_int8,
    )
    # Place each row's prompt K/V into its slot (first t positions only):
    # gather prefill rows into slot order, select against the old content,
    # then one dense dynamic_update_slice per buffer.
    sel = slot_mask[:, None, None, None]
    sel3 = slot_mask[:, None, None]
    new_caches = []
    for big, small in zip(caches, small_caches):
        updated = []
        for b, s in zip(big, small):
            gathered = jnp.take(s, inv_ids, axis=0).astype(b.dtype)
            mask = sel if gathered.ndim == 4 else sel3
            old = jax.lax.slice_in_dim(b, 0, t, axis=2)
            new = jnp.where(mask, gathered, old)
            updated.append(
                jax.lax.dynamic_update_slice(b, new, (0,) * b.ndim)
            )
        new_caches.append(tuple(updated))

    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )
    logits = chatts.compute_logits(params, cfg, last, mesh=mesh)[:, 0]  # (Bp, V)
    tokens = sampling.sample_per_slot(logits, rng, temperature, top_p)
    return new_caches, tokens


def _sample_admission_first(params, cfg, last_hidden, temperature, top_p, rng,
                            mesh=None):
    """First token for each admission row from its captured (post-norm)
    hidden state at seq_len-1."""
    logits = chatts.compute_logits(params, cfg, last_hidden[:, None],
                                   mesh=mesh)[:, 0]
    return sampling.sample_per_slot(logits, rng, temperature, top_p)


def _slice_admission(embeds, offset, c: int):
    """(A, t_pad, H) -> this round's (A, c, H) token slice."""
    return jax.lax.dynamic_slice_in_dim(embeds, offset, c, axis=1)


def _mixed_step_all_slots(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    chunk_size: int,
    npt: int,
    kv_limit: int,
    caches,  # donated
    tokens,  # (B,)
    cur_lens,  # (B,)
    active,  # (B,) bool
    temperature,  # (B,)
    top_p,  # (B,)
    eos_ids,  # (E,)
    budget_left,  # (B,)
    adm_slots,  # (A,) int32 — cache rows for admission reads (pads -> 0)
    adm_write_rows,  # (A,) int32 — write rows (pads -> out-of-bounds, dropped)
    adm_embeds,  # (A, chunk*npt, H) this round's prompt slice
    adm_offset,  # scalar int32 — absolute position of adm_embeds[:, 0]
    adm_seq_lens,  # (A,)
    adm_last_hidden,  # (A, H) float32 carry — hidden at seq_len-1
    rng,
    mesh=None,
):
    """One serving round that advances ALL decode slots ``chunk_size`` steps
    AND consumes ``chunk_size * npt`` prompt tokens of the in-flight
    admission — ONE jit'd executable per scheduler iteration (VERDICT r1
    item 1; the vLLM mixed-batch behavior, reference:
    scripts/install_vllm_server.sh:20-22).

    Per scan step, B decode tokens and A*npt prompt tokens run through the
    decoder's matmuls as one packed stream (qwen.forward_mixed), so the
    prompt chunk amortizes the same weight reads the decode step already
    pays.  Prompt K/V lands DIRECTLY in the big caches at the admission
    slots — no transient caches, no placement pass.
    """
    b = tokens.shape[0]
    a, c_total, hdim = adm_embeds.shape
    cache_len = caches[0][0].shape[2]
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    xs_embeds = jnp.swapaxes(
        adm_embeds.reshape(a, chunk_size, npt, hdim), 0, 1
    )  # (chunk, A, npt, H)
    step_offsets = adm_offset + jnp.arange(chunk_size, dtype=jnp.int32) * npt
    # INACTIVE decode rows include the admission slots themselves (they are
    # not live until their first token): their placeholder writes at stale
    # cur_lens would corrupt freshly-written prompt K/V, so route them to
    # distinct out-of-bounds rows (dropped; distinct keeps scatter indices
    # unique — the admission pads use rows [b, b+a)).
    dec_rows = jnp.where(
        active, jnp.arange(b, dtype=jnp.int32),
        b + a + jnp.arange(b, dtype=jnp.int32),
    )
    write_rows_const = jnp.concatenate(
        [dec_rows, jnp.repeat(adm_write_rows.astype(jnp.int32), npt)]
    )

    def body(carry, xs):
        caches, tokens, cur_lens, live, budget, last_h, rng = carry
        emb_i, off_i = xs
        rng, key = jax.random.split(rng)
        dec_embeds = qwen.embed_tokens(params["llm"], tokens[:, None])  # (B,1,H)
        pro_pos = off_i + jnp.arange(npt, dtype=jnp.int32)
        positions_pack = jnp.concatenate(
            [cur_lens.astype(jnp.int32), jnp.tile(pro_pos, a)]
        )[None]
        x_pack = jnp.concatenate(
            [dec_embeds[:, 0], emb_i.reshape(a * npt, hdim).astype(dec_embeds.dtype)]
        )[None]
        dec_kv_valid = (kv_positions <= cur_lens[:, None]) & active[:, None]
        dec_kv_lengths = jnp.where(active, cur_lens + 1, 1).astype(jnp.int32)
        hidden, caches = qwen.forward_mixed(
            params["llm"], cfg.llm, x_pack, positions_pack,
            b=b, a=a, npt=npt, write_rows=write_rows_const,
            adm_slots=adm_slots, adm_seq_lens=adm_seq_lens,
            kv_caches=caches, dec_kv_valid=dec_kv_valid,
            kv_positions=kv_positions, dec_kv_lengths=dec_kv_lengths,
            kv_limit=kv_limit, attn_impl=attn_impl, mesh=mesh,
        )
        dec_hidden = hidden[:, :b]  # (1, B, H) -> logits per slot
        logits = chatts.compute_logits(
            params, cfg, jnp.swapaxes(dec_hidden, 0, 1), mesh=mesh
        )[:, 0]
        next_tok = sampling.sample_per_slot(logits, key, temperature, top_p)
        emit = jnp.where(live, next_tok, -1)
        hit_eos = jnp.any(next_tok[:, None] == eos_ids[None, :], axis=1)
        budget = budget - jnp.where(live, 1, 0)
        new_live = live & ~hit_eos & (budget > 0)
        tokens = jnp.where(live, next_tok, tokens)
        cur_lens = cur_lens + jnp.where(live, 1, 0).astype(cur_lens.dtype)
        pro_hidden = hidden[0, b:].reshape(a, npt, hdim)
        cap = (pro_pos[None, :] == (adm_seq_lens - 1)[:, None])  # (A, npt)
        last_h = last_h + jnp.sum(
            jnp.where(cap[..., None], pro_hidden.astype(jnp.float32), 0.0),
            axis=1,
        )
        return (caches, tokens, cur_lens, new_live, budget, last_h, rng), emit

    live0 = active & (budget_left > 0)
    (caches, tokens, cur_lens, live, budget_left, adm_last_hidden, rng), emitted = (
        jax.lax.scan(
            body,
            (caches, tokens, cur_lens, live0, budget_left, adm_last_hidden, rng),
            (xs_embeds, step_offsets),
        )
    )
    packed = jnp.concatenate(
        [emitted.T.astype(jnp.int32), live.astype(jnp.int32)[:, None]],
        axis=1)
    return (caches, tokens, cur_lens, budget_left, adm_last_hidden,
            rng, packed)


def _recent_mode_ok(attn_impl: str, cache_len: int) -> bool:
    """See runtime.engine.recent_mode_ok (shared with the batch engine)."""
    from chatts_tpu.runtime.engine import recent_mode_ok

    return recent_mode_ok(attn_impl, cache_len)


def _decode_scan(
    params, cfg: ChatTSConfig, attn_impl: str, chunk_size: int,
    caches, tokens, cur_lens, active, temperature, top_p, eos_ids,
    budget_left, rng, mesh=None,
):
    """The decode scan shared by the pure-decode round and the block-mode
    admission round: advance every active slot ``chunk_size`` steps.
    Returns (caches, tokens, cur_lens, budget, rng, emitted (chunk, B),
    live (B,)).

    On the dense-attention path the scan runs in RECENT-KV mode: each
    step's K/V goes to a chunk-local (B, KVH, chunk, D) buffer at a uniform
    step index (per-(row, head) element scatters into the big cache cost
    ~0.16 us each on v5e — ~1.1 ms of a b32 8B step over 28 layers), with
    two-piece attention over cache + recent, and ONE span-window merge into
    the big caches per chunk."""
    b = tokens.shape[0]
    cache_len = caches[0][0].shape[2]
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))
    use_recent = _recent_mode_ok(attn_impl, cache_len)

    if use_recent:
        recents0 = qwen.init_recents(caches, cfg.llm, b, chunk_size)
        base_lens = cur_lens
        # Cache validity is static across the chunk: the big caches hold
        # positions < chunk-start length; this chunk's tokens live in the
        # recent buffers until the merge.
        base_valid = (kv_positions < base_lens[:, None]) & active[:, None]

        def body_recent(carry, i):
            recents, tokens, cur_lens, live, budget, rng = carry
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
            logits = chatts.compute_logits(params, cfg, hidden, mesh=mesh)[:, 0]
            next_tok = sampling.sample_per_slot(logits, key, temperature, top_p)
            emit = jnp.where(live, next_tok, -1)
            hit_eos = jnp.any(next_tok[:, None] == eos_ids[None, :], axis=1)
            budget = budget - jnp.where(live, 1, 0)
            new_live = live & ~hit_eos & (budget > 0)
            tokens = jnp.where(live, next_tok, tokens)
            cur_lens = cur_lens + jnp.where(live, 1, 0).astype(cur_lens.dtype)
            return (recents, tokens, cur_lens, new_live, budget, rng), emit

        live0 = active & (budget_left > 0)
        (recents, tokens, cur_lens, live, budget_left, rng), emitted = (
            jax.lax.scan(
                body_recent,
                (recents0, tokens, cur_lens, live0, budget_left, rng),
                jnp.arange(chunk_size, dtype=jnp.int32),
            )
        )
        # Rows inactive at chunk start wrote junk into their recent buffers;
        # route their merge windows out of bounds so they drop whole.
        rows = jnp.where(active, jnp.arange(b, dtype=jnp.int32), b)
        caches = qwen.merge_recent_kv(caches, recents, rows,
                                      base_lens.astype(jnp.int32))
        return caches, tokens, cur_lens, budget_left, rng, emitted, live

    def body(carry, _):
        caches, tokens, cur_lens, live, budget, rng = carry
        rng, key = jax.random.split(rng)
        positions = cur_lens[:, None].astype(jnp.int32)
        embeds = qwen.embed_tokens(params["llm"], tokens[:, None])
        kv_valid = (kv_positions <= cur_lens[:, None]) & active[:, None]
        kv_lengths = jnp.where(active, cur_lens + 1, 1).astype(jnp.int32)
        hidden, new_caches = qwen.forward(
            params["llm"], cfg.llm, embeds, positions,
            kv_caches=caches, write_pos=positions,
            kv_valid=kv_valid, kv_positions=kv_positions,
            attn_impl=attn_impl,
            kv_lengths=kv_lengths,
            mesh=mesh,
        )
        logits = chatts.compute_logits(params, cfg, hidden, mesh=mesh)[:, 0]
        next_tok = sampling.sample_per_slot(logits, key, temperature, top_p)
        emit = jnp.where(live, next_tok, -1)
        hit_eos = jnp.any(next_tok[:, None] == eos_ids[None, :], axis=1)
        budget = budget - jnp.where(live, 1, 0)
        new_live = live & ~hit_eos & (budget > 0)
        tokens = jnp.where(live, next_tok, tokens)
        cur_lens = cur_lens + jnp.where(live, 1, 0).astype(cur_lens.dtype)
        return (new_caches, tokens, cur_lens, new_live, budget, rng), emit

    live0 = active & (budget_left > 0)
    (caches, tokens, cur_lens, live, budget_left, rng), emitted = jax.lax.scan(
        body, (caches, tokens, cur_lens, live0, budget_left, rng), None,
        length=chunk_size,
    )
    return caches, tokens, cur_lens, budget_left, rng, emitted, live


def _decode_all_slots(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    chunk_size: int,
    pad_id: int,
    caches,  # donated
    tokens,  # (B,) last token per slot
    cur_lens,  # (B,)
    active,  # (B,) bool — slot has a live request
    temperature,  # (B,)
    top_p,  # (B,)
    eos_ids,  # (E,) int32 (padded with -1)
    budget_left,  # (B,) int32 remaining tokens incl. this chunk
    rng,
    mesh=None,
):
    """Advance every active slot ``chunk_size`` decode steps on device.

    Emits (B, chunk) tokens; -1 marks steps where a slot was inactive or
    finished.  Finishing conditions (EOS or budget exhausted) are evaluated
    on device so the host syncs once per chunk.
    """
    caches, tokens, cur_lens, budget_left, rng, emitted, live = _decode_scan(
        params, cfg, attn_impl, chunk_size, caches, tokens, cur_lens,
        active, temperature, top_p, eos_ids, budget_left, rng, mesh,
    )
    # rng is returned so the host can thread it into the next round without
    # a standalone jax.random.split, and emitted+live are PACKED into one
    # array so the host fetches one result instead of two (each host-side
    # device op / fetch costs a 5-20 ms tunnel dispatch per serving round
    # on this environment).  packed: (B, chunk+1); last column = live flag.
    packed = jnp.concatenate(
        [emitted.T.astype(jnp.int32), live.astype(jnp.int32)[:, None]],
        axis=1)
    return caches, tokens, cur_lens, budget_left, rng, packed


def _block_prefill_merge(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    act_int8: bool,
    caches,
    tokens,
    cur_lens,
    temperature,
    top_p,
    budget_left,
    adm_write_rows,
    adm_embeds,
    adm_seq_lens,
    adm_temp,
    adm_topp,
    adm_budget,
    rng,
    mesh=None,
):
    """Shared core of the block-mode admission: monolithic (A, T) prompt
    block -> span-scatter prompt K/V into the big caches -> sample first
    tokens -> merge the admitted rows' decode state.  Used by the fused
    admit-then-decode round (_block_admission_round) and by the early-emit
    prefill-only round (_block_prefill_round)."""
    a, t, _ = adm_embeds.shape
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (a, 1))
    kv_valid = positions < adm_seq_lens[:, None]
    int8_kv = len(caches[0]) == 4
    small_caches = [
        (
            jnp.zeros((a, c[0].shape[1], t, c[0].shape[3]), c[0].dtype),
            jnp.zeros((a, c[1].shape[1], t, c[1].shape[3]), c[1].dtype),
        )
        + (
            (jnp.ones((a, c[0].shape[1], t), jnp.float32),
             jnp.ones((a, c[1].shape[1], t), jnp.float32))
            if int8_kv else ()
        )
        for c in caches
    ]
    hidden, small_caches = qwen.forward(
        params["llm"], cfg.llm, adm_embeds, positions,
        kv_caches=small_caches, write_pos=None,
        kv_valid=kv_valid, kv_positions=positions,
        attn_impl=attn_impl, mesh=mesh, act_int8=act_int8,
    )
    # Place prompt K/V into the big caches: one span-window scatter per
    # buffer per layer (pad rows routed out of bounds drop whole windows).
    rows = adm_write_rows.astype(jnp.int32)
    new_caches = []
    for big, small in zip(caches, small_caches):
        updated = []
        for bbuf, sbuf in zip(big, small):
            updated.append(qwen._scatter_token_spans(
                bbuf, sbuf.astype(bbuf.dtype), rows, jnp.int32(0)))
        new_caches.append(tuple(updated))
    caches = new_caches
    # First token for each admission row.
    last = jnp.take_along_axis(
        hidden,
        jnp.maximum(adm_seq_lens - 1, 0)[:, None, None].astype(jnp.int32),
        axis=1,
    )
    logits = chatts.compute_logits(params, cfg, last, mesh=mesh)[:, 0]
    rng, key = jax.random.split(rng)
    first = sampling.sample_per_slot(logits, key, adm_temp, adm_topp)
    # Merge the admitted rows into the decode state (A-element scatters on
    # (B,) vectors — trivial).
    tokens = tokens.at[rows].set(first.astype(tokens.dtype), mode="drop")
    cur_lens = cur_lens.at[rows].set(
        adm_seq_lens.astype(cur_lens.dtype), mode="drop")
    temperature = temperature.at[rows].set(adm_temp, mode="drop")
    top_p = top_p.at[rows].set(adm_topp, mode="drop")
    budget_left = budget_left.at[rows].set(
        (adm_budget - 1).astype(budget_left.dtype), mode="drop")
    return (caches, tokens, cur_lens, budget_left, temperature, top_p,
            first, rng)


def _block_prefill_round(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    act_int8: bool,
    caches,  # donated
    tokens,  # (B,)
    cur_lens,  # (B,)
    temperature,  # (B,)
    top_p,  # (B,)
    budget_left,  # (B,)
    adm_write_rows,  # (A,)
    adm_embeds,  # (A, T, H)
    adm_seq_lens,  # (A,)
    adm_temp,  # (A,)
    adm_topp,  # (A,)
    adm_budget,  # (A,)
    rng,
    mesh=None,
):
    """Early-emit block admission (block_early_emit=True): ONLY the prompt
    block + first-token sample — the first tokens stream to clients one
    host fetch earlier, without waiting for a decode chunk to ride along.
    The admitted rows then decode in the NEXT round through the ordinary
    pure-decode executable (already compiled — no extra family).

    TTFT anatomy: a fused block round emits its first tokens at round end,
    after the decode scan (chunk x TPOT, 150-370 ms at the measured
    configs).  Splitting costs one extra dispatch+fetch (~tunnel RTT) per
    admission round and leaves the device idle for that turnaround — the
    latency arm buys TTFT with ~that much throughput."""
    (caches, tokens, cur_lens, budget_left, temperature, top_p, first,
     rng) = _block_prefill_merge(
        params, cfg, attn_impl, act_int8, caches, tokens, cur_lens,
        temperature, top_p, budget_left, adm_write_rows, adm_embeds,
        adm_seq_lens, adm_temp, adm_topp, adm_budget, rng, mesh=mesh)
    # Liveness for the admitted rows is recomputed HOST-side from the
    # fetched first tokens (_finalize_admission handles per-request eos
    # sets and budgets); the next decode round's `active` comes from
    # live_host, so no device-side active update is needed here.
    return (caches, tokens, cur_lens, budget_left, temperature, top_p,
            rng, first.astype(jnp.int32))


def _block_admission_round(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    act_int8: bool,
    chunk_size: int,
    caches,  # donated
    tokens,  # (B,)
    cur_lens,  # (B,)
    active,  # (B,) bool
    temperature,  # (B,)
    top_p,  # (B,)
    eos_ids,  # (E,)
    budget_left,  # (B,)
    adm_write_rows,  # (A,) int32 — cache rows (pads -> out-of-bounds, dropped)
    adm_embeds,  # (A, T, H) the WHOLE admission prompt, merged embeddings
    adm_seq_lens,  # (A,)
    adm_temp,  # (A,)
    adm_topp,  # (A,)
    adm_budget,  # (A,) int32 — max_tokens per admission row (pads 0)
    rng,
    mesh=None,
):
    """One serving round = the ENTIRE admission prefilled as one monolithic
    (A, T) block, THEN the full decode scan with the admitted rows LIVE —
    a single jit'd executable.

    Why a block instead of slicing the prompt across the decode scan
    (_mixed_step_all_slots): measured on chip (r3 anatomy), the scan-sliced
    form runs the prompt side as 32 small (B + A*npt)-row matmuls at ~50%
    MXU efficiency, 1.22 s/round at (a=8, npt=16), and saturated serving
    spent its whole window in those rounds (531 tok/s).  A monolithic
    (A*T)-row block hits the ~76% efficiency of the batch prefill path, so
    the same admission costs ~0.4 s on top of the decode scan.  Decode
    never stalls (same executable), prompt K/V lands in the big caches via
    span-window scatters, and the admission's first tokens are sampled
    in-round — one dispatch, one fetch.

    Why prompt-first (r3, second redesign): with the scan first, an
    admitted slot sat occupied-but-idle for the whole chunk of its
    admission round — ~32 of a ~160-step slot lifecycle at the bench
    workload, the dominant term in mean_live 22/32 at saturation.  Running
    the block first lets the same round's scan decode the new rows
    (chunk extra tokens per admitted row for ~zero extra round time: the
    scan cost is set by the static B, not by how many rows are live).

    The scan-sliced path remains for prompts too long to block-prefill
    (bounded compiles / transient memory; ServeEngine._start_mixed_admission
    picks the mode)."""
    b = tokens.shape[0]
    # 1-4. Prompt block, K/V span scatter, first tokens, decode-state merge
    # (shared with the early-emit prefill round).
    (caches, tokens, cur_lens, budget_left, temperature, top_p, first,
     rng) = _block_prefill_merge(
        params, cfg, attn_impl, act_int8, caches, tokens, cur_lens,
        temperature, top_p, budget_left, adm_write_rows, adm_embeds,
        adm_seq_lens, adm_temp, adm_topp, adm_budget, rng, mesh=mesh)
    first_b = jnp.full((b,), -1, jnp.int32)
    first_b = jax.lax.dynamic_update_slice(first_b, first.astype(jnp.int32),
                                           (0,))
    # Device liveness uses the GLOBAL eos set, a subset of every request's
    # host-side set (host _finalize/_process remain authoritative; device
    # over-decode is discarded there).
    rows = adm_write_rows.astype(jnp.int32)
    first_eos = jnp.any(first[:, None] == eos_ids[None, :], axis=1)
    adm_live = (~first_eos) & (adm_budget > 1)
    active = active.at[rows].set(adm_live, mode="drop")
    # 5. The decode scan, admitted rows live from step 0.
    caches, tokens, cur_lens, budget_left, rng, emitted, live = _decode_scan(
        params, cfg, attn_impl, chunk_size, caches, tokens, cur_lens,
        active, temperature, top_p, eos_ids, budget_left, rng, mesh,
    )
    # packed: (B, chunk+2) — emitted tokens, live flag, first-token column.
    packed = jnp.concatenate(
        [emitted.T.astype(jnp.int32), live.astype(jnp.int32)[:, None],
         first_b[:, None]],
        axis=1)
    return (caches, tokens, cur_lens, budget_left, temperature, top_p,
            rng, packed)


class ServeEngine:
    """Slot-based continuous-batching engine with a background step loop."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ChatTSConfig,
        processor: ChatTSProcessor,
        *,
        max_batch_size: int = 8,
        max_model_len: int = 6144,  # reference serving default ~6000
        cache_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        decode_chunk: int = 8,
        eos_token_ids: Sequence[int] = (),
        seed: int = 0,
        fuse: bool = True,
        prefill_chunk: Optional[int] = None,
        mixed_admission: bool = True,
        mixed_npt: int = 64,
        prefill_act_int8: bool = False,
        admission_bucket: int = 8,
        admission_binning: bool = True,
        admission_pad_to_class: bool = False,
        block_early_emit: bool = False,
    ):
        if fuse:
            params = chatts.maybe_fuse(params)
        self.params = params
        self.cfg = cfg
        self.processor = processor
        # Pin the series-count bucket so admission batches of any size share
        # one compiled prefill shape (admission size varies with arrival
        # timing; a fresh series bucket is a multi-second compile).
        processor.series_count_floor = max(
            processor.series_count_floor, 2 * max_batch_size
        )
        self.max_batch_size = max_batch_size
        self.max_model_len = max_model_len
        self.decode_chunk = decode_chunk
        # Prompts bucketing above this length always admit through the MIXED
        # path (even with no live slots): transformer compile shapes stay
        # bounded for long-prompt traffic instead of one monolithic compile
        # per token bucket.
        self.prefill_chunk = prefill_chunk
        # Mixed admission: while any slot is decoding, admissions run
        # through the fused prefill+decode step (prompt tokens ride the
        # decode weight reads) instead of a monolithic prefill that stalls
        # decode.  mixed_npt = prompt tokens consumed per admission row per
        # decode scan step.
        self.mixed_admission = mixed_admission
        self.mixed_npt = mixed_npt
        # Max rows per mixed/block admission wave (one compiled family per
        # power-of-two step below it).  8 balances compile count against
        # admission throughput; larger buckets admit more per round at the
        # cost of TTFT staggering within the wave.
        self._a_bucket_cfg = admission_bucket
        # Length-classed admission (r4): padded admission rows COMPUTE, so a
        # FIFO wave over a heterogeneous backlog pads every row to its
        # longest member's token bucket (an 8-row wave of 200..2000-token
        # prompts burns ~3.5x its useful prompt FLOPs).  When on, each wave
        # takes only requests from the OLDEST waiting request's length class
        # (pow2 ceiling of exact token count, min 256) — FIFO-fair across
        # classes, zero behavior change for homogeneous workloads.
        self.admission_binning = admission_binning
        # Pad each admission wave's token width to its length CLASS instead
        # of the fine (128-step) bucket: the compiled admission-shape set
        # becomes {classes} x {families} by construction — the key bound
        # that makes OPEN prompt-length traffic (e.g. the reference eval
        # envelope, 1-30 series of 64-1024 points) warmable.  Costs bounded
        # extra pad FLOPs (a wave pads to <=2x its longest member).
        self.admission_pad_to_class = admission_pad_to_class and admission_binning
        # Early first-token emission (r4, latency arm): block admissions
        # run prefill-only rounds — first tokens stream one fetch earlier
        # instead of after the decode chunk (chunk x TPOT sooner), at the
        # cost of one extra dispatch+fetch turnaround per admission round.
        self.block_early_emit = block_early_emit
        # int8xint8 prompt-side matmuls (v5e MXU 2x TOPS): halves the
        # FLOP floor of monolithic admission prefill.  Decode stays bf16.
        self.prefill_act_int8 = prefill_act_int8
        # Admissions whose whole prompt fits a*t <= this budget run as ONE
        # block-mode round (decode scan + monolithic prompt block, measured
        # ~76% MXU on the prompt side); bigger admissions fall back to the
        # scan-sliced mixed step (bounded compiles / transient memory).
        self.block_token_budget = 8192
        self._a_bucket = min(self._a_bucket_cfg, max_batch_size)
        self.attn_impl = attn_impl
        self.eos_token_ids = tuple(eos_token_ids)
        # Hoisted device constant: rebuilding it per round costs a tunnel
        # dispatch (~5-20 ms) on this environment.
        self._eos_dev = jnp.asarray(
            list(self.eos_token_ids) or [-1], jnp.int32)
        self.pad_id = processor.pad_token_id

        self.cache_dtype = cache_dtype
        self.caches = kv_cache.allocate(
            cfg.llm, max_batch_size, max_model_len, cache_dtype
        )
        b = max_batch_size
        self.tokens = jnp.zeros((b,), jnp.int32)
        self.cur_lens = jnp.zeros((b,), jnp.int32)
        self.temperature = jnp.zeros((b,), jnp.float32)
        self.top_p = jnp.ones((b,), jnp.float32)
        self.budget = jnp.zeros((b,), jnp.int32)
        self.rng = jax.random.PRNGKey(seed)

        self.slots: List[Optional[Request]] = [None] * b
        self.live_host = np.zeros((b,), bool)
        # Device mirror of live_host, re-uploaded only when the content
        # changes (a host->device transfer is a tunnel dispatch; at steady
        # decode nothing changes between rounds).
        self._active_dev = None
        self._active_key = None
        # In-flight mixed admission (prompt tokens consumed inside the
        # decode rounds; see _mixed_step_all_slots).
        self._pending_mixed: Optional[Dict[str, Any]] = None

        self._prefill_jit = jax.jit(
            _prefill_batch,
            static_argnames=("cfg", "attn_impl", "act_int8", "mesh"),
            donate_argnames=("caches",),
        )
        # Mesh-aware decode: TP/DP-sharded params route the ragged
        # kernel through shard_map (mesh is a hashable static arg).
        from chatts_tpu.parallel.sharding import infer_mesh

        self.mesh = infer_mesh(params)
        self._decode_jit = jax.jit(
            _decode_all_slots,
            static_argnames=("cfg", "attn_impl", "chunk_size", "pad_id",
                             "mesh"),
            donate_argnames=("caches",),
        )
        # Mixed-admission pieces.
        from chatts_tpu.runtime import engine as _batch_engine

        self._embed_jit = jax.jit(
            _batch_engine._embed_prompt, static_argnames=("cfg",)
        )
        self._mixed_jit = jax.jit(
            _mixed_step_all_slots,
            static_argnames=("cfg", "attn_impl", "chunk_size", "npt",
                             "kv_limit", "mesh"),
            donate_argnames=("caches",),
        )
        self._block_jit = jax.jit(
            _block_admission_round,
            static_argnames=("cfg", "attn_impl", "act_int8", "chunk_size",
                             "mesh"),
            donate_argnames=("caches",),
        )
        self._block_pre_jit = jax.jit(
            _block_prefill_round,
            static_argnames=("cfg", "attn_impl", "act_int8", "mesh"),
            donate_argnames=("caches",),
        )
        self._slice_jit = jax.jit(_slice_admission, static_argnames=("c",))
        self._sample_first_jit = jax.jit(
            _sample_admission_first, static_argnames=("cfg", "mesh")
        )

        self.waiting = _WaitQueue()
        # After a round frees k slots, wait up to this long for k replacement
        # requests to land in the queue before dispatching the next round
        # (saturated churn fix: a replacement submitted milliseconds after
        # its predecessor finished otherwise misses the next admission pass
        # and its slot idles a FULL round, ~750 ms at saturation — measured
        # mean_live 21.9/32, r3).  Bounded and round-local: costs nothing at
        # idle, and at saturation trades <=10 ms/round for up to k*round_ms
        # of recovered slot time.
        self.admit_grace_s = 0.010
        self._finished_total = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        # Metrics.
        self.total_requests = 0
        self.total_output_tokens = 0  # updated at request completion
        self.streamed_tokens = 0  # updated every round (anatomy accounting)
        self.mixed_rounds_run = 0
        from chatts_tpu.utils.profiling import MetricsAggregator

        self.metrics = MetricsAggregator()
        # Round anatomy ring buffer: one dict per engine-loop iteration —
        # {kind, admit_s, round_s, live, a, npt, emitted, fresh, gap_s} —
        # the profiling substrate for the serving-efficiency work.  fresh
        # marks first-use executable keys (compile suspects); gap_s is host
        # time since the previous round ended (loop starvation).  Cheap to
        # keep always-on.
        import collections

        self.round_log: "collections.deque" = collections.deque(maxlen=4096)
        # stats() snapshots the deque from caller threads while the engine
        # loop appends — unguarded iteration raises "deque mutated during
        # iteration" under churn.
        self._round_log_lock = threading.Lock()
        # Slow-event log + first-use executable-key tracking (r4, VERDICT r3
        # item 2): any loop phase that blocks >= slow_event_s lands here with
        # a label, and every round records whether it was the FIRST use of
        # its executable shape key — the discriminator between "compile in
        # the measurement window" and "chip degradation" that the r3 driver
        # run could not answer.
        self.events: "collections.deque" = collections.deque(maxlen=512)
        self.slow_event_s = 1.0
        self._seen_shape_keys: set = set()
        self._last_round_end = time.perf_counter()

    # -- public API --------------------------------------------------------

    def warmup(
        self,
        prefill_buckets: Sequence[int] = (128, 256, 512),
        series_per_request: int = 2,
        series_len: int = 512,
    ) -> None:
        """Pre-compile the decode step and the standard prefill buckets so the
        first real request doesn't pay multi-second jit latency.

        Submits max_batch_size concurrent requests per bucket so the BATCHED
        admission shape (full Bp rows, typical series buckets) is what gets
        compiled — a single warm request would compile a different series
        bucket and the first real burst would still recompile."""
        import numpy as np

        from chatts_tpu.core import encoding

        self.start()
        for bucket in sorted(prefill_buckets):
            # ~1 token per short word; leave headroom for the template + TS
            # placeholders so the padded length lands in this bucket.
            words = " ".join("warm" for _ in range(max(1, bucket - 64)))
            holes = " ".join(encoding.TS_PAIR for _ in range(series_per_request))
            prompt = f"{words} {holes}"
            # Full burst compiles the max-row admission shape; the trailing
            # small bursts compile the 8-, 2- and 1-row shapes used for
            # trickle / single-request traffic.  (These waves run with no
            # live decode, so they exercise the MONOLITHIC bp families —
            # the block families compile in _warmup_mixed.)
            bursts = [self.max_batch_size]
            if self.max_batch_size > 8:
                bursts.append(4)
            if self.max_batch_size > 2:
                bursts.append(2)
            if self.max_batch_size > 1:
                bursts.append(1)
            for burst in bursts:
                reqs = []
                for _ in range(burst):
                    series = [
                        np.sin(np.arange(float(series_len)))
                        for _ in range(series_per_request)
                    ]
                    req = Request(prompt, series,
                                  SamplingParams(max_tokens=self.decode_chunk + 2,
                                                 temperature=0.0))
                    self.submit(req)
                    reqs.append(req)
                deadline = time.time() + 600
                for req in reqs:
                    while req.finished_s is None and req.error is None:
                        if time.time() > deadline:
                            print(f"[warmup] bucket {bucket} timed out",
                                  file=sys.stderr)
                            return
                        time.sleep(0.01)
                    if req.error:
                        print(f"[warmup] bucket {bucket} failed: {req.error}",
                              file=sys.stderr)
        if self.mixed_admission:
            self._warmup_mixed(prefill_buckets, series_per_request, series_len)

    def _warmup_mixed(self, prefill_buckets, series_per_request, series_len):
        """Compile the fused mixed prefill+decode step: keep one request
        decoding, admit an overlapping batch per bucket (the admission
        routes through _mixed_step_all_slots)."""
        import numpy as np

        from chatts_tpu.core import encoding

        holes = " ".join(encoding.TS_PAIR for _ in range(series_per_request))

        def mkseries():
            return [np.sin(np.arange(float(series_len)))
                    for _ in range(series_per_request)]

        # The runner's (prompt + max_tokens) must pass the max_model_len
        # admission check for ANY engine capacity — a 4096 budget against a
        # 1024-cap engine gets rejected and the mixed shapes never compile.
        # Reserve room for the short runner prompt + its TS tokens.
        budget = min(4096, self.max_model_len - 64
                     - 64 * max(1, series_per_request)
                     - series_per_request * series_len // 8)
        budget = max(budget, 4 * self.decode_chunk)
        deadline = time.time() + 600
        runner_box = [None]

        def ensure_runner():
            """(Re)start the background decoder if it finished or errored —
            compiles per bucket can outlive one runner's token budget."""
            r = runner_box[0]
            if r is not None and r.finished_s is None and r.error is None:
                return True
            r = Request(
                f"runner {holes}", mkseries(),
                SamplingParams(max_tokens=budget, temperature=0.0),
            )
            runner_box[0] = r
            self.submit(r)
            while not r.output_tokens:
                if r.error:
                    print(f"[warmup] mixed runner rejected: {r.error}",
                          file=sys.stderr)
                    return False
                if time.time() > deadline:
                    print("[warmup] mixed runner timed out", file=sys.stderr)
                    return False
                time.sleep(0.01)
            return True

        for bucket in sorted(prefill_buckets):
            # Every block-admission row family (the {1,2,3,4,6,8} ladder
            # capped at the bucket): steady-state replacement traffic lands
            # on all of them, and a first-use compile mid-serving is a
            # 13-17 s stall (measured r3).
            fams = {self._block_family(n)
                    for n in range(1, self._a_bucket + 1)}
            for rows in sorted(fams, reverse=True):
                if not ensure_runner():
                    return
                words = " ".join("warm" for _ in range(max(1, bucket - 64)))
                reqs = [
                    Request(f"{words} {holes}", mkseries(),
                            SamplingParams(max_tokens=2, temperature=0.0))
                    for _ in range(rows)
                ]
                for req in reqs:
                    self.submit(req)
                for req in reqs:
                    while req.finished_s is None and req.error is None:
                        if time.time() > deadline:
                            print(f"[warmup] mixed bucket {bucket} timed out",
                                  file=sys.stderr)
                            if runner_box[0] is not None:
                                runner_box[0].cancel()
                            return
                        time.sleep(0.01)
                    if req.error:
                        print(f"[warmup] mixed bucket {bucket} failed: "
                              f"{req.error}", file=sys.stderr)
        runner = runner_box[0]
        if runner is None:
            return
        runner.cancel()
        while runner.finished_s is None and runner.error is None:
            if time.time() > deadline:
                return
            time.sleep(0.01)

    def submit(self, request: Request) -> Request:
        self.total_requests += 1
        self.waiting.put(request)
        self._wake.set()
        return request

    def generate_sync(
        self, prompt: str, timeseries: Sequence[np.ndarray] = (),
        params: Optional[SamplingParams] = None, timeout: float = 600.0,
    ) -> Request:
        req = Request(prompt, [np.asarray(t) for t in timeseries],
                      params or SamplingParams())
        self.submit(req)
        deadline = time.time() + timeout
        while req.finished_s is None and req.error is None:
            if time.time() > deadline:
                raise TimeoutError(f"request {req.request_id} timed out")
            time.sleep(0.005)
        if req.error:
            raise RuntimeError(req.error)
        return req

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- engine loop -------------------------------------------------------

    def _event(self, label: str, seconds: float, **info) -> None:
        """Record a slow host/loop event (admission staging, monolithic
        prefill, round completion) for post-hoc window forensics."""
        if seconds >= self.slow_event_s:
            with self._round_log_lock:
                self.events.append(
                    (time.time(), label, round(seconds, 3), info))

    def _fresh_key(self, kind: str, *dims) -> bool:
        """True on the FIRST use of an executable shape key (== the round
        that pays that key's jit compile, absent a persistent-cache hit)."""
        key = (kind,) + dims
        if key in self._seen_shape_keys:
            return False
        self._seen_shape_keys.add(key)
        return True

    def event_snapshot(self) -> list:
        with self._round_log_lock:
            return list(self.events)

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is None]

    def _token_class(self, req: Request) -> int:
        """Cached pow2 (>= 256) length class of a request's exact prompt
        token count; -1 when the prompt fails to encode (admits alone so
        the per-request error isolation catches it)."""
        if req.token_class is None:
            try:
                n = self.processor.count_tokens(req.prompt, req.timeseries)
                c = 256
                while c < n:
                    c *= 2
                req.token_class = c
            except Exception:
                req.token_class = -1
        return req.token_class

    def _select_candidates(self, n_free: int) -> List[Request]:
        """Pick the next admission wave from the wait queue.

        FIFO order, except that with admission_binning the wave takes only
        requests sharing the OLDEST request's length class — the oldest
        request always admits first (starvation-free), and rows in one
        padded wave stay within 2x of each other's token count."""
        live: List[Request] = []
        drop: List[Request] = []
        for req in self.waiting.snapshot():
            if req.cancelled:
                req.finish_reason = "cancelled"
                req.finished_s = time.perf_counter()
                req.stream_queue.put(None)
                drop.append(req)
            else:
                live.append(req)
        if drop:
            self.waiting.remove(drop)
        if not live:
            return []
        if self.admission_binning and len(live) > 1:
            head_cls = self._token_class(live[0])
            if head_cls == -1:
                chosen = [live[0]]  # malformed: isolate
            else:
                chosen = [r for r in live
                          if self._token_class(r) == head_cls][:n_free]
        else:
            chosen = live[:n_free]
        self.waiting.remove(chosen)
        return chosen

    def _admit(self) -> None:
        """Admit up to len(free slots) waiting requests with ONE batched
        prefill call.  The batch is processed ONCE (not probed per request —
        32 individual processor calls cost ~0.4 s of host time per
        admission); a request that fails processing is isolated by a
        per-request fallback, and one that exceeds max_model_len is rejected
        after the shared processing pass without poisoning the batch."""
        if self._pending_mixed is not None:
            return  # an admission is in flight; new ones wait
        free = self._free_slots()
        if not free:
            return
        candidates = self._select_candidates(len(free))
        if not candidates:
            return
        pad_to = None
        if self.admission_pad_to_class:
            cls = max(self._token_class(r) for r in candidates)
            # Clamp the class width to the cache capacity: a >cap/2-token
            # prompt's pow2 class exceeds max_model_len (class 8192 at cap
            # 6144), which no admission path can place; every valid prompt
            # fits cap (admission rejects n_tok + max_tokens > cap), so the
            # clamped width still covers the wave.
            pad_to = min(cls, self.max_model_len) if cls > 0 else None
        try:
            batch = self.processor(
                [req.prompt for req in candidates],
                [ts for req in candidates for ts in req.timeseries],
                pad_tokens_to=pad_to,
            )
        except Exception:
            # Some request is malformed: probe individually to isolate it.
            kept: List[Request] = []
            for req in candidates:
                try:
                    self.processor([req.prompt], req.timeseries)
                    kept.append(req)
                except Exception as err:
                    req.error = f"{type(err).__name__}: {err}"
                    req.stream_queue.put(None)
            candidates = kept
            if not candidates:
                return
            batch = self.processor(
                [req.prompt for req in candidates],
                [ts for req in candidates for ts in req.timeseries],
                pad_tokens_to=pad_to,
            )
        admitted: List[Request] = []
        keep_rows: List[int] = []
        for i, req in enumerate(candidates):
            n_tok = int(batch.seq_lens[i])
            if n_tok + req.params.max_tokens > self.max_model_len:
                req.error = (
                    f"ValueError: prompt ({n_tok}) + max_tokens "
                    f"({req.params.max_tokens}) exceeds max_model_len "
                    f"{self.max_model_len}"
                )
                req.stream_queue.put(None)
                continue
            req.prompt_tokens = n_tok
            admitted.append(req)
            keep_rows.append(i)
        if not admitted:
            return
        want_mixed = self.mixed_admission and (
            self.live_host.any()
            or (self.prefill_chunk is not None
                and batch.input_ids.shape[1] > self.prefill_chunk)
        )
        use_mixed = False
        if want_mixed:
            # Mixed admissions are capped at the admission bucket (8 rows:
            # one compiled shape, staggered TTFTs); overflow goes back to the
            # queue and admits next round — the first sub-batch is already
            # decoding while the next one prefills.
            if len(admitted) > self._a_bucket:
                # Overflow returns to the FRONT of the queue (it is the
                # oldest of its class; put() would let newer jump it).
                self.waiting.requeue(admitted[self._a_bucket:])
                admitted = admitted[: self._a_bucket]
                keep_rows = keep_rows[: len(admitted)]
            # The mixed step packs EXACTLY the admitted rows: rejected
            # candidates leave keep_rows sparse (row indices that can exceed
            # the admission family), so re-run the processor on the admitted
            # rows alone whenever the batch rows aren't them already.
            if keep_rows != list(range(batch.input_ids.shape[0])):
                batch = self.processor(
                    [req.prompt for req in admitted],
                    [ts for req in admitted for ts in req.timeseries],
                    pad_tokens_to=pad_to,
                )
                keep_rows = list(range(len(admitted)))
            if self._block_eligible(len(admitted), batch.input_ids.shape[1]):
                use_mixed = True
            else:
                # Scan-sliced fallback writes prompt K/V as npt-token span
                # windows; the ACTUAL family's padded round bound must fit
                # the cache or a tail window would fall out of bounds
                # (dropped whole -> lost prompt K/V).  Smaller families get
                # a LARGER npt cap, so the plan must be sized with the real
                # admitted count, not the worst-case bucket.  Odd configs
                # fall back to monolithic.
                _, _, _, t_pad_m = self._mixed_plan(
                    len(admitted), batch.input_ids.shape[1])
                use_mixed = t_pad_m <= self.caches[0][0].shape[2]
        try:
            self._prefill_requests(admitted, free[: len(admitted)], batch,
                                   keep_rows, use_mixed)
        except Exception as err:
            for req in admitted:
                req.error = f"{type(err).__name__}: {err}"
                req.stream_queue.put(None)

    def _prefill_requests(self, reqs: List[Request], slots: List[int],
                          batch, keep_rows: List[int],
                          use_mixed: bool = False) -> None:
        if use_mixed:
            self._start_mixed_admission(reqs, slots, keep_rows, batch)
            return
        kb = batch.input_ids.shape[0]
        t = batch.input_ids.shape[1]
        mono_t0 = time.perf_counter()
        # Admission-row buckets: padded rows COMPUTE, so bucket tightly —
        # a single request padded to 8 rows pays 8x its prefill FLOPs
        # (~470 ms vs ~120 ms at the 8B shape), and a single padded to 2
        # still pays 2x (the dominant term in isolated TTFT).  Four
        # compiled shapes per token bucket: {1, 2, 8, full}.
        if kb <= 1 and self.max_batch_size > 1:
            bp = 1
        elif kb <= 2 and self.max_batch_size > 2:
            bp = 2
        elif kb <= 8 and self.max_batch_size > 8:
            bp = 8
        else:
            bp = self.max_batch_size

        # Pad request rows to the admission bucket; non-admitted rows
        # compute but land nowhere (their slot_mask is off).
        input_ids = np.full((bp, t), self.processor.pad_token_id, np.int32)
        input_ids[:kb] = batch.input_ids
        positions = np.tile(np.arange(t, dtype=np.int32), (bp, 1))
        seq_lens = np.ones((bp,), np.int32)
        seq_lens[:kb] = batch.seq_lens
        # Host-computed slot placement: inv_ids[b] = prefill row owning slot
        # b; slot_mask marks slots admitted this round (see _prefill_batch).
        inv_ids = np.zeros((self.max_batch_size,), np.int32)
        slot_mask = np.zeros((self.max_batch_size,), bool)
        temp = np.zeros((bp,), np.float32)
        topp = np.ones((bp,), np.float32)
        for req, slot, row in zip(reqs, slots, keep_rows):
            inv_ids[slot] = row
            slot_mask[slot] = True
            temp[row] = req.params.temperature
            topp[row] = req.params.top_p

        self.rng, key = jax.random.split(self.rng)
        self.caches, first = self._prefill_jit(
            self.params, self.cfg, self.attn_impl, self.prefill_act_int8,
            self.caches,
            jnp.asarray(inv_ids),
            jnp.asarray(slot_mask),
            jnp.asarray(input_ids),
            jnp.asarray(positions),
            jnp.asarray(seq_lens),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
            jnp.asarray(temp), jnp.asarray(topp), key,
            mesh=self.mesh,
        )
        fresh = self._fresh_key("mono", bp, t, batch.ts_values.shape)
        self._finalize_admission(reqs, slots, keep_rows, first)
        # Monolithic admissions run OUTSIDE the round loop (idle device) and
        # block on the first-token fetch — log them as their own round kind
        # so window anatomy sees their wall time (the r3 driver's 14B
        # saturation collapse was invisible precisely because this path was
        # unlogged).
        mono_s = time.perf_counter() - mono_t0
        with self._round_log_lock:
            self.round_log.append({
                "kind": "mono", "admit_s": 0.0, "round_s": mono_s,
                "live": 0, "a": kb, "npt": bp, "emitted": len(reqs),
                "fresh": fresh, "gap_s": 0.0,
            })
        self._event("mono_admission", mono_s, rows=kb, bp=bp, t=t,
                    fresh=fresh)

    def _finalize_admission(self, reqs, slots, keep_rows, first,
                            device_synced: bool = False) -> None:
        """Host bookkeeping for an admission's first tokens.

        device_synced=True (block-mode rounds): the round's executable
        already merged tokens/cur_lens/temperature/top_p/budget for the
        admitted rows on device, so only host state (slot records,
        live_host, streams) updates here.  Otherwise (scan-sliced mixed
        path) the device state is batched into ONE host->device round trip
        per array: per-slot .at[].set dispatches (5 arrays x 32 slots) used
        to queue ~160 tiny device ops per admission, stalling the next
        decode round by ~0.6 s (measured on v5e)."""
        first_host = np.asarray(first)
        now = time.perf_counter()

        if not device_synced:
            tokens_h = np.array(self.tokens)
            cur_h = np.array(self.cur_lens)
            temp_h = np.array(self.temperature)
            topp_h = np.array(self.top_p)
            budget_h = np.array(self.budget)
        for req, slot, row in zip(reqs, slots, keep_rows):
            tok = int(first_host[row])
            req.first_token_s = now
            eos = set(self.eos_token_ids) | set(req.params.stop_token_ids)
            self.slots[slot] = req
            if req.cancelled:
                self._finish(slot, "cancelled")
                continue
            if tok in eos or req.params.max_tokens <= 1:
                if tok not in eos:
                    req.output_tokens.append(tok)
                    req.stream_queue.put([tok])
                self._finish(slot, "stop" if tok in eos else "length")
                continue
            req.output_tokens.append(tok)
            req.stream_queue.put([tok])
            self.live_host[slot] = True
            if device_synced:
                continue
            tokens_h[slot] = tok
            cur_h[slot] = req.prompt_tokens
            temp_h[slot] = req.params.temperature
            topp_h[slot] = req.params.top_p
            budget_h[slot] = req.params.max_tokens - 1
        if not device_synced:
            self.tokens = jnp.asarray(tokens_h)
            self.cur_lens = jnp.asarray(cur_h)
            self.temperature = jnp.asarray(temp_h)
            self.top_p = jnp.asarray(topp_h)
            self.budget = jnp.asarray(budget_h)

    def _mixed_plan(self, n_reqs: int, t: int):
        """Size a mixed admission: (row family a, tokens-per-row-per-step
        npt, tokens-per-row-per-round c, padded prompt length t_pad).

        a is the smallest family covering the admitted rows; npt is exact
        (whole prompt in one round) unless capped to keep the packed matmul
        rows (B + a*npt) within the int4 kernel's 512-row single block.

        The 1-row family matters at steady state: most replacement
        admissions are singles (requests finish one at a time), and a
        single padded to 2 rows pays 2x its prompt FLOPs (pad rows
        COMPUTE)."""
        a = (1 if n_reqs <= 1 else 2 if n_reqs <= 2
             else 4 if n_reqs <= 4 else self._a_bucket)
        npt_cap = max(8, (512 - self.max_batch_size) // a)
        npt = min(-(-t // self.decode_chunk), npt_cap, self.mixed_npt)
        c = self.decode_chunk * npt
        t_pad = -(-t // c) * c
        return a, npt, c, t_pad

    def _block_family(self, n_reqs: int) -> int:
        """Padded row count for a block-mode admission.  The ladder
        {1,2,3,4,6,8[,10,12]} caps padding at one-two rows (pad rows
        COMPUTE their full T-token prompt FLOPs: at saturation churn ~5
        requests/round, the old {1,2,4,8} ladder padded 5->8 and burned
        ~33% of every block's prompt work) at the cost of a few extra
        compiled block shapes.  Rungs above 8 engage only when
        admission_bucket is raised (high-concurrency configs where churn
        exceeds 8 rows/round)."""
        for f in (1, 2, 3, 4, 6, 8, 10, 12):
            if n_reqs <= f < self._a_bucket:
                return f
        return self._a_bucket

    def _block_eligible(self, n_reqs: int, t: int) -> bool:
        """Whether an admission takes the block-mode round (decode scan +
        monolithic prompt block): the whole prompt must fit the cache and
        the block's row count must stay within the transient/compile
        budget.  With prefill_chunk configured, long prompts keep the
        scan-sliced path (that's the bounded-compile contract)."""
        if self.prefill_chunk is not None and t > self.prefill_chunk:
            return False
        a = self._block_family(n_reqs)
        return (a * t <= self.block_token_budget
                and t <= self.caches[0][0].shape[2])

    def _start_mixed_admission(self, reqs, slots, keep_rows, batch) -> None:
        """Begin a mixed admission: the prompt's merged embeddings are
        precomputed once, then every engine-loop iteration consumes
        ``decode_chunk * mixed_npt`` prompt tokens INSIDE the fused
        prefill+decode step (_mixed_step_all_slots) — live slots never
        stall, and prompt K/V writes land directly in the big caches at the
        admission slots (no transient caches, no placement pass).

        Compile surface: the mixed step sees an
        (A, decode_chunk*npt, H) embed slice with A in {2, 4, full} and npt
        sized to the prompt's token bucket — so {row family} x {token
        bucket} x {kv_limit ladder} keys recompiles.  Right-sizing BOTH
        axes matters: pad rows and pad tokens COMPUTE, and at steady state
        ~4 requests finish per 512-decode-token round, so an always-8-row,
        npt-64-padded step burned 69% of its prompt FLOPs on padding and
        saturated serving at ~370 tok/s (the prompt side of a mixed round
        is pure MXU work, ~13 GFLOP per token at the 8B shape)."""
        kb, t = batch.input_ids.shape
        if self._block_eligible(len(reqs), t):
            self._start_block_admission(reqs, slots, keep_rows, batch)
            return
        a, npt, c, t_pad = self._mixed_plan(len(reqs), t)
        # _admit guarantees the batch rows are exactly the admitted rows
        # (it re-processes when candidates were rejected), so kb <= a.
        assert kb == len(reqs) <= a, (kb, len(reqs), a)

        input_ids = np.full((a, t_pad), self.processor.pad_token_id, np.int32)
        input_ids[:kb, :t] = batch.input_ids
        embeds = self._embed_jit(
            self.params, self.cfg,
            jnp.asarray(input_ids),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
        )
        seq_lens = np.zeros((a,), np.int32)  # 0 for pad rows: no capture
        adm_slots = np.zeros((a,), np.int32)
        # Pad/rejected rows write OUT OF BOUNDS (distinct rows so scatter
        # indices stay unique) and drop.
        adm_write_rows = np.arange(
            self.max_batch_size, self.max_batch_size + a, dtype=np.int32
        )
        temp = np.zeros((a,), np.float32)
        topp = np.ones((a,), np.float32)
        for req, slot, row in zip(reqs, slots, keep_rows):
            seq_lens[row] = req.prompt_tokens
            adm_slots[row] = slot
            adm_write_rows[row] = slot
            temp[row] = req.params.temperature
            topp[row] = req.params.top_p
            # Reserve the slot so _free_slots keeps it out of further
            # admissions; live_host stays False until the first token.
            self.slots[slot] = req
        self.rng, key = jax.random.split(self.rng)
        hdim = embeds.shape[-1]
        fresh = self._fresh_key("embed", a, t_pad, batch.ts_values.shape)
        self._pending_mixed = {
            "fresh": fresh,
            "reqs": reqs, "slots": slots, "keep_rows": keep_rows,
            "embeds": embeds, "o": 0, "t_pad": t_pad, "npt": npt,
            "adm_slots": jnp.asarray(adm_slots),
            "adm_write_rows": jnp.asarray(adm_write_rows),
            "seq_dev": jnp.asarray(seq_lens),
            "temp": jnp.asarray(temp), "topp": jnp.asarray(topp),
            "key": key,
            "last_hidden": jnp.zeros((a, hdim), jnp.float32),
        }

    def _start_block_admission(self, reqs, slots, keep_rows, batch) -> None:
        """Stage a block-mode admission: merged prompt embeddings computed
        once; the next round runs the decode scan AND the whole (A, T)
        prompt block in one executable (_block_admission_round)."""
        kb, t = batch.input_ids.shape
        a = self._block_family(len(reqs))
        assert kb == len(reqs) <= a, (kb, len(reqs), a)
        input_ids = np.full((a, t), self.processor.pad_token_id, np.int32)
        input_ids[:kb] = batch.input_ids
        embeds = self._embed_jit(
            self.params, self.cfg,
            jnp.asarray(input_ids),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
        )
        seq_lens = np.zeros((a,), np.int32)
        # Pad rows write OUT OF BOUNDS (distinct rows keep scatter indices
        # unique) and their windows drop whole.
        adm_write_rows = np.arange(
            self.max_batch_size, self.max_batch_size + a, dtype=np.int32
        )
        temp = np.zeros((a,), np.float32)
        topp = np.ones((a,), np.float32)
        budget = np.zeros((a,), np.int32)
        for req, slot, row in zip(reqs, slots, keep_rows):
            seq_lens[row] = req.prompt_tokens
            adm_write_rows[row] = slot
            temp[row] = req.params.temperature
            topp[row] = req.params.top_p
            budget[row] = req.params.max_tokens
            self.slots[slot] = req  # reserve; live after the first token
        fresh = self._fresh_key("embed_blk", a, t, batch.ts_values.shape)
        self._pending_mixed = {
            "mode": "block", "fresh": fresh,
            "reqs": reqs, "slots": slots, "keep_rows": keep_rows,
            "embeds": embeds,
            "write_rows": jnp.asarray(adm_write_rows),
            "seq_dev": jnp.asarray(seq_lens),
            "temp": jnp.asarray(temp), "topp": jnp.asarray(topp),
            "budget_a": jnp.asarray(budget),
        }

    def _dispatch_block(self):
        st = self._pending_mixed
        if self.block_early_emit:
            (
                self.caches, self.tokens, self.cur_lens, self.budget,
                self.temperature, self.top_p, self.rng, first,
            ) = self._block_pre_jit(
                self.params, self.cfg, self.attn_impl,
                self.prefill_act_int8,
                self.caches, self.tokens, self.cur_lens,
                self.temperature, self.top_p, self.budget,
                st["write_rows"], st["embeds"], st["seq_dev"],
                st["temp"], st["topp"], st["budget_a"], self.rng,
                mesh=self.mesh,
            )
            self.mixed_rounds_run += 1
            self._pending_mixed = None
            fresh = st.get("fresh", False)
            if self._fresh_key("block_pre", st["embeds"].shape[0],
                               st["embeds"].shape[1]):
                fresh = True
            return ("block_pre", first, st, len(st["reqs"]),
                    st["embeds"].shape[0], fresh)
        active = self._active_device()
        (
            self.caches, self.tokens, self.cur_lens, self.budget,
            self.temperature, self.top_p, self.rng, packed,
        ) = self._block_jit(
            self.params, self.cfg, self.attn_impl, self.prefill_act_int8,
            self.decode_chunk,
            self.caches, self.tokens, self.cur_lens, active,
            self.temperature, self.top_p,
            self._eos_dev, self.budget,
            st["write_rows"], st["embeds"], st["seq_dev"],
            st["temp"], st["topp"], st["budget_a"], self.rng,
            mesh=self.mesh,
        )
        self.mixed_rounds_run += 1
        self._pending_mixed = None
        fresh = st.get("fresh", False)
        if self._fresh_key("block", st["embeds"].shape[0],
                           st["embeds"].shape[1]):
            fresh = True
        # Anatomy fields: actual admitted rows vs padded family size — the
        # (kb, a) pair quantifies block-round padding waste (pad rows
        # COMPUTE their full prompt FLOPs).
        return ("block", packed, st, len(st["reqs"]),
                st["embeds"].shape[0], fresh)

    def _dispatch_mixed(self):
        """Dispatch one fused serving round WITHOUT blocking: all decode
        slots advance decode_chunk steps AND the pending admission consumes
        decode_chunk*npt prompt tokens — a single jit'd executable, so
        admission never blocks decode (VERDICT r1 item 1).  When this round
        consumes the admission's last prompt chunk, the pending slot is
        cleared immediately so the NEXT admission's host prep can overlap
        this round on the device."""
        st = self._pending_mixed
        npt = st["npt"]
        c = self.decode_chunk * npt
        o = st["o"]
        cache_len = self.caches[0][0].shape[2]
        kv_limit = min(cache_len, -(-min(o + c, st["t_pad"]) // 512) * 512)
        emb_slice = self._slice_jit(st["embeds"], jnp.int32(o), c=c)
        active = self._active_device()
        (
            self.caches, self.tokens, self.cur_lens, self.budget,
            st["last_hidden"], self.rng, packed,
        ) = self._mixed_jit(
            self.params, self.cfg, self.attn_impl, self.decode_chunk,
            npt, kv_limit,
            self.caches, self.tokens, self.cur_lens, active,
            self.temperature, self.top_p,
            self._eos_dev, self.budget,
            st["adm_slots"], st["adm_write_rows"], emb_slice, jnp.int32(o),
            st["seq_dev"], st["last_hidden"], self.rng,
            mesh=self.mesh,
        )
        st["o"] = o + c
        self.mixed_rounds_run += 1
        fresh = st.pop("fresh", False)
        if self._fresh_key("mixed", st["embeds"].shape[0], npt, kv_limit):
            fresh = True
        finalize = None
        if st["o"] >= st["t_pad"]:
            finalize = st
            self._pending_mixed = None
        return ("mixed", packed, finalize, st["embeds"].shape[0], npt, fresh)

    def _complete_round(self, handle) -> None:
        """Block on the dispatched round's packed result and apply it; for
        the final chunk of an admission, sample the first tokens and
        activate the admitted slots."""
        kind, packed, finalize = handle[0], handle[1], handle[2]
        arr = np.asarray(packed)
        if kind == "block_pre":
            # Early-emit block admission: the fetched array IS the (A,)
            # first tokens — stream them now; the admitted rows decode in
            # the next (pure-decode) round.  Device state for the rows was
            # merged in-round; liveness is host-recomputed per request.
            self._finalize_admission(finalize["reqs"], finalize["slots"],
                                     finalize["keep_rows"], arr,
                                     device_synced=True)
            return
        if kind == "block":
            # (B, chunk+2): emitted | live | first-token column (sampled
            # in-round — no extra device call or fetch).  Finalize FIRST:
            # the scan already decoded the admitted rows this round, so
            # their slots must be live_host before _process_emitted appends
            # their scan tokens (after the finalize-appended first token).
            self._finalize_admission(finalize["reqs"], finalize["slots"],
                                     finalize["keep_rows"], arr[:, -1],
                                     device_synced=True)
            self._process_emitted(arr[:, :-2], arr[:, -2].astype(bool))
            return
        self._process_emitted(arr[:, :-1], arr[:, -1].astype(bool))
        if finalize is not None:
            st = finalize
            first = self._sample_first_jit(
                self.params, self.cfg, st["last_hidden"], st["temp"],
                st["topp"], st["key"], mesh=self.mesh,
            )
            self._finalize_admission(st["reqs"], st["slots"],
                                     st["keep_rows"], first)

    def _finish(self, slot: int, reason: str) -> None:
        req = self.slots[slot]
        if req is not None:
            req.finish_reason = reason
            req.finished_s = time.perf_counter()
            self.total_output_tokens += len(req.output_tokens)
            self.metrics.record_request(req)
            req.stream_queue.put(None)
        self.slots[slot] = None
        self.live_host[slot] = False
        self._finished_total += 1

    def _active_device(self):
        key = self.live_host.tobytes()
        if self._active_key != key:
            self._active_dev = jnp.asarray(self.live_host)
            self._active_key = key
        return self._active_dev

    def _dispatch_decode(self):
        active = self._active_device()
        (
            self.caches, self.tokens, self.cur_lens, self.budget,
            self.rng, packed
        ) = self._decode_jit(
            self.params, self.cfg, self.attn_impl, self.decode_chunk,
            self.pad_id,
            self.caches, self.tokens, self.cur_lens, active,
            self.temperature, self.top_p,
            self._eos_dev, self.budget, self.rng,
            mesh=self.mesh,
        )
        return ("decode", packed, None, 0, 0,
                self._fresh_key("decode", self.decode_chunk))

    def _dispatch_round(self):
        """Dispatch the next device round (non-blocking); None when idle."""
        # Honor cancellations before spending device time.
        for slot, req in enumerate(self.slots):
            if req is not None and req.cancelled and self.live_host[slot]:
                self._finish(slot, "cancelled")
        if self._pending_mixed is not None:
            if self._pending_mixed.get("mode") == "block":
                return self._dispatch_block()
            return self._dispatch_mixed()
        if self.live_host.any():
            return self._dispatch_decode()
        return None

    def _process_emitted(self, emitted_host: np.ndarray,
                         live_host: np.ndarray) -> None:
        for slot, req in enumerate(self.slots):
            if req is None or not self.live_host[slot]:
                continue
            eos = set(self.eos_token_ids) | set(req.params.stop_token_ids)
            toks = [int(t) for t in emitted_host[slot] if t >= 0]
            out = []
            finished = None
            for t in toks:
                if t in eos:
                    finished = "stop"
                    break
                out.append(t)
            if out:
                req.output_tokens.extend(out)
                req.stream_queue.put(out)
                self.streamed_tokens += len(out)
            if finished is None and not live_host[slot]:
                finished = "length"
            if finished:
                self._finish(slot, finished)

    def _loop(self) -> None:
        """Engine loop: dispatch the device round, block on its result,
        THEN stage the next admission (complete -> admit -> dispatch).

        Admission staging runs AFTER round completion on purpose: the
        staged block admission dispatches as the very next round, and —
        admit-then-decode — its rows decode in that round, so a slot freed
        in round N is decoding its replacement in round N+1.  The previous
        pipelined order (stage before completing the in-flight round)
        overlapped ~10-30 ms of admission host prep with the device round
        but staged BEFORE round N's finishes were visible, so every
        replacement missed a full extra round (~32 slot-steps per churn
        row, ~5 rows/round at saturation — the bulk of mean_live 22/32).
        A bounded grace (admit_grace_s) after a round that freed slots
        lets closed-loop clients' replacement submissions land in the
        same admission wave."""
        while not self._stop.is_set():
            try:
                t0 = time.perf_counter()
                n_live = int(self.live_host.sum())
                tok0 = self.streamed_tokens
                handle = self._dispatch_round()
                if handle is None:
                    if not self.waiting.empty():
                        # Idle device: monolithic admission (or staging of
                        # a long-prompt mixed admission) runs here.
                        a0 = time.perf_counter()
                        self._admit()
                        self._event("idle_admit",
                                    time.perf_counter() - a0)
                    elif (self._pending_mixed is None
                          and not self.live_host.any()):
                        self._wake.wait(timeout=0.05)
                        self._wake.clear()
                    continue
                fin0 = self._finished_total
                self._complete_round(handle)
                t_done = time.perf_counter()
                self._event(f"round_{handle[0]}", t_done - t0,
                            fresh=handle[5])
                if self._pending_mixed is None:
                    if self._finished_total > fin0:
                        # Wait for a replacement PER freed slot, not just the
                        # first arrival: closed-loop clients notice finishes
                        # a few ms apart, and a replacement that misses this
                        # wave idles its slot a full round (~750 ms at
                        # saturation).  Exiting on the first submission left
                        # the other ~freed-1 slots empty for a round — the
                        # dominant term of the measured mean_live 22/32.
                        want = min(self._finished_total - fin0,
                                   self._a_bucket)
                        grace = time.perf_counter() + self.admit_grace_s
                        while (self.waiting.qsize() < want
                               and time.perf_counter() < grace):
                            time.sleep(0.0005)
                    if not self.waiting.empty():
                        self._admit()
                # Block rounds decode their admitted rows in the same
                # round (admit-then-decode), so they count as live.
                rows_live = n_live + (
                    handle[3] if handle[0] == "block" else 0)
                t_end = time.perf_counter()
                self._event("post_round_admit", t_end - t_done,
                            kind=handle[0])
                with self._round_log_lock:
                    self.round_log.append({
                        "kind": handle[0],
                        "admit_s": t_end - t_done,
                        "round_s": t_done - t0,
                        "live": rows_live, "a": handle[3],
                        "npt": handle[4],
                        "emitted": self.streamed_tokens - tok0,
                        "fresh": handle[5],
                        # Host time since the previous round ended — loop
                        # starvation (the r3 driver pathology) shows up HERE,
                        # not in round_s.
                        "gap_s": t0 - self._last_round_end,
                    })
                self._last_round_end = t_end
            except Exception as err:  # engine must survive a bad step:
                # fail every in-flight request with the error and keep
                # serving (the reference's worker pool dies silently here —
                # llm_utils.py:187-190; we recover instead).
                import traceback

                traceback.print_exc()
                self._pending_mixed = None
                for slot, req in enumerate(self.slots):
                    if req is not None:
                        req.error = f"engine step failed: {err}"
                        req.stream_queue.put(None)
                        self.slots[slot] = None
                self.live_host[:] = False

    # -- metrics -----------------------------------------------------------

    def round_snapshot(self) -> list:
        """Thread-safe copy of the round-anatomy ring buffer."""
        with self._round_log_lock:
            return list(self.round_log)

    def stats(self) -> Dict[str, Any]:
        out = {
            "active_slots": int(self.live_host.sum()),
            "max_batch_size": self.max_batch_size,
            "waiting": self.waiting.qsize(),
            "total_requests": self.total_requests,
            "total_output_tokens": self.total_output_tokens,
        }
        # Round anatomy (device rounds by kind over the ring buffer).
        import collections

        agg: Dict[str, list] = collections.defaultdict(
            lambda: [0, 0.0, 0, 0, 0.0])
        for r in self.round_snapshot():
            g = agg[r["kind"]]
            g[0] += 1
            g[1] += r["round_s"]
            g[2] += r["emitted"]
            g[3] += int(r["fresh"])
            g[4] += r["gap_s"]
        for kind, (n, rnd, emitted, fresh, gap) in agg.items():
            out[f"rounds_{kind}"] = n
            out[f"round_{kind}_mean_ms"] = round(rnd / n * 1e3, 1)
            out[f"round_{kind}_tokens"] = emitted
            if fresh:
                out[f"rounds_{kind}_fresh"] = fresh
        out["round_gap_total_s"] = round(
            sum(g[4] for g in agg.values()), 2)
        out["slow_events"] = len(self.events)
        out.update(self.metrics.summary())
        return out
