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
"""
from __future__ import annotations

import dataclasses
import functools
import queue
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

    @property
    def ttft_s(self) -> Optional[float]:
        if self.first_token_s is None:
            return None
        return self.first_token_s - self.created_s


def _prefill_one(
    params,
    cfg: ChatTSConfig,
    attn_impl: str,
    caches,  # persistent big caches, donated
    slot,  # scalar int32
    input_ids,  # (1, T)
    positions,  # (1, T)
    seq_len,  # (1,)
    ts_values,
    ts_mask,
    scatter_seq,
    scatter_tok,
    temperature,  # (1,) float32
    top_p,  # (1,) float32
    rng,
):
    """Prefill one request into cache slot ``slot``; returns updated caches
    and the first sampled token."""
    t = input_ids.shape[1]
    embeds = chatts.input_embeddings(
        params, cfg, input_ids, ts_values, ts_mask, scatter_seq, scatter_tok
    )
    kv_positions = jnp.arange(t, dtype=jnp.int32)[None]
    kv_valid = kv_positions < seq_len[:, None]
    # Self-contained prefill over the T block; collect per-layer K/V.
    small_caches = [
        (
            jnp.zeros((1, c[0].shape[1], t, c[0].shape[3]), c[0].dtype),
            jnp.zeros((1, c[1].shape[1], t, c[1].shape[3]), c[1].dtype),
        )
        for c in caches
    ]
    hidden, small_caches = qwen.forward(
        params["llm"], cfg.llm, embeds, positions,
        kv_caches=small_caches, write_pos=None,
        kv_valid=kv_valid, kv_positions=kv_positions,
        attn_impl=attn_impl,
    )
    # Insert the prompt K/V into the persistent cache at the slot row.
    new_caches = []
    for (big_k, big_v), (small_k, small_v) in zip(caches, small_caches):
        big_k = jax.lax.dynamic_update_slice(
            big_k, small_k.astype(big_k.dtype), (slot, 0, 0, 0)
        )
        big_v = jax.lax.dynamic_update_slice(
            big_v, small_v.astype(big_v.dtype), (slot, 0, 0, 0)
        )
        new_caches.append((big_k, big_v))

    last = jnp.take_along_axis(
        hidden, (seq_len - 1)[:, None, None].astype(jnp.int32), axis=1
    )
    logits = chatts.compute_logits(params, cfg, last)[:, 0]
    token = sampling.sample_per_slot(logits, rng, temperature, top_p)[0]
    return new_caches, token


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
):
    """Advance every active slot ``chunk_size`` decode steps on device.

    Emits (B, chunk) tokens; -1 marks steps where a slot was inactive or
    finished.  Finishing conditions (EOS or budget exhausted) are evaluated
    on device so the host syncs once per chunk.
    """
    b = tokens.shape[0]
    cache_len = caches[0][0].shape[2]
    kv_positions = jnp.tile(jnp.arange(cache_len, dtype=jnp.int32)[None], (b, 1))

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
        )
        logits = chatts.compute_logits(params, cfg, hidden)[:, 0]
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
    return caches, tokens, cur_lens, live, budget_left, emitted.T  # (B, chunk)


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
    ):
        if fuse:
            params = chatts.maybe_fuse(params)
        self.params = params
        self.cfg = cfg
        self.processor = processor
        self.max_batch_size = max_batch_size
        self.max_model_len = max_model_len
        self.decode_chunk = decode_chunk
        self.attn_impl = attn_impl
        self.eos_token_ids = tuple(eos_token_ids)
        self.pad_id = processor.pad_token_id

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

        self._prefill_jit = jax.jit(
            _prefill_one,
            static_argnames=("cfg", "attn_impl"),
            donate_argnames=("caches",),
        )
        self._decode_jit = jax.jit(
            _decode_all_slots,
            static_argnames=("cfg", "attn_impl", "chunk_size", "pad_id"),
            donate_argnames=("caches",),
        )

        self.waiting: "queue.Queue[Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        # Metrics.
        self.total_requests = 0
        self.total_output_tokens = 0
        from chatts_tpu.utils.profiling import MetricsAggregator

        self.metrics = MetricsAggregator()

    # -- public API --------------------------------------------------------

    def warmup(self, prefill_buckets: Sequence[int] = (128, 256, 512)) -> None:
        """Pre-compile the decode step and the standard prefill buckets so the
        first real request doesn't pay multi-second jit latency (cold-start
        finding from live verification)."""
        import numpy as np

        from chatts_tpu.core import encoding

        self.start()
        for bucket in sorted(prefill_buckets):
            # ~1 token per short word; leave headroom for the template + TS
            # placeholders so the padded length lands in this bucket.
            words = " ".join("warm" for _ in range(max(1, bucket - 32)))
            prompt = f"{words} {encoding.TS_PAIR}"
            try:
                self.generate_sync(
                    prompt, [np.arange(float(self.cfg.ts.patch_size * 4))],
                    SamplingParams(max_tokens=self.decode_chunk + 2,
                                   temperature=0.0),
                )
            except Exception as err:
                print(f"[warmup] bucket {bucket} failed: {err}")

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

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is None]

    def _admit(self) -> None:
        free = self._free_slots()
        while free and not self.waiting.empty():
            try:
                req = self.waiting.get_nowait()
            except queue.Empty:
                break
            slot = free.pop(0)
            try:
                self._prefill_request(slot, req)
            except Exception as err:  # reject the request, keep serving
                req.error = f"{type(err).__name__}: {err}"
                req.stream_queue.put(None)
                self.slots[slot] = None
                self.live_host[slot] = False

    def _prefill_request(self, slot: int, req: Request) -> None:
        batch = self.processor([req.prompt], req.timeseries)
        t = batch.input_ids.shape[1]
        if int(batch.seq_lens[0]) + req.params.max_tokens > self.max_model_len:
            raise ValueError(
                f"prompt ({int(batch.seq_lens[0])}) + max_tokens "
                f"({req.params.max_tokens}) exceeds max_model_len "
                f"{self.max_model_len}"
            )
        req.prompt_tokens = int(batch.seq_lens[0])

        self.rng, key = jax.random.split(self.rng)
        temp = jnp.asarray([req.params.temperature], jnp.float32)
        topp = jnp.asarray([req.params.top_p], jnp.float32)
        self.caches, first = self._prefill_jit(
            self.params, self.cfg, self.attn_impl, self.caches,
            jnp.int32(slot),
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.positions),
            jnp.asarray(batch.seq_lens),
            jnp.asarray(batch.ts_values),
            jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq),
            jnp.asarray(batch.scatter_tok),
            temp, topp, key,
        )
        first_host = int(first)
        req.first_token_s = time.perf_counter()

        eos = set(self.eos_token_ids) | set(req.params.stop_token_ids)
        self.slots[slot] = req
        if first_host in eos or req.params.max_tokens <= 1:
            if first_host not in eos:
                req.output_tokens.append(first_host)
                req.stream_queue.put([first_host])
            self._finish(slot, "stop" if first_host in eos else "length")
            return
        req.output_tokens.append(first_host)
        req.stream_queue.put([first_host])
        self.live_host[slot] = True
        self.tokens = self.tokens.at[slot].set(first_host)
        self.cur_lens = self.cur_lens.at[slot].set(req.prompt_tokens)
        self.temperature = self.temperature.at[slot].set(req.params.temperature)
        self.top_p = self.top_p.at[slot].set(req.params.top_p)
        self.budget = self.budget.at[slot].set(req.params.max_tokens - 1)

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

    def _decode_round(self) -> None:
        eos_list = list(self.eos_token_ids) or [-1]
        self.rng, key = jax.random.split(self.rng)
        active = jnp.asarray(self.live_host)
        (
            self.caches, self.tokens, self.cur_lens, live, self.budget, emitted
        ) = self._decode_jit(
            self.params, self.cfg, self.attn_impl, self.decode_chunk,
            self.pad_id,
            self.caches, self.tokens, self.cur_lens, active,
            self.temperature, self.top_p,
            jnp.asarray(eos_list, jnp.int32), self.budget, key,
        )
        emitted_host = np.asarray(emitted)
        live_host = np.asarray(live)
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
            if finished is None and not live_host[slot]:
                finished = "length"
            if finished:
                self._finish(slot, finished)

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._admit()
                if self.live_host.any():
                    self._decode_round()
                else:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
            except Exception as err:  # engine must survive a bad step:
                # fail every in-flight request with the error and keep
                # serving (the reference's worker pool dies silently here —
                # llm_utils.py:187-190; we recover instead).
                import traceback

                traceback.print_exc()
                for slot, req in enumerate(self.slots):
                    if req is not None:
                        req.error = f"engine step failed: {err}"
                        req.stream_queue.put(None)
                        self.slots[slot] = None
                self.live_host[:] = False

    # -- metrics -----------------------------------------------------------

    def stats(self) -> Dict[str, Any]:
        out = {
            "active_slots": int(self.live_host.sum()),
            "max_batch_size": self.max_batch_size,
            "waiting": self.waiting.qsize(),
            "total_requests": self.total_requests,
            "total_output_tokens": self.total_output_tokens,
        }
        out.update(self.metrics.summary())
        return out
