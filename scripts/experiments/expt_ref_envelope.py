"""Reference serving envelope on one v5e chip (VERDICT r3 item 3).

The reference serves max_model_len 6000 (reference:
scripts/start_vllm_server.sh:6) and evaluates with prompts of 1-30 series
of 64-1024 points at max_tokens 512 / temperature 0.2 (reference:
chatts/utils/inference_tsmllm_vllm.py:38-46).  This experiment runs that
envelope END-TO-END through the serving engine at the ChatTS-8B shape:
cap 6144, c32 slots, int8 KV (bf16 KV at c32/cap6144 is 11.3 GB — it
cannot board; the post-scale-factoring ragged int8 kernel is now FASTER
than bf16 at equal batch, BENCHMARKS.md r4), int4 weights, block/mixed
admission with length-classed pad-to-class waves (open prompt-length
traffic compiles {classes} x {families} admission shapes by construction).

Two phases, one engine:
  S. saturated closed loop (ramp + 60 s window)  -> aggregate tok/s,
     TTFT p50/p90, round anatomy
  E. eval batch (N samples submitted at once)    -> samples/min/chip,
     output tok/s — the configs[2] analog at the REAL envelope

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/expt_ref_envelope.py
Env:  REF_TINY=1 CPU smoke shape; REF_N eval-batch size (default 48);
      REF_WINDOW saturation window seconds (default 60); REF_PHASES
      subset of "SE" (default both).
"""
import collections
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from chatts_tpu.utils import compile_cache


def build_cfg(tiny: bool):
    from chatts_tpu.core.config import (ChatTSConfig, QwenConfig,
                                        TSEncoderConfig)

    vocab = 512 if tiny else 152064
    if tiny:
        llm = QwenConfig(vocab_size=vocab, hidden_size=128,
                         intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=32, rope_theta=1e6, attention_bias=True,
                         dtype="float32")
    else:
        llm = QwenConfig(vocab_size=vocab, hidden_size=3584,
                         intermediate_size=18944, num_hidden_layers=28,
                         num_attention_heads=28, num_key_value_heads=4,
                         head_dim=128, rope_theta=1e6, attention_bias=True,
                         dtype="bfloat16")
    return ChatTSConfig(
        llm=llm,
        ts=TSEncoderConfig(patch_size=16, num_layers=2 if tiny else 5,
                           hidden_size=llm.hidden_size,
                           max_sequence_length=4096),
        ts_token_start_index=vocab - 10,
    )


class _Tok:
    pad_token_id = 0
    eos_token_id = 1

    def __init__(self, vocab):
        self.vocab = vocab

    def encode(self, text, add_special_tokens=False):
        return [10 + (sum(w.encode()) * 31 + len(w)) % (self.vocab - 100)
                for w in text.split()]


def make_workload(proc, cap, max_tokens, tiny):
    """Reference eval prompt mix: 1-30 series of 64-1024 points each
    (reference: chatts/utils/inference_tsmllm_vllm.py configs[2]/[3]),
    trimmed so prompt + max_tokens always fits the cap."""
    from chatts_tpu.core import encoding
    from chatts_tpu.serve.scheduler import Request, SamplingParams

    lens = (16, 32) if tiny else (64, 128, 256, 512, 1024)
    max_series = 4 if tiny else 30

    def mkreq(rng):
        n_series = int(rng.integers(1, max_series + 1))
        ls = rng.choice(lens, n_series)
        while True:
            series = [rng.normal(0, 3, int(L)).cumsum() + rng.normal(0, 40)
                      for L in ls]
            holes = " ".join(encoding.TS_PAIR for _ in series)
            prompt = (
                f"system: you are a time-series analyst. user: here are "
                f"{len(series)} metrics {holes} — describe the trend, any "
                f"local changes with their positions and amplitudes, the "
                f"noise level, and whether the metrics correlate. answer "
                f"in the structured format."
            )
            n_tok = proc.count_tokens(prompt, series)
            if n_tok + max_tokens + 8 <= cap:
                return Request(prompt, series, SamplingParams(
                    max_tokens=max_tokens, temperature=0.2))
            ls = ls[: max(1, len(ls) - 4)]  # too long: shed series

    return mkreq


def warm_workload(engine, mkreq, rng, warm_tokens):
    """Compile the workload's admission keys: one full cohort, then every
    block-family rung (short outputs — prompt shapes drive the keys)."""
    from chatts_tpu.serve.scheduler import Request, SamplingParams

    def short(r):
        return Request(r.prompt, r.timeseries,
                       SamplingParams(max_tokens=warm_tokens, temperature=0.2))

    t0 = time.perf_counter()
    pre = [short(mkreq(rng)) for _ in range(engine.max_batch_size)]
    for r in pre:
        engine.submit(r)
    deadline = time.time() + 2400
    live = list(pre)
    rungs = sorted({f for f in (1, 2, 3, 4, 6, 8) if f <= engine._a_bucket},
                   reverse=True)
    for n in rungs:
        gate = time.time() + 600
        while len(engine._free_slots()) < n:
            if time.time() > gate:
                print(f"  warmup rung {n} gate timed out", flush=True)
                break
            time.sleep(0.05)
        batch = [short(mkreq(rng)) for _ in range(n)]
        for r in batch:
            engine.submit(r)
        live += batch
        while not engine.waiting.empty():
            if time.time() > gate:
                break
            time.sleep(0.05)
    while any(r.finished_s is None and r.error is None for r in live):
        if time.time() > deadline:
            print("  workload warmup timed out", flush=True)
            break
        time.sleep(0.05)
    errs = [r.error for r in live if r.error]
    print(f"workload warmup: {time.perf_counter() - t0:.1f}s over "
          f"{len(live)} reqs; errors={len(errs)}"
          f"{' first=' + errs[0][:120] if errs else ''}", flush=True)


def phase_saturation(engine, mkreq, window_s, tiny):
    stop = threading.Event()
    window_open = threading.Event()
    lock = threading.Lock()
    admitted: list = []
    rng = np.random.default_rng(11)

    def loadgen():
        inflight = [mkreq(rng) for _ in range(engine.max_batch_size)]
        for r in inflight:
            engine.submit(r)
        while not stop.is_set():
            for i, r in enumerate(inflight):
                if r.finished_s is not None or r.error is not None:
                    nr = mkreq(rng)
                    engine.submit(nr)
                    inflight[i] = nr
                    with lock:
                        if window_open.is_set():
                            admitted.append(nr)
            time.sleep(0.002)

    gen = threading.Thread(target=loadgen, daemon=True)
    gen.start()
    time.sleep(5 if tiny else 30)  # ramp: fill slots, flush cold compiles
    if not tiny:
        # Compile-aware ramp extension: open prompt-length traffic compiles
        # {class} x {family} admission shapes; hold the window until the
        # last 5 rounds are non-fresh (cap 600 s — a cold host cache needs
        # most of the ladder; the persistent compile cache makes rerun
        # ramps short).
        ramp0 = time.time()
        last_tok, last_t = engine.streamed_tokens, time.time()
        while time.time() - ramp0 < 600:
            recent = engine.round_snapshot()[-5:]
            if len(recent) >= 5 and not any(r["fresh"] for r in recent):
                break
            if engine.streamed_tokens != last_tok:
                last_tok, last_t = engine.streamed_tokens, time.time()
            elif time.time() - last_t > 90:
                print("ramp: no streaming progress for 90 s — engine is "
                      "sick (OOM?), not compiling; aborting the hold",
                      flush=True)
                break
            time.sleep(2)
        print(f"ramp extension: {time.time() - ramp0:.1f}s", flush=True)
    engine.round_log.clear()
    base = engine.streamed_tokens
    window_open.set()
    w0 = time.perf_counter()
    time.sleep(window_s)
    elapsed = time.perf_counter() - w0
    toks = engine.streamed_tokens - base
    rl = engine.round_snapshot()
    window_open.clear()
    stop.set()
    gen.join(timeout=10)

    agg = collections.defaultdict(lambda: [0, 0.0, 0.0, 0, 0])
    for r in rl:
        g = agg[r["kind"]]
        g[0] += 1
        g[1] += r["admit_s"]
        g[2] += r["round_s"]
        g[3] += r["emitted"]
        g[4] += r["live"]
    round_ms = sorted(r["round_s"] * 1e3 for r in rl)
    med = round_ms[len(round_ms) // 2] if round_ms else float("nan")
    outliers = [round(m, 1) for m in round_ms if m > 5 * med]
    with lock:
        ttfts = sorted(r.ttft_s for r in admitted if r.ttft_s is not None)
    pct = (lambda q: float(ttfts[min(len(ttfts) - 1,
                                     int(q * len(ttfts)))]) * 1e3
           if ttfts else float("nan"))
    kv = str(np.dtype(engine.cache_dtype).name if hasattr(engine, "cache_dtype")
             else "?")
    print(f"SATURATION cap={engine.max_model_len} c{engine.max_batch_size} "
          f"{kv}-KV: {toks} tok in {elapsed:.1f}s -> "
          f"{toks / elapsed:.1f} tok/s; TTFT p50 {pct(0.5):.0f} ms "
          f"p90 {pct(0.9):.0f} ms (n={len(ttfts)}); rounds median "
          f"{med:.0f} ms, >5x-median outliers {outliers[:8]}", flush=True)
    for k, (n, adm, rnd, emit, lv) in sorted(agg.items()):
        print(f"  {k}: n={n} admit={adm:.2f}s round={rnd:.2f}s "
              f"ms/round={rnd / max(n, 1) * 1e3:.1f} emitted={emit} "
              f"mean_live={lv / max(n, 1):.1f}", flush=True)


def phase_eval_batch(engine, mkreq, n_samples):
    rng = np.random.default_rng(23)
    reqs = [mkreq(rng) for _ in range(n_samples)]
    t0 = time.perf_counter()
    for r in reqs:
        engine.submit(r)
    deadline = time.time() + 3600
    while any(r.finished_s is None and r.error is None for r in reqs):
        if time.time() > deadline:
            print("  eval batch TIMEOUT", flush=True)
            break
        time.sleep(0.05)
    wall = time.perf_counter() - t0
    done = sum(1 for r in reqs if r.finished_s is not None)
    toks = sum(len(r.output_tokens) for r in reqs)
    errs = [r.error for r in reqs if r.error]
    print(f"EVAL BATCH cap={engine.max_model_len}: {done}/{n_samples} "
          f"samples in {wall:.1f}s -> {done / wall * 60:.1f} "
          f"samples/min/chip, {toks / wall:.0f} output tok/s "
          f"(max_tokens 512, temp 0.2); errors={len(errs)}"
          f"{' first=' + errs[0][:120] if errs else ''}", flush=True)


def main():
    tiny = os.environ.get("REF_TINY") == "1"
    phases = os.environ.get("REF_PHASES", "SE")
    window_s = float(os.environ.get("REF_WINDOW", "8" if tiny else "60"))
    n_eval = int(os.environ.get("REF_N", "6" if tiny else "48"))
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import ServeEngine

    cfg = build_cfg(tiny)
    t0 = time.perf_counter()
    if tiny:
        from chatts_tpu.models import chatts

        params = quantize.quantize_params(
            chatts.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32), bits=4)
    else:
        params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                                fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    # Canonical TS buckets: the reference mix (1-30 series of 64-1024
    # points) otherwise keys a fresh admission-embed compile per
    # (series-count, series-len) bucket combo — measured pass 3: ~30 s of
    # admit_s per 60 s window was embed compiles arriving all window long.
    # Flooring count (8-row wave x 30 series -> 256) and length (1024)
    # collapses the embed key space to one shape per (family, class).
    proc = ChatTSProcessor(_Tok(cfg.llm.vocab_size), cfg,
                           series_count_floor=8 if tiny else 256,
                           series_len_floor=32 if tiny else 1024)
    cap = 512 if tiny else 6144
    max_tokens = 32 if tiny else 512
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=8 if tiny else 32,
        max_model_len=cap,
        cache_dtype=jnp.float32 if tiny else jnp.int8,
        decode_chunk=4 if tiny else 32,
        fuse=False,
        attn_impl="xla" if tiny else "auto",
        admission_pad_to_class=True,
    )
    mkreq = make_workload(proc, cap, max_tokens, tiny)

    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(128,) if tiny else (256,),
                  series_per_request=2, series_len=128 if tiny else 256)
    print(f"generic warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    warm_workload(engine, mkreq, np.random.default_rng(5),
                  warm_tokens=8 if tiny else 40)

    if "S" in phases:
        phase_saturation(engine, mkreq, window_s, tiny)
    if "E" in phases:
        phase_eval_batch(engine, mkreq, n_eval)
    engine.stop()


if __name__ == "__main__":
    main()
