"""Benchmark: ChatTS-8B-shape serving throughput on ONE real TPU chip.

Headline configuration (the north star's serving shape, VERDICT r1 item 2):
Qwen2.5-7B-class backbone (hidden 3584, 28 layers, 28 heads / 4 KV heads,
intermediate 18944, vocab 152064) + 5-layer TS encoder — random weights in
the int4 serving layout (nibble-packed, group-128 scales, Pallas
native-ingest matmul), bf16 KV cache (faster than int8 KV at this
shape/capacity; int8 KV is the cap-6144 capacity play), ServeEngine at
concurrency 32 with the fused mixed prefill+decode step (admissions never
stall decode).

Measured phases (requests: two sp-encoded series of 256+512 points,
~512-token prompts, greedy):
  A. decode-only tokens/sec at c32 (all slots live, no admissions) — the
     headline `value`, directly comparable to r1's 8B int8 2,230 tok/s.
  B. p50 TTFT at admission-burst 8 on a warm engine — r1's TTFT
     definition (a request prefills with its arrival burst).
  B2. single-request TTFT on a warm idle engine (1-row admission bucket).
  C. saturated closed loop (finished requests replaced immediately;
     admissions run as early-emit block rounds: a prefill-only executable
     streams first tokens immediately, admitted rows join the next decode
     round — CHATTS_BENCH_EE=0 reverts to the fused admit-then-decode
     round) — serving aggregate tok/s including ALL prefill FLOPs, the
     under-load TTFT distribution, and the round-anatomy table (per-kind
     round counts/durations).
  D. (subprocess, budget permitting) ChatTS-14B shape int4 on the same
     chip: c8/c16 decode, single/burst TTFT, short saturated window —
     merged into the final JSON under "chatts14b".

Budget discipline (VERDICT r3 item 1 — r3's driver run timed out with no
JSON on stdout): the 8B phases run FIRST and their JSON line prints as soon
as they finish, so a mid-14B kill still leaves a parseable headline on
stdout.  The whole run fits CHATTS_BENCH_BUDGET_S (default 1500 s): the 14B
subprocess gets only the remaining budget (hard subprocess timeout, no full
retry) and is skipped outright — with a note in the JSON — when less than
7 minutes remain.

Degradation sentinels (VERDICT r3 item 2): a cheap in-process 50-matmul
probe re-runs between phases; the saturated window's round anatomy separates
first-use executable keys ("fresh" == compile suspects) from steady-state
rounds and flags non-fresh rounds >5x the window median.  Any tripped
sentinel sets "degraded": true in the JSON instead of silently recording
garbage numbers.

Prints its JSON line on stdout (twice when the 14B phase runs: the early 8B
line, then the merged final line — both parse; the final one supersedes):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
vs_baseline compares phase A against round 1's measured 8B-shape c32 decode
rate (2,230 tok/s/chip, int8 weights) — same shape, same definition, so the
ratio reflects real progress.  Details go to stderr.

CHATTS_BENCH_TINY=1 runs the same three phases on a tiny CPU model (logic
smoke test for the bench itself; the numbers mean nothing).
"""
from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

R1_8B_C32_TOKS = 2230.0  # round-1 8B-shape c32 decode tok/s (BENCHMARKS.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_PROBE = (
    # Detects BOTH failure modes of the tunneled v5e: wedged (hangs -> the
    # subprocess timeout catches it) and degraded (flat ~139 ms/step
    # regardless of workload -> the 50-matmul loop takes ~7 s instead of
    # ~40 ms incl. dispatch).
    "import time, jax, jax.numpy as jnp, numpy as np\n"
    "x = jnp.ones((2048, 2048), jnp.bfloat16)\n"
    "@jax.jit\n"
    "def f(x):\n"
    "    def body(i, y):\n"
    "        return (y @ x) * (1.0 / 2048.0)\n"
    "    return jax.lax.fori_loop(0, 50, body, x)\n"
    "v = float(np.asarray(f(x)[0, 0]))\n"
    "t0 = time.time()\n"
    "v = float(np.asarray(f(x)[0, 0]))\n"
    "dt = time.time() - t0\n"
    "print('probe_time', round(dt, 2))\n"
    "assert dt < 2.0, f'chip degraded: 50 matmuls took {dt:.1f}s'\n"
    "print('probe_ok')\n"
)


def wait_for_healthy_chip(max_wait_s: float = 1200.0) -> bool:
    """The v5e behind the axon tunnel intermittently wedges (simple matmuls
    hang; recovers in ~20-30 min).  Probe it in a SUBPROCESS with a timeout
    before initializing our own client, so a wedged chip delays the bench
    instead of hanging it or recording garbage numbers.  Returns False when
    the wait expired without ever seeing a healthy probe (the caller tags
    the result "degraded" instead of presenting the numbers as healthy)."""
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE],
                capture_output=True, text=True, timeout=240,
            )
            if r.returncode == 0 and "probe_ok" in r.stdout:
                log(f"chip healthy (probe attempt {attempt}): "
                    f"{r.stdout.strip().splitlines()[-1]}")
                return True
            log(f"chip probe attempt {attempt} failed rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"chip probe attempt {attempt} timed out (wedged?)")
        if time.time() > deadline:
            log("chip never became healthy; running anyway")
            return False
        time.sleep(90)


_inproc_probe_fn = None


def probe_inproc(tag: str) -> float:
    """Cheap mid-run degradation sentinel (VERDICT r3 item 2): time the same
    jit'd 50-matmul loop the subprocess probe uses, in THIS process, between
    bench phases.  Healthy chip ~40 ms incl. dispatch; degraded chip (flat
    ~139 ms/step) ~7 s.  Returns elapsed seconds; caller thresholds at 2 s."""
    import jax
    import jax.numpy as jnp

    global _inproc_probe_fn
    if _inproc_probe_fn is None:
        @jax.jit
        def f(x):
            def body(i, y):
                return (y @ x) * (1.0 / 2048.0)
            return jax.lax.fori_loop(0, 50, body, x)

        x = jnp.ones((2048, 2048), jnp.bfloat16)
        float(np.asarray(f(x)[0, 0]))  # compile outside the timed window
        _inproc_probe_fn = (f, x)
    f, x = _inproc_probe_fn
    t0 = time.perf_counter()
    float(np.asarray(f(x)[0, 0]))  # real data fetch — block_until_ready is
    dt = time.perf_counter() - t0  # a weak sync on the axon tunnel
    log(f"probe[{tag}]: {dt * 1e3:.0f} ms"
        + (" DEGRADED" if dt > 2.0 else ""))
    return dt


def bench_14b():
    """ChatTS-14B shape on ONE chip (VERDICT r2 item 3): hidden 5120, 48L,
    40H/8KV, vocab 152k, int4 (~8 GB weights) — the flagship the reference
    ships (README.md:260-263).  Runs in its own process (invoked by main()
    as a subprocess) so its buffers free fully after the 8B phases; prints
    one JSON line consumed by main().

    Budget-aware (VERDICT r3 item 1): CHATTS_BENCH_14B_BUDGET_S caps the
    whole function; each phase is skipped — recorded in out["skipped"] —
    when the remaining budget can't fit it, and the JSON line prints no
    matter which phases ran."""
    import os

    import jax
    import jax.numpy as jnp

    from chatts_tpu.utils import compile_cache

    tiny = os.environ.get("CHATTS_BENCH_TINY") == "1"  # CPU flow smoke
    t_start = time.time()
    budget_s = float(os.environ.get("CHATTS_BENCH_14B_BUDGET_S", "900"))
    deadline_14b = t_start + budget_s

    def rem() -> float:
        return deadline_14b - time.time()

    if tiny:
        # Platform BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()

    from chatts_tpu.core.config import (
        ChatTSConfig,
        QwenConfig,
        TSEncoderConfig,
    )
    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine
    log(f"[14B] devices: {jax.devices()}")
    vocab = 152064 if not tiny else 512
    if tiny:
        cfg = ChatTSConfig(
            llm=QwenConfig(
                vocab_size=vocab, hidden_size=128, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=32, rope_theta=1e6,
                attention_bias=True, dtype="float32",
            ),
            ts=TSEncoderConfig(patch_size=16, num_layers=2, hidden_size=128,
                               max_sequence_length=4096),
            ts_token_start_index=vocab - 10,
        )
    else:
        cfg = ChatTSConfig(
            llm=QwenConfig(
                vocab_size=vocab, hidden_size=5120, intermediate_size=13824,
                num_hidden_layers=48, num_attention_heads=40,
                num_key_value_heads=8, head_dim=128, rope_theta=1e6,
                attention_bias=True, dtype="bfloat16",
            ),
            ts=TSEncoderConfig(patch_size=16, num_layers=5, hidden_size=5120,
                               max_sequence_length=4096),
            ts_token_start_index=vocab - 10,
        )

    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            return [10 + (sum(w.encode()) * 31 + len(w)) % (vocab - 100)
                    for w in text.split()]

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
    log(f"[14B] init int4 params: {time.perf_counter() - t0:.1f}s, "
        f"{quantize.param_bytes(params) / 1e9:.2f} GB on chip")

    proc = ChatTSProcessor(_Tok(), cfg)
    # c16 default; int8 KV at cap 1024 costs ~101 MB/slot (48L x 2 x 8KVH x
    # 128D), so c24 (2.4 GB) still fits beside the 9.4 GB int4 weights —
    # CHATTS_BENCH_14B_C probes that headroom.
    concurrency = int(os.environ.get("CHATTS_BENCH_14B_C", "16"))
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=concurrency, max_model_len=1024,
        # int8 KV: ~9.4 GB of int4 weights + bf16 KV at c16 (6.4 GB) would
        # not fit the 16 GB chip; int8 KV halves the cache (3.2 GB).
        cache_dtype=jnp.int8, decode_chunk=32, fuse=False,
        prefill_act_int8=os.environ.get("CHATTS_BENCH_A8", "0") == "1",
    )
    rng = np.random.default_rng(0)
    filler = " ".join(f"word{i}" for i in range(400))
    prompt = (
        f"system: you are a helpful assistant. user: here are two metrics "
        f"<ts><ts/> and <ts><ts/>. {filler} analyze their local changes."
    )

    def mkreq(budget=None):
        series = [rng.normal(0, 50, 256).cumsum(),
                  rng.normal(0, 5, 512).cumsum()]
        n = budget if budget is not None else int(rng.integers(80, 177))
        return Request(prompt, series,
                       SamplingParams(max_tokens=n, temperature=0.0))

    out: dict = {"skipped": []}
    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(512,), series_per_request=2,
                  series_len=512)
    log(f"[14B] engine warmup: {time.perf_counter() - t0:.1f}s; "
        f"budget left {rem():.0f}s")

    # Workload-shape warmup (cohort + block-family ladder) is only needed by
    # the saturated phase — skip it (and that phase) when the budget can't
    # fit both; decode/TTFT phases compile their own shapes as they go.
    t0 = time.perf_counter()
    did_ladder = tiny or rem() > 420
    if did_ladder:
        pre = [mkreq() for _ in range(concurrency)]
        for r in pre:
            engine.submit(r)
        deadline = time.time() + max(60.0, rem() - 240)
        while not any(r.output_tokens for r in pre):
            if time.time() > deadline:
                break
            time.sleep(0.05)
        extra = []
        for n_b in (8, 6, 4, 3, 2, 1):
            gate = time.time() + min(300, max(30.0, rem() - 200))
            while (len(engine._free_slots()) < n_b
                   or not engine.live_host.any()):
                if time.time() > gate:
                    break
                time.sleep(0.05)
            batch2 = [mkreq() for _ in range(n_b)]
            for r in batch2:
                engine.submit(r)
            extra += batch2
            while not engine.waiting.empty():
                if time.time() > gate:
                    break
                time.sleep(0.05)
        while any(r.finished_s is None and r.error is None
                  for r in pre + extra):
            if time.time() > deadline:
                log("[14B] warmup timed out")
                break
            time.sleep(0.05)
        log(f"[14B] workload warmup: {time.perf_counter() - t0:.1f}s; "
            f"errors: {[r.error for r in pre + extra if r.error][:2]}")
    else:
        out["skipped"].append("ladder")
        log(f"[14B] skipping family ladder ({rem():.0f}s left)")

    def drain(timeout_s=180.0):
        dl = time.time() + timeout_s
        while engine.stats()["active_slots"] > 0 or not engine.waiting.empty():
            if time.time() > dl:
                return
            time.sleep(0.05)

    # decode tok/s at c16 and c8
    for c in (concurrency, 8):
        if not tiny and rem() < 120:
            out["skipped"].append(f"decode_c{c}")
            continue
        deco = [mkreq(350) for _ in range(c)]
        for r in deco:
            engine.submit(r)
        dl = time.time() + min(300, max(30.0, rem() - 60))
        while not all(r.output_tokens or r.error for r in deco):
            if time.time() > dl:
                break
            time.sleep(0.02)
        base = sum(len(r.output_tokens) for r in deco)
        a0 = time.perf_counter()
        while (not any(r.finished_s is not None for r in deco)
               and time.perf_counter() - a0 < 25.0):
            time.sleep(0.05)
        tps = (sum(len(r.output_tokens) for r in deco) - base) / (
            time.perf_counter() - a0)
        out[f"decode_tps_c{c}"] = round(tps, 1)
        log(f"[14B] decode c{c}: {tps:.0f} tok/s; budget left {rem():.0f}s")
        for r in deco:
            r.cancel()
        drain()

    # single-request and burst-8 TTFT (warm)
    if tiny or rem() > 90:
        solo = []
        for trial in range(4):
            r = mkreq(8)
            engine.submit(r)
            dl = time.time() + min(300, max(20.0, rem() - 30))
            while r.ttft_s is None and not r.error:
                if time.time() > dl:
                    break
                time.sleep(0.005)
            if trial > 0 and r.ttft_s is not None:
                solo.append(r.ttft_s)
            r.cancel()
            drain()
        out["ttft_single_ms"] = (round(float(np.median(solo) * 1e3), 1)
                                 if solo else None)
    else:
        out["skipped"].append("ttft_single")
    if tiny or rem() > 90:
        bursts = []
        for trial in range(3):
            reqs = [mkreq(8) for _ in range(8)]
            for r in reqs:
                engine.submit(r)
            dl = time.time() + min(300, max(20.0, rem() - 30))
            while not all(r.ttft_s is not None or r.error for r in reqs):
                if time.time() > dl:
                    break
                time.sleep(0.01)
            if trial > 0:
                bursts.extend(
                    [r.ttft_s for r in reqs if r.ttft_s is not None])
            for r in reqs:
                r.cancel()
            drain()
        out["ttft_burst8_p50_ms"] = (round(float(np.median(bursts) * 1e3), 1)
                                     if bursts else None)
        log(f"[14B] TTFT single {out.get('ttft_single_ms')} ms, "
            f"burst-8 p50 {out.get('ttft_burst8_p50_ms')} ms; "
            f"budget left {rem():.0f}s")
    else:
        out["skipped"].append("ttft_burst8")

    # saturated closed loop, 25 s window (needs the family ladder warm)
    if did_ladder and (tiny or rem() > 150):
        stop = threading.Event()
        err_count = [0]
        first_err = [None]

        def loadgen():
            inflight = [mkreq() for _ in range(concurrency)]
            for r in inflight:
                engine.submit(r)
            while not stop.is_set():
                for i, r in enumerate(inflight):
                    if r.finished_s is not None or r.error is not None:
                        if r.error is not None:
                            err_count[0] += 1
                            if first_err[0] is None:
                                first_err[0] = str(r.error)[:200]
                        nr = mkreq()
                        engine.submit(nr)
                        inflight[i] = nr
                time.sleep(0.002)

        gen = threading.Thread(target=loadgen, daemon=True)
        gen.start()
        # Gate the window on actual streaming progress (a cold block-family
        # compile at the 14B shape can exceed a blind warmup sleep).
        base0 = engine.streamed_tokens
        gate = time.time() + min(240, max(30.0, rem() - 45))
        while engine.streamed_tokens < base0 + 500 and time.time() < gate:
            time.sleep(0.5)
        # ...then hold until the compile storm flushes: the loadgen's
        # family/coalescing pattern reaches block keys the gated warmup
        # ladder missed (r4 forensics: 11 of 15 ramp block rounds were
        # fresh 20-40 s compiles; the non-fresh rounds were a healthy
        # 0.6-1.1 s — the r3 '74 tok/s, 33 s TTFT' 14B saturation was a
        # compile storm, not chip degradation).  Window opens only after
        # 5 consecutive non-fresh rounds (budget-capped).
        hold = time.time() + min(600, max(0.0, rem() - 45))
        while time.time() < hold:
            recent = engine.round_snapshot()[-5:]
            if len(recent) >= 5 and not any(r["fresh"] for r in recent):
                break
            time.sleep(2)
        log(f"[14B] saturated ramp: +{engine.streamed_tokens - base0} "
            f"tokens, stats={engine.stats()}")
        engine.round_log.clear()
        base = engine.streamed_tokens
        w0 = time.perf_counter()
        time.sleep(25)
        agg = (engine.streamed_tokens - base) / (time.perf_counter() - w0)
        stop.set()
        gen.join(timeout=10)
        out["serving_agg_tps"] = round(agg, 1)
        # Window forensics: fresh-key rounds == compiles in the window
        # (warmup coverage gap); non-fresh outliers == chip slowdown.
        window = engine.round_snapshot()
        out["window_fresh_rounds"] = sum(int(r["fresh"]) for r in window)
        if window:
            med = float(np.median([r["round_s"] for r in window]))
            n_out = sum(1 for r in window
                        if not r["fresh"] and r["round_s"] > 5.0 * med)
            if n_out:
                out["degraded"] = True
                out["window_outliers"] = n_out
        log(f"[14B] saturated aggregate: {agg:.0f} tok/s; "
            f"errors={err_count[0]} first_err={first_err[0]}; "
            f"fresh={out['window_fresh_rounds']} "
            f"stats={engine.stats()}")
    else:
        out["skipped"].append("saturated")
    if not tiny and probe_inproc("14B-end") > 2.0:
        out["degraded"] = True
    engine.stop()
    if not out["skipped"]:
        del out["skipped"]
    print(json.dumps(out), flush=True)


def main():
    import os

    tiny = os.environ.get("CHATTS_BENCH_TINY") == "1"  # CPU smoke mode
    if os.environ.get("CHATTS_BENCH_14B") == "1":
        bench_14b()
        return
    # The driver's wall-clock budget is a HARD constraint (r3's run was
    # killed at ~30 min with the headline JSON never printed).  Everything
    # below fits inside CHATTS_BENCH_BUDGET_S: the health wait is capped,
    # the 8B JSON prints the moment the 8B phases finish, and the 14B
    # subprocess gets only what's left.
    t_start = time.time()
    budget_s = float(os.environ.get("CHATTS_BENCH_BUDGET_S", "1500"))
    hard_deadline = t_start + budget_s
    degraded_flags: list = []

    # Last-resort watchdog (VERDICT r3 item 1): if the main thread is stuck
    # inside a device call when the budget expires (a WEDGED chip hangs jit
    # dispatches indefinitely — per-phase deadlines never fire), print
    # whatever partial result exists as a parseable JSON line and exit 0.
    # A degraded-but-parsed record beats r3's rc=124/parsed-null.
    partial: dict = {
        "metric": "decode_tokens_per_sec_per_chip_chatts8b_int4_c32",
        "value": 0.0,
        "unit": "tokens/s/chip",
        "vs_baseline": 0.0,
        "degraded": True,
        "degraded_why": ["watchdog: budget expired mid-phase (chip wedged?)"],
    }
    final_printed = threading.Event()
    children: list = []  # 14B subprocess, killed on emergency exit

    def _watchdog():
        wake = hard_deadline - 60.0
        while time.time() < wake:
            if final_printed.wait(timeout=min(30.0, max(0.5, wake - time.time()))):
                return
        if not final_printed.is_set():
            partial["watchdog_elapsed_s"] = round(time.time() - t_start, 1)
            print(json.dumps(partial), flush=True)
            log("WATCHDOG: budget expired before the bench finished; "
                "emergency JSON emitted, exiting 0")
            for p in children:
                try:
                    p.kill()
                except Exception:
                    pass
            import os as _os

            _os._exit(0)

    if not tiny:
        threading.Thread(target=_watchdog, daemon=True).start()
        if not wait_for_healthy_chip(max_wait_s=min(600.0, budget_s * 0.4)):
            degraded_flags.append("chip never healthy at bench start")
            partial["degraded_why"].append("chip never healthy at bench start")

    def pdl(s: float = 300.0) -> float:
        # Per-phase wait deadline, clamped so a run of timed-out phases on a
        # wedged chip can never stack past the watchdog margin.
        return min(time.time() + s, hard_deadline - 90.0)

    import jax
    import jax.numpy as jnp

    from chatts_tpu.utils import compile_cache

    if tiny:
        # Platform BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    cache_dir = compile_cache.enable()
    log(f"persistent compile cache: {cache_dir}")

    from chatts_tpu.core.config import (
        ChatTSConfig,
        QwenConfig,
        TSEncoderConfig,
    )
    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine

    log(f"devices: {jax.devices()}")

    vocab = 152064 if not tiny else 512
    if tiny:
        cfg = ChatTSConfig(
            llm=QwenConfig(
                vocab_size=vocab, hidden_size=128, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=32, rope_theta=1e6,
                attention_bias=True, dtype="float32",
            ),
            ts=TSEncoderConfig(patch_size=16, num_layers=2, hidden_size=128,
                               max_sequence_length=4096),
            ts_token_start_index=vocab - 10,
        )
    else:
        cfg = ChatTSConfig(
            llm=QwenConfig(
                vocab_size=vocab, hidden_size=3584, intermediate_size=18944,
                num_hidden_layers=28, num_attention_heads=28,
                num_key_value_heads=4, head_dim=128, rope_theta=1e6,
                attention_bias=True, dtype="bfloat16",
            ),
            ts=TSEncoderConfig(patch_size=16, num_layers=5, hidden_size=3584,
                               max_sequence_length=4096),
            ts_token_start_index=vocab - 10,
        )

    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            # Stable across processes (str.__hash__ is randomized per
            # process; stable ids keep bench runs comparable).
            return [10 + (sum(w.encode()) * 31 + len(w)) % (vocab - 100)
                    for w in text.split()]

    t0 = time.perf_counter()
    if tiny:
        # CPU XLA rejects bf16 dots; build f32 params and quantize.
        from chatts_tpu.models import chatts

        params = quantize.quantize_params(
            chatts.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32), bits=4)
    else:
        params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                                fused=True, bits=4)
    params = jax.block_until_ready(params)
    log(f"init 8B int4 params: {time.perf_counter() - t0:.1f}s, "
        f"{quantize.param_bytes(params) / 1e9:.2f} GB on chip")

    proc = ChatTSProcessor(_Tok(), cfg)
    # CHATTS_BENCH_C: serving concurrency A/B knob (c48 fits: 5 GB int4
    # weights + 48 x 58.7 MB bf16 KV at cap 1024 = 2.8 GB on the 16 GB
    # chip).  Churn scales with slots, so the admission bucket widens past
    # 8 rows/round at c>32 (the {10, 12} block-family rungs engage).
    concurrency = int(os.environ.get("CHATTS_BENCH_C", "32"))
    # CHATTS_BENCH_BUCKET: admission-bucket A/B knob (saturation churn at
    # c32 averages ~8 rows/round == the default bucket, so backlog variance
    # never clears; a wider bucket lets catch-up waves land in one round).
    bucket = int(os.environ.get("CHATTS_BENCH_BUCKET",
                                "8" if concurrency <= 32 else "12"))
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=concurrency,
        admission_bucket=bucket,
        max_model_len=1024,
        # bf16 KV: measured faster than int8 KV at the 8B shape (13.1 vs
        # 13.9 ms TPOT at b32 — in-dot dequant doesn't fuse into the dense
        # attention read here), and int4 weights leave plenty of HBM for
        # it at cap 1024.  int8 KV remains the capacity play for cap 6144.
        cache_dtype=jnp.bfloat16,
        # chunk 32 amortizes the tunnel dispatch + host gap (measured
        # 13.67 vs 14.67 ms/tok raw at b32); streaming granularity and
        # saturated TTFT give back ~0.2 s, which phase C reports honestly.
        # With the recent-KV scan the per-step cost is low enough that a
        # longer chunk also lifts saturated tokens/round — A/B via env.
        decode_chunk=int(os.environ.get("CHATTS_BENCH_CHUNK", "32")),
        fuse=False,
        # int8-activation prompt matmuls (v5e MXU int8 = 2x bf16 TOPS).
        prefill_act_int8=os.environ.get("CHATTS_BENCH_A8", "0") == "1",
        # Early first-token emission: measured (r4 grid, 32x8ee) 1,280 tok/s
        # at TTFT p50 408 ms vs the fused round's 1,233-1,311 at 731-753 ms
        # — strictly better latency at equal-or-better throughput.
        block_early_emit=os.environ.get("CHATTS_BENCH_EE", "1") == "1",
    )

    rng = np.random.default_rng(0)
    filler = " ".join(f"word{i}" for i in range(400))
    prompt = (
        f"system: you are a helpful assistant. user: here are two metrics "
        f"<ts><ts/> and <ts><ts/>. {filler} analyze their local changes."
    )

    def mkreq():
        series = [rng.normal(0, 50, 256).cumsum(),
                  rng.normal(0, 5, 512).cumsum()]
        # Staggered budgets (mean 128): identical budgets would finish the
        # whole cohort in synchronized waves, leaving slots idle while the
        # 8-row admission buckets refill serially.
        n = int(rng.integers(80, 177))
        return Request(prompt, series,
                       SamplingParams(max_tokens=n, temperature=0.0))

    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(512,), series_per_request=2,
                  series_len=512)
    log(f"warmup (monolithic + mixed shapes): {time.perf_counter() - t0:.1f}s")

    # Second warmup pass with the REAL workload's requests: the bench prompt
    # lands in a different token bucket than warmup's synthetic prompts, and
    # the monolithic 32-row admission of that bucket would otherwise compile
    # (30-60 s) right at the start of the measurement window.
    t0 = time.perf_counter()
    pre = [mkreq() for _ in range(concurrency)]
    for r in pre:
        engine.submit(r)
    # Warmup must leave room for phases A-C (~250 s) inside the budget.
    deadline = time.time() + 900 if tiny else min(
        time.time() + 900, hard_deadline - 300)
    # Once the cohort is decoding, admit every block-admission family at
    # THIS workload's compile keys (token bucket, series buckets): the
    # engine-level warmup prompts land in a different token bucket (640 vs
    # 512 measured r3), so its compiles never get reused here.  Each burst
    # is GATED on n free slots + live decode so the wave actually admits
    # as the (n)-row family instead of coalescing with whatever slots
    # happen to free up (nondeterministic coverage put 13-17 s first-use
    # compiles inside the r3b measurement window).
    while not any(r.output_tokens for r in pre):
        if time.time() > deadline:
            break
        time.sleep(0.05)
    extra = []
    # Cover every block-family rung the engine can admit with (the ladder
    # widens past 8 when admission_bucket does, e.g. the c48 config).
    rungs = sorted({f for f in (1, 2, 3, 4, 6, 8, 10, 12, engine._a_bucket)
                    if f <= engine._a_bucket}, reverse=True)
    for n in rungs:
        gate = pdl(300)
        while (len(engine._free_slots()) < n
               or not engine.live_host.any()):
            if time.time() > gate:
                log(f"workload warmup: family {n} gate timed out")
                break
            time.sleep(0.05)
        batch2 = [mkreq() for _ in range(n)]
        for r in batch2:
            engine.submit(r)
        extra += batch2
        while not engine.waiting.empty():  # admitted before next family
            if time.time() > gate:
                break
            time.sleep(0.05)
    while any(r.finished_s is None and r.error is None for r in pre + extra):
        if time.time() > deadline:
            log("workload warmup timed out")
            break
        time.sleep(0.05)
    errs = [r.error for r in pre + extra if r.error]
    if errs:
        log(f"workload warmup errors: {errs[:3]}")
    log(f"workload-shape warmup: {time.perf_counter() - t0:.1f}s")
    if not tiny and probe_inproc("post-warmup") > 2.0:
        degraded_flags.append("post-warmup probe")

    def drain(timeout_s=120.0):
        deadline = time.time() + timeout_s
        while engine.stats()["active_slots"] > 0 or not engine.waiting.empty():
            if time.time() > deadline:
                log("drain timed out")
                return
            time.sleep(0.05)

    # --- Phase A: decode throughput at c32 (comparable to r1's 2230) ------
    # Fill every slot, then measure pure decode rate with no admissions.
    deco = []
    for _ in range(concurrency):
        r = mkreq()
        r.params.max_tokens = 350  # fits prompt+budget under cap 1024
        engine.submit(r)
        deco.append(r)
    deadline = pdl(300)
    while not all(r.output_tokens or r.error for r in deco):
        if time.time() > deadline:
            break
        time.sleep(0.02)
    # Measure while ALL slots stay live: stop at the first completion.
    # (total_output_tokens only updates at request completion, so count the
    # streamed per-request token lists directly.)
    base_tokens = sum(len(r.output_tokens) for r in deco)
    a0 = time.perf_counter()
    while (not any(r.finished_s is not None for r in deco)
           and time.perf_counter() - a0 < (8.0 if tiny else 30.0)):
        time.sleep(0.05)
    decode_tps = (sum(len(r.output_tokens) for r in deco) - base_tokens) / (
        time.perf_counter() - a0)
    for r in deco:
        r.cancel()
    drain()
    log(f"phase A: decode-only {decode_tps:.0f} tok/s at c{concurrency}")
    partial.update(value=round(decode_tps, 1),
                   vs_baseline=round(decode_tps / R1_8B_C32_TOKS, 3))

    # --- Phase B: TTFT at admission-burst 8, warm idle engine (r1's TTFT
    # definition: a request prefills with its arrival burst) ---------------
    burst_ttfts: list = []
    for trial in range(2 if tiny else 4):
        reqs = [mkreq() for _ in range(8)]
        for r in reqs:
            engine.submit(r)
        deadline = pdl(300)
        while not all(r.ttft_s is not None or r.error for r in reqs):
            if time.time() > deadline:
                break
            time.sleep(0.01)
        if trial > 0:  # first trial may pay a residual compile
            burst_ttfts.extend(
                [r.ttft_s for r in reqs if r.ttft_s is not None])
        for r in reqs:
            r.cancel()
        drain()
    p50_ttft_ms = (float(np.median(burst_ttfts) * 1e3) if burst_ttfts
                   else float("nan"))
    log(f"phase B: burst-8 TTFT p50 {p50_ttft_ms:.0f} ms "
        f"({len(burst_ttfts)} samples)")

    # --- Phase B2: single-request TTFT on a warm idle engine (isolation
    # latency: the prompt's own ~8 TFLOP of prefill, nothing else) --------
    solo_ttfts: list = []
    for trial in range(3 if tiny else 6):
        r = mkreq()
        engine.submit(r)
        deadline = pdl(300)
        while r.ttft_s is None and not r.error:
            if time.time() > deadline:
                break
            time.sleep(0.005)
        if trial > 0 and r.ttft_s is not None:
            solo_ttfts.append(r.ttft_s)
        r.cancel()
        drain()
    p50_solo_ms = (float(np.median(solo_ttfts) * 1e3) if solo_ttfts
                   else float("nan"))
    log(f"phase B2: single-request TTFT p50 {p50_solo_ms:.0f} ms "
        f"({len(solo_ttfts)} samples)")

    # --- Phase C: saturated closed-loop serving (admissions never stop) ---
    stop = threading.Event()
    finished: list = []
    admitted_during_window: list = []
    lock = threading.Lock()
    window_open = threading.Event()

    def loadgen():
        inflight = []
        for _ in range(concurrency):
            r = mkreq()
            engine.submit(r)
            inflight.append(r)
        while not stop.is_set():
            for i, r in enumerate(inflight):
                if r.finished_s is not None or r.error is not None:
                    nr = mkreq()
                    engine.submit(nr)
                    inflight[i] = nr
                    with lock:
                        finished.append(r)
                        if window_open.is_set():
                            admitted_during_window.append(nr)
            time.sleep(0.002)

    gen = threading.Thread(target=loadgen, daemon=True)
    gen.start()
    time.sleep(4 if tiny else 20)
    if not tiny:
        # Compile-aware ramp: hold the window until the last 5 rounds are
        # non-fresh — a fresh executable key mid-ramp is a 30-60 s compile
        # that would otherwise bleed into the measured window.  Bounded by
        # the driver budget (never past hard_deadline - 220 s).
        ramp0 = time.time()
        while (time.time() - ramp0 < 120
               and time.time() < hard_deadline - 220):
            recent = engine.round_snapshot()[-5:]
            if len(recent) >= 5 and not any(r["fresh"] for r in recent):
                break
            time.sleep(2)
    with lock:
        finished.clear()
    engine.round_log.clear()  # anatomy window == measurement window
    base_tokens = engine.total_output_tokens
    window_open.set()
    w0 = time.perf_counter()
    time.sleep(8.0 if tiny else 45.0)
    elapsed = time.perf_counter() - w0
    tokens_out = engine.total_output_tokens - base_tokens
    round_log_snapshot = engine.round_snapshot()  # window-only anatomy
    window_open.clear()
    stop.set()
    gen.join(timeout=10)

    agg_tps = tokens_out / elapsed

    # Round anatomy over the measurement window (VERDICT r2 item 1): where
    # does wall time go — device rounds vs host admission prep — and what do
    # the mixed families look like.
    import collections

    rl = round_log_snapshot
    agg = collections.defaultdict(lambda: [0, 0.0, 0.0, 0, 0, 0])
    fams = collections.Counter()
    for r in rl:
        g = agg[r["kind"]]
        g[0] += 1
        g[1] += r["admit_s"]
        g[2] += r["round_s"]
        g[3] += r["emitted"]
        g[4] += r["live"]
        g[5] += int(r["fresh"])
        if r["kind"] in ("mixed", "block"):
            # mixed: (family, npt); block: (actual rows, padded family) —
            # the block pair quantifies admission padding waste.
            fams[(r["kind"], r["a"], r["npt"])] += 1
    for kind, (n, adm, rnd, emit, live, fresh) in sorted(agg.items()):
        log(f"anatomy[{kind}]: n={n} admit_host={adm:.2f}s round={rnd:.2f}s "
            f"({rnd / max(n, 1) * 1e3:.0f} ms/round) emitted={emit} "
            f"mean_live={live / max(n, 1):.1f} fresh={fresh}")
    log(f"anatomy families: {dict(fams)}")
    covered = sum(g[1] + g[2] for g in agg.values())
    log(f"anatomy: rounds cover {covered:.1f}s of {elapsed:.1f}s window "
        f"(gap {elapsed - covered:.1f}s = loop host work outside rounds)")
    # Outlier sentinel: a non-fresh round >5x its kind's window median means
    # the chip slowed mid-window (fresh rounds legitimately pay a compile).
    outliers = []
    fresh_in_window = 0
    by_kind: dict = collections.defaultdict(list)
    for r in rl:
        by_kind[r["kind"]].append(r["round_s"])
        fresh_in_window += int(r["fresh"])
    for r in rl:
        med = float(np.median(by_kind[r["kind"]]))
        if not r["fresh"] and len(by_kind[r["kind"]]) >= 4 \
                and r["round_s"] > 5.0 * med:
            outliers.append((r["kind"], round(r["round_s"], 2),
                             round(med, 3)))
    if fresh_in_window:
        log(f"WINDOW HAD {fresh_in_window} FRESH-KEY ROUNDS (compiles in "
            f"the measurement window — warmup coverage gap)")
    if outliers:
        log(f"WINDOW OUTLIERS (non-fresh rounds >5x kind median): "
            f"{outliers[:10]}")
        degraded_flags.append(f"{len(outliers)} window outliers")
    with lock:
        ttfts = [r.ttft_s for r in admitted_during_window
                 if r.ttft_s is not None]
        n_done = len([r for r in finished if r.error is None])
        n_err = len([r for r in finished if r.error is not None])
    sat_p50 = float(np.median(ttfts) * 1e3) if ttfts else float("nan")
    sat_p90 = (float(np.percentile(ttfts, 90) * 1e3) if ttfts
               else float("nan"))
    log(f"phase C: {tokens_out} tokens in {elapsed:.1f}s -> {agg_tps:.0f} "
        f"tok/s serving aggregate (prefill FLOPs included); {n_done} done "
        f"({n_err} errors); saturated TTFT p50 {sat_p50:.0f} / p90 "
        f"{sat_p90:.0f} ms")
    log(f"engine stats: {engine.stats()}")
    slow_events = engine.event_snapshot()
    if slow_events:
        log(f"slow events (>{engine.slow_event_s:.0f}s loop phases): "
            f"{slow_events[-20:]}")
    engine.stop()
    if not tiny and probe_inproc("post-window") > 2.0:
        degraded_flags.append("post-window probe")

    result = {
        "metric": "decode_tokens_per_sec_per_chip_chatts8b_int4_c32",
        "value": round(decode_tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(decode_tps / R1_8B_C32_TOKS, 3),
        "p50_ttft_ms": round(p50_ttft_ms, 1),
        "p50_ttft_single_ms": round(p50_solo_ms, 1),
        "serving_agg_tokens_per_sec": round(agg_tps, 1),
        "serving_ttft_p50_ms": round(sat_p50, 1),
        "serving_ttft_p90_ms": round(sat_p90, 1),
        "requests_completed_per_min": round(n_done * 60 / elapsed, 1),
        "window_fresh_rounds": fresh_in_window,
        "degraded": bool(degraded_flags),
        "baseline_note": (
            "decode c32 vs r1 8B int8 2230 tok/s; ttft = burst-8 on "
            "warm engine (r1 definition); serving_agg includes "
            "continuous admission prefill FLOPs; chatts14b = 14B "
            "shape (5120h/48L/40H8KV) int4 on the same chip"
        ),
    }
    if degraded_flags:
        result["degraded_why"] = degraded_flags
    # EARLY line: a mid-14B driver kill must still leave the 8B headline
    # parseable on stdout (VERDICT r3 item 1 — r3 had rc=124, parsed null).
    print(json.dumps(dict(result, chatts14b={"pending": True})), flush=True)
    # Re-arm the watchdog's emergency payload with the full 8B result: if
    # the 14B phase wedges, the emergency line carries real numbers.
    partial.clear()
    partial.update(result, degraded=True,
                   chatts14b={"skipped": "watchdog cut the 14B phase"})
    partial["degraded_why"] = (result.get("degraded_why") or []) + [
        "watchdog: 14B phase exceeded the budget"]

    # --- Phase D: 14B shape, in its own process (serial — concurrent TPU
    # clients stall each other on this tunnel), with ONLY the remaining
    # budget and no retry. -------------------------------------------------
    results_14b: dict = {}
    remaining = hard_deadline - time.time()
    if tiny or os.environ.get("CHATTS_BENCH_SKIP_14B") == "1":
        results_14b = {"skipped": "tiny mode or CHATTS_BENCH_SKIP_14B"}
    elif remaining < 420:
        results_14b = {"skipped":
                       f"insufficient budget ({remaining:.0f}s left)"}
        log(f"14B phase skipped: {remaining:.0f}s of budget left")
    else:
        import subprocess

        env = dict(os.environ, CHATTS_BENCH_14B="1",
                   CHATTS_BENCH_14B_BUDGET_S=str(int(remaining - 90)))
        t0 = time.perf_counter()
        proc14b = subprocess.Popen(
            [sys.executable, __file__], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        children.append(proc14b)  # watchdog kills it on emergency exit
        try:
            out_s, err_s = proc14b.communicate(
                timeout=max(300.0, remaining - 75))
            sys.stderr.write(err_s[-4000:])
            for line in out_s.strip().splitlines():
                try:
                    results_14b = json.loads(line)
                except json.JSONDecodeError:
                    continue
            if not results_14b:
                results_14b = {"skipped":
                               f"subprocess rc={proc14b.returncode}, "
                               "no JSON"}
        except subprocess.TimeoutExpired:
            proc14b.kill()
            log("14B phase hit its subprocess timeout")
            results_14b = {"skipped": "subprocess timeout"}
        log(f"14B phase: {time.perf_counter() - t0:.1f}s -> {results_14b}")

    result["chatts14b"] = results_14b
    if results_14b.get("degraded"):
        result["degraded"] = True
        result.setdefault("degraded_why", []).append("14B subprocess")
    final_printed.set()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
