"""Benchmark: ChatTS-8B-shape serving throughput on ONE real TPU chip.

Headline configuration (the north star's serving shape, VERDICT r1 item 2):
Qwen2.5-7B-class backbone (hidden 3584, 28 layers, 28 heads / 4 KV heads,
intermediate 18944, vocab 152064) + 5-layer TS encoder — random weights in
the int4 serving layout (nibble-packed, group-128 scales, Pallas
native-ingest matmul), bf16 KV cache, ServeEngine at concurrency 32 with the
fused mixed prefill+decode step (admissions never stall decode).

Architecture (VERDICT r4 item 1 — rounds 3 and 4 delivered no certified
number): an ORCHESTRATOR process that never touches the device spawns the
measurement as WORKER subprocesses.  Workers stream ``MILESTONE {json}``
lines after every phase; the orchestrator keeps the latest one, so a worker
that wedges mid-phase still contributes everything it measured.  A worker
that produces no milestone in time (init >~3x nominal == degradation,
CLAUDE.md) is killed and retried ONCE in a fresh process after re-gating the
chip.  The orchestrator always prints a parseable JSON line and exits 0
within CHATTS_BENCH_BUDGET_S.

Worker phases (requests: two sp-encoded series of 256+512 points,
~512-token prompts, greedy):
  lite. decode tokens/sec at c32 right after the minimal warmup — a real
     headline number exists within minutes of a healthy start; refined by
     phase A after the full workload-shape warmup.
  A. decode-only tokens/sec at c32 (all slots live, no admissions) — the
     headline `value`.
  B. p50 TTFT at admission-burst 8 on a warm engine.  B2: single-request.
  C. saturated closed loop (finished requests replaced immediately) —
     serving aggregate tok/s including ALL prefill FLOPs, the under-load
     TTFT distribution, and the round-anatomy table.
  D. (14B worker, budget permitting) ChatTS-14B shape int4 on the same
     chip: c16/c8 decode, single/burst TTFT, saturated window — merged
     into the final JSON under "chatts14b".

Baselines: `vs_baseline` compares phase A against round 1's measured
8B-shape c32 decode rate (2,230 tok/s/chip, int8 weights — same shape and
definition).  `vs_a100_est` compares against the A100-80G vLLM estimate
derived in BASELINE.md (roofline x 0.60 vLLM efficiency at the same
workload); `vs_a100_per_dollar` applies the ~3.33x on-demand price ratio
($4.00/A100-hr vs $1.20/v5e-chip-hr).

Degradation sentinels: the subprocess gate probe now has a SUSTAINED stage
(~12 s of 2048^3 matmul loops, median-thresholded — catches chips that pass
one iteration but degrade under load, VERDICT r4 item 8); probe_inproc
re-runs between phases and aborts remaining phases while preserving the
measured ones; the saturated window's round anatomy separates fresh
(compile) rounds from steady-state and flags non-fresh outliers.

The orchestrator prints its JSON twice when the 14B phase runs: the early
8B line, then the merged final line — both parse; the final one supersedes.

CHATTS_BENCH_TINY=1 runs the same flow on a tiny CPU model (logic smoke
test for the bench itself; the numbers mean nothing).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

R1_8B_C32_TOKS = 2230.0  # round-1 8B-shape c32 decode tok/s (BENCHMARKS.md)

# A100-80G vLLM estimates at the matching workload — derivation in
# BASELINE.md ("A100 vLLM estimate"): HBM roofline x 0.60 realized
# efficiency, GPTQ-int4 weights, fp16 KV, ~700-token mean live context.
A100_EST_8B_DECODE_C32 = 5000.0
A100_EST_14B_DECODE_C16 = 1400.0
A100_EST_14B_SERVING_AGG = 1000.0
A100_V5E_PRICE_RATIO = 3.33  # $4.00/A100-hr / $1.20/v5e-chip-hr, on-demand


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_PROBE = (
    # Detects THREE failure modes of the tunneled v5e: wedged (hangs -> the
    # subprocess timeout catches it), degraded (flat ~139 ms/step regardless
    # of workload -> one 50-matmul loop takes ~7 s instead of ~40 ms), and
    # degrades-under-load (passes one loop, slows over a sustained run ->
    # the ~12 s sustained stage's median catches it; r4's run passed a
    # single probe and then wedged mid-bench).
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
    "ts = []\n"
    "t_end = time.time() + 12.0\n"
    "while time.time() < t_end and len(ts) < 200:\n"
    "    t0 = time.time()\n"
    "    v = float(np.asarray(f(x)[0, 0]))\n"
    "    ts.append(time.time() - t0)\n"
    "med = float(np.median(ts))\n"
    "print('probe_sustained', len(ts), round(med, 3), round(max(ts), 2))\n"
    "assert med < 2.0, f'chip degraded under load: median {med:.1f}s'\n"
    "print('probe_ok')\n"
)


def wait_for_healthy_chip(max_wait_s: float = 1200.0) -> bool:
    """The v5e behind the axon tunnel intermittently wedges (simple matmuls
    hang; recovers in ~20-30 min).  Probe it in a SUBPROCESS with a timeout
    before initializing our own client, so a wedged chip delays the bench
    instead of hanging it or recording garbage numbers.  The probe includes
    a ~12 s sustained stage (see _PROBE).  Returns False when the wait
    expired without ever seeing a healthy probe (the caller tags the result
    "degraded" instead of presenting the numbers as healthy)."""
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
                    f"{r.stdout.strip().splitlines()[-2]}")
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
    """Cheap mid-run degradation sentinel: time the same jit'd 50-matmul
    loop the subprocess probe uses, in THIS process, between bench phases.
    Healthy chip ~40 ms incl. dispatch; degraded chip (flat ~139 ms/step)
    ~7 s.  Returns elapsed seconds; caller thresholds at 2 s."""
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


# ---------------------------------------------------------------------------
# Worker side: model setup + phases.  Each phase ends with _emit(res) so the
# orchestrator always holds everything measured so far.
# ---------------------------------------------------------------------------


def _emit(res: dict) -> None:
    print("MILESTONE " + json.dumps(res), flush=True)


class _progress_beat:
    """Heartbeat for long SILENT phases (engine.warmup, the cold-cache
    workload ladder): while the wrapped call runs, re-emit `res` whenever
    the engine has completed NEW rounds since the last check.  The
    orchestrator's stall detector counts any MILESTONE line as liveness,
    so a cold warmup that legitimately exceeds stall_s keeps its worker
    alive exactly as long as rounds keep completing — a wedged chip stops
    completing rounds, the beats stop, and the stall kill still fires
    (q6c forensics: a healthy first worker was killed 600 s into a cold
    cap-6144 warmup that the retry then finished in 245 s)."""

    def __init__(self, engine, res: dict, interval_s: float = 20.0):
        self._engine = engine
        self._res = res
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        last_n = len(self._engine.round_snapshot())
        while not self._stop.wait(self._interval):
            n = len(self._engine.round_snapshot())
            if n != last_n:
                last_n = n
                _emit(self._res)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False


def _make_cfg(tiny: bool, flagship_14b: bool):
    from chatts_tpu.core.config import (
        ChatTSConfig,
        QwenConfig,
        TSEncoderConfig,
    )

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
    elif flagship_14b:
        cfg = ChatTSConfig(  # ChatTS-14B shape (reference README.md:260-263)
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
    else:
        cfg = ChatTSConfig(  # Qwen2.5-7B-class 8B shape
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
    return cfg, vocab


def _make_tokenizer(vocab: int):
    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            # Stable across processes (str.__hash__ is randomized per
            # process; stable ids keep bench runs comparable).
            return [10 + (sum(w.encode()) * 31 + len(w)) % (vocab - 100)
                    for w in text.split()]

    return _Tok()


def _init_params(cfg, tiny: bool, bits: int = 4):
    import jax
    import jax.numpy as jnp

    from chatts_tpu.models import quantize

    if tiny:
        # CPU XLA rejects bf16 dots; build f32 params and quantize.
        from chatts_tpu.models import chatts

        params = quantize.quantize_params(
            chatts.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32), bits=bits)
    else:
        params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                                fused=True, bits=bits)
    return jax.block_until_ready(params)


def _request_factory(rng, vocab_prompt: str):
    from chatts_tpu.serve.scheduler import Request, SamplingParams

    def mkreq(budget=None):
        series = [rng.normal(0, 50, 256).cumsum(),
                  rng.normal(0, 5, 512).cumsum()]
        # Staggered budgets (mean 128): identical budgets would finish the
        # whole cohort in synchronized waves, leaving slots idle while the
        # 8-row admission buckets refill serially.
        n = budget if budget is not None else int(rng.integers(80, 177))
        return Request(vocab_prompt, series,
                       SamplingParams(max_tokens=n, temperature=0.0))

    return mkreq


def _bench_prompt() -> str:
    filler = " ".join(f"word{i}" for i in range(400))
    return (
        f"system: you are a helpful assistant. user: here are two metrics "
        f"<ts><ts/> and <ts><ts/>. {filler} analyze their local changes."
    )


def _hold_until_steady(engine, hold_deadline: float, min_nonfresh: int = 5,
                       beat=None) -> None:
    """Hold a saturated window closed until the compile storm has flushed:
    the last `min_nonfresh` completed rounds are non-fresh AND a round
    completed recently.  The cadence check matters because an in-flight
    30-60 s compile produces no new rounds at all — the fresh counter
    can't see it (r5 forensics: two 14B windows opened with fresh=0 and
    measured mostly idle, 3.3 s / 9.1 s of rounds in a 25 s window)."""
    snap = engine.round_snapshot()
    n_last = len(snap)
    t_change = time.time()
    while time.time() < hold_deadline:
        snap = engine.round_snapshot()
        if len(snap) != n_last:
            n_last = len(snap)
            t_change = time.time()
        recent = snap[-min_nonfresh:]
        if len(recent) >= min_nonfresh \
                and not any(r["fresh"] for r in recent):
            med = float(np.median([r["round_s"] for r in recent]))
            if time.time() - t_change < max(5.0, 3.0 * med):
                return
        if beat is not None:
            beat()
        time.sleep(1.0)


def _drain(engine, timeout_s=120.0):
    deadline = time.time() + timeout_s
    while engine.stats()["active_slots"] > 0 or not engine.waiting.empty():
        if time.time() > deadline:
            log("drain timed out")
            return
        time.sleep(0.05)


def _measure_decode(engine, mkreq, concurrency: int, pdl, window_s: float,
                    tiny: bool) -> float:
    """Fill every slot, measure pure decode tok/s while ALL slots stay live
    (stop at first completion), cancel + drain."""
    deco = []
    for _ in range(concurrency):
        r = mkreq(350)  # fits prompt+budget under cap 1024
        engine.submit(r)
        deco.append(r)
    deadline = pdl(300)
    while not all(r.output_tokens or r.error for r in deco):
        if time.time() > deadline:
            break
        time.sleep(0.02)
    # total_output_tokens only updates at request completion, so count the
    # streamed per-request token lists directly.
    base_tokens = sum(len(r.output_tokens) for r in deco)
    a0 = time.perf_counter()
    while (not any(r.finished_s is not None for r in deco)
           and time.perf_counter() - a0 < (8.0 if tiny else window_s)):
        time.sleep(0.05)
    tps = (sum(len(r.output_tokens) for r in deco) - base_tokens) / (
        time.perf_counter() - a0)
    for r in deco:
        r.cancel()
    _drain(engine)
    return tps


def worker_8b():
    """All 8B phases; emits a MILESTONE after each so a mid-phase wedge
    still leaves everything measured so far with the orchestrator."""
    tiny = os.environ.get("CHATTS_BENCH_TINY") == "1"
    t_start = time.time()
    budget_s = float(os.environ.get("CHATTS_BENCH_WORKER_BUDGET_S", "1200"))
    deadline_w = t_start + budget_s

    def rem() -> float:
        return deadline_w - time.time()

    def pdl(s: float = 300.0) -> float:
        return min(time.time() + s, deadline_w - 30.0)

    import jax

    from chatts_tpu.utils import compile_cache

    if tiny:
        # Platform BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    cache_dir = compile_cache.enable()
    log(f"persistent compile cache: {cache_dir}")

    import jax.numpy as jnp

    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import ServeEngine

    log(f"devices: {jax.devices()}")
    cfg, vocab = _make_cfg(tiny, flagship_14b=False)

    degraded_flags: list = []
    res: dict = {
        "metric": "decode_tokens_per_sec_per_chip_chatts8b_int4_c32",
        "value": 0.0,
        "unit": "tokens/s/chip",
        "vs_baseline": 0.0,
        "degraded": False,
        "phases_done": [],
    }

    def set_value(tps: float) -> None:
        res["value"] = round(tps, 1)
        res["vs_baseline"] = round(tps / R1_8B_C32_TOKS, 3)
        res["vs_a100_est"] = round(tps / A100_EST_8B_DECODE_C32, 3)
        res["vs_a100_per_dollar"] = round(
            tps / A100_EST_8B_DECODE_C32 * A100_V5E_PRICE_RATIO, 2)

    def checkpoint(phase: str) -> None:
        res["phases_done"].append(phase)
        res["degraded"] = bool(degraded_flags)
        if degraded_flags:
            res["degraded_why"] = list(degraded_flags)
        _emit(res)

    def probe_gate(tag: str) -> bool:
        """Mid-run degradation abort (VERDICT r4 item 8): True = continue,
        False = stop phases, keep everything measured so far."""
        if tiny:
            return True
        if probe_inproc(tag) > 2.0:
            degraded_flags.append(f"{tag} probe degraded — later phases "
                                  "aborted, earlier numbers kept")
            return False
        return True

    t0 = time.perf_counter()
    params = _init_params(cfg, tiny)
    init_s = time.perf_counter() - t0
    from chatts_tpu.models import quantize

    log(f"init 8B int4 params: {init_s:.1f}s, "
        f"{quantize.param_bytes(params) / 1e9:.2f} GB on chip")
    res["init_s"] = round(init_s, 1)
    if not tiny and init_s > 150.0:  # ~3x the 45 s nominal (CLAUDE.md)
        degraded_flags.append(f"slow init ({init_s:.0f}s — degraded chip?)")
    checkpoint("init")

    proc = ChatTSProcessor(_make_tokenizer(vocab), cfg)
    # CHATTS_BENCH_C: serving concurrency A/B knob (c48 fits: 5 GB int4
    # weights + 48 x 58.7 MB bf16 KV at cap 1024 = 2.8 GB on the 16 GB
    # chip).  Churn scales with slots, so the admission bucket widens past
    # 8 rows/round at c>32 (the {10, 12} block-family rungs engage).
    concurrency = int(os.environ.get("CHATTS_BENCH_C", "32"))
    bucket = int(os.environ.get("CHATTS_BENCH_BUCKET",
                                "8" if concurrency <= 32 else "12"))
    # CHATTS_BENCH_CAP: context capacity.  1024 is the bench workload's
    # fit; 6144 is the reference serving envelope (start_vllm_server.sh:6,
    # max_model_len 6000) — at cap 6144 int8 KV is mandatory at c32
    # (bf16 KV = 11.3 GB beside 5.05 GB weights; int8 = 5.6 GB).
    cap = int(os.environ.get("CHATTS_BENCH_CAP", "1024"))
    kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[
        os.environ.get("CHATTS_BENCH_KV", "bf16" if cap <= 2048 else "int8")]
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=concurrency,
        admission_bucket=bucket,
        max_model_len=cap,
        # bf16 KV default at cap 1024: measured faster than int8 KV at the
        # 8B shape (13.1 vs 13.9 ms TPOT at b32 — in-dot dequant doesn't
        # fuse into the dense attention read here).  int8 KV is the
        # capacity play and the default past cap 2048.
        cache_dtype=kv_dtype,
        # chunk 32 amortizes the tunnel dispatch + host gap (measured
        # 13.67 vs 14.67 ms/tok raw at b32).
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
    mkreq = _request_factory(rng, _bench_prompt())

    # Minimal warmup: the standard 512 bucket only — enough to admit the
    # phase-lite cohort (its own shapes compile inside the lite phase, and
    # hit the persistent cache on a warmed host).
    t0 = time.perf_counter()
    with _progress_beat(engine, res):
        engine.warmup(prefill_buckets=(512,), series_per_request=2,
                      series_len=512)
    res["warmup_s"] = round(time.perf_counter() - t0, 1)
    log(f"warmup (monolithic + mixed shapes): {res['warmup_s']}s")
    checkpoint("warmup")

    # --- Phase A-lite: a REAL decode number as early as possible (VERDICT
    # r4 item 1b) — same definition as phase A, shorter window, before the
    # full ladder.  Phase A refines it later; this one stands if the chip
    # dies first.
    tps_lite = _measure_decode(engine, mkreq, concurrency, pdl,
                               window_s=15.0, tiny=tiny)
    res["decode_lite_tps"] = round(tps_lite, 1)
    set_value(tps_lite)
    log(f"phase A-lite: decode {tps_lite:.0f} tok/s at c{concurrency} "
        f"({time.time() - t_start:.0f}s into the worker)")
    checkpoint("a_lite")

    ok = probe_gate("post-lite")

    # --- Workload-shape warmup: cover every block-family rung at THIS
    # workload's compile keys (token bucket, series buckets) so the
    # measured phases stay compile-free. -----------------------------------
    if ok:
        t0 = time.perf_counter()
        beat = _progress_beat(engine, res)
        beat.__enter__()
        pre = [mkreq() for _ in range(concurrency)]
        for r in pre:
            engine.submit(r)
        deadline = time.time() + 900 if tiny else min(
            time.time() + 900, deadline_w - 300)
        while not any(r.output_tokens for r in pre):
            if time.time() > deadline:
                break
            time.sleep(0.05)
        extra = []
        rungs = sorted({f for f in (1, 2, 3, 4, 6, 8, 10, 12,
                                    engine._a_bucket)
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
            _emit(res)  # heartbeat: a cold rung compiles 30-60 s; don't
            # let the orchestrator's stall detector count the whole ladder
            # as one silent phase
        while any(r.finished_s is None and r.error is None
                  for r in pre + extra):
            if time.time() > deadline:
                log("workload warmup timed out")
                break
            time.sleep(0.05)
        beat.__exit__()
        errs = [r.error for r in pre + extra if r.error]
        if errs:
            log(f"workload warmup errors: {errs[:3]}")
        res["ladder_s"] = round(time.perf_counter() - t0, 1)
        log(f"workload-shape warmup: {res['ladder_s']}s")
        checkpoint("ladder")
        ok = probe_gate("post-warmup")

    # --- Phase A: the headline decode number, fully warmed ----------------
    if ok and (tiny or rem() > 90):
        tps = _measure_decode(engine, mkreq, concurrency, pdl,
                              window_s=30.0, tiny=tiny)
        set_value(tps)
        log(f"phase A: decode-only {tps:.0f} tok/s at c{concurrency}")
        checkpoint("a")

    # --- Phase B: TTFT at admission-burst 8, warm idle engine (r1's TTFT
    # definition: a request prefills with its arrival burst) ---------------
    if ok and (tiny or rem() > 120):
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
            _drain(engine)
        if burst_ttfts:
            res["p50_ttft_ms"] = round(
                float(np.median(burst_ttfts) * 1e3), 1)
        log(f"phase B: burst-8 TTFT p50 {res.get('p50_ttft_ms')} ms "
            f"({len(burst_ttfts)} samples)")
        checkpoint("b")

    # --- Phase B2: single-request TTFT on a warm idle engine --------------
    if ok and (tiny or rem() > 90):
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
            _drain(engine)
        if solo_ttfts:
            res["p50_ttft_single_ms"] = round(
                float(np.median(solo_ttfts) * 1e3), 1)
        log(f"phase B2: single-request TTFT p50 "
            f"{res.get('p50_ttft_single_ms')} ms ({len(solo_ttfts)} samples)")
        checkpoint("b2")

    # --- Phase C: saturated closed-loop serving (admissions never stop) ---
    if ok and (tiny or rem() > 150):
        _phase_c_saturated(engine, mkreq, concurrency, res, deadline_w, tiny)
        checkpoint("c")
        probe_gate("post-window")

    res["degraded"] = bool(degraded_flags)
    if degraded_flags:
        res["degraded_why"] = list(degraded_flags)
    res["baseline_note"] = (
        "decode c32 vs r1 8B int8 2230 tok/s and vs A100-80G vLLM estimate "
        "(BASELINE.md); ttft = burst-8 on warm engine (r1 definition); "
        "serving_agg includes continuous admission prefill FLOPs; "
        "chatts14b = 14B shape (5120h/48L/40H8KV) int4 on the same chip"
    )
    # Phase C runs the throughput arm (bucket 8 / chunk 32); the server's
    # default latency arm is measured separately (BENCHMARKS.md "the
    # promised latency arms" / "reference envelope") — cross-referenced
    # here so the driver JSON carries both sides of the north star.
    res["latency_arm_ref"] = (
        "server default 32x4x16ee measured separately (not this run): "
        "1145.2 tok/s @ 220.9 ms saturated TTFT p50 at cap 1024; "
        "1013.8 tok/s @ 218.9 ms at the reference envelope cap 6144 "
        "(BENCHMARKS.md r5)"
    )
    _emit(res)
    engine.stop()


def _phase_c_saturated(engine, mkreq, concurrency, res, deadline_w, tiny):
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
        # non-fresh AND rounds are completing at normal cadence — a fresh
        # executable key mid-ramp is a 30-60 s compile that would
        # otherwise bleed into the measured window.
        _hold_until_steady(
            engine, min(time.time() + 120, deadline_w - 160))
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

    # Round anatomy over the measurement window: where does wall time go —
    # device rounds vs host admission prep — and what do the mixed families
    # look like.
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
        res.setdefault("degraded_why", []).append(
            f"{len(outliers)} window outliers")
        res["degraded"] = True
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
    res["serving_agg_tokens_per_sec"] = round(agg_tps, 1)
    res["serving_ttft_p50_ms"] = round(sat_p50, 1)
    res["serving_ttft_p90_ms"] = round(sat_p90, 1)
    res["requests_completed_per_min"] = round(n_done * 60 / elapsed, 1)
    res["window_fresh_rounds"] = fresh_in_window


def worker_14b():
    """ChatTS-14B shape on ONE chip: hidden 5120, 48L, 40H/8KV, vocab 152k,
    int4 (~9.4 GB weights) — the flagship the reference ships
    (README.md:260-263).  Runs in its own process so its buffers free fully
    after the 8B phases; emits MILESTONE lines the orchestrator merges."""
    import jax
    import jax.numpy as jnp

    from chatts_tpu.utils import compile_cache

    tiny = os.environ.get("CHATTS_BENCH_TINY") == "1"  # CPU flow smoke
    t_start = time.time()
    budget_s = float(os.environ.get("CHATTS_BENCH_WORKER_BUDGET_S", "900"))
    deadline_14b = t_start + budget_s

    def rem() -> float:
        return deadline_14b - time.time()

    if tiny:
        # Platform BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()

    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import ServeEngine

    log(f"[14B] devices: {jax.devices()}")
    cfg, vocab = _make_cfg(tiny, flagship_14b=True)

    out: dict = {"skipped": []}

    t0 = time.perf_counter()
    params = _init_params(cfg, tiny)
    from chatts_tpu.models import quantize

    out["init_s"] = round(time.perf_counter() - t0, 1)
    log(f"[14B] init int4 params: {out['init_s']}s, "
        f"{quantize.param_bytes(params) / 1e9:.2f} GB on chip")
    _emit(out)

    proc = ChatTSProcessor(_make_tokenizer(vocab), cfg)
    # c24 default: int8 KV at cap 1024 costs ~101 MB/slot (48L x 2 x 8KVH x
    # 128D), so c24 (2.4 GB) fits beside the 9.4 GB int4 weights and
    # saturates at 636.5 tok/s vs c16's 295.4 (measured r5, fresh=0) —
    # admission churn amortizes over 1.5x the live rows.  The c16 decode
    # record stays comparable via the padded-row measurement below.
    concurrency = int(os.environ.get("CHATTS_BENCH_14B_C", "24"))
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=concurrency, max_model_len=1024,
        admission_bucket=int(os.environ.get("CHATTS_BENCH_BUCKET", "8")),
        # int8 KV: ~9.4 GB of int4 weights + bf16 KV at c16 (6.4 GB) would
        # not fit the 16 GB chip; int8 KV halves the cache (3.2 GB).
        cache_dtype=jnp.int8, decode_chunk=32, fuse=False,
        prefill_act_int8=os.environ.get("CHATTS_BENCH_A8", "0") == "1",
        # Early emission is MANDATORY for the 14B saturated phase to be
        # measurable: a fused scan+block executable at this shape is a
        # 40 s compile PER admission family, and the loadgen's coalescing
        # reaches keys the ladder missed (measured r5: 10 of 12 ramp block
        # rounds fresh, storm never flushed in the 600 s hold).  EE splits
        # admissions into small prefill-only keys + ONE decode-scan key —
        # the same reason the 8B phase C runs fresh=0.
        block_early_emit=os.environ.get("CHATTS_BENCH_EE", "1") == "1",
    )
    rng = np.random.default_rng(0)
    mkreq = _request_factory(rng, _bench_prompt())

    t0 = time.perf_counter()
    with _progress_beat(engine, out):
        engine.warmup(prefill_buckets=(512,), series_per_request=2,
                      series_len=512)
    out["warmup_s"] = round(time.perf_counter() - t0, 1)
    log(f"[14B] engine warmup: {out['warmup_s']}s; "
        f"budget left {rem():.0f}s")
    _emit(out)

    def pdl14(s: float = 300.0) -> float:
        return min(time.time() + s, deadline_14b - 30.0)

    # Early c16 decode number before the expensive ladder: the certified
    # JSON carries a 14B number even if the saturated phase never fits.
    if tiny or rem() > 90:
        tps = _measure_decode(engine, mkreq, concurrency, pdl14,
                              window_s=20.0, tiny=tiny)
        out[f"decode_tps_c{concurrency}"] = round(tps, 1)
        if concurrency == 16:
            out["vs_a100_est_decode_c16"] = round(
                tps / A100_EST_14B_DECODE_C16, 3)
        log(f"[14B] decode c{concurrency} (pre-ladder): {tps:.0f} tok/s; "
            f"budget left {rem():.0f}s")
        _emit(out)
        if concurrency != 16 and (tiny or rem() > 150):
            # The c16 record stays comparable across rounds even when the
            # engine serves at a different width (c16 rows on a c24 engine
            # pad-compute; measured equivalence: c8-on-c24 441 tok/s vs
            # c8-on-c16 448).
            tps16 = _measure_decode(engine, mkreq, 16, pdl14,
                                    window_s=20.0, tiny=tiny)
            out["decode_tps_c16"] = round(tps16, 1)
            out["vs_a100_est_decode_c16"] = round(
                tps16 / A100_EST_14B_DECODE_C16, 3)
            log(f"[14B] decode c16 (padded rows on the c{concurrency} "
                f"engine): {tps16:.0f} tok/s; budget left {rem():.0f}s")
            _emit(out)

    # Workload-shape warmup (cohort + block-family ladder) is only needed by
    # the saturated phase — skip it (and that phase) when the budget can't
    # fit both; decode/TTFT phases compile their own shapes as they go.
    t0 = time.perf_counter()
    did_ladder = tiny or rem() > 420
    if did_ladder:
        beat14 = _progress_beat(engine, out)
        beat14.__enter__()
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
            _emit(out)  # ladder heartbeat (see worker_8b)
        while any(r.finished_s is None and r.error is None
                  for r in pre + extra):
            if time.time() > deadline:
                log("[14B] warmup timed out")
                break
            time.sleep(0.05)
        beat14.__exit__()
        log(f"[14B] workload warmup: {time.perf_counter() - t0:.1f}s; "
            f"errors: {[r.error for r in pre + extra if r.error][:2]}")
        _emit(out)
    else:
        out["skipped"].append("ladder")
        log(f"[14B] skipping family ladder ({rem():.0f}s left)")

    # saturated closed loop, 25 s window.  Runs FIRST after the ladder: it
    # is the metric VERDICT r4 certifies (>=400 tok/s) and the first
    # casualty when the orchestrator hands the 14B worker a thin budget —
    # c8/TTFT phases follow it instead of eating its runway.  The family
    # ladder is the fast path to a steady window, but with a warm disk
    # compile cache it is OPTIONAL: the loadgen itself reaches every block
    # key and _hold_until_steady refuses to open the window until rounds
    # run non-fresh at normal cadence, so a thin-budget worker (ladder
    # skipped at <420 s) still attempts saturated when >240 s remain
    # (r5 dress2: 266 s left went to c8/TTFT while the certified saturated
    # number was skipped).
    if tiny or (did_ladder and rem() > 150) or rem() > 240:
        stop = threading.Event()
        err_count = [0]
        first_err = [None]
        inflight: list = []

        def loadgen():
            inflight.extend(mkreq() for _ in range(concurrency))
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
        # 0.6-1.1 s).  Window opens only after 5 consecutive non-fresh
        # rounds completing at normal cadence (budget-capped).
        hold = time.time() + min(600, max(0.0, rem() - 45))
        last_beat = [time.time()]

        def _beat():
            if time.time() - last_beat[0] > 60:
                _emit(out)  # compile-storm hold can exceed the stall window
                last_beat[0] = time.time()

        _hold_until_steady(engine, hold, beat=_beat)
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
        out["vs_a100_est_serving"] = round(agg / A100_EST_14B_SERVING_AGG, 3)
        out["vs_a100_serving_per_dollar"] = round(
            agg / A100_EST_14B_SERVING_AGG * A100_V5E_PRICE_RATIO, 2)
        # Window forensics: fresh-key rounds == compiles in the window
        # (warmup coverage gap); non-fresh outliers == chip slowdown.
        window = engine.round_snapshot()
        out["window_fresh_rounds"] = sum(int(r["fresh"]) for r in window)
        # A fresh compile that STARTS inside the window but doesn't finish
        # there is invisible to the per-round counters (r5: a 74 tok/s
        # window reported fresh=0 because its one giant compile never
        # completed in it) — flag windows whose completed rounds cover
        # less than half the wall time.
        covered = sum(r["round_s"] for r in window)
        if not tiny and covered < 0.5 * 25.0:
            out["degraded"] = True
            out.setdefault("degraded_why", []).append(
                f"saturated window mostly idle (rounds cover "
                f"{covered:.1f}s of 25s — in-flight compile or stall)")
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
        _emit(out)
        for r in inflight:
            r.cancel()
        _drain(engine, 120.0)
    else:
        out["skipped"].append("saturated")

    # decode tok/s at c8 (the c16 number was measured pre-ladder)
    if tiny or rem() > 120:
        tps = _measure_decode(engine, mkreq, 8, pdl14, window_s=20.0,
                              tiny=tiny)
        out["decode_tps_c8"] = round(tps, 1)
        log(f"[14B] decode c8: {tps:.0f} tok/s; budget left {rem():.0f}s")
        _emit(out)
    else:
        out["skipped"].append("decode_c8")

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
            _drain(engine, 180.0)
        out["ttft_single_ms"] = (round(float(np.median(solo) * 1e3), 1)
                                 if solo else None)
        _emit(out)
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
            _drain(engine, 180.0)
        out["ttft_burst8_p50_ms"] = (round(float(np.median(bursts) * 1e3), 1)
                                     if bursts else None)
        log(f"[14B] TTFT single {out.get('ttft_single_ms')} ms, "
            f"burst-8 p50 {out.get('ttft_burst8_p50_ms')} ms; "
            f"budget left {rem():.0f}s")
        _emit(out)
    else:
        out["skipped"].append("ttft_burst8")

    if not tiny and probe_inproc("14B-end") > 2.0:
        out["degraded"] = True
    engine.stop()
    if not out["skipped"]:
        del out["skipped"]
    _emit(out)


# ---------------------------------------------------------------------------
# Orchestrator: no device access, cannot wedge.  Owns the budget, the gate,
# worker deadlines, the retry, and the final JSON line.
# ---------------------------------------------------------------------------


def _run_worker(kind: str, budget_s: float, first_milestone_s: float,
                abs_deadline: float, stall_s: float = 600.0):
    """Spawn `python bench.py` with CHATTS_BENCH_WORKER=kind, stream its
    MILESTONE lines, and return the last one (or None).  Kills the worker
    when (a) no first milestone arrives in first_milestone_s (init >~3x
    nominal == degraded chip), (b) no NEW milestone arrives for stall_s, or
    (c) abs_deadline passes.  Worker stderr flows through to ours."""
    env = dict(os.environ, CHATTS_BENCH_WORKER=kind,
               CHATTS_BENCH_WORKER_BUDGET_S=str(int(budget_s)))
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, stderr=None, text=True,
    )
    last: list = [None, time.time()]  # (milestone dict, arrival time)

    def reader():
        for line in p.stdout:
            line = line.strip()
            if line.startswith("MILESTONE "):
                try:
                    last[0] = json.loads(line[len("MILESTONE "):])
                    last[1] = time.time()
                except json.JSONDecodeError:
                    continue

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    t0 = time.time()
    why = None
    while p.poll() is None:
        now = time.time()
        if last[0] is None and now - t0 > first_milestone_s:
            why = (f"no first milestone in {first_milestone_s:.0f}s "
                   "(init hung or degraded)")
            break
        if last[0] is not None and now - last[1] > stall_s:
            why = f"no new milestone for {stall_s:.0f}s (stalled mid-phase)"
            break
        if now > abs_deadline:
            why = "budget deadline"
            break
        time.sleep(1.0)
    if p.poll() is None:
        log(f"{kind} worker killed: {why}")
        p.kill()
    p.wait()
    rt.join(timeout=10)
    if last[0] is not None and why is not None:
        last[0]["degraded"] = True
        last[0].setdefault("degraded_why", []).append(f"worker killed: {why}")
    return last[0]


def _orchestrate():
    tiny = os.environ.get("CHATTS_BENCH_TINY") == "1"
    t_start = time.time()
    budget_s = float(os.environ.get("CHATTS_BENCH_BUDGET_S", "1500"))
    hard_deadline = t_start + budget_s
    gate_notes: list = []

    if not tiny:
        if not wait_for_healthy_chip(max_wait_s=min(600.0, budget_s * 0.35)):
            gate_notes.append("chip never healthy at bench start")

    # --- 8B worker, one retry in a fresh process after re-gating ----------
    best = None
    for attempt in (1, 2):
        remaining = hard_deadline - time.time()
        if remaining < 240:
            break
        got = _run_worker(
            "8b",
            budget_s=remaining - 60,
            # jax import (~30 s) + init (45 s nominal; 150 s == 3x) + margin;
            # tiny mode on the 1-core host compiles everything from scratch.
            first_milestone_s=900 if tiny else 360,
            abs_deadline=hard_deadline - 45,
        )
        if got is not None and (best is None
                                or got.get("value", 0) >= best.get("value", 0)
                                or len(got.get("phases_done", []))
                                > len(best.get("phases_done", []))):
            best = got
        if best is not None and best.get("value", 0) > 0 \
                and "c" in best.get("phases_done", []):
            break  # full success; no retry needed
        if attempt == 1 and not tiny \
                and hard_deadline - time.time() > 420:
            log("8B worker incomplete — re-gating the chip and retrying "
                "in a fresh process")
            # Full gate (probe + 13 GB HBM canary, scripts/chip_gate.py):
            # the tunnel can RETAIN the dead worker's buffers for minutes,
            # so the retry must wait for HBM to actually free (CLAUDE.md).
            gate_budget = min(300.0, hard_deadline - time.time() - 300)
            gate_py = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "chip_gate.py")
            try:
                env = dict(os.environ, GATE_WAIT_S=str(int(gate_budget)),
                           GATE_ATTEMPT_S="150")
                # Gate chatter must NOT land on OUR stdout (the driver
                # parses stdout for the JSON result lines).
                subprocess.call([sys.executable, gate_py], env=env,
                                stdout=sys.stderr, timeout=gate_budget + 120)
            except (subprocess.TimeoutExpired, OSError) as e:
                log(f"re-gate failed ({e}); retrying anyway")
        else:
            break

    result = best or {
        "metric": "decode_tokens_per_sec_per_chip_chatts8b_int4_c32",
        "value": 0.0,
        "unit": "tokens/s/chip",
        "vs_baseline": 0.0,
        "degraded": True,
        "degraded_why": ["no 8B milestone ever arrived (chip wedged "
                         "through the whole budget)"],
    }
    if gate_notes:
        result["degraded"] = True
        result.setdefault("degraded_why", []).extend(gate_notes)

    # EARLY line: a mid-14B driver kill must still leave the 8B headline
    # parseable on stdout.
    print(json.dumps(dict(result, chatts14b={"pending": True})), flush=True)

    # --- 14B worker (serial — concurrent TPU clients stall each other on
    # this tunnel), with ONLY the remaining budget and no retry. -----------
    remaining = hard_deadline - time.time()
    if tiny or os.environ.get("CHATTS_BENCH_SKIP_14B") == "1":
        results_14b = {"skipped": "tiny mode or CHATTS_BENCH_SKIP_14B"}
    elif remaining < 420:
        results_14b = {"skipped":
                       f"insufficient budget ({remaining:.0f}s left)"}
        log(f"14B phase skipped: {remaining:.0f}s of budget left")
    else:
        got = _run_worker(
            "14b",
            budget_s=remaining - 75,
            first_milestone_s=420,  # 14B init ~2x the 8B one
            abs_deadline=hard_deadline - 30,
        )
        results_14b = got if got is not None else {
            "skipped": "no 14B milestone (worker died or hung)"}

    result["chatts14b"] = results_14b
    # A degraded 14B phase does NOT degrade the headline: `degraded` on the
    # top level describes the integrity of the 8B numbers `value` reports.
    # The 14B dict carries its own flag; surface it without poisoning the
    # headline (r5 dress rehearsal: clean 8B + budget-killed 14B read as a
    # degraded round).
    if results_14b.get("degraded"):
        result["degraded_14b"] = True
    result["elapsed_s"] = round(time.time() - t_start, 1)
    print(json.dumps(result), flush=True)


def main():
    kind = os.environ.get("CHATTS_BENCH_WORKER")
    if kind == "8b":
        worker_8b()
    elif kind == "14b":
        worker_14b()
    else:
        _orchestrate()


if __name__ == "__main__":
    main()
