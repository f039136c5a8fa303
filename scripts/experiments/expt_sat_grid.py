"""Saturated-serving grid: decode_chunk x admission_bucket at c32 (r3).

The r3i headline (chunk 32, bucket 8) saturates at 872 tok/s with
mean_live 22/32 and TTFT p50 1.4 s.  Queueing reading of the anatomy:
churn is ~8 rows/round — exactly the admission bucket — so any variance
leaves a standing backlog (rho=1), and a row that finishes at scan step s
idles (chunk - s) steps before its replacement boards.  Two cheap levers,
both pure configuration:

- chunk 16 halves the post-completion idle AND doubles the admission
  cadence (families shrink, which the {1,2,3,4,6,8} ladder absorbs);
- bucket 12 lets a catch-up wave clear backlog in one round instead of
  carrying it forever;
- a8 runs int8-activation prompt matmuls in the block rounds (~1.3x on
  the FLOP-bound prompt side);
- c48 adds slots (weight reads amortize; churn variance smooths).

The per-freed-slot admission grace (scheduler.py) landed after the 872
measurement — every arm includes it, so the 32x8 arm doubles as its A/B.

One process, one 8B-int4 init; each arm builds a fresh ServeEngine
(executables differ by chunk/bucket/slots), warms its block families,
then runs the bench phase-C closed loop (20 s ramp + 40 s window).
Reference behavior being probed: vLLM continuous batching (reference
chatts/utils/llm_utils.py:147-190).

Run:  python scripts/experiments/expt_sat_grid.py [arm...]
      Arm grammar: <chunk>x<bucket>[c<slots>][a8], e.g. 32x12c48, 16x8a8.
"""
import collections
import gc
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from chatts_tpu.utils import compile_cache


def run_arm(params, cfg, proc, Request, SamplingParams, ServeEngine,
            jnp, chunk: int, bucket: int, a8: bool = False,
            nslots: int = 32, ee: bool = False) -> dict:
    engine = ServeEngine(
        params, cfg, proc, max_batch_size=nslots, admission_bucket=bucket,
        max_model_len=1024, cache_dtype=jnp.bfloat16, decode_chunk=chunk,
        fuse=False, prefill_act_int8=a8, block_early_emit=ee,
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
        n = int(rng.integers(80, 177))
        return Request(prompt, series,
                       SamplingParams(max_tokens=n, temperature=0.0))

    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(512,), series_per_request=2,
                  series_len=512)
    print(f"  warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # Workload-shape warmup: cohort + every block-family rung at this
    # workload's compile keys (mirrors bench.py's gated ladder).
    t0 = time.perf_counter()
    pre = [mkreq() for _ in range(engine.max_batch_size)]
    for r in pre:
        engine.submit(r)
    deadline = time.time() + 900
    while not any(r.output_tokens for r in pre):
        if time.time() > deadline:
            break
        time.sleep(0.05)
    extra = []
    rungs = sorted({f for f in (1, 2, 3, 4, 6, 8, 10, 12, engine._a_bucket)
                    if f <= engine._a_bucket}, reverse=True)
    for n in rungs:
        gate = time.time() + 300
        while (len(engine._free_slots()) < n or not engine.live_host.any()):
            if time.time() > gate:
                print(f"  warmup family {n} gate timed out", flush=True)
                break
            time.sleep(0.05)
        batch2 = [mkreq() for _ in range(n)]
        for r in batch2:
            engine.submit(r)
        extra += batch2
        while not engine.waiting.empty():
            if time.time() > gate:
                break
            time.sleep(0.05)
    while any(r.finished_s is None and r.error is None for r in pre + extra):
        if time.time() > deadline:
            print("  workload warmup timed out", flush=True)
            break
        time.sleep(0.05)
    print(f"  workload warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # Saturated closed loop: ramp 20 s, window 40 s.
    stop = threading.Event()
    window_open = threading.Event()
    lock = threading.Lock()
    admitted_during_window: list = []

    def loadgen():
        inflight = [mkreq() for _ in range(engine.max_batch_size)]
        for r in inflight:
            engine.submit(r)
        while not stop.is_set():
            for i, r in enumerate(inflight):
                if r.finished_s is not None or r.error is not None:
                    nr = mkreq()
                    engine.submit(nr)
                    inflight[i] = nr
                    with lock:
                        if window_open.is_set():
                            admitted_during_window.append(nr)
            time.sleep(0.002)

    gen = threading.Thread(target=loadgen, daemon=True)
    gen.start()
    # Compile-aware ramp: hold the window open until the last 5 rounds are
    # all non-fresh (a fresh mono/block key mid-ramp is a 30-60 s compile
    # that would otherwise bleed into the window — the 16x8ee arm measured
    # 88 tok/s because of exactly that), minimum 20 s, cap 300 s.
    ramp0 = time.time()
    time.sleep(20)
    while time.time() - ramp0 < 300:
        recent = engine.round_snapshot()[-5:]
        if len(recent) >= 5 and not any(r["fresh"] for r in recent):
            break
        time.sleep(2)
    print(f"  ramp: {time.time() - ramp0:.1f}s", flush=True)
    engine.round_log.clear()
    base = engine.streamed_tokens
    window_open.set()
    w0 = time.perf_counter()
    time.sleep(40)
    elapsed = time.perf_counter() - w0
    toks = engine.streamed_tokens - base
    rl = engine.round_snapshot()
    window_open.clear()
    stop.set()
    gen.join(timeout=10)

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
    with lock:
        ttfts = [r.ttft_s for r in admitted_during_window
                 if r.ttft_s is not None]
    p50 = float(np.median(ttfts) * 1e3) if ttfts else float("nan")
    p90 = (float(np.percentile(ttfts, 90) * 1e3) if ttfts
           else float("nan"))
    out = {
        "chunk": chunk, "bucket": bucket, "ee": ee,
        "agg_tps": round(toks / elapsed, 1),
        "ttft_p50_ms": round(p50, 1),
        "ttft_p90_ms": round(p90, 1),
        "anatomy": {
            k: {"n": n, "admit_s": round(adm, 2), "round_s": round(rnd, 2),
                "ms_per_round": round(rnd / max(n, 1) * 1e3, 1),
                "emitted": emit,
                "mean_live": round(live / max(n, 1), 1), "fresh": fresh}
            for k, (n, adm, rnd, emit, live, fresh) in sorted(agg.items())
        },
        "families": {f"{k}/a{a}/t{npt}": c
                     for (k, a, npt), c in sorted(fams.items())},
    }
    print(f"  ARM chunk={chunk} bucket={bucket} ee={int(ee)}: {toks} "
          f"tok in {elapsed:.1f}s -> {out['agg_tps']} tok/s, TTFT p50 "
          f"{out['ttft_p50_ms']} ms p90 {out['ttft_p90_ms']} ms", flush=True)
    for k, v in out["anatomy"].items():
        print(f"    {k}: {v}", flush=True)
    print(f"    families: {out['families']}", flush=True)
    engine.stop()
    time.sleep(1.0)
    return out


def main():
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from chatts_tpu.core.config import (ChatTSConfig, QwenConfig,
                                        TSEncoderConfig)
    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import (Request, SamplingParams,
                                            ServeEngine)

    vocab = 152064
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
            return [10 + (sum(w.encode()) * 31 + len(w)) % (vocab - 100)
                    for w in text.split()]

    t0 = time.perf_counter()
    params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                            fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init 8B int4: {time.perf_counter() - t0:.1f}s", flush=True)
    proc = ChatTSProcessor(_Tok(), cfg)

    arms = [a for a in sys.argv[1:] if "x" in a] or [
        "32x8", "32x12", "16x8", "16x12", "32x8a8", "32x12c48"]
    results = []
    for arm in arms:
        # Arm grammar: <chunk>x<bucket>[c<slots>][a8][ee]
        spec = arm
        ee = spec.endswith("ee")
        spec = spec.removesuffix("ee")
        a8 = spec.endswith("a8")
        spec = spec.removesuffix("a8")
        nslots = 32
        chunk_s, rest = spec.split("x")
        if "c" in rest:
            bucket_s, slots_s = rest.split("c")
            nslots = int(slots_s)
        else:
            bucket_s = rest
        chunk, bucket = int(chunk_s), int(bucket_s)
        print(f"=== arm chunk={chunk} bucket={bucket} c={nslots} "
              f"a8={a8} ee={ee}", flush=True)
        r = run_arm(params, cfg, proc, Request, SamplingParams,
                    ServeEngine, jnp, chunk, bucket, a8, nslots, ee)
        r["a8"] = a8
        r["slots"] = nslots
        results.append(r)
        gc.collect()
    print("\n=== summary")
    for r in results:
        print(f"chunk {r['chunk']:2d} bucket {r['bucket']:2d} "
              f"c{r['slots']} a8 {int(r['a8'])} ee {int(r.get('ee', False))}: "
              f"{r['agg_tps']:7.1f} tok/s  TTFT p50 "
              f"{r['ttft_p50_ms']:7.1f} ms p90 "
              f"{r.get('ttft_p90_ms', float('nan')):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
